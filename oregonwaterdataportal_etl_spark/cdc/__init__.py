from .changegen import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, generate_changes
from .offsets import OffsetLog
from .manifests import ManifestLog
from .apply import lww_dedup, apply_batch, oracle_fold
from .runner import CdcRunner
from .source import BucketedWalSource, LsnRangedParquetSource
from .watermarks import WatermarkStore

__all__ = [
    "WatermarkStore",
    "CHANGE_SCHEMA",
    "TRANSCRIPT_SCHEMA",
    "generate_changes",
    "OffsetLog",
    "ManifestLog",
    "lww_dedup",
    "apply_batch",
    "oracle_fold",
    "CdcRunner",
    "LsnRangedParquetSource",
    "BucketedWalSource",
]
