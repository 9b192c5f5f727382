from .bucketed import register_bucketed_table, write_bucketed_wal
from .incremental import AggSpec, IncrementalAggView
from .table import LakeTable, MergeResult

__all__ = [
    "AggSpec",
    "IncrementalAggView",
    "LakeTable",
    "MergeResult",
    "register_bucketed_table",
    "write_bucketed_wal",
]
