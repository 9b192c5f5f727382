from .bucketed import register_bucketed_table, write_bucketed_wal
from .table import LakeTable, MergeResult

__all__ = [
    "LakeTable",
    "MergeResult",
    "register_bucketed_table",
    "write_bucketed_wal",
]
