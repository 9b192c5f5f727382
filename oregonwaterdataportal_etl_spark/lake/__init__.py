from .bucketed import register_bucketed_table, write_bucketed_wal
from .incremental import AggSpec, IncrementalAggView
from .maintenance import MaintenancePolicy, maintain, plan_maintenance
from .partitioned import (
    PartitionedLakeTable,
    PartitionedMergeResult,
    write_partitioned_wal,
)
from .table import LakeTable, MergeResult
from .wap import (
    Audit,
    ChangeAudit,
    DeltaBounds,
    ExprHolds,
    NotNull,
    PartitionedWapStage,
    RowBounds,
    UniqueKeys,
    WapAuditError,
    WapConflictError,
    WapStage,
    begin_wap,
    run_audits,
)

__all__ = [
    "AggSpec",
    "IncrementalAggView",
    "LakeTable",
    "MergeResult",
    "PartitionedLakeTable",
    "PartitionedMergeResult",
    "write_partitioned_wal",
    "MaintenancePolicy",
    "maintain",
    "plan_maintenance",
    "register_bucketed_table",
    "write_bucketed_wal",
    "Audit",
    "ChangeAudit",
    "DeltaBounds",
    "NotNull",
    "UniqueKeys",
    "RowBounds",
    "ExprHolds",
    "run_audits",
    "PartitionedWapStage",
    "WapStage",
    "WapAuditError",
    "WapConflictError",
    "begin_wap",
]
