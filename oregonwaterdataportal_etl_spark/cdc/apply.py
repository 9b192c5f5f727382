"""Batch apply path: LWW dedup -> MERGE, plus the pure-Python oracle.

lww_dedup is operator W1 (SURVEY.md 2.5): the reference keeps the
first row per deterministic id unless a later "Final"-status record
arrives (userCode/awqms/dag.py:155-187). Recast per north_rule: per
(conv_id, turn_idx) the event with the highest monotonic LSN wins —
ranking window over desc(lsn).

oracle_fold is the hypothesis-test oracle from SURVEY.md section 5:
a sequential fold of the change stream into a dict, against which the
distributed LWW reduction must agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..lake.table import LakeTable, MergeResult


def lww_dedup(
    changes: DataFrame,
    key_cols: list[str] = ("conv_id", "turn_idx"),
    lsn_col: str = "lsn",
) -> DataFrame:
    """Per-key last-writer-wins: keep the highest-LSN event per key.

    One ranking-window shuffle, hash-partitioned on the full key
    (conv_id AND turn_idx), so a hot conversation spreads across
    partitions — the window itself never sees conversation-level skew,
    only per-(conv,turn) duplicate fan-in.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.desc(lsn_col))
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_batch(
    table: LakeTable,
    changes: DataFrame,
    op_col: str = "op",
    lsn_col: str = "lsn",
    mode: str = "cow",
) -> MergeResult:
    """Dedup a change batch and MERGE it into the lake table.

    Note the merge's own ranking window already resolves intra-batch
    duplicates together with base rows in a single shuffle, so we do
    NOT pre-dedup here — one shuffle, not two. lww_dedup remains the
    standalone operator for pipelines that need a clean batch without
    a sink.
    """
    return table.merge(changes, op_col=op_col, lsn_col=lsn_col, mode=mode)


def oracle_fold(events: list[dict], key_cols=("conv_id", "turn_idx")) -> dict:
    """Sequential LWW fold in pure Python (test oracle only; never in
    the data path). Events are folded in LSN order; highest LSN wins;
    delete removes. Returns {key_tuple: row_dict}."""
    state: dict = {}
    applied_lsn: dict = {}
    for ev in sorted(events, key=lambda e: e["lsn"]):
        key = tuple(ev[k] for k in key_cols)
        if key in applied_lsn and applied_lsn[key] >= ev["lsn"]:
            continue
        applied_lsn[key] = ev["lsn"]
        if ev["op"] == "delete":
            state.pop(key, None)
        else:
            state[key] = {k: v for k, v in ev.items() if k != "op"}
    return state
