"""As-of / range-style joins.

The reference's only "temporal join" is J6 — per-key watermark
containment (userCode/wrd/dag.py:171-197), covered in relational.py.
This module adds the general as-of join a transcript/CDC engine needs
(e.g. join each turn to the latest config/state row at or before its
timestamp), which Spark lacks natively (pyspark_guide.md: bucketize or
merge_asof per group).

Two strategies:
- union-window (default): union both sides tagged, one ranking window
  per key ordered by time, last_value of the right side carried
  forward. One shuffle, no row explosion, skew-bounded by per-key
  cardinality — the scale path.
- merge_asof via applyInPandas: per-key pandas merge_asof for when
  tolerance/nearest semantics are needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right_ts <= left_ts within the same key group (backward as-of).

    Implementation: union both sides with a side tag; a single window
    per key ordered by (ts, side) carries the last right-side values
    forward with last(ignorenulls=True); keep left rows. Exactly one
    shuffle on the key columns.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]
    lt = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    rt = right.withColumn("__ts", F.col(right_ts)).withColumn("__side", F.lit(0))
    for c in right_cols:
        lt = lt.withColumn(f"__r_{c}", F.lit(None).cast(right.schema[c].dataType))
        rt = rt.withColumn(f"__r_{c}", F.col(c))
    left_cols = [c for c in left.columns]
    lt = lt.select(*on, "__ts", "__side", *[f"__r_{c}" for c in right_cols],
                   *[c for c in left_cols if c not in on])
    rt = rt.select(*on, "__ts", "__side", *[f"__r_{c}" for c in right_cols],
                   *[F.lit(None).cast(left.schema[c].dataType).alias(c)
                     for c in left_cols if c not in on])
    u = lt.unionByName(rt)
    # right rows sort before left rows at equal ts -> "at or before"
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__c_{c}")
            for c in right_cols
        ],
    )
    out = carried.filter(F.col("__side") == 1).select(
        *on,
        *[c for c in left_cols if c not in on],
        *[F.col(f"__c_{c}").alias(f"{c}{suffix}" if c in left_cols else c) for c in right_cols],
    )
    return out


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """pd.merge_asof per key group via cogrouped applyInPandas —
    for tolerance/nearest semantics. Arrow-batched; key groups are the
    parallelism unit, so skewed keys should be rare on the left."""
    import pandas as pd

    right_cols = [c for c in right.columns if c not in on and c != right_ts]
    out_schema = left.schema
    from pyspark.sql import types as T

    fields = list(out_schema.fields) + [
        T.StructField(f"{f.name}_r" if f.name in left.columns else f.name,
                      f.dataType, True)
        for f in right.schema.fields
        if f.name in right_cols
    ]
    schema = T.StructType(fields)
    tol = pd.Timedelta(tolerance) if tolerance else None

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        l_sorted = l_pdf.sort_values(left_ts)
        r_sorted = r_pdf.sort_values(right_ts)[[right_ts] + right_cols]
        renames = {c: (f"{c}_r" if c in l_pdf.columns else c) for c in right_cols}
        r_sorted = r_sorted.rename(columns=renames)
        merged = pd.merge_asof(
            l_sorted,
            r_sorted,
            left_on=left_ts,
            right_on=right_ts if right_ts not in l_pdf.columns else right_ts,
            direction=direction,
            tolerance=tol,
        )
        if right_ts in merged.columns and right_ts not in [f.name for f in fields]:
            merged = merged.drop(columns=[right_ts])
        return merged[[f.name for f in fields]]

    return (
        left.groupBy(*on)
        .cogroup(right.groupBy(*on))
        .applyInPandas(lambda key, l, r: merge(l, r), schema=schema)
    )
