"""Round 5: z-order clustering compaction (Delta OPTIMIZE ZORDER analog).

Pins: (a) the Morton interleave itself against hand-computed codes,
(b) state invariance — a clustered rewrite never changes the resolved
row set, (c) the POINT of the feature: parquet row-group min/max
stats after compact(cluster_by=[x, y]) let a range band on EITHER
column skip most row groups, where the default key-sort (keys
uncorrelated with x/y) skips none.
"""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oregonwaterdataportal_etl_spark.functions.scalar import zorder_key
from oregonwaterdataportal_etl_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("x", T.LongType(), True),
        T.StructField("y", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)

N = 20_000


def _data(spark):
    return spark.range(N).select(
        F.col("id"),
        (F.col("id") % 141).alias("x"),
        ((F.col("id") * 7919) % 137).alias("y"),
        F.concat(F.lit("payload-"), F.col("id")).alias("text"),
        F.lit("update").alias("op"),
        F.col("id").alias("lsn"),
    )


def _mk_table(spark, path) -> LakeTable:
    t = LakeTable.create(path, SCHEMA, ["id"], num_buckets=2)
    t.merge(_data(spark))
    return t


def _rg_match_fraction(t: LakeTable, col: str, lo: int, hi: int) -> float:
    """Fraction of row groups whose [min, max] stats intersect the
    band — what a pushed range predicate cannot skip."""
    snap = t.snapshot(t.current_version())
    files = [f for fl in snap["files"].values() for f in fl]
    total = hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        ci = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            total += 1
            if st is None or (st.min <= hi and st.max >= lo):
                hit += 1
    assert total >= 8, f"need multiple row groups to measure, got {total}"
    return hit / total


def test_zorder_key_matches_hand_morton(spark):
    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x long, y long"
    )
    out = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_key(["x", "y"], [0, 0], [3, 3], bits=2).alias("z")
        ).collect()
    }

    def morton(a, b):
        z = 0
        for j in range(2):
            z |= ((a >> j) & 1) << (2 * j + 1)
            z |= ((b >> j) & 1) << (2 * j)
        return z

    for (x, y), z in out.items():
        assert z == morton(x, y), (x, y, z)


def test_zorder_key_validates_args(spark):
    with pytest.raises(ValueError):
        zorder_key(["a"], [0], [1])
    with pytest.raises(ValueError):
        zorder_key(["a", "b"], [0, 0], [1, 1], bits=40)
    with pytest.raises(ValueError):
        zorder_key(["a", "b"], [0], [1, 1])


def test_cluster_by_preserves_state_and_skips_row_groups(spark, tmp_path):
    t_plain = _mk_table(spark, str(tmp_path / "plain"))
    t_z = _mk_table(spark, str(tmp_path / "zed"))
    # target=0 forces the rewrite even though each bucket holds one
    # file — the plain side must go through the same row_group_bytes
    # writer as the clustered side for the stats comparison to be fair
    # 16 KiB row groups → ~25 row groups per bucket file: fine enough
    # granularity that a 15% band's skip fraction approaches the
    # Morton ideal (~band + sqrt(1/n_rowgroups)) instead of rounding up
    t_plain.compact(
        spark, target_files_per_bucket=0, row_group_bytes=16 * 1024
    )
    t_z.compact(
        spark, cluster_by=["x", "y"], cluster_bits=8,
        row_group_bytes=16 * 1024,
    )

    # identical resolved states
    a = sorted(map(tuple, t_plain.read(spark).collect()))
    b = sorted(map(tuple, t_z.read(spark).collect()))
    assert a == b and len(a) == N

    # clustering recorded in the snapshot summary
    summ = t_z.snapshot(t_z.current_version())["summary"]
    assert summ["operation"] == "compact" and summ["clustered_by"] == ["x", "y"]

    # the skip pin: a ~15% band on EITHER dimension
    for col, lo, hi in (("x", 40, 60), ("y", 40, 60)):
        frac_plain = _rg_match_fraction(t_plain, col, lo, hi)
        frac_z = _rg_match_fraction(t_z, col, lo, hi)
        assert frac_z < frac_plain * 0.7, (
            f"{col}: z-order row-group hit {frac_z:.2f} "
            f"vs key-sort {frac_plain:.2f} — no skipping win"
        )
    # and the filtered reads agree with each other
    q = lambda t: sorted(
        r["id"] for r in t.read(spark).filter("y between 40 and 60").collect()
    )
    assert q(t_plain) == q(t_z)


def test_cluster_by_unknown_column_raises(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "bad"))
    with pytest.raises(ValueError, match="unknown cluster_by"):
        t.compact(spark, cluster_by=["nope"])
