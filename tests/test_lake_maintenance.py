"""LakeTable maintenance: compaction, vacuum, time travel, overwrite,
and the as-of pandas join variant."""

import os

import pytest
from pyspark.sql import functions as F

from oregonwaterdataportal_etl_spark.cdc.changegen import (
    TRANSCRIPT_SCHEMA,
    generate_changes_pdf,
)
from oregonwaterdataportal_etl_spark.lake import LakeTable
from oregonwaterdataportal_etl_spark.operators import asof


def make(tmp_path, spark, batches=4, rows=1500, mode="cow", name="t"):
    t = LakeTable.create(
        str(tmp_path / name), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], num_buckets=4
    )
    for i in range(batches):
        pdf = generate_changes_pdf(
            rows, 150, seed=i, lsn_start=i * rows, delete_rate=0.03
        )
        t.merge(spark.createDataFrame(pdf), mode=mode)
    return t


def state(t, spark):
    return sorted(
        tuple(r) for r in t.read(spark).select("conv_id", "turn_idx", "text").collect()
    )


def delta_count(t):
    return sum(len(fl) for fl in t.snapshot().get("deltas", {}).values())


def test_mor_equals_cow(spark, tmp_path):
    """Merge-on-read (append deltas, resolve at read) must produce the
    same visible state as copy-on-write applies of the same batches."""
    cow = make(tmp_path, spark, mode="cow", name="cow")
    mor = make(tmp_path, spark, mode="mor", name="mor")
    assert delta_count(mor) >= 4, "mor merges must accrete delta files"
    assert state(mor, spark) == state(cow, spark)
    # run-twice on mor appends duplicate deltas; state unchanged
    pdf = generate_changes_pdf(1500, 150, seed=0, lsn_start=0, delete_rate=0.03)
    mor.merge(spark.createDataFrame(pdf), mode="mor")
    assert state(mor, spark) == state(cow, spark)


def test_compact_folds_deltas_preserves_state(spark, tmp_path):
    t = make(tmp_path, spark, mode="mor")
    before = state(t, spark)
    assert delta_count(t) > 0
    t.compact(spark)
    assert delta_count(t) == 0, "compaction must clear deltas"
    files = t.snapshot()["files"]
    assert all(len(fl) == 1 for fl in files.values()), "one file per bucket"
    assert state(t, spark) == before
    # idempotent: second compact is metadata-only (same version)
    v = t.current_version()
    assert t.compact(spark) == v


def test_mixed_mode_merge(spark, tmp_path):
    """A cow merge on a table carrying deltas folds the touched
    buckets' deltas in."""
    t = make(tmp_path, spark, batches=2, mode="mor")
    pdf = generate_changes_pdf(1500, 150, seed=9, lsn_start=50_000)
    t.merge(spark.createDataFrame(pdf), mode="cow")
    # every bucket was touched (150 convs x 4 buckets) -> deltas folded
    assert delta_count(t) == 0
    # oracle: replay everything sequentially
    import pandas as pd

    allpdf = pd.concat(
        [
            generate_changes_pdf(1500, 150, seed=0, lsn_start=0, delete_rate=0.03),
            generate_changes_pdf(1500, 150, seed=1, lsn_start=1500, delete_rate=0.03),
            generate_changes_pdf(1500, 150, seed=9, lsn_start=50_000),
        ]
    )
    from oregonwaterdataportal_etl_spark.cdc import oracle_fold

    expected = sorted(
        (k[0], k[1], v["text"])
        for k, v in oracle_fold(allpdf.to_dict("records")).items()
    )
    assert state(t, spark) == expected


def test_time_travel_and_vacuum(spark, tmp_path):
    t = make(tmp_path, spark, batches=3)
    v2_count = t.read(spark, version=2).count()
    v3_count = t.read(spark).count()
    assert v2_count != v3_count or v2_count > 0
    removed = t.vacuum(keep_last=1)
    assert removed > 0
    # current version still reads fine
    assert t.read(spark).count() == v3_count
    # expired snapshot is gone
    with pytest.raises(FileNotFoundError):
        t.read(spark, version=1)


def test_overwrite_full_refresh(spark, tmp_path):
    t = make(tmp_path, spark, batches=1)
    df = spark.createDataFrame(
        [("cX", 0, "user", "fresh", None, None)], schema=TRANSCRIPT_SCHEMA
    )
    t.overwrite(df)
    rows = t.read(spark).collect()
    assert len(rows) == 1 and rows[0]["text"] == "fresh"


def test_asof_join_pandas_matches_union_window(spark):
    left = spark.createDataFrame(
        [("c1", 5, "q5"), ("c1", 10, "q10"), ("c2", 1, "x"), ("c2", 9, "y")],
        ["k", "ts", "payload"],
    )
    right = spark.createDataFrame(
        [("c1", 3, "v3"), ("c1", 10, "v10"), ("c2", 5, "v5")], ["k", "ts", "state"]
    )
    a = asof.asof_join(left, right, ["k"], "ts", "ts")
    b = asof.asof_join_pandas(left, right, ["k"], "ts", "ts")
    ka = sorted((r["k"], r["ts"], r["state"]) for r in a.collect())
    kb = sorted((r["k"], r["ts"], r["state"]) for r in b.collect())
    assert ka == kb
