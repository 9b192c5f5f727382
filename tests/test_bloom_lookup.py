"""Round 5: per-file key blooms — point-lookup FILE skipping.

A MOR bucket accumulates one delta file per merge; a key that was only
ever touched by one batch lives in one of them. Blooms must (a) never
change lookup results (no false negatives, pinned by equality against
the bloom-less path), (b) measurably cut the files actually read
(runtime numFiles over ALL scan leaves), (c) read zero files for a
key the table never saw, (d) degrade conservatively when a sidecar is
missing, and (e) be swept by vacuum once their data file is gone.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oregonwaterdataportal_etl_spark.lake import LakeTable
from oregonwaterdataportal_etl_spark.lake.bloom import sidecar_name

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


def _batch(spark, tag: str, lsn0: int, n: int = 40):
    rows = [
        (f"c{tag}_{i:03d}", i % 5, f"{tag}/{i}#{lsn0 + i}", "update", lsn0 + i)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, op string, lsn long"
    )


def _files_read(df) -> int:
    """Sum runtime numFiles over every scan node after execution,
    unwrapping AQE (AdaptiveSparkPlanExec / QueryStageExec) layers."""
    df.collect()

    total = 0

    def walk(node):
        nonlocal total
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if "QueryStage" in name:
            walk(node.plan())
            return
        try:
            total += node.metrics().apply("numFiles").value()
        except Exception:
            pass
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return total


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bloomtab")
    path = str(root / "tab")
    t = LakeTable.create(path, SCHEMA, ["conv_id", "turn_idx"], num_buckets=2)
    # 3 MOR merges -> compact (base + possible tombstones) -> 3 more
    for i in range(3):
        t.merge(_batch(spark, str(i), 1000 * (i + 1)), mode="mor")
    # a delete for one batch-1 key, then compaction retains a tombstone
    dele = spark.createDataFrame(
        [("c1_005", 0, None, "delete", 9000)],
        "conv_id string, turn_idx int, text string, op string, lsn long",
    )
    t.merge(dele, mode="mor")
    t.compact(spark)
    for i in range(3, 6):
        t.merge(_batch(spark, str(i), 1000 * (i + 1)), mode="mor")
    return t


def test_build_blooms_is_idempotent(spark, table):
    built = table.build_blooms(spark)
    assert built > 0
    assert table.build_blooms(spark) == 0  # sidecars exist -> no work
    snap = table.snapshot(table.current_version())
    all_files = [
        f
        for coll in (snap["files"], snap.get("tombstones", {}),
                     snap.get("deltas", {}))
        for fl in coll.values()
        for f in fl
    ]
    for f in all_files:
        assert os.path.exists(os.path.join(table.bloom_dir, sidecar_name(f)))


def test_lookup_with_blooms_equals_without_and_reads_fewer_files(spark, table):
    table.build_blooms(spark)
    # keys from early/late batches, incl. one overwritten only once
    for key in [("c0_003", 3), ("c4_011", 1), ("c5_039", 4)]:
        with_b = table.lookup(spark, conv_id=key[0], turn_idx=key[1])
        without = table.lookup(
            spark, use_blooms=False, conv_id=key[0], turn_idx=key[1]
        )
        rows_b = sorted(map(tuple, with_b.collect()))
        rows_n = sorted(map(tuple, without.collect()))
        assert rows_b == rows_n and len(rows_b) == 1
    # the file-skip pin: a single-batch key must not read every delta
    with_b = table.lookup(spark, conv_id="c4_011", turn_idx=1)
    without = table.lookup(spark, use_blooms=False, conv_id="c4_011", turn_idx=1)
    n_bloom, n_plain = _files_read(with_b), _files_read(without)
    assert n_bloom < n_plain, f"blooms read {n_bloom} vs plain {n_plain}"


def test_absent_key_reads_zero_files(spark, table):
    table.build_blooms(spark)
    out = table.lookup(spark, conv_id="never_seen", turn_idx=0)
    assert out.collect() == []
    assert _files_read(out) == 0


def test_deleted_key_stays_deleted_through_blooms(spark, table):
    table.build_blooms(spark)
    out = table.lookup(spark, conv_id="c1_005", turn_idx=0)
    assert out.collect() == []  # tombstone wins through the bloom path


def test_missing_sidecar_is_conservative(spark, table):
    table.build_blooms(spark)
    snap = table.snapshot(table.current_version())
    # drop one base-file sidecar; lookups must still be exact
    victim = next(iter(snap["files"].values()))[0]
    os.remove(os.path.join(table.bloom_dir, sidecar_name(victim)))
    got = sorted(
        map(tuple, table.lookup(spark, conv_id="c2_007", turn_idx=2).collect())
    )
    ref = sorted(
        map(
            tuple,
            table.lookup(
                spark, use_blooms=False, conv_id="c2_007", turn_idx=2
            ).collect(),
        )
    )
    assert got == ref
    table.build_blooms(spark)  # rebuild for later tests


def test_vacuum_sweeps_dead_sidecars(spark, tmp_path):
    path = str(tmp_path / "sweep")
    t = LakeTable.create(path, SCHEMA, ["conv_id", "turn_idx"], num_buckets=2)
    t.merge(_batch(spark, "a", 100), mode="mor")
    t.build_blooms(spark)
    before = set(os.listdir(t.bloom_dir))
    assert before
    t.compact(spark)  # rewrites: delta files become dead
    t.vacuum(keep_last=1, orphan_grace_seconds=0.0)
    live = {
        sidecar_name(p)
        for p in glob.glob(os.path.join(t.data_dir, "**", "*.parquet"),
                           recursive=True)
    }
    after = set(os.listdir(t.bloom_dir))
    assert all(s in live for s in after if s.endswith(".bloom"))
    # rebuilt sidecars serve the compacted layout exactly
    t.build_blooms(spark)
    got = t.lookup(spark, conv_id="ca_001", turn_idx=1).collect()
    assert len(got) == 1 and got[0]["text"] == "a/1#101"
