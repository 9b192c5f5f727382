"""Regression tests for the code-review findings: tombstone retention
(no resurrection), compact delta carry-forward, commit conflicts,
empty windows, permutation integrity, monotonic stateful counts."""

import numpy as np
import pytest

from oregonwaterdataportal_etl_spark.cdc import (
    CdcRunner,
    ManifestLog,
    OffsetLog,
)
from oregonwaterdataportal_etl_spark.cdc.changegen import (
    CHANGE_SCHEMA,
    TRANSCRIPT_SCHEMA,
    generate_changes_pdf,
)
from oregonwaterdataportal_etl_spark.lake import LakeTable
from oregonwaterdataportal_etl_spark.lake.table import CommitConflictError

KEYS = ["conv_id", "turn_idx"]


def make(tmp_path, name="t", nb=4):
    return LakeTable.create(str(tmp_path / name), TRANSCRIPT_SCHEMA, KEYS, num_buckets=nb)


def test_stale_event_cannot_resurrect_deleted_row(spark, tmp_path):
    """Tombstone retention: a delete's LSN survives the delete, so a
    stale lower-LSN event in a LATER batch stays dead (cow and read
    paths)."""
    t = make(tmp_path)
    t.merge(spark.createDataFrame(
        [("insert", 10, "c1", 0, "user", "alive", None, None)], schema=CHANGE_SCHEMA))
    t.merge(spark.createDataFrame(
        [("delete", 100, "c1", 0, None, None, None, None)], schema=CHANGE_SCHEMA))
    assert t.read(spark).count() == 0
    # stale update from before the delete arrives late, in its own batch
    r = t.merge(spark.createDataFrame(
        [("update", 50, "c1", 0, "user", "zombie", None, None)], schema=CHANGE_SCHEMA))
    assert t.read(spark).count() == 0, "stale event resurrected a deleted row"
    assert r.rows_inserted == 0 and r.rows_updated == 0
    # a genuinely newer insert IS allowed to recreate the key
    t.merge(spark.createDataFrame(
        [("insert", 200, "c1", 0, "user", "reborn", None, None)], schema=CHANGE_SCHEMA))
    rows = t.read(spark).collect()
    assert len(rows) == 1 and rows[0]["text"] == "reborn"


def test_stale_delta_cannot_resurrect_at_read(spark, tmp_path):
    """Same invariant through the MOR read path."""
    t = make(tmp_path)
    t.merge(spark.createDataFrame(
        [("insert", 10, "c1", 0, "user", "alive", None, None)], schema=CHANGE_SCHEMA))
    t.merge(spark.createDataFrame(
        [("delete", 100, "c1", 0, None, None, None, None)], schema=CHANGE_SCHEMA))
    # stale event arrives as a MOR delta
    t.merge(spark.createDataFrame(
        [("update", 50, "c1", 0, "user", "zombie", None, None)], schema=CHANGE_SCHEMA),
        mode="mor")
    assert t.read(spark).count() == 0
    # and stays dead after compaction folds the delta
    t.compact(spark)
    assert t.read(spark).count() == 0


def test_compact_binpack_carries_unfolded_deltas(spark, tmp_path):
    """The bin-pack commit must keep delta references it didn't fold."""
    t = make(tmp_path)
    # base files in many buckets (cow), accreted to >1 file per bucket
    for i in range(2):
        t.merge(spark.createDataFrame(
            generate_changes_pdf(1500, 100, seed=i, lsn_start=i * 1500)))
    # undo the automatic single-file state: force multi-file via a
    # second cow merge touching all buckets, then add ONE small delta
    t.merge(spark.createDataFrame(
        [("insert", 10**6, "solo", 0, "user", "x", None, None)], schema=CHANGE_SCHEMA),
        mode="mor")
    deltas_before = sum(len(f) for f in t.snapshot().get("deltas", {}).values())
    assert deltas_before == 1
    rows_before = t.read(spark).count()
    # fold nothing (threshold above the delta count), but bin-pack base
    t.compact(spark, min_delta_files=5)
    assert sum(len(f) for f in t.snapshot().get("deltas", {}).values()) == 1, (
        "bin-pack commit dropped unfolded deltas"
    )
    assert t.read(spark).count() == rows_before


def test_commit_conflict_detected(spark, tmp_path):
    t = make(tmp_path)
    snap = t.snapshot()
    doc = dict(snap)
    doc["version"] = snap["version"] + 1
    t._commit(doc)
    with pytest.raises(CommitConflictError, match="committed concurrently"):
        t._commit(dict(doc))


def test_empty_window_advances_offsets_without_snapshot(spark, tmp_path):
    t = make(tmp_path)
    offsets = OffsetLog(str(tmp_path / "off"))
    manifests = ManifestLog(str(tmp_path / "mf"))
    pdf = generate_changes_pdf(100, 20, seed=1)  # lsns 0..99
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "s"))
    src = lambda: spark.read.parquet(str(tmp_path / "s"))  # noqa: E731
    runner = CdcRunner(t, offsets, manifests, src)
    assert runner.run_window(0, 99) is not None
    v = t.current_version()
    # windows beyond the data are empty: offsets advance, version doesn't
    assert runner.run_window(100, 199) is None
    assert offsets.last_lsn() == 199
    assert t.current_version() == v
    # empty window replay is also a no-op
    assert runner.run_window(100, 199) is None


def test_changegen_emits_exact_lsn_multiset(spark):
    """Out-of-order shuffling must be a true permutation: every LSN
    delivered exactly once (review found duplicated+dropped events)."""
    for seed in range(5):
        pdf = generate_changes_pdf(1000, 50, seed=seed, out_of_order=0.4)
        lsns = sorted(pdf["lsn"].tolist())
        assert lsns == list(range(1000)), f"seed {seed}: corrupted permutation"
        # and it actually IS out of order
        assert list(pdf["lsn"]) != sorted(pdf["lsn"])


def test_tombstone_expiry_below_watermark(spark, tmp_path):
    """Tombstones below the committed offset horizon can be expired;
    newer tombstones survive and keep protecting their keys."""
    t = make(tmp_path)
    rows = [
        ("insert", 1, "c1", 0, "user", "a", None, None),
        ("insert", 2, "c2", 0, "user", "b", None, None),
        ("delete", 10, "c1", 0, None, None, None, None),   # old tombstone
        ("delete", 500, "c2", 0, None, None, None, None),  # recent tombstone
    ]
    for r in rows:
        t.merge(spark.createDataFrame([r], schema=CHANGE_SCHEMA))
    assert t.read(spark).count() == 0
    removed = t.expire_tombstones(spark, below_lsn=100)
    assert removed == 1
    # the recent tombstone still blocks stale events
    t.merge(spark.createDataFrame(
        [("update", 400, "c2", 0, "user", "zombie", None, None)], schema=CHANGE_SCHEMA))
    assert t.read(spark).count() == 0
    # expiring nothing is a no-op (no new version)
    v = t.current_version()
    assert t.expire_tombstones(spark, below_lsn=100) == 0
    assert t.current_version() == v
