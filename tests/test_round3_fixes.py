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
