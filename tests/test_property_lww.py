"""Property-based tests (hypothesis): arbitrary op/lsn interleavings
per key must LWW-reduce to exactly the sequential oracle fold —
mirrors the reference's hypothesis tests (userCode/wrd/lib_test.py:
105-122, userCode/util_test.py:36-42) recast for the CDC engine."""

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oregonwaterdataportal_etl_spark.cdc import lww_dedup, oracle_fold
from oregonwaterdataportal_etl_spark.cdc.changegen import CHANGE_SCHEMA
from oregonwaterdataportal_etl_spark.functions import scalar


def events_strategy():
    ev = st.tuples(
        st.sampled_from(["insert", "update", "delete"]),
        st.integers(0, 6),  # conv
        st.integers(0, 4),  # turn
        st.text(alphabet="abcxyz ", min_size=0, max_size=8),
    )
    return st.lists(ev, min_size=1, max_size=60)


def to_rows(raw):
    # assign strictly monotonic LSNs in list order, then shuffle-proof:
    # the engine must not depend on row order, only LSN
    rows = []
    for i, (op, conv, turn, text) in enumerate(raw):
        rows.append(
            (
                op,
                i,
                f"c{conv}",
                turn,
                None if op == "delete" else "user",
                None if op == "delete" else text,
                None,
                None,
            )
        )
    return rows


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy(), st.randoms())
def test_lww_reduction_equals_oracle_fold(spark, raw, rnd):
    rows = to_rows(raw)
    events = [
        dict(zip(["op", "lsn", "conv_id", "turn_idx", "role", "text", "tool", "ts"], r))
        for r in rows
    ]
    expected = oracle_fold(events)
    expected_rows = sorted(
        (k[0], k[1], v["text"]) for k, v in expected.items()
    )

    shuffled = list(rows)
    rnd.shuffle(shuffled)  # delivery order must not matter
    df = spark.createDataFrame(shuffled, schema=CHANGE_SCHEMA)
    deduped = lww_dedup(df).filter("op != 'delete'")
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["text"]) for r in deduped.collect()
    )
    assert got == expected_rows


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy(), st.randoms())
def test_lww_with_equal_lsn_ties_equals_oracle_fold(spark, raw, rnd):
    """Round 3: COLLAPSED LSNs (lsn = i // 3) force same-(key,lsn)
    ties between genuinely different events; the md5-family payload
    tie-break must make the distributed reduction agree with the
    sequential oracle on every example, in any delivery order."""
    rows = [(op, lsn // 3, *rest) for (op, lsn, *rest) in to_rows(raw)]
    events = [
        dict(zip(["op", "lsn", "conv_id", "turn_idx", "role", "text", "tool", "ts"], r))
        for r in rows
    ]
    expected = oracle_fold(events)
    expected_rows = sorted(
        (k[0], k[1], v["text"]) for k, v in expected.items()
    )

    shuffled = list(rows)
    rnd.shuffle(shuffled)  # delivery order must not matter
    df = spark.createDataFrame(shuffled, schema=CHANGE_SCHEMA)
    # md5 family: the one with a pure-Python twin, so oracle agreement
    # on tie winners is exact (xxhash64's determinism is covered by the
    # dedicated ordering-independence tests)
    deduped = lww_dedup(df, tiebreak_family="md5").filter("op != 'delete'")
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["text"]) for r in deduped.collect()
    )
    assert got == expected_rows


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.text(min_size=0, max_size=30), st.integers(1, 9))
def test_deterministic_hash_property(spark, s, k):
    """Hash positivity/width over arbitrary text (reference property
    test shape) + exact md5 parity with Python."""
    expected = int(hashlib.md5(s.encode()).hexdigest(), 16) % 10**k
    expected = expected or 1
    got = (
        spark.createDataFrame([(s,)], ["s"])
        .select(scalar.deterministic_hash("s", k).alias("v"))
        .collect()[0]["v"]
    )
    assert got == expected
    assert 1 <= got < 10**k


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events_strategy(),
    st.lists(st.sampled_from(["cow", "mor", "wal"]), min_size=2, max_size=4),
    st.lists(st.sampled_from(["none", "compact", "rebucket"]), min_size=2,
             max_size=4),
    st.sampled_from([2, 3, 8, 16]),
    st.sampled_from(["pointer", "rename-free"]),
)
def test_chaos_schedule_equals_oracle_fold(spark, raw, modes, maint, nb2, cmode):
    """Table-level chaos property: ANY interleaving of cow merges, mor
    appends, zero-exchange bucketed-WAL merges (delta-folding), compact
    passes and rebuckets — applied to LSN-ordered batches of an
    arbitrary event list — must leave the table in exactly the
    sequential oracle fold's state. One schedule, five mechanisms, one
    invariant — in BOTH commit modes (pointer and rename-free)."""
    import shutil
    import tempfile

    from oregonwaterdataportal_etl_spark.lake import (
        LakeTable,
        write_bucketed_wal,
    )

    rows = to_rows(raw)
    events = [
        dict(zip(["op", "lsn", "conv_id", "turn_idx", "role", "text", "tool", "ts"], r))
        for r in rows
    ]
    expected = sorted(
        (k[0], k[1], v["text"]) for k, v in oracle_fold(events).items()
    )

    tmp = tempfile.mkdtemp(prefix="chaos_lww_")
    try:
        from oregonwaterdataportal_etl_spark.cdc.changegen import (
            TRANSCRIPT_SCHEMA,
        )

        t = LakeTable.create(
            f"{tmp}/t", TRANSCRIPT_SCHEMA, key_cols=["conv_id", "turn_idx"],
            num_buckets=4, commit_mode=cmode,
        )
        n = len(rows)
        nb = len(modes)
        step = max(n // nb, 1)
        for i, mode in enumerate(modes):
            lo = i * step
            hi = (i + 1) * step if i < nb - 1 else n
            if lo >= n:
                break
            batch = spark.createDataFrame(rows[lo:hi], schema=CHANGE_SCHEMA)
            if mode == "wal":
                wal = f"{tmp}/wal{i}"
                write_bucketed_wal(
                    batch, wal, t.snapshot()["num_buckets"],
                    ["conv_id", "turn_idx"],
                )
                t.merge_prebucketed(spark, wal, validate_layout=True)
            else:
                t.merge(batch, mode=mode)
            m = maint[i % len(maint)]
            if m == "compact":
                t.compact(spark)
            elif m == "rebucket":
                t.rebucket(spark, nb2)
        got = sorted(
            (r["conv_id"], r["turn_idx"], r["text"])
            for r in t.read(spark).collect()
        )
        assert got == expected
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
