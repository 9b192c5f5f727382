"""Property test (hypothesis): arbitrary wire streams — mixed clean /
malformed / transactional envelopes — must PARTITION exactly into
ready / dead-letter / held, and the ready side must agree with a
pure-Python reimplementation of the contract."""

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oregonwaterdataportal_etl_spark.cdc import ingest_envelopes

PAYLOAD = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def wire_strategy():
    """One wire row: (kind, op, conv, turn, text, lsn?, txn?, total?)."""
    row = st.tuples(
        st.sampled_from(
            ["clean", "clean", "clean", "malformed", "no_lsn", "bad_op",
             "no_image", "txn"]
        ),
        st.sampled_from(["c", "u", "d", "r"]),
        st.integers(0, 3),              # conv
        st.integers(0, 3),              # turn
        st.text(alphabet="ab\"\\", min_size=0, max_size=4),  # json-hostile
        st.integers(0, 2),              # txn group
        st.integers(1, 3),              # announced event_count
    )
    return st.lists(row, min_size=1, max_size=40)


def build_wire(raw):
    """-> (json strings, python-side expectations)."""
    values, expect = [], []
    for i, (kind, op, conv, turn, text, txn, total) in enumerate(raw):
        img = {"conv_id": f"c{conv}", "turn_idx": turn, "text": text}
        env = {"op": op, "source": {"lsn": i}}
        if op == "d":
            env["before"] = img
        else:
            env["after"] = img
        if kind == "malformed":
            values.append(json.dumps(env)[: max(1, len(json.dumps(env)) // 2)])
            expect.append(("dlq", "malformed_json"))
            continue
        if kind == "no_lsn":
            env["source"] = {}
            values.append(json.dumps(env))
            expect.append(("dlq", "missing_lsn"))
            continue
        if kind == "bad_op":
            env["op"] = "zz"
            values.append(json.dumps(env))
            expect.append(("dlq", "bad_op"))
            continue
        if kind == "no_image":
            env.pop("before", None)
            env.pop("after", None)
            values.append(json.dumps(env))
            expect.append(("dlq", "missing_image"))
            continue
        if kind == "txn":
            env["transaction"] = {"id": f"t{txn}", "event_count": total}
            values.append(json.dumps(env))
            expect.append(("txn", (f"t{txn}", total, i)))
            continue
        values.append(json.dumps(env))
        expect.append(("clean", i))
    return values, expect


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(wire_strategy())
def test_ingest_partitions_and_matches_oracle(spark, raw):
    values, expect = build_wire(raw)
    df = spark.createDataFrame([(v,) for v in values], "value string")
    ready, dlq, still = ingest_envelopes(df, PAYLOAD)
    n_ready, n_dlq, n_still = ready.count(), dlq.count(), still.count()
    # exact partition: every wire row lands in exactly one side
    assert n_ready + n_dlq + n_still == len(values)

    # python oracle: dlq reasons, txn completeness, ready lsn set
    want_dlq = sorted(r for k, r in expect if k == "dlq")
    got_dlq = sorted(r["_dlq_reason"] for r in dlq.collect())
    assert got_dlq == want_dlq

    txn_rows = [v for k, v in expect if k == "txn"]
    seen: dict[str, list] = {}
    for tid, total, lsn in txn_rows:
        seen.setdefault(tid, []).append((total, lsn))
    want_ready = {lsn for k, lsn in expect if k == "clean"}
    want_held = set()
    for tid, rows in seen.items():
        want = max(t for t, _ in rows)  # gate uses max announced count
        lsns = {lsn for _, lsn in rows}
        if len(rows) >= want:
            want_ready |= lsns
        else:
            want_held |= lsns
    assert {r["lsn"] for r in ready.collect()} == want_ready
    assert {r["lsn"] for r in still.collect()} == want_held

    # field fidelity on the ready side (spot: every ready row's text
    # roundtrips the json-hostile alphabet)
    by_lsn = {r["lsn"]: r for r in ready.collect()}
    for i, (kind, op, conv, turn, text, _t, _n) in enumerate(raw):
        if i in by_lsn and kind in ("clean", "txn"):
            assert by_lsn[i]["text"] == text
            assert by_lsn[i]["conv_id"] == f"c{conv}"
