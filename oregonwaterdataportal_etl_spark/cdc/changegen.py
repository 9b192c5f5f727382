"""Deterministic synthetic transcript change-stream generator.

The engine's equivalent of the reference's mocked-cutoff replay
fixtures (userCode/helper_classes.py:123-129): a seeded stream of
(op, lsn, conv_id, turn_idx, role, text, tool, ts) events with
controllable duplicate-key rate, out-of-order fraction, hot-key
(conversation) skew, delete rate, and mid-stream additive columns
(FIXTURES.md sections 2 and 6).

Generation is numpy-vectorized on the driver for test scales and
distributed (mapInPandas over an id range) for bench scales — no
per-row Python either way.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), True),
        T.StructField("lsn", T.LongType(), True),
    ]
    + list(TRANSCRIPT_SCHEMA.fields)
)

_ROLES = np.array(["user", "assistant", "system", "tool"])
_TOOLS = np.array(["search", "bash", "browser", "python", None], dtype=object)

# the transcript enum domains as LakeTable dict_cols (2-byte dictionary
# codes through the merge shuffle) — kept HERE, next to the generator's
# value arrays, so the declaration cannot drift from the data
TRANSCRIPT_DICT_COLS = {
    "role": [str(r) for r in _ROLES],
    "tool": [str(t) for t in _TOOLS if t is not None],
}

# epoch seconds for 2024-01-01T00:00:00Z — fixed stream origin
_T0 = 1704067200


def _make_batch(
    rng: np.random.Generator,
    lsn_start: int,
    n: int,
    n_convs: int,
    max_turns: int,
    update_rate: float,
    delete_rate: float,
    out_of_order: float,
    zipf_a: float | None,
    tool_meta: bool,
) -> pd.DataFrame:
    """Vectorized batch of n change events with LSNs [lsn_start, +n)."""
    if zipf_a:
        # hot-conversation skew: Zipf-ranked conv ids
        conv_num = (rng.zipf(zipf_a, size=n) - 1) % n_convs
    else:
        conv_num = rng.integers(0, n_convs, size=n)
    turn = rng.integers(0, max_turns, size=n).astype(np.int32)
    u = rng.random(n)
    op = np.where(
        u < delete_rate, "delete", np.where(u < delete_rate + update_rate, "update", "insert")
    )
    lsn = np.arange(lsn_start, lsn_start + n, dtype=np.int64)
    if out_of_order > 0 and n >= 2:
        # swap a fraction of DISJOINT adjacent pairs so event order !=
        # LSN order (log tail delivering slightly out of order; LSN is
        # the global truth). Pairs (2i, 2i+1) cannot overlap, so the
        # result is always a true permutation — choosing arbitrary
        # adjacent indices could pick i and i+1 and corrupt the
        # permutation (duplicated + dropped events).
        k = int(n * out_of_order)
        pair_starts = rng.choice(n // 2, size=min(max(k, 0), n // 2), replace=False) * 2
        perm = np.arange(n)
        perm[pair_starts], perm[pair_starts + 1] = (
            perm[pair_starts + 1].copy(),
            perm[pair_starts].copy(),
        )
        order = perm
    else:
        order = np.arange(n)
    role = _ROLES[rng.integers(0, len(_ROLES), size=n)]
    tool = _TOOLS[rng.integers(0, len(_TOOLS), size=n)]
    conv_id = np.char.add("conv_", np.char.zfill(conv_num.astype(str), 8))
    # text is a pure function of (conv, turn, lsn) -> replay-stable and
    # byte-stable UTF-8; the equality-checked payload.
    text = np.char.add(
        np.char.add(conv_id, np.char.add("/t", turn.astype(str))),
        np.char.add("#", lsn.astype(str)),
    )
    ts = pd.to_datetime(_T0 + lsn, unit="s")
    is_delete = op == "delete"
    pdf = pd.DataFrame(
        {
            "op": op,
            "lsn": lsn,
            "conv_id": conv_id,
            "turn_idx": turn,
            "role": pd.Series(role).where(~is_delete, None),
            "text": pd.Series(text).where(~is_delete, None),
            "tool": pd.Series(tool).where(~is_delete, None),
            "ts": ts,
        }
    )
    if tool_meta:
        tm = np.char.add("meta_", lsn.astype(str))
        pdf["tool_meta"] = pd.Series(tm).where(~is_delete, None)
    return pdf.iloc[order].reset_index(drop=True)


def generate_changes_pdf(
    n_events: int,
    n_convs: int,
    seed: int = 42,
    max_turns: int = 50,
    update_rate: float = 0.25,
    delete_rate: float = 0.05,
    out_of_order: float = 0.1,
    zipf_a: float | None = None,
    lsn_start: int = 0,
    tool_meta: bool = False,
) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return _make_batch(
        rng,
        lsn_start,
        n_events,
        n_convs,
        max_turns,
        update_rate,
        delete_rate,
        out_of_order,
        zipf_a,
        tool_meta,
    )


def generate_changes(
    spark: SparkSession,
    n_events: int,
    n_convs: int,
    seed: int = 42,
    max_turns: int = 50,
    update_rate: float = 0.25,
    delete_rate: float = 0.05,
    out_of_order: float = 0.1,
    zipf_a: float | None = None,
    lsn_start: int = 0,
    tool_meta: bool = False,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic generation: spark.range over chunk ids
    -> mapInPandas, each chunk seeded by (seed, chunk_id). Scales to
    10^8+ events without driver memory; determinism is per-chunk."""
    schema = CHANGE_SCHEMA
    if tool_meta:
        schema = T.StructType(
            list(CHANGE_SCHEMA.fields) + [T.StructField("tool_meta", T.StringType(), True)]
        )
    if n_events <= 1_000_000 and partitions is None:
        pdf = generate_changes_pdf(
            n_events,
            n_convs,
            seed,
            max_turns,
            update_rate,
            delete_rate,
            out_of_order,
            zipf_a,
            lsn_start,
            tool_meta,
        )
        return spark.createDataFrame(pdf, schema=schema)

    nparts = partitions or spark.sparkContext.defaultParallelism
    chunk = n_events // nparts

    def gen(iterator):
        for pdf in iterator:
            for cid in pdf["id"]:
                cid = int(cid)
                n = chunk if cid < nparts - 1 else n_events - chunk * (nparts - 1)
                rng = np.random.default_rng((seed, cid))
                yield _make_batch(
                    rng,
                    lsn_start + cid * chunk,
                    n,
                    n_convs,
                    max_turns,
                    update_rate,
                    delete_rate,
                    out_of_order,
                    zipf_a,
                    tool_meta,
                )

    ids = spark.range(nparts).repartition(nparts, "id")
    return ids.mapInPandas(gen, schema=schema)
