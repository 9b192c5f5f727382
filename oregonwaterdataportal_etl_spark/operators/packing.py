"""Sequence packing for training-data pipelines.

Pretraining batches are built by CONCATENATING documents into a token
stream and CUTTING it every ``capacity`` tokens (GPT-style packing) —
documents may straddle a cut. ``pack_documents`` computes, fully
declaratively, where each document lands in that stream:

    (doc_id, shard, start_offset, bin_start, bin_end)

- the corpus is split into ``n_shards`` deterministic shards (60-bit
  md5 of the id modulo n_shards — the cross-engine hash discipline, so
  the DuckDB oracle reproduces the exact assignment);
- within a shard, documents are ordered by id and given their
  EXCLUSIVE running-token offset via ONE window cumsum;
- bin_start/bin_end = which cut bins the document's tokens fall into
  (floor division of the start/last-token offsets).

Scale notes (100 TB): the only shuffle is the per-shard window sort —
shards are hash-uniform, and n_shards is chosen so one shard's token
count fits a task (each shard is an independent stream; training
dataloaders consume shards in parallel anyway). No driver-side state,
no iteration; an entire corpus packs in one stage. The greedy
never-split bin-packing variant (first-fit) is deliberately NOT the
default: it needs sequential state per bin and underfills; cut-packing
is what large-scale LM pipelines actually do.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from .dedup import MD5_PRIME, md5_base_hash


def pack_documents(
    df: DataFrame,
    size_col: str = "n_tokens",
    id_col: str = "doc_id",
    capacity: int = 4096,
    n_shards: int = 16,
) -> DataFrame:
    """Assign every document its place in the concatenate-then-cut
    token stream. Returns (id, size, shard, start_offset, bin_start,
    bin_end); empty documents occupy no tokens and map to the bin at
    their start offset."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    shard = (md5_base_hash(F.col(id_col).cast("string")) % MD5_PRIME) % n_shards
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        df.select(
            F.col(id_col),
            F.col(size_col).cast("long").alias("size"),
            shard.cast("int").alias("shard"),
        )
        .withColumn("start_offset", F.coalesce(F.sum("size").over(w), F.lit(0)))
        # integer DIV, not double division: float rounding would corrupt
        # bin ids once offsets pass 2^53 tokens (a real corpus scale)
        .withColumn("bin_start", F.expr(f"start_offset div {capacity}"))
        .withColumn(
            "bin_end",
            F.expr(
                f"(start_offset + greatest(size - 1, 0L)) div {capacity}"
            ),
        )
    )
    return out


GREEDY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("size", T.LongType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("bin_id", T.LongType()),
        T.StructField("bin_fill", T.LongType()),
    ]
)


def pack_documents_greedy(
    df: DataFrame,
    size_col: str = "n_tokens",
    id_col: str = "doc_id",
    capacity: int = 4096,
    n_shards: int = 16,
) -> DataFrame:
    """NEVER-SPLIT packing variant: first-fit-decreasing within each
    shard (documents are whole; a document opens a new bin when no open
    bin fits it). For SFT-style training where examples must not
    straddle bins — the complement of pack_documents' cut-packing.

    The per-shard greedy scan is inherently sequential state, so it
    runs as applyInPandas over the SAME deterministic md5 shards (one
    Arrow batch per shard, vectorized ingest, a tight Python loop over
    the shard's docs — the documented acceptable Python boundary, like
    merge_asof). Documents larger than capacity get a bin of their own
    (bin_fill > capacity flags them for truncation downstream). Bin ids
    are globally unique as (shard, local ordinal) folded into a long.
    Deterministic: shard assignment and the FFD order (size desc, id
    asc) are pure functions of the data."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    shard = (md5_base_hash(F.col(id_col).cast("string")) % MD5_PRIME) % n_shards
    sized = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(size_col).cast("long").alias("size"),
        shard.cast("int").alias("shard"),
    )

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["size", "doc_id"], ascending=[False, True])
        shard_id = int(pdf["shard"].iloc[0])
        fills: list[int] = []  # bin ordinal -> tokens used
        assign: list[int] = []
        for sz in pdf["size"].to_numpy():
            placed = -1
            for b, used in enumerate(fills):
                if used + sz <= capacity:
                    placed = b
                    break
            if placed < 0:
                fills.append(0)
                placed = len(fills) - 1
            fills[placed] += int(sz)
            assign.append(placed)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "size": pdf["size"].to_numpy(),
                "shard": shard_id,
                "bin_id": [shard_id * 10_000_000_000 + b for b in assign],
                "bin_fill": [fills[b] for b in assign],
            }
        )

    return sized.groupBy("shard").applyInPandas(pack_shard, schema=GREEDY_SCHEMA)
