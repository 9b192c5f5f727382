"""Conversation-level operators over turn-grained transcript tables.

The engine's lake rows are TURNS (keyed (conv_id, turn_idx)); training
pipelines and dedup need the CONVERSATION view: ordered assembly of a
conversation's turns into one text, a stable conversation fingerprint
(whole-conversation dedup — near-identical multi-turn sessions are the
dominant duplicate class in agent-transcript corpora), and per-
conversation shape statistics.

Scale shape: ONE groupBy(conv_id) shuffle for everything here —
ordering happens INSIDE the row via array_sort over collected
(turn_idx, text) structs, never a global sort. At 10^10 turns a
conversation is 10s-100s of rows, so per-group state is tiny and
map-side partial aggregation does most of the collection. Struct
sort order (turn_idx leads) makes the assembly deterministic under
any delivery/partition order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_prefix_fingerprint


def _assembled(order_col: str, text_col: str, sep: str) -> Column:
    """Ordered per-group concatenation: collect (order, text) structs,
    array_sort (order leads the struct => lexicographic = numeric
    order), then join the projected texts."""
    pairs = F.collect_list(
        F.struct(F.col(order_col).alias("o"), F.col(text_col).alias("t"))
    )
    return F.array_join(
        F.transform(F.array_sort(pairs), lambda p: p["t"]), sep
    )


def conversation_text(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """(conv, full_text): each conversation's turns concatenated in
    turn order — the unit LLM training samples are cut from."""
    return df.groupBy(conv_col).agg(
        _assembled(order_col, text_col, sep).alias("full_text")
    )


def conversation_fingerprint(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(conv, fingerprint): a stable hash of the order-assembled
    conversation — join two tables on it for whole-conversation exact
    dedup, or groupBy it to collapse re-ingested sessions. 'md5' gives
    the DuckDB-replicable 60-bit form (oracle:
    string_agg(text, sep ORDER BY turn_idx) under the same md5-prefix
    cast); 'xxhash64' is the at-scale default. The separator uses
    \\x1f (unit separator) so turn boundaries cannot be forged by
    newline-bearing turn text."""
    asm = _assembled(order_col, text_col, "\x1f")
    fp = (
        md5_prefix_fingerprint(asm)
        if hash_family == "md5"
        else F.xxhash64(asm)
    )
    return df.groupBy(conv_col).agg(fp.alias("fingerprint"))


def conversation_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    role_col: str = "role",
    tool_col: str = "tool",
) -> DataFrame:
    """Per-conversation shape statistics for curriculum / filtering:
    turn count, total text characters, distinct roles, tool-call count
    (non-null tool turns), and the max turn index (gap detection:
    max_turn_idx + 1 > n_turns means missing turns)."""
    return df.groupBy(conv_col).agg(
        F.count("*").alias("n_turns"),
        F.sum(F.length(F.coalesce(F.col(text_col), F.lit("")))).alias(
            "total_chars"
        ),
        F.count_distinct(F.col(role_col)).alias("n_roles"),
        F.count(F.col(tool_col)).alias("tool_calls"),
        F.max(F.col(order_col)).alias("max_turn_idx"),
    )
