"""Physical-plan regression tests: the scale properties (pushdown,
broadcast, single-exchange merge, codegen) must survive refactors.
These are the engine's equivalent of the reference's documented
EXPLAIN plan (docker/frost/indices.sql:14-40)."""

import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_and_projection_pushdown(spark):
    """P1/P2/P6: predicate + column pruning must reach the parquet scan."""
    df = entrymod.q_filter_project(spark, SF)
    plan = plan_of(df)
    assert "IsNotNull(value)" in plan and "Not(EqualTo(event_type,error))" in plan
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and "props" not in m.group(1) and "ts" not in m.group(1), (
        "unused columns must be pruned from the scan"
    )


def test_broadcast_join_strategy(spark):
    """J1: dim lookups must be broadcast hash joins (no shuffle of the
    fact side)."""
    plan = plan_of(entrymod.q_broadcast_lookup_join(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_anti_join_strategy(spark):
    plan = plan_of(entrymod.q_anti_join_new_rows(spark, SF))
    assert "LeftAnti" in plan


def test_merge_plan_single_exchange(spark, tmp_path):
    """The merge's dedup+write pipeline must contain exactly ONE
    Exchange (repartition == window distribution == bucket layout)
    and carry the WindowGroupLimit rank pushdown WHEN the rule is
    enabled (the r6 session default disables it — the partial sort
    measured net-negative at local bandwidth — so this pin runs with
    Spark's default threshold to keep the capability pinned)."""
    prior = spark.conf.get("spark.sql.optimizer.windowGroupLimitThreshold")
    spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "1000")
    try:
        changes = spark.read.parquet(f"{SF}/events.parquet").selectExpr(
            "'insert' as op",
            "event_id as lsn",
            "cast(user_id as string) as conv_id",
            "cast(event_id % 50 as int) as turn_idx",
            "event_type as role",
            "props as text",
            "cast(null as string) as tool",
            "ts",
        )
        keys = ["conv_id", "turn_idx"]
        u = changes.repartition(8, *keys)
        w = Window.partitionBy(*keys).orderBy(F.desc("lsn"))
        out = (
            u.select("*", F.row_number().over(w).alias("__rn"))
            .filter("__rn = 1")
            .withColumn("_b", F.pmod(F.hash(*keys), F.lit(8)).cast("int"))
        )
        plan = plan_of(out)
        assert len(re.findall(r"\bExchange\b", plan)) == 1, plan
        assert "WindowGroupLimit" in plan
    finally:
        spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", prior)


def test_real_resolve_plan_single_exchange_no_python(spark, tmp_path):
    """The ACTUAL merge resolve (not the simplified pipeline above): one
    Exchange total, the ranking + metrics windows reuse it, the window
    sort carries the tie-break limbs, and no Python evaluation appears
    anywhere. Round-3 honesty note: the real plan has NO
    WindowGroupLimit — the min-over-partition metrics column blocks the
    rank pushdown (the measured map-side alternative was rejected,
    DESIGN.md §10) — so this test pins what the plan really is."""
    from pyspark.sql import types as T

    from oregonwaterdataportal_etl_spark.cdc.changegen import (
        CHANGE_SCHEMA,
        TRANSCRIPT_SCHEMA,
        generate_changes_pdf,
    )
    from oregonwaterdataportal_etl_spark.lake import LakeTable

    t = LakeTable.create(
        str(tmp_path / "t"), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], num_buckets=4
    )
    t.merge(spark.createDataFrame(generate_changes_pdf(2000, 100, seed=1)))
    upd = spark.createDataFrame(
        generate_changes_pdf(500, 100, seed=2, lsn_start=2000)
    )
    snap = t.snapshot()
    evolved = t.evolve_schema(
        T.StructType([f for f in upd.schema.fields if f.name not in ("op", "lsn")])
    )
    base = t._read_internal(spark, _snap=snap)
    tb1, tb2 = t._update_tiebreak(upd.columns, evolved, "op")
    upd_tagged = upd.select(
        *t._tag_select(upd.columns, evolved, {}),
        F.col("lsn").cast("long").alias("__lsn"),
        F.lit(1).cast("tinyint").alias("__op"),
        F.lit(1).alias("__src"),
        tb1.alias("__tb1"),
        tb2.alias("__tb2"),
    )
    base_tagged = base.select(
        *t._tag_select(base.columns, evolved, {}),
        F.col("_lsn").alias("__lsn"),
        F.lit(0).cast("tinyint").alias("__op"),
        F.lit(0).alias("__src"),
        F.lit(None).cast("long").alias("__tb1"),
        F.lit(None).cast("long").alias("__tb2"),
    )
    winners = t._resolve(base_tagged, upd_tagged, ["conv_id", "turn_idx"], 4)
    plan = plan_of(winners)
    assert len(re.findall(r"\bExchange\b", plan)) == 1, plan
    # r6: the metrics min shares the rank's partition+order spec with
    # an unbounded frame, so BOTH functions collapse into ONE Window
    # operator — one pass per sorted partition (was 2 ops pre-r6)
    assert len(re.findall(r"\bWindow\b", plan)) == 1, plan
    assert "row_number" in plan and "min(__src" in plan  # both in that one op
    assert "__tb1" in plan  # total-order limbs ride the window sort
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pack_documents_single_exchange(spark):
    """Sequence packing must be ONE hash exchange (shard) + window —
    no extra sort-merge machinery, no Python."""
    plan = plan_of(entrymod.q_pack_documents(spark, SF))
    assert len(re.findall(r"\bExchange\b", plan)) == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_topk_is_take_ordered(spark):
    """O1: global top-k must compile to TakeOrderedAndProject — a
    per-partition top-k + k-row reduce, never a full sort."""
    plan = plan_of(entrymod.q_topk_orders(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_agg_has_partial_phase(spark):
    """A-family: groupBy aggregates must keep map-side partial
    aggregation (two HashAggregate phases around the shuffle)."""
    plan = plan_of(entrymod.q_tpch1_agg(spark, SF))
    assert len(re.findall(r"HashAggregate", plan)) >= 2


def test_whole_stage_codegen_on_scalar_functions(spark):
    """F-series expressions must stay inside WholeStageCodegen."""
    plan = plan_of(entrymod.q_deterministic_hash(spark, SF))
    # "*(n)" prefixes mark WholeStageCodegen stages in toString output
    assert re.search(r"\*\(\d+\)", plan)
    # and no python UDF anywhere in the scalar path
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_no_python_udf_in_text_functions(spark):
    plan = plan_of(entrymod.q_token_stats(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_partition_pruning_merge_reads_only_touched_buckets(spark, tmp_path):
    """The bucket-file manifest is the engine's partition pruning: a
    1-key batch must scan only that key's bucket file(s)."""
    from oregonwaterdataportal_etl_spark.cdc.changegen import (
        CHANGE_SCHEMA,
        generate_changes_pdf,
    )
    from oregonwaterdataportal_etl_spark.lake import LakeTable
    from oregonwaterdataportal_etl_spark.cdc.changegen import TRANSCRIPT_SCHEMA

    t = LakeTable.create(
        str(tmp_path / "t"), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], num_buckets=16
    )
    t.merge(spark.createDataFrame(generate_changes_pdf(4000, 300, seed=2)))
    one = spark.createDataFrame(
        [("update", 10**7, "conv_00000003", 1, "user", "x", None, None)],
        schema=CHANGE_SCHEMA,
    )
    r = t.merge(one)
    assert len(r.touched_buckets) == 1
