"""Regenerate PLANS.md: formatted physical plans of the flagship paths.

Usage: python scripts/dump_plans.py   (writes PLANS.md at the repo root)

The plan TESTS (tests/test_plans.py) are the enforcement; this file is
the human-readable snapshot of what those tests pin — refreshed by
running this script, never hand-edited.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

import __spark_entry__ as em  # noqa: E402
from oregonwaterdataportal_etl_spark.cdc.changegen import (  # noqa: E402
    TRANSCRIPT_SCHEMA,
    generate_changes_pdf,
)
from oregonwaterdataportal_etl_spark.lake import LakeTable  # noqa: E402
from oregonwaterdataportal_etl_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"


def formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def resolve_plan(spark, tmp):
    t = LakeTable.create(
        os.path.join(tmp, "t"), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"],
        num_buckets=4,
    )
    t.merge(spark.createDataFrame(generate_changes_pdf(2000, 100, seed=1)))
    upd = spark.createDataFrame(generate_changes_pdf(500, 100, seed=2, lsn_start=2000))
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
        tb1.alias("__tb1"), tb2.alias("__tb2"),
    )
    base_tagged = base.select(
        *t._tag_select(base.columns, evolved, {}),
        F.col("_lsn").alias("__lsn"),
        F.lit(0).cast("tinyint").alias("__op"),
        F.lit(0).alias("__src"),
        F.col("_tb1").alias("__tb1"), F.col("_tb2").alias("__tb2"),
    )
    return t._resolve(base_tagged, upd_tagged, ["conv_id", "turn_idx"], 4)


def zero_exchange_plan(spark, tmp) -> str:
    """merge_prebucketed's resolve over a bucketed WAL + base +
    tombstones: zero Exchange, zero sorts (ShuffledHashJoin)."""
    from oregonwaterdataportal_etl_spark.lake.bucketed import write_bucketed_wal

    t = LakeTable.create(
        os.path.join(tmp, "zx"), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"],
        num_buckets=4,
    )
    b1 = spark.createDataFrame(
        generate_changes_pdf(2000, 100, seed=3, delete_rate=0.1)
    ).localCheckpoint()
    b2 = spark.createDataFrame(
        generate_changes_pdf(500, 100, seed=4)
    ).withColumn("lsn", F.col("lsn") + 2000).localCheckpoint()
    w1, w2 = os.path.join(tmp, "w1"), os.path.join(tmp, "w2")
    write_bucketed_wal(b1, w1, 4, ["conv_id", "turn_idx"])
    write_bucketed_wal(b2, w2, 4, ["conv_id", "turn_idx"])
    t.merge_prebucketed(spark, w1)
    plans = []
    t.merge_prebucketed(spark, w2, _plan_out=plans)
    return plans[0]


def zero_exchange_fold_plan(spark, tmp) -> str:
    """merge_prebucketed with PENDING MOR DELTAS: the base/tomb/delta
    side gains a no-exchange pre-dedup window over the side-partitioned
    bucketed scan; still zero Exchange anywhere."""
    from oregonwaterdataportal_etl_spark.lake.bucketed import write_bucketed_wal

    t = LakeTable.create(
        os.path.join(tmp, "zxf"), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"],
        num_buckets=4,
    )
    b1 = spark.createDataFrame(
        generate_changes_pdf(2000, 100, seed=5, delete_rate=0.1)
    ).localCheckpoint()
    b2 = spark.createDataFrame(
        generate_changes_pdf(500, 100, seed=6)
    ).withColumn("lsn", F.col("lsn") + 2000).localCheckpoint()
    b3 = spark.createDataFrame(
        generate_changes_pdf(500, 100, seed=7)
    ).withColumn("lsn", F.col("lsn") + 4000).localCheckpoint()
    t.merge(b1)
    t.merge(b2, mode="mor")
    w3 = os.path.join(tmp, "w3")
    write_bucketed_wal(b3, w3, 4, ["conv_id", "turn_idx"])
    plans = []
    t.merge_prebucketed(spark, w3, _plan_out=plans)
    return plans[0]


def zero_exchange_compact_fold_plan(spark, tmp) -> str:
    """compact(fold_strategy='zx'): the delta fold with NO update side
    and NO join — base/tomb/delta winners resolve from the bucketed
    scan's own partitioning and pass straight to the write."""
    t = LakeTable.create(
        os.path.join(tmp, "cf"), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"],
        num_buckets=4,
    )
    b1 = spark.createDataFrame(
        generate_changes_pdf(2000, 100, seed=8, delete_rate=0.1)
    ).localCheckpoint()
    b2 = spark.createDataFrame(
        generate_changes_pdf(500, 100, seed=9)
    ).withColumn("lsn", F.col("lsn") + 2000).localCheckpoint()
    t.merge(b1)
    t.merge(b2, mode="mor")
    plans = []
    t._fold_deltas_zx(
        spark, [int(b) for b in t.snapshot()["deltas"]], _plan_out=plans
    )
    return plans[0]


def changelog_plan(spark, tmp):
    """read_changes between two versions: bucket-pruned resolved views
    on both sides + one full-outer join over touched buckets only."""
    t = LakeTable.create(
        os.path.join(tmp, "chg"), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"],
        num_buckets=4,
    )
    t.merge(spark.createDataFrame(generate_changes_pdf(2000, 100, seed=10)))
    v1 = t.current_version()
    t.merge(
        spark.createDataFrame(generate_changes_pdf(300, 100, seed=11))
        .withColumn("lsn", F.col("lsn") + 2000)
    )
    return t.read_changes(spark, v1)


def main() -> None:
    import tempfile

    spark = get_spark(app_name="plans", master="local[4]", shuffle_partitions=4)
    tmp = tempfile.mkdtemp(prefix="plansdump_")
    sections = [
        (
            "Zero-exchange pre-bucketed merge resolve (round 4)",
            "batch LWW dedup window + full-outer SHUFFLE_HASH join against "
            "base+tombstones, all from catalog bucketed scans: NO Exchange, "
            "NO per-task sorts. Pinned by "
            "test_prebucketed_plan_has_zero_exchanges",
            zero_exchange_plan(spark, tmp),
        ),
        (
            "Zero-exchange merge with MOR delta folding (round 4)",
            "pending deltas register as side=d of the bucketed base/tomb "
            "table; the combined side pre-dedups per key with a window the "
            "bucketed scan's partitioning satisfies — still NO Exchange. "
            "Pinned by test_prebucketed_merge_folds_pending_mor_deltas",
            zero_exchange_fold_plan(spark, tmp),
        ),
        (
            "Zero-exchange compaction delta fold (round 5)",
            "compact(fold_strategy='zx') — the fold has no update side and "
            "no join: base/tomb/delta winners resolve from the bucketed "
            "scan's own partitioning. Pinned by "
            "test_zx_delta_fold_equals_window_fold",
            zero_exchange_compact_fold_plan(spark, tmp),
        ),
        (
            "Incremental changelog read (round 5)",
            "read_changes: bucket-pruned resolved views of both snapshots "
            "+ one full-outer join over touched buckets only. Scan pruning "
            "pinned by test_changelog_scans_only_touched_buckets",
            changelog_plan(spark, tmp),
        ),
        (
            "CDC merge resolve (the one exchange)",
            "union(base+tombstones, updates) -> ONE repartition on the keys "
            "-> rank + metrics windows (tie-break limbs in the sort, "
            "min(__src) blocks WindowGroupLimit by design — DESIGN.md §10) "
            "-> bucket-aligned write. Pinned by test_real_resolve_plan_*",
            resolve_plan(spark, tmp),
        ),
        (
            "Grouped aggregate (tpch1_agg)",
            "map-side partial aggregation around one exchange; predicate + "
            "column pruning reach the scan. Pinned by test_agg_has_partial_phase",
            em.q_tpch1_agg(spark, SF),
        ),
        (
            "Broadcast dim join (broadcast_lookup_join)",
            "fact side never shuffles. Pinned by test_broadcast_join_strategy",
            em.q_broadcast_lookup_join(spark, SF),
        ),
        (
            "Global top-k (topk_orders)",
            "TakeOrderedAndProject: per-partition top-k + k-row reduce, no "
            "full sort. Pinned by test_topk_is_take_ordered",
            em.q_topk_orders(spark, SF),
        ),
        (
            "Sequence packing (pack_documents)",
            "one hash exchange (md5 shard) + window cumsum, exact DIV bin "
            "math. Pinned by test_pack_documents_single_exchange",
            em.q_pack_documents(spark, SF),
        ),
    ]
    out = [
        "# PLANS — formatted physical plans of the flagship paths",
        "",
        "Auto-generated by `python scripts/dump_plans.py` (sf0.001 inputs;",
        "operator shapes are scale-independent). The plan TESTS in",
        "tests/test_plans.py are the enforcement; this file is the",
        "human-readable snapshot.",
        "",
    ]
    for title, note, df in sections:
        plan = formatted(df) if hasattr(df, "sparkSession") else df
        out += [f"## {title}", "", note, "", "```", plan.strip(), "```", ""]
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
