"""Source readers (SURVEY.md 2.1) + Structured Streaming CDC tail."""

import os

import pytest
from pyspark.sql import functions as F

from oregonwaterdataportal_etl_spark.cdc import ManifestLog, generate_changes
from oregonwaterdataportal_etl_spark.cdc.changegen import TRANSCRIPT_SCHEMA
from oregonwaterdataportal_etl_spark.lake import LakeTable
from oregonwaterdataportal_etl_spark.sources import readers
from oregonwaterdataportal_etl_spark.streaming import (
    start_cdc_stream,
    start_cdc_stream_zx,
    windowed_event_counts,
)

TSV = (
    "station_nbr\trecord_date\tinstantaneous_flow_cfs\n"
    "10371500\t01-15-2024 08:30\t17.1\n"
    "10371500\t01-16-2024\t15.2\n"
    "10371500\t01-17-2024\t\n"
)


def test_read_tsv_observations(spark, tmp_path):
    """S2 — projection, unit-from-header, null drop, format fallback
    (reference: parse_oregon_tsv, userCode/wrd/lib.py:56-102; golden
    first values 17.1/15.2 per test_upstream.py:258-275)."""
    p = tmp_path / "obs.tsv"
    p.write_text(TSV)
    df = readers.read_tsv_observations(spark, str(p))
    rows = df.orderBy("record_date").collect()
    assert [r["value"] for r in rows] == [17.1, 15.2]
    assert rows[0]["unit"] == "cfs"
    assert rows[0]["record_date"].strftime("%H:%M") == "08:30"
    # null kept when drop disabled (reference drop_rows_with_null_data)
    df2 = readers.read_tsv_observations(spark, str(p), drop_null_values=False)
    assert df2.count() == 3


def test_flatten_nested_results(spark):
    """S3 — explode the AWQMS ContinuousResults nesting."""
    data = [
        ("st1", [{"t": 1, "v": 2.0}, {"t": 2, "v": 3.0}]),
        ("st2", [{"t": 5, "v": 7.0}]),
    ]
    df = spark.createDataFrame(data, "station string, ContinuousResults array<struct<t:long,v:double>>")
    out = readers.flatten_nested_results(df, "ContinuousResults", ["station"])
    assert out.count() == 3
    assert set(out.columns) == {"station", "t", "v"}


def test_paginated_union_and_validate(spark):
    p1 = spark.createDataFrame([(1, "a")], ["id", "x"])
    p2 = spark.createDataFrame([(2, "b")], ["id", "x"])
    p3 = spark.createDataFrame([(3,)], ["id"])  # later page missing a col
    out = readers.paginated_union([p1, p2, p3])
    assert out.count() == 3 and set(out.columns) == {"id", "x"}
    readers.validate_columns(p1, ["id", "x"])
    with pytest.raises(ValueError, match="missing expected columns"):
        readers.validate_columns(p3, ["id", "x"])


def test_read_binary_attachments(spark, tmp_path):
    (tmp_path / "a.bin").write_bytes(b"hello")
    (tmp_path / "b.bin").write_bytes(b"world!")
    df = readers.read_binary_attachments(spark, str(tmp_path / "*.bin"))
    got = {os.path.basename(r["path"]): bytes(r["content"]) for r in df.collect()}
    assert got == {"a.bin": b"hello", "b.bin": b"world!"}


def test_streaming_cdc_tail(spark, tmp_path):
    """readStream file tail -> foreachBatch MERGE; final state equals a
    direct batch apply of the same stream."""
    changes = generate_changes(spark, n_events=3000, n_convs=200, seed=11)
    stream_dir = str(tmp_path / "stream")
    changes.write.mode("overwrite").parquet(stream_dir)

    t_stream = LakeTable.create(
        str(tmp_path / "t_stream"), TRANSCRIPT_SCHEMA, key_cols=["conv_id", "turn_idx"], num_buckets=8
    )
    manifests = ManifestLog(str(tmp_path / "manifests"))
    q = start_cdc_stream(
        spark, stream_dir, t_stream, str(tmp_path / "ckpt"), manifests, available_now=True
    )
    q.awaitTermination(120)

    t_batch = LakeTable.create(
        str(tmp_path / "t_batch"), TRANSCRIPT_SCHEMA, key_cols=["conv_id", "turn_idx"], num_buckets=8
    )
    t_batch.merge(spark.read.parquet(stream_dir))

    a = t_stream.read(spark).orderBy("conv_id", "turn_idx").collect()
    b = t_batch.read(spark).orderBy("conv_id", "turn_idx").collect()
    assert a == b and len(a) > 0
    assert manifests.all() and all(m["status"] == "committed" for m in manifests.all())


def test_streaming_zx_tail(spark, tmp_path):
    """Zero-exchange streaming loop: readStream tail -> per-batch
    bucketed WAL -> merge_prebucketed. Final state equals the batch
    path, per-batch WAL dirs are cleaned up, and EVERY micro-batch's
    resolve plan has zero Exchange (the production steady-state pin).

    maxFilesPerTrigger=1 over two stream files forces multiple
    micro-batches, so the second batch exercises the resolve against a
    non-empty base + tombstones — the steady state, not just the
    first-load special case."""
    c1 = generate_changes(spark, n_events=2500, n_convs=150, seed=21)
    c2 = generate_changes(
        spark, n_events=1500, n_convs=150, seed=22, lsn_start=2500
    )
    stream_dir = tmp_path / "zstream"
    c1.coalesce(1).write.mode("append").parquet(str(stream_dir))
    c2.coalesce(1).write.mode("append").parquet(str(stream_dir))

    t_zx = LakeTable.create(
        str(tmp_path / "t_zx"),
        TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        num_buckets=8,
    )
    manifests = ManifestLog(str(tmp_path / "zmanifests"))
    wal_dir = str(tmp_path / "zwal")
    plans: list[str] = []
    q = start_cdc_stream_zx(
        spark, str(stream_dir), t_zx, str(tmp_path / "zckpt"), manifests,
        wal_dir, available_now=True, plan_log=plans,
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    assert len(plans) >= 2, "expected one resolve plan per micro-batch"

    t_batch = LakeTable.create(
        str(tmp_path / "t_zbatch"),
        TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        num_buckets=8,
    )
    t_batch.merge(spark.read.parquet(str(stream_dir)))

    a = t_zx.read(spark).orderBy("conv_id", "turn_idx").collect()
    b = t_batch.read(spark).orderBy("conv_id", "turn_idx").collect()
    assert a == b and len(a) > 0
    assert plans, "no batch plans captured"
    for plan in plans:
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan
    # applied batches clean their WAL subdirs
    assert not [e for e in os.listdir(wal_dir) if e.startswith("batch-")]
    assert manifests.all() and all(
        m["status"] == "committed" for m in manifests.all()
    )

    # restart with more stream data: checkpoint resumes, already-applied
    # batches replay as manifest no-ops, new data lands
    c3 = generate_changes(
        spark, n_events=1000, n_convs=150, seed=23, lsn_start=4000
    )
    c3.coalesce(1).write.mode("append").parquet(str(stream_dir))
    q2 = start_cdc_stream_zx(
        spark, str(stream_dir), t_zx, str(tmp_path / "zckpt"), manifests,
        wal_dir, available_now=True, plan_log=plans,
    )
    q2.awaitTermination(180)
    t_batch.merge(c3)
    a = t_zx.read(spark).orderBy("conv_id", "turn_idx").collect()
    b = t_batch.read(spark).orderBy("conv_id", "turn_idx").collect()
    assert a == b


def test_windowed_event_counts(spark):
    changes = generate_changes(spark, n_events=2000, n_convs=100, seed=3)
    out = windowed_event_counts(changes, window="10 minutes", watermark="1 hour")
    rows = out.collect()
    assert sum(r["events"] for r in rows) == 2000
    assert all(r["window_end"] > r["window_start"] for r in rows)


def test_stateful_conversation_progress(spark, tmp_path):
    """Custom stateful operator: state persists across separate
    streaming runs through the checkpoint (restart survival)."""
    from oregonwaterdataportal_etl_spark.cdc.changegen import CHANGE_SCHEMA
    from oregonwaterdataportal_etl_spark.streaming.stateful import (
        conversation_progress,
    )

    stream_dir = tmp_path / "sstream"
    stream_dir.mkdir()
    ckpt = str(tmp_path / "sckpt")

    def run_once(tag):
        src = spark.readStream.schema(CHANGE_SCHEMA).parquet(str(stream_dir))
        collected = []

        def sink(batch_df, batch_id):
            collected.extend(batch_df.collect())

        q = (
            conversation_progress(src)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r["conv_id"]: r for r in collected}

    batch1 = [
        ("insert", 1, "c1", 0, "user", "a", None, None),
        ("insert", 2, "c1", 1, "user", "b", None, None),
        ("insert", 3, "c2", 0, "user", "c", None, None),
    ]
    spark.createDataFrame(batch1, schema=CHANGE_SCHEMA).write.mode("append").parquet(
        str(stream_dir)
    )
    out1 = run_once("a")
    assert out1["c1"]["events_seen"] == 2 and out1["c1"]["turns_seen"] == 2
    assert out1["c2"]["events_seen"] == 1

    # second run: new file, fresh query, SAME checkpoint -> state resumes
    batch2 = [
        ("update", 10, "c1", 1, "user", "b2", None, None),
        ("insert", 11, "c1", 2, "user", "d", None, None),
    ]
    spark.createDataFrame(batch2, schema=CHANGE_SCHEMA).write.mode("append").parquet(
        str(stream_dir)
    )
    out2 = run_once("b")
    assert out2["c1"]["events_seen"] == 4  # 2 + 2, state survived restart
    assert out2["c1"]["turns_seen"] == 3
    assert out2["c1"]["max_lsn"] == 11
    assert "c2" not in out2  # update mode: untouched groups not re-emitted


def test_streaming_zx_folds_pending_mor_deltas(spark, tmp_path):
    """A table carrying pending merge-on-read deltas when the zx stream
    starts: the first micro-batch's merge_prebucketed folds them (no
    compact needed), and the final state equals the batch path."""
    pre = generate_changes(spark, n_events=2000, n_convs=120, seed=31)
    tail = generate_changes(
        spark, n_events=1200, n_convs=120, seed=32, lsn_start=2000
    )
    stream_dir = str(tmp_path / "mstream")
    tail.coalesce(1).write.parquet(stream_dir)

    t_zx = LakeTable.create(
        str(tmp_path / "mt_zx"), TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"], num_buckets=8,
    )
    t_zx.merge(pre, mode="mor")
    assert t_zx.snapshot().get("deltas")

    q = start_cdc_stream_zx(
        spark, stream_dir, t_zx, str(tmp_path / "mckpt"),
        ManifestLog(str(tmp_path / "mman")), str(tmp_path / "mwal"),
        available_now=True,
    )
    q.awaitTermination(120)
    assert not t_zx.snapshot().get("deltas"), "stream merge should fold deltas"

    t_batch = LakeTable.create(
        str(tmp_path / "mt_b"), TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"], num_buckets=8,
    )
    t_batch.merge(pre)
    t_batch.merge(tail)
    a = t_zx.read(spark).orderBy("conv_id", "turn_idx").collect()
    b = t_batch.read(spark).orderBy("conv_id", "turn_idx").collect()
    assert a == b and len(a) > 0


def test_streaming_zx_partitioned_tree(spark, tmp_path):
    """start_cdc_stream_zx pointed at a PartitionedLakeTable: each
    micro-batch rides a day-partitioned WAL through the tree's
    merge_prebucketed — per-day plans Exchange-free, final state equal
    to the ordinary tree batch path, checkpoint restart resumes."""
    from pyspark.sql import functions as F

    from oregonwaterdataportal_etl_spark.lake import PartitionedLakeTable

    def spread_days(df):
        # conv-stable day offset so routing is deterministic per key
        return df.withColumn(
            "ts", F.expr("timestampadd(DAY, int(crc32(conv_id) % 3), ts)")
        )

    c1 = spread_days(generate_changes(spark, n_events=2000, n_convs=120, seed=31))
    c2 = spread_days(generate_changes(
        spark, n_events=1200, n_convs=120, seed=32, lsn_start=2000))
    stream_dir = tmp_path / "pzstream"
    c1.coalesce(1).write.mode("append").parquet(str(stream_dir))
    c2.coalesce(1).write.mode("append").parquet(str(stream_dir))

    tree = PartitionedLakeTable.create(
        str(tmp_path / "t_ptzx"), TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"], partition_col="ts", num_buckets=4,
    )
    manifests = ManifestLog(str(tmp_path / "pzman"))
    wal_dir = str(tmp_path / "pzwal")
    plans: list[str] = []
    q = start_cdc_stream_zx(
        spark, str(stream_dir), tree, str(tmp_path / "pzckpt"), manifests,
        wal_dir, available_now=True, plan_log=plans, max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    assert len(tree.partitions()) >= 2  # the stream really spread days
    assert plans and all("Exchange" not in p for p in plans)
    assert not [e for e in os.listdir(wal_dir) if e.startswith("batch-")]

    twin = PartitionedLakeTable.create(
        str(tmp_path / "t_pttwin"), TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"], partition_col="ts", num_buckets=4,
    )
    twin.merge(spark.read.parquet(str(stream_dir)))
    a = tree.read(spark).orderBy("conv_id", "turn_idx", "ts").collect()
    b = twin.read(spark).orderBy("conv_id", "turn_idx", "ts").collect()
    assert a == b and len(a) > 0

    # restart: committed batches no-op, new file lands
    c3 = spread_days(generate_changes(
        spark, n_events=800, n_convs=120, seed=33, lsn_start=3200))
    c3.localCheckpoint(eager=True).coalesce(1).write.mode("append").parquet(
        str(stream_dir))
    q2 = start_cdc_stream_zx(
        spark, str(stream_dir), tree, str(tmp_path / "pzckpt"), manifests,
        wal_dir, available_now=True,
    )
    q2.awaitTermination(180)
    twin.merge(spark.read.parquet(str(stream_dir)).filter(F.col("lsn") >= 3200))
    a = tree.read(spark).orderBy("conv_id", "turn_idx", "ts").collect()
    b = twin.read(spark).orderBy("conv_id", "turn_idx", "ts").collect()
    assert a == b
