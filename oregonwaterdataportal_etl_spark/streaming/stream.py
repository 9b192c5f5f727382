"""Structured Streaming surface of the CDC engine.

The reference's cron micro-batches (T1, userCode/wrd/dag.py:375-394)
map to Trigger.AvailableNow / processingTime over a file-source change
stream; the offset log maps to the checkpointLocation; the MERGE runs
in foreachBatch (the standard lakehouse CDC pattern — streaming MERGE
needs foreachBatch because MERGE is a batch op in every engine).

Exactly-once: Spark's checkpoint gives at-least-once foreachBatch
invocations; idempotence comes from our ManifestLog (batch-id no-op
replay) + the LakeTable per-row LSN guard — the same two layers the
batch runner uses, so crash/replay semantics are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cdc.manifests import ManifestLog
from ..lake.table import LakeTable


def start_cdc_stream(
    spark: SparkSession,
    stream_dir: str,
    table: LakeTable,
    checkpoint_dir: str,
    manifests: ManifestLog,
    schema=None,
    available_now: bool = True,
    processing_time: str = "10 seconds",
):
    """Tail a parquet change-stream directory into the lake table.

    Each micro-batch: LSN-window id -> manifest no-op check -> MERGE ->
    manifest commit. Returns the StreamingQuery.
    """
    from ..cdc.manifests import batch_id_for_window

    if schema is None:
        schema = spark.read.parquet(stream_dir).schema

    src = spark.readStream.schema(schema).parquet(stream_dir)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bounds = batch_df.agg(
            F.min("lsn").alias("lo"), F.max("lsn").alias("hi")
        ).collect()[0]
        bid = batch_id_for_window("stream", bounds["lo"], bounds["hi"])
        if manifests.is_committed(bid):
            return
        manifests.begin(bid, bounds["lo"], bounds["hi"])
        result = table.merge(batch_df)
        manifests.commit(bid, result.as_dict())

    writer = src.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def windowed_event_counts(
    changes: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time windowed aggregation with late-data watermarking —
    works on both batch and streaming DataFrames (same plan). The
    reference has no event-time windows (T7); this is the engine's
    extension for stream analytics over the change feed."""
    return (
        changes.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("op"))
        .agg(F.count("*").alias("events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "op",
            "events",
        )
    )
