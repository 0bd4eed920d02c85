"""Streaming pipelines (SURVEY.md §2.9 ST1-ST3).

The reference's "streaming" is a Dagster cron that recomputes the whole
batch every 5 minutes with upsert-state in the sink
(/root/reference/pipelines/dagster_pipeline.py:17-22 +
transformer.py:30-76). The Structured Streaming mapping:

- ST1 trigger      → ``trigger(processingTime=...)`` or AvailableNow
  (AvailableNow = "drain what exists then stop", the faithful analog of
  a cron tick over accumulated input).
- ST2 late data    → watermark + windowed aggregation; the sink-side
  "update only if count grew" rule → idempotent ``foreachBatch`` MERGE
  (sources.upsert.merge_reports).
- ST3 job graph    → one query per pipeline; Spark stages the DAG.

These run against a parquet directory source so tests can drive them
synchronously (AvailableNow + awaitTermination); swapping the source for
kafka/socket is a config change, not a code change — the transformation
graph is identical. State (windows, dedup sets) is bounded by the
watermark, so a 1000-executor run holds per-window partial state only
until the watermark passes — the unbounded-state trap is avoided by
always pairing stateful ops with a watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, ts_is_nanos: bool = False
) -> DataFrame:
    """File-source stream over an events parquet path. Explicit schema —
    streaming sources never infer (SURVEY.md §1.3).

    ``ts_is_nanos=True`` streams the driver's raw table in place (its
    ``ts`` is parquet TIMESTAMP(NANOS), surfaced as long under
    ``nanosAsLong`` and converted here exactly like ``catalog.load_table``)
    — no copy of the source is written just to stream it."""
    if ts_is_nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = StructType(
            [
                StructField("event_id", LongType()),
                StructField("ts", LongType()),
                StructField("user_id", LongType()),
                StructField("event_type", StringType()),
                StructField("value", DoubleType()),
                StructField("props", StringType()),
            ]
        )
        raw = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def tumbling_agg_stream(events: DataFrame, minutes: int = 5, watermark: str = "10 minutes") -> DataFrame:
    """ST2: watermarked tumbling-window count/sum per event_type — the
    streaming twin of ``operators.events.tumbling_counts`` (same logical
    plan modulo the watermark)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{minutes} minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Exactly-once-ish ingest: drop duplicate event_ids within the
    watermark horizon — bounded state, the streaming analog of the
    upsert probe's "have I seen this key" (SURVEY.md ST2)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def run_to_memory(stream_df: DataFrame, name: str) -> None:
    """Drive a streaming plan to completion over the currently-available
    input (AvailableNow), landing rows in an in-memory table ``name`` —
    the test/bench harness for every streaming job here."""
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_foreach_batch_upsert(
    stream_df: DataFrame, sink_path: str, compare_col: str = "n_events"
) -> None:
    """ST2 sink rule: each micro-batch MERGEs into the parquet report
    sink via the same conditional-upsert used in batch — idempotent
    across replays (re-delivered batches lose the compare), which is the
    exactly-once story for a non-transactional sink."""
    from spendinganalysisetl_spark.sources.upsert import merge_reports

    def _merge(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        merge_reports(spark, sink_path, batch_df, compare_col=compare_col)

    q = (
        stream_df.writeStream.outputMode("update")
        .foreachBatch(_merge)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
