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


_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def ensure_scalable_state_store(spark: SparkSession) -> None:
    """Pin the RocksDB state-store provider on sessions not built by
    ``session.get_spark`` (the grading driver builds its own): stateful
    state (session windows, running distinct, interval-join buffers)
    must spill to local disk, not live in executor heap, once inputs
    are 100× the test scale. Runtime-settable — the provider is read
    when a query STARTS, so setting it here covers every stream these
    runners launch. One constraint: a checkpoint written under one
    provider cannot be resumed under another (Spark refuses), so this
    is applied by the run helpers whose checkpoints they themselves
    create or resume within the same configured session."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB_PROVIDER)
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true",
    )


def read_event_stream(
    spark: SparkSession, path: str, ts_is_nanos: bool | None = None
) -> DataFrame:
    """File-source stream over an events parquet path. Explicit schema —
    streaming sources never infer (SURVEY.md §1.3) — but the TIMESTAMP
    physical type is probed from the footers first (one metadata-only
    batch read): a TIMESTAMP(NANOS) source surfaces ``ts`` as long under
    ``nanosAsLong`` and is converted exactly like ``catalog.load_table``;
    a TIMESTAMP(MICROS) source streams natively. Hard-coding either
    (``ts_is_nanos``) breaks silently when the data generator changes
    its timestamp resolution — which happened: rows-only streaming
    queries produced 1970-era windows for a while because nothing
    compared their event times to an oracle."""
    if ts_is_nanos is None:
        # Probe under nanosAsLong, then RESTORE the session conf when the
        # source turns out to be MICROS: leaving it set session-wide would
        # silently surface every later-read TIMESTAMP(NANOS) column as
        # bigint in plain batch reads (catalog.load_table re-sets it
        # itself when it needs it).
        conf_key = "spark.sql.legacy.parquet.nanosAsLong"
        prior = spark.conf.get(conf_key, None)
        spark.conf.set(conf_key, "true")
        try:
            probe = spark.read.parquet(path).schema
            ts_is_nanos = dict(
                (f.name, f.dataType.simpleString()) for f in probe
            ).get("ts") == "bigint"
        except Exception:
            # Empty/not-yet-created source dir (routine for a file
            # stream started before data lands): no footers to probe,
            # assume the native µs schema — the common case — and let
            # the stream start.
            ts_is_nanos = False
        if not ts_is_nanos:
            if prior is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prior)
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


def tumbling_agg_stream(
    events: DataFrame, minutes: int = 5, watermark: str | None = "10 minutes"
) -> DataFrame:
    """ST2: watermarked tumbling-window count/sum per event_type — the
    streaming twin of ``operators.events.tumbling_counts`` (same logical
    plan modulo the watermark). Pass ``watermark=None`` when composing
    AFTER another stateful operator that already set one — Spark
    disallows redefining the watermark in a chained-stateful query."""
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", f"{minutes} minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_agg_stream(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "60 minutes"
) -> DataFrame:
    """Streaming gap-based sessionization via the NATIVE
    ``session_window`` primitive — the streaming twin of
    ``operators.events.session_window_agg`` (same gap convention, same
    output grain). Sessions merge inside the stateful aggregation
    operator as events arrive; state is bounded by the watermark: a
    session finalizes (and is emitted, append mode) once the watermark
    passes its close (last event + gap), so per-user open-session state
    never outlives ``watermark`` beyond the gap. Same cross-file
    disorder assumption as ``interval_join_stream`` — see that
    docstring."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", f"{gap_minutes} minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.max("ts").alias("last_ts"),
        )
        .select("user_id", "session_start", "n_events", "last_ts")
    )


def dedup_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Exactly-once-ish ingest: drop duplicate event_ids within the
    watermark horizon — bounded state, the streaming analog of the
    upsert probe's "have I seen this key" (SURVEY.md ST2)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming plan to completion over the currently-available
    input (AvailableNow), landing rows in an in-memory table ``name`` —
    the test/bench harness for every streaming job here.

    ``output_mode="complete"`` re-emits the FULL aggregate state every
    batch (watermark eviction is disabled), so after the drain the table
    holds exactly the batch-equivalent answer — including sessions that
    merged across batches, whose earlier emissions a keyed upsert of
    update-mode output could not retract (the session key itself moves
    when sessions merge). Append mode emits only watermark-finalized
    rows and never retracts — the production continuous-pipeline shape.

    Returns the terminated query handle (its ``lastProgress`` keeps the
    state-store metrics readable after the drain — used by tests to
    assert the RocksDB provider actually held the state).
    """
    ensure_scalable_state_store(stream_df.sparkSession)
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_with_processing_time(
    stream_df: DataFrame,
    name: str,
    interval: str = "1 second",
    idle_polls: int = 10,
) -> None:
    """ST1's other trigger form: a continuous ``processingTime`` cadence
    (the direct analog of the reference's 5-minute Dagster cron,
    pipelines/dagster_pipeline.py:17-22 — AvailableNow is the drain-and-
    stop analog; this is the stay-up-and-tick one). Runs the stream on
    the given cadence until the source is drained (no data available and
    no batch in flight for ``idle_polls`` consecutive polls), then stops
    — which is how a test or a bounded backfill uses a production
    trigger. A real deployment would simply never call the stop half.
    """
    import time

    ensure_scalable_state_store(stream_df.sparkSession)
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(processingTime=interval)
        .start()
    )
    try:
        idle = 0
        while idle < idle_polls:
            s = q.status
            if q.exception() is not None:
                break
            if s["isDataAvailable"] or s["isTriggerActive"]:
                idle = 0
            else:
                idle += 1
            time.sleep(0.2)
    finally:
        q.stop()
        q.awaitTermination()


def interval_join_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    minutes: int = 30,
    watermark: str = "60 minutes",
) -> DataFrame:
    """Watermarked stream-stream interval join: purchases attributed to
    each same-user click in the preceding ``minutes`` — the streaming
    twin of ``operators.events.click_purchase_interval_join`` (identical
    predicate; the batch plan is the differential oracle in tests).

    Both sides carry a watermark and the join condition bounds
    purchase_ts relative to click_ts, so each side's buffered state is
    evictable: a click older than (watermark + interval) can never match
    a future purchase and is dropped — the bounded-state contract every
    stateful op here follows.

    ASSUMPTION (batch-equivalence): with ``maxFilesPerTrigger=1`` the
    stream ingests file-by-file, so cross-file event-time disorder must
    stay under the 60-minute default watermark or the stream can
    legitimately drop matches its batch twin keeps. The current testdata
    is a single events file per SF (zero cross-file disorder); if the
    generator ever splits events across non-time-ordered files, size
    ``watermark`` from the source's max observed disorder — the
    stream-vs-batch equality test (tests/test_streaming.py) is the loud
    failure that flags it.
    """
    c = (
        clicks.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", watermark)
    )
    p = (
        purchases.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            "value",
        )
        .withWatermark("purchase_ts", watermark)
    )
    return c.join(
        p,
        F.expr(
            f"""
            user_id = p_user_id AND
            purchase_ts >= click_ts AND
            purchase_ts < click_ts + INTERVAL {minutes} MINUTES
            """
        ),
    ).select(
        "user_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.round(F.col("value"), 2).alias("purchase_value"),
    )


def _skippable_empty_batch(batch_df: DataFrame, sink_path: str) -> bool:
    """True when a foreachBatch MERGE can be skipped with IDENTICAL sink
    content (r12, guide §1.2 "don't compute things you throw away").

    Every AvailableNow drain here runs a final NO-DATA micro-batch (the
    runtime schedules it to advance the watermark and finalize state);
    in update mode that batch emits zero rows, yet the MERGE machinery
    still read the whole sink, full-outer-joined it against nothing and
    committed a byte-identical new version — measured ~0.6 s of the
    ~1.8 s warm drain floor at sf0.1. Merging an empty delta cannot
    change sink CONTENT (no batch rows → every update/insert leg is
    false; the delete leg requires a matched batch row), so skipping it
    is result-identical. The skip is gated on the sink already existing
    non-empty: the very first commit must still run so an empty SOURCE
    still creates a readable (empty) sink, exactly as before."""
    import os

    from spendinganalysisetl_spark.sources.upsert import _sink_is_empty

    if not os.path.exists(sink_path) or _sink_is_empty(sink_path):
        return False
    return batch_df.isEmpty()


def run_foreach_batch_upsert(
    stream_df: DataFrame,
    sink_path: str,
    compare_col: str = "n_events",
    key: tuple[str, ...] | None = None,
    checkpoint: str | None = None,
) -> None:
    """ST2 sink rule: each micro-batch MERGEs into the parquet report
    sink via the same conditional-upsert used in batch — idempotent
    across replays (re-delivered batches lose the compare), which is the
    exactly-once story for a non-transactional sink.

    Driven in UPDATE mode this is also the finalized-window drain: the
    watermark withholds unfinalized windows from an append-mode sink
    (round 1: 8951 vs the batch twin's 8953 rows), but update mode
    emits every changed window each batch and the MERGE keeps the
    latest value per key, so after an AvailableNow drain the sink holds
    exactly the batch aggregation — no held-back rows."""
    from spendinganalysisetl_spark.sources.upsert import KEY, merge_reports

    def _merge(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        if _skippable_empty_batch(batch_df, sink_path):
            return
        merge_reports(
            spark, sink_path, batch_df, compare_col=compare_col, key=key or KEY
        )

    ensure_scalable_state_store(stream_df.sparkSession)
    writer = stream_df.writeStream.outputMode("update").foreachBatch(_merge)
    if checkpoint is not None:
        # With a checkpointLocation the drain is RESTARTABLE: a later run
        # against the same checkpoint restores window state and source
        # offsets, processes only new files, and emits updated CUMULATIVE
        # window values — which the MERGE folds in (growth wins). This is
        # the production incremental-drain loop; without it each run
        # recomputes from scratch (fine for the one-shot bench drains).
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()


def run_foreach_batch_fanout(
    stream_df: DataFrame,
    sink_path: str,
    factory,
    table: str,
    key: tuple[str, ...],
    compare_col: str,
    checkpoint: str | None = None,
) -> None:
    """One stream, TWO sinks, one delivery contract: each micro-batch
    MERGEs into the parquet lake sink AND the external warehouse inside
    a single foreachBatch — the lambda-architecture tail (lake for
    reprocessing, warehouse for serving) without running the pipeline
    twice.

    There is no cross-system transaction here and foreachBatch offers
    none: a crash between the two writes leaves the warehouse one batch
    behind the lake until the replay. Consistency comes from BOTH legs
    being idempotent keyed MERGEs (compare-gated, exactly like their
    standalone drains) — the replayed batch re-applies as a no-op on
    whichever sink already has it, so the pair re-converges instead of
    double-counting. That is the standard exactly-once-at-each-table
    recipe for non-transactional multi-sink fan-out; systems needing
    atomic cross-sink visibility stage through ONE transactional sink
    and replicate from it instead.

    The batch is cached for the two consumers — without it each leg
    re-runs the upstream stateful aggregation's output projection.
    """
    from spendinganalysisetl_spark.sources.dbsink import upsert_to_db
    from spendinganalysisetl_spark.sources.upsert import merge_reports

    def _fanout(batch_df: DataFrame, epoch_id: int) -> None:
        # Same skip rule as run_foreach_batch_upsert: both legs are
        # idempotent keyed MERGEs, so an empty delta is a no-op on each.
        if _skippable_empty_batch(batch_df, sink_path):
            return
        batch_df.persist()
        try:
            merge_reports(
                batch_df.sparkSession,
                sink_path,
                batch_df,
                compare_col=compare_col,
                key=key,
            )
            upsert_to_db(
                batch_df, factory, table, key=key, compare_col=compare_col
            )
        finally:
            batch_df.unpersist()

    ensure_scalable_state_store(stream_df.sparkSession)
    writer = stream_df.writeStream.outputMode("update").foreachBatch(_fanout)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()


def enriched_agg_stream(
    events: DataFrame,
    dim: DataFrame,
    dim_key: str = "user_id",
    group_col: str = "segment",
    watermark: str = "10 minutes",
    minutes: int = 5,
) -> DataFrame:
    """Stream-STATIC join → windowed aggregation: each micro-batch
    equi-joins the event stream against a static dimension table
    (broadcast — no state, no watermark needed for the join itself,
    unlike stream-stream joins), then aggregates per (window, dim
    attribute). The canonical enrichment topology: facts stream, the
    dimension is a slowly-changing table re-read per batch.

    100 TB notes: a broadcast dim join inside a stream costs the same
    as in batch — the stream side never shuffles for it; only the
    windowed aggregation pays an exchange, keyed (window, segment) and
    bounded by the watermark. A dimension too big to broadcast becomes
    a shuffle join per micro-batch — at that point pre-bucket the dim
    on the join key or push the attribute upstream into the events.
    """
    return (
        events.withWatermark("ts", watermark)
        .join(F.broadcast(dim), dim_key)
        .groupBy(F.window("ts", f"{minutes} minutes"), group_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            group_col,
            "n_events",
            "total_value",
        )
    )


def run_foreach_batch_to_db(
    stream_df: DataFrame,
    factory,
    table: str,
    key: tuple[str, ...],
    compare_col: str | None = None,
    checkpoint: str | None = None,
    single_writer: bool = True,
) -> None:
    """Stream → external warehouse: each micro-batch lands through the
    staged set-based ``sources.dbsink.upsert_to_db`` MERGE — the
    reference's scheduled load to Snowflake (loader.py:7-15 +
    pipelines/dagster_pipeline.py) re-expressed as a continuous
    pipeline. Update mode + keyed MERGE makes delivery idempotent: a
    replayed batch (failure between sink commit and checkpoint commit)
    re-upserts the same keys and the compare gate drops non-growth, so
    the at-least-once stream becomes exactly-once AT THE TABLE — the
    same contract ``run_foreach_batch_upsert`` gives the parquet sink,
    now against any DBAPI target.

    100 TB notes: per-batch cost is one staged bulk load plus one
    set-based MERGE statement at the warehouse — never per-row cursor
    round-trips; writer parallelism inside the batch is the DataFrame's
    partition count (``upsert_to_db`` stages per-partition unless
    ``single_writer``). Checkpointing works exactly as in the parquet
    drain: pass ``checkpoint`` to make the drain restartable/incremental.
    """
    from spendinganalysisetl_spark.sources.dbsink import upsert_to_db

    def _load(batch_df: DataFrame, epoch_id: int) -> None:
        upsert_to_db(
            batch_df,
            factory,
            table,
            key=key,
            compare_col=compare_col,
            single_writer=single_writer,
        )

    ensure_scalable_state_store(stream_df.sparkSession)
    writer = stream_df.writeStream.outputMode("update").foreachBatch(_load)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
