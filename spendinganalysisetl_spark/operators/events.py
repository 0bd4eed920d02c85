"""Event-time operators over the ``events`` table — the batch-equivalent
of the reference's cron micro-batch (SURVEY.md §2.9: the reference
recomputes everything every 5 minutes via Dagster cron,
/root/reference/pipelines/dagster_pipeline.py:17-22; it has no windowed
aggregation). Tumbling windows here are the generalized form; the
streaming twin lives in ``streaming.jobs``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spendinganalysisetl_spark.functions.scalars import round2


def tumbling_counts(events: DataFrame, minutes: int = 5) -> DataFrame:
    """ST2 batch-equivalent: 5-minute tumbling window per event_type.
    ``F.window`` buckets event-time JVM-side; emitted as a window_start
    string for oracle comparison (DuckDB ``time_bucket``)."""
    return (
        events.groupBy(
            F.window("ts", f"{minutes} minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round2(F.sum("value")).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .repartition(1).sortWithinPartitions("window_start", "event_type")
    )


def sliding_counts(
    events: DataFrame, width_minutes: int = 10, slide_minutes: int = 5
) -> DataFrame:
    """Sliding (hopping) window per event_type: each event contributes to
    ``width/slide`` overlapping windows. ``F.window(ts, width, slide)``
    expands JVM-side (a generator, not a join), then the usual partial/
    final hash aggregation — the expansion factor is the constant
    width/slide, so the shuffle grows linearly, not quadratically, with
    the overlap."""
    return (
        events.groupBy(
            F.window(
                "ts", f"{width_minutes} minutes", f"{slide_minutes} minutes"
            ).alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round2(F.sum("value")).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .repartition(1).sortWithinPartitions("window_start", "event_type")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization without a session-window primitive in batch:
    lag(ts) per user → new-session flag on gap > threshold → running sum
    of flags = session id. Two windows over the same (user_id, ts)
    partitioning — one shuffle, both windows pipelined in a single sort.
    """
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_s = gap_minutes * 60
    # Parquet tz-less timestamps arrive as TIMESTAMP_NTZ under Spark 4's
    # inference; NTZ -> bigint is not a legal cast, so hop through
    # timestamp_ltz (identity for LTZ inputs, session-tz=UTC for NTZ).
    epoch = F.col("ts").cast("timestamp_ltz").cast("long")
    with_flag = events.select(
        "user_id",
        "ts",
        F.when(
            epoch - F.lag(epoch).over(w) > gap_s,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    sessioned = with_flag.withColumn(
        "session_seq", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sessioned.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        )
        .repartition(1).sortWithinPartitions("user_id", "session_seq")
    )


def click_purchase_interval_join(events: DataFrame, minutes: int = 30) -> DataFrame:
    """Event-time interval join: every purchase attributed to each click
    by the same user in the preceding ``minutes`` (click_ts <= purchase_ts
    < click_ts + interval). The batch twin of the watermarked
    stream-stream join in ``streaming.jobs.interval_join_stream`` —
    identical predicate, so the streaming run is differentially testable
    against this plan.

    Physical shape: the user_id equi-key carries the join (hash/SMJ on a
    uniform key — no cross product); the time band is a post-join filter
    over each user's clicks×purchases, bounded by per-user activity. At
    100 TB both sides would also be date-partitioned so the band prunes
    scan-side first.
    """
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"), "value"
    )
    return (
        clicks.join(purchases, "user_id")
        .filter(
            (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                < F.col("click_ts") + F.expr(f"INTERVAL {minutes} MINUTES")
            )
        )
        .select(
            "user_id",
            F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
            F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            round2(F.col("value")).alias("purchase_value"),
        )
        # Deliberately UNSORTED: the output is O(matched click×purchase
        # pairs) — unbounded in input size — so neither a global sort nor
        # a single-partition sort belongs here (the driver's comparison
        # is order-insensitive; large outputs stay unsorted, README).
    )


def session_window_agg(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions via Spark's NATIVE ``session_window`` — the
    batch form of the Structured Streaming session primitive. Must
    produce exactly the sessions ``sessionize`` derives with lag+cumsum
    (same gap convention: a gap strictly greater than ``gap_minutes``
    splits), which is what the DuckDB oracle checks differentially.
    One shuffle on user_id; session merging happens inside the
    aggregation operator, no self-join.
    """
    return (
        events.groupBy(
            "user_id", F.session_window("ts", f"{gap_minutes} minutes")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
        )
        .select("user_id", "session_start", "n_events")
        .repartition(1).sortWithinPartitions("user_id", "session_start")
    )


def props_value_stats(events: DataFrame) -> DataFrame:
    """Semi-structured extraction (SURVEY.md F5 beyond the sink
    boundary): parse the ``props`` JSON-string column and aggregate its
    ``k`` field per event type — the metadata-parsing step every event
    pipeline runs on its property bags.

    ``from_json`` with an explicit schema, not ``get_json_object``: one
    typed parse per row into a struct Catalyst can prune and reuse
    across any number of extracted fields (``get_json_object`` re-parses
    the string per field). Parsing happens scan-side inside codegen, so
    at 100 TB this is an embarrassingly parallel projection; the
    aggregation that follows is an ordinary map-side-combined hash agg
    on the (low-cardinality) event_type key. Malformed or missing JSON
    yields NULL (Spark PERMISSIVE mode ≡ DuckDB json_extract NULL),
    surfaced via ``n_with_k`` vs ``n_events``.
    """
    parsed = events.withColumn("p", F.from_json("props", "k BIGINT"))
    k = F.col("p.k")
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(k).alias("n_with_k"),
            F.sum(k).alias("sum_k"),
            F.round(F.avg(k), 6).alias("avg_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .repartition(1).sortWithinPartitions("event_type")
    )


def gap_fill_hourly(
    events: DataFrame, user_cap: int = 20, value_col: str = "value"
) -> DataFrame:
    """Time-series densification (the hypertable ``time_bucket_gapfill``
    operation): per user, an hourly grid spanning first→last activity,
    with ``n_events = 0`` for silent hours and the last observed hourly
    value CARRIED FORWARD (``last(..., ignorenulls)`` over an unbounded-
    preceding frame) — the regularization step before any fixed-step
    model consumes an irregular event stream.

    Scale shape: the grid derives from a per-user min/max aggregate
    (tiny) exploded via ``sequence`` — never a calendar cross join; the
    fill join is an equi-join on (user, hour); the carry-forward window
    partitions by user. ``user_cap`` bounds this oracle ground-truth
    form; uncapped, the same plan streams per-user — state is one row.
    """
    hourly = (
        events.filter(F.col("user_id") < user_cap)
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round2(F.sum(value_col)).alias("hour_value"),
        )
    )
    spans = hourly.groupBy("user_id").agg(
        F.min("hour").alias("mn"), F.max("hour").alias("mx")
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(hourly, ["user_id", "hour"], "left")
        .select(
            "user_id",
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.last("hour_value", ignorenulls=True).over(w).alias("carried_value"),
        )
    )


FUNNEL_STEPS = ("signup", "click", "purchase")


def funnel_conversion(events: DataFrame) -> DataFrame:
    """Ordered conversion funnel over the event stream: a user converts
    step k only with an event of that type STRICTLY AFTER their step-k−1
    conversion time (min-time semantics, the standard product-analytics
    funnel). Output: one row per step with reached-user counts and the
    step-over-step conversion rate.

    Scale shape: ONE scan, ONE shuffle. The step-k-after-step-k−1
    dependency chains as three windows over the SAME user partition
    (t1 = min s1 time; t2 = min s2 time > t1; t3 = min s3 time > t2 —
    each window may reference the previous one's output because they
    share the partitioning, so Spark plans one exchange and stacked
    WindowExecs), and the per-user rollup that follows groups on the
    partition key, so it reuses the exchange too. The earlier
    formulation expressed the dependency as join-back + re-aggregate
    and paid three corpus passes; no self-joins either way.
    """
    s1, s2, s3 = FUNNEL_STEPS
    wu = Window.partitionBy("user_id")
    steps3 = (
        events.select("user_id", "event_type", "ts")
        .withColumn(
            "t1", F.min(F.when(F.col("event_type") == s1, F.col("ts"))).over(wu)
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == s2) & (F.col("ts") > F.col("t1")),
                    F.col("ts"),
                )
            ).over(wu),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == s3) & (F.col("ts") > F.col("t2")),
                    F.col("ts"),
                )
            ).over(wu),
        )
        .groupBy("user_id")
        .agg(
            F.first("t1").alias("t1"),
            F.first("t2").alias("t2"),
            F.first("t3").alias("t3"),
        )
    )
    counts = steps3.agg(
        F.count(F.col("t1")).alias("n1"),
        F.count(F.col("t2")).alias("n2"),
        F.count(F.col("t3")).alias("n3"),
    )
    rate = lambda cur, prev: F.round(
        F.when(prev == 0, F.lit(None)).otherwise(
            cur.cast("double") / prev.cast("double")
        ),
        4,
    )
    return counts.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("step"),
                    F.lit(s1).alias("event_type"),
                    F.col("n1").alias("n_users"),
                    F.lit(None).cast("double").alias("conversion"),
                ),
                F.struct(
                    F.lit(2).alias("step"),
                    F.lit(s2).alias("event_type"),
                    F.col("n2").alias("n_users"),
                    rate(F.col("n2"), F.col("n1")).alias("conversion"),
                ),
                F.struct(
                    F.lit(3).alias("step"),
                    F.lit(s3).alias("event_type"),
                    F.col("n3").alias("n_users"),
                    rate(F.col("n3"), F.col("n2")).alias("conversion"),
                ),
            )
        ).alias("s")
    ).select("s.step", "s.event_type", "s.n_users", "s.conversion")


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity DATE
    (the cohort), then for each day-offset the count of cohort members
    active that day and the retention rate vs cohort size — the daily
    form of the classic weekly retention triangle (this stream spans 30
    days).

    Scale shape: ONE scan of the stream, never self-joined. The cohort
    date attaches as a min-window over the user partition; the distinct
    (user, day) reduction groups on the same key, reusing that
    exchange; and the cohort SIZE needs no second pass — every user is
    active on their own first day, so the day-0 cell of each cohort row
    IS the cohort population, recovered with a max-window over the
    cohort partition of the (tiny) matrix. The earlier formulation
    built first-activity and active-days as separate aggregates of the
    stream and paid the scan twice (plus a third, cohort-size pass).
    """
    matrix = (
        events.select("user_id", F.to_date("ts").alias("active_date"))
        .withColumn(
            "cohort_date",
            F.min("active_date").over(Window.partitionBy("user_id")),
        )
        .dropDuplicates(["user_id", "active_date"])
        .groupBy(
            "cohort_date",
            F.datediff("active_date", "cohort_date").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return (
        matrix.withColumn(
            "cohort_users",
            F.max(F.when(F.col("day_offset") == 0, F.col("n_active"))).over(
                Window.partitionBy("cohort_date")
            ),
        )
        .select(
            F.date_format("cohort_date", "yyyy-MM-dd").alias("cohort_date"),
            "day_offset",
            "n_active",
            "cohort_users",
            F.round(
                F.col("n_active").cast("double") / F.col("cohort_users"), 4
            ).alias("retention"),
        )
        .repartition(1)
        .sortWithinPartitions("cohort_date", "day_offset")
    )


def value_anomalies(
    events: DataFrame,
    window_seconds: int = 3600,
    z_threshold: float = 3.0,
    min_baseline: int = 30,
) -> DataFrame:
    """Streaming-monitor-style anomaly detection: flag events whose
    ``value`` deviates ≥ ``z_threshold`` sample standard deviations from
    the PRECEDING hour's per-type baseline (the current event is excluded
    from its own baseline — no self-masking). Events with fewer than
    ``min_baseline`` prior points don't score (cold-start guard), and
    near-constant baselines (sample variance ≤ 1e-6) don't score either
    — a z-score against a degenerate spread is noise, and the epsilon
    makes the constant-window case deterministic across engines.

    Scale shape: Spark has no retractable window aggregates, so a
    bounded sliding RANGE frame replays its whole frame per row —
    O(rows × frame) per partition; measured 2.3 s warm at sf1 (~278
    events/frame × 1M rows in ≤5 type-partition tasks). The preceding-
    hour stats are instead DIFFERENCES of two UNBOUNDED-PRECEDING
    cumulative frames (add-only, O(rows)): stats(-w,-1) = cum(..,-1) −
    cum(..,-(w+1)), carrying (n, Σu, Σu²) and closing mean/variance
    from the sufficient statistics. Values are CENTERED by the
    per-type min before accumulating (min is an exact, order- and
    null-independent selection, so both engines subtract the identical
    float): cumulative Σv² over a long partition grows like
    rows·offset², and differencing it for a window variance ≪ offset²
    is catastrophic cancellation — centering bounds the error by the
    data RANGE instead of the absolute offset, the standard shifted-
    data variance trick. Counts use count(value) (null-skipping, like
    the sums), so null-valued events are absent from n, Σu and Σu²
    consistently. One sort per type partition, three incremental frame
    passes over one exchange, identical closed forms in the DuckDB
    twin. Emits only anomalies (tiny output); ts formats after the
    filter so date_format prices on |anomalies|, not |events|.
    """
    # NTZ timestamps don't cast to double; epoch seconds via LTZ under
    # the pinned UTC session timezone (deterministic, both engines).
    epoch = F.col("ts").cast("timestamp_ltz").cast("long")

    centered = events.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        (
            F.col("value")
            - F.min("value").over(Window.partitionBy("event_type"))
        ).alias("u"),
    )

    def w(upper: int):
        return (
            Window.partitionBy("event_type")
            .orderBy(epoch)
            .rangeBetween(Window.unboundedPreceding, upper)
        )
    wa, wb = w(-1), w(-(window_seconds + 1))
    u2 = F.col("u") * F.col("u")
    # sum over an empty frame is NULL (count is 0) — coalesce keeps the
    # difference arithmetic total; an empty FRAME-A row has n_base 0 and
    # never survives the cold-start filter.
    scored = centered.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        "u",
        (F.count("u").over(wa) - F.count("u").over(wb)).alias("n_base"),
        (
            F.coalesce(F.sum("u").over(wa), F.lit(0.0))
            - F.coalesce(F.sum("u").over(wb), F.lit(0.0))
        ).alias("s_base"),
        (
            F.coalesce(F.sum(u2).over(wa), F.lit(0.0))
            - F.coalesce(F.sum(u2).over(wb), F.lit(0.0))
        ).alias("q_base"),
    )
    n = F.col("n_base").cast("double")
    mean = F.col("s_base") / n
    var = (F.col("q_base") - F.col("s_base") * F.col("s_base") / n) / (n - 1)
    z = (F.col("u") - mean) / F.sqrt(var)
    return (
        scored.filter(
            (F.col("n_base") >= min_baseline)
            & (var > 1e-6)
            & (F.abs(z) >= z_threshold)
        )
        .select(
            "event_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            F.round("value", 2).alias("value"),
            F.round(z, 4).alias("z_score"),
        )
        .repartition(1)
        .sortWithinPartitions("event_id")
    )


def props_variant_stats(events: DataFrame) -> DataFrame:
    """The VARIANT-typed twin of ``props_value_stats`` — the engine-level
    mapping of the reference's Snowflake VARIANT ``details`` column
    (README.md:44-51 DDL; SURVEY.md §1.2): ``parse_json`` produces a
    schema-on-read VARIANT value (no declared struct, unlike the
    ``from_json`` form) and ``variant_get`` does typed path extraction
    at use-sites — new JSON fields flow through ingest with no schema
    migration, exactly Snowflake's semi-structured contract.

    Same scan-side single parse + hash aggregation shape as the typed
    form; shares its oracle (the mechanisms must agree)."""
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "bigint")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.sum("k").cast("long").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .repartition(1)
        .sortWithinPartitions("event_type")
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for every
    consecutive event pair within a user's timeline, count
    (prev_type → next_type) and estimate P(next | prev) — the
    clickstream path-analysis summary behind "what do users do after X".

    Scale shape: ONE shuffle on user_id for the lag window (event_id
    tiebreak keeps ordering deterministic under timestamp collisions),
    then a partial/final count aggregation on the tiny
    |types|² key space; the conditional probability divides by a
    row-count window over the aggregated matrix — never a second pass
    over events. ``+ 0.0`` canonicalizes IEEE -0.0 on the rounded
    probability.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
    )
    matrix = pairs.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    row_total = Window.partitionBy("prev_type")
    return (
        matrix.withColumn(
            "p_next",
            F.round(
                F.col("n_transitions").cast("double")
                / F.sum("n_transitions").over(row_total),
                6,
            )
            + F.lit(0.0),
        )
        .repartition(1)
        .sortWithinPartitions("prev_type", "next_type")
    )


def running_distinct_users(events: DataFrame) -> DataFrame:
    """Cumulative distinct users by day (the running-DAU/"total accounts
    ever seen" curve): each user contributes on their FIRST-seen day,
    and a cumulative sum over the daily first-seen counts gives the
    expanding-window distinct count WITHOUT a distinct-over-window
    (which Spark disallows and a self-join would fake at N² cost).

    Scale shape: one user-keyed aggregation (min ts per user), one
    day-keyed count, then the cumulative window runs over ~days rows —
    data-sized shuffles are both on near-uniform keys, the
    unpartitioned window moves one row per day.
    """
    from pyspark.sql import Window

    firsts = events.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("first_day")
    )
    daily = firsts.groupBy("first_day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("first_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        daily.withColumn(
            "cum_users", F.sum("new_users").over(w).cast("long")
        )
        .select(
            F.date_format("first_day", "yyyy-MM-dd").alias("day"),
            F.col("new_users").cast("long").alias("new_users"),
            "cum_users",
        )
        .repartition(1)
        .sortWithinPartitions("day")
    )
