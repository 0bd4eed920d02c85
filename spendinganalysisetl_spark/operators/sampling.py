"""Dataset-management operators for a training-data pipeline
(north_star family, next to dedup/similarity/text-analysis): split
assignment, stratified sampling, and corpus profiling.

Why hash-split instead of random-split: a training/validation/test
assignment must be (a) deterministic across runs and engines, (b) stable
under re-partitioning and appends — a row's split never changes when the
corpus grows — and (c) joinable from any table that carries the key.
``rand()``-based splits violate all three. Hashing the key into buckets
gives all of them, is embarrassingly parallel (a pure projection, no
shuffle), and the md5 fold used here is engine-portable so DuckDB
reproduces the assignment bit-for-bit (same device as the portable
MinHash family, functions.text.hex_fold).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spendinganalysisetl_spark.functions.text import hex_fold

N_BUCKETS = 1000


def split_bucket(key) -> F.Column:
    """Deterministic [0, N_BUCKETS) bucket from any key column: fold the
    first 7 hex chars of md5(key) (28 bits — fits a BIGINT fold exactly)
    and take the modulus."""
    return (hex_fold(F.md5(key.cast("string")), 1, 7) % N_BUCKETS).cast("int")


def assign_splits(
    documents: DataFrame,
    key: str = "doc_id",
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """Per-row train/val/test assignment (test gets the remainder)."""
    b = split_bucket(F.col(key))
    # floor(x + 0.5), not int() and not round(): float products truncate
    # below the intended boundary for common fractions (0.7*1000 ==
    # 699.999..., so int() would put bucket 699 in the wrong split), and
    # Python round() is banker's (half-to-even), which rounds an exact
    # .5 product (train=0.1225 -> 122.5) DOWN — half-up is the
    # documented convention here, same as the money path.
    t_hi = math.floor(train * N_BUCKETS + 0.5)
    v_hi = t_hi + math.floor(val * N_BUCKETS + 0.5)
    split = (
        # NULL key -> NULL split, surfaced for the caller to handle:
        # without this guard every when() is NULL (falsy) and otherwise()
        # silently concentrates all broken-identity rows into 'test'.
        F.when(F.col(key).isNull(), F.lit(None).cast("string"))
        .when(b < t_hi, F.lit("train"))
        .when(b < v_hi, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return documents.withColumn("split", split)


def split_profile(documents: DataFrame) -> DataFrame:
    """Aggregate profile of the split assignment: doc and char volume
    per split — the sanity report every split job emits."""
    return (
        assign_splits(documents)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .repartition(1)
        .sortWithinPartitions("split")
    )


def length_histogram(documents: DataFrame, bucket_width: int = 200) -> DataFrame:
    """Doc-length histogram (fixed-width buckets on n_chars) — the
    corpus-profiling scan that sizes tokenization/packing stages."""
    lo = (F.floor(F.col("n_chars") / bucket_width) * bucket_width).cast("long")
    return (
        documents.groupBy(lo.alias("bucket_lo"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .repartition(1)
        .sortWithinPartitions("bucket_lo")
    )


def length_buckets(documents: DataFrame, n_buckets: int = 8) -> DataFrame:
    """Length-bucketed batching plan: assign every doc to one of
    ``n_buckets`` equal-count buckets by character length (``ntile``
    over a deterministic (n_chars, doc_id) order) and profile each
    bucket — the pre-pass that groups similar-length sequences so a
    training batch pads to its bucket's max instead of the corpus max
    (padding waste ∝ intra-batch length spread).

    Scale note: ntile needs a total order, which Spark plans as a global
    sort — acceptable here because this is a PLANNING pass over doc
    lengths (two longs per doc, not text), and the alternative
    (approx-percentile boundaries + a range join) loses the exact
    equal-count property the batch scheduler wants. The profile output
    is n_buckets rows."""
    w = Window.orderBy(F.col("n_chars").asc(), F.col("doc_id").asc())
    return (
        documents.select("doc_id", "n_chars")
        .withColumn("bucket", F.ntile(n_buckets).over(w))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.round(F.avg("n_chars"), 2).alias("mean_chars"),
            # padding waste if each bucket pads to its max
            (F.max("n_chars") * F.count(F.lit(1)) - F.sum("n_chars"))
            .cast("long")
            .alias("pad_waste_chars"),
        )
        .repartition(1)
        .sortWithinPartitions("bucket")
    )


def numeric_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """``ANALYZE TABLE``-style numeric column profile: one row per
    column with count, null count, min, max, mean, and sample stddev
    (4dp) — the stats pass that feeds partition sizing, skew detection,
    and data-quality gates before a big job runs.

    Scale shape: ONE full-scan aggregation computes every statistic for
    every column simultaneously (6·k scalar aggregates, all map-side
    combined into one row), then a k-row ``stack`` unpivots it — the
    table is scanned once no matter how many columns are profiled, and
    only k·6 numbers ever move.
    """
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"{c}__count"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).cast("long").alias(f"{c}__nulls"),
            F.min(col).cast("double").alias(f"{c}__min"),
            F.max(col).cast("double").alias(f"{c}__max"),
            F.round(F.avg(col), 4).alias(f"{c}__mean"),
            F.round(F.stddev_samp(col), 4).alias(f"{c}__stddev"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__count, {c}__nulls, {c}__min, {c}__max, {c}__mean, {c}__stddev"
        for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_values, n_nulls, min_value, max_value, mean_value, stddev_value)"
        )
    ).repartition(1).sortWithinPartitions("column_name")


def shuffle_shards(
    documents: DataFrame,
    n_shards: int = 8,
    seed: int = 42,
    key: str = "doc_id",
) -> DataFrame:
    """Deterministic global corpus shuffle into ``n_shards`` training
    shards: every row gets a shard assignment and a position within its
    shard, both derived only from ``(seed, key)``.

    This is the "shuffle the corpus before training" step of a data
    pipeline, done the way a distributed job must do it: not an actual
    random permutation (which would need a global sort over corpus-sized
    state and change on every run) but a hash shuffle — ``h =
    fold(md5(seed:key))`` gives a pseudo-random 56-bit sort key, the
    shard is ``h % n_shards``, and the intra-shard order is ``(h,
    key)``. Same determinism/stability/engine-portability argument as
    ``assign_splits`` (module docstring): re-runs, re-partitions, and
    appends never move an existing row's shard, and the DuckDB oracle
    reproduces every assignment bit-for-bit.

    Scale shape: the assignment is a pure projection (no shuffle); the
    position is a ``row_number`` window PARTITIONED by shard — one
    exchange on the shard key, then shards number independently in
    parallel. One shard flows through one task, which is exactly the
    contract "one shard = one ordered output file" implies — at 100 TB
    you pick ``n_shards`` so a shard is file-sized (hundreds of MB), so
    tasks stay uniform (md5 is unskewed by construction). A writer that
    doesn't need explicit positions drops the window entirely:
    ``df.repartition(n_shards, h).sortWithinPartitions(h, key)`` feeds
    the same order straight to the sink with no second exchange.

    NULL keys hash to NULL and land in a NULL shard with NULL
    positions, surfaced for the caller (same policy as assign_splits).
    """
    h = hex_fold(
        F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(key).cast("string"))),
        1,
        14,
    )
    with_key = documents.withColumn("h", h).withColumn(
        "shard_id", (F.col("h") % n_shards).cast("int")
    )
    w = Window.partitionBy("shard_id").orderBy("h", key)
    return with_key.withColumn(
        "pos", F.row_number().over(w).cast("long")
    ).drop("h")


def stratified_sample(
    documents: DataFrame,
    fractions: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Per-language stratified sample (``sampleBy``): down-weight
    over-represented strata, e.g. balancing languages before training.
    Engine-specific RNG → rows-only; determinism-for-a-seed and
    per-stratum rate bounds are pinned in tests."""
    return documents.sampleBy("lang", fractions, seed)


def _uniform_draw(key: str, seed: int) -> F.Column:
    """Deterministic uniform u ∈ (0, 1] from a 52-bit md5 fold of
    ``seed:key`` — the ONE draw shared by ``weighted_sample`` and
    ``stratified_sample_hash`` (and mirrored by their SQL twins in the
    registry; change fold width/seed format in all places together)."""
    return (
        hex_fold(
            F.md5(
                F.concat_ws(":", F.lit(str(seed)), F.col(key).cast("string"))
            ),
            1,
            13,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(1 << 52))


def weighted_sample(
    documents: DataFrame,
    k: int = 100,
    weight_col: str = "n_chars",
    key: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis), made
    deterministic and engine-portable: each row draws a uniform
    u ∈ (0, 1] from a 52-bit md5 fold of ``seed:key`` (the same
    portable-hash device as the split/shard family) and gets priority
    ``ln(u) / w`` — the log form of the E-S key ``u^(1/w)`` — and the
    sample is the ``k`` LARGEST priorities. Inclusion probability scales
    with weight; the token-budget-aware corpus selection a data recipe
    uses ("sample 10M docs, longer docs proportionally more often").

    Deterministic-by-hash for the same reasons as ``assign_splits``:
    reproducible across runs/engines, append-stable (a new row never
    changes an old row's draw), and auditable row-by-row.

    Rows with NULL or non-positive weight are excluded (no valid draw).

    Scale shape: the draw+priority is a pure projection (one md5 per
    row, no shuffle); selection is a top-k — per-partition heaps, k·P
    candidate rows to one final selection (TakeOrderedAndProject), so
    the corpus is never globally sorted. ``priority`` is emitted
    rounded, with ``+ 0.0`` canonicalizing IEEE -0.0 (tiny-magnitude
    negative priorities round to zero).
    """
    u = _uniform_draw(key, seed)
    w = F.col(weight_col).cast("double")
    pri = F.log(u) / w
    # ~isnan too: Spark's non-IEEE ordering makes NaN > 0 TRUE, and a
    # NaN priority would sort above every real one in the top-k.
    return (
        documents.filter(
            F.col(weight_col).isNotNull() & ~F.isnan(w) & (w > 0)
        )
        .select(
            F.col(key),
            F.col(weight_col).cast("long").alias("weight"),
            pri.alias("_pri"),
        )
        .orderBy(F.col("_pri").desc(), F.col(key).asc())
        .limit(k)
        .select(
            key,
            "weight",
            (F.round(F.col("_pri"), 6) + F.lit(0.0)).alias("priority"),
        )
    )


def stratified_sample_hash(
    documents: DataFrame,
    fractions: dict[str, float],
    strat_col: str = "lang",
    key: str = "doc_id",
    seed: int = 11,
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff its md5-fold
    uniform draw falls under its stratum's fraction. The hash-based
    analog of ``sampleBy`` with the properties RNG sampling lacks
    (same rationale as ``assign_splits``): identical selection across
    runs, engines, and repartitionings; append-stable (new rows never
    flip old rows' draws); joinable row-level audit of WHY a row was
    kept. Strata not in ``fractions`` drop (rate 0), matching sampleBy.

    Scale shape: a pure projection + filter — no shuffle, no state;
    the per-stratum rate lands within O(1/sqrt(n)) of the target like
    any Bernoulli sampler.
    """
    u = _uniform_draw(key, seed)
    rate = None
    for stratum, frac in sorted(fractions.items()):
        rate = (
            F.when(F.col(strat_col) == stratum, F.lit(float(frac)))
            if rate is None
            else rate.when(F.col(strat_col) == stratum, F.lit(float(frac)))
        )
    rate = rate.otherwise(F.lit(0.0)) if rate is not None else F.lit(0.0)
    return documents.filter(u <= rate)
