"""Join family (SURVEY.md §2.3).

The reference has no explicit relational join — its two join-shaped
patterns are an N+1 HTTP lookup loop (J1, /root/reference/extractor.py:
21-31 + transformer.py:166-167) and an existence-probe upsert (J2,
transformer.py:46-65). J1 collapses into the catalog scan; J2 lives in
``sources.upsert``. This module exposes the general equi-join surface
the engine needs (SURVEY.md §7 Phase 4) so Catalyst's physical choice
(broadcast-hash / shuffled-hash / sort-merge, AQE-converted at runtime)
is exercised and oracle-checked.

Scale notes: dimension sides (nation, region, small filtered sets) are
broadcast explicitly; fact-fact joins are left to AQE which will pick
sort-merge with skew splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spendinganalysisetl_spark.functions.scalars import round2


def revenue_by_nation(
    customer: DataFrame, orders: DataFrame, nation: DataFrame
) -> DataFrame:
    """Inner 3-way: order revenue rolled up to customer nation.
    nation (25 rows) broadcast; customer⋈orders shuffles on custkey."""
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            round2(F.sum("o_totalprice")).alias("total_revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .repartition(1).sortWithinPartitions("n_name")
    )


def customer_order_counts(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left outer: every customer with order count, 0 when orderless —
    the left join preserves unmatched build-side rows."""
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .repartition(1).sortWithinPartitions("c_custkey")
    )


def customers_with_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left semi = EXISTS. Only customer columns survive; Spark plans a
    semi-join that short-circuits on first probe match."""
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .repartition(1).sortWithinPartitions("c_custkey")
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left anti = NOT EXISTS — the insert leg of the upsert MERGE (J2)."""
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .repartition(1).sortWithinPartitions("c_custkey")
    )


def price_band_join(part: DataFrame, bands: DataFrame) -> DataFrame:
    """Range (theta) join: each part matched to the band whose
    ``[lo, hi)`` interval contains its retail price. The band table is
    tiny and broadcast, so Spark plans BroadcastNestedLoopJoin — the
    right physical shape for a non-equi predicate against a small
    interval dimension (at 100 TB the fact side still never shuffles;
    each task scans its partition against the in-memory band list)."""
    joined = part.join(
        F.broadcast(bands),
        (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
    )
    return (
        joined.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            round2(F.min("p_retailprice")).alias("min_price"),
            round2(F.max("p_retailprice")).alias("max_price"),
        )
        .repartition(1).sortWithinPartitions("band")
    )


def salted_revenue_by_flag(lineitem: DataFrame, buckets: int = 16) -> DataFrame:
    """Skew-safe aggregation by a low-cardinality key (l_returnflag has
    3 values — at 100 TB each key is one giant reduce group). Salting
    splits every key into ``buckets`` sub-groups hashed from the row
    identity, aggregates partially per (key, salt), then re-aggregates
    per key: two small shuffles instead of one 3-partition straggler.
    Amounts are exact decimicent bigints, so the two-stage sum is
    bit-identical to the direct one — oracle-checked against the plain
    GROUP BY.
    """
    from spendinganalysisetl_spark.functions.scalars import decimicents

    salted = lineitem.select(
        "l_returnflag",
        decimicents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
            "dmc"
        ),
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(buckets)).alias("_salt"),
    )
    partial = salted.groupBy("l_returnflag", "_salt").agg(
        F.sum("dmc").alias("dmc"), F.count(F.lit(1)).alias("n")
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            (
                F.floor((F.sum("dmc") + F.lit(50)) / F.lit(100.0)) / F.lit(100.0)
            ).alias("revenue"),
            F.sum("n").alias("n_items"),
        )
        .repartition(1).sortWithinPartitions("l_returnflag")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` in the same key group (ties: the right row at
    the exact timestamp matches).

    Spark has no ASOF JOIN primitive (SURVEY.md §2.3 notes the gap); a
    range join (l ⋈ r ON key AND r.ts <= l.ts, then max) explodes
    quadratically within a key. Instead: the union-and-carry composition
    — tag both inputs, union, and carry the most recent right payload
    forward with ``last(ignorenulls)`` over (key, ts). ONE shuffle on the
    key, linear work, and the window sort co-schedules both sides — this
    is the scalable shape on a 1000-executor cluster (skewed keys split
    by AQE like any other exchange).
    """
    from pyspark.sql import Window

    l_tagged = left.withColumn("_is_left", F.lit(1)).withColumn(
        "_ts", F.col(left_ts)
    )
    r_cols = [F.col(c).alias(f"_r_{c}") for c in right_vals]
    r_tagged = (
        right.select(F.col(key), F.col(right_ts).alias("_ts"), *r_cols)
        .withColumn("_is_left", F.lit(0))
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # Right rows sort BEFORE left rows at the same _ts (tag asc), so an
    # exact-timestamp right row is visible to that left row.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_vals
        ],
    )
    return (
        carried.filter(F.col("_is_left") == 1)
        .drop("_is_left", "_ts", *[f"_r_{c}" for c in right_vals])
    )


def nation_counts_full_outer(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """FULL OUTER join of per-nation customer and supplier counts — the
    remaining join type in the family (inner/left/semi/anti elsewhere;
    the MERGE upsert uses full-outer internally, this exposes it as a
    query). Both sides pre-aggregate to nation grain before the join, so
    the exchange carries ~25 rows regardless of input scale."""
    c = customer.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    s = supplier.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return (
        c.join(s, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
        .repartition(1)
        .sortWithinPartitions("nationkey")
    )


def pit_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    ts_col: str,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
    broadcast: bool = False,
) -> DataFrame:
    """Point-in-time join: each fact row picks the dimension VERSION
    that was effective at the fact's own timestamp — the lookup every
    report against an SCD2 dimension (sources/upsert.py:scd2_apply)
    needs, and the thing a plain key join silently gets wrong (it
    matches every version, double-counting facts).

    Semantics: inner join on the key with the interval residual
    ``from_col <= ts < to_col`` (NULL ``to_col`` = still open). With a
    well-formed SCD2 dimension (non-overlapping versions per key) each
    fact matches EXACTLY one version — the cardinality-preservation
    invariant tests/test_joins_merge.py pins.

    Scale shape: this is an equi-join on the key — the interval check
    is a residual FILTER on the matched pairs, not a join condition
    explosion; each fact row meets only its key's version chain
    (versions-per-key rows, ~1-3 in practice), never a cross product.
    The dimension side (entities × versions) broadcasts when the
    CALLER says it is small (``broadcast=True`` — a hard hint Spark
    honors regardless of size, so it must not be baked in for a
    generic SCD2 dimension that can reach hundreds of millions of
    version rows); by default it hash-partitions on the key like any
    dim join while facts stream, and AQE still upgrades small builds.
    ``ts_col`` and the interval columns must be mutually comparable
    (canonical: 'yyyy-MM-dd' strings, which order lexicographically —
    the SCD2 sink's own convention)."""
    cond = (
        (fact[fact_key] == dim[dim_key])
        & (fact[ts_col] >= dim[from_col])
        & (dim[to_col].isNull() | (fact[ts_col] < dim[to_col]))
    )
    return fact.join(F.broadcast(dim) if broadcast else dim, cond, "inner")
