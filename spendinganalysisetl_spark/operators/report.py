"""The spending report — the reference's core computation re-expressed
as Spark aggregation plans.

Reference: ``transform_summary`` (/root/reference/transformer.py:135-243)
computes, in one imperative pass over upload summaries: global sums
(A1-A2), date min/max (A3-A4), grouped sums by category/vendor (A5-A6),
distinct name sets (A7-A8), value-ascending sort + "top"-5 (A10-A11),
and assembles one report row (A13). SURVEY.md §2.4 maps each to its
Spark primitive; FIXTURES.md §B maps the reference's category/vendor/
amount roles onto the star schema:

  category -> part.p_type, vendor -> supplier.s_name,
  amount   -> l_extendedprice * (1 - l_discount), period -> order month.

Scale notes
-----------
- ``lineitem`` is the fact (the 100 TB side); ``part``/``supplier`` are
  dims — joined with an explicit ``F.broadcast`` so no shuffle of the
  fact table happens for enrichment, only for the (tiny-key-space)
  aggregations, which run partial/final with map-side combine.
- Global aggregates (A1-A4) reduce to a single row with no shuffle wider
  than one partial-agg exchange.
- The report struct assembly (A13) happens on already-aggregated,
  driver-scale data (a handful of rows), so collect-free struct building
  via joins/crossJoin of one-row frames is cheap at any input scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spendinganalysisetl_spark.functions.scalars import (
    decimicents,
    money_sum,
    revenue,
)


def base_sales(
    lineitem: DataFrame,
    orders: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    begin_date: str | None = None,
    end_date: str | None = None,
) -> DataFrame:
    """Enriched fact: one row per lineitem with category (p_type), vendor
    (s_name), order date, and net amount.

    The date predicate is applied on the *orders* side before the join so
    Catalyst pushes it into the orders scan and the join only sees
    surviving orderkeys; dims are broadcast (no fact shuffle).
    """
    o = orders.select("o_orderkey", "o_custkey", "o_orderdate")
    if begin_date is not None:
        o = o.filter(F.col("o_orderdate") >= F.lit(begin_date))
    if end_date is not None:
        o = o.filter(F.col("o_orderdate") < F.lit(end_date))
    return (
        lineitem.select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .withColumn("amount", revenue())
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part.select("p_partkey", "p_type", "p_brand")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("o_orderkey").alias("order_key"),
            F.to_date("o_orderdate").alias("order_date"),
            F.col("p_type").alias("category"),
            F.col("s_name").alias("vendor"),
            F.col("amount"),
        )
    )


def global_summary(sales: DataFrame) -> DataFrame:
    """A1-A4: one row — total spend, transaction count, date bracket.

    Reference: transformer.py:172-187 (running scalars in a Python loop);
    here one partial/final hash aggregate.
    """
    return sales.agg(
        money_sum(F.col("amount")).alias("total_spent"),
        F.count(F.lit(1)).alias("total_transactions"),
        F.date_format(F.min("order_date"), "yyyy-MM-dd").alias("begin_date"),
        F.date_format(F.max("order_date"), "yyyy-MM-dd").alias("end_date"),
    )


def totals_by(sales: DataFrame, key: str, out_name: str) -> DataFrame:
    """A5/A6 plain form: grouped net-amount sum, value-ascending order
    (the reference's sort, transformer.py:212-213)."""
    return (
        sales.groupBy(F.col(key).alias(out_name))
        .agg(money_sum(F.col("amount")).alias("total"))
        .repartition(1).sortWithinPartitions("total", out_name)
    )


def totals_by_ref_roundsum(sales: DataFrame, key: str, out_name: str) -> DataFrame:
    """A5/A6 reference-parity form: ROUND-THEN-SUM.

    The reference sums map entries that were already rounded per upload
    (transformer.py:196,203). Star-schema analog: the per-order per-key
    subtotal is the "map entry", rounded to 2 before the cross-order sum.
    Two-level aggregation — Spark executes both levels as partial/final
    hash aggregates on the same key partitioning (single shuffle).
    """
    per_upload = sales.groupBy("order_key", F.col(key).alias(out_name)).agg(
        F.floor((F.sum(decimicents(F.col("amount"))) + F.lit(50)) / F.lit(100.0))
        .cast("long")
        .alias("entry_cents")
    )
    return (
        per_upload.groupBy(out_name)
        .agg((F.sum("entry_cents") / F.lit(100.0)).alias("total"))
        .repartition(1).sortWithinPartitions("total", out_name)
    )


def distinct_names(sales: DataFrame, key: str, out_name: str) -> DataFrame:
    """A7/A8 as checkable rows: the sorted-distinct name list, exploded
    (SURVEY.md §5.1: emit rows, not arrays, in oracle-checked output)."""
    return sales.select(F.col(key).alias(out_name)).distinct().repartition(1).sortWithinPartitions(out_name)


def bottom_k_vendors(sales: DataFrame, k: int = 5) -> DataFrame:
    """A11 reference-parity "top_5_vendors": the reference sorts totals
    ASCENDING then takes [:5] (transformer.py:212-213,240), so its
    "top 5" is the 5 LOWEST-spend vendors — verified empirically
    (SURVEY.md A11). Vendor-name tiebreak keeps the result deterministic
    across engines."""
    return (
        sales.groupBy("vendor")
        .agg(money_sum(F.col("amount")).alias("total"))
        .orderBy(F.col("total").asc(), F.col("vendor").asc())
        .limit(k)
    )


def top_k_vendors(sales: DataFrame, k: int = 5) -> DataFrame:
    """A11 corrected semantics (what the reference *named*): k highest."""
    return (
        sales.groupBy("vendor")
        .agg(money_sum(F.col("amount")).alias("total"))
        .orderBy(F.col("total").desc(), F.col("vendor").asc())
        .limit(k)
    )


def assemble_report(sales: DataFrame, top_k: int = 5) -> DataFrame:
    """A13: the single report row (transformer.py:229-243).

    Emits the same field family as the reference's ``response`` dict:
    total_spent, total_transactions, unique_categories, unique_vendors,
    spending_per_category, spending_per_vendor, top_5_vendors (ref
    bottom-5 semantics), begin/end dates. Name-keyed maps become
    value-sorted array<struct<name,total>> (Spark map columns don't
    preserve insertion order — SURVEY.md A10).

    Scale shape — ONE LINEAR CHAIN, no forked branches, no crossJoins:
    fact → (vendor, category) rollup (the only fact-table shuffle;
    exact integer decimicent partials re-fold to the same money_sum,
    counts and date brackets re-aggregate losslessly) → GROUPING SETS
    ((vendor), (category), ()) over the |V|×|C| rollup — vendor totals,
    category totals, and the global row in one pass — → value-ascending
    sort of that tiny frame → one conditional-collect aggregation that
    assembles every report field (grouping_id routes rows; collect_list
    skips the NULLed other-set rows; the ref "top 5" = first 5 slots of
    the value-ascending vendor list). The earlier form forked the fact
    five ways through crossJoins of one-row aggregates — each branch a
    full pass plus ~0.6 s of per-run planning for the wide tree
    (measured; this chain plans and runs in a fraction of it).
    """
    from spendinganalysisetl_spark.functions.scalars import money_fold

    vc = sales.groupBy("vendor", "category").agg(
        F.sum(decimicents(F.col("amount"))).alias("dc"),
        F.count(F.lit(1)).alias("n"),
        F.min("order_date").alias("dmin"),
        F.max("order_date").alias("dmax"),
    )
    # gid with (vendor, category): 1 = vendor total (category rolled
    # up), 2 = category total, 3 = grand total.
    sets = vc.groupingSets([["vendor"], ["category"], []], "vendor", "category").agg(
        money_fold(F.sum("dc")).alias("total"),
        F.sum("n").alias("n"),
        F.min("dmin").alias("dmin"),
        F.max("dmax").alias("dmax"),
        F.grouping_id().alias("gid"),
    )
    # One partition, value-ascending: conditional collect_lists below
    # then emit each per-set list in the reference's sort order
    # (total asc, name asc — the NULLed other column doesn't reorder
    # rows within a set).
    tiny = sets.repartition(1).sortWithinPartitions("total", "vendor", "category")
    gid = F.col("gid")
    vrow = F.when(gid == 1, F.struct(F.col("vendor").alias("name"), F.col("total")))
    crow = F.when(gid == 2, F.struct(F.col("category").alias("name"), F.col("total")))
    trow = F.when(gid == 1, F.struct(F.col("vendor"), F.col("total")))
    return tiny.agg(
        F.max(F.when(gid == 3, F.date_format("dmin", "yyyy-MM-dd"))).alias("begin_date"),
        F.max(F.when(gid == 3, F.date_format("dmax", "yyyy-MM-dd"))).alias("end_date"),
        F.max(F.when(gid == 3, F.col("total"))).alias("total_spent"),
        # coalesce: an EMPTY sales input has no grand-total row, but the
        # transaction count must stay 0 (the pre-rewrite count() form),
        # not NULL — a NULL here nulls the whole fi_summary printf.
        F.coalesce(
            F.max(F.when(gid == 3, F.col("n"))), F.lit(0).cast("long")
        ).alias("total_transactions"),
        F.sort_array(F.collect_set(F.when(gid == 2, F.col("category")))).alias(
            "unique_categories"
        ),
        F.sort_array(F.collect_set(F.when(gid == 1, F.col("vendor")))).alias(
            "unique_vendors"
        ),
        F.collect_list(crow).alias("spending_per_category"),
        F.collect_list(vrow).alias("spending_per_vendor"),
        F.slice(F.collect_list(trow), 1, top_k).alias("top_5_vendors"),
    ).select(
        "begin_date",
        "end_date",
        "total_spent",
        "total_transactions",
        "unique_categories",
        "unique_vendors",
        "spending_per_category",
        "spending_per_vendor",
        "top_5_vendors",
    )


def revenue_concentration(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Revenue concentration per market segment: the Gini coefficient
    of per-customer order revenue, in exact integer basis points
    (0 = every active customer spends the same, →10000 = one customer
    is the whole segment) — the inequality/whale-detection readout a
    spending report adds beside its totals.

    Gini over the ascending-sorted revenues x_1..x_n:
    ``G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx)`` — computed entirely from
    exact decimicent integers (Σ i·x in DECIMAL(38,0) ≡ HUGEINT; it
    passes int64 around 10^19) with one floor division at the end, so
    the DuckDB twin is bit-identical. Ranking ties (equal revenues)
    don't affect the value: a tied block contributes the same Σ i·x
    whichever order its members take, so the custkey tiebreak is for
    determinism of the ROW ranks only.

    Shape: facts collapse to customer grain first (one partial/final
    aggregate), the rank window partitions by segment over that
    customer-grain table (never the fact table), and the result is one
    row per segment. Only customers with ≥1 order participate —
    concentration among ACTIVE customers.
    """
    from pyspark.sql import Window

    rev = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_custkey").alias("ck"),
        )
        .agg(
            F.sum(
                F.expr("CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)")
            ).alias("x")
        )
    )
    w = Window.partitionBy("segment").orderBy(F.col("x").asc(), F.col("ck").asc())
    ranked = rev.withColumn("i", F.row_number().over(w))
    agg = ranked.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        # Multiply IN decimal — i*x in BIGINT can overflow int64 for a
        # large segment (rank × lifetime decimicents) before the cast,
        # while the oracle computes CAST(i AS HUGEINT) * x.
        F.sum(F.expr("CAST(i AS DECIMAL(38,0)) * x")).alias("six"),
    )
    return (
        agg.select(
            "segment",
            F.col("n").alias("n_customers"),
            F.col("sx").alias("revenue_decimicents"),
            F.expr(
                "CAST((10000 * (2 * six - (n + 1) * CAST(sx AS DECIMAL(38,0))))"
                " div (CAST(n AS DECIMAL(38,0)) * sx) AS BIGINT)"
            ).alias("gini_bp"),
        )
        .repartition(1)
        .sortWithinPartitions("segment")
    )
