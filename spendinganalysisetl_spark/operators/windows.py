"""Ranking / analytic window operators (SURVEY.md §2.5 note: the
reference's window surface is lag+last only — W1/W2 in
``operators.timeseries``; ranking is part of the generalized surface,
§7 Phase 4).

All windows here partition before ordering, so no single-task global
sort materializes at scale (the one exception, ``monthly_running_total``,
orders a per-month aggregate whose cardinality is the number of months —
driver-scale by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spendinganalysisetl_spark.functions.scalars import round2


def top_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """Top-k per group via row_number over partitioned desc order —
    the canonical scale-safe top-k (no global sort; each partition ranks
    its own key group)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "o_custkey",
            "o_orderkey",
            round2(F.col("o_totalprice")).alias("totalprice"),
            "rn",
        )
        .repartition(1).sortWithinPartitions("o_custkey", "rn")
    )


def order_rank_dense_rank(orders: DataFrame) -> DataFrame:
    """rank / dense_rank over order priority within status — exercises
    ties semantics against the oracle."""
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_orderpriority").asc(), F.col("o_orderkey").asc()
    )
    # No trailing presentation sort: the result is row-per-order (large);
    # a global orderBy adds a range-partitioner sampling pass that
    # re-executes the window. Consumers order if they need order.
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


def rolling_avg_monthly(orders: DataFrame, months: int = 3) -> DataFrame:
    """Rolling k-month mean revenue with an explicit ROWS frame
    (``rowsBetween(-(k-1), 0)``) — the frame-spec generalization of W1's
    lag. Revenue is carried as exact decimicent bigints so the windowed
    sum is reassociation-proof; the mean divides two exact integers, so
    the emitted double is bit-identical across engines."""
    from spendinganalysisetl_spark.functions.scalars import decimicents

    monthly = orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month")
    ).agg(F.sum(decimicents(F.col("o_totalprice"))).alias("dmc"))
    w = Window.orderBy("month").rowsBetween(-(months - 1), 0)
    return monthly.select(
        "month",
        (F.col("dmc") / F.lit(10000.0)).alias("revenue"),
        (
            (F.sum("dmc").over(w).cast("double") / F.count(F.lit(1)).over(w))
            / F.lit(10000.0)
        ).alias("rolling_avg"),
    ).repartition(1).sortWithinPartitions("month")


def order_navigation(orders: DataFrame, ntiles: int = 4) -> DataFrame:
    """Navigation-function family per customer order history: lag / lead
    (prev/next order price), ntile quartile, first_value (first-ever
    order price) over one (custkey, date, key) sort — all four functions
    share a single window partitioning, so one shuffle + one sort serves
    the whole projection."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    price = round2(F.col("o_totalprice"))
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        price.alias("totalprice"),
        round2(F.lag("o_totalprice").over(w)).alias("prev_price"),
        round2(F.lead("o_totalprice").over(w)).alias("next_price"),
        F.ntile(ntiles).over(w).alias("quartile"),
        round2(F.first("o_totalprice").over(w)).alias("first_price"),
    )  # no presentation sort on the large output (see order_rank_dense_rank)


def monthly_running_total(orders: DataFrame) -> DataFrame:
    """Cumulative revenue by month: unbounded-preceding running sum over
    a per-month aggregate (W1's lag cousin with an explicit frame)."""
    monthly = orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month")
    ).agg(F.sum("o_totalprice").alias("revenue"))
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return monthly.select(
        "month",
        round2(F.col("revenue")).alias("revenue"),
        round2(F.sum("revenue").over(w)).alias("running_revenue"),
    ).repartition(1).sortWithinPartitions("month")
