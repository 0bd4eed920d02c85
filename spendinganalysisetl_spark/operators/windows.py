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
        .orderBy("o_custkey", "rn")
    )


def order_rank_dense_rank(orders: DataFrame) -> DataFrame:
    """rank / dense_rank over order priority within status — exercises
    ties semantics against the oracle."""
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_orderpriority").asc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    ).orderBy("o_orderkey")


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
    ).orderBy("month")
