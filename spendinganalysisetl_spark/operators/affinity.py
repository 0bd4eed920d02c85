"""Market-basket affinity: co-occurrence support and lift over order
baskets — the association-rule readout (which products sell together)
that every retail/spending analytics engine ships, over the same fact
tables the reference aggregates per category/vendor.

Shape: one (order, item) distinct collapse, then a self-equi-join ON
THE ORDER KEY — the pair space is Σ per-order |basket|², bounded by
basket size (~items-per-order², single digits), never |items|²
across the corpus; the same per-group-quadratic discipline as the
blocked fuzzy join. Item counts and the order total attach by
broadcast-sized joins; lift is a pure projection over exact integer
counts, so the DuckDB twin reproduces every value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_pairs(
    baskets: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item",
    k: int = 20,
) -> DataFrame:
    """Top-``k`` co-occurring item pairs by support, with lift.

    ``baskets`` is any (basket, item) table (repeats fine — collapsed
    first). Returns ``(item_a, item_b, support, n_a, n_b, lift_bp)``
    where ``support`` = baskets containing BOTH, ``n_x`` = baskets
    containing x, and ``lift_bp`` is the lift ``support·N / (n_a·n_b)``
    in BASIS POINTS via integer floor division (10000 ⇒ independence,
    >10000 ⇒ bought together more than independence predicts) — exact
    integer math end-to-end, so the DuckDB twin is bit-identical with
    no float-rounding half-boundary risk. Ordered support desc, then
    items asc.
    """
    items = (
        baskets.select(
            F.col(basket_col).alias("bid"), F.col(item_col).alias("item")
        )
        .distinct()
    )
    counts = items.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    total = items.select(F.count_distinct("bid").alias("n_baskets"))
    a = items.select("bid", F.col("item").alias("item_a"))
    b = items.select("bid", F.col("item").alias("item_b"))
    support = (
        a.join(b, "bid")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return (
        support.join(
            F.broadcast(counts.select(F.col("item").alias("item_a"), F.col("n").alias("n_a"))),
            "item_a",
        )
        .join(
            F.broadcast(counts.select(F.col("item").alias("item_b"), F.col("n").alias("n_b"))),
            "item_b",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "item_a",
            "item_b",
            "support",
            "n_a",
            "n_b",
            F.expr("(support * n_baskets * 10000L) div (n_a * n_b)").alias(
                "lift_bp"
            ),
        )
        .orderBy(F.col("support").desc(), "item_a", "item_b")
        .limit(k)
    )


def item_jaccard_pairs(
    baskets: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item",
    k: int = 20,
    min_support: int = 5,
) -> DataFrame:
    """Item–item Jaccard similarity over shared baskets — the
    collaborative-filtering "similar items" primitive (suppliers alike
    because the same customers buy from them, vendors alike because
    they appear on the same statements).

    Same per-basket self-join shape as ``basket_pairs`` (pair space
    bounded by basket size), then ``jaccard_bp = 10000·|A∩B| div
    (n_a + n_b − |A∩B|)`` in exact integer basis points.
    ``min_support`` filters the degenerate rare-pair ties (two items
    sharing their single basket score a perfect 10000). Ordered
    jaccard desc, support desc, items asc; top-``k``.
    """
    items = (
        baskets.select(
            F.col(basket_col).alias("bid"), F.col(item_col).alias("item")
        )
        .distinct()
    )
    counts = items.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    a = items.select("bid", F.col("item").alias("item_a"))
    b = items.select("bid", F.col("item").alias("item_b"))
    inter = (
        a.join(b, "bid")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
    return (
        inter.join(
            F.broadcast(counts.select(F.col("item").alias("item_a"), F.col("n").alias("n_a"))),
            "item_a",
        )
        .join(
            F.broadcast(counts.select(F.col("item").alias("item_b"), F.col("n").alias("n_b"))),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            "support",
            "n_a",
            "n_b",
            F.expr("(10000 * support) div (n_a + n_b - support)").alias(
                "jaccard_bp"
            ),
        )
        .orderBy(
            F.col("jaccard_bp").desc(), F.col("support").desc(), "item_a", "item_b"
        )
        .limit(k)
    )
