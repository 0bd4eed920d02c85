"""Market-basket affinity: co-occurrence support, lift, and Jaccard
similarity over baskets — the association-rule / "similar items"
readouts (which products sell together, which suppliers share
customers) that every retail/spending analytics engine ships, over the
same fact tables the reference aggregates per category/vendor.

Shape: one (basket, item) distinct collapse, then a self-equi-join ON
THE BASKET KEY — the pair space is Σ per-basket |items|², bounded by
basket size, never |items|² across the corpus; the same
per-group-quadratic discipline as the blocked fuzzy join. Item counts
attach by broadcast-sized joins; both metrics are pure integer
projections (floor-division basis points), so the DuckDB twins
reproduce every value bit-for-bit.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spendinganalysisetl_spark.operators.plancache import swap_caches


def _items(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_size: int | None,
) -> DataFrame:
    """Distinct ``(bid, item)`` rows, with baskets larger than
    ``max_basket_size`` dropped. The size filter is a window count over
    the basket key — the downstream self-join shuffles on the same key,
    so the partitioning is reused (no extra exchange).

    PERSISTED via the plancache swap: the affinity readouts fork this
    table three ways (pair support, per-item counts, and the lift
    denominator's basket total), and Spark re-executes a forked branch
    from source — without the cache the distinct+window chain ran 3×
    per query (basket_brand_affinity measured ~2.8 s → ~1.6 s at sf0.1
    from this persist alone). Spark's CacheManager dedups the repeat
    persist of a plan-identical call onto one entry, so _pair_support's
    call and a caller's own _items call share a single cache; the pin
    is released when the NEXT affinity query runs on different inputs."""
    from pyspark.sql import Window

    items = (
        baskets.select(
            F.col(basket_col).alias("bid"), F.col(item_col).alias("item")
        )
        .distinct()
    )
    if max_basket_size is not None:
        items = (
            items.withColumn(
                "_bs", F.count(F.lit(1)).over(Window.partitionBy("bid"))
            )
            .filter(F.col("_bs") <= max_basket_size)
            .drop("_bs")
        )
    items = items.persist(StorageLevel.MEMORY_AND_DISK)
    swap_caches("affinity_items", [items], [items])
    return items


def oversized_baskets(
    baskets: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item",
    max_basket_size: int = 1024,
) -> DataFrame:
    """Audit twin of the mega-basket guard: one row per basket the cap
    would drop, ``(bid, basket_size)``, largest first — run alongside a
    capped affinity readout so exclusions are counted, not silent."""
    return (
        baskets.select(
            F.col(basket_col).alias("bid"), F.col(item_col).alias("item")
        )
        .distinct()
        .groupBy("bid")
        .agg(F.count(F.lit(1)).alias("basket_size"))
        .filter(F.col("basket_size") > max_basket_size)
        .orderBy(F.col("basket_size").desc(), F.col("bid").asc())
    )


def _pair_support(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 1,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Shared scaffolding for both affinity metrics: distinct
    (basket, item), per-basket self-join with ``item_a < item_b``,
    pair support, and both items' basket counts attached by broadcast.
    Returns ``(item_a, item_b, support, n_a, n_b)``.

    ``max_basket_size`` is the mega-basket guard: the pair space is
    Σ|basket|², so ONE pathological basket (a wholesale account touching
    every item) makes the self-join quadratic in that basket — the same
    failure the fuzzy join's blocking discipline prevents. Baskets over
    the cap are excluded ENTIRELY (pairs, item counts, and the callers'
    basket denominator all use the same filtered table, so every ratio
    stays internally consistent); audit how many were dropped with
    :func:`oversized_baskets`."""
    items = _items(baskets, basket_col, item_col, max_basket_size)
    counts = items.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    a = items.select("bid", F.col("item").alias("item_a"))
    b = items.select("bid", F.col("item").alias("item_b"))
    support = (
        a.join(b, "bid")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
    return (
        support.join(
            F.broadcast(
                counts.select(F.col("item").alias("item_a"), F.col("n").alias("n_a"))
            ),
            "item_a",
        )
        .join(
            F.broadcast(
                counts.select(F.col("item").alias("item_b"), F.col("n").alias("n_b"))
            ),
            "item_b",
        )
    )


def basket_pairs(
    baskets: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item",
    k: int = 20,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Top-``k`` co-occurring item pairs by support, with lift.

    ``baskets`` is any (basket, item) table (repeats fine — collapsed
    first). Returns ``(item_a, item_b, support, n_a, n_b, lift_bp)``
    where ``support`` = baskets containing BOTH, ``n_x`` = baskets
    containing x, and ``lift_bp`` is the lift ``support·N / (n_a·n_b)``
    in BASIS POINTS via integer floor division (10000 ⇒ independence,
    >10000 ⇒ bought together more than independence predicts) — exact
    integer math end-to-end, so the DuckDB twin is bit-identical with
    no float-rounding half-boundary risk. The numerator promotes to
    DECIMAL(38,0) (the oracle's HUGEINT): ``support·N·10000`` exceeds
    int64 once baskets reach the tens of millions, and under ANSI mode
    the long form would fail loudly right when the table grows.
    Ordered support desc, then items asc.

    ``max_basket_size`` drops mega-baskets from the WHOLE computation —
    pairs, item counts, and this denominator — so one wholesale account
    can't turn the per-basket self-join quadratic (see
    ``_pair_support``). OPT-IN (default ``None`` = exact, uncapped):
    the cap changes results, so a caller must choose it — and should
    run :func:`oversized_baskets` alongside so exclusions are counted,
    not silent. At warehouse scale pass a cap (the registry queries use
    1024); the quadratic blowup is otherwise one whale account away.
    """
    total = _items(baskets, basket_col, item_col, max_basket_size).select(
        F.count_distinct("bid").alias("n_baskets")
    )
    return (
        _pair_support(baskets, basket_col, item_col, 1, max_basket_size)
        .crossJoin(F.broadcast(total))
        .select(
            "item_a",
            "item_b",
            "support",
            "n_a",
            "n_b",
            F.expr(
                "CAST((CAST(support AS DECIMAL(38,0)) * n_baskets * 10000)"
                " div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"
            ).alias("lift_bp"),
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
    max_basket_size: int | None = None,
) -> DataFrame:
    """Item–item Jaccard similarity over shared baskets — the
    collaborative-filtering "similar items" primitive (suppliers alike
    because the same customers buy from them, vendors alike because
    they appear on the same statements).

    Same pair scaffolding as ``basket_pairs`` (``_pair_support``), then
    ``jaccard_bp = 10000·|A∩B| div (n_a + n_b − |A∩B|)`` in exact
    integer basis points. ``min_support`` filters the degenerate
    rare-pair ties (two items sharing their single basket score a
    perfect 10000). ``max_basket_size`` is the opt-in mega-basket guard
    (see ``basket_pairs``; default ``None`` = exact, uncapped). Ordered
    jaccard desc, support desc, items asc; top-``k``.
    """
    return (
        _pair_support(baskets, basket_col, item_col, min_support, max_basket_size)
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
