"""Unit tests for the round-2 operator additions: sliding windows,
rolling frames, navigation functions, range join, salted aggregation,
and IVF ANN recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_sliding_every_event_in_two_windows(spark):
    """width/slide = 2 → total windowed event count is exactly 2× the
    input count."""
    from spendinganalysisetl_spark.catalog import load_table
    from spendinganalysisetl_spark.operators.events import sliding_counts

    events = load_table(spark, SF, "events")
    out = sliding_counts(events, 10, 5)
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == 2 * events.count()


def test_rolling_avg_frame(spark):
    from spendinganalysisetl_spark.operators.windows import rolling_avg_monthly

    orders = spark.createDataFrame(
        [("2024-01-15", 10.0), ("2024-02-15", 20.0), ("2024-03-15", 60.0), ("2024-04-15", 100.0)],
        "o_orderdate string, o_totalprice double",
    ).select(F.to_date("o_orderdate").alias("o_orderdate"), "o_totalprice")
    rows = {r["month"]: r["rolling_avg"] for r in rolling_avg_monthly(orders, 3).collect()}
    assert rows["2024-01-01"] == pytest.approx(10.0)
    assert rows["2024-02-01"] == pytest.approx(15.0)
    assert rows["2024-03-01"] == pytest.approx(30.0)
    assert rows["2024-04-01"] == pytest.approx(60.0)  # trailing 3 only


def test_order_navigation_lag_lead_first(spark):
    from spendinganalysisetl_spark.operators.windows import order_navigation

    orders = spark.createDataFrame(
        [
            (1, 11, "2024-01-01", 5.0),
            (1, 12, "2024-01-02", 7.0),
            (1, 13, "2024-01-03", 9.0),
            (2, 21, "2024-02-01", 4.0),
        ],
        "o_custkey long, o_orderkey long, o_orderdate string, o_totalprice double",
    ).select(
        "o_custkey", "o_orderkey", F.to_date("o_orderdate").alias("o_orderdate"), "o_totalprice"
    )
    rows = {r["o_orderkey"]: r for r in order_navigation(orders, 2).collect()}
    assert rows[12]["prev_price"] == 5.0 and rows[12]["next_price"] == 9.0
    assert rows[11]["prev_price"] is None and rows[13]["next_price"] is None
    assert rows[13]["first_price"] == 5.0
    assert rows[21]["prev_price"] is None and rows[21]["first_price"] == 4.0
    # ntile(2) over 3 rows: first tile gets the extra row
    assert [rows[k]["quartile"] for k in (11, 12, 13)] == [1, 1, 2]


def test_price_band_join_assignment(spark):
    from spendinganalysisetl_spark.operators.joins import price_band_join

    part = spark.createDataFrame(
        [(1, 910.0), (2, 930.0), (3, 960.0), (4, 990.0), (5, 924.99)],
        "p_partkey long, p_retailprice double",
    )
    bands = spark.createDataFrame(
        [("budget", 0.0, 925.0), ("mid", 925.0, 950.0),
         ("premium", 950.0, 975.0), ("luxury", 975.0, 10000.0)],
        "band STRING, lo DOUBLE, hi DOUBLE",
    )
    out = {r["band"]: r["n_parts"] for r in price_band_join(part, bands).collect()}
    assert out == {"budget": 2, "mid": 1, "premium": 1, "luxury": 1}


def test_salted_equals_plain_aggregation(spark):
    """The two-stage salted sum must be bit-identical to the direct
    group-by (exact bigint money)."""
    from spendinganalysisetl_spark.functions.scalars import decimicents
    from spendinganalysisetl_spark.operators.joins import salted_revenue_by_flag

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    salted = {
        r["l_returnflag"]: (r["revenue"], r["n_items"])
        for r in salted_revenue_by_flag(li, 16).collect()
    }
    plain = {
        r["l_returnflag"]: (r["revenue"], r["n_items"])
        for r in li.groupBy("l_returnflag")
        .agg(
            (
                F.floor(
                    (
                        F.sum(
                            decimicents(
                                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
                            )
                        )
                        + F.lit(50)
                    )
                    / F.lit(100.0)
                )
                / F.lit(100.0)
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .collect()
    }
    assert salted == plain


def test_ivf_recall_vs_brute_force(spark):
    """IVF with nprobe=4/nlist=8 must recover most of the exact top-5."""
    from spendinganalysisetl_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = {
        (r["q_id"], r["c_id"]) for r in brute_force_topk(emb, None, 5).collect()
    }
    approx = {
        (r["q_id"], r["c_id"])
        for r in ivf_topk(emb, None, 5, nlist=8, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_approx_percentile_tracks_exact(spark):
    """The 100 TB sketch path (percentile_prices_approx) must track the
    exact query rank-wise: approx_percentile returns an actual element
    whose rank is within the sketch's rank-error bound of the target, so
    the estimate must land inside the exact [q-0.02, q+0.02] quantile
    bracket (value-relative tolerances are wrong at small n, where
    neighbor-element gaps dominate)."""
    from spendinganalysisetl_spark import registry
    from spendinganalysisetl_spark.catalog import load_table

    approx = {
        r["o_orderpriority"]: r
        for r in registry.QUERIES["percentile_prices_approx"](spark, SF).collect()
    }
    eps = 0.02
    brackets = {
        r["o_orderpriority"]: r
        for r in load_table(spark, SF, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.expr(
                f"percentile(o_totalprice, array({0.5 - eps}, {0.5 + eps},"
                f" {0.9 - eps}, {0.9 + eps}, {0.99 - eps}, 1.0))"
            ).alias("b"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(brackets) == set(approx)
    for k, b in brackets.items():
        a = approx[k]
        assert a["n"] == b["n"]
        lo_hi = [(b["b"][0], b["b"][1]), (b["b"][2], b["b"][3]), (b["b"][4], b["b"][5])]
        for q, (lo, hi) in zip(("p50", "p90", "p99"), lo_hi):
            assert lo <= a[q] <= hi, (k, q, a[q], lo, hi)


def test_props_json_stats_malformed_and_missing(spark):
    from spendinganalysisetl_spark.operators.events import props_value_stats

    rows = [
        (1, "click", '{"k": 10}'),
        (2, "click", '{"k": 32}'),
        (3, "click", "not json"),   # malformed -> NULL k
        (4, "click", '{"other": 5}'),  # missing field -> NULL k
        (5, "view", None),          # NULL props -> NULL k
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, props string")
    out = {r["event_type"]: r for r in props_value_stats(df).collect()}
    c = out["click"]
    assert (c["n_events"], c["n_with_k"]) == (4, 2)
    assert (c["sum_k"], c["min_k"], c["max_k"]) == (42, 10, 32)
    assert c["avg_k"] == 21.0
    v = out["view"]
    assert (v["n_events"], v["n_with_k"], v["sum_k"]) == (1, 0, None)
