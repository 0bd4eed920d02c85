"""Recurring-spend detection (operators/timeseries.py:
recurring_customers): exact integer gap statistics on planted cadences."""

from __future__ import annotations

import datetime as dt

from spendinganalysisetl_spark.operators.timeseries import recurring_customers


def _orders(spark, rows):
    return spark.createDataFrame(rows, "o_custkey long, o_orderdate date")


def test_perfectly_periodic_customer_scores_zero(spark):
    base = dt.date(2024, 1, 1)
    rows = [(1, base + dt.timedelta(days=30 * i)) for i in range(6)]
    # irregular customer: gaps 1, 50, 3, 200 days
    irr = [0, 1, 51, 54, 254]
    rows += [(2, base + dt.timedelta(days=d)) for d in irr]
    out = {r["custkey"]: r for r in recurring_customers(_orders(spark, rows)).collect()}
    assert out[1]["cv2_bp"] == 0
    assert out[1]["n_dates"] == 6
    assert out[1]["mean_gap_days"] == 30
    assert out[2]["cv2_bp"] > 10000  # CV > 1: wildly irregular
    # ordering: periodic customer first
    ordered = recurring_customers(_orders(spark, rows)).collect()
    assert ordered[0]["custkey"] == 1


def test_exact_cv2_and_filters(spark):
    base = dt.date(2024, 1, 1)
    # gaps 10, 20, 30: n=3, s=60, q=1400, cv2 = 3*(3*1400-3600)/(2*3600) = 0.25
    rows = [(7, base), (7, base + dt.timedelta(days=10)),
            (7, base + dt.timedelta(days=30)), (7, base + dt.timedelta(days=60))]
    # repeated same-date order collapses (distinct dates)
    rows.append((7, base + dt.timedelta(days=10)))
    # customer with only 3 dates (2 gaps) is dropped
    rows += [(8, base), (8, base + dt.timedelta(days=5)), (8, base + dt.timedelta(days=9))]
    out = recurring_customers(_orders(spark, rows)).collect()
    assert [r["custkey"] for r in out] == [7]
    assert out[0]["cv2_bp"] == 2500
    assert out[0]["mean_gap_days"] == 20


def test_ewma_forecast_exact(spark):
    from spendinganalysisetl_spark.operators.timeseries import ewma_forecast

    rows = [
        ("a", "2024-01", 1000), ("a", "2024-02", 2000), ("a", "2024-03", 4000),
        ("b", "2024-03", 70000),
    ]
    df = spark.createDataFrame(rows, "name string, period string, amount_decimicents long")
    got = {r["name"]: r for r in ewma_forecast(df, "name", "period", "amount_decimicents").collect()}
    # key a: latest=4000 (w 2048), 2000 (w 1024), 1000 (w 512)
    want = (4000 * 2048 + 2000 * 1024 + 1000 * 512) // (2048 + 1024 + 512)
    assert got["a"]["forecast"] == want
    assert got["a"]["last_value"] == 4000
    assert got["a"]["n_periods"] == 3
    # single-period key forecasts its only value exactly
    assert got["b"]["forecast"] == 70000


def test_ewma_window_truncates_old_history(spark):
    from spendinganalysisetl_spark.operators.timeseries import ewma_forecast

    # 15 months of value 100 plus a huge outlier 15 months ago:
    # outside the 12-month window, it must not move the forecast.
    rows = [("k", f"2023-{m:02d}", 100) for m in range(1, 13)]
    rows += [("k", f"2024-{m:02d}", 100) for m in range(1, 4)]
    rows[0] = ("k", "2023-01", 10**9)
    df = spark.createDataFrame(rows, "name string, period string, amount_decimicents long")
    out = ewma_forecast(df, "name", "period", "amount_decimicents").collect()[0]
    assert out["forecast"] == 100
    assert out["n_periods"] == 12


def test_gini_extremes_and_exact_value(spark):
    from spendinganalysisetl_spark.operators.report import revenue_concentration

    # uniform segment: everyone spends 10.0 → gini 0
    orders = [(i, i, 10.0) for i in range(1, 6)]
    # whale segment: one of five customers is ~all the revenue
    orders += [(100 + i, 100 + i, 0.01) for i in range(1, 5)]
    orders += [(105, 105, 100000.0)]
    odf = spark.createDataFrame(orders, "o_orderkey long, o_custkey long, o_totalprice double")
    cust = [(i, "UNIFORM") for i in range(1, 6)] + [(100 + i, "WHALE") for i in range(1, 6)]
    cdf = spark.createDataFrame(cust, "c_custkey long, c_mktsegment string")
    got = {r["segment"]: r for r in revenue_concentration(odf, cdf).collect()}
    assert got["UNIFORM"]["gini_bp"] == 0
    # hand computation: x=[100,100,100,100,1000000000] decimicents asc
    x = [100, 100, 100, 100, 1000000000]
    n, sx = 5, sum(x)
    six = sum((i + 1) * v for i, v in enumerate(x))
    want = (10000 * (2 * six - (n + 1) * sx)) // (n * sx)
    assert got["WHALE"]["gini_bp"] == want
    assert got["WHALE"]["gini_bp"] > 7900  # near-total concentration
