"""Mergeable-sketch rollups (operators/sketches.py): estimates from
merged per-day partials must track the exact answers computed from raw
events (HLL lgK=12 ≈ 1.6% standard error; KLL rank error ~1.7%)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spendinganalysisetl_spark.catalog import load_table
from spendinganalysisetl_spark.operators.sketches import (
    daily_user_sketches,
    rollup_unique_users,
    segment_overlap_theta,
    value_quantiles_from_sketches,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF, "events")


@pytest.fixture(scope="module")
def daily(spark, events):
    return daily_user_sketches(events).persist()


def test_hll_rollup_tracks_exact_uniques(spark, events, daily):
    out = {r["week"]: r for r in rollup_unique_users(daily).collect()}
    exact_total = events.select("user_id").distinct().count()
    est_total = out[-1]["est_unique_users"]
    assert abs(est_total - exact_total) / exact_total < 0.05
    exact_weekly = {
        r["week"]: r["n"]
        for r in events.groupBy(F.weekofyear(F.to_date("ts")).alias("week"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for wk, exact in exact_weekly.items():
        assert abs(out[wk]["est_unique_users"] - exact) / exact < 0.05
    # event counts carried exactly (not estimated)
    assert out[-1]["n_events"] == events.count()


def test_kll_quantiles_track_exact(spark, events, daily):
    row = value_quantiles_from_sketches(daily).collect()[0]
    exact = events.approxQuantile("value", [0.5, 0.9, 0.99], 0.0)
    for est, ex in zip((row["p50"], row["p90"], row["p99"]), exact):
        assert ex == pytest.approx(est, rel=0.25), (est, ex)


def test_theta_overlap_matches_exact_intersection(spark, events):
    out = segment_overlap_theta(events, "click", "purchase").collect()[0]
    clickers = {
        r["user_id"]
        for r in events.filter(F.col("event_type") == "click")
        .select("user_id")
        .distinct()
        .collect()
    }
    buyers = {
        r["user_id"]
        for r in events.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .collect()
    }
    exact = len(clickers & buyers)
    assert out["est_a"] == pytest.approx(len(clickers), rel=0.05)
    assert out["est_overlap"] == pytest.approx(exact, rel=0.1) or (
        exact == 0 and out["est_overlap"] == 0
    )
