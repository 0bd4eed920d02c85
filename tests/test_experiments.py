"""A/B experiment readout (operators/experiments.py): assignment
determinism and a numpy Welch-t differential."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spendinganalysisetl_spark.operators.experiments import ab_assign, ab_welch_report


def _events(spark):
    rows = [
        (u, "buy", float(1 + (u * 7) % 50) + 0.25)
        for u in range(400)
    ] + [
        (u, "view", float(2 + (u * 13) % 30) + 0.75)
        for u in range(400)
    ]
    return spark.createDataFrame(rows, "user_id long, event_type string, value double")


def test_assignment_is_deterministic_and_balanced(spark):
    df = spark.range(0, 2000).select(ab_assign(F.col("id")).alias("v"))
    a = df.groupBy("v").count().collect()
    counts = {r["v"]: r["count"] for r in a}
    assert set(counts) == {0, 1}
    # md5 split should be near-balanced (binomial 3-sigma ≈ 67)
    assert abs(counts[0] - counts[1]) < 200
    b = spark.range(0, 2000).select(ab_assign(F.col("id")).alias("v"))
    assert df.collect() == b.collect()


def test_welch_t_matches_numpy(spark):
    ev = _events(spark)
    # ground-truth assignment read back through the same fold
    assign = {
        r["user_id"]: r["v"]
        for r in ev.select("user_id").distinct()
        .select("user_id", ab_assign(F.col("user_id")).alias("v")).collect()
    }
    got = {r["event_type"]: r for r in ab_welch_report(ev).collect()}
    for etype in ("buy", "view"):
        vals = {0: [], 1: []}
        for r in ev.filter(F.col("event_type") == etype).collect():
            # decimicent fold exactly as the operator does
            vals[assign[r["user_id"]]].append(int(np.floor(r["value"] * 10000 + 0.5)))
        a, b = np.array(vals[0], dtype=np.float64), np.array(vals[1], dtype=np.float64)
        row = got[etype]
        assert row["n_a"] == len(a) and row["n_b"] == len(b)
        assert row["mean_a_decimicents"] == int(sum(int(x) for x in a) // len(a))
        t = (a.mean() - b.mean()) / np.sqrt(
            a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
        )
        assert row["t_stat"] == pytest.approx(round(t, 4), abs=1e-4)


def test_small_arms_are_dropped(spark):
    rows = [(1, "rare", 5.0), (2, "rare", 6.0)]  # one or zero units per arm
    ev = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    assert ab_welch_report(ev).filter(F.col("event_type") == "rare").count() == 0
