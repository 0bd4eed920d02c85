"""Planted-value tests for the event-analytics operators: hourly
gap-fill + carry-forward, ordered funnel conversion (strictly-after
semantics), and daily retention cohorts."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from spendinganalysisetl_spark.operators.events import (
    funnel_conversion,
    gap_fill_hourly,
    retention_cohorts,
)

T0 = datetime.datetime(2024, 1, 1, 10, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, T0 + datetime.timedelta(minutes=m), u, t, v, None)
            for i, (m, u, t, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )


def test_gap_fill_dense_grid_and_carry(spark):
    # user 1: events at 10:xx, 13:xx — hours 11 and 12 are silent
    ev = _ev(
        spark,
        [(5, 1, "click", 10.0), (10, 1, "view", 20.0), (185, 1, "click", 40.0)],
    )
    out = {r["hour"]: r for r in gap_fill_hourly(ev, user_cap=10).collect()}
    assert len(out) == 4  # 10:00 .. 13:00 inclusive
    assert out["2024-01-01 10:00:00"]["n_events"] == 2
    assert out["2024-01-01 10:00:00"]["carried_value"] == 30.0
    # silent hours: zero events, value carried forward
    for h in ("2024-01-01 11:00:00", "2024-01-01 12:00:00"):
        assert out[h]["n_events"] == 0
        assert out[h]["carried_value"] == 30.0
    assert out["2024-01-01 13:00:00"]["carried_value"] == 40.0


def test_funnel_strictly_after_semantics(spark):
    ev = _ev(
        spark,
        [
            # user 1: full ordered funnel
            (0, 1, "signup", 1.0),
            (1, 1, "click", 1.0),
            (2, 1, "purchase", 1.0),
            # user 2: purchase BEFORE click — step 3 must NOT count
            (0, 2, "signup", 1.0),
            (1, 2, "purchase", 1.0),
            (2, 2, "click", 1.0),
            # user 3: click only, never signed up — no steps at all
            (0, 3, "click", 1.0),
            # user 4: signup only
            (0, 4, "signup", 1.0),
        ],
    )
    out = {r["step"]: r for r in funnel_conversion(ev).collect()}
    assert out[1]["n_users"] == 3          # users 1, 2, 4
    assert out[2]["n_users"] == 2          # users 1, 2 (click after signup)
    assert out[3]["n_users"] == 1          # only user 1
    assert out[2]["conversion"] == round(2 / 3, 4)
    assert out[3]["conversion"] == 0.5


def test_retention_cohort_matrix(spark):
    day = 24 * 60
    ev = _ev(
        spark,
        [
            # cohort day 0: users 1,2; user 1 returns day1, user 2 returns day2
            (0, 1, "view", 1.0),
            (day + 1, 1, "view", 1.0),
            (0, 2, "view", 1.0),
            (2 * day + 1, 2, "view", 1.0),
            # cohort day 1: user 3, never returns
            (day, 3, "view", 1.0),
        ],
    )
    out = {
        (r["cohort_date"], r["day_offset"]): r
        for r in retention_cohorts(ev).collect()
    }
    assert out[("2024-01-01", 0)]["n_active"] == 2
    assert out[("2024-01-01", 0)]["retention"] == 1.0
    assert out[("2024-01-01", 1)]["n_active"] == 1
    assert out[("2024-01-01", 1)]["retention"] == 0.5
    assert out[("2024-01-01", 2)]["n_active"] == 1
    assert out[("2024-01-02", 0)]["cohort_users"] == 1
    assert ("2024-01-02", 1) not in out


def test_value_anomalies_flags_spike_after_coldstart(spark):
    # 40 alternating baseline events one minute apart (std ≈ 1), then a
    # spike. The spike's preceding-hour baseline has ≥30 points → flagged.
    rows = [(i, 1, "click", 9.0 if i % 2 else 11.0) for i in range(40)]
    rows.append((40, 1, "click", 100.0))
    ev = _ev(spark, rows)
    from spendinganalysisetl_spark.operators.events import value_anomalies

    out = value_anomalies(ev).collect()
    assert [r["event_id"] for r in out] == [40]
    assert out[0]["z_score"] > 3
    # cold start: re-run with only the first 20 baseline points + spike —
    # baseline < 30 → nothing flagged
    ev_short = _ev(
        spark,
        [(i, 1, "click", 9.0 if i % 2 else 11.0) for i in range(20)]
        + [(20, 1, "click", 100.0)],
    )
    assert value_anomalies(ev_short).count() == 0


def test_value_anomalies_matches_direct_sliding_reference(spark):
    """Differential pin for the r8 rewrite: the distributed
    difference-of-two-cumulative-frames formulation (retraction-free —
    see operators/events.py:value_anomalies) must reproduce a direct
    per-row sliding-window reference computed independently in plain
    Python over the same rows (same mean/var closed forms, same
    guards), on a seeded random stream dense enough to pass the
    cold-start floor and containing planted spikes."""
    import random

    rng = random.Random(7)
    rows = []
    m = 0.0
    for i in range(900):
        m += rng.uniform(0.25, 0.75)  # ~2/min → ~60/hour per type
        v = rng.gauss(50.0, 5.0)
        if i in (400, 700):
            v += 60.0  # planted spikes
        rows.append((m, 1, "tick" if i % 2 else "tock", v))
    ev = _ev(spark, rows)
    from spendinganalysisetl_spark.operators.events import value_anomalies

    got = {
        r["event_id"]: r["z_score"] for r in value_anomalies(ev).collect()
    }

    # Independent direct reference: for each event, aggregate the
    # preceding-hour same-type events by brute force.
    evs = [
        (i, rows[i][2], int((T0 + datetime.timedelta(minutes=rows[i][0])
             ).replace(tzinfo=datetime.timezone.utc).timestamp()), rows[i][3])
        for i in range(len(rows))
    ]
    want = {}
    for i, typ, ep, v in evs:
        base = [v2 for (j, t2, e2, v2) in evs
                if t2 == typ and ep - 3600 <= e2 <= ep - 1]
        n = len(base)
        if n < 30:
            continue
        s = sum(base)
        q = sum(x * x for x in base)
        var = (q - s * s / n) / (n - 1)
        if var <= 1e-6:
            continue
        z = (v - s / n) / var ** 0.5
        if abs(z) >= 3.0:
            want[i] = round(z, 4)
    assert set(got) == set(want)
    # planted spikes must actually be among the flags
    assert {400, 700} <= set(got)
    for k in want:
        assert abs(got[k] - want[k]) <= 1e-3, (k, got[k], want[k])


def test_fuzzy_levenshtein_blocking_and_distance(spark):
    from spendinganalysisetl_spark.operators.dedup import fuzzy_pairs_levenshtein

    docs = spark.createDataFrame(
        [
            (1, "hello world this is a document"),
            (2, "hello world this is a documxnt"),   # 1 edit from doc 1
            (3, "hello completely different text entirely here"),
            (4, "zebra text far away in block space"),  # different block
        ],
        "doc_id long, text string",
    )
    out = {(r["id_a"], r["id_b"]): r["edit_dist"] for r in
           fuzzy_pairs_levenshtein(docs, max_dist=5).collect()}
    assert out[(1, 2)] == 1
    # doc 3 shares the 'h' block but is > max_dist away; doc 4 is in
    # another block and never compared
    assert set(out) == {(1, 2)}


def test_event_transitions_counts_and_probabilities(spark):
    from spendinganalysisetl_spark.operators.events import event_transitions

    ev = spark.createDataFrame(
        [
            # user 1: a -> b -> a ; user 2: a -> b
            (1, 1, "2024-01-01 10:00:00", "a"),
            (2, 1, "2024-01-01 10:01:00", "b"),
            (3, 1, "2024-01-01 10:02:00", "a"),
            (4, 2, "2024-01-01 11:00:00", "a"),
            (5, 2, "2024-01-01 11:05:00", "b"),
        ],
        "event_id long, user_id long, ts string, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        (r["prev_type"], r["next_type"]): r
        for r in event_transitions(ev).collect()
    }
    assert out[("a", "b")]["n_transitions"] == 2
    assert out[("b", "a")]["n_transitions"] == 1
    assert out[("a", "b")]["p_next"] == 1.0, "a is always followed by b"
    assert out[("b", "a")]["p_next"] == 1.0
    assert ("a", "a") not in out, "no cross-user pair (user 1 ends a, user 2 starts a)"


def test_running_distinct_users_cumulative(spark):
    from spendinganalysisetl_spark.operators.events import (
        running_distinct_users,
    )

    ev = spark.createDataFrame(
        [
            (1, 10, "2024-01-01 09:00:00", "a"),
            (2, 10, "2024-01-02 09:00:00", "a"),  # not new on day 2
            (3, 11, "2024-01-02 09:00:00", "a"),
            (4, 12, "2024-01-02 10:00:00", "a"),
            (5, 13, "2024-01-04 10:00:00", "a"),
        ],
        "event_id long, user_id long, ts string, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    rows = {r["day"]: r for r in running_distinct_users(ev).collect()}
    assert rows["2024-01-01"]["new_users"] == 1
    assert rows["2024-01-02"]["new_users"] == 2
    assert rows["2024-01-02"]["cum_users"] == 3
    assert rows["2024-01-04"]["cum_users"] == 4
    assert "2024-01-03" not in rows, "no-activity days absent (gap_fill is the densifier)"
