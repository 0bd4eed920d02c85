"""Property-based invariants for the round-2 operator families:
additive view maintenance, int8 quantization, gap-fill conservation.

Few examples, rich assertions (every Spark action is a full job — see
test_properties.py).
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spendinganalysisetl_spark.operators.events import gap_fill_hourly
from spendinganalysisetl_spark.operators.similarity import quantize_int8
from spendinganalysisetl_spark.sources.upsert import merge_additive

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

KEYS = st.sampled_from(["2024-01-01", "2024-02-01", "2024-03-01", "2024-04-01"])
PARTIAL = st.tuples(KEYS, st.integers(1, 100), st.integers(-500, 500))


@given(view=st.lists(PARTIAL, max_size=6), delta=st.lists(PARTIAL, max_size=6))
@settings(**_SETTINGS)
def test_merge_additive_equals_direct_sum(spark, view, delta):
    """Folding partials through merge_additive must equal aggregating
    the concatenated inputs directly — the incremental ≡ recompute law
    for ANY pair of partial tables (duplicate keys pre-summed per side,
    as real partials are)."""

    def agg(rows):
        out = {}
        for k, tx, sp in rows:
            t, s = out.get(k, (0, 0))
            out[k] = (t + tx, s + sp)
        return out

    va, da = agg(view), agg(delta)
    mk = lambda d: spark.createDataFrame(
        [(k, k, tx, float(sp)) for k, (tx, sp) in sorted(d.items())],
        "begin_date string, end_date string, total_transactions long, total_spent double",
    )
    got = {
        r["begin_date"]: (r["total_transactions"], r["total_spent"])
        for r in merge_additive(mk(va), mk(da)).collect()
    }
    want = {
        k: (tx, float(sp)) for k, (tx, sp) in agg(list(view) + list(delta)).items()
    }
    assert got == want


VECS = st.lists(
    st.lists(
        st.floats(-100, 100, allow_nan=False, allow_infinity=False, width=32),
        min_size=4,
        max_size=4,
    ),
    min_size=1,
    max_size=8,
)


@given(vecs=VECS)
@settings(**_SETTINGS)
def test_quantize_error_bound(spark, vecs):
    """For ANY float32 vectors: max reconstruction error ≤ scale/2 + ulp
    (half-away rounding, symmetric clamp only at the max element), and
    q_l1 ≤ 127·dim."""
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    for r in quantize_int8(df).collect():
        assert r["q_l1"] <= 127 * 4
        assert r["max_recon_err"] <= r["scale"] / 2 + 1e-6
        # the OUTPUT scale is 6dp-rounded (a subnormal max element shows
        # scale 0.0 with nonzero q) — gate the zero-vector law on q_l1
        if r["q_l1"] == 0:
            assert r["q_sum"] == 0 and r["max_recon_err"] == 0.0


EVENTS = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 300), st.integers(-50, 50)),
    min_size=1,
    max_size=40,
)


@given(rows=EVENTS)
@settings(**_SETTINGS)
def test_gap_fill_conserves_events_and_densifies(spark, rows):
    """For ANY event set: the gap-filled grid (a) conserves each user's
    event count, (b) is hour-dense from first to last activity, and
    (c) never carries a value before one exists."""
    t0 = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (i, t0 + datetime.timedelta(minutes=m), u, "view", float(v), None)
            for i, (u, m, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    out = gap_fill_hourly(df, user_cap=10).collect()
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    expect_counts: dict[int, int] = {}
    for u, m, v in rows:
        expect_counts[u] = expect_counts.get(u, 0) + 1
    assert set(by_user) == set(expect_counts)
    for u, rs in by_user.items():
        rs.sort(key=lambda r: r["hour"])
        assert sum(r["n_events"] for r in rs) == expect_counts[u]
        hours = [
            datetime.datetime.strptime(r["hour"], "%Y-%m-%d %H:%M:%S") for r in rs
        ]
        for a, b in zip(hours, hours[1:]):
            assert (b - a) == datetime.timedelta(hours=1), "grid must be dense"
        # first grid hour has events by construction; carry never NULL after
        assert rs[0]["n_events"] > 0
        seen_value = False
        for r in rs:
            if r["carried_value"] is not None:
                seen_value = True
            assert not (seen_value and r["carried_value"] is None), (
                "carry must persist once a value exists"
            )
