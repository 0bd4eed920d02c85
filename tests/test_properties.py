"""Property-based report invariants (SURVEY.md §5.4): for ANY sales
table, the reference's report semantics (transformer.py:172-243) imply
conservation and bracketing laws. Hypothesis generates small sales
tables; Spark must uphold the laws on each.

Few examples, rich assertions: every Spark action is a full job, so the
budget goes to invariant density per example, not example count.
"""

from __future__ import annotations

from datetime import date, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

AMOUNTS = st.integers(min_value=-10_000_000, max_value=10_000_000)  # decimicents
CATS = st.sampled_from(["food", "rent", "travel", "tools", "misc"])
VENDORS = st.sampled_from(["acme", "globex", "initech", "umbrella"])
DAYS = st.integers(min_value=0, max_value=3650)

ROWS = st.lists(
    st.tuples(st.integers(min_value=1, max_value=50), DAYS, CATS, VENDORS, AMOUNTS),
    min_size=1,
    max_size=60,
)


def _sales_df(spark, rows):
    base = date(2020, 1, 1)
    data = [
        (ok, base + timedelta(days=d), c, v, dmc / 10000.0)
        for ok, d, c, v, dmc in rows
    ]
    return spark.createDataFrame(
        data, "order_key long, order_date date, category string, "
        "vendor string, amount double"
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=ROWS)
def test_report_conservation_and_bracketing(spark, rows):
    from spendinganalysisetl_spark.operators.report import (
        bottom_k_vendors,
        distinct_names,
        global_summary,
        totals_by,
    )

    sales = _sales_df(spark, rows)
    gs = global_summary(sales).collect()[0]
    cat = totals_by(sales, "category", "name").collect()
    ven = totals_by(sales, "vendor", "name").collect()

    # Conservation: report total ≈ Σ category totals ≈ Σ vendor totals.
    # money_sum half-ups each group to cents, so the lawful slack is
    # half a cent per rounding site (each group + the global), not zero.
    cat_bound = 0.005 * (len(cat) + 1) + 1e-9
    ven_bound = 0.005 * (len(ven) + 1) + 1e-9
    assert abs(gs["total_spent"] - sum(r["total"] for r in cat)) <= cat_bound
    assert abs(gs["total_spent"] - sum(r["total"] for r in ven)) <= ven_bound

    # Cardinality: transaction count == input rows.
    assert gs["total_transactions"] == len(rows)

    # Bracketing: [begin_date, end_date] spans every input date.
    lo = min(r[1] for r in rows)
    hi = max(r[1] for r in rows)
    base = date(2020, 1, 1)
    assert gs["begin_date"] == (base + timedelta(days=lo)).isoformat()
    assert gs["end_date"] == (base + timedelta(days=hi)).isoformat()

    # Distinct lists cover exactly the names present.
    assert {r["name"] for r in distinct_names(sales, "category", "name").collect()} == {
        r[2] for r in rows
    }

    # Value-ascending sort + bottom-k prefix (the reference's A10/A11
    # quirk pair): totals_by order is ascending and bottom_k is its
    # k-prefix restricted to vendors.
    totals = [r["total"] for r in ven]
    assert totals == sorted(totals)
    bk = bottom_k_vendors(sales, 2).collect()
    assert [(r["vendor"], r["total"]) for r in bk] == [
        (r["name"], r["total"]) for r in ven[:2]
    ]
