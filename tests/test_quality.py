"""Data-quality expectation engine (operators/quality.py): planted
violations per rule class, single-scan compilation for scalar rules."""

from __future__ import annotations

from spendinganalysisetl_spark.operators.quality import (
    accepted_values_rule,
    check_expectations,
    not_null_rule,
    range_rule,
    unique_rule,
)
from spendinganalysisetl_spark.plans import plan_report


def test_rules_count_planted_violations(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (2, -5.0, "A"),     # range violation
            (3, None, "B"),     # null violation (and range: NULL counts)
            (4, 10.0, "X"),     # accepted-values violation
            (4, 10.0, "A"),     # duplicate id
        ],
        "id long, amount double, flag string",
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    out = {
        r["rule"]: r
        for r in check_expectations(
            df,
            [
                range_rule("amount", 0, 100),
                not_null_rule("amount"),
                accepted_values_rule("flag", ["A", "B"]),
                unique_rule("id"),
            ],
            fk=[("id", parent, "id")],
        ).collect()
    }
    assert out["amount_between_0_100"]["n_violations"] == 2  # -5 and NULL
    assert out["amount_not_null"]["n_violations"] == 1
    assert out["flag_accepted_values"]["n_violations"] == 1
    assert out["id_unique"]["n_violations"] == 1  # one extra copy of id 4
    assert out["id_fk"]["n_violations"] == 2     # both id-4 rows orphaned
    assert all(r["n_rows"] == 5 for r in out.values())
    assert out["amount_not_null"]["passed"] == 0


def test_scalar_rule_over_unique_named_column_routes_scalar(spark):
    """Routing regression: a SCALAR rule over a column whose name
    contains '_unique' must stay in the scalar branch (the old
    substring-of-name routing misrouted it into the uniqueness
    branch and grouped by a nonexistent column)."""
    df = spark.createDataFrame(
        [(1, True), (2, None), (2, True)], "id long, is_unique_flag boolean"
    )
    out = {
        r["rule"]: r
        for r in check_expectations(
            df, [not_null_rule("is_unique_flag"), unique_rule("id")]
        ).collect()
    }
    assert out["is_unique_flag_not_null"]["n_violations"] == 1
    assert out["id_unique"]["n_violations"] == 1


def test_all_pass_and_single_scan(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double")
    out = check_expectations(
        df, [range_rule("v", 0, 10), not_null_rule("v")]
    )
    rows = out.collect()
    assert all(r["passed"] == 1 for r in rows)
    # scalar rules compile into ONE aggregation: no join, no cartesian,
    # and a single pair of partial/final aggregates behind the union
    rep = plan_report(out)
    assert rep["cartesian"] == 0 and rep["python_row_udfs"] == 0


def test_observe_expectations_inline_metrics(spark):
    """The Observation form: DQ counters ride along with the action the
    pipeline was already running — values must equal the gate form's,
    with no second job."""
    from spendinganalysisetl_spark.operators.quality import observe_expectations

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 10.0)],
        "id long, amount double",
    )
    rules = [range_rule("amount", 0, 100), not_null_rule("amount")]
    observed, obs = observe_expectations(df, rules)
    # The pipeline's OWN action (here: a downstream aggregate) triggers
    # metric collection — no separate DQ pass.
    downstream = observed.groupBy().sum("amount").collect()
    assert downstream[0][0] == 15.0
    got = obs.get
    assert got["n_rows"] == 4
    assert got["amount_between_0_100"] == 2  # -5 and the NULL
    assert got["amount_not_null"] == 1
    # parity with the gate form on the same rules
    gate = {
        r["rule"]: r["n_violations"]
        for r in check_expectations(df, rules).collect()
    }
    assert gate["amount_between_0_100"] == got["amount_between_0_100"]
    assert gate["amount_not_null"] == got["amount_not_null"]


def test_observe_expectations_rejects_non_scalar(spark):
    from spendinganalysisetl_spark.operators.quality import observe_expectations

    df = spark.createDataFrame([(1,)], "id long")
    try:
        observe_expectations(df, [unique_rule("id")])
        raise AssertionError("expected ValueError for unique rule")
    except ValueError as e:
        assert "scalar" in str(e)
