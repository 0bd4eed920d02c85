"""Physical-plan audits (SURVEY.md §4): the scale-design claims in the
README are properties of the PLAN, so pin them as assertions — filters
reach the parquet scan, projections prune the read schema, dimension
joins broadcast, and the report aggregation is partial/final."""

from __future__ import annotations

from pyspark.sql import functions as F

from spendinganalysisetl_spark.catalog import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_date_filter_pushed_to_orders_scan(spark, sf_dir):
    from spendinganalysisetl_spark.operators.report import base_sales

    sales = base_sales(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        begin_date="1995-01-01",
        end_date="1996-01-01",
    )
    plan = _plan(sales)
    # The range predicate must appear among the scan's pushed filters,
    # not only as a post-scan Filter node.
    assert "PushedFilters" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln and "o_orderdate" in ln]
    assert pushed, f"o_orderdate not pushed: {plan[:2000]}"


def test_dim_joins_broadcast_not_shuffle(spark, sf_dir):
    from spendinganalysisetl_spark.operators.report import base_sales

    sales = base_sales(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
    )
    plan = _plan(sales)
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]
    # The fact table must not shuffle for enrichment: no Exchange
    # hashpartitioning on lineitem join keys in the enrich pipeline.
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_projection_prunes_read_schema(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    plan = _plan(df)
    schema_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert schema_lines, plan[:1000]
    line = schema_lines[0]
    assert "o_orderkey" in line and "o_orderdate" in line
    # a pruned scan must not read the wide payload columns
    assert "o_comment" not in line and "o_totalprice" not in line


def test_grouped_sum_is_partial_final(spark, sf_dir):
    df = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    plan = _plan(df)
    # partial (map-side) + final HashAggregate pair around one exchange
    assert plan.count("HashAggregate") >= 2, plan[:2000]
