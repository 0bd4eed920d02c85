"""Physical-plan audits (SURVEY.md §4): the scale-design claims in the
README are properties of the PLAN, so pin them as assertions — filters
reach the parquet scan, projections prune the read schema, dimension
joins broadcast, and the report aggregation is partial/final."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spendinganalysisetl_spark.catalog import load_table


from spendinganalysisetl_spark.plans import physical_plan as _plan  # noqa: E402
from spendinganalysisetl_spark.plans import plan_report  # noqa: E402


def test_plan_report_shape(spark, sf_dir):
    """The public introspection API (plans.plan_report) reports the
    properties the audits below assert individually."""
    df = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate")
        .filter(F.col("o_orderdate") >= "1995-01-01")
    )
    rep = plan_report(df)
    assert rep["cartesian"] == 0 and rep["python_row_udfs"] == 0
    assert rep["codegen_stages"] >= 1
    assert any("o_orderdate" in ln for ln in rep["pushed_filters"])
    assert any("o_orderkey" in ln for ln in rep["read_schemas"])


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


def test_correlated_subquery_is_decorrelated(spark, sf_dir):
    """Catalyst must rewrite the per-row scalar subquery into one
    brand-level aggregate joined back — the plan may contain joins and
    aggregates but NO per-row subquery execution node."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["correlated_subquery_above_brand_avg"](spark, sf_dir)
    plan = _plan(df)
    assert "Subquery" not in plan, plan[:2000]
    assert "Join" in plan and "Aggregate" in plan


def test_sales_cache_scans_in_parallel(spark, sf_dir):
    """The shared sales intermediate persists spread across the default
    parallelism (its plan is all broadcast joins over a 1-file scan, so
    without the explicit repartition the cache would hold 1-2 partitions
    and every report-family query would scan it nearly serially)."""
    from spendinganalysisetl_spark import registry

    sales = registry._sales(spark, sf_dir)
    assert (
        sales.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    )


def test_unpivot_plans_no_exchange(spark, sf_dir):
    """UNPIVOT (melt) is a row-expanding projection — it must not add
    any exchange over the wide input."""
    import __spark_entry__ as entrymod

    wide_to_long = entrymod.queries()["monthly_unpivot_roundtrip"](spark, sf_dir)
    plan = _plan(wide_to_long)
    # Unpivot lowers to Expand (a row-generating projection); the only
    # hashpartitioning exchange in the whole plan is the pivot's own
    # aggregation below it — nothing between the pivot output and the
    # melt.
    assert "Expand" in plan, plan[:2000]
    above_agg = plan.split("HashAggregate")[0]
    assert "Exchange hashpartitioning" not in above_agg, plan[:3000]


def test_catalog_wide_plan_discipline(spark, sf_dir):
    """Engine-wide physical-plan lint over the whole query catalog:

    - no CartesianProduct anywhere (cross-shaped plans must broadcast —
      BroadcastNestedLoopJoin — or be rewritten as equi-joins);
    - no row-at-a-time Python UDFs (BatchEvalPython); Python is allowed
      only through Arrow (ArrowEvalPython / MapInPandas), which is the
      whole-stage-codegen-adjacent slow path the design brief permits.

    Streaming queries are excluded (building them executes a stream);
    everything else is plan-construction only.
    """
    import __spark_entry__ as entrymod

    offenders = {}
    for name, qfn in entrymod.queries().items():
        if name.startswith("stream_"):
            continue
        plan = _plan(qfn(spark, sf_dir))
        bad = [
            marker
            for marker in ("CartesianProduct", "BatchEvalPython")
            if marker in plan
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, offenders


def test_training_shards_scan_corpus_at_most_twice(spark, sf_dir):
    """build_training_shards must hold exactly TWO documents FileScans,
    both inside the one-time build of the persisted per-doc frame
    (bench-gram branch + enriched feature branch); the packing fork
    must consume the cache, never re-derive the corpus. The plan STRING
    prints the cached build under every InMemoryTableScan reference, so
    walk the node tree instead: caches are leaves of the consuming
    plan, and the cached build plan is counted once."""
    from spendinganalysisetl_spark.operators.trainprep import (
        build_training_shards,
    )

    df = build_training_shards(load_table(spark, sf_dir, "documents"))
    sp = df._jdf.queryExecution().sparkPlan()

    def walk(node):
        yield node
        for i in range(node.children().size()):
            yield from walk(node.children().apply(i))

    nodes = list(walk(sp))
    names = [n.nodeName() for n in nodes]
    # every FileScan in the consuming tree must sit under a broadcast
    # of the cached relation or inside the cache build — the consuming
    # tree itself reads only InMemoryTableScans
    file_scans_outside_cache = [n for n in names if "Scan parquet" in n or n == "FileSourceScan"]
    cache_reads = [n for n in nodes if n.nodeName() == "InMemoryTableScan"]
    assert not file_scans_outside_cache, names
    assert len(cache_reads) == 2, names
    # the shared cache build (identical relations) holds exactly the
    # two corpus scans
    builds = {
        n.relation().cachedPlan().toString() for n in cache_reads
    }
    assert len(builds) == 1, "packing fork must share ONE cached frame"
    # once a prior test has executed the cache, its plan prints AQE
    # "== Final Plan ==" AND "== Initial Plan ==" sections — count
    # scans in the final section only, or the tally doubles
    build = next(iter(builds)).split("== Initial Plan ==")[0]
    assert build.count("FileScan") == 2


@pytest.mark.parametrize(
    "name",
    [
        "tpch_q4_order_priority_exists",
        "tpch_q21_waiting_supplier",
        "tpch_q2_min_cost_supplier",
    ],
)
def test_classic_shapes_decorrelate(spark, sf_dir, name):
    """The Q4/Q21/Q2 forms (correlated EXISTS, multi-correlated
    EXISTS+NOT EXISTS, correlated scalar MIN) must all compile to
    joins+aggregates — a surviving per-row Subquery node would mean
    per-row re-execution, which cannot run at 100 TB."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()[name](spark, sf_dir)
    plan = _plan(df)
    assert "Subquery" not in plan, plan[:2000]
    assert "Join" in plan
