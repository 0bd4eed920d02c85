"""Hive-partitioned layout (sources.partitioned): a date-range scan
must (1) prune non-matching partition directories at planning time and
(2) return exactly the rows the unpartitioned filtered scan returns."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from spendinganalysisetl_spark.catalog import load_table
from spendinganalysisetl_spark.sources.partitioned import (
    partition_filters,
    read_partition_range,
    write_partitioned,
)


@pytest.fixture(scope="module")
def part_tree(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="partitioned_")
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    write_partitioned(orders, d, "order_month")
    yield d, orders
    shutil.rmtree(d, ignore_errors=True)


def test_partition_pruned_range_scan_matches_full_scan(spark, part_tree):
    part_dir, orders = part_tree
    lo, hi = "1995-01", "1995-03"
    pruned = read_partition_range(spark, part_dir, "order_month", lo, hi)

    # (1) the predicate reached the file index, not a post-scan Filter
    pf = partition_filters(pruned)
    assert "order_month" in pf, f"no partition filter in plan: {pf!r}"

    # (2) value-equality with the unpartitioned path
    expect = sorted(
        (r["o_orderkey"], r["order_month"])
        for r in orders.filter(
            (F.col("order_month") >= lo) & (F.col("order_month") <= hi)
        ).collect()
    )
    got = sorted((r["o_orderkey"], r["order_month"]) for r in pruned.collect())
    assert got == expect and len(got) > 0

    # (3) the pruned scan reads strictly fewer partitions than exist
    n_months = orders.select("order_month").distinct().count()
    n_selected = pruned.select("order_month").distinct().count()
    assert 0 < n_selected < n_months


def test_dynamic_partition_pruning_via_dim_filter(spark, part_tree):
    """DPP: joining the partitioned fact with a FILTERED dimension must
    prune fact partitions at runtime from the dim's join keys — the
    plan's partition filters carry a dynamicpruning subquery, so a
    100 TB fact scan only opens partitions the dim filter selects, even
    though no literal partition predicate appears in the query."""
    part_dir, orders = part_tree
    fact = spark.read.parquet(part_dir)
    months = (
        orders.select("order_month")
        .distinct()
        .filter(F.col("order_month").between("1996-01", "1996-02"))
    )
    joined = fact.join(months, "order_month")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), (
        f"no dynamic partition pruning in plan:\n{plan[:2000]}"
    )
    # value check: DPP must not change results
    got = joined.count()
    expect = orders.filter(
        F.col("order_month").between("1996-01", "1996-02")
    ).count()
    assert got == expect > 0


def test_partitioned_write_one_file_per_partition(part_tree):
    """The pre-write repartition must prevent the task-count ×
    partition-count small-file explosion: each month directory holds a
    single parquet file."""
    part_dir, _ = part_tree
    month_dirs = glob.glob(os.path.join(part_dir, "order_month=*"))
    assert month_dirs, "partitioned tree missing"
    for d in month_dirs:
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, f"{d} has {len(files)} files"


def test_backfill_only_missing_partitions(spark, tmp_path):
    from pyspark.sql import functions as F

    from spendinganalysisetl_spark.sources.partitioned import (
        backfill_partitions,
        missing_partitions,
        write_partitioned,
    )

    out = str(tmp_path / "tree")
    full = spark.createDataFrame(
        [(m, i, float(i)) for m in ("2024-01", "2024-02", "2024-03") for i in range(10)],
        "month string, k long, v double",
    )
    # seed with one month present
    write_partitioned(full.filter(F.col("month") == "2024-01"), out, "month")
    assert missing_partitions(spark, full, out, "month") == ["2024-02", "2024-03"]

    wrote = backfill_partitions(spark, full, out, "month")
    assert wrote == ["2024-02", "2024-03"]
    back = spark.read.parquet(out)
    assert back.count() == 30
    # idempotent: nothing left to do, nothing double-appended
    assert backfill_partitions(spark, full, out, "month") == []
    assert spark.read.parquet(out).count() == 30
