"""Sort-clustered parquet layout (sources.sorted_layout): row-group
min/max bands must make a narrow range predicate skippable, and the
layout must be value-equal to the unsorted scan."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_sorted_layout_skips_and_preserves(spark, tmp_path):
    from spendinganalysisetl_spark.catalog import load_table
    from spendinganalysisetl_spark.sources.sorted_layout import (
        matching_fraction,
        read_layout,
        row_group_bands,
        write_sorted,
    )

    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    sorted_path = str(tmp_path / "li_sorted")
    unsorted_path = str(tmp_path / "li_unsorted")
    write_sorted(li, sorted_path, "l_shipdate", n_files=8)
    # Unsorted control: same rows, round-robin spread destroys clustering.
    li.repartition(8).write.parquet(unsorted_path)

    # Value-equality (layout is an optimization, never a semantic change).
    a = sorted(map(tuple, read_layout(spark, sorted_path).collect()))
    b = sorted(map(tuple, li.collect()))
    assert a == b

    # One month out of the ~7-year shipdate range: the sorted layout's
    # row-group bands must let most row groups be skipped, the unsorted
    # layout's must not.
    lo, hi = datetime.date(1995, 6, 1), datetime.date(1995, 7, 1)
    # pyarrow surfaces date32 row-group stats as datetime.datetime.
    slo, shi = (datetime.datetime(d.year, d.month, d.day) for d in (lo, hi))
    f_sorted = matching_fraction(row_group_bands(sorted_path, "l_shipdate"), slo, shi)
    f_unsorted = matching_fraction(
        row_group_bands(unsorted_path, "l_shipdate"), slo, shi
    )
    assert f_sorted <= 0.3
    assert f_unsorted >= 0.9

    # And the range scan over the sorted layout returns the right rows.
    got = (
        read_layout(spark, sorted_path)
        .filter((F.col("l_shipdate") >= F.lit(lo)) & (F.col("l_shipdate") < F.lit(hi)))
        .count()
    )
    want = li.filter(
        (F.col("l_shipdate") >= F.lit(lo)) & (F.col("l_shipdate") < F.lit(hi))
    ).count()
    assert got == want and want > 0
