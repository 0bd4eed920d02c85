"""Sort-clustered parquet layout: row-group data skipping for range
predicates (the zone-map / Z-order-lite move, SURVEY.md §4 "predicate
pushdown" at the storage layer).

Hive partitioning (``sources.partitioned``) prunes whole directories on
a LOW-cardinality column. For range predicates on a high-cardinality
column (ship date, timestamp, id) the complementary layout is
range-repartition + sort-within-partitions before writing: every file —
and every parquet row group inside it — then covers a narrow, nearly
disjoint min/max band of the sort column. Parquet stores those min/max
statistics per row group, and Spark's pushed-down filters skip any row
group whose band cannot match, so a narrow range scan over a 100 TB
table reads a handful of row groups instead of all of them. On an
unsorted layout the same statistics exist but every row group spans
nearly the full value range — nothing can be skipped.

``repartitionByRange`` samples the sort key to build balanced ranges
(one skew-free file per output task); ``sortWithinPartitions`` orders
rows inside each file so row-group bands are tight. This is the
write-once cost that repeated range scans amortize, exactly like
``sources.bucketing`` pays one shuffle at write time to make every
later join shuffle-free.

``tests/test_sorted_layout.py`` asserts both halves with pyarrow footer
inspection: value-equality with the unsorted scan, and that the sorted
layout's matching-row-group fraction for a narrow predicate is a small
fraction of the unsorted layout's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_sorted(
    df: DataFrame,
    path: str,
    sort_col: str,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` range-clustered on ``sort_col`` into ``n_files``
    balanced files, each internally sorted."""
    (
        df.repartitionByRange(n_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode(mode)
        .parquet(path)
    )


def read_layout(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def row_group_bands(path: str, column: str) -> list[tuple]:
    """(min, max) statistics of ``column`` for every row group under
    ``path`` — read from parquet footers only (no data pages), the same
    metadata the scan's skipping decision uses."""
    import os

    import pyarrow.parquet as pq

    bands: list[tuple] = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = md.schema.names.index(column)
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(idx).statistics
            bands.append((stats.min, stats.max))
    return bands


def matching_fraction(bands: list[tuple], lo, hi) -> float:
    """Fraction of row groups whose [min,max] band intersects [lo, hi) —
    i.e. the fraction a range scan must actually read."""
    if not bands:
        return 0.0
    hit = sum(1 for mn, mx in bands if not (mx < lo or mn >= hi))
    return hit / len(bands)
