"""Hive-style partitioned layout: directory partition pruning for
time-sliced scans (SURVEY.md §4 "partition pruning" / 100 TB design).

The reference's sink is one Snowflake table probed by ``(begin_date,
end_date)`` (/root/reference/main.py:56-60, transformer.py:46-52);
Snowflake's micro-partition pruning makes that point read cheap. The
Spark-native equivalent for a 100 TB fact table is a Hive-partitioned
directory tree (``.write.partitionBy(date_col)``): a predicate on the
partition column is resolved against directory names in the driver's
file index — pruned partitions are never listed, opened, or scanned,
so a one-month query over ten years of data touches ~1/120th of the
files regardless of cluster size.

Two deliberate policies:

- **Partition on a LOW-cardinality derived column** (month, not
  timestamp): one directory per distinct value; partitioning on a
  near-unique column creates millions of tiny files (the classic
  small-files failure) and overwhelms the file index.
- **Repartition by the partition column before writing** so each
  partition directory receives one file per shuffle partition that
  actually holds its data, not one file per upstream task (the
  task-count × partition-count file explosion).

``tests/test_partitioned.py`` verifies value-equality with the
unpartitioned scan AND that the physical plan's file index reports the
pruned partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_col: str, mode: str = "overwrite"
) -> None:
    """Write ``df`` as a Hive-partitioned parquet tree at ``path``.

    The pre-write ``repartition(partition_col)`` routes every row of a
    partition value to one task → one file per populated directory
    (AQE may coalesce further). Without it, N upstream tasks × P
    partition values can emit N·P files.
    """
    df.repartition(F.col(partition_col)).write.mode(mode).partitionBy(
        partition_col
    ).parquet(path)


def read_partition_range(
    spark: SparkSession,
    path: str,
    partition_col: str,
    lo: str,
    hi: str,
) -> DataFrame:
    """Scan only the partitions with ``lo <= partition_col <= hi``.

    The filter is a plain predicate on the partition column; Spark's
    ``PartitioningAwareFileIndex`` evaluates it against directory names
    during planning (visible as ``PartitionFilters`` in the formatted
    explain), so non-matching directories are never even listed.
    """
    df = spark.read.parquet(path)
    return df.filter((F.col(partition_col) >= lo) & (F.col(partition_col) <= hi))


def partition_filters(df: DataFrame) -> str:
    """The ``PartitionFilters`` line of the formatted physical plan —
    empty string if the scan has none. Test/diagnostic helper."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "PartitionFilters" in line:
            return line.strip()
    return ""


def missing_partitions(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    partition_col: str,
) -> list[str]:
    """Backfill planner: partition values present in ``source`` but
    absent from the partitioned output tree at ``path`` — the diff an
    orchestrated incremental job runs FIRST so it (re)computes only
    missing slices instead of the whole history.

    Scale shape: the source side is ONE distinct aggregation of the
    partition column (tiny key space by the low-cardinality policy
    above); the output side never scans data at all — partition values
    come from the file index's directory names. The returned list is
    partition-count sized, safe to collect; feed each value through a
    filtered ``write_partitioned(mode="append")`` run.
    """
    import os

    have: set[str] = set()
    if os.path.isdir(path):
        prefix = f"{partition_col}="
        have = {
            d[len(prefix):]
            for d in os.listdir(path)
            if d.startswith(prefix)
        }
    want = [
        r[0]
        for r in source.select(partition_col).distinct().collect()
        if r[0] is not None
    ]
    return sorted(str(v) for v in want if str(v) not in have)


def backfill_partitions(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    partition_col: str,
) -> list[str]:
    """Run the backfill the planner found: append ONLY the missing
    partition slices (one filtered write over the pruned source — the
    partition predicate pushes into the source scan when ``source`` is
    itself partition-pruned storage). Returns the values written.
    Idempotent: a second call finds nothing missing and writes nothing.
    """
    todo = missing_partitions(spark, source, path, partition_col)
    if todo:
        slice_df = source.filter(F.col(partition_col).isin(todo))
        write_partitioned(slice_df, path, partition_col, mode="append")
    return todo
