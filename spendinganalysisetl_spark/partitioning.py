"""Partitioning helpers — the explicit knobs this engine turns where
Catalyst can't know better (SURVEY.md §4: everything else is left to the
optimizer on purpose).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition before CPU-heavy per-row work.

    Source tables often arrive in a handful of large files (locally: one
    parquet file per table), so the scan yields few input partitions and
    per-row work (shingling, hashing, vector math) serializes on a few
    cores. An explicit round-robin repartition to the cluster's default
    parallelism costs one small shuffle of the raw rows and unlocks full
    fan-out — the same move a 1000-executor job makes when upstream file
    splits are coarse relative to per-row compute cost.

    Deliberately NOT applied to scan→filter→agg pipelines: there the
    shuffle would cost more than the scan, and partial aggregation
    already parallelizes after the exchange.
    """
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)

