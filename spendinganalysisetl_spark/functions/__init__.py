"""Expression builders — all JVM-side ``pyspark.sql.functions`` so the
hot path stays inside whole-stage codegen (no row-at-a-time Python)."""

from spendinganalysisetl_spark.functions.scalars import (  # noqa: F401
    pct_change_ref,
    pct_change_safe,
    revenue,
    round2,
)
