"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship report on sf0.001 (smoke: rows > 0).
``queries()`` — every implemented operator from SURVEY.md §2, as
``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — DuckDB twins for the correctness gate.

Implementation lives in ``spendinganalysisetl_spark``; this module only
adapts the package registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from spendinganalysisetl_spark import registry  # noqa: E402
from spendinganalysisetl_spark.catalog import load_table  # noqa: E402
from spendinganalysisetl_spark.operators import report  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full spending report (SURVEY.md A13) — one row with
    global sums, date bracket, distinct name lists, per-category and
    per-vendor totals, and the reference-parity bottom-5 "top_5_vendors".
    """
    sales = report.base_sales(
        load_table(spark, SMOKE_SF_DIR, "lineitem"),
        load_table(spark, SMOKE_SF_DIR, "orders"),
        load_table(spark, SMOKE_SF_DIR, "part"),
        load_table(spark, SMOKE_SF_DIR, "supplier"),
    )
    return report.assemble_report(sales)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Driver-check order, not registration order: the driver oracle-checks
    # only the first 50 entries, so oracle-backed queries with distinct
    # semantics come first (see registry.ordered_queries).
    return registry.ordered_queries()


def oracle_sql() -> dict[str, str]:
    ordered = registry.ordered_queries()
    return {n: registry.ORACLE[n] for n in ordered if n in registry.ORACLE}
