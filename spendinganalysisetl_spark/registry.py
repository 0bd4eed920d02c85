"""Query registry: the driver-facing catalog of implemented operators.

Each entry pairs a Spark plan builder ``(spark, sf_dir) -> DataFrame``
with an ANSI-SQL twin that DuckDB runs on the same parquet tables
(SURVEY.md §5.1 oracle-differential testing). Column names and types are
aligned on both sides — the driver sorts columns by name and hashes
values, so every computed column is aliased identically.

Conventions for oracle-checked queries:
- flat output columns only (no map/array/struct — SURVEY.md §5.1);
- doubles rounded at a declared precision on BOTH sides;
- timestamps emitted as 'yyyy-MM-dd[ HH:mm:ss]' strings;
- deterministic tiebreaks on any LIMIT/top-k.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spendinganalysisetl_spark.catalog import load_table
from spendinganalysisetl_spark.operators import report

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and its DuckDB oracle twin) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def money_sum_sql(expr: str) -> str:
    """SQL twin of ``functions.scalars.money_sum``: exact bigint
    decimicent sum, half-up to cents in integer space, dollars out.
    Engine-independent for 4-decimal money values (see money_sum
    docstring for the empirical failure this avoids)."""
    return (
        f"floor((sum(CAST(floor(({expr})*10000 + 0.5) AS BIGINT)) + 50) / 100.0) / 100.0"
    )


def _sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    return report.base_sales(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
    )


# SQL twin of report.base_sales (full date range) — inlined as a CTE in
# every report-family oracle.
SALES_CTE = """
WITH sales AS (
  SELECT l.l_orderkey        AS order_key,
         CAST(o.o_orderdate AS DATE) AS order_date,
         p.p_type            AS category,
         s.s_name            AS vendor,
         l.l_extendedprice * (1 - l.l_discount) AS amount
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN part p     ON l.l_partkey  = p.p_partkey
  JOIN supplier s ON l.l_suppkey  = s.s_suppkey
)
"""


# --- report family (SURVEY.md §2.4) -----------------------------------------


@register(
    "report_global_summary",
    SALES_CTE
    + f"""
SELECT {money_sum_sql('amount')}         AS total_spent,
       count(*)                          AS total_transactions,
       strftime(min(order_date), '%Y-%m-%d') AS begin_date,
       strftime(max(order_date), '%Y-%m-%d') AS end_date
FROM sales
""",
)
def q_report_global_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A4: global spend/count/date-bracket (transformer.py:172-187)."""
    return report.global_summary(_sales(spark, sf_dir))


@register(
    "category_totals",
    SALES_CTE
    + f"""
SELECT category AS name, {money_sum_sql('amount')} AS total
FROM sales GROUP BY category ORDER BY total, name
""",
)
def q_category_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+A10: grouped sum by category, value-ascending (transformer.py:194-198,212-213)."""
    return report.totals_by(_sales(spark, sf_dir), "category", "name")


@register(
    "vendor_totals",
    SALES_CTE
    + f"""
SELECT vendor AS name, {money_sum_sql('amount')} AS total
FROM sales GROUP BY vendor ORDER BY total, name
""",
)
def q_vendor_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6+A10: grouped sum by vendor (transformer.py:200-205)."""
    return report.totals_by(_sales(spark, sf_dir), "vendor", "name")


@register(
    "category_totals_ref_roundsum",
    SALES_CTE
    + """
SELECT name, sum(entry_cents) / 100.0 AS total
FROM (
  SELECT order_key, category AS name,
         CAST(floor((sum(CAST(floor(amount*10000 + 0.5) AS BIGINT)) + 50) / 100.0) AS BIGINT) AS entry_cents
  FROM sales GROUP BY order_key, category
) GROUP BY name ORDER BY total, name
""",
)
def q_category_totals_ref_roundsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 reference-parity round-then-sum quirk (transformer.py:196)."""
    return report.totals_by_ref_roundsum(_sales(spark, sf_dir), "category", "name")


@register(
    "unique_categories",
    SALES_CTE + "SELECT DISTINCT category AS name FROM sales ORDER BY name",
)
def q_unique_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: distinct category names, sorted, as rows (transformer.py:154,232)."""
    return report.distinct_names(_sales(spark, sf_dir), "category", "name")


@register(
    "bottom5_vendors_ref_compat",
    SALES_CTE
    + f"""
SELECT vendor, {money_sum_sql('amount')} AS total
FROM sales GROUP BY vendor ORDER BY total ASC, vendor ASC LIMIT 5
""",
)
def q_bottom5_vendors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 ref-parity: the reference's "top_5_vendors" is the 5 LOWEST
    (asc sort + [:5], transformer.py:212-213,240)."""
    return report.bottom_k_vendors(_sales(spark, sf_dir), 5)


@register(
    "top5_vendors",
    SALES_CTE
    + f"""
SELECT vendor, {money_sum_sql('amount')} AS total
FROM sales GROUP BY vendor ORDER BY total DESC, vendor ASC LIMIT 5
""",
)
def q_top5_vendors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 corrected semantics: 5 highest-spend vendors."""
    return report.top_k_vendors(_sales(spark, sf_dir), 5)
