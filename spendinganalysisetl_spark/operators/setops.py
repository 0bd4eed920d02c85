"""Set operations (SURVEY.md §2.7).

Absent from the reference (its only set-like op is ``set.add`` across
uploads, transformer.py:154-155 → A7/A8); exposed here because the
engine's query surface needs them and they are free in Spark
(union/intersect/exceptAll are logical operators Catalyst plans as
aggregates/joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _cust_nations(customer: DataFrame) -> DataFrame:
    return customer.select(customer.c_nationkey.alias("nationkey"))


def _supp_nations(supplier: DataFrame) -> DataFrame:
    return supplier.select(supplier.s_nationkey.alias("nationkey"))


def nations_union(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """UNION (distinct): nations with a customer or a supplier."""
    return _cust_nations(customer).union(_supp_nations(supplier)).distinct().repartition(1).sortWithinPartitions("nationkey")


def nations_intersect(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """INTERSECT: nations with both."""
    return _cust_nations(customer).intersect(_supp_nations(supplier)).repartition(1).sortWithinPartitions("nationkey")


def nations_except(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """EXCEPT (distinct): customer nations with no supplier.
    ``subtract`` is Spark's EXCEPT DISTINCT."""
    return _cust_nations(customer).subtract(_supp_nations(supplier)).repartition(1).sortWithinPartitions("nationkey")


def _priority_setop_all(orders_a: DataFrame, orders_b: DataFrame, op: str) -> DataFrame:
    """Shared multiset set-op core: apply intersectAll/exceptAll on the
    priority projection and count the surviving multiplicities."""
    a = orders_a.select("o_orderpriority")
    b = orders_b.select("o_orderpriority")
    return (
        getattr(a, op)(b)
        .groupBy("o_orderpriority")
        .count()
        .withColumnRenamed("count", "n_rows")
        .repartition(1)
        .sortWithinPartitions("o_orderpriority")
    )


def priority_intersect_all(orders_a: DataFrame, orders_b: DataFrame) -> DataFrame:
    """INTERSECT ALL: multiset intersection (min of per-side
    multiplicities) — Catalyst plans it as a counted aggregate join,
    no row-pair explosion."""
    return _priority_setop_all(orders_a, orders_b, "intersectAll")


def priority_except_all(orders_a: DataFrame, orders_b: DataFrame) -> DataFrame:
    """EXCEPT ALL: multiset difference (left multiplicity minus right,
    floored at zero)."""
    return _priority_setop_all(orders_a, orders_b, "exceptAll")
