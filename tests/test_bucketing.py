"""Bucketed co-located join: the write-once-shuffle-never join path
(sources.bucketing). Verifies BOTH properties that matter at scale:
(1) the co-bucketed join plans with zero Exchange nodes, (2) results
are value-identical to the plain shuffled join."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from spendinganalysisetl_spark.catalog import load_table
from spendinganalysisetl_spark.sources.bucketing import (
    cobucketed_join,
    plan_has_exchange,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucket_dir():
    d = tempfile.mkdtemp(prefix="buckets_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_cobucketed_join_no_shuffle_and_equal(spark, sf_dir, bucket_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    write_bucketed(
        orders, "orders_b", f"{bucket_dir}/orders", "o_orderkey", 4,
        sort_cols=("o_orderkey",),
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", f"{bucket_dir}/lineitem", "o_orderkey", 4,
        sort_cols=("o_orderkey",),
    )

    # Force the sort-merge path: a broadcast join would hide the
    # exchange question entirely.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cobucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey")
        agg = joined.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
        # The join itself must not shuffle — bucket metadata satisfies
        # the distribution requirement from storage.
        assert not plan_has_exchange(
            cobucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey")
        ), "co-bucketed join should plan with zero Exchange nodes"

        expected = (
            orders.join(
                lineitem, orders.o_orderkey == lineitem.l_orderkey
            )
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("l_quantity"), 2).alias("qty"),
            )
        )
        assert sorted(map(tuple, agg.collect())) == sorted(
            map(tuple, expected.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
