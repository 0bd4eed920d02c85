"""CSV / JSON-lines connector round-trips under declared schemas
(sources.formats): values survive bit-for-bit, including the
map<string,double> column shape the reference's upload summaries use
(JSONL only — CSV is flat-only by design)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from spendinganalysisetl_spark.catalog import load_table
from spendinganalysisetl_spark.sources.formats import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)


@pytest.fixture()
def tmp_out():
    d = tempfile.mkdtemp(prefix="formats_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_csv_roundtrip_flat_table(spark, sf_dir, tmp_out):
    nation = load_table(spark, sf_dir, "nation")
    write_csv(nation, f"{tmp_out}/nation_csv")
    back = read_csv(spark, f"{tmp_out}/nation_csv", nation.schema)
    assert back.schema.simpleString() == nation.schema.simpleString()
    assert _sorted_rows(back) == _sorted_rows(nation)


def test_jsonl_roundtrip_with_map_column(spark, sf_dir, tmp_out):
    # Build a reference-shaped summary row: map<string,double> column
    # (SURVEY.md §1.1 upload-summary shape).
    orders = load_table(spark, sf_dir, "orders").limit(100)
    summaries = orders.groupBy("o_orderpriority").agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    F.col("o_orderkey").cast("string").alias("k"),
                    F.col("o_totalprice").cast("double").alias("v"),
                )
            )
        ).alias("spending_map"),
        F.count(F.lit(1)).alias("n"),
    )
    write_jsonl(summaries, f"{tmp_out}/summaries")
    back = read_jsonl(spark, f"{tmp_out}/summaries", summaries.schema)
    assert back.schema.simpleString() == summaries.schema.simpleString()
    got = {r["o_orderpriority"]: (dict(r["spending_map"]), r["n"]) for r in back.collect()}
    want = {
        r["o_orderpriority"]: (dict(r["spending_map"]), r["n"])
        for r in summaries.collect()
    }
    assert got == want


def test_csv_failfast_on_malformed(spark, tmp_out):
    from pyspark.sql.types import LongType, StructField, StructType

    with open(f"{tmp_out}/bad.csv", "w") as f:
        f.write("a,b\n1,2\nnot_a_number,3\n")
    schema = StructType([StructField("a", LongType()), StructField("b", LongType())])
    with pytest.raises(Exception):
        read_csv(spark, f"{tmp_out}/bad.csv", schema).collect()


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_out):
    from spendinganalysisetl_spark.sources.formats import read_orc, write_orc

    orders = load_table(spark, sf_dir, "orders")
    write_orc(orders, f"{tmp_out}/orders_orc")
    back = read_orc(spark, f"{tmp_out}/orders_orc")
    assert back.schema.simpleString() == orders.schema.simpleString()
    assert back.count() == orders.count()
    # predicate + projection reach the ORC scan
    q = back.filter(F.col("o_orderkey") == 7).select("o_orderkey", "o_totalprice")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderkey" in plan.split("PushedFilters")[1][:120]
    got = q.collect()
    want = orders.filter(F.col("o_orderkey") == 7).select("o_orderkey", "o_totalprice").collect()
    assert got == want


def test_csv_quarantine_splits_good_and_bad(spark, tmp_out):
    from pyspark.sql.types import LongType, StructField, StructType

    from spendinganalysisetl_spark.sources.formats import read_csv_quarantine

    with open(f"{tmp_out}/dlq.csv", "w") as f:
        f.write("a,b\n1,2\nnot_a_number,3\n4,5\n6,oops\n")
    schema = StructType([StructField("a", LongType()), StructField("b", LongType())])
    good, bad = read_csv_quarantine(spark, f"{tmp_out}/dlq.csv", schema)
    assert sorted((r["a"], r["b"]) for r in good.collect()) == [(1, 2), (4, 5)]
    # quarantined rows carry the ORIGINAL line for repair/replay
    assert sorted(r["raw_line"] for r in bad.collect()) == [
        "6,oops",
        "not_a_number,3",
    ]
