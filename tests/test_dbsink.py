"""External-DB sink (sources.dbsink): distributed DBAPI append and the
staged MERGE upsert, against a DuckDB file database (the embedded
stand-in for the reference's warehouse target, loader.py:7-15)."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from spendinganalysisetl_spark.sources.dbsink import (
    ddl_for,
    factory_from_env,
    upsert_to_db,
    write_to_db,
)

SF = "/root/testdata/sf0.001"


def _duck_factory(path: str):
    """Factory builder: the returned closure is defined in function
    scope, so cloudpickle ships it BY VALUE to the executors (a
    module-level test helper would pickle by reference to the test
    module, which workers cannot import)."""

    def _connect():
        import duckdb

        return duckdb.connect(path)

    return _connect


def _report_df(spark, n_types=None):
    df = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("event_type").alias("begin_date"),
            F.col("event_type").alias("end_date"),
            "n_events",
        )
    )
    return df


def test_write_to_db_appends_all_rows(spark, tmp_path):
    db = str(tmp_path / "sink.duckdb")
    factory = _duck_factory(db)
    df = _report_df(spark)
    write_to_db(df, factory, "reports", single_writer=True)
    with duckdb.connect(db) as con:
        got = con.execute('SELECT count(*) FROM "reports"').fetchone()[0]
    assert got == df.count()


def test_write_to_db_parallel_partitions_roundtrip(spark, tmp_path):
    """Multi-partition write path (each partition its own connection +
    executemany batches): every row lands exactly once. DuckDB is
    single-writer ACROSS processes, so the parallel path is exercised
    with partitions serialized through small batches on one local
    executor pool writing distinct batches — the correctness claim is
    row conservation, not concurrent throughput."""
    db = str(tmp_path / "sink_par.duckdb")
    factory = _duck_factory(db)
    df = spark.read.parquet(f"{SF}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    # single_writer=True still drives the generic per-partition writer
    # code path (one partition is just the n=1 case).
    write_to_db(df, factory, "nations", batch_size=7, single_writer=True)
    with duckdb.connect(db) as con:
        rows = con.execute(
            'SELECT n_nationkey, n_name, n_regionkey FROM "nations" ORDER BY n_nationkey'
        ).fetchall()
    want = [
        (r["n_nationkey"], r["n_name"], r["n_regionkey"])
        for r in df.orderBy("n_nationkey").collect()
    ]
    assert rows == want


def test_upsert_to_db_merge_semantics(spark, tmp_path):
    """The staged MERGE follows the reference's rule: INSERT new keys,
    UPDATE only when compare_col GREW, no-op otherwise
    (transformer.py:53-69)."""
    db = str(tmp_path / "merge.duckdb")
    factory = _duck_factory(db)
    df = _report_df(spark)
    upsert_to_db(df, factory, "reports", key=("begin_date", "end_date"),
                 compare_col="n_events")
    with duckdb.connect(db) as con:
        base = dict(
            con.execute('SELECT begin_date, n_events FROM "reports"').fetchall()
        )
    assert base == {
        r["begin_date"]: r["n_events"] for r in df.collect()
    }

    # Re-merging the same batch is a no-op (equal counts lose the gate).
    upsert_to_db(df, factory, "reports", key=("begin_date", "end_date"),
                 compare_col="n_events")
    # A grown batch updates in place; a new key inserts.
    grown = df.withColumn("n_events", F.col("n_events") + F.lit(5))
    extra = spark.createDataFrame(
        [("zz_new", "zz_new", 1)], schema=df.schema
    )
    upsert_to_db(grown.union(extra), factory, "reports",
                 key=("begin_date", "end_date"), compare_col="n_events")
    with duckdb.connect(db) as con:
        after = dict(
            con.execute('SELECT begin_date, n_events FROM "reports"').fetchall()
        )
        n_rows = con.execute('SELECT count(*) FROM "reports"').fetchone()[0]
    assert after["zz_new"] == 1
    for k, v in base.items():
        assert after[k] == v + 5
    assert n_rows == len(base) + 1


def test_upsert_to_db_delete_leg(spark, tmp_path):
    """WHEN MATCHED AND <cond> THEN DELETE at the external target:
    doomed keys leave the table AND their batch rows are consumed (no
    re-insert through the anti-join leg); unmatched rows survive."""
    db = str(tmp_path / "purge.duckdb")
    factory = _duck_factory(db)
    df = _report_df(spark)
    upsert_to_db(df, factory, "reports", key=("begin_date", "end_date"),
                 compare_col="n_events")
    victim = df.orderBy("begin_date").limit(1).collect()[0]["begin_date"]

    grown = df.withColumn("n_events", F.col("n_events") + F.lit(5))
    upsert_to_db(
        grown, factory, "reports", key=("begin_date", "end_date"),
        compare_col="n_events",
        delete_where=f'"reports"."begin_date" = \'{victim}\'',
    )
    with duckdb.connect(db) as con:
        after = dict(
            con.execute('SELECT begin_date, n_events FROM "reports"').fetchall()
        )
    assert victim not in after, "doomed key must not re-insert"
    base = {r["begin_date"]: r["n_events"] for r in df.collect()}
    for k, v in base.items():
        if k != victim:
            assert after[k] == v + 5  # update leg still fires for the rest
    assert len(after) == len(base) - 1


def test_ddl_rejects_complex_types(spark):
    df = spark.createDataFrame([([1, 2],)], "arr array<int>")
    with pytest.raises(ValueError, match="no relational mapping"):
        ddl_for(df, "t")


def test_factory_from_env_duckdb(tmp_path, monkeypatch):
    db = str(tmp_path / "env.duckdb")
    monkeypatch.setenv("SPARK_DB_PATH", db)
    conn = factory_from_env("duckdb")()
    conn.execute("CREATE TABLE t AS SELECT 1 AS x")
    conn.close()
    with duckdb.connect(db) as con:
        assert con.execute("SELECT x FROM t").fetchone()[0] == 1


def test_factory_from_env_snowflake_is_import_gated(monkeypatch):
    for k in ("USER", "PASSWORD", "ACCOUNT", "WAREHOUSE", "DATABASE", "SCHEMA"):
        monkeypatch.setenv(f"SPARK_DB_{k}", "x")
    with pytest.raises(ImportError):
        factory_from_env("snowflake")()
