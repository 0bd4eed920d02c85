"""Self-hosted version of the driver's correctness gate (SURVEY.md §5.1):
run every registered Spark query AND its DuckDB oracle on the same
parquet, compare row count, column names, and values order-insensitively.

Runs at sf0.001 for speed; the driver runs the same comparison at
sf0.01. Keeping this green locally is the leading indicator for
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def queries_with_oracles():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    return [(name, qs[name], os_[name]) for name in qs if name in os_]


@pytest.mark.parametrize(
    "name,qfn,sql", queries_with_oracles(), ids=[n for n, _, _ in queries_with_oracles()]
)
def test_query_matches_oracle(spark, ddb, name, qfn, sql):
    sdf = qfn(spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(sql)
    ddb_cols = [d[0].lower() for d in res.description]
    ddb_rows = res.fetchall()

    s_cols, s_rows = _norm_rows(spark_cols, spark_rows)
    d_cols, d_rows = _norm_rows(ddb_cols, ddb_rows)

    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    for sr, dr in zip(s_rows, d_rows):
        assert sr == pytest.approx(dr, rel=1e-9, abs=1e-9), (
            f"{name}: value mismatch {sr} vs {dr}"
        )


def test_all_queries_have_rows_or_known_empty(spark):
    for name, qfn in entrymod.queries().items():
        df = qfn(spark, SF_DIR)
        assert df.count() >= 0, name  # materializes every plan once


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
