"""External-database sink (reference loader parity, SURVEY.md §2.1).

The reference ships results to a warehouse through a DBAPI connection
built from env vars (/root/reference/loader.py:7-15, snowflake
``connect(user=..., account=..., warehouse=...)``) and then writes one
row at a time through cursor round-trips (transformer.py:30-132). The
Spark-first shape of the same component:

- the CONNECTION stays exactly what the reference had — a zero-argument
  factory closing over env config (``factory_from_env`` mirrors
  loader.py's ``get_snowflake_connection``) — but it is opened PER
  PARTITION on the executors, never on the driver, so the write scales
  with the cluster instead of serializing through one socket;
- rows move in ``executemany`` batches (thousands per round-trip), not
  per-row INSERTs — the N+1 cursor pattern the reference had at the
  sink is the same one it had at the source;
- DDL is derived from the DataFrame schema once, driver-side, before
  the distributed write starts.

Vendor specifics stay inside the factory: any DBAPI-2.0 connection
works (snowflake.connector, psycopg2, duckdb, sqlite3). The tests use a
DuckDB file database — embedded single-writer engines set
``single_writer=True`` (one partition writes); warehouse targets take
the default parallel path.

100 TB notes: each partition holds one connection and streams batches,
so executor memory is O(batch), not O(partition); writer parallelism ==
partition count, so ``df.repartition(n)`` IS the sink's concurrency
knob (size n to what the warehouse ingest endpoint sustains); the write
is idempotent only if the caller keys it (see ``upsert_to_db``), which
is why the MERGE leg exists.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame

# DBAPI connection factory: zero-arg callable returning a connection.
# Must be picklable (module-level function / functools.partial over
# picklable args) because it executes on the executors.
ConnectionFactory = Callable[[], object]

# Keyed by DataType.simpleString() (SQL-style names: bigint, not long).
_SQL_TYPES = {
    "bigint": "BIGINT",
    "int": "INTEGER",
    "smallint": "SMALLINT",
    "tinyint": "TINYINT",
    "double": "DOUBLE",
    "float": "REAL",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
    "binary": "BLOB",
}


def ddl_for(df: DataFrame, table: str) -> str:
    """CREATE TABLE IF NOT EXISTS derived from the DataFrame schema.
    Decimal keeps its precision/scale; complex types (array/map/struct)
    are rejected — serialize them (to_json) before shipping to a
    relational sink, as the reference does for its details payload
    (transformer.py:159)."""
    cols = []
    for f in df.schema.fields:
        s = f.dataType.simpleString()
        if s.startswith("decimal"):
            sql_t = s.upper()
        elif s in _SQL_TYPES:
            sql_t = _SQL_TYPES[s]
        else:
            raise ValueError(
                f"column {f.name}: no relational mapping for {s}; "
                "serialize complex types (e.g. F.to_json) before write_to_db"
            )
        cols.append(f'"{f.name}" {sql_t}')
    return f'CREATE TABLE IF NOT EXISTS "{table}" ({", ".join(cols)})'


def factory_from_env(
    driver: str = "duckdb", prefix: str = "SPARK_DB_"
) -> ConnectionFactory:
    """Env-configured connection factory — the reference's loader shape
    (loader.py:7-15) generalized over DBAPI drivers. Reads config at
    CALL time on the executor, so secrets travel through the cluster's
    env/secret machinery, not through the pickled closure.

    driver='duckdb'     → duckdb.connect($SPARK_DB_PATH)
    driver='snowflake'  → snowflake.connector.connect(user=$SPARK_DB_USER,
                          password=..., account=..., warehouse=...,
                          database=..., schema=...) — import-gated: this
                          container has no snowflake connector, the
                          branch raises ImportError where the reference
                          environment would connect.
    """
    if driver == "duckdb":
        def _connect():
            import duckdb

            return duckdb.connect(os.environ[prefix + "PATH"])

        return _connect
    if driver == "snowflake":
        def _connect():
            from snowflake.connector import connect  # noqa: F401 (env-gated)

            return connect(
                user=os.environ[prefix + "USER"],
                password=os.environ[prefix + "PASSWORD"],
                account=os.environ[prefix + "ACCOUNT"],
                warehouse=os.environ[prefix + "WAREHOUSE"],
                database=os.environ[prefix + "DATABASE"],
                schema=os.environ[prefix + "SCHEMA"],
            )

        return _connect
    raise ValueError(f"unknown driver {driver!r}")


def _batches(rows: Iterator, size: int) -> Iterable[list[tuple]]:
    batch: list[tuple] = []
    for r in rows:
        batch.append(tuple(r))
        if len(batch) >= size:
            yield batch
            batch = []
    if batch:
        yield batch


def write_to_db(
    df: DataFrame,
    factory: ConnectionFactory,
    table: str,
    batch_size: int = 10_000,
    single_writer: bool = False,
    create: bool = True,
) -> None:
    """Distributed append into a DBAPI target.

    Each partition opens ONE connection and streams ``executemany``
    batches; commit is per-partition, so a retried task re-appends its
    partition — pair with ``upsert_to_db`` (keyed MERGE) when the target
    needs exactly-once. ``single_writer=True`` coalesces to one
    partition for embedded engines (duckdb/sqlite file locks allow one
    writing process)."""
    if create:
        ddl = ddl_for(df, table)
        conn = factory()
        try:
            conn.execute(ddl)
            _commit(conn)
        finally:
            conn.close()

    n_cols = len(df.columns)
    placeholders = ", ".join(["?"] * n_cols)
    insert = f'INSERT INTO "{table}" VALUES ({placeholders})'

    def _write_partition(rows: Iterator) -> None:
        first = next(rows, None)
        if first is None:
            return  # empty partition: never open a connection for nothing
        import itertools

        conn = factory()
        try:
            cur = conn.cursor() if hasattr(conn, "cursor") else conn
            for batch in _batches(itertools.chain([first], rows), batch_size):
                cur.executemany(insert, batch)
            _commit(conn)
        finally:
            conn.close()

    (df.coalesce(1) if single_writer else df).foreachPartition(_write_partition)


def upsert_to_db(
    df: DataFrame,
    factory: ConnectionFactory,
    table: str,
    key: tuple[str, ...],
    compare_col: str | None = None,
    batch_size: int = 10_000,
    single_writer: bool = True,
    delete_where: str | None = None,
) -> None:
    """Reference upsert rule at an external target: stage the batch,
    then one set-based MERGE — UPDATE where the key matches (gated on
    ``compare_col`` growth when given, transformer.py:53-69's late-data
    rule), INSERT where it doesn't. Replaces the reference's per-row
    probe/update/insert cursor loop with two statements total.

    The stage table rides the same distributed append as
    ``write_to_db``; the merge itself is the portable two-statement
    form — a gated ``UPDATE ... FROM`` plus an anti-join ``INSERT ...
    SELECT`` over the static stage, one transaction — which every
    DBAPI target parses (MERGE INTO is absent from older embedded
    engines, e.g. the DuckDB in this container), executes set-wise, and
    which is exactly the two legs of MERGE when the source is
    key-unique (stage rows come from one aggregated batch). The
    reference's row loop is the N+1 anti-pattern SURVEY.md §2.3 flags."""
    stage = f"{table}__stage"
    conn = factory()
    try:
        conn.execute(f'DROP TABLE IF EXISTS "{stage}"')
        conn.execute(ddl_for(df, table))  # target first so the merge always has it
        _commit(conn)
    finally:
        conn.close()
    write_to_db(
        df, factory, stage, batch_size=batch_size, single_writer=single_writer
    )

    on = " AND ".join(f'"{table}"."{k}" = s."{k}"' for k in key)
    data_cols = [c for c in df.columns if c not in key]
    sets = ", ".join(f'"{c}" = s."{c}"' for c in data_cols)
    gate = (
        f' AND s."{compare_col}" > "{table}"."{compare_col}"' if compare_col else ""
    )
    exists_on = " AND ".join(f't."{k}" = s."{k}"' for k in key)
    update = f'UPDATE "{table}" SET {sets} FROM "{stage}" s WHERE {on}{gate}'
    insert = f"""
        INSERT INTO "{table}"
        SELECT s.* FROM "{stage}" s
        WHERE NOT EXISTS (SELECT 1 FROM "{table}" t WHERE {exists_on})
    """
    # WHEN MATCHED AND <cond> THEN DELETE leg (retention purge /
    # right-to-be-forgotten at the external target): same semantics as
    # the parquet sink's delete_where (upsert.py) — a matched key whose
    # predicate fires is removed from the TARGET and its batch row is
    # consumed (it must not re-insert through the anti-join leg). The
    # doomed keys are materialized first so both deletes see the same
    # set; the predicate is a SQL fragment over the target's columns.
    doomed = f"{table}__doomed"
    key_cols = ", ".join(f'"{k}"' for k in key)
    doomed_stmts = (
        [
            f'DROP TABLE IF EXISTS "{doomed}"',
            f'CREATE TABLE "{doomed}" AS '
            f'SELECT {key_cols} FROM "{table}" WHERE ({delete_where}) '
            f'AND EXISTS (SELECT 1 FROM "{stage}" s WHERE {on})',
            f'DELETE FROM "{table}" WHERE EXISTS '
            f'(SELECT 1 FROM "{doomed}" d WHERE '
            + " AND ".join(f'd."{k}" = "{table}"."{k}"' for k in key)
            + ")",
            f'DELETE FROM "{stage}" WHERE EXISTS '
            f'(SELECT 1 FROM "{doomed}" d WHERE '
            + " AND ".join(f'd."{k}" = "{stage}"."{k}"' for k in key)
            + ")",
            f'DROP TABLE "{doomed}"',
        ]
        if delete_where
        else []
    )
    conn = factory()
    try:
        _begin(conn)
        for stmt in doomed_stmts:
            conn.execute(stmt)
        conn.execute(update)
        conn.execute(insert)
        conn.execute(f'DROP TABLE "{stage}"')
        _commit(conn)
    finally:
        conn.close()


def _begin(conn) -> None:
    """Open an explicit transaction where the driver supports it, so the
    update+insert merge pair commits atomically (autocommit drivers that
    reject BEGIN just run the pair back-to-back over a static stage)."""
    try:
        conn.execute("BEGIN TRANSACTION")
    except Exception:
        pass


def _commit(conn) -> None:
    """DBAPI commit if the driver exposes it (duckdb autocommits;
    snowflake/psycopg2 need the call)."""
    if hasattr(conn, "commit"):
        try:
            conn.commit()
        except Exception:
            pass
