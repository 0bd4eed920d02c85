"""Distributed HTTP extract source (reference extractor parity,
SURVEY.md §2.1 S1/S2 + §2.2 P4).

The reference fetches one summary per upload id through a driver-side
loop of blocking GETs (/root/reference/extractor.py:22-32 — the same
N+1 access pattern it has at the database). The Spark-first shape of
the same component:

- the ID LIST is a DataFrame and the per-id fetch is fanned out across
  executors with ``mapInPandas`` — N ids fetch with the cluster's
  parallelism, not serially through one socket;
- per-call retry with exponential backoff runs INSIDE the task (a
  transient 5xx/timeout retries the one id, not the whole job — and a
  task failure re-runs only its partition of ids);
- the reference's failure rule is P4 made explicit: a fetch that
  exhausts retries yields NO row (extractor.py returns ``{}`` and the
  transformer drops it); the source is therefore at-most-once per id —
  callers needing completeness anti-join the output ids against the
  input and re-feed the difference;
- the fetcher is an injected zero-state callable (same factory
  discipline as ``dbsink.ConnectionFactory``) so the engine never
  hard-codes an endpoint and tests run against a local server or a
  plain fake.

100 TB notes: the unit of work is an ID, so ``partitions`` is the
concurrency knob exactly like the DB sink's — size it to what the
upstream API sustains, not to the cluster width; per-partition the
fetch is sequential, which is the polite client shape (a per-id thread
pool inside tasks multiplies cluster-wide concurrency by cores and
DDoSes the source).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

# Fetch one record by id: returns the record dict, or None for a
# definitive "no data" (non-retryable miss). Exceptions are retryable.
Fetcher = Callable[[int], dict | None]


def http_json_fetcher(url_template: str, timeout_s: float = 10.0) -> Fetcher:
    """requests-backed fetcher: GET ``url_template.format(id=...)``,
    raise on HTTP errors (→ retried by ``fetch_records``), parse JSON.
    Import-gated the same way as the snowflake branch in ``dbsink`` —
    built lazily on the EXECUTOR, so config travels as a string, not a
    pickled session."""

    def _fetch(record_id: int) -> dict | None:
        import requests

        r = requests.get(url_template.format(id=record_id), timeout=timeout_s)
        # Every 4xx except 429 is a DEFINITIVE client-side verdict
        # (404 missing, 400/401/403/410 rejected) — retrying burns
        # executor task-slot time on a doomed id. Only timeouts,
        # connection errors, 429 rate-limits, and 5xx are transient.
        if 400 <= r.status_code < 500 and r.status_code != 429:
            return None
        r.raise_for_status()
        return r.json()

    return _fetch


def fetch_records(
    ids: DataFrame,
    fetch_one: Fetcher,
    schema: str,
    id_col: str = "id",
    partitions: int | None = None,
    max_retries: int = 3,
    backoff_s: float = 0.2,
) -> DataFrame:
    """Fan the per-id fetch out across the cluster: one output row per
    id the fetcher answered, typed by ``schema`` (which must include
    ``id_col`` — the fetched payload is keyed back to its id). Ids that
    miss (fetcher returns None) or exhaust ``max_retries`` are DROPPED,
    the reference's P4 rule; exceptions back off exponentially before
    retrying."""
    import pandas as pd  # noqa: F401 (executor-side)

    spark_schema = schema

    def _fetch_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for record_id in pdf[id_col]:
                rec = None
                for attempt in range(max_retries):
                    try:
                        rec = fetch_one(int(record_id))
                        break
                    except Exception:
                        if attempt + 1 < max_retries:
                            time.sleep(backoff_s * (2**attempt))
                if rec is not None:
                    rows.append({**rec, id_col: int(record_id)})
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in _fields}
            )

    from pyspark.sql.types import StructType

    _fields = (
        StructType.fromDDL(spark_schema).fields
        if isinstance(spark_schema, str)
        else spark_schema.fields
    )
    spread = ids.repartition(
        partitions or ids.sparkSession.sparkContext.defaultParallelism
    )
    return spread.mapInPandas(_fetch_batches, spark_schema)


def list_ids(spark: SparkSession, id_values: list[int]) -> DataFrame:
    """The list endpoint's result as a DataFrame (the reference's
    ``get_uploaded_files`` boundary): callers fetch the id list however
    their API exposes it — one cheap driver-side GET is fine for a list
    endpoint — and hand the DISTRIBUTION problem (the N+1 fan-out) to
    ``fetch_records``."""
    from spendinganalysisetl_spark.catalog import local_table

    return local_table(spark, [(int(i),) for i in id_values], "id long")


# --- Spark 4 Python DataSource form ------------------------------------------
# The same component as ``fetch_records``, packaged as a REAL Spark data
# source (pyspark.sql.datasource, new in Spark 4): after
# ``spark.dataSource.register(HttpSummariesDataSource)`` the extract is
#
#     spark.read.format("http_summaries")
#          .schema("id long, total double")
#          .option("url", "http://.../uploads/{id}/summary/")
#          .option("ids", "0:500")          # or "1,5,7"
#          .option("num_partitions", "8")
#          .load()
#
# which gives the fan-out Catalyst-visible semantics: the id range is
# split into InputPartitions (each a task), the scan composes with
# filters/projections like any source, and callers need no knowledge of
# mapInPandas plumbing. Fetch semantics are identical to fetch_records:
# retry-with-backoff inside the task, non-429 4xx = definitive miss,
# exhausted retries drop the id (P4).


def _parse_ids(spec: str) -> list[int]:
    """Id-list option: 'lo:hi' (half-open range) or comma-separated."""
    spec = spec.strip()
    if ":" in spec:
        lo, hi = spec.split(":", 1)
        return list(range(int(lo), int(hi)))
    return [int(x) for x in spec.split(",") if x.strip()]


try:  # pyspark >= 4.0
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _IdsPartition(InputPartition):
        def __init__(self, ids: list[int]):
            self.ids = ids

    class _HttpSummariesReader(DataSourceReader):
        def __init__(self, schema, options):
            self._schema = schema
            self._url = options["url"]
            self._ids = _parse_ids(options.get("ids", ""))
            self._n_parts = int(options.get("num_partitions", "8"))
            self._max_retries = int(options.get("max_retries", "3"))
            self._backoff_s = float(options.get("backoff_s", "0.2"))
            self._timeout_s = float(options.get("timeout_s", "10"))
            self._id_col = options.get("id_col", "id")

        def partitions(self):
            n = max(1, min(self._n_parts, len(self._ids) or 1))
            chunks = [self._ids[i::n] for i in range(n)]
            # An empty ids option must yield an EMPTY scan, not []:
            # pyspark substitutes [None] for a partitionless reader and
            # read(None) would crash on partition.ids.
            return [_IdsPartition(c) for c in chunks if c] or [
                _IdsPartition([])
            ]

        def read(self, partition):
            # Executor-side: stdlib + requests only (same import-gating
            # as http_json_fetcher); field order must match the schema.
            import time as _time

            import requests

            names = [f.name for f in self._schema.fields]

            def fetch(record_id: int):
                r = requests.get(
                    self._url.format(id=record_id), timeout=self._timeout_s
                )
                if 400 <= r.status_code < 500 and r.status_code != 429:
                    return None
                r.raise_for_status()
                return r.json()

            for record_id in partition.ids:
                rec = None
                for attempt in range(self._max_retries):
                    try:
                        rec = fetch(int(record_id))
                        break
                    except Exception:
                        if attempt + 1 < self._max_retries:
                            _time.sleep(self._backoff_s * (2**attempt))
                if rec is not None:
                    rec = {**rec, self._id_col: int(record_id)}
                    yield tuple(rec.get(n) for n in names)

    class HttpSummariesDataSource(DataSource):
        """``format("http_summaries")`` — the reference's REST extractor
        as a first-class Spark source (see module docstring)."""

        @classmethod
        def name(cls):
            return "http_summaries"

        def reader(self, schema):
            return _HttpSummariesReader(schema, self.options)

except ImportError:  # pragma: no cover - pyspark<4 fallback
    HttpSummariesDataSource = None  # type: ignore[assignment]
