"""Distributed HTTP extract (sources.httpsource): executor-side per-id
fan-out with retry/backoff, P4 drop semantics, and a real localhost
HTTP round-trip through the requests-backed fetcher."""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from spendinganalysisetl_spark.sources.httpsource import (
    fetch_records,
    http_json_fetcher,
    list_ids,
)

SCHEMA = "id long, total long, category string"


def test_fetch_records_fanout_and_p4_drop(spark, tmp_path):
    """Plain fetcher: every answered id becomes one typed row; an id the
    fetcher answers None for (the reference's failed-fetch {}) yields no
    row; a flaky id that raises on the FIRST attempt succeeds through
    the in-task retry (attempt markers on disk survive task pickling)."""
    marker_dir = str(tmp_path / "attempts")
    os.makedirs(marker_dir, exist_ok=True)

    def fake_fetch(record_id: int):
        if record_id == 7:
            return None  # definitive miss -> dropped (P4)
        if record_id == 5:
            marker = os.path.join(marker_dir, "id5_tried")
            if not os.path.exists(marker):
                open(marker, "w").close()
                raise RuntimeError("transient")  # first attempt fails
        return {"total": record_id * 10, "category": f"cat{record_id % 2}"}

    out = {
        r["id"]: (r["total"], r["category"])
        for r in fetch_records(
            list_ids(spark, [1, 2, 5, 7, 9]), fake_fetch, SCHEMA, backoff_s=0.01
        ).collect()
    }
    assert out == {
        1: (10, "cat1"),
        2: (20, "cat0"),
        5: (50, "cat1"),
        9: (90, "cat1"),
    }
    assert os.path.exists(os.path.join(marker_dir, "id5_tried")), "retry exercised"


def test_fetch_records_exhausted_retries_drop(spark):
    def always_fails(record_id: int):
        raise RuntimeError("down")

    got = fetch_records(
        list_ids(spark, [1, 2, 3]), always_fails, SCHEMA,
        max_retries=2, backoff_s=0.01,
    ).collect()
    assert got == []


@pytest.fixture()
def summary_server():
    """Localhost JSON API shaped like the reference's
    /uploads/<id>/summary endpoint: id 7 is a 404, id 5 returns 500 on
    its first hit (exercising retry through real HTTP)."""
    hits: dict[int, int] = {}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (http.server API)
            upload_id = int(self.path.rstrip("/").split("/")[-2])
            hits[upload_id] = hits.get(upload_id, 0) + 1
            if upload_id == 7:
                self.send_response(404)
                self.end_headers()
                return
            if upload_id == 9:
                self.send_response(403)
                self.end_headers()
                return
            if upload_id == 5 and hits[upload_id] == 1:
                self.send_response(500)
                self.end_headers()
                return
            body = json.dumps(
                {"total": upload_id * 100, "category": "net"}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # silence per-request stderr noise
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    srv.hit_counts = hits  # exposed for retry-count assertions
    try:
        yield f"http://127.0.0.1:{srv.server_port}", srv
    finally:
        srv.shutdown()


def test_http_json_fetcher_roundtrip(spark, summary_server):
    """End-to-end through requests against a real local server: 200s
    land as rows, the 404 id drops without retries, the flaky-500 id
    succeeds on the retry."""
    url, srv = summary_server
    fetcher = http_json_fetcher(url + "/uploads/{id}/summary/")
    out = {
        r["id"]: r["total"]
        for r in fetch_records(
            list_ids(spark, [1, 5, 7, 9]), fetcher, SCHEMA, backoff_s=0.01
        ).collect()
    }
    assert out == {1: 100, 5: 500}
    # non-retryable 4xx verdicts must not burn retries in the executor:
    # one hit each for the 404 and the 403, two for the flaky 500.
    assert srv.hit_counts[7] == 1
    assert srv.hit_counts[9] == 1
    assert srv.hit_counts[5] == 2


def test_end_to_end_etl_extract_transform_load(spark, summary_server, tmp_path):
    """The reference's WHOLE pipeline (extractor.py → transformer.py →
    loader.py) as one distributed flow: per-id summaries fetched
    through the executor fan-out, aggregated into the per-category
    report, MERGEd into the warehouse through the
    staged DBAPI sink — every stage cluster-parallel, the driver only
    coordinates. Re-running the whole pipeline is a warehouse no-op
    (the conditional upsert's idempotence, reference transformer
    rule)."""
    import duckdb
    from pyspark.sql import functions as F

    from spendinganalysisetl_spark.sources.dbsink import upsert_to_db

    db = str(tmp_path / "warehouse.duckdb")

    def _factory():
        import duckdb

        return duckdb.connect(db)

    def run_pipeline():
        # EXTRACT: the id list endpoint result -> distributed per-id fetch
        fetched = fetch_records(
            list_ids(spark, [1, 2, 3, 4, 5, 6]),
            http_json_fetcher(summary_server[0] + "/uploads/{id}/summary/"),
            SCHEMA,
            backoff_s=0.01,
        )
        # TRANSFORM: the reference's per-category rollup
        report = fetched.groupBy("category").agg(
            F.count(F.lit(1)).cast("long").alias("n_uploads"),
            F.sum("total").cast("long").alias("grand_total"),
        )
        # LOAD: staged set-based MERGE at the warehouse
        upsert_to_db(
            report, _factory, "category_report",
            key=("category",), compare_col="n_uploads",
        )

    run_pipeline()
    with duckdb.connect(db) as con:
        got = con.execute(
            'SELECT category, n_uploads, grand_total FROM "category_report"'
        ).fetchall()
    # ids 1..6: id 5 needs a retry (first hit 500s) and id 7 isn't asked;
    # all six land under category 'net' with total = 100 * sum(1..6)
    assert got == [("net", 6, 2100)]

    run_pipeline()  # replay: MERGE no-ops, nothing double-counts
    with duckdb.connect(db) as con:
        again = con.execute(
            'SELECT category, n_uploads, grand_total FROM "category_report"'
        ).fetchall()
    assert again == got


def test_python_datasource_form(spark, summary_server):
    """The Spark 4 DataSource packaging: register, read with
    format("http_summaries"), same drop/retry semantics as
    fetch_records, ids split across InputPartitions."""
    from spendinganalysisetl_spark.sources.httpsource import (
        HttpSummariesDataSource,
    )

    url, srv = summary_server
    spark.dataSource.register(HttpSummariesDataSource)
    df = (
        spark.read.format("http_summaries")
        .schema(SCHEMA)
        .option("url", url + "/uploads/{id}/summary/")
        .option("ids", "1,5,7,9")
        .option("num_partitions", "2")
        .option("backoff_s", "0.01")
        .load()
    )
    out = {r["id"]: r["total"] for r in df.collect()}
    assert out == {1: 100, 5: 500}
    # the source plans real partitions — visible in the scan
    assert df.rdd.getNumPartitions() == 2
