"""S5-S7 conditional upsert over parquet (SURVEY.md §2.1): insert leg,
conditional-update leg, no-op leg, idempotence, and the per-row uuid fix
for the reference's process-constant-uuid bug (S5)."""

from __future__ import annotations

import pytest

from spendinganalysisetl_spark.sources.upsert import merge_reports, read_reports, write_reports

SCHEMA = "begin_date string, end_date string, total_transactions long, total_spent double"


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def sink(tmp_path):
    return str(tmp_path / "file_details")


def test_initial_write_and_per_row_uuid(spark, sink):
    write_reports(
        _batch(spark, [("2024-01-01", "2024-01-31", 10, 100.0),
                       ("2024-02-01", "2024-02-29", 20, 200.0)]),
        sink,
        mode="overwrite",
    )
    out = read_reports(spark, sink).collect()
    assert len(out) == 2
    ids = {r["id"] for r in out}
    assert len(ids) == 2, "uuids must be per-row (reference bug S5: one uuid per process)"


def test_merge_update_insert_noop(spark, sink):
    write_reports(
        _batch(spark, [("2024-01-01", "2024-01-31", 10, 100.0)]), sink, mode="overwrite"
    )
    old_id = read_reports(spark, sink).collect()[0]["id"]

    # one winner (greater count), one loser (equal), one new key
    merge_reports(
        spark,
        sink,
        _batch(
            spark,
            [
                ("2024-01-01", "2024-01-31", 15, 150.0),  # update: 15 > 10
                ("2024-02-01", "2024-02-29", 5, 50.0),    # insert: new key
            ],
        ),
    )
    rows = {(r["begin_date"], r["end_date"]): r for r in read_reports(spark, sink).collect()}
    assert len(rows) == 2
    jan = rows[("2024-01-01", "2024-01-31")]
    assert jan["total_transactions"] == 15, "greater count must update (transformer.py:60)"
    assert jan["id"] == old_id, "update keeps the stable PK"

    # equal count → no-op (transformer.py:64-65)
    merge_reports(
        spark, sink, _batch(spark, [("2024-01-01", "2024-01-31", 15, 999.0)])
    )
    jan2 = {
        (r["begin_date"], r["end_date"]): r for r in read_reports(spark, sink).collect()
    }[("2024-01-01", "2024-01-31")]
    assert jan2["total_spent"] == 150.0, "equal count must not update"


def test_merge_idempotent(spark, sink):
    batch = _batch(spark, [("2024-01-01", "2024-01-31", 10, 100.0)])
    write_reports(batch, sink, mode="overwrite")
    for _ in range(2):
        merge_reports(spark, sink, batch)
        assert read_reports(spark, sink).count() == 1


def test_versioned_commit_always_resolvable(spark, sink):
    """The pointer-flip commit: after every merge the sink has a
    _CURRENT pointer naming an existing version dir, the previous
    version is retained one generation (in-flight readers), and older
    generations are GC'd."""
    import os

    write_reports(
        _batch(spark, [("2024-01-01", "2024-01-31", 10, 100.0)]), sink, mode="overwrite"
    )
    seen_versions = []
    for n in (15, 20, 25):
        merge_reports(
            spark, sink, _batch(spark, [("2024-01-01", "2024-01-31", n, float(n))])
        )
        with open(os.path.join(sink, "_CURRENT")) as fh:
            current = fh.read().strip()
        assert os.path.isdir(os.path.join(sink, current))
        seen_versions.append(current)
        live = sorted(d for d in os.listdir(sink) if d.startswith("v_"))
        assert current in live and len(live) <= 2
    assert read_reports(spark, sink).collect()[0]["total_transactions"] == 25
