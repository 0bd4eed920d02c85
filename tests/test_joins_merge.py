"""Semantics pins for the composed operators Spark lacks natively:
as-of join (operators.joins.asof_join) and conditional-upsert MERGE
(sources.upsert.merge_frames). Tiny literal frames, exact expectations
(SURVEY.md §5.2 unit-test tier)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_asof_join_picks_latest_at_or_before(spark):
    from spendinganalysisetl_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T10:00:00")),  # after r1, before r2
            (2, 10, _ts("2024-01-01T12:00:00")),  # exactly at r2 -> ties match
            (3, 10, _ts("2024-01-01T08:00:00")),  # before everything -> null
            (4, 20, _ts("2024-01-01T10:00:00")),  # other key, no right rows
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T09:00:00"), 1.0),
            (10, _ts("2024-01-01T12:00:00"), 2.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(left, right, "user_id", "ts", "ts", ["value"]).collect()
    }
    assert out == {1: 1.0, 2: 2.0, 3: None, 4: None}


def test_merge_frames_three_legs(spark):
    from spendinganalysisetl_spark.sources.upsert import merge_frames

    target = spark.createDataFrame(
        [
            ("2024-01-01", "2024-01-31", 10, 100.0),  # batch has more -> updated
            ("2024-02-01", "2024-02-29", 20, 200.0),  # batch equal -> kept
        ],
        "begin_date string, end_date string, total_transactions long, total_spent double",
    )
    batch = spark.createDataFrame(
        [
            ("2024-01-01", "2024-01-31", 15, 150.0),
            ("2024-02-01", "2024-02-29", 20, 999.0),  # equal count: target row kept
            ("2024-03-01", "2024-03-31", 5, 50.0),   # new key -> inserted
        ],
        "begin_date string, end_date string, total_transactions long, total_spent double",
    )
    rows = {
        r["begin_date"]: (r["action"], r["total_transactions"], r["total_spent"])
        for r in merge_frames(target, batch).collect()
    }
    assert rows == {
        "2024-01-01": ("updated", 15, 150.0),
        "2024-02-01": ("kept", 20, 200.0),
        "2024-03-01": ("inserted", 5, 50.0),
    }


def test_merge_frames_idempotent(spark):
    """Re-merging the merged state as the batch is a no-op (the
    reference's exactly-once-ish story, SURVEY.md ST2)."""
    from spendinganalysisetl_spark.sources.upsert import merge_frames

    schema = "begin_date string, end_date string, total_transactions long, total_spent double"
    target = spark.createDataFrame([("a", "b", 10, 1.0)], schema)
    batch = spark.createDataFrame([("a", "b", 12, 2.0)], schema)
    once = merge_frames(target, batch).drop("action")
    twice = merge_frames(once, batch).drop("action")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_merge_frames_null_key_rows(spark):
    """NULL range keys: eqNullSafe matches NULL==NULL, and the leg
    classification must use side-presence, not key-nullness — a matched
    null-key row where the batch LOSES the comparison stays 'kept' with
    the target's values."""
    from spendinganalysisetl_spark.sources.upsert import merge_frames

    schema = "begin_date string, end_date string, total_transactions long, total_spent double"
    target = spark.createDataFrame([(None, None, 10, 100.0), ("2024-01-01", "2024-01-31", 5, 50.0)], schema)
    batch = spark.createDataFrame([(None, None, 3, 30.0), ("2024-01-01", "2024-01-31", 9, 90.0)], schema)
    rows = {
        (r["begin_date"], r["end_date"]): (r["total_transactions"], r["action"])
        for r in merge_frames(target, batch).collect()
    }
    assert rows[(None, None)] == (10, "kept")
    assert rows[("2024-01-01", "2024-01-31")] == (9, "updated")


def test_pit_join_picks_exactly_one_version(spark):
    """Each fact matches the ONE dimension version effective at its
    timestamp; facts predating the key's first version drop (inner)."""
    from spendinganalysisetl_spark.operators.joins import pit_join

    dim = spark.createDataFrame(
        [
            (1, "v1", "2020-01-01", "2022-01-01", 0),
            (1, "v2", "2022-01-01", None, 1),
            (2, "w1", "2021-01-01", None, 1),
        ],
        "cust_id long, tag string, effective_from string, effective_to string, is_current int",
    )
    fact = spark.createDataFrame(
        [
            (100, 1, "2020-06-15"),  # inside v1
            (101, 1, "2022-01-01"),  # boundary: from-inclusive → v2
            (102, 1, "2021-12-31"),  # last day of v1
            (103, 2, "2025-05-05"),  # open version
            (104, 2, "2019-01-01"),  # predates w1 → dropped
            (105, 3, "2021-01-01"),  # unknown key → dropped
        ],
        "fid long, cust long, odate string",
    )
    out = {
        r["fid"]: r["tag"]
        for r in pit_join(fact, dim, "cust", "cust_id", "odate").collect()
    }
    assert out == {100: "v1", 101: "v2", 102: "v1", 103: "w1"}


def test_pit_join_cardinality_vs_plain_join(spark):
    """The failure mode pit_join exists to avoid: a plain key join
    multiplies facts by versions-per-key; the PIT residual restores
    1:1 for every in-range fact."""
    from spendinganalysisetl_spark.operators.joins import pit_join

    dim = spark.createDataFrame(
        [(1, "a", "2020-01-01", "2021-01-01", 0), (1, "b", "2021-01-01", None, 1)],
        "cust_id long, tag string, effective_from string, effective_to string, is_current int",
    )
    fact = spark.createDataFrame(
        [(i, 1, f"2020-0{1 + i % 9}-15") for i in range(9)],
        "fid long, cust long, odate string",
    )
    plain = fact.join(dim, fact["cust"] == dim["cust_id"]).count()
    pit = pit_join(fact, dim, "cust", "cust_id", "odate").count()
    assert plain == 18 and pit == 9
