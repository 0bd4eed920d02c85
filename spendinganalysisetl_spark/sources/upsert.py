"""Report sink + conditional upsert (SURVEY.md S5-S7).

Reference behavior (/root/reference/transformer.py:30-132): probe the
sink by (begin_date, end_date); if the key exists AND the new report's
``total_transactions`` is greater, UPDATE details+fi_summary; if it
exists but isn't greater, no-op; if missing, INSERT. That 47-line
read-probe-then-write (non-atomic, one row at a time) is one MERGE
statement semantically:

    MERGE INTO sink t USING batch s
      ON t.begin_date = s.begin_date AND t.end_date = s.end_date
      WHEN MATCHED AND s.total_transactions > t.total_transactions
        THEN UPDATE SET details..., fi_summary...
      WHEN NOT MATCHED THEN INSERT *

Without a transactional table format on the classpath (no Delta in this
environment — SURVEY.md §7 Phase 3), the same semantics are emulated
over plain parquet as one distributed plan:

    kept     = target ⟕(anti on key-AND-wins) batch   -- rows not replaced
    replaced = batch ⋉ (target where batch wins)       -- update leg
    inserts  = batch ▷ target                          -- insert leg
    new sink = kept ∪ replaced ∪ inserts  → atomic dir swap

Scale notes: both legs are equi-joins on the range key — at 100 TB the
target would be a partitioned table and the join prunes to touched
partitions; the batch side is typically small → broadcast. The write is
staged to a temp dir then renamed, the classic filesystem-atomic commit
(readers see old or new, never half).

Reference bug faithfully NOT ported: ``id=str(uuid.uuid4())`` as a
Python default arg (transformer.py:100) evaluates once per process, so
every insert in a run shares one PK. Here ids are per-row
``F.expr('uuid()')`` (SURVEY.md S5).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KEY = ("begin_date", "end_date")


def write_reports(df: DataFrame, path: str, mode: str = "append") -> None:
    """S5: append report rows; per-row uuid id + created_at stamp
    (README.md:44-51 DDL shape: id, begin_date, end_date, details,
    fi_summary, created_at)."""
    (
        df.withColumn("id", F.expr("uuid()"))
        .withColumn("created_at", F.current_date())
        .write.mode(mode)
        .parquet(path)
    )


def read_reports(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def merge_frames(
    target: DataFrame,
    batch: DataFrame,
    key: tuple[str, ...] = KEY,
    compare_col: str = "total_transactions",
) -> DataFrame:
    """S6+S7 as a pure relational plan (no files): the three MERGE legs
    over two frames with identical schemas, returning the merged rows
    plus an ``action`` column ('kept' | 'updated' | 'inserted').

    - updated:  batch row whose key exists and whose compare_col GREW
      (the reference's late-data rule, transformer.py:53-69)
    - inserted: batch row with no existing key
    - kept:     target row not replaced (missing from batch, or the
      comparison did not fire — the reference's no-op leg, :64-65)

    The join is an equi-join on the range key; at scale the batch side
    is small → broadcast, and a partitioned target prunes to touched
    partitions. ``merge_reports`` is the file-backed wrapper adding
    id/created_at and the atomic directory swap.

    All three legs come out of ONE full-outer join: a per-leg formulation
    (inner + anti + anti) re-executes both inputs once per leg — for
    aggregated inputs that's 4-5 redundant scans of the fact table
    (measured 0.97 s vs 0.37 s for this single-join plan at sf0.1, byte-
    identical output).
    """
    cols = batch.columns
    on = [F.col(f"s.{k}").eqNullSafe(F.col(f"t.{k}")) for k in key]
    # Side-presence tags, NOT key-nullness: with eqNullSafe a NULL key
    # can legitimately match a NULL key, and testing t.key IS NULL would
    # misread that matched row as "target missing".
    s_tagged = batch.withColumn("_s_present", F.lit(1)).alias("s")
    t_tagged = target.withColumn("_t_present", F.lit(1)).alias("t")
    t_missing = F.col("t._t_present").isNull()
    batch_wins = F.col(f"s.{compare_col}") > F.col(f"t.{compare_col}")
    take_batch = t_missing | batch_wins
    action = (
        F.when(t_missing, F.lit("inserted"))
        .when(batch_wins, F.lit("updated"))
        .otherwise(F.lit("kept"))
    )
    sel = [
        F.when(F.col("s._s_present").isNotNull(), F.col(f"s.{c}"))
        .otherwise(F.col(f"t.{c}"))
        .alias(c)
        if c in key
        else F.when(take_batch, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in cols
    ]
    return s_tagged.join(t_tagged, on, "full_outer").select(*sel, action.alias("action"))


def merge_reports(
    spark: SparkSession,
    sink_path: str,
    batch: DataFrame,
    compare_col: str = "total_transactions",
) -> None:
    """S6+S7: conditional upsert of ``batch`` into the parquet sink.

    Update wins only when batch[compare_col] > target[compare_col]
    (the reference's late-data rule, transformer.py:53-69). Keyed on
    (begin_date, end_date). Idempotent: re-merging the same batch is a
    no-op (equal counts lose the comparison).
    """
    if not os.path.exists(sink_path):
        write_reports(batch, sink_path, mode="overwrite")
        return

    target = read_reports(spark, sink_path)
    on = [F.col(f"s.{k}").eqNullSafe(F.col(f"t.{k}")) for k in KEY]

    # One full-outer join carries all three MERGE legs (same shape as
    # merge_frames): UPDATE keeps the target's id (stable PK across
    # updates) and refreshes created_at; INSERT mints a per-row uuid
    # (fixing the reference's process-constant uuid, SURVEY S5); the
    # no-op leg passes target rows through untouched. Presence tags,
    # not key-nullness — see merge_frames.
    s_tagged = batch.withColumn("_s_present", F.lit(1)).alias("s")
    t_tagged = target.withColumn("_t_present", F.lit(1)).alias("t")
    t_missing = F.col("t._t_present").isNull()
    batch_wins = F.col(f"s.{compare_col}") > F.col(f"t.{compare_col}")
    take_batch = t_missing | batch_wins
    cols = [f.name for f in target.schema.fields]
    sel = []
    for c in cols:
        if c in KEY:
            sel.append(
                F.when(F.col("s._s_present").isNotNull(), F.col(f"s.{c}"))
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
            )
        elif c == "id":
            sel.append(
                F.when(t_missing, F.expr("uuid()")).otherwise(F.col("t.id")).alias("id")
            )
        elif c == "created_at":
            sel.append(
                F.when(take_batch, F.current_date())
                .otherwise(F.col("t.created_at"))
                .alias("created_at")
            )
        else:
            sel.append(
                F.when(take_batch, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            )
    merged = s_tagged.join(t_tagged, on, "full_outer").select(*sel)

    # Filesystem-atomic commit: write staged, swap directories.
    staged = f"{sink_path}.__staged__{uuid.uuid4().hex}"
    merged.write.mode("overwrite").parquet(staged)
    backup = f"{sink_path}.__old__{uuid.uuid4().hex}"
    os.rename(sink_path, backup)
    os.rename(staged, sink_path)
    shutil.rmtree(backup)
