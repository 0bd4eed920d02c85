"""Experiment analysis: deterministic variant assignment + Welch t
readout over event values — the A/B-test report an analytics engine
serves from the same event stream it sessionizes.

Assignment is a pure projection over the portable md5 fold of the unit
id (same device as the train/val/test splits): deterministic across
runs, engines, and appends — never ``rand()``, whose assignment would
reshuffle units between reads.

Exactness device (the PCA/money discipline): values fold to integer
decimicents scan-side; per-group Σv and Σv² accumulate as
DECIMAL(38,0) (DuckDB: HUGEINT) — order-independent exact integer
sums — and only the FINAL mean/variance/t expressions drop to float,
computed by the identical IEEE expression on both engines. Means are
emitted as exact integer decimicents (floor division); the t statistic
is the one rounded float (±0.0-canonicalized, the bigram-pmi rule).

Scale shape: ONE scan, one partial/final aggregation — the variant
split is conditional sums inside the same aggregate, not a second
pass; output is |event_type| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spendinganalysisetl_spark.functions.text import hex_fold


def ab_assign(unit: F.Column, variants: int = 2) -> F.Column:
    """Deterministic variant id for a unit: md5-fold % variants."""
    return (hex_fold(F.md5(unit.cast("string")), 1, 7) % variants).cast("int")


def ab_welch_report(
    events: DataFrame,
    unit_col: str = "user_id",
    metric_col: str = "value",
    group_col: str = "event_type",
) -> DataFrame:
    """Per-``group_col`` A/B readout: sizes, mean metric per variant
    (exact integer decimicents), and the Welch t statistic of
    variant 0 − variant 1. Groups with a variant of size < 2 are
    dropped (variance undefined)."""
    base = events.select(
        F.col(group_col).alias("grp"),
        ab_assign(F.col(unit_col)).alias("v"),
        F.expr(
            f"CAST(floor({metric_col} * 10000 + 0.5) AS BIGINT)"
        ).alias("dc"),
    )
    agg = base.groupBy("grp").agg(
        F.sum(F.when(F.col("v") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("v") == 1, 1).otherwise(0)).alias("n_b"),
        # Σv stays LONG (decimicent sums fit int64 into the trillions of
        # dollars; the floor-division mean needs integral `div`); only
        # Σv² — which overflows int64 already at sf0.1 — and the s²
        # term promote to DECIMAL(38,0)/HUGEINT.
        F.sum(F.when(F.col("v") == 0, F.col("dc")).otherwise(0)).alias("s_a"),
        F.sum(F.when(F.col("v") == 1, F.col("dc")).otherwise(0)).alias("s_b"),
        # The per-element square must ALSO run in decimal — BIGINT*BIGINT
        # overflows int64 for a single event value above ~3.0e5
        # (ANSI-aborting the whole report), while the DuckDB twin
        # multiplies in HUGEINT (CAST(dc AS HUGEINT) * dc).
        F.sum(
            F.when(
                F.col("v") == 0, F.col("dc").cast("decimal(38,0)") * F.col("dc")
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("q_a"),
        F.sum(
            F.when(
                F.col("v") == 1, F.col("dc").cast("decimal(38,0)") * F.col("dc")
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("q_b"),
    )
    t_expr = (
        "round((CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b) / "
        "sqrt(CAST(n_a * q_a - CAST(s_a AS DECIMAL(38,0)) * CAST(s_a AS DECIMAL(38,0)) AS DOUBLE)"
        " / (CAST(n_a AS DOUBLE) * (n_a - 1) * n_a) + "
        "CAST(n_b * q_b - CAST(s_b AS DECIMAL(38,0)) * CAST(s_b AS DECIMAL(38,0)) AS DOUBLE)"
        " / (CAST(n_b AS DOUBLE) * (n_b - 1) * n_b)), 4) + 0.0"
    )
    # Groups where BOTH arms are constant (pooled variance 0) have an
    # undefined t — and under Spark's default ANSI mode the division
    # would abort the whole report rather than emit inf/NaN. The guard
    # is an exact integer comparison (each variance numerator is ≥ 0),
    # so the DuckDB twin filters the identical rows.
    var_guard = F.expr(
        "(n_a * q_a - CAST(s_a AS DECIMAL(38,0)) * s_a)"
        " + (n_b * q_b - CAST(s_b AS DECIMAL(38,0)) * s_b) > 0"
    )
    return (
        agg.filter((F.col("n_a") > 1) & (F.col("n_b") > 1) & var_guard)
        .select(
            F.col("grp").alias(group_col),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.expr("CAST(s_a div n_a AS BIGINT)").alias("mean_a_decimicents"),
            F.expr("CAST(s_b div n_b AS BIGINT)").alias("mean_b_decimicents"),
            F.expr(t_expr).alias("t_stat"),
        )
        .repartition(1)
        .sortWithinPartitions(group_col)
    )
