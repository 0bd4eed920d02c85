"""Scalar expression builders (SURVEY.md §2.8).

The reference's scalar surface is tiny — float casts, ``round(x, 2)``,
'%Y-%m-%d' date parsing, JSON serialize (transformer.py:159,186,196,
221-226 in /root/reference/) — and all of it maps to built-in Catalyst
expressions. These helpers exist so every operator spells the shared
semantics (rounding mode, pct-change edge cases) one way.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def revenue() -> Column:
    """Canonical "amount" for the star schema: extended price net of
    discount (FIXTURES.md §B role mapping)."""
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def round2(c: Column) -> Column:
    """round-half-up at 2 decimals. The reference uses Python round()
    (banker's) — divergence only at exact .xx5 doubles (SURVEY.md F4);
    HALF_UP matches DuckDB's ROUND so the oracle agrees.

    Only safe on values that don't systematically land on the .xx5
    boundary (continuous measures, 2-decimal inputs). For sums of
    4-decimal money values use ``money_sum`` — see its docstring.
    """
    return F.round(c, 2)


def decimicents(c: Column) -> Column:
    """Exact integer 1/10000-dollar units for a 4-decimal money value.

    ``l_extendedprice * (1 - l_discount)`` is a product of 2-decimal
    values, i.e. exactly 4 decimal digits — representable exactly as an
    integer after scaling. floor(x*10000 + 0.5) snaps away the double
    representation error; both Spark and DuckDB compute the identical
    IEEE ops, so the integer is engine-independent.
    """
    return F.floor(c * F.lit(10000.0) + F.lit(0.5)).cast("long")


def money_sum(c: Column) -> Column:
    """Order-independent exact money sum, half-up to cents, in dollars.

    Rationale (found empirically, category_totals_ref_roundsum at
    sf0.01): 4-decimal money values make ``round(sum(x), 2)`` land on
    the exact .xx50 half boundary for ~1% of groups, where (a) Spark
    rounds the shortest decimal repr half-up while DuckDB rounds the raw
    binary double, and (b) double-sum ordering noise flips the direction
    per engine. Summing exact bigint decimicents is associative and
    engine-independent; the half-up happens in integer space.

    Sign-aware: ``floor((s+50)/100)`` alone rounds halves toward +inf,
    which for a NEGATIVE total (refund-heavy group) disagrees with
    HALF_UP (away from zero); applying the fold to ``abs(s)`` and
    restoring the sign gives true half-away-from-zero on both signs.

    SQL twin: ``registry.money_sum_sql`` (same formula, same fix).
    """
    return money_fold(F.sum(decimicents(c)))


def money_fold(s: Column) -> Column:
    """Decimicent total → dollars, half away from zero (the second half
    of ``money_sum``, exposed so pre-aggregated decimicent partials —
    e.g. a (vendor, category) rollup — can re-fold exactly: integer
    sums are associative, so fold(sum of partials) == money_sum)."""
    cents = (
        F.signum(s) * F.floor((F.abs(s) + F.lit(50)) / F.lit(100.0))
    ).cast("long")
    return cents / F.lit(100.0)


def pct_change_safe(cur: Column, prev: Column) -> Column:
    """(cur - prev) / prev with SQL semantics: prev NULL or 0 -> NULL.

    Spark's double division already yields NULL on x/0, matching ANSI
    oracles; this spelling makes the prev=0 case explicit.
    """
    return F.when(
        prev.isNull() | (prev == F.lit(0.0)), F.lit(None).cast("double")
    ).otherwise((cur - prev) / prev)


def pct_change_ref(cur: Column, prev: Column) -> Column:
    """Reference-parity pct_change (SURVEY.md W1, transformer.py:221-222).

    pandas ``pct_change().fillna(0)`` semantics, verified empirically on
    the reference algorithm:
      - first row (prev NULL):      NaN  -> 0.0   (filled)
      - prev=0, cur=0:              NaN  -> 0.0   (filled)
      - prev=0, cur>0:              +inf -> +inf  (fillna only fills NaN)
      - prev=0, cur<0:              -inf -> -inf
      - otherwise:                  (cur-prev)/prev

    Spark x/0 is NULL, not inf, so the inf cells are emitted explicitly.
    """
    return (
        F.when(prev.isNull(), F.lit(0.0))
        .when((prev == 0.0) & (cur == 0.0), F.lit(0.0))
        .when((prev == 0.0) & (cur > 0.0), F.lit(float("inf")))
        .when((prev == 0.0) & (cur < 0.0), F.lit(float("-inf")))
        .otherwise((cur - prev) / prev)
    )
