"""Z-order (Morton-interleaved) clustered layout: multi-dimensional
data skipping (SURVEY.md §4 storage-layer pushdown, the Delta
`OPTIMIZE ZORDER BY` / lakehouse clustering technique).

``sources.sorted_layout`` clusters on ONE column — a range predicate on
that column skips almost everything, but a predicate on any other
column skips nothing. Z-ordering interleaves the BITS of two (or more)
rank-normalized keys into a single sort value, so sorting by it keeps
rows that are close in ANY clustered dimension close on disk: every
row group then covers a narrow min/max band in EVERY clustered column
simultaneously, and a selective predicate on either column alone skips
most row groups.

Shape: per column, ``percent_rank()`` over a GLOBAL ordering would be a
single-partition sort at 100 TB — instead each key is rank-normalized
with ``ntile``-style bucketing via its percentile position computed
per-column with ``percent_rank`` over a RANGE-REPARTITIONED window...
which Spark cannot express without a global ordering either. The
scale-honest construction used here is fixed-point QUANTIZATION: map
each column into ``2**bits`` cells with min/max from a one-row
aggregate (two cheap scans: one stats pass, one write pass — the same
two-pass discipline as ``pack_sequences``), then interleave the cell
indices bit by bit. Equal-width cells are skew-sensitive where
equal-frequency ranks are not; for the monotone-ish uniform keys this
layout targets (dates, ids, prices) equal-width is the standard
trade-off (Delta's implementation makes it too).

The interleave itself is a closed-form integer expression
(shift/mask/or), fully codegen'd — no UDF.

``tests/test_zorder.py`` asserts the payoff with pyarrow footers: on a
two-column Z-ordered layout, selective predicates on EACH of the two
columns alone skip a large fraction of row groups, while the 1-D
sorted layout only skips for its own sort column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _morton2(a: F.Column, b: F.Column, bits: int) -> F.Column:
    """Interleave the low ``bits`` of two non-negative ints: result bit
    2i holds a's bit i, bit 2i+1 holds b's bit i. A flat OR chain of
    shift/mask terms — Catalyst codegens it as straight-line long
    arithmetic."""
    one = F.lit(1).cast("long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        # bitwiseOR/AND, not Python |/& — those build BOOLEAN operators
        # on Columns and fail analysis on integral types.
        out = out.bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(a.cast("long"), i).bitwiseAND(one), 2 * i)
        ).bitwiseOR(
            F.shiftleft(
                F.shiftrightunsigned(b.cast("long"), i).bitwiseAND(one), 2 * i + 1
            )
        )
    return out


def zorder_value(
    df: DataFrame, col_a: str, col_b: str, bits: int = 12
) -> DataFrame:
    """Append ``_zorder``: the Morton interleave of both columns
    quantized into ``2**bits`` equal-width cells. The min/max stats come
    from one driver-side one-row aggregate (bounded collect — the same
    stats pass ANALYZE does)."""
    stats = df.agg(
        F.min(col_a).alias("a_lo"),
        F.max(col_a).alias("a_hi"),
        F.min(col_b).alias("b_lo"),
        F.max(col_b).alias("b_hi"),
    ).collect()[0]
    if stats["a_lo"] is None or stats["b_lo"] is None:
        # Empty input (or a clustered column that is entirely NULL):
        # there is nothing to order by — emit a constant key instead of
        # crashing in float(None) below; the write then produces a
        # valid (possibly empty) layout.
        return df.withColumn("_zorder", F.lit(0).cast("long"))
    cells = (1 << bits) - 1

    def cell(c: str, lo, hi) -> F.Column:
        span = float(hi) - float(lo) or 1.0
        pos = (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(span)
        return F.least(F.lit(cells), F.floor(pos * F.lit(cells + 1)).cast("long"))

    return df.withColumn(
        "_zorder",
        _morton2(
            cell(col_a, stats["a_lo"], stats["a_hi"]),
            cell(col_b, stats["b_lo"], stats["b_hi"]),
            bits,
        ),
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = 12,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` Z-order-clustered on (``col_a``, ``col_b``):
    range-repartition + sort on the Morton value (balanced skew-free
    files via sampled ranges, tight row-group bands inside each), drop
    the helper column at the boundary."""
    (
        zorder_value(df, col_a, col_b, bits)
        .repartitionByRange(n_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode(mode)
        .parquet(path)
    )


# Reading a Z-ordered layout is a plain parquet scan — same entry as
# the 1-D clustered layout (one definition, no drift point).
from spendinganalysisetl_spark.sources.sorted_layout import (  # noqa: E402
    read_layout,  # noqa: F401
)
