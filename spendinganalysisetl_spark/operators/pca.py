"""Distributed PCA over the ``embeddings`` table: covariance via exact
integer Gramian partials, eigendecomposition on the driver (d×d only),
projection as executor-local GEMM.

The missing piece between the similarity family (brute/IVF/LSH top-k,
SemDeDup cells — operators/similarity.py) and a real training-data
pipeline: whitening / dimensionality reduction before ANN indexing or
clustering. Reference repo has no vector surface at all; this extends
the engine's north-star LLM-pipeline coverage (SURVEY.md §2.11).

Scale design
------------
- The corpus NEVER shuffles and never reaches the driver. One Arrow
  pass (``mapInPandas``) emits per-batch Gramian partials — d(d+1)/2
  upper-triangle products + d column sums + a count, ~2 145 values per
  batch at d=64 — and the partials aggregate to one tiny frame. This is
  the classic tree-aggregation shape: 100 TB of vectors reduce to
  kilobytes before any exchange.
- Exactness device (same philosophy as ``functions.scalars.money_sum``):
  vectors are quantized scan-side to integer-valued float64
  (``floor(x·scale + 0.5)``, scale=1000). Products and sums of
  integer-valued float64 are EXACT while |Σ| < 2^53 (batch GEMM in
  numpy stays integer-valued; Spark's final ``sum`` over batch partials
  likewise), so the aggregated moments are exact integers, the
  covariance numerator ``n·Σxy − Σx·Σy`` is computed in DECIMAL(38,0)
  with no float error, and the single final integer→double cast +
  division sequence is IEEE-deterministic across engines. DuckDB
  reproduces every covariance entry bit-for-bit from the same
  quantized integers (HUGEINT sums) — the oracle reimplements the
  math, it does not echo Spark. Quantization costs ~1e-3 input noise,
  documented and identical on both sides.
- Eigendecomposition runs on the DRIVER over the d×d matrix (d=64 →
  4 096 doubles — constant in corpus size; numpy/LAPACK ``eigh``).
  Deterministic up to eigenvector sign and equal-eigenvalue order, so
  both are pinned: components are sorted by (eigenvalue desc, index)
  and sign-fixed so each component's largest-|coefficient| entry is
  positive. The differential test (tests/test_pca.py) re-derives the
  whole decomposition single-node in numpy and matches projections
  bit-for-bit.
- Projection broadcasts the d×k component matrix (64×8 doubles) into
  an Arrow-batched GEMM — one matrix multiply per batch, corpus stays
  partition-local, output is k numbers per vector.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spendinganalysisetl_spark.catalog import local_table as _local_table
from spendinganalysisetl_spark.partitioning import spread_scaled as _spread

_SCALE = 1000.0


def _tri_index(d: int):
    """(i, j) pairs for the flattened upper triangle, row-major."""
    return [(i, j) for i in range(d) for j in range(i, d)]


def gramian_partials(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    scale: float = _SCALE,
    spread: bool = True,
) -> DataFrame:
    """One row per Arrow batch: exact integer moments of the quantized
    vectors — ``n``, per-dimension sums ``s`` (length d), and the
    flattened upper-triangle Gramian ``g`` (length d(d+1)/2). All
    values are integer-valued doubles (exact: quantized inputs ≤ ~1e4
    in magnitude, per-batch sums ≪ 2^53)."""
    import numpy as np

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            q = np.floor(x * scale + 0.5)
            g = q.T @ q  # integer-valued float64 GEMM — exact
            iu = np.triu_indices(g.shape[0])
            yield pd.DataFrame(
                {
                    "n": [float(q.shape[0])],
                    "s": [q.sum(axis=0).tolist()],
                    "g": [g[iu].tolist()],
                }
            )

    # Size-adaptive fan-out (r11, guide §2.5): one Python/Arrow task
    # round-trip per partition for a d(d+1)/2-value partial — at sub-MB
    # inputs the 32-way fan costs 32 task setups per pass for
    # microseconds of GEMM each. Partition count provably cannot change
    # the result: partials are exact integer-valued float64 (module
    # docstring), so their aggregation is associative.
    base = embeddings.select(vec_col)
    if spread:
        base = _spread(base)
    return base.mapInPandas(
        _partial, "n double, s array<double>, g array<double>"
    )


def _aggregate_moments(
    embeddings: DataFrame,
    vec_col: str,
    scale: float,
    parts: DataFrame | None = None,
    spread: bool = True,
):
    """Shared fork point: the per-batch partials, PERSISTED (they are
    |batches| rows of ~d²/2 doubles — kilobytes per 128 MB of corpus),
    so the three consumers below read the cached tiny frame instead of
    re-running the corpus scan per branch (forked branches re-execute
    from source otherwise). Aggregation is posexplode → groupBy(pos) —
    the exploded frame is |batches|·d²/2 rows, never corpus-sized, and
    Spark's partial aggregation combines map-side.

    ``parts`` lets a multi-query session hand in an ALREADY-persisted
    partials frame (registry ``shared()`` keys one per (session, sf))
    so the covariance / projection / scree trio pays the corpus Arrow
    pass once instead of once per query; ``owns`` in the return tells
    the caller whether unpersisting is its business."""
    from pyspark import StorageLevel

    owns = parts is None
    if parts is None:
        parts = gramian_partials(embeddings, vec_col, scale, spread).persist(
            StorageLevel.MEMORY_AND_DISK
        )
    g_tot = (
        parts.select(F.posexplode("g").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("gsum"))
    )
    s_tot = (
        parts.select(F.posexplode("s").alias("dim", "v"))
        .groupBy("dim")
        .agg(F.sum("v").alias("ssum"))
    )
    n_tot = parts.agg(F.sum("n").alias("n"))
    return parts, g_tot, s_tot, n_tot, owns


def covariance_matrix(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    scale: float = _SCALE,
    parts: DataFrame | None = None,
) -> DataFrame:
    """Population covariance of the quantized embeddings as flat rows
    ``(i, j, cov)`` for i ≤ j, rounded to 6dp. Fully distributed: the
    corpus reduces to per-batch partials; everything after the partial
    aggregation operates on d- and d²-sized frames (broadcast joins).

    cov(i,j) = (n·Σxixj − Σxi·Σxj) / n² / scale², with the numerator
    exact in DECIMAL(38,0) and one deterministic cast-then-divide tail
    (matching the DuckDB oracle's HUGEINT math step for step).

    Cache lifetime: with ``parts=None`` the self-persisted
    gramian-partials frame is released BEFORE returning — the
    aggregated moments are bounded (d + d(d+1)/2 + 1 exact values,
    corpus-independent, the same collect ``_fit_components`` already
    does), so they are collected once and rebuilt as literal frames,
    cutting the returned plan's lineage to the cache. A standalone
    call therefore leaves no persisted frame behind
    (tests/test_pca.py::test_covariance_standalone_no_cache_leak).
    Multi-query sessions still pass a shared ``parts``
    (registry._pca_parts), which this function never unpersists."""
    parts, g_tot, s_tot, n_tot, owns = _aggregate_moments(
        embeddings, vec_col, scale, parts
    )
    d = int(embeddings.select(F.size(vec_col).alias("d")).first()["d"])
    if owns:
        spark = parts.sparkSession
        g_rows = [(r["pos"], r["gsum"]) for r in g_tot.collect()]
        s_rows = [(r["dim"], r["ssum"]) for r in s_tot.collect()]
        n_val = n_tot.first()["n"]
        parts.unpersist()
        g_tot = _local_table(spark, g_rows, "pos int, gsum double")
        s_tot = _local_table(spark, s_rows, "dim int, ssum double")
        n_tot = _local_table(spark, [(n_val,)], "n double")
    pairs = _tri_index(d)
    idx = _local_table(
        parts.sparkSession,
        [(p, i, j) for p, (i, j) in enumerate(pairs)],
        "pos int, i int, j int",
    )
    dec = "decimal(38,0)"
    si = s_tot.select(F.col("dim").alias("i"), F.col("ssum").alias("s_i"))
    sj = s_tot.select(F.col("dim").alias("j"), F.col("ssum").alias("s_j"))
    num = (
        F.col("n").cast(dec) * F.col("gsum").cast(dec)
        - F.col("s_i").cast(dec) * F.col("s_j").cast(dec)
    )
    cov = (
        num.cast("double")
        / F.col("n").cast("double")
        / F.col("n").cast("double")
        / F.lit(scale * scale)
    )
    return (
        g_tot.join(F.broadcast(idx), "pos")
        .join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .crossJoin(F.broadcast(n_tot))
        .select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            (F.round(cov, 6) + F.lit(0.0)).alias("cov"),
        )
        .repartition(1)
        .sortWithinPartitions("i", "j")
    )


def _fit_components(
    embeddings: DataFrame,
    vec_col: str,
    k: int,
    scale: float,
    parts: DataFrame | None = None,
    spread: bool = True,
):
    """Driver-side tail of the fit: collect the EXACT aggregated moments
    (d + d(d+1)/2 + 1 values — bounded, corpus-independent), build the
    covariance matrix, ``eigh`` it, and pin the two eigen ambiguities:
    order = (eigenvalue desc, index asc), sign = largest-|coefficient|
    entry positive (first such index on ties)."""
    import numpy as np

    parts, g_tot, s_tot, n_tot, owns = _aggregate_moments(
        embeddings, vec_col, scale, parts, spread
    )
    d = int(embeddings.select(F.size(vec_col).alias("d")).first()["d"])
    # Bounded collects: d + d(d+1)/2 + 1 exact values, corpus-independent.
    n = n_tot.first()["n"]
    s = np.zeros(d)
    for r in s_tot.collect():
        s[r["dim"]] = r["ssum"]
    g = np.zeros((d, d))
    iu = np.triu_indices(d)
    flat = np.zeros(d * (d + 1) // 2)
    for r in g_tot.collect():
        flat[r["pos"]] = r["gsum"]
    if owns:
        parts.unpersist()
    g[iu] = flat
    g = g + g.T - np.diag(np.diag(g))
    cov = (n * g - np.outer(s, s)) / n / n / (scale * scale)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(-evals, kind="stable")
    evals, evecs = evals[order], evecs[:, order]
    for c in range(evecs.shape[1]):
        j = int(np.argmax(np.abs(evecs[:, c])))
        if evecs[j, c] < 0:
            evecs[:, c] = -evecs[:, c]
    mean = s / n / scale
    return mean, evals, evecs[:, :k]


def pca_project(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    scale: float = _SCALE,
    ordered: bool = True,
    parts: DataFrame | None = None,
    spread: bool = True,
) -> DataFrame:
    """Project every vector onto the top-k principal components of the
    (quantized) corpus covariance. Output is flat rows
    ``(vec_id, pc, score)`` rounded to 6dp — |corpus|·k rows. The d×k
    component matrix is closure-broadcast into an Arrow GEMM; the
    corpus never shuffles. Scoring centers each QUANTIZED vector on the
    corpus mean then dots it with the component (standard PCA scores,
    in original units)."""
    import numpy as np

    mean, _evals, comps = _fit_components(
        embeddings, vec_col, k, scale, parts, spread
    )
    kk = comps.shape[1]

    def _project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            q = np.floor(x * scale + 0.5) / scale
            scores = (q - mean) @ comps
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy().repeat(kk),
                    "pc": np.tile(np.arange(kk), len(pdf)),
                    "score": scores.ravel(),
                }
            )
            yield out

    # Size-adaptive fan-out (r11): per-ROW projection — the emitted
    # (id, pc, score) values are a pure function of the row, so
    # partition count cannot change them, only their order (and every
    # consumer aggregates or sorts).
    proj_base = embeddings.select(id_col, vec_col)
    if spread:
        proj_base = _spread(proj_base)
    projected = proj_base.mapInPandas(
        _project, f"{id_col} long, pc long, score double"
    )
    out = projected.select(
        id_col, "pc", (F.round("score", 6) + F.lit(0.0)).alias("score")
    )
    if not ordered:
        # Production core: |corpus|·k rows stay distributed — the
        # canonical single-partition sort below is an oracle/report
        # concern only (a one-task sink over a corpus-sized output is
        # wrong at scale; presentation-layer boundary, VERDICT r6 #7).
        return out
    return out.repartition(1).sortWithinPartitions(id_col, "pc")


def variance_explained(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    parts: DataFrame | None = None,
) -> DataFrame:
    """Top-k eigenvalues and their share of total variance — the scree
    the analyst reads before choosing k. Total variance = trace of the
    covariance (sum of ALL d eigenvalues); both come out of the same
    exact aggregated moments, so this is one corpus pass plus
    driver-side d×d math."""
    _mean, evals, _comps = _fit_components(embeddings, vec_col, k, _SCALE, parts)
    total = float(evals.sum())
    top = evals[:k]
    rows = [
        (
            int(p),
            round(float(ev), 6) + 0.0,
            round(float(ev / total), 6) + 0.0,
        )
        for p, ev in enumerate(top)
    ]
    return _local_table(
        embeddings.sparkSession,
        rows,
        "pc long, eigenvalue double, var_share double",
    )
