"""Distributed k-means (operators/clustering.py): the per-partition
partial-sum Lloyd must reproduce a single-machine numpy Lloyd run from
the same init — same cluster sizes and centroids to float tolerance —
and assignments must be stable on well-separated blobs."""

from __future__ import annotations

import numpy as np
import pytest

from spendinganalysisetl_spark.operators.clustering import (
    _fit_centroids,
    kmeans_assign,
    kmeans_cluster_profile,
)


def _blobs(n_per=40, d=8, k=3, sep=20.0, seed=7):
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, d) * sep
    pts = np.concatenate(
        [centers[i] + rng.randn(n_per, d) for i in range(k)], axis=0
    )
    return pts


def _numpy_lloyd(x, k, iters, seed):
    """The same algorithm, single machine: sample-prefix init (the
    operator's convention with the full set as 'sample'), euclidean
    assign, mean recenter."""
    sample = x[:4096]
    rng = np.random.RandomState(seed)
    cent = sample[rng.choice(len(sample), size=min(k, len(sample)), replace=False)]
    for _ in range(iters):
        scores = x @ cent.T - 0.5 * (cent * cent).sum(axis=1)
        assign = np.argmax(scores, axis=1)
        new = cent.copy()
        for c in range(len(cent)):
            m = x[assign == c]
            if len(m):
                new[c] = m.mean(axis=0)
        cent = new
    return cent


@pytest.fixture(scope="module")
def blob_df(spark):
    pts = _blobs()
    rows = [(int(i), [float(v) for v in p]) for i, p in enumerate(pts)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_distributed_fit_matches_numpy(spark, blob_df):
    pts = _blobs()
    dist = _fit_centroids(blob_df, k=3, iters=5, seed=42, vec_col="embedding")
    ref = _numpy_lloyd(pts, k=3, iters=5, seed=42)
    # ordering is identical (same init), values differ only by partial-sum
    # association order
    assert np.allclose(dist, ref, atol=1e-8)


def test_assignments_recover_blobs(spark, blob_df):
    out = kmeans_assign(blob_df, k=3, iters=5, seed=42).collect()
    by_true = {}
    for r in out:
        by_true.setdefault(r["vec_id"] // 40, set()).add(r["cell"])
    # each true blob maps to exactly one fitted cell, and cells differ
    assert all(len(cells) == 1 for cells in by_true.values())
    assert len({next(iter(c)) for c in by_true.values()}) == 3


def test_cluster_profile_counts(spark, blob_df):
    prof = kmeans_cluster_profile(blob_df, k=3, iters=5, seed=42).collect()
    sizes = sorted(r["n_members"] for r in prof)
    assert sizes == [40, 40, 40]
    assert all(r["mean_norm"] > 0 for r in prof)
