"""Planted-value tests for the round-2 wave-3 operators: numeric
profiling (null path — the testdata tables are null-free), TF-IDF
ranking, and unigram cross-entropy."""

from __future__ import annotations

import math

from spendinganalysisetl_spark.operators.sampling import numeric_profile
from spendinganalysisetl_spark.operators.textanalysis import (
    tfidf_top_terms,
    unigram_cross_entropy,
)


def test_numeric_profile_counts_nulls(spark):
    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, None), (3.0, None), (None, 40.0)],
        "a double, b double",
    )
    out = {r["column_name"]: r for r in numeric_profile(df, ["a", "b"]).collect()}
    assert out["a"]["n_values"] == 3 and out["a"]["n_nulls"] == 1
    assert out["b"]["n_values"] == 2 and out["b"]["n_nulls"] == 2
    assert out["a"]["min_value"] == 1.0 and out["a"]["max_value"] == 3.0
    assert out["a"]["mean_value"] == 2.0
    assert out["a"]["stddev_value"] == 1.0  # sample stddev of 1,2,3
    assert out["b"]["mean_value"] == 25.0


def test_tfidf_ranks_distinctive_terms_first(spark):
    # "rare" appears only in doc 1 → its top keyword; "common" is in every
    # doc → idf = ln(1) = 0 → never ranked above a distinctive term.
    docs = spark.createDataFrame(
        [
            (1, "common rare common"),
            (2, "common alpha alpha"),
            (3, "common beta"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["rank"]): r for r in tfidf_top_terms(docs, k=2).collect()
    }
    assert out[(1, 1)]["term"] == "rare"
    assert out[(2, 1)]["term"] == "alpha"
    assert out[(3, 1)]["term"] == "beta"
    # doc 3: beta tf=1/2, idf=ln(3/1) → tfidf ≈ 0.549306
    assert abs(out[(3, 1)]["tfidf"] - round(math.log(3.0) / 2, 6)) < 1e-9
    # "common" scores exactly 0 everywhere (idf = ln(3/3) = 0)
    assert out[(1, 2)]["term"] == "common" and out[(1, 2)]["tfidf"] == 0.0


def test_cross_entropy_uniform_corpus(spark):
    # 4 equally-frequent tokens → p = 1/4 for each; every doc's
    # cross-entropy is exactly log2(4) = 2 bits/token.
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "c d")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in unigram_cross_entropy(docs).collect()}
    assert rows[1]["n_tokens"] == 2
    assert rows[1]["cross_entropy"] == 2.0
    assert rows[2]["cross_entropy"] == 2.0


def test_cross_entropy_flags_divergent_doc(spark):
    # doc 9 is all rare tokens → highest cross-entropy (prune candidate);
    # doc 1 is pure boilerplate → lowest.
    rows = [(1, "the the the the")] + [(i, "the filler") for i in range(2, 9)]
    rows.append((9, "zyx wvu tsr"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["cross_entropy"] for r in unigram_cross_entropy(docs).collect()}
    assert out[9] == max(out.values())
    assert out[1] == min(out.values())


def test_quantize_int8_edges(spark):
    from spendinganalysisetl_spark.operators.similarity import quantize_int8

    vecs = spark.createDataFrame(
        [
            (0, [0.0, 0.0, 0.0]),          # zero vector: scale 0, all-zero q
            (1, [1.0, -1.0, 0.5]),         # max element maps to ±127
            (2, [0.002, 0.254]),           # small values quantize near 1/127
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in quantize_int8(vecs).collect()}
    assert out[0]["scale"] == 0.0 and out[0]["q_sum"] == 0 and out[0]["q_l1"] == 0
    assert out[0]["max_recon_err"] == 0.0
    # vec 1: scale = 1/127; q = [127, -127, 64 (0.5*127=63.5 → half-away 64)]
    assert out[1]["q_l1"] == 127 + 127 + 64
    assert out[1]["q_sum"] == 127 - 127 + 64
    # error bounded by scale/2 (half-away rounding, no clamping active)
    assert out[1]["max_recon_err"] <= (1.0 / 127) / 2 + 1e-9
    assert out[2]["q_l1"] == 1 + 127
