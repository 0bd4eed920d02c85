"""Trained quality classifier: hashed bag-of-words logistic regression
(SURVEY.md §2.11 / north_star — the learned complement of the heuristic
``textanalysis.quality_scores``).

This is the fastText-shaped fast student every modern pretraining
pipeline runs for quality filtering (public knowledge: Joulin et al.
2016 "Bag of Tricks for Efficient Text Classification"; feature
hashing per Weinberger et al. 2009; the FineWeb-Edu / DCLM pattern —
train a small classifier on a BOUNDED labeled set, then score the
full corpus with one cheap pass). The reference repo has no learned
component at all (its text ops stop at category strings,
transformer.py).

Scale design
------------
- TRAINING runs over the labeled set, which is bounded by construction
  (hundreds of thousands of annotated docs, never the corpus — e.g.
  FineWeb-Edu trains on ~450k annotations and scores trillions of
  tokens). Features build in pure Catalyst (tokenize → portable
  md5-fold hash → per-doc sparse count structs, sorted), persist once;
  each epoch is then ONE ``mapInPandas`` job emitting per-partition
  EXACT-INTEGER gradient partials (per-doc residual quantized to
  ``gscale`` units, partials summed as int64 — order-free, so the
  learned weights are bit-deterministic under any partitioning; same
  exactness device as operators/pca.py). The driver applies the update
  to a dim-sized weight vector — k-means/BPE-style bounded state.
- SCORING is the corpus-scale half and is pure Catalyst: one tokenize
  pass, the quantized dim-row weight table broadcast-joined on the
  hashed index, one per-doc int64 sum. Margins are EXACT integers in
  ``wscale`` units (no transcendentals in the scoring path), so a
  DuckDB oracle holding the reference-trained weights as VALUES
  reproduces every margin bit-for-bit.
- Per-doc sigmoid in training is LIBM-FREE (``_det_sigmoid``): the
  argument is quantized to 2^-12 units and ``exp`` is rebuilt by
  binary exponentiation over 18 HARD-CODED ``exp(2^j)`` float64
  literals — only IEEE-754 multiply/divide, which are exact-rounded
  and therefore bit-identical on every platform. The executor
  partials and the pure-Python reference trainer share the exact
  same function, so the differential tests pin weights EXACTLY
  equal — and, unlike a ``math.exp`` formulation, the equality holds
  on a heterogeneous cluster whose driver and executors link
  different libm builds (ADVICE r8 #1). The ~2^-13 sigmoid argument
  quantization is far below the ``gscale`` residual quantization
  (1e-6) that already defines the learning signal.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spendinganalysisetl_spark.functions.text import hex_fold, ws_tokens
from spendinganalysisetl_spark.partitioning import spread as _spread


# exp(2^(j-12)) for j = 0..17, correctly-rounded float64 LITERALS
# (generated once with CPython math.exp and frozen as hex — the source
# of determinism is that these are constants in the code, not runtime
# libm calls; see module docstring "libm-free sigmoid").
_EXP_POW2 = (
    float.fromhex("0x1.0010008002aabp+0"),  # exp(2**-12)
    float.fromhex("0x1.0020020015560p+0"),  # exp(2**-11)
    float.fromhex("0x1.00400800aab55p+0"),  # exp(2**-10)
    float.fromhex("0x1.0080200556001p+0"),  # exp(2**-9)
    float.fromhex("0x1.0100802ab5577p+0"),  # exp(2**-8)
    float.fromhex("0x1.0202015600446p+0"),  # exp(2**-7)
    float.fromhex("0x1.04080ab55de39p+0"),  # exp(2**-6)
    float.fromhex("0x1.08205601127edp+0"),  # exp(2**-5)
    float.fromhex("0x1.1082b577d34edp+0"),  # exp(2**-4)
    float.fromhex("0x1.2216045b6f5cdp+0"),  # exp(2**-3)
    float.fromhex("0x1.48b5e3c3e8186p+0"),  # exp(2**-2)
    float.fromhex("0x1.a61298e1e069cp+0"),  # exp(2**-1)
    float.fromhex("0x1.5bf0a8b145769p+1"),  # exp(2**0)
    float.fromhex("0x1.d8e64b8d4ddaep+2"),  # exp(2**1)
    float.fromhex("0x1.b4c902e273a58p+5"),  # exp(2**2)
    float.fromhex("0x1.749ea7d470c6ep+11"),  # exp(2**3)
    float.fromhex("0x1.0f2ebd0a80020p+23"),  # exp(2**4)
    float.fromhex("0x1.1f43fcc4b662cp+46"),  # exp(2**5)
)


def _det_exp(z: float) -> float:
    """Deterministic exp(z): |z| clamps to 32, quantizes to 2^-12
    units (floor — an exact float op, no libm), then binary
    exponentiation over the ``_EXP_POW2`` literals. Every operation is
    an IEEE-754 exact-rounded multiply or divide, so the result is
    bit-identical on any platform/libm — the property the
    cross-executor weight determinism contract needs."""
    neg = z < 0.0
    a = -z if neg else z
    if a > 32.0:
        a = 32.0
    zq = math.floor(a * 4096.0 + 0.5)
    r = 1.0
    j = 0
    while zq:
        if zq & 1:
            r *= _EXP_POW2[j]
        zq >>= 1
        j += 1
    return 1.0 / r if neg else r


def _det_sigmoid(z: float) -> float:
    """1 / (1 + exp(-z)) over ``_det_exp`` — the shared libm-free
    sigmoid of the distributed trainer and the pure-Python reference."""
    return 1.0 / (1.0 + _det_exp(-z))


def _hash_idx_py(token: str, dim: int) -> int:
    """Pure-Python twin of the Catalyst fold below: md5 hex chars 1-14
    as a base-16 BIGINT, mod dim. Matches functions.text.hex_fold /
    registry.hex_fold_sql bit-for-bit."""
    import hashlib

    return int(hashlib.md5(token.encode()).hexdigest()[:14], 16) % dim


def hashed_doc_features(
    labeled: DataFrame, dim: int, text_col: str = "text"
) -> DataFrame:
    """(doc_id, label, feats) with feats = array<struct<idx,cnt>> sorted
    by idx — the sparse hashed bag-of-words, built in pure Catalyst.
    The sort pins the per-doc float dot-product ORDER in the training
    partials, which is what makes the learned weights independent of
    collect_list's arrival order."""
    base = labeled.select("doc_id", "label", text_col)
    tok = _spread(base).select(
        "doc_id", F.explode(ws_tokens(F.col(text_col))).alias("t")
    )
    idx = (hex_fold(F.md5("t"), 1) % dim).cast("int")
    grouped = (
        tok.select("doc_id", idx.alias("idx"))
        .groupBy("doc_id", "idx")
        .agg(F.count(F.lit(1)).cast("int").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("idx"), F.col("cnt")))
            ).alias("feats")
        )
    )
    # LEFT join back to the labeled set: explode drops token-less docs,
    # but an empty document is still a labeled example — it contributes
    # its bias gradient and counts in n, exactly as in the pure-Python
    # reference (a dropped doc would silently break the bit-for-bit
    # trainer-equivalence contract).
    return base.select("doc_id", "label").join(grouped, "doc_id", "left").select(
        "doc_id",
        "label",
        F.coalesce(
            "feats", F.array().cast("array<struct<idx:int,cnt:int>>")
        ).alias("feats"),
    )


def train_logreg(
    labeled: DataFrame,
    dim: int = 64,
    iters: int = 8,
    lr: float = 0.5,
    gscale: float = 1e6,
) -> tuple[list[float], float]:
    """Distributed logistic-regression fit over (doc_id, label, text)
    rows; returns (weights[dim], bias) — bit-deterministic under any
    partitioning (see module docstring). One persisted feature build +
    one job per epoch; every collect is a dim-sized partial per
    partition."""
    feats = hashed_doc_features(labeled, dim).persist()
    try:
        n = feats.count()
        if n == 0:
            return [0.0] * dim, 0.0
        w = [0.0] * dim
        b = 0.0
        schema = "g array<long>, gb long"
        for _ in range(iters):
            w_cur, b_cur = list(w), b

            def partials(batches, w_cur=w_cur, b_cur=b_cur):
                import pandas as pd

                g = [0] * dim
                gb = 0
                for pdf in batches:
                    for label, fs in zip(pdf["label"], pdf["feats"]):
                        z = b_cur
                        for f in fs:  # sorted by idx — fixed float order
                            z += w_cur[f["idx"]] * f["cnt"]
                        p = _det_sigmoid(z)
                        # per-doc residual quantized ONCE; feature
                        # contributions are exact integer products
                        q = math.floor((p - float(label)) * gscale + 0.5)
                        for f in fs:
                            g[f["idx"]] += q * f["cnt"]
                        gb += q
                yield pd.DataFrame({"g": [g], "gb": [gb]})

            rows = feats.mapInPandas(partials, schema).collect()
            G = [0] * dim
            GB = 0
            for r in rows:
                for j, v in enumerate(r["g"]):
                    G[j] += v
                GB += r["gb"]
            w = [w[j] - lr * (G[j] / gscale) / n for j in range(dim)]
            b = b - lr * (GB / gscale) / n
        return w, b
    finally:
        feats.unpersist()


def train_reference_logreg(
    rows: list[tuple[int, str]],
    dim: int = 64,
    iters: int = 8,
    lr: float = 0.5,
    gscale: float = 1e6,
) -> tuple[list[float], float]:
    """Pure-Python reference trainer over (label, text) pairs — no
    Spark anywhere; independent reimplementation of the same quantized
    update rule for the differential tests and the fixture oracle."""
    import re

    docs = []
    for label, text in rows:
        cnt: dict[int, int] = {}
        # ASCII-whitespace complement, NOT Python's Unicode-aware \S:
        # Java regex (functions.text.ws_tokens) and RE2 (the DuckDB
        # oracle) both read \s as ASCII whitespace, so e.g. NBSP is a
        # token CHARACTER there — the reference must split identically
        # or Unicode-whitespace text breaks the bit-for-bit contract.
        for t in re.findall(r"[^ \t\n\x0b\f\r]+", text.lower()):
            i = _hash_idx_py(t, dim)
            cnt[i] = cnt.get(i, 0) + 1
        docs.append((label, sorted(cnt.items())))
    n = len(docs)
    w = [0.0] * dim
    b = 0.0
    if n == 0:
        return w, b
    for _ in range(iters):
        G = [0] * dim
        GB = 0
        for label, fs in docs:
            z = b
            for i, c in fs:
                z += w[i] * c
            p = _det_sigmoid(z)
            q = math.floor((p - float(label)) * gscale + 0.5)
            for i, c in fs:
                G[i] += q * c
            GB += q
        w = [w[j] - lr * (G[j] / gscale) / n for j in range(dim)]
        b = b - lr * (GB / gscale) / n
    return w, b


def quantize_weights(
    w: list[float], b: float, wscale: float = 1e6
) -> tuple[list[int], int]:
    """Weights to exact ``wscale``-unit integers (floor(x·s + 0.5)) —
    the broadcast form the scoring pass and its oracle share."""
    return (
        [math.floor(x * wscale + 0.5) for x in w],
        math.floor(b * wscale + 0.5),
    )


def margin_scores(
    documents: DataFrame,
    w_q: list[int],
    bias_q: int,
    dim: int,
    ordered: bool = True,
) -> DataFrame:
    """Score every document under quantized weights: (doc_id,
    margin_micro, pred) with margin_micro = bias_q + Σ w_q[hash(token)]
    over ALL token occurrences — an exact int64, reproducible on any
    engine. The whole pass is ONE PROJECTION: the dim-sized weight
    vector is an all-literal array (ConstantFolding collapses it to a
    single Literal, so referencing it inside the lambda is free — no
    per-row rebuild), tokens map to weights via ``transform`` +
    ``element_at`` and sum via ``aggregate``. No explode, no join, no
    groupBy — the doc-level rows never shuffle (vs the previous
    explode → broadcast-join → groupBy → join-back shape, which
    exchanged the corpus at TOKEN granularity twice; rewritten for
    VERDICT r8 ask #3). Token-less/NULL docs keep the bare bias via
    the coalesce."""
    warr = F.array(*[F.lit(int(w_q[i])) for i in range(dim)])
    tok_w = F.transform(
        ws_tokens(F.col("text")),
        lambda t: F.element_at(
            warr, (hex_fold(F.md5(t), 1) % dim).cast("int") + F.lit(1)
        ),
    )
    s = F.aggregate(
        tok_w, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
    )
    margin = F.coalesce(s, F.lit(0)) + F.lit(int(bias_q))
    out = _spread(documents.select("doc_id", "text")).select(
        "doc_id",
        margin.cast("long").alias("margin_micro"),
        (margin >= 0).cast("int").alias("pred"),
    )
    if not ordered:
        # Production core: per-doc output stays distributed; canonical
        # ordering is oracle/report-only (presentation-layer boundary).
        return out
    return out.repartition(1).sortWithinPartitions("doc_id")
