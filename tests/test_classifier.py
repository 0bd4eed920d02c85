"""Trained quality classifier (operators/classifier.py): the
distributed trainer must reproduce the pure-Python reference
BIT-FOR-BIT (exact-integer gradient partials make the fit independent
of partitioning), and the exact-integer scoring pass must separate the
planted fixture and handle token-less documents."""

from __future__ import annotations

from spendinganalysisetl_spark.operators.classifier import (
    margin_scores,
    quantize_weights,
    train_logreg,
    train_reference_logreg,
)

FIXTURE = [
    (1, "clear concise sourced analysis of the measured results"),
    (1, "structured factual summary with precise sourced citations"),
    (1, "the analysis presents measured evidence and precise methods"),
    (0, "click here to win free money buy now limited offer"),
    (0, "free winner click the link buy cheap pills now"),
    (0, "limited offer win big money free spins click now"),
]


def _labeled(spark, rows, n_parts=None):
    df = spark.createDataFrame(
        [(i, lab, t) for i, (lab, t) in enumerate(rows)],
        "doc_id long, label int, text string",
    )
    return df.repartition(n_parts) if n_parts else df


def test_train_matches_reference_bit_for_bit(spark):
    w, b = train_logreg(_labeled(spark, FIXTURE), dim=32, iters=6)
    wr, br = train_reference_logreg(FIXTURE, dim=32, iters=6)
    assert w == wr and b == br  # exact float equality, not approx


def test_train_deterministic_under_partitioning(spark):
    a = train_logreg(_labeled(spark, FIXTURE, n_parts=1), dim=32, iters=4)
    c = train_logreg(_labeled(spark, FIXTURE, n_parts=7), dim=32, iters=4)
    assert a == c


def test_fixture_separability_and_margin_signs(spark):
    w, b = train_logreg(_labeled(spark, FIXTURE), dim=64, iters=8)
    wq, bq = quantize_weights(w, b)
    docs = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(FIXTURE)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in margin_scores(docs, wq, bq, 64).collect()}
    for i, (lab, _) in enumerate(FIXTURE):
        assert out[i]["pred"] == lab, (i, out[i])
        assert (out[i]["margin_micro"] >= 0) == (lab == 1)


def test_tokenless_doc_scores_bare_bias(spark):
    w, b = train_logreg(_labeled(spark, FIXTURE), dim=32, iters=4)
    wq, bq = quantize_weights(w, b)
    docs = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "click free money")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in margin_scores(docs, wq, bq, 32).collect()}
    assert out[0]["margin_micro"] == bq
    assert out[1]["margin_micro"] == bq
    assert out[2]["margin_micro"] != bq


def test_tokenless_labeled_doc_still_trains(spark):
    """A labeled example with empty text must survive the feature build
    (explode drops it; the left join restores it): it counts in n and
    contributes its bias gradient, exactly like the reference — and a
    labeled set of ONLY token-less docs trains a nonzero bias, not the
    n==0 zeros."""
    rows = FIXTURE + [(1, ""), (0, "   ")]
    w, b = train_logreg(_labeled(spark, rows), dim=32, iters=5)
    wr, br = train_reference_logreg(rows, dim=32, iters=5)
    assert w == wr and b == br
    only_empty = [(1, ""), (1, "")]
    w2, b2 = train_logreg(_labeled(spark, only_empty), dim=16, iters=3)
    wr2, br2 = train_reference_logreg(only_empty, dim=16, iters=3)
    assert (w2, b2) == (wr2, br2)
    assert b2 != 0.0


def test_empty_labeled_set_trains_zeros(spark):
    empty = spark.createDataFrame([], "doc_id long, label int, text string")
    w, b = train_logreg(empty, dim=16, iters=3)
    assert w == [0.0] * 16 and b == 0.0


def test_det_sigmoid_accuracy_and_clamp():
    """_det_sigmoid approximates the true sigmoid well below the gscale
    residual quantum (1e-6 is the learning signal's resolution; the
    2^-12 argument quantization costs ≤ ~1.3e-4 relative on exp)."""
    import math

    from spendinganalysisetl_spark.operators.classifier import (
        _det_exp,
        _det_sigmoid,
    )

    for z in [-40.0, -32.0, -7.3, -1.0, -2.0**-13, 0.0, 0.4, 5.9, 32.0, 99.0]:
        want = 1.0 / (1.0 + math.exp(-min(max(z, -32.0), 32.0)))
        assert abs(_det_sigmoid(z) - want) < 2e-4, z
    # exp side, mid-range relative accuracy
    for a in [0.001, 0.5, 3.25, 10.0, 31.9]:
        assert abs(_det_exp(a) / math.exp(a) - 1.0) < 2e-4, a
        assert abs(_det_exp(-a) * math.exp(a) - 1.0) < 2e-4, a


def test_training_is_libm_independent(spark, monkeypatch):
    """ADVICE r8 #1: the learned weights must not depend on the host's
    libm. Sabotage math.exp in this process (the reference trainer and
    the mapInPandas closure's defining module both live here; executors
    import the module fresh, where _det_exp touches no libm either) —
    training must neither call it nor change its output."""
    import math

    baseline_w, baseline_b = train_reference_logreg(FIXTURE, dim=32, iters=6)

    def poisoned(_x):
        raise AssertionError("libm exp reached the training path")

    monkeypatch.setattr(math, "exp", poisoned)
    w, b = train_reference_logreg(FIXTURE, dim=32, iters=6)
    assert (w, b) == (baseline_w, baseline_b)
    wd, bd = train_logreg(_labeled(spark, FIXTURE), dim=32, iters=6)
    assert (wd, bd) == (baseline_w, baseline_b)


def test_registry_trains_once_per_session(spark, tmp_path, monkeypatch):
    """VERDICT r8 ask #3: the bench path (N reps of
    quality_classifier_margins in one session) must train ONCE and
    re-score under the memoized weights — the per-epoch mapInPandas
    jobs are a rep-1 cost, not a per-rep cost."""
    from spendinganalysisetl_spark import registry
    from spendinganalysisetl_spark.operators import classifier

    docs = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(FIXTURE)], "doc_id long, text string"
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    calls = {"n": 0}
    real = classifier.train_logreg

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(classifier, "train_logreg", counting)
    registry._CLS_WEIGHTS.clear()
    fn = registry.QUERIES["quality_classifier_margins"]
    first = fn(spark, str(tmp_path)).collect()
    second = fn(spark, str(tmp_path)).collect()
    assert first == second and len(first) == len(FIXTURE)
    assert calls["n"] == 1  # rep 2+ scored under the memo, no retrain
