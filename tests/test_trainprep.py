"""Semantics tests for operators/trainprep.py on planted inputs
(the oracle-parity gate covers the registry queries on real testdata;
these pin behavior on constructed edge cases)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spendinganalysisetl_spark.operators.trainprep import (
    boilerplate_stats,
    decontaminate,
    domain_mix_weights,
    duplicate_token_spans,
    pack_sequences,
    pii_scrub,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_decontaminate_flags_exact_copy_of_benchmark(spark):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = _docs(
        spark,
        [
            (0, bench_text, "en"),  # benchmark slice (doc_id % 20 == 0)
            (1, bench_text, "en"),  # training copy — fully contaminated
            (2, "one two three four five six seven eight nine ten", "en"),
        ],
    )
    out = {r["doc_id"]: r for r in decontaminate(docs, n=8, bench_mod=20).collect()}
    assert set(out) == {1, 2}  # benchmark doc excluded from output
    assert out[1]["is_contaminated"] == 1
    assert out[1]["overlap_ratio"] == 1.0
    assert out[2]["is_contaminated"] == 0
    assert out[2]["n_hits"] == 0


def test_decontaminate_subn_doc_matches_whole_text(spark):
    # A sub-n doc shingles to its whole text; contamination requires the
    # benchmark to contain the identical whole-text gram.
    docs = _docs(spark, [(0, "tiny doc", "en"), (3, "tiny doc", "en")])
    out = decontaminate(docs, n=8, bench_mod=20).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 3
    assert out[0]["is_contaminated"] == 1 and out[0]["n_grams"] == 1


def test_boilerplate_marks_shared_grams_only(spark):
    shared = "lorem ipsum dolor sit amet consectetur"
    docs = _docs(
        spark,
        [
            (1, shared + " unique one tail here now", "en"),
            (2, shared + " other distinct ending words here", "en"),
            (3, "completely different text with no overlap at all", "en"),
        ],
    )
    out = {r["doc_id"]: r for r in boilerplate_stats(docs, n=5, min_docs=2).collect()}
    assert out[1]["n_boiler"] == 2  # the two 5-grams inside `shared`
    assert out[2]["n_boiler"] == 2
    assert out[3]["n_boiler"] == 0
    assert out[3]["boiler_ratio"] == 0.0


def test_duplicate_token_spans_merges_and_counts(spark):
    """Planted spans: a 6-token phrase shared by docs 1 and 2 must
    surface as exact token ranges — overlapping windows merged into one
    span, two occurrences in one doc far apart as two islands; a phrase
    repeated only WITHIN one doc (df counts distinct docs) and sub-n
    docs emit nothing."""
    p = "p1 p2 p3 p4 p5 p6"
    docs = _docs(
        spark,
        [
            (1, f"u1 u2 {p} u3 u4", "en"),
            (2, f"{p} v1 v2 v3 v4 v5 v6 v7 v8 {p}", "en"),
            (3, "w1 w2 w3 w4 w5 w6 w7 entirely unshared", "en"),
            (4, "x1 x2 x3", "en"),
            (7, "q1 q2 q3 q4 q5 z1 z2 z3 z4 q1 q2 q3 q4 q5", "en"),
        ],
    )
    rows = [
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"], r["n_dup_grams"])
        for r in duplicate_token_spans(docs, n=5, min_docs=2).collect()
    ]
    assert rows == [
        (1, 2, 8, 6, 2),
        (2, 0, 6, 6, 2),
        (2, 14, 20, 6, 2),
    ]


def test_pack_sequences_bins_and_conservation(spark):
    # 10 docs x 4 tokens, budget 8 -> docs start at offsets 0,4,8,... ->
    # bins of exactly 2 docs each.
    rows = [(i, "a b c d", "en") for i in range(10)]
    out = pack_sequences(_docs(spark, rows), budget=8, bucket_width=4).collect()
    assert [r["bin_id"] for r in out] == [0, 1, 2, 3, 4]
    assert all(r["n_docs"] == 2 for r in out)
    assert sum(r["n_tokens"] for r in out) == 40
    # contiguity: first_doc of bin k follows last_doc of bin k-1
    for prev, cur in zip(out, out[1:]):
        assert cur["first_doc"] == prev["last_doc"] + 1


def test_pack_sequences_straddle_assigns_to_start_bin(spark):
    # doc0: 5 tokens (offset 0, bin 0); doc1: 5 tokens (offset 5 -> bin 0
    # even though it straddles into bin 1); doc2: offset 10 -> bin 1.
    rows = [(i, "t1 t2 t3 t4 t5", "en") for i in range(3)]
    out = {r["bin_id"]: r for r in pack_sequences(_docs(spark, rows), budget=8).collect()}
    assert out[0]["n_docs"] == 2 and out[1]["n_docs"] == 1
    assert out[0]["last_doc"] == 1 and out[1]["first_doc"] == 2


def test_pack_sequences_empty_input(spark):
    out = pack_sequences(_docs(spark, []), budget=8)
    assert out.count() == 0


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@corp.io or call +1-555-123-4567"),
            (2, "ssn 123-45-6789 twice 987-65-4321"),
            (3, "clean text no pii"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r for r in pii_scrub(df).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1 and out[1]["n_ssn"] == 0
    assert "<EMAIL>" in out[1]["clean_text"] and "<PHONE>" in out[1]["clean_text"]
    assert "jo.doe" not in out[1]["clean_text"]
    assert out[2]["n_ssn"] == 2
    assert out[2]["clean_text"] == "ssn <SSN> twice <SSN>"
    assert out[3]["clean_text"] == "clean text no pii"


def test_pii_ssn_not_confused_with_phone(spark):
    df = spark.createDataFrame(
        [(1, "+1-555-123-4567 and 111-22-3333")], "id long, text string"
    )
    r = pii_scrub(df).collect()[0]
    assert r["n_phone"] == 1 and r["n_ssn"] == 1
    assert r["clean_text"] == "<PHONE> and <SSN>"


def test_domain_mix_weights_cap_and_shares(spark):
    # en: 90 tokens, fr: 10 tokens -> obs .9/.1, target .5 each;
    # fr weight = .5/.1 = 5.0 (at cap), en = .5/.9
    rows = [(i, " ".join(["w"] * 9), "en") for i in range(10)] + [
        (100 + i, "w", "fr") for i in range(10)
    ]
    out = {r["lang"]: r for r in domain_mix_weights(_docs(spark, rows)).collect()}
    assert out["en"]["obs_share"] == 0.9 and out["fr"]["obs_share"] == 0.1
    assert out["fr"]["mix_weight"] == 5.0  # capped
    assert out["en"]["mix_weight"] == pytest.approx(0.5 / 0.9, abs=1e-4)
    assert out["en"]["n_tokens"] == 90 and out["fr"]["n_tokens"] == 10


def test_domain_mix_weight_cap_binds(spark):
    rows = [(i, " ".join(["w"] * 99), "en") for i in range(10)] + [(100, "w", "fr")]
    out = {r["lang"]: r for r in domain_mix_weights(_docs(spark, rows)).collect()}
    assert out["fr"]["mix_weight"] == 5.0


@pytest.mark.parametrize("budget,bucket_width", [(7, 16), (16, 64), (64, 1 << 16)])
def test_pack_sequences_matches_python_reference(spark, budget, bucket_width):
    """The distributed prefix sum must agree with a straight sequential
    reference for sparse ids, zero-token docs, and varied bucket
    widths (incl. everything landing in one bucket)."""
    import random

    rng = random.Random(42)
    ids = sorted(rng.sample(range(1000), 40))
    rows = [(i, " ".join(["w"] * rng.randint(0, 9)), "en") for i in ids]
    out = {
        r["bin_id"]: r
        for r in pack_sequences(
            _docs(spark, rows), budget=budget, bucket_width=bucket_width
        ).collect()
    }

    expect: dict[int, dict] = {}
    off = 0
    for i, text, _ in rows:
        ntok = len(text.split()) if text else 0
        b = off // budget
        e = expect.setdefault(
            b, {"n_docs": 0, "n_tokens": 0, "first_doc": i, "last_doc": i}
        )
        e["n_docs"] += 1
        e["n_tokens"] += ntok
        e["last_doc"] = i
        off += ntok
    assert set(out) == set(expect)
    for b, e in expect.items():
        for k, v in e.items():
            assert out[b][k] == v, (b, k, out[b][k], v)


def test_decontaminate_plan_broadcasts_benchmark(spark, sf_dir):
    """The benchmark gram set must probe as a broadcast join — the
    training side (100 TB at scale) must not shuffle for it."""
    from spendinganalysisetl_spark.catalog import load_table

    plan = decontaminate(load_table(spark, sf_dir, "documents"))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_build_training_shards_composition(spark):
    """Planted fixture for the composed pipeline: a benchmark copy
    contaminates its training twin; a low-quality doc is gated; a
    duplicate loses survivor election; the rest pack in doc_id order."""
    from spendinganalysisetl_spark.operators.trainprep import build_training_shards

    text_a = "the quick brown fox jumps over the lazy dog and runs far away now"
    text_b = "a calm river flows down the green valley toward the open sea today"
    text_c = "the wind moves softly over an old stone bridge near the tall mill"
    rows = [
        (0, text_a, "en"),  # benchmark slice (0 % 20 == 0)
        (1, text_a, "en"),  # contaminated twin of the benchmark -> dropped
        (2, text_b, "en"),  # clean survivor
        (3, "bad", "en"),   # low quality -> gated
        (4, text_b, "en"),  # dup of 2 -> loses survivor election
        (5, text_c, "en"),  # clean survivor
    ]
    docs = spark.createDataFrame(
        [(i, t, lang, len(t)) for i, t, lang in rows],
        "doc_id long, text string, lang string, n_chars long",
    )
    out = build_training_shards(docs, budget=10).collect()
    for r in out:
        assert r["first_doc"] <= r["last_doc"]
    assert sum(r["n_docs"] for r in out) == 2  # exactly docs 2 and 5
    assert sum(r["n_tokens"] for r in out) == len(text_b.split()) + len(text_c.split())
    assert out[0]["first_doc"] == 2
    assert out[-1]["last_doc"] == 5


def test_vocab_top_terms_counts_and_plan(spark):
    from spendinganalysisetl_spark.operators.trainprep import vocab_top_terms

    rows = [
        (1, "apple banana apple", "en"),
        (2, "apple cherry", "en"),
        (3, "banana apple banana", "en"),
    ]
    out = vocab_top_terms(_docs(spark, rows), k=2).collect()
    assert [(r["rank"], r["token"], r["n_occurrences"], r["n_docs"]) for r in out] == [
        (1, "apple", 4, 3),
        (2, "banana", 3, 2),
    ]
    # top-k must plan as TakeOrderedAndProject (per-partition heaps),
    # not a global sort of the vocabulary
    plan = vocab_top_terms(_docs(spark, rows), k=2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bigram_pmi_planted_collocation(spark):
    """'new york' always adjacent -> strongly positive PMI; a pair that
    co-occurs at chance in a shuffled tail gets lower PMI. Exact values
    checked against a hand computation."""
    import math

    from spendinganalysisetl_spark.operators.trainprep import bigram_pmi

    rows = [(i, "new york " * 5, "en") for i in range(3)]  # 30 tokens, 27 pairs
    out = bigram_pmi(_docs(spark, rows), min_count=5).collect()
    got = {(r["w1"], r["w2"]): r for r in out}
    # corpus: N=30 unigrams (15 new, 15 york); B=27 pairs:
    # (new,york) x15, (york,new) x12
    r = got[("new", "york")]
    assert (r["c_ab"], r["c_a"], r["c_b"]) == (15, 15, 15)
    expect = round(math.log2((15 / 27) / ((15 / 30) * (15 / 30))), 4)
    assert r["pmi"] == expect
    assert got[("york", "new")]["c_ab"] == 12
    assert r["pmi"] > got[("york", "new")]["pmi"]


def test_shuffle_shards_deterministic_partition(spark):
    from spendinganalysisetl_spark.operators.sampling import shuffle_shards

    docs = _docs(spark, [(i, f"doc {i}", "en") for i in range(100)])
    out = shuffle_shards(docs.select("doc_id"), n_shards=4, seed=7)
    rows = out.collect()
    # every doc exactly once, shards in range
    assert sorted(r["doc_id"] for r in rows) == list(range(100))
    assert all(0 <= r["shard_id"] < 4 for r in rows)
    # positions are contiguous 1..size within each shard
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard_id"], []).append(r["pos"])
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    # deterministic: a second run (different partitioning) is identical
    again = shuffle_shards(
        docs.select("doc_id").repartition(13), n_shards=4, seed=7
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # a different seed produces a different permutation
    other = shuffle_shards(docs.select("doc_id"), n_shards=4, seed=8).collect()
    assert sorted(map(tuple, rows)) != sorted(map(tuple, other))


def test_shuffle_shards_append_stable(spark):
    from spendinganalysisetl_spark.operators.sampling import shuffle_shards

    docs = _docs(spark, [(i, f"doc {i}", "en") for i in range(50)])
    grown = _docs(spark, [(i, f"doc {i}", "en") for i in range(80)])
    small = {
        r["doc_id"]: r["shard_id"]
        for r in shuffle_shards(docs.select("doc_id"), n_shards=4, seed=7).collect()
    }
    big = {
        r["doc_id"]: r["shard_id"]
        for r in shuffle_shards(grown.select("doc_id"), n_shards=4, seed=7).collect()
    }
    # appends never move an existing row's shard (positions may shift)
    assert all(big[k] == v for k, v in small.items())


def test_source_quality_report_cross_source_duplicates(spark):
    from spendinganalysisetl_spark.operators.textanalysis import (
        source_quality_report,
    )

    good = (
        "the quick brown fox jumps over the lazy dog and then it runs far "
        "away to the hills where it waits for the next day to come around"
    ) * 2
    rows = [
        (1, good, "en", "srcA", len(good)),
        (2, good, "en", "srcB", len(good)),     # cross-source duplicate
        (3, good + " extra", "en", "srcB", len(good) + 6),
        (4, "!!! ??? ###", "en", "srcB", 11),   # junk, unique
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r["source"]: r for r in source_quality_report(df).collect()}
    # srcA's only doc duplicates srcB's — both sides are charged
    assert out["srcA"]["n_docs"] == 1 and out["srcA"]["n_dup_docs"] == 1
    assert out["srcA"]["dup_rate"] == 1.0
    assert out["srcB"]["n_docs"] == 3 and out["srcB"]["n_dup_docs"] == 1
    assert out["srcB"]["dup_rate"] == round(1 / 3, 6)
    # junk doc drags srcB's mean quality below srcA's
    assert out["srcB"]["mean_quality"] < out["srcA"]["mean_quality"]


def test_chunk_documents_sliding_overlap(spark):
    """The sliding-window contract on documents longer than one chunk:
    starts advance by stride=chunk-overlap, consecutive chunks share
    exactly `overlap` tokens, the tail partial is kept, no token lost,
    empty docs emit nothing."""
    from spendinganalysisetl_spark.operators.trainprep import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(1, 301))),  # 300 tokens
            (2, " ".join(f"w{i}" for i in range(1, 129))),  # exactly one chunk
            (3, "solo"),
            (4, "   "),  # zero tokens -> no chunks
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["first_token"], r["last_token"])
        for r in chunk_documents(docs, chunk_tokens=128, overlap=16).collect()
    }
    # doc 1: starts 1, 113, 225 -> lengths 128, 128, 76
    assert out[(1, 0)] == (128, "w1", "w128")
    assert out[(1, 1)] == (128, "w113", "w240")
    assert out[(1, 2)] == (76, "w225", "w300")
    # consecutive chunks share exactly `overlap` tokens (w113..w128)
    assert out[(1, 1)][1] == "w113" and out[(1, 0)][2] == "w128"
    assert out[(2, 0)] == (128, "w1", "w128")
    assert out[(3, 0)] == (1, "solo", "solo")
    assert not any(d == 4 for d, _ in out)
    assert len(out) == 5
    # no token lost, derived from the EMITTED chunks: with stride 112,
    # chunk i contributes n_tokens_i new tokens minus the 16 it shares
    # with its predecessor — the distinct covered count must equal 300.
    doc1 = sorted((cid, n) for (d, cid), (n, _f, _l) in out.items() if d == 1)
    covered = sum(n for _, n in doc1) - 16 * (len(doc1) - 1)
    assert covered == 300

    import pytest as _pytest

    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=16, overlap=16)
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=128, overlap=-10)


def test_weighted_sample_deterministic_and_weighted(spark):
    """E-S weighted sampling: deterministic for a seed, append-stable
    draws, invalid weights excluded, and inclusion rises with weight
    (heavier rows overrepresented across disjoint key populations)."""
    import hashlib
    import math

    from spendinganalysisetl_spark.operators.sampling import weighted_sample

    docs = spark.createDataFrame(
        [(i, 10 if i % 2 else 1000) for i in range(200)]
        + [(998, None), (999, 0)],
        "doc_id long, n_chars long",
    )
    out = weighted_sample(docs, k=50, weight_col="n_chars").collect()
    assert len(out) == 50
    assert all(r["doc_id"] not in (998, 999) for r in out), "invalid weights excluded"
    again = weighted_sample(docs, k=50, weight_col="n_chars").collect()
    assert [r["doc_id"] for r in out] == [r["doc_id"] for r in again]

    # heavier rows (w=1000, even ids) must dominate the sample
    heavy = sum(1 for r in out if r["doc_id"] % 2 == 0)
    assert heavy > 40, f"only {heavy}/50 heavy rows sampled"

    # the draw is the documented md5 fold — check one row bit-for-bit
    r0 = next(r for r in out if r["doc_id"] == 0)
    h = hashlib.md5(b"7:0").hexdigest()[:13]
    u = (int(h, 16) + 1.0) / float(1 << 52)
    assert r0["priority"] == round(math.log(u) / 1000.0, 6) + 0.0


def test_stratified_sample_hash_laws(spark):
    """Hash-stratified sampling: deterministic, append-stable, rate
    within Bernoulli tolerance per stratum, unknown strata dropped."""
    from spendinganalysisetl_spark.operators.sampling import (
        stratified_sample_hash,
    )

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "fr") for i in range(2000)]
        + [(9000, "xx")],
        "doc_id long, lang string",
    )
    fr = {"en": 0.3, "fr": 0.8}
    kept = stratified_sample_hash(docs, fr).collect()
    assert all(r["lang"] != "xx" for r in kept), "unlisted strata drop"
    by = {}
    for r in kept:
        by.setdefault(r["lang"], set()).add(r["doc_id"])
    for lang, frac in fr.items():
        rate = len(by[lang]) / 1000
        assert abs(rate - frac) < 0.06, (lang, rate)
    # append stability: growing the corpus never flips an old row
    grown = docs.union(
        spark.createDataFrame([(i, "en") for i in range(10_000, 10_100)],
                              "doc_id long, lang string")
    )
    kept2 = {r["doc_id"] for r in stratified_sample_hash(grown, fr).collect()}
    assert {r["doc_id"] for r in kept} <= kept2


def test_token_drift_psi_detects_planted_shift(spark):
    """PSI: identical halves give ~zero terms; a token dominating only
    the new slice tops the contributor list."""
    from spendinganalysisetl_spark.operators.trainprep import token_drift_psi

    base = [(i, "alpha beta gamma delta") for i in range(100)]
    shifted = [(i, "alpha beta gamma delta SPIKE SPIKE SPIKE") for i in range(100, 200)]
    docs = spark.createDataFrame(base + shifted, "doc_id long, text string")
    out = token_drift_psi(docs, split_id=100, top_n=5).collect()
    assert out[0]["token"] == "spike"
    assert out[0]["c_ref"] == 0 and out[0]["c_new"] == 300
    assert out[0]["psi_term"] > 0.05

    same = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(200)], "doc_id long, text string"
    )
    flat = token_drift_psi(same, split_id=100, top_n=3).collect()
    assert all(r["psi_term"] < 0.001 for r in flat), "no drift => near-zero PSI"


def test_shard_build_observed_metrics(spark):
    """Observation counters ride the shard build's own pass: the
    docs/tokens-packed metrics equal the manifest's sums without any
    extra corpus scan."""
    from spendinganalysisetl_spark.operators.trainprep import (
        build_training_shards,
    )

    # per-doc-unique grams (shared text would be decontaminated away),
    # with enough stopwords/length to pass the quality gate
    docs = spark.createDataFrame(
        [
            (
                i,
                # stopwords interleaved so every 8-gram contains a
                # doc-unique token (a shared run would be decontaminated)
                " ".join(f"w{i}x{j} the" for j in range(40)),
            )
            for i in range(40)
        ],
        "doc_id long, text string",
    ).withColumn("n_chars", __import__("pyspark").sql.functions.length("text"))
    obs: dict = {}
    bins = build_training_shards(docs, observations=obs).collect()
    m = obs["shard_build"].get
    assert m["n_bins"] == len(bins)
    assert m["docs_packed"] == sum(r["n_docs"] for r in bins)
    assert m["tokens_packed"] == sum(r["n_tokens"] for r in bins)
    assert m["docs_packed"] > 0


def test_resample_to_mixture_laws(spark):
    """Planted 3-domain skew: the resampler's copy multiset follows the
    integer spec exactly, is deterministic, and moves the mixture
    toward uniform under the cap."""
    import hashlib

    from spendinganalysisetl_spark.operators.trainprep import resample_to_mixture

    # domains: big=60 docs, mid=30, small=10 → N=100, D=3, target n=33.3
    rows = (
        [(i, "big") for i in range(60)]
        + [(100 + i, "mid") for i in range(30)]
        + [(200 + i, "small") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = resample_to_mixture(df, "lang", "doc_id", max_weight_bp=50000)
    got = sorted((r["id"], r["domain"], r["copy_idx"]) for r in out.collect())

    # independent pure-Python reimplementation of the spec
    def fold(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:7], 16)

    w = {"big": min(50000, 10000 * 100 // (3 * 60)),   # 5555
         "mid": min(50000, 10000 * 100 // (3 * 30)),   # 11111
         "small": min(50000, 10000 * 100 // (3 * 10))}  # 33333
    want = []
    for i, lang in rows:
        c = w[lang] // 10000 + (1 if fold(i) % 10000 < w[lang] % 10000 else 0)
        want += [(i, lang, k) for k in range(1, c + 1)]
    assert got == sorted(want)

    # determinism across partitionings
    got2 = sorted(
        (r["id"], r["domain"], r["copy_idx"])
        for r in resample_to_mixture(df.repartition(7), "lang", "doc_id").collect()
    )
    assert got2 == got

    # mixture actually moves toward uniform: 'small' gets 3-4 copies per
    # doc, 'big' is thinned below its input count
    from collections import Counter

    by = Counter(d for _, d, _ in got)
    assert by["small"] >= 30  # 10 docs × ~3.33
    assert by["big"] < 60
    # cap respected
    assert max(Counter((i, d) for i, d, _ in got).values()) <= 5


def test_temperature_mix_weights_math(spark):
    """τ=0.5 flattening on a planted 2-lang corpus: hand-computed
    shares/weights; flattening moves the mix toward uniform (minority
    share rises, majority falls) and weights respect the cap."""
    import math

    from spendinganalysisetl_spark.operators.trainprep import (
        temperature_mix_weights,
    )

    # lang a: 9 tokens, lang b: 1 token -> p = (0.9, 0.1)
    docs = spark.createDataFrame(
        [(0, "a", "t t t t t t t t t"), (1, "b", "t")],
        "doc_id long, lang string, text string",
    )
    out = {r["lang"]: r for r in temperature_mix_weights(docs).collect()}
    sa = math.floor(math.sqrt(0.9) * 1e9 + 0.5)
    sb = math.floor(math.sqrt(0.1) * 1e9 + 0.5)
    qa, qb = sa / (sa + sb), sb / (sa + sb)
    assert out["a"]["obs_share"] == 0.9 and out["b"]["obs_share"] == 0.1
    assert out["a"]["flat_share"] == round(qa, 6)
    assert out["b"]["flat_share"] == round(qb, 6)
    assert out["a"]["mix_weight"] == round(qa / 0.9, 4) < 1.0  # majority down
    assert out["b"]["mix_weight"] == round(qb / 0.1, 4) > 1.0  # minority up
    # cap law: extreme imbalance hits the 5.0 ceiling
    docs2 = spark.createDataFrame(
        [(0, "a", " ".join(["t"] * 400)), (1, "b", "t")],
        "doc_id long, lang string, text string",
    )
    out2 = {r["lang"]: r for r in temperature_mix_weights(docs2).collect()}
    assert out2["b"]["mix_weight"] == 5.0


def test_skipgram_pmi_hand_checked(spark):
    """Window-3 skip-gram pairs on a planted corpus: hand-computed pair
    and unigram counts; window-1 restriction equals bigram semantics;
    support floor drops rare pairs."""
    import math

    from spendinganalysisetl_spark.operators.trainprep import skipgram_pmi

    # "a b c a b c" per doc, 3 docs: unigrams a=b=c=6 each, N=18.
    docs = spark.createDataFrame(
        [(i, "a b c a b c") for i in range(3)],
        "doc_id long, text string",
    )
    rows = {(r["w1"], r["w2"]): r for r in skipgram_pmi(docs, window=3, min_count=3).collect()}
    # positions 1..6; pairs per doc within distance 3:
    # (a,b)x2 d1, (b,c)x2 d1, (c,a) d1; (a,c)x2 d2, (b,a) d2, (c,b) d2;
    # (a,a) d3, (b,b) d3, (c,c) d3 -> per doc 12 pairs, x3 docs
    assert rows[("a", "b")]["c_ab"] == 6
    assert rows[("a", "c")]["c_ab"] == 6
    assert rows[("c", "a")]["c_ab"] == 3
    assert rows[("a", "a")]["c_ab"] == 3
    assert all(r["c_a"] == 6 and r["c_b"] == 6 for r in rows.values())
    b_total = 12 * 3
    n = 18
    want = round(math.log2((6 / b_total) / ((6 / n) * (6 / n))), 4) + 0.0
    assert rows[("a", "b")]["pmi"] == want
    # floor: min_count above any planted pair count -> empty
    assert skipgram_pmi(docs, window=3, min_count=7).count() == 0
    # window=1 degenerates to adjacent-bigram pair counts
    rows1 = {(r["w1"], r["w2"]): r["c_ab"]
             for r in skipgram_pmi(docs, window=1, min_count=1).collect()}
    assert rows1 == {("a", "b"): 6, ("b", "c"): 6, ("c", "a"): 3}


def test_pmi_values_off_rounding_boundaries():
    """ADVICE r9 #1: the PMI oracles' bit-for-bit parity rests on
    ``round(log2(x), 4)`` agreeing between Spark (JVM Math.log, 1-ulp)
    and DuckDB (libm). Unlike the planted fixtures there is no
    constructed fence keeping pmi away from the 4dp HALF_UP boundary,
    so pin the empirical fence at the driver's check scale: every
    UNROUNDED pmi value at sf0.01 must sit > 1e-9 from a .00005
    boundary (i.e. the fractional part of |pmi|*1e4 stays > 1e-5 away
    from 0.5), where a 1-ulp log2 divergence (~1e-15 relative) cannot
    flip the rounded digit. Re-run against regenerated testdata each
    round — this is a data property, not a code property."""
    import duckdb

    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.01/{t}.parquet')"
        )
    for name in ("bigram_pmi_collocations", "skipgram_pmi_collocations"):
        sql = oracles[name]
        raw = sql.replace("round(log2", "(log2").replace(
            ", 4) + 0.0", ") + 0.0"
        )
        # the surgery must have bitten, or the fence is vacuously green
        # over already-rounded values
        assert raw != sql and "round(log2" not in raw, name
        vals = [
            r[0]
            for r in con.execute(f"SELECT pmi FROM ({raw}) s").fetchall()
        ]
        assert len(vals) >= 100, (name, len(vals))
        worst = min(abs((abs(v) * 1e4) % 1.0 - 0.5) for v in vals)
        assert worst > 1e-5, (
            f"{name}: a pmi value sits {worst:.2e} (scaled) from the 4dp "
            f"rounding boundary — cross-engine log2 ulp drift can flip it"
        )
    con.close()


def _dsir_py(docs, target_lang="en", n_buckets=256):
    """Independent pure-Python DSIR replication: ASCII \\S+ tokenize
    (Java regex \\S is ASCII — NOT Python's Unicode \\S), md5-fold
    bucket, add-half smoothed log2 ratio, micro-quantized half away
    from zero, exact int64 doc scores."""
    import hashlib
    import math
    import re

    tok_re = re.compile(r"[^ \t\n\x0b\f\r]+")

    def bucket(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % n_buckets

    c_t = [0] * n_buckets
    c_r = [0] * n_buckets
    toks = {}
    for doc_id, lang, text in docs:
        ts = tok_re.findall(text.lower())
        toks[doc_id] = ts
        for t in ts:
            b = bucket(t)
            c_r[b] += 1
            if lang == target_lang:
                c_t[b] += 1
    n_t, n_r = sum(c_t), sum(c_r)
    wq = []
    for b in range(n_buckets):
        num = (2 * c_t[b] + 1) * (2 * n_r + n_buckets)
        den = (2 * c_r[b] + 1) * (2 * n_t + n_buckets)
        lg = math.log2(num / den)
        q = math.floor(abs(lg) * 1_000_000 + 0.5)
        wq.append(q if lg >= 0 else -q)
    return wq, {
        d: (len(ts), sum(wq[bucket(t)] for t in ts))
        for d, ts in toks.items()
    }


def test_dsir_matches_pure_python_reference(spark):
    """Bit-for-bit differential: the distributed count → quantize →
    score pipeline against an independent replication, on a hand
    corpus with mixed languages, repeated tokens, and an empty doc."""
    from spendinganalysisetl_spark.catalog import local_table
    from spendinganalysisetl_spark.operators.trainprep import (
        dsir_bucket_stats,
        dsir_quantized_weights,
        dsir_scores,
    )

    docs = [
        (0, "en", "the cat sat on the mat the cat"),
        (1, "en", "quality text with diverse tokens here"),
        (2, "de", "der hund und die katze und der hund"),
        (3, "de", "schnelle braune fuchs springt"),
        (4, "fr", "le chat et le chien et le chat"),
        (5, "en", ""),
    ]
    df = local_table(spark, docs, "doc_id long, lang string, text string")
    rows = dsir_bucket_stats(df, "en", 256).collect()
    wq = dsir_quantized_weights(rows, 256)
    ref_wq, ref_scores = _dsir_py(docs)
    assert wq == ref_wq
    got = {
        r["doc_id"]: (r["n_tokens"], r["dsir_micro"])
        for r in dsir_scores(df, wq, 256).collect()
    }
    assert got == ref_scores
    # the fixture must witness signal: target docs should outscore
    # per-token the non-target ones on average, or it's defanged
    en = sum(got[d][1] for d in (0, 1)) / max(sum(got[d][0] for d in (0, 1)), 1)
    de = sum(got[d][1] for d in (2, 3)) / max(sum(got[d][0] for d in (2, 3)), 1)
    assert en > de


def test_dsir_weights_off_quantization_boundaries():
    """The one libm call in the DSIR pipeline is log2 per bucket; a
    1-ulp divergence between CPython's libm (which builds the Spark
    literal array) and DuckDB's (the oracle) could flip the micro-
    quantized integer exactly on a .5 boundary. Fence: at both local
    check scales, every |lg|*1e6 sits > 1e-6 from its rounding
    boundary (1 ulp of lg ~ 1e-16 relative — orders of magnitude
    inside the fence). Data property — re-runs against regenerated
    testdata every round."""
    import math

    import duckdb

    from spendinganalysisetl_spark.registry import (
        _DSIR_BUCKETS,
        hex_fold_sql,
    )

    # the synthetic corpus has a ~31-token vocabulary, so only ~30 of
    # the 256 buckets are populated at any scale — the fence covers
    # every weight that can actually be hit
    for sf, min_rows in (
        ("/root/testdata/sf0.001", 20),
        ("/root/testdata/sf0.01", 20),
    ):
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        fold = hex_fold_sql("md5(t)", 1, width=8)
        lgs = [
            r[0]
            for r in con.execute(f"""
WITH tok AS (
  SELECT lang, unnest(regexp_extract_all(lower(text), '\\S+', 0)) AS t
  FROM documents
), tb AS (
  SELECT CAST(({fold}) % {_DSIR_BUCKETS} AS INT) AS bk,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_t FROM tok
), cnt AS (
  SELECT bk, CAST(sum(is_t) AS BIGINT) AS c_t,
         CAST(count(*) AS BIGINT) AS c_r FROM tb GROUP BY bk
), tot AS (SELECT CAST(sum(c_t) AS BIGINT) AS n_t,
                  CAST(sum(c_r) AS BIGINT) AS n_r FROM cnt)
SELECT log2( CAST((2*c_t + 1) * (2*n_r + {_DSIR_BUCKETS}) AS DOUBLE)
           / CAST((2*c_r + 1) * (2*n_t + {_DSIR_BUCKETS}) AS DOUBLE) )
FROM cnt CROSS JOIN tot
""").fetchall()
        ]
        con.close()
        assert len(lgs) >= min_rows, (sf, len(lgs))
        worst = min(abs((abs(v) * 1e6) % 1.0 - 0.5) for v in lgs)
        assert worst > 1e-6, (
            f"{sf}: a DSIR weight sits {worst:.2e} (scaled) from the "
            f"micro-quantization boundary"
        )


def test_dsir_weights_memoized_per_session(spark):
    """The bucket-count scan runs once per (session, sf_dir) — bench
    reps 2+ reuse the collected weight list (the classifier train-once
    convention)."""
    from spendinganalysisetl_spark import registry

    registry._DSIR_MEMO.clear()
    w1 = registry._dsir_weights(spark, "/root/testdata/sf0.001")
    assert len(registry._DSIR_MEMO) == 1
    w2 = registry._dsir_weights(spark, "/root/testdata/sf0.001")
    assert w2 is w1


def _unimax_py(counts, budget, E):
    """Independent sequential water-filling reference (the literal
    UniMax loop, no closed form): ascending epoch-cap order, each
    language takes min(uniform share of remaining, E*N), leftover
    integer tokens go one-each to the first uncapped languages in
    canonical order."""
    langs = sorted(counts, key=lambda l: (E * counts[l], l))
    alloc, b_rem = {}, budget
    capped = {}
    for i, l in enumerate(langs):
        share = b_rem // (len(langs) - i)
        t = E * counts[l]
        if t <= share:
            alloc[l] = t
            capped[l] = 1
            b_rem -= t
        else:
            # uncapped suffix: equal integer split + remainder one-each
            suffix = langs[i:]
            base, rem = divmod(b_rem, len(suffix))
            for j, u in enumerate(suffix):
                alloc[u] = base + (1 if j < rem else 0)
                capped[u] = 0
            b_rem = 0
            break
    return alloc, capped


@pytest.mark.parametrize(
    "counts,num,den,E",
    [
        # mixed capped/uncapped with a remainder to distribute
        ({"aa": 10, "bb": 100, "cc": 1000, "dd": 7}, 3, 2, 2),
        # everything capped (budget >= sum of caps)
        ({"aa": 10, "bb": 20}, 10, 1, 2),
        # nothing capped (tiny budget)
        ({"aa": 50, "bb": 60, "cc": 70}, 1, 2, 2),
        # tie on cap_tokens -> lang tiebreak decides the remainder token
        ({"aa": 30, "bb": 30, "cc": 300}, 3, 2, 2),
    ],
)
def test_unimax_matches_sequential_reference(spark, counts, num, den, E):
    from spendinganalysisetl_spark.catalog import local_table
    from spendinganalysisetl_spark.operators.trainprep import (
        unimax_language_budgets,
    )

    rows, did = [], 0
    for lang, n in sorted(counts.items()):
        rows.append((did, lang, " ".join(["w"] * n)))
        did += 1
    df = local_table(spark, rows, "doc_id long, lang string, text string")
    got = {
        r["lang"]: r
        for r in unimax_language_budgets(
            df, budget_num=num, budget_den=den, max_epochs=E
        ).collect()
    }
    budget = sum(counts.values()) * num // den
    ref_alloc, ref_capped = _unimax_py(counts, budget, E)
    for lang in counts:
        assert got[lang]["alloc_tokens"] == ref_alloc[lang], (lang, dict(got[lang].asDict()))
        assert got[lang]["capped"] == ref_capped[lang], lang
        assert got[lang]["budget"] == budget
        assert got[lang]["cap_tokens"] == E * counts[lang]
    # exact budget conservation unless every language capped out
    total = sum(ref_alloc.values())
    if not all(ref_capped.values()):
        assert total == budget
    else:
        assert total == sum(E * n for n in counts.values()) <= budget
