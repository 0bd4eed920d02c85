

def test_gopher_flags_each_rule_isolated(spark):
    """Hand-planted docs that fail exactly one Gopher rule each (all
    other rules passing), plus one document passing everything — pins
    each flag's direction and the conjunction."""
    from spendinganalysisetl_spark.catalog import local_table
    from spendinganalysisetl_spark.operators.textanalysis import (
        gopher_quality_flags,
    )

    good_words = ("the quality of this and that have been with " * 7).split()
    docs = [
        # 0: passes everything (63 words, wordy, stopwords present)
        (0, " ".join(good_words)),
        # 1: too short (10 words) — word-count rule only
        (1, " ".join(good_words[:10]) + " the of and"),
        # 2: mean word length < 3 (single-char words), length >= 50
        (2, " ".join(["a"] * 60) + " the of"),
        # 3: symbol soup — '#' ratio > 0.1
        (3, " ".join(good_words[:50]) + " " + " ".join(["##"] * 10)),
        # 4: numeric soup — alpha-word fraction < 0.8
        (4, " ".join(good_words[:30]) + " " + " ".join(["123"] * 30)),
        # 5: no stopwords — two distinct never appear
        (5, " ".join(["alpha bravo charlie delta echo"] * 12)),
    ]
    got = {
        r["doc_id"]: r
        for r in gopher_quality_flags(
            local_table(spark, docs, "doc_id long, text string")
        ).collect()
    }
    assert got[0]["gopher_pass"] == 1
    failing_flag = {
        1: "flag_word_count",
        2: "flag_mean_word_len",
        3: "flag_symbol_ratio",
        4: "flag_alpha_words",
        5: "flag_stopwords",
    }
    all_flags = set(failing_flag.values())
    for did, flag in failing_flag.items():
        assert got[did][flag] == 0, (did, flag, got[did].asDict())
        assert got[did]["gopher_pass"] == 0
        for other in all_flags - {flag}:
            assert got[did][other] == 1, (did, other, got[did].asDict())


def test_gopher_flags_witness_both_outcomes_on_corpus(spark):
    """At the driver's check scale the rule pack must split the corpus
    (the min-words rule bisects the 10-99-word synthetic docs) — an
    all-pass or all-fail gate is a defanged oracle row."""
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["gopher_quality_flags"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    passes = sum(r["gopher_pass"] for r in rows)
    assert 0 < passes < len(rows), (passes, len(rows))
    # and each individual rule's flag must not be constant-zero across
    # the corpus (a never-passing rule = a vacuous conjunct), except
    # word count, which IS the intended splitter
    for flag in ("flag_mean_word_len", "flag_symbol_ratio",
                 "flag_alpha_words", "flag_stopwords"):
        assert sum(r[flag] for r in rows) > 0, flag


def test_stupid_backoff_matches_pure_python_reference(spark):
    """Bit-for-bit differential on a planted corpus that exercises all
    three Stupid Backoff branches: doc 0 is the train slice
    (doc_id % 20 == 0); doc 1 repeats train bigrams (pure MLE branch);
    doc 2 recombines train tokens into unseen bigrams (alpha-unigram
    branch); doc 3 carries a train-unseen token (uniform alpha^2/V
    floor). The reference replicates tokenization (ASCII \\S),
    counting, and the identical double expressions."""
    import math
    import re

    from spendinganalysisetl_spark.catalog import local_table
    from spendinganalysisetl_spark.operators.textanalysis import (
        stupid_backoff_ce,
    )

    docs = [
        (0, "the cat sat on the mat the cat ran"),   # train (0 % 20 == 0)
        (1, "the cat sat on the mat"),               # all bigrams seen
        (20, "mat the ran cat"),                     # unseen bigrams, seen tokens
        (3, "the zebra cat"),                        # 'zebra' unseen anywhere in train
    ]
    df = local_table(spark, docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in stupid_backoff_ce(df, train_mod=20).collect()
    }

    tok = re.compile(r"[^ \t\n\x0b\f\r]+")
    toks = {d: tok.findall(t.lower()) for d, t, in docs}
    train = [d for d in toks if d % 20 == 0]
    cb: dict = {}
    uni: dict = {}
    for d in train:
        ts = toks[d]
        for a, b in zip(ts, ts[1:]):
            cb[(a, b)] = cb.get((a, b), 0) + 1
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
    n_train = sum(uni.values())
    v_train = len(uni)
    alpha = 2 / 5
    for d, ts in toks.items():
        if len(ts) < 2:
            continue
        tot = 0.0
        pairs = {}
        for a, b in zip(ts, ts[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
        for (a, b), c in pairs.items():
            if (a, b) in cb:
                s = cb[(a, b)] / uni[a]
            elif b in uni:
                s = alpha * uni[b] / n_train
            else:
                s = alpha * alpha / v_train
            tot += c * math.log2(s)
        n = len(ts) - 1
        want = round(-tot / n, 4) + 0.0
        assert got[d]["n_pairs"] == n, d
        assert got[d]["bigram_ce"] == want, (d, got[d]["bigram_ce"], want)
    # branch witnesses: doc 1 scores better (lower CE) than doc 20's
    # backoff-heavy recombination, which scores better than doc 3's
    # unseen-token floor path
    assert got[1]["bigram_ce"] < got[20]["bigram_ce"] < got[3]["bigram_ce"]


def test_stupid_backoff_corpus_witnesses_backoff_branch(spark):
    """At the driver's check scale the 5% train slice must leave a real
    share of scored pair types on the alpha-unigram backoff (the CCNet
    arrangement's whole point) — if corpus regeneration ever saturates
    the bigram table again, this trips and the train_mod should
    shrink."""
    from pyspark.sql import functions as F

    from spendinganalysisetl_spark.catalog import load_table
    from spendinganalysisetl_spark.functions.text import ws_tokens

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    toks = docs.select("doc_id", ws_tokens(F.col("text")).alias("toks"))
    cnt = F.size("toks")
    pairs = (
        toks.filter(cnt >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), cnt - 1),
                    lambda i: F.struct(
                        F.element_at("toks", i).alias("w1"),
                        F.element_at("toks", i + 1).alias("w2"),
                    ),
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )
    dp = pairs.groupBy("doc_id", "w1", "w2").count()
    cb = (
        dp.filter((F.col("doc_id") % 20) == 0)
        .select("w1", "w2")
        .distinct()
    )
    joined = dp.join(cb, ["w1", "w2"], "left_anti")
    unseen = joined.count()
    total = dp.count()
    assert unseen > 0.05 * total, (unseen, total)
