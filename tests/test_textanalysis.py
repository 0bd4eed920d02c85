

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
