"""Stratified sampling: deterministic keep decision (pure function of
(doc_id, lang)), per-stratum rates, python-replicated hash golden."""

from __future__ import annotations

from glirel_spark import config
from glirel_spark.operators.textstats import (
    _SAMPLE_SALT,
    SAMPLE_RATES_BPS,
    stratified_sample,
)


def _phash(s: str) -> int:
    a = 0
    for ch in s:
        a = (a * config.SHINGLE_BASE + ord(ch)) % config.HASH_P
    return a


def _expected(doc_id: str, lang: str, default_bps: int = 500):
    bucket = _phash(f"{_SAMPLE_SALT}{doc_id}:{lang}") % 10_000
    rate = SAMPLE_RATES_BPS.get(lang, default_bps)
    return bucket, rate, bucket < rate


def test_stratified_sample_matches_python_hash_and_is_deterministic(spark):
    rows = [(i, f"t{i}", lang) for i, lang in enumerate(
        ["en", "de", "fr", "es", "zh"] * 40
    )]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r.doc_id: (r.bucket, r.rate_bps)
        for r in stratified_sample(docs).collect()
    }
    # keep set == python replay, buckets/rates exact
    for i, _, lang in rows:
        bucket, rate, keep = _expected(str(i), lang)
        if keep:
            assert got[str(i)] == (bucket, rate), (i, lang)
        else:
            assert str(i) not in got
    # rerun -> identical rows (pure function, no RNG)
    again = {
        r.doc_id: (r.bucket, r.rate_bps)
        for r in stratified_sample(docs).collect()
    }
    assert again == got
    # en keeps more than zh (5000 vs default 500 bps) on this corpus
    en = sum(1 for i, _, lg in rows if lg == "en" and str(i) in got)
    zh = sum(1 for i, _, lg in rows if lg == "zh" and str(i) in got)
    assert en > zh


def test_corpus_stats_rollup(spark):
    from glirel_spark.operators.textstats import corpus_stats

    docs = spark.createDataFrame(
        [
            (1, "a b", "en", "s1", 3),
            (2, "c", "en", "s2", 1),
            (3, "d e f", "de", "s1", 5),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {
        (r.lang, r.source): (r.n_docs, r.total_chars, r.total_tokens, r.gid)
        for r in corpus_stats(docs).collect()
    }
    assert rows[("en", "s1")] == (1, 3, 2, 0)
    assert rows[("en", None)] == (2, 4, 3, 1)   # per-lang subtotal
    assert rows[(None, None)] == (3, 9, 6, 3)   # grand total
    assert len(rows) == 6


def test_doc_top_terms_hand_computed(spark):
    from glirel_spark.operators.textstats import doc_top_terms

    docs = spark.createDataFrame(
        [("a", "x x y z"), ("b", "x q"), ("c", "q q q")],
        "doc_id string, text string",
    )
    # N=3; df: x=2, y=1, z=1, q=2
    # doc a scores: x: 2*3/2=3.0, y: 1*3/1=3.0, z: 3.0 -> tie broken by term asc
    out = doc_top_terms(docs, k=2).collect()
    got = {(r.doc_id, r.rank): (r.term, r.tf, r.df, r.score) for r in out}
    assert got[("a", 1)] == ("x", 2, 2, 3.0)
    assert got[("a", 2)] == ("y", 1, 1, 3.0)
    assert got[("b", 1)] == ("q", 1, 2, 1.5)  # x ties at 1.5, q wins by term
    assert got[("b", 2)] == ("x", 1, 2, 1.5)
    assert got[("c", 1)] == ("q", 3, 2, 4.5)
    assert len(got) == 5  # doc c has a single distinct term


def test_gopher_rules_hand_computed(spark):
    from glirel_spark.operators.textstats import doc_gopher_rules

    good = " ".join(["the", "cat", "and", "dog"] + [f"word{i}" for i in range(60)])
    repeated = " ".join(["the", "a"] + ["spam"] * 60)
    short = "the a tiny doc"
    numeric = " ".join(["the", "of"] + ["123"] * 58)
    docs = spark.createDataFrame(
        [("g", good), ("r", repeated), ("s", short), ("n", numeric)],
        "doc_id string, text string",
    )
    got = {r.doc_id: r for r in doc_gopher_rules(docs).collect()}

    g = got["g"]
    assert g.n_words == 64
    assert g.sum_word_chars == len(good) - 63
    assert g.n_alpha_words == 64 and g.r_alpha
    assert g.n_stop_kinds == 2 and g.r_stopwords  # the, and
    assert g.top_word_n == 1 and g.r_repetition
    assert g.pass_gopher

    r = got["r"]
    assert r.top_word_n == 60 and not r.r_repetition  # 60/62 > 20%
    assert not r.pass_gopher

    s = got["s"]
    assert s.n_words == 4 and not s.r_word_count
    assert not s.pass_gopher

    n = got["n"]
    # 2 alpha words of 60 -> fails the 80%-alpha rule
    assert n.n_alpha_words == 2 and not n.r_alpha
    assert not n.pass_gopher


def test_doc_surprisal_hand_computed(spark):
    from glirel_spark.operators.textstats import doc_surprisal

    docs = spark.createDataFrame(
        [("a", "x x y"), ("b", "x z")], "doc_id string, text string"
    )
    # total=5 tokens (bitlen 3); counts x=3 (bitlen 2), y=1, z=1 (bitlen 1)
    # bits: x -> 1, y -> 2, z -> 2
    got = {r.doc_id: r for r in doc_surprisal(docs).collect()}
    a, b = got["a"], got["b"]
    assert (a.n_tokens, a.sum_surprisal_bits) == (3, 4)
    assert a.mean_surprisal_bits == 4 / 3
    assert (b.n_tokens, b.sum_surprisal_bits) == (2, 3)
    assert b.mean_surprisal_bits == 1.5


def test_vocab_coverage_curve(spark):
    from glirel_spark.operators import textstats

    docs = spark.createDataFrame(
        [(1, "a a a a b b c d")], "doc_id long, text string"
    )
    out = {
        r["vocab_k"]: (r["n_covered"], r["n_total"], r["coverage_milli"])
        for r in textstats.vocab_coverage(docs, ks=[1, 2, 4]).collect()
    }
    assert out == {1: (4, 8, 500), 2: (6, 8, 750), 4: (8, 8, 1000)}
