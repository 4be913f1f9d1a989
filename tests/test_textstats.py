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


def test_bm25_topk_matches_python_replay(spark):
    """bm25_topk == an independent python replay of the integer BM25
    formula (rarest-term selection, bit-length idf, milli-quantized
    per-term contributions, (score desc, cand asc) ranking)."""
    from glirel_spark.operators.textstats import bm25_topk

    # doc 0 is the only query (mod 50); docs 1/2 share its rare terms,
    # doc 3 shares only the ubiquitous filler term
    rows = [
        (0, "apple banana cherry common common"),
        (1, "apple banana common common common"),
        (2, "cherry common common"),
        (3, "common common common common"),
        (50, "apple zebra common"),
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = [
        (r.q_doc, r.rank, r.cand_doc, r.score_milli, r.n_terms)
        for r in bm25_topk(docs, k=3).collect()
    ]

    # python replay
    toks = {i: t.split(" ") for i, t in rows}
    tf = {i: {} for i in toks}
    for i, ts in toks.items():
        for t in ts:
            tf[i][t] = tf[i].get(t, 0) + 1
    df = {}
    for i in tf:
        for t in tf[i]:
            df[t] = df.get(t, 0) + 1
    n_docs = len(toks)
    avgdl = sum(len(ts) for ts in toks.values()) // n_docs
    expect = []
    for q in (0, 50):
        qterms = sorted(tf[q], key=lambda t: (df[t], t))[:8]
        scores = {}
        for cand in tf:
            if cand == q:
                continue
            s, n = 0, 0
            for t in qterms:
                if t not in tf[cand]:
                    continue
                idf = n_docs.bit_length() - df[t].bit_length()
                c = tf[cand][t]
                s += (idf * 22 * c * avgdl * 1000) // (
                    10 * c * avgdl + 3 * avgdl + 9 * len(toks[cand])
                )
                n += 1
            if n:
                scores[cand] = (s, n)
        ranked = sorted(scores, key=lambda d: (-scores[d][0], d))[:3]
        expect += [
            (q, r + 1, d, scores[d][0], scores[d][1])
            for r, d in enumerate(ranked)
        ]
    assert sorted(got) == sorted(expect)
    assert any(q == 0 for q, *_ in got) and any(q == 50 for q, *_ in got)


def test_bpe_merges_overlap_and_tiebreak(spark):
    """Left-to-right non-overlapping merge ('aaaa' -> ['aa','aa'],
    'aaa' -> ['aa','a']) and the (count desc, left asc, right asc)
    tie-break, against a hand-computed trace."""
    from glirel_spark.operators.textstats import bpe_merges

    # one doc: 'aaaa' x2, 'aaa' x1  -> pair (a,a) dominates
    docs = spark.createDataFrame(
        [(1, "aaaa aaaa aaa", "en", "s", 13)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = [
        (r["round"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_merges(docs, rounds=3).collect()
    ]
    # round 1: (a,a) count = 3*2 (aaaa) + 2*1 (aaa) = 8
    assert got[0] == (1, "a", "a", "aa", 8)
    # after: aaaa -> [aa,aa,</w>], aaa -> [aa,a,</w>]
    # round 2 pairs: (aa,aa)=2, (aa,</w>)=2, (aa,a)=1, (a,</w>)=1
    # tie at 2 -> left asc: '</w>' < 'aa' is False ('<' char is 0x3c,
    # 'a' 0x61) -> ('aa','</w>') wins over ('aa','aa') by right asc
    assert got[1] == (2, "aa", "</w>", "aa</w>", 2)
    # after: aaaa -> [aa,aa</w>], aaa -> [aa,a,</w>]
    # round 3: (aa,aa</w>)=2 beats (aa,a)=1,(a,</w>)=1
    assert got[2] == (3, "aa", "aa</w>", "aaaa</w>", 2)


def test_corpus_mixture_largest_remainder(spark):
    """Hand-computed largest-remainder apportionment: targets sum to
    the budget exactly, absent domains surface their full deficit, and
    keep_bps is the integer rate hitting the quota."""
    from glirel_spark.operators.textstats import corpus_mixture

    docs = spark.createDataFrame(
        [(1, "x y", "a", "s", 3), (2, " ".join(["t"] * 10), "q", "s", 19)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # base = 3/3/3, remainders 3330/3330/3340 -> 'other' takes the +1
    got = {
        r["domain"]: (
            r["available_tokens"], r["target_tokens"], r["quota_tokens"],
            r["deficit_tokens"], r["keep_bps"],
        )
        for r in corpus_mixture(
            docs, budget=10,
            weights_bps={"a": 3333, "b": 3333, "other": 3334},
        ).collect()
    }
    assert got == {
        "a": (2, 3, 2, 1, 10000),
        "b": (0, 3, 0, 3, 0),
        "other": (10, 4, 4, 0, 4000),
    }
    assert sum(t for _, t, *_ in got.values()) == 10  # targets == budget


def test_bpe_token_counts_marker_exclusion(spark):
    """Applying the trained merges: fully-merged words count their one
    subword; a word left with a standalone '</w>' excludes the marker."""
    from glirel_spark.operators.textstats import bpe_token_counts

    docs = spark.createDataFrame(
        [(1, "aaaa aaaa aaa", "en", "s", 13)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # after 3 rounds: aaaa -> ['aaaa</w>'] (1), aaa -> ['aa','a','</w>'] (2)
    [r] = bpe_token_counts(docs, rounds=3).collect()
    assert (r.doc_id, r.n_words, r.bpe_tokens, r.est_tokens) == (1, 3, 4, 3)
    assert r.fertility_milli == 4000 // 3
