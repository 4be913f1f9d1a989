"""Tensor-plane scorer: determinism, pair-ordering contract parity with
the relational J1, label-rep caching, decode integration."""

from __future__ import annotations

import numpy as np

from glirel_spark.model.scorer import DeterministicGLiREL
from glirel_spark.model.udf import neural_triples, score_pairs_neural
from glirel_spark.operators.mentions import extract_mentions
from glirel_spark.operators.pairs import generate_pairs


def test_scorer_deterministic_across_instances():
    a, b = DeterministicGLiREL(), DeterministicGLiREL()
    spans = np.array([[0, 0], [2, 2], [3, 4], [5, 6]])  # [5,6] invalid -> P4-masked
    toks = "spark feeds the table scan today".split()
    labels = ("feeds", "used by")
    pa, sa = a.score_doc(toks, spans, labels, 8)
    pb, sb = b.score_doc(toks, spans, labels, 8)
    assert np.array_equal(pa, pb) and np.allclose(sa, sb, atol=0)


def test_bilstm_batch_equals_single_and_is_bidirectional():
    m = DeterministicGLiREL.get()
    rng = np.random.default_rng(0)
    docs = [rng.standard_normal((n, 32)) for n in (7, 1, 100, 3, 0, 55)]
    batch = m.encode_batch(docs)
    for e, b in zip(docs, batch):
        assert b.shape == e.shape
        # any batch composition yields the doc's standalone bits — the
        # invariant gen_golden.py's per-doc replay relies on
        assert np.array_equal(m.encode_batch([e])[0], b)
    x = rng.standard_normal((10, 32))
    y = x.copy()
    y[9] += 1.0
    # T8 is a real bidirectional recurrence: the LAST token must change
    # the FIRST position's rep (window-mean or forward-only would not)
    assert not np.array_equal(m.encode_batch([x])[0][0], m.encode_batch([y])[0][0])


def test_checkpoint_pluggable_weights(tmp_path, monkeypatch):
    base = DeterministicGLiREL()
    path = tmp_path / "ckpt.npz"
    w = np.zeros_like(base.lstm_fwd_Wx)
    np.savez(path, lstm_fwd_Wx=w)
    monkeypatch.setenv("GLIREL_NUMPY_CHECKPOINT", str(path))
    loaded = DeterministicGLiREL()
    assert np.array_equal(loaded.lstm_fwd_Wx, w)
    assert np.array_equal(loaded.W_pair, base.W_pair)  # others keep seeded init
    np.savez(path, lstm_fwd_Wx=np.zeros((3, 3)))
    import pytest

    with pytest.raises(ValueError, match="shape"):
        DeterministicGLiREL()
    monkeypatch.delenv("GLIREL_NUMPY_CHECKPOINT")


def test_pair_indices_match_reference_contract():
    # row-major i!=j (test_rel_rep.py golden shape)
    starts = np.array([1, 2, 3])
    idx = DeterministicGLiREL.pair_indices(3, starts, None)
    assert idx.tolist() == [[0, 1], [0, 2], [1, 0], [1, 2], [2, 0], [2, 1]]
    idx_d = DeterministicGLiREL.pair_indices(3, np.array([0, 5, 100]), 8)
    assert idx_d.tolist() == [[0, 1], [1, 0]]


def test_udf_pairs_match_relational_j1(spark):
    docs = spark.createDataFrame(
        [("d0", "spark query table scan window spark".split(" "))],
        "doc_id string, tokens array<string>",
    )
    m = extract_mentions(docs, spark)
    rel = {
        (r.h_start, r.h_end, r.t_start, r.t_end)
        for r in generate_pairs(m).filter("is_rel").collect()
    }
    udf_pairs = {
        (r.h_start, r.h_end, r.t_start, r.t_end)
        for r in score_pairs_neural(docs, m).select(
            "h_start", "h_end", "t_start", "t_end"
        ).distinct().collect()
    }
    assert rel == udf_pairs


def test_neural_triples_decode_integration(spark):
    docs = spark.createDataFrame(
        [("d0", "spark query table scan window customer".split(" "))],
        "doc_id string, tokens array<string>",
    )
    m = extract_mentions(docs, spark)
    out = neural_triples(docs, m, threshold=0.5, top_k=1)
    rows = out.collect()
    assert all(0.5 < r.prob <= 1.0 for r in rows)
    # top_k=1: at most one label per position pair
    keys = [(r.head_start, r.head_end, r.tail_start, r.tail_end) for r in rows]
    assert len(keys) == len(set(keys))
    # output convention: exclusive end
    assert all(r.head_end > r.head_start for r in rows)

def test_out_of_range_span_positions_map_correctly(spark):
    """P4 regression: when a mention's end exceeds the token sequence,
    the UDF must drop it BEFORE mapping pair indices back to span rows —
    otherwise every later span's positions shift (the round-1 latent
    bug: indices into the unfiltered array)."""
    docs = spark.createDataFrame(
        [("d0", "spark query table".split(" "))],
        "doc_id string, tokens array<string>",
    )
    # phantom span (9,9) sorts FIRST in no... actually sorts last; use
    # (1,9): sorts between (0,0) and (2,2) so a stale index would shift
    # the (2,2) mention's reported positions.
    m = spark.createDataFrame(
        [("d0", 0, 0, 0, "TOOL", "spark"),
         ("d0", 1, 1, 9, "EVENT", "broken"),
         ("d0", 2, 2, 2, "OBJECT", "table")],
        "doc_id string, m_id int, start int, end int, type string, text string",
    )
    out = score_pairs_neural(docs, m).select(
        "h_start", "h_end", "t_start", "t_end"
    ).distinct().collect()
    got = {(r.h_start, r.h_end, r.t_start, r.t_end) for r in out}
    # only the two valid spans pair up; no position may reference (1,9)
    assert got == {(0, 0, 2, 2), (2, 2, 0, 0)}


def test_udf_scores_match_direct_score_doc(spark):
    """The batched/factorized embedding path must be BIT-identical to
    the per-doc encode path (same kernel, different batching)."""
    toks = "spark feeds the table scan near customer query".split(" ")
    docs = spark.createDataFrame(
        [("d0", toks)], "doc_id string, tokens array<string>"
    )
    m = extract_mentions(docs, spark)
    rows = score_pairs_neural(docs, m).collect()
    model = DeterministicGLiREL()
    sp = np.asarray(
        sorted((r.start, r.end) for r in m.collect()), dtype=np.int64
    ).reshape(-1, 2)
    from glirel_spark import config

    labels = tuple(sorted(config.RELATION_LABELS))
    pidx, probs = model.score_doc(toks, sp, labels, 8)
    expect = {}
    for pi in range(len(pidx)):
        hs, he = sp[pidx[pi, 0]]
        ts, te = sp[pidx[pi, 1]]
        for ci, lab in enumerate(labels):
            expect[(hs, he, ts, te, lab)] = probs[pi, ci]
    assert len(rows) == len(expect)
    for r in rows:
        assert r.prob == expect[(r.h_start, r.h_end, r.t_start, r.t_end, r.label)]


def test_per_example_label_sets(spark):
    """fixed_relation_types: false (base.py:327-339): each document
    brings its OWN relation vocabulary; scores must equal the per-doc
    score_doc replay with exactly that label set."""
    from glirel_spark import config

    d0_labs = ["feeds", "used by"]
    d1_labs = ["runs on"]
    docs = spark.createDataFrame(
        [("d0", "spark feeds the table".split(" "), d0_labs),
         ("d1", "table scan runs on spark".split(" "), d1_labs)],
        "doc_id string, tokens array<string>, labels array<string>",
    )
    m = spark.createDataFrame(
        [("d0", 0, 0, "TOOL", "spark"), ("d0", 3, 3, "OBJECT", "table"),
         ("d1", 0, 1, "ALGO", "table scan"), ("d1", 4, 4, "TOOL", "spark")],
        "doc_id string, start int, end int, type string, text string",
    )
    rows = score_pairs_neural(docs, m, labels_col="labels").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.label)
    assert by_doc["d0"] == set(d0_labs)
    assert by_doc["d1"] == set(d1_labs)
    model = DeterministicGLiREL()
    toks1 = "table scan runs on spark".split(" ")
    sp1 = np.array([[0, 1], [4, 4]])
    pidx, probs = model.score_doc(
        toks1, sp1, tuple(d1_labs), config.MAX_PAIR_DISTANCE
    )
    expect = {}
    for pi in range(len(pidx)):
        hs, he = sp1[pidx[pi, 0]]
        ts, te = sp1[pidx[pi, 1]]
        expect[(hs, he, ts, te)] = probs[pi, 0]
    got = {(r.h_start, r.h_end, r.t_start, r.t_end): r.prob
           for r in rows if r.doc_id == "d1"}
    assert got == expect
