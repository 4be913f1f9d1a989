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
