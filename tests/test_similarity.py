"""Similarity search: brute-force exactness, IVF recall on
cell-coherent vectors, embedding near-dup blocking."""

from __future__ import annotations

import numpy as np

from glirel_spark.operators.similarity import (
    brute_force_topk,
    embedding_neardups,
    ivf_topk,
)


def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_exact(spark):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((30, 8)).astype(np.float32)
    df = _emb(spark, vecs)
    got = brute_force_topk(df, n_queries=3, k=2).collect()
    # numpy reference
    v = vecs.astype(np.float64)
    n = v / np.linalg.norm(v, axis=1, keepdims=True)
    sims = n @ n.T
    for q in range(3):
        order = [
            i for i in np.argsort(-sims[q], kind="stable") if i != q
        ][:2]
        mine = sorted(
            [(r.rk, r.n_id) for r in got if r.q_id == q]
        )
        assert [m[1] for m in mine] == [int(i) for i in order]


def test_ivf_full_recall_when_cells_align(spark):
    # vectors constructed so each query's true neighbours share its cell
    base = np.eye(8, dtype=np.float32)
    vecs = []
    for i in range(4):
        for j in range(5):
            v = base[i] + 0.01 * j * base[(i + 4) % 8]
            vecs.append(v)
    df = _emb(spark, vecs)
    bf = {(r.q_id, r.rk): r.n_id for r in brute_force_topk(df, 4, 3).collect()}
    ivf = {(r.q_id, r.rk): r.n_id for r in ivf_topk(df, 4, 3).collect()}
    assert bf == ivf  # same cell -> identical results


def test_embedding_neardups_blocked(spark):
    a = np.ones(8, dtype=np.float32)
    vecs = [a, a * 1.0001, -a]
    df = _emb(spark, vecs)
    out = {(r.v1, r.v2) for r in embedding_neardups(df, min_cosine=0.99).collect()}
    assert out == {(0, 1)}  # -a is in another cell AND anti-similar
