"""Trained-IVF ANN (sample-fit spherical k-means + multi-probe).

Checks: deterministic fit, Spark cell assignment == the fit's own
numpy argmax rule, recall floor over the sign-bit IVF, and monotone
multi-probe recall. The value-level cross-engine check lives in the
driver oracle (oracle_corpus.q_ann_topk_kmeans).
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from glirel_spark.operators import kmeans, similarity
from glirel_spark.sources import tables

SF = "/root/testdata/sf0.001"


def test_fit_deterministic():
    a = kmeans.fit_centroids(SF)
    kmeans.fit_centroids.cache_clear()
    b = kmeans.fit_centroids(SF)
    assert a == b  # bit-identical across processes/imports
    assert len(a) > 0 and len(a[0]) == 64
    for c in a:  # unit-norm centroids (spherical k-means)
        assert abs(sum(v * v for v in c) - 1.0) < 1e-9
    # the persisted-index job stores centroids as JSON; the round trip
    # must be bit-exact so a later search job uses the SAME quantizer
    import json

    assert tuple(
        tuple(r) for r in json.loads(json.dumps([list(c) for c in a]))
    ) == a


def test_assignment_matches_numpy_argmax(spark):
    import pyarrow.parquet as pq

    cents = kmeans.fit_centroids(SF)
    cm = np.asarray(cents, dtype=np.float64)
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    vec_ids = np.asarray(t.column("vec_id"))
    scores = np.einsum("nd,kd->nk", emb, cm, optimize=False)
    expect = dict(zip(vec_ids.tolist(), np.argmax(scores, axis=1).tolist()))

    df = tables.TableIO(spark, SF).table("embeddings")
    got = dict(
        df.select(
            "vec_id",
            kmeans.assign_cell_expr(F.col("embedding"), cents).alias("cell"),
        ).collect()
    )
    # numpy einsum and Spark's left-fold dot may round differently only
    # if summation orders differed — they don't (both accumulate in
    # index order), so the argmax must agree exactly.
    assert got == expect


def test_recall_beats_signbit_and_multiprobe_monotone(spark):
    emb = tables.TableIO(spark, SF).table("embeddings")
    cents = kmeans.fit_centroids(SF)
    bf = {(r.q_id, r.n_id) for r in similarity.brute_force_topk(emb).collect()}
    sign = {(r.q_id, r.n_id) for r in similarity.ivf_topk(emb).collect()}
    rec = {}
    for p in (1, 2, 4):
        km = {
            (r.q_id, r.n_id)
            for r in kmeans.kmeans_ivf_topk(emb, cents, n_probe=p).collect()
        }
        rec[p] = len(bf & km) / len(bf)
    # trained quantizer beats fixed sign-bit cells at the default probe
    assert rec[2] > len(bf & sign) / len(bf)
    assert rec[2] >= 0.4  # measured 0.52 at sf0.001, 0.58 at sf0.1
    assert rec[1] <= rec[2] <= rec[4]  # multi-probe only adds candidates
    # corpus-side multi-assignment (2x index) strictly adds candidates
    km2 = {
        (r.q_id, r.n_id)
        for r in kmeans.kmeans_ivf_topk(emb, cents, corpus_probe=2).collect()
    }
    rec2 = len(bf & km2) / len(bf)
    assert rec2 >= rec[2]  # measured 0.78 vs 0.52 at sf0.001
    assert rec2 >= 0.6


def test_index_search_equals_direct_and_prunes(spark, tmp_path):
    emb = tables.TableIO(spark, SF).table("embeddings")
    cents = kmeans.fit_centroids(SF)
    path = str(tmp_path / "ivf_index")
    kmeans.build_index(emb, cents, path)
    idx = spark.read.parquet(path)
    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    out = kmeans.search_index(idx, qs, cents)
    direct = kmeans.kmeans_ivf_topk(emb, cents)
    assert {tuple(r) for r in out.collect()} == {
        tuple(r) for r in direct.collect()
    }
    # multi-assigned index == direct multi-assignment path
    path2 = str(tmp_path / "ivf_index2")
    kmeans.build_index(emb, cents, path2, corpus_probe=2)
    out2 = kmeans.search_index(spark.read.parquet(path2), qs, cents)
    direct2 = kmeans.kmeans_ivf_topk(emb, cents, corpus_probe=2)
    assert {tuple(r) for r in out2.collect()} == {
        tuple(r) for r in direct2.collect()
    }
    # the index scan must be partition-pruned to the probed cells via a
    # dynamic-pruning subquery on the broadcast join key — at 10^12 rows
    # this is what turns per-query cost from O(corpus) into O(probed cells)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression(cell" in plan


def test_no_python_udf_in_plan(spark):
    emb = tables.TableIO(spark, SF).table("embeddings")
    cents = kmeans.fit_centroids(SF)
    plan = kmeans.kmeans_ivf_topk(emb, cents)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # query side broadcast, corpus never shuffled for the join


def test_clustered_fixture_low_frac_high_recall(spark, tmp_path):
    """Round-3 VERDICT #4: on a CLUSTERED corpus (the shape real
    embedding corpora have, and the one IVF exists for) the trained
    quantizer reaches recall@5 >= 0.9 while scanning <= 0.2 of the
    corpus — measured through the actual Spark operator, with the
    scanned fraction replayed in numpy from the same fit.

    The driver testdata embeddings are near-uniform on the sphere; on
    them no quantizer is selective (documented in BENCH/BASELINE.md).
    This test pins the selectivity claim on the deterministic
    mixture-of-Gaussians fixture instead.
    """
    from glirel_spark.sources.fixtures import write_clustered_embeddings

    sf = write_clustered_embeddings(str(tmp_path / "clustered"))
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    cents = kmeans.fit_centroids(sf, n_cells=32)
    n_probe, corpus_probe, n_q, k = 3, 2, 50, 5

    bf = {
        (r.q_id, r.n_id)
        for r in similarity.brute_force_topk(emb, n_queries=n_q, k=k).collect()
    }
    km = {
        (r.q_id, r.n_id)
        for r in kmeans.kmeans_ivf_topk(
            emb, cents, n_queries=n_q, k=k,
            n_probe=n_probe, corpus_probe=corpus_probe,
        ).collect()
    }
    recall = len(bf & km) / len(bf)
    assert recall >= 0.9  # measured 0.958 on the wide set at this point

    # scanned candidate fraction, replayed in numpy from the SAME fit
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    vec_ids = np.asarray(t.column("vec_id"))
    order = np.argsort(vec_ids, kind="stable")
    x = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)[order]
    scores = x @ np.asarray(cents, dtype=np.float64).T
    corpus_cells = np.argsort(-scores, axis=1, kind="stable")[:, :corpus_probe]
    probe = np.argsort(-scores, axis=1, kind="stable")[:, :n_probe]
    scanned = 0
    for qi in range(n_q):
        qset = set(probe[qi])
        scanned += sum(
            1 for i in range(len(x))
            if i != qi and not qset.isdisjoint(corpus_cells[i])
        )
    frac = scanned / (n_q * len(x))
    assert frac <= 0.2  # measured 0.18
