"""Deterministic annotated-document fixtures (the sample.jsonl shape,
README.md:155-185 / FIXTURES.md §2) for zero-shot-split and parity
tests. No external data: corpus synthesized from a seeded RNG over the
engine's own gazetteer and label set.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession

ANNOTATED_SCHEMA = (
    "doc_id string, tokenized_text array<string>, "
    "ner array<struct<start:int, end:int, type:string, text:string>>, "
    "relations array<struct<"
    "head:struct<mention:string, position:array<int>, type:string>, "
    "tail:struct<mention:string, position:array<int>, type:string>, "
    "relation_id:string, relation_text:string>>"
)

_FILLER = ["the", "fast", "slow", "big", "small", "data", "row", "value"]
_ENTS = [("spark", "TOOL"), ("customer", "ACTOR"), ("table", "OBJECT"),
         ("query", "EVENT"), ("vector", "OBJECT"), ("window", "OBJECT")]


def make_annotated_docs(
    spark: SparkSession,
    n_docs: int = 60,
    n_labels: int = 30,
    seed: int = 42,
) -> DataFrame:
    """Docs with 2-4 entities and 1-3 relations drawn from n_labels
    synthetic relation types ('rel_00'..'rel_NN', Wikidata-style ids).
    Invariants guaranteed (utils.py:39-64): unique span positions, unique
    relation position pairs, endpoints ∈ ner."""
    rng = random.Random(seed)
    rows = []
    labels = [f"rel_{i:02d}" for i in range(n_labels)]
    for d in range(n_docs):
        n_ents = rng.randint(2, 4)
        ents = rng.sample(_ENTS, n_ents)
        tokens: list[str] = []
        ner = []
        for text, typ in ents:
            tokens.extend(rng.sample(_FILLER, rng.randint(1, 3)))
            start = len(tokens)
            tokens.append(text)
            ner.append((start, start, typ, text))  # end-inclusive
        tokens.extend(rng.sample(_FILLER, 2))
        pairs = [(i, j) for i in range(n_ents) for j in range(n_ents) if i != j]
        rng.shuffle(pairs)
        rels = []
        for i, j in pairs[: rng.randint(1, min(3, len(pairs)))]:
            h, t = ner[i], ner[j]
            lab = labels[rng.randrange(n_labels)]
            rels.append(
                (
                    (h[3], [h[0], h[1]], h[2]),
                    (t[3], [t[0], t[1]], t[2]),
                    f"P{labels.index(lab)}",
                    lab,
                )
            )
        rows.append((f"d{d:03d}", tokens, ner, rels))
    return spark.createDataFrame(rows, ANNOTATED_SCHEMA)


def clustered_embeddings_np(
    n: int = 2000,
    d: int = 64,
    n_clusters: int = 32,
    sigma: float = 0.18,
    seed: int = 20240817,
):
    """Deterministic mixture-of-Gaussians embedding corpus on the unit
    sphere: ``n_clusters`` seeded random unit centers, each point =
    normalize(center + sigma * gaussian noise). Returns (vec_ids int64,
    embeddings float32 [n, d], labels int32 = true cluster id).

    Why this exists (round-3 VERDICT #4): the driver's synthetic
    embeddings are near-uniform on the sphere, where NO coarse
    quantizer is selective — an IVF benchmark on them exercises the
    machinery but can't show the candidate-fraction win IVF exists
    for. Real embedding corpora cluster (that's why IVF works in
    production); this fixture is the deterministic stand-in that lets
    the recall/scanned-fraction trade be measured honestly.

    Query set convention matches the engine's ANN operators: the first
    ``ANN_N_QUERIES`` vec_ids. Points are assigned to clusters round-
    robin (vec_id % n_clusters) so the query set spans many clusters.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = (np.arange(n) % n_clusters).astype(np.int32)
    pts = centers[labels] + sigma * rng.standard_normal((n, d))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    return np.arange(n, dtype=np.int64), pts.astype(np.float32), labels


def write_clustered_embeddings(out_dir: str, **kw) -> str:
    """Write the clustered fixture as ``{out_dir}/embeddings.parquet``
    (same schema as the driver testdata: vec_id, embedding, label) so
    fit_centroids / the ANN operators / the recall sweep run on it
    unchanged. Returns out_dir."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    vec_ids, emb, labels = clustered_embeddings_np(**kw)
    os.makedirs(out_dir, exist_ok=True)
    t = pa.table(
        {
            "vec_id": pa.array(vec_ids, pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in emb], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(t, os.path.join(out_dir, "embeddings.parquet"))
    return out_dir
