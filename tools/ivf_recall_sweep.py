"""IVF recall sweep: recall@k vs brute force across (n_probe,
corpus_probe), to pick the shipped operating point (VERDICT r2 #6).

Pure-numpy replay of EXACTLY the engine's ranking semantics (the
DuckDB oracle already proves the Spark implementation equals this
replay bit-for-bit at the shipped point, so sweeping here is sweeping
the algorithm, not a lookalike): spherical-k-means centroids from
kmeans.fit_centroids (the same sample-fit), first-max cell
assignment, (score desc, cell asc) probe order, cosine ties broken by
neighbour id.

Usage: python tools/ivf_recall_sweep.py [sf_dir] — prints the
recall@ANN_TOP_K grid for the driver's query set (first
ANN_N_QUERIES ids) and for a wider 100-query set, then the chosen
point. Results are appended to BENCH/BASELINE.md by hand (the table is
committed prose, not a generated artifact).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from glirel_spark import config  # noqa: E402
from glirel_spark.operators.kmeans import fit_centroids  # noqa: E402


def load(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    vec_ids = np.asarray(t.column("vec_id"))
    order = np.argsort(vec_ids, kind="stable")
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)[order]
    return vec_ids[order], emb


def topcells(scores: np.ndarray, a: int) -> np.ndarray:
    """Top-a cells per row by (score desc, cell asc) — the engine's
    probe_cells_expr order (argsort on -score is stable, ties -> lower
    cell first)."""
    return np.argsort(-scores, axis=1, kind="stable")[:, :a]


def recall_at_k(vec_ids, emb, cents, n_probe, corpus_probe, n_q, k) -> float:
    nrm = np.linalg.norm(emb, axis=1)
    scores = emb @ cents.T
    corpus_cells = topcells(scores, corpus_probe)      # [N, A]
    q_idx = np.where(vec_ids < n_q)[0]
    hits = 0
    total = 0
    for qi in q_idx:
        cos = (emb @ emb[qi]) / (nrm * nrm[qi])
        cos[qi] = -np.inf
        order = np.lexsort((vec_ids, -cos))            # cosine desc, id asc
        exact = set(vec_ids[order[:k]])
        probe = set(topcells(scores[qi:qi + 1], n_probe)[0])
        cand = np.array([
            i for i in range(len(emb))
            if i != qi and not probe.isdisjoint(corpus_cells[i])
        ])
        if len(cand):
            c_cos = cos[cand]
            c_order = cand[np.lexsort((vec_ids[cand], -c_cos))][:k]
            got = set(vec_ids[c_order])
        else:
            got = set()
        hits += len(exact & got)
        total += k
    return hits / total


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    vec_ids, emb = load(sf_dir)
    cents = np.asarray(fit_centroids(sf_dir), dtype=np.float64)
    k = config.ANN_TOP_K
    print(f"{sf_dir}: N={len(emb)} d={emb.shape[1]} cells={len(cents)} "
          f"recall@{k}")
    for n_q, tag in ((config.ANN_N_QUERIES, "driver"), (100, "wide")):
        print(f"-- query set: first {n_q} ids ({tag})")
        print("n_probe\\corpus_probe " + " ".join(f"A={a}" for a in (1, 2, 3)))
        for np_ in (1, 2, 3, 4):
            row = [
                recall_at_k(vec_ids, emb, cents, np_, a, n_q, k)
                for a in (1, 2, 3)
            ]
            print(f"  n_probe={np_}:          "
                  + " ".join(f"{r:.3f}" for r in row))
    return 0


if __name__ == "__main__":
    sys.exit(main())
