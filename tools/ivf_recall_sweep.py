"""IVF recall sweep: recall@k vs brute force across (n_probe,
corpus_probe), to pick the shipped operating point (VERDICT r2 #6).

Pure-numpy replay of EXACTLY the engine's ranking semantics (the
DuckDB oracle already proves the Spark implementation equals this
replay bit-for-bit at the shipped point, so sweeping here is sweeping
the algorithm, not a lookalike): spherical-k-means centroids from
kmeans.fit_centroids (the same sample-fit), first-max cell
assignment, (score desc, cell asc) probe order, cosine ties broken by
neighbour id.

Usage:
  python tools/ivf_recall_sweep.py [sf_dir]        # driver testdata
  python tools/ivf_recall_sweep.py --clustered [n_cells]
    # the deterministic mixture-of-Gaussians fixture
    # (sources/fixtures.clustered_embeddings_np) written to a temp dir
    # — the corpus where IVF's selectivity is actually measurable
    # (round-3 VERDICT #4: the driver embeddings are near-uniform, so
    # every quantizer there scans most of the corpus for high recall).

Each grid cell prints recall@ANN_TOP_K AND the scanned candidate
fraction (mean |candidate set| / N over queries) — the cost axis the
recall is bought with. Results are appended to BENCH/BASELINE.md by
hand (the table is committed prose, not a generated artifact).
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


def recall_at_k(vec_ids, emb, cents, n_probe, corpus_probe, n_q, k):
    """-> (recall@k, scanned candidate fraction)."""
    nrm = np.linalg.norm(emb, axis=1)
    scores = emb @ cents.T
    corpus_cells = topcells(scores, corpus_probe)      # [N, A]
    q_idx = np.where(vec_ids < n_q)[0]
    hits = 0
    total = 0
    scanned = 0
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
        scanned += len(cand)
        if len(cand):
            c_cos = cos[cand]
            c_order = cand[np.lexsort((vec_ids[cand], -c_cos))][:k]
            got = set(vec_ids[c_order])
        else:
            got = set()
        hits += len(exact & got)
        total += k
    return hits / total, scanned / (len(q_idx) * len(emb))


def main() -> int:
    args = sys.argv[1:]
    if args and args[0] == "--clustered":
        import tempfile

        from glirel_spark.sources.fixtures import write_clustered_embeddings

        n_cells = int(args[1]) if len(args) > 1 else 32
        sf_dir = write_clustered_embeddings(
            tempfile.mkdtemp(prefix="clustered_emb_")
        )
        tag_dir = f"clustered fixture (32 true clusters, cells={n_cells})"
    else:
        sf_dir = args[0] if args else "/root/testdata/sf0.1"
        n_cells = config.IVF_KM_CELLS
        tag_dir = sf_dir
    vec_ids, emb = load(sf_dir)
    cents = np.asarray(fit_centroids(sf_dir, n_cells=n_cells), dtype=np.float64)
    k = config.ANN_TOP_K
    print(f"{tag_dir}: N={len(emb)} d={emb.shape[1]} cells={len(cents)} "
          f"recall@{k} (frac = scanned candidate fraction)")
    for n_q, tag in ((config.ANN_N_QUERIES, "driver"), (100, "wide")):
        print(f"-- query set: first {n_q} ids ({tag})")
        print("n_probe\\corpus_probe " + "  ".join(f"A={a}" for a in (1, 2, 3)))
        for np_ in (1, 2, 3, 4, 6):
            row = [
                recall_at_k(vec_ids, emb, cents, np_, a, n_q, k)
                for a in (1, 2, 3)
            ]
            print(f"  n_probe={np_}:  "
                  + "  ".join(f"{r:.3f}@{f:.2f}" for r, f in row))
    return 0


if __name__ == "__main__":
    sys.exit(main())
