"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full materialization with the noop sink (count()
would let Catalyst skip projected columns). Times include plan +
execution, excluding session startup.

Contention discipline (round-4): each query runs REPS times (default 2)
and reports the MIN — two rounds in a row the committed single-shot
artifact was distorted by a contended box (r3: 73.7s committed vs 47.8s
measured idle). ``value`` is the sum of per-query minima (the engine's
repeatable cost); ``rep1_total`` preserves the old single-pass
semantics (includes one-time cache builds) for cross-round trend
comparison, and ``wall_clock_total`` is the whole run.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from glirel_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))

# headline set: flagship pipeline + one per operator family
BENCH_QUERIES = [
    "triples",            # flagship extraction (lexical scorer)
    "triples_neural",     # tensor-plane scorer via mapInPandas
    "coref_clusters",     # union-find clustering
    "threshold_search",   # eval replay over the whole grid
    "graph",              # linking + salted materialization
    "minhash_neardups",   # LSH dedup
    "simhash",            # simhash signatures
    "ann_topk",           # brute-force cosine top-k
    "ann_topk_kmeans",    # trained-IVF multi-probe ANN (scale path)
    "doc_quality",        # text stats scan
    "media_features",     # multimodal mapInPandas
    "events_sessionized", # window sessionization
]


def main() -> None:
    import __spark_entry__ as entry

    spark = get_spark("bench", cores=CPUS)
    queries = entry.queries()
    best: dict[str, float] = {}
    rep1: dict[str, float] = {}
    t_all = time.perf_counter()
    for rep in range(REPS):
        for name in BENCH_QUERIES:
            fn = queries[name]
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            if rep == 0:
                rep1[name] = dt
            best[name] = min(best.get(name, dt), dt)
    wall = round(time.perf_counter() - t_all, 3)
    total = round(sum(best.values()), 3)

    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    flagship = best["triples"]
    result = {
        # min-of-REPS per query (warm protocol); rep1_total below preserves
        # the cold single-pass protocol used through round 3 for
        # cross-round comparison.
        "metric": "headline_queries_min_total",
        "value": total,
        "unit": "sec",
        "queries": best,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "n_docs": n_docs,
        "flagship_docs_per_sec": round(n_docs / flagship, 1) if flagship else None,
        "cpus": CPUS,
        "reps": REPS,
        "rep1_total": round(sum(rep1.values()), 3),
        "rep1_queries": rep1,
        "wall_clock_total": wall,
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
