"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full materialization with the noop sink (count()
would let Catalyst skip projected columns). Times include plan +
execution, excluding session startup.
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
    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name in BENCH_QUERIES:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    total = round(time.perf_counter() - t_all, 3)

    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    flagship = timings["triples"]
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "n_docs": n_docs,
        "flagship_docs_per_sec": round(n_docs / flagship, 1) if flagship else None,
        "cpus": CPUS,
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
