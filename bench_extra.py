"""Round-6 measurement harness (bench.py is FROZEN for the driver;
this file is the builder's own instrument).

Differences from bench.py, per the guide §1 and the round-5 noise
postmortem: queries run in INTERLEAVED cycles (A/B/A/B across the full
set, >= 3 cycles) so host drift hits every query evenly, and the raw
per-cycle arrays are emitted so a delta can be judged against the
cycle spread ("a delta is real only if it exceeds the spread").
Timing methodology is identical: noop sink, full materialization,
plan+execution included, session startup excluded.

Usage: python bench_extra.py [cycles] [query ...]
Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as bench.py)
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

BENCH_QUERIES = [
    "triples", "triples_neural", "coref_clusters", "threshold_search",
    "graph", "minhash_neardups", "simhash", "ann_topk", "ann_topk_kmeans",
    "doc_quality", "media_features", "events_sessionized",
]


def main() -> None:
    import __spark_entry__ as entry

    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or BENCH_QUERIES
    spark = get_spark("bench-extra", cores=CPUS)
    queries = entry.queries()
    samples: dict[str, list[float]] = {n: [] for n in names}
    t_all = time.perf_counter()
    for cycle in range(cycles + 1):  # cycle 0 = warmup (cache builds)
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra c{cycle}: {name}")
            t0 = time.perf_counter()
            queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            if cycle > 0:
                samples[name].append(dt)
    spark.sparkContext.setJobDescription(None)
    best = {n: min(v) for n, v in samples.items()}
    spread = {
        n: round(max(v) / max(min(v), 1e-9), 3) for n, v in samples.items()
    }
    result = {
        "metric": "bench_extra_interleaved_min_total",
        "value": round(sum(best.values()), 3),
        "unit": "sec",
        "queries": {n: best[n] for n in names},
        "per_rep": samples,
        "max_cycle_spread": round(max(spread.values()), 3),
        "spread": spread,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cpus": CPUS,
        "cycles": cycles,
        "wall_clock_total": round(time.perf_counter() - t_all, 3),
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
