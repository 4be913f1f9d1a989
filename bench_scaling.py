"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

Sandbox stand-in for N vs 4N executors: the SAME flagship job
(documents -> triples -> linked graph, fully materialized) at local[8]
and local[32] on the same input. Each parallelism level runs in a fresh
JVM (subprocess) so thread pools, shuffle partitions, and memory fractions
are configured per level exactly as separate clusters would be.

Prints one JSON line and appends a row to BENCH/BASELINE.md:
  efficiency = (T_N / T_4N) / 4      (1.0 = perfect linear scaling)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Deterministic corpus replication: the sf0.1 corpus (5k docs) finishes
# in seconds, so wall time is overhead-bound and cannot evidence compute
# scaling. Replicating docs with offset ids (REPLICATE x) makes the same
# job compute-bound without external data; every replica flows through
# the identical plan.
REPLICATE = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICATE", "32"))

_JOB = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from glirel_spark.session import get_spark
from glirel_spark.operators import decode as decode_ops
from glirel_spark.operators import fused, linking, scoring
from glirel_spark.operators import graph as graph_ops
from glirel_spark.sources import tables

spark = get_spark("scaling-{cores}", cores={cores})
flat = spark.read.parquet({sf_dir!r} + "/documents.parquet")
reps = [
    flat.withColumn("doc_id", F.col("doc_id") + F.lit(k * 1000000))
    for k in range({replicate})
]
big = reps[0]
for r in reps[1:]:
    big = big.unionByName(r)
# spread the single-file input across the worker threads (a real
# corpus arrives in thousands of splits; see pipeline.interleaved)
big = big.repartition({cores} * 2)
inter = tables.interleaved_documents(big)
# materialize token arrays (see pipeline.interleaved docstring): lambdas
# indexing alias-expression arrays re-evaluate the chain per element
dt = tables.text_of(inter).select(
    "doc_id", F.split("text", " ").alias("tokens")).cache()

def job():
    rel = fused.pairs_fused(dt).filter("is_rel")
    scored = scoring.score_pairs_lexical(rel, scoring.labels_df(spark))
    triples = decode_ops.decode(scored)
    linked = linking.link_triples(triples, linking.alias_df(spark))
    graph_ops.materialize_graph(linked).write.format("noop").mode("overwrite").save()

# warmup run: JIT-compile the codegen'd stages and build the token cache
# (a production cluster is long-running; cold-JVM startup is not the
# quantity the scaling criterion measures)
job()
t0 = time.perf_counter()
job()
elapsed = time.perf_counter() - t0
n_docs = big.count()
spark.stop()
print(json.dumps({{"cores": {cores}, "sec": elapsed, "n_docs": n_docs}}))
"""


def run_level(cores: int) -> dict:
    code = _JOB.format(repo=str(REPO), cores=cores, sf_dir=SF_DIR,
                       replicate=REPLICATE)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    lo = run_level(8)
    hi = run_level(32)
    eff = (lo["sec"] / hi["sec"]) / 4.0
    result = {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "t_local8_sec": round(lo["sec"], 3),
        "t_local32_sec": round(hi["sec"], 3),
        "docs_per_sec_local8": round(lo["n_docs"] / lo["sec"], 1),
        "docs_per_sec_local32": round(hi["n_docs"] / hi["sec"], 1),
        "n_docs": lo["n_docs"],
        "sf_dir": SF_DIR,
    }
    print(json.dumps(result))
    bench_md = REPO / "BENCH" / "BASELINE.md"
    bench_md.parent.mkdir(exist_ok=True)
    if not bench_md.exists():
        bench_md.write_text(
            "# BENCH/BASELINE — measured throughput & scaling\n\n"
            "Flagship job: documents -> mentions -> pairs -> scored -> "
            "triples -> linked graph (fully materialized, noop sink).\n"
            "Sandbox cluster-size stand-in: local[8] vs local[32], fresh "
            "JVM each (BASELINE.json: efficiency >= 0.8 target).\n\n"
            "| sf_dir | n_docs | local[8] s | local[32] s | docs/s @8 | "
            "docs/s @32 | efficiency |\n|---|---|---|---|---|---|---|\n"
        )
    with bench_md.open("a") as f:
        f.write(
            f"| {SF_DIR} | {result['n_docs']} | {result['t_local8_sec']} | "
            f"{result['t_local32_sec']} | {result['docs_per_sec_local8']} | "
            f"{result['docs_per_sec_local32']} | {result['value']} |\n"
        )


if __name__ == "__main__":
    main()
