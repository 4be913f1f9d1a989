"""Time EVERY __spark_entry__.queries() entry once (noop sink) at a
given sf — the round-6 full-surface profiling sweep. Not a benchmark
(one rep, cache-warm order-dependent); used to find outliers.

Usage: python tools/time_all.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry  # noqa: E402
from glirel_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("time-all")
    out: dict[str, float] = {}
    for rep in range(reps):
        for name, fn in entry.queries().items():
            spark.sparkContext.setJobDescription(f"time_all r{rep}: {name}")
            t0 = time.perf_counter()
            try:
                fn(spark, sf).write.format("noop").mode("overwrite").save()
                dt = round(time.perf_counter() - t0, 3)
            except Exception as exc:  # noqa: BLE001
                print(f"ERROR {name}: {exc}", file=sys.stderr)
                dt = float("nan")
            out[name] = min(out.get(name, dt), dt)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
