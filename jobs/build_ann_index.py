"""Cluster entry point: spark-submit --py-files glirel_spark.zip \
    jobs/build_ann_index.py --input <sf_dir> --output <index_dir> \
    [--queries N --topk K --nprobe P --search-out <dir>]

Builds the trained-IVF ANN index (sample-fit spherical k-means
quantizer, corpus written partitioned BY CELL) and optionally runs a
multi-probe search against it. The search plan reads only the probed
cells' files via dynamic partition pruning — the build-once /
query-many shape for a 10^12-row embedding corpus. The fitted
centroids are persisted next to the index so later search jobs skip
the fit and are guaranteed the SAME quantizer the index was built with.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from glirel_spark import config
from glirel_spark.operators import kmeans
from glirel_spark.session import get_spark
from glirel_spark.sources import tables


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--queries", type=int, default=0,
                    help="search the first N vec_ids after building (0 = build only)")
    ap.add_argument("--topk", type=int, default=config.ANN_TOP_K)
    ap.add_argument("--nprobe", type=int, default=config.IVF_KM_NPROBE)
    ap.add_argument("--corpus-probe", type=int, default=1,
                    help="index each vector under its top-A cells (A x size, higher recall)")
    ap.add_argument("--search-out", default=None)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    spark = get_spark("build-ann-index", cores=args.cores)
    t0 = time.perf_counter()

    cents = kmeans.fit_centroids(args.input)
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    (out / "centroids.json").write_text(json.dumps([list(c) for c in cents]))

    emb = tables.TableIO(spark, args.input).table("embeddings")
    kmeans.build_index(emb, cents, str(out / "cells"), corpus_probe=args.corpus_probe)
    t_build = time.perf_counter() - t0

    result = {"index": str(out / "cells"), "n_cells": len(cents),
              "build_sec": round(t_build, 3)}

    if args.queries:
        cents = tuple(
            tuple(row) for row in json.loads((out / "centroids.json").read_text())
        )
        idx = spark.read.parquet(str(out / "cells"))
        qs = emb.filter(F.col("vec_id") < args.queries).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
        )
        t1 = time.perf_counter()
        hits = kmeans.search_index(idx, qs, cents, k=args.topk, n_probe=args.nprobe)
        if args.search_out:
            hits.write.mode("overwrite").parquet(args.search_out)
            result["search_out"] = args.search_out
        result["search_rows"] = hits.count()
        result["search_sec"] = round(time.perf_counter() - t1, 3)

    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
