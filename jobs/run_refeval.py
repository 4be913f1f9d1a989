"""Cluster entry point for the reference evaluation protocol:

    spark-submit --py-files glirel_spark.zip jobs/run_refeval.py \
        --input wiki_zsl_all.jsonl --output out/ [--threshold 0.5]

The exact loop the reference's eval.py / run_evaluation.py drive
(eval.py:236-263): load a reference-format JSONL file, take the
zero-shot label set from the file itself, score every candidate pair
with the tensor-plane scorer, threshold + top-1 decode, keep
predictions on annotated pairs only, and report micro/macro P/R/F1
against the file's gold relations. With exported real weights
(``GLIREL_NUMPY_CHECKPOINT`` + ``GLIREL_TOKENIZER_VOCAB``) this IS the
reference's WikiZSL/FewRel evaluation on its own data files.

Writes ``<output>/refeval_counts.parquet`` (per-label tp/pred_n/true_n)
and ``<output>/refeval_metrics.json`` (the six-metric row), and prints
the metrics as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from glirel_spark import config
from glirel_spark.plans import refeval
from glirel_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="reference-format JSONL")
    ap.add_argument("--output", required=True)
    ap.add_argument("--threshold", type=float, default=config.THRESHOLD)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    spark = get_spark("glirel-refeval", cores=args.cores)
    counts, metrics = refeval.evaluate_jsonl(spark, args.input, args.threshold)
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    counts.write.mode("overwrite").parquet(str(out / "refeval_counts.parquet"))
    row = metrics.collect()[0].asDict()
    (out / "refeval_metrics.json").write_text(json.dumps(row, indent=2))
    print(json.dumps(row))
    spark.stop()


if __name__ == "__main__":
    main()
