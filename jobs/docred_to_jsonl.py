"""Cluster entry point for DocRED-array -> JSONL conversion:

    spark-submit --py-files glirel_spark.zip jobs/docred_to_jsonl.py \
        --input dev_revised.json --output out/dev_jsonl [--num-files 32]

DocRED-shaped corpora arrive as JSON ARRAY files (the reference's own
data/re-docred/data/*.json are this shape), which force an
unsplittable single-task multiLine parse per file. This job is the
documented production path (glirel_spark/sources/docred.py module
docstring): one conversion pass writes the corpus as JSONL — one
document per line — after which every downstream read is splittable.
Row-identity of the round trip is proven by
tests/test_docred.py::test_docred_to_jsonl_roundtrip.

Prints one JSON line: input/output doc counts (equal by construction)
and the output file count.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from glirel_spark.session import get_spark
from glirel_spark.sources import docred


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="DocRED JSON array file(s)")
    ap.add_argument("--output", required=True, help="JSONL output directory")
    ap.add_argument("--num-files", type=int, default=32)
    args = ap.parse_args(argv)

    spark = get_spark("docred_to_jsonl")
    n_in = docred.read_docred(spark, args.input).count()
    out = docred.docred_to_jsonl(
        spark, args.input, args.output, num_files=args.num_files
    )
    n_out = out.count()
    n_files = len([p for p in Path(args.output).glob("part-*") if p.suffix != ".crc"])
    print(json.dumps({"docs_in": n_in, "docs_out": n_out, "files": n_files}))
    spark.stop()


if __name__ == "__main__":
    main()
