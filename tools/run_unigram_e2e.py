"""End-to-end proof of the real-tokenizer seam: run the FULL neural
path (pipeline.triples_neural's exact plan) with an exported
sentencepiece-unigram vocabulary active via ``GLIREL_TOKENIZER_VOCAB``,
and cross-check the Spark result against the outside-Spark replay
(tools/gen_golden.py) computed with the same vocabulary.

The environment variable must be set BEFORE this process starts so
the Spark JVM — and therefore every executor python worker — inherits
it (the same channel a cluster run uses via
``spark.executorEnv.GLIREL_TOKENIZER_VOCAB`` / ``--conf``):

    GLIREL_TOKENIZER_VOCAB=vocab.json \\
        python tools/run_unigram_e2e.py [sf_dir] [n_docs]

With a REAL exported pair (vocab.json from tools/export_tokenizer.py
+ weights.npz from tools/export_weights.py via
``GLIREL_NUMPY_CHECKPOINT``) this same script is the offline plumbing
check of RUNBOOK_REAL_CHECKPOINT.md step 3. Prints one JSON line
{"rows": N, "agree": true|false, "unigram_active": true}; exit 1 on
any disagreement.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> int:
    vocab_path = os.environ.get("GLIREL_TOKENIZER_VOCAB")
    if not vocab_path:
        print("GLIREL_TOKENIZER_VOCAB must be set", file=sys.stderr)
        return 2

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 48

    from pyspark.sql import functions as F

    from gen_golden import expected_triples_neural
    from glirel_spark.model.encoder import _active_unigram
    from glirel_spark.plans import pipeline
    from glirel_spark.session import get_spark

    assert _active_unigram() is not None, "vocab failed to load"
    spark = get_spark("unigram-e2e", cores=4, shuffle_partitions=8)
    try:
        ids = [
            r["doc_id"]
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select(F.col("doc_id").cast("string").alias("doc_id"))
            .orderBy("doc_id")
            .limit(n_docs)
            .collect()
        ]
        got_df = pipeline.triples_neural(spark, sf_dir).filter(
            F.col("doc_id").isin(ids)
        )
        got = {
            (
                r["doc_id"], r["head_start"], r["head_end"], r["tail_start"],
                r["tail_end"], r["head_text"], r["tail_text"], r["label"],
                r["prob"],
            )
            for r in got_df.collect()
        }
    finally:
        spark.stop()

    exp_df = expected_triples_neural(sf_dir, doc_ids=set(ids))
    want = {
        (
            r.doc_id, r.head_start, r.head_end, r.tail_start, r.tail_end,
            r.head_text, r.tail_text, r.label, r.prob,
        )
        for r in exp_df.itertuples(index=False)
    }
    agree = got == want
    print(json.dumps({
        "rows": len(got), "expected_rows": len(want), "agree": agree,
        "unigram_active": True, "n_docs": n_docs,
    }))
    if not agree:
        for r in sorted(got - want)[:5]:
            print("spark-only:", r, file=sys.stderr)
        for r in sorted(want - got)[:5]:
            print("replay-only:", r, file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
