"""Eval-report / submission sinks (S7) — reference artifacts:
run_evaluation.py:106-161 (results.txt / tables.txt), re-docred
run_evaluation.py:124-127 (submission records)."""

from __future__ import annotations

import json
import os

from glirel_spark.operators import report


def _search_df(spark):
    rows = [
        (0.1, 0.5, 0.6, 0.55, 0.4, 0.5, 0.44),
        (0.5, 0.8, 0.6, 0.69, 0.7, 0.5, 0.58),
        (0.6, 0.9, 0.4, 0.55, 0.8, 0.3, 0.44),
    ]
    return spark.createDataFrame(
        rows,
        "threshold double, micro_precision double, micro_recall double,"
        " micro_f1 double, macro_precision double, macro_recall double,"
        " macro_f1 double",
    )


def test_eval_report_texts_and_files(spark, tmp_path):
    search = _search_df(spark)
    results, tables = report.eval_report_texts(search, step=3)
    assert "step: 3" in results
    assert "threshold=0.5" in results
    # best row is threshold=0.5 (max macro_f1 = 0.58)
    assert "(t=0.5)" in tables
    assert "58.0%" in tables

    out = str(tmp_path / "eval")
    report.write_eval_report(search, out, step=3)
    report.write_eval_report(search, out, step=4)  # append semantics
    text = open(os.path.join(out, "results.txt")).read()
    assert text.count("step:") == 2
    metrics = spark.read.parquet(os.path.join(out, "metrics.parquet"))
    assert metrics.count() == 3


def test_submission_records(spark, tmp_path):
    triples = spark.createDataFrame(
        [("d0", 1, 2, 4, 5, "spark", "customer", "used by", 60, 0.7)],
        "doc_id string, head_start int, head_end int, tail_start int,"
        " tail_end int, head_text string, tail_text string, label string,"
        " raw int, prob double",
    )
    out = str(tmp_path / "sub")
    report.write_submission(triples, out)
    lines = []
    for f in os.listdir(out):
        if f.endswith(".json"):
            lines += [json.loads(ln) for ln in open(os.path.join(out, f))]
    assert lines == [
        {"title": "d0", "h_idx": 1, "t_idx": 4, "r": "used by", "score": 0.7}
    ]
