"""Evaluation-report + submission sinks (SURVEY §2 S7).

The reference emits three artifacts after an eval run:
- ``results.txt``: appended per-run metric lines
  (glirel/modules/run_evaluation.py:108-131)
- ``tables.txt``: an aligned summary table with an Average row
  (glirel/modules/run_evaluation.py:137-161)
- a DocRED-style submission JSON: one record per predicted relation
  (data/re-docred/run_evaluation.py:124-127, 180-184)

The text reports are driver-side formatting of a 6-row threshold grid —
trivially small at any corpus scale. The submission sink is a
DISTRIBUTED ``df.write.json``: one record per predicted triple, written
by the executors (never collected), so it holds at 10^12 docs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

_METRIC_COLS = [
    "micro_precision", "micro_recall", "micro_f1",
    "macro_precision", "macro_recall", "macro_f1",
]


def eval_report_texts(search: DataFrame, step: int = 0) -> tuple[str, str]:
    """(results_text, tables_text) from a threshold_search grid."""
    rows = search.orderBy("threshold").collect()
    sep = "#" * 46
    results = [sep, f"step: {step}"]
    for r in rows:
        metrics = {c: r[c] for c in _METRIC_COLS}
        results.append(f"threshold={r['threshold']}")
        results.append(str(metrics))
    best = max(rows, key=lambda r: (r["macro_f1"], -r["threshold"]))
    table = [f"{'threshold':20}: {'macro_f1':>9}  {'micro_f1':>9}"]
    for r in rows:
        table.append(
            f"{str(r['threshold']):20}: {r['macro_f1']:>9.1%}  {r['micro_f1']:>9.1%}"
        )
    table.append(f"{'Best':20}: {best['macro_f1']:>9.1%}  (t={best['threshold']})")
    return "\n".join(results) + "\n", "\n".join(table) + "\n"


def write_eval_report(search: DataFrame, out_dir: str, step: int = 0) -> None:
    """Emit results.txt (append), tables.txt (append) and the
    machine-readable per-threshold metrics as parquet."""
    os.makedirs(out_dir, exist_ok=True)
    results_text, tables_text = eval_report_texts(search, step)
    with open(os.path.join(out_dir, "results.txt"), "a") as f:
        f.write(results_text)
    with open(os.path.join(out_dir, "tables.txt"), "a") as f:
        f.write(tables_text)
    search.write.mode("overwrite").parquet(os.path.join(out_dir, "metrics.parquet"))


def submission_records(triples: DataFrame) -> DataFrame:
    """DocRED-submission shape: one record per predicted relation with
    the doc key, pair positions, and relation label
    (re-docred/run_evaluation.py:180-184 uses {title, h_idx, t_idx, r})."""
    return triples.select(
        F.col("doc_id").alias("title"),
        F.col("head_start").alias("h_idx"),
        F.col("tail_start").alias("t_idx"),
        F.col("label").alias("r"),
        F.col("prob").alias("score"),
    )


def write_submission(triples: DataFrame, path: str) -> None:
    """Distributed JSON sink for the submission artifact."""
    submission_records(triples).write.mode("overwrite").json(path)
