"""Checkpoint-resume: completed buckets are skipped; output equals a
single-shot run; lineage metrics recorded per bucket."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glirel_spark.plans.lineage import LineageLog, run_resumable


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(f"d{i}", i) for i in range(40)], "doc_id string, v int"
    )


def _process(subset):
    return subset.withColumn("out", F.col("v") * 2)


def test_resume_skips_completed(spark, docs, tmp_path):
    out = str(tmp_path / "out")
    lin = str(tmp_path / "lineage")
    calls = []

    def counting(subset):
        calls.append(1)
        return _process(subset)

    r1 = run_resumable(spark, docs, counting, out, lin, n_buckets=4)
    assert r1.count() == 40 and len(calls) == 4

    # second run: all buckets already done -> zero processing
    calls.clear()
    r2 = run_resumable(spark, docs, counting, out, lin, n_buckets=4)
    assert len(calls) == 0 and r2.count() == 40

    log = LineageLog(spark, lin)
    m = log.metrics()
    assert sorted(r.bucket for r in m.collect()) == [0, 1, 2, 3]
    assert m.agg(F.sum("n_docs")).collect()[0][0] == 40


def test_partial_resume(spark, docs, tmp_path):
    out = str(tmp_path / "out")
    lin = str(tmp_path / "lineage")
    # simulate a crash: run only buckets 0-1 by pre-recording 2-3... inverse:
    # pre-record buckets 2 and 3 as done, then run — only 0,1 process.
    log = LineageLog(spark, lin)
    log.record(2, 0, 0, 0.0)
    log.record(3, 0, 0, 0.0)
    calls = []

    def counting(subset):
        calls.append(1)
        return _process(subset)

    run_resumable(spark, docs, counting, out, lin, n_buckets=4)
    assert len(calls) == 2
