"""E2 lifecycle replay: zero-shot split -> predictions -> RelEvaluator
metrics on an annotated fixture corpus (the WikiZSL/FewRel protocol
shape, model.py:612-694)."""

from __future__ import annotations

from pyspark.sql import functions as F

from glirel_spark.operators.evaluate import (
    evaluate,
    micro_macro,
    per_label_counts,
)
from glirel_spark.operators.zerosplit import split_by_relation_type
from glirel_spark.sources.fixtures import make_annotated_docs


def _gold_from(annotated):
    """Flatten fixture relations to the positional gold table."""
    return annotated.select(
        "doc_id", F.explode("relations").alias("r")
    ).select(
        "doc_id",
        F.col("r.head.position")[0].alias("h_start"),
        F.col("r.head.position")[1].alias("h_end"),
        F.col("r.tail.position")[0].alias("t_start"),
        F.col("r.tail.position")[1].alias("t_end"),
        F.col("r.relation_text").alias("label"),
    )


def test_protocol_end_to_end(spark):
    docs = make_annotated_docs(spark, n_docs=80, n_labels=20, seed=7)
    _, test_docs, info = split_by_relation_type(docs, num_unseen=5, seed=0)
    gold = _gold_from(test_docs)

    # perfect predictor -> all metrics 1.0
    perfect = evaluate(gold, gold).collect()[0]
    assert perfect.micro_f1 == 1.0 and perfect.macro_f1 == 1.0

    # half the predictions mislabeled -> micro precision/recall drop equally
    wrong = gold.withColumn(
        "label",
        F.when(F.col("h_start") % 2 == 0, F.concat(F.lit("WRONG_"), F.col("label")))
        .otherwise(F.col("label")),
    )
    m = evaluate(wrong, gold).collect()[0]
    assert 0 < m.micro_f1 < 1.0
    # J5 keeps mislabeled predictions at annotated positions ->
    # pred count unchanged, tp reduced
    counts = per_label_counts(wrong, gold)
    assert counts.agg(F.sum("tp")).collect()[0][0] < counts.agg(
        F.sum("pred_n")
    ).collect()[0][0]

    # an unannotated-position prediction is excluded by J5 entirely
    fabricated = gold.limit(1).withColumn("h_start", F.lit(997)).withColumn(
        "h_end", F.lit(998)
    )
    m2 = evaluate(gold.unionByName(fabricated), gold).collect()[0]
    assert m2.micro_precision == 1.0  # J5 removed it


def test_metrics_zero_when_disjoint(spark):
    docs = make_annotated_docs(spark, n_docs=30, n_labels=10, seed=2)
    gold = _gold_from(docs)
    off = gold.withColumn("h_start", F.col("h_start") + 500).withColumn(
        "h_end", F.col("h_end") + 500
    )
    m = micro_macro(
        per_label_counts(off.join(gold.select("doc_id").distinct(), "doc_id", "left_semi")
                         .join(gold, ["doc_id", "h_start", "h_end", "t_start", "t_end"], "left_semi"),
                         gold)
    ).collect()[0]
    assert m.micro_f1 == 0.0
