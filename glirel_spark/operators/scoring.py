"""Pair × label scoring — relational plane.

Two scorers share the decode pipeline (threshold/top-k/constraints):

- ``lexical_score``: a deterministic, *SQL-expressible* scorer (integer
  arithmetic + one exactly-rounded IEEE division). It is the
  oracle-checked twin: DuckDB computes bit-identical probabilities, so
  the entire decode path is value-hash verified end-to-end.
- the tensor-plane scorer (glirel_spark/model/scorer.py): the GLiREL
  architecture (label-prompt × span-pair reps, dot scorer — reference
  T1-T13) as a vectorized mapInPandas stage.

Both emit the same (pair, label, score, prob) shape; decode does not
care which produced it. Coref label semantics: prob 1.0 iff the two
mention texts match (the SELF coreference convention of
glirel/modules/utils.py:120-127 reduced to a deterministic rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from glirel_spark import config


def labels_df(spark: SparkSession, include_coref: bool = False) -> DataFrame:
    """Broadcastable label dimension with entity-type constraints.

    NULL allowed_head/allowed_tail = unconstrained
    (glirel/modules/utils.py:76-79: `.get(..., rel_types)` default).
    """
    rows = []
    for label, c in sorted(config.RELATION_LABELS.items()):
        rows.append((label, c.get("allowed_head"), c.get("allowed_tail")))
    if include_coref:
        rows.append((config.COREF_LABEL, None, None))
    return spark.createDataFrame(
        rows, "label string, allowed_head array<string>, allowed_tail array<string>"
    )


def lexical_raw(h_text: Column, t_text: Column, label: Column, dist: Column) -> Column:
    """Integer score in [0, SCORE_MOD): the SQL-expressible test scorer."""
    c = config
    return (
        F.lit(c.SCORE_W_HLEN) * F.length(h_text)
        + F.lit(c.SCORE_W_TLEN) * F.length(t_text)
        + F.lit(c.SCORE_W_LLEN) * F.length(label)
        + F.lit(c.SCORE_W_DIST) * dist
        + F.lit(c.SCORE_W_HCH) * F.ascii(h_text)
        + F.lit(c.SCORE_W_TCH) * F.ascii(t_text)
        + F.lit(c.SCORE_W_LCH) * F.ascii(label)
    ) % F.lit(c.SCORE_MOD)


def score_pairs_lexical(rel_pairs: DataFrame, labels: DataFrame) -> DataFrame:
    """pairs × labels -> scored candidates.

    The label table is tiny -> broadcast nested-loop-free cross join
    (Catalyst turns crossJoin(broadcast(...)) into BroadcastNestedLoopJoin
    with no shuffle of the big side).
    """
    scored = rel_pairs.crossJoin(F.broadcast(labels))
    raw = F.when(
        F.col("label") == config.COREF_LABEL,
        F.when(F.col("h_text") == F.col("t_text"), F.lit(config.SCORE_MOD - 1)).otherwise(F.lit(0)),
    ).otherwise(
        lexical_raw(F.col("h_text"), F.col("t_text"), F.col("label"), F.col("dist"))
    )
    return scored.withColumn("raw", raw.cast("int")).withColumn(
        "prob", F.col("raw").cast("double") / F.lit(float(config.SCORE_MOD - 1))
    )
