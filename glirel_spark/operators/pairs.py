"""Entity-pair generation — the central join (reference J1).

Semantics of ``generate_entity_pairs_indices`` (glirel/modules/base.py:59-109),
proven by the reference's own golden test (test_rel_rep.py:33-115):

- relation pairs: bidirectional, no self-pairs (i != j), optional
  distance predicate |h_start - t_start| <= max_distance
- coreference pairs: unidirectional (i < j), NO distance predicate
- emitted set = union of the two masks; row-major (i, then j) order

Spark shape: an intra-document self-join — equi on doc_id plus the θ
residual. There is nothing to broadcast (both sides are the same big
table); the shuffle hash-partitions mentions by doc_id once, and AQE
splits any skewed doc partitions. Order is carried as (head m_id,
tail m_id) sort keys, not physical row order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from glirel_spark import config


def generate_pairs(
    mentions: DataFrame,
    max_distance: int | None = config.MAX_PAIR_DISTANCE,
) -> DataFrame:
    """mentions -> pairs with is_rel / is_coref flags.

    Keeps a row iff is_rel OR is_coref (the reference's combined mask,
    base.py:100).
    """
    h = mentions.select(
        "doc_id",
        F.col("m_id").alias("head_m_id"),
        F.col("start").alias("h_start"),
        F.col("end").alias("h_end"),
        F.col("type").alias("h_type"),
        F.col("text").alias("h_text"),
    )
    t = mentions.select(
        "doc_id",
        F.col("m_id").alias("tail_m_id"),
        F.col("start").alias("t_start"),
        F.col("end").alias("t_end"),
        F.col("type").alias("t_type"),
        F.col("text").alias("t_text"),
    )
    p = h.join(t, "doc_id").filter(F.col("head_m_id") != F.col("tail_m_id"))
    dist = F.abs(F.col("h_start") - F.col("t_start"))
    is_rel = F.lit(True) if max_distance is None else dist <= F.lit(max_distance)
    is_coref = F.col("head_m_id") < F.col("tail_m_id")
    return (
        p.withColumn("dist", dist.cast("int"))
        .withColumn("is_rel", is_rel)
        .withColumn("is_coref", is_coref)
        .filter(F.col("is_rel") | F.col("is_coref"))
        .select(
            "doc_id", "head_m_id", "tail_m_id", "h_start", "h_end",
            "t_start", "t_end", "h_type", "t_type", "h_text", "t_text",
            "dist", "is_rel", "is_coref",
        )
    )


def relation_pairs(pairs: DataFrame) -> DataFrame:
    return pairs.filter("is_rel")


def coref_pairs(pairs: DataFrame) -> DataFrame:
    return pairs.filter("is_coref")
