"""Gold-label attachment + training-side data ops.

- J2 (base.py:132-158, get_rel_dict/get_rel_labels): assign each
  generated pair its gold class id by position lookup, default 0
  ("no_relation", base.py:156). Relationally: left join + coalesce.
- P3 (base.py:163-170): truncate token sequences to max_len with the
  corresponding span-validity consequences (P4/P5 masks).
- S8 (model.py:537-545): gold-relation feed assertion — every relation
  endpoint must exist in the mention set; the violating rows are
  returned (empty = valid), the DataFrame-native form of the
  reference's AssertionError.
- SO1 (base.py:279-298): negative-label sampling for training batches —
  deterministic per-doc sample of negative labels via a seeded hash
  ordering (the reference uses random.sample; ours is reproducible).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, Window as W

_POS = ["doc_id", "h_start", "h_end", "t_start", "t_end"]


def attach_gold_labels(pairs: DataFrame, gold: DataFrame) -> DataFrame:
    """J2: pairs ⟕ gold on position, class id 0 when unmatched.

    ``gold``: (doc_id, h_start, h_end, t_start, t_end, label_id).
    Hash join on the pair key; gold is usually the small side ->
    broadcast when it fits.
    """
    g = gold.select(*_POS, F.col("label_id").alias("_gold_id"))
    return pairs.join(g, _POS, "left").withColumn(
        "rel_label", F.coalesce(F.col("_gold_id"), F.lit(0)).cast("int")
    ).drop("_gold_id")


def truncate_tokens(docs_tokens: DataFrame, max_len: int) -> DataFrame:
    """P3: tokens[:max_len] (slice is 1-based)."""
    return docs_tokens.withColumn(
        "tokens", F.slice(F.col("tokens"), 1, max_len)
    )


def validate_gold_positions(gold: DataFrame, mentions: DataFrame) -> DataFrame:
    """S8: rows whose head or tail position is missing from mentions
    (must be empty — anti-join form of model.py:541-545 asserts)."""
    m = mentions.select("doc_id", "start", "end")
    h = m.toDF("doc_id", "h_start", "h_end")
    t = m.toDF("doc_id", "t_start", "t_end")
    bad_head = gold.join(h, ["doc_id", "h_start", "h_end"], "left_anti")
    bad_tail = gold.join(t, ["doc_id", "t_start", "t_end"], "left_anti")
    return bad_head.unionByName(bad_tail).distinct()


def sample_negative_labels(
    doc_labels: DataFrame,
    all_labels: list[str],
    n_negatives: int,
    seed: int = 42,
) -> DataFrame:
    """SO1: per-doc union of positive labels + sampled negatives.

    doc_labels: (doc_id, positives array<string>). Negatives are the
    first n by a seeded hash order of (doc_id, label) — deterministic
    replay of base.py:279-289's random.sample + shuffle.
    Returns (doc_id, candidate_labels array<string>).
    """
    spark = doc_labels.sparkSession
    lab = spark.createDataFrame([(l,) for l in sorted(all_labels)], "label string")
    crossed = doc_labels.join(F.broadcast(lab)).filter(
        ~F.array_contains(F.col("positives"), F.col("label"))
    )
    w = W.partitionBy("doc_id").orderBy(
        F.xxhash64(F.concat(F.col("doc_id"), F.lit(f":{seed}:"), F.col("label")))
    )
    negs = (
        crossed.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= n_negatives)
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("label")).alias("negatives"))
    )
    return doc_labels.join(negs, "doc_id", "left").select(
        "doc_id",
        F.array_sort(
            F.array_union(
                F.col("positives"),
                F.coalesce(F.col("negatives"), F.array().cast("array<string>")),
            )
        ).alias("candidate_labels"),
    )
