"""Entity linking + canonicalization (reference J7/J8 seeds).

- J7: alias-dictionary canonicalization — the reference's PID->name /
  alias remap broadcast lookup (data/process_wiki_zsl.py:19-33,
  data/re-docred/run_evaluation.py:28-43) generalized to a
  (alias -> canonical_id) dimension, broadcast-joined.
- J8: mention-text alias matching (data_proc.py:43-52 sliding-window
  lowercase match) — at scale, candidate generation is a blocked
  MinHash-LSH join (see operators/minhash.py); here the dictionary is
  exact-match after lowercase normalization, with the LSH join as the
  fuzzy path.

Unmatched mentions get a deterministic surface-form id ("Q:surface:<text>")
so the graph is total; production would route these to a discovery queue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from glirel_spark import config


def alias_df(spark: SparkSession) -> DataFrame:
    rows = sorted(config.ALIAS_DICT.items())
    return spark.createDataFrame(rows, "alias string, canonical_id string")


def canonicalize(df: DataFrame, aliases: DataFrame, text_col: str,
                 out_col: str) -> DataFrame:
    """Broadcast alias join; fallback id for unmatched surface forms."""
    a = aliases.select(
        F.lower(F.col("alias")).alias("_alias"),
        F.col("canonical_id").alias("_canon"),
    )
    joined = df.join(
        F.broadcast(a), F.lower(F.col(text_col)) == F.col("_alias"), "left"
    )
    return joined.withColumn(
        out_col,
        F.coalesce(F.col("_canon"), F.concat(F.lit("Q:surface:"), F.lower(F.col(text_col)))),
    ).drop("_alias", "_canon")


def link_triples(triples: DataFrame, aliases: DataFrame) -> DataFrame:
    """Triples -> (subj, pred, obj) with canonical entity ids."""
    out = canonicalize(triples, aliases, "head_text", "subj")
    out = canonicalize(out, aliases, "tail_text", "obj")
    return out.select(
        "doc_id", "subj", F.col("label").alias("pred"), "obj", "prob",
        "head_start", "head_end", "tail_start", "tail_end",
    )
