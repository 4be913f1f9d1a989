"""End-to-end plan assembly: documents -> tokens -> mentions -> pairs ->
scored -> triples (the flagship extraction pipeline).

Each stage is a function DataFrame -> DataFrame so Catalyst sees one
logical plan end-to-end and can push filters/pruning across stage
boundaries. The interleaved-spans representation (BASELINE.json
input_hint) is the canonical input; the flat driver parquet is converted
via a narrow, deterministic synthesis (sources/tables.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from glirel_spark import config
from glirel_spark.operators import decode as decode_ops
from glirel_spark.operators import mentions as mention_ops
from glirel_spark.operators import pairs as pair_ops
from glirel_spark.operators import scoring as scoring_ops
from glirel_spark.sources import tables


def interleaved(spark: SparkSession, sf_dir: str) -> DataFrame:
    flat = tables.TableIO(spark, sf_dir).table("documents")
    return tables.interleaved_documents(flat)


def docs_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id string, tokens array<string>) from the interleaved corpus.

    The corpus text is single-space-joined closed-vocabulary words, so
    split-by-space == the reference regex tokenizer (asserted in
    tests/test_tokenize.py); the general-text path is
    functions/tokenize.tokens_native.
    """
    docs = tables.text_of(interleaved(spark, sf_dir))
    return docs.select("doc_id", F.split("text", " ").alias("tokens"))


def mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mention_ops.extract_mentions(docs_tokens(spark, sf_dir), spark)


def pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pair_ops.generate_pairs(mentions(spark, sf_dir))


def scored(spark: SparkSession, sf_dir: str, include_coref: bool = False) -> DataFrame:
    rel = pair_ops.relation_pairs(pairs(spark, sf_dir))
    labels = scoring_ops.labels_df(spark, include_coref=include_coref)
    return scoring_ops.score_pairs_lexical(rel, labels)


def triples(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = config.THRESHOLD,
    top_k: int = config.TOP_K,
) -> DataFrame:
    return decode_ops.decode(scored(spark, sf_dir), threshold, top_k)
