"""Structured Streaming twin of the flagship extraction pipeline:
a documents stream -> (subj, pred, obj) triples, micro-batch by
micro-batch.

The reference is batch-only (SURVEY.md §2.10); a production KG pipeline
ingests documents continuously. Design:

- everything up to the threshold filter is STATELESS (narrow array
  expressions + a broadcast label join), so it runs in append mode with
  no state store and no watermark — the same whole-stage-codegen plan
  as the batch path;
- the per-pair top-k argmax and enrichment run inside ``foreachBatch``
  via the BATCH decode (operators/decode.py): a document arrives in
  exactly one micro-batch, so pair keys never straddle batches and
  batch-local decode == global decode. This avoids an unbounded state
  store that a streaming-native groupBy would require (pair keys are
  unique forever, so their state would never be evicted).

Equality with the batch pipeline is asserted in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from glirel_spark import config
from glirel_spark.operators import decode as decode_ops
from glirel_spark.operators import fused
from glirel_spark.operators import scoring as scoring_ops
from glirel_spark.sources import tables

DOCUMENTS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def extract_triples_batch(docs_flat: DataFrame) -> DataFrame:
    """flat documents -> triples; pure function of one (micro-)batch."""
    spark = docs_flat.sparkSession
    import pyspark.sql.functions as F

    dt = tables.text_of(tables.interleaved_documents(docs_flat)).select(
        "doc_id", F.split("text", " ").alias("tokens")
    )
    dm = fused.with_mentions(dt)
    labels = scoring_ops.labels_df(spark)
    rel = fused.pairs_from(dm).filter("is_rel")
    scored = scoring_ops.score_pairs_lexical(rel, labels)
    return decode_ops.decode(
        scored, config.THRESHOLD, config.TOP_K,
        mention_texts=fused.mentions_from(dm), labels=labels,
    )


def run_extraction_stream(
    docs_stream: DataFrame, out_path: str, checkpoint: str
):
    """Drive the stream to completion (availableNow), appending each
    micro-batch's decoded triples to ``out_path`` (parquet). The
    checkpoint dir makes the stream resumable at micro-batch
    granularity — the streaming counterpart of plans/lineage.py."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        extract_triples_batch(batch_df).write.mode("append").parquet(out_path)

    q = (
        docs_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
