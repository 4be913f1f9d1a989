"""Structured Streaming twin of the interleaved-media ingest path:
a documents stream -> caption pairs / media-atomic chunks, micro-batch
by micro-batch.

The reference is batch-only (SURVEY.md §2.10); a production multimodal
ingest tails an arrival log and mines (image, caption) pairs and
packing chunks continuously. Both operators are ROW-LOCAL (zero
exchanges — see PLANS.md) and a document lives in exactly one
micro-batch, so batch-local == global by construction and no state
store or watermark is needed. Like the flagship extraction twin
(triples_stream.py), the per-batch transform runs inside
``foreachBatch``: the interleave synthesis uses the ``materialized``
expression barrier (functions/barrier.py), whose benign-nondeterminism
trick streaming analysis rejects outside a batch context — and a real
deployment wants the per-batch parquet append + checkpoint resume
anyway.

Equality with the batch operators is asserted in tests/test_streaming.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from glirel_spark.operators import multimodal
from glirel_spark.sources import tables


def caption_pairs_batch(docs_flat: DataFrame) -> DataFrame:
    """Caption mining over one (micro-)batch of flat documents."""
    return multimodal.caption_pairs(tables.interleaved_documents(docs_flat))


def interleaved_chunks_batch(docs_flat: DataFrame) -> DataFrame:
    """Media-atomic chunking over one (micro-)batch."""
    return multimodal.interleaved_chunks(
        tables.interleaved_documents(docs_flat)
    )


def read_media_out(spark, out_path: str) -> DataFrame:
    """Read the union of all committed micro-batch outputs under
    ``out_path`` (each batch lives in its own ``b{batch_id:05d}``
    subdir; recursiveFileLookup skips partition discovery so no
    synthetic column appears)."""
    return (
        spark.read.option("recursiveFileLookup", "true").parquet(out_path)
    )


def run_media_stream(
    docs_stream: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    out_path: str,
    checkpoint: str,
):
    """Drive the stream to completion (availableNow), writing each
    micro-batch's transformed rows to a batch-id-keyed subdir of
    ``out_path`` (parquet); the checkpoint dir makes the ingest
    resumable at micro-batch granularity. Keying the write on
    batch_id (overwrite mode) makes replay idempotent: a failure
    between the write and the checkpoint commit rewrites the SAME
    subdir on replay instead of double-appending the batch — the
    contract graph_stream.read_prev_graph documents. Read results
    back with read_media_out."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        transform(batch_df).write.mode("overwrite").parquet(
            f"{out_path}/b{batch_id:05d}"
        )

    q = (
        docs_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
