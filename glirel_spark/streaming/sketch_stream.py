"""Structured Streaming twin of the mergeable-sketch story: fold HLL
registers across document micro-batches by elementwise max — the merge
law that makes sketches the cardinality structure of choice at 10^12
rows (registers from disjoint shards combine without rescanning either
shard; the same snapshot-versioned foreachBatch commit protocol as
streaming/graph_stream.py).

Stream-final registers == one-shot batch registers, asserted in
tests/test_streaming.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from glirel_spark.operators.textstats import hll_dense_registers
from glirel_spark.streaming.graph_stream import latest_snapshot


def merge_registers(a: DataFrame, b: DataFrame) -> DataFrame:
    """Elementwise max over the (lang, reg) key — the HLL merge law.
    Full-outer so a batch introducing a NEW lang extends the frame."""
    aa = a.select("lang", "reg", F.col("m").alias("_ma"))
    bb = b.select("lang", "reg", F.col("m").alias("_mb"))
    return (
        aa.join(bb, ["lang", "reg"], "full")
        .select(
            "lang",
            "reg",
            F.greatest(
                F.coalesce("_ma", F.lit(0)), F.coalesce("_mb", F.lit(0))
            ).cast("int").alias("m"),
        )
    )


def run_hll_stream(docs_stream: DataFrame, out_dir: str, checkpoint: str):
    """Per micro-batch: build the batch's register frame, max-merge
    into the latest snapshot, commit as the next version directory."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # the stream carries the raw flat documents table — the same
        # relation the batch distinct_hll consumes via _flat_docs
        batch_regs = hll_dense_registers(batch_df)
        prev_path = latest_snapshot(out_dir)
        merged = (
            batch_regs
            if prev_path is None
            else merge_registers(spark.read.parquet(prev_path), batch_regs)
        )
        merged.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"v{batch_id:05d}")
        )

    q = (
        docs_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
