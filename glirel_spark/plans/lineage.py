"""Checkpoint-resume with per-partition lineage + metrics
(north_rule: "resumable from checkpoint with per-partition lineage +
metrics"; SURVEY.md §4 item 3).

Model: the corpus is processed in doc-id buckets (the unit of resume —
an Iceberg snapshot commit per bucket on a real cluster; a parquet
append per bucket here, via TableIO). The lineage table records every
completed bucket with row counts and wall time. Resume = anti-join the
bucket list against completed lineage — only unprocessed buckets run.

This is deliberately NOT Spark streaming state: batch + snapshot-
granular resume, per SURVEY.md §2.10 (the reference is batch;
micro-batch resume = "which partitions lack triples").
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

LINEAGE_SCHEMA = (
    "bucket int, n_docs long, n_triples long, wall_sec double, finished_at double"
)


class LineageLog:
    """Parquet-backed lineage table (Iceberg table on a cluster)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def completed_buckets(self) -> list[int]:
        try:
            return [
                r.bucket
                for r in self.spark.read.parquet(self.path).select("bucket").distinct().collect()
            ]
        except Exception:  # first run: no lineage yet
            return []

    def record(self, bucket: int, n_docs: int, n_triples: int, wall_sec: float) -> None:
        row = [(bucket, n_docs, n_triples, float(wall_sec), time.time())]
        self.spark.createDataFrame(row, LINEAGE_SCHEMA).write.mode("append").parquet(
            self.path
        )

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(self.path)


def bucket_of(doc_id_col, n_buckets: int):
    return F.pmod(F.hash(doc_id_col), F.lit(n_buckets)).cast("int")


def run_resumable(
    spark: SparkSession,
    docs: DataFrame,
    process_bucket,
    out_path: str,
    lineage_path: str,
    n_buckets: int = 8,
) -> DataFrame:
    """Process docs bucket-by-bucket, skipping completed ones.

    ``process_bucket(docs_subset) -> DataFrame`` is the pipeline stage
    (e.g. triples extraction). Each bucket writes to its OWN partition
    directory (``out_path/_bucket=b``) with mode('overwrite'): a crash
    between the bucket write and the lineage commit replays the bucket
    on resume, and the overwrite makes that replay idempotent — no
    duplicate rows can survive, matching Iceberg's
    dynamic-partition-overwrite snapshot semantics.
    """
    log = LineageLog(spark, lineage_path)
    done = set(log.completed_buckets())
    bucketed = docs.withColumn("_bucket", bucket_of(F.col("doc_id"), n_buckets))
    for b in range(n_buckets):
        if b in done:
            continue
        t0 = time.perf_counter()
        subset = bucketed.filter(F.col("_bucket") == b).drop("_bucket")
        bucket_dir = f"{out_path}/_bucket={b}"
        out = process_bucket(subset)
        out.write.mode("overwrite").parquet(bucket_dir)
        wall = time.perf_counter() - t0
        n_docs = subset.count()
        n_out = spark.read.parquet(bucket_dir).count()
        log.record(b, n_docs, n_out, wall)
    return spark.read.parquet(out_path).drop("_bucket")
