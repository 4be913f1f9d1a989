"""SparkSession factory tuned for this engine.

Local mode is the sandbox stand-in for a multi-executor cluster; all
tuning below (AQE, skew-join splitting, Arrow batching, shuffle-partition
sizing) is the configuration we would ship on a real 1000-executor
cluster, with only the partition counts scaled.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "glirel_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # ~= cores in local mode; on a real cluster: 2-3x total cores,
        # with AQE coalescing down at runtime.
        shuffle_partitions = max(cores, 8)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # NOTE on shuffle compression: at sandbox scale (sf<=0.1) the
        # shuffles are KB-MB and CPU-bound, so the lz4 default wins
        # (zstd measured +1-6s per heavy query here). The scaling
        # harness (bench_scaling.py) DOES enable zstd: there the
        # shuffle volume through the box's single shared disk is the
        # serial term, and halving the bytes is worth the CPU — the
        # same trade a real cluster makes for network-bound exchanges.
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
