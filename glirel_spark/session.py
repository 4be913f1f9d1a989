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
        # zstd shuffle/broadcast compression: ~2x smaller shuffle files
        # than lz4 for this engine's string-heavy exchanges — directly
        # shrinks the shared-disk serial term that caps sandbox scaling
        # (BENCH/BASELINE.md), and on a real cluster cuts network bytes.
        .config("spark.io.compression.codec", "zstd")
        .config("spark.shuffle.file.buffer", "1m")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
