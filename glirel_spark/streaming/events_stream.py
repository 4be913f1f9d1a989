"""Structured Streaming twins of the batch event operators.

The reference has no streaming operators (SURVEY.md §2.10) — this module
exists because a production KG pipeline ingests documents/events
continuously. Batch and streaming share the aggregation logic; tests
drive the streaming query over the events parquet with availableNow +
memory sink and assert equality with the batch twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the file stream source requires a directory; glob-filter to the
    # events table inside the sf dir
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def windowed_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour windows with late-data watermark — the streaming
    twin of operators/events.windowed_counts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).cast("long").alias("value_cents"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "value_cents")
    )


def run_to_completion(agg: DataFrame, name: str) -> StreamingQuery:
    """Drive the stream over all available input synchronously
    (availableNow) into a memory sink; caller reads `SELECT * FROM name`.
    Complete mode because watermark-append would hold back the last
    window in a finite input."""
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
