"""Event-stream operators (batch form; streaming twins in
glirel_spark/streaming/). Window functions + sessionization — the
standard OLAP patterns the engine exposes alongside the KG pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, Window as W


def windowed_counts(events: DataFrame) -> DataFrame:
    """Hourly tumbling-window counts per event type.

    value aggregated as integer cents (value*100 cast) so the oracle
    sum is order-insensitive-exact (float sums are not).
    """
    return events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start"),
        "event_type",
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).cast("long").alias("value_cents"),
    )


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessionization: lag + cumulative sum of session starts.

    Single shuffle on user_id; both windows share the same partitioning
    and sort, so Catalyst plans one exchange + one sort.
    """
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(F.lag("ts").over(w).isNull(), 1).when(
        gap > gap_seconds, 1
    ).otherwise(0)
    sess_id = F.sum(new_sess).over(
        w.rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        events.withColumn("sess_id", sess_id.cast("long"))
        .groupBy("user_id", "sess_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("ts").alias("sess_start"),
            F.max("ts").alias("sess_end"),
        )
    )
