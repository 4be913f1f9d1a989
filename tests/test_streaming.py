"""Structured Streaming twin == batch operator on the same input."""

from __future__ import annotations

from glirel_spark.operators.events import windowed_counts
from glirel_spark.streaming.events_stream import (
    read_events_stream,
    run_to_completion,
    windowed_counts_stream,
)

SF = "/root/testdata/sf0.001"


def test_stream_equals_batch(spark):
    stream = windowed_counts_stream(read_events_stream(spark, SF))
    run_to_completion(stream, "stream_out")
    got = {
        (r.window_start, r.event_type): (r.n, r.value_cents)
        for r in spark.sql("SELECT * FROM stream_out").collect()
    }
    batch = windowed_counts(spark.read.parquet(f"{SF}/events.parquet"))
    want = {
        (r.window_start, r.event_type): (r.n, r.value_cents)
        for r in batch.collect()
    }
    assert got == want and len(got) > 0
