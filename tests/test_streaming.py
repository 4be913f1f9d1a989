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


def test_triples_stream_equals_batch(spark, tmp_path):
    """Streaming extraction (foreachBatch decode) == batch flagship."""
    from glirel_spark.plans import pipeline
    from glirel_spark.streaming.triples_stream import (
        read_documents_stream,
        run_extraction_stream,
    )

    out = str(tmp_path / "triples")
    ckpt = str(tmp_path / "ckpt")
    run_extraction_stream(read_documents_stream(spark, SF), out, ckpt)
    got = {
        (r.doc_id, r.head_start, r.head_end, r.tail_start, r.tail_end,
         r.label, r.prob)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.doc_id, r.head_start, r.head_end, r.tail_start, r.tail_end,
         r.label, r.prob)
        for r in pipeline.triples(spark, SF).collect()
    }
    assert got == want and len(got) > 0
