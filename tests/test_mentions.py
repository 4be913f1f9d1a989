"""Mention hygiene: dedup (utils.py:6-36), keep-longer overlap resolution
(process_wiki_zsl.py:143-162), end-inclusive convention (README.md:153)."""

from __future__ import annotations

from glirel_spark.operators.mentions import (
    dedup_spans,
    extract_mentions,
    resolve_overlaps,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(f"d{i}", t.split(" ")) for i, t in enumerate(texts)],
        "doc_id string, tokens array<string>",
    )


def test_bigram_suppresses_unigram(spark):
    # "table scan" (len 2) dominates "table" (len 1) at the same start.
    df = extract_mentions(_docs(spark, ["the table scan is fast"]), spark)
    rows = {(r.start, r.end): (r.type, r.text) for r in df.collect()}
    assert rows == {(1, 2): ("ALGO", "table scan")}


def test_equal_length_tie_keeps_earlier(spark):
    # "sort merge join": sort-merge(0,1) and merge-join(1,2) overlap with
    # equal length -> keep the earlier start (deterministic greedy).
    df = extract_mentions(_docs(spark, ["sort merge join"]), spark)
    rows = {(r.start, r.end): r.text for r in df.collect()}
    assert rows == {(0, 1): "sort merge"}


def test_end_inclusive_and_m_id_order(spark):
    df = extract_mentions(_docs(spark, ["spark query spark"]), spark)
    rows = sorted((r.m_id, r.start, r.end, r.text) for r in df.collect())
    assert rows == [(0, 0, 0, "spark"), (1, 1, 1, "query"), (2, 2, 2, "spark")]


def test_dedup_spans(spark):
    m = spark.createDataFrame(
        [("d", 0, 0, "B", "x"), ("d", 0, 0, "A", "x"), ("d", 1, 1, "A", "y")],
        "doc_id string, start int, end int, type string, text string",
    )
    out = dedup_spans(m).collect()
    got = sorted((r.start, r.end, r.type) for r in out)
    assert got == [(0, 0, "A"), (1, 1, "A")]  # deterministic keeper


def test_overlap_non_adjacent_untouched(spark):
    m = spark.createDataFrame(
        [("d", 0, 0, "T", "spark"), ("d", 5, 6, "ALGO", "hash join")],
        "doc_id string, start int, end int, type string, text string",
    )
    assert resolve_overlaps(m).count() == 2


def test_long_entity_filtered_before_overlap_resolution(spark):
    """P12 order (reference process_wiki_zsl.py:72 then 143-162): an
    over-long entity is dropped BEFORE dominance, so a shorter span it
    overlaps must survive."""
    from glirel_spark.operators.mentions import (
        filter_long_entities,
        resolve_overlaps,
    )

    long_text = "x" * 60
    m = spark.createDataFrame(
        [("d0", 0, 9, "ALGO", long_text),  # >50 chars, spans 0-9
         ("d0", 1, 1, "TOOL", "spark")],   # overlapped + token-shorter
        "doc_id string, start int, end int, type string, text string",
    )
    kept = resolve_overlaps(filter_long_entities(m)).collect()
    assert [(r.start, r.end) for r in kept] == [(1, 1)]
    # wrong order (overlap first) would dominate-drop 'spark' then drop
    # the long span too, leaving nothing:
    wrong = filter_long_entities(resolve_overlaps(m)).collect()
    assert wrong == []
