"""J2 gold-label assignment (base.py:132-158), P3 truncation
(base.py:163-170), S8 position validation (model.py:537-545), SO1
negative sampling (base.py:279-298)."""

from __future__ import annotations

from pyspark.sql import functions as F

from glirel_spark.operators.gold import (
    attach_gold_labels,
    sample_negative_labels,
    truncate_tokens,
    validate_gold_positions,
)

PAIRS = "doc_id string, h_start int, h_end int, t_start int, t_end int"


def test_attach_gold_default_zero(spark):
    pairs = spark.createDataFrame(
        [("d", 0, 0, 1, 1), ("d", 1, 1, 0, 0)], PAIRS
    )
    gold = spark.createDataFrame(
        [("d", 0, 0, 1, 1, 3)], PAIRS + ", label_id int"
    )
    out = {(r.h_start, r.t_start): r.rel_label
           for r in attach_gold_labels(pairs, gold).collect()}
    assert out == {(0, 1): 3, (1, 0): 0}  # unmatched -> class 0


def test_truncate_tokens(spark):
    df = spark.createDataFrame([("d", list("abcdef"))],
                               "doc_id string, tokens array<string>")
    out = truncate_tokens(df, 3).collect()[0]
    assert out.tokens == ["a", "b", "c"]


def test_validate_gold_positions(spark):
    gold = spark.createDataFrame(
        [("d", 0, 0, 1, 1), ("d", 5, 5, 1, 1)], PAIRS
    )
    mentions = spark.createDataFrame(
        [("d", 0, 0), ("d", 1, 1)], "doc_id string, start int, end int"
    )
    bad = validate_gold_positions(gold, mentions).collect()
    assert [(r.h_start, r.h_end) for r in bad] == [(5, 5)]  # head not in ner


def test_sample_negative_labels_deterministic(spark):
    doc_labels = spark.createDataFrame(
        [("d1", ["feeds"]), ("d2", ["used by"])],
        "doc_id string, positives array<string>",
    )
    all_labels = [f"L{i}" for i in range(20)] + ["feeds", "used by"]
    a = sample_negative_labels(doc_labels, all_labels, 5, seed=1).collect()
    b = sample_negative_labels(doc_labels, all_labels, 5, seed=1).collect()
    got_a = {r.doc_id: r.candidate_labels for r in a}
    got_b = {r.doc_id: r.candidate_labels for r in b}
    assert got_a == got_b
    assert all(len(v) == 6 for v in got_a.values())  # 1 positive + 5 negs
    assert "feeds" in got_a["d1"] and "used by" in got_a["d2"]
    # different seed -> (almost surely) different sample
    c = {r.doc_id: r.candidate_labels
         for r in sample_negative_labels(doc_labels, all_labels, 5, seed=2).collect()}
    assert c != got_a
