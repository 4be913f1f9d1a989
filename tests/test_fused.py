"""Fused per-doc plan == general relational operators, row for row."""

from __future__ import annotations

from glirel_spark.operators.fused import mentions_fused, pairs_fused
from glirel_spark.operators.mentions import extract_mentions
from glirel_spark.operators.pairs import generate_pairs
from glirel_spark.plans.pipeline import docs_tokens


def test_fused_equals_relational_on_corpus(spark):
    dt = docs_tokens(spark, "/root/testdata/sf0.001").cache()
    rel_m = {tuple(r) for r in extract_mentions(dt, spark).collect()}
    fus_m = {tuple(r) for r in mentions_fused(dt).collect()}
    assert rel_m == fus_m

    rel_p = {tuple(r) for r in generate_pairs(extract_mentions(dt, spark)).collect()}
    fus_p = {tuple(r) for r in pairs_fused(dt).collect()}
    assert rel_p == fus_p
    dt.unpersist()


def test_fused_edge_cases(spark):
    docs = spark.createDataFrame(
        [
            ("a", ["slow", "big"]),          # no mentions
            ("b", ["spark"]),                 # single mention, no pairs
            ("c", ["sort", "merge", "join"]),  # overlap chain
            ("d", ["table", "scan", "table"]),  # bigram suppresses first uni only
        ],
        "doc_id string, tokens array<string>",
    )
    m = {(r.doc_id, r.start, r.end, r.text) for r in mentions_fused(docs).collect()}
    assert m == {
        ("b", 0, 0, "spark"),
        ("c", 0, 1, "sort merge"),
        ("d", 0, 1, "table scan"),
        ("d", 2, 2, "table"),
    }
    rel = {tuple(r) for r in generate_pairs(extract_mentions(docs, spark)).collect()}
    fus = {tuple(r) for r in pairs_fused(docs).collect()}
    assert rel == fus
