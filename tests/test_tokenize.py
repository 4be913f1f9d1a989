"""Tokenizer parity: regex semantics of glirel/model.py:518-531 with char
offsets; native JVM path == pandas-UDF path == plain-python path."""

from __future__ import annotations

from pyspark.sql import functions as F

from glirel_spark.functions.tokenize import (
    tokenize_py,
    tokenize_with_offsets,
    tokens_native,
)


def test_regex_offsets_python():
    text = "Jack Dorsey co-founded Twitter, Inc. in 2006."
    toks = tokenize_py(text)
    assert [t[0] for t in toks] == [
        "Jack", "Dorsey", "co-founded", "Twitter", ",", "Inc", ".", "in", "2006", ".",
    ]
    # char offsets: text[start:end] round-trips every token
    for tok, s, e in toks:
        assert text[s:e] == tok


def test_native_equals_udf(spark):
    texts = [
        "Jack Dorsey co-founded Twitter, Inc. in 2006.",
        "the fast key order sort table scan merge",
        "snake_case stays-joined but.dots split",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    out = df.select(
        tokens_native(F.col("text")).alias("native"),
        F.transform(tokenize_with_offsets(F.col("text")), lambda s: s["token"]).alias("udf"),
    ).collect()
    for r in out:
        assert r.native == r.udf


def test_split_equivalence_on_corpus(spark):
    # On the driver corpus (single-space-joined closed vocab) split == regex.
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bad = df.select(
        (F.split("text", " ") == tokens_native(F.col("text"))).alias("same")
    ).filter(~F.col("same"))
    assert bad.count() == 0
