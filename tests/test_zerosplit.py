"""Zero-shot split replay (train.py:116-185): disjoint label sets,
mixed docs skipped, exact unseen-type count, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from glirel_spark.operators.zerosplit import (
    split_by_relation_type,
    unique_relations,
)
from glirel_spark.sources.fixtures import make_annotated_docs


def _label_set(df):
    return {
        r.rt
        for r in df.select(
            F.explode(
                F.transform(F.col("relations"), lambda x: x["relation_text"])
            ).alias("rt")
        ).distinct().collect()
    }


def test_split_properties(spark):
    docs = make_annotated_docs(spark, n_docs=80, n_labels=20, seed=7)
    train, test, info = split_by_relation_type(docs, num_unseen=5, seed=0)
    train_labels, test_labels = _label_set(train), _label_set(test)
    # SO3: zero-shot disjointness
    assert train_labels & test_labels == set()
    assert len(test_labels) == 5
    # skipped docs: train + test < total (mixing docs dropped)
    assert info["n_train"] + info["n_test"] <= 80
    assert info["n_test"] > 0 and info["n_train"] > 0


def test_split_deterministic(spark):
    docs = make_annotated_docs(spark, n_docs=60, n_labels=15, seed=3)
    _, t1, i1 = split_by_relation_type(docs, num_unseen=4, seed=11)
    _, t2, i2 = split_by_relation_type(docs, num_unseen=4, seed=11)
    assert i1["test_types"] == i2["test_types"]
    assert sorted(r.doc_id for r in t1.select("doc_id").collect()) == sorted(
        r.doc_id for r in t2.select("doc_id").collect()
    )


def test_unique_relations_sorted(spark):
    docs = make_annotated_docs(spark, n_docs=30, n_labels=8, seed=1)
    u = unique_relations(docs)
    assert u == sorted(u) and len(u) <= 8
