"""Deterministic annotated-document fixtures (the sample.jsonl shape,
README.md:155-185 / FIXTURES.md §2) for zero-shot-split and parity
tests. No external data: corpus synthesized from a seeded RNG over the
engine's own gazetteer and label set.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession

ANNOTATED_SCHEMA = (
    "doc_id string, tokenized_text array<string>, "
    "ner array<struct<start:int, end:int, type:string, text:string>>, "
    "relations array<struct<"
    "head:struct<mention:string, position:array<int>, type:string>, "
    "tail:struct<mention:string, position:array<int>, type:string>, "
    "relation_id:string, relation_text:string>>"
)

_FILLER = ["the", "fast", "slow", "big", "small", "data", "row", "value"]
_ENTS = [("spark", "TOOL"), ("customer", "ACTOR"), ("table", "OBJECT"),
         ("query", "EVENT"), ("vector", "OBJECT"), ("window", "OBJECT")]


def make_annotated_docs(
    spark: SparkSession,
    n_docs: int = 60,
    n_labels: int = 30,
    seed: int = 42,
) -> DataFrame:
    """Docs with 2-4 entities and 1-3 relations drawn from n_labels
    synthetic relation types ('rel_00'..'rel_NN', Wikidata-style ids).
    Invariants guaranteed (utils.py:39-64): unique span positions, unique
    relation position pairs, endpoints ∈ ner."""
    rng = random.Random(seed)
    rows = []
    labels = [f"rel_{i:02d}" for i in range(n_labels)]
    for d in range(n_docs):
        n_ents = rng.randint(2, 4)
        ents = rng.sample(_ENTS, n_ents)
        tokens: list[str] = []
        ner = []
        for text, typ in ents:
            tokens.extend(rng.sample(_FILLER, rng.randint(1, 3)))
            start = len(tokens)
            tokens.append(text)
            ner.append((start, start, typ, text))  # end-inclusive
        tokens.extend(rng.sample(_FILLER, 2))
        pairs = [(i, j) for i in range(n_ents) for j in range(n_ents) if i != j]
        rng.shuffle(pairs)
        rels = []
        for i, j in pairs[: rng.randint(1, min(3, len(pairs)))]:
            h, t = ner[i], ner[j]
            lab = labels[rng.randrange(n_labels)]
            rels.append(
                (
                    (h[3], [h[0], h[1]], h[2]),
                    (t[3], [t[0], t[1]], t[2]),
                    f"P{labels.index(lab)}",
                    lab,
                )
            )
        rows.append((f"d{d:03d}", tokens, ner, rels))
    return spark.createDataFrame(rows, ANNOTATED_SCHEMA)
