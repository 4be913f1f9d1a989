"""Zero-shot split replay (reference train.py:116-185,
``split_data_by_relation_type``).

Semantics reproduced exactly:
- shuffle the unique relation-type list with a seeded RNG; the first
  ``num_unseen`` types become candidate test types, the rest train
- a doc goes to test iff its relation types ⊆ test types, to train iff
  ⊆ train types, else it is SKIPPED (mixes both)
- accept the split iff the test docs cover exactly the originally
  requested number of unseen types; otherwise widen the candidate set
  by one (capped at 2x) and retry with a new seed

Spark shape: the retry loop is driver-side (as in the reference), but
each attempt is one distributed pass: per-doc label sets are computed
once and cached; an attempt is two subset predicates + one distinct
count — no shuffling of the corpus between attempts.

Determinism: the reference reseeds with random.randint; we derive
attempt seeds as seed0 + attempt so a given (corpus, seed0) always
yields the same split.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, functions as F


def doc_label_sets(annotated: DataFrame) -> DataFrame:
    """(doc_id, rel_types array<string>) from the relations column."""
    return annotated.select(
        "doc_id",
        F.array_distinct(
            F.transform(F.col("relations"), lambda r: r["relation_text"])
        ).alias("rel_types"),
    )


def unique_relations(annotated: DataFrame) -> list[str]:
    """A4: distinct relation_text over the corpus (train.py:106-112)."""
    rows = (
        annotated.select(
            F.explode(
                F.transform(F.col("relations"), lambda r: r["relation_text"])
            ).alias("rt")
        )
        .distinct()
        .collect()
    )
    return sorted(r.rt for r in rows)


def split_by_relation_type(
    annotated: DataFrame,
    num_unseen: int,
    seed: int = 0,
    max_attempts: int = 200,
) -> tuple[DataFrame, DataFrame, dict]:
    """Returns (train_docs, test_docs, info). Raises if no valid split in
    max_attempts (insufficient label diversity — reference loops forever)."""
    labels = unique_relations(annotated)
    per_doc = doc_label_sets(annotated).cache()
    original = num_unseen
    widen = num_unseen
    for attempt in range(max_attempts):
        rng = random.Random(seed + attempt)
        shuffled = labels[:]
        rng.shuffle(shuffled)
        test_types = set(shuffled[:widen])
        train_types = set(shuffled[widen:])
        t_arr = F.array(*[F.lit(x) for x in sorted(test_types)])
        tr_arr = F.array(*[F.lit(x) for x in sorted(train_types)])
        tagged = per_doc.withColumn(
            "in_test", F.forall("rel_types", lambda x: F.array_contains(t_arr, x))
        ).withColumn(
            "in_train", F.forall("rel_types", lambda x: F.array_contains(tr_arr, x))
        )
        test_ids = tagged.filter("in_test")
        covered = (
            test_ids.select(F.explode("rel_types").alias("rt")).distinct().count()
        )
        if covered == original:
            train_docs = annotated.join(
                tagged.filter("in_train AND NOT in_test").select("doc_id"),
                "doc_id", "left_semi",
            )
            test_docs = annotated.join(
                test_ids.select("doc_id"), "doc_id", "left_semi"
            )
            info = {
                "attempt": attempt,
                "widen": widen,
                "test_types": sorted(test_types),
                "n_train": train_docs.count(),
                "n_test": test_docs.count(),
            }
            per_doc.unpersist()
            return train_docs, test_docs, info
        widen = widen + 1 if widen < original * 2 else widen
    per_doc.unpersist()
    raise ValueError(
        f"no zero-shot split with exactly {original} unseen types "
        f"in {max_attempts} attempts (label diversity too low)"
    )
