"""Round-6 fused-plan equivalence: the per-row lexical argmax decode and
the fused threshold search must be ROW-IDENTICAL to the relational forms
they replace (crossJoin + threshold + per-pair argmax aggregation, and
the scored-relation grid search)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glirel_spark import config
from glirel_spark.operators import decode as decode_ops
from glirel_spark.operators import evaluate
from glirel_spark.operators import pairs as pair_ops
from glirel_spark.operators import scoring

SF = "/root/testdata/sf0.001"


def _rows(df, cols=None):
    cols = cols or sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def rel(spark):
    from glirel_spark.plans import pipeline

    return pair_ops.relation_pairs(pipeline.pairs(spark, SF))


def test_lexical_topk1_equals_relational_decode(spark, rel):
    ldf = scoring.labels_df(spark)
    general = decode_ops.decode(
        scoring.score_pairs_lexical(rel, ldf), config.THRESHOLD, 1
    )
    fused = scoring.lexical_topk1_triples(rel, threshold=config.THRESHOLD)
    assert fused.columns == general.columns
    assert _rows(fused) == _rows(general)


def test_lexical_topk1_custom_labels_with_coref(spark, rel):
    """Custom dict incl. the SELF coref special and partial constraints —
    the api.extract_triples generality the fused path must keep."""
    labels = {
        "used by": {"allowed_head": ["TOOL"], "allowed_tail": ["ACTOR"]},
        "feeds": {"allowed_tail": ["EVENT", "OBJECT"]},
        config.COREF_LABEL: {},
    }
    from glirel_spark.plans.api import labels_df_from_dict

    ldf = labels_df_from_dict(spark, labels)
    general = decode_ops.decode(
        scoring.score_pairs_lexical(rel, ldf), 0.3, 1
    )
    fused = scoring.lexical_topk1_triples(rel, labels, threshold=0.3)
    assert _rows(fused) == _rows(general)


def test_lexical_label_raws_match_lexical_raw(spark, rel):
    labs = sorted(config.RELATION_LABELS)
    fused_cols = scoring.lexical_label_raws(labs)
    sample = rel.limit(200).select(
        "h_text", "t_text", "dist",
        *[c.alias(f"_f{i}") for i, c in enumerate(fused_cols)],
        *[
            scoring.lexical_raw(
                F.col("h_text"), F.col("t_text"), F.lit(lab), F.col("dist")
            ).alias(f"_g{i}")
            for i, lab in enumerate(labs)
        ],
    )
    for r in sample.collect():
        for i in range(len(labs)):
            assert r[f"_f{i}"] == r[f"_g{i}"]


def test_pred_type_signature_decoded_input_equals_scored(spark, rel):
    from glirel_spark.operators import graph as graph_ops

    s = scoring.score_pairs_lexical(rel, scoring.labels_df(spark))
    via_scored = graph_ops.pred_type_signature(s)
    via_decoded = graph_ops.pred_type_signature(
        decoded=scoring.lexical_topk1_triples(rel, formatted=False)
    )
    assert via_decoded.columns == via_scored.columns
    assert _rows(via_decoded) == _rows(via_scored)


def test_threshold_search_lexical_equals_scored_form(spark, rel):
    ldf = scoring.labels_df(spark)
    scored = scoring.score_pairs_lexical(rel, ldf).cache()
    general = evaluate.threshold_search(scored, evaluate.gold_triples(scored))
    fused = evaluate.threshold_search_lexical(rel)
    assert fused.columns == general.columns
    assert _rows(fused) == _rows(general)
    scored.unpersist()


def test_eval_counts_lexical_equals_scored_chain(spark, rel):
    from glirel_spark.operators import pairs as pair_ops  # noqa: F401
    from glirel_spark.plans import pipeline

    SFD = SF
    s = scoring.score_pairs_lexical(rel, scoring.labels_df(spark)).cache()
    gold = evaluate.gold_triples(s)
    preds = pipeline._eval_preds(spark, SFD)
    general = evaluate.per_label_counts(
        evaluate.annotated_pairs_filter(preds, gold), gold
    )
    fused = evaluate.eval_counts_lexical(rel)
    assert sorted(fused.columns) == sorted(general.columns)
    assert _rows(fused) == _rows(general)
    s.unpersist()


def test_threshold_search_lexical_dup_grid_and_raw_min(spark, rel):
    """Duplicate grid values + non-default gold cut: same counts both
    forms (the r5 duplicate-grid-dedup fix must survive the rewrite)."""
    grid = [0.2, 0.5, 0.2, 0.05]
    ldf = scoring.labels_df(spark)
    scored = scoring.score_pairs_lexical(rel, ldf).cache()
    general = evaluate.threshold_search(
        scored, evaluate.gold_triples(scored, raw_min=80), grid=grid
    )
    fused = evaluate.threshold_search_lexical(rel, grid=grid, raw_min=80)
    assert _rows(fused) == _rows(general)
    scored.unpersist()
