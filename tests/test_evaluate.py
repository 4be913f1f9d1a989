"""Evaluator replay: J5 annotated-pairs filter (evaluator.py:80-86),
per-label counts (evaluator.py:89-101), micro/macro P/R/F1 with
zero-division->0 (_prf_divide semantics), threshold search argmax."""

from __future__ import annotations

import pytest

from glirel_spark.operators.evaluate import (
    annotated_pairs_filter,
    best_threshold,
    micro_macro,
    per_label_counts,
)

POS = "doc_id string, h_start int, h_end int, t_start int, t_end int, label string"


def _df(spark, rows):
    return spark.createDataFrame(rows, POS)


def test_annotated_pairs_filter_position_only(spark):
    gold = _df(spark, [("d", 0, 0, 1, 1, "feeds")])
    preds = _df(spark, [
        ("d", 0, 0, 1, 1, "related to"),  # same positions, ANY label -> kept
        ("d", 5, 5, 6, 6, "feeds"),       # unannotated positions -> dropped
    ])
    out = annotated_pairs_filter(preds, gold).collect()
    assert [r.label for r in out] == ["related to"]


def test_counts_and_micro_macro(spark):
    gold = _df(spark, [
        ("d", 0, 0, 1, 1, "feeds"),
        ("d", 2, 2, 3, 3, "feeds"),
        ("d", 4, 4, 5, 5, "used by"),
    ])
    preds = _df(spark, [
        ("d", 0, 0, 1, 1, "feeds"),      # tp
        ("d", 2, 2, 3, 3, "used by"),    # wrong label -> fp for used by
    ])
    counts = {r.label: (r.tp, r.pred_n, r.true_n)
              for r in per_label_counts(preds, gold).collect()}
    assert counts == {"feeds": (1, 1, 2), "used by": (0, 1, 1)}

    m = micro_macro(per_label_counts(preds, gold)).collect()[0]
    assert m.micro_precision == pytest.approx(1 / 2)
    assert m.micro_recall == pytest.approx(1 / 3)
    assert m.micro_f1 == pytest.approx(2 * 0.5 * (1 / 3) / (0.5 + 1 / 3))
    # macro: feeds P=1,R=.5,F=2/3 ; used by P=0,R=0,F=0 (zero-div -> 0)
    assert m.macro_precision == pytest.approx(0.5)
    assert m.macro_recall == pytest.approx(0.25)
    assert m.macro_f1 == pytest.approx((2 / 3) / 2)


def test_zero_division_safety(spark):
    gold = _df(spark, [("d", 0, 0, 1, 1, "feeds")])
    preds = _df(spark, [])
    m = micro_macro(per_label_counts(preds, gold)).collect()[0]
    assert m.micro_precision == 0.0 and m.micro_f1 == 0.0


def test_best_threshold_argmax_tie_lowest(spark):
    rows = [(0.1, 0.5, 0.5, 0.5, 0.5, 0.5, 0.7),
            (0.3, 0.5, 0.5, 0.5, 0.5, 0.5, 0.9),
            (0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.9)]
    df = spark.createDataFrame(
        rows,
        "threshold double, micro_precision double, micro_recall double, "
        "micro_f1 double, macro_precision double, macro_recall double, "
        "macro_f1 double",
    )
    assert best_threshold(df).collect()[0].threshold == 0.3
