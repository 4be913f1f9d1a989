"""Decode semantics: threshold (model.py:419-427), top-k per pair
(model.py:560-583), constraint filter (utils.py:67-81), end+1 output
convention (model.py:592-596)."""

from __future__ import annotations

from glirel_spark.operators.decode import (
    constraint_filter,
    decode,
    threshold_filter,
    top_k_per_pair,
)

SCHEMA = (
    "doc_id string, h_start int, h_end int, t_start int, t_end int, "
    "h_type string, t_type string, h_text string, t_text string, "
    "label string, raw int, prob double, "
    "allowed_head array<string>, allowed_tail array<string>"
)


def _scored(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _row(doc="d", h=(0, 0), t=(1, 1), ht="TOOL", tt="ACTOR", htx="spark",
         ttx="customer", label="used by", raw=90, prob=0.9,
         ah=None, at=None):
    return (doc, h[0], h[1], t[0], t[1], ht, tt, htx, ttx, label, raw, prob, ah, at)


def test_threshold_strictly_greater(spark):
    df = _scored(spark, [_row(prob=0.5), _row(label="feeds", prob=0.51)])
    out = threshold_filter(df, 0.5).collect()
    assert [r.label for r in out] == ["feeds"]  # prob > t, not >=


def test_top_k_per_pair_and_tiebreak(spark):
    rows = [
        _row(label="related to", prob=0.9),
        _row(label="depends on", prob=0.9),   # tie -> label asc wins
        _row(label="feeds", prob=0.8),
        _row(t=(2, 2), label="feeds", prob=0.7),  # different pair kept
    ]
    out = top_k_per_pair(_scored(spark, rows), k=1).collect()
    got = sorted((r.t_start, r.label) for r in out)
    assert got == [(1, "depends on"), (2, "feeds")]

    out2 = top_k_per_pair(_scored(spark, rows), k=2).collect()
    assert sorted(r.label for r in out2 if r.t_start == 1) == [
        "depends on", "related to",
    ]


def test_constraint_filter_null_unconstrained(spark):
    rows = [
        _row(label="used by", ah=["TOOL"], at=["ACTOR"]),          # pass
        _row(label="used by", ht="EVENT", ah=["TOOL"], at=["ACTOR"]),  # head fails
        _row(label="depends on", ah=None, at=None),                # unconstrained
        _row(label="runs on", tt="OBJECT", ah=None, at=["TOOL"]),  # tail fails
    ]
    out = constraint_filter(_scored(spark, rows)).collect()
    assert sorted(r.label for r in out) == ["depends on", "used by"]


def test_end_plus_one_output_convention(spark):
    df = _scored(spark, [_row(h=(3, 4), t=(7, 7), prob=0.9)])
    out = decode(df, threshold=0.5, top_k=1).collect()[0]
    assert (out.head_start, out.head_end) == (3, 5)   # inclusive -> exclusive
    assert (out.tail_start, out.tail_end) == (7, 8)
    assert out.head_text == "spark" and out.label == "used by"
