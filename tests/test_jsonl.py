"""Reference-format JSONL ingestion -> engine relations -> end-to-end
neural extraction on external-NER input (the switch-over path a
reference user takes)."""

from __future__ import annotations

import json

from glirel_spark.sources.jsonl import (
    docs_tokens_from_jsonl,
    gold_relations_from_jsonl,
    mentions_from_jsonl,
    read_reference_jsonl,
)

# the reference README's own public example documents (README.md:150-185)
DOCS = [
    {
        "ner": [[7, 7, "Q4914513", "Binsey"], [11, 12, "Q19686", "River Thames"]],
        "relations": [
            {
                "head": {"mention": "Binsey", "position": [7, 7], "type": "LOC"},
                "tail": {"mention": "River Thames", "position": [11, 12], "type": "Q19686"},
                "relation_text": "located in or next to body of water",
            }
        ],
        "tokenized_text": "The race took place between Godstow and Binsey along the Upper River Thames .".split(),
    },
    {
        "ner": [[9, 10, "Q4386693", "Legislative Assembly"], [1, 3, "Q1848835", "Parliament of Victoria"]],
        "relations": [
            {
                "head": {"mention": "Legislative Assembly", "position": [9, 10], "type": "Q4386693"},
                "tail": {"mention": "Parliament of Victoria", "position": [1, 3], "type": "Q1848835"},
                "relation_text": "part of",
            }
        ],
        "tokenized_text": "The Parliament of Victoria consists of the lower house Legislative Assembly , the upper house Legislative Council and the Queen of Australia .".split(),
    },
]


def _write(tmp_path):
    p = tmp_path / "sample.jsonl"
    p.write_text("\n".join(json.dumps(d) for d in DOCS) + "\n")
    return str(p)


def test_jsonl_roundtrip_relations(spark, tmp_path):
    df = read_reference_jsonl(spark, _write(tmp_path))
    assert df.count() == 2
    toks = {r.doc_id: r.tokens for r in docs_tokens_from_jsonl(df).collect()}
    assert sorted(len(t) for t in toks.values()) == [14, 23]
    ments = mentions_from_jsonl(df).collect()
    assert len(ments) == 4
    assert {(m.start, m.end, m.text) for m in ments} >= {(7, 7, "Binsey"), (11, 12, "River Thames")}
    gold = gold_relations_from_jsonl(df).collect()
    assert {(g.h_start, g.t_start, g.label) for g in gold} == {
        (7, 11, "located in or next to body of water"),
        (9, 1, "part of"),
    }


def test_jsonl_duplicate_lines_collapse(spark, tmp_path):
    p = tmp_path / "dup.jsonl"
    line = json.dumps(DOCS[0])
    p.write_text(line + "\n" + line + "\n")
    assert read_reference_jsonl(spark, str(p)).count() == 1


def test_jsonl_to_neural_triples_end_to_end(spark, tmp_path):
    """External-NER JSONL through pair generation + the tensor-plane
    scorer: positions in the output must be drawn from the input ner
    spans (+1 on the end at the output boundary, reference
    model.py:592-596)."""
    from glirel_spark.model.udf import neural_triples

    df = read_reference_jsonl(spark, _write(tmp_path))
    out = neural_triples(
        docs_tokens_from_jsonl(df), mentions_from_jsonl(df), threshold=0.0
    ).collect()
    assert len(out) > 0
    spans = {(m.doc_id, m.start, m.end) for m in mentions_from_jsonl(df).collect()}
    for r in out:
        assert (r.doc_id, r.head_start, r.head_end - 1) in spans
        assert (r.doc_id, r.tail_start, r.tail_end - 1) in spans


def test_reference_eval_protocol_on_jsonl(spark, tmp_path):
    """Full zero-shot eval replay: labels from the file, tensor-plane
    scoring, J5 filter, J4 counts, A1/A2 metrics — deterministic."""
    from glirel_spark.plans.refeval import evaluate_jsonl

    path = _write(tmp_path)
    counts, metrics = evaluate_jsonl(spark, path, threshold=0.0)
    rows = counts.collect()
    file_labels = {"located in or next to body of water", "part of"}
    assert {r.label for r in rows} <= file_labels and rows
    m = metrics.collect()[0]
    for f in ("micro_precision", "micro_recall", "micro_f1",
              "macro_precision", "macro_recall", "macro_f1"):
        assert 0.0 <= getattr(m, f) <= 1.0
    # deterministic across invocations (seeded scorer, no RNG at eval)
    _, metrics2 = evaluate_jsonl(spark, path, threshold=0.0)
    assert metrics2.collect()[0] == m


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    """Mangled lines (truncated JSON, valid JSON missing
    tokenized_text) must be dropped from the document feed and exposed
    by the quarantine reader — never propagate as null-token docs."""
    from glirel_spark.sources.jsonl import corrupt_reference_jsonl

    p = tmp_path / "dirty.jsonl"
    good = json.dumps(DOCS[0])
    truncated = good[: len(good) // 2]
    missing_field = json.dumps({"ner": [], "relations": []})
    p.write_text("\n".join([good, truncated, missing_field, "", good]) + "\n")

    docs = read_reference_jsonl(spark, str(p))
    assert docs.count() == 1  # the duplicate good line collapses too
    assert docs.filter("tokenized_text IS NULL").count() == 0

    bad = corrupt_reference_jsonl(spark, str(p)).collect()
    assert sorted(r.value for r in bad) == sorted([truncated, missing_field])
