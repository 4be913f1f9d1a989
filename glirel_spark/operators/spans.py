"""Span-level operators from the reference that sit outside the main
pipeline: greedy non-overlapping span selection (W3) and entity-marker
insertion (P13).

- greedy_search (evaluator.py:172-215): sort spans by prob desc, keep a
  span iff it doesn't overlap any kept span (flat mode) or only nests
  (non-flat). Sequential-greedy per doc -> applyInPandas (spans per doc
  are small; the reference imports it at model.py:16 but the shipped
  predict path takes NER as given).
- insert_entity_markers (base.py:12-57): wrap each mention with [E]/[/E]
  and shift all span indices; off in shipped configs
  (config_wiki_zsl.yaml:39) but part of the operator surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


def _overlaps(s1, e1, s2, e2) -> bool:
    if (s1, e1) == (s2, e2):
        return True
    return not (s1 > e2 or s2 > e1)


def _nested(s1, e1, s2, e2) -> bool:
    return (s1 <= s2 and e1 >= e2) or (s2 <= s1 and e2 >= e1)


def greedy_select_spans(spans: DataFrame, flat: bool = True) -> DataFrame:
    """(doc_id, start, end, type, prob) -> kept spans.

    Reference greedy_search semantics incl. the flat/nested overlap
    predicates (evaluator.py:176-197) and final start-ascending order.
    """

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = pdf.sort_values(
            ["prob", "start", "end"], ascending=[False, True, True]
        ).itertuples(index=False)
        kept: list[tuple] = []
        for r in rows:
            clash = False
            for k in kept:
                if flat:
                    if _overlaps(r.start, r.end, k[1], k[2]):
                        clash = True
                        break
                else:
                    ov = _overlaps(r.start, r.end, k[1], k[2])
                    if ov and not (
                        _nested(r.start, r.end, k[1], k[2])
                        and (r.start, r.end) != (k[1], k[2])
                    ):
                        clash = True
                        break
            if not clash:
                kept.append((r.doc_id, r.start, r.end, r.type, r.prob))
        out = pd.DataFrame(
            kept, columns=["doc_id", "start", "end", "type", "prob"]
        ).sort_values("start")
        return out

    return spans.groupBy("doc_id").applyInPandas(
        per_doc, "doc_id string, start int, end int, type string, prob double"
    )


def insert_entity_markers(
    tokens: Column, ments: Column, open_tok: str = "[E]", close_tok: str = "[/E]"
) -> Column:
    """P13 (base.py:12-57): marked token array for one row.

    ``ments`` must be the sorted, NON-OVERLAPPING mention array (the
    hygiene output guarantees this). The open marker of span k (0-based
    rank) itself precedes the span, so the remapping implemented by
    remapped_mentions is
    new_start = start + 2 * rank + 1, new_end = end + 2 * rank + 1.
    """
    n = F.size(tokens)

    def piece(m, i):
        # tokens between previous mention end and this mention start
        prev_end = F.when(i == 0, F.lit(0)).otherwise(
            F.element_at(ments, i)["end"] + 1  # element_at is 1-based: previous
        )
        before = F.slice(tokens, prev_end + 1, m["start"] - prev_end)
        inside = F.slice(tokens, m["start"] + 1, m["end"] - m["start"] + 1)
        return F.concat(
            before, F.array(F.lit(open_tok)), inside, F.array(F.lit(close_tok))
        )

    pieces = F.flatten(F.transform(ments, piece))
    last_end = F.when(
        F.size(ments) > 0, F.element_at(ments, -1)["end"] + 1
    ).otherwise(F.lit(0))
    tail = F.slice(tokens, last_end + 1, n - last_end)
    return F.concat(pieces, tail)


def remapped_mentions(ments: Column) -> Column:
    """Marker-shifted span indices for the array produced above."""
    return F.transform(
        ments,
        lambda m, i: F.struct(
            m["m_id"].alias("m_id"),
            (m["start"] + 2 * i + 1).cast("int").alias("start"),
            (m["end"] + 2 * i + 1).cast("int").alias("end"),
            m["type"].alias("type"),
            m["text"].alias("text"),
        ),
    )
