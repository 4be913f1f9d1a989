"""Mention extraction + span hygiene (reference P10/P11/P12 semantics).

Mentions come from a gazetteer over the token stream (the deterministic
sandbox stand-in for an upstream NER stage — the reference likewise takes
`ner` as *given* input, glirel/model.py:496: NER spans are supplied, not
predicted). Everything downstream (dedup, overlap resolution, pair
generation) is exactly the reference's span hygiene:

- dedup spans on (start, end): glirel/modules/utils.py:6-36
- overlap resolution keep-longer: data/process_wiki_zsl.py:143-162
  (tie on equal length: keep the earlier start — deterministic total
  order, matches the reference's first-seen greedy on sorted input)
- token indices are end-INCLUSIVE internally (README.md:153)

All operators are native DataFrame ops: the gazetteer join broadcasts
(dimension table ~10 rows), the overlap self-join is intra-document and
shuffles once on doc_id — the same partitioning later reused by pair
generation, so Catalyst/AQE schedules one exchange for both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, Window as W

from glirel_spark import config


def gazetteer_df(spark: SparkSession) -> DataFrame:
    """Dimension table (surface text, n_tokens, entity type)."""
    rows = [(t, 1, ty) for t, ty in sorted(config.ENTITY_UNIGRAMS.items())] + [
        (f"{a} {b}", 2, ty) for (a, b), ty in sorted(config.ENTITY_BIGRAMS.items())
    ]
    return spark.createDataFrame(rows, "surface string, n_tokens int, type string")


def candidate_spans(docs_tokens: DataFrame) -> DataFrame:
    """(doc_id, tokens) -> candidate (doc_id, start, surface, n_tokens).

    Unigram and bigram candidates are built with pure array expressions
    and exploded once — a narrow stage, no shuffle.
    """
    toks = F.col("tokens")
    n = F.size(toks)
    uni = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.struct(
            i.cast("int").alias("start"),
            toks[i].alias("surface"),
            F.lit(1).alias("n_tokens"),
        ),
    )
    bi = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.struct(
                i.cast("int").alias("start"),
                F.concat_ws(" ", toks[i], toks[i + 1]).alias("surface"),
                F.lit(2).alias("n_tokens"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<start:int,surface:string,n_tokens:int>>"))
    return docs_tokens.select(
        "doc_id", F.explode(F.concat(uni, bi)).alias("c")
    ).select("doc_id", "c.start", "c.surface", "c.n_tokens")


def extract_mentions_raw(docs_tokens: DataFrame, gaz: DataFrame) -> DataFrame:
    """Gazetteer match -> raw mentions (pre-hygiene), end-inclusive."""
    cand = candidate_spans(docs_tokens)
    m = cand.join(F.broadcast(gaz), ["surface", "n_tokens"], "inner")
    return m.select(
        "doc_id",
        F.col("start"),
        (F.col("start") + F.col("n_tokens") - 1).cast("int").alias("end"),
        F.col("type"),
        F.col("surface").alias("text"),
    )


def dedup_spans(mentions: DataFrame) -> DataFrame:
    """P10: unique (start, end) per doc (utils.py:24-34)."""
    w = W.partitionBy("doc_id", "start", "end").orderBy("type", "text")
    return (
        mentions.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def resolve_overlaps(mentions: DataFrame) -> DataFrame:
    """P11 keep-longer overlap resolution (process_wiki_zsl.py:143-162).

    Remove span s when an overlapping span t in the same doc dominates
    it: longer, or equal length with an earlier start. One-pass
    dominance (not iterative): equivalent to the reference's greedy on
    this two-level (unigram vs bigram) hierarchy.

    INTENTIONAL DEVIATION from the reference tie-break: the reference
    removes a span only when strictly SHORTER in CHAR length, keeping
    both equal-length overlapping spans (e.g. 'sort merge'/'merge
    join'); this engine measures length in TOKENS and drops the
    later-starting of two equal-length overlapping spans. Rationale:
    a deterministic total order — results are identical under any
    partitioning and exactly replayable in the DuckDB oracle, whereas
    keep-both produces order-dependent pair lists downstream. The same
    rule is applied in the fused path (fused._hygiene_col) and the
    oracle (oracle.CTE_MENTIONS mkept), so all three stay row-identical.
    """
    s = mentions.alias("s")
    t = mentions.alias("t")
    overlap = ~((F.col("s.end") < F.col("t.start")) | (F.col("t.end") < F.col("s.start")))
    s_len = F.col("s.end") - F.col("s.start")
    t_len = F.col("t.end") - F.col("t.start")
    dominated = (t_len > s_len) | ((t_len == s_len) & (F.col("t.start") < F.col("s.start")))
    not_same = (F.col("s.start") != F.col("t.start")) | (F.col("s.end") != F.col("t.end"))
    losers = (
        s.join(t, on=[F.col("s.doc_id") == F.col("t.doc_id"), overlap, dominated, not_same])
        .select("s.doc_id", "s.start", "s.end")
        .distinct()
    )
    return mentions.join(losers, ["doc_id", "start", "end"], "left_anti")


def filter_long_entities(mentions: DataFrame, max_chars: int = 50) -> DataFrame:
    """P12: drop entities with text > max_chars (process_wiki_zsl.py:72)."""
    return mentions.filter(F.length("text") <= max_chars)


def number_mentions(mentions: DataFrame) -> DataFrame:
    """Assign m_id by (start, end) order within doc — the span-list order
    the reference's pair generation indexes into (base.py:175-196)."""
    w = W.partitionBy("doc_id").orderBy("start", "end")
    return mentions.withColumn("m_id", F.row_number().over(w) - 1)


def extract_mentions(docs_tokens: DataFrame, spark: SparkSession) -> DataFrame:
    """Full mention stage: gazetteer -> dedup -> long-filter -> overlap
    -> numbering. P12 runs BEFORE overlap resolution (reference order,
    process_wiki_zsl.py:72 then :143-162): an over-long entity must not
    dominate a shorter overlapping one it is about to be dropped for —
    same order as the fused path and the DuckDB oracle."""
    gaz = gazetteer_df(spark)
    raw = extract_mentions_raw(docs_tokens, gaz)
    return number_mentions(
        resolve_overlaps(filter_long_entities(dedup_spans(raw)))
    ).select("doc_id", "m_id", "start", "end", "type", "text")
