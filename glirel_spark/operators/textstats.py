"""Text analysis for training-data pipelines: quality scoring, token
stats, language-ID heuristic, document fingerprinting.

Quality metrics are pure built-in column expressions (JVM codegen'd,
no UDF): at 100 TB this stage is scan-bound, exactly as it should be.
The fingerprint is in corpus_dedup.fingerprint (shared with dedup).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from glirel_spark import config


def doc_quality(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, n_tokens, n_distinct, stop_ratio, mean_token_len,
    distinct_ratio, quality_score) — all exactly-rounded IEEE arithmetic
    on integer counts, so the oracle matches bit-for-bit.
    """
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(config.STOPWORDS))).cast("long")
    n_chars = F.length("text").cast("long")
    stop_ratio = n_stop.cast("double") / n_tokens
    distinct_ratio = n_distinct.cast("double") / n_tokens
    mean_token_len = (n_chars - (n_tokens - 1)).cast("double") / n_tokens
    # simple composite: favor mid-length docs with lexical diversity and
    # a sane stopword rate (the usual C4/Gopher-style heuristics shape)
    quality = distinct_ratio * F.least(n_tokens.cast("double") / 64.0, F.lit(1.0))
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        stop_ratio.alias("stop_ratio"),
        distinct_ratio.alias("distinct_ratio"),
        mean_token_len.alias("mean_token_len"),
        quality.alias("quality_score"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace + BPE-ish subword estimate.

    bpe_estimate: words of length L cost ceil(L / 4) subword units — the
    standard chars/4 rule of thumb, computed exactly so it is
    oracle-checkable.
    """
    toks = F.split(F.col("text"), " ")
    ws = F.size(toks).cast("long")
    bpe = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("long"),
    )
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
    )


# --- language ID ------------------------------------------------------------
# Tiny character-bigram profiles (hand-built, deterministic). The real
# corpus carries a `lang` column; this heuristic exists as the operator a
# production pipeline would run on raw text. Vectorized pandas UDF —
# the Arrow-batched slow path, used only when native exprs can't express it.

_PROFILES: dict[str, dict[str, float]] = {
    "en": {"th": 3.0, "he": 2.5, "in": 2.0, "er": 2.0, "an": 1.8, " t": 1.5},
    "de": {"en": 2.5, "er": 2.5, "ch": 2.2, "de": 2.0, "ei": 1.8, "sc": 1.5},
    "fr": {"es": 2.2, "le": 2.2, "de": 2.0, "en": 1.8, "re": 1.6, "qu": 1.5},
    "es": {"de": 2.2, "en": 2.0, "la": 2.0, "el": 1.8, "os": 1.8, "ar": 1.5},
}

_LANGID_SCHEMA = T.StructType(
    [
        T.StructField("lang_pred", T.StringType()),
        T.StructField("lang_score", T.DoubleType()),
    ]
)


@F.pandas_udf(_LANGID_SCHEMA)
def langid_udf(texts: pd.Series) -> pd.DataFrame:
    preds, scores = [], []
    for t in texts:
        if not t:
            preds.append("und")
            scores.append(0.0)
            continue
        best_lang, best = "und", 0.0
        n_bigrams = max(len(t) - 1, 1)
        for lang, prof in sorted(_PROFILES.items()):
            s = sum(w * t.count(bg) for bg, w in prof.items()) / n_bigrams
            if s > best:
                best_lang, best = lang, s
        preds.append(best_lang)
        scores.append(best if math.isfinite(best) else 0.0)
    return pd.DataFrame({"lang_pred": preds, "lang_score": scores})


def lang_id(docs: DataFrame) -> DataFrame:
    out = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        langid_udf(F.col("text")).alias("r"),
    )
    return out.select("doc_id", "r.lang_pred", "r.lang_score")
