"""Tokenization (reference P1: regex ``\\w+(?:[-_]\\w+)*|\\S`` with char
offsets — glirel/model.py:518-531, custom_tokenizers.py:15-21).

Two implementations with identical semantics:

- ``tokens_native``: JVM-side ``regexp_extract_all`` — stays inside
  whole-stage codegen, the hot path at 100 TB. Produces tokens only
  (no char offsets; token indices are what the pipeline keys on).
- ``tokenize_with_offsets``: Arrow-vectorized pandas UDF that also
  returns per-token char offsets (needed only at the text-output
  boundary, e.g. to map triples back into raw character space).

tests/test_tokenize.py asserts the two agree token-for-token.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, functions as F, types as T

from glirel_spark.config import TOKEN_REGEX

_TOKEN_RE = re.compile(TOKEN_REGEX)


def tokens_native(text: Column) -> Column:
    """array<string> of tokens, computed JVM-side (codegen'd)."""
    return F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0)


_OFFSET_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("token", T.StringType()),
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
        ]
    )
)


@F.pandas_udf(_OFFSET_SCHEMA)
def tokenize_with_offsets(texts: pd.Series) -> pd.Series:
    """Vectorized regex tokenizer preserving char offsets.

    Mirrors the token/start/end triple built at
    glirel/model.py:523-527 (start_token_idx_to_text_idx /
    end_token_idx_to_text_idx).
    """

    def one(t: str | None):
        if t is None:
            return None
        return [
            {"token": m.group(), "start": m.start(), "end": m.end()}
            for m in _TOKEN_RE.finditer(t)
        ]

    return texts.map(one)


def tokenize_py(text: str) -> list[tuple[str, int, int]]:
    """Driver/test helper: same regex, plain Python."""
    return [(m.group(), m.start(), m.end()) for m in _TOKEN_RE.finditer(text)]
