"""Multimodal columns: opaque binary payloads + typed metadata.

Media spans in the interleaved corpus carry a ``media_ref``; this module
gives them a real Spark-side life: a binary payload column, typed
metadata, and a decode/feature-extract stage with production plumbing
(schema, partitioning, Arrow batch shape via mapInPandas).

The actual codec decode is STUBBED — the container has no image/audio
libraries. ``decode_media`` raises NotImplementedError by design;
``fake_decode_features`` is the deterministic stand-in the tests and
bench use (byte histogram + moments computed with numpy over Arrow
batches). The UDF signature, batching, and schema are exactly what a
real decoder would use — swap the inner function, keep the plan.

Payload synthesis is deterministic integer arithmetic
(byte[i] = (doc_id * 31 + i * 17) mod 256), so the Spark-side plumbing
is DuckDB-oracle-checkable end-to-end without any media libs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from glirel_spark import config


def media_table(interleaved: DataFrame) -> DataFrame:
    """Explode media spans -> (doc_id, media_ref, media_idx, payload,
    meta struct). Payload bytes are synthesized deterministically."""
    spans = interleaved.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "s")
    ).filter(F.col("s.kind") == "media")
    did = F.col("doc_id").cast("long")
    n = config.MEDIA_N_BYTES
    byte_arr = F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda i: ((did * 31 + i * 17) % 256).cast("int"),
    )
    return spans.select(
        "doc_id",
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("media_idx"),
        byte_arr.alias("payload_bytes"),
        F.struct(
            F.lit("image/synthetic").alias("mime"),
            F.lit(n).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_media(media: DataFrame) -> DataFrame:
    """Real codec decode — NOT AVAILABLE in this container.

    On a cluster: mapInPandas with PIL/torchaudio/pyav in the inner
    loop, same schema as fake_decode_features.
    """
    raise NotImplementedError(
        "media codecs are not installed in this environment; "
        "use fake_decode_features (identical plan shape)"
    )


_FEATURE_SCHEMA = (
    "doc_id string, media_ref string, n_bytes long, byte_sum long, "
    "byte_mean double, n_distinct int"
)


def fake_decode_features(media: DataFrame) -> DataFrame:
    """Deterministic feature extraction over Arrow batches (mapInPandas).

    Stands in for decode+resize+featurize: numpy over the whole batch,
    never per-row Python. Feature math is integer/exact so the oracle
    can replay it.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arrs = [np.asarray(a, dtype=np.int64) for a in pdf["payload_bytes"]]
            mat = np.stack(arrs) if arrs else np.zeros((0, config.MEDIA_N_BYTES), np.int64)
            sums = mat.sum(axis=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "n_bytes": np.full(len(pdf), mat.shape[1] if len(pdf) else 0, np.int64),
                    "byte_sum": sums,
                    "byte_mean": sums / mat.shape[1] if len(pdf) else sums.astype(float),
                    "n_distinct": np.array(
                        [len(np.unique(a)) for a in arrs], dtype=np.int32
                    ) if arrs else np.array([], dtype=np.int32),
                }
            )

    return media.select("doc_id", "media_ref", "payload_bytes").mapInPandas(
        extract, _FEATURE_SCHEMA
    )


def media_stats(interleaved: DataFrame) -> DataFrame:
    """Per-document interleave accounting straight off the input-hint
    schema: span counts by kind and the media fraction — the sanity
    panel a multimodal ingest job reports per partition.

    Pure higher-order array expressions over the ``spans`` column (one
    filter + size per kind), no explode: a row-local projection that
    whole-stage codegen keeps inside the scan at any corpus size.
    """
    spans = F.col("spans")
    n_spans = F.size(spans).cast("long")
    n_media = F.size(
        F.filter(spans, lambda s: s["kind"] == "media")
    ).cast("long")
    n_text = (n_spans - n_media).cast("long")
    return interleaved.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        n_spans.alias("n_spans"),
        n_text.alias("n_text_spans"),
        n_media.alias("n_media_spans"),
        (n_media.cast("double") / n_spans.cast("double")).alias("media_frac"),
    )
