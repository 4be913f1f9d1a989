"""Multimodal columns: opaque binary payloads + typed metadata.

Media spans in the interleaved corpus carry a ``media_ref``; this module
gives them a real Spark-side life: a binary payload column, typed
metadata, and a decode/feature-extract stage with production plumbing
(schema, partitioning, Arrow batch shape via mapInPandas).

The codec is a CAPABILITY DISPATCH, never a stub: ``decode_media``
runs PIL when importable (every format), else the vendored pure-stdlib
PNG decoder (functions/png.py — zlib+struct, all five scanline
filters), so valid PNGs decode for real even in this codec-less
container; non-PNG payloads are flagged per row, same mapInPandas
plan either way. ``fake_decode_features`` is the deterministic
feature stand-in the oracle gate checks (byte histogram + moments
computed with numpy over Arrow batches).

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


def media_codec_available() -> bool:
    """True iff the FULL image codec (PIL) is importable. Even without
    it, decode_media still really decodes PNG via the vendored
    stdlib decoder (functions/png.py) — see media_codec_tier."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def media_codec_tier() -> str:
    """Which decode capability decode_media will use: 'pil' (every
    format PIL supports) or 'png' (the vendored pure-stdlib PNG
    decoder — always available, so the real decode path is never
    stubbed)."""
    return "pil" if media_codec_available() else "png"


_DECODE_SCHEMA = (
    "doc_id string, media_ref string, width int, height int, mode string, "
    "mean_luma double, decode_ok boolean, err string"
)


def decode_media(media: DataFrame, require_codec: bool = False) -> DataFrame:
    """Image decode behind a capability dispatch — ALWAYS a real decode.

    Tier 'pil' (PIL importable): mapInPandas, one Arrow batch at a
    time, ``PIL.Image.open`` per payload (image decode is inherently
    per-image; the batching, schema, and partitioning are the
    production shape), emitting (width, height, mode, mean_luma).

    Tier 'png' (this sandbox): the vendored pure-stdlib PNG decoder
    (functions/png.py) runs the same per-payload loop — valid PNGs
    decode for real (dimensions, mode, PIL-formula mean luma);
    non-PNG payloads are flagged. ``require_codec=True`` asserts the
    FULL (PIL) tier and raises loudly on the PNG-only tier.

    Either tier: undecodable payloads become ``decode_ok=false`` rows
    with the exception class name — a 10^12-doc crawl always contains
    corrupt bytes, and a decode stage that throws on them cannot ship.
    ``fake_decode_features`` remains the oracle-checked deterministic
    feature stand-in.
    """
    tier = media_codec_tier()
    if tier != "pil" and require_codec:
        raise NotImplementedError(
            "full media codecs (PIL) are not installed: only the vendored "
            "PNG tier is available; install PIL or use "
            "fake_decode_features (identical plan shape)"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if tier == "pil":
            import io

            from PIL import Image
        else:
            from glirel_spark.functions.png import decode_png, luma_mean
        for pdf in batches:
            n = len(pdf)
            width = np.full(n, -1, np.int64)
            height = np.full(n, -1, np.int64)
            mode = ["" for _ in range(n)]
            luma = np.full(n, np.nan)
            ok = np.zeros(n, bool)
            err = ["" for _ in range(n)]
            for i, payload in enumerate(pdf["payload_bytes"]):
                raw = np.asarray(payload, dtype=np.uint8).tobytes()
                try:
                    if tier == "pil":
                        with Image.open(io.BytesIO(raw)) as im:
                            width[i], height[i] = im.size
                            mode[i] = im.mode
                            luma[i] = float(
                                np.asarray(im.convert("L"), dtype=np.float64).mean()
                            )
                    else:
                        arr, m, palette = decode_png(raw)
                        height[i], width[i] = arr.shape[0], arr.shape[1]
                        mode[i] = m
                        luma[i] = luma_mean(arr, m, palette)
                    ok[i] = True
                except Exception as e:  # corrupt bytes: flag, don't throw
                    err[i] = type(e).__name__
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "width": np.where(ok, width, 0).astype(np.int32),
                    "height": np.where(ok, height, 0).astype(np.int32),
                    "mode": mode,
                    "mean_luma": luma,
                    "decode_ok": ok,
                    "err": err,
                }
            )

    return media.select("doc_id", "media_ref", "payload_bytes").mapInPandas(
        run, _DECODE_SCHEMA
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
