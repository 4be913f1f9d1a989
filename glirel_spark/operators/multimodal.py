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


def media_reuse(interleaved: DataFrame) -> DataFrame:
    """Cross-document media deduplication by CONTENT fingerprint:
    (content_fp, n_copies, n_docs, canonical_ref, bytes_saved) — the
    storage-dedup pass a multimodal corpus runs before training (the
    same image embedded by thousands of pages should be fetched,
    decoded, and stored once).

    Scale shape: the payload never shuffles. The rolling polynomial
    fingerprint folds the payload bytes to one 8-byte key inside the
    scan stage (map-side, whole-stage codegen), so the single groupBy
    exchanges only (fp, doc_id, ref) rows — at petabyte media scale the
    shuffle is ~30 bytes per media span, not the payloads. Map-side
    combine applies to the count; canonical pick is min(media_ref)
    (deterministic). ``bytes_saved = (n_copies - 1) * n_bytes`` is the
    integer-exact storage-win accounting.

    On this corpus payloads depend on doc_id mod 256 (byte[j] =
    (doc_id*31 + j*17) mod 256), so genuine cross-doc reuse exists at
    every SF and the oracle replays the fingerprint byte-for-byte.
    """
    media = media_table(interleaved)
    fp = F.aggregate(
        F.col("payload_bytes"),
        F.lit(0).cast("long"),
        lambda acc, b: (
            acc * F.lit(config.FINGERPRINT_BASE) + b.cast("long")
        ) % F.lit(config.HASH_P),
    )
    per_ref = media.select("doc_id", "media_ref", fp.alias("content_fp"))
    n = F.count(F.lit(1))
    return per_ref.groupBy("content_fp").agg(
        n.cast("long").alias("n_copies"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.min("media_ref").alias("canonical_ref"),
        ((n - 1) * F.lit(config.MEDIA_N_BYTES)).cast("long").alias("bytes_saved"),
    )


# ---------------------------------------------------------------------------
# Interleaved-sequence operators (round 4): caption pairing, ref integrity,
# media-atomic chunking, and media evidence for extracted triples.
# ---------------------------------------------------------------------------

def caption_pairs(interleaved: DataFrame) -> DataFrame:
    """(doc_id, media_ref, media_offset, caption, caption_n_tokens):
    pair every media span with its preceding text span — the standard
    caption-mining step that turns an interleaved text+media corpus
    into (image, caption) training pairs.

    By the interleave construction a media span always follows its
    chunk's text span, but the operator guards offset 0 anyway (a real
    corpus can open with media; those rows emit a NULL caption rather
    than stealing the previous document's trailing text).

    Plan shape: one index-aware ``transform`` + ``filter`` to find
    media positions, ``element_at`` back into the same array for the
    neighbor, one ``explode`` (narrow generate). No shuffle, no UDF —
    a row-local scan at any corpus size.
    """
    spans = F.col("spans")
    med_pos = F.filter(
        F.transform(
            spans,
            lambda s, i: F.when(s["kind"] == F.lit("media"), i).otherwise(F.lit(-1)),
        ),
        lambda x: x >= 0,
    )
    rows = interleaved.select(
        "doc_id", F.col("spans").alias("_spans"),
        F.explode(med_pos).alias("k"),
    )
    k = F.col("k")
    media = F.element_at("_spans", k + 1)  # element_at is 1-based
    caption = F.when(k > 0, F.element_at("_spans", k)["text"])
    return rows.select(
        "doc_id",
        media["media_ref"].alias("media_ref"),
        k.cast("int").alias("media_offset"),
        caption.alias("caption"),
        F.when(
            caption.isNotNull(), F.size(F.split(caption, " "))
        ).otherwise(F.lit(0)).cast("int").alias("caption_n_tokens"),
    )


def media_ref_audit(interleaved: DataFrame) -> DataFrame:
    """Per-document media_ref integrity accounting: the ingest-time
    audit a multimodal pipeline runs before fetching payloads.

    (doc_id, n_refs, n_wellformed, n_doc_match, n_distinct, chunk_sum)
    — well-formed means ``media://<digits>/<digits>``; doc_match means
    the embedded doc id equals the row's; chunk_sum folds the parsed
    chunk indices so the value varies per document (a content check,
    not just counts). All higher-order array expressions inside one
    whole-stage-codegen projection — zero shuffle, zero explode.
    """
    refs = F.transform(
        F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("media")),
        lambda s: s["media_ref"],
    )
    wellformed = F.filter(refs, lambda r: r.rlike(r"^media://[0-9]+/[0-9]+$"))
    doc_match = F.filter(
        wellformed,
        lambda r: F.element_at(F.split(r, "/"), 3) == F.col("doc_id"),
    )
    chunk_sum = F.aggregate(
        wellformed,
        F.lit(0).cast("long"),
        lambda acc, r: acc + F.element_at(F.split(r, "/"), 4).cast("long"),
    )
    return interleaved.select(
        "doc_id",
        F.size(refs).cast("long").alias("n_refs"),
        F.size(wellformed).cast("long").alias("n_wellformed"),
        F.size(doc_match).cast("long").alias("n_doc_match"),
        F.size(F.array_distinct(refs)).cast("long").alias("n_distinct"),
        chunk_sum.alias("chunk_sum"),
    )


def interleaved_chunks(
    interleaved: DataFrame,
    budget: int = config.INTERLEAVED_CHUNK_BUDGET,
    media_cost: int = config.MEDIA_TOKEN_COST,
) -> DataFrame:
    """Media-atomic token-budget chunking of the interleaved sequence:
    every span lands in chunk ``floor(tokens_before_it / budget)``, a
    media span costing a fixed ``media_cost`` tokens (its placeholder
    budget in a multimodal context window). Spans are never split, so
    media stays atomic and (kind, text, media_ref, order) is preserved
    within each chunk — the packing step for multimodal sequence
    training the input-hint schema exists for.

    (doc_id, chunk_id, n_spans, n_media, n_tokens, first_offset,
    last_offset).

    Plan shape: per-row prefix sums via ``transform`` over
    ``slice``+``aggregate`` (quadratic in the per-doc span count, ~40
    here — cheap against a shuffle), then one narrow ``explode`` of the
    per-chunk summary structs. Zero exchanges: an embarrassingly
    parallel scan at 10^12 documents. The ``materialized`` barrier
    stops CollapseProject re-deriving the cost array once per chunk
    (the O(n^3) trap documented in functions/barrier.py).
    """
    from glirel_spark.functions.barrier import materialized

    span_cost = lambda s: (
        F.when(s["kind"] == F.lit("media"), F.lit(media_cost))
        .otherwise(F.size(F.split(s["text"], " ")))
        .cast("long")
    )
    is_media = lambda s: F.when(
        s["kind"] == F.lit("media"), F.lit(1)
    ).otherwise(F.lit(0)).cast("long")
    d = interleaved.filter(F.size("spans") > 0).select(
        "doc_id",
        materialized(F.transform("spans", span_cost)).alias("costs"),
        F.transform("spans", is_media).alias("medias"),
    )
    n = F.size("costs")
    cums = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda k: F.aggregate(
            F.slice("costs", 1, k), F.lit(0).cast("long"), lambda a, x: a + x
        ),
    )
    cids = F.transform(cums, lambda cb: F.floor(cb / F.lit(budget)))
    d = d.select("doc_id", "costs", "medias", materialized(cids).alias("cids"))
    max_cid = F.element_at("cids", -1)
    idxs = F.sequence(F.lit(1), F.size("cids"))  # 1-based span positions
    in_chunk = lambda cid: F.filter(
        idxs, lambda j: F.element_at(F.col("cids"), j) == cid
    )
    per_chunk = F.transform(
        F.sequence(F.lit(0).cast("long"), max_cid),
        lambda cid: F.struct(
            cid.alias("chunk_id"),
            F.size(in_chunk(cid)).cast("long").alias("n_spans"),
            F.aggregate(
                in_chunk(cid),
                F.lit(0).cast("long"),
                lambda a, j: a + F.element_at(F.col("medias"), j),
            ).alias("n_media"),
            F.aggregate(
                in_chunk(cid),
                F.lit(0).cast("long"),
                lambda a, j: a + F.element_at(F.col("costs"), j),
            ).alias("n_tokens"),
            (F.array_min(in_chunk(cid)) - 1).cast("int").alias("first_offset"),
            (F.array_max(in_chunk(cid)) - 1).cast("int").alias("last_offset"),
        ),
    )
    # A span whose single cost exceeds `budget` makes floor(cum/budget)
    # skip chunk ids; drop those empty placeholder chunks so the output
    # matches the oracle (which only emits non-empty chunks).
    per_chunk = F.filter(per_chunk, lambda c: c["n_spans"] > 0)
    rows = d.select("doc_id", F.explode(per_chunk).alias("c"))
    return rows.select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.n_spans").alias("n_spans"),
        F.col("c.n_media").alias("n_media_spans"),
        F.col("c.n_tokens").alias("n_tokens"),
        F.col("c.first_offset").alias("first_offset"),
        F.col("c.last_offset").alias("last_offset"),
    )


def media_evidence(triples: DataFrame, docs_tokens: DataFrame) -> DataFrame:
    """Attach to every extracted triple the media span nearest its head
    mention — multimodal KG grounding: (subj, pred, obj) plus the
    image the claim sits next to, the evidence pairing a multimodal KG
    or a vision-grounded distant-supervision set trains on.

    Nearest is in chunk units (the interleave's 12-token text chunks).
    Media chunks obey the corpus rule (a media span follows chunk i iff
    (doc_id*7 + i) % 5 == 0), i.e. exactly the chunks congruent to
    r = (-7*doc_id) mod 5 — so the nearest one is CLOSED-FORM integer
    arithmetic (lower/upper congruent neighbor, pick the closer; the
    two distances sum to 5 so ties are impossible). Documents with no
    media chunk emit NULL media columns.

    Plan shape: one equi-join of triples against the (doc_id, n_chunks)
    projection of documents — both sides already keyed by doc_id (the
    decode agg partitions by the pair key whose prefix is doc_id), so
    at scale this reuses the existing exchange; everything else is a
    whole-stage-codegen projection. On a real corpus (media positions
    not rule-derivable) the same operator shape holds with the media
    offsets read from the spans column instead of computed.
    """
    from glirel_spark.sources.tables import _CHUNK, _MEDIA_EVERY

    nch = docs_tokens.select(
        "doc_id",
        F.ceil(F.size("tokens") / F.lit(_CHUNK)).cast("long").alias("n_chunks"),
    )
    j = triples.join(nch, "doc_id")
    did = F.col("doc_id").cast("long")
    c = (F.col("head_start").cast("long") / F.lit(_CHUNK)).cast("long")
    m = F.lit(_MEDIA_EVERY)
    r = F.pmod(F.lit(-7) * did, m)
    lo = c - F.pmod(c - r, m)  # largest i <= c with i ≡ r (mod 5); may be < 0
    hi = lo + m                # smallest i > c with i ≡ r (mod 5)
    n = F.col("n_chunks")
    best = (
        F.when((lo >= 0) & (hi < n), F.when((c - lo) <= (hi - c), lo).otherwise(hi))
        .when(lo >= 0, lo)
        .when(hi < n, hi)
    )
    return j.select(
        "doc_id",
        F.col("head_text").alias("subj"),
        F.col("label").alias("pred"),
        F.col("tail_text").alias("obj"),
        "prob",
        c.alias("head_chunk"),
        best.alias("media_chunk"),
        F.abs(best - c).alias("chunk_distance"),
        F.when(
            best.isNotNull(),
            F.concat(
                F.lit("media://"), F.col("doc_id").cast("string"),
                F.lit("/"), best.cast("string"),
            ),
        ).alias("media_ref"),
    )
