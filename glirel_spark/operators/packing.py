"""Training-data packing and chunking operators.

Two shapes every LLM pretraining pipeline needs over a tokenized corpus:

- ``token_blocks`` — GPT-style sequence packing ("concat then chunk"):
  every document's token stream plus one EOS position is concatenated in
  doc_id order and chopped into fixed-size training blocks. The global
  token offset of each document is a DISTRIBUTED PREFIX SUM: a two-phase
  scan (per-range-partition running totals, then a tiny partition-offset
  frame cumulated and broadcast back), never a single global window — a
  global ``Window.orderBy`` with no partitioning collapses the corpus
  onto one task, the classic scale killer this module exists to avoid.
  Block membership is then pure per-row arithmetic: a document spanning
  global positions [s, e) touches blocks s DIV B .. (e-1) DIV B, and its
  contribution to block b is ``min(e,(b+1)B) - max(s, bB)`` — O(len/B)
  generated rows per doc, NO per-token explode.

- ``doc_chunks`` — RAG-style overlapping chunk windows (window W, stride
  S): per-doc array arithmetic only (sequence + slice + fold), zero
  shuffle before the final explode; the chunk content hash folds the
  per-token polynomial ids (corpus_dedup._char_hash, the same arithmetic
  family as the dedup sketches) so chunk-level dedup/joins compose with
  the rest of the corpus plane.

Both are replayed bit-for-bit by the DuckDB oracle
(oracle_corpus.q_token_blocks / q_doc_chunks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from glirel_spark import config
from glirel_spark.functions.barrier import materialized
from glirel_spark.operators.corpus_dedup import _char_hash


def _with_global_offset(d: DataFrame, key: str, val: str) -> DataFrame:
    """+ column ``s`` = sum of ``val`` over all rows with ``key`` < this
    row's key (a distributed exclusive prefix sum, ordered by ``key``).

    Phase 1: range-partition on the key (range partition ids are
    monotone in the key order), cumulate within each partition.
    Phase 2: per-partition totals — at most ``defaultParallelism`` rows —
    are cumulated with a single tiny window and broadcast back as
    per-partition base offsets. The only full-data movement is the range
    repartition; the only ordered window runs over the P-row totals
    frame, bounded by the cluster's partition count, not the data.
    """
    spark = d.sparkSession
    target = spark.sparkContext.defaultParallelism
    p = d.repartitionByRange(target, key).withColumn("_pid", F.spark_partition_id())
    w_in = (
        Window.partitionBy("_pid")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = p.withColumn("_cum", F.sum(val).over(w_in))
    totals = within.groupBy("_pid").agg(F.sum(val).alias("_tot"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = totals.select(
        "_pid", F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).cast("long").alias("_off")
    )
    return (
        within.join(F.broadcast(offs), "_pid")
        .withColumn("s", (F.col("_off") + F.col("_cum") - F.col(val)).cast("long"))
        .drop("_pid", "_cum", "_off")
    )


def token_blocks(docs_tokens: DataFrame, block: int = config.PACK_BLOCK) -> DataFrame:
    """(block_id, n_positions, n_docs, first_doc, last_doc): the packed
    pretraining blocks of the concatenated corpus token stream.

    Every doc contributes size(tokens) + 1 positions (trailing EOS, the
    GPT convention); blocks are ``block`` positions wide; every block is
    full except the last. Deterministic in doc_id order regardless of
    input partitioning (the prefix sum fixes the global layout).
    """
    d = docs_tokens.select(
        "doc_id", (F.size("tokens") + F.lit(1)).cast("long").alias("sl")
    )
    g = _with_global_offset(d, "doc_id", "sl")
    rows = g.select(
        "doc_id", "s", (F.col("s") + F.col("sl")).alias("e")
    ).select(
        "doc_id",
        "s",
        "e",
        F.explode(
            F.sequence(F.expr(f"s DIV {block}"), F.expr(f"(e - 1) DIV {block}"))
        ).alias("block_id"),
    )
    lo = F.col("block_id") * block
    contrib = F.least(F.col("e"), lo + block) - F.greatest(F.col("s"), lo)
    return (
        rows.withColumn("_n", contrib.cast("long"))
        .groupBy("block_id")
        .agg(
            F.sum("_n").cast("long").alias("n_positions"),
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


def doc_chunks(
    docs_tokens: DataFrame,
    w: int = config.RAG_CHUNK_W,
    stride: int = config.RAG_CHUNK_STRIDE,
) -> DataFrame:
    """(doc_id, chunk_id, start, chunk_len, chunk_hash): overlapping
    retrieval chunks. n_chunks = 1 for docs of <= w tokens, else
    1 + ceil((n - w) / stride) (integer form), so the last chunk always
    has at least one token and every token is covered.

    The token-id array goes through the ``materialized`` barrier so the
    per-chunk slice+fold reads a computed array instead of re-running
    the per-character hash once per chunk (CollapseProject would inline
    it — the O(n^2) trap documented in functions/barrier.py).
    """
    nch = F.when(F.size("tokens") <= w, F.lit(1).cast("long")).otherwise(
        F.expr(f"CAST((size(tokens) - {w} + {stride} - 1) DIV {stride} + 1 AS LONG)")
    )
    d = docs_tokens.select(
        "doc_id",
        materialized(F.transform("tokens", _char_hash)).alias("tids"),
        F.size("tokens").cast("long").alias("n"),
        nch.alias("nch"),
    )
    rows = d.select(
        "doc_id",
        "tids",
        "n",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("nch") - 1)).alias(
            "chunk_id"
        ),
    )
    start = (F.col("chunk_id") * stride).cast("long")
    clen = F.least(F.lit(w).cast("long"), F.col("n") - start)
    chash = F.aggregate(
        F.slice("tids", (start + 1).cast("int"), clen.cast("int")),
        F.lit(0).cast("long"),
        lambda a, x: (a * config.SHINGLE_BASE + x) % config.HASH_P,
    )
    return rows.select(
        "doc_id",
        "chunk_id",
        start.alias("start"),
        clen.alias("chunk_len"),
        chash.alias("chunk_hash"),
    )


def packing_stats(
    docs_tokens: DataFrame, block: int = config.PACK_BLOCK
) -> DataFrame:
    """(n_blocks_spanned, n_docs): how many documents span how many
    packed blocks — the packing-efficiency census (a doc crossing K
    boundaries is attention-truncated K times under concat-then-chunk,
    the number a curriculum or sequence-length decision reads first).

    Reuses the distributed prefix-sum layout; the span count is pure
    arithmetic per doc — ``(e-1) DIV B - s DIV B + 1`` — and the
    histogram key space is bounded by max_doc_len/B.
    """
    d = docs_tokens.select(
        "doc_id", (F.size("tokens") + F.lit(1)).cast("long").alias("sl")
    )
    g = _with_global_offset(d, "doc_id", "sl")
    spans = g.select(
        F.expr(f"((s + sl - 1) DIV {block}) - (s DIV {block}) + 1").alias(
            "n_blocks_spanned"
        )
    )
    return spans.groupBy("n_blocks_spanned").agg(
        F.count("*").cast("long").alias("n_docs")
    )


def interleaved_blocks(
    interleaved: DataFrame,
    block: int = config.PACK_BLOCK,
    media_cost: int = config.MEDIA_TOKEN_COST,
) -> DataFrame:
    """Multimodal sequence packing: concatenate the interleaved corpus
    in doc_id order — every text token one position, every media span
    ``media_cost`` placeholder positions, one trailing EOS per doc —
    and cut fixed ``block``-position pretraining windows.

    (block_id, n_positions, n_docs, n_media_spans, first_doc,
    last_doc): n_media_spans counts media spans whose placeholder run
    STARTS inside the block, so a data loader knows how many images
    each window fetches.

    Plan shape: per-doc totals and media start offsets are row-local
    array folds; the global layout is the same two-phase distributed
    prefix sum token_blocks uses (_with_global_offset — one range
    repartition + a P-row window); block attribution is arithmetic
    (explode over the spanned block range), then ONE aggregation.
    Deterministic under any input partitioning.
    """
    span_cost = lambda s: (
        F.when(s["kind"] == F.lit("media"), F.lit(media_cost))
        .otherwise(F.size(F.split(s["text"], " ")))
        .cast("long")
    )
    d = interleaved.select(
        "doc_id",
        materialized(F.transform("spans", span_cost)).alias("costs"),
        F.transform(
            "spans",
            lambda s: F.when(s["kind"] == F.lit("media"), F.lit(1))
            .otherwise(F.lit(0)).cast("int"),
        ).alias("medias"),
    )
    idx = F.sequence(F.lit(1), F.size("costs"))
    cum_before = lambda j: F.aggregate(
        F.slice("costs", 1, j - 1), F.lit(0).cast("long"), lambda a, x: a + x
    )
    medstarts = F.filter(
        F.transform(
            idx,
            lambda j: F.when(
                F.element_at("medias", j) == 1, cum_before(j)
            ).otherwise(F.lit(-1).cast("long")),
        ),
        lambda x: x >= 0,
    )
    d = d.select(
        "doc_id",
        (F.aggregate("costs", F.lit(0).cast("long"), lambda a, x: a + x) + 1)
        .alias("sl"),
        materialized(medstarts).alias("medstarts"),
    )
    g = _with_global_offset(d, "doc_id", "sl")
    rows = g.select(
        "doc_id", "s", (F.col("s") + F.col("sl")).alias("e"), "medstarts",
    ).select(
        "doc_id", "s", "e", "medstarts",
        F.explode(
            F.sequence(F.expr(f"s DIV {block}"), F.expr(f"(e - 1) DIV {block}"))
        ).alias("block_id"),
    )
    lo = F.col("block_id") * block
    contrib = F.least(F.col("e"), lo + block) - F.greatest(F.col("s"), lo)
    # integer range test (never float division): media start position
    # s + m lies in [block_id*block, (block_id+1)*block)
    n_med = F.size(
        F.filter(
            F.col("medstarts"),
            lambda m: ((F.col("s") + m) >= lo) & ((F.col("s") + m) < lo + block),
        )
    )
    return (
        rows.withColumn("_n", contrib.cast("long"))
        .withColumn("_m", n_med.cast("long"))
        .groupBy("block_id")
        .agg(
            F.sum("_n").cast("long").alias("n_positions"),
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_m").cast("long").alias("n_media_spans"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )
