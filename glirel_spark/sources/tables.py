"""Table IO: scale-factor directory loader + the interleaved corpus.

At production scale the `documents` table is an Iceberg table of
interleaved text + media documents
``(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``
(BASELINE.json input_hint). The sandbox has no Iceberg catalog jars, so
``TableIO`` abstracts the storage: parquet paths here, ``writeTo(...)``
Iceberg identifiers on a cluster. Everything above the IO layer sees
only DataFrames.

The interleaved table is synthesized *deterministically and
Spark-natively* (pure array expressions, no per-row Python, no shuffle)
from the driver's flat `documents` parquet — a narrow map-only stage
that would scale linearly on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from glirel_spark import config

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# tokens per text span in the synthetic interleave
_CHUNK = 12
# after text-chunk i of doc d, a media span is inserted iff
# (d*7 + i) % 5 == 0  (~20% media spans, per FIXTURES.md guidance)
_MEDIA_EVERY = 5


class TableIO:
    """Thin storage abstraction (parquet sandbox / Iceberg cluster)."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir

    def table(self, name: str) -> DataFrame:
        return self.spark.read.parquet(f"{self.sf_dir}/{name}.parquet")

    def write(self, df: DataFrame, path: str, partition_by: list[str] | None = None,
              mode: str = "overwrite") -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    io = TableIO(spark, sf_dir)
    return {t: io.table(t) for t in config.TABLES}


def interleaved_documents(flat_docs: DataFrame) -> DataFrame:
    """flat (doc_id, text, ...) -> interleaved spans table.

    Output schema is exactly the BASELINE.json input_hint shape:
      doc_id string,
      spans array<struct<kind:string, text:string, media_ref:string, offset:int>>

    Pure narrow transformation: ``split`` -> chunked ``sequence`` ->
    ``flatten(transform(...))`` with media spans interleaved, offsets
    re-numbered with the index-aware ``transform``. Catalyst keeps this
    in a single whole-stage-codegen map; at 10^12 docs it is an
    embarrassingly parallel scan.
    """
    from glirel_spark.functions.barrier import materialized

    # materialize the token array: the chunk lambda slices it per chunk,
    # and Catalyst would otherwise inline (re-split) per reference
    flat_docs = flat_docs.withColumn("_toks", materialized(F.split(F.col("text"), " ")))
    toks = F.col("_toks")
    n_chunks = F.ceil(F.size(toks) / F.lit(_CHUNK)).cast("int")
    did = F.col("doc_id").cast("long")

    # per chunk i: the text span, optionally followed by a media span
    chunked = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.when(
            ((did * 7 + i) % _MEDIA_EVERY) == 0,
            F.array(
                F.struct(
                    F.lit("text").alias("kind"),
                    F.array_join(F.slice(toks, i * _CHUNK + 1, _CHUNK), " ").alias("text"),
                    F.lit(None).cast("string").alias("media_ref"),
                    F.lit(0).alias("offset"),
                ),
                F.struct(
                    F.lit("media").alias("kind"),
                    F.lit(None).cast("string").alias("text"),
                    F.concat(F.lit("media://"), F.col("doc_id").cast("string"),
                             F.lit("/"), i.cast("string")).alias("media_ref"),
                    F.lit(0).alias("offset"),
                ),
            ),
        ).otherwise(
            F.array(
                F.struct(
                    F.lit("text").alias("kind"),
                    F.array_join(F.slice(toks, i * _CHUNK + 1, _CHUNK), " ").alias("text"),
                    F.lit(None).cast("string").alias("media_ref"),
                    F.lit(0).alias("offset"),
                )
            )
        ),
    )
    flat = F.flatten(chunked)
    spans = F.transform(
        flat,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return flat_docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        spans.alias("spans"),
    )


def text_of(interleaved: DataFrame) -> DataFrame:
    """Re-assemble the token stream from kind='text' spans.

    Media columns are pruned by Catalyst (nested-field pruning) — only
    spans.kind / spans.text are read from storage for text-only stages.
    """
    text_spans = F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("text"))
    joined = F.array_join(F.transform(text_spans, lambda s: s["text"]), " ")
    return interleaved.select("doc_id", joined.alias("text"))


def span_sequence_signature(interleaved: DataFrame) -> DataFrame:
    """Per-row invariant key: the (kind, text, media_ref, order) sequence.

    BASELINE.json input_hint requires span-sequence equality vs the
    reference representation; two tables agree iff the anti-join of their
    signatures is empty (see operators/validate.check_span_equality).
    """
    sig = F.to_json(
        F.transform(
            F.col("spans"),
            lambda s: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        )
    )
    return interleaved.select("doc_id", sig.alias("span_signature"))
