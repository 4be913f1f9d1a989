"""Decode: threshold -> top-k per pair -> constraints -> output format.

Reference semantics reproduced:

- threshold on sigmoid prob (glirel/model.py:383, 419-427)  [P6]
- top_k per (head_pos, tail_pos): sort by score desc, keep first k per
  position pair (glirel/model.py:560-583)                    [W1]
  — tie-break: ascending label string (the reference relies on python
  stable sort; ours is a defined total order so results are stable
  under any partitioning)
- entity-type constraint filter (glirel/modules/utils.py:67-81,
  applied after top-k as in spacy_integration.py:113-116)    [P9]
- output boundary: end index +1 restores the exclusive (spaCy)
  convention (glirel/model.py:592-596)                       [F4]

All native window/filter ops; the window partitions by (doc_id, pair
position), which is already the partitioning produced by the scoring
join — no extra exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, Window as W

from glirel_spark import config

PAIR_KEY = ["doc_id", "h_start", "h_end", "t_start", "t_end"]


def threshold_filter(scored: DataFrame, threshold: float = config.THRESHOLD) -> DataFrame:
    return scored.filter(F.col("prob") > F.lit(threshold))


def top_k_per_pair(scored: DataFrame, k: int = config.TOP_K) -> DataFrame:
    """k == 1 (the reference's eval setting) runs as an AGGREGATION, not
    a window: min(struct(-prob, label, payload)) per pair key gets
    map-side partial combine, so the shuffle carries ONE row per pair
    instead of one per (pair, label). Measured at 160k docs / 131M
    scored rows: the window variant did not scale past 2 executors (the
    full candidate relation shuffles into per-pair sorts); the agg
    variant shrinks shuffle volume by |labels| x and scales linearly.
    Identical rows to the window form (struct comparison is prob desc,
    then label asc — the same deterministic tie-break).
    """
    if k == 1:
        payload = [c for c in scored.columns]
        best = scored.groupBy(*PAIR_KEY).agg(
            F.min(
                F.struct(
                    (-F.col("prob")).alias("_np"),
                    F.col("label").alias("_lab"),
                    *[F.col(c).alias(f"_p_{c}") for c in payload],
                )
            ).alias("_best")
        )
        return best.select(
            *[F.col(f"_best._p_{c}").alias(c) for c in payload]
        )
    w = W.partitionBy(*PAIR_KEY).orderBy(F.desc("prob"), F.asc("label"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def constraint_filter(triples: DataFrame) -> DataFrame:
    """P9: keep triple iff head/tail types are allowed for the label.

    Expects allowed_head/allowed_tail columns (NULL = unconstrained)
    already present from the label dimension join.
    """
    head_ok = F.col("allowed_head").isNull() | F.array_contains(
        F.col("allowed_head"), F.col("h_type")
    )
    tail_ok = F.col("allowed_tail").isNull() | F.array_contains(
        F.col("allowed_tail"), F.col("t_type")
    )
    return triples.filter(head_ok & tail_ok)


def format_output(triples: DataFrame) -> DataFrame:
    """Final output shape (glirel/model.py:587-604): exclusive end (+1),
    head/tail text, label, score."""
    return triples.select(
        "doc_id",
        F.col("h_start").alias("head_start"),
        (F.col("h_end") + 1).alias("head_end"),
        F.col("t_start").alias("tail_start"),
        (F.col("t_end") + 1).alias("tail_end"),
        F.col("h_text").alias("head_text"),
        F.col("t_text").alias("tail_text"),
        "label",
        "raw",
        "prob",
    )


_SLIM_COLS = PAIR_KEY + ["label", "raw", "prob", "h_type", "t_type"]


def decode(
    scored: DataFrame,
    threshold: float = config.THRESHOLD,
    top_k: int = config.TOP_K,
    apply_constraints: bool = True,
    mention_texts: DataFrame | None = None,
    labels: DataFrame | None = None,
) -> DataFrame:
    """threshold -> top-k -> constraints -> format.

    When ``mention_texts`` (doc_id, start, end, text) and ``labels`` (the
    broadcastable label dimension) are given, the top-k shuffle carries
    ONLY the slim pair relation (keys + label + raw + prob + types);
    mention surface strings and the constraint arrays join back against
    the post-threshold post-top-k survivors. At web scale the string
    payload dominates shuffle bytes, and the survivors are >=|labels| x
    fewer rows than the scored relation — identical output rows either
    way, because (pair key, label) already determines the row.
    """
    out = threshold_filter(scored, threshold)
    slim = mention_texts is not None and labels is not None
    if slim:
        out = out.select(*[c for c in _SLIM_COLS if c in out.columns])
    out = top_k_per_pair(out, top_k)
    if slim:
        m = mention_texts.select("doc_id", "start", "end", "text")
        h = m.toDF("doc_id", "h_start", "h_end", "h_text")
        t = m.toDF("doc_id", "t_start", "t_end", "t_text")
        out = (
            out.join(h, ["doc_id", "h_start", "h_end"])
            .join(t, ["doc_id", "t_start", "t_end"])
            .join(F.broadcast(labels), "label", "left")
        )
    if apply_constraints:
        out = constraint_filter(out)
    return format_output(out)
