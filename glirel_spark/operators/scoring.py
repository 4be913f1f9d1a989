"""Pair × label scoring — relational plane.

Two scorers share the decode pipeline (threshold/top-k/constraints):

- ``lexical_score``: a deterministic, *SQL-expressible* scorer (integer
  arithmetic + one exactly-rounded IEEE division). It is the
  oracle-checked twin: DuckDB computes bit-identical probabilities, so
  the entire decode path is value-hash verified end-to-end.
- the tensor-plane scorer (glirel_spark/model/scorer.py): the GLiREL
  architecture (label-prompt × span-pair reps, dot scorer — reference
  T1-T13) as a vectorized mapInPandas stage.

Both emit the same (pair, label, score, prob) shape; decode does not
care which produced it. Coref label semantics: prob 1.0 iff the two
mention texts match (the SELF coreference convention of
glirel/modules/utils.py:120-127 reduced to a deterministic rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from glirel_spark import config


def labels_df(spark: SparkSession, include_coref: bool = False) -> DataFrame:
    """Broadcastable label dimension with entity-type constraints.

    NULL allowed_head/allowed_tail = unconstrained
    (glirel/modules/utils.py:76-79: `.get(..., rel_types)` default).
    """
    rows = []
    for label, c in sorted(config.RELATION_LABELS.items()):
        rows.append((label, c.get("allowed_head"), c.get("allowed_tail")))
    if include_coref:
        rows.append((config.COREF_LABEL, None, None))
    return spark.createDataFrame(
        rows, "label string, allowed_head array<string>, allowed_tail array<string>"
    )


def lexical_raw(h_text: Column, t_text: Column, label: Column, dist: Column) -> Column:
    """Integer score in [0, SCORE_MOD): the SQL-expressible test scorer."""
    c = config
    return (
        F.lit(c.SCORE_W_HLEN) * F.length(h_text)
        + F.lit(c.SCORE_W_TLEN) * F.length(t_text)
        + F.lit(c.SCORE_W_LLEN) * F.length(label)
        + F.lit(c.SCORE_W_DIST) * dist
        + F.lit(c.SCORE_W_HCH) * F.ascii(h_text)
        + F.lit(c.SCORE_W_TCH) * F.ascii(t_text)
        + F.lit(c.SCORE_W_LCH) * F.ascii(label)
    ) % F.lit(c.SCORE_MOD)


def score_pairs_lexical(rel_pairs: DataFrame, labels: DataFrame) -> DataFrame:
    """pairs × labels -> scored candidates.

    The label table is tiny -> broadcast nested-loop-free cross join
    (Catalyst turns crossJoin(broadcast(...)) into BroadcastNestedLoopJoin
    with no shuffle of the big side).
    """
    scored = rel_pairs.crossJoin(F.broadcast(labels))
    raw = F.when(
        F.col("label") == config.COREF_LABEL,
        F.when(F.col("h_text") == F.col("t_text"), F.lit(config.SCORE_MOD - 1)).otherwise(F.lit(0)),
    ).otherwise(
        lexical_raw(F.col("h_text"), F.col("t_text"), F.col("label"), F.col("dist"))
    )
    return scored.withColumn("raw", raw.cast("int")).withColumn(
        "prob", F.col("raw").cast("double") / F.lit(float(config.SCORE_MOD - 1))
    )


# --- fused k=1 decode (round-6 optimization) --------------------------------
#
# The label dimension is a COMPILE-TIME constant of the lexical scorer
# (its per-label score contribution is W_LLEN*len(label) +
# W_LCH*ascii(label) — a literal), so for top_k=1 the whole
# crossJoin(labels) -> threshold -> per-pair argmax aggregation chain
# collapses into a per-ROW argmax over |labels| integer expressions:
# zero shuffles, no |labels|x row expansion, no wide payload struct
# through an exchange (guide §2.4 "remove shuffles outright" + §2.3
# "aggregate before you shuffle" taken to its limit). Row-identical to
# the relational form (tests/test_fused_decode.py): threshold-then-
# argmax == argmax-then-threshold at k=1, and the when-chain over
# label-ascending order reproduces the min(struct(-prob, label))
# tie-break exactly.


def lexical_base() -> "F.Column":
    """The label-independent part of ``lexical_raw`` over a pair row."""
    c = config
    return (
        F.lit(c.SCORE_W_HLEN) * F.length("h_text")
        + F.lit(c.SCORE_W_TLEN) * F.length("t_text")
        + F.lit(c.SCORE_W_DIST) * F.col("dist")
        + F.lit(c.SCORE_W_HCH) * F.ascii("h_text")
        + F.lit(c.SCORE_W_TCH) * F.ascii("t_text")
    )


def lexical_label_raws(labels: list[str], base: "F.Column | None" = None) -> "list[F.Column]":
    """Per-label raw-score column over a pair row (h_text, t_text, dist).

    Bit-identical to ``lexical_raw`` with the label terms constant-folded
    in python: integer addition is associative, and F.length/F.ascii of a
    literal ASCII label are len()/ord() of its first char. Pass ``base``
    (e.g. a materialized ``lexical_base()`` column) to keep every raw a
    3-node expression — callers that reference the raws several times
    otherwise inline the base per reference.
    """
    c = config
    if base is None:
        base = lexical_base()
    out = []
    for lab in labels:
        if lab == c.COREF_LABEL:
            out.append(
                F.when(
                    F.col("h_text") == F.col("t_text"), F.lit(c.SCORE_MOD - 1)
                ).otherwise(F.lit(0))
            )
        else:
            k = c.SCORE_W_LLEN * len(lab) + c.SCORE_W_LCH * ord(lab[0])
            out.append((base + F.lit(k)) % F.lit(c.SCORE_MOD))
    return out


def lexical_topk1_triples(
    rel_pairs: DataFrame,
    labels: dict[str, dict[str, list[str]]] | None = None,
    threshold: float = config.THRESHOLD,
    apply_constraints: bool = True,
    formatted: bool = True,
) -> DataFrame:
    """Fused k=1 lexical decode: one narrow projection from pairs to
    formatted triples (see module comment above). Row-identical to
    ``decode.decode(score_pairs_lexical(rel_pairs, labels_df), threshold,
    top_k=1)`` — the general relational path remains for top_k > 1 and
    for scorers whose label scores are not row-local."""
    from glirel_spark.operators import decode as decode_ops

    from glirel_spark.functions.barrier import materialized

    if labels is None:
        labels = config.RELATION_LABELS
    labs = sorted(labels)
    if not labs:
        raise ValueError("lexical_topk1_triples needs a non-empty label set")
    # The shared label-independent base term is materialized ONCE per
    # row (barrier): without it each of the |labels| raw expressions
    # inlines the 15-node base at every reference (greatest + the
    # argmax when-chain), and the resulting projection pushed the
    # Generate stage's consume method past janino's 64 KB limit —
    # silently dropping the whole stage out of codegen (the sweep
    # log's "Code grows beyond 64 KB"). With the base hoisted, every
    # raw is a 3-node expression and the stage compiles.
    raws = lexical_label_raws(labs, base=F.col("_lexbase"))
    base = rel_pairs.withColumn("_lexbase", materialized(lexical_base()))
    best_raw = F.greatest(*raws) if len(raws) > 1 else raws[0]
    # ascending label order + first-match == (prob desc, label asc)
    best_label = F.when(raws[0] == best_raw, F.lit(labs[0]))
    for r, lab in zip(raws[1:], labs[1:]):
        best_label = best_label.when(r == best_raw, F.lit(lab))
    out = base.select(
        "doc_id", "h_start", "h_end", "t_start", "t_end",
        "h_type", "t_type", "h_text", "t_text",
        best_label.alias("label"),
        best_raw.cast("int").alias("raw"),
    ).withColumn(
        "prob", F.col("raw").cast("double") / F.lit(float(config.SCORE_MOD - 1))
    ).filter(F.col("prob") > F.lit(threshold))
    if apply_constraints:
        out = out.filter(lexical_constraint_ok(labels, F.col("label")))
    if not formatted:
        # the pre-format decoded relation (inclusive ends, h/t types
        # kept) — what type-signature style consumers aggregate over
        return out
    return decode_ops.format_output(out)


def lexical_constraint_ok(
    labels: dict[str, dict[str, list[str]]], label_col: "F.Column"
) -> "F.Column":
    """P9 constraint predicate as a label when-chain of ``isin`` tests —
    same truth table as the NULL-semantics array_contains form over the
    broadcast label dimension (types are non-null by construction)."""
    ok = None
    for lab in sorted(labels):
        spec = labels.get(lab) or {}
        ah, at = spec.get("allowed_head"), spec.get("allowed_tail")
        head_ok = F.col("h_type").isin(*ah) if ah else F.lit(True)
        tail_ok = F.col("t_type").isin(*at) if at else F.lit(True)
        cond = head_ok & tail_ok
        ok = (
            F.when(label_col == lab, cond)
            if ok is None
            else ok.when(label_col == lab, cond)
        )
    return ok if ok is not None else F.lit(True)
