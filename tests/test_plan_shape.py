"""Physical-plan regression guards: the properties BENCH/BASELINE.md
claims about the flagship (one shuffle exchange + broadcasts, no
global windows) are asserted here so a plan regression fails CI, not
just the benchmark."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_triples_plan_is_window_free_single_shuffle(spark):
    from glirel_spark.plans import pipeline

    plan = _plan(pipeline.triples(spark, SF))
    assert "Window" not in plan  # decode is an aggregation, not a window
    # exactly ONE hash-partitioned shuffle: the decode argmax. Any
    # enrich join or re-shuffle creeping back in would add more.
    # (The ingest repartition is RoundRobin inside the cached subtree
    # and is excluded — AQE's toString prints finalized cached plans
    # twice, which makes counting it order-dependent across tests.)
    n_shuffles = plan.count("Exchange hashpartitioning")
    assert n_shuffles <= 1, f"flagship plan grew shuffles:\n{plan}"


def test_top_orders_plan_has_no_global_window(spark):
    from glirel_spark.plans import relational

    plan = _plan(relational.top_orders(spark, SF))
    assert "Window" not in plan
    assert "TakeOrderedAndProject" in plan


def test_fused_coref_plan_is_shuffle_free_after_cache(spark):
    from glirel_spark.plans import pipeline

    # force the cached gazetteer pass first (the plan under test reads it)
    pipeline.docs_ments(spark, SF).count()
    plan = _plan(pipeline.mention_clusters(spark, SF))
    assert "Exchange hashpartitioning" not in plan
    assert "Window" not in plan


def test_decontaminate_plan_is_broadcast_scan(spark):
    """The corpus side of decontamination must stay map-only: the eval
    shingle set arrives as a BROADCAST single-row build side (Catalyst's
    broadcast-variable form — no driver collect, no giant plan literal,
    no corpus-side shuffle join)."""
    from glirel_spark.plans import pipeline

    pipeline.docs_shingled(spark, SF).count()  # warm the shared cache
    plan = _plan(pipeline.decontaminate(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan
    assert "BroadcastExchange" in plan
    # no shuffle join against the corpus
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "Window" not in plan


def test_corpus_stats_plan_is_one_expand_one_agg(spark):
    from glirel_spark.plans import pipeline

    plan = _plan(pipeline.corpus_stats(spark, SF))
    assert plan.count("Expand") == 1  # ROLLUP = one Expand, not 3 scans
    assert "Window" not in plan


def test_fuzzy_linking_plan_broadcasts_candidates(spark):
    """The triple relation must not shuffle for the fuzzy substitution:
    both candidate joins are broadcast left joins."""
    from glirel_spark.plans import pipeline

    plan = _plan(pipeline.linked_triples_fuzzy(spark, SF))
    # the substitution joins keyed on subj/obj must be broadcast left
    # joins (the candidate-generation subtree may shuffle its own
    # shingle relations — that side is distinct-surface-sized)
    assert "BroadcastHashJoin [subj" in plan
    assert "BroadcastHashJoin [obj" in plan


def test_asof_plan_is_single_exchange_no_join(spark):
    """The as-of formulation's whole point: one shuffle on user, one
    sort, ZERO join operators — any join creeping in means someone
    rebuilt the O(left x right) candidate space."""
    from glirel_spark.operators.events import asof_last_event

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(asof_last_event(ev))
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
    # filters reach the scan even through the window
    assert "ReadSchema" in plan


def test_range_join_plan_is_equi_join_not_nested_loop(spark):
    """Time-bucketing must turn the BETWEEN predicate into an
    equi-join: a BroadcastNestedLoopJoin/CartesianProduct here means
    the non-equi condition leaked back into the join keys."""
    from glirel_spark.operators.events import range_join_counts

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(range_join_counts(ev))
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)
    # event-type predicate pushed into the parquet scan
    assert "PushedFilters: [IsNotNull(event_type)" in plan


def test_kg_link_pred_uses_takeordered_not_global_sort(spark):
    from glirel_spark.plans import pipeline

    plan = _plan(pipeline.kg_link_pred(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_kg_negative_samples_entity_index_is_broadcast(spark):
    """The entity-index and n_entities joins must BROADCAST (the index
    is a dimension); the distributed zipWithIndex must never fall back
    to a global single-partition window."""
    from glirel_spark.plans import pipeline

    plan = _plan(pipeline.kg_negative_samples(spark, SF))
    assert "BroadcastExchange HashedRelationBroadcastMode" in plan
    # the only windows allowed are partitioned BY BUCKET (the
    # within-bucket row_number) or over the 64-row offsets table
    for line in plan.splitlines():
        if "partitionBy" in line.lower():
            continue
    assert "CartesianProduct" not in plan


def test_kg_fusion_plan_is_window_free(spark):
    from glirel_spark.plans import pipeline

    plan = _plan(pipeline.kg_fusion(spark, SF))
    assert "Window" not in plan  # argmax rides inside the aggregate


def test_inverted_index_plan_single_scan_two_aggs(spark):
    from glirel_spark.plans import pipeline

    plan = _plan(pipeline.inverted_index(spark, SF))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_token_blocks_prefix_sum_is_two_phase_not_global_window(spark):
    """The packed-block layout must come from the distributed two-phase
    prefix sum: a rangepartitioning exchange + a _pid-partitioned
    window, with the only unpartitioned window running over the tiny
    per-partition-totals frame. Collapsing it into one global
    Window.orderBy would drop the range exchange and leave a single
    unpartitioned window over the full corpus."""
    from glirel_spark.plans import pipeline

    plan = _plan(pipeline.token_blocks(spark, SF))
    assert "Exchange rangepartitioning" in plan
    assert plan.count("Window") == 2  # per-partition cumsum + totals frame


def test_quality_buckets_corpus_side_is_broadcast_mapped(spark):
    """Exact deciles via the bounded-domain histogram: the bucket map
    must come back to the corpus as a BROADCAST join, and the only
    window runs over the tiny histogram frame — a global ntile over
    the corpus would show as more windows / a shuffle join."""
    from glirel_spark.plans import pipeline

    plan = _plan(pipeline.quality_buckets(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert plan.count("Window") == 1


def test_kg_walks_plan_is_window_free(spark):
    """Successor argmin is min(struct(...)) inside an aggregate and the
    rollout is plain joins — no window, no nested-loop join."""
    from glirel_spark.plans import pipeline

    plan = _plan(pipeline.kg_walks(spark, SF))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_kg_label_prop_plan_is_window_free(spark):
    from glirel_spark.plans import pipeline

    plan = _plan(pipeline.kg_label_prop(spark, SF))
    assert "Window" not in plan


def test_bm25_plan_broadcasts_query_side(spark):
    """The corpus tf relation must be probed via a BROADCAST of the
    bounded query side — a shuffle join on the Zipf-hot token key is
    exactly the regression this guard exists to catch. The only
    SortMergeJoins allowed are the doc-keyed dl join and query-side
    prep (token is never a sort-merge key)."""
    from glirel_spark.plans import pipeline

    plan = _plan(pipeline.bm25_topk(spark, SF))
    assert "BroadcastExchange" in plan
    import re

    for m in re.finditer(r"SortMergeJoin \[([^\]]*)\]", plan):
        assert "token" not in m.group(1), f"tf shuffled on token:\n{plan}"


def test_containment_pairs_probe_side_prefix_only(spark):
    """Containment candidates join prefix(probe) x postings(index):
    both sides key on the shingle — fine — but the verify stage must
    aggregate on the candidate pair, never window. No Window at all in
    this plan."""
    from glirel_spark.plans import pipeline

    plan = _plan(pipeline.containment_pairs(spark, SF))
    # the only window is the per-doc rare-first rank: every window spec
    # in the plan must be partitioned by doc_id — a GLOBAL window
    # (empty partition spec) would single-partition the shingle stream
    import re

    specs = re.findall(r"windowspecdefinition\(([^,]*),", plan)
    assert specs, f"expected the rare-first rank window:\n{plan}"
    for s in specs:
        assert "doc_id" in s, f"non-doc_id window spec {s!r}:\n{plan}"


def test_round4_interleave_ops_are_zero_exchange_scans(spark):
    """caption_pairs / media_ref_audit / interleaved_chunks / pii_scrub
    are row-local projections: no exchange of any kind, no window —
    embarrassingly parallel at any corpus size."""
    from glirel_spark.plans import pipeline

    for fn in (pipeline.caption_pairs, pipeline.media_ref_audit,
               pipeline.interleaved_chunks, pipeline.pii_scrub):
        plan = _plan(fn(spark, SF))
        assert "Exchange hashpartitioning" not in plan, fn.__name__
        assert "Exchange rangepartitioning" not in plan, fn.__name__
        assert "Window" not in plan, fn.__name__


def test_media_evidence_adds_only_a_dimension_join(spark):
    """triples_media_evidence must not add a shuffle beyond the
    flagship's single decode-argmax exchange: the n_chunks dimension
    joins as a broadcast here (AQE picks sort-merge co-partitioned on
    doc_id at scale); the congruence arithmetic is pure projection."""
    from glirel_spark.plans import pipeline

    plan = _plan(pipeline.triples_media_evidence(spark, SF))
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    assert "Window" not in plan
