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
    # shuffle exchanges: the decode argmax, plus the one-time ingest
    # repartition inside the cached corpus subtree. Anything beyond
    # these means an enrich join / re-shuffle crept back in.
    n_shuffles = plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange RoundRobinPartitioning"
    )
    assert n_shuffles <= 2, f"flagship plan grew shuffles:\n{plan}"


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
