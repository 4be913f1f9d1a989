"""Bucketed-table co-located join: the storage-layout claim behind
write_graph's docstring ("bucketing by subj would co-locate future
subject joins"), proven on an actual bucketed pair — the join must
plan with ZERO exchanges; the unbucketed twin shuffles both sides."""

from __future__ import annotations

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def warehouse(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt")
    yield
    spark.sql("DROP DATABASE IF EXISTS bkt CASCADE")


def test_bucketed_join_is_exchange_free(spark, warehouse):
    edges = spark.range(2000).selectExpr(
        "concat('E', id % 97) AS subj",
        "concat('p', id % 5)  AS pred",
        "concat('E', (id * 7) % 97) AS obj",
    )
    degs = spark.range(97).selectExpr(
        "concat('E', id) AS subj", "id AS out_degree"
    )
    for name, df in [("edges", edges), ("degs", degs)]:
        (
            df.write.mode("overwrite")
            .bucketBy(8, "subj").sortBy("subj")
            .saveAsTable(f"bkt.{name}")
        )
    be, bd = spark.table("bkt.edges"), spark.table("bkt.degs")
    # disable broadcast so the co-location (not a broadcast) is what
    # removes the shuffle — at 10^12 edges neither side broadcasts
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(be.join(bd, "subj"))
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # same join WITHOUT bucketing shuffles both sides
        plain = _plan(
            be.withColumn("subj", be["subj"]).alias("a").join(
                spark.createDataFrame(degs.collect(), degs.schema), "subj"
            )
        )
        assert "Exchange" in plain
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    out = be.join(bd, "subj").groupBy().count().collect()[0][0]
    assert out == 2000
