"""Classic relational/OLAP queries over the TPC-H-ish tables —
demonstrates the engine's general query surface beside the KG pipeline
(scan-agg, multi-join, top-k). Money sums use integer cents
(floor(x*100)) so the oracle comparison is order-insensitive-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, Window as W

from glirel_spark.sources.tables import TableIO


def _cents(col):
    return F.floor(col * 100).cast("long")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy groupBy with multiple aggregates."""
    li = TableIO(spark, sf_dir).table("lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).cast("long").alias("sum_base_cents"),
            F.sum(
                _cents(F.col("l_extendedprice")) - _cents(F.col("l_extendedprice") * F.col("l_discount"))
            ).cast("long").alias("sum_disc_cents"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


def top_orders(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-k."""
    io = TableIO(spark, sf_dir)
    cust = io.table("customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = io.table("orders")
    li = io.table("lineitem")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    )
    rev = j.groupBy("o_orderkey", "o_orderdate").agg(
        F.sum(
            _cents(F.col("l_extendedprice")) - _cents(F.col("l_extendedprice") * F.col("l_discount"))
        ).cast("long").alias("revenue_cents")
    )
    # Top-k via orderBy().limit(k) -> TakeOrderedAndProject: each partition
    # keeps its local top-k and only k rows travel to the driver-side merge,
    # so the full |orders|-sized relation never lands on one task. The rank
    # over the <=k survivors is WINDOW-FREE (a lit() partition key gets
    # constant-folded out of the spec, resurrecting the global WindowExec):
    # pack the k rows into one sorted array and posexplode — one k-row agg.
    lim = rev.orderBy(F.desc("revenue_cents"), F.asc("o_orderkey")).limit(k)
    packed = lim.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    (-F.col("revenue_cents")).alias("_nr"),
                    F.col("o_orderkey").alias("o_orderkey"),
                    F.col("o_orderdate").alias("o_orderdate"),
                    F.col("revenue_cents").alias("revenue_cents"),
                )
            )
        ).alias("arr")
    )
    return packed.select(F.posexplode("arr").alias("_pos", "r")).select(
        "r.o_orderkey", "r.o_orderdate", "r.revenue_cents",
        (F.col("_pos") + 1).cast("int").alias("rk"),
    )


def nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-join rollup: region -> nation -> customer -> orders."""
    io = TableIO(spark, sf_dir)
    r = io.table("region")
    n = io.table("nation")
    c = io.table("customer")
    o = io.table("orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(_cents(F.col("o_totalprice"))).cast("long").alias("total_cents"),
            F.countDistinct("c_custkey").cast("long").alias("n_customers"),
        )
    )


ORACLE = {
    "tpch_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)
              - CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem WHERE l_shipdate <= '1998-09-02'
GROUP BY l_returnflag, l_linestatus""",
    "tpch_top_orders": """
WITH rev AS (
  SELECT o.o_orderkey, o.o_orderdate,
         CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)
                - CAST(floor(l.l_extendedprice * l.l_discount * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = 'BUILDING'
  GROUP BY o.o_orderkey, o.o_orderdate
)
SELECT o_orderkey, o_orderdate, revenue_cents,
       CAST(rk AS INT) AS rk
FROM (SELECT *, row_number() OVER (ORDER BY revenue_cents DESC, o_orderkey ASC) AS rk FROM rev)
WHERE rk <= 10""",
    "tpch_nation_activity": """
SELECT r.r_name, n.n_name,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_customers
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name""",
}
