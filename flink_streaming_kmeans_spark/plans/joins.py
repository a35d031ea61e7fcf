"""§2.3 Joins (except as-of/range, which live in events.py / operators).

Scale notes: the dim tables (region/nation/supplier) are broadcast —
no shuffle of the fact side; fact⋈fact equi-joins shuffle on the join
key and AQE handles skew/coalescing. The theta join is a broadcast
nested-loop by construction (25×25) — at 100 TB a non-equi join must
be banded/bucketed first (see operators/asof.py for the pattern).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.vector import dsum, sql_dsum
from ..sources.loader import load_table
from .registry import register


@register(
    "q_join_inner",
    oracle=f"""
    SELECT c_nationkey,
           {sql_dsum('o_totalprice', 'revenue')},
           COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
)
def q_join_inner(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_nationkey")
        .agg(dsum("o_totalprice", "revenue"), F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q_join_broadcast",
    oracle="""
    SELECT n_nationkey, n_name, r_name
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def q_join_broadcast(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


@register(
    "q_join_left",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def q_join_left(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "q_join_full",
    oracle="""
    SELECT a.n_nationkey AS left_key, b.n_nationkey AS right_key
    FROM (SELECT n_nationkey FROM nation WHERE n_nationkey < 13) a
    FULL OUTER JOIN (SELECT n_nationkey FROM nation WHERE n_nationkey >= 12) b
      ON a.n_nationkey = b.n_nationkey
    """,
)
def q_join_full(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    a = n.where(F.col("n_nationkey") < 13).select(F.col("n_nationkey").alias("left_key"))
    b = n.where(F.col("n_nationkey") >= 12).select(
        F.col("n_nationkey").alias("right_key")
    )
    return a.join(b, a.left_key == b.right_key, "full")


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
)
def q_join_semi(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def q_join_anti(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_cross",
    oracle="""
    SELECT a.r_name AS r1, b.r_name AS r2
    FROM region a CROSS JOIN region b
    """,
)
def q_join_cross(spark, sf_dir):
    r = load_table(spark, sf_dir, "region")
    a = r.select(F.col("r_name").alias("r1"))
    b = r.select(F.col("r_name").alias("r2"))
    return a.crossJoin(b)


@register(
    "q_join_theta",
    oracle="""
    SELECT n1.n_nationkey AS k1, n2.n_nationkey AS k2, n1.n_regionkey AS rk
    FROM nation n1 JOIN nation n2
      ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
    """,
)
def q_join_theta(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("k1"), F.col("n_regionkey").alias("rk")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("k2"), F.col("n_regionkey").alias("rk2")
    )
    return (
        n1.join(n2, (n1.rk == n2.rk2) & (n1.k1 < n2.k2))
        .select("k1", "k2", "rk")
    )
