"""§2.7 Set operations."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.loader import load_table
from .registry import register


def _keys(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    return o, c


@register(
    "q_set_union_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    UNION ALL
    SELECT c_custkey AS custkey FROM customer
    """,
)
def q_set_union_all(spark, sf_dir):
    o, c = _keys(spark, sf_dir)
    return o.unionAll(c)


@register(
    "q_set_union",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    UNION
    SELECT c_custkey AS custkey FROM customer
    """,
)
def q_set_union(spark, sf_dir):
    o, c = _keys(spark, sf_dir)
    return o.union(c).distinct()


@register(
    "q_set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_set_intersect(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@register(
    "q_set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_set_except(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.subtract(s)  # subtract == EXCEPT DISTINCT (exceptAll is per-occurrence)
