"""§2.2 Projection / filter / predicates.

Reference analog: the per-record stream filter/map stages of the Flink
topology (KMeansClustering.java, expected — SURVEY.md §3.1 [PK]).
Expressed declaratively so the predicates push into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.vector import mround, sql_mround
from ..sources.loader import load_table
from .registry import register


@register(
    "q_project_compute",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {sql_mround('l_extendedprice * (1 - l_discount)')} AS net
    FROM lineitem
    """,
)
def q_project_compute(spark, sf_dir):
    # mround, not native ROUND: the product of two doubles lands on
    # 4-decimal midpoints (ROUND(169738.83 * 0.125, 4) splits .3538
    # Spark vs .3537 DuckDB) the moment a regenerated dataset carries
    # >2-decimal prices or discounts (review r6).
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        mround(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
    )


@register(
    "q_filter_pred",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('F', 'O')
      AND o_totalprice BETWEEN 1000 AND 100000
      AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
      AND o_custkey IS NOT NULL
    """,
)
def q_filter_pred(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.where(
        F.col("o_orderstatus").isin("F", "O")
        & F.col("o_totalprice").between(1000, 100000)
        & (F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("2-%"))
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")


@register(
    "q_case_null",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 1000 THEN 'low'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bucket,
           COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg
    FROM customer
    """,
)
def q_case_null(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    return c.select(
        "c_custkey",
        bucket.alias("bucket"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "seg"
        ),
    )
