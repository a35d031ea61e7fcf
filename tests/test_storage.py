"""Storage-layout scale evidence: partition pruning on the partitioned
sink, and bucketed tables joining with NO shuffle exchange.

Bucketing is the canonical 100 TB co-location strategy: paying one
shuffle at write time buys every subsequent equi-join/aggregation on
the bucket key a shuffle-free plan. It needs saveAsTable (a catalog),
so it lives test-tier rather than as a registered query.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE
from test_plans import plan_of


def test_partitioned_sink_prunes_partitions(spark, registry):
    queries, _ = registry
    df = queries["q_sink_partitioned"](spark, SF_SMOKE)
    p = plan_of(df)
    assert "PartitionFilters: [isnotnull(l_returnflag" in p.replace("#", " #").replace(
        "l_returnflag #", "l_returnflag#"
    ) or "PartitionFilters: [isnotnull(l_returnflag" in p, p
    # the flag predicate must be a partition filter, not a data filter
    assert "PartitionFilters" in p and "(l_returnflag" in p.split("PartitionFilters")[1].split("]")[0]


def test_bucketed_join_has_no_shuffle(spark):
    """orders and customer bucketed by custkey into the same bucket
    count: the join plan must contain zero Exchange nodes (bucketing
    provides the hash distribution) — the write-once/join-free-forever
    trade that matters at 100 TB."""
    from flink_streaming_kmeans_spark.sources.loader import load_table

    o = load_table(spark, SF_SMOKE, "orders")
    c = load_table(spark, SF_SMOKE, "customer")
    spark.sql("DROP TABLE IF EXISTS fsk_orders_b")
    spark.sql("DROP TABLE IF EXISTS fsk_customer_b")
    try:
        o.write.bucketBy(8, "o_custkey").sortBy("o_custkey").mode(
            "overwrite"
        ).saveAsTable("fsk_orders_b")
        c.write.bucketBy(8, "c_custkey").sortBy("c_custkey").mode(
            "overwrite"
        ).saveAsTable("fsk_customer_b")

        ob = spark.table("fsk_orders_b")
        cb = spark.table("fsk_customer_b")
        # merge hint: at this tiny SF Catalyst would broadcast (also
        # shuffle-free, but that proves nothing about bucketing); at
        # real scale both sides exceed the broadcast threshold and SMJ
        # is what the planner picks on its own.
        joined = ob.join(cb.hint("merge"), ob.o_custkey == cb.c_custkey).groupBy(
            "c_nationkey"
        ).agg(F.count(F.lit(1)).alias("n"))

        p = plan_of(joined, "simple")
        # the join itself must not shuffle either side; the only
        # allowed exchange is the post-join aggregation's
        join_part = p.split("Join")[-1]
        assert "SortMergeJoin" in p or "ShuffledHashJoin" in p, p
        assert "Exchange" not in join_part, (
            "bucketed join shuffled its inputs:\n" + p
        )

        # and it returns the same counts as the plain join
        plain = (
            o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS fsk_orders_b")
        spark.sql("DROP TABLE IF EXISTS fsk_customer_b")
