"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``flink_streaming_kmeans_spark``; this module
only adapts its registry (plans/registry.py) to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: one Lloyd assignment step of k-means
    over the embeddings table — the reference's core semantics
    (SURVEY.md §2.9 q_ml_kmeans_assign)."""
    from flink_streaming_kmeans_spark.plans.registry import collect

    queries, _ = collect()
    flagship = queries.get("q_ml_kmeans_assign") or queries["q_agg_q1"]
    return flagship(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from flink_streaming_kmeans_spark.plans.registry import collect

    q, _ = collect()
    return dict(q)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checked query."""
    from flink_streaming_kmeans_spark.plans.registry import collect

    _, o = collect()
    return dict(o)
