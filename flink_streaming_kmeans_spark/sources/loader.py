"""Table loader for the driver-generated parquet test tables.

Reference analog: the Flink demo's file source (KMeansTool.java,
expected — see SURVEY.md §1.1; checkout was empty) parsed text lines
into Feature POJOs. Our engine's ingest is declarative
``spark.read.parquet`` so Catalyst gets predicate pushdown + column
pruning for free; at 100 TB the same loader points at a partitioned
parquet lake and pushdown/pruning do the heavy lifting.

The one imperative fix-up: ``events.ts`` is INT64 TIMESTAMP(NANOS) in
parquet, which Spark reads as bigint ns (with the nanosAsLong conf).
We convert with integer division (``ts DIV 1000``) — NOT float
division — so the ns→µs mapping is exact truncation, bit-identical to
DuckDB's TIMESTAMP_NS→TIMESTAMP cast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_confs

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table; normalizes events.ts (bigint ns → timestamp µs)."""
    ensure_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
