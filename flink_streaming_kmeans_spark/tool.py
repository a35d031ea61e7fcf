"""CLI entry point — the KMeansTool analog.

Reference analog: KMeansTool.main (expected path src/main/java/com/
scaleunlimited/flinkkmeans/KMeansTool.java — SURVEY.md §3.1 [PK];
checkout was empty): parse CLI options (input file, k, parallelism),
build the streaming topology, run, emit assignments. The public demo
clustered NYC bike-share ride start points from text lines; the web
map sink is explicitly out of scope (SURVEY.md §7).

Ours: read points from CSV text lines (``id,x,y``-style numeric
columns, the reference's ingest) or a parquet embeddings table
(``vec_id, embedding array<float>``), run Lloyd's k-means
(operators/kmeans.py — the same scalable mapInPandas iteration the
registered queries use), write ``(vec_id, cluster_id)`` parquet, and
print a one-line JSON summary.

Usage:
    python -m flink_streaming_kmeans_spark.tool \
        --input /root/testdata/sf0.001/embeddings.parquet \
        --k 10 --max-iters 20 --output /tmp/assignments
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="flink_streaming_kmeans_spark.tool",
        description="K-means clustering over points (CSV) or embeddings (parquet).",
    )
    p.add_argument("--input", required=True, help="CSV dir/file or parquet path")
    p.add_argument(
        "--format",
        choices=["auto", "csv", "parquet"],
        default="auto",
        help="input format (auto: .parquet suffix → parquet, else csv)",
    )
    p.add_argument(
        "--no-header",
        action="store_true",
        help="CSV input has no header row (headerless id,x,y,... lines)",
    )
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--max-iters", type=int, default=20)
    p.add_argument(
        "--init",
        choices=["first-k", "kmeans||"],
        default="first-k",
        help="centroid init: deterministic first-k ids (reference-"
        "faithful) or scalable k-means|| oversampling (Bahmani)",
    )
    p.add_argument("--output", required=True, help="output parquet dir")
    p.add_argument(
        "--parallelism",
        type=int,
        default=None,
        help="shuffle partitions (default: session setting)",
    )
    return p


def load_points(spark, path: str, fmt: str, header: bool = True):
    """Load points as (vec_id bigint, embedding array<float>)."""
    if fmt == "auto":
        fmt = "parquet" if path.rstrip("/").endswith(".parquet") else "csv"
    if fmt == "parquet":
        df = spark.read.parquet(path)
        if "vec_id" not in df.columns or "embedding" not in df.columns:
            raise SystemExit(
                "parquet input must have columns (vec_id, embedding); "
                f"got {df.columns}"
            )
        return df.select("vec_id", "embedding")
    # CSV text lines: first column is the id, the rest are coordinates
    # (the reference parsed "lat,lon"-style lines into Feature POJOs).
    df = spark.read.option("header", header).option("inferSchema", True).csv(path)
    id_col, *coord_cols = df.columns
    if not coord_cols:
        raise SystemExit("csv input needs an id column plus >=1 coordinate column")
    return df.select(
        F.col(id_col).cast("bigint").alias("vec_id"),
        F.array(*[F.col(c).cast("float") for c in coord_cols]).alias("embedding"),
    )


def main(argv: list[str] | None = None) -> int:
    from .operators.kmeans import kmeans_parallel_init, lloyd_iterate
    from .session import get_spark

    args = build_arg_parser().parse_args(argv)
    spark = get_spark("kmeans-tool")
    if args.parallelism:
        spark.conf.set("spark.sql.shuffle.partitions", str(args.parallelism))

    pts = load_points(spark, args.input, args.format, header=not args.no_header)
    init = (
        kmeans_parallel_init(pts, k=args.k) if args.init == "kmeans||" else None
    )
    assigned = lloyd_iterate(
        spark, pts, k=args.k, max_iter=args.max_iters, init=init
    )
    assigned.write.mode("overwrite").parquet(args.output)

    back = spark.read.parquet(args.output)
    sizes = {
        int(r.cluster_id): int(r.n)
        for r in back.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    print(
        json.dumps(
            {
                "n_points": sum(sizes.values()),
                "k": args.k,
                "clusters": sizes,
                "output": args.output,
            },
            sort_keys=True,
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
