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
    p.add_argument(
        "--stream",
        action="store_true",
        help="run the STREAMING topology (the reference KMeansTool's "
        "shape): replay the input as micro-batch files through a "
        "Structured Streaming query with online MacQueen updates "
        "(streaming/kmeans.py) instead of batch Lloyd iterations",
    )
    p.add_argument(
        "--stream-batches",
        type=int,
        default=5,
        help="number of micro-batches for --stream (default 5)",
    )
    p.add_argument(
        "--reassign",
        action="store_true",
        help="with --stream: keep per-point assignment memory and "
        "subtract a reassigned point's old contribution (the "
        "reference co-operator's Feature add/remove arithmetic)",
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
    extra: dict = {}
    if args.stream:
        assigned, extra = _run_streaming(spark, pts, args, init)
    else:
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
                **extra,
            },
            sort_keys=True,
        )
    )
    return 0


def _run_streaming(spark, pts, args, init):
    """KMeansTool's streaming topology: micro-batch replay through a
    file-source Structured Streaming query + online MacQueen state
    (streaming/kmeans.py). Returns (assignments DataFrame, summary)."""
    import os
    import shutil
    import tempfile

    from .operators.kmeans import assign, init_centroids
    from .streaming.kmeans import StreamingKMeans

    if init is not None:
        C, cids = init
        skm = StreamingKMeans(
            C.tolist(), [int(c) for c in cids],
            track_assignments=args.reassign,
        )
    else:
        cent = init_centroids(pts, k=args.k).collect()
        skm = StreamingKMeans(
            [list(r.cemb) for r in cent],
            [int(r.cid) for r in cent],
            track_assignments=args.reassign,
        )

    from .sources.replay import batch_input_dir, run_available_now

    d = tempfile.mkdtemp(prefix="fsk_tool_stream_")
    try:
        n_b = max(1, args.stream_batches)
        in_dir = batch_input_dir(
            pts.withColumn("bno", F.pmod("vec_id", F.lit(n_b))), d, range(n_b)
        )
        run_available_now(
            spark.readStream.schema(pts.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
            .writeStream.foreachBatch(skm.foreach_batch())
            .option("checkpointLocation", os.path.join(d, "ckpt")),
            "--stream",
            spark,
            timeout=600,
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)

    from .sources.loader import local_df

    if args.reassign:
        # Assignment memory IS the result (reference keyed state) —
        # read straight from the parquet-backed state table, never
        # collected driver-side.
        assigned = skm.assign_df(spark).select(
            "vec_id", F.col("cid").alias("cluster_id")
        )
    else:
        cdf = local_df(
            spark,
            [
                (int(c), [float(x) for x in row])
                for c, row in zip(skm.cids, skm.C)
            ],
            "cid int, cemb array<float>",
        )
        assigned = assign(pts, cdf).select(
            "vec_id", F.col("cid").alias("cluster_id")
        )
    return assigned, {
        "mode": "stream",
        "batches_seen": skm.batches_seen,
        "reassign": bool(args.reassign),
    }


if __name__ == "__main__":
    sys.exit(main())
