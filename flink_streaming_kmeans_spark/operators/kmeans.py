"""Lloyd's k-means as DataFrame ops + a driver-side iteration loop.

Reference analog: the clustering topology in KMeansClustering.java
(expected path src/main/java/com/scaleunlimited/flinkkmeans/
KMeansClustering.java — SURVEY.md §3.1 [PK]; checkout was empty): a
stateful co-operator assigns each Feature to the nearest Centroid and
feeds updated centroids back through an iteration edge. Spark has no
streaming iteration, so the idiomatic decomposition (SURVEY.md §7) is:

- ``assign``: embeddings × broadcast(centroids) → dot-product argmax.
  The centroid side is always tiny (k rows), so this is a
  BroadcastNestedLoopJoin producing n×k scored rows — one scan, no
  shuffle of the big side, the canonical scalable k-means step.
- ``update``: posexplode to (cluster, dim, value) → hash-aggregate
  mean. Shuffle carries k×64 group rows, nothing more.
- ``lloyd_iterate``: a driver loop that collects the k×64 centroid
  matrix each iteration (deliberately tiny) and rebuilds the centroid
  DataFrame from literals — every iteration's plan is constant-size,
  which avoids the exponential plan-growth trap of chaining DataFrames
  (SURVEY.md §7 hard-part 1). No localCheckpoint needed because each
  iteration re-derives from the base scan + literal centroids.

Embeddings are unit-normalized (SURVEY.md §1.3), so dot product ==
cosine similarity; "nearest" = argmax dot, tie-broken on lowest
cluster id for determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.vector import dot64


def init_centroids(embeddings: DataFrame, k: int = 10) -> DataFrame:
    """Deterministic init: the k embeddings with smallest vec_id;
    cluster id = that vec_id."""
    return (
        embeddings.orderBy("vec_id")
        .limit(k)
        .select(
            F.col("vec_id").cast("int").alias("cid"),
            F.col("embedding").alias("cemb"),
        )
    )


def assign(embeddings: DataFrame, centroids: DataFrame) -> DataFrame:
    """Score every vector against every centroid, keep the argmax-dot
    row per vector (ties → lowest cid). Columns:
    (vec_id, embedding, cid, dot)."""
    scored = embeddings.crossJoin(F.broadcast(centroids)).select(
        "vec_id", "embedding", "cid", dot64("embedding", "cemb").alias("dot")
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("dot"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def update(assigned: DataFrame) -> DataFrame:
    """New centroid = per-dimension mean of member vectors, computed
    through exact decimal summation (order-independent → deterministic
    across runs and partitionings). Columns: (cid, dim, c_val)."""
    exploded = assigned.select("cid", F.posexplode("embedding").alias("dim", "v"))
    total = F.sum(F.col("v").cast("double").cast("decimal(30,6)")).cast("double")
    return exploded.groupBy("cid", "dim").agg(
        (total / F.count(F.lit(1))).alias("c_val")
    )


def _partial_stats_fn(C, cids):
    """Per-partition combiner: vectorized assignment (numpy GEMM) +
    per-cluster partial sums/counts. Emits k rows per partition — the
    map-side combine that makes an iteration shuffle-free."""
    import numpy as np
    import pandas as pd

    def fn(batches):
        k, d = C.shape
        sums = np.zeros((k, d))
        counts = np.zeros(k, dtype="int64")
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            best = np.argmax(X @ C.T, axis=1)  # ties → lowest index == lowest cid
            for j in range(k):
                members = X[best == j]
                if len(members):
                    sums[j] += members.sum(axis=0)
                    counts[j] += len(members)
        yield pd.DataFrame(
            {"cid": cids, "psum": list(sums), "n": counts}
        )

    return fn


def lloyd_iterate(
    spark: SparkSession,
    embeddings: DataFrame,
    k: int = 10,
    max_iter: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """Full Lloyd's to convergence; returns final (vec_id, cluster_id).

    Scale shape: each iteration is ONE narrow mapInPandas pass over the
    (cached) embeddings — vectorized numpy assignment against the
    broadcast k×d centroid matrix, combined map-side into k partial
    (sum, count) rows per partition. Only k×P tiny rows reach the
    driver; there is no shuffle at all per iteration, and the plan is
    constant-size (no literal growth, no lineage growth — SURVEY.md §7
    hard-part 1 solved by construction).
    """
    import numpy as np

    cent_rows = init_centroids(embeddings, k).collect()
    cids = np.array(sorted(int(r.cid) for r in cent_rows))
    by_cid = {int(r.cid): [float(x) for x in r.cemb] for r in cent_rows}
    C = np.array([by_cid[c] for c in cids])  # k×d, row j ↔ cids[j]

    cached = embeddings.select("vec_id", "embedding").persist()
    try:
        for _ in range(max_iter):
            partials = cached.mapInPandas(
                _partial_stats_fn(C, cids),
                "cid int, psum array<double>, n bigint",
            ).collect()
            sums = np.zeros_like(C)
            counts = np.zeros(len(cids), dtype="int64")
            pos = {int(c): j for j, c in enumerate(cids)}
            for r in partials:
                j = pos[int(r.cid)]
                sums[j] += np.array(r.psum)
                counts[j] += int(r.n)
            new_C = C.copy()  # empty cluster keeps its previous centroid
            nz = counts > 0
            new_C[nz] = sums[nz] / counts[nz, None]
            shift = float(np.abs(new_C - C).max())
            C = new_C
            if shift < tol:
                break

        final_fn = _final_assign_fn(C, cids)
        # Materialize the final assignment BEFORE the finally-block
        # unpersists the input: the returned DataFrame is lazy, and
        # without this the cache would be gone by the time any caller
        # acts on it, re-scanning the source on every downstream action.
        return cached.mapInPandas(
            final_fn, "vec_id bigint, cluster_id int"
        ).localCheckpoint(eager=True)
    finally:
        cached.unpersist()


def _final_assign_fn(C, cids):
    import numpy as np
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            best = np.argmax(X @ C.T, axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cluster_id": cids[best]}
            )

    return fn
