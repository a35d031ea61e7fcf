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

from ..functions.vector import dot64, emb_finite, sql_emb_finite


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


def kmeans_parallel_init(
    embeddings: DataFrame,
    k: int = 10,
    rounds: int = 4,
    oversample: int | None = None,
    seed: int = 0x5EED,
):
    """k-means|| initialization (Bahmani et al., "Scalable k-means++",
    VLDB 2012) — the distributed replacement for both naive first-k
    init (collapses when the id order correlates with one cluster) and
    sequential k-means++ (k driver round-trips, unusable at scale).

    Each of the ``rounds`` passes is ONE mapInPandas scan (numpy GEMM
    against the broadcast candidate matrix — the lloyd_iterate
    discipline: constant-size plans, only sampled candidates reach the
    driver). Points are sampled with probability min(1, l*d²/Σd²)
    where d² = 2-2·(max dot) on unit-normalized vectors and l = 2k per
    round; the "randomness" is a deterministic splitmix-style hash of
    (vec_id, round, seed), so init is reproducible run-to-run — same
    discipline as every other hash-derived draw in this repo. The
    O(k·rounds) candidates are then weighted by their nearest-point
    counts and reduced to k centers with weighted k-means++ on the
    driver (tiny: candidate matrix is k·rounds·2 × d).

    Returns a (k×d numpy array, cids array) pair compatible with
    lloyd_iterate's internals / StreamingKMeans.
    """
    import numpy as np

    ids_emb = embeddings.select("vec_id", "embedding")
    seed_rows = ids_emb.orderBy("vec_id").limit(1).collect()
    if not seed_rows:
        # k-means needs at least one point; a bare IndexError here
        # (or a numpy shape error deep in a worker) hid the actual
        # problem (review r6).
        raise ValueError("kmeans_parallel_init: embeddings table is empty")
    C = np.array([list(seed_rows[0].embedding)], dtype="float64")
    ell = oversample or 2 * k

    def pass_fn(Cm, ell, denom, rnd):
        import pandas as pd

        def fn(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                d2 = np.maximum(0.0, 2.0 - 2.0 * (X @ Cm.T).max(axis=1))
                # Deterministic per-(vec_id, round) uniform in [0, 1).
                h = (
                    (pdf["vec_id"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                    ^ (np.uint64(rnd * 1_000_003 + seed))
                ) * np.uint64(0xBF58476D1CE4E5B9)
                u = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
                p = np.minimum(1.0, ell * d2 / denom) if denom > 0 else d2 * 0
                m = u < p
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"][m],
                        "embedding": pdf["embedding"][m],
                    }
                )

        return fn

    def cost_fn(Cm):
        import pandas as pd

        def fn(batches):
            total = 0.0
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                total += float(
                    np.maximum(0.0, 2.0 - 2.0 * (X @ Cm.T).max(axis=1)).sum()
                )
            yield pd.DataFrame({"c": [total]})

        return fn

    cached = ids_emb.persist()
    try:
        for rnd in range(rounds):
            denom = sum(
                r.c
                for r in cached.mapInPandas(cost_fn(C), "c double").collect()
            )
            if denom <= 0:
                break
            new = cached.mapInPandas(
                pass_fn(C, ell, denom, rnd),
                "vec_id bigint, embedding array<float>",
            ).collect()
            if new:
                C = np.vstack(
                    [C] + [np.array(list(r.embedding), dtype="float64") for r in new]
                )
        # Weight candidates by nearest-point counts (one more pass).
        parts = cached.mapInPandas(
            _partial_stats_fn(C, np.arange(len(C))),
            "cid int, psum array<double>, n bigint",
        ).collect()
        w = np.zeros(len(C), dtype="float64")
        for r in parts:
            w[int(r.cid)] += float(r.n)
    finally:
        cached.unpersist()

    # Driver-side weighted k-means++ seeding + weighted Lloyd over the
    # tiny candidate set, with deterministic multi-restart: a single
    # ++ draw occasionally seeds two candidates in one true cluster
    # (measured 0.8 vs 0.97 purity downstream); candidates are k·rounds
    # rows, so trying several streams and keeping the lowest weighted
    # inertia costs microseconds and removes the variance.
    def reduce_once(restart: int):
        rng_state = seed + 0x9E37 * restart
        centers = [int(np.argmax(w))]
        for _ in range(1, min(k, len(C))):
            d2 = np.maximum(
                0.0, 2.0 - 2.0 * (C @ C[centers].T).max(axis=1)
            ) * np.maximum(w, 1e-12)
            if d2.sum() <= 0:
                break
            rng_state = (
                rng_state * 6364136223846793005 + 1442695040888963407
            ) % (1 << 63)
            target = (rng_state / float(1 << 63)) * d2.sum()
            centers.append(int(np.searchsorted(np.cumsum(d2), target)))
        M = C[centers].copy()
        for _ in range(10):
            a = np.argmax(C @ M.T, axis=1)
            for j in range(len(M)):
                sel = a == j
                if w[sel].sum() > 0:
                    M[j] = (C[sel] * w[sel, None]).sum(axis=0) / w[sel].sum()
        inertia = float(
            (np.maximum(0.0, 2.0 - 2.0 * (C @ M.T).max(axis=1)) * w).sum()
        )
        return inertia, M

    _, M = min((reduce_once(r) for r in range(8)), key=lambda t: t[0])
    cids = np.arange(len(M))
    return M, cids


def assign(
    embeddings: DataFrame, centroids: DataFrame, euclidean: bool = False
) -> DataFrame:
    """Score every vector against every centroid, keep the best row
    per vector (ties → lowest cid). Columns: (vec_id, embedding, cid,
    dot). Default metric is argmax-dot — correct for unit-normalized
    vectors (the embeddings contract); ``euclidean=True`` subtracts
    the per-centroid ||c||²/2 bias, turning the ranking into exact
    argmin-Euclidean for raw-coordinate inputs (see _euclid_bias)."""
    scored = embeddings.crossJoin(F.broadcast(centroids)).select(
        "vec_id", "embedding", "cid", dot64("embedding", "cemb").alias("dot"),
        *(
            [(dot64("cemb", "cemb") / 2).alias("_b")]
            if euclidean
            else []
        ),
    )
    rank_on = (F.col("dot") - F.col("_b")) if euclidean else F.col("dot")
    w = W.partitionBy("vec_id").orderBy(rank_on.desc(), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn", *(["_b"] if euclidean else []))
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


def _euclid_bias(C, euclidean: bool):
    """Per-centroid score bias turning argmax-dot into argmin-Euclidean:
    argmin ||x−c||² == argmax (x·c − ||c||²/2), EXACTLY (the ||x||²
    term is constant per point). The default dot metric is correct
    only for unit-normalized vectors (the embeddings contract);
    raw-coordinate inputs (the CLI's CSV lat/lon mode) without the
    bias let large-magnitude centroids absorb everything (review r6).
    """
    import numpy as np

    return 0.5 * (C * C).sum(axis=1) if euclidean else np.float64(0.0)


def _partial_stats_fn(C, cids, euclidean: bool = False):
    """Per-partition combiner: vectorized assignment (numpy GEMM) +
    per-cluster partial sums/counts. Emits k rows per partition — the
    map-side combine that makes an iteration shuffle-free."""
    import numpy as np
    import pandas as pd

    bias = _euclid_bias(C, euclidean)

    def fn(batches):
        k, d = C.shape
        sums = np.zeros((k, d))
        counts = np.zeros(k, dtype="int64")
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            best = np.argmax(X @ C.T - bias, axis=1)  # ties → lowest index == lowest cid
            for j in range(k):
                members = X[best == j]
                if len(members):
                    sums[j] += members.sum(axis=0)
                    counts[j] += len(members)
        yield pd.DataFrame(
            {"cid": cids, "psum": list(sums), "n": counts}
        )

    return fn


def _partial_stats_fn_from_file(cpath, cids, d, euclidean: bool = False):
    """The :func:`_partial_stats_fn` combiner with the centroid matrix
    read from ``cpath`` AT TASK START instead of baked into the
    closure. This lets the driver loop build the iteration DataFrame
    ONCE and re-collect it each Lloyd round: a fresh mapInPandas plan
    per iteration paid ~150 ms/round of driver-side re-analysis +
    codegen on an unchanged plan shape (r13 measurement: 20 rounds
    5.01 s fresh-plan vs 4.23 s plan-once, partials bit-identical).
    The k×d matrix crosses via a tiny npy file — the side-channel
    analog of re-broadcasting the model per iteration; at cluster
    scale ``cpath`` must live on shared storage (the lakehouse tmp
    root), exactly like StreamingKMeans' parquet assignment state."""
    import numpy as np
    import pandas as pd

    def fn(batches):
        C = np.load(cpath)
        bias = _euclid_bias(C, euclidean)
        k = C.shape[0]
        sums = np.zeros((k, d))
        counts = np.zeros(k, dtype="int64")
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            best = np.argmax(X @ C.T - bias, axis=1)  # ties → lowest index == lowest cid
            for j in range(k):
                members = X[best == j]
                if len(members):
                    sums[j] += members.sum(axis=0)
                    counts[j] += len(members)
        yield pd.DataFrame(
            {"cid": cids, "psum": list(sums), "n": counts}
        )

    return fn


def _reassign_delta_fn(C, cids, euclidean: bool = False):
    """Per-partition combiner for REASSIGNMENT-aware streaming k-means
    (the reference co-operator's Feature add/remove arithmetic,
    SURVEY.md §1.1/§3.1 [PK]): each arriving point is assigned to the
    argmax-dot centroid; if the ``old_cid`` column (the batch LEFT
    JOINED against the parquet-backed assignment state — no broadcast
    driver dict, streaming/kmeans.py) says it was previously assigned
    to a DIFFERENT cluster, its vector is subtracted from that
    cluster's delta (remove) as it is added to the new one. Emits two
    row kinds in one pass:

      kind=0 — per-cluster delta partials (cid, psum, n), k rows per
               partition, where psum/n may be negative (removals);
      kind=1 — per-point new assignments (vec_id, cid), ONE row per
               distinct vec_id in the partition (the final overlay
               entry — a within-batch duplicate must not commit two
               state rows, or the next batch's join fans it out);
               these rows are WRITTEN to the next assignment-state
               generation in Spark, never collected.

    Assumes a point arrives at most once per micro-batch partition
    overlap-free (re-arrivals happen ACROSS batches — the reference's
    pattern, where the same immutable Feature re-enters the loop as
    centroids move); a within-batch duplicate in the same partition is
    handled sequentially via a local overlay."""
    import numpy as np
    import pandas as pd

    def fn(batches):
        k, d = C.shape
        pos = {int(c): j for j, c in enumerate(cids)}
        bias = _euclid_bias(C, euclidean)
        overlay: dict = {}
        sums = np.zeros((k, d))
        counts = np.zeros(k, dtype="int64")
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            ids = pdf["vec_id"].to_numpy()
            olds = pdf["old_cid"].to_numpy()  # NaN where never seen
            best = np.argmax(X @ C.T - bias, axis=1)  # ties → lowest index/cid
            for i in range(len(ids)):
                vid = int(ids[i])
                j = int(best[i])
                sums[j] += X[i]
                counts[j] += 1
                old = overlay.get(
                    vid, None if pd.isna(olds[i]) else int(olds[i])
                )
                if old is not None:
                    jo = pos[int(old)]
                    sums[jo] -= X[i]
                    counts[jo] -= 1
                overlay[vid] = int(cids[j])
        # Final overlay entries — one kind=1 row per DISTINCT vec_id.
        out_ids = list(overlay)
        out_cids = [overlay[v] for v in out_ids]
        yield pd.DataFrame(
            {
                "kind": np.zeros(k, dtype="int32"),
                "vec_id": np.zeros(k, dtype="int64"),
                "cid": cids.astype("int32"),
                "psum": list(sums),
                "n": counts,
            }
        )
        if out_ids:
            yield pd.DataFrame(
                {
                    "kind": np.ones(len(out_ids), dtype="int32"),
                    "vec_id": np.array(out_ids, dtype="int64"),
                    "cid": np.array(out_cids, dtype="int32"),
                    "psum": [None] * len(out_ids),
                    "n": np.zeros(len(out_ids), dtype="int64"),
                }
            )

    return fn


def lloyd_iterate(
    spark: SparkSession,
    embeddings: DataFrame,
    k: int = 10,
    max_iter: int = 20,
    tol: float = 1e-6,
    init=None,
    euclidean: bool = False,
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

    if init is not None:
        # e.g. kmeans_parallel_init's (k×d matrix, cids) pair
        C, cids = init
        C = np.array(C, dtype="float64")
        cids = np.array(cids)
    else:
        cent_rows = init_centroids(embeddings, k).collect()
        if not cent_rows:
            # Clear message instead of a numpy shape error deep in a
            # mapInPandas worker (review r6).
            raise ValueError("lloyd_iterate: embeddings table is empty")
        cids = np.array(sorted(int(r.cid) for r in cent_rows))
        by_cid = {int(r.cid): [float(x) for x in r.cemb] for r in cent_rows}
        C = np.array([by_cid[c] for c in cids])  # k×d, row j ↔ cids[j]

    import os
    import tempfile
    import uuid

    cached = embeddings.select("vec_id", "embedding").persist()
    # Plan the per-iteration pass ONCE (r13, guide §1.2 step 2): the
    # only thing that changes between Lloyd rounds is the k×d centroid
    # matrix, so it crosses via a side file the combiner loads at task
    # start (_partial_stats_fn_from_file) and the SAME DataFrame is
    # re-collected every round — no per-round re-analysis/codegen.
    # np.save + os.replace keeps the swap atomic. Driver-local tmp is
    # correct for local mode; a cluster deploy points this at shared
    # storage (see the combiner's docstring).
    cdir = tempfile.gettempdir()
    cpath = os.path.join(cdir, f"fsk_lloyd_C-{uuid.uuid4().hex[:12]}.npy")
    d_dim = int(C.shape[1])
    iter_df = cached.select("embedding").mapInPandas(
        _partial_stats_fn_from_file(cpath, cids, d_dim, euclidean),
        "cid int, psum array<double>, n bigint",
    )

    def _publish(mat):
        tmp = f"{cpath}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as f:
            np.save(f, mat)
        os.replace(tmp, cpath)

    try:
        for _ in range(max_iter):
            # select("embedding"): the combiner never reads vec_id, and
            # an opaque mapInPandas defeats column pruning (guide §4.1)
            # — project the one needed column so the Arrow exchange
            # carries d floats per row, not d floats + an id.
            _publish(C)
            partials = iter_df.collect()
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

        final_fn = _final_assign_fn(C, cids, euclidean)
        # Materialize the final assignment BEFORE the finally-block
        # unpersists the input: the returned DataFrame is lazy, and
        # without this the cache would be gone by the time any caller
        # acts on it, re-scanning the source on every downstream action.
        return cached.mapInPandas(
            final_fn, "vec_id bigint, cluster_id int"
        ).localCheckpoint(eager=True)
    finally:
        cached.unpersist()
        try:
            os.unlink(cpath)
        except OSError:
            pass


def _final_assign_fn(C, cids, euclidean: bool = False):
    import numpy as np
    import pandas as pd

    bias = _euclid_bias(C, euclidean)

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            best = np.argmax(X @ C.T - bias, axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cluster_id": cids[best]}
            )

    return fn


# Shared DuckDB oracle CTE: one Lloyd assignment step (ten seed
# centroids by lowest vec_id, argmax dot with cid tie-break). Lives
# HERE — a non-registering module — so plans modules (ml, llm,
# quality) can share it without firing each other's @register calls
# mid-import, which would shift the correctness window (registry.py
# rotation invariant; review r6). The dot product is bit-identical to
# Spark's dot64 (float->double exact products, sequential
# left-to-right sum — verified over all 5000 pairs at sf0.01), so the
# argmax ranking agrees exactly.
ASSIGN_CTE = """
    WITH emb AS (
        -- a NULL or non-finite embedding cannot participate in vector
        -- ops: the contract twin of the NULL-ts window filter (a
        -- NULL-only centroid made c1 a NULL-element list and crashed
        -- DuckDB's list_inner_product in q_ml_kmeans_iter2,
        -- NULL-embeddings sweep r6; a NaN element forked every dot
        -- downstream, NaN/Inf sweep r6). vec_id IS NOT NULL (r7
        -- NULL-entity-id probe): in k-means the id IS the entity key
        -- (centroid init order, assignment state) — a NULL id made
        -- Spark's ORDER BY LIMIT k (ASC NULLS FIRST) elect a
        -- NULL-cid centroid that DuckDB's NULLS LAST never saw.
        -- Spark sides filter isNotNull & emb_finite in lockstep.
        SELECT vec_id, embedding FROM embeddings
        WHERE vec_id IS NOT NULL AND {fin}
    ), c AS (
        SELECT vec_id AS cid, embedding AS cemb
        FROM emb ORDER BY vec_id LIMIT 10
    ), scored AS (
        SELECT e.vec_id, e.embedding, c.cid,
               list_inner_product(e.embedding::DOUBLE[], c.cemb::DOUBLE[]) AS dot
        FROM emb e CROSS JOIN c
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY dot DESC, cid) AS rn
        FROM scored
    )
""".replace("{fin}", sql_emb_finite("embedding"))
