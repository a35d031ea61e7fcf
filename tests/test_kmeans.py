"""K-means correctness (SURVEY §5.2.2, adapted to the measured data).

IMPORTANT data fact (measured, 2026-08-13): the synthetic embeddings'
ground-truth labels are NOT recoverable by cosine k-means — even
initializing from the TRUE per-label mean centroids, Lloyd's converges
to ~0.30 purity at sf0.01 (~0.17 at sf0.1); intra-label mean cosine is
0.021 vs 0.0003 inter — the clusters are barely above noise. The
survey's "purity >= 0.95" bar is therefore impossible on this data for
ANY k-means implementation. The meaningful correctness checks are:

1. the distributed Lloyd's loop agrees with a local numpy reference
   implementation (same init, same update rule) — >= 99% identical
   assignments (tiny float-summation-order slack);
2. the distributed result beats the oracle-init purity's random
   baseline and is deterministic across runs;
3. MLlib KMeans runs on the same vectors (API parity smoke).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest

from conftest import SF_SMOKE

pytestmark = pytest.mark.slow  # slow lane — see pytest.ini



def _load_xy(spark, sf_dir):
    from flink_streaming_kmeans_spark.sources.loader import load_table

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding", "label")
        .collect()
    )
    rows.sort(key=lambda r: r.vec_id)
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    y = np.array([r.label for r in rows])
    ids = np.array([r.vec_id for r in rows])
    return X, y, ids


def _numpy_lloyd(X, ids, k=10, max_iter=20, tol=1e-6):
    """Reference implementation mirroring operators/kmeans.lloyd_iterate."""
    order = np.argsort(ids)[:k]
    cids = ids[order].astype(int)
    C = X[order].copy()
    for _ in range(max_iter):
        best = np.argmax(X @ C.T, axis=1)
        new_C = C.copy()
        for j in range(k):
            m = best == j
            if m.any():
                new_C[j] = X[m].mean(axis=0)
        if np.abs(new_C - C).max() < tol:
            C = new_C
            break
        C = new_C
    best = np.argmax(X @ C.T, axis=1)
    return dict(zip(ids.tolist(), cids[best].tolist()))


def test_iter_matches_numpy_reference(spark, registry):
    queries, _ = registry
    X, y, ids = _load_xy(spark, SF_SMOKE)
    expected = _numpy_lloyd(X, ids)
    got = {
        r.vec_id: r.cluster_id
        for r in queries["q_ml_kmeans_iter"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expected)
    agree = sum(got[v] == expected[v] for v in got) / len(got)
    assert agree >= 0.99, f"only {agree:.3f} agreement with numpy reference"


def test_sidefile_combiner_bit_identical(spark):
    """r13: lloyd_iterate plans its per-iteration pass once and ships
    the centroid matrix via a side file the combiner loads at task
    start (_partial_stats_fn_from_file). The partials must be
    BIT-identical to the closure-baked combiner's — same GEMM, same
    tie-break, same accumulation order — or the plan-once rewrite
    would silently change which Lloyd fixpoint the loop reaches."""
    import os
    import tempfile
    import uuid

    import numpy as np

    from flink_streaming_kmeans_spark.functions.vector import emb_finite
    from flink_streaming_kmeans_spark.operators.kmeans import (
        _partial_stats_fn,
        _partial_stats_fn_from_file,
        init_centroids,
    )
    from flink_streaming_kmeans_spark.sources.loader import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, SF_SMOKE, "embeddings").where(
        F.col("vec_id").isNotNull() & emb_finite("embedding")
    ).select("embedding")
    cent = init_centroids(
        load_table(spark, SF_SMOKE, "embeddings").where(
            F.col("vec_id").isNotNull() & emb_finite("embedding")
        )
    ).collect()
    cids = np.array(sorted(int(r.cid) for r in cent))
    by = {int(r.cid): [float(x) for x in r.cemb] for r in cent}
    C = np.array([by[c] for c in cids])

    schema = "cid int, psum array<double>, n bigint"
    closure = e.mapInPandas(_partial_stats_fn(C, cids), schema).collect()
    cpath = os.path.join(
        tempfile.gettempdir(), f"fsk_test_C-{uuid.uuid4().hex[:8]}.npy"
    )
    np.save(cpath, C)
    try:
        sidefile = e.mapInPandas(
            _partial_stats_fn_from_file(cpath, cids, C.shape[1]), schema
        ).collect()
    finally:
        os.unlink(cpath)
    a = {int(r.cid): (np.array(r.psum), int(r.n)) for r in closure}
    b = {int(r.cid): (np.array(r.psum), int(r.n)) for r in sidefile}
    assert set(a) == set(b)
    for c in a:
        assert a[c][1] == b[c][1]
        assert np.array_equal(a[c][0], b[c][0]), f"cid {c} psum drifted"


def test_iter_better_than_random_and_uses_k_clusters(spark, registry):
    queries, _ = registry
    X, y, ids = _load_xy(spark, SF_SMOKE)
    got = {
        r.vec_id: r.cluster_id
        for r in queries["q_ml_kmeans_iter"](spark, SF_SMOKE).collect()
    }
    labels_by_cluster = {}
    for vid, cid in got.items():
        labels_by_cluster.setdefault(cid, []).append(y[ids == vid][0])
    purity = sum(
        Counter(v).most_common(1)[0][1] for v in labels_by_cluster.values()
    ) / len(got)
    assert len(labels_by_cluster) >= 5  # no total collapse
    assert purity >= 0.12  # > random (0.1) — the data supports no more


def test_assign_is_argmax_dot(spark, registry):
    """q_ml_kmeans_assign's (vec_id → cluster) equals numpy argmax."""
    queries, _ = registry
    X, y, ids = _load_xy(spark, SF_SMOKE)
    order = np.argsort(ids)[:10]
    C = X[order]
    cids = ids[order].astype(int)
    expected = dict(zip(ids.tolist(), cids[np.argmax(X @ C.T, axis=1)].tolist()))
    got = {
        r.vec_id: r.cluster_id
        for r in queries["q_ml_kmeans_assign"](spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_mllib_parity_smoke(spark):
    """MLlib KMeans on the same vectors: runs, k clusters, finite cost
    (Euclidean objective ≠ our cosine argmax, so no assignment-level
    comparison — on non-normalized CENTROIDS the two differ)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from flink_streaming_kmeans_spark.sources.loader import load_table

    e = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", array_to_vector("embedding").alias("features")
    )
    model = KMeans(k=10, seed=42, maxIter=10).fit(e)
    preds = model.transform(e)
    assert preds.select("prediction").distinct().count() == 10
    assert model.summary.trainingCost > 0


def test_kmeans_parallel_init_beats_adversarial_naive(spark):
    """k-means|| (Bahmani) init on an id-order-adversarial mixture:
    the first k vec_ids all belong to ONE true cluster, so naive
    first-k init seeds every centroid inside it and Lloyd's cannot
    un-collapse (low purity). k-means|| samples by distance
    contribution across rounds, so its k seeds spread over the true
    clusters and the SAME Lloyd loop recovers purity >= 0.9.
    Deterministic throughout (hash-based sampling), so no flaky
    retries."""
    import numpy as np
    from collections import Counter

    from flink_streaming_kmeans_spark.operators.kmeans import (
        kmeans_parallel_init,
        lloyd_iterate,
    )

    rng = np.random.default_rng(17)
    k, dim, n = 10, 64, 600
    centers = rng.standard_normal((k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(n):
        # ADVERSARIAL id order: ids 0..59 are all cluster 0, etc.
        c = i // (n // k)
        v = centers[c] + 0.15 * rng.standard_normal(dim)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v], c))
    e = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )

    def purity(asg_df):
        got = {r.vec_id: r.cluster_id for r in asg_df.collect()}
        byc: dict = {}
        for i, _, lab in rows:
            byc.setdefault(got[i], []).append(lab)
        return sum(Counter(v).most_common(1)[0][1] for v in byc.values()) / n

    naive = purity(lloyd_iterate(spark, e, k=k, max_iter=20))
    init = kmeans_parallel_init(e, k=k)
    kpp = purity(lloyd_iterate(spark, e, k=k, max_iter=20, init=init))
    # Measured: naive-init Lloyd partially recovers (~0.90 — merged +
    # split clusters it cannot fix); k-means|| init is exact (1.0).
    assert kpp >= 0.95, (kpp, naive)
    assert kpp > naive, (kpp, naive)
