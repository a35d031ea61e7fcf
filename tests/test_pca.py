"""PCA operator: parity with a direct numpy PCA and spectral sanity.

The distributed path (per-partition Arrow moment partials + driver
eigh + JVM-side projection) must agree with computing the same PCA on
the collected matrix in one numpy call — that is the whole
correctness claim of the decomposition.
"""

from __future__ import annotations

import numpy as np
import pytest

from conftest import SF_SMOKE

from flink_streaming_kmeans_spark.operators.pca import fit_pca, project
from flink_streaming_kmeans_spark.sources.loader import load_table


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    )


def _numpy_pca(X, k):
    mean = X.mean(axis=0)
    cov = np.cov(X.T, bias=True)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, w[order]


def test_fit_matches_direct_numpy(spark, emb):
    mean, comps, ev = fit_pca(emb, k=4)
    X = np.vstack(
        [np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()]
    )
    m2, c2, ev2 = _numpy_pca(X, 4)
    np.testing.assert_allclose(mean, m2, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(ev, ev2, rtol=1e-7, atol=1e-10)
    # eigenvectors match up to the shared sign convention
    np.testing.assert_allclose(comps, c2, rtol=1e-6, atol=1e-7)


def test_projection_jvm_matches_numpy_and_orders_variance(spark, emb):
    mean, comps, ev = fit_pca(emb, k=2)
    rows = project(emb, mean, comps).select("vec_id", "pc0", "pc1").collect()
    got = {r.vec_id: (r.pc0, r.pc1) for r in rows}
    X = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in emb.collect()
    }
    want = {
        vid: ((x - mean) @ comps[0], (x - mean) @ comps[1])
        for vid, x in X.items()
    }
    for vid in want:
        np.testing.assert_allclose(got[vid], want[vid], rtol=1e-8, atol=1e-8)
    # spectral sanity: pc0 captures at least as much variance as pc1,
    # and the sample variances of the projections equal the eigenvalues
    p0 = np.array([v[0] for v in got.values()])
    p1 = np.array([v[1] for v in got.values()])
    assert p0.var() >= p1.var()
    np.testing.assert_allclose(p0.var(), ev[0], rtol=1e-6)
    np.testing.assert_allclose(p1.var(), ev[1], rtol=1e-6)
