"""Multi-table LSH ANN (operators/ann.py) — recall and geometry
(SURVEY §2.10 test-tier).

The sf testdata's vectors are near-orthogonal (top-3 cosine ≈ 0.3),
so "recall on the natural data" would measure noise. The standard ANN
evaluation instead PLANTS ground truth: perturbed copies at cosine
≈ 0.98 of 20 probe vectors, then asserts the multi-table index
recovers them. Also locks in two structural properties:

- table 0 of the multi-table index reproduces the single-table
  q_sim_ann buckets exactly (candidates are a superset by
  construction — recall is monotone in n_tables);
- the 8-bit signature actually spreads the corpus (regression for the
  LCG parity-bit degeneracy, where every hyperplane collapsed to the
  same sign pattern and only 2 buckets existed).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from conftest import SF_T2

import pytest

pytestmark = pytest.mark.slow  # slow lane — see pytest.ini



def _embeddings(spark):
    from flink_streaming_kmeans_spark.sources.loader import load_table

    return load_table(spark, SF_T2, "embeddings").select("vec_id", "embedding")


def test_signature_spreads_buckets(spark):
    from flink_streaming_kmeans_spark.operators.ann import lsh_buckets

    e = _embeddings(spark)
    n = e.count()
    n_buckets = lsh_buckets(e, 1, 8).select("bucket").distinct().count()
    # parity-bit degeneracy gave exactly 2 buckets for any corpus
    assert n_buckets > min(50, n // 4), n_buckets


def test_table0_matches_single_table(spark):
    from flink_streaming_kmeans_spark.operators.ann import lsh_buckets

    e = _embeddings(spark)
    single = {(r.vec_id, r.bucket) for r in lsh_buckets(e, 1, 8).collect()}
    multi_t0 = {
        (r.vec_id, r.bucket)
        for r in lsh_buckets(e, 4, 8).where(F.col("table") == 0).collect()
    }
    assert single == multi_t0


def test_planted_near_dup_recall(spark):
    from flink_streaming_kmeans_spark.operators.ann import ann_topk

    e = _embeddings(spark)
    rows = e.where(F.col("vec_id") < 20).collect()
    rng = np.random.default_rng(7)
    planted = []
    for r in rows:
        v = np.array(r.embedding, dtype=np.float64)
        g = rng.standard_normal(v.shape)
        g -= g @ v / (v @ v) * v          # orthogonal noise
        g *= 0.2 * np.linalg.norm(v) / np.linalg.norm(g)
        planted.append((10000 + r.vec_id, [float(x) for x in (v + g)]))
    pdf = spark.createDataFrame(planted, e.schema)
    corpus = e.union(pdf)

    top = ann_topk(corpus, n_tables=8, n_bits=8, k=3, n_probes=20).collect()
    got = {(r.query_id, r.neighbor_id) for r in top}
    hits = sum((i, 10000 + i) in got for i in range(20))
    assert hits >= 18, f"planted recall {hits}/20"


def _with_planted(spark, e, n=20, scale=0.2, seed=7):
    rows = e.where(F.col("vec_id") < n).collect()
    rng = np.random.default_rng(seed)
    planted = []
    for r in rows:
        v = np.array(r.embedding, dtype=np.float64)
        g = rng.standard_normal(v.shape)
        g -= g @ v / (v @ v) * v
        g *= scale * np.linalg.norm(v) / np.linalg.norm(g)
        planted.append((10000 + r.vec_id, [float(x) for x in (v + g)]))
    return e.union(spark.createDataFrame(planted, e.schema))


def test_multiprobe_dominates_single_probe(spark):
    """Hamming-1 multi-probe at L=2 tables must (a) be a candidate
    superset of single-probe (flip 0 = original bucket), and (b)
    recover nearly all planted near-dups where single-probe at the
    same L misses a chunk — the memory-capped recall lever."""
    from flink_streaming_kmeans_spark.operators.ann import (
        ann_topk,
        ann_topk_multiprobe,
    )

    e = _embeddings(spark)
    corpus = _with_planted(spark, e)

    single = {
        (r.query_id, r.neighbor_id)
        for r in ann_topk(corpus, n_tables=2, n_probes=20).collect()
    }
    multi = {
        (r.query_id, r.neighbor_id)
        for r in ann_topk_multiprobe(corpus, n_tables=2, n_probes=20).collect()
    }
    s_hits = sum((i, 10000 + i) in single for i in range(20))
    m_hits = sum((i, 10000 + i) in multi for i in range(20))
    assert m_hits >= s_hits, (m_hits, s_hits)
    assert m_hits >= 17, f"multiprobe planted recall {m_hits}/20 (single {s_hits}/20)"


def _skewed_corpus(spark, n_dominant=1600, n_background=400, dim=64, seed=11):
    """Adversarial distribution: one dominant cluster holding 80% of
    the corpus at cosine ≈0.99 of a shared center, plus uniform
    background. The uniform-corpus recall tests can't see the LSH
    failure mode this provokes: clustered vectors agree on most
    hyperplanes, so a handful of buckets hold most of the data."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal(dim)
    c /= np.linalg.norm(c)
    vecs = []
    for i in range(n_dominant):
        g = rng.standard_normal(dim)
        g -= g @ c * c
        v = c + 0.15 * g / np.linalg.norm(g)
        vecs.append((i, [float(x) for x in v]))
    for i in range(n_background):
        v = rng.standard_normal(dim)
        vecs.append((n_dominant + i, [float(x) for x in v]))
    return spark.createDataFrame(vecs, "vec_id bigint, embedding array<float>")


def test_skewed_cluster_recall_and_occupancy(spark):
    """Round-2 verdict item 7: recall must hold when one cluster
    dominates. Asserts (a) the skew is REAL — the hottest table-0
    bucket holds ≥25% of the corpus (so this fixture genuinely
    stresses the Σ|bucket|² candidate blow-up, unlike the uniform
    corpus where buckets are balanced), and (b) multi-probe recall of
    planted near-dups inside the dominant cluster stays ≥17/20 —
    bucket collisions add candidates (cost), but the exact re-rank
    keeps them from displacing true neighbors (correctness). The scale
    lever for the hot-bucket COST (not recall) is more bits per table:
    occupancy halves per bit, at zero plan-shape change."""
    from flink_streaming_kmeans_spark.operators.ann import (
        ann_topk_multiprobe,
        lsh_buckets,
    )

    # scale=0.02 (not the uniform tests' 0.2): in the dominant cluster,
    # SIBLINGS already sit at cosine ≈0.978, so a 0.2-perturbed copy
    # (cosine ≈0.98) would not be the unambiguous nearest neighbor —
    # ground truth itself would be noise. 0.02 puts the planted pair at
    # ≈0.9998, clear of every sibling, so recall measures the INDEX.
    e = _skewed_corpus(spark)
    corpus = _with_planted(spark, e, n=20, scale=0.02, seed=13)

    occ = (
        lsh_buckets(e, 1, 8)
        .groupBy("bucket")
        .count()
        .orderBy(F.desc("count"))
        .collect()
    )
    n = e.count()
    assert occ[0]["count"] >= 0.25 * n, (
        f"fixture not skewed: max bucket {occ[0]['count']}/{n}, "
        f"histogram {[(r.bucket, r['count']) for r in occ[:5]]}"
    )

    top = ann_topk_multiprobe(corpus, n_tables=2, n_probes=20).collect()
    got = {(r.query_id, r.neighbor_id) for r in top}
    hits = sum((i, 10000 + i) in got for i in range(20))
    assert hits >= 17, f"skewed-cluster planted recall {hits}/20"


def test_multi_table_dominates_single_table(spark, registry):
    """More candidate tables can only improve (or keep) the exact
    re-ranked top-k: for every query, q_sim_ann_multi's k-th best
    similarity must be >= q_sim_ann's (table 0 of the multi geometry
    IS q_sim_ann's table, so its candidates are a superset)."""
    from collections import defaultdict

    from conftest import SF_SMOKE

    queries, _ = registry
    single = defaultdict(list)
    for r in queries["q_sim_ann"](spark, SF_SMOKE).collect():
        single[r.query_id].append(r.sim)
    multi = defaultdict(list)
    for r in queries["q_sim_ann_multi"](spark, SF_SMOKE).collect():
        multi[r.query_id].append(r.sim)

    assert set(single) <= set(multi)
    for q, sims in single.items():
        assert len(multi[q]) >= len(sims)
        for rank, s in enumerate(sorted(sims, reverse=True)):
            assert sorted(multi[q], reverse=True)[rank] >= s
