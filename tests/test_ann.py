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
