"""MinHashLSH approximate near-dup vs the exact shingle-join pairs
(SURVEY §2.10 test-tier): recall >= 0.9 at sf0.01."""

from __future__ import annotations

from conftest import SF_T2


def test_lsh_recall_against_exact(spark, registry):
    from flink_streaming_kmeans_spark.operators.minhash import (
        near_dup_candidates_lsh,
    )
    from flink_streaming_kmeans_spark.sources.loader import load_table

    queries, _ = registry
    exact = {
        (r.doc_id1, r.doc_id2)
        for r in queries["q_dedup_near"](spark, SF_T2).collect()
    }
    assert len(exact) == 25  # measured ground truth at sf0.01

    docs = load_table(spark, SF_T2, "documents")
    approx = {
        (r.doc_id1, r.doc_id2)
        for r in near_dup_candidates_lsh(docs, threshold=0.8).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.2f} < 0.9 ({len(approx)} candidates)"


def test_dedup_lsh_query_recall_vs_exact(spark, registry):
    """The registered q_dedup_lsh (4 bands × 3 rows) must recover
    ≥90% of the exact Jaccard≥0.8 pairs; theory: P(collide) =
    1-(1-j³)⁴ ≈ 0.94 at j=0.8, higher above. Precision is 1.0 by
    construction (exact re-verification of candidates)."""
    from conftest import SF_T2 as SF_T1

    queries, _ = registry
    exact = {
        (r.doc_id1, r.doc_id2)
        for r in queries["q_dedup_near"](spark, SF_T1).collect()
    }
    lsh = {
        (r.doc_id1, r.doc_id2)
        for r in queries["q_dedup_lsh"](spark, SF_T1).collect()
    }
    assert lsh <= exact, "LSH output must be exactly-verified (no false positives)"
    assert len(exact & lsh) >= 0.9 * len(exact), (len(exact), len(lsh))
