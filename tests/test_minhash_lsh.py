"""MinHashLSH approximate near-dup vs the exact shingle-join pairs
(SURVEY §2.10 test-tier): recall >= 0.9 at sf0.01."""

from __future__ import annotations

from conftest import SF_T2

import pytest

pytestmark = pytest.mark.slow  # slow lane — see pytest.ini



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


def test_lsh_recall_at_lower_threshold(spark):
    """The lower-similarity regime (threshold 0.6) the banded
    geometry must also cover — collision probability per table drops
    as j^rows, so this is where under-banded configs silently lose
    pairs. Ground truth recomputed from the canonical shingles at
    j >= 0.6 (the 0.8-filtered q_dedup_near set can't serve here)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from flink_streaming_kmeans_spark.operators.minhash import (
        near_dup_candidates_lsh,
        shingle_rows,
    )
    from flink_streaming_kmeans_spark.sources.loader import load_table

    docs = load_table(spark, SF_T2, "documents")
    ex = shingle_rows(docs).withColumn(
        "ns", F.count(F.lit(1)).over(W.partitionBy("doc_id"))
    )
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.first("a.ns").alias("na"),
            F.first("b.ns").alias("nb"),
        )
    )
    jac = F.col("c").cast("double") / (
        F.col("na") + F.col("nb") - F.col("c")
    ).cast("double")
    exact = {(r.d1, r.d2) for r in pairs.where(jac >= 0.6).collect()}
    assert exact, "ground truth unexpectedly empty"

    approx = {
        (r.doc_id1, r.doc_id2)
        for r in near_dup_candidates_lsh(
            docs, threshold=0.6, num_hash_tables=16
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"LSH recall at 0.6: {recall:.2f}"
