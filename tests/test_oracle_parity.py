"""Pre-flight replica of the driver's t2 correctness gate (SURVEY §5.2.1).

Every hash-checked query runs on Spark AND its DuckDB oracle at
sf0.001; row count, schema, and order-insensitive value hash must
match. A failure here = a red CORRECTNESS row for that query.

The riskiest queries (float rounding, window frames, shingle joins,
k-means) are re-checked at sf0.01 — the exact scale the driver uses.
"""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE, SF_T2
from oracle import check_parity


def _hash_query_names():
    from flink_streaming_kmeans_spark.plans.registry import collect

    queries, oracles = collect()
    return sorted(oracles)


RISKY = [
    "q_agg_q1",
    "q_win_range_frame",
    "q_dedup_near",
    "q_ml_kmeans_assign",
    "q_ml_kmeans_update",
    "q_udaf_pandas",
    "q_win_slide",
    "q_win_session",
    "q_join_asof",
]


@pytest.mark.parametrize("name", _hash_query_names())
def test_parity_smoke(spark, duck_smoke, registry, name):
    queries, oracles = registry
    r = check_parity(spark, duck_smoke, name, queries[name], oracles[name], SF_SMOKE)
    assert r.ok, f"{name}: rows={r.rows_match} schema={r.schema_match} hash={r.hash_match}\n{r.detail}"


@pytest.mark.parametrize("name", RISKY)
def test_parity_t2_risky(spark, duck_t2, registry, name):
    queries, oracles = registry
    r = check_parity(spark, duck_t2, name, queries[name], oracles[name], SF_T2)
    assert r.ok, f"{name}: rows={r.rows_match} schema={r.schema_match} hash={r.hash_match}\n{r.detail}"


def test_rows_only_queries_run(spark, registry):
    queries, oracles = registry
    rows_only = sorted(set(queries) - set(oracles))
    assert rows_only == [
        "q_emb_pca",
        "q_kmeans_stream",
        "q_kmeans_stream_reassign",
        "q_ml_kmeans_iter",
    ]
    for name in rows_only:
        assert queries[name](spark, SF_SMOKE).count() > 0


def test_contract_is_complete(registry):
    """SURVEY §2.1-2.11 names 59 queries (57 hash + 2 rows-only);
    §2.12 adds 30 round-2 extensions (textops, relational surface,
    binned range join, partitioned sink, boolean/try aggregates,
    dedup clustering, tf-idf, map funcs, salted join, CSV/JSONL
    sources, hash sampling, event funnel, mode, navigation windows,
    gap fill, MinHash-LSH near-dup, IVF ANN, correlation, NOT-IN
    null-aware anti join, stratified sampling, multi-distinct,
    time-range window, time rollup, levenshtein, ngram freq, ordered
    string agg, struct round-trip, decontamination, token chunking,
    repetition filter, embedding normalize, concat packing, SCD2
    intervals, merge upsert, end-to-end clean pipeline, CDC snapshot
    diff), all hash-checked. Round 3 adds 7 more: the lakehouse
    quartet (COW merge, time travel, incremental changeset, MERGE
    delete), the re-keyed ntile twin, PII redaction, canonical-doc
    selection, and mixture sampling. Round 4 adds q_kmeans_stream —
    the streaming MacQueen k-means promoted to a driver-recorded
    rows-tier query — plus the training-pipeline six (q_shard_assign,
    q_curriculum_order, q_emb_gram, q_evt_retention, q_evt_histogram,
    q_stream_tumble). Round 5 adds q_ml_kmeans_iter2 (two unrolled
    hash-checked Lloyd steps), PROMOTES q_stream_tumble to hash-tier
    (contiguous-time batches make the streaming state exactly the
    batch aggregate), and adds the streaming-evidence trio
    (plans/streams.py): q_stream_dedup + q_stream_join (both hash)
    and q_kmeans_stream_reassign (rows — re-delivery exercising the
    reference co-operator's remove/add arithmetic), plus
    q_stream_upsert (hash — foreachBatch CDC merge into the manifest
    lakehouse converging to q_merge_cow's single-merge oracle).
    Later in round 5, plans/corpus.py adds four more hash-tier
    training-pipeline/storage operators: q_text_heavy_hitters,
    q_text_surprisal (quantized-integer unigram LM score),
    q_emb_quantize (int8 scalar quantization), q_zorder_cluster
    (Morton clustering key), q_graph_pagerank (two unrolled PageRank
    iterations, full-value parity), q_evt_markov (all-integer
    Markov transition matrix), q_evt_anomaly (3-sigma outliers,
    integer output), q_tpch_q3/q_tpch_q5 (the classic selective and
    six-table TPC-H join trees), q_evt_basket (co-occurrence
    lift, integer lift_e4), q_profile_table (per-column
    null/distinct/min-max profiling), q_feat_snapshot (point-in-time
    feature assembly), q_neg_sample (deterministic negative
    sampling), q_stream_session (append-mode streaming
    sessionization converging to the batch gaps-and-islands), the
    hash-verifiable sketch family (q_sketch_cms, q_sketch_bloom,
    q_sketch_hll, q_sketch_quantile — portable sketches,
    plans/sketches.py),
    the late coverage additions (q_source_orc, q_join_asof_fwd,
    q_join_asof_tol, q_evt_cep, q_dedup_prefix, q_emb_pca —
    plans/coverage.py), and q_stream_cep (the CEP NFA as a stateful
    stream, hash-exact against the batch oracle), q_stream_hll (the
    HLL registers maintained by Spark's own stateful streaming
    aggregation in complete mode), q_lake_compact (small-file
    bin-packing as a snapshot, content + layout both hash-pinned),
    q_sim_ann_multi (two-table LSH ANN, candidate union + dedup +
    exact re-rank), q_stream_join_left (watermark-driven outer
    emission), q_tpch_q10/q_tpch_q18 (returned-item and
    large-volume-customer join trees), q_stream_quantile (the
    histogram as a complete-mode streaming aggregate), and
    q_vocab_typo (FastSS deletion-neighborhood edit-distance join),
    q_dq_expect (declarative data-quality expectation sweep),
    q_stream_topk (heavy-hitter counters as a complete-mode
    streaming aggregate), and q_ml_score (all-integer linear-model
    batch inference; q_stream_slide joined in r6): 167 = 163 hash + 4 rows-only (q_agg_approx_cd
    went hash-tier in round 6 via the portable integer-exact HLL
    estimate — r5 verdict task 5)."""
    queries, oracles = registry
    assert len(queries) == 167, sorted(queries)
    assert len(oracles) == 163
    # Exactly the four contract rows-tier queries lack oracles.
    assert sorted(set(queries) - set(oracles)) == [
        "q_emb_pca",
        "q_kmeans_stream",
        "q_kmeans_stream_reassign",
        "q_ml_kmeans_iter",
    ]
