"""Empty-input parity: the oracle comparison re-run on EMPTY tables.

Small-SF parity proves the happy path; the classic places engines
disagree are the edges — grouping sets' grand-total row on zero input,
null-aware anti joins, windows over empty partitions, aggregates that
return one row vs none. Each selected query runs on a directory of
schema-identical but EMPTY parquet tables, against the same DuckDB
oracle, with the same rows/schema/hash comparator the driver uses.

The subset covers every plan module and each construct with known
empty-input subtleties; ML/streaming queries are excluded because
their semantics genuinely require data (k-means needs k seed points)
— that exclusion is the documented behavior, not an oversight.

One GENUINE engine divergence found by this sweep and pinned below
(test_grouping_sets_empty_divergence): on zero input rows the SQL
standard (and DuckDB, and PostgreSQL) emits the grand-total grouping
set's single row — count 0, NULL group keys — while Spark's
ROLLUP/CUBE/GROUPING SETS emit NO rows. A user moving a
grouping-sets query between engines sees a 0-vs-1-row difference on
empty partitions; on any non-empty input the engines agree (the
regular sf0.01 parity rows stay hash-green).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from oracle import check_parity, make_duckdb

from conftest import SF_SMOKE

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# One representative per module + every empty-edge-sensitive construct.
EMPTY_CHECKED = [
    "q_scan_parquet",
    "q_sink_roundtrip",
    "q_source_csv",
    "q_project_compute",
    "q_case_null",
    "q_join_inner",
    "q_join_left",
    "q_join_full",
    "q_join_anti",
    "q_join_not_in",  # null-aware anti join on empty build side
    "q_join_asof",
    "q_join_range_binned",
    "q_agg_q1",
    "q_agg_percentile",
    "q_agg_string_agg",
    "q_set_union_all",
    "q_set_except",
    "q_win_rank",
    "q_win_running",
    "q_sort_limit",
    "q_sub_exists",
    "q_sub_scalar",  # scalar subquery over empty → NULL row semantics
    "q_cte_reuse",
    "q_pivot",  # explicit value list keeps schema stable on empty
    "q_unpivot",
    "q_merge_upsert",
    "q_cdc_diff",
    "q_str_funcs",
    "q_date_funcs",
    "q_json_extract",
    "q_evt_funnel",
    "q_ts_gapfill",
    "q_dedup_exact",
    "q_dedup_lsh",
    "q_text_tfidf",
    "q_text_quality",
    "q_text_surprisal",
    "q_text_heavy_hitters",
    "q_emb_quantize",
    "q_zorder_cluster",
    "q_evt_markov",
    "q_evt_anomaly",
    "q_evt_basket",
    "q_graph_pagerank",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_profile_table",
    "q_feat_snapshot",  # LEFT join semantics with an empty fact side
    "q_neg_sample",  # anti-join with empty positives keeps all candidates
    "q_sketch_cms",  # empty key set -> empty sketch, no NULL cells
    "q_sketch_bloom",  # empty member set + empty probe side
    "q_sketch_hll",  # empty register file, no bucket-0 fabrication
    "q_join_asof_tol",  # tolerance filter over an empty asof union
    "q_evt_cep",  # empty sequence aggregate, replace-trick on ''
    "q_dedup_prefix",  # empty corpus -> empty prefix buckets
    "q_sketch_quantile",  # NULL min/max stats row, empty histogram
    "q_tpch_q10",  # top-k over an empty join tree
    "q_tpch_q18",  # HAVING aggregate + semi join over empty facts
    "q_vocab_typo",  # deletion-variant join over an empty vocabulary
    "q_dq_expect",  # all-zero violation counts, 5 rows either way
    # r6-window additions (r5 verdict task 9 — every windowed module
    # keeps a degenerate row):
    "q_udf_python",  # row-at-a-time UDF over zero rows
    "q_udaf_pandas",  # grouped pandas UDAF with no groups
    "q_udtf_python",  # UDTF lateral join over zero rows
    "q_win_tumble",  # windowed agg on empty events
    "q_win_slide",  # slide enumeration on empty events
    "q_win_session",  # session windows on empty events
    "q_source_orc",  # ORC round-trip of an empty table
    "q_join_asof_fwd",  # forward as-of over empty both sides
    "q_sim_ann_multi",  # LSH buckets over an empty embedding table
    "q_ml_score",  # linear scorer over zero vectors
    "q_agg_approx_cd",  # empty register file -> zero estimate rows
    # streaming drives with explicit empty-table guards (top-is-None
    # early return; the unguarded drives keep the documented loud
    # replay error instead)
    "q_stream_session",
    "q_stream_join_left",
    "q_stream_slide",
]


@pytest.fixture(scope="module")
def empty_sf(spark):
    d = tempfile.mkdtemp(prefix="fsk_empty_sf_")
    for t in TABLES:
        # limit(0) preserves the exact schema the loader normalizes to
        df = spark.read.parquet(os.path.join(SF_SMOKE, f"{t}.parquet"))
        stage = os.path.join(d, f"_stage_{t}")
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(stage)
        f = next(x for x in sorted(os.listdir(stage)) if x.endswith(".parquet"))
        shutil.move(os.path.join(stage, f), os.path.join(d, f"{t}.parquet"))
        shutil.rmtree(stage)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def empty_duck(empty_sf):
    con = make_duckdb(empty_sf)
    yield con
    con.close()


@pytest.mark.parametrize("name", EMPTY_CHECKED)
def test_empty_input_parity(spark, empty_duck, registry, empty_sf, name):
    queries, oracles = registry
    r = check_parity(
        spark, empty_duck, name, queries[name], oracles[name], empty_sf
    )
    assert r.ok, (
        f"{name} diverges on EMPTY input: rows={r.rows_match} "
        f"schema={r.schema_match} hash={r.hash_match}\n{r.detail}"
    )


GROUPING_SET_QUERIES = ["q_agg_rollup", "q_agg_cube", "q_agg_groupingsets"]


@pytest.mark.parametrize("name", GROUPING_SET_QUERIES)
def test_grouping_sets_empty_divergence(
    spark, empty_duck, registry, empty_sf, name
):
    """Pin the known Spark-vs-standard divergence (module docstring):
    Spark returns zero rows, DuckDB returns exactly the grand-total
    grouping set's row(s). If a Spark upgrade ever aligns with the
    standard, this test fails and the three queries move back into
    EMPTY_CHECKED."""
    queries, oracles = registry
    assert queries[name](spark, empty_sf).count() == 0
    n_oracle = len(empty_duck.sql(oracles[name]).fetchall())
    assert n_oracle >= 1, n_oracle


def test_ragged_embeddings_parity(spark, registry, tmp_path):
    """Review-r6 hazard class: a vector whose embedding is EMPTY or
    SHORT diverges between Spark's posexplode (drops it) and the
    oracles' CROSS JOIN range(64) (fabricates NULL rows) unless both
    sides carry the size-64 guard. Run the three posexplode queries
    on a synthetic embeddings table with one empty, one short, and
    two full vectors — full oracle parity must hold."""
    import duckdb

    full = [float(i % 7) / 8.0 for i in range(64)]
    rows = [
        (1, [v + 0.01 for v in full], 1),
        (2, full, 0),
        (3, [], 1),          # empty vector
        (4, full[:10], 0),   # short vector
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    sf = str(tmp_path / "ragged_sf")
    stage = f"{sf}/_stage"
    df.coalesce(1).write.parquet(stage)
    f = next(x for x in sorted(os.listdir(stage)) if x.endswith(".parquet"))
    shutil.move(os.path.join(stage, f), f"{sf}/embeddings.parquet")
    shutil.rmtree(stage, ignore_errors=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS"
        f" SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    queries, oracles = registry
    for name in ("q_emb_quantize", "q_sim_ann_multi", "q_ml_score"):
        r = check_parity(spark, con, name, queries[name], oracles[name], sf)
        assert r.ok, f"{name}: rows={r.rows_match} schema={r.schema_match} hash={r.hash_match}\n{r.detail}"
        # and the full-width vectors survived the guard
        assert r.spark_rows > 0, name
