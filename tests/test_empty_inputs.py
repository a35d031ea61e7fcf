"""Empty-input parity: the oracle comparison re-run on EMPTY tables —
over the FULL registry (r7 verdict task 4; was a 78-query subset).

Small-SF parity proves the happy path; the classic places engines
disagree are the edges — grouping sets' grand-total row on zero input,
null-aware anti joins, windows over empty partitions, aggregates that
return one row vs none. EVERY hash query runs on a directory of
schema-identical but EMPTY parquet tables, against the same DuckDB
oracle, with the same rows/schema/hash comparator the driver uses.
The list is DERIVED from the live registry, so a newly registered
hash query is covered automatically — coverage gaps were exactly how
the r7 composed program's divergence classes stayed hidden.

GENUINE engine divergence found by this sweep and pinned below
(test_grouping_sets_empty_divergence): on zero input rows the SQL
standard (and DuckDB, and PostgreSQL) emits the grand-total grouping
set's single row — count 0, NULL group keys — while Spark's
ROLLUP/CUBE/GROUPING SETS emit NO rows. A user moving a
grouping-sets query between engines sees a 0-vs-1-row difference on
empty partitions; on any non-empty input the engines agree (the
regular sf0.01 parity rows stay hash-green). The r8 full-registry
extension found the SAME class hiding in q_rollup_time (a ROLLUP) and
three NEW robustness bugs, all fixed rather than excluded: the
lakehouse crashed on zero-data-file snapshots (schema now lives in
the manifest, the Delta/Iceberg design), q_sink_partitioned's re-read
could not infer a schema from an empty partitioned dir (explicit
schema now), and six streaming drives aborted in replay prep
(empty-source guards + ntile clamps, the q_stream_session idiom).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from oracle import check_parity, make_duckdb

from conftest import SF_SMOKE
from flink_streaming_kmeans_spark.plans.registry import collect as _collect
from flink_streaming_kmeans_spark.sources.loader import TABLES

# Spark emits NO rows for ROLLUP/CUBE/GROUPING SETS over zero input;
# the standard (and DuckDB) emit the grand-total set's row(s) — the
# pinned divergence (module docstring + test below).
GROUPING_SET_QUERIES = [
    "q_agg_rollup",
    "q_agg_cube",
    "q_agg_groupingsets",
    "q_rollup_time",
]

# Every hash query except the pinned grand-total divergences. The
# rows-tier queries (no oracle) are covered by their own pytest
# invariants, not this comparator.
_QUERIES, _ORACLES = _collect()
EMPTY_CHECKED = sorted(
    n
    for n in _QUERIES
    if _ORACLES.get(n) is not None and n not in GROUPING_SET_QUERIES
)


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


# Streaming drives with manual empty-source early returns: the empty
# path's declared schema must match the non-empty path's client_ntz
# output EXACTLY (law 47 + r8 ADVICE — q_stream_tumble was fixed in r8
# but dedup/session/slide still said instant 'timestamp', so the same
# query returned different time types depending on data).
NTZ_EMPTY_PATHS = [
    ("q_stream_dedup", "ts_s"),
    ("q_stream_session", "session_start"),
    ("q_stream_slide", "win_start"),
    ("q_stream_tumble", "win_start"),
]


@pytest.mark.parametrize("name,col", NTZ_EMPTY_PATHS)
def test_empty_path_time_columns_are_ntz(spark, registry, empty_sf, name, col):
    queries, _ = registry
    df = queries[name](spark, empty_sf)
    dtype = dict(df.dtypes)[col]
    assert dtype == "timestamp_ntz", (
        f"{name} empty path declares {col} as {dtype}; the non-empty "
        f"path returns timestamp_ntz (client_ntz, law 47)"
    )
