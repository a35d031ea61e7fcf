"""Degenerate-regime parity for doctored embeddings (r6 sweep #11):
duplicate vec_ids (same and different vectors), zero/constant/tiny
vectors, HUGE-magnitude finite elements (1e30), and wrong-length
vectors (2-dim, 80-dim, empty).

Finds, all fixed by completing the vector-op participation contract
(functions/vector.emb_finite / sql_emb_finite):

1. **Finite is not enough** — a finite 1e30 element overflows the
   floor(x*1e6+0.5) BIGINT quantization grid (Spark ANSI raise) and
   the DECIMAL(30,6) product capacity (both engines), in different
   queries on different engines. The contract now bounds |x| <= 1e6
   (EMB_BOUND), the domain in which the integer grid and decimal
   products the determinism layer relies on are representable.
2. **Length is part of the contract** — DuckDB's list_inner_product
   ERRORS on a dimension mismatch where Spark's zip_with silently
   NULL-pads; numpy vstack rejects ragged batches. emb_finite now
   requires exactly EMB_DIM (64) elements; the per-query size-64
   guards became redundant instances of the central rule.
3. **Duplicate vec_id ordering** — q_emb_quantize's oracle ordered
   the per-vector bucket string by dim alone; two different vectors
   under one vec_id made the within-dim order engine-defined. The
   numeric bucket tiebreak matches Spark's array_sort(struct(dim,qb)).
4. q_sim_knn and q_dedup_embed gained the gate (they crashed
   oracle-side on the 2-dim vector); q_array_funcs — an ARRAY
   showcase, not a vector op — instead states the degenerate-shape
   agreements: try_element_at (empty array → NULL, matching DuckDB's
   [1]) and l2 of an empty array = 0.0 (Spark's fold seed; DuckDB's
   list_aggregate of [] is NULL, CASE-stated).
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest
from oracle import check_parity, make_duckdb

from conftest import SF_SMOKE

pytestmark = pytest.mark.slow  # slow lane — see pytest.ini


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


@pytest.fixture(scope="module")
def emb_sf(tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("degen_emb"))
    for t in TABLES:
        shutil.copy(os.path.join(SF_SMOKE, f"{t}.parquet"),
                    os.path.join(sf, f"{t}.parquet"))
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    con.sql(f"""COPY (SELECT * FROM '{sf}/embeddings.parquet' UNION ALL BY NAME
     SELECT * FROM (VALUES
       (3::BIGINT, list_transform(range(64), x -> 0.5::FLOAT), 7::INT),
       (980001, list_transform(range(64), x -> 0.25::FLOAT), 1),
       (980001, list_transform(range(64), x -> 0.25::FLOAT), 1),
       (980002, list_transform(range(64), x -> 0.0::FLOAT), 2),
       (980003, list_transform(range(64), x -> 1.0::FLOAT), 3),
       (980004, list_transform(range(64), x -> 1e-30::FLOAT), 4),
       (980005, list_transform(range(64), x -> 1e30::FLOAT), 5),
       (980006, [0.1::FLOAT, 0.2], 6),
       (980007, list_transform(range(80), x -> 0.1::FLOAT), 7),
       (980008, []::FLOAT[], 8),
       (980009, list_transform(range(64), x -> 0.3::FLOAT), NULL),
       (980010, list_transform(range(64), x -> 0.4::FLOAT), -2),
       -- NULL ELEMENT: Spark's fold NULL-propagates where DuckDB's
       -- list_aggregate SUM skips NULLs (review r6 — q_array_funcs'
       -- l2 now states the NULL-element branch)
       (980011, [3.0::FLOAT, NULL, 4.0]
            || list_transform(range(61), x -> 0.0::FLOAT), 9)
     ) v(vec_id, embedding, label))
     TO '{sf}/_e.parquet' (FORMAT PARQUET)""")
    os.replace(f"{sf}/_e.parquet", f"{sf}/embeddings.parquet")
    con.close()
    yield sf


@pytest.fixture(scope="module")
def emb_duck(emb_sf):
    con = make_duckdb(emb_sf)
    yield con
    con.close()


EMB_CHECKED = [
    "q_array_funcs",
    "q_dedup_embed",
    "q_emb_gram",
    "q_emb_normalize",
    "q_emb_quantize",
    "q_ml_kmeans_assign",
    "q_ml_kmeans_iter2",
    "q_ml_kmeans_update",
    "q_ml_score",
    "q_sim_ann",
    "q_sim_ann_multi",
    "q_sim_knn",
]


@pytest.mark.parametrize("name", EMB_CHECKED)
def test_degenerate_emb_parity(spark, emb_duck, registry, emb_sf, name):
    queries, oracles = registry
    r = check_parity(
        spark, emb_duck, name, queries[name], oracles[name], emb_sf
    )
    assert r.ok, (
        f"{name} diverges on doctored embeddings: rows={r.rows_match} "
        f"schema={r.schema_match} hash={r.hash_match}\n{r.detail}"
    )


def test_participation_gate_excludes_exactly_the_invalid(
    spark, registry, emb_sf
):
    """q_ml_kmeans_assign keeps every valid vector (500 clean + zero +
    constant + tiny + dup rows + NULL/neg labels) and drops exactly
    the out-of-domain ones (1e30 magnitude, 2-dim, 80-dim, empty)."""
    queries, _ = registry
    ids = [
        r["vec_id"]
        for r in queries["q_ml_kmeans_assign"](spark, emb_sf).collect()
    ]
    for bad in (980005, 980006, 980007, 980008, 980011):
        assert bad not in ids
    for good in (980002, 980003, 980004, 980009, 980010):
        assert good in ids


def test_array_showcase_handles_empty(spark, registry, emb_sf):
    """q_array_funcs reports the empty vector (dim 0, NULL first, l2
    0.0) instead of excluding or crashing on it."""
    import pyspark.sql.functions as F

    queries, _ = registry
    row = (
        queries["q_array_funcs"](spark, emb_sf)
        .where(F.col("vec_id") == 980008)
        .collect()[0]
    )
    assert row["dim"] == 0
    assert row["first_val"] is None
    assert row["l2"] == 0.0
