"""Degenerate-regime parity for doctored order DATES (r6 sweep #13 —
the last untried cell of the data matrix).

NULL o_orderdate plus extreme dates (0001-01-01, 0001-01-02, a 1582
Julian-cutover date, the epoch, 9999-12-31, a leap day) across every
date-deriving consumer. Full-registry parity: **167/167, ZERO
divergences** — notably, DATE-typed outputs survive year 0001 where
TIMESTAMP outputs crash Spark's Python-interop conversion
(tests/test_degenerate_timestamps.py): the date collect path does not
Julian-rebase into year 0, so the orders date family needs no domain
gate beyond sweep #4's existing date_add ceiling (q_date_funcs'
<= 9999-12-01). This module pins the date-deriving subset so the
asymmetry between the DATE and TIMESTAMP interop domains stays
working instead of rediscovered.
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
def odate_sf(tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("degen_odate"))
    for t in TABLES:
        shutil.copy(os.path.join(SF_SMOKE, f"{t}.parquet"),
                    os.path.join(sf, f"{t}.parquet"))
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    con.sql(f"""COPY (SELECT * FROM '{sf}/orders.parquet' UNION ALL BY NAME
     SELECT * FROM (VALUES
       (985001::BIGINT, 7::BIGINT, 'O', 10.0::DOUBLE, NULL::TIMESTAMP,
        '1-URGENT'),
       (985002, 7, 'O', 20.0, TIMESTAMP '0001-01-01 00:00:00', '2-HIGH'),
       (985003, 8, 'F', 30.0, TIMESTAMP '0001-01-02 12:00:00',
        '3-MEDIUM'),
       (985004, 8, 'F', 40.0, TIMESTAMP '1582-10-10 00:00:00',
        '4-NOT SPECIFIED'),
       (985005, 9, 'O', 50.0, TIMESTAMP '9999-12-31 23:59:59', '5-LOW'),
       (985006, 9, 'O', 60.0, TIMESTAMP '1970-01-01 00:00:00',
        '1-URGENT'),
       (985007, 10, 'F', 70.0, TIMESTAMP '2024-02-29 00:00:00', '2-HIGH')
     ) v(o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         o_orderdate, o_orderpriority))
     TO '{sf}/_o.parquet' (FORMAT PARQUET)""")
    os.replace(f"{sf}/_o.parquet", f"{sf}/orders.parquet")
    con.close()
    yield sf


@pytest.fixture(scope="module")
def odate_duck(odate_sf):
    con = make_duckdb(odate_sf)
    yield con
    con.close()


ODATE_CHECKED = [
    "q_date_funcs",
    "q_win_lag",
    "q_win_running",
    "q_feat_snapshot",
    "q_rollup_time",
    "q_merge_upsert",
    "q_cdc_diff",
    "q_tpch_q3",
]


@pytest.mark.parametrize("name", ODATE_CHECKED)
def test_degenerate_odate_parity(spark, odate_duck, registry, odate_sf, name):
    queries, oracles = registry
    r = check_parity(
        spark, odate_duck, name, queries[name], oracles[name], odate_sf
    )
    assert r.ok, (
        f"{name} diverges on extreme order dates: rows={r.rows_match} "
        f"schema={r.schema_match} hash={r.hash_match}\n{r.detail}"
    )
