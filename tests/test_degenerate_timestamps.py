"""Degenerate-regime parity for extreme event timestamps (r6 sweep
#12) — the event-time DOMAIN law (functions/vector.ts_valid).

The sweep planted events at 0001-01-01, 1969-12-31 23:59:59.999999,
1970-01-01 00:00:00, the pandas ns boundary (2262-04-11/12),
9999-12-31 23:59:59.999999, and exact window-boundary microseconds.
Findings, all fixed by the domain law [1970-01-02, 2200-01-01):

1. **Spark cannot even COLLECT a pre-0001-01-03 timestamp** — the
   Python-interop conversion Julian-rebases to 'year 0 is out of
   range', so one ancient row kills any query that RETURNS a
   time-derived column (q_win_* family, range joins, scd2).
2. **Structured Streaming's initial watermark IS the epoch** — a
   1969 event is born late and silently dropped by every watermarked
   aggregation, and dropDuplicatesWithinWatermark expires an event AT
   exactly 1970-01-01T00:00:00 too, while the batch twins keep both.
   Pre/at-epoch event time cannot round-trip the streaming engine.
3. **The append-flush sentinel needs calendar headroom** — with a
   year-9999 event, max(ts)+3d OVERFLOWS Python's calendar and no
   later timestamp exists to advance the watermark: the last
   window/session is unflushable BY CONSTRUCTION, not by bug.
4. **Gap-fill materializes min→max** — one outlier row inflates the
   generated grid by millions of rows (the full-registry sweep HUNG
   on it). (This fixture keeps its in-domain rows inside 2024 so the
   pinned run stays fast; the in-domain 1970-01-02/2199 boundary
   inclusions were swept once at /tmp/degen_ts, 167/167.)

The law extends "a NULL ts is un-windowable" (NULL sweep): an event
stamped outside the domain is excluded from time-deriving operators
in lockstep on both engines.
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
def ts_sf(tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("degen_ts"))
    for t in TABLES:
        shutil.copy(os.path.join(SF_SMOKE, f"{t}.parquet"),
                    os.path.join(sf, f"{t}.parquet"))
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    con.sql(f"""COPY (SELECT * FROM '{sf}/events.parquet' UNION ALL BY NAME
     SELECT * FROM (VALUES
       -- out-of-domain: below/at the epoch floor, above the ceiling
       (990001::BIGINT, TIMESTAMP '1970-01-01 00:00:00', 501::BIGINT,
        'ts-edge', 1.0::DOUBLE, NULL),
       (990002, TIMESTAMP '1969-12-31 23:59:59.999999', 501, 'ts-edge',
        2.0, NULL),
       (990003, TIMESTAMP '0001-01-01 00:00:00', 502, 'ts-edge', 3.0, NULL),
       (990004, TIMESTAMP '2262-04-11 23:47:16.854775', 503, 'ts-edge',
        4.0, NULL),
       (990005, TIMESTAMP '2262-04-12 00:00:01', 503, 'ts-edge', 5.0, NULL),
       (990006, TIMESTAMP '9999-12-31 23:59:59.999999', 504, 'ts-edge',
        6.0, NULL),
       (990010, TIMESTAMP '2200-01-01 00:00:00', 504, 'ts-edge',
        6.5, NULL),
       -- in-domain exact window-boundary microseconds
       (990007, TIMESTAMP '2024-03-05 13:00:00', 505, 'ts-edge', 7.0, NULL),
       (990008, TIMESTAMP '2024-03-05 13:59:59.999999', 505, 'ts-edge',
        8.0, NULL),
       (990009, TIMESTAMP '2024-03-05 14:00:00.000001', 505, 'ts-edge',
        9.0, NULL)
     ) v(event_id, ts, user_id, event_type, value, props))
     TO '{sf}/_e.parquet' (FORMAT PARQUET)""")
    os.replace(f"{sf}/_e.parquet", f"{sf}/events.parquet")
    con.close()
    yield sf


@pytest.fixture(scope="module")
def ts_duck(ts_sf):
    con = make_duckdb(ts_sf)
    yield con
    con.close()


TS_CHECKED = [
    # the collect-crash family
    "q_win_tumble",
    "q_win_slide",
    "q_win_session",
    "q_win_time_range",
    "q_ts_gapfill",
    "q_scd2_intervals",
    "q_join_range",
    "q_join_range_binned",
    # the watermark/sentinel family
    "q_stream_tumble",
    "q_stream_slide",
    "q_stream_session",
    "q_stream_dedup",
    "q_stream_join",
    "q_stream_join_left",
    # untouched neighbors that derive time structures
    "q_rollup_time",
    "q_evt_funnel",
    "q_evt_retention",
]


@pytest.mark.parametrize("name", TS_CHECKED)
def test_degenerate_ts_parity(spark, ts_duck, registry, ts_sf, name):
    queries, oracles = registry
    r = check_parity(
        spark, ts_duck, name, queries[name], oracles[name], ts_sf
    )
    assert r.ok, (
        f"{name} diverges on extreme timestamps: rows={r.rows_match} "
        f"schema={r.schema_match} hash={r.hash_match}\n{r.detail}"
    )


def test_domain_excludes_exactly_the_outliers(spark, registry, ts_sf):
    """q_win_tumble keeps the three in-domain boundary events (one
    window for 13:00-14:00 holding 13:00:00 and 13:59:59.999999, one
    for the 14:00:00.000001 event) and excludes every out-of-domain
    row; the epoch row 1970-01-01T00:00:00 is OUT (the streaming
    engine expires it — the dedup drive proved it)."""
    import pyspark.sql.functions as F

    queries, _ = registry
    rows = {
        r["win_start"]: r["n_events"]
        for r in queries["q_win_tumble"](spark, ts_sf)
        .where(F.col("win_start") >= "2024-03-05")
        .collect()
    }
    import datetime

    assert rows[datetime.datetime(2024, 3, 5, 13, 0)] == 2
    assert rows[datetime.datetime(2024, 3, 5, 14, 0)] == 1
    all_starts = [
        r["win_start"]
        for r in queries["q_win_tumble"](spark, ts_sf).collect()
    ]
    assert min(all_starts).year >= 2024
    assert max(all_starts).year <= 2024
