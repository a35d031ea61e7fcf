"""Directed battery at the ROW-GRANULAR streaming seams (r11 verdict
task 4): event-time ties exactly at the dedup state-eviction boundary,
across micro-batch splits, plus watermark-equal event times under the
drives' own duplicate re-delivery.

Law 54 (r11) pinned the WINDOWED side: admission is window-granular,
emission fires at end<=wm — boundary ties cannot fork a windowed agg.
But dropDuplicatesWithinWatermark, the left-join eviction flush, the
CEP fold, and the upsert merge are ROW-granular: each row's admission
and each state entry's eviction is decided against the watermark
individually, so a tie AT the boundary (event ts == wm exactly, or a
bit-exact duplicate pair straddling an ntile batch boundary — the pair
has IDENTICAL (ts, event_id), so the contiguous-time split can
separate the copies) is exactly where an engine-version inequality
flip (< vs <=) or a state-lifetime off-by-one would fork the output.
This is the meeting point of law 49's identity domain (planted ids are
unique-or-NULL; the drives inject their OWN bit-exact duplicates for
id % 7 == 0) and law 54's admission granularity — no directed battery
had hit it before this one.

Five engineered events tables x batch splits {1,2,5,7} x five
row-granular streaming consumers, each run through the full
driver-shaped rows/schema/hash comparator vs the config-independent
DuckDB oracle:

  P1 horizon_chain    — clusters exactly 2h apart: every watermark
                        advance lands ON a prior cluster's ts + delay.
  P2 ntile_tie_wall   — one big run of IDENTICAL ts (plus dup-class
                        ids): every split boundary falls inside a tie
                        run, straddling drive-injected duplicate pairs.
  P3 eviction_tie     — rows at T0, T0+2h, T0+4h with dup-class ids:
                        wm after each batch EQUALS the previous
                        cluster's ts and then its eviction horizon.
  P4 micro_straddle   — dup-class rows at T0+2h-1us / +2h / +2h+1us:
                        one microsecond on either side of the boundary.
  P5 null_mix         — NULL ts + NULL id (surrogate-key lane) mixed
                        into exact-tie clusters (laws 45/49/54 meet).

Usage: python tools/boundary_battery.py [base_sf_dir]
Exit 1 on any divergence, printing the program, split, and comparator
detail. 5 x 4 x 5 = 100 parity runs.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from oracle import check_parity, copy_sf_tables, make_duckdb  # noqa: E402

from flink_streaming_kmeans_spark.plans.registry import collect  # noqa: E402
from flink_streaming_kmeans_spark.session import get_spark  # noqa: E402

CONSUMERS = [
    "q_stream_dedup",       # dropDuplicatesWithinWatermark state
    "q_stream_join_left",   # unmatched-row emission ON state eviction
    "q_stream_cep",         # keyed NFA fold, sequence-order sensitive
    "q_stream_session",     # session merge across batch boundaries
    "q_stream_upsert",      # foreachBatch CDC merge, last-writer row
]
SPLITS = [1, 2, 5, 7]

T0 = "2024-01-10 08:00:00"


def _rows_sql(rows) -> str:
    """VALUES list for (event_id, ts, user_id, event_type, value, props)."""
    out = []
    for eid, ts, uid, etype, value, props in rows:
        out.append(
            "(%s, %s, %s, %s, %s, %s)"
            % (
                "NULL" if eid is None else str(eid),
                "NULL::TIMESTAMP" if ts is None else f"TIMESTAMP '{ts}'",
                "NULL" if uid is None else str(uid),
                "NULL" if etype is None else f"'{etype}'",
                "NULL" if value is None else repr(float(value)),
                "NULL" if props is None else "'" + props.replace("'", "''") + "'",
            )
        )
    return ", ".join(out)


def _mk(dir_: str, rows) -> None:
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    con.sql(
        "COPY (SELECT * FROM (VALUES %s) "
        "v(event_id, ts, user_id, event_type, value, props)) TO '%s' "
        "(FORMAT PARQUET)" % (_rows_sql(rows), os.path.join(dir_, "events.parquet"))
    )
    con.close()


def _ts(base_h: int, m: int = 0, s: int = 0, us: int = 0) -> str:
    """Timestamp on 2024-01-10 at hour base_h (may exceed 23 → roll)."""
    day = 10 + base_h // 24
    return f"2024-01-{day:02d} {base_h % 24:02d}:{m:02d}:{s:02d}.{us:06d}"


# Each program is a list of rows. ids: dup-class ids are multiples of
# 7 (the drives inject a bit-exact duplicate for those); all ids
# UNIQUE-or-NULL (law 49: a repeated non-NULL id with distinct payload
# is declared out-of-domain). Event types cycle purchase/click/view so
# the join/CEP/session consumers have real state transitions; users
# 0-3 keep per-key sequences multi-row.
def programs() -> dict[str, list]:
    et = ["purchase", "click", "view"]

    def chain():
        rows = []
        eid = 700  # 700 = 7*100 → dup-class; step keeps class control
        for k in range(7):  # clusters at T0 + k*2h — wm lands ON them
            for j in range(3):
                is_dup = j == 0
                rows.append(
                    (
                        eid if is_dup else eid + 1 + j,
                        _ts(8 + 2 * k, 0, 0, 0),
                        k % 4,
                        et[(k + j) % 3],
                        1.5 * k + j,
                        '{"k": %d}' % (k + j),
                    )
                )
            eid += 7
        return rows

    def tie_wall():
        rows = []
        for i in range(24):  # identical ts wall; half dup-class
            eid = 7 * (200 + i) if i % 2 == 0 else 7 * 300 + 11 * i + 1
            rows.append(
                (eid, _ts(8), i % 4, et[i % 3], float(i), '{"k": %d}' % i)
            )
        # one late row 3h out advances wm past the wall
        rows.append((9001, _ts(11), 0, "purchase", 99.0, '{"k": 99}'))
        return rows

    def eviction_tie():
        rows = []
        for k, h in enumerate((8, 10, 12)):  # exactly 2h apart
            for j in range(4):
                eid = 7 * (400 + 10 * k) if j == 0 else 7 * 500 + 13 * (4 * k + j)
                rows.append(
                    (
                        eid,
                        _ts(h),
                        j % 3,
                        et[(k + j) % 3],
                        2.0 * k + j,
                        '{"k": %d}' % (k * 4 + j),
                    )
                )
        return rows

    def micro_straddle():
        rows = [(7 * 600, _ts(8), 0, "purchase", 1.0, '{"k": 1}')]
        for i, (h, m, s, us) in enumerate(
            ((9, 59, 59, 999999), (10, 0, 0, 0), (10, 0, 0, 1))
        ):
            rows.append(
                (
                    7 * (610 + i),
                    f"2024-01-10 {h:02d}:{m:02d}:{s:02d}.{us:06d}",
                    i % 3,
                    et[i % 3],
                    float(i),
                    '{"k": %d}' % i,
                )
            )
        # anchor far out so every split sees a wm advance past 10:00
        rows.append((9002, _ts(14), 1, "click", 7.0, '{"k": 7}'))
        return rows

    def null_mix():
        rows = [
            (None, _ts(8), 0, "purchase", 1.0, '{"k": 1}'),
            (None, _ts(8), 0, "purchase", 1.0, '{"k": 1}'),  # NULL-id twins
            (7 * 700, _ts(8), 1, "click", 2.0, '{"k": 2}'),
            (7 * 701, None, 1, "view", 3.0, '{"k": 3}'),  # NULL ts
            (None, None, None, None, None, None),  # all-NULL row
            (7 * 702, _ts(10), 2, "purchase", 4.0, '{"k": 4}'),
            (9003, _ts(10), 2, "click", 5.0, '{"k": 5}'),
            (7 * 703, _ts(12), 0, "view", 6.0, '{"k": 6}'),
        ]
        return rows

    return {
        "horizon_chain": chain(),
        "ntile_tie_wall": tie_wall(),
        "eviction_tie": eviction_tie(),
        "micro_straddle": micro_straddle(),
        "null_mix": null_mix(),
    }


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    queries, oracles = collect()
    spark = get_spark("boundary_battery")

    runs = fails = 0
    prev = os.environ.get("SPARK_GRAFT_STREAM_BATCHES")
    try:
        for pname, rows in programs().items():
            work = tempfile.mkdtemp(prefix=f"fsk_bb_{pname}_")
            sf = copy_sf_tables(base, work)
            os.remove(os.path.join(sf, "events.parquet"))
            _mk(sf, rows)
            con = make_duckdb(sf)
            try:
                for split in SPLITS:
                    os.environ["SPARK_GRAFT_STREAM_BATCHES"] = str(split)
                    for name in CONSUMERS:
                        runs += 1
                        r = check_parity(
                            spark, con, name, queries[name], oracles[name], sf
                        )
                        if not r.ok:
                            fails += 1
                            print(
                                f"FAIL {pname} split={split} {name}: "
                                f"rows={r.rows_match} schema={r.schema_match} "
                                f"hash={r.hash_match}\n  detail: {r.detail}",
                                flush=True,
                            )
                    print(f"{pname} split={split}: {len(CONSUMERS)} ok", flush=True)
            finally:
                con.close()
                shutil.rmtree(work, ignore_errors=True)
    finally:
        if prev is None:
            os.environ.pop("SPARK_GRAFT_STREAM_BATCHES", None)
        else:
            os.environ["SPARK_GRAFT_STREAM_BATCHES"] = prev

    print(f"boundary battery: {runs} parity runs, {fails} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
