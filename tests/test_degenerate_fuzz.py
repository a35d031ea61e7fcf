"""Hypothesis-randomized degenerate doctoring (r7 verdict task 6's
second arm): the hand-composed program plants the compositions we
THOUGHT of; this module lets hypothesis draw random compositions of
the same degenerate alphabets (NULL / NaN / ±inf / empty / unicode /
boundary timestamps / duplicate keys) and runs the full oracle-parity
comparator on each draw. Every law the r6–r8 sweeps stated is a
dimension here, so a regression in any guard — or a composition no
sweep planted — fails with the exact generated rows in the report.

``derandomize=True``: the examples are a deterministic function of
the strategy definitions, so this is a stable regression GATE (no CI
flakiness), not a one-off exploration. To actually explore, run
locally with HYPOTHESIS_SEED/--hypothesis-seed and more examples; any
find gets promoted to a planted row in tools/make_composed_dir.py and
a pin in test_degenerate_composed.py (the r8 process — laws 41/42
came from exactly that promotion path).
"""

from __future__ import annotations

import os
from datetime import datetime

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from oracle import check_parity, copy_sf_tables, make_duckdb

from conftest import SF_SMOKE

pytestmark = pytest.mark.slow  # slow lane — see pytest.ini

NAN, PINF, NINF = float("nan"), float("inf"), float("-inf")

# The degenerate alphabets, one strategy per column class.
_VALUES = st.one_of(
    st.none(),
    st.just(NAN),
    st.just(PINF),
    st.just(NINF),
    st.sampled_from([0.0, -0.0, 1.5, -7.25, 1e10, 2.5e12, 9.5e15, 1e-7]),
)
_TS = st.one_of(
    st.none(),
    st.sampled_from(
        [
            datetime(2024, 1, 15, 10, 0, 0),
            datetime(2024, 1, 15, 10, 0, 1),
            datetime(2024, 1, 16, 23, 59, 59),
            datetime(1970, 1, 2, 0, 0, 0),      # domain lower edge (in)
            datetime(1970, 1, 1, 23, 59, 59),   # just below (out)
            datetime(2199, 12, 31, 23, 59, 59), # domain upper edge (in)
            datetime(2200, 1, 1, 0, 0, 0),      # at the bound (out)
        ]
    ),
)
_USER = st.one_of(st.none(), st.sampled_from([77001, 77002, 77003]))
_ETYPE = st.one_of(
    st.none(), st.sampled_from(["click", "purchase", "view", "", "vïew", "ß"])
)
_PROPS = st.one_of(
    st.none(),
    st.sampled_from(
        [
            '{"k": 7}',
            '{"k": 3,}',            # trailing comma (yjson vs Jackson)
            '{"k": "7"}',           # quoted int (text-level contract)
            '{"k": 1.7}',           # non-integer (TRY_CAST round-trip)
            '{"s": "ß,}💥"}',       # ',}' inside a multi-byte string
            '{"s": "a\\"b,}"}',     # ',}' behind an escape pair
            "not json at all",
            "",
        ]
    ),
)
_TEXT = st.one_of(
    st.none(),
    st.sampled_from(
        [
            "",
            "   ",
            "plain word stream for the fuzz probe",
            "straße FUSS ẞ case pair",
            "alpha nbsp beta",
            "🎉 emoji stream 💥",
            "dup dup dup dup dup",
        ]
    ),
)
_SOURCE = st.one_of(st.none(), st.sampled_from(["web-1", "", "srç", "degen"]))

_EVENT_ROW = st.tuples(_TS, _USER, _ETYPE, _VALUES, _PROPS)
_DOC_ROW = st.tuples(st.one_of(st.none(), st.sampled_from([66001, 66002])),
                     _TEXT, st.sampled_from(["en", "de"]), _SOURCE)

# Cheap, family-diverse consumers of each doctored table. Streaming /
# iterative drives are excluded on cost; their degenerate coverage is
# the composed program's job.
_EVENT_QUERIES = ["q_win_tumble", "q_win_lag", "q_evt_funnel", "q_json_extract"]
_DOC_QUERIES = ["q_dedup_exact", "q_text_quality", "q_sample_stratified"]

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)


def _doctored_sf(tmp_path, table, columns, rows):
    """Copy SF_SMOKE and append ``rows`` (a list of tuples, event_id /
    doc_id auto-assigned for events via the caller) to ``table``."""
    sf = copy_sf_tables(SF_SMOKE, str(tmp_path))
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    src = f"{sf}/{table}.parquet"
    tmp = f"{sf}/_{table}.parquet"
    con.execute(
        f"CREATE TEMP TABLE fuzz AS SELECT * FROM read_parquet('{src}') LIMIT 0"
    )
    placeholders = ", ".join("?" for _ in columns)
    con.executemany(
        f"INSERT INTO fuzz ({', '.join(columns)}) VALUES ({placeholders})",
        rows,
    )
    con.sql(
        f"COPY (SELECT * FROM read_parquet('{src}')"
        f" UNION ALL BY NAME SELECT * FROM fuzz)"
        f" TO '{tmp}' (FORMAT PARQUET)"
    )
    con.close()
    os.replace(tmp, src)
    return sf


@given(rows=st.lists(_EVENT_ROW, min_size=1, max_size=8))
@_SETTINGS
def test_fuzz_events_parity(spark, registry, tmp_path_factory, rows):
    queries, oracles = registry
    full = [
        (66100 + i, ts, user, etype, value, props)
        for i, (ts, user, etype, value, props) in enumerate(rows)
    ]
    sf = _doctored_sf(
        tmp_path_factory.mktemp("fuzz_ev"),
        "events",
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
        full,
    )
    con = make_duckdb(sf)
    try:
        for name in _EVENT_QUERIES:
            r = check_parity(spark, con, name, queries[name], oracles[name], sf)
            assert r.ok, (
                f"{name} diverges on fuzzed events {full}: "
                f"rows={r.rows_match} schema={r.schema_match} "
                f"hash={r.hash_match}\n{r.detail}"
            )
    finally:
        con.close()


# part/supplier axis (r8 continuation): the last two undoctored
# tables. Strings stay ASCII for part — q_str_funcs documents the
# native-upper/lower ASCII assumption and law 43 (below) pins
# levenshtein's unit divergence off ASCII — but are otherwise hostile
# (empty, padding, quotes/commas/newlines, regex metachars, repeated
# words, a 200-char run). Supplier names DO carry unicode and
# CSV-hostile shapes: q_source_csv is a text round-trip and quoting/
# multiline is exactly its documented edge.
_ASCII_NAME = st.one_of(
    st.none(),
    st.sampled_from(
        [
            "",
            "   ",
            "standard polished brass",
            "standard polished brassy",
            'a,b"c',
            "line1\nline2",
            "[0-9]+ (meta) |chars*",
            "widget widget widget",
            "x" * 200,
            "Brand#13",
            "0042",
        ]
    ),
)
_P_SIZE = st.one_of(
    st.none(), st.sampled_from([0, -1, 7, 2147483647, -2147483648])
)
_PART_ROW = st.tuples(
    st.one_of(st.none(), st.sampled_from([55001, 55002])),
    _ASCII_NAME,
    _ASCII_NAME,
    _ASCII_NAME,
    _P_SIZE,
    _VALUES,
)
_PART_QUERIES = [
    "q_str_funcs",
    "q_str_regexp",
    "q_str_levenshtein",
    "q_unpivot",
    "q_source_orc",
]

_SUPP_NAME = st.one_of(
    st.none(),
    st.sampled_from(
        [
            "",
            "a,b",
            'quote"q',
            "line\nbreak",
            "crlf\r\nrow",
            "trail  ",
            "straße ẞ",
            "🎉",
            ",,,",
            '"quoted"',
            "tab\tsep",
        ]
    ),
)
_SUPP_ROW = st.tuples(
    st.one_of(st.none(), st.sampled_from([77501, 77502])),
    _SUPP_NAME,
    st.one_of(st.none(), st.sampled_from([0, 15, 999])),  # 999 dangles
    _VALUES,
)
_SUPP_QUERIES = ["q_source_csv", "q_set_intersect", "q_set_except", "q_tpch_q5"]


@given(rows=st.lists(_PART_ROW, min_size=1, max_size=6))
@_SETTINGS
def test_fuzz_part_parity(spark, registry, tmp_path_factory, rows):
    queries, oracles = registry
    sf = _doctored_sf(
        tmp_path_factory.mktemp("fuzz_part"),
        "part",
        ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
        rows,
    )
    con = make_duckdb(sf)
    try:
        for name in _PART_QUERIES:
            r = check_parity(spark, con, name, queries[name], oracles[name], sf)
            assert r.ok, (
                f"{name} diverges on fuzzed part {rows}: "
                f"rows={r.rows_match} schema={r.schema_match} "
                f"hash={r.hash_match}\n{r.detail}"
            )
    finally:
        con.close()


@given(rows=st.lists(_SUPP_ROW, min_size=1, max_size=6))
@_SETTINGS
def test_fuzz_supplier_parity(spark, registry, tmp_path_factory, rows):
    queries, oracles = registry
    sf = _doctored_sf(
        tmp_path_factory.mktemp("fuzz_supp"),
        "supplier",
        ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
        rows,
    )
    con = make_duckdb(sf)
    try:
        for name in _SUPP_QUERIES:
            r = check_parity(spark, con, name, queries[name], oracles[name], sf)
            assert r.ok, (
                f"{name} diverges on fuzzed supplier {rows}: "
                f"rows={r.rows_match} schema={r.schema_match} "
                f"hash={r.hash_match}\n{r.detail}"
            )
    finally:
        con.close()


def test_levenshtein_unit_law(spark):
    """Law 43 pinned directly: levenshtein's UNIT is engine-defined —
    Spark counts Unicode characters, DuckDB counts UTF-8 bytes. The
    two agree exactly on ASCII (every codepoint one byte), which is
    the domain q_str_levenshtein states; off ASCII the DIVERGENCE
    itself is the pinned fact (if either engine changes unit, this
    fails and the contract must be restated)."""
    cases = [("ß", "s"), ("straße", "strasse"), ("🎉a", "a"), ("ẞ", "ß")]
    spark_d = [
        r[0]
        for r in spark.createDataFrame(cases, "a string, b string")
        .selectExpr("levenshtein(a, b)")
        .collect()
    ]
    con = duckdb.connect()
    duck_d = [
        con.execute("SELECT levenshtein(?, ?)", list(c)).fetchone()[0]
        for c in cases
    ]
    con.close()
    assert spark_d == [1, 2, 1, 1]  # characters
    assert duck_d == [2, 2, 4, 3]  # UTF-8 bytes
    # and the ASCII subdomain agrees exactly
    ascii_cases = [("abc", "abd"), ("", "xy"), ("a b,c", "a b.c")]
    s2 = [
        r[0]
        for r in spark.createDataFrame(ascii_cases, "a string, b string")
        .selectExpr("levenshtein(a, b)")
        .collect()
    ]
    con = duckdb.connect()
    d2 = [
        con.execute("SELECT levenshtein(?, ?)", list(c)).fetchone()[0]
        for c in ascii_cases
    ]
    con.close()
    assert s2 == d2


def test_bigint_sum_accumulator_law(spark, registry, tmp_path_factory):
    """Law 48 pinned directly: Spark's native long SUM accumulates in
    64 bits (ANSI overflow MID-AGGREGATION), DuckDB's in a 128-bit
    HUGEINT (failing only at the final BIGINT cast) — so an extreme
    addend whose group total still FITS crashed Spark against a clean
    oracle (seed-314159 exploration, trial 11). The engine aligns by
    summing raw integer columns through DECIMAL(38,0)
    (functions.vector.isum64):

    - in-range totals with an extreme addend AGREE exactly (the
      pre-fix divergence class);
    - out-of-range totals fail LOUDLY ON BOTH ENGINES (the law-46
      mutual-rejection pattern).

    doc_ids 9000000/9000017 share md5-shard 14, so both planted rows
    aggregate into ONE group of q_shard_assign."""
    I64MAX = 2**63 - 1
    queries, oracles = registry

    def fixture(tag, n1, n2):
        sf = copy_sf_tables(SF_SMOKE, str(tmp_path_factory.mktemp(tag)))
        con = duckdb.connect()
        con.sql("SET TimeZone='UTC'")
        src = f"{sf}/documents.parquet"
        con.execute(
            "CREATE TEMP TABLE fz AS SELECT * FROM read_parquet(?) LIMIT 0",
            [src],
        )
        con.executemany(
            "INSERT INTO fz (doc_id, text, lang, source, n_chars)"
            " VALUES (?,?,?,?,?)",
            [(9000000, "x", "en", "web", n1), (9000017, "y", "en", "web", n2)],
        )
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{src}') UNION ALL BY NAME"
            f" SELECT * FROM fz) TO '{sf}/_d.parquet' (FORMAT PARQUET)"
        )
        con.close()
        os.replace(f"{sf}/_d.parquet", src)
        return sf

    # In-range total despite an extreme addend: exact agreement.
    sf = fixture("law48a", I64MAX, -10_000_000)
    con = make_duckdb(sf)
    for q in ("q_shard_assign", "q_text_stats"):
        r = check_parity(spark, con, q, queries[q], oracles[q], sf)
        assert r.ok, f"{q}: {r.detail}"
    con.close()

    # Out-of-range shard total: mutual loud failure.
    sf = fixture("law48b", I64MAX, I64MAX)
    with pytest.raises(Exception):
        queries["q_shard_assign"](spark, sf).collect()
    con = make_duckdb(sf)
    with pytest.raises(Exception):
        con.execute(oracles["q_shard_assign"]).fetchall()
    con.close()


@given(rows=st.lists(_DOC_ROW, min_size=1, max_size=6))
@_SETTINGS
def test_fuzz_documents_parity(spark, registry, tmp_path_factory, rows):
    queries, oracles = registry
    full = [
        (doc_id, text, lang, source,
         None if text is None else len(text))
        for (doc_id, text, lang, source) in rows
    ]
    sf = _doctored_sf(
        tmp_path_factory.mktemp("fuzz_doc"),
        "documents",
        ["doc_id", "text", "lang", "source", "n_chars"],
        full,
    )
    con = make_duckdb(sf)
    try:
        for name in _DOC_QUERIES:
            r = check_parity(spark, con, name, queries[name], oracles[name], sf)
            assert r.ok, (
                f"{name} diverges on fuzzed documents {full}: "
                f"rows={r.rows_match} schema={r.schema_match} "
                f"hash={r.hash_match}\n{r.detail}"
            )
    finally:
        con.close()


def test_lag_lead_tiebreak_null_id_law(spark, registry, tmp_path_factory):
    """Law 40 on the sequence tie-break key, pinned (r9 fuzz arm, seed
    141421 trial 15): with NULL event_id in-domain (law 49), a NULL-id
    row TYING a real id on ts forked the per-user sequence order —
    Spark bare-ASC sorts NULLS FIRST, DuckDB NULLS LAST — shifting
    every lag/lead transition behind the tie. q_evt_markov and
    q_scd2_intervals now pin event_id NULLS LAST on both engines.
    The fixture plants the exact arm composition: two same-user rows
    at the same microsecond, one with NULL id, plus a NULL-id row one
    microsecond earlier."""
    from datetime import datetime

    queries, oracles = registry
    u = -(2**63)
    rows = [
        (66311, datetime(2024, 1, 15, 10, 0, 0, 1), u, "", 1.0, None),
        (None, datetime(2024, 1, 15, 10, 0, 0, 1), u, "purchase", 2.0, None),
        (None, datetime(2024, 1, 15, 9, 59, 59, 999999), u, "view", 3.0, None),
    ]
    sf = _doctored_sf(
        tmp_path_factory.mktemp("fuzz_tie"),
        "events",
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
        rows,
    )
    con = make_duckdb(sf)
    try:
        for name in ("q_evt_markov", "q_scd2_intervals"):
            r = check_parity(spark, con, name, queries[name], oracles[name], sf)
            assert r.ok, (
                f"{name} diverges on the NULL-id tie fixture: "
                f"rows={r.rows_match} schema={r.schema_match} "
                f"hash={r.hash_match}\n{r.detail}"
            )
    finally:
        con.close()
