"""Degenerate-regime parity for JSON edges in events.props (r6 sweep
#9 — the JSON value/strictness domain no sweep had planted).

q_json_extract's old form CAST(json value AS BIGINT) diverged or
crashed on almost every non-integer value (probe 2026-08-15):

- float 1.7: Spark ANSI CAST('1.7' AS BIGINT) RAISES; DuckDB's JSON
  cast ROUNDS to 2. Boolean true: raise vs 1. 1e2: raise vs 100.
- a >64-bit integer: Spark keeps the digits (overflow raise), DuckDB
  normalizes to a double string ('1e+20'-ish).
- string-typed "12": DuckDB json_extract keeps the quotes where
  Spark's get_json_object strips them (json_extract_string matches).
- array/object values: both crash the cast (asymmetric messages).

The portable value contract: $.k counts toward sum_k iff its
extracted TEXT is the canonical decimal form of a BIGINT — enforced
by the crash-free round-trip TRY_CAST(t)::VARCHAR = t on both
engines (floats/booleans/scientific/overflow/leading-zeros all fail
it identically, whatever text each engine produced).

Parser-strictness gap: DuckDB's yyjson accepts trailing commas and
NaN/Infinity literals that Spark's Jackson rejects (json_valid says
TRUE for '{"k":1,}'). NaN/Infinity texts fail the round-trip anyway;
the trailing comma is structural, so the oracle scans for ',}'/',]'
in the doc's outside-string text only (escape pairs dropped, split
on '"', alternating segments) — a comma inside a string value cannot
false-positive, and Jackson strictness is restored exactly for the
sum-relevant case.
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

# Every probed edge: value-type zoo, malformed docs, duplicate keys,
# case-sensitive key miss, parser-leniency (trailing commas,
# NaN/Infinity literals, 1e999), and the outside-string-scan pin
# ({"s": "a,}b", "k": 9} must COUNT its k=9).
PROPS_CASES = [
    '{"k": 7}',
    '{"k": "12"}',
    '{"k": 1.7}',
    '{"k": true}',
    '{"k": null}',
    '{"k": [1]}',
    '{"k": {"x": 2}}',
    '{"K": 5}',
    '{"k":1,"k":2}',
    "{}",
    "[]",
    "1",
    "null",
    "",
    "   ",
    "not json",
    '{"k": 99999999999999999999}',
    '{"k": -3}',
    '{"k": 1e2}',
    '{"k": 007}',
    '{"k": 0}',
    '{"k":1,}',
    "[1,]",
    '{"k":NaN}',
    '{"k":Infinity}',
    '{"k":1e999}',
    '{"s": "a,}b", "k": 9}',
    '{"s": "x,]y", "k": 4}',
    # valid docs whose ARRAY/OBJECT values put a ',' right before a
    # closing bracket: an empty-separator join of the outside-string
    # segments fabricated ',]' and wrongly discarded them (review r6
    # — the chr(1) separator pin)
    '{"k": 2, "t": ["a", "b"]}',
    '{"k": 3, "t": {"x": ["y", "z"]}}',
    None,
    # ---- law 53 (r11 STRUCTURE sweep): Jackson∩yyjson intersection.
    # One representative per class, both the accept and reject side
    # of each boundary (full 79-doc battery ran divergence-free in
    # the r11 session; SCALE.md law 53).
    # 53a depth: 999-chain + outer = total 1000 = Jackson's cap →
    # counts; 1000-chain = 1001 → Jackson NULL, oracle depth guard.
    '{"k": 5, "d": ' + '{"x": ' * 999 + "1" + "}" * 999 + "}",
    '{"k": 5, "d": ' + '{"x": ' * 1000 + "1" + "}" * 1000 + "}",
    '{"k": 5, "d": ' + '[{"x": ' * 500 + "1" + "}]" * 500 + "}",  # 1001 mixed
    # 53b number-token digit cap: 1000 digits pass, 1001 nuke the DOC
    # (k itself is fine — Jackson aborts the whole parse).
    '{"k": 5, "n": ' + "9" * 1000 + "}",
    '{"k": 5, "n": ' + "9" * 1001 + "}",
    # 53c non-standard literals as OTHER fields (the r6 sweep only
    # probed them as k's own value, where the round-trip hid the gap).
    '{"k": 5, "n": NaN}',
    '{"k": 5, "n": -inf}',
    '{"k": 5, "s": "NaN and inf are words"}',  # in-string decoy: counts
    # 53d surrogates: lone rejects (value or key), paired passes.
    '{"k": 5, "s": "\\ud800"}',
    '{"\\udc00": 1, "k": 4}',
    '{"k": 5, "s": "\\ud83d\\ude00"}',
    # 53e control chars: literal tab in a string rejects; the ESCAPED
    # form and DEL 0x7f pass on both.
    '{"k": 5, "s": "a\tb"}',
    '{"k": 5, "s": "a\\tb"}',
    '{"k": 5, "s": "a\x7fb"}',
    # 53f trailing content: second doc / comma / unmatched closer.
    '{"k": 5}{"k": 6}',
    '{"k": 5},',
    '{"k": 5}]',
    # escape-collision duplicate key: k unescapes to k; first
    # occurrence wins on BOTH parsers.
    '{"k": 1, "\\u006b": 2}',
    # structural decoys INSIDE strings: braces and digit walls in
    # string values must not trip the structural guards.
    '{"k": 5, "s": "' + "{" * 1500 + '"}',
    '{"k": 4, "s": "' + "9" * 1500 + '"}',
    # 53b exponent-digit boundary: '1e' + 999 digits = 1000 total
    # digit chars passes; one more digit fails (the cap counts DIGITS
    # across the whole token, not chars).
    '{"k": 5, "n": 1e' + "1" * 999 + "}",
    '{"k": 5, "n": 1e' + "1" * 1000 + "}",
    '{"k": 5, "n": -' + "9" * 1001 + "}",
    # 53d: low-then-high escapes are BOTH lone (pair order matters);
    # a LITERAL backslash before 'ud800' is not an escape at all.
    '{"k": 5, "s": "\\udc00\\ud800"}',
    '{"k": 5, "s": "\\\\ud800"}',
    # size extremes that must stay accepted on both engines:
    '{"' + "y" * 5000 + '": 1, "k": 5}',
    "{" + ", ".join(f'"a{i}": {i}' for i in range(2000)) + ', "k": 5}',
    '{"k": 5, "s": "a\\u0000b"}',
    # trailing content, array-first variant:
    '[1,2]{"k": 5}',
    # 53d SEAM class (r11 in-round review find): lone-high, ESCAPED
    # BACKSLASH, lone-low — deleting the \\ pair with '' welded the
    # two lone escapes into a valid-looking pair and the guard missed
    # them (Spark +5 vs oracle NULL); the DEL-sentinel replacement
    # keeps them lone. Value and key variants reject; the decoy
    # (escaped backslashes followed by PLAIN TEXT 'ud800') stays
    # valid on both.
    '{"k": 5, "s": "\\ud800\\\\\\udc00"}',
    '{"\\ud800\\\\\\udc00": 1, "k": 6}',
    '{"k": 5, "s": "\\\\ud800\\\\udc00"}',
]


@pytest.fixture(scope="module")
def json_sf(tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("degen_json"))
    for t in TABLES:
        shutil.copy(os.path.join(SF_SMOKE, f"{t}.parquet"),
                    os.path.join(sf, f"{t}.parquet"))
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    vals = ", ".join(
        f"(92{i:04d}::BIGINT, TIMESTAMP '2024-02-20 0{i % 10}:15:00',"
        f" {200 + i}::BIGINT, 'json-edge', 1.0::DOUBLE, "
        + ("NULL" if c is None else "'" + c.replace("'", "''") + "'")
        + ")"
        for i, c in enumerate(PROPS_CASES)
    )
    con.sql(
        f"""COPY (SELECT * FROM '{sf}/events.parquet' UNION ALL BY NAME
        SELECT * FROM (VALUES {vals})
            v(event_id, ts, user_id, event_type, value, props))
        TO '{sf}/_e.parquet' (FORMAT PARQUET)"""
    )
    os.replace(f"{sf}/_e.parquet", f"{sf}/events.parquet")
    con.close()
    yield sf


@pytest.fixture(scope="module")
def json_duck(json_sf):
    con = make_duckdb(json_sf)
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", ["q_json_extract", "q_win_tumble", "q_evt_funnel"]
)
def test_degenerate_json_parity(spark, json_duck, registry, json_sf, name):
    queries, oracles = registry
    r = check_parity(
        spark, json_duck, name, queries[name], oracles[name], json_sf
    )
    assert r.ok, (
        f"{name} diverges on JSON-edge input: rows={r.rows_match} "
        f"schema={r.schema_match} hash={r.hash_match}\n{r.detail}"
    )


def test_integer_contract_sum(spark, registry, json_sf):
    """The json-edge group sums exactly the canonical-integer values.

    r6 cases: 7 + 12("12") - 3 + 0 + 1(dup-key first-wins) + 9(a,}b
    doc) + 4(x,]y doc) + 2 + 3(array/object docs) = 35; the
    trailing-comma doc's k=1 is NOT counted (Jackson-strict), nor
    floats/booleans/1e2/overflow/007.

    law-53 cases add exactly the ACCEPT side of each boundary:
    5(depth-1000) + 5(1000-digit number) + 5(in-string NaN decoy) +
    5(paired surrogate) + 5(escaped tab) + 5(DEL) + 1(escape-dup
    first-wins) + 5(brace decoy) + 4(digit decoy) + 5(1e+999digits)
    + 5(literal-backslash-ud800) + 5(5000-char key) + 5(2000 keys) +
    5(escaped NUL) = 65; every REJECT side (depth 1001, 1001 digits
    int/frac/exp/negative, NaN/-inf literals, lone surrogates in
    either pair order, literal tab, trailing content incl the
    array-first variant) contributes 0 on BOTH engines. Total 100."""
    import pyspark.sql.functions as F

    queries, _ = registry
    row = (
        queries["q_json_extract"](spark, json_sf)
        .where(F.col("event_type") == "json-edge")
        .collect()[0]
    )
    assert row["sum_k"] == 105
    assert row["n_events"] == len(PROPS_CASES)
