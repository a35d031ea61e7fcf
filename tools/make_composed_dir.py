"""Build a composed-degenerate doctored SF dir (r7 verdict task 4).

Copies a real testdata SF dir and plants rows that COMPOSE the r6
single-regime divergence classes — NULL x NaN in one measure, NULL
keys x extreme timestamps, unicode x duplicate doc/vec ids, and
extreme magnitudes (the 1e10..2.5e12 cast/guard boundaries, 9.5e15
ceil/floor bound, 1e30 finite overflow) INSIDE those compositions.
The r6 sweeps all ran at sf0.001-class size and the cast-divergence
class was value-dependent, so the r7 program re-runs the composed
regimes at sf0.1 with the adversarial values scaled too:

    python tools/make_composed_dir.py /root/testdata/sf0.1 /tmp/composed_sf01
    python tools/preflight.py /tmp/composed_sf01

Round 8 goes one axis deeper (r7 verdict task 6): ±Infinity measures
composed with NULL-user/NULL-ts/out-of-domain-ts rows whose ids the
dedup drive REDELIVERS (≡0 mod 7), an only-{+inf,-inf} user, NULL /
unicode / empty-string SOURCE strata crossed with duplicate doc ids,
duplicate vec_ids whose copies both pass the participation gate but
differ, orphan lineitem facts with NaN measures, and orders fanning
out through the duplicate customer key.

tests/test_degenerate_composed.py pins the same divergence CLASSES
permanently at pytest scale with per-regime fixtures; this tool is NOT
a row-for-row copy of those fixtures — it deliberately composes
harder (triple compositions like NaN value x NULL user x extreme ts
on one row, a NULL-text duplicate-id document, out-of-bound dup
vec_ids) and exists so the full-registry sf0.1 sweep is one command,
reproducible for the judge. A class fixed here must gain a pytest pin
there; the two files cover the classes jointly, not identically.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

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


def build(src: str, dest: str) -> None:
    os.makedirs(dest, exist_ok=True)
    for t in TABLES:
        shutil.copy(
            os.path.join(src, f"{t}.parquet"), os.path.join(dest, f"{t}.parquet")
        )
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")

    def rewrite(name, values_sql):
        s, tmp = f"{dest}/{name}.parquet", f"{dest}/_{name}.parquet"
        con.sql(
            f"COPY (SELECT * FROM '{s}' UNION ALL BY NAME {values_sql})"
            f" TO '{tmp}' (FORMAT PARQUET)"
        )
        os.replace(tmp, s)

    # NULL x NaN x extreme magnitude in the same segments.
    rewrite("customer", """
        SELECT * FROM (VALUES
          (920001::BIGINT, 'null-bal', 1::INT, NULL::DOUBLE, 'BUILDING'),
          (920002, 'nan-bal', 1, 'NaN'::DOUBLE, 'BUILDING'),
          (920003, 'huge-bal', 1, 2.5e12::DOUBLE, 'BUILDING'),
          (920004, 'comp-null', 2, NULL, 'COMPNN'),
          (920005, 'comp-nan', 2, 'NaN'::DOUBLE, 'COMPNN'),
          (920006, 'all-null-1', 3, NULL, 'COMPALLN'),
          (920007, 'all-null-2', 3, NULL, 'COMPALLN'),
          -- lakehouse merge family x {dup custkey, NULL segment,
          -- NaN/inf balances} (composed regime 5)
          (930101, 'dup-null-seg', 1, 'NaN'::DOUBLE, NULL::VARCHAR),
          (930101, 'dup-touched-seg', 1, 55.5::DOUBLE, 'BUILDING'),
          (NULL, 'null-key-nan', 2, 'NaN'::DOUBLE, 'BUILDING'),
          (930102, 'all-null-row', 3, NULL, NULL),
          (930103, 'inf-touched', 4, 'Infinity'::DOUBLE, 'AUTOMOBILE'),
          (930104, 'neginf-null-seg', 5, '-Infinity'::DOUBLE, NULL)
        ) v(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)""")
    # NULL-custkey window partition x extreme/NULL dates x extreme
    # prices; plus a valid customer's NULL/NaN-interleaved chain.
    rewrite("orders", """
        SELECT * FROM (VALUES
          (975001::BIGINT, 920001::BIGINT, 'O', 10.0::DOUBLE,
           TIMESTAMP '1996-01-01', '1-URGENT'),
          (975002, 920001, 'O', NULL::DOUBLE, TIMESTAMP '1996-01-02', '2-HIGH'),
          (975003, 920001, 'O', 20.0, TIMESTAMP '1996-01-03', '3-MEDIUM'),
          (975004, 920001, 'O', 'NaN'::DOUBLE, TIMESTAMP '1996-01-04',
           '4-NOT SPECIFIED'),
          (975005, 920001, 'O', 2.5e12::DOUBLE, TIMESTAMP '1996-01-05', '5-LOW'),
          (986001, NULL, 'O', 999999999999.1234::DOUBLE,
           TIMESTAMP '0001-01-01 00:00:00', '1-URGENT'),
          (986002, NULL, 'O', 2.5e12, TIMESTAMP '9999-12-31 23:59:59', '2-HIGH'),
          (986003, NULL, 'O', 'NaN'::DOUBLE, NULL::TIMESTAMP, '3-MEDIUM'),
          (986004, NULL, 'O', NULL, TIMESTAMP '1996-05-01', '4-NOT SPECIFIED'),
          -- r8 axis: orders referencing the DUPLICATE customer key
          -- 930101 (two dim rows) — the customer⋈orders join FANS OUT
          -- 2x, and any window/top-k over the fanned rows must not
          -- lean on engine-private tie order (law 34 at join level)
          (987001, 930101, 'O', 77.0::DOUBLE, TIMESTAMP '1996-03-01',
           '1-URGENT'),
          (987002, 930101, 'O', 'NaN'::DOUBLE, TIMESTAMP '1996-03-02',
           '2-HIGH'),
          -- law 40's r8 fuzz find: a NULL o_orderkey TYING another
          -- order on (custkey, date) — the window tie-break key is
          -- NULL, so every bare-ASC ordering forks NULLS FIRST (Spark)
          -- vs NULLS LAST (DuckDB); all window/limit tie-breaks are
          -- now pinned nulls-last in lockstep
          (NULL::BIGINT, 920001, 'O', 33.25::DOUBLE,
           TIMESTAMP '1996-01-03', '3-MEDIUM')
        ) v(o_orderkey, o_custkey, o_orderstatus, o_totalprice,
            o_orderdate, o_orderpriority)""")
    # One group mixing NULL qty, NaN price, the 9.5e15 ceil/floor
    # bound, and a 1e12 decimal-guard boundary value.
    rewrite("lineitem", """
        SELECT * FROM (VALUES
          (715001::BIGINT, 1::BIGINT, 1::BIGINT, 1::INT, NULL::DOUBLE,
           50.0::DOUBLE, 0.05::DOUBLE, 0.02::DOUBLE, 'N', 'O',
           TIMESTAMP '1997-06-01'),
          (715002, 2, 2, 1, 5.0, 'NaN'::DOUBLE, 0.0, 0.0, 'N', 'O',
           TIMESTAMP '1997-06-02'),
          (715003, 3, 3, 1, NULL, 'NaN'::DOUBLE, NULL, 0.0, 'N', 'O',
           TIMESTAMP '1997-06-03'),
          (715004, 4, 4, 1, 9.5e15::DOUBLE, 1.0e12::DOUBLE, 0.0, 0.0,
           'N', 'O', TIMESTAMP '1997-06-04'),
          -- r8 axis: ORPHAN facts (l_orderkey matching no order) whose
          -- measures are themselves degenerate — inner joins must drop
          -- them, outer/anti shapes must keep them, and the NaN must
          -- not leak through either path
          (717001, 5, 5, 1, 'NaN'::DOUBLE, 60.0::DOUBLE, 0.0, 0.0,
           'R', 'F', TIMESTAMP '1997-07-01'),
          (717001, 6, 6, 2, NULL::DOUBLE, 'NaN'::DOUBLE, NULL, 0.0,
           'R', 'F', TIMESTAMP '1997-07-02')
        ) v(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
            l_extendedprice, l_discount, l_tax, l_returnflag,
            l_linestatus, l_shipdate)""")
    # NULL user x {in-domain, pre-epoch, post-ceiling, NULL} ts, with
    # NaN/NULL values riding the same rows (triple composition). The
    # in-domain rows stay inside the source data's natural January
    # span so q_ts_gapfill's grid stays bounded.
    rewrite("events", """
        SELECT * FROM (VALUES
          (995001::BIGINT, TIMESTAMP '2024-01-15 10:00:00', NULL::BIGINT,
           'view', 1.0::DOUBLE, NULL),
          (995002, TIMESTAMP '2024-01-15 10:05:00', NULL, 'purchase',
           'NaN'::DOUBLE, NULL),
          (995003, TIMESTAMP '1969-12-31 23:59:59', NULL, 'click', 3.0, NULL),
          (995004, TIMESTAMP '9999-12-31 23:59:59', NULL, 'click',
           'NaN'::DOUBLE, NULL),
          (995005, NULL::TIMESTAMP, NULL, 'purchase', NULL::DOUBLE, NULL),
          (995006, TIMESTAMP '2024-01-15 10:10:00', 987601::BIGINT,
           'view', 6.0, NULL),
          (995007, TIMESTAMP '0001-01-01 00:00:00', 987601, 'click',
           7.0, NULL),
          (995008, TIMESTAMP '2200-01-01 00:00:00', 987601, 'click',
           'NaN'::DOUBLE, NULL),
          (995009, TIMESTAMP '2024-01-15 10:20:00', 987601, 'purchase',
           9.0, NULL),
          (995010, NULL::TIMESTAMP, 987601, 'view', 10.0, NULL),
          -- JSON x NULL group keys x unicode structural stressors
          -- (composed regime 4): canonical int / trailing comma /
          -- NULL props in a NULL event_type group; a fully
          -- NULL-keyed JSON row; ',}' inside multi-byte strings and
          -- behind escape pairs
          (955001, TIMESTAMP '2024-01-16 08:00:00', 987701, NULL, 1.0,
           '{"k": 7}'),
          (955002, TIMESTAMP '2024-01-16 08:01:00', 987701, NULL, 1.0,
           '{"k": 3,}'),
          (955003, TIMESTAMP '2024-01-16 08:02:00', 987701, NULL, 1.0,
           NULL),
          (955004, NULL::TIMESTAMP, NULL, 'json-nullkeys', 1.0,
           '{"k": 5}'),
          (955010, TIMESTAMP '2024-01-16 08:10:00', 987702, 'json-uni',
           1.0, '{"s": "ß,}💥", "k": 9}'),
          (955011, TIMESTAMP '2024-01-16 08:11:00', 987702, 'json-uni',
           1.0, '{"s": "a\\"ß,}", "k": 4}'),
          (955012, TIMESTAMP '2024-01-16 08:12:00', 987702, 'json-uni',
           1.0, '{"s": "a\\\\", "k": 6}'),
          (955013, TIMESTAMP '2024-01-16 08:13:00', 987702, 'json-uni',
           1.0, '{"t": ["ß","💥"], "k": 2,}'),
          -- law 53 (r11 STRUCTURE sweep): Jackson∩yyjson-intersection
          -- validity, one planted row per class with both sides of
          -- each boundary (53a depth cap 1000, 53b number-token digit
          -- cap 1000, 53c yyjson-only NaN/Inf literals, 53d lone
          -- surrogate escapes, 53e raw control chars in strings,
          -- 53f trailing content) plus in-string decoys that must NOT
          -- trip the structural guards.
          (955020, TIMESTAMP '2024-01-16 08:20:00', 987703, 'json-struct',
           1.0, '{"k": 5, "d": ' || repeat('{"x": ', 999) || '1'
                || repeat('}', 999) || '}'),
          (955021, TIMESTAMP '2024-01-16 08:21:00', 987703, 'json-struct',
           1.0, '{"k": 5, "d": ' || repeat('{"x": ', 1000) || '1'
                || repeat('}', 1000) || '}'),
          (955022, TIMESTAMP '2024-01-16 08:22:00', 987703, 'json-struct',
           1.0, '{"k": 5, "n": ' || repeat('9', 1000) || '}'),
          (955023, TIMESTAMP '2024-01-16 08:23:00', 987703, 'json-struct',
           1.0, '{"k": 5, "n": ' || repeat('9', 1001) || '}'),
          (955024, TIMESTAMP '2024-01-16 08:24:00', 987703, 'json-struct',
           1.0, '{"k": 5, "n": NaN}'),
          (955025, TIMESTAMP '2024-01-16 08:25:00', 987703, 'json-struct',
           1.0, '{"k": 5, "s": "NaN and inf are words"}'),
          (955026, TIMESTAMP '2024-01-16 08:26:00', 987703, 'json-struct',
           1.0, '{"k": 5, "s": "\\ud800"}'),
          (955027, TIMESTAMP '2024-01-16 08:27:00', 987703, 'json-struct',
           1.0, '{"k": 5, "s": "\\ud83d\\ude00"}'),
          (955028, TIMESTAMP '2024-01-16 08:28:00', 987703, 'json-struct',
           1.0, '{"k": 5, "s": "a' || chr(9) || 'b"}'),
          (955029, TIMESTAMP '2024-01-16 08:29:00', 987703, 'json-struct',
           1.0, '{"k": 5}{"k": 6}'),
          (955030, TIMESTAMP '2024-01-16 08:30:00', 987703, 'json-struct',
           1.0, '{"k": 5}]'),
          (955031, TIMESTAMP '2024-01-16 08:31:00', 987703, 'json-struct',
           1.0, '{"k": 1, "\\u006b": 2}'),
          (955032, TIMESTAMP '2024-01-16 08:32:00', 987703, 'json-struct',
           1.0, '{"k": 5, "s": "' || repeat('{', 1500) || '"}'),
          (955033, TIMESTAMP '2024-01-16 08:33:00', 987703, 'json-struct',
           -- 53d seam: lone surrogates separated by an escaped
           -- backslash must stay LONE (r11 review find)
           1.0, '{"k": 5, "s": "\\ud800\\\\\\udc00"}'),
          -- r8 axis: ±Infinity measures composed with NULL user /
          -- NULL ts / out-of-domain ts. Ids 945007/945014/945021 are
          -- ≡0 (mod 7), so q_stream_dedup's at-least-once redelivery
          -- injection REDELIVERS exactly these degenerate rows — the
          -- bit-exact-dup contract exercised on the worst rows.
          (945007, TIMESTAMP '2024-01-17 09:00:00', NULL::BIGINT, 'view',
           'Infinity'::DOUBLE, NULL),
          (945014, NULL::TIMESTAMP, 987801::BIGINT, 'purchase',
           '-Infinity'::DOUBLE, NULL),
          (945021, TIMESTAMP '2200-01-01 00:00:00', 987801, 'click',
           'Infinity'::DOUBLE, NULL),
          (945022, TIMESTAMP '2024-01-17 09:10:00', 987801, 'view',
           '-Infinity'::DOUBLE, NULL),
          -- a user whose EVERY value is ±inf: the group's mask carries
          -- both infinity bits (sum → NaN) with no finite row to lean on
          (945023, TIMESTAMP '2024-01-17 09:20:00', 987802, 'view',
           'Infinity'::DOUBLE, NULL),
          (945024, TIMESTAMP '2024-01-17 09:21:00', 987802, 'view',
           '-Infinity'::DOUBLE, NULL),
          -- as-of RIGHT-side law probes: a NULL-ts click and a
          -- NULL-user click for a user who also has a valid purchase —
          -- an oracle that forgets the right-side NULL filters hands
          -- them to DuckDB ASOF's engine-private NULL ordering
          (945025, NULL::TIMESTAMP, 987801, 'click', 2.0::DOUBLE, NULL),
          (945026, TIMESTAMP '2024-01-17 09:30:00', NULL::BIGINT, 'click',
           2.5::DOUBLE, NULL),
          (945027, TIMESTAMP '2024-01-17 09:35:00', 987801, 'purchase',
           3.0::DOUBLE, NULL)
        ) v(event_id, ts, user_id, event_type, value, props)""")
    # Unicode x duplicate doc_ids, plus a dup id with a NULL-text row
    # (unicode x NULL composition).
    rewrite("documents", """
        SELECT * FROM (VALUES
          (980001::BIGINT, 'the straße fuß walk was long today indeed',
           'de', 'degen-uni', 42::BIGINT),
          (980001, 'THE STRASSE FUSS WALK WAS LONG TODAY INDEED',
           'de', 'degen-uni', 44),
          (980002, 'alpha' || chr(160) || 'beta gamma delta epsilon',
           'en', 'degen-uni', 30),
          (980002, 'alpha beta gamma delta epsilon', 'en', 'degen-uni', 30),
          (980003, 'mixed ẞ and ß case pair token stream here', 'de',
           'degen-uni', 41),
          (980003, NULL, 'de', 'degen-uni', NULL),
          (980010, '🎉 party time with cake and music and friends fun',
           'en', 'degen-uni', 49),
          (980011, '🎂 party time with cake and music and friends fun',
           'en', 'degen-uni', 49),
          -- NULL doc_id with real near-dup text (entity-id NULL probe)
          (NULL, 'the straße fuß walk was long today also', 'de',
           'degen-uni', 40),
          -- r8 axis: the SOURCE/LANG strata keys go degenerate too —
          -- NULL source, unicode source, EMPTY-STRING source (distinct
          -- from NULL on both engines), and a dup doc_id whose copies
          -- sit in DIFFERENT strata (entity law × stratified sampling)
          (982001, 'token stream for stratified sampling test alpha',
           'en', NULL::VARCHAR, 46),
          (982002, 'token stream for stratified sampling test beta',
           'en', 'srç-ünï', 45),
          (982003, 'gamma token stream crossing strata now', 'en',
           'srç-ünï', 38),
          (982003, 'gamma token stream crossing strata now', 'de',
           NULL, 38),
          (982004, 'delta token stream for the empty strata probe',
           'en', '', 45)
        ) v(doc_id, text, lang, source, n_chars)""")
    # Duplicate vec_ids where one copy is non-finite / out-of-bound
    # (entity identity x the emb_finite participation contract).
    rewrite("embeddings", """
        SELECT * FROM (VALUES
          (930001::BIGINT, [ 'NaN'::FLOAT, 1.0, 0.5, 0.25 ]
               || list_transform(range(60), x -> 0.0::FLOAT), 1::INT),
          (930001, [ 0.6::FLOAT, 0.8 ] || list_transform(range(62), x -> 0.0::FLOAT), 1),
          (930002, [ 1.0e30::FLOAT, 0.0 ] || list_transform(range(62), x -> 0.1::FLOAT), 2),
          (930003, NULL, NULL),
          (930003, [ 0.0::FLOAT, -1.0 ] || list_transform(range(62), x -> 0.0::FLOAT), 2),
          -- NULL vec_id with a finite embedding (entity-id NULL probe)
          (NULL, [ 0.8::FLOAT, 0.6 ] || list_transform(range(62), x -> 0.0::FLOAT), 3),
          -- r8 axis: a dup vec_id whose copies BOTH pass the
          -- participation gate but hold DIFFERENT finite vectors —
          -- entity ambiguity the NULL/non-finite dup rows never test
          (940001, [ 0.30::FLOAT, 0.40 ] || list_transform(range(62), x -> 0.01::FLOAT), 1),
          (940001, [ 0.40::FLOAT, 0.30 ] || list_transform(range(62), x -> 0.02::FLOAT), 1)
        ) v(vec_id, embedding, label)""")
    con.close()
    print(f"composed dir ready: {dest}")


if __name__ == "__main__":
    build(sys.argv[1], sys.argv[2])
