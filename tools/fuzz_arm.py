"""The standing randomized fuzz arm (r8 verdict task 6: one arm per
round is the regression budget; rotate the seed, promote finds).

    python tools/fuzz_arm.py 161803            # seed
    python tools/fuzz_arm.py 161803 20         # seed, trials
    python tools/fuzz_arm.py 161803 20 /root/testdata/sf0.001

Prior arms were ad-hoc session scripts (arm 5 seed 7297 → law 49 +
the sentinel-range fix; arm 6 seed 424242 → law 50 + the NULL-sum
round trip); this commits the runner so every round's arm is
reproducible from its SCALE.md log line. The design is the grand
arm's: per trial, EVERY fact table is doctored with rows drawn from
the degenerate alphabets (NULL / NaN / ±inf / empty / unicode /
boundary timestamps / malformed JSON / duplicate + orphan keys /
ragged vectors), then a per-trial random draw of consumers spanning
batch AND streaming families runs the full driver-shaped
rows/schema/hash comparator against DuckDB on the doctored dir.

Exit 1 on any divergence, printing the planted rows and the failing
comparator detail — the promotion path is unchanged: a find becomes a
planted row in tools/make_composed_dir.py and a pin in
tests/test_degenerate_*.py, and the arm re-runs clean.

Determinism: everything derives from random.Random(seed); two runs
with the same seed/trials/sf draw identical programs.
"""

from __future__ import annotations

import os
import random
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

NAN, PINF, NINF = float("nan"), float("inf"), float("-inf")

# Degenerate alphabets (the test_degenerate_fuzz classes, plain-Python
# so random.Random drives the draw instead of hypothesis).
VALUES = [None, NAN, PINF, NINF, 0.0, -0.0, 1.5, -7.25,
          1e10, 2.5e12, 9.5e15, 1e-7, 1e30,
          # r10 axis: representation boundaries. 2^53±2 straddle the
          # double exact-integer ceiling; 1e18-scale values stress the
          # DECIMAL(30,6) integer digits without crossing the law-46
          # mutual-rejection line at 1e24; ±5e-7 / 4.9e-7 sit exactly
          # on the law-51 half-quantum rounding boundary the r9 arm
          # found (the clamp must be a no-op for values at the
          # boundary and exact for values below it).
          # 1e18-scale: the double ulp here is 128, so NO value at
          # this magnitude can carry a fraction — a ".999999" literal
          # would silently round to the clean power of ten (r10 close
          # ADVICE). 1e18 ± 2**10 are exactly representable (1024 is
          # 8 ulps) and stress DECIMAL(30,6)'s integer digits with a
          # non-round mantissa, which is what the axis really tests.
          9007199254740992.0, 9007199254740994.0,
          1e18 + 2**10, -(1e18 + 2**10),
          5e-7, -5e-7, 4.9e-7]
TS = [None,
      "2024-01-15 10:00:00", "2024-01-15 10:00:01", "2024-01-16 23:59:59",
      "1970-01-02 00:00:00", "1970-01-01 23:59:59",
      "2199-12-31 23:59:59", "2200-01-01 00:00:00",
      # sub-second window-boundary straddlers (the pinned
      # test_degenerate_timestamps axis, randomized into compositions)
      "2024-01-15 10:00:00.000001", "2024-01-15 09:59:59.999999",
      "2024-01-15 10:09:59.999999",
      # r12 row-granular axis (r11 verdict task 4): values exactly ONE
      # WATERMARK DELAY (the dedup/join drives' 2h) apart from the
      # 10:00:00 anchor, one microsecond on either side — so a random
      # composition can place a drive-injected duplicate pair, a state
      # eviction, and a watermark advance in EXACT event-time tie. The
      # windowed family is structurally immune to such ties (law 54);
      # dropDuplicatesWithinWatermark / eviction-flush / CEP / upsert
      # decide per ROW, which is the seam this axis aims at.
      "2024-01-15 12:00:00", "2024-01-15 11:59:59.999999",
      "2024-01-15 12:00:00.000001", "2024-01-15 08:00:00",
      "2024-01-15 14:00:00"]
USERS = [None, 77001, 77002, 77003, -1, -(2**63)]
ETYPES = [None, "click", "purchase", "view", "", "vïew", "ß",
          # r10 astral axis: every char below is OUTSIDE the BMP
          # (UTF-16 surrogate pairs on the JVM, 4-byte UTF-8 in
          # DuckDB/Arrow) or a combining-mark normalization trap —
          # grouping, upper/lower, length, and regex must agree on
          # code POINTS, not code units or grapheme clusters.
          "𝔠𝔩𝔦𝔠𝔨", "👩‍👩‍👧‍👧", "évent", "évent"]
PROPS = [None, '{"k": 7}', '{"k": 3,}', '{"k": "7"}', '{"k": 1.7}',
         '{"s": "ß,}💥"}', '{"s": "a\\"b,}"}', "not json at all", "",
         # r10 astral axis: astral values AND an astral KEY (JSON path
         # extraction must treat both as opaque code points)
         '{"k": "👩‍👩‍👧‍👧"}', '{"𝑘": 1}',
         # r11 STRUCTURE axis (law 53, Jackson∩yyjson intersection):
         # both sides of every strictness boundary the r11 probe
         # found, plus in-string decoys that must NOT trip the
         # structural guards. 53a depth (Jackson caps total nesting
         # at 1000):
         '{"k": 5, "d": ' + '{"x": ' * 999 + "1" + "}" * 999 + "}",
         '{"k": 5, "d": ' + '{"x": ' * 1000 + "1" + "}" * 1000 + "}",
         '{"k": 5, "a": ' + "[" * 1200 + "1" + "]" * 1200 + "}",
         # 53b number-token digit cap (1000 digits; the token nukes
         # the WHOLE doc on Jackson even though k itself is clean):
         '{"k": 5, "n": ' + "9" * 1000 + "}",
         '{"k": 5, "n": ' + "9" * 1001 + "}",
         # 53c yyjson-only NaN/Infinity literals as OTHER fields:
         '{"k": 5, "n": NaN}', '{"k": 5, "n": -inf}',
         '{"k": 5, "n": Infinity}',
         '{"k": 5, "s": "NaN and inf are words"}',  # decoy: valid
         # 53d lone vs paired surrogate escapes (value AND key):
         '{"k": 5, "s": "\\ud800"}', '{"\\udc00": 1, "k": 4}',
         '{"k": 5, "s": "\\ud83d\\ude00"}',
         # 53e raw control char inside a string (escaped form valid):
         '{"k": 5, "s": "a\tb"}', '{"k": 5, "s": "a\\tb"}',
         # 53f trailing content after the first balanced value:
         '{"k": 5}{"k": 6}', '{"k": 5},', '{"k": 5}]', '{"k": 5} x',
         # escape-collision duplicate key (first occurrence wins):
         '{"k": 1, "\\u006b": 2}',
         # 53d seam: escaped backslash BETWEEN lone surrogates
         # (deletion-fabricated adjacency, r11 review find):
         '{"k": 5, "s": "\\ud800\\\\\\udc00"}',
         # structural decoys INSIDE strings (brace/digit walls):
         '{"k": 5, "s": "' + "{" * 1500 + '"}',
         '{"k": 4, "s": "' + "9" * 1500 + '"}']
TEXTS = [None, "", " ", "the the the the the", "ß💥ïç",
         "a" * 400, "word " * 50, "Tab\there\nand newline",
         "ASCII only simple text with words and more words here",
         # length extremes: a ~200 KB doc (chunking/fingerprinting/
         # tfidf/BPE walk the whole string; Arrow batches carry it)
         ("lorem ipsum dolor sit amet " * 8000),
         ("z" * 100_000),
         # r10 astral axis: shingling/chunking/tokenizing walk these
         # by code point; a UTF-16-code-unit slicer would split a
         # surrogate pair and fork every downstream hash. The
         # decomposed/composed pair ("e" + U+0301 vs U+00E9) must NOT
         # collapse (neither engine normalizes); the ZWJ family is one
         # grapheme but FIVE code points wide.
         "𐍈𝕊𝕡𝕒𝕣𝕜 𝔡𝔬𝔠 " * 40,
         "👩‍👩‍👧‍👧 family 👨‍👩‍👧 emoji 🏳️‍🌈 flags",
         "café café café café",
         ("𝕒" * 300) + " " + ("😀" * 200)]
LANGS = [None, "en", "de", "", "zz"]
SOURCES = [None, "web", "book", "", "ẅeb", "𝚠𝚎𝚋"]
SEGMENTS = [None, "BUILDING", "AUTOMOBILE", "", "COMPßẞ", "𝔅𝔘𝔦𝔩𝔡"]
NAMES = [None, "", "dup-name", "ünïcode-name", "x" * 120,
         "𝒹𝓊𝓅-𝓃𝒶𝓂𝑒", "👨‍👩‍👧 name", "namé",
         # r11 structure axis: CSV-hostile shapes through the
         # q_source_csv round-trip (law 44's probed classes, promoted
         # into the standing randomized alphabets): embedded
         # delimiter, embedded quotes, embedded LF / CRLF (multiLine
         # reader), and the literal MySQL NULL sentinel (default
         # options keep it as plain text -- the collision only exists
         # under nullValue backslash-N, which the engine does not
         # set).
         "comma, inside", 'has "quotes" inside', "line1\nline2",
         "cr\r\nlf mixed", "\\N"]
DATES = [None, "1996-01-01", "0001-01-01", "9999-12-31", "1996-03-02"]
FLAGS = [None, "N", "R", "A", ""]

# Consumers per doctored table: batch families + the streaming drives
# the cheap arms skip. Weights: streaming drives cost ~3-5 s each, so
# each trial draws at most one.
BATCH_POOL = {
    "events": ["q_win_tumble", "q_win_lag", "q_evt_funnel", "q_json_extract",
               "q_evt_retention", "q_rollup_time", "q_ts_gapfill",
               "q_evt_histogram", "q_win_session", "q_evt_cep",
               "q_win_running", "q_win_time_range", "q_evt_markov",
               "q_evt_anomaly", "q_scd2_intervals", "q_sketch_cms",
               "q_sketch_hll", "q_evt_basket", "q_win_slide"],
    "documents": ["q_dedup_exact", "q_text_quality", "q_sample_stratified",
                  "q_text_langid", "q_text_stats", "q_dedup_lsh",
                  "q_text_chunk", "q_text_fingerprint", "q_text_tfidf",
                  "q_text_surprisal", "q_text_heavy_hitters",
                  "q_dedup_simhash", "q_text_redact", "q_text_ngram_freq",
                  "q_dedup_near", "q_text_concat_pack"],
    "tpch": ["q_tpch_q3", "q_tpch_q10", "q_agg_q1", "q_win_rank",
             "q_merge_cow", "q_lake_delete", "q_join_left", "q_sub_in",
             "q_join_not_in", "q_agg_corr", "q_merge_upsert", "q_pivot",
             "q_sub_exists", "q_cte_reuse", "q_win_dist", "q_agg_stats",
             "q_topk_group", "q_sketch_quantile", "q_lake_compact",
             "q_win_ntile", "q_agg_multi_distinct", "q_cdc_diff"],
    "part_supp": ["q_str_funcs", "q_str_regexp", "q_str_levenshtein",
                  "q_unpivot", "q_source_csv", "q_set_intersect",
                  "q_tpch_q5", "q_set_except", "q_vocab_typo"],
    "embeddings": ["q_emb_normalize", "q_sim_knn", "q_emb_quantize",
                   "q_ml_score", "q_multimodal_join", "q_sim_ivf",
                   "q_sim_ann", "q_dedup_embed", "q_emb_gram"],
}
STREAM_POOL = ["q_stream_dedup", "q_stream_session", "q_stream_tumble",
               "q_stream_join_left", "q_stream_slide", "q_stream_upsert"]


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "'NaN'::DOUBLE"
        if v == PINF:
            return "'Infinity'::DOUBLE"
        if v == NINF:
            return "'-Infinity'::DOUBLE"
        return f"{v!r}::DOUBLE"
    if isinstance(v, int):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def _ts_lit(v) -> str:
    return "NULL::TIMESTAMP" if v is None else f"TIMESTAMP '{v}'"


def _doctor(con, sf, table, cols, rows_sql):
    src, tmp = f"{sf}/{table}.parquet", f"{sf}/_{table}.parquet"
    con.sql(
        f"COPY (SELECT * FROM read_parquet('{src}') UNION ALL BY NAME "
        f"SELECT * FROM (VALUES {rows_sql}) v({', '.join(cols)}))"
        f" TO '{tmp}' (FORMAT PARQUET)"
    )
    os.replace(tmp, src)


def doctor_all(rng: random.Random, sf: str) -> dict:
    """Doctor every fact table with 1-5 random degenerate rows; return
    the planted program (for failure reports)."""
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    planted = {}

    def plant(table, cols, mk_row):
        n = rng.randint(1, 5)
        rows = [mk_row(i) for i in range(n)]
        planted[table] = rows
        _doctor(con, sf, table, cols, ", ".join(rows))

    plant("events",
          ["event_id", "ts", "user_id", "event_type", "value", "props"],
          lambda i: "(%s, %s, %s, %s, %s, %s)" % (
              # ids: UNIQUE fresh, UNIQUE ≡0-mod-7 (the dedup drive's
              # redelivery class), or NULL identity. Never a repeated
              # non-NULL id: the source declares event_id a PRIMARY
              # KEY, and an id-collision with distinct payloads is the
              # DECLARED out-of-domain corruption class (law 49 — the
              # surviving copy is arrival-order-dependent, so the
              # dedup drive legitimately diverges from the plain-table
              # oracle on such input; arm seed 271828 trial 6
              # re-confirmed exactly that, as designed).
              rng.choice([str(66300 + 11 * i), "NULL::BIGINT",
                          str(7 * 9457 + 7 * i)]),
              _ts_lit(rng.choice(TS)), _lit(rng.choice(USERS)),
              _lit(rng.choice(ETYPES)), _lit(rng.choice(VALUES)),
              _lit(rng.choice(PROPS))))
    plant("documents",
          ["doc_id", "text", "lang", "source", "n_chars"],
          lambda i: "(%s, %s, %s, %s, %s)" % (
              rng.choice([str(88200 + i), str(88200), "NULL::BIGINT"]),
              _lit(rng.choice(TEXTS)), _lit(rng.choice(LANGS)),
              _lit(rng.choice(SOURCES)),
              rng.choice(["NULL::BIGINT", "0", "400"])))
    plant("customer",
          ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
           "c_mktsegment"],
          lambda i: "(%s, %s, %s, %s, %s)" % (
              rng.choice([str(99200 + i), str(99200), "NULL::BIGINT"]),
              _lit(rng.choice(NAMES)), rng.choice(["1", "2", "NULL::INT"]),
              _lit(rng.choice(VALUES)), _lit(rng.choice(SEGMENTS))))
    plant("orders",
          ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
           "o_orderdate", "o_orderpriority"],
          lambda i: "(%s, %s, %s, %s, %s, %s)" % (
              rng.choice([str(77300 + i), str(77300), "NULL::BIGINT"]),
              # orphan FK, planted-duplicate customer, or NULL
              rng.choice([str(99200), "424242", "NULL::BIGINT", "1"]),
              _lit(rng.choice(["O", "F", "P", None, ""])),
              _lit(rng.choice(VALUES)),
              rng.choice(["NULL::TIMESTAMP"] +
                         [f"TIMESTAMP '{d}'" for d in DATES if d]),
              _lit(rng.choice(["1-URGENT", "5-LOW", None, ""]))))
    plant("lineitem",
          ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
           "l_quantity", "l_extendedprice", "l_discount", "l_tax",
           "l_returnflag", "l_linestatus", "l_shipdate"],
          lambda i: "(%s, %s, %s, %s, %s, %s, %s, %s, %s, %s, %s)" % (
              # orphan fact or planted-order child
              rng.choice([str(77300), "555555", "NULL::BIGINT", "1"]),
              rng.choice(["1", "66666", "NULL::BIGINT"]),
              rng.choice(["1", "66666", "NULL::BIGINT"]),
              str(100 + i),
              _lit(rng.choice(VALUES)), _lit(rng.choice(VALUES)),
              _lit(rng.choice([0.0, 0.05, None, NAN])),
              _lit(rng.choice([0.0, 0.02, None])),
              _lit(rng.choice(FLAGS)), _lit(rng.choice(FLAGS)),
              rng.choice(["NULL::TIMESTAMP"] +
                         [f"TIMESTAMP '{d}'" for d in DATES if d])))
    plant("part",
          ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
           "p_retailprice"],
          lambda i: "(%s, %s, %s, %s, %s, %s)" % (
              rng.choice([str(66600 + i), str(66600), "NULL::BIGINT"]),
              _lit(rng.choice([None, "", "dup part name", "plain part"])),
              _lit(rng.choice([None, "", "Brand#13"])),
              _lit(rng.choice([None, "", "PROMO BURNISHED"])),
              rng.choice(["NULL::INT", "0", "-5", "50"]),
              _lit(rng.choice(VALUES))))
    plant("supplier",
          ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
          lambda i: "(%s, %s, %s, %s)" % (
              rng.choice([str(44400 + i), str(44400), "NULL::BIGINT"]),
              _lit(rng.choice(NAMES)), rng.choice(["1", "NULL::INT"]),
              _lit(rng.choice(VALUES))))
    plant("embeddings",
          ["vec_id", "embedding", "label"],
          lambda i: "(%s, %s, %s)" % (
              rng.choice([str(55500 + i), str(55500), "NULL::BIGINT"]),
              rng.choice([
                  "NULL::FLOAT[]",
                  "[]::FLOAT[]",
                  "[0.5, 0.25]::FLOAT[]",  # ragged short
                  "CAST(list_transform(range(64), x -> 0.125) AS FLOAT[])",
                  "CAST(list_transform(range(64), x -> 'NaN'::FLOAT)"
                  " AS FLOAT[])",
              ]),
              rng.choice(["NULL::INT", "0", "1", "-1"])))
    con.close()
    return planted


def main() -> int:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 161803
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    base = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    rng = random.Random(seed)
    queries, oracles = collect()
    for pool in list(BATCH_POOL.values()) + [STREAM_POOL]:
        unknown = [q for q in pool if q not in oracles]
        if unknown:
            print(f"unknown consumers: {unknown}", file=sys.stderr)
            return 2
    spark = get_spark("fuzz_arm")

    runs = fails = 0
    failures = []
    for t in range(trials):
        work = tempfile.mkdtemp(prefix=f"fsk_arm_{seed}_{t}_")
        sf = copy_sf_tables(base, work)
        planted = doctor_all(rng, sf)
        # per-trial draw: one consumer per batch family + one streaming
        names = [rng.choice(pool) for pool in BATCH_POOL.values()]
        names.append(rng.choice(STREAM_POOL))
        # r12 axis: randomize the micro-batch split for the streaming
        # consumer (the oracle is split-independent by contract, so
        # any split-sensitive boundary handling shows up as a parity
        # divergence). None = the drive's own default count.
        split = rng.choice([None, 1, 2, 5, 7])
        planted["stream_batches"] = split
        con = make_duckdb(sf)
        try:
            for name in names:
                runs += 1
                if name in STREAM_POOL:
                    if split is None:
                        os.environ.pop("SPARK_GRAFT_STREAM_BATCHES", None)
                    else:
                        os.environ["SPARK_GRAFT_STREAM_BATCHES"] = str(split)
                else:
                    os.environ.pop("SPARK_GRAFT_STREAM_BATCHES", None)
                try:
                    r = check_parity(
                        spark, con, name, queries[name], oracles[name], sf
                    )
                except Exception:
                    # One engine raised mid-compare. Out-of-domain
                    # magnitudes are a DECLARED mutual loud failure
                    # (law 46: both engines reject |x| >= 1e24 at the
                    # decimal(30,6) boundary) — so an exception is a
                    # find ONLY if the engines disagree about raising.
                    spark_err = oracle_err = None
                    try:
                        queries[name](spark, sf).collect()
                    except Exception as se:
                        spark_err = repr(se)[:200]
                    try:
                        con.sql(oracles[name]).fetchall()
                    except Exception as oe:
                        oracle_err = repr(oe)[:200]
                    if spark_err and oracle_err:
                        print(f"trial {t} {name}: mutual loud failure "
                              f"(law-46 class) — parity holds", flush=True)
                        continue
                    fails += 1
                    failures.append((t, name, None, planted))
                    print(
                        f"TRIAL {t} FAIL {name}: ONE-SIDED engine error\n"
                        f"  spark: {spark_err}\n  oracle: {oracle_err}\n"
                        f"  planted: {planted}",
                        flush=True,
                    )
                    continue
                if not r.ok:
                    fails += 1
                    failures.append((t, name, r, planted))
                    print(
                        f"TRIAL {t} FAIL {name}: rows={r.rows_match} "
                        f"schema={r.schema_match} hash={r.hash_match}\n"
                        f"  detail: {r.detail}\n  planted: {planted}",
                        flush=True,
                    )
        finally:
            con.close()
            shutil.rmtree(work, ignore_errors=True)
        print(f"trial {t}: {len(names)} consumers "
              f"({'ok' if not failures or failures[-1][0] != t else 'FAIL'})",
              flush=True)

    print(f"arm seed={seed}: {runs} parity runs, {fails} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
