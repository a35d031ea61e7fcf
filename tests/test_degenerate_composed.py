"""Composed degenerate regimes (r7, verdict task 4): every r6 sweep
doctored ONE divergence class at a time; these fixtures put two
interacting classes in the SAME rows, where a guard written for one
regime can silently assume the other's absence.

Compositions (each a module fixture + parity checklist):

1. **NULL × NaN in the same measure column** (nullnan_sf): a group
   whose measure carries NULL, NaN, AND finite rows at once — the
   dsumr/dsumw presence-mask route must skip NULLs while propagating
   NaN, and every denominator must count non-NULL (NaN included) per
   native AVG semantics (the r7 ADVICE q_agg_stats find is exactly
   this composition's failure mode). Also pinned: a group of ONLY
   {NULL, NaN} and a group of ONLY NULLs (n = 0 → gated avg).

2. **NULL keys × extreme timestamps** (keyts_sf): the window family
   partitions on a nullable key while the event-time domain law
   (vector.ts_valid) excludes out-of-domain rows — composed, the NULL
   key partition itself carries in/out-of-domain and NULL timestamps,
   and streaming drives must neither resurrect an out-of-domain row
   through NULL-key bucketing (law 10's coalesce-salt) nor eat a
   NULL-key row via a sentinel filter (the r7 q_stream_join_left fix).

3. **Unicode × duplicate doc_ids** (unidup_sf): the entity-identity
   law (25: shingles = distinct union over duplicate-id rows) composed
   with law 13 (ASCII-fold via translate, [A-Z] only — unicode case
   pairs like straße/STRASSE must stay DISTINCT tokens on both
   engines, and NBSP is a token CHARACTER, never whitespace); plus
   duplicate vec_ids whose second copy fails the participation gate.

4. **JSON edges × NULL group keys × unicode** (jsonnull_sf): the
   Jackson-strictness scan and integer-value contract in a NULL
   event_type group, on a fully NULL-keyed row, and with ',}' inside
   multi-byte strings / behind escape pairs — plus the all-NULL-type
   user that caught the cep oracles' law-16 string_agg NULL.

5. **Lakehouse merge family × {dup custkey, NULL segment, NaN/inf
   balances}** (lakenn_sf): laws 8 (partition-scoped merge), 11
   (presence markers), and 12 (Hive NULL-partition marker) stated on
   separate rows in r6, exercised on composed rows here.

The sf0.1-scale composed sweep (tools/make_composed_dir.py +
tools/preflight.py — recorded in BASELINE.md r7) doctors the same
divergence CLASSES at 100× data with scaled adversarial magnitudes
and harder (triple) compositions; it is not a row-for-row copy of
these fixtures. Classes found at either scale get their pytest pin
HERE.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest
from oracle import check_parity, copy_sf_tables, make_duckdb

from conftest import SF_SMOKE

pytestmark = pytest.mark.slow  # slow lane — see pytest.ini


def _copy_sf(tmp_path_factory, name):
    # shared scaffold: oracle.copy_sf_tables (table list lives in
    # sources.loader.TABLES — one home, r8 review pass)
    return copy_sf_tables(SF_SMOKE, str(tmp_path_factory.mktemp(name)))


def _rewrite(sf, name, values_sql):
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    src, tmp = f"{sf}/{name}.parquet", f"{sf}/_{name}.parquet"
    con.sql(
        f"COPY (SELECT * FROM '{src}' UNION ALL BY NAME {values_sql})"
        f" TO '{tmp}' (FORMAT PARQUET)"
    )
    os.replace(tmp, src)
    con.close()


# ---------------------------------------------------------------- 1
@pytest.fixture(scope="module")
def nullnan_sf(tmp_path_factory):
    sf = _copy_sf(tmp_path_factory, "degen_nullnan")
    # Customer: BUILDING gains {NULL, NaN, finite} balances at once;
    # two NEW segments isolate the degenerate denominators — COMPNN is
    # only {NULL, NaN} (n = 1, avg = NaN, var gated by n > 1) and
    # COMPALLN is only NULLs (n = 0: the avg division must stay
    # unevaluated — the r7 n > 0 gate).
    _rewrite(sf, "customer", """
        SELECT * FROM (VALUES
          (920001::BIGINT, 'null-bal', 1::INT, NULL::DOUBLE, 'BUILDING'),
          (920002, 'nan-bal', 1, 'NaN'::DOUBLE, 'BUILDING'),
          (920003, 'fin-bal', 1, 512.5::DOUBLE, 'BUILDING'),
          (920004, 'comp-null', 2, NULL, 'COMPNN'),
          (920005, 'comp-nan', 2, 'NaN'::DOUBLE, 'COMPNN'),
          (920006, 'all-null-1', 3, NULL, 'COMPALLN'),
          (920007, 'all-null-2', 3, NULL, 'COMPALLN')
        ) v(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)""")
    # Orders: one customer's date-ordered chain interleaves NULL and
    # NaN totals around finite ones — the dsumw running sum must skip
    # the NULL row but turn NaN exactly from the NaN row's prefix on,
    # while lag/first_last order NULLS LAST around both.
    _rewrite(sf, "orders", """
        SELECT * FROM (VALUES
          (975001::BIGINT, 920001::BIGINT, 'O', 10.0::DOUBLE,
           TIMESTAMP '1996-01-01', '1-URGENT'),
          (975002, 920001, 'O', NULL::DOUBLE,
           TIMESTAMP '1996-01-02', '2-HIGH'),
          (975003, 920001, 'O', 20.0,
           TIMESTAMP '1996-01-03', '3-MEDIUM'),
          (975004, 920001, 'O', 'NaN'::DOUBLE,
           TIMESTAMP '1996-01-04', '4-NOT SPECIFIED'),
          (975005, 920001, 'O', 40.0,
           TIMESTAMP '1996-01-05', '5-LOW'),
          (975006, 920002, 'F', NULL, TIMESTAMP '1996-02-01', '1-URGENT'),
          (975007, 920002, 'F', 'NaN'::DOUBLE,
           TIMESTAMP '1996-02-02', '2-HIGH')
        ) v(o_orderkey, o_custkey, o_orderstatus, o_totalprice,
            o_orderdate, o_orderpriority)""")
    # Lineitem: one (returnflag, linestatus) group carries a NULL
    # quantity row and a NaN price row (different rows, same group) —
    # q1's per-column sums must mix skip-NULL and propagate-NaN
    # independently within the group.
    _rewrite(sf, "lineitem", """
        SELECT * FROM (VALUES
          (715001::BIGINT, 1::BIGINT, 1::BIGINT, 1::INT, NULL::DOUBLE,
           50.0::DOUBLE, 0.05::DOUBLE, 0.02::DOUBLE, 'N', 'O',
           TIMESTAMP '1997-06-01'),
          (715002, 2, 2, 1, 5.0, 'NaN'::DOUBLE, 0.0, 0.0, 'N', 'O',
           TIMESTAMP '1997-06-02'),
          (715003, 3, 3, 1, NULL, 'NaN'::DOUBLE, NULL, 0.0, 'N', 'O',
           TIMESTAMP '1997-06-03')
        ) v(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
            l_extendedprice, l_discount, l_tax, l_returnflag,
            l_linestatus, l_shipdate)""")
    # Events: one user's single hour holds a NULL value and a NaN
    # value — windowed sums and histograms see both classes in one
    # frame; fin() must send NaN (no bin) and NULL (no value) the
    # same way on both engines.
    _rewrite(sf, "events", """
        SELECT * FROM (VALUES
          (945001::BIGINT, TIMESTAMP '2024-03-02 09:00:00', 88::BIGINT,
           'click', NULL::DOUBLE, NULL),
          (945002, TIMESTAMP '2024-03-02 09:01:00', 88, 'click',
           'NaN'::DOUBLE, NULL),
          (945003, TIMESTAMP '2024-03-02 09:02:00', 88, 'click',
           2.5::DOUBLE, NULL)
        ) v(event_id, ts, user_id, event_type, value, props)""")
    yield sf


@pytest.fixture(scope="module")
def nullnan_duck(nullnan_sf):
    con = make_duckdb(nullnan_sf)
    yield con
    con.close()


NULLNAN_CHECKED = [
    # dsumr group sums mixing skip-NULL with propagate-NaN
    "q_agg_q1",
    "q_agg_stats",
    "q_agg_corr",
    "q_agg_groupingsets",
    "q_agg_rollup",
    "q_sub_scalar",
    "q_cte_reuse",
    # dsumw window sums over the interleaved chain + NULLS LAST order
    "q_win_running",
    "q_win_range_frame",
    "q_win_lag",
    "q_win_first_last",
    # fin gates where NULL and NaN meet in one frame
    "q_agg_percentile",
    "q_evt_histogram",
    # distinct/count surfaces (COUNT skips NULL, counts NaN)
    "q_agg_multi_distinct",
    # python/pandas UDF domain + streaming dsumr
    "q_udaf_pandas",
    "q_stream_tumble",
]


@pytest.mark.parametrize("name", NULLNAN_CHECKED)
def test_nullnan_parity(spark, nullnan_duck, registry, nullnan_sf, name):
    queries, oracles = registry
    r = check_parity(
        spark, nullnan_duck, name, queries[name], oracles[name], nullnan_sf
    )
    assert r.ok, (
        f"{name} diverges on NULL x NaN input: rows={r.rows_match} "
        f"schema={r.schema_match} hash={r.hash_match}\n{r.detail}"
    )


def test_stats_nullnan_denominators(spark, registry, nullnan_sf):
    """The r7 ADVICE fix, pinned at its composed extreme: COMPNN's
    n counts only the NaN row (avg = NaN, var = NULL via n > 1 gate);
    COMPALLN has n = 0 (avg NULL via the n > 0 gate, no ANSI /0)."""
    queries, _ = registry
    rows = {
        r["c_mktsegment"]: r
        for r in queries["q_agg_stats"](spark, nullnan_sf).collect()
    }
    assert math.isnan(rows["COMPNN"]["avg_bal"]), rows["COMPNN"]
    assert rows["COMPNN"]["var_bal"] is None, rows["COMPNN"]
    assert rows["COMPALLN"]["avg_bal"] is None, rows["COMPALLN"]
    assert rows["COMPALLN"]["min_bal"] is None, rows["COMPALLN"]


def test_running_sum_skips_null_then_poisons_at_nan(spark, registry, nullnan_sf):
    """Customer 920001's chain: 10, NULL, 20, NaN, 40 → running sums
    10, 10, 30, NaN, NaN — the NULL is skipped (sum unchanged), the
    NaN poisons its own prefix and everything after."""
    import pyspark.sql.functions as F

    queries, _ = registry
    out = (
        queries["q_win_running"](spark, nullnan_sf)
        .where(F.col("o_custkey") == 920001)
        .orderBy("o_orderdate")
        .collect()
    )
    sums = [r["running_total"] for r in out]
    assert sums[0] == 10.0 and sums[1] == 10.0 and sums[2] == 30.0, sums
    assert math.isnan(sums[3]) and math.isnan(sums[4]), sums


# ---------------------------------------------------------------- 2
@pytest.fixture(scope="module")
def keyts_sf(tmp_path_factory):
    sf = _copy_sf(tmp_path_factory, "degen_keyts")
    # Events: the NULL-user "partition" itself carries one in-domain,
    # one pre-epoch, one post-ceiling, and one NULL timestamp; user
    # 601 anchors in-domain windows around its own out-of-domain rows.
    # In-domain rows stay inside the generated data's natural span
    # (2024) so q_ts_gapfill's grid stays bounded (r6 fixture tip).
    _rewrite(sf, "events", """
        SELECT * FROM (VALUES
          (995001::BIGINT, TIMESTAMP '2024-03-03 10:00:00', NULL::BIGINT,
           'view', 1.0::DOUBLE, NULL),
          (995002, TIMESTAMP '2024-03-03 10:05:00', NULL, 'purchase',
           2.0, NULL),
          (995003, TIMESTAMP '1969-12-31 23:59:59', NULL, 'click',
           3.0, NULL),
          (995004, TIMESTAMP '9999-12-31 23:59:59', NULL, 'click',
           4.0, NULL),
          (995005, NULL::TIMESTAMP, NULL, 'purchase', 5.0, NULL),
          (995006, TIMESTAMP '2024-03-03 10:10:00', 601::BIGINT,
           'view', 6.0, NULL),
          (995007, TIMESTAMP '0001-01-01 00:00:00', 601, 'click',
           7.0, NULL),
          (995008, TIMESTAMP '2200-01-01 00:00:00', 601, 'click',
           8.0, NULL),
          (995009, TIMESTAMP '2024-03-03 10:20:00', 601, 'purchase',
           9.0, NULL),
          (995010, NULL::TIMESTAMP, 601, 'view', 10.0, NULL)
        ) v(event_id, ts, user_id, event_type, value, props)""")
    # Orders: the NULL-custkey window partition composed with extreme
    # and NULL order dates (the odates sweep used valid custkeys only).
    _rewrite(sf, "orders", """
        SELECT * FROM (VALUES
          (986001::BIGINT, NULL::BIGINT, 'O', 10.0::DOUBLE,
           TIMESTAMP '0001-01-01 00:00:00', '1-URGENT'),
          (986002, NULL, 'O', 20.0, TIMESTAMP '9999-12-31 23:59:59',
           '2-HIGH'),
          (986003, NULL, 'O', 30.0, NULL::TIMESTAMP, '3-MEDIUM'),
          (986004, NULL, 'O', 40.0, TIMESTAMP '1996-05-01', '4-NOT SPECIFIED')
        ) v(o_orderkey, o_custkey, o_orderstatus, o_totalprice,
            o_orderdate, o_orderpriority)""")
    yield sf


@pytest.fixture(scope="module")
def keyts_duck(keyts_sf):
    con = make_duckdb(keyts_sf)
    yield con
    con.close()


KEYTS_CHECKED = [
    # window family over the NULL-user partition with domain exclusion
    "q_win_tumble",
    "q_win_slide",
    "q_win_session",
    "q_win_time_range",
    "q_rollup_time",
    "q_ts_gapfill",
    "q_scd2_intervals",
    # event ops keyed on the nullable user
    "q_evt_funnel",
    "q_evt_retention",
    "q_evt_markov",
    # the NULL-custkey order partition with extreme/NULL dates
    "q_win_lag",
    "q_win_running",
    "q_win_first_last",
    "q_feat_snapshot",
    # as-of family: the union+window formulation must give NULL keys
    # and NULL timestamps SQL join semantics, not window-partition
    # semantics (r7 sf0.1 composed sweep find — operators/asof.py)
    "q_join_asof",
    "q_join_asof_fwd",
    "q_join_asof_tol",
    # concat NULL propagation on the NULL-custkey packed key (r7
    # sf0.1 composed sweep find — concat_ws skipped the NULL arg)
    "q_struct_funcs",
    # streaming drives: domain gate + NULL-key rows + sentinel filters
    "q_stream_session",
    "q_stream_join_left",
    "q_stream_dedup",
    "q_stream_cep",
]


@pytest.mark.parametrize("name", KEYTS_CHECKED)
def test_keyts_parity(spark, keyts_duck, registry, keyts_sf, name):
    queries, oracles = registry
    r = check_parity(
        spark, keyts_duck, name, queries[name], oracles[name], keyts_sf
    )
    assert r.ok, (
        f"{name} diverges on NULL-key x extreme-ts input: "
        f"rows={r.rows_match} schema={r.schema_match} "
        f"hash={r.hash_match}\n{r.detail}"
    )


def test_null_user_window_keeps_only_in_domain(spark, registry, keyts_sf):
    """The planted hour (base data is 2024-01, so it is ours alone)
    holds exactly the four in-domain events — 2 NULL-user + 2 from
    user 601; the pre-epoch, post-ceiling, and NULL-ts rows are
    excluded and NULL-key bucketing resurrects nothing."""
    import pyspark.sql.functions as F

    queries, _ = registry
    rows = (
        queries["q_win_tumble"](spark, keyts_sf)
        .where(F.col("win_start") == "2024-03-03 10:00:00")
        .collect()
    )
    assert len(rows) == 1 and rows[0]["n_events"] == 4, rows


# ---------------------------------------------------------------- 3
@pytest.fixture(scope="module")
def unidup_sf(tmp_path_factory):
    sf = _copy_sf(tmp_path_factory, "degen_unidup")
    # Duplicate doc_ids whose rows are UNICODE variants: the entity's
    # shingle set is the distinct union over rows (law 25), and the
    # fold is [A-Z]-only translate (law 13) — so straße/STRASSE fold
    # to straße/strasse (distinct tokens, identically on both
    # engines), NBSP (U+00A0) stays inside a token, and the 4-byte
    # emoji pair tests char-vs-byte length surfaces.
    _rewrite(sf, "documents", """
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
          (980003, 'mixed ẞ and ß case pair token stream here', 'de',
           'degen-uni', 41),
          (980010, '🎉 party time with cake and music and friends fun',
           'en', 'degen-uni', 49),
          (980011, '🎂 party time with cake and music and friends fun',
           'en', 'degen-uni', 49),
          -- NULL doc_id with REAL near-dup text: the entity-id NULL
          -- group flows through shingle joins, dedup windows, and
          -- tie-break ORDER BYs (r7 F.asc-site audit)
          (NULL, 'the straße fuß walk was long today also', 'de',
           'degen-uni', 40),
          -- NULL n_chars (law 45, composed-dir config sweep): a
          -- length histogram cannot bin an unknown length — the NULL
          -- bin lands FIRST in Spark's cumulative window and LAST in
          -- DuckDB's (law 2/40), shifting every quantile crossing
          (980020, 'length unknown for this probe row', 'en',
           'degen-uni', NULL)
        ) v(doc_id, text, lang, source, n_chars)""")
    # Duplicate vec_ids where the second copy fails the participation
    # contract (NaN element / NULL embedding): every oracle stage must
    # join the GATED set — q_sim_ann_multi's scoring joins hit the raw
    # table and let the NaN copy ride into the top-3 (r7 sf0.1 sweep).
    _rewrite(sf, "embeddings", """
        SELECT * FROM (VALUES
          (930001::BIGINT, [ 'NaN'::FLOAT, 1.0, 0.5, 0.25 ]
               || list_transform(range(60), x -> 0.0::FLOAT), 1::INT),
          (930001, [ 0.6::FLOAT, 0.8 ]
               || list_transform(range(62), x -> 0.0::FLOAT), 1),
          (930003, NULL, NULL),
          (930003, [ 0.0::FLOAT, -1.0 ]
               || list_transform(range(62), x -> 0.0::FLOAT), 2),
          -- NULL vec_id with a FINITE embedding: passes emb_finite,
          -- flows through LSH buckets as a potential neighbor (the
          -- entity-id NULL group; r7 F.asc-site audit)
          (NULL, [ 0.8::FLOAT, 0.6 ]
               || list_transform(range(62), x -> 0.0::FLOAT), 3)
        ) v(vec_id, embedding, label)""")
    yield sf


@pytest.fixture(scope="module")
def unidup_duck(unidup_sf):
    con = make_duckdb(unidup_sf)
    yield con
    con.close()


UNIDUP_CHECKED = [
    # the shingle-entity family (law 25) on unicode-variant dup rows
    "q_dedup_near",
    "q_dedup_cluster",
    "q_dedup_lsh",
    "q_dedup_exact",
    "q_text_decontaminate",
    "q_dedup_prefix",
    # hash/fingerprint surfaces over folded unicode text
    "q_dedup_simhash",
    "q_text_fingerprint",
    "q_text_tfidf",
    "q_text_langid",
    "q_text_tokens",
    "q_vocab_typo",
    # duplicate vec_id whose second copy fails emb_finite: every
    # oracle stage joins the gated set (r7 sf0.1 sweep find)
    "q_sim_ann_multi",
    "q_sim_ann",
    "q_emb_normalize",
    # NULL entity ids (r7 probe): a NULL doc_id is no dedup entity
    # (cluster/canonical walk bases exclude it), and a NULL vec_id is
    # no k-means entity (Spark's ORDER BY LIMIT k elected a NULL-cid
    # centroid under ASC NULLS FIRST; ASSIGN_CTE + Spark gates now
    # require vec_id IS NOT NULL)
    "q_dedup_canonical",
    "q_ml_kmeans_assign",
    "q_ml_kmeans_update",
    "q_ml_kmeans_iter2",
    "q_sim_ivf",
    # NULL n_chars cannot occupy a histogram bin (law 45): both
    # quantile variants filter participation on both engines
    "q_sketch_quantile",
    "q_stream_quantile",
]


@pytest.mark.parametrize("name", UNIDUP_CHECKED)
def test_unidup_parity(spark, unidup_duck, registry, unidup_sf, name):
    queries, oracles = registry
    r = check_parity(
        spark, unidup_duck, name, queries[name], oracles[name], unidup_sf
    )
    assert r.ok, (
        f"{name} diverges on unicode x dup-doc_id input: "
        f"rows={r.rows_match} schema={r.schema_match} "
        f"hash={r.hash_match}\n{r.detail}"
    )


# ---------------------------------------------------------------- 4
@pytest.fixture(scope="module")
def jsonnull_sf(tmp_path_factory):
    """JSON edges x NULL keys x unicode-in-strings: the Jackson-
    strictness scan and the integer-value contract composed with a
    NULL event_type GROUP (both engines' GROUP BY keeps it), a row
    whose user AND ts are NULL, and structural-scan stressors where
    the ',}' / escaped-quote / escaped-backslash sequences sit next
    to multi-byte unicode."""
    sf = _copy_sf(tmp_path_factory, "degen_jsonnull")
    _rewrite(sf, "events", r"""
        SELECT * FROM (VALUES
          -- NULL event_type group: one canonical int, one
          -- trailing-comma doc (excluded by Jackson strictness),
          -- one NULL props
          (955001::BIGINT, TIMESTAMP '2024-03-04 08:00:00', 301::BIGINT,
           NULL, 1.0::DOUBLE, '{"k": 7}'),
          (955002, TIMESTAMP '2024-03-04 08:01:00', 301, NULL, 1.0,
           '{"k": 3,}'),
          (955003, TIMESTAMP '2024-03-04 08:02:00', 301, NULL, 1.0, NULL),
          -- fully NULL-keyed row (user AND ts NULL) carrying JSON
          (955004, NULL::TIMESTAMP, NULL::BIGINT, 'json-nullkeys', 1.0,
           '{"k": 5}'),
          -- unicode stressors on the outside-string structural scan
          (955010, TIMESTAMP '2024-03-04 08:10:00', 302, 'json-uni', 1.0,
           '{"s": "ß,}💥", "k": 9}'),
          (955011, TIMESTAMP '2024-03-04 08:11:00', 302, 'json-uni', 1.0,
           '{"s": "a\"ß", "k": 4}'),
          (955012, TIMESTAMP '2024-03-04 08:12:00', 302, 'json-uni', 1.0,
           '{"s": "a\\", "k": 6}'),
          (955013, TIMESTAMP '2024-03-04 08:13:00', 302, 'json-uni', 1.0,
           '{"t": ["ß","💥"], "k": 2,}')
        ) v(event_id, ts, user_id, event_type, value, props)""")
    yield sf


@pytest.fixture(scope="module")
def jsonnull_duck(jsonnull_sf):
    con = make_duckdb(jsonnull_sf)
    yield con
    con.close()


JSONNULL_CHECKED = [
    "q_json_extract",
    # time/key consumers over the same doctored rows
    "q_win_tumble",
    "q_evt_markov",
    "q_evt_funnel",
    # an ALL-NULL-type user: string_agg over only-NULL chars is NULL
    # where array_join of the skipped list is '' (law 16) — the cep
    # oracles now COALESCE (r7 composed superset find)
    "q_evt_cep",
    "q_stream_cep",
]


@pytest.mark.parametrize("name", JSONNULL_CHECKED)
def test_jsonnull_parity(spark, jsonnull_duck, registry, jsonnull_sf, name):
    queries, oracles = registry
    r = check_parity(
        spark, jsonnull_duck, name, queries[name], oracles[name], jsonnull_sf
    )
    assert r.ok, (
        f"{name} diverges on JSON x NULL-key x unicode input: "
        f"rows={r.rows_match} schema={r.schema_match} "
        f"hash={r.hash_match}\n{r.detail}"
    )


def test_json_composed_groups(spark, registry, jsonnull_sf):
    """Value-contract arithmetic on the composed groups: the NULL
    event_type group counts only its canonical int (7; the trailing
    comma and NULL props contribute NULL), the unicode group counts
    9+4+6 (the ',}' lives INSIDE strings / behind escapes) and
    excludes the genuine trailing-comma doc (2), and the
    NULL-user+NULL-ts row still reaches its group."""
    import pyspark.sql.functions as F

    queries, _ = registry
    rows = {
        r["event_type"]: r
        for r in queries["q_json_extract"](spark, jsonnull_sf).collect()
    }
    assert rows[None]["sum_k"] == 7 and rows[None]["n_events"] == 3, rows[None]
    uni = rows["json-uni"]
    assert uni["sum_k"] == 19 and uni["n_events"] == 4, uni
    nk = rows["json-nullkeys"]
    assert nk["sum_k"] == 5 and nk["n_events"] == 1, nk


# ---------------------------------------------------------------- 5
@pytest.fixture(scope="module")
def lakenn_sf(tmp_path_factory):
    """Lakehouse merge family x {dup custkey, NULL segment, NaN/inf
    balances} in ONE customer table: the r6 tpch sweep stated the
    partition-scoped merge contract (law 8), presence markers (11),
    and the Hive NULL-partition marker (12) on separate rows; here a
    single custkey spans a touched segment AND the NULL partition, a
    NULL-keyed row carries NaN in a touched segment, and an infinite
    balance rides the copy-on-write passthrough."""
    sf = _copy_sf(tmp_path_factory, "degen_lakenn")
    _rewrite(sf, "customer", """
        SELECT * FROM (VALUES
          (930101::BIGINT, 'dup-null-seg', 1::INT, 'NaN'::DOUBLE,
           NULL::VARCHAR),
          (930101, 'dup-touched-seg', 1, 55.5::DOUBLE, 'BUILDING'),
          (NULL, 'null-key-nan', 2, 'NaN'::DOUBLE, 'BUILDING'),
          (930102, 'all-null', 3, NULL, NULL),
          (930103, 'inf-touched', 4, 'Infinity'::DOUBLE, 'AUTOMOBILE'),
          (930104, 'neginf-null-seg', 5, '-Infinity'::DOUBLE, NULL)
        ) v(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)""")
    yield sf


@pytest.fixture(scope="module")
def lakenn_duck(lakenn_sf):
    con = make_duckdb(lakenn_sf)
    yield con
    con.close()


LAKENN_CHECKED = [
    # copy-on-write merge / delete / compact / time travel / incremental
    "q_merge_cow",
    "q_lake_delete",
    "q_lake_compact",
    "q_lake_time_travel",
    "q_lake_incremental",
    # relational merge + CDC twins
    "q_merge_upsert",
    "q_cdc_diff",
    # the streaming CDC merge drive
    "q_stream_upsert",
]


@pytest.mark.parametrize("name", LAKENN_CHECKED)
def test_lakenn_parity(spark, lakenn_duck, registry, lakenn_sf, name):
    queries, oracles = registry
    r = check_parity(
        spark, lakenn_duck, name, queries[name], oracles[name], lakenn_sf
    )
    assert r.ok, (
        f"{name} diverges on dup-key x NULL-segment x NaN input: "
        f"rows={r.rows_match} schema={r.schema_match} "
        f"hash={r.hash_match}\n{r.detail}"
    )


# ---------------------------------------------------------------- 6
@pytest.fixture(scope="module")
def r8deep_sf(tmp_path_factory):
    """r8's deeper axis (r7 verdict task 6) — the two classes the
    sf0.1 composed superset found, pinned at pytest scale:

    (41) **as-of NULL-on probes**: DuckDB's native ASOF JOIN sorts a
    NULL-ts probe past every candidate and "matches" the user's LAST
    click; SQL comparison semantics (and operators/asof.py) say a NULL
    ts asserts no temporal relation — the oracle must SPLIT NULL-ts
    probes out (NULL payload) and filter NULL-key/NULL-ts right rows
    explicitly. Latent until a NULL-ts purchase lands on a user who
    HAS clicks (NULL-key users masked it via the equi-join).

    (42) **law 2/40 on sampling RANK keys**: md5(NULL doc_id) is NULL,
    so Spark's ASC NULLS FIRST ranked the NULL-id doc first (always
    kept) where DuckDB's NULLS LAST ranked it past the quota cut —
    latent until the quota boundary moves into the partition carrying
    the NULL-id row. asc_nulls_last on BOTH rank keys, both engines.

    Also rides: ±Infinity measures on NULL-user/NULL-ts/out-of-domain
    rows, an only-{+inf,-inf} user, and strata keys (source) going
    NULL/unicode/empty-string with a dup doc_id crossing strata."""
    sf = _copy_sf(tmp_path_factory, "degen_r8deep")
    _rewrite(sf, "events", """
        SELECT * FROM (VALUES
          -- law 41: NULL-ts purchase for a user WITH clicks; NULL-ts
          -- and NULL-user clicks as right-side probes; a valid
          -- purchase so the right rows are genuinely at risk
          (947001::BIGINT, NULL::TIMESTAMP, 76501::BIGINT, 'purchase',
           1.0::DOUBLE, NULL),
          (947002, TIMESTAMP '2024-03-03 08:00:00', 76501, 'click',
           2.0::DOUBLE, NULL),
          (947003, NULL::TIMESTAMP, 76501, 'click', 2.5::DOUBLE, NULL),
          (947004, TIMESTAMP '2024-03-03 08:30:00', NULL::BIGINT, 'click',
           3.0::DOUBLE, NULL),
          (947005, TIMESTAMP '2024-03-03 09:00:00', 76501, 'purchase',
           4.0::DOUBLE, NULL),
          -- ±inf composed with NULL user / NULL ts; only-±inf user
          (947006, TIMESTAMP '2024-03-03 09:10:00', NULL::BIGINT, 'view',
           'Infinity'::DOUBLE, NULL),
          (947007, NULL::TIMESTAMP, 76502::BIGINT, 'purchase',
           '-Infinity'::DOUBLE, NULL),
          (947008, TIMESTAMP '2024-03-03 09:20:00', 76503, 'view',
           'Infinity'::DOUBLE, NULL),
          (947009, TIMESTAMP '2024-03-03 09:21:00', 76503, 'view',
           '-Infinity'::DOUBLE, NULL)
        ) v(event_id, ts, user_id, event_type, value, props)""")
    _rewrite(sf, "orders", """
        SELECT * FROM (VALUES
          -- law 40's r8 fuzz find (seed 777 trial 9, minimized): a
          -- NULL o_orderkey TYING a real order on (custkey, date).
          -- Every window whose ORDER BY tie-break is the orderkey
          -- (running sum, lag/lead, first/last, top-k limit) forks
          -- NULLS FIRST (Spark bare ASC) vs NULLS LAST (DuckDB)
          -- without the asc_nulls_last pin.
          (948001::BIGINT, 76504::BIGINT, 'O', 10.0::DOUBLE,
           TIMESTAMP '1996-02-01', '1-URGENT'),
          (NULL::BIGINT, 76504, 'O', 33.25::DOUBLE,
           TIMESTAMP '1996-02-01', '2-HIGH'),
          (948002, 76504, 'O', 'NaN'::DOUBLE,
           TIMESTAMP '1996-02-02', '3-MEDIUM')
        ) v(o_orderkey, o_custkey, o_orderstatus, o_totalprice,
            o_orderdate, o_orderpriority)""")
    _rewrite(sf, "documents", """
        SELECT * FROM (VALUES
          -- law 42: NULL doc_id inside a real source partition
          (NULL::BIGINT, 'rank key null id token stream alpha', 'en',
           'degen-rank', 34::BIGINT),
          (984001, 'rank key real id token stream beta', 'en',
           'degen-rank', 33),
          (984002, 'rank key real id token stream gamma', 'en',
           'degen-rank', 34),
          -- strata keys degenerate: NULL / unicode / empty-string
          -- source; dup doc_id crossing strata
          (984003, 'strata token stream one', 'en', NULL::VARCHAR, 23),
          (984004, 'strata token stream two', 'en', 'srç-ünï', 23),
          (984005, 'strata token stream tri', 'en', 'srç-ünï', 23),
          (984005, 'strata token stream tri', 'de', NULL, 23),
          (984006, 'strata token stream for', 'en', '', 23)
        ) v(doc_id, text, lang, source, n_chars)""")
    yield sf


@pytest.fixture(scope="module")
def r8deep_duck(r8deep_sf):
    con = make_duckdb(r8deep_sf)
    yield con
    con.close()


R8DEEP_CHECKED = [
    # law 41: all three as-of variants (tol previously passed by LUCK
    # — date_diff over NULL pts nulled its CASE; now explicit)
    "q_join_asof",
    "q_join_asof_fwd",
    "q_join_asof_tol",
    # law 42 + degenerate strata keys
    "q_sample_mixture",
    "q_sample_stratified",
    "q_sample_hash",
    # ±inf composed with NULL keys/ts: group + window + stream shapes
    "q_agg_stats",
    "q_win_running",
    "q_evt_histogram",
    "q_rollup_time",
    "q_stream_dedup",
    # law 40's fuzz find: NULL orderkey tying on (custkey, date) —
    # every orderkey-tie-break window/limit shape (r8 pin sweep)
    "q_win_lag",
    "q_win_first_last",
    "q_topk_group",
    "q_sort_limit",
    "q_tpch_q3",
    "q_tpch_q10",
]


@pytest.mark.parametrize("name", R8DEEP_CHECKED)
def test_r8deep_parity(spark, r8deep_duck, registry, r8deep_sf, name):
    queries, oracles = registry
    r = check_parity(
        spark, r8deep_duck, name, queries[name], oracles[name], r8deep_sf
    )
    assert r.ok, (
        f"{name} diverges on the r8 deep-composed input: "
        f"rows={r.rows_match} schema={r.schema_match} "
        f"hash={r.hash_match}\n{r.detail}"
    )


def test_asof_null_on_probe_unmatched(spark, registry, r8deep_sf):
    """Law 41 stated directly: the NULL-ts purchase of a user who HAS
    clicks gets NULL payload in all three as-of variants."""
    queries, _ = registry
    for name in ("q_join_asof", "q_join_asof_fwd", "q_join_asof_tol"):
        rows = {
            r.event_id: (r.click_id, r.click_value)
            for r in queries[name](spark, r8deep_sf).collect()
        }
        assert rows[947001] == (None, None), (name, rows[947001])
        # and the valid purchase still matches the valid click in the
        # backward direction (the NULL right rows didn't eat the match)
        if name == "q_join_asof":
            assert rows[947005] == (947002, 2.0), rows[947005]


def test_mixture_null_id_ranks_last(spark, registry, r8deep_sf):
    """Law 42 stated directly: if the NULL-id doc's source survives
    sampling at all, the NULL-id row is only kept when the whole
    partition is (it ranks LAST on both engines)."""
    queries, _ = registry
    out = queries["q_sample_mixture"](spark, r8deep_sf).collect()
    kept = [r.doc_id for r in out if r.source == "degen-rank"]
    if None in kept:
        assert {984001, 984002} <= set(kept), kept
