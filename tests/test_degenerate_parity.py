"""Degenerate-regime parity for the review-r6 divergence fixes.

The r5 adversarial program's lesson (SURVEY §5.2.2): oracle parity on
the generated fixture data is NOT sufficient — the generated corpus is
unit-normalized and letter-bearing, so a zero embedding vector or a
zero-letter document never reaches the two division sites that the r6
review found diverging (Spark x/0 → NULL vs DuckDB 0.0/0 → NaN, which
DuckDB orders above every float and crashes on BIGINT casts). These
tests build synthetic parquet tables that contain exactly those rows
and run the driver-shaped rows/schema/hash comparator on them, so the
fixes (norm_raw > 0 filter, NULLIF/when guards) stay pinned.

Also pinned here: q_pipeline_clean's PAIRWISE drop rule on a
transitive near-dup component (review r6 finding #9 — the docstring
now promises {1,2} survive where the component rule would keep {1};
a behavior assert guards against both engines silently agreeing on
the wrong rule), and the ngram_rows refactor's single-token /
empty-text edges for q_text_repetition and q_text_ngram_freq.
"""

from __future__ import annotations

import os
import shutil

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

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"
EMB_SCHEMA = "vec_id bigint, embedding array<float>, label int"
EVT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)


def _doc(i, text, lang="en", source="degen"):
    return (i, text, lang, source, len(text))


def _write_table(spark, sf, name, rows, schema):
    from flink_streaming_kmeans_spark.sources.loader import local_df

    stage = os.path.join(sf, f"_stage_{name}")
    local_df(spark, rows, schema).coalesce(1).write.mode("overwrite").parquet(stage)
    f = next(x for x in sorted(os.listdir(stage)) if x.endswith(".parquet"))
    dest = os.path.join(sf, f"{name}.parquet")
    if os.path.exists(dest):
        os.remove(dest)
    shutil.move(os.path.join(stage, f), dest)
    shutil.rmtree(stage)


# 40 distinct tokens; docs 1/2/3 form the transitive component the
# pipeline docstring describes: d1 replaces the LAST three tokens, d2
# the FIRST three, so vs hub d3 each shares trigrams {i: 0..34} resp.
# {3..37} (35 of 38 → J = 35/41 ≈ 0.854 ≥ 0.8) while d1-vs-d2 share
# only {3..34} (32 → J = 32/44 ≈ 0.727 < 0.8). The pair rule drops
# only {3} and keeps {1, 2}; the component rule would keep {1} alone.
_BASE = [f"w{i:02d}" for i in range(40)]
_D1 = " ".join(_BASE[:-3] + ["endA", "endB", "endC"])
_D2 = " ".join(["startA", "startB", "startC"] + _BASE[3:])
_D3 = " ".join(_BASE)


@pytest.fixture(scope="module")
def degen_sf(spark, tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("degen_sf"))
    for t in TABLES:
        df = spark.read.parquet(os.path.join(SF_SMOKE, f"{t}.parquet"))
        stage = os.path.join(sf, f"_stage_{t}")
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(stage)
        f = next(x for x in sorted(os.listdir(stage)) if x.endswith(".parquet"))
        shutil.move(os.path.join(stage, f), os.path.join(sf, f"{t}.parquet"))
        shutil.rmtree(stage)
    docs = [
        _doc(1, _D1),
        _doc(2, _D2),
        _doc(3, _D3),
        _doc(4, ""),  # empty text: zero letters, one "" token
        _doc(5, "   "),  # space-only: zero letters, several "" tokens
        _doc(6, "solo"),  # single token: no bigram, no trigram
        _doc(7, "bcd fgh jkl mnp qrs"),  # consonants only: vowel_ratio 0
        _doc(8, "aeiou aeiou aeiou"),  # repeated token: top_frac 1.0
        _doc(9, "uno dos tres quatro cinco", lang="es"),
        # NULL-row regime (r6 adversarial sweep — found 3 real bugs:
        # NULL-hash rank order in q_sample_stratified, ANSI cast crash
        # in q_sample_mixture's source weights, bytes(None) crash in
        # q_multimodal_binary's decode):
        (9001, None, "en", "degen", None),  # NULL text + n_chars
        _doc(9002, "a normal short doc", lang=None),  # NULL stratum
        (9003, "another doc with null n_chars", "en", "degen", None),
    ]
    _write_table(spark, sf, "documents", docs, DOC_SCHEMA)
    dim = 64
    zero = [0.0] * dim
    e1 = [1.0] + [0.0] * (dim - 1)
    e2 = [0.6, 0.8] + [0.0] * (dim - 2)
    e3 = [0.0, -1.0] + [0.0] * (dim - 2)
    embs = [
        (1, zero, 0),
        (2, e1, 1),
        (3, e2, 1),
        (4, e3, 2),
        # NULL embedding: excluded from every vector op on both
        # engines (r6 sweep — it crashed PCA's np.vstack and made a
        # NULL-element centroid list that killed the DuckDB oracle's
        # list_inner_product in q_ml_kmeans_iter2).
        (5, None, None),
    ]
    _write_table(spark, sf, "embeddings", embs, EMB_SCHEMA)
    # Events spanning 3 five-minute buckets PLUS one NULL-ts row: an
    # event without an event time cannot be windowed by a watermarked
    # stream, so q_stream_slide's oracle now filters it explicitly
    # (review r6) — this table is what makes that contract testable.
    from datetime import datetime

    t0 = datetime(2024, 3, 1, 12, 0, 0)
    evts = [
        (1, t0, 10, "view", 1.5, "{}"),
        (2, t0.replace(minute=6), 11, "click", 2.5, "{}"),
        (3, t0.replace(minute=13), 10, "click", 4.0, "{}"),
        (4, None, 12, "click", 8.0, "{}"),  # NULL ts: un-windowable
        (5, t0.replace(minute=20), None, "view", 1.0, "{}"),  # NULL user
        (6, t0.replace(minute=25), 10, None, None, None),  # NULL type/value
        (7, t0.replace(minute=40), 10, "purchase", 9.0, "{}"),
        # NULL-user PURCHASE (r7 ADVICE): an unmatched LEFT row whose
        # join key is NULL — the batch LEFT join keeps it (NULL c_id),
        # so q_stream_join_left's sentinel filter must not eat it.
        (8, t0.replace(minute=45), None, "purchase", 3.0, "{}"),
    ]
    _write_table(spark, sf, "events", evts, EVT_SCHEMA)
    # Orders with a NULL o_orderdate (and NULL price/custkey): the
    # r6 NULL-relational sweep caught Spark's ASC NULLS FIRST vs
    # DuckDB's NULLS LAST shifting every lag/running/first-last chain
    # in that customer's window partition.
    ord_schema = (
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    )
    t0o = datetime(1995, 6, 1)
    orders = [
        (1, 7, "O", 100.25, t0o, "1-URGENT"),
        (2, 7, "F", 250.5, t0o.replace(day=3), "2-HIGH"),
        (3, 7, "O", 75.0, None, "3-MEDIUM"),  # NULL date: orders last
        (4, None, "O", None, t0o.replace(day=5), None),  # NULL cust/price
        (5, 8, "F", 10.0, t0o.replace(day=2), "1-URGENT"),
        # Extreme-value regime (r6 sweep): a price past the 1e12 mround
        # guard and one just below it — the running-sum chain crosses
        # both the guard boundary and the 2^53 scaled-integer ceiling
        # where direct decimal<->double casts diverge between engines
        # (the string-route dec2dbl/dbl2dec fix this pins).
        (6, 8, "O", 2.5e12, t0o.replace(day=4), "2-HIGH"),
        (7, 8, "F", 999999999999.1234, t0o.replace(day=6), "5-LOW"),
    ]
    _write_table(spark, sf, "orders", orders, ord_schema)
    yield sf


@pytest.fixture(scope="module")
def degen_duck(degen_sf):
    con = make_duckdb(degen_sf)
    yield con
    con.close()


DEGEN_CHECKED = [
    "q_emb_normalize",  # zero vector: dropped by norm_raw > 0 on BOTH engines
    "q_text_langid",  # zero letters: NULL vowel_ratio (not NaN) on BOTH engines
    "q_text_repetition",  # ngram_rows refactor: single-token + empty docs
    "q_text_ngram_freq",  # ngram_rows refactor: corpus with no/short docs
    "q_pipeline_clean",  # transitive component through the full pipeline
    "q_dedup_near",  # shingle_rows→ngram_rows: the exact-pair oracle
    "q_stream_slide",  # NULL-ts row: dropped by BOTH engines by contract
    "q_sample_stratified",  # NULL text/lang: NULLS LAST rank pin
    "q_sample_mixture",  # non-numeric source name: try_cast weight
    "q_multimodal_binary",  # NULL blob: NULL features, no crash
    "q_curriculum_order",  # NULL band/hash: NULLS LAST offset pin
    "q_text_quality",  # NULL text through the quality featurizer
    # NULL-events regime (r6 sweep — found 6 divergences: F.window
    # drops NULL ts while bare GROUP BY keeps it, NULLS FIRST/LAST
    # rank splits in scd2/markov, a sentinel filter eating NULL-user
    # sessions, int(NaN)/skipped-NULL-char crashes in the CEP fold):
    "q_win_tumble",
    "q_win_session",
    "q_scd2_intervals",
    "q_evt_markov",
    "q_stream_session",  # streaming twin incl. NULL-user session
    "q_stream_join_left",  # NULL-user purchase survives the sentinel filter (r7)
    "q_stream_cep",  # NFA fold over NULL user/event_type
    # NULL-relational regime (NULL o_orderdate in the window order):
    "q_win_lag",
    "q_win_running",
    "q_win_first_last",
    # NULL-embedding regime (vector-op contract: filtered both sides):
    "q_ml_kmeans_assign",
    "q_ml_kmeans_iter2",
    "q_sim_ivf",
    "q_emb_quantize",
]


@pytest.mark.parametrize("name", DEGEN_CHECKED)
def test_degenerate_parity(spark, degen_duck, registry, degen_sf, name):
    queries, oracles = registry
    r = check_parity(
        spark, degen_duck, name, queries[name], oracles[name], degen_sf
    )
    assert r.ok, (
        f"{name} diverges on degenerate input: rows={r.rows_match} "
        f"schema={r.schema_match} hash={r.hash_match}\n{r.detail}"
    )


def test_emb_normalize_drops_only_zero_vector(spark, registry, degen_sf):
    queries, _ = registry
    got = {r.vec_id for r in queries["q_emb_normalize"](spark, degen_sf).collect()}
    assert got == {2, 3, 4}, got


def test_langid_zero_letters_falls_through(spark, registry, degen_sf):
    """NULL vowel_ratio must fall through the CASE (never 'es', which is
    what DuckDB's NaN-above-everything ordering produced pre-fix)."""
    queries, _ = registry
    rows = {r.doc_id: r for r in queries["q_text_langid"](spark, degen_sf).collect()}
    for d in (4, 5):
        assert rows[d].vowel_ratio is None, rows[d]
        assert rows[d].pred_lang != "es", rows[d]


def test_stream_slide_drops_null_ts_row(spark, registry, degen_sf):
    """The NULL-ts event contributes to NO window: 7 windowable events
    (incl. the r7 NULL-user purchase) × 2 overlapping windows each =
    14 window memberships total."""
    queries, _ = registry
    rows = queries["q_stream_slide"](spark, degen_sf).collect()
    assert sum(r.n_events for r in rows) == 14, rows
    assert all(r.win_start is not None for r in rows), rows


def test_pipeline_clean_pairwise_rule_keeps_two(spark, registry, degen_sf):
    """On the {1,2,3} transitive component, the pairwise drop rule
    keeps docs 1 and 2 (only hub doc 3 is ever a doc_id2); doc 8's
    top_frac=1.0 and the short docs fail the filters, so n_kept == 2.
    A component-rule regression would report 1."""
    queries, _ = registry
    rows = {r.source: r for r in queries["q_pipeline_clean"](spark, degen_sf).collect()}
    assert rows["degen"].n_kept == 2, rows
    assert rows["degen"].total_tokens == 80, rows
