"""Host-environment and data-layout invariance gates (slow lane).

Round-8 continuation: two perturbation axes on top of the completed
config/batch-split matrix — the process ENVIRONMENT under the engines
and the PHYSICAL LAYOUT under the data. Sampled here as permanent
regression gates; the full-registry sweeps are the per-round CLI runs
(tools/env_sweep.py, tools/roworder_sweep.py) recorded in SCALE.md.

1. Environment invariance: the same query must hash-match its
   UTC-canonical oracle result with the JVM default timezone moved to
   America/New_York or Asia/Tokyo and the JVM default locale moved to
   tr-TR (the dotted/dotless-i trap). The engine's UTC session pin
   (session.py) and locale-independent string semantics must hold no
   matter what box the driver lands on.

2. Layout invariance: the same query must produce BITWISE-identical
   canonical results on a row-permuted, re-chunked, multi-file copy of
   the data (tools/make_permuted_dir.py). At 100 TB compaction and
   writer parallelism permute rows constantly; order-dependent results
   are nondeterministic production bugs.

The env cases pick the queries whose semantics touch the perturbed
machinery (timestamp bucketing and parsing for TZ, case mapping for
locale); the layout cases pick one query per order-sensitivity
mechanism (window ranks, object aggs, top-k limits, streaming replay,
lake lifecycle, sampling, multi-file scans).
"""

from __future__ import annotations

import os
import shutil
import sys

import pytest

pytestmark = pytest.mark.slow  # slow lane — see pytest.ini

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from conftest import SF_SMOKE  # noqa: E402
from oracle import _canon_rows, check_parity  # noqa: E402

# (regime, query) — each pair exercises machinery the regime perturbs.
ENV_CASES = [
    # TZ: event-time bucketing, date arithmetic, text-format timestamp
    # round-trips, epoch conversions — every place a forgotten
    # JVM-default lookup (instead of the UTC session conf) would show.
    ("tz_newyork", "q_win_tumble"),  # event-time window bucketing
    ("tz_newyork", "q_date_funcs"),  # date_trunc/date_add/extract soup
    ("tz_newyork", "q_source_csv"),  # CSV timestamp parse round-trip
    ("tz_newyork", "q_rollup_time"),  # multi-grain time rollup
    ("tz_tokyo", "q_win_time_range"),  # range-interval window (east zone)
    ("tz_tokyo", "q_source_jsonl"),  # JSON timestamp parse round-trip
    ("tz_tokyo", "q_ts_gapfill"),  # generated time spine
    ("tz_tokyo", "q_stream_tumble"),  # streaming watermark bucketing
    # Locale: case mapping (tr-TR flips i/I semantics for any code
    # path that forgets Locale.ROOT), plus double stringification.
    ("locale_turkish", "q_str_funcs"),  # upper/lower/initcap
    ("locale_turkish", "q_text_langid"),  # lowercase-normalized n-grams
    ("locale_turkish", "q_text_fingerprint"),  # casefold-then-hash
    ("locale_turkish", "q_str_regexp"),  # case-insensitive-ish classes
    ("tz_locale_cross", "q_evt_funnel"),  # event-time + string states
]


@pytest.mark.parametrize("regime,query", ENV_CASES)
def test_env_invariance(spark, registry, duck_smoke, regime, query):
    import env_sweep

    queries, oracles = registry
    spec = env_sweep.REGIMES[regime]
    with env_sweep.perturb_env(spark, spec["tz"], spec["locale"]):
        # Oracle side stays the pinned-UTC connection: the anchor is
        # the canonical result, so a Spark-side drift under the regime
        # fails parity here; the CLI sweep additionally re-runs DuckDB
        # inside the regime.
        r = check_parity(
            spark, duck_smoke, query, queries[query], oracles[query], SF_SMOKE
        )
    assert r.ok, f"{regime}/{query}: {r.detail}"


# One query per input-order-sensitivity mechanism. perm5 (the
# multi-file directory layout) is the harsher variant — it perturbs
# row order AND file geometry — so the gate pins that one; the CLI
# sweep runs both variants.
LAYOUT_CASES = [
    "q_win_rank",  # window ranks: tie-breaks must be total
    "q_agg_collect",  # object agg: in-list order must be pinned
    "q_agg_string_agg",  # string_agg ordering
    "q_sort_limit",  # global top-k tie-breaks
    "q_topk_group",  # per-group top-k tie-breaks
    "q_stream_session",  # replay batching from permuted source
    "q_stream_cep",  # sequence-order consumer
    "q_lake_compact",  # lake lifecycle rebuilt from permuted source
    "q_sample_hash",  # content-hash sampling, not positional
    "q_scan_parquet",  # multi-file directory scan itself
    "q_dedup_canonical",  # label propagation from permuted edges
    "q_evt_funnel",  # per-user event-sequence order
]


@pytest.fixture(scope="module")
def perm_dir(tmp_path_factory):
    import make_permuted_dir

    d = str(tmp_path_factory.mktemp("perm5"))
    make_permuted_dir.build(SF_SMOKE, d, files=5)
    yield d
    shutil.rmtree(d, ignore_errors=True)


# One pair per shared-session-state mechanism (temp views, streaming
# sink/checkpoint dirs, lakehouse builds, Arrow UDF exchange) — the
# full 163-query 4-thread sweep is the per-round CLI run
# (tools/concurrency_sweep.py) recorded in SCALE.md.
CONCURRENCY_PAIRS = [
    ("q_sub_exists", "q_cte_reuse"),  # both register md5-tagged views
    ("q_stream_tumble", "q_stream_tumble"),  # self-pair: drive infra
    ("q_lake_compact", "q_merge_cow"),  # two lakehouse builds
    ("q_udaf_pandas", "q_udf_pandas"),  # concurrent Arrow exchanges
]


@pytest.mark.parametrize("qa,qb", CONCURRENCY_PAIRS)
def test_concurrent_execution_invariance(spark, registry, duck_smoke, qa, qb):
    """Two queries submitted from two driver threads on the one
    session must BOTH still hash-match their oracles — shared-session
    state (view names, sink dirs, scoped confs) must not bleed
    between concurrent callers (multi-tenant driver contract)."""
    import threading

    queries, oracles = registry
    results = {}

    def run(name, tag):
        try:
            sdf = queries[name](spark, SF_SMOKE)
            results[tag] = _canon_rows(
                list(sdf.columns), [tuple(r) for r in sdf.collect()]
            )[:3]
        except Exception as e:  # surface in the main thread's assert
            results[tag] = ("ERROR", type(e).__name__, str(e)[:200])

    ts = [
        threading.Thread(target=run, args=(q, f"t{i}"))
        for i, q in enumerate((qa, qb))
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    for tag, name in (("t0", qa), ("t1", qb)):
        res = duck_smoke.execute(oracles[name])
        cols = [d[0] for d in res.description]
        want = _canon_rows(cols, res.fetchall())[:3]
        assert results[tag] == want, (name, tag, results[tag][:2])


@pytest.mark.parametrize("query", LAYOUT_CASES)
def test_layout_invariance(spark, registry, perm_dir, query):
    queries, _ = registry
    fn = queries[query]
    base = fn(spark, SF_SMOKE)
    b_canon = _canon_rows(list(base.columns), [tuple(r) for r in base.collect()])
    perm = fn(spark, perm_dir)
    p_canon = _canon_rows(list(perm.columns), [tuple(r) for r in perm.collect()])
    assert p_canon[:3] == b_canon[:3], (
        f"{query}: layout-variant result "
        f"(rows {p_canon[0]}/{b_canon[0]}, hash_eq={p_canon[2] == b_canon[2]})"
    )
