"""Query registry — the SURVEY.md §2 contract, in code.

Every hash-checked operator registers here twice: a PySpark callable
``(spark, sf_dir) -> DataFrame`` and a DuckDB-runnable ANSI SQL oracle
string. Rows-only operators register the callable without an oracle.

Determinism discipline (SURVEY.md §2 rules, enforced by convention in
every query module):

1. Float aggregates go through DECIMAL(30,6) (exact, order-independent
   summation) then back to DOUBLE and ROUND(...,4) on BOTH engines —
   this removes sum-order drift entirely instead of hoping rounding
   hides it.
2. Parquet ms/ns timestamps: cast to DATE (orders/lineitem) or
   second-truncate (events) in any returned column — and any returned
   event-time column crosses the client boundary as TIMESTAMP_NTZ
   (``client_ntz``, law 47: the instant-typed PySpark collect
   materializes PROCESS-LOCAL wall time, so a non-UTC driver box
   would shift every timestamp; NTZ converts through UTC explicitly
   and matches the oracle's naive TIMESTAMP semantics exactly).
3. UTC everywhere (session.py).
4. Every LIMIT / top-k carries a total order with a unique tie-break.
5. No approx_* in hash queries.
6. POSIX-basic regexes only (Java regex ∩ RE2).
7. ANSI mode stays on.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

_COLLECTED = False


def register(name: str, oracle: str | None = None):
    """Decorator: register a query (and optionally its DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# Query modules, in REGISTRATION-PRIORITY order, not §-numeric order.
# The driver's correctness run records the first 50 registration-ordered
# queries only, so each round rotates the front of this list to the
# queries that most need a driver-recorded row (the round-3 judge
# explicitly ordered this rotation; this list is the CANONICAL rotation
# plan — module docstrings defer here).
#
# Round-13 window (executes the round-12 verdict task 3 — the r13 plan
# exactly as prepped in the r12 registry comment, PLUS the one-off
# 3-query annex the r12 verdict prescribed):
#   ANNEX(3: q_win_range_frame, q_dedup_canonical, q_dedup_lsh — the
#   r12 optimization round's riskiest rewrites, whose home modules
#   (windows, llm) would otherwise wait for r14; forward-declared in
#   collect() via _ANNEX_R13 so dict insertion order fronts them while
#   the home modules' later @register overwrites the VALUES in place) +
#   aggs(14, re-confirming the 4 that close the r12 window) +
#   approx_cd(1) + setops(4) + sketches(4) + coverage(10) +
#   corpus(first 14) = 50 exactly — refreshing the r9-era aggs-tail/
#   approx_cd/setops/sketches/coverage rows. The annex displaces the
#   originally planned corpus 15th + streams(first 2), all three of
#   which have r10-era rows and are fronted in the r14 plan below.
#   The annex is ONE-OFF: the r14 rotation deletes _ANNEX_R13.
#
# Round-14 plan (prepped now, oldest-first per the rotation law):
#   corpus(15, re-confirming the 14 that close the r13 window) +
#   streams(10) + events(9) + udf(4) + streaming_ext(1) +
#   lakehouse(5) + windows(first 6) = 50 exactly — refreshing every
#   r10-era row (corpus tail / streams / events / udf / streaming_ext
#   / lakehouse), with windows(head) starting the r11 re-sweep.
#
# ROTATION LAW (steady state from r9 on): every registered query gets
#   a driver-recorded hash row at most TWO testdata generations old.
#   The window always fronts (a) any query with zero driver evidence,
#   then (b) the modules whose last driver row is oldest, padded to 50
#   with re-confirms from the previous window's tail so adjacent
#   windows overlap and a regression introduced mid-round is caught by
#   the next driver run. After r9-close every query's newest driver
#   row is ≤2 generations old and the rotation simply cycles
#   oldest-first.
#
# Executed history: r6 window = sketches(4) + coverage(10) +
#   corpus(15) + streams(10) + events(9) + udf(first 2), 48/48 hash
#   in CORRECTNESS_r06.json; r7 window = udf(4) + streaming_ext(1) +
#   lakehouse(5) + windows(9) + relational(9) + scalars(9) + ml(4) +
#   approx_cd(1, fronted per r6 verdict) + llm(first 8), 48/48 hash
#   in CORRECTNESS_r07.json — with which EVERY declared hash query
#   has at least one driver-recorded green row (163/163 cumulative);
#   r8 window = llm(13) + textops(16) + training(6) + quality(2) +
#   scans(6) + filters(3) + joins(first 4), 50/50 hash with zero err
#   in CORRECTNESS_r08.json; r9 window = joins(13) + aggs(14) +
#   approx_cd(1) + setops(4) + sketches(4) + coverage(10) +
#   corpus(first 4), 49/49 hash + q_emb_pca rows-tier clean in
#   CORRECTNESS_r09.json; r10 window = corpus(15) + streams(10) +
#   events(9) + udf(4) + streaming_ext(1) + lakehouse(5) +
#   windows(first 6), 49/49 hash + q_kmeans_stream_reassign rows-tier
#   clean in CORRECTNESS_r10.json; r11 window = windows(9) +
#   relational(9) + scalars(9) + ml(4) + llm(13) + textops(first 6),
#   48/48 hash + q_ml_kmeans_iter and q_kmeans_stream rows-tier clean
#   in CORRECTNESS_r11.json. The rotation law above is pinned
#   mechanically in tests/test_rotation_law.py against the committed
#   CORRECTNESS_r0*.json set.
#
# NEVER add queries to modules inside the current window prefix
# mid-round (it would shift the window and orphan tail queries); new
# queries go in post-window modules (streaming_ext demonstrated this
# in round 6). Order changes registration sequence only — no query
# semantics depend on it (verified by the full preflight sweep each
# round).
_MODULES = [
    "aggs",
    "approx_cd",  # stays ordered with aggs (r9 window pairing).
    "setops",
    "sketches",
    "coverage",
    "corpus",  # first 14 complete the r13 window (annex takes 3 slots).
    "streams",
    "events",
    "udf",
    "streaming_ext",
    "lakehouse",
    "windows",
    "relational",
    "scalars",
    "ml",
    "llm",
    "textops",
    "training",
    "quality",
    "scans",
    "filters",
    "joins",
]

# r13 one-off window annex (r12 verdict task 3): the r12 round's
# riskiest rewrites get their driver hash row THIS round instead of
# waiting for their home modules' r14 slot. collect() registers these
# names FIRST with lazy delegates; dict insertion order is fixed by
# the first insertion, and the home modules' later @register calls
# overwrite the VALUES (and supply the oracles) in place — so the
# driver's first-50 window carries the real implementations, fronted.
# DELETE this tuple (and its collect() hook) at the r14 rotation.
_ANNEX_R13 = ("q_win_range_frame", "q_dedup_canonical", "q_dedup_lsh")

# The NEXT round's plan in executable form (r11 on): the prose
# "Round-12 plan" above, as the module order the next session will
# rotate to. tests/test_rotation_law.py SIMULATES the next round
# against this list — it synthesizes the upcoming driver record from
# the current front-50 and asserts the prepped order still satisfies
# every law clause, so a bad prep fails the round BEFORE it bites
# instead of during the next session's task 1. Rotating a round =
# _MODULES ← _NEXT_MODULES, then prep the new _NEXT_MODULES.
_NEXT_MODULES = [
    "corpus",
    "streams",
    "events",
    "udf",
    "streaming_ext",
    "lakehouse",
    "windows",  # first 6 complete the r14 window; tail 3 lead r15.
    "relational",
    "scalars",
    "ml",
    "llm",
    "textops",
    "training",
    "quality",
    "scans",
    "filters",
    "joins",
    "aggs",
    "approx_cd",
    "setops",
    "sketches",
    "coverage",
]


def _register_annex() -> None:
    """Forward-declare the _ANNEX_R13 names ahead of the module loop
    (see the tuple's comment). Idempotent: skips names already
    registered (e.g. a test imported a home module before collect()),
    so the annex can never shadow a real implementation — only claim
    an early dict slot that the home module's @register then fills."""

    def fwd(name: str) -> QueryFn:
        def placeholder(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Unreachable after collect(): every home module's import
            # overwrites this entry with the real implementation. If a
            # caller somehow runs it, fail loudly rather than recurse.
            raise RuntimeError(
                f"annex placeholder for {name} was never overwritten — "
                "its home module did not register it"
            )

        return placeholder

    for name in _ANNEX_R13:
        if name not in QUERIES:
            QUERIES[name] = fwd(name)


def collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Import all query modules (idempotent) and return the registry.

    A module that is missing from the tree is skipped (so a partially
    built tree still registers everything that exists); any OTHER import
    error propagates — a broken module must never be silently dropped.
    """
    global _COLLECTED
    if not _COLLECTED:
        import importlib

        _register_annex()
        for mod in _MODULES:
            fq = f"{__package__}.{mod}"
            try:
                importlib.import_module(fq)
            except ModuleNotFoundError as e:
                if e.name != fq:  # missing *dependency*, not missing module
                    raise
        _COLLECTED = True
    return QUERIES, ORACLE
