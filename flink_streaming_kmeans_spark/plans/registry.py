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
   second-truncate (events) in any returned column.
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
# Round-7 window (executes the round-6 verdict tasks 1+2 — the written
# r7 plan with q_agg_approx_cd FRONTED in, swapped for one of the nine
# re-confirming llm slots; approx_cd got its own module for exactly
# this, see plans/approx_cd.py):
#   udf(4, re-confirming 2) + streaming_ext(1, the r6 q_stream_slide)
#   + lakehouse(5) + windows(9) + relational(9) + scalars(9) + ml(4)
#   + approx_cd(1) + llm(first 8) = 50 exactly. This gives
#   q_stream_slide, q_lake_compact, and q_agg_approx_cd — the only
#   three hash queries with zero driver rows after r6 — their first
#   driver-recorded evidence.
#
# Round-8 plan: llm(13, re-confirming 8) + textops(16) + training(6)
#   + quality(2) + scans(6) + filters(3) + joins(first 4) = 50, by
#   which point every registered query has a driver row no older than
#   two testdata generations except the joins tail/aggs/setops (all
#   r5-driver-green on current data); round 9 fronts joins(13) +
#   aggs(14) + setops(4) + next-oldest (approx_cd rejoins its aggs
#   window-mates there).
#
# Executed history: r6 window = sketches(4) + coverage(10) +
#   corpus(15) + streams(10) + events(9) + udf(first 2) = 50,
#   driver-confirmed 48/48 hash-green + 2 rows-tier in
#   CORRECTNESS_r06.json.
#
# NEVER add queries to modules inside the current window prefix
# mid-round (it would shift the window and orphan tail queries); new
# queries go in post-window modules (streaming_ext demonstrated this
# in round 6). Order changes registration sequence only — no query
# semantics depend on it (verified by the full preflight sweep each
# round).
_MODULES = [
    "udf",
    "streaming_ext",
    "lakehouse",
    "windows",
    "relational",
    "scalars",
    "ml",
    "approx_cd",  # fronted per r6 verdict task 2 — see module docstring.
    "llm",
    "textops",
    "training",
    "quality",
    "scans",
    "filters",
    "joins",
    "aggs",
    "setops",
    "sketches",
    "coverage",
    "corpus",
    "streams",
    "events",
]


def collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Import all query modules (idempotent) and return the registry.

    A module that is missing from the tree is skipped (so a partially
    built tree still registers everything that exists); any OTHER import
    error propagates — a broken module must never be silently dropped.
    """
    global _COLLECTED
    if not _COLLECTED:
        import importlib

        for mod in _MODULES:
            fq = f"{__package__}.{mod}"
            try:
                importlib.import_module(fq)
            except ModuleNotFoundError as e:
                if e.name != fq:  # missing *dependency*, not missing module
                    raise
        _COLLECTED = True
    return QUERIES, ORACLE
