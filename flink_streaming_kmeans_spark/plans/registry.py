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
# explicitly ordered this rotation; the round-4 verdict task 1 dictates
# this round's exact window). Round-5 window (50 slots):
#   training(6): the round-4 additions that were parked AFTER the
#     window and so have zero driver evidence;
#   quality(2): the twice-driver-red q_text_quality (rewritten to emit
#     BIGINT quality_e4 — plans/quality.py) + the new hash-tier
#     q_ml_kmeans_iter2 (verdict task 7);
#   scans(6) + filters(3) + joins(13) + aggs(15) + setops(4): the 41
#     r2-only queries whose green rows predate two testdata
#     regenerations — the oldest evidence in the ledger;
#   events(first 1): q_json_extract takes the last slot (D3-stale).
# Order changes registration sequence only — no query semantics depend
# on it (verified by the full preflight sweep each round).
_MODULES = [
    "training",
    "quality",
    "scans",
    "filters",
    "joins",
    "aggs",
    "setops",
    "events",
    "streams",  # r5 streaming-evidence additions — OUT of the r5
    #   window (it was verdict-dictated and full); the r6 rotation
    #   plan (kept current in plans/corpus.py) puts them first next
    #   round.
    "corpus",  # r5 corpus/storage-layout additions — OUT of the r5
    #   window; covered by the same r6 rotation plan.
    "sketches",  # r5 hash-verifiable sketch trio — OUT of the r5
    #   window; the superseding r6 rotation plan lives in
    #   plans/sketches.py's docstring.
    "coverage",  # r5 late coverage additions (ORC, forward as-of,
    #   PCA evidence) — same r6 plan.
    "udf",
    "lakehouse",
    "windows",
    "relational",
    "scalars",
    "ml",
    "llm",
    "textops",
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
