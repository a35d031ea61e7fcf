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
# explicitly ordered this rotation). Round-4 window (50 slots):
#   relational(9) + scalars(9) + windows(9): the 18 queries no driver
#     round has ever recorded, plus their D2-stale module-mates;
#   ml(4): the flagship k-means trio + the new streaming rows-tier row;
#   llm(13) + textops(first 6): keeps the two r3-red queries
#     (q_emb_normalize pos 42, q_text_quality pos 48) inside the window
#     so their fixes get driver-confirmed.
# Order changes registration sequence only — no query semantics depend
# on it (verified by the full preflight sweep each round).
_MODULES = [
    "relational",
    "scalars",
    "windows",
    "ml",
    "llm",
    "textops",
    "events",
    "udf",
    "lakehouse",
    "scans",
    "filters",
    "joins",
    "aggs",
    "setops",
    "training",  # round-4 additions — MUST stay after the window block
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
