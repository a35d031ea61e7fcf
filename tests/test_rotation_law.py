"""The rotation law, asserted mechanically (round-8 verdict task 3).

plans/registry.py states the law in prose: every registered hash
query gets a driver-recorded hash-green row at most two testdata
generations old, maintained by fronting the oldest-evidence modules
into each round's 50-query driver window. Prose laws drift; this
test parses the committed CORRECTNESS_r0*.json set and the live
registration order and fails when a future window would let any
query's evidence age out:

1. CUMULATIVE — every hash query is hash-green in at least one
   committed driver record (163/163, first reached at r7-close).
2. FRESHNESS — every hash query's NEWEST green row sits within the
   last ``WINDOW_SPAN`` non-empty driver records. Four 50-query
   windows with re-confirm overlap is one full sweep of the 163-query
   hash registry, i.e. two testdata generations (the driver
   regenerates testdata roughly every other round).
3. IMMINENT REFRESH — every query whose newest green row is in the
   OLDEST of those ``WINDOW_SPAN`` records appears in the CURRENT
   front-50 registration window, so the very next driver run renews
   it. This is the check that goes red the moment a round's module
   reordering drifts from oldest-first.
4. NEW-QUERY FRONTING — a hash query with NO driver evidence at all
   must be inside the current front-50 (rotation law clause (a)).
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW_SIZE = 50  # the driver records the first 50 registration-ordered queries
WINDOW_SPAN = 4  # windows per full rotation sweep ≈ two testdata generations


def _canonical_order():
    """Registration order as a FRESH process (the driver) sees it.

    Inside pytest the global QUERIES dict's insertion order is polluted
    by whichever test module imported a plans module first, so the
    driver-visible order is recomputed here from first principles:
    _MODULES order, then in-file definition order (co_firstlineno).
    """
    from flink_streaming_kmeans_spark.plans import registry as reg

    reg.collect()
    mod_rank = {
        f"{reg.__package__}.{m}": i for i, m in enumerate(reg._MODULES)
    }
    # The r13 one-off annex (registry._ANNEX_R13) forward-declares its
    # names BEFORE the module loop, so in a fresh process (the driver)
    # they hold the first dict slots even though their home modules
    # rank late — model that here with a rank of -1.
    annex = list(getattr(reg, "_ANNEX_R13", ()))
    names = sorted(
        reg.QUERIES,
        key=lambda n: (
            (-1, annex.index(n))
            if n in annex
            else (
                mod_rank[reg.QUERIES[n].__module__],
                reg.QUERIES[n].__code__.co_firstlineno,
            )
        ),
    )
    counts = {}
    for n in names:
        m = reg.QUERIES[n].__module__.rsplit(".", 1)[-1]
        counts[m] = counts.get(m, 0) + 1
    return names, counts


def _driver_records() -> list[tuple[str, dict]]:
    """Committed CORRECTNESS files, oldest→newest, empty rounds dropped."""
    out = []
    for path in sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json")):
        data = json.load(open(path))
        if data:
            out.append((path.rsplit("/", 1)[-1], data))
    return out


def _newest_green_round(records, name):
    """Index into ``records`` of the newest hash-green row, or None."""
    for i in range(len(records) - 1, -1, -1):
        if records[i][1].get(name, {}).get("hash_match") is True:
            return i
    return None


def test_rotation_law_cumulative_and_fresh(registry):
    queries, oracles = registry
    records = _driver_records()
    assert len(records) >= WINDOW_SPAN, (
        "rotation law needs a full sweep of committed driver records"
    )
    order, _ = _canonical_order()
    assert set(order) == set(queries)
    front = set(order[:WINDOW_SIZE])
    oldest_allowed = len(records) - WINDOW_SPAN

    never_recorded = []
    stale = []
    aging_out = []
    for name in oracles:  # hash-tier queries only; rows-tier has no hash row
        newest = _newest_green_round(records, name)
        if newest is None:
            never_recorded.append(name)
        elif newest < oldest_allowed:
            stale.append((name, records[newest][0]))
        elif newest == oldest_allowed and name not in front:
            aging_out.append((name, records[newest][0]))

    # Clause (a): zero-evidence queries must front the imminent window.
    unfronted_new = sorted(set(never_recorded) - front)
    assert not unfronted_new, (
        f"hash queries with no driver evidence not in the front-{WINDOW_SIZE} "
        f"window: {unfronted_new}"
    )
    assert not stale, (
        f"driver evidence older than the last {WINDOW_SPAN} windows "
        f"(rotation law broken): {stale}"
    )
    assert not aging_out, (
        "queries whose evidence ages out after the next driver run are "
        f"missing from the current front-{WINDOW_SIZE} window: {aging_out}"
    )


def test_prepped_next_window_satisfies_law(registry):
    """r11: the NEXT round's plan is executable (_NEXT_MODULES) and
    simulated here — synthesize the upcoming driver record (current
    front-50, hash-green), reorder to the prepped plan, and re-run
    every law clause. A mis-prepped plan fails the round BEFORE the
    next session starts from it, not during that session's task 1.

    r12 (r11 verdict design note): when the CUMULATIVE test above is
    already red — the designed state right after a driver drops a new
    CORRECTNESS file, before the session rotates — this simulation
    necessarily reads one round stale and fired a SECOND red for the
    same trigger. One red per trigger: skip here while the live
    window itself demands rotation; the simulation resumes the moment
    the rotation lands."""
    import pytest

    from flink_streaming_kmeans_spark.plans import registry as reg

    queries, oracles = registry
    order_now, _ = _canonical_order()
    cur_front = set(order_now[:WINDOW_SIZE])

    records = _driver_records()

    live_oldest = len(records) - WINDOW_SPAN
    for name in oracles:
        newest = _newest_green_round(records, name)
        if newest is not None and (
            newest < live_oldest
            or (newest == live_oldest and name not in cur_front)
        ):
            pytest.skip(
                "cumulative-freshness clause already firing on the live "
                "window (rotation pending) — one red per trigger"
            )
    synth = {
        n: {"hash_match": True} for n in cur_front if n in oracles
    }
    records = records + [("CORRECTNESS_next.json(SYNTH)", synth)]

    # registration order under the prepped plan
    next_rank = {
        f"{reg.__package__}.{m}": i for i, m in enumerate(reg._NEXT_MODULES)
    }
    assert sorted(next_rank) == sorted(
        f"{reg.__package__}.{m}" for m in reg._MODULES
    ), "_NEXT_MODULES must be a permutation of _MODULES"
    next_order = sorted(
        queries,
        key=lambda n: (
            next_rank[queries[n].__module__],
            queries[n].__code__.co_firstlineno,
        ),
    )
    next_front = set(next_order[:WINDOW_SIZE])
    oldest_allowed = len(records) - WINDOW_SPAN

    problems = []
    for name in oracles:
        newest = _newest_green_round(records, name)
        if newest is None:
            problems.append((name, "never recorded"))
        elif newest < oldest_allowed:
            problems.append((name, f"stale at {records[newest][0]}"))
        elif newest == oldest_allowed and name not in next_front:
            problems.append((name, "ages out under the prepped plan"))
    assert not problems, (
        f"the prepped _NEXT_MODULES plan breaks the rotation law: "
        f"{problems}"
    )

    # window arithmetic under the prepped plan: at most one module
    # straddles the 50 boundary (same rule as the live window).
    counts = {}
    for n in next_order:
        m = queries[n].__module__.rsplit(".", 1)[-1]
        counts[m] = counts.get(m, 0) + 1
    total, straddle = 0, []
    for m in reg._NEXT_MODULES:
        lo, hi = total, total + counts[m]
        if lo < WINDOW_SIZE < hi:
            straddle.append(m)
        total += counts[m]
    assert len(straddle) <= 1, straddle


def test_rotation_window_is_exactly_the_committed_plan(registry):
    """The registry comment and the executable order must agree.

    The front-50 is read from the live registration order; the plan is
    read from the module list itself (first modules summing to 50).
    A mid-round query addition inside the window prefix would shift
    the window and orphan tail queries — this pins window size 50 as
    an exact module-boundary sum, which is what makes the driver's
    'first 50' reproducible round over round.
    """
    from flink_streaming_kmeans_spark.plans import registry as reg

    order, _ = _canonical_order()
    queries, _ = registry
    assert set(order) == set(queries)
    front = order[:WINDOW_SIZE]
    assert len(front) == WINDOW_SIZE

    # r13: the one-off annex holds the first len(_ANNEX_R13) slots by
    # forward declaration; the module arithmetic below governs the
    # REMAINDER of the window (annex names excluded from the counts so
    # their home modules don't read as straddling).
    annex = list(getattr(reg, "_ANNEX_R13", ()))
    assert front[: len(annex)] == annex
    window_rest = WINDOW_SIZE - len(annex)
    rest = [n for n in order if n not in annex]
    counts = {}
    for n in rest:
        m = queries[n].__module__.rsplit(".", 1)[-1]
        counts[m] = counts.get(m, 0) + 1

    # Module boundaries over the registration order: every module is
    # either wholly inside the window, wholly outside, or the SINGLE
    # "first k of <module>" segment that completes it (corpus-first-14
    # in the r13 plan). Two straddling modules would mean the window
    # drifted off the committed module arithmetic.
    boundaries = []
    total = 0
    for mod, n in counts.items():
        boundaries.append((mod, total, total + n))
        total += n
    inside = [m for m, lo, hi in boundaries if lo < window_rest and hi <= window_rest]
    straddle = [m for m, lo, hi in boundaries if lo < window_rest < hi]
    assert len(straddle) <= 1, f"window may straddle at most one module: {straddle}"
    assert inside, "window must cover at least one whole module"
