"""Benchmark harness: run the registered queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line:

    {"metric": "suite_seconds", "value": N, "unit": "sec",
     "queries": {"q_...": sec, ...}, "sf": "...", "n_queries": N}

Execution is measured with the noop sink (full plan runs, nothing is
shipped to the driver), the standard Spark bench pattern — so numbers
reflect engine time, not result-pickling time. One warmup query runs
first so JVM/codegen startup is not charged to the first query, and
every query is timed TWICE (min kept, runs temporally separated by a
full suite pass) so one-time optimizer-JIT/codegen compile and
external-load bursts don't masquerade as plan regressions — see the
pass-2 comment in main() for the measurements behind this.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_streaming_kmeans_spark.plans.registry import collect  # noqa: E402
from flink_streaming_kmeans_spark.session import get_spark  # noqa: E402


def run_one(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# This box takes multi-minute external-load bursts, and one bench run
# saw a single task stall for ~5 minutes (decimal hash-agg, normally
# <10 s — environment, not plan: the identical query ran 8 s on retry).
# A per-query watchdog cancels the job group at the cap so one stalled
# task can never eat the whole suite's wall-clock budget; the retry
# pass then re-measures the query on a healthy JVM/moment.
QUERY_CAP_SEC = float(os.environ.get("SPARK_GRAFT_BENCH_CAP", "150"))


def run_capped(spark, df, name: str) -> bool:
    """Run with a cancellation watchdog. Returns True if completed,
    False if cancelled at the cap."""
    return run_capped_callable(spark, lambda: df, name)


def run_capped_callable(spark, make_df, name: str) -> bool:
    """Like :func:`run_capped`, but the watchdog also covers the
    CONSTRUCTION of the DataFrame: streaming drives run their replay
    prep + writeStream + sink read-back inside the query callable, so
    every Spark job it launches must sit inside the job group the
    watchdog cancels (review r6)."""
    import threading

    sc = spark.sparkContext
    sc.setJobGroup(name, f"bench:{name}", interruptOnCancel=True)
    cancelled = threading.Event()

    def cancel():
        cancelled.set()
        sc.cancelJobGroup(name)

    timer = threading.Timer(QUERY_CAP_SEC, cancel)
    timer.start()
    try:
        run_one(make_df())
        return not cancelled.is_set()
    except Exception:
        if cancelled.is_set():
            return False
        raise
    finally:
        timer.cancel()
        # PySpark 4 has no SparkContext.clearJobGroup; reset the local
        # properties that setJobGroup wrote.
        sc.setLocalProperty("spark.jobGroup.id", None)
        sc.setLocalProperty("spark.job.description", None)
        sc.setLocalProperty("spark.job.interruptOnCancel", None)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries, oracles = collect()
    spark = get_spark("bench")

    # Warmup: JVM + codegen + parquet footer reads off the clock —
    # capped and guarded like every measured query (review r6: an
    # uncapped/unguarded warmup could stall or abort the suite before
    # a single measurement existed).
    try:
        run_capped(spark, queries["q_scan_parquet"](spark, sf_dir), "warmup")
    except Exception as exc:  # noqa: BLE001 — warmup is best-effort
        print(f"[bench] warmup failed: {exc!r}", file=sys.stderr)

    errors: dict[str, str] = {}

    # One full pass, then re-measure outliers. This box takes multi-
    # minute bursts of external load (plus occasional GC pauses) that
    # charge tens of seconds to whichever query they land on; a second
    # temporally-separated measurement of just the suspicious queries
    # recovers the real engine time without doubling the suite.
    #
    # The CALLABLE runs inside the timed/guarded region too (review
    # r6): streaming drives do essentially all their work — replay
    # prep, writeStream, sink read-back — inside the callable, so
    # capping only the noop write left them watchdog-exempt. The job-
    # group cancel covers any Spark job the callable launches; a
    # raising query records an error and the suite CONTINUES — one
    # broken query must not cost the whole run's output (review r6).
    def timed(name: str) -> float:
        t0 = time.perf_counter()
        try:
            ok = run_capped_callable(
                spark, lambda: queries[name](spark, sf_dir), name
            )
        except Exception as exc:  # noqa: BLE001 — record, keep going
            dt = time.perf_counter() - t0
            errors[name] = repr(exc)[:200]
            print(f"[bench] {name}: ERROR {exc!r}", file=sys.stderr)
            return dt
        dt = time.perf_counter() - t0
        print(
            f"[bench] {name}: {dt:.2f}s" + ("" if ok else " (CAPPED)"),
            file=sys.stderr,
            flush=True,
        )
        return dt

    times: dict[str, float] = {}
    for name in sorted(queries):
        times[name] = timed(name)

    # Second timed pass, min kept (r7 verdict task 2): a query's FIRST
    # run charges one-time optimizer-JIT + whole-stage-codegen compile
    # to whichever query hits the cold code path — measured 5.5 s →
    # 2.2 s → ~1.5 s steady for q_agg_corr on a fresh JVM, and r6/r7
    # repeatedly toggled weak-marks on sub-second queries over exactly
    # this (q_win_rank 0.20 → 0.94 s on an unchanged plan). A family-
    # representative warmup does NOT transfer (probed: q_agg_stats
    # untimed first still left q_agg_corr at 2.7 s), so the fix is a
    # full second pass: every query is measured twice, temporally
    # separated (the whole suite runs between a query's two runs), and
    # the min is kept — standard steady-state practice, disclosed in
    # the agg field. Queries that errored or hit the watchdog cap in
    # pass 1 are skipped (an error stays an error; a capped query gets
    # its one extra shot from the outlier retry below, not a second
    # guaranteed 150 s).
    for name in sorted(queries):
        if name not in errors and times[name] <= QUERY_CAP_SEC:
            t2 = timed(name)
            # A retry that RAISED must not contribute its
            # time-to-exception to min(): a 0.4 s failure would
            # overwrite a clean 5 s measurement, and the bogus value
            # would poison the historical-min reference (hist, below)
            # for every future round (r8 review pass).
            if name not in errors:
                times[name] = min(times[name], t2)

    # Third chance for anything still suspicious: suite-median outliers
    # (external-load bursts land tens of seconds on one query) and any
    # query above 2.5x its best ROUND-STAMPED historical value.
    # Reference = per-query MIN over all BENCH_full_r*.json sidecars
    # (min across rounds filters the noise out of the reference
    # itself).
    here = os.path.dirname(os.path.abspath(__file__))
    import re as _re

    hist: dict[str, float] = {}
    for f_ in os.listdir(here):
        if _re.fullmatch(r"BENCH_full_r(\d+)\.json", f_):
            try:
                with open(os.path.join(here, f_)) as fh:
                    for k, v in json.load(fh).get("queries", {}).items():
                        hist[k] = min(hist.get(k, float("inf")), float(v))
            except (OSError, ValueError):
                continue

    med = sorted(times.values())[len(times) // 2]
    retry_cutoff = max(2.0, 4 * med)

    def suspicious(name: str) -> bool:
        if times[name] > retry_cutoff:
            return True
        ref = hist.get(name)
        return ref is not None and times[name] > max(0.3, 2.5 * ref)

    for name in sorted(times, key=times.get, reverse=True):
        if name not in errors and suspicious(name):
            t3 = timed(name)
            # same errored-run guard as pass 2
            if name not in errors:
                times[name] = min(times[name], t3)
    times = {k: round(v, 3) for k, v in times.items()}

    # Planning-cost decomposition (r11 verdict task 6): the suite
    # number carries a large volume-INDEPENDENT component — driver-side
    # analysis/optimization/codegen per plan — that made driver-vs-
    # builder suite deltas look like regressions under box-load drift
    # (the r11 1.18x was exactly this). Measure it mechanically each
    # run: one warm construction-only pass (no action) over the batch
    # hash queries. Builds that exceed EAGER_BUILD_SEC are doing real
    # cluster work inside the callable (localCheckpoint rounds, staged
    # lakehouse writes) and are reported separately as eager-drive
    # build time, NOT planning — subtracting them would over-correct.
    # Rows-tier/streaming drives are excluded entirely (building them
    # IS running them). Normalize a suite delta with:
    #   (value_a - planning_seconds_a) / (value_b - planning_seconds_b)
    EAGER_BUILD_SEC = 1.0
    plan_build: dict[str, float] = {}
    for name in sorted(oracles):
        if name in errors or name not in queries:
            continue
        t0 = time.perf_counter()
        try:
            queries[name](spark, sf_dir)
        except Exception:  # noqa: BLE001 — decomposition is best-effort
            continue
        plan_build[name] = time.perf_counter() - t0
    planning = sum(t for t in plan_build.values() if t <= EAGER_BUILD_SEC)
    eager = sum(t for t in plan_build.values() if t > EAGER_BUILD_SEC)
    print(
        f"[bench] planning decomposition: {planning:.1f}s declarative "
        f"planning + {eager:.1f}s eager-drive build across "
        f"{len(plan_build)} hash queries",
        file=sys.stderr,
    )

    total = round(sum(times.values()), 3)
    full = {
        "metric": "suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": os.path.basename(os.path.normpath(sf_dir)),
        "n_queries": len(times),
        "agg": "min_of_2_passes_plus_outlier_retry",
        "planning_seconds": round(planning, 3),
        "eager_build_seconds": round(eager, 3),
        "planning_note": (
            "warm construction-only pass over hash queries; builds "
            f">{EAGER_BUILD_SEC}s counted as eager-drive work, not planning"
        ),
    }
    if errors:
        full["errors"] = errors
    # The driver keeps only a bounded tail of stdout (r2: 2000 chars) and
    # parses the final JSON line; the full 110-query map is ~3000 chars,
    # which truncated the head of the line and broke the parse in r2.
    # So: full map → sidecar file + an early stdout line (for humans),
    # and the FINAL stdout line is a compact summary guaranteed to fit
    # the tail capture (top slowest queries only, full map referenced).
    sidecar = os.path.join(here, "BENCH_full.json")
    with open(sidecar, "w") as f:
        json.dump(full, f, indent=1)
    # Round-stamped copy (r6 verdict task 7): the live sidecar is
    # overwritten every pass, so per-query cross-round diffs required
    # git archaeology. The current round = max driver-recorded
    # BENCH_r{N}.json + 1 (the driver writes r{N} at round close,
    # AFTER our in-round passes), falling back to the tracked
    # BENCH_full_r{N}.json names when no driver file exists (r7
    # advice: a fresh clone carries only the tracked stamped sidecars,
    # and would otherwise restart numbering at r01). Canonical-run
    # guard (review r7 + r7 advice): compare REALPATHS so a trailing
    # slash, relative path, or symlink to the canonical dir still
    # counts as canonical, while a doctored composed /tmp dir never
    # clobbers the round's cross-round record.
    if os.path.realpath(sf_dir) == os.path.realpath("/root/testdata/sf0.1"):
        rounds = [
            int(m.group(1))
            for f_ in os.listdir(here)
            if (m := _re.fullmatch(r"BENCH_r(\d+)\.json", f_))
        ]
        if rounds:
            rnd = max(rounds) + 1
        else:
            # Fallback when no driver file exists (fresh clone): a
            # BENCH_full_r{M} was stamped IN round M, so the current
            # round is max(M) itself — NOT max+1, which would
            # self-increment on every in-round run and fragment one
            # round into N phantom rounds (r8 review pass). No files
            # at all → round 1.
            stamped_rounds = [
                int(m.group(1))
                for f_ in os.listdir(here)
                if (m := _re.fullmatch(r"BENCH_full_r(\d+)\.json", f_))
            ]
            rnd = max(stamped_rounds, default=1)
        stamped = os.path.join(here, f"BENCH_full_r{rnd:02d}.json")
        with open(stamped, "w") as f:
            json.dump(full, f, indent=1)
    else:
        print(
            f"[bench] non-canonical sf dir {sf_dir}: round-stamped "
            "sidecar not written",
            file=sys.stderr,
        )
    # Do NOT print the full map to stdout: the ~4KB line used to sit
    # right before the compact line and ate the driver's 2000-char
    # tail as mid-line JSON garbage (r5 verdict task 8). The sidecar
    # holds the full map; stdout gets only the compact final line.
    print(f"[bench] full per-query map written to {sidecar}", file=sys.stderr)
    # Degrade the slowest-queries preview until the line fits the
    # driver's tail capture — never abort a finished bench run over
    # presentation (the sidecar always holds the full map).
    #
    # The preview is the UNION of the current top-15 and the PREVIOUS
    # driver round's top-15 (r12 verdict task 4): the driver's PERF
    # comparison reads this line, and a query that leaves the top-15
    # BECAUSE IT IMPROVED was indistinguishable from a removed query
    # (q_dedup_lsh read as "dropped_from_bench" in PERF_r12 after a
    # 2.75 → 1.88 s improvement). Carrying last round's preview keys
    # forward keeps every compared query present with a real number.
    # Bounded: ≤30 entries; the fit loop below still degrades to
    # plain top-N if the union line ever exceeds the tail capture.
    prev_top: list[str] = []
    driver_rounds = sorted(
        (
            (int(m.group(1)), f_)
            for f_ in os.listdir(here)
            if (m := _re.fullmatch(r"BENCH_r(\d+)\.json", f_))
        ),
        reverse=True,
    )
    if driver_rounds:
        try:
            with open(os.path.join(here, driver_rounds[0][1])) as fh:
                prev_top = list(
                    json.load(fh).get("parsed", {}).get("queries", {})
                )
        except (OSError, ValueError):
            prev_top = []
    ranked = sorted(times.items(), key=lambda kv: kv[1], reverse=True)
    for top in ("union", 15, 10, 5, 0):
        if top == "union":
            keys = {k for k, _ in ranked[:15]} | {
                k for k in prev_top if k in times
            }
            slowest = {k: times[k] for k, _ in ranked if k in keys}
            note = f"top-15 + prev-round top; full map in {sidecar}"
        else:
            slowest = dict(ranked[:top])
            note = f"top-{top} slowest; full map in {sidecar}"
        compact = dict(full, queries=slowest, queries_note=note)
        line = json.dumps(compact)
        if len(line) < 1500:
            break
    if len(line) >= 1500:
        # Even the top-0 preview is oversized (e.g. a long failure
        # list): fall back to a minimal object that ALWAYS fits the
        # driver's 2000-char tail — silent mid-line truncation would
        # otherwise break the parse with no signal (r4 ADVICE).
        print("[bench] WARNING: compact line oversized, emitting minimal "
              f"fallback (full map in {sidecar})", file=sys.stderr)
        line = json.dumps(
            {
                "metric": "suite_seconds",
                "value": total,
                "unit": "sec",
                "sf": full["sf"],
                "n_queries": full["n_queries"],
                "queries_note": f"full map in {sidecar}",
            }
        )
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
