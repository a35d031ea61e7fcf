"""Benchmark harness: run the registered queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line:

    {"metric": "suite_seconds", "value": N, "unit": "sec",
     "queries": {"q_...": sec, ...}, "sf": "...", "n_queries": N}

Execution is measured with the noop sink (full plan runs, nothing is
shipped to the driver), the standard Spark bench pattern — so numbers
reflect engine time, not result-pickling time. One warmup query runs
first so JVM/codegen startup is not charged to the first query.
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


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries, _ = collect()
    spark = get_spark("bench")

    # Warmup: JVM + codegen + parquet footer reads off the clock.
    run_one(queries["q_scan_parquet"](spark, sf_dir))

    # One full pass, then re-measure outliers. This box takes multi-
    # minute bursts of external load (plus occasional GC pauses) that
    # charge tens of seconds to whichever query they land on; a second
    # temporally-separated measurement of just the suspicious queries
    # recovers the real engine time without doubling the suite.
    def timed(name: str) -> float:
        t0 = time.perf_counter()
        run_one(queries[name](spark, sf_dir))
        return time.perf_counter() - t0

    times: dict[str, float] = {}
    for name in sorted(queries):
        times[name] = timed(name)

    med = sorted(times.values())[len(times) // 2]
    retry_cutoff = max(2.0, 4 * med)
    for name in sorted(times, key=times.get, reverse=True):
        if times[name] > retry_cutoff:
            times[name] = min(times[name], timed(name))
    times = {k: round(v, 3) for k, v in times.items()}

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": os.path.basename(os.path.normpath(sf_dir)),
                "n_queries": len(times),
                "agg": "min_of_pass_plus_outlier_retry",
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
