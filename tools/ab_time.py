"""Isolated noop-sink timing for named queries (the guide §1.4 loop).

Usage: python tools/ab_time.py [sf_dir] [-n RUNS] query [query ...]

Runs each named query RUNS times (default 4) through the noop sink in
one fresh session and prints every run plus the warm minimum (first
run carries JIT/stage-build cost; the warm min is the comparable
number — same convention as the r12 round log). This is a measurement
harness only: nothing is cached across runs, each run rebuilds the
plan from the registry callable exactly as bench.py does.
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from flink_streaming_kmeans_spark.plans.registry import collect  # noqa: E402
from flink_streaming_kmeans_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    runs = 4
    if "-n" in args:
        i = args.index("-n")
        runs = int(args[i + 1])
        del args[i : i + 2]
    dirs = [a for a in args if os.sep in a or os.path.isdir(a)]
    sf_dir = dirs[0] if dirs else "/root/testdata/sf0.1"
    names = [a for a in args if a not in dirs]
    queries, _ = collect()
    spark = get_spark("ab-time")
    for name in names:
        times = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"ab:{name}#{i}")
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        warm = min(times[1:]) if len(times) > 1 else times[0]
        print(
            f"{name}: runs={['%.2f' % t for t in times]} warm_min={warm:.2f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
