"""Per-query DataFrame-CONSTRUCTION cost (driver-side planning).

Usage: python tools/build_cost.py [N_REPS]

Builds every registered query's DataFrame (no action) N_REPS times
after one warm pass, and prints the per-query MIN construction time,
slowest first. This is the per-query detail behind bench.py's
planning_seconds/eager_build_seconds decomposition: entries over ~1 s
are doing real cluster work inside the callable (localCheckpoint
rounds, staged lakehouse writes, streaming drives); the sub-second
tail is pure Catalyst analysis + py4j traffic, the volume-independent
~30 s of the suite number. Rows-tier/streaming drives run their whole
pipeline on construction — they are reported but labelled eager.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_streaming_kmeans_spark.plans.registry import collect  # noqa: E402
from flink_streaming_kmeans_spark.session import get_spark  # noqa: E402


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries, oracles = collect()
    spark = get_spark("build-cost")
    # warm: JVM + analyzer + parquet footers
    for name in sorted(oracles):
        try:
            queries[name](spark, sf_dir)
        except Exception:
            pass
    best: dict[str, float] = {}
    for _ in range(reps):
        for name in sorted(oracles):
            t0 = time.perf_counter()
            try:
                queries[name](spark, sf_dir)
            except Exception as exc:
                print(f"[build_cost] {name}: ERROR {exc!r}", file=sys.stderr)
                continue
            dt = time.perf_counter() - t0
            best[name] = min(best.get(name, float("inf")), dt)
    ranked = sorted(best.items(), key=lambda kv: kv[1], reverse=True)
    total = sum(best.values())
    print(f"# total warm construction: {total:.1f}s over {len(best)} queries")
    for name, dt in ranked:
        print(f"{dt:8.3f}  {name}")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "BUILD_COST.json")
    with open(out, "w") as f:
        json.dump({k: round(v, 4) for k, v in best.items()}, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
