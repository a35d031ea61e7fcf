"""Empirical scale probe (r7 verdict task 5): measure the
shape-representative queries at a base SF dir and at a make_scaled_dir
multiple of it, assert the physical plan shape is unchanged (same
plan_audit flag set — any NEW quadratic-join / row-Python flag at
scale fails the probe), and report the runtime growth ratio.

    python tools/make_scaled_dir.py /root/testdata/sf0.1 /tmp/fsk_sf1x10 10
    python tools/scale_probe.py /root/testdata/sf0.1 /tmp/fsk_sf1x10 10

Interpretation: with K-fold data on the same 32 local cores, a
shuffle/scan-bound linear plan grows <= ~K in wall time (often less —
fixed per-query trigger/plan overhead amortizes); super-linear growth
flags a plan whose work grows faster than its input, which at 1000
executors and 100 TB becomes the bottleneck. Results are recorded in
SCALE.md with the run's environment noted.

Each query is measured twice per dir (min kept) with the noop sink —
the bench.py methodology, see the pass-2 comment there.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_streaming_kmeans_spark.plans.registry import collect  # noqa: E402
from flink_streaming_kmeans_spark.session import get_spark  # noqa: E402
import plan_audit  # noqa: E402

# The shape representatives the r7 verdict names: as-of union+window,
# LSH banding join, prefix-filter join, stream-stream interval join,
# iterative k-means, iterative pagerank, time-range window frame,
# TPC-H join tree, plus the scan-heavy decimal aggregate and the
# broadcast-total text pipeline.
PROBES = [
    "q_agg_q1",
    "q_join_asof",
    "q_dedup_lsh",
    "q_dedup_prefix",
    "q_stream_join",
    "q_ml_kmeans_iter",
    "q_graph_pagerank",
    "q_win_time_range",
    "q_tpch_q10",
    "q_text_tfidf",
]


def run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scaled = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fsk_sf1x10"
    k = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    queries, _ = collect()
    spark = get_spark("scale_probe")
    run_noop(queries["q_scan_parquet"](spark, base))  # warmup

    def timed_min2(name: str, sf_dir: str):
        """(min seconds, last built DataFrame). The df is returned so
        the plan audit below reuses it — rebuilding via queries[name]
        would re-RUN the whole drive for the streaming/iterative
        probes, whose work happens inside the callable (r8 review
        pass: minutes of redundant wall clock at the x100 rung)."""
        ts, df = [], None
        for _ in range(2):
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            run_noop(df)
            ts.append(time.perf_counter() - t0)
        return min(ts), df

    rows = []
    flags_changed = []
    for name in PROBES:
        t_base, df_base = timed_min2(name, base)
        t_scaled, df_scaled = timed_min2(name, scaled)
        f_base = plan_audit.audit_one(name, df_base)
        f_scaled = plan_audit.audit_one(name, df_scaled)
        same = set(f_base["flags"]) == set(f_scaled["flags"])
        if not same:
            flags_changed.append(
                (name, f_base["flags"], f_scaled["flags"])
            )
        r = {
            "query": name,
            "base_s": round(t_base, 2),
            "scaled_s": round(t_scaled, 2),
            "ratio": round(t_scaled / max(t_base, 1e-9), 2),
            "plan_flags_same": same,
        }
        rows.append(r)
        print(
            f"{name:24s} {r['base_s']:7.2f}s -> {r['scaled_s']:7.2f}s  "
            f"x{r['ratio']:<5} flags_same={same}",
            flush=True,
        )

    print(json.dumps({"k": k, "rows": rows}))
    if flags_changed:
        print(f"PLAN SHAPE CHANGED AT SCALE: {flags_changed}", file=sys.stderr)
        return 1
    worst = max(r["ratio"] for r in rows)
    print(f"worst growth ratio: x{worst} (data x{k})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
