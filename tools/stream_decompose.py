"""Per-phase decomposition of the streaming evidence drives (guide
§1.1/§1.5; r12 verdict task 1 — "count the driver jobs per trigger").

Usage: python tools/stream_decompose.py [sf_dir] query [query ...]

For each named streaming drive this wraps sources/replay's
``run_available_now`` (and every plans-module binding of it) to
record, without changing what runs:

- prep seconds (callable time before the streaming query starts:
  probe counts, ntile split, batch-file staging),
- stream seconds (start → awaitTermination),
- per-micro-batch progress: trigger/addBatch/getBatch/walCommit/
  commitOffsets/queryPlanning durations and state-store commit times
  straight from StreamingQueryProgress,
- read-back seconds (noop sink over the returned DataFrame),
- driver JOB COUNT per phase (AppStatusStore), the §1.5 number that
  tells us how much of a trigger is job-barrier overhead.

Measurement harness only: nothing is cached; each drive runs exactly
as bench.py runs it.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from flink_streaming_kmeans_spark.plans.registry import collect  # noqa: E402
from flink_streaming_kmeans_spark.session import get_spark  # noqa: E402
import flink_streaming_kmeans_spark.sources.replay as replay  # noqa: E402


def n_jobs(spark) -> int:
    """Total driver jobs so far (AppStatusStore; local mode)."""
    try:
        return spark.sparkContext._jsc.sc().statusStore().jobsList(None).size()
    except Exception:
        return -1


def main() -> int:
    args = sys.argv[1:]
    dirs = [a for a in args if os.sep in a or os.path.isdir(a)]
    sf_dir = dirs[0] if dirs else "/root/testdata/sf0.1"
    names = [a for a in args if a not in dirs]

    queries, _ = collect()
    spark = get_spark("stream-decompose")

    rec: dict = {}
    orig = replay.run_available_now

    def wrapped(writer, name, spark_=None, partitions=4, timeout=300):
        rec["jobs_before_stream"] = n_jobs(spark)
        t0 = time.perf_counter()
        q = orig(writer, name, spark_, partitions, timeout)
        rec["stream_sec"] = time.perf_counter() - t0
        rec["jobs_after_stream"] = n_jobs(spark)
        prog = []
        for p in q.recentProgress:
            d = p if isinstance(p, dict) else json.loads(p.json)
            prog.append(
                {
                    "batchId": d.get("batchId"),
                    "numInputRows": d.get("numInputRows"),
                    "durationMs": d.get("durationMs"),
                    "state": [
                        {
                            k: so.get(k)
                            for k in (
                                "operatorName",
                                "commitTimeMs",
                                "numShufflePartitions",
                                "numStateStoreInstances",
                            )
                        }
                        for so in d.get("stateOperators", [])
                    ],
                }
            )
        rec["progress"] = prog
        return q

    # Rebind in replay AND in every plans module that imported the name.
    import flink_streaming_kmeans_spark.plans.ml as ml
    import flink_streaming_kmeans_spark.plans.streaming_ext as sx
    import flink_streaming_kmeans_spark.plans.streams as st
    import flink_streaming_kmeans_spark.plans.training as tr

    replay.run_available_now = wrapped
    for m in (ml, sx, st, tr):
        for attr in ("run_available_now", "_run_available_now"):
            if hasattr(m, attr):
                setattr(m, attr, wrapped)

    # warmup (JVM/codegen off the clock, same as bench.py)
    queries["q_scan_parquet"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in names:
        rec.clear()
        spark.sparkContext.setJobDescription(f"decompose:{name}")
        j0 = n_jobs(spark)
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        t1 = time.perf_counter()
        j1 = n_jobs(spark)
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        j2 = n_jobs(spark)

        stream_sec = rec.get("stream_sec", 0.0)
        jb, ja = rec.get("jobs_before_stream", j0), rec.get(
            "jobs_after_stream", j0
        )
        print(f"\n=== {name} ===")
        print(
            f"total={t2 - t0:.2f}s  build={t1 - t0:.2f}s "
            f"(prep={t1 - t0 - stream_sec:.2f}s + stream={stream_sec:.2f}s) "
            f"readback_noop={t2 - t1:.2f}s"
        )
        print(
            f"jobs: prep={jb - j0}  stream={ja - jb}  "
            f"post/readback={j2 - ja}  total={j2 - j0}"
        )
        for p in rec.get("progress", []):
            dm = p["durationMs"] or {}
            state = "; ".join(
                f"{s['operatorName']}:commit={s['commitTimeMs']}ms"
                f"/parts={s['numShufflePartitions']}"
                for s in p["state"]
            )
            print(
                f"  batch {p['batchId']}: rows={p['numInputRows']} "
                f"trigger={dm.get('triggerExecution')}ms "
                f"(addBatch={dm.get('addBatch')} getBatch={dm.get('getBatch')} "
                f"latestOffset={dm.get('latestOffset')} "
                f"plan={dm.get('queryPlanning')} wal={dm.get('walCommit')} "
                f"commit={dm.get('commitOffsets')})"
                + (f" state[{state}]" if state else "")
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
