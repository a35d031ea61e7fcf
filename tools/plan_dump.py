"""Dump .explain("formatted") for named queries to files.

Usage: python tools/plan_dump.py OUTDIR SUFFIX [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each named query (default: a
built-in heavy-hitter list). Streaming drives construct and RUN their
pipeline inside the callable; their returned DataFrame is the batch
read-back of the sink — the explain still pins the shape of everything
batch-side (replay prep is separate). Used for the optimization-round
deliverable plans/r12/<query>_{before,after}.txt.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_streaming_kmeans_spark.plans.registry import collect  # noqa: E402
from flink_streaming_kmeans_spark.session import get_spark  # noqa: E402


def main() -> int:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    queries, _ = collect()
    spark = get_spark("plan-dump")
    for name in names:
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"[plan_dump] wrote {name}_{suffix}.txt", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
