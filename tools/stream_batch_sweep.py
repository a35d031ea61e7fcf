"""Micro-batch-split invariance sweep for the streaming drives.

Every registered streaming drive replays a bounded table as N
contiguous micro-batch files (sources/replay.py) and claims its OUTPUT
is a statement about batch semantics, not a transcript of one
particular replay. The r7 reducer sweep proved shuffle-partitioning
invariance; this tool proves BATCH-BOUNDARY invariance: re-run each
streaming hash query with the split overridden to 1 / 2 / 5 / 7
micro-batches (``SPARK_GRAFT_STREAM_BATCHES``, honored by every
range-split drive via sources/replay.replay_batch_count) and require
the canonical hash to still equal the config-independent DuckDB
oracle.

What each count stresses:
- 1  — NO internal boundary: all state transitions happen inside one
       trigger (plus any sentinel batch); catches logic that only
       works because a boundary flushed intermediate state.
- 2  — the minimum real boundary.
- 5/7 — more boundaries than the default 2-3: more watermark
       advances, more state evictions, more per-key folds across
       triggers; catches cross-batch state assumptions (lost state,
       double emission, order dependence) and split-dependent
       drive prep (e.g. a same-key row pair straddling a boundary).

Excluded by design: q_kmeans_stream / q_kmeans_stream_reassign use
hand-written RE-DELIVERY sequences ([0,1,2,0,1]) whose meaning is the
specific sequence, and they are rows-tier (no hash oracle) — their
batch-count invariance is asserted separately in
tests/test_streaming.py.

Usage: python tools/stream_batch_sweep.py [sf_dir] [n ...]
Defaults: sf_dir=/root/testdata/sf0.001, counts 1 2 5 7.
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

from oracle import _canon_rows, make_duckdb  # noqa: E402

from flink_streaming_kmeans_spark.plans.registry import collect  # noqa: E402
from flink_streaming_kmeans_spark.session import get_spark  # noqa: E402

STREAM_QUERIES = [
    "q_stream_cep",
    "q_stream_dedup",
    "q_stream_hll",
    "q_stream_join",
    "q_stream_join_left",
    "q_stream_quantile",
    "q_stream_session",
    "q_stream_slide",
    "q_stream_topk",
    "q_stream_tumble",
    "q_stream_upsert",
]

DEFAULT_COUNTS = [1, 2, 5, 7]


def main() -> int:
    args = sys.argv[1:]
    dirs = [a for a in args if os.sep in a or os.path.isdir(a)]
    if len(dirs) > 1:
        print(f"ERROR: multiple sf_dir arguments: {dirs}", file=sys.stderr)
        return 2
    sf_dir = dirs[0] if dirs else "/root/testdata/sf0.001"
    counts = [int(a) for a in args if a not in dirs] or DEFAULT_COUNTS

    queries, oracles = collect()
    con = make_duckdb(sf_dir)
    expected = {}
    for name in STREAM_QUERIES:
        res = con.execute(oracles[name])
        cols = [d[0] for d in res.description]
        expected[name] = _canon_rows(cols, res.fetchall())[:3]

    spark = get_spark("stream-batch-sweep")
    failed = []
    for n in counts:
        os.environ["SPARK_GRAFT_STREAM_BATCHES"] = str(n)
        t0 = time.time()
        n_ok = 0
        try:
            for name in STREAM_QUERIES:
                try:
                    sdf = queries[name](spark, sf_dir)
                    rows = [tuple(r) for r in sdf.collect()]
                    got = _canon_rows(list(sdf.columns), rows)[:3]
                except Exception as e:
                    failed.append((n, name, f"ERROR {type(e).__name__}: {e}"))
                    print(f"  batches={n}/{name}: ERROR {type(e).__name__}: {e}")
                    continue
                if got != expected[name]:
                    why = (
                        f"rows {got[0]} vs {expected[name][0]}"
                        if got[0] != expected[name][0]
                        else ("schema" if got[1] != expected[name][1] else "hash")
                    )
                    failed.append((n, name, why))
                    print(f"  batches={n}/{name}: FAIL ({why})")
                else:
                    n_ok += 1
        finally:
            del os.environ["SPARK_GRAFT_STREAM_BATCHES"]
        print(f"batches={n}: {n_ok}/{len(STREAM_QUERIES)} pass ({time.time()-t0:.0f}s)")

    if failed:
        print(f"\nFAILED {len(failed)}:")
        for n, name, why in failed:
            print(f"  batches={n}/{name}: {why}")
        return 1
    print(f"\nall {len(counts)} batch counts x {len(STREAM_QUERIES)} queries pass")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
