"""Row-order/layout invariance sweep: every hash query must produce
BITWISE-IDENTICAL canonical results on a layout-permuted copy of the
data (tools/make_permuted_dir.py) as on the source dir.

This is STRONGER than oracle parity and needs no oracle: the source
hash equals the DuckDB hash (preflight), so variant==source implies
variant==oracle transitively — and unlike parity it would also catch
a divergence where BOTH engines read the permuted layout differently
from the original (parity on the variant alone would stay green).

Rows-tier queries (no oracle by contract) are driven on each variant
too, compared on row count only — their values are iterative-algorithm
outputs whose tie-breaking the rows tier deliberately doesn't pin.

Variants swept by default:
- ``perm1``: single file per table, rows globally permuted, small row
  groups (4096).
- ``perm5``: ``{t}.parquet`` as a DIRECTORY of 5 part files, each a
  uniform sample of the permuted table — the multi-writer/compaction
  layout. (The DuckDB oracle can't read this layout with the plain
  ``read_parquet('<dir>')`` view the harness uses; the source-hash
  comparison is exactly why that doesn't matter here.)

Usage: python tools/roworder_sweep.py [sf_dir] [--queries q1,q2]
Default sf_dir=/root/testdata/sf0.001. Builds variants under /tmp,
runs the sweep, exits nonzero on any mismatch.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

from oracle import _canon_rows  # noqa: E402

from flink_streaming_kmeans_spark.plans.registry import collect  # noqa: E402
from flink_streaming_kmeans_spark.session import get_spark  # noqa: E402

from make_permuted_dir import build  # noqa: E402

VARIANTS = {"perm1": 1, "perm5": 5}


def _run(spark, fn, sf_dir):
    sdf = fn(spark, sf_dir)
    rows = [tuple(r) for r in sdf.collect()]
    return _canon_rows(list(sdf.columns), rows)


def main() -> int:
    args = sys.argv[1:]
    only: set[str] | None = None
    for a in list(args):
        if a.startswith("--queries"):
            only = set(
                (a.split("=", 1)[1] if "=" in a else args[args.index(a) + 1]).split(",")
            )
            args = [x for x in args if x != a and not (x in only)]
    dirs = [a for a in args if os.sep in a or os.path.isdir(a)]
    sf_dir = dirs[0] if dirs else "/root/testdata/sf0.001"

    queries, oracles = collect()
    todo = sorted(only) if only else sorted(queries)
    unknown = [q for q in todo if q not in queries]
    if unknown:
        print(f"ERROR: unknown queries: {unknown}", file=sys.stderr)
        return 2

    tag = os.path.basename(os.path.normpath(sf_dir))
    vdirs: dict[str, str] = {}
    for vname, k in VARIANTS.items():
        d = f"/tmp/fsk_roworder_{tag}_{vname}"
        if os.path.isdir(d):
            shutil.rmtree(d)
        t0 = time.time()
        build(sf_dir, d, k)
        print(f"built {vname} at {d} ({time.time()-t0:.1f}s)")
        vdirs[vname] = d

    spark = get_spark("roworder_sweep")
    failed: list[str] = []
    for name in todo:
        fn = queries[name]
        t0 = time.time()
        try:
            s_n, s_cols, s_hash, _ = _run(spark, fn, sf_dir)
        except Exception as e:
            print(f"{name}: ERROR on source {type(e).__name__}: {e}")
            failed.append(name)
            continue
        bad = []
        for vname, d in vdirs.items():
            try:
                v_n, v_cols, v_hash, _ = _run(spark, fn, d)
            except Exception as e:
                bad.append(f"{vname}: ERROR {type(e).__name__}: {e}")
                continue
            if name not in oracles:
                # rows tier: count-stable is the contract.
                if v_n != s_n:
                    bad.append(f"{vname}: rows {v_n} != {s_n}")
            elif (v_n, v_cols, v_hash) != (s_n, s_cols, s_hash):
                bad.append(
                    f"{vname}: rows {v_n}/{s_n} cols_eq={v_cols == s_cols}"
                    f" hash_eq={v_hash == s_hash}"
                )
        tier = "hash" if name in oracles else "rows"
        if bad:
            print(f"{name}: FAIL [{tier}]  " + "; ".join(bad))
            failed.append(name)
        else:
            print(f"{name}: PASS [{tier}] ({time.time()-t0:.1f}s)")

    print(f"\n{len(todo) - len(failed)}/{len(todo)} layout-invariant")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
