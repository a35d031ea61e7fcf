"""Build a row-order/physical-layout-permuted copy of an SF dir.

Every prior data sweep changed the VALUES (degenerate regimes,
composed fixtures, fuzz draws); every machinery sweep changed the
EXECUTION configs. This tool changes neither: it rewrites each table
with the SAME logical content in a different physical shape —

- a deterministic global permutation of row order (Philox, fixed
  seed, so two builds are byte-comparable and any finding reproduces
  without ``Math.random``-style nondeterminism);
- a different row-group geometry (ROW_GROUP_SIZE=4096 vs the source's
  writer default — many small groups instead of one large one);
- a different compression story: the single-file variant is written
  zstd with dictionary encoding OFF (the source is snappy+dict), and
  the multi-file variant cycles codecs PER SHARD (snappy, zstd, gzip,
  uncompressed) with dictionary encoding alternating — the
  mixed-codec directory a staged compaction or a codec migration
  leaves behind;
- optionally a multi-file layout: ``{t}.parquet`` becomes a DIRECTORY
  of K part files (contiguous slices of the permuted table, so every
  shard is a uniform sample), the shape a 1000-executor writer or a
  compaction job produces at 100 TB.

Why this axis matters operationally: at 100 TB nobody controls row
order. Compaction, re-ingest, different writer parallelism, and
Z-order clustering all permute rows and re-chunk files; a query whose
result depends on input order or file geometry is a nondeterministic
production bug. The registry's determinism rules (every LIMIT/top-k
totally ordered, no first/last without ORDER BY, streaming batches
split by EVENT-TIME rank not input position — sources/replay.py) are
exactly the design that makes results layout-invariant; this fixture
plus tools/roworder_sweep.py is the empirical check.

pyarrow (not DuckDB) does the rewrite so physical column types
round-trip exactly — a DuckDB read+write would e.g. rewrite timestamp
columns through its own type lattice, and the fixture must differ
from the source in LAYOUT ONLY.

Usage: python tools/make_permuted_dir.py SRC DEST [--files K]
Default K=1 (single permuted file per table). K>1 writes the
directory layout described above.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from flink_streaming_kmeans_spark.sources.loader import TABLES  # noqa: E402

# Fixed seed: builds are deterministic, findings reproduce.
SEED = 271_828_183
ROW_GROUP_SIZE = 4096


def build(src: str, dest: str, files: int = 1) -> None:
    os.makedirs(dest, exist_ok=True)
    for t in TABLES:
        tab = pq.read_table(os.path.join(src, f"{t}.parquet"))
        n = tab.num_rows
        perm = np.random.Generator(np.random.Philox(SEED)).permutation(n)
        tab = tab.take(pa.array(perm))
        out = os.path.join(dest, f"{t}.parquet")
        if files <= 1:
            pq.write_table(
                tab,
                out,
                row_group_size=ROW_GROUP_SIZE,
                compression="zstd",
                use_dictionary=False,
            )
            continue
        # Directory layout: contiguous slices AFTER the permutation,
        # so each part file is a uniform random sample of the table
        # (position-correlated shards would make a skipped/reordered
        # file read look statistically plausible instead of failing
        # the hash loudly).
        os.makedirs(out, exist_ok=True)
        codecs = ["snappy", "zstd", "gzip", "none"]
        bounds = np.linspace(0, n, files + 1).astype(int)
        for i in range(files):
            shard = tab.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
            pq.write_table(
                shard,
                os.path.join(out, f"part-{i:03d}.parquet"),
                row_group_size=ROW_GROUP_SIZE,
                compression=codecs[i % len(codecs)],
                use_dictionary=(i % 2 == 0),
            )


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) != 2:
        print(__doc__, file=sys.stderr)
        return 2
    files = 1
    for a in sys.argv[1:]:
        if a.startswith("--files"):
            files = int(a.split("=", 1)[1]) if "=" in a else int(
                sys.argv[sys.argv.index(a) + 1]
            )
    build(args[0], args[1], files)
    print(f"built {args[1]} from {args[0]} (files={files})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
