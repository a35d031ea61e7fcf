"""Storage-encoding variant dirs (r10): same LOGICAL tables, different
PHYSICAL parquet — the mixed-writer-lake axis.

    python tools/make_encoded_dir.py /root/testdata/sf0.01 /tmp/fsk_enc zstd_v2
    python tools/preflight.py /tmp/fsk_enc

A 100 TB lake accretes files from many writers over years: different
compression codecs, data-page versions, dictionary policies, row-group
sizes. None of that may leak into query results — but it absolutely
changes the decode paths exercised (v2 data pages, non-dictionary
fallback, per-row-group stats granularity, AQE's post-scan size
estimates). Variants (all via pyarrow, a DIFFERENT writer than the
driver's original files):

- ``zstd_v2``    — zstd codec, data-page format v2, dictionary ON.
- ``gzip_nodict`` — gzip codec, dictionary DISABLED (plain encoding
                    fallback for every column).
- ``tiny_groups`` — snappy, row groups of 1000 rows: many row groups
                    per file, maximally fragmented stats; AQE and
                    row-group pruning see a completely different file
                    geometry.

Timestamps/schemas pass through pyarrow unchanged (the events.ts
physical-form variance the loader already handles is preserved, not
normalized). Values are byte-identical logically; two builds of the
same variant are deterministic.
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

VARIANTS = {
    "zstd_v2": dict(
        compression="zstd", data_page_version="2.0", use_dictionary=True
    ),
    "gzip_nodict": dict(
        compression="gzip", data_page_version="1.0", use_dictionary=False
    ),
    "tiny_groups": dict(
        compression="snappy", data_page_version="1.0", use_dictionary=True,
        row_group_size=1000,
    ),
}


def build(src: str, dest: str, variant: str) -> None:
    opts = dict(VARIANTS[variant])
    rg = opts.pop("row_group_size", None)
    os.makedirs(dest, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        kw = dict(opts)
        if rg is not None:
            kw["row_group_size"] = rg
        pq.write_table(tbl, os.path.join(dest, f"{t}.parquet"), **kw)
        print(f"{t}: {tbl.num_rows} rows -> {variant}", flush=True)


def main() -> int:
    if len(sys.argv) < 4 or sys.argv[3] not in VARIANTS:
        print(
            f"usage: make_encoded_dir.py <src_sf_dir> <dest> "
            f"<{'|'.join(VARIANTS)}>",
            file=sys.stderr,
        )
        return 2
    build(sys.argv[1], sys.argv[2], sys.argv[3])
    print(f"encoded dir ready: {sys.argv[2]} ({sys.argv[3]})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
