"""Build a K-times-scaled SF dir for the empirical scale probe
(r7 verdict task 5: the 100 TB claims were plan-shape arguments plus
sf0.1 timings; one measured order of magnitude hardens them).

    python tools/make_scaled_dir.py /root/testdata/sf0.1 /tmp/fsk_sf1x10 10

Each fact table is the union of K key-shifted copies (copy 0 is the
original, byte-identical), so the scaled dir is a superset of the
source and every FK that matters to the probe queries stays
consistent per copy:

- lineitem/orders/customer shift l_orderkey / o_orderkey / o_custkey /
  c_custkey by i*SHIFT (part/supplier/nation/region dims are copied
  as-is — dims grow slower than facts in any real lake, and the probe
  queries join them broadcast anyway).
- events shift event_id/user_id and nudge ts by i seconds (stays
  inside the natural time span; user COUNT grows K-fold so per-user
  event density — session/window state per key — stays constant,
  which is the realistic scale regime: more users, not longer
  histories).
- documents shift doc_id and Caesar-shift the letters a-j per copy
  (length-preserving, deterministic): every copy's shingle set is
  DISTINCT, so near-dup/LSH bucket sizes grow ~linearly with K
  instead of fabricating K-clones whose candidate pairs grow
  quadratically — the probe must measure the ENGINE's scaling, not a
  planted dup-rate change. n_chars is unchanged by construction.
- embeddings shift vec_id and nudge each component by i*1e-3 (stays
  finite and inside EMB_BOUND), labels unchanged.

Values are deterministic (no randomness), so two builds are
byte-comparable and any probe finding reproduces.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

# Above every key max in any driver testdata generation (sf0.1 order
# keys top out ~6e5); copies can never collide.
SHIFT = 10_000_000

COPY_AS_IS = ["region", "nation", "supplier", "part"]


def build(src: str, dest: str, k: int) -> None:
    os.makedirs(dest, exist_ok=True)
    for t in COPY_AS_IS:
        shutil.copy(
            os.path.join(src, f"{t}.parquet"), os.path.join(dest, f"{t}.parquet")
        )
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")

    def scaled(name: str, select_for_copy) -> None:
        s = os.path.join(src, f"{name}.parquet")
        parts = [select_for_copy(i, s) for i in range(k)]
        con.sql(
            f"COPY ({' UNION ALL '.join(parts)}) TO "
            f"'{os.path.join(dest, f'{name}.parquet')}' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 131072)"
        )

    scaled("customer", lambda i, s: f"""
        SELECT c_custkey + {i * SHIFT} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM read_parquet('{s}')""")

    scaled("orders", lambda i, s: f"""
        SELECT o_orderkey + {i * SHIFT} AS o_orderkey,
               o_custkey + {i * SHIFT} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM read_parquet('{s}')""")

    scaled("lineitem", lambda i, s: f"""
        SELECT l_orderkey + {i * SHIFT} AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{s}')""")

    scaled("events", lambda i, s: f"""
        SELECT event_id + {i * SHIFT} AS event_id,
               ts + INTERVAL ({i}) SECOND AS ts,
               user_id + {i * SHIFT} AS user_id,
               event_type, value, props
        FROM read_parquet('{s}')""")

    # Per-copy Caesar shifts over TWO disjoint alphabets (i%10 shifts
    # a-j, i//10 shifts k-t): length-preserving and distinct for up to
    # 100 copies. A single 10-letter shift made copies 0,10,20,...
    # bit-identical at K=100 — the first 100x probe measured a PLANTED
    # 10-fold dup-rate in the LSH buckets, not engine scaling (its
    # q_dedup_lsh grew 25x between the 10x and 100x rungs; with
    # distinct copies the growth is linear again).
    def doc_copy(i: int, s: str) -> str:
        a1, a2 = "abcdefghij", "klmnopqrst"
        t1 = (a1 + a1)[i % 10:][:10]
        t2 = (a2 + a2)[(i // 10) % 10:][:10]
        return f"""
        SELECT doc_id + {i * SHIFT} AS doc_id,
               translate(text, '{a1 + a2}', '{t1 + t2}') AS text,
               lang, source, n_chars
        FROM read_parquet('{s}')"""

    scaled("documents", doc_copy)

    scaled("embeddings", lambda i, s: f"""
        SELECT vec_id + {i * SHIFT} AS vec_id,
               CAST(list_transform(embedding, x -> x + {i} * 0.001)
                    AS FLOAT[]) AS embedding,
               label
        FROM read_parquet('{s}')""")


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fsk_scaled_dir"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    build(src, dest, k)
    for t in COPY_AS_IS + ["customer", "orders", "lineitem", "events",
                           "documents", "embeddings"]:
        import pyarrow.parquet as pq

        p = os.path.join(dest, f"{t}.parquet")
        print(f"{t}: {pq.ParquetFile(p).metadata.num_rows} rows")
    print(f"scaled dir ready: {dest} (x{k} of {src})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
