"""Probabilistic-structure operators made hash-verifiable.

This module carries the PORTABLE sketch constructions whose every
bit is pinned by md5, so both engines build the identical sketch and
the driver can hash-compare it. (`q_agg_approx_cd` — once rows-only
because Spark's internal HLL isn't bit-comparable to DuckDB's — was
re-registered hash-tier in r6 on the same portable construction as
q_sketch_hll and now lives in plans/approx_cd.py; Spark's native
approx_count_distinct stays a test-tier behavior in
tests/test_sketches.py.)

- q_sketch_cms: Count-Min sketch (depth 4 x width 64) over the
  events.event_type frequency stream, plus the point-query estimates
  it yields next to the true counts (est >= true always; equality
  breaks exactly where hash collisions land — all deterministic).
- q_sketch_bloom: Bloom filter (m=2048 bits, k=4) over the
  high-value-customer key set, probed with EVERY customer — output
  is the full membership table (ground truth vs filter answer), so
  the false-positive surface itself is hash-checked.
- q_sketch_hll: the 256 HLL registers (bucket, max leading-zero
  rank) over events.user_id — the mergeable state an engine ships
  between executors, not the float estimate derived from it.
- q_sketch_quantile: equi-width histogram quantile estimates with
  explicit [lo, hi] bin-bound error brackets — the fourth sketch
  axis (quantiles) next to frequency/membership/cardinality; pure
  integer binning, no md5 needed.

Cross-engine determinism: the first three use the repo's md5-60-bit trick
(``conv(substr(md5(x),1,15),16,10)`` == DuckDB
``('0x'||substr(md5(x),1,15))::BIGINT``) with integer mod/div only;
rank extraction uses ``length(bin(v))`` (integer floor-log2+1),
verified identical in both engines including bin(0)='0'. No float is
ever constructed.

Why sketches are the 100 TB story: each is ONE linear scan whose
shuffle carries the SKETCH, not the data — CMS cells are counter
sums (partial map-side combine collapses each partition to <=256
cells), HLL registers are per-partition max-merge (<=256 rows), and
the Bloom bit-set is a distinct-union of <=2048 positions that then
BROADCASTS to the probe side. State is O(sketch size), independent
of N — exactly why engines ship these structures instead of exact
distinct sets. The reference demo itself keeps no sketch state
(SURVEY.md §1.1 [PK] — k x d centroids are its only aggregate
state); these extend the engine along the brief's training-pipeline
axis (frequency/membership/cardinality profiling of a 100 TB
corpus).

WINDOW NOTE: the round-6 rotation plan that used to live here was
EXECUTED in round 6 (this module now registers first); the canonical
rotation plan — including the round-7 window — lives in
plans/registry.py next to ``_MODULES``.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.hashing import DUCK_H60, SPARK_H60
from ..sources.loader import load_table, local_df
from .registry import register

# The shared md5 -> 60-bit-integer bridge (same construction as
# plans/textops.py `_SPARK_H60`/`_DUCK_H60`, restated here so this
# module's oracles read standalone).
# Canonical copies live in functions/hashing.py (non-registering —
# review r6 hoist); local underscore aliases keep call sites short.
_SPARK_H60, _DUCK_H60 = SPARK_H60, DUCK_H60

# ---------------------------------------------------------------------------
# q_sketch_cms

_CMS_DEPTH = 4
_CMS_WIDTH = 64

_CMS_KEY_SPARK = "concat(cast(j as string), ':', event_type)"
_CMS_KEY_DUCK = "CAST(j AS VARCHAR) || ':' || event_type"


@register(
    "q_sketch_cms",
    oracle=f"""
    WITH counts AS (
        SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
    ), d AS (
        SELECT CAST(t.range AS INT) AS j FROM range({_CMS_DEPTH}) t
    ), hashed AS (
        SELECT c.event_type, c.n, d.j,
               CAST({_DUCK_H60.format(x=_CMS_KEY_DUCK)} % {_CMS_WIDTH} AS INT)
                   AS col
        FROM counts c CROSS JOIN d
    ), cells AS (
        SELECT j, col, CAST(SUM(n) AS BIGINT) AS cnt
        FROM hashed GROUP BY j, col
    )
    SELECT h.event_type, h.n AS true_n,
           CAST(MIN(cl.cnt) AS BIGINT) AS est_n
    FROM hashed h JOIN cells cl USING (j, col)
    GROUP BY h.event_type, h.n
    """,
)
def q_sketch_cms(spark, sf_dir):
    """Count-Min sketch (depth 4 x width 64) of the event_type
    frequency distribution + its point-query answers vs ground truth.

    Construction is the distributed one: frequencies are first
    collapsed by a hash-aggregate (partial map-side combine — the
    shuffle carries one row per distinct key, not per event), then
    each (key, count) increments its depth x 1 cells; cell counters
    sum. Incrementing per-event and merging per-partition sketches
    counter-wise yields the identical table — CMS is a linear
    sketch, which is exactly why it survives 100 TB: the reduce
    state is the 256-cell grid regardless of N. The probe side
    re-hashes each key and takes min over depth rows
    (est_n >= true_n, with equality unless a collision inflates a
    cell — all pinned by md5, so both engines see the same
    collisions). The 4-row depth frame is a broadcast literal."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    depth = spark.range(_CMS_DEPTH).select(F.col("id").cast("int").alias("j"))
    hashed = counts.crossJoin(F.broadcast(depth)).select(
        "event_type",
        "n",
        "j",
        (F.expr(_SPARK_H60.format(x=_CMS_KEY_SPARK)) % _CMS_WIDTH)
        .cast("int")
        .alias("col"),
    )
    cells = hashed.groupBy("j", "col").agg(
        F.sum("n").cast("bigint").alias("cnt")
    )
    return (
        hashed.join(cells, ["j", "col"])
        .groupBy("event_type", "n")
        .agg(F.min("cnt").cast("bigint").alias("est_n"))
        .select("event_type", F.col("n").alias("true_n"), "est_n")
    )


# ---------------------------------------------------------------------------
# q_sketch_bloom

_BLOOM_M = 2048
_BLOOM_K = 4
_BLOOM_CUT = 490000  # member set ~18% of customers at sf0.01 -> the
#   filter sits at ~40% bit occupancy (k*|S|=1080 of m=2048), i.e.
#   FPR ~ 3%: sparse enough to answer "no" usefully, dense enough
#   that a few md5-pinned false positives land in the hash check

_BLOOM_KEY_SPARK = "concat(cast(j as string), ':', cast({key} as string))"
_BLOOM_KEY_DUCK = "CAST(j AS VARCHAR) || ':' || CAST({key} AS VARCHAR)"


@register(
    "q_sketch_bloom",
    oracle=f"""
    WITH members AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_totalprice > {_BLOOM_CUT}
    ), k AS (
        SELECT CAST(t.range AS INT) AS j FROM range({_BLOOM_K}) t
    ), bits AS (
        SELECT DISTINCT
               CAST({_DUCK_H60.format(x=_BLOOM_KEY_DUCK.format(key='o_custkey'))}
                    % {_BLOOM_M} AS INT) AS bit
        FROM members CROSS JOIN k
    ), probes AS (
        SELECT c.c_custkey, k.j,
               CAST({_DUCK_H60.format(x=_BLOOM_KEY_DUCK.format(key='c_custkey'))}
                    % {_BLOOM_M} AS INT) AS bit
        FROM customer c CROSS JOIN k
    ), hits AS (
        SELECT p.c_custkey,
               CAST(SUM(CASE WHEN b.bit IS NULL THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_hits
        FROM probes p LEFT JOIN bits b ON p.bit = b.bit
        GROUP BY p.c_custkey
    )
    SELECT h.c_custkey,
           CAST(CASE WHEN m.o_custkey IS NULL THEN 0 ELSE 1 END AS INT)
               AS is_member,
           CAST(CASE WHEN h.n_hits = {_BLOOM_K} THEN 1 ELSE 0 END AS INT)
               AS bloom_hit
    FROM hits h LEFT JOIN members m ON h.c_custkey = m.o_custkey
    """,
)
def q_sketch_bloom(spark, sf_dir):
    """Bloom filter (m=2048 bits, k=4) over the high-value-customer
    key set, probed with every customer; output = per-customer ground
    truth vs filter answer, so the filter's exact false-positive set
    is part of the hash check (bloom_hit >= is_member row-wise; the
    gap rows are the md5-pinned collisions).

    Scale shape: the bit set is a DISTINCT of <=2048 integers — it
    broadcasts (explicit F.broadcast on the probe join), which is
    precisely how engines ship bloom filters to scan sites for
    semi-join pushdown (cf. the runtime-bloom-injection behavior
    test-tier in tests/test_properties.py; this query is its
    portable, hash-verifiable twin). The probe side is one linear
    pass x k hashes with a map-side LEFT join against the broadcast
    bits; no shuffle touches the fact table."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    k = spark.range(_BLOOM_K).select(F.col("id").cast("int").alias("j"))

    members = (
        o.where(F.col("o_totalprice") > _BLOOM_CUT)
        .select("o_custkey")
        .distinct()
    )
    bits = (
        members.crossJoin(F.broadcast(k))
        .select(
            (
                F.expr(_SPARK_H60.format(x=_BLOOM_KEY_SPARK.format(key="o_custkey")))
                % _BLOOM_M
            )
            .cast("int")
            .alias("bit")
        )
        .distinct()
    )
    probes = c.select("c_custkey").crossJoin(F.broadcast(k)).select(
        "c_custkey",
        (
            F.expr(_SPARK_H60.format(x=_BLOOM_KEY_SPARK.format(key="c_custkey")))
            % _BLOOM_M
        )
        .cast("int")
        .alias("bit"),
    )
    hits = (
        probes.join(F.broadcast(bits.withColumn("present", F.lit(1))), "bit", "left")
        .groupBy("c_custkey")
        .agg(F.sum(F.coalesce("present", F.lit(0))).alias("n_hits"))
    )
    return hits.join(
        F.broadcast(members.withColumnRenamed("o_custkey", "c_custkey").withColumn("mem", F.lit(1))),
        "c_custkey",
        "left",
    ).select(
        "c_custkey",
        F.coalesce("mem", F.lit(0)).cast("int").alias("is_member"),
        (F.col("n_hits") == _BLOOM_K).cast("int").alias("bloom_hit"),
    )


# ---------------------------------------------------------------------------
# q_sketch_hll

_HLL_BUCKETS = 256  # 2^8 buckets; remaining 52 hash bits feed the rank


@register(
    "q_sketch_hll",
    oracle=f"""
    WITH h AS (
        SELECT {_DUCK_H60.format(x="CAST(user_id AS VARCHAR)")} AS hv
        FROM events
    ), br AS (
        SELECT CAST(hv % {_HLL_BUCKETS} AS INT) AS bucket,
               hv // {_HLL_BUCKETS} AS v
        FROM h
    )
    SELECT bucket,
           CAST(MAX(CASE WHEN v = 0 THEN 53
                         ELSE 53 - length(bin(v)) END) AS INT) AS max_rank
    FROM br GROUP BY bucket
    """,
)
def q_sketch_hll(spark, sf_dir):
    """HyperLogLog register file (256 buckets) over events.user_id —
    the mergeable sketch STATE, not the float estimate derived from
    it (the estimate's harmonic mean is exactly the kind of
    float-summation surface the repo's determinism rules ban from
    hash queries; the registers are pure integers).

    bucket = low 8 bits of the 60-bit md5 hash; rank = 1-based
    position of the first set bit in the remaining 52 bits,
    computed as 53 - length(bin(v)) — bin() renders without leading
    zeros in both engines, so its length is floor(log2 v)+1, an
    all-integer leading-zero count (v=0 => rank 53, the all-zeros
    convention). groupBy(bucket).max(rank) compiles to partial+final
    HashAggregate: every partition reduces to <=256 register rows
    before the shuffle — the exact per-executor max-merge an engine
    uses to combine HLL state at 100 TB, where the answer's cost is
    one scan + a 256-row reduce regardless of N.

    This is the register-file face of the same portable construction
    q_agg_approx_cd (plans/approx_cd.py, hash-tier since r6) finishes
    into an integer-exact estimate — native engine sketches are not
    bit-comparable across engines; this construction is."""
    e = load_table(spark, sf_dir, "events")
    h = e.select(
        F.expr(_SPARK_H60.format(x="cast(user_id as string)")).alias("hv")
    )
    br = h.select(
        (F.col("hv") % _HLL_BUCKETS).cast("int").alias("bucket"),
        F.expr(f"hv div {_HLL_BUCKETS}").alias("v"),
    )
    rank = F.when(F.col("v") == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.expr("bin(v)"))
    )
    return br.groupBy("bucket").agg(
        F.max(rank).cast("int").alias("max_rank")
    )


# ---------------------------------------------------------------------------
# q_sketch_quantile

_QH_BINS = 128
_QH_PCTS = (50, 90, 95, 99)


@register(
    "q_sketch_quantile",
    oracle=f"""
    WITH stats AS (
        SELECT MIN(n_chars) AS mn, MAX(n_chars) AS mx FROM documents
    ), b AS (
        SELECT ((n_chars - mn) * {_QH_BINS}) // (mx - mn + 1) AS bin
        FROM documents, stats
        WHERE n_chars IS NOT NULL
    ), h AS (
        SELECT bin, COUNT(*) AS n FROM b GROUP BY bin
    ), c AS (
        SELECT bin, SUM(n) OVER (ORDER BY bin) AS cum,
               SUM(n) OVER () AS total
        FROM h
    ), probes AS (
        SELECT CAST(p AS INT) AS p
        FROM unnest([{', '.join(str(p) for p in _QH_PCTS)}]) t(p)
    ), hit AS (
        SELECT probes.p, MIN(c.bin) AS bin
        FROM probes JOIN c ON 100 * c.cum >= probes.p * c.total
        GROUP BY probes.p
    )
    SELECT p, bin,
           mn + (bin * (mx - mn + 1) + {_QH_BINS} - 1) // {_QH_BINS} AS lo,
           mn + ((bin + 1) * (mx - mn + 1) + {_QH_BINS} - 1) // {_QH_BINS} - 1
               AS hi
    FROM hit, stats
    """,
)
def q_sketch_quantile(spark, sf_dir):
    """Equi-width histogram quantile sketch over document lengths —
    the distributed approximate-percentile construction (one scan,
    128-counter mergeable state, answer = first bin whose cumulative
    count crosses p% of total), completing the portable sketch
    family: frequency (CMS) / membership (Bloom) / cardinality (HLL)
    / QUANTILES. Every registered quantile before this one is exact
    (q_agg_percentile) — this is the shape you run when a full sort
    or exact percentile is off the table at 100 TB, with the bin
    width as the error bound (output lo..hi brackets the true
    quantile when the estimate's bin is exact-integer arithmetic,
    which it is: n_chars is a BIGINT, binning is
    ((v - mn)*128) div (mx - mn + 1), all integer, no float ever).

    Scale: the histogram build is partial+final HashAggregate on
    ≤128 keys (every partition reduces to its local 128 counters
    before the shuffle — counter-wise merge, same linearity as the
    CMS); the cumulative window runs over ≤128 rows (single-task by
    construction, on sketch-sized data — not a data-sized sort); the
    min/max pre-pass and the 4-row probe frame broadcast."""
    # Participation contract (law 45, composed-dir config sweep): a
    # document with NULL n_chars has no length and cannot occupy a
    # histogram bin — unfiltered, its NULL bin lands FIRST in Spark's
    # cumulative window and LAST in DuckDB's (law 2/40 on the window
    # ORDER key), shifting every crossing by the NULL group's count.
    d = load_table(spark, sf_dir, "documents").where(
        F.col("n_chars").isNotNull()
    )
    stats = d.agg(
        F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx")
    )
    b = d.crossJoin(F.broadcast(stats)).select(
        F.expr(f"((n_chars - mn) * {_QH_BINS}) div (mx - mn + 1)").alias("bin")
    )
    h = b.groupBy("bin").agg(F.count(F.lit(1)).alias("n"))
    return histogram_quantiles(spark, h, stats=stats)


def histogram_quantiles(
    spark, h, mn=None, width=None, bins=_QH_BINS, pcts=_QH_PCTS, stats=None
):
    """Shared quantile finisher over a (bin, n) histogram frame: the
    cumulative/total windows (sketch-sized data — ≤``bins`` rows),
    the broadcast probe frame, and the [lo, hi] bin-bound columns.
    Used by BOTH q_sketch_quantile here (pass ``stats``, a 1-row
    (mn, mx) frame kept in-plan via broadcast crossJoin — no driver
    round trip) and q_stream_quantile (plans/streams.py, lazy
    import; passes ``mn``/``width`` scalars it already collected for
    the bin codebook), so the two variants cannot silently diverge
    while claiming the same oracle.

    Bin b holds values v with b = (bins*(v-mn)) div width, i.e.
    ceil(b*width/bins) <= v-mn <= ceil((b+1)*width/bins) - 1 — the
    bounds need CEIL division. Floor division (the original form)
    inverts the bracket whenever width < bins (e.g. a constant
    column: width 1 gave hi = lo - 1), caught by the
    bracket-law-over-distributions property test."""
    wc = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    wt = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    c = h.select(
        "bin",
        F.sum("n").over(wc).alias("cum"),
        F.sum("n").over(wt).alias("total"),
    )
    probes = local_df(spark, [(p,) for p in pcts], "p int")
    hit = (
        F.broadcast(probes)
        .join(c, 100 * F.col("cum") >= F.col("p") * F.col("total"))
        .groupBy("p")
        .agg(F.min("bin").alias("bin"))
    )
    if stats is not None:
        hit = hit.crossJoin(F.broadcast(stats))
        mn_s, width_s = "mn", "(mx - mn + 1)"
    else:
        mn_s, width_s = str(mn), str(width)
    return hit.select(
        "p",
        "bin",
        F.expr(
            f"{mn_s} + (bin * {width_s} + {bins} - 1) div {bins}"
        ).alias("lo"),
        F.expr(
            f"{mn_s} + ((bin + 1) * {width_s} + {bins} - 1) div {bins} - 1"
        ).alias("hi"),
    )
