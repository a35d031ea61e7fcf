"""Late round-5 coverage additions: ORC interop, forward as-of join,
and driver-visible PCA evidence.

- q_source_orc completes the source/sink format matrix (parquet /
  partitioned parquet / CSV / JSONL / gzip-JSONL were already
  driver-checked; ORC is the remaining columnar format Spark ships a
  native vectorized reader for — no extra package, same pushdown
  machinery as parquet).
- q_join_asof_fwd is the mirror of q_join_asof: "next at-or-after"
  instead of "most recent prior" — the lookup a pipeline does to
  attach the NEXT scheduled rollout/deploy/price-change to an event.
  Same operators/asof.py union+window construction (direction=
  "forward"), same single |L|+|R| shuffle; oracle is DuckDB's native
  ASOF with the inequality flipped.
- q_emb_pca registers the PCA operator (operators/pca.py, previously
  test-tier only) so it earns a driver row. Rows-tier by necessity:
  the oracle side cannot run an eigendecomposition in SQL (same
  class as q_ml_kmeans_iter's driver loop). Correctness is carried
  by tests/test_pca.py's numpy-parity tests; the registered query
  pins determinism by quantizing the projected coordinates.
- q_join_asof_tol bounds the as-of match with an attribution window
  (pandas merge_asof tolerance / kdb wj semantics): nearest-prior
  match discarded — not replaced — when it falls outside the window,
  so a post-filter on the single match is exactly equivalent and the
  plan stays the one-shuffle asof shape.

- q_evt_cep is the Flink-CEP-analog sequence-pattern match: strict
  (`next()`) contiguity counted with the integer replace-trick,
  relaxed (`followedBy()`) contiguity as a %-only LIKE — no regex
  engine is consulted, so the two engines cannot disagree.

WINDOW NOTE: registered AFTER the round-5 correctness window; the
round-6 rotation plan in plans/sketches.py's docstring allocates
coverage(5) its slots.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.loader import _tmp_out, load_table
from .registry import register

# ---------------------------------------------------------------------------
# q_source_orc


@register(
    "q_source_orc",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(30,6))) AS DOUBLE)
               AS sum_price
    FROM part
    GROUP BY p_brand
    """,
)
def q_source_orc(spark, sf_dir):
    """ORC source round-trip: write part as ORC, re-read with an
    EXPLICIT schema (the same no-inference rule as q_source_csv —
    schema inference is an extra full pass at 100 TB), aggregate.
    Spark's native ORC reader is vectorized and does predicate
    pushdown / column pruning exactly like parquet, so the format
    choice is an interop question, not a plan-shape one. The oracle
    recomputes from the parquet source, proving the ORC round-trip
    is lossless (doubles included — ORC stores them as IEEE bits)."""
    p = load_table(spark, sf_dir, "part")
    out = _tmp_out("orc", sf_dir)
    p.write.mode("overwrite").orc(out)
    back = spark.read.schema(
        "p_partkey bigint, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double"
    ).orc(out)
    return back.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(F.col("p_retailprice").cast("decimal(30,6)"))
        .cast("double")
        .alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# q_join_asof_fwd


@register(
    "q_join_asof_fwd",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'click'
    ), c AS (
        SELECT user_id, ts, event_id AS click_id, value AS click_value
        FROM clicks WHERE rn = 1
    ), p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, c.click_id, c.click_value
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts
    """,
)
def q_join_asof_fwd(spark, sf_dir):
    """Forward as-of join: for every purchase, the EARLIEST click at
    or after it by the same user (NULLs when the user never clicks
    again) — q_join_asof with the time arrow flipped. Right rows are
    deduped to one per (user_id, ts) first (the asof_join tie
    contract); the oracle uses DuckDB's native ASOF with `<=`."""
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    )
    dedup_w = W.partitionBy("user_id", "ts").orderBy(F.desc("click_id"))
    clicks1 = (
        clicks.withColumn("rn", F.row_number().over(dedup_w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        purchases,
        clicks1,
        key="user_id",
        on="ts",
        payload=["click_id", "click_value"],
        direction="forward",
    )
    return out.select("event_id", "user_id", "click_id", "click_value")


# ---------------------------------------------------------------------------
# q_emb_pca (rows-tier)


@register("q_emb_pca")
def q_emb_pca(spark, sf_dir):
    """PCA projection of the 64-d embeddings onto the top-2 principal
    components (operators/pca.py: ONE mapInPandas moment pass whose
    shuffle carries P rows of d² partials, driver-side eigh on the
    64x64 covariance, then a codegen'd dot-product projection — no
    Python in the per-row path).

    Rows-tier: no SQL engine can express the eigendecomposition, so
    the driver records row count only; value-level correctness is
    tests/test_pca.py's numpy parity (components, explained variance,
    sign convention). Output coordinates are quantized to integers
    (floor of coord*1e4) so the result is stable run-to-run — eigh on
    identical covariance bits is deterministic, and the quantization
    removes any last-ulp sensitivity from the evidence surface."""
    from ..operators.pca import fit_pca, project

    emb = load_table(spark, sf_dir, "embeddings")
    mean, comps, _ = fit_pca(emb, k=2)
    proj = project(emb, mean, comps)
    return proj.select(
        "vec_id",
        "label",
        F.floor(F.col("pc0") * 10000).cast("bigint").alias("pc0_e4"),
        F.floor(F.col("pc1") * 10000).cast("bigint").alias("pc1_e4"),
    )


# ---------------------------------------------------------------------------
# q_join_asof_tol

_TOL_US = 3 * 86400 * 1000000  # 3-day attribution window, in microseconds


@register(
    "q_join_asof_tol",
    oracle=f"""
    WITH clicks AS (
        SELECT user_id, ts, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'click'
    ), c AS (
        SELECT user_id, ts, event_id AS click_id, value AS click_value
        FROM clicks WHERE rn = 1
    ), p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), m AS (
        SELECT p.event_id, p.user_id, p.ts AS pts,
               c.ts AS cts, c.click_id, c.click_value
        FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    )
    SELECT event_id, user_id,
           CASE WHEN cts IS NOT NULL
                 AND date_diff('microsecond', cts, pts) <= {_TOL_US}
                THEN click_id END AS click_id,
           CASE WHEN cts IS NOT NULL
                 AND date_diff('microsecond', cts, pts) <= {_TOL_US}
                THEN click_value END AS click_value
    FROM m
    """,
)
def q_join_asof_tol(spark, sf_dir):
    """As-of join with a TOLERANCE: the most recent prior click, but
    only if it happened within a 3-day attribution window (pandas
    merge_asof(tolerance=...) / kdb wj semantics — the
    marketing-attribution and sensor-staleness lookup). Matches
    farther back than the window are discarded, NOT replaced by an
    older candidate — since the as-of match is the NEAREST prior, any
    other prior row is farther, so post-filtering the single match is
    exactly equivalent and costs nothing extra: the plan is the same
    ONE |L|+|R| shuffle as q_join_asof.

    The matched right timestamp rides along in the asof payload
    struct; the window test runs in integer microseconds
    (unix_micros vs DuckDB date_diff('microsecond')) — no float, no
    calendar arithmetic."""
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    )
    dedup_w = W.partitionBy("user_id", "ts").orderBy(F.desc("click_id"))
    clicks1 = (
        clicks.withColumn("rn", F.row_number().over(dedup_w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        purchases,
        clicks1,
        key="user_id",
        on="ts",
        payload=["click_ts", "click_id", "click_value"],
    )
    in_window = F.col("click_ts").isNotNull() & (
        F.unix_micros("ts") - F.unix_micros("click_ts") <= F.lit(_TOL_US)
    )
    return out.select(
        "event_id",
        "user_id",
        F.when(in_window, F.col("click_id")).alias("click_id"),
        F.when(in_window, F.col("click_value")).alias("click_value"),
    )


# ---------------------------------------------------------------------------
# q_evt_cep


@register(
    "q_evt_cep",
    oracle="""
    WITH seqs AS (
        SELECT user_id,
               COUNT(*) AS n_events,
               string_agg(substr(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS seq
        FROM events GROUP BY user_id
    )
    SELECT user_id, n_events,
           CAST((length(seq) - length(replace(seq, 'vcp', ''))) // 3
                AS BIGINT) AS n_funnels,
           CAST(CASE WHEN seq LIKE '%v%c%p%' THEN 1 ELSE 0 END AS INT)
               AS converted
    FROM seqs
    """,
)
def q_evt_cep(spark, sf_dir):
    """Complex-event-processing pattern match — the Flink CEP analog
    (the reference ecosystem's sequence-pattern library; SURVEY §1
    [PK] notes the demo itself ships none, so this is the engine's
    training/analytics-axis extension of it). Per user, the event
    stream is serialized to an initial-letter sequence with a total
    (ts, event_id) order, then two pattern tiers are evaluated:
    n_funnels = count of STRICTLY CONTIGUOUS view→click→purchase
    runs (Flink CEP `next()` contiguity), and converted = whether a
    RELAXED view..click..purchase subsequence exists (CEP
    `followedBy()` contiguity, q_evt_funnel's semantics).

    Determinism: the contiguous count is the replace-trick integer
    `(len(seq) - len(replace(seq,'vcp',''))) / 3` — left-to-right
    non-overlapping replacement is identical in both engines and no
    regex engine is consulted; the relaxed tier is a LIKE with `%`
    wildcards only. Scale: one user-keyed aggregate; per-user state
    is the user's own event sequence (bounded by per-user activity,
    the same state a CEP NFA keeps), map-side combine collapses each
    partition's per-user slices."""
    e = load_table(spark, sf_dir, "events")
    seqs = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("ts"),
                            F.col("event_id"),
                            F.substring("event_type", 1, 1).alias("i"),
                        )
                    )
                ),
                lambda s: s["i"],
            ),
            "",
        ).alias("seq"),
    )
    return seqs.select(
        "user_id",
        "n_events",
        F.expr("CAST((length(seq) - length(replace(seq, 'vcp', ''))) div 3 AS BIGINT)").alias(
            "n_funnels"
        ),
        F.col("seq").like("%v%c%p%").cast("int").alias("converted"),
    )
