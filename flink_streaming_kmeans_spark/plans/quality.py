"""Round-5 driver-window module: the rewritten quality score and the
hash-tier unrolled Lloyd iteration.

Placed as its own registry module so the round-5 correctness-window
rotation can put exactly these two queries right behind training.py
(registry.py `_MODULES`) without dragging a whole module's worth of
already-green rows into the 50-slot window.

`q_text_quality` history: driver `hash_match: false` in BOTH r03 and
r04 while the identical check passed locally every time. r03 blamed
float `round(x*1e4+0.5)` midpoints; r04 moved the arithmetic to scaled
integers but still DIVIDED back to a double (`scaled/10000.0`) for the
output column — and the driver stayed red. Per the r04 verdict the fix
is to remove the disputed representation entirely: the score is now
emitted as the scaled BIGINT `quality_e4` (score*1e4), computed with
pure integer arithmetic on BOTH engines — no double is ever
constructed, so no rounding/canonicalization surface remains. This is
the same quantization pattern that cured q_emb_normalize's r3 red
(plans/llm.py q_emb_normalize).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.vector import emb_finite, mround, sql_davg, sql_mround, sql_emb_finite
from ..operators.kmeans import ASSIGN_CTE, assign, init_centroids, update
from ..sources.loader import fan_out, load_table
from .registry import register


@register(
    "q_text_quality",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ), feat AS (
        SELECT doc_id,
               COUNT(*) AS n_tokens,
               COUNT(DISTINCT tok) AS n_distinct,
               CAST(SUM(CASE WHEN tok IN ('the', 'a', 'value', 'data')
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
        FROM toks GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_distinct, n_stop,
           CAST(50 * LEAST(n_tokens, 100)
                + ((2 * (3000 * (n_tokens - n_stop) + 2000 * n_distinct)
                    + n_tokens) // (2 * n_tokens))
                AS BIGINT) AS quality_e4
    FROM feat
    """,
)
def q_text_quality(spark, sf_dir):
    """Document quality scoring: length credit + (1 - stopword ratio)
    + type/token ratio, the standard cheap pre-filter features of a
    training-data pipeline. One explode + one hash-aggregate keyed by
    doc_id — linear, uniform, scales.

    The score 0.5*min(t/100,1) + 0.3*(1-s/t) + 0.2*(d/t) is emitted as
    the half-up-rounded scaled integer quality_e4 = score*1e4 =
    50*min(t,100) + round((3000*(t-s) + 2000*d)/t), where the half-up
    round of the ratio is the all-integer floor-division
    (2b + t) div (2t) — every operand and every intermediate is a
    BIGINT on both engines, so there is no floating-point object for
    the two engines (or the driver's canonicalization) to disagree on.
    See module docstring for why the double output had to die."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    feat = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct"),
        F.sum(
            F.when(F.col("tok").isin("the", "a", "value", "data"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_stop"),
    )
    quality_e4 = F.expr(
        "50 * LEAST(n_tokens, CAST(100 AS BIGINT))"
        " + ((2 * (3000 * (n_tokens - n_stop) + 2000 * n_distinct)"
        "      + n_tokens) div (2 * n_tokens))"
    )
    return feat.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        "n_stop",
        quality_e4.cast("bigint").alias("quality_e4"),
    )


# Round-1 assignment: operators/kmeans.ASSIGN_CTE, the canonical copy
# (review r6 follow-up: this module previously re-inlined the CTE as
# c0/s1/r1 with only a "keep in lockstep" comment — the exact drift
# hazard hoisting it to a non-registering module was meant to end;
# importing from operators fires no @register call, so registration
# order is untouched).
_R2_ORACLE = f"""
    {ASSIGN_CTE}, a1 AS (
        SELECT cid, embedding FROM ranked WHERE rn = 1
    ), u1 AS (
        SELECT cid, CAST(t.range AS INT) AS dim,
               {sql_davg('embedding[CAST(t.range AS INT) + 1]::DOUBLE', 'cq')}
        FROM a1 CROSS JOIN range(64) t
        GROUP BY cid, t.range
    ), c1 AS (
        SELECT cid, list(cq ORDER BY dim) AS cemb FROM u1 GROUP BY cid
    ), s2 AS (
        -- participation gate: lockstep with ASSIGN_CTE's emb CTE
        -- (NULL-embeddings + NaN/Inf sweeps r6; vec_id IS NOT NULL
        -- per the r7 NULL-entity-id probe — round 2 re-reads the raw
        -- table, and without the id gate the NULL-id vector rode back
        -- into the second assignment on the oracle side only)
        SELECT e.vec_id, c.cid,
               list_inner_product(e.embedding::DOUBLE[], c.cemb) AS dot
        FROM (SELECT vec_id, embedding FROM embeddings
              WHERE vec_id IS NOT NULL
                AND {sql_emb_finite('embedding')}) e CROSS JOIN c1 c
    ), r2 AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY dot DESC, cid) AS rn
        FROM s2
    )
    SELECT vec_id, CAST(cid AS INT) AS cluster_id,
           {sql_mround('1.0 - dot')} AS dist
    FROM r2 WHERE rn = 1
"""


@register("q_ml_kmeans_iter2", oracle=_R2_ORACLE)
def q_ml_kmeans_iter2(spark, sf_dir):
    """TWO unrolled Lloyd steps with a full-value DuckDB oracle — the
    r04-verdict stretch goal that turns the flagship's iteration loop
    (q_ml_kmeans_iter, rows-tier) into hash-checked driver evidence:
    assign → update → re-assign against the MOVED centroids, emitting
    every vector's round-2 assignment.

    Determinism across engines, step by step: round-1 dots are
    sequential double folds (dot64 == list_inner_product order, proven
    by q_ml_kmeans_assign); the round-1 means go through exact decimal
    summation + one double division (davg == sql_davg, proven by
    q_ml_kmeans_update); the moved centroids are then QUANTIZED to the
    1e-4 grid with the matched round on both engines, so round 2's
    inputs are bit-identical representable doubles and its dots/argmax
    agree exactly like round 1's. Ties → lowest cid everywhere.

    Scale: two broadcast-centroid scans + one k×64-group shuffle — the
    same per-iteration cost profile lloyd_iterate pays; nothing here
    grows with corpus size except the embarrassingly parallel scans."""
    e = load_table(spark, sf_dir, "embeddings").where(
        # vec_id isNotNull: the id IS the k-means entity key — lockstep
        # with ASSIGN_CTE's emb CTE (r7 NULL-entity-id probe)
        F.col("vec_id").isNotNull() & emb_finite("embedding")
    )
    # Keyed fan-out on both rounds (r12, guide §2.4): each assign()'s
    # per-vector window is vec_id-partitioned, so one
    # hashpartitioning(vec_id) per scan replaces a round-robin + a
    # window exchange (measured 1.48 → 0.91 s at sf0.1, hash identical).
    a1 = assign(fan_out(e, by="vec_id"), init_centroids(e))
    u1 = update(a1)  # (cid, dim, c_val) — unrounded double means
    c1 = (
        u1.select("cid", "dim", mround("c_val").alias("cq"))
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "cq"))),
                lambda s: s["cq"],
            ).alias("cemb")
        )
    )
    a2 = assign(fan_out(e, by="vec_id"), c1)
    return a2.select(
        "vec_id",
        F.col("cid").alias("cluster_id"),
        mround(F.lit(1.0) - F.col("dot")).alias("dist"),
    )
