"""§2.4 Aggregation — q_agg_approx_cd, housed alone for window rotation.

This query lived in plans/aggs.py through round 6; the round-6 verdict
(task 2) ordered it FRONTED into the round-7 driver window because it
was the only hash-tier query that would otherwise reach round 9 with
zero driver hash evidence (it carried misleading rows-tier `err`
records in r2/r5 before the r6 hash-tier re-registration). The driver
hash-checks the first 50 registration-ordered queries, and registration
order is whole-module prefixes of registry._MODULES — so the only way
to front ONE query without dragging its 14 module-mates into the window
is to give it its own module. The implementation is byte-identical to
the r6 aggs.py version (aggs.py:339-458 at commit 1125cc0); only the
housing moved. It rejoins the aggs window naturally in round 9.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.loader import fan_out, load_table
from .registry import register

# Portable HLL estimator constants (q_agg_approx_cd): m = 256
# registers, alpha approximated as the fixed rational 7182/10000
# (alpha_256 = 0.7213/(1 + 1.079/256) ~ 0.71827 — OUR estimator SPEC,
# so both engines compute the identical integer, not a float race).
# _HLL_NUM = 470679552 * 2^53 = (7182 * 256^2) * 2^53: the estimate is
# est = _HLL_NUM div (10000 * S) with S = sum over the 256 registers
# of 2^(53 - rank)  (empty register -> rank 0 -> 2^53), i.e. the
# classic alpha*m^2 / sum(2^-M_j) scaled to exact integer arithmetic.
_HLL_NUM = 470679552 * 2**53
# Small-range (linear counting) branch, also integer-exact: when the
# raw estimate is below 2.5m = 640 and V (empty registers) > 0, real
# HLL switches to m*ln(m/V) — ln is a float, so we precompute
# round(256*ln(256/V)) for V = 1..256 ONCE and let both engines index
# the same literal table (1-based) by the integer V. Same spec, same
# integer, no float race.
_HLL_LC = tuple(
    round(256 * __import__("math").log(256 / v)) for v in range(1, 257)
)


@register(
    "q_agg_approx_cd",
    oracle=f"""
    WITH h AS (
        SELECT l_returnflag,
               (('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT)
                   AS hv
        FROM lineitem
    ), br AS (
        SELECT l_returnflag, CAST(hv % 256 AS INT) AS bucket, hv // 256 AS v
        FROM h
    ), regs AS (
        SELECT l_returnflag, bucket,
               MAX(CASE WHEN v = 0 THEN 53
                        ELSE 53 - length(bin(v)) END) AS r
        FROM br GROUP BY l_returnflag, bucket
    ), s AS (
        SELECT l_returnflag,
               SUM(1::BIGINT << (53 - r))
                   + (256 - COUNT(*)) * (1::BIGINT << 53) AS reg_sum,
               CAST(256 - COUNT(*) AS INT) AS v_empty
        FROM regs GROUP BY l_returnflag
    ), est AS (
        SELECT l_returnflag, v_empty,
               CAST({_HLL_NUM}::HUGEINT // (10000::HUGEINT * reg_sum)
                    AS BIGINT) AS raw
        FROM s
    )
    SELECT l_returnflag,
           CASE WHEN raw < 640 AND v_empty > 0
                THEN ([{', '.join(str(x) for x in _HLL_LC)}])[v_empty]
                ELSE raw END AS approx_parts
    FROM est
    """,
)
def q_agg_approx_cd(spark, sf_dir):
    """Approximate COUNT(DISTINCT) per group as a HASH row (was
    rows-tier): the md5-pinned 256-register HLL over l_partkey per
    l_returnflag, finished with an integer-exact estimate —
    est = (7182/10000 * 256^2) / sum_j 2^(-M_j), scaled by 2^53 so
    the whole computation is one BIGINT register sum and one integral
    division (DECIMAL(38,0) numerator; both engines' integral `div`
    is exact, no float ever). Spark's native approx_count_distinct
    stays as the test-tier twin (tests/test_sketches.py asserts it
    lands within HLL error of the exact count) — its internal sketch
    legitimately differs from DuckDB's, which is why this row was
    rows-tier for four rounds (r5 verdict task 5).

    Scale: identical shuffle shape to q_sketch_hll — partial max per
    (group, bucket) collapses each partition to <=256 rows per group
    before the shuffle; the estimate touches 256 integers per group.
    The small-range (linear-counting) branch is a precomputed 256-int
    lookup both engines index by the empty-register count — needed
    because sf0.001 has only ~200 distinct parts per flag, inside the
    2.5m = 640 crossover where raw HLL overestimates ~50%."""
    # fan_out: per-row md5+conv+bin work on the single-file lineitem
    # scan is the same single-core hazard q_agg_corr documents; the
    # partial aggregate collapses to <=256 rows per group before the
    # shuffle, so the fan-out costs nothing downstream (review r6).
    li = fan_out(load_table(spark, sf_dir, "lineitem"))
    br = li.select(
        "l_returnflag",
        F.expr(
            "CAST(conv(substr(md5(cast(l_partkey as string)), 1, 15), 16, 10)"
            " AS BIGINT)"
        ).alias("hv"),
    ).select(
        "l_returnflag",
        (F.col("hv") % 256).cast("int").alias("bucket"),
        F.expr("hv div 256").alias("v"),
    )
    rank = F.when(F.col("v") == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.expr("bin(v)"))
    )
    regs = br.groupBy("l_returnflag", "bucket").agg(F.max(rank).alias("r"))
    s = regs.groupBy("l_returnflag").agg(
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - r)"))
            + (F.lit(256) - F.count(F.lit(1)))
            * F.expr("shiftleft(CAST(1 AS BIGINT), 53)")
        ).alias("reg_sum"),
        (F.lit(256) - F.count(F.lit(1))).cast("int").alias("v_empty"),
    )
    est = s.select(
        "l_returnflag",
        "v_empty",
        F.expr(
            f"CAST(CAST('{_HLL_NUM}' AS DECIMAL(38,0))"
            " div (CAST(10000 AS DECIMAL(20,0)) * reg_sum) AS BIGINT)"
        ).alias("raw"),
    )
    lc = ", ".join(str(x) for x in _HLL_LC)
    return est.select(
        "l_returnflag",
        F.expr(
            f"CASE WHEN raw < 640 AND v_empty > 0"
            f" THEN CAST(element_at(array({lc}), v_empty) AS BIGINT)"
            f" ELSE raw END"
        ).alias("approx_parts"),
    )
