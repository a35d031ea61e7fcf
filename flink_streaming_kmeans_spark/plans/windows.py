"""§2.5 Window functions + §2.6 sort/limit/top-k.

Every ORDER BY inside a window carries a unique tie-break column
(determinism rule 4) — rank()/lag() over a non-total order is the
classic nondeterminism trap. Scale note: window partitions shuffle on
partitionBy keys; per-customer partitions are tiny and uniform, so no
skew concern even at 1000×.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.vector import (
    _NAN,
    _NINF,
    _PINF,
    _isfin,
    dbl2dec,
    dec2dbl,
    dsumw,
    mround,
    sql_dsumw,
    sql_mround,
)
from ..sources.loader import fan_out, load_table
from .registry import register


@register(
    "q_win_rank",
    oracle="""
    SELECT c_custkey, c_nationkey,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           ROW_NUMBER() OVER w AS rn
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey NULLS LAST)
    """,
)
def q_win_rank(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(
        # asc_nulls_last: law 2 on the TIE-BREAK key — custkey was
        # never NULL until the r7 composed lakehouse fixture, where
        # Spark's ASC NULLS FIRST default broke rank parity against
        # DuckDB's NULLS LAST on NaN-balance ties (superset sweep)
        F.desc("c_acctbal"), F.asc_nulls_last("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
    )


@register(
    "q_win_lag",
    oracle=f"""
    SELECT o_orderkey,
           {sql_mround('LAG(o_totalprice) OVER w')} AS prev_price,
           {sql_mround('LEAD(o_totalprice) OVER w')} AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate NULLS LAST, o_orderkey NULLS LAST)
    """,
)
def q_win_lag(spark, sf_dir):
    # mround, not native ROUND: safe today (2-decimal prices round to
    # 4 decimals as identity) but a regenerated dataset with longer
    # fractions would land on the Spark-vs-DuckDB midpoint divergence
    # q_win_range_frame documents (review r6).
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        # asc_nulls_last on the TIE-BREAK too (law 40; r8 fuzz find on
        # q_win_running's identical window — a NULL orderkey tying on
        # date sorts FIRST in Spark, LAST in DuckDB)
        F.asc_nulls_last("o_orderdate"), F.asc_nulls_last("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        mround(F.lag("o_totalprice").over(w)).alias("prev_price"),
        mround(F.lead("o_totalprice").over(w)).alias("next_price"),
    )


@register(
    "q_win_running",
    oracle=f"""
    SELECT o_orderkey,
           {sql_mround(sql_dsumw('o_totalprice', 'OVER w'))} AS running_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate NULLS LAST, o_orderkey NULLS LAST
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_win_running(spark, sf_dir):
    # mround, not native ROUND, for the same regenerated-data midpoint
    # hazard as q_win_lag (review r6); identical output on current data.
    # dsumw: a stored NaN/±inf price turns the running total non-finite
    # from that prefix on (frame-scoped IEEE propagation) instead of
    # crashing the decimal cast.
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        # asc_nulls_last tie-break (law 40): the r8 randomized TPC-H
        # fuzz planted a NULL o_orderkey tying on o_orderdate — the
        # running prefix then includes/excludes that row's price in a
        # different position per engine (hash-red trial 9, seed 777).
        .orderBy(F.asc_nulls_last("o_orderdate"), F.asc_nulls_last("o_orderkey"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_orderkey", mround(dsumw("o_totalprice", w)).alias("running_total")
    )


@register(
    "q_win_range_frame",
    oracle=f"""
    SELECT o_orderkey,
           {sql_mround(sql_dsumw('o_totalprice', 'OVER w')
                       + ' / (COUNT(*) OVER w)')} AS avg_near
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus, o_orderpriority
                 ORDER BY o_totalprice
                 RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
    """,
)
def q_win_range_frame(spark, sf_dir):
    # Value-based frame → deterministic under ties by construction.
    # AVG = exact-decimal SUM / COUNT; the final round must be mround,
    # not native ROUND: the division lands on decimal midpoints
    # (e.g. 169738.83/8 = 21217.35375) where Spark and DuckDB native
    # ROUNDs disagree — the round-1 hash failure on this very query.
    #
    # r12 RESTRUCTURE (guide §1.2 step 1 — replace the algorithm, not
    # the constants): Spark's WindowExec recomputes a BOUNDED range
    # frame from scratch per row — O(rows × frame) interpreted decimal
    # ops, no codegen, and the operator that motivated this session's
    # windowExec.buffer.in.memory.threshold conf (5 s → 385 s under
    # the spilling buffer's per-row iterator restarts). The same
    # values come out of DIFFERENCES OF PREFIX SUMS, all of whose
    # windows are UNBOUNDED-PRECEDING (incrementally maintained, O(n)
    # per partition):
    #
    #   frame_sum(v)  = cum_sum(<= v) − cum_sum(< v−1000)
    #   frame_count   = likewise over row counts
    #
    # Equivalence is EXACT, not approximate-and-retuned:
    #   * the sums are DECIMAL(38,6) — decimal addition is associative
    #     and exact, so the prefix-sum difference equals the frame sum
    #     bit-for-bit, and dec2dbl of equal decimals is equal doubles;
    #   * the frame's lower boundary v−1000 is computed in double here
    #     exactly as WindowExec computes the RANGE bound;
    #   * ties collapse into per-distinct-value groups first (RANGE
    #     frames are value-inclusive on both ends, so every tie shares
    #     one frame), and the boundary lookup places each query point
    #     BEFORE data points at the same key (q DESC) because a data
    #     value equal to v−1000 is INSIDE the frame;
    #   * non-finite order values close their own frames — a NULL/NaN/
    #     ±inf current row's RANGE frame is exactly its own order
    #     group on both engines (NaN±1000=NaN, inf−1000=inf), where
    #     dsumw's mask yields NULL/NaN/+inf/−inf respectively and
    #     count divides out — so those rows take a constant CASE, and
    #     the finite lanes never see them (verified on a crafted
    #     NULL+NaN+±inf+exact-boundary-tie corpus and the standing
    #     nullnan parity suite, plus hash-identity at all three SFs).
    #
    # Measured at sf0.1: warm min 1.79 → 1.21 s isolated; the
    # O(rows × frame) surface (and its in-memory-buffer cliff) is gone
    # — at 100 TB every window here is a single incremental pass.
    # The one-pass boundary lookup rides the r12 union-asof pattern:
    # data rows carry the running (cum_sum, cum_count), query rows
    # (one per distinct value, at key v−1000) carry their OWN cum
    # pair and read the last data cum before their key — no
    # same-lineage self-join (Catalyst's dedupRight mis-resolves one;
    # the first draft measured silently-wrong lcs=0 rows).
    o = load_table(spark, sf_dir, "orders")
    P = ["o_orderstatus", "o_orderpriority"]
    v = F.col("o_totalprice")
    special = (
        F.when(v.isNull(), F.lit(None).cast("double"))
        .when(F.isnan(v), F.lit(_NAN))
        .when(v == F.lit(_PINF), F.lit(_PINF))
        .when(v == F.lit(_NINF), F.lit(_NINF))
    )
    fin = o.where(_isfin(v))
    g = (
        fan_out(fin, by=P)
        .groupBy(*P, v.alias("v"))
        .agg(F.sum(dbl2dec(v)).alias("gs"), F.count(F.lit(1)).alias("gn"))
    )
    wcum = (
        W.partitionBy(*P)
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = g.select(
        *P,
        "v",
        F.sum("gs").over(wcum).alias("cs"),
        F.sum("gn").over(wcum).alias("cn"),
    )
    data = cum.select(
        *P,
        F.col("v").alias("k"),
        F.lit(0).alias("q"),
        "cs",
        "cn",
        F.lit(None).cast("double").alias("v0"),
        F.lit(None).cast("decimal(38,6)").alias("ocs"),
        F.lit(None).cast("bigint").alias("ocn"),
    )
    qrows = cum.select(
        *P,
        (F.col("v") - F.lit(1000.0)).alias("k"),
        F.lit(1).alias("q"),
        F.lit(None).cast("decimal(38,6)").alias("cs"),
        F.lit(None).cast("bigint").alias("cn"),
        F.col("v").alias("v0"),
        F.col("cs").alias("ocs"),
        F.col("cn").alias("ocn"),
    )
    wlast = (
        W.partitionBy(*P)
        .orderBy(F.col("k").asc(), F.col("q").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fr = (
        data.unionAll(qrows)
        .select(
            *P,
            "q",
            "v0",
            "ocs",
            "ocn",
            F.last("cs", ignorenulls=True).over(wlast).alias("lcs"),
            F.last("cn", ignorenulls=True).over(wlast).alias("lcn"),
        )
        .where(F.col("q") == 1)
        .select(
            F.col(P[0]).alias("_st"),
            F.col(P[1]).alias("_pr"),
            F.col("v0").alias("_v"),
            dec2dbl(
                F.col("ocs")
                - F.coalesce("lcs", F.lit(0).cast("decimal(38,6)"))
            ).alias("fs"),
            (F.col("ocn") - F.coalesce("lcn", F.lit(0))).alias("fn"),
        )
    )
    return (
        o.join(
            fr,
            (F.col("o_orderstatus") == F.col("_st"))
            & (F.col("o_orderpriority") == F.col("_pr"))
            & (v == F.col("_v")),
            "left",
        ).select(
            "o_orderkey",
            F.when(_isfin(v), mround(F.col("fs") / F.col("fn")))
            .otherwise(mround(special))
            .alias("avg_near"),
        )
    )


@register(
    "q_win_ntile",
    oracle="""
    SELECT c_custkey,
           NTILE(4) OVER w AS quartile,
           FIRST_VALUE(c_custkey) OVER w2 AS richest,
           LAST_VALUE(c_custkey) OVER w2 AS poorest
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey NULLS LAST),
           w2 AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey NULLS LAST
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_ntile(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        # asc_nulls_last tie-break: see q_win_rank (r7 composed find)
        F.desc("c_acctbal"), F.asc_nulls_last("c_custkey")
    )
    w2 = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.first("c_custkey").over(w2).alias("richest"),
        F.last("c_custkey").over(w2).alias("poorest"),
    )


@register(
    "q_win_ntile_scaled",
    oracle="""
    SELECT c_custkey,
           NTILE(4) OVER w AS quartile,
           FIRST_VALUE(c_custkey) OVER w2 AS richest,
           LAST_VALUE(c_custkey) OVER w2 AS poorest
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment, c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey NULLS LAST),
           w2 AS (PARTITION BY c_mktsegment, c_nationkey
                  ORDER BY c_acctbal DESC, c_custkey NULLS LAST
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_ntile_scaled(spark, sf_dir):
    """The scale-safe twin of q_win_ntile (SCALE.md's re-key
    prescription, round-2 verdict item 6): q_win_ntile partitions by
    c_mktsegment alone — 5 values, so at 100× each window partition is
    a fifth of the table on ONE task. Re-keying to the composite
    (c_mktsegment, c_nationkey) multiplies partition count ~25×
    (5 → ~125 window partitions) while keeping the operator semantics:
    quartiles within segment×nation instead of global-per-segment.
    When the analysis genuinely needs segment-global quartiles at
    100 TB, pre-aggregate percentile boundaries and broadcast-join them
    back — never a 5-partition window. tests/test_plans.py asserts the
    composite key fans out past the 5-partition hazard."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment", "c_nationkey").orderBy(
        # asc_nulls_last tie-break: see q_win_rank (r7 composed find)
        F.desc("c_acctbal"), F.asc_nulls_last("c_custkey")
    )
    w2 = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.first("c_custkey").over(w2).alias("richest"),
        F.last("c_custkey").over(w2).alias("poorest"),
    )


@register(
    "q_topk_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey NULLS LAST) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def q_topk_group(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    # asc_nulls_last tie-break (law 40, r8 fuzz sweep of F.asc sites)
    w = W.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc_nulls_last("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "q_sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey NULLS LAST
    LIMIT 20
    """,
)
def q_sort_limit(spark, sf_dir):
    # Catalyst compiles orderBy().limit() into TakeOrderedAndProject —
    # per-partition top-k then a k-row merge on the driver; no full sort,
    # no shuffle of the full table. Exactly what you want at 100 TB.
    o = load_table(spark, sf_dir, "orders")
    return (
        # asc_nulls_last tie-break (law 40): which rows the LIMIT
        # keeps must not depend on engine NULL placement (law 38's
        # orderBy().limit() fork, r8 fuzz sweep)
        o.orderBy(F.desc("o_totalprice"), F.asc_nulls_last("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "q_win_first_last",
    oracle="""
    SELECT o_orderkey, o_custkey,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice) OVER w AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate NULLS LAST, o_orderkey NULLS LAST
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_first_last(spark, sf_dir):
    """first_value / last_value / nth_value over the full partition
    frame — the navigation functions §2.5 didn't yet cover. The frame
    is explicitly UNBOUNDED BOTH (last_value's default frame ends at
    CURRENT ROW, a classic silent-wrong-answer trap) and the ordering
    carries the o_orderkey tie-break (orderdates repeat per customer).
    One shuffle on o_custkey — high-cardinality, uniform."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        # asc_nulls_last tie-break (law 40, r8 fuzz sweep)
        .orderBy(F.asc_nulls_last("o_orderdate"), F.asc_nulls_last("o_orderkey"))
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )
