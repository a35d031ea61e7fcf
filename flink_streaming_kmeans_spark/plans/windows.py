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

from ..functions.vector import dsumw, mround, sql_dsumw, sql_mround
from ..sources.loader import load_table
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
    # Partition key is (status, priority), NOT status alone: Spark's
    # WindowExec recomputes a BOUNDED range frame from scratch per row
    # (O(rows × frame) interpreted decimal ops, no codegen), so frame
    # density and partition count bound the cost. 3 status-only
    # partitions of 50k rows measured 8-110s at sf0.1 (bimodal JIT);
    # 15 (status, priority) partitions keep the same operator semantics
    # at ~25x less work — and at 100 TB a bounded range frame over a
    # 3-value key would be a single-task straggler anyway.
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_orderstatus", "o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, W.currentRow)
    )
    s = dsumw("o_totalprice", w)
    n = F.count(F.lit(1)).over(w)
    return o.select("o_orderkey", mround(s / n).alias("avg_near"))


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
