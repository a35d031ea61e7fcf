"""§2.4 Aggregation.

All run as Catalyst HashAggregate pairs (partial map-side combine +
final after shuffle) — the shape that scales: the shuffle carries one
row per (partition × group), not per input row. Float sums go through
DECIMAL(30,6) for cross-engine hash stability (functions/vector.py).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.vector import (
    davg,
    dsum,
    dsumr,
    fin,
    mround,
    sql_davg,
    sql_dsum,
    sql_dsumr,
    sql_fin,
    sql_mround,
)
from ..sources.loader import fan_out, load_table
from .registry import register


@register(
    "q_agg_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_extendedprice', 'avg_price')},
           {sql_davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_q1(spark, sf_dir):
    """TPC-H Q1 — the flagship relational aggregate."""
    # fan_out (r12, guide §2.5 input skew): the single-file lineitem
    # scan runs the 7 exact-decimal partial aggregates on ONE core —
    # the same hazard q_agg_corr documents; round-robin (not keyed:
    # (flag, status) has 6 values < 32 partitions, the low-cardinality
    # trap) restores 32-way partials. Measured 2.41 → 1.68 s at sf0.1,
    # hash identical. At 100 TB the lake's natural splits provide this.
    li = fan_out(load_table(spark, sf_dir, "lineitem")).where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        dsum(disc_price, "sum_disc_price"),
        dsum(charge, "sum_charge"),
        davg("l_quantity", "avg_qty"),
        davg("l_extendedprice", "avg_price"),
        davg("l_discount", "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "q_agg_distinct",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_agg_distinct(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_cust")
    )


@register(
    "q_agg_having",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS n_cust
    FROM customer GROUP BY c_nationkey HAVING COUNT(*) > 5
    """,
)
def q_agg_having(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
        .where(F.col("n_cust") > 5)
    )


_ROLLUP_JOIN = """
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
"""


@register(
    "q_agg_rollup",
    oracle=f"""
    SELECT r_name, n_name,
           CAST(GROUPING(r_name) AS INT) AS g_r,
           CAST(GROUPING(n_name) AS INT) AS g_n,
           {sql_dsum('o_totalprice', 'revenue')}
    {_ROLLUP_JOIN}
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def q_agg_rollup(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        F.grouping("r_name").cast("int").alias("g_r"),
        F.grouping("n_name").cast("int").alias("g_n"),
        dsum("o_totalprice", "revenue"),
    )


@register(
    "q_agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_f,
           CAST(GROUPING(l_linestatus) AS INT) AS g_s,
           COUNT(*) AS n_rows,
           {sql_dsum('l_quantity', 'sum_qty')}
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark, sf_dir):
    # fan_out (r12): Expand multiplies every lineitem row x4 grouping
    # sets BEFORE the partial aggregate, all on the one-core single-
    # file scan — same hazard as q_agg_q1 above. Measured 1.57 →
    # 0.87 s at sf0.1, hash identical.
    li = fan_out(load_table(spark, sf_dir, "lineitem"))
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_f"),
        F.grouping("l_linestatus").cast("int").alias("g_s"),
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity", "sum_qty"),
    )


@register(
    "q_agg_groupingsets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice', 'revenue')}
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
)
def q_agg_groupingsets(spark, sf_dir):
    # Spark 4 parameterized sql: the DataFrame is passed as an argument,
    # not registered under a session-global view name (no collisions
    # across concurrent callers).
    #
    # The revenue aggregate interpolates the SAME sql_dsum rendering
    # the oracle uses (its isnan/abs/floor/CASE forms are valid Spark
    # SQL too) — the previous native ROUND had no NaN/1e12 guard and
    # rounds midpoints differently from the oracle's matched floor
    # form, a deterministic hash mismatch on the grand-total grouping
    # set once SUM(o_totalprice) passes the 1e12 guard (SF≈3) and a
    # midpoint hazard everywhere below it (review r6).
    o = load_table(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               {sql_dsum('o_totalprice', 'revenue')}
        FROM {{orders}}
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """,
        orders=o,
    )


# Sample variance with BOTH degenerate guards stated explicitly (r6
# TPC-H degenerate sweep): n=1 makes the denominator 0 — Spark ANSI
# RAISES on double division by zero where DuckDB returns NULL, so the
# CASE must gate the division itself; and double rounding can push the
# exact-sum numerator epsilon-negative for near-constant groups, where
# Spark SQRT(neg) = NaN but DuckDB SQRT(neg) ERRORS — GREATEST(·, 0)
# clamps inside the guarded branch on both engines.
_STATS_VAR = (
    "CASE WHEN n > 1 THEN (n * sxx - sx * sx) / (n * (n - 1.0)) END"
)
_STATS_STD = (
    "CASE WHEN n > 1 AND sxx IS NOT NULL"
    " THEN SQRT(GREATEST((n * sxx - sx * sx) / (n * (n - 1.0)), 0.0)) END"
)


@register(
    "q_agg_stats",
    oracle=f"""
    WITH m AS (
        SELECT c_mktsegment,
               CAST(COUNT(c_acctbal) AS DOUBLE) AS n,
               MIN(c_acctbal) AS mn, MAX(c_acctbal) AS mx,
               {sql_dsumr('c_acctbal')} AS sx,
               {sql_dsumr('c_acctbal * c_acctbal', 38)} AS sxx
        FROM customer GROUP BY c_mktsegment
    )
    SELECT c_mktsegment,
           {sql_mround('mn')} AS min_bal,
           {sql_mround('mx')} AS max_bal,
           {sql_mround('CASE WHEN n > 0 THEN sx / n END')} AS avg_bal,
           {sql_mround(_STATS_STD)} AS std_bal,
           {sql_mround(_STATS_VAR)} AS var_bal
    FROM m
    """,
)
def q_agg_stats(spark, sf_dir):
    """Per-group MIN/MAX/AVG/STDDEV_SAMP/VAR_SAMP — NOT via the native
    avg/stddev aggregates, whose double streaming-update order is
    partition-dependent (registry determinism rule 1; review r6: this
    query was the file's one violation). Exact decimal moment sums
    (order-independent), then the closed-form sample variance in
    identically-ordered double arithmetic + matched round — the same
    construction q_agg_corr uses. Same partial+final hash-aggregate
    shuffle shape as native avg; the moments all combine map-side."""
    c = load_table(spark, sf_dir, "customer")
    x = F.col("c_acctbal")
    m = c.groupBy("c_mktsegment").agg(
        # n = COUNT(c_acctbal), NOT COUNT(*): the moment sums skip NULL
        # rows, so the denominator must too — native AVG/STDDEV_SAMP
        # semantics (r7 ADVICE find; COUNT(*) silently mis-averaged any
        # NULL-bearing group, invisible to parity because both engines
        # encoded the same wrong formula). NaN rows still count as
        # values (COUNT counts non-NULL, and dsumr propagates NaN).
        F.count(x).cast("double").alias("n"),
        F.min(x).alias("mn"),
        F.max(x).alias("mx"),
        dsumr(x).alias("sx"),
        # prec=38: the squared moment overflows DECIMAL(30,6)'s 24
        # integer digits (an ANSI crash) once |x| ≥ 1e12 — see dbl2dec.
        # dsumr propagates stored NaN/±inf per IEEE instead of crashing
        # the decimal cast; the variance formula then yields NaN in
        # identical double arithmetic on both engines.
        dsumr(x * x, 38).alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    raw_var = (n * sxx - sx * sx) / (n * (n - F.lit(1.0)))
    # Guards mirror _STATS_VAR/_STATS_STD: the n > 1 gate keeps the
    # division unevaluated for singleton groups (Spark ANSI raises on
    # double /0); GREATEST clamps epsilon-negative variance before
    # SQRT (Spark NaN vs DuckDB error otherwise). The avg gains an
    # n > 0 gate because n = COUNT(col) can now be 0 (all-NULL group).
    var = F.when(n > 1, raw_var)
    std = F.when((n > 1) & sxx.isNotNull(), F.sqrt(F.greatest(raw_var, F.lit(0.0))))
    return m.select(
        "c_mktsegment",
        mround(F.col("mn")).alias("min_bal"),
        mround(F.col("mx")).alias("max_bal"),
        mround(F.when(n > 0, sx / n)).alias("avg_bal"),
        mround(std).alias("std_bal"),
        mround(var).alias("var_bal"),
    )


@register(
    "q_agg_percentile",
    oracle=f"""
    SELECT o_orderstatus,
           ROUND(quantile_cont({sql_fin('o_totalprice')}, 0.5), 4)
               AS median_price,
           ROUND(quantile_cont({sql_fin('o_totalprice')}, 0.9), 4)
               AS p90_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_agg_percentile(spark, sf_dir):
    # Percentiles rank FINITE values only (fin/sql_fin): a NaN/±inf
    # price has no well-defined rank position, and with them included
    # Spark's percentile and DuckDB's quantile_cont interpolate
    # different neighbors (r6 NaN/Inf sweep). The gate maps them to
    # NULL, which both engines' percentile aggregates skip.
    o = load_table(spark, sf_dir, "orders")
    x = fin("o_totalprice")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile(x, F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile(x, F.lit(0.9)), 4).alias("p90_price"),
    )


@register(
    "q_agg_collect",
    oracle="""
    SELECT r_regionkey,
           array_to_string(list_sort(list(n_name)), ',') AS nations
    FROM region JOIN nation ON n_regionkey = r_regionkey
    GROUP BY r_regionkey
    """,
)
def q_agg_collect(spark, sf_dir):
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .groupBy("r_regionkey")
        .agg(
            # same zero-value gate as q_agg_string_agg: concat_ws of
            # an empty collect_list is '', string_agg is NULL
            F.when(
                F.size(F.array_sort(F.collect_list("n_name"))) > 0,
                F.concat_ws(",", F.array_sort(F.collect_list("n_name"))),
            ).alias("nations")
        )
    )


@register(
    "q_agg_bool",
    oracle="""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_totalprice > 400000) AS any_over_400k,
           CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT)
               AS n_urgent
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_agg_bool(spark, sf_dir):
    """Boolean + filtered aggregates: bool_and / bool_or / count_if —
    all decompose partial+final like any hash aggregate."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
    )


# q_agg_approx_cd (the portable md5-pinned 256-register HLL) lived here
# through round 6 (aggs.py:339-458 at commit 1125cc0); the round-6
# verdict fronted it into the round-7 driver window, which required its
# own module — see plans/approx_cd.py. It is still a §2.4 aggregate.


@register(
    "q_agg_mode",
    oracle="""
    WITH counts AS (
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        FROM orders GROUP BY o_orderstatus, o_orderpriority
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                     ORDER BY cnt DESC,
                                              o_orderpriority NULLS LAST) AS rn
        FROM counts
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt AS mode_count
    FROM ranked WHERE rn = 1
    """,
)
def q_agg_mode(spark, sf_dir):
    """Deterministic MODE (most frequent value per group): count +
    top-1 window with an explicit tie-break on the value itself.
    Native mode() is avoided on purpose — its tie behavior is
    engine-defined (registry rule 4: every top-k carries a total
    order). Two hash-aggregates + a group-keyed window; shuffle
    carries one row per (group, value)."""
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = W.partitionBy("o_orderstatus").orderBy(
        # asc_nulls_last: law 2 on the tie-break — a NULL priority is a
        # real GROUP (NULL-priority orders exist in degenerate data),
        # and a count tie against it split Spark's ASC NULLS FIRST from
        # DuckDB's NULLS LAST (r7 composed audit of F.asc sites).
        F.desc("cnt"), F.asc_nulls_last("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("cnt").alias("mode_count"),
        )
    )


# Degenerate guards (r6 TPC-H degenerate sweep), mirrored in the
# Spark body: a zero-variance side makes the denominator 0 — Spark
# ANSI RAISES on double /0 (DuckDB → NULL), so the CASE gates the
# division; GREATEST clamps the epsilon-negative-variance SQRT hazard
# (Spark NaN vs DuckDB error).
_CORR_EXPR = (
    "CASE WHEN GREATEST(n * sxx - sx * sx, 0.0) > 0"
    " AND GREATEST(n * syy - sy * sy, 0.0) > 0"
    " THEN ((n * sxy - sx * sy)"
    " / (SQRT(GREATEST(n * sxx - sx * sx, 0.0))"
    " * SQRT(GREATEST(n * syy - sy * sy, 0.0)))) END"
)


@register(
    "q_agg_corr",
    oracle=f"""
    WITH m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               {sql_dsumr('l_quantity')} AS sx,
               {sql_dsumr('l_extendedprice')} AS sy,
               {sql_dsumr('l_quantity * l_extendedprice', 38)} AS sxy,
               {sql_dsumr('l_quantity * l_quantity', 38)} AS sxx,
               {sql_dsumr('l_extendedprice * l_extendedprice', 38)} AS syy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           {sql_mround(_CORR_EXPR)} AS corr_qty_price
    FROM m
    """,
)
def q_agg_corr(spark, sf_dir):
    """Pearson correlation per group — NOT via the native corr()
    aggregate, whose streaming-update float order is engine-defined.
    Instead: five exact decimal moment sums (order-independent), then
    the closed-form correlation in identically-ordered double
    arithmetic + matched round. Same single-shuffle partial+final
    hash-aggregate shape as any groupBy; the five sums all combine
    map-side. (Products are formed in DOUBLE first — IEEE-identical on
    both engines — then decimal-summed; double→decimal(30,6) has no
    exact midpoints, so the cast is deterministic too.)

    fan_out: ten interpreted decimal ops per row is exactly the
    "downstream work per row is large" case — the single-row-group
    lineitem file scans as ONE partition and the partial aggregate ran
    single-core (measured 3.5 s at sf0.1 → 1.2 s warm fanned out; at
    100 TB the lake's natural row-group splits make this a no-op)."""
    li = fan_out(load_table(spark, sf_dir, "lineitem"))
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsumr(x).alias("sx"),
        dsumr(y).alias("sy"),
        # prec=38 on the product moments: DECIMAL(30,6) overflows (an
        # ANSI crash) once a product reaches 1e24 — see dbl2dec. dsumr
        # additionally propagates stored NaN/±inf per IEEE (NaN > 0 is
        # TRUE on both engines, so the variance gates pass and the
        # closed form yields NaN identically).
        dsumr(x * y, 38).alias("sxy"),
        dsumr(x * x, 38).alias("sxx"),
        dsumr(y * y, 38).alias("syy"),
    )
    n = F.col("n")
    dx = F.greatest(n * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0))
    dy = F.greatest(n * F.col("syy") - F.col("sy") * F.col("sy"), F.lit(0.0))
    # Mirror of _CORR_EXPR's guards: division gated on both variances
    # being strictly positive (Spark ANSI raises on double /0),
    # GREATEST-clamped under the SQRTs.
    corr = F.when(
        (dx > 0) & (dy > 0),
        (n * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.sqrt(dx) * F.sqrt(dy)),
    )
    return m.select(
        "l_returnflag", "n", mround(corr).alias("corr_qty_price")
    )


@register(
    "q_agg_multi_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_custs,
           COUNT(DISTINCT o_orderpriority) AS n_prios,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_agg_multi_distinct(spark, sf_dir):
    """Two COUNT(DISTINCT) over different columns in one aggregate —
    Spark plans this with an Expand (one replicated stream per
    distinct set, then two-phase dedup+count). The replication factor
    is the number of distinct aggregates: fine at 2-3, a scale hazard
    at many — beyond that, restructure to per-column aggregates joined
    back, or approx_count_distinct where tolerance allows."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.countDistinct("o_orderpriority").alias("n_prios"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "q_agg_string_agg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n
    FROM nation
    GROUP BY n_regionkey
    """,
)
def q_agg_string_agg(spark, sf_dir):
    """Ordered string aggregation (LISTAGG/STRING_AGG): collect_list
    carries NO ordering guarantee across shuffles, so the list is
    array_sort-ed before joining — the only deterministic formulation
    (registry rule 4 applied to aggregation). Shuffle carries the
    per-group name lists; at scale, bound group sizes or switch to a
    top-k window first — an unbounded LISTAGG over a hot group is an
    OOM by construction.

    The size() gate matches STRING_AGG's zero-value semantics exactly:
    collect_list SKIPS NULLs, and array_join over the resulting EMPTY
    list is '' where string_agg over zero values is NULL (r6
    degenerate sweep: a group holding one NULL-named nation). A group
    whose only name is a legit empty string stays '' on both engines
    — which is why NULLIF('') would be the WRONG fix."""
    n = load_table(spark, sf_dir, "nation")
    lst = F.array_sort(F.collect_list("n_name"))
    return n.groupBy("n_regionkey").agg(
        F.when(F.size(lst) > 0, F.array_join(lst, ",")).alias("nations"),
        F.count(F.lit(1)).alias("n"),
    )
