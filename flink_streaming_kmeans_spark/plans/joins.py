"""§2.3 Joins, including as-of (operators/asof.py) and range joins.

Scale notes: the dim tables (region/nation/supplier) are broadcast —
no shuffle of the fact side; fact⋈fact equi-joins shuffle on the join
key and AQE handles skew/coalescing. The theta join is a broadcast
nested-loop by construction (25×25) — at 100 TB a non-equi join must
be banded/bucketed first (see operators/asof.py for the pattern).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.vector import client_ntz, dsum, sql_dsum, sql_ts_valid, ts_valid
from ..sources.loader import fan_out, load_table
from .registry import register


@register(
    "q_join_inner",
    oracle=f"""
    SELECT c_nationkey,
           {sql_dsum('o_totalprice', 'revenue')},
           COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
)
def q_join_inner(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_nationkey")
        .agg(dsum("o_totalprice", "revenue"), F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q_join_broadcast",
    oracle="""
    SELECT n_nationkey, n_name, r_name
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def q_join_broadcast(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


@register(
    "q_join_left",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def q_join_left(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "q_join_full",
    oracle="""
    SELECT a.n_nationkey AS left_key, b.n_nationkey AS right_key
    FROM (SELECT n_nationkey FROM nation WHERE n_nationkey < 13) a
    FULL OUTER JOIN (SELECT n_nationkey FROM nation WHERE n_nationkey >= 12) b
      ON a.n_nationkey = b.n_nationkey
    """,
)
def q_join_full(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    a = n.where(F.col("n_nationkey") < 13).select(F.col("n_nationkey").alias("left_key"))
    b = n.where(F.col("n_nationkey") >= 12).select(
        F.col("n_nationkey").alias("right_key")
    )
    return a.join(b, a.left_key == b.right_key, "full")


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
)
def q_join_semi(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    """,
)
def q_join_anti(spark, sf_dir):
    """LeftAnti ≡ NOT EXISTS — NOT ``NOT IN`` (r6 TPC-H degenerate
    sweep): a NULL-keyed left row matches no right row, so anti join
    and NOT EXISTS both KEEP it, while NOT IN's three-valued logic
    drops it (and one right-side NULL empties the whole result). The
    NOT IN semantics are their own registered query, q_join_not_in."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_cross",
    oracle="""
    SELECT a.r_name AS r1, b.r_name AS r2
    FROM region a CROSS JOIN region b
    """,
)
def q_join_cross(spark, sf_dir):
    r = load_table(spark, sf_dir, "region")
    a = r.select(F.col("r_name").alias("r1"))
    b = r.select(F.col("r_name").alias("r2"))
    return a.crossJoin(b)


@register(
    "q_join_theta",
    oracle="""
    SELECT n1.n_nationkey AS k1, n2.n_nationkey AS k2, n1.n_regionkey AS rk
    FROM nation n1 JOIN nation n2
      ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
    """,
)
def q_join_theta(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("k1"), F.col("n_regionkey").alias("rk")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("k2"), F.col("n_regionkey").alias("rk2")
    )
    return (
        n1.join(n2, (n1.rk == n2.rk2) & (n1.k1 < n2.k2))
        .select("k1", "k2", "rk")
    )


@register(
    "q_join_range",
    oracle=f"""
    WITH ev AS (
        -- event-time domain gate (r6 extreme-timestamp sweep): a
        -- pre-0001-01-03 bstart crashes Spark's Python-interop
        -- conversion at collect; see functions/vector.ts_valid
        SELECT ts, value FROM events WHERE {sql_ts_valid('ts')}
    ), hours AS (
        SELECT DISTINCT date_trunc('hour', ts) AS bstart FROM ev
    ), b AS (
        SELECT bstart, bstart + INTERVAL 90 MINUTE AS bend FROM hours
    )
    SELECT b.bstart, COUNT(*) AS n_events, {sql_dsum('e.value', 'sum_value')}
    FROM ev e JOIN b ON e.ts >= b.bstart AND e.ts < b.bend
    GROUP BY b.bstart
    """,
)
def q_join_range(spark, sf_dir):
    """Range join: events against OVERLAPPING 90-minute buckets (one
    bucket per distinct event hour) — each event lands in 1-2 buckets.

    Physical shape: the bucket side is tiny (<=744 rows/month), so this
    is a BroadcastNestedLoopJoin — kept deliberately as the naive
    contrast to q_join_range_binned (same oracle, proven
    result-identical). BNLJ cost is |probe| x |build| CONDITION
    EVALUATIONS regardless of selectivity: 100k x 720 = 72M at sf0.1,
    ~6 s even fanned out to 32 cores, vs 1.5 s for the binned
    equi-join — and the gap is quadratic-vs-linear, so at 100x the
    BNLJ is dead and the rewrite is mandatory. Two measured local
    hazards fixed here: the single-file events scan yields ONE
    partition and BNLJ inherits probe parallelism (fan_out, 10 s → 6
    s), and a timestamp_ntz probe column puts a per-row cast inside
    the 72M-evaluation condition (normalized in the loader)."""
    ev = fan_out(
        load_table(spark, sf_dir, "events").where(ts_valid("ts"))
    )
    hours = ev.select(F.date_trunc("hour", "ts").alias("bstart")).distinct()
    b = hours.select(
        "bstart", (F.col("bstart") + F.expr("INTERVAL 90 MINUTES")).alias("bend")
    )
    joined = ev.join(
        F.broadcast(b), (ev.ts >= b.bstart) & (ev.ts < b.bend)
    )
    return client_ntz(joined.groupBy("bstart").agg(
        F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value")
    ))


@register(
    "q_join_range_binned",
    oracle=f"""
    WITH ev AS (
        -- event-time domain gate (r6 extreme-timestamp sweep): a
        -- pre-0001-01-03 bstart crashes Spark's Python-interop
        -- conversion at collect; see functions/vector.ts_valid
        SELECT ts, value FROM events WHERE {sql_ts_valid('ts')}
    ), hours AS (
        SELECT DISTINCT date_trunc('hour', ts) AS bstart FROM ev
    ), b AS (
        SELECT bstart, bstart + INTERVAL 90 MINUTE AS bend FROM hours
    )
    SELECT b.bstart, COUNT(*) AS n_events, {sql_dsum('e.value', 'sum_value')}
    FROM ev e JOIN b ON e.ts >= b.bstart AND e.ts < b.bend
    GROUP BY b.bstart
    """,
)
def q_join_range_binned(spark, sf_dir):
    """q_join_range's 100 TB formulation, proven result-identical (same
    oracle): pre-bin the range condition to an EQUI-join on the hour
    bin, post-filter the exact range. Each 90-minute bucket is exploded
    to the (<=2) hour bins it overlaps; each event joins on its own
    hour bin. The join is hash-partitionable (shuffle or broadcast hash
    join — tests/test_plans.py asserts no nested-loop), so it scales
    with |events| instead of |events|x|buckets| and AQE can re-plan it
    — the rewrite every interval/range join needs at scale."""
    ev = load_table(spark, sf_dir, "events").where(ts_valid("ts")).withColumn(
        "bin", F.date_trunc("hour", "ts")
    )
    hours = ev.select(F.col("bin").alias("bstart")).distinct()
    b = hours.select(
        "bstart", (F.col("bstart") + F.expr("INTERVAL 90 MINUTES")).alias("bend")
    )
    # a [bstart, bstart+90min) bucket overlaps hour bins bstart and
    # bstart+1h only
    b_binned = b.select(
        "bstart",
        "bend",
        F.explode(
            F.array(F.col("bstart"), F.col("bstart") + F.expr("INTERVAL 1 HOUR"))
        ).alias("bin"),
    )
    joined = ev.join(b_binned, "bin").where(
        (F.col("ts") >= F.col("bstart")) & (F.col("ts") < F.col("bend"))
    )
    return client_ntz(joined.groupBy("bstart").agg(
        F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value")
    ))


@register(
    "q_join_asof",
    # NULL-on rows are stated EXPLICITLY on the oracle side too (law
    # 35's r8 extension): DuckDB's native ASOF sorts a NULL-ts probe
    # past every candidate and "matches" the user's LAST click, where
    # SQL comparison semantics (and operators/asof.py) say a NULL ts
    # asserts no temporal relation — no match. So NULL-ts probes are
    # split out and re-attached with NULL payload, and NULL-key/
    # NULL-ts right rows are filtered, mirroring the operator's gates
    # (found by the r8 composed sweep: a NULL-ts purchase for a user
    # who HAS clicks — prior fixtures only had NULL-ts probes on
    # NULL-key users, which the equi-join masked).
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events
        WHERE event_type = 'click'
          AND user_id IS NOT NULL AND ts IS NOT NULL
    ), c AS (
        SELECT user_id, ts, event_id AS click_id, value AS click_value
        FROM clicks WHERE rn = 1
    ), p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT pn.event_id, pn.user_id, c.click_id, c.click_value
    FROM (SELECT * FROM p WHERE ts IS NOT NULL) pn
        ASOF LEFT JOIN c ON pn.user_id = c.user_id AND pn.ts >= c.ts
    UNION ALL
    SELECT event_id, user_id, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
    FROM p WHERE ts IS NULL
    """,
)
def q_join_asof(spark, sf_dir):
    """As-of join: for every purchase, the most recent prior (<=) click
    by the same user, with the click's id and value as payload (NULLs
    when the user never clicked before).

    Spark side is operators/asof.py's union+window formulation (one
    shuffle on user_id); the DuckDB oracle uses its native ASOF JOIN.
    Right rows are deduped to one per (user_id, ts) first — the
    asof_join tie contract."""
    from ..operators.asof import asof_join, clicks_and_purchases

    ev = load_table(spark, sf_dir, "events")
    clicks1, purchases = clicks_and_purchases(ev)
    out = asof_join(
        purchases, clicks1, key="user_id", on="ts",
        payload=["click_id", "click_value"],
    )
    return out.select("event_id", "user_id", "click_id", "click_value")


@register(
    "q_join_salted",
    oracle=f"""
    SELECT s_nationkey,
           {sql_dsum('l_extendedprice', 'revenue')},
           COUNT(*) AS n_items
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    """,
)
def q_join_salted(spark, sf_dir):
    """Skew-mitigation join, hash-checked against the plain join: the
    build side is replicated SALT ways with a salt column, the fact
    side derives its salt deterministically (pmod of a row attribute),
    and the join key becomes (suppkey, salt) — splitting any hot key's
    rows across SALT reducers instead of one. The oracle is the
    unsalted join, proving salting is semantics-transparent. At 100 TB
    this is the manual fallback when AQE's skew-split can't help (e.g.
    skewed aggregate keys after the join); broadcast is disabled here
    on purpose so the salted shuffle path is what actually executes."""
    SALT = 8
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    salted_s = s.crossJoin(
        F.broadcast(
            li.sparkSession.range(SALT).select(F.col("id").cast("int").alias("salt"))
        )
    )
    # coalesce before pmod: pmod(NULL) is a NULL salt, which silently
    # DROPS a NULL-orderkey row from the salted equi-join that the
    # plain join would keep — the one way salting could stop being
    # semantics-transparent (r6 TPC-H degenerate sweep). Any constant
    # bucket is correct for NULLs; 0 keeps them joinable.
    salted_li = li.withColumn(
        "salt",
        F.pmod(F.coalesce(F.col("l_orderkey"), F.lit(0)), F.lit(SALT)).cast("int"),
    )
    joined = salted_li.hint("shuffle_hash").join(
        salted_s,
        (F.col("l_suppkey") == F.col("s_suppkey"))
        & (salted_li["salt"] == salted_s["salt"]),
    )
    return joined.groupBy("s_nationkey").agg(
        dsum("l_extendedprice", "revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q_join_not_in",
    oracle="""
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE o_custkey NOT IN (
        SELECT c_custkey FROM customer WHERE c_acctbal < 0
    )
    """,
)
def q_join_not_in(spark, sf_dir):
    """NOT IN subquery — three-valued-logic anti join: one NULL in the
    subquery output empties the result, so Spark plans a dedicated
    null-aware anti join (BroadcastHashJoin ... NullAwareAntiJoin)
    rather than a plain LeftAnti. Registered via spark.sql so the
    subquery path (not a hand-built anti join) is what's exercised;
    the build side must stay broadcastable at scale — for a large
    non-null subquery, rewrite to LeftAnti after an explicit
    IS NOT NULL filter."""
    from .relational import _view

    v = _view(spark, sf_dir, "orders", "customer")
    return spark.sql(f"""
        SELECT o_orderkey, o_custkey
        FROM {v['orders']}
        WHERE o_custkey NOT IN (
            SELECT c_custkey FROM {v['customer']} WHERE c_acctbal < 0
        )
    """)
