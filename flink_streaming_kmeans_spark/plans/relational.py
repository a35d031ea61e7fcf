"""Round-2 relational surface: subqueries, CTEs, pivot/unpivot, and
rank-distribution windows.

No reference analog (the Flink demo has no SQL surface — SURVEY.md §1.1
[PK]); these widen the engine's relational completeness so a user of a
full query engine can express the standard decorrelation / reshaping
patterns. All are pure Catalyst built-ins:

- EXISTS / IN / scalar correlated subqueries decorrelate to semi joins
  and aggregate-joins (visible in `explain()` as SortMergeJoin
  LeftSemi / broadcast aggregate joins) — nothing custom, and the
  rewrites are exactly what scales: no per-row re-execution, one join.
- PIVOT compiles to a single hash-aggregate with conditional
  aggregation (explicit value list keeps the plan static and the
  result schema deterministic — required for the oracle and the only
  sane shape at 100 TB: never let pivot values be discovered at plan
  time with an extra pass).
- UNPIVOT is a generate/expand: one narrow map pass, output = n_rows ×
  n_cols, no shuffle.
- percent_rank/cume_dist are rank-based (not value-based), so they are
  deterministic under ties and need no rounding discipline beyond
  mround on the emitted double.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.vector import dsumr, mround, sql_dsumr, sql_mround
from ..sources.loader import load_table
from .registry import register


def _view(spark, sf_dir, *tables):
    """Register per-(table, sf) temp views for spark.sql queries; names
    are unique per sf_dir so concurrent callers never collide. The tag
    is an md5 prefix of sf_dir, NOT Python hash(): str hashes are
    salted per process (non-reproducible view names) and a mod-1e8
    fold of them can collide across sf_dirs, silently swapping one
    scale factor's tables under the other's query (review r6)."""
    import hashlib

    names = {}
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    for t in tables:
        name = f"{t}_v{tag}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names[t] = name
    return names


@register(
    "q_sub_exists",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
)
def q_sub_exists(spark, sf_dir):
    """Correlated EXISTS — decorrelates to a left-semi join."""
    v = _view(spark, sf_dir, "customer", "orders")
    return spark.sql(f"""
        SELECT c.c_custkey, c.c_name
        FROM {v['customer']} c
        WHERE EXISTS (
            SELECT 1 FROM {v['orders']} o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
        )
    """)


@register(
    "q_sub_in",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ) AND o_orderstatus = 'F'
    """,
)
def q_sub_in(spark, sf_dir):
    """IN subquery — decorrelates to a semi join on the filtered dim."""
    v = _view(spark, sf_dir, "customer", "orders")
    return spark.sql(f"""
        SELECT o_orderkey, o_totalprice
        FROM {v['orders']}
        WHERE o_custkey IN (
            SELECT c_custkey FROM {v['customer']} WHERE c_mktsegment = 'BUILDING'
        ) AND o_orderstatus = 'F'
    """)


@register(
    "q_sub_scalar",
    oracle=f"""
    WITH nat_avg AS (
        SELECT c_nationkey,
               {sql_dsumr('c_acctbal')}
               / COUNT(c_acctbal) AS navg
        FROM customer GROUP BY c_nationkey
    )
    SELECT c.c_custkey, {sql_mround('c.c_acctbal - n.navg')} AS above_by
    FROM customer c JOIN nat_avg n ON c.c_nationkey = n.c_nationkey
    WHERE c.c_acctbal > n.navg
    """,
)
def q_sub_scalar(spark, sf_dir):
    """Correlated scalar subquery: customers above their nation's mean
    balance. Spark decorrelates the inner aggregate into one grouped
    subplan joined back on the correlation key — one agg + one join, no
    per-row re-execution (the oracle states the decorrelated form
    directly; hash-stable via the decimal-sum average discipline)."""
    v = _view(spark, sf_dir, "customer")
    # Filter on c_acctbal > navg (the oracle's predicate), NOT on
    # (c_acctbal - navg) > 0: identical for finite navg (IEEE
    # subtraction preserves the sign of the exact difference), but a
    # NaN nation mean makes the difference NaN, and NaN > 0 is TRUE
    # on both engines while x > NaN is FALSE — the r6 NaN sweep caught
    # the two forms keeping different rows.
    df = spark.sql(f"""
        SELECT c.c_custkey,
               c.c_acctbal AS bal,
               (
                   SELECT {sql_dsumr('c2.c_acctbal')}
                          / COUNT(c2.c_acctbal)
                   FROM {v['customer']} c2
                   WHERE c2.c_nationkey = c.c_nationkey
               ) AS navg
        FROM {v['customer']} c
    """)
    return df.where(F.col("bal") > F.col("navg")).select(
        "c_custkey", mround(F.col("bal") - F.col("navg")).alias("above_by")
    )


@register(
    "q_cte_reuse",
    oracle=f"""
    WITH rev AS (
        SELECT c.c_nationkey AS nationkey,
               {sql_dsumr('o.o_totalprice')} AS r
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey
    ), tot AS (SELECT {sql_dsumr('r')} AS t FROM rev)
    SELECT n.n_name, {sql_mround('rev.r')} AS revenue,
           {sql_mround('100.0 * rev.r / tot.t')} AS pct
    FROM rev JOIN nation n ON rev.nationkey = n.n_nationkey
    CROSS JOIN tot
    """,
)
def q_cte_reuse(spark, sf_dir):
    """CTE referenced twice (per-nation revenue + its grand total):
    exercises WITH scoping and plan reuse of a shared subtree."""
    v = _view(spark, sf_dir, "orders", "customer", "nation")
    df = spark.sql(f"""
        WITH rev AS (
            SELECT c.c_nationkey AS nationkey,
                   {sql_dsumr('o.o_totalprice')} AS r
            FROM {v['orders']} o JOIN {v['customer']} c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_nationkey
        ), tot AS (SELECT {sql_dsumr('r')} AS t FROM rev)
        SELECT n.n_name, rev.r AS revenue, 100.0 * rev.r / tot.t AS pct
        FROM rev JOIN {v['nation']} n ON rev.nationkey = n.n_nationkey
        CROSS JOIN tot
    """)
    return df.select(
        "n_name", mround("revenue").alias("revenue"), mround("pct").alias("pct")
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@register(
    "q_pivot",
    oracle="""
    SELECT o_orderstatus,
           COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS p1,
           COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS p2,
           COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS p3,
           COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS p4,
           COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS p5
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_pivot(spark, sf_dir):
    """PIVOT with an explicit value list (static plan — at scale, never
    let pivot discover its values with an extra scan). Compiles to ONE
    hash-aggregate with conditional counts."""
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
    )
    renamed = piv.select(
        "o_orderstatus",
        *[
            F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(f"p{i + 1}")
            for i, p in enumerate(_PRIORITIES)
        ],
    )
    return renamed


@register(
    "q_unpivot",
    oracle="""
    SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val FROM part
    """,
)
def q_unpivot(spark, sf_dir):
    """UNPIVOT (melt) numeric part attributes to (key, attr, val) rows —
    a single Expand map pass, no shuffle."""
    p = load_table(spark, sf_dir, "part")
    return p.unpivot(
        "p_partkey",
        [F.col("p_size").cast("double").alias("size"),
         F.col("p_retailprice").alias("retailprice")],
        "attr",
        "val",
    )


@register(
    "q_win_dist",
    oracle=f"""
    SELECT c_custkey,
           {sql_mround('PERCENT_RANK() OVER w')} AS pr,
           {sql_mround('CUME_DIST() OVER w')} AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal NULLS LAST, c_custkey NULLS LAST)
    """,
)
def q_win_dist(spark, sf_dir):
    """percent_rank + cume_dist per nation (rank-based → deterministic
    under ties; total order via custkey tie-break anyway). NULLS LAST
    pinned on both engines: this is an ASC window order over nullable
    keys, where Spark defaults NULLS FIRST and DuckDB NULLS LAST
    (determinism law 2 — r6 TPC-H degenerate sweep caught the split
    rank positions)."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(
        F.asc_nulls_last("c_acctbal"), F.asc_nulls_last("c_custkey")
    )
    return c.select(
        "c_custkey",
        mround(F.percent_rank().over(w)).alias("pr"),
        mround(F.cume_dist().over(w)).alias("cd"),
    )


@register(
    "q_merge_upsert",
    oracle=f"""
    WITH src AS (
        SELECT CASE WHEN o_custkey % 3 = 0 THEN -o_custkey
                    ELSE o_custkey END AS custkey,
               {sql_dsumr('o_totalprice')}
                   AS spend
        FROM orders
        GROUP BY 1
    )
    SELECT COALESCE(c.c_custkey, s.custkey) AS custkey,
           CASE WHEN c.c_custkey IS NULL THEN 'I'
                WHEN s.custkey IS NULL THEN 'K'
                ELSE 'U' END AS action,
           CASE WHEN c.c_custkey IS NULL THEN 'NEW'
                ELSE c.c_name END AS name,
           CASE WHEN s.custkey IS NULL THEN CAST(c.c_acctbal AS DOUBLE)
                ELSE s.spend END AS balance
    FROM customer c FULL OUTER JOIN src s ON c.c_custkey = s.custkey
    """,
)
def q_merge_upsert(spark, sf_dir):
    """MERGE INTO (upsert) semantics over plain parquet: target =
    customer, source = per-customer order spend (keys NEGATED for
    custkey%3=0 to exercise the NOT MATCHED branch — negation, not a
    "+1,000,000" shift, because custkeys exceed 1M from SF≈7 up and a
    shifted key colliding with a real customer silently turns the
    intended insert into an update of an unrelated row at exactly the
    scales this docstring advertises; keys are positive, so negatives
    can never collide at ANY SF — review r6). WHEN MATCHED →
    update balance; WHEN NOT MATCHED → insert; unmatched target rows
    kept. This full-outer-join + conditional-project is EXACTLY the
    join plan Delta/Iceberg MERGE compiles to — what those formats
    add is transactional file replacement of the touched partitions
    (no lakehouse lib in this container; the sink surface stops at
    parquet, see SCALE.md). Source aggregate shuffles on custkey,
    join co-partitions on the same key; at 100 TB the matched subset
    drives partition-selective rewrites, not a full-table pass."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    src = (
        o.groupBy(
            F.when(F.col("o_custkey") % 3 == 0, -F.col("o_custkey"))
            .otherwise(F.col("o_custkey"))
            .alias("custkey")
        )
        .agg(dsumr("o_totalprice").alias("spend"))
    )
    j = c.join(src, c.c_custkey == src.custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "custkey").alias("custkey"),
        F.when(F.col("c_custkey").isNull(), F.lit("I"))
        .when(F.col("custkey").isNull(), F.lit("K"))
        .otherwise(F.lit("U"))
        .alias("action"),
        F.when(F.col("c_custkey").isNull(), F.lit("NEW"))
        .otherwise(F.col("c_name"))
        .alias("name"),
        F.when(F.col("custkey").isNull(), F.col("c_acctbal").cast("double"))
        .otherwise(F.col("spend"))
        .alias("balance"),
    )


@register(
    "q_cdc_diff",
    oracle="""
    WITH snap_b AS (
        SELECT -o_orderkey AS k, o_totalprice AS price
        FROM orders WHERE o_orderkey % 13 = 0 AND o_orderkey <> 0
        UNION ALL
        SELECT o_orderkey AS k,
               CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 10.0
                    ELSE o_totalprice END AS price
        FROM orders WHERE o_orderkey % 97 <> 0
    ), snap_a AS (
        SELECT o_orderkey AS k, o_totalprice AS price FROM orders
    )
    SELECT COALESCE(a.k, b.k) AS okey,
           CASE WHEN b.k IS NULL THEN 'D'
                WHEN a.k IS NULL THEN 'I'
                ELSE 'U' END AS op,
           CAST(a.price AS DOUBLE) AS old_price,
           CAST(b.price AS DOUBLE) AS new_price
    FROM snap_a a FULL OUTER JOIN snap_b b ON a.k = b.k
    WHERE a.k IS NULL OR b.k IS NULL OR a.price <> b.price
    """,
)
def q_cdc_diff(spark, sf_dir):
    """Change-data-capture by snapshot diff: given two table states,
    emit the I/U/D changeset (inserts, updates with old+new values,
    deletes) — the inverse of q_merge_upsert and the batch form of a
    CDC feed. Snapshot B is derived deterministically from A (delete
    keys %97, reprice keys %5, insert NEGATED keys %13 — negation
    rather than a "+1e9" shift because orderkeys pass 1e9 around
    SF≈250, where a shifted key colliding with a real one puts
    duplicate k values in snap_b and the full-outer join fans out;
    negatives of positive keys can never collide at any SF, and the
    one self-negating key 0 is excluded from the insert branch on
    both engines — review r6). One
    co-partitioned full-outer join on the key + a row-level predicate;
    unchanged rows are filtered before any downstream consumer, so at
    100 TB the changeset shuffle is proportional to churn, not table
    size."""
    o = load_table(spark, sf_dir, "orders")
    snap_a = o.select(F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("price"))
    snap_b = (
        o.where((F.col("o_orderkey") % 13 == 0) & (F.col("o_orderkey") != 0))
        .select(
            (-F.col("o_orderkey")).alias("k"),
            F.col("o_totalprice").alias("price"),
        )
        .unionAll(
            o.where(F.col("o_orderkey") % 97 != 0).select(
                F.col("o_orderkey").alias("k"),
                F.when(
                    F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 10.0
                )
                .otherwise(F.col("o_totalprice"))
                .alias("price"),
            )
        )
    )
    a, b = snap_a.alias("a"), snap_b.alias("b")
    j = a.join(b, F.col("a.k") == F.col("b.k"), "full_outer")
    return j.where(
        F.col("a.k").isNull()
        | F.col("b.k").isNull()
        | (F.col("a.price") != F.col("b.price"))
    ).select(
        F.coalesce("a.k", "b.k").alias("okey"),
        F.when(F.col("b.k").isNull(), F.lit("D"))
        .when(F.col("a.k").isNull(), F.lit("I"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("a.price").cast("double").alias("old_price"),
        F.col("b.price").cast("double").alias("new_price"),
    )
