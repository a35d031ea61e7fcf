"""§2.8 Scalar functions: string / date / math / array.

(JSON extraction lives in events.py with the other events-table
queries.) All expressions are built-in pyspark.sql.functions — JVM-side
inside whole-stage codegen; no Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.vector import fin, l2_norm, mround, sql_fin, sql_mround
from ..sources.loader import load_table
from .registry import register


@register(
    "q_str_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS up_name,
           LOWER(p_brand) AS low_brand,
           SUBSTRING(p_name, 1, 5) AS name5,
           TRIM(p_name) AS trimmed,
           CONCAT_WS('|', p_brand, p_type) AS brand_type,
           CAST(LENGTH(p_name) AS BIGINT) AS name_len,
           REPLACE(p_name, ' ', '_') AS snake,
           LPAD(p_brand, 12, '*') AS padded
    FROM part
    """,
)
def q_str_funcs(spark, sf_dir):
    """Native string-function showcase. upper/lower here are the
    NATIVE functions on purpose (they are the operator under test);
    their unicode case mapping is engine-locale-defined (Spark/Java
    upper('ß')='SS' vs utf8proc 'ẞ' — r6 probe), so cross-engine hash
    parity of THIS query assumes ASCII string columns, which TPC-H
    part names are by construction. Hash-relevant normalization
    elsewhere uses functions/hashing.spark_ascii_fold instead."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.lower("p_brand").alias("low_brand"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.trim("p_name").alias("trimmed"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
        F.lpad("p_brand", 12, "*").alias("padded"),
    )


@register(
    "q_str_regexp",
    oracle="""
    SELECT p_partkey,
           TRY_CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT) AS brand_num
    FROM part
    """,
)
def q_str_regexp(spark, sf_dir):
    # try_cast, not cast: regexp_extract returns '' when the brand has
    # no digit, and CAST('' AS BIGINT) throws under ANSI mode (both
    # engines) — a digit-free brand in a synthetic/adversarial part
    # table must yield NULL, not crash the query (review r6).
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", "([0-9]+)", 1)
        .try_cast("long")
        .alias("brand_num"),
    )


@register(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS odate,
           CAST(year(o_orderdate) AS INT) AS oyear,
           CAST(month(o_orderdate) AS INT) AS omonth,
           CAST(quarter(o_orderdate) AS INT) AS oquarter,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS omonth_start,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
               AS days_since,
           CASE WHEN CAST(o_orderdate AS DATE) <= DATE '9999-12-01'
                THEN CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE)
           END AS plus30
    FROM orders
    """,
)
def q_date_funcs(spark, sf_dir):
    """Calendar functions — identical proleptic-Gregorian results on
    both engines from year 100 through 9999 (probe-verified incl. the
    1582 cutover dates). The one asymmetric edge: Spark's DateType
    ends at 9999-12-31 and date_add PAST it RAISES under ANSI, while
    DuckDB's date range continues — so the +30d column states its
    domain (≤ 9999-12-01 → else NULL) on both engines, the same
    guard discipline as q_math_funcs' sqrt/ln."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        d.alias("odate"),
        F.year(d).alias("oyear"),
        F.month(d).alias("omonth"),
        F.quarter(d).alias("oquarter"),
        F.trunc(d, "month").alias("omonth_start"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since"),
        F.when(
            d <= F.lit("9999-12-01").cast("date"), F.date_add(d, 30)
        ).alias("plus30"),
    )


@register(
    "q_math_funcs",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {sql_mround('CASE WHEN l_extendedprice >= 0 THEN sqrt(l_extendedprice) END')} AS sqrt_price,
           {sql_mround('abs(l_discount - 0.05)')} AS abs_disc,
           CASE WHEN {sql_fin('l_quantity')} IS NOT NULL
                     AND abs(l_quantity) < 9e15
                THEN CAST(ceil(l_quantity) AS BIGINT) END AS ceil_qty,
           CASE WHEN {sql_fin('l_quantity')} IS NOT NULL
                     AND abs(l_quantity) < 9e15
                THEN CAST(floor(l_quantity) AS BIGINT) END AS floor_qty,
           {sql_mround('CASE WHEN l_extendedprice > 0 THEN ln(l_extendedprice) END')} AS ln_price,
           {sql_mround('power(l_quantity, 2)')} AS qty_sq,
           CAST(l_linenumber % 3 AS INT) AS mod3
    FROM lineitem
    """,
)
def q_math_funcs(spark, sf_dir):
    # mround, not native ROUND: sqrt/ln outputs are irrational doubles
    # whose 4-decimal midpoints are exactly where Spark and DuckDB
    # native rounds diverge (functions/vector.py doctrine; review r6).
    # Domain guards stated on BOTH engines (r6 TPC-H degenerate
    # sweep): out-of-domain sqrt/ln is NaN resp. NULL on Spark but an
    # OutOfRange ERROR on DuckDB — the CASE makes a negative price
    # deterministically NULL everywhere.
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        mround(F.when(price >= 0, F.sqrt(price))).alias("sqrt_price"),
        mround(F.abs(F.col("l_discount") - 0.05)).alias("abs_disc"),
        # ceil/floor are BIGINT-valued only on finite input BELOW the
        # 2^53 exact-integer double range: Spark silently clamps
        # NaN/±inf/overflow to Long.Max/0 while DuckDB raises
        # OutOfRange — and a huge FINITE double (1e20) triggers the
        # same asymmetry the NaN gate alone misses (review r6). Above
        # 2^53 ceil/floor are identity anyway, so nothing meaningful
        # is excluded.
        F.when(
            fin("l_quantity").isNotNull()
            & (F.abs("l_quantity") < F.lit(9e15)),
            F.ceil("l_quantity"),
        ).alias("ceil_qty"),
        F.when(
            fin("l_quantity").isNotNull()
            & (F.abs("l_quantity") < F.lit(9e15)),
            F.floor("l_quantity"),
        ).alias("floor_qty"),
        mround(F.when(price > 0, F.log(price))).alias("ln_price"),
        mround(F.pow("l_quantity", 2)).alias("qty_sq"),
        (F.col("l_linenumber") % 3).alias("mod3"),
    )


@register(
    "q_try_arith",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity - 25 = 0 THEN NULL
                ELSE {sql_mround('l_extendedprice / (l_quantity - 25)')} END
               AS price_per_excess,
           CASE WHEN l_quantity BETWEEN 1 AND 127
                THEN CAST(l_quantity AS TINYINT) END AS qty_tiny
    FROM lineitem WHERE l_orderkey <= 1000
    """,
)
def q_try_arith(spark, sf_dir):
    """ANSI-mode error-safe arithmetic: try_divide → NULL on division
    by zero, try_cast → NULL on overflow (Spark 4 runs ANSI ON, so the
    non-try forms would raise — matching DuckDB; the try_* forms are
    the engine's sanctioned null-on-error escape hatch). The oracle
    states the null semantics explicitly with CASE."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        mround(
            F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 25)
        ).alias("price_per_excess"),
        F.col("l_quantity").try_cast("tinyint").alias("qty_tiny"),
    )


@register(
    "q_array_funcs",
    oracle=f"""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           {sql_mround('embedding[1]::DOUBLE')} AS first_val,
           {sql_mround("CASE WHEN embedding IS NULL THEN NULL"
                       " WHEN len(list_filter(embedding,"
                       "          x -> x IS NULL)) > 0 THEN NULL"
                       " WHEN len(embedding) = 0 THEN 0.0"
                       " ELSE sqrt(list_aggregate("
                       "list_transform(embedding, x -> x::DOUBLE * x::DOUBLE),"
                       " 'sum')) END")} AS l2
    FROM embeddings
    """,
)
def q_array_funcs(spark, sf_dir):
    """Vector arithmetic via higher-order functions (Feature.java
    analog). mround, not native ROUND: float components are dyadic
    doubles that land exactly on 4-decimal midpoints (review r6).

    This is the ARRAY-function showcase, not a vector-space op, so it
    handles ANY array instead of gating on emb_finite — which needs
    two degenerate-shape agreements stated explicitly (r6
    doctored-embeddings sweep): element 1 of an EMPTY array is NULL
    (DuckDB's [1]) and Spark ANSI element_at RAISES — try_element_at
    matches; and the l2 of an empty array is 0.0 (Spark's fold seed)
    where DuckDB's list_aggregate of an empty list is NULL — the
    oracle CASE states the 0.0, keeping NULL for a NULL array."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        mround(
            F.try_element_at("embedding", F.lit(1)).cast("double")
        ).alias("first_val"),
        mround(l2_norm("embedding")).alias("l2"),
    )


@register(
    "q_map_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status,
           o_orderpriority AS prio,
           2 AS n_keys,
           'status,prio' AS keys_csv,
           'y' AS extra
    FROM orders
    """,
)
def q_map_funcs(spark, sf_dir):
    """Map-column surface (§2.8's one remaining scalar type): build a
    MAP<STRING,STRING> per row, then read it back through element_at /
    map_keys / size / map_concat. The oracle is the ground-truth
    scalars the map round-trip must reproduce — a map that drops,
    reorders, or mangles entries hash-mismatches. Maps stay JVM-side
    (codegen); at scale this is a pure narrow map pass."""
    o = load_table(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("prio"), F.col("o_orderpriority"),
    )
    merged = F.map_concat(m, F.create_map(F.lit("x"), F.lit("y")))
    return o.select(
        "o_orderkey",
        F.element_at(m, "status").alias("status"),
        F.element_at(m, "prio").alias("prio"),
        F.size(m).alias("n_keys"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
        F.element_at(merged, "x").alias("extra"),
    )


@register(
    "q_str_levenshtein",
    oracle="""
    SELECT p_partkey, p_name,
           CAST(levenshtein(p_name, 'standard polished brass') AS INT)
               AS dist_std,
           CAST(levenshtein(p_brand, p_type) AS INT) AS dist_bt
    FROM part
    WHERE levenshtein(p_name, 'standard polished brass') <= 15
    """,
)
def q_str_levenshtein(spark, sf_dir):
    """Edit-distance fuzzy matching — the cheap fuzzy-join primitive
    for catalog/entity dedup. As a filter it's a pure map pass; as a
    JOIN condition at scale it must be blocked first (prefix/length/
    q-gram buckets) — levenshtein in a theta-join is the quadratic
    trap, same rule as q_dedup_near.

    DOMAIN (law 43): levenshtein's UNIT is engine-defined — Spark
    counts Unicode characters, DuckDB counts UTF-8 bytes (probed:
    'ß'→'s' is 1 vs 2, '🎉a'→'a' is 1 vs 4). The distances are
    integer-exact and equal only where every codepoint is single-byte,
    i.e. ASCII inputs — which TPC-H part names/brands/types are by
    construction (the same ASCII assumption q_str_funcs states for
    native upper/lower). Pinned in tests/test_degenerate_fuzz.py::
    test_levenshtein_unit_law; the part fuzz keeps its string
    alphabet ASCII for exactly this reason."""
    p = load_table(spark, sf_dir, "part")
    d = F.levenshtein("p_name", F.lit("standard polished brass"))
    return (
        p.where(d <= 15)
        .select(
            "p_partkey",
            "p_name",
            d.cast("int").alias("dist_std"),
            F.levenshtein("p_brand", "p_type").cast("int").alias("dist_bt"),
        )
    )


# The struct's field list, shared by the Spark build AND the oracle's
# n_fields literal (review r6: the count was hardcoded 2 against a
# 3-field struct — parity held only because the oracle hardcoded the
# same wrong constant; deriving both sides from this one tuple makes
# the emitted count true by construction and keeps it true when a
# field is added).
_STRUCT_FIELDS = ("st", "ck", "price")


@register(
    "q_struct_funcs",
    oracle=f"""
    SELECT o_orderkey,
           o_orderstatus AS st,
           o_totalprice AS price,
           {len(_STRUCT_FIELDS)} AS n_fields,
           o_orderstatus || ':' || CAST(o_custkey AS VARCHAR) AS packed_key
    FROM orders
    """,
)
def q_struct_funcs(spark, sf_dir):
    """STRUCT column round-trip (the nested type q_map_funcs/
    q_array_funcs don't cover): pack fields into a struct, read them
    back via dot access / getField, count fields (derived from the
    shared _STRUCT_FIELDS tuple — struct width is static schema, not
    a runtime expression), derive a key from struct members. Oracle is
    the scalar ground truth the round-trip must reproduce. Structs are
    Tungsten-columnar and codegen-friendly — the natural shape for
    typed metadata (multimodal meta, source provenance) in a
    training-data pipeline."""
    o = load_table(spark, sf_dir, "orders")
    src = {
        "st": F.col("o_orderstatus"),
        "ck": F.col("o_custkey"),
        "price": F.col("o_totalprice"),
    }
    s = F.struct(*[src[name].alias(name) for name in _STRUCT_FIELDS])
    return o.select(
        "o_orderkey",
        s.getField("st").alias("st"),
        s.getField("price").alias("price"),
        F.lit(len(_STRUCT_FIELDS)).alias("n_fields"),
        # F.concat, NOT concat_ws: the oracle's || propagates NULL
        # (packed key of a NULL custkey is NULL), while concat_ws
        # SKIPS NULL args and emitted a bare 'O' for the same row
        # (r7 composed sweep — NULL custkey never met this query
        # before; same family as law 16's string_agg-vs-concat_ws).
        F.concat(
            s.getField("st"), F.lit(":"), s.getField("ck").cast("string")
        ).alias("packed_key"),
    )
