"""Degenerate-regime parity for literal NaN/±Infinity in stored data
(r6 sweep #8 — the one value domain no earlier sweep planted).

Earlier sweeps doctored NULLs, unicode, extreme magnitudes, and
duplicate/dangling keys; none ever STORED a non-finite double. One
NaN row turned out to kill 46 of 167 queries: CAST('NaN' AS
DECIMAL(30,6)) raises under ANSI on both engines, so every
decimal-routed hash aggregate crashed — at 100 TB, one poisoned
measure row would have killed every sum in the suite. The fixes, all
pinned here:

1. **IEEE-faithful non-finite propagation in the decimal sum route**
   (functions/vector.dsumr/dsumw + SQL twins): both engines' NATIVE
   sums propagate NaN/±inf per IEEE-754, and that propagation is
   order-independent (any NaN, or +inf and -inf together → NaN; else
   the present infinity; else finite). dsum/davg aggregate the three
   presence flags with bool_or, decimal-sum only the finite values,
   and let the flags override — matching native SUM while keeping the
   finite path exact. Windowed sums (dsumw) aggregate the flags OVER
   the same frame, so a running total turns NaN exactly from the
   first NaN-containing prefix.
2. **The finite-embedding contract** (vector.emb_finite /
   sql_emb_finite): extends the NULL-embedding law — a vector with a
   NaN/±inf/NULL element participates in NO vector op (dot, norm,
   quantize, LSH signature, k-means). Before the gate, quantization's
   floor(x*1e6+0.5)::BIGINT overflowed on Spark and DuckDB crashed
   the DECIMAL projection cast — asymmetrically.
3. **Rank-based aggregates gate to finite values** (vector.fin /
   sql_fin): with NaN/±inf in the order, Spark's percentile and
   DuckDB's quantile_cont interpolate different neighbors;
   q_agg_percentile now ranks finite values only, and
   q_evt_histogram's bin floor excludes non-finite values (they have
   no bin; the INT cast of floor(NaN/±inf) crashed one engine only).
4. **Predicate-form sensitivity under NaN**: q_sub_scalar filtered
   Spark-side on (x - navg) > 0 but oracle-side on x > navg —
   identical for finite navg, DIVERGENT when navg is NaN (NaN > 0 is
   TRUE on both engines; x > NaN is FALSE). Both sides now state the
   same comparison.
5. **local_df NaN→NULL corruption** (sources/loader.py): pandas uses
   NaN as its missing-value sentinel, so the Arrow fast path shipped
   a REAL NaN aggregate as SQL NULL (q_stream_tumble's poisoned
   window); the None-guard now routes NaN-carrying rows through the
   row-list path too.
6. **Integer-valued functions state their domain**: ceil/floor of
   non-finite (Spark clamps silently, DuckDB raises) and the
   geometric mean's log (defined over positive finite values only,
   both the Python UDAF and the SQL oracle).

Probe-verified agreements this regime RELIES on (2026-08-15, both
engines identical): NaN = NaN is TRUE and NaN groups as one key;
NaN > any finite is TRUE (NaN sorts above +inf, NULLs ordering still
per law 2); GREATEST(NaN, 0), SQRT(NaN), ROUND(NaN/±inf) all
propagate; native SUM/AVG/min/max propagation; ln(NaN)=NaN,
ln(inf)=inf.
"""

from __future__ import annotations

import math
import os
import shutil

import duckdb
import pytest
from oracle import check_parity, make_duckdb

from conftest import SF_SMOKE

pytestmark = pytest.mark.slow  # slow lane — see pytest.ini


TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def nan_sf(tmp_path_factory):
    """Real sf0.001 tables + literal NaN/±Infinity planted in every
    double measure surface: customer balances, order totals, lineitem
    quantity/price/discount, event values, and embedding elements."""
    sf = str(tmp_path_factory.mktemp("degen_nan"))
    for t in TABLES:
        shutil.copy(os.path.join(SF_SMOKE, f"{t}.parquet"),
                    os.path.join(sf, f"{t}.parquet"))
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")

    def rewrite(name, values_sql):
        src, tmp = f"{sf}/{name}.parquet", f"{sf}/_{name}.parquet"
        con.sql(
            f"COPY (SELECT * FROM '{src}' UNION ALL BY NAME {values_sql})"
            f" TO '{tmp}' (FORMAT PARQUET)"
        )
        os.replace(tmp, src)

    rewrite("customer", """
        SELECT * FROM (VALUES
          (910001::BIGINT, 'nan-bal', 1::INT, 'NaN'::DOUBLE, 'BUILDING'),
          (910002, 'posinf-bal', 2, 'Infinity'::DOUBLE, 'MACHINERY'),
          (910003, 'neginf-bal', 2, '-Infinity'::DOUBLE, 'MACHINERY'),
          (910004, 'nan-bal-2', 1, 'NaN'::DOUBLE, 'BUILDING')
        ) v(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)""")
    rewrite("orders", """
        SELECT * FROM (VALUES
          (970001::BIGINT, 910001::BIGINT, 'O', 'NaN'::DOUBLE,
           TIMESTAMP '1997-05-01', '1-URGENT'),
          (970002, 910002, 'F', 'Infinity'::DOUBLE,
           TIMESTAMP '1997-05-02', '2-HIGH'),
          (970003, 910003, 'F', '-Infinity'::DOUBLE,
           TIMESTAMP '1997-05-03', '3-MEDIUM')
        ) v(o_orderkey, o_custkey, o_orderstatus, o_totalprice,
            o_orderdate, o_orderpriority)""")
    rewrite("lineitem", """
        SELECT * FROM (VALUES
          (710001::BIGINT, 1::BIGINT, 1::BIGINT, 1::INT, 5.0::DOUBLE,
           'NaN'::DOUBLE, 0.05::DOUBLE, 0.02::DOUBLE, 'N', 'O',
           TIMESTAMP '1997-06-01'),
          (710002, 2, 2, 1, 'Infinity'::DOUBLE, 100.0, 0.0, 0.0,
           'N', 'O', TIMESTAMP '1997-06-02'),
          (710003, 3, 3, 1, 7.0, '-Infinity'::DOUBLE, 'NaN'::DOUBLE,
           0.0, 'A', 'F', TIMESTAMP '1997-06-03'),
          -- huge FINITE quantity: ceil/floor BIGINT-cast asymmetry
          -- (Spark clamps, DuckDB raises) needs the 2^53 bound, not
          -- just the NaN gate (review r6). 9.5e15: above that bound,
          -- below the x^2 DECIMAL(38,6) moment capacity (|x| < 1e16)
          -- whose overflow is the documented loud-and-symmetric
          -- ceiling, not a parity surface
          (720001, 1, 1, 1, 9.5e15::DOUBLE, 100.0, 0.0, 0.0, 'N', 'O',
           TIMESTAMP '1997-07-01')
        ) v(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
            l_extendedprice, l_discount, l_tax, l_returnflag,
            l_linestatus, l_shipdate)""")
    rewrite("events", """
        SELECT * FROM (VALUES
          (940001::BIGINT, TIMESTAMP '2024-03-01 12:00:00', 77::BIGINT,
           'click', 'NaN'::DOUBLE, '{"k":1}'),
          (940002, TIMESTAMP '2024-03-01 12:00:01', 77, 'view',
           'Infinity'::DOUBLE, '{"k":2}'),
          (940003, TIMESTAMP '2024-03-01 12:00:02', 78, 'click',
           '-Infinity'::DOUBLE, NULL)
        ) v(event_id, ts, user_id, event_type, value, props)""")
    rewrite("embeddings", """
        SELECT * FROM (VALUES
          (930001::BIGINT, [ 'NaN'::FLOAT, 1.0, 0.5, 0.25 ]
               || list_transform(range(60), x -> 0.0::FLOAT), 1::INT),
          (930002, [ 'Infinity'::FLOAT, 0.0, 0.0, 0.0 ]
               || list_transform(range(60), x -> 0.1::FLOAT), 2)
        ) v(vec_id, embedding, label)""")
    con.close()
    yield sf


@pytest.fixture(scope="module")
def nan_duck(nan_sf):
    con = make_duckdb(nan_sf)
    yield con
    con.close()


# The sweep finds plus the neighbors that exercise each shared
# construction on this data (dsumr group sums, dsumw window sums,
# scalar-subquery/CTE second-level sums, the finite-embedding gate,
# the fin percentile/histogram gates, the streaming dsumr path).
NAN_CHECKED = [
    # dsumr group aggregates (the 45-crash class)
    "q_agg_q1",
    "q_agg_stats",
    "q_agg_corr",
    "q_agg_rollup",
    "q_agg_groupingsets",
    "q_sub_scalar",
    "q_cte_reuse",
    "q_merge_upsert",
    "q_tpch_q18",
    "q_evt_anomaly",
    "q_feat_snapshot",
    "q_lake_compact",
    "q_lake_time_travel",
    "q_stream_upsert",
    "q_sink_partitioned",
    "q_source_csv",
    # dsumw window sums
    "q_win_running",
    "q_win_range_frame",
    "q_win_time_range",
    # fin gates
    "q_agg_percentile",
    "q_evt_histogram",
    "q_math_funcs",
    # finite-embedding contract
    "q_emb_normalize",
    "q_emb_quantize",
    "q_sim_ann",
    "q_sim_ann_multi",
    "q_ml_score",
    "q_ml_kmeans_iter2",
    "q_ml_kmeans_update",
    # the pandas UDAF domain + the streaming local_df NaN path
    "q_udaf_pandas",
    "q_stream_tumble",
]


@pytest.mark.parametrize("name", NAN_CHECKED)
def test_degenerate_nan_parity(spark, nan_duck, registry, nan_sf, name):
    queries, oracles = registry
    r = check_parity(
        spark, nan_duck, name, queries[name], oracles[name], nan_sf
    )
    assert r.ok, (
        f"{name} diverges on NaN/Inf input: rows={r.rows_match} "
        f"schema={r.schema_match} hash={r.hash_match}\n{r.detail}"
    )


def test_dsum_propagates_ieee(spark, registry, nan_sf):
    """The MACHINERY segment holds +inf AND -inf balances → NaN sum;
    BUILDING holds two NaNs → NaN; every clean segment stays finite
    (no global poisoning)."""
    queries, _ = registry
    rows = {
        r["c_mktsegment"]: r["avg_bal"]
        for r in queries["q_agg_stats"](spark, nan_sf).collect()
    }
    assert math.isnan(rows["MACHINERY"])
    assert math.isnan(rows["BUILDING"])
    clean = [
        v
        for k, v in rows.items()
        if k not in ("MACHINERY", "BUILDING") and v is not None
    ]
    assert clean and all(math.isfinite(v) for v in clean)


def test_emb_finite_excludes_only_nonfinite(spark, registry, nan_sf):
    """q_emb_normalize drops exactly the two poisoned vectors."""
    queries, _ = registry
    ids = {
        r["vec_id"] for r in queries["q_emb_normalize"](spark, nan_sf).collect()
    }
    assert 930001 not in ids and 930002 not in ids
    assert len(ids) == 500  # every clean vector survives


def test_running_sum_nan_from_poisoned_prefix(spark, registry, nan_sf):
    """Customer 910001's orders: the NaN total poisons its running sum
    from its first row on (frame-scoped propagation, not global)."""
    import pyspark.sql.functions as F

    queries, _ = registry
    out = (
        queries["q_win_running"](spark, nan_sf)
        .where(F.col("o_orderkey").isin(970001, 970002, 970003))
        .collect()
    )
    by_key = {r["o_orderkey"]: r["running_total"] for r in out}
    assert math.isnan(by_key[970001])
    assert by_key[970002] == math.inf
    assert by_key[970003] == -math.inf


def test_decimal_sum_magnitude_domain(spark):
    """Law 46 pinned: decimal-summed measures have the domain
    |x| < 1e24 — DECIMAL(30,6)'s 24 integer digits — and BOTH engines
    reject out-of-domain magnitudes LOUDLY at the same boundary
    (Spark ArithmeticException under ANSI, DuckDB Conversion Error):
    a 1e30 measure is data corruption surfaced, never a silent
    divergence (grand-exploration find: q_rollup_time on a planted
    1e30 events.value crashed Spark-side; the oracle rejects the
    same row identically). Just below the boundary both engines
    accept and agree exactly."""
    import duckdb
    import pytest as _pt
    from pyspark.sql import functions as F

    from flink_streaming_kmeans_spark.functions.vector import (
        dbl2dec,
        sql_dbl2dec,
    )

    one = spark.range(1)

    # out of domain: both engines refuse
    with _pt.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE|Decimal"):
        one.select(dbl2dec(F.lit(1e24))).collect()
    con = duckdb.connect()
    with _pt.raises(Exception, match="Conversion Error|Could not convert"):
        con.execute(f"SELECT {sql_dbl2dec('1e24::DOUBLE')}").fetchone()

    # just inside: both engines accept and agree exactly
    s_val = one.select(
        dbl2dec(F.lit(9.99e23)).cast("string").alias("v")
    ).collect()[0].v
    d_val = con.execute(
        f"SELECT CAST({sql_dbl2dec('9.99e23::DOUBLE')} AS VARCHAR)"
    ).fetchone()[0]
    con.close()
    assert s_val == d_val, (s_val, d_val)


def test_subquantum_string_decimal_cast_law(spark):
    """Law 51 pinned: DuckDB 1.0.0's VARCHAR→DECIMAL cast rounds
    sub-half-quantum magnitudes with leading mantissa digit >=5 AWAY
    to ±1e-6 ('9e-15' → 0.000001) where true HALF_UP — and Spark's
    string→decimal, which is correct here — give 0. sql_dbl2dec
    therefore clamps |x| < 5e-7 to 0 before the cast (a no-op under
    correct rounding), keeping the decimal-sum contract mutual.
    Found by the r9 micro-ts/long-text fuzz arm (seed 141421 trial 6:
    a planted 1e-07 l_extendedprice made q_agg_corr's syy moment 0.0
    on Spark vs 1e-06 on DuckDB, flipping the corr gate NULL vs NaN).
    This pin (a) records the raw defect against the LIVE DuckDB so a
    fixed future DuckDB shows up as an xpass-style signal, and (b)
    proves the clamped path agrees with Spark across the defect
    region and the boundary."""
    import duckdb
    from pyspark.sql import functions as F

    from flink_streaming_kmeans_spark.functions.vector import (
        dbl2dec,
        sql_dbl2dec,
    )

    con = duckdb.connect()
    # (a) the raw defect, as shipped in DuckDB 1.0.0
    raw = con.execute(
        "SELECT CAST(CAST(9e-15::DOUBLE AS VARCHAR) AS DECIMAL(38,6))"
    ).fetchone()[0]
    assert float(raw) == 1e-06, (
        f"DuckDB raw cast now yields {raw}: the law-51 defect appears "
        f"fixed upstream — re-evaluate the sql_dbl2dec clamp"
    )

    # (b) clamped oracle path == Spark path across defect + boundary
    cases = [9e-15, -9e-15, 8e-08, 1e-14, 4.9e-08, 4.999999e-07,
             5e-07, 6e-07, 1e-06, 1.5e-06, 0.25, -7.25]
    one = spark.range(1)
    for v in cases:
        s_val = one.select(
            dbl2dec(F.lit(v), 38).cast("string").alias("v")
        ).collect()[0].v
        d_val = con.execute(
            f"SELECT CAST({sql_dbl2dec(f'{v!r}::DOUBLE', 38)} AS VARCHAR)"
        ).fetchone()[0]
        assert s_val == d_val, (v, s_val, d_val)
    con.close()
