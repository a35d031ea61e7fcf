"""§2.11 UDF / UDAF / UDTF surface — proves the Python execution paths.

No reference analog (the Flink demo's user code is compiled Java
operators); this is the extension surface a PySpark user needs. Four
tiers, slowest to fastest:

- q_udf_python: row-at-a-time Python UDF. THE SLOW PATH — kept in the
  contract to prove it works, deliberately over the small events scan.
  Never use this shape in a hot loop at scale.
- q_udf_pandas: same function as an Arrow-batched pandas UDF
  (~10-100x the row UDF; the acceptable Python path).
- q_udaf_pandas: grouped applyInPandas aggregate (geometric mean).
- q_udtf_python: Spark 4 Python UDTF with a lateral join.

Cross-engine determinism for the UDAF: ln() may differ by 1 ulp
between libm (Python/DuckDB) implementations, so each ln value is
quantized to DECIMAL(30,12) on both sides before the exact decimal
mean — a 1-ulp input wobble then moves the sum by at most 1e-12,
invisible at the 4-decimal matched round.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from ..functions.vector import sql_fin, sql_mround
from ..sources.loader import load_table
from .registry import register


# Shared by BOTH UDF tiers (review r6 — the literal was duplicated,
# and its bare LEAST/GREATEST silently mapped NULL -> 0.0 where the
# UDFs return NULL: DuckDB's LEAST/GREATEST IGNORE NULL arguments,
# and order NaN greatest (-> 100.0) where pandas clip keeps NaN. The
# pinned spec is therefore explicit: NULL and NaN both clip to NULL;
# everything else clips to [0, 100].)
_CLIP_ORACLE = """
    SELECT event_id,
           CASE WHEN value IS NULL OR isnan(value) THEN NULL
                ELSE LEAST(GREATEST(value, 0.0), 100.0) END AS clipped
    FROM events
    """


@register("q_udf_python", oracle=_CLIP_ORACLE)
def q_udf_python(spark, sf_dir):
    @F.udf("double")
    def clip_py(v):
        if v is None or math.isnan(v):
            return None
        return max(0.0, min(100.0, v))

    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", clip_py("value").alias("clipped"))


@register("q_udf_pandas", oracle=_CLIP_ORACLE)
def q_udf_pandas(spark, sf_dir):
    @pandas_udf("double")
    def clip_pd(v):
        # Arrow hands SQL NULL to the pandas tier as NaN, so NULL and
        # NaN are indistinguishable here — the spec maps both to NULL
        # (nullable Float64 + pd.NA survives the Arrow return as a
        # real SQL NULL; a raw float NaN would not).
        out = v.clip(0.0, 100.0).astype("Float64")
        out[v.isna()] = None
        return out

    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", clip_pd("value").alias("clipped"))


_Q12 = Decimal("0.000000000001")


# positive AND finite: sql_fin maps NULL/NaN/±inf to NULL, and
# NULL > 0 is NULL → excluded, identically on both engines (review
# r6 — reuses the one finiteness definition instead of a third
# hand-rolled copy of the isnan/abs predicate)
_GEO_OK = f"{sql_fin('o_totalprice')} > 0"


@register(
    "q_udaf_pandas",
    oracle=f"""
    SELECT o_orderstatus,
           {sql_mround(
               f'CASE WHEN COUNT(CASE WHEN {_GEO_OK} THEN 1 END) > 0 THEN'
               f' exp(CAST(SUM(CASE WHEN {_GEO_OK} THEN'
               ' CAST(ln(o_totalprice) AS DECIMAL(30,12)) END) AS DOUBLE)'
               f' / COUNT(CASE WHEN {_GEO_OK} THEN 1 END)) END'
           )} AS geo_mean,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_udaf_pandas(spark, sf_dir):
    """Geometric mean of o_totalprice per status via applyInPandas:
    exp(mean(ln(x))), with ln values quantized to 12 decimals and
    summed exactly (see module docstring). The geometric mean is
    defined over POSITIVE FINITE values only — a NaN/±inf/non-positive
    price is excluded from the log-sum and its divisor on BOTH engines
    (r6 NaN/Inf sweep: math.log(NaN) poisoned the Decimal quantize
    Python-side while DuckDB crashed the DECIMAL cast); a group with
    no qualifying value yields NULL. ``n`` stays the raw row count."""

    def geo(pdf):
        import pandas as pd

        total = Decimal(0)
        vals = [
            v
            for v in pdf["o_totalprice"]
            if v is not None and math.isfinite(v) and v > 0
        ]
        for v in vals:
            total += Decimal(repr(math.log(v))).quantize(_Q12, ROUND_HALF_UP)
        if vals:
            mean = float(total) / len(vals)
            gm = math.exp(mean)
            gm4 = math.floor(gm * 10000.0 + 0.5) / 10000.0  # matched round
        else:
            gm4 = None
        return pd.DataFrame(
            {
                "o_orderstatus": [pdf["o_orderstatus"].iloc[0]],
                "geo_mean": [gm4],
                "n": [len(pdf)],
            }
        )

    # Project BEFORE the pandas boundary: applyInPandas ships EVERY
    # column of the grouped frame through Arrow — there is no
    # automatic column pruning into Python. Besides the wasted I/O,
    # an unused timestamp column is a live crash: pandas' ns epoch
    # ends at 2262, so a year-9999 o_orderdate overflows the
    # Arrow→pandas cast of a column this aggregate never reads
    # (r6 degenerate sweep).
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_totalprice"
    )
    return o.groupBy("o_orderstatus").applyInPandas(
        geo, "o_orderstatus string, geo_mean double, n bigint"
    )


@register(
    "q_udtf_python",
    oracle="""
    SELECT r_name, CAST(i AS INT) AS pos, substr(r_name, CAST(i AS INT), 1) AS ch
    FROM (SELECT r_name, unnest(generate_series(1, length(r_name))) AS i FROM region)
    """,
)
def q_udtf_python(spark, sf_dir):
    @udtf(returnType="pos int, ch string")
    class ExplodeChars:
        def eval(self, r_name: str):
            for i, ch in enumerate(r_name or ""):
                yield i + 1, ch

    spark.udtf.register("fsk_explode_chars", ExplodeChars)
    r = load_table(spark, sf_dir, "region")
    return spark.sql(
        """
        SELECT r.r_name, t.pos, t.ch
        FROM {region} r, LATERAL fsk_explode_chars(r.r_name) t
        """,
        region=r,
    )
