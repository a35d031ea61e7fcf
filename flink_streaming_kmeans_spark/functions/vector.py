"""Vector arithmetic over ARRAY<FLOAT> columns + hash-stable aggregates.

Reference analog: Feature.java's add/subtract/divide vector arithmetic
(expected path src/main/java/com/scaleunlimited/flinkkmeans/Feature.java
— SURVEY.md §1.1 [PK]; the checkout was empty). There the vectors are
2-D doubles updated record-at-a-time; here they are n-D ARRAY<FLOAT>
columns and the arithmetic is expressed with Spark higher-order
functions so it runs JVM-side inside whole-stage codegen — no Python
in the hot path.

Cross-engine determinism strategy (the heart of every `hash` oracle):

1. Make both engines compute an IDENTICAL IEEE-754 double: per-row
   cast to DECIMAL(30,6) (deterministic), exact decimal summation
   (order-independent), single cast to DOUBLE, and — for averages —
   one double division by the count. Same inputs + same IEEE ops =
   bit-identical doubles on Spark and DuckDB.
2. Round that double with MATCHED arithmetic, not each engine's native
   ROUND: ``floor(x * 10^s + 0.5) / 10^s``. Native ROUNDs diverge at
   decimal midpoints (Spark rounds the shortest decimal string HALF_UP;
   DuckDB rounds the raw binary), e.g. 169738.83/8 = 21217.35375 →
   Spark .3538 vs DuckDB .3537. floor() on the identical double is
   engine-independent by construction. (Half-negative values round
   toward +inf on both sides — consistent, which is all a hash needs.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot64(a, b) -> Column:
    """Dot product of two float-array columns, computed in double.

    Sequential left-to-right fold == DuckDB list_inner_product order.
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a) -> Column:
    """L2 norm of a float-array column (double math, sequential fold)."""
    a = F.col(a) if isinstance(a, str) else a
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def mround(col, scale: int = 4) -> Column:
    """Matched round: ``floor(x*10^s + 0.5)/10^s`` — engine-independent.

    Use instead of F.round whenever the rounded double is hash-compared
    against a DuckDB oracle (see module docstring). SQL twin:
    :func:`sql_mround`.
    """
    col = F.col(col) if isinstance(col, str) else col
    p = float(10**scale)
    # Guard non-finite and huge inputs: Spark's floor(double) returns
    # BIGINT (NaN→0, ±inf/overflow clamp to Long.Min/MaxValue) while
    # DuckDB's floor stays double — rounding such values would silently
    # diverge. Pass them through raw instead: NaN/±inf/null are already
    # identical doubles on both engines, and above |x| > 1e12 the
    # double grid is coarser than ~1e-4 anyway, so rounding to 4
    # decimals is (near-)identity and skipping it loses nothing.
    rounded = F.floor(col * p + F.lit(0.5)) / F.lit(p)
    return F.when(
        col.isNull() | F.isnan(col) | (F.abs(col) > F.lit(1e12)), col
    ).otherwise(rounded)


def sql_mround(expr: str, scale: int = 4) -> str:
    """DuckDB SQL twin of :func:`mround` (keep in lockstep)."""
    p = 10**scale
    return (
        f"(CASE WHEN ({expr}) IS NULL OR isnan({expr}) OR abs({expr}) > 1e12"
        f" THEN ({expr})"
        f" ELSE floor(({expr}) * {p} + 0.5) / {p} END)"
    )


def dec2dbl(col) -> Column:
    """DECIMAL → DOUBLE through a STRING — identical on both engines
    BY CONSTRUCTION. A direct decimal→double cast is NOT: DuckDB
    converts the scaled int128 to double and divides by 10^scale (two
    roundings), Spark rounds once — measured 25% ulp disagreement for
    values ≥1e10 (r6 extreme-value sweep; the 4-decimal mround masked
    it below ~5e11 because adjacent doubles there collapse to the same
    1e-4 grid point, and the sweep's >1e12 sums surfaced it raw).
    decimal→string is exact on both engines; string→double is
    correctly-rounded strtod on both — 0/24000 disagreements measured
    across 1e9..1e14. SQL twin: :func:`sql_dec2dbl`."""
    return col.cast("string").cast("double")


def sql_dec2dbl(expr: str) -> str:
    """DuckDB SQL twin of :func:`dec2dbl` (keep in lockstep)."""
    return f"CAST(CAST(({expr}) AS STRING) AS DOUBLE)"


def dbl2dec(col, prec: int = 30) -> Column:
    """DOUBLE → DECIMAL(30,6) through a STRING — identical on both
    engines BY CONSTRUCTION, the input-side twin of :func:`dec2dbl`.
    The direct cast is NOT: Spark converts via the double's SHORTEST
    decimal repr (BigDecimal(Double.toString)), DuckDB expands the
    exact binary value — for |x| ≥ ~1e9 the exact expansion carries
    non-zero digits inside the 6-decimal scale that the shortest repr
    does not (r6 extreme-value sweep: a 999999999999.1234 input became
    ...123400 in Spark vs ...123456 in DuckDB, shifting every
    downstream sum). Both engines' double→string is the shortest
    round-trip repr (the same rational number, whatever the notation)
    and their string→decimal parses round half-up identically
    (probe-verified incl. the .0000005 boundary). SQL twin:
    :func:`sql_dbl2dec`.

    ``prec``: decimal precision — the default 30 (24 integer digits)
    overflows (an ANSI crash, not a wrong value) once |x| ≥ 1e24;
    SQUARED-moment sums (q_agg_stats/q_agg_corr) pass 38, whose 32
    integer digits carry x² for |x| up to 1e16 — past the 1e12 mround
    pass-through and the 2^53 exact-integer ceiling, so every
    representable-at-4-decimals input is safe. The string route's
    determinism is precision-independent (same exact parse both
    engines)."""
    col = F.col(col) if isinstance(col, str) else col
    return col.cast("string").cast(f"decimal({prec},6)")


def sql_dbl2dec(expr: str, prec: int = 30) -> str:
    """DuckDB SQL twin of :func:`dbl2dec` (keep in lockstep)."""
    return f"CAST(CAST(({expr}) AS STRING) AS DECIMAL({prec},6))"


def dsum(col, alias: str, scale: int = 4) -> Column:
    """Hash-stable SUM of a double expression.

    Routes through DECIMAL(30,6): per-row cast is deterministic, decimal
    summation is exact (order-independent), the final DOUBLE conversion
    goes through :func:`dec2dbl`'s string route (the direct cast is NOT
    the same IEEE value on both engines at ≥1e10 — see dec2dbl),
    matched-round finishes the job. DuckDB twin: :func:`sql_dsum`.
    """
    col = F.col(col) if isinstance(col, str) else col
    total = dec2dbl(F.sum(dbl2dec(col)))
    return mround(total, scale).alias(alias)


def davg(col, alias: str, scale: int = 4) -> Column:
    """Hash-stable AVG: exact decimal sum, one double division, matched round.

    The double division (identical dividend/divisor on both engines via
    dec2dbl) yields an identical double; native ROUND of that double
    does NOT match across engines at midpoints (the round-1
    q_win_range_frame bug) — mround does. DuckDB twin: :func:`sql_davg`.
    """
    col = F.col(col) if isinstance(col, str) else col
    total = dec2dbl(F.sum(dbl2dec(col)))
    return mround(total / F.count(col), scale).alias(alias)


def sql_dsum(expr: str, alias: str, scale: int = 4) -> str:
    """DuckDB SQL twin of :func:`dsum` (keep in lockstep)."""
    inner = sql_dec2dbl(f"SUM({sql_dbl2dec(expr)})")
    return f"{sql_mround(inner, scale)} AS {alias}"


def sql_davg(expr: str, alias: str, scale: int = 4) -> str:
    """DuckDB SQL twin of :func:`davg` (keep in lockstep)."""
    inner = (
        sql_dec2dbl(f"SUM({sql_dbl2dec(expr)})")
        + f" / COUNT(({expr}))"
    )
    return f"{sql_mround(inner, scale)} AS {alias}"
