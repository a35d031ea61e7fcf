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

_NAN = float("nan")
_PINF = float("inf")
_NINF = float("-inf")


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


EMB_DIM = 64
EMB_BOUND = 1e6


def emb_finite(col, dim: int = EMB_DIM, bound: float = EMB_BOUND) -> Column:
    """TRUE iff the embedding is a valid point of the vector space —
    the vector-op participation contract: non-NULL, exactly ``dim``
    elements, every element a finite non-NULL float with |x| <=
    ``bound``. Built up across three r6 sweeps:

    - NULL embeddings (NULL sweep): a NULL vector crashed DuckDB's
      list_inner_product through a NULL-element centroid.
    - NaN/±inf elements (NaN sweep): one poisons every dot/norm and
      crashes integer bucket casts on one engine only.
    - wrong-LENGTH and huge-MAGNITUDE vectors (doctored-embeddings
      sweep): DuckDB's list_inner_product ERRORS on a length mismatch
      where Spark's zip_with silently NULL-pads; and a finite 1e30
      element overflows the floor(x*1e6+0.5) BIGINT quantization grid
      and the DECIMAL product capacity the determinism layer relies
      on. |x| <= 1e6 keeps x*1e6 within BIGINT and x*y within
      DECIMAL(30,6)'s integer digits for any realistic corpus sum.

    A vector violating any of these is a data-quality violation, not
    a point in the space — both engines exclude it, in lockstep. SQL
    twin: :func:`sql_emb_finite` (DuckDB list lambda — oracle-side
    only; every Spark twin filters with THIS function)."""
    col = F.col(col) if isinstance(col, str) else col
    return (
        col.isNotNull()
        & (F.size(col) == F.lit(dim))
        & F.forall(
            col,
            lambda x: x.isNotNull()
            & ~F.isnan(x)
            & (F.abs(x) <= F.lit(bound)),
        )
    )


def sql_emb_finite(
    expr: str = "embedding", dim: int = EMB_DIM, bound: float = EMB_BOUND
) -> str:
    """DuckDB twin of :func:`emb_finite` (keep in lockstep)."""
    return (
        f"(({expr}) IS NOT NULL AND len(({expr})) = {dim}"
        f" AND len(list_filter(({expr}),"
        f" x -> x IS NULL OR isnan(x) OR NOT isfinite(x)"
        f" OR abs(x) > {bound})) = 0)"
    )


TS_DOMAIN_MIN = "1970-01-02"
TS_DOMAIN_MAX = "2200-01-01"


def ts_valid(col) -> Column:
    """TRUE iff the event time is inside the engine's event-time
    domain [1970-01-02, 2200-01-01) — the time-operator participation
    contract, extending law 3 (a NULL ts is un-windowable) to
    out-of-domain timestamps (r6 extreme-timestamp sweep). The floor
    is the EPOCH plus a day of headroom because Structured
    Streaming's initial event-time watermark IS the epoch (measured:
    a 1969-12-31 23:59:59 event is born late and silently dropped by
    every watermarked aggregation, and dropDuplicatesWithinWatermark
    expires an event AT exactly 1970-01-01T00:00:00 too, while the
    batch twins keep both — pre-epoch event time cannot round-trip
    the streaming engine at all). The rest of the domain
    sits inside every other technical boundary the time operators
    cross: Spark's Python-interop conversion crashes below 0001-01-03
    ('year 0 is out of range' — the Julian-rebase floor, so one
    ancient row kills any collect that returns it); pandas' ns epoch
    (the applyInPandas NFA/state paths) ends 1677-2262; the streaming
    drives' sentinel arithmetic needs calendar headroom past max(ts)
    (a year-9999 event makes the append-mode flush IMPOSSIBLE — no
    later timestamp exists); and gap-fill materializes the min-to-max
    range (one outlier row = millions of fabricated rows). An event
    stamped outside [1970-01-02, 2200) is a data-quality violation — both
    engines exclude it from time-deriving operators, in lockstep.
    SQL twin: :func:`sql_ts_valid`."""
    col = F.col(col) if isinstance(col, str) else col
    return (col >= F.lit(TS_DOMAIN_MIN).cast("timestamp")) & (
        col < F.lit(TS_DOMAIN_MAX).cast("timestamp")
    )


def sql_ts_valid(expr: str = "ts") -> str:
    """SQL twin of :func:`ts_valid` (keep in lockstep; NULL-safe —
    a NULL ts fails both comparisons, subsuming law 3's filter in
    WHERE contexts, though oracles keep stating IS NOT NULL for
    clarity)."""
    return (
        f"(({expr}) >= TIMESTAMP '{TS_DOMAIN_MIN}'"
        f" AND ({expr}) < TIMESTAMP '{TS_DOMAIN_MAX}')"
    )


def isum64(col, name: str) -> Column:
    """SUM of a raw (untrusted-magnitude) BIGINT column, accumulated
    through DECIMAL(38,0) — law 48 (r8 bigint-extreme exploration).

    Spark's native long SUM uses a 64-BIT accumulator: under ANSI mode
    an extreme addend (a corrupt ``n_chars`` near 2^63) crashes MID-
    AGGREGATION even when the group's true total fits in BIGINT.
    DuckDB's SUM(BIGINT) accumulates into a 128-bit HUGEINT and only
    fails at the final BIGINT cast — so the same data crashed one
    engine and not the other (seed-314159 trial 11: Spark-only
    ARITHMETIC_OVERFLOW against a clean oracle). Summing through
    DECIMAL(38,0) reproduces the 128-bit semantics exactly: identical
    totals when the result fits (integer-exact, order-independent),
    and the final ``CAST AS BIGINT`` fails loudly on BOTH engines when
    it doesn't (the law-46 mutual-rejection pattern). Intermediate
    decimal overflow would need >10^19 near-max addends — unreachable.

    Oracle twin is the form the oracles already use:
    ``CAST(SUM(x) AS BIGINT)``. Use for sums of STORED integer
    columns (n_chars, JSON-extracted ints); sums of derived bounded
    counts (COUNT(*) rollups, token counts of real strings) cannot
    overflow and stay native."""
    col = F.col(col) if isinstance(col, str) else col
    return F.sum(col.cast("decimal(38,0)")).cast("bigint").alias(name)


def client_ntz(df):
    """Cast every returned TIMESTAMP (instant) column to TIMESTAMP_NTZ
    at the query's CLIENT boundary — law 47 (r8 env sweep).

    The engine computes event time entirely in pinned-UTC micros (the
    env sweep proved the JVM default timezone never leaks: perturbing
    it in-process changes nothing). But PySpark's ``TimestampType.
    fromInternal`` materializes collected instants via ``datetime.
    fromtimestamp`` — the PYTHON PROCESS's local zone — so the same
    result collected on a non-UTC driver box carries shifted wall
    times, while the DuckDB oracle (whose TIMESTAMP is timezone-naive)
    returns the UTC fields everywhere. ``TimestampNTZType.
    fromInternal`` converts through ``timezone.utc`` explicitly, so
    NTZ is both process-TZ-invariant AND the exact semantic twin of
    the oracle's type. Under the pinned-UTC session the cast is an
    identity on the micros — hashes on a UTC box are unchanged.

    Apply to the final frame of any hash query that returns an
    event-time column (the r8 sweep's 13: windows/sessions/slides,
    range joins, gapfill, SCD2, funnel, streaming sinks). Pinned by
    tools/env_sweep.py full-registry runs + tests/
    test_env_layout_invariance.py.
    """
    from pyspark.sql.types import TimestampType

    for f in df.schema.fields:
        if isinstance(f.dataType, TimestampType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp_ntz"))
    return df


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
    overflows (an ANSI crash, not a wrong value) once |x| ≥ 1e24 —
    and DuckDB's DECIMAL(30,6) cast rejects at the IDENTICAL boundary,
    so out-of-domain magnitude is a mutual loud failure, never a
    silent divergence (law 46, pinned in test_degenerate_naninf.py::
    test_decimal_sum_magnitude_domain);
    SQUARED-moment sums (q_agg_stats/q_agg_corr) pass 38, whose 32
    integer digits carry x² for |x| up to 1e16 — past the 1e12 mround
    pass-through and the 2^53 exact-integer ceiling, so every
    representable-at-4-decimals input is safe. The string route's
    determinism is precision-independent (same exact parse both
    engines)."""
    col = F.col(col) if isinstance(col, str) else col
    return col.cast("string").cast(f"decimal({prec},6)")


def sql_dbl2dec(expr: str, prec: int = 30) -> str:
    """DuckDB SQL twin of :func:`dbl2dec` (keep in lockstep) — plus a
    sub-half-quantum clamp the Spark side does not need (law 51, r9
    micro-ts/long-text fuzz arm, seed 141421 trial 6 via q_agg_corr's
    syy moment on a planted 1e-07 price):

    DuckDB 1.0.0's VARCHAR→DECIMAL cast mis-rounds magnitudes BELOW
    half a quantum when the mantissa's leading digit is >=5 — '9e-15',
    '8e-08', '5.1e-15' all round AWAY to ±0.000001 where true
    HALF_UP (and Spark's string→decimal, which is correct here)
    gives 0.000000; leading digits <5 ('2e-14', '4.9e-08') round to 0
    correctly, and everything at or above 5e-07 rounds correctly on
    both engines (probed across the boundary). The clamp zeroes
    |x| < 5e-7 BEFORE the cast, which is exactly the value the
    correct rounding assigns, so it is a no-op on a correct engine
    and unreachable territory for the defect. NULL/NaN/±inf take the
    ELSE branch unchanged (abs(NULL)<k is NULL; NaN/inf compare
    false). Pinned against the live DuckDB in
    tests/test_degenerate_naninf.py.

    CONSTRAINT: ``expr`` must be deterministic — it is interpolated
    TWICE into the generated SQL (the CASE guard and the ELSE branch),
    so a non-deterministic or side-effecting expression would evaluate
    independently in each and silently fork. Every current caller
    passes pure column arithmetic."""
    clamp = f"CASE WHEN abs(({expr})) < 5e-7 THEN 0.0 ELSE ({expr}) END"
    return f"CAST(CAST(({clamp}) AS STRING) AS DECIMAL({prec},6))"


def _nf_mask(col: Column) -> Column:
    """Per-row non-finite presence bits: 4=NaN, 2=+inf, 1=-inf, else 0
    (NULL rows fall through every WHEN to 0). ONE bit_or over this
    mask replaces three bool_or buffers per sum — measured 1.5-1.7x
    on the window-frame and multi-moment aggregates, where every
    extra aggregate function multiplies frame-recompute cost."""
    return (
        F.when(F.isnan(col), F.lit(4))
        .when(col == F.lit(_PINF), F.lit(2))
        .when(col == F.lit(_NINF), F.lit(1))
        .otherwise(F.lit(0))
    )


def _nf_case(mask: Column, fin_sum: Column) -> Column:
    """IEEE propagation from the aggregated presence mask: NaN bit or
    both-infinity bits → NaN; one infinity → it; else the finite sum
    (empty/all-NULL group: mask NULL/0 → every bit test NULL/false →
    finite branch, whose SUM is NULL as before)."""
    return (
        F.when(
            (mask.bitwiseAND(F.lit(4)) != 0)
            | (mask.bitwiseAND(F.lit(3)) == 3),
            F.lit(_NAN),
        )
        .when(mask.bitwiseAND(F.lit(2)) != 0, F.lit(_PINF))
        .when(mask.bitwiseAND(F.lit(1)) != 0, F.lit(_NINF))
        .otherwise(fin_sum)
    )


_SQL_NF_MASK = (
    "CASE WHEN isnan(({e})) THEN 4"
    " WHEN ({e}) = CAST('Infinity' AS DOUBLE) THEN 2"
    " WHEN ({e}) = CAST('-Infinity' AS DOUBLE) THEN 1 ELSE 0 END"
)


def _sql_nf_case(mask: str, fin_sum: str) -> str:
    """SQL twin of :func:`_nf_case` (keep in lockstep)."""
    return (
        f"(CASE WHEN (({mask}) & 4) <> 0 OR (({mask}) & 3) = 3"
        f" THEN CAST('NaN' AS DOUBLE)"
        f" WHEN (({mask}) & 2) <> 0 THEN CAST('Infinity' AS DOUBLE)"
        f" WHEN (({mask}) & 1) <> 0 THEN CAST('-Infinity' AS DOUBLE)"
        f" ELSE {fin_sum} END)"
    )


def _isfin(col: Column) -> Column:
    """TRUE iff the double is finite (NULL rows stay NULL → excluded
    by the gating WHEN like any other NULL). Spark has no isfinite();
    NaN/±inf are the only non-finite doubles, and ``col == lit(inf)``
    is False for NaN on both engines (probe 2026-08-15)."""
    return ~(F.isnan(col) | (F.abs(col) == F.lit(_PINF)))


def fin(col) -> Column:
    """The value when finite, else NULL — the scalar participation
    gate for rank-based aggregates (percentile, histogram binning)
    where non-finite values have no well-defined position and the
    engines' native treatments diverge (the r6 NaN/Inf sweep caught
    Spark percentile and DuckDB quantile_cont interpolating different
    neighbors once NaN/±inf entered the order). SQL twin:
    :func:`sql_fin`."""
    col = F.col(col) if isinstance(col, str) else col
    return F.when(_isfin(col), col)


def sql_fin(expr: str) -> str:
    """SQL twin of :func:`fin` (keep in lockstep; both-engine-valid)."""
    pinf = "CAST('Infinity' AS DOUBLE)"
    return (
        f"(CASE WHEN NOT (isnan(({expr})) OR abs(({expr})) = {pinf})"
        f" THEN ({expr}) END)"
    )


def dsumr(col, prec: int = 30) -> Column:
    """Non-finite-aware, hash-stable raw SUM of a double expression —
    UNROUNDED double, for callers that feed the sum into further
    arithmetic (moments, averages). DuckDB twin: :func:`sql_dsumr`.

    A literal NaN/±inf stored in a measure column would CRASH the bare
    decimal route (CAST('NaN' AS DECIMAL) raises under ANSI on both
    engines — the r6 NaN/Inf sweep found one poisoned row killing all
    45 decimal-summed aggregates). Both engines' NATIVE sums propagate
    non-finite values per IEEE-754, and that propagation is
    ORDER-INDEPENDENT (any NaN, or +inf and -inf together → NaN; else
    +inf present → +inf; -inf present → -inf), so it composes with the
    exact-decimal strategy instead of breaking it: bit_or ONE per-row
    presence mask (4=NaN/2=+inf/1=-inf — a single extra aggregate
    buffer, not three bool_or's), decimal-sum ONLY the finite values,
    and let the mask override the finite sum. Matches native SUM on
    every probed case while keeping the finite path deterministic.
    """
    col = F.col(col) if isinstance(col, str) else col
    fin_sum = dec2dbl(F.sum(dbl2dec(F.when(_isfin(col), col), prec)))
    return _nf_case(F.bit_or(_nf_mask(col)), fin_sum)


def sql_dsumr(expr: str, prec: int = 30) -> str:
    """SQL twin of :func:`dsumr` (keep in lockstep). Uses only forms
    valid on BOTH engines (several oracles are executed verbatim as
    Spark SQL too): CAST('NaN'/'Infinity' AS DOUBLE) literals,
    isnan/abs/bit_or/& — no DuckDB-only isfinite()."""
    pinf = "CAST('Infinity' AS DOUBLE)"
    fin = f"CASE WHEN NOT (isnan(({expr})) OR abs(({expr})) = {pinf}) THEN ({expr}) END"
    fin_sum = sql_dec2dbl(f"SUM({sql_dbl2dec(fin, prec)})")
    mask = f"bit_or({_SQL_NF_MASK.format(e=expr)})"
    return _sql_nf_case(mask, fin_sum)


def dsumw(col, w) -> Column:
    """Windowed :func:`dsumr`: non-finite-aware exact-decimal SUM OVER
    a window spec — UNROUNDED double (callers mround). The presence
    flags aggregate OVER the SAME frame, so propagation is
    frame-accurate: a running sum turns NaN exactly from the first
    NaN-containing prefix on, matching native SUM OVER. DuckDB twin:
    :func:`sql_dsumw`."""
    col = F.col(col) if isinstance(col, str) else col
    fin_sum = dec2dbl(F.sum(dbl2dec(F.when(_isfin(col), col))).over(w))
    return _nf_case(F.bit_or(_nf_mask(col)).over(w), fin_sum)


def sql_dsumw(expr: str, over: str) -> str:
    """SQL twin of :func:`dsumw` (keep in lockstep); ``over`` is the
    full frame clause, e.g. ``"OVER w"`` or ``"OVER (PARTITION BY ...)"``.
    Both-engine-valid forms only (see :func:`sql_dsumr`)."""
    pinf = "CAST('Infinity' AS DOUBLE)"
    fin = f"CASE WHEN NOT (isnan(({expr})) OR abs(({expr})) = {pinf}) THEN ({expr}) END"
    fin_sum = sql_dec2dbl(f"SUM({sql_dbl2dec(fin)}) {over}")
    mask = f"(bit_or({_SQL_NF_MASK.format(e=expr)}) {over})"
    return _sql_nf_case(mask, fin_sum)


def dsum(col, alias: str, scale: int = 4) -> Column:
    """Hash-stable SUM of a double expression.

    Routes through DECIMAL(30,6): per-row cast is deterministic, decimal
    summation is exact (order-independent), the final DOUBLE conversion
    goes through :func:`dec2dbl`'s string route (the direct cast is NOT
    the same IEEE value on both engines at ≥1e10 — see dec2dbl),
    matched-round finishes the job. Non-finite inputs propagate per
    IEEE via :func:`dsumr` (mround passes NaN/±inf through raw — both
    identical doubles cross-engine). DuckDB twin: :func:`sql_dsum`.
    """
    col = F.col(col) if isinstance(col, str) else col
    return mround(dsumr(col), scale).alias(alias)


def davg(col, alias: str, scale: int = 4) -> Column:
    """Hash-stable AVG: exact decimal sum, one double division, matched round.

    The double division (identical dividend/divisor on both engines via
    dec2dbl) yields an identical double; native ROUND of that double
    does NOT match across engines at midpoints (the round-1
    q_win_range_frame bug) — mround does. The COUNT includes non-finite
    rows (they are values, not NULLs), matching native AVG: a NaN/±inf
    sum divided by any positive count is itself. DuckDB twin:
    :func:`sql_davg`.
    """
    col = F.col(col) if isinstance(col, str) else col
    return mround(dsumr(col) / F.count(col), scale).alias(alias)


def sql_dsum(expr: str, alias: str, scale: int = 4) -> str:
    """DuckDB SQL twin of :func:`dsum` (keep in lockstep)."""
    return f"{sql_mround(sql_dsumr(expr), scale)} AS {alias}"


def sql_davg(expr: str, alias: str, scale: int = 4) -> str:
    """DuckDB SQL twin of :func:`davg` (keep in lockstep)."""
    inner = f"({sql_dsumr(expr)} / COUNT(({expr})))"
    return f"{sql_mround(inner, scale)} AS {alias}"
