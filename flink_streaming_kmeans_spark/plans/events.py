"""§2.8 q_json_extract + §2.9 time windows over the events table.

Reference analog: the Flink demo's stream windowing/keying surface
(KMeansClustering.java, expected — SURVEY.md §1.1/§2.9 [PK]; checkout
was empty). These are the batch-deterministic decompositions of
tumble/slide/session windows: identical grouping semantics to
Structured Streaming's `F.window`/`F.session_window` over `readStream`
(the streaming variants are exercised test-tier in tests/), but
oracle-checkable.

Scale notes (100 TB): every query here is a single hash-aggregate over
the stream table — partial map-side combine, shuffle carries one row
per (window×key). Window-start derivation is pure per-row arithmetic
(no shuffle); session windows shuffle once on user_id, and Spark's
session-merge is per-key sorted — uniform key cardinality, AQE handles
stragglers.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.vector import (
    client_ntz,
    dsum,
    isum64,
    sql_dsum,
    sql_dsumw,
    sql_ts_valid,
    ts_valid,
)
from ..sources.loader import load_table
from .registry import register


def _with_yyjson_strict(ev):
    """Law 53 (r11), Spark half: mirror yyjson's strictness where
    Jackson is LENIENT, so both engines see the same validity set —
    the Jackson∩yyjson intersection. Jackson's own leniencies (probed
    r11, 79-doc battery, /tmp session probes → SCALE.md law 53):

    - 53d lone surrogate escapes (``\\ud800`` unpaired): Jackson
      extracts through them, yyjson declares the doc invalid.
    - 53e raw control chars 0x00-0x1F inside strings (literal tab/
      newline in a string VALUE): Jackson extracts, yyjson rejects.
      DEL 0x7f is accepted by BOTH, so the scanned class stops at
      0x1f.
    - 53f trailing content after the first balanced value
      (``{"k":5}{"k":6}``, ``{"k":5},`` …): Jackson reads the first
      value and ignores the rest; yyjson rejects the doc.

    100 TB design, three measured lessons (r11, each draft timed at
    sf0.1):

    1. A one-select draft referencing the structural-decomposition
       subtree four times cloned the whole tree per reference; the
       generated projection blew past codegen limits and fell back to
       interpreted mode (30x).
    2. Staging the shared subtrees fixed duplication but NOT the real
       problem: the higher-order functions (filter/aggregate lambdas)
       are CodegenFallback expressions, and ONE of them anywhere in a
       projection knocks the entire stage out of whole-stage codegen
       — 4x even with per-row fast paths, because every row pays
       interpreted dispatch.
    3. Final form: every guard is PURE REGEX (codegen-native). The
       split-on-quote decomposition is replaced by two equivalences:
       after dropping escape pairs, regex leftmost matching pairs
       quotes exactly as JSON does, so ``"[^"]*"`` spans ARE the
       string spans (p0 = spans replaced by a sentinel), and a
       parity-anchored pattern ``^([^"]*"[^"]*")*[^"]*"[^"]*ctrl``
       matches iff a control char sits inside a real span. The only
       non-regular check — early depth balance (53f) — needs a
       per-char fold, so docs are PHYSICALLY branched: flat docs
       (regex-decidable, the entire machine-written hot path) stay in
       the codegen lane; only nested docs take the interpreted fold
       lane. Two parquet scans of the same table cost less than one
       interpreted pass over every row.

    Takes the events frame, returns it with one extra boolean column
    ``_jv53`` (true = the doc passes the yyjson-strictness half; the
    Jackson half is enforced by get_json_object itself returning
    NULL). Intermediate columns are dropped by Catalyst's column
    pruning after the final select.
    """
    props = F.col("props")
    # Escaped-backslash pairs are replaced with a SENTINEL, not
    # deleted — an empty replacement fabricates adjacency, exactly
    # the r6 lesson the oracle's chr(1) join encodes: in
    # '"\ud800\\\udc00"' deleting the middle \\ welds the two LONE
    # surrogate escapes into a valid-looking pair and the 53d guard
    # missed it (r11 in-round review find, parity divergence
    # confirmed live). DEL (0x7f) is the sentinel: not a backslash
    # (can't re-enable escape parsing), not a quote (can't break
    # span pairing), and OUTSIDE the 53e scanned class [\x00-\x1f]
    # (a \\ inside a string must not read as a control char).
    nb = F.regexp_replace(props, r"\\\\", "\x7f")
    nb2 = F.regexp_replace(nb, r"\\\"", "")  # then \" escapes
    # p0: true string spans → \x01 sentinel (leftmost pairing = JSON
    # pairing once quotes can no longer be escaped), whitespace out.
    p0 = F.regexp_replace(
        F.regexp_replace(nb2, '"[^"]*"', "\x01"), r"[ \t\n\r]", ""
    )

    # 53d — no backslash ⇒ no escapes at all; else drop valid
    # high+low pairs and any surviving \uD8xx-\uDFxx escape is lone.
    lone_surr = F.when(~props.contains("\\"), F.lit(False)).otherwise(
        F.regexp_replace(
            nb,
            r"\\u[dD][89abAB][0-9a-fA-F]{2}\\u[dD][c-fC-F][0-9a-fA-F]{2}",
            "",
        ).rlike(r"\\u[dD][89a-fA-F]")
    )

    # 53e — no raw control char anywhere ⇒ none inside a string; else
    # the parity-anchored pattern: an ODD number of quotes, then a
    # control char before the next quote ⇔ the char is inside a real
    # string span (\t\n BETWEEN tokens stays legal).
    ctrl_in_str = F.when(
        ~props.rlike("[\x00-\x1f]"), F.lit(False)
    ).otherwise(nb2.rlike('^([^"]*"[^"]*")*[^"]*"[^"]*[\x00-\x1f]'))

    # RAW flat probe: a doc with no inner brackets ANYWHERE (even in
    # strings) is flat without needing the string-stripping at all —
    # the machine-written hot path answers here and _p0's four
    # regexp_replace passes never run for it (lazy CaseWhen branch).
    raw_flat = props.rlike(
        r"^[ \t\n\r]*\{[^{}\[\]]*\}[ \t\n\r]*$"
    ) | props.rlike(r"^[ \t\n\r]*\[[^{}\[\]]*\][ \t\n\r]*$")
    s0 = ev.select("*", raw_flat.alias("_rff"))
    s1 = s0.select(
        "*",
        F.when(~F.col("_rff"), p0).alias("_p0"),
        lone_surr.alias("_surr"),
        ctrl_in_str.alias("_ctl"),
    )

    # 53f — a valid single value never returns to depth 0 before its
    # end. Flat docs (no nested brackets outside strings) are
    # regex-decidable and CANNOT balance early; only nested docs need
    # the per-char depth fold (CodegenFallback), so the frame is
    # physically split and re-unioned: the flat lane keeps
    # whole-stage codegen, the fold lane carries ~zero real rows.
    is_flat = F.coalesce(
        F.col("_rff")
        | F.col("_p0").rlike(r"^\{[^{}\[\]]*\}$")
        | F.col("_p0").rlike(r"^\[[^{}\[\]]*\]$"),
        F.lit(False),
    )
    flat_lane = s1.where(is_flat).select(
        "*", F.lit(False).alias("_trail")
    )

    def _step(acc, c):
        d = (
            acc["d"]
            + F.when(c.isin("{", "["), 1)
            .when(c.isin("}", "]"), -1)
            .otherwise(0)
        )
        return F.struct(
            d.alias("d"),
            (acc["bad"] | acc["zero"] | (d < 0)).alias("bad"),
            (acc["zero"] | ((d == 0) & c.isin("}", "]"))).alias("zero"),
        )

    scan = F.aggregate(
        F.split(F.col("_p0"), ""),
        F.struct(
            F.lit(0).alias("d"),
            F.lit(False).alias("bad"),
            F.lit(False).alias("zero"),
        ),
        _step,
    )
    deep_lane = s1.where(~is_flat).select(
        "*",
        F.when(F.col("_p0").rlike(r"^[\{\[]"), scan["bad"])
        .otherwise(F.lit(False))
        .alias("_trail"),
    )

    return flat_lane.unionByName(deep_lane).select(
        "*",
        (~F.col("_surr") & ~F.col("_ctl") & ~F.col("_trail")).alias(
            "_jv53"
        ),
    )


@register(
    "q_json_extract",
    # The value contract (r6 JSON-edge sweep): $.k counts toward
    # sum_k iff its extracted TEXT is the canonical decimal form of a
    # BIGINT — everything else (float 1.7, boolean, 1e2, array,
    # object, overflow, leading zeros) maps to NULL on BOTH engines.
    # Naive CAST diverged or crashed on every one of those: Spark
    # ANSI-raises on CAST('1.7'/'true'/'100.0' AS BIGINT) where
    # DuckDB's JSON cast ROUNDS 1.7→2 and maps true→1; DuckDB
    # normalizes a >64-bit integer to a double string where Spark
    # keeps the digits; and json_extract (without _string) keeps
    # quotes on string values where get_json_object strips them —
    # json_extract_string matches Spark's text on every probed case.
    # The round-trip check TRY_CAST(t)::VARCHAR = t is crash-free and
    # engine-identical: every non-canonical text either try-casts to
    # NULL (boolean/array/overflow) or fails the round-trip (1.7 →
    # 2 ≠ '1.7'). json_valid guard as before (DuckDB json_extract
    # RAISES on malformed input where get_json_object returns NULL).
    #
    # Law 53 (r11 STRUCTURE sweep; see _with_yyjson_strict and SCALE.md):
    # a doc counts as JSON iff BOTH parsers accept it in full — the
    # Jackson∩yyjson intersection, each side's leniency closed by a
    # structural guard on the OTHER side's behalf. The r6 trailing-
    # comma scan was the first instance (yyjson-lenient); r11 adds:
    #   53a depth: Jackson caps nesting at 1000 (silent NULL at
    #       1001+); yyjson parses arbitrarily deep → oracle mirrors
    #       with a bracket-depth scan, gated to docs with >=2002
    #       bracket chars so real rows never pay it.
    #   53b number length: Jackson caps a number token at 1000 DIGIT
    #       chars (fraction digits count, '.' and exponent marker
    #       don't; a 5000-digit integer ANYWHERE nulls the whole
    #       doc); yyjson has no cap → oracle mirrors with a
    #       digits-per-token regex.
    #   53c non-standard literals: yyjson accepts NaN/nan/NAN,
    #       Infinity/-Infinity/infinity, Inf/inf/-inf as VALUES
    #       where Jackson rejects the doc → oracle scans the
    #       outside-string text (keys/values in strings can't
    #       false-positive: 'nan'/'inf' inside quotes are stripped
    #       before the scan).
    #   53d/e/f (Jackson-lenient side): see _with_yyjson_strict.
    oracle="""
    WITH s AS (
        -- outside-string segments joined with chr(1), NOT '': an
        -- empty join fabricates ',]' from the ',' before a string
        -- element and the ']' after it (review r6 — a valid
        -- {"t": ["a","b"]} doc was wrongly discarded); the separator
        -- keeps structural adjacency honest while any non-structural
        -- char works, since scanned patterns are 2 chars long
        SELECT event_type, props,
               replace(replace(replace(replace(
                   array_to_string(list_filter(
                       string_split(replace(replace(props,
                           '\\\\', ''), '\\"', ''), '"'),
                       (seg, i) -> i % 2 = 1), chr(1)),
                   ' ', ''), chr(9), ''), chr(10), ''), chr(13), '') AS p0
        FROM events
    ), g AS (
        SELECT event_type, props, p0,
               regexp_replace(p0, '[^{}\\[\\]]', '', 'g') AS b
        FROM s
    ), x AS (
        SELECT event_type,
               CASE WHEN json_valid(props)
                         AND NOT contains(p0, ',}')
                         AND NOT contains(p0, ',]')
                         -- law 53a: Jackson nesting cap (max depth
                         -- 1000); <2002 brackets can't exceed it on
                         -- any balanced doc, so real rows skip the
                         -- O(n^2) prefix scan entirely
                         AND (length(b) < 2002 OR (
                             SELECT max(2*length(replace(replace(
                                        b[1:i], '}', ''), ']', '')) - i)
                             FROM unnest(range(1, length(b)+1)) AS t(i)
                         ) <= 1000)
                         -- law 53b: Jackson number-token digit cap
                         -- (1000); [.eE+-] interleave keeps the match
                         -- inside ONE token, {500}x2+1 = 1001 digits
                         AND NOT regexp_matches(p0,
                             '(([.eE+-]*[0-9]){500}){2}[.eE+-]*[0-9]')
                         -- law 53c: yyjson-only NaN/Infinity literals
                         -- (9 spellings); p0 has strings stripped
                         AND NOT contains(lower(p0), 'nan')
                         AND NOT contains(lower(p0), 'inf')
                    THEN json_extract_string(props, '$.k') END AS t
        FROM g
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN CAST(TRY_CAST(t AS BIGINT) AS VARCHAR) = t
                         THEN TRY_CAST(t AS BIGINT) END) AS BIGINT) AS sum_k,
           COUNT(*) AS n_events
    FROM x
    GROUP BY event_type
    """,
)
def q_json_extract(spark, sf_dir):
    # props is a JSON string column ({"k": int}); extraction stays
    # JVM-side (get_json_object + structural guards, no Python in the
    # path). Value contract: see the oracle comment — k counts iff
    # its text is a canonical BIGINT literal (try_cast round-trip,
    # both engines) AND the doc is Jackson∩yyjson-valid (law 53;
    # Jackson enforces its own half inside get_json_object, the
    # _yyjson_strict guard mirrors the other half).
    ev = _with_yyjson_strict(load_table(spark, sf_dir, "events"))
    # Project the extracted text ONCE before the aggregate: the
    # roundtrip below references t three times, and subexpression
    # elimination SKIPS conditional branches — with t inline as
    # when(_jv53, get_json_object) the JSON parse ran 3x per row
    # (measured r11: +0.9 s at sf0.1 on the single-partition events
    # file). As a projected column the parse runs once and the
    # references are free.
    ev = ev.select(
        "event_type",
        F.when(F.col("_jv53"), F.get_json_object("props", "$.k")).alias(
            "_t"
        ),
    )
    t = F.col("_t")
    k = F.when(t.try_cast("long").cast("string") == t, t.try_cast("long"))
    return ev.groupBy("event_type").agg(
        # law 48: JSON-extracted ints are raw-magnitude — 128-bit sum
        isum64(k, "sum_k"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "q_win_tumble",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS win_start,
           COUNT(*) AS n_events,
           {sql_dsum('value', 'sum_value')}
    FROM events WHERE ts IS NOT NULL AND {sql_ts_valid('ts')}
    GROUP BY date_trunc('hour', ts)
    """,
)
def q_win_tumble(spark, sf_dir):
    # Tumbling 1-hour windows — batch equivalent of the streaming
    # groupBy(window(...)); window starts are epoch-aligned, which for
    # whole hours equals date_trunc('hour'). The oracle filters NULL
    # ts explicitly: Spark's F.window drops NULL event times
    # structurally (un-windowable), where bare SQL GROUP BY would emit
    # a NULL-bucket row (NULL-events adversarial sweep, r6).
    ev = load_table(spark, sf_dir, "events").where(ts_valid("ts"))
    return client_ntz(
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(F.col("w.start").alias("win_start"), "n_events", "sum_value")
    )


@register(
    "q_win_slide",
    oracle=f"""
    WITH buckets AS (
        -- ts IS NOT NULL: F.window drops NULL event times structurally
        -- (NULL-events adversarial sweep, r6)
        SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS b5, value
        FROM events WHERE ts IS NOT NULL AND {sql_ts_valid('ts')}
    ), slides AS (
        -- each event belongs to exactly 10min/5min = 2 sliding windows:
        -- the one starting at its 5-minute bucket and the one 5 minutes
        -- earlier (hand-built slide enumeration; Spark's F.window emits
        -- the same epoch-aligned starts)
        SELECT b5 AS win_start, value FROM buckets
        UNION ALL
        SELECT b5 - INTERVAL 5 MINUTE AS win_start, value FROM buckets
    )
    SELECT win_start, COUNT(*) AS n_events, {sql_dsum('value', 'sum_value')}
    FROM slides
    GROUP BY win_start
    """,
)
def q_win_slide(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").where(ts_valid("ts"))
    return client_ntz(
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(F.col("w.start").alias("win_start"), "n_events", "sum_value")
    )


@register(
    "q_win_session",
    oracle=f"""
    WITH marked AS (
        -- ts IS NOT NULL: session_window drops NULL event times
        -- structurally (NULL-events adversarial sweep, r6)
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events WHERE ts IS NOT NULL AND {sql_ts_valid('ts')}
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
    )
    SELECT user_id, date_trunc('second', MIN(ts)) AS session_start,
           COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, sid
    """,
)
def q_win_session(spark, sf_dir):
    # 30-minute-gap sessions per user. Spark's session_window MERGES
    # an event arriving at exactly prev+30min into the open session
    # (verified empirically, review r6 — a 00:00/00:30/01:00 triple
    # is ONE session; the first draft's >= oracle split it into
    # three, masked only because the fixture's µs-random timestamps
    # never land exactly on the gap). The oracle's gaps-and-islands
    # flag therefore opens a new session only when the gap EXCEEDS
    # 30 minutes; boundary pinned in tests/test_streaming.py.
    # ts_valid: event-time domain gate (r6 extreme-timestamp sweep) —
    # session_start RETURNS the raw (second-trunc) timestamp, and a
    # pre-0001-01-03 value crashes the Python-interop conversion.
    ev = load_table(spark, sf_dir, "events").where(ts_valid("ts"))
    return client_ntz(
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            # registry rule 2: second-truncate any returned events
            # timestamp (review r6 — this column was raw microseconds)
            F.date_trunc("second", F.col("w.start")).alias("session_start"),
            "n_events",
        )
    )


@register(
    "q_evt_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t0 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, MIN(e.ts) AS t1
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t0
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t1
        GROUP BY e.user_id
    )
    SELECT v.user_id,
           date_trunc('second', v.t0) AS t_view,
           date_trunc('second', c.t1) AS t_click,
           date_trunc('second', p.t2) AS t_purchase,
           CAST(1 + (c.user_id IS NOT NULL)::INT
                  + (p.user_id IS NOT NULL)::INT AS INT) AS stage
    FROM v LEFT JOIN c ON v.user_id = c.user_id
            LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def q_evt_funnel(spark, sf_dir):
    """Ordered conversion funnel (view → click → purchase): per user,
    the first view, the first click AFTER that view, the first purchase
    AFTER that click, and the stage reached. The event-analytics
    operator the windowing queries don't cover: stage N is defined
    relative to stage N-1's timestamp, not a fixed window.

    Three user-keyed aggregates + user-keyed joins — every shuffle is
    on user_id (high-cardinality, uniform), each stage's input shrinks
    to the survivors of the previous one. Scales linearly; no
    per-user event-list materialization (contrast a collect_list +
    UDF formulation, which holds a user's whole history in memory)."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    return client_ntz(
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.date_trunc("second", "t0").alias("t_view"),
            F.date_trunc("second", "t1").alias("t_click"),
            F.date_trunc("second", "t2").alias("t_purchase"),
            (
                F.lit(1)
                + F.col("t1").isNotNull().cast("int")
                + F.col("t2").isNotNull().cast("int")
            ).cast("int").alias("stage"),
        )
    )


@register(
    "q_ts_gapfill",
    oracle=f"""
    WITH ev AS (
        -- event-time domain gate (r6 extreme-timestamp sweep): ONE
        -- out-of-domain outlier row otherwise inflates the generated
        -- grid to the whole calendar (millions of fabricated rows)
        SELECT * FROM events WHERE {sql_ts_valid('ts')}
    ), bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo,
               date_trunc('hour', MAX(ts)) AS hi
        FROM ev
    ), hours AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        FROM bounds
    ), types AS (
        SELECT DISTINCT event_type FROM ev
    ), grid AS (
        SELECT h, event_type FROM hours CROSS JOIN types
    ), agg AS (
        SELECT date_trunc('hour', ts) AS h, event_type,
               COUNT(*) AS n, {sql_dsum('value', 'sv')}
        FROM ev GROUP BY 1, 2
    )
    SELECT g.h AS win_start, g.event_type,
           COALESCE(a.n, 0) AS n_events,
           COALESCE(a.sv, 0.0) AS sum_value
    FROM grid g LEFT JOIN agg a ON g.h = a.h AND g.event_type = a.event_type
    """,
)
def q_ts_gapfill(spark, sf_dir):
    """Time-series gap filling: the (hour × event_type) calendar grid
    from sequence() + explode, left-joined to the hourly aggregate,
    missing cells coalesced to zero — what every downstream
    charting/forecast consumer needs from an events table (a GROUP BY
    silently drops empty buckets). The grid derives from a 1-row
    min/max aggregate (broadcast); grid⋈agg is an equi-join on
    (hour, type). Grid size is time-span × type-cardinality — plan it
    like a dimension table, it never scales with event volume."""
    ev = load_table(spark, sf_dir, "events").where(ts_valid("ts"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    types = ev.select("event_type").distinct()
    grid = hours.crossJoin(types)
    agg = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), dsum("value", "sv"))
    return client_ntz(
        grid.join(agg, ["h", "event_type"], "left")
        .select(
            F.col("h").alias("win_start"),
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.coalesce("sv", F.lit(0.0)).alias("sum_value"),
        )
    )


@register(
    "q_win_time_range",
    oracle=f"""
    SELECT event_id, user_id, date_trunc('second', ts) AS ts_s,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_prev_10m,
           {{dsum_over_w}}
    FROM events
    WHERE {{tsv}}
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW)
    """.format(
        dsum_over_w=f"{sql_dsumw('value', 'OVER w')} AS sum_value_10m",
        tsv=sql_ts_valid("ts"),
    ),
)
def q_win_time_range(spark, sf_dir):
    """Per-user trailing 10-minute RANGE window (count + decimal-exact
    sum) — the time-interval frame the numeric q_win_range_frame
    doesn't cover, and the batch twin of a streaming sliding
    aggregate. Partitioned by user_id (high-cardinality, uniform), so
    unlike coarse-key range frames (SCALE.md finding 2) the per-key
    frame density is bounded by a user's own 10-minute event rate."""
    ev = load_table(spark, sf_dir, "events").where(ts_valid("ts"))
    # SQL frame spec: the DataFrame rangeBetween API takes raw longs,
    # which for timestamps means remembering the internal microsecond
    # encoding — the INTERVAL literal form is explicit and readable.
    return client_ntz(ev.selectExpr(
        "event_id",
        "user_id",
        "date_trunc('second', ts) AS ts_s",
        "CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW) AS BIGINT)"
        " AS n_prev_10m",
        sql_dsumw(
            "value",
            "OVER (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW)",
        )
        + " AS sum_value_10m",
    ))


@register(
    "q_rollup_time",
    oracle=f"""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           EXTRACT(hour FROM ts) AS hour,
           event_type,
           COUNT(*) AS n, {sql_dsum('value', 'sum_value')}
    FROM events
    GROUP BY ROLLUP (CAST(date_trunc('day', ts) AS DATE),
                     EXTRACT(hour FROM ts), event_type)
    """,
)
def q_rollup_time(spark, sf_dir):
    """Hypertable-style time rollup: one pass produces the hourly,
    daily, and grand-total aggregates via ROLLUP over the
    (day, hour, type) hierarchy — the continuous-aggregate shape a
    time-series store maintains. Spark expands each input row once per
    grouping level, then one partial+final hash-aggregate; shuffle
    carries only group rows. At 100 TB the day/hour derivation also
    matches a partition layout (day=.../hour=...), so the finest level
    reads pruned."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.date_trunc("day", "ts").cast("date").alias("day"),
            F.hour("ts").cast("bigint").alias("hour"),
            "event_type",
            "value",
        )
        .rollup("day", "hour", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
    )


@register(
    "q_scd2_intervals",
    oracle=f"""
    SELECT user_id, event_type AS state,
           date_trunc('second', ts) AS valid_from,
           -- event_id NULLS LAST: law 40 on the tie-break key (same
           -- fork q_evt_markov hit — r9 fuzz arm, seed 141421)
           date_trunc('second',
                      LEAD(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts NULLS LAST,
                                              event_id NULLS LAST))
               AS valid_to,
           (LEAD(ts) OVER (PARTITION BY user_id
                           ORDER BY ts NULLS LAST,
                                    event_id NULLS LAST) IS NULL)
               AS is_current
    FROM events
    WHERE ts IS NULL OR {sql_ts_valid('ts')}
    """,
)
def q_scd2_intervals(spark, sf_dir):
    """SCD2 (slowly-changing-dimension type 2) interval construction:
    each event opens a validity interval for the user's state
    (event_type), closed by the next event's timestamp; the last
    interval per user is open (is_current). The standard
    warehouse-history shape, built with one lead() window — one
    shuffle on user_id, per-key sort, no joins. event_id breaks ts
    ties so interval boundaries are deterministic at any partitioning;
    NULL ts pinned LAST on both engines (Spark defaults NULLS FIRST,
    DuckDB LAST — a NULL-ts event would otherwise shift every
    interval in its user's chain; NULL-events adversarial sweep, r6)."""
    from pyspark.sql import Window as W

    # Event-time domain gate (r6 extreme-timestamp sweep): the
    # interval columns RETURN the raw (second-trunc) timestamps, and a
    # pre-0001-01-03 value crashes Spark's Python-interop conversion
    # at collect. NULL-ts rows stay (their NULLS LAST chain position
    # is part of this query's pinned semantics).
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNull() | ts_valid("ts")
    )
    # event_id NULLS LAST too (law 40 on the tie-break, see oracle)
    w = W.partitionBy("user_id").orderBy(
        F.asc_nulls_last("ts"), F.asc_nulls_last("event_id")
    )
    nxt = F.lead("ts").over(w)
    return client_ntz(ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        # registry rule 2: second-truncate returned events timestamps
        # (review r6 — these columns were raw microseconds)
        F.date_trunc("second", "ts").alias("valid_from"),
        F.date_trunc("second", nxt).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    ))
