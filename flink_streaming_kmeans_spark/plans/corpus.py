"""Round-5 corpus-statistics + storage-layout operators.

Fifteen more training-data-pipeline / OLAP primitives over the
documents / embeddings / events / TPC-H tables, all hash-tier:

- q_text_heavy_hitters: corpus-level frequent-token top-k — the
  vocabulary head every tokenizer/quality pipeline starts from.
- q_text_surprisal: per-document unigram LM score (quantized
  integer surprisal) — the cheap perplexity proxy used to rank
  documents for curriculum/filtering.
- q_emb_quantize: int8 scalar quantization of the embedding column
  (per-dimension min/max codebook) — 4x storage cut for ANN shipping.
- q_zorder_cluster: Morton (Z-order) interleaving of two key columns
  — the multi-column clustering key that keeps BOTH columns' file
  min/max tight for parquet skipping.
- q_graph_pagerank: two unrolled PageRank iterations over the
  customer<->supplier trade graph — iterated join-aggregate with
  full-value oracle parity.
- q_evt_markov: first-order Markov transition matrix over per-user
  event sequences — all-integer probabilities (p_e4).
- q_evt_anomaly: per-user 3-sigma outlier detection — float math only
  in the (bit-identical) filter threshold; output is integers + tag.
- q_tpch_q3 / q_tpch_q5 / q_tpch_q10 / q_tpch_q18: the classic
  TPC-H shipping-priority, local-supplier-volume, returned-item,
  and large-volume-customer join trees adapted to this schema —
  selective fact joins, dim broadcasts, HAVING semi-join-back,
  decimal-exact revenue/quantity.
- q_evt_basket: market-basket co-occurrence lift between event types,
  all-integer lift_e4.
- q_profile_table: per-column null/distinct/min-max profiling (the
  deequ/dbt-test class) in one multi-distinct scan.
- q_feat_snapshot: point-in-time feature assembly per customer as of
  a cutoff — the feature-store leakage-safe snapshot.
- q_neg_sample: deterministic (RNG-free) negative sampling for
  contrastive/recommendation training — integer mixing + anti-join.

WINDOW NOTE: inside the round-6 correctness window (module registers
third). The canonical rotation plan lives in plans/registry.py next
to ``_MODULES``; do NOT add queries to this module while it is in
the window prefix.

Reference analog: the reference demo ships no corpus tooling (it is a
streaming k-means demo — SURVEY.md §1.1 [PK]); these extend the
engine along the training-pipeline axis the build brief makes
first-class.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.vector import dsum, dsumr, emb_finite, mround, sql_dsum, sql_dsumr, sql_emb_finite, sql_mround
from ..sources.loader import fan_out, load_table
from .registry import register

# ---------------------------------------------------------------------------
# q_text_heavy_hitters


@register(
    "q_text_heavy_hitters",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ), c AS (
        SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok
    )
    SELECT tok, n,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS INT) AS rank
    FROM c ORDER BY n DESC, tok LIMIT 20
    """,
)
def q_text_heavy_hitters(spark, sf_dir):
    """Corpus-level frequent tokens (exact top-20 with rank, tok as
    tie-break).

    Shape: explode -> hash-aggregate keyed by token (partial map-side
    combine collapses each partition to its local vocabulary before
    the shuffle) -> global top-k. Spark compiles orderBy().limit(20)
    to TakeOrderedAndProject: each partition keeps a 20-element heap
    and the driver merges P*20 rows — no global sort, no single-task
    ordering of the vocabulary. That is the 100 TB shape; the final
    20-row rank window is driver-trivial by construction.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok"))
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    top = cnt.orderBy(F.desc("n"), "tok").limit(20)
    return top.withColumn(
        "rank", F.row_number().over(W.orderBy(F.desc("n"), "tok"))
    )


# ---------------------------------------------------------------------------
# q_text_surprisal


@register(
    "q_text_surprisal",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ), freq AS (
        SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok
    ), tot AS (
        SELECT SUM(n) AS tot FROM freq
    ), scored AS (
        SELECT t.doc_id,
               length(bin(tot)) - length(bin(f.n)) AS s
        FROM toks t JOIN freq f USING (tok) CROSS JOIN tot
    )
    SELECT doc_id,
           COUNT(*) AS n_toks,
           CAST((2 * 10000 * SUM(s) + COUNT(*)) // (2 * COUNT(*))
                AS BIGINT) AS surprisal_e4
    FROM scored GROUP BY doc_id
    """,
)
def q_text_surprisal(spark, sf_dir):
    """Per-document unigram language-model score: mean token
    surprisal, the cheap perplexity proxy used to rank documents for
    quality filtering and curriculum.

    Surprisal is QUANTIZED to integers so the hash oracle has no
    transcendental surface: s(tok) = bitlen(total) - bitlen(count) =
    floor(log2 total) - floor(log2 count) ~ -log2 p(tok) +/- 1, with
    bitlen computed as length(bin(n)) — pure integer/string ops that
    both engines evaluate identically (native LOG2 is log(x)/log(2)
    on the JVM and lands on 52.999... at exact powers of two). The
    per-doc mean is the half-up integer division
    (2*10^4*sum + n) div (2n) — every intermediate a BIGINT.

    Shape: one explode; token-frequency hash-aggregate (map-side
    combine); a join of occurrences to frequencies keyed on token —
    at 100 TB you broadcast the head of the vocabulary and default
    the tail (Zipf: the head covers ~all occurrences); the 1-row
    total crossJoin is broadcast by construction. Final per-doc
    hash-aggregate. No float anywhere.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    tot = freq.agg(F.sum("n").alias("tot"))
    scored = (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            (F.length(F.bin("tot")) - F.length(F.bin("n"))).alias("s"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_toks"),
        F.expr(
            "CAST((2 * 10000 * SUM(s) + COUNT(*)) DIV (2 * COUNT(*))"
            " AS BIGINT)"
        ).alias("surprisal_e4"),
    )


# ---------------------------------------------------------------------------
# q_emb_quantize


@register(
    "q_emb_quantize",
    oracle=f"""
    WITH ex AS (
        SELECT vec_id, CAST(r.range AS INT) AS dim,
               CAST(floor(embedding[CAST(r.range AS INT) + 1]::DOUBLE
                          * 1000000 + 0.5) AS BIGINT) AS qi
        FROM embeddings CROSS JOIN range(64) r
        WHERE len(embedding) = 64 AND {sql_emb_finite('embedding')}
    ), st AS (
        SELECT dim, MIN(qi) AS lo, MAX(qi) AS hi FROM ex GROUP BY dim
    )
    SELECT vec_id,
           -- ORDER BY dim, bucket: under a DUPLICATE vec_id carrying
           -- two different vectors, dim alone leaves the within-dim
           -- order engine-defined; the numeric bucket tiebreak
           -- matches Spark's array_sort over struct(dim, qb)
           -- (doctored-embeddings sweep, r6)
           string_agg(
               CAST(CASE WHEN hi = lo THEN 0
                         ELSE (2 * 255 * (qi - lo) + (hi - lo))
                              // (2 * (hi - lo)) END AS VARCHAR),
               ',' ORDER BY dim,
                        CASE WHEN hi = lo THEN 0
                             ELSE (2 * 255 * (qi - lo) + (hi - lo))
                                  // (2 * (hi - lo)) END) AS q8
    FROM ex JOIN st USING (dim)
    GROUP BY vec_id
    """,
)
def q_emb_quantize(spark, sf_dir):
    """Int8 scalar quantization of the embedding column: per-dimension
    min/max codebook, each value mapped half-up to 0..255 — the
    standard 4x storage/bandwidth cut applied before shipping vectors
    into an ANN index.

    Determinism: the float32 values are first quantized to BIGINT
    micro-units (floor(x*1e6+0.5), the q_emb_normalize pattern), so
    the codebook (per-dim integer min/max) and the half-up scaling
    (2*255*(qi-lo) + (hi-lo)) div (2*(hi-lo)) are pure integer
    arithmetic on both engines.

    Shape at 100 TB: one posexplode pass; the codebook is a
    64-row aggregate — broadcast back to the second pass (explicitly
    F.broadcast'ed below); per-vector regroup is keyed on vec_id (the
    table's natural partitioning, so AQE sees a shuffle both sides
    already share). Nothing quadratic, nothing single-node.
    """
    # size-64 guard on BOTH engines: the codebook is 64-dim by spec,
    # and a short/empty vector would diverge between posexplode
    # (drops it) and the oracle's CROSS JOIN range(64) (emits NULL
    # rows) — the regenerated-data hazard class (review r6).
    e = load_table(spark, sf_dir, "embeddings").where(
        (F.size("embedding") == 64) & emb_finite("embedding")
    )
    ex = e.select(
        "vec_id", F.posexplode("embedding").alias("dim", "x")
    ).select(
        "vec_id",
        "dim",
        F.floor(F.col("x").cast("double") * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("qi"),
    )
    st = ex.groupBy("dim").agg(F.min("qi").alias("lo"), F.max("qi").alias("hi"))
    qb = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.expr("(2 * 255 * (qi - lo) + (hi - lo)) DIV (2 * (hi - lo))")
    )
    j = ex.join(F.broadcast(st), "dim").select("vec_id", "dim", qb.alias("qb"))
    return j.groupBy("vec_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "qb"))),
                lambda s: s["qb"].cast("string"),
            ),
            ",",
        ).alias("q8")
    )


# ---------------------------------------------------------------------------
# q_zorder_cluster


def _interleave_terms(xcol: str, ycol: str, bits: int, div: str) -> str:
    """Morton-interleave expression from pure integer div/mod/mul —
    the SAME arithmetic emitted for Spark (div='DIV') and DuckDB
    (div='//'), so the two engines structurally cannot diverge
    (shift operators/functions differ between the dialects; div+mod
    does not)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({xcol} {div} {2**i}) % 2) * {2 ** (2 * i)}")
        terms.append(f"(({ycol} {div} {2**i}) % 2) * {2 ** (2 * i + 1)}")
    return " + ".join(terms)


@register(
    "q_zorder_cluster",
    oracle=f"""
    WITH k AS (
        SELECT event_id,
               user_id % 256 AS x,
               (CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600)
                   % 256 AS y
        FROM events
    )
    SELECT event_id, x, y,
           CAST({_interleave_terms('x', 'y', 8, '//')} AS BIGINT) AS zkey,
           CAST(({_interleave_terms('x', 'y', 8, '//')}) // 4096
                AS BIGINT) AS bucket
    FROM k
    """,
)
def q_zorder_cluster(spark, sf_dir):
    """Z-order (Morton) clustering key over two event dimensions
    (user bucket x = user_id mod 256, time bucket y = hour-of-epoch
    mod 256): interleave their bits so that sorting by the single
    zkey keeps file-level min/max ranges tight on BOTH columns —
    multi-column parquet skipping from one sort order, the standard
    lakehouse layout optimization (Delta/Iceberg OPTIMIZE ZORDER).

    The interleave is emitted as identical integer div/mod/mul
    arithmetic on both engines (no shift operators — dialects differ;
    no floats anywhere). bucket = zkey div 4096 partitions the 16-bit
    Morton space into 16 range buckets — the repartitionByRange file
    boundaries a writer would use.

    Shape at 100 TB: per-row integer expression inside whole-stage
    codegen + a range partition on zkey before write; no shuffle
    beyond the one the write layout itself demands. The file-skipping
    payoff is asserted in tests/test_storage.py: after a zkey-range
    write, per-file spans of x AND y shrink vs the unsorted layout.

    DuckDB's integer `/` is float division pre-0.10 and its `//` is
    not Spark syntax, so both engines get their own div token from the
    same generator (_interleave_terms); epoch(date_trunc('hour')) is
    an exact integer so the seconds->hours division has no fractional
    surface."""
    ev = load_table(spark, sf_dir, "events")
    k = ev.select(
        "event_id",
        (F.col("user_id") % 256).alias("x"),
        (
            (F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) / F.lit(3600))
            .cast("bigint")
            % 256
        ).alias("y"),
    )
    z = F.expr(f"CAST({_interleave_terms('x', 'y', 8, 'DIV')} AS BIGINT)")
    return k.select(
        "event_id",
        "x",
        "y",
        z.alias("zkey"),
        F.expr(
            f"CAST(({_interleave_terms('x', 'y', 8, 'DIV')}) DIV 4096"
            " AS BIGINT)"
        ).alias("bucket"),
    )


# ---------------------------------------------------------------------------
# q_graph_pagerank


@register(
    "q_graph_pagerank",
    oracle="""
    WITH e0 AS (
        SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), edges AS (
        SELECT c AS src, 1000000 + s AS dst FROM e0
        UNION ALL
        SELECT 1000000 + s AS src, c AS dst FROM e0
    ), deg AS (
        SELECT src, COUNT(*) AS d FROM edges GROUP BY src
    ), pr1 AS (
        SELECT e.dst AS node,
               0.15 + 0.85 * (CAST(SUM(CAST(floor(1.0 / d * 1000000 + 0.5)
                                            AS BIGINT)) AS DOUBLE)
                              / 1000000) AS pr
        FROM edges e JOIN deg USING (src)
        GROUP BY e.dst
    ), pr2 AS (
        SELECT e.dst AS node,
               0.15 + 0.85 * (CAST(SUM(CAST(floor(p.pr / g.d * 1000000 + 0.5)
                                            AS BIGINT)) AS DOUBLE)
                              / 1000000) AS pr
        FROM edges e
        JOIN deg g USING (src)
        JOIN pr1 p ON p.node = e.src
        GROUP BY e.dst
    )
    SELECT p2.node, g.d AS degree,
           (CASE WHEN (p2.pr) IS NULL OR isnan(p2.pr)
                      OR abs(p2.pr) > 1e12 THEN (p2.pr)
                 ELSE floor((p2.pr) * 10000 + 0.5) / 10000 END) AS pr_2
    FROM pr2 p2 JOIN deg g ON g.src = p2.node
    """,
)
def q_graph_pagerank(spark, sf_dir):
    """Two unrolled PageRank iterations (damping 0.85) over the
    bipartite customer<->supplier trade graph (distinct pairs from
    lineitem x orders, symmetrized) — the canonical iterated
    join-aggregate of graph analytics, with FULL-VALUE oracle parity
    because the iteration count is fixed and the float discipline is
    per-contribution matched-floor quantization — each contribution
    becomes floor(x*1e6 + 0.5) BEFORE the (exact, order-independent)
    sum, then one double cast and a matched round on output. NOTE:
    this is deliberately NOT the dsum DECIMAL(30,6)-cast pattern —
    the oracle encodes the quantize-then-sum arithmetic, so
    "aligning" the code to dsum would break parity (review r6).

    Every rank value flows through identical IEEE ops on both engines:
    1.0/d and pr/d are single double divisions of identical operands,
    the decimal cast quantizes identically, and 0.15 + 0.85*s is the
    same two-op double expression.

    Shape at 100 TB: each iteration is one shuffle of contributions
    keyed by dst plus a hash-aggregate — the same edge partitioning is
    reusable across iterations (co-partition edges and ranks on src),
    degrees are a one-time aggregate, and nothing is quadratic; the
    driver holds no graph state (contrast operators/graph.py connected
    components, which collects only cluster labels). Fixed-point
    iteration to convergence is the same plan in a loop (the
    q_ml_kmeans_iter pattern: constant-size plans + localCheckpoint).
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    e0 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    edges = e0.select(
        F.col("o_custkey").alias("src"),
        (F.lit(1000000) + F.col("l_suppkey")).alias("dst"),
    ).unionAll(
        e0.select(
            (F.lit(1000000) + F.col("l_suppkey")).alias("src"),
            F.col("o_custkey").alias("dst"),
        )
    )
    # Materialize the edge list ONCE: every iteration (and the degree
    # aggregate) re-reads it, and without this the lineitem⋈orders
    # distinct re-executes per reference (~5 scans; measured 8.1 s →
    # 2.5 s at sf0.1). Same discipline as every iterated-graph engine
    # (GraphX caches the edge RDD) and as operators/kmeans.py's
    # localCheckpoint loop: executor-local storage, lineage truncated,
    # constant plan size per iteration.
    edges = edges.localCheckpoint(eager=False)
    # Materialize the degree table too (r12, guide §5 localCheckpoint):
    # deg is referenced FOUR times (both steps' joins, the init ranks,
    # the final rejoin) and each reference re-ran the groupBy over the
    # checkpointed edges — four aggregations for one result. Non-eager:
    # computed inside the timed action, fresh per run. Measured 2.24 →
    # 1.77 s at sf0.1, hash identical (keying the edge checkpoint by
    # src was also tried and does NOT pay: the per-step joins broadcast
    # the small deg/ranks sides, so edge partitioning never matters).
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint(eager=False)
    )

    def step(ranks):
        """ranks: (node, pr) -> next (node, pr); one shuffle on dst."""
        contrib = (
            edges.join(deg, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("pr") / F.col("d")).alias("x"),
            )
        )
        return contrib.groupBy("node").agg(
            (
                F.lit(0.15)
                + F.lit(0.85)
                * (
                    F.sum(
                        F.floor(F.col("x") * 1000000 + F.lit(0.5)).cast(
                            "bigint"
                        )
                    ).cast("double")
                    / F.lit(1000000)
                )
            ).alias("pr")
        )

    init = deg.select(F.col("src").alias("node"), F.lit(1.0).alias("pr"))
    pr2 = step(step(init))
    return pr2.join(deg, pr2.node == deg.src).select(
        "node", F.col("d").alias("degree"), mround("pr").alias("pr_2")
    )


# ---------------------------------------------------------------------------
# q_evt_markov


@register(
    "q_evt_markov",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               -- event_id NULLS LAST: law 40 on the tie-break key
               -- (law 49 made NULL event_id in-domain; a NULL-id row
               -- tying a real id on ts forked Spark NULLS FIRST vs
               -- DuckDB NULLS LAST — r9 fuzz arm, seed 141421)
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts NULLS LAST,
                                              event_id NULLS LAST) AS prev
        FROM events
    ), trans AS (
        SELECT prev, event_type AS next, COUNT(*) AS n
        FROM seq WHERE prev IS NOT NULL
        GROUP BY prev, event_type
    ), tot AS (
        SELECT prev, SUM(n) AS t FROM trans GROUP BY prev
    )
    SELECT trans.prev, next, n,
           CAST((2 * 10000 * n + t) // (2 * t) AS BIGINT) AS p_e4
    FROM trans JOIN tot USING (prev)
    """,
)
def q_evt_markov(spark, sf_dir):
    """First-order Markov transition matrix over per-user event-type
    sequences (ts order, event_id tie-break): the n-gram transition
    statistics behind sequence featurization, bot detection, and
    next-event modeling in a behavioral training pipeline.

    Transition probability emitted as the half-up scaled BIGINT
    p_e4 = round(10^4 * n/t) = (2*10^4*n + t) div (2t) — counts and
    divisions stay in integer space end-to-end (the q_text_quality
    lesson: no float representation survives to be canonicalized).

    Shape at 100 TB: one window (lag) over the user-partitioned,
    time-ordered stream — the partition key is high-cardinality
    user_id, so no single window partition is hot — then two
    hash-aggregates on (prev,next) / prev with map-side combine, and
    a join on prev against the per-prev totals (a |event_type|-sized
    table: broadcast). The same lag-window shape already scales
    q_win_lag and the funnel. NULL ts pinned LAST on both engines
    (NULL-events adversarial sweep, r6)."""
    ev = load_table(spark, sf_dir, "events")
    # event_id NULLS LAST too (law 40 on the tie-break, see oracle)
    w = W.partitionBy("user_id").orderBy(
        F.asc_nulls_last("ts"), F.asc_nulls_last("event_id")
    )
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev"),
    )
    trans = (
        seq.where(F.col("prev").isNotNull())
        .groupBy("prev", F.col("event_type").alias("next"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = trans.groupBy("prev").agg(F.sum("n").alias("t"))
    return (
        trans.join(F.broadcast(tot), "prev")
        .select(
            "prev",
            "next",
            "n",
            F.expr("CAST((2 * 10000 * n + t) DIV (2 * t) AS BIGINT)").alias(
                "p_e4"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q_evt_anomaly


@register(
    "q_evt_anomaly",
    oracle=f"""
    WITH st AS (
        SELECT user_id,
               {sql_dsumr('value')} AS s1,
               {sql_dsumr('value * value', 38)}
                   AS s2,
               COUNT(*) AS n
        FROM events GROUP BY user_id
    ), th AS (
        SELECT user_id, n,
               s1 / n AS mean,
               sqrt(greatest(0.0, s2 / n - (s1 / n) * (s1 / n))) AS std
        FROM st
    )
    SELECT e.event_id, e.user_id,
           CASE WHEN e.value > t.mean + 3 * t.std THEN 'hi'
                ELSE 'lo' END AS side
    FROM events e JOIN th t USING (user_id)
    WHERE t.n >= 20
      AND (e.value > t.mean + 3 * t.std OR e.value < t.mean - 3 * t.std)
    """,
)
def q_evt_anomaly(spark, sf_dir):
    """Per-user 3-sigma anomaly detection over event values — the
    standard data-quality / fraud pre-filter of a behavioral pipeline.
    Users with fewer than 20 events are skipped (a 3-sigma rule over a
    handful of points is noise).

    Determinism without emitting any float: the OUTPUT is integer ids
    plus a 'hi'/'lo' side tag; the float threshold only decides the
    FILTER, and it is built so both engines compute bit-identical
    doubles — per-value DECIMAL(30,6) casts, exact decimal sums
    (order-independent), then the identical IEEE op sequence
    mean = s1/n, var = s2/n - mean*mean clamped at 0 (1-ulp negatives
    under constant-valued users), std = sqrt (correctly rounded by
    IEEE 754 on both engines). Identical doubles compare identically,
    so the boundary rows agree.

    Shape at 100 TB: one hash-aggregate on user_id (map-side combine)
    + one equi-join back on the same key — the aggregate output is
    already partitioned the way the join needs it, so AQE plans a
    single effective shuffle of the fact side. Nothing quadratic, no
    window over a hot key, no driver state."""
    ev = load_table(spark, sf_dir, "events")
    st = ev.groupBy("user_id").agg(
        dsumr("value").alias("s1"),
        dsumr(F.col("value") * F.col("value"), 38).alias("s2"),
        F.count(F.lit(1)).alias("n"),
    )
    mean = F.col("s1") / F.col("n")
    var = F.greatest(
        F.lit(0.0), F.col("s2") / F.col("n") - mean * mean
    )
    th = st.select(
        "user_id",
        "n",
        mean.alias("mean"),
        F.sqrt(var).alias("std"),
    )
    j = ev.join(th, "user_id")
    hi = F.col("value") > F.col("mean") + F.lit(3.0) * F.col("std")
    lo = F.col("value") < F.col("mean") - F.lit(3.0) * F.col("std")
    return (
        j.where((F.col("n") >= 20) & (hi | lo))
        .select(
            "event_id",
            "user_id",
            F.when(hi, F.lit("hi")).otherwise(F.lit("lo")).alias("side"),
        )
    )


# ---------------------------------------------------------------------------
# q_tpch_q3 / q_tpch_q5 — the classic multi-join OLAP shapes


@register(
    "q_tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
           CAST(o_orderdate AS DATE) AS odate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-30'
      AND l_shipdate > TIMESTAMP '1997-06-30'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey NULLS LAST
    LIMIT 10
    """,
)
def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3 (shipping priority) adapted to this schema: top-10
    unshipped BUILDING-segment orders by revenue as of a cutoff date —
    the canonical selective fact⋈fact⋈dim join + aggregate + top-k.

    Plan shape the 100 TB deploy wants, and gets: both date predicates
    push down to the parquet scans (orders and lineitem each
    pre-filtered before the join), customer (dim, further thinned by
    the segment filter) broadcasts, the orders⋈lineitem fact join
    shuffles on the shared orderkey, revenue aggregates through the
    exact-decimal dsum, and the top-10 is TakeOrderedAndProject on the
    (bit-identical, tie-broken by l_orderkey) rounded revenue — never
    a global sort.
    """
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < "1997-06-30"
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > "1997-06-30"
    )
    j = (
        F.broadcast(c)
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    agg = j.groupBy(
        "l_orderkey",
        F.col("o_orderdate").cast("date").alias("odate"),
        "o_orderpriority",
    ).agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    return agg.select(
        "l_orderkey", "revenue", "odate", "o_orderpriority"
    ).orderBy(  # nulls-last tie-break: law 40 / law 38's limit fork
        F.desc("revenue"), F.asc_nulls_last("l_orderkey")
    ).limit(10)


@register(
    "q_tpch_q5",
    oracle=f"""
    SELECT n_name,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
                 AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5 (local supplier volume) adapted to this schema: the
    six-table join chain (customer⋈orders⋈lineitem⋈supplier⋈nation⋈
    region) with the local-supplier constraint c_nationkey =
    s_nationkey, grouped per nation — the widest join tree in the
    registry and the classic test of join ORDERING.

    At 100 TB: region/nation/supplier are dims (broadcast — supplier
    explicitly, the two tiny ones Catalyst broadcasts on its own);
    the o_orderdate year predicate pushes to the orders scan so the
    fact⋈fact shuffle carries one year, not seven; the only
    shuffle-partitioned joins are orders⋈customer (custkey) and
    lineitem⋈orders (orderkey) — exactly the two whose inputs are
    big. Revenue goes through the exact-decimal dsum.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    j = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return j.groupBy("n_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )


# ---------------------------------------------------------------------------
# q_evt_basket


@register(
    "q_evt_basket",
    oracle="""
    WITH ut AS (
        SELECT DISTINCT user_id, event_type FROM events
    ), pairs AS (
        SELECT a.event_type AS t1, b.event_type AS t2,
               COUNT(*) AS n_ab
        FROM ut a JOIN ut b ON a.user_id = b.user_id
                           AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    ), singles AS (
        SELECT event_type, COUNT(*) AS n FROM ut GROUP BY event_type
    ), tot AS (
        SELECT COUNT(DISTINCT user_id) AS u FROM ut
    )
    SELECT t1, t2, n_ab, s1.n AS n_1, s2.n AS n_2,
           CAST((2 * 10000 * n_ab * u + s1.n * s2.n)
                // (2 * s1.n * s2.n) AS BIGINT) AS lift_e4
    FROM pairs
    JOIN singles s1 ON s1.event_type = t1
    JOIN singles s2 ON s2.event_type = t2
    CROSS JOIN tot
    """,
)
def q_evt_basket(spark, sf_dir):
    """Market-basket co-occurrence lift between event types:
    lift(a,b) = P(a,b) / (P(a)·P(b)) over per-user presence sets —
    the association-rule statistic behind recommendation and
    feature-crossing pipelines. Emitted as the half-up scaled BIGINT
    lift_e4 = (2·10⁴·n_ab·U + n_a·n_b) div (2·n_a·n_b): counts and
    division stay integer end-to-end (the q_text_quality lesson).

    Shape at 100 TB: the per-user presence set is one distinct on
    (user, type); the pair generation self-joins ON user_id — each
    user contributes at most |types|² pairs and |types| is a small
    enum, so the join output is ≤ U·|types|²/2 rows, aggregated with
    map-side combine down to |types|²/2. The singles/total tables are
    |types|- and 1-row — broadcast. Nothing depends on event volume
    beyond the first distinct.

    Integer envelope (cf. q_neg_sample's documented bound): the
    numerator 2·10⁴·n_ab·U stays inside BIGINT while n_ab·U <
    4.6·10¹⁴ — worst case (n_ab = U) that means U ≤ ~2·10⁷ distinct
    users. Beyond that, pre-scale the counts (e.g. thousands) or move
    the ratio into DECIMAL(38,0); under ANSI mode the overflow raises
    rather than silently wrapping, so the bound is enforced, not
    assumed."""
    ev = load_table(spark, sf_dir, "events")
    # Materialize the presence set ONCE: four downstream references
    # (a, b, singles, tot) would each replay the events scan + the
    # distinct shuffle — the same per-reference recomputation
    # q_graph_pagerank's edge list fixes with localCheckpoint
    # (review r6).
    # eager=False (r13, guide §5): materialized inside the first
    # consuming action instead of a separate driver job; the other
    # three references read the cached partitions exactly as before.
    ut = ev.select("user_id", "event_type").distinct().localCheckpoint(
        eager=False
    )
    a = ut.select("user_id", F.col("event_type").alias("t1"))
    b = ut.select("user_id", F.col("event_type").alias("t2"))
    pairs = (
        a.join(b, ["user_id"])
        .where(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    singles = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    tot = ut.agg(F.countDistinct("user_id").alias("u"))
    return (
        pairs.join(
            F.broadcast(singles.select(F.col("event_type").alias("t1"),
                                       F.col("n").alias("n_1"))), "t1"
        )
        .join(
            F.broadcast(singles.select(F.col("event_type").alias("t2"),
                                       F.col("n").alias("n_2"))), "t2"
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "t1", "t2", "n_ab", "n_1", "n_2",
            F.expr(
                "CAST((2 * 10000 * n_ab * u + n_1 * n_2)"
                " DIV (2 * n_1 * n_2) AS BIGINT)"
            ).alias("lift_e4"),
        )
    )


# ---------------------------------------------------------------------------
# q_profile_table


@register(
    "q_profile_table",
    oracle="""
    SELECT 'o_orderkey' AS col, COUNT(*) AS n,
           COUNT(*) - COUNT(o_orderkey) AS n_null,
           COUNT(DISTINCT o_orderkey) AS n_distinct,
           MIN(o_orderkey) AS min_i, MAX(o_orderkey) AS max_i
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
           COUNT(DISTINCT o_custkey), MIN(o_custkey), MAX(o_custkey)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus), NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice), NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority), NULL, NULL
    FROM orders
    """,
)
def q_profile_table(spark, sf_dir):
    """Column profiling of the orders table (the deequ/dbt-test class
    of operator): per-column row count, null count, distinct count,
    and — for integer key columns — min/max. The first thing a
    pipeline runs on a new 100 TB drop to catch schema rot, null
    storms, and key-range anomalies before training ever starts.

    Emitted long-format (one row per column). min/max are reported
    only for BIGINT columns: min/max of a double would have to be
    stringified to share a column with other types, and double→string
    formatting is engine-specific (Spark '1.0E4' vs DuckDB '10000.0')
    — the one cross-engine surface this profile deliberately refuses
    to emit. Distinct counts are exact here; at 100 TB swap in
    approx_count_distinct per column (the q_agg_approx_cd pattern) to
    keep the profile one cheap pass.

    Shape: ONE scan; Spark compiles the multi-distinct aggregate via
    Expand (one shuffle, counted in tests/test_plans.py for
    q_agg_multi_distinct); the long format is a literal 5-way stack
    of the single aggregate row — no per-column rescans (contrast the
    oracle, which DuckDB is free to write as 5 scans of a tiny
    table)."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            x
            for c in [
                "o_orderkey",
                "o_custkey",
                "o_orderstatus",
                "o_totalprice",
                "o_orderpriority",
            ]
            for x in (
                F.count(F.col(c)).alias(f"cnt_{c}"),
                F.countDistinct(F.col(c)).alias(f"nd_{c}"),
            )
        ],
        F.min("o_orderkey").alias("min_o_orderkey"),
        F.max("o_orderkey").alias("max_o_orderkey"),
        F.min("o_custkey").alias("min_o_custkey"),
        F.max("o_custkey").alias("max_o_custkey"),
    )
    return agg.select(
        F.expr(
            """stack(5,
            'o_orderkey', n, n - cnt_o_orderkey, nd_o_orderkey,
                min_o_orderkey, max_o_orderkey,
            'o_custkey', n, n - cnt_o_custkey, nd_o_custkey,
                min_o_custkey, max_o_custkey,
            'o_orderstatus', n, n - cnt_o_orderstatus, nd_o_orderstatus,
                CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
            'o_totalprice', n, n - cnt_o_totalprice, nd_o_totalprice,
                CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
            'o_orderpriority', n, n - cnt_o_orderpriority,
                nd_o_orderpriority,
                CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
            ) AS (col, n, n_null, n_distinct, min_i, max_i)"""
        )
    )


# ---------------------------------------------------------------------------
# q_feat_snapshot


@register(
    "q_feat_snapshot",
    oracle=f"""
    WITH o AS (
        SELECT o_custkey,
               COUNT(*) AS n_orders,
               {sql_dsumr('o_totalprice')}
                   AS spend_raw,
               MAX(CAST(o_orderdate AS DATE)) AS last_d
        FROM orders
        WHERE o_orderdate < TIMESTAMP '1999-01-01'
        GROUP BY o_custkey
    )
    SELECT c_custkey, c_mktsegment AS segment,
           COALESCE(n_orders, 0) AS n_orders,
           {sql_mround('spend_raw')} AS spend,
           date_diff('day', last_d, DATE '1999-01-01') AS recency_days
    FROM customer LEFT JOIN o ON c_custkey = o_custkey
    """,
)
def q_feat_snapshot(spark, sf_dir):
    """Training-feature snapshot: per customer, the feature vector AS
    OF a cutoff date (order count, exact-decimal spend, recency in
    days, segment) — the point-in-time feature-assembly step of every
    feature store, with the leakage rule enforced structurally: the
    cutoff predicate is applied at the SCAN, so no post-cutoff fact
    can reach any aggregate.

    Customers with no pre-cutoff orders stay in the snapshot (LEFT
    join; n_orders coalesced to 0, spend/recency NULL — NULL, not 0:
    'never ordered' and 'ordered for free today' are different
    training signals).

    Shape at 100 TB: pushed date filter → one custkey hash-aggregate
    (map-side combine) → equi-join with the dimension on the same
    key. The fact shuffle carries one row per (partition × customer).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < "1999-01-01"
    )
    feats = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsumr("o_totalprice").alias("spend_raw"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
    )
    return (
        c.join(feats, c.c_custkey == feats.o_custkey, "left")
        .select(
            "c_custkey",
            F.col("c_mktsegment").alias("segment"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            mround("spend_raw").alias("spend"),
            F.datediff(F.lit("1999-01-01").cast("date"), "last_d").alias(
                "recency_days"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q_neg_sample


@register(
    "q_neg_sample",
    oracle="""
    WITH np AS (
        SELECT COUNT(*) AS n_parts FROM part
    ), cand AS (
        SELECT c_custkey AS custkey, i.range AS i,
               ((c_custkey % 100003) * 2654435761 + i.range * 40503)
                   % n_parts AS item
        FROM customer CROSS JOIN range(8) i CROSS JOIN np
    ), dedup AS (
        SELECT custkey, item, MIN(i) AS i_min
        FROM cand GROUP BY custkey, item
    ), pos AS (
        SELECT DISTINCT o_custkey AS custkey, l_partkey AS item
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), neg AS (
        SELECT d.custkey, d.item, d.i_min
        FROM dedup d ANTI JOIN pos p
          ON d.custkey = p.custkey AND d.item = p.item
    )
    SELECT custkey, item,
           CAST(ROW_NUMBER() OVER (PARTITION BY custkey
                                   ORDER BY i_min NULLS LAST, item NULLS LAST) AS INT) AS rank
    FROM neg
    QUALIFY rank <= 4
    """,
)
def q_neg_sample(spark, sf_dir):
    """Deterministic negative sampling for recommendation training:
    for each customer, up to 4 parts they have NEVER bought, drawn by
    a fixed integer mixing function rather than a RNG — the standard
    contrastive-pairs generator, made reproducible (same seed
    constants → same negatives on every engine and every run, which
    is what makes the train set auditable).

    Candidates: item = ((custkey % 100003)·2654435761 + i·40503) mod
    |parts| for i in 0..7 — pure positive-integer arithmetic, no
    overflow (< 2^48), identical % semantics on both engines, no
    float or RNG surface. Collisions dedup to MIN(i); the positives
    anti-join removes real purchases; per-customer rank keeps the
    first 4 by (i_min, item).

    Shape at 100 TB: candidate generation is a constant 8× explode of
    the customer dim; positives are one distinct over the fact join;
    the anti-join hashes on (custkey, item) — uniform by construction
    because the mixing function spreads items. The per-customer
    window partitions on the high-cardinality custkey."""
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    np_ = p.agg(F.count(F.lit(1)).alias("n_parts"))
    # Keyed fan-out (r12, guide §2.4): every downstream clustering on
    # this side — the (custkey, item) collision dedup, the anti-join,
    # and the final per-customer rank window — contains custkey, and
    # hashpartitioning on a SUBSET of a required clustering satisfies
    # it, so one exchange here replaces three (dedup + both of the
    # anti-join/window's ENSURE_REQUIREMENTS) and parallelizes the 8x
    # explode off the single-file customer scan. custkey cardinality
    # (15k at sf0.1) >> 32 partitions, so no single-task hazard.
    cand = (
        fan_out(c.select(F.col("c_custkey").alias("custkey")), by="custkey")
        .select("custkey", F.explode(F.sequence(F.lit(0), F.lit(7))).alias("i"))
        .crossJoin(F.broadcast(np_))
        .select(
            "custkey",
            "i",
            F.expr(
                "((custkey % 100003) * 2654435761 + i * 40503) % n_parts"
            ).alias("item"),
        )
    )
    dedup = cand.groupBy("custkey", "item").agg(F.min("i").alias("i_min"))
    # Same keyed fan-out on the positives side: the distinct and the
    # anti-join's right-side requirement are both custkey-contained,
    # so this replaces the (custkey, item) distinct exchange and
    # co-partitions the join input in one shuffle.
    pos = (
        fan_out(
            o.join(li, o.o_orderkey == li.l_orderkey).select(
                F.col("o_custkey").alias("custkey"),
                F.col("l_partkey").alias("item"),
            ),
            by="custkey",
        )
        .distinct()
    )
    neg = dedup.join(pos, ["custkey", "item"], "left_anti")
    # both keys nulls-last (law 40, r8 fuzz sweep of bare ASC keys)
    w = W.partitionBy("custkey").orderBy(
        F.asc_nulls_last("i_min"), F.asc_nulls_last("item")
    )
    return (
        neg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 4)
        .select("custkey", "item", F.col("rank").cast("int").alias("rank"))
    )


@register(
    "q_tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey NULLS LAST
    LIMIT 20
    """,
)
def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10 (returned-item reporting) adapted: the top-20
    customers by revenue lost to returns in a half-year window —
    the classic churn-analysis join tree (fact⋈fact with BOTH
    selective predicates + two dim joins + grouped top-k).

    Plan: the o_orderdate window pushes to the orders scan and
    l_returnflag = 'R' to the lineitem scan (each fact pre-thinned
    before the orderkey shuffle join); nation broadcasts, customer
    joins on the shuffled custkey; revenue through exact-decimal
    dsum; top-20 is TakeOrderedAndProject tie-broken by c_custkey."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    j = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
    )
    return (
        j.groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(  # nulls-last tie-break: law 40 / law 38's limit fork
            F.desc("revenue"), F.asc_nulls_last("c_custkey")
        )
        .limit(20)
    )


@register(
    "q_tpch_q18",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING {sql_dsumr('l_quantity')} > 180
    )
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_orderdate AS DATE) AS odate,
           {sql_dsum("l_quantity", "total_qty")}
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate
    """,
)
def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 (large-volume customers) adapted: every order whose
    total quantity exceeds 180, with its customer and exact total —
    the canonical HAVING-subquery + semi-join-back shape.

    The HAVING threshold compares a DECIMAL sum on BOTH engines — a
    raw double sum is order-dependent in its last ulp, and a qty
    total landing exactly on the 180 boundary under one summation
    order but not the other would flip a row in or out (the
    regenerated-data hazard class from q_text_quality's history).

    Plan: the `big` aggregate runs once (orderkey-keyed partial+final
    HashAggregate), then rejoins the fact as a SEMI join on orderkey
    — at 100 TB the semi side is the tiny qualifying tail, so AQE
    turns it into a broadcast semi join and the fact is scanned
    exactly twice (once to find big orders, once to report them);
    quantities sum through the exact-decimal dsum on both passes.

    Hot-orderkey skew (SCALE.md r10, measured at the x100 rung): this
    CHAINED shape — the o⋈li SMJ consuming the semi join's output on
    the same key — is structurally outside OptimizeSkewedJoin's
    pattern (both join inputs must be fresh shuffle stages), so a
    planted 30%-hot orderkey cannot be split while the semi stays SMJ.
    The broadcast semi (AQE's own plan at real scale) restores
    splittability: skew=true fires and the per-join-output-row ratio
    caps at x1.31. The residual is small either way because the
    groupBy's map-side combine collapses the hot order's joined rows
    before the final shuffle. Regression gate:
    tools/skew_probe.py --q18 (q18_skew_curve)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsumr("l_quantity").alias("q"))
        .where(F.col("q") > 180)
        .select("l_orderkey")
    )
    j = (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "semi")
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
    )
    return j.groupBy(
        "c_custkey",
        "c_name",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("odate"),
    ).agg(dsum(F.col("l_quantity"), "total_qty"))
