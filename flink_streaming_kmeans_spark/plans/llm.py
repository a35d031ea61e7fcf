"""§2.10 LLM-data-pipeline operators (north-star extension).

Dedup, similarity search, multimodal join, and text analysis over the
documents/embeddings tables — the operations a large-scale
training-data pipeline needs (BASELINE.json north star; no reference
analog — the Flink demo has none of these).

Scale notes (100 TB):
- q_dedup_exact: hash-groupBy on md5 — one shuffle keyed by digest,
  uniform by construction. The canonical exact-dedup shape.
- q_dedup_near: shingle-set self-equi-join (group-count/union-count
  Jaccard), NOT an all-pairs cross join. Cost is Σ|bucket|² over
  shingle buckets; at 100 TB hot shingles make this quadratic, so the
  scale path is MinHash+LSH banding (band-hash equi-join — implemented
  in operators/minhash.py, recall-tested in tests/), with this exact
  formulation as its verification oracle at small SF.
- q_sim_knn: k probe vectors broadcast against the corpus — one narrow
  scan, per-partition top-k via window. The brute-force baseline; the
  scale path is LSH/IVF bucketing (same re-rank tail).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.hashing import DUCK_ASCII_FOLD, DUCK_TRIM, spark_ascii_fold
from ..functions.vector import davg, dot64, emb_finite, isum64, l2_norm, mround, sql_davg, sql_emb_finite, sql_mround
from ..sources.loader import fan_out, load_table
from .registry import register


_FP = DUCK_ASCII_FOLD.format(x=DUCK_TRIM.format(x="text"))


@register(
    "q_dedup_exact",
    oracle=f"""
    SELECT md5({_FP}) AS fp, MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5({_FP})
    """,
)
def q_dedup_exact(spark, sf_dir):
    """Exact dedup on normalized text: one row per content fingerprint,
    keep the smallest doc_id (testdata has zero exact dups, so output
    cardinality == input — still a valid oracle).

    Normalization is ASCII case-fold + space-only trim (functions/
    hashing), NOT native lower()/trim(): unicode case mapping is an
    engine-locale operation (Spark lower('İ') keeps a combining dot
    that utf8proc drops) and DuckDB's bare trim strips U+00A0 —
    either one silently forks the fingerprint, and therefore the
    dedup groups, on the first non-ASCII document (r6 unicode probe,
    tests/test_degenerate_tpch.py). ASCII folding is the portable,
    deterministic contract for a content hash."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.md5(spark_ascii_fold(F.trim("text"))).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )




# Shared near-dup pair derivation — the SQL CTE chain ends in
# ``near(doc_id1, doc_id2, jac)`` (jac unrounded); used by both
# q_dedup_near (the pair list) and q_dedup_cluster (the closure).
_SHINGLES_CTE = """
    toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, len(w) - 2),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]
               )) AS shingles
        FROM toks WHERE len(w) >= 3
    ), exr AS (
        -- DISTINCT per DOC, not per row: a document is identified by
        -- doc_id, and under duplicate doc_id rows its shingle set is
        -- the distinct UNION over its rows — the Spark side's
        -- dropDuplicates([doc_id, s]) semantics (r6 doctored-documents
        -- sweep: per-row unnest fanned doc 1's shingles and forked
        -- q_text_decontaminate's hit counts).
        SELECT DISTINCT doc_id, unnest(shingles) AS s FROM sh
    ), ex AS (
        SELECT doc_id, s,
               COUNT(*) OVER (PARTITION BY doc_id) AS ns
        FROM exr
    )
"""

_NEAR_PAIRS_CTE = f"""
    {_SHINGLES_CTE}, pairs AS (
        SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2,
               COUNT(*) AS common,
               ANY_VALUE(a.ns) AS na, ANY_VALUE(b.ns) AS nb
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ), near AS (
        SELECT doc_id1, doc_id2,
               CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE) AS jac
        FROM pairs
        WHERE CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE) >= 0.8
    )
"""


def _shingle_sets(spark, sf_dir):
    """Distinct 3-gram shingle set per document: (doc_id, s, ns) where
    ns is the doc's shingle-set size. Delegates the shingle definition
    to operators/minhash.py:shingle_rows — ONE construction shared by
    the exact join, the clustering closure, the hash-checked LSH
    query, and the MinHashLSH recall path."""
    from ..operators.minhash import shingle_rows

    # Keyed fan-out (r12 optimization, guide §2.4): every consumer of
    # the shingle rows is doc_id-keyed — the per-doc DISTINCT inside
    # shingle_rows (keys ⊇ doc_id) and the ns window (doc_id) — so one
    # hashpartitioning(doc_id) up front satisfies both and the chain
    # runs with ONE exchange where the round-robin fan_out left three
    # (measured 1.2 s → 0.33 s at sf0.1 for this subtree; rows and
    # hashes identical).
    d = fan_out(load_table(spark, sf_dir, "documents"), by="doc_id")
    return shingle_rows(d).withColumn(
        "ns", F.count(F.lit(1)).over(W.partitionBy("doc_id"))
    )


def _near_pairs(spark, sf_dir):
    """Near-dup candidate pairs (doc_id1 < doc_id2, Jaccard >= 0.8 on
    distinct 3-gram shingle sets), with the unrounded jaccard in
    ``jac``. The shingle-equi-join formulation — see q_dedup_near."""
    ex = _shingle_sets(spark, sf_dir)
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_id1"), F.col("b.doc_id").alias("doc_id2")
        )
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.first("a.ns").alias("na"),
            F.first("b.ns").alias("nb"),
        )
    )
    jac = F.col("common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("common")
    ).cast("double")
    return pairs.where(jac >= 0.8).select("doc_id1", "doc_id2", jac.alias("jac"))


@register(
    "q_dedup_near",
    oracle=f"""
    WITH {_NEAR_PAIRS_CTE}
    SELECT doc_id1, doc_id2, {sql_mround('jac')} AS jaccard
    FROM near
    """,
)
def q_dedup_near(spark, sf_dir):
    """Near-duplicate pairs: 3-gram shingle sets, Jaccard >= 0.8.

    Shingle-join formulation: explode distinct shingles, self-equi-join
    on the shingle, count common / union — never materializes all doc
    pairs. Shingles are built with posexplode + element_at (whole-stage
    codegen) rather than transform(sequence(...), lambda): higher-order
    functions are evaluated INTERPRETED in Spark, and the lambda chain
    recomputed on both join sides measured 24x slower at sf0.1
    (197s → 8s)."""
    return _near_pairs(spark, sf_dir).select(
        "doc_id1", "doc_id2", mround("jac").alias("jaccard")
    )


@register(
    "q_dedup_cluster",
    oracle=f"""
    WITH RECURSIVE {_NEAR_PAIRS_CTE},
    edges AS (
        SELECT doc_id1 AS src, doc_id2 AS dst FROM near
        UNION ALL
        SELECT doc_id2, doc_id1 FROM near
    ),
    walk(doc_id, node) AS (
        -- doc_id IS NOT NULL: a NULL id identifies no entity (law 25;
        -- r7 NULL-entity-id probe) — the label-propagation closure is
        -- JOIN-keyed on the id, where a NULL can never participate, so
        -- both engines exclude it from the cluster listing outright
        SELECT doc_id, doc_id FROM documents WHERE doc_id IS NOT NULL
        UNION
        SELECT w.doc_id, e.dst FROM walk w JOIN edges e ON e.src = w.node
    )
    SELECT doc_id, MIN(node) AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_members
    FROM walk GROUP BY doc_id
    """,
)
def q_dedup_cluster(spark, sf_dir):
    """Dedup clustering: connected components over the near-dup pair
    graph — the pairs→canonical-doc step every dedup pipeline needs
    after candidate generation. cluster_id = min doc_id in the
    component; docs with no near-dup are singletons.

    Spark side: driver-loop min-label propagation (the lloyd_iterate
    pattern — constant-size plans, localCheckpoint per round, rounds =
    graph diameter). Near-dup components are short chains in practice,
    so this converges in 2-3 rounds; at 100 TB you swap in the
    large-star/small-star contraction (Kiveris et al.) which keeps the
    same join-per-round shape but contracts diameter quadratically.
    Oracle: DuckDB recursive-CTE reachability closure."""
    from ..operators.graph import connected_components

    pairs = _near_pairs(spark, sf_dir).select("doc_id1", "doc_id2")
    edges = pairs.select(
        F.col("doc_id1").alias("src"), F.col("doc_id2").alias("dst")
    )
    # isNotNull: a NULL doc_id identifies no entity (law 25) — the
    # closure's label joins would silently drop it anyway, so the
    # exclusion is stated here and mirrored in the oracle's walk base
    # (r7 NULL-entity-id probe: the oracle's FROM documents kept a
    # NULL singleton row the Spark joins never emitted).
    nodes = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id").isNotNull())
        .select(F.col("doc_id").alias("id"))
    )
    labels = connected_components(nodes, edges)
    # No broadcast hint on sizes: its cardinality is one row per
    # COMPONENT — O(n_docs) when most docs are singletons (the common
    # case the docstring states), which would be an unbounded driver
    # collect + executor ship at scale (review r6). Both sides of the
    # join share the label partitioning; AQE picks the strategy.
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("n_members"))
    return labels.join(sizes, "label").select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"), "n_members"
    )


# MinHash-LSH geometry: 12 hashes = 4 bands × 3 rows. Everything is
# exact BIGINT arithmetic (hash family g_i(s) = (a_i·h + b_i) mod p
# with h = 60-bit md5 hash reduced mod p, a_i/b_i from an integer LCG)
# so Spark and DuckDB derive IDENTICAL signatures, bands, and
# candidate sets — which is what lets the scale path be hash-checked.
_LSH_P = 1_000_000_007
_LSH_NH, _LSH_ROWS = 12, 3
# Positional band-combine weight for row r of a band: 31^(ROWS-1-r).
# DERIVED from _LSH_ROWS (review r6: the weights were hardcoded
# {961,31,1} with period literally 3 — changing _LSH_ROWS would have
# silently collapsed unordered row pairs into equal band hashes, in
# BOTH engines, so parity could never catch it). One rendered SQL
# string shared by the oracle and the Spark expr.
_LSH_ROW_WEIGHT = (
    "CASE "
    + " ".join(
        f"WHEN i % {_LSH_ROWS} = {r} THEN {31 ** (_LSH_ROWS - 1 - r)}"
        for r in range(_LSH_ROWS - 1)
    )
    + " ELSE 1 END"
)


@register(
    "q_dedup_lsh",
    oracle=f"""
    WITH {_SHINGLES_CTE}, exh AS (
        SELECT doc_id, s, ns,
               (('0x' || substr(md5(s), 1, 15))::BIGINT) % {_LSH_P} AS h
        FROM ex
    ), sig AS (
        SELECT doc_id, t.range AS i,
               MIN((((1103515245 * t.range + 12345) % {_LSH_P}) * h
                    + ((1103515245 * (t.range + 100) + 12345) % {_LSH_P}))
                   % {_LSH_P}) AS m
        FROM exh CROSS JOIN range({_LSH_NH}) t
        GROUP BY doc_id, t.range
    ), bands AS (
        SELECT doc_id, CAST(i // {_LSH_ROWS} AS INT) AS band,
               CAST(SUM(m * ({_LSH_ROW_WEIGHT})) AS BIGINT) AS bh
        FROM sig GROUP BY doc_id, i // {_LSH_ROWS}
    ), cands AS (
        SELECT DISTINCT a.doc_id AS doc_id1, b.doc_id AS doc_id2
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.bh = b.bh
                    AND a.doc_id < b.doc_id
    ), verified AS (
        SELECT c.doc_id1, c.doc_id2, COUNT(*) AS common,
               ANY_VALUE(x.ns) AS na, ANY_VALUE(y.ns) AS nb
        FROM cands c
        JOIN exh x ON x.doc_id = c.doc_id1
        JOIN exh y ON y.doc_id = c.doc_id2 AND y.s = x.s
        GROUP BY c.doc_id1, c.doc_id2
    )
    SELECT doc_id1, doc_id2,
           {sql_mround('CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE)')} AS jaccard
    FROM verified
    WHERE CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE) >= 0.8
    """,
)
def q_dedup_lsh(spark, sf_dir):
    """Near-dup via MinHash + LSH banding — the 100 TB dedup path,
    hash-checked end to end (the oracle replicates the integer-exact
    signature/band math, so candidate sets match bit-for-bit):

    1. 12 minhashes per doc over its shingle set (universal-hash
       family mod p on the 60-bit shingle hash);
    2. 4 bands × 3 rows; band key = positional combine of the band's
       minhashes; candidates MEET IN BAND BUCKETS via a band-hash
       self-equi-join — cost set by signature geometry, never an
       all-pairs scan (contrast q_dedup_near, whose shingle join is
       Σ|bucket|² on hot shingles);
    3. exact Jaccard re-verification computed ONLY for candidate
       pairs (the shingle join is pre-filtered by the candidate set).

    Output = true near-dups among LSH candidates; recall vs the exact
    pair set is tested in tests/test_minhash_lsh.py (≥0.9)."""
    ex = _shingle_sets(spark, sf_dir)
    # Materialize the hashed shingle frame ONCE per run (r12, guide
    # §3.3 "materialising an intermediate truncates the plan" + §5
    # localCheckpoint): this frame feeds THREE differently-keyed
    # consumers — the signature build (doc_id), and the x/y sides of
    # the candidate re-verify join (doc_id1 / doc_id2+s) — whose
    # exchanges all differ, so ReuseExchange cannot fire and the
    # explode+distinct+window subtree ran three times per query
    # (contrast _near_pairs, whose self-join IS exchange-identical on
    # both sides and gets reused for free — measured 0.9 s → 1.9 s
    # when checkpointed, so it deliberately is NOT). Non-eager: the
    # materialization runs inside the timed action, fresh per
    # invocation — a within-run intermediate like q_graph_pagerank's
    # edge list, never a cross-run cache. Measured min 1.8 → 1.4 s at
    # sf0.1 with the 6-13 s codegen-recompile spikes collapsing to <2x.
    exh = ex.withColumn(
        "h",
        F.expr(f"CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT) % {_LSH_P}"),
    ).localCheckpoint(eager=False)
    # The checkpoint surfaces as an ExistingRDD with UnknownPartitioning
    # — the keyed fan_out's hashpartitioning(doc_id) is invisible past
    # it, so every consumer re-shuffled the full shingle frame. One
    # explicit doc_id repartition over the checkpointed RDD is an
    # IDENTICAL exchange subtree for all three consumers (ReuseExchange
    # fires: computed once), and with subset co-partitioning accepted
    # (session.py r12) the signature groupBys and the x-side verify
    # join all ride it exchange-free. Locally warm-neutral (min 2.16 →
    # 2.11 s core A/B) with first-run spikes halved; at scale it is
    # one shuffle of the heavy frame instead of three (guide §2.3/2.4).
    exh = fan_out(exh, by="doc_id")
    hashes = F.broadcast(
        spark.range(_LSH_NH).select(F.col("id").alias("i"))
    )
    sig = (
        exh.crossJoin(hashes)
        .select(
            "doc_id",
            "i",
            F.expr(
                f"(((1103515245 * i + 12345) % {_LSH_P}) * h"
                f" + ((1103515245 * (i + 100) + 12345) % {_LSH_P})) % {_LSH_P}"
            ).alias("g"),
        )
        .groupBy("doc_id", "i")
        .agg(F.min("g").alias("m"))
    )
    bands = sig.groupBy(
        "doc_id", F.expr(f"CAST(i DIV {_LSH_ROWS} AS INT)").alias("band")
    ).agg(
        F.sum(
            F.col("m") * F.expr(_LSH_ROW_WEIGHT)
        ).cast("bigint").alias("bh")
    )
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id1"),
            F.col("b.doc_id").alias("doc_id2"),
        )
        .distinct()
    )
    x, y = exh.alias("x"), exh.alias("y")
    verified = (
        cands.join(x, F.col("x.doc_id") == F.col("doc_id1"))
        .join(
            y,
            (F.col("y.doc_id") == F.col("doc_id2"))
            & (F.col("y.s") == F.col("x.s")),
        )
        .groupBy("doc_id1", "doc_id2")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.first("x.ns").alias("na"),
            F.first("y.ns").alias("nb"),
        )
    )
    jac = F.col("common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("common")
    ).cast("double")
    return verified.where(jac >= 0.8).select(
        "doc_id1", "doc_id2", mround(jac).alias("jaccard")
    )


@register(
    "q_sim_knn",
    oracle=f"""
    WITH embk AS (
        -- vector-op participation gate (doctored-embeddings sweep r6)
        SELECT vec_id, embedding FROM embeddings
        WHERE {sql_emb_finite('embedding')}
    ), q AS (
        SELECT vec_id AS query_id, embedding AS qemb
        FROM embk WHERE vec_id < 10
    ), scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               list_inner_product(e.embedding::DOUBLE[], q.qemb::DOUBLE[]) AS sim
        FROM embk e CROSS JOIN q
        WHERE e.vec_id <> q.query_id
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id) AS rn
        FROM scored
    )
    SELECT query_id, neighbor_id, {sql_mround('sim')} AS sim
    FROM ranked WHERE rn <= 5
    """,
)
def q_sim_knn(spark, sf_dir):
    """Exact top-5 cosine neighbors for the 10 probe vectors
    (brute-force baseline: probes broadcast against one corpus scan)."""
    e = load_table(spark, sf_dir, "embeddings").where(
        emb_finite("embedding")  # vector-op contract (r6 sweeps)
    )
    q = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb")
    )
    scored = (
        fan_out(e).crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            dot64("embedding", "qemb").alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", mround("sim").alias("sim"))
    )


@register(
    "q_multimodal_join",
    oracle=f"""
    WITH j AS (
        SELECT d.lang, d.n_chars,
               sqrt(list_aggregate(
                   list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE),
                   'sum')) AS nrm
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    )
    SELECT lang, COUNT(*) AS n_docs,
           {sql_davg('n_chars', 'avg_chars')},
           {sql_davg('nrm', 'avg_norm')}
    FROM j GROUP BY lang
    """,
)
def q_multimodal_join(spark, sf_dir):
    """Text ⟷ vector multimodal row: join documents to embeddings on
    doc_id=vec_id, aggregate per language."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    j = d.join(e, d.doc_id == e.vec_id).select(
        "lang", "n_chars", l2_norm("embedding").alias("nrm")
    )
    return j.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        davg("n_chars", "avg_chars"),
        davg("nrm", "avg_norm"),
    )


@register(
    "q_text_tokens",
    oracle="""
    SELECT t AS token, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
    GROUP BY t
    ORDER BY n DESC, t
    LIMIT 20
    """,
)
def q_text_tokens(spark, sf_dir):
    """Word frequency: top-20 tokens (total order: count desc, token)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


@register(
    "q_text_stats",
    oracle=f"""
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           {sql_davg("len(string_split(text, ' '))", 'avg_tokens')}
    FROM documents
    GROUP BY lang, source
    """,
)
def q_text_stats(spark, sf_dir):
    """Per (lang, source): doc count, total chars, mean token count."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        # law 48 (see functions.vector.isum64): 128-bit accumulator
        isum64("n_chars", "total_chars"),
        davg(F.size(F.split("text", " ")), "avg_tokens"),
    )


# From the NON-registering operators module — importing it from
# plans.ml would fire ml's @register calls mid-import and shift the
# correctness window in any rotation fronting llm before ml
# (review r6; registry.py rotation invariant).
from ..operators.kmeans import ASSIGN_CTE as _IVF_ASSIGN_CTE


@register(
    "q_sim_ivf",
    oracle=f"""
    {_IVF_ASSIGN_CTE}, asg AS (
        SELECT vec_id, embedding, CAST(cid AS INT) AS cid
        FROM ranked WHERE rn = 1
    ), probes AS (
        SELECT vec_id AS query_id, embedding AS qemb, cid
        FROM asg WHERE vec_id < 10
    ), cands AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               list_inner_product(a.embedding::DOUBLE[], p.qemb::DOUBLE[]) AS sim
        FROM probes p
        JOIN asg a ON a.cid = p.cid AND a.vec_id <> p.query_id
    ), rr AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id) AS rn
        FROM cands
    )
    SELECT query_id, neighbor_id, {sql_mround('sim')} AS sim
    FROM rr WHERE rn <= 3
    """,
)
def q_sim_ivf(spark, sf_dir):
    """IVF-style ANN: the OTHER standard scale path next to LSH
    (q_sim_ann) — a coarse quantizer (here: the engine's own k-means
    assignment step with its deterministic centroid init) partitions
    the corpus into inverted lists; each probe searches only its own
    list, exact top-3 re-rank inside. Candidates meet in an equi-join
    on the cluster id, so cost per probe is the list size, never the
    corpus. Single-probe geometry for oracle determinism; production
    raises nprobe and trains the quantizer with q_ml_kmeans_iter."""
    # vec_id isNotNull & emb_finite: lockstep with ASSIGN_CTE's emb
    # CTE (NULL-embeddings sweep r6; NULL-entity-id probe r7 — the id
    # is the k-means entity key feeding the quantizer's centroids).
    e = load_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id").isNotNull() & emb_finite("embedding")
    )
    from ..operators.kmeans import assign, init_centroids

    # NOT keyed (r12 probe): unlike q_ml_kmeans_assign, asg here feeds
    # a cid-keyed self-join, and the keyed fan-out measured neutral-to
    # -slightly-worse (1.22 vs 1.06 s min at sf0.1) — round-robin kept.
    asg = assign(fan_out(e), init_centroids(e)).select(
        "vec_id", "embedding", F.col("cid").cast("int").alias("cid")
    )
    probes = asg.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qemb"),
        "cid",
    )
    cands = (
        F.broadcast(probes)
        .join(asg, "cid")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            dot64("embedding", "qemb").alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cands.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", mround("sim").alias("sim"))
    )


@register(
    "q_text_decontaminate",
    oracle=f"""
    WITH {_SHINGLES_CTE}, tr AS (
        SELECT doc_id, s, ns FROM ex WHERE doc_id % 10 <> 0
    ), ev AS (
        SELECT doc_id AS eval_id, s FROM ex WHERE doc_id % 10 = 0
    )
    SELECT tr.doc_id,
           COUNT(DISTINCT tr.s) AS n_hit,
           COUNT(DISTINCT ev.eval_id) AS n_eval_docs,
           {sql_mround('CAST(COUNT(DISTINCT tr.s) AS DOUBLE)'
                       ' / ANY_VALUE(tr.ns)')} AS contamination
    FROM tr JOIN ev ON tr.s = ev.s
    GROUP BY tr.doc_id
    """,
)
def q_text_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag training docs sharing 3-gram
    shingles with a held-out eval split (here: doc_id % 10 == 0 plays
    the benchmark suite). Per contaminated train doc: how many of its
    distinct shingles appear in any eval doc, how many eval docs are
    hit, and the contaminated fraction of its shingle set.

    Same canonical shingle construction as q_dedup_near
    (operators/minhash.py:shingle_rows). Scale shape: eval/benchmark
    suites are tiny next to a training corpus, so the eval shingle set
    is broadcast and the whole check is one map-side join over the
    corpus shingles — no shuffle of the big side. If the eval set ever
    outgrows broadcast, drop the hint and it degrades gracefully to
    the same shuffled equi-join as q_dedup_near."""
    ex = _shingle_sets(spark, sf_dir)
    tr = ex.where(F.col("doc_id") % 10 != 0)
    ev = ex.where(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("eval_id"), "s"
    )
    return (
        tr.join(F.broadcast(ev), "s")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("s").alias("n_hit"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
            F.first("ns").alias("ns"),
        )
        .select(
            "doc_id",
            "n_hit",
            "n_eval_docs",
            mround(F.col("n_hit").cast("double") / F.col("ns")).alias(
                "contamination"
            ),
        )
    )


@register(
    "q_emb_normalize",
    oracle=f"""
    WITH q AS (
        SELECT vec_id, embedding,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                             AS BIGINT)) AS qi
        FROM embeddings
        WHERE {sql_emb_finite('embedding')}
    ), n AS (
        SELECT vec_id, embedding,
               sqrt(CAST(list_sum(list_transform(qi, v -> v * v))
                         AS DOUBLE)) / 1000000 AS norm_raw
        FROM q
    )
    SELECT vec_id,
           {sql_mround('norm_raw')} AS norm,
           array_to_string(
               list_transform(embedding,
                   x -> CAST(CAST(floor(CAST(x AS DOUBLE) / norm_raw * 10000
                                        + 0.5) AS BIGINT) AS VARCHAR)),
               ',') AS unit
    FROM n
    WHERE norm_raw > 0
    """,
)
def q_emb_normalize(spark, sf_dir):
    """L2-normalize the embedding column — the prep step before any
    cosine-metric op (ANN, dedup, clustering) so dot == cosine.

    The norm is computed on components QUANTIZED to 1e-6 with the
    matched floor(x*1e6+0.5) primitive, then an exact BIGINT sum of
    squares (64 terms ≤ 6.4e13, no overflow): norm is bit-identical
    across engines BY CONSTRUCTION. Neither a raw double fold (a
    last-ulp gap vs DuckDB's list_inner_product flipped a .xxxx5
    midpoint round at sf0.001) nor DECIMAL(18,6) casts (Spark rounds
    the decimal expansion, DuckDB the scaled double — they disagree
    ~1e-3 of the time on float tails) survives 32,000 rounded
    components; integer quantization does, at a 1e-6 norm error far
    below the 1e-4 output round. Pure map pass, no shuffle; the HOF
    transform is per-row over 64 elements (the interpreted-HOF hazard
    is lambda chains recomputed across join sides, not a single map).

    The unit vector is emitted as a comma-joined string of 1e-4-scaled
    BIGINT components, NOT a raw ARRAY<DOUBLE>: hash harnesses that
    canonicalize by sorting columns (pandas) cannot sort an ndarray
    cell (r3 driver: "unhashable type: numpy.ndarray"), and integer
    formatting is byte-identical across engines where double
    formatting is not."""
    e = load_table(spark, sf_dir, "embeddings").where(
        emb_finite("embedding")  # vector-op contract (NaN/Inf sweep r6)
    )
    qi = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 1000000 + F.lit(0.5)).cast("bigint"),
    )
    sq_sum = F.aggregate(
        F.transform(qi, lambda v: v * v),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    n = e.select(
        "vec_id",
        "embedding",
        (F.sqrt(sq_sum.cast("double")) / 1000000).alias("norm_raw"),
    )
    # A zero vector cannot be normalized — drop it on BOTH engines
    # (review r6: Spark's x/0 yielded NULL components silently joined
    # to unit='' while DuckDB's 0.0/0.0 NaN crashed the oracle's
    # BIGINT cast; unreachable on unit-normalized fixture data).
    n = n.where(F.col("norm_raw") > 0)
    # NB: the rounded output must NOT be aliased to the same name the
    # sibling transform divides by — Spark laterally resolves the
    # fresh alias (dividing by the ROUNDED norm) while DuckDB binds
    # the input column; distinct names make both engines unambiguous.
    return n.select(
        "vec_id",
        mround("norm_raw").alias("norm"),
        F.array_join(
            F.transform(
                "embedding",
                lambda x: F.floor(
                    x.cast("double") / F.col("norm_raw") * 10000 + F.lit(0.5)
                ).cast("string"),
            ),
            ",",
        ).alias("unit"),
    )


@register(
    "q_pipeline_clean",
    oracle=f"""
    WITH {_NEAR_PAIRS_CTE}, drops AS (
        SELECT DISTINCT doc_id2 AS doc_id FROM near
    ), tok AS (
        SELECT doc_id, source, lang, string_split(text, ' ') AS w
        FROM documents
    ), stats AS (
        SELECT doc_id, source, lang, len(w) AS n_tok FROM tok
    ), topf AS (
        SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_frac
        FROM (
            SELECT doc_id, t, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(w) AS t FROM tok)
            GROUP BY doc_id, t
        ) GROUP BY doc_id
    ), keep AS (
        SELECT s.doc_id, s.source, s.n_tok
        FROM stats s JOIN topf f USING (doc_id)
        WHERE s.lang = 'en' AND s.n_tok >= 30 AND f.top_frac <= 0.2
          AND s.doc_id NOT IN (SELECT doc_id FROM drops)
    )
    SELECT source,
           COUNT(*) AS n_kept,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           {sql_davg('n_tok', 'avg_tokens')}
    FROM keep
    GROUP BY source
    """,
)
def q_pipeline_clean(spark, sf_dir):
    """The end-to-end corpus-cleaning pipeline a training-data user
    actually runs, composed from this engine's own stages: language
    filter (en) → length floor (>=30 tokens) → repetition filter
    (top-token share <= 0.2) → near-dup removal (drop the larger
    doc_id of each Jaccard>=0.8 PAIR — deliberately a pairwise rule,
    NOT q_dedup_cluster's min-of-component rule: on a transitive
    component {1,2,3} with edges (1,3),(2,3) the pair rule keeps
    {1,2} where the component rule keeps {1}; the oracle encodes the
    pair rule, so do not "unify" them — review r6) → per-source
    kept-corpus stats.

    Composability is the point: the shingle join, the repetition
    aggregate, and the per-doc stats are the same constructions as
    their standalone queries, fused by Catalyst into one DAG — filters
    are map-side, the near-dup join only feeds an anti-join of doc
    ids, and the final stats shuffle carries one row per source. At
    100 TB each stage stays the shape proven scalable standalone."""
    d = load_table(spark, sf_dir, "documents")
    # The lang filter applies BEFORE the token explode: Catalyst can't
    # push a post-join predicate through the repetition aggregate, so
    # an unfiltered topf would explode+aggregate every non-en doc
    # (~80% of the corpus) only to discard it at the join (review r6).
    # Equivalent because keep inner-joins stats (en-only) to topf.
    # Only the near-dup side (_near_pairs/drops) must stay unfiltered.
    # Keyed fan-out (r12, guide §2.4): the repetition aggregate's two
    # doc_id-clustered groupBys, the stats⋈topf join and the drops
    # anti-join are all doc_id-keyed — one hashpartitioning(doc_id)
    # after the selective lang filter feeds them all exchange-free on
    # this side (also fixes the single-task explode: the one-file scan
    # ran the whole token explode on one core).
    d_en = fan_out(d.where(F.col("lang") == "en"), by="doc_id")
    toks = d_en.select(
        "doc_id", "source", F.split("text", " ").alias("w")
    )
    stats = toks.select("doc_id", "source", F.size("w").alias("n_tok"))
    topf = (
        toks.select("doc_id", F.explode("w").alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg((F.max("c").cast("double") / F.sum("c")).alias("top_frac"))
    )
    drops = _near_pairs(spark, sf_dir).select(
        F.col("doc_id2").alias("doc_id")
    ).distinct()
    keep = (
        stats.join(topf, "doc_id")
        .where((F.col("n_tok") >= 30) & (F.col("top_frac") <= 0.2))
        .join(drops, "doc_id", "left_anti")
    )
    return keep.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        davg("n_tok", "avg_tokens"),
    )


@register(
    "q_dedup_canonical",
    oracle=f"""
    WITH RECURSIVE {_NEAR_PAIRS_CTE},
    edges AS (
        SELECT doc_id1 AS src, doc_id2 AS dst FROM near
        UNION ALL
        SELECT doc_id2, doc_id1 FROM near
    ),
    walk(doc_id, node) AS (
        -- doc_id IS NOT NULL: lockstep with q_dedup_cluster's walk —
        -- a NULL id identifies no entity (law 25); here the later
        -- comp-to-documents equi-join dropped it anyway, but the
        -- contract is stated, not incidental (r7 NULL-entity-id probe)
        SELECT doc_id, doc_id FROM documents WHERE doc_id IS NOT NULL
        UNION
        SELECT w.doc_id, e.dst FROM walk w JOIN edges e ON e.src = w.node
    ),
    comp AS (
        SELECT doc_id, MIN(node) AS cluster_id FROM walk GROUP BY doc_id
    ),
    ranked AS (
        SELECT c.cluster_id, d.doc_id, d.n_chars,
               ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                  ORDER BY d.n_chars DESC, d.doc_id) AS rn
        FROM comp c JOIN documents d ON c.doc_id = d.doc_id
    )
    SELECT cluster_id,
           MAX(CASE WHEN rn = 1 THEN doc_id END) AS kept_doc,
           CAST(MAX(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT)
               AS kept_chars,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
    FROM ranked GROUP BY cluster_id
    """,
)
def q_dedup_canonical(spark, sf_dir):
    """Canonical-document selection — the DECISION step after dedup
    clustering that every corpus pipeline actually ships: within each
    near-dup component keep exactly one representative (longest doc,
    doc_id tie-break — the common keep-richest heuristic) and count
    what gets dropped. Composition of the registered pieces: shingle
    near-dup graph → connected components (auto-switching label
    propagation) → broadcast quality attribute → per-cluster argmax.
    Scale shape: the keep-richest top-1 is ONE aggregate —
    max(struct(n_chars, -doc_id, doc_id)) is the lexicographic argmax
    of the (n_chars DESC, doc_id ASC) order, so each map partition
    collapses to one candidate per cluster BEFORE the shuffle and the
    exchange carries aggregated candidates, not every scored row
    (r12, guide §2.3 "aggregate before you shuffle"; the previous
    row_number window shuffled every scored row, sorted each cluster
    partition on all three keys, and ran through the spillable window
    buffer). The struct-typed max buffer puts this on Spark's
    sort-based aggregate path (SortAggregate over a cluster_id-only
    sort), which the measured 2x still comfortably wins. Exactness:
    doc_id is non-null (filtered) and the struct prefix (n_chars,
    -doc_id) is unique per cluster, so the trailing doc_id payload
    field never decides a comparison; a NULL n_chars loses to any
    non-null in Spark's struct ordering exactly as F.desc's
    NULLS-LAST ranked it last (hash-proven at 3 SFs + a crafted
    NULL-n_chars corpus). At 100 TB the kept-set join back to the
    corpus is a semi-join on kept_doc. Oracle: recursive-CTE closure
    + the ranked reduction."""
    from ..operators.graph import connected_components

    pairs = _near_pairs(spark, sf_dir).select("doc_id1", "doc_id2")
    edges = pairs.select(
        F.col("doc_id1").alias("src"), F.col("doc_id2").alias("dst")
    )
    docs = load_table(spark, sf_dir, "documents")
    # isNotNull: stated NULL-entity exclusion, lockstep with
    # q_dedup_cluster (the label join back to docs dropped it anyway).
    nodes = docs.where(F.col("doc_id").isNotNull()).select(
        F.col("doc_id").alias("id")
    )
    labels = connected_components(nodes, edges)
    scored = labels.join(
        docs.select("doc_id", "n_chars"),
        labels.id == F.col("doc_id"),
    ).select(F.col("label").alias("cluster_id"), "doc_id", "n_chars")
    best = F.max(
        F.struct(
            F.col("n_chars"),
            (-F.col("doc_id")).alias("neg_id"),
            F.col("doc_id"),
        )
    )
    return (
        scored.groupBy("cluster_id")
        .agg(
            best.alias("best"),
            (F.count(F.lit(1)) - 1).cast("bigint").alias("n_dropped"),
        )
        .select(
            "cluster_id",
            F.col("best.doc_id").alias("kept_doc"),
            F.col("best.n_chars").cast("bigint").alias("kept_chars"),
            "n_dropped",
        )
    )
