"""Extended training-data-pipeline operators (north-star extension):
SimHash, embedding-cosine near-dup, LSH-bucketed ANN, language-ID,
quality scoring, winnowing fingerprints, multimodal binary columns.

These extend §2.10 with the remaining operations a 100 TB
training-data pipeline needs. Every computation is expressed with
engine-portable integer/decimal arithmetic so the DuckDB oracle is
bit-exact (shared tricks: md5-derived 60-bit token hashes via
``conv(substr(md5(x),1,15),16,10)``; Rademacher hyperplanes from an
integer LCG; decimal-exact float sums; ``mround`` everywhere a
rounded double is compared).

Scale notes:
- simhash / fingerprint / quality / langid: pure per-row or
  per-(doc,token) map + one hash-aggregate keyed by doc_id — shuffle
  carries one row per doc. Linear, uniform, scales.
- q_dedup_embed is the brute-force O(n²) baseline kept for oracle
  verification at small SF; q_sim_ann is the scale path — candidates
  meet in LSH buckets (equi-join on the 8-bit signature), the exact
  re-rank only touches same-bucket pairs.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.hashing import (
    DUCK_ASCII_FOLD,
    DUCK_H60,
    SPARK_H60,
    spark_ascii_fold,
)
from ..functions.vector import dot64, emb_finite, mround, sql_emb_finite, sql_mround
from ..operators.minhash import ngram_rows
from ..sources.loader import fan_out, load_table
from .registry import register

# 60-bit deterministic token hash, identical on both engines.
# Canonical copies live in functions/hashing.py (non-registering —
# review r6 hoist); local underscore aliases keep call sites short.
_SPARK_H60, _DUCK_H60 = SPARK_H60, DUCK_H60


@register(
    "q_dedup_simhash",
    oracle="""
    WITH toks AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ), bits AS (
        SELECT doc_id, tok, t.range AS j,
               ((strpos('0123456789abcdef',
                        substr(md5(tok), 1 + CAST(t.range AS INT) // 4, 1)) - 1)
                >> (3 - CAST(t.range AS INT) % 4)) & 1 AS bit
        FROM toks CROSS JOIN range(32) t
    ), votes AS (
        SELECT doc_id, j, SUM(2 * bit - 1) AS v
        FROM bits GROUP BY doc_id, j
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN v > 0 THEN 1::BIGINT << CAST(j AS INT) ELSE 0 END)
                AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
    """,
)
def q_dedup_simhash(spark, sf_dir):
    """32-bit SimHash per document over its distinct-token set: each
    token votes ±1 on each signature bit (bit j of the token's md5);
    bit j of the fingerprint is 1 iff the vote sum is positive.
    Near-dup docs (shared token sets) land at small hamming distance —
    banding the signature gives the candidate join at scale."""
    # Keyed fan-out (r12, guide §2.4): dropDuplicates(doc_id, tok),
    # the bit-vote groupBy(doc_id, j) and the final groupBy(doc_id)
    # are all doc_id-clustered — hashpartitioning(doc_id) satisfies
    # every one, so the whole vote chain runs exchange-free after the
    # fan-out (was 3 downstream exchanges under round-robin).
    d = fan_out(load_table(spark, sf_dir, "documents"), by="doc_id")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).dropDuplicates(["doc_id", "tok"])
    # md5 BEFORE the 32-way bit explode: hashed once per (doc, token),
    # not once per (doc, token, bit) — the hash is ~all the per-row
    # cost, so recomputing it under the explode was a 32× overspend
    # (the explode's projection re-evaluates every expression that
    # references the exploded column's row).
    hashed = toks.select("doc_id", F.md5("tok").alias("h"))
    bits = hashed.select(
        "doc_id",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("j"),
    ).select(
        "doc_id",
        "j",
        F.expr(
            "((instr('0123456789abcdef', substr(h, 1 + CAST(j / 4 AS INT), 1)) - 1)"
            " >> (3 - j % 4)) & 1"
        ).alias("bit"),
    )
    votes = bits.groupBy("doc_id", "j").agg(F.sum(2 * F.col("bit") - 1).alias("v"))
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("CAST(1 AS BIGINT) << CAST(j AS INT)")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("simhash")
    )


@register(
    "q_dedup_embed",
    oracle=f"""
    WITH emb2 AS (
        -- vector-op participation gate (doctored-embeddings sweep r6)
        SELECT vec_id, embedding FROM embeddings
        WHERE {sql_emb_finite('embedding')}
    )
    SELECT a.vec_id AS vec_id1, b.vec_id AS vec_id2,
           {sql_mround('list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])')} AS sim
    FROM emb2 a JOIN emb2 b ON a.vec_id < b.vec_id
    WHERE list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
    """,
)
def q_dedup_embed(spark, sf_dir):
    """Embedding-cosine near-dup pairs (cosine >= 0.4 on unit vectors
    == dot). Brute-force all-pairs BASELINE for oracle verification —
    the scale path is q_sim_ann's LSH bucketing (same re-rank)."""
    e = load_table(spark, sf_dir, "embeddings").where(
        emb_finite("embedding")  # vector-op contract (r6 sweeps)
    )
    # Probe side fanned out so the nested-loop pair evaluation uses
    # all cores. The broadcast build side is the SAME unbounded table
    # as the probe side — acceptable ONLY because this query is the
    # declared small-SF brute-force baseline (do NOT copy this
    # pattern into a scale path; that's q_sim_ann's bucketed join).
    a = fan_out(
        e.select(F.col("vec_id").alias("vec_id1"), F.col("embedding").alias("ea"))
    )
    b = e.select(F.col("vec_id").alias("vec_id2"), F.col("embedding").alias("eb"))
    pairs = (
        a.crossJoin(F.broadcast(b))
        .where(F.col("vec_id1") < F.col("vec_id2"))
        .select("vec_id1", "vec_id2", dot64("ea", "eb").alias("dot"))
        .where(F.col("dot") >= 0.4)
    )
    return pairs.select("vec_id1", "vec_id2", mround("dot").alias("sim"))


# Rademacher hyperplanes from an integer LCG — identical in both
# engines because everything is exact BIGINT arithmetic. Sign of
# hyperplane j at dimension d = +1 if lcg(j*64+d) is even else -1.
_LCG = "((1103515245 * ({i}) + 12345) % 2147483648)"


@register(
    "q_sim_ann",
    oracle=f"""
    WITH emb AS (
        -- finite-embedding vector-op contract (NaN/Inf sweep r6)
        SELECT vec_id, embedding FROM embeddings
        WHERE {sql_emb_finite('embedding')}
    ), comps AS (
        SELECT e.vec_id, t.range AS j, d.range AS d,
               CASE WHEN ({_LCG.format(i='t.range * 64 + d.range')} // 65536) % 2 = 0
                    THEN 1 ELSE -1 END
               * CAST(e.embedding[CAST(d.range AS INT) + 1] AS DECIMAL(30,6)) AS c
        FROM emb e CROSS JOIN range(8) t CROSS JOIN range(64) d
    ), sigbits AS (
        SELECT vec_id, j,
               CASE WHEN SUM(c) > 0 THEN 1::BIGINT << CAST(j AS INT) ELSE 0 END AS b
        FROM comps GROUP BY vec_id, j
    ), buckets AS (
        SELECT vec_id, CAST(SUM(b) AS BIGINT) AS bucket FROM sigbits GROUP BY vec_id
    ), probes AS (
        SELECT e.vec_id AS query_id, e.embedding AS qemb, k.bucket
        FROM emb e JOIN buckets k ON e.vec_id = k.vec_id
        WHERE e.vec_id < 10
    ), cands AS (
        SELECT p.query_id, e.vec_id AS neighbor_id,
               list_inner_product(e.embedding::DOUBLE[], p.qemb::DOUBLE[]) AS sim
        FROM probes p
        JOIN buckets bk ON bk.bucket = p.bucket
        JOIN emb e ON e.vec_id = bk.vec_id
        WHERE e.vec_id <> p.query_id
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id) AS rn
        FROM cands
    )
    SELECT query_id, neighbor_id, {sql_mround('sim')} AS sim
    FROM ranked WHERE rn <= 3
    """,
)
def q_sim_ann(spark, sf_dir):
    """Approximate nearest neighbors via random-hyperplane LSH: 8-bit
    signed-projection signature (Rademacher hyperplanes from an exact
    integer LCG — bit 16 of the state, never the parity bit, whose
    period-2 pattern would collapse all hyperplanes into one;
    projections summed in DECIMAL so the bucket id is deterministic
    cross-engine), candidates = same-bucket vectors,
    exact top-3 re-rank. At 100 TB the candidate join is an equi-join
    on the signature (multi-probe/banded in practice) — never an
    all-pairs scan."""
    e = load_table(spark, sf_dir, "embeddings").where(
        emb_finite("embedding")  # vector-op contract (NaN/Inf sweep r6)
    )
    comps = (
        # Keyed fan-out (r12, guide §2.4): the signature-bit groupBys
        # (vec_id, j) and (vec_id) are vec_id-clustered.
        fan_out(e, by="vec_id").select("vec_id", F.posexplode("embedding").alias("d", "x"))
        .crossJoin(F.broadcast(spark.range(8).select(F.col("id").cast("int").alias("j"))))
        .select(
            "vec_id",
            "j",
            F.expr(
                "CASE WHEN (((1103515245 * (CAST(j AS BIGINT) * 64 + d) + 12345) % 2147483648) div 65536) % 2 = 0 "
                "THEN 1 ELSE -1 END * CAST(CAST(x AS DOUBLE) AS DECIMAL(30,6))"
            ).alias("c"),
        )
    )
    sigbits = comps.groupBy("vec_id", "j").agg(
        F.when(F.sum("c") > 0, F.expr("CAST(1 AS BIGINT) << j"))
        .otherwise(F.lit(0))
        .alias("b")
    )
    buckets = sigbits.groupBy("vec_id").agg(F.sum("b").cast("bigint").alias("bucket"))

    probes = (
        e.where(F.col("vec_id") < 10)
        .join(buckets, "vec_id")
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qemb"),
            "bucket",
        )
    )
    cands = (
        F.broadcast(probes)
        .join(buckets.withColumnRenamed("vec_id", "neighbor_id"), "bucket")
        .join(
            e.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
            "neighbor_id",
        )
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", dot64("embedding", "qemb").alias("sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cands.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", mround("sim").alias("sim"))
    )


# q_text_quality moved to plans/quality.py (round-5 window rotation +
# the BIGINT quality_e4 rewrite — see that module's docstring).


@register(
    "q_text_langid",
    oracle=f"""
    WITH feat AS (
        SELECT doc_id, lang,
               -- NULLIF guard (review r6): a space-only/empty text has
               -- zero letters; DuckDB's 0.0/0 is NaN (which its CASE
               -- orders ABOVE every threshold -> 'es') while Spark
               -- yields NULL (falls through) — NULL on both engines
               -- pins the fall-through.
               CAST(length(regexp_replace(text, '[^aeiou]', '', 'g')) AS DOUBLE)
               / NULLIF(length(replace(text, ' ', '')), 0) AS vowel_ratio,
               CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / (len(string_split(text, ' '))) AS avg_tok_len
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN vowel_ratio >= 0.42 THEN 'es'
                WHEN vowel_ratio >= 0.38 THEN 'en'
                WHEN avg_tok_len >= 4.6 THEN 'de'
                WHEN avg_tok_len >= 4.0 THEN 'fr'
                ELSE 'zh' END AS pred_lang,
           {sql_mround('vowel_ratio')} AS vowel_ratio,
           {sql_mround('avg_tok_len')} AS avg_tok_len
    FROM feat
    """,
)
def q_text_langid(spark, sf_dir):
    """Language-ID by character-profile heuristic (vowel density +
    mean token length thresholds). NOTE: the synthetic corpus is the
    same token soup for every lang label, so predictions cannot and do
    not recover the metadata lang — this query demonstrates the
    operator shape (per-doc featurize → classify, one map pass, no
    shuffle); swap the CASE for real per-language n-gram profiles in
    production."""
    d = load_table(spark, sf_dir, "documents")
    letters = F.length(F.regexp_replace("text", " ", ""))
    vowels = F.length(F.regexp_replace("text", "[^aeiou]", ""))
    n_toks = F.size(F.split("text", " "))
    feat = d.select(
        "doc_id", "lang",
        # NULL (not NaN/error) on zero letters — lockstep with the
        # oracle's NULLIF; both CASEs then fall through identically.
        F.when(letters > 0, vowels.cast("double") / letters).alias(
            "vowel_ratio"
        ),
        (letters.cast("double") / n_toks).alias("avg_tok_len"),
    )
    pred = (
        F.when(F.col("vowel_ratio") >= 0.42, "es")
        .when(F.col("vowel_ratio") >= 0.38, "en")
        .when(F.col("avg_tok_len") >= 4.6, "de")
        .when(F.col("avg_tok_len") >= 4.0, "fr")
        .otherwise("zh")
    )
    return feat.select(
        "doc_id", "lang", pred.alias("pred_lang"),
        mround("vowel_ratio").alias("vowel_ratio"),
        mround("avg_tok_len").alias("avg_tok_len"),
    )


@register(
    "q_text_fingerprint",
    oracle=f"""
    WITH rows_ AS (
        SELECT DISTINCT doc_id, text FROM documents
    ), toks AS (
        SELECT doc_id, text, string_split(text, ' ') AS w FROM rows_
    ), pos AS (
        SELECT doc_id, text, w, unnest(generate_series(1, len(w) - 2)) AS p
        FROM toks WHERE len(w) >= 3
    ), sh AS (
        SELECT doc_id, text, p,
               {_DUCK_H60.format(x="w[p] || ' ' || w[p+1] || ' ' || w[p+2]")} AS h
        FROM pos
    ), wins AS (
        SELECT doc_id,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY text, p
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m
        FROM sh
    ), fp AS (
        SELECT DISTINCT doc_id, m FROM wins
    )
    SELECT doc_id, COUNT(*) AS n_fp,
           CAST(SUM(m % 1000000007) AS BIGINT) AS fp_sum
    FROM fp GROUP BY doc_id
    """,
)
def q_text_fingerprint(spark, sf_dir):
    """Winnowing document fingerprint (MOSS-style rolling selection):
    positional 3-gram shingle hashes → min hash per 4-shingle window →
    distinct selected hashes per doc, digested as (count, sum mod p).
    Near-dup docs share most selected hashes, so the fingerprint set
    is joinable for candidate detection at scale. One explode + two
    keyed passes per doc — linear.

    Entity identity under duplicate doc_ids (law 25 + r7 composed
    unicode×dup sweep): position p alone is NOT a total order when a
    doc_id spans rows — both engines' rolling windows interleaved the
    rows' shingle streams in engine-private tie order. The contract:
    exact-duplicate rows collapse first (DISTINCT doc_id, text), and
    the entity's stream is its distinct rows' streams concatenated in
    text order — the window key (text, p) is total, so the winnow is
    deterministic and identical on both engines. (At 100 TB you'd
    order by a row serial instead of the text value; the text key is
    the exact cross-engine form.)"""
    # Keyed fan-out (r12, guide §2.4): the entity-collapse DISTINCT
    # (doc_id, text), the winnow window (doc_id) and both downstream
    # doc_id aggregations are all doc_id-clustered — partitioning by
    # doc_id BEFORE the dropDuplicates satisfies all of them with one
    # exchange (the round-robin form paid one per step).
    d = fan_out(
        load_table(spark, sf_dir, "documents"), by="doc_id"
    ).dropDuplicates(["doc_id", "text"])
    toks = d.select("doc_id", "text", F.split("text", " ").alias("w")).where(
        F.size("w") >= 3
    )
    sh = (
        toks.select("doc_id", "text", "w", F.posexplode("w").alias("pos", "t0"))
        .where(F.col("pos") <= F.size("w") - 3)
        .select(
            "doc_id",
            "text",
            F.col("pos").alias("p"),
            F.expr(
                _SPARK_H60.format(
                    x="concat_ws(' ', t0, element_at(w, pos + 2), element_at(w, pos + 3))"
                )
            ).alias("h"),
        )
    )
    win = W.partitionBy("doc_id").orderBy("text", "p").rowsBetween(0, 3)
    fp = (
        sh.select("doc_id", F.min("h").over(win).alias("m"))
        .dropDuplicates(["doc_id", "m"])
    )
    return fp.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fp"),
        F.sum(F.col("m") % 1000000007).cast("bigint").alias("fp_sum"),
    )


_BPE_FOLD = DUCK_ASCII_FOLD.format(x="text")


@register(
    "q_text_bpe_tokens",
    oracle=f"""
    WITH per_doc AS (
        SELECT doc_id, lang,
               len(regexp_extract_all({_BPE_FOLD}, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
                   AS n_bpe,
               len(string_split(text, ' ')) AS n_ws
        FROM documents
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_bpe) AS BIGINT) AS total_bpe,
           {sql_mround(
               'CAST(SUM(n_bpe) AS DOUBLE) / SUM(n_ws)'
           )} AS bpe_per_word
    FROM per_doc GROUP BY lang
    """,
)
def q_text_bpe_tokens(spark, sf_dir):
    """Token counting with a BPE-ish regex tokenizer (letter runs,
    digit runs, single punctuation — the GPT-2 pre-tokenizer shape,
    simplified to the Java∩RE2 regex subset): per-language totals and
    the BPE-to-whitespace fan-out ratio a data pipeline uses for
    token-budget estimates. Pure per-row map + one aggregate —
    shuffle carries one row per lang. Case folding is ASCII-only
    (functions/hashing.spark_ascii_fold): native lower() is
    engine-locale-dependent off-ASCII and forked the token counts on
    the first unicode document (r6 unicode probe); non-ASCII chars
    pass through and tokenize as single [^a-z0-9 ] chars, identically
    code-point-wise on both engines."""
    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "lang",
        F.size(
            F.regexp_extract_all(
                spark_ascii_fold("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0
            )
        ).alias("n_bpe"),
        F.size(F.split("text", " ")).alias("n_ws"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bpe").cast("bigint").alias("total_bpe"),
        mround(
            F.sum("n_bpe").cast("double") / F.sum("n_ws")
        ).alias("bpe_per_word"),
    )


@register(
    "q_text_tfidf",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), tf AS (
        SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok
    ), dfreq AS (
        SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
    ), total AS (
        SELECT COUNT(*) AS n_docs FROM documents
    ), scored AS (
        SELECT t.doc_id, t.tok, t.tf, d.df,
               CAST(t.tf AS DOUBLE)
               * (CAST(n_docs AS DOUBLE) / CAST(d.df AS DOUBLE)) AS s
        FROM tf t JOIN dfreq d USING (tok) CROSS JOIN total
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY s DESC, tok) AS rn
        FROM scored
    )
    SELECT doc_id, tok, tf, df, CAST(rn AS INT) AS rank,
           {sql_mround('s')} AS tfidf
    FROM ranked WHERE rn <= 3
    """,
)
def q_text_tfidf(spark, sf_dir):
    """Top-3 salient terms per document by tf-idf with a RATIONAL idf
    surrogate (tf * N/df instead of tf * ln(N/df)): ln() is the one
    transcendental whose last-ulp may differ between libm builds, and
    N/df is order-preserving in it, so ranking is identical and every
    double is engine-exact. Two hash-aggregates (doc×term, term) + one
    equi-join on term + per-doc top-k window — all shuffle keys uniform
    (terms follow the corpus distribution; a hot term's df row is one
    row, the join fan-out is bounded by docs-per-term which is the df
    itself — skew shows up only if one term dominates the corpus, the
    salting case)."""
    # Keyed fan-out (r12, guide §2.4): the tf aggregate (doc_id, tok)
    # and the final top-k window (doc_id) are doc_id-clustered; the
    # df-side groupBy(tok) still pays its own exchange (different
    # key — fundamental to the join, not removable).
    d = fan_out(load_table(spark, sf_dir, "documents"), by="doc_id")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    total = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "tok",
            "tf",
            "df",
            (
                F.col("tf").cast("double")
                * (F.col("n_docs").cast("double") / F.col("df").cast("double"))
            ).alias("s"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("s"), F.asc("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "doc_id", "tok", "tf", "df",
            F.col("rn").alias("rank"),
            mround("s").alias("tfidf"),
        )
    )


@register(
    "q_multimodal_binary",
    oracle="""
    SELECT doc_id, 'text/plain' AS mime,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
)
def q_multimodal_binary(spark, sf_dir):
    """Multimodal binary-column plumbing: pack each document as an
    opaque BINARY blob + typed metadata (mime), ship it through an
    Arrow-batched mapInPandas 'decode' stage, emit extracted features.
    The text 'decode' is real (byte length + md5 of the bytes); image/
    audio/video decode is STUBBED behind NotImplementedError because
    the codecs are not in this container — the Spark-side schema,
    batching, and UDF signature are exactly what a real decoder uses.
    Scale: narrow map pass, no shuffle; binary stays in Arrow buffers."""

    def decode(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            n_bytes, md5s = [], []
            for blob, mime in zip(pdf["blob"], pdf["mime"]):
                if mime != "text/plain":
                    # Deliberate stub: no image/audio codecs in this
                    # container (see docstring).
                    raise NotImplementedError(f"no decoder for {mime}")
                if blob is None:
                    # NULL payload: NULL features, matching the
                    # oracle's strlen(NULL)/md5(NULL) — bytes(None)
                    # crashed the Arrow batch before this guard
                    # (found by the NULL-row adversarial sweep, r6).
                    n_bytes.append(None)
                    md5s.append(None)
                    continue
                b = bytes(blob)
                n_bytes.append(len(b))
                md5s.append(hashlib.md5(b).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": n_bytes,
                    "content_md5": md5s,
                }
            )

    d = load_table(spark, sf_dir, "documents")
    packed = d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("blob"),
        F.lit("text/plain").alias("mime"),
    )
    return packed.mapInPandas(
        decode, "doc_id bigint, mime string, n_bytes bigint, content_md5 string"
    )


@register(
    "q_sample_hash",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE {_DUCK_H60.format(x='text')} % 100 < 20
    """,
)
def q_sample_hash(spark, sf_dir):
    """Deterministic ~20% corpus subsample by content hash — the
    reproducible alternative to rand()-sampling for training-data
    pipelines: the same document always lands in the same split,
    regardless of partitioning, ordering, cluster size, or reruns
    (rand()/TABLESAMPLE give none of those). Pure per-row filter, no
    shuffle; at 100 TB this composes with any downstream pipeline as a
    free scan-time predicate."""
    d = load_table(spark, sf_dir, "documents")
    return d.where(
        F.expr(_SPARK_H60.format(x="text") + " % 100 < 20")
    ).select("doc_id", "lang", "n_chars")


@register(
    "q_sample_stratified",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY {_DUCK_H60.format(x='text')} NULLS LAST, doc_id NULLS LAST
               ) AS rn
        FROM documents
    )
    SELECT doc_id, lang, CAST(rn AS INT) AS rank
    FROM ranked WHERE rn <= 20
    """,
)
def q_sample_stratified(spark, sf_dir):
    """Stratified deterministic sample: exactly 20 docs per language,
    chosen by content-hash order (+ doc_id tie-break) — balanced
    per-stratum subsets that are stable across reruns/partitioning,
    the companion to q_sample_hash's global split. One shuffle on the
    stratum key; per-stratum top-k via window (WindowGroupLimit prunes
    map-side, so the shuffle carries ~k rows per stratum, not the
    table). NULL ordering pinned NULLS LAST on both engines: a
    NULL-text doc hashes to NULL, which Spark's default orders FIRST
    and DuckDB's LAST — shifting every rank in that stratum (found by
    the NULL-row adversarial sweep, r6)."""
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(
        # both keys nulls-last (law 40, r8 fuzz sweep): NULL doc_id
        F.asc_nulls_last(F.expr(_SPARK_H60.format(x="text"))),
        F.asc_nulls_last("doc_id"),
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 20)
        .select("doc_id", "lang", F.col("rn").cast("int").alias("rank"))
    )


@register(
    "q_text_ngram_freq",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), bi AS (
        SELECT w[p] || ' ' || w[p + 1] AS bigram
        FROM toks, unnest(generate_series(1, len(w) - 1)) AS t(p)
        WHERE len(w) >= 2
    ), counts AS (
        SELECT bigram, COUNT(*) AS n FROM bi GROUP BY bigram
    )
    SELECT bigram, n
    FROM counts
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
)
def q_text_ngram_freq(spark, sf_dir):
    """Global top-20 bigram frequencies — corpus vocabulary statistics
    (the input to stopword lists, tokenizer merges, contamination
    checks). Explode + one hash-aggregate keyed by bigram +
    TakeOrderedAndProject with a total order (count desc, bigram asc);
    the shuffle carries one row per distinct bigram, the top-k merge
    k rows per partition."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    # Canonical n-gram construction (operators/minhash.ngram_rows —
    # shared with shingle_rows and q_text_repetition, review r6).
    bi = ngram_rows(d, 2, out_col="bigram", keep_cols=(), distinct=False)
    return (
        bi.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


@register(
    "q_text_chunk",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), c AS (
        SELECT doc_id, w,
               unnest(generate_series(0, (len(w) - 1) // 32)) AS chunk_id
        FROM toks
    )
    SELECT doc_id,
           CAST(chunk_id AS INTEGER) AS chunk_id,
           CAST(len(list_slice(w, chunk_id * 32 + 1, chunk_id * 32 + 32))
                AS INTEGER) AS n_tokens,
           array_to_string(list_slice(w, chunk_id * 32 + 1, chunk_id * 32 + 32),
                           ' ') AS chunk_text
    FROM c
    """,
)
def q_text_chunk(spark, sf_dir):
    """Sequence packing / chunking: split each document into fixed-size
    32-token chunks (the pretraining context-window prep step), keeping
    per-chunk token counts and the reassembled chunk text. No explode
    of individual tokens: enumerate chunk indices with
    sequence+explode, then slice the token array per chunk — rows out
    = chunks, not tokens, so the shuffle-free map pass stays ~len/32 of
    the exploded alternative and everything is whole-stage codegen.
    Last chunk is ragged (n_tokens <= 32), matching how packers emit a
    tail rather than padding."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("w"))
    c = toks.select(
        "doc_id",
        "w",
        F.explode(
            F.sequence(
                F.lit(0), F.floor((F.size("w") - 1) / 32).cast("int")
            )
        ).alias("chunk_id"),
    )
    piece = F.slice("w", F.col("chunk_id") * 32 + 1, F.lit(32))
    return c.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(piece).alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


@register(
    "q_text_repetition",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), tok AS (
        SELECT doc_id, unnest(w) AS t FROM toks
    ), per_tok AS (
        SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY doc_id, t
    ), m1 AS (
        SELECT doc_id, SUM(c) AS n_toks, COUNT(*) AS n_distinct,
               MAX(c) AS top_c
        FROM per_tok GROUP BY doc_id
    ), big AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(w) - 1),
                                     i -> w[i] || ' ' || w[i+1])) AS b
        FROM toks WHERE len(w) >= 2
    ), per_big AS (
        SELECT doc_id, b, COUNT(*) AS c FROM big GROUP BY doc_id, b
    ), m2 AS (
        SELECT doc_id, SUM(c) AS n_bi, COUNT(*) AS n_bi_distinct
        FROM per_big GROUP BY doc_id
    )
    SELECT m1.doc_id,
           CAST(m1.n_toks AS BIGINT) AS n_toks,
           {sql_mround('1.0 - CAST(m1.n_distinct AS DOUBLE) / m1.n_toks')}
               AS frac_dup_tokens,
           {sql_mround('CAST(m1.top_c AS DOUBLE) / m1.n_toks')}
               AS top_token_frac,
           {sql_mround('COALESCE(1.0 - CAST(m2.n_bi_distinct AS DOUBLE)'
                       ' / m2.n_bi, 0.0)')} AS frac_dup_bigrams,
           (CAST(m1.top_c AS DOUBLE) / m1.n_toks <= 0.2
            AND COALESCE(1.0 - CAST(m2.n_bi_distinct AS DOUBLE) / m2.n_bi,
                         0.0) <= 0.2) AS keep
    FROM m1 LEFT JOIN m2 ON m1.doc_id = m2.doc_id
    """,
)
def q_text_repetition(spark, sf_dir):
    """Repetition-based quality filter (the Gopher/RefinedWeb family):
    per doc, the duplicate-token fraction, the most-frequent-token
    share, and the duplicate-bigram fraction, plus a keep/drop verdict
    at the standard 0.2 thresholds. Two hash-aggregates keyed by
    (doc_id, gram) then doc_id — shuffle rows ∝ distinct grams per
    doc, no joins between docs, embarrassingly parallel at corpus
    scale. Ratios compared after mround so the oracle is bit-exact;
    the keep flag compares UNrounded ratios on both engines."""
    # Keyed fan-out (r12, guide §2.4): both gram aggregates and both
    # per-doc rollups are doc_id-clustered — one hashpartitioning
    # (doc_id) replaces four downstream exchanges.
    d = fan_out(load_table(spark, sf_dir, "documents"), by="doc_id")
    toks = d.select("doc_id", F.split("text", " ").alias("w"))
    tok = toks.select("doc_id", F.explode("w").alias("t"))
    m1 = (
        tok.groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_toks"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("top_c"),
        )
    )
    # Canonical n-gram construction (operators/minhash.ngram_rows).
    big = ngram_rows(d, 2, out_col="b", distinct=False)
    m2 = (
        big.groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bi"),
            F.count(F.lit(1)).alias("n_bi_distinct"),
        )
    )
    top_frac = F.col("top_c").cast("double") / F.col("n_toks")
    dup_bi = F.coalesce(
        F.lit(1.0) - F.col("n_bi_distinct").cast("double") / F.col("n_bi"),
        F.lit(0.0),
    )
    return m1.join(m2, "doc_id", "left").select(
        "doc_id",
        F.col("n_toks").cast("bigint").alias("n_toks"),
        mround(
            F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_toks")
        ).alias("frac_dup_tokens"),
        mround(top_frac).alias("top_token_frac"),
        mround(dup_bi).alias("frac_dup_bigrams"),
        ((top_frac <= 0.2) & (dup_bi <= 0.2)).alias("keep"),
    )


@register(
    "q_text_concat_pack",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok
        FROM documents
    ), c AS (
        SELECT doc_id, source, n_tok,
               SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id NULLS LAST
                                ROWS UNBOUNDED PRECEDING) - n_tok AS start_tok
        FROM t
    )
    SELECT source,
           CAST(start_tok // 512 AS BIGINT) AS bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           {sql_mround('CAST(SUM(n_tok) AS DOUBLE) / 512')} AS fill
    FROM c
    GROUP BY source, start_tok // 512
    """,
)
def q_text_concat_pack(spark, sf_dir):
    """Cross-document sequence packing: concatenate docs per source in
    doc_id order and cut 512-token training sequences; each doc is
    assigned to the bin where it STARTS (greedy first-fit in stream
    order — the standard concat-and-chunk pretraining packer). Output
    is per-(source, bin) occupancy. One window cumsum per source
    partition + one hash-aggregate: both shuffle on source, integer
    arithmetic throughout, so the pack assignment is deterministic at
    any partitioning and linear at corpus scale."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tok")
    )
    # nulls-last pack order (law 40, r8 fuzz sweep): a NULL doc_id
    # must take the same pack position on both engines
    w = W.partitionBy("source").orderBy(F.asc_nulls_last("doc_id")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    c = t.select(
        "source",
        "n_tok",
        (F.sum("n_tok").over(w) - F.col("n_tok")).alias("start_tok"),
    )
    return (
        c.groupBy("source", F.floor(F.col("start_tok") / 512).alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
        )
        .select(
            "source",
            "bin",
            "n_docs",
            "total_tokens",
            mround(F.col("total_tokens").cast("double") / 512).alias("fill"),
        )
    )


@register(
    "q_text_redact",
    oracle="""
    WITH aug AS (
        SELECT doc_id,
               'contact u' || CAST(doc_id AS VARCHAR)
                   || '@mail.example.com ref '
                   || lpad(CAST(doc_id * 37 % 10000000 AS VARCHAR), 9, '0')
                   || ' ' || text AS raw
        FROM documents
    ), red AS (
        SELECT doc_id, raw,
               regexp_replace(
                   regexp_replace(
                       raw,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+',
                       '<EMAIL>', 'g'),
                   '[0-9][0-9][0-9][0-9][0-9][0-9]+', '<NUM>', 'g') AS redacted
        FROM aug
    )
    SELECT doc_id,
           substr(redacted, 1, 40) AS head,
           CAST(length(raw) - length(redacted) AS BIGINT) AS chars_removed,
           CASE WHEN redacted LIKE '%<EMAIL>%' THEN 1 ELSE 0 END AS had_email,
           CASE WHEN redacted LIKE '%<NUM>%' THEN 1 ELSE 0 END AS had_number
    FROM red
    """,
)
def q_text_redact(spark, sf_dir):
    """PII-style redaction — the cleaning stage every shared training
    corpus runs before release: mask email addresses and long digit
    runs with typed placeholders, report per-doc reduction. The
    synthetic documents carry no natural PII, so a deterministic
    PII-bearing prefix is derived from doc_id first (same derivation
    in the oracle) — the redaction machinery and its cross-engine
    regex semantics are what is under test. Regexes are POSIX-basic
    (Java ∩ RE2, determinism rule 6); Spark's regexp_replace is
    global by default, DuckDB takes the explicit 'g' flag. Pure
    per-row map — no shuffle, codegen-compiled, linear at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("contact u"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com ref "),
        F.lpad((F.col("doc_id") * 37 % 10000000).cast("string"), 9, "0"),
        F.lit(" "),
        F.col("text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            raw,
            "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+",
            "<EMAIL>",
        ),
        "[0-9][0-9][0-9][0-9][0-9][0-9]+",
        "<NUM>",
    )
    aug = d.select("doc_id", raw.alias("raw"), redacted.alias("redacted"))
    return aug.select(
        "doc_id",
        F.substring("redacted", 1, 40).alias("head"),
        (F.length("raw") - F.length("redacted")).cast("bigint").alias("chars_removed"),
        F.when(F.col("redacted").like("%<EMAIL>%"), 1).otherwise(0).alias("had_email"),
        F.when(F.col("redacted").like("%<NUM>%"), 1).otherwise(0).alias("had_number"),
    )


@register(
    "q_sample_mixture",
    oracle="""
    WITH wts AS (
        SELECT source, COUNT(*) AS n_total,
               CAST(CASE WHEN TRY_CAST(substr(source, 4) AS INT) % 2 = 0
                         THEN 3 ELSE 1 END AS BIGINT) AS wt
        FROM documents GROUP BY source
    ), wa AS (
        SELECT CAST(SUM(wt) AS BIGINT) AS w_all FROM wts
    ), lim AS (
        SELECT MIN(n_total * w_all // wt) AS n_target, MAX(w_all) AS w_all
        FROM wts, wa
    ), ranked AS (
        SELECT d.doc_id, d.source, w.wt,
               ROW_NUMBER() OVER (PARTITION BY d.source
                                  ORDER BY md5(CAST(d.doc_id AS VARCHAR))
                                               NULLS LAST,
                                           d.doc_id NULLS LAST) AS rn
        FROM documents d JOIN wts w ON d.source = w.source
    )
    SELECT r.doc_id, r.source
    FROM ranked r, lim
    WHERE r.rn <= (lim.n_target * r.wt) // lim.w_all
    """,
)
def q_sample_mixture(spark, sf_dir):
    """Deterministic data-mixture sampling — the pretraining 'mixing
    weights' step: given per-source target weights (here 3:1 favoring
    even-indexed sources), keep the LARGEST corpus achievable at
    exactly those proportions. All arithmetic is integer-exact
    (weights, feasible total N = min_s floor(n_s*W/wt_s), per-source
    quota floor(N*wt_s/W)) and row selection is a per-source rank on
    md5(doc_id) — the kept SET is reproducible run-to-run and
    engine-to-engine, which is what makes a training mix auditable,
    and rank stability means later-added documents perturb the sample
    minimally (the q_sample_hash property). Scale shape: one tiny
    count-aggregate, one window rank partitioned by source
    (high-cardinality at real scale), no data-dependent driver
    logic."""
    d = load_table(spark, sf_dir, "documents")
    # try_cast, not cast: a source name whose 4th character onward is
    # not an integer ('degen' → 'en') crashes the ANSI cast on BOTH
    # engines; NULL falls through the CASE to weight 1 identically
    # (found by the NULL-row adversarial sweep, r6).
    wts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_total")).select(
        "source",
        "n_total",
        F.when(
            F.substring("source", 4, 10).try_cast("int") % 2 == 0, F.lit(3)
        )
        .otherwise(F.lit(1))
        .cast("bigint")
        .alias("wt"),
    )
    w_all = wts.agg(F.sum("wt").alias("w_all"))
    lim = (
        wts.crossJoin(F.broadcast(w_all))
        .agg(
            F.min(F.expr("n_total * w_all DIV wt")).alias("n_target"),
            F.first("w_all").alias("w_all"),
        )
    )
    # asc_nulls_last on BOTH rank keys (law 2/40): md5(NULL id) is NULL,
    # and Spark's ASC NULLS FIRST default ranked a NULL-id doc rn=1
    # (kept) where DuckDB's NULLS LAST ranked it past the quota cut —
    # latent until the r8 composed dir moved the quota boundary into
    # the partition carrying the NULL-id row. Multiple NULL-id rows in
    # one source tie at the tail on both engines, but their output
    # tuples are identical (NULL, source), so the kept SET is stable.
    win = W.partitionBy("source").orderBy(
        F.asc_nulls_last(F.md5(F.col("doc_id").cast("string"))),
        F.asc_nulls_last(F.col("doc_id")),
    )
    ranked = (
        d.join(F.broadcast(wts), "source")
        .select("doc_id", "source", "wt")
        .withColumn("rn", F.row_number().over(win))
    )
    return (
        ranked.crossJoin(F.broadcast(lim))
        .where(F.col("rn") <= F.expr("n_target * wt DIV w_all"))
        .select("doc_id", "source")
    )
