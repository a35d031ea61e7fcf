"""MinHash + LSH near-duplicate detection — the 100 TB dedup path.

q_dedup_near (plans/llm.py) is the exact shingle-join formulation: its
cost is Σ|bucket|² over shingle buckets, which goes quadratic on hot
shingles at corpus scale. The scale path replaces the raw-shingle join
with an LSH-banded join: hash each document's shingle SET to a short
MinHash signature, band the signature, and equi-join on (band-index,
band-hash) — candidate pairs are then verified exactly. The join key
cardinality is controlled by the signature/band geometry instead of by
the data's shingle distribution, so the plan stays a plain shuffled
equi-join at any corpus size.

Implementation uses pyspark.ml.feature.MinHashLSH (seed fixed) over
HashingTF'd shingle sets; tests/test_minhash_lsh.py checks recall
>= 0.9 against the exact q_dedup_near pairs at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def ngram_rows(
    docs: DataFrame,
    n: int,
    out_col: str = "s",
    keep_cols: tuple = ("doc_id",),
    distinct: bool = True,
) -> DataFrame:
    """One row per token-n-gram of ``text`` — THE canonical n-gram
    construction (codegen posexplode + element_at; see q_dedup_near's
    docstring for why not transform(sequence(...), λ)). The 1-based
    element_at offset pairs with the 0-based posexplode index: token
    k of the gram starting at pos is element_at(w, pos + k + 1), and
    the ``pos <= size(w) - n`` guard keeps the last gram in bounds —
    an off-by-one pair that was re-risked at every copy-paste before
    this helper unified the bigram callers with shingle_rows
    (review r6)."""
    toks = docs.select(
        *keep_cols, F.split("text", " ").alias("w")
    ).where(F.size("w") >= n)
    out = (
        toks.select(*keep_cols, "w", F.posexplode("w").alias("pos", "t0"))
        .where(F.col("pos") <= F.size("w") - n)
        .select(
            *keep_cols,
            F.concat_ws(
                " ",
                "t0",
                *[
                    F.element_at("w", F.col("pos") + k)
                    for k in range(2, n + 1)
                ],
            ).alias(out_col),
        )
    )
    if distinct:
        out = out.dropDuplicates([*keep_cols, out_col])
    return out


def shingle_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, s) — one row per DISTINCT token-3-gram per document.

    THE canonical shingle definition: q_dedup_near, q_dedup_cluster,
    q_dedup_lsh (plans/llm.py) and the MinHashLSH path below all build
    on this one construction, so the exact oracle and every
    approximate variant can never silently diverge on what a shingle
    is."""
    return ngram_rows(docs, 3)


def shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, shingles array<string>, ns) — collected form of
    :func:`shingle_rows` for the MinHashLSH vectorizer."""
    return shingle_rows(docs).groupBy("doc_id").agg(
        F.collect_list("s").alias("shingles"), F.count(F.lit(1)).alias("ns")
    )


def near_dup_candidates_lsh(
    docs: DataFrame,
    threshold: float = 0.8,
    num_hash_tables: int = 16,
    num_features: int = 1 << 18,
) -> DataFrame:
    """Approximate near-dup pairs via MinHashLSH.

    Returns (doc_id1, doc_id2, jaccard_est) for candidate pairs whose
    MinHash-estimated Jaccard >= threshold (doc_id1 < doc_id2).
    jaccard_est is 1 - MinHashLSH's jaccard distance on the hashed
    shingle sets (HashingTF bucketing can merge shingles, so this is
    an estimate — verify candidates exactly downstream at scale)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = shingle_sets(docs)
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=num_features
    )
    feats = tf.transform(sh)
    lsh = MinHashLSH(
        inputCol="features",
        outputCol="hashes",
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, 1.0 - threshold, distCol="jdist"
    )
    return (
        joined.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_id1"),
            F.col("datasetB.doc_id").alias("doc_id2"),
            (1.0 - F.col("jdist")).alias("jaccard_est"),
        )
    )
