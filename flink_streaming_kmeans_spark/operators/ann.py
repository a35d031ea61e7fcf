"""Multi-table random-hyperplane LSH ANN — the recall lever over the
single-table q_sim_ann (plans/textops.py).

q_sim_ann keys candidates on ONE 8-bit signed-projection signature:
cheap, deterministic, oracle-verifiable — but a true neighbor that
disagrees on any one of the 8 bits is lost. The standard fix is L
independent hash tables: a vector lands in L buckets, probes collect
the union of same-bucket candidates from every table, and the exact
re-rank dedupes. P(candidate) = 1-(1-p^b)^L rises quickly with L at
high cosine similarity, so recall is tunable without touching the
plan shape — the candidate step stays an equi-join on
(table, bucket), one shuffle whose key cardinality is L x 2^b,
independent of corpus size.

Table 0 reuses exactly q_sim_ann's hyperplanes (same LCG stream
index h*64+d with h=0..7), so the multi-table candidate set is a
SUPERSET of the single-table one by construction — recall can only
go up. tests/test_ann.py asserts both the superset property and
absolute recall against the exact brute-force top-k.

Test-tier (no SQL oracle): recall is a statistical property, not a
row-level parity one; the exact re-rank is cosine built from the same
dot64/l2_norm folds q_sim_knn scores with (see :func:`_cosine` for why
raw dot would be wrong here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.vector import dot64, l2_norm


def _cosine(a: str, b: str):
    """Cosine re-rank metric. NOT raw dot64: hyperplane LSH buckets by
    ANGLE, so the re-rank must rank by angle too — on a non-normalized
    corpus a high-norm far-away vector out-dots a same-direction near
    neighbor (caught by the skewed-cluster fixture in tests/test_ann.py,
    where ‖background‖≈8 drowned cosine-0.9998 planted pairs). Cost is
    two extra codegen folds per candidate; scored pairs remain
    deterministic, ties broken on neighbor_id as before."""
    return dot64(a, b) / (l2_norm(a) * l2_norm(b))

# Same Rademacher-from-LCG hyperplane stream as q_sim_ann: sign of
# component d of hyperplane h is LCG(h*dim+d) % 2, where dim is the
# embedding width (the STREAM STRIDE — hardcoding 64 made hyperplane
# h's component 64 collide with hyperplane h+1's component 0 on any
# wider corpus, silently correlating consecutive hyperplanes and
# degrading recall; review r6).
# Bit 16, not bit 0: an LCG's low bit has period 2 in the stream
# index, and h*dim+d steps the index by an even stride across h — the
# parity bit would make every hyperplane identical (verified: recall
# flat in L). The high bit mixes through carries and is balanced.
def _sign_expr(dim: int) -> str:
    return (
        f"CASE WHEN (((1103515245 * (CAST(h AS BIGINT) * {dim} + d)"
        " + 12345) % 2147483648) div 65536) % 2 = 0"
        " THEN 1.0 ELSE -1.0 END"
    )


def lsh_buckets(
    e: DataFrame, n_tables: int = 4, n_bits: int = 8, dim: int = 64
) -> DataFrame:
    """(vec_id, table, bucket): one bucket id per vector per table.

    Hyperplane h = table*n_bits + j draws its signs from the shared
    LCG stream, so (n_tables=1, n_bits=8, dim=64) reproduces
    q_sim_ann's buckets exactly. ``dim`` must equal the embedding
    width — it is the hyperplane stream stride; a mismatched row
    raises in-engine rather than silently correlating hyperplanes
    (review r6)."""
    hs = e.sparkSession.range(n_tables * n_bits).select(
        F.col("id").cast("int").alias("h")
    )
    checked = e.where(
        F.expr(
            f"CASE WHEN size(embedding) = {dim} THEN TRUE"
            f" ELSE raise_error(concat('lsh_buckets: dim={dim} but"
            " embedding width is ', CAST(size(embedding) AS STRING)))"
            " END"
        )
    )
    proj = (
        checked.select("vec_id", F.posexplode("embedding").alias("d", "x"))
        .crossJoin(F.broadcast(hs))
        .select(
            "vec_id",
            "h",
            (F.expr(_sign_expr(dim)) * F.col("x").cast("double")).alias("c"),
        )
    )
    bits = proj.groupBy("vec_id", "h").agg(
        (F.sum("c") > 0).cast("long").alias("bit")
    )
    return (
        bits.select(
            "vec_id",
            (F.col("h") / n_bits).cast("int").alias("table"),
            F.expr(f"shiftleft(bit, h % {n_bits})").alias("piece"),
        )
        .groupBy("vec_id", "table")
        .agg(F.sum("piece").cast("bigint").alias("bucket"))
    )


def _bucket_search(e, b, probes, k, n_probes):
    """Shared candidate-join + exact cosine re-rank: same-bucket
    candidates per (table, bucket) probe row, exact re-rank,
    deterministic tie-break on neighbor_id. ONE audited copy — the
    single-probe and multi-probe entry points previously duplicated
    this block verbatim, a drift hazard for any re-rank change
    (review r6)."""
    cand_ids = (
        F.broadcast(probes)
        .join(b.withColumnRenamed("vec_id", "neighbor_id"), ["table", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qemb = e.where(F.col("vec_id") < n_probes).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb")
    )
    cands = (
        cand_ids.join(
            e.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
            "neighbor_id",
        )
        .join(F.broadcast(qemb), "query_id")
        .select("query_id", "neighbor_id", _cosine("embedding", "qemb").alias("sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return cands.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)


def ann_topk(
    e: DataFrame,
    n_tables: int = 4,
    n_bits: int = 8,
    k: int = 3,
    n_probes: int = 10,
) -> DataFrame:
    """Approximate top-k cosine neighbors for probe vectors
    (vec_id < n_probes): union of same-bucket candidates over all
    tables, exact dot64 re-rank, deterministic tie-break on
    neighbor_id. Returns (query_id, neighbor_id, sim, rn<=k)."""
    b = lsh_buckets(e, n_tables, n_bits)
    probes = b.where(F.col("vec_id") < n_probes).select(
        F.col("vec_id").alias("query_id"), "table", "bucket"
    )
    return _bucket_search(e, b, probes, k, n_probes)


def ann_topk_multiprobe(
    e: DataFrame,
    n_tables: int = 4,
    n_bits: int = 8,
    k: int = 3,
    n_probes: int = 10,
) -> DataFrame:
    """Multi-probe variant of :func:`ann_topk`: each probe also
    searches the n_bits buckets at Hamming distance 1 from its own
    signature (flip one bit), per table. Near-misses — a true
    neighbor disagreeing on exactly one hyperplane — are recovered
    without adding tables, trading k+1 probe rows (tiny side) for L×
    memory. Candidates remain an equi-join on (table, bucket); the
    fact side is untouched, so the probe fan-out is the ONLY cost —
    the standard recall/memory lever when table count is capped.
    Candidate set ⊇ :func:`ann_topk`'s by construction (flip 0 = the
    original bucket)."""
    b = lsh_buckets(e, n_tables, n_bits)
    flips = e.sparkSession.range(n_bits + 1).select(
        F.col("id").cast("int").alias("flip")
    )
    probes = (
        b.where(F.col("vec_id") < n_probes)
        .crossJoin(F.broadcast(flips))
        .select(
            F.col("vec_id").alias("query_id"),
            "table",
            # flip=0 → original bucket; flip=j → bit j-1 flipped
            F.when(F.col("flip") == 0, F.col("bucket"))
            .otherwise(
                F.expr("bucket ^ shiftleft(CAST(1 AS BIGINT), flip - 1)")
            )
            .alias("bucket"),
        )
    )
    return _bucket_search(e, b, probes, k, n_probes)
