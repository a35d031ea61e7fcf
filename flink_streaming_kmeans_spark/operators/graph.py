"""Connected components over an edge list — the dedup-clustering core.

Min-label propagation as a driver loop of DataFrame joins (the
lloyd_iterate discipline: constant-size plans, localCheckpoint each
round so lineage never grows, rounds bounded by component diameter).
Near-dup graphs are short chains, so this converges in 2-3 rounds; at
100 TB swap in large-star/small-star contraction (Kiveris et al.,
"Connected Components in MapReduce and Beyond") — the same
join-per-round shape with quadratic diameter contraction.

Semantics: every node in ``nodes`` gets a row; its component label is
the MINIMUM node id reachable through ``edges`` (undirected).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_rounds: int = 50, star_after: int = 8
) -> DataFrame:
    """Label each node with the min node id in its component.

    nodes: one column ``id`` (distinct). edges: columns ``src, dst``
    (undirected — pass each pair once; both directions are derived).
    Returns (id, label) — one row per node in ``nodes``, exactly: an
    id appearing only in ``edges`` contributes its label to the
    component min but gets no output row (review r6: the propagation
    path used to leak such ids into the output while the star path
    did not, so the star_after handoff could change the ROW SET for
    the same input).

    Rounds needed = component diameter, so near-dup chains (diameter
    2-3) converge immediately — but a long-path graph (redirect chains,
    session graphs) would need diameter-many shuffles. Instead of
    failing at ``max_rounds``, after ``star_after`` unconverged rounds
    this hands off to :func:`connected_components_star`, whose O(log²n)
    round count is diameter-independent — the registered dedup path
    (q_dedup_cluster) therefore never dies on a pathological graph, it
    just switches algorithms. The ``star_after`` work is not wasted
    relative to scale: it is a constant prefix, and the common case
    (small diameter) never pays the star constant factor at all.
    """
    # eager=False everywhere (r13, guide §5): an eager localCheckpoint
    # is its own driver job; the lazy form materializes (and truncates
    # lineage) inside the FIRST job that reads it — here the per-round
    # convergence count, which computes every partition anyway. One
    # job per round + two setup jobs removed; same plans, same labels.
    both = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    labels = nodes.select("id", F.col("id").alias("label")).localCheckpoint(
        eager=False
    )
    for rnd in range(max_rounds):
        prop = both.join(
            labels.withColumnRenamed("id", "src"), "src"
        ).select(F.col("dst").alias("id"), "label")
        # The previous label rides through the SAME aggregation as an
        # ``own`` column (labels rows carry own=label, propagated rows
        # own=NULL; ids are unique in labels, so min(own) is exactly
        # the previous label and NULL marks an edge-only id). That
        # makes the convergence check a filter+count over the already-
        # checkpointed result instead of the extra join+shuffle per
        # round it used to be (r12 optimization: one shuffle and one
        # join removed per round; same labels, same changed-count —
        # min(label) <= own, so "!=" is exactly "<", and edge-only ids
        # were excluded by the old inner join just as own IS NULL
        # excludes them here).
        new_full = (
            labels.withColumn("own", F.col("label"))
            .union(
                prop.withColumn(
                    "own", F.lit(None).cast(labels.schema["label"].dataType)
                )
            )
            .groupBy("id")
            .agg(F.min("label").alias("label"), F.min("own").alias("own"))
            .localCheckpoint(eager=False)
        )
        changed = new_full.where(
            F.col("own").isNotNull() & (F.col("label") < F.col("own"))
        ).count()
        labels = new_full.select("id", "label")
        if changed == 0:
            # Restrict to the node set (row-set contract above).
            return labels.join(nodes.select("id"), "id", "left_semi")
        if rnd + 1 >= star_after:
            # High-diameter graph: switch to contraction.
            return connected_components_star(nodes, edges)
    raise RuntimeError(f"no convergence in {max_rounds} rounds")


def _canon(e: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (a, b) with a > b, no self
    loops, distinct."""
    return (
        e.where(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor v > u to min(N(u) ∪ {u})."""
    bidir = e.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    mins = bidir.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    return _canon(
        bidir.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges large→small; connect each smaller neighbor (and u
    itself) to u's minimum neighbor."""
    d = e.select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
    mins = d.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = d.join(mins, "u").where(F.col("v") != F.col("m")).select(
        F.col("v").alias("a"), F.col("m").alias("b")
    )
    selfs = mins.select(F.col("u").alias("a"), F.col("m").alias("b"))
    return _canon(nbrs.union(selfs))


def connected_components_star(
    nodes: DataFrame, edges: DataFrame, max_rounds: int = 25
) -> DataFrame:
    """Large-star/small-star contraction (Kiveris et al., "Connected
    Components in MapReduce and Beyond") — the 100 TB path for
    HIGH-DIAMETER graphs.

    Same (id, label=component min) contract as
    :func:`connected_components`, but converges in O(log² n) rounds
    regardless of diameter, where min-label propagation needs
    diameter-many rounds (a 1M-hop chain = 1M shuffles). Each round is
    two groupBy+join passes over the edge list; edges only get
    replaced, never multiplied, so the per-round shuffle stays O(|E|).
    Near-dup graphs are short chains (propagation wins on constants);
    use this variant when components can be long paths — session
    graphs, citation chains, URL redirect chains.
    """
    # eager=False: materialized by the first convergence count, same
    # as the propagation loop above (r13, guide §5).
    e = _canon(
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    ).localCheckpoint(eager=False)
    for _ in range(max_rounds):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=False)
        stable = (
            e2.count() == e.count()
            and e2.exceptAll(e).limit(1).count() == 0
        )
        e = e2
        if stable:
            break
    else:
        raise RuntimeError(f"no convergence in {max_rounds} rounds")
    # At the fixpoint every edge points directly at its component
    # minimum: (a=node, b=center). Centers and isolated nodes label
    # themselves.
    memb = e.groupBy(F.col("a").alias("id")).agg(F.min("b").alias("label"))
    return nodes.join(memb, "id", "left").select(
        "id", F.coalesce("label", F.col("id")).alias("label")
    )
