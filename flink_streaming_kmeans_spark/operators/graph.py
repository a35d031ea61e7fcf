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
    nodes: DataFrame, edges: DataFrame, max_rounds: int = 50
) -> DataFrame:
    """Label each node with the min node id in its component.

    nodes: one column ``id`` (distinct). edges: columns ``src, dst``
    (undirected — pass each pair once; both directions are derived).
    Returns (id, label).
    """
    both = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    labels = nodes.select("id", F.col("id").alias("label")).localCheckpoint()
    for _ in range(max_rounds):
        prop = both.join(
            labels.withColumnRenamed("id", "src"), "src"
        ).select(F.col("dst").alias("id"), "label")
        new_labels = (
            labels.union(prop)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"no convergence in {max_rounds} rounds")
