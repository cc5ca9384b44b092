"""Distributed connected components via iterative min-label propagation.

Used to turn near-duplicate *pairs* (LSH output) into duplicate
*clusters*: every document gets the minimum doc_id reachable through the
similarity graph as its component/canonical id.

Scale notes: each iteration is one shuffle (join on src + groupBy min),
and the iteration count is the graph diameter — near-dup graphs are
overwhelmingly tiny cliques, so this converges in 2-4 rounds.
``localCheckpoint`` truncates the lineage each round so plans don't grow
unboundedly. For adversarially-long chain graphs the classic
large-star/small-star variant halves the diameter per round; not needed
for dedup-shaped graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (node, component) with component = min node id reachable.

    ``nodes``: one row per vertex (isolated vertices become their own
    singleton component). ``edges``: undirected pairs (either
    orientation; both directions are added internally).
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
    )
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("label")
    ).localCheckpoint(eager=True)

    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    changed = 0
    for _ in range(max_iter):
        # A node's new label: min of its own and all neighbours' labels.
        nbr = labels.join(e, labels.node == e.src).select(
            F.col("dst").alias("node"), F.col("label")
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # Exiting here would hand back silently-wrong labels for any
        # graph whose diameter exceeds max_iter.
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "iterations (graph diameter too large for min-label propagation); "
            "raise max_iter or use a large-star/small-star variant"
        )
    return labels.select("node", F.col("label").alias("component"))
