"""Iterative graph operators: connected components for dedup clustering.

Pairwise near-dup matches (from the Jaccard / MinHash / embedding joins)
must be folded into clusters before survivorship ("keep one doc per
component") — transitive closure that no single join can express. This
is min-label propagation, the standard large-scale approach (GraphX/
Pregel shape) as plain DataFrame iterations:

- each node starts labeled with itself;
- every iteration, each node takes the min label among itself and its
  neighbors (one join + one groupBy per iteration);
- converges in O(diameter) iterations; each iteration is
  localCheckpoint'ed so the lineage (and thus the plan) stays flat.

The per-iteration driver loop with a convergence count is the idiomatic
Spark pattern for iterative algorithms — state lives in DataFrames, the
driver only steers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "da",
    dst: str = "db",
    max_iter: int = 20,
) -> DataFrame:
    """Cluster an undirected edge list into components.

    Returns (node, component) where component is the minimum node id in
    the component — a deterministic cluster representative, directly
    usable as the dedup keeper id.
    """
    fwd = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    edges = fwd.unionByName(
        fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_labels = (
            edges.join(labels, edges.v == labels.node)
            .select(F.col("u").alias("node"), "label")
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()  # flat lineage: plan size stays O(1) per iter
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))
