"""Distributed connected components: pair lists → duplicate clusters.

Near-dup detection (operators/dedup.py) emits PAIRS; a curation pipeline
needs CLUSTERS — the transitive closure — to keep one canonical doc per
duplicate group. This is min-label propagation:

- every vertex starts labeled with its own id;
- each round, a vertex takes the min of its own label and its
  neighbors' labels (one shuffle join on the edge list + one min-agg);
- converged when no label changed — every vertex then holds the min id
  reachable in its component, a deterministic canonical cluster id.

Rounds needed = graph diameter. Near-dup graphs are clique-ish (LSH
pairs within a duplicate group), so diameter is small — typically 2-4
rounds. For adversarial long-chain graphs, the star-contraction variant
(large-star/small-star, Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) converges in O(log n) rounds at ~2× the
per-round cost; the propagation loop below keeps the per-round plan
minimal and the result identical.

Scale notes:
- per round: one shuffle-join of labels onto the symmetrized edge list
  keyed by vertex + one partial-aggregated min — both AQE-skew-safe (a
  high-degree hub is an ordinary skewed join key);
- `localCheckpoint(eager=True)` after every round materializes the new
  labels and CUTS LINEAGE — without it the plan doubles per iteration
  and analysis time explodes (the classic iterative-algorithm footgun);
- the convergence probe (`count` of changed labels) runs on the
  checkpointed result, so it re-reads cached partitions, not the chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 25
) -> DataFrame:
    """Components of the undirected graph given by ``edges[src, dst]``.

    Returns one row per vertex: ``v`` (long) and ``component`` — the
    minimum vertex id in its connected component (deterministic, so two
    runs and the DuckDB recursive-CTE oracle agree exactly). Vertices
    are whatever ids appear in the edge list; isolated vertices (no
    edges) are the caller's to union in if needed.
    """
    e = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    )
    sym = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)  # scanned once per round — compute once
    )
    labels = sym.select(F.col("a").alias("v")).distinct().withColumn(
        "component", F.col("v")
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["v"])
            .groupBy("a")
            .agg(F.min("component").alias("nbr_min"))
        )
        new = (
            labels.join(nbr_min, labels["v"] == nbr_min["a"], "left")
            .select(
                labels["v"],
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        old = labels.select("v", F.col("component").alias("old_component"))
        # labels only ever decrease, so strict < is the full change test
        changed = new.join(old, "v").filter(
            F.col("component") < F.col("old_component")
        ).count()
        labels = new
        if changed == 0:
            break
    return labels
