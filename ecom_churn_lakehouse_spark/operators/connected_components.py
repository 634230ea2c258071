"""Connected components over an edge list — dedup-cluster resolution.

Near-dup detection (MinHash/LSH, SimHash, embedding-LSH) emits *pairs*;
a curation pipeline needs *clusters* with one survivor each ("keep the
lowest doc_id of every duplicate group"). That grouping is connected
components on the pair graph.

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round every node takes the min of its own label and
its neighbors' labels; fixpoint = components labeled by their minimum
member. Rounds needed = graph diameter — and dup-cluster graphs are
near-cliques from a verify join (tiny diameter), so this converges in
2-3 rounds in practice. For adversarial long-chain graphs the
alternating large-star/small-star construction (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) drops rounds
to O(log d); min-propagation is chosen here because the dedup regime
makes the extra machinery pure overhead.

Scale shape per round: one join + one min-aggregate, both hashed on the
node key, so AQE co-partitions them onto one exchange. Labels are
``localCheckpoint``-ed each round — iterative plans otherwise grow a
lineage per iteration and re-execute the whole history every round.
The per-round convergence probe is a ``limit(1).count()`` scalar —
control plane, not a data-plane collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected pair graph with the minimum
    node id of its component. Returns columns ``node``, ``label``.

    Only nodes appearing in ``edges`` are labeled — singletons (docs
    with no near-dup) are by definition their own survivors and never
    enter the pair relation.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # The edge list joins into EVERY round — checkpoint it once or each
    # iteration replays the (possibly expensive) upstream pair pipeline.
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for i in range(max_iter):
        # The previous label rides through the union/aggregate (is_own
        # marks the node's own row), so convergence is read off the
        # aggregate itself — no extra compare-join per round.
        own = labels.select("node", "label", F.lit(True).alias("is_own"))
        nbr = sym.join(labels, sym["v"] == labels["node"]).select(
            F.col("u").alias("node"), "label", F.lit(False).alias("is_own")
        )
        new = (
            own.unionByName(nbr)
            .groupBy("node")
            .agg(
                F.min("label").alias("label"),
                F.min(F.when(F.col("is_own"), F.col("label"))).alias("__old"),
            )
            .localCheckpoint()
        )
        labels = new.select("node", "label")
        # Round 1 always changes something when any edge exists — probe
        # from round 2 on.
        if i > 0 and (
            new.filter(F.col("label") != F.col("__old")).limit(1).count() == 0
        ):
            break
    return labels
