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

__all__ = ["connected_components", "connected_components_pointer_jump"]


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


def connected_components_pointer_jump(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 40,
) -> DataFrame:
    """Min-label propagation accelerated by POINTER JUMPING — for
    graphs whose components are long chains, not near-cliques.

    Plain min-propagation needs O(diameter) rounds: a DBSCAN
    percolation cluster of k cores has diameter ~ sqrt(k), which blew
    past the plain operator's round budget at sf0.1 (394 mislabeled
    points — caught by the oracle, round 11). Each round here adds a
    second hop l(v) <- l(l(v)) after the neighbor-min step, so label
    values chase the component minimum along pointer chains and
    convergence drops to O(log diameter) rounds (the hash-to-min
    idea of Rastogi et al., "Finding Connected Components in
    Map-Reduce in Logarithmic Rounds", ICDE'13) — 2^40 effective
    reach at the default budget. Costs one extra hashed self-join
    per round; keep the plain operator for dup-cluster graphs where
    diameter ~ 2-3 makes the jump pure overhead.

    Iteration barrier: each round's label frame round-trips through a
    scratch PARQUET file, not localCheckpoint. Measured necessity,
    not style — chained self-joins of checkpoint-derived frames hit
    an exponential analyzer pathology in Spark 4.1 (~2.7x per round
    from round ~18, reproduced with a 1000-row frame; local AND
    reliable checkpoints both affected, fixed-right-side join chains
    and union/aggregate chains both flat — the trigger is joining a
    frame to a derivation of itself round after round, which the
    plain operator never does). A fresh parquet relation resets the
    attribute lineage completely; measured flat at 0.45 s/round
    through 30 rounds. On a real cluster this is the standard
    Pregel-style iteration barrier (HDFS/object-store temp table).

    Returns ``node``, ``label`` for every node appearing in
    ``edges`` (component minimum as label), like the plain operator.
    """
    from ecom_churn_lakehouse_spark.scratch import scratch_dir

    spark = edges.sparkSession
    base = scratch_dir(prefix="cc_pj_")
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    sym.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node")
    ).write.mode("overwrite").parquet(f"{base}/r")
    labels = spark.read.parquet(f"{base}/r")
    for i in range(max_iter):
        own = labels.select("node", "label", F.lit(True).alias("is_own"))
        nbr = sym.join(labels, sym["v"] == labels["node"]).select(
            F.col("u").alias("node"), "label", F.lit(False).alias("is_own")
        )
        m = (
            own.unionByName(nbr)
            .groupBy("node")
            .agg(
                F.min("label").alias("label"),
                F.min(F.when(F.col("is_own"), F.col("label"))).alias(
                    "__old"
                ),
            )
        )
        # pointer jump: follow the label's own (same-round) label —
        # doubles the resolved prefix of every min-pointer chain
        lmap = m.select(
            F.col("node").alias("__ln"), F.col("label").alias("__ll")
        )
        m.join(lmap, m["label"] == lmap["__ln"], "left").select(
            "node",
            F.coalesce(F.col("__ll"), F.col("label")).alias("label"),
            "__old",
        ).write.mode("overwrite").parquet(f"{base}/r{i}")
        new = spark.read.parquet(f"{base}/r{i}")
        labels = new.select("node", "label")
        if i > 0 and (
            new.filter(F.col("label") != F.col("__old")).limit(1).count()
            == 0
        ):
            break
    return labels
