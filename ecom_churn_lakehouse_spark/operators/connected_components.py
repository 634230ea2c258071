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
2-3 rounds in practice.

REGIME SELECTION (read this before picking an operator): use
``connected_components`` ONLY for near-clique duplicate graphs
(LSH/MinHash verify output, where every cluster member saw most
others). For long-chain or percolation graphs — DBSCAN core graphs,
kNN graphs, anything where edges come from a *radius* rather than a
*verified duplicate* relation — use ``connected_components_star``:
round 11 proved min-propagation O(diameter) there (394 mislabeled
points at sf0.1 before the loud ``max_iter`` failure existed), and
pointer jumping does NOT rescue it (measured O(diameter)-in-disguise
on random-id blobs; see the star operator's docstring, which also
documents the Spark 4.1 chained-self-join analyzer pathology its
parquet iteration barrier sidesteps). Both operators now raise at
``max_iter`` instead of returning a silent partial labeling.

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

__all__ = ["connected_components", "connected_components_star"]


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
            return labels
    # A silent partial labeling is exactly the defect the round-11
    # oracle caught (394 mislabeled DBSCAN points at a 25-round
    # budget): fail LOUDLY instead of returning wrong components.
    # Near-clique dup graphs converge in 2-3 rounds; hitting this
    # means the caller's graph has long chains and needs
    # connected_components_star.
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_iter} rounds — "
        "graph diameter exceeds the min-propagation budget; use "
        "connected_components_star for long-chain graphs"
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 60,
) -> DataFrame:
    """Alternating large-star/small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — for
    graphs whose components are long chains or percolation blobs,
    not near-cliques.

    Why not min-propagation: plain propagation needs O(diameter)
    rounds — a DBSCAN percolation cluster of k cores has diameter
    ~ sqrt(k), which blew past the plain operator's round budget at
    sf0.1 (394 mislabeled points, caught by the oracle in round 11).
    Why not pointer jumping: the l(v) <- l(l(v)) accelerant is only
    O(log d) when label-pointer chains align with the direction of
    the component minimum (sorted-id paths). On REAL percolation
    blobs with random id placement the chains zig-zag and the jump
    buys nothing — measured 25 rounds on the sf0.1 DBSCAN core graph
    with 1, 3, or 5 jumps per round alike (identical labels, rounds
    unchanged), i.e. O(diameter) in disguise. Star contraction
    instead rewrites the EDGE SET: large-star hangs every neighbor
    v > u onto m = min(N(u) ∪ u); small-star (on the u > v canonical
    orientation) hangs the not-larger neighbors and u itself onto m.
    Both steps link only toward smaller ids, preserve connectivity,
    and contract each component toward a star centered at its
    MINIMUM id — the same graph converged in 6 rounds (vs 25), and
    the graph SHRINKS as it contracts, so per-round shuffle volume
    falls instead of staying flat. Convergence is detected exactly:
    row count equal (free off parquet metadata) AND
    ``exceptAll(prev)`` empty — never a hash fingerprint.

    Iteration barrier: each round's edge frame round-trips through a
    scratch PARQUET file, not localCheckpoint. Measured necessity,
    not style — chained self-joins of checkpoint-derived frames hit
    an exponential analyzer pathology in Spark 4.1 (~2.7x per round
    from round ~18, reproduced with a 1000-row frame; local AND
    reliable checkpoints both affected, fixed-right-side join chains
    and union/aggregate chains both flat — the trigger is joining a
    frame to a derivation of itself round after round, which the
    plain operator never does). A fresh parquet relation resets the
    attribute lineage completely. On a real cluster this is the
    standard Pregel-style iteration barrier (HDFS/object-store temp
    table).

    Returns ``node``, ``label`` for every node appearing in
    ``edges`` (component minimum as label), like the plain operator.
    """
    from ecom_churn_lakehouse_spark.scratch import scratch_dir

    spark = edges.sparkSession
    base = scratch_dir(prefix="cc_star_")
    # ONE execution of the (possibly expensive) upstream edge pipeline:
    # barrier the raw frame to parquet first, then derive both the node
    # set and the canonical edge set from that relation. The r12
    # measurement showed the previous shape (eager node-set checkpoint
    # + separate canonical-edge write) executing the caller's whole
    # candidate pipeline twice (guide §1.2: don't recompute what you
    # already have; the write is the same iteration barrier the loop
    # already relies on).
    edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).write.mode(
        "overwrite"
    ).parquet(f"{base}/raw")
    raw = spark.read.parquet(f"{base}/raw")
    # Node set from the UNFILTERED edge frame (r11 ADVICE): a node
    # whose only edges are self-loops must still appear in the output
    # (self-labeled via the left-anti roots branch), matching both the
    # docstring contract and the plain operator.
    nodes = (
        raw.select(F.col("a").alias("node"))
        .unionByName(raw.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    e0 = raw.filter("a != b")
    cur = e0.select(
        F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
    ).distinct()
    cur.write.mode("overwrite").parquet(f"{base}/e")
    edge_schema = "u BIGINT, v BIGINT"
    cur = spark.read.schema(edge_schema).parquet(f"{base}/e")
    n_cur = cur.count()

    def _one_round(edges_in):
        # ---- large-star over the symmetric view: for each u with
        # m = min(N(u) ∪ u), every neighbor v > u re-hangs onto m.
        sym = edges_in.select("u", "v").unionByName(
            edges_in.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("u", "mv").alias("m"))
        )
        ls = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .filter("a != b")
            .select(
                F.greatest("a", "b").alias("u"),
                F.least("a", "b").alias("v"),
            )
            .distinct()
        )
        # ---- small-star on the canonical u > v orientation: u and
        # its not-larger neighbors all re-hang onto m = min of them.
        sm = ls.groupBy("u").agg(F.min("v").alias("m"))
        return (
            ls.join(sm, "u")
            .select(F.col("v").alias("w"), "m")
            .unionByName(sm.select(F.col("u").alias("w"), "m"))
            .filter(F.col("w") != F.col("m"))
            .select(
                F.greatest("w", "m").alias("u"),
                F.least("w", "m").alias("v"),
            )
            .distinct()
        )

    # One contraction round per parquet barrier. (Measured, not
    # assumed: fusing TWO rounds per barrier was tried in r12 after
    # the event-log breakdown showed ~60% of dbscan's wall in
    # inter-job driver gaps — it made things WORSE (112 jobs vs 101,
    # +20% wall): AQE submits every shuffle stage as its own job, so
    # fusing does not reduce the job count, it only doubles the plan
    # each barrier re-optimizes. Each barrier read supplies the edge
    # schema explicitly so no inference job runs.)
    for i in range(max_iter):
        nxt = _one_round(cur)
        nxt.write.mode("overwrite").parquet(f"{base}/e{i}")
        nxt = spark.read.schema(edge_schema).parquet(f"{base}/e{i}")
        n_nxt = nxt.count()  # parquet footer metadata — no scan
        done = (
            n_nxt == n_cur
            and nxt.exceptAll(cur).limit(1).count() == 0
        )
        cur, n_cur = nxt, n_nxt
        if done:
            break
    else:
        # Same loud-failure discipline as the plain operator: a
        # partial contraction is a wrong labeling, never return it.
        raise RuntimeError(
            f"connected_components_star: no fixpoint after {max_iter} "
            "rounds — raise max_iter (Kiveris contraction needs "
            "O(log^2 n) rounds worst-case, ~2 log n in practice)"
        )
    # Fixpoint is a star forest centered at component minima: every
    # non-root keeps exactly one (node, center) edge; roots (and any
    # would-be singletons) label themselves.
    lab = cur.select(F.col("u").alias("node"), F.col("v").alias("label"))
    roots = nodes.join(lab, "node", "left_anti").withColumn(
        "label", F.col("node")
    )
    return lab.unionByName(roots)
