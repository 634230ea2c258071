"""Entity-resolution capstone hand-checks (VERDICT r10 directive #4).

Recomputes the whole pipeline independently: union-find over the
match-band edge list must reproduce the Spark connected-components
labeling EXACTLY, survivorship must pick the max-balance/min-id member
per entity, and the clusters must track the anchor truth with high
precision (cluster-stability: the labeling is a function of the edge
set alone, not of iteration order).
"""

import pytest

from ecom_churn_lakehouse_spark.queries.analytics_queries import (
    _er_edges,
    _er_pairs,
    q_er_entity_clusters,
    q_er_golden_records,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def er(spark):
    edges = [
        (r["ca"], r["cb"]) for r in _er_edges(spark, SF_DIR).collect()
    ]
    clusters = {
        r["customer_id"]: r.asDict()
        for r in q_er_entity_clusters(spark, SF_DIR).collect()
    }
    golden = {
        r["entity_id"]: r.asDict()
        for r in q_er_golden_records(spark, SF_DIR).collect()
    }
    pairs = [r.asDict() for r in _er_pairs(spark, SF_DIR).collect()]
    return edges, clusters, golden, pairs


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # path-compress fully, then label every node by the component MIN
    comp: dict[int, list[int]] = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    label = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            label[n] = m
    return label


def test_clusters_equal_union_find_exactly(er):
    """Cluster stability: the Spark min-label CC result must be the
    pure function of the edge set that union-find computes — same
    entity id (component min) for every record, singletons included."""
    edges, clusters, _, _ = er
    nodes = set(clusters)
    want = _union_find(nodes, edges)
    got = {cid: row["entity_id"] for cid, row in clusters.items()}
    assert got == want
    # cluster_size is the exact member count of the entity
    from collections import Counter

    sizes = Counter(want.values())
    for cid, row in clusters.items():
        assert row["cluster_size"] == sizes[row["entity_id"]]
        assert row["is_canonical"] == int(cid == row["entity_id"])


def test_golden_records_are_max_balance_min_id_survivors(spark, er):
    """Survivorship: per entity the canonical record is the member
    with the highest bal_cents, record id breaking ties (the W1
    ordered-tie-break discipline at entity grain)."""
    from ecom_churn_lakehouse_spark.queries.analytics_queries import (
        _er_augmented,
    )

    edges, clusters, golden, _ = er
    recs = {
        r["c_custkey"]: r.asDict()
        for r in _er_augmented(spark, SF_DIR).collect()
    }
    by_entity: dict[int, list[int]] = {}
    for cid, row in clusters.items():
        by_entity.setdefault(row["entity_id"], []).append(cid)
    assert set(golden) == set(by_entity)
    for eid, members in by_entity.items():
        want = sorted(
            members, key=lambda c: (-recs[c]["bal_cents"], c)
        )[0]
        g = golden[eid]
        assert g["canonical_customer_id"] == want
        assert g["canonical_name"] == recs[want]["c_name"]
        assert g["canonical_nationkey"] == recs[want]["c_nationkey"]
        assert g["canonical_segment"] == recs[want]["c_mktsegment"]
        assert g["n_members"] == len(members)
        assert g["max_bal_cents"] == max(
            recs[c]["bal_cents"] for c in members
        )


def test_edges_track_anchor_truth(er):
    """The match-band edge set is high-precision against the planted
    anchor (nid equality) and recovers most true duplicate pairs —
    the reason the 5th (contact-identifier) field exists."""
    edges, _, _, pairs = er
    truth = {
        (p["customer_a"], p["customer_b"]): p["is_match"] for p in pairs
    }
    assert edges
    n_true = sum(truth[e] for e in edges)
    precision = n_true / len(edges)
    recall = n_true / sum(truth.values())
    assert precision >= 0.85, precision
    assert recall >= 0.65, recall


def test_merged_entities_contain_their_anchor_pairs(er):
    """Every edge's endpoints share an entity (the closure actually
    closed), and no entity mixes more than a bounded handful of
    records (no mega-cluster collapse)."""
    edges, clusters, _, _ = er
    for u, v in edges:
        assert clusters[u]["entity_id"] == clusters[v]["entity_id"]
    assert max(r["cluster_size"] for r in clusters.values()) <= 5


# --------------- streaming ER maintenance (VERDICT r11 directive #5)


def _stage_er_stream(spark, tmp_path, waves):
    """Manually drive _er_stream_apply_batch over the given arrival
    waves (predicates over c_custkey) and return the serve base."""
    from pyspark.sql import functions as F

    from ecom_churn_lakehouse_spark.queries.analytics_queries import (
        _er_augmented,
        _er_odds_frame,
        _er_pairs,
        _er_stream_apply_batch,
    )

    base = str(tmp_path / "er_state")
    pairs = _er_pairs(spark, SF_DIR).localCheckpoint(eager=False)
    _er_odds_frame(pairs).write.mode("overwrite").parquet(f"{base}/odds")
    aug = _er_augmented(spark, SF_DIR)
    for i, pred in enumerate(waves):
        _er_stream_apply_batch(spark, base, aug.filter(pred(F)), i)
    return base


def _golden_key(rows):
    return sorted(tuple(sorted(r.asDict().items())) for r in rows)


def test_stream_er_converges_to_batch_regardless_of_boundaries(
    spark, tmp_path
):
    """The served golden records must be BIT-EQUAL to the batch
    capstone — for one-wave arrival AND for three-wave arrival where
    each record's duplicate copy lands in a different wave than its
    original (cross-batch entity merges)."""
    from ecom_churn_lakehouse_spark.queries.analytics_queries import (
        _er_serve_golden,
    )

    batch = _golden_key(q_er_golden_records(spark, SF_DIR).collect())

    one = _stage_er_stream(
        spark, tmp_path / "one", [lambda F: F.lit(True)]
    )
    assert _golden_key(_er_serve_golden(spark, one).collect()) == batch

    three = _stage_er_stream(
        spark,
        tmp_path / "three",
        [lambda F, m=m: F.col("c_custkey") % 3 == m for m in (0, 1, 2)],
    )
    assert _golden_key(_er_serve_golden(spark, three).collect()) == batch


def test_stream_er_replay_is_idempotent(spark, tmp_path):
    """Replaying a foreachBatch step (same batch_id) must neither
    rewrite the batch-keyed partials nor change the served golden
    records — and the edge store must hold each pair exactly once
    (later-endpoint discovery)."""
    import os

    from pyspark.sql import functions as F

    from ecom_churn_lakehouse_spark.queries.analytics_queries import (
        _er_augmented,
        _er_serve_golden,
        _er_stream_apply_batch,
    )

    base = _stage_er_stream(
        spark,
        tmp_path,
        [lambda F, m=m: F.col("c_custkey") % 3 == m for m in (0, 1)],
    )
    first = _golden_key(_er_serve_golden(spark, base).collect())

    def _sig(sub):
        root = os.path.join(base, sub)
        return sorted(
            (os.path.join(r, f), os.path.getmtime(os.path.join(r, f)))
            for r, _, fs in os.walk(root)
            for f in fs
        )

    before = {s: _sig(s) for s in ("recs", "edges")}
    aug = _er_augmented(spark, SF_DIR)
    _er_stream_apply_batch(
        spark, base, aug.filter(F.col("c_custkey") % 3 == 1), 1
    )
    assert {s: _sig(s) for s in ("recs", "edges")} == before
    assert _golden_key(_er_serve_golden(spark, base).collect()) == first

    edges = spark.read.parquet(f"{base}/edges")
    assert edges.count() == edges.select("ca", "cb").distinct().count() > 0
