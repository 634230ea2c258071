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
