"""Behavioral invariants for round-7 entries (beyond oracle equality).

The oracle sweep proves Spark == DuckDB; these tests pin the SEMANTICS
both engines implement — a shared bug in both spellings would pass the
oracle but fail here.
"""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def test_span_dedup_removes_planted_boilerplate(spark):
    """The 13-token license header planted on every 5th doc must be
    removable everywhere except its single canonical occurrence."""
    from ecom_churn_lakehouse_spark.queries.dedup_queries import (
        _SPAN_BP,
        q_repeated_span_exact_dedup,
    )

    assert len(_SPAN_BP.split()) == 13
    rows = q_repeated_span_exact_dedup(spark, SF).collect()
    n_bp_docs = duckdb.connect().execute(
        f"SELECT COUNT(*) FROM '{SF}/documents.parquet' WHERE doc_id % 5 = 0"
    ).fetchone()[0]
    total_removable = sum(r["removable_tokens"] for r in rows)
    # every non-canonical boilerplate occurrence contributes >= 13
    # tokens of coverage (spans may extend further via natural repeats)
    assert total_removable >= 13 * (n_bp_docs - 1)
    total_affected = sum(r["affected_docs"] for r in rows)
    assert total_affected >= n_bp_docs - 1
    for r in rows:
        assert 0 <= r["removable_tokens"] <= r["total_tokens"]
        assert 0 <= r["removable_ppm"] <= 1_000_000


def test_span_dedup_island_union_no_double_count(spark):
    """Overlapping removable spans must union, not sum: a doc whose
    removable range is one contiguous boilerplate block can never
    report more removable tokens than it has."""
    from ecom_churn_lakehouse_spark.queries.dedup_queries import (
        q_repeated_span_exact_dedup,
    )

    rows = q_repeated_span_exact_dedup(spark, SF).collect()
    assert rows, "span dedup returned nothing at sf0.001"
    # ppm consistency: removable_ppm == removable*1e6 // total
    for r in rows:
        assert r["removable_ppm"] == r["removable_tokens"] * 1_000_000 // (
            r["total_tokens"]
        )


def test_keep_manifest_decision_precedence(spark):
    """Exact duplicates must be dropped as duplicates even when they
    are also boilerplate-heavy; every planted copy is non-canonical."""
    from ecom_churn_lakehouse_spark.queries.curation_queries import (
        q_curation_keep_manifest,
    )

    rows = {r["doc_id"]: r for r in q_curation_keep_manifest(spark, SF).collect()}
    n_docs = duckdb.connect().execute(
        f"SELECT COUNT(*) FROM '{SF}/documents.parquet'"
    ).fetchone()[0]
    copies = [d + 100000 for d in range(0, n_docs, 10)]
    assert copies, "no planted copies"
    for c in copies:
        assert rows[c]["decision"] == "exact_duplicate", (c, rows[c])
        # its original must NOT be dropped as a duplicate
        assert rows[c - 100000]["decision"] != "exact_duplicate"
    decisions = {r["decision"] for r in rows.values()}
    assert "keep" in decisions
    # every doc got exactly one row
    assert len(rows) == n_docs + len(copies)


def test_span_curve_monotone_in_length(spark):
    """Longer minimum spans can only remove fewer tokens."""
    from ecom_churn_lakehouse_spark.queries.dedup_queries import (
        q_span_dedup_savings_curve,
    )

    rows = sorted(
        q_span_dedup_savings_curve(spark, SF).collect(),
        key=lambda r: r["span_len"],
    )
    assert [r["span_len"] for r in rows] == [6, 8, 12]
    toks = [r["removable_tokens"] for r in rows]
    assert toks == sorted(toks, reverse=True), toks
    # the 13-token planted boilerplate is visible at every L <= 12
    assert all(t > 0 for t in toks)


def test_kanon_ladder_monotone(spark):
    """Coarser generalization can only grow the smallest group."""
    from ecom_churn_lakehouse_spark.queries.governance_queries import (
        q_kanon_generalization_ladder,
    )

    rows = sorted(
        q_kanon_generalization_ladder(spark, SF).collect(),
        key=lambda r: r["level"],
    )
    assert len(rows) == 4
    # group count shrinks (or holds) as the qid coarsens
    ng = [r["n_groups"] for r in rows]
    assert ng == sorted(ng, reverse=True), ng
    # suppression share shrinks as groups merge
    sup = [r["suppressed_ppm"] for r in rows]
    assert sup == sorted(sup, reverse=True), sup


def test_basket_rules_invariants(spark):
    """Confidence >= support, symmetric support, exact lift components."""
    from ecom_churn_lakehouse_spark.queries.retail_metrics_queries import (
        q_basket_rules_support_confidence,
    )

    rows = q_basket_rules_support_confidence(spark, SF).collect()
    assert rows, "no rules at sf0.001"
    for r in rows:
        assert r["confidence_ppm"] >= r["support_ppm"]
        assert r["cab"] <= min(r["cnt_a"], r["cnt_b"])
        assert r["positive_lift"] == (r["lift_num"] > r["lift_den"])
