"""Property tests for the curation queries (sequence packing,
repetition scoring, PII scrubbing) — invariants the value-hash oracle
can't express, checked at sf0.001.
"""

from __future__ import annotations

from ecom_churn_lakehouse_spark.registry import queries

SF = "/root/testdata/sf0.001"


def test_sequence_packing_matches_naive_greedy(spark):
    """Bin assignment must equal a serial greedy fill per source."""
    import duckdb

    budget = 512
    docs = duckdb.sql(
        f"""
        SELECT source, doc_id,
               length(regexp_extract_all(text, '\\S+')) AS n_tokens
        FROM '{SF}/documents.parquet' ORDER BY source, doc_id
        """
    ).fetchall()
    expected: dict[tuple[str, int], list[int]] = {}
    cum: dict[str, int] = {}
    for source, _doc_id, n in docs:
        prior = cum.get(source, 0)
        expected.setdefault((source, prior // budget), []).append(n)
        cum[source] = prior + n

    got = {
        (r.source, r.bin_id): (r.n_docs, r.bin_tokens)
        for r in queries()["doc_sequence_packing"](spark, SF).collect()
    }
    assert got == {
        k: (len(v), sum(v)) for k, v in expected.items()
    }


def test_sequence_packing_bins_are_dense_per_source(spark):
    """Bins 0..max must all be occupied — contiguous fill leaves no gaps."""
    rows = queries()["doc_sequence_packing"](spark, SF).collect()
    by_source: dict[str, set[int]] = {}
    for r in rows:
        by_source.setdefault(r.source, set()).add(r.bin_id)
    for source, bins in by_source.items():
        assert bins == set(range(max(bins) + 1)), source


def test_repetition_ratio_bounds_and_extremes(spark):
    from pyspark.sql import Row

    from ecom_churn_lakehouse_spark.queries.curation_queries import (
        q_doc_repetition,
    )

    rows = queries()["doc_repetition"](spark, SF).collect()
    assert rows, "non-empty corpus must produce scores"
    for r in rows:
        assert 0.0 <= r.repetition_ratio < 1.0
        assert r.n_distinct_trigrams <= r.n_trigrams

    # Degenerate docs pin the extremes: a pure loop repeats every
    # trigram after the first; an all-unique doc repeats none.
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [
                Row(doc_id=1, text="spam " * 50),
                Row(doc_id=2, text=" ".join(f"w{i}" for i in range(50))),
                Row(doc_id=3, text="too short"),
            ]
        ).write.parquet(os.path.join(d, "documents.parquet"))
        scored = {
            r.doc_id: r for r in q_doc_repetition(spark, d).collect()
        }
        assert scored[1].n_distinct_trigrams == 1
        assert scored[1].repetition_ratio > 0.97
        assert scored[2].repetition_ratio == 0.0
        assert 3 not in scored  # < 3 tokens: no trigrams, no row


def test_pii_scrub_leaves_no_residual(spark):
    rows = queries()["pii_scrub_audit"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_emails == 1 and r.n_phones == 1
        assert r.residual_pii == 0
        assert "[EMAIL]" in r.redacted_text and "[PHONE]" in r.redacted_text
        assert "@" not in r.redacted_text


def test_mixture_resample_hits_target_blend(spark):
    from ecom_churn_lakehouse_spark.queries.curation_queries import (
        q_source_mixture_resample,
    )

    rows = q_source_mixture_resample(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["n_kept"] <= r["n_available"]
    # kept counts are proportional to weights within floor rounding:
    # n_kept = w_s * T // W for a single global T
    by_w = {}
    for r in rows:
        by_w.setdefault(r["target_weight"], set()).add(r["n_kept"])
    for kept_set in by_w.values():
        assert len(kept_set) == 1  # same weight -> same quota
    if len(by_w) == 2:
        k3, k1 = min(by_w[3]), min(by_w[1])
        assert k1 * 3 - 3 <= k3 <= k1 * 3  # 3:1 within floor slack
