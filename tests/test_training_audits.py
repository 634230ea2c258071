"""Golden properties of the training-set integrity audits and
pipeline diagnostics (queries/training_audit_queries.py,
queries/diagnostics_queries.py) — the invariants the oracle's
hash equality can't express directly: planted leaks ARE caught,
encodings shrink toward the prior, samples respect per-group k.
"""

from pyspark.sql import functions as F

from ecom_churn_lakehouse_spark.registry import queries

SF = "/root/testdata/sf0.001"


def test_split_leakage_audit_catches_planted_clones(spark):
    out = queries()["split_leakage_audit"](spark, SF).collect()
    # The derived corpus plants exact copies at doc_id+100000 with an
    # independent hash-split — some MUST straddle the boundary.
    assert len(out) > 0
    for r in out:
        assert r["n_copies"] >= 2
        populated = sum(
            1 for c in ("n_train", "n_val", "n_test") if r[c] > 0
        )
        assert populated >= 2  # straddles by construction
        assert r["n_train"] + r["n_val"] + r["n_test"] == r["n_copies"]


def test_group_kfold_balance_partitions_all_customers(spark):
    rows = queries()["group_kfold_balance"](spark, SF).collect()
    assert sorted(r["fold"] for r in rows) == [0, 1, 2, 3, 4]
    n_cust = (
        spark.read.parquet(f"{SF}/customer.parquet").count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert 0.0 <= r["repeat_rate"] <= 1.0
        assert r["n_repeat"] <= r["n_customers"]


def test_target_encoding_shrinks_toward_prior(spark):
    rows = queries()["target_encoding_brand"](spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    prior = li.agg(
        F.avg((F.col("l_returnflag") == "R").cast("double"))
    ).first()[0]
    for r in rows:
        lo, hi = sorted((r["raw_rate"], round(prior, 6)))
        # smoothed estimate lies between the raw rate and the prior
        assert lo - 1e-6 <= r["encoded_rate"] <= hi + 1e-6


def test_unigram_lm_scores_are_finite_and_cover_corpus(spark):
    rows = queries()["unigram_lm_doc_scores"](spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == n_docs
    for r in rows:
        assert r["avg_logprob"] < 0.0  # log of probabilities < 1
        assert r["n_tokens"] > 0


def test_semantic_dedup_finds_planted_exact_duplicates(spark):
    rows = queries()["semantic_dedup_pairs"](spark, SF).collect()
    # Planted exact copies (vec_id + 100000) are cosine-1.0 and land in
    # the same centroid cluster by construction — every one is found.
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    planted = {
        (r["vec_id"], r["vec_id"] + 100000)
        for r in emb.filter(F.col("vec_id") % 10 == 0).collect()
    }
    found = {(r["vec_a"], r["vec_b"]) for r in rows}
    assert planted <= found
    exact = {p: None for p in planted}
    for r in rows:
        if (r["vec_a"], r["vec_b"]) in exact:
            assert abs(r["cosine_sim"] - 1.0) < 1e-6


def test_per_nation_sample_respects_group_k_and_determinism(spark):
    q = queries()["per_nation_order_sample"]
    rows = q(spark, SF).collect()
    per_nation: dict[str, int] = {}
    for r in rows:
        per_nation[r["nation"]] = per_nation.get(r["nation"], 0) + 1
    assert max(per_nation.values()) <= 5
    # deterministic: a second independent plan returns the same sample
    assert sorted(map(tuple, rows)) == sorted(map(tuple, q(spark, SF).collect()))


def test_key_skew_profile_invariants(spark):
    for r in queries()["key_skew_profile"](spark, SF).collect():
        assert r["max_rows"] >= r["mean_rows"] >= 1.0
        assert r["skew_ratio"] >= 1.0
        assert r["suggested_salt"] >= 1
        assert r["n_rows"] >= r["n_keys"]


def test_psi_drift_terms_cover_bins(spark):
    rows = queries()["order_value_psi_drift"](spark, SF).collect()
    assert [r["bin"] for r in rows] == sorted({r["bin"] for r in rows})
    total_a = sum(r["share_a"] for r in rows)
    total_b = sum(r["share_b"] for r in rows)
    assert abs(total_a - 1.0) < 1e-3 and abs(total_b - 1.0) < 1e-3
    psi = sum(r["psi_term"] for r in rows)
    assert psi >= -1e-9  # PSI is a sum of non-negative terms (up to eps)


def test_boilerplate_detection_flags_planted_copies_only(spark):
    rows = queries()["boilerplate_paragraph_detection"](spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_docs"] >= 2


def test_interpolation_bounded_by_neighbors(spark):
    """Gap hours lie within [min(prev,next), max(prev,next)]; observed
    hours keep their own value."""
    rows = queries()["hourly_value_interpolated"](spark, SF).collect()
    by_series: dict[str, list] = {}
    for r in rows:
        by_series.setdefault(r["event_type"], []).append(r)
    for series in by_series.values():
        series.sort(key=lambda r: r["hour"])
        observed = [
            (i, r["value_interp_micros"])
            for i, r in enumerate(series)
            if r["is_observed"]
        ]
        assert observed, "every series has at least one observation"
        for i, r in enumerate(series):
            if r["is_observed"]:
                continue
            prev = max((o for o in observed if o[0] < i), default=None)
            nxt = min((o for o in observed if o[0] > i), default=None)
            assert prev or nxt
            vals = [o[1] for o in (prev, nxt) if o]
            assert min(vals) - 1 <= r["value_interp_micros"] <= max(vals) + 1


def test_cuped_preserves_grand_mean(spark):
    """The theta correction is mean-zero over the population, so the
    customer-weighted average of adjusted means equals the raw one."""
    rows = queries()["cuped_adjusted_spend"](spark, SF).collect()
    n = sum(r["n_customers"] for r in rows)
    raw = sum(r["mean_post"] * r["n_customers"] for r in rows) / n
    adj = sum(r["mean_post_adjusted"] * r["n_customers"] for r in rows) / n
    assert abs(raw - adj) < 1e-3


def test_hazard_table_conserves_population(spark):
    """Risk sets telescope: events + censored at t equal the drop in
    n_at_risk, and the first risk set is the whole labeled population."""
    rows = queries()["churn_hazard_table"](spark, SF).collect()
    rows.sort(key=lambda r: r["lifetime_days"])
    labels = queries()["churn_labels"](spark, SF).count()
    assert rows[0]["n_at_risk"] == labels
    for a, b in zip(rows, rows[1:]):
        assert (
            a["n_at_risk"] - a["n_churned"] - a["n_censored"]
            == b["n_at_risk"]
        )
    last = rows[-1]
    assert last["n_at_risk"] == last["n_churned"] + last["n_censored"]
