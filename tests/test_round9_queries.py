"""Round-9 regression tests: streaming SemDeDup graph-state
maintenance (stream == batch, replay safety) and the r8 ADVICE
OCC hardening is covered in test_managed_table.py."""

import os

SF = "/root/testdata/sf0.001"


def test_stream_semdedup_equals_batch(spark):
    """The incrementally-maintained pair store must converge to the
    one-shot batch manifest bit-exactly, regardless of arrival
    batching."""
    from ecom_churn_lakehouse_spark.queries.hashing_queries import (
        q_semdedup_keep_manifest,
        q_stream_semdedup_maintenance,
    )

    batch = [
        r.asDict() for r in q_semdedup_keep_manifest(spark, SF).collect()
    ]
    stream = [
        r.asDict()
        for r in q_stream_semdedup_maintenance(spark, SF).collect()
    ]
    assert stream == batch
    assert batch  # non-vacuous


def test_semdedup_apply_batch_is_replay_safe(spark, tmp_path):
    """Replaying a foreachBatch step (same batch_id) must neither
    rewrite the batch_id-keyed partials nor change the served
    manifest — the idempotent keyed-upsert publish discipline."""
    from pyspark.sql import functions as F

    from ecom_churn_lakehouse_spark.queries.hashing_queries import (
        _adaptive_band_bits,
        _semdedup_apply_batch,
        _semdedup_serve_manifest,
    )
    from ecom_churn_lakehouse_spark.sources import load_table

    base = str(tmp_path / "state")
    emb = load_table(spark, SF, "embeddings")
    bb = _adaptive_band_bits(emb.count())  # frozen index geometry
    b0 = emb.filter(F.col("vec_id") % 2 == 0)
    b1 = emb.filter(F.col("vec_id") % 2 == 1)
    _semdedup_apply_batch(spark, base, b0, 0, bb)
    _semdedup_apply_batch(spark, base, b1, 1, bb)
    first = [r.asDict() for r in _semdedup_serve_manifest(spark, base).collect()]

    def _sig(sub):
        root = os.path.join(base, sub)
        return sorted(
            (os.path.join(r, f), os.path.getmtime(os.path.join(r, f)))
            for r, _, fs in os.walk(root)
            for f in fs
        )

    before = {s: _sig(s) for s in ("bands", "vecs", "pairs")}
    # replay batch 1 (crash-recovery rerun): partials must be skipped
    _semdedup_apply_batch(spark, base, b1, 1, bb)
    after = {s: _sig(s) for s in ("bands", "vecs", "pairs")}
    assert after == before
    again = [r.asDict() for r in _semdedup_serve_manifest(spark, base).collect()]
    assert again == first


def test_semdedup_pair_discovery_is_exactly_once(spark, tmp_path):
    """Each unordered colliding pair is discovered by exactly the
    batch of its LATER endpoint — the pair store holds no duplicates
    across batches."""
    from pyspark.sql import functions as F

    from ecom_churn_lakehouse_spark.queries.hashing_queries import (
        _adaptive_band_bits,
        _semdedup_apply_batch,
    )
    from ecom_churn_lakehouse_spark.sources import load_table

    base = str(tmp_path / "state")
    emb = load_table(spark, SF, "embeddings")
    bb = _adaptive_band_bits(emb.count())
    for m in (0, 1, 2):
        _semdedup_apply_batch(
            spark, base, emb.filter(F.col("vec_id") % 3 == m), m, bb
        )
    pairs = spark.read.parquet(f"{base}/pairs")
    total = pairs.count()
    distinct = pairs.select("lo", "hi").distinct().count()
    assert total == distinct > 0


# ------------------------------------------------ round-9 invariants


def test_nelson_aalen_invariants(spark):
    from ecom_churn_lakehouse_spark.queries.churn_queries import (
        q_nelson_aalen_cumhaz,
    )

    rows = q_nelson_aalen_cumhaz(spark, SF).collect()
    assert rows
    cum = 0
    prev_t, prev_risk = -1, None
    for r in rows:
        assert r["t"] > prev_t  # strictly increasing event times
        assert 1 <= r["d"] <= r["n_risk"]
        # step is the exact integer division
        assert r["step_micro"] == r["d"] * 1_000_000 // r["n_risk"]
        cum += r["step_micro"]
        assert r["cum_hazard_micro"] == cum  # exact prefix sum
        if prev_risk is not None:
            assert r["n_risk"] < prev_risk  # risk set shrinks
        prev_t, prev_risk = r["t"], r["n_risk"]


def test_beta_posterior_invariants(spark):
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_beta_posterior_conversion,
    )

    rows = q_beta_posterior_conversion(spark, SF).collect()
    assert len(rows) == 5  # five market segments
    for r in rows:
        assert r["alpha"] >= 1 and r["beta"] >= 1
        n = r["alpha"] + r["beta"]
        assert r["posterior_mean_ppm"] == r["alpha"] * 1_000_000 // n
        assert r["ci95_low_ppm"] <= r["posterior_mean_ppm"] <= r["ci95_high_ppm"]
        assert 0 < r["posterior_sd_micro"] < 500_000  # sd < 0.5 always


def test_jackknife_influences_reconstruct_total(spark):
    """Closed-form consistency: every loo mean recomputes from the
    published brand sums, and influence signs track brand mean vs
    overall mean."""
    from ecom_churn_lakehouse_spark.queries.analytics_queries import (
        q_jackknife_brand_revenue_influence,
    )

    rows = q_jackknife_brand_revenue_influence(spark, SF).collect()
    assert len(rows) == 25
    for r in rows:
        assert r["loo_mean_micros"] == r["overall_mean_micros"] + r["influence_micros"]
        # a brand with above-average mean must pull the mean DOWN when
        # removed (negative influence) and vice versa (integer-floor
        # slack of 1 tolerated)
        brand_mean = r["brand_revenue_dollars"] * 1_000_000 // r["n_i"]
        if r["influence_micros"] < -1:
            assert brand_mean >= r["overall_mean_micros"] // 1  # sanity


def test_cohens_d_matches_numpy(spark):
    """Hand-check the standardized effect size against a NumPy
    recomputation from the same exact dollar grain."""
    import numpy as np

    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_cohens_d_priority_spend,
    )
    from ecom_churn_lakehouse_spark.sources import load_table
    from pyspark.sql import functions as F

    r = q_cohens_d_priority_spend(spark, SF).collect()[0]
    pdf = (
        load_table(spark, SF, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(
            "o_orderpriority",
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
                " DIV 100"
            ).alias("x"),
        )
        .toPandas()
    )
    a = pdf[pdf.o_orderpriority == "1-URGENT"].x.to_numpy(dtype=float)
    b = pdf[pdf.o_orderpriority == "5-LOW"].x.to_numpy(dtype=float)
    sp = np.sqrt(
        ((a.size - 1) * a.var(ddof=1) + (b.size - 1) * b.var(ddof=1))
        / (a.size + b.size - 2)
    )
    d = (a.mean() - b.mean()) / sp
    assert abs(r["cohens_d_milli"] - int(np.floor(d * 1000))) <= 1


def test_doc_length_percentiles_ordered(spark):
    from ecom_churn_lakehouse_spark.queries.text_queries import (
        q_doc_length_percentiles_by_source,
    )

    rows = q_doc_length_percentiles_by_source(spark, SF).collect()
    assert rows
    for r in rows:
        assert (
            r["min_tokens"]
            <= r["p25_tokens"]
            <= r["p50_tokens"]
            <= r["p75_tokens"]
            <= r["p95_tokens"]
            <= r["max_tokens"]
        )
        assert r["n_docs"] > 0


def test_register_refuses_name_collision():
    """A second module registering an existing name must fail loudly
    instead of silently replacing the first entry (live round-9
    catch: a duplicate dau_wau_stickiness shadowed the round-5 one)."""
    import pytest

    from ecom_churn_lakehouse_spark import registry

    registry.queries()  # ensure loaded

    with pytest.raises(ValueError, match="name collision"):
        @registry.register("dau_wau_stickiness", None)
        def impostor(spark, sf_dir):  # pragma: no cover
            raise AssertionError


def test_stream_survival_spans_equals_batch(spark):
    """The order-statistic keyed state (two smallest distinct dates
    per customer) must converge to the batch Nelson-Aalen curve
    bit-exactly."""
    from ecom_churn_lakehouse_spark.queries.churn_queries import (
        q_nelson_aalen_cumhaz,
        q_stream_survival_spans_maintenance,
    )

    batch = [r.asDict() for r in q_nelson_aalen_cumhaz(spark, SF).collect()]
    stream = [
        r.asDict()
        for r in q_stream_survival_spans_maintenance(spark, SF).collect()
    ]
    assert stream == batch
    assert batch


def test_two_smallest_partial_is_mergeable(spark):
    """The mergeability proof, checked: re-ranking the union of
    per-batch two-smallest pairs recovers the global two smallest
    distinct dates under an adversarial split (a batch holding ONLY
    dates between the global first and second)."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from ecom_churn_lakehouse_spark.queries.churn_queries import (
        _survival_two_smallest,
    )

    rows = [
        # cust 1: global d1=2020-01-01 (batch A), d2=2020-01-05 (batch B);
        # batch B also holds 2020-01-01 (duplicate of d1) + later noise
        Row(cust=1, od="2020-01-01", b=0),
        Row(cust=1, od="2020-03-01", b=0),
        Row(cust=1, od="2020-01-01", b=1),
        Row(cust=1, od="2020-01-05", b=1),
        Row(cust=1, od="2020-02-01", b=1),
    ]
    df = spark.createDataFrame(rows).select(
        "cust", F.to_date("od").alias("od"), "b"
    )
    parts = [
        _survival_two_smallest(df.filter(F.col("b") == i).drop("b"))
        for i in (0, 1)
    ]
    union = parts[0].unionByName(parts[1])
    merged = sorted(
        str(r["od"]) for r in _survival_two_smallest(union).collect()
    )
    assert merged == ["2020-01-01", "2020-01-05"]
