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
        _semdedup_apply_batch,
        _semdedup_serve_manifest,
    )
    from ecom_churn_lakehouse_spark.sources import load_table

    base = str(tmp_path / "state")
    emb = load_table(spark, SF, "embeddings")
    b0 = emb.filter(F.col("vec_id") % 2 == 0)
    b1 = emb.filter(F.col("vec_id") % 2 == 1)
    _semdedup_apply_batch(spark, base, b0, 0)
    _semdedup_apply_batch(spark, base, b1, 1)
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
    _semdedup_apply_batch(spark, base, b1, 1)
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
        _semdedup_apply_batch,
    )
    from ecom_churn_lakehouse_spark.sources import load_table

    base = str(tmp_path / "state")
    emb = load_table(spark, SF, "embeddings")
    for m in (0, 1, 2):
        _semdedup_apply_batch(
            spark, base, emb.filter(F.col("vec_id") % 3 == m), m
        )
    pairs = spark.read.parquet(f"{base}/pairs")
    total = pairs.count()
    distinct = pairs.select("lo", "hi").distinct().count()
    assert total == distinct > 0
