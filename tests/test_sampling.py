"""Properties of deterministic sampling/split/balance (operators/sampling.py).

The contract under test: assignment depends ONLY on (salt, key) — never
on partitioning — splits partition the input, stratified fractions hit
their targets, and balancing equalizes class counts.
"""

import pytest
from pyspark.sql import functions as F

from ecom_churn_lakehouse_spark.operators.sampling import (
    HASH_MOD,
    assign_split,
    balance_classes,
    hash_bucket,
    stratified_sample,
)

SPLITS = [("train", 0.8), ("val", 0.1), ("test", 0.1)]


@pytest.fixture(scope="module")
def people(spark):
    # 2000 keys, a skewed 3-class label, and a stratum column.
    return spark.range(2000).select(
        F.col("id").alias("key"),
        (F.col("id") % 10).alias("stratum"),
        F.when(F.col("id") % 20 == 0, "rare")
        .when(F.col("id") % 3 == 0, "mid")
        .otherwise("common")
        .alias("label"),
    )


def test_split_is_a_partition_with_target_fractions(people):
    out = assign_split(people, "key", SPLITS)
    assert out.count() == 2000  # no rows dropped or duplicated
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    assert abs(counts["val"] / 2000 - 0.1) < 0.03
    assert abs(counts["test"] / 2000 - 0.1) < 0.03


def test_split_invariant_under_partitioning(people):
    a = assign_split(people, "key", SPLITS).select("key", "split")
    b = assign_split(people.repartition(13, "stratum"), "key", SPLITS).select(
        "key", "split"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_split_stable_under_data_growth(people):
    # A key's split must not change when the table grows.
    subset = people.filter(F.col("key") < 500)
    full = assign_split(people, "key", SPLITS).select("key", "split")
    small = assign_split(subset, "key", SPLITS).select("key", "split")
    joined = full.join(small, on="key", how="inner")
    assert joined.count() == 500
    # same column name on both sides after join ⇒ compare via alias
    full_r = full.withColumnRenamed("split", "s_full")
    small_r = small.withColumnRenamed("split", "s_small")
    assert (
        full_r.join(small_r, on="key")
        .filter(F.col("s_full") != F.col("s_small"))
        .count()
        == 0
    )


def test_split_fractions_must_sum_to_one(people):
    with pytest.raises(ValueError):
        assign_split(people, "key", [("a", 0.5), ("b", 0.1)])


def test_stratified_sample_fractions_and_drops(people):
    out = stratified_sample(
        people,
        "key",
        "stratum",
        fractions={"0": 1.0, "1": 0.5},
        default_fraction=0.0,
    )
    counts = {
        r["stratum"]: r["n"]
        for r in out.groupBy(F.col("stratum").cast("string").alias("stratum"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert counts.get("0") == 200  # fraction 1.0 keeps all 200
    assert counts.get("1", 0) > 0 and abs(counts["1"] / 200 - 0.5) < 0.15
    assert set(counts) <= {"0", "1"}  # every other stratum dropped


def test_balance_exact_equalizes_class_counts(people):
    out = balance_classes(people, "key", "label", exact=True)
    counts = [r["n"] for r in out.groupBy("label").agg(F.count("*").alias("n")).collect()]
    assert len(counts) == 3
    assert len(set(counts)) == 1  # all classes exactly equal
    assert counts[0] == 100  # minority class: 2000/20


def test_balance_threshold_approximates_and_scales(people):
    out = balance_classes(people, "key", "label", exact=False)
    counts = {r["label"]: r["n"] for r in out.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert counts["rare"] == 100  # minority always fully kept
    for label in ("mid", "common"):
        assert abs(counts[label] - 100) <= 25  # within sampling noise
    # the scale path must not contain a window exchange over the label
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_bucket_range(people):
    mm = people.select(
        F.min(hash_bucket(F.col("key"), "t:")).alias("lo"),
        F.max(hash_bucket(F.col("key"), "t:")).alias("hi"),
    ).collect()[0]
    assert 0 <= mm["lo"] and mm["hi"] < HASH_MOD


def test_negative_samples_properties(spark):
    """Negative sampling invariants: no sampled item is a positive, at
    most 5 per user, every user with orders is covered, and the draw is
    deterministic (pure hash arithmetic — two runs, identical rows)."""
    from ecom_churn_lakehouse_spark.queries.sampling_queries import (
        q_user_item_negative_samples,
    )

    sf = "/root/testdata/sf0.001"
    out = q_user_item_negative_samples(spark, sf)
    rows = out.collect()

    import pyspark.sql.functions as F2

    orders = spark.read.parquet(f"{sf}/orders.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    pos = {
        (r["o_custkey"], r["l_partkey"])
        for r in orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_partkey")
        .distinct()
        .collect()
    }
    assert rows, "sampler returned nothing"
    per_user: dict[int, int] = {}
    for r in rows:
        assert (r["customer_id"], r["negative_partkey"]) not in pos
        per_user[r["customer_id"]] = per_user.get(r["customer_id"], 0) + 1
    assert max(per_user.values()) <= 5
    n_users = orders.select("o_custkey").distinct().count()
    # hash collisions can only REDUCE a user's negatives below 5, never
    # erase a user entirely (12 draws, <=5 needed)
    assert len(per_user) == n_users
    again = sorted(map(tuple, q_user_item_negative_samples(spark, sf).collect()))
    assert again == sorted(map(tuple, rows))
