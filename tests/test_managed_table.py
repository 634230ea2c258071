"""Managed-table layer: merge/append/overwrite/existence (S4-S9)."""

import pytest
from pyspark.sql import Row

from ecom_churn_lakehouse_spark.sources.managed_table import ManagedTable


def test_exists_probe(spark, tmp_path):
    t = ManagedTable(spark, str(tmp_path / "t"), keys=["k"])
    assert not t.exists()
    t.overwrite(spark.createDataFrame([Row(k="a", v=1)]))
    assert t.exists()


def test_merge_upsert_semantics(spark, tmp_path):
    t = ManagedTable(spark, str(tmp_path / "t"), keys=["k"])
    t.merge(spark.createDataFrame([Row(k="a", v=1), Row(k="b", v=2)]))
    # update a, insert c
    t.merge(spark.createDataFrame([Row(k="a", v=10), Row(k="c", v=3)]))
    out = {r["k"]: r["v"] for r in t.read().collect()}
    assert out == {"a": 10, "b": 2, "c": 3}


def test_merge_is_idempotent(spark, tmp_path):
    t = ManagedTable(spark, str(tmp_path / "t"), keys=["k"])
    src = spark.createDataFrame([Row(k="a", v=1), Row(k="b", v=2)])
    t.merge(src)
    t.merge(src)  # republish: same result, no duplicates
    assert t.read().count() == 2


def test_merge_rejects_nonunique_source(spark, tmp_path):
    t = ManagedTable(spark, str(tmp_path / "t"), keys=["k"])
    with pytest.raises(ValueError, match="not unique"):
        t.merge(spark.createDataFrame([Row(k="a", v=1), Row(k="a", v=2)]))


def test_append_accumulates(spark, tmp_path):
    t = ManagedTable(spark, str(tmp_path / "t"), keys=["k"])
    t.append(spark.createDataFrame([Row(k="a", v=1)]))
    t.append(spark.createDataFrame([Row(k="a", v=2)]))
    assert t.read().count() == 2  # append-only: duplicates allowed


def test_composite_key_merge(spark, tmp_path):
    t = ManagedTable(spark, str(tmp_path / "t"), keys=["k1", "k2"])
    t.merge(spark.createDataFrame([Row(k1="a", k2=1, v="x")]))
    t.merge(spark.createDataFrame([Row(k1="a", k2=1, v="y"), Row(k1="a", k2=2, v="z")]))
    out = {(r["k1"], r["k2"]): r["v"] for r in t.read().collect()}
    assert out == {("a", 1): "y", ("a", 2): "z"}
