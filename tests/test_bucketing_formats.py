"""Bucketed co-located joins (exchange-free plan) + multi-format IO."""

import pytest
from pyspark.sql import functions as F

from ecom_churn_lakehouse_spark.sources.bucketing import (
    is_exchange_free_join,
    read_table,
    write_bucketed_table,
)
from ecom_churn_lakehouse_spark.sources.formats import read_source, write_sink


def test_bucketed_join_has_no_shuffle(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

    write_bucketed_table(orders, "b_orders", ["o_orderkey"], 8, sort_keys=["o_orderkey"])
    write_bucketed_table(
        lineitem, "b_lineitem", ["l_orderkey"], 8, sort_keys=["l_orderkey"]
    )

    bo = read_table(spark, "b_orders")
    bl = read_table(spark, "b_lineitem")
    # hint merge on the INPUT: on fixture-sized tables Catalyst would
    # otherwise pick broadcast (and skip the bucket layout entirely);
    # at fact-scale SMJ is what it picks on its own.
    joined = (
        bo.hint("merge")
        .join(bl, bo["o_orderkey"] == bl["l_orderkey"])
        .select("o_orderkey", "l_linenumber", "l_quantity")
    )
    # co-located bucket layout → SortMergeJoin with NO shuffle exchange
    assert is_exchange_free_join(joined)
    # and the same join on plain parquet DOES shuffle (sanity of the check)
    plain = orders.hint("merge").join(
        lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
    ).select("o_orderkey", "l_linenumber", "l_quantity")
    assert not is_exchange_free_join(plain)
    # correctness: bucketed join row count matches plain join
    assert joined.count() == plain.count()


def test_multi_format_round_trip(spark, tmp_path):
    df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    want = {(r["n_nationkey"], r["n_name"]) for r in df.collect()}
    schema = df.schema
    for fmt in ("csv", "json", "orc", "parquet"):
        path = str(tmp_path / fmt)
        write_sink(df, path, fmt=fmt)
        back = read_source(spark, path, fmt=fmt, schema=schema)
        got = {(r["n_nationkey"], r["n_name"]) for r in back.collect()}
        assert got == want, fmt


def test_text_formats_require_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="require an explicit schema"):
        read_source(spark, str(tmp_path), fmt="csv")
    with pytest.raises(ValueError, match="unsupported format"):
        read_source(spark, str(tmp_path), fmt="avro")
