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


def test_binary_file_source_feeds_multimodal(spark, tmp_path):
    """binaryFile scan → decode plumbing: the raw-file ingestion path."""
    from ecom_churn_lakehouse_spark.multimodal.decode import (
        decode_images,
        extract_binary_metadata,
    )
    from ecom_churn_lakehouse_spark.sources.formats import read_binary_files

    payloads = {f"img_{i}.bin": bytes([i]) * (100 + i) for i in range(5)}
    (tmp_path / "skip.txt").write_text("not a payload")
    for name, blob in payloads.items():
        (tmp_path / name).write_bytes(blob)

    df = read_binary_files(spark, str(tmp_path), glob="*.bin")
    assert set(df.columns) == {"path", "modificationTime", "length", "content"}
    rows = {r.path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == set(payloads)  # glob pruned the .txt at listing
    assert all(bytes(rows[n].content) == payloads[n] for n in payloads)

    # The scan's content column is the decode stage's payload input.
    staged = df.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("content").alias("payload"),
    )
    meta = extract_binary_metadata(staged)
    assert meta.filter(F.col("n_bytes") <= 0).count() == 0
    decoded = decode_images(staged)
    assert decoded.filter(~F.col("decode_ok")).count() == 0


# ------------------------------------------------- sharded export


def test_training_shards_deterministic_and_bounded(spark, tmp_path):
    from ecom_churn_lakehouse_spark.sources.export import (
        shard_column,
        write_training_shards,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    out1, out2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    write_training_shards(docs, out1, ["doc_id"], n_shards=8)
    # re-export from a differently-partitioned frame: identical shards
    write_training_shards(docs.repartition(13), out2, ["doc_id"], n_shards=8)

    a = spark.read.parquet(out1).select("doc_id", "shard")
    b = spark.read.parquet(out2).select("doc_id", "shard")
    assert a.count() == docs.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    shards = {r["shard"] for r in a.select("shard").distinct().collect()}
    assert shards <= set(range(8)) and len(shards) > 1
    # one data file per shard directory
    import glob
    import os

    for d in glob.glob(os.path.join(out1, "shard=*")):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, d
    # membership is the portable hash, not Spark partitioning
    want = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", shard_column(["doc_id"], 8).alias("s")
        ).collect()
    }
    got = {r["doc_id"]: r["shard"] for r in a.collect()}
    assert got == want


def test_training_shards_json_layout(spark, tmp_path):
    import glob
    import json as _json
    import os

    from ecom_churn_lakehouse_spark.sources.export import write_training_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    out = str(tmp_path / "jl")
    write_training_shards(docs, out, ["doc_id"], n_shards=4, fmt="json")
    files = glob.glob(os.path.join(out, "shard=*", "*.json"))
    assert files
    with open(files[0]) as f:
        row = _json.loads(f.readline())
    assert "doc_id" in row and "text" in row  # JSONL rows, shard in the path


def test_persistent_lsh_index_matches_inline_ann(spark):
    """Build-once ANN index (similarity/index.py): the bucket-stored
    probe returns exactly the inline ann_lsh_topk result, and the
    stored corpus side joins without repartitioning the index."""
    from pyspark.sql import functions as F

    from ecom_churn_lakehouse_spark.similarity.ann import (
        bucketed_topk,
        hyperplane_lsh_buckets,
    )
    from ecom_churn_lakehouse_spark.similarity.index import (
        build_lsh_index,
        topk_from_index,
    )
    from ecom_churn_lakehouse_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    planes = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("plane_id"), "embedding"
    )
    build_lsh_index(emb, planes, "t_lsh_index", n_buckets=8)

    buckets = hyperplane_lsh_buckets(emb, planes)
    q = buckets.filter(F.col("vec_id") % 50 == 0)
    inline = bucketed_topk(q, buckets, emb, k=3).collect()
    stored = topk_from_index(spark, "t_lsh_index", q, k=3).collect()
    key = lambda r: (r["query_id"], r["neighbor_id"])  # noqa: E731
    assert sorted(
        (r["query_id"], r["neighbor_id"], r["cosine_sim"]) for r in inline
    ) == sorted(
        (r["query_id"], r["neighbor_id"], r["cosine_sim"]) for r in stored
    )
    # physical check: the stored index side must not be re-shuffled on
    # bucket — its table layout already provides the clustering
    plan = topk_from_index(spark, "t_lsh_index", q, k=3)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan
