"""Streaming surface: AvailableNow over the deterministic fixture; the
batch queries are the oracles (SURVEY §7.4)."""

from pyspark.sql import functions as F

from ecom_churn_lakehouse_spark.sources.managed_table import ManagedTable
from ecom_churn_lakehouse_spark.streaming import (
    run_stream_to_managed_table,
    session_window_stream,
    stream_events,
    tumbling_counts_stream,
)

SF = "/root/testdata/sf0.001"


def test_tumbling_stream_equals_batch(spark, tmp_path):
    stream = tumbling_counts_stream(stream_events(spark, SF), window="1 day")
    table = ManagedTable(
        spark, str(tmp_path / "agg"), keys=["window_start", "event_type"]
    )
    run_stream_to_managed_table(stream, table, str(tmp_path / "ckpt"))

    from ecom_churn_lakehouse_spark.registry import queries

    batch = queries()["event_tumbling_daily"](spark, SF)
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in table.read().collect()
    }
    want = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    assert got == want


def test_stream_republish_is_idempotent(spark, tmp_path):
    stream = tumbling_counts_stream(stream_events(spark, SF), window="1 day")
    table = ManagedTable(
        spark, str(tmp_path / "agg"), keys=["window_start", "event_type"]
    )
    run_stream_to_managed_table(stream, table, str(tmp_path / "ckpt1"))
    n1 = table.read().count()
    # replay from scratch (fresh checkpoint) → MERGE keys make it idempotent
    stream2 = tumbling_counts_stream(stream_events(spark, SF), window="1 day")
    run_stream_to_managed_table(stream2, table, str(tmp_path / "ckpt2"))
    assert table.read().count() == n1


def test_session_window_stream_runs(spark, tmp_path):
    stream = session_window_stream(stream_events(spark, SF), gap="30 minutes")
    table = ManagedTable(
        spark, str(tmp_path / "sess"), keys=["session_start", "user_id"]
    )
    run_stream_to_managed_table(
        stream, table, str(tmp_path / "ckpt"), output_mode="complete"
    )
    out = table.read()
    assert out.count() > 0
    # session invariant: end >= start, n_events >= 1
    bad = out.filter(
        (F.col("session_end") < F.col("session_start")) | (F.col("n_events") < 1)
    ).count()
    assert bad == 0


def test_stream_merge_dedups_deterministically(spark, tmp_path):
    # ADVICE r1: if a microbatch carries several rows per merge key, the
    # sink must pick the winner by a total order over the state columns,
    # not dropDuplicates' arbitrary row.
    events = stream_events(spark, SF).select(
        "user_id", F.col("value").cast("double").alias("value")
    )
    table = ManagedTable(spark, str(tmp_path / "t"), keys=["user_id"])
    run_stream_to_managed_table(
        events, table, str(tmp_path / "ckpt"), output_mode="append"
    )
    got = {r["user_id"]: r["value"] for r in table.read().collect()}
    # deterministic winner = max value per user (desc_nulls_last order)
    want = {
        r["user_id"]: r["m"]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(F.max(F.col("value").cast("double")).alias("m"))
        .collect()
    }
    assert got == want


def test_stream_dedup_suppresses_replays(spark, tmp_path):
    # At-least-once source: the same events delivered twice (2 files,
    # 2 microbatches) → watermark-bounded dedup keeps each id once.
    from ecom_churn_lakehouse_spark.streaming import dedup_events_stream

    from ecom_churn_lakehouse_spark.sources.tables import load_events

    src = str(tmp_path / "src")

    ev = load_events(spark, SF).orderBy("event_id").limit(300)
    ev.coalesce(1).write.mode("overwrite").parquet(src)
    ev.coalesce(1).write.mode("append").parquet(src)  # replay file

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        dedup_events_stream(stream, watermark="365 days")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("deduped")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT event_id FROM deduped").collect()
    assert len(out) == 300  # 600 delivered rows → 300 unique survive
    assert len({r["event_id"] for r in out}) == 300


def test_stream_static_enrichment_broadcasts_dim(spark, tmp_path):
    from ecom_churn_lakehouse_spark.streaming import enrich_stream_with_dim

    dim = spark.createDataFrame(
        [("click", "engagement"), ("purchase", "revenue")],
        "event_type string, category string",
    )
    enriched = enrich_stream_with_dim(stream_events(spark, SF), dim, on="event_type")
    q = (
        enriched.writeStream.outputMode("append")
        .format("memory")
        .queryName("enriched")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        "SELECT count(*) AS n, count(category) AS matched FROM enriched"
    ).collect()[0]
    assert rows["n"] > 0
    # left join: every stream row survives; only dim-known types match
    want = spark.read.parquet(f"{SF}/events.parquet").count()
    assert rows["n"] == want
    assert 0 < rows["matched"] < rows["n"]


def test_stream_stream_interval_join_equals_batch(spark, tmp_path):
    # Stream-stream joined pairs must equal the batch interval join's.
    from ecom_churn_lakehouse_spark.operators import interval_join
    from ecom_churn_lakehouse_spark.sources.tables import load_events
    from ecom_churn_lakehouse_spark.streaming import click_purchase_stream_join

    q = (
        click_purchase_stream_join(stream_events(spark, SF))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("attrib")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["purchase_id"], str(r["click_ts"]))
        for r in spark.sql("SELECT * FROM attrib").collect()
    }

    ev = load_events(spark, SF)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    want = {
        (r["purchase_id"], str(r["click_ts"]))
        for r in interval_join(
            purchases, clicks, on=["user_id"],
            left_ts="purchase_ts", right_ts="click_ts",
            lower_s=-3600, upper_s=0,
        ).collect()
    }
    assert got == want and len(got) > 0


def test_cdc_stream_applies_upserts_and_deletes(spark, tmp_path):
    from ecom_churn_lakehouse_spark.streaming import run_cdc_stream_to_managed_table

    table = ManagedTable(spark, str(tmp_path / "t"), keys=["k"])
    table.overwrite(
        spark.createDataFrame(
            [("a", 1, 0), ("b", 1, 0)], "k string, v int, ts long"
        )
    )
    src = str(tmp_path / "changes")
    schema = "k string, v int, ts long, _deleted boolean"
    # batch carries: update for a (two changes — later ts wins), delete
    # for b, insert for c, and a same-seq delete+upsert tie for d
    # (tombstone must win).
    spark.createDataFrame(
        [
            ("a", 2, 10, False),
            ("a", 3, 20, False),
            ("b", None, 15, True),
            ("c", 7, 5, False),
            ("d", 9, 30, False),
            ("d", None, 30, True),
        ],
        schema,
    ).coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    run_cdc_stream_to_managed_table(stream, table, str(tmp_path / "ckpt"))
    got = {r["k"]: r["v"] for r in table.read().collect()}
    assert got == {"a": 3, "c": 7}

    # replay with a fresh checkpoint: same reduction, same MERGE — idempotent
    run_cdc_stream_to_managed_table(
        spark.readStream.schema(schema).parquet(src),
        table,
        str(tmp_path / "ckpt2"),
    )
    assert {r["k"]: r["v"] for r in table.read().collect()} == {"a": 3, "c": 7}


def test_stream_stream_left_outer_join_emits_unmatched(spark, tmp_path):
    # left_outer: matched pairs identical to inner; unmatched purchases
    # surface with null click_ts once the watermark passes their window.
    from ecom_churn_lakehouse_spark.operators import interval_join
    from ecom_churn_lakehouse_spark.sources.tables import load_events
    from ecom_churn_lakehouse_spark.streaming import click_purchase_stream_join

    q = (
        click_purchase_stream_join(stream_events(spark, SF), how="left_outer")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("attrib_outer")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM attrib_outer").collect()
    got_matched = {
        (r["purchase_id"], str(r["click_ts"]))
        for r in rows if r["click_ts"] is not None
    }
    got_null = {r["purchase_id"] for r in rows if r["click_ts"] is None}

    ev = load_events(spark, SF)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    inner = interval_join(
        purchases, clicks, on=["user_id"],
        left_ts="purchase_ts", right_ts="click_ts",
        lower_s=-3600, upper_s=0,
    )
    want_matched = {
        (r["purchase_id"], str(r["click_ts"])) for r in inner.collect()
    }
    assert got_matched == want_matched and len(got_matched) > 0
    # every null verdict is a genuinely unmatched purchase...
    matched_ids = {pid for pid, _ in want_matched}
    assert got_null and not (got_null & matched_ids)
    # ...and exactly one row per unmatched purchase (no duplicates)
    assert len([r for r in rows if r["click_ts"] is None]) == len(got_null)
    # null verdicts cover the unmatched purchases whose window the final
    # watermark has passed (all but, at most, the stream's tail horizon)
    n_purchases = purchases.count()
    assert len(got_null) > (n_purchases - len(matched_ids)) * 0.5
