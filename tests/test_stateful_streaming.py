"""Custom stateful operator (applyInPandasWithState) — state must
accumulate correctly ACROSS microbatches, so the fixture subset is
split into 2 files and streamed with maxFilesPerTrigger=1.

Kept deliberately small: Spark 4's checksummed state-store commits
make each stateful microbatch cost seconds even on tiny data.
"""

import pyspark.sql.functions as F
import pytest

from ecom_churn_lakehouse_spark.sources.tables import load_events
from ecom_churn_lakehouse_spark.streaming import running_user_profiles

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def multi_file_events(spark, tmp_path_factory):
    """200 events re-written as 2 files → AvailableNow yields 2 batches."""
    d = tmp_path_factory.mktemp("events_split")
    (
        load_events(spark, SF)
        .orderBy("event_id")
        .limit(200)
        .repartition(2)
        .write.parquet(str(d / "events"))
    )
    return str(d / "events")


def test_stateful_profiles_accumulate_across_batches(spark, multi_file_events, tmp_path):
    schema = spark.read.parquet(multi_file_events).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(multi_file_events)
    )
    q = (
        running_user_profiles(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("profiles")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert q.lastProgress["batchId"] >= 1  # really ran >1 microbatch

    # update-mode memory sink appends one row per (user, batch); the
    # final state per user is the row with the max n_events
    emitted = spark.sql(
        """SELECT user_id, max(n_events) AS n_events,
                  max_by(total_value, n_events) AS total_value
           FROM profiles GROUP BY user_id"""
    ).collect()
    got = {r["user_id"]: (r["n_events"], r["total_value"]) for r in emitted}

    want_rows = (
        spark.read.parquet(multi_file_events)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    )
    want = {r["user_id"]: (r["n"], r["t"]) for r in want_rows}

    assert set(got) == set(want)
    # exact count equality proves state carried across microbatches
    assert {u: c for u, (c, _) in got.items()} == {u: c for u, (c, _) in want.items()}
    for u in want:
        assert got[u][1] == pytest.approx(want[u][1], abs=1e-4)
