"""Incremental SCD2 maintenance: delta-scoped rebuild ≡ full rebuild,
stale-version tombstones, untouched keys untouched."""

from __future__ import annotations

import sys
from datetime import date
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from ecom_churn_lakehouse_spark.operators.scd2 import scd2_build
from ecom_churn_lakehouse_spark.pipelines.scd2 import incremental_scd2_update
from ecom_churn_lakehouse_spark.scratch import scratch_dir
from ecom_churn_lakehouse_spark.sources import load_table
from ecom_churn_lakehouse_spark.sources.managed_table import ManagedTable

SF = "/root/testdata/sf0.001"
CUTOFF = "1997-01-01"


def _orders(spark):
    return load_table(spark, SF, "orders").select(
        F.col("o_custkey").alias("customer_id"),
        F.to_date("o_orderdate").alias("order_date"),
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
    )


def _key(r):
    return (r["customer_id"], r["version"])


def _rows(df):
    return {
        _key(r): (
            r["priority"],
            r["valid_from"],
            r["valid_to"],
            r["n_events"],
            r["is_current"],
        )
        for r in df.collect()
    }


def test_incremental_equals_full_rebuild(spark):
    orders = _orders(spark)
    initial = orders.filter(F.col("order_date") < CUTOFF)
    increment = orders.filter(F.col("order_date") >= CUTOFF)
    assert increment.count() > 0 and initial.count() > 0

    dim = ManagedTable(
        spark,
        f"{scratch_dir(prefix='scd2_')}/dim",
        keys=["customer_id", "version"],
    )
    args = dict(
        key_col="customer_id",
        attr_col="priority",
        ts_col="order_date",
        tiebreak_col="o_orderkey",
    )
    dim.merge(scd2_build(initial, **args))

    touched = increment.select("customer_id").distinct()
    incremental_scd2_update(spark, dim, orders, touched, **args)

    got = _rows(dim.read())
    want = _rows(scd2_build(orders, **args))
    assert got == want


def test_stale_versions_are_tombstoned(spark):
    base = scratch_dir(prefix="scd2_corr_")
    dim = ManagedTable(spark, f"{base}/dim", keys=["customer_id", "version"])
    args = dict(
        key_col="customer_id",
        attr_col="priority",
        ts_col="order_date",
        tiebreak_col="o_orderkey",
    )
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        [
            (cid, date.fromisoformat(d), k, p)
            for cid, d, k, p in rows
        ],
        "customer_id long, order_date date, o_orderkey long, priority string",
    )
    # v1 history: alternating attribute -> 3 runs
    v1 = mk(
        [
            (1, "2020-01-01", 1, "LOW"),
            (1, "2020-02-01", 2, "HIGH"),
            (1, "2020-03-01", 3, "LOW"),
            (2, "2020-01-15", 4, "MED"),
        ]
    )
    dim.merge(scd2_build(v1, **args))
    assert len(_rows(dim.read())) == 4  # 3 runs for key 1, 1 for key 2
    # corrected history: key 1's middle event was wrong -> ONE run
    v2 = mk(
        [
            (1, "2020-01-01", 1, "LOW"),
            (1, "2020-02-01", 2, "LOW"),
            (1, "2020-03-01", 3, "LOW"),
            (2, "2020-01-15", 4, "MED"),
        ]
    )
    touched = spark.createDataFrame([(1,)], "customer_id long")
    incremental_scd2_update(spark, dim, v2, touched, **args)
    got = _rows(dim.read())
    # key 1 collapsed to one current run; versions 2-3 tombstoned;
    # key 2 (untouched) still there
    assert set(got) == {(1, 1), (2, 1)}
    assert got[(1, 1)][0] == "LOW" and got[(1, 1)][3] == 3
    assert got[(1, 1)][4] is True


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=10, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),      # key
            st.integers(min_value=0, max_value=400),    # day offset
            st.integers(min_value=1, max_value=10_000), # tiebreak
            st.sampled_from(["A", "B", "C"]),           # attribute
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: (t[0], t[1], t[2]),
    )
)
def test_scd2_properties_random_streams(spark, events):
    """On ANY event stream: versions are dense from 1, intervals
    stitch with no gaps/overlaps, adjacent runs differ in attribute,
    run sizes sum to the key's event count, and the naive
    per-key Python reference agrees exactly."""
    from datetime import date, timedelta

    rows = [
        (k, date(2020, 1, 1) + timedelta(days=d), tb, a)
        for k, d, tb, a in events
    ]
    df = spark.createDataFrame(
        rows,
        "customer_id long, order_date date, o_orderkey long, priority string",
    )
    got = scd2_build(
        df,
        key_col="customer_id",
        attr_col="priority",
        ts_col="order_date",
        tiebreak_col="o_orderkey",
    ).collect()

    # naive reference: sort each key's events, collapse runs
    by_key: dict[int, list] = {}
    for k, d, tb, a in ((r[0], r[1], r[2], r[3]) for r in rows):
        by_key.setdefault(k, []).append((d, tb, a))
    want = {}
    for k, evs in by_key.items():
        evs.sort()
        runs = []
        for d, tb, a in evs:
            if runs and runs[-1][0] == a:
                runs[-1][2] += 1
            else:
                runs.append([a, d, 1])
        for v, (a, start, n) in enumerate(runs, start=1):
            nxt = runs[v][1] if v < len(runs) else None
            want[(k, v)] = (a, start, nxt, n, nxt is None)
    got_map = {
        (r["customer_id"], r["version"]): (
            r["priority"],
            r["valid_from"],
            r["valid_to"],
            r["n_events"],
            r["is_current"],
        )
        for r in got
    }
    assert got_map == want
