"""Skew operators vs plain equivalents + property-based operator checks
(hypothesis) — custom operators are compared against naive reference
implementations on randomized inputs.
"""

import datetime as dt

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

from ecom_churn_lakehouse_spark.operators import asof_join, interval_join, sessionize
from ecom_churn_lakehouse_spark.operators.skew import (
    salted_count_distinct,
    salted_join,
)

# ---------------------------------------------------------------- skew ops


def test_salted_join_equals_plain_join(spark):
    # skewed left: one hot key with 500 rows
    left = spark.createDataFrame(
        [Row(k="hot", v=i) for i in range(500)] + [Row(k=f"k{i}", v=i) for i in range(20)]
    )
    right = spark.createDataFrame(
        [Row(k="hot", w="H")] + [Row(k=f"k{i}", w=f"W{i}") for i in range(10)]
    )
    plain = {(r["k"], r["v"], r["w"]) for r in left.join(right, on="k").collect()}
    salted = {(r["k"], r["v"], r["w"]) for r in salted_join(left, right, on=["k"], salt_n=8).collect()}
    assert salted == plain

    plain_l = {(r["k"], r["v"], r["w"]) for r in left.join(right, on="k", how="left").collect()}
    salted_l = {(r["k"], r["v"], r["w"]) for r in salted_join(left, right, on=["k"], salt_n=8, how="left").collect()}
    assert salted_l == plain_l


def test_salted_count_distinct_exact(spark):
    df = spark.createDataFrame(
        [Row(k="hot", v=i % 137) for i in range(2000)] + [Row(k="cold", v=1)]
    )
    got = {
        r["k"]: r["n_distinct"]
        for r in salted_count_distinct(df, ["k"], "v", salt_n=16).collect()
    }
    assert got == {"hot": 137, "cold": 1}


# ------------------------------------------------- property-based checks

_ts_strategy = st.integers(min_value=0, max_value=3600)


@settings(max_examples=15, deadline=None)
@given(
    lefts=st.lists(_ts_strategy, min_size=1, max_size=8),
    rights=st.lists(_ts_strategy, min_size=0, max_size=8),
)
def test_asof_join_matches_naive(spark, lefts, rights):
    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [Row(k="u", lts=base + dt.timedelta(seconds=s), lid=i) for i, s in enumerate(lefts)]
    )
    right_rows = [
        Row(k="u", rts=base + dt.timedelta(seconds=s), pay=s) for s in sorted(set(rights))
    ]
    right = (
        spark.createDataFrame(right_rows)
        if right_rows
        else spark.createDataFrame([], "k string, rts timestamp, pay bigint")
    )
    out = {
        r["lid"]: r["m"]
        for r in asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts", payload={"pay": "m"}
        ).collect()
    }
    rset = sorted(set(rights))
    for i, s in enumerate(lefts):
        expect = max((x for x in rset if x <= s), default=None)
        assert out[i] == expect, f"left ts {s}: got {out[i]}, want {expect}"


@settings(max_examples=15, deadline=None)
@given(
    lefts=st.lists(_ts_strategy, min_size=1, max_size=6),
    rights=st.lists(_ts_strategy, min_size=0, max_size=8),
)
def test_interval_join_matches_naive(spark, lefts, rights):
    """Binned interval join == naive O(n·m) range predicate, including
    bin-boundary timestamps (the hypothesis inputs hit multiples of the
    bin width regularly)."""
    base = dt.datetime(2024, 1, 1)
    LO, HI = -120.0, 60.0  # window (L-120s, L+60s]
    left = spark.createDataFrame(
        [Row(k="u", lts=base + dt.timedelta(seconds=s), lid=i) for i, s in enumerate(lefts)]
    )
    right_rows = [Row(k="u", rts=base + dt.timedelta(seconds=s)) for s in rights]
    right = (
        spark.createDataFrame(right_rows)
        if right_rows
        else spark.createDataFrame([], "k string, rts timestamp")
    )
    got = {
        (r["lid"], r["rts"])
        for r in interval_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            lower_s=LO, upper_s=HI,
        ).collect()
    }
    want = {
        (i, base + dt.timedelta(seconds=rs))
        for i, ls in enumerate(lefts)
        for rs in rights
        if ls + LO < rs <= ls + HI
    }
    assert got == want


@settings(max_examples=15, deadline=None)
@given(gaps=st.lists(st.integers(min_value=1, max_value=7200), min_size=1, max_size=10))
def test_sessionize_matches_naive(spark, gaps):
    base = dt.datetime(2024, 1, 1)
    ts, cur = [], 0
    for g in gaps:
        cur += g
        ts.append(cur)
    df = spark.createDataFrame(
        [Row(user_id=1, event_id=i, ts=base + dt.timedelta(seconds=s)) for i, s in enumerate(ts)]
    )
    out = [
        r["session_id"]
        for r in sessionize(df, gap_minutes=30).orderBy("ts").collect()
    ]
    want, sid = [], 1
    for i, g in enumerate(gaps):
        if i > 0 and g > 1800:
            sid += 1
        want.append(sid)
    assert out == want


def test_interval_join_left_nullable_rows_not_duplicated(spark):
    # ADVICE r1: a matched left row containing a NULL must not ALSO be
    # re-emitted as unmatched (the old all-columns anti-join was
    # null-unsafe; reattachment now keys on a surrogate id).
    import datetime as dt

    left = spark.createDataFrame(
        [("k", dt.datetime(2025, 1, 1, 0, 0), None),
         ("k", dt.datetime(2025, 1, 2, 0, 0), "p2")],
        "key string, lts timestamp, payload string",
    )
    right = spark.createDataFrame(
        [("k", dt.datetime(2025, 1, 1, 0, 30), "r1")],
        "key string, rts timestamp, rval string",
    )
    out = interval_join(
        left, right, on=["key"], left_ts="lts", right_ts="rts",
        lower_s=0, upper_s=3600, how="left",
    ).collect()
    assert len(out) == 2
    by_lts = {str(r["lts"]): r["rval"] for r in out}
    assert by_lts["2025-01-01 00:00:00"] == "r1"  # matched, exactly once
    assert by_lts["2025-01-02 00:00:00"] is None  # unmatched survives


@settings(max_examples=15, deadline=None)
@given(
    lefts=st.lists(_ts_strategy, min_size=1, max_size=8),
    rights=st.lists(_ts_strategy, min_size=0, max_size=8),
    tol=st.one_of(st.none(), st.integers(min_value=0, max_value=1800)),
)
def test_asof_forward_with_tolerance_matches_naive(spark, lefts, rights, tol):
    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [Row(k="u", lts=base + dt.timedelta(seconds=s), lid=i) for i, s in enumerate(lefts)]
    )
    right_rows = [
        Row(k="u", rts=base + dt.timedelta(seconds=s), pay=s) for s in sorted(set(rights))
    ]
    right = (
        spark.createDataFrame(right_rows)
        if right_rows
        else spark.createDataFrame([], "k string, rts timestamp, pay bigint")
    )
    out = {
        r["lid"]: r["m"]
        for r in asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            payload={"pay": "m"}, direction="forward", tolerance_seconds=tol,
        ).collect()
    }
    rset = sorted(set(rights))
    for i, s in enumerate(lefts):
        expect = min((x for x in rset if x >= s), default=None)
        if expect is not None and tol is not None and expect - s > tol:
            expect = None
        assert out[i] == expect, (
            f"left ts {s} tol {tol}: got {out[i]}, want {expect}"
        )
