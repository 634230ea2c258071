"""Round-8 regression tests: r7 ADVICE fixes (family-size guard on the
multiple-testing screens, Mann-Kendall tie correction, floored-critical
comparison convention) and the new round-8 operators."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- Holm/BH guard


def test_holm_threshold_guard_nulls_on_family_drift(spark):
    """r7 advice: the m=25 critical-value tables must never silently
    fall back to the unadjusted 1.96 when the family size drifts."""
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        _bh_threshold_case,
        _holm_threshold_case,
    )

    rows = spark.sql(
        f"""
        SELECT rnk, m_tests,
               {_holm_threshold_case("rnk")} AS holm_thr,
               {_bh_threshold_case("rnk")} AS bh_thr
        FROM VALUES (1L, 25L), (25L, 25L), (1L, 26L), (26L, 26L), (3L, 24L)
             AS t(rnk, m_tests)
        """
    ).collect()
    by = {(r["rnk"], r["m_tests"]): r for r in rows}
    # correct family size: rank-specific thresholds
    assert by[(1, 25)]["holm_thr"] == 3090
    assert by[(25, 25)]["holm_thr"] == 1960
    assert by[(1, 25)]["bh_thr"] == 3090
    assert by[(25, 25)]["bh_thr"] == 1960
    # drifted family size: NULL (fail closed), never 1960
    for key in [(1, 26), (26, 26), (3, 24)]:
        assert by[key]["holm_thr"] is None
        assert by[key]["bh_thr"] is None


def test_holm_bh_m_tests_column_on_fixture(spark):
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_bh_fdr_brand_screen,
        q_holm_stepdown_brand_screen,
    )

    holm = q_holm_stepdown_brand_screen(spark, SF).collect()
    bh = q_bh_fdr_brand_screen(spark, SF).collect()
    assert all(r["m_tests"] == 25 for r in holm)
    assert all(r["m_tests"] == 25 for r in bh)
    assert all(r["threshold_milli"] is not None for r in holm)
    assert all(r["threshold_milli"] is not None for r in bh)


# ------------------------------------------------------- Mann-Kendall tie term


def test_mann_kendall_tie_correction_planted():
    """Planted daily series with deliberate ties: 10, 20, 20, 30, 20.
    S over i<j sign pairs; tie group t=3 at y=20 contributes
    t(t-1)(2t+5) = 3*2*11 = 66 to the correction."""
    from ecom_churn_lakehouse_spark.queries.inference_queries import _MK_SQL

    con = duckdb.connect()
    con.execute(
        """
        CREATE VIEW orders AS
        SELECT * FROM (VALUES
            (DATE '1995-01-01', CAST(0.10 AS DOUBLE)),
            (DATE '1995-01-02', CAST(0.20 AS DOUBLE)),
            (DATE '1995-01-03', CAST(0.20 AS DOUBLE)),
            (DATE '1995-01-04', CAST(0.30 AS DOUBLE)),
            (DATE '1995-01-05', CAST(0.20 AS DOUBLE))
        ) AS t(o_orderdate, o_totalprice)
        """
    )
    row = con.sql(_MK_SQL).fetchone()
    cols = [d[0] for d in con.sql(_MK_SQL).description]
    r = dict(zip(cols, row))
    assert r["n_days"] == 5
    assert r["n_pairs"] == 10
    # pairs: (10,20)+ (10,20)+ (10,30)+ (10,20)+ (20,20)0 (20,30)+ (20,20)0
    #        (20,30)+ (20,20)0 (30,20)-  ->  S = 6 - 1 = 5
    assert r["s_stat"] == 5
    assert r["tie_term"] == 66
    # Var = (5*4*15 - 66)/18 = 234/18 = 13.0; z = (5-1)/sqrt(13)
    import math

    assert r["z_milli"] == math.floor((5 - 1) / math.sqrt(13.0) * 1000)


def test_mann_kendall_fixture_has_tie_term_column(spark):
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_mann_kendall_trend,
    )

    row = q_mann_kendall_trend(spark, SF).collect()[0]
    assert row["tie_term"] >= 0
    assert row["tie_term"] % 2 == 0  # t(t-1)(2t+5) is always even


# ------------------------------------------------- floored-critical convention


def test_rejection_thresholds_use_floored_millis():
    """Every floored-milli statistic must compare against the FLOORED
    critical value so both sides share one quantization convention."""
    import re
    from pathlib import Path

    qdir = Path("ecom_churn_lakehouse_spark/queries")
    src = "".join(p.read_text() for p in qdir.glob("*.py"))
    # the historical off-by-one literals must not reappear in a
    # rejection comparison (floor(9.48773*1000)=9487, floor(1.95996e3)=1959,
    # floor(2.37193*1000)=2371)
    for bad in (r"> 9488", r"> 1960 AS reject", r"> 2372"):
        assert not re.search(bad, src), f"rounded critical leaked: {bad}"


# ----------------------------------------------------- cramers_v densification


def test_cramers_v_dense_spine_counts(spark):
    """The contingency spine must be |levels_a| x |levels_b| dense:
    chi2 contributions from empty cells included (r7 advice fix).
    priority_x_status at the fixture has 5x3 = 15 spine cells while
    observed cells can be fewer; the Pearson identity chi2 >= 0 and
    V <= 1000 still hold, and both engines agree (oracle-checked)."""
    from ecom_churn_lakehouse_spark.queries.feature_queries import (
        q_cramers_v_matrix,
    )

    rows = {r["pair"]: r for r in q_cramers_v_matrix(spark, SF).collect()}
    assert set(rows) == {
        "segment_x_region",
        "segment_x_priority",
        "priority_x_status",
    }
    for r in rows.values():
        assert r["chi2_micro"] >= 0
        assert 0 <= r["cramers_v_milli"] <= 1000
