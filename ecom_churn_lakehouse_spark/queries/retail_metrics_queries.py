"""Retail-economics operators: index-number decomposition, cohort LTV,
and interval self-overlap (SURVEY §2.6 analytics widening, §7.7).

- ``unit_value_index_decomposition`` — the value/price/volume index
  triple per brand between two years, in exact ppm: value index
  (rev2/rev1), volume index (qty2/qty1) and unit-value price index
  (rev2*qty1 / rev1*qty2). The multiplicative identity value =
  price x volume holds up to ppm flooring and is asserted in tests —
  the classic "how much of the revenue change was price vs volume"
  decomposition, done entirely in DECIMAL(38) cross-products so no
  division happens before the final DIV.
- ``cohort_ltv_curve`` — cumulative revenue per acquisition cohort by
  cohort age in months: the lifetime-value curve that sits behind
  every retention/payback decision. Cohort = first-order month per
  customer (one aggregate), then one grouped sum and one per-cohort
  cumulative window over the tiny (cohort x age) frame.
- ``order_interval_overlap_pairs`` — interval self-join: pairs of
  orders of the SAME customer whose 7-day fulfillment windows
  overlap, with the exact overlap length in days. The equi-key
  (customer) bounds the join; the range predicate runs inside each
  key group — the standard way an interval join stays linear when a
  natural equi-key exists (the keyless variant needs date-binning,
  as in the asof family).

Integer discipline: revenue in exact micros (index entry) or cents
(LTV), indices in exact ppm via DIV on non-negative operands, overlap
lengths in whole days.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ecom_churn_lakehouse_spark.registry import register
from ecom_churn_lakehouse_spark.sources import load_table

# --------------------------------------------------------------------------
# Unit-value index decomposition between two years.
# --------------------------------------------------------------------------

_Y1, _Y2 = 1996, 1997

_UVI_SQL = f"""
WITH yr AS (
    SELECT p.p_brand AS brand,
           CAST(year(l.l_shipdate) AS INTEGER) AS yr,
           CAST(SUM(CAST(CAST(l.l_extendedprice * (1 - l.l_discount)
                              AS DECIMAL(18,6)) * 1000000 AS BIGINT))
                AS BIGINT) AS rev_micros,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE year(l.l_shipdate) IN ({_Y1}, {_Y2})
    GROUP BY p.p_brand, year(l.l_shipdate)
),
wide AS (
    SELECT a.brand,
           a.rev_micros AS rev1_micros, b.rev_micros AS rev2_micros,
           a.qty AS qty1, b.qty AS qty2
    FROM yr a JOIN yr b ON a.brand = b.brand
    WHERE a.yr = {_Y1} AND b.yr = {_Y2}
      AND a.rev_micros > 0 AND a.qty > 0 AND b.qty > 0
)
SELECT brand, rev1_micros, rev2_micros, qty1, qty2,
       CAST(CAST(rev2_micros AS HUGEINT) * 1000000
            // rev1_micros AS BIGINT) AS value_index_ppm,
       CAST(CAST(qty2 AS HUGEINT) * 1000000 // qty1 AS BIGINT)
           AS volume_index_ppm,
       CAST(CAST(rev2_micros AS HUGEINT) * qty1 * 1000000
            // (CAST(rev1_micros AS HUGEINT) * qty2) AS BIGINT)
           AS unit_value_index_ppm
FROM wide
"""


@register(
    "unit_value_index_decomposition",
    _UVI_SQL,
    doc=f"Value/volume/unit-value-price index triple per brand, "
    f"{_Y1}->{_Y2}, exact ppm: value = rev2/rev1, volume = qty2/qty1, "
    "price = (rev2*qty1)/(rev1*qty2) — all as DECIMAL(38) cross-"
    "products with one final DIV, so value ~= price x volume holds to "
    "ppm flooring (asserted in tests). One fact aggregate per year "
    "(single scan, map-side combinable), then a 25-brand self-join.",
)
def q_unit_value_index_decomposition(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    yr = (
        li.filter(F.year("l_shipdate").isin(_Y1, _Y2))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.year("l_shipdate").cast("int").alias("yr"),
        )
        .agg(
            F.sum(
                (
                    (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    .cast("decimal(18,6)")
                    * 1000000
                ).cast("long")
            )
            .cast("long")
            .alias("rev_micros"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
        )
    )
    a = yr.filter(F.col("yr") == _Y1).select(
        "brand",
        F.col("rev_micros").alias("rev1_micros"),
        F.col("qty").alias("qty1"),
    )
    b = yr.filter(F.col("yr") == _Y2).select(
        "brand",
        F.col("rev_micros").alias("rev2_micros"),
        F.col("qty").alias("qty2"),
    )
    wide = a.join(b, "brand").filter(
        (F.col("rev1_micros") > 0) & (F.col("qty1") > 0) & (F.col("qty2") > 0)
    )
    return wide.select(
        "brand",
        "rev1_micros",
        "rev2_micros",
        "qty1",
        "qty2",
        F.expr(
            "CAST(CAST(rev2_micros AS DECIMAL(38,0)) * 1000000"
            " DIV rev1_micros AS BIGINT)"
        ).alias("value_index_ppm"),
        F.expr(
            "CAST(CAST(qty2 AS DECIMAL(38,0)) * 1000000 DIV qty1 AS BIGINT)"
        ).alias("volume_index_ppm"),
        F.expr(
            "CAST(CAST(rev2_micros AS DECIMAL(38,0)) * qty1 * 1000000"
            " DIV (CAST(rev1_micros AS DECIMAL(38,0)) * qty2) AS BIGINT)"
        ).alias("unit_value_index_ppm"),
    )


# --------------------------------------------------------------------------
# Cohort LTV curve.
# --------------------------------------------------------------------------

_LTV_SQL = """
WITH om AS (
    SELECT o_custkey,
           CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                AS INTEGER) AS ym,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
    FROM orders
),
coh AS (
    SELECT o_custkey, CAST(MIN(ym) AS INTEGER) AS cohort_ym FROM om
    GROUP BY o_custkey
),
sz AS (
    SELECT cohort_ym, CAST(COUNT(*) AS BIGINT) AS cohort_size
    FROM coh GROUP BY cohort_ym
),
rev AS (
    SELECT c.cohort_ym, CAST(o.ym - c.cohort_ym AS INTEGER) AS age_months,
           CAST(SUM(o.cents) AS BIGINT) AS rev_cents
    FROM om o JOIN coh c ON o.o_custkey = c.o_custkey
    GROUP BY c.cohort_ym, o.ym - c.cohort_ym
)
SELECT CAST(r.cohort_ym // 12 AS INTEGER) AS cohort_year,
       CAST(r.cohort_ym % 12 + 1 AS INTEGER) AS cohort_month,
       r.age_months,
       s.cohort_size,
       r.rev_cents,
       CAST(SUM(r.rev_cents) OVER (
           PARTITION BY r.cohort_ym ORDER BY r.age_months
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum_rev_cents
FROM rev r JOIN sz s ON r.cohort_ym = s.cohort_ym
"""


@register(
    "cohort_ltv_curve",
    _LTV_SQL,
    doc="Cumulative revenue per acquisition cohort by age in months — "
    "the LTV curve behind retention/payback decisions. Cohort month "
    "is one per-customer MIN aggregate; revenue is one grouped sum to "
    "the (cohort x age) frame, and the cumulative window runs over "
    "that tiny frame only. Exact cents; cohort months as integer "
    "year/month columns (no cross-engine date formatting surface).",
)
def q_cohort_ltv_curve(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    om = orders.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("int")
        .alias("ym"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    coh = om.groupBy("o_custkey").agg(F.min("ym").cast("int").alias("cohort_ym"))
    sz = coh.groupBy("cohort_ym").agg(F.count("*").cast("long").alias("cohort_size"))
    rev = (
        om.join(coh, "o_custkey")
        .groupBy(
            "cohort_ym",
            (F.col("ym") - F.col("cohort_ym")).cast("int").alias("age_months"),
        )
        .agg(F.sum("cents").cast("long").alias("rev_cents"))
    )
    w = (
        Window.partitionBy("cohort_ym")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        rev.join(F.broadcast(sz), "cohort_ym")
        .select(
            F.expr("CAST(cohort_ym DIV 12 AS INT)").alias("cohort_year"),
            (F.col("cohort_ym") % 12 + 1).cast("int").alias("cohort_month"),
            "age_months",
            "cohort_size",
            "rev_cents",
            F.sum("rev_cents").over(w).cast("long").alias("cum_rev_cents"),
        )
    )


# --------------------------------------------------------------------------
# Interval self-overlap pairs.
# --------------------------------------------------------------------------

_WINDOW_DAYS = 7

_OVERLAP_SQL = f"""
WITH iv AS (
    SELECT o_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS s,
           CAST(o_orderdate AS DATE) + {_WINDOW_DAYS} AS e
    FROM orders
)
SELECT a.o_custkey AS custkey,
       a.o_orderkey AS orderkey_a,
       b.o_orderkey AS orderkey_b,
       CAST(date_diff('day',
                      CASE WHEN a.s >= b.s THEN a.s ELSE b.s END,
                      CASE WHEN a.e <= b.e THEN a.e ELSE b.e END)
            AS BIGINT) AS overlap_days
FROM iv a JOIN iv b
  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
WHERE a.s < b.e AND b.s < a.e
"""


@register(
    "order_interval_overlap_pairs",
    _OVERLAP_SQL,
    doc=f"Interval self-join: order pairs of the same customer whose "
    f"{_WINDOW_DAYS}-day fulfillment windows overlap, with exact "
    "overlap length in days. The customer equi-key bounds the join "
    "(per-key order counts are small and stay small at scale — "
    "fan-out is per-customer quadratic only in their own recent "
    "orders); a keyless interval join would add date-binning, as the "
    "asof family does.",
)
def q_order_interval_overlap_pairs(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    iv = orders.select(
        "o_custkey",
        "o_orderkey",
        F.to_date("o_orderdate").alias("s"),
        F.date_add(F.to_date("o_orderdate"), _WINDOW_DAYS).alias("e"),
    )
    a = iv.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey_a"),
        F.col("s").alias("sa"),
        F.col("e").alias("ea"),
    )
    b = iv.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey_b"),
        F.col("s").alias("sb"),
        F.col("e").alias("eb"),
    )
    return (
        a.join(b, "custkey")
        .filter(
            (F.col("orderkey_a") < F.col("orderkey_b"))
            & (F.col("sa") < F.col("eb"))
            & (F.col("sb") < F.col("ea"))
        )
        .select(
            "custkey",
            "orderkey_a",
            "orderkey_b",
            F.datediff(
                F.least("ea", "eb"), F.greatest("sa", "sb")
            )
            .cast("long")
            .alias("overlap_days"),
        )
    )


# --------------------------------------------------------------------------
# Pareto frontier (2-D skyline).
# --------------------------------------------------------------------------

_SKYLINE_SQL = """
WITH per_order AS (
    SELECT o.o_orderkey,
           CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents,
           CAST(MAX(date_diff('day', o.o_orderdate, l.l_shipdate)) AS INTEGER)
               AS fulfillment_days
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_totalprice
),
day_max AS (
    SELECT fulfillment_days, MAX(price_cents) AS pmax
    FROM per_order GROUP BY fulfillment_days
),
frontier_days AS (
    SELECT fulfillment_days, pmax,
           MAX(pmax) OVER (ORDER BY fulfillment_days
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_best
    FROM day_max
)
SELECT p.o_orderkey, p.price_cents, p.fulfillment_days
FROM per_order p
JOIN frontier_days f
  ON f.fulfillment_days = p.fulfillment_days AND p.price_cents = f.pmax
WHERE f.prev_best IS NULL OR f.pmax > f.prev_best
"""


@register(
    "pareto_frontier_orders",
    _SKYLINE_SQL,
    doc="2-D skyline operator: orders not dominated on (order value "
    "maximize, fulfillment latency minimize) — the value-latency "
    "Pareto frontier, with equal-(value, latency) ties all kept (no "
    "strict dominance between them). Scalable skyline shape: the fact "
    "reduces to one max-price row PER LATENCY DAY first, the strict "
    "running-max frontier test runs on that tiny frame, and a semi "
    "join back recovers the achieving orders - no global window ever "
    "touches the fact, unlike the textbook sort-based skyline.",
)
def q_pareto_frontier_orders(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").alias("price_cents"),
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "price_cents")
        .agg(
            F.max(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")))
            .cast("int")
            .alias("fulfillment_days")
        )
    )
    day_max = per_order.groupBy("fulfillment_days").agg(
        F.max("price_cents").alias("pmax")
    )
    w = (
        Window.orderBy("fulfillment_days")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier_days = (
        day_max.select(
            "fulfillment_days", "pmax", F.max("pmax").over(w).alias("prev_best")
        )
        .filter(F.col("prev_best").isNull() | (F.col("pmax") > F.col("prev_best")))
        .select(
            F.col("fulfillment_days").alias("f_days"), F.col("pmax").alias("f_pmax")
        )
    )
    return (
        per_order.join(
            F.broadcast(frontier_days),
            (per_order.fulfillment_days == F.col("f_days"))
            & (per_order.price_cents == F.col("f_pmax")),
        )
        .select("o_orderkey", "price_cents", "fulfillment_days")
    )


# --------------------------------------------------------------------------
# Daily-revenue autocorrelation components at lags 1/7/28.
# --------------------------------------------------------------------------

_ACF_LAGS = (1, 7, 28)

#: Pearson r over the lagged pairs from EXACT integer components; the
#: only float is this one shared signed-FLOOR expression (sqrt is
#: correctly rounded). n*Sxy - Sx*Sy etc. evaluate in double - the
#: components themselves stay exact on the output surface.
_ACF_R_MILLI = (
    "CAST(FLOOR((CAST(n_pairs AS DOUBLE) * CAST(sum_xy_dec AS DOUBLE)"
    " - CAST(sum_x AS DOUBLE) * CAST(sum_y AS DOUBLE))"
    " / sqrt((CAST(n_pairs AS DOUBLE) * CAST(sum_xx_dec AS DOUBLE)"
    "         - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE))"
    "        * (CAST(n_pairs AS DOUBLE) * CAST(sum_yy_dec AS DOUBLE)"
    "           - CAST(sum_y AS DOUBLE) * CAST(sum_y AS DOUBLE)))"
    " * 1000.0) AS BIGINT)"
)

_ACF_SQL = f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS cents
    FROM orders GROUP BY 1
),
lags AS (SELECT UNNEST([{", ".join(str(l) for l in _ACF_LAGS)}]) AS lag),
pairs AS (
    SELECT l.lag, a.cents AS x, b.cents AS y
    FROM daily a
    CROSS JOIN lags l
    JOIN daily b ON b.d = a.d + l.lag
),
comp AS (
    SELECT CAST(lag AS INTEGER) AS lag,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(x) AS BIGINT) AS sum_x,
           CAST(SUM(y) AS BIGINT) AS sum_y,
           CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                AS DECIMAL(38,0)) AS sum_xy_dec,
           CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
                AS DECIMAL(38,0)) AS sum_xx_dec,
           CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                AS DECIMAL(38,0)) AS sum_yy_dec
    FROM pairs GROUP BY lag
)
SELECT lag, n_pairs, sum_x, sum_y,
       CAST(sum_xy_dec AS VARCHAR) AS sum_xy,
       CAST(sum_xx_dec AS VARCHAR) AS sum_xx,
       CAST(sum_yy_dec AS VARCHAR) AS sum_yy,
       {_ACF_R_MILLI} AS r_milli
FROM comp
"""


@register(
    "revenue_autocorr_components",
    _ACF_SQL,
    doc=f"Daily-revenue autocorrelation at lags {_ACF_LAGS}: Pearson r "
    "between the series and its lag from EXACT integer components "
    "(pair count, sums, and cross/self products accumulated in "
    "DECIMAL(38,0) cents^2, surfaced as VARCHAR); the only float is "
    "the final r through one shared signed-FLOOR IEEE expression. "
    "Lag-7 strong + lag-1 weak reads as weekly seasonality — the "
    "seasonality detector behind dow_seasonality_profile. Scale: the "
    "fact reduces to the DAY grain first (one map-combinable agg); "
    "the lag join and all products run on the |days| frame (3650 rows "
    "per decade regardless of fact size).",
)
def q_revenue_autocorr_components(spark, sf_dir):
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    lags = F.array(*[F.lit(l) for l in _ACF_LAGS])
    a = daily.select(
        F.explode(lags).alias("lag"),
        F.col("d"),
        F.col("cents").alias("x"),
    ).withColumn("join_d", F.expr("date_add(d, lag)"))
    b = daily.select(F.col("d").alias("join_d"), F.col("cents").alias("y"))
    pairs = a.join(b, on="join_d").select("lag", "x", "y")
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    comp = pairs.groupBy(F.col("lag").cast("int").alias("lag")).agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("x").cast("long").alias("sum_x"),
        F.sum("y").cast("long").alias("sum_y"),
        F.sum(xd * yd).cast("decimal(38,0)").alias("sum_xy_dec"),
        F.sum(xd * xd).cast("decimal(38,0)").alias("sum_xx_dec"),
        F.sum(yd * yd).cast("decimal(38,0)").alias("sum_yy_dec"),
    )
    return comp.select(
        "lag",
        "n_pairs",
        "sum_x",
        "sum_y",
        F.col("sum_xy_dec").cast("string").alias("sum_xy"),
        F.col("sum_xx_dec").cast("string").alias("sum_xx"),
        F.col("sum_yy_dec").cast("string").alias("sum_yy"),
        F.expr(_ACF_R_MILLI).alias("r_milli"),
    )


# --------------------------------------------------------------------------
# Rolling exact median of daily revenue (order statistic in a window).
# --------------------------------------------------------------------------

_RMED_DAYS = 15

_RMED_SQL = f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS cents
    FROM orders GROUP BY 1
),
contrib AS (
    SELECT t.d AS target_d, s.cents
    FROM daily s JOIN daily t ON t.d BETWEEN s.d AND s.d + {_RMED_DAYS - 1}
)
SELECT target_d AS d,
       CAST(COUNT(*) AS INTEGER) AS n_days_in_window,
       CAST(quantile_disc(cents, 0.5) AS BIGINT) AS median_cents,
       MIN(cents) AS min_cents,
       MAX(cents) AS max_cents
FROM contrib
GROUP BY target_d
"""


@register(
    "rolling_median_daily_revenue",
    _RMED_SQL,
    doc=f"Trailing {_RMED_DAYS}-day EXACT median (plus min/max) of "
    "daily revenue — the robust trend line a monitoring dashboard "
    "draws where a rolling mean is outlier-distorted. Spark has no "
    "median window function, so the operator re-keys each day's "
    "revenue to the target days it contributes to (a row-local "
    f"{_RMED_DAYS}-way explode on the DAY-grain frame) and takes "
    "percentile_disc(0.5) per target day — discrete percentile, so "
    "the result is an actual observed BIGINT cents value, bit-equal "
    "to DuckDB's quantile_disc. Scale: the fact reduces to the day "
    "grain first; the explode+agg touches |days|*window rows "
    "(~55k/decade) regardless of fact size.",
)
def q_rolling_median_daily_revenue(spark, sf_dir):
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    contrib = daily.select(
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), _RMED_DAYS - 1))
        ).alias("target_d"),
        "cents",
    ).join(
        # only REAL days are targets (the oracle's join formulation
        # draws targets from the daily frame; the explode overshoots
        # past the last data day without this semi-join)
        daily.select(F.col("d").alias("target_d")),
        on="target_d",
        how="left_semi",
    )
    return contrib.groupBy(F.col("target_d").alias("d")).agg(
        F.count("*").cast("int").alias("n_days_in_window"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)")
        .cast("long")
        .alias("median_cents"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
    )


# ------------------------------------- association rules (market basket)

_RULES_MIN_CO = 2
_RULES_TOPN = 25

_BASKET_RULES_SQL = f"""
WITH items AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n_baskets AS (
    SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS nb FROM items
),
item_counts AS (
    SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt FROM items GROUP BY 1
),
co AS (
    SELECT a.l_partkey AS pa, b.l_partkey AS pb, CAST(COUNT(*) AS BIGINT) AS cab
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= {_RULES_MIN_CO}
),
rules AS (
    SELECT pa AS antecedent, pb AS consequent, cab,
           ca.cnt AS cnt_a, cb.cnt AS cnt_b
    FROM co JOIN item_counts ca ON ca.l_partkey = co.pa
            JOIN item_counts cb ON cb.l_partkey = co.pb
    UNION ALL
    SELECT pb, pa, cab, cb.cnt, ca.cnt
    FROM co JOIN item_counts ca ON ca.l_partkey = co.pa
            JOIN item_counts cb ON cb.l_partkey = co.pb
),
scored AS (
    SELECT antecedent, consequent, cab, cnt_a, cnt_b,
           CAST(cab * 1000000 // nb AS BIGINT) AS support_ppm,
           CAST(cab * 1000000 // cnt_a AS BIGINT) AS confidence_ppm,
           CAST(cab * nb AS BIGINT) AS lift_num,
           CAST(cnt_a * cnt_b AS BIGINT) AS lift_den,
           cab * nb > cnt_a * cnt_b AS positive_lift
    FROM rules, n_baskets
)
SELECT * FROM scored
ORDER BY confidence_ppm DESC, antecedent, consequent
LIMIT {_RULES_TOPN}
"""


@register(
    "basket_rules_support_confidence",
    _BASKET_RULES_SQL,
    doc=f"Association-rule mining over order baskets: co-occurring part "
    f"pairs (>= {_RULES_MIN_CO} shared baskets) scored as directional "
    "rules with exact integer support and confidence (ppm, "
    "non-negative DIV) and lift surfaced as the exact integer "
    "numerator/denominator pair cab*N vs cnt_a*cnt_b (no division: "
    "cab*N stays under int64 even at ~1e8-basket scale, and the "
    "boolean reads off the comparison) — top-"
    f"{_RULES_TOPN} by confidence with a total tie-break. Scale: "
    "pair generation is a self-join keyed on the ORDER, so work is "
    "sum over baskets of size^2 (basket sizes are bounded small), "
    "never catalog x catalog; item counts join back broadcast-size. "
    "The recommendation/affinity query next to "
    "copurchase_link_prediction's graph scores.",
)
def q_basket_rules_support_confidence(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    items = li.distinct()
    nb = items.agg(
        F.countDistinct("l_orderkey").cast("long").alias("nb")
    )
    counts = items.groupBy("l_partkey").agg(
        F.count("*").cast("long").alias("cnt")
    )
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    co = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").cast("long").alias("cab"))
        .filter(F.col("cab") >= _RULES_MIN_CO)
    )
    ca = counts.select(F.col("l_partkey").alias("pa"), F.col("cnt").alias("cnt_pa"))
    cb = counts.select(F.col("l_partkey").alias("pb"), F.col("cnt").alias("cnt_pb"))
    joined = co.join(ca, "pa").join(cb, "pb")
    fwd = joined.select(
        F.col("pa").alias("antecedent"),
        F.col("pb").alias("consequent"),
        "cab",
        F.col("cnt_pa").alias("cnt_a"),
        F.col("cnt_pb").alias("cnt_b"),
    )
    rev = joined.select(
        F.col("pb").alias("antecedent"),
        F.col("pa").alias("consequent"),
        "cab",
        F.col("cnt_pb").alias("cnt_a"),
        F.col("cnt_pa").alias("cnt_b"),
    )
    scored = (
        fwd.unionByName(rev)
        .crossJoin(F.broadcast(nb))
        .select(
            "antecedent",
            "consequent",
            "cab",
            "cnt_a",
            "cnt_b",
            F.expr("CAST(cab * 1000000 DIV nb AS BIGINT)").alias("support_ppm"),
            F.expr("CAST(cab * 1000000 DIV cnt_a AS BIGINT)").alias(
                "confidence_ppm"
            ),
            (F.col("cab") * F.col("nb")).cast("long").alias("lift_num"),
            (F.col("cnt_a") * F.col("cnt_b")).cast("long").alias("lift_den"),
            (F.col("cab") * F.col("nb") > F.col("cnt_a") * F.col("cnt_b")).alias(
                "positive_lift"
            ),
        )
    )
    return scored.orderBy(
        F.col("confidence_ppm").desc(), "antecedent", "consequent"
    ).limit(_RULES_TOPN)


# --------------------------------------------------- ABC classification

_ABC_SQL = """
WITH part_rev AS (
    SELECT l_partkey AS part_key,
           CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(18,6)) * 1000000 AS BIGINT))
                AS BIGINT) AS rev_micros
    FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT CAST(SUM(rev_micros) AS BIGINT) AS total_micros FROM part_rev),
ranked AS (
    SELECT part_key, rev_micros,
           CAST(SUM(rev_micros) OVER (ORDER BY rev_micros DESC, part_key)
                AS BIGINT) AS cum_micros
    FROM part_rev
),
classed AS (
    -- HUGEINT threshold cross-products: cum*100 overflows int64 at
    -- the 10x probe scale
    SELECT CASE WHEN CAST(cum_micros AS HUGEINT) * 10
                     <= CAST((SELECT total_micros FROM tot) AS HUGEINT) * 8
                THEN 'A'
                WHEN CAST(cum_micros AS HUGEINT) * 100
                     <= CAST((SELECT total_micros FROM tot) AS HUGEINT) * 95
                THEN 'B'
                ELSE 'C' END AS abc_class,
           rev_micros
    FROM ranked
)
SELECT abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev_micros) AS BIGINT) AS class_micros,
       -- dollar-grain share: pure int64 on both engines (DECIMAL //
       -- rounds before flooring in DuckDB — off-by-one vs Spark DIV)
       CAST((SUM(rev_micros) // 1000000) * 10000
            // ((SELECT total_micros FROM tot) // 1000000)
            AS BIGINT) AS share_bp
FROM classed
GROUP BY abc_class
ORDER BY abc_class
"""


@register(
    "abc_inventory_classes",
    _ABC_SQL,
    doc="ABC inventory classification: parts ranked by discounted "
    "revenue, class A while the cumulative share stays within 80%, "
    "B to 95%, C after — the Pareto cut every inventory policy and "
    "slotting decision starts from (pareto_frontier_orders' sibling "
    "at the part grain). Revenue is exact integer micros (price*"
    "(1-discount) is exact at 4 decimals, DECIMAL(18,6) carries it "
    "losslessly), thresholds compare integer cross-products (cum*10 "
    "vs total*8 — no division anywhere except the final dollar-grain "
    "share_bp, pure int64 on both engines because DuckDB's DECIMAL "
    "// rounds before flooring while Spark DIV truncates exactly). "
    "Scale: the fact reduces to the part grain in one "
    "map-combinable agg; the ordered cumulative window runs on the "
    "part DIMENSION (~fixed cardinality), not the fact — at 100 TB "
    "this is a range-partitioned sort of ~millions of rows. The "
    "threshold cross-products run in DECIMAL(38)/HUGEINT because "
    "cum*100 exceeds int64 already at the 10x probe (caught there); "
    "the decimal compare touches only the part-grain frame.",
)
def q_abc_inventory_classes(spark, sf_dir):
    part_rev = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("part_key"))
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                )
                .cast("decimal(18,6)")
                .cast("decimal(24,6)")
                * 1000000
            )
            .cast("long")
            .alias("rev_micros")
        )
    )
    total = part_rev.agg(
        F.sum("rev_micros").cast("long").alias("total_micros")
    )
    w = Window.orderBy(F.col("rev_micros").desc(), "part_key")
    ranked = part_rev.select(
        "rev_micros", F.sum("rev_micros").over(w).cast("long").alias("cum_micros")
    )
    # threshold cross-products in DECIMAL: cum*100 overflows int64 at
    # the 10x probe (caught there — total revenue micros ~2.3e17)
    cum_d = F.col("cum_micros").cast("decimal(38,0)")
    tot_d = F.col("total_micros").cast("decimal(38,0)")
    classed = ranked.crossJoin(F.broadcast(total)).select(
        F.when(cum_d * 10 <= tot_d * 8, "A")
        .when(cum_d * 100 <= tot_d * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
        "rev_micros",
        "total_micros",
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum("rev_micros").cast("long").alias("class_micros"),
            F.expr(
                "CAST((SUM(rev_micros) DIV 1000000) * 10000"
                " DIV (MAX(total_micros) DIV 1000000) AS BIGINT)"
            ).alias("share_bp"),
        )
        .orderBy("abc_class")
    )


# ------------------------------------------------ Apriori 3-itemsets

#: Frequency cut is TOP-N BY SUPPORT, not a fixed absolute min-support:
#: a fixed support >= 2 went VACUOUS at sf0.1 (the part space grows
#: with SF, so repeated triples thin out — caught by the round-9
#: full-registry sf0.1 sweep, exactly the fixed-threshold class the
#: probe gotcha list warns about). Top-N by (support DESC, items ASC)
#: is deterministic and non-empty at every SF.
_TRIPLES_MIN_SUPPORT = 1
_TRIPLES_TOPN = 25

#: ``MATERIALIZED`` on items/pairs is load-bearing for the oracle:
#: DuckDB re-inlines a CTE per REFERENCE (the Bradley-Terry r8
#: catch), and pairs is referenced three times — the re-inlined plan
#: took 187 s at sf0.1 vs 1.6 s materialized (identical rows).
_TRIPLES_SQL = f"""
WITH items AS MATERIALIZED (
    SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
),
triples AS (
    SELECT a.pk AS item_a, b.pk AS item_b, c.pk AS item_c,
           CAST(COUNT(*) AS BIGINT) AS support_abc
    FROM items a
    JOIN items b ON b.ok = a.ok AND b.pk > a.pk
    JOIN items c ON c.ok = a.ok AND c.pk > b.pk
    GROUP BY a.pk, b.pk, c.pk
    HAVING COUNT(*) >= {_TRIPLES_MIN_SUPPORT}
),
pairs AS MATERIALIZED (
    SELECT a.pk AS pa, b.pk AS pb, CAST(COUNT(*) AS BIGINT) AS cab
    FROM items a JOIN items b ON b.ok = a.ok AND b.pk > a.pk
    GROUP BY a.pk, b.pk
)
SELECT t.item_a, t.item_b, t.item_c, t.support_abc,
       ab.cab AS support_ab, ac.cab AS support_ac, bc.cab AS support_bc
FROM triples t
JOIN pairs ab ON ab.pa = t.item_a AND ab.pb = t.item_b
JOIN pairs ac ON ac.pa = t.item_a AND ac.pb = t.item_c
JOIN pairs bc ON bc.pa = t.item_b AND bc.pb = t.item_c
ORDER BY t.support_abc DESC, t.item_a, t.item_b, t.item_c
LIMIT {_TRIPLES_TOPN}
"""


@register(
    "apriori_triple_itemsets",
    _TRIPLES_SQL,
    doc=f"Top-{_TRIPLES_TOPN} frequent 3-itemsets by support with "
    "their three pairwise supports — the k=3 Apriori step above "
    "basket_rules_support_confidence's pair rules. The anti-monotone "
    "property support_abc <= min(pairwise) is surfaced as columns "
    "and pinned in tests. The frequency cut is top-N by (support "
    "DESC, items ASC), not a fixed absolute min-support — an absolute "
    "cut goes vacuous as the item space grows with corpus size "
    "(caught empty at sf0.1 by the round-9 full sweep). Enumeration "
    "is keyed on the BASKET (orderkey) with strict item ordering, so "
    "each triple is built once and work is sum(basket_size^3)/6 — "
    "bounded because real basket sizes are bounded (TPC-H <= 7 "
    "lines); for unbounded baskets the classic Apriori prune (only "
    "extend FREQUENT pairs) drops in as a semi-join on the pair "
    "relation before the third leg, trading a join for the cubic "
    "term. Scale: everything is equi-keyed on orderkey; the triple "
    "frame reduces map-side before the global top-25 sort-limit.",
)
def q_apriori_triple_itemsets(spark, sf_dir):
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    a = items.select("ok", F.col("pk").alias("item_a"))
    b = items.select(F.col("ok").alias("okb"), F.col("pk").alias("item_b"))
    c = items.select(F.col("ok").alias("okc"), F.col("pk").alias("item_c"))
    triples = (
        a.join(b, (F.col("okb") == F.col("ok")) & (F.col("item_b") > F.col("item_a")))
        .join(c, (F.col("okc") == F.col("ok")) & (F.col("item_c") > F.col("item_b")))
        .groupBy("item_a", "item_b", "item_c")
        .agg(F.count("*").cast("long").alias("support_abc"))
        .filter(F.col("support_abc") >= _TRIPLES_MIN_SUPPORT)
    )
    pa = items.select(F.col("ok").alias("okp"), F.col("pk").alias("pa"))
    pb = items.select(F.col("ok").alias("okq"), F.col("pk").alias("pb"))
    pairs = (
        pa.join(pb, (F.col("okq") == F.col("okp")) & (F.col("pb") > F.col("pa")))
        .groupBy("pa", "pb")
        .agg(F.count("*").cast("long").alias("cab"))
        .localCheckpoint(eager=False)
    )
    ab = pairs.select(
        F.col("pa").alias("aa"), F.col("pb").alias("ab"), F.col("cab").alias("support_ab")
    )
    ac = pairs.select(
        F.col("pa").alias("ca"), F.col("pb").alias("cc"), F.col("cab").alias("support_ac")
    )
    bc = pairs.select(
        F.col("pa").alias("ba"), F.col("pb").alias("bb"), F.col("cab").alias("support_bc")
    )
    return (
        triples.join(
            ab,
            (F.col("aa") == F.col("item_a")) & (F.col("ab") == F.col("item_b")),
        )
        .join(
            ac,
            (F.col("ca") == F.col("item_a")) & (F.col("cc") == F.col("item_c")),
        )
        .join(
            bc,
            (F.col("ba") == F.col("item_b")) & (F.col("bb") == F.col("item_c")),
        )
        .select(
            "item_a",
            "item_b",
            "item_c",
            "support_abc",
            "support_ab",
            "support_ac",
            "support_bc",
        )
        .orderBy(F.col("support_abc").desc(), "item_a", "item_b", "item_c")
        .limit(_TRIPLES_TOPN)
    )


# ------------------------------------------------ HHI market concentration

#: HHI in ppm from exact int64 sums; kilo-dollar grain keeps rev^2
#: inside int64 (the piecewise-breakpoint lesson: DECIMAL->DOUBLE
#: casts diverge across engines above 2^53, int64->double does not).
_HHI_PPM = (
    "CAST(FLOOR(CAST(sumsq AS DOUBLE)"
    " / (CAST(total_kd AS DOUBLE) * CAST(total_kd AS DOUBLE))"
    " * 1000000.0) AS BIGINT)"
)

_HHI_SQL = f"""
WITH cells AS (
    SELECT c.c_mktsegment AS segment, p.p_brand AS brand,
           CAST(SUM(CAST(CAST(l.l_extendedprice * (1 - l.l_discount)
                              AS DECIMAL(18,6)) * 1000000 AS BIGINT))
                // 1000000000 AS BIGINT) AS rev_kd
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY c.c_mktsegment, p.p_brand
),
seg AS (
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n_brands,
           CAST(SUM(rev_kd) AS BIGINT) AS total_kd,
           CAST(SUM(rev_kd * rev_kd) AS BIGINT) AS sumsq,
           CAST(MAX(rev_kd) AS BIGINT) AS max_kd
    FROM cells GROUP BY segment
)
SELECT segment, n_brands, total_kd,
       {_HHI_PPM} AS hhi_ppm,
       CAST(max_kd * 10000 // total_kd AS BIGINT) AS top_brand_share_bp
FROM seg ORDER BY segment
"""


@register(
    "market_hhi_by_segment",
    _HHI_SQL,
    doc="Herfindahl-Hirschman concentration index of brand revenue "
    "within each market segment — the antitrust-standard scalar "
    "(sum of squared shares; 1e6/n_brands = perfectly even, 1e6 = "
    "monopoly) completing the concentration family next to "
    "revenue_gini_by_nation (inequality) and concentrated_suppliers "
    "(threshold screen). Revenue re-grains to exact kilo-dollars so "
    "rev^2 sums stay int64 (DECIMAL->DOUBLE casts diverge across "
    "engines above 2^53 — the piecewise-breakpoint lesson, applied "
    "preemptively here); HHI is one shared IEEE expression over two "
    "int64s. Scale: one fact pass to the (segment x brand) cell "
    "grain, then a 5-row rollup; the two dim joins broadcast.",
)
def q_market_hhi_by_segment(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        (
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,6)")
            .cast("decimal(24,6)")
            * 1000000
        )
        .cast("long")
        .alias("micros"),
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cells = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"), F.col("p_brand").alias("brand")
        )
        .agg(
            F.expr("CAST(SUM(micros) DIV 1000000000 AS BIGINT)").alias("rev_kd")
        )
    )
    seg = cells.groupBy("segment").agg(
        F.count("*").cast("long").alias("n_brands"),
        F.sum("rev_kd").cast("long").alias("total_kd"),
        F.sum(F.col("rev_kd") * F.col("rev_kd")).cast("long").alias("sumsq"),
        F.max("rev_kd").cast("long").alias("max_kd"),
    )
    return seg.select(
        "segment",
        "n_brands",
        "total_kd",
        F.expr(_HHI_PPM).alias("hhi_ppm"),
        F.expr("CAST(max_kd * 10000 DIV total_kd AS BIGINT)").alias(
            "top_brand_share_bp"
        ),
    ).orderBy("segment")


# ------------------------------------------------ newsvendor stock levels

#: Service levels evaluated: 50% (median), 90%, and the newsvendor
#: critical fractile cu/(cu+co) = 80% for unit margin 4x holding cost.
_NV_LEVELS = ((50, "q50_units"), (80, "q_critical_units"), (90, "q90_units"))

_NV_SQL = f"""
WITH daily AS (
    SELECT p.p_brand AS brand, CAST(l.l_shipdate AS DATE) AS d,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS BIGINT) AS units
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand, CAST(l.l_shipdate AS DATE)
)
SELECT brand,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(units) // COUNT(*) AS BIGINT) AS mean_units,
       {", ".join(
           f"CAST(percentile_disc(0.{lvl:02d}) WITHIN GROUP (ORDER BY units)"
           f" AS BIGINT) AS {name}" for lvl, name in _NV_LEVELS)},
       CAST(percentile_disc(0.80) WITHIN GROUP (ORDER BY units) AS BIGINT)
           - CAST(SUM(units) // COUNT(*) AS BIGINT) AS safety_stock_units
FROM daily GROUP BY brand ORDER BY brand
"""


@register(
    "newsvendor_stock_levels",
    _NV_SQL,
    doc="Newsvendor stocking levels per brand: exact daily-demand "
    "quantiles at 50/80/90% service levels (the 80% row is the "
    "critical fractile cu/(cu+co) for a 4:1 margin-to-holding-cost "
    "ratio — the newsvendor-optimal order-up-to point) plus the "
    "implied safety stock over mean demand. Demand reduces to the "
    "(brand x day) grain in one map-combinable agg; quantiles are "
    "percentile_disc (cross-engine exact per the round-5 boundary "
    "fixtures) over the CALENDAR-bounded daily frame — stocking "
    "policy at 100 TB costs one fact pass, and the quantile input "
    "never exceeds brands x days rows.",
)
def q_newsvendor_stock_levels(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.to_date("l_shipdate").alias("d"),
        F.col("l_quantity").cast("decimal(18,2)").alias("qty"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    daily = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), "d")
        .agg(F.sum("qty").cast("long").alias("units"))
    )
    q = lambda lvl: F.expr(  # noqa: E731
        f"CAST(percentile_disc(0.{lvl:02d}) WITHIN GROUP (ORDER BY units)"
        " AS BIGINT)"
    )
    return (
        daily.groupBy("brand")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.expr("CAST(SUM(units) DIV COUNT(*) AS BIGINT)").alias("mean_units"),
            q(50).alias("q50_units"),
            q(80).alias("q_critical_units"),
            q(90).alias("q90_units"),
            (q(80) - F.expr("CAST(SUM(units) DIV COUNT(*) AS BIGINT)")).alias(
                "safety_stock_units"
            ),
        )
        .orderBy("brand")
    )


# ------------------------------------------------ Lorenz curve deciles

_LORENZ_SQL = """
WITH cust AS (
    SELECT o_custkey,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS cents
    FROM orders GROUP BY o_custkey
),
ranked AS (
    SELECT cents,
           CAST(NTILE(10) OVER (ORDER BY cents, o_custkey) AS BIGINT)
               AS decile
    FROM cust
),
tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total_cents,
               CAST(COUNT(*) AS BIGINT) AS n FROM ranked),
per_decile AS (
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS decile_cents
    FROM ranked GROUP BY decile
)
SELECT d.decile, d.n_customers, d.decile_cents,
       CAST(SUM(d.decile_cents) OVER (ORDER BY d.decile) * 10000
            // t.total_cents AS BIGINT) AS cum_share_bp,
       CAST(SUM(d.n_customers) OVER (ORDER BY d.decile) * 10000
            // t.n AS BIGINT) AS cum_pop_bp
FROM per_decile d CROSS JOIN tot t
ORDER BY d.decile
"""


@register(
    "lorenz_curve_deciles",
    _LORENZ_SQL,
    doc="Lorenz curve at the customer-spend decile grain: cumulative "
    "revenue share vs cumulative population share for customers "
    "ordered poorest-first — the CURVE whose enclosed area "
    "revenue_gini_by_nation reduces to a scalar, and the relation "
    "behind every 'top X% of customers hold Y%' statement "
    "(customer_value_deciles ranks the other way and reports "
    "per-bucket stats, not the cumulative inequality profile). "
    "Exact cents; shares in exact basis points via non-negative "
    "DIV; cum_share*10000 stays int64 to ~9e14 total cents. "
    "Scale: entity agg, one global ntile (range-partitionable), "
    "then 10-row windows.",
)
def q_lorenz_curve_deciles(spark, sf_dir):
    cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.expr(
                "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                " AS BIGINT)) AS BIGINT)"
            ).alias("cents")
        )
    )
    ranked = cust.select(
        "cents",
        F.ntile(10)
        .over(Window.orderBy("cents", "o_custkey"))
        .cast("long")
        .alias("decile"),
    )
    tot = ranked.agg(
        F.sum("cents").cast("long").alias("total_cents"),
        F.count("*").cast("long").alias("n"),
    )
    per_decile = ranked.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("decile_cents"),
    )
    w = Window.orderBy("decile")
    return (
        per_decile.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            "decile_cents",
            F.expr(
                "CAST(SUM(decile_cents) OVER (ORDER BY decile) * 10000"
                " DIV total_cents AS BIGINT)"
            ).alias("cum_share_bp"),
            F.expr(
                "CAST(SUM(n_customers) OVER (ORDER BY decile) * 10000"
                " DIV n AS BIGINT)"
            ).alias("cum_pop_bp"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Round 9 fourth wave: EOQ (economic order quantity) stock policy.
# ---------------------------------------------------------------------------

_EOQ_ORDER_COST = 50  # S: fixed cost per replenishment order
_EOQ_HOLD_COST = 2    # H: holding cost per unit-year
#: Exact integer sqrt: floor(sqrt(double)) with the two-term boundary
#: correction (the mixture_temperature_allocation isqrt idiom).
_EOQ_ISQRT = (
    "(CAST(FLOOR(SQRT(CAST({n} AS DOUBLE))) AS BIGINT)"
    " - CASE WHEN CAST(FLOOR(SQRT(CAST({n} AS DOUBLE))) AS BIGINT)"
    "          * CAST(FLOOR(SQRT(CAST({n} AS DOUBLE))) AS BIGINT) > {n}"
    "        THEN 1 ELSE 0 END"
    " + CASE WHEN (CAST(FLOOR(SQRT(CAST({n} AS DOUBLE))) AS BIGINT) + 1)"
    "          * (CAST(FLOOR(SQRT(CAST({n} AS DOUBLE))) AS BIGINT) + 1)"
    "          <= {n}"
    "        THEN 1 ELSE 0 END)"
)
_EOQ_ARG = (
    f"(2 * d_annual * {_EOQ_ORDER_COST} // {_EOQ_HOLD_COST})"
)
_EOQ_UNITS = _EOQ_ISQRT.format(n=_EOQ_ARG)

_EOQ_SQL = f"""
WITH span AS (
    SELECT CAST(date_diff('day', MIN(CAST(o_orderdate AS DATE)),
                          MAX(CAST(o_orderdate AS DATE))) + 1 AS BIGINT)
               AS span_days
    FROM orders
),
demand AS (
    SELECT p.p_brand AS brand,
           CAST(SUM(CAST(CAST(l.l_quantity AS DECIMAL(18,2)) AS BIGINT))
                AS BIGINT) AS qty_total
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand
),
annual AS (
    SELECT brand, qty_total,
           CAST(qty_total * 365 // span_days AS BIGINT) AS d_annual
    FROM demand CROSS JOIN span
)
SELECT brand, qty_total, d_annual,
       CAST({_EOQ_UNITS} AS BIGINT) AS eoq_units,
       CAST(d_annual // GREATEST({_EOQ_UNITS}, 1) AS BIGINT)
           AS orders_per_year,
       CAST(365 * {_EOQ_UNITS} // GREATEST(d_annual, 1) AS BIGINT)
           AS cycle_days
FROM annual
ORDER BY brand
"""


@register(
    "eoq_stock_policy",
    _EOQ_SQL,
    doc=f"Economic order quantity per brand (Harris-Wilson EOQ = "
    f"sqrt(2DS/H), S={_EOQ_ORDER_COST} order cost, "
    f"H={_EOQ_HOLD_COST} unit-year holding cost): annualized demand "
    "from exact quantity sums over the fixture's exact day span, "
    "then the EOQ via the exact INTEGER sqrt (floor(sqrt) + "
    "two-term boundary correction — the isqrt idiom), plus the "
    "derived replenishment cadence (orders/year, cycle days) in "
    "pure integer division. The deterministic-demand classic "
    "beside newsvendor_stock_levels' stochastic single-period "
    "model: together they cover the two textbook inventory "
    "policies. Zero float anywhere. Scale: one scan-local reduce "
    "to the 25-brand grain + a 1-row span broadcast.",
)
def q_eoq_stock_policy(spark, sf_dir):
    from pyspark.sql import functions as F

    from ecom_churn_lakehouse_spark.sources import load_table

    span = load_table(spark, sf_dir, "orders").agg(
        (
            F.datediff(
                F.max(F.col("o_orderdate").cast("date")),
                F.min(F.col("o_orderdate").cast("date")),
            )
            + 1
        )
        .cast("long")
        .alias("span_days")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("decimal(18,2)").cast("long").alias("q"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    demand = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("brand")
        .agg(F.sum("q").cast("long").alias("qty_total"))
    )
    annual = demand.crossJoin(F.broadcast(span)).select(
        "brand",
        "qty_total",
        F.expr("CAST(qty_total * 365 DIV span_days AS BIGINT)").alias(
            "d_annual"
        ),
    )
    eoq = _EOQ_UNITS.replace("//", "DIV")
    return annual.select(
        "brand",
        "qty_total",
        "d_annual",
        F.expr(f"CAST({eoq} AS BIGINT)").alias("eoq_units"),
        F.expr(f"CAST(d_annual DIV GREATEST({eoq}, 1) AS BIGINT)").alias(
            "orders_per_year"
        ),
        F.expr(
            f"CAST(365 * {eoq} DIV GREATEST(d_annual, 1) AS BIGINT)"
        ).alias("cycle_days"),
    ).orderBy("brand")


# ---------------------------------------------------------------------------
# Round 9 fourth wave: period-over-period revenue bridge (contribution).
# ---------------------------------------------------------------------------

_BRIDGE_Y0 = 1996
_BRIDGE_Y1 = 1997


def _bridge_sql() -> str:
    return f"""
WITH seg AS (
    SELECT c.c_mktsegment AS segment,
           CAST(EXTRACT(YEAR FROM CAST(o.o_orderdate AS DATE)) AS INTEGER)
               AS yr,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                AS BIGINT)) AS BIGINT) AS rev_cents
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE EXTRACT(YEAR FROM CAST(o.o_orderdate AS DATE))
          IN ({_BRIDGE_Y0}, {_BRIDGE_Y1})
    GROUP BY 1, 2
),
wide AS (
    SELECT segment,
           CAST(SUM(CASE WHEN yr = {_BRIDGE_Y0} THEN n_orders ELSE 0 END)
                AS BIGINT) AS n0,
           CAST(SUM(CASE WHEN yr = {_BRIDGE_Y0} THEN rev_cents ELSE 0 END)
                AS BIGINT) AS r0,
           CAST(SUM(CASE WHEN yr = {_BRIDGE_Y1} THEN n_orders ELSE 0 END)
                AS BIGINT) AS n1,
           CAST(SUM(CASE WHEN yr = {_BRIDGE_Y1} THEN rev_cents ELSE 0 END)
                AS BIGINT) AS r1
    FROM seg GROUP BY segment
)
SELECT segment, n0, n1, r0, r1,
       r1 - r0 AS delta_cents,
       CAST((n1 - n0) * (r0 // GREATEST(n0, 1)) AS BIGINT)
           AS volume_effect_cents,
       CAST(n1 * (r1 // GREATEST(n1, 1) - r0 // GREATEST(n0, 1))
            AS BIGINT) AS rate_effect_cents,
       CAST(r1 - r0
            - (n1 - n0) * (r0 // GREATEST(n0, 1))
            - n1 * (r1 // GREATEST(n1, 1) - r0 // GREATEST(n0, 1))
            AS BIGINT) AS residual_cents
FROM wide
ORDER BY segment
"""


@register(
    "revenue_delta_contribution",
    _bridge_sql(),
    doc=f"Period-over-period revenue bridge by market segment "
    f"({_BRIDGE_Y0} -> {_BRIDGE_Y1}): each segment's revenue delta "
    "split into a VOLUME effect (order-count change at the old "
    "average ticket) and a RATE effect (average-ticket change at "
    "the new volume) — the waterfall decomposition every revenue "
    "review runs to answer 'did we sell more, or at higher "
    "prices?'. The two effects use floor-divided average tickets, "
    "so the (deterministic, few-cent) flooring remainder is "
    "surfaced honestly as residual_cents instead of vanishing into "
    "either effect — the decomposition identity delta = volume + "
    "rate + residual holds EXACTLY in int64 cents by construction. "
    "Complements unit_value_index_decomposition (corpus-level "
    "Laspeyres/Paasche price-volume indexes) with the segment-grain "
    "additive bridge. Scale: one scan-local (segment x year) "
    "reduce; everything after is a 5-row frame.",
)
def q_revenue_delta_contribution(spark, sf_dir):
    from pyspark.sql import functions as F

    from ecom_churn_lakehouse_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year(F.col("o_orderdate").cast("date")).alias("yr"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    ).filter(F.col("yr").isin(_BRIDGE_Y0, _BRIDGE_Y1))
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    seg = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).groupBy("segment").agg(
        F.sum(F.when(F.col("yr") == _BRIDGE_Y0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(
            F.when(F.col("yr") == _BRIDGE_Y0, F.col("cents")).otherwise(0)
        )
        .cast("long")
        .alias("r0"),
        F.sum(F.when(F.col("yr") == _BRIDGE_Y1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(
            F.when(F.col("yr") == _BRIDGE_Y1, F.col("cents")).otherwise(0)
        )
        .cast("long")
        .alias("n1r"),
    ).withColumnRenamed("n1r", "r1")
    vol = F.expr("(n1 - n0) * (r0 DIV GREATEST(n0, 1))")
    rate = F.expr(
        "n1 * (r1 DIV GREATEST(n1, 1) - r0 DIV GREATEST(n0, 1))"
    )
    return seg.select(
        "segment",
        "n0",
        "n1",
        "r0",
        "r1",
        (F.col("r1") - F.col("r0")).alias("delta_cents"),
        vol.cast("long").alias("volume_effect_cents"),
        rate.cast("long").alias("rate_effect_cents"),
        (F.col("r1") - F.col("r0") - vol - rate)
        .cast("long")
        .alias("residual_cents"),
    ).orderBy("segment")
