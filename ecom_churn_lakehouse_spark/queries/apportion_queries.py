"""Exact-integer apportionment and order-statistics operators
(SURVEY §7.7 extension surface; round-6 widening).

Four classic warehouse shapes the reference workload implies but never
spells out, each with a bit-exact integer oracle (no float in any
compared column — the driver hashes values, so every surface here is
cents/micros/counts):

- ``largest_remainder_allocation`` — Hamilton apportionment of a fixed
  integer budget across nations proportional to revenue. The canonical
  "split N things proportionally with no rounding drift" operator
  (budget allocation, shard quota assignment, stratified sample
  sizing). Sum of allocations is exactly the budget by construction.
- ``user_activity_streaks`` — gaps-and-islands: consecutive-day
  activity runs per user via the date-minus-row_number anchor trick.
- ``revenue_max_drawdown`` — running-peak drawdown over the daily NET
  revenue series (returned lines count negative), the standard
  time-series health metric re-expressed as two stacked windows.
- ``weighted_median_price`` — quantity-weighted median retail price
  per brand via cumulative-weight scan (the exact form of the
  weighted-percentile operator; unweighted twin lives in
  ``percentile_disc_battery``).

Scale posture:
- Allocation: the proportional base is a 25-row per-nation aggregate;
  every window below the fact-table aggregation runs on that tiny
  frame. Products are DECIMAL(38,0)/HUGEINT so ``budget x cents``
  survives 100 TB revenue totals; remainder math is subtraction, not
  ``%``, so both engines agree without modulo-semantics caveats.
- Streaks: one shuffle to (user, day) distinct, then per-user windows
  — partition-parallel, no global sort anywhere.
- Drawdown: the fact scan aggregates to one row per day FIRST
  (map-side combinable), so the ordered global window runs over a
  ~thousands-row daily frame even at 100 TB; cumulative sums are
  DECIMAL(38,0).
- Weighted median: per-(brand) windows over a part-level aggregate
  (200k rows at sf1, never the lineitem fact), cumulative weight is a
  single ordered scan per brand.

Integer-division discipline (verify SKILL round-5 gotchas): all DIV //
numerators here are provably non-negative; Spark ``DIV`` truncation
and DuckDB ``//`` flooring agree on non-negatives only.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ecom_churn_lakehouse_spark.registry import register
from ecom_churn_lakehouse_spark.sources import load_table

# ---------------------------------------------------------------------------
# Hamilton (largest-remainder) apportionment.
# ---------------------------------------------------------------------------

_ALLOC_BUDGET = 1_000_000

_ALLOC_SQL = f"""
WITH cents AS (
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
),
tot AS (
    SELECT nation, revenue_cents,
           CAST(SUM(revenue_cents) OVER () AS BIGINT) AS total_cents
    FROM cents
),
fl AS (
    SELECT nation, revenue_cents, total_cents,
           CAST(CAST({_ALLOC_BUDGET} AS HUGEINT) * revenue_cents
                // total_cents AS BIGINT) AS floor_units
    FROM tot
),
rem AS (
    SELECT nation, revenue_cents, floor_units,
           CAST(CAST({_ALLOC_BUDGET} AS HUGEINT) * revenue_cents
                - CAST(floor_units AS HUGEINT) * total_cents
                AS BIGINT) AS remainder_units,
           CAST({_ALLOC_BUDGET} - SUM(floor_units) OVER () AS BIGINT)
               AS leftover
    FROM fl
),
rk AS (
    SELECT nation, revenue_cents, floor_units, leftover,
           CAST(ROW_NUMBER() OVER (
               ORDER BY remainder_units DESC, nation) AS BIGINT)
               AS remainder_rank
    FROM rem
)
SELECT nation, revenue_cents, floor_units, remainder_rank,
       CAST(floor_units
            + CASE WHEN remainder_rank <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS alloc_units
FROM rk
"""


@register(
    "largest_remainder_allocation",
    _ALLOC_SQL,
    doc="Hamilton largest-remainder apportionment of a fixed integer "
    "budget across nations proportional to exact revenue cents. "
    "Allocations sum to the budget exactly (floor shares + one extra "
    "unit to the largest remainders, ties broken by nation name). "
    "Windows run on the 25-row nation aggregate; products are "
    "DECIMAL(38,0) so budget*cents never overflows at 100 TB.",
)
def q_largest_remainder_allocation(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cents = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            )
            .cast("long")
            .alias("revenue_cents")
        )
    )
    w_all = Window.partitionBy()
    tot = cents.withColumn(
        "total_cents", F.sum("revenue_cents").over(w_all).cast("long")
    )
    fl = tot.withColumn(
        "floor_units",
        F.expr(
            f"CAST(CAST({_ALLOC_BUDGET} AS DECIMAL(38,0)) * revenue_cents"
            " DIV total_cents AS BIGINT)"
        ),
    )
    rem = fl.select(
        "nation",
        "revenue_cents",
        "floor_units",
        F.expr(
            f"CAST(CAST({_ALLOC_BUDGET} AS DECIMAL(38,0)) * revenue_cents"
            " - CAST(floor_units AS DECIMAL(38,0)) * total_cents"
            " AS BIGINT)"
        ).alias("remainder_units"),
        (F.lit(_ALLOC_BUDGET) - F.sum("floor_units").over(w_all))
        .cast("long")
        .alias("leftover"),
    )
    rk = rem.withColumn(
        "remainder_rank",
        F.row_number()
        .over(Window.orderBy(F.desc("remainder_units"), F.asc("nation")))
        .cast("long"),
    )
    return rk.select(
        "nation",
        "revenue_cents",
        "floor_units",
        "remainder_rank",
        (
            F.col("floor_units")
            + F.when(F.col("remainder_rank") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc_units"),
    )


# ---------------------------------------------------------------------------
# Gaps-and-islands: consecutive-day activity streaks per user.
# ---------------------------------------------------------------------------

_STREAK_SQL = """
WITH days AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
anch AS (
    SELECT user_id, d,
           d - CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY d) AS INTEGER) AS anchor
    FROM days
),
runs AS (
    SELECT user_id, anchor, CAST(COUNT(*) AS BIGINT) AS streak_days
    FROM anch GROUP BY user_id, anchor
)
SELECT user_id,
       CAST(SUM(streak_days) AS BIGINT) AS n_active_days,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(MAX(streak_days) AS BIGINT) AS max_streak_days
FROM runs
GROUP BY user_id
"""


@register(
    "user_activity_streaks",
    _STREAK_SQL,
    doc="Gaps-and-islands via the date-minus-row_number anchor: "
    "consecutive-day activity runs per user from the events stream. "
    "One shuffle to (user, day) distinct; every window is per-user "
    "partition-parallel — no global ordering anywhere, so the shape "
    "holds at any user count.",
)
def q_user_activity_streaks(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    days = events.distinct()
    anch = days.withColumn(
        "anchor",
        F.date_sub(
            F.col("d"),
            F.row_number()
            .over(Window.partitionBy("user_id").orderBy("d"))
            .cast("int"),
        ),
    )
    runs = anch.groupBy("user_id", "anchor").agg(
        F.count("*").cast("long").alias("streak_days")
    )
    return runs.groupBy("user_id").agg(
        F.sum("streak_days").cast("long").alias("n_active_days"),
        F.count("*").cast("long").alias("n_streaks"),
        F.max("streak_days").cast("long").alias("max_streak_days"),
    )


# ---------------------------------------------------------------------------
# Max drawdown over the daily NET revenue series.
# ---------------------------------------------------------------------------

_DRAWDOWN_SQL = """
WITH daily AS (
    SELECT CAST(l_shipdate AS DATE) AS d,
           CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(18,6)) * 1000000 AS BIGINT)
                    * CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END)
                AS DECIMAL(38,0)) AS net_micros
    FROM lineitem
    GROUP BY CAST(l_shipdate AS DATE)
),
cum AS (
    SELECT d,
           CAST(SUM(net_micros) OVER (
               ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS DECIMAL(38,0)) AS cum_micros
    FROM daily
),
dd AS (
    SELECT d, cum_micros,
           CAST(MAX(cum_micros) OVER (
               ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS DECIMAL(38,0)) AS peak_micros
    FROM cum
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(MAX(peak_micros - cum_micros) AS BIGINT) AS max_drawdown_micros,
       CAST(MAX(peak_micros) AS BIGINT) AS peak_cum_micros
FROM dd
"""


@register(
    "revenue_max_drawdown",
    _DRAWDOWN_SQL,
    doc="Running-peak drawdown over daily NET revenue (returned lines "
    "negative): cumulative sum, running max, max gap — the classic "
    "two-stacked-windows time-series shape. The fact scan reduces to "
    "one row per ship-day before any ordered window, so the global "
    "ordering runs over a ~2.5k-row frame regardless of fact size; "
    "accumulators are DECIMAL(38,0) exact micros.",
)
def q_revenue_max_drawdown(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        F.to_date("l_shipdate").alias("d"),
        (
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,6)")
            * 1000000
        )
        .cast("long")
        .alias("line_micros"),
        F.when(F.col("l_returnflag") == "R", -1).otherwise(1).alias("sign"),
    )
    daily = li.groupBy("d").agg(
        F.sum((F.col("line_micros") * F.col("sign")).cast("decimal(20,0)"))
        .cast("decimal(38,0)")
        .alias("net_micros")
    )
    w_cum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "d", F.sum("net_micros").over(w_cum).cast("decimal(38,0)").alias("cum_micros")
    )
    dd = cum.select(
        "cum_micros",
        F.max("cum_micros").over(w_cum).cast("decimal(38,0)").alias("peak_micros"),
    )
    return dd.agg(
        F.count("*").cast("long").alias("n_days"),
        F.max(F.col("peak_micros") - F.col("cum_micros"))
        .cast("long")
        .alias("max_drawdown_micros"),
        F.max("peak_micros").cast("long").alias("peak_cum_micros"),
    )


# ---------------------------------------------------------------------------
# Quantity-weighted median retail price per brand.
# ---------------------------------------------------------------------------

_WMEDIAN_SQL = """
WITH pw AS (
    SELECT p.p_brand AS brand, p.p_partkey AS partkey,
           CAST(CAST(p.p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS price_cents,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS weight
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand, p.p_partkey, p.p_retailprice
),
cw AS (
    SELECT brand, partkey, price_cents, weight,
           CAST(SUM(weight) OVER (
               PARTITION BY brand ORDER BY price_cents, partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_weight,
           CAST(SUM(weight) OVER (PARTITION BY brand) AS BIGINT)
               AS total_weight
    FROM pw
)
SELECT brand,
       CAST(MIN(total_weight) AS BIGINT) AS total_weight,
       CAST(MIN(CASE WHEN 2 * cum_weight >= total_weight
                     THEN price_cents END) AS BIGINT)
           AS weighted_median_cents
FROM cw
GROUP BY brand
"""


@register(
    "weighted_median_price",
    _WMEDIAN_SQL,
    doc="Quantity-weighted median retail price per brand: cumulative-"
    "weight scan ordered by (price, partkey), first price whose "
    "doubled cumulative weight reaches the brand total. Weights come "
    "from a part-level aggregate of lineitem (map-side combinable), "
    "so the per-brand ordered window runs over the 200k-part frame, "
    "never the fact table. Exact cents; deterministic tie-break.",
)
def q_weighted_median_price(spark, sf_dir):
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    pw = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_partkey").alias("partkey"),
            (F.col("p_retailprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("price_cents"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("weight"))
    )
    w_cum = (
        Window.partitionBy("brand")
        .orderBy("price_cents", "partkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("brand")
    cw = pw.select(
        "brand",
        "price_cents",
        "weight",
        F.sum("weight").over(w_cum).cast("long").alias("cum_weight"),
        F.sum("weight").over(w_tot).cast("long").alias("total_weight"),
    )
    return cw.groupBy("brand").agg(
        F.min("total_weight").cast("long").alias("total_weight"),
        F.min(
            F.when(2 * F.col("cum_weight") >= F.col("total_weight"), F.col("price_cents"))
        )
        .cast("long")
        .alias("weighted_median_cents"),
    )
