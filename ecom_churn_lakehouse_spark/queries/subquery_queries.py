"""Correlated-subquery decision-support shapes (TPC-H Q2/Q4/Q15/Q17
analogues, adapted to the fixture's columns).

The reference hand-decorrelates its only existence test into a left
join (SURVEY §2.6 J3); these queries widen that into the full family
an engine must handle when users write declarative SQL:

- EXISTS            → left-semi join              (returned_order_priorities)
- per-group scalar  → derived-aggregate broadcast (small_lot_part_revenue)
- argmin per group  → struct-min, no window sort  (cheapest_part_per_brand)
- = (SELECT MAX)    → aggregate view self-gate    (peak_revenue_months)

Scale posture: every subquery is decorrelated into a join against an
already-aggregated (small) frame, so Catalyst can broadcast it — none
of these reintroduce a per-row subquery loop. The argmin uses
``min(struct(...))`` instead of a row_number window: it is map-side
combinable (partial aggregation), so no per-group sort and no skew
sensitivity — at 100 TB the win over QUALIFY rn=1 is large.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecom_churn_lakehouse_spark.registry import register
from ecom_churn_lakehouse_spark.sources import load_table


def _dsum(col, scale=4):
    # Repo float rule: exact DECIMAL accumulation, cast to DOUBLE at
    # the end — partial-agg order can never perturb the hash.
    return F.sum(col.cast(f"decimal(28,{scale})")).cast("double")


# ---------------------------------------------------------------------------
# Q4 shape: EXISTS correlated subquery → left-semi join.
# ---------------------------------------------------------------------------

_Q4_START = "1996-01-01"
_Q4_END = "1997-01-01"

_RETURNED_SQL = f"""
SELECT o_orderpriority AS order_priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '{_Q4_START}'
  AND CAST(o_orderdate AS DATE) < DATE '{_Q4_END}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


@register(
    "returned_order_priorities",
    _RETURNED_SQL,
    doc="TPC-H Q4 shape: per-priority count of date-windowed orders "
    "with EXISTS a returned lineitem. The EXISTS decorrelates to a "
    "left-semi join (no duplication, no distinct needed); the date "
    "range is pushed into the orders scan, the returnflag filter into "
    "the lineitem scan.",
)
def q_returned_order_priorities(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit(_Q4_START).cast("date"))
        & (F.to_date("o_orderdate") < F.lit(_Q4_END).cast("date"))
    ).select("o_orderkey", "o_orderpriority")
    returned = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    return (
        orders.join(
            returned, orders.o_orderkey == returned.l_orderkey, "left_semi"
        )
        .groupBy(F.col("o_orderpriority").alias("order_priority"))
        .agg(F.count("*").cast("long").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Q17 shape: per-group scalar subquery (avg-quantity threshold) feeding a
# filter on the same fact table — decorrelated into a self-aggregate join.
# ---------------------------------------------------------------------------

_SMALL_LOT_SQL = """
WITH thr AS (
    SELECT l_partkey,
           0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE)
                  / COUNT(*)) AS qty_threshold
    FROM lineitem GROUP BY l_partkey
)
SELECT p_brand AS brand,
       CAST(COUNT(*) AS BIGINT) AS n_small_lots,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE)
           AS small_lot_revenue
FROM lineitem
JOIN thr ON lineitem.l_partkey = thr.l_partkey
JOIN part ON p_partkey = lineitem.l_partkey
WHERE CAST(l_quantity AS DOUBLE) < qty_threshold
GROUP BY p_brand
"""


@register(
    "small_lot_part_revenue",
    _SMALL_LOT_SQL,
    doc="TPC-H Q17 shape: revenue from lineitems below half their "
    "part's average quantity. The correlated AVG decorrelates into a "
    "per-part aggregate joined back to the fact table; both sides "
    "shuffle on l_partkey so AQE reuses one exchange, and the final "
    "rollup to brand joins the small part dim broadcast. The threshold "
    "is exact-decimal-sum / count in DOUBLE — bit-identical across "
    "engines, so the boundary comparison can never flip.",
)
def q_small_lot_part_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thr = li.groupBy("l_partkey").agg(
        (
            F.lit(0.5)
            * (_dsum(F.col("l_quantity")) / F.count("*"))
        ).alias("qty_threshold")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(thr, on="l_partkey")
        .filter(F.col("l_quantity").cast("double") < F.col("qty_threshold"))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").cast("long").alias("n_small_lots"),
            _dsum(F.col("l_extendedprice")).alias("small_lot_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q2 shape: argmin row per group. Engine strategy: min(struct(...)) —
# map-side combinable, no window sort — vs the oracle's QUALIFY rn=1.
# ---------------------------------------------------------------------------

_CHEAPEST_SQL = """
SELECT p_brand AS brand,
       p_partkey AS cheapest_partkey,
       p_retailprice AS cheapest_price
FROM (
    SELECT p_brand, p_partkey, p_retailprice,
           ROW_NUMBER() OVER (
               PARTITION BY p_brand
               ORDER BY p_retailprice, p_partkey
           ) AS rn
    FROM part
)
WHERE rn = 1
"""


@register(
    "cheapest_part_per_brand",
    _CHEAPEST_SQL,
    doc="TPC-H Q2 shape (argmin row per group): the cheapest part per "
    "brand, price then partkey tie-break. Implemented as "
    "min(struct(price, partkey)) — a hash aggregate with map-side "
    "partial combine — rather than a row_number window, so there is "
    "no per-group sort and group skew cannot stall a task; the oracle "
    "runs the window form to prove the two strategies agree.",
)
def q_cheapest_part_per_brand(spark, sf_dir):
    part = load_table(spark, sf_dir, "part").select(
        "p_brand", "p_partkey", "p_retailprice"
    )
    best = part.groupBy(F.col("p_brand").alias("brand")).agg(
        F.min(F.struct("p_retailprice", "p_partkey")).alias("best")
    )
    return best.select(
        "brand",
        F.col("best.p_partkey").alias("cheapest_partkey"),
        F.col("best.p_retailprice").alias("cheapest_price"),
    )


# ---------------------------------------------------------------------------
# Q15 shape: aggregate view gated by = (SELECT MAX(...)) over itself.
# ---------------------------------------------------------------------------

_PEAK_MONTH_SQL = """
WITH monthly AS (
    SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
               AS month,
           SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS rev
    FROM orders GROUP BY 1
)
SELECT month, CAST(rev AS DOUBLE) AS revenue
FROM monthly
WHERE rev = (SELECT MAX(rev) FROM monthly)
"""


@register(
    "peak_revenue_months",
    _PEAK_MONTH_SQL,
    doc="TPC-H Q15 shape: monthly revenue view filtered to its own "
    "maximum via an uncorrelated scalar subquery. The max is a 1-row "
    "frame broadcast against the (already tiny) aggregate — and the "
    "equality is on the EXACT decimal sum, so ties and float drift "
    "cannot desync the gate from the oracle.",
)
def q_peak_revenue_months(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    monthly = orders.groupBy(
        F.trunc(F.to_date("o_orderdate"), "month").alias("month")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(28,4)")).alias("rev"))
    best = monthly.agg(F.max("rev").alias("best_rev"))
    return (
        monthly.join(F.broadcast(best), monthly.rev == best.best_rev)
        .select("month", F.col("rev").cast("double").alias("revenue"))
    )
