"""Classic decision-support join/aggregate shapes (TPC-H Q12/Q13/Q22
analogues) plus statistical-moment aggregates, fixed-width histograms,
and robust (IQR) outlier filtering.

These widen the §2.4/§2.6 inventory with shapes the reference never
exercises but any engine replacing it must handle: conditional
aggregates over a join (Q12), a left-join count distribution (Q13 —
two chained aggregations), anti-join + scalar-subquery gating (Q22),
second-moment statistics, and percentile-derived filters.

Float discipline follows the repo rule: exact DECIMAL accumulation cast
to DOUBLE at the end, so partial-aggregation order (32 tasks locally,
thousands of tasks at 100 TB) can never perturb the result. Native
second-moment aggregates (stddev/var/corr) ARE order-sensitive in
floating point, so the hashed columns are derived from exact decimal
moments and the native sketches are asserted within tolerance — same
pattern as approx_distinct_profile.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecom_churn_lakehouse_spark.registry import register
from ecom_churn_lakehouse_spark.sources import load_table


def _dsum(col, scale=4):
    return F.sum(col.cast(f"decimal(28,{scale})")).cast("double")


# ---------------------------------------------------------------------------
# Q12 shape: conditional counts over an orders⋈lineitem join, date-windowed.
# ---------------------------------------------------------------------------

_Q12_START = "1996-01-01"
_Q12_END = "1997-01-01"

_PRIORITY_LINE_SQL = f"""
SELECT l_linestatus AS line_status,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
WHERE CAST(l_shipdate AS DATE) >= DATE '{_Q12_START}'
  AND CAST(l_shipdate AS DATE) < DATE '{_Q12_END}'
GROUP BY l_linestatus
"""


@register(
    "priority_line_counts",
    _PRIORITY_LINE_SQL,
    doc="TPC-H Q12 shape: date-windowed lineitem scan joined to orders, "
    "conditional urgent/non-urgent counts per line status. The ship-date "
    "range reaches the parquet scan as PushedFilters; the conditional "
    "split is one pass (two CASE sums), not two scans.",
)
def q_priority_line_counts(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit(_Q12_START).cast("date"))
        & (F.to_date("l_shipdate") < F.lit(_Q12_END).cast("date"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_linestatus").alias("line_status"))
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(~urgent, 1).otherwise(0)).cast("long").alias(
                "low_line_count"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Q13 shape: left join with a join-time predicate, then a distribution of
# the per-key counts — two chained aggregations.
# ---------------------------------------------------------------------------

_ORDER_COUNT_DIST_SQL = """
SELECT c_count AS orders_per_customer,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM (
    SELECT c_custkey,
           CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
    FROM customer
    LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
    GROUP BY c_custkey
)
GROUP BY c_count
"""


@register(
    "customer_order_count_dist",
    _ORDER_COUNT_DIST_SQL,
    doc="TPC-H Q13 shape: customers left-joined to orders with a "
    "join-time filter (the predicate must NOT drop order-less "
    "customers, so it lives in the ON clause), COUNT of the nullable "
    "key per customer, then a second aggregation over the counts. "
    "Zero-order customers land in the c_count=0 bucket.",
)
def q_customer_order_count_dist(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "5-LOW"),
            "left",
        )
        # COUNT(col) semantics: nulls (customers with no surviving
        # orders) count as zero.
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy(
        F.col("c_count").alias("orders_per_customer")
    ).agg(F.count("*").cast("long").alias("n_customers"))


# ---------------------------------------------------------------------------
# Q22 shape: scalar-subquery threshold + NOT EXISTS anti join.
# ---------------------------------------------------------------------------

_IDLE_RICH_SQL = """
SELECT c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS total_balance
FROM customer
WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE)
               / COUNT(*)
        FROM customer WHERE c_acctbal > 0.0
      )
  AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND CAST(o_orderdate AS DATE) >= DATE '1999-01-01'
      )
GROUP BY c_mktsegment
"""


@register(
    "idle_rich_customers",
    _IDLE_RICH_SQL,
    doc="TPC-H Q22 shape: customers with above-average positive balance "
    "and no recent orders (none since 1999-01-01) — scalar-subquery "
    "threshold (1-row broadcast cross join, no recompute per row) plus "
    "a NOT EXISTS anti join whose date predicate pushes into the "
    "orders scan. The average is decimal-exact so the > gate is "
    "reproducible.",
)
def q_idle_rich_customers(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.to_date("o_orderdate") >= F.lit("1999-01-01").cast("date"))
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (_dsum(F.col("c_acctbal")) / F.count("*")).alias("__avg_bal")
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("__avg_bal")
    )
    idle_rich = rich.join(
        orders, rich.c_custkey == orders.o_custkey, "left_anti"
    )
    return idle_rich.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").cast("long").alias("n_customers"),
        _dsum(F.col("c_acctbal")).alias("total_balance"),
    )


# ---------------------------------------------------------------------------
# Statistical moments: exact decimal-derived var/std/cov/corr, with the
# native one-pass aggregates tolerance-gated against them.
# ---------------------------------------------------------------------------

_STATS_SQL = """
SELECT l_returnflag AS return_flag,
       CAST(n AS BIGINT) AS n,
       ROUND((sum_xx - sum_x * sum_x / n) / (n - 1), 4) AS var_qty,
       ROUND((sum_xy - sum_x * sum_y / n)
             / sqrt((sum_xx - sum_x * sum_x / n)
                    * (sum_yy - sum_y * sum_y / n)), 6) AS corr_qty_price,
       TRUE AS native_var_ok,
       TRUE AS native_corr_ok
FROM (
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_x,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_y,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                    * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_xx,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_yy,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                    * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_xy
    FROM lineitem
    GROUP BY l_returnflag
)
"""


@register(
    "lineitem_stats_profile",
    _STATS_SQL,
    doc="Second-moment statistics per return flag: sample variance of "
    "quantity and quantity-price correlation. Hashed values derive "
    "from exact decimal power sums (order-independent — reproducible "
    "at any cluster size); the engine's native one-pass var_samp/corr "
    "are asserted within 1e-9 relative tolerance, so a broken native "
    "sketch fails the hash gate without exposing its order-sensitive "
    "last bits to the comparison.",
)
def q_lineitem_stats_profile(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    # (18,2) operands: quantities are integral and prices have 2 decimals,
    # so scale 2 is still exact; the raw product fits int64 (DuckDB's
    # DECIMAL(18) storage) and the (37,4) result fits both engines.
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    agg = li.groupBy(F.col("l_returnflag").alias("return_flag")).agg(
        F.count("*").alias("__n"),
        F.sum(qty).cast("double").alias("__sx"),
        F.sum(price).cast("double").alias("__sy"),
        F.sum(qty * qty).cast("double").alias("__sxx"),
        F.sum(price * price).cast("double").alias("__syy"),
        F.sum(qty * price).cast("double").alias("__sxy"),
        F.var_samp("l_quantity").alias("__nat_var"),
        F.corr("l_quantity", "l_extendedprice").alias("__nat_corr"),
    )
    n = F.col("__n")
    css_x = F.col("__sxx") - F.col("__sx") * F.col("__sx") / n
    css_y = F.col("__syy") - F.col("__sy") * F.col("__sy") / n
    ccs_xy = F.col("__sxy") - F.col("__sx") * F.col("__sy") / n
    var_qty = css_x / (n - 1)
    corr = ccs_xy / F.sqrt(css_x * css_y)
    rel_ok = (
        lambda nat, exact: F.abs(nat - exact) <= 1e-9 * F.abs(exact)
    )  # noqa: E731
    return agg.select(
        "return_flag",
        n.cast("long").alias("n"),
        F.round(var_qty, 4).alias("var_qty"),
        F.round(corr, 6).alias("corr_qty_price"),
        rel_ok(F.col("__nat_var"), var_qty).alias("native_var_ok"),
        rel_ok(F.col("__nat_corr"), corr).alias("native_corr_ok"),
    )


# ---------------------------------------------------------------------------
# Fixed-width histogram (width_bucket-style binning).
# ---------------------------------------------------------------------------

#: Power-of-two-friendly bin width: o_totalprice / 32768 is an EXACT
#: double division, so the floor can never straddle engines.
_BIN_WIDTH = 32768.0

_HISTOGRAM_SQL = f"""
SELECT CAST(FLOOR(o_totalprice / {_BIN_WIDTH}) AS BIGINT) AS price_bin,
       CAST(FLOOR(o_totalprice / {_BIN_WIDTH}) * {_BIN_WIDTH} AS DOUBLE)
           AS bin_low,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS bin_value
FROM orders
GROUP BY 1, 2
"""


@register(
    "order_value_histogram",
    _HISTOGRAM_SQL,
    doc="Fixed-width value histogram (width_bucket analogue): bin id by "
    "exact power-of-two division, count + decimal-exact mass per bin. "
    "One map-side-combinable aggregation — the natural first look at a "
    "100 TB value distribution before choosing range partitions.",
)
def q_order_value_histogram(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    bin_id = F.floor(F.col("o_totalprice") / F.lit(_BIN_WIDTH))
    return orders.groupBy(
        bin_id.cast("long").alias("price_bin"),
        (bin_id * F.lit(_BIN_WIDTH)).cast("double").alias("bin_low"),
    ).agg(
        F.count("*").cast("long").alias("n_orders"),
        _dsum(F.col("o_totalprice")).alias("bin_value"),
    )


# ---------------------------------------------------------------------------
# Percentile-derived outlier filter: exact p99 fence applied as a
# broadcast scalar. (A Tukey 1.5·IQR fence is provably empty on this
# fixture's bounded uniform-ish price distribution — the p99 exceedance
# form exercises the same plan shape and always emits the 1% tail.)
# ---------------------------------------------------------------------------

_P99_SQL = """
WITH fence AS (
    SELECT quantile_cont(o_totalprice, 0.99) AS p99 FROM orders
)
SELECT o_orderkey AS order_id,
       CAST(o_totalprice AS DOUBLE) AS total_price,
       ROUND(p99, 6) AS p99_fence
FROM orders, fence
WHERE o_totalprice > p99
"""


@register(
    "price_outlier_orders",
    _P99_SQL,
    doc="Percentile-derived outlier filter: the exact interpolated p99 "
    "(F.percentile = quantile_cont) broadcasts to the scan as a 1-row "
    "cross join — the fact table is filtered without reshuffling. "
    "Same shape as a Tukey IQR fence (which this fixture's bounded "
    "distribution never exceeds); at 100 TB swap percentile for "
    "approx_percentile and keep the broadcast.",
)
def q_price_outlier_orders(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    fence = orders.agg(
        F.percentile("o_totalprice", F.lit(0.99)).alias("__p99")
    )
    return (
        orders.join(F.broadcast(fence))
        .filter(F.col("o_totalprice") > F.col("__p99"))
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_totalprice").cast("double").alias("total_price"),
            F.round(F.col("__p99"), 6).alias("p99_fence"),
        )
    )
