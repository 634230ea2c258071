"""Deep decision-support shapes: TPC-H Q18/Q10/Q21 analogues plus a
graph-triangle and quantile-binning query (SURVEY §2.4/§2.6 widening).

The reference's workload stops at single-level joins and grouped
aggregates (SURVEY §2.4-2.6); these add the remaining classic
decision-support patterns a drop-in engine must run:

- HAVING-gated aggregate as a join input      (large_basket_customers)
- multi-way join + top-k by aggregated value  (returned_revenue_by_customer)
- double-correlated EXISTS/NOT EXISTS         (sole_blame_suppliers)
- higher-order self-join (triangle counting)  (copurchase_triangles)
- exact quantile binning via ranking          (order_value_quartile_stats)

Scale posture:
- Q18/Q10 aggregate lineitem FIRST (map-side combinable) and join the
  much smaller aggregate/dimension frames after; date filters reach the
  parquet scans as PushedFilters.
- Q21's textbook form is two correlated subqueries per lineitem; here
  both collapse into ONE per-order aggregation (distinct-supplier
  counts + a conditional max that names the single blamed supplier) —
  no self-joins against the fact table at all, which is the difference
  between one shuffle and three at 100 TB.
- Triangle counting orients every edge low-key -> high-key so each
  triangle is built exactly once; the join graph is equi-key-partitioned
  (edges reused across all three legs). At cluster scale you would
  additionally orient by degree (low-degree vertex first) to bound the
  per-key fan-out under power-law skew — noted, not needed at this SF.
- NTILE quantile binning is a global sort by construction (exactness
  requires it); the scale path for approximate binning is
  approx_percentile cut-points broadcast to a scan-local bucketer, as
  done in `price_outlier_orders`.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ecom_churn_lakehouse_spark.registry import register
from ecom_churn_lakehouse_spark.sources import load_table


def _dsum(col, scale=4):
    """Order-independent money sum: decimal accumulate -> double."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


# ---------------------------------------------------------------------------
# Q18 shape: HAVING-gated aggregate joined back to the fact's parent.
# ---------------------------------------------------------------------------

_BASKET_QTY = 250

_LARGE_BASKET_SQL = f"""
WITH big AS (
    SELECT l_orderkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
    FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > {_BASKET_QTY}
)
SELECT o.o_custkey AS custkey,
       o.o_orderkey AS orderkey,
       CAST(o.o_orderdate AS DATE) AS order_date,
       o.o_totalprice AS total_price,
       b.total_qty AS total_qty
FROM orders o
JOIN big b ON o.o_orderkey = b.l_orderkey
"""


@register(
    "large_basket_customers",
    _LARGE_BASKET_SQL,
    doc="TPC-H Q18 shape: orders whose total lineitem quantity exceeds "
    "a threshold. The HAVING aggregate runs first (map-side combinable "
    "partial sums), shrinking lineitem to a per-order frame before the "
    "orders join — never the reverse order.",
)
def q_large_basket_customers(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("_q"))
        .filter(F.col("_q") > _BASKET_QTY)
        .select("l_orderkey", F.col("_q").cast("double").alias("total_qty"))
    )
    orders = load_table(spark, sf_dir, "orders")
    return orders.join(big, orders.o_orderkey == big.l_orderkey).select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.to_date("o_orderdate").alias("order_date"),
        F.col("o_totalprice").alias("total_price"),
        "total_qty",
    )


# ---------------------------------------------------------------------------
# Q10 shape: 4-way join, aggregate, top-k by the aggregated value.
# ---------------------------------------------------------------------------

_Q10_START = "1996-01-01"
_Q10_END = "1996-04-01"

_RETURNED_REVENUE_SQL = f"""
SELECT c.c_custkey AS custkey,
       n.n_name AS nation,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS lost_revenue,
       CAST(COUNT(*) AS BIGINT) AS returned_lines
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND CAST(o.o_orderdate AS DATE) >= DATE '{_Q10_START}'
  AND CAST(o.o_orderdate AS DATE) < DATE '{_Q10_END}'
GROUP BY c.c_custkey, n.n_name
ORDER BY lost_revenue DESC, custkey
LIMIT 20
"""


@register(
    "returned_revenue_by_customer",
    _RETURNED_REVENUE_SQL,
    doc="TPC-H Q10 shape: revenue lost to returns per customer over one "
    "quarter, top 20. Returnflag + date filters push into the scans; "
    "the quarter of orders joins lineitem on the shuffle key, then the "
    "small aggregated frame broadcasts against customer/nation dims. "
    "Exact-decimal revenue makes the top-20 cut deterministic.",
)
def q_returned_revenue_by_customer(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit(_Q10_START).cast("date"))
        & (F.to_date("o_orderdate") < F.lit(_Q10_END).cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            _dsum(revenue, 6).alias("lost_revenue"),
            F.count("*").cast("long").alias("returned_lines"),
        )
    )
    return (
        per_cust.join(
            F.broadcast(cust), per_cust.o_custkey == cust.c_custkey
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("n_name").alias("nation"),
            "lost_revenue",
            "returned_lines",
        )
        .orderBy(F.col("lost_revenue").desc(), "custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q21 shape: double-correlated EXISTS / NOT EXISTS, decorrelated into a
# single per-order aggregation.
# ---------------------------------------------------------------------------

_SOLE_BLAME_SQL = """
WITH per_order AS (
    SELECT l_orderkey,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_suppkey) FILTER (WHERE l_returnflag = 'R')
               AS n_ret_supp,
           MAX(l_suppkey) FILTER (WHERE l_returnflag = 'R') AS blamed_supp
    FROM lineitem
    GROUP BY l_orderkey
)
SELECT s.s_suppkey AS suppkey,
       s.s_name AS supplier_name,
       CAST(COUNT(*) AS BIGINT) AS blamed_orders
FROM per_order p
JOIN supplier s ON s.s_suppkey = p.blamed_supp
WHERE p.n_supp > 1 AND p.n_ret_supp = 1
GROUP BY s.s_suppkey, s.s_name
ORDER BY blamed_orders DESC, suppkey
LIMIT 25
"""


@register(
    "sole_blame_suppliers",
    _SOLE_BLAME_SQL,
    doc="TPC-H Q21 shape: suppliers that were the ONLY supplier with a "
    "returned line in a multi-supplier order (EXISTS another supplier's "
    "line AND NOT EXISTS another supplier's returned line). Both "
    "correlated subqueries collapse into one per-order aggregation: "
    "n_supp>1 encodes the EXISTS, n_ret_supp=1 the NOT EXISTS, and "
    "MAX(suppkey) FILTER(returned) names the unique culprit — one "
    "shuffle over lineitem instead of three self-joins.",
)
def q_sole_blame_suppliers(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    # Two-phase instead of two countDistinct in one aggregate: the
    # multi-distinct form expands every lineitem row once per distinct
    # group before the shuffle; collapsing to (order, supplier) grain
    # first makes both "distinct" counts plain counts — measured
    # 2.0 s -> 1.1 s at sf0.1, and the first shuffle is map-side
    # combinable on the pair key.
    returned = (F.col("l_returnflag") == "R").cast("int")
    per_pair = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(returned).alias("__has_ret")
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("__has_ret").alias("n_ret_supp"),
        F.max(F.when(F.col("__has_ret") == 1, F.col("l_suppkey"))).alias(
            "blamed_supp"
        ),
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1))
        .groupBy("blamed_supp")
        .agg(F.count("*").cast("long").alias("blamed_orders"))
        .join(F.broadcast(supp), F.col("blamed_supp") == supp.s_suppkey)
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supplier_name"),
            "blamed_orders",
        )
        .orderBy(F.col("blamed_orders").desc(), "suppkey")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Triangle counting over the co-purchase graph (§7.7 graph family,
# alongside copurchase_pagerank / neardup clustering).
# ---------------------------------------------------------------------------

_TRIANGLE_SQL = """
WITH bask AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
edges AS (
    SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
    FROM bask a
    JOIN bask b ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
),
tri AS (
    SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
    FROM edges e1
    JOIN edges e2 ON e2.pa = e1.pb
    JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
),
nodes AS (
    SELECT a AS part FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
)
SELECT part AS partkey,
       CAST(COUNT(*) AS BIGINT) AS triangle_count
FROM nodes
GROUP BY part
ORDER BY triangle_count DESC, partkey
LIMIT 25
"""


@register(
    "copurchase_triangles",
    _TRIANGLE_SQL,
    doc="Per-part triangle participation in the co-purchase graph, top "
    "25. Edges are oriented l_partkey-ascending so each triangle "
    "(a<b<c) is found exactly once: as a common higher neighbor c in "
    "the adjacency arrays of a and b, via row-local array_intersect "
    "on each edge (a,b) — the wedge set never materializes, unlike "
    "the edges³ self-join the oracle runs. The per-node count fans "
    "each triangle to its three corners with a UNION ALL. Clustering "
    "coefficient / community density primitive for recommender "
    "audits. At cluster scale, degree-ordered orientation would "
    "additionally bound the adjacency-array length under power-law "
    "skew.",
)
def q_copurchase_triangles(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    bask = li.select("l_orderkey", "l_partkey").distinct()
    a = bask.alias("a")
    b = bask.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .distinct()
        # edges feeds three consumers (adj build + both join legs). No
        # checkpoint barrier here: the static plan shows the subtree
        # thrice, but AQE dedups it at runtime (ReusedExchange) — a
        # localCheckpoint was MEASURED slower (4.7s vs 3.5s at sf0.1;
        # materialization cost exceeds the already-shared recompute).
    )
    # Adjacency-intersection formulation: per node, the sorted array of
    # HIGHER-keyed neighbors; a triangle a<b<c is a common member c of
    # adj>(a) and adj>(b) for each edge (a,b). Two array-valued joins +
    # a row-local array_intersect replace the wedge-explosion self-join
    # (edges ⋈ edges ⋈ edges): the wedge set — Σ C(outdeg,2) rows, the
    # quadratic-ish intermediate — never materializes or shuffles, and
    # the join state is |E| + |V| rows. Measured 7× on the sf0.1 graph
    # (25s wedge-join → 3.5s steady-state).
    adj = edges.groupBy(F.col("pa").alias("node")).agg(
        F.sort_array(F.collect_list("pb")).alias("nbrs")
    )
    tri = (
        edges.join(
            adj.select(
                F.col("node").alias("pa"), F.col("nbrs").alias("nbrs_a")
            ),
            on="pa",
        )
        .join(
            adj.select(
                F.col("node").alias("pb"), F.col("nbrs").alias("nbrs_b")
            ),
            on="pb",
        )
        .select(
            F.col("pa").alias("a"),
            F.col("pb").alias("b"),
            F.explode(F.array_intersect("nbrs_a", "nbrs_b")).alias("c"),
        )
    )
    nodes = (
        tri.select(F.col("a").alias("part"))
        .unionAll(tri.select(F.col("b").alias("part")))
        .unionAll(tri.select(F.col("c").alias("part")))
    )
    return (
        nodes.groupBy("part")
        .agg(F.count("*").cast("long").alias("triangle_count"))
        .select(F.col("part").alias("partkey"), "triangle_count")
        .orderBy(F.col("triangle_count").desc(), "partkey")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Exact quantile binning via NTILE (feature-engineering primitive).
# ---------------------------------------------------------------------------

_QUARTILE_SQL = """
WITH q AS (
    SELECT o_totalprice,
           CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey)
                AS INTEGER) AS quartile
    FROM orders
)
SELECT quartile,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       MIN(o_totalprice) AS min_value,
       MAX(o_totalprice) AS max_value,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM q
GROUP BY quartile
ORDER BY quartile
"""


@register(
    "order_value_quartile_stats",
    _QUARTILE_SQL,
    doc="Exact quartile binning of order values (NTILE with a full "
    "tie-break, so bin membership is deterministic) plus per-bin stats. "
    "Exactness forces a global sort; the approximate scale path is "
    "broadcast approx_percentile cut-points as in price_outlier_orders.",
)
def q_order_value_quartile_stats(spark, sf_dir):
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    q = orders.select(
        "o_totalprice", F.ntile(4).over(w).cast("int").alias("quartile")
    )
    return (
        q.groupBy("quartile")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.min("o_totalprice").alias("min_value"),
            F.max("o_totalprice").alias("max_value"),
            _dsum(F.col("o_totalprice")).alias("total_value"),
        )
        .orderBy("quartile")
    )


# ---------------------------------------------------------------------------
# Q5 shape: six-way join with a same-nation correlation between two
# dimension paths (customer's nation == supplier's nation).
# ---------------------------------------------------------------------------

_Q5_REGION = "ASIA"
_Q5_START = "1996-01-01"
_Q5_END = "1997-01-01"

_REGIONAL_VOLUME_SQL = f"""
SELECT n.n_name AS nation,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
               AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = '{_Q5_REGION}'
  AND CAST(o.o_orderdate AS DATE) >= DATE '{_Q5_START}'
  AND CAST(o.o_orderdate AS DATE) < DATE '{_Q5_END}'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
"""


@register(
    "regional_supplier_volume",
    _REGIONAL_VOLUME_SQL,
    doc="TPC-H Q5 shape: revenue from orders where the customer and "
    "the line's supplier sit in the SAME nation of one region — the "
    "six-way join with a cross-path equality (s_nationkey = "
    "c_nationkey) that join-order optimizers are graded on. Spark "
    "plan: region->nation prunes to the region's nations first "
    "(broadcast), the orders date window pushes into its scan, and "
    "the fact-side join chain stays on shuffle keys while every "
    "dimension broadcasts; the same-nation predicate rides the "
    "supplier join condition, not a post-filter.",
)
def q_regional_supplier_volume(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == _Q5_REGION
    )
    nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit(_Q5_START).cast("date"))
        & (F.to_date("o_orderdate") < F.lit(_Q5_END).cast("date"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nations), cust.c_nationkey == nations.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(_dsum(revenue, 6).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "nation")
    )


# ---------------------------------------------------------------------------
# Q11 shape: groups whose share of a GLOBAL total exceeds a fraction
# threshold (scalar-subquery HAVING).
# ---------------------------------------------------------------------------

# Scale-aware Q11 threshold: a part is "significant" when its revenue
# exceeds _Q11_MEAN_MULTIPLE x the MEAN per-part revenue (t / n_parts).
# A fixed global-share fraction goes vacuous as the part count grows
# with SF (0.002 returned 0 rows at sf0.01 AND sf0.1); the mean-relative
# cut returns a non-empty, SF-stable head at every scale.
_Q11_MEAN_MULTIPLE = 1.5

_SIGNIFICANT_PARTS_SQL = f"""
WITH part_rev AS (
    SELECT l_partkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem
    GROUP BY l_partkey
),
total AS (
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS t,
           COUNT(DISTINCT l_partkey) AS np
    FROM lineitem
)
SELECT p.l_partkey AS partkey,
       p.revenue AS revenue,
       ROUND(p.revenue / (SELECT t FROM total), 6) AS revenue_share
FROM part_rev p
WHERE p.revenue > (SELECT t / np FROM total) * {_Q11_MEAN_MULTIPLE}
ORDER BY revenue DESC, partkey
"""


@register(
    "significant_parts",
    _SIGNIFICANT_PARTS_SQL,
    doc="TPC-H Q11 shape: parts whose revenue exceeds a multiple of the "
    "MEAN per-part revenue — the scalar-subquery HAVING that requires "
    "two aggregations over the same fact scan. The global total is a "
    "1-row broadcast against the per-part aggregate (AQE reuses the "
    "scan exchange); both sums are exact-decimal so the threshold "
    "cut and the share values are deterministic, and the mean-relative "
    "cut stays non-vacuous at every scale factor.",
)
def q_significant_parts(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    part_rev = li.groupBy("l_partkey").agg(
        _dsum(revenue, 6).alias("revenue")
    )
    total = li.agg(
        _dsum(revenue, 6).alias("t"),
        F.countDistinct("l_partkey").alias("np"),
    )
    return (
        part_rev.join(F.broadcast(total))
        .filter(
            F.col("revenue")
            > (F.col("t") / F.col("np")) * _Q11_MEAN_MULTIPLE
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            "revenue",
            F.round(F.col("revenue") / F.col("t"), 6).alias("revenue_share"),
        )
        .orderBy(F.col("revenue").desc(), "partkey")
    )


# -------------- supplier reliability: Wilson lower-bound ranking

_WILSON_Z2 = 3.8416  # z^2 at 95% (z = 1.96)

_WILSON_SQL = f"""
WITH per_supp AS (
    SELECT l.l_suppkey,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS DOUBLE) AS r
    FROM lineitem l
    GROUP BY l.l_suppkey
),
scored AS (
    SELECT l_suppkey, n,
           r / n AS p_hat,
           (r / n + {_WILSON_Z2} / (2 * n)
            - sqrt({_WILSON_Z2}) * sqrt((r / n) * (1 - r / n) / n
                                        + {_WILSON_Z2} / (4 * n * n)))
           / (1 + {_WILSON_Z2} / n) AS wilson_lo
    FROM per_supp
)
SELECT s.l_suppkey AS suppkey,
       sup.s_name AS supp_name,
       CAST(s.n AS BIGINT) AS n_lines,
       ROUND(s.p_hat, 6) AS return_rate,
       ROUND(s.wilson_lo, 6) AS return_rate_lower_bound
FROM scored s JOIN supplier sup ON s.l_suppkey = sup.s_suppkey
ORDER BY return_rate_lower_bound DESC, suppkey
LIMIT 25
"""


@register(
    "supplier_return_wilson",
    _WILSON_SQL,
    doc="Supplier reliability ranked by the WILSON LOWER BOUND of the "
    "return rate (z=1.96) — the confidence-adjusted ranking that "
    "stops a 2-of-3 supplier outranking a 200-of-1000 one (raw-rate "
    "sorts are the classic small-n ranking bug). The bound is a "
    "fixed arithmetic chain over exact integer counts (sqrt is IEEE "
    "correctly-rounded, both engines parenthesize identically), so "
    "even the ranking cut is hash-stable. One fact aggregate keyed "
    "by supplier + a broadcast dimension join + TakeOrdered 25.",
)
def q_supplier_return_wilson(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_returnflag"
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    per = li.groupBy("l_suppkey").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("double")
        .alias("r"),
    )
    n = F.col("n")
    p = F.col("r") / n
    z2 = F.lit(_WILSON_Z2)
    wilson = (
        p
        + z2 / (2 * n)
        - F.sqrt(z2) * F.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
    ) / (1 + z2 / n)
    return (
        per.select(
            "l_suppkey",
            "n",
            p.alias("p_hat"),
            wilson.alias("wilson_lo"),
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select(
            F.col("l_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
            F.col("n").cast("long").alias("n_lines"),
            F.round("p_hat", 6).alias("return_rate"),
            F.round("wilson_lo", 6).alias("return_rate_lower_bound"),
        )
        .orderBy(F.col("return_rate_lower_bound").desc(), "suppkey")
        .limit(25)
    )


# ----------------------------------------- CUSUM changepoint detection

_CUSUM_SQL = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS rev_cents
    FROM orders GROUP BY 1
),
tot AS (
    SELECT CAST(SUM(rev_cents) AS BIGINT) AS s,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM daily
),
cum AS (
    SELECT day, rev_cents,
           CAST(SUM(rev_cents) OVER (ORDER BY day) AS BIGINT) AS p,
           CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS k
    FROM daily
)
SELECT c.day, c.rev_cents,
       CAST(abs(t.n * c.p - c.k * t.s) AS BIGINT) AS cusum_stat,
       t.n AS n_days
FROM cum c CROSS JOIN tot t
ORDER BY cusum_stat DESC, day
LIMIT 5
"""


@register(
    "revenue_cusum_changepoint",
    _CUSUM_SQL,
    doc="Exact-integer CUSUM changepoint screen over daily revenue: "
    "the statistic |n*P_k - k*S_n| (prefix sum vs pro-rata share of "
    "the total, both in integer cents) peaks at the day where the "
    "revenue-rate regime shifts — the drift detector a pipeline runs "
    "before trusting a trained-on-last-quarter model, kin to "
    "order_value_psi_drift but locating WHEN, not how much. All "
    "arithmetic is BIGINT (cents x day-rank, magnitudes ~1e14), so "
    "the argmax is hash-stable across engines. Scale shape: one "
    "map-side-combinable day-grain aggregate (bounded by the "
    "calendar, not the data) then windows over the tiny daily frame; "
    "the single-partition window touches ~thousands of rows at ANY "
    "corpus size.",
)
def q_revenue_cusum_changepoint(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("rev_cents")
    )
    w_cum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        daily.select(
            "day",
            "rev_cents",
            F.sum("rev_cents").over(w_cum).cast("long").alias("p"),
            F.row_number().over(Window.orderBy("day"))
            .cast("long")
            .alias("k"),
            F.sum("rev_cents").over(w_all).cast("long").alias("s"),
            F.count("*").over(w_all).cast("long").alias("n_days"),
        )
        .select(
            "day",
            "rev_cents",
            F.abs(
                F.col("n_days") * F.col("p") - F.col("k") * F.col("s")
            )
            .cast("long")
            .alias("cusum_stat"),
            "n_days",
        )
        .orderBy(F.desc("cusum_stat"), "day")
        .limit(5)
    )


# ---------------------------------------------- ship-delay SLA profile

_SHIP_DELAY_SQL = """
WITH d AS (
    SELECT o.o_orderpriority AS priority,
           CAST(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
                AS BIGINT) AS delay_days
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT priority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(quantile_disc(delay_days, 0.5) AS BIGINT) AS p50_days,
       CAST(quantile_disc(delay_days, 0.9) AS BIGINT) AS p90_days,
       CAST(quantile_disc(delay_days, 0.99) AS BIGINT) AS p99_days,
       CAST(MAX(delay_days) AS BIGINT) AS max_days
FROM d GROUP BY priority
"""


@register(
    "ship_delay_percentiles",
    _SHIP_DELAY_SQL,
    doc="Fulfillment-latency SLA profile: order-to-ship delay in "
    "whole days per priority class at p50/p90/p99/max via "
    "percentile_disc (actual data values — integer days, so the "
    "whole surface is exact). The operations twin of the revenue "
    "queries: p99 by priority is what an SLA is written against, "
    "and a p99 that degrades while p50 holds is the classic "
    "tail-latency regression. Key-local join (lineitem already "
    "carries the order key), one sort-based aggregate per class.",
)
def q_ship_delay_percentiles(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("ship_d")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("order_d"),
    )
    d = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "priority",
        F.datediff("ship_d", "order_d").cast("long").alias("delay_days"),
    )
    return d.groupBy("priority").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY delay_days)")
        .cast("long")
        .alias("p50_days"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY delay_days)")
        .cast("long")
        .alias("p90_days"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY delay_days)")
        .cast("long")
        .alias("p99_days"),
        F.max("delay_days").cast("long").alias("max_days"),
    )


# ------------------------------------------ revenue concentration (Gini)

_GINI_SQL = """
WITH spend AS (
    SELECT n.n_name AS nation, o.o_custkey,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100)
                AS BIGINT) AS cents
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name, o.o_custkey
),
ranked AS (
    SELECT nation, cents,
           CAST(ROW_NUMBER() OVER (PARTITION BY nation
                                   ORDER BY cents, o_custkey) AS BIGINT)
               AS rk
    FROM spend
)
SELECT nation,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(CAST(2 * SUM(CAST(rk AS HUGEINT) * cents)
                 - (COUNT(*) + 1) * CAST(SUM(cents) AS HUGEINT)
                 AS HUGEINT) * 1000000
            // (CAST(COUNT(*) AS HUGEINT) * CAST(SUM(cents) AS HUGEINT))
            AS BIGINT) AS gini_ppm
FROM ranked GROUP BY nation
"""


@register(
    "revenue_gini_by_nation",
    _GINI_SQL,
    doc="Revenue-concentration Gini coefficient per nation in exact "
    "integer ppm: customers ranked ascending by spend (custkey "
    "tie-break), Gini = (2*sum(rank*x) - (n+1)*sum(x)) / "
    "(n*sum(x)) — the numerator is non-negative for ascending "
    "ranks, so the floor division is truncation-safe, and every "
    "operand is integer cents (the inequality metric behind "
    "'whale concentration' risk: a nation whose revenue Gini "
    "approaches 1 depends on a handful of customers, the retention "
    "counterpart of key_skew_profile's partition-skew reading). One "
    "customer-grain aggregate, one per-nation window, one rollup — "
    "all on the same nation/customer key family.",
)
def q_revenue_gini_by_nation(spark, sf_dir):
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    spend = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.partitionBy("nation").orderBy("cents", "o_custkey")
    ranked = spend.select(
        "nation",
        "cents",
        F.row_number().over(w).cast("long").alias("rk"),
    )
    return ranked.groupBy("nation").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.expr(
            "CAST((2 * SUM(CAST(rk AS DECIMAL(18,0))"
            "              * CAST(cents AS DECIMAL(18,0)))"
            "      - (COUNT(*) + 1)"
            "        * CAST(SUM(cents) AS DECIMAL(28,0)))"
            "     * 1000000"
            " DIV (CAST(COUNT(*) AS DECIMAL(10,0))"
            "      * CAST(SUM(cents) AS DECIMAL(27,0))) AS BIGINT)"
        ).alias("gini_ppm"),
    )


# ------------------------------------------------ greedy budget knapsack

_KNAPSACK_SQL = """
WITH part_econ AS (
    SELECT l_partkey AS part_key,
           CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(18,6)) * 1000000 AS BIGINT))
                AS BIGINT) AS rev_micros,
           CAST(SUM(CAST(CAST(l_extendedprice * l_discount
                              AS DECIMAL(18,6)) * 1000000 AS BIGINT))
                AS BIGINT) AS cost_micros
    FROM lineitem GROUP BY l_partkey
),
viable AS (SELECT * FROM part_econ WHERE cost_micros > 0),
budget AS (
    SELECT CAST(SUM(cost_micros) // 10 AS BIGINT) AS budget_micros FROM viable
),
ranked AS (
    SELECT part_key, rev_micros, cost_micros,
           CAST(rev_micros * 1000 // cost_micros AS BIGINT) AS roi_milli,
           CAST(SUM(cost_micros) OVER (
                ORDER BY rev_micros * 1000 // cost_micros DESC, part_key)
                AS BIGINT) AS cum_cost
    FROM viable
),
taken AS (
    SELECT * FROM ranked, budget WHERE cum_cost <= budget_micros
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_selected,
       CAST(MAX(budget_micros) AS BIGINT) AS budget_micros,
       CAST(SUM(cost_micros) AS BIGINT) AS spent_micros,
       CAST(SUM(rev_micros) AS BIGINT) AS captured_rev_micros,
       CAST(MIN(roi_milli) AS BIGINT) AS marginal_roi_milli,
       -- dollar-grain utilization: spent*10000 overflows int64 at the
       -- 10x probe scale
       CAST((SUM(cost_micros) // 1000000) * 10000
            // (MAX(budget_micros) // 1000000) AS BIGINT) AS utilization_bp
FROM taken
"""


@register(
    "campaign_budget_knapsack",
    _KNAPSACK_SQL,
    doc="Greedy fractional-knapsack budget allocation: given a promo "
    "budget of 10% of total discount spend, fund parts in decreasing "
    "revenue-per-discount-dollar (ROI) order until the budget is "
    "exhausted — the density-greedy rule that is optimal for the "
    "fractional relaxation and the standard first answer to 'which "
    "campaigns do we fund'. Revenue and discount cost are exact "
    "integer micros; ROI is an exact milli ratio (non-negative DIV); "
    "selection is one cumulative-cost window over the ranked frame. "
    "Scale: the fact reduces to the part grain map-combinably; the "
    "ranked cumsum runs on the part DIMENSION (range-partitioned "
    "sort at scale, same shape as abc_inventory_classes); "
    "rev*1000 stays under int64 to ~9e15 micros per part.",
)
def q_campaign_budget_knapsack(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    econ = li.groupBy(F.col("l_partkey").alias("part_key")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,6)")
            .cast("decimal(24,6)")
            * 1000000
        )
        .cast("long")
        .alias("rev_micros"),
        F.sum(
            (F.col("l_extendedprice") * F.col("l_discount"))
            .cast("decimal(18,6)")
            .cast("decimal(24,6)")
            * 1000000
        )
        .cast("long")
        .alias("cost_micros"),
    )
    viable = econ.filter(F.col("cost_micros") > 0).localCheckpoint(eager=False)
    budget = viable.agg(
        F.expr("CAST(SUM(cost_micros) DIV 10 AS BIGINT)").alias("budget_micros")
    )
    roi = F.expr("CAST(rev_micros * 1000 DIV cost_micros AS BIGINT)")
    w = Window.orderBy(F.col("roi_milli").desc(), "part_key")
    ranked = viable.withColumn("roi_milli", roi).withColumn(
        "cum_cost", F.sum("cost_micros").over(w).cast("long")
    )
    taken = ranked.crossJoin(F.broadcast(budget)).filter(
        F.col("cum_cost") <= F.col("budget_micros")
    )
    return taken.agg(
        F.count("*").cast("long").alias("n_selected"),
        F.max("budget_micros").cast("long").alias("budget_micros"),
        F.sum("cost_micros").cast("long").alias("spent_micros"),
        F.sum("rev_micros").cast("long").alias("captured_rev_micros"),
        F.min("roi_milli").cast("long").alias("marginal_roi_milli"),
        F.expr(
            "CAST((SUM(cost_micros) DIV 1000000) * 10000"
            " DIV (MAX(budget_micros) DIV 1000000) AS BIGINT)"
        ).alias("utilization_bp"),
    )


# ------------------------------------------- decision-tree split screen

#: Weighted Gini impurity of a binary split, one shared IEEE
#: expression from exact integer counts (squares < 2^53 stay exact in
#: DOUBLE). No lateral aliases — every intermediate is spelled inline
#: (the round-4 gotcha).
_GINI_MICRO = (
    "CAST(FLOOR((("
    "CAST(n_left AS DOUBLE)"
    " - (CAST(pos_left AS DOUBLE) * CAST(pos_left AS DOUBLE)"
    "    + CAST(n_left - pos_left AS DOUBLE) * CAST(n_left - pos_left AS DOUBLE))"
    "   / CAST(n_left AS DOUBLE)"
    ") + ("
    "CAST(n - n_left AS DOUBLE)"
    " - (CAST(p - pos_left AS DOUBLE) * CAST(p - pos_left AS DOUBLE)"
    "    + CAST((n - n_left) - (p - pos_left) AS DOUBLE)"
    "      * CAST((n - n_left) - (p - pos_left) AS DOUBLE))"
    "   / CAST(n - n_left AS DOUBLE)"
    ")) / CAST(n AS DOUBLE) * 1000000.0) AS BIGINT)"
)


def _gini_sql() -> str:
    from ecom_churn_lakehouse_spark.registry import AS_OF, HORIZON_DAYS

    return f"""
WITH base AS (
    SELECT o_custkey AS customer_id,
           CAST(o_orderdate AS DATE) AS order_date,
           o_orderstatus AS order_status
    FROM orders
),
bounds AS (SELECT MAX(order_date) AS dataset_end_date FROM base),
spine AS (
    SELECT DISTINCT customer_id FROM base, bounds
    WHERE order_date <= DATE '{AS_OF}'
      AND DATE '{AS_OF}' + INTERVAL {HORIZON_DAYS} DAY <= bounds.dataset_end_date
),
future_active AS (
    SELECT DISTINCT customer_id FROM base
    WHERE order_date > DATE '{AS_OF}'
      AND order_date <= DATE '{AS_OF}' + INTERVAL {HORIZON_DAYS} DAY
      AND order_status NOT IN ('P')
),
labeled AS (
    SELECT s.customer_id,
           CAST(CASE WHEN f.customer_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
               AS churn_label
    FROM spine s LEFT JOIN future_active f ON s.customer_id = f.customer_id
),
binned AS (
    SELECT l.churn_label,
           CAST(NTILE(10) OVER (ORDER BY c.c_acctbal, c.c_custkey) AS BIGINT)
               AS decile
    FROM labeled l JOIN customer c ON c.c_custkey = l.customer_id
),
per_bin AS (
    SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_d,
           CAST(SUM(churn_label) AS BIGINT) AS pos_d
    FROM binned GROUP BY decile
),
cum AS (
    SELECT decile AS split_decile,
           CAST(SUM(n_d) OVER (ORDER BY decile) AS BIGINT) AS n_left,
           CAST(SUM(pos_d) OVER (ORDER BY decile) AS BIGINT) AS pos_left,
           CAST(SUM(n_d) OVER () AS BIGINT) AS n,
           CAST(SUM(pos_d) OVER () AS BIGINT) AS p
    FROM per_bin
),
scored AS (
    SELECT split_decile, n_left, pos_left,
           n - n_left AS n_right, p - pos_left AS pos_right,
           {_GINI_MICRO} AS weighted_gini_micro
    FROM cum WHERE split_decile <= 9
)
SELECT split_decile, n_left, pos_left, n_right, pos_right,
       weighted_gini_micro,
       weighted_gini_micro = MIN(weighted_gini_micro) OVER () AS is_best
FROM scored ORDER BY split_decile
"""


@register(
    "decision_split_gini_screen",
    _gini_sql(),
    doc="Decision-tree split screening: the nine candidate splits of "
    "the account-balance decile feature against the 60-day churn "
    "label, scored by weighted Gini impurity — the inner loop of "
    "tree induction (and the feature-screening shape behind "
    "feature_auc_screen), run as one pass. Counts are exact ints at "
    "the decile grain; each split's impurity is ONE shared IEEE "
    "expression per row (squares of counts stay exact in double "
    "below 2^53), floor-quantized to micro, best split flagged by "
    "integer MIN. Scale: the label spine is the established churn "
    "plan; binning is one global ntile over the customer dim "
    "(range-partitionable), then everything runs at the 10-row "
    "decile grain — no fact window, no join wider than the "
    "broadcast label.",
)
def q_decision_split_gini_screen(spark, sf_dir):
    from pyspark.sql.window import Window as W

    from ecom_churn_lakehouse_spark.plans.churn import churn_labels
    from ecom_churn_lakehouse_spark.registry import AS_OF, HORIZON_DAYS
    from ecom_churn_lakehouse_spark.sources import normalized_orders

    labels = churn_labels(normalized_orders(spark, sf_dir), AS_OF, HORIZON_DAYS)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    binned = labels.join(
        cust, labels.customer_id == cust.c_custkey
    ).select(
        F.col("churn_label").cast("long").alias("churn_label"),
        F.ntile(10)
        .over(W.orderBy("c_acctbal", "c_custkey"))
        .cast("long")
        .alias("decile"),
    )
    per_bin = binned.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_d"),
        F.sum("churn_label").cast("long").alias("pos_d"),
    )
    w_cum = W.orderBy("decile")
    w_all = W.partitionBy()
    cum = per_bin.select(
        F.col("decile").alias("split_decile"),
        F.sum("n_d").over(w_cum).cast("long").alias("n_left"),
        F.sum("pos_d").over(w_cum).cast("long").alias("pos_left"),
        F.sum("n_d").over(w_all).cast("long").alias("n"),
        F.sum("pos_d").over(w_all).cast("long").alias("p"),
    )
    scored = cum.filter(F.col("split_decile") <= 9).select(
        "split_decile",
        "n_left",
        "pos_left",
        (F.col("n") - F.col("n_left")).alias("n_right"),
        (F.col("p") - F.col("pos_left")).alias("pos_right"),
        "n",
        "p",
        F.expr(_GINI_MICRO).alias("weighted_gini_micro"),
    )
    return scored.select(
        "split_decile",
        "n_left",
        "pos_left",
        "n_right",
        "pos_right",
        "weighted_gini_micro",
        (
            F.col("weighted_gini_micro")
            == F.min("weighted_gini_micro").over(w_all)
        ).alias("is_best"),
    ).orderBy("split_decile")


# --------------------------------------------------------------------------
# Bradley-Terry pairwise-preference strengths (VERDICT r7 directive #6).
# --------------------------------------------------------------------------

#: Number of declarative MM (minorization-maximization) iterations —
#: fixed and unrolled on both sides, the same discipline as
#: ``bpe_merge_learning``'s three declarative merge iterations.
_BT_ITERS = 3
#: Strength grain (micro) and the per-iteration floor that bounds the
#: 1e12-scaled reciprocal terms away from int64 overflow (p_i + p_j
#: >= 2e4 -> term <= n_ij * 5e7).
_BT_START = 1_000_000
_BT_FLOOR = 10_000
_BT_NORM = 25_000_000  # sum of strengths after each normalization


def _bt_iteration_ctes(engine: str) -> str:
    """One SQL CTE block per MM iteration, engine-parameterized only in
    the wide-integer type and integer-division operator (HUGEINT + //
    for DuckDB, DECIMAL(38,0) + DIV for Spark; all operands are
    provably non-negative so floor and truncate agree)."""
    wide = "HUGEINT" if engine == "duck" else "DECIMAL(38,0)"
    div = "//" if engine == "duck" else "DIV"
    blocks = []
    for k in range(1, _BT_ITERS + 1):
        blocks.append(f"""
term{k} AS (
    SELECT pr.i AS brand,
           CAST(SUM(CAST(CAST(pr.n_ij AS {wide}) * 1000000000000
                         {div} (pi.p + pj.p) AS BIGINT)) AS BIGINT) AS denom
    FROM pairs pr
    JOIN p{k - 1} pi ON pi.brand = pr.i
    JOIN p{k - 1} pj ON pj.brand = pr.j
    GROUP BY pr.i
),
raw{k} AS (
    SELECT w.brand,
           CAST(CAST(w.w AS {wide}) * 1000000000000 {div} t.denom
                AS BIGINT) AS p_raw
    FROM wins w JOIN term{k} t ON t.brand = w.brand
),
p{k} AS (
    -- normalization via a 25-row window sum, NOT a scalar subquery:
    -- a scalar subquery re-references raw{k} and DuckDB re-inlines
    -- the whole upstream CTE chain per reference (measured ~2x per
    -- iteration, 9.8 s at sf0.01; window form runs in ~1 s)
    SELECT brand,
           GREATEST(CAST(CAST(p_raw AS {wide}) * {_BT_NORM}
                         {div} (SUM(p_raw) OVER ()) AS BIGINT),
                    {_BT_FLOOR}) AS p
    FROM raw{k}
)""")
    return ",".join(blocks)


def _bt_sql(engine: str) -> str:
    return f"""
WITH li AS (
    SELECT l.l_orderkey AS okey, p.p_brand AS brand,
           CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
ob AS (
    SELECT okey, brand, CAST(SUM(cents) AS BIGINT) AS cents
    FROM li GROUP BY okey, brand
),
duels AS (
    SELECT a.brand AS brand_a, b.brand AS brand_b,
           CASE WHEN a.cents > b.cents THEN 1 ELSE 0 END AS win_a,
           CASE WHEN b.cents > a.cents THEN 1 ELSE 0 END AS win_b
    FROM ob a JOIN ob b ON b.okey = a.okey AND a.brand < b.brand
    WHERE a.cents <> b.cents
),
pair_und AS (
    SELECT brand_a, brand_b,
           CAST(SUM(win_a) AS BIGINT) AS w_a,
           CAST(SUM(win_b) AS BIGINT) AS w_b
    FROM duels GROUP BY brand_a, brand_b
),
pairs AS (
    SELECT brand_a AS i, brand_b AS j, w_a + w_b AS n_ij FROM pair_und
    UNION ALL
    SELECT brand_b AS i, brand_a AS j, w_a + w_b AS n_ij FROM pair_und
),
wins AS (
    SELECT brand, CAST(SUM(w) AS BIGINT) AS w,
           CAST(SUM(n) AS BIGINT) AS n_i
    FROM (
        SELECT brand_a AS brand, w_a AS w, w_a + w_b AS n FROM pair_und
        UNION ALL
        SELECT brand_b AS brand, w_b AS w, w_a + w_b AS n FROM pair_und
    ) GROUP BY brand
),
p0 AS (SELECT brand, CAST({_BT_START} AS BIGINT) AS p FROM wins),
{_bt_iteration_ctes(engine)}
SELECT w.brand, w.n_i AS matches, w.w AS wins,
       p.p AS strength_micro,
       CAST(ROW_NUMBER() OVER (ORDER BY p.p DESC, w.brand) AS BIGINT)
           AS rnk
FROM wins w JOIN p{_BT_ITERS} p ON p.brand = w.brand
ORDER BY rnk
"""


@register(
    "bradley_terry_brand_strengths",
    _bt_sql("duck"),
    doc=f"Bradley-Terry pairwise-preference strengths over brands "
    "(VERDICT r7 directive #6): within each order, every pair of "
    "distinct brands duels and the larger exact-cents spend wins "
    "(ties dropped); brand strengths are then fit with "
    f"{_BT_ITERS} unrolled MM iterations p_i' = W_i / SUM_j "
    "n_ij/(p_i+p_j) — the estimator every RLHF / human-preference "
    "eval pipeline runs on pairwise win counts. Exact-arithmetic "
    "discipline (the bpe_merge_learning idiom): each reciprocal "
    "term floor-quantizes via a 1e12-scaled wide-integer division "
    "BEFORE the integer sum (HUGEINT / DECIMAL(38) cross-products, "
    "all operands non-negative so floor == truncate), strengths "
    f"renormalize to {_BT_NORM} micro each iteration with a "
    f"{_BT_FLOOR}-micro floor that provably bounds every "
    "intermediate under int64. Scale: duels reduce map-combinably "
    "to the <=300-row unordered-pair grain (per-order fan-out is "
    "bounded by lineitems-per-order, ~7); every MM iteration runs "
    "on 25-row / 600-row broadcast frames — fitting preferences "
    "over 100 TB of comparisons is one pair-grain shuffle plus "
    "driver-free tiny-frame algebra.",
)
def q_bradley_terry_brand_strengths(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"),
        "l_partkey",
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("okey", F.col("p_brand").alias("brand"))
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    a = ob.select(
        F.col("okey"), F.col("brand").alias("brand_a"),
        F.col("cents").alias("cents_a"),
    )
    b = ob.select(
        F.col("okey").alias("okey_b"), F.col("brand").alias("brand_b"),
        F.col("cents").alias("cents_b"),
    )
    duels = a.join(
        b,
        (F.col("okey") == F.col("okey_b"))
        & (F.col("brand_a") < F.col("brand_b")),
    ).filter(F.col("cents_a") != F.col("cents_b"))
    pair_und = duels.groupBy("brand_a", "brand_b").agg(
        F.sum(F.when(F.col("cents_a") > F.col("cents_b"), 1).otherwise(0))
        .cast("long")
        .alias("w_a"),
        F.sum(F.when(F.col("cents_b") > F.col("cents_a"), 1).otherwise(0))
        .cast("long")
        .alias("w_b"),
    ).localCheckpoint(eager=False)
    pairs = pair_und.select(
        F.col("brand_a").alias("i"),
        F.col("brand_b").alias("j"),
        (F.col("w_a") + F.col("w_b")).alias("n_ij"),
    ).unionByName(
        pair_und.select(
            F.col("brand_b").alias("i"),
            F.col("brand_a").alias("j"),
            (F.col("w_a") + F.col("w_b")).alias("n_ij"),
        )
    )
    wins = (
        pair_und.select(
            F.col("brand_a").alias("brand"),
            F.col("w_a").alias("w"),
            (F.col("w_a") + F.col("w_b")).alias("n"),
        )
        .unionByName(
            pair_und.select(
                F.col("brand_b").alias("brand"),
                F.col("w_b").alias("w"),
                (F.col("w_a") + F.col("w_b")).alias("n"),
            )
        )
        .groupBy("brand")
        .agg(
            F.sum("w").cast("long").alias("w"),
            F.sum("n").cast("long").alias("n_i"),
        )
    )
    p = wins.select("brand", F.lit(_BT_START).cast("long").alias("p"))
    for _ in range(_BT_ITERS):
        pi = p.select(F.col("brand").alias("i"), F.col("p").alias("p_i"))
        pj = p.select(F.col("brand").alias("j"), F.col("p").alias("p_j"))
        denom = (
            pairs.join(F.broadcast(pi), "i")
            .join(F.broadcast(pj), "j")
            .select(
                F.col("i").alias("brand"),
                F.expr(
                    "CAST(CAST(n_ij AS DECIMAL(38,0)) * 1000000000000"
                    " DIV (p_i + p_j) AS BIGINT)"
                ).alias("term"),
            )
            .groupBy("brand")
            .agg(F.sum("term").cast("long").alias("denom"))
        )
        raw = wins.join(denom, "brand").select(
            "brand",
            F.expr(
                "CAST(CAST(w AS DECIMAL(38,0)) * 1000000000000 DIV denom"
                " AS BIGINT)"
            ).alias("p_raw"),
        )
        tot = raw.agg(F.sum("p_raw").cast("long").alias("sum_raw"))
        p = raw.crossJoin(F.broadcast(tot)).select(
            "brand",
            F.greatest(
                F.expr(
                    f"CAST(CAST(p_raw AS DECIMAL(38,0)) * {_BT_NORM}"
                    " DIV sum_raw AS BIGINT)"
                ),
                F.lit(_BT_FLOOR).cast("long"),
            ).alias("p"),
        )
    ranked = wins.join(F.broadcast(p), "brand").select(
        "brand",
        F.col("n_i").alias("matches"),
        F.col("w").alias("wins"),
        F.col("p").alias("strength_micro"),
    )
    return ranked.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.col("strength_micro").desc(), "brand"))
        .cast("long")
        .alias("rnk"),
    ).orderBy("rnk")


# ---------------------------------------------------------------------------
# Round 9 fourth wave: UCB1 bandit arm-allocation advisor.
# ---------------------------------------------------------------------------

#: UCB1 score = mean + sqrt(2 ln N / n_i) as one shared-IEEE
#: expression over exact int64 (x, n, N), floored micro.
_UCB_MICRO = (
    "CAST(FLOOR((CAST(x AS DOUBLE) / CAST(n AS DOUBLE)"
    " + sqrt(2.0 * ln(CAST(n_total AS DOUBLE)) / CAST(n AS DOUBLE)))"
    " * 1000000.0) AS BIGINT)"
)

_UCB_SQL = f"""
WITH arms AS (
    SELECT c.c_mktsegment AS arm,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN o.o_custkey IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS x
    FROM customer c
    LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
      ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM arms),
scored AS (
    SELECT arm, n, x,
           CAST(x * 1000000 // n AS BIGINT) AS mean_ppm,
           {_UCB_MICRO} AS ucb_micro
    FROM arms CROSS JOIN tot
),
best AS (
    SELECT MAX(ucb_micro) AS best_ucb FROM scored
),
ranked AS (
    SELECT s.*, b.best_ucb,
           (SELECT MIN(s2.arm) FROM scored s2 CROSS JOIN best b2
            WHERE s2.ucb_micro = b2.best_ucb) AS best_arm
    FROM scored s CROSS JOIN best b
)
SELECT arm, n, x, mean_ppm, ucb_micro,
       (arm = best_arm) AS pull_next
FROM ranked
ORDER BY arm
"""


@register(
    "ucb_arm_allocation",
    _UCB_SQL,
    doc="UCB1 bandit allocation over market segments (arm = segment, "
    "pull = a customer acquired into it, reward = the customer "
    "converts to >=1 order): per arm the exact conversion mean and "
    "the optimism bonus sqrt(2 ln N / n_i), summed into the UCB1 "
    "index (Auer et al. 2002) as ONE shared-IEEE expression over "
    "exact int64 counts floored to micro, plus the deterministic "
    "pull_next verdict (max index, lexicographic tie-break via a "
    "scalar subquery, so the choice is a value, not an "
    "implementation accident) — the exploration/exploitation "
    "allocator the experimentation tier lacked: fixed-n tests "
    "(two_proportion), sequential tests (SPRT, OBF) all SPLIT "
    "traffic; the bandit DECIDES where the next unit goes. Scale: "
    "one distinct-reduce + broadcast left-join to the customer "
    "grain, then 5-row frames throughout.",
)
def q_ucb_arm_allocation(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    buyers = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey")
        .distinct()
    )
    arms = (
        cust.join(
            buyers.withColumnRenamed("o_custkey", "c_custkey").withColumn(
                "has_order", F.lit(1)
            ),
            on="c_custkey",
            how="left",
        )
        .groupBy(F.col("c_mktsegment").alias("arm"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.coalesce(F.col("has_order"), F.lit(0)))
            .cast("long")
            .alias("x"),
        )
    )
    tot = arms.agg(F.sum("n").cast("long").alias("n_total"))
    scored = arms.crossJoin(F.broadcast(tot)).select(
        "arm",
        "n",
        "x",
        F.expr("CAST(x * 1000000 DIV n AS BIGINT)").alias("mean_ppm"),
        F.expr(_UCB_MICRO).alias("ucb_micro"),
    )
    best = scored.agg(F.max("ucb_micro").alias("best_ucb"))
    best_arm = (
        scored.crossJoin(F.broadcast(best))
        .filter(F.col("ucb_micro") == F.col("best_ucb"))
        .agg(F.min("arm").alias("best_arm"))
    )
    return (
        scored.crossJoin(F.broadcast(best_arm))
        .select(
            "arm",
            "n",
            "x",
            "mean_ppm",
            "ucb_micro",
            (F.col("arm") == F.col("best_arm")).alias("pull_next"),
        )
        .orderBy("arm")
    )


# ---------------------------------------------------------------------------
# Round 9 fourth wave: Theil inequality decomposition.
# ---------------------------------------------------------------------------

#: Per-customer Theil T term (x/X) * ln(x*N/X), quantized to
#: DECIMAL(28,12) per term before the sum (AP-sum discipline);
#: zero-spend customers contribute 0 (lim x->0 of x ln x).
_THEIL_TERM = (
    "CAST(CASE WHEN x > 0 THEN"
    " (CAST(x AS DOUBLE) / CAST(xt AS DOUBLE))"
    " * ln(CAST(x AS DOUBLE) * CAST(nt AS DOUBLE) / CAST(xt AS DOUBLE))"
    " ELSE 0.0 END AS DECIMAL(28,12))"
)
#: Between-nation term (Xg/X) * ln((Xg/X)/(Ng/N)).
_THEIL_BETWEEN_TERM = (
    "CAST(CASE WHEN xg > 0 THEN"
    " (CAST(xg AS DOUBLE) / CAST(xt AS DOUBLE))"
    " * ln((CAST(xg AS DOUBLE) * CAST(nt AS DOUBLE))"
    "      / (CAST(xt AS DOUBLE) * CAST(ng AS DOUBLE)))"
    " ELSE 0.0 END AS DECIMAL(28,12))"
)

_THEIL_SQL = f"""
WITH spend AS (
    SELECT c.c_custkey, n.n_name AS nation,
           CAST(COALESCE(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2))
                * 100 AS BIGINT)), 0) AS BIGINT) // 100 AS x
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, n.n_name
),
tot AS (
    SELECT CAST(SUM(x) AS BIGINT) AS xt, CAST(COUNT(*) AS BIGINT) AS nt
    FROM spend
),
overall AS (
    SELECT CAST(FLOOR(CAST(SUM({_THEIL_TERM}) AS DOUBLE) * 1000000.0)
                AS BIGINT) AS theil_total_micro
    FROM spend CROSS JOIN tot
),
groups AS (
    SELECT nation, CAST(SUM(x) AS BIGINT) AS xg,
           CAST(COUNT(*) AS BIGINT) AS ng
    FROM spend GROUP BY nation
),
between_t AS (
    SELECT CAST(FLOOR(CAST(SUM({_THEIL_BETWEEN_TERM}) AS DOUBLE)
                * 1000000.0) AS BIGINT) AS theil_between_micro
    FROM groups CROSS JOIN tot
)
SELECT t.nt AS n_customers,
       (SELECT COUNT(*) FROM groups) AS n_nations,
       o.theil_total_micro,
       b.theil_between_micro,
       o.theil_total_micro - b.theil_between_micro
           AS theil_within_micro,
       CAST(b.theil_between_micro * 1000
            // GREATEST(o.theil_total_micro, 1) AS BIGINT)
           AS between_share_milli
FROM overall o CROSS JOIN between_t b CROSS JOIN tot t
"""


@register(
    "theil_inequality_decomposition",
    _THEIL_SQL,
    doc="Theil T inequality index of customer spend, decomposed into "
    "BETWEEN-nation and WITHIN-nation components — the reason Theil "
    "exists beside the Gini (revenue_gini_by_nation ranks nations; "
    "lorenz_curve_deciles draws the curve; neither can say how much "
    "of total inequality is geography vs within-market spread, "
    "because Gini does not decompose additively and Theil does: "
    "T = T_between + sum_g (X_g/X) T_g, surfaced here as the exact "
    "residual). Zero-spend customers enter with their 0 ln 0 = 0 "
    "limit via an integer CASE. Each term is one shared-IEEE "
    "ln-of-exact-ratio quantized per-term to DECIMAL(28,12) before "
    "the order-free sum (the AP-sum rule); the between share lands "
    "in exact milli. Scale: one customer-grain reduce (the spend "
    "frame), one 25-nation reduce, 1-row frames after.",
)
def q_theil_inequality_decomposition(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    spend = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "nation")
        .agg(
            F.expr(
                "CAST(COALESCE(SUM(cents), 0) AS BIGINT) DIV 100"
            ).alias("x")
        )
    ).localCheckpoint(eager=False)
    tot = spend.agg(
        F.sum("x").cast("long").alias("xt"),
        F.count("*").cast("long").alias("nt"),
    )
    overall = (
        spend.crossJoin(F.broadcast(tot))
        .agg(
            F.floor(
                F.sum(F.expr(_THEIL_TERM)).cast("double") * 1000000.0
            )
            .cast("long")
            .alias("theil_total_micro")
        )
    )
    groups = spend.groupBy("nation").agg(
        F.sum("x").cast("long").alias("xg"),
        F.count("*").cast("long").alias("ng"),
    )
    n_nations = groups.agg(F.count("*").cast("long").alias("n_nations"))
    between = (
        groups.crossJoin(F.broadcast(tot))
        .agg(
            F.floor(
                F.sum(F.expr(_THEIL_BETWEEN_TERM)).cast("double")
                * 1000000.0
            )
            .cast("long")
            .alias("theil_between_micro")
        )
    )
    return (
        overall.crossJoin(F.broadcast(between))
        .crossJoin(F.broadcast(tot.select(F.col("nt").alias("n_customers"))))
        .crossJoin(F.broadcast(n_nations))
        .select(
            "n_customers",
            "n_nations",
            "theil_total_micro",
            "theil_between_micro",
            (
                F.col("theil_total_micro") - F.col("theil_between_micro")
            ).alias("theil_within_micro"),
            F.expr(
                "CAST(theil_between_micro * 1000"
                " DIV GREATEST(theil_total_micro, 1) AS BIGINT)"
            ).alias("between_share_milli"),
        )
    )
