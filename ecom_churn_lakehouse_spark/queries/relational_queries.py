"""Relational operator inventory entries (SURVEY.md §2.2–2.8).

One registry entry per operator family: projections/filters/CASE
(P1–P10), scalar functions (F1–F11), hash aggregations (A1–A7),
window functions (W1–W2 + rank/frame extensions), joins
(J1–J5 + explicit semi/anti), sort/limit/top-k (O1–O4), and set ops
(§2.8 — absent in the reference, declared as engine built-ins).

Float discipline: every money aggregate accumulates in DECIMAL (exact,
order-independent) and casts the final value to DOUBLE, so Spark and
DuckDB agree bit-for-bit regardless of partial-aggregation order — at
100 TB the same trick makes results reproducible across cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ecom_churn_lakehouse_spark.registry import register
from ecom_churn_lakehouse_spark.sources import load_table


def _dsum(col, scale=4):
    """Order-independent money sum: decimal accumulate → double."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


# --- A1-style grouped multi-agg over a pushed-down filter (TPC-H Q1 shape) ---

_PRICING_CUTOFF = "1998-09-02"

_PRICING_SQL = f"""
SELECT
    l_returnflag,
    l_linestatus,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
        AS sum_disc_price,
    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE)
        AS sum_charge,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
    CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
    COUNT(*) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '{_PRICING_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
"""


@register(
    "pricing_summary",
    _PRICING_SQL,
    doc="Grouped multi-aggregate with filter pushdown (A1/A3/A6; TPC-H Q1 shape).",
)
def q_pricing_summary(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") <= F.lit(_PRICING_CUTOFF).cast("date")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum(F.col("l_quantity")).alias("sum_qty"),
        _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
        _dsum(disc_price, 6).alias("sum_disc_price"),
        _dsum(charge, 6).alias("sum_charge"),
        (_dsum(F.col("l_quantity")) / F.count("*")).alias("avg_qty"),
        (_dsum(F.col("l_extendedprice")) / F.count("*")).alias("avg_price"),
        (_dsum(F.col("l_discount"), 6) / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


# --- J1 chain + group + top-k (TPC-H Q3 shape; O4 general top-k) ---

_Q3_DATE = "1997-03-15"

_TOP_REVENUE_SQL = f"""
SELECT
    l.l_orderkey AS order_id,
    CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE)
        AS revenue,
    CAST(o.o_orderdate AS DATE) AS order_date,
    o.o_orderpriority AS order_priority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND CAST(o.o_orderdate AS DATE) < DATE '{_Q3_DATE}'
  AND CAST(l.l_shipdate AS DATE) > DATE '{_Q3_DATE}'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, order_date, order_id
LIMIT 10
"""


@register(
    "top_revenue_orders",
    _TOP_REVENUE_SQL,
    doc="3-way join → agg → deterministic top-k (J1, A1, O4; TPC-H Q3 shape). "
    "Small dim side broadcast; tie-broken by unique order key.",
)
def q_top_revenue_orders(spark, sf_dir):
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") < F.lit(_Q3_DATE).cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") > F.lit(_Q3_DATE).cast("date")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"),
            li["l_orderkey"] == orders["o_orderkey"],
        )
        .join(F.broadcast(cust), on=F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(revenue, 6).alias("revenue"))
        .select(
            F.col("l_orderkey").alias("order_id"),
            "revenue",
            F.to_date("o_orderdate").alias("order_date"),
            F.col("o_orderpriority").alias("order_priority"),
        )
        .orderBy(F.col("revenue").desc(), "order_date", "order_id")
        .limit(10)
    )


# --- multi-join star query with broadcast dims (TPC-H Q5 shape) ---

_REVENUE_BY_NATION_SQL = """
SELECT
    n.n_name AS nation,
    CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE)
        AS revenue,
    COUNT(*) AS n_lineitems
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
GROUP BY n.n_name
"""


@register(
    "revenue_by_nation",
    _REVENUE_BY_NATION_SQL,
    doc="Star join fact→dims with explicit broadcast of the small sides "
    "(J1 ×3; TPC-H Q5 shape). At 100 TB only lineitem⋈orders shuffles.",
)
def q_revenue_by_nation(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date"))
            & (F.to_date("o_orderdate") < F.lit("1997-01-01").cast("date"))
        )
        .select("o_orderkey", "o_custkey")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(_dsum(revenue, 6).alias("revenue"), F.count("*").alias("n_lineitems"))
        .select(F.col("n_name").alias("nation"), "revenue", "n_lineitems")
    )


# --- W1: deterministic dedup top-1 per key (orders_bronze_to_silver.py:79-90) ---

_DEDUP_SQL = """
SELECT l_orderkey AS order_id,
       l_partkey AS part_id,
       l_linenumber AS line_number,
       CAST(l_shipdate AS DATE) AS ship_date
FROM (
    SELECT l_orderkey, l_partkey, l_linenumber, l_shipdate,
           ROW_NUMBER() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_shipdate DESC NULLS LAST,
                        l_linenumber DESC,
                        l_partkey DESC
           ) AS _rn
    FROM lineitem
)
WHERE _rn = 1
"""


@register(
    "dedup_latest_per_key",
    _DEDUP_SQL,
    doc="W1 window dedup: keep the single newest row per key with a "
    "deterministic multi-level DESC NULLS LAST tie-break "
    "(orders_bronze_to_silver.py:79-90).",
)
def q_dedup_latest_per_key(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_shipdate").desc_nulls_last(),
        F.col("l_linenumber").desc(),
        F.col("l_partkey").desc(),
    )
    return (
        li.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("l_orderkey").alias("order_id"),
            F.col("l_partkey").alias("part_id"),
            F.col("l_linenumber").alias("line_number"),
            F.to_date("l_shipdate").alias("ship_date"),
        )
    )


# --- W2: latest snapshot per key (build_latest_features.py:112-122) ---

_LATEST_ORDER_SQL = """
SELECT o_custkey AS customer_id,
       o_orderkey AS order_id,
       CAST(o_orderdate AS DATE) AS order_date,
       o_totalprice AS total_price
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate DESC, o_orderkey DESC
    ) AS _rn
    FROM orders
)
WHERE _rn = 1
"""


@register(
    "latest_order_per_customer",
    _LATEST_ORDER_SQL,
    doc="W2 argmax-per-key: newest order per customer (serving export "
    "pattern, build_latest_features.py:112-122).",
)
def q_latest_order_per_customer(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("o_custkey").alias("customer_id"),
            F.col("o_orderkey").alias("order_id"),
            F.to_date("o_orderdate").alias("order_date"),
            F.col("o_totalprice").alias("total_price"),
        )
    )


# --- P9/F1/F2: normalization + CASE canonicalization (silver normalize) ---

_STATUS_SQL = """
SELECT o_orderkey AS order_id,
       CASE lower(trim(o_orderstatus))
            WHEN 'o' THEN 'open'
            WHEN 'f' THEN 'fulfilled'
            WHEN 'p' THEN 'pending'
            ELSE 'unknown'
       END AS status_canonical
FROM orders
"""


@register(
    "order_status_normalized",
    _STATUS_SQL,
    doc="P1+P9+F1+F2: projection with lower/trim normalization and CASE "
    "canonicalization (orders_bronze_to_silver.py:22-29,48-61).",
)
def q_order_status_normalized(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    s = F.lower(F.trim(F.col("o_orderstatus")))
    return orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.when(s == "o", "open")
        .when(s == "f", "fulfilled")
        .when(s == "p", "pending")
        .otherwise("unknown")
        .alias("status_canonical"),
    )


# --- P5: disjunctive negated reject filter (preclean-invalid bucket) ---

_REJECT_SQL = """
SELECT l_orderkey AS order_id,
       l_linenumber AS line_number,
       CASE WHEN l_returnflag IS NULL THEN 'null_returnflag'
            ELSE 'returnflag_not_allowed'
       END AS reject_reason
FROM lineitem
WHERE l_returnflag IS NULL OR l_returnflag NOT IN ('A', 'N')
"""


@register(
    "rejected_rows",
    _REJECT_SQL,
    doc="P5: isNull ∨ ¬isin reject filter with reason column "
    "(orders_bronze_to_silver.py:63-69, dq.py:38-39).",
)
def q_rejected_rows(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    bad = F.col("l_returnflag").isNull() | ~F.col("l_returnflag").isin("A", "N")
    return li.filter(bad).select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("line_number"),
        F.when(F.col("l_returnflag").isNull(), "null_returnflag")
        .otherwise("returnflag_not_allowed")
        .alias("reject_reason"),
    )


# --- A4: duplicate-key audit (dq.py:31-35 'unique' check core) ---

_DUPKEY_SQL = """
SELECT l_orderkey AS key_value, COUNT(*) AS n_rows
FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) > 1
"""


@register(
    "duplicate_key_audit",
    _DUPKEY_SQL,
    doc="A4: groupBy(key).count().filter(>1) duplicate detection "
    "(dq.py:31-35 and every stage gate).",
)
def q_duplicate_key_audit(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_orderkey").alias("key_value"))
        .agg(F.count("*").alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


# --- A5/A6: global scalar aggregate (dataset bounds) ---

_BOUNDS_SQL = """
SELECT COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers,
       CAST(MIN(o_orderdate) AS DATE) AS first_order_date,
       CAST(MAX(o_orderdate) AS DATE) AS last_order_date
FROM orders
"""


@register(
    "dataset_bounds",
    _BOUNDS_SQL,
    doc="A5/A6: global scalar aggregate — dataset bounds used by the label "
    "eligibility gate (labels.py:151-153).",
)
def q_dataset_bounds(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count("*").alias("n_orders"),
        F.count_distinct("o_custkey").alias("n_customers"),
        F.to_date(F.min("o_orderdate")).alias("first_order_date"),
        F.to_date(F.max("o_orderdate")).alias("last_order_date"),
    )


# --- A7: DISTINCT projection ---


@register(
    "distinct_segments",
    "SELECT DISTINCT c_mktsegment AS segment FROM customer",
    doc="A7: SELECT DISTINCT projection dedup (labels.py:168-182 pattern).",
)
def q_distinct_segments(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("segment"))
        .distinct()
    )


# --- P9 in aggregate: conditional counting ---

_COND_AGG_SQL = """
SELECT o_orderpriority AS order_priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_high_value,
       CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS high_value_share
FROM orders GROUP BY o_orderpriority
"""


@register(
    "high_value_share",
    _COND_AGG_SQL,
    doc="P9 inside aggregation: CASE WHEN conditional counts and shares.",
)
def q_high_value_share(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    is_high = F.when(F.col("o_totalprice") > 200000, 1).otherwise(0)
    return orders.groupBy(F.col("o_orderpriority").alias("order_priority")).agg(
        F.count("*").alias("n_orders"),
        F.sum(is_high).cast("long").alias("n_high_value"),
        (F.sum(is_high).cast("double") / F.count("*")).alias("high_value_share"),
    )


# --- frame-spec window extension: running total (SURVEY §2.5 note) ---

_RUNNING_SQL = """
SELECT o_custkey AS customer_id,
       o_orderkey AS order_id,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS cumulative_spend
FROM orders
"""


@register(
    "cumulative_customer_spend",
    _RUNNING_SQL,
    doc="Window frame extension (rowsBetween running aggregate) — absent "
    "in the reference, declared engine built-in (SURVEY §2.5).",
)
def q_cumulative_customer_spend(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderkey").alias("order_id"),
        F.to_date("o_orderdate").alias("order_date"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("cumulative_spend"),
    )


# --- rank extension: top-k per group ---

_TOPK_SQL = """
SELECT c_nationkey AS nation_id,
       c_custkey AS customer_id,
       c_acctbal AS account_balance,
       CAST(rnk AS INTEGER) AS balance_rank
FROM (
    SELECT c_nationkey, c_custkey, c_acctbal,
           ROW_NUMBER() OVER (
               PARTITION BY c_nationkey
               ORDER BY c_acctbal DESC, c_custkey
           ) AS rnk
    FROM customer
)
WHERE rnk <= 3
"""


@register(
    "top_customers_per_nation",
    _TOPK_SQL,
    doc="O4 general per-group top-k via ranked window (SURVEY §2.7).",
)
def q_top_customers_per_nation(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        cust.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("c_nationkey").alias("nation_id"),
            F.col("c_custkey").alias("customer_id"),
            F.col("c_acctbal").alias("account_balance"),
            F.col("rnk").cast("int").alias("balance_rank"),
        )
    )


# --- set ops (§2.8, engine built-ins) ---

_LAPSED_SQL = """
SELECT o_custkey AS customer_id FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
EXCEPT
SELECT o_custkey AS customer_id FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
"""


@register(
    "lapsed_customers",
    _LAPSED_SQL,
    doc="Set op EXCEPT: active in 1996 but not 1997 (SURVEY §2.8 — "
    "engine built-in the reference lacks).",
)
def q_lapsed_customers(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("customer_id"), F.to_date("o_orderdate").alias("d")
    )

    def year(y):
        return orders.filter(
            (F.col("d") >= F.lit(f"{y}-01-01").cast("date"))
            & (F.col("d") < F.lit(f"{y + 1}-01-01").cast("date"))
        ).select("customer_id")

    # SQL EXCEPT is set semantics: distinct both sides, then subtract
    # (exceptAll would keep customers whose 1996 multiplicity exceeds 1997's).
    return year(1996).distinct().subtract(year(1997).distinct())


# --- anti join (J3's direct form) ---

_NO_ORDERS_SQL = """
SELECT c_custkey AS customer_id, c_name AS customer_name
FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND CAST(o.o_orderdate AS DATE) >= DATE '1997-01-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1998-01-01'
)
"""


@register(
    "customers_without_orders",
    _NO_ORDERS_SQL,
    doc="Left anti join — the direct form of the reference's "
    "left-join-null existence test (J3, labels.py:184-193).",
)
def q_customers_without_orders(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.to_date("o_orderdate") >= F.lit("1997-01-01").cast("date"))
            & (F.to_date("o_orderdate") < F.lit("1998-01-01").cast("date"))
        )
        .select("o_custkey")
    )
    return cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], how="left_anti"
    ).select(
        F.col("c_custkey").alias("customer_id"), F.col("c_name").alias("customer_name")
    )


# --- semi join (J5's direct form) ---

_HEAVY_PARTS_SQL = """
SELECT p_partkey AS part_id, p_name AS part_name
FROM part p
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 48
)
"""


@register(
    "parts_in_heavy_lineitems",
    _HEAVY_PARTS_SQL,
    doc="Left semi join — direct form of the duplicate-extraction "
    "join-back (J5, dq.py:31-35).",
)
def q_parts_in_heavy_lineitems(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 48)
        .select("l_partkey")
    )
    return part.join(
        li, part["p_partkey"] == li["l_partkey"], how="left_semi"
    ).select(F.col("p_partkey").alias("part_id"), F.col("p_name").alias("part_name"))


# --- dual-dim star with two roles of one dimension (TPC-H Q7 shape) ---

_TRADE_FLOWS_SQL = """
SELECT
    sn.n_name AS supp_nation,
    cn.n_name AS cust_nation,
    CAST(EXTRACT(YEAR FROM CAST(l.l_shipdate AS DATE)) AS INTEGER) AS ship_year,
    CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE)
        AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE sn.n_name <> cn.n_name
  AND CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l.l_shipdate AS DATE) <= DATE '1997-12-31'
GROUP BY sn.n_name, cn.n_name, ship_year
"""


@register(
    "nation_trade_flows",
    _TRADE_FLOWS_SQL,
    doc="Cross-nation shipping volume by year (TPC-H Q7 shape): the "
    "nation dim joins twice under two roles (supplier side and "
    "customer side) with an inequality between the roles. Plan: "
    "supplier/customer/nation broadcast into the fact scan, so the "
    "only shuffle is lineitem<->orders on orderkey; the year bucket "
    "and the <> filter are post-join map work. At 100 TB customer "
    "outgrows the broadcast threshold and AQE falls back to a "
    "shuffle join on custkey - the declared plan stays valid.",
)
def q_nation_trade_flows(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("l_shipdate") <= F.lit("1997-12-31").cast("date"))
    ).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.to_date("l_shipdate")).alias("ship_year"),
        )
        .agg(_dsum(revenue, 6).alias("revenue"))
    )


# --- conditional-aggregate ratio over a broadcast join (TPC-H Q14 shape) ---

_PROMO_SHARE_SQL = """
SELECT
    CAST(date_trunc('month', CAST(l.l_shipdate AS DATE)) AS DATE) AS ship_month,
    CAST(SUM(CAST(CASE WHEN p.p_type = 'PROMO'
                       THEN l.l_extendedprice * (1 - l.l_discount)
                       ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE) AS promo_revenue,
    CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE)
        AS total_revenue,
    100.0 * CAST(SUM(CAST(CASE WHEN p.p_type = 'PROMO'
                       THEN l.l_extendedprice * (1 - l.l_discount)
                       ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
          / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE)
        AS promo_share_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l.l_shipdate AS DATE) < DATE '1997-01-01'
GROUP BY ship_month
"""


@register(
    "promo_revenue_share",
    _PROMO_SHARE_SQL,
    doc="Monthly promo revenue share (TPC-H Q14 shape): conditional "
    "aggregate ratio where both numerator and denominator come from "
    "one grouped pass over a part<->lineitem broadcast join - no "
    "second scan, no self-join. Ratio is (100 * promo)/total in "
    "DOUBLE on both engines with decimal accumulation underneath.",
)
def q_promo_revenue_share(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1997-01-01").cast("date"))
    ).select("l_partkey", "l_extendedprice", "l_discount", "l_shipdate")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0.0))
    out = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.date_trunc("month", F.to_date("l_shipdate"))
            .cast("date")
            .alias("ship_month")
        )
        .agg(
            _dsum(promo, 6).alias("promo_revenue"),
            _dsum(revenue, 6).alias("total_revenue"),
        )
    )
    return out.select(
        "ship_month",
        "promo_revenue",
        "total_revenue",
        (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias(
            "promo_share_pct"
        ),
    )


# --- disjunctive multi-attribute join predicate (TPC-H Q19 shape) ---

_BRAND_BANDS_SQL = """
SELECT
    CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE)
        AS revenue,
    COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@register(
    "brand_band_revenue",
    _BRAND_BANDS_SQL,
    doc="Disjunctive multi-attribute join predicate (TPC-H Q19 shape): "
    "an OR of three brand/size/quantity conjunctions that mixes "
    "columns from both sides. Expressed as a clean equi-join on "
    "partkey plus a residual disjunctive filter, so the engine still "
    "gets a hash join (broadcast here) instead of a nested-loop over "
    "the OR; the brand/size half of each conjunct is pushed to the "
    "part scan as a derived OR filter by Catalyst.",
)
def q_brand_band_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    band = (
        ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 5)
         & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(1, 10)
           & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 15)
           & qty.between(20, 30))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(band)
        .agg(_dsum(revenue, 6).alias("revenue"), F.count("*").alias("n_lines"))
    )


# --------------------- scalar function battery (F-family extension)

_SCALAR_BATTERY_SQL = """
WITH base AS (
    SELECT c_custkey, c_name, c_mktsegment,
           DATE '1995-01-01' + CAST(c_custkey % 365 AS INTEGER) AS d
    FROM customer
)
SELECT c_custkey AS custkey,
       UPPER(c_name) AS name_upper,
       UPPER(substr(c_name, 1, 1)) || LOWER(substr(c_name, 2))
           AS name_capitalized,
       REVERSE(c_name) AS name_reversed,
       TRANSLATE(c_name, 'aeiou', '#####') AS vowels_masked,
       CAST(STRPOS(c_name, '1') AS INTEGER) AS pos_digit_one,
       LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
       REPEAT('*', CAST(c_custkey % 4 AS INTEGER)) AS stars,
       CAST(ASCII(c_name) AS INTEGER) AS first_char_code,
       CAST(LEVENSHTEIN(c_name, c_mktsegment) AS INTEGER) AS name_seg_dist,
       CAST(QUARTER(d) AS INTEGER) AS d_quarter,
       CAST(DAYOFYEAR(d) AS INTEGER) AS d_dayofyear,
       CAST(LAST_DAY(d) AS DATE) AS d_month_end,
       CAST(d + to_months(CAST(c_custkey % 12 AS INTEGER)) AS DATE) AS d_plus_months
FROM base
ORDER BY custkey
"""


@register(
    "scalar_function_battery",
    _SCALAR_BATTERY_SQL,
    doc="Scalar-function parity battery (SURVEY §2.3 widening): 13 "
    "string/date functions — case mapping, capitalize, reverse, "
    "translate, substring search, padding, repeat, ascii, "
    "levenshtein, quarter/dayofyear, month-end, add_months with "
    "month-end clamping — in ONE scan-local projection, every value "
    "hash-compared against the oracle's implementation. The parity "
    "proof that a user's scalar expressions migrate verbatim; all "
    "codegen-resident, zero shuffles (the ORDER BY exists only to "
    "stabilize the artifact).",
)
def q_scalar_function_battery(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    d = F.date_add(
        F.lit("1995-01-01").cast("date"), (F.col("c_custkey") % 365).cast("int")
    )
    return cust.select(
        F.col("c_custkey").alias("custkey"),
        F.upper("c_name").alias("name_upper"),
        F.concat(
            F.upper(F.substring("c_name", 1, 1)),
            F.lower(F.expr("substring(c_name, 2)")),
        ).alias("name_capitalized"),
        F.reverse("c_name").alias("name_reversed"),
        F.translate("c_name", "aeiou", "#####").alias("vowels_masked"),
        F.instr("c_name", "1").cast("int").alias("pos_digit_one"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.expr("repeat('*', CAST(c_custkey % 4 AS INT))").alias("stars"),
        F.ascii("c_name").cast("int").alias("first_char_code"),
        F.levenshtein("c_name", "c_mktsegment").cast("int").alias(
            "name_seg_dist"
        ),
        F.quarter(d).cast("int").alias("d_quarter"),
        F.dayofyear(d).cast("int").alias("d_dayofyear"),
        F.last_day(d).alias("d_month_end"),
        F.add_months(d, (F.col("c_custkey") % 12).cast("int")).alias(
            "d_plus_months"
        ),
    ).orderBy("custkey")


# ----------------- array / higher-order function battery (§2.3 ext.)

_ARRAY_BATTERY_SQL = """
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings)
SELECT vec_id,
       CAST(len(ev) AS INTEGER) AS dim,
       CAST(len(list_filter(ev, x -> x > 0)) AS INTEGER) AS n_pos,
       CAST(list_sum(list_transform(ev,
            x -> CAST(floor(x * 1000) AS BIGINT))) AS BIGINT) AS sum_milli,
       list_min(ev) AS v_min,
       list_max(ev) AS v_max,
       ev[1] + ev[-1] AS ends_sum,
       list_sort(ev)[1] AS s1,
       list_sort(ev)[2] AS s2,
       list_sort(ev)[3] AS s3,
       CAST(len(list_distinct(list_transform(ev,
            x -> CASE WHEN x >= 0 THEN 1 ELSE -1 END))) AS INTEGER)
           AS n_signs
FROM base
ORDER BY vec_id
"""


@register(
    "array_function_battery",
    _ARRAY_BATTERY_SQL,
    doc="Higher-order array-function parity battery (SURVEY §2.3 "
    "widening): size, lambda filter, transform->fold (integerized so "
    "the fold is exact), array min/max, positional access from both "
    "ends, sort + positional take, and distinct-over-transform — in "
    "ONE scan-local projection over the embedding column, every "
    "value hash-verified. These are the primitives the vector and "
    "text surfaces build on (functions/vectors.py); the battery "
    "pins their semantics (1-based indexing, NULL behavior, sort "
    "order) against an independent engine.",
)
def q_array_function_battery(spark, sf_dir):
    from ecom_churn_lakehouse_spark.functions.vectors import to_double_array

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array(F.col("embedding")).alias("ev")
    )
    sorted_ev = F.sort_array("ev")
    return emb.select(
        "vec_id",
        F.size("ev").cast("int").alias("dim"),
        F.size(F.filter("ev", lambda x: x > 0)).cast("int").alias("n_pos"),
        F.aggregate(
            F.transform(
                "ev", lambda x: F.floor(x * 1000).cast("long")
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_milli"),
        F.array_min("ev").alias("v_min"),
        F.array_max("ev").alias("v_max"),
        (F.element_at("ev", 1) + F.element_at("ev", -1)).alias("ends_sum"),
        F.element_at(sorted_ev, 1).alias("s1"),
        F.element_at(sorted_ev, 2).alias("s2"),
        F.element_at(sorted_ev, 3).alias("s3"),
        F.size(
            F.array_distinct(
                F.transform(
                    "ev",
                    lambda x: F.when(x >= 0, F.lit(1)).otherwise(F.lit(-1)),
                )
            )
        )
        .cast("int")
        .alias("n_signs"),
    ).orderBy("vec_id")


# --------------------------- regex function battery (§2.3 extension)

_REGEX_BATTERY_SQL = r"""
SELECT doc_id,
       regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+e\b')) AS INTEGER)
           AS n_e_words,
       regexp_replace(text, '\s+', '_', 'g') AS snake_text,
       regexp_matches(text, '^[a-z]') AS starts_lower,
       regexp_split_to_array(text, '\s+')[2] AS second_token,
       CAST(len(regexp_extract_all(text, '(?i)[aeiou]{2}')) AS INTEGER)
           AS n_vowel_pairs
FROM documents
ORDER BY doc_id
"""


@register(
    "regex_function_battery",
    _REGEX_BATTERY_SQL,
    doc="Regex parity battery (SURVEY §2.3 widening): capture-group "
    "extract, extract-all count with a word-boundary anchor, global "
    "replace, anchored match test, regex split with positional take, "
    "and a case-insensitive inline-flag class — the regex dialect "
    "subset (RE2-compatible, no backrefs/lookaround) that runs "
    "byte-identically on Spark's Java regex and the oracle's RE2, "
    "which is the portability contract all text-surface operators "
    "(queries/text_queries.py, dq PII scrub) are written against. "
    "Scan-local projection, zero shuffles.",
)
def q_regex_function_battery(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", r"([A-Za-z]+)", 1).alias("first_word"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z]+e\b"), 0)
        )
        .cast("int")
        .alias("n_e_words"),
        F.regexp_replace("text", r"\s+", "_").alias("snake_text"),
        F.col("text").rlike("^[a-z]").alias("starts_lower"),
        F.element_at(toks, 2).alias("second_token"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(r"(?i)[aeiou]{2}"), 0)
        )
        .cast("int")
        .alias("n_vowel_pairs"),
    ).orderBy("doc_id")


# ------------------------- null ordering semantics (sort/window corner)

_NULL_ORD_SQL = """
WITH t AS (
    SELECT o_orderkey, o_orderstatus,
           NULLIF(o_orderpriority, '3-MEDIUM') AS pri
    FROM orders
)
SELECT o_orderstatus AS status,
       CAST(COUNT(*) FILTER (WHERE pri IS NULL) AS BIGINT) AS n_null_pri,
       (MIN({'isnull': CASE WHEN pri IS NULL THEN 0 ELSE 1 END,
             'p': COALESCE(pri, ''), 'k': o_orderkey})).k
           AS first_key_nulls_first,
       (MIN({'isnull': CASE WHEN pri IS NULL THEN 1 ELSE 0 END,
             'p': COALESCE(pri, ''), 'k': o_orderkey})).k
           AS first_key_nulls_last
FROM t
GROUP BY o_orderstatus
"""


@register(
    "null_ordering_battery",
    _NULL_ORD_SQL,
    doc="NULL-ordering semantics battery: rows with a synthesized NULL "
    "attribute (NULLIF) ranked under asc_nulls_first vs "
    "asc_nulls_last per group, reduced to the deterministic first "
    "key each convention selects (plus the null count). The Spark "
    "side exercises the window-ordering flags (row_number over "
    "asc_nulls_first / asc_nulls_last with a key tie-break); the "
    "oracle encodes the SAME total orders as struct-min argmins "
    "(explicit isnull rank + attribute + key), so a flipped default "
    "or missing tie-break hash-fails. The corner matters because "
    "Spark and many engines default NULLS FIRST for ASC while "
    "SQL-standard RDBMSs often default NULLS LAST — this entry pins "
    "the engine's behavior explicitly instead of trusting defaults.",
)
def q_null_ordering_battery(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    t = orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")).alias("pri"),
    )
    w_nf = Window.partitionBy("o_orderstatus").orderBy(
        F.col("pri").asc_nulls_first(), "o_orderkey"
    )
    w_nl = Window.partitionBy("o_orderstatus").orderBy(
        F.col("pri").asc_nulls_last(), "o_orderkey"
    )
    ranked = t.select(
        "o_orderstatus",
        "o_orderkey",
        "pri",
        F.row_number().over(w_nf).alias("__rnf"),
        F.row_number().over(w_nl).alias("__rnl"),
    )
    return ranked.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count_if(F.col("pri").isNull()).cast("long").alias("n_null_pri"),
        F.max(F.when(F.col("__rnf") == 1, F.col("o_orderkey"))).alias(
            "first_key_nulls_first"
        ),
        F.max(F.when(F.col("__rnl") == 1, F.col("o_orderkey"))).alias(
            "first_key_nulls_last"
        ),
    )


# ---------------------------------------------------------------------------
# Round 9 fourth wave: calendar-semantics battery (ISO week machinery).
# ---------------------------------------------------------------------------


def _calendar_battery_sql(engine: str) -> str:
    # The two spellings ANSI leaves divergent, split per engine
    # (everything else is verbatim-shared):
    # - ISO day-of-week (Mon=1..Sun=7): DuckDB has isodow(); Spark's
    #   native dayofweek() is Sun=1 and weekday() is Mon=0 — the
    #   classic off-by-one pair this battery exists to pin.
    # - days since epoch: DuckDB date subtraction yields an integer,
    #   Spark needs datediff().
    if engine == "duck":
        iso_dow = "isodow(d)"
        epoch_days = "(d - DATE '1970-01-01')"
    else:
        iso_dow = "weekday(d) + 1"
        epoch_days = "datediff(d, DATE '1970-01-01')"
    return f"""
WITH dates AS (
    SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders
)
SELECT d,
       CAST({iso_dow} AS INTEGER) AS iso_dow,
       CAST(weekofyear(d) AS INTEGER) AS iso_week,
       CAST(EXTRACT(YEAR FROM d) AS INTEGER) AS cal_year,
       CAST(dayofyear(d) AS INTEGER) AS day_of_year,
       CAST(quarter(d) AS INTEGER) AS qtr,
       CAST({epoch_days} AS BIGINT) AS epoch_days,
       CAST(EXTRACT(DAY FROM last_day(d)) AS INTEGER) AS month_len,
       (weekofyear(d) >= 52 AND EXTRACT(MONTH FROM d) = 1)
           AS iso_week_of_prior_year,
       (weekofyear(d) = 1 AND EXTRACT(MONTH FROM d) = 12)
           AS iso_week_of_next_year
FROM dates
ORDER BY d
"""


@register(
    "calendar_battery",
    _calendar_battery_sql("duck"),
    doc="Calendar-semantics battery over the distinct order dates: "
    "ISO day-of-week (Mon=1..Sun=7 — pinned via the engine-split "
    "spelling isodow() vs weekday()+1, because Spark's native "
    "dayofweek() is Sunday=1 and silently disagrees with DuckDB's "
    "Sunday=0: the off-by-one every cross-engine date pipeline "
    "hits), ISO week number, day-of-year, quarter, exact "
    "days-since-epoch (the join-key normalization date pipelines "
    "standardize on), month length via last_day, and the two ISO "
    "year-boundary traps surfaced as flags — early-January dates "
    "that belong to the PRIOR ISO year's week 52/53 and late-"
    "December dates that belong to week 1 of the NEXT (both occur "
    "in the fixture's 1992-1998 calendar, so the flags are "
    "non-vacuous at every SF). All integer outputs; the frame is "
    "the calendar-bounded distinct-date grain. Companion to "
    "scalar_function_battery's date arithmetic: that pins "
    "FUNCTIONS, this pins CALENDAR SEMANTICS.",
)
def q_calendar_battery(spark, sf_dir):
    from ecom_churn_lakehouse_spark.sources.catalog import run_sql

    return run_sql(spark, sf_dir, _calendar_battery_sql("spark"))
