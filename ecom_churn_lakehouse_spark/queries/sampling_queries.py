"""Deterministic sampling / split / rebalancing registry entries.

Extension surface (SURVEY §7.7): the reference has no sampling
operators, but a training-data pipeline is not usable without
reproducible splits. All three entries are hash-assignment based
(operators/sampling.py) and oracle-verified bit-for-bit — the point of
hash splitting is exactly that an independent engine computes the same
assignment.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecom_churn_lakehouse_spark.operators.sampling import (
    assign_split,
    balance_classes,
    hash_bucket,
    stratified_sample,
)
from ecom_churn_lakehouse_spark.plans.churn import churn_labels
from ecom_churn_lakehouse_spark.registry import AS_OF, HORIZON_DAYS, register
from ecom_churn_lakehouse_spark.sources import (
    load_events,
    load_table,
    normalized_orders,
)

# Portable bucket — the shared SQL twin of operators/sampling.py's
# hash_bucket (one spelling, cannot desynchronize).
def _hb_sql(salt: str, key: str, mod: int | None = None) -> str:
    from ecom_churn_lakehouse_spark.operators.sampling import (
        HASH_MOD,
        hash_bucket_sql,
    )

    return hash_bucket_sql(key, salt, mod if mod is not None else HASH_MOD)


# ------------------------------------------------- train/val/test split

_SPLIT_SQL = f"""
WITH hb AS (
    SELECT c_custkey AS customer_id,
           c_mktsegment AS segment,
           {_hb_sql("split:", "c_custkey")} AS hb
    FROM customer
)
SELECT customer_id,
       segment,
       CASE WHEN hb < 8000 THEN 'train'
            WHEN hb < 9000 THEN 'val'
            ELSE 'test' END AS split
FROM hb
"""


@register(
    "customer_split",
    _SPLIT_SQL,
    doc="Deterministic 80/10/10 train/val/test split keyed on customer "
    "(operators/sampling.py). Pure projection — zero-shuffle at any "
    "scale, and a customer's split never changes as data grows.",
)
def q_customer_split(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    return assign_split(
        cust, "customer_id", [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    )


# --------------------------------------------- stratified event sample

_EVENT_FRACTIONS = {"purchase": 1.0, "signup": 0.2, "click": 0.1, "view": 0.05}

_STRAT_SQL = f"""
WITH hb AS (
    SELECT event_id, event_type, user_id,
           {_hb_sql("sample:", "event_id")} AS hb
    FROM events
)
SELECT event_id, event_type, user_id
FROM hb
WHERE hb < CASE event_type
               WHEN 'purchase' THEN 10000
               WHEN 'signup' THEN 2000
               WHEN 'click' THEN 1000
               WHEN 'view' THEN 500
               ELSE 0 END
"""


@register(
    "stratified_event_sample",
    _STRAT_SQL,
    doc="Per-stratum deterministic sampling of the event log (keep all "
    "purchases, thin clicks/views, drop errors) — the curation shape "
    "for training-event extraction. Scan-local filter, no shuffle.",
)
def q_stratified_event_sample(spark, sf_dir):
    ev = load_events(spark, sf_dir).select("event_id", "event_type", "user_id")
    return stratified_sample(
        ev, "event_id", "event_type", _EVENT_FRACTIONS, default_fraction=0.0
    )


# ------------------------------------------------ class rebalancing

_BALANCE_SQL = f"""
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
    SELECT s.customer_id AS customer_id,
           CAST(CASE WHEN f.customer_id IS NULL THEN 1 ELSE 0 END AS INTEGER)
               AS churn_label
    FROM spine s LEFT JOIN future_active f ON s.customer_id = f.customer_id
),
hb AS (
    SELECT customer_id, churn_label,
           {_hb_sql("balance:", "customer_id")} AS hb
    FROM labeled
),
ranked AS (
    SELECT customer_id, churn_label,
           ROW_NUMBER() OVER (PARTITION BY churn_label
                              ORDER BY hb, customer_id) AS rn
    FROM hb
),
mc AS (
    SELECT MIN(cnt) AS min_cnt
    FROM (SELECT COUNT(*) AS cnt FROM labeled GROUP BY churn_label)
)
SELECT customer_id, churn_label FROM ranked, mc WHERE rn <= min_cnt
"""


@register(
    "balanced_churn_classes",
    _BALANCE_SQL,
    doc="Exact class rebalancing of the churn label set: every class "
    "downsampled to the minority size by deterministic hash rank; "
    "min-count travels as a broadcast 1-row frame (no driver collect). "
    "Scale caveat + threshold-based scale path in operators/sampling.py.",
)
def q_balanced_churn_classes(spark, sf_dir):
    labels = churn_labels(normalized_orders(spark, sf_dir), AS_OF, HORIZON_DAYS)
    return balance_classes(labels, "customer_id", "churn_label", exact=True)


# ---------------------- weighted sampling WITHOUT replacement (A-Res)

_WOR_K = 200
_WOR_MOD = 1_000_000

_WOR_SQL = f"""
WITH pri AS (
    SELECT o_orderkey, o_custkey, o_totalprice,
           ROUND(
             -ln((1.0 + CAST(('0x' || substring(md5('wor:' ||
                  CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
                  % {_WOR_MOD}) / {_WOR_MOD}.0)
             / o_totalprice, 12) AS priority
    FROM orders
)
SELECT o_orderkey, o_custkey, o_totalprice, priority
FROM pri
ORDER BY priority, o_orderkey
LIMIT {_WOR_K}
"""


@register(
    "weighted_order_sample_wor",
    _WOR_SQL,
    doc="Weighted sampling WITHOUT replacement (Efraimidis-Spirakis "
    "A-Res): each row gets priority -ln(u)/w from a deterministic "
    "hash-uniform u and weight w = o_totalprice; the global k smallest "
    "priorities are the sample. Complements weighted_order_sample "
    "(Bernoulli, with-replacement-style independence) with the fixed-"
    "size form. Scale: priority is a scan-local expression (no RNG "
    "state, replayable); the top-k is a TakeOrdered (per-partition "
    "heap + k-row merge), never a full sort. Priorities are rounded "
    "to 12dp with an o_orderkey tie-break, so the cut is stable "
    "cross-engine while keeping ~8 significant digits of the "
    "exponential key.",
)
def q_weighted_order_sample_wor(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("wor:"), F.col("o_orderkey").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % _WOR_MOD
    )
    u = (1.0 + bucket) / float(_WOR_MOD)  # (0, 1], never ln(0)
    pri = F.round(-F.log(u) / F.col("o_totalprice"), 12)
    return (
        orders.select(
            "o_orderkey", "o_custkey", "o_totalprice", pri.alias("priority")
        )
        .orderBy("priority", "o_orderkey")
        .limit(_WOR_K)
    )


# --------------- time-based train/validation split (reference parity)

_TEMPORAL_SPLIT_SQL = """
WITH months AS (
    SELECT DISTINCT date_trunc('month', o_orderdate) AS m FROM orders
),
ranked AS (
    SELECT m,
           ROW_NUMBER() OVER (ORDER BY m DESC) AS rn_desc,
           COUNT(*) OVER () AS n_m
    FROM months
),
assigned AS (
    SELECT m,
           CASE WHEN rn_desc <= greatest(CAST(ceil(n_m * 0.2) AS BIGINT),
                                         1) THEN 'validation'
                ELSE 'train' END AS split
    FROM ranked
)
SELECT a.split,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
       CAST(MIN(o.o_orderdate) AS DATE) AS min_date,
       CAST(MAX(o.o_orderdate) AS DATE) AS max_date
FROM orders o
JOIN assigned a ON date_trunc('month', o.o_orderdate) = a.m
GROUP BY a.split
"""


@register(
    "temporal_train_val_split",
    _TEMPORAL_SPLIT_SQL,
    doc="Time-based train/validation split — the reference's split "
    "discipline (train_stub.py:181-199: the LAST ceil(20%) of "
    "distinct as_of_dates become validation, so the model never "
    "trains on the future it is evaluated on), re-expressed over the "
    "orders fixture at month grain. The period assignment is a "
    "window over the DISTINCT period set (tiny at any scale — "
    "dim-sized), then a broadcast join tags the fact rows; emits the "
    "per-split profile (rows, customers, date range) a training run "
    "logs. Contrast with customer_split: entity-hash splits protect "
    "against entity leakage, temporal splits against future leakage "
    "— a pipeline needs both.",
)
def q_temporal_train_val_split(spark, sf_dir):
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate"))
    months = orders.select(month.alias("m")).distinct()
    w = Window.orderBy(F.col("m").desc())
    n_valid = F.greatest(
        F.ceil(F.count("*").over(Window.partitionBy()) * 0.2), F.lit(1)
    )
    assigned = months.select(
        "m",
        F.when(F.row_number().over(w) <= n_valid, "validation")
        .otherwise("train")
        .alias("split"),
    )
    return (
        orders.join(
            F.broadcast(assigned), month.cast("timestamp") == F.col("m")
        )
        .groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.count_distinct("o_custkey").cast("long").alias("n_customers"),
            F.min("o_orderdate").cast("date").alias("min_date"),
            F.max("o_orderdate").cast("date").alias("max_date"),
        )
    )


# -------------------- negative sampling for recommender training

_NEG_HASH = (
    "CAST(('0x' || substring(md5('neg:' || CAST(o_custkey AS VARCHAR) || ':' "
    "|| CAST(j AS VARCHAR)), 1, 15)) AS BIGINT)"
)

_NEGSAMPLE_SQL = f"""
WITH pos AS (
    SELECT DISTINCT o.o_custkey, l.l_partkey
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
np AS (SELECT COUNT(*) AS n_parts FROM part),
cand AS (
    SELECT u.o_custkey, u.j,
           {_NEG_HASH} % (SELECT n_parts FROM np) AS cand_part
    FROM (
        SELECT DISTINCT o_custkey, g.j
        FROM orders, (SELECT unnest(range(12)) AS j) g
    ) u
),
negs AS (
    SELECT c.o_custkey, c.cand_part, MIN(c.j) AS pick_order
    FROM cand c
    LEFT JOIN pos p
      ON p.o_custkey = c.o_custkey AND p.l_partkey = c.cand_part
    WHERE p.l_partkey IS NULL
    GROUP BY c.o_custkey, c.cand_part
)
SELECT o_custkey AS customer_id,
       CAST(cand_part AS BIGINT) AS negative_partkey,
       CAST(pick_order AS INTEGER) AS pick_order
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_custkey ORDER BY pick_order, cand_part) AS rn
    FROM negs
)
WHERE rn <= 5
"""


@register(
    "user_item_negative_samples",
    _NEGSAMPLE_SQL,
    doc="Deterministic negative sampling for recommender / contrastive "
    "training: per customer, hash 12 pseudo-random candidate part ids "
    "(md5 keyed on customer x draw index — the same portable idiom as "
    "the split/stratified entries), anti-join the customer's actual "
    "purchase set, dedup hash collisions (min draw index survives), "
    "keep the first 5 by draw order. Work is |users| x 12 candidate "
    "rows — never |users| x |items| — and the anti-join shuffles on "
    "(user, item) exactly like the positives relation, so the plan "
    "scales to billions of interactions. Reproducible on any engine, "
    "any cluster size, forever (pure hash arithmetic, no RNG state).",
)
def q_user_item_negative_samples(spark, sf_dir):
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pos = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    np_ = part.agg(F.count("*").alias("n_parts"))
    users = orders.select("o_custkey").distinct()
    cand = (
        users.crossJoin(F.broadcast(spark.range(12).select(F.col("id").alias("j"))))
        .crossJoin(F.broadcast(np_))
        .select(
            "o_custkey",
            "j",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("neg:"),
                                F.col("o_custkey").cast("string"),
                                F.lit(":"),
                                F.col("j").cast("string"),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("n_parts")
            ).alias("cand_part"),
        )
    )
    negs = (
        cand.join(
            pos,
            (cand["o_custkey"] == pos["o_custkey"])
            & (cand["cand_part"] == pos["l_partkey"]),
            "left_anti",
        )
        .groupBy("o_custkey", "cand_part")
        .agg(F.min("j").alias("pick_order"))
    )
    w = Window.partitionBy("o_custkey").orderBy("pick_order", "cand_part")
    return (
        negs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 5)
        .select(
            F.col("o_custkey").alias("customer_id"),
            F.col("cand_part").cast("long").alias("negative_partkey"),
            F.col("pick_order").cast("int").alias("pick_order"),
        )
    )


# --------------- fixed-k weighted sample per group (stratified A-Res)

_GWOR_K = 5
_GWOR_MOD = 1_000_000

_GROUP_WOR_SQL = f"""
WITH pri AS (
    SELECT o.o_orderkey, o.o_totalprice,
           n.n_name AS nation,
           ROUND(
             -ln((1.0 + {_hb_sql("gwor:", "o.o_orderkey", _GWOR_MOD)})
                 / {_GWOR_MOD}.0)
             / o.o_totalprice, 12) AS priority
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY nation ORDER BY priority, o_orderkey
    ) AS rn
    FROM pri
)
SELECT nation, o_orderkey, o_totalprice, priority
FROM ranked WHERE rn <= {_GWOR_K}
ORDER BY nation, priority, o_orderkey
"""


@register(
    "per_nation_order_sample",
    _GROUP_WOR_SQL,
    doc="Fixed-size weighted sample WITHOUT replacement per group "
    "(Efraimidis-Spirakis A-Res under a per-nation rank window): "
    "exactly k=5 orders per nation, selection probability "
    "proportional to order value WITHIN each stratum — the "
    "every-stratum-represented form of weighted_order_sample_wor "
    "(whose global top-k can starve small strata entirely). The "
    "priority is the same scan-local replayable expression; the only "
    "added cost is the per-group rank window, whose shuffle carries "
    "4 columns — at 100 TB a two-phase refinement (per-partition "
    "k-heap, then rank only survivors) bounds the sort, the same "
    "TakeOrdered idea applied per key.",
)
def q_per_nation_order_sample(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    bucket = hash_bucket(F.col("o_orderkey"), "gwor:", mod=_GWOR_MOD)
    u = (1.0 + bucket) / float(_GWOR_MOD)
    pri = F.round(-F.log(u) / F.col("o_totalprice"), 12)
    from pyspark.sql.window import Window

    w = Window.partitionBy("nation").orderBy("priority", "o_orderkey")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("nation", "o_orderkey", "o_totalprice", pri.alias("priority"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= _GWOR_K)
        .drop("__rn")
        .orderBy("nation", "priority", "o_orderkey")
    )


# ------------------------------------ approximate query processing

_AQP_FRAC = 16  # 1-in-16 deterministic hash sample


def _aqp_sql() -> str:
    from ecom_churn_lakehouse_spark.operators.sampling import hash_bucket_sql

    bucket = hash_bucket_sql(
        "l_orderkey * 10 + l_linenumber", "aqp", _AQP_FRAC
    )
    return f"""
WITH li AS (
    SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
           {bucket} AS b
    FROM lineitem
),
full_scan AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(cents) AS BIGINT) AS true_cents
    FROM li
),
sampled AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sample,
           CAST(SUM(cents) * {_AQP_FRAC} AS BIGINT) AS est_cents
    FROM li WHERE b = 0
)
SELECT f.n_total, s.n_sample, f.true_cents, s.est_cents,
       CAST(abs(s.est_cents - f.true_cents) * 1000000 // f.true_cents
            AS BIGINT) AS abs_err_ppm
FROM full_scan f CROSS JOIN sampled s
"""


@register(
    "aqp_sampled_revenue",
    _aqp_sql(),
    doc="Approximate query processing with measured error: total "
    "lineitem revenue estimated from a deterministic 1-in-16 "
    "md5-hash sample (operators/sampling.py's ONE portable bucket "
    "idiom), scaled up, and compared against the exact scan — the "
    "estimate, the truth, and the achieved error in exact ppm in "
    "one artifact. The production pattern at 100 TB is the sample "
    "side ALONE (a 6% scan answering dashboard-grade questions); "
    "shipping the error column is what makes the approximation "
    "auditable rather than hoped-for. The fixture runs both sides "
    "in one pass off a shared projection.",
)
def q_aqp_sampled_revenue(spark, sf_dir):
    from ecom_churn_lakehouse_spark.operators.sampling import hash_bucket

    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
        hash_bucket(
            F.col("l_orderkey") * 10 + F.col("l_linenumber"),
            "aqp",
            _AQP_FRAC,
        ).alias("b"),
    )
    full_scan = li.agg(
        F.count("*").cast("long").alias("n_total"),
        F.sum("cents").cast("long").alias("true_cents"),
    )
    sampled = li.filter(F.col("b") == 0).agg(
        F.count("*").cast("long").alias("n_sample"),
        (F.sum("cents") * _AQP_FRAC).cast("long").alias("est_cents"),
    )
    return full_scan.crossJoin(sampled).select(
        "n_total",
        "n_sample",
        "true_cents",
        "est_cents",
        F.expr(
            "abs(est_cents - true_cents) * 1000000 DIV true_cents"
        )
        .cast("long")
        .alias("abs_err_ppm"),
    )


# ---------------------------------------- Horvitz-Thompson estimation

#: Per-stratum Poisson inclusion rates in permille. '5-LOW' keeps
#: everything — the degenerate stratum doubles as a built-in check
#: (its HT total must equal the population total and its SE must be
#: exactly 0).
_HT_RATE_CASE = (
    "CASE {col} WHEN '1-URGENT' THEN 50 WHEN '2-HIGH' THEN 100"
    " WHEN '3-MEDIUM' THEN 200 WHEN '4-NOT SPECIFIED' THEN 500"
    " ELSE 1000 END"
)

#: Poisson-sampling SE of the HT total with constant per-stratum
#: inclusion probability pi = rate/1000:
#:   Var = (1-pi)/pi^2 * SUM_sample(y^2) = (1000-rate)*1000/rate^2 * sumsq
#: One shared IEEE expression text on both engines — every input is an
#: exact integer (sumsq_dec is an exact DECIMAL(38,0) sum of cents^2),
#: and each float op in a fixed expression is correctly rounded, so
#: the double is bit-identical cross-engine.
_HT_SE_CENTS = (
    "CAST(FLOOR(sqrt((1000.0 - CAST(rate_permille AS DOUBLE)) * 1000.0"
    " / (CAST(rate_permille AS DOUBLE) * CAST(rate_permille AS DOUBLE))"
    " * CAST(sumsq_dec AS DOUBLE))) AS BIGINT)"
)

_HT_SQL = f"""
WITH base AS (
    SELECT o_orderpriority AS priority,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
           {_hb_sql("ht:", "o_orderkey", 1000)} AS hb,
           {_HT_RATE_CASE.format(col="o_orderpriority")} AS rate_permille
    FROM orders
),
g AS (
    SELECT priority, rate_permille,
           CAST(COUNT(*) AS BIGINT) AS n_pop,
           CAST(SUM(cents) AS BIGINT) AS pop_cents,
           CAST(SUM(CASE WHEN hb < rate_permille THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sample,
           CAST(SUM(CASE WHEN hb < rate_permille THEN cents ELSE 0 END)
               AS BIGINT) AS sample_cents,
           CAST(SUM(CASE WHEN hb < rate_permille
                         THEN CAST(cents AS DECIMAL(20,0)) * cents
                         ELSE 0 END) AS DECIMAL(38,0)) AS sumsq_dec
    FROM base GROUP BY priority, rate_permille
)
SELECT priority, CAST(rate_permille AS BIGINT) AS rate_permille,
       n_pop, n_sample, pop_cents, sample_cents,
       CAST(sample_cents * 1000 // rate_permille AS BIGINT) AS ht_total_cents,
       CAST(sumsq_dec AS VARCHAR) AS sample_sumsq,
       {_HT_SE_CENTS} AS se_cents,
       CAST(abs(sample_cents * 1000 // rate_permille - pop_cents) * 1000000
            // pop_cents AS BIGINT) AS abs_err_ppm
FROM g
"""


@register(
    "horvitz_thompson_total",
    _HT_SQL,
    doc="Horvitz-Thompson estimation under deterministic stratified "
    "Poisson sampling: each order priority stratum keeps rows whose "
    "hash bucket falls under its permille rate (5% urgent .. 100% "
    "low), then the HT total SUM(y_i/pi_i) and its Poisson-design SE "
    "sqrt((1-pi)/pi^2 * SUM_s y^2) are computed per stratum from "
    "exact integer components — the survey-sampling estimator behind "
    "every unequal-probability AQP read. The '5-LOW' stratum samples "
    "at 1000 permille, so its HT total equals the population total "
    "and its SE is exactly 0 (built-in degeneracy check); the only "
    "float is one shared IEEE sqrt expression over exact ints. "
    "Scale: one scan, one map-combinable groupBy on a 5-value key — "
    "no window, no join; sample_cents*1000 stays under int64 through "
    "per-stratum totals of ~9e15 cents (several PB of orders); past "
    "that the estimator moves to DECIMAL(38) cross-products like the "
    "unit-value index. Reference keyed-sampling analogue: the "
    "deterministic-assignment discipline of customer_split.",
)
def q_horvitz_thompson_total(spark, sf_dir):
    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
        hash_bucket(F.col("o_orderkey"), "ht:", mod=1000).alias("hb"),
        F.expr(_HT_RATE_CASE.format(col="o_orderpriority")).alias("rate_permille"),
    )
    in_s = F.col("hb") < F.col("rate_permille")
    g = base.groupBy("priority", "rate_permille").agg(
        F.count("*").cast("long").alias("n_pop"),
        F.sum("cents").cast("long").alias("pop_cents"),
        F.sum(F.when(in_s, 1).otherwise(0)).cast("long").alias("n_sample"),
        F.sum(F.when(in_s, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("sample_cents"),
        F.sum(
            F.when(
                in_s, F.col("cents").cast("decimal(20,0)") * F.col("cents")
            ).otherwise(F.lit(0).cast("decimal(20,0)"))
        )
        .cast("decimal(38,0)")
        .alias("sumsq_dec"),
    )
    return g.select(
        "priority",
        F.col("rate_permille").cast("long").alias("rate_permille"),
        "n_pop",
        "n_sample",
        "pop_cents",
        "sample_cents",
        F.expr("sample_cents * 1000 DIV rate_permille")
        .cast("long")
        .alias("ht_total_cents"),
        F.col("sumsq_dec").cast("string").alias("sample_sumsq"),
        F.expr(_HT_SE_CENTS).alias("se_cents"),
        F.expr(
            "abs(sample_cents * 1000 DIV rate_permille - pop_cents) * 1000000"
            " DIV pop_cents"
        )
        .cast("long")
        .alias("abs_err_ppm"),
    )


# ------------------------------------------------ sample-ratio mismatch

#: Pearson chi-square for the 80/10/10 assignment against its design
#: weights, one shared IEEE expression from exact integer counts.
#: Expected counts use the exact design fractions (permyriad weights
#: over HASH_MOD buckets: 8000/1000/1000 of 10000).
_SRM_CHI2_MILLI = (
    "CAST(FLOOR(("
    "(CAST(n_train AS DOUBLE) - CAST(n AS DOUBLE) * 0.8)"
    " * (CAST(n_train AS DOUBLE) - CAST(n AS DOUBLE) * 0.8)"
    " / (CAST(n AS DOUBLE) * 0.8)"
    " + (CAST(n_val AS DOUBLE) - CAST(n AS DOUBLE) * 0.1)"
    "   * (CAST(n_val AS DOUBLE) - CAST(n AS DOUBLE) * 0.1)"
    "   / (CAST(n AS DOUBLE) * 0.1)"
    " + (CAST(n_test AS DOUBLE) - CAST(n AS DOUBLE) * 0.1)"
    "   * (CAST(n_test AS DOUBLE) - CAST(n AS DOUBLE) * 0.1)"
    "   / (CAST(n AS DOUBLE) * 0.1)"
    ") * 1000.0) AS BIGINT)"
)

_SRM_SQL = f"""
WITH hb AS (
    SELECT {_hb_sql("split:", "c_custkey")} AS b FROM customer
),
comp AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN b < 8000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_train,
           CAST(SUM(CASE WHEN b >= 8000 AND b < 9000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_val,
           CAST(SUM(CASE WHEN b >= 9000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_test
    FROM hb
)
SELECT n, n_train, n_val, n_test,
       {_SRM_CHI2_MILLI} AS chi2_milli,
       {_SRM_CHI2_MILLI} > 5991 AS srm_detected
FROM comp
"""


@register(
    "split_srm_check",
    _SRM_SQL,
    doc="Sample-ratio-mismatch check on the 80/10/10 customer split: "
    "Pearson chi-square of the observed assignment counts against "
    "the design weights (df=2, critical 5.991) — the guardrail every "
    "experiment pipeline runs BEFORE reading treatment effects, "
    "because a biased splitter invalidates everything downstream "
    "(and a hash splitter drifting from its weights means key-space "
    "pathology). Counts come from the same md5 bucket spelling as "
    "customer_split (one scan, one fused agg); the only float is "
    "one shared IEEE expression, milli-floored. Scale: pure-count "
    "shape, unchanged at any fact size.",
)
def q_split_srm_check(spark, sf_dir):
    hb = load_table(spark, sf_dir, "customer").select(
        hash_bucket(F.col("c_custkey"), "split:").alias("b")
    )
    comp = hb.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("b") < 8000, 1).otherwise(0))
        .cast("long")
        .alias("n_train"),
        F.sum(F.when((F.col("b") >= 8000) & (F.col("b") < 9000), 1).otherwise(0))
        .cast("long")
        .alias("n_val"),
        F.sum(F.when(F.col("b") >= 9000, 1).otherwise(0))
        .cast("long")
        .alias("n_test"),
    )
    return comp.select(
        "n",
        "n_train",
        "n_val",
        "n_test",
        F.expr(_SRM_CHI2_MILLI).alias("chi2_milli"),
        (F.expr(_SRM_CHI2_MILLI) > 5991).alias("srm_detected"),
    )


# ------------------------------------------------ IPF raking weights

_IPF_ITERS = 2  # row+column sweeps


def _ipf_sql() -> str:
    hb = _hb_sql("rake:", "c.c_custkey")
    steps = []
    prev = "w0"
    for it in range(1, _IPF_ITERS + 1):
        steps.append(
            f"""row{it} AS (
    SELECT w.segment, w.region, w.c,
           CAST(w.weight_milli * m.pop_seg * 1000
                // SUM(w.c * w.weight_milli) OVER (PARTITION BY w.segment)
                AS BIGINT) AS weight_milli
    FROM {prev} w JOIN seg_m m ON m.segment = w.segment
),
col{it} AS (
    SELECT w.segment, w.region, w.c,
           CAST(w.weight_milli * m.pop_reg * 1000
                // SUM(w.c * w.weight_milli) OVER (PARTITION BY w.region)
                AS BIGINT) AS weight_milli
    FROM row{it} w JOIN reg_m m ON m.region = w.region
)"""
        )
        prev = f"col{it}"
    steps_sql = ",\n".join(steps)
    return f"""
WITH pop AS (
    SELECT c.c_mktsegment AS segment,
           CAST(r.r_regionkey AS BIGINT) AS region,
           c.c_custkey,
           {hb} AS hb
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
),
seg_m AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS pop_seg FROM pop
          GROUP BY segment),
reg_m AS (SELECT region, CAST(COUNT(*) AS BIGINT) AS pop_reg FROM pop
          GROUP BY region),
samp AS (
    SELECT segment, region, CAST(COUNT(*) AS BIGINT) AS c
    FROM pop WHERE hb < 1000 GROUP BY segment, region
),
tots AS (
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pop) AS n_pop,
           (SELECT CAST(SUM(c) AS BIGINT) FROM samp) AS n_samp
),
w0 AS (
    SELECT s.segment, s.region, s.c,
           CAST(t.n_pop * 1000 // t.n_samp AS BIGINT) AS weight_milli
    FROM samp s CROSS JOIN tots t
),
{steps_sql}
SELECT w.segment, w.region, w.c AS sample_cnt,
       w.weight_milli,
       CAST(w.c * w.weight_milli AS BIGINT) AS weighted_milli
FROM col{_IPF_ITERS} w
ORDER BY w.segment, w.region
"""


@register(
    "ipf_raking_weights",
    _ipf_sql(),
    doc=f"Survey raking (iterative proportional fitting): a 10% "
    "deterministic customer sample is re-weighted over "
    f"{_IPF_ITERS} row+column sweeps so its weighted (segment x "
    "region) margins match the POPULATION margins — the standard "
    "post-stratification machinery for de-biasing any sampled "
    "panel before estimating from it (the multivariate upgrade of "
    "neyman_allocation's design-time weights). All weight "
    "arithmetic is exact integer milli: each sweep multiplies by "
    "pop_margin*1000 DIV weighted_margin where the weighted margin "
    "is an integer window sum over the 25-cell frame. Scale: one "
    "scan for margins + sample counts; every sweep runs on the "
    "bounded cell frame — raking 100 TB costs the margins scan.",
)
def q_ipf_raking_weights(spark, sf_dir):
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    pop = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.col("n_regionkey").cast("long").alias("region"),
            hash_bucket(F.col("c_custkey"), "rake:").alias("hb"),
        )
        .localCheckpoint(eager=False)
    )
    seg_m = pop.groupBy("segment").agg(F.count("*").cast("long").alias("pop_seg"))
    reg_m = pop.groupBy("region").agg(F.count("*").cast("long").alias("pop_reg"))
    samp = (
        pop.filter(F.col("hb") < 1000)
        .groupBy("segment", "region")
        .agg(F.count("*").cast("long").alias("c"))
    )
    n_pop = pop.agg(F.count("*").cast("long").alias("n_pop"))
    n_samp = samp.agg(F.sum("c").cast("long").alias("n_samp"))
    w = (
        samp.crossJoin(F.broadcast(n_pop))
        .crossJoin(F.broadcast(n_samp))
        .select(
            "segment",
            "region",
            "c",
            F.expr("CAST(n_pop * 1000 DIV n_samp AS BIGINT)").alias(
                "weight_milli"
            ),
        )
    )
    for _ in range(_IPF_ITERS):
        w_seg = Window.partitionBy("segment")
        w = w.join(F.broadcast(seg_m), "segment").select(
            "segment",
            "region",
            "c",
            F.expr(
                "CAST(weight_milli * pop_seg * 1000"
                " DIV SUM(c * weight_milli) OVER (PARTITION BY segment)"
                " AS BIGINT)"
            ).alias("weight_milli"),
        )
        w_reg = Window.partitionBy("region")
        w = w.join(F.broadcast(reg_m), "region").select(
            "segment",
            "region",
            "c",
            F.expr(
                "CAST(weight_milli * pop_reg * 1000"
                " DIV SUM(c * weight_milli) OVER (PARTITION BY region)"
                " AS BIGINT)"
            ).alias("weight_milli"),
        )
    return w.select(
        "segment",
        "region",
        F.col("c").alias("sample_cnt"),
        "weight_milli",
        (F.col("c") * F.col("weight_milli")).cast("long").alias("weighted_milli"),
    ).orderBy("segment", "region")


# ------------------------------------------------ monetary-unit sampling

_MUS_TARGET = 200  # target selections -> interval J = total // 200

_MUS_SQL = """
WITH base AS (
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
    FROM orders
),
tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total_cents FROM base),
j AS (SELECT CAST(total_cents // 200 AS BIGINT) AS interval_j FROM tot),
cum AS (
    SELECT b.o_orderkey, b.cents,
           CAST(SUM(b.cents) OVER (ORDER BY b.o_orderkey) AS BIGINT) AS c
    FROM base b
),
selected AS (
    SELECT cum.o_orderkey, cum.cents, j.interval_j
    FROM cum CROSS JOIN j
    WHERE cum.c // j.interval_j > (cum.c - cum.cents) // j.interval_j
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM base) AS n_pop,
       (SELECT total_cents FROM tot) AS total_cents,
       (SELECT interval_j FROM j) AS interval_j,
       CAST(COUNT(*) AS BIGINT) AS n_selected,
       CAST(SUM(cents) AS BIGINT) AS selected_cents,
       CAST(SUM(CASE WHEN cents >= interval_j THEN 1 ELSE 0 END) AS BIGINT)
           AS n_certainty_stratum,
       CAST(SUM(cents) * 10000 // (SELECT total_cents FROM tot) AS BIGINT)
           AS value_coverage_bp
FROM selected
"""


@register(
    "monetary_unit_sample",
    _MUS_SQL,
    doc="Monetary-unit sampling (the financial-audit standard): every "
    "CENT is a sampling unit, orders are selected when their "
    "cumulative-cents interval spans a multiple of the sampling "
    "interval J = total/200 — selection probability proportional to "
    "value with zero randomness (systematic, origin 0), and every "
    "order worth >= J is selected with certainty (the certainty "
    "stratum auditors carve out, surfaced as a column). "
    "Complements horvitz_thompson_total (Poisson PPS) with the "
    "systematic-PPS design whose sample size is FIXED by "
    "construction. Pure integer arithmetic; the cumulative window "
    "is a range-partitionable running sum over the key order. "
    "Scale: one scan + one global cumsum; selection is a row-local "
    "integer predicate.",
)
def q_monetary_unit_sample(spark, sf_dir):
    from pyspark.sql.window import Window

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    tot = base.agg(F.sum("cents").cast("long").alias("total_cents"))
    j = tot.select(
        "total_cents",
        F.expr("CAST(total_cents DIV 200 AS BIGINT)").alias("interval_j"),
    )
    cum = base.select(
        "cents",
        F.sum("cents").over(Window.orderBy("o_orderkey")).cast("long").alias("c"),
    )
    selected = cum.crossJoin(F.broadcast(j)).filter(
        F.expr("c DIV interval_j > (c - cents) DIV interval_j")
    )
    n_pop = base.agg(F.count("*").cast("long").alias("n_pop"))
    return (
        selected.agg(
            F.count("*").cast("long").alias("n_selected"),
            F.sum("cents").cast("long").alias("selected_cents"),
            F.sum(F.when(F.col("cents") >= F.col("interval_j"), 1).otherwise(0))
            .cast("long")
            .alias("n_certainty_stratum"),
            F.max("total_cents").cast("long").alias("total_cents"),
            F.max("interval_j").cast("long").alias("interval_j"),
        )
        .crossJoin(F.broadcast(n_pop))
        .select(
            "n_pop",
            "total_cents",
            "interval_j",
            "n_selected",
            "selected_cents",
            "n_certainty_stratum",
            F.expr(
                "CAST(selected_cents * 10000 DIV total_cents AS BIGINT)"
            ).alias("value_coverage_bp"),
        )
    )
