"""Feature-engineering queries for the churn training pipeline.

Widens the reference's six-feature workload (SURVEY §2.12) with the
derived signals a production churn model adds next — each one a shape
the engine must execute well at 100 TB:

- time-decay weighted spend    (recency-weighted monetary value)
- event-type Markov transitions (sequence features from the event log)
- feature correlation matrix    (training-set audit, exact moments)
- smoothed target encoding      (per-segment churn rate, Laplace-α)

Float discipline: decay weights use only +, /, × on doubles (IEEE
round-to-nearest — bit-identical across engines; no libm transcendental
whose last ulp could differ), sums accumulate in exact DECIMAL, and
correlations derive from exact integer moment sums with a final
sqrt (correctly rounded per IEEE) — so every value hashes identically
against DuckDB regardless of partial-aggregation order.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecom_churn_lakehouse_spark.plans.churn import churn_labels, customer_features
from ecom_churn_lakehouse_spark.queries.churn_queries import _LABELS_SQL
from ecom_churn_lakehouse_spark.registry import AS_OF, register
from ecom_churn_lakehouse_spark.sources import (
    load_events,
    load_table,
    normalized_orders,
)

# ---------------------------------------------------------------------------
# Time-decay weighted spend: weight = 1 / (1 + age_days/30) — a rational
# decay kernel (no exp(), so the weight is bit-identical across engines).
# ---------------------------------------------------------------------------

_DECAYED_SPEND_SQL = f"""
SELECT o_custkey AS customer_id,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(
           o_totalprice
           / (1.0 + date_diff('day', CAST(o_orderdate AS DATE),
                              DATE '{AS_OF}') / 30.0), 6)
           AS DECIMAL(18,6))) AS DOUBLE) AS decayed_spend
FROM orders
WHERE CAST(o_orderdate AS DATE) <= DATE '{AS_OF}'
GROUP BY o_custkey
"""


@register(
    "decayed_customer_spend",
    _DECAYED_SPEND_SQL,
    doc="Recency-weighted monetary value: per-customer spend with a "
    "1/(1+age/30d) decay kernel as of the snapshot date. One scan, one "
    "hash aggregation with map-side combine; the point-in-time filter "
    "is pushed into the scan. The rational kernel (not exp) keeps the "
    "per-row weight bit-identical across engines.",
)
def q_decayed_customer_spend(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    as_of = F.lit(AS_OF).cast("date")
    age = F.datediff(as_of, F.to_date("o_orderdate"))
    weight = F.lit(1.0) + age / F.lit(30.0)
    return (
        orders.filter(F.to_date("o_orderdate") <= as_of)
        .groupBy(F.col("o_custkey").alias("customer_id"))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            # Round to 6 decimals BEFORE the decimal cast: the rounded
            # double sits ~1e-10 from its decimal target, so both
            # engines' double→decimal conversions land on the same
            # value (a raw cast of an arbitrary double occasionally
            # splits on the half-ulp tie and desyncs the hash).
            F.sum(
                F.round(F.col("o_totalprice") / weight, 6).cast("decimal(18,6)")
            ).cast("double").alias("decayed_spend"),
        )
    )


# ---------------------------------------------------------------------------
# Event-type Markov transitions: lag over the per-user event sequence,
# transition counts + row-normalized probabilities.
# ---------------------------------------------------------------------------

_TRANSITIONS_SQL = """
WITH seq AS (
    SELECT lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS from_type,
           event_type AS to_type
    FROM events
),
counts AS (
    SELECT from_type, to_type, COUNT(*) AS n
    FROM seq WHERE from_type IS NOT NULL
    GROUP BY from_type, to_type
)
SELECT from_type, to_type,
       CAST(n AS BIGINT) AS n_transitions,
       ROUND(CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY from_type), 6) AS transition_prob
FROM counts
"""


@register(
    "event_type_transitions",
    _TRANSITIONS_SQL,
    doc="First-order Markov transition matrix over each user's event "
    "sequence (lag by event time, event_id tie-break) — the sequence "
    "feature a session-aware churn model consumes. The heavy work is "
    "one window pass partitioned by user_id; the normalization window "
    "runs on the |event_types|² aggregate, which is tiny at any scale.",
)
def q_event_type_transitions(spark, sf_dir):
    from pyspark.sql.window import Window

    ev = load_events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    norm = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n_transitions"),
        F.round(F.col("n").cast("double") / F.sum("n").over(norm), 6).alias(
            "transition_prob"
        ),
    )


# ---------------------------------------------------------------------------
# Feature correlation matrix from exact integer moments: one aggregation
# produces every sum; the 10 pairwise Pearson correlations unpivot from
# that single row — a training-set audit with zero extra scans.
# ---------------------------------------------------------------------------

_CORR_FEATURES = (
    "recency_days",
    "orders_30d",
    "orders_90d",
    "lifetime_orders",
    "customer_tenure_days",
)


def _corr_sql() -> str:
    from ecom_churn_lakehouse_spark.queries.churn_queries import _FEATURES_SQL

    sums = ["CAST(COUNT(*) AS DECIMAL(38,0)) AS n"]
    for f_ in _CORR_FEATURES:
        sums.append(f"CAST(SUM(CAST({f_} AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s_{f_}")
        sums.append(
            f"CAST(SUM(CAST({f_} AS DECIMAL(38,0)) * CAST({f_} AS DECIMAL(38,0))) "
            f"AS DECIMAL(38,0)) AS ss_{f_}"
        )
    pair_sums = []
    for i, a in enumerate(_CORR_FEATURES):
        for b in _CORR_FEATURES[i + 1:]:
            pair_sums.append(
                f"CAST(SUM(CAST({a} AS DECIMAL(38,0)) * CAST({b} AS DECIMAL(38,0))) "
                f"AS DECIMAL(38,0)) AS sp_{a}__{b}"
            )
    selects = []
    for i, a in enumerate(_CORR_FEATURES):
        for b in _CORR_FEATURES[i + 1:]:
            num = f"CAST(n * sp_{a}__{b} - s_{a} * s_{b} AS DOUBLE)"
            da = f"sqrt(CAST(n * ss_{a} - s_{a} * s_{a} AS DOUBLE))"
            db = f"sqrt(CAST(n * ss_{b} - s_{b} * s_{b} AS DOUBLE))"
            selects.append(
                f"SELECT '{a}' AS feature_a, '{b}' AS feature_b, "
                f"ROUND({num} / ({da} * {db}), 6) AS pearson_corr FROM m"
            )
    return (
        f"WITH feats AS ({_FEATURES_SQL}),\n"
        f"m AS (SELECT {', '.join(sums + pair_sums)} FROM feats)\n"
        + "\nUNION ALL\n".join(selects)
    )


@register(
    "churn_feature_correlation",
    _corr_sql(),
    doc="Pairwise Pearson correlation of the integer churn features — "
    "the multicollinearity audit run before training. All 21 moment "
    "sums come from ONE aggregation over the feature frame (exact "
    "DECIMAL, order-insensitive); the 10 correlations unpivot from "
    "that single row via explode, so the matrix costs one scan of the "
    "features regardless of scale.",
)
def q_churn_feature_correlation(spark, sf_dir):
    feats = customer_features(normalized_orders(spark, sf_dir), AS_OF)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    aggs = [F.count("*").cast("decimal(38,0)").alias("n")]
    for f_ in _CORR_FEATURES:
        aggs.append(F.sum(dec(f_)).cast("decimal(38,0)").alias(f"s_{f_}"))
        aggs.append(
            F.sum(dec(f_) * dec(f_)).cast("decimal(38,0)").alias(f"ss_{f_}")
        )
    for i, a in enumerate(_CORR_FEATURES):
        for b in _CORR_FEATURES[i + 1:]:
            aggs.append(
                F.sum(dec(a) * dec(b)).cast("decimal(38,0)").alias(f"sp_{a}__{b}")
            )
    m = feats.agg(*aggs)
    pair_structs = []
    for i, a in enumerate(_CORR_FEATURES):
        for b in _CORR_FEATURES[i + 1:]:
            num = (F.col("n") * F.col(f"sp_{a}__{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")).cast("double")
            da = F.sqrt((F.col("n") * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")).cast("double"))
            db = F.sqrt((F.col("n") * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")).cast("double"))
            pair_structs.append(
                F.struct(
                    F.lit(a).alias("feature_a"),
                    F.lit(b).alias("feature_b"),
                    F.round(num / (da * db), 6).alias("pearson_corr"),
                )
            )
    return (
        m.select(F.explode(F.array(*pair_structs)).alias("p"))
        .select("p.feature_a", "p.feature_b", "p.pearson_corr")
    )


# ---------------------------------------------------------------------------
# Smoothed target encoding: per-segment churn rate shrunk toward the
# global rate (Laplace α=20) — the leakage-safe categorical encoding.
# ---------------------------------------------------------------------------

_TARGET_ALPHA = 20.0

_TARGET_ENCODING_SQL = f"""
WITH labels AS ({_LABELS_SQL}),
joined AS (
    SELECT c_mktsegment AS segment, churn_label
    FROM labels JOIN customer ON customer_id = c_custkey
),
g AS (
    SELECT CAST(SUM(churn_label) AS DOUBLE) / COUNT(*) AS global_rate
    FROM joined
)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(churn_label) AS BIGINT) AS n_churned,
       ROUND((SUM(churn_label) + {_TARGET_ALPHA} * global_rate)
             / (COUNT(*) + {_TARGET_ALPHA}), 6) AS smoothed_churn_rate
FROM joined, g
GROUP BY segment, global_rate
"""


@register(
    "segment_churn_encoding",
    _TARGET_ENCODING_SQL,
    doc="Smoothed target encoding of market segment against the churn "
    "label: per-segment rate shrunk toward the global rate with "
    "Laplace α=20 — the standard leakage-controlled categorical "
    "feature. The global rate is a broadcast 1-row frame (uncorrelated "
    "scalar subquery); segment counts are one hash aggregation.",
)
def q_segment_churn_encoding(spark, sf_dir):
    labels = churn_labels(normalized_orders(spark, sf_dir), AS_OF)
    seg = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    # The labeled frame feeds the global rate AND the per-segment agg;
    # checkpoint it so the label plan (3 orders scans) runs once.
    joined = (
        labels.join(seg, on="customer_id")
        .select("segment", "churn_label")
        .localCheckpoint(eager=False)
    )
    g = joined.agg(
        (F.sum("churn_label").cast("double") / F.count("*")).alias("global_rate")
    )
    return (
        joined.crossJoin(F.broadcast(g))
        .groupBy("segment", "global_rate")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("churn_label").cast("long").alias("n_churned"),
            F.round(
                (F.sum("churn_label") + F.lit(_TARGET_ALPHA) * F.first("global_rate"))
                / (F.count("*") + F.lit(_TARGET_ALPHA)),
                6,
            ).alias("smoothed_churn_rate"),
        )
        .drop("global_rate")
    )


# ------------------- quantile transform (rank-normalized feature)

_QT_SQL = """
WITH spend AS (
    SELECT o_custkey AS customer_id,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS total_spend
    FROM orders GROUP BY o_custkey
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cust FROM spend)
SELECT customer_id, total_spend,
       CAST((RANK() OVER (ORDER BY total_spend, customer_id) - 1)
            * 1000000 // (SELECT n_cust - 1 FROM n) AS BIGINT)
           AS spend_rank_ppm
FROM spend
"""


@register(
    "spend_quantile_transform",
    _QT_SQL,
    doc="Quantile transform of a skewed feature (sklearn "
    "QuantileTransformer shape): each customer's total spend maps to "
    "its rank position in exact ppm — the monotone re-scaling that "
    "makes heavy-tailed money features usable by distance-based "
    "models. Deterministic total order (value, then key) and integer "
    "floor arithmetic on non-negative ranks: zero float surface "
    "beyond the decimal-exact spend itself. The global RANK window "
    "is the exactness baseline; at 100 TB the serving path is the "
    "broadcast-percentile-cutoff binning of "
    "customer_value_deciles_scalable (same trade documented there).",
)
def q_spend_quantile_transform(spark, sf_dir):
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("total_spend")
    )
    n = spend.agg(F.count("*").cast("long").alias("n_cust"))
    w = Window.orderBy("total_spend", "customer_id")
    return (
        spend.withColumn("__rk", F.rank().over(w))
        .join(F.broadcast(n))
        .select(
            "customer_id",
            "total_spend",
            # rank is INT — widen BEFORE the *1e6 or it overflows int32
            # as soon as the population passes ~2148 rows
            F.expr(
                "CAST(__rk - 1 AS BIGINT) * 1000000 DIV (n_cust - 1)"
            )
            .cast("long")
            .alias("spend_rank_ppm"),
        )
    )


# --------------------------------------------- winsorized spend stats

_WINSOR_SQL = """
WITH spend AS (
    SELECT o_custkey AS customer_id,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS cents
    FROM orders GROUP BY o_custkey
),
cuts AS (
    SELECT CAST(quantile_disc(cents, 0.05) AS BIGINT) AS p05,
           CAST(quantile_disc(cents, 0.95) AS BIGINT) AS p95
    FROM spend
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       c.p05 AS p05_cents,
       c.p95 AS p95_cents,
       CAST(SUM(s.cents) AS BIGINT) AS sum_cents_raw,
       CAST(SUM(LEAST(GREATEST(s.cents, c.p05), c.p95)) AS BIGINT)
           AS sum_cents_winsorized,
       CAST(SUM(CASE WHEN s.cents < c.p05 OR s.cents > c.p95
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped
FROM spend s CROSS JOIN cuts c
GROUP BY c.p05, c.p95
"""


@register(
    "winsorized_spend_stats",
    _WINSOR_SQL,
    doc="Winsorized robust spend statistics: per-customer lifetime "
    "spend clamped to its own [p5, p95] (percentile_disc cut points "
    "— actual data values, so no interpolation float surface), with "
    "raw vs winsorized totals and the clamped count, all exact "
    "integer cents. The outlier treatment a feature pipeline "
    "applies before z-scoring spend-like columns (order_value_"
    "mad_outliers is the detection twin; this is the mitigation). "
    "Cut points are a 1-row broadcast; the clamp pass is "
    "map-side combinable.",
)
def q_winsorized_spend_stats(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents")
    )
    cuts = spend.agg(
        F.expr(
            "percentile_disc(0.05) WITHIN GROUP (ORDER BY cents)"
        )
        .cast("long")
        .alias("p05"),
        F.expr(
            "percentile_disc(0.95) WITHIN GROUP (ORDER BY cents)"
        )
        .cast("long")
        .alias("p95"),
    )
    clamped = F.least(
        F.greatest(F.col("cents"), F.col("p05")), F.col("p95")
    )
    return (
        spend.join(F.broadcast(cuts))
        .groupBy("p05", "p95")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("sum_cents_raw"),
            F.sum(clamped).cast("long").alias("sum_cents_winsorized"),
            F.sum(
                (
                    (F.col("cents") < F.col("p05"))
                    | (F.col("cents") > F.col("p95"))
                ).cast("long")
            )
            .cast("long")
            .alias("n_clamped"),
        )
        .select(
            "n_customers",
            F.col("p05").alias("p05_cents"),
            F.col("p95").alias("p95_cents"),
            "sum_cents_raw",
            "sum_cents_winsorized",
            "n_clamped",
        )
    )


# ---------------------------------------------- RFM quintile segments

_RFM_SQL = f"""
WITH base AS (
    SELECT o_custkey AS customer_id,
           CAST(DATE '{AS_OF}' - MAX(CAST(o_orderdate AS DATE)) AS BIGINT)
               AS recency_days,
           CAST(COUNT(*) AS BIGINT) AS frequency,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS monetary_cents
    FROM orders
    WHERE CAST(o_orderdate AS DATE) <= DATE '{AS_OF}'
    GROUP BY o_custkey
),
scored AS (
    SELECT customer_id, recency_days, frequency, monetary_cents,
           CAST(NTILE(5) OVER (ORDER BY recency_days, customer_id)
                AS INTEGER) AS r,
           CAST(NTILE(5) OVER (ORDER BY frequency DESC, customer_id)
                AS INTEGER) AS f,
           CAST(NTILE(5) OVER (ORDER BY monetary_cents DESC, customer_id)
                AS INTEGER) AS m
    FROM base
)
SELECT CAST(r * 100 + f * 10 + m AS INTEGER) AS rfm_segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(monetary_cents) AS BIGINT) AS segment_cents,
       CAST(MIN(recency_days) AS BIGINT) AS min_recency_days,
       CAST(MAX(frequency) AS BIGINT) AS max_frequency
FROM scored GROUP BY r * 100 + f * 10 + m
"""


@register(
    "rfm_segmentation",
    _RFM_SQL,
    doc="RFM quintile segmentation at the churn snapshot date: "
    "recency/frequency/monetary each NTILE(5)-scored (quintile 1 = "
    "best, deterministic customer_id tie-break so the binning is "
    "hash-stable) and packed into the classic 111..555 segment "
    "code, rolled up to segment-level counts and monetary mass — "
    "the lifecycle-marketing cousin of the churn features "
    "(customer_features shares the same point-in-time cutoff, so "
    "segments and churn labels are joinable artifacts of one "
    "snapshot). One shuffle for the per-customer aggregate; the "
    "three rankings share one global sort input.",
)
def q_rfm_segmentation(spark, sf_dir):
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") <= AS_OF
    )
    base = orders.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.datediff(F.lit(AS_OF).cast("date"), F.max(F.to_date("o_orderdate")))
        .cast("long")
        .alias("recency_days"),
        F.count("*").cast("long").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("monetary_cents"),
    )
    scored = base.select(
        "customer_id",
        "recency_days",
        "frequency",
        "monetary_cents",
        F.ntile(5)
        .over(Window.orderBy("recency_days", "customer_id"))
        .cast("int")
        .alias("r"),
        F.ntile(5)
        .over(Window.orderBy(F.desc("frequency"), "customer_id"))
        .cast("int")
        .alias("f"),
        F.ntile(5)
        .over(Window.orderBy(F.desc("monetary_cents"), "customer_id"))
        .cast("int")
        .alias("m"),
    )
    return scored.groupBy(
        (F.col("r") * 100 + F.col("f") * 10 + F.col("m"))
        .cast("int")
        .alias("rfm_segment")
    ).agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("monetary_cents").cast("long").alias("segment_cents"),
        F.min("recency_days").cast("long").alias("min_recency_days"),
        F.max("frequency").cast("long").alias("max_frequency"),
    )


# ------------------------------------------- top-N categorical encoding

_TOPN_CATEGORIES = 7

_TOPN_ENC_SQL = f"""
WITH counts AS (
    SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n
    FROM part GROUP BY p_brand
),
ranked AS (
    SELECT p_brand, n,
           ROW_NUMBER() OVER (ORDER BY n DESC, p_brand) AS rk,
           CAST(SUM(n) OVER () AS BIGINT) AS total
    FROM counts
),
mapped AS (
    SELECT CASE WHEN rk <= {_TOPN_CATEGORIES} THEN p_brand
                ELSE 'OTHER' END AS encoded_brand,
           n, total
    FROM ranked
)
SELECT encoded_brand,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_source_categories,
       CAST(SUM(n) * 1000000 // MAX(total) AS BIGINT) AS coverage_ppm
FROM mapped
GROUP BY encoded_brand
"""


@register(
    "categorical_topn_encoding",
    _TOPN_ENC_SQL,
    doc=f"Vocabulary-capped categorical encoding: keep the top-"
    f"{_TOPN_CATEGORIES} brands by frequency (deterministic "
    "count-then-name tie-break) and collapse the tail to OTHER, "
    "reporting per encoded level the row mass, the number of source "
    "categories folded in, and exact-ppm coverage — the cardinality "
    "control every feature pipeline applies before one-hot/embedding "
    "so a high-cardinality column cannot explode the feature space. "
    "The ranking runs on the |categories|-sized count frame, never "
    "the fact.",
)
def q_categorical_topn_encoding(spark, sf_dir):
    from pyspark.sql.window import Window as W

    part = load_table(spark, sf_dir, "part")
    counts = part.groupBy("p_brand").agg(F.count("*").cast("long").alias("n"))
    ranked = counts.select(
        "p_brand",
        "n",
        F.row_number().over(W.orderBy(F.col("n").desc(), "p_brand")).alias("rk"),
        F.sum("n").over(W.partitionBy()).cast("long").alias("total"),
    )
    mapped = ranked.select(
        F.when(F.col("rk") <= _TOPN_CATEGORIES, F.col("p_brand"))
        .otherwise("OTHER")
        .alias("encoded_brand"),
        "n",
        "total",
    )
    return mapped.groupBy("encoded_brand").agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_source_categories"),
        F.expr("CAST(SUM(n) * 1000000 DIV MAX(total) AS BIGINT)").alias("coverage_ppm"),
    )


# ------------------------------------------- near-zero-variance screen

#: caret-style thresholds: flag when top/second frequency ratio
#: exceeds 19 AND distinct share is under 10%.
_NZV_FEATURES_SQL = {
    "segment": "c_mktsegment",
    "nation": "CAST(c_nationkey AS STRING)",
    "balance_sign": (
        "CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal = 0 THEN 'zero'"
        " ELSE 'pos' END"
    ),
    "is_high_balance": "CASE WHEN c_acctbal > 9900 THEN 'y' ELSE 'n' END",
}


def _nzv_sql() -> str:
    parts = []
    for fname, expr in _NZV_FEATURES_SQL.items():
        parts.append(f"""
SELECT '{fname}' AS feature, n, n_distinct, top_freq, second_freq FROM (
    SELECT CAST(SUM(c) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(MAX(c) AS BIGINT) AS top_freq,
           CAST(COALESCE(MAX(CASE WHEN rnk = 2 THEN c END), 0) AS BIGINT)
               AS second_freq
    FROM (
        SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, v) AS rnk
        FROM (SELECT {expr} AS v, CAST(COUNT(*) AS BIGINT) AS c
              FROM customer GROUP BY 1)
    )
)""")
    union = "\nUNION ALL\n".join(parts)
    return f"""
WITH per_feature AS ({union})
SELECT feature, n, n_distinct, top_freq, second_freq,
       CAST(CASE WHEN second_freq = 0 THEN 1000000
                 ELSE top_freq * 1000 // second_freq END AS BIGINT)
           AS freq_ratio_milli,
       CAST(n_distinct * 1000000 // n AS BIGINT) AS distinct_ppm,
       (CASE WHEN second_freq = 0 THEN 1000000
             ELSE top_freq * 1000 // second_freq END) > 19000
           AND n_distinct * 1000000 // n < 100000 AS near_zero_variance
FROM per_feature ORDER BY feature
"""


@register(
    "near_zero_variance_screen",
    _nzv_sql(),
    doc="Near-zero-variance feature screen (the caret preprocessing "
    "rule): per candidate feature, the top/second value-frequency "
    "ratio and the distinct share, flagging features that are "
    "almost constant (ratio > 19 AND distinct share < 10%) — these "
    "destabilize cross-validation folds and waste encoder width, "
    "and every feature pipeline screens them before "
    "target_encoding/hashed_feature_cross run. One grouped count "
    "per feature (map-combinable), a 2-row rank on the VALUE "
    "frame, exact integer ratios. The planted 'is_high_balance' "
    "indicator demonstrates a flagged feature. Scale: per feature "
    "one scan-grain agg to the value domain; the screen is "
    "embarrassingly parallel across features.",
)
def q_near_zero_variance_screen(spark, sf_dir):
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    out = None
    for fname, expr in _NZV_FEATURES_SQL.items():
        vals = cust.select(F.expr(expr).alias("v")).groupBy("v").agg(
            F.count("*").cast("long").alias("c")
        )
        ranked = vals.withColumn(
            "rnk", F.row_number().over(Window.orderBy(F.col("c").desc(), "v"))
        )
        agg = ranked.agg(
            F.sum("c").cast("long").alias("n"),
            F.count("*").cast("long").alias("n_distinct"),
            F.max("c").cast("long").alias("top_freq"),
            F.coalesce(
                F.max(F.when(F.col("rnk") == 2, F.col("c"))), F.lit(0)
            )
            .cast("long")
            .alias("second_freq"),
        ).select(
            F.lit(fname).alias("feature"),
            "n",
            "n_distinct",
            "top_freq",
            "second_freq",
        )
        out = agg if out is None else out.unionByName(agg)
    return out.select(
        "feature",
        "n",
        "n_distinct",
        "top_freq",
        "second_freq",
        F.expr(
            "CAST(CASE WHEN second_freq = 0 THEN 1000000"
            " ELSE top_freq * 1000 DIV second_freq END AS BIGINT)"
        ).alias("freq_ratio_milli"),
        F.expr("CAST(n_distinct * 1000000 DIV n AS BIGINT)").alias(
            "distinct_ppm"
        ),
        F.expr(
            "(CASE WHEN second_freq = 0 THEN 1000000"
            " ELSE top_freq * 1000 DIV second_freq END) > 19000"
            " AND n_distinct * 1000000 DIV n < 100000"
        ).alias("near_zero_variance"),
    ).orderBy("feature")


# ------------------------------------------- Cramér's V association

#: V = sqrt(chi2 / (N * (min(r,c) - 1))); chi2 accumulated from
#: per-cell Pearson terms floor-quantized micro (exact int inputs),
#: so only the final sqrt is float.
_CRAMER_CELL_MICRO = (
    "CAST(FLOOR("
    "(CAST(obs AS DOUBLE)"
    " - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE))"
    " * (CAST(obs AS DOUBLE)"
    "    - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE))"
    " / (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE))"
    " * 1000000.0) AS BIGINT)"
)
_CRAMER_V_MILLI = (
    "CAST(FLOOR(sqrt(CAST(chi2_micro AS DOUBLE) / 1000000.0"
    " / (CAST(n AS DOUBLE) * (CAST(LEAST(n_rows, n_cols) AS DOUBLE) - 1.0)))"
    " * 1000.0) AS BIGINT)"
)


def _cramer_pair_sql(pair: str, a_expr: str, b_expr: str, src: str) -> str:
    return f"""
SELECT '{pair}' AS pair, a, b, CAST(COUNT(*) AS BIGINT) AS obs
FROM (SELECT {a_expr} AS a, {b_expr} AS b FROM {src})
GROUP BY a, b"""


_CRAMER_SQL = f"""
WITH cells AS (
    {_cramer_pair_sql("segment_x_region",
                      "c.c_mktsegment", "CAST(n.n_regionkey AS STRING)",
                      "customer c JOIN nation n ON n.n_nationkey = c.c_nationkey")}
    UNION ALL
    {_cramer_pair_sql("segment_x_priority",
                      "c.c_mktsegment", "o.o_orderpriority",
                      "orders o JOIN customer c ON c.c_custkey = o.o_custkey")}
    UNION ALL
    {_cramer_pair_sql("priority_x_status",
                      "o.o_orderpriority", "o.o_orderstatus", "orders o")}
),
row_m AS (
    SELECT pair, a, CAST(SUM(obs) AS BIGINT) AS row_n
    FROM cells GROUP BY pair, a
),
col_m AS (
    SELECT pair, b, CAST(SUM(obs) AS BIGINT) AS col_n
    FROM cells GROUP BY pair, b
),
tot AS (
    SELECT pair, CAST(SUM(obs) AS BIGINT) AS n FROM cells GROUP BY pair
),
dense AS (
    SELECT r.pair, r.a, c.b, r.row_n, c.col_n, t.n,
           CAST(COALESCE(o.obs, 0) AS BIGINT) AS obs
    FROM row_m r
    JOIN col_m c ON c.pair = r.pair
    JOIN tot t ON t.pair = r.pair
    LEFT JOIN cells o ON o.pair = r.pair AND o.a = r.a AND o.b = c.b
),
terms AS (
    SELECT pair, n, {_CRAMER_CELL_MICRO} AS cell_micro FROM dense
),
dims AS (
    SELECT pair,
           CAST(COUNT(DISTINCT a) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT b) AS BIGINT) AS n_cols
    FROM cells GROUP BY pair
),
agg AS (
    SELECT t.pair, CAST(MAX(t.n) AS BIGINT) AS n,
           CAST(SUM(t.cell_micro) AS BIGINT) AS chi2_micro
    FROM terms t GROUP BY t.pair
)
SELECT a.pair, a.n, d.n_rows, d.n_cols, a.chi2_micro,
       {_CRAMER_V_MILLI} AS cramers_v_milli
FROM agg a JOIN dims d ON d.pair = a.pair
ORDER BY a.pair
"""


@register(
    "cramers_v_matrix",
    _CRAMER_SQL,
    doc="Cramér's V association strength for three categorical column "
    "pairs (segment x region, segment x priority, priority x "
    "status) — the normalized-to-[0,1] effect size that "
    "promo_chisq_independence's raw chi-square is not, and the "
    "standard first screen for redundant categorical features "
    "before encoding. The contingency table is DENSIFIED with a "
    "rows-cross-cols spine per pair (COALESCE(obs,0)) so empty "
    "cells still contribute their Pearson term E_ij — omitting "
    "them understates chi2 identically in both engines, which is "
    "exactly the class of shared-wrong the oracle cannot catch "
    "(r7 advice fix); each term floor-quantizes to micro from "
    "exact ints before the integer chi-square sum; V is one shared "
    "sqrt. Scale: each pair reduces to its bounded contingency "
    "cells map-combinably — the spine is |levels_a|x|levels_b|, "
    "categorical-cardinality bounded, never data bounded.",
)
def q_cramers_v_matrix(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    orders = load_table(spark, sf_dir, "orders")
    p1 = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            F.col("c_mktsegment").alias("a"),
            F.col("n_regionkey").cast("long").cast("string").alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("obs"))
        .select(F.lit("segment_x_region").alias("pair"), "a", "b", "obs")
    )
    p2 = (
        orders.join(F.broadcast(cust.select("c_custkey", "c_mktsegment")),
                    orders.o_custkey == F.col("c_custkey"))
        .select(F.col("c_mktsegment").alias("a"), F.col("o_orderpriority").alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("obs"))
        .select(F.lit("segment_x_priority").alias("pair"), "a", "b", "obs")
    )
    p3 = (
        orders.select(
            F.col("o_orderpriority").alias("a"), F.col("o_orderstatus").alias("b")
        )
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("obs"))
        .select(F.lit("priority_x_status").alias("pair"), "a", "b", "obs")
    )
    cells = p1.unionByName(p2).unionByName(p3).localCheckpoint(eager=False)
    row_m = cells.groupBy("pair", "a").agg(
        F.sum("obs").cast("long").alias("row_n")
    )
    col_m = cells.groupBy("pair", "b").agg(
        F.sum("obs").cast("long").alias("col_n")
    )
    tot = cells.groupBy("pair").agg(F.sum("obs").cast("long").alias("n"))
    dense = (
        row_m.join(F.broadcast(col_m), "pair")
        .join(F.broadcast(tot), "pair")
        .join(F.broadcast(cells), ["pair", "a", "b"], "left")
        .select(
            "pair",
            "a",
            "b",
            "row_n",
            "col_n",
            "n",
            F.coalesce(F.col("obs"), F.lit(0)).cast("long").alias("obs"),
        )
    )
    terms = dense.select(
        "pair", "n", F.expr(_CRAMER_CELL_MICRO).alias("cell_micro")
    )
    dims = cells.groupBy("pair").agg(
        F.countDistinct("a").cast("long").alias("n_rows"),
        F.countDistinct("b").cast("long").alias("n_cols"),
    )
    agg = terms.groupBy("pair").agg(
        F.max("n").cast("long").alias("n"),
        F.sum("cell_micro").cast("long").alias("chi2_micro"),
    )
    return (
        agg.join(dims, "pair")
        .select(
            "pair",
            "n",
            "n_rows",
            "n_cols",
            "chi2_micro",
            F.expr(_CRAMER_V_MILLI).alias("cramers_v_milli"),
        )
        .orderBy("pair")
    )
