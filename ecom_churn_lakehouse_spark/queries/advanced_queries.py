"""Advanced analytics shapes round 3 (SURVEY.md §2 extension surface).

Classic warehouse / ML-pipeline query shapes beyond the reference's own
workload, each DuckDB-oracle verified:

- cohort retention matrix           → cohort_retention
- market-basket pair mining         → copurchase_part_pairs
- per-group z-score anomalies       → user_activity_zscore
- TF-IDF characteristic terms       → tfidf_top_terms
- weighted Bernoulli sampling       → weighted_order_sample
- first-touch session attribution   → session_first_touch
- year-over-year growth             → nation_yoy_growth
- feature-hashing cross             → hashed_feature_cross

Cross-engine float policy (measured, see tests): IEEE-exact ops —
`+ - * /`, `sqrt`, comparisons — are bit-identical between Spark and
DuckDB and safe to hash-compare; `ln`/`log` differ by 1 ulp on ~8% of
inputs and are NOT used in oracle-hashed columns. Money sums go
through DECIMAL(18,2) first (associativity-proof), then one cast to
double.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ecom_churn_lakehouse_spark.registry import register
from ecom_churn_lakehouse_spark.sources import load_events, load_table


def _dsum(col, scale=2):
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


#: Portable bucket: first 15 hex digits of md5(salt || key) mod `mod` —
#: the same idiom operators/sampling.py and the dedup sketches use.
def _hash_mod_sql(key: str, salt: str, mod: int) -> str:
    from ecom_churn_lakehouse_spark.operators.sampling import hash_bucket_sql

    return hash_bucket_sql(key, salt, mod)


def _hash_mod_col(key, salt: str, mod: int):
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
        % mod
    )


# ------------------------------------------------------ cohort retention

_COHORT_SQL = """
WITH om AS (
    SELECT o_custkey AS c, CAST(date_trunc('month', o_orderdate) AS DATE) AS m
    FROM orders
),
coh AS (SELECT c, MIN(m) AS cohort_month FROM om GROUP BY c)
SELECT coh.cohort_month,
       CAST(datediff('month', coh.cohort_month, om.m) AS INTEGER) AS months_since,
       COUNT(DISTINCT om.c) AS n_active
FROM om JOIN coh ON om.c = coh.c
GROUP BY 1, 2
"""


@register(
    "cohort_retention",
    _COHORT_SQL,
    doc="Cohort retention matrix: customers grouped by first-order "
    "month, distinct-active counts per months-since offset. The "
    "classic growth-analytics shape (absent in the reference — "
    "extension per SURVEY §7.7). Scale: the cohort self-join is "
    "key-co-partitioned on customer (one shuffle shared by the min() "
    "and the join under AQE); the distinct count is two-phase "
    "partial/final. months_between over month-truncated dates is "
    "integral, so the cast is exact.",
)
def q_cohort_retention(spark, sf_dir):
    om = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c"),
        F.trunc(F.to_date("o_orderdate"), "month").alias("m"),
    )
    coh = om.groupBy("c").agg(F.min("m").alias("cohort_month"))
    return (
        om.join(coh, "c")
        .groupBy(
            "cohort_month",
            F.months_between(F.col("m"), F.col("cohort_month"))
            .cast("int")
            .alias("months_since"),
        )
        .agg(F.count_distinct(F.col("c")).alias("n_active"))
    )


# ------------------------------------------------- market-basket pairs

_COPURCHASE_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       COUNT(*) AS n_orders
FROM op a JOIN op b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING COUNT(*) >= 2
"""


@register(
    "copurchase_part_pairs",
    _COPURCHASE_SQL,
    doc="Market-basket pair mining: parts co-occurring in >= 2 orders "
    "(extension; the A-priori candidate step). Scale: ONE shuffle "
    "groups each order's parts into a sorted set; a<b pairs fan out "
    "ROW-LOCALLY via posexplode + slice (bounded by lines-per-order "
    "squared — real pipelines cap basket size first), so there is no "
    "sort-merge self-join of the fact table; the pair aggregate is "
    "the only second shuffle. The oracle keeps the equivalent "
    "self-join formulation.",
)
def q_copurchase_part_pairs(spark, sf_dir):
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
    )
    pairs = baskets.select(
        F.posexplode("parts").alias("i", "part_a"), "parts"
    ).select(
        "part_a",
        F.explode(F.expr("slice(parts, i + 2, size(parts))")).alias("part_b"),
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


# ---------------------------------------------- per-group z-score anomaly

_ZSCORE_SQL = """
WITH cnt AS (
    SELECT user_id, event_type, COUNT(*) AS n_events
    FROM events GROUP BY 1, 2
),
stats AS (
    SELECT event_type,
           CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(n_events) AS DOUBLE) AS s,
           CAST(SUM(n_events * n_events) AS DOUBLE) AS q
    FROM cnt GROUP BY 1
)
SELECT c.user_id, c.event_type, c.n_events,
       ROUND((CAST(c.n_events AS DOUBLE) - s.s / s.n)
             / sqrt((s.q - s.s * s.s / s.n) / s.n), 6) AS zscore
FROM cnt c JOIN stats s ON c.event_type = s.event_type
WHERE abs((CAST(c.n_events AS DOUBLE) - s.s / s.n)
          / sqrt((s.q - s.s * s.s / s.n) / s.n)) >= 2.0
"""


@register(
    "user_activity_zscore",
    _ZSCORE_SQL,
    doc="Per-group z-score anomaly detection: users whose per-type "
    "event count is >= 2 population std-devs from the type mean "
    "(extension — the outlier-user shape every abuse pipeline runs). "
    "Scale: one count shuffle; the per-type moment stats are a "
    "5-row broadcast, so scoring is scan-local. Float policy: mean/"
    "var from integer moments with the SAME expression shape on both "
    "engines — +,-,*,/ and sqrt are IEEE-identical (ln is not, and "
    "is not used).",
)
def q_user_activity_zscore(spark, sf_dir):
    cnt = load_events(spark, sf_dir).groupBy("user_id", "event_type").agg(
        F.count("*").alias("n_events")
    )
    stats = cnt.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("n_events").cast("double").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("double").alias("q"),
    )
    mean = F.col("s") / F.col("n")
    std = F.sqrt((F.col("q") - F.col("s") * F.col("s") / F.col("n")) / F.col("n"))
    z = (F.col("n_events").cast("double") - mean) / std
    return (
        cnt.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) >= 2.0)
        .select(
            "user_id",
            "event_type",
            "n_events",
            F.round(z, 6).alias("zscore"),
        )
    )


# ------------------------------------------------- TF-IDF characteristic terms

_TFIDF_SQL = r"""
WITH toks AS (
    SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
    FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
           ROUND(CAST(tf.tf AS DOUBLE) * (SELECT n_docs FROM nd) / dfq.df, 6)
               AS score
    FROM tf JOIN dfq ON tf.term = dfq.term
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, term
    ) AS rn
    FROM scored
)
SELECT doc_id, term, tf, df, score FROM ranked WHERE rn <= 3
"""


@register(
    "tfidf_top_terms",
    _TFIDF_SQL,
    doc="Top-3 characteristic terms per document by TF x inverse "
    "document frequency (linear N/df weight — rank-equivalent to "
    "log-idf for fixed tf and IEEE-exact cross-engine, which ln is "
    "not; see module float policy). Extends token_doc_freq with the "
    "per-doc ranked form. Scale: tf and df are two-phase hash aggs; "
    "df joins back on the term key (co-partitioned with tf's "
    "output); N is a 1-row broadcast; the top-3 window partitions by "
    "doc_id — parallel across the whole corpus.",
)
def q_tfidf_top_terms(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfq = tf.groupBy("term").agg(F.count("*").alias("df"))
    nd = docs.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(dfq, "term")
        .join(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf").cast("double") * F.col("n_docs") / F.col("df"), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


# ---------------------------------------------- weighted Bernoulli sample

_WSAMPLE_SQL = f"""
WITH mx AS (SELECT MAX(o_totalprice) AS mx FROM orders)
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE ({_hash_mod_sql("o_orderkey", "wsample:", 10_000)}) * (SELECT mx FROM mx)
      < o_totalprice * 10000
"""


@register(
    "weighted_order_sample",
    _WSAMPLE_SQL,
    doc="Weighted Bernoulli sampling: each order kept with probability "
    "proportional to its weight (o_totalprice / max), decided by the "
    "portable md5 hash-bucket — deterministic, partitioning-"
    "independent, replayable (extension; pairs with the uniform "
    "hash splits in operators/sampling.py). Scale: the max is a "
    "1-row broadcast; selection is then a scan-local predicate — no "
    "shuffle, no RNG state. The rational-compare form (bucket*max < "
    "w*MOD) avoids float thresholds entirely.",
)
def q_weighted_order_sample(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(F.max("o_totalprice").alias("mx"))
    bucket = _hash_mod_col(F.col("o_orderkey"), "wsample:", 10_000)
    return (
        orders.join(F.broadcast(mx))
        .filter(bucket * F.col("mx") < F.col("o_totalprice") * 10_000)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# ------------------------------------------ first-touch session attribution

_FIRST_TOUCH_SQL = """
WITH flagged AS (
    SELECT user_id, ts, event_id, event_type, value,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30*60*1000000
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT user_id, ts, event_id, event_type, value,
           CAST(SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS INTEGER) AS session_id
    FROM flagged
),
per_sess AS (
    SELECT user_id, session_id,
           MIN({'ts': ts, 'event_id': event_id, 'event_type': event_type})
               AS fs,
           MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted,
           COALESCE(SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(value AS DECIMAL(18,2)) END),
                    CAST(0 AS DECIMAL(18,2))) AS pv
    FROM sessions GROUP BY 1, 2
)
SELECT fs.event_type AS first_event_type,
       COUNT(*) AS n_sessions,
       CAST(SUM(converted) AS BIGINT) AS n_converted,
       ROUND(CAST(SUM(converted) AS DOUBLE) / COUNT(*), 6) AS conversion_rate,
       CAST(SUM(pv) AS DOUBLE) AS purchase_value
FROM per_sess GROUP BY 1
"""


@register(
    "session_first_touch",
    _FIRST_TOUCH_SQL,
    doc="First-touch attribution: sessionize (30-min gap), credit each "
    "session's purchases to its FIRST event type, report conversion "
    "rate and attributed revenue per entry channel (extension; "
    "composes operators/sessionize.py with the struct-min argmin "
    "idiom). Scale: both window passes and the session rollup share "
    "one user-key exchange; the final aggregate is 5 groups. The "
    "first event is MIN(struct(ts,event_id,event_type)) — "
    "deterministic under the same tie-break as the sessionizer.",
)
def q_session_first_touch(spark, sf_dir):
    from ecom_churn_lakehouse_spark.operators.sessionize import sessionize

    ev = sessionize(load_events(spark, sf_dir), gap_minutes=30)
    is_purchase = F.col("event_type") == "purchase"
    per_sess = ev.groupBy("user_id", "session_id").agg(
        F.min(F.struct("ts", "event_id", "event_type")).alias("fs"),
        F.max(F.when(is_purchase, 1).otherwise(0)).alias("converted"),
        F.coalesce(
            F.sum(F.when(is_purchase, F.col("value").cast("decimal(18,2)"))),
            F.lit(0).cast("decimal(18,2)"),
        ).alias("pv"),
    )
    return per_sess.groupBy(
        F.col("fs.event_type").alias("first_event_type")
    ).agg(
        F.count("*").alias("n_sessions"),
        F.sum("converted").alias("n_converted"),
        F.round(
            F.sum("converted").cast("double") / F.count("*"), 6
        ).alias("conversion_rate"),
        F.sum("pv").cast("double").alias("purchase_value"),
    )


# ------------------------------------------------- year-over-year growth

_YOY_SQL = """
WITH rev AS (
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS year,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
)
SELECT nation, year, revenue,
       ROUND((revenue - lag(revenue) OVER w) / lag(revenue) OVER w, 6)
           AS yoy_growth
FROM rev
WINDOW w AS (PARTITION BY nation ORDER BY year)
"""


@register(
    "nation_yoy_growth",
    _YOY_SQL,
    doc="Year-over-year revenue growth per nation: yearly decimal-exact "
    "rollup, then lag() growth rates (extension; the standard "
    "trend-report shape). Scale: the dimension joins broadcast "
    "(nation 25 rows, customer dim prunable to 2 cols); the yearly "
    "aggregate reduces to nations x years rows, so the growth window "
    "runs on a tiny frame. First year per nation yields NULL growth "
    "on both engines.",
)
def q_nation_yoy_growth(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("year"),
        )
        .agg(_dsum(F.col("o_totalprice")).alias("revenue"))
    )
    w = Window.partitionBy("nation").orderBy("year")
    prev = F.lag("revenue").over(w)
    return rev.select(
        "nation",
        "year",
        "revenue",
        F.round((F.col("revenue") - prev) / prev, 6).alias("yoy_growth"),
    )


# ------------------------------------------------- feature-hashing cross

_FEATURE_CROSS_SQL = f"""
SELECT {_hash_mod_sql("(c.c_mktsegment || '|' || o.o_orderpriority)", "fx:", 256)}
           AS feature_bucket,
       COUNT(*) AS n_orders,
       CAST(COUNT(DISTINCT c.c_mktsegment || '|' || o.o_orderpriority) AS BIGINT)
           AS n_crosses,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
"""


@register(
    "hashed_feature_cross",
    _FEATURE_CROSS_SQL,
    doc="Feature hashing (the hashing trick): segment x priority "
    "crosses bucketed into a fixed 256-dim space by the portable md5 "
    "hash, with collision accounting (n_crosses > 1 = collision) — "
    "the categorical-encoding step of a large-scale trainer "
    "(extension; pairs with training/train.py). Scale: the cross and "
    "bucket are scan-local projections; one hash-agg shuffle on a "
    "fixed 256-key space — cardinality is bounded regardless of "
    "input size, so this never skews.",
)
def q_hashed_feature_cross(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    cross = F.concat(
        F.col("c_mktsegment"), F.lit("|"), F.col("o_orderpriority")
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            _hash_mod_col(cross, "fx:", 256).alias("feature_bucket"),
            cross.alias("cross"),
            "o_totalprice",
        )
        .groupBy("feature_bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.count_distinct(F.col("cross")).alias("n_crosses"),
            _dsum(F.col("o_totalprice")).alias("revenue"),
        )
    )


# ------------------------------------------------- association rules

_ASSOC_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
nb AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n_baskets FROM op),
item AS (SELECT l_partkey, COUNT(*) AS n_item FROM op GROUP BY 1),
pair AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_pair
    FROM op a JOIN op b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
),
directed AS (
    SELECT part_a AS antecedent, part_b AS consequent, n_pair FROM pair
    UNION ALL
    SELECT part_b, part_a, n_pair FROM pair
)
SELECT d.antecedent,
       d.consequent,
       CAST(d.n_pair AS BIGINT) AS n_pair,
       ROUND(CAST(d.n_pair AS DOUBLE) / ia.n_item, 6) AS confidence,
       ROUND(CAST(d.n_pair AS DOUBLE) * (SELECT n_baskets FROM nb)
             / (ia.n_item * ic.n_item), 6) AS lift
FROM directed d
JOIN item ia ON ia.l_partkey = d.antecedent
JOIN item ic ON ic.l_partkey = d.consequent
ORDER BY lift DESC, antecedent, consequent
LIMIT 50
"""


@register(
    "basket_association_rules",
    _ASSOC_SQL,
    doc="Association rules over the co-purchase baskets: for each "
    "directed pair a->b with pair support >= 2, confidence = "
    "P(b|a) and lift = P(ab)/(P(a)P(b)); top 50 by lift. Completes "
    "the A-priori chain started by copurchase_part_pairs (candidate "
    "pairs -> scored rules). Scale: pair supports come from the "
    "row-local basket fan-out (one shuffle), item supports from one "
    "map-side-combinable agg; the rule join keys on part ids (dim-"
    "sized frames, broadcastable); the basket total is a 1-row "
    "broadcast. Ratios are integer-over-integer under ROUND(...,6), "
    "so the top-50 cut is deterministic with the (lift, a, b) "
    "tie-break.",
)
def q_basket_association_rules(spark, sf_dir):
    op = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    nb = op.agg(
        F.count_distinct("l_orderkey").cast("double").alias("n_baskets")
    )
    item = op.groupBy("l_partkey").agg(F.count("*").alias("n_item"))
    baskets = op.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    pairs = (
        baskets.select(F.posexplode("parts").alias("i", "part_a"), "parts")
        .select(
            "part_a",
            F.explode(F.expr("slice(parts, i + 2, size(parts))")).alias(
                "part_b"
            ),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= 2)
    )
    directed = pairs.select(
        F.col("part_a").alias("antecedent"),
        F.col("part_b").alias("consequent"),
        "n_pair",
    ).unionAll(
        pairs.select(
            F.col("part_b").alias("antecedent"),
            F.col("part_a").alias("consequent"),
            "n_pair",
        )
    )
    ia = item.select(
        F.col("l_partkey").alias("antecedent"), F.col("n_item").alias("n_a")
    )
    ic = item.select(
        F.col("l_partkey").alias("consequent"), F.col("n_item").alias("n_c")
    )
    return (
        directed.join(F.broadcast(ia), "antecedent")
        .join(F.broadcast(ic), "consequent")
        .join(F.broadcast(nb))
        .select(
            "antecedent",
            "consequent",
            F.col("n_pair").cast("long").alias("n_pair"),
            F.round(F.col("n_pair").cast("double") / F.col("n_a"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("n_pair").cast("double")
                * F.col("n_baskets")
                / (F.col("n_a") * F.col("n_c")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "antecedent", "consequent")
        .limit(50)
    )
