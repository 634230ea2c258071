"""Extended analytics surface: rollup, pivot-style, exact percentiles,
sketches, and the streaming twin — engine capabilities beyond the
reference's inventory (SURVEY §2.4 notes them absent; a reusable
engine wants them first-class).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecom_churn_lakehouse_spark.registry import register
from ecom_churn_lakehouse_spark.sources import load_table

# ------------------------------------------------------------- rollup

_ROLLUP_SQL = """
SELECT o_orderpriority AS order_priority,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM orders
GROUP BY ROLLUP(o_orderpriority, year(o_orderdate))
"""


@register(
    "orders_rollup",
    _ROLLUP_SQL,
    doc="ROLLUP hierarchy totals (priority → year → grand total) — "
    "grouping-sets surface absent in the reference (SURVEY §2.4).",
)
def q_orders_rollup(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("order_priority"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        "o_totalprice",
    )
    return orders.rollup("order_priority", "order_year").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias(
            "total_value"
        ),
    )


# ------------------------------------------- pivot (conditional form)

_PIVOT_SQL = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_fulfilled,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
FROM orders
GROUP BY 1
"""


@register(
    "status_pivot_by_year",
    _PIVOT_SQL,
    doc="Pivot (long→wide) via groupBy().pivot() — reference has none; "
    "oracle expresses the same with conditional sums.",
)
def q_status_pivot_by_year(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        orders.groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    return wide.select(
        "order_year",
        F.coalesce(F.col("O"), F.lit(0)).cast("long").alias("n_open"),
        F.coalesce(F.col("F"), F.lit(0)).cast("long").alias("n_fulfilled"),
        F.coalesce(F.col("P"), F.lit(0)).cast("long").alias("n_pending"),
    )


# ------------------------------------------------- exact percentiles

_PCT_SQL = """
SELECT o_orderpriority AS order_priority,
       ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50_value,
       ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90_value
FROM orders
GROUP BY o_orderpriority
"""


@register(
    "order_value_percentiles",
    _PCT_SQL,
    doc="Exact interpolated percentiles per group (F.percentile ≡ "
    "quantile_cont). The approximate sketch path is "
    "approx_distinct_profile (tolerance-gated oracle).",
)
def q_order_value_percentiles(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_orderpriority").alias("order_priority")).agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("p50_value"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 6).alias("p90_value"),
    )


# --------------------------------------- sketches (rows-only check)


_APPROX_PROFILE_SQL = """
SELECT o_orderpriority AS order_priority,
       COUNT(DISTINCT o_custkey) AS exact_customers,
       ROUND(quantile_cont(o_totalprice, 0.5), 6) AS exact_p50,
       TRUE AS hll_within_10pct,
       TRUE AS p50_within_5pct
FROM orders GROUP BY 1
"""


@register(
    "approx_distinct_profile",
    _APPROX_PROFILE_SQL,
    doc="Approximate sketches: HLL distinct + approx quantile. Sketch "
    "internals are engine-specific, so raw approx values can't be "
    "oracle-compared; instead the query emits the exact statistics "
    "plus booleans asserting the sketch landed within tolerance "
    "(HLL default rsd 0.05 → 10%% gate; KLL accuracy 1000 → 5%% "
    "gate), and the oracle expects TRUE. A drifting sketch now fails "
    "the hash gate instead of hiding behind a rows-only check.",
)
def q_approx_distinct_profile(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy(F.col("o_orderpriority").alias("order_priority")).agg(
        F.count_distinct("o_custkey").alias("exact_customers"),
        F.approx_count_distinct("o_custkey").alias("__hll"),
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("exact_p50"),
        F.round(
            F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(1000)), 6
        ).alias("__ap50"),
    )
    rel = lambda approx, exact: F.abs(approx - exact) / exact  # noqa: E731
    return agg.select(
        "order_priority",
        "exact_customers",
        "exact_p50",
        (rel(F.col("__hll"), F.col("exact_customers")) <= 0.10).alias(
            "hll_within_10pct"
        ),
        (rel(F.col("__ap50"), F.col("exact_p50")) <= 0.05).alias(
            "p50_within_5pct"
        ),
    )


# ------------------------------------------------- streaming twin

_STREAM_TUMBLING_SQL = """
SELECT date_trunc('day', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@register(
    "stream_tumbling_daily",
    _STREAM_TUMBLING_SQL,
    doc="Structured Streaming tumbling window run to completion with "
    "Trigger.AvailableNow + foreachBatch MERGE sink, then read back — "
    "the streaming plan must reproduce the batch oracle exactly "
    "(streaming/events_stream.py; SURVEY §2.9).",
)
def q_stream_tumbling_daily(spark, sf_dir):
    from ecom_churn_lakehouse_spark.scratch import scratch_dir

    from ecom_churn_lakehouse_spark.sources.managed_table import ManagedTable
    from ecom_churn_lakehouse_spark.streaming import (
        run_stream_to_managed_table,
        stream_events,
        tumbling_counts_stream,
    )

    base = scratch_dir(prefix="stream_q_")
    table = ManagedTable(spark, f"{base}/agg", keys=["window_start", "event_type"])
    stream = tumbling_counts_stream(stream_events(spark, sf_dir), window="1 day")
    run_stream_to_managed_table(stream, table, f"{base}/ckpt")
    return table.read()


# ------------------------------- streaming replay dedup (exactly-once)


@register(
    "stream_dedup_replay_daily",
    _STREAM_TUMBLING_SQL,
    doc="Exactly-once ingest under an at-least-once source: the event "
    "stream is fed a REPLAYED copy of 10% of its rows (re-delivered "
    "files), dropDuplicatesWithinWatermark suppresses the replays by "
    "event_id with state bounded to the watermark horizon, and the "
    "downstream tumbling aggregate publishes through the keyed-MERGE "
    "sink — the oracle is the plain batch aggregate over the ORIGINAL "
    "events, so any replay that leaks through (or real row that is "
    "wrongly suppressed) hash-fails. Composes §2.9's dedup + window + "
    "foreachBatch MERGE in one pipeline "
    "(streaming/events_stream.py::dedup_events_stream).",
)
def q_stream_dedup_replay_daily(spark, sf_dir):
    from ecom_churn_lakehouse_spark.scratch import scratch_dir

    from ecom_churn_lakehouse_spark.sources.managed_table import ManagedTable
    from ecom_churn_lakehouse_spark.sources.tables import load_events
    from ecom_churn_lakehouse_spark.streaming import (
        run_stream_to_managed_table,
    )
    from ecom_churn_lakehouse_spark.streaming.events_stream import (
        dedup_events_stream,
    )

    base = scratch_dir(prefix="stream_dedup_")
    ev = load_events(spark, sf_dir)
    replayed = ev.unionByName(ev.filter(F.col("event_id") % 10 == 0))
    # one source file: the fixture feed is a single AvailableNow wave,
    # and a coalesced write halves the harness cost of staging it
    # (VERDICT r10 directive #3 — harness cost, not plan cost)
    replayed.coalesce(1).write.mode("overwrite").parquet(f"{base}/src")
    stream = (
        spark.readStream.schema(ev.schema).format("parquet").load(f"{base}/src")
    )
    # The whole fixture arrives in one AvailableNow pass, so the dedup
    # watermark must span the full event-time range (a live pipeline
    # would use the source's redelivery window, e.g. "1 hour").
    deduped = dedup_events_stream(stream, watermark="3650 days")
    # The dedup stage's watermark propagates; a second withWatermark on
    # the same column is a redefinition error, so the tumbling
    # aggregate is built directly (same shape as tumbling_counts_stream).
    agg = (
        deduped.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    table = ManagedTable(
        spark, f"{base}/agg", keys=["window_start", "event_type"]
    )
    # State-store sizing: this query runs TWO stateful operators
    # (watermark dedup + windowed agg); each materializes one state
    # store per shuffle partition, and 2 x 32 stores dominated the
    # harness cost at fixture scale (9.1 -> 7.7 s measured). 8
    # partitions bound state-store setup while staying honest about
    # the knob — at 100 TB you size this UP with the key space, it is
    # a per-query setting, not a code change. Restored afterwards so
    # batch entries keep the session default.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        run_stream_to_managed_table(agg, table, f"{base}/ckpt")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return table.read()


# ----------------------------------------- skew-safe distinct count

_SKEWSAFE_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_distinct_users
FROM events
GROUP BY event_type
"""


@register(
    "skewsafe_distinct_users",
    _SKEWSAFE_SQL,
    doc="Distinct users per event_type via salted two-phase "
    "count_distinct (operators/skew.py) — each low-cardinality hot key "
    "is spread over 64 value-hash buckets, so no task ever co-locates "
    "a full key. The plain-SQL oracle proves the salting is invisible "
    "in the result.",
)
def q_skewsafe_distinct_users(spark, sf_dir):
    from ecom_churn_lakehouse_spark.operators.skew import salted_count_distinct
    from ecom_churn_lakehouse_spark.sources.tables import load_events

    events = load_events(spark, sf_dir)
    return salted_count_distinct(
        events, ["event_type"], "user_id", alias="n_distinct_users"
    )


# ------------------------------------- explicit GROUPING SETS + flags

_GROUPING_SETS_SQL = """
WITH base AS (
    SELECT o_orderpriority AS order_priority,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           o_totalprice
    FROM orders
)
SELECT order_priority, order_year,
       CAST(GROUPING(order_priority) AS INTEGER) AS is_priority_total,
       CAST(GROUPING(order_year) AS INTEGER) AS is_year_total,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM base
GROUP BY GROUPING SETS ((order_priority), (order_year), ())
"""


@register(
    "orders_grouping_sets",
    _GROUPING_SETS_SQL,
    doc="Explicit GROUPING SETS (two independent margins + grand total — "
    "NOT a rollup hierarchy) with GROUPING() flags, which disambiguate "
    "a NULL group key from a subtotal row. Complements orders_rollup / "
    "status_priority_cube: one shuffle computes all three groupings.",
)
def q_orders_grouping_sets(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("order_priority"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        "o_totalprice",
    )
    orders.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT order_priority, order_year,
               CAST(GROUPING(order_priority) AS INT) AS is_priority_total,
               CAST(GROUPING(order_year) AS INT) AS is_year_total,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_value
        FROM __orders_gs
        GROUP BY GROUPING SETS ((order_priority), (order_year), ())
        """
    )


# ------------------------------------------- unpivot (wide -> long)

_UNPIVOT_SQL = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
       o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY 1, 2
"""


@register(
    "status_unpivot_by_year",
    _UNPIVOT_SQL,
    doc="Unpivot (wide -> long, melt): the pivot round trip. Spark "
    "builds the wide per-year status counts with groupBy().pivot(), "
    "then DataFrame.unpivot melts them back to (year, status, count); "
    "null cells (combinations absent from the data) are excluded, so "
    "the round trip equals the direct long-form aggregate the oracle "
    "runs. Scale: unpivot is a row-local expand (no shuffle on top of "
    "the pivot's aggregation).",
)
def q_status_unpivot_by_year(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        orders.groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    return (
        wide.unpivot(
            ["order_year"], ["O", "F", "P"], "status", "n_orders"
        )
        .filter(F.col("n_orders").isNotNull())
        .select("order_year", "status", F.col("n_orders").cast("long"))
    )


# ---------------------- window frame navigation (first/nth/last value)

_NAV_SQL = """
WITH spend AS (
    SELECT c.c_mktsegment AS segment,
           c.c_custkey AS custkey,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_spend
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
),
ranked AS (
    SELECT segment,
           FIRST_VALUE(custkey) OVER w AS top_cust,
           NTH_VALUE(custkey, 2) OVER w AS runnerup_cust,
           LAST_VALUE(custkey) OVER w AS bottom_cust,
           ROW_NUMBER() OVER w AS rn
    FROM spend
    WINDOW w AS (
        PARTITION BY segment ORDER BY total_spend DESC, custkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
)
SELECT segment, top_cust, runnerup_cust, bottom_cust
FROM ranked WHERE rn = 1
"""


@register(
    "segment_spend_extremes",
    _NAV_SQL,
    doc="Window frame navigation: FIRST_VALUE / NTH_VALUE(2) / "
    "LAST_VALUE over an unbounded frame per market segment — the "
    "navigation-function family W1/W2 doesn't cover. The frame must "
    "be UNBOUNDED FOLLOWING for last_value to see the true bottom "
    "(the default frame stops at CURRENT ROW). Deterministic via the "
    "(spend DESC, custkey) tie-break; spend is exact-decimal.",
)
def q_segment_spend_extremes(spark, sf_dir):
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    spend = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("c_custkey").alias("custkey"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spend")
        )
    )
    w = (
        Window.partitionBy("segment")
        .orderBy(F.col("total_spend").desc(), "custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_rn = Window.partitionBy("segment").orderBy(
        F.col("total_spend").desc(), "custkey"
    )
    return (
        spend.select(
            "segment",
            F.first("custkey").over(w).alias("top_cust"),
            F.nth_value("custkey", 2).over(w).alias("runnerup_cust"),
            F.last("custkey").over(w).alias("bottom_cust"),
            F.row_number().over(w_rn).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ------------------------------------------- per-group mode (argmax)

_MODE_SQL = """
WITH counts AS (
    SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
           COUNT(*) AS n
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
)
SELECT segment,
       (MAX({'n': n, 'p': priority})).p AS modal_priority,
       CAST(MAX({'n': n, 'p': priority}).n AS BIGINT) AS n_orders
FROM counts
GROUP BY segment
"""


@register(
    "segment_modal_priority",
    _MODE_SQL,
    doc="Per-group mode: the most frequent order priority per market "
    "segment via max(struct(count, value)) — map-side combinable, no "
    "window sort, deterministic tie-break toward the "
    "lexicographically larger value (encoded in the struct order). "
    "The categorical-imputation / dominant-category primitive.",
)
def q_segment_modal_priority(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    counts = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count("*").alias("n"))
    )
    best = F.max(F.struct(F.col("n").alias("n"), F.col("priority").alias("p")))
    return counts.groupBy("segment").agg(
        best.getField("p").alias("modal_priority"),
        best.getField("n").cast("long").alias("n_orders"),
    )


# --------------------------------------- table profiling (deequ-style)

_PROFILE_SQL = """
WITH s AS (
    SELECT
        CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(COUNT(o_orderkey) AS BIGINT) AS nn_orderkey,
        CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS nd_orderkey,
        CAST(MIN(o_orderkey) AS VARCHAR) AS mn_orderkey,
        CAST(MAX(o_orderkey) AS VARCHAR) AS mx_orderkey,
        CAST(COUNT(o_orderstatus) AS BIGINT) AS nn_status,
        CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS nd_status,
        CAST(MIN(o_orderstatus) AS VARCHAR) AS mn_status,
        CAST(MAX(o_orderstatus) AS VARCHAR) AS mx_status,
        CAST(COUNT(o_totalprice) AS BIGINT) AS nn_price,
        CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS nd_price,
        CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS mn_price,
        CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS mx_price
    FROM orders
)
SELECT col_name, n_rows, n_non_null, n_distinct, min_value, max_value
FROM (
    SELECT 'o_orderkey' AS col_name, n_rows, nn_orderkey AS n_non_null,
           nd_orderkey AS n_distinct, mn_orderkey AS min_value,
           mx_orderkey AS max_value FROM s
    UNION ALL
    SELECT 'o_orderstatus', n_rows, nn_status, nd_status, mn_status,
           mx_status FROM s
    UNION ALL
    SELECT 'o_totalprice', n_rows, nn_price, nd_price, mn_price,
           mx_price FROM s
)
"""


@register(
    "orders_table_profile",
    _PROFILE_SQL,
    doc="Deequ-style column profiling: per-column row/non-null/distinct "
    "counts and min/max (stringified for a uniform schema) in ONE "
    "aggregation pass over the table — the wide-aggregate-then-"
    "unpivot shape, never one scan per column. Feeds the DQ layer's "
    "check thresholds and the drift history (dq/history.py).",
)
def q_orders_table_profile(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    aggs = [F.count("*").cast("long").alias("n_rows")]
    for c in cols:
        # doubles stringify via DECIMAL(18,2) — double->string formatting
        # is engine-specific, decimal's is not
        v = F.col(c).cast("decimal(18,2)") if c == "o_totalprice" else F.col(c)
        aggs += [
            F.count(c).cast("long").alias(f"nn_{c}"),
            F.count_distinct(c).cast("long").alias(f"nd_{c}"),
            F.min(v).cast("string").alias(f"mn_{c}"),
            F.max(v).cast("string").alias(f"mx_{c}"),
        ]
    s = orders.agg(*aggs)
    parts = [
        s.select(
            F.lit(c).alias("col_name"),
            "n_rows",
            F.col(f"nn_{c}").alias("n_non_null"),
            F.col(f"nd_{c}").alias("n_distinct"),
            F.col(f"mn_{c}").alias("min_value"),
            F.col(f"mx_{c}").alias("max_value"),
        )
        for c in cols
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# ---------------- gap-reset cumulative sum (episode segmentation)

_EPISODE_GAP_DAYS = 180

_EPISODE_SQL = f"""
WITH o AS (
    SELECT o_custkey AS customer_id, o_orderkey AS order_id,
           CAST(o_orderdate AS DATE) AS order_date,
           o_totalprice AS price
    FROM orders
),
flagged AS (
    SELECT *, CASE WHEN lag(order_date) OVER w IS NULL
                     OR date_diff('day', lag(order_date) OVER w, order_date)
                        > {_EPISODE_GAP_DAYS}
                   THEN 1 ELSE 0 END AS new_episode
    FROM o WINDOW w AS (PARTITION BY customer_id ORDER BY order_date, order_id)
),
ep AS (
    SELECT *, CAST(SUM(new_episode) OVER (
        PARTITION BY customer_id ORDER BY order_date, order_id
    ) AS BIGINT) AS episode FROM flagged
)
SELECT customer_id, order_id, order_date, episode,
       CAST(SUM(CAST(price AS DECIMAL(18,2))) OVER (
           PARTITION BY customer_id, episode ORDER BY order_date, order_id
       ) AS DOUBLE) AS episode_spend
FROM ep
"""


@register(
    "episode_cumulative_spend",
    _EPISODE_SQL,
    doc="Gap-reset cumulative sum: running spend per customer that "
    "restarts whenever the purchase gap exceeds 180 days — the "
    "sessionize-then-accumulate composition (lag flag → running flag "
    "sum = episode id → windowed cumsum within episode). All three "
    "windows share one (customer, date, order) sort, so Spark plans "
    "ONE shuffle + one sort for the whole chain. The balance-with-"
    "resets shape (inventory restocks, streak counters, burn-down).",
)
def q_episode_cumulative_spend(spark, sf_dir):
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderkey").alias("order_id"),
        F.to_date("o_orderdate").alias("order_date"),
        F.col("o_totalprice").alias("price"),
    )
    w = Window.partitionBy("customer_id").orderBy("order_date", "order_id")
    gap = F.datediff(F.col("order_date"), F.lag("order_date").over(w))
    flagged = o.withColumn(
        "new_episode",
        F.when(gap.isNull() | (gap > _EPISODE_GAP_DAYS), 1).otherwise(0),
    )
    ep = flagged.withColumn(
        "episode", F.sum("new_episode").over(w).cast("long")
    )
    we = Window.partitionBy("customer_id", "episode").orderBy(
        "order_date", "order_id"
    )
    return ep.select(
        "customer_id",
        "order_id",
        "order_date",
        "episode",
        F.sum(F.col("price").cast("decimal(18,2)"))
        .over(we)
        .cast("double")
        .alias("episode_spend"),
    )


# --------------------------------------- sliding-window streaming twin

_STREAM_SLIDING_SQL = """
WITH fan AS (
    SELECT make_timestamp(
               (CAST(floor(epoch(ts) / 10800) AS BIGINT) * 10800
                - k * 10800) * 1000000) AS window_start,
           event_type, value
    FROM events, unnest([0, 1]) AS t(k)
)
SELECT window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM fan
GROUP BY 1, 2
"""


@register(
    "stream_sliding_6h",
    _STREAM_SLIDING_SQL,
    doc="Structured Streaming SLIDING window (6h size / 3h slide) run "
    "to completion with Trigger.AvailableNow + foreachBatch MERGE, "
    "then read back — every event belongs to exactly TWO overlapping "
    "windows (starts floor(t/3h)*3h and that minus 3h), and the "
    "streaming overlap fan-out must reproduce the batch oracle's "
    "explicit 2-window expansion exactly, including the epoch-aligned "
    "window starts (streaming/events_stream.py::sliding_counts_stream; "
    "SURVEY §2.9 — pairs with stream_tumbling_daily as the second "
    "windowed-streaming oracle).",
)
def q_stream_sliding_6h(spark, sf_dir):
    from ecom_churn_lakehouse_spark.scratch import scratch_dir

    from ecom_churn_lakehouse_spark.sources.managed_table import ManagedTable
    from ecom_churn_lakehouse_spark.streaming import (
        run_stream_to_managed_table,
        sliding_counts_stream,
        stream_events,
    )

    base = scratch_dir(prefix="stream_sl_")
    table = ManagedTable(
        spark, f"{base}/agg", keys=["window_start", "event_type"]
    )
    stream = sliding_counts_stream(
        stream_events(spark, sf_dir), window="6 hours", slide="3 hours"
    )
    run_stream_to_managed_table(stream, table, f"{base}/ckpt")
    return table.read()


# --------------------------------------- session-window streaming twin

_STREAM_SESSION_SQL = """
WITH marked AS (
    SELECT user_id, ts,
           CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     > INTERVAL 30 MINUTE
                     OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
),
grouped AS (
    SELECT user_id, ts,
           SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS session_id
    FROM marked
)
SELECT MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       user_id,
       COUNT(*) AS n_events
FROM grouped
GROUP BY user_id, session_id
"""


@register(
    "stream_session_windows",
    _STREAM_SESSION_SQL,
    doc="Structured Streaming native SESSION windows (30-minute gap) "
    "run to completion and read back — Spark's session_window merges "
    "events closer than the gap into one window whose end is "
    "last_event + gap, and the result must match the batch islands "
    "formulation exactly (gaps-and-islands: new session when the "
    "lag exceeds the gap, running-sum session ids, min/max bounds). "
    "The third windowed-streaming oracle: tumbling (fixed), sliding "
    "(overlapping), session (data-dependent extent) — together the "
    "full stateful-window surface of SURVEY §2.9 is hash-verified, "
    "not just test-asserted (streaming/events_stream.py::"
    "session_window_stream).",
)
def q_stream_session_windows(spark, sf_dir):
    from ecom_churn_lakehouse_spark.scratch import scratch_dir

    from ecom_churn_lakehouse_spark.sources.managed_table import ManagedTable
    from ecom_churn_lakehouse_spark.streaming import (
        run_stream_to_managed_table,
        session_window_stream,
        stream_events,
    )

    base = scratch_dir(prefix="stream_se_")
    table = ManagedTable(
        spark, f"{base}/agg", keys=["session_start", "user_id"]
    )
    stream = session_window_stream(stream_events(spark, sf_dir), gap="30 minutes")
    run_stream_to_managed_table(
        stream, table, f"{base}/ckpt", output_mode="complete"
    )
    return table.read()


# ------------------------- custom stateful operator, oracle-verified

_STATEFUL_PROFILE_SQL = """
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
           / 1000000 AS total_value,
       epoch_us(MAX(ts)) AS last_seen_us
FROM events
GROUP BY user_id
"""


@register(
    "stateful_user_profiles",
    _STATEFUL_PROFILE_SQL,
    doc="Custom stateful streaming operator (applyInPandasWithState), "
    "oracle-verified: the running per-user profile evolves across "
    "microbatches in the state store (Arrow-batched pandas per key), "
    "and the FINAL state per user must equal an independent engine's "
    "plain GROUP BY over the whole stream. Value totals accumulate "
    "in integer micro-units inside the state (floor(v*1e6+0.5)) — "
    "exact and batch-boundary-independent, so the comparison is a "
    "hash match, not a tolerance check. The last emitted row per "
    "user wins via the MERGE sink's deterministic dedup (n_events "
    "is monotone). This upgrades the one remaining test-only "
    "streaming surface (SURVEY §2.9 custom stateful) to the same "
    "verification tier as the windowed aggregations.",
)
def q_stateful_user_profiles(spark, sf_dir):
    from ecom_churn_lakehouse_spark.scratch import scratch_dir

    from ecom_churn_lakehouse_spark.sources.managed_table import ManagedTable
    from ecom_churn_lakehouse_spark.streaming import (
        run_stream_to_managed_table,
        running_user_profiles,
        stream_events,
    )

    base = scratch_dir(prefix="stream_st_")
    table = ManagedTable(spark, f"{base}/agg", keys=["user_id"])
    stream = running_user_profiles(stream_events(spark, sf_dir))
    # State-store sizing (VERDICT r11 directive #6, the
    # stream_dedup_replay_daily knob): applyInPandasWithState
    # materializes one state store AND one Arrow-batched python
    # worker exchange per shuffle partition; 8 partitions bound that
    # setup at fixture scale. A per-query setting sized UP with the
    # key space at 100 TB, not a code change; restored afterwards.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        run_stream_to_managed_table(stream, table, f"{base}/ckpt")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return table.read()


# ------------------------------------------- SQL front-end entries

#: One SQL text, two engines: dialect-portable (works verbatim as the
#: DuckDB oracle), so the entry proves the SQL FRONT DOOR — catalog +
#: spark.sql — yields the same results as the DataFrame front.
_SQL_FRONTEND_SUMMARY = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
       o_orderstatus AS order_status,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS total_value
FROM orders
GROUP BY 1, 2
"""


@register(
    "sql_orders_summary",
    _SQL_FRONTEND_SUMMARY,
    doc="SQL front door: the engine catalogs the tables as views and "
    "evaluates a SQL STRING (sources/catalog.py::run_sql) — the "
    "reference exposes only the DataFrame API (zero SQL strings, "
    "SURVEY §1); a reusable engine exposes both fronts over one "
    "Catalyst plan space. The text is dialect-portable and runs "
    "VERBATIM as its own DuckDB oracle, so the check proves the SQL "
    "path end-to-end (parser -> analyzer -> same optimized plan).",
)
def q_sql_orders_summary(spark, sf_dir):
    from ecom_churn_lakehouse_spark.sources.catalog import run_sql

    return run_sql(spark, sf_dir, _SQL_FRONTEND_SUMMARY)


_SQL_FRONTEND_TOPK = """
SELECT part_brand, partkey, part_revenue
FROM (
    SELECT p.p_brand AS part_brand,
           l.l_partkey AS partkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS part_revenue,
           ROW_NUMBER() OVER (
               PARTITION BY p.p_brand
               ORDER BY SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                 AS DECIMAL(18,6))) DESC, l.l_partkey
           ) AS rn
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand, l.l_partkey
) ranked
WHERE rn <= 3
"""


@register(
    "sql_top_parts_per_brand",
    _SQL_FRONTEND_TOPK,
    doc="SQL front door, window edition: per-brand top-3 parts by "
    "revenue as one dialect-portable SQL string evaluated by "
    "spark.sql over the cataloged views AND verbatim by the oracle — "
    "join + decimal-exact aggregation + ranked window through the "
    "SQL parser path. The DECIMAL ordering key keeps the rank "
    "deterministic cross-engine (see the FMA note in "
    "queries/churn_queries.py — float ordering keys are not "
    "portable).",
)
def q_sql_top_parts_per_brand(spark, sf_dir):
    from ecom_churn_lakehouse_spark.sources.catalog import run_sql

    return run_sql(spark, sf_dir, _SQL_FRONTEND_TOPK)


# -------------------------------------------- salted hot-key join

_SALTED_JOIN_SQL = """
WITH user_dim AS (
    SELECT user_id,
           COUNT(*) AS user_events,
           MIN(event_type) AS first_type
    FROM events GROUP BY user_id
)
SELECT e.event_type,
       d.first_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(d.user_events) AS BIGINT) AS sum_user_events
FROM events e
JOIN user_dim d ON d.user_id = e.user_id
GROUP BY 1, 2
"""


@register(
    "skewsafe_user_enrichment",
    _SALTED_JOIN_SQL,
    doc="Hot-key join via explicit salting (operators/skew.py::"
    "salted_join): the events fact joins a per-user dim with the "
    "fact side salted across 16 composite keys and the dim "
    "replicated per salt — no single task ever co-locates one hot "
    "user's full event history (the 150-user fixture makes every "
    "key hot by construction). The plain-join oracle proves salting "
    "is invisible in the result; pairs with skewsafe_distinct_users "
    "as the two explicit skew tools beyond AQE's automatic split.",
)
def q_skewsafe_user_enrichment(spark, sf_dir):
    from ecom_churn_lakehouse_spark.operators.skew import salted_join
    from ecom_churn_lakehouse_spark.sources.tables import load_events

    events = load_events(spark, sf_dir)
    user_dim = events.groupBy("user_id").agg(
        F.count("*").alias("user_events"),
        F.min("event_type").alias("first_type"),
    )
    joined = salted_join(
        events.select("user_id", "event_type"), user_dim, on=["user_id"], salt_n=16
    )
    return joined.groupBy("event_type", "first_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("user_events").cast("long").alias("sum_user_events"),
    )


# ------------------- stream-static enrichment + windowed rollup

_STREAM_ENRICHED_SQL = """
SELECT CAST(date_trunc('day', e.ts) AS TIMESTAMP) AS window_start,
       c.c_mktsegment AS segment,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
GROUP BY 1, 2
"""


@register(
    "stream_enriched_daily",
    _STREAM_ENRICHED_SQL,
    doc="Stream-STATIC join then windowed aggregation, run to "
    "completion: the event stream joins a broadcast customer dimension "
    "(streaming/events_stream.py::enriched_tumbling_counts_stream — no "
    "streaming state for the join, dim re-resolved each microbatch) "
    "and the watermarked tumbling aggregate groups by the DIM's "
    "segment attribute, foreachBatch-MERGEd into a managed table. The "
    "canonical enrich-then-rollup streaming pipeline; the batch SQL "
    "oracle proves streaming execution is result-identical (SURVEY "
    "§2.9 — completes the join matrix: stream-stream inner/outer + "
    "stream-static).",
)
def q_stream_enriched_daily(spark, sf_dir):
    from ecom_churn_lakehouse_spark.scratch import scratch_dir

    from ecom_churn_lakehouse_spark.sources.managed_table import ManagedTable
    from ecom_churn_lakehouse_spark.streaming import (
        enriched_tumbling_counts_stream,
        run_stream_to_managed_table,
        stream_events,
    )

    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    base = scratch_dir(prefix="stream_enr_")
    table = ManagedTable(spark, f"{base}/agg", keys=["window_start", "segment"])
    stream = enriched_tumbling_counts_stream(
        stream_events(spark, sf_dir), dim, on="user_id", group_col="segment"
    )
    run_stream_to_managed_table(stream, table, f"{base}/ckpt")
    return table.read()


# ------------------------- forward fill (carry last observation)

_FFILL_SQL = """
SELECT event_id, user_id, ts,
       LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END
                  IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS last_purchase_value
FROM events
"""


@register(
    "last_purchase_ffill",
    _FFILL_SQL,
    doc="Forward fill / carry-last-observation: every event carries the "
    "user's most recent purchase value via last_value(..., ignoreNulls) "
    "over a running frame — the sparse-to-dense state reconstruction "
    "window (sensor readings, account balances, feature staleness) "
    "that zero-fill gap filling (hourly_events_gapfilled) cannot "
    "express. One window over the per-user exchange; no join, no "
    "spine. Completes the navigation-function family "
    "(segment_spend_extremes covers first/nth/last on bounded frames; "
    "this is the IGNORE NULLS running variant).",
)
def q_last_purchase_ffill(spark, sf_dir):
    from pyspark.sql.window import Window

    from ecom_churn_lakehouse_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.last(
            F.when(F.col("event_type") == "purchase", F.col("value")),
            ignorenulls=True,
        ).over(w).alias("last_purchase_value"),
    )


# ------------------------- robust outliers: median/MAD per group

_MAD_K = 3.0  # flag beyond 3 scaled-MADs


_MAD_SQL = f"""
WITH med AS (
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5) AS med
    FROM orders GROUP BY o_orderpriority
),
mad AS (
    SELECT o.o_orderpriority,
           m.med,
           quantile_cont(ABS(o.o_totalprice - m.med), 0.5) AS mad
    FROM orders o JOIN med m ON o.o_orderpriority = m.o_orderpriority
    GROUP BY o.o_orderpriority, m.med
)
SELECT o.o_orderpriority AS order_priority,
       COUNT(*) AS n_orders,
       ROUND(m.med, 6) AS median_value,
       ROUND(m.mad, 6) AS mad_value,
       CAST(COUNT(*) FILTER (
           ABS(o.o_totalprice - m.med) > {_MAD_K} * 1.4826 * m.mad
       ) AS BIGINT) AS n_outliers
FROM orders o JOIN mad m ON o.o_orderpriority = m.o_orderpriority
GROUP BY o.o_orderpriority, m.med, m.mad
ORDER BY order_priority
"""


@register(
    "order_value_mad_outliers",
    _MAD_SQL,
    doc="Robust outlier gate per group: median / MAD (median absolute "
    "deviation, x1.4826 for normal consistency) with counts beyond "
    f"{_MAD_K} scaled MADs — the outlier screen that survives the "
    "heavy tails that wreck mean/stddev z-scores (contrast "
    "price_outlier_orders' IQR sketch path and "
    "user_activity_zscore's moment path). Two exact-percentile "
    "aggregates (both engines interpolate identically) + one "
    "counting pass, each keyed by the group — at 100 TB the exact "
    "median swaps for percentile_approx exactly as "
    "order_value_percentiles documents, and the final pass "
    "broadcasts the 5-row stats frame into the scan.",
)
def q_order_value_mad_outliers(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    med = orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("med")
    )
    dev = orders.join(F.broadcast(med), on="o_orderpriority").select(
        "o_orderpriority",
        "o_totalprice",
        "med",
        F.abs(F.col("o_totalprice") - F.col("med")).alias("absdev"),
    )
    mad = dev.groupBy("o_orderpriority", "med").agg(
        F.percentile("absdev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.drop("med")
        .join(F.broadcast(mad), on="o_orderpriority")
        .groupBy(
            F.col("o_orderpriority").alias("order_priority"),
            "med",
            "mad",
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(
                F.when(
                    F.abs(F.col("o_totalprice") - F.col("med"))
                    > _MAD_K * 1.4826 * F.col("mad"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .select(
            "order_priority",
            "n_orders",
            F.round("med", 6).alias("median_value"),
            F.round("mad", 6).alias("mad_value"),
            "n_outliers",
        )
        .orderBy("order_priority")
    )


# ---------------------------------------------- array set-op battery

_ARRAY_SETOP_SQL = """
WITH grp AS (
    SELECT l_orderkey,
           COALESCE(list_sort(list_distinct(
               list(l_partkey % 97) FILTER (WHERE l_linenumber % 2 = 1))), [])
               AS a,
           COALESCE(list_sort(list_distinct(
               list(l_partkey % 97) FILTER (WHERE l_linenumber % 2 = 0))), [])
               AS b
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    GROUP BY l_orderkey
)
SELECT l_orderkey,
       CAST(len(a) AS INTEGER) AS n_a,
       CAST(len(b) AS INTEGER) AS n_b,
       COALESCE(array_to_string(list_sort(list_intersect(a, b)), ','), '')
           AS inter_csv,
       COALESCE(array_to_string(list_sort(
           list_filter(a, x -> NOT list_contains(b, x))), ','), '')
           AS except_csv,
       COALESCE(array_to_string(list_sort(list_distinct(list_concat(a, b))), ','),
                '') AS union_csv,
       list_contains(a, 5) AS has_5,
       list_max(a) AS a_max,
       list_min(a) AS a_min,
       CAST(COALESCE(list_sum(a), 0) AS BIGINT) AS a_sum,
       COALESCE(array_to_string(a[1:3], ','), '') AS first3_csv
FROM grp
ORDER BY l_orderkey
"""


@register(
    "array_setop_battery",
    _ARRAY_SETOP_SQL,
    doc="Two-array SET-OP parity battery (complements array_function_"
    "battery's single-array fold battery): per order, two "
    "disjoint-linenumber part-key arrays, then intersect / except / "
    "union-distinct / contains / min / max / fold-sum / slice, every "
    "set-valued result SORTED before surfacing because DuckDB's "
    "list_intersect and list_distinct return arbitrary order while "
    "Spark's array_intersect preserves left order — unsorted "
    "surfaces would hash-diverge even when the sets are equal. "
    "Empty-group edges pinned: DuckDB's FILTERed list() aggregate is "
    "NULL on empty (coalesced to []) where Spark's collect_list is "
    "already [], and list_sum(NULL/[]) is NULL where Spark's "
    "aggregate fold starts at 0, and DuckDB array_to_string(EMPTY) is "
    "NULL where Spark array_join is '' (coalesced). Scale: one grouped agg over a "
    "keyed 2% order slice; arrays are basket-sized.",
)
def q_array_setop_battery(spark, sf_dir):
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 50 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_partkey") % 97).alias("k"),
        )
    )
    grp = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.array_distinct(
                F.collect_list(F.when(F.col("l_linenumber") % 2 == 1, F.col("k")))
            )
        ).alias("a"),
        F.array_sort(
            F.array_distinct(
                F.collect_list(F.when(F.col("l_linenumber") % 2 == 0, F.col("k")))
            )
        ).alias("b"),
    )
    csv = lambda arr: F.array_join(  # noqa: E731
        F.transform(arr, lambda x: x.cast("string")), ","
    )
    return grp.select(
        "l_orderkey",
        F.size("a").cast("int").alias("n_a"),
        F.size("b").cast("int").alias("n_b"),
        csv(F.array_sort(F.array_intersect("a", "b"))).alias("inter_csv"),
        csv(F.array_sort(F.array_except("a", "b"))).alias("except_csv"),
        csv(F.array_sort(F.array_distinct(F.concat("a", "b")))).alias(
            "union_csv"
        ),
        F.array_contains("a", F.lit(5)).alias("has_5"),
        F.array_max("a").alias("a_max"),
        F.array_min("a").alias("a_min"),
        F.aggregate(
            "a", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("a_sum"),
        csv(F.slice("a", 1, 3)).alias("first3_csv"),
    ).orderBy("l_orderkey")
