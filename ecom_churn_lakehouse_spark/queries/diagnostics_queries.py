"""Pipeline-health diagnostics: distribution drift, key-skew
profiling, and boilerplate detection (SURVEY §7.7 widening — the
monitoring queries a production lakehouse runs BESIDE the workload):

- PSI drift:    population stability index between two time windows
- skew profile: per-key load statistics + the salt factor a skew-safe
                rewrite would need (the diagnostic behind
                skewsafe_user_enrichment)
- boilerplate:  sentences repeated across distinct documents (the
                CCNet-style paragraph-frequency filter)

All oracle-verified with fixed, scale-stable constants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecom_churn_lakehouse_spark.registry import register
from ecom_churn_lakehouse_spark.sources import load_events, load_table


# ------------------------------------------------- PSI distribution drift

# Fixed literal bin edges (o_totalprice spans ~1e3..5e5 uniformly at
# every SF): fixed edges make the bin a scan-local expression and the
# report comparable across runs — data-driven quantile edges would
# re-bin every period and hide real drift.
_PSI_EDGES = [50_000 * i for i in range(1, 10)]  # 9 cuts -> 10 bins
_PSI_A = ("1996-01-01", "1997-01-01")
_PSI_B = ("1999-01-01", "2000-01-01")
_PSI_EPS = 1e-6


def _bin_case_sql(col: str) -> str:
    clauses = " ".join(
        f"WHEN {col} < {e} THEN {i}" for i, e in enumerate(_PSI_EDGES)
    )
    return f"CASE {clauses} ELSE {len(_PSI_EDGES)} END"


_PSI_SQL = f"""
WITH binned AS (
    SELECT {_bin_case_sql("o_totalprice")} AS bin,
           CASE WHEN CAST(o_orderdate AS DATE) >= DATE '{_PSI_A[0]}'
                 AND CAST(o_orderdate AS DATE) < DATE '{_PSI_A[1]}'
                THEN 1 ELSE 0 END AS in_a,
           CASE WHEN CAST(o_orderdate AS DATE) >= DATE '{_PSI_B[0]}'
                 AND CAST(o_orderdate AS DATE) < DATE '{_PSI_B[1]}'
                THEN 1 ELSE 0 END AS in_b
    FROM orders
    WHERE (CAST(o_orderdate AS DATE) >= DATE '{_PSI_A[0]}'
           AND CAST(o_orderdate AS DATE) < DATE '{_PSI_A[1]}')
       OR (CAST(o_orderdate AS DATE) >= DATE '{_PSI_B[0]}'
           AND CAST(o_orderdate AS DATE) < DATE '{_PSI_B[1]}')
),
tot AS (
    SELECT CAST(SUM(in_a) AS DOUBLE) AS na,
           CAST(SUM(in_b) AS DOUBLE) AS nb
    FROM binned
),
shares AS (
    SELECT bin,
           CAST(SUM(in_a) AS DOUBLE) / (SELECT na FROM tot) AS sa_raw,
           CAST(SUM(in_b) AS DOUBLE) / (SELECT nb FROM tot) AS sb_raw
    FROM binned
    GROUP BY bin
)
SELECT bin,
       ROUND(sa_raw, 6) AS share_a,
       ROUND(sb_raw, 6) AS share_b,
       ROUND((sa_raw - sb_raw)
             * ln((sa_raw + {_PSI_EPS}) / (sb_raw + {_PSI_EPS})),
             6) AS psi_term
FROM shares
ORDER BY bin
"""


@register(
    "order_value_psi_drift",
    _PSI_SQL,
    doc="Population stability index between two one-year windows of "
    "the order-value distribution — the drift gate a feature pipeline "
    "runs before retraining (PSI > 0.2 on any feature blocks the "
    "snapshot; cf. dq/history.py drift ledger). Both windows bin in "
    "ONE scan (conditional sums per fixed literal bin edge — no "
    "second pass, no quantile sort); the per-window totals broadcast "
    "back as 1-row frames. The per-bin psi_term rows sum to the "
    "headline PSI while keeping the blame-assignable grain.",
)
def q_order_value_psi_drift(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    in_a = (
        F.to_date("o_orderdate") >= F.lit(_PSI_A[0]).cast("date")
    ) & (F.to_date("o_orderdate") < F.lit(_PSI_A[1]).cast("date"))
    in_b = (
        F.to_date("o_orderdate") >= F.lit(_PSI_B[0]).cast("date")
    ) & (F.to_date("o_orderdate") < F.lit(_PSI_B[1]).cast("date"))
    bin_expr = F.lit(len(_PSI_EDGES))
    for i, e in reversed(list(enumerate(_PSI_EDGES))):
        bin_expr = F.when(F.col("o_totalprice") < e, i).otherwise(bin_expr)
    binned = orders.filter(in_a | in_b).select(
        bin_expr.alias("bin"),
        in_a.cast("int").alias("in_a"),
        in_b.cast("int").alias("in_b"),
    )
    tot = binned.agg(
        F.sum("in_a").cast("double").alias("na"),
        F.sum("in_b").cast("double").alias("nb"),
    )
    shares = (
        binned.groupBy("bin")
        .agg(
            F.sum("in_a").cast("double").alias("sa"),
            F.sum("in_b").cast("double").alias("sb"),
        )
        .join(F.broadcast(tot))
        .select(
            "bin",
            (F.col("sa") / F.col("na")).alias("share_a"),
            (F.col("sb") / F.col("nb")).alias("share_b"),
        )
    )
    return shares.select(
        "bin",
        F.round("share_a", 6).alias("share_a"),
        F.round("share_b", 6).alias("share_b"),
        F.round(
            (F.col("share_a") - F.col("share_b"))
            * F.log(
                (F.col("share_a") + _PSI_EPS) / (F.col("share_b") + _PSI_EPS)
            ),
            6,
        ).alias("psi_term"),
    ).orderBy("bin")


# ------------------------------------------------- per-key skew profile

_SKEW_SQL = """
WITH per_key AS (
    SELECT event_type, user_id, COUNT(*) AS c
    FROM events
    GROUP BY event_type, user_id
)
SELECT event_type,
       COUNT(*) AS n_keys,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       CAST(MAX(c) AS BIGINT) AS max_rows,
       ROUND(CAST(SUM(c) AS DOUBLE) / COUNT(*), 6) AS mean_rows,
       ROUND(CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c), 6)
           AS skew_ratio,
       CAST(CEIL(CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c))
            AS BIGINT) AS suggested_salt
FROM per_key
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "key_skew_profile",
    _SKEW_SQL,
    doc="Per-key load profile of the event log: how unevenly each "
    "partition key (user_id, per event_type) distributes rows, with "
    "the hottest key's multiple of the mean — exactly the number a "
    "skew-safe rewrite needs as its salt factor (the diagnostic "
    "behind skewsafe_user_enrichment's fixed salt and AQE's runtime "
    "skew split). Two map-side-combinable aggregates; the second "
    "input is one row per key, so at 100 TB the profile costs one "
    "shuffle of (key, count) pairs — run it BEFORE the expensive "
    "join, not after it stalls.",
)
def q_key_skew_profile(spark, sf_dir):
    per_key = (
        load_events(spark, sf_dir)
        .groupBy("event_type", "user_id")
        .agg(F.count("*").alias("c"))
    )
    skew = F.col("max_rows").cast("double") * F.col("n_keys") / F.col(
        "n_rows"
    )
    return (
        per_key.groupBy("event_type")
        .agg(
            F.count("*").alias("n_keys"),
            F.sum("c").cast("long").alias("n_rows"),
            F.max("c").cast("long").alias("max_rows"),
        )
        .select(
            "event_type",
            "n_keys",
            "n_rows",
            "max_rows",
            F.round(
                F.col("n_rows").cast("double") / F.col("n_keys"), 6
            ).alias("mean_rows"),
            F.round(skew, 6).alias("skew_ratio"),
            F.ceil(skew).cast("long").alias("suggested_salt"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------------- boilerplate sentences

_BOILERPLATE_MIN_DOCS = 2

_BOILERPLATE_SQL = f"""
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id + 200000 AS doc_id, text || ' zz qq' AS text
    FROM documents WHERE doc_id % 7 = 0
),
sent AS (
    SELECT doc_id, unnest(string_split(text, '. ')) AS sentence
    FROM corpus
),
freq AS (
    SELECT md5(sentence) AS sentence_md5,
           COUNT(DISTINCT doc_id) AS n_docs,
           MIN(doc_id) AS first_doc_id
    FROM sent
    WHERE sentence <> ''
    GROUP BY md5(sentence)
    HAVING COUNT(DISTINCT doc_id) >= {_BOILERPLATE_MIN_DOCS}
)
SELECT sentence_md5, n_docs, first_doc_id
FROM freq
ORDER BY n_docs DESC, first_doc_id
"""


@register(
    "boilerplate_paragraph_detection",
    _BOILERPLATE_SQL,
    doc="Sentences repeated across distinct documents — the "
    "paragraph-frequency boilerplate filter (headers, footers, "
    "cookie banners) a curation pipeline applies at SUB-document "
    "grain where document-level dedup can't see the repetition. The "
    "sentence explode keeps only md5(sentence) + doc_id into the "
    "one distinct-count shuffle (the text never moves), so the "
    "exchange is ~40 bytes per sentence occurrence at any corpus "
    "size. Run over the planted-duplicate corpus "
    "(dedup_queries.derived_corpus) so the fixture has repetition "
    "to find.",
)
def q_boilerplate_paragraph_detection(spark, sf_dir):
    from ecom_churn_lakehouse_spark.queries.dedup_queries import (
        derived_corpus,
    )

    sent = derived_corpus(spark, sf_dir).select(
        "doc_id",
        F.explode(F.split(F.col("text"), r"\. ")).alias("sentence"),
    ).filter(F.col("sentence") != "")
    return (
        sent.select("doc_id", F.md5("sentence").alias("sentence_md5"))
        .groupBy("sentence_md5")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .filter(F.col("n_docs") >= _BOILERPLATE_MIN_DOCS)
        .orderBy(F.col("n_docs").desc(), "first_doc_id")
    )


# ---------------------------------------- partition layout advisor

_LAYOUT_SQL = """
WITH o AS (
    SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS by_month,
           o_orderpriority AS by_priority,
           CAST(o_custkey % 16 AS VARCHAR) AS by_cust_bucket
    FROM orders
),
m AS (SELECT 'order_month' AS layout_key, by_month AS part, COUNT(*) AS n
      FROM o GROUP BY by_month),
p AS (SELECT 'order_priority', by_priority, COUNT(*) FROM o GROUP BY by_priority),
c AS (SELECT 'custkey_bucket16', by_cust_bucket, COUNT(*) FROM o GROUP BY by_cust_bucket),
allp AS (SELECT * FROM m UNION ALL SELECT * FROM p UNION ALL SELECT * FROM c)
SELECT layout_key,
       CAST(COUNT(*) AS BIGINT) AS n_partitions,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(MAX(n) AS BIGINT) AS max_partition_rows,
       CAST(MIN(n) AS BIGINT) AS min_partition_rows,
       CAST(MAX(n) * COUNT(*) * 1000000 // SUM(n) AS BIGINT)
           AS skew_ppm
FROM allp GROUP BY layout_key
"""


@register(
    "partition_layout_advisor",
    _LAYOUT_SQL,
    doc="Storage-layout advisor: for three candidate partitionBy keys "
    "over orders (calendar month, priority, a 16-way custkey hash "
    "bucket), the partition count, row extremes, and a skew index "
    "(max partition / perfectly-even share, exact integer ppm — "
    "1e6 = balanced). THE pre-write decision at 100 TB: a "
    "5-partition priority layout means 20 TB files, a high-"
    "cardinality key means millions of small files, and skew_ppm "
    "predicts the straggler factor of every downstream "
    "partition-pruned scan. One pass per candidate, all map-side "
    "combinable; n_partitions per candidate stays catalog-sized.",
)
def q_partition_layout_advisor(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM").alias("by_month"),
        F.col("o_orderpriority").alias("by_priority"),
        (F.col("o_custkey") % 16).cast("string").alias("by_cust_bucket"),
    )

    def layout(name, col):
        return o.groupBy(F.col(col).alias("part")).agg(
            F.count("*").alias("n")
        ).select(F.lit(name).alias("layout_key"), "part", "n")

    allp = (
        layout("order_month", "by_month")
        .unionByName(layout("order_priority", "by_priority"))
        .unionByName(layout("custkey_bucket16", "by_cust_bucket"))
    )
    return allp.groupBy("layout_key").agg(
        F.count("*").cast("long").alias("n_partitions"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("n").cast("long").alias("max_partition_rows"),
        F.min("n").cast("long").alias("min_partition_rows"),
        F.expr("MAX(n) * COUNT(*) * 1000000 DIV SUM(n)")
        .cast("long")
        .alias("skew_ppm"),
    )


# --------------------------------------------- Benford first-digit audit

# log10(1 + 1/d) in exact ppm — the canonical Benford expectation,
# hardcoded so no libm log enters either engine's surface.
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def _benford_sql() -> str:
    case = " ".join(
        f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items()
    )
    return f"""
WITH d AS (
    SELECT CAST(substring(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                               AS VARCHAR), 1, 1) AS INTEGER) AS digit
    FROM orders WHERE o_totalprice >= 1
),
tot AS (SELECT COUNT(*) AS n FROM d)
SELECT digit,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(*) * 1000000 // t.n AS BIGINT) AS share_ppm,
       CAST(CASE digit {case} END AS BIGINT) AS benford_ppm,
       CAST(abs(COUNT(*) * 1000000 // t.n
                - CASE digit {case} END) AS BIGINT) AS abs_delta_ppm
FROM d CROSS JOIN tot t
GROUP BY digit, t.n
"""


@register(
    "benford_digit_audit",
    _benford_sql(),
    doc="Benford's-law first-digit audit over order totals: observed "
    "first-significant-digit shares in exact integer ppm against the "
    "hardcoded log10(1+1/d) expectation (constants in ppm, so no "
    "libm log on any compared surface) — the classic fabricated-"
    "data / unit-mixup screen a DQ pipeline runs on monetary "
    "columns (synthetic uniform-ish fixture prices deviate wildly, "
    "which is exactly what the audit should say about them). One "
    "scan, nine groups, the total broadcast via a 1-row frame.",
)
def q_benford_digit_audit(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 1
    )
    d = orders.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    tot = d.agg(F.count("*").alias("n"))
    benford = F.coalesce(
        *[
            F.when(F.col("digit") == dd, F.lit(p))
            for dd, p in _BENFORD_PPM.items()
        ]
    ).cast("long")
    return (
        d.join(F.broadcast(tot))
        .groupBy("digit", "n")
        .agg(F.count("*").cast("long").alias("n_orders"))
        .select(
            "digit",
            "n_orders",
            F.expr("n_orders * 1000000 DIV n").cast("long").alias(
                "share_ppm"
            ),
            benford.alias("benford_ppm"),
            F.abs(
                F.expr("n_orders * 1000000 DIV n") - benford
            )
            .cast("long")
            .alias("abs_delta_ppm"),
        )
    )


# ------------------------------------------- header/detail reconciliation

_RECON_SQL = """
WITH detail AS (
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                         AS DECIMAL(18,6))) AS DECIMAL(24,6)) AS calc
    FROM lineitem GROUP BY l_orderkey
),
-- diff at the exact 6-decimal micro grain: DECIMAL subtraction is
-- exact and *1e6 makes it INTEGRAL, so the bigint cast never rounds
-- (DuckDB rounds fractional casts where Spark truncates — avoided
-- entirely by quantizing on an integral value)
diffs AS (
    SELECT CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS header_cents,
           CAST(abs((CAST(o.o_totalprice AS DECIMAL(18,2)) - d.calc)
                    * 1000000) AS BIGINT) AS abs_diff_micro
    FROM orders o JOIN detail d ON d.l_orderkey = o.o_orderkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN abs_diff_micro = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_exact,
       CAST(SUM(CASE WHEN abs_diff_micro <= header_cents * 100
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_within_1pct,
       CAST(SUM(abs_diff_micro) // COUNT(*) AS BIGINT)
           AS mean_abs_diff_micro,
       CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY abs_diff_micro)
            AS BIGINT) AS p50_abs_diff_micro,
       CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY abs_diff_micro)
            AS BIGINT) AS p95_abs_diff_micro,
       CAST(MAX(abs_diff_micro) AS BIGINT) AS max_abs_diff_micro
FROM diffs
"""


@register(
    "order_total_reconciliation",
    _RECON_SQL,
    doc="Header-vs-detail reconciliation: every order's header total "
    "against the recomputed sum of its lines "
    "(price*(1-disc)*(1+tax)), with the discrepancy DISTRIBUTION "
    "(exact-match count, within-1%, mean/median/p95/max absolute "
    "difference in exact 6-decimal micros) — the finance-grade check "
    "that referential_integrity_audit (key existence) and "
    "duplicate_key_audit (grain) do not cover; this fixture's "
    "generator does NOT honor the invariant, which is precisely "
    "what the operator exists to surface. Line charges carry six "
    "decimals losslessly and reduce per order map-combinably; all "
    "diff stats are exact integer cents (percentile_disc at the "
    "order grain). Scale: one fact agg + one equi-join on the "
    "natural shuffle key.",
)
def q_order_total_reconciliation(spark, sf_dir):
    from pyspark.sql import functions as F

    from ecom_churn_lakehouse_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    detail = li.groupBy("l_orderkey").agg(
        F.sum(
            (
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).cast("decimal(18,6)")
        )
        .cast("decimal(24,6)")
        .alias("calc")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("decimal(18,2)").alias("header")
    )
    diffs = orders.join(detail, orders.o_orderkey == detail.l_orderkey).select(
        F.expr("CAST(header * 100 AS BIGINT)").alias("header_cents"),
        F.expr("CAST(abs((header - calc) * 1000000) AS BIGINT)").alias(
            "abs_diff_micro"
        ),
    )
    return diffs.agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.when(F.col("abs_diff_micro") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_exact"),
        F.sum(
            F.when(
                F.col("abs_diff_micro") <= F.col("header_cents") * 100, 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_within_1pct"),
        F.expr("CAST(SUM(abs_diff_micro) DIV COUNT(*) AS BIGINT)").alias(
            "mean_abs_diff_micro"
        ),
        F.expr(
            "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY abs_diff_micro)"
            " AS BIGINT)"
        ).alias("p50_abs_diff_micro"),
        F.expr(
            "CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY abs_diff_micro)"
            " AS BIGINT)"
        ).alias("p95_abs_diff_micro"),
        F.max("abs_diff_micro").cast("long").alias("max_abs_diff_micro"),
    )


# ------------------------------------------- process capability (Cp/Cpk)

#: Spec limits for order-to-ship latency: LSL 1 day, USL 90 days.
#: Cp = (USL-LSL)/(6 sigma); Cpk = min(USL-mean, mean-LSL)/(3 sigma);
#: sigma from exact integer day sums, shared IEEE expressions.
_CPK_SIGMA = (
    "sqrt((CAST(sdd AS DOUBLE)"
    " - CAST(sd_ AS DOUBLE) * CAST(sd_ AS DOUBLE) / CAST(n AS DOUBLE))"
    " / (CAST(n AS DOUBLE) - 1.0))"
)
_CPK_CP_MILLI = (
    f"CAST(FLOOR(89.0 / (6.0 * {_CPK_SIGMA}) * 1000.0) AS BIGINT)"
)
_CPK_CPK_MILLI = (
    f"CAST(FLOOR(LEAST(90.0 - CAST(sd_ AS DOUBLE) / CAST(n AS DOUBLE),"
    f" CAST(sd_ AS DOUBLE) / CAST(n AS DOUBLE) - 1.0)"
    f" / (3.0 * {_CPK_SIGMA}) * 1000.0) AS BIGINT)"
)

_CPK_SQL = f"""
WITH lat AS (
    SELECT CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT) AS d
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
comp AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(d) AS BIGINT) AS sd_,
           CAST(SUM(d * d) AS BIGINT) AS sdd,
           CAST(SUM(CASE WHEN d < 1 OR d > 90 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_out_of_spec
    FROM lat
)
SELECT n, sd_ AS sum_days, n_out_of_spec,
       CAST(n_out_of_spec * 1000000 // n AS BIGINT) AS out_of_spec_ppm,
       {_CPK_CP_MILLI} AS cp_milli,
       {_CPK_CPK_MILLI} AS cpk_milli
FROM comp
"""


@register(
    "ship_delay_process_capability",
    _CPK_SQL,
    doc="Process capability of order-to-ship latency against a "
    "[1, 90]-day spec: Cp (spread capability) and Cpk "
    "(centering-adjusted — the one customers feel) plus the "
    "directly-measured out-of-spec ppm — the manufacturing-grade "
    "SLA lens that ship_delay_percentiles' quantiles don't give "
    "(Cpk < 1.0 means the process WILL breach spec at scale even "
    "if today's sample looks fine). Latency is exact integer days "
    "(calendar date_diff on both engines); variance assembles from "
    "exact int64 sums; both indices are shared IEEE expressions, "
    "milli-floored. Scale: one equi-join + one fused agg to a "
    "single row.",
)
def q_ship_delay_process_capability(spark, sf_dir):
    from pyspark.sql import functions as F

    from ecom_churn_lakehouse_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    lat = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        .cast("long")
        .alias("d")
    )
    comp = lat.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("d").cast("long").alias("sd_"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("sdd"),
        F.sum(F.when((F.col("d") < 1) | (F.col("d") > 90), 1).otherwise(0))
        .cast("long")
        .alias("n_out_of_spec"),
    )
    return comp.select(
        "n",
        F.col("sd_").alias("sum_days"),
        "n_out_of_spec",
        F.expr("CAST(n_out_of_spec * 1000000 DIV n AS BIGINT)").alias(
            "out_of_spec_ppm"
        ),
        F.expr(_CPK_CP_MILLI).alias("cp_milli"),
        F.expr(_CPK_CPK_MILLI).alias("cpk_milli"),
    )
