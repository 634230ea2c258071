"""Data-governance audits: functional-dependency discovery and
l-diversity (SURVEY §2.11 DQ tier widening, §7.7 extension surface).

- ``functional_dependency_audit`` — checks a candidate list of
  column-level functional dependencies (lhs -> rhs) across tables and
  reports, per candidate, how many lhs values violate it and the worst
  fan-out. FDs are the schema contracts MERGE/SCD pipelines silently
  assume (a dimension key mapping to two segment values corrupts every
  downstream join); the audit is the check a warehouse runs before
  trusting a new feed. Complements ``referential_integrity_audit``
  (cross-table keys) with intra-table value dependencies.
- ``ldiversity_audit`` — the companion to ``kanonymity_audit`` on the
  SAME (nation, segment) quasi-identifier: k-anonymity bounds cell
  size, l-diversity bounds what a cell reveals — a cell where every
  member shares one sensitive value (here: the customer's modal order
  priority) leaks it even when the cell is large. Reports distinct
  sensitive values per cell and whether the cell meets l >= 3.
- ``tcloseness_audit`` — completes the release-gate trio: l-diversity
  counts distinct sensitive values, t-closeness bounds how far a
  cell's sensitive DISTRIBUTION drifts from the global one (a cell
  with 3 distinct priorities at 98/1/1% still leaks). Earth-mover's
  distance over the ordered priority domain, computed on exact
  ppm-quantized cumulative distributions so both engines agree
  bit-for-bit (no float accumulation anywhere).

Scale posture: every audit is one map-side-combinable grouped
aggregate per candidate (or per cell) — COUNT DISTINCT over the
grouped frame, no joins against facts except the one dimension join
each needs. The candidate list is config; the plan shape is invariant
in it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecom_churn_lakehouse_spark.registry import register
from ecom_churn_lakehouse_spark.sources import load_table

# --------------------------------------------------------------------------
# Functional-dependency audit.
# --------------------------------------------------------------------------

#: (table, lhs, rhs) candidates: a mix of schema-guaranteed FDs (key ->
#: attribute — must hold), and plausible-but-false ones a profiler
#: would surface for human review.
_FD_CANDIDATES = [
    ("nation", "n_nationkey", "n_regionkey"),
    ("part", "p_partkey", "p_name"),
    ("part", "p_brand", "p_type"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("orders", "o_custkey", "o_orderpriority"),
]

_FD_SQL = "\nUNION ALL\n".join(
    f"""
SELECT '{t}' AS table_name, '{lhs}' AS lhs, '{rhs}' AS rhs,
       CAST(COUNT(*) AS BIGINT) AS n_lhs_values,
       CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violating_lhs,
       CAST(MAX(n_rhs) AS BIGINT) AS max_rhs_fanout,
       MAX(n_rhs) = 1 AS fd_holds
FROM (
    SELECT {lhs}, COUNT(DISTINCT {rhs}) AS n_rhs
    FROM {t} GROUP BY {lhs}
)"""
    for t, lhs, rhs in _FD_CANDIDATES
)


@register(
    "functional_dependency_audit",
    _FD_SQL,
    doc="Functional-dependency audit over a candidate (lhs -> rhs) "
    "list: per candidate, the number of lhs values mapping to more "
    "than one rhs and the worst fan-out. Key->attribute candidates "
    "must hold (schema contract); the plausible-but-false ones are "
    "what a profiler flags for review. One COUNT-DISTINCT aggregate "
    "per candidate, map-side combinable, unioned.",
)
def q_functional_dependency_audit(spark, sf_dir):
    out = None
    for t, lhs, rhs in _FD_CANDIDATES:
        df = (
            load_table(spark, sf_dir, t)
            .groupBy(lhs)
            .agg(F.count_distinct(rhs).alias("n_rhs"))
            .agg(
                F.count("*").cast("long").alias("n_lhs_values"),
                F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_violating_lhs"),
                F.max("n_rhs").cast("long").alias("max_rhs_fanout"),
                (F.max("n_rhs") == 1).alias("fd_holds"),
            )
            .select(
                F.lit(t).alias("table_name"),
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                "n_lhs_values",
                "n_violating_lhs",
                "max_rhs_fanout",
                "fd_holds",
            )
        )
        out = df if out is None else out.unionByName(df)
    return out


# --------------------------------------------------------------------------
# l-diversity audit.
# --------------------------------------------------------------------------

_L_DIVERSITY = 3

_LDIV_SQL = f"""
WITH modal AS (
    SELECT o_custkey,
           MAX({{'n': cnt, 'inv_p': p}}).inv_p AS modal_priority
    FROM (
        SELECT o_custkey, o_orderpriority AS p, COUNT(*) AS cnt
        FROM orders GROUP BY o_custkey, o_orderpriority
    ) GROUP BY o_custkey
),
released AS (
    SELECT n.n_name AS nation, c.c_mktsegment AS segment,
           m.modal_priority
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN modal m ON m.o_custkey = c.c_custkey
)
SELECT nation, segment,
       CAST(COUNT(*) AS BIGINT) AS cell_rows,
       CAST(COUNT(DISTINCT modal_priority) AS BIGINT)
           AS distinct_sensitive,
       COUNT(DISTINCT modal_priority) >= {_L_DIVERSITY} AS meets_l
FROM released
GROUP BY nation, segment
"""


@register(
    "ldiversity_audit",
    _LDIV_SQL,
    doc=f"l-diversity (l={_L_DIVERSITY}) over the same (nation, "
    "segment) quasi-identifier kanonymity_audit bounds: each cell's "
    "distinct count of the sensitive attribute (the customer's modal "
    "order priority, lexicographic tie-break). A large cell with one "
    "sensitive value leaks it despite meeting k — the two audits "
    "gate a release together. Modal priority is a per-customer argmax "
    "(struct-MAX, no window), then one grouped COUNT DISTINCT.",
)
def q_ldiversity_audit(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    modal = (
        orders.groupBy("o_custkey", "o_orderpriority")
        .agg(F.count("*").alias("cnt"))
        .groupBy("o_custkey")
        .agg(
            F.max(
                F.struct(F.col("cnt").alias("n"), F.col("o_orderpriority").alias("inv_p"))
            )["inv_p"].alias("modal_priority")
        )
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    released = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(modal, cust.c_custkey == modal.o_custkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            "modal_priority",
        )
    )
    return released.groupBy("nation", "segment").agg(
        F.count("*").cast("long").alias("cell_rows"),
        F.count_distinct("modal_priority").cast("long").alias("distinct_sensitive"),
        (F.count_distinct("modal_priority") >= _L_DIVERSITY).alias("meets_l"),
    )


# --------------------------------------------------------------------------
# t-closeness audit.
# --------------------------------------------------------------------------

#: Release gate: a cell passes when EMD(cell, global) <= 0.35.
_T_PPM = 350_000

_TCLOSE_SQL = f"""
WITH modal AS (
    SELECT o_custkey,
           MAX({{'n': cnt, 'inv_p': p}}).inv_p AS modal_priority
    FROM (
        SELECT o_custkey, o_orderpriority AS p, COUNT(*) AS cnt
        FROM orders GROUP BY o_custkey, o_orderpriority
    ) GROUP BY o_custkey
),
released AS (
    SELECT n.n_name AS nation, c.c_mktsegment AS segment,
           m.modal_priority
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN modal m ON m.o_custkey = c.c_custkey
),
gdist AS (
    SELECT modal_priority AS p,
           SUM(COUNT(*)) OVER (ORDER BY modal_priority) AS g_cum,
           SUM(COUNT(*)) OVER () AS n_total
    FROM released GROUP BY modal_priority
),
grid AS (
    SELECT cells.nation, cells.segment, dom.p
    FROM (SELECT DISTINCT nation, segment FROM released) cells
    CROSS JOIN (SELECT DISTINCT modal_priority AS p FROM released) dom
),
cell_counts AS (
    SELECT nation, segment, modal_priority AS p, COUNT(*) AS cnt
    FROM released GROUP BY nation, segment, modal_priority
),
cum AS (
    SELECT g.nation, g.segment, g.p,
           SUM(COALESCE(c.cnt, 0))
               OVER (PARTITION BY g.nation, g.segment ORDER BY g.p) AS c_cum,
           SUM(COALESCE(c.cnt, 0))
               OVER (PARTITION BY g.nation, g.segment) AS n_cell
    FROM grid g
    LEFT JOIN cell_counts c
      ON c.nation = g.nation AND c.segment = g.segment AND c.p = g.p
)
SELECT cum.nation, cum.segment,
       CAST(MAX(cum.n_cell) AS BIGINT) AS cell_rows,
       CAST(SUM(ABS(cum.c_cum * 1000000 // cum.n_cell
                    - gdist.g_cum * 1000000 // gdist.n_total))
            // 4 AS BIGINT) AS emd_ppm,
       SUM(ABS(cum.c_cum * 1000000 // cum.n_cell
               - gdist.g_cum * 1000000 // gdist.n_total)) // 4
           <= {_T_PPM} AS meets_t
FROM cum JOIN gdist ON gdist.p = cum.p
GROUP BY cum.nation, cum.segment
"""


@register(
    "tcloseness_audit",
    _TCLOSE_SQL,
    doc=f"t-closeness (t={_T_PPM / 1e6}) over the (nation, segment) "
    "quasi-identifier: earth-mover's distance between each cell's "
    "distribution of the sensitive attribute (modal order priority, "
    "ordered domain) and the global distribution, as the mean absolute "
    "gap of ppm-quantized cumulative distributions. Completes the "
    "k-anonymity / l-diversity / t-closeness release-gate trio. All "
    "arithmetic is exact integer ppm (floor-quantized CDFs) so the "
    "oracle matches bit-for-bit; the sensitive domain is 5 values so "
    "every window runs on a cells-x-5 frame, never on facts.",
)
def q_tcloseness_audit(spark, sf_dir):
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    modal = (
        orders.groupBy("o_custkey", "o_orderpriority")
        .agg(F.count("*").alias("cnt"))
        .groupBy("o_custkey")
        .agg(
            F.max(
                F.struct(F.col("cnt").alias("n"), F.col("o_orderpriority").alias("inv_p"))
            )["inv_p"].alias("modal_priority")
        )
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    released = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(modal, cust.c_custkey == modal.o_custkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            "modal_priority",
        )
    )
    # Global cumulative distribution: |domain| rows, broadcast to the grid.
    glob = (
        released.groupBy(F.col("modal_priority").alias("p"))
        .agg(F.count("*").alias("gcnt"))
        .select(
            "p",
            F.sum("gcnt").over(Window.orderBy("p")).alias("g_cum"),
            F.sum("gcnt").over(Window.partitionBy()).alias("n_total"),
        )
    )
    cells = released.select("nation", "segment").distinct()
    dom = released.select(F.col("modal_priority").alias("p")).distinct()
    grid = cells.crossJoin(F.broadcast(dom))
    cell_counts = released.groupBy(
        "nation", "segment", F.col("modal_priority").alias("p")
    ).agg(F.count("*").alias("cnt"))
    w_cum = Window.partitionBy("nation", "segment").orderBy("p")
    w_cell = Window.partitionBy("nation", "segment")
    cum = (
        grid.join(cell_counts, ["nation", "segment", "p"], "left")
        .select(
            "nation",
            "segment",
            "p",
            F.sum(F.coalesce(F.col("cnt"), F.lit(0))).over(w_cum).alias("c_cum"),
            F.sum(F.coalesce(F.col("cnt"), F.lit(0))).over(w_cell).alias("n_cell"),
        )
    )
    joined = cum.join(F.broadcast(glob), "p")
    return joined.groupBy("nation", "segment").agg(
        F.max("n_cell").cast("long").alias("cell_rows"),
        F.expr(
            "CAST(SUM(ABS(c_cum * 1000000 DIV n_cell - g_cum * 1000000 DIV n_total)) DIV 4 AS BIGINT)"
        ).alias("emd_ppm"),
        (
            F.expr(
                "SUM(ABS(c_cum * 1000000 DIV n_cell - g_cum * 1000000 DIV n_total)) DIV 4"
            )
            <= F.lit(_T_PPM)
        ).alias("meets_t"),
    )


# ------------------------------------- k-anonymity generalization ladder

_KANON_K = 3

_KANON_SQL = f"""
WITH lvl0 AS (
    SELECT 0 AS level,
           CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment || '|'
               || CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                       // 100000 AS VARCHAR) AS qid
    FROM customer
),
lvl1 AS (
    SELECT 1 AS level,
           CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment AS qid
    FROM customer
),
lvl2 AS (
    SELECT 2 AS level,
           CAST(n.n_regionkey AS VARCHAR) || '|' || c.c_mktsegment AS qid
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
),
lvl3 AS (
    SELECT 3 AS level, c_mktsegment AS qid FROM customer
),
all_lvls AS (
    SELECT * FROM lvl0 UNION ALL SELECT * FROM lvl1
    UNION ALL SELECT * FROM lvl2 UNION ALL SELECT * FROM lvl3
),
groups AS (
    SELECT level, qid, CAST(COUNT(*) AS BIGINT) AS sz
    FROM all_lvls GROUP BY level, qid
)
SELECT CAST(level AS INTEGER) AS level,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(MIN(sz) AS BIGINT) AS min_group_size,
       CAST(SUM(CASE WHEN sz < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
           AS violating_groups,
       CAST(SUM(CASE WHEN sz < {_KANON_K} THEN sz ELSE 0 END) * 1000000
            // SUM(sz) AS BIGINT) AS suppressed_ppm,
       MIN(sz) >= {_KANON_K} AS satisfies_k
FROM groups
GROUP BY level
ORDER BY level
"""


@register(
    "kanon_generalization_ladder",
    _KANON_SQL,
    doc=f"k-anonymity generalization ladder (k={_KANON_K}): the same "
    "customer quasi-identifier evaluated at four generalization "
    "levels — (nation, segment, account-balance band), (nation, "
    "segment), (region, segment), (segment) — each scored by its "
    "smallest equivalence class, violating-group count, and the "
    "record share that suppression-based k-anonymity would delete "
    "(exact ppm, non-negative DIV). The release decision is the "
    "FIRST level with satisfies_k — the generalize-vs-suppress "
    "tradeoff every governed data release walks, one level up from "
    "the point checks ldiversity_audit / tcloseness_audit run at a "
    "fixed grain. Scale: four map-combinable aggs over the dim "
    "(grouped on the qid), then a |groups|-frame fold; the balance "
    "band is the canonical cents quantization so the band edge is "
    "bit-stable cross-engine.",
)
def q_kanon_generalization_ladder(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    band = F.expr(
        "CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"
        " DIV 100000 AS STRING)"
    )
    lvl0 = cust.select(
        F.lit(0).alias("level"),
        F.concat_ws(
            "|", F.col("c_nationkey").cast("string"), "c_mktsegment", band
        ).alias("qid"),
    )
    lvl1 = cust.select(
        F.lit(1).alias("level"),
        F.concat_ws(
            "|", F.col("c_nationkey").cast("string"), "c_mktsegment"
        ).alias("qid"),
    )
    lvl2 = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select(
        F.lit(2).alias("level"),
        F.concat_ws(
            "|", F.col("n_regionkey").cast("string"), "c_mktsegment"
        ).alias("qid"),
    )
    lvl3 = cust.select(
        F.lit(3).alias("level"), F.col("c_mktsegment").alias("qid")
    )
    groups = (
        lvl0.unionByName(lvl1)
        .unionByName(lvl2)
        .unionByName(lvl3)
        .groupBy("level", "qid")
        .agg(F.count("*").cast("long").alias("sz"))
    )
    k = _KANON_K
    return (
        groups.groupBy("level")
        .agg(
            F.count("*").cast("long").alias("n_groups"),
            F.min("sz").cast("long").alias("min_group_size"),
            F.sum(F.when(F.col("sz") < k, 1).otherwise(0))
            .cast("long")
            .alias("violating_groups"),
            F.expr(
                f"CAST(SUM(CASE WHEN sz < {k} THEN sz ELSE 0 END) * 1000000"
                " DIV SUM(sz) AS BIGINT)"
            ).alias("suppressed_ppm"),
            (F.min("sz") >= k).alias("satisfies_k"),
        )
        .select(
            F.col("level").cast("int").alias("level"),
            "n_groups",
            "min_group_size",
            "violating_groups",
            "suppressed_ppm",
            "satisfies_k",
        )
        .orderBy("level")
    )


# ------------------------------------------- local-DP randomized response

#: Lie with probability 1/4 (hb1 == 0 of 4); a liar reports a uniform
#: nation (hb2 of 25, which may coincide with the truth — the classic
#: "uniform over ALL K" variant, so the debias closed form is exact).
#: Debiased estimate: E[obs_j] = n/(4K) + (3/4)*true_j  =>
#: est_j = (4K*obs_j - n)/(3K) = (100*obs_j - n)/75 for K=25.
_RR_EST_MILLI = (
    "CASE WHEN (100 * reported_cnt - n) >= 0"
    " THEN ((100 * reported_cnt - n) * 1000) {div} 75"
    " ELSE -((-(100 * reported_cnt - n) * 1000) {div} 75)"
    "      - (CASE WHEN (-(100 * reported_cnt - n) * 1000) % 75 > 0"
    "              THEN 1 ELSE 0 END)"
    " END"
)


def _rr_sql() -> str:
    from ecom_churn_lakehouse_spark.operators.sampling import hash_bucket_sql

    hb1 = hash_bucket_sql("c_custkey", "rr1:", 4)
    hb2 = hash_bucket_sql("c_custkey", "rr2:", 25)
    est = _RR_EST_MILLI.format(div="//")
    return f"""
WITH reported AS (
    SELECT c_custkey,
           CAST(c_nationkey AS BIGINT) AS true_nation,
           CAST(CASE WHEN {hb1} = 0 THEN {hb2}
                     ELSE c_nationkey END AS BIGINT) AS reported_nation
    FROM customer
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM reported),
true_c AS (
    SELECT true_nation AS nation_key, CAST(COUNT(*) AS BIGINT) AS true_cnt
    FROM reported GROUP BY true_nation
),
rep_c AS (
    SELECT reported_nation AS nation_key, CAST(COUNT(*) AS BIGINT) AS reported_cnt
    FROM reported GROUP BY reported_nation
),
joined AS (
    SELECT CAST(nt.n_nationkey AS BIGINT) AS nation_key,
           COALESCE(t.true_cnt, 0) AS true_cnt,
           COALESCE(r.reported_cnt, 0) AS reported_cnt,
           (SELECT n FROM tot) AS n
    FROM nation nt
    LEFT JOIN true_c t ON t.nation_key = nt.n_nationkey
    LEFT JOIN rep_c r ON r.nation_key = nt.n_nationkey
)
SELECT nation_key, true_cnt, reported_cnt,
       CAST({est} AS BIGINT) AS est_milli,
       CAST(abs(CAST({est} AS BIGINT) - true_cnt * 1000) AS BIGINT)
           AS abs_err_milli
FROM joined
"""


@register(
    "randomized_response_privacy",
    _rr_sql(),
    doc="Local differential privacy by randomized response: each "
    "customer reports their true nation with probability 3/4, else a "
    "uniform nation (eps = ln(76) ~ 4.33 per the RR closed form), and "
    "the curator debiases the reported histogram back to an unbiased "
    "estimate est_j = (4K*obs_j - n)/(3K) — the mechanism behind "
    "every privacy-preserving telemetry count. Both the coin and the "
    "lie value come from the shared md5 bucket idiom, so the oracle "
    "reproduces the noise bit-for-bit; the estimate is pure int64 "
    "milli with the explicit-sign floor-division CASE (negative "
    "numerators appear for under-reported nations — theil_sen's "
    "idiom). The nation dimension is the join spine so empty nations "
    "still get a row. Scale: two scan-local hashes, two "
    "map-combinable groupBys on a 25-value key, one broadcast spine "
    "join — no window, no fact shuffle; 100*obs stays under int64 to "
    "~9e16 customers.",
)
def q_randomized_response_privacy(spark, sf_dir):
    from ecom_churn_lakehouse_spark.operators.sampling import hash_bucket

    cust = load_table(spark, sf_dir, "customer")
    reported = cust.select(
        F.col("c_nationkey").cast("long").alias("true_nation"),
        F.when(
            hash_bucket(F.col("c_custkey"), "rr1:", mod=4) == 0,
            hash_bucket(F.col("c_custkey"), "rr2:", mod=25),
        )
        .otherwise(F.col("c_nationkey"))
        .cast("long")
        .alias("reported_nation"),
    )
    tot = reported.agg(F.count("*").cast("long").alias("n"))
    true_c = reported.groupBy(F.col("true_nation").alias("nation_key")).agg(
        F.count("*").cast("long").alias("true_cnt")
    )
    rep_c = reported.groupBy(F.col("reported_nation").alias("nation_key")).agg(
        F.count("*").cast("long").alias("reported_cnt")
    )
    spine = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("nation_key")
    )
    joined = (
        spine.join(F.broadcast(true_c), "nation_key", "left")
        .join(F.broadcast(rep_c), "nation_key", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "nation_key",
            F.coalesce("true_cnt", F.lit(0)).cast("long").alias("true_cnt"),
            F.coalesce("reported_cnt", F.lit(0)).cast("long").alias("reported_cnt"),
            "n",
        )
    )
    est = _RR_EST_MILLI.format(div="DIV")
    return joined.select(
        "nation_key",
        "true_cnt",
        "reported_cnt",
        F.expr(est).cast("long").alias("est_milli"),
        F.expr(f"CAST(abs(CAST({est} AS BIGINT) - true_cnt * 1000) AS BIGINT)").alias(
            "abs_err_milli"
        ),
    )


# ---------------------------------------------------------------------------
# Round 9 fourth wave: differential-privacy release budget advisor.
# ---------------------------------------------------------------------------

#: (eps_milli, Laplace scale b = 1/eps as an exact integer) grid —
#: rational epsilons only, so the mechanism calibration stays integer.
_DP_EPS_GRID = [(100, 10), (500, 2), (1000, 1)]

#: Count-release threshold tau = 1 + ceil(b * ln(1/(2*delta))) for
#: (eps, delta)-thresholding of small counts (the Google/Wilson 2020
#: "differentially private SQL" partition-selection bound shape),
#: delta = 1e-6. ln(1/(2e-6)) = ln(500000) is precomputed HERE in
#: Python and inlined as an integer micro literal, so neither engine
#: ever evaluates a transcendental: tau = 1 + ceil(b * 13.122363...)
#: = 1 + (b * 13122364 + 999999) // 1000000 in exact int64.
_DP_LN_MICRO = 13_122_364  # ceil(ln(500000) * 1e6)

_DP_ROWS = ", ".join(f"({e}, {b})" for e, b in _DP_EPS_GRID)

_DP_SQL = f"""
WITH seg AS (
    SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n
    FROM customer GROUP BY c_mktsegment
),
grid(eps_milli, scale_b) AS (VALUES {_DP_ROWS})
SELECT s.segment, s.n,
       CAST(g.eps_milli AS BIGINT) AS eps_milli,
       CAST(g.scale_b AS BIGINT) AS scale_b,
       CAST(g.scale_b * 1000000 // s.n AS BIGINT) AS rel_err_ppm,
       CAST(s.n // g.scale_b AS BIGINT) AS snr,
       CAST(1 + (g.scale_b * {_DP_LN_MICRO} + 999999) // 1000000 AS BIGINT)
           AS tau_threshold,
       (s.n > 1 + (g.scale_b * {_DP_LN_MICRO} + 999999) // 1000000)
           AS passes_threshold,
       (g.scale_b * 1000000 <= 10000 * s.n) AS publishable_1pct
FROM seg s CROSS JOIN grid g
ORDER BY s.segment, eps_milli
"""


@register(
    "dp_laplace_release_advisor",
    _DP_SQL,
    doc="Differential-privacy release advisor for the per-segment "
    "customer histogram: for each segment count and each rational "
    "epsilon in {0.1, 0.5, 1.0}, emit the Laplace mechanism's "
    "calibration (scale b = sensitivity/eps = 1/eps, an exact "
    "integer for rational eps), the expected relative error in "
    "exact ppm (E|Laplace(b)| = b), the signal-to-noise ratio, the "
    "(eps, delta=1e-6) small-count release threshold tau = 1 + "
    "ceil(b*ln(1/(2 delta))) (the partition-selection bound of "
    "Wilson et al. 2020, 'Differentially Private SQL'), and the "
    "publish verdicts — the table a governance reviewer reads to "
    "pick the cheapest epsilon that still clears utility. The one "
    "transcendental (ln of a delta literal) is precomputed in the "
    "query TEXT as an integer micro constant, so both engines run "
    "pure int64 arithmetic: bit-exact by construction, and the "
    "advisor composes with the k-anonymity/t-closeness ladder as "
    "the formal-privacy rung. Scale: one scan-local count group-by "
    "to a 5-row frame crossed with a 3-row literal grid.",
)
def q_dp_laplace_release_advisor(spark, sf_dir):
    seg = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    grid = seg.sparkSession.createDataFrame(
        _DP_EPS_GRID, "eps_milli INT, scale_b INT"
    )
    tau = F.expr(f"1 + (scale_b * {_DP_LN_MICRO} + 999999) DIV 1000000")
    return (
        seg.crossJoin(F.broadcast(grid))
        .select(
            "segment",
            "n",
            F.col("eps_milli").cast("long"),
            F.col("scale_b").cast("long"),
            F.expr("scale_b * 1000000 DIV n").cast("long").alias(
                "rel_err_ppm"
            ),
            F.expr("n DIV scale_b").cast("long").alias("snr"),
            tau.cast("long").alias("tau_threshold"),
            (F.col("n") > tau).alias("passes_threshold"),
            (F.col("scale_b") * 1_000_000 <= 10_000 * F.col("n")).alias(
                "publishable_1pct"
            ),
        )
        .orderBy("segment", "eps_milli")
    )
