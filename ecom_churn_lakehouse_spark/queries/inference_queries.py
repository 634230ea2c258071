"""Statistical-inference operators: independence testing, resampled
uncertainty, and exact variance components (SURVEY §7.7 extension
surface — the significance checks an experimentation/curation team
runs on warehouse aggregates).

- ``promo_chisq_independence`` — Pearson chi-square contingency audit
  between line return flag and promo part status. The per-cell
  contributions are what an analyst reads (which cell drives the
  dependence); quantized to exact micro units so both engines agree
  bit-for-bit despite the float division.
- ``bootstrap_mean_ci`` — deterministic multiplier bootstrap of the
  mean order value: B=32 replicas, each row's replica weight drawn
  from the shared md5 idiom (mod 3, mean 1). Replica means are exact
  integer (cents + micro remainder), ranked so the 2.5%/97.5% ends
  read off as rank 1 / rank B. Resampling-as-projection: no shuffle
  of the fact is keyed on randomness, so the plan is one explode +
  one grouped agg at any scale.
- ``acctbal_variance_components`` — per-nation exact population
  variance NUMERATOR (n*Σx² − (Σx)²) carried in DECIMAL(38,0) cents²
  and SURFACED AS VARCHAR (DuckDB materializes any DECIMAL output as
  pandas float64, so exact wide integers must cross the driver-hash
  boundary as strings). Signed values stay sums (never divided) so
  truncation-direction divergence cannot arise.

Scale posture: chi-square reduces the fact to a 6-row contingency
frame before any window; the bootstrap is a B-way explode with
map-side-combinable aggregation (output is exactly B rows); the
variance components are one map-combinable grouped aggregate.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ecom_churn_lakehouse_spark.operators.sampling import hash_bucket, hash_bucket_sql
from ecom_churn_lakehouse_spark.registry import register
from ecom_churn_lakehouse_spark.sources import load_table

# --------------------------------------------------------------------------
# Chi-square independence: return flag x promo status.
# --------------------------------------------------------------------------

#: The float part of the chi-square must be evaluated with IDENTICAL
#: association order in both engines — one shared expression text,
#: floor-quantized to micro units (the sanctioned double quantizer).
_EXPECTED_MICRO = (
    "CAST(FLOOR(CAST(r_tot AS DOUBLE) * CAST(c_tot AS DOUBLE) "
    "/ CAST(n_tot AS DOUBLE) * 1000000.0) AS BIGINT)"
)
_CHI2_MICRO = (
    "CAST(FLOOR("
    "(CAST(observed AS DOUBLE) - CAST(r_tot AS DOUBLE) * CAST(c_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))"
    " * "
    "(CAST(observed AS DOUBLE) - CAST(r_tot AS DOUBLE) * CAST(c_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))"
    " / (CAST(r_tot AS DOUBLE) * CAST(c_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))"
    " * 1000000.0) AS BIGINT)"
)

_CHISQ_SQL = f"""
WITH cells AS (
    SELECT l.l_returnflag AS returnflag,
           p.p_type LIKE 'PROMO%' AS is_promo,
           CAST(COUNT(*) AS BIGINT) AS observed
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY 1, 2
),
tot AS (
    SELECT returnflag, is_promo, observed,
           CAST(SUM(observed) OVER (PARTITION BY returnflag) AS BIGINT) AS r_tot,
           CAST(SUM(observed) OVER (PARTITION BY is_promo) AS BIGINT) AS c_tot,
           CAST(SUM(observed) OVER () AS BIGINT) AS n_tot
    FROM cells
)
SELECT returnflag, is_promo, observed,
       {_EXPECTED_MICRO} AS expected_micro,
       {_CHI2_MICRO} AS chi2_contrib_micro
FROM tot
"""


@register(
    "promo_chisq_independence",
    _CHISQ_SQL,
    doc="Pearson chi-square contingency audit: is line return status "
    "independent of whether the part was on promo? Emits the 3x2 "
    "contingency table with expected counts and per-cell chi-square "
    "contributions in exact micro units (floor-quantized IEEE doubles "
    "evaluated with one shared expression text on both engines). The "
    "fact joins the dimension once, reduces to 6 rows, and every "
    "window runs on the 6-row frame — contingency testing at 100 TB "
    "costs one fact scan.",
)
def q_promo_chisq_independence(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_type").like("PROMO%").alias("is_promo")
    )
    cells = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.col("l_returnflag").alias("returnflag"), "is_promo")
        .agg(F.count("*").cast("long").alias("observed"))
    )
    tot = cells.select(
        "returnflag",
        "is_promo",
        "observed",
        F.sum("observed").over(Window.partitionBy("returnflag")).cast("long").alias("r_tot"),
        F.sum("observed").over(Window.partitionBy("is_promo")).cast("long").alias("c_tot"),
        F.sum("observed").over(Window.partitionBy()).cast("long").alias("n_tot"),
    )
    return tot.select(
        "returnflag",
        "is_promo",
        "observed",
        F.expr(_EXPECTED_MICRO).alias("expected_micro"),
        F.expr(_CHI2_MICRO).alias("chi2_contrib_micro"),
    )


# --------------------------------------------------------------------------
# Deterministic multiplier bootstrap of the mean order value.
# --------------------------------------------------------------------------

_B = 32

_BOOT_KEY_SQL = "(CAST(o_orderkey AS VARCHAR) || ':' || CAST(b AS VARCHAR))"

_BOOT_SQL = f"""
WITH weighted AS (
    SELECT t.b,
           {hash_bucket_sql(_BOOT_KEY_SQL, "boot:", 3)} AS w,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
    FROM orders CROSS JOIN (SELECT UNNEST(range(0, {_B})) AS b) t
),
rep AS (
    SELECT CAST(b AS INTEGER) AS replica_id,
           CAST(SUM(w) AS BIGINT) AS n_eff,
           CAST(SUM(w * cents) AS BIGINT) AS spend_sum_cents
    FROM weighted GROUP BY b
),
stats AS (
    SELECT replica_id, n_eff, spend_sum_cents,
           spend_sum_cents // n_eff AS mean_cents_int,
           ((spend_sum_cents % n_eff) * 1000000) // n_eff AS mean_frac_micro
    FROM rep
)
SELECT replica_id, n_eff, spend_sum_cents,
       CAST(mean_cents_int AS BIGINT) AS mean_cents_int,
       CAST(mean_frac_micro AS BIGINT) AS mean_frac_micro,
       CAST(RANK() OVER (ORDER BY mean_cents_int, mean_frac_micro, replica_id)
            AS INTEGER) AS mean_rank,
       CASE RANK() OVER (ORDER BY mean_cents_int, mean_frac_micro, replica_id)
            WHEN 1 THEN 'lo' WHEN {_B} THEN 'hi' ELSE 'mid' END AS ci_role
FROM stats
"""


@register(
    "bootstrap_mean_ci",
    _BOOT_SQL,
    doc=f"Deterministic multiplier bootstrap (B={_B}) of the mean "
    "order value: each (order, replica) draws an integer weight in "
    "{0,1,2} (mean 1) from the shared md5 idiom, so every engine and "
    "every rerun sees the same resample. Replica means are exact "
    "integers (cents + micro remainder via non-negative DIV/mod), "
    "ranked so the extreme replicas read as the CI ends. The plan is "
    "one B-way explode + one map-side-combinable agg to B rows; "
    "windows run on the B-row frame only.",
)
def q_bootstrap_mean_ci(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").alias("cents")
    )
    weighted = orders.select(
        F.explode(F.sequence(F.lit(0), F.lit(_B - 1))).alias("b"),
        "o_orderkey",
        "cents",
    ).select(
        "b",
        hash_bucket(
            F.concat(
                F.col("o_orderkey").cast("string"), F.lit(":"), F.col("b").cast("string")
            ),
            "boot:",
            mod=3,
        ).alias("w"),
        "cents",
    )
    rep = weighted.groupBy("b").agg(
        F.sum("w").cast("long").alias("n_eff"),
        F.sum(F.col("w") * F.col("cents")).cast("long").alias("spend_sum_cents"),
    )
    stats = rep.select(
        F.col("b").cast("int").alias("replica_id"),
        "n_eff",
        "spend_sum_cents",
        F.expr("spend_sum_cents DIV n_eff").alias("mean_cents_int"),
        F.expr("((spend_sum_cents % n_eff) * 1000000) DIV n_eff").alias("mean_frac_micro"),
    )
    w = Window.orderBy("mean_cents_int", "mean_frac_micro", "replica_id")
    ranked = stats.withColumn("mean_rank", F.rank().over(w).cast("int"))
    return ranked.select(
        "replica_id",
        "n_eff",
        "spend_sum_cents",
        F.col("mean_cents_int").cast("long").alias("mean_cents_int"),
        F.col("mean_frac_micro").cast("long").alias("mean_frac_micro"),
        "mean_rank",
        F.when(F.col("mean_rank") == 1, "lo")
        .when(F.col("mean_rank") == _B, "hi")
        .otherwise("mid")
        .alias("ci_role"),
    )


# --------------------------------------------------------------------------
# Exact variance components (signed-safe: sums only, no division).
# --------------------------------------------------------------------------

_VAR_SQL = """
WITH comp AS (
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents,
           CAST(SUM(CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                         * CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                         AS DECIMAL(25,0)))
                AS DECIMAL(25,0)) AS sumsq_cents2
    FROM customer GROUP BY c_nationkey
)
SELECT n_name AS nation, n, sum_cents,
       CAST(CAST(sumsq_cents2 AS DECIMAL(38,0)) AS VARCHAR) AS sumsq_cents2,
       CAST(CAST(CAST(n AS DECIMAL(12,0)) * sumsq_cents2
                 - CAST(CAST(sum_cents AS DECIMAL(18,0))
                        * CAST(sum_cents AS DECIMAL(18,0)) AS DECIMAL(37,0))
                 AS DECIMAL(38,0)) AS VARCHAR) AS var_numer_cents2
FROM comp JOIN nation ON n_nationkey = c_nationkey
"""


@register(
    "acctbal_variance_components",
    _VAR_SQL,
    doc="Per-nation EXACT population-variance components of customer "
    "account balance in cents: n, signed sum, sum of squares, and the "
    "variance numerator n*SUMSQ - SUM^2 carried in DECIMAL(38,0) - no "
    "float accumulation, no division (acctbal is signed, and integer "
    "division direction diverges across engines on negatives, so the "
    "operator stops at the exact numerator). One map-side-combinable "
    "aggregate over the fact, then a broadcast dimension join on 25 "
    "rows. Exactness envelope: sumsq fits DECIMAL(25,0) up to ~1e12 "
    "rows per nation at cents scale, far past the 100 TB fixture "
    "shape.",
)
def q_acctbal_variance_components(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("long").alias("cents")
    )
    comp = cust.groupBy("c_nationkey").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sum_cents"),
        F.sum((F.col("cents") * F.col("cents")).cast("decimal(25,0)"))
        .cast("decimal(25,0)")
        .alias("sumsq_cents2"),
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return comp.join(F.broadcast(nation), comp.c_nationkey == nation.n_nationkey).select(
        F.col("n_name").alias("nation"),
        "n",
        "sum_cents",
        F.col("sumsq_cents2").cast("decimal(38,0)").cast("string").alias("sumsq_cents2"),
        (
            F.col("n").cast("decimal(12,0)") * F.col("sumsq_cents2")
            - (
                F.col("sum_cents").cast("decimal(18,0)")
                * F.col("sum_cents").cast("decimal(18,0)")
            ).cast("decimal(37,0)")
        )
        .cast("decimal(38,0)")
        .cast("string")
        .alias("var_numer_cents2"),
    )


# --------------------------------------------------------------------------
# Grouped OLS components: discount -> quantity elasticity per brand.
# --------------------------------------------------------------------------

#: Slope/intercept from exact integer component sums, quantized with
#: one shared IEEE expression text (the components are BIGINT-exact;
#: only the final ratio goes through double).
_SLOPE_MICRO = (
    "CAST(FLOOR((CAST(n AS DOUBLE) * CAST(sum_xy AS DOUBLE)"
    " - CAST(sum_x_bp AS DOUBLE) * CAST(sum_y AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(sum_xx AS DOUBLE)"
    " - CAST(sum_x_bp AS DOUBLE) * CAST(sum_x_bp AS DOUBLE))"
    " * 1000000.0) AS BIGINT)"
)

_OLS_SQL = f"""
WITH comp AS (
    SELECT p.p_brand AS brand,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(CAST(l.l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT))
                AS BIGINT) AS sum_x_bp,
           CAST(SUM(CAST(CAST(l.l_quantity AS DECIMAL(18,2)) AS BIGINT))
                AS BIGINT) AS sum_y,
           CAST(SUM(CAST(CAST(l.l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT)
                    * CAST(CAST(l.l_quantity AS DECIMAL(18,2)) AS BIGINT))
                AS BIGINT) AS sum_xy,
           CAST(SUM(CAST(CAST(l.l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT)
                    * CAST(CAST(l.l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT))
                AS BIGINT) AS sum_xx
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand
)
SELECT brand, n, sum_x_bp, sum_y, sum_xy, sum_xx,
       {_SLOPE_MICRO} AS slope_micro
FROM comp
"""


@register(
    "brand_discount_elasticity_components",
    _OLS_SQL,
    doc="Grouped OLS: per-brand discount(basis points) -> quantity "
    "regression from EXACT integer component sums (n, Σx, Σy, Σxy, "
    "Σxx as BIGINT; the only float is the final slope ratio, floor-"
    "quantized through one shared IEEE expression). The per-group-"
    "regression shape every feature-screening pass needs: one fact-"
    "dim join, one map-side-combinable aggregate per brand, no "
    "per-row Python anywhere. Component exactness envelope: Σxx at "
    "basis-point scale fits int64 to ~9e12 rows per brand.",
)
def q_brand_discount_elasticity_components(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.col("l_discount").cast("decimal(18,4)") * 10000)
        .cast("long")
        .alias("x_bp"),
        F.col("l_quantity").cast("decimal(18,2)").cast("long").alias("y"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    comp = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x_bp").cast("long").alias("sum_x_bp"),
            F.sum("y").cast("long").alias("sum_y"),
            F.sum(F.col("x_bp") * F.col("y")).cast("long").alias("sum_xy"),
            F.sum(F.col("x_bp") * F.col("x_bp")).cast("long").alias("sum_xx"),
        )
    )
    return comp.select(
        "brand",
        "n",
        "sum_x_bp",
        "sum_y",
        "sum_xy",
        "sum_xx",
        F.expr(_SLOPE_MICRO).alias("slope_micro"),
    )


# --------------------------------------------------------------------------
# Neyman allocation: optimal stratified-sample sizes.
# --------------------------------------------------------------------------

_NEYMAN_BUDGET = 10_000

_NEYMAN_SQL = f"""
WITH comp AS (
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS s1,
           CAST(SUM(CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                         * CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                         AS DECIMAL(25,0)))
                AS DECIMAL(25,0)) AS s2
    FROM customer GROUP BY c_nationkey
),
weights AS (
    SELECT c_nationkey, n,
           -- N_h * S_h = sqrt(n*SUMSQ - SUM^2) exactly (population S);
           -- the numerator is exact DECIMAL, the sqrt is the only
           -- float (correctly rounded), floor-quantized to milli
           CAST(FLOOR(sqrt(CAST(CAST(n AS DECIMAL(12,0)) * s2
                           - CAST(CAST(s1 AS DECIMAL(18,0))
                                  * CAST(s1 AS DECIMAL(18,0)) AS DECIMAL(37,0))
                           AS DOUBLE)) * 1000.0) AS BIGINT) AS w_milli
    FROM comp
),
tot AS (
    SELECT c_nationkey, n, w_milli,
           CAST(SUM(w_milli) OVER () AS BIGINT) AS w_total
    FROM weights
),
quota AS (
    SELECT c_nationkey, n, w_milli,
           {_NEYMAN_BUDGET} * w_milli // w_total AS floor_units,
           {_NEYMAN_BUDGET} * w_milli % w_total AS rem
    FROM tot
),
ranked AS (
    SELECT c_nationkey, n, w_milli, floor_units,
           RANK() OVER (ORDER BY rem DESC, c_nationkey) AS rem_rank,
           CAST({_NEYMAN_BUDGET} - SUM(floor_units) OVER () AS BIGINT) AS leftover
    FROM quota
)
SELECT nn.n_name AS nation, r.n AS n_rows, r.w_milli,
       CAST(r.floor_units
            + CASE WHEN r.rem_rank <= r.leftover THEN 1 ELSE 0 END
            AS BIGINT) AS alloc_n
FROM ranked r JOIN nation nn ON nn.n_nationkey = r.c_nationkey
"""


@register(
    "neyman_allocation",
    _NEYMAN_SQL,
    doc=f"Neyman-optimal stratified sampling design: allocate a "
    f"{_NEYMAN_BUDGET}-row sample budget across nation strata "
    "proportionally to N_h*S_h — which for population S equals "
    "sqrt(n*Σx²−(Σx)²) EXACTLY, so the whole design needs one "
    "correctly-rounded sqrt per stratum on top of exact integer "
    "components, then integer largest-remainder apportionment "
    "(floor quotas + remainder ranking) so allocations sum to the "
    "budget exactly. One map-combinable aggregate over the frame; "
    "all windows run on the 25-row stratum frame.",
)
def q_neyman_allocation(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    comp = cust.groupBy("c_nationkey").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s1"),
        F.sum((F.col("cents") * F.col("cents")).cast("decimal(25,0)"))
        .cast("decimal(25,0)")
        .alias("s2"),
    )
    numer = (
        F.col("n").cast("decimal(12,0)") * F.col("s2")
        - (F.col("s1").cast("decimal(18,0)") * F.col("s1").cast("decimal(18,0)")).cast(
            "decimal(37,0)"
        )
    )
    weights = comp.select(
        "c_nationkey",
        "n",
        F.floor(F.sqrt(numer.cast("double")) * 1000.0).cast("long").alias("w_milli"),
    )
    tot = weights.select(
        "c_nationkey",
        "n",
        "w_milli",
        F.sum("w_milli").over(Window.partitionBy()).cast("long").alias("w_total"),
    )
    quota = tot.select(
        "c_nationkey",
        "n",
        "w_milli",
        F.expr(f"{_NEYMAN_BUDGET} * w_milli DIV w_total").alias("floor_units"),
        F.expr(f"{_NEYMAN_BUDGET} * w_milli % w_total").alias("rem"),
    )
    ranked = quota.select(
        "c_nationkey",
        "n",
        "w_milli",
        "floor_units",
        F.rank().over(Window.orderBy(F.col("rem").desc(), "c_nationkey")).alias("rem_rank"),
        (F.lit(_NEYMAN_BUDGET) - F.sum("floor_units").over(Window.partitionBy()))
        .cast("long")
        .alias("leftover"),
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return ranked.join(F.broadcast(nation), ranked.c_nationkey == nation.n_nationkey).select(
        F.col("n_name").alias("nation"),
        F.col("n").alias("n_rows"),
        "w_milli",
        (
            F.col("floor_units")
            + F.when(F.col("rem_rank") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc_n"),
    )


# --------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov test.
# --------------------------------------------------------------------------

#: Final ratio and the alpha=0.05 critical value are the only floats;
#: both evaluate ONE shared IEEE expression over exact integers.
_KS_D_PPM = (
    "CAST(FLOOR(CAST(max_diff AS DOUBLE) "
    "/ (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) * 1000000.0) AS BIGINT)"
)
_KS_REJECT = (
    "CAST(max_diff AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))"
    " > 1.358 * sqrt((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))"
    " / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))"
)

_KS_SQL = f"""
WITH tagged AS (
    SELECT CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
           c.c_mktsegment = 'BUILDING' AS grp1
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
per_value AS (
    SELECT cents,
           SUM(CASE WHEN grp1 THEN 1 ELSE 0 END) AS c1,
           SUM(CASE WHEN grp1 THEN 0 ELSE 1 END) AS c2
    FROM tagged GROUP BY cents
),
cum AS (
    SELECT SUM(c1) OVER (ORDER BY cents) AS cum1,
           SUM(c2) OVER (ORDER BY cents) AS cum2,
           SUM(c1) OVER () AS n1,
           SUM(c2) OVER () AS n2
    FROM per_value
),
stat AS (
    SELECT CAST(MAX(ABS(CAST(cum1 AS DECIMAL(19,0)) * n2
                        - CAST(cum2 AS DECIMAL(19,0)) * n1))
                 AS DECIMAL(38,0)) AS max_diff_dec,
           CAST(MAX(n1) AS BIGINT) AS n1,
           CAST(MAX(n2) AS BIGINT) AS n2
    FROM cum
)
SELECT n1, n2,
       CAST(max_diff_dec AS VARCHAR) AS max_diff_exact,
       {_KS_D_PPM.replace("max_diff", "max_diff_dec")} AS d_ppm,
       {_KS_REJECT.replace("max_diff", "max_diff_dec")} AS reject_at_05
FROM stat
"""


@register(
    "spend_ks_test",
    _KS_SQL,
    doc="Two-sample Kolmogorov-Smirnov test: does the BUILDING "
    "segment's order-value distribution differ from everyone else's? "
    "D = max |CDF1 - CDF2| computed on cross-multiplied EXACT integer "
    "cumulative counts (|cum1*n2 - cum2*n1|, DECIMAL-wide, surfaced "
    "as VARCHAR), so the supremum is found without a single float "
    "comparison; only the final ppm ratio and the 1.358*sqrt critical "
    "value are IEEE doubles from one shared expression. The fact "
    "reduces to the distinct-value grain before the cumulative "
    "windows — at 100 TB the prefix-sum frame is |distinct cents|, "
    "range-partitionable like the deciles pattern.",
)
def q_spend_ks_test(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", (F.col("c_mktsegment") == "BUILDING").alias("grp1")
    )
    tagged = orders.join(cust, orders.o_custkey == cust.c_custkey).select("cents", "grp1")
    per_value = tagged.groupBy("cents").agg(
        F.sum(F.when(F.col("grp1"), 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("grp1"), 0).otherwise(1)).alias("c2"),
    )
    w_cum = Window.orderBy("cents")
    w_all = Window.partitionBy()
    cum = per_value.select(
        F.sum("c1").over(w_cum).alias("cum1"),
        F.sum("c2").over(w_cum).alias("cum2"),
        F.sum("c1").over(w_all).alias("n1"),
        F.sum("c2").over(w_all).alias("n2"),
    )
    stat = cum.agg(
        F.max(
            F.abs(
                F.col("cum1").cast("decimal(19,0)") * F.col("n2")
                - F.col("cum2").cast("decimal(19,0)") * F.col("n1")
            )
        )
        .cast("decimal(38,0)")
        .alias("max_diff_dec"),
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
    )
    return stat.select(
        "n1",
        "n2",
        F.col("max_diff_dec").cast("string").alias("max_diff_exact"),
        F.expr(_KS_D_PPM.replace("max_diff", "max_diff_dec")).alias("d_ppm"),
        F.expr(_KS_REJECT.replace("max_diff", "max_diff_dec")).alias("reject_at_05"),
    )


# --------------------------------------------------------------------------
# Mann-Whitney U rank-sum test (tie-corrected, exact doubled ranks).
# --------------------------------------------------------------------------

#: z-score from exact integer components, evaluated as ONE shared IEEE
#: expression text on both engines (the only float in the operator).
#: Doubled units throughout: u1_x2 and mu_x2 = n1*n2 are both 2x the
#: textbook values, so the numerator (u1_x2 - mu)/2 recovers U1-E[U].
_MWU_Z_MILLI = (
    "CAST(FLOOR((CAST(u1_x2_dec AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))"
    " / 2.0"
    " / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0"
    "        * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0)"
    "           - CAST(tie_cubes_dec AS DOUBLE)"
    "             / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))"
    "                * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0))))"
    " * 1000.0) AS BIGINT)"
)

_MWU_SQL = f"""
WITH tagged AS (
    SELECT CAST(CAST(l.l_quantity AS DECIMAL(18,2)) AS BIGINT) AS q,
           p.p_type LIKE 'PROMO%' AS g1
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
per_value AS (
    SELECT q,
           CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
           CAST(SUM(CASE WHEN g1 THEN 0 ELSE 1 END) AS BIGINT) AS c2
    FROM tagged GROUP BY q
),
cum AS (
    SELECT q, c1, c2,
           CAST(SUM(c1 + c2) OVER (ORDER BY q) - (c1 + c2) AS BIGINT) AS below,
           CAST(SUM(c1) OVER () AS BIGINT) AS n1,
           CAST(SUM(c2) OVER () AS BIGINT) AS n2
    FROM per_value
),
comp AS (
    SELECT CAST(MAX(n1) AS BIGINT) AS n1,
           CAST(MAX(n2) AS BIGINT) AS n2,
           CAST(SUM(CAST(c1 AS DECIMAL(18,0))
                    * CAST(2 * below + c1 + c2 + 1 AS DECIMAL(20,0)))
                AS DECIMAL(38,0)) AS r1_x2_dec,
           CAST(SUM(CAST(c1 + c2 AS DECIMAL(12,0))
                    * CAST(c1 + c2 AS DECIMAL(12,0))
                    * CAST(c1 + c2 AS DECIMAL(12,0))
                    - CAST(c1 + c2 AS DECIMAL(12,0)))
                AS DECIMAL(38,0)) AS tie_cubes_dec
    FROM cum
),
stat AS (
    SELECT n1, n2, r1_x2_dec, tie_cubes_dec,
           CAST(r1_x2_dec - CAST(n1 AS DECIMAL(20,0)) * CAST(n1 + 1 AS DECIMAL(20,0))
                AS DECIMAL(38,0)) AS u1_x2_dec
    FROM comp
)
SELECT n1, n2,
       CAST(r1_x2_dec AS STRING) AS r1_x2,
       CAST(u1_x2_dec AS STRING) AS u1_x2,
       CAST(tie_cubes_dec AS STRING) AS tie_cubes,
       {_MWU_Z_MILLI} AS z_milli,
       abs({_MWU_Z_MILLI}) > 1959 AS reject_at_05
FROM stat
"""


@register(
    "mannwhitney_u_quantity",
    _MWU_SQL,
    doc="Mann-Whitney U rank-sum test: do PROMO-part lineitems ship in "
    "different quantities than non-promo lines? Quantity is small-"
    "domain and massively tied, so the operator carries DOUBLED "
    "average ranks (2*below + t + 1 per value — always an integer), "
    "making R1, U1 and the t^3-t tie-correction term EXACT integers "
    "accumulated in DECIMAL(38,0) and surfaced as VARCHAR; the only "
    "float is the tie-corrected normal z through one shared IEEE "
    "expression, floor-quantized to milli. Scale: the fact reduces to "
    "the distinct-value grain (|quantity| rows) before any window — "
    "rank-sum testing at 100 TB costs one fact-dim join plus one "
    "map-combinable agg, like spend_ks_test.",
)
def q_mannwhitney_u_quantity(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", F.col("l_quantity").cast("decimal(18,2)").cast("long").alias("q")
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_type").like("PROMO%").alias("g1")
    )
    tagged = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select("q", "g1")
    per_value = tagged.groupBy("q").agg(
        F.sum(F.when(F.col("g1"), 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(F.col("g1"), 0).otherwise(1)).cast("long").alias("c2"),
    )
    w_cum = Window.orderBy("q")
    w_all = Window.partitionBy()
    cum = per_value.select(
        "q",
        "c1",
        "c2",
        (F.sum(F.col("c1") + F.col("c2")).over(w_cum) - (F.col("c1") + F.col("c2")))
        .cast("long")
        .alias("below"),
        F.sum("c1").over(w_all).cast("long").alias("n1"),
        F.sum("c2").over(w_all).cast("long").alias("n2"),
    )
    t_dec = (F.col("c1") + F.col("c2")).cast("decimal(12,0)")
    comp = cum.agg(
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
        F.sum(
            F.col("c1").cast("decimal(18,0)")
            * (2 * F.col("below") + F.col("c1") + F.col("c2") + 1).cast("decimal(20,0)")
        )
        .cast("decimal(38,0)")
        .alias("r1_x2_dec"),
        F.sum(t_dec * t_dec * t_dec - t_dec).cast("decimal(38,0)").alias("tie_cubes_dec"),
    )
    stat = comp.withColumn(
        "u1_x2_dec",
        (
            F.col("r1_x2_dec")
            - F.col("n1").cast("decimal(20,0)") * (F.col("n1") + 1).cast("decimal(20,0)")
        ).cast("decimal(38,0)"),
    )
    return stat.select(
        "n1",
        "n2",
        F.col("r1_x2_dec").cast("string").alias("r1_x2"),
        F.col("u1_x2_dec").cast("string").alias("u1_x2"),
        F.col("tie_cubes_dec").cast("string").alias("tie_cubes"),
        F.expr(_MWU_Z_MILLI).alias("z_milli"),
        (F.abs(F.expr(_MWU_Z_MILLI)) > 1959).alias("reject_at_05"),
    )


# --------------------------------------------------------------------------
# Per-brand Spearman rank correlation (exact rank components).
# --------------------------------------------------------------------------

#: rho = 1 - 6*SUM(d^2)/(n^3-n) with d in doubled-rank units (so
#: SUM(d2^2) = 4*SUM(d^2), hence the 1.5 factor). Signed -> FLOOR.
_SPEARMAN_PPM = (
    "CAST(FLOOR((1.0 - 1.5 * CAST(sum_d2sq_dec AS DOUBLE)"
    " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
    "    - CAST(n AS DOUBLE)))"
    " * 1000000.0) AS BIGINT)"
)

_SPEARMAN_SQL = f"""
WITH rows_ AS (
    SELECT p.p_brand AS brand,
           CAST(CAST(l.l_quantity AS DECIMAL(18,2)) AS BIGINT) AS q,
           CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
ranked AS (
    SELECT brand,
           2 * RANK() OVER (PARTITION BY brand ORDER BY q)
             + COUNT(*) OVER (PARTITION BY brand, q) - 1 AS r2x,
           2 * RANK() OVER (PARTITION BY brand ORDER BY cents)
             + COUNT(*) OVER (PARTITION BY brand, cents) - 1 AS r2y
    FROM rows_
)
SELECT brand,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(SUM(CAST(r2x - r2y AS DECIMAL(18,0))
                     * CAST(r2x - r2y AS DECIMAL(18,0)))
                 AS DECIMAL(38,0)) AS STRING) AS sum_d2sq,
       {_SPEARMAN_PPM.replace("sum_d2sq_dec", "CAST(SUM(CAST(r2x - r2y AS DECIMAL(18,0)) * CAST(r2x - r2y AS DECIMAL(18,0))) AS DECIMAL(38,0))").replace("CAST(n AS DOUBLE)", "CAST(COUNT(*) AS DOUBLE)")} AS rho_ppm
FROM ranked
GROUP BY brand
"""


@register(
    "spearman_price_quantity_by_brand",
    _SPEARMAN_SQL,
    doc="Per-brand Spearman rank correlation between lineitem quantity "
    "and extended price — the monotone-association screen feature "
    "audits run where Pearson is distorted by outliers. Ties use "
    "average ranks carried as DOUBLED integers (2*RANK + tiecount - 1),"
    " so the rank-difference sum-of-squares is an EXACT integer in "
    "DECIMAL(38,0) (surfaced VARCHAR); the only float is the final "
    "rho = 1 - 1.5*SUMd2sq/(n^3-n) through one shared signed-FLOOR "
    "IEEE expression. Scale: both rankings are brand-partitioned "
    "windows (range-partitionable sorts, no global frame); one fact-"
    "dim broadcast join feeds them and the output is |brands| rows.",
)
def q_spearman_price_quantity_by_brand(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("decimal(18,2)").cast("long").alias("q"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rows_ = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        F.col("p_brand").alias("brand"), "q", "cents"
    )
    ranked = rows_.select(
        "brand",
        (
            2 * F.rank().over(Window.partitionBy("brand").orderBy("q"))
            + F.count("*").over(Window.partitionBy("brand", "q"))
            - 1
        ).alias("r2x"),
        (
            2 * F.rank().over(Window.partitionBy("brand").orderBy("cents"))
            + F.count("*").over(Window.partitionBy("brand", "cents"))
            - 1
        ).alias("r2y"),
    )
    d2 = (F.col("r2x") - F.col("r2y")).cast("decimal(18,0)")
    out = ranked.groupBy("brand").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(d2 * d2).cast("decimal(38,0)").alias("sum_d2sq_dec"),
    )
    return out.select(
        "brand",
        "n",
        F.col("sum_d2sq_dec").cast("string").alias("sum_d2sq"),
        F.expr(_SPEARMAN_PPM).alias("rho_ppm"),
    )


# --------------------------------------------------------------------------
# Difference-in-differences: promo uplift on line quantity.
# --------------------------------------------------------------------------

_DID_CUT = "1998-01-01"

_DID_SQL = f"""
WITH tagged AS (
    SELECT p.p_type LIKE 'PROMO%' AS treated,
           l.l_shipdate >= TIMESTAMP '{_DID_CUT} 00:00:00' AS post,
           CAST(CAST(l.l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS q_cents
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
cells AS (
    SELECT treated, post,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(q_cents) AS BIGINT) AS sum_q
    FROM tagged GROUP BY treated, post
),
means AS (
    SELECT treated, post, n, sum_q,
           CAST(sum_q * 10000 // n AS BIGINT) AS mean_q_micro
    FROM cells
),
wide AS (
    SELECT
      MAX(CASE WHEN treated AND post THEN n END) AS n_tp,
      MAX(CASE WHEN treated AND NOT post THEN n END) AS n_t0,
      MAX(CASE WHEN NOT treated AND post THEN n END) AS n_cp,
      MAX(CASE WHEN NOT treated AND NOT post THEN n END) AS n_c0,
      MAX(CASE WHEN treated AND post THEN mean_q_micro END) AS mean_tp_micro,
      MAX(CASE WHEN treated AND NOT post THEN mean_q_micro END) AS mean_t0_micro,
      MAX(CASE WHEN NOT treated AND post THEN mean_q_micro END) AS mean_cp_micro,
      MAX(CASE WHEN NOT treated AND NOT post THEN mean_q_micro END) AS mean_c0_micro
    FROM means
)
SELECT n_tp, n_t0, n_cp, n_c0,
       mean_tp_micro, mean_t0_micro, mean_cp_micro, mean_c0_micro,
       CAST((mean_tp_micro - mean_t0_micro) - (mean_cp_micro - mean_c0_micro)
            AS BIGINT) AS did_micro
FROM wide
"""


@register(
    "promo_did_uplift",
    _DID_SQL,
    doc=f"Difference-in-differences uplift estimate: did PROMO parts' "
    f"line quantity move differently after {_DID_CUT} than non-promo "
    "parts'? The four cell means are exact integer micro-quantities "
    "(sum*10000 DIV n on non-negative operands); the DiD itself is "
    "pure BIGINT subtraction of already-floored means, so the signed "
    "result cannot diverge across engines. The quasi-experimental "
    "counterpart to promo_chisq_independence: one fact-dim join, one "
    "map-combinable aggregate to a 4-cell frame, everything after "
    "runs on 4 rows.",
)
def q_promo_did_uplift(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.col("l_shipdate") >= F.lit(_DID_CUT).cast("timestamp")).alias("post"),
        (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("long").alias("q_cents"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_type").like("PROMO%").alias("treated")
    )
    cells = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("treated", "post")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("q_cents").cast("long").alias("sum_q"),
        )
    )
    means = cells.select(
        "treated",
        "post",
        "n",
        "sum_q",
        F.expr("CAST(sum_q * 10000 DIV n AS BIGINT)").alias("mean_q_micro"),
    )

    def cell(col, t, p):
        cond = (F.col("treated") == t) & (F.col("post") == p)
        return F.max(F.when(cond, F.col(col)))

    wide = means.agg(
        cell("n", True, True).alias("n_tp"),
        cell("n", True, False).alias("n_t0"),
        cell("n", False, True).alias("n_cp"),
        cell("n", False, False).alias("n_c0"),
        cell("mean_q_micro", True, True).alias("mean_tp_micro"),
        cell("mean_q_micro", True, False).alias("mean_t0_micro"),
        cell("mean_q_micro", False, True).alias("mean_cp_micro"),
        cell("mean_q_micro", False, False).alias("mean_c0_micro"),
    )
    return wide.select(
        "*",
        (
            (F.col("mean_tp_micro") - F.col("mean_t0_micro"))
            - (F.col("mean_cp_micro") - F.col("mean_c0_micro"))
        )
        .cast("long")
        .alias("did_micro"),
    )


# --------------------------------------------------------------------------
# Simpson's-paradox screen: pooled vs per-brand regression sign.
# --------------------------------------------------------------------------

_SIMPSON_SQL = """
WITH comp AS (
    -- BIGINT partials over the fact scan (VERDICT r6 #3): x_bp <= 1e4
    -- (discount in basis points) and y <= 50, so per-row x*y <= 5e5 and
    -- even a 100 TB lineitem (~6e11 rows) keeps every sum under 3e17 —
    -- comfortably int64. DECIMAL(38) appears only on the |brands|-row
    -- frame below where the n*Sxy cross products genuinely exceed int64.
    SELECT p.p_brand AS brand,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(CAST(l.l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT))
                AS BIGINT) AS sx,
           CAST(SUM(CAST(CAST(l.l_quantity AS DECIMAL(18,2)) AS BIGINT))
                AS BIGINT) AS sy,
           CAST(SUM(CAST(CAST(l.l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT)
                    * CAST(CAST(l.l_quantity AS DECIMAL(18,2)) AS BIGINT))
                AS BIGINT) AS sxy
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand
),
signed AS (
    SELECT brand, n,
           CAST(CAST(n AS DECIMAL(18,0)) * CAST(sxy AS DECIMAL(38,0))
                - CAST(sx AS DECIMAL(38,0)) * CAST(sy AS DECIMAL(38,0))
                AS DECIMAL(38,0)) AS slope_num,
           CAST(SUM(n) OVER () AS BIGINT) AS n_all,
           CAST(SUM(CAST(sx AS DECIMAL(38,0))) OVER () AS DECIMAL(38,0)) AS sx_all,
           CAST(SUM(CAST(sy AS DECIMAL(38,0))) OVER () AS DECIMAL(38,0)) AS sy_all,
           CAST(SUM(CAST(sxy AS DECIMAL(38,0))) OVER () AS DECIMAL(38,0)) AS sxy_all
    FROM comp
)
SELECT brand, n,
       CAST(slope_num AS STRING) AS slope_num,
       CAST(CASE WHEN slope_num > 0 THEN 1 WHEN slope_num < 0 THEN -1 ELSE 0 END
            AS INTEGER) AS brand_sign,
       CAST(CASE WHEN CAST(n_all AS DECIMAL(18,0)) * sxy_all - sx_all * sy_all > 0 THEN 1
                 WHEN CAST(n_all AS DECIMAL(18,0)) * sxy_all - sx_all * sy_all < 0 THEN -1
                 ELSE 0 END AS INTEGER) AS pooled_sign,
       (CASE WHEN slope_num > 0 THEN 1 WHEN slope_num < 0 THEN -1 ELSE 0 END)
       <> (CASE WHEN CAST(n_all AS DECIMAL(18,0)) * sxy_all - sx_all * sy_all > 0 THEN 1
                WHEN CAST(n_all AS DECIMAL(18,0)) * sxy_all - sx_all * sy_all < 0 THEN -1
                ELSE 0 END) AS sign_flipped
FROM signed
"""


@register(
    "simpsons_paradox_screen",
    _SIMPSON_SQL,
    doc="Simpson's-paradox screen on the discount -> quantity relation: "
    "per-brand OLS slope SIGN vs the pooled slope sign, flagged where "
    "they disagree — the aggregation-bias tripwire every metrics "
    "review needs before trusting a pooled trend. The slope sign is "
    "read off the EXACT integer numerator n*Sxy - Sx*Sy (DECIMAL(38,0),"
    " surfaced as VARCHAR) — no division, no floats, so a sign can "
    "never flip from rounding. One fact-dim join + one map-combinable "
    "aggregate; the pooled components are windows over the |brands| "
    "frame.",
)
def q_simpsons_paradox_screen(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.col("l_discount").cast("decimal(18,4)") * 10000).cast("long").alias("x_bp"),
        F.col("l_quantity").cast("decimal(18,2)").cast("long").alias("y"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # BIGINT partials over the fact (VERDICT r6 #3): the r5 spelling
    # accumulated DECIMAL(25/38,0) across the whole lineitem scan, which
    # falls off Spark's long-backed decimal fast path and showed a 14.8
    # ratio at the K=10 probe. x_bp <= 1e4 and y <= 50, so every sum fits
    # int64 up to ~6e11 fact rows (100 TB); decimal widening now happens
    # only on the |brands|-row frame where n*Sxy really needs int128.
    comp = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x_bp").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x_bp") * F.col("y")).alias("sxy"),
        )
    )
    w = Window.partitionBy()
    signed = comp.select(
        "brand",
        "n",
        (
            F.col("n").cast("decimal(18,0)") * F.col("sxy").cast("decimal(38,0)")
            - F.col("sx").cast("decimal(38,0)") * F.col("sy").cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("slope_num"),
        F.sum("n").over(w).cast("long").alias("n_all"),
        F.sum(F.col("sx").cast("decimal(38,0)")).over(w).cast("decimal(38,0)").alias("sx_all"),
        F.sum(F.col("sy").cast("decimal(38,0)")).over(w).cast("decimal(38,0)").alias("sy_all"),
        F.sum(F.col("sxy").cast("decimal(38,0)")).over(w).cast("decimal(38,0)").alias("sxy_all"),
    )
    brand_sign = (
        F.when(F.col("slope_num") > 0, 1).when(F.col("slope_num") < 0, -1).otherwise(0)
    )
    pooled_num = (
        F.col("n_all").cast("decimal(18,0)") * F.col("sxy_all")
        - F.col("sx_all") * F.col("sy_all")
    )
    pooled_sign = F.when(pooled_num > 0, 1).when(pooled_num < 0, -1).otherwise(0)
    return signed.select(
        "brand",
        "n",
        F.col("slope_num").cast("string").alias("slope_num"),
        brand_sign.cast("int").alias("brand_sign"),
        pooled_sign.cast("int").alias("pooled_sign"),
        (brand_sign != pooled_sign).alias("sign_flipped"),
    )


# --------------------------------------------------------------------------
# Deterministic bootstrap CI for the A/B difference in mean order value.
# --------------------------------------------------------------------------

_AB_B = 32

_AB_KEY_SQL = "(CAST(o_orderkey AS VARCHAR) || ':' || CAST(b AS VARCHAR))"

_AB_DIFF_SQL = f"""
WITH weighted AS (
    SELECT t.b,
           {hash_bucket_sql(_AB_KEY_SQL, "abboot:", 3)} AS w,
           c.c_mktsegment = 'BUILDING' AS grp1,
           CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    CROSS JOIN (SELECT UNNEST(range(0, {_AB_B})) AS b) t
),
rep AS (
    SELECT CAST(b AS INTEGER) AS replica_id,
           CAST(SUM(CASE WHEN grp1 THEN w ELSE 0 END) AS BIGINT) AS n1,
           CAST(SUM(CASE WHEN grp1 THEN w * cents ELSE 0 END) AS BIGINT) AS s1,
           CAST(SUM(CASE WHEN grp1 THEN 0 ELSE w END) AS BIGINT) AS n2,
           CAST(SUM(CASE WHEN grp1 THEN 0 ELSE w * cents END) AS BIGINT) AS s2
    FROM weighted GROUP BY b
),
diffs AS (
    SELECT replica_id, n1, n2,
           -- split-mean idiom ((s//n)*1e6 + (s%n)*1e6//n): scaling the
           -- REMAINDER instead of the sum keeps everything in int64 at
           -- any fact size (s*1e6 overflowed at the 10x probe); all
           -- operands non-negative, so DIV == // on both engines, and
           -- the final subtraction is pure signed integer
           CAST(((s1 // n1) * 1000000 + ((s1 % n1) * 1000000) // n1)
                - ((s2 // n2) * 1000000 + ((s2 % n2) * 1000000) // n2)
                AS BIGINT) AS diff_micro_cents
    FROM rep
)
SELECT replica_id, n1, n2, diff_micro_cents,
       CAST(RANK() OVER (ORDER BY diff_micro_cents, replica_id) AS INTEGER) AS diff_rank,
       CASE RANK() OVER (ORDER BY diff_micro_cents, replica_id)
            WHEN 1 THEN 'lo' WHEN {_AB_B} THEN 'hi' ELSE 'mid' END AS ci_role
FROM diffs
"""


@register(
    "bootstrap_ab_diff_ci",
    _AB_DIFF_SQL,
    doc=f"Deterministic multiplier bootstrap (B={_AB_B}) of the "
    "BUILDING-vs-rest DIFFERENCE in mean order value — the A/B "
    "uncertainty interval next to the point tests (spend_ks_test, "
    "mannwhitney, CUPED): each replica reweights every order with the "
    "shared md5 multiplier, both group means are floored to exact "
    "integer micro-cents (non-negative DIV), and their difference is "
    "pure signed integer subtraction; replicas ranked so the extreme "
    "rows read as the CI ends (a CI excluding zero = significant "
    "segment effect). One B-way explode + one map-combinable agg; "
    "windows on the B-row frame.",
)
def q_bootstrap_ab_diff_ci(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", (F.col("c_mktsegment") == "BUILDING").alias("grp1")
    )
    weighted = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(_AB_B - 1))).alias("b"),
            "o_orderkey",
            "grp1",
            "cents",
        )
        .select(
            "b",
            hash_bucket(
                F.concat(
                    F.col("o_orderkey").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                ),
                "abboot:",
                mod=3,
            ).alias("w"),
            "grp1",
            "cents",
        )
    )
    rep = weighted.groupBy(F.col("b").cast("int").alias("replica_id")).agg(
        F.sum(F.when(F.col("grp1"), F.col("w")).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("grp1"), F.col("w") * F.col("cents")).otherwise(0))
        .cast("long")
        .alias("s1"),
        F.sum(F.when(F.col("grp1"), 0).otherwise(F.col("w"))).cast("long").alias("n2"),
        F.sum(F.when(F.col("grp1"), 0).otherwise(F.col("w") * F.col("cents")))
        .cast("long")
        .alias("s2"),
    )
    diffs = rep.select(
        "replica_id",
        "n1",
        "n2",
        F.expr(
            "CAST(((s1 DIV n1) * 1000000 + ((s1 % n1) * 1000000) DIV n1)"
            " - ((s2 DIV n2) * 1000000 + ((s2 % n2) * 1000000) DIV n2) AS BIGINT)"
        ).alias("diff_micro_cents"),
    )
    w = Window.orderBy("diff_micro_cents", "replica_id")
    return diffs.select(
        "replica_id",
        "n1",
        "n2",
        "diff_micro_cents",
        F.rank().over(w).cast("int").alias("diff_rank"),
        F.when(F.rank().over(w) == 1, "lo")
        .when(F.rank().over(w) == _AB_B, "hi")
        .otherwise("mid")
        .alias("ci_role"),
    )


# --------------------------------------------------------------------------
# McNemar paired test: customer activity before vs after the snapshot.
# --------------------------------------------------------------------------

_MCN_W1 = "1997-01-01"
_MCN_W2 = "1997-06-30"
_MCN_W3 = "1997-12-31"

_MCNEMAR_SQL = f"""
WITH flags AS (
    SELECT c.c_custkey,
           COALESCE(MAX(CASE WHEN o.o_orderdate >= DATE '{_MCN_W1}'
                              AND o.o_orderdate <  DATE '{_MCN_W2}'
                             THEN 1 END), 0) AS w1,
           COALESCE(MAX(CASE WHEN o.o_orderdate >= DATE '{_MCN_W2}'
                              AND o.o_orderdate <  DATE '{_MCN_W3}'
                             THEN 1 END), 0) AS w2
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
),
cells AS (
    SELECT CAST(SUM(CASE WHEN w1 = 0 AND w2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
           CAST(SUM(CASE WHEN w1 = 0 AND w2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
           CAST(SUM(CASE WHEN w1 = 1 AND w2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
           CAST(SUM(CASE WHEN w1 = 1 AND w2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11
    FROM flags
)
SELECT n00, n01, n10, n11,
       CAST((n10 - n01) * (n10 - n01) AS BIGINT) AS chisq_num,
       CAST(n10 + n01 AS BIGINT) AS chisq_den,
       CAST(CASE WHEN n10 + n01 > 0
                 THEN ((n10 - n01) * (n10 - n01) * 1000) // (n10 + n01)
                 ELSE 0 END AS BIGINT) AS stat_milli
FROM cells
"""


@register(
    "mcnemar_paired_test",
    _MCNEMAR_SQL,
    doc="McNemar test on paired binary outcomes: each customer's "
    "activity flag in the half-year before vs after the snapshot "
    "date — the within-subject churn test that the unpaired tests "
    "(chi-square, Mann-Whitney) can't do, since it uses only the "
    "discordant cells n01/n10. The statistic is the exact rational "
    "(n10-n01)^2/(n10+n01), surfaced as integer numerator/denominator "
    "plus a milli-scaled quotient (all operands non-negative, so DIV "
    "== // cross-engine; the squared term keeps the numerator "
    "non-negative by construction). Scale: orders pre-filtered to the "
    "two windows before the join, one map-combinable per-customer "
    "flag aggregate, then a 4-cell global fold — the same shape as "
    "promo_chisq_independence.",
)
def q_mcnemar_paired_test(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    od = F.col("o_orderdate")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter((od >= F.lit(_MCN_W1)) & (od < F.lit(_MCN_W3)))
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max(F.when(od < F.lit(_MCN_W2), 1)).alias("w1"),
            F.max(F.when(od >= F.lit(_MCN_W2), 1)).alias("w2"),
        )
    )
    flags = cust.join(orders, "c_custkey", "left").fillna(
        0, subset=["w1", "w2"]
    )
    cells = flags.agg(
        F.sum(F.when((F.col("w1") == 0) & (F.col("w2") == 0), 1).otherwise(0))
        .cast("long")
        .alias("n00"),
        F.sum(F.when((F.col("w1") == 0) & (F.col("w2") == 1), 1).otherwise(0))
        .cast("long")
        .alias("n01"),
        F.sum(F.when((F.col("w1") == 1) & (F.col("w2") == 0), 1).otherwise(0))
        .cast("long")
        .alias("n10"),
        F.sum(F.when((F.col("w1") == 1) & (F.col("w2") == 1), 1).otherwise(0))
        .cast("long")
        .alias("n11"),
    )
    return cells.select(
        "n00",
        "n01",
        "n10",
        "n11",
        ((F.col("n10") - F.col("n01")) * (F.col("n10") - F.col("n01")))
        .cast("long")
        .alias("chisq_num"),
        (F.col("n10") + F.col("n01")).cast("long").alias("chisq_den"),
        F.expr(
            "CAST(CASE WHEN n10 + n01 > 0"
            " THEN ((n10 - n01) * (n10 - n01) * 1000) DIV (n10 + n01)"
            " ELSE 0 END AS BIGINT)"
        ).alias("stat_milli"),
    )


# --------------------------------------------------------------------------
# Poisson overdispersion screen on daily order counts.
# --------------------------------------------------------------------------

_DISPERSION_SQL = """
WITH daily AS (
    SELECT o_orderdate AS d, CAST(COUNT(*) AS BIGINT) AS c
    FROM orders GROUP BY 1
),
comp AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(c) AS BIGINT) AS total_orders,
           CAST(SUM(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS sum_sq
    FROM daily
)
SELECT n_days, total_orders,
       CAST(total_orders * 1000 // n_days AS BIGINT) AS mean_milli,
       CAST(CAST(n_days AS DECIMAL(38,0)) * sum_sq
            - CAST(total_orders AS DECIMAL(38,0)) * total_orders
            AS VARCHAR) AS var_numerator,
       CAST(CAST(CAST(n_days AS DECIMAL(38,0)) * sum_sq
                 - CAST(total_orders AS DECIMAL(38,0)) * total_orders
                 AS HUGEINT) * 1000
            // CAST(CAST(n_days AS DECIMAL(38,0)) * total_orders AS HUGEINT)
            AS BIGINT) AS dispersion_milli
FROM comp
"""


@register(
    "order_count_overdispersion",
    _DISPERSION_SQL,
    doc="Poisson overdispersion screen on daily order counts: the "
    "variance-to-mean ratio (index of dispersion) as an exact "
    "rational — variance numerator n*Sum(c^2) - (Sum c)^2 (always "
    ">= 0 by Cauchy-Schwarz, so integer division is engine-agnostic), "
    "denominator n*Sum(c). dispersion_milli ~ 1000 means Poisson "
    "arrivals; far above flags bursty/clumped traffic where Poisson "
    "CIs and anomaly thresholds (event_rate_spike_flags) are "
    "miscalibrated. The numerator is surfaced as VARCHAR because it "
    "genuinely exceeds int64 at fact scale; the DECIMAL(38) widening "
    "happens only on the |days|-grain frame (the simpsons r7 "
    "discipline — BIGINT partials over the fact, int128 on the small "
    "frame). Oracle gotcha pinned here: DuckDB // on DECIMAL operands "
    "is TRUE division (the cast then rounds) — the oracle divides in "
    "HUGEINT where // is integral, matching Spark's decimal DIV.",
)
def q_order_count_overdispersion(spark, sf_dir):
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg(F.count("*").cast("long").alias("c"))
    )
    comp = daily.agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("c").cast("long").alias("total_orders"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("decimal(38,0)")
        .alias("sum_sq"),
    )
    var_num = (
        F.col("n_days").cast("decimal(38,0)") * F.col("sum_sq")
        - F.col("total_orders").cast("decimal(38,0)") * F.col("total_orders")
    )
    return comp.select(
        "n_days",
        "total_orders",
        F.expr("CAST(total_orders * 1000 DIV n_days AS BIGINT)").alias(
            "mean_milli"
        ),
        var_num.cast("decimal(38,0)").cast("string").alias("var_numerator"),
        F.expr(
            "CAST((CAST(n_days AS DECIMAL(38,0)) * sum_sq"
            " - CAST(total_orders AS DECIMAL(38,0)) * total_orders) * 1000"
            " DIV (CAST(n_days AS DECIMAL(38,0)) * total_orders) AS BIGINT)"
        ).alias("dispersion_milli"),
    )


# --------------------------------------------------------------------------
# Theil-Sen robust trend estimate on daily revenue.
# --------------------------------------------------------------------------

_THEIL_SEN_SQL = """
WITH daily AS (
    SELECT CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS x,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS cents
    FROM orders GROUP BY o_orderdate
),
pairs AS (
    SELECT b.x - a.x AS dx, b.cents - a.cents AS dy
    FROM daily a JOIN daily b ON b.x > a.x
),
slopes AS (
    -- explicit-sign floor division, pure int64 (DECIMAL per-pair math
    -- falls off codegen — the simpsons r7 lesson): q/r on the
    -- NON-NEGATIVE magnitude where DIV and // agree, then CASE
    -- reconstructs floor semantics for negative dy identically on
    -- both engines
    SELECT CASE WHEN dy >= 0 THEN (dy * 1000000) // dx
                ELSE -((-dy * 1000000) // dx)
                     - (CASE WHEN (-dy * 1000000) % dx > 0 THEN 1 ELSE 0 END)
           END AS slope_micro
    FROM pairs
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY slope_micro)
            AS BIGINT) AS theil_sen_slope_micro
FROM slopes
"""


@register(
    "theil_sen_daily_revenue_trend",
    _THEIL_SEN_SQL,
    doc="Theil-Sen robust trend: the MEDIAN pairwise slope of daily "
    "revenue vs day index — up to 29% contaminated days cannot move "
    "it, unlike the OLS slope (brand_discount_elasticity_components' "
    "family). Slopes are exact integer micro-cents/day in PURE int64: "
    "the division runs on the non-negative magnitude (where Spark DIV "
    "and DuckDB // agree) and a CASE reconstructs floor semantics for "
    "negative dy — the first spelling shifted through DECIMAL(38)/"
    "HUGEINT and measured 3x slower (per-pair decimal math falls off "
    "codegen, the simpsons r7 lesson); |dy|*1e6 stays under int64 "
    "through the 10x probe, and at extreme fact scale the day-grain "
    "cents would move to milli-slope first. percentile_disc(0.5) "
    "picks the median slope "
    "(cross-engine exact per the round-5 boundary fixtures). Scale: "
    "the pair join is |days|^2 — CALENDAR-bounded, not data-bounded "
    "(2.4k days -> 2.9M pairs regardless of fact size); the fact is "
    "reduced to the day grain in one map-combinable agg first.",
)
def q_theil_sen_daily_revenue_trend(spark, sf_dir):
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg(
            F.expr(
                "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                " AS BIGINT)) AS BIGINT)"
            ).alias("cents")
        )
        .select(
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01"))
            .cast("long")
            .alias("x"),
            "cents",
        )
        .localCheckpoint(eager=False)
    )
    a = daily.select(F.col("x").alias("xa"), F.col("cents").alias("ca"))
    b = daily.select(F.col("x").alias("xb"), F.col("cents").alias("cb"))
    pairs = a.join(b, F.col("xb") > F.col("xa")).select(
        (F.col("xb") - F.col("xa")).alias("dx"),
        (F.col("cb") - F.col("ca")).alias("dy"),
    )
    slopes = pairs.select(
        F.expr(
            "CASE WHEN dy >= 0 THEN (dy * 1000000) DIV dx"
            " ELSE -((-dy * 1000000) DIV dx)"
            " - (CASE WHEN (-dy * 1000000) % dx > 0 THEN 1 ELSE 0 END)"
            " END"
        ).cast("long").alias("slope_micro")
    )
    n_days = daily.agg(F.count("*").cast("long").alias("n_days"))
    # percentile_disc here compiles to ObjectHashAggregate (typed
    # buffer of all pair slopes, no codegen — measured ~15 s); the
    # equivalent sort + positional pick stays in codegen: disc(0.5) is
    # the value at ascending position ceil(n/2)
    w = Window.orderBy("slope_micro")
    wall = Window.partitionBy()
    ranked = slopes.select(
        "slope_micro",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count("*").over(wall).cast("long").alias("n_pairs"),
    )
    med = ranked.filter(
        F.col("rn") == F.expr("CAST(CEIL(n_pairs / 2.0) AS BIGINT)")
    ).select(
        "n_pairs", F.col("slope_micro").alias("theil_sen_slope_micro")
    )
    return med.crossJoin(F.broadcast(n_days)).select(
        "n_days", "n_pairs", "theil_sen_slope_micro"
    )


# --------------------------------------------------------------------------
# Kruskal-Wallis H test across the five order priorities.
# --------------------------------------------------------------------------

#: Tie-corrected H from exact integer components, ONE shared IEEE
#: expression text on both engines. Doubled-rank units: r2_j = 2*R_j,
#: so SUM_j R_j^2/n_j = SUM_j r2_j^2/(4*n_j) — hence the /4.0. The
#: five per-group terms are summed in FIXED textual order (IEEE adds
#: associate left-to-right identically on both engines), which is the
#: whole reason the stats are pivoted to one row first.
_KW_H_MILLI = (
    "CAST(FLOOR(((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)))"
    " * ((CAST(r2_urgent AS DOUBLE) * CAST(r2_urgent AS DOUBLE) / CAST(n_urgent AS DOUBLE)"
    "     + CAST(r2_high AS DOUBLE) * CAST(r2_high AS DOUBLE) / CAST(n_high AS DOUBLE)"
    "     + CAST(r2_medium AS DOUBLE) * CAST(r2_medium AS DOUBLE) / CAST(n_medium AS DOUBLE)"
    "     + CAST(r2_notspec AS DOUBLE) * CAST(r2_notspec AS DOUBLE) / CAST(n_notspec AS DOUBLE)"
    "     + CAST(r2_low AS DOUBLE) * CAST(r2_low AS DOUBLE) / CAST(n_low AS DOUBLE)) / 4.0)"
    " - 3.0 * (CAST(n AS DOUBLE) + 1.0))"
    " / (1.0 - CAST(tie_cubes AS DOUBLE)"
    "    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
    "       - CAST(n AS DOUBLE)))"
    " * 1000.0) AS BIGINT)"
)

_KW_SQL = f"""
WITH tagged AS (
    SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
           o_orderpriority AS prio
    FROM orders
),
per_value AS (
    SELECT cents,
           CAST(SUM(CASE WHEN prio = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
           CAST(SUM(CASE WHEN prio = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS c2,
           CAST(SUM(CASE WHEN prio = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS c3,
           CAST(SUM(CASE WHEN prio = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS c4,
           CAST(SUM(CASE WHEN prio = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS c5
    FROM tagged GROUP BY cents
),
cum AS (
    SELECT c1, c2, c3, c4, c5,
           c1 + c2 + c3 + c4 + c5 AS t,
           CAST(SUM(c1 + c2 + c3 + c4 + c5) OVER (ORDER BY cents)
                - (c1 + c2 + c3 + c4 + c5) AS BIGINT) AS below
    FROM per_value
),
comp AS (
    SELECT CAST(SUM(t) AS BIGINT) AS n,
           CAST(SUM(c1) AS BIGINT) AS n_urgent,
           CAST(SUM(c2) AS BIGINT) AS n_high,
           CAST(SUM(c3) AS BIGINT) AS n_medium,
           CAST(SUM(c4) AS BIGINT) AS n_notspec,
           CAST(SUM(c5) AS BIGINT) AS n_low,
           CAST(SUM(c1 * (2 * below + t + 1)) AS BIGINT) AS r2_urgent,
           CAST(SUM(c2 * (2 * below + t + 1)) AS BIGINT) AS r2_high,
           CAST(SUM(c3 * (2 * below + t + 1)) AS BIGINT) AS r2_medium,
           CAST(SUM(c4 * (2 * below + t + 1)) AS BIGINT) AS r2_notspec,
           CAST(SUM(c5 * (2 * below + t + 1)) AS BIGINT) AS r2_low,
           CAST(SUM(t * t * t - t) AS BIGINT) AS tie_cubes
    FROM cum
)
SELECT n, n_urgent, n_high, n_medium, n_notspec, n_low,
       r2_urgent, r2_high, r2_medium, r2_notspec, r2_low, tie_cubes,
       {_KW_H_MILLI} AS h_milli,
       {_KW_H_MILLI} > 9487 AS reject_at_05
FROM comp
"""


@register(
    "kruskal_wallis_priority_spend",
    _KW_SQL,
    doc="Kruskal-Wallis H test (tie-corrected): do the five order "
    "priorities draw from the same spend distribution? The k-group "
    "generalization of mannwhitney_u_quantity, built on the same "
    "doubled-rank discipline: per-group rank sums r2_j = "
    "SUM c_jv*(2*below+t+1) are EXACT integers at the distinct-value "
    "grain, as is the t^3-t tie term; the only float is one shared "
    "IEEE expression whose five per-group terms are summed in fixed "
    "textual order, then floor-quantized to milli; the floored h_milli "
    "compares against the FLOORED critical (9.48773 -> 9487) so both "
    "sides share one quantization convention (r7 advice fix). Scale: the fact reduces to the "
    "distinct-cents grain in one map-combinable agg before the single "
    "rank window; r2_j <= N(N+1) stays under int64 to ~3e9 orders, "
    "past which spend re-grains to dollar buckets first (same move "
    "as the KS test).",
)
def q_kruskal_wallis_priority_spend(spark, sf_dir):
    tagged = load_table(spark, sf_dir, "orders").select(
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
        F.col("o_orderpriority").alias("prio"),
    )
    cnt = lambda p: (  # noqa: E731 — local conditional-count shorthand
        F.sum(F.when(F.col("prio") == p, 1).otherwise(0)).cast("long")
    )
    per_value = tagged.groupBy("cents").agg(
        cnt("1-URGENT").alias("c1"),
        cnt("2-HIGH").alias("c2"),
        cnt("3-MEDIUM").alias("c3"),
        cnt("4-NOT SPECIFIED").alias("c4"),
        cnt("5-LOW").alias("c5"),
    )
    t = F.col("c1") + F.col("c2") + F.col("c3") + F.col("c4") + F.col("c5")
    w_cum = Window.orderBy("cents")
    cum = per_value.select(
        "c1",
        "c2",
        "c3",
        "c4",
        "c5",
        t.alias("t"),
        (F.sum(t).over(w_cum) - t).cast("long").alias("below"),
    )
    avgd = 2 * F.col("below") + F.col("t") + 1
    comp = cum.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum("c1").cast("long").alias("n_urgent"),
        F.sum("c2").cast("long").alias("n_high"),
        F.sum("c3").cast("long").alias("n_medium"),
        F.sum("c4").cast("long").alias("n_notspec"),
        F.sum("c5").cast("long").alias("n_low"),
        F.sum(F.col("c1") * avgd).cast("long").alias("r2_urgent"),
        F.sum(F.col("c2") * avgd).cast("long").alias("r2_high"),
        F.sum(F.col("c3") * avgd).cast("long").alias("r2_medium"),
        F.sum(F.col("c4") * avgd).cast("long").alias("r2_notspec"),
        F.sum(F.col("c5") * avgd).cast("long").alias("r2_low"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tie_cubes"),
    )
    return comp.select(
        "n",
        "n_urgent",
        "n_high",
        "n_medium",
        "n_notspec",
        "n_low",
        "r2_urgent",
        "r2_high",
        "r2_medium",
        "r2_notspec",
        "r2_low",
        "tie_cubes",
        F.expr(_KW_H_MILLI).alias("h_milli"),
        (F.expr(_KW_H_MILLI) > 9487).alias("reject_at_05"),
    )


# --------------------------------------------------------------------------
# Per-brand Kendall tau-b on (quantity, discount) — contingency grain.
# --------------------------------------------------------------------------

#: tau_b = (C - D) / sqrt((T0-T1)(T0-T2)); every input exact int64,
#: the product under the sqrt taken in DOUBLE (it exceeds int64 at the
#: 10x probe), one shared IEEE expression text, floor-quantized milli.
_KENDALL_MILLI = (
    "CAST(FLOOR((CAST(c_pairs AS DOUBLE) - CAST(d_pairs AS DOUBLE))"
    " / sqrt(CAST(t0 - t1 AS DOUBLE) * CAST(t0 - t2 AS DOUBLE))"
    " * 1000.0) AS BIGINT)"
)

_KENDALL_SQL = f"""
WITH cells AS (
    SELECT p.p_brand AS brand,
           CAST(CAST(l.l_quantity AS DECIMAL(18,2)) AS BIGINT) AS q,
           CAST(CAST(l.l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS d,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand, 2, 3
),
pair_sums AS (
    SELECT a.brand,
           CAST(SUM(CASE WHEN b.d > a.d THEN a.cnt * b.cnt ELSE 0 END)
                AS BIGINT) AS c_pairs,
           CAST(SUM(CASE WHEN b.d < a.d THEN a.cnt * b.cnt ELSE 0 END)
                AS BIGINT) AS d_pairs
    FROM cells a JOIN cells b
      ON b.brand = a.brand AND b.q > a.q AND b.d <> a.d
    GROUP BY a.brand
),
marg AS (
    SELECT brand,
           CAST(SUM(cnt) AS BIGINT) AS n,
           CAST(SUM(cnt) * (SUM(cnt) - 1) // 2 AS BIGINT) AS t0
    FROM cells GROUP BY brand
),
tie_q AS (
    SELECT brand, CAST(SUM(m * (m - 1) // 2) AS BIGINT) AS t1
    FROM (SELECT brand, q, SUM(cnt) AS m FROM cells GROUP BY brand, q)
    GROUP BY brand
),
tie_d AS (
    SELECT brand, CAST(SUM(m * (m - 1) // 2) AS BIGINT) AS t2
    FROM (SELECT brand, d, SUM(cnt) AS m FROM cells GROUP BY brand, d)
    GROUP BY brand
)
SELECT m.brand, m.n, p.c_pairs, p.d_pairs, m.t0, q.t1, d.t2,
       {_KENDALL_MILLI} AS tau_b_milli
FROM marg m
JOIN pair_sums p ON p.brand = m.brand
JOIN tie_q q ON q.brand = m.brand
JOIN tie_d d ON d.brand = m.brand
ORDER BY m.brand
"""


@register(
    "kendall_tau_quantity_discount",
    _KENDALL_SQL,
    doc="Per-brand Kendall tau-b between lineitem quantity and "
    "discount — the rank-correlation that, unlike Spearman "
    "(spearman_price_quantity_by_brand), is exactly computable at "
    "the CONTINGENCY grain: quantity x discount is a bounded domain "
    "(~50 x 11 cells), so concordant/discordant pair counts are "
    "cell-pair cross-products, never row pairs. C, D and the three "
    "tie terms T0/T1/T2 are exact int64; the only float is one "
    "shared IEEE expression (the product under the sqrt exceeds "
    "int64 at the 10x probe, so it multiplies in DOUBLE — exact "
    "int inputs make the conversion deterministic). Scale: the fact "
    "reduces to <= |Q|*|D| cells per brand in one map-combinable "
    "agg; the cell self-join is DOMAIN-bounded (~300k cell pairs "
    "per brand regardless of fact size) — Kendall at 100 TB costs "
    "one broadcast dim join plus one bounded self-join, while the "
    "naive row-pair spelling is quadratic and never viable.",
)
def q_kendall_tau_quantity_discount(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("decimal(18,2)").cast("long").alias("q"),
        (F.col("l_discount").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("d"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cells = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), "q", "d")
        .agg(F.count("*").cast("long").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    a = cells.select(
        F.col("brand").alias("ab"),
        F.col("q").alias("qa"),
        F.col("d").alias("da"),
        F.col("cnt").alias("ca"),
    )
    b = cells.select(
        F.col("brand").alias("bb"),
        F.col("q").alias("qb"),
        F.col("d").alias("db"),
        F.col("cnt").alias("cb"),
    )
    # cells are domain-bounded (|brands| x |Q| x |D|) — broadcast the
    # probe side so the pair enumeration never shuffles
    pair_sums = (
        a.join(
            F.broadcast(b),
            (F.col("bb") == F.col("ab"))
            & (F.col("qb") > F.col("qa"))
            & (F.col("db") != F.col("da")),
        )
        .groupBy(F.col("ab").alias("brand"))
        .agg(
            F.sum(
                F.when(F.col("db") > F.col("da"), F.col("ca") * F.col("cb")).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("c_pairs"),
            F.sum(
                F.when(F.col("db") < F.col("da"), F.col("ca") * F.col("cb")).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("d_pairs"),
        )
    )
    marg = cells.groupBy("brand").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.expr("CAST(SUM(cnt) * (SUM(cnt) - 1) DIV 2 AS BIGINT)").alias("t0"),
    )
    tie_q = (
        cells.groupBy("brand", "q")
        .agg(F.sum("cnt").alias("m"))
        .groupBy("brand")
        .agg(F.expr("CAST(SUM(m * (m - 1) DIV 2) AS BIGINT)").alias("t1"))
    )
    tie_d = (
        cells.groupBy("brand", "d")
        .agg(F.sum("cnt").alias("m"))
        .groupBy("brand")
        .agg(F.expr("CAST(SUM(m * (m - 1) DIV 2) AS BIGINT)").alias("t2"))
    )
    return (
        marg.join(pair_sums, "brand")
        .join(tie_q, "brand")
        .join(tie_d, "brand")
        .select(
            "brand",
            "n",
            "c_pairs",
            "d_pairs",
            "t0",
            "t1",
            "t2",
            F.expr(_KENDALL_MILLI).alias("tau_b_milli"),
        )
        .orderBy("brand")
    )


# --------------------------------------------------------------------------
# Brown-Forsythe (median-based Levene) variance homogeneity test.
# --------------------------------------------------------------------------

#: One-way ANOVA F on |x - group_median|, from exact integer
#: components pivoted to one row: S_j = SUM(z) and Q = SUM(z^2) per
#: group. F = ((N-k)/(k-1)) * (SUM_j S_j^2/n_j - T^2/N)
#:                          / (Q - SUM_j S_j^2/n_j),
#: five group terms summed in fixed textual order; floor-milli.
_BF_BETWEEN = (
    "(CAST(s_urgent AS DOUBLE) * CAST(s_urgent AS DOUBLE) / CAST(n_urgent AS DOUBLE)"
    " + CAST(s_high AS DOUBLE) * CAST(s_high AS DOUBLE) / CAST(n_high AS DOUBLE)"
    " + CAST(s_medium AS DOUBLE) * CAST(s_medium AS DOUBLE) / CAST(n_medium AS DOUBLE)"
    " + CAST(s_notspec AS DOUBLE) * CAST(s_notspec AS DOUBLE) / CAST(n_notspec AS DOUBLE)"
    " + CAST(s_low AS DOUBLE) * CAST(s_low AS DOUBLE) / CAST(n_low AS DOUBLE))"
)
_BF_T = "(CAST(s_urgent + s_high + s_medium + s_notspec + s_low AS DOUBLE))"
_BF_F_MILLI = (
    f"CAST(FLOOR(((CAST(n AS DOUBLE) - 5.0) / 4.0)"
    f" * ({_BF_BETWEEN} - {_BF_T} * {_BF_T} / CAST(n AS DOUBLE))"
    f" / (CAST(q_dec AS DOUBLE) - {_BF_BETWEEN})"
    f" * 1000.0) AS BIGINT)"
)

_BF_SQL = f"""
WITH tagged AS (
    SELECT o_orderpriority AS prio,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
    FROM orders
),
med AS (
    SELECT prio,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS BIGINT)
               AS med_cents
    FROM tagged GROUP BY prio
),
z AS (
    SELECT t.prio, CAST(abs(t.cents - m.med_cents) AS BIGINT) AS z
    FROM tagged t JOIN med m ON m.prio = t.prio
),
comp AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN prio = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
           CAST(SUM(CASE WHEN prio = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           CAST(SUM(CASE WHEN prio = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS n_medium,
           CAST(SUM(CASE WHEN prio = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS n_notspec,
           CAST(SUM(CASE WHEN prio = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(SUM(CASE WHEN prio = '1-URGENT' THEN z ELSE 0 END) AS BIGINT) AS s_urgent,
           CAST(SUM(CASE WHEN prio = '2-HIGH' THEN z ELSE 0 END) AS BIGINT) AS s_high,
           CAST(SUM(CASE WHEN prio = '3-MEDIUM' THEN z ELSE 0 END) AS BIGINT) AS s_medium,
           CAST(SUM(CASE WHEN prio = '4-NOT SPECIFIED' THEN z ELSE 0 END) AS BIGINT) AS s_notspec,
           CAST(SUM(CASE WHEN prio = '5-LOW' THEN z ELSE 0 END) AS BIGINT) AS s_low,
           CAST(SUM(CAST(z AS DECIMAL(20,0)) * z) AS DECIMAL(38,0)) AS q_dec
    FROM z
)
SELECT n, n_urgent, n_high, n_medium, n_notspec, n_low,
       s_urgent, s_high, s_medium, s_notspec, s_low,
       CAST(q_dec AS STRING) AS sum_z_sq,
       {_BF_F_MILLI} AS f_milli,
       {_BF_F_MILLI} > 2371 AS reject_at_05
FROM comp
"""


@register(
    "brown_forsythe_priority_spend",
    _BF_SQL,
    doc="Brown-Forsythe variance-homogeneity test: do the five order "
    "priorities have the same spend SPREAD (not location)? One-way "
    "ANOVA F on |x - group median| — the median-based Levene "
    "variant, robust to the heavy right tail of spend. Group medians "
    "are exact via percentile_disc (cross-engine exact per the "
    "round-5 boundary fixtures), absolute deviations are exact int "
    "cents, S_j and Q accumulate exactly (Q in DECIMAL(38), "
    "surfaced as VARCHAR); the only float is one shared IEEE "
    "expression with fixed term order, floor-milli "
    "(F_{{4,inf,.05}} = 2.37193, floored-milli compare f_milli > 2371 "
    "matching the floored statistic). Scale: one "
    "map-combinable median per group (5 groups), one broadcast "
    "join back, one grouped pivot agg — no window over the fact; "
    "S_j stays under int64 to ~1e11 orders of cent-scale "
    "deviations.",
)
def q_brown_forsythe_priority_spend(spark, sf_dir):
    tagged = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    med = tagged.groupBy("prio").agg(
        F.expr(
            "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS BIGINT)"
        ).alias("med_cents")
    )
    z = tagged.join(F.broadcast(med), "prio").select(
        "prio", F.abs(F.col("cents") - F.col("med_cents")).cast("long").alias("z")
    )
    cnt = lambda p: (  # noqa: E731
        F.sum(F.when(F.col("prio") == p, 1).otherwise(0)).cast("long")
    )
    s = lambda p: (  # noqa: E731
        F.sum(F.when(F.col("prio") == p, F.col("z")).otherwise(0)).cast("long")
    )
    comp = z.agg(
        F.count("*").cast("long").alias("n"),
        cnt("1-URGENT").alias("n_urgent"),
        cnt("2-HIGH").alias("n_high"),
        cnt("3-MEDIUM").alias("n_medium"),
        cnt("4-NOT SPECIFIED").alias("n_notspec"),
        cnt("5-LOW").alias("n_low"),
        s("1-URGENT").alias("s_urgent"),
        s("2-HIGH").alias("s_high"),
        s("3-MEDIUM").alias("s_medium"),
        s("4-NOT SPECIFIED").alias("s_notspec"),
        s("5-LOW").alias("s_low"),
        F.sum(F.col("z").cast("decimal(20,0)") * F.col("z"))
        .cast("decimal(38,0)")
        .alias("q_dec"),
    )
    return comp.select(
        "n",
        "n_urgent",
        "n_high",
        "n_medium",
        "n_notspec",
        "n_low",
        "s_urgent",
        "s_high",
        "s_medium",
        "s_notspec",
        "s_low",
        F.col("q_dec").cast("string").alias("sum_z_sq"),
        F.expr(_BF_F_MILLI).alias("f_milli"),
        (F.expr(_BF_F_MILLI) > 2371).alias("reject_at_05"),
    )


# --------------------------------------------------------------------------
# Two-proportion z-test: PROMO vs non-PROMO return rates.
# --------------------------------------------------------------------------

#: Pooled two-proportion z from four exact integers, one shared IEEE
#: expression text; milli-floored. Relative risk the same way.
_PZ_MILLI = (
    "CAST(FLOOR((CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    " - CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE))"
    " / sqrt((CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))"
    "        * (1.0 - CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))"
    "        * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))"
    " * 1000.0) AS BIGINT)"
)
_PZ_RR_MILLI = (
    "CAST(FLOOR((CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE))"
    " / (CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE)) * 1000.0) AS BIGINT)"
)

_PZ_SQL = f"""
WITH tagged AS (
    SELECT p.p_type LIKE 'PROMO%' AS g1,
           CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
comp AS (
    SELECT CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(SUM(CASE WHEN g1 THEN ret ELSE 0 END) AS BIGINT) AS x1,
           CAST(SUM(CASE WHEN g1 THEN 0 ELSE 1 END) AS BIGINT) AS n2,
           CAST(SUM(CASE WHEN g1 THEN 0 ELSE ret END) AS BIGINT) AS x2
    FROM tagged
)
SELECT n1, x1, n2, x2,
       {_PZ_MILLI} AS z_milli,
       {_PZ_RR_MILLI} AS risk_ratio_milli,
       abs({_PZ_MILLI}) > 1959 AS reject_at_05
FROM comp
"""


@register(
    "two_proportion_ztest_returns",
    _PZ_SQL,
    doc="Two-proportion pooled z-test: do PROMO parts get returned at "
    "a different rate than non-promo parts? The categorical "
    "counterpart of mannwhitney_u_quantity on the same cohort split "
    "— four exact integer counts from one fused conditional "
    "aggregate, then the pooled z and the relative risk each as ONE "
    "shared IEEE expression, milli-floored. Scale: one broadcast "
    "dim join + one map-combinable agg to a single row; nothing "
    "else. The pure-count shape means it survives any fact scale "
    "unchanged.",
)
def q_two_proportion_ztest_returns(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_type").like("PROMO%").alias("g1")
    )
    tagged = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    comp = tagged.agg(
        F.sum(F.when(F.col("g1"), 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("g1"), F.col("ret")).otherwise(0))
        .cast("long")
        .alias("x1"),
        F.sum(F.when(F.col("g1"), 0).otherwise(1)).cast("long").alias("n2"),
        F.sum(F.when(F.col("g1"), 0).otherwise(F.col("ret")))
        .cast("long")
        .alias("x2"),
    )
    return comp.select(
        "n1",
        "x1",
        "n2",
        "x2",
        F.expr(_PZ_MILLI).alias("z_milli"),
        F.expr(_PZ_RR_MILLI).alias("risk_ratio_milli"),
        (F.abs(F.expr(_PZ_MILLI)) > 1959).alias("reject_at_05"),
    )


# --------------------------------------------------------------------------
# Distribution-free median CI from order statistics.
# --------------------------------------------------------------------------

#: Normal-approximation binomial rank bounds for the median CI:
#: lo = floor((n - z*sqrt(n))/2), hi = n + 1 - lo; z = 1.959964.
#: sqrt is correctly rounded, so the ranks are identical cross-engine.
_MCI_LO = (
    "GREATEST(CAST(FLOOR((CAST(n AS DOUBLE)"
    " - 1.959964 * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT), 1)"
)

_MCI_SQL = f"""
WITH tagged AS (
    SELECT o_orderpriority AS prio,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
    FROM orders
),
per_value AS (
    SELECT prio, cents, CAST(COUNT(*) AS BIGINT) AS t
    FROM tagged GROUP BY prio, cents
),
cum AS (
    SELECT prio, cents, t,
           CAST(SUM(t) OVER (PARTITION BY prio ORDER BY cents) - t AS BIGINT)
               AS below,
           CAST(SUM(t) OVER (PARTITION BY prio) AS BIGINT) AS n
    FROM per_value
),
ranks AS (
    SELECT prio, CAST(MAX(n) AS BIGINT) AS n,
           {_MCI_LO.replace("n AS DOUBLE", "MAX(n) AS DOUBLE").replace("CAST(FLOOR", "CAST(FLOOR")} AS r_lo
    FROM cum GROUP BY prio
),
ranks3 AS (
    SELECT prio, n, r_lo,
           CAST((n + 1) // 2 AS BIGINT) AS r_med,
           n + 1 - r_lo AS r_hi
    FROM ranks
),
unp AS (
    SELECT prio, n, 'lo' AS which, r_lo AS r FROM ranks3
    UNION ALL SELECT prio, n, 'med', r_med FROM ranks3
    UNION ALL SELECT prio, n, 'hi', r_hi FROM ranks3
),
picked AS (
    SELECT u.prio, u.n, u.which, c.cents
    FROM unp u JOIN cum c
      ON c.prio = u.prio AND c.below < u.r AND u.r <= c.below + c.t
)
SELECT prio AS priority, CAST(MAX(n) AS BIGINT) AS n,
       CAST(MAX(CASE WHEN which = 'med' THEN cents END) AS BIGINT)
           AS median_cents,
       CAST(MAX(CASE WHEN which = 'lo' THEN cents END) AS BIGINT)
           AS ci_lo_cents,
       CAST(MAX(CASE WHEN which = 'hi' THEN cents END) AS BIGINT)
           AS ci_hi_cents
FROM picked GROUP BY prio ORDER BY prio
"""


@register(
    "median_ci_order_statistic",
    _MCI_SQL,
    doc="Distribution-free 95% CI for the median spend per priority "
    "via binomial order-statistic rank bounds (lo = "
    "floor((n - 1.96*sqrt(n))/2), hi = n+1-lo) — no resampling, no "
    "normality assumption: the exact-rank complement to "
    "bootstrap_mean_ci's B-replica machinery at a tiny fraction of "
    "its cost. Rank selection happens at the DISTINCT-VALUE grain "
    "via cumulative counts (below < r <= below+t), never a per-row "
    "sort — picking the r-th order statistic of 100 TB costs one "
    "map-combinable value-grain agg plus one per-group cumsum, the "
    "MWU discipline. The only float is the rank formula's sqrt "
    "(correctly rounded, identical cross-engine).",
)
def q_median_ci_order_statistic(spark, sf_dir):
    tagged = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    per_value = tagged.groupBy("prio", "cents").agg(
        F.count("*").cast("long").alias("t")
    )
    w_cum = Window.partitionBy("prio").orderBy("cents")
    w_all = Window.partitionBy("prio")
    cum = per_value.select(
        "prio",
        "cents",
        "t",
        (F.sum("t").over(w_cum) - F.col("t")).cast("long").alias("below"),
        F.sum("t").over(w_all).cast("long").alias("n"),
    ).localCheckpoint(eager=False)
    ranks = cum.groupBy("prio").agg(
        F.max("n").cast("long").alias("n"),
    )
    ranks3 = ranks.select(
        "prio",
        "n",
        F.expr(_MCI_LO).alias("r_lo"),
        F.expr("CAST((n + 1) DIV 2 AS BIGINT)").alias("r_med"),
    ).withColumn("r_hi", F.col("n") + 1 - F.col("r_lo"))
    unp = (
        ranks3.select("prio", "n", F.lit("lo").alias("which"), F.col("r_lo").alias("r"))
        .unionByName(
            ranks3.select(
                "prio", "n", F.lit("med").alias("which"), F.col("r_med").alias("r")
            )
        )
        .unionByName(
            ranks3.select(
                "prio", "n", F.lit("hi").alias("which"), F.col("r_hi").alias("r")
            )
        )
    )
    picked = F.broadcast(
        unp.withColumnRenamed("prio", "uprio")
    ).join(
        cum.select("prio", "cents", "t", "below"),
        (F.col("prio") == F.col("uprio"))
        & (F.col("below") < F.col("r"))
        & (F.col("r") <= F.col("below") + F.col("t")),
    )
    return (
        picked.groupBy(F.col("uprio").alias("priority"))
        .agg(
            F.max("n").cast("long").alias("n"),
            F.max(F.when(F.col("which") == "med", F.col("cents")))
            .cast("long")
            .alias("median_cents"),
            F.max(F.when(F.col("which") == "lo", F.col("cents")))
            .cast("long")
            .alias("ci_lo_cents"),
            F.max(F.when(F.col("which") == "hi", F.col("cents")))
            .cast("long")
            .alias("ci_hi_cents"),
        )
        .orderBy("priority")
    )


# --------------------------------------------------------------------------
# Exact-matching average treatment effect on the treated (ATT).
# --------------------------------------------------------------------------

#: Per-cell ATT numerator (sum_t*n_c - n_t*sum_c), exact int64, turned
#: into a signed per-cell milli term with the explicit-sign floor
#: CASE, then integer-summed — the quantization point is the CELL, so
#: the estimator is deterministic and the floor loss is bounded by
#: one milli-cent per cell.
_ATT_CELL_MILLI = (
    "CASE WHEN (sum_t * n_c - n_t * sum_c) >= 0"
    " THEN ((sum_t * n_c - n_t * sum_c) * 1000) {div} n_c"
    " ELSE -((-(sum_t * n_c - n_t * sum_c) * 1000) {div} n_c)"
    "      - (CASE WHEN (-(sum_t * n_c - n_t * sum_c) * 1000) % n_c > 0"
    "              THEN 1 ELSE 0 END)"
    " END"
)

_ATT_SQL = f"""
WITH tagged AS (
    SELECT p.p_brand AS brand,
           CAST(CAST(l.l_quantity AS DECIMAL(18,2)) AS BIGINT) AS q,
           p.p_type LIKE 'PROMO%' AS treated,
           CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
cells AS (
    SELECT brand, q,
           CAST(SUM(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
           CAST(SUM(CASE WHEN treated THEN cents ELSE 0 END) AS BIGINT)
               AS sum_t,
           CAST(SUM(CASE WHEN treated THEN 0 ELSE 1 END) AS BIGINT) AS n_c,
           CAST(SUM(CASE WHEN treated THEN 0 ELSE cents END) AS BIGINT)
               AS sum_c
    FROM tagged GROUP BY brand, q
),
matched AS (SELECT * FROM cells WHERE n_t > 0 AND n_c > 0),
comp AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells_matched,
           CAST(SUM(n_t) AS BIGINT) AS n_treated_matched,
           CAST(SUM({_ATT_CELL_MILLI.format(div="//")}) AS BIGINT)
               AS att_num_milli
    FROM matched
),
unmatched AS (
    SELECT CAST(COALESCE(SUM(n_t), 0) AS BIGINT) AS n_treated_unmatched
    FROM cells WHERE n_t > 0 AND n_c = 0
)
SELECT c.n_cells_matched, c.n_treated_matched, u.n_treated_unmatched,
       CAST(c.att_num_milli AS BIGINT) AS att_num_milli,
       CAST(CASE WHEN c.att_num_milli >= 0
                 THEN c.att_num_milli // c.n_treated_matched
                 ELSE -((-c.att_num_milli) // c.n_treated_matched)
                      - (CASE WHEN (-c.att_num_milli) % c.n_treated_matched > 0
                              THEN 1 ELSE 0 END)
            END AS BIGINT) AS att_milli_cents
FROM comp c CROSS JOIN unmatched u
"""


@register(
    "exact_matching_att",
    _ATT_SQL,
    doc="Exact-matching causal estimate: the average treatment effect "
    "on the treated of PROMO parts on line price, matching each "
    "treated line to control lines in the SAME (brand, quantity) "
    "cell — the confounder-adjusted complement to "
    "two_proportion_ztest_returns' raw comparison and promo_did_"
    "uplift's time-based identification. Per-cell mean differences "
    "are cross-multiplied exact ints quantized to signed milli-cents "
    "at the cell (explicit-sign floor CASE — theil_sen's idiom), "
    "then weighted by treated count via plain integer sums; "
    "unmatched treated lines (cells with no control) are counted, "
    "not silently dropped. Scale: the fact reduces to the bounded "
    "(brand x quantity) cell grain in one map-combinable agg — "
    "matching at 100 TB is one grouped aggregate, never a row join.",
)
def q_exact_matching_att(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("decimal(18,2)").cast("long").alias("q"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", F.col("p_type").like("PROMO%").alias("treated")
    )
    tagged = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cells = tagged.groupBy(F.col("p_brand").alias("brand"), "q").agg(
        F.sum(F.when(F.col("treated"), 1).otherwise(0)).cast("long").alias("n_t"),
        F.sum(F.when(F.col("treated"), F.col("cents")).otherwise(0))
        .cast("long")
        .alias("sum_t"),
        F.sum(F.when(F.col("treated"), 0).otherwise(1)).cast("long").alias("n_c"),
        F.sum(F.when(F.col("treated"), F.lit(0)).otherwise(F.col("cents")))
        .cast("long")
        .alias("sum_c"),
    ).localCheckpoint(eager=False)
    matched = cells.filter((F.col("n_t") > 0) & (F.col("n_c") > 0))
    comp = matched.agg(
        F.count("*").cast("long").alias("n_cells_matched"),
        F.sum("n_t").cast("long").alias("n_treated_matched"),
        F.sum(F.expr(_ATT_CELL_MILLI.format(div="DIV")))
        .cast("long")
        .alias("att_num_milli"),
    )
    unmatched = cells.filter((F.col("n_t") > 0) & (F.col("n_c") == 0)).agg(
        F.coalesce(F.sum("n_t"), F.lit(0)).cast("long").alias("n_treated_unmatched")
    )
    return comp.crossJoin(F.broadcast(unmatched)).select(
        "n_cells_matched",
        "n_treated_matched",
        "n_treated_unmatched",
        "att_num_milli",
        F.expr(
            "CAST(CASE WHEN att_num_milli >= 0"
            " THEN att_num_milli DIV n_treated_matched"
            " ELSE -((-att_num_milli) DIV n_treated_matched)"
            "      - (CASE WHEN (-att_num_milli) % n_treated_matched > 0"
            "              THEN 1 ELSE 0 END)"
            " END AS BIGINT)"
        ).alias("att_milli_cents"),
    )


# --------------------------------------------------------------------------
# Delta-method CI for a ratio metric (revenue per order).
# --------------------------------------------------------------------------

#: Var(Y/N per-entity ratio-of-sums) by the delta method:
#:   r = sum_y/sum_n,  se^2 = (Syy - 2r*Syn + r^2*Snn) / (n * nbar^2)
#: with Syy/Syn/Snn the CENTERED second moments of the per-entity
#: (y_i, n_i) pairs and nbar = sum_n/n. Layered shared-text floats
#: (distinct names per layer — the lateral-alias gotcha).
_DM_L1 = {
    "r": "CAST(sy AS DOUBLE) / CAST(sn AS DOUBLE)",
    "nbar": "CAST(sn AS DOUBLE) / CAST(n AS DOUBLE)",
    "c_yy": "CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)",
    "c_yn": "CAST(syn AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sn AS DOUBLE) / CAST(n AS DOUBLE)",
    "c_nn": "CAST(snn AS DOUBLE) - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE) / CAST(n AS DOUBLE)",
}
_DM_OUT = {
    "ratio_milli": "CAST(FLOOR(r * 1000.0) AS BIGINT)",
    "se_milli": (
        "CAST(FLOOR(sqrt((c_yy - 2.0 * r * c_yn + r * r * c_nn)"
        " / (CAST(n AS DOUBLE) - 1.0))"
        " / (sqrt(CAST(n AS DOUBLE)) * nbar) * 1000.0) AS BIGINT)"
    ),
}

_DM_SQL = f"""
WITH per_cust AS (
    SELECT o_custkey,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                // 100 AS BIGINT) AS y,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM orders GROUP BY o_custkey
),
comp AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(cnt) AS BIGINT) AS sn,
           CAST(SUM(y * y) AS BIGINT) AS syy,
           CAST(SUM(y * cnt) AS BIGINT) AS syn,
           CAST(SUM(cnt * cnt) AS BIGINT) AS snn
    FROM per_cust
),
l1 AS (SELECT n, sy, sn, {", ".join(f"{v} AS {k}" for k, v in _DM_L1.items())} FROM comp)
SELECT n, sy AS total_dollars, sn AS total_orders,
       {_DM_OUT["ratio_milli"]} AS ratio_milli,
       {_DM_OUT["se_milli"]} AS se_milli,
       {_DM_OUT["ratio_milli"]} - 1960 * {_DM_OUT["se_milli"]} // 1000
           AS ci_lo_milli_approx,
       {_DM_OUT["ratio_milli"]} + 1960 * {_DM_OUT["se_milli"]} // 1000
           AS ci_hi_milli_approx
FROM l1
"""


@register(
    "ratio_metric_delta_ci",
    _DM_SQL,
    doc="Delta-method CI for a ratio-of-sums metric (dollars per "
    "order, customers as the randomization unit) — THE standard "
    "machinery for experiment metrics whose numerator and "
    "denominator are both random (naive per-row variance is wrong "
    "because orders cluster within customers). Per-customer pairs "
    "reduce to six exact int64 sums at the dollar grain; the variance expression is a layered shared-text float "
    "pipeline (each op correctly rounded), milli-floored; the CI "
    "endpoints are integer arithmetic on the floored stats. "
    "Completes the experimentation tier next to bootstrap_ab_diff_"
    "ci (resampling), cuped_adjusted_spend (variance reduction), "
    "split_srm_check (validity) and two_proportion_ztest_returns "
    "(proportions). Scale: one map-combinable entity agg to one "
    "row; y*y stays int64 while per-customer dollars < 3e9.",
)
def q_ratio_metric_delta_ci(spark, sf_dir):
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.expr(
                "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                " AS BIGINT)) DIV 100 AS BIGINT)"
            ).alias("y"),
            F.count("*").cast("long").alias("cnt"),
        )
    )
    comp = per_cust.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("cnt").cast("long").alias("sn"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("y") * F.col("cnt")).cast("long").alias("syn"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("snn"),
    )
    l1 = comp.select(
        "n", "sy", "sn", *[F.expr(v).alias(k) for k, v in _DM_L1.items()]
    )
    return l1.select(
        "n",
        F.col("sy").alias("total_dollars"),
        F.col("sn").alias("total_orders"),
        F.expr(_DM_OUT["ratio_milli"]).alias("ratio_milli"),
        F.expr(_DM_OUT["se_milli"]).alias("se_milli"),
        F.expr(
            f'{_DM_OUT["ratio_milli"]} - 1960 * {_DM_OUT["se_milli"]} DIV 1000'
        ).alias("ci_lo_milli_approx"),
        F.expr(
            f'{_DM_OUT["ratio_milli"]} + 1960 * {_DM_OUT["se_milli"]} DIV 1000'
        ).alias("ci_hi_milli_approx"),
    )


# --------------------------------------------------------------------------
# Experiment power: minimum detectable effect for the spend metric.
# --------------------------------------------------------------------------

#: MDE = (z_{alpha/2} + z_{beta}) * sqrt(var * (1/n1 + 1/n2)) with
#: 1.959964 + 0.841621 for 95% confidence / 80% power. Layered
#: shared-text floats from exact int64 sums (dollar grain).
_MDE_L1 = {
    "var_d": (
        "(CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))"
        " / (CAST(n AS DOUBLE) - 1.0)"
    ),
}
_MDE_OUT = (
    "CAST(FLOOR(2.801585 * sqrt(var_d"
    " * (1.0 / (CAST(n AS DOUBLE) * {w1}) + 1.0 / (CAST(n AS DOUBLE) * {w2})))"
    " * 1000.0) AS BIGINT)"
)

_MDE_SQL = f"""
WITH per_cust AS (
    SELECT CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                // 100 AS BIGINT) AS y
    FROM orders GROUP BY o_custkey
),
comp AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(y * y) AS BIGINT) AS syy
    FROM per_cust
),
l1 AS (SELECT n, sy, {_MDE_L1["var_d"]} AS var_d FROM comp)
SELECT n, sy AS total_dollars,
       CAST(FLOOR(sqrt(var_d) * 1000.0) AS BIGINT) AS sd_milli_dollars,
       {_MDE_OUT.format(w1="0.5", w2="0.5")} AS mde_50_50_milli,
       {_MDE_OUT.format(w1="0.9", w2="0.1")} AS mde_90_10_milli,
       CAST(FLOOR({_MDE_OUT.format(w1="0.5", w2="0.5")} * 1000000.0
            / (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) * 1000.0))
            AS BIGINT) AS mde_50_50_rel_ppm
FROM l1
"""


@register(
    "experiment_power_mde",
    _MDE_SQL,
    doc="Pre-experiment power analysis: the minimum detectable effect "
    "on per-customer spend at 95% confidence / 80% power, for a "
    "50/50 and a 90/10 split of the current population — the "
    "'should we even run this test' number that gates every "
    "experiment, and the quantified argument for 50/50 over "
    "unbalanced splits (the 90/10 MDE is ~1.67x larger). Variance "
    "comes from exact int64 dollar-grain sums; z-constants are "
    "shared literals; two layered float expressions, milli-floored, "
    "plus the relative MDE in ppm of the mean. Completes the "
    "experimentation tier with ratio_metric_delta_ci / "
    "split_srm_check / bootstrap_ab_diff_ci / cuped_adjusted_spend. "
    "Scale: one entity agg to one row.",
)
def q_experiment_power_mde(spark, sf_dir):
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.expr(
                "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                " AS BIGINT)) DIV 100 AS BIGINT)"
            ).alias("y")
        )
    )
    comp = per_cust.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    l1 = comp.select("n", "sy", F.expr(_MDE_L1["var_d"]).alias("var_d"))
    return l1.select(
        "n",
        F.col("sy").alias("total_dollars"),
        F.expr("CAST(FLOOR(sqrt(var_d) * 1000.0) AS BIGINT)").alias(
            "sd_milli_dollars"
        ),
        F.expr(_MDE_OUT.format(w1="0.5", w2="0.5")).alias("mde_50_50_milli"),
        F.expr(_MDE_OUT.format(w1="0.9", w2="0.1")).alias("mde_90_10_milli"),
        F.expr(
            f'CAST(FLOOR({_MDE_OUT.format(w1="0.5", w2="0.5")} * 1000000.0'
            " / (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) * 1000.0))"
            " AS BIGINT)"
        ).alias("mde_50_50_rel_ppm"),
    )


# --------------------------------------------------------------------------
# Mediation decomposition: discount -> quantity -> line revenue.
# --------------------------------------------------------------------------

#: Baron-Kenny product-of-coefficients with the OLS identity
#: total = direct + indirect surfaced as a check column. Layered
#: shared-text floats from exact int64 sums.
_MED_L1 = {
    "c_xx": "CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)",
    "c_xm": "CAST(sxm AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)",
    "c_xy": "CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)",
    "c_mm": "CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)",
    "c_my": "CAST(smy AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)",
}
_MED_L2 = {
    "a_slope": "c_xm / c_xx",
    "b_slope": "(c_xx * c_my - c_xm * c_xy) / (c_xx * c_mm - c_xm * c_xm)",
    "c_direct": "(c_mm * c_xy - c_xm * c_my) / (c_xx * c_mm - c_xm * c_xm)",
    "c_total": "c_xy / c_xx",
}

_MED_SQL = f"""
WITH base AS (
    SELECT CAST(CAST(l_discount AS DECIMAL(18,3)) * 1000 AS BIGINT) AS x,
           CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT) AS m,
           CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               // 100 AS BIGINT) AS y
    FROM lineitem
),
comp AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(m) AS BIGINT) AS sm,
           CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x * x) AS BIGINT) AS sxx,
           CAST(SUM(x * m) AS BIGINT) AS sxm,
           CAST(SUM(x * y) AS BIGINT) AS sxy,
           CAST(SUM(m * m) AS BIGINT) AS smm,
           CAST(SUM(m * y) AS BIGINT) AS smy
    FROM base
),
l1 AS (SELECT n, {", ".join(f"{v} AS {k}" for k, v in _MED_L1.items())} FROM comp),
l2 AS (SELECT n, {", ".join(f"{v} AS {k}" for k, v in _MED_L2.items())} FROM l1)
SELECT n,
       CAST(FLOOR(a_slope * 1000000.0) AS BIGINT) AS a_micro,
       CAST(FLOOR(b_slope * 1000000.0) AS BIGINT) AS b_micro,
       CAST(FLOOR(c_total * 1000000.0) AS BIGINT) AS total_micro,
       CAST(FLOOR(c_direct * 1000000.0) AS BIGINT) AS direct_micro,
       CAST(FLOOR(a_slope * b_slope * 1000000.0) AS BIGINT) AS indirect_micro,
       ABS(c_total - (c_direct + a_slope * b_slope)) < 1e-6 AS identity_holds
FROM l2
"""


@register(
    "discount_quantity_mediation",
    _MED_SQL,
    doc="Mediation decomposition (Baron-Kenny product of "
    "coefficients): how much of the discount->line-revenue effect "
    "flows THROUGH quantity (indirect a*b) vs directly "
    "(price-controlling-quantity), with the exact OLS identity "
    "total = direct + indirect surfaced as a check column — the "
    "mechanism question sitting behind "
    "brand_discount_elasticity_components' single regression. "
    "Nine exact int64 sums at scan grain (revenue re-grained to "
    "dollars), the same layered shared-text float pipeline as "
    "granger_causality_screen, all five slopes micro-floored. "
    "Scale: one fused map-combinable agg to one row; x*y products "
    "stay int64 to ~1e14 rows.",
)
def q_discount_quantity_mediation(spark, sf_dir):
    base = load_table(spark, sf_dir, "lineitem").select(
        F.expr("CAST(CAST(l_discount AS DECIMAL(18,3)) * 1000 AS BIGINT)").alias(
            "x"
        ),
        F.col("l_quantity").cast("decimal(18,2)").cast("long").alias("m"),
        F.expr(
            "CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " DIV 100 AS BIGINT)"
        ).alias("y"),
    )
    comp = base.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("m").cast("long").alias("sm"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("m")).cast("long").alias("sxm"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("m") * F.col("m")).cast("long").alias("smm"),
        F.sum(F.col("m") * F.col("y")).cast("long").alias("smy"),
    )
    l1 = comp.select("n", *[F.expr(v).alias(k) for k, v in _MED_L1.items()])
    l2 = l1.select("n", *[F.expr(v).alias(k) for k, v in _MED_L2.items()])
    return l2.select(
        "n",
        F.expr("CAST(FLOOR(a_slope * 1000000.0) AS BIGINT)").alias("a_micro"),
        F.expr("CAST(FLOOR(b_slope * 1000000.0) AS BIGINT)").alias("b_micro"),
        F.expr("CAST(FLOOR(c_total * 1000000.0) AS BIGINT)").alias("total_micro"),
        F.expr("CAST(FLOOR(c_direct * 1000000.0) AS BIGINT)").alias(
            "direct_micro"
        ),
        F.expr("CAST(FLOOR(a_slope * b_slope * 1000000.0) AS BIGINT)").alias(
            "indirect_micro"
        ),
        F.expr(
            "ABS(c_total - (c_direct + a_slope * b_slope)) < 1e-6"
        ).alias("identity_holds"),
    )


# --------------------------------------------------------------------------
# Split-conformal prediction intervals for order value.
# --------------------------------------------------------------------------

#: Split conformal: fit a trivial per-segment mean predictor on the
#: proper-training half, take the ceil((n_cal+1)*0.95)-th smallest
#: absolute residual on the calibration quarter as the interval
#: half-width, then MEASURE coverage on the held-out test quarter.
#: Everything is exact integers: hash split, cent residuals,
#: order-statistic selection at the distinct-value grain.


def _conformal_sql() -> str:
    from ecom_churn_lakehouse_spark.operators.sampling import hash_bucket_sql

    hb = hash_bucket_sql("o.o_orderkey", "conf:", 4)
    return f"""
WITH base AS (
    SELECT c.c_mktsegment AS segment,
           CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
           CAST({hb} AS BIGINT) AS fold
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
predictor AS (
    SELECT segment,
           CAST(SUM(cents) // COUNT(*) AS BIGINT) AS pred_cents
    FROM base WHERE fold < 2 GROUP BY segment
),
cal AS (
    SELECT b.segment, CAST(abs(b.cents - p.pred_cents) AS BIGINT) AS r
    FROM base b JOIN predictor p ON p.segment = b.segment
    WHERE b.fold = 2
),
cal_n AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_cal
          FROM cal GROUP BY segment),
per_value AS (
    SELECT segment, r, CAST(COUNT(*) AS BIGINT) AS t FROM cal
    GROUP BY segment, r
),
cum AS (
    SELECT segment, r, t,
           CAST(SUM(t) OVER (PARTITION BY segment ORDER BY r) - t AS BIGINT)
               AS below
    FROM per_value
),
qhat AS (
    SELECT c.segment, MIN(c.r) AS q_cents
    FROM cum c JOIN cal_n n ON n.segment = c.segment
    WHERE c.below + c.t >= CAST(CEIL((n.n_cal + 1) * 0.95) AS BIGINT)
    GROUP BY c.segment
),
test AS (
    SELECT b.segment,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN abs(b.cents - p.pred_cents) <= q.q_cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS covered
    FROM base b
    JOIN predictor p ON p.segment = b.segment
    JOIN qhat q ON q.segment = b.segment
    WHERE b.fold = 3
    GROUP BY b.segment
)
SELECT t.segment, n.n_cal, t.n_test,
       p.pred_cents, q.q_cents AS halfwidth_cents,
       t.covered,
       CAST(t.covered * 1000000 // t.n_test AS BIGINT) AS coverage_ppm
FROM test t
JOIN cal_n n ON n.segment = t.segment
JOIN predictor p ON p.segment = t.segment
JOIN qhat q ON q.segment = t.segment
ORDER BY t.segment
"""


@register(
    "conformal_spend_intervals",
    _conformal_sql(),
    doc="Split-conformal prediction intervals: a per-segment mean "
    "predictor fit on half the orders, the 95% conformal quantile "
    "of absolute calibration residuals as the interval half-width, "
    "and the finite-sample coverage guarantee VERIFIED on a "
    "held-out quarter — distribution-free uncertainty for any "
    "point predictor, the deployment-grade alternative to the "
    "normal-theory CIs elsewhere in this tier. Folds come from the "
    "shared md5 bucket; the conformal quantile is the "
    "ceil((n+1)*0.95)-th order statistic selected at the "
    "distinct-residual grain (below+t >= rank — the MWU "
    "discipline); coverage is exact ppm. Scale: one fused scan, "
    "per-segment grouped aggs, one per-segment value-grain "
    "cumsum — no row sort, no fact join beyond the broadcast "
    "predictor.",
)
def q_conformal_spend_intervals(spark, sf_dir):
    from ecom_churn_lakehouse_spark.operators.sampling import hash_bucket

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    base = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
        hash_bucket(F.col("o_orderkey"), "conf:", mod=4).alias("fold"),
    ).localCheckpoint(eager=False)
    predictor = (
        base.filter(F.col("fold") < 2)
        .groupBy("segment")
        .agg(F.expr("CAST(SUM(cents) DIV COUNT(*) AS BIGINT)").alias("pred_cents"))
    )
    cal = (
        base.filter(F.col("fold") == 2)
        .join(F.broadcast(predictor), "segment")
        .select(
            "segment",
            F.abs(F.col("cents") - F.col("pred_cents")).cast("long").alias("r"),
        )
    )
    cal_n = cal.groupBy("segment").agg(F.count("*").cast("long").alias("n_cal"))
    per_value = cal.groupBy("segment", "r").agg(
        F.count("*").cast("long").alias("t")
    )
    w = Window.partitionBy("segment").orderBy("r")
    cum = per_value.select(
        "segment",
        "r",
        "t",
        (F.sum("t").over(w) - F.col("t")).cast("long").alias("below"),
    )
    qhat = (
        cum.join(F.broadcast(cal_n), "segment")
        .filter(
            F.col("below") + F.col("t")
            >= F.expr("CAST(CEIL((n_cal + 1) * 0.95) AS BIGINT)")
        )
        .groupBy("segment")
        .agg(F.min("r").alias("q_cents"))
    )
    test = (
        base.filter(F.col("fold") == 3)
        .join(F.broadcast(predictor), "segment")
        .join(F.broadcast(qhat), "segment")
        .groupBy("segment")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("cents") - F.col("pred_cents")) <= F.col("q_cents"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("covered"),
        )
    )
    return (
        test.join(F.broadcast(cal_n), "segment")
        .join(F.broadcast(predictor), "segment")
        .join(F.broadcast(qhat), "segment")
        .select(
            "segment",
            "n_cal",
            "n_test",
            "pred_cents",
            F.col("q_cents").alias("halfwidth_cents"),
            "covered",
            F.expr("CAST(covered * 1000000 DIV n_test AS BIGINT)").alias(
                "coverage_ppm"
            ),
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# Hill tail-index estimator on order values.
# --------------------------------------------------------------------------

_HILL_K = 100

_HILL_SQL = f"""
WITH ranked AS (
    SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
           ROW_NUMBER() OVER (ORDER BY CAST(o_totalprice AS DECIMAL(18,2))
                              DESC, o_orderkey) AS rnk
    FROM orders
),
topk AS (SELECT cents, rnk FROM ranked WHERE rnk <= {_HILL_K + 1}),
ref AS (SELECT cents AS ref_cents FROM topk WHERE rnk = {_HILL_K + 1}),
terms AS (
    SELECT CAST(FLOOR(ln(CAST(t.cents AS DOUBLE)
                         / CAST(r.ref_cents AS DOUBLE)) * 1000000.0)
                AS BIGINT) AS log_micro
    FROM topk t CROSS JOIN ref r
    WHERE t.rnk <= {_HILL_K}
)
SELECT CAST({_HILL_K} AS BIGINT) AS k,
       (SELECT CAST(ref_cents AS BIGINT) FROM ref) AS threshold_cents,
       CAST(SUM(log_micro) AS BIGINT) AS sum_log_micro,
       CAST({_HILL_K * 1000000000} // SUM(log_micro) AS BIGINT)
           AS hill_alpha_milli
FROM terms
"""


@register(
    "spend_tail_hill_estimator",
    _HILL_SQL,
    doc=f"Hill tail-index estimator: alpha = k / SUM ln(x_i/x_(k+1)) "
    f"over the top-{_HILL_K} order values — the standard heavy-tail "
    "exponent that says whether extreme orders follow a power law "
    "(alpha < 2: infinite variance, winsorize before any mean-based "
    "metric) — the quantitative justification for "
    "winsorized_spend_stats sitting next to pareto_frontier_orders "
    "and revenue_gini_by_nation. Top-(k+1) selection is a "
    "TakeOrderedAndProject (per-partition top-k, k-sized driver "
    "merge — no global sort); each log term is floor-quantized "
    "micro from two exact ints BEFORE the integer sum (float "
    "accumulation order never matters); alpha is one non-negative "
    "integer DIV in milli. Scale: the only data-sized cost is the "
    "scan feeding top-k.",
)
def q_spend_tail_hill_estimator(spark, sf_dir):
    ranked = load_table(spark, sf_dir, "orders").select(
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
        F.col("o_orderkey"),
    )
    topk = (
        ranked.orderBy(F.col("cents").desc(), "o_orderkey")
        .limit(_HILL_K + 1)
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.col("cents").desc(), "o_orderkey")
            ),
        )
        .localCheckpoint(eager=False)
    )
    ref = topk.filter(F.col("rnk") == _HILL_K + 1).select(
        F.col("cents").alias("ref_cents")
    )
    terms = (
        topk.filter(F.col("rnk") <= _HILL_K)
        .crossJoin(F.broadcast(ref))
        .select(
            F.expr(
                "CAST(FLOOR(ln(CAST(cents AS DOUBLE)"
                " / CAST(ref_cents AS DOUBLE)) * 1000000.0) AS BIGINT)"
            ).alias("log_micro")
        )
    )
    agg = terms.agg(F.sum("log_micro").cast("long").alias("sum_log_micro"))
    return agg.crossJoin(F.broadcast(ref)).select(
        F.lit(_HILL_K).cast("long").alias("k"),
        F.col("ref_cents").cast("long").alias("threshold_cents"),
        "sum_log_micro",
        F.expr(
            f"CAST({_HILL_K * 1000000000} DIV sum_log_micro AS BIGINT)"
        ).alias("hill_alpha_milli"),
    )


# --------------------------------------------------------------------------
# James-Stein / empirical-Bayes shrinkage of per-brand price means.
# --------------------------------------------------------------------------

#: Method-of-moments EB normal model: lambda_b = s2w/(s2w + n_b*tau2),
#: tau2 = max(var(means) - s2w*mean(1/n_b), 0). Every order-dependent
#: sum is integer-quantized per brand BEFORE aggregation (ws_floor,
#: m_milli, h_nano); the per-brand shrinkage is one shared IEEE
#: expression over those exact ints.
_JS_LAMBDA = (
    "((CAST(q_tot AS DOUBLE) - CAST(sum_ws AS DOUBLE))"
    " / (CAST(n_tot AS DOUBLE) - CAST(b_tot AS DOUBLE)))"
    " / (((CAST(q_tot AS DOUBLE) - CAST(sum_ws AS DOUBLE))"
    "     / (CAST(n_tot AS DOUBLE) - CAST(b_tot AS DOUBLE)))"
    "    + CAST(n_b AS DOUBLE)"
    "      * GREATEST((CAST(sum_m2 AS DOUBLE)"
    "                  - CAST(sum_m AS DOUBLE) * CAST(sum_m AS DOUBLE)"
    "                    / CAST(b_tot AS DOUBLE))"
    "                 / (CAST(b_tot AS DOUBLE) - 1.0) / 1000000.0"
    "                 - ((CAST(q_tot AS DOUBLE) - CAST(sum_ws AS DOUBLE))"
    "                    / (CAST(n_tot AS DOUBLE) - CAST(b_tot AS DOUBLE)))"
    "                   * CAST(sum_h AS DOUBLE) / 1000000000.0"
    "                   / CAST(b_tot AS DOUBLE), 0.0))"
)
_JS_SHRUNK_MILLI = (
    f"CAST(FLOOR((CAST(s_tot AS DOUBLE) / CAST(n_tot AS DOUBLE)"
    f" + (1.0 - {_JS_LAMBDA})"
    f"   * (CAST(m_milli AS DOUBLE) / 1000.0"
    f"      - CAST(s_tot AS DOUBLE) / CAST(n_tot AS DOUBLE)))"
    f" * 1000.0) AS BIGINT)"
)

_JS_SQL = f"""
WITH base AS (
    SELECT p.p_brand AS brand,
           CAST(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                // 100 AS BIGINT) AS x
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
per_brand AS (
    SELECT brand,
           CAST(COUNT(*) AS BIGINT) AS n_b,
           CAST(SUM(x) * 1000 // COUNT(*) AS BIGINT) AS m_milli,
           CAST(FLOOR(CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)
                      / COUNT(*)) AS BIGINT) AS ws_floor,
           CAST(1000000000 // COUNT(*) AS BIGINT) AS h_nano
    FROM base GROUP BY brand
),
scalars AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_tot,
           CAST(SUM(x) AS BIGINT) AS s_tot,
           CAST(SUM(x * x) AS BIGINT) AS q_tot
    FROM base
),
bscalars AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS b_tot,
           CAST(SUM(ws_floor) AS BIGINT) AS sum_ws,
           CAST(SUM(m_milli) AS BIGINT) AS sum_m,
           CAST(SUM(m_milli * m_milli) AS BIGINT) AS sum_m2,
           CAST(SUM(h_nano) AS BIGINT) AS sum_h
    FROM per_brand
)
SELECT p.brand, p.n_b, p.m_milli AS mean_milli,
       CAST(FLOOR({_JS_LAMBDA} * 1000000.0) AS BIGINT) AS lambda_ppm,
       {_JS_SHRUNK_MILLI} AS shrunk_milli
FROM per_brand p CROSS JOIN scalars CROSS JOIN bscalars
ORDER BY p.brand
"""


@register(
    "james_stein_brand_means",
    _JS_SQL,
    doc="James-Stein / empirical-Bayes shrinkage of per-brand mean "
    "line price toward the grand mean, with the shrinkage weight "
    "lambda_b = s2w/(s2w + n_b*tau2) estimated from the data by "
    "method of moments — the small-area estimator that beats raw "
    "group means in total squared error whenever groups >= 3 "
    "(Stein's paradox), and the data-driven upgrade of "
    "target_encoding_brand's FIXED smoothing constant. Dollar "
    "grain; every order-dependent float sum is integer-quantized "
    "per brand first (floor(s^2/n), milli-means, nano-reciprocals) "
    "so aggregation order never matters; shrinkage is one shared "
    "IEEE expression per brand row. Scale: one fact pass to the "
    "25-brand grain, everything after runs on 25 rows.",
)
def q_james_stein_brand_means(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr(
            "CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " DIV 100 AS BIGINT)"
        ).alias("x"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    base = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        F.col("p_brand").alias("brand"), "x"
    )
    per_brand = base.groupBy("brand").agg(
        F.count("*").cast("long").alias("n_b"),
        F.expr("CAST(SUM(x) * 1000 DIV COUNT(*) AS BIGINT)").alias("m_milli"),
        F.expr(
            "CAST(FLOOR(CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)"
            " / COUNT(*)) AS BIGINT)"
        ).alias("ws_floor"),
        F.expr("CAST(1000000000 DIV COUNT(*) AS BIGINT)").alias("h_nano"),
    )
    scalars = base.agg(
        F.count("*").cast("long").alias("n_tot"),
        F.sum("x").cast("long").alias("s_tot"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q_tot"),
    )
    bscalars = per_brand.agg(
        F.count("*").cast("long").alias("b_tot"),
        F.sum("ws_floor").cast("long").alias("sum_ws"),
        F.sum("m_milli").cast("long").alias("sum_m"),
        F.sum(F.col("m_milli") * F.col("m_milli")).cast("long").alias("sum_m2"),
        F.sum("h_nano").cast("long").alias("sum_h"),
    )
    return (
        per_brand.crossJoin(F.broadcast(scalars))
        .crossJoin(F.broadcast(bscalars))
        .select(
            "brand",
            "n_b",
            F.col("m_milli").alias("mean_milli"),
            F.expr(f"CAST(FLOOR({_JS_LAMBDA} * 1000000.0) AS BIGINT)").alias(
                "lambda_ppm"
            ),
            F.expr(_JS_SHRUNK_MILLI).alias("shrunk_milli"),
        )
        .orderBy("brand")
    )


# --------------------------------------------------------------------------
# Cochran-Armitage trend test: return rate across ordered priorities.
# --------------------------------------------------------------------------

#: CA trend z with scores w = 1..5 over the ordered priority groups:
#:   T = SUM w_i*x_i - pbar * SUM w_i*n_i
#:   Var = pbar*(1-pbar) * (SUM w_i^2 n_i - (SUM w_i n_i)^2 / N)
#: pbar = X/N. One shared IEEE expression over six exact int64 sums.
_CA_Z_MILLI = (
    "CAST(FLOOR((CAST(swx AS DOUBLE)"
    " - CAST(x_tot AS DOUBLE) / CAST(n_tot AS DOUBLE) * CAST(swn AS DOUBLE))"
    " / sqrt(CAST(x_tot AS DOUBLE) / CAST(n_tot AS DOUBLE)"
    "        * (1.0 - CAST(x_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))"
    "        * (CAST(swwn AS DOUBLE)"
    "           - CAST(swn AS DOUBLE) * CAST(swn AS DOUBLE)"
    "             / CAST(n_tot AS DOUBLE)))"
    " * 1000.0) AS BIGINT)"
)

_CA_SQL = f"""
WITH tagged AS (
    SELECT CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT) AS w,
           CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
comp AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_tot,
           CAST(SUM(ret) AS BIGINT) AS x_tot,
           CAST(SUM(w * ret) AS BIGINT) AS swx,
           CAST(SUM(w) AS BIGINT) AS swn,
           CAST(SUM(w * w) AS BIGINT) AS swwn
    FROM tagged
)
SELECT n_tot, x_tot, swx, swn, swwn,
       {_CA_Z_MILLI} AS z_milli,
       abs({_CA_Z_MILLI}) > 1959 AS reject_at_05
FROM comp
"""


@register(
    "cochran_armitage_trend_test",
    _CA_SQL,
    doc="Cochran-Armitage trend test: does the lineitem return rate "
    "trend MONOTONICALLY across the five ordered priorities "
    "(scores 1..5 parsed from the priority label)? The "
    "ordered-categories test that promo_chisq_independence cannot "
    "express (chi-square ignores order, burning power against a "
    "monotone alternative). Five exact int64 sums from one fused "
    "agg; the trend z is one shared IEEE expression, milli-floored. "
    "Scale: one equi-join on the fact shuffle key plus one "
    "map-combinable agg to a single row.",
)
def q_cochran_armitage_trend_test(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.substring("o_orderpriority", 1, 1).cast("long").alias("w"),
    )
    tagged = li.join(orders, li.l_orderkey == orders.o_orderkey)
    comp = tagged.agg(
        F.count("*").cast("long").alias("n_tot"),
        F.sum("ret").cast("long").alias("x_tot"),
        F.sum(F.col("w") * F.col("ret")).cast("long").alias("swx"),
        F.sum("w").cast("long").alias("swn"),
        F.sum(F.col("w") * F.col("w")).cast("long").alias("swwn"),
    )
    return comp.select(
        "n_tot",
        "x_tot",
        "swx",
        "swn",
        "swwn",
        F.expr(_CA_Z_MILLI).alias("z_milli"),
        (F.abs(F.expr(_CA_Z_MILLI)) > 1959).alias("reject_at_05"),
    )


# --------------------------------------------------------------------------
# Wasserstein-1 distance between PROMO and non-PROMO spend.
# --------------------------------------------------------------------------

#: W1 = integral |F1 - F2| dx over the merged value grid, computed as
#: SUM over grid steps of |cum1*n2 - cum2*n1| * gap accumulated in
#: DECIMAL(38)/HUGEINT (per-step products exceed int64), normalized
#: by n1*n2 at the end. Everything exact integers until one final
#: non-negative DIV.
_W1_SQL = """
WITH tagged AS (
    SELECT CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
           p.p_type LIKE 'PROMO%' AS g1
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
per_value AS (
    SELECT cents,
           CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
           CAST(SUM(CASE WHEN g1 THEN 0 ELSE 1 END) AS BIGINT) AS c2
    FROM tagged GROUP BY cents
),
cum AS (
    SELECT cents,
           CAST(SUM(c1) OVER (ORDER BY cents) AS BIGINT) AS cum1,
           CAST(SUM(c2) OVER (ORDER BY cents) AS BIGINT) AS cum2,
           CAST(SUM(c1) OVER () AS BIGINT) AS n1,
           CAST(SUM(c2) OVER () AS BIGINT) AS n2,
           LEAD(cents) OVER (ORDER BY cents) AS next_cents
    FROM per_value
),
steps AS (
    SELECT n1, n2,
           CAST(abs(cum1 * n2 - cum2 * n1) AS HUGEINT)
               * (next_cents - cents) AS area
    FROM cum WHERE next_cents IS NOT NULL
)
SELECT CAST(MAX(n1) AS BIGINT) AS n1,
       CAST(MAX(n2) AS BIGINT) AS n2,
       CAST(SUM(area) AS VARCHAR) AS area_numerator,
       CAST(SUM(area) // (CAST(MAX(n1) AS HUGEINT) * MAX(n2)) AS BIGINT)
           AS w1_cents
FROM steps
"""


@register(
    "wasserstein_spend_distance",
    _W1_SQL,
    doc="Wasserstein-1 (earth mover's) distance between the PROMO and "
    "non-PROMO line-price distributions: the integral of |F1 - F2| "
    "over the merged value grid — the metric that, unlike "
    "spend_ks_test's sup-norm, measures HOW MUCH money would have "
    "to move, in cents, to equalize the distributions. Per-step "
    "areas are exact cross-products |cum1*n2 - cum2*n1| * gap "
    "accumulated in HUGEINT/DECIMAL(38) (surfaced as VARCHAR), "
    "normalized by one final non-negative DIV. Scale: the fact "
    "reduces to the distinct-cents grain before the single "
    "cumulative window — the same MWU/KS discipline.",
)
def q_wasserstein_spend_distance(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_type").like("PROMO%").alias("g1")
    )
    tagged = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    per_value = tagged.groupBy("cents").agg(
        F.sum(F.when(F.col("g1"), 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(F.col("g1"), 0).otherwise(1)).cast("long").alias("c2"),
    )
    w = Window.orderBy("cents")
    w_all = Window.partitionBy()
    cum = per_value.select(
        "cents",
        F.sum("c1").over(w).cast("long").alias("cum1"),
        F.sum("c2").over(w).cast("long").alias("cum2"),
        F.sum("c1").over(w_all).cast("long").alias("n1"),
        F.sum("c2").over(w_all).cast("long").alias("n2"),
        F.lead("cents").over(w).alias("next_cents"),
    )
    steps = cum.filter(F.col("next_cents").isNotNull()).select(
        "n1",
        "n2",
        (
            F.abs(
                F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")
            ).cast("decimal(38,0)")
            * (F.col("next_cents") - F.col("cents"))
        ).alias("area"),
    )
    return steps.agg(
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
        F.sum("area").cast("decimal(38,0)").cast("string").alias("area_numerator"),
        F.expr(
            "CAST(CAST(SUM(area) AS DECIMAL(38,0))"
            " DIV (CAST(MAX(n1) AS DECIMAL(38,0)) * MAX(n2)) AS BIGINT)"
        ).alias("w1_cents"),
    )


# --------------------------------------------------------------------------
# Holm step-down multiple-testing screen over per-brand return rates.
# --------------------------------------------------------------------------

#: Two-sided z critical values at alpha/(m-k+1), alpha=0.05, m=25,
#: precomputed via the stdlib inverse normal and embedded as integer
#: milli literals — no runtime distribution functions anywhere.
_HOLM_THRESHOLDS_MILLI = (
    3090, 3078, 3065, 3052, 3038, 3023, 3008, 2991, 2974, 2955, 2935,
    2914, 2891, 2865, 2838, 2807, 2773, 2734, 2690, 2638, 2576, 2498,
    2394, 2241, 1960,
)

#: Brand-vs-rest pooled two-proportion z (same algebra as
#: two_proportion_ztest_returns) over exact integer counts.
_HOLM_Z_MILLI = (
    "CAST(FLOOR((CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE)"
    " - CAST(x_tot - x_b AS DOUBLE) / CAST(n_tot - n_b AS DOUBLE))"
    " / sqrt((CAST(x_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))"
    "        * (1.0 - CAST(x_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))"
    "        * (1.0 / CAST(n_b AS DOUBLE)"
    "           + 1.0 / CAST(n_tot - n_b AS DOUBLE)))"
    " * 1000.0) AS BIGINT)"
)


def _holm_threshold_case(rank_col: str, m_col: str = "m_tests") -> str:
    """Rank->critical-value lookup GUARDED by the family size the
    literals were computed for: if the observed test count ever
    drifts from m=25 the threshold comes out NULL (rejections fail
    closed and the NULL is loud in the output / oracle hash) instead
    of silently degrading to the unadjusted 1.96 (r7 advice fix)."""
    whens = " ".join(
        f"WHEN {k + 1} THEN {t}"
        for k, t in enumerate(_HOLM_THRESHOLDS_MILLI)
    )
    return (
        f"CASE WHEN {m_col} = {len(_HOLM_THRESHOLDS_MILLI)}"
        f" THEN CASE {rank_col} {whens} END END"
    )


_HOLM_SQL = f"""
WITH tagged AS (
    SELECT p.p_brand AS brand,
           CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
per_brand AS (
    SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_b,
           CAST(SUM(ret) AS BIGINT) AS x_b
    FROM tagged GROUP BY brand
),
tot AS (SELECT CAST(SUM(n_b) AS BIGINT) AS n_tot,
               CAST(SUM(x_b) AS BIGINT) AS x_tot FROM per_brand),
scored AS (
    SELECT b.brand, b.n_b, b.x_b,
           {_HOLM_Z_MILLI} AS z_milli
    FROM per_brand b CROSS JOIN tot
),
ranked AS (
    SELECT brand, n_b, x_b, z_milli,
           CAST(ROW_NUMBER() OVER (ORDER BY abs(z_milli) DESC, brand)
                AS BIGINT) AS rnk,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM per_brand) AS m_tests
    FROM scored
),
stepped AS (
    SELECT brand, n_b, x_b, z_milli, rnk, m_tests,
           CAST({_holm_threshold_case("rnk")} AS BIGINT) AS threshold_milli,
           CASE WHEN abs(z_milli) >= {_holm_threshold_case("rnk")}
                THEN 1 ELSE 0 END AS raw_pass
    FROM ranked
)
SELECT brand, n_b, x_b, z_milli, rnk, m_tests, threshold_milli,
       raw_pass = 1 AS raw_pass,
       MIN(raw_pass) OVER (ORDER BY rnk) = 1 AS holm_reject
FROM stepped ORDER BY rnk
"""


@register(
    "holm_stepdown_brand_screen",
    _HOLM_SQL,
    doc="Holm step-down multiple-testing screen: 25 brand-vs-rest "
    "return-rate z tests ranked by |z|, each compared to its "
    "rank-specific critical value (alpha/(m-k+1), two-sided 0.05), "
    "rejections granted only while EVERY earlier rank also passed "
    "(the step-down prefix rule as a running MIN window) — "
    "familywise-error control for the pick-the-outlier-brand "
    "question that a per-test 1.96 cut silently inflates 25-fold. "
    "Critical values are precomputed inverse-normal integer milli "
    "LITERALS (stdlib NormalDist at authoring time — zero runtime "
    "distribution functions) GUARDED by the observed family size "
    "(m_tests <> 25 -> NULL thresholds, fail-closed, never a "
    "silent 1.96 fallback — r7 advice fix); counts and the prefix rule are exact "
    "integers; each z is one shared IEEE expression. Scale: one "
    "broadcast dim join + brand-grain agg; the screen runs on 25 "
    "rows.",
)
def q_holm_stepdown_brand_screen(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per_brand = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").cast("long").alias("n_b"),
            F.sum("ret").cast("long").alias("x_b"),
        )
    )
    tot = per_brand.agg(
        F.sum("n_b").cast("long").alias("n_tot"),
        F.sum("x_b").cast("long").alias("x_tot"),
    )
    scored = per_brand.crossJoin(F.broadcast(tot)).select(
        "brand", "n_b", "x_b", F.expr(_HOLM_Z_MILLI).alias("z_milli")
    )
    m = per_brand.agg(F.count("*").cast("long").alias("m_tests"))
    ranked = scored.crossJoin(F.broadcast(m)).withColumn(
        "rnk",
        F.row_number()
        .over(Window.orderBy(F.abs(F.col("z_milli")).desc(), "brand"))
        .cast("long"),
    )
    thr = _holm_threshold_case("rnk")
    stepped = ranked.select(
        "brand",
        "n_b",
        "x_b",
        "z_milli",
        "rnk",
        "m_tests",
        F.expr(f"CAST({thr} AS BIGINT)").alias("threshold_milli"),
        F.expr(
            f"CASE WHEN abs(z_milli) >= {thr} THEN 1 ELSE 0 END"
        ).alias("raw_pass_i"),
    )
    w = Window.orderBy("rnk")
    return stepped.select(
        "brand",
        "n_b",
        "x_b",
        "z_milli",
        "rnk",
        "m_tests",
        "threshold_milli",
        (F.col("raw_pass_i") == 1).alias("raw_pass"),
        (F.min("raw_pass_i").over(w) == 1).alias("holm_reject"),
    ).orderBy("rnk")


# --------------------------------------------------------------------------
# Tukey HSD post-hoc pairwise comparisons across priorities.
# --------------------------------------------------------------------------

#: q_crit(k=5, df=inf, .05) = 3.858 (studentized range, authoring-time
#: constant). Threshold = q * sqrt(MSE/2 * (1/n_i + 1/n_j)); MSE from
#: the within-group SS assembled exactly (floor(s^2/n) per group, the
#: james_stein idiom). Mean diffs are exact integer milli-dollars.
_TUKEY_THRESH_MILLI = (
    "CAST(FLOOR(3.858 * sqrt("
    "(CAST(q_tot AS DOUBLE) - CAST(sum_ws AS DOUBLE))"
    " / (CAST(n_tot AS DOUBLE) - 5.0) / 2.0"
    " * (1.0 / CAST(n_i AS DOUBLE) + 1.0 / CAST(n_j AS DOUBLE)))"
    " * 1000.0) AS BIGINT)"
)

_TUKEY_SQL = f"""
WITH base AS (
    SELECT o_orderpriority AS prio,
           CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                // 100 AS BIGINT) AS x
    FROM orders
),
per_group AS (
    SELECT prio, CAST(COUNT(*) AS BIGINT) AS n_g,
           CAST(SUM(x) AS BIGINT) AS s_g,
           CAST(FLOOR(CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)
                      / COUNT(*)) AS BIGINT) AS ws_floor
    FROM base GROUP BY prio
),
scalars AS (
    SELECT CAST(SUM(n_g) AS BIGINT) AS n_tot,
           CAST(SUM(ws_floor) AS BIGINT) AS sum_ws
    FROM per_group
),
q_scalar AS (
    SELECT CAST(SUM(x * x) AS BIGINT) AS q_tot FROM base
),
pairs AS (
    SELECT a.prio AS prio_i, b.prio AS prio_j,
           a.n_g AS n_i, b.n_g AS n_j,
           CAST(abs(a.s_g * 1000 // a.n_g - b.s_g * 1000 // b.n_g)
                AS BIGINT) AS mean_diff_milli,
           s.n_tot, s.sum_ws, q.q_tot
    FROM per_group a
    JOIN per_group b ON b.prio > a.prio
    CROSS JOIN scalars s CROSS JOIN q_scalar q
)
SELECT prio_i, prio_j, n_i, n_j, mean_diff_milli,
       {_TUKEY_THRESH_MILLI} AS hsd_threshold_milli,
       mean_diff_milli > {_TUKEY_THRESH_MILLI} AS significant
FROM pairs ORDER BY prio_i, prio_j
"""


@register(
    "tukey_hsd_priority_pairs",
    _TUKEY_SQL,
    doc="Tukey HSD post-hoc comparisons: all 10 priority pairs' mean "
    "spend differences against the studentized-range threshold — "
    "the which-groups-differ answer that the omnibus tests "
    "(kruskal_wallis / brown_forsythe) deliberately do not give, "
    "with the familywise error held at 5% across the 10 "
    "comparisons. Means diff in exact integer milli-dollars (exact "
    "s*1000 DIV n per group); MSE assembles from exact sums with "
    "per-group floor(s^2/n); q_crit is an authoring-time constant; "
    "one shared IEEE expression per pair. Scale: one fused "
    "scan-grain agg to 5 rows; the pair join is 10 rows.",
)
def q_tukey_hsd_priority_pairs(spark, sf_dir):
    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.expr(
            "CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " DIV 100 AS BIGINT)"
        ).alias("x"),
    )
    per_group = base.groupBy("prio").agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum("x").cast("long").alias("s_g"),
        F.expr(
            "CAST(FLOOR(CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)"
            " / COUNT(*)) AS BIGINT)"
        ).alias("ws_floor"),
    ).localCheckpoint(eager=False)
    scalars = per_group.agg(
        F.sum("n_g").cast("long").alias("n_tot"),
        F.sum("ws_floor").cast("long").alias("sum_ws"),
    )
    q_scalar = base.agg(
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q_tot")
    )
    a = per_group.select(
        F.col("prio").alias("prio_i"),
        F.col("n_g").alias("n_i"),
        F.col("s_g").alias("s_i"),
    )
    b = per_group.select(
        F.col("prio").alias("prio_j"),
        F.col("n_g").alias("n_j"),
        F.col("s_g").alias("s_j"),
    )
    pairs = (
        a.join(F.broadcast(b), F.col("prio_j") > F.col("prio_i"))
        .crossJoin(F.broadcast(scalars))
        .crossJoin(F.broadcast(q_scalar))
        .select(
            "prio_i",
            "prio_j",
            "n_i",
            "n_j",
            F.expr(
                "CAST(abs(s_i * 1000 DIV n_i - s_j * 1000 DIV n_j) AS BIGINT)"
            ).alias("mean_diff_milli"),
            "n_tot",
            "sum_ws",
            "q_tot",
        )
    )
    return pairs.select(
        "prio_i",
        "prio_j",
        "n_i",
        "n_j",
        "mean_diff_milli",
        F.expr(_TUKEY_THRESH_MILLI).alias("hsd_threshold_milli"),
        (F.col("mean_diff_milli") > F.expr(_TUKEY_THRESH_MILLI)).alias(
            "significant"
        ),
    ).orderBy("prio_i", "prio_j")


# --------------------------------------------------------------------------
# Benjamini-Hochberg FDR screen (step-UP twin of the Holm step-down).
# --------------------------------------------------------------------------

#: z criticals at alpha*k/m (two-sided, alpha=.05, m=25), authoring-
#: time inverse-normal literals. BH rejects ranks 1..k* where k* is
#: the LARGEST rank whose |z| clears its own threshold — a running
#: MAX over the reversed rank order.
_BH_THRESHOLDS_MILLI = (
    3090, 2878, 2748, 2652, 2576, 2512, 2457, 2409, 2366, 2326, 2290,
    2257, 2226, 2197, 2170, 2144, 2120, 2097, 2075, 2054, 2034, 2014,
    1995, 1977, 1960,
)


def _bh_threshold_case(rank_col: str, m_col: str = "m_tests") -> str:
    """Same family-size guard as ``_holm_threshold_case``."""
    whens = " ".join(
        f"WHEN {k + 1} THEN {t}" for k, t in enumerate(_BH_THRESHOLDS_MILLI)
    )
    return (
        f"CASE WHEN {m_col} = {len(_BH_THRESHOLDS_MILLI)}"
        f" THEN CASE {rank_col} {whens} END END"
    )


_BH_SQL = f"""
WITH tagged AS (
    SELECT p.p_brand AS brand,
           CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
per_brand AS (
    SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_b,
           CAST(SUM(ret) AS BIGINT) AS x_b
    FROM tagged GROUP BY brand
),
tot AS (SELECT CAST(SUM(n_b) AS BIGINT) AS n_tot,
               CAST(SUM(x_b) AS BIGINT) AS x_tot FROM per_brand),
scored AS (
    SELECT b.brand, b.n_b, b.x_b, {_HOLM_Z_MILLI} AS z_milli
    FROM per_brand b CROSS JOIN tot
),
ranked AS (
    SELECT brand, z_milli,
           CAST(ROW_NUMBER() OVER (ORDER BY abs(z_milli) DESC, brand)
                AS BIGINT) AS rnk,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM per_brand) AS m_tests
    FROM scored
),
stepped AS (
    SELECT brand, z_milli, rnk, m_tests,
           CAST({_bh_threshold_case("rnk")} AS BIGINT) AS threshold_milli,
           CASE WHEN abs(z_milli) >= {_bh_threshold_case("rnk")}
                THEN rnk ELSE 0 END AS pass_rnk
    FROM ranked
),
kstar AS (SELECT CAST(MAX(pass_rnk) AS BIGINT) AS k_star FROM stepped)
SELECT s.brand, s.z_milli, s.rnk, s.m_tests, s.threshold_milli,
       s.pass_rnk = s.rnk AS raw_pass,
       s.rnk <= k.k_star AS bh_reject,
       k.k_star
FROM stepped s CROSS JOIN kstar k
ORDER BY s.rnk
"""


@register(
    "bh_fdr_brand_screen",
    _BH_SQL,
    doc="Benjamini-Hochberg FDR screen over the same 25 brand-vs-rest "
    "return-rate tests as holm_stepdown_brand_screen — the step-UP "
    "procedure that controls the false-DISCOVERY rate instead of "
    "the familywise error, rejecting every rank up to the largest "
    "one that clears its own alpha*k/m threshold (so BH always "
    "rejects a superset of Holm, pinned in tests). Critical values "
    "are authoring-time inverse-normal integer literals GUARDED by "
    "the observed family size (m_tests <> 25 -> NULL thresholds, "
    "fail-closed, never a silent 1.96 fallback); k* is one "
    "integer MAX; everything else is exact counts and one shared z "
    "expression. The Holm/BH pair is the screening duo every "
    "many-metrics dashboard needs. Scale: brand-grain, 25 rows.",
)
def q_bh_fdr_brand_screen(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per_brand = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").cast("long").alias("n_b"),
            F.sum("ret").cast("long").alias("x_b"),
        )
    )
    tot = per_brand.agg(
        F.sum("n_b").cast("long").alias("n_tot"),
        F.sum("x_b").cast("long").alias("x_tot"),
    )
    scored = per_brand.crossJoin(F.broadcast(tot)).select(
        "brand", F.expr(_HOLM_Z_MILLI).alias("z_milli")
    )
    m = per_brand.agg(F.count("*").cast("long").alias("m_tests"))
    ranked = scored.crossJoin(F.broadcast(m)).withColumn(
        "rnk",
        F.row_number()
        .over(Window.orderBy(F.abs(F.col("z_milli")).desc(), "brand"))
        .cast("long"),
    )
    thr = _bh_threshold_case("rnk")
    stepped = ranked.select(
        "brand",
        "z_milli",
        "rnk",
        "m_tests",
        F.expr(f"CAST({thr} AS BIGINT)").alias("threshold_milli"),
        F.expr(
            f"CASE WHEN abs(z_milli) >= {thr} THEN rnk ELSE 0 END"
        ).alias("pass_rnk"),
    )
    kstar = stepped.agg(F.max("pass_rnk").cast("long").alias("k_star"))
    return (
        stepped.crossJoin(F.broadcast(kstar))
        .select(
            "brand",
            "z_milli",
            "rnk",
            "m_tests",
            "threshold_milli",
            (F.col("pass_rnk") == F.col("rnk")).alias("raw_pass"),
            (F.col("rnk") <= F.col("k_star")).alias("bh_reject"),
            "k_star",
        )
        .orderBy("rnk")
    )


# --------------------------------------------------------------------------
# DKW confidence band for the spend ECDF.
# --------------------------------------------------------------------------

#: Dvoretzky-Kiefer-Wolfowitz: sup|F_n - F| <= eps with prob 1-alpha,
#: eps = sqrt(ln(2/alpha)/(2n)). sqrt(ln(2/0.05)/2) = 1.358102
#: embedded as an authoring-time constant, so eps needs only one
#: runtime sqrt.
_DKW_EPS_PPM = "CAST(FLOOR(1358102.0 / sqrt(CAST(n AS DOUBLE))) AS BIGINT)"

_DKW_SQL = f"""
WITH base AS (
    SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
    FROM orders
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
-- DuckDB quantile parameters must be constants: nine explicit
-- aggregates, unpivoted (mirrors the Spark shape exactly)
wide AS (
    SELECT CAST(percentile_disc(0.1) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS v100,
           CAST(percentile_disc(0.2) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS v200,
           CAST(percentile_disc(0.3) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS v300,
           CAST(percentile_disc(0.4) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS v400,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS v500,
           CAST(percentile_disc(0.6) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS v600,
           CAST(percentile_disc(0.7) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS v700,
           CAST(percentile_disc(0.8) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS v800,
           CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS v900
    FROM base
),
deciles AS (
    SELECT CAST(100 AS BIGINT) AS p_milli, v100 AS value_cents FROM wide
    UNION ALL
    SELECT CAST(200 AS BIGINT) AS p_milli, v200 AS value_cents FROM wide
    UNION ALL
    SELECT CAST(300 AS BIGINT) AS p_milli, v300 AS value_cents FROM wide
    UNION ALL
    SELECT CAST(400 AS BIGINT) AS p_milli, v400 AS value_cents FROM wide
    UNION ALL
    SELECT CAST(500 AS BIGINT) AS p_milli, v500 AS value_cents FROM wide
    UNION ALL
    SELECT CAST(600 AS BIGINT) AS p_milli, v600 AS value_cents FROM wide
    UNION ALL
    SELECT CAST(700 AS BIGINT) AS p_milli, v700 AS value_cents FROM wide
    UNION ALL
    SELECT CAST(800 AS BIGINT) AS p_milli, v800 AS value_cents FROM wide
    UNION ALL
    SELECT CAST(900 AS BIGINT) AS p_milli, v900 AS value_cents FROM wide
),
ecdf AS (
    SELECT d.p_milli, d.value_cents, t.n,
           CAST((SELECT COUNT(*) FROM base b WHERE b.cents <= d.value_cents)
                * 1000000 // t.n AS BIGINT) AS ecdf_ppm
    FROM deciles d CROSS JOIN tot t
)
SELECT p_milli, value_cents, n, ecdf_ppm,
       {_DKW_EPS_PPM} AS eps_ppm,
       GREATEST(ecdf_ppm - {_DKW_EPS_PPM}, 0) AS band_lo_ppm,
       LEAST(ecdf_ppm + {_DKW_EPS_PPM}, 1000000) AS band_hi_ppm
FROM ecdf ORDER BY p_milli
"""


@register(
    "ecdf_dkw_band",
    _DKW_SQL,
    doc="DKW confidence band for the order-value ECDF at the nine "
    "deciles: the UNIFORM sup-norm guarantee sup|F_n - F| <= "
    "sqrt(ln(2/alpha)/(2n)) that turns an empirical CDF into a "
    "simultaneous confidence statement — the distribution-level "
    "uncertainty companion to median_ci_order_statistic (one "
    "quantile) and spend_ks_test (two samples). Decile values are "
    "exact percentile_disc picks; each ECDF evaluation is an exact "
    "integer count ratio; the DKW constant is authoring-time so "
    "epsilon costs one runtime sqrt. Scale: one scan for the "
    "quantiles + per-decile count probes that at cluster scale "
    "fold into the same value-grain cumulative frame the MWU "
    "family shares.",
)
def q_ecdf_dkw_band(spark, sf_dir):
    base = load_table(spark, sf_dir, "orders").select(
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        )
    ).localCheckpoint(eager=False)
    tot = base.agg(F.count("*").cast("long").alias("n"))
    dec_aggs = [
        F.expr(
            f"CAST(percentile_disc({p} / 1000.0) WITHIN GROUP (ORDER BY cents)"
            " AS BIGINT)"
        ).alias(f"v{p}")
        for p in range(100, 1000, 100)
    ]
    wide = base.agg(*dec_aggs)
    deciles = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).cast("long").alias("p_milli"),
                        F.col(f"v{p}").alias("value_cents"),
                    )
                    for p in range(100, 1000, 100)
                ]
            )
        ).alias("s")
    ).select("s.p_milli", "s.value_cents")
    counts = (
        base.crossJoin(F.broadcast(deciles))
        .filter(F.col("cents") <= F.col("value_cents"))
        .groupBy("p_milli", "value_cents")
        .agg(F.count("*").cast("long").alias("n_le"))
    )
    ecdf = counts.crossJoin(F.broadcast(tot)).select(
        "p_milli",
        "value_cents",
        "n",
        F.expr("CAST(n_le * 1000000 DIV n AS BIGINT)").alias("ecdf_ppm"),
    )
    return ecdf.select(
        "p_milli",
        "value_cents",
        "n",
        "ecdf_ppm",
        F.expr(_DKW_EPS_PPM).alias("eps_ppm"),
        F.expr(f"GREATEST(ecdf_ppm - {_DKW_EPS_PPM}, 0)").alias("band_lo_ppm"),
        F.expr(f"LEAST(ecdf_ppm + {_DKW_EPS_PPM}, 1000000)").alias(
            "band_hi_ppm"
        ),
    ).orderBy("p_milli")


# --------------------------------------------------------------------------
# Mann-Kendall trend test on daily revenue (theil_sen's test twin).
# --------------------------------------------------------------------------

#: S = SUM sign(y_j - y_i) over i<j day pairs (calendar-bounded, the
#: theil_sen pair frame); Var(S) = [n(n-1)(2n+5) - SUM t(t-1)(2t+5)]/18
#: with the tie term over tied daily-revenue value groups — exact
#: integers on both sides (t=1 groups contribute zero, so no filter
#: is needed); z = (S -+ 1)/sqrt(Var).
_MK_Z_MILLI = (
    "CAST(FLOOR((CAST(s_stat AS DOUBLE)"
    " - CAST(CASE WHEN s_stat > 0 THEN 1"
    "             WHEN s_stat < 0 THEN -1 ELSE 0 END AS DOUBLE))"
    " / sqrt((CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0)"
    "         * (2.0 * CAST(n_days AS DOUBLE) + 5.0)"
    "         - CAST(tie_term AS DOUBLE)) / 18.0)"
    " * 1000.0) AS BIGINT)"
)

_MK_SQL = f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS y
    FROM orders GROUP BY o_orderdate
),
pairs AS (
    SELECT CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS sg
    FROM daily a JOIN daily b ON b.d > a.d
),
ties AS (
    SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie_term
    FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY y)
),
comp AS (
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
           CAST(SUM(sg) AS BIGINT) AS s_stat,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           (SELECT tie_term FROM ties) AS tie_term
    FROM pairs
)
SELECT n_days, n_pairs, s_stat, tie_term,
       {_MK_Z_MILLI} AS z_milli,
       abs({_MK_Z_MILLI}) > 1959 AS reject_at_05
FROM comp
"""


@register(
    "mann_kendall_trend",
    _MK_SQL,
    doc="Mann-Kendall trend test on daily revenue: the sign-only pair "
    "statistic S whose significance TEST pairs with "
    "theil_sen_daily_revenue_trend's slope ESTIMATE (same "
    "calendar-bounded pair frame; monotone-trend detection immune "
    "to outliers and any monotone transform). S, the pair count, and "
    "the Var(S) tie correction SUM t(t-1)(2t+5) over tied daily-value "
    "groups (surfaced as tie_term — zero when cents-grain days never "
    "tie, exact when they do; r7 advice fix) are exact integers; the "
    "continuity-corrected z is one shared IEEE expression. Scale: "
    "the |days|^2 pair frame is CALENDAR-bounded, never data-bounded "
    "— the fact reduces to the day grain map-combinably first.",
)
def q_mann_kendall_trend(spark, sf_dir):
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                " AS BIGINT)) AS BIGINT)"
            ).alias("y")
        )
        .localCheckpoint(eager=False)
    )
    a = daily.select(F.col("d").alias("da"), F.col("y").alias("ya"))
    b = daily.select(F.col("d").alias("db"), F.col("y").alias("yb"))
    pairs = a.join(b, F.col("db") > F.col("da")).select(
        F.when(F.col("yb") > F.col("ya"), 1)
        .when(F.col("yb") < F.col("ya"), -1)
        .otherwise(0)
        .alias("sg")
    )
    n_days = daily.agg(F.count("*").cast("long").alias("n_days"))
    ties = (
        daily.groupBy("y")
        .agg(F.count("*").cast("long").alias("t"))
        .agg(
            F.coalesce(
                F.sum(F.expr("t * (t - 1) * (2 * t + 5)")), F.lit(0)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    comp = (
        pairs.agg(
            F.sum("sg").cast("long").alias("s_stat"),
            F.count("*").cast("long").alias("n_pairs"),
        )
        .crossJoin(F.broadcast(n_days))
        .crossJoin(F.broadcast(ties))
    )
    return comp.select(
        "n_days",
        "n_pairs",
        "s_stat",
        "tie_term",
        F.expr(_MK_Z_MILLI).alias("z_milli"),
        (F.abs(F.expr(_MK_Z_MILLI)) > 1959).alias("reject_at_05"),
    )


# --------------------------------------------------------------------------
# Friedman blocked-rank test: brand revenue ranked within each month.
# --------------------------------------------------------------------------

#: chi2_F = 12/(b*k*(k+1)) * SUM_j R_j^2 - 3*b*(k+1); ranks are
#: row_number within each month block ordered by exact-cents revenue
#: with a deterministic brand tiebreak (cents-grain ties are
#: practically impossible and the tiebreak is identical cross-engine,
#: documented rather than tie-averaged). df = k-1 = 24, crit 36.415.
_FRIEDMAN_MILLI = (
    "CAST(FLOOR((12.0 / (CAST(b AS DOUBLE) * CAST(k AS DOUBLE)"
    " * (CAST(k AS DOUBLE) + 1.0)) * CAST(sum_r2 AS DOUBLE)"
    " - 3.0 * CAST(b AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0))"
    " * 1000.0) AS BIGINT)"
)

_FRIEDMAN_SQL = f"""
WITH cells AS (
    SELECT p.p_brand AS brand,
           CAST(year(l.l_shipdate) * 12 + month(l.l_shipdate) AS BIGINT) AS ym,
           CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                AS BIGINT)) AS BIGINT) AS cents
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand, year(l.l_shipdate) * 12 + month(l.l_shipdate)
),
complete_months AS (
    SELECT ym FROM cells GROUP BY ym
    HAVING COUNT(*) = (SELECT COUNT(DISTINCT brand) FROM cells)
),
ranked AS (
    SELECT c.brand, c.ym,
           CAST(ROW_NUMBER() OVER (PARTITION BY c.ym
                ORDER BY c.cents, c.brand) AS BIGINT) AS r
    FROM cells c JOIN complete_months m ON m.ym = c.ym
),
rsums AS (
    SELECT brand, CAST(SUM(r) AS BIGINT) AS r_j FROM ranked GROUP BY brand
),
comp AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS k,
           CAST((SELECT COUNT(*) FROM complete_months) AS BIGINT) AS b,
           CAST(SUM(r_j * r_j) AS BIGINT) AS sum_r2
    FROM rsums
)
SELECT k AS n_brands, b AS n_blocks, sum_r2,
       {_FRIEDMAN_MILLI} AS friedman_chi2_milli,
       {_FRIEDMAN_MILLI} > 36415 AS reject_at_05
FROM comp
"""


@register(
    "friedman_test_brand_months",
    _FRIEDMAN_SQL,
    doc="Friedman blocked-rank test: do the 25 brands keep the same "
    "revenue ORDERING month after month, or does the ranking "
    "reshuffle? The repeated-measures companion to "
    "kruskal_wallis_priority_spend (independent groups): months are "
    "blocks, brands are treatments, only COMPLETE blocks enter "
    "(every brand present — the balanced-design requirement, "
    "enforced by a HAVING gate). Ranks are within-block row_numbers "
    "over exact-cents revenue with a deterministic tiebreak; "
    "chi2_F is one shared IEEE expression over three int64 sums "
    "(df=24, crit 36.415). Scale: the fact reduces to the bounded "
    "(brand x month) cell grain; the rank window partitions by "
    "month over <= 25 rows each.",
)
def q_friedman_test_brand_months(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
        .cast("long")
        .alias("ym"),
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "c"
        ),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cells = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), "ym")
        .agg(F.sum("c").cast("long").alias("cents"))
        .localCheckpoint(eager=False)
    )
    nbr = cells.agg(F.countDistinct("brand").alias("k_all"))
    complete = (
        cells.groupBy("ym")
        .agg(F.count("*").alias("nb"))
        .crossJoin(F.broadcast(nbr))
        .filter(F.col("nb") == F.col("k_all"))
        .select("ym")
    )
    ranked = cells.join(F.broadcast(complete), "ym").select(
        "brand",
        F.row_number()
        .over(Window.partitionBy("ym").orderBy("cents", "brand"))
        .cast("long")
        .alias("r"),
    )
    rsums = ranked.groupBy("brand").agg(F.sum("r").cast("long").alias("r_j"))
    b_cnt = complete.agg(F.count("*").cast("long").alias("b"))
    comp = rsums.agg(
        F.count("*").cast("long").alias("k"),
        F.sum(F.col("r_j") * F.col("r_j")).cast("long").alias("sum_r2"),
    ).crossJoin(F.broadcast(b_cnt))
    return comp.select(
        F.col("k").alias("n_brands"),
        F.col("b").alias("n_blocks"),
        "sum_r2",
        F.expr(_FRIEDMAN_MILLI).alias("friedman_chi2_milli"),
        (F.expr(_FRIEDMAN_MILLI) > 36415).alias("reject_at_05"),
    )


# --------------------------------------------------------------------------
# Wilcoxon signed-rank test: paired 1996-vs-1997 customer spend.
# --------------------------------------------------------------------------

#: z from the DOUBLED positive-rank sum W2 = 2*W+ (exact integers at
#: the distinct-|d| grain, the MWU doubled-rank discipline):
#: E[W2] = n(n+1)/2, Var(W2) = (2n(n+1)(2n+1) - SUM(t^3-t))/12.
_WSR_Z_MILLI = (
    "CAST(FLOOR((CAST(w2_pos AS DOUBLE)"
    " - CAST(n_pairs AS DOUBLE) * (CAST(n_pairs AS DOUBLE) + 1.0) / 2.0)"
    " / sqrt((2.0 * CAST(n_pairs AS DOUBLE)"
    "         * (CAST(n_pairs AS DOUBLE) + 1.0)"
    "         * (2.0 * CAST(n_pairs AS DOUBLE) + 1.0)"
    "         - CAST(tie_cubes AS DOUBLE)) / 12.0)"
    " * 1000.0) AS BIGINT)"
)

_WSR_SQL = f"""
WITH yearly AS (
    SELECT o_custkey AS cust,
           CAST(EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) AS BIGINT)
               AS yr,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
    FROM orders
    WHERE EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) IN (1996, 1997)
    GROUP BY o_custkey, EXTRACT(YEAR FROM CAST(o_orderdate AS DATE))
),
paired AS (
    SELECT a.cust, b.cents - a.cents AS d
    FROM yearly a
    JOIN yearly b ON b.cust = a.cust AND b.yr = 1997
    WHERE a.yr = 1996
),
nz AS (
    SELECT abs(d) AS ad, CASE WHEN d > 0 THEN 1 ELSE 0 END AS pos
    FROM paired WHERE d <> 0
),
per_value AS (
    SELECT ad, CAST(SUM(pos) AS BIGINT) AS pos_c,
           CAST(COUNT(*) AS BIGINT) AS t
    FROM nz GROUP BY ad
),
cum AS (
    SELECT ad, pos_c, t,
           CAST(SUM(t) OVER (ORDER BY ad) - t AS BIGINT) AS below
    FROM per_value
),
comp AS (
    SELECT CAST(SUM(t) AS BIGINT) AS n_pairs,
           CAST(SUM(pos_c * (2 * below + t + 1)) AS BIGINT) AS w2_pos,
           CAST(SUM(t * t * t - t) AS BIGINT) AS tie_cubes
    FROM cum
)
SELECT n_pairs, w2_pos, tie_cubes,
       {_WSR_Z_MILLI} AS z_milli,
       abs({_WSR_Z_MILLI}) > 1959 AS reject_at_05
FROM comp
"""


@register(
    "wilcoxon_signed_rank_spend",
    _WSR_SQL,
    doc="Wilcoxon signed-rank test on PAIRED customer spend (1996 vs "
    "1997, same customer both years; zero differences dropped per the "
    "standard convention): did spend shift year-over-year, judged "
    "robustly on within-customer differences? Completes the "
    "nonparametric family — MWU compares two INDEPENDENT cohorts, "
    "Friedman k related blocks, this the classic paired two-sample. "
    "Doubled positive-rank sum W2 = SUM pos_c*(2*below+t+1) and the "
    "t^3-t tie term are EXACT integers at the distinct-|d|-cents "
    "grain; the only float is one shared IEEE z with Var(W2) = "
    "(2n(n+1)(2n+1) - tie_cubes)/12, floor-milli vs the floored "
    "critical 1959. Scale: one year-filtered map-combinable agg, one "
    "self-join at the customer grain, then the rank window over the "
    "distinct-|difference| frame only.",
    bounded_frame="distinct-|d|-cents rank grain (price-domain-saturating)",
)
def q_wilcoxon_signed_rank_spend(spark, sf_dir):
    yearly = (
        load_table(spark, sf_dir, "orders")
        .withColumn("yr", F.year("o_orderdate").cast("long"))
        .filter(F.col("yr").isin(1996, 1997))
        .groupBy(F.col("o_custkey").alias("cust"), "yr")
        .agg(
            F.expr(
                "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                " AS BIGINT)) AS BIGINT)"
            ).alias("cents")
        )
    )
    a = yearly.filter(F.col("yr") == 1996).select(
        "cust", F.col("cents").alias("c96")
    )
    b = yearly.filter(F.col("yr") == 1997).select(
        "cust", F.col("cents").alias("c97")
    )
    nz = (
        a.join(b, "cust")
        .select((F.col("c97") - F.col("c96")).alias("d"))
        .filter(F.col("d") != 0)
        .select(
            F.abs("d").alias("ad"),
            F.when(F.col("d") > 0, 1).otherwise(0).alias("pos"),
        )
    )
    per_value = nz.groupBy("ad").agg(
        F.sum("pos").cast("long").alias("pos_c"),
        F.count("*").cast("long").alias("t"),
    )
    cum = per_value.select(
        "ad",
        "pos_c",
        "t",
        (F.sum("t").over(Window.orderBy("ad")) - F.col("t"))
        .cast("long")
        .alias("below"),
    )
    comp = cum.agg(
        F.sum("t").cast("long").alias("n_pairs"),
        F.sum(F.expr("pos_c * (2 * below + t + 1)")).cast("long").alias(
            "w2_pos"
        ),
        F.sum(F.expr("t * t * t - t")).cast("long").alias("tie_cubes"),
    )
    return comp.select(
        "n_pairs",
        "w2_pos",
        "tie_cubes",
        F.expr(_WSR_Z_MILLI).alias("z_milli"),
        (F.abs(F.expr(_WSR_Z_MILLI)) > 1959).alias("reject_at_05"),
    )


# --------------------------------------------------------------------------
# Cochran's Q: did the customer base's propensity to order change
# across 1996/1997/1998? (k=3 related binary treatments per customer.)
# --------------------------------------------------------------------------

#: Q = (k-1)(k*SUM C_j^2 - T^2) / (k*T - SUM R_i^2) with T = SUM C_j —
#: the k-treatment generalization of McNemar, and FULLY integer
#: (constant rows R in {0,k} contribute nothing, so no row filter is
#: needed). chi2 df=2 floored critical 5991.
_CQ_MILLI = (
    "CAST(2 * (3 * (c_1996 * c_1996 + c_1997 * c_1997 + c_1998 * c_1998)"
    " - (c_1996 + c_1997 + c_1998) * (c_1996 + c_1997 + c_1998)) * 1000"
    " // (3 * (c_1996 + c_1997 + c_1998) - sum_r2) AS BIGINT)"
)

_CQ_SQL = f"""
WITH flags AS (
    SELECT c.c_custkey AS cust,
           MAX(CASE WHEN EXTRACT(YEAR FROM CAST(o.o_orderdate AS DATE))
                        = 1996 THEN 1 ELSE 0 END) AS f96,
           MAX(CASE WHEN EXTRACT(YEAR FROM CAST(o.o_orderdate AS DATE))
                        = 1997 THEN 1 ELSE 0 END) AS f97,
           MAX(CASE WHEN EXTRACT(YEAR FROM CAST(o.o_orderdate AS DATE))
                        = 1998 THEN 1 ELSE 0 END) AS f98
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
),
comp AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(f96) AS BIGINT) AS c_1996,
           CAST(SUM(f97) AS BIGINT) AS c_1997,
           CAST(SUM(f98) AS BIGINT) AS c_1998,
           CAST(SUM((f96 + f97 + f98) * (f96 + f97 + f98)) AS BIGINT)
               AS sum_r2
    FROM flags
)
SELECT n_customers, c_1996, c_1997, c_1998, sum_r2,
       {_CQ_MILLI} AS q_milli,
       {_CQ_MILLI} > 5991 AS reject_at_05
FROM comp
"""


@register(
    "cochran_q_yearly_activity",
    _CQ_SQL,
    doc="Cochran's Q test over k=3 related binary treatments (did each "
    "customer order in 1996 / 1997 / 1998?): the k-group "
    "generalization of mcnemar_paired_test for marginal-propensity "
    "shift across matched periods. ZERO floats anywhere: Q reduces "
    "algebraically to (k-1)(k*SUM C_j^2 - T^2)/(k*T - SUM R_i^2) — "
    "exact int64 counts, one integer division, floored critical "
    "5991 (chi2 df=2). Constant rows (R_i in {{0,k}}) provably "
    "cancel from both numerator sides, so no row filter is needed. "
    "Scale: one left-join + fused per-customer flag agg, "
    "map-combinable to a single row; C^2 products stay under int64 "
    "to ~5e8 active customers, past which counts re-grain to "
    "kilo-customers first.",
)
def q_cochran_q_yearly_activity(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.year("o_orderdate").alias("yr")
    )
    flags = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.max(F.when(F.col("yr") == 1996, 1).otherwise(0)).alias("f96"),
            F.max(F.when(F.col("yr") == 1997, 1).otherwise(0)).alias("f97"),
            F.max(F.when(F.col("yr") == 1998, 1).otherwise(0)).alias("f98"),
        )
    )
    comp = flags.agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("f96").cast("long").alias("c_1996"),
        F.sum("f97").cast("long").alias("c_1997"),
        F.sum("f98").cast("long").alias("c_1998"),
        F.sum(F.expr("(f96 + f97 + f98) * (f96 + f97 + f98)"))
        .cast("long")
        .alias("sum_r2"),
    )
    q = _CQ_MILLI.replace("//", "DIV")
    return comp.select(
        "n_customers",
        "c_1996",
        "c_1997",
        "c_1998",
        "sum_r2",
        F.expr(q).alias("q_milli"),
        (F.expr(q) > 5991).alias("reject_at_05"),
    )


# --------------------------------------------------------------------------
# Cochran-Mantel-Haenszel: promo-vs-return association controlling for
# supplier nation — the FORMAL test behind simpsons_paradox_screen.
# --------------------------------------------------------------------------

#: Per-stratum O-E and hypergeometric variance, each floor-quantized
#: micro from exact int64 margins BEFORE the cross-strata sums.
_CMH_OE_MICRO = (
    "CAST(FLOOR((CAST(a AS DOUBLE)"
    " - CAST(n1 AS DOUBLE) * CAST(m1 AS DOUBLE) / CAST(nn AS DOUBLE))"
    " * 1000000.0) AS BIGINT)"
)
_CMH_V_MICRO = (
    "CAST(FLOOR(CAST(n1 AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(n1 AS DOUBLE))"
    " * CAST(m1 AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(m1 AS DOUBLE))"
    " / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)"
    "    * (CAST(nn AS DOUBLE) - 1.0)) * 1000000.0) AS BIGINT)"
)
_CMH_AD_MICRO = (
    "CAST(FLOOR(CAST(a AS DOUBLE)"
    " * (CAST(nn AS DOUBLE) - CAST(n1 AS DOUBLE) - CAST(m1 AS DOUBLE)"
    "    + CAST(a AS DOUBLE)) / CAST(nn AS DOUBLE) * 1000000.0) AS BIGINT)"
)
_CMH_BC_MICRO = (
    "CAST(FLOOR((CAST(n1 AS DOUBLE) - CAST(a AS DOUBLE))"
    " * (CAST(m1 AS DOUBLE) - CAST(a AS DOUBLE))"
    " / CAST(nn AS DOUBLE) * 1000000.0) AS BIGINT)"
)
#: Continuity-corrected CMH chi2 (df=1) in milli: the floored statistic
#: compares against the FLOORED critical 3841.
_CMH_MILLI = (
    "CAST(FLOOR("
    "GREATEST(abs(CAST(sum_oe_micro AS DOUBLE)) - 500000.0, 0.0)"
    " * GREATEST(abs(CAST(sum_oe_micro AS DOUBLE)) - 500000.0, 0.0)"
    " / (CAST(sum_v_micro AS DOUBLE) * 1000000.0)"
    " * 1000.0) AS BIGINT)"
)

_CMH_SQL = f"""
WITH tagged AS (
    SELECT n.n_name AS stratum,
           CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS promo,
           CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
),
strata AS (
    SELECT stratum,
           CAST(SUM(promo * ret) AS BIGINT) AS a,
           CAST(SUM(promo) AS BIGINT) AS n1,
           CAST(SUM(ret) AS BIGINT) AS m1,
           CAST(COUNT(*) AS BIGINT) AS nn
    FROM tagged GROUP BY stratum
),
comp AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
           CAST(SUM(a) AS BIGINT) AS sum_a,
           CAST(SUM({_CMH_OE_MICRO}) AS BIGINT) AS sum_oe_micro,
           CAST(SUM({_CMH_V_MICRO}) AS BIGINT) AS sum_v_micro,
           CAST(SUM({_CMH_AD_MICRO}) AS BIGINT) AS sum_ad_micro,
           CAST(SUM({_CMH_BC_MICRO}) AS BIGINT) AS sum_bc_micro
    FROM strata WHERE nn > 1
)
SELECT n_strata, sum_a, sum_oe_micro, sum_v_micro,
       CAST(sum_ad_micro * 1000 // sum_bc_micro AS BIGINT) AS or_mh_milli,
       {_CMH_MILLI} AS cmh_milli,
       {_CMH_MILLI} > 3841 AS reject_at_05
FROM comp
"""


@register(
    "cmh_promo_return_by_nation",
    _CMH_SQL,
    doc="Cochran-Mantel-Haenszel test: are PROMO parts returned at a "
    "different rate, CONTROLLING for supplier nation? The formal "
    "stratified 2x2 test behind simpsons_paradox_screen — a pooled "
    "two-proportion z can flip sign under confounding; CMH sums "
    "per-stratum O-E against per-stratum hypergeometric variances, "
    "plus the Mantel-Haenszel common odds ratio (ad/N, bc/N sums). "
    "Every per-stratum term floor-quantizes to micro from exact "
    "int64 margins BEFORE the cross-strata sums; the continuity-"
    "corrected chi2 (df=1) is one shared IEEE expression, floored "
    "milli vs the floored critical 3841; OR_MH is a non-negative "
    "integer division. Scale: two broadcast dim joins + one fused "
    "map-combinable agg to 25 stratum rows.",
)
def q_cmh_promo_return_by_nation(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.when(F.col("p_type").like("PROMO%"), 1).otherwise(0).alias("promo"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("stratum")
    )
    tagged = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    )
    strata = tagged.groupBy("stratum").agg(
        F.sum(F.expr("promo * ret")).cast("long").alias("a"),
        F.sum("promo").cast("long").alias("n1"),
        F.sum("ret").cast("long").alias("m1"),
        F.count("*").cast("long").alias("nn"),
    )
    comp = strata.filter(F.col("nn") > 1).agg(
        F.count("*").cast("long").alias("n_strata"),
        F.sum("a").cast("long").alias("sum_a"),
        F.sum(F.expr(_CMH_OE_MICRO)).cast("long").alias("sum_oe_micro"),
        F.sum(F.expr(_CMH_V_MICRO)).cast("long").alias("sum_v_micro"),
        F.sum(F.expr(_CMH_AD_MICRO)).cast("long").alias("sum_ad_micro"),
        F.sum(F.expr(_CMH_BC_MICRO)).cast("long").alias("sum_bc_micro"),
    )
    return comp.select(
        "n_strata",
        "sum_a",
        "sum_oe_micro",
        "sum_v_micro",
        F.expr(
            "CAST(sum_ad_micro * 1000 DIV sum_bc_micro AS BIGINT)"
        ).alias("or_mh_milli"),
        F.expr(_CMH_MILLI).alias("cmh_milli"),
        (F.expr(_CMH_MILLI) > 3841).alias("reject_at_05"),
    )


# --------------------------------------------------------------------------
# Round 9: Bayesian Beta-Binomial posterior per segment.
# --------------------------------------------------------------------------

#: Shared IEEE posterior-sd expression over exact integer (alpha,
#: beta): sd = sqrt(a*b / ((a+b)^2 * (a+b+1))), floor-quantized micro.
#: Products run in DOUBLE (exact int64 -> double conversions, one
#: shared spelling both engines) because (a+b)^3 passes int64 at
#: ~2M-customer segments; sqrt is correctly rounded per IEEE-754.
_BETA_SD_MICRO = (
    "CAST(FLOOR(sqrt((CAST(alpha AS DOUBLE) * CAST(beta AS DOUBLE))"
    " / ((CAST(alpha AS DOUBLE) + CAST(beta AS DOUBLE))"
    "    * (CAST(alpha AS DOUBLE) + CAST(beta AS DOUBLE))"
    "    * (CAST(alpha AS DOUBLE) + CAST(beta AS DOUBLE) + 1.0)))"
    " * 1000000.0) AS BIGINT)"
)

_BETA_POSTERIOR_SQL = f"""
WITH per_cust AS (
    SELECT c.c_mktsegment AS segment,
           CASE WHEN COUNT(o.o_orderkey) >= 2 THEN 1 ELSE 0 END AS conv
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
),
seg AS (
    SELECT segment,
           CAST(1 + SUM(conv) AS BIGINT) AS alpha,
           CAST(1 + COUNT(*) - SUM(conv) AS BIGINT) AS beta
    FROM per_cust GROUP BY segment
)
SELECT segment, alpha, beta,
       CAST(alpha * 1000000 // (alpha + beta) AS BIGINT)
           AS posterior_mean_ppm,
       {_BETA_SD_MICRO} AS posterior_sd_micro,
       CAST(alpha * 1000000 // (alpha + beta)
            - 1959 * {_BETA_SD_MICRO} // 1000 AS BIGINT) AS ci95_low_ppm,
       CAST(alpha * 1000000 // (alpha + beta)
            + 1959 * {_BETA_SD_MICRO} // 1000 AS BIGINT) AS ci95_high_ppm
FROM seg
ORDER BY segment
"""


@register(
    "beta_posterior_conversion",
    _BETA_POSTERIOR_SQL,
    doc="Bayesian Beta-Binomial posterior for the repeat-purchase "
    "conversion rate per market segment — the Bayesian companion to "
    "two_proportion_ztest_returns (frequentist) and "
    "cuped_variance_reduction (variance reduction): uniform Beta(1,1)"
    " prior + binomial likelihood gives EXACT integer posterior "
    "params (alpha = 1 + converters, beta = 1 + non-converters), the "
    "posterior mean as exact ppm integer division, the posterior sd "
    "via ONE shared IEEE double expression (floor-micro), and a "
    "normal-approx 95% credible band from the floored z=1959-milli "
    "critical (the repo's floored-critical convention). Scale: one "
    "customer-grain left-join agg (map-combinable) then a 5-row "
    "segment frame; every compared column is BIGINT.",
)
def q_beta_posterior_conversion(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.when(F.count("o_orderkey") >= 2, 1).otherwise(0).alias("conv")
        )
    )
    seg = per_cust.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        (1 + F.sum("conv")).cast("long").alias("alpha"),
        (1 + F.count("*") - F.sum("conv")).cast("long").alias("beta"),
    )
    mean_ppm = F.expr("alpha * 1000000 DIV (alpha + beta)").cast("long")
    sd_micro = F.expr(_BETA_SD_MICRO)
    return seg.select(
        "segment",
        "alpha",
        "beta",
        mean_ppm.alias("posterior_mean_ppm"),
        sd_micro.alias("posterior_sd_micro"),
        (mean_ppm - F.expr(f"1959 * {_BETA_SD_MICRO} DIV 1000"))
        .cast("long")
        .alias("ci95_low_ppm"),
        (mean_ppm + F.expr(f"1959 * {_BETA_SD_MICRO} DIV 1000"))
        .cast("long")
        .alias("ci95_high_ppm"),
    ).orderBy("segment")


# --------------------------------------------------------------------------
# Round 9: Cohen's d standardized effect size (urgent vs low priority).
# --------------------------------------------------------------------------

#: Shared IEEE Cohen's d from exact dollar-grain int64 moment sums:
#: pooled variance from per-arm (n, s, ss), d = (m1-m2)/s_pooled,
#: floor-quantized milli. Same overflow bound as CUPED: dollar-grain
#: ss stays under int64 to ~1.5e7 orders; past that, re-grain to
#: kilo-dollars (documented knob).
_COHENS_D_MILLI = (
    "CAST(FLOOR((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    " - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))"
    " / sqrt(((CAST(ss1 AS DOUBLE)"
    "          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)"
    "            / CAST(n1 AS DOUBLE))"
    "         + (CAST(ss2 AS DOUBLE)"
    "            - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)"
    "              / CAST(n2 AS DOUBLE)))"
    "        / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0))"
    " * 1000.0) AS BIGINT)"
)

_COHENS_D_SQL = f"""
WITH dollars AS (
    SELECT o_orderpriority AS prio,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               // 100 AS x
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
),
arms AS (
    SELECT CAST(SUM(CASE WHEN prio = '1-URGENT' THEN 1 ELSE 0 END)
               AS BIGINT) AS n1,
           CAST(SUM(CASE WHEN prio = '1-URGENT' THEN x ELSE 0 END)
               AS BIGINT) AS s1,
           CAST(SUM(CASE WHEN prio = '1-URGENT' THEN x * x ELSE 0 END)
               AS BIGINT) AS ss1,
           CAST(SUM(CASE WHEN prio = '5-LOW' THEN 1 ELSE 0 END)
               AS BIGINT) AS n2,
           CAST(SUM(CASE WHEN prio = '5-LOW' THEN x ELSE 0 END)
               AS BIGINT) AS s2,
           CAST(SUM(CASE WHEN prio = '5-LOW' THEN x * x ELSE 0 END)
               AS BIGINT) AS ss2
    FROM dollars
)
SELECT n1, s1, n2, s2,
       CAST(s1 * 1000 // n1 AS BIGINT) AS mean1_milli,
       CAST(s2 * 1000 // n2 AS BIGINT) AS mean2_milli,
       {_COHENS_D_MILLI} AS cohens_d_milli,
       ABS({_COHENS_D_MILLI}) >= 200 AS at_least_small_effect
FROM arms
"""


@register(
    "cohens_d_priority_spend",
    _COHENS_D_SQL,
    doc="Cohen's d standardized effect size for urgent-vs-low order "
    "spend — the EFFECT-SIZE readout the test battery lacked "
    "(kruskal_wallis/mannwhitney/brown_forsythe answer 'is there a "
    "difference', d answers 'how big in sd units'; |d|>=0.2 is "
    "Cohen's small-effect floor, compared in exact milli): exact "
    "dollar-grain int64 moment sums (the CUPED grain discipline) "
    "fused in ONE map-combinable conditional aggregate, then one "
    "shared IEEE expression for pooled sd + d (int64 -> double "
    "conversions are single correctly-rounded ops; sqrt is correctly "
    "rounded). Scale: a scan-local agg to a 1-row frame; ss stays "
    "under int64 to ~1.5e7 orders, then re-grain to kilo-dollars.",
)
def q_cohens_d_priority_spend(spark, sf_dir):
    x = F.expr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) DIV 100"
    )
    dollars = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(F.col("o_orderpriority").alias("prio"), x.alias("x"))
    )
    arms = dollars.agg(
        F.sum(F.when(F.col("prio") == "1-URGENT", 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("prio") == "1-URGENT", F.col("x")).otherwise(0))
        .cast("long")
        .alias("s1"),
        F.sum(
            F.when(
                F.col("prio") == "1-URGENT", F.expr("x * x")
            ).otherwise(0)
        )
        .cast("long")
        .alias("ss1"),
        F.sum(F.when(F.col("prio") == "5-LOW", 1).otherwise(0))
        .cast("long")
        .alias("n2"),
        F.sum(F.when(F.col("prio") == "5-LOW", F.col("x")).otherwise(0))
        .cast("long")
        .alias("s2"),
        F.sum(
            F.when(F.col("prio") == "5-LOW", F.expr("x * x")).otherwise(0)
        )
        .cast("long")
        .alias("ss2"),
    )
    d = F.expr(_COHENS_D_MILLI)
    return arms.select(
        "n1",
        "s1",
        "n2",
        "s2",
        F.expr("s1 * 1000 DIV n1").cast("long").alias("mean1_milli"),
        F.expr("s2 * 1000 DIV n2").cast("long").alias("mean2_milli"),
        d.alias("cohens_d_milli"),
        (F.abs(d) >= 200).alias("at_least_small_effect"),
    )


# --------------------------------------------------------------------------
# Round 9 (second wave): cumulative uplift (Qini-style) by targeting
# decile — the experimentation readout that turns an A/B split into a
# TARGETING policy (how deep down the score-ranked population does the
# treatment keep paying?).
# --------------------------------------------------------------------------

_UPLIFT_SQL = f"""
WITH pre AS (
    SELECT o_custkey AS cust,
           CAST(SUM(CASE WHEN EXTRACT(YEAR FROM CAST(o_orderdate AS DATE))
                    = 1996 THEN CAST(CAST(o_totalprice AS DECIMAL(18,2))
                    * 100 AS BIGINT) // 100 ELSE 0 END) AS BIGINT)
               AS pre_spend,
           CAST(MAX(CASE WHEN CAST(o_orderdate AS DATE)
                    >= DATE '1997-07-01' THEN 1 ELSE 0 END) AS BIGINT)
               AS conv
    FROM orders GROUP BY o_custkey
),
armed AS (
    SELECT cust, pre_spend, conv,
           CASE WHEN {hash_bucket_sql("cust", "qini:")} < 5000
                THEN 1 ELSE 0 END AS treat,
           NTILE(10) OVER (ORDER BY pre_spend DESC, cust) AS decile
    FROM pre
),
per_decile AS (
    SELECT decile,
           CAST(SUM(treat) AS BIGINT) AS n_t,
           CAST(SUM(treat * conv) AS BIGINT) AS conv_t,
           CAST(SUM(1 - treat) AS BIGINT) AS n_c,
           CAST(SUM((1 - treat) * conv) AS BIGINT) AS conv_c
    FROM armed GROUP BY decile
),
cum AS (
    SELECT decile,
           CAST(SUM(n_t) OVER w AS BIGINT) AS n_t_cum,
           CAST(SUM(conv_t) OVER w AS BIGINT) AS conv_t_cum,
           CAST(SUM(n_c) OVER w AS BIGINT) AS n_c_cum,
           CAST(SUM(conv_c) OVER w AS BIGINT) AS conv_c_cum
    FROM per_decile
    WINDOW w AS (ORDER BY decile)
)
SELECT CAST(decile AS BIGINT) AS decile,
       n_t_cum, conv_t_cum, n_c_cum, conv_c_cum,
       CAST(conv_t_cum * 1000000 // n_t_cum
            - conv_c_cum * 1000000 // n_c_cum AS BIGINT)
           AS uplift_cum_ppm
FROM cum ORDER BY decile
"""


@register(
    "uplift_qini_deciles",
    _UPLIFT_SQL,
    doc="Cumulative uplift curve by targeting decile: customers rank "
    "by pre-period (1996) spend, hash-split 50/50 into treat/control "
    "(the CUPED assignment idiom), outcome = any 1997-H2 order; per "
    "cumulative decile the treated and control conversion rates and "
    "their difference as exact ppm (each rate a non-negative int64 "
    "DIV, the difference an exact subtraction — no signed division "
    "anywhere). On the null fixture the curve hovers near zero, "
    "which is the correct readout for a no-effect split; the entry "
    "verifies the MACHINERY (ranking, cumulative arms, exact rates) "
    "the Qini/uplift evaluation runs on. Scale: one customer-grain "
    "agg; the NTILE is the documented decile pattern (exactness-"
    "mandated global rank; broadcast approx cut-points are the 100 TB "
    "path, as in customer_value_deciles_scalable); cumulative windows "
    "run on the 10-row decile frame.",
    bounded_frame="decile cut (global NTILE over customer grain; approx cut-point scale path documented) then 10-row windows",
)
def q_uplift_qini_deciles(spark, sf_dir):
    pre = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            F.sum(
                F.when(
                    F.year("o_orderdate") == 1996,
                    F.expr(
                        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                        " AS BIGINT) DIV 100"
                    ),
                ).otherwise(0)
            )
            .cast("long")
            .alias("pre_spend"),
            F.max(
                F.when(
                    F.to_date("o_orderdate") >= F.lit("1997-07-01").cast("date"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("conv"),
        )
    )
    armed = pre.select(
        "pre_spend",
        "conv",
        F.when(hash_bucket(F.col("cust"), "qini:") < 5000, 1)
        .otherwise(0)
        .alias("treat"),
        F.ntile(10)
        .over(Window.orderBy(F.col("pre_spend").desc(), "cust"))
        .alias("decile"),
    )
    per_decile = armed.groupBy("decile").agg(
        F.sum("treat").cast("long").alias("n_t"),
        F.sum(F.expr("treat * conv")).cast("long").alias("conv_t"),
        F.sum(F.expr("1 - treat")).cast("long").alias("n_c"),
        F.sum(F.expr("(1 - treat) * conv")).cast("long").alias("conv_c"),
    )
    w = Window.orderBy("decile")
    cum = per_decile.select(
        "decile",
        F.sum("n_t").over(w).cast("long").alias("n_t_cum"),
        F.sum("conv_t").over(w).cast("long").alias("conv_t_cum"),
        F.sum("n_c").over(w).cast("long").alias("n_c_cum"),
        F.sum("conv_c").over(w).cast("long").alias("conv_c_cum"),
    )
    return cum.select(
        F.col("decile").cast("long").alias("decile"),
        "n_t_cum",
        "conv_t_cum",
        "n_c_cum",
        "conv_c_cum",
        F.expr(
            "CAST(conv_t_cum * 1000000 DIV n_t_cum"
            " - conv_c_cum * 1000000 DIV n_c_cum AS BIGINT)"
        ).alias("uplift_cum_ppm"),
    ).orderBy("decile")


# --------------------------------------------------------------------------
# Round 9 fourth wave: O'Brien-Fleming group-sequential monitor.
# --------------------------------------------------------------------------

#: Classic O'Brien-Fleming two-sided group-sequential z-boundaries for
#: K=4 equally-spaced looks at overall alpha=0.05 (Jennison & Turnbull
#: table 2.3: 4.049, 2.863, 2.337, 2.024) — precomputed literals in
#: floored milli, so neither engine evaluates a quantile function.
_OBF_BOUNDS_MILLI = [(1, 4049), (2, 2863), (3, 2337), (4, 2024)]
#: H0 purchase share p0 = 0.30; p0*(1-p0) = 0.21 exactly.
_OBF_P0_PCT = 30

_OBF_Z_MILLI = (
    "CAST(FLOOR((CAST(100 * x_cum - {p0} * n_cum AS DOUBLE) / 100.0)"
    " / sqrt(CAST(n_cum AS DOUBLE) * {pq} / 10000.0)"
    " * 1000.0) AS BIGINT)"
).format(p0=_OBF_P0_PCT, pq=_OBF_P0_PCT * (100 - _OBF_P0_PCT))

_OBF_ROWS = ", ".join(f"({k}, {b})" for k, b in _OBF_BOUNDS_MILLI)

_OBF_SQL = f"""
WITH ev AS (
    SELECT CAST(ts AS DATE) AS d,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
    FROM events
),
bounds_d AS (
    SELECT MIN(d) AS d_lo, MAX(d) AS d_hi FROM ev
),
looked AS (
    SELECT LEAST(CAST((d - d_lo) AS BIGINT) * 4
                 // GREATEST(CAST((d_hi - d_lo) AS BIGINT) + 1, 1) + 1, 4)
               AS look,
           is_p
    FROM ev CROSS JOIN bounds_d
),
per_look AS (
    SELECT look, CAST(COUNT(*) AS BIGINT) AS n_k,
           CAST(SUM(is_p) AS BIGINT) AS x_k
    FROM looked GROUP BY look
),
cum AS (
    SELECT a.look,
           CAST(SUM(b.n_k) AS BIGINT) AS n_cum,
           CAST(SUM(b.x_k) AS BIGINT) AS x_cum
    FROM per_look a JOIN per_look b ON b.look <= a.look
    GROUP BY a.look
),
grid(look, bound_milli) AS (VALUES {_OBF_ROWS}),
z AS (
    SELECT c.look, c.n_cum, c.x_cum,
           CAST(g.bound_milli AS BIGINT) AS bound_milli,
           {_OBF_Z_MILLI} AS z_milli
    FROM cum c JOIN grid g ON g.look = c.look
)
SELECT look, n_cum, x_cum, bound_milli, z_milli,
       abs(z_milli) > bound_milli AS crossed,
       (abs(z_milli) > bound_milli
        AND (SELECT COALESCE(MIN(z2.look), 99) FROM z z2
             WHERE abs(z2.z_milli) > z2.bound_milli) = look)
           AS first_crossing
FROM z
ORDER BY look
"""


@register(
    "group_sequential_obf_monitor",
    _OBF_SQL,
    doc="O'Brien-Fleming group-sequential monitor on the purchase "
    "share (H0: 30%), K=4 equally-spaced looks over the event "
    "calendar — the interim-analysis discipline between fixed-n "
    "testing (two_proportion_ztest_returns) and fully-sequential "
    "SPRT (sprt_conversion_monitor): spend almost no alpha early "
    "(|z| > 4.049 at look 1) and close near the fixed-n critical "
    "(2.024 at look 4), so a true effect stops the experiment early "
    "while a null one keeps full final power. The OBF boundaries "
    "are precomputed milli literals (Jennison & Turnbull Table "
    "2.3), look assignment is pure integer date arithmetic, "
    "cumulative counts come from a 4x4 self-join on the look frame "
    "(no window), and the z per look is one shared-IEEE expression "
    "over exact int64 counts with an integer numerator (100x - "
    "30n)/100 so the centering never rounds. Scale: one scan-local "
    "day-to-look reduce; everything after is a 4-row frame.",
)
def q_group_sequential_obf_monitor(spark, sf_dir):
    from ecom_churn_lakehouse_spark.sources import load_events

    ev = load_events(spark, sf_dir).select(
        F.to_date("ts").alias("d"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "is_p"
        ),
    )
    bounds_d = ev.agg(F.min("d").alias("d_lo"), F.max("d").alias("d_hi"))
    looked = ev.crossJoin(F.broadcast(bounds_d)).select(
        F.least(
            F.expr(
                "CAST(datediff(d, d_lo) AS BIGINT) * 4"
                " DIV GREATEST(CAST(datediff(d_hi, d_lo) AS BIGINT) + 1, 1)"
                " + 1"
            ),
            F.lit(4).cast("long"),
        ).alias("look"),
        "is_p",
    )
    per_look = looked.groupBy("look").agg(
        F.count("*").cast("long").alias("n_k"),
        F.sum("is_p").cast("long").alias("x_k"),
    )
    a = per_look.alias("a")
    b = per_look.alias("b")
    cum = (
        a.join(b, F.col("b.look") <= F.col("a.look"))
        .groupBy(F.col("a.look").alias("look"))
        .agg(
            F.sum("b.n_k").cast("long").alias("n_cum"),
            F.sum("b.x_k").cast("long").alias("x_cum"),
        )
    )
    grid = spark.createDataFrame(
        _OBF_BOUNDS_MILLI, "look INT, bound_milli INT"
    ).select(F.col("look").cast("long"), "bound_milli")
    z = cum.join(F.broadcast(grid), on="look").select(
        "look",
        "n_cum",
        "x_cum",
        F.col("bound_milli").cast("long"),
        F.expr(_OBF_Z_MILLI).alias("z_milli"),
    )
    first = (
        z.filter(F.abs(F.col("z_milli")) > F.col("bound_milli"))
        .agg(F.coalesce(F.min("look"), F.lit(99)).alias("first_look"))
    )
    return (
        z.crossJoin(F.broadcast(first))
        .select(
            "look",
            "n_cum",
            "x_cum",
            "bound_milli",
            "z_milli",
            (F.abs(F.col("z_milli")) > F.col("bound_milli")).alias(
                "crossed"
            ),
            (
                (F.abs(F.col("z_milli")) > F.col("bound_milli"))
                & (F.col("first_look") == F.col("look"))
            ).alias("first_crossing"),
        )
        .orderBy("look")
    )


# --------------------------------------------------------------------------
# Round 9 fourth wave: inverse-propensity-weighted ATE (IPW).
# --------------------------------------------------------------------------

#: Per-cell IPW contributions in closed form: within a (brand, q)
#: stratum the empirical propensity is n_t/n, so
#: sum_treated y/p    = sum_t * n // n_t   and
#: sum_control y/(1-p) = sum_c * n // n_c  — exact non-negative
#: integer floor divisions at the cell (one cent of floor slack per
#: cell), summed as plain int64.
_IPW_SQL = """
WITH tagged AS (
    SELECT p.p_brand AS brand,
           CAST(CAST(l.l_quantity AS DECIMAL(18,2)) AS BIGINT) AS q,
           p.p_type LIKE 'PROMO%' AS treated,
           CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
cells AS (
    SELECT brand, q,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
           CAST(SUM(CASE WHEN treated THEN cents ELSE 0 END) AS BIGINT)
               AS sum_t,
           CAST(SUM(CASE WHEN treated THEN 0 ELSE 1 END) AS BIGINT) AS n_c,
           CAST(SUM(CASE WHEN treated THEN 0 ELSE cents END) AS BIGINT)
               AS sum_c
    FROM tagged GROUP BY brand, q
),
overlap AS (SELECT * FROM cells WHERE n_t > 0 AND n_c > 0),
comp AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells_overlap,
           CAST(SUM(n) AS BIGINT) AS n_lines_overlap,
           CAST(SUM(sum_t * n // n_t) AS BIGINT) AS t_weighted_cents,
           CAST(SUM(sum_c * n // n_c) AS BIGINT) AS c_weighted_cents
    FROM overlap
),
degenerate AS (
    SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_lines_degenerate
    FROM cells WHERE n_t = 0 OR n_c = 0
)
SELECT n_cells_overlap, n_lines_overlap, n_lines_degenerate,
       t_weighted_cents, c_weighted_cents,
       CAST(CASE WHEN t_weighted_cents >= c_weighted_cents
            THEN (t_weighted_cents - c_weighted_cents) * 10
                 // n_lines_overlap
            ELSE -((c_weighted_cents - t_weighted_cents) * 10
                   // n_lines_overlap)
                 - (CASE WHEN (c_weighted_cents - t_weighted_cents) * 10
                              % n_lines_overlap > 0 THEN 1 ELSE 0 END)
            END AS BIGINT) AS ipw_ate_millicents
FROM comp CROSS JOIN degenerate
"""


@register(
    "ipw_ate_promo",
    _IPW_SQL,
    doc="Inverse-propensity-weighted average treatment effect of "
    "PROMO parts on line price — the WEIGHTING estimator that "
    "completes the causal tier's identification trio (exact_"
    "matching_att = matching, promo_did_uplift = time, cuped = "
    "variance reduction): within each (brand, quantity) stratum the "
    "empirical propensity is n_t/n, so the Horvitz-Thompson terms "
    "collapse to the closed forms sum_t*n/n_t and sum_c*n/n_c — "
    "exact non-negative int64 floor divisions at the cell (<= one "
    "cent slack each), summed order-free; degenerate cells (no "
    "overlap, where IPW weights are infinite) are COUNTED and "
    "excluded, the positivity-violation bookkeeping an honest IPW "
    "must surface. ATE lands in exact milli-cents; note ATE weights "
    "every overlap line equally, vs the ATT entry's treated-only "
    "weighting — the two differing is itself effect-heterogeneity "
    "evidence. Scale: one map-combinable cell aggregate (bounded "
    "brand x quantity grain), then 1-row frames; cell products stay "
    "under int64 to ~sf100 (documented knob: re-grain to dollars).",
)
def q_ipw_ate_promo(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("decimal(18,2)").cast("long").alias("q"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_brand").alias("brand"),
        F.col("p_type").startswith("PROMO").alias("treated"),
    )
    tagged = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cells = tagged.groupBy("brand", "q").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("treated"), 1).otherwise(0))
        .cast("long")
        .alias("n_t"),
        F.sum(F.when(F.col("treated"), F.col("cents")).otherwise(0))
        .cast("long")
        .alias("sum_t"),
        F.sum(F.when(F.col("treated"), 0).otherwise(1))
        .cast("long")
        .alias("n_c"),
        F.sum(F.when(F.col("treated"), 0).otherwise(F.col("cents")))
        .cast("long")
        .alias("sum_c"),
    )
    overlap = cells.filter((F.col("n_t") > 0) & (F.col("n_c") > 0))
    comp = overlap.agg(
        F.count("*").cast("long").alias("n_cells_overlap"),
        F.sum("n").cast("long").alias("n_lines_overlap"),
        F.sum(F.expr("sum_t * n DIV n_t")).cast("long").alias(
            "t_weighted_cents"
        ),
        F.sum(F.expr("sum_c * n DIV n_c")).cast("long").alias(
            "c_weighted_cents"
        ),
    )
    degenerate = (
        cells.filter((F.col("n_t") == 0) | (F.col("n_c") == 0))
        .agg(
            F.coalesce(F.sum("n"), F.lit(0))
            .cast("long")
            .alias("n_lines_degenerate")
        )
    )
    return comp.crossJoin(F.broadcast(degenerate)).select(
        "n_cells_overlap",
        "n_lines_overlap",
        "n_lines_degenerate",
        "t_weighted_cents",
        "c_weighted_cents",
        F.expr(
            "CAST(CASE WHEN t_weighted_cents >= c_weighted_cents"
            " THEN (t_weighted_cents - c_weighted_cents) * 10"
            "      DIV n_lines_overlap"
            " ELSE -((c_weighted_cents - t_weighted_cents) * 10"
            "        DIV n_lines_overlap)"
            "      - (CASE WHEN (c_weighted_cents - t_weighted_cents) * 10"
            "               % n_lines_overlap > 0 THEN 1 ELSE 0 END)"
            " END AS BIGINT)"
        ).alias("ipw_ate_millicents"),
    )


# --------------------------------------------------------------------------
# Round 9 fourth wave: VanderWeele E-value for unmeasured confounding.
# --------------------------------------------------------------------------

#: RR oriented away from the null (>= 1): RR* = max(RR, 1/RR), one
#: shared-IEEE expression from exact counts.
_EV_RRSTAR = (
    "GREATEST((CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE))"
    " / (CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE)),"
    " (CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
    " / (CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)))"
)
_EV_POINT_MILLI = (
    f"CAST(FLOOR(({_EV_RRSTAR}"
    f" + sqrt({_EV_RRSTAR} * ({_EV_RRSTAR} - 1.0))) * 1000.0) AS BIGINT)"
)
#: 95% CI of ln RR: ln(RR) -/+ 1.96 * sqrt(1/x1 - 1/n1 + 1/x0 - 1/n0).
_EV_SE = (
    "sqrt(1.0 / CAST(x1 AS DOUBLE) - 1.0 / CAST(n1 AS DOUBLE)"
    " + 1.0 / CAST(x0 AS DOUBLE) - 1.0 / CAST(n0 AS DOUBLE))"
)
_EV_LNRR = (
    "ln((CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE))"
    " / (CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE)))"
)
#: CI limit closer to the null, oriented like RR*: exp(|ln RR| - 1.96 se)
#: (<= 1 means the CI crosses the null and the CI E-value is 1).
_EV_CI_NEAR = f"exp(abs({_EV_LNRR}) - 1.96 * {_EV_SE})"
_EV_CI_MILLI = (
    f"CAST(CASE WHEN {_EV_CI_NEAR} <= 1.0 THEN 1000"
    f" ELSE FLOOR(({_EV_CI_NEAR}"
    f" + sqrt({_EV_CI_NEAR} * ({_EV_CI_NEAR} - 1.0))) * 1000.0)"
    " END AS BIGINT)"
)

_EVALUE_SQL = f"""
WITH arms AS (
    SELECT CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                         AND l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS x1,
           CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END)
                AS BIGINT) AS n1,
           CAST(SUM(CASE WHEN p.p_type NOT LIKE 'PROMO%'
                         AND l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS x0,
           CAST(SUM(CASE WHEN p.p_type NOT LIKE 'PROMO%' THEN 1 ELSE 0 END)
                AS BIGINT) AS n0
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
)
SELECT x1, n1, x0, n0,
       CAST(x1 * 1000000 // n1 AS BIGINT) AS p1_ppm,
       CAST(x0 * 1000000 // n0 AS BIGINT) AS p0_ppm,
       CAST(FLOOR({_EV_RRSTAR} * 1000.0) AS BIGINT) AS rr_star_milli,
       {_EV_POINT_MILLI} AS evalue_point_milli,
       {_EV_CI_MILLI} AS evalue_ci_milli,
       {_EV_CI_MILLI} > 1000 AS robust_to_some_confounding
FROM arms
"""


@register(
    "evalue_confounding_bound",
    _EVALUE_SQL,
    doc="VanderWeele-Ding E-value for the PROMO-vs-return association: "
    "the minimum strength of association (risk-ratio scale) an "
    "UNMEASURED confounder would need with both treatment and "
    "outcome to explain the observed risk ratio away — the "
    "sensitivity analysis that belongs beside every observational "
    "estimate this tier produces (matching, IPW, DiD all assume no "
    "unmeasured confounding; the E-value quantifies how wrong that "
    "can be before the conclusion flips). Point E-value RR* + "
    "sqrt(RR*(RR*-1)) on the null-oriented ratio, plus the CI "
    "E-value on the 95% limit nearer the null (1, i.e. milli 1000, "
    "when the CI crosses the null — then NO confounding is needed). "
    "Exact int64 arm counts fused in one conditional aggregate; the "
    "ratio/ln/exp/sqrt chain is one shared-IEEE spelling per "
    "output, floored milli. Scale: one scan-local reduce to a "
    "1-row frame over the broadcast part join.",
)
def q_evalue_confounding_bound(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_returnflag"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_type").like("PROMO%").alias("is_promo")
    )
    arms = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        F.sum(
            F.when(
                F.col("is_promo") & (F.col("l_returnflag") == "R"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("x1"),
        F.sum(F.when(F.col("is_promo"), 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(
            F.when(
                ~F.col("is_promo") & (F.col("l_returnflag") == "R"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("x0"),
        F.sum(F.when(~F.col("is_promo"), 1).otherwise(0))
        .cast("long")
        .alias("n0"),
    )
    return arms.select(
        "x1",
        "n1",
        "x0",
        "n0",
        F.expr("CAST(x1 * 1000000 DIV n1 AS BIGINT)").alias("p1_ppm"),
        F.expr("CAST(x0 * 1000000 DIV n0 AS BIGINT)").alias("p0_ppm"),
        F.expr(f"CAST(FLOOR({_EV_RRSTAR} * 1000.0) AS BIGINT)").alias(
            "rr_star_milli"
        ),
        F.expr(_EV_POINT_MILLI).alias("evalue_point_milli"),
        F.expr(_EV_CI_MILLI).alias("evalue_ci_milli"),
        (F.expr(_EV_CI_MILLI) > 1000).alias(
            "robust_to_some_confounding"
        ),
    )


# --------------------------------------------------------------------------
# Round 9 fourth wave: covariate balance (standardized mean differences).
# --------------------------------------------------------------------------

#: SMD = (mean_t - mean_c) / sqrt((var_t + var_c) / 2) from exact
#: int64 per-arm moment sums, one shared-IEEE spelling, floored
#: milli. |SMD| < 0.1 is the conventional balance bar.
_SMD_MILLI = (
    "CAST(FLOOR((CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE)"
    " - CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE))"
    " / sqrt(((CAST(ss_t AS DOUBLE) / CAST(n_t AS DOUBLE)"
    "          - (CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE))"
    "            * (CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE)))"
    "         + (CAST(ss_c AS DOUBLE) / CAST(n_c AS DOUBLE)"
    "            - (CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE))"
    "              * (CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE))))"
    "        / 2.0)"
    " * 1000.0) AS BIGINT)"
)

_BALANCE_SQL = f"""
WITH tagged AS (
    SELECT p.p_type LIKE 'PROMO%' AS treated,
           CAST(CAST(l.l_quantity AS DECIMAL(18,2)) AS BIGINT) AS quantity,
           CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               // 100 AS price_dollars,
           CAST(CAST(l.l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT)
               AS discount_bp
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
long AS (
    SELECT treated, 'quantity' AS covariate, quantity AS x FROM tagged
    UNION ALL
    SELECT treated, 'price_dollars', price_dollars FROM tagged
    UNION ALL
    SELECT treated, 'discount_bp', discount_bp FROM tagged
),
arms AS (
    SELECT covariate,
           CAST(SUM(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
           CAST(SUM(CASE WHEN treated THEN x ELSE 0 END) AS BIGINT) AS s_t,
           CAST(SUM(CASE WHEN treated THEN x * x ELSE 0 END) AS BIGINT)
               AS ss_t,
           CAST(SUM(CASE WHEN treated THEN 0 ELSE 1 END) AS BIGINT) AS n_c,
           CAST(SUM(CASE WHEN treated THEN 0 ELSE x END) AS BIGINT) AS s_c,
           CAST(SUM(CASE WHEN treated THEN 0 ELSE x * x END) AS BIGINT)
               AS ss_c
    FROM long GROUP BY covariate
)
SELECT covariate, n_t, n_c, s_t, s_c,
       {_SMD_MILLI} AS smd_milli,
       abs({_SMD_MILLI}) < 100 AS balanced_at_01
FROM arms
ORDER BY covariate
"""


@register(
    "covariate_balance_smd",
    _BALANCE_SQL,
    doc="Covariate balance table (standardized mean differences) for "
    "the PROMO treatment: per covariate (quantity, price, discount) "
    "the SMD between treated and control arms with the conventional "
    "|SMD| < 0.1 balance verdict — the love-plot diagnostic that "
    "must accompany every observational estimate this tier ships "
    "(exact_matching_att, ipw_ate_promo, promo_did_uplift assume "
    "comparable arms; this table is the evidence, and a large SMD "
    "names exactly which confounder the cells must stratify on). "
    "Covariates quantize to their exact integer grains (units, "
    "DOLLARS — the cents grain's squared sum would pass int64 at "
    "~sf0.05, dollars hold to ~sf100 — and basis points) and "
    "unpivot scan-locally; per-arm moment "
    "sums fuse into ONE map-combinable conditional aggregate at the "
    "covariate grain; the SMD is one shared-IEEE spelling floored "
    "to milli. Scale: one scan over the broadcast part join, 3-row "
    "frames after.",
)
def q_covariate_balance_smd(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("decimal(18,2)").cast("long").alias(
            "quantity"
        ),
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " DIV 100"
        ).alias("price_dollars"),
        (F.col("l_discount").cast("decimal(18,4)") * 10000)
        .cast("long")
        .alias("discount_bp"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_type").like("PROMO%").alias("treated")
    )
    tagged = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    parts = []
    for cov in ("quantity", "price_dollars", "discount_bp"):
        parts.append(
            tagged.select(
                "treated",
                F.lit(cov).alias("covariate"),
                F.col(cov).alias("x"),
            )
        )
    long = parts[0]
    for p_ in parts[1:]:
        long = long.unionByName(p_)
    arms = long.groupBy("covariate").agg(
        F.sum(F.when(F.col("treated"), 1).otherwise(0))
        .cast("long")
        .alias("n_t"),
        F.sum(F.when(F.col("treated"), F.col("x")).otherwise(0))
        .cast("long")
        .alias("s_t"),
        F.sum(F.when(F.col("treated"), F.expr("x * x")).otherwise(0))
        .cast("long")
        .alias("ss_t"),
        F.sum(F.when(F.col("treated"), 0).otherwise(1))
        .cast("long")
        .alias("n_c"),
        F.sum(F.when(F.col("treated"), 0).otherwise(F.col("x")))
        .cast("long")
        .alias("s_c"),
        F.sum(F.when(F.col("treated"), 0).otherwise(F.expr("x * x")))
        .cast("long")
        .alias("ss_c"),
    )
    return arms.select(
        "covariate",
        "n_t",
        "n_c",
        "s_t",
        "s_c",
        F.expr(_SMD_MILLI).alias("smd_milli"),
        (F.abs(F.expr(_SMD_MILLI)) < 100).alias("balanced_at_01"),
    ).orderBy("covariate")


# --------------------------------------------------------------------------
# Round 9 fourth wave: quantile treatment effects (QTE).
# --------------------------------------------------------------------------

_QTE_TAUS = [25, 50, 75, 90]


def _qte_sql() -> str:
    tau_cols_t = ",\n           ".join(
        f"CAST(quantile_disc(CASE WHEN treated THEN cents END,"
        f" {t}.0 / 100) AS BIGINT) AS qt{t}"
        for t in _QTE_TAUS
    )
    tau_cols_c = ",\n           ".join(
        f"CAST(quantile_disc(CASE WHEN NOT treated THEN cents END,"
        f" {t}.0 / 100) AS BIGINT) AS qc{t}"
        for t in _QTE_TAUS
    )
    rows = " UNION ALL ".join(
        f"SELECT {t} AS tau_pct, qt{t} AS q_treated_cents,"
        f" qc{t} AS q_control_cents, qt{t} - qc{t} AS qte_cents"
        " FROM qs"
        for t in _QTE_TAUS
    )
    return f"""
WITH tagged AS (
    SELECT p.p_type LIKE 'PROMO%' AS treated,
           CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
qs AS (
    SELECT {tau_cols_t},
           {tau_cols_c}
    FROM tagged
)
SELECT CAST(tau_pct AS BIGINT) AS tau_pct,
       q_treated_cents, q_control_cents, qte_cents
FROM ({rows})
ORDER BY tau_pct
"""


@register(
    "quantile_treatment_effects",
    _qte_sql(),
    doc="Quantile treatment effects of PROMO parts on line price at "
    "the 25/50/75/90th percentiles — the DISTRIBUTIONAL causal "
    "readout the mean-effect estimators can't give (ipw_ate_promo / "
    "exact_matching_att say what happens on average; the QTE "
    "profile says WHERE in the price distribution the effect lives "
    "— a pure tail effect and a uniform shift have the same ATE and "
    "opposite business meaning). Quantiles are exact "
    "percentile_disc data values in int64 cents (conditional on the "
    "arm via CASE inside the aggregate — one pass, no split scan), "
    "so every QTE is an exact integer difference of observed "
    "prices. Scale: ONE pass — the fact reduces to the (arm, "
    "distinct-value) grain, one partitioned cumulative window "
    "serves every tau simultaneously (cum*100 >= n*tau is the "
    "exact integer ceil spelling of percentile_disc; the two "
    "arm-partitioned windows run over the distinct-cents VALUE "
    "grain, bounded by the price domain, not the population), vs 8 "
    "independent percentile sorts in the naive plan (measured 3x "
    "cheaper at sf0.1).",
)
def q_quantile_treatment_effects(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_type").like("PROMO%").alias("treated")
    )
    tagged = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    # Single-pass quantile lookup instead of 8 independent
    # percentile_disc sorts: reduce to the (arm, value) grain, one
    # partitioned cumulative window, then each tau is a conditional
    # min over the same frame — percentile_disc semantics exactly
    # (smallest value whose cume count reaches ceil(tau * n)).
    from pyspark.sql.window import Window as _W

    counts = tagged.groupBy("treated", "cents").agg(
        F.count("*").cast("long").alias("c")
    )
    w = _W.partitionBy("treated").orderBy("cents")
    wn = _W.partitionBy("treated")
    cum = counts.select(
        "treated",
        "cents",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(wn).alias("n"),
    )
    aggs = []
    for t in _QTE_TAUS:
        # ceil(t/100 * n) == (t * n + 99) DIV 100 on exact ints
        cond = F.col("cum") * 100 >= F.col("n") * t
        aggs.append(
            F.min(F.when(F.col("treated") & cond, F.col("cents")))
            .cast("long")
            .alias(f"qt{t}")
        )
        aggs.append(
            F.min(F.when(~F.col("treated") & cond, F.col("cents")))
            .cast("long")
            .alias(f"qc{t}")
        )
    qs = cum.agg(*aggs)
    parts = []
    for t in _QTE_TAUS:
        parts.append(
            qs.select(
                F.lit(t).cast("long").alias("tau_pct"),
                F.col(f"qt{t}").alias("q_treated_cents"),
                F.col(f"qc{t}").alias("q_control_cents"),
                (F.col(f"qt{t}") - F.col(f"qc{t}")).alias("qte_cents"),
            )
        )
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out.orderBy("tau_pct")


# --------------------------------------------------------------------------
# Round 9 fourth wave: one-sample chi-square goodness-of-fit (DOW mix).
# --------------------------------------------------------------------------

#: chi2 against the uniform 7-day null collapses to the exact rational
#: (7 * sum(O_i^2) - N^2) / N — non-negative integers end to end.
_GOF_SQL = """
WITH dow AS (
    SELECT isodow(CAST(ts AS DATE)) AS dw, CAST(COUNT(*) AS BIGINT) AS o
    FROM events GROUP BY 1
),
s AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(o) AS BIGINT) AS n,
           CAST(SUM(o * o) AS BIGINT) AS so2,
           CAST(MAX(o) AS BIGINT) AS o_max,
           CAST(MIN(o) AS BIGINT) AS o_min
    FROM dow
)
SELECT k, n, o_min, o_max,
       CAST((7 * so2 - n * n) * 1000 // n AS BIGINT) AS chi2_milli,
       (7 * so2 - n * n) * 1000 // n > 12591 AS reject_uniform_at_05
FROM s
"""


@register(
    "dow_uniformity_gof",
    _GOF_SQL,
    doc="One-sample chi-square goodness-of-fit of the event "
    "day-of-week mix against the uniform null — the GOF shape the "
    "test battery lacked (promo_chisq_independence tests "
    "INDEPENDENCE of two categoricals; this tests one categorical "
    "against a SPECIFIED distribution, the weekly-seasonality "
    "yes/no a dow profile chart only eyeballs). Against uniform "
    "the statistic collapses algebraically to (7*sum(O^2) - N^2)/N "
    "— exact non-negative int64 end to end, floored milli, compared "
    "to the df=6 critical 12.59159 floored (12591). ISO day "
    "numbering on both engines (isodow vs weekday+1, the "
    "calendar_battery split). Scale: one scan-local 7-row reduce.",
)
def q_dow_uniformity_gof(spark, sf_dir):
    from ecom_churn_lakehouse_spark.sources import load_events

    ev = load_events(spark, sf_dir)
    dow = ev.groupBy(
        (F.weekday(F.col("ts").cast("date")) + 1).alias("dw")
    ).agg(F.count("*").cast("long").alias("o"))
    s = dow.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("o").cast("long").alias("n"),
        F.sum(F.expr("o * o")).cast("long").alias("so2"),
        F.max("o").cast("long").alias("o_max"),
        F.min("o").cast("long").alias("o_min"),
    )
    chi2 = F.expr("(7 * so2 - n * n) * 1000 DIV n")
    return s.select(
        "k",
        "n",
        "o_min",
        "o_max",
        chi2.cast("long").alias("chi2_milli"),
        (chi2 > 12591).alias("reject_uniform_at_05"),
    )
