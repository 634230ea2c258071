"""Data-ops operators: storage-layout advice, optimizer-style join
cardinality estimation, replication checksums, and snapshot diffing
(SURVEY §7.7 extension surface — the table-management tooling a
lakehouse team runs around the reference's MERGE/SCD pipelines,
reference parity anchor: src/transformations/orders_bronze_to_silver.py's
managed-table lifecycle).

- ``column_encoding_advisor`` — per candidate column: exact distinct
  count, exact RUN count in table sort-key order, and length stats,
  driving a DICT/RLE/PLAIN encoding recommendation. Run counting is
  the distributed design: runs within o_orderkey-range buckets via a
  bucket-partitioned window, then bucket-boundary merges corrected on
  the tiny bucket-summary frame — no global single-partition window
  ever touches the fact.
- ``join_cardinality_estimate`` — the textbook CBO estimate
  |L ⋈ R| ≈ n_L·n_R / max(ndv_L, ndv_R) for three real join
  candidates, side by side with the exact join size and the worst
  single-key contribution (the skew diagnostic AQE would want).
- ``table_checksum_by_segment`` — order-insensitive BIT_XOR row
  checksum per customer segment (plus row count and hash extrema):
  the cheap replication-divergence detector — two sites compare 5
  rows instead of 1.5e7.
- ``snapshot_table_diff`` — full-outer diff of two deterministic
  snapshots of ``orders``, classifying added/removed/changed/
  unchanged with per-column change counts — the generic audit behind
  version_change_feed when no CDC log exists.

Scale posture: the advisor's windows are bucket-partitioned (8192
keys per bucket) so parallelism scales with data; the estimator
reduces each side to per-key counts before any join of counts; the
checksum is one map-side-combinable aggregate; the diff is a single
key-equi full-outer join.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ecom_churn_lakehouse_spark.operators.sampling import hash_bucket, hash_bucket_sql
from ecom_churn_lakehouse_spark.registry import register
from ecom_churn_lakehouse_spark.sources import load_table

# --------------------------------------------------------------------------
# Column encoding advisor (distributed exact run-length profile).
# --------------------------------------------------------------------------

_BUCKET = 8192
_ADVISOR_COLS = ["o_orderstatus", "o_orderpriority"]

_ENC_COL_SQL = """
SELECT '{col}' AS column_name,
       CAST(n AS BIGINT) AS n_rows,
       CAST(ndv AS BIGINT) AS n_distinct,
       CAST(runs AS BIGINT) AS n_runs,
       CAST(len_sum * 1000 // n AS BIGINT) AS avg_len_milli,
       CASE WHEN runs * 1000000 // n <= 50000 THEN 'RLE'
            WHEN ndv * 1000000 // n <= 1000 THEN 'DICT'
            ELSE 'PLAIN' END AS recommendation
FROM (
    SELECT (SELECT COUNT(*) FROM orders) AS n,
           (SELECT COUNT(DISTINCT {col}) FROM orders) AS ndv,
           (SELECT SUM(LENGTH({col})) FROM orders) AS len_sum,
           (SELECT SUM(bruns) - SUM(CASE WHEN prev_last = fst THEN 1 ELSE 0 END)
            FROM (
                SELECT bucket, fst,
                       LAG(lst) OVER (ORDER BY bucket) AS prev_last, bruns
                FROM (
                    SELECT bucket,
                           ARG_MIN({col}, o_orderkey) AS fst,
                           ARG_MAX({col}, o_orderkey) AS lst,
                           SUM(is_run_start) AS bruns
                    FROM (
                        SELECT o_orderkey // {bucket} AS bucket, o_orderkey, {col},
                               CASE WHEN {col} IS DISTINCT FROM
                                    LAG({col}) OVER (PARTITION BY o_orderkey // {bucket}
                                                     ORDER BY o_orderkey)
                                    THEN 1 ELSE 0 END AS is_run_start
                        FROM orders
                    ) GROUP BY bucket
                )
            )) AS runs
)
"""

_ENC_SQL = "\nUNION ALL\n".join(
    _ENC_COL_SQL.format(col=c, bucket=_BUCKET) for c in _ADVISOR_COLS
)


def _encoding_profile(orders, col):
    b = (F.col("o_orderkey") / _BUCKET).cast("long").alias("bucket")
    w_in = Window.partitionBy("bucket").orderBy("o_orderkey")
    marked = orders.select(b, "o_orderkey", col).withColumn(
        "is_run_start",
        F.when(
            ~F.col(col).eqNullSafe(F.lag(col).over(w_in)), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    per_bucket = marked.groupBy("bucket").agg(
        F.expr(f"min_by({col}, o_orderkey)").alias("fst"),
        F.expr(f"max_by({col}, o_orderkey)").alias("lst"),
        F.sum("is_run_start").alias("bruns"),
    )
    w_b = Window.orderBy("bucket")
    merged = per_bucket.select(
        "bruns", F.lag("lst").over(w_b).alias("prev_last"), "fst"
    ).agg(
        (
            F.sum("bruns")
            - F.sum(F.when(F.col("prev_last") == F.col("fst"), 1).otherwise(0))
        ).alias("runs")
    )
    stats = orders.agg(
        F.count("*").alias("n"),
        F.count_distinct(col).alias("ndv"),
        F.sum(F.length(col)).alias("len_sum"),
    )
    joined = stats.withColumn("k", F.lit(1)).join(
        merged.withColumn("k", F.lit(1)), "k"
    )
    return joined.select(
        F.lit(col).alias("column_name"),
        F.col("n").cast("long").alias("n_rows"),
        F.col("ndv").cast("long").alias("n_distinct"),
        F.col("runs").cast("long").alias("n_runs"),
        F.expr("len_sum * 1000 DIV n").cast("long").alias("avg_len_milli"),
        F.when(F.expr("runs * 1000000 DIV n") <= 50000, "RLE")
        .when(F.expr("ndv * 1000000 DIV n") <= 1000, "DICT")
        .otherwise("PLAIN")
        .alias("recommendation"),
    )


@register(
    "column_encoding_advisor",
    _ENC_SQL,
    doc="Storage-layout advisor: per candidate column, exact distinct "
    "count, exact run count in o_orderkey order, and average length, "
    "driving a DICT/RLE/PLAIN recommendation. The run count uses the "
    "distributed design: runs inside 8192-key range buckets via a "
    "bucket-partitioned window, then boundary merges corrected on the "
    "bucket-summary frame (n/8192 rows) — exact total, no global "
    "window on the fact, parallelism grows with data.",
)
def q_column_encoding_advisor(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    out = None
    for c in _ADVISOR_COLS:
        df = _encoding_profile(orders, c)
        out = df if out is None else out.unionByName(df)
    return out


# --------------------------------------------------------------------------
# CBO-style join cardinality estimate vs exact.
# --------------------------------------------------------------------------

_JOIN_CANDIDATES = [
    ("customer", "c_custkey", "orders", "o_custkey"),
    ("orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("part", "p_partkey", "lineitem", "l_partkey"),
]

#: Shared IEEE expression text — both engines must evaluate the
#: estimate with identical association order.
_EST_EXPR = (
    "CAST(FLOOR(CAST(n_left AS DOUBLE) * CAST(n_right AS DOUBLE) "
    "/ CAST(GREATEST(ndv_left, ndv_right) AS DOUBLE)) AS BIGINT)"
)

_CARD_ONE_SQL = """
SELECT '{lt}.{lk} = {rt}.{rk}' AS join_candidate,
       n_left, n_right, ndv_left, ndv_right,
       {est} AS est_rows,
       actual_rows, max_single_key_pairs
FROM (
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM {lt}) AS n_left,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM {rt}) AS n_right,
           (SELECT CAST(COUNT(DISTINCT {lk}) AS BIGINT) FROM {lt}) AS ndv_left,
           (SELECT CAST(COUNT(DISTINCT {rk}) AS BIGINT) FROM {rt}) AS ndv_right,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM {lt} l JOIN {rt} r ON l.{lk} = r.{rk}) AS actual_rows,
           (SELECT CAST(MAX(cl * cr) AS BIGINT) FROM
               (SELECT {lk} AS k, COUNT(*) AS cl FROM {lt} GROUP BY {lk}) a
               JOIN
               (SELECT {rk} AS k, COUNT(*) AS cr FROM {rt} GROUP BY {rk}) b
               USING (k)) AS max_single_key_pairs
)
"""

_CARD_SQL = "\nUNION ALL\n".join(
    _CARD_ONE_SQL.format(lt=lt, lk=lk, rt=rt, rk=rk, est=_EST_EXPR)
    for lt, lk, rt, rk in _JOIN_CANDIDATES
)


@register(
    "join_cardinality_estimate",
    _CARD_SQL,
    doc="Optimizer's-eye join audit: for three real join candidates, "
    "the textbook CBO estimate n_L*n_R/max(ndv_L,ndv_R) next to the "
    "exact join cardinality and the worst single-key pair count (the "
    "skew signal AQE acts on). Each side reduces to per-key counts "
    "before any count-frame join; the estimate itself is one shared "
    "floor-quantized IEEE expression. This is the planning artifact "
    "that decides broadcast-vs-shuffle and salting at 100 TB.",
)
def q_join_cardinality_estimate(spark, sf_dir):
    out = None
    for lt, lk, rt, rk in _JOIN_CANDIDATES:
        left = load_table(spark, sf_dir, lt)
        right = load_table(spark, sf_dir, rt)
        lstats = left.agg(
            F.count("*").cast("long").alias("n_left"),
            F.count_distinct(lk).cast("long").alias("ndv_left"),
        )
        rstats = right.agg(
            F.count("*").cast("long").alias("n_right"),
            F.count_distinct(rk).cast("long").alias("ndv_right"),
        )
        actual = (
            left.join(right, left[lk] == right[rk])
            .agg(F.count("*").cast("long").alias("actual_rows"))
        )
        lcnt = left.groupBy(F.col(lk).alias("k")).agg(F.count("*").alias("cl"))
        rcnt = right.groupBy(F.col(rk).alias("k")).agg(F.count("*").alias("cr"))
        worst = (
            lcnt.join(rcnt, "k")
            .agg(F.max(F.col("cl") * F.col("cr")).cast("long").alias("max_single_key_pairs"))
        )
        one = (
            lstats.withColumn("j", F.lit(1))
            .join(rstats.withColumn("j", F.lit(1)), "j")
            .join(actual.withColumn("j", F.lit(1)), "j")
            .join(worst.withColumn("j", F.lit(1)), "j")
            .select(
                F.lit(f"{lt}.{lk} = {rt}.{rk}").alias("join_candidate"),
                "n_left",
                "n_right",
                "ndv_left",
                "ndv_right",
                F.expr(_EST_EXPR).alias("est_rows"),
                "actual_rows",
                "max_single_key_pairs",
            )
        )
        out = one if out is None else out.unionByName(one)
    return out


# --------------------------------------------------------------------------
# Replication checksum.
# --------------------------------------------------------------------------

_CHECKSUM_KEY_SQL = (
    "(CAST(c_custkey AS VARCHAR) || '|' || c_name || '|' || "
    "CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR))"
)

_CHECKSUM_SQL = f"""
SELECT c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(BIT_XOR({hash_bucket_sql(_CHECKSUM_KEY_SQL, "ck:", 2**60)}) AS BIGINT)
           AS xor_checksum,
       CAST(MIN({hash_bucket_sql(_CHECKSUM_KEY_SQL, "ck:", 2**60)}) AS BIGINT)
           AS min_hash,
       CAST(MAX({hash_bucket_sql(_CHECKSUM_KEY_SQL, "ck:", 2**60)}) AS BIGINT)
           AS max_hash
FROM customer
GROUP BY c_mktsegment
"""


@register(
    "table_checksum_by_segment",
    _CHECKSUM_SQL,
    doc="Replication-divergence detector: per customer segment, an "
    "order-insensitive BIT_XOR checksum of a canonical row hash "
    "(key|name|balance-cents through the shared md5 idiom), plus row "
    "count and hash extrema. Two replicas compare 5 rows to certify "
    "1.5e7 — and XOR localizes a single-row divergence to its "
    "segment. One map-side-combinable aggregate, no shuffle beyond "
    "5 groups.",
)
def q_table_checksum_by_segment(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    row_key = F.concat(
        F.col("c_custkey").cast("string"),
        F.lit("|"),
        F.col("c_name"),
        F.lit("|"),
        (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("long").cast("string"),
    )
    h = hash_bucket(row_key, "ck:", mod=2**60)
    return (
        cust.select(F.col("c_mktsegment").alias("segment"), h.alias("h"))
        .groupBy("segment")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.expr("bit_xor(h)").cast("long").alias("xor_checksum"),
            F.min("h").cast("long").alias("min_hash"),
            F.max("h").cast("long").alias("max_hash"),
        )
    )


# --------------------------------------------------------------------------
# Snapshot diff.
# --------------------------------------------------------------------------

_SNAP_CUT_A = "1997-12-31"
_SNAP_CUT_B = "1998-06-30"

_H_DROP = hash_bucket_sql("o_orderkey", "snapdrop:", 97)
_H_STATUS = hash_bucket_sql("o_orderkey", "snapstat:", 50)
_H_PRICE = hash_bucket_sql("o_orderkey", "snapprice:", 31)

_DIFF_SQL = f"""
WITH snap_a AS (
    SELECT o_orderkey,
           o_orderstatus AS status,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
    FROM orders WHERE o_orderdate <= TIMESTAMP '{_SNAP_CUT_A} 00:00:00'
),
snap_b AS (
    SELECT o_orderkey,
           CASE WHEN {_H_STATUS} = 0 THEN 'X' ELSE o_orderstatus END AS status,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               + CASE WHEN {_H_PRICE} = 0 THEN 100 ELSE 0 END AS cents
    FROM orders
    WHERE o_orderdate <= TIMESTAMP '{_SNAP_CUT_B} 00:00:00' AND {_H_DROP} != 0
),
diff AS (
    SELECT CASE WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN b.o_orderkey IS NULL THEN 'removed'
                WHEN a.status IS DISTINCT FROM b.status
                     OR a.cents IS DISTINCT FROM b.cents THEN 'changed'
                ELSE 'unchanged' END AS change_class,
           CASE WHEN a.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL
                     AND a.status IS DISTINCT FROM b.status THEN 1 ELSE 0 END
               AS status_diff,
           CASE WHEN a.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL
                     AND a.cents IS DISTINCT FROM b.cents THEN 1 ELSE 0 END
               AS price_diff
    FROM snap_a a FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey
)
SELECT change_class,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(status_diff) AS BIGINT) AS n_status_diff,
       CAST(SUM(price_diff) AS BIGINT) AS n_price_diff
FROM diff GROUP BY change_class
"""


@register(
    "snapshot_table_diff",
    _DIFF_SQL,
    doc="Generic snapshot-diff audit: two deterministic snapshots of "
    "orders (a time cutoff plus hash-seeded synthetic status/price "
    "revisions and deletions), full-outer joined on the key and "
    "classified added/removed/changed/unchanged with per-column "
    "change counts — version_change_feed's audit twin when no CDC "
    "log exists (reference parity anchor: the MERGE pipeline in "
    "src/transformations/orders_bronze_to_silver.py). One key-equi "
    "full-outer join; the classification is a projection.",
)
def q_snapshot_table_diff(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    snap_a = orders.filter(
        F.col("o_orderdate") <= F.lit(f"{_SNAP_CUT_A} 00:00:00").cast("timestamp")
    ).select("o_orderkey", F.col("o_orderstatus").alias("status"), cents.alias("cents"))
    h_status = hash_bucket(F.col("o_orderkey"), "snapstat:", mod=50)
    h_price = hash_bucket(F.col("o_orderkey"), "snapprice:", mod=31)
    h_drop = hash_bucket(F.col("o_orderkey"), "snapdrop:", mod=97)
    snap_b = (
        orders.filter(
            (F.col("o_orderdate") <= F.lit(f"{_SNAP_CUT_B} 00:00:00").cast("timestamp"))
            & (h_drop != 0)
        )
        .select(
            "o_orderkey",
            F.when(h_status == 0, F.lit("X")).otherwise(F.col("o_orderstatus")).alias("status"),
            (cents + F.when(h_price == 0, F.lit(100)).otherwise(F.lit(0))).alias("cents"),
        )
    )
    # presence is judged on payload nulls: status/cents are never null
    # inside a snapshot, so an all-null side means "absent from it"
    diff = (
        snap_a.select("o_orderkey", F.col("status").alias("a_status"), F.col("cents").alias("a_cents"))
        .join(
            snap_b.select(
                "o_orderkey", F.col("status").alias("b_status"), F.col("cents").alias("b_cents")
            ),
            "o_orderkey",
            "full_outer",
        )
        .select(
            F.when(F.col("a_status").isNull() & F.col("a_cents").isNull(), "added")
            .when(F.col("b_status").isNull() & F.col("b_cents").isNull(), "removed")
            .when(
                ~F.col("a_status").eqNullSafe(F.col("b_status"))
                | ~F.col("a_cents").eqNullSafe(F.col("b_cents")),
                "changed",
            )
            .otherwise("unchanged")
            .alias("change_class"),
            F.when(
                F.col("a_status").isNotNull()
                & F.col("b_status").isNotNull()
                & ~F.col("a_status").eqNullSafe(F.col("b_status")),
                1,
            )
            .otherwise(0)
            .alias("status_diff"),
            F.when(
                F.col("a_cents").isNotNull()
                & F.col("b_cents").isNotNull()
                & ~F.col("a_cents").eqNullSafe(F.col("b_cents")),
                1,
            )
            .otherwise(0)
            .alias("price_diff"),
        )
    )
    return diff.groupBy("change_class").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("status_diff").cast("long").alias("n_status_diff"),
        F.sum("price_diff").cast("long").alias("n_price_diff"),
    )


# --------------------------------------------------------------------------
# Bloom-filter false-positive audit.
# --------------------------------------------------------------------------

_BF_BITS = 131_072  # 2^17
_BF_SALTS = ["bf0:", "bf1:", "bf2:"]

_BF_MEMBER_BITS_SQL = "\n    UNION ALL\n    ".join(
    f"SELECT DISTINCT {hash_bucket_sql('o_custkey', s, _BF_BITS)} AS pos "
    "FROM orders" for s in _BF_SALTS
)
_BF_PROBE_BITS_SQL = "\n    UNION ALL\n    ".join(
    f"SELECT c_custkey, {hash_bucket_sql('c_custkey', s, _BF_BITS)} AS pos "
    "FROM customer" for s in _BF_SALTS
)

_BF_SQL = f"""
WITH bits AS (
    SELECT DISTINCT pos FROM (
    {_BF_MEMBER_BITS_SQL}
    )
),
probe_bits AS (
    {_BF_PROBE_BITS_SQL}
),
hits AS (
    SELECT p.c_custkey, COUNT(b.pos) AS matched
    FROM probe_bits p LEFT JOIN bits b ON b.pos = p.pos
    GROUP BY p.c_custkey
),
truth AS (
    SELECT DISTINCT o_custkey FROM orders
),
verdicts AS (
    SELECT h.c_custkey,
           h.matched = {len(_BF_SALTS)} AS bloom_positive,
           t.o_custkey IS NOT NULL AS is_member
    FROM hits h LEFT JOIN truth t ON t.o_custkey = h.c_custkey
)
SELECT CAST({len(_BF_SALTS)} AS INTEGER) AS k_hashes,
       CAST({_BF_BITS} AS BIGINT) AS m_bits,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS n_bits_set,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_members,
       CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_true_members,
       CAST(SUM(CASE WHEN bloom_positive THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_positive,
       CAST(SUM(CASE WHEN bloom_positive AND NOT is_member THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_positive,
       CAST(SUM(CASE WHEN bloom_positive AND NOT is_member THEN 1 ELSE 0 END)
            * 1000000
            // GREATEST(SUM(CASE WHEN NOT is_member THEN 1 ELSE 0 END), 1)
            AS BIGINT) AS fp_ppm
FROM verdicts
"""


@register(
    "bloom_filter_fp_audit",
    _BF_SQL,
    doc=f"Relational Bloom filter (m={_BF_BITS} bits, k="
    f"{len(_BF_SALTS)} md5-idiom hashes) over the customers-with-"
    "orders key set, probed with every customer: true membership vs "
    "bloom verdict, measured false-positive rate in exact ppm. No "
    "false negatives by construction (asserted in tests). This is the "
    "join-pruning primitive behind runtime row filters: the bitset "
    "relation is bounded by m rows regardless of data size, so it is "
    "ALWAYS broadcastable — probing 100 TB costs a map-side hash "
    "lookup, never a shuffle of the fact.",
)
def q_bloom_filter_fp_audit(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    k = len(_BF_SALTS)

    bits = None
    for s in _BF_SALTS:
        one = orders.select(hash_bucket(F.col("o_custkey"), s, mod=_BF_BITS).alias("pos"))
        bits = one if bits is None else bits.unionByName(one)
    bits = bits.distinct()

    probe_bits = None
    for s in _BF_SALTS:
        one = cust.select(
            "c_custkey", hash_bucket(F.col("c_custkey"), s, mod=_BF_BITS).alias("pos")
        )
        probe_bits = one if probe_bits is None else probe_bits.unionByName(one)

    hits = (
        probe_bits.join(F.broadcast(bits.withColumnRenamed("pos", "bpos")),
                        F.col("pos") == F.col("bpos"), "left")
        .groupBy("c_custkey")
        .agg(F.count("bpos").alias("matched"))
    )
    truth = orders.select(F.col("o_custkey")).distinct()
    verdicts = hits.join(truth, hits.c_custkey == truth.o_custkey, "left").select(
        (F.col("matched") == k).alias("bloom_positive"),
        F.col("o_custkey").isNotNull().alias("is_member"),
    )
    n_bits = bits.agg(F.count("*").cast("long").alias("n_bits_set"))
    n_mem = truth.agg(F.count("*").cast("long").alias("n_members"))
    summary = verdicts.agg(
        F.count("*").cast("long").alias("n_probes"),
        F.sum(F.col("is_member").cast("long")).cast("long").alias("n_true_members"),
        F.sum(F.col("bloom_positive").cast("long")).cast("long").alias("n_bloom_positive"),
        F.sum((F.col("bloom_positive") & ~F.col("is_member")).cast("long"))
        .cast("long")
        .alias("n_false_positive"),
        F.expr(
            "CAST(SUM(CAST(bloom_positive AND NOT is_member AS BIGINT)) * 1000000 "
            "DIV GREATEST(SUM(CAST(NOT is_member AS BIGINT)), 1) AS BIGINT)"
        ).alias("fp_ppm"),
    )
    return (
        summary.withColumn("j", F.lit(1))
        .join(n_bits.withColumn("j", F.lit(1)), "j")
        .join(n_mem.withColumn("j", F.lit(1)), "j")
        .select(
            F.lit(k).cast("int").alias("k_hashes"),
            F.lit(_BF_BITS).cast("long").alias("m_bits"),
            "n_bits_set",
            "n_members",
            "n_probes",
            "n_true_members",
            "n_bloom_positive",
            "n_false_positive",
            "fp_ppm",
        )
    )


# --------------------------------------------------------------------------
# Z-order layout audit.
# --------------------------------------------------------------------------

_Z_BITS = 12
_Z_FILE_ROWS = 4096  # z-range bucket width (2^12 z values per file)
_Z_EPOCH = "1995-01-01"


def _z_interleave_sql(day: str, ck: str) -> str:
    """DuckDB spelling of the 12+12-bit Morton interleave."""
    terms = []
    for b in range(_Z_BITS):
        terms.append(f"((({day} >> {b}) & 1) << {2 * b + 1})")
        terms.append(f"((({ck} >> {b}) & 1) << {2 * b})")
    return "(" + " + ".join(terms) + ")"


def _z_interleave_col(day, ck):
    """Spark spelling of the same Morton interleave."""
    z = F.lit(0)
    for b in range(_Z_BITS):
        z = z + F.shiftleft(F.shiftright(day, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        z = z + F.shiftleft(F.shiftright(ck, b).bitwiseAND(F.lit(1)), 2 * b)
    return z


_ZORDER_SQL = f"""
WITH keyed AS (
    SELECT CAST(date_diff('day', TIMESTAMP '{_Z_EPOCH} 00:00:00', o_orderdate)
                AS BIGINT) AS day_idx,
           o_custkey % 4096 AS ck
    FROM orders
),
layouts AS (
    SELECT 'linear_by_date' AS layout, day_idx, ck,
           day_idx // 16 AS file_id
    FROM keyed
    UNION ALL
    SELECT 'zorder' AS layout, day_idx, ck,
           {_z_interleave_sql("day_idx", "ck")} // {_Z_FILE_ROWS} AS file_id
    FROM keyed
),
day_files AS (
    SELECT layout, day_idx, COUNT(DISTINCT file_id) AS nf
    FROM layouts GROUP BY layout, day_idx
),
ck_files AS (
    SELECT layout, ck, COUNT(DISTINCT file_id) AS nf
    FROM layouts GROUP BY layout, ck
)
SELECT l.layout,
       CAST(COUNT(DISTINCT l.file_id) AS BIGINT) AS n_files,
       CAST((SELECT SUM(nf) * 1000 // COUNT(*) FROM day_files d
             WHERE d.layout = l.layout) AS BIGINT) AS files_per_day_milli,
       CAST((SELECT SUM(nf) * 1000 // COUNT(*) FROM ck_files c
             WHERE c.layout = l.layout) AS BIGINT) AS files_per_custbucket_milli
FROM layouts l
GROUP BY l.layout
"""


@register(
    "zorder_layout_audit",
    _ZORDER_SQL,
    doc="Multi-dimensional layout audit: the same orders fact under a "
    "date-linear file layout vs a Morton (Z-order) interleave of "
    "(day, custkey%4096), measuring the average number of files a "
    "single-day query and a single-customer-bucket query must touch. "
    "Date partitioning gives 1-ish file per day but every file per "
    "customer; Z-order balances both — the quantified case for "
    "OPTIMIZE ZORDER at 100 TB. The interleave is pure integer bit "
    "arithmetic (shiftleft/shiftright/AND), spelled natively on each "
    "engine, and every aggregate is map-side combinable.",
)
def q_zorder_layout_audit(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.select(
        F.datediff(
            F.col("o_orderdate"), F.lit(f"{_Z_EPOCH} 00:00:00").cast("timestamp")
        )
        .cast("long")
        .alias("day_idx"),
        (F.col("o_custkey") % 4096).alias("ck"),
    )
    linear = keyed.select(
        F.lit("linear_by_date").alias("layout"),
        "day_idx",
        "ck",
        F.expr("day_idx DIV 16").alias("file_id"),
    )
    zord = keyed.select(
        F.lit("zorder").alias("layout"),
        "day_idx",
        "ck",
        (
            _z_interleave_col(F.col("day_idx"), F.col("ck")) / _Z_FILE_ROWS
        )
        .cast("long")
        .alias("file_id"),
    )
    layouts = linear.unionByName(zord)
    day_files = layouts.groupBy("layout", "day_idx").agg(
        F.count_distinct("file_id").alias("nf")
    )
    ck_files = layouts.groupBy("layout", "ck").agg(
        F.count_distinct("file_id").alias("nf")
    )
    day_avg = day_files.groupBy("layout").agg(
        F.expr("SUM(nf) * 1000 DIV COUNT(*)").cast("long").alias("files_per_day_milli")
    )
    ck_avg = ck_files.groupBy("layout").agg(
        F.expr("SUM(nf) * 1000 DIV COUNT(*)")
        .cast("long")
        .alias("files_per_custbucket_milli")
    )
    totals = layouts.groupBy("layout").agg(
        F.count_distinct("file_id").cast("long").alias("n_files")
    )
    return (
        totals.join(day_avg, "layout")
        .join(ck_avg, "layout")
        .select("layout", "n_files", "files_per_day_milli", "files_per_custbucket_milli")
    )


# --------------------------------------------------------------------------
# Golden-record consolidation (MDM survivorship).
# --------------------------------------------------------------------------

#: Three deterministic "systems" feed duplicate customer records:
#: CRM (the base row, recency 1), WEB (custkey%8==0: fresher segment,
#: missing balance, recency 2), BILLING (custkey%5==0: fresher
#: balance, missing segment, recency 3). Survivorship = latest
#: NON-NULL value per attribute.
_GOLDEN_RECORDS_SQL = """
records AS (
    SELECT c_custkey AS entity_key, 1 AS recency, 'crm' AS sys,
           c_mktsegment AS segment,
           CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS acctbal_cents
    FROM customer
    UNION ALL
    SELECT c_custkey, 2, 'web',
           'UPGRADED', CAST(NULL AS BIGINT)
    FROM customer WHERE c_custkey % 8 = 0
    UNION ALL
    SELECT c_custkey, 3, 'billing',
           CAST(NULL AS VARCHAR),
           CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) + 500
    FROM customer WHERE c_custkey % 5 = 0
)
"""

_GOLDEN_SQL = f"""
WITH {_GOLDEN_RECORDS_SQL.strip()}
SELECT entity_key,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(COUNT(DISTINCT sys) AS BIGINT) AS n_sources,
       MAX(CASE WHEN segment IS NOT NULL
                THEN {{'r': recency, 'v': segment}} END).v AS segment,
       MAX(CASE WHEN acctbal_cents IS NOT NULL
                THEN {{'r': recency, 'v': acctbal_cents}} END).v AS acctbal_cents,
       CAST(MAX(recency) AS INTEGER) AS latest_recency
FROM records
GROUP BY entity_key
"""


@register(
    "golden_record_consolidation",
    _GOLDEN_SQL,
    doc="MDM golden-record survivorship: duplicate per-entity records "
    "from three systems (deterministic synthetic feeds with fresher-"
    "but-sparser attributes) consolidate to one row per entity by the "
    "LATEST NON-NULL value per attribute (struct-MAX argmax over a "
    "recency-keyed struct, null observations excluded per column "
    "independently) plus record/source provenance counts. One grouped "
    "aggregate on the entity key — consolidation at 100 TB is a "
    "single shuffle of (key, recency, attrs) rows, no window, no "
    "self-join.",
)
def q_golden_record_consolidation(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    cents = (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
    crm = cust.select(
        F.col("c_custkey").alias("entity_key"),
        F.lit(1).alias("recency"),
        F.lit("crm").alias("sys"),
        F.col("c_mktsegment").alias("segment"),
        cents.alias("acctbal_cents"),
    )
    web = cust.filter(F.col("c_custkey") % 8 == 0).select(
        F.col("c_custkey").alias("entity_key"),
        F.lit(2).alias("recency"),
        F.lit("web").alias("sys"),
        F.lit("UPGRADED").alias("segment"),
        F.lit(None).cast("long").alias("acctbal_cents"),
    )
    billing = cust.filter(F.col("c_custkey") % 5 == 0).select(
        F.col("c_custkey").alias("entity_key"),
        F.lit(3).alias("recency"),
        F.lit("billing").alias("sys"),
        F.lit(None).cast("string").alias("segment"),
        (cents + 500).alias("acctbal_cents"),
    )
    records = crm.unionByName(web).unionByName(billing)

    def latest_nonnull(col):
        return F.max(
            F.when(
                F.col(col).isNotNull(),
                F.struct(F.col("recency").alias("r"), F.col(col).alias("v")),
            )
        )["v"]

    return records.groupBy("entity_key").agg(
        F.count("*").cast("long").alias("n_records"),
        F.count_distinct("sys").cast("long").alias("n_sources"),
        latest_nonnull("segment").alias("segment"),
        latest_nonnull("acctbal_cents").alias("acctbal_cents"),
        F.max("recency").cast("int").alias("latest_recency"),
    )


# --------------------------------------------------------------------------
# Shuffle-partition advisor.
# --------------------------------------------------------------------------

_TARGET_PARTITION_BYTES = 128 * 1024 * 1024

#: Conservative per-type width model (bytes per value in a shuffle
#: row, uncompressed): fixed-width types by size, strings by measured
#: average length + 4-byte length header.
_ADVISOR_TABLES = ["orders", "lineitem", "customer", "events"]


def _width_exprs_sql(cols):
    parts = []
    for name, typ in cols:
        if typ in ("BIGINT", "DOUBLE", "TIMESTAMP"):
            parts.append("8")
        elif typ == "INTEGER":
            parts.append("4")
        else:  # VARCHAR
            parts.append(f"CAST(FLOOR(AVG(LENGTH({name}))) + 4 AS BIGINT)")
    return " + ".join(parts)


_SHUFFLE_ADVISOR_SQL = None  # built lazily below (needs table schemas)


def _build_shuffle_advisor_sql():
    # Widths come from the SHARED schema model, not a live probe: the
    # type list is the testdata contract (TESTDATA.md), so the oracle
    # text is deterministic.
    schemas = {
        "orders": [("o_orderkey", "BIGINT"), ("o_custkey", "BIGINT"),
                   ("o_orderstatus", "VARCHAR"), ("o_totalprice", "DOUBLE"),
                   ("o_orderdate", "TIMESTAMP"), ("o_orderpriority", "VARCHAR")],
        "lineitem": [("l_orderkey", "BIGINT"), ("l_partkey", "BIGINT"),
                     ("l_suppkey", "BIGINT"), ("l_linenumber", "INTEGER"),
                     ("l_quantity", "DOUBLE"), ("l_extendedprice", "DOUBLE"),
                     ("l_discount", "DOUBLE"), ("l_tax", "DOUBLE"),
                     ("l_returnflag", "VARCHAR"), ("l_linestatus", "VARCHAR"),
                     ("l_shipdate", "TIMESTAMP")],
        "customer": [("c_custkey", "BIGINT"), ("c_name", "VARCHAR"),
                     ("c_nationkey", "INTEGER"), ("c_acctbal", "DOUBLE"),
                     ("c_mktsegment", "VARCHAR")],
        "events": [("event_id", "BIGINT"), ("ts", "TIMESTAMP"),
                   ("user_id", "BIGINT"), ("event_type", "VARCHAR"),
                   ("value", "DOUBLE"), ("props", "VARCHAR")],
    }
    selects = []
    for t in _ADVISOR_TABLES:
        width = _width_exprs_sql(schemas[t])
        selects.append(f"""
SELECT '{t}' AS table_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST({width} AS BIGINT) AS est_row_bytes,
       CAST(COUNT(*) * ({width}) AS BIGINT) AS est_shuffle_bytes,
       CAST(GREATEST(COUNT(*) * ({width}) // {_TARGET_PARTITION_BYTES}, 1)
            AS BIGINT) AS recommended_partitions
FROM {t}""")
    return "\nUNION ALL\n".join(selects)


_SHUFFLE_ADVISOR_SQL = _build_shuffle_advisor_sql()


@register(
    "shuffle_partition_advisor",
    _SHUFFLE_ADVISOR_SQL,
    doc=f"Config advisor: per table, estimated uncompressed shuffle "
    "bytes from a typed width model (fixed-width types by size, "
    "strings by measured average length + header) and the "
    "spark.sql.shuffle.partitions value that keeps each partition "
    f"near {_TARGET_PARTITION_BYTES >> 20} MB — the sizing rule the "
    "task prompt's spill-aware guidance encodes, as a query. One "
    "map-combinable aggregate per table; at 100 TB this is how the "
    "session config stops being a guess.",
)
def q_shuffle_partition_advisor(spark, sf_dir):
    out = None
    for t in _ADVISOR_TABLES:
        df = load_table(spark, sf_dir, t)
        agg_cols = [F.count("*").cast("long").alias("n_rows")]
        width_expr = None
        for f_ in df.schema.fields:
            st = f_.dataType.simpleString()
            if st in ("bigint", "double", "timestamp", "timestamp_ntz", "date"):
                term = F.lit(8).cast("long")
            elif st == "int":
                term = F.lit(4).cast("long")
            else:
                term = (F.floor(F.avg(F.length(f_.name))) + 4).cast("long")
            width_expr = term if width_expr is None else width_expr + term
        one = df.agg(*agg_cols, width_expr.alias("est_row_bytes")).select(
            F.lit(t).alias("table_name"),
            "n_rows",
            F.col("est_row_bytes").cast("long").alias("est_row_bytes"),
            (F.col("n_rows") * F.col("est_row_bytes"))
            .cast("long")
            .alias("est_shuffle_bytes"),
            F.greatest(
                F.expr(f"(n_rows * est_row_bytes) DIV {_TARGET_PARTITION_BYTES}"),
                F.lit(1),
            )
            .cast("long")
            .alias("recommended_partitions"),
        )
        out = one if out is None else out.unionByName(one)
    return out


# --------------------------------------------------------------------------
# Zone-map (min/max data-skipping) pruning audit across storage layouts.
# --------------------------------------------------------------------------

_ZM_GROUP_ROWS = 1000
_ZM_LO = "1995-03-01"
_ZM_HI = "1995-03-31"

_ZONEMAP_SQL = f"""
WITH base AS (
    SELECT o_orderkey AS okey, CAST(o_orderdate AS DATE) AS odate FROM orders
),
n_tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
grouped AS (
    SELECT 'date_sorted' AS layout,
           CAST((ROW_NUMBER() OVER (ORDER BY odate, okey) - 1)
                // {_ZM_GROUP_ROWS} AS BIGINT) AS grp,
           odate
    FROM base
    UNION ALL
    SELECT 'key_clustered' AS layout,
           CAST((ROW_NUMBER() OVER (ORDER BY okey) - 1)
                // {_ZM_GROUP_ROWS} AS BIGINT) AS grp,
           odate
    FROM base
    UNION ALL
    SELECT 'hash_random' AS layout,
           CAST(({hash_bucket_sql("okey", "zonemap:", 1_000_000_000)})
                % (1 + (n - 1) // {_ZM_GROUP_ROWS}) AS BIGINT) AS grp,
           odate
    FROM base, n_tot
),
zones AS (
    SELECT layout, grp,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(odate) AS lo, MAX(odate) AS hi,
           CAST(SUM(CASE WHEN odate BETWEEN DATE '{_ZM_LO}' AND DATE '{_ZM_HI}'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_match
    FROM grouped GROUP BY layout, grp
)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       CAST(SUM(n_match) AS BIGINT) AS rows_matched,
       CAST(SUM(CASE WHEN hi >= DATE '{_ZM_LO}' AND lo <= DATE '{_ZM_HI}'
                     THEN 1 ELSE 0 END) AS BIGINT) AS groups_hit,
       CAST(SUM(CASE WHEN hi >= DATE '{_ZM_LO}' AND lo <= DATE '{_ZM_HI}'
                     THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
       CAST(SUM(CASE WHEN hi >= DATE '{_ZM_LO}' AND lo <= DATE '{_ZM_HI}'
                     THEN 0 ELSE 1 END) * 1000000
            // COUNT(*) AS BIGINT) AS prune_ratio_ppm,
       CAST(SUM(CASE WHEN hi >= DATE '{_ZM_LO}' AND lo <= DATE '{_ZM_HI}'
                     THEN n_rows ELSE 0 END) * 1000000
            // GREATEST(SUM(n_match), 1) AS BIGINT) AS amplification_ppm
FROM zones
GROUP BY layout
"""


@register(
    "zone_map_pruning_audit",
    _ZONEMAP_SQL,
    doc=f"Data-skipping effectiveness audit: simulate parquet row-group "
    f"zone maps ({_ZM_GROUP_ROWS}-row groups, min/max o_orderdate per "
    "group) under three physical layouts — date-sorted, key-clustered, "
    "and hash-random — and measure, for a one-month predicate, how "
    "many groups a min/max-pruning scan must read, the scan "
    "amplification vs true matches, and the prune ratio. The "
    "layout-advice twin of zorder_layout_audit: it quantifies WHY "
    "sorting on the filter column wins (sorted prunes ~all groups, "
    "hash prunes none). All three layouts derive in ONE fact pass "
    "(two range-partitionable row_number sorts + one md5 bucket), "
    "fanned out row-locally; zones reduce to |groups| rows before the "
    "final 3-row rollup. At 100 TB group ids come from the same "
    "range-partitioner boundaries the deciles pattern documents.",
)
def q_zone_map_pruning_audit(spark, sf_dir):
    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderdate").cast("date").alias("odate"),
    )
    n_tot = base.agg(F.count("*").cast("long").alias("n"))
    with_groups = base.crossJoin(F.broadcast(n_tot)).select(
        "odate",
        F.floor(
            (F.row_number().over(Window.orderBy("odate", "okey")) - 1)
            / _ZM_GROUP_ROWS
        ).cast("long").alias("g_date"),
        F.floor(
            (F.row_number().over(Window.orderBy("okey")) - 1) / _ZM_GROUP_ROWS
        ).cast("long").alias("g_key"),
        (
            hash_bucket(F.col("okey"), "zonemap:", mod=1_000_000_000)
            % (1 + F.floor((F.col("n") - 1) / _ZM_GROUP_ROWS))
        ).cast("long").alias("g_hash"),
    )
    grouped = with_groups.select(
        "odate",
        F.explode(
            F.array(
                F.struct(F.lit("date_sorted").alias("layout"), F.col("g_date").alias("grp")),
                F.struct(F.lit("key_clustered").alias("layout"), F.col("g_key").alias("grp")),
                F.struct(F.lit("hash_random").alias("layout"), F.col("g_hash").alias("grp")),
            )
        ).alias("lg"),
    ).select("odate", F.col("lg.layout").alias("layout"), F.col("lg.grp").alias("grp"))
    lo, hi = F.lit(_ZM_LO).cast("date"), F.lit(_ZM_HI).cast("date")
    zones = grouped.groupBy("layout", "grp").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min("odate").alias("lo"),
        F.max("odate").alias("hi"),
        F.sum(F.when((F.col("odate") >= lo) & (F.col("odate") <= hi), 1).otherwise(0))
        .cast("long")
        .alias("n_match"),
    )
    hit = (F.col("hi") >= lo) & (F.col("lo") <= hi)
    return zones.groupBy("layout").agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.sum("n_match").cast("long").alias("rows_matched"),
        F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("groups_hit"),
        F.sum(F.when(hit, F.col("n_rows")).otherwise(0)).cast("long").alias("rows_scanned"),
        F.expr(
            "CAST(SUM(CASE WHEN hi >= DATE '1995-03-01' AND lo <= DATE '1995-03-31' "
            "THEN 0 ELSE 1 END) * 1000000 DIV COUNT(*) AS BIGINT)"
        ).alias("prune_ratio_ppm"),
        F.expr(
            "CAST(SUM(CASE WHEN hi >= DATE '1995-03-01' AND lo <= DATE '1995-03-31' "
            "THEN n_rows ELSE 0 END) * 1000000 DIV GREATEST(SUM(n_match), 1) AS BIGINT)"
        ).alias("amplification_ppm"),
    )


# --------------------------------------------------------------------------
# Equi-depth histogram (CBO statistics construction).
# --------------------------------------------------------------------------

_HIST_BUCKETS = 16

_EQUIDEPTH_SQL = f"""
WITH vals AS (
    SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
           o_orderkey AS okey
    FROM orders
),
bucketed AS (
    SELECT cents,
           CAST(NTILE({_HIST_BUCKETS}) OVER (ORDER BY cents, okey) AS INTEGER) AS bucket
    FROM vals
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(cents) AS lo_cents,
       MAX(cents) AS hi_cents,
       CAST(COUNT(DISTINCT cents) AS BIGINT) AS n_distinct,
       CAST((MAX(cents) - MIN(cents)) * 1000000
            // GREATEST(COUNT(DISTINCT cents), 1) AS BIGINT) AS width_per_ndv_micro
FROM bucketed
GROUP BY bucket
"""


@register(
    "equidepth_histogram_stats",
    _EQUIDEPTH_SQL,
    doc=f"Equi-depth histogram construction over order value "
    f"({_HIST_BUCKETS} buckets): per bucket the row count, exact "
    "bounds, distinct-value count, and value-range-per-NDV — the "
    "statistics object a cost-based optimizer stores per column "
    "(ANALYZE ... COMPUTE STATISTICS FOR COLUMNS builds exactly this "
    "shape) and the input join_cardinality_estimate would consume for "
    "range predicates. NTILE over the (cents, orderkey) total order "
    "is deterministic on both engines. Scale: the global sort is the "
    "deciles pattern (range-partitionable, "
    "customer_value_deciles_scalable documents the boundary-merge "
    "variant); per-bucket stats are map-combinable.",
)
def q_equidepth_histogram_stats(spark, sf_dir):
    vals = load_table(spark, sf_dir, "orders").select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
        F.col("o_orderkey").alias("okey"),
    )
    bucketed = vals.select(
        "cents",
        F.ntile(_HIST_BUCKETS).over(Window.orderBy("cents", "okey")).cast("int").alias("bucket"),
    )
    return bucketed.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min("cents").alias("lo_cents"),
        F.max("cents").alias("hi_cents"),
        F.countDistinct("cents").cast("long").alias("n_distinct"),
        F.expr(
            "CAST((MAX(cents) - MIN(cents)) * 1000000 "
            "DIV GREATEST(COUNT(DISTINCT cents), 1) AS BIGINT)"
        ).alias("width_per_ndv_micro"),
    )


# --------------------------------------------------------------------------
# Incremental JOIN maintenance (delta-join algebra, both sides changing).
# --------------------------------------------------------------------------

_IJM_SPLIT = "1998-01-01"
_IJM_CUST_NEW_BUCKET = 9  # hash_bucket(custkey, mod 10) == 9 -> "new" customers

_IJM_SQL = f"""
WITH o_old AS (
    SELECT o_custkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
    FROM orders WHERE o_orderdate < TIMESTAMP '{_IJM_SPLIT} 00:00:00'
),
o_new AS (
    SELECT o_custkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
    FROM orders WHERE o_orderdate >= TIMESTAMP '{_IJM_SPLIT} 00:00:00'
),
c_old AS (
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE {hash_bucket_sql("c_custkey", "ijm:", 10)} <> {_IJM_CUST_NEW_BUCKET}
),
c_new AS (
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE {hash_bucket_sql("c_custkey", "ijm:", 10)} = {_IJM_CUST_NEW_BUCKET}
),
-- delta-join algebra: J = O_old><C_old  U  dO><C_old  U  O_old><dC  U  dO><dC
j1 AS (SELECT c.c_mktsegment, o.cents FROM o_old o JOIN c_old c ON c.c_custkey = o.o_custkey),
j2 AS (SELECT c.c_mktsegment, o.cents FROM o_new o JOIN c_old c ON c.c_custkey = o.o_custkey),
j3 AS (SELECT c.c_mktsegment, o.cents FROM o_old o JOIN c_new c ON c.c_custkey = o.o_custkey),
j4 AS (SELECT c.c_mktsegment, o.cents FROM o_new o JOIN c_new c ON c.c_custkey = o.o_custkey),
unioned AS (
    SELECT * FROM j1 UNION ALL SELECT * FROM j2
    UNION ALL SELECT * FROM j3 UNION ALL SELECT * FROM j4
)
SELECT c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM unioned GROUP BY c_mktsegment
"""


@register(
    "incremental_join_maintenance",
    _IJM_SQL,
    doc="Incremental JOIN view maintenance with BOTH sides changing: "
    "the maintained join is the delta algebra J_old ∪ (ΔO⋈C_old) ∪ "
    "(O_old⋈ΔC) ∪ (ΔO⋈ΔC) — the three delta terms are what a refresh "
    "actually computes, and the identity says their union with the "
    "stale join IS the fresh join. The base term is genuinely "
    "MATERIALIZED to parquet and read back (not re-derived), so the "
    "plan proves stale-state + deltas reproduce the full recompute "
    "(the oracle) bit-for-bit on segment revenue. Extends "
    "incremental_agg_maintenance (one-sided, agg-only) to two-sided "
    "join maintenance. Scale: each delta term joins a DELTA against a "
    "static side — at 100 TB that is the whole point: refresh cost "
    "~|Δ|, never |O⋈C|.",
)
def q_incremental_join_maintenance(spark, sf_dir):
    from ecom_churn_lakehouse_spark.scratch import scratch_dir

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").alias("d"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    bucket = hash_bucket(F.col("c_custkey"), "ijm:", mod=10)
    split = F.lit(_IJM_SPLIT).cast("timestamp")
    o_old = orders.filter(F.col("d") < split).select("o_custkey", "cents")
    o_new = orders.filter(F.col("d") >= split).select("o_custkey", "cents")
    c_old = cust.filter(bucket != _IJM_CUST_NEW_BUCKET)
    c_new = cust.filter(bucket == _IJM_CUST_NEW_BUCKET)

    def seg_join(o, c):
        return o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
            "c_mktsegment", "cents"
        )

    # Materialize the stale base join, then maintain it with deltas.
    base_path = scratch_dir(prefix="ijm_base_") + "/base"
    seg_join(o_old, c_old).write.mode("overwrite").parquet(base_path)
    stale = spark.read.parquet(base_path)
    maintained = (
        stale.unionByName(seg_join(o_new, c_old))
        .unionByName(seg_join(o_old, c_new))
        .unionByName(seg_join(o_new, c_new))
    )
    return maintained.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )


# ------------------------------------------------ file compaction plan

_COMPACT_SQL = """
WITH files AS (
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(o_orderkey % 8 AS BIGINT) AS file_id,
           CAST(COUNT(*) * 96 + SUM(length(o_orderpriority)) AS BIGINT) AS bytes
    FROM orders
    GROUP BY 1, 2
),
target AS (
    SELECT CAST((4 * SUM(bytes)) // COUNT(*) AS BIGINT) AS target_bytes
    FROM files
),
planned AS (
    SELECT f.month, f.file_id, f.bytes, t.target_bytes,
           CAST(COALESCE(SUM(f.bytes) OVER (
                    PARTITION BY f.month ORDER BY f.file_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                // t.target_bytes AS BIGINT) AS bin_id
    FROM files f, target t
)
SELECT month, bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
       CAST(MAX(target_bytes) AS BIGINT) AS target_bytes
FROM planned
GROUP BY month, bin_id
ORDER BY month, bin_id
"""


@register(
    "file_compaction_plan",
    _COMPACT_SQL,
    doc="Small-file compaction planning (the OPTIMIZE/bin-packing "
    "step every lakehouse table needs): the simulated file listing "
    "(one file per month x 8-way key bucket, bytes from row-size "
    "estimates) is coalesced per partition into compaction groups by "
    "a deterministic sequential first-fit — running byte cumsum "
    "integer-divided by the target size. The target is MEAN-RELATIVE "
    "(4x the average file size, exact integer DIV) so the plan stays "
    "non-vacuous at every scale factor instead of pinning a byte "
    "constant that goes degenerate at 10x. Output: per compaction "
    "group, its file count and byte total — files_before/after and "
    "the write amplification fall straight out. Scale: one "
    "map-combinable agg to the file-listing grain (tiny by "
    "construction), windows partitioned per month; the fact table is "
    "touched once. Complements partition_layout_advisor (pre-write "
    "key choice) with the post-write maintenance decision.",
)
def q_file_compaction_plan(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    files = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        (F.col("o_orderkey") % 8).cast("long").alias("file_id"),
    ).agg(
        (F.count("*") * 96 + F.sum(F.length("o_orderpriority")))
        .cast("long")
        .alias("bytes")
    )
    target = files.agg(
        F.expr("CAST((4 * SUM(bytes)) DIV COUNT(*) AS BIGINT)").alias(
            "target_bytes"
        )
    )
    w = (
        Window.partitionBy("month")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = (
        files.crossJoin(F.broadcast(target))
        .select(
            "month",
            "file_id",
            "bytes",
            "target_bytes",
            F.coalesce(F.sum("bytes").over(w), F.lit(0)).alias("cum_prev"),
        )
        .select(
            "month",
            "bytes",
            "target_bytes",
            F.expr("CAST(cum_prev DIV target_bytes AS BIGINT)").alias("bin_id"),
        )
    )
    return (
        planned.groupBy("month", "bin_id")
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum("bytes").cast("long").alias("bin_bytes"),
            F.max("target_bytes").cast("long").alias("target_bytes"),
        )
        .orderBy("month", "bin_id")
    )


# ----------------------------------------------------- sort-key advisor

_SKA_GROUP_ROWS = 1000

#: Reference workload: one selective predicate per candidate column.
_SKA_PREDS = {
    "date_range": ("odate", "DATE '1995-03-01'", "DATE '1995-03-31'"),
    "key_range": ("okey", "1000", "4000"),
    "price_range": ("cents", "30000000", "35000000"),
}

_SKA_SQL = f"""
WITH base AS (
    SELECT o_orderkey AS okey, CAST(o_orderdate AS DATE) AS odate,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
    FROM orders
),
layouts AS (
    SELECT 'sort_date' AS sort_key,
           CAST((ROW_NUMBER() OVER (ORDER BY odate, okey) - 1)
                // {_SKA_GROUP_ROWS} AS BIGINT) AS grp,
           okey, odate, cents
    FROM base
    UNION ALL
    SELECT 'sort_key',
           CAST((ROW_NUMBER() OVER (ORDER BY okey) - 1)
                // {_SKA_GROUP_ROWS} AS BIGINT), okey, odate, cents
    FROM base
    UNION ALL
    SELECT 'sort_price',
           CAST((ROW_NUMBER() OVER (ORDER BY cents, okey) - 1)
                // {_SKA_GROUP_ROWS} AS BIGINT), okey, odate, cents
    FROM base
),
zones AS (
    SELECT sort_key, grp,
           MIN(odate) AS lo_d, MAX(odate) AS hi_d,
           MIN(okey) AS lo_k, MAX(okey) AS hi_k,
           MIN(cents) AS lo_c, MAX(cents) AS hi_c
    FROM layouts GROUP BY sort_key, grp
),
hits AS (
    SELECT sort_key, 'date_range' AS predicate,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN hi_d >= DATE '1995-03-01'
                          AND lo_d <= DATE '1995-03-31'
                         THEN 1 ELSE 0 END) AS BIGINT) AS groups_hit
    FROM zones GROUP BY sort_key
    UNION ALL
    SELECT sort_key, 'key_range', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN hi_k >= 1000 AND lo_k <= 4000
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM zones GROUP BY sort_key
    UNION ALL
    SELECT sort_key, 'price_range', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN hi_c >= 30000000 AND lo_c <= 35000000
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM zones GROUP BY sort_key
)
SELECT sort_key, predicate, n_groups, groups_hit,
       CAST((n_groups - groups_hit) * 1000000 // n_groups AS BIGINT)
           AS prune_ppm
FROM hits ORDER BY sort_key, predicate
"""


@register(
    "sort_key_advisor",
    _SKA_SQL,
    doc="Sort-key selection advisor: simulate row-group zone maps "
    "under each CANDIDATE sort order (date / key / price) and score "
    "every candidate against a three-predicate reference workload — "
    "the decision zone_map_pruning_audit (one predicate, fixed "
    "layouts) leaves open: which column should the table actually "
    "be sorted on, given the whole workload? Each candidate prunes "
    "its own column near-perfectly and the others barely — the "
    "advisor output makes the trade-off a table instead of a "
    "belief. One fact pass per layout (range-partitionable sorts), "
    "zones reduce to |groups| rows, all ratios exact ppm. At 100 "
    "TB the same relation computes from parquet footer min/max "
    "stats without touching data at all (S3 LIST + footers).",
)
def q_sort_key_advisor(spark, sf_dir):
    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderdate").cast("date").alias("odate"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    layouts = None
    for name, order in (
        ("sort_date", [F.col("odate"), F.col("okey")]),
        ("sort_key", [F.col("okey")]),
        ("sort_price", [F.col("cents"), F.col("okey")]),
    ):
        lay = base.select(
            F.lit(name).alias("sort_key"),
            F.floor(
                (F.row_number().over(Window.orderBy(*order)) - 1) / _SKA_GROUP_ROWS
            )
            .cast("long")
            .alias("grp"),
            "okey",
            "odate",
            "cents",
        )
        layouts = lay if layouts is None else layouts.unionByName(lay)
    zones = layouts.groupBy("sort_key", "grp").agg(
        F.min("odate").alias("lo_d"),
        F.max("odate").alias("hi_d"),
        F.min("okey").alias("lo_k"),
        F.max("okey").alias("hi_k"),
        F.min("cents").alias("lo_c"),
        F.max("cents").alias("hi_c"),
    ).localCheckpoint(eager=False)
    preds = [
        (
            "date_range",
            (F.col("hi_d") >= F.lit("1995-03-01").cast("date"))
            & (F.col("lo_d") <= F.lit("1995-03-31").cast("date")),
        ),
        ("key_range", (F.col("hi_k") >= 1000) & (F.col("lo_k") <= 4000)),
        (
            "price_range",
            (F.col("hi_c") >= 30000000) & (F.col("lo_c") <= 35000000),
        ),
    ]
    hits = None
    for pname, cond in preds:
        h = zones.groupBy("sort_key").agg(
            F.count("*").cast("long").alias("n_groups"),
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias("groups_hit"),
        ).select("sort_key", F.lit(pname).alias("predicate"), "n_groups", "groups_hit")
        hits = h if hits is None else hits.unionByName(h)
    return hits.select(
        "sort_key",
        "predicate",
        "n_groups",
        "groups_hit",
        F.expr(
            "CAST((n_groups - groups_hit) * 1000000 DIV n_groups AS BIGINT)"
        ).alias("prune_ppm"),
    ).orderBy("sort_key", "predicate")


# ------------------------------------------- two-pass exact percentile

_TPP_BIN_CENTS = 1_000_000  # $10k coarse bins
_TPP_LEVELS = ((50, "p50_cents"), (95, "p95_cents"), (99, "p99_cents"))


def _tpp_sql() -> str:
    pct_cols = []
    for lvl, name in _TPP_LEVELS:
        pct_cols.append(
            f"(SELECT CAST(MIN(cents) AS BIGINT) FROM ranked r, tot t\n"
            f"  WHERE r.below + r.cnt >= (t.n * {lvl} + 99) // 100) AS {name}"
        )
    return f"""
WITH base AS (
    SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
    FROM orders
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
-- pass 1: coarse histogram (bin width ${_TPP_BIN_CENTS // 100})
bins AS (
    SELECT cents // {_TPP_BIN_CENTS} AS bin, CAST(COUNT(*) AS BIGINT) AS c
    FROM base GROUP BY cents // {_TPP_BIN_CENTS}
),
bin_cum AS (
    SELECT bin, c,
           CAST(SUM(c) OVER (ORDER BY bin) - c AS BIGINT) AS below_bin
    FROM bins
),
-- pass 2: exact value-grain counts WITHIN candidate bins only
cand_bins AS (
    SELECT DISTINCT b.bin, b.below_bin FROM bin_cum b, tot t
    WHERE EXISTS (
        SELECT 1 FROM (VALUES {", ".join(f"({lvl})" for lvl, _ in _TPP_LEVELS)})
            AS ls(lvl)
        WHERE (t.n * ls.lvl + 99) // 100 > b.below_bin
          AND (t.n * ls.lvl + 99) // 100 <= b.below_bin + b.c
    )
),
ranked AS (
    SELECT v.cents,
           CAST(cb.below_bin + SUM(v.cnt) OVER (
               PARTITION BY v.bin ORDER BY v.cents) - v.cnt AS BIGINT) AS below,
           v.cnt
    FROM (
        SELECT cents // {_TPP_BIN_CENTS} AS bin, cents,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM base
        WHERE cents // {_TPP_BIN_CENTS} IN (SELECT bin FROM cand_bins)
        GROUP BY cents // {_TPP_BIN_CENTS}, cents
    ) v JOIN cand_bins cb ON cb.bin = v.bin
)
SELECT (SELECT n FROM tot) AS n,
       CAST((SELECT COUNT(*) FROM cand_bins) AS BIGINT) AS bins_scanned_pass2,
       {", ".join(pct_cols)}
"""


@register(
    "two_pass_exact_percentile",
    _tpp_sql(),
    doc="EXACT p50/p95/p99 of order value without a global sort: "
    "pass 1 builds a coarse value histogram (map-combinable), the "
    "driver-side rank arithmetic identifies which bin holds each "
    "target rank, pass 2 re-scans ONLY those bins at the exact "
    "value grain and picks the order statistic by cumulative count "
    "— the standard way an exact extreme percentile is computed "
    "over 100 TB (two pushdown-filtered scans and two small "
    "shuffles beat one full sort by orders of magnitude; "
    "percentile_disc's ObjectHashAggregate buffers the whole "
    "column). The nth-rank convention is ceil(n*p/100) — matching "
    "percentile_disc, asserted in tests. bins_scanned_pass2 is the "
    "efficiency witness (3 targets -> <= 3 bins of the ~100-bin "
    "histogram).",
)
def q_two_pass_exact_percentile(spark, sf_dir):
    base = load_table(spark, sf_dir, "orders").select(
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        )
    ).localCheckpoint(eager=False)
    tot = base.agg(F.count("*").cast("long").alias("n"))
    bins = base.groupBy(
        (F.col("cents") / _TPP_BIN_CENTS).cast("long").alias("bin")
    ).agg(F.count("*").cast("long").alias("c"))
    w = Window.orderBy("bin")
    bin_cum = bins.select(
        "bin", "c", (F.sum("c").over(w) - F.col("c")).cast("long").alias("below_bin")
    )
    lvls = F.explode(
        F.array(*[F.lit(lvl).cast("long") for lvl, _ in _TPP_LEVELS])
    ).alias("lvl")
    cand_bins = (
        bin_cum.crossJoin(F.broadcast(tot))
        .select("bin", "below_bin", "c", "n", lvls)
        .filter(
            (F.expr("(n * lvl + 99) DIV 100") > F.col("below_bin"))
            & (F.expr("(n * lvl + 99) DIV 100") <= F.col("below_bin") + F.col("c"))
        )
        .select("bin", "below_bin")
        .distinct()
    )
    vals = (
        base.withColumn("bin", (F.col("cents") / _TPP_BIN_CENTS).cast("long"))
        .join(F.broadcast(cand_bins), "bin")
        .groupBy("bin", "below_bin", "cents")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    w2 = Window.partitionBy("bin").orderBy("cents")
    ranked = vals.select(
        "cents",
        (F.col("below_bin") + F.sum("cnt").over(w2) - F.col("cnt"))
        .cast("long")
        .alias("below"),
        "cnt",
    ).localCheckpoint(eager=False)
    out_cols = [F.col("n")]
    n_cand = cand_bins.agg(
        F.count("*").cast("long").alias("bins_scanned_pass2")
    )
    res = tot.crossJoin(F.broadcast(n_cand))
    for lvl, name in _TPP_LEVELS:
        pick = (
            ranked.crossJoin(F.broadcast(tot.select(F.col("n").alias("nn"))))
            .filter(
                F.col("below") + F.col("cnt")
                >= F.expr(f"(nn * {lvl} + 99) DIV 100")
            )
            .agg(F.min("cents").cast("long").alias(name))
        )
        res = res.crossJoin(F.broadcast(pick))
    return res.select(
        "n", "bins_scanned_pass2", *[name for _, name in _TPP_LEVELS]
    )


# ------------------------------------------- capture-recapture estimate

_CR_RATE = 1500  # permyriad: two independent 15% samples


def _cr_sql() -> str:
    h1 = hash_bucket_sql("o_custkey", "cap1:", 10000)
    h2 = hash_bucket_sql("o_custkey", "cap2:", 10000)
    return f"""
WITH buyers AS (SELECT DISTINCT o_custkey FROM orders),
marked AS (
    SELECT o_custkey,
           CASE WHEN {h1} < {_CR_RATE} THEN 1 ELSE 0 END AS s1,
           CASE WHEN {h2} < {_CR_RATE} THEN 1 ELSE 0 END AS s2
    FROM buyers
),
comp AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_true,
           CAST(SUM(s1) AS BIGINT) AS n1,
           CAST(SUM(s2) AS BIGINT) AS n2,
           CAST(SUM(s1 * s2) AS BIGINT) AS m
    FROM marked
)
SELECT n_true, n1, n2, m,
       CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS BIGINT) AS chapman_estimate,
       CAST(abs((n1 + 1) * (n2 + 1) // (m + 1) - 1 - n_true) * 1000000
            // n_true AS BIGINT) AS abs_err_ppm
FROM comp
"""


@register(
    "capture_recapture_estimate",
    _cr_sql(),
    doc="Capture-recapture population estimation (Chapman's "
    "bias-corrected Lincoln-Petersen): two INDEPENDENT deterministic "
    "15% samples of distinct buyers, the overlap m, and the "
    "estimate (n1+1)(n2+1)/(m+1)-1 next to the true count — the "
    "survey-statistics answer to 'how many distinct entities exist' "
    "when only samples are affordable, complementing the KMV sketch "
    "(which needs a full pass) with a two-sample design that needs "
    "none. Pure integer arithmetic end to end (the estimator "
    "itself is an integer floor); the two marks are scan-local "
    "salted hashes, so the oracle reproduces the overlap exactly. "
    "Scale: one distinct + one fused agg; nothing else.",
)
def q_capture_recapture_estimate(spark, sf_dir):
    buyers = load_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    marked = buyers.select(
        F.when(hash_bucket(F.col("o_custkey"), "cap1:") < _CR_RATE, 1)
        .otherwise(0)
        .alias("s1"),
        F.when(hash_bucket(F.col("o_custkey"), "cap2:") < _CR_RATE, 1)
        .otherwise(0)
        .alias("s2"),
    )
    comp = marked.agg(
        F.count("*").cast("long").alias("n_true"),
        F.sum("s1").cast("long").alias("n1"),
        F.sum("s2").cast("long").alias("n2"),
        F.sum(F.col("s1") * F.col("s2")).cast("long").alias("m"),
    )
    return comp.select(
        "n_true",
        "n1",
        "n2",
        "m",
        F.expr("CAST((n1 + 1) * (n2 + 1) DIV (m + 1) - 1 AS BIGINT)").alias(
            "chapman_estimate"
        ),
        F.expr(
            "CAST(abs((n1 + 1) * (n2 + 1) DIV (m + 1) - 1 - n_true) * 1000000"
            " DIV n_true AS BIGINT)"
        ).alias("abs_err_ppm"),
    )


# --------------------------------------------------------------------------
# Bloom-filter sizing advisor for runtime-filter / semi-join pushdown keys.
# --------------------------------------------------------------------------

#: m = ceil(n * -ln(p)/ln(2)^2), k = round(m/n * ln 2) — the ln
#: constants are AUTHORING-TIME micro literals (stdlib math at write
#: time), so the whole advisor is exact integer arithmetic: zero
#: runtime transcendentals (the SPRT/Holm discipline).
_BLOOM_FPP_MICRO = (("fpp_1pct", 9_585_058), ("fpp_0p1pct", 14_377_588))
_LN2_MICRO = 693_147

_BLOOM_KEYS = (
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
    ("orders", "o_custkey"),
    ("events", "user_id"),
)


def _bloom_sql() -> str:
    branches = []
    for tbl, col in _BLOOM_KEYS:
        branches.append(
            f"SELECT '{tbl}.{col}' AS key_col,"
            f" CAST(COUNT(DISTINCT {col}) AS BIGINT) AS ndv FROM {tbl}"
        )
    fpp_rows = ", ".join(
        f"('{name}', CAST({c} AS BIGINT))" for name, c in _BLOOM_FPP_MICRO
    )
    return f"""
WITH ndvs AS (
    {" UNION ALL ".join(branches)}
),
targets AS (
    SELECT * FROM (VALUES {fpp_rows}) AS t(fpp, c_micro)
),
sized AS (
    SELECT n.key_col, n.ndv, t.fpp,
           CAST((n.ndv * t.c_micro + 999999) // 1000000 AS BIGINT) AS m_bits
    FROM ndvs n CROSS JOIN targets t
)
SELECT key_col, ndv, fpp, m_bits,
       CAST((m_bits + 7) // 8 AS BIGINT) AS m_bytes,
       CAST((m_bits * {_LN2_MICRO} + ndv * 500000) // (ndv * 1000000)
            AS BIGINT) AS k_hashes
FROM sized
ORDER BY key_col, fpp
"""


@register(
    "bloom_filter_size_advisor",
    _bloom_sql(),
    doc="Bloom-filter sizing advisor for the join keys a runtime "
    "filter / semi-join pushdown would build filters over (the "
    "spark.sql.optimizer bloom conf this engine enables in "
    "session.py): per key column the exact NDV, and for two target "
    "false-positive rates the required bits m = ceil(-n ln p / "
    "ln^2 2) and optimal hash count k = round(m/n ln 2) — with the "
    "ln constants embedded as authoring-time micro literals, so "
    "sizing is EXACT integer arithmetic end-to-end (zero runtime "
    "transcendentals; rounds half-up via the +n*500000 trick on "
    "non-negative operands). Completes the physical-design advisor "
    "family (sort_key_advisor, partition_layout_advisor, "
    "column_encoding_advisor). Scale: one COUNT(DISTINCT) per "
    "candidate key — map-combinable partial distincts; the advisor "
    "frame is |keys| x |targets| rows.",
)
def q_bloom_filter_size_advisor(spark, sf_dir):
    ndv_frames = []
    for tbl, col in _BLOOM_KEYS:
        ndv_frames.append(
            load_table(spark, sf_dir, tbl).agg(
                F.lit(f"{tbl}.{col}").alias("key_col"),
                F.countDistinct(col).cast("long").alias("ndv"),
            )
        )
    ndvs = ndv_frames[0]
    for f in ndv_frames[1:]:
        ndvs = ndvs.unionByName(f)
    targets = None
    for name, c in _BLOOM_FPP_MICRO:
        row = ndvs.sparkSession.range(1).select(
            F.lit(name).alias("fpp"), F.lit(c).cast("long").alias("c_micro")
        )
        targets = row if targets is None else targets.unionByName(row)
    sized = ndvs.crossJoin(F.broadcast(targets)).select(
        "key_col",
        "ndv",
        "fpp",
        F.expr("CAST((ndv * c_micro + 999999) DIV 1000000 AS BIGINT)").alias(
            "m_bits"
        ),
    )
    return sized.select(
        "key_col",
        "ndv",
        "fpp",
        "m_bits",
        F.expr("CAST((m_bits + 7) DIV 8 AS BIGINT)").alias("m_bytes"),
        F.expr(
            f"CAST((m_bits * {_LN2_MICRO} + ndv * 500000)"
            " DIV (ndv * 1000000) AS BIGINT)"
        ).alias("k_hashes"),
    ).orderBy("key_col", "fpp")


# --------------------------------------------------------------------------
# Round 9: join-strategy advisor over exact table stats.
# --------------------------------------------------------------------------

#: Documented fixed per-type width model (bytes per value in a shuffled
#: row; the SAME constants on both engines make the estimate exact):
#: BIGINT/DOUBLE 8, INT 4, DATE 4, and strings length+4. The advisor's
#: point is the DECISION LOGIC (which side broadcasts, how many shuffle
#: partitions), not byte-perfect sizing — Spark's own
#: autoBroadcastJoinThreshold consumes estimates of exactly this kind.
_ADVISOR_BROADCAST_BYTES = 10 * 1024 * 1024  # Spark's default 10m
_ADVISOR_TARGET_PARTITION_BYTES = 64 * 1024 * 1024

_JOIN_ADVISOR_SQL = f"""
WITH stats AS (
    SELECT 'customer' AS tbl,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(8 + (length(c_name) + 4) + 8 + 4
                    + (length(c_mktsegment) + 4)) AS BIGINT) AS est_bytes
    FROM customer
    UNION ALL
    SELECT 'orders', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(8 + 8 + (length(o_orderstatus) + 4) + 8 + 4
                    + (length(o_orderpriority) + 4)) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(8 + 8 + 8 + 8 + 8 + 4 + 4) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'part', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(8 + (length(p_name) + 4) + (length(p_brand) + 4)
                    + (length(p_type) + 4) + 8) AS BIGINT)
    FROM part
    UNION ALL
    SELECT 'nation', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(4 + (length(n_name) + 4) + 4) AS BIGINT)
    FROM nation
),
joins AS (
    SELECT * FROM (VALUES
        ('lineitem', 'orders'), ('lineitem', 'part'),
        ('orders', 'customer'), ('customer', 'nation')
    ) AS j(big_tbl, dim_tbl)
)
SELECT j.big_tbl, j.dim_tbl,
       b.n_rows AS big_rows, d.n_rows AS dim_rows,
       b.est_bytes AS big_bytes, d.est_bytes AS dim_bytes,
       CASE WHEN d.est_bytes <= {_ADVISOR_BROADCAST_BYTES}
            THEN 'broadcast_dim' ELSE 'sort_merge' END AS strategy,
       CAST((b.est_bytes + {_ADVISOR_TARGET_PARTITION_BYTES} - 1)
            // {_ADVISOR_TARGET_PARTITION_BYTES} AS BIGINT)
           AS shuffle_partitions
FROM joins j
JOIN stats b ON b.tbl = j.big_tbl
JOIN stats d ON d.tbl = j.dim_tbl
ORDER BY j.big_tbl, j.dim_tbl
"""


@register(
    "join_strategy_advisor",
    _JOIN_ADVISOR_SQL,
    doc="Join-strategy advisor over EXACT table stats: for the "
    "engine's canonical fact-dim joins, exact row counts and a "
    "fixed-width byte model (documented constants, so the estimate "
    "is an exact integer on both engines) decide broadcast-dim vs "
    "sort-merge against Spark's 10 MiB autoBroadcastJoinThreshold "
    "default, plus the shuffle-partition count that lands the big "
    "side at ~64 MiB per partition — the two decisions every Spark "
    "job tunes first, derivable from one stats pass (joins the "
    "advisor family: partition_layout_advisor, bloom_filter_size_"
    "advisor, column_encoding_advisor, zone_map_pruning_audit). "
    "Scale: per-table scan-local aggregates; the advisor frame is "
    "4 rows.",
)
def q_join_strategy_advisor(spark, sf_dir):
    def stats(tbl, expr):
        return load_table(spark, sf_dir, tbl).agg(
            F.lit(tbl).alias("tbl"),
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.expr(expr)).cast("long").alias("est_bytes"),
        )

    stats_df = (
        stats("customer", "8 + (length(c_name) + 4) + 8 + 4 + (length(c_mktsegment) + 4)")
        .unionByName(stats("orders", "8 + 8 + (length(o_orderstatus) + 4) + 8 + 4 + (length(o_orderpriority) + 4)"))
        .unionByName(stats("lineitem", "8 + 8 + 8 + 8 + 8 + 4 + 4"))
        .unionByName(stats("part", "8 + (length(p_name) + 4) + (length(p_brand) + 4) + (length(p_type) + 4) + 8"))
        .unionByName(stats("nation", "4 + (length(n_name) + 4) + 4"))
    )
    joins = spark.createDataFrame(
        [
            ("lineitem", "orders"),
            ("lineitem", "part"),
            ("orders", "customer"),
            ("customer", "nation"),
        ],
        "big_tbl string, dim_tbl string",
    )
    b = stats_df.select(
        F.col("tbl").alias("big_tbl"),
        F.col("n_rows").alias("big_rows"),
        F.col("est_bytes").alias("big_bytes"),
    )
    d = stats_df.select(
        F.col("tbl").alias("dim_tbl"),
        F.col("n_rows").alias("dim_rows"),
        F.col("est_bytes").alias("dim_bytes"),
    )
    return (
        joins.join(F.broadcast(b), "big_tbl")
        .join(F.broadcast(d), "dim_tbl")
        .select(
            "big_tbl",
            "dim_tbl",
            "big_rows",
            "dim_rows",
            "big_bytes",
            "dim_bytes",
            F.when(
                F.col("dim_bytes") <= _ADVISOR_BROADCAST_BYTES,
                "broadcast_dim",
            )
            .otherwise("sort_merge")
            .alias("strategy"),
            F.expr(
                f"(big_bytes + {_ADVISOR_TARGET_PARTITION_BYTES} - 1)"
                f" DIV {_ADVISOR_TARGET_PARTITION_BYTES}"
            )
            .cast("long")
            .alias("shuffle_partitions"),
        )
        .orderBy("big_tbl", "dim_tbl")
    )


# --------------------------------------------------------------------------
# Round 9: approx_percentile rank-error audit (tolerance-boolean).
# --------------------------------------------------------------------------

_APPROX_PCT_ACCURACY = 1000  # Spark guarantee: rank error <= N/accuracy

#: quantile parameters must be CONSTANTS in DuckDB — unroll the probe
#: list (standing oracle-authoring gotcha).
_APPROX_PCT_SQL = """
WITH cents AS (
    SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
    FROM orders
),
agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(quantile_disc(x, 0.5) AS BIGINT) AS e500,
           CAST(quantile_disc(x, 0.9) AS BIGINT) AS e900,
           CAST(quantile_disc(x, 0.99) AS BIGINT) AS e990
    FROM cents
)
SELECT 500::BIGINT AS p_milli, e500 AS exact_value_cents, n_rows,
       TRUE AS approx_within_rank_bound FROM agg
UNION ALL
SELECT 900::BIGINT, e900, n_rows, TRUE FROM agg
UNION ALL
SELECT 990::BIGINT, e990, n_rows, TRUE FROM agg
ORDER BY p_milli
"""


@register(
    "approx_percentile_error_audit",
    _APPROX_PCT_SQL,
    doc="Audits Spark's approx_percentile sketch against its OWN "
    "documented guarantee (rank error <= N/accuracy at accuracy="
    f"{_APPROX_PCT_ACCURACY}): for p50/p90/p99 of order value, the "
    "exact percentile (percentile_disc — hash-compared against the "
    "oracle) rides next to a tolerance BOOLEAN that Spark computes "
    "by ranking its approx answer back into the data (rank(approx) "
    "within N/accuracy of ceil(p*N)); the oracle emits the boolean's "
    "REQUIRED value (true), so any guarantee violation "
    "hash-mismatches — the sketch-profile gating pattern "
    "(kmv_distinct_curve) applied to the engine's built-in quantile "
    "sketch. This is the scale path two_pass_exact_percentile "
    "documents: at 100 TB you serve approx_percentile and audit it "
    "like this. Scale: one agg for the sketch + one for the exact "
    "rank join-back; 3-row output.",
)
def q_approx_percentile_error_audit(spark, sf_dir):
    cents = load_table(spark, sf_dir, "orders").select(
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("x")
    ).localCheckpoint(eager=False)
    probes = [(500, 0.5), (900, 0.9), (990, 0.99)]
    approx = cents.agg(
        F.count("*").cast("long").alias("n_rows"),
        *[
            F.expr(
                f"approx_percentile(x, {p}D, {_APPROX_PCT_ACCURACY})"
            ).alias(f"a{m}")
            for m, p in probes
        ],
        *[
            F.expr(
                f"percentile_disc({p}) WITHIN GROUP (ORDER BY x)"
            )
            .cast("long")
            .alias(f"e{m}")
            for m, p in probes
        ],
    )
    # rank the approx answers back into the data: rank(v) = #{x <= v}
    ranked = cents.crossJoin(F.broadcast(approx)).agg(
        *[
            F.sum(F.when(F.col("x") <= F.col(f"a{m}"), 1).otherwise(0))
            .cast("long")
            .alias(f"r{m}")
            for m, _ in probes
        ]
    )
    rows = []
    for m, p in probes:
        rows.append(
            f"SELECT {m}L AS p_milli, e{m} AS exact_value_cents, n_rows,"
            # rank error vs target rank ceil(p*N), against the
            # documented bound N/accuracy (exact integer arithmetic)
            f" abs(r{m} - CAST(ceil(n_rows * {m} / 1000.0) AS BIGINT))"
            f" <= n_rows DIV {_APPROX_PCT_ACCURACY} + 1"
            " AS approx_within_rank_bound"
        )
    joined = approx.crossJoin(F.broadcast(ranked))
    joined.createOrReplaceTempView("__approx_pct_audit")
    return spark.sql(
        " UNION ALL ".join(
            r + " FROM __approx_pct_audit" for r in rows
        )
        + " ORDER BY p_milli"
    )


# ---------------------------------------------------------------------------
# Round 9 fourth wave: consistent-hash resharding audit.
# ---------------------------------------------------------------------------

_CH_RING_MOD = 1 << 40  # ring positions in [0, 2^40)
_CH_VNODES = 16         # virtual nodes per shard
_CH_N_OLD = 8
_CH_N_NEW = 9


def _ch_ring_rows(n_shards: int) -> list[tuple[int, int]]:
    return [
        (s, r) for s in range(n_shards) for r in range(_CH_VNODES)
    ]


def _ch_sql() -> str:
    def ring_values(n):
        return ", ".join(
            f"({s}, {r})" for s, r in _ch_ring_rows(n)
        )

    node_pos = hash_bucket_sql(
        "'n' || CAST(s AS VARCHAR) || 'r' || CAST(r AS VARCHAR)",
        "ring",
        _CH_RING_MOD,
    )
    key_pos = hash_bucket_sql("doc_id", "ringkey", _CH_RING_MOD)
    return f"""
WITH keys AS (
    SELECT doc_id, {key_pos} AS kpos FROM documents
),
ring8(s, r) AS (VALUES {ring_values(_CH_N_OLD)}),
ring9(s, r) AS (VALUES {ring_values(_CH_N_NEW)}),
nodes8 AS (SELECT s, {node_pos} AS npos FROM ring8),
nodes9 AS (SELECT s, {node_pos} AS npos FROM ring9),
own8 AS (
    SELECT k.doc_id,
           (min({{'d': (n.npos - k.kpos + {_CH_RING_MOD})
                       % {_CH_RING_MOD}, 's': n.s}})).s AS shard8
    FROM keys k CROSS JOIN nodes8 n
    GROUP BY k.doc_id
),
own9 AS (
    SELECT k.doc_id, k.kpos,
           (min({{'d': (n.npos - k.kpos + {_CH_RING_MOD})
                       % {_CH_RING_MOD}, 's': n.s}})).s AS shard9
    FROM keys k CROSS JOIN nodes9 n
    GROUP BY k.doc_id, k.kpos
),
joined AS (
    SELECT o9.doc_id, o8.shard8, o9.shard9,
           (o8.shard8 <> o9.shard9) AS moved_ring,
           (o9.kpos % {_CH_N_OLD} <> o9.kpos % {_CH_N_NEW}) AS moved_mod
    FROM own9 o9 JOIN own8 o8 ON o8.doc_id = o9.doc_id
),
totals AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN moved_ring THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS moved_ring_ppm,
           CAST(SUM(CASE WHEN moved_mod THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS moved_mod_ppm
    FROM joined
)
SELECT CAST(j.shard9 AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS load_n9,
       CAST(SUM(CASE WHEN j.shard8 = j.shard9 THEN 0 ELSE 1 END)
            AS BIGINT) AS moved_in,
       g.n_keys, g.moved_ring_ppm, g.moved_mod_ppm
FROM joined j CROSS JOIN totals g
GROUP BY j.shard9, g.n_keys, g.moved_ring_ppm, g.moved_mod_ppm
ORDER BY shard
"""


@register(
    "consistent_hash_resharding_audit",
    _ch_sql(),
    doc=f"Consistent-hashing reshard audit ({_CH_N_OLD} -> "
    f"{_CH_N_NEW} shards, {_CH_VNODES} virtual nodes each, the "
    "Karger ring): per new shard its load and how many keys moved "
    "INTO it, plus the global moved fraction under the ring vs "
    "under naive modulo sharding — the number that justifies the "
    "ring (theory: ~1/9 of keys move on the ring, ~8/9 under mod; "
    "read moved_ring_ppm against moved_mod_ppm). Ring and key "
    "positions come from the repo's single portable md5-prefix hash "
    "idiom (operators/sampling.py — the one spelling both engines "
    "share), ownership is the min clockwise distance with a "
    "deterministic (distance, shard) struct-min tie-break, and all "
    "fractions are exact integer ppm. Scale: the ring is a "
    f"{_CH_N_NEW * _CH_VNODES}-row broadcast; ownership is one "
    "scan-local cross join to it + a key-grain argmin — no shuffle "
    "beyond the final 9-row reduce. The data-placement primitive "
    "behind every shard-rebalance plan the warehouse tier advises "
    "on (file_compaction_plan, shuffle_partition_advisor).",
)
def q_consistent_hash_resharding_audit(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    keys = docs.select(
        "doc_id",
        hash_bucket(F.col("doc_id"), "ringkey", _CH_RING_MOD).alias(
            "kpos"
        ),
    )

    def nodes(n):
        ring = spark.createDataFrame(_ch_ring_rows(n), "s INT, r INT")
        return ring.select(
            "s",
            hash_bucket(
                F.concat(
                    F.lit("n"),
                    F.col("s").cast("string"),
                    F.lit("r"),
                    F.col("r").cast("string"),
                ),
                "ring",
                _CH_RING_MOD,
            ).alias("npos"),
        )

    def owners(n, out):
        dist = (
            F.col("npos") - F.col("kpos") + _CH_RING_MOD
        ) % _CH_RING_MOD
        return (
            keys.crossJoin(F.broadcast(nodes(n)))
            .groupBy("doc_id", "kpos")
            .agg(
                F.min(F.struct(dist.alias("d"), F.col("s").alias("s")))
                .getField("s")
                .alias(out)
            )
        )

    joined = (
        owners(_CH_N_NEW, "shard9")
        .join(
            owners(_CH_N_OLD, "shard8").select("doc_id", "shard8"),
            on="doc_id",
        )
        .select(
            "doc_id",
            "shard8",
            "shard9",
            (F.col("shard8") != F.col("shard9")).alias("moved_ring"),
            (
                F.col("kpos") % _CH_N_OLD != F.col("kpos") % _CH_N_NEW
            ).alias("moved_mod"),
        )
        .localCheckpoint(eager=False)
    )
    glob = joined.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.expr(
            "CAST(SUM(CASE WHEN moved_ring THEN 1 ELSE 0 END) * 1000000"
            " DIV COUNT(*) AS BIGINT)"
        ).alias("moved_ring_ppm"),
        F.expr(
            "CAST(SUM(CASE WHEN moved_mod THEN 1 ELSE 0 END) * 1000000"
            " DIV COUNT(*) AS BIGINT)"
        ).alias("moved_mod_ppm"),
    )
    return (
        joined.crossJoin(F.broadcast(glob))
        .groupBy(
            F.col("shard9").cast("long").alias("shard"),
            "n_keys",
            "moved_ring_ppm",
            "moved_mod_ppm",
        )
        .agg(
            F.count("*").cast("long").alias("load_n9"),
            F.sum(
                F.when(F.col("shard8") == F.col("shard9"), 0).otherwise(1)
            )
            .cast("long")
            .alias("moved_in"),
        )
        .select(
            "shard",
            "load_n9",
            "moved_in",
            "n_keys",
            "moved_ring_ppm",
            "moved_mod_ppm",
        )
        .orderBy("shard")
    )
