"""Binary-code similarity and sketch-based frequency operators
(SURVEY §7.7 LLM-pipeline tier; round-6 widening).

Four operators a 100 TB curation/serving stack leans on once float
vectors and raw token streams get too heavy to move:

- ``ann_hamming_mih_topk`` — binary ANN: sign-binarize each embedding
  into a 64-bit code (two 32-bit words, so no sign-bit edge cases in
  either engine), index it multi-index-hashing style as 8 x 8-bit
  bands, generate candidates by exact band match (pigeonhole: any
  neighbor within Hamming distance 7 shares >= 1 band), then re-rank
  candidates by exact Hamming distance. Codes are 16 bytes/vector vs
  256 for the float vector — the memory story that makes binary codes
  the first-stage filter at corpus scale.
- ``knn_label_consensus`` — label-noise audit: per vector, the share
  of its k nearest (exact cosine over band-matched candidates) that
  carry the same label, in exact ppm. On geometrically clusterable
  labels low consensus flags mislabeled points; on this fixture's
  random embeddings it reports the ~1/n_labels null baseline — the
  operator is the measurement, the fixture fixes its expected value.
- ``token_zipf_constant`` — rank x frequency for the top corpus
  tokens: the Zipf-law health check (the product is ~constant for
  natural text; a flat or bimodal profile flags boilerplate or
  templated corpora).
- ``cms_heavy_hitters`` — a count-min sketch (3 salted hash rows x 512
  counters) built as three tiny grouped aggregates over the global
  token-count frame, then the CMS point-estimate (min over rows) for
  the top-20 exact heavy hitters next to their true counts. The
  one-sided error contract (estimate >= truth, always) is asserted in
  tests; the overshoot column shows the collision cost of the 512-wide
  sketch directly.

Scale posture:
- Binary codes/bands are built in one map-only projection per vector
  (JVM-side ``aggregate``/``transform`` fold, no Python); candidate
  generation is an equi-join on (band_id, band_value) — bucket-local,
  never all-pairs. At 100 TB the band join is the standard banded-LSH
  shuffle; Hamming re-rank touches candidates only.
- The CMS is the aggregate-then-sketch form: token counts are already
  one map-side-combinable shuffle, and each sketch row is a 512-row
  frame — the sketch itself is broadcast-size by construction, which
  is the whole point of CMS at stream scale.
- Zipf ranking sorts the (vocab-sized) count frame, not the token
  stream, and keeps only the top slice.

Integer discipline: every compared column is BIGINT (Hamming counts,
ranks, token counts, ppm via DIV on non-negative operands).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ecom_churn_lakehouse_spark.operators.sampling import (
    hash_bucket,
    hash_bucket_sql,
)
from ecom_churn_lakehouse_spark.registry import register
from ecom_churn_lakehouse_spark.sources import load_table

# --------------------------------------------------------------------------
# Shared sign-binarization spelling: 64 sign bits -> two 32-bit words,
# extended to an ADAPTIVE 128-bit band geometry (round-12 scale fix).
#
# Round-11's K=30 probe proved the fixed 8-band x 8-bit layout (a
# 2048-bucket space that cannot grow with the corpus) makes candidate
# generation O(N^2/2^8): 899.96x candidate pairs at a 30x corpus
# (SCALING.md round-11). The fix is the adaptive-eps shape from the
# LOF/DBSCAN tier applied to band geometry: band width grows with
# COUNT(embeddings) so average bucket occupancy stays ~_TARGET_OCC,
# which keeps candidate pairs O(N * occupancy) = O(N).
#
# Layout (per band b in 0..7, a 16-bit slot):
#   bits 0..7  — signs of embedding dims 8b+1 .. 8b+8 (EXACTLY the
#                legacy band value, so any corpus small enough for
#                band_bits = 8 produces bit-identical results);
#   bits 8..15 — signs of 8 deterministic Rademacher hyperplanes
#                (masks minted driver-side from md5("hyper:{b}:{j}"),
#                embedded as 64-bit literals in BOTH engines) over the
#                2^20-quantized embedding: sum_d (+-1) * floor(x_d *
#                2^20) — exact BIGINT arithmetic, order-independent,
#                so Spark and DuckDB agree bit-for-bit.
#   band_val = slot & (2^band_bits - 1), with
#   band_bits = min bb in [8, 16] with _TARGET_OCC * 2^bb >= N —
#   a pure integer CASE chain (no float log2) evaluated inside the
#   plan from COUNT(embeddings) in both engines. 8 bands x 16 bits
#   caps the signature at 128 bits.
# --------------------------------------------------------------------------

import hashlib as _hashlib

_N_BANDS = 8
_BAND_BITS = 8  # floor band width — the legacy geometry
_MAX_BAND_BITS = 16  # 8 bands x 16 bits = full 128-bit signature
_TARGET_OCC = 8  # avg bucket occupancy the adaptive width maintains
_QUANT = 1 << 20  # exact-integer embedding quantizer for hyperplanes


def _adaptive_band_bits(n: int) -> int:
    """Smallest band width in [8, 16] with ``_TARGET_OCC * 2^bb >= n``
    — the Python mirror of the in-plan CASE chain (frozen-config
    streaming + tests)."""
    bb = _BAND_BITS
    while bb < _MAX_BAND_BITS and n > _TARGET_OCC * (1 << bb):
        bb += 1
    return bb


#: Integer CASE chain from __n (corpus count) to band width — spelled
#: once, valid verbatim in Spark SQL and DuckDB.
_BB_CASE = (
    "CASE "
    + " ".join(
        f"WHEN __n <= {_TARGET_OCC * (1 << bb)} THEN {bb}"
        for bb in range(_BAND_BITS, _MAX_BAND_BITS)
    )
    + f" ELSE {_MAX_BAND_BITS} END"
)


def _hyper_mask(b: int, j: int) -> int:
    """64-bit Rademacher mask for extra hyperplane j of band b
    (bit d set => +1 coefficient on dim d+1, else -1)."""
    return int(_hashlib.md5(f"hyper:{b}:{j}".encode()).hexdigest()[:16], 16)


def _s64(m: int) -> int:
    """Two's-complement view so the literal fits a signed BIGINT."""
    return m - (1 << 64) if m >= (1 << 63) else m


_HYPER_MASKS = [
    [_s64(_hyper_mask(b, j)) for j in range(_MAX_BAND_BITS - _BAND_BITS)]
    for b in range(_N_BANDS)
]

#: Quantized embedding: floor(x * 2^20) per dim — a single IEEE
#: multiply + floor, bit-identical across engines. The Spark side
#: spells this per-DIMENSION (``_qd_expr``) rather than as an array
#: ``transform``: higher-order functions with lambdas are interpreted
#: (no whole-stage codegen), and the r12 baseline measured the
#: interpreted 8x8x64-step ``aggregate`` spelling at 3-6x the wall
#: time of the whole query family (guide §4.1: prefer built-ins that
#: codegen; a flat arithmetic expression does).
_QV_SQL = (
    f"list_transform(embedding, x -> "
    f"CAST(floor(CAST(x AS DOUBLE) * {float(_QUANT)}) AS BIGINT))"
)


def _qd_expr(d: int) -> str:
    """Quantized dimension d (0-based) — the per-element arithmetic of
    the oracle's ``_QV_SQL``, spelled flat so codegen applies."""
    return (
        f"CAST(floor(CAST(element_at(embedding, {d + 1}) AS DOUBLE) "
        f"* {float(_QUANT)}D) AS BIGINT)"
    )


def _ext_flat(b: int) -> str:
    """Hyperplane-extension bits 8..15 of band b's 16-bit slot, as a
    flat codegen-able expression over the projected ``__qd{d}``
    columns and their total ``__qt``.

    Exactness: the old interpreted spelling summed signed terms
    s_d * qd_d with s_d = ±1 from the mask; with S = Σ_{mask bit set}
    qd_d and T = Σ_d qd_d that sum is exactly 2·S − T (pure int64,
    |T| ≤ 64·2^20·max|x| — no overflow), so the sign test and hence
    every emitted bit is bit-identical to the legacy HOF spelling and
    to the DuckDB oracle's ``_ext_sql``."""
    terms = []
    for j, m in enumerate(_HYPER_MASKS[b]):
        u = m & ((1 << 64) - 1)  # unsigned view for bit tests
        s = " + ".join(f"__qd{d}" for d in range(64) if (u >> d) & 1)
        terms.append(
            f"IF(2 * ({s}) - __qt >= 0, {1 << (_BAND_BITS + j)}L, 0L)"
        )
    return " + ".join(terms)


def _ext_sql(b: int) -> str:
    """DuckDB twin of :func:`_ext_expr` — same masks, same quantizer,
    same exact integer arithmetic."""
    terms = []
    for j, m in enumerate(_HYPER_MASKS[b]):
        hsum = (
            f"list_sum(list_transform(range(0, 64), d -> "
            f"CASE WHEN ((CAST({m} AS BIGINT) >> d) & 1) = 1 "
            f"THEN __qv[d + 1] ELSE -__qv[d + 1] END))"
        )
        terms.append(
            f"CASE WHEN {hsum} >= 0 THEN {1 << (_BAND_BITS + j)} ELSE 0 END"
        )
    return " + ".join(terms)


#: Spark word-packing expression (word j covers dims 32j+1 .. 32j+32)
#: — flat 32-term sum (codegen) in place of the interpreted
#: aggregate/transform HOF; the terms are distinct powers of two, so
#: the sum is exactly the same packed word in any order.
def _word_expr(j: int) -> str:
    return " + ".join(
        f"IF(element_at(embedding, {32 * j + i + 1}) >= 0, {1 << i}L, 0L)"
        for i in range(32)
    )


def _word_sql(j: int) -> str:
    return (
        f"list_sum(list_transform(range(0, 32), i -> "
        f"CASE WHEN embedding[{32 * j} + i + 1] >= 0 "
        f"THEN (1::BIGINT << i) ELSE 0::BIGINT END))"
    )


#: Low 8 slot bits of band b (0..7): word b//4, bits 8*(b%4) .. +7 —
#: the legacy band value.
_BAND_SPARK = "shiftright(IF(b < 4, w0, w1), 8 * (b % 4)) & 255"
_BAND_SQL = "(CASE WHEN b < 4 THEN w0 ELSE w1 END >> (8 * (b % 4))) & 255"

_H_CASE_SQL = (
    "CASE b "
    + " ".join(f"WHEN {b} THEN h{b}" for b in range(_N_BANDS))
    + " END"
)

_CODES_SQL = f"""
codes AS (
    SELECT vec_id, label,
           CAST({_word_sql(0)} AS BIGINT) AS w0,
           CAST({_word_sql(1)} AS BIGINT) AS w1,
           {", ".join(f"CAST({_ext_sql(b)} AS BIGINT) AS h{b}" for b in range(_N_BANDS))}
    FROM (SELECT *, {_QV_SQL} AS __qv FROM embeddings)
),
geom AS (
    SELECT CAST({_BB_CASE} AS BIGINT) AS __bb
    FROM (SELECT COUNT(*) AS __n FROM embeddings)
),
bands AS (
    SELECT vec_id, w0, w1, b,
           CAST((( ({_BAND_SQL}) | ({_H_CASE_SQL}) )
                 & ((CAST(1 AS BIGINT) << g.__bb) - 1)) AS BIGINT) AS band_val
    FROM codes, geom g, unnest(range(0, {_N_BANDS})) AS t(b)
)
"""


def _spark_codes(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return _codes_frame(emb, with_label=True)


def _codes_frame(emb, with_label: bool = False, band_bits: int | None = None):
    """Signature frame: (vec_id[, label], w0, w1, h0..h7, __bb) — the
    two sign words, the per-band hyperplane-extension bits, and the
    band width the geometry resolved to.

    ``band_bits=None`` resolves the width from a driver-side
    ``COUNT(emb)`` — the scalar-metadata-collect class the repo
    already permits (dbscan's adaptive eps, the streaming twin's
    frozen geometry), producing the SAME value as every oracle's
    ``geom`` CTE (pinned cross-spelling by
    tests/test_band_geometry.py). An int freezes it (streaming
    maintenance: geometry fixed from the source-corpus count before
    any batch runs).

    The width decision is made BEFORE the plan is built so the floor
    regime (``band_bits = 8`` — every corpus up to 8·2^8 vectors,
    including all tested SFs) statically omits the 64
    Rademacher-hyperplane expressions whose bits ``band_val`` would
    mask off anyway. The r12 baseline measured those expressions at
    ~2s of compile/evaluate cost PER EXECUTION even when a runtime
    ``IF`` gate skipped the row work — the branch still has to be
    code-generated — and 3-6x whole-query wall time in the original
    interpreted-HOF spelling (guide §1.2: don't compute things you
    throw away; §2.3: the in-plan alternative was a broadcast
    cross-join carrying the count into every row). Above the floor
    the flat 2·S−T spelling (see ``_ext_flat``) is bit-identical to
    the oracle's ``_ext_sql``."""
    if band_bits is None:
        band_bits = _adaptive_band_bits(emb.count())
    keep = [F.col("vec_id")] + ([F.col("label")] if with_label else [])
    words = [
        F.expr(_word_expr(0)).cast("long").alias("w0"),
        F.expr(_word_expr(1)).cast("long").alias("w1"),
    ]
    bbcol = F.lit(int(band_bits)).cast("long").alias("__bb")
    if band_bits <= _BAND_BITS:
        return emb.select(
            *keep,
            *words,
            *[F.lit(0).cast("long").alias(f"h{b}") for b in range(_N_BANDS)],
            bbcol,
        )
    step1 = emb.select(
        *keep,
        *words,
        # Quantized dims projected once as columns (not inlined per
        # hyperplane term) so each of the 64 values is computed once
        # per row, not once per referencing term.
        *[F.expr(_qd_expr(d)).alias(f"__qd{d}") for d in range(64)],
    )
    step2 = step1.withColumn(
        "__qt", F.expr(" + ".join(f"__qd{d}" for d in range(64)))
    )
    return step2.select(
        *keep,
        "w0",
        "w1",
        *[
            F.expr(_ext_flat(b)).cast("long").alias(f"h{b}")
            for b in range(_N_BANDS)
        ],
        bbcol,
    )


_H_ARRAY_SPARK = (
    "element_at(array(" + ", ".join(f"h{b}" for b in range(_N_BANDS)) + "), b + 1)"
)


def _spark_bands(codes, band_bits: int | None = None):
    """Explode a codes frame into (vec_id, w0, w1, b, band_val) under
    the adaptive geometry. Width resolution order: an explicit
    ``band_bits`` wins (frozen-geometry streaming path and the
    frozen-vs-adaptive parity test); otherwise the ``__bb`` column a
    ``_codes_frame``-built frame carries (adaptive, resolved from the
    corpus count); otherwise derive from COUNT(codes) in-plan (legacy
    direct callers). NOTE: a frozen width wider than the codes
    frame's own gate width only sees live extension bits when the
    codes frame was built with the same ``band_bits`` (the streaming
    path does exactly that).

    The result is ``localCheckpoint(eager=False)``-ed: every consumer
    self-joins the band frame (q-side ⋈ c-side on (b, band_val)), and
    without a materialization barrier BOTH join legs recompute the
    full signature pipeline — the r12 baseline plan showed the codes
    subtree (and its parquet scan) twice, 0 ReusedExchange. At 100 TB
    that is two full passes over the embedding corpus where one
    suffices; the checkpoint materializes the ~40-byte/row proxy once
    (guide §8: decide on small rows, and don't recompute the heavy
    transform per consumer)."""
    if band_bits is not None:
        withbb = (
            codes.drop("__bb") if "__bb" in codes.columns else codes
        ).withColumn("__bb", F.lit(int(band_bits)).cast("long"))
    elif "__bb" in codes.columns:
        withbb = codes
    else:
        geom = (
            codes.groupBy()
            .agg(F.count(F.lit(1)).alias("__n"))
            .select(F.expr(_BB_CASE).cast("long").alias("__bb"))
        )
        withbb = codes.crossJoin(F.broadcast(geom))
    hcols = [f"h{b}" for b in range(_N_BANDS)]
    return (
        withbb.select(
            "vec_id",
            "w0",
            "w1",
            "__bb",
            *hcols,
            F.explode(F.sequence(F.lit(0), F.lit(_N_BANDS - 1))).alias("b"),
        )
        .withColumn(
            "band_val",
            F.expr(
                f"CAST(((({_BAND_SPARK}) | ({_H_ARRAY_SPARK})) "
                f"& (shiftleft(1L, CAST(__bb AS INT)) - 1L)) AS BIGINT)"
            ),
        )
        .select("vec_id", "w0", "w1", "b", "band_val")
        .localCheckpoint(eager=False)
    )


# --------------------------------------------------------------------------
# Binary ANN: multi-index-hashing candidates + exact Hamming re-rank.
# --------------------------------------------------------------------------

_HAMMING_SQL = f"""
WITH {_CODES_SQL},
q AS (SELECT * FROM bands WHERE vec_id % 50 = 0),
cand AS (
    SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           q.w0 AS qw0, q.w1 AS qw1, c.w0 AS cw0, c.w1 AS cw1
    FROM q JOIN bands c
      ON q.b = c.b AND q.band_val = c.band_val
    WHERE q.vec_id <> c.vec_id
),
scored AS (
    SELECT query_id, neighbor_id,
           CAST(bit_count(xor(qw0, cw0)) AS BIGINT)
           + CAST(bit_count(xor(qw1, cw1)) AS BIGINT) AS hamming_dist
    FROM cand
)
SELECT query_id, neighbor_id, hamming_dist,
       CAST(rn AS BIGINT) AS rank
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY hamming_dist, neighbor_id) AS rn
    FROM scored
)
WHERE rn <= 5
"""


@register(
    "ann_hamming_mih_topk",
    _HAMMING_SQL,
    doc="Binary ANN over sign codes: 64-bit signature as two 32-bit "
    "words, multi-index-hashing candidates (8 x 8-bit bands, equi-join "
    "— pigeonhole covers Hamming <= 7 exactly), exact-Hamming re-rank "
    "via bit_count(xor). 16-byte codes make this the first-stage "
    "filter when float vectors are too big to shuffle; candidate "
    "generation is bucket-local, never all-pairs.",
)
def q_ann_hamming_mih_topk(spark, sf_dir):
    bands = _spark_bands(_spark_codes(spark, sf_dir))
    q = bands.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("w0").alias("qw0"),
        F.col("w1").alias("qw1"),
        "b",
        "band_val",
    )
    c = bands.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("w0").alias("cw0"),
        F.col("w1").alias("cw1"),
        "b",
        "band_val",
    )
    cand = (
        q.join(c, ["b", "band_val"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qw0", "qw1", "cw0", "cw1")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        (
            F.expr("CAST(bit_count(qw0 ^ cw0) AS BIGINT)")
            + F.expr("CAST(bit_count(qw1 ^ cw1) AS BIGINT)")
        ).alias("hamming_dist"),
    )
    w = Window.partitionBy("query_id").orderBy("hamming_dist", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "hamming_dist", "rank")
    )


# --------------------------------------------------------------------------
# kNN label-consensus audit over band-matched candidates.
# --------------------------------------------------------------------------

_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)

_CONSENSUS_SQL = f"""
WITH {_CODES_SQL},
vecs AS (
    SELECT vec_id, label, embedding::DOUBLE[] AS ev FROM embeddings
),
cand AS (
    SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
    FROM bands q JOIN bands c
      ON q.b = c.b AND q.band_val = c.band_val
    WHERE q.vec_id <> c.vec_id
),
scored AS (
    SELECT cd.query_id, cd.neighbor_id,
           qv.label AS q_label, cv.label AS c_label,
           {_COS.format(a="qv.ev", b="cv.ev")} AS sim
    FROM cand cd
    JOIN vecs qv ON cd.query_id = qv.vec_id
    JOIN vecs cv ON cd.neighbor_id = cv.vec_id
),
topk AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
    FROM scored
)
SELECT query_id AS vec_id,
       CAST(MIN(q_label) AS INTEGER) AS label,
       CAST(COUNT(*) AS BIGINT) AS k_used,
       CAST(CAST(SUM(CASE WHEN c_label = q_label THEN 1 ELSE 0 END)
                 AS BIGINT) * 1000000 // COUNT(*) AS BIGINT) AS agree_ppm
FROM topk
WHERE rn <= 5
GROUP BY query_id
"""


@register(
    "knn_label_consensus",
    _CONSENSUS_SQL,
    doc="Label-noise audit: share of each vector's k=5 nearest "
    "neighbors (exact cosine over band-matched candidates — the same "
    "banded-LSH candidate stream the dedup tier uses, never all-pairs) "
    "that carry the same label, in exact ppm. Low consensus on "
    "clusterable labels flags mislabeled points; on this fixture's "
    "random embeddings the expected value is the 1/n_labels baseline.",
)
def q_knn_label_consensus(spark, sf_dir):
    from ecom_churn_lakehouse_spark.functions.vectors import cosine_fixed

    bands = _spark_bands(_spark_codes(spark, sf_dir))
    cand = (
        bands.select(F.col("vec_id").alias("query_id"), "b", "band_val")
        .join(
            bands.select(F.col("vec_id").alias("neighbor_id"), "b", "band_val"),
            ["b", "band_val"],
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("__qv"),
    )
    cv = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("c_label"),
        F.col("embedding").alias("__cv"),
    )
    scored = (
        cand.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "q_label",
            "c_label",
            cosine_fixed("__qv", "__cv", 64).alias("__sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id")
    )
    topk = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
    return topk.groupBy(F.col("query_id").alias("vec_id")).agg(
        F.min("q_label").cast("int").alias("label"),
        F.count("*").cast("long").alias("k_used"),
        F.expr(
            "CAST(CAST(SUM(CASE WHEN c_label = q_label THEN 1 ELSE 0 END)"
            " AS BIGINT) * 1000000 DIV COUNT(*) AS BIGINT)"
        ).alias("agree_ppm"),
    )


# --------------------------------------------------------------------------
# Zipf rank x frequency profile.
# --------------------------------------------------------------------------

_ZIPF_SQL = r"""
WITH toks AS (
    SELECT unnest(regexp_extract_all(text, '\S+')) AS token FROM documents
),
counts AS (
    SELECT token, CAST(COUNT(*) AS BIGINT) AS token_count
    FROM toks GROUP BY token
)
SELECT token, token_count,
       CAST(rn AS BIGINT) AS rank,
       CAST(rn * token_count AS BIGINT) AS zipf_k
FROM (
    SELECT *, ROW_NUMBER() OVER (
        ORDER BY token_count DESC, token) AS rn
    FROM counts
)
WHERE rn <= 50
"""


@register(
    "token_zipf_constant",
    _ZIPF_SQL,
    doc="Zipf-law health check: rank x frequency for the top-50 corpus "
    "tokens (near-constant for natural text; flat or bimodal profiles "
    "flag boilerplate/templated corpora). The global sort runs over "
    "the vocabulary-sized count frame, never the token stream.",
)
def q_token_zipf_constant(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("token_count"))
    )
    w = Window.orderBy(F.desc("token_count"), F.asc("token"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 50)
        .select(
            "token",
            "token_count",
            "rank",
            (F.col("rank") * F.col("token_count")).cast("long").alias("zipf_k"),
        )
    )


# --------------------------------------------------------------------------
# Count-min sketch heavy hitters.
# --------------------------------------------------------------------------

_CMS_DEPTH = 3
_CMS_WIDTH = 512

_CMS_SQL = r"""
WITH toks AS (
    SELECT unnest(regexp_extract_all(text, '\S+')) AS token FROM documents
),
counts AS (
    SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_count
    FROM toks GROUP BY token
),
{rows},
top20 AS (
    SELECT token, exact_count FROM (
        SELECT *, ROW_NUMBER() OVER (
            ORDER BY exact_count DESC, token) AS rn
        FROM counts
    ) WHERE rn <= 20
)
SELECT t.token AS token, t.exact_count AS exact_count,
       CAST(LEAST({mins}) AS BIGINT) AS cms_estimate,
       CAST(LEAST({mins}) - t.exact_count AS BIGINT) AS overshoot
FROM top20 t
{joins}
""".format(
    rows=",\n".join(
        f"row{d} AS (\n"
        f"    SELECT {hash_bucket_sql('token', f'cms{d}:', _CMS_WIDTH)} AS bucket,\n"
        f"           CAST(SUM(exact_count) AS BIGINT) AS counter\n"
        f"    FROM counts GROUP BY 1\n)"
        for d in range(_CMS_DEPTH)
    ),
    mins=", ".join(f"r{d}.counter" for d in range(_CMS_DEPTH)),
    joins="\n".join(
        f"JOIN row{d} r{d} ON r{d}.bucket = "
        + hash_bucket_sql("t.token", f"cms{d}:", _CMS_WIDTH)
        for d in range(_CMS_DEPTH)
    ),
)


@register(
    "cms_heavy_hitters",
    _CMS_SQL,
    doc="Count-min sketch point estimates vs truth for the top-20 "
    "tokens: 3 salted hash rows x 512 counters, built as three grouped "
    "aggregates over the (vocab-sized) global count frame; estimate = "
    "min over rows, one-sided (>= truth, asserted in tests). The "
    "sketch is broadcast-size by construction — the reason CMS is the "
    "frequency structure that survives stream scale.",
)
def q_cms_heavy_hitters(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("exact_count"))
    )
    rows = [
        counts.groupBy(
            hash_bucket(F.col("token"), f"cms{d}:", _CMS_WIDTH).alias("bucket")
        )
        .agg(F.sum("exact_count").cast("long").alias(f"counter{d}"))
        for d in range(_CMS_DEPTH)
    ]
    w = Window.orderBy(F.desc("exact_count"), F.asc("token"))
    top = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("token", "exact_count")
    )
    out = top
    for d in range(_CMS_DEPTH):
        out = out.withColumn(
            f"__b{d}", hash_bucket(F.col("token"), f"cms{d}:", _CMS_WIDTH)
        ).join(
            F.broadcast(rows[d]),
            F.col(f"__b{d}") == F.col("bucket"),
        ).drop("bucket", f"__b{d}")
    est = F.least(*[F.col(f"counter{d}") for d in range(_CMS_DEPTH)]).cast("long")
    return out.select(
        "token",
        "exact_count",
        est.alias("cms_estimate"),
        (est - F.col("exact_count")).cast("long").alias("overshoot"),
    )


# --------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch accuracy curve.
# --------------------------------------------------------------------------

#: 13 hex chars = 52 bits, so (k-1) * 2^52 stays inside int64 for
#: k <= 1024 (1023 * 2^52 ~ 4.6e18 < 2^63). Collision probability over
#: n distinct keys is n^2 / 2^53 — negligible below ~1e8 distinct, and
#: deterministic (both engines hash identically) regardless.
_KMV_BITS = 52
_KMV_DOMAIN = 1 << _KMV_BITS
_KMV_KS = (16, 128, 1024)
_KMV_MAX_K = max(_KMV_KS)

_KMV_SQL = f"""
WITH hashes AS (
    SELECT DISTINCT CAST(('0x' || substring(md5('kmv:' || CAST(o_custkey AS VARCHAR)), 1, 13))
                         AS BIGINT) AS h
    FROM orders
),
exact_n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM hashes),
topk AS (
    SELECT h FROM hashes ORDER BY h LIMIT {_KMV_MAX_K}
),
ranked AS (
    SELECT h, CAST(ROW_NUMBER() OVER (ORDER BY h) AS BIGINT) AS k FROM topk
),
curve AS (
    SELECT k, h AS h_k,
           CAST((k - 1) * {_KMV_DOMAIN} // h AS BIGINT) AS est
    FROM ranked WHERE k IN ({", ".join(str(k) for k in _KMV_KS)})
)
SELECT CAST(c.k AS INTEGER) AS k, c.h_k, e.n_exact, c.est,
       CAST(ABS(c.est - e.n_exact) * 1000000 // e.n_exact AS BIGINT) AS abs_err_ppm
FROM curve c CROSS JOIN exact_n e
"""


@register(
    "kmv_distinct_curve",
    _KMV_SQL,
    doc=f"KMV (k-minimum-values) distinct-count sketch over distinct "
    f"buyers (orders.o_custkey): estimate = (k-1)*2^{_KMV_BITS}/h_k from the k-th smallest "
    f"52-bit md5 hash, evaluated at k in {_KMV_KS} next to the exact "
    "distinct count and the ppm error — the accuracy-vs-sketch-size "
    "curve that justifies picking k. Everything is exact integer "
    "arithmetic (the estimator itself is an integer floor-division). "
    "Scale: KMV is a MERGEABLE sketch — the global k smallest hashes "
    "are the merge of per-partition k-minima, which is exactly what "
    "Spark's sort-limit (TakeOrderedAndProject) executes: per-"
    "partition top-k, then a k-sized driver merge; no global sort, no "
    "full shuffle. The exact count alongside costs one distinct "
    "aggregate and exists only to score the sketch.",
)
def q_kmv_distinct_curve(spark, sf_dir):
    ev = load_table(spark, sf_dir, "orders").select("o_custkey")
    hashes = ev.select(
        F.conv(
            F.substring(F.md5(F.concat(F.lit("kmv:"), F.col("o_custkey").cast("string"))), 1, 13),
            16,
            10,
        )
        .cast("long")
        .alias("h")
    ).distinct()
    exact_n = hashes.agg(F.count("*").cast("long").alias("n_exact"))
    topk = hashes.orderBy("h").limit(_KMV_MAX_K)
    ranked = topk.select(
        "h", F.row_number().over(Window.orderBy("h")).cast("long").alias("k")
    )
    curve = ranked.filter(F.col("k").isin(*_KMV_KS)).select(
        "k",
        F.col("h").alias("h_k"),
        F.expr(f"CAST((k - 1) * {_KMV_DOMAIN} DIV h AS BIGINT)").alias("est"),
    )
    return curve.crossJoin(F.broadcast(exact_n)).select(
        F.col("k").cast("int").alias("k"),
        "h_k",
        "n_exact",
        "est",
        F.expr("CAST(ABS(est - n_exact) * 1000000 DIV n_exact AS BIGINT)").alias(
            "abs_err_ppm"
        ),
    )


# --------------------------------------------------------------------------
# Streaming KMV maintenance (mergeable-sketch twin of kmv_distinct_curve).
# --------------------------------------------------------------------------

#: Same estimator pipeline as the batch entry, WITHOUT the exact-count
#: columns: the streaming point is that per-batch k-minima merge into
#: the global sketch with O(k) state — keeping the exact distinct set
#: alongside would defeat the sketch.
_KMV_STREAM_SQL = f"""
WITH hashes AS (
    SELECT DISTINCT CAST(('0x' || substring(md5('kmv:' || CAST(o_custkey AS VARCHAR)), 1, 13))
                         AS BIGINT) AS h
    FROM orders
),
topk AS (
    SELECT h FROM hashes ORDER BY h LIMIT {_KMV_MAX_K}
),
ranked AS (
    SELECT h, CAST(ROW_NUMBER() OVER (ORDER BY h) AS BIGINT) AS k FROM topk
)
SELECT CAST(k AS INTEGER) AS k, h AS h_k,
       CAST((k - 1) * {_KMV_DOMAIN} // h AS BIGINT) AS est
FROM ranked WHERE k IN ({", ".join(str(k) for k in _KMV_KS)})
"""


@register(
    "stream_kmv_maintenance",
    _KMV_STREAM_SQL,
    doc="Streaming twin of kmv_distinct_curve: KMV is a MERGEABLE "
    "sketch (the k smallest hashes of a union are the k smallest of "
    "the per-batch k-minima), so the distinct-count estimate is "
    "maintainable from micro-batches with O(k) state per batch and "
    "no reprocessing. Three order chunks stream through foreachBatch "
    "(idempotent per-batch_id partial writes, at-least-once safe); "
    "each batch persists only its local k smallest distinct hashes; "
    "the merged partials re-ranked must reproduce the one-shot batch "
    "sketch EXACTLY — which is the oracle (the estimator columns of "
    "the batch entry).",
)
def q_stream_kmv_maintenance(spark, sf_dir):
    import os

    from ecom_churn_lakehouse_spark.scratch import scratch_dir

    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("kmv:"), F.col("o_custkey").cast("string"))), 1, 13
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h")
    )

    base = scratch_dir(prefix="stream_kmv_")
    for lo, hi in ((None, 50000), (50000, 100000), (100000, None)):
        chunk = orders
        if lo:
            chunk = chunk.filter(F.col("o_custkey") >= lo)
        if hi:
            chunk = chunk.filter(F.col("o_custkey") < hi)
        chunk.coalesce(1).write.mode("append").parquet(f"{base}/src")

    def _apply(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        dest = f"{base}/partials/batch_id={batch_id}"
        if not os.path.exists(dest):
            (
                batch_df.select(h)
                .distinct()
                .orderBy("h")
                .limit(_KMV_MAX_K)
                .write.mode("overwrite")
                .parquet(dest)
            )

    stream = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/src")
    )
    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    merged = (
        spark.read.parquet(f"{base}/partials")
        .select("h")
        .distinct()  # same hash may survive several batches' top-k
        .orderBy("h")
        .limit(_KMV_MAX_K)
    )
    ranked = merged.select(
        "h", F.row_number().over(Window.orderBy("h")).cast("long").alias("k")
    )
    return ranked.filter(F.col("k").isin(*_KMV_KS)).select(
        F.col("k").cast("int").alias("k"),
        F.col("h").alias("h_k"),
        F.expr(f"CAST((k - 1) * {_KMV_DOMAIN} DIV h AS BIGINT)").alias("est"),
    )


# --------------------------------------------------------------------------
# KMV sketch set-overlap (Jaccard / intersection) estimation.
# --------------------------------------------------------------------------

_OVERLAP_K = 64

#: Shared hash text: both key sets MUST hash with the same salt or the
#: sketches aren't comparable.
_OVERLAP_HASH_SQL = (
    "CAST(('0x' || substring(md5('setkmv:' || CAST({key} AS VARCHAR)), 1, 13)) AS BIGINT)"
)

_OVERLAP_SQL = f"""
WITH ha AS (
    SELECT DISTINCT {_OVERLAP_HASH_SQL.format(key="user_id")} AS h FROM events
),
hb AS (
    SELECT DISTINCT {_OVERLAP_HASH_SQL.format(key="o_custkey")} AS h FROM orders
),
ska AS (SELECT h FROM ha ORDER BY h LIMIT {_OVERLAP_K}),
skb AS (SELECT h FROM hb ORDER BY h LIMIT {_OVERLAP_K}),
uni AS (
    SELECT h FROM (SELECT h FROM ska UNION SELECT h FROM skb)
    ORDER BY h LIMIT {_OVERLAP_K}
),
est AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_common
    FROM uni
    WHERE h IN (SELECT h FROM ska) AND h IN (SELECT h FROM skb)
),
hk AS (SELECT MAX(h) AS h_k FROM uni),
exact AS (
    SELECT CAST((SELECT COUNT(*) FROM ha) AS BIGINT) AS n_a,
           CAST((SELECT COUNT(*) FROM hb) AS BIGINT) AS n_b,
           CAST((SELECT COUNT(*) FROM (SELECT h FROM ha INTERSECT SELECT h FROM hb))
                AS BIGINT) AS inter_exact
)
SELECT CAST({_OVERLAP_K} AS INTEGER) AS k,
       e.n_a, e.n_b, e.inter_exact,
       CAST(e.inter_exact * 1000000 // (e.n_a + e.n_b - e.inter_exact) AS BIGINT)
           AS jaccard_exact_ppm,
       s.n_common,
       CAST(s.n_common * 1000000 // {_OVERLAP_K} AS BIGINT) AS jaccard_est_ppm,
       CAST(({_OVERLAP_K} - 1) * {_KMV_DOMAIN} // (SELECT h_k FROM hk) AS BIGINT)
           AS union_est,
       CAST(s.n_common * (({_OVERLAP_K} - 1) * {_KMV_DOMAIN} // (SELECT h_k FROM hk))
            // {_OVERLAP_K} AS BIGINT) AS inter_est
FROM est s CROSS JOIN exact e
"""


@register(
    "kmv_set_overlap_estimate",
    _OVERLAP_SQL,
    doc=f"Sketch-based set-overlap estimation: two KMV sketches "
    f"(k={_OVERLAP_K}, shared salt) over event users and order "
    "customers; the k-minima of the sketch UNION give the union-size "
    "estimate, and the fraction of those minima present in BOTH "
    "sketches is the Jaccard estimate (n_common/k, exact integer "
    "ppm) — intersection size follows without ever joining the raw "
    "key sets. Reported next to the exact Jaccard/intersection so the "
    "sketch error is visible. The distinct-overlap planner question "
    "('how many event users are known buyers?') answered from two "
    "O(k) summaries — at 100 TB each side's sketch is its "
    "per-partition k-minima merged (TakeOrderedAndProject), and the "
    "comparison itself is driver-trivial.",
)
def q_kmv_set_overlap_estimate(spark, sf_dir):
    def sketch(df, col):
        h = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("setkmv:"), F.col(col).cast("string"))), 1, 13
                ),
                16,
                10,
            )
            .cast("long")
            .alias("h")
        )
        return df.select(h).distinct()

    ha = sketch(load_table(spark, sf_dir, "events").select("user_id"), "user_id")
    hb = sketch(load_table(spark, sf_dir, "orders").select("o_custkey"), "o_custkey")
    ska = ha.orderBy("h").limit(_OVERLAP_K)
    skb = hb.orderBy("h").limit(_OVERLAP_K)
    uni = (
        ska.select("h")
        .union(skb.select("h"))
        .distinct()
        .orderBy("h")
        .limit(_OVERLAP_K)
        .localCheckpoint(eager=False)  # reused by n_common and h_k
    )
    common = (
        uni.join(ska.withColumnRenamed("h", "h_a"), uni.h == F.col("h_a"), "left_semi")
        .join(skb.withColumnRenamed("h", "h_b"), F.col("h") == F.col("h_b"), "left_semi")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    hk = uni.agg(F.max("h").alias("h_k"))
    exact = (
        ha.agg(F.count("*").cast("long").alias("n_a"))
        .crossJoin(hb.agg(F.count("*").cast("long").alias("n_b")))
        .crossJoin(
            ha.join(hb, on="h", how="left_semi")
            .agg(F.count("*").cast("long").alias("inter_exact"))
        )
    )
    return (
        common.crossJoin(F.broadcast(hk))
        .crossJoin(F.broadcast(exact))
        .select(
            F.lit(_OVERLAP_K).cast("int").alias("k"),
            "n_a",
            "n_b",
            "inter_exact",
            F.expr(
                "CAST(inter_exact * 1000000 DIV (n_a + n_b - inter_exact) AS BIGINT)"
            ).alias("jaccard_exact_ppm"),
            "n_common",
            F.expr(f"CAST(n_common * 1000000 DIV {_OVERLAP_K} AS BIGINT)").alias(
                "jaccard_est_ppm"
            ),
            F.expr(f"CAST(({_OVERLAP_K} - 1) * {_KMV_DOMAIN} DIV h_k AS BIGINT)").alias(
                "union_est"
            ),
            F.expr(
                f"CAST(n_common * (({_OVERLAP_K} - 1) * {_KMV_DOMAIN} DIV h_k) "
                f"DIV {_OVERLAP_K} AS BIGINT)"
            ).alias("inter_est"),
        )
    )


# --------------------------------------------------------------------------
# Mutual-kNN graph construction (the SemDeDup/clustering prerequisite).
# --------------------------------------------------------------------------

_MUTUAL_KNN_SQL = f"""
WITH {_CODES_SQL},
vecs AS (
    SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
),
cand AS (
    SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
    FROM bands q JOIN bands c
      ON q.b = c.b AND q.band_val = c.band_val
    WHERE q.vec_id <> c.vec_id
),
scored AS (
    SELECT cd.query_id, cd.neighbor_id,
           {_COS.format(a="qv.ev", b="cv.ev")} AS sim
    FROM cand cd
    JOIN vecs qv ON cd.query_id = qv.vec_id
    JOIN vecs cv ON cd.neighbor_id = cv.vec_id
),
topk AS (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
    FROM scored
)
SELECT a.query_id AS vec_a, a.neighbor_id AS vec_b,
       CAST(a.rn AS INTEGER) AS rank_ab,
       CAST(b.rn AS INTEGER) AS rank_ba
FROM (SELECT * FROM topk WHERE rn <= 5) a
JOIN (SELECT * FROM topk WHERE rn <= 5) b
  ON a.query_id = b.neighbor_id AND a.neighbor_id = b.query_id
WHERE a.query_id < a.neighbor_id
ORDER BY vec_a, vec_b
"""


@register(
    "mutual_knn_graph",
    _MUTUAL_KNN_SQL,
    doc="Mutual-kNN graph construction — the prerequisite relation for "
    "SemDeDup-style semantic clustering and outlier pruning: each "
    "vector's k=5 nearest (exact cosine over the SAME banded-LSH "
    "candidate stream as knn_label_consensus, never all-pairs), kept "
    "only where the relation is MUTUAL (a in kNN(b) and b in kNN(a)) "
    "— mutuality is the standard density filter that drops hub/"
    "boundary edges before community detection. Only ranks are "
    "surfaced (floats stay internal), so the compare is exact "
    "integers. Scale: banded candidates + per-vector top-k windows; "
    "the mutual join is kNN-output-sized (<= 5N rows), tiny next to "
    "the candidate stream.",
)
def q_mutual_knn_graph(spark, sf_dir):
    from ecom_churn_lakehouse_spark.functions.vectors import cosine_fixed

    bands = _spark_bands(_spark_codes(spark, sf_dir))
    cand = (
        bands.select(F.col("vec_id").alias("query_id"), "b", "band_val")
        .join(
            bands.select(F.col("vec_id").alias("neighbor_id"), "b", "band_val"),
            ["b", "band_val"],
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"),
    )
    cv = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("__cv"),
    )
    scored = (
        cand.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_fixed("__qv", "__cv", 64).alias("__sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id")
    )
    topk = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", "rn")
        .localCheckpoint(eager=False)
    )
    b_side = topk.select(
        F.col("query_id").alias("neighbor_id"),
        F.col("neighbor_id").alias("query_id"),
        F.col("rn").alias("rank_ba"),
    )
    return (
        topk.join(b_side, ["query_id", "neighbor_id"])
        .filter(F.col("query_id") < F.col("neighbor_id"))
        .select(
            F.col("query_id").alias("vec_a"),
            F.col("neighbor_id").alias("vec_b"),
            F.col("rn").cast("int").alias("rank_ab"),
            F.col("rank_ba").cast("int").alias("rank_ba"),
        )
        .orderBy("vec_a", "vec_b")
    )


# --------------------------------------------------------------------------
# Streaming CMS maintenance (mergeable-sketch twin of cms_heavy_hitters).
# --------------------------------------------------------------------------


@register(
    "stream_cms_maintenance",
    _CMS_SQL,
    doc="Streaming twin of cms_heavy_hitters: a count-min sketch is "
    "MERGEABLE by element-wise counter addition, so the frequency "
    "structure is maintainable from micro-batches with O(depth*width) "
    "state and no reprocessing. Three document chunks stream through "
    "foreachBatch (idempotent per-batch_id partial writes, "
    "at-least-once safe); each batch persists only its local "
    "(row, bucket, count) partial counters; the summed partials "
    "queried for the same top-20 probe tokens must reproduce the "
    "one-shot batch sketch EXACTLY — the oracle is the batch entry's "
    "SQL verbatim. The probe-token list (top-20 exact counts) is "
    "computed batch-side: it exists to score the sketch, exactly as "
    "in the batch entry.",
)
def q_stream_cms_maintenance(spark, sf_dir):
    import os

    from ecom_churn_lakehouse_spark.scratch import scratch_dir

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = F.explode(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)).alias(
        "token"
    )

    base = scratch_dir(prefix="stream_cms_")
    n_max = docs.agg(F.max("doc_id")).collect()[0][0]
    cut1, cut2 = n_max // 3, 2 * n_max // 3
    for lo, hi in ((None, cut1), (cut1, cut2), (cut2, None)):
        chunk = docs
        if lo:
            chunk = chunk.filter(F.col("doc_id") >= lo)
        if hi:
            chunk = chunk.filter(F.col("doc_id") < hi)
        chunk.coalesce(1).write.mode("append").parquet(f"{base}/src")

    def _apply(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        dest = f"{base}/partials/batch_id={batch_id}"
        if not os.path.exists(dest):
            toks = batch_df.select(tok)
            partials = None
            for d in range(_CMS_DEPTH):
                p = toks.groupBy(
                    F.lit(d).alias("row_id"),
                    hash_bucket(F.col("token"), f"cms{d}:", _CMS_WIDTH).alias(
                        "bucket"
                    ),
                ).agg(F.count("*").cast("long").alias("counter"))
                partials = p if partials is None else partials.unionByName(p)
            partials.write.mode("overwrite").parquet(dest)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/src")
    )
    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    merged = (
        spark.read.parquet(f"{base}/partials")
        .groupBy("row_id", "bucket")
        .agg(F.sum("counter").cast("long").alias("counter"))
    )

    counts = (
        docs.select(tok)
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("exact_count"))
    )
    w = Window.orderBy(F.desc("exact_count"), F.asc("token"))
    top = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("token", "exact_count")
    )
    out = top
    for d in range(_CMS_DEPTH):
        row_d = merged.filter(F.col("row_id") == d).select(
            "bucket", F.col("counter").alias(f"counter{d}")
        )
        out = (
            out.withColumn(
                f"__b{d}", hash_bucket(F.col("token"), f"cms{d}:", _CMS_WIDTH)
            )
            .join(F.broadcast(row_d), F.col(f"__b{d}") == F.col("bucket"))
            .drop("bucket", f"__b{d}")
        )
    est = F.least(*[F.col(f"counter{d}") for d in range(_CMS_DEPTH)]).cast("long")
    return out.select(
        "token",
        "exact_count",
        est.alias("cms_estimate"),
        (est - F.col("exact_count")).cast("long").alias("overshoot"),
    )


# --------------------------------------------------------------------------
# SemDeDup capstone: semantic-cluster keep policy (VERDICT r7 directive #2).
# --------------------------------------------------------------------------

#: Shared CTE chain: mutual-kNN edges (the mutual_knn_graph relation,
#: sim carried through), connected components via a recursive
#: min-label walk, exact-integer micro centrality, and the
#: deterministic within-cluster keeper pick.
_SEMDEDUP_CORE = f"""{_CODES_SQL.strip().rstrip()},
vecs AS (
    SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
),
scand AS (
    SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
    FROM bands q JOIN bands c
      ON q.b = c.b AND q.band_val = c.band_val
    WHERE q.vec_id <> c.vec_id
),
sscored AS (
    SELECT cd.query_id, cd.neighbor_id,
           {_COS.format(a="qv.ev", b="cv.ev")} AS sim
    FROM scand cd
    JOIN vecs qv ON cd.query_id = qv.vec_id
    JOIN vecs cv ON cd.neighbor_id = cv.vec_id
),
stopk AS (
    SELECT query_id, neighbor_id, sim,
           ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
    FROM sscored
),
medges AS (
    SELECT a.query_id AS u, a.neighbor_id AS v,
           CAST(FLOOR(a.sim * 1000000) AS BIGINT) AS sim_micro
    FROM (SELECT * FROM stopk WHERE rn <= 5) a
    JOIN (SELECT * FROM stopk WHERE rn <= 5) b
      ON a.query_id = b.neighbor_id AND a.neighbor_id = b.query_id
    WHERE a.query_id < a.neighbor_id
),
adj AS (
    SELECT u, v, sim_micro FROM medges
    UNION ALL
    SELECT v AS u, u AS v, sim_micro FROM medges
),
walk(node, reach) AS (
    SELECT u, u FROM adj
    UNION
    SELECT w.node, a.v FROM walk w JOIN adj a ON a.u = w.reach
),
lab AS (
    SELECT node, CAST(MIN(reach) AS BIGINT) AS cluster_id
    FROM walk GROUP BY node
),
cent AS (
    SELECT u AS node, CAST(SUM(sim_micro) AS BIGINT) AS centrality_micro,
           CAST(COUNT(*) AS BIGINT) AS n_edges
    FROM adj GROUP BY u
),
manifest AS (
    SELECT l.node AS vec_id, l.cluster_id, c.n_edges, c.centrality_micro,
           CAST(COUNT(*) OVER (PARTITION BY l.cluster_id) AS BIGINT)
               AS cluster_size,
           ROW_NUMBER() OVER (PARTITION BY l.cluster_id
                              ORDER BY c.centrality_micro DESC, l.node)
               AS pick
    FROM lab l JOIN cent c ON c.node = l.node
)"""

_SEMDEDUP_MANIFEST_SQL = f"""
WITH RECURSIVE {_SEMDEDUP_CORE}
SELECT vec_id, cluster_id, cluster_size, n_edges, centrality_micro,
       pick = 1 AS keep
FROM manifest
ORDER BY cluster_id, vec_id
"""


def _spark_mutual_edges(spark, sf_dir):
    """Mutual-kNN edges (u < v) with exact-micro cosine weights — the
    Spark twin of the ``medges`` CTE."""
    from ecom_churn_lakehouse_spark.functions.vectors import cosine_fixed

    bands = _spark_bands(_spark_codes(spark, sf_dir))
    cand = (
        bands.select(F.col("vec_id").alias("query_id"), "b", "band_val")
        .join(
            bands.select(
                F.col("vec_id").alias("neighbor_id"), "b", "band_val"
            ),
            ["b", "band_val"],
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"),
    )
    cv = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("__cv"),
    )
    scored = (
        cand.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_fixed("__qv", "__cv", 64).alias("__sim"),
        )
    )
    return _mutual_edges_from_scored(scored)


def _mutual_edges_from_scored(scored):
    """Rank-dependent SemDeDup finish over a scored candidate frame
    (query_id, neighbor_id, __sim): top-5 per query, MUTUAL semi-join,
    u < v canonicalization, floor-micro weights. Shared by the batch
    relation and the streaming maintenance twin so parity is
    structural, not coincidental."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id")
    )
    topk = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", "__sim")
        .localCheckpoint(eager=False)
    )
    b_side = topk.select(
        F.col("query_id").alias("neighbor_id"),
        F.col("neighbor_id").alias("query_id"),
    )
    return (
        topk.join(b_side, ["query_id", "neighbor_id"], "left_semi")
        .filter(F.col("query_id") < F.col("neighbor_id"))
        .select(
            F.col("query_id").alias("u"),
            F.col("neighbor_id").alias("v"),
            F.floor(F.col("__sim") * 1000000).cast("long").alias("sim_micro"),
        )
    )


def _spark_semdedup_manifest(spark, sf_dir):
    """Manifest frame (vec_id, cluster_id, cluster_size, n_edges,
    centrality_micro, pick) — the Spark twin of the ``manifest`` CTE."""
    return _manifest_from_medges(
        _spark_mutual_edges(spark, sf_dir).localCheckpoint(eager=False)
    )


def _manifest_from_medges(medges):
    """Cluster + keeper election over a mutual-edge frame
    (u, v, sim_micro): bounded min-label connected components,
    exact-integer centrality, one window election per cluster. Shared
    batch/stream finish (see _mutual_edges_from_scored)."""
    from ecom_churn_lakehouse_spark.operators.connected_components import (
        connected_components,
    )

    adj = medges.select("u", "v", "sim_micro").unionByName(
        medges.select(
            F.col("v").alias("u"), F.col("u").alias("v"), "sim_micro"
        )
    )
    lab = connected_components(medges, src="u", dst="v").select(
        "node", F.col("label").cast("long").alias("cluster_id")
    )
    cent = adj.groupBy(F.col("u").alias("node")).agg(
        F.sum("sim_micro").cast("long").alias("centrality_micro"),
        F.count("*").cast("long").alias("n_edges"),
    )
    joined = lab.join(cent, "node")
    wc = Window.partitionBy("cluster_id")
    return joined.select(
        F.col("node").alias("vec_id"),
        "cluster_id",
        "n_edges",
        "centrality_micro",
        F.count("*").over(wc).cast("long").alias("cluster_size"),
        F.row_number()
        .over(wc.orderBy(F.col("centrality_micro").desc(), "node"))
        .alias("pick"),
    )


@register(
    "semdedup_keep_manifest",
    _SEMDEDUP_MANIFEST_SQL,
    doc="SemDeDup keep-policy capstone (VERDICT r7 directive #2, "
    "completing mutual_knn_graph): clusters are connected components "
    "over the MUTUAL-kNN edges (operators/connected_components.py "
    "bounded min-label loop; the oracle walks a recursive transitive "
    "closure), each member is ranked by a deterministic centrality — "
    "the SUM of its incident mutual-edge cosines floor-quantized to "
    "micro BEFORE summing, so the rank key is an exact integer — and "
    "exactly one keeper per cluster survives (max centrality, min "
    "vec_id tiebreak; the keyed-dedup winner discipline of the "
    "reference's orders_bronze_to_silver.py:79-90). This is the "
    "Abbas et al. SemDeDup keep-one-per-semantic-cluster policy with "
    "the centroid-distance rank replaced by an exactly-reproducible "
    "graph centrality. Scale: candidates stay banded-LSH-local (never "
    "all-pairs), mutual edges are <= 5N rows, CC iterations are "
    "bounded by cluster diameter (mutual-kNN graphs fragment into "
    "small components), and the keeper pick is one window over "
    "cluster-partitioned data.",
)
def q_semdedup_keep_manifest(spark, sf_dir):
    return (
        _spark_semdedup_manifest(spark, sf_dir)
        .select(
            "vec_id",
            "cluster_id",
            "cluster_size",
            "n_edges",
            "centrality_micro",
            (F.col("pick") == 1).alias("keep"),
        )
        .orderBy("cluster_id", "vec_id")
    )


_SEMDEDUP_SAVINGS_SQL = f"""
WITH RECURSIVE {_SEMDEDUP_CORE},
sem_drop AS (SELECT vec_id FROM manifest WHERE pick <> 1),
toks AS (
    SELECT doc_id, source,
           CAST(len(regexp_extract_all(trim(text), '\\S+')) AS BIGINT)
               AS n_tokens,
           sha256(text) AS h
    FROM documents
),
hgrp AS (
    SELECT doc_id, source, n_tokens,
           MIN(doc_id) OVER (PARTITION BY h) AS h_min,
           COUNT(*) OVER (PARTITION BY h) AS h_cnt
    FROM toks
),
classed AS (
    SELECT source, n_tokens,
           CASE WHEN h_cnt > 1 AND doc_id <> h_min THEN 'exact_dup'
                WHEN doc_id IN (SELECT vec_id FROM sem_drop)
                    THEN 'semantic_dup'
                ELSE 'keep' END AS reason
    FROM hgrp
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN reason = 'exact_dup' THEN 1 ELSE 0 END)
            AS BIGINT) AS exact_drop_docs,
       CAST(SUM(CASE WHEN reason = 'exact_dup' THEN n_tokens ELSE 0 END)
            AS BIGINT) AS exact_drop_tokens,
       CAST(SUM(CASE WHEN reason = 'semantic_dup' THEN 1 ELSE 0 END)
            AS BIGINT) AS semantic_drop_docs,
       CAST(SUM(CASE WHEN reason = 'semantic_dup' THEN n_tokens ELSE 0 END)
            AS BIGINT) AS semantic_drop_tokens,
       CAST(SUM(CASE WHEN reason <> 'keep' THEN n_tokens ELSE 0 END)
            * 1000000 // SUM(n_tokens) AS BIGINT) AS removable_ppm
FROM classed
GROUP BY source
ORDER BY source
"""


@register(
    "semdedup_savings_by_source",
    _SEMDEDUP_SAVINGS_SQL,
    doc="Per-source removable-token accounting for the SemDeDup "
    "manifest, COMPOSED with curation precedence (the "
    "curation_keep_manifest rule: a doc claims only its "
    "highest-priority drop reason): exact duplicates (sha256 "
    "hash-group losers, min-id survivor) take precedence over "
    "semantic drops (non-keepers of semdedup_keep_manifest via the "
    "vec_id == doc_id bridge), so no token is double-counted. "
    "Emits per-source doc/token counts per class plus the combined "
    "removable ppm (non-negative int64 division, DIV//`//` safe). "
    "Scale: one sha256 hash-group window + the manifest join — the "
    "dedup-economics dashboard every curation run reads.",
)
def q_semdedup_savings_by_source(spark, sf_dir):
    sem_drop = (
        _spark_semdedup_manifest(spark, sf_dir)
        .filter(F.col("pick") != 1)
        .select(F.col("vec_id").alias("doc_id"))
        .withColumn("__is_sem", F.lit(True))
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
        .cast("long")
        .alias("n_tokens"),
        F.sha2(F.col("text"), 256).alias("h"),
    )
    wh = Window.partitionBy("h")
    hgrp = docs.select(
        "doc_id",
        "source",
        "n_tokens",
        F.min("doc_id").over(wh).alias("h_min"),
        F.count("*").over(wh).alias("h_cnt"),
    )
    classed = hgrp.join(F.broadcast(sem_drop), "doc_id", "left").select(
        "source",
        "n_tokens",
        F.when(
            (F.col("h_cnt") > 1) & (F.col("doc_id") != F.col("h_min")),
            "exact_dup",
        )
        .when(F.col("__is_sem"), "semantic_dup")
        .otherwise("keep")
        .alias("reason"),
    )
    return (
        classed.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum(F.when(F.col("reason") == "exact_dup", 1).otherwise(0))
            .cast("long")
            .alias("exact_drop_docs"),
            F.sum(
                F.when(
                    F.col("reason") == "exact_dup", F.col("n_tokens")
                ).otherwise(0)
            )
            .cast("long")
            .alias("exact_drop_tokens"),
            F.sum(F.when(F.col("reason") == "semantic_dup", 1).otherwise(0))
            .cast("long")
            .alias("semantic_drop_docs"),
            F.sum(
                F.when(
                    F.col("reason") == "semantic_dup", F.col("n_tokens")
                ).otherwise(0)
            )
            .cast("long")
            .alias("semantic_drop_tokens"),
            F.expr(
                "CAST(SUM(CASE WHEN reason <> 'keep' THEN n_tokens ELSE 0"
                " END) * 1000000 DIV SUM(n_tokens) AS BIGINT)"
            ).alias("removable_ppm"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Streaming SemDeDup maintenance: incremental graph state (r8 dir. #4).
# --------------------------------------------------------------------------


@register(
    "stream_semdedup_maintenance",
    _SEMDEDUP_MANIFEST_SQL,
    doc="Streaming twin of semdedup_keep_manifest — the INCREMENTAL-"
    "GRAPH-STATE class that completes the streaming-state taxonomy "
    "(mergeable sketch / keyed state / scalar state / graph state). "
    "Key insight: banded-LSH CANDIDATE DISCOVERY is monotone — an "
    "unordered pair collides iff its band values match, which never "
    "changes as more vectors arrive — so each foreachBatch (a) "
    "upserts the batch's band signatures into the bucket state and "
    "(b) joins ONLY the batch's bands against the accumulated bucket "
    "state, scoring exact cosines for the newly visible pairs (the "
    "later endpoint discovers the pair exactly once: new-old and "
    "new-new, never old-old). Both writes are batch_id-keyed partials "
    "skipped when already present — the reference's idempotent keyed "
    "upsert publish discipline (orders_bronze_to_silver.py:184-195) "
    "in streaming form. The RANK-DEPENDENT finish (top-5 per query, "
    "mutual filter, bounded CC, keeper election) is not incrementally "
    "mergeable — a new arrival can evict an old top-5 edge — so it "
    "runs on the maintained pair store at serve time via the SAME "
    "code path as the batch entry (_mutual_edges_from_scored + "
    "_manifest_from_medges); the oracle is the batch manifest SQL "
    "verbatim, so convergence must be bit-exact regardless of batch "
    "boundaries. Scale: per-batch work is |batch bands| x bucket "
    "occupancy (never all-pairs, never a full recompute); the pair "
    "store grows like the batch relation's candidate set (banded, "
    "~O(N)); the serve finish is the batch finish.",
)
def q_stream_semdedup_maintenance(spark, sf_dir):
    from ecom_churn_lakehouse_spark.scratch import scratch_dir

    emb = load_table(spark, sf_dir, "embeddings")
    base = scratch_dir(prefix="stream_semdedup_")
    # Frozen-config discipline (the stream_ann_index_maintenance
    # pattern): band width is part of the index config, fixed ONCE
    # from the source-corpus count before any batch runs — per-batch
    # adaptivity would shift band values mid-stream and corrupt the
    # bucket state. Matches the batch oracle's geom CTE because the
    # stream processes exactly this corpus.
    band_bits = _adaptive_band_bits(emb.count())
    # three deterministic arrival waves (vec_id mod 3)
    for m in (0, 1, 2):
        emb.filter(F.col("vec_id") % 3 == m).coalesce(1).write.mode(
            "append"
        ).parquet(f"{base}/src")

    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/src")
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: _semdedup_apply_batch(
                spark, base, bdf, bid, band_bits
            )
        )
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return _semdedup_serve_manifest(spark, base)


def _semdedup_bands_of(df, band_bits: int):
    """Band signatures (vec_id, b, band_val) of an embedding frame —
    the incrementally-upsertable half of the SemDeDup graph state.
    ``band_bits`` is the FROZEN index geometry (adaptivity is decided
    once per index from the corpus count, never per batch) — it must
    reach ``_codes_frame`` too, so the extension-bit gate follows the
    index geometry rather than the (smaller) batch count."""
    return _spark_bands(
        _codes_frame(df, band_bits=band_bits), band_bits=band_bits
    ).select("vec_id", "b", "band_val")


def _semdedup_apply_batch(spark, base, batch_df, batch_id, band_bits):
    """One foreachBatch step of the SemDeDup graph-state maintenance:
    upsert the batch's band signatures + vectors into the bucket
    state, then score exact cosines for the pairs this batch makes
    newly visible (batch bands x ACCUMULATED bands — the later
    endpoint discovers each unordered pair exactly once). Every write
    is a batch_id-keyed partial skipped when already present (replay
    safety: the idempotent keyed-upsert publish discipline)."""
    import os

    from ecom_churn_lakehouse_spark.functions.vectors import (
        cosine_fixed,
        to_double_array,
    )

    if batch_df.isEmpty():
        return
    bands_dest = f"{base}/bands/batch_id={batch_id}"
    pairs_dest = f"{base}/pairs/batch_id={batch_id}"
    if not os.path.exists(bands_dest):
        _semdedup_bands_of(batch_df, band_bits).write.mode(
            "overwrite"
        ).parquet(bands_dest)
    if not os.path.exists(pairs_dest):
        # vector state partial (for cosine scoring of new pairs)
        vecs_dest = f"{base}/vecs/batch_id={batch_id}"
        if not os.path.exists(vecs_dest):
            batch_df.select(
                "vec_id",
                to_double_array(F.col("embedding")).alias("ev"),
            ).write.mode("overwrite").parquet(vecs_dest)
        new_bands = _semdedup_bands_of(batch_df, band_bits)
        all_bands = spark.read.parquet(f"{base}/bands").select(
            F.col("vec_id").alias("other_id"), "b", "band_val"
        )
        fresh = (
            new_bands.join(all_bands, ["b", "band_val"])
            .filter(F.col("vec_id") != F.col("other_id"))
            .select(
                F.least("vec_id", "other_id").alias("lo"),
                F.greatest("vec_id", "other_id").alias("hi"),
            )
            .distinct()
        )
        vecs = spark.read.parquet(f"{base}/vecs").drop("batch_id")
        scored = (
            fresh.join(
                vecs.select(
                    F.col("vec_id").alias("lo"), F.col("ev").alias("__lv")
                ),
                "lo",
            )
            .join(
                vecs.select(
                    F.col("vec_id").alias("hi"), F.col("ev").alias("__hv")
                ),
                "hi",
            )
            .select(
                "lo",
                "hi",
                cosine_fixed("__lv", "__hv", 64).alias("sim"),
            )
        )
        scored.write.mode("overwrite").parquet(pairs_dest)


def _semdedup_serve_manifest(spark, base):
    """Rank-dependent serve-time finish over the maintained pair
    store: SAME code path as the batch entry (_mutual_edges_from_scored
    + _manifest_from_medges), so stream-vs-batch parity is structural.
    """
    pairs = spark.read.parquet(f"{base}/pairs").select("lo", "hi", "sim")
    scored = pairs.select(
        F.col("lo").alias("query_id"),
        F.col("hi").alias("neighbor_id"),
        F.col("sim").alias("__sim"),
    ).unionByName(
        pairs.select(
            F.col("hi").alias("query_id"),
            F.col("lo").alias("neighbor_id"),
            F.col("sim").alias("__sim"),
        )
    )
    manifest = _manifest_from_medges(
        _mutual_edges_from_scored(scored).localCheckpoint(eager=False)
    )
    return manifest.select(
        "vec_id",
        "cluster_id",
        "cluster_size",
        "n_edges",
        "centrality_micro",
        (F.col("pick") == 1).alias("keep"),
    ).orderBy("cluster_id", "vec_id")


# --------------------------------------------------------------------------
# Mean-reciprocal-rank retrieval eval over banded-LSH candidates.
# --------------------------------------------------------------------------

_MRR_SQL = f"""
WITH {_CODES_SQL},
vecs AS (
    SELECT vec_id, label, embedding::DOUBLE[] AS ev FROM embeddings
),
mq AS (SELECT * FROM bands WHERE vec_id % 50 = 0),
mcand AS (
    SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
    FROM mq q JOIN bands c ON q.b = c.b AND q.band_val = c.band_val
    WHERE q.vec_id <> c.vec_id
),
mscored AS (
    SELECT cd.query_id, cd.neighbor_id,
           qv.label AS qlabel, cv.label AS clabel,
           {_COS.format(a="qv.ev", b="cv.ev")} AS sim
    FROM mcand cd
    JOIN vecs qv ON cd.query_id = qv.vec_id
    JOIN vecs cv ON cd.neighbor_id = cv.vec_id
),
mtopk AS (
    SELECT query_id, qlabel, clabel,
           ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
    FROM mscored
),
hits AS (
    SELECT query_id,
           MIN(CASE WHEN clabel = qlabel AND rn <= 10 THEN rn END)
               AS first_rel
    FROM mtopk GROUP BY query_id
)
SELECT query_id,
       CAST(COALESCE(first_rel, 0) AS BIGINT) AS first_rel_rank,
       CAST(CASE WHEN first_rel IS NULL THEN 0
                 ELSE 1000000 // first_rel END AS BIGINT) AS rr_micro
FROM hits
ORDER BY query_id
"""


@register(
    "mrr_retrieval_eval",
    _MRR_SQL,
    doc="Mean-reciprocal-rank retrieval eval: for every 50th vector as "
    "a query, exact-cosine-rank its banded-LSH candidates and report "
    "the rank of the first same-label neighbor within the top-10 — "
    "the navigational-search metric completing the eval tier next to "
    "ranking_ndcg_eval (graded gains) and ann_recall_eval (set "
    "overlap). Reciprocal ranks are exact integer micro "
    "(1000000 // rank; rank 0 for no hit), so the corpus MRR is "
    "reproducible integer arithmetic downstream. Scale: the query "
    "side is a fixed 2% sample; candidates stay band-bucket-local "
    "(never all-pairs); per-query ranking windows are "
    "candidate-sized.",
)
def q_mrr_retrieval_eval(spark, sf_dir):
    from ecom_churn_lakehouse_spark.functions.vectors import cosine_fixed

    bands = _spark_bands(_spark_codes(spark, sf_dir))
    q = bands.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "b", "band_val"
    )
    cand = (
        q.join(
            bands.select(
                F.col("vec_id").alias("neighbor_id"), "b", "band_val"
            ),
            ["b", "band_val"],
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("__qv"),
    )
    cv = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("clabel"),
        F.col("embedding").alias("__cv"),
    )
    scored = (
        cand.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "qlabel",
            "clabel",
            cosine_fixed("__qv", "__cv", 64).alias("__sim"),
        )
    )
    topk = scored.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.col("__sim").desc(), "neighbor_id"
            )
        ),
    )
    hits = topk.groupBy("query_id").agg(
        F.min(
            F.when(
                (F.col("clabel") == F.col("qlabel")) & (F.col("rn") <= 10),
                F.col("rn"),
            )
        ).alias("first_rel")
    )
    return hits.select(
        "query_id",
        F.coalesce(F.col("first_rel"), F.lit(0)).cast("long").alias(
            "first_rel_rank"
        ),
        F.expr(
            "CAST(CASE WHEN first_rel IS NULL THEN 0"
            " ELSE 1000000 DIV first_rel END AS BIGINT)"
        ).alias("rr_micro"),
    ).orderBy("query_id")
