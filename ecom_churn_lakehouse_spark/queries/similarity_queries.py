"""Similarity-search queries over ``embeddings`` (SURVEY §7.7).

Brute-force cosine top-k (exactness baseline), hyperplane-LSH bucketed
ANN (the scale path), and vector stats — all native array expressions.
Oracle uses DuckDB list functions over ``embedding::DOUBLE[]``; both
sides round similarities to 6 decimals (the underlying doubles agree
to ~1e-14, far inside the rounding guard).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecom_churn_lakehouse_spark.functions.vectors import (
    cosine_fixed,
    dot,
    to_double_array,
)
from ecom_churn_lakehouse_spark.registry import register
from ecom_churn_lakehouse_spark.similarity.ann import (
    brute_force_topk,
    bucketed_topk,
    hyperplane_lsh_buckets,
    ivf_assign_cells,
)
from ecom_churn_lakehouse_spark.sources import load_table

_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)

# ------------------------------------------------------- vector stats

_STATS_SQL = """
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS dim,
       ROUND(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6)
           AS l2_norm,
       label
FROM embeddings
"""


@register(
    "vector_stats",
    _STATS_SQL,
    doc="Vector column plumbing: dimension + L2 norm as native array "
    "expressions (functions/vectors.py).",
)
def q_vector_stats(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    v = to_double_array(F.col("embedding"))
    return emb.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.round(F.sqrt(dot(v, v)), 6).alias("l2_norm"),
        "label",
    )


# -------------------------------------------------- brute-force top-k

_TOPK_SQL = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
    FROM embeddings WHERE vec_id < 10
),
c AS (
    SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings
),
scored AS (
    SELECT query_id, neighbor_id,
           {_COS.format(a="qv", b="cv")} AS sim
    FROM q, c WHERE query_id <> neighbor_id
)
SELECT query_id, neighbor_id, ROUND(sim, 6) AS cosine_sim
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
    FROM scored
)
WHERE rn <= 5
"""


@register(
    "cosine_topk_bruteforce",
    _TOPK_SQL,
    doc="Exact cosine top-5 per query vector; broadcast query side, "
    "corpus never replicated (similarity/ann.py::brute_force_topk).",
)
def q_cosine_topk_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(emb.filter(F.col("vec_id") < 10), emb, k=5, dim=64)


# ----------------------------------------------- LSH-bucketed ANN top-k

_ANN_SQL = f"""
WITH planes AS (
    SELECT vec_id AS plane_id, embedding::DOUBLE[] AS hv
    FROM embeddings WHERE vec_id < 8
),
vecs AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
buckets AS (
    SELECT v.vec_id,
           CAST(SUM(CASE WHEN list_dot_product(v.ev, h.hv) >= 0
                         THEN 1 << h.plane_id ELSE 0 END) AS BIGINT) AS bucket
    FROM vecs v, planes h
    GROUP BY v.vec_id
),
q AS (
    SELECT b.vec_id AS query_id, b.bucket, v.ev AS qv
    FROM buckets b JOIN vecs v ON b.vec_id = v.vec_id
    WHERE b.vec_id % 50 = 0
),
c AS (
    SELECT b.vec_id AS neighbor_id, b.bucket, v.ev AS cv
    FROM buckets b JOIN vecs v ON b.vec_id = v.vec_id
),
scored AS (
    SELECT q.query_id, c.neighbor_id,
           {_COS.format(a="q.qv", b="c.cv")} AS sim
    FROM q JOIN c ON q.bucket = c.bucket
    WHERE q.query_id <> c.neighbor_id
)
SELECT query_id, neighbor_id, ROUND(sim, 6) AS cosine_sim
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
    FROM scored
)
WHERE rn <= 3
"""


_IVF_SQL = f"""
WITH cents AS (
    SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
    FROM embeddings WHERE vec_id % 37 = 1
),
vecs AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
assigned AS (
    SELECT vec_id, bucket FROM (
        SELECT v.vec_id, c.cid AS bucket,
               ROW_NUMBER() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY {_COS.format(a="v.ev", b="c.cv")} DESC, c.cid
               ) AS rn
        FROM vecs v, cents c
    ) WHERE rn = 1
),
q AS (
    SELECT a.vec_id AS query_id, a.bucket, v.ev AS qv
    FROM assigned a JOIN vecs v ON a.vec_id = v.vec_id
    WHERE a.vec_id % 50 = 0
),
c AS (
    SELECT a.vec_id AS neighbor_id, a.bucket, v.ev AS cv
    FROM assigned a JOIN vecs v ON a.vec_id = v.vec_id
),
scored AS (
    SELECT q.query_id, c.neighbor_id,
           {_COS.format(a="q.qv", b="c.cv")} AS sim
    FROM q JOIN c ON q.bucket = c.bucket
    WHERE q.query_id <> c.neighbor_id
)
SELECT query_id, neighbor_id, ROUND(sim, 6) AS cosine_sim
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
    FROM scored
)
WHERE rn <= 3
"""


@register(
    "ann_ivf_topk",
    _IVF_SQL,
    doc="IVF-flat ANN (nprobe=1): coarse quantization to the nearest of "
    "~14 deterministic centroids, inverted-list bucket join, exact "
    "re-rank top-3 (similarity/ann.py::ivf_assign_cells).",
)
def q_ann_ivf_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 37 == 1).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    cells = ivf_assign_cells(emb, centroids, dim=64)
    q = cells.filter(F.col("vec_id") % 50 == 0)
    return bucketed_topk(q, cells, emb, k=3)


@register(
    "ann_lsh_topk",
    _ANN_SQL,
    doc="Random-hyperplane LSH ANN: 8-bit sign buckets (data-derived "
    "planes for determinism), bucket-local candidate join, exact "
    "re-rank top-3 (similarity/ann.py — the 100 TB path).",
)
def q_ann_lsh_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    planes = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("plane_id"), "embedding"
    )
    buckets = hyperplane_lsh_buckets(emb, planes)
    q = buckets.filter(F.col("vec_id") % 50 == 0)
    return bucketed_topk(q, buckets, emb, k=3, dim=64)


# ------------------------- nearest-centroid assignment (k-means step)

_CENTROID_SQL = """
WITH ex AS (
    SELECT label, i AS pos, CAST(embedding[i] AS DOUBLE) AS v
    FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
),
cent AS (
    SELECT label AS c_label, pos,
           CAST(SUM(CAST(v AS DECIMAL(20,9))) AS DOUBLE) / COUNT(*) AS c
    FROM ex GROUP BY label, pos
),
cent_arr AS (
    SELECT c_label, list(c ORDER BY pos) AS centroid
    FROM cent GROUP BY c_label
),
dists AS (
    SELECT e.vec_id, e.label, c.c_label,
           list_sum(list_transform(range(1, len(e.embedding) + 1),
               i -> (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i])
                  * (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i]))) AS d
    FROM embeddings e, cent_arr c
),
assigned AS (
    SELECT vec_id, label,
           (min({'d': d, 'cl': c_label})).cl AS assigned_label
    FROM dists GROUP BY vec_id, label
)
SELECT CAST(label AS BIGINT) AS true_label,
       CAST(assigned_label AS BIGINT) AS assigned_label,
       CAST(COUNT(*) AS BIGINT) AS n_vectors
FROM assigned GROUP BY 1, 2
"""


@register(
    "label_centroid_confusion",
    _CENTROID_SQL,
    doc="Nearest-centroid assignment (one k-means / classification-eval "
    "step): per-label centroids via element-wise DECIMAL-exact means "
    "(posexplode → two map-side-combinable aggregations, label×dim "
    "cells — tiny at any scale), then every vector scores against the "
    "broadcast k centroids and takes the argmin squared distance with "
    "a deterministic (distance, label) struct-min tie-break. Emits the "
    "confusion matrix. Exact centroids make the argmin reproducible; "
    "the fixture's min 1st-vs-2nd margin is 8e-6, ~8 orders above "
    "cross-engine fold noise.",
)
def q_label_centroid_confusion(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    v = to_double_array(F.col("embedding"))
    ex = emb.select("label", F.posexplode(v).alias("pos", "v"))
    cent = ex.groupBy(F.col("label").alias("c_label"), "pos").agg(
        (
            F.sum(F.col("v").cast("decimal(20,9)")).cast("double")
            / F.count("*")
        ).alias("c")
    )
    cent_arr = cent.groupBy("c_label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))),
            lambda x: x.getField("c"),
        ).alias("centroid")
    )
    diff_sq = F.zip_with(v, F.col("centroid"), lambda a, b: (a - b) * (a - b))
    dists = emb.crossJoin(F.broadcast(cent_arr)).select(
        "vec_id",
        "label",
        "c_label",
        F.aggregate(diff_sq, F.lit(0.0), lambda acc, x: acc + x).alias("d"),
    )
    assigned = dists.groupBy("vec_id", "label").agg(
        F.min(F.struct(F.col("d").alias("d"), F.col("c_label").alias("cl")))
        .getField("cl")
        .alias("assigned_label")
    )
    return assigned.groupBy(
        F.col("label").cast("long").alias("true_label"),
        F.col("assigned_label").cast("long").alias("assigned_label"),
    ).agg(F.count("*").cast("long").alias("n_vectors"))


# -------------------------------------- ANN recall vs exact ground truth

_RECALL_SQL = f"""
WITH planes AS (
    SELECT vec_id AS plane_id, embedding::DOUBLE[] AS hv
    FROM embeddings WHERE vec_id < 8
),
vecs AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
buckets AS (
    SELECT v.vec_id,
           CAST(SUM(CASE WHEN list_dot_product(v.ev, h.hv) >= 0
                         THEN 1 << h.plane_id ELSE 0 END) AS BIGINT) AS bucket
    FROM vecs v, planes h
    GROUP BY v.vec_id
),
q AS (
    SELECT b.vec_id AS query_id, b.bucket, v.ev AS qv
    FROM buckets b JOIN vecs v ON b.vec_id = v.vec_id
    WHERE b.vec_id % 50 = 0
),
c AS (
    SELECT b.vec_id AS neighbor_id, b.bucket, v.ev AS cv
    FROM buckets b JOIN vecs v ON b.vec_id = v.vec_id
),
lsh_top AS (
    SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, c.neighbor_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.query_id
                   ORDER BY {_COS.format(a="q.qv", b="c.cv")} DESC, c.neighbor_id
               ) AS rn
        FROM q JOIN c ON q.bucket = c.bucket
        WHERE q.query_id <> c.neighbor_id
    ) WHERE rn <= 3
),
exact_top AS (
    SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, v.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.query_id
                   ORDER BY {_COS.format(a="q.qv", b="v.ev")} DESC, v.vec_id
               ) AS rn
        FROM q, vecs v
        WHERE q.query_id <> v.vec_id
    ) WHERE rn <= 3
)
SELECT e.query_id AS query_id,
       CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hit,
       ROUND(COUNT(l.neighbor_id) / 3.0, 6) AS recall_at_3
FROM exact_top e
LEFT JOIN lsh_top l
  ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
GROUP BY e.query_id
"""


@register(
    "ann_recall_eval",
    _RECALL_SQL,
    doc="ANN quality evaluation: recall@3 of the hyperplane-LSH index "
    "against the exact brute-force top-3, per query vector — the "
    "metric that decides whether an approximate index is good enough "
    "to replace the exact scan. Scale: the LSH side is the bucket-"
    "local candidate join; the ground-truth side is brute force over "
    "the SAME small query set (broadcast queries, corpus never "
    "replicated) — exactly the periodic-sample shape used to monitor "
    "a production index. Counts are integers; recall is n/3 under "
    "ROUND, so the oracle hash is exact.",
)
def q_ann_recall_eval(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    planes = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("plane_id"), "embedding"
    )
    buckets = hyperplane_lsh_buckets(emb, planes)
    q = buckets.filter(F.col("vec_id") % 50 == 0)
    lsh = bucketed_topk(q, buckets, emb, k=3, dim=64).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    exact = brute_force_topk(
        emb.join(q.select("vec_id"), on="vec_id", how="left_semi"),
        emb,
        k=3,
        dim=64,
    ).select("query_id", "neighbor_id")
    return (
        exact.join(lsh, on=["query_id", "neighbor_id"], how="left")
        .groupBy("query_id")
        .agg(
            F.count("hit").cast("long").alias("n_hit"),
            F.round(F.count("hit") / 3.0, 6).alias("recall_at_3"),
        )
    )


# ------------------------------------------- multi-probe LSH ANN top-k

_MULTIPROBE_SQL = f"""
WITH planes AS (
    SELECT vec_id AS plane_id, embedding::DOUBLE[] AS hv
    FROM embeddings WHERE vec_id < 8
),
vecs AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
buckets AS (
    SELECT v.vec_id,
           CAST(SUM(CASE WHEN list_dot_product(v.ev, h.hv) >= 0
                         THEN 1 << h.plane_id ELSE 0 END) AS BIGINT) AS bucket
    FROM vecs v, planes h
    GROUP BY v.vec_id
),
q0 AS (
    SELECT b.vec_id AS query_id, b.bucket, v.ev AS qv
    FROM buckets b JOIN vecs v ON b.vec_id = v.vec_id
    WHERE b.vec_id % 50 = 0
),
q AS (
    SELECT query_id, qv,
           CASE WHEN i < 0 THEN bucket ELSE xor(bucket, 1 << i) END AS bucket
    FROM q0, unnest(range(-1, 8)) AS t(i)
),
c AS (
    SELECT b.vec_id AS neighbor_id, b.bucket, v.ev AS cv
    FROM buckets b JOIN vecs v ON b.vec_id = v.vec_id
),
scored AS (
    SELECT q.query_id, c.neighbor_id,
           {_COS.format(a="q.qv", b="c.cv")} AS sim
    FROM q JOIN c ON q.bucket = c.bucket
    WHERE q.query_id <> c.neighbor_id
)
SELECT query_id, neighbor_id, ROUND(sim, 6) AS cosine_sim
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
    FROM scored
)
WHERE rn <= 3
"""


@register(
    "ann_multiprobe_topk",
    _MULTIPROBE_SQL,
    doc="Multi-probe LSH ANN: each query probes its own bucket plus "
    "all 8 Hamming-distance-1 buckets (one sign bit flipped — the "
    "most likely place a near neighbor hides), then exact re-rank "
    "top-3. Raises recall WITHOUT more hash tables: the probe fan-out "
    "is a row-local explode of the SMALL query side (x9), the corpus "
    "index is untouched, and the candidate join stays bucket-local. "
    "Measured at sf0.01: recall@3 vs exact rises 0.033 -> 0.233 (7x) "
    "over single-probe — 8 bits over 500 vectors leaves ~2 vectors "
    "per bucket, exactly the sparse-occupancy regime multi-probe "
    "exists for (tests/test_text_and_vectors.py pins the ordering).",
)
def q_ann_multiprobe_topk(spark, sf_dir):
    from ecom_churn_lakehouse_spark.similarity.ann import multiprobe_buckets

    emb = load_table(spark, sf_dir, "embeddings")
    planes = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("plane_id"), "embedding"
    )
    buckets = hyperplane_lsh_buckets(emb, planes)
    q = multiprobe_buckets(
        buckets.filter(F.col("vec_id") % 50 == 0), n_bits=8
    )
    return bucketed_topk(q, buckets, emb, k=3, dim=64)


# --------------------------------------------- IVF nprobe=2 ANN top-k

_IVF_NPROBE_SQL = f"""
WITH cents AS (
    SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
    FROM embeddings WHERE vec_id % 37 = 1
),
vecs AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
ranked AS (
    SELECT v.vec_id, c.cid AS bucket,
           ROW_NUMBER() OVER (
               PARTITION BY v.vec_id
               ORDER BY {_COS.format(a="v.ev", b="c.cv")} DESC, c.cid
           ) AS rn
    FROM vecs v, cents c
),
corpus_cells AS (SELECT vec_id, bucket FROM ranked WHERE rn <= 1),
query_cells AS (
    SELECT vec_id, bucket FROM ranked
    WHERE rn <= 2 AND vec_id % 50 = 0
),
q AS (
    SELECT a.vec_id AS query_id, a.bucket, v.ev AS qv
    FROM query_cells a JOIN vecs v ON a.vec_id = v.vec_id
),
c AS (
    SELECT a.vec_id AS neighbor_id, a.bucket, v.ev AS cv
    FROM corpus_cells a JOIN vecs v ON a.vec_id = v.vec_id
),
scored AS (
    -- no DISTINCT needed: the corpus is single-assigned, so a pair
    -- can match through at most one probed cell
    SELECT q.query_id, c.neighbor_id,
           {_COS.format(a="q.qv", b="c.cv")} AS sim
    FROM q JOIN c ON q.bucket = c.bucket
    WHERE q.query_id <> c.neighbor_id
)
SELECT query_id, neighbor_id, ROUND(sim, 6) AS cosine_sim
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
    FROM scored
)
WHERE rn <= 3
"""


@register(
    "ann_ivf_nprobe_topk",
    _IVF_NPROBE_SQL,
    doc="IVF-flat ANN with nprobe=2: each query searches its TWO "
    "nearest cells (the dominant IVF miss — a true neighbor just "
    "across the cell boundary — is recovered), while the corpus "
    "stays single-assigned so the index does not grow. The query-"
    "side fan-out is x2 on the small side only; candidates dedup "
    "before re-rank (a neighbor can reach the query via both probed "
    "cells). Pairs with ann_multiprobe_topk as the two standard "
    "recall knobs: probe more cells (IVF) / probe adjacent buckets "
    "(LSH).",
)
def q_ann_ivf_nprobe_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 37 == 1).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    corpus_cells = ivf_assign_cells(emb, centroids, dim=64)
    query_cells = ivf_assign_cells(
        emb.join(
            emb.filter(F.col("vec_id") % 50 == 0).select("vec_id"),
            on="vec_id",
            how="left_semi",
        ),
        centroids,
        nprobe=2,
        dim=64,
    )
    return bucketed_topk(query_cells, corpus_cells, emb, k=3, dim=64)


# ------------------------------- contrastive hard-negative mining

_HARDNEG_SQL = f"""
WITH vecs AS (
    SELECT vec_id, label, embedding::DOUBLE[] AS ev FROM embeddings
),
q AS (
    SELECT vec_id AS query_id, label AS q_label, ev AS qv
    FROM vecs WHERE vec_id % 25 = 0
),
scored AS (
    SELECT q.query_id, q.q_label,
           v.vec_id AS neg_id, v.label AS neg_label,
           {_COS.format(a="q.qv", b="v.ev")} AS sim
    FROM q JOIN vecs v
      ON v.vec_id <> q.query_id AND v.label <> q.q_label
)
SELECT query_id,
       CAST(q_label AS BIGINT) AS query_label,
       neg_id AS hard_negative_id,
       CAST(neg_label AS BIGINT) AS negative_label,
       ROUND(sim, 6) AS cosine_sim
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neg_id) AS rn
    FROM scored
)
WHERE rn <= 2
"""


@register(
    "hard_negative_pairs",
    _HARDNEG_SQL,
    doc="Contrastive hard-negative mining, EXACT form — the evaluation "
    "twin of hard_negative_pairs_ann (same role cosine_topk_bruteforce "
    "plays for the ann_* family): for each anchor vector, the 2 most-"
    "similar vectors with a DIFFERENT label, via broadcast theta-join "
    "over the full corpus. O(|anchors|*N) — ground truth for recall "
    "measurement on samples, NOT the production path; at corpus scale "
    "run hard_negative_pairs_ann (banded-LSH multiprobe candidates) "
    "and monitor it with hard_negative_recall_eval.",
)
def q_hard_negative_pairs(spark, sf_dir):
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        to_double_array(F.col("embedding")).alias("__qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        to_double_array(F.col("embedding")).alias("__cv"),
    )
    sim_expr = cosine_fixed("__qv", "__cv", 64)
    scored = c.join(
        F.broadcast(q),
        (F.col("neg_id") != F.col("query_id"))
        & (F.col("neg_label") != F.col("q_label")),
    ).select("query_id", "q_label", "neg_id", "neg_label", sim_expr.alias("__sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neg_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 2)
        .select(
            "query_id",
            F.col("q_label").cast("long").alias("query_label"),
            F.col("neg_id").alias("hard_negative_id"),
            F.col("neg_label").cast("long").alias("negative_label"),
            F.round(F.col("__sim"), 6).alias("cosine_sim"),
        )
    )


# ------------------------ ANN-backed hard-negative mining (scale path)

_HARDNEG_ANN_SQL = f"""
WITH planes AS (
    SELECT vec_id AS plane_id, embedding::DOUBLE[] AS hv
    FROM embeddings WHERE vec_id < 8
),
vecs AS (
    SELECT vec_id, label, embedding::DOUBLE[] AS ev FROM embeddings
),
buckets AS (
    SELECT v.vec_id,
           CAST(SUM(CASE WHEN list_dot_product(v.ev, h.hv) >= 0
                         THEN 1 << h.plane_id ELSE 0 END) AS BIGINT) AS bucket
    FROM vecs v, planes h
    GROUP BY v.vec_id
),
q0 AS (
    SELECT b.vec_id AS query_id, v.label AS q_label, b.bucket, v.ev AS qv
    FROM buckets b JOIN vecs v ON b.vec_id = v.vec_id
    WHERE b.vec_id % 25 = 0
),
q AS (
    SELECT query_id, q_label, qv,
           CASE WHEN i < 0 THEN bucket ELSE xor(bucket, 1 << i) END AS bucket
    FROM q0, unnest(range(-1, 8)) AS t(i)
),
c AS (
    SELECT b.vec_id AS neg_id, v.label AS neg_label, b.bucket, v.ev AS cv
    FROM buckets b JOIN vecs v ON b.vec_id = v.vec_id
),
scored AS (
    SELECT q.query_id, q.q_label, c.neg_id, c.neg_label,
           {_COS.format(a="q.qv", b="c.cv")} AS sim
    FROM q JOIN c ON q.bucket = c.bucket
    WHERE q.query_id <> c.neg_id AND q.q_label <> c.neg_label
)
SELECT query_id,
       CAST(q_label AS BIGINT) AS query_label,
       neg_id AS hard_negative_id,
       CAST(neg_label AS BIGINT) AS negative_label,
       ROUND(sim, 6) AS cosine_sim
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neg_id) AS rn
    FROM scored
)
WHERE rn <= 2
"""


@register(
    "hard_negative_pairs_ann",
    _HARDNEG_ANN_SQL,
    doc="Contrastive hard-negative mining, ANN form — the 100 TB path. "
    "Candidates come from the banded-LSH multiprobe index (the "
    "ann_multiprobe_topk machinery: 8 sign bits, each anchor probes "
    "its own bucket plus all 8 Hamming-distance-1 buckets), the "
    "label-inequality filter is applied ON CANDIDATES, and exact "
    "cosine re-ranks only bucket-local survivors — the full-corpus "
    "theta-join of the exact twin never happens. The anchor fan-out "
    "(x9) touches only the small query side; the corpus index is one "
    "map-only pass. A pair can match through at most one probe "
    "bucket (corpus single-assigned), so no dedup stage is needed. "
    "Recall vs the exact twin is measured by hard_negative_recall_eval.",
)
def q_hard_negative_pairs_ann(spark, sf_dir):
    from pyspark.sql.window import Window

    from ecom_churn_lakehouse_spark.similarity.ann import multiprobe_buckets

    emb = load_table(spark, sf_dir, "embeddings")
    planes = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("plane_id"), "embedding"
    )
    buckets = hyperplane_lsh_buckets(emb, planes)
    labeled = emb.select(
        "vec_id", "label", to_double_array(F.col("embedding")).alias("__v")
    )
    q = (
        multiprobe_buckets(buckets.filter(F.col("vec_id") % 25 == 0), n_bits=8)
        .join(labeled, on="vec_id")
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("q_label"),
            "bucket",
            F.col("__v").alias("__qv"),
        )
    )
    c = buckets.join(labeled, on="vec_id").select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        "bucket",
        F.col("__v").alias("__cv"),
    )
    sim = cosine_fixed("__qv", "__cv", 64)
    scored = (
        q.join(c, on="bucket")
        .filter(
            (F.col("query_id") != F.col("neg_id"))
            & (F.col("q_label") != F.col("neg_label"))
        )
        .select("query_id", "q_label", "neg_id", "neg_label", sim.alias("__sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neg_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 2)
        .select(
            "query_id",
            F.col("q_label").cast("long").alias("query_label"),
            F.col("neg_id").alias("hard_negative_id"),
            F.col("neg_label").cast("long").alias("negative_label"),
            F.round(F.col("__sim"), 6).alias("cosine_sim"),
        )
    )


# ------------------- hard-negative ANN recall vs exact ground truth

_HARDNEG_RECALL_SQL = f"""
WITH planes AS (
    SELECT vec_id AS plane_id, embedding::DOUBLE[] AS hv
    FROM embeddings WHERE vec_id < 8
),
vecs AS (
    SELECT vec_id, label, embedding::DOUBLE[] AS ev FROM embeddings
),
buckets AS (
    SELECT v.vec_id,
           CAST(SUM(CASE WHEN list_dot_product(v.ev, h.hv) >= 0
                         THEN 1 << h.plane_id ELSE 0 END) AS BIGINT) AS bucket
    FROM vecs v, planes h
    GROUP BY v.vec_id
),
q0 AS (
    SELECT b.vec_id AS query_id, v.label AS q_label, b.bucket, v.ev AS qv
    FROM buckets b JOIN vecs v ON b.vec_id = v.vec_id
    WHERE b.vec_id % 25 = 0
),
qp AS (
    SELECT query_id, q_label, qv,
           CASE WHEN i < 0 THEN bucket ELSE xor(bucket, 1 << i) END AS bucket
    FROM q0, unnest(range(-1, 8)) AS t(i)
),
c AS (
    SELECT b.vec_id AS neg_id, v.label AS neg_label, b.bucket, v.ev AS cv
    FROM buckets b JOIN vecs v ON b.vec_id = v.vec_id
),
ann_top AS (
    SELECT query_id, neg_id FROM (
        SELECT q.query_id, c.neg_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.query_id
                   ORDER BY {_COS.format(a="q.qv", b="c.cv")} DESC, c.neg_id
               ) AS rn
        FROM qp q JOIN c ON q.bucket = c.bucket
        WHERE q.query_id <> c.neg_id AND q.q_label <> c.neg_label
    ) WHERE rn <= 2
),
exact_top AS (
    SELECT query_id, neg_id FROM (
        SELECT q.query_id, v.vec_id AS neg_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.query_id
                   ORDER BY {_COS.format(a="q.qv", b="v.ev")} DESC, v.vec_id
               ) AS rn
        FROM q0 q, vecs v
        WHERE q.query_id <> v.vec_id AND q.q_label <> v.label
    ) WHERE rn <= 2
)
SELECT e.query_id AS query_id,
       CAST(COUNT(a.neg_id) AS BIGINT) AS n_hit,
       ROUND(COUNT(a.neg_id) / 2.0, 6) AS recall_at_2
FROM exact_top e
LEFT JOIN ann_top a
  ON a.query_id = e.query_id AND a.neg_id = e.neg_id
GROUP BY e.query_id
"""


@register(
    "hard_negative_recall_eval",
    _HARDNEG_RECALL_SQL,
    doc="Hard-negative mining quality gate: recall@2 of the ANN-backed "
    "miner (hard_negative_pairs_ann) against the exact broadcast "
    "theta-join ground truth (hard_negative_pairs), per anchor — the "
    "number that says whether the LSH index may replace the exact "
    "scan in production. Scale: the ANN side is bucket-local; the "
    "exact side runs over the SAME small anchor sample only (the "
    "periodic-monitoring shape of ann_recall_eval). Counts are "
    "integers, recall is n/2 under ROUND — oracle hash exact.",
)
def q_hard_negative_recall_eval(spark, sf_dir):
    ann = q_hard_negative_pairs_ann(spark, sf_dir).select(
        "query_id",
        F.col("hard_negative_id").alias("neg_id"),
        F.lit(1).alias("hit"),
    )
    exact = q_hard_negative_pairs(spark, sf_dir).select(
        "query_id", F.col("hard_negative_id").alias("neg_id")
    )
    return (
        exact.join(ann, on=["query_id", "neg_id"], how="left")
        .groupBy("query_id")
        .agg(
            F.count("hit").cast("long").alias("n_hit"),
            F.round(F.count("hit") / 2.0, 6).alias("recall_at_2"),
        )
    )


# -------------------------- int8 scalar quantization (index compression)

_QUANT_SQL = """
WITH vecs AS (
    SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
),
scaled AS (
    SELECT vec_id, ev,
           list_max(list_transform(ev, x -> abs(x))) / 127.0 AS scale
    FROM vecs
),
deq AS (
    SELECT vec_id, ev, scale,
           list_transform(ev, x -> round(x / scale) * scale) AS dv
    FROM scaled
)
SELECT vec_id,
       CAST(len(ev) AS INTEGER) AS dim,
       ROUND(scale, 6) AS scale,
       ROUND(list_sum(list_transform(range(1, len(ev) + 1),
                 i -> (ev[i] - dv[i]) * (ev[i] - dv[i]))) / len(ev), 6)
           AS mse,
       ROUND(list_dot_product(ev, dv)
             / (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(dv, dv))),
             6) AS cos_recon
FROM deq
"""


@register(
    "embedding_int8_quantization",
    _QUANT_SQL,
    doc="Int8 scalar quantization of the embedding column — the index-"
    "compression step a 100 TB ANN deployment runs before storing "
    "vectors (4x smaller than float32, 8x than float64): per-vector "
    "symmetric scale = max|x|/127 (max maps to +/-127, no clipping), "
    "quantize-dequantize, then the two quality numbers that decide "
    "the bits budget: reconstruction MSE and cosine(original, "
    "dequantized). All native array expressions — map-only, zero "
    "shuffle, codegen-resident; both engines round half-away-from-"
    "zero so the quantized grid is identical.",
)
def q_embedding_int8_quantization(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    v = to_double_array(F.col("embedding"))
    base = emb.select("vec_id", v.alias("__v")).withColumn(
        "__scale",
        F.array_max(F.transform(F.col("__v"), lambda x: F.abs(x))) / 127.0,
    )
    dv = F.transform(
        F.col("__v"), lambda x: F.round(x / F.col("__scale"), 0) * F.col("__scale")
    )
    withd = base.withColumn("__dv", dv)
    err_sq = F.zip_with(
        F.col("__v"), F.col("__dv"), lambda a, b: (a - b) * (a - b)
    )
    cos = cosine_fixed("__v", "__dv", 64)
    return withd.select(
        "vec_id",
        F.size("__v").cast("int").alias("dim"),
        F.round(F.col("__scale"), 6).alias("scale"),
        F.round(
            F.aggregate(err_sq, F.lit(0.0), lambda acc, x: acc + x)
            / F.size("__v"),
            6,
        ).alias("mse"),
        F.round(cos, 6).alias("cos_recon"),
    )


# ----------------------- k-means: two full Lloyd rounds, oracle-exact

_KM_DIST = (
    "list_sum(list_transform(range(1, len(e.ev) + 1),"
    " i -> (e.ev[i] - c.centroid[i]) * (e.ev[i] - c.centroid[i])))"
)


def _km_assign_sql(cent_cte: str, out_cte: str) -> str:
    """One Lloyd assignment step: argmin squared distance, (d, cid)
    struct-min tie-break."""
    return f"""{out_cte} AS (
    SELECT vec_id, (min({{'d': d, 'cid': cid}})).cid AS cid
    FROM (
        SELECT e.vec_id, c.cid, {_KM_DIST} AS d
        FROM vecs e, {cent_cte} c
    )
    GROUP BY vec_id
)"""


def _km_update_sql(assign_cte: str, out_cte: str) -> str:
    """One Lloyd update step: decimal-exact element-wise centroid means."""
    return f"""{out_cte} AS (
    SELECT cid, list(c ORDER BY pos) AS centroid
    FROM (
        SELECT a.cid, u.i AS pos,
               CAST(SUM(CAST(e.ev[u.i] AS DECIMAL(20,9))) AS DOUBLE)
                   / COUNT(*) AS c
        FROM {assign_cte} a
        JOIN vecs e ON e.vec_id = a.vec_id,
        unnest(range(1, len(e.ev) + 1)) AS u(i)
        GROUP BY a.cid, u.i
    )
    GROUP BY cid
)"""


# Seed bound keeps k FIXED as the corpus grows: k-means has a fixed
# cluster count by definition — seeding from an unbounded id predicate
# would grow k (and the broadcast + assignment work) linearly with the
# data, turning the two-round cost quadratic under scale-up (this was
# exactly the 10x-probe artifact the round-3 review flagged).
_KM_SEED_BOUND = 1500

_KMEANS_SQL = f"""
WITH vecs AS (
    SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
),
cent0 AS (
    SELECT vec_id AS cid, ev AS centroid FROM vecs
    WHERE vec_id % 37 = 1 AND vec_id < {_KM_SEED_BOUND}
),
{_km_assign_sql("cent0", "assign1")},
{_km_update_sql("assign1", "cent1")},
{_km_assign_sql("cent1", "assign2")},
scored AS (
    SELECT e.vec_id, c.cid, {_KM_DIST} AS d
    FROM vecs e, cent1 c
),
best AS (
    SELECT vec_id,
           (min({{'d': d, 'cid': cid}})).cid AS cid,
           (min({{'d': d, 'cid': cid}})).d AS d
    FROM scored GROUP BY vec_id
)
SELECT cid AS centroid_id,
       CAST(COUNT(*) AS BIGINT) AS n_assigned,
       ROUND(CAST(SUM(CAST(d AS DECIMAL(28,12))) AS DOUBLE), 6)
           AS inertia
FROM best
GROUP BY cid
"""


@register(
    "kmeans_two_rounds",
    _KMEANS_SQL,
    doc="Two full Lloyd's k-means rounds over the embedding corpus "
    "(assignment -> decimal-exact centroid update -> re-assignment), "
    "emitting per-centroid membership and inertia — the iterative-ML "
    "pattern done Spark-right: each round is two aggregations "
    "(broadcast centroids for assignment, label x dim cells for the "
    "update; both map-side combinable), NO driver-side loops over "
    "data, centroids are k x dim scalars. Cross-engine exactness "
    "machinery: centroid means accumulate in DECIMAL (order-free), "
    "argmin ties break on (d, cid) struct-min, inertia sums per-term "
    "DECIMAL — the compounded two-round drift stays identically zero, "
    "which is how PageRank/CC earned their oracles too. At 100 TB "
    "additional rounds rescan the (cached) vector table; the oracle "
    "pins two rounds so the chained-CTE SQL stays tractable.",
)
def q_kmeans_two_rounds(spark, sf_dir):
    from pyspark.sql.window import Window  # noqa: F401

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", to_double_array(F.col("embedding")).alias("ev"))
    cent0 = vecs.filter(
        (F.col("vec_id") % 37 == 1) & (F.col("vec_id") < _KM_SEED_BOUND)
    ).select(F.col("vec_id").alias("cid"), F.col("ev").alias("centroid"))

    def assign(cent):
        diff_sq = F.zip_with(
            F.col("ev"), F.col("centroid"), lambda a, b: (a - b) * (a - b)
        )
        scored = vecs.crossJoin(F.broadcast(cent)).select(
            "vec_id",
            "cid",
            F.aggregate(diff_sq, F.lit(0.0), lambda acc, x: acc + x).alias("d"),
        )
        return scored.groupBy("vec_id").agg(
            F.min(F.struct(F.col("d").alias("d"), F.col("cid").alias("cid")))
            .alias("__m")
        ).select("vec_id", F.col("__m.cid").alias("cid"), F.col("__m.d").alias("d"))

    def update(assigned):
        ex = assigned.join(vecs, on="vec_id").select(
            "cid", F.posexplode("ev").alias("pos0", "v")
        )
        cells = ex.groupBy("cid", "pos0").agg(
            (
                F.sum(F.col("v").cast("decimal(20,9)")).cast("double")
                / F.count("*")
            ).alias("c")
        )
        return cells.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos0", "c"))),
                lambda x: x.getField("c"),
            ).alias("centroid")
        )

    assign1 = assign(cent0).select("vec_id", "cid")
    cent1 = update(assign1)
    best = assign(cent1)
    return best.groupBy(F.col("cid").alias("centroid_id")).agg(
        F.count("*").cast("long").alias("n_assigned"),
        F.round(
            F.sum(F.col("d").cast("decimal(28,12)")).cast("double"), 6
        ).alias("inertia"),
    )


# ---------------- matryoshka / truncated-dimension retrieval eval

_MATRYOSHKA_DIM = 16

_MATRYOSHKA_SQL = f"""
WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
tvecs AS (SELECT vec_id, ev[1:{_MATRYOSHKA_DIM}] AS tv FROM vecs),
q AS (SELECT vec_id AS query_id, ev AS qv FROM vecs WHERE vec_id % 50 = 0),
tq AS (SELECT vec_id AS query_id, tv AS qv FROM tvecs WHERE vec_id % 50 = 0),
fullk AS (
    SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.query_id
                   ORDER BY {_COS.format(a="q.qv", b="c.ev")} DESC, c.vec_id
               ) AS rn
        FROM q, vecs c WHERE q.query_id <> c.vec_id
    ) WHERE rn <= 3
),
trunck AS (
    SELECT query_id, neighbor_id FROM (
        SELECT tq.query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                   PARTITION BY tq.query_id
                   ORDER BY {_COS.format(a="tq.qv", b="c.tv")} DESC, c.vec_id
               ) AS rn
        FROM tq, tvecs c WHERE tq.query_id <> c.vec_id
    ) WHERE rn <= 3
)
SELECT f.query_id,
       CAST(COUNT(t.neighbor_id) AS INTEGER) AS n_overlap,
       ROUND(CAST(COUNT(t.neighbor_id) AS DOUBLE) / 3, 6) AS recall_at_3
FROM fullk f
LEFT JOIN trunck t
  ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
GROUP BY f.query_id
"""


@register(
    "matryoshka_recall_eval",
    _MATRYOSHKA_SQL,
    doc=f"Truncated-dimension retrieval eval (the matryoshka-embedding "
    f"question): exact cosine top-3 with the full 64-dim vectors vs "
    f"top-3 with only the first {_MATRYOSHKA_DIM} dims, per-query "
    "overlap count and recall@3 — the measurement that decides whether "
    "a prefix-truncated index (4x smaller, 4x faster dot products) is "
    "good enough to serve. Both passes are broadcast-query brute force "
    "over the same corpus scan (similarity/ann.py::brute_force_topk); "
    "the overlap join touches 3 rows per query. At 100 TB the "
    "truncated pass IS the cheap filter stage of a two-stage retrieval "
    "cascade, re-ranked by the full-dim pass on candidates only.",
)
def q_matryoshka_recall_eval(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    trunc = emb.select(
        "vec_id", F.slice(F.col("embedding"), 1, _MATRYOSHKA_DIM).alias("embedding")
    )
    tqueries = trunc.filter(F.col("vec_id") % 50 == 0)
    fullk = brute_force_topk(queries, emb, k=3, dim=64).select("query_id", "neighbor_id")
    trunck = brute_force_topk(
        tqueries, trunc, k=3, dim=_MATRYOSHKA_DIM
    ).select(
        F.col("query_id").alias("__tq"), F.col("neighbor_id").alias("__tn")
    )
    return (
        fullk.join(
            trunck,
            (F.col("query_id") == F.col("__tq"))
            & (F.col("neighbor_id") == F.col("__tn")),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("__tn").cast("int").alias("n_overlap"))
        .select(
            "query_id",
            "n_overlap",
            F.round(F.col("n_overlap").cast("double") / 3, 6).alias(
                "recall_at_3"
            ),
        )
    )


# -------- power-iteration PCA (top principal direction, exact integers)

_PI_SCALE = 1_000_000  # input / loading quantization: micros


def _pi_sql() -> str:
    """Two power-iteration steps over the Gram matrix, all exact.

    Inputs quantize ONCE to integer micros (round-half-away, audited
    boundary-safe on the fixture); every cross-row sum is int128
    (HUGEINT / DECIMAL(38,0)) so partial-aggregation order cannot
    perturb a bit; each normalization is ONE engine-pinned double
    division. No float accumulations anywhere.
    """
    return f"""
WITH xi AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * {_PI_SCALE}, 0) AS BIGINT))
               AS q
    FROM embeddings
),
ex AS (
    SELECT vec_id, i AS pos, q[i] AS x
    FROM xi, unnest(range(1, len(q) + 1)) t(i)
),
s1 AS (SELECT vec_id, CAST(list_sum(q) AS BIGINT) AS s FROM xi),
y1 AS (
    SELECT ex.pos, SUM(CAST(ex.x AS HUGEINT) * s1.s) AS y
    FROM ex JOIN s1 ON ex.vec_id = s1.vec_id
    GROUP BY ex.pos
),
n1 AS (SELECT MAX(ABS(CAST(y AS DOUBLE))) AS nrm FROM y1),
q1 AS (
    SELECT pos,
           CAST(ROUND((CAST(y AS DOUBLE) / (SELECT nrm FROM n1))
                      * {_PI_SCALE}.0, 0) AS BIGINT) AS qv
    FROM y1
),
s2 AS (
    SELECT ex.vec_id, CAST(SUM(ex.x * q1.qv) AS BIGINT) AS s
    FROM ex JOIN q1 ON ex.pos = q1.pos
    GROUP BY ex.vec_id
),
y2 AS (
    SELECT ex.pos, SUM(CAST(ex.x AS HUGEINT) * s2.s) AS y
    FROM ex JOIN s2 ON ex.vec_id = s2.vec_id
    GROUP BY ex.pos
),
n2 AS (SELECT MAX(ABS(CAST(y AS DOUBLE))) AS nrm FROM y2)
SELECT CAST(pos - 1 AS INTEGER) AS dim_idx,
       CAST(ROUND((CAST(y AS DOUBLE) / (SELECT nrm FROM n2))
                  * {_PI_SCALE}.0, 0) AS BIGINT) AS loading_ppm
FROM y2
ORDER BY dim_idx
"""


@register(
    "embedding_power_iteration",
    _pi_sql(),
    doc="Top principal direction of the embedding matrix via two "
    "power-iteration steps on the Gram matrix (X^T X q, renormalized "
    "each step) — the distributed linear-algebra kernel behind PCA "
    "whitening / dominant-direction removal in embedding pipelines "
    "(ABTT 'all-but-the-top' preprocessing). Determinism design, per "
    "the copurchase_pagerank playbook: inputs quantize ONCE to "
    "integer micros, every cross-row reduction is an int128 sum "
    "(order-independent, bit-exact at any parallelism), and each "
    "renormalization is one engine-pinned double division + one "
    "audited half-away rounding. Per iteration the plan is one "
    "per-row fold (x·q, sequential in-array — no cross-row floats) "
    "and one groupBy(pos) with 64 groups; at 100 TB the 64-group agg "
    "is map-side combined so the shuffle carries partitions x 64 "
    "rows, and q ships as a broadcast — the classic 1-D "
    "tall-skinny-matrix reduction.",
)
def q_embedding_power_iteration(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    # quantize ONCE and checkpoint: the exploded (vec_id, pos, x)
    # relation feeds four joins (s1, y1, s2, y2) — without the barrier
    # each consumer re-reads and re-quantizes the embedding table
    # (12 scans in the audited plan), which at 100 TB means reading
    # the corpus twelve times; the checkpoint is the same size as the
    # input and is the per-iteration-lineage move copurchase_pagerank
    # makes.
    xi = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * _PI_SCALE, 0).cast("long"),
        ).alias("q"),
    ).localCheckpoint(eager=False)
    ex = xi.select(
        "vec_id", F.posexplode("q").alias("pos0", "x")
    ).select("vec_id", (F.col("pos0") + 1).alias("pos"), "x")
    s1 = xi.select(
        "vec_id",
        F.aggregate("q", F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "s"
        ),
    )
    def _yn(srel):
        y = (
            ex.join(srel, on="vec_id")
            .groupBy("pos")
            .agg(
                F.sum(
                    F.col("x").cast("decimal(19,0)") * F.col("s")
                )
                .cast("decimal(38,0)")
                .alias("y")
            )
        )
        return y.join(
            F.broadcast(
                y.agg(
                    F.max(F.abs(F.col("y").cast("double"))).alias("nrm")
                )
            )
        )
    q1 = _yn(s1).select(
        "pos",
        F.round(
            (F.col("y").cast("double") / F.col("nrm")) * float(_PI_SCALE),
            0,
        )
        .cast("long")
        .alias("qv"),
    )
    s2 = (
        ex.join(F.broadcast(q1), on="pos")
        .groupBy("vec_id")
        .agg(F.sum(F.col("x") * F.col("qv")).cast("long").alias("s"))
    )
    return (
        _yn(s2)
        .select(
            (F.col("pos") - 1).cast("int").alias("dim_idx"),
            F.round(
                (F.col("y").cast("double") / F.col("nrm"))
                * float(_PI_SCALE),
                0,
            )
            .cast("long")
            .alias("loading_ppm"),
        )
        .orderBy("dim_idx")
    )


# ------------------------------------- hybrid retrieval (fixed-point RRF)

_RRF_K = 60
_RRF_TOPN = 50

_RRF_SQL = rf"""
WITH lex AS (
    SELECT doc_id,
           CAST(length(list_filter(regexp_extract_all(text, '\S+'),
                                   x -> x = 'spark')) +
                length(list_filter(regexp_extract_all(text, '\S+'),
                                   x -> x = 'join')) +
                length(list_filter(regexp_extract_all(text, '\S+'),
                                   x -> x = 'window')) AS BIGINT) AS tf_sum
    FROM documents
),
lex_rank AS (
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY tf_sum DESC, doc_id) AS BIGINT)
               AS lex_rank
    FROM lex WHERE tf_sum > 0
    QUALIFY lex_rank <= {_RRF_TOPN}
),
qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
dense AS (
    SELECT e.vec_id AS doc_id,
           {_COS.format(a="e.embedding::DOUBLE[]", b="q.v")} AS sim
    FROM embeddings e CROSS JOIN qv q
    WHERE e.vec_id <> 0
),
dense_rank_t AS (
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS BIGINT)
               AS dense_rank
    FROM dense
    QUALIFY dense_rank <= {_RRF_TOPN}
),
fused AS (
    SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
           l.lex_rank, d.dense_rank,
           COALESCE(1000000 // ({_RRF_K} + l.lex_rank), 0)
           + COALESCE(1000000 // ({_RRF_K} + d.dense_rank), 0)
               AS rrf_micro
    FROM lex_rank l FULL OUTER JOIN dense_rank_t d ON l.doc_id = d.doc_id
)
SELECT doc_id, lex_rank, dense_rank, CAST(rrf_micro AS BIGINT) AS rrf_micro
FROM fused
ORDER BY rrf_micro DESC, doc_id
LIMIT 20
"""


@register(
    "rrf_hybrid_retrieval",
    _RRF_SQL,
    doc="Hybrid retrieval via fixed-point reciprocal-rank fusion: a "
    "lexical top-50 (exact-integer term-frequency score over the "
    "fixed term set, deterministic doc_id tie-break) and a dense "
    "top-50 (cosine against a fixed query vector — mul/add/sqrt "
    "only, all correctly-rounded IEEE so ranks are engine-stable; "
    "no libm-unstable ln on any ordering surface) fuse as "
    "sum(1e6 DIV (60 + rank)) — RRF in exact integer micros, so the "
    "fused ordering is hash-stable by construction. The full-outer "
    "join is |top-50| x 2 rows regardless of corpus size; at 100 TB "
    "each modality's top-k comes from its own index (BM25 posting "
    "pruning / ANN buckets) and fusion cost never grows with the "
    "corpus.",
)
def q_rrf_hybrid_retrieval(spark, sf_dir):
    from pyspark.sql.window import Window

    from ecom_churn_lakehouse_spark.functions.vectors import (
        dot,
        l2_norm,
        to_double_array,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")

    def _tf(term):
        # factory keeps the lambda unary — a default-arg capture makes
        # PySpark pass (element, index) and silently rebind the term
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    tf_sum = (_tf("spark") + _tf("join") + _tf("window")).cast("long")
    lex = (
        docs.select("doc_id", tf_sum.alias("tf_sum"))
        .filter(F.col("tf_sum") > 0)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("tf_sum"), "doc_id"))
            .cast("long")
            .alias("lex_rank"),
        )
        .filter(F.col("lex_rank") <= _RRF_TOPN)
    )
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        to_double_array(F.col("embedding")).alias("v")
    )
    cand = emb.filter(F.col("vec_id") != 0).select(
        F.col("vec_id").alias("doc_id"),
        to_double_array(F.col("embedding")).alias("e"),
    )
    dense = cand.join(F.broadcast(qv)).select(
        "doc_id",
        cosine_fixed("e", "v", 64).alias("sim"),
    )
    dense_r = dense.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("sim"), "doc_id"))
        .cast("long")
        .alias("dense_rank"),
    ).filter(F.col("dense_rank") <= _RRF_TOPN)
    fused = lex.join(dense_r, on="doc_id", how="full_outer").select(
        "doc_id",
        "lex_rank",
        "dense_rank",
        (
            F.coalesce(
                F.expr(f"1000000 DIV ({_RRF_K} + lex_rank)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"1000000 DIV ({_RRF_K} + dense_rank)"), F.lit(0)
            )
        )
        .cast("long")
        .alias("rrf_micro"),
    )
    return fused.orderBy(F.desc("rrf_micro"), "doc_id").limit(20)


# --------------------------------- embedding dimension variance screen

_DIM_VAR_SQL = """
WITH ex AS (
    SELECT CAST(i - 1 AS INTEGER) AS dim_idx,
           CAST(FLOOR(embedding[i]::DOUBLE * 1000000) AS BIGINT) AS v
    FROM embeddings,
         unnest(generate_series(1, len(embedding))) AS t(i)
)
SELECT dim_idx,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(v) AS BIGINT) AS sum_micro,
       CAST((CAST(COUNT(*) AS HUGEINT)
             * CAST(SUM(CAST(v AS DECIMAL(18,0)) * CAST(v AS DECIMAL(18,0)))
                    AS HUGEINT)
             - CAST(SUM(v) AS HUGEINT) * CAST(SUM(v) AS HUGEINT))
            // (CAST(COUNT(*) AS HUGEINT) * CAST(COUNT(*) AS HUGEINT))
            AS BIGINT) AS var_micro2
FROM ex
GROUP BY dim_idx
"""


@register(
    "embedding_dim_variance_screen",
    _DIM_VAR_SQL,
    doc="Dead/collapsed-dimension screen over the embedding column: "
    "per dimension, the population variance of the 6-dp-quantized "
    "values in exact integer micro^2 — near-zero variance flags a "
    "dimension the encoder never uses (wasted index width; "
    "matryoshka truncation candidates). Quantization is "
    "FLOOR(value*1e6) — float->double widening and the multiply are "
    "exact IEEE and FLOOR is engine-identical, unlike double->int "
    "CAST (Spark truncates, DuckDB rounds). The variance numerator "
    "n*sum(v^2) - sum(v)^2 is >= 0 by Cauchy-Schwarz, so the floor "
    "division is truncation-safe; products stay under DECIMAL(38) "
    "via tight operand precisions. One posexplode + one 64-group "
    "aggregate: map-side combinable, shuffle carries 64 rows of "
    "partials per partition at ANY corpus size.",
)
def q_embedding_dim_variance_screen(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        F.posexplode(F.col("embedding")).alias("dim_idx", "val")
    ).select(
        F.col("dim_idx").cast("int").alias("dim_idx"),
        F.floor(F.col("val").cast("double") * 1000000)
        .cast("long")
        .alias("v"),
    )
    return ex.groupBy("dim_idx").agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.sum("v").cast("long").alias("sum_micro"),
        F.expr(
            "CAST((CAST(COUNT(*) AS DECIMAL(10,0))"
            " * CAST(SUM(CAST(v AS DECIMAL(18,0)) * CAST(v AS DECIMAL(18,0)))"
            "        AS DECIMAL(27,0))"
            " - CAST(SUM(v) AS DECIMAL(18,0)) * CAST(SUM(v) AS DECIMAL(18,0)))"
            " DIV (CAST(COUNT(*) AS DECIMAL(10,0))"
            "      * CAST(COUNT(*) AS DECIMAL(10,0))) AS BIGINT)"
        ).alias("var_micro2"),
    )


# ----------------------------------- product quantization (PQ) codes

_PQ_M = 8  # subspaces
_PQ_DIMS = 8  # dims per subspace
_PQ_K = 4  # centroids per subspace (seed vectors vec_id < 4)


def _pq_sql() -> str:
    d2 = " + ".join(
        f"(v.ev[m*{_PQ_DIMS}+{j+1}] - c.cv[m*{_PQ_DIMS}+{j+1}])"
        f" * (v.ev[m*{_PQ_DIMS}+{j+1}] - c.cv[m*{_PQ_DIMS}+{j+1}])"
        for j in range(_PQ_DIMS)
    )
    return f"""
WITH c AS (
    SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
    FROM embeddings WHERE vec_id < {_PQ_K}
),
v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
sub AS (
    SELECT v.vec_id, c.cid, t.m, {d2} AS d2
    FROM v CROSS JOIN c
    CROSS JOIN (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS m) t
),
pick AS (
    SELECT vec_id, m, cid, d2,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m
                              ORDER BY d2, cid) AS rn
    FROM sub
)
SELECT vec_id,
       CAST(SUM(CAST(cid AS BIGINT) * (CAST(1 AS BIGINT) << (2 * m)))
            AS BIGINT) AS pq_code,
       CAST(SUM(CAST(FLOOR(d2 * 1000000) AS BIGINT)) AS BIGINT)
           AS q_err_micro
FROM pick WHERE rn = 1
GROUP BY vec_id
"""


@register(
    "embedding_pq_codes",
    _pq_sql(),
    doc="Product quantization: the 64-dim embedding splits into 8 "
    "subspaces of 8 dims, each assigned to its nearest of 4 "
    "deterministic seed centroids (L2^2, ties to the smaller "
    "centroid id — raw distances are row-local IEEE mul/add, "
    "engine-identical, the cosine_topk argument), packing the "
    "vector into a 16-bit code (2 bits x 8 subspaces via integer "
    "shifts) plus a FLOOR-quantized integer reconstruction error. "
    "This is the memory side of IVF-PQ: 64 floats -> 2 bytes, the "
    "compression that lets a 100 TB vector corpus serve from RAM; "
    "ann_ivf_topk is the routing side. Codebooks broadcast "
    "(K x M tiny), assignment is map-only per vector, and the "
    "per-vec argmin windows partition by (vec_id, m) — the shuffle "
    "carries M rows per vector, never the corpus squared.",
)
def q_embedding_pq_codes(spark, sf_dir):
    from pyspark.sql.window import Window

    from ecom_churn_lakehouse_spark.functions.vectors import to_double_array

    emb = load_table(spark, sf_dir, "embeddings")
    c = emb.filter(F.col("vec_id") < _PQ_K).select(
        F.col("vec_id").alias("cid"),
        to_double_array(F.col("embedding")).alias("cv"),
    )
    v = emb.select(
        "vec_id", to_double_array(F.col("embedding")).alias("ev")
    )
    sub = (
        v.crossJoin(F.broadcast(c))
        .withColumn(
            "m", F.explode(F.array(*[F.lit(m) for m in range(_PQ_M)]))
        )
    )
    idx = lambda j: (F.col("m") * _PQ_DIMS + j + 1).cast("int")  # noqa: E731
    d2 = sum(
        (
            F.element_at("ev", idx(j)) - F.element_at("cv", idx(j))
        )
        * (F.element_at("ev", idx(j)) - F.element_at("cv", idx(j)))
        for j in range(_PQ_DIMS)
    )
    scored = sub.select("vec_id", "cid", "m", d2.alias("d2"))
    w = Window.partitionBy("vec_id", "m").orderBy("d2", "cid")
    best = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return best.groupBy("vec_id").agg(
        F.sum(
            F.expr(
                "CAST(cid AS BIGINT)"
                " * shiftleft(CAST(1 AS BIGINT), CAST(2 * m AS INT))"
            )
        )
        .cast("long")
        .alias("pq_code"),
        F.sum(F.floor(F.col("d2") * 1000000).cast("long"))
        .cast("long")
        .alias("q_err_micro"),
    )


# --------------------------------------------- IVF-PQ composed pipeline

_IVFPQ_SHORTLIST = 10


def _ivfpq_sql() -> str:
    d2_code = " + ".join(
        f"(v.ev[t.m*{_PQ_DIMS}+{j+1}] - p.cv[t.m*{_PQ_DIMS}+{j+1}])"
        f" * (v.ev[t.m*{_PQ_DIMS}+{j+1}] - p.cv[t.m*{_PQ_DIMS}+{j+1}])"
        for j in range(_PQ_DIMS)
    )
    d2_adc = " + ".join(
        f"(cand.qv[k.m*{_PQ_DIMS}+{j+1}] - p.cv[k.m*{_PQ_DIMS}+{j+1}])"
        f" * (cand.qv[k.m*{_PQ_DIMS}+{j+1}] - p.cv[k.m*{_PQ_DIMS}+{j+1}])"
        for j in range(_PQ_DIMS)
    )
    return f"""
WITH cents AS (
    SELECT vec_id AS ccid, embedding::DOUBLE[] AS ccv
    FROM embeddings WHERE vec_id % 37 = 1
),
vecs AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
assigned AS (
    SELECT vec_id, bucket FROM (
        SELECT v.vec_id, c.ccid AS bucket,
               ROW_NUMBER() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY {_COS.format(a="v.ev", b="c.ccv")} DESC, c.ccid
               ) AS rn
        FROM vecs v, cents c
    ) WHERE rn = 1
),
pqc AS (
    SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
    FROM embeddings WHERE vec_id < {_PQ_K}
),
sub AS (
    SELECT v.vec_id, p.cid, t.m, {d2_code} AS d2
    FROM vecs v CROSS JOIN pqc p
    CROSS JOIN (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS m) t
),
codes AS (
    SELECT vec_id, m, cid FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                     ORDER BY d2, cid) AS rn
        FROM sub
    ) WHERE rn = 1
),
q AS (
    SELECT a.vec_id AS query_id, a.bucket, v.ev AS qv
    FROM assigned a JOIN vecs v ON a.vec_id = v.vec_id
    WHERE a.vec_id % 50 = 0
),
cand AS (
    SELECT q.query_id, a.vec_id AS neighbor_id, q.qv
    FROM q JOIN assigned a
      ON q.bucket = a.bucket AND a.vec_id <> q.query_id
),
adc AS (
    SELECT cand.query_id, cand.neighbor_id,
           CAST(SUM(CAST(FLOOR(({d2_adc}) * 1000000) AS BIGINT)) AS BIGINT)
               AS adc_micro
    FROM cand
    JOIN codes k ON cand.neighbor_id = k.vec_id
    JOIN pqc p ON k.cid = p.cid
    GROUP BY 1, 2
),
shortlist AS (
    SELECT query_id, neighbor_id, adc_micro FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY adc_micro, neighbor_id) AS rn
        FROM adc
    ) WHERE rn <= {_IVFPQ_SHORTLIST}
),
rerank AS (
    SELECT s.query_id, s.neighbor_id, s.adc_micro,
           {_COS.format(a="qv.ev", b="nv.ev")} AS sim
    FROM shortlist s
    JOIN vecs qv ON s.query_id = qv.vec_id
    JOIN vecs nv ON s.neighbor_id = nv.vec_id
)
SELECT query_id, neighbor_id, ROUND(sim, 6) AS cosine_sim, adc_micro
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
    FROM rerank
)
WHERE rn <= 3
"""


@register(
    "ann_ivfpq_topk",
    _ivfpq_sql(),
    doc="The full modern ANN serving pipeline composed end to end: "
    "IVF coarse routing (nearest of ~14 centroids, nprobe=1) -> "
    "asymmetric-distance (ADC) scoring of every in-cell candidate "
    "against the query using only the candidate's 2-bit-per-"
    "subspace PQ code (embedding_pq_codes' codebooks; per-subspace "
    "distances FLOOR-quantized to integer micros so the shortlist "
    "ordering is hash-stable) -> exact cosine re-rank of the "
    "ADC top-10 shortlist -> top-3. This is how a 100 TB vector "
    "store actually serves: full vectors touched only for "
    "|shortlist| rows per query, candidates scored from RAM-sized "
    "codes, routing via broadcast centroids; every join is "
    "bucket-local or broadcast.",
)
def q_ann_ivfpq_topk(spark, sf_dir):
    from pyspark.sql.window import Window

    from ecom_churn_lakehouse_spark.functions.vectors import (
        dot,
        l2_norm,
        to_double_array,
    )
    from ecom_churn_lakehouse_spark.similarity.ann import ivf_assign_cells

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 37 == 1).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = ivf_assign_cells(emb, centroids, dim=64)

    vecs = emb.select(
        "vec_id", to_double_array(F.col("embedding")).alias("ev")
    )
    pqc = emb.filter(F.col("vec_id") < _PQ_K).select(
        F.col("vec_id").alias("cid"),
        to_double_array(F.col("embedding")).alias("cv"),
    )
    sub = (
        vecs.crossJoin(F.broadcast(pqc))
        .withColumn(
            "m", F.explode(F.array(*[F.lit(m) for m in range(_PQ_M)]))
        )
    )
    idx = lambda j: (F.col("m") * _PQ_DIMS + j + 1).cast("int")  # noqa: E731
    d2_code = sum(
        (F.element_at("ev", idx(j)) - F.element_at("cv", idx(j)))
        * (F.element_at("ev", idx(j)) - F.element_at("cv", idx(j)))
        for j in range(_PQ_DIMS)
    )
    w_code = Window.partitionBy("vec_id", "m").orderBy("d2", "cid")
    codes = (
        sub.select("vec_id", "cid", "m", d2_code.alias("d2"))
        .withColumn("rn", F.row_number().over(w_code))
        .filter(F.col("rn") == 1)
        .select("vec_id", "m", "cid")
    )

    q = (
        assigned.filter(F.col("vec_id") % 50 == 0)
        .join(vecs, on="vec_id")
        .select(
            F.col("vec_id").alias("query_id"),
            "bucket",
            F.col("ev").alias("qv"),
        )
    )
    cand = q.join(
        assigned.select(F.col("vec_id").alias("neighbor_id"), "bucket"),
        on="bucket",
    ).filter(F.col("neighbor_id") != F.col("query_id"))

    kidx = lambda j: (F.col("m") * _PQ_DIMS + j + 1).cast("int")  # noqa: E731
    d2_adc = sum(
        (F.element_at("qv", kidx(j)) - F.element_at("cv", kidx(j)))
        * (F.element_at("qv", kidx(j)) - F.element_at("cv", kidx(j)))
        for j in range(_PQ_DIMS)
    )
    adc = (
        cand.join(
            codes.withColumnRenamed("vec_id", "neighbor_id"),
            on="neighbor_id",
        )
        .join(F.broadcast(pqc), on="cid")
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.sum(F.floor(d2_adc * 1000000).cast("long"))
            .cast("long")
            .alias("adc_micro")
        )
    )
    w_short = Window.partitionBy("query_id").orderBy(
        "adc_micro", "neighbor_id"
    )
    shortlist = (
        adc.withColumn("rn", F.row_number().over(w_short))
        .filter(F.col("rn") <= _IVFPQ_SHORTLIST)
        .drop("rn")
    )
    qv = vecs.select(
        F.col("vec_id").alias("query_id"), F.col("ev").alias("q_ev")
    )
    nv = vecs.select(
        F.col("vec_id").alias("neighbor_id"), F.col("ev").alias("n_ev")
    )
    rerank = (
        shortlist.join(qv, on="query_id")
        .join(nv, on="neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "adc_micro",
            cosine_fixed("q_ev", "n_ev", 64).alias("sim"),
        )
    )
    w_final = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), "neighbor_id"
    )
    return (
        rerank.withColumn("rn", F.row_number().over(w_final))
        .filter(F.col("rn") <= 3)
        .select(
            "query_id",
            "neighbor_id",
            F.round("sim", 6).alias("cosine_sim"),
            "adc_micro",
        )
    )


# ----------------------------------- nprobe -> recall tuning curve

_CURVE_MAX_NPROBE = 4


def _nprobe_curve_sql() -> str:
    return f"""
WITH cents AS (
    SELECT vec_id AS ccid, embedding::DOUBLE[] AS ccv
    FROM embeddings WHERE vec_id % 37 = 1
),
vecs AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
corpus_cells AS (
    SELECT vec_id, bucket FROM (
        SELECT v.vec_id, c.ccid AS bucket,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                   ORDER BY {_COS.format(a="v.ev", b="c.ccv")} DESC, c.ccid
               ) AS rn
        FROM vecs v, cents c
    ) WHERE rn = 1
),
qcells AS (
    SELECT vec_id AS query_id, ccid AS bucket, rn AS cell_rank FROM (
        SELECT v.vec_id, c.ccid,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                   ORDER BY {_COS.format(a="v.ev", b="c.ccv")} DESC, c.ccid
               ) AS rn
        FROM vecs v, cents c WHERE v.vec_id % 50 = 0
    ) WHERE rn <= {_CURVE_MAX_NPROBE}
),
cand AS (
    SELECT q.query_id, cc.vec_id AS neighbor_id,
           MIN(q.cell_rank) AS mr
    FROM qcells q JOIN corpus_cells cc ON q.bucket = cc.bucket
    WHERE cc.vec_id <> q.query_id
    GROUP BY 1, 2
),
scored AS (
    SELECT c.query_id, c.neighbor_id, c.mr,
           {_COS.format(a="qv.ev", b="nv.ev")} AS sim
    FROM cand c
    JOIN vecs qv ON c.query_id = qv.vec_id
    JOIN vecs nv ON c.neighbor_id = nv.vec_id
),
fan AS (
    SELECT s.*, t.nprobe FROM scored s
    CROSS JOIN (SELECT unnest(generate_series(1, {_CURVE_MAX_NPROBE}))
                AS nprobe) t
    WHERE s.mr <= t.nprobe
),
ann AS (
    SELECT nprobe, query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY nprobe, query_id
                                     ORDER BY sim DESC, neighbor_id) AS rn
        FROM fan
    ) WHERE rn <= 3
),
exact AS (
    SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY {_COS.format(a="q.ev", b="v.ev")} DESC, v.vec_id
               ) AS rn
        FROM vecs q JOIN vecs v ON q.vec_id <> v.vec_id
        WHERE q.vec_id % 50 = 0
    ) WHERE rn <= 3
),
nq AS (SELECT COUNT(DISTINCT query_id) AS n FROM exact)
SELECT a.nprobe,
       CAST(COUNT(e.query_id) AS BIGINT) AS n_hits,
       CAST(COUNT(e.query_id) * 1000000 // (3 * q.n) AS BIGINT)
           AS recall_ppm
FROM ann a
LEFT JOIN exact e
  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
CROSS JOIN nq q
GROUP BY a.nprobe, q.n
"""


@register(
    "ann_nprobe_recall_curve",
    _nprobe_curve_sql(),
    doc="The IVF tuning curve a search team actually reads: recall@3 "
    "vs nprobe (1..4) in one pass — candidates carry their MINIMUM "
    "reaching cell rank, so the whole curve is a fan-out filter over "
    "ONE candidate generation, never a re-search per setting "
    "(neardup_threshold_curve's pattern applied to ANN). Ground "
    "truth is brute force over the same sampled query set; recall "
    "is exact integer ppm. The knee of this curve is where you stop "
    "paying probe cost for recall you do not get.",
)
def q_ann_nprobe_recall_curve(spark, sf_dir):
    from pyspark.sql.window import Window

    from ecom_churn_lakehouse_spark.similarity.ann import (
        brute_force_topk,
        ivf_assign_cells,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 37 == 1).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    corpus_cells = ivf_assign_cells(emb, centroids, dim=64)
    queries_df = emb.filter(F.col("vec_id") % 50 == 0)
    # Ranked query cells: ivf_assign_cells emits a query's cells in
    # rank order but drops the rank itself, so recompute the ranked
    # assignment here (same cosine + ccid tie-break spelling).
    from ecom_churn_lakehouse_spark.functions.vectors import (
        dot,
        l2_norm,
        to_double_array,
    )

    cents = centroids.select(
        F.col("centroid_id").alias("ccid"),
        to_double_array(F.col("embedding")).alias("ccv"),
    )
    qv = queries_df.select(
        F.col("vec_id").alias("query_id"),
        to_double_array(F.col("embedding")).alias("qev"),
    )
    sim_qc = cosine_fixed("qev", "ccv", 64)
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc("__sim"), "ccid"
    )
    qcells_ranked = (
        qv.crossJoin(F.broadcast(cents))
        .select("query_id", "ccid", sim_qc.alias("__sim"))
        .withColumn("cell_rank", F.row_number().over(w_rank))
        .filter(F.col("cell_rank") <= _CURVE_MAX_NPROBE)
        .select("query_id", F.col("ccid").alias("bucket"), "cell_rank")
    )
    cand = (
        qcells_ranked.join(
            corpus_cells.select(
                F.col("vec_id").alias("neighbor_id"), "bucket"
            ),
            on="bucket",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.min("cell_rank").alias("mr"))
    )
    vecs = emb.select(
        "vec_id", to_double_array(F.col("embedding")).alias("ev")
    )
    scored = (
        cand.join(
            vecs.select(
                F.col("vec_id").alias("query_id"),
                F.col("ev").alias("q_ev"),
            ),
            on="query_id",
        )
        .join(
            vecs.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("ev").alias("n_ev"),
            ),
            on="neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            "mr",
            cosine_fixed("q_ev", "n_ev", 64).alias("sim"),
        )
    )
    fan = scored.withColumn(
        "nprobe",
        F.explode(
            F.array(*[F.lit(n) for n in range(1, _CURVE_MAX_NPROBE + 1)])
        ),
    ).filter(F.col("mr") <= F.col("nprobe"))
    w_ann = Window.partitionBy("nprobe", "query_id").orderBy(
        F.desc("sim"), "neighbor_id"
    )
    ann = (
        fan.withColumn("rn", F.row_number().over(w_ann))
        .filter(F.col("rn") <= 3)
        .select("nprobe", "query_id", "neighbor_id")
    )
    exact = brute_force_topk(queries_df, emb, k=3, dim=64).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    nq = exact.agg(
        F.countDistinct("query_id").alias("n")
    )
    return (
        ann.join(exact, on=["query_id", "neighbor_id"], how="left")
        .join(F.broadcast(nq))
        .groupBy("nprobe", "n")
        .agg(F.count("hit").cast("long").alias("n_hits"))
        .select(
            "nprobe",
            "n_hits",
            F.expr("n_hits * 1000000 DIV (3 * n)")
            .cast("long")
            .alias("recall_ppm"),
        )
    )


# --------------------------------------------- filtered vector search

_FILTERED_TOPK_SQL = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
    FROM embeddings WHERE vec_id % 50 = 0
),
c AS (
    SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv, label
    FROM embeddings
),
pre AS (
    SELECT query_id, neighbor_id, ROUND(sim, 6) AS cosine_sim
    FROM (
        SELECT query_id, neighbor_id, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rn
        FROM (
            SELECT query_id, neighbor_id,
                   {_COS.format(a="qv", b="cv")} AS sim
            FROM q, c
            WHERE query_id <> neighbor_id AND c.label = 1
        )
    ) WHERE rn <= 5
),
post AS (
    SELECT query_id, neighbor_id, ROUND(sim, 6) AS cosine_sim
    FROM (
        SELECT query_id, neighbor_id, sim, label,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rn
        FROM (
            SELECT query_id, neighbor_id, label,
                   {_COS.format(a="qv", b="cv")} AS sim
            FROM q, c
            WHERE query_id <> neighbor_id
        )
    ) WHERE rn <= 5 AND label = 1
)
SELECT 'prefilter' AS strategy, query_id, neighbor_id, cosine_sim FROM pre
UNION ALL
SELECT 'postfilter' AS strategy, query_id, neighbor_id, cosine_sim FROM post
"""


@register(
    "ann_filtered_topk",
    _FILTERED_TOPK_SQL,
    doc="Filtered vector search, both strategies side by side: "
    "PREFILTER restricts the corpus to the metadata predicate "
    "(label=1) before exact top-5 — full recall, search space shrinks "
    "with selectivity; POSTFILTER takes unfiltered top-5 then applies "
    "the predicate — cheaper per query against a prebuilt unfiltered "
    "index but loses neighbors (every postfilter row also appears "
    "under prefilter; the deficit IS the recall loss, asserted in "
    "tests). The trade every filtered-ANN serving layer tunes; on the "
    "IVF path the same predicate pushes into the cell scan.",
)
def q_ann_filtered_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 50 == 0)
    pre = brute_force_topk(
        queries_df, emb.filter(F.col("label") == 1), k=5, dim=64
    ).select(
        F.lit("prefilter").alias("strategy"), "query_id", "neighbor_id", "cosine_sim"
    )
    labels = emb.select(F.col("vec_id").alias("neighbor_id"), "label")
    post = (
        brute_force_topk(queries_df, emb, k=5, dim=64)
        .join(F.broadcast(labels), "neighbor_id")
        .filter(F.col("label") == 1)
        .select(
            F.lit("postfilter").alias("strategy"),
            "query_id",
            "neighbor_id",
            "cosine_sim",
        )
    )
    return pre.unionByName(post)


# ------------------------------------------------- embedding drift

#: Old cohort = first half of vec_ids, new cohort = second half.
#: Values quantized per element to micro BEFORE any aggregation
#: (float sums are order-dependent; integer sums are exact), and the
#: per-dimension mean uses an OFFSET so the integer division never
#: sees a negative numerator (DIV truncates toward zero on Spark but
#: floors on DuckDB — identical only for non-negative operands).
_DRIFT_SQL = """
WITH bounds AS (
    SELECT MIN(vec_id) + (MAX(vec_id) - MIN(vec_id)) // 2 AS mid
    FROM embeddings
),
vals AS (
    SELECT CASE WHEN e.vec_id <= b.mid THEN 'old' ELSE 'new' END AS cohort,
           generate_subscripts(e.embedding, 1) - 1 AS dim_idx,
           CAST(FLOOR(CAST(unnest(e.embedding) AS DOUBLE) * 1000000)
                AS BIGINT) AS v_micro
    FROM embeddings e
    CROSS JOIN bounds b
),
agg AS (
    SELECT cohort, CAST(dim_idx AS INTEGER) AS dim_idx,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(v_micro) AS BIGINT) AS sum_micro,
           (CAST(SUM(v_micro) AS BIGINT) + CAST(COUNT(*) AS BIGINT) * 1000000)
               // CAST(COUNT(*) AS BIGINT) - 1000000 AS mean_micro
    FROM vals GROUP BY cohort, dim_idx
)
SELECT o.dim_idx,
       o.n AS n_old, n.n AS n_new,
       CAST(o.mean_micro AS BIGINT) AS mean_old_micro,
       CAST(n.mean_micro AS BIGINT) AS mean_new_micro,
       CAST(n.mean_micro - o.mean_micro AS BIGINT) AS shift_micro
FROM (SELECT * FROM agg WHERE cohort = 'old') o
JOIN (SELECT * FROM agg WHERE cohort = 'new') n USING (dim_idx)
"""


@register(
    "embedding_drift_by_dim",
    _DRIFT_SQL,
    doc="Embedding drift monitor: per-dimension mean shift between an "
    "old and a new vector cohort, the serving-side check that a "
    "re-embedded corpus or upgraded encoder has not moved the space "
    "under a frozen index. Every value is floor-quantized to micro "
    "per ELEMENT before aggregation (float sums are partial-order "
    "dependent; integer sums are exact), and the mean division is "
    "offset-shifted so no negative numerator ever meets DIV. One "
    "dims-wide explode with map-side-combinable partial aggregation — "
    "the shuffle carries 64 rows per cohort, not vectors.",
)
def q_embedding_drift_by_dim(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    mid = emb.agg(
        (F.min("vec_id") + F.expr("(MAX(vec_id) - MIN(vec_id)) DIV 2")).alias("mid")
    )
    vals = (
        emb.crossJoin(F.broadcast(mid))
        .select(
            F.when(F.col("vec_id") <= F.col("mid"), "old").otherwise("new").alias("cohort"),
            F.posexplode(F.col("embedding")),
        )
        .select(
            "cohort",
            F.col("pos").cast("int").alias("dim_idx"),
            F.floor(F.col("col").cast("double") * 1000000).cast("long").alias("v_micro"),
        )
    )
    agg = vals.groupBy("cohort", "dim_idx").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v_micro").cast("long").alias("sum_micro"),
    ).withColumn(
        "mean_micro",
        F.expr("(sum_micro + n * 1000000) DIV n - 1000000"),
    )
    old = agg.filter(F.col("cohort") == "old").select(
        "dim_idx",
        F.col("n").alias("n_old"),
        F.col("mean_micro").alias("mean_old_micro"),
    )
    new = agg.filter(F.col("cohort") == "new").select(
        "dim_idx",
        F.col("n").alias("n_new"),
        F.col("mean_micro").alias("mean_new_micro"),
    )
    return old.join(new, "dim_idx").select(
        "dim_idx",
        "n_old",
        "n_new",
        F.col("mean_old_micro").cast("long").alias("mean_old_micro"),
        F.col("mean_new_micro").cast("long").alias("mean_new_micro"),
        (F.col("mean_new_micro") - F.col("mean_old_micro"))
        .cast("long")
        .alias("shift_micro"),
    )


# ------------------------------------------- retrieval diversity filter

_DIVERSITY_SIM_PPM = 950_000

_DIVERSITY_SQL = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
    FROM embeddings WHERE vec_id % 50 = 0
),
c AS (
    SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings
),
topk AS (
    SELECT query_id, neighbor_id, cv, ROUND(sim, 6) AS cosine_sim,
           CAST(rn AS INTEGER) AS rank
    FROM (
        SELECT query_id, neighbor_id, cv, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rn
        FROM (
            SELECT query_id, neighbor_id, cv,
                   {_COS.format(a="qv", b="cv")} AS sim
            FROM q, c WHERE query_id <> neighbor_id
        )
    ) WHERE rn <= 10
),
flagged AS (
    SELECT a.query_id, a.neighbor_id, a.cosine_sim, a.rank,
           MAX(CASE WHEN CAST(FLOOR({_COS.format(a="a.cv", b="b.cv")} * 1000000)
                             AS BIGINT) >= {_DIVERSITY_SIM_PPM}
                    THEN b.rank END) IS NOT NULL AS is_redundant
    FROM topk a
    LEFT JOIN topk b
      ON b.query_id = a.query_id AND b.rank < a.rank
    GROUP BY a.query_id, a.neighbor_id, a.cosine_sim, a.rank
)
SELECT query_id, neighbor_id, cosine_sim, rank, is_redundant
FROM flagged
"""


@register(
    "ann_topk_diversity_filter",
    _DIVERSITY_SQL,
    doc="Retrieval diversity (MMR-lite): within each query's exact "
    "top-10 list, a neighbor is flagged redundant when it is nearly "
    "identical (cosine >= 0.95, floor-quantized ppm) to a HIGHER-"
    "ranked neighbor of the same list — the dedup a RAG context "
    "builder applies so the prompt is not filled with copies of one "
    "passage. The pairwise check is k^2-bounded WITHIN each 10-item "
    "list (never across the corpus), so the filter costs nothing at "
    "any scale once top-k lists exist.",
)
def q_ann_topk_diversity_filter(spark, sf_dir):
    from pyspark.sql.window import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 50 == 0)
    topk = brute_force_topk(queries_df, emb, k=10, dim=64).withColumn(
        "rank",
        F.row_number()
        .over(W.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), "neighbor_id"))
        .cast("int"),
    )
    vecs = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        to_double_array(F.col("embedding")).alias("nv"),
    )
    topk_v = topk.join(F.broadcast(vecs), "neighbor_id")
    a = topk_v.select(
        "query_id",
        F.col("neighbor_id").alias("a_id"),
        F.col("cosine_sim").alias("a_sim"),
        F.col("rank").alias("a_rank"),
        F.col("nv").alias("a_v"),
    )
    b = topk_v.select(
        F.col("query_id").alias("b_qid"),
        F.col("rank").alias("b_rank"),
        F.col("nv").alias("b_v"),
    )
    pair_sim_ppm = F.floor(
        cosine_fixed("a_v", "b_v", 64) * 1000000
    ).cast("long")
    flagged = (
        a.join(
            b,
            (F.col("query_id") == F.col("b_qid")) & (F.col("b_rank") < F.col("a_rank")),
            "left",
        )
        .groupBy("query_id", "a_id", "a_sim", "a_rank")
        .agg(
            F.max(
                F.when(pair_sim_ppm >= _DIVERSITY_SIM_PPM, F.col("b_rank"))
            ).isNotNull().alias("is_redundant")
        )
    )
    return flagged.select(
        "query_id",
        F.col("a_id").alias("neighbor_id"),
        F.col("a_sim").alias("cosine_sim"),
        F.col("a_rank").alias("rank"),
        "is_redundant",
    )


# ---------------------------------------------------------------------------
# Round 9 fourth wave: grid-bucketed epsilon-range join (spatial join).
# ---------------------------------------------------------------------------

#: Epsilon in micro units of the quantized coordinate space. Cell
#: size == eps, so any pair within eps lives in the same or an
#: adjacent cell (the classic fixed-grid spatial-join guarantee).
_GRID_EPS_MICRO = 20_000
#: Shift applied before integer cell division: coordinates are
#: quantized to micro then shifted non-negative, because Spark DIV
#: truncates toward zero while floor semantics are what the grid
#: needs — on non-negative ints the two agree (house rule).
_GRID_SHIFT = 1_000_000

#: floor-quantize dim k of the float vector to exact int64 micro.
#: Two spellings, one per engine: DuckDB list indexing is 1-based
#: bracket syntax, Spark's 1-based accessor is element_at (Spark's
#: bracket is 0-based — a silent off-by-one dimension if shared).
_GRID_Q = (
    "CAST(FLOOR(CAST({v}[{k}] AS DOUBLE) * 1000000.0) AS BIGINT)"
    f" + {_GRID_SHIFT}"
)
_GRID_Q_SPARK = (
    "CAST(FLOOR(CAST(element_at({v}, {k}) AS DOUBLE) * 1000000.0) AS BIGINT)"
    f" + {_GRID_SHIFT}"
)

_GRID_RANGE_SQL = f"""
WITH pts AS (
    SELECT vec_id,
           {_GRID_Q.format(v='embedding', k=1)} AS qx,
           {_GRID_Q.format(v='embedding', k=2)} AS qy
    FROM embeddings
),
pairs AS (
    SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
           (a.qx - b.qx) * (a.qx - b.qx)
           + (a.qy - b.qy) * (a.qy - b.qy) AS dist_sq
    FROM pts a JOIN pts b
      ON a.vec_id < b.vec_id
     AND (a.qx - b.qx) * (a.qx - b.qx)
         + (a.qy - b.qy) * (a.qy - b.qy)
         <= {_GRID_EPS_MICRO} * {_GRID_EPS_MICRO}
)
SELECT vec_id_a, vec_id_b, dist_sq
FROM pairs
"""


@register(
    "embedding_grid_range_join",
    _GRID_RANGE_SQL,
    doc="Epsilon-range join via fixed-grid spatial bucketing — the "
    "candidate-generation pattern the similarity tier lacked (LSH "
    "buckets by hash collision, IVF by centroid; the grid buckets "
    "by GEOMETRY, giving an exact no-false-negative guarantee in "
    "low dimension): points quantize their first two embedding dims "
    "to exact int64 micro (float->double widening and the single "
    "multiply are correctly rounded IEEE ops, floor is exact, so "
    "both engines derive identical integers), each point homes to "
    "one eps-sized cell, the probe side replicates to its 3x3 cell "
    "neighborhood, and candidates join on CELL EQUALITY — a plain "
    "shuffle-hash equi-join, never an all-pairs product. The exact "
    "integer distance filter then keeps true eps-neighbors; because "
    "cell size == eps, adjacency covers every qualifying pair "
    "exactly once (home cell is unique per pair). The oracle is the "
    "brute-force quadratic spelling — tractable at test SF, while "
    "the Spark plan stays near-linear in points times density. "
    "Scale: grid cell occupancy bounds the join fan-out; skewed "
    "dense cells are the documented knob (shrink eps or sub-salt "
    "the hot cell, the LSH mega-bucket discipline).",
)
def q_embedding_grid_range_join(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.expr(_GRID_Q_SPARK.format(v="embedding", k=1)).alias("qx"),
        F.expr(_GRID_Q_SPARK.format(v="embedding", k=2)).alias("qy"),
    )
    home = pts.select(
        "vec_id",
        "qx",
        "qy",
        (F.col("qx") / _GRID_EPS_MICRO).cast("long").alias("cx"),
        (F.col("qy") / _GRID_EPS_MICRO).cast("long").alias("cy"),
    )
    offsets = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
        "dx INT, dy INT",
    )
    probe = (
        pts.crossJoin(F.broadcast(offsets))
        .select(
            F.col("vec_id").alias("vec_id_b"),
            F.col("qx").alias("qxb"),
            F.col("qy").alias("qyb"),
            (F.col("qx") / _GRID_EPS_MICRO).cast("long")
            .__add__(F.col("dx"))
            .alias("cx"),
            (F.col("qy") / _GRID_EPS_MICRO).cast("long")
            .__add__(F.col("dy"))
            .alias("cy"),
        )
    )
    cand = home.join(probe, on=["cx", "cy"]).filter(
        F.col("vec_id") < F.col("vec_id_b")
    )
    dist_sq = (F.col("qx") - F.col("qxb")) * (
        F.col("qx") - F.col("qxb")
    ) + (F.col("qy") - F.col("qyb")) * (F.col("qy") - F.col("qyb"))
    return (
        cand.withColumn("dist_sq", dist_sq)
        .filter(
            F.col("dist_sq") <= _GRID_EPS_MICRO * _GRID_EPS_MICRO
        )
        .select(
            F.col("vec_id").alias("vec_id_a"),
            F.col("vec_id_b"),
            "dist_sq",
        )
    )


# ---------------------------------------------------------------------------
# Round 9 fourth wave: simplified silhouette over label centroids.
# ---------------------------------------------------------------------------

#: Simplified silhouette s = (sqrt(b) - sqrt(a)) / max(sqrt(a),
#: sqrt(b)) from the own-centroid (a) and nearest-other-centroid (b)
#: squared distances — one shared-IEEE spelling, floored milli.
_SIL_MILLI = (
    "CAST(FLOOR((sqrt(b) - sqrt(a))"
    " / GREATEST(sqrt(a), sqrt(b)) * 1000.0) AS BIGINT)"
)

_SILHOUETTE_SQL = f"""
WITH ex AS (
    SELECT label, i AS pos, CAST(embedding[i] AS DOUBLE) AS v
    FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
),
cent AS (
    SELECT label AS c_label, pos,
           CAST(SUM(CAST(v AS DECIMAL(20,9))) AS DOUBLE) / COUNT(*) AS c
    FROM ex GROUP BY label, pos
),
cent_arr AS (
    SELECT c_label, list(c ORDER BY pos) AS centroid
    FROM cent GROUP BY c_label
),
dists AS (
    SELECT e.vec_id, e.label, c.c_label,
           list_sum(list_transform(range(1, len(e.embedding) + 1),
               i -> (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i])
                  * (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i]))) AS d
    FROM embeddings e, cent_arr c
),
ab AS (
    SELECT vec_id, label,
           MAX(CASE WHEN c_label = label THEN d END) AS a,
           MIN(CASE WHEN c_label <> label THEN d END) AS b
    FROM dists GROUP BY vec_id, label
),
scored AS (
    SELECT label, {_SIL_MILLI} AS s_milli FROM ab
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(SUM(s_milli) AS BIGINT) AS s_sum_milli,
       CAST(SUM(CASE WHEN s_milli >= 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_well_placed,
       CAST(SUM(CASE WHEN s_milli < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_misplaced
FROM scored GROUP BY label ORDER BY label
"""


@register(
    "label_silhouette_screen",
    _SILHOUETTE_SQL,
    doc="Simplified silhouette over the label clustering (Hruschka et "
    "al.'s centroid-based silhouette — a(i)/b(i) against centroids "
    "instead of all-pairs member distances, which is what makes the "
    "metric LINEAR in points instead of quadratic and is the "
    "standard large-scale spelling): per label the silhouette mass "
    "(sum of per-point floored-milli scores; the mean is "
    "s_sum/n in exact integers on the reader's side), the "
    "well-placed count, and the misplaced count (s < 0 <=> the "
    "point sits closer to another label's centroid — the same "
    "points label_centroid_confusion counts off-diagonal, now "
    "graded by HOW badly). Completes the clustering tier with its "
    "quality metric (kmeans_two_rounds builds clusters, "
    "embedding_density_clusters finds them, this SCORES them). "
    "Exactness: DECIMAL-exact centroids, array-order-deterministic "
    "distance folds, one shared-IEEE silhouette spelling per point "
    "floored to milli, then pure integer aggregation. Scale: k "
    "broadcast centroids x N points — one scan, no shuffle beyond "
    "the k x dim centroid reduce.",
)
def q_label_silhouette_screen(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    v = to_double_array(F.col("embedding"))
    ex = emb.select("label", F.posexplode(v).alias("pos", "v"))
    cent = ex.groupBy(F.col("label").alias("c_label"), "pos").agg(
        (
            F.sum(F.col("v").cast("decimal(20,9)")).cast("double")
            / F.count("*")
        ).alias("c")
    )
    cent_arr = cent.groupBy("c_label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))),
            lambda x: x.getField("c"),
        ).alias("centroid")
    )
    diff_sq = F.zip_with(v, F.col("centroid"), lambda a, b: (a - b) * (a - b))
    dists = emb.crossJoin(F.broadcast(cent_arr)).select(
        "vec_id",
        "label",
        "c_label",
        F.aggregate(diff_sq, F.lit(0.0), lambda acc, x: acc + x).alias("d"),
    )
    ab = dists.groupBy("vec_id", "label").agg(
        F.max(
            F.when(F.col("c_label") == F.col("label"), F.col("d"))
        ).alias("a"),
        F.min(
            F.when(F.col("c_label") != F.col("label"), F.col("d"))
        ).alias("b"),
    )
    scored = ab.select("label", F.expr(_SIL_MILLI).alias("s_milli"))
    return (
        scored.groupBy(F.col("label").cast("long").alias("label"))
        .agg(
            F.count("*").cast("long").alias("n_vectors"),
            F.sum("s_milli").cast("long").alias("s_sum_milli"),
            F.sum(F.when(F.col("s_milli") >= 0, 1).otherwise(0))
            .cast("long")
            .alias("n_well_placed"),
            F.sum(F.when(F.col("s_milli") < 0, 1).otherwise(0))
            .cast("long")
            .alias("n_misplaced"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Round 9 fourth wave: grid-based density outlier factor (LOF-style).
# ---------------------------------------------------------------------------

_DOF_SQL = f"""
WITH pts AS (
    SELECT vec_id,
           {_GRID_Q.format(v='embedding', k=1)} AS qx,
           {_GRID_Q.format(v='embedding', k=2)} AS qy
    FROM embeddings
),
pairs AS (
    SELECT a.vec_id AS i, b.vec_id AS j
    FROM pts a JOIN pts b
      ON a.vec_id <> b.vec_id
     AND (a.qx - b.qx) * (a.qx - b.qx)
         + (a.qy - b.qy) * (a.qy - b.qy)
         <= {_GRID_EPS_MICRO} * {_GRID_EPS_MICRO}
),
dens AS (
    SELECT p.vec_id,
           CAST(COALESCE(COUNT(e.j), 0) AS BIGINT) AS n_eps
    FROM pts p LEFT JOIN pairs e ON e.i = p.vec_id
    GROUP BY p.vec_id
),
scored AS (
    SELECT d.vec_id, d.n_eps,
           CAST(SUM(dn.n_eps) AS BIGINT) AS neighbor_density_sum
    FROM dens d
    JOIN pairs e ON e.i = d.vec_id
    JOIN dens dn ON dn.vec_id = e.j
    GROUP BY d.vec_id, d.n_eps
)
SELECT d.vec_id, d.n_eps,
       s.neighbor_density_sum,
       CAST(s.neighbor_density_sum * 1000
            // (d.n_eps * d.n_eps) AS BIGINT) AS dof_milli,
       (d.n_eps = 0) AS isolated,
       (d.n_eps = 0 OR s.neighbor_density_sum * 2 > 3 * d.n_eps * d.n_eps)
           AS outlier
FROM dens d LEFT JOIN scored s ON s.vec_id = d.vec_id
"""


@register(
    "grid_density_outlier_factor",
    _DOF_SQL,
    doc="LOF-style density outlier factor over the exact grid "
    "epsilon-neighborhood (the Breunig-et-al idea — compare a "
    "point's local density to its NEIGHBORS' density, so dense and "
    "sparse regions are each judged locally — instantiated on the "
    "epsilon-count density the fixed-grid join already certifies "
    "exactly): dof = mean neighbor epsilon-count / own "
    "epsilon-count, in exact integer milli (sum*1000 DIV n^2); "
    "isolated points (no epsilon-neighbor) are flagged outright, "
    "and the outlier verdict dof > 1.5 is a cleared-denominator "
    "integer comparison (2*sum > 3*n^2). Pure integers end to end — "
    "the quantized grid coordinates make even the distance filter "
    "exact. Complements embedding_density_clusters (which keeps "
    "dense structure) with the opposite readout: what density "
    "leaves behind. Scale: inherits the grid join's cell-bounded "
    "candidate posture plus two neighbor-grain reduces; never "
    "all-pairs (the SQL spelling above is the oracle's brute-force "
    "twin, the Spark plan goes through the 3x3 cell join).",
)
def q_grid_density_outlier_factor(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.expr(_GRID_Q_SPARK.format(v="embedding", k=1)).alias("qx"),
        F.expr(_GRID_Q_SPARK.format(v="embedding", k=2)).alias("qy"),
    )
    home = pts.select(
        "vec_id",
        "qx",
        "qy",
        (F.col("qx") / _GRID_EPS_MICRO).cast("long").alias("cx"),
        (F.col("qy") / _GRID_EPS_MICRO).cast("long").alias("cy"),
    )
    offsets = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
        "dx INT, dy INT",
    )
    probe = pts.crossJoin(F.broadcast(offsets)).select(
        F.col("vec_id").alias("j"),
        F.col("qx").alias("qxb"),
        F.col("qy").alias("qyb"),
        ((F.col("qx") / _GRID_EPS_MICRO).cast("long") + F.col("dx")).alias(
            "cx"
        ),
        ((F.col("qy") / _GRID_EPS_MICRO).cast("long") + F.col("dy")).alias(
            "cy"
        ),
    )
    dist_sq = (F.col("qx") - F.col("qxb")) * (
        F.col("qx") - F.col("qxb")
    ) + (F.col("qy") - F.col("qyb")) * (F.col("qy") - F.col("qyb"))
    pairs = (
        home.join(probe, on=["cx", "cy"])
        .filter(
            (F.col("vec_id") != F.col("j"))
            & (dist_sq <= _GRID_EPS_MICRO * _GRID_EPS_MICRO)
        )
        .select(F.col("vec_id").alias("i"), "j")
        .localCheckpoint(eager=False)
    )
    dens = (
        pts.select("vec_id")
        .join(pairs, pts.vec_id == pairs.i, "left")
        .groupBy("vec_id")
        .agg(F.count("j").cast("long").alias("n_eps"))
    )
    scored = (
        dens.join(pairs, dens.vec_id == pairs.i)
        .join(
            dens.select(
                F.col("vec_id").alias("jv"),
                F.col("n_eps").alias("jn"),
            ),
            F.col("j") == F.col("jv"),
        )
        .groupBy("vec_id", "n_eps")
        .agg(F.sum("jn").cast("long").alias("neighbor_density_sum"))
        .select("vec_id", "neighbor_density_sum")
    )
    return dens.join(scored, on="vec_id", how="left").select(
        "vec_id",
        "n_eps",
        "neighbor_density_sum",
        F.expr(
            "CAST(neighbor_density_sum * 1000 DIV (n_eps * n_eps)"
            " AS BIGINT)"
        ).alias("dof_milli"),
        (F.col("n_eps") == 0).alias("isolated"),
        (
            (F.col("n_eps") == 0)
            | (
                F.col("neighbor_density_sum") * 2
                > 3 * F.col("n_eps") * F.col("n_eps")
            )
        ).alias("outlier"),
    )


# ---------------------------------------------------------------------------
# Round 10: exact kNN local outlier factor on grid-certified candidates.
# ---------------------------------------------------------------------------

#: Neighborhood size for the LOF k-distance / reachability algebra.
_LOF_K = 5
#: Epsilon is DENSITY-ADAPTIVE (constant expected ball occupancy):
#: eps(n) = isqrt(EPS0^2 * N0 // n), so n * eps^2 — and therefore the
#: candidate work PER POINT — is constant at any corpus size (the
#: grid-join doc's "shrink eps as density grows" knob, implemented
#: rather than documented: a fixed eps measured SUPERLINEAR at the
#: K=30 probe, ratio 63.5, because occupancy grows with n). At the
#: reference density (N0=500 points, the sf0.01 fixture) eps is
#: 40_000 micro, where >= 80% of points carry >= _LOF_K
#: eps-neighbors; constant occupancy keeps that certified fraction
#: stable as n grows (sf0.1: n=2000 -> eps=20_000, same n*eps^2).
#: Both engines derive eps exactly: Python math.isqrt on the Spark
#: side, the isqrt idiom over the same integer on the oracle side.
_LOF_EPS0 = 40_000
_LOF_N0 = 500
_LOF_EPS_NUM = _LOF_EPS0 * _LOF_EPS0 * _LOF_N0
#: {K} * 1e9 as a single literal so both engines parse one BIGINT
#: (Spark would overflow INT on 5 * 1000000000 under ANSI).
_LOF_LRD_SCALE = _LOF_K * 1_000_000_000

#: Exact integer floor-sqrt (the mixture/EOQ isqrt idiom): correctly
#: rounded SQRT + two-term boundary correction — bit-identical across
#: engines, so distances live on the int-micro floor grid.
_LOF_ISQRT = (
    "(CAST(FLOOR(SQRT(CAST({n} AS DOUBLE))) AS BIGINT)"
    " - CASE WHEN CAST(FLOOR(SQRT(CAST({n} AS DOUBLE))) AS BIGINT)"
    "          * CAST(FLOOR(SQRT(CAST({n} AS DOUBLE))) AS BIGINT) > {n}"
    "        THEN 1 ELSE 0 END"
    " + CASE WHEN (CAST(FLOOR(SQRT(CAST({n} AS DOUBLE))) AS BIGINT) + 1)"
    "          * (CAST(FLOOR(SQRT(CAST({n} AS DOUBLE))) AS BIGINT) + 1)"
    "          <= {n}"
    "        THEN 1 ELSE 0 END)"
)

_LOF_SQL = f"""
WITH pts AS (
    SELECT vec_id,
           {_GRID_Q.format(v='embedding', k=1)} AS qx,
           {_GRID_Q.format(v='embedding', k=2)} AS qy
    FROM embeddings
),
epsv AS (
    SELECT {_LOF_ISQRT.format(n='eps_sq_arg')} AS eps
    FROM (
        SELECT CAST({_LOF_EPS_NUM} AS BIGINT) // COUNT(*) AS eps_sq_arg
        FROM pts
    ) nn
),
cand AS (
    SELECT pa, pb, {_LOF_ISQRT.format(n='dist_sq')} AS d
    FROM (
        SELECT a.vec_id AS pa, b.vec_id AS pb,
               (a.qx - b.qx) * (a.qx - b.qx)
               + (a.qy - b.qy) * (a.qy - b.qy) AS dist_sq,
               e.eps
        FROM pts a JOIN pts b ON a.vec_id <> b.vec_id
        CROSS JOIN epsv e
    ) raw
    WHERE dist_sq <= eps * eps
),
kd AS (
    SELECT pa, CAST(MAX(d) AS BIGINT) AS kdist_micro
    FROM (
        SELECT pa, pb, d,
               ROW_NUMBER() OVER (PARTITION BY pa ORDER BY d, pb) AS rk
        FROM cand
    ) r
    WHERE rk <= {_LOF_K}
    GROUP BY pa HAVING COUNT(*) = {_LOF_K}
),
candc AS (
    SELECT c.pa, c.pb, c.d
    FROM cand c
    JOIN kd ka ON ka.pa = c.pa
    JOIN kd kb ON kb.pa = c.pb
),
nc AS (
    SELECT pa, pb, d FROM (
        SELECT pa, pb, d,
               ROW_NUMBER() OVER (PARTITION BY pa ORDER BY d, pb) AS rk
        FROM candc
    ) r
    WHERE rk <= {_LOF_K}
),
cert2 AS (SELECT pa FROM nc GROUP BY pa HAVING COUNT(*) = {_LOF_K}),
reach AS (
    SELECT n.pa, n.pb, GREATEST(ko.kdist_micro, n.d) AS r
    FROM nc n
    JOIN cert2 c2 ON c2.pa = n.pa
    JOIN kd ko ON ko.pa = n.pb
),
lrd AS (
    SELECT pa,
           CAST({_LOF_LRD_SCALE}
                // GREATEST(CAST(SUM(r) AS BIGINT), 1) AS BIGINT)
               AS lrd_ppb
    FROM reach GROUP BY pa
),
scored AS (
    SELECT n.pa,
           CAST(SUM(lo.lrd_ppb) AS BIGINT) AS sum_lrd_nb
    FROM nc n
    JOIN cert2 c2 ON c2.pa = n.pa
    LEFT JOIN lrd lo ON lo.pa = n.pb
    GROUP BY n.pa
    HAVING COUNT(lo.lrd_ppb) = {_LOF_K}
)
SELECT s.pa AS vec_id,
       k1.kdist_micro,
       l.lrd_ppb,
       CAST((s.sum_lrd_nb // {_LOF_K}) * 1000
            // GREATEST(l.lrd_ppb, 1) AS BIGINT) AS lof_milli
FROM scored s
JOIN lrd l ON l.pa = s.pa
JOIN kd k1 ON k1.pa = s.pa
"""


def _lof_pipeline(spark, pts, eps):
    """Exact-kNN LOF over a (vec_id, qx, qy) int-micro point frame.

    Candidate generation is the fixed-grid spatial join (cell size ==
    eps, 3x3 probe replication, cell-equality join — never all-pairs);
    everything downstream is exact integer algebra on the candidate
    edges, so the Spark result is bit-identical to the brute-force
    oracle for every certified point:

    - ``kd``: k-distance per point over ALL eps-neighbors (row_number
      kNN, id tie-break; points with < k eps-neighbors drop out —
      their k-distance is NOT certified by the grid).
    - ``nc``: the k nearest neighbors among certified points (so each
      referenced neighbor has a defined k-distance).
    - reach-dist r(p,o) = max(kdist(o), d(p,o)) as exact micro ints;
      lrd(p) = K*1e9 DIV sum(r); LOF(p) = (mean neighbor lrd) DIV
      lrd(p), milli grain — LOF is only emitted where all K
      neighbors are themselves lrd-scored, so every term is defined
      (the certification cascade is 2 levels deep and closed, never
      iterative).
    """
    offsets = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
        "dx INT, dy INT",
    )
    home = pts.select(
        F.col("vec_id").alias("pa"),
        "qx",
        "qy",
        (F.col("qx") / eps).cast("long").alias("cx"),
        (F.col("qy") / eps).cast("long").alias("cy"),
    )
    probe = (
        pts.crossJoin(F.broadcast(offsets))
        .select(
            F.col("vec_id").alias("pb"),
            F.col("qx").alias("qxb"),
            F.col("qy").alias("qyb"),
            ((F.col("qx") / eps).cast("long") + F.col("dx")).alias("cx"),
            ((F.col("qy") / eps).cast("long") + F.col("dy")).alias("cy"),
        )
    )
    dist_sq = (F.col("qx") - F.col("qxb")) * (F.col("qx") - F.col("qxb")) + (
        F.col("qy") - F.col("qyb")
    ) * (F.col("qy") - F.col("qyb"))
    cand = (
        home.join(probe, on=["cx", "cy"])
        .filter(F.col("pa") != F.col("pb"))
        .withColumn("dist_sq", dist_sq)
        .filter(F.col("dist_sq") <= F.lit(eps).cast("long") * eps)
        .select(
            "pa",
            "pb",
            F.expr(_LOF_ISQRT.format(n="dist_sq")).alias("d"),
        )
        # The candidate edge frame feeds kd, candc, nc, reach and the
        # two scoring joins — without a lineage barrier the grid join
        # re-executes per consumer (measured: 42 scans in the physical
        # plan, ~21 of them the same subtree).
        .localCheckpoint(eager=False)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("pa").orderBy("d", "pb")
    kd = (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _LOF_K)
        .groupBy("pa")
        .agg(
            F.max("d").cast("long").alias("kdist_micro"),
            F.count("*").alias("n_k"),
        )
        .filter(F.col("n_k") == _LOF_K)
        .drop("n_k")
    )
    candc = (
        cand.join(kd.select("pa"), on="pa")
        .join(
            kd.select(F.col("pa").alias("pb")),
            on="pb",
        )
        .select("pa", "pb", "d")
    )
    nc = (
        candc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _LOF_K)
        .select("pa", "pb", "d")
        .localCheckpoint(eager=False)  # reused by cert2/reach/scored
    )
    cert2 = nc.groupBy("pa").agg(F.count("*").alias("n")).filter(
        F.col("n") == _LOF_K
    ).select("pa")
    reach = (
        nc.join(cert2, on="pa")
        .join(
            kd.select(
                F.col("pa").alias("pb"),
                F.col("kdist_micro").alias("kd_o"),
            ),
            on="pb",
        )
        .select("pa", "pb", F.greatest("kd_o", "d").alias("r"))
    )
    lrd = reach.groupBy("pa").agg(
        F.expr(
            f"CAST({_LOF_LRD_SCALE} DIV GREATEST(CAST(SUM(r) AS BIGINT), 1)"
            " AS BIGINT)"
        ).alias("lrd_ppb")
    )
    scored = (
        nc.join(cert2, on="pa")
        .join(
            lrd.select(
                F.col("pa").alias("pb"), F.col("lrd_ppb").alias("lrd_o")
            ),
            on="pb",
            how="left",
        )
        .groupBy("pa")
        .agg(
            F.sum("lrd_o").cast("long").alias("sum_lrd_nb"),
            F.count("lrd_o").alias("n_scored"),
        )
        .filter(F.col("n_scored") == _LOF_K)
        .select("pa", "sum_lrd_nb")
    )
    return (
        scored.join(lrd, on="pa")
        .join(kd, on="pa")
        .select(
            F.col("pa").alias("vec_id"),
            "kdist_micro",
            "lrd_ppb",
            F.expr(
                f"CAST((sum_lrd_nb DIV {_LOF_K}) * 1000"
                " DIV GREATEST(lrd_ppb, 1) AS BIGINT)"
            ).alias("lof_milli"),
        )
    )


@register(
    "knn_lof_scores",
    _LOF_SQL,
    doc="Exact k-NN Local Outlier Factor (Breunig et al. 2000) over "
    "the embedding projection, composed from certified grid "
    "candidates (VERDICT r9 directive #3): the eps-grid spatial join "
    "generates candidates with NO false negatives inside eps, so for "
    "every point with >= k eps-neighbors the k-distance computed "
    "from candidates is EXACT — grid_density_outlier_factor's "
    "density approximation upgraded to the real "
    "k-distance/reachability/lrd algebra. All arithmetic is exact "
    "integer (floor-isqrt micro distances, row_number kNN with id "
    "tie-break, DIV ratios on non-negative operands), so Spark and "
    "the brute-force DuckDB oracle agree bit-for-bit. Certification "
    "cascades two closed levels (a point is scored only when its own "
    "k-distance, its k certified neighbors' k-distances, and their "
    "lrds all exist), covering >= 80% of points at sf0.01 and >= 96% "
    "at sf0.1 — never vacuous, and the excluded fringe is exactly "
    "the set whose kNN the grid cannot certify. Scale: eps is "
    "DENSITY-ADAPTIVE (constant n*eps^2, exact integer isqrt on "
    "both engines), so candidate work per point is constant and "
    "total work linear in n — a fixed eps measured SUPERLINEAR "
    "(63.5x) at the K=30 probe; the adaptive cut restores the "
    "linear profile while the certified fraction stays stable.",
)
def q_knn_lof_scores(spark, sf_dir):
    import math

    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.expr(_GRID_Q_SPARK.format(v="embedding", k=1)).alias("qx"),
        F.expr(_GRID_Q_SPARK.format(v="embedding", k=2)).alias("qy"),
    )
    # Density-adaptive eps: a scalar metadata count (the one permitted
    # collect class) + exact integer isqrt — bit-identical to the
    # oracle's epsv CTE (DuckDB // floors on non-negative operands,
    # and both isqrts are exact).
    n = emb.count()
    eps = math.isqrt(_LOF_EPS_NUM // n)
    return _lof_pipeline(spark, pts, eps)


# ---------------------------------------------------------------------------
# Round 10: streaming ANN index maintenance — VERDICT r9 directive #6.
# ---------------------------------------------------------------------------


def _ann_index_apply_batch(base, planes, batch_df, batch_id):
    """One foreachBatch step of LSH index maintenance: band-assign the
    batch's vectors against the index's FROZEN hyperplane set and
    upsert (vec_id, bucket, embedding) as a batch_id-keyed partial —
    skipped when already present, so a replayed batch is a no-op (the
    idempotent keyed-upsert publish discipline, cf. the reference's
    delta MERGE publish at orders_bronze_to_silver.py:184-195).
    Bucket assignment is per-row (map-only): maintenance work is
    O(|batch|), independent of index size."""
    import os

    if batch_df.isEmpty():
        return
    dest = f"{base}/index/batch_id={batch_id}"
    # Replay no-op only on a COMPLETED write (r10 ADVICE): a crashed
    # mid-write leaves a partial dest directory without the _SUCCESS
    # marker Spark commits last — skipping on bare existence would
    # silently drop that batch's vectors; overwrite repairs it.
    if os.path.exists(os.path.join(dest, "_SUCCESS")):
        return
    part = hyperplane_lsh_buckets(batch_df, planes).join(
        batch_df.select("vec_id", "embedding"), on="vec_id"
    )
    part.write.mode("overwrite").parquet(dest)


def _ann_index_probe(spark, base, k=3):
    """Probe the accumulated index store with the standard query set
    (vec_id % 50 == 0, drawn from the index itself) through the SAME
    code path as the batch entry (similarity/ann.py::bucketed_topk),
    so stream-vs-batch parity is structural, not coincidental."""
    idx = spark.read.parquet(f"{base}/index").select(
        "vec_id", "bucket", "embedding"
    )
    buckets = idx.select("vec_id", "bucket")
    vectors = idx.select("vec_id", "embedding")
    q = buckets.filter(F.col("vec_id") % 50 == 0)
    return bucketed_topk(q, buckets, vectors, k=k, dim=64)


@register(
    "stream_ann_index_maintenance",
    _ANN_SQL,
    doc="Streaming twin of ann_lsh_topk — the serving-side INDEX-"
    "FRESHNESS story (VERDICT r9 directive #6): the persistent LSH "
    "index (similarity/index.py) is build-once, this is the "
    "incremental arrival path. Vectors arrive in three deterministic "
    "waves (vec_id mod 3, one file per trigger); each foreachBatch "
    "band-assigns ONLY the batch against the index's frozen "
    "hyperplane configuration (the planes are index parameters fixed "
    "at creation, not stream state) and upserts a batch_id-keyed "
    "(vec_id, bucket, embedding) partial — idempotent under replay, "
    "pinned by tests/test_stream_ann_index.py. Sign-LSH bucket "
    "assignment is embarrassingly incremental (a vector's bucket "
    "never changes as others arrive), so maintenance is O(|batch|) "
    "map-only work and NO rebuild ever touches the accumulated "
    "store; compaction of the parquet partials into the bucketed "
    "catalog table is the documented periodic step at 100 TB. The "
    "probe runs the batch entry's own bucketed_topk over the "
    "accumulated store, and the oracle is ann_lsh_topk's SQL "
    "verbatim — results must be bit-exact regardless of batch "
    "boundaries.",
)
def q_stream_ann_index_maintenance(spark, sf_dir):
    from ecom_churn_lakehouse_spark.scratch import scratch_dir

    emb = load_table(spark, sf_dir, "embeddings")
    base = scratch_dir(prefix="stream_ann_index_")
    for m in (0, 1, 2):
        emb.filter(F.col("vec_id") % 3 == m).coalesce(1).write.mode(
            "append"
        ).parquet(f"{base}/src")
    planes = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("plane_id"), "embedding"
    )
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/src")
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: _ann_index_apply_batch(base, planes, bdf, bid)
        )
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return _ann_index_probe(spark, base, k=3)


# ---------------------------------------------------------------------------
# Round 11: DBSCAN from the certified eps-grid (VERDICT r10 directive #6).
# ---------------------------------------------------------------------------

#: DBSCAN core threshold: a point is CORE with >= 5 eps-neighbors
#: (self excluded — document the convention; Ester et al. count the
#: point itself, so this equals their minPts = 6).
_DBSCAN_MINPTS = 5
#: Density-adaptive eps, the lesson LOF taught (fixed eps probed
#: 63.5x superlinear): eps(n) = isqrt(EPS0^2 * N0 // n) keeps
#: n * eps^2 — the expected ball occupancy, hence candidate work per
#: point — constant at any corpus size. EPS0 = 20_000 at the
#: reference density (N0 = 500, the sf0.01 fixture) was chosen by a
#: measured sweep: ~15 clusters / 28% core / ~52% noise at sf0.01 and
#: ~47 clusters / 28% core / ~53% noise at sf0.1 — the role mix stays
#: stable under the adaptive eps exactly as the occupancy argument
#: predicts (25_000 collapses 84% of cores into one component;
#: 15_000 leaves 82% noise).
_DBSCAN_EPS0 = 20_000
_DBSCAN_N0 = 500
_DBSCAN_EPS_NUM = _DBSCAN_EPS0 * _DBSCAN_EPS0 * _DBSCAN_N0

_DBSCAN_SQL = f"""
WITH RECURSIVE pts AS (
    SELECT vec_id,
           {_GRID_Q.format(v='embedding', k=1)} AS qx,
           {_GRID_Q.format(v='embedding', k=2)} AS qy
    FROM embeddings
),
epsv AS (
    SELECT {_LOF_ISQRT.format(n='eps_sq_arg')} AS eps
    FROM (
        SELECT CAST({_DBSCAN_EPS_NUM} AS BIGINT) // COUNT(*) AS eps_sq_arg
        FROM pts
    ) nn
),
cand AS (
    SELECT a.vec_id AS pa, b.vec_id AS pb
    FROM pts a JOIN pts b ON a.vec_id <> b.vec_id
    CROSS JOIN epsv e
    WHERE (a.qx - b.qx) * (a.qx - b.qx)
          + (a.qy - b.qy) * (a.qy - b.qy) <= e.eps * e.eps
),
deg AS (
    SELECT p.vec_id, CAST(COUNT(c.pb) AS BIGINT) AS n_eps
    FROM pts p LEFT JOIN cand c ON c.pa = p.vec_id
    GROUP BY p.vec_id
),
core AS (SELECT vec_id FROM deg WHERE n_eps >= {_DBSCAN_MINPTS}),
ce AS (
    SELECT c.pa AS u, c.pb AS v
    FROM cand c
    JOIN core a ON a.vec_id = c.pa
    JOIN core b ON b.vec_id = c.pb
),
walk(node, reach) AS (
    SELECT u, u FROM ce
    UNION
    SELECT w.node, e.v FROM walk w JOIN ce e ON e.u = w.reach
),
comp AS (SELECT node, MIN(reach) AS cid FROM walk GROUP BY node),
corelab AS (
    SELECT c.vec_id, COALESCE(m.cid, c.vec_id) AS cluster_id
    FROM core c LEFT JOIN comp m ON m.node = c.vec_id
),
borderlab AS (
    SELECT c.pa AS vec_id, MIN(k.cluster_id) AS cluster_id
    FROM cand c
    JOIN corelab k ON k.vec_id = c.pb
    LEFT JOIN core s ON s.vec_id = c.pa
    WHERE s.vec_id IS NULL
    GROUP BY c.pa
)
SELECT d.vec_id, d.n_eps,
       CASE WHEN cl.cluster_id IS NOT NULL THEN 'core'
            WHEN bl.cluster_id IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role,
       CAST(COALESCE(cl.cluster_id, bl.cluster_id, -1) AS BIGINT)
           AS cluster_id
FROM deg d
LEFT JOIN corelab cl ON cl.vec_id = d.vec_id
LEFT JOIN borderlab bl ON bl.vec_id = d.vec_id
"""


def _dbscan_pipeline(spark, pts, eps, minpts):
    """Exact DBSCAN over a (vec_id, qx, qy) int-micro point frame.

    Candidates come from the fixed-grid spatial join (cell size ==
    eps, 3x3 probe replication — NO false negatives inside eps), so
    the neighbor counts, the core set, the core-core edge set, and
    the border attachment are all EXACT: the Spark result is
    bit-identical to the brute-force oracle. Determinism where
    classic DBSCAN is scan-order-dependent: cluster ids are the
    component MINIMUM core id, and a border point joins the MINIMUM
    cluster id among its core neighbors (Ester et al.'s border
    assignment depends on visit order; ours is a pure function of
    the point set)."""
    from ecom_churn_lakehouse_spark.operators.connected_components import (
        connected_components_star,
    )

    offsets = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
        "dx INT, dy INT",
    )
    home = pts.select(
        F.col("vec_id").alias("pa"),
        "qx",
        "qy",
        (F.col("qx") / eps).cast("long").alias("cx"),
        (F.col("qy") / eps).cast("long").alias("cy"),
    )
    probe = pts.crossJoin(F.broadcast(offsets)).select(
        F.col("vec_id").alias("pb"),
        F.col("qx").alias("qxb"),
        F.col("qy").alias("qyb"),
        ((F.col("qx") / eps).cast("long") + F.col("dx")).alias("cx"),
        ((F.col("qy") / eps).cast("long") + F.col("dy")).alias("cy"),
    )
    dist_sq = (F.col("qx") - F.col("qxb")) * (F.col("qx") - F.col("qxb")) + (
        F.col("qy") - F.col("qyb")
    ) * (F.col("qy") - F.col("qyb"))
    cand = (
        home.join(probe, on=["cx", "cy"])
        .filter(F.col("pa") != F.col("pb"))
        .filter(dist_sq <= F.lit(eps).cast("long") * eps)
        .select("pa", "pb")
        # feeds deg, the core-core edges AND the border attachment —
        # checkpoint or the grid join re-executes per consumer
        .localCheckpoint(eager=False)
    )
    deg = (
        pts.select("vec_id")
        .join(cand, pts["vec_id"] == cand["pa"], "left")
        .groupBy("vec_id")
        .agg(F.count("pb").cast("long").alias("n_eps"))
    )
    core = deg.filter(F.col("n_eps") >= minpts).select("vec_id")
    ce = cand.join(
        core.select(F.col("vec_id").alias("pa")), on="pa"
    ).join(core.select(F.col("vec_id").alias("pb")), on="pb")
    # percolation clusters are LONG CHAINS (diameter ~ sqrt(k)), not
    # near-cliques: plain min-propagation mislabeled 394 points at
    # sf0.1, and pointer jumping measured O(diameter) in disguise on
    # random-id blobs (25 rounds; jumps never helped) — star
    # contraction converges in 6 and shrinks the graph as it goes
    lab = connected_components_star(ce, src="pa", dst="pb")
    corelab = (
        core.join(
            lab.withColumnRenamed("node", "vec_id"), on="vec_id", how="left"
        )
        .select(
            "vec_id",
            F.coalesce(F.col("label"), F.col("vec_id")).alias("cluster_id"),
        )
        .localCheckpoint(eager=False)  # reused by border + final select
    )
    borderlab = (
        cand.join(
            corelab.select(
                F.col("vec_id").alias("pb"),
                F.col("cluster_id").alias("nbr_cid"),
            ),
            on="pb",
        )
        .join(core.select(F.col("vec_id").alias("pa")), on="pa", how="left_anti")
        .groupBy("pa")
        .agg(F.min("nbr_cid").alias("cluster_id"))
        .withColumnRenamed("pa", "vec_id")
    )
    return (
        deg.join(
            corelab.withColumnRenamed("cluster_id", "core_cid"),
            on="vec_id",
            how="left",
        )
        .join(
            borderlab.withColumnRenamed("cluster_id", "border_cid"),
            on="vec_id",
            how="left",
        )
        .select(
            "vec_id",
            "n_eps",
            F.when(F.col("core_cid").isNotNull(), "core")
            .when(F.col("border_cid").isNotNull(), "border")
            .otherwise("noise")
            .alias("role"),
            F.coalesce("core_cid", "border_cid", F.lit(-1))
            .cast("long")
            .alias("cluster_id"),
        )
    )


@register(
    "dbscan_cluster_labels",
    _DBSCAN_SQL,
    doc="Exact DBSCAN (Ester et al. 1996) over the embedding "
    "projection from the certified eps-grid candidates (VERDICT r10 "
    "directive #6) — the clustering sibling of knn_lof_scores: the "
    "grid spatial join has NO false negatives inside eps, so "
    "neighbor counts, the core set (>= 5 eps-neighbors, self "
    "excluded), core-core connectivity (Kiveris large-star/"
    "small-star edge contraction, operators/connected_components.py"
    "::connected_components_star — 6 rounds where min-propagation "
    "needed ~diameter and a pointer-jump spelling measured "
    "O(diameter) in disguise on random-id percolation blobs, "
    "25 rounds with 1/3/5 jumps alike; recursive-CTE closure on "
    "the oracle), and border attachment are all exact — every label "
    "bit-identical to the brute-force oracle. Scan-order-dependent "
    "choices in the classic algorithm are made deterministic: "
    "cluster id = component MIN core id, border point joins the MIN "
    "cluster id among its core neighbors. eps is DENSITY-ADAPTIVE "
    "(constant n*eps^2 via the bit-identical cross-engine isqrt — "
    "the exact fixed-eps trap the LOF K=30 probe exposed), so "
    "per-point candidate work is constant and total work linear; "
    "star contraction SHRINKS the edge set every round (falling "
    "shuffle volume) behind a parquet iteration barrier. "
    "Planted-cluster + pure-Python recompute + union-find "
    "equivalence tests: tests/test_dbscan.py.",
)
def q_dbscan_cluster_labels(spark, sf_dir):
    import math

    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.expr(_GRID_Q_SPARK.format(v="embedding", k=1)).alias("qx"),
        F.expr(_GRID_Q_SPARK.format(v="embedding", k=2)).alias("qy"),
    )
    # scalar metadata count (the permitted collect class), mirrored
    # exactly by the oracle's epsv CTE
    n = emb.count()
    eps = math.isqrt(_DBSCAN_EPS_NUM // n)
    return _dbscan_pipeline(spark, pts, eps, _DBSCAN_MINPTS)
