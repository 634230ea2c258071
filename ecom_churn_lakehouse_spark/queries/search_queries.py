"""Lexical search / collocation queries over ``documents``.

Extends the text surface (SURVEY §7.7) with the two classic corpus
statistics a retrieval or data-curation stack needs:

- BM25 ranking for a fixed query term set (Robertson/Spärck Jones
  idf, k1=1.2 b=0.75) — the baseline lexical scorer;
- adjacent-token PMI collocations — the boilerplate/phrase detector
  (high-PMI pairs are multiword expressions; in curation they flag
  templated text).

Both are pure Column expressions (regex tokenize → array ops →
aggregates). The only global state is a 1-row stats frame (N, avgdl /
total bigram count) broadcast to the scoring pass — no collect, no
second full scan of the raw text. ln() appears only under ROUND(...,6):
both engines' libm are correctly rounded to ~1 ulp, so the rounded
value is engine-stable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecom_churn_lakehouse_spark.registry import register
from ecom_churn_lakehouse_spark.sources import load_table

# ------------------------------------------------------------------ BM25

_BM25_TERMS = ("spark", "join", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_sql() -> str:
    tf_cols = ", ".join(
        "CAST(length(list_filter(regexp_extract_all(text, '\\S+'), "
        f"x -> x = '{t}')) AS BIGINT) AS tf_{t}"
        for t in _BM25_TERMS
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in _BM25_TERMS
    )
    norm = f"({_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * (dl / avgdl)))"
    score = " + ".join(
        f"ln((n_docs - df_{t} + 0.5) / (df_{t} + 0.5) + 1.0)"
        f" * (tf_{t} * ({_BM25_K1} + 1.0)) / (tf_{t} + {norm})"
        for t in _BM25_TERMS
    )
    return f"""
WITH per_doc AS (
    SELECT doc_id,
           CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS dl,
           {tf_cols}
    FROM documents
),
stats AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
           CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
           {df_cols}
    FROM per_doc
)
SELECT doc_id, ROUND({score}, 6) AS bm25
FROM per_doc, stats
WHERE {" + ".join(f"tf_{t}" for t in _BM25_TERMS)} > 0
"""


def _term_freq(toks, term: str):
    # Factory keeps the lambda unary: a default-arg capture would make
    # PySpark pass (element, index) and silently rebind the term.
    return F.size(F.filter(toks, lambda x: x == F.lit(term)))


@register(
    "doc_bm25_scores",
    _bm25_sql(),
    doc="BM25 lexical ranking for a fixed term set (k1=1.2, b=0.75). "
    "One map-only pass extracts per-doc term frequencies and length; "
    "a 1-row global stats frame (N, avgdl, per-term df) broadcasts "
    "back for scoring — the corpus text is scanned exactly once "
    "regardless of scale.",
)
def q_doc_bm25_scores(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.expr(r"regexp_extract_all(text, '\\S+', 0)")
    per_doc = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("dl"),
        *[
            _term_freq(toks, t).cast("long").alias(f"tf_{t}")
            for t in _BM25_TERMS
        ],
    ).localCheckpoint(eager=False)
    stats = per_doc.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    norm = F.lit(_BM25_K1) * (
        F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * (F.col("dl") / F.col("avgdl"))
    )
    score = None
    for t in _BM25_TERMS:
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{t}") + F.lit(0.5))
            / (F.col(f"df_{t}") + F.lit(0.5))
            + F.lit(1.0)
        )
        part = idf * (F.col(f"tf_{t}") * F.lit(_BM25_K1 + 1.0)) / (
            F.col(f"tf_{t}") + norm
        )
        score = part if score is None else score + part
    any_tf = None
    for t in _BM25_TERMS:
        c = F.col(f"tf_{t}")
        any_tf = c if any_tf is None else any_tf + c
    return (
        per_doc.crossJoin(F.broadcast(stats))
        .filter(any_tf > 0)
        .select("doc_id", F.round(score, 6).alias("bm25"))
    )


# ------------------------------------------------- PMI collocations

_PMI_MIN_COUNT = 20


_PMI_SQL = f"""
WITH toks AS (
    SELECT regexp_extract_all(text, '\\S+') AS t FROM documents
),
big AS (
    SELECT t[i] AS w1, t[i+1] AS w2
    FROM (SELECT t, unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i
          FROM toks)
),
bc AS (SELECT w1, w2, COUNT(*) AS n_pair FROM big GROUP BY w1, w2),
tot AS (SELECT CAST(SUM(n_pair) AS DOUBLE) AS total FROM bc),
lc AS (SELECT w1, SUM(n_pair) AS c1 FROM bc GROUP BY w1),
rc AS (SELECT w2, SUM(n_pair) AS c2 FROM bc GROUP BY w2)
SELECT b.w1, b.w2,
       CAST(b.n_pair AS BIGINT) AS n_pair,
       ROUND(ln((b.n_pair * total) / (c1 * c2)), 6) AS pmi
FROM bc b
JOIN lc ON b.w1 = lc.w1
JOIN rc ON b.w2 = rc.w2
CROSS JOIN tot
WHERE b.n_pair >= {_PMI_MIN_COUNT}
"""


@register(
    "token_pmi_bigrams",
    _PMI_SQL,
    doc="Pointwise mutual information of adjacent token pairs — the "
    "collocation/boilerplate statistic. Bigrams are materialized "
    "row-locally (zip of the token array with its tail, no "
    "self-join); marginals re-aggregate the already-small pair-count "
    "frame instead of rescanning the corpus, and join back broadcast.",
)
def q_token_pmi_bigrams(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("text")
    toks = F.expr(r"regexp_extract_all(text, '\\S+', 0)")
    bigrams = docs.select(
        F.explode(
            F.arrays_zip(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            )
        ).alias("bg")
    ).select(F.col("bg.0").alias("w1"), F.col("bg.1").alias("w2"))
    bc = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("n_pair"))
    bc = bc.localCheckpoint(eager=False)
    tot = bc.agg(F.sum("n_pair").cast("double").alias("total"))
    lc = bc.groupBy("w1").agg(F.sum("n_pair").alias("c1"))
    rc = bc.groupBy("w2").agg(F.sum("n_pair").alias("c2"))
    return (
        bc.filter(F.col("n_pair") >= _PMI_MIN_COUNT)
        .join(F.broadcast(lc), on="w1")
        .join(F.broadcast(rc), on="w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("n_pair").cast("long").alias("n_pair"),
            F.round(
                F.log((F.col("n_pair") * F.col("total")) / (F.col("c1") * F.col("c2"))),
                6,
            ).alias("pmi"),
        )
    )


# ---------------------------------------------------- NDCG ranking eval

#: Exact-by-construction NDCG@10: gains are the exact integers 2^rel-1
#: (CASE lookup), the log2(rank+1) discounts are PRECOMPUTED double
#: literals embedded in the shared expression text (both engines parse
#: the same shortest-repr literal to the same bit pattern), and each
#: per-row term is floor-quantized to micros BEFORE the integer sum —
#: no float accumulation anywhere, so window-aggregation order can
#: never flip a bit (DuckDB sums window frames via segment trees,
#: Spark linearly; a raw double running sum is NOT portable).
_NDCG_K = 10
_NDCG_GAIN = (
    "CASE rel WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 3"
    " WHEN 3 THEN 7 WHEN 4 THEN 15 ELSE 31 END"
)


def _ndcg_denom_case(rank_col: str) -> str:
    import math

    whens = " ".join(
        f"WHEN {r} THEN {math.log2(r + 1)!r}" for r in range(1, _NDCG_K + 1)
    )
    return f"CASE {rank_col} {whens} ELSE 1.0 END"


_NDCG_TERM = (
    f"CAST(FLOOR(CAST({_NDCG_GAIN} AS DOUBLE)"
    f" / ({_ndcg_denom_case('rnk')}) * 1000000.0) AS BIGINT)"
)

_NDCG_SQL = f"""
WITH oc AS (
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_custkey
),
base AS (
    SELECT CAST(c.c_nationkey AS BIGINT) AS nation_key,
           c.c_custkey,
           c.c_acctbal,
           CAST(LEAST(COALESCE(oc.n_orders, 0), 5) AS BIGINT) AS rel
    FROM customer c LEFT JOIN oc ON oc.o_custkey = c.c_custkey
),
retrieved AS (
    SELECT nation_key, rel,
           CAST(ROW_NUMBER() OVER (PARTITION BY nation_key
                ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rnk
    FROM base
),
ideal AS (
    SELECT nation_key, rel,
           CAST(ROW_NUMBER() OVER (PARTITION BY nation_key
                ORDER BY rel DESC, c_custkey) AS BIGINT) AS rnk
    FROM base
),
dcg AS (
    SELECT nation_key, CAST(SUM({_NDCG_TERM}) AS BIGINT) AS dcg_micro
    FROM retrieved WHERE rnk <= {_NDCG_K} GROUP BY nation_key
),
idcg AS (
    SELECT nation_key, CAST(SUM({_NDCG_TERM}) AS BIGINT) AS idcg_micro
    FROM ideal WHERE rnk <= {_NDCG_K} GROUP BY nation_key
),
sizes AS (
    SELECT nation_key, CAST(COUNT(*) AS BIGINT) AS n_items FROM base
    GROUP BY nation_key
)
SELECT s.nation_key, s.n_items, d.dcg_micro, i.idcg_micro,
       CAST(CASE WHEN i.idcg_micro = 0 THEN 0
                 ELSE d.dcg_micro * 1000 // i.idcg_micro END AS BIGINT)
           AS ndcg_milli
FROM sizes s
JOIN dcg d ON d.nation_key = s.nation_key
JOIN idcg i ON i.nation_key = s.nation_key
ORDER BY s.nation_key
"""


@register(
    "ranking_ndcg_eval",
    _NDCG_SQL,
    doc="NDCG@10 ranking evaluation per query group: account balance "
    "is the 'model score' ranking customers within each nation, "
    "graded relevance is the capped order count, and the metric is "
    "DCG over the retrieved top-10 normalized by the ideal ordering "
    "— the standard graded-relevance retrieval metric next to "
    "rrf_hybrid_retrieval's rank fusion and ann_recall_eval's "
    "set recall. Gains 2^rel-1 are exact-int CASE lookups and the "
    "log2 discounts are shared double LITERALS (rank domain is "
    "1..10), each term floor-quantized to micros before an integer "
    "sum — float accumulation order never matters. Scale: two "
    "per-group top-10 windows (rank-pushdown limits the sort) over "
    "the customer dim plus one map-combinable order count; no fact "
    "window; ndcg from exact micro ints via non-negative DIV.",
)
def q_ranking_ndcg_eval(spark, sf_dir):
    oc = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").cast("long").alias("n_orders"))
    )
    cust = load_table(spark, sf_dir, "customer")
    base = (
        cust.join(F.broadcast(oc), cust.c_custkey == oc.o_custkey, "left")
        .select(
            F.col("c_nationkey").cast("long").alias("nation_key"),
            "c_custkey",
            "c_acctbal",
            F.least(F.coalesce(F.col("n_orders"), F.lit(0)), F.lit(5))
            .cast("long")
            .alias("rel"),
        )
        .localCheckpoint(eager=False)
    )
    from pyspark.sql.window import Window as W

    w_ret = W.partitionBy("nation_key").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    w_idl = W.partitionBy("nation_key").orderBy(F.col("rel").desc(), "c_custkey")
    term = F.expr(_NDCG_TERM)
    dcg = (
        base.withColumn("rnk", F.row_number().over(w_ret).cast("long"))
        .filter(F.col("rnk") <= _NDCG_K)
        .groupBy("nation_key")
        .agg(F.sum(term).cast("long").alias("dcg_micro"))
    )
    idcg = (
        base.withColumn("rnk", F.row_number().over(w_idl).cast("long"))
        .filter(F.col("rnk") <= _NDCG_K)
        .groupBy("nation_key")
        .agg(F.sum(term).cast("long").alias("idcg_micro"))
    )
    sizes = base.groupBy("nation_key").agg(
        F.count("*").cast("long").alias("n_items")
    )
    return (
        sizes.join(dcg, "nation_key")
        .join(idcg, "nation_key")
        .select(
            "nation_key",
            "n_items",
            "dcg_micro",
            "idcg_micro",
            F.expr(
                "CAST(CASE WHEN idcg_micro = 0 THEN 0"
                " ELSE dcg_micro * 1000 DIV idcg_micro END AS BIGINT)"
            ).alias("ndcg_milli"),
        )
        .orderBy("nation_key")
    )


# ------------------------------------------- popularity recommender eval

_POPREC_TOPN = 20
_POPREC_KS = (1, 5, 10, 20)


def _poprec_sql() -> str:
    from ecom_churn_lakehouse_spark.registry import AS_OF

    ks = ", ".join(f"(CAST({k} AS BIGINT))" for k in _POPREC_KS)
    return f"""
WITH train_orders AS (
    SELECT o_orderkey, o_custkey FROM orders
    WHERE CAST(o_orderdate AS DATE) <= DATE '{AS_OF}'
),
pop AS (
    SELECT l.l_partkey AS pk,
           CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem l JOIN train_orders t ON t.o_orderkey = l.l_orderkey
    GROUP BY l.l_partkey
),
topn AS (
    SELECT pk, CAST(ROW_NUMBER() OVER (ORDER BY n_orders DESC, pk) AS BIGINT)
               AS rnk
    FROM pop QUALIFY rnk <= {_POPREC_TOPN}
),
test_pick AS (
    SELECT o_custkey AS cust, MIN(o_orderkey) AS test_ok
    FROM (
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders WHERE CAST(o_orderdate AS DATE) > DATE '{AS_OF}'
    ) WHERE rn = 1 GROUP BY o_custkey
),
eligible AS (
    SELECT p.cust, p.test_ok FROM test_pick p
    WHERE EXISTS (SELECT 1 FROM train_orders t WHERE t.o_custkey = p.cust)
),
user_best AS (
    SELECT e.cust, MIN(tn.rnk) AS best_rnk
    FROM eligible e
    JOIN lineitem l ON l.l_orderkey = e.test_ok
    LEFT JOIN topn tn ON tn.pk = l.l_partkey
    GROUP BY e.cust
)
SELECT ks.k,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN best_rnk IS NOT NULL AND best_rnk <= ks.k
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       CAST(SUM(CASE WHEN best_rnk IS NOT NULL AND best_rnk <= ks.k
                     THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
           AS hit_rate_ppm
FROM user_best CROSS JOIN (VALUES {ks}) AS ks(k)
GROUP BY ks.k ORDER BY ks.k
"""


@register(
    "popularity_recommender_recall",
    _poprec_sql(),
    doc=f"Cold-start recommender baseline eval: recommend the global "
    f"top-{_POPREC_TOPN} parts by pre-cutoff order frequency, score "
    "hit-rate@k on each returning customer's FIRST post-cutoff "
    "basket — the popularity baseline every recommender must beat, "
    "with a leakage-safe temporal split (train strictly <= as-of, "
    "test strictly after; the temporal_train_val_split discipline). "
    "Per user only the BEST matched rank is kept, so hit@k for all "
    "four k values reads off one integer column; rates in exact "
    "ppm. Scale: popularity is one map-combinable distinct-count "
    "agg + a global top-20 sort-limit; the eval joins each test "
    "basket against the BROADCAST top-20 — no fact-fact shuffle "
    "beyond the test-basket lineitem probe.",
)
def q_popularity_recommender_recall(spark, sf_dir):
    from pyspark.sql.window import Window as W

    from ecom_churn_lakehouse_spark.registry import AS_OF

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    train_orders = orders.filter(
        F.to_date("o_orderdate") <= F.lit(AS_OF).cast("date")
    ).select("o_orderkey", "o_custkey")
    pop = (
        li.join(
            train_orders.select("o_orderkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.countDistinct("l_orderkey").cast("long").alias("n_orders"))
    )
    topn = (
        pop.withColumn(
            "rnk",
            F.row_number()
            .over(W.orderBy(F.col("n_orders").desc(), "pk"))
            .cast("long"),
        )
        .filter(F.col("rnk") <= _POPREC_TOPN)
        .select("pk", "rnk")
    )
    post = orders.filter(
        F.to_date("o_orderdate") > F.lit(AS_OF).cast("date")
    ).select("o_custkey", "o_orderkey", "o_orderdate")
    test_pick = (
        post.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
            ),
        )
        .filter(F.col("rn") == 1)
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(F.min("o_orderkey").alias("test_ok"))
    )
    eligible = test_pick.join(
        train_orders.select(F.col("o_custkey").alias("tc")).distinct(),
        test_pick.cust == F.col("tc"),
        "left_semi",
    )
    user_best = (
        eligible.join(li, li.l_orderkey == eligible.test_ok)
        .join(F.broadcast(topn), li.l_partkey == topn.pk, "left")
        .groupBy("cust")
        .agg(F.min("rnk").alias("best_rnk"))
    )
    ks = F.explode(
        F.array(*[F.lit(k).cast("long") for k in _POPREC_KS])
    ).alias("k")
    hit = F.when(
        F.col("best_rnk").isNotNull() & (F.col("best_rnk") <= F.col("k")), 1
    ).otherwise(0)
    return (
        user_best.select("best_rnk", ks)
        .groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum(hit).cast("long").alias("n_hits"),
            F.expr(
                "CAST(SUM(CASE WHEN best_rnk IS NOT NULL AND best_rnk <= k"
                " THEN 1 ELSE 0 END) * 1000000 DIV COUNT(*) AS BIGINT)"
            ).alias("hit_rate_ppm"),
        )
        .orderBy("k")
    )


# ------------------------------------------- boolean inverted-index search

_BQS_SQL = r"""
WITH toks AS (
    SELECT DISTINCT doc_id,
           unnest(regexp_extract_all(text, '\S+')) AS token
    FROM documents
),
df AS (
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS rnk
    FROM toks GROUP BY token
),
q AS (SELECT token, rnk FROM df WHERE rnk <= 4),
flags AS (
    SELECT t.doc_id,
           CAST(MAX(CASE WHEN q.rnk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h1,
           CAST(MAX(CASE WHEN q.rnk = 2 THEN 1 ELSE 0 END) AS BIGINT) AS h2,
           CAST(MAX(CASE WHEN q.rnk = 3 THEN 1 ELSE 0 END) AS BIGINT) AS h3,
           CAST(MAX(CASE WHEN q.rnk = 4 THEN 1 ELSE 0 END) AS BIGINT) AS h4
    FROM toks t JOIN q ON q.token = t.token
    GROUP BY t.doc_id
),
matched AS (
    SELECT doc_id,
           h1 = 1 AND h2 = 1 AS clause_and,
           h3 = 1 AND h4 = 0 AS clause_andnot
    FROM flags
)
SELECT doc_id,
       clause_and, clause_andnot,
       CASE WHEN clause_and AND clause_andnot THEN 'both'
            WHEN clause_and THEN 'and' ELSE 'andnot' END AS matched_via
FROM matched
WHERE clause_and OR clause_andnot
ORDER BY doc_id
"""


@register(
    "boolean_query_search",
    _BQS_SQL,
    doc="Boolean retrieval over the inverted-index relation: documents "
    "matching (t1 AND t2) OR (t3 AND NOT t4), where t1..t4 are the "
    "corpus's top-4 tokens by document frequency (self-contained "
    "deterministic query terms) — the AND/OR/NOT set semantics of a "
    "search engine expressed as grouped membership flags, which is "
    "exactly how a posting-list engine evaluates them "
    "(intersection/union/difference on sorted doc lists). "
    "Complements the SCORING retrieval family (doc_bm25_scores, "
    "rrf_hybrid_retrieval) with exact-match semantics. Scale: the "
    "distinct (doc, token) relation joins the BROADCAST 4-term "
    "query, then one per-doc flag pivot — cost is the posting "
    "lists of the query terms, never the corpus.",
)
def q_boolean_query_search(spark, sf_dir):
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)
        ).alias("token"),
    ).distinct()
    df_counts = toks.groupBy("token").agg(F.count("*").alias("n_docs"))
    q = (
        df_counts.withColumn(
            "rnk",
            F.row_number().over(Window.orderBy(F.col("n_docs").desc(), "token")),
        )
        .filter(F.col("rnk") <= 4)
        .select("token", "rnk")
    )
    flags = (
        toks.join(F.broadcast(q), "token")
        .groupBy("doc_id")
        .agg(
            *[
                F.max(F.when(F.col("rnk") == i, 1).otherwise(0))
                .cast("long")
                .alias(f"h{i}")
                for i in (1, 2, 3, 4)
            ]
        )
    )
    matched = flags.select(
        "doc_id",
        ((F.col("h1") == 1) & (F.col("h2") == 1)).alias("clause_and"),
        ((F.col("h3") == 1) & (F.col("h4") == 0)).alias("clause_andnot"),
    )
    return (
        matched.filter(F.col("clause_and") | F.col("clause_andnot"))
        .select(
            "doc_id",
            "clause_and",
            "clause_andnot",
            F.when(F.col("clause_and") & F.col("clause_andnot"), "both")
            .when(F.col("clause_and"), "and")
            .otherwise("andnot")
            .alias("matched_via"),
        )
        .orderBy("doc_id")
    )
