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
