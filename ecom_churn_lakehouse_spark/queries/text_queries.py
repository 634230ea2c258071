"""Text-analysis queries over ``documents`` (training-data surface).

Token counting, quality scoring, language-ID heuristic, and content
fingerprinting — all native Column expressions (functions/text.py), no
UDFs, so the hot path stays inside whole-stage codegen at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecom_churn_lakehouse_spark.functions.text import (
    BPE_TOKEN_PATTERN,
    LANG_MARKERS,
    STOPWORDS,
    bpe_token_count_col,
    doc_fingerprint_cols,
    lang_guess_col,
    quality_cols,
    token_count_col,
)
from ecom_churn_lakehouse_spark.registry import register
from ecom_churn_lakehouse_spark.sources import load_table


def _sql_count(pat: str, col: str = "text") -> str:
    """DuckDB non-overlapping regexp match count (= Spark regexp_count)."""
    return f"CAST(length(regexp_extract_all({col}, '{pat}')) AS BIGINT)"


# --- token counting ---

_C_TOK = _sql_count(r"\S+")
_C_BPE = _sql_count(BPE_TOKEN_PATTERN.replace("'", "''"))
_TOKENS_SQL = f"""
SELECT doc_id,
       {_C_TOK} AS n_tokens,
       {_C_BPE} AS n_bpe_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(list_distinct(regexp_extract_all(text, '\\S+'))) AS BIGINT)
           AS n_unique_tokens
FROM documents
"""


@register(
    "doc_token_stats",
    _TOKENS_SQL,
    doc="Token counting via regexp_count — whitespace-run AND BPE-ish "
    "(GPT-2 pre-tokenizer classes, lookahead-free) tokenizers, "
    "JVM-side (SURVEY §7.7 text analysis).",
)
def q_doc_token_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.trim(F.col("text")), r"\s+")
    return docs.select(
        "doc_id",
        token_count_col(F.col("text")).alias("n_tokens"),
        bpe_token_count_col(F.col("text")).alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.size(F.array_distinct(tokens)).cast("long").alias("n_unique_tokens"),
    )


# --- quality scoring ---

_STOP_PAT = r"\b(" + "|".join(STOPWORDS) + r")\b"

_C_STOP = _sql_count(_STOP_PAT)
_C_PUNCT = _sql_count(r"[^\w\s]")
_QUALITY_SQL = f"""
WITH raw AS (
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           {_C_TOK} AS n_tokens,
           {_C_STOP} AS n_stopwords,
           {_C_PUNCT} AS n_punct
    FROM documents
)
SELECT doc_id, n_chars, n_tokens, n_stopwords, n_punct,
       ROUND(CAST(n_stopwords AS DOUBLE) / greatest(n_tokens, 1), 6) AS stop_ratio,
       ROUND(CAST(n_punct AS DOUBLE) / greatest(n_chars, 1), 6) AS punct_ratio,
       ROUND(
           least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
           + least(CAST(n_stopwords AS DOUBLE) / greatest(n_tokens, 1) * 5.0, 1.0) * 0.3
           + (1.0 - least(CAST(n_punct AS DOUBLE) / greatest(n_chars, 1) * 10.0, 1.0)) * 0.2,
           6) AS quality_score
FROM raw
"""


@register(
    "doc_quality",
    _QUALITY_SQL,
    doc="Quality scoring: length/punctuation/stopword signals + composite "
    "score, all codegen-resident (SURVEY §7.7).",
)
def q_doc_quality(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    cols = quality_cols(F.col("text"))
    return docs.select("doc_id", *[c.alias(n) for n, c in cols.items()])


# --- language-ID heuristic ---


def _lang_sql() -> str:
    counts = {
        lang: _sql_count(r"\b(" + "|".join(ws) + r")\b")
        for lang, ws in LANG_MARKERS.items()
    }
    cols = ",\n           ".join(f"{e} AS c_{lang}" for lang, e in counts.items())
    best = "greatest(" + ", ".join(f"c_{lang}" for lang in LANG_MARKERS) + ")"
    whens = "\n            ".join(
        f"WHEN {best} > 0 AND c_{lang} = {best} THEN '{lang}'"
        for lang in LANG_MARKERS
    )
    return f"""
WITH scored AS (
    SELECT doc_id, lang AS declared_lang,
           {cols}
    FROM documents
)
SELECT doc_id, declared_lang,
       CASE {whens}
            ELSE 'unknown' END AS lang_guess
FROM scored
"""


@register(
    "doc_lang_guess",
    _lang_sql(),
    doc="Language-ID marker-word heuristic: vectorized per-language "
    "scoring + deterministic argmax (SURVEY §7.7).",
)
def q_doc_lang_guess(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        lang_guess_col(F.col("text")).alias("lang_guess"),
    )


# --- content fingerprinting ---

_FP_SQL = """
SELECT doc_id,
       sha256(lower(trim(text))) AS sha256_hex,
       md5(lower(trim(text))) AS md5_hex,
       CAST(('0x' || substring(md5(lower(trim(text))), 1, 15)) AS BIGINT)
           AS fingerprint64
FROM documents
"""


@register(
    "doc_fingerprints",
    _FP_SQL,
    doc="Document fingerprinting: sha256/md5 + 64-bit numeric fingerprint "
    "(engine-portable hash, functions/text.py).",
)
def q_doc_fingerprints(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    cols = doc_fingerprint_cols(F.col("text"))
    return docs.select("doc_id", *[c.alias(n) for n, c in cols.items()])


# --- multimodal plumbing: opaque binary + typed metadata ---

_BINARY_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS content_sha256,
       CASE CAST(doc_id % 3 AS INTEGER)
            WHEN 0 THEN 'image/png'
            WHEN 1 THEN 'audio/wav'
            ELSE 'video/mp4' END AS media_type
FROM documents
"""


@register(
    "binary_payload_meta",
    _BINARY_SQL,
    doc="Multimodal plumbing: opaque binary payload column + typed "
    "metadata (byte length, content hash, media type). Decode stage is "
    "the Pandas-UDF stub in multimodal/ (no oracle there).",
)
def q_binary_payload_meta(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.length(payload).cast("long").alias("n_bytes"),
        F.sha2(F.col("text"), 256).alias("content_sha256"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
    )


# --- corpus curation: the composed training-data pipeline ---

_C_EN = _sql_count(r"\b(the|and|of)\b")
_C_DE = _sql_count(r"\b(der|und|das)\b")
_C_FR = _sql_count(r"\b(le|et|les)\b")
_C_ES = _sql_count(r"\b(el|y|los)\b")

from ecom_churn_lakehouse_spark.queries.dedup_queries import _ngram_sql_8  # noqa: E402

_ngram8_bench = _ngram_sql_8("bench_docs")
_ngram8_train = _ngram_sql_8("train_docs")

_CURATION_SQL = f"""
WITH corpus AS (
    SELECT doc_id, source, text FROM documents
    UNION ALL
    SELECT doc_id + 100000 AS doc_id, source, text
    FROM documents WHERE doc_id % 10 = 0
),
raw AS (
    SELECT doc_id, source, text,
           CAST(length(text) AS BIGINT) AS n_chars,
           {_C_TOK} AS n_tokens,
           {_C_STOP} AS n_stopwords,
           {_C_PUNCT} AS n_punct,
           {_C_BPE} AS n_bpe_tokens,
           {_C_EN} AS c_en,
           {_C_DE} AS c_de,
           {_C_FR} AS c_fr,
           {_C_ES} AS c_es
    FROM corpus
),
scored AS (
    SELECT doc_id, source, text, n_bpe_tokens,
           ROUND(
               least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
               + least(CAST(n_stopwords AS DOUBLE) / greatest(n_tokens, 1) * 5.0, 1.0) * 0.3
               + (1.0 - least(CAST(n_punct AS DOUBLE) / greatest(n_chars, 1) * 10.0, 1.0)) * 0.2,
               6) AS quality_score,
           CASE WHEN greatest(c_en, c_de, c_fr, c_es) > 0
                     AND c_en = greatest(c_en, c_de, c_fr, c_es) THEN 'en'
                WHEN greatest(c_en, c_de, c_fr, c_es) > 0
                     AND c_de = greatest(c_en, c_de, c_fr, c_es) THEN 'de'
                WHEN greatest(c_en, c_de, c_fr, c_es) > 0
                     AND c_fr = greatest(c_en, c_de, c_fr, c_es) THEN 'fr'
                WHEN greatest(c_en, c_de, c_fr, c_es) > 0
                     AND c_es = greatest(c_en, c_de, c_fr, c_es) THEN 'es'
                ELSE 'unknown' END AS lang_guess
    FROM raw
),
kept AS (
    SELECT * FROM scored WHERE quality_score >= 0.55 AND lang_guess = 'en'
),
bench_docs AS (
    SELECT doc_id, text FROM corpus WHERE doc_id % 50 = 0 AND doc_id < 100000
),
train_docs AS (
    SELECT doc_id, text FROM kept
    WHERE NOT (doc_id % 50 = 0 AND doc_id < 100000)
),
bench8 AS (SELECT DISTINCT shingle FROM ({_ngram8_bench})),
cand8 AS ({_ngram8_train}),
contaminated AS (
    SELECT DISTINCT c.doc_id FROM cand8 c JOIN bench8 b ON c.shingle = b.shingle
),
clean AS (
    SELECT * FROM kept
    WHERE NOT (doc_id % 50 = 0 AND doc_id < 100000)
      AND doc_id NOT IN (SELECT doc_id FROM contaminated)
),
deduped AS (
    SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY sha256(text) ORDER BY doc_id) AS rn
        FROM clean
    ) WHERE rn = 1
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_bpe_tokens) AS BIGINT) AS total_bpe_tokens,
       ROUND(CAST(SUM(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 6) AS avg_quality
FROM deduped
GROUP BY source
"""


@register(
    "corpus_curation",
    _CURATION_SQL,
    doc="End-to-end training-corpus curation in ONE declarative plan: "
    "quality scoring -> language filter -> benchmark decontamination "
    "(8-gram overlap, broadcast probe) -> exact dedup (min-id "
    "survivor) -> per-source doc count + BPE token budget. Every "
    "stage is codegen-resident; the dedup window, the decontam probe, "
    "and the final agg are the only shuffles (SURVEY §7.7 composed).",
)
def q_corpus_curation(spark, sf_dir):
    from ecom_churn_lakehouse_spark.dedup.shingles import doc_shingles

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    # Plan shape, measured at sf0.1 (round 5 rewrite — 2.02 s -> 1.73 s
    # fresh-build min-of-3, and ONE corpus text pass instead of two):
    # (1) repartition to full parallelism — a small-file corpus scan
    #     yields 1-2 input splits, serializing the regex/shingle work;
    #     at 100 TB this is a no-op (many files = natural parallelism).
    # (2) ONE fused pass consumes text: sha + quality/lang/BPE regexes
    #     + the 8-gram shingle-hash ARRAY are all computed in a single
    #     projection, checkpointed as COMPACT columns (~1.7 KB/doc —
    #     no text; the r2 oscillation came from caching text blocks).
    #     Both consumers (decontam probe, dedup/agg) read the
    #     checkpoint, so the heavy scan runs exactly once — at 100 TB
    #     this halves the dominant cost (the corpus read), at the
    #     price of materializing features a silver table would hold
    #     anyway.
    # (3) the checkpoint barrier also prevents the optimizer from
    #     collapsing the shingle `transform` into the probe's Generate
    #     (explode-of-built-array re-evaluates the transform per
    #     element — measured 7x slower; a barrier-free exchange-reuse
    #     variant hit exactly that and ran 5.4 s).
    par = spark.sparkContext.defaultParallelism
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "source", "text"
        )
    ).repartition(par)
    is_bench = (F.col("doc_id") % 50 == 0) & (F.col("doc_id") < 100000)
    # Probe on xxhash64(shingle), not the shingle STRING: the broadcast
    # build ships 8 bytes/row instead of a ~60-byte 8-gram and the hash
    # join compares longs. A collision only adds a spurious
    # contamination hit (P ~ n^2/2^64). No .distinct() in the decontam
    # subgraph: duplicate bench shingles only duplicate probe hits, and
    # LEFT ANTI is insensitive to duplicate right-side keys.
    # bench docs satisfy doc_id % 50 == 0 AND doc_id < 100000, and every
    # union copy has doc_id >= 100000 — so the bench partition comes
    # entirely from the BASE parquet scan.
    bench8 = doc_shingles(
        docs.filter((F.col("doc_id") % 50 == 0) & (F.col("doc_id") < 100000)),
        n=8,
        distinct=False,
    ).select(F.xxhash64("shingle").alias("__sh"))
    q = quality_cols(F.col("text"))
    n_sh = F.size("__toks") - 7
    idx = F.when(n_sh >= 1, F.sequence(F.lit(1), n_sh)).otherwise(
        F.array().cast("array<int>")
    )
    sh_arr = F.transform(
        idx, lambda i: F.xxhash64(F.array_join(F.slice("__toks", i, 8), " "))
    )
    features = (
        corpus.filter(~is_bench)
        .withColumn("__toks", F.split(F.trim(F.col("text")), r"\s+"))
        .select(
            "doc_id",
            "source",
            F.sha2(F.col("text"), 256).alias("__sha"),
            bpe_token_count_col(F.col("text")).alias("n_bpe_tokens"),
            q["quality_score"].alias("quality_score"),
            lang_guess_col(F.col("text")).alias("lang_guess"),
            sh_arr.alias("__shs"),
        )
        .localCheckpoint(eager=False)
    )
    contaminated = (
        features.select("doc_id", F.explode("__shs").alias("__sh"))
        .join(F.broadcast(bench8), on="__sh")
        .select("doc_id")
    )
    scored = features.drop("__shs").join(
        F.broadcast(contaminated), on="doc_id", how="left_anti"
    )
    kept = scored.filter(
        (F.col("quality_score") >= 0.55) & (F.col("lang_guess") == "en")
    )
    # Dedup as a hash aggregate (min-doc_id survivor via min_by): with
    # text already projected away the aggregation buffer is a tiny
    # struct, so this beats the earlier window-sort dedup (which was
    # only faster when the buffer would have carried the text payload)
    # and is map-side combinable on top.
    deduped = kept.groupBy("__sha").agg(
        F.min_by(
            F.struct("source", "n_bpe_tokens", "quality_score"), "doc_id"
        ).alias("__row")
    ).select(
        F.col("__row.source").alias("source"),
        F.col("__row.n_bpe_tokens").alias("n_bpe_tokens"),
        F.col("__row.quality_score").alias("quality_score"),
    )
    return deduped.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bpe_tokens").cast("long").alias("total_bpe_tokens"),
        F.round(
            F.sum(F.col("quality_score").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("avg_quality"),
    )


# --- document frequency / IDF stats ---

_DOCFREQ_SQL = r"""
WITH toks AS (
    SELECT DISTINCT doc_id, unnest(regexp_extract_all(text, '\S+')) AS token
    FROM documents
),
n_docs AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents)
SELECT token,
       COUNT(*) AS doc_freq,
       ROUND(ln(CAST(n AS DOUBLE) / COUNT(*)), 6) AS idf
FROM toks, n_docs
GROUP BY token, n
HAVING COUNT(*) >= 25
"""


@register(
    "token_doc_freq",
    _DOCFREQ_SQL,
    doc="Per-token document frequency + IDF over the corpus — the "
    "vocabulary statistics a curation pipeline uses for stopword "
    "discovery and tf-idf weighting. Distinct (doc, token) explode is "
    "one shuffle; the DF aggregate is a second. The broadcast 1-row "
    "corpus count keeps the IDF computation shuffle-free.",
)
def q_token_doc_freq(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)).alias(
            "token"
        ),
    ).distinct()
    n_docs = docs.agg(F.count_distinct("doc_id").alias("n"))
    return (
        toks.groupBy("token")
        .agg(F.count("*").alias("doc_freq"))
        .filter(F.col("doc_freq") >= 25)
        .join(F.broadcast(n_docs))
        .select(
            "token",
            "doc_freq",
            F.round(
                F.log(F.col("n").cast("double") / F.col("doc_freq")), 6
            ).alias("idf"),
        )
    )


# --- token-distribution entropy / lexical diversity ---

_ENTROPY_SQL = r"""
WITH toks AS (
    SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
    FROM documents
),
tf AS (
    SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS c
    FROM toks GROUP BY doc_id, term
),
tot AS (
    SELECT doc_id, SUM(c) AS n, COUNT(*) AS v FROM tf GROUP BY doc_id
)
SELECT t.doc_id AS doc_id,
       CAST(tot.n AS BIGINT) AS n_tokens,
       CAST(tot.v AS BIGINT) AS n_distinct,
       ROUND(-SUM((t.c / tot.n) * ln(t.c / tot.n)), 6) AS token_entropy,
       ROUND(CAST(tot.v AS DOUBLE) / tot.n, 6) AS ttr
FROM tf t JOIN tot ON t.doc_id = tot.doc_id
GROUP BY t.doc_id, tot.n, tot.v
"""


@register(
    "doc_token_entropy",
    _ENTROPY_SQL,
    doc="Shannon entropy of each document's token distribution plus "
    "type-token ratio — repetitiveness / lexical-diversity signals for "
    "corpus filtering (low entropy = boilerplate or degenerate "
    "repetition; complements doc_repetition's trigram ratio). Scale: "
    "explode -> two map-side-combinable hash aggs; the entropy uses "
    "the single-pass identity H = ln(n) - (sum c*ln c)/n so the "
    "per-doc totals never join back against the token frame. ln() "
    "only under ROUND(...,6) per the module float policy.",
)
def q_doc_token_entropy(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("double").alias("c")
    )
    n = F.sum("c")
    return tf.groupBy("doc_id").agg(
        n.cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_distinct"),
        F.round(
            F.log(n) - F.sum(F.col("c") * F.log("c")) / n, 6
        ).alias("token_entropy"),
        F.round(F.count("*").cast("double") / n, 6).alias("ttr"),
    )


# --- per-document n-gram novelty (share of corpus-unique 8-grams) ---

_NOVELTY_SQL = f"""
WITH sh8 AS ({_ngram_sql_8("documents")}),
df8 AS (
    SELECT shingle, COUNT(*) AS df FROM sh8 GROUP BY shingle
)
SELECT s.doc_id AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_unique,
       ROUND(CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS novelty
FROM sh8 s JOIN df8 d ON d.shingle = s.shingle
GROUP BY s.doc_id
"""


@register(
    "doc_novelty",
    _NOVELTY_SQL,
    doc="Per-document 8-gram novelty: the share of a doc's distinct "
    "8-grams that occur NOWHERE else in the corpus. Low novelty = "
    "templated/boilerplate/near-duplicate material (complements the "
    "pairwise near-dup detectors with a corpus-global, per-doc "
    "signal; high-df shingles are exactly what PPJoin's prefix "
    "filter deprioritizes). Scale: shingle sets build row-locally "
    "(array ops, no explode shuffle until the df aggregate); the df "
    "count and the join back are both keyed on the shingle — two "
    "map-side-combinable aggs and one co-partitioned join. Ratios "
    "are integer-over-integer under ROUND(...,6).",
)
def q_doc_novelty(spark, sf_dir):
    from ecom_churn_lakehouse_spark.dedup.shingles import doc_shingles

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # Exploded distinct (doc, shingle) relation — the index-explode
    # shape (shingles.py::doc_shingles): the shingle string is built
    # AFTER the Generate, never re-evaluated per element. Both the
    # per-doc totals and the df aggregation read the SAME relation, so
    # Catalyst's ReuseExchange serves the distinct once.
    sh = doc_shingles(docs, n=8)
    base = sh.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_shingles")
    )
    # Join-free novelty: a df=1 shingle has exactly ONE owning doc, so
    # max(doc_id) inside the df aggregation already names it — no
    # join-back of the exploded relation (the oracle's formulation).
    singles = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"), F.max("doc_id").alias("doc_id"))
        .filter(F.col("df") == 1)
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_unique"))
    )
    n_unique = F.coalesce(F.col("n_unique"), F.lit(0)).cast("long")
    return base.join(singles, on="doc_id", how="left").select(
        "doc_id",
        "n_shingles",
        n_unique.alias("n_unique"),
        F.round(n_unique.cast("double") / F.col("n_shingles"), 6).alias(
            "novelty"
        ),
    )


# --------------- BPE merge candidates (tokenizer-training step) ---------------

_BPE_MERGE_SQL = r"""
WITH words AS (
    SELECT lower(w) AS word, COUNT(*) AS freq
    FROM (
        SELECT unnest(regexp_extract_all(text, '[A-Za-z]+')) AS w
        FROM documents
    )
    GROUP BY 1
),
pairs AS (
    SELECT substr(word, i, 1) AS left_sym,
           substr(word, i + 1, 1) AS right_sym,
           freq
    FROM words, unnest(range(1, length(word))) AS t(i)
    WHERE length(word) >= 2
)
SELECT left_sym, right_sym,
       CAST(SUM(freq) AS BIGINT) AS pair_count
FROM pairs
GROUP BY 1, 2
ORDER BY pair_count DESC, left_sym, right_sym
LIMIT 20
"""


@register(
    "bpe_merge_candidates",
    _BPE_MERGE_SQL,
    doc="The first BPE merge iteration of tokenizer training: corpus "
    "word frequencies, then adjacent character-pair counts weighted "
    "by word frequency — the argmax pair is the first merge rule a "
    "BPE vocabulary learns. Scale shape: the pair space is computed "
    "over DISTINCT words (vocabulary-sized, orders of magnitude "
    "smaller than the corpus) carrying their frequencies, so the "
    "expensive character fan-out never touches raw text twice; the "
    "index explode builds each symbol AFTER the Generate "
    "(shingles.py lesson). Integer counts — oracle hash exact. "
    "Subsequent merge iterations re-run the same plan over the "
    "re-segmented vocabulary (driver loop, vocab-sized state).",
)
def q_bpe_merge_candidates(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.expr(r"regexp_extract_all(text, '[A-Za-z]+', 0)")).alias(
                "w"
            )
        )
        .select(F.lower(F.col("w")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .filter(F.length("word") >= 2)
    )
    idx = F.sequence(F.lit(1), F.length("word") - 1)
    exploded = words.select("word", "freq", F.explode(idx).alias("__i"))
    pairs = exploded.select(
        F.substring(F.col("word"), F.col("__i"), F.lit(1)).alias("left_sym"),
        F.substring(F.col("word"), F.col("__i") + 1, F.lit(1)).alias("right_sym"),
        "freq",
    )
    return (
        pairs.groupBy("left_sym", "right_sym")
        .agg(F.sum("freq").cast("long").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
        .limit(20)
    )


# --- curation funnel: per-disposition accounting of the same pipeline ---

_FUNNEL_SQL = f"""
WITH corpus AS (
    SELECT doc_id, source, text FROM documents
    UNION ALL
    SELECT doc_id + 100000 AS doc_id, source, text
    FROM documents WHERE doc_id % 10 = 0
),
bench_docs AS (
    SELECT doc_id, text FROM corpus
    WHERE doc_id % 50 = 0 AND doc_id < 100000
),
train_docs AS (
    SELECT doc_id, text FROM corpus
    WHERE NOT (doc_id % 50 = 0 AND doc_id < 100000)
),
bench8 AS (SELECT DISTINCT shingle FROM ({_ngram8_bench})),
contaminated AS (
    SELECT DISTINCT c.doc_id FROM ({_ngram8_train}) c
    JOIN bench8 b ON c.shingle = b.shingle
),
scored AS (
    SELECT doc_id, source, text,
           {_C_BPE} AS n_bpe_tokens,
           ROUND(
               least(CAST({_C_TOK} AS DOUBLE) / 100.0, 1.0) * 0.5
               + least(CAST({_C_STOP} AS DOUBLE) / greatest({_C_TOK}, 1) * 5.0, 1.0) * 0.3
               + (1.0 - least(CAST({_C_PUNCT} AS DOUBLE) / greatest(length(text), 1) * 10.0, 1.0)) * 0.2,
               6) AS quality_score,
           CASE WHEN greatest({_C_EN}, {_C_DE}, {_C_FR}, {_C_ES}) > 0
                     AND {_C_EN} = greatest({_C_EN}, {_C_DE}, {_C_FR}, {_C_ES}) THEN 'en'
                WHEN greatest({_C_EN}, {_C_DE}, {_C_FR}, {_C_ES}) > 0
                     AND {_C_DE} = greatest({_C_EN}, {_C_DE}, {_C_FR}, {_C_ES}) THEN 'de'
                WHEN greatest({_C_EN}, {_C_DE}, {_C_FR}, {_C_ES}) > 0
                     AND {_C_FR} = greatest({_C_EN}, {_C_DE}, {_C_FR}, {_C_ES}) THEN 'fr'
                WHEN greatest({_C_EN}, {_C_DE}, {_C_FR}, {_C_ES}) > 0
                     AND {_C_ES} = greatest({_C_EN}, {_C_DE}, {_C_FR}, {_C_ES}) THEN 'es'
                ELSE 'unknown' END AS lang_guess
    FROM corpus
),
disposed AS (
    SELECT s.doc_id, s.n_bpe_tokens,
           CASE
             WHEN s.doc_id % 50 = 0 AND s.doc_id < 100000
                 THEN 'benchmark_heldout'
             WHEN s.doc_id IN (SELECT doc_id FROM contaminated)
                 THEN 'contaminated'
             WHEN s.quality_score < 0.55 THEN 'low_quality'
             WHEN s.lang_guess <> 'en' THEN 'wrong_language'
             WHEN ROW_NUMBER() OVER (
                     PARTITION BY
                         CASE WHEN NOT (s.doc_id % 50 = 0 AND s.doc_id < 100000)
                                   AND s.doc_id NOT IN (SELECT doc_id FROM contaminated)
                                   AND s.quality_score >= 0.55
                                   AND s.lang_guess = 'en'
                              THEN sha256(s.text) END
                     ORDER BY s.doc_id) > 1
                 THEN 'exact_duplicate'
             ELSE 'kept'
           END AS disposition
    FROM scored s
)
SELECT disposition,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bpe_tokens) AS BIGINT) AS total_bpe_tokens
FROM disposed
GROUP BY disposition
"""


@register(
    "corpus_curation_funnel",
    _FUNNEL_SQL,
    doc="Curation pipeline OBSERVABILITY: the same staged decisions as "
    "corpus_curation, but accounting every document's disposition — "
    "benchmark_heldout / contaminated / low_quality / wrong_language "
    "/ exact_duplicate / kept — with doc and token counts per stage. "
    "The funnel report a data team reads to see where the corpus "
    "went (and the first place a threshold regression shows up). "
    "Stages apply in pipeline order, so each doc lands in exactly "
    "one bucket and the counts sum to the corpus; the dedup stage's "
    "window partitions by text hash over survivors only.",
)
def q_corpus_curation_funnel(spark, sf_dir):
    from pyspark.sql.window import Window

    from ecom_churn_lakehouse_spark.dedup.shingles import doc_shingles

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    par = spark.sparkContext.defaultParallelism
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "source", "text"
        )
    ).repartition(par)
    is_bench = (F.col("doc_id") % 50 == 0) & (F.col("doc_id") < 100000)
    bench8 = doc_shingles(
        corpus.filter(is_bench), n=8, distinct=False
    ).select("shingle")
    contaminated = (
        doc_shingles(corpus.filter(~is_bench), n=8, distinct=False)
        .join(F.broadcast(bench8), on="shingle")
        .select("doc_id")
        .distinct()
        .withColumn("__contam", F.lit(True))
    )
    q = quality_cols(F.col("text"))
    scored = (
        corpus.join(F.broadcast(contaminated), on="doc_id", how="left")
        .select(
            "doc_id",
            "text",
            F.coalesce(F.col("__contam"), F.lit(False)).alias("__contam"),
            bpe_token_count_col(F.col("text")).alias("n_bpe_tokens"),
            q["quality_score"].alias("quality_score"),
            lang_guess_col(F.col("text")).alias("lang_guess"),
            is_bench.alias("__bench"),
        )
    )
    survivor = (
        ~F.col("__bench")
        & ~F.col("__contam")
        & (F.col("quality_score") >= 0.55)
        & (F.col("lang_guess") == "en")
    )
    # Non-survivors get a doc_id-salted partition key: __rn is only
    # consulted for survivors, and a single NULL partition would funnel
    # every rejected doc through one sort task (skew hotspot at scale).
    w = Window.partitionBy(
        F.when(survivor, F.sha2(F.col("text"), 256)).otherwise(
            F.sha2(F.concat_ws("\x1f", F.col("text"), F.col("doc_id")), 256)
        )
    ).orderBy("doc_id")
    disposed = scored.withColumn("__rn", F.row_number().over(w)).select(
        "n_bpe_tokens",
        F.when(F.col("__bench"), "benchmark_heldout")
        .when(F.col("__contam"), "contaminated")
        .when(F.col("quality_score") < 0.55, "low_quality")
        .when(F.col("lang_guess") != "en", "wrong_language")
        .when(F.col("__rn") > 1, "exact_duplicate")
        .otherwise("kept")
        .alias("disposition"),
    )
    return disposed.groupBy("disposition").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_bpe_tokens").cast("long").alias("total_bpe_tokens"),
    )


# --- tokenizer vocabulary coverage: per-doc OOV rate ---

_OOV_SQL = r"""
WITH toks AS (
    SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS token
    FROM documents
),
vocab AS (
    SELECT token FROM (
        SELECT token, COUNT(*) AS c
        FROM toks GROUP BY token
        ORDER BY c DESC, token
        LIMIT 20
    )
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov,
       ROUND(CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS oov_rate
FROM toks t LEFT JOIN vocab v ON t.token = v.token
GROUP BY t.doc_id
"""


@register(
    "vocab_oov_rate",
    _OOV_SQL,
    doc="Tokenizer vocabulary coverage: build a top-20-by-frequency "
    "vocabulary from the corpus itself (deterministic count-then-token "
    "tie-break), broadcast it, and report each document's token count, "
    "out-of-vocabulary count, and OOV rate. The standard pre-training "
    "check that a tokenizer/vocab fits a new corpus before committing "
    "a full tokenization run. Two shuffles total (vocab agg + per-doc "
    "agg); the vocab probe itself is a broadcast join against a "
    "20-row relation, so per-token work stays map-side at any scale.",
)
def q_vocab_oov_rate(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)).alias(
            "token"
        ),
    )
    vocab = (
        toks.groupBy("token")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "token")
        .limit(20)
        .select("token", F.lit(True).alias("__in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), on="token", how="left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(
                F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
            ).cast("long").alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(
                F.col("n_oov").cast("double") / F.col("n_tokens"), 6
            ).alias("oov_rate"),
        )
    )


# ------------------- vocabulary growth (Heaps-law checkpoints)

_HEAPS_BUCKETS = 10

_HEAPS_CTES = rf"""toks AS (
    SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS token
    FROM documents
),
bounds AS (SELECT MAX(doc_id) AS mx FROM documents),
first_seen AS (
    SELECT token, MIN(doc_id) AS first_doc FROM toks GROUP BY token
),
tok_counts AS (
    SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id
),
checkpoints AS (
    SELECT CAST((d.doc_id * {_HEAPS_BUCKETS}) // ((SELECT mx FROM bounds) + 1) AS BIGINT)
               AS bucket,
           d.doc_id
    FROM documents d
),
per_bucket AS (
    SELECT c.bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tc.n_tok) AS BIGINT) AS n_tokens
    FROM checkpoints c JOIN tok_counts tc ON c.doc_id = tc.doc_id
    GROUP BY c.bucket
),
vocab_per_bucket AS (
    SELECT CAST((f.first_doc * {_HEAPS_BUCKETS}) // ((SELECT mx FROM bounds) + 1) AS BIGINT)
               AS bucket,
           CAST(COUNT(*) AS BIGINT) AS new_types
    FROM first_seen f
    GROUP BY 1
)"""

_HEAPS_TAIL = """
SELECT p.bucket AS bucket,
       CAST(SUM(p2.n_docs) AS BIGINT) AS cum_docs,
       CAST(SUM(p2.n_tokens) AS BIGINT) AS cum_tokens,
       CAST(SUM(COALESCE(v.new_types, 0)) AS BIGINT) AS cum_vocab
FROM per_bucket p
JOIN per_bucket p2 ON p2.bucket <= p.bucket
LEFT JOIN vocab_per_bucket v ON v.bucket = p2.bucket
GROUP BY p.bucket
ORDER BY bucket
"""

_HEAPS_SQL = f"WITH {_HEAPS_CTES}{_HEAPS_TAIL}"


@register(
    "vocab_growth_checkpoints",
    _HEAPS_SQL,
    doc="Vocabulary growth curve (Heaps' law): cumulative distinct "
    "token types vs cumulative tokens at 10 corpus checkpoints — "
    "the saturation readout that tells a tokenizer team whether more "
    "data still buys vocabulary coverage (cf. vocab_oov_rate's "
    "fixed-vocab view). Each type is counted ONCE at its "
    "first-occurrence doc (a min-aggregate over the token explode — "
    "never a cumulative COUNT(DISTINCT) window, which would shuffle "
    "the full type x checkpoint matrix); the checkpoint roll-up is a "
    "10-row triangular self-join. All integer arithmetic.",
)
def q_vocab_growth_checkpoints(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)
        ).alias("token"),
    )
    bounds = docs.agg(F.max("doc_id").alias("mx"))
    # Exact integer floor division (LONG DIV LONG), matching the
    # oracle's `//` — never double division + cast, whose rounding is
    # only coincidentally equal on fixtures whose quotients stay clear
    # of integer boundaries.
    bucket_of = lambda name: F.expr(  # noqa: E731
        f"({name} * {_HEAPS_BUCKETS}) DIV (mx + 1)"
    )
    first_seen = toks.groupBy("token").agg(F.min("doc_id").alias("first_doc"))
    tok_counts = toks.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    per_bucket = (
        docs.join(F.broadcast(bounds))
        .select(bucket_of("doc_id").cast("long").alias("bucket"), "doc_id")
        .join(tok_counts, on="doc_id")
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )
    vocab_per_bucket = (
        first_seen.join(F.broadcast(bounds))
        .select(bucket_of("first_doc").cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("new_types"))
    )
    p = per_bucket.alias("p")
    p2 = per_bucket.alias("p2")
    v = vocab_per_bucket.alias("v")
    return (
        p.join(p2, F.col("p2.bucket") <= F.col("p.bucket"))
        .join(v, F.col("v.bucket") == F.col("p2.bucket"), "left")
        .groupBy(F.col("p.bucket").alias("bucket"))
        .agg(
            F.sum("p2.n_docs").cast("long").alias("cum_docs"),
            F.sum("p2.n_tokens").cast("long").alias("cum_tokens"),
            F.sum(F.coalesce(F.col("v.new_types"), F.lit(0)))
            .cast("long")
            .alias("cum_vocab"),
        )
        .orderBy("bucket")
    )


# --- context-budget truncation audit ---

_TRUNC_BUDGETS = [128, 512, 2048]

_TRUNC_SQL = f"""
WITH tok AS (
    SELECT source, {_C_BPE} AS n_tok FROM documents
),
budgets AS (SELECT unnest({_TRUNC_BUDGETS}) AS budget)
SELECT source,
       CAST(budget AS INTEGER) AS budget,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE n_tok > budget) AS BIGINT)
           AS n_docs_over,
       CAST(SUM(greatest(n_tok - budget, 0)) AS BIGINT) AS lost_tokens,
       CAST(SUM(greatest(n_tok - budget, 0)) * 1000000 // SUM(n_tok)
            AS BIGINT) AS lost_share_ppm
FROM tok, budgets
GROUP BY source, budget
"""


@register(
    "tokenizer_truncation_audit",
    _TRUNC_SQL,
    doc="Context-budget truncation audit: for each candidate sequence "
    "length (128/512/2048 BPE tokens), how many documents per source "
    "exceed it and what share of the corpus' tokens would be cut — "
    "the readout that picks a packing length before tokenization "
    "(companion to doc_sequence_packing, which packs at the chosen "
    "budget, and doc_chunks, which splits the overflow instead of "
    "dropping it). One regex token count per doc fanned out to the "
    "tiny budget list (explode of a 3-element literal — the scan "
    "runs once; the fan-out multiplies only (source, n_tok) pairs), "
    "then an integer-only aggregate: lost-share is exact ppm floor "
    "division, no float surface.",
)
def q_tokenizer_truncation_audit(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", bpe_token_count_col(F.col("text")).alias("n_tok")
    )
    fanned = tok.withColumn(
        "budget",
        F.explode(
            F.array(*[F.lit(b).cast("int") for b in _TRUNC_BUDGETS])
        ),
    )
    lost = F.greatest(F.col("n_tok") - F.col("budget"), F.lit(0))
    return fanned.groupBy("source", "budget").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count_if(F.col("n_tok") > F.col("budget"))
        .cast("long")
        .alias("n_docs_over"),
        F.sum(lost).cast("long").alias("lost_tokens"),
        F.expr(
            "SUM(GREATEST(n_tok - budget, 0)) * 1000000 DIV SUM(n_tok)"
        )
        .cast("long")
        .alias("lost_share_ppm"),
    )


# --- language-ID evaluation: declared vs guessed confusion matrix ---

_LANG_CONF_SQL = f"""
WITH guessed AS ({_lang_sql()})
SELECT declared_lang, lang_guess,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM guessed
GROUP BY declared_lang, lang_guess
"""


@register(
    "lang_id_confusion",
    _LANG_CONF_SQL,
    doc="Language-ID confusion matrix: the declared fixture language "
    "crossed with the marker-word heuristic's guess, with document "
    "counts — the evaluation artifact that decides whether the cheap "
    "heuristic is good enough to gate a corpus or needs a model "
    "(per-doc twin: doc_lang_guess; integer counts only). One "
    "aggregate over the per-doc scoring scan.",
)
def q_lang_id_confusion(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("declared_lang"),
            lang_guess_col(F.col("text")).alias("lang_guess"),
        )
        .groupBy("declared_lang", "lang_guess")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


# --- bigram LM surprisal screen (log-free, exact ppm) ---

_BIGRAM_SQL = r"""
WITH toks AS (
    SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS t
    FROM documents
),
big AS (
    SELECT doc_id,
           t[i] AS w1, t[i] || ' ' || t[i + 1] AS bg
    FROM toks, unnest(generate_series(1, greatest(len(t) - 1, 0))) s(i)
),
uni AS (
    SELECT doc_id, unnest(t) AS w FROM toks
),
c_uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cw FROM uni GROUP BY w),
c_big AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS cb FROM big GROUP BY bg),
vocab AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM c_uni)
SELECT b.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(MIN((cb.cb + 1) * 1000000 // (cu.cw + vv.v)) AS BIGINT)
           AS min_bigram_prob_ppm
FROM big b
JOIN c_big cb ON b.bg = cb.bg
JOIN c_uni cu ON b.w1 = cu.w
CROSS JOIN vocab vv
GROUP BY b.doc_id
"""


@register(
    "doc_min_bigram_prob",
    _BIGRAM_SQL,
    doc="Bigram-LM surprisal screen, log-free: per document, the "
    "MINIMUM add-one-smoothed corpus bigram probability "
    "(c(ab)+1)/(c(a)+V) over its bigrams, in exact integer ppm — the "
    "'most surprising transition' signal that flags OCR junk, "
    "shuffled text, and concatenation seams without ever touching "
    "ln/exp (the libm-unstable path unigram_lm_doc_scores documents; "
    "min of exact rationals needs no logarithm because min commutes "
    "with any monotone map). Counts shuffle once each for unigrams "
    "and bigrams; the per-doc reduce joins the doc's own bigram "
    "stream against the broadcast-size count tables.",
)
def q_doc_min_bigram_prob(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    )
    # Guard the <2-token case explicitly: Spark's sequence(1, 0) steps
    # DOWNWARD to [1, 0] and element_at(t, 0) throws, while DuckDB's
    # generate_series(1, 0) is empty — so an unguarded short doc both
    # crashes the plan and diverges from the oracle.
    idx = F.when(
        F.size("t") >= 2, F.sequence(F.lit(1), F.size("t") - 1)
    ).otherwise(F.array().cast("array<int>"))
    big = toks.select(
        "doc_id", "t", F.explode(idx).alias("i")
    ).select(
        "doc_id",
        F.element_at("t", F.col("i")).alias("w1"),
        F.concat_ws(
            " ",
            F.element_at("t", F.col("i")),
            F.element_at("t", F.col("i") + 1),
        ).alias("bg"),
    )
    uni = toks.select("doc_id", F.explode("t").alias("w"))
    c_uni = uni.groupBy("w").agg(F.count("*").cast("long").alias("cw"))
    c_big = big.groupBy("bg").agg(F.count("*").cast("long").alias("cb"))
    vocab = c_uni.agg(F.count("*").cast("long").alias("v"))
    return (
        big.join(c_big, on="bg")
        .join(c_uni, big.w1 == c_uni.w)
        .join(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.min(
                F.expr("(cb + 1) * 1000000 DIV (cw + v)")
            )
            .cast("long")
            .alias("min_bigram_prob_ppm"),
        )
    )


# ------------------------------------------- skip-gram co-occurrence

_SKIPGRAM_SQL = r"""
WITH toks AS (
    SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
),
pos AS (
    SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM toks
),
expanded AS (
    SELECT t, i, unnest([1, 2]) AS d FROM pos
),
pairs AS (
    SELECT least(t[i], t[i+d]) AS w1, greatest(t[i], t[i+d]) AS w2
    FROM expanded WHERE i + d <= len(t)
)
SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_cooccur
FROM pairs GROUP BY w1, w2
ORDER BY n_cooccur DESC, w1, w2
LIMIT 30
"""


@register(
    "skipgram_cooccurrence",
    _SKIPGRAM_SQL,
    doc="Skip-gram co-occurrence counts (window 2, unordered pairs "
    "via least/greatest normalization) — the raw statistic under "
    "word2vec-style negative sampling and PMI phrase mining "
    "(token_pmi_bigrams is the adjacent-only special case). Each "
    "position emits at most 2 pairs, so the exploded relation is "
    "2x tokens — linear, and the count aggregate partial-combines "
    "per partition before the single shuffle on the pair key. Top "
    "30 with full deterministic tie-break.",
)
def q_skipgram_cooccurrence(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split(F.trim(F.col("text")), r"\s+").alias("t"))
    pos = toks.select("t", F.posexplode("t").alias("i0", "w"))
    expanded = pos.select(
        "t",
        "i0",
        "w",
        F.explode(F.array(F.lit(1), F.lit(2))).alias("d"),
    ).filter(F.col("i0") + F.col("d") < F.size("t"))
    neighbor = F.element_at("t", F.col("i0") + F.col("d") + 1)
    pairs = expanded.select(
        F.least(F.col("w"), neighbor).alias("w1"),
        F.greatest(F.col("w"), neighbor).alias("w2"),
    )
    return (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("n_cooccur"))
        .orderBy(F.desc("n_cooccur"), "w1", "w2")
        .limit(30)
    )


# --------------------------------------------------------------------------
# Vocabulary spelling-variant detection (edit distance on the vocab grain).
# --------------------------------------------------------------------------

_SPELL_MAX_DIST = 3
_SPELL_LEN_BAND = 2

_SPELL_SQL = f"""
WITH toks AS (
    SELECT unnest(string_split(trim(text), ' ')) AS tok FROM documents
),
v AS (
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf
    FROM toks WHERE tok <> '' GROUP BY tok
),
pairs AS (
    SELECT a.tok AS tok_a, b.tok AS tok_b, a.tf AS tf_a, b.tf AS tf_b,
           CAST(levenshtein(a.tok, b.tok) AS INTEGER) AS dist
    FROM v a JOIN v b
      ON substring(a.tok, 1, 1) = substring(b.tok, 1, 1)
     AND abs(length(a.tok) - length(b.tok)) <= {_SPELL_LEN_BAND}
     AND a.tok < b.tok
)
SELECT tok_a, tok_b, tf_a, tf_b, dist,
       CASE WHEN tf_a > tf_b OR (tf_a = tf_b AND tok_a < tok_b)
            THEN tok_a ELSE tok_b END AS fold_into
FROM pairs
WHERE dist <= {_SPELL_MAX_DIST}
"""


@register(
    "token_spell_variants",
    _SPELL_SQL,
    doc=f"Vocabulary normalization screen: token pairs within "
    f"Levenshtein distance {_SPELL_MAX_DIST} (typo/variant candidates), "
    "with the fold direction a normalizer would apply (low-frequency "
    "token folds into the high-frequency spelling). Runs on the VOCAB "
    "grain — the corpus is reduced to (token, tf) first, which is "
    "Heaps-sublinear in corpus size, so the pairwise stage never sees "
    "a document row. Blocking is an EQUI-join: the probe side fans "
    f"out {2 * _SPELL_LEN_BAND + 1} (first_char, length±{_SPELL_LEN_BAND}) "
    "keys so Spark gets a hash-joinable key instead of an inequality "
    "residual over a skewed first-char bucket; Levenshtein runs only "
    "on blocked candidates (pyspark F.levenshtein — JVM codegen, no "
    "UDF). Scale probe caveat: the K-replica harness salts every "
    "token, so each original token becomes a true K-clique of "
    "variants — output grows ~K^2/2 BY CONSTRUCTION (real "
    "duplication), like the documented eval-twin entries.",
)
def q_token_spell_variants(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    v = (
        docs.select(F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    # Probe side A explodes its key to every length in the +/- band so
    # the join is pure equi on (first_char, length) — bounded 5x fan-out
    # on the (small) vocab frame, no inequality residual.
    a = v.select(
        F.col("tok").alias("tok_a"),
        F.col("tf").alias("tf_a"),
        F.substring("tok", 1, 1).alias("c1"),
        F.explode(
            F.sequence(
                F.length("tok") - _SPELL_LEN_BAND, F.length("tok") + _SPELL_LEN_BAND
            )
        ).alias("blen"),
    ).filter(F.col("blen") >= 1)
    b = v.select(
        F.col("tok").alias("tok_b"),
        F.col("tf").alias("tf_b"),
        F.substring("tok", 1, 1).alias("c1"),
        F.length("tok").alias("blen"),
    )
    pairs = (
        a.join(b, on=["c1", "blen"])
        .filter(F.col("tok_a") < F.col("tok_b"))
        .select(
            "tok_a",
            "tok_b",
            "tf_a",
            "tf_b",
            # bounded levenshtein: -1 above _SPELL_MAX_DIST, exact
            # distance (identical emitted values) below it
            F.levenshtein("tok_a", "tok_b", _SPELL_MAX_DIST)
            .cast("int")
            .alias("dist"),
        )
        .filter(F.col("dist") >= 0)
    )
    return pairs.select(
        "tok_a",
        "tok_b",
        "tf_a",
        "tf_b",
        "dist",
        F.when(
            (F.col("tf_a") > F.col("tf_b"))
            | ((F.col("tf_a") == F.col("tf_b")) & (F.col("tok_a") < F.col("tok_b"))),
            F.col("tok_a"),
        )
        .otherwise(F.col("tok_b"))
        .alias("fold_into"),
    )


# --------------------------------------------------------------------------
# Blocking-quality evaluation for the spell-variant blocking scheme.
# --------------------------------------------------------------------------

_BLOCKEVAL_SQL = f"""
WITH toks AS (
    SELECT unnest(string_split(trim(text), ' ')) AS tok FROM documents
),
v AS (SELECT DISTINCT tok FROM toks WHERE tok <> ''),
truth AS (
    SELECT a.tok AS tok_a, b.tok AS tok_b
    FROM v a JOIN v b ON a.tok < b.tok
    WHERE levenshtein(a.tok, b.tok) <= {_SPELL_MAX_DIST}
),
blocked AS (
    SELECT a.tok AS tok_a, b.tok AS tok_b
    FROM v a JOIN v b
      ON substring(a.tok, 1, 1) = substring(b.tok, 1, 1)
     AND abs(length(a.tok) - length(b.tok)) <= {_SPELL_LEN_BAND}
     AND a.tok < b.tok
),
hits AS (
    SELECT t.tok_a FROM truth t
    JOIN blocked k ON k.tok_a = t.tok_a AND k.tok_b = t.tok_b
)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS vocab_size,
       CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true_pairs,
       CAST((SELECT COUNT(*) FROM blocked) AS BIGINT) AS n_candidates,
       CAST((SELECT COUNT(*) FROM hits) AS BIGINT) AS n_candidate_true,
       CAST((SELECT COUNT(*) FROM hits) * 1000000
            // GREATEST((SELECT COUNT(*) FROM truth), 1) AS BIGINT) AS recall_ppm,
       CAST((SELECT COUNT(*) FROM hits) * 1000000
            // GREATEST((SELECT COUNT(*) FROM blocked), 1) AS BIGINT) AS precision_ppm
"""


@register(
    "spell_blocking_quality_eval",
    _BLOCKEVAL_SQL,
    doc="Blocking-quality evaluation for token_spell_variants' "
    "(first_char, length-band) scheme: exact recall and precision of "
    "the blocked candidate set against the FULL pairwise "
    "ground truth (every vocab pair within the distance threshold). "
    "The ground-truth pass is O(V^2) BY DEFINITION — this is an "
    "eval-twin entry like ann_recall_eval: it exists to certify the "
    "production blocking, runs on the Heaps-sublinear vocab grain, "
    "and is never the serving path. Recall < 1e6 ppm would mean the "
    "length band drops true variants (distance <= 3 pairs can differ "
    "by up to 3 in length; the +/-2 band trades that tail for 5x "
    "bounded fan-out — the measured tradeoff is the point of the "
    "report).",
)
def q_spell_blocking_quality_eval(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    v = (
        docs.select(F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
        .localCheckpoint(eager=False)  # consumed by truth, blocked, and count
    )
    a = v.select(F.col("tok").alias("tok_a"))
    b = v.select(F.col("tok").alias("tok_b"))
    truth = (
        a.crossJoin(b)
        .filter(F.col("tok_a") < F.col("tok_b"))
        .filter(F.levenshtein("tok_a", "tok_b", _SPELL_MAX_DIST) >= 0)
    )
    blocked = (
        v.select(
            F.col("tok").alias("tok_a"),
            F.substring("tok", 1, 1).alias("c1"),
            F.explode(
                F.sequence(
                    F.length("tok") - _SPELL_LEN_BAND, F.length("tok") + _SPELL_LEN_BAND
                )
            ).alias("blen"),
        )
        .filter(F.col("blen") >= 1)
        .join(
            v.select(
                F.col("tok").alias("tok_b"),
                F.substring("tok", 1, 1).alias("c1"),
                F.length("tok").alias("blen"),
            ),
            on=["c1", "blen"],
        )
        .filter(F.col("tok_a") < F.col("tok_b"))
        .select("tok_a", "tok_b")
    )
    hits = truth.join(blocked, on=["tok_a", "tok_b"], how="left_semi")
    out = (
        v.agg(F.count("*").cast("long").alias("vocab_size"))
        .crossJoin(truth.agg(F.count("*").cast("long").alias("n_true_pairs")))
        .crossJoin(blocked.agg(F.count("*").cast("long").alias("n_candidates")))
        .crossJoin(hits.agg(F.count("*").cast("long").alias("n_candidate_true")))
    )
    return out.select(
        "vocab_size",
        "n_true_pairs",
        "n_candidates",
        "n_candidate_true",
        F.expr(
            "CAST(n_candidate_true * 1000000 DIV GREATEST(n_true_pairs, 1) AS BIGINT)"
        ).alias("recall_ppm"),
        F.expr(
            "CAST(n_candidate_true * 1000000 DIV GREATEST(n_candidates, 1) AS BIGINT)"
        ).alias("precision_ppm"),
    )


# ------------- BPE merge learning (3 iterations, tokenizer training) -------------


def _bpe_iter_sql(prev_seg: str, p: str, m: str, nxt_seg: str) -> str:
    """One unrolled BPE iteration: pair counts over the segmented
    vocabulary, deterministic argmax (count DESC, then lexicographic),
    and the merge applied with TWO replace passes (a single
    non-overlapping replace misses boundary-sharing repeats; two
    passes are exact for same-symbol runs <= 5, beyond any natural
    vocabulary — and bit-identical cross-engine either way)."""
    return f"""
{p}idx AS (
    SELECT freq, s, unnest(generate_series(1, len(s) - 1)) AS i
    FROM (SELECT freq, string_split(trim(seg), ' ') AS s FROM {prev_seg})
    WHERE len(s) >= 2
),
{p} AS (
    SELECT s[i] AS left_sym, s[i + 1] AS right_sym, freq FROM {p}idx
),
{m} AS (
    SELECT left_sym, right_sym, CAST(SUM(freq) AS BIGINT) AS pair_count
    FROM {p} GROUP BY 1, 2
    ORDER BY pair_count DESC, left_sym, right_sym LIMIT 1
),
{nxt_seg} AS (
    SELECT freq,
           replace(replace(seg,
                   ' ' || left_sym || ' ' || right_sym || ' ',
                   ' ' || left_sym || right_sym || ' '),
                   ' ' || left_sym || ' ' || right_sym || ' ',
                   ' ' || left_sym || right_sym || ' ') AS seg
    FROM {prev_seg}, {m}
)"""


_BPE_LEARN_SQL = f"""
WITH words AS (
    SELECT lower(w) AS word, CAST(COUNT(*) AS BIGINT) AS freq
    FROM (SELECT unnest(regexp_extract_all(text, '[A-Za-z]+')) AS w FROM documents)
    GROUP BY 1
),
seg0 AS (
    SELECT freq,
           ' ' || array_to_string(regexp_extract_all(word, '[a-z]'), ' ') || ' ' AS seg
    FROM words
),{_bpe_iter_sql("seg0", "p1", "m1", "seg1")},{_bpe_iter_sql("seg1", "p2", "m2", "seg2")},{_bpe_iter_sql("seg2", "p3", "m3", "seg3")}
SELECT CAST(1 AS INTEGER) AS iteration, left_sym, right_sym,
       left_sym || right_sym AS merged, pair_count FROM m1
UNION ALL
SELECT CAST(2 AS INTEGER), left_sym, right_sym,
       left_sym || right_sym, pair_count FROM m2
UNION ALL
SELECT CAST(3 AS INTEGER), left_sym, right_sym,
       left_sym || right_sym, pair_count FROM m3
ORDER BY iteration
"""


def _bpe_pairs(segdf):
    syms = F.split(F.trim(F.col("seg")), " ")
    sized = segdf.select("freq", syms.alias("s")).filter(F.size("s") >= 2)
    ex = sized.select(
        "freq",
        "s",
        F.explode(F.sequence(F.lit(1), F.size("s") - 1)).alias("i"),
    )
    return ex.select(
        F.element_at("s", F.col("i")).alias("left_sym"),
        F.element_at("s", F.col("i") + 1).alias("right_sym"),
        "freq",
    )


def _bpe_argmax(pairs):
    return (
        pairs.groupBy("left_sym", "right_sym")
        .agg(F.sum("freq").cast("long").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
        .limit(1)
    )


def _bpe_apply(segdf, m):
    j = segdf.crossJoin(F.broadcast(m.select("left_sym", "right_sym")))
    seg2 = F.expr(
        "replace(replace(seg,"
        " ' ' || left_sym || ' ' || right_sym || ' ',"
        " ' ' || left_sym || right_sym || ' '),"
        " ' ' || left_sym || ' ' || right_sym || ' ',"
        " ' ' || left_sym || right_sym || ' ')"
    )
    return j.select("freq", seg2.alias("seg"))


@register(
    "bpe_merge_learning",
    _BPE_LEARN_SQL,
    doc="THREE iterations of BPE tokenizer training (extends the "
    "single-round bpe_merge_candidates): pair counts over the "
    "segmented vocabulary, deterministic argmax (count DESC, then "
    "lexicographic), merge applied, repeat — each learned merge can "
    "be a multi-character symbol from the previous round, which is "
    "the part one round can't show. Fully declarative: the argmax is "
    "a 1-row frame broadcast-cross-joined back (no collect, no "
    "driver value), so the whole 3-round recursion is ONE Catalyst "
    "plan; the oracle unrolls the identical three CTE stages. Merge "
    "application is two non-overlapping replace passes (exact for "
    "same-symbol runs <= 5; identical both engines regardless). "
    "Scale: every stage after word counting is vocabulary-grain "
    "(Heaps-law sublinear), the corpus is touched exactly once.",
)
def q_bpe_merge_learning(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(
                F.expr(r"regexp_extract_all(text, '[A-Za-z]+', 0)")
            ).alias("w")
        )
        .select(F.lower(F.col("w")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    seg = words.select(
        "freq",
        F.concat(
            F.lit(" "),
            F.array_join(
                F.expr(r"regexp_extract_all(word, '[a-z]', 0)"), " "
            ),
            F.lit(" "),
        ).alias("seg"),
    )
    outs = []
    for it in (1, 2, 3):
        m = _bpe_argmax(_bpe_pairs(seg)).localCheckpoint(eager=False)
        outs.append(
            m.select(
                F.lit(it).cast("int").alias("iteration"),
                "left_sym",
                "right_sym",
                F.concat(F.col("left_sym"), F.col("right_sym")).alias("merged"),
                "pair_count",
            )
        )
        if it < 3:
            seg = _bpe_apply(seg, m)
    return outs[0].unionByName(outs[1]).unionByName(outs[2]).orderBy("iteration")


_BPE_CURVE_SQL = f"""
WITH words AS (
    SELECT lower(w) AS word, CAST(COUNT(*) AS BIGINT) AS freq
    FROM (SELECT unnest(regexp_extract_all(text, '[A-Za-z]+')) AS w FROM documents)
    GROUP BY 1
),
seg0 AS (
    SELECT freq,
           ' ' || array_to_string(regexp_extract_all(word, '[a-z]'), ' ') || ' ' AS seg
    FROM words
),{_bpe_iter_sql("seg0", "cp1", "cm1", "seg1")},{_bpe_iter_sql("seg1", "cp2", "cm2", "seg2")},{_bpe_iter_sql("seg2", "cp3", "cm3", "seg3")}
SELECT CAST(n_merges AS INTEGER) AS n_merges, corpus_tokens, distinct_symbols
FROM (
    SELECT 0 AS n_merges,
           (SELECT CAST(SUM(freq * len(string_split(trim(seg), ' '))) AS BIGINT)
            FROM seg0) AS corpus_tokens,
           (SELECT CAST(COUNT(DISTINCT s.sym) AS BIGINT)
            FROM seg0, unnest(string_split(trim(seg0.seg), ' ')) s(sym))
               AS distinct_symbols
    UNION ALL
    SELECT 1,
           (SELECT CAST(SUM(freq * len(string_split(trim(seg), ' '))) AS BIGINT)
            FROM seg1),
           (SELECT CAST(COUNT(DISTINCT s.sym) AS BIGINT)
            FROM seg1, unnest(string_split(trim(seg1.seg), ' ')) s(sym))
    UNION ALL
    SELECT 2,
           (SELECT CAST(SUM(freq * len(string_split(trim(seg), ' '))) AS BIGINT)
            FROM seg2),
           (SELECT CAST(COUNT(DISTINCT s.sym) AS BIGINT)
            FROM seg2, unnest(string_split(trim(seg2.seg), ' ')) s(sym))
    UNION ALL
    SELECT 3,
           (SELECT CAST(SUM(freq * len(string_split(trim(seg), ' '))) AS BIGINT)
            FROM seg3),
           (SELECT CAST(COUNT(DISTINCT s.sym) AS BIGINT)
            FROM seg3, unnest(string_split(trim(seg3.seg), ' ')) s(sym))
)
ORDER BY n_merges
"""


@register(
    "bpe_compression_curve",
    _BPE_CURVE_SQL,
    doc="The compression curve that motivates BPE: corpus token count "
    "and alphabet size after 0, 1, 2, 3 learned merges (the same "
    "deterministic merge sequence as bpe_merge_learning). Token count "
    "is monotone non-increasing — each merge round removes exactly "
    "the occurrences it fuses — while the symbol inventory grows by "
    "at most one per round; the ratio of the two IS the "
    "tokens-per-byte economics a tokenizer trades. Scale: "
    "vocabulary-grain (the corpus is scanned once for word counts; "
    "every curve point is an agg over the segmented vocab frame).",
)
def q_bpe_compression_curve(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(
                F.expr(r"regexp_extract_all(text, '[A-Za-z]+', 0)")
            ).alias("w")
        )
        .select(F.lower(F.col("w")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    seg = words.select(
        "freq",
        F.concat(
            F.lit(" "),
            F.array_join(
                F.expr(r"regexp_extract_all(word, '[a-z]', 0)"), " "
            ),
            F.lit(" "),
        ).alias("seg"),
    )

    def _point(segdf, i):
        syms = segdf.select(
            "freq", F.split(F.trim(F.col("seg")), " ").alias("s")
        )
        return (
            syms.select("freq", F.explode("s").alias("sym"))
            .agg(
                F.sum("freq").cast("long").alias("corpus_tokens"),
                F.countDistinct("sym").cast("long").alias("distinct_symbols"),
            )
            .select(
                F.lit(i).cast("int").alias("n_merges"),
                "corpus_tokens",
                "distinct_symbols",
            )
        )

    out = _point(seg, 0)
    for it in (1, 2, 3):
        m = _bpe_argmax(_bpe_pairs(seg)).localCheckpoint(eager=False)
        seg = _bpe_apply(seg, m).localCheckpoint(eager=False)
        out = out.unionByName(_point(seg, it))
    return out.orderBy("n_merges")


# --------------------------------------------- chunk boundary cohesion

_CBC_CHUNK = 32

_CBC_SQL = rf"""
WITH toks AS (
    SELECT doc_id,
           unnest(regexp_extract_all(text, '\S+')) AS token,
           generate_subscripts(regexp_extract_all(text, '\S+'), 1) AS pos
    FROM documents
),
assigned AS (
    SELECT DISTINCT doc_id,
           CAST((pos - 1) // {_CBC_CHUNK} AS BIGINT) AS chunk_id,
           token
    FROM toks
),
sizes AS (
    SELECT doc_id, chunk_id, CAST(COUNT(*) AS BIGINT) AS n_distinct
    FROM assigned GROUP BY doc_id, chunk_id
),
inter AS (
    SELECT a.doc_id, a.chunk_id AS left_chunk,
           CAST(COUNT(*) AS BIGINT) AS n_inter
    FROM assigned a
    JOIN assigned b
      ON b.doc_id = a.doc_id AND b.chunk_id = a.chunk_id + 1
         AND b.token = a.token
    GROUP BY a.doc_id, a.chunk_id
),
boundaries AS (
    SELECT sa.doc_id,
           CAST(COALESCE(i.n_inter, 0) * 1000000
                // (sa.n_distinct + sb.n_distinct - COALESCE(i.n_inter, 0))
                AS BIGINT) AS cohesion_ppm
    FROM sizes sa
    JOIN sizes sb ON sb.doc_id = sa.doc_id
                 AND sb.chunk_id = sa.chunk_id + 1
    LEFT JOIN inter i ON i.doc_id = sa.doc_id
                     AND i.left_chunk = sa.chunk_id
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_boundaries,
       CAST(SUM(cohesion_ppm) // COUNT(*) AS BIGINT) AS mean_cohesion_ppm,
       CAST(MIN(cohesion_ppm) AS BIGINT) AS min_cohesion_ppm,
       CAST(SUM(CASE WHEN cohesion_ppm < 50000 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_weak_boundaries
FROM boundaries GROUP BY doc_id ORDER BY doc_id
"""


@register(
    "chunk_boundary_cohesion",
    _CBC_SQL,
    doc=f"Chunk-boundary cohesion audit: fixed {_CBC_CHUNK}-token "
    "chunks per document, distinct-token Jaccard between every "
    "adjacent chunk pair — the TextTiling-style signal behind "
    "semantic chunking for RAG: a LOW-cohesion boundary is a good "
    "split point, a high-cohesion one cuts a topic in half (and "
    "doc_chunks' fixed stride cuts blindly). Everything is "
    "set-cardinality integer arithmetic at the (doc, chunk, "
    "distinct-token) grain; the adjacent-pair join is equi-keyed "
    "on (doc, chunk+1) so each boundary is built once. Scale: "
    "work is proportional to total distinct chunk-tokens — one "
    "shuffle on doc_id, no cross-document pairs anywhere.",
)
def q_chunk_boundary_cohesion(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)
        ).alias("pos0", "token"),
    )
    assigned = toks.select(
        "doc_id",
        (F.col("pos0") / _CBC_CHUNK).cast("long").alias("chunk_id"),
        "token",
    ).distinct()
    sizes = assigned.groupBy("doc_id", "chunk_id").agg(
        F.count("*").cast("long").alias("n_distinct")
    )
    a = assigned.select(
        F.col("doc_id").alias("da"), F.col("chunk_id").alias("ca"), "token"
    )
    b = assigned.select(
        F.col("doc_id").alias("db"), F.col("chunk_id").alias("cb"),
        F.col("token").alias("tb"),
    )
    inter = (
        a.join(
            b,
            (F.col("db") == F.col("da"))
            & (F.col("cb") == F.col("ca") + 1)
            & (F.col("tb") == F.col("token")),
        )
        .groupBy(F.col("da").alias("doc_id"), F.col("ca").alias("left_chunk"))
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    sa = sizes.select(
        "doc_id", F.col("chunk_id").alias("left_chunk"),
        F.col("n_distinct").alias("na"),
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"),
        (F.col("chunk_id") - 1).alias("left_b"),
        F.col("n_distinct").alias("nb"),
    )
    boundaries = (
        sa.join(
            sb,
            (F.col("doc_b") == F.col("doc_id"))
            & (F.col("left_b") == F.col("left_chunk")),
        )
        .join(inter, ["doc_id", "left_chunk"], "left")
        .select(
            "doc_id",
            F.expr(
                "CAST(COALESCE(n_inter, 0) * 1000000"
                " DIV (na + nb - COALESCE(n_inter, 0)) AS BIGINT)"
            ).alias("cohesion_ppm"),
        )
    )
    return (
        boundaries.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_boundaries"),
            F.expr("CAST(SUM(cohesion_ppm) DIV COUNT(*) AS BIGINT)").alias(
                "mean_cohesion_ppm"
            ),
            F.min("cohesion_ppm").cast("long").alias("min_cohesion_ppm"),
            F.sum(F.when(F.col("cohesion_ppm") < 50000, 1).otherwise(0))
            .cast("long")
            .alias("n_weak_boundaries"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------- LLR signature terms

_LLR_TOPK = 10

#: Dunning log-likelihood ratio of the 2x2 (token x source)
#: contingency: 2 * sum cell*ln(cell) - margins + N ln N, with
#: 0*ln(0) = 0 via CASE. One shared expression per cell from exact
#: integer counts; floor-quantized micro.
_XLNX = "(CASE WHEN {x} > 0 THEN CAST({x} AS DOUBLE) * ln(CAST({x} AS DOUBLE)) ELSE 0.0 END)"
_LLR_MICRO = (
    "CAST(FLOOR(2.0 * ("
    + _XLNX.format(x="a") + " + " + _XLNX.format(x="b")
    + " + " + _XLNX.format(x="c") + " + " + _XLNX.format(x="d")
    + " - " + _XLNX.format(x="a + b") + " - " + _XLNX.format(x="a + c")
    + " - " + _XLNX.format(x="b + d") + " - " + _XLNX.format(x="c + d")
    + " + " + _XLNX.format(x="a + b + c + d")
    + ") * 1000000.0) AS BIGINT)"
)

_LLR_SQL = rf"""
WITH toks AS (
    SELECT source, unnest(regexp_extract_all(text, '\S+')) AS token
    FROM documents
),
cells AS (
    SELECT source, token, CAST(COUNT(*) AS BIGINT) AS k FROM toks
    GROUP BY source, token
),
src_tot AS (SELECT source, CAST(SUM(k) AS BIGINT) AS n1 FROM cells
            GROUP BY source),
tok_tot AS (SELECT token, CAST(SUM(k) AS BIGINT) AS kt FROM cells
            GROUP BY token),
grand AS (SELECT CAST(SUM(k) AS BIGINT) AS nn FROM cells),
scored AS (
    SELECT c.source, c.token,
           c.k AS a,
           t.kt - c.k AS b,
           s.n1 - c.k AS c,
           g.nn - s.n1 - (t.kt - c.k) AS d
    FROM cells c
    JOIN src_tot s ON s.source = c.source
    JOIN tok_tot t ON t.token = c.token
    CROSS JOIN grand g
),
llr AS (
    SELECT source, token, a AS k_in_source,
           {_LLR_MICRO} AS llr_micro
    FROM scored
),
ranked AS (
    SELECT source, token, k_in_source, llr_micro,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY llr_micro DESC, token) AS rnk
    FROM llr
)
SELECT source, CAST(rnk AS BIGINT) AS rnk, token, k_in_source, llr_micro
FROM ranked WHERE rnk <= {_LLR_TOPK}
ORDER BY source, rnk
"""


@register(
    "source_signature_terms_llr",
    _LLR_SQL,
    doc=f"Signature terms per source by Dunning log-likelihood ratio: "
    f"the top-{_LLR_TOPK} tokens whose frequency in a source is most "
    "surprising against the rest of the corpus (the Lin/Hovy "
    "topic-signature method) — the per-SOURCE distinctiveness view "
    "that tfidf_top_terms (per-doc) and token_pmi_bigrams "
    "(per-pair) don't give, and the standard first look at what "
    "makes a crawl source different. The 2x2 contingency per "
    "(source, token) comes from exact integer marginals; the LLR "
    "is ONE shared x*ln(x) expression per cell (0 ln 0 = 0 via "
    "CASE), floor-quantized micro; top-k per source by integer "
    "rank. Scale: everything runs at the (source x vocab) cell "
    "grain after one token pass — the rank window partitions by "
    "source.",
)
def q_source_signature_terms_llr(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)
        ).alias("token"),
    )
    cells = toks.groupBy("source", "token").agg(
        F.count("*").cast("long").alias("k")
    ).localCheckpoint(eager=False)
    src_tot = cells.groupBy("source").agg(F.sum("k").cast("long").alias("n1"))
    tok_tot = cells.groupBy("token").agg(F.sum("k").cast("long").alias("kt"))
    grand = cells.agg(F.sum("k").cast("long").alias("nn"))
    scored = (
        cells.join(F.broadcast(src_tot), "source")
        .join(tok_tot, "token")
        .crossJoin(F.broadcast(grand))
        .select(
            "source",
            "token",
            F.col("k").alias("a"),
            (F.col("kt") - F.col("k")).alias("b"),
            (F.col("n1") - F.col("k")).alias("c"),
            (F.col("nn") - F.col("n1") - (F.col("kt") - F.col("k"))).alias("d"),
        )
    )
    from pyspark.sql.window import Window

    llr = scored.select(
        "source",
        "token",
        F.col("a").alias("k_in_source"),
        F.expr(_LLR_MICRO).alias("llr_micro"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("llr_micro").desc(), "token"
    )
    return (
        llr.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= _LLR_TOPK)
        .select("source", "rnk", "token", "k_in_source", "llr_micro")
        .orderBy("source", "rnk")
    )


# --------------------------------------------- RAKE keyphrase extraction

#: Deterministic stopword list for phrase segmentation (the fixture
#: vocabulary is synthetic; the MECHANISM is what the operator pins).
_RAKE_STOPWORDS = (
    "the a an and or of to in is are was were be been with for on at by "
    "from as it this that these those"
).split()
_RAKE_TOPK = 20
_RAKE_MAX_PHRASE = 4


def _rake_sql() -> str:
    stops = ", ".join(f"'{w}'" for w in _RAKE_STOPWORDS)
    return rf"""
WITH toks AS (
    SELECT doc_id,
           lower(unnest(regexp_extract_all(text, '\S+'))) AS token,
           generate_subscripts(regexp_extract_all(text, '\S+'), 1) AS pos
    FROM documents
),
marked AS (
    SELECT doc_id, token, pos,
           CASE WHEN token IN ({stops}) THEN 1 ELSE 0 END AS is_stop
    FROM toks
),
segmented AS (
    SELECT doc_id, token, pos, is_stop,
           CAST(SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos)
                AS BIGINT) AS phrase_id
    FROM marked
),
phrase_words AS (
    SELECT doc_id, phrase_id, token, pos FROM segmented WHERE is_stop = 0
),
phrase_sizes AS (
    SELECT doc_id, phrase_id, CAST(COUNT(*) AS BIGINT) AS plen
    FROM phrase_words GROUP BY doc_id, phrase_id
),
word_stats AS (
    SELECT w.token,
           CAST(COUNT(*) AS BIGINT) AS freq,
           CAST(SUM(s.plen) AS BIGINT) AS degree
    FROM phrase_words w
    JOIN phrase_sizes s ON s.doc_id = w.doc_id AND s.phrase_id = w.phrase_id
    WHERE s.plen <= {_RAKE_MAX_PHRASE}
    GROUP BY w.token
),
phrases AS (
    SELECT w.doc_id, w.phrase_id,
           string_agg(w.token, ' ' ORDER BY w.pos) AS phrase,
           CAST(SUM(ws.degree * 1000 // ws.freq) AS BIGINT) AS score_milli
    FROM phrase_words w
    JOIN phrase_sizes s ON s.doc_id = w.doc_id AND s.phrase_id = w.phrase_id
    JOIN word_stats ws ON ws.token = w.token
    WHERE s.plen <= {_RAKE_MAX_PHRASE}
    GROUP BY w.doc_id, w.phrase_id
),
dedup AS (
    SELECT phrase,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MAX(score_milli) AS BIGINT) AS score_milli
    FROM phrases GROUP BY phrase
)
SELECT phrase, n_occurrences, score_milli
FROM dedup
ORDER BY score_milli DESC, phrase
LIMIT {_RAKE_TOPK}
"""


@register(
    "rake_keyphrases",
    _rake_sql(),
    doc=f"RAKE keyphrase extraction: split each document into "
    "candidate phrases at stopword boundaries, score every content "
    "word by degree/frequency over co-occurring phrase members, and "
    "score a phrase as the sum of its words — the classic "
    f"unsupervised keyphrase method, corpus top-{_RAKE_TOPK}. Phrase "
    "segmentation is a cumulative stopword-count window per doc "
    "(no regex backtracking); word scores are exact milli via "
    "degree*1000 DIV freq quantized per WORD before the phrase "
    "sum; phrase text is an ORDER BY position string_agg (the "
    "sort_array/string_agg determinism idiom). Scale: one token "
    "pass, one per-doc window, then vocabulary- and phrase-grain "
    "aggregates; the phrase-length cap bounds the degree join.",
)
def q_rake_keyphrases(spark, sf_dir):
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)
        ).alias("pos0", "raw"),
    ).select(
        "doc_id", F.lower(F.col("raw")).alias("token"), (F.col("pos0") + 1).alias("pos")
    )
    marked = toks.withColumn(
        "is_stop",
        F.when(F.col("token").isin(*_RAKE_STOPWORDS), 1).otherwise(0),
    )
    w_seg = Window.partitionBy("doc_id").orderBy("pos")
    segmented = marked.withColumn(
        "phrase_id", F.sum("is_stop").over(w_seg).cast("long")
    )
    phrase_words = segmented.filter(F.col("is_stop") == 0).select(
        "doc_id", "phrase_id", "token", "pos"
    ).localCheckpoint(eager=False)
    phrase_sizes = phrase_words.groupBy("doc_id", "phrase_id").agg(
        F.count("*").cast("long").alias("plen")
    )
    bounded = phrase_words.join(
        phrase_sizes.filter(F.col("plen") <= _RAKE_MAX_PHRASE),
        ["doc_id", "phrase_id"],
    )
    word_stats = bounded.groupBy("token").agg(
        F.count("*").cast("long").alias("freq"),
        F.sum("plen").cast("long").alias("degree"),
    )
    phrases = (
        bounded.join(F.broadcast(word_stats), "token")
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(pos, token))),"
                " s -> s.token), ' ')"
            ).alias("phrase"),
            F.sum(F.expr("degree * 1000 DIV freq")).cast("long").alias(
                "score_milli"
            ),
        )
    )
    dedup = phrases.groupBy("phrase").agg(
        F.count("*").cast("long").alias("n_occurrences"),
        F.max("score_milli").cast("long").alias("score_milli"),
    )
    return dedup.orderBy(F.col("score_milli").desc(), "phrase").limit(_RAKE_TOPK)


# --------------------------------------------- Yule's K vocab richness

_YULE_SQL = r"""
WITH toks AS (
    SELECT source, unnest(regexp_extract_all(text, '\S+')) AS token
    FROM documents
),
freqs AS (
    SELECT source, token, CAST(COUNT(*) AS BIGINT) AS f FROM toks
    GROUP BY source, token
),
spectrum AS (
    SELECT source, f, CAST(COUNT(*) AS BIGINT) AS v_f
    FROM freqs GROUP BY source, f
),
comp AS (
    SELECT source,
           CAST(SUM(f * v_f) AS BIGINT) AS n_tokens,
           CAST(SUM(v_f) AS BIGINT) AS vocab,
           CAST(SUM(CASE WHEN f = 1 THEN v_f ELSE 0 END) AS BIGINT) AS hapax,
           CAST(SUM(f * f * v_f) AS BIGINT) AS m2
    FROM spectrum GROUP BY source
)
SELECT source, n_tokens, vocab, hapax,
       CAST(hapax * 1000000 // vocab AS BIGINT) AS hapax_share_ppm,
       CAST(CAST(m2 - n_tokens AS HUGEINT) * 10000000000
            // (CAST(n_tokens AS HUGEINT) * n_tokens) AS BIGINT)
           AS yule_k_deci
FROM comp ORDER BY source
"""


@register(
    "vocab_yule_k",
    _YULE_SQL,
    doc="Vocabulary richness per source: Yule's K = 1e4 * "
    "(SUM f^2*V_f - N) / N^2 from the frequency SPECTRUM (how many "
    "types occur f times) plus the hapax-legomena share — K is "
    "length-invariant where type/token ratios are not, which makes "
    "it the right cross-source repetitiveness comparator next to "
    "token_zipf_constant (rank law) and doc_token_entropy "
    "(per-doc). Everything is exact integer arithmetic on the "
    "spectrum grain; the N^2 denominator runs in HUGEINT/DECIMAL "
    "on the 20-row frame (deci-K units: 10*K). Scale: tokens -> "
    "(source, token) counts -> (source, f) spectrum, each "
    "map-combinable; the spectrum is tiny by Heaps' law.",
)
def q_vocab_yule_k(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)
        ).alias("token"),
    )
    freqs = toks.groupBy("source", "token").agg(
        F.count("*").cast("long").alias("f")
    )
    spectrum = freqs.groupBy("source", "f").agg(
        F.count("*").cast("long").alias("v_f")
    )
    comp = spectrum.groupBy("source").agg(
        F.sum(F.col("f") * F.col("v_f")).cast("long").alias("n_tokens"),
        F.sum("v_f").cast("long").alias("vocab"),
        F.sum(F.when(F.col("f") == 1, F.col("v_f")).otherwise(0))
        .cast("long")
        .alias("hapax"),
        F.sum(F.col("f") * F.col("f") * F.col("v_f")).cast("long").alias("m2"),
    )
    return comp.select(
        "source",
        "n_tokens",
        "vocab",
        "hapax",
        F.expr("CAST(hapax * 1000000 DIV vocab AS BIGINT)").alias(
            "hapax_share_ppm"
        ),
        F.expr(
            "CAST(CAST(m2 - n_tokens AS DECIMAL(38,0)) * 10000000000"
            " DIV (CAST(n_tokens AS DECIMAL(38,0)) * n_tokens) AS BIGINT)"
        ).alias("yule_k_deci"),
    ).orderBy("source")


# ---------------------- Heaps-law exponent fit over the checkpoints

#: log-log OLS over the 10 checkpoint points, the Weibull-plot
#: discipline: both coordinates floor-quantize to micro from exact
#: integers BEFORE the OLS sums, so sx/sy/sxy/sxx are exact int64 and
#: the slope/intercept are each ONE shared IEEE expression.
_HEAPS_X = "CAST(FLOOR(ln(CAST(cum_tokens AS DOUBLE)) * 1000000.0) AS BIGINT)"
_HEAPS_Y = "CAST(FLOOR(ln(CAST(cum_vocab AS DOUBLE)) * 1000000.0) AS BIGINT)"
_HEAPS_BETA_RAW = (
    "((CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE)"
    "    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
)
_HEAPS_BETA_MILLI = f"CAST(FLOOR({_HEAPS_BETA_RAW} * 1000.0) AS BIGINT)"
_HEAPS_LNK_MICRO = (
    f"CAST(FLOOR((CAST(sy AS DOUBLE) - {_HEAPS_BETA_RAW}"
    " * CAST(sx AS DOUBLE)) / CAST(np AS DOUBLE)) AS BIGINT)"
)

_HEAPS_FIT_SQL = f"""
WITH {_HEAPS_CTES},
ckpt AS ({_HEAPS_TAIL}),
pts AS (
    SELECT {_HEAPS_X} AS x, {_HEAPS_Y} AS y FROM ckpt
),
sums AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS np,
           CAST(SUM(x) AS BIGINT) AS sx,
           CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x * y) AS BIGINT) AS sxy,
           CAST(SUM(x * x) AS BIGINT) AS sxx
    FROM pts
)
SELECT np, sx, sy, sxy, sxx,
       {_HEAPS_BETA_MILLI} AS beta_milli,
       {_HEAPS_LNK_MICRO} AS lnk_micro
FROM sums
"""


@register(
    "heaps_law_fit",
    _HEAPS_FIT_SQL,
    doc="Heaps-law exponent fit: log-log OLS over "
    "vocab_growth_checkpoints' 10 (cum_tokens, cum_vocab) points "
    "yields V ~ K*n^beta — beta_milli ~500-800 is natural text, "
    "beta near 0 means vocabulary saturation (more data buys no "
    "coverage), near 1000 flags template/id-heavy corpora. The "
    "scalar the growth-curve entry's table asks the reader to "
    "eyeball, fitted exactly: both log coordinates floor-quantize "
    "to micro from exact integer counts BEFORE the OLS sums (the "
    "interevent_weibull_shape plot discipline), so only the final "
    "slope/intercept are shared IEEE expressions. Scale: the fit "
    "runs on the 10-row checkpoint frame; the checkpoints remain "
    "one first-occurrence min-aggregate over the token explode.",
)
def q_heaps_law_fit(spark, sf_dir):
    ckpt = q_vocab_growth_checkpoints(spark, sf_dir)
    pts = ckpt.select(
        F.expr(_HEAPS_X).alias("x"), F.expr(_HEAPS_Y).alias("y")
    )
    sums = pts.agg(
        F.count("*").cast("long").alias("np"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("x * y")).cast("long").alias("sxy"),
        F.sum(F.expr("x * x")).cast("long").alias("sxx"),
    )
    return sums.select(
        "np",
        "sx",
        "sy",
        "sxy",
        "sxx",
        F.expr(_HEAPS_BETA_MILLI).alias("beta_milli"),
        F.expr(_HEAPS_LNK_MICRO).alias("lnk_micro"),
    )


# --------------------------------------------------------------------------
# Round 9: per-source document-length distribution profile.
# --------------------------------------------------------------------------

_DOC_LEN_PCT_SQL = f"""
WITH toks AS (
    SELECT source, {_C_TOK} AS n_tokens FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(quantile_disc(n_tokens, 0.25) AS BIGINT) AS p25_tokens,
       CAST(quantile_disc(n_tokens, 0.5) AS BIGINT) AS p50_tokens,
       CAST(quantile_disc(n_tokens, 0.75) AS BIGINT) AS p75_tokens,
       CAST(quantile_disc(n_tokens, 0.95) AS BIGINT) AS p95_tokens,
       CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
       CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
FROM toks GROUP BY source ORDER BY source
"""


@register(
    "doc_length_percentiles_by_source",
    _DOC_LEN_PCT_SQL,
    doc="Per-source token-length distribution (p25/p50/p75/p95 via "
    "percentile_disc — actual integer data values, so the whole "
    "surface is exact) — the curation readout that sizes context "
    "windows, packing targets, and truncation budgets per source "
    "BEFORE mixing (companions: packing_efficiency_report consumes "
    "the packing target this profiles; source_mixture_token_"
    "allocation consumes the totals). Scale: the whitespace token "
    "count is scan-local; percentile_disc is one sort-based agg per "
    "source group.",
)
def q_doc_length_percentiles_by_source(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "source", token_count_col(F.col("text")).alias("n_tokens")
    )
    agg = [F.count("*").cast("long").alias("n_docs")]
    for p, name in (
        (0.25, "p25_tokens"),
        (0.5, "p50_tokens"),
        (0.75, "p75_tokens"),
        (0.95, "p95_tokens"),
    ):
        agg.append(
            F.expr(
                f"percentile_disc({p}) WITHIN GROUP (ORDER BY n_tokens)"
            )
            .cast("long")
            .alias(name)
        )
    agg.append(F.min("n_tokens").cast("long").alias("min_tokens"))
    agg.append(F.max("n_tokens").cast("long").alias("max_tokens"))
    return docs.groupBy("source").agg(*agg).orderBy("source")


# --------------------------------------------------------------------------
# Round 9 fourth wave: MATTR moving-average type-token ratio.
# --------------------------------------------------------------------------

_MATTR_W = 25

_MATTR_SQL = f"""
WITH t AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
    FROM documents
),
m AS (
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
           CASE WHEN len(toks) >= {_MATTR_W}
                THEN CAST(list_sum(list_transform(
                         range(1, len(toks) - {_MATTR_W} + 2),
                         i -> len(list_distinct(
                                  toks[i:i + {_MATTR_W} - 1]))))
                     AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS win_type_sum
    FROM t
)
SELECT doc_id, n_tokens, n_types, win_type_sum,
       CASE WHEN n_tokens >= {_MATTR_W}
            THEN CAST(win_type_sum * 1000000
                      // ({_MATTR_W} * (n_tokens - {_MATTR_W} + 1))
                 AS BIGINT)
            ELSE CAST(n_types * 1000000 // n_tokens AS BIGINT)
       END AS mattr_ppm
FROM m
"""


@register(
    "mattr_lexical_diversity",
    _MATTR_SQL,
    doc=f"MATTR lexical diversity (Covington & McFall 2010): the "
    f"type-token ratio averaged over every sliding {_MATTR_W}-token "
    "window, the length-invariant replacement for raw TTR (raw TTR "
    "falls mechanically with document length, so comparing docs of "
    "different sizes with it is the classic corpus-stats mistake; "
    "vocab_yule_k fixes length-dependence via repeat-rate, MATTR "
    "fixes it by windowing — the two standard spellings). Docs "
    "shorter than the window fall back to plain TTR, flagged by "
    "win_type_sum = 0. Entirely scan-local array arithmetic inside "
    "the row (slice + distinct per window, integer ppm at the end): "
    "zero shuffle, zero float, O(n_tokens x W) work per document — "
    "linear in corpus bytes at fixed W. Window distinct counts stay "
    "exact integers, so both engines agree bit-for-bit.",
)
def q_mattr_lexical_diversity(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    w = _MATTR_W
    t = docs.select("doc_id", toks.alias("toks"))
    win_sum = F.expr(
        f"aggregate(transform(sequence(1, size(toks) - {w} + 1),"
        f" i -> CAST(size(array_distinct(slice(toks, i, {w}))) AS BIGINT)),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    m = t.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_types"),
        F.when(F.size("toks") >= w, win_sum)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("win_type_sum"),
    )
    return m.select(
        "doc_id",
        "n_tokens",
        "n_types",
        "win_type_sum",
        F.when(
            F.col("n_tokens") >= w,
            F.expr(
                f"CAST(win_type_sum * 1000000"
                f" DIV ({w} * (n_tokens - {w} + 1)) AS BIGINT)"
            ),
        )
        .otherwise(F.expr("CAST(n_types * 1000000 DIV n_tokens AS BIGINT)"))
        .cast("long")
        .alias("mattr_ppm"),
    )


# --------------------------------------------------------------------------
# Round 9 fourth wave: Jensen-Shannon vocabulary drift between source halves.
# --------------------------------------------------------------------------

#: Per-token JSD contribution, quantized to DECIMAL(28,12) per term
#: before the sum (AP-sum discipline). pa = ca/na, pb = cb/nb,
#: m = (pa+pb)/2; zero counts contribute zero to their own side
#: (0 ln 0 = 0) via the CASE guards.
_JSD_TERM = (
    "CAST(0.5 * ("
    " CASE WHEN ca > 0 THEN (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))"
    "      * ln((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))"
    "           / ((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)"
    "               + CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) / 2.0))"
    "      ELSE 0.0 END"
    " + CASE WHEN cb > 0 THEN (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))"
    "      * ln((CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))"
    "           / ((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)"
    "               + CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) / 2.0))"
    "      ELSE 0.0 END"
    ") AS DECIMAL(28,12))"
)

_JSD_SQL = f"""
WITH toks AS (
    SELECT CAST(substring(source, 4, 10) AS INTEGER) % 2 = 0 AS side_a,
           unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
    FROM documents
),
counts AS (
    SELECT tok,
           CAST(SUM(CASE WHEN side_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
           CAST(SUM(CASE WHEN side_a THEN 0 ELSE 1 END) AS BIGINT) AS cb
    FROM toks GROUP BY tok
),
tot AS (
    SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
    FROM counts
),
s AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab,
           MAX(t.na) AS na, MAX(t.nb) AS nb,
           CAST(SUM({_JSD_TERM}) AS DOUBLE) AS jsd_nats
    FROM counts CROSS JOIN tot t
)
SELECT n_vocab, na, nb,
       CAST(FLOOR(jsd_nats * 1000000.0) AS BIGINT) AS jsd_micro,
       CAST(FLOOR(jsd_nats / ln(2.0) * 1000.0) AS BIGINT)
           AS jsd_normalized_milli
FROM s
"""


@register(
    "vocab_jsd_source_drift",
    _JSD_SQL,
    doc="Jensen-Shannon divergence between the unigram vocabulary "
    "distributions of the even- and odd-numbered source halves — "
    "the symmetric, bounded (<= ln 2) distribution-drift scalar for "
    "CATEGORICAL distributions, complementing order_value_psi_drift "
    "(binned-numeric PSI) and spend_ks_test / wasserstein (continuous "
    "CDF distances): the monitoring readout a data-mixing pipeline "
    "tracks to detect one source family drifting away from another "
    "before retraining. Token counts reduce exactly; each token's "
    "JSD contribution is ONE shared-IEEE expression (0 ln 0 = 0 "
    "guarded by integer CASE) quantized per-term to DECIMAL(28,12) "
    "before the order-free sum; the normalized column divides by "
    "ln 2 into exact milli of the [0,1] scale. Scale: one "
    "explode + token-grain reduce (the vocab frame), then a 1-row "
    "summary — the token_doc_freq cost shape.",
)
def q_vocab_jsd_source_drift(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        (F.substring("source", 4, 10).cast("int") % 2 == 0).alias(
            "side_a"
        ),
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    )
    counts = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("side_a"), 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("side_a"), 0).otherwise(1))
        .cast("long")
        .alias("cb"),
    )
    tot = counts.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
    )
    s = counts.crossJoin(F.broadcast(tot)).agg(
        F.count("*").cast("long").alias("n_vocab"),
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
        F.sum(F.expr(_JSD_TERM)).cast("double").alias("jsd_nats"),
    )
    return s.select(
        "n_vocab",
        "na",
        "nb",
        F.floor(F.col("jsd_nats") * 1000000.0).cast("long").alias(
            "jsd_micro"
        ),
        F.expr(
            "CAST(FLOOR(jsd_nats / ln(2.0) * 1000.0) AS BIGINT)"
        ).alias("jsd_normalized_milli"),
    )


# --------------------------------------------------------------------------
# Round 9 fourth wave: TextRank keyword ranking (weighted PageRank
# over the token co-occurrence graph).
# --------------------------------------------------------------------------

_TR_SCALE = 1_000_000_000_000  # fixed-point 1e12 (the pagerank scale)
_TR_BASE_NUM = 150_000_000_000  # 0.15 * scale
_TR_ITER = 3


def _textrank_sql() -> str:
    head = f"""
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
    FROM documents
),
adj AS (
    SELECT t[i] AS a, t[i + 1] AS b
    FROM toks, unnest(range(1, len(t))) AS u(i)
),
edges AS (
    SELECT a, b, CAST(COUNT(*) AS BIGINT) AS w
    FROM (SELECT a, b FROM adj UNION ALL SELECT b AS a, a AS b FROM adj)
    GROUP BY a, b
),
wout AS (SELECT a, CAST(SUM(w) AS BIGINT) AS wtot FROM edges GROUP BY a),
nodes AS (SELECT a AS node FROM wout),
nn AS (SELECT CAST({_TR_BASE_NUM} // COUNT(*) AS BIGINT) AS base
       FROM nodes),
p0 AS (SELECT node, CAST({_TR_SCALE} AS BIGINT) AS v FROM nodes)"""
    steps = []
    for k in range(1, _TR_ITER + 1):
        steps.append(f"""
p{k} AS (
    SELECT e.b AS node,
           CAST((SELECT base FROM nn)
                + (85 * SUM(p.v * e.w // wo.wtot)) // 100 AS BIGINT) AS v
    FROM p{k - 1} p
    JOIN wout wo ON wo.a = p.node
    JOIN edges e ON e.a = p.node
    GROUP BY e.b
)""")
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
SELECT n.node AS token, wo.wtot AS cooccurrence_mass,
       pf.v AS textrank_fp
FROM nodes n
JOIN wout wo ON wo.a = n.node
JOIN p{_TR_ITER} pf ON pf.node = n.node
ORDER BY token
"""
    )


@register(
    "textrank_keywords",
    _textrank_sql(),
    doc=f"TextRank keyword ranking (Mihalcea & Tarau 2004): weighted "
    f"PageRank ({_TR_ITER} iterations, damping 0.85) over the "
    "corpus token co-occurrence graph — adjacent-token edges "
    "generated SCAN-LOCALLY inside each row (position-indexed array "
    "access, no token self-join), symmetrized, weighted by "
    "co-occurrence count. The graph-centrality complement to the "
    "frequency family (tfidf_top_terms, RAKE, LLR signatures): a "
    "token ranks high when its NEIGHBORS rank high, not merely when "
    "it is common. All rank arithmetic is fixed-point integer at "
    "the pagerank scale (per-edge v*w DIV wtot floors once per "
    "term), so three compounded iterations stay bit-exact across "
    "engines and aggregation orders; the oracle unrolls the same "
    "iterations as chained CTEs. Scale: edges bound by corpus "
    "adjacency (linear in tokens), rank frames bound by VOCABULARY; "
    "each iteration is one join + one shuffle on the vocab grain.",
)
def q_textrank_keywords(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    adj = docs.select(toks.alias("t")).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(element_at(t, i) AS a,"
                "             element_at(t, i + 1) AS b))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    sym = adj.unionByName(
        adj.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    edges = (
        sym.groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("w"))
        .localCheckpoint(eager=False)
    )
    wout = edges.groupBy("a").agg(F.sum("w").cast("long").alias("wtot"))
    nodes = wout.select(F.col("a").alias("node"))
    nn = nodes.agg(
        F.expr(f"CAST({_TR_BASE_NUM} DIV COUNT(*) AS BIGINT)").alias("base")
    )
    p = nodes.select("node", F.lit(_TR_SCALE).cast("long").alias("v"))
    for _ in range(_TR_ITER):
        p = (
            p.join(wout, p.node == wout.a)
            .join(
                edges.select(
                    F.col("a").alias("ea"),
                    F.col("b").alias("eb"),
                    "w",
                ),
                F.col("node") == F.col("ea"),
            )
            .crossJoin(F.broadcast(nn))
            .groupBy(F.col("eb").alias("node"))
            .agg(
                F.expr(
                    "CAST(MAX(base)"
                    " + (85 * SUM(v * w DIV wtot)) DIV 100 AS BIGINT)"
                ).alias("v")
            )
        )
    return (
        nodes.join(wout, nodes.node == wout.a)
        .join(p.withColumnRenamed("v", "textrank_fp"), on="node")
        .select(
            F.col("node").alias("token"),
            F.col("wtot").alias("cooccurrence_mass"),
            "textrank_fp",
        )
        .orderBy("token")
    )


# --------------------------------------------------------------------------
# Round 9 fourth wave: Church-Gale term burstiness profile.
# --------------------------------------------------------------------------

_BURST_TOP_DF = 20

_BURSTINESS_SQL = f"""
WITH tf AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
    FROM documents
),
per_doc AS (
    SELECT tok, doc_id, CAST(COUNT(*) AS BIGINT) AS c
    FROM tf GROUP BY tok, doc_id
),
ndocs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
stats AS (
    SELECT tok,
           CAST(COUNT(*) AS BIGINT) AS df,
           CAST(SUM(c) AS BIGINT) AS cf,
           CAST(SUM(c * c) AS BIGINT) AS cf2
    FROM per_doc GROUP BY tok
),
top AS (
    SELECT s.tok, s.df, s.cf, s.cf2, nd.n
    FROM stats s CROSS JOIN ndocs nd
    ORDER BY s.df DESC, s.tok
    LIMIT {_BURST_TOP_DF}
)
SELECT tok AS token, df, cf,
       CAST(cf * 1000 // df AS BIGINT) AS burstiness_milli,
       CAST((n * cf2 - cf * cf) * 1000 // (cf * n) AS BIGINT)
           AS vmr_milli,
       n * cf2 - cf * cf > n * cf AS overdispersed
FROM top
ORDER BY df DESC, tok
"""


@register(
    "term_burstiness_profile",
    _BURSTINESS_SQL,
    doc=f"Church-Gale term burstiness for the top-{_BURST_TOP_DF} "
    "document-frequency terms: burstiness = cf/df (mean occurrences "
    "per CONTAINING document — Church & Gale 1995's observation "
    "that content words recur within documents while function "
    "words spread evenly), the corpus-wide variance-to-mean ratio "
    "of per-document counts (VMR > 1 = overdispersed vs Poisson, "
    "computed over ALL documents including zeros via the n*cf2 "
    "identity var = (n*cf2 - cf^2)/n^2), and the exact "
    "overdispersion verdict from the cleared-denominator integer "
    "comparison VMR > 1 <=> n*cf2 - cf^2 > n*cf (exact counts, "
    "zero float). The "
    "distributional complement to token_zipf_constant (rank law) "
    "and doc_token_entropy (within-doc): WHERE repetition lives "
    "across documents — the signal that separates topical terms "
    "from glue. Scale: one explode to the (token, doc) grain, one "
    "token-grain reduce, a top-K head.",
)
def q_term_burstiness_profile(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    tf = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    )
    per_doc = tf.groupBy("tok", "doc_id").agg(
        F.count("*").cast("long").alias("c")
    )
    ndocs = docs.agg(F.count("*").cast("long").alias("n"))
    stats = per_doc.groupBy("tok").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("c").cast("long").alias("cf"),
        F.sum(F.expr("c * c")).cast("long").alias("cf2"),
    )
    top = (
        stats.crossJoin(F.broadcast(ndocs))
        .orderBy(F.col("df").desc(), "tok")
        .limit(_BURST_TOP_DF)
    )
    return top.select(
        F.col("tok").alias("token"),
        "df",
        "cf",
        F.expr("CAST(cf * 1000 DIV df AS BIGINT)").alias(
            "burstiness_milli"
        ),
        F.expr(
            "CAST((n * cf2 - cf * cf) * 1000 DIV (cf * n) AS BIGINT)"
        ).alias("vmr_milli"),
        (
            F.col("n") * F.col("cf2") - F.col("cf") * F.col("cf")
            > F.col("n") * F.col("cf")
        ).alias("overdispersed"),
    ).orderBy(F.col("df").desc(), "token")
