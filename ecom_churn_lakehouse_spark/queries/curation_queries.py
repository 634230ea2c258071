"""Training-corpus curation operators beyond dedup: sequence packing,
intra-document repetition detection, and PII scrubbing.

These are the pre-training data-prep steps a 100 TB pipeline runs after
filtering/dedup (corpus_curation) and before tokenization:

- **Sequence packing** assigns documents to fixed token-budget bins so
  downstream training reads dense, equal-work shards. The packing is
  per-source and order-deterministic, so it parallelizes by source
  partition and reproduces bit-identically at any cluster size.
- **Repetition detection** flags boilerplate/degenerate documents by
  the fraction of repeated word trigrams — entirely scan-local (array
  ops inside the row, no explode, no shuffle).
- **PII scrubbing** counts and redacts email/phone patterns. The
  fixture corpus contains no PII, so the query synthesizes a contact
  string from customer records and then proves the scrubber removes
  exactly what the counters saw — counters and redaction are the same
  regex, so the oracle catches a drifting pattern on either side.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ecom_churn_lakehouse_spark.registry import register
from ecom_churn_lakehouse_spark.sources import load_table

# ---------------------------------------------------------------------------
# Sequence packing: contiguous token-budget bins per source shard.
# ---------------------------------------------------------------------------

#: Power of two → prior_tokens / 512 is an exact double division, so
#: FLOOR can never disagree between engines.
_PACK_BUDGET = 512

_PACKING_SQL = f"""
WITH toks AS (
    SELECT source, doc_id,
           CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
    FROM documents
),
packed AS (
    SELECT source, n_tokens,
           CAST(FLOOR(
               COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / {_PACK_BUDGET}.0) AS BIGINT) AS bin_id
    FROM toks
)
SELECT source, bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
FROM packed
GROUP BY source, bin_id
"""


@register(
    "doc_sequence_packing",
    _PACKING_SQL,
    doc="Sequence packing for training shards: docs fill contiguous "
    f"{_PACK_BUDGET}-token bins in (source, doc_id) order — bin id is "
    "the exclusive running token count divided by the budget, so a doc "
    "that straddles a boundary starts the next bin's overflow (standard "
    "contiguous-fill packing). The window partitions by source, so at "
    "100 TB each source shard packs independently — no global sort, no "
    "single-task bottleneck. Emits per-bin occupancy for shard sizing.",
)
def q_doc_sequence_packing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        "doc_id",
        F.regexp_count("text", F.lit(r"\S+")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    packed = toks.select(
        "source",
        "n_tokens",
        F.floor(prior / F.lit(float(_PACK_BUDGET))).cast("long").alias("bin_id"),
    )
    return packed.groupBy("source", "bin_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("bin_tokens"),
    )


# ---------------------------------------------------------------------------
# Repetition / boilerplate detection: repeated-trigram ratio per doc.
# ---------------------------------------------------------------------------

_REPETITION_SQL = """
WITH tri AS (
    SELECT doc_id, t,
           list_transform(
               range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
           ) AS tris
    FROM (
        SELECT doc_id, regexp_extract_all(trim(text), '\\S+') AS t
        FROM documents
    )
    WHERE len(t) >= 3
)
SELECT doc_id,
       CAST(len(tris) AS BIGINT) AS n_trigrams,
       CAST(len(list_distinct(tris)) AS BIGINT) AS n_distinct_trigrams,
       ROUND(1.0 - len(list_distinct(tris)) / CAST(len(tris) AS DOUBLE), 6)
           AS repetition_ratio
FROM tri
"""


@register(
    "doc_repetition",
    _REPETITION_SQL,
    doc="Boilerplate/repetition scoring: fraction of word trigrams that "
    "are repeats within the document (1 - distinct/total). Pure "
    "array expressions inside the row — zero shuffle, stays in "
    "whole-stage codegen, scales linearly with corpus bytes. The "
    "standard filter for looped/templated text before pre-training.",
)
def q_doc_repetition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    with_toks = docs.select("doc_id", toks.alias("__toks")).filter(
        F.size("__toks") >= 3
    )
    idx = F.sequence(F.lit(1), F.size("__toks") - 2)
    tris = F.transform(idx, lambda i: F.array_join(F.slice("__toks", i, 3), " "))
    scored = with_toks.select(
        "doc_id",
        F.size(tris).cast("long").alias("n_trigrams"),
        F.size(F.array_distinct(tris)).cast("long").alias("n_distinct_trigrams"),
    )
    return scored.select(
        "doc_id",
        "n_trigrams",
        "n_distinct_trigrams",
        F.round(
            1.0
            - F.col("n_distinct_trigrams") / F.col("n_trigrams").cast("double"),
            6,
        ).alias("repetition_ratio"),
    )


# ---------------------------------------------------------------------------
# PII scrubbing: detect + redact, with counters proving the redaction.
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b555-[0-9]{4}\b"

# The synthesized contact line: "Customer#000000042 <customer#000000042@example.com> call 555-0042"
_CONTACT_SQL = (
    "c_name || ' <' || lower(replace(c_name, ' ', '')) || '@example.com>"
    " call 555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')"
)

_PII_SQL = f"""
WITH contact AS (
    SELECT c_custkey AS customer_id, {_CONTACT_SQL} AS contact_text
    FROM customer
),
scrubbed AS (
    SELECT customer_id, contact_text,
           CAST(length(regexp_extract_all(contact_text, '{_EMAIL_RE}')) AS BIGINT)
               AS n_emails,
           CAST(length(regexp_extract_all(contact_text, '{_PHONE_RE}')) AS BIGINT)
               AS n_phones,
           regexp_replace(
               regexp_replace(contact_text, '{_EMAIL_RE}', '[EMAIL]', 'g'),
               '{_PHONE_RE}', '[PHONE]', 'g') AS redacted_text
    FROM contact
)
SELECT customer_id, n_emails, n_phones, redacted_text,
       CAST(length(regexp_extract_all(redacted_text, '{_EMAIL_RE}')) AS BIGINT)
           AS residual_pii
FROM scrubbed
"""


@register(
    "pii_scrub_audit",
    _PII_SQL,
    doc="PII scrub: count email/phone patterns, redact them, and emit "
    "the residual count (must be 0) — detection and redaction share "
    "one regex, so the oracle catches drift in either. The fixture "
    "corpus is PII-free, so the contact string is synthesized from "
    "customer records; on real data the same plan runs over the raw "
    "text column. Row-local regex work — scales with bytes, no "
    "shuffle, no UDF.",
)
def q_pii_scrub_audit(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    contact = cust.select(
        F.col("c_custkey").alias("customer_id"),
        F.concat(
            F.col("c_name"),
            F.lit(" <"),
            F.lower(F.replace(F.col("c_name"), F.lit(" "), F.lit(""))),
            F.lit("@example.com> call 555-"),
            F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        ).alias("contact_text"),
    )
    scrubbed = contact.select(
        "customer_id",
        F.regexp_count("contact_text", F.lit(_EMAIL_RE)).cast("long").alias(
            "n_emails"
        ),
        F.regexp_count("contact_text", F.lit(_PHONE_RE)).cast("long").alias(
            "n_phones"
        ),
        F.regexp_replace(
            F.regexp_replace("contact_text", _EMAIL_RE, "[EMAIL]"),
            _PHONE_RE,
            "[PHONE]",
        ).alias("redacted_text"),
    )
    return scrubbed.select(
        "customer_id",
        "n_emails",
        "n_phones",
        "redacted_text",
        F.regexp_count("redacted_text", F.lit(_EMAIL_RE)).cast("long").alias(
            "residual_pii"
        ),
    )


# ---------------------------------------------------------------------------
# Context-window chunking: overlapping fixed-token windows per document.
# ---------------------------------------------------------------------------

_CHUNK_TOKENS = 32
_CHUNK_STRIDE = 24

_CHUNKS_SQL = f"""
WITH toks AS (
    SELECT doc_id, regexp_extract_all(trim(text), '\\S+') AS t
    FROM documents
),
chunks AS (
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           list_slice(t, i * {_CHUNK_STRIDE} + 1,
                      i * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}) AS chunk
    FROM toks,
         unnest(range(0, CAST(floor((len(t) - 1) / {_CHUNK_STRIDE}) AS BIGINT)
                         + 1)) AS u(i)
    WHERE len(t) > 0
)
SELECT doc_id, chunk_idx,
       CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
       array_to_string(chunk, ' ') AS chunk_text
FROM chunks
"""


@register(
    "doc_chunks",
    _CHUNKS_SQL,
    doc=f"Context-window chunking: every doc splits into overlapping "
    f"{_CHUNK_TOKENS}-token windows on a {_CHUNK_STRIDE}-token stride "
    f"({_CHUNK_TOKENS - _CHUNK_STRIDE} tokens of overlap), the standard "
    "prep for fixed-context pre-training and embedding indexing. "
    "posexplode over a computed start sequence — chunk count derives "
    "from integer arithmetic on the token count, so the fan-out is "
    "row-local and deterministic; no shuffle until the consumer.",
)
def q_doc_chunks(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    with_toks = docs.select("doc_id", toks.alias("__toks")).filter(
        F.size("__toks") > 0
    )
    n_chunks = F.floor((F.size("__toks") - 1) / F.lit(_CHUNK_STRIDE)) + 1
    exploded = with_toks.select(
        "doc_id",
        "__toks",
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
            "__i"
        ),
    )
    chunk = F.slice(
        "__toks",
        (F.col("__i") * _CHUNK_STRIDE + 1).cast("int"),
        _CHUNK_TOKENS,
    )
    return exploded.select(
        "doc_id",
        F.col("__i").cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


# --------------------- mixture resampling to a target source blend

_MIX_SQL = r"""
WITH w AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_s,
           CASE WHEN CAST(regexp_extract(source, 'src(\d+)', 1) AS BIGINT)
                     % 2 = 0 THEN 3 ELSE 1 END AS w_s
    FROM documents GROUP BY source
),
tot AS (SELECT CAST(SUM(w_s) AS BIGINT) AS big_w FROM w),
cap AS (SELECT MIN(n_s * (SELECT big_w FROM tot) // w_s) AS t FROM w),
quota AS (
    SELECT source, n_s, w_s,
           w_s * (SELECT t FROM cap) // (SELECT big_w FROM tot) AS keep_s
    FROM w
),
ranked AS (
    SELECT d.doc_id, d.source,
           ROW_NUMBER() OVER (
               PARTITION BY d.source
               ORDER BY md5('mix:' || CAST(d.doc_id AS VARCHAR)), d.doc_id
           ) AS rn
    FROM documents d
)
SELECT r.source AS source,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(ANY_VALUE(q.n_s) AS BIGINT) AS n_available,
       CAST(ANY_VALUE(q.w_s) AS BIGINT) AS target_weight
FROM ranked r JOIN quota q ON q.source = r.source
WHERE r.rn <= q.keep_s
GROUP BY r.source
"""


@register(
    "source_mixture_resample",
    _MIX_SQL,
    doc="Mixture resampling: downsample the corpus so source "
    "proportions match a target blend (here 3:1 for even/odd source "
    "ids) at the maximum total the blend admits. All quota math is "
    "INTEGER (weights, integer division) so the cut is bit-exact "
    "cross-engine; per-source membership is a deterministic md5 rank "
    "(replayable, partitioning-independent). The data-mixing step of "
    "an LLM corpus pipeline. Scale: quotas are a per-source aggregate "
    "(broadcast); the rank window partitions by source.",
)
def q_source_mixture_resample(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w_s = F.when(
        F.regexp_extract("source", r"src(\d+)", 1).cast("long") % 2 == 0, 3
    ).otherwise(1)
    w = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_s")
    ).withColumn("w_s", w_s.cast("long"))
    tot = w.agg(F.sum("w_s").cast("long").alias("big_w"))
    cap = (
        w.join(F.broadcast(tot))
        .select(F.expr("n_s * big_w div w_s").alias("__c"))
        .agg(F.min("__c").alias("t"))
    )
    quota = (
        w.join(F.broadcast(tot))
        .join(F.broadcast(cap))
        .select(
            "source",
            "n_s",
            "w_s",
            F.expr("w_s * t div big_w").alias("keep_s"),
        )
    )
    rk = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    ranked = docs.withColumn("rn", F.row_number().over(rk))
    return (
        ranked.join(F.broadcast(quota), on="source")
        .filter(F.col("rn") <= F.col("keep_s"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.first("n_s").alias("n_available"),
            F.first("w_s").alias("target_weight"),
        )
    )


# ---------------------------------------------------------------------------
# k-anonymity audit: quasi-identifier cell sizes before a data release.
# ---------------------------------------------------------------------------

_K_ANON = 10

_KANON_SQL = f"""
WITH cells AS (
    SELECT n.n_name AS nation, c.c_mktsegment AS segment,
           COUNT(*) AS cell_size
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY 1, 2
)
SELECT nation, segment,
       CAST(cell_size AS BIGINT) AS cell_size,
       cell_size >= {_K_ANON} AS meets_k,
       CAST(CASE WHEN cell_size < {_K_ANON} THEN cell_size ELSE 0 END
            AS BIGINT) AS suppressed_rows
FROM cells
"""


@register(
    "kanonymity_audit",
    _KANON_SQL,
    doc=f"k-anonymity audit (k={_K_ANON}) over the (nation, segment) "
    "quasi-identifier: every cell's population, whether it meets k, "
    "and how many rows suppression would remove — the privacy gate a "
    "pipeline runs before releasing joined training data (small "
    "cells re-identify; the release either suppresses or "
    "generalizes them). Complements pii_scrub_audit: scrubbing "
    "removes direct identifiers, this audits the indirect ones. One "
    "map-side-combinable aggregate; the quasi-identifier set is a "
    "config choice, the plan shape is invariant.",
)
def q_kanonymity_audit(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cells = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.count("*").alias("cell_size"))
    )
    return cells.select(
        "nation",
        "segment",
        F.col("cell_size").cast("long").alias("cell_size"),
        (F.col("cell_size") >= _K_ANON).alias("meets_k"),
        F.when(F.col("cell_size") < _K_ANON, F.col("cell_size"))
        .otherwise(0)
        .cast("long")
        .alias("suppressed_rows"),
    )


# ---------------------------------------------------------------------------
# Token-budget mixture allocation: the sampling plan behind data mixing.
# ---------------------------------------------------------------------------

#: Total training budget = 2x the corpus (some sources must oversample).
_MIX_BUDGET_X = 2

_MIX_ALLOC_SQL = f"""
WITH avail AS (
    SELECT source,
           CAST(SUBSTRING(source, 4) AS INTEGER) AS src_n,
           CAST(SUM(CAST(length(regexp_extract_all(text,
               '{{PAT}}')) AS BIGINT)) AS BIGINT) AS avail_tokens
    FROM documents GROUP BY source
),
tot AS (
    SELECT CAST(SUM(avail_tokens) AS BIGINT) AS corpus_tokens,
           CAST(SUM(src_n + 1) AS BIGINT) AS weight_denom
    FROM avail
)
SELECT a.source,
       CAST((a.src_n + 1) * 1000000 // t.weight_denom AS BIGINT)
           AS weight_ppm,
       a.avail_tokens,
       CAST(t.corpus_tokens * {_MIX_BUDGET_X} * (a.src_n + 1)
            // t.weight_denom AS BIGINT) AS target_tokens,
       CAST((t.corpus_tokens * {_MIX_BUDGET_X} * (a.src_n + 1)
             // t.weight_denom) * 1000000 // a.avail_tokens AS BIGINT)
           AS epochs_ppm,
       (t.corpus_tokens * {_MIX_BUDGET_X} * (a.src_n + 1)
        // t.weight_denom) * 1000000 // a.avail_tokens > 1000000
           AS oversampled
FROM avail a, tot t
"""


@register(
    "source_mixture_token_allocation",
    _MIX_ALLOC_SQL.replace("{PAT}", r"\S+"),
    doc="Token-budget allocation for data mixing: given per-source "
    "mixture weights (here a deterministic ramp over the source id — "
    "the config a mixing study sweeps) and a total training budget "
    "(2x the corpus), emit each source's target token count, its "
    "oversampling factor in exact ppm (epochs > 1e6 ppm = the source "
    "repeats), and the oversampled flag — the allocation table "
    "source_mixture_resample then EXECUTES by drawing documents. "
    "All integer floor arithmetic on non-negative counts: zero float "
    "surface. One scan + one 20-row broadcast of the totals.",
)
def q_source_mixture_token_allocation(spark, sf_dir):
    from ecom_churn_lakehouse_spark.functions.text import token_count_col

    docs = load_table(spark, sf_dir, "documents")
    avail = docs.groupBy("source").agg(
        F.sum(token_count_col(F.col("text"))).cast("long").alias(
            "avail_tokens"
        )
    ).withColumn(
        "src_n", F.substring("source", 4, 10).cast("int")
    )
    tot = avail.agg(
        F.sum("avail_tokens").cast("long").alias("corpus_tokens"),
        F.sum(F.col("src_n") + 1).cast("long").alias("weight_denom"),
    )
    a = avail.join(F.broadcast(tot))
    target = F.expr(
        f"corpus_tokens * {_MIX_BUDGET_X} * (src_n + 1) DIV weight_denom"
    )
    epochs = F.expr(
        f"(corpus_tokens * {_MIX_BUDGET_X} * (src_n + 1) DIV weight_denom)"
        " * 1000000 DIV avail_tokens"
    )
    return a.select(
        "source",
        F.expr("(src_n + 1) * 1000000 DIV weight_denom")
        .cast("long")
        .alias("weight_ppm"),
        "avail_tokens",
        target.cast("long").alias("target_tokens"),
        epochs.cast("long").alias("epochs_ppm"),
        (epochs > 1_000_000).alias("oversampled"),
    )


# ---------------------------------------------------------------------------
# Sharded curriculum ordering: the data-loading order for training.
# ---------------------------------------------------------------------------

_CURR_SHARDS = 8

_CURRICULUM_SQL = """
WITH scored AS (
    SELECT doc_id,
           CASE
             WHEN {QUALITY} >= 0.7 THEN 0
             WHEN {QUALITY} >= 0.55 THEN 1
             ELSE 2
           END AS band,
           CAST({HB} AS BIGINT) AS shuffle_key
    FROM documents
)
SELECT doc_id,
       CAST(band AS INTEGER) AS band,
       CAST(shuffle_key % {NSHARD} AS INTEGER) AS shard,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY shuffle_key % {NSHARD}
           ORDER BY band, shuffle_key, doc_id) AS BIGINT) AS shard_pos
FROM scored
"""


def _curriculum_sql() -> str:
    from ecom_churn_lakehouse_spark.operators.sampling import hash_bucket_sql

    quality = """ROUND(
           least(CAST(length(regexp_extract_all(text, '\\S+')) AS DOUBLE) / 100.0, 1.0) * 0.5
           + least(CAST(length(regexp_extract_all(text,
                 '\\b(the|a|and|of|to|in)\\b')) AS DOUBLE)
             / greatest(length(regexp_extract_all(text, '\\S+')), 1) * 5.0, 1.0) * 0.3
           + (1.0 - least(CAST(length(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE)
             / greatest(length(text), 1) * 10.0, 1.0)) * 0.2,
           6)"""
    return (
        _CURRICULUM_SQL.replace("{QUALITY}", quality)
        .replace("{HB}", hash_bucket_sql("doc_id", "curr:", 1_000_000))
        .replace("{NSHARD}", str(_CURR_SHARDS))
    )


@register(
    "curriculum_shard_ordering",
    _curriculum_sql(),
    doc="Sharded curriculum ordering: every document gets a quality "
    "band (high first), a deterministic shuffle key (salted "
    "md5-bucket — the ONE portable hash idiom), a shard assignment, "
    "and its position WITHIN the shard ordered by (band, shuffle "
    "key) — the exact layout a data loader consumes for "
    "quality-curriculum training with per-shard reproducible "
    "shuffling. Positions are per-shard (never a global row_number: "
    "a single-partition global sort is the classic driver-melting "
    "anti-pattern; N shards = N independent window sorts that scale "
    "out). Band thresholds reuse doc_quality's composite score.",
)
def q_curriculum_shard_ordering(spark, sf_dir):
    from ecom_churn_lakehouse_spark.functions.text import quality_cols
    from ecom_churn_lakehouse_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    q = quality_cols(F.col("text"))["quality_score"]
    scored = docs.select(
        "doc_id",
        F.when(q >= 0.7, 0).when(q >= 0.55, 1).otherwise(2).alias("band"),
        hash_bucket(F.col("doc_id"), "curr:", mod=1_000_000).alias(
            "shuffle_key"
        ),
    )
    w = Window.partitionBy(F.col("shuffle_key") % _CURR_SHARDS).orderBy(
        "band", "shuffle_key", "doc_id"
    )
    return scored.select(
        "doc_id",
        F.col("band").cast("int").alias("band"),
        (F.col("shuffle_key") % _CURR_SHARDS).cast("int").alias("shard"),
        F.row_number().over(w).cast("long").alias("shard_pos"),
    )


# ---------------------------------------------------------------------------
# Dataset datasheet: one-pass per-source corpus profile.
# ---------------------------------------------------------------------------

_DATASHEET_SQL = r"""
WITH scored AS (
    SELECT source,
           sha256(text) AS sha,
           CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT)
               AS n_tok,
           CAST(length(regexp_extract_all(text,
               '''(?:s|t|re|ve|m|ll|d)|\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+'))
               AS BIGINT) AS n_bpe,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(ROUND((
               least(CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE) / 100.0, 1.0) * 0.5
               + least(CAST(length(regexp_extract_all(text,
                     '\b(the|a|and|of|to|in)\b')) AS DOUBLE)
                 / greatest(length(regexp_extract_all(text, '\S+')), 1) * 5.0, 1.0) * 0.3
               + (1.0 - least(CAST(length(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE)
                 / greatest(length(text), 1) * 10.0, 1.0)) * 0.2
           ) * 1000000, 0) AS BIGINT) AS q_micros,
           (length(regexp_extract_all(text, '\b(the|and|of)\b'))
            >= greatest(
                 length(regexp_extract_all(text, '\b(der|und|das)\b')),
                 length(regexp_extract_all(text, '\b(le|et|les)\b')),
                 length(regexp_extract_all(text, '\b(el|y|los)\b')), 1))
               AS is_en
    FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
       CAST(SUM(n_chars) // COUNT(*) AS BIGINT) AS avg_chars,
       CAST(SUM(q_micros) // COUNT(*) AS BIGINT) AS mean_quality_ppm,
       CAST(COUNT(*) FILTER (WHERE is_en) * 1000000 // COUNT(*) AS BIGINT)
           AS en_share_ppm,
       CAST((COUNT(*) - COUNT(DISTINCT sha)) * 1000000 // COUNT(*)
            AS BIGINT) AS dup_rate_ppm
FROM scored
GROUP BY source
"""


@register(
    "dataset_datasheet_by_source",
    _DATASHEET_SQL,
    doc="Per-source dataset datasheet in ONE scan + one aggregate: doc "
    "and token counts (whitespace + BPE-ish), average length, mean "
    "quality (exact ppm — the 6dp-rounded score re-quantized to "
    "integer micros), English share, and exact-duplicate rate — the "
    "'datasheets for datasets' summary a curation review reads "
    "before admitting a source, and the documents twin of "
    "orders_table_profile's deequ-style profiling. Every emitted "
    "ratio is integer floor division on non-negative counts (zero "
    "float surface). The language flag is the same marker-count "
    "argmax as doc_lang_guess with English winning ties, expressed "
    "as a >= comparison so one pass computes it inline.",
)
def q_dataset_datasheet_by_source(spark, sf_dir):
    from ecom_churn_lakehouse_spark.functions.text import (
        LANG_MARKERS,
        bpe_token_count_col,
        quality_cols,
        token_count_col,
    )

    docs = load_table(spark, sf_dir, "documents")
    q = quality_cols(F.col("text"))["quality_score"]
    marker = lambda ws: F.regexp_count(  # noqa: E731
        F.col("text"), F.lit(r"\b(" + "|".join(ws) + r")\b")
    ).cast("long")
    c_en = marker(LANG_MARKERS["en"])
    others = [marker(LANG_MARKERS[lg]) for lg in ("de", "fr", "es")]
    is_en = c_en >= F.greatest(*others, F.lit(1))
    scored = docs.select(
        "source",
        F.sha2("text", 256).alias("sha"),
        token_count_col(F.col("text")).alias("n_tok"),
        bpe_token_count_col(F.col("text")).alias("n_bpe"),
        F.length("text").cast("long").alias("n_chars"),
        F.round(q * 1_000_000, 0).cast("long").alias("q_micros"),
        is_en.alias("is_en"),
    )
    return scored.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.sum("n_bpe").cast("long").alias("total_bpe_tokens"),
        F.expr("SUM(n_chars) DIV COUNT(*)").cast("long").alias("avg_chars"),
        F.expr("SUM(q_micros) DIV COUNT(*)")
        .cast("long")
        .alias("mean_quality_ppm"),
        F.expr("COUNT_IF(is_en) * 1000000 DIV COUNT(*)")
        .cast("long")
        .alias("en_share_ppm"),
        F.expr(
            "(COUNT(*) - COUNT(DISTINCT sha)) * 1000000 DIV COUNT(*)"
        )
        .cast("long")
        .alias("dup_rate_ppm"),
    )


# ---------------------------------------------------------------------------
# Packing efficiency report: per-source shard fill rates.
# ---------------------------------------------------------------------------

_PACK_EFF_SQL = f"""
WITH packed AS ({_PACKING_SQL}),
last_bin AS (
    SELECT source, MAX(bin_id) AS max_bin FROM packed GROUP BY source
)
SELECT p.source,
       CAST(COUNT(*) AS BIGINT) AS n_bins,
       CAST(SUM(p.bin_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(p.bin_tokens) * 1000000
            // (COUNT(*) * {_PACK_BUDGET}) AS BIGINT) AS fill_ppm,
       CAST(COUNT(*) FILTER (WHERE p.bin_tokens > {_PACK_BUDGET})
            AS BIGINT) AS n_overfull_bins,
       CAST(MAX(p.bin_tokens) AS BIGINT) AS max_bin_tokens
FROM packed p
GROUP BY p.source
"""


@register(
    "packing_efficiency_report",
    _PACK_EFF_SQL,
    doc="Shard-packing efficiency per source: bin count, overall fill "
    "rate in exact ppm against the "
    f"{_PACK_BUDGET}-token budget, overfull bins (docs that straddle "
    "a boundary carry their overflow), and the largest bin — the "
    "report that tells a training-infra team how much compute "
    "equal-work shards actually waste, read together with "
    "tokenizer_truncation_audit (which prices the alternative of "
    "cutting instead of packing). Pure integer aggregate over the "
    "packing entry's own bin relation, so the two can never drift.",
)
def q_packing_efficiency_report(spark, sf_dir):
    packed = q_doc_sequence_packing(spark, sf_dir)
    return packed.groupBy("source").agg(
        F.count("*").cast("long").alias("n_bins"),
        F.sum("bin_tokens").cast("long").alias("total_tokens"),
        F.expr(
            f"SUM(bin_tokens) * 1000000 DIV (COUNT(*) * {_PACK_BUDGET})"
        )
        .cast("long")
        .alias("fill_ppm"),
        F.count_if(F.col("bin_tokens") > _PACK_BUDGET)
        .cast("long")
        .alias("n_overfull_bins"),
        F.max("bin_tokens").cast("long").alias("max_bin_tokens"),
    )


# ------------------------------------------ duplicate inflation curve


def _dup_inflation_sql() -> str:
    from ecom_churn_lakehouse_spark.queries.dedup_queries import _CORPUS_SQL

    return f"""
WITH {_CORPUS_SQL.strip()},
g AS (
    SELECT sha256(text) AS sha,
           CAST(COUNT(*) AS BIGINT) AS k,
           CAST(MIN(length(text)) AS BIGINT) AS len
    FROM corpus GROUP BY sha256(text)
)
SELECT k AS copies_per_doc,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(k) AS BIGINT) AS n_docs,
       CAST(SUM(k - 1) AS BIGINT) AS redundant_docs,
       CAST(SUM((k - 1) * len) AS BIGINT) AS redundant_chars
FROM g GROUP BY k
"""


@register(
    "dup_inflation_curve",
    _dup_inflation_sql(),
    doc="Training-token inflation from exact duplication, by "
    "copy-count class: how many content groups appear k times, and "
    "how many documents/characters beyond one canonical copy per "
    "group the corpus carries at each k — the histogram that says "
    "whether duplicate mass is a long tail of doubles (mild "
    "upweighting) or a few thousand-copy boilerplate groups "
    "(catastrophic memorization risk; the capped-LSH mega-bucket "
    "regime). One sha256 hash-groupBy (map-side combinable on the "
    "digest) then a k-grain rollup of the group frame — the group "
    "relation is |distinct contents|, already the dedup pipeline's "
    "working set, and text never enters the second shuffle.",
)
def q_dup_inflation_curve(spark, sf_dir):
    from ecom_churn_lakehouse_spark.queries.dedup_queries import (
        derived_corpus,
    )

    corpus = derived_corpus(spark, sf_dir)
    g = corpus.groupBy(F.sha2(F.col("text"), 256).alias("sha")).agg(
        F.count("*").cast("long").alias("k"),
        F.min(F.length("text")).cast("long").alias("len"),
    )
    return g.groupBy(F.col("k").alias("copies_per_doc")).agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum("k").cast("long").alias("n_docs"),
        F.sum(F.col("k") - 1).cast("long").alias("redundant_docs"),
        F.sum((F.col("k") - 1) * F.col("len"))
        .cast("long")
        .alias("redundant_chars"),
    )


# ---------------------------------------------------------------------------
# Chunk-level dedup savings (RAG/pre-training index hygiene).
# ---------------------------------------------------------------------------

_CHUNK_SAVINGS_SQL = f"""
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id + 200000 AS doc_id, text || ' zz qq' AS text
    FROM documents WHERE doc_id % 7 = 0
),
toks AS (
    SELECT doc_id, regexp_extract_all(trim(text), '\\S+') AS t
    FROM corpus
),
chunks AS (
    SELECT doc_id,
           list_slice(t, i * {_CHUNK_STRIDE} + 1,
                      i * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}) AS chunk
    FROM toks,
         unnest(range(0, CAST(floor((len(t) - 1) / {_CHUNK_STRIDE}) AS BIGINT)
                         + 1)) AS u(i)
    WHERE len(t) > 0
),
hashed AS (
    SELECT len(chunk) = {_CHUNK_TOKENS} AS is_full_chunk,
           md5(array_to_string(chunk, ' ')) AS h,
           len(chunk) AS n_tokens
    FROM chunks
),
per_hash AS (
    SELECT is_full_chunk, h,
           COUNT(*) AS copies, MIN(n_tokens) AS n_tokens
    FROM hashed GROUP BY is_full_chunk, h
)
SELECT is_full_chunk,
       CAST(SUM(copies) AS BIGINT) AS n_chunks,
       CAST(COUNT(*) AS BIGINT) AS n_unique_chunks,
       CAST(SUM(copies - 1) AS BIGINT) AS n_dup_chunks,
       CAST(SUM((copies - 1) * n_tokens) AS BIGINT) AS dup_tokens,
       CAST(SUM((copies - 1) * n_tokens) * 1000000
            // SUM(copies * n_tokens) AS BIGINT) AS savings_ppm
FROM per_hash
GROUP BY is_full_chunk
"""


@register(
    "chunk_dedup_savings",
    _CHUNK_SAVINGS_SQL,
    doc=f"Chunk-level dedup savings: the {_CHUNK_TOKENS}-token/"
    f"{_CHUNK_STRIDE}-stride context windows a RAG or pre-training "
    "index actually stores duplicate across documents even when doc-"
    "level dedup passed (copies chunk identically; an appended-tail "
    "variant shares every aligned chunk). md5 hash-groupBy on the "
    "chunk text (hashed away in the scan projection, so the exchange "
    "never moves chunk text), split by full-window vs tail-window "
    "class, with exact-ppm token savings. The planted corpus "
    "(dedup_queries.derived_corpus spelling) makes expected savings "
    "deterministic.",
)
def q_chunk_dedup_savings(spark, sf_dir):
    from ecom_churn_lakehouse_spark.queries.dedup_queries import derived_corpus

    corpus = derived_corpus(spark, sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    with_toks = corpus.select("doc_id", toks.alias("__toks")).filter(
        F.size("__toks") > 0
    )
    n_chunks = F.floor((F.size("__toks") - 1) / F.lit(_CHUNK_STRIDE)) + 1
    exploded = with_toks.select(
        "__toks",
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias("__i"),
    )
    chunk = F.slice(
        "__toks", (F.col("__i") * _CHUNK_STRIDE + 1).cast("int"), _CHUNK_TOKENS
    )
    hashed = exploded.select(
        (F.size(chunk) == _CHUNK_TOKENS).alias("is_full_chunk"),
        F.md5(F.array_join(chunk, " ")).alias("h"),
        F.size(chunk).alias("n_tokens"),
    )
    per_hash = hashed.groupBy("is_full_chunk", "h").agg(
        F.count("*").alias("copies"), F.min("n_tokens").alias("n_tokens")
    )
    return per_hash.groupBy("is_full_chunk").agg(
        F.sum("copies").cast("long").alias("n_chunks"),
        F.count("*").cast("long").alias("n_unique_chunks"),
        F.sum(F.col("copies") - 1).cast("long").alias("n_dup_chunks"),
        F.sum((F.col("copies") - 1) * F.col("n_tokens")).cast("long").alias("dup_tokens"),
        F.expr(
            "CAST(SUM((copies - 1) * n_tokens) * 1000000 "
            "DIV SUM(copies * n_tokens) AS BIGINT)"
        ).alias("savings_ppm"),
    )


# ---------------------------------------------------------------------------
# Prefix-cache savings (LLM serving economics).
# ---------------------------------------------------------------------------

_PREFIX_KS = [16, 32, 64]

_PREFIX_ONE_SQL = """
SELECT {k} AS prefix_k,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT pfx) AS BIGINT) AS n_groups,
       CAST(SUM(tok_n) AS BIGINT) AS total_tokens,
       CAST((COUNT(*) - COUNT(DISTINCT pfx)) * {k} AS BIGINT) AS tokens_saved,
       CAST((COUNT(*) - COUNT(DISTINCT pfx)) * {k} * 1000000
            // SUM(tok_n) AS BIGINT) AS savings_ppm
FROM (
    SELECT md5(array_to_string(t[1:{k}], ' ')) AS pfx, len(t) AS tok_n
    FROM (SELECT regexp_extract_all(trim(text), '\\S+') AS t FROM documents)
    WHERE len(t) >= {k}
)
"""

_PREFIX_SQL = "\nUNION ALL\n".join(
    _PREFIX_ONE_SQL.format(k=k) for k in _PREFIX_KS
)


@register(
    "prefix_cache_savings",
    _PREFIX_SQL,
    doc="LLM prefix-cache economics: docs sharing an identical "
    "first-k-token prefix reuse each other's KV cache, so per k in "
    "{16, 32, 64} this measures the prefix-group structure of the "
    "corpus and the token mass a perfect prefix cache saves "
    "((copies-1)*k per group, exact ppm of total tokens). Prefix "
    "identity travels as an md5, so the grouping exchange carries "
    "~50 bytes/doc regardless of document width — the same "
    "hash-early discipline as the dedup tier.",
)
def q_prefix_cache_savings(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = docs.select(toks.alias("t")).select("t", F.size("t").alias("tok_n"))
    out = None
    for k in _PREFIX_KS:
        one = (
            base.filter(F.col("tok_n") >= k)
            .select(
                F.md5(F.array_join(F.slice("t", 1, k), " ")).alias("pfx"), "tok_n"
            )
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.count_distinct("pfx").cast("long").alias("n_groups"),
                F.sum("tok_n").cast("long").alias("total_tokens"),
            )
            .select(
                F.lit(k).cast("int").alias("prefix_k"),
                "n_docs",
                "n_groups",
                "total_tokens",
                ((F.col("n_docs") - F.col("n_groups")) * k)
                .cast("long")
                .alias("tokens_saved"),
                F.expr(
                    f"CAST((n_docs - n_groups) * {k} * 1000000 DIV total_tokens AS BIGINT)"
                ).alias("savings_ppm"),
            )
        )
        out = one if out is None else out.unionByName(one)
    return out


# ---------------------------------------------------------------------------
# Fill-in-the-middle span sampling.
# ---------------------------------------------------------------------------

_FIM_MIN_TOKENS = 12

from ecom_churn_lakehouse_spark.operators.sampling import (  # noqa: E402
    hash_bucket,
    hash_bucket_sql,
)

_FIM_SQL = f"""
WITH toks AS (
    SELECT doc_id, len(regexp_extract_all(trim(text), '\\S+')) AS n_tokens
    FROM documents
),
eligible AS (
    SELECT doc_id, n_tokens,
           1 + {hash_bucket_sql("doc_id", "fim_a:", 1_000_000)}
               % (n_tokens // 3) AS prefix_len,
           1 + {hash_bucket_sql("doc_id", "fim_b:", 1_000_000)}
               % (n_tokens // 3) AS middle_len
    FROM toks WHERE n_tokens >= {_FIM_MIN_TOKENS}
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(prefix_len AS BIGINT) AS prefix_len,
       CAST(middle_len AS BIGINT) AS middle_len,
       CAST(n_tokens - prefix_len - middle_len AS BIGINT) AS suffix_len,
       CAST(middle_len * 1000000 // n_tokens AS BIGINT) AS middle_frac_ppm
FROM eligible
"""


@register(
    "fim_span_stats",
    _FIM_SQL,
    doc="Fill-in-the-middle (FIM) span sampling: per eligible doc "
    f"(>= {_FIM_MIN_TOKENS} tokens), deterministic prefix/middle/"
    "suffix split lengths drawn from the shared md5 idiom, each span "
    "capped at a third of the doc so all three are non-empty — the "
    "document-to-training-example transform infilling pretraining "
    "runs, reproducible across engines and reruns because the spans "
    "are pure projections of (doc_id, n_tokens). Scan-local: no "
    "shuffle at all.",
)
def q_fim_span_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    base = docs.select("doc_id", n.alias("n_tokens")).filter(
        F.col("n_tokens") >= _FIM_MIN_TOKENS
    )
    h_a = hash_bucket(F.col("doc_id"), "fim_a:", mod=1_000_000)
    h_b = hash_bucket(F.col("doc_id"), "fim_b:", mod=1_000_000)
    spans = base.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        (F.lit(1) + h_a % F.expr("n_tokens DIV 3")).cast("long").alias("prefix_len"),
        (F.lit(1) + h_b % F.expr("n_tokens DIV 3")).cast("long").alias("middle_len"),
    )
    return spans.select(
        "doc_id",
        "n_tokens",
        "prefix_len",
        "middle_len",
        (F.col("n_tokens") - F.col("prefix_len") - F.col("middle_len"))
        .cast("long")
        .alias("suffix_len"),
        F.expr("CAST(middle_len * 1000000 DIV n_tokens AS BIGINT)").alias(
            "middle_frac_ppm"
        ),
    )


# --------------------------------------- chunk-stitch overlap detection

#: Overlap window (tokens) a sliding-window chunker carries between
#: consecutive chunks.
_STITCH_K = 8

_STITCH_SQL = f"""
WITH base AS (
    SELECT doc_id, regexp_extract_all(trim(text), '\\S+') AS t FROM documents
),
corpus AS (
    SELECT doc_id, t FROM base
    UNION ALL
    SELECT doc_id + 700000 AS doc_id,
           t[len(t) - {_STITCH_K - 1} : len(t)] || t[1:4] AS t
    FROM base WHERE doc_id % 6 = 0 AND len(t) >= 16
),
sig AS (
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           md5(array_to_string(t[1:{_STITCH_K}], ' ')) AS head_h,
           md5(array_to_string(t[len(t) - {_STITCH_K - 1} : len(t)], ' ')) AS tail_h
    FROM corpus WHERE len(t) >= {_STITCH_K}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       a.n_tokens AS a_tokens, b.n_tokens AS b_tokens,
       CAST(a.n_tokens + b.n_tokens - {_STITCH_K} AS BIGINT) AS merged_tokens
FROM sig a JOIN sig b
  ON a.tail_h = b.head_h AND a.doc_id <> b.doc_id
ORDER BY doc_a, doc_b
"""


@register(
    "chunk_stitch_overlap_pairs",
    _STITCH_SQL,
    doc=f"Chunk-boundary overlap detection: a sliding-window chunker "
    f"carries the last {_STITCH_K} tokens of one chunk into the head "
    "of the next, so re-ingesting chunked corpora double-counts every "
    "overlap window. Each doc emits an md5 of its first and last "
    f"{_STITCH_K} tokens; a tail-hash = head-hash equi-join finds "
    "consecutive-chunk pairs and reports the stitched token count "
    "(a+b-overlap) — the dedup saving a stitching pass realizes. "
    "Continuation chunks are planted on both engines (every 6th doc "
    "with >= 16 tokens gains a chunk starting with its last "
    f"{_STITCH_K} tokens). Scale: two md5s per doc (map-only), one "
    "hash-key equi-join — bucket-local, never all-pairs; the classic "
    "content-defined-chunking audit before span-level dedup "
    "(repeated_span_exact_dedup) pays for full positional hashing.",
)
def q_chunk_stitch_overlap_pairs(spark, sf_dir):
    K = _STITCH_K
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    )
    cont = base.filter(
        (F.col("doc_id") % 6 == 0) & (F.size("t") >= 16)
    ).select(
        (F.col("doc_id") + 700000).alias("doc_id"),
        F.concat(
            F.slice("t", F.size("t") - (K - 1), K), F.slice("t", 1, 4)
        ).alias("t"),
    )
    corpus = base.unionByName(cont)
    sig = corpus.filter(F.size("t") >= K).select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.md5(F.array_join(F.slice("t", 1, K), " ")).alias("head_h"),
        F.md5(
            F.array_join(F.slice("t", F.size("t") - (K - 1), K), " ")
        ).alias("tail_h"),
    )
    a = sig.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n_tokens").alias("a_tokens"),
        F.col("tail_h").alias("h"),
    )
    b = sig.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n_tokens").alias("b_tokens"),
        F.col("head_h").alias("h"),
    )
    return (
        a.join(b, "h")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            "a_tokens",
            "b_tokens",
            (F.col("a_tokens") + F.col("b_tokens") - K)
            .cast("long")
            .alias("merged_tokens"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ------------------------------------------------ curation keep manifest

_MANIFEST_SQL_TMPL = """
WITH corpus AS (
    SELECT doc_id,
           CASE WHEN doc_id % 5 = 0 THEN '{BP} ' || text ELSE text END AS text
    FROM documents
    UNION ALL
    SELECT doc_id + 100000 AS doc_id,
           CASE WHEN doc_id % 5 = 0 THEN '{BP} ' || text ELSE text END AS text
    FROM documents WHERE doc_id % 10 = 0
),
sized AS (
    SELECT doc_id, text, CAST(len(t) AS BIGINT) AS n_tokens, t
    FROM (SELECT doc_id, text,
                 regexp_extract_all(trim(text), '\\S+') AS t
          FROM corpus)
),
sha AS (
    SELECT doc_id, n_tokens,
           MIN(doc_id) OVER (PARTITION BY sha256(text)) AS canonical_id,
           CAST(COUNT(*) OVER (PARTITION BY sha256(text)) AS BIGINT) AS n_copies,
           CAST(SUM(n_tokens) OVER () AS BIGINT) AS total_tokens,
           CAST(COUNT(*) OVER () AS BIGINT) AS total_docs
    FROM sized
),
occ AS (
    SELECT doc_id,
           CAST(unnest(generate_series(1, n_tokens - {LM1})) AS BIGINT) AS pos,
           t
    FROM sized WHERE n_tokens >= {L}
),
hashed AS (
    SELECT doc_id, pos, md5(array_to_string(t[pos:pos + {LM1}], ' ')) AS h
    FROM occ
),
iv AS (
    SELECT doc_id, pos AS s, pos + {LM1} AS e
    FROM (SELECT doc_id, pos,
                 COUNT(*) OVER (PARTITION BY h) AS cnt,
                 ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
          FROM hashed)
    WHERE cnt > 1 AND rn > 1
),
isl AS (
    SELECT doc_id, s, e,
           SUM(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY s
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
    FROM (SELECT doc_id, s, e,
                 MAX(e) OVER (PARTITION BY doc_id ORDER BY s
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS prev_max
          FROM iv)
),
perdoc AS (
    SELECT doc_id, CAST(SUM(cov) AS BIGINT) AS rm
    FROM (SELECT doc_id, island, MAX(e) - MIN(s) + 1 AS cov
          FROM isl GROUP BY doc_id, island)
    GROUP BY doc_id
),
joined AS (
    SELECT s.doc_id, s.n_tokens, s.canonical_id, s.n_copies,
           s.total_tokens, s.total_docs,
           CAST(COALESCE(p.rm, 0) * 1000000 // s.n_tokens AS BIGINT) AS span_ppm
    FROM sha s LEFT JOIN perdoc p USING (doc_id)
)
SELECT doc_id, n_tokens, n_copies, span_ppm,
       CASE WHEN doc_id <> canonical_id THEN 'exact_duplicate'
            WHEN span_ppm > 300000 THEN 'boilerplate_heavy'
            WHEN 2 * n_tokens * total_docs < total_tokens THEN 'too_short'
            ELSE 'keep' END AS decision
FROM joined
ORDER BY doc_id
"""


@register(
    "curation_keep_manifest",
    None,  # assigned below — needs dedup constants
    doc="The keep/drop manifest a curation pass actually materializes: "
    "every doc gets ONE decision with reason-code precedence — "
    "exact_duplicate (sha256 group, min-doc_id survivor, the "
    "exact_dedup_groups relation), boilerplate_heavy (>30% of tokens "
    "inside non-canonical repeated spans, the repeated_span_exact_"
    "dedup relation via the shared span_removable_per_doc helper), "
    "too_short (mean-relative: fewer than half the average tokens — "
    "never a constant that goes vacuous across scale factors), else "
    "keep. Exact copies of every 10th doc and the 13-token license "
    "header on every 5th are planted identically on both engines. "
    "Scale: one sha256 window per doc, the span-hash bucketed "
    "shuffle, one global stats window — each signal is the standalone "
    "entry's plan, composed; no signal is recomputed per decision.",
)
def q_curation_keep_manifest(spark, sf_dir):
    from ecom_churn_lakehouse_spark.queries.dedup_queries import (
        _SPAN_BP,
        span_removable_per_doc,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bp_text = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(F.lit(_SPAN_BP + " "), F.col("text")),
    ).otherwise(F.col("text"))
    base = docs.select("doc_id", bp_text.alias("text"))
    copies = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), bp_text.alias("text")
    )
    corpus = base.unionByName(copies)
    sized = corpus.select(
        "doc_id",
        "text",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias(
            "n_tokens"
        ),
    )
    wsha = Window.partitionBy(F.sha2(F.col("text"), 256))
    wall = Window.partitionBy()
    sha = sized.select(
        "doc_id",
        "n_tokens",
        F.min("doc_id").over(wsha).alias("canonical_id"),
        F.count("*").over(wsha).cast("long").alias("n_copies"),
        F.sum("n_tokens").over(wall).cast("long").alias("total_tokens"),
        F.count("*").over(wall).cast("long").alias("total_docs"),
    )
    perdoc = span_removable_per_doc(corpus)
    joined = sha.join(perdoc, "doc_id", "left").fillna(0, subset=["rm"]).select(
        "doc_id",
        "n_tokens",
        "canonical_id",
        "n_copies",
        "total_tokens",
        "total_docs",
        F.expr("CAST(rm * 1000000 DIV n_tokens AS BIGINT)").alias("span_ppm"),
    )
    decision = (
        F.when(F.col("doc_id") != F.col("canonical_id"), "exact_duplicate")
        .when(F.col("span_ppm") > 300000, "boilerplate_heavy")
        .when(
            2 * F.col("n_tokens") * F.col("total_docs") < F.col("total_tokens"),
            "too_short",
        )
        .otherwise("keep")
    )
    return joined.select(
        "doc_id", "n_tokens", "n_copies", "span_ppm", decision.alias("decision")
    ).orderBy("doc_id")


# bind the oracle text now that the dedup constants are importable
def _bind_manifest_oracle():
    from ecom_churn_lakehouse_spark.queries.dedup_queries import (
        _SPAN_BP,
        _SPAN_L,
    )
    from ecom_churn_lakehouse_spark import registry as _reg

    sql = _MANIFEST_SQL_TMPL.replace("{BP}", _SPAN_BP).replace(
        "{L}", str(_SPAN_L)
    ).replace("{LM1}", str(_SPAN_L - 1))
    e = _reg._REGISTRY["curation_keep_manifest"]
    _reg._REGISTRY["curation_keep_manifest"] = type(e)(
        fn=e.fn, oracle=sql, doc=e.doc, bounded_frame=e.bounded_frame
    )


_bind_manifest_oracle()


# --------------------------------------- quality-filter operating curve

_QFC_THRESHOLDS = (0, 50_000, 100_000, 200_000, 400_000, 1_000_000)


def _qfc_sql() -> str:
    taus = ", ".join(f"(CAST({t} AS BIGINT))" for t in _QFC_THRESHOLDS)
    return rf"""
WITH toks AS (
    SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS token
    FROM documents
),
df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY token),
per_doc AS (
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN d.c <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
    FROM toks t JOIN df d ON d.token = t.token
    GROUP BY t.doc_id
),
scored AS (
    SELECT doc_id, n_tokens,
           CAST(n_rare * 1000000 // n_tokens AS BIGINT) AS rare_ppm
    FROM per_doc
),
tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM scored
)
SELECT ts.tau,
       CAST(SUM(CASE WHEN s.rare_ppm <= ts.tau THEN 1 ELSE 0 END) AS BIGINT)
           AS kept_docs,
       CAST(SUM(CASE WHEN s.rare_ppm <= ts.tau THEN s.n_tokens ELSE 0 END)
            AS BIGINT) AS kept_tokens,
       CAST(SUM(CASE WHEN s.rare_ppm <= ts.tau THEN 1 ELSE 0 END) * 1000000
            // (SELECT n_docs FROM tot) AS BIGINT) AS kept_docs_ppm,
       CAST(SUM(CASE WHEN s.rare_ppm <= ts.tau THEN s.n_tokens ELSE 0 END)
            * 1000000 // (SELECT n_tokens FROM tot) AS BIGINT)
           AS kept_tokens_ppm
FROM scored s CROSS JOIN (VALUES {taus}) AS ts(tau)
GROUP BY ts.tau ORDER BY ts.tau
"""


@register(
    "quality_filter_threshold_curve",
    _qfc_sql(),
    doc="Quality-filter operating curve: per candidate threshold on "
    "the rare-token ratio (tokens with corpus frequency <= 2, exact "
    "ppm per doc — the integer-exact proxy for the LM-likelihood "
    "filter unigram_lm_doc_scores computes in floats), report how "
    "many documents and how many TOKENS survive — the keep-rate vs "
    "budget trade every corpus-cleaning decision is actually about "
    "(docs and tokens diverge because gibberish docs are short). "
    "Same two-pass shape as the LM scorer: vocab counts, broadcast "
    "join-back, one doc-grain agg, then a 6-way literal threshold "
    "fan-out at the doc grain. Scale: vocabulary fits broadcast "
    "after a min-count floor; the curve adds zero passes over the "
    "token stream.",
)
def q_quality_filter_threshold_curve(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)
        ).alias("token"),
    )
    df_counts = toks.groupBy("token").agg(F.count("*").cast("long").alias("c"))
    per_doc = (
        toks.join(F.broadcast(df_counts), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("c") <= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_rare"),
        )
    )
    scored = per_doc.select(
        "n_tokens",
        F.expr("CAST(n_rare * 1000000 DIV n_tokens AS BIGINT)").alias("rare_ppm"),
    ).localCheckpoint(eager=False)
    tot = scored.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("tot_tokens"),
    )
    taus = F.explode(
        F.array(*[F.lit(t).cast("long") for t in _QFC_THRESHOLDS])
    ).alias("tau")
    kept = F.when(F.col("rare_ppm") <= F.col("tau"), 1).otherwise(0)
    kept_toks = F.when(F.col("rare_ppm") <= F.col("tau"), F.col("n_tokens")).otherwise(
        0
    )
    return (
        scored.select("n_tokens", "rare_ppm", taus)
        .groupBy("tau")
        .agg(
            F.sum(kept).cast("long").alias("kept_docs"),
            F.sum(kept_toks).cast("long").alias("kept_tokens"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "tau",
            "kept_docs",
            "kept_tokens",
            F.expr("CAST(kept_docs * 1000000 DIV n_docs AS BIGINT)").alias(
                "kept_docs_ppm"
            ),
            F.expr("CAST(kept_tokens * 1000000 DIV tot_tokens AS BIGINT)").alias(
                "kept_tokens_ppm"
            ),
        )
        .orderBy("tau")
    )


# ------------------------------------------- shard source-balance audit

_SHARDS = 8

#: Per-cell Pearson term from exact ints (obs, shard_n, src_n, n),
#: floor-quantized to micro at the CELL, then integer-summed per
#: shard — float accumulation order can never matter.
_SHARD_CELL_CHI2_MICRO = (
    "CAST(FLOOR("
    "(CAST(obs AS DOUBLE)"
    " - CAST(shard_n AS DOUBLE) * CAST(src_n AS DOUBLE) / CAST(n AS DOUBLE))"
    " * (CAST(obs AS DOUBLE)"
    "    - CAST(shard_n AS DOUBLE) * CAST(src_n AS DOUBLE) / CAST(n AS DOUBLE))"
    " / (CAST(shard_n AS DOUBLE) * CAST(src_n AS DOUBLE) / CAST(n AS DOUBLE))"
    " * 1000000.0) AS BIGINT)"
)


def _shard_balance_sql() -> str:
    from ecom_churn_lakehouse_spark.operators.sampling import hash_bucket_sql

    hb = hash_bucket_sql("doc_id", "shard:", _SHARDS)
    return f"""
WITH assigned AS (
    SELECT source, CAST({hb} AS BIGINT) AS shard FROM documents
),
cells0 AS (
    SELECT shard, source, CAST(COUNT(*) AS BIGINT) AS obs
    FROM assigned GROUP BY shard, source
),
shards AS (SELECT DISTINCT shard FROM assigned),
sources AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS src_n
            FROM assigned GROUP BY source),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM assigned),
shard_sizes AS (SELECT shard, CAST(COUNT(*) AS BIGINT) AS shard_n
                FROM assigned GROUP BY shard),
cells AS (
    SELECT sh.shard, so.source, so.src_n, ss.shard_n, t.n,
           COALESCE(c.obs, 0) AS obs
    FROM shards sh
    CROSS JOIN sources so
    CROSS JOIN tot t
    JOIN shard_sizes ss ON ss.shard = sh.shard
    LEFT JOIN cells0 c ON c.shard = sh.shard AND c.source = so.source
)
SELECT shard,
       CAST(MAX(shard_n) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN obs > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS sources_present,
       CAST(SUM({_SHARD_CELL_CHI2_MICRO}) AS BIGINT) AS chi2_micro,
       CAST(SUM({_SHARD_CELL_CHI2_MICRO}) AS BIGINT) > 30143000
           AS imbalanced_at_05
FROM cells GROUP BY shard ORDER BY shard
"""


@register(
    "shard_source_balance_audit",
    _shard_balance_sql(),
    doc=f"Training-shard mixing audit: documents hash into {_SHARDS} "
    "shards (the deterministic epoch-shuffle assignment) and each "
    "shard's source distribution is chi-square-tested against the "
    "corpus mix — a shard that over-samples one source gives the "
    "model correlated gradient batches, the failure "
    "curriculum_shard_ordering deliberately engineers and this "
    "audit guards against for the default shuffle. The (shard x "
    "source) spine is dense (empty cells count, expected > 0), "
    "each Pearson term is floor-quantized micro at the cell from "
    "exact ints, then integer-summed (df=19, crit 30.143). Scale: "
    "one scan-local hash, three map-combinable aggs, a "
    f"{_SHARDS}x20 spine — nothing grows with the corpus but the "
    "first agg.",
)
def q_shard_source_balance_audit(spark, sf_dir):
    from ecom_churn_lakehouse_spark.operators.sampling import hash_bucket

    assigned = load_table(spark, sf_dir, "documents").select(
        "source", hash_bucket(F.col("doc_id"), "shard:", mod=_SHARDS).alias("shard")
    ).localCheckpoint(eager=False)
    cells0 = assigned.groupBy("shard", "source").agg(
        F.count("*").cast("long").alias("obs")
    )
    shards = assigned.select("shard").distinct()
    sources = assigned.groupBy("source").agg(
        F.count("*").cast("long").alias("src_n")
    )
    tot = assigned.agg(F.count("*").cast("long").alias("n"))
    shard_sizes = assigned.groupBy("shard").agg(
        F.count("*").cast("long").alias("shard_n")
    )
    cells = (
        shards.crossJoin(F.broadcast(sources))
        .crossJoin(F.broadcast(tot))
        .join(F.broadcast(shard_sizes), "shard")
        .join(F.broadcast(cells0), ["shard", "source"], "left")
        .select(
            "shard",
            "src_n",
            "shard_n",
            "n",
            F.coalesce("obs", F.lit(0)).cast("long").alias("obs"),
        )
    )
    return (
        cells.groupBy("shard")
        .agg(
            F.max("shard_n").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("obs") > 0, 1).otherwise(0))
            .cast("long")
            .alias("sources_present"),
            F.sum(F.expr(_SHARD_CELL_CHI2_MICRO)).cast("long").alias("chi2_micro"),
        )
        .select(
            "shard",
            "n_docs",
            "sources_present",
            "chi2_micro",
            (F.col("chi2_micro") > 30143000).alias("imbalanced_at_05"),
        )
        .orderBy("shard")
    )


# ------------------------------------------- rater agreement (Fleiss)

#: kappa = (Pbar - Pe) / (1 - Pe) for 3 binary raters per doc:
#: per-doc agreement numerator v(v-1) + (3-v)(2-v) (v = pass votes),
#: Pbar = sum/ (N*6); Pe = p^2 + (1-p)^2, p = V/(3N). One shared
#: IEEE expression over three exact int64 sums.
_KAPPA_MILLI = (
    "CAST(FLOOR(("
    "CAST(agree_num AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 6.0)"
    " - (CAST(votes AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 3.0))"
    "   * (CAST(votes AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 3.0))"
    " - (1.0 - CAST(votes AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 3.0))"
    "   * (1.0 - CAST(votes AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 3.0))"
    ") / (1.0"
    " - (CAST(votes AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 3.0))"
    "   * (CAST(votes AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 3.0))"
    " - (1.0 - CAST(votes AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 3.0))"
    "   * (1.0 - CAST(votes AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 3.0))"
    ") * 1000.0) AS BIGINT)"
)

_KAPPA_SQL = rf"""
WITH toks AS (
    SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS token
    FROM documents
),
df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY token),
per_doc AS (
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT t.token) AS BIGINT) AS n_distinct,
           CAST(SUM(CASE WHEN d.c <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
    FROM toks t JOIN df d ON d.token = t.token
    GROUP BY t.doc_id
),
rated AS (
    SELECT doc_id,
           CAST((CASE WHEN n_tokens >= 40 THEN 1 ELSE 0 END)
              + (CASE WHEN n_rare * 1000000 // n_tokens < 200000
                      THEN 1 ELSE 0 END)
              + (CASE WHEN n_distinct * 2 > n_tokens THEN 1 ELSE 0 END)
              AS BIGINT) AS v
    FROM per_doc
),
comp AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(v) AS BIGINT) AS votes,
           CAST(SUM(v * (v - 1) + (3 - v) * (2 - v)) AS BIGINT) AS agree_num,
           CAST(SUM(CASE WHEN v IN (0, 3) THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unanimous
    FROM rated
)
SELECT n_docs, votes, agree_num, n_unanimous,
       {_KAPPA_MILLI} AS fleiss_kappa_milli
FROM comp
"""


@register(
    "quality_rater_agreement_kappa",
    _KAPPA_SQL,
    doc="Fleiss' kappa across three deterministic quality 'raters' "
    "(length, rare-token ratio, lexical diversity) voting pass/fail "
    "per document — the inter-annotator-agreement statistic every "
    "labeling pipeline reports, here measuring whether cheap "
    "quality heuristics actually agree on which documents are bad "
    "(low kappa means the corpus_curation signals are measuring "
    "different things and a composite rule is fragile). Per-doc "
    "agreement numerators are exact integers v(v-1)+(3-v)(2-v); "
    "kappa is ONE shared IEEE expression over three int64 sums, "
    "milli-floored. Scale: rides the same vocab join-back as "
    "quality_filter_threshold_curve; the kappa itself is one "
    "single-row agg.",
)
def q_quality_rater_agreement_kappa(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)
        ).alias("token"),
    )
    df_counts = toks.groupBy("token").agg(F.count("*").cast("long").alias("c"))
    per_doc = (
        toks.join(F.broadcast(df_counts), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.countDistinct("token").cast("long").alias("n_distinct"),
            F.sum(F.when(F.col("c") <= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_rare"),
        )
    )
    v = (
        F.when(F.col("n_tokens") >= 40, 1).otherwise(0)
        + F.when(
            F.expr("n_rare * 1000000 DIV n_tokens") < 200000, 1
        ).otherwise(0)
        + F.when(F.col("n_distinct") * 2 > F.col("n_tokens"), 1).otherwise(0)
    ).cast("long")
    rated = per_doc.select(v.alias("v"))
    comp = rated.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("v").cast("long").alias("votes"),
        F.sum(
            F.col("v") * (F.col("v") - 1) + (3 - F.col("v")) * (2 - F.col("v"))
        )
        .cast("long")
        .alias("agree_num"),
        F.sum(F.when(F.col("v").isin(0, 3), 1).otherwise(0))
        .cast("long")
        .alias("n_unanimous"),
    )
    return comp.select(
        "n_docs",
        "votes",
        "agree_num",
        "n_unanimous",
        F.expr(_KAPPA_MILLI).alias("fleiss_kappa_milli"),
    )


# ---------------------------------------------------------------------------
# Round 9 fourth wave: Gopher-style rule-based quality filter battery.
# ---------------------------------------------------------------------------

#: Rule thresholds, tuned to discriminate on the fixture corpus while
#: staying per-document scale-invariant (a doc's pass/fail never
#: depends on corpus size, so none of the rules can go vacuous as
#: data grows — the apriori lesson). Published-pipeline analogues:
#: Gopher (Rae et al. 2021, Table A1) / Dolma / FineWeb keep rules.
_GQ_MIN_TOKENS = 25
_GQ_MAX_TOKENS = 90
_GQ_MEAN_LEN_LO = 4  # mean word length in [4, 6], cross-multiplied
_GQ_MEAN_LEN_HI = 6
_GQ_MIN_STOPWORDS = 2
_GQ_MAX_TOKEN_LEN = 7
_GQ_SINGLE_CHAR_PPM = 100_000  # <=10% one-char tokens

_GQ_SQL = f"""
WITH t AS (
    SELECT doc_id, source,
           regexp_split_to_array(trim(text), '\\s+') AS toks,
           CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT)
               AS sum_len,
           CAST(length(regexp_extract_all(
               text, '\\b(the|a|and|of|to|in)\\b')) AS BIGINT) AS n_stop
    FROM documents
),
m AS (
    SELECT doc_id, source, sum_len, n_stop,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           CAST(list_max(list_transform(toks, x -> length(x))) AS BIGINT)
               AS max_tok_len,
           CAST(len(list_filter(toks, x -> length(x) = 1)) AS BIGINT)
               AS n_single
    FROM t
)
SELECT doc_id, source, n_tokens, sum_len, n_stop, n_distinct,
       max_tok_len, n_single,
       (n_tokens BETWEEN {_GQ_MIN_TOKENS} AND {_GQ_MAX_TOKENS})
           AS rule_word_count,
       (sum_len >= {_GQ_MEAN_LEN_LO} * n_tokens
        AND sum_len <= {_GQ_MEAN_LEN_HI} * n_tokens) AS rule_mean_word_len,
       (n_stop >= {_GQ_MIN_STOPWORDS}) AS rule_stopwords,
       (n_distinct * 2 >= n_tokens) AS rule_distinct_ratio,
       (max_tok_len <= {_GQ_MAX_TOKEN_LEN}) AS rule_max_word_len,
       (n_single * 1000000 <= {_GQ_SINGLE_CHAR_PPM} * n_tokens)
           AS rule_single_char,
       (CASE WHEN n_tokens BETWEEN {_GQ_MIN_TOKENS} AND {_GQ_MAX_TOKENS}
             THEN 1 ELSE 0 END
        + CASE WHEN sum_len >= {_GQ_MEAN_LEN_LO} * n_tokens
               AND sum_len <= {_GQ_MEAN_LEN_HI} * n_tokens
               THEN 1 ELSE 0 END
        + CASE WHEN n_stop >= {_GQ_MIN_STOPWORDS} THEN 1 ELSE 0 END
        + CASE WHEN n_distinct * 2 >= n_tokens THEN 1 ELSE 0 END
        + CASE WHEN max_tok_len <= {_GQ_MAX_TOKEN_LEN} THEN 1 ELSE 0 END
        + CASE WHEN n_single * 1000000 <= {_GQ_SINGLE_CHAR_PPM} * n_tokens
               THEN 1 ELSE 0 END) AS n_rules_passed,
       (n_tokens BETWEEN {_GQ_MIN_TOKENS} AND {_GQ_MAX_TOKENS}
        AND sum_len >= {_GQ_MEAN_LEN_LO} * n_tokens
        AND sum_len <= {_GQ_MEAN_LEN_HI} * n_tokens
        AND n_stop >= {_GQ_MIN_STOPWORDS}
        AND n_distinct * 2 >= n_tokens
        AND max_tok_len <= {_GQ_MAX_TOKEN_LEN}
        AND n_single * 1000000 <= {_GQ_SINGLE_CHAR_PPM} * n_tokens)
           AS keep
FROM m
"""


@register(
    "gopher_quality_rules",
    _GQ_SQL,
    doc="Gopher-style rule-based quality filter battery (Rae et al. "
    "2021 Table A1 / Dolma / FineWeb keep rules, adapted to the "
    "fixture's punctuation-free corpus): six per-document rules — "
    "word-count bounds, mean-word-length bounds (exact via "
    "cross-multiplication, no division), minimum stopword count, "
    "distinct-token ratio, maximum word length, and single-char "
    "token fraction (exact ppm integer compare) — each emitted as "
    "its own flag plus the rule-vote count and the conjunctive keep "
    "decision, so a curation run can audit WHICH rule kills a "
    "document, not just that one did (the per-rule attribution "
    "FineWeb publishes). Complements doc_quality (soft composite "
    "score) with the hard-gate spelling. All integer/boolean "
    "arithmetic on scan-local array expressions: zero shuffle, zero "
    "float, whole-stage codegen end-to-end; every rule is "
    "per-document scale-invariant so no threshold can go vacuous as "
    "the corpus grows.",
)
def q_gopher_quality_rules(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = docs.select(
        "doc_id",
        "source",
        toks.alias("toks"),
        F.length(F.regexp_replace(F.col("text"), r"\s+", ""))
        .cast("long")
        .alias("sum_len"),
        F.regexp_count(F.col("text"), F.lit(r"\b(the|a|and|of|to|in)\b"))
        .cast("long")
        .alias("n_stop"),
    )
    m = base.select(
        "doc_id",
        "source",
        "sum_len",
        "n_stop",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
        F.array_max(F.transform("toks", F.length))
        .cast("long")
        .alias("max_tok_len"),
        F.size(F.filter("toks", lambda t: F.length(t) == 1))
        .cast("long")
        .alias("n_single"),
    )
    r_wc = F.col("n_tokens").between(_GQ_MIN_TOKENS, _GQ_MAX_TOKENS)
    r_mwl = (F.col("sum_len") >= _GQ_MEAN_LEN_LO * F.col("n_tokens")) & (
        F.col("sum_len") <= _GQ_MEAN_LEN_HI * F.col("n_tokens")
    )
    r_stop = F.col("n_stop") >= _GQ_MIN_STOPWORDS
    r_dist = F.col("n_distinct") * 2 >= F.col("n_tokens")
    r_maxl = F.col("max_tok_len") <= _GQ_MAX_TOKEN_LEN
    r_single = (
        F.col("n_single") * 1_000_000
        <= _GQ_SINGLE_CHAR_PPM * F.col("n_tokens")
    )
    votes = sum(
        F.when(r, 1).otherwise(0)
        for r in (r_wc, r_mwl, r_stop, r_dist, r_maxl, r_single)
    )
    return m.select(
        "doc_id",
        "source",
        "n_tokens",
        "sum_len",
        "n_stop",
        "n_distinct",
        "max_tok_len",
        "n_single",
        r_wc.alias("rule_word_count"),
        r_mwl.alias("rule_mean_word_len"),
        r_stop.alias("rule_stopwords"),
        r_dist.alias("rule_distinct_ratio"),
        r_maxl.alias("rule_max_word_len"),
        r_single.alias("rule_single_char"),
        votes.cast("long").alias("n_rules_passed"),
        (r_wc & r_mwl & r_stop & r_dist & r_maxl & r_single).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Round 9 fourth wave: temperature-based source mixture reweighting.
# ---------------------------------------------------------------------------

#: Integer sqrt via floor(sqrt(double)) with a +/-1 adjustment: for
#: int64 inputs the double sqrt is correctly rounded but floor() can
#: land one off at perfect-square boundaries; the two correction
#: terms make the result the EXACT floor(sqrt(n)) in both engines.
_ISQRT = (
    "(CAST(FLOOR(SQRT(CAST({n} AS DOUBLE))) AS BIGINT)"
    " - CASE WHEN CAST(FLOOR(SQRT(CAST({n} AS DOUBLE))) AS BIGINT)"
    "          * CAST(FLOOR(SQRT(CAST({n} AS DOUBLE))) AS BIGINT) > {n}"
    "        THEN 1 ELSE 0 END"
    " + CASE WHEN (CAST(FLOOR(SQRT(CAST({n} AS DOUBLE))) AS BIGINT) + 1)"
    "          * (CAST(FLOOR(SQRT(CAST({n} AS DOUBLE))) AS BIGINT) + 1)"
    "          <= {n}"
    "        THEN 1 ELSE 0 END)"
)

_TEMP_MIX_SQL = f"""
WITH avail AS (
    SELECT source,
           CAST(SUM(length(regexp_extract_all(text, '\\S+'))) AS BIGINT)
               AS avail_tokens
    FROM documents GROUP BY source
),
rooted AS (
    SELECT source, avail_tokens,
           {_ISQRT.format(n='avail_tokens')} AS isqrt_tokens
    FROM avail
),
tot AS (
    SELECT CAST(SUM(avail_tokens) AS BIGINT) AS corpus_tokens,
           CAST(SUM(isqrt_tokens) AS BIGINT) AS root_denom,
           CAST(COUNT(*) AS BIGINT) AS n_sources
    FROM rooted
)
SELECT r.source, r.avail_tokens, r.isqrt_tokens,
       CAST(r.isqrt_tokens * 1000000 // t.root_denom AS BIGINT)
           AS weight_ppm,
       CAST(r.avail_tokens * 1000000 // t.corpus_tokens AS BIGINT)
           AS prop_ppm,
       CAST(1000000 // t.n_sources AS BIGINT) AS flat_ppm,
       (r.isqrt_tokens * t.corpus_tokens
        > r.avail_tokens * t.root_denom) AS upweighted
FROM rooted r, tot t
ORDER BY r.source
"""


@register(
    "mixture_temperature_allocation",
    _TEMP_MIX_SQL,
    doc="Temperature-based source mixture reweighting (the "
    "multilingual sampling-temperature scheme of mBERT/XLM-R/mT5: "
    "w_i proportional to n_i^tau): at tau=1/2 the power is an integer "
    "sqrt, computed EXACTLY via floor(sqrt(double)) plus a two-term "
    "boundary correction (sqrt is correctly rounded, the correction "
    "makes floor exact at perfect squares), so the whole allocation "
    "stays integer — temperature weight, proportional (tau=1) weight, "
    "and flat (tau=0) weight all in exact ppm, plus the upweighted "
    "flag from an exact cross-multiplied comparison (isqrt_i*SUM(n) > "
    "n_i*SUM(isqrt) <=> temperature upweights source i, i.e. the "
    "source is below corpus-average size — the low-resource boost "
    "that is the scheme's entire point). Complements "
    "source_mixture_token_allocation (config-ramp weights): this "
    "entry DERIVES the weights from the data. One scan-local "
    "aggregate to a 20-row frame + one broadcast of the 1-row "
    "totals: no shuffle beyond the group-by, no float in any "
    "emitted value.",
)
def q_mixture_temperature_allocation(spark, sf_dir):
    from ecom_churn_lakehouse_spark.functions.text import token_count_col

    docs = load_table(spark, sf_dir, "documents")
    avail = docs.groupBy("source").agg(
        F.sum(token_count_col(F.col("text"))).cast("long").alias(
            "avail_tokens"
        )
    )
    rooted = avail.select(
        "source",
        "avail_tokens",
        F.expr(_ISQRT.format(n="avail_tokens")).cast("long").alias(
            "isqrt_tokens"
        ),
    )
    tot = rooted.agg(
        F.sum("avail_tokens").cast("long").alias("corpus_tokens"),
        F.sum("isqrt_tokens").cast("long").alias("root_denom"),
        F.count("*").cast("long").alias("n_sources"),
    )
    j = rooted.join(F.broadcast(tot))
    return j.select(
        "source",
        "avail_tokens",
        "isqrt_tokens",
        F.expr("isqrt_tokens * 1000000 DIV root_denom")
        .cast("long")
        .alias("weight_ppm"),
        F.expr("avail_tokens * 1000000 DIV corpus_tokens")
        .cast("long")
        .alias("prop_ppm"),
        F.expr("1000000 DIV n_sources").cast("long").alias("flat_ppm"),
        (
            F.col("isqrt_tokens") * F.col("corpus_tokens")
            > F.col("avail_tokens") * F.col("root_denom")
        ).alias("upweighted"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# Round 9 fourth wave: cross-source quantile normalization.
# ---------------------------------------------------------------------------

_QN_BUCKETS = 20  # ventile grid


def _qn_sql() -> str:
    pooled_cols = ",\n           ".join(
        f"CAST(quantile_disc(n_tokens, {k}.0 / {_QN_BUCKETS}) AS BIGINT)"
        f" AS q{k}"
        for k in range(1, _QN_BUCKETS + 1)
    )
    bucket_case = " ".join(
        f"WHEN b = {k} THEN q{k}" for k in range(1, _QN_BUCKETS + 1)
    )
    return f"""
WITH toks AS (
    SELECT doc_id, source,
           CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT)
               AS n_tokens
    FROM documents
),
ranked AS (
    SELECT doc_id, source, n_tokens,
           CAST(COUNT(*) OVER (PARTITION BY source
                               ORDER BY n_tokens, doc_id) AS BIGINT) AS r,
           CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
    FROM toks
),
pooled AS (
    SELECT {pooled_cols}
    FROM toks
),
mapped AS (
    SELECT doc_id, source, n_tokens, r, n_src,
           CAST((r * {_QN_BUCKETS} + n_src - 1) // n_src AS BIGINT) AS b
    FROM ranked
)
SELECT m.doc_id, m.source, m.n_tokens,
       m.b AS ventile,
       CAST(CASE {bucket_case} END AS BIGINT) AS normalized_tokens
FROM mapped m CROSS JOIN pooled
"""


@register(
    "doc_length_quantile_normalization",
    _qn_sql(),
    doc=f"Cross-source quantile normalization of document length: "
    "each document's within-source rank maps to its ventile "
    f"(ceil(r*{_QN_BUCKETS}/n), exact ceiling division on "
    "non-negative ints), and the normalized value is the POOLED "
    "corpus's discrete quantile at that ventile — after this, every "
    "source's length distribution is the pooled one (the "
    "quantile-normalization recipe from microarray statistics, here "
    "the mixing-prep step that stops a verbose source from "
    "dominating token budgets while preserving within-source "
    "ordering). Everything is exact integers: within-source ranks "
    "from a PARTITIONED window (deterministic doc_id tie-break), "
    "the pooled map is one aggregate of "
    f"{_QN_BUCKETS} percentile_disc data values broadcast to every "
    "row. Scale: the window partitions by source (parallel across "
    "sources), the pooled grid is dimension-bounded; no global "
    "sort, no float.",
)
def q_doc_length_quantile_normalization(spark, sf_dir):
    from pyspark.sql import Window as W

    from ecom_churn_lakehouse_spark.functions.text import token_count_col

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        token_count_col(F.col("text")).alias("n_tokens"),
    )
    w = W.partitionBy("source").orderBy("n_tokens", "doc_id")
    wp = W.partitionBy("source")
    ranked = toks.select(
        "doc_id",
        "source",
        "n_tokens",
        F.count("*").over(w).cast("long").alias("r"),
        F.count("*").over(wp).cast("long").alias("n_src"),
    )
    pooled = toks.agg(
        *[
            F.expr(
                f"percentile_disc({k}.0 / {_QN_BUCKETS})"
                " WITHIN GROUP (ORDER BY n_tokens)"
            )
            .cast("long")
            .alias(f"q{k}")
            for k in range(1, _QN_BUCKETS + 1)
        ]
    )
    bucket_case = " ".join(
        f"WHEN b = {k} THEN q{k}" for k in range(1, _QN_BUCKETS + 1)
    )
    mapped = ranked.withColumn(
        "b",
        F.expr(
            f"CAST((r * {_QN_BUCKETS} + n_src - 1) DIV n_src AS BIGINT)"
        ),
    )
    return mapped.crossJoin(F.broadcast(pooled)).select(
        "doc_id",
        "source",
        "n_tokens",
        F.col("b").alias("ventile"),
        F.expr(f"CAST(CASE {bucket_case} END AS BIGINT)").alias(
            "normalized_tokens"
        ),
    )


# ---------------------------------------------------------------------------
# Round 10: content-defined chunking (CDC) — VERDICT r9 directive #4.
# ---------------------------------------------------------------------------

#: Rolling-hash window (tokens). Editing one token perturbs exactly
#: the W hashes whose window covers it, so every boundary outside
#: that span is untouched — the CDC boundary-stability property,
#: pinned by tests/test_cdc_chunking.py.
_CDC_W = 4
#: Boundary divisor: cut after token i when H_i % _CDC_DIV == 0, so
#: the expected chunk length is _CDC_DIV tokens (geometric).
_CDC_DIV = 16
#: Portable per-token surrogate hash — length + three character
#: probes, all exact small-int arithmetic both engines share
#: (ascii/substr/length; the GREATEST keeps the third probe in range
#: for 1-char tokens without integer division).
_CDC_TOKHASH = (
    "((length({t}) * 131"
    " + ascii(substr({t}, 1, 1)) * 31"
    " + ascii(substr({t}, length({t}), 1)) * 17"
    " + ascii(substr({t}, GREATEST(length({t}) - 1, 1), 1)) * 7"
    ") % 1024)"
)
#: Window-polynomial rolling hash over the last W=4 token hashes via
#: LAG (odd-prime multipliers; max pre-mod value ~1.2e8, no overflow).
_CDC_ROLL = (
    "((COALESCE(h3, 0) * 7919 + COALESCE(h2, 0) * 104729"
    " + COALESCE(h1, 0) * 31 + h * 1009) % 65536)"
)

_CDC_BOUNDARIES_SQL = f"""
WITH toks AS (
    SELECT doc_id, regexp_extract_all(trim(text), '\\S+') AS t
    FROM documents
),
tok AS (
    SELECT doc_id, CAST(i AS BIGINT) AS pos, t[i] AS token
    FROM toks, unnest(generate_series(1, len(t))) AS u(i)
    WHERE len(t) > 0
),
hashed AS (
    SELECT doc_id, pos, token,
           {_CDC_TOKHASH.format(t='token')} AS h
    FROM tok
),
rolled AS (
    SELECT doc_id, pos, token, h,
           LAG(h, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS h1,
           LAG(h, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS h2,
           LAG(h, 3) OVER (PARTITION BY doc_id ORDER BY pos) AS h3
    FROM hashed
),
flagged AS (
    SELECT doc_id, pos, token,
           CASE WHEN pos >= {_CDC_W}
                 AND {_CDC_ROLL} % {_CDC_DIV} = 0
                THEN 1 ELSE 0 END AS cut_after
    FROM rolled
),
assigned AS (
    SELECT doc_id, pos, token,
           COALESCE(SUM(cut_after) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS chunk_idx
    FROM flagged
)
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(MIN(pos) AS BIGINT) AS start_pos,
       CAST(MAX(pos) AS BIGINT) AS end_pos,
       CAST(COUNT(*) AS BIGINT) AS n_chunk_tokens,
       md5(string_agg(token, ' ' ORDER BY pos)) AS chunk_hash
FROM assigned
GROUP BY doc_id, chunk_idx
"""


def _cdc_token_frame(corpus):
    """(doc_id, pos, token) -> chunk_idx assignment via the shared
    CDC rolling-hash algebra (Spark spelling)."""
    from pyspark.sql import Window

    toks = F.split(F.trim(F.col("text")), r"\s+")
    tok = (
        corpus.select("doc_id", toks.alias("__toks"))
        .filter(F.size("__toks") > 0)
        .select(
            "doc_id",
            F.posexplode("__toks").alias("pos0", "token"),
        )
        .select(
            "doc_id",
            (F.col("pos0") + 1).cast("long").alias("pos"),
            "token",
        )
    )
    hashed = tok.withColumn(
        "h", F.expr(_CDC_TOKHASH.format(t="token"))
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    rolled = (
        hashed.withColumn("h1", F.lag("h", 1).over(w))
        .withColumn("h2", F.lag("h", 2).over(w))
        .withColumn("h3", F.lag("h", 3).over(w))
    )
    flagged = rolled.withColumn(
        "cut_after",
        F.when(
            (F.col("pos") >= _CDC_W)
            & (F.expr(_CDC_ROLL) % _CDC_DIV == 0),
            1,
        ).otherwise(0),
    )
    wcum = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return flagged.withColumn(
        "chunk_idx",
        F.coalesce(F.sum("cut_after").over(wcum), F.lit(0)).cast("long"),
    ).select("doc_id", "pos", "token", "chunk_idx")


@register(
    "cdc_chunk_boundaries",
    _CDC_BOUNDARIES_SQL,
    doc="Content-defined chunking (the Rabin/gear-cut dedup boundary "
    "scheme, LBFS/FastCDC lineage) expressed scan-locally: a window-"
    f"polynomial rolling hash over the last {_CDC_W} token hashes "
    f"(LAG frame per doc), a cut after every token where H % "
    f"{_CDC_DIV} == 0 (expected chunk = {_CDC_DIV} tokens), and "
    "chunk membership as the running boundary count (1-preceding "
    "cumulative frame). Pure hash-cut, no min/max clamp: that keeps "
    "the scheme STATELESS per position, which is what makes it "
    "relational (FastCDC's min/max refinement is inherently "
    "sequential) and gives the boundary-stability property — editing "
    f"one token can only move cuts inside its {_CDC_W}-token hash "
    "span, pinned by an edit-locality pytest. All integer exact: "
    "portable char-probe token hashes (ascii/substr), odd-prime "
    "mixing, no overflow past ~1.2e8. Scale: windows are partitioned "
    "by doc_id (row-local fan-out, no global sort); work is linear "
    "in corpus tokens.",
)
def q_cdc_chunk_boundaries(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    assigned = _cdc_token_frame(docs)
    return (
        assigned.groupBy("doc_id", "chunk_idx")
        .agg(
            F.min("pos").cast("long").alias("start_pos"),
            F.max("pos").cast("long").alias("end_pos"),
            F.count("*").cast("long").alias("n_chunk_tokens"),
            F.md5(
                F.array_join(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "token"))
                    ).getField("token"),
                    " ",
                )
            ).alias("chunk_hash"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            "start_pos",
            "end_pos",
            "n_chunk_tokens",
            "chunk_hash",
        )
    )


#: Fixed-size comparison scheme for the savings entry: NON-overlapping
#: blocks of the same expected size as a CDC chunk, so the storage
#: comparison is like-for-like (the 32/24 doc_chunks windows overlap
#: by design — context windows, not dedup units).
_CDC_FIXED = _CDC_DIV

_CDC_SAVINGS_SQL = f"""
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 100000 AS doc_id, text
    FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id + 200000 AS doc_id, text || ' zz qq' AS text
    FROM documents WHERE doc_id % 7 = 0
    UNION ALL
    SELECT doc_id + 300000 AS doc_id, 'xx yy qq ' || text AS text
    FROM documents WHERE doc_id % 5 = 0
),
toks AS (
    SELECT doc_id, regexp_extract_all(trim(text), '\\S+') AS t
    FROM corpus
),
tok AS (
    SELECT doc_id, CAST(i AS BIGINT) AS pos, t[i] AS token
    FROM toks, unnest(generate_series(1, len(t))) AS u(i)
    WHERE len(t) > 0
),
hashed AS (
    SELECT doc_id, pos, token,
           {_CDC_TOKHASH.format(t='token')} AS h
    FROM tok
),
rolled AS (
    SELECT doc_id, pos, token, h,
           LAG(h, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS h1,
           LAG(h, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS h2,
           LAG(h, 3) OVER (PARTITION BY doc_id ORDER BY pos) AS h3
    FROM hashed
),
flagged AS (
    SELECT doc_id, pos, token,
           CASE WHEN pos >= {_CDC_W}
                 AND {_CDC_ROLL} % {_CDC_DIV} = 0
                THEN 1 ELSE 0 END AS cut_after
    FROM rolled
),
assigned AS (
    SELECT doc_id, pos, token,
           COALESCE(SUM(cut_after) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS cidx,
           (pos - 1) // {_CDC_FIXED} AS fidx
    FROM flagged
),
cdc_chunks AS (
    SELECT md5(string_agg(token, ' ' ORDER BY pos)) AS ch,
           COUNT(*) AS n_tokens
    FROM assigned GROUP BY doc_id, cidx
),
fixed_chunks AS (
    SELECT md5(string_agg(token, ' ' ORDER BY pos)) AS ch,
           COUNT(*) AS n_tokens
    FROM assigned GROUP BY doc_id, fidx
),
per_hash AS (
    SELECT 'cdc' AS scheme, ch, COUNT(*) AS copies,
           MIN(n_tokens) AS n_tokens
    FROM cdc_chunks GROUP BY ch
    UNION ALL
    SELECT 'fixed{_CDC_FIXED}' AS scheme, ch, COUNT(*) AS copies,
           MIN(n_tokens) AS n_tokens
    FROM fixed_chunks GROUP BY ch
)
SELECT scheme,
       CAST(SUM(copies) AS BIGINT) AS n_chunks,
       CAST(COUNT(*) AS BIGINT) AS n_unique_chunks,
       CAST(SUM(copies - 1) AS BIGINT) AS n_dup_chunks,
       CAST(SUM((copies - 1) * n_tokens) AS BIGINT) AS dup_tokens,
       CAST(SUM((copies - 1) * n_tokens) * 1000000
            // SUM(copies * n_tokens) AS BIGINT) AS savings_ppm
FROM per_hash
GROUP BY scheme
"""


@register(
    "cdc_dedup_savings",
    _CDC_SAVINGS_SQL,
    doc="Why CDC exists, measured: chunk-level dedup savings of the "
    "content-defined scheme vs same-expected-size non-overlapping "
    "fixed blocks, on the planted corpus EXTENDED with a 3-token "
    "PREFIX variant ('xx yy qq ' || text, doc_id % 5). Exact copies "
    "dedup under both schemes and the appended-tail variant stays "
    "aligned for both, but the prefix shift breaks every fixed block "
    "boundary while the rolling hash RE-SYNCHRONIZES after one "
    f"{_CDC_W}-token window — so cdc savings_ppm must strictly "
    "exceed the fixed scheme's (asserted by pytest). Same md5 "
    "hash-groupBy storage accounting as chunk_dedup_savings; exact "
    "ppm via DIV on non-negative token counts.",
)
def q_cdc_dedup_savings(spark, sf_dir):
    from ecom_churn_lakehouse_spark.queries.dedup_queries import (
        derived_corpus,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    prefix = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.concat(F.lit("xx yy qq "), F.col("text")).alias("text"),
    )
    corpus = derived_corpus(spark, sf_dir).unionByName(prefix)
    assigned = _cdc_token_frame(corpus).withColumn(
        "fidx", F.expr(f"(pos - 1) DIV {_CDC_FIXED}")
    )
    ordered_tokens = F.array_join(
        F.array_sort(F.collect_list(F.struct("pos", "token"))).getField(
            "token"
        ),
        " ",
    )

    def chunk_savings(grouped, scheme):
        per_hash = grouped.agg(
            F.md5(ordered_tokens).alias("ch"),
            F.count("*").alias("n_tokens"),
        ).groupBy("ch").agg(
            F.count("*").alias("copies"),
            F.min("n_tokens").alias("n_tokens"),
        )
        return per_hash.agg(
            F.sum("copies").cast("long").alias("n_chunks"),
            F.count("*").cast("long").alias("n_unique_chunks"),
            F.sum(F.col("copies") - 1).cast("long").alias("n_dup_chunks"),
            F.sum((F.col("copies") - 1) * F.col("n_tokens"))
            .cast("long")
            .alias("dup_tokens"),
            F.expr(
                "CAST(SUM((copies - 1) * n_tokens) * 1000000 "
                "DIV SUM(copies * n_tokens) AS BIGINT)"
            ).alias("savings_ppm"),
        ).select(F.lit(scheme).alias("scheme"), "*")

    base = assigned.localCheckpoint(eager=False)  # feeds both schemes
    cdc = chunk_savings(base.groupBy("doc_id", "chunk_idx"), "cdc")
    fixed = chunk_savings(
        base.groupBy("doc_id", "fidx"), f"fixed{_CDC_FIXED}"
    )
    return cdc.unionByName(fixed)
