"""MinHash signatures + LSH banding for near-duplicate detection.

Engine-portable construction (reproducible in any SQL engine, which is
how the DuckDB oracle checks it):

- shingle hash  h = (first 15 hex digits of md5(shingle) as int) mod P
- signature     mh_i = min over shingles of (a_i * h + b_i) mod P
- banding       K signatures split into B bands of R rows; docs
                sharing any full band become candidate pairs
- verification  exact Jaccard on the shingle sets of candidates only

P = 2^31 - 1 keeps every product below 2^62 (no int64 overflow under
ANSI mode). Constants a_i, b_i come from a fixed seeded generator so
Spark and the oracle agree.

Scale: signatures are one groupBy(doc) over the shingle relation;
banding explodes each doc into B rows; candidate generation is a
self-join on (band_idx, band_key) — bucket-local, never all-pairs.
Hot buckets (boilerplate text) are the skew risk: AQE skew-join
handles moderate cases; for pathological ones
:func:`capped_banded_pairs` bounds any bucket's candidate
contribution (second-family re-band, then doc-hash salt).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "choose_bands",
    "MINHASH_P",
    "MINHASH_A",
    "MINHASH_B",
    "shingle_hash_col",
    "minhash_signatures",
    "with_shingle_hashes",
    "minhash_signatures_from_arrays",
    "minhash_signatures_exploded",
    "jaccard_on_pairs_arrays",
    "banded_signatures",
    "capped_banded_pairs",
    "doc_salt_col",
    "REBAND_ROWS",
    "REBAND_A",
    "REBAND_B",
    "lsh_candidate_pairs",
    "lsh_probe_candidates",
    "jaccard_on_pairs",
]

MINHASH_P = 2_147_483_647  # 2^31 - 1
NUM_HASHES = 16
NUM_BANDS = 4
ROWS_PER_BAND = NUM_HASHES // NUM_BANDS

_rng = random.Random(42)
MINHASH_A = [_rng.randrange(1, MINHASH_P) for _ in range(NUM_HASHES)]
MINHASH_B = [_rng.randrange(0, MINHASH_P) for _ in range(NUM_HASHES)]

# Second, independent hash family for bucket-cap re-banding: over-cap
# buckets are sub-bucketed by a 2-row minhash key from THIS family, so
# genuinely similar members stay together (collision prob s^2) while
# boilerplate-only collisions scatter. Separate seed so the families
# can never alias.
REBAND_ROWS = 2
_rng2 = random.Random(4242)
REBAND_A = [_rng2.randrange(1, MINHASH_P) for _ in range(REBAND_ROWS)]
REBAND_B = [_rng2.randrange(0, MINHASH_P) for _ in range(REBAND_ROWS)]


def choose_bands(
    threshold: float, n_hashes: int
) -> tuple[int, int, float]:
    """Pick the (bands, rows_per_band) split whose LSH S-curve
    midpoint sits closest to the target Jaccard ``threshold``.

    The probability a pair with true similarity s shares >= 1 band is
    1 - (1 - s^r)^b; its steep midpoint is s* ~ (1/b)^(1/r). Tuning
    (b, r) is how a pipeline trades candidate recall against join
    fan-out BEFORE running anything — at 100 TB the difference between
    r=2 and r=4 is orders of magnitude of candidate pairs. Returns
    (bands, rows_per_band, midpoint) over the divisors of
    ``n_hashes``.

    >>> choose_bands(0.5, 16)
    (8, 2, 0.3535533905932738)
    >>> choose_bands(0.2, 16)[0:2]
    (16, 1)
    """
    if not 0 < threshold < 1:
        raise ValueError(f"threshold must be in (0,1), got {threshold}")
    best = None
    for r in range(1, n_hashes + 1):
        if n_hashes % r:
            continue
        b = n_hashes // r
        mid = (1.0 / b) ** (1.0 / r)
        if best is None or abs(mid - threshold) < abs(best[2] - threshold):
            best = (b, r, mid)
    return best


def shingle_hash_col(shingle):
    """Portable 31-bit shingle hash: md5-prefix integer mod P."""
    return (
        F.conv(F.substring(F.md5(shingle), 1, 15), 16, 10).cast("long") % MINHASH_P
    )


def minhash_signatures(shingled: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """K min-hash values per doc: columns mh0..mh{K-1}.

    The md5-based shingle hash is projected ONCE before the aggregate —
    inside the K min() expressions it would be at the mercy of
    subexpression elimination; here each row pays exactly one md5
    regardless of K.
    """
    hashed = shingled.select(
        id_col, shingle_hash_col(F.col("shingle")).alias("__h")
    )
    h = F.col("__h")
    return hashed.groupBy(id_col).agg(
        *[
            F.min((F.lit(MINHASH_A[i]) * h + F.lit(MINHASH_B[i])) % MINHASH_P).alias(
                f"mh{i}"
            )
            for i in range(NUM_HASHES)
        ],
        # shingle-set size rides along for free — downstream Jaccard
        # verification needs it, and computing it here saves a full
        # recompute of the explode+distinct shingle lineage.
        F.count("*").alias("n_sh"),
    )


def with_shingle_hashes(
    arrays: DataFrame, shingles_col: str = "shingles"
) -> DataFrame:
    """Append an array of 31-bit shingle hashes (``__hs``) — scan-local."""
    hs = F.transform(
        F.col(shingles_col),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        % MINHASH_P,
    )
    return arrays.withColumn("__hs", hs)


def minhash_signatures_from_arrays(
    hashed_arrays: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """K min-hash values per doc from the array representation.

    ZERO shuffle: each signature is an ``array_min`` over a scan-local
    transform of the per-doc hash array (``with_shingle_hashes``),
    where the exploded form (:func:`minhash_signatures`) pays an
    explode + groupBy exchange first. At 100 TB this turns signature
    computation into a map-only stage; the first exchange in the whole
    LSH pipeline becomes the (already small) band self-join.
    """
    h = F.col("__hs")
    return hashed_arrays.select(
        id_col,
        *[
            F.array_min(
                F.transform(
                    h, lambda x: (F.lit(MINHASH_A[i]) * x + F.lit(MINHASH_B[i])) % MINHASH_P
                )
            ).alias(f"mh{i}")
            for i in range(NUM_HASHES)
        ],
        F.size("__hs").alias("n_sh"),
    )


def minhash_signatures_exploded(
    arrays: DataFrame,
    id_col: str = "doc_id",
    shingles_col: str = "shingles",
    include_reband: bool = False,
) -> DataFrame:
    """K min-hash values per doc via explode + hash-aggregate — the
    FAST path on this Spark build, despite the shuffle.

    The array form (:func:`minhash_signatures_from_arrays`) is map-only
    but evaluates 16 higher-order ``transform``/``array_min`` passes in
    INTERPRETED mode (lambda expressions don't enter whole-stage
    codegen); this form keeps everything codegen-resident — md5 per
    exploded row, 16 ``min`` aggregates in one vectorized hash
    aggregate — measured 2.5 s → 1.7 s at sf0.1 for the full LSH
    pipeline. Scale: partial aggregation collapses each partition to
    one row per doc BEFORE the exchange (a doc's shingles are
    co-located coming out of the explode), so the shuffle carries
    |docs|·K values, not the exploded relation.

    ``arrays``: the (id, shingles) relation — pass the SAME
    (checkpointed) frame the verify stage reads so the shingle parse
    runs once.
    """
    sh = arrays.select(id_col, F.explode(shingles_col).alias("__s"))
    hashed = sh.select(id_col, shingle_hash_col(F.col("__s")).alias("__h"))
    h = F.col("__h")
    reband = (
        [
            F.min(
                (F.lit(REBAND_A[i]) * h + F.lit(REBAND_B[i])) % MINHASH_P
            ).alias(f"rb{i}")
            for i in range(REBAND_ROWS)
        ]
        if include_reband
        else []
    )
    return hashed.groupBy(id_col).agg(
        *[
            F.min((F.lit(MINHASH_A[i]) * h + F.lit(MINHASH_B[i])) % MINHASH_P).alias(
                f"mh{i}"
            )
            for i in range(NUM_HASHES)
        ],
        *reband,
    )


def jaccard_on_pairs_arrays(
    pairs: DataFrame, arrays: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Exact Jaccard for candidate pairs via ``array_intersect``.

    Joins the (small) pair set against the compact doc→shingle-array
    relation twice; the set intersection itself is row-local. With
    sparse candidates this replaces two shuffles of the exploded
    shingle relation with two joins of |pairs| rows.
    """
    a = arrays.select(
        F.col(id_col).alias("doc_a"),
        F.col("shingles").alias("__sh_a"),
        F.size("shingles").alias("__n_a"),
    )
    b = arrays.select(
        F.col(id_col).alias("doc_b"),
        F.col("shingles").alias("__sh_b"),
        F.size("shingles").alias("__n_b"),
    )
    n_common = F.size(F.array_intersect("__sh_a", "__sh_b"))
    return (
        pairs.join(a, on="doc_a")
        .join(b, on="doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                n_common.cast("double")
                / (F.col("__n_a") + F.col("__n_b") - n_common),
                6,
            ).alias("jaccard"),
        )
    )


def banded_signatures(
    signatures: DataFrame,
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Explode a signature row into its (band_idx, band_key) LSH bands.

    ``carry_cols`` ride through the explode unchanged (e.g. the
    re-band key in :func:`capped_banded_pairs`) — carrying them here is
    free, where joining them back on ``id_col`` later would cost a
    full shuffle of the banded relation.
    """
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band_idx"),
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"mh{j * ROWS_PER_BAND + r}")
                        for r in range(ROWS_PER_BAND)
                    ],
                ).alias("band_key"),
            )
            for j in range(NUM_BANDS)
        ]
    )
    return signatures.select(
        F.col(id_col), *carry_cols, F.explode(bands).alias("b")
    ).select(
        id_col,
        *carry_cols,
        F.col("b.band_idx").alias("band_idx"),
        F.col("b.band_key").alias("band_key"),
    )


def lsh_candidate_pairs(signatures: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct candidate pairs (doc_a < doc_b) sharing ≥1 full band."""
    banded = banded_signatures(signatures, id_col)
    a = banded.select(
        F.col(id_col).alias("doc_a"), "band_idx", "band_key"
    )
    b = banded.select(
        F.col(id_col).alias("doc_b"), "band_idx", "band_key"
    )
    return (
        a.join(b, on=["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def doc_salt_col(id_col, modulus):
    """Portable per-doc salt: md5-prefix integer of the id, mod P,
    then mod ``modulus`` — reproducible verbatim in the DuckDB oracle
    (same construction as :func:`shingle_hash_col`)."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 15), 16, 10).cast(
            "long"
        )
        % MINHASH_P
    ) % modulus


def capped_banded_pairs(
    signatures: DataFrame, id_col: str = "doc_id", cap: int = 16
) -> DataFrame:
    """LSH candidate pairs with a bucket-size cost contract: no single
    (band, key) bucket may contribute more than ~|bucket| * cap / 2
    candidate pairs, so one boilerplate mega-bucket of size m can
    never inject m(m-1)/2 pairs into the verify stage (the failure
    mode the ``lsh_bucket_occupancy`` diagnostic measures — this is
    the mitigation it motivates).

    Two deterministic levels, both engine-portable:

    1. **Re-band (similarity-preserving).** Members of a bucket larger
       than ``cap`` are sub-bucketed by a 2-row minhash key from a
       SECOND hash family (``rb0,rb1``): genuinely similar members
       collide again with probability s^2 (exact duplicates with
       certainty), while boilerplate-only collisions — whose minima
       came from a few shared shingles that happen to win the first
       family's rows — scatter, because the second family's minima are
       won by each doc's own content with fresh randomness.
    2. **Salt (hard cost cap).** Sub-buckets STILL larger than ``cap``
       (every member shares both band key and re-band key) are salted
       into ceil(size/cap) groups by a doc-id hash. This is the
       explicit cost policy: a group of > cap docs with identical
       17-minhash evidence is near-certainly an identical-content
       mega-cluster, whose full quadratic pair list the pairwise
       surface REFUSES to enumerate — exact_dedup (hash-groupBy) is
       the linear-cost path for those, and each salt group still
       emits enough pairs to flag every member as a duplicate.

    With ``cap`` above the corpus's max bucket size both levels are
    inert and the output is IDENTICAL to :func:`lsh_candidate_pairs`
    (the registry entry's oracle states exactly that equivalence).
    Scale shape: two count-aggregates and the pair self-join all
    shuffle on the same band-bucket key family; candidate volume is
    sum over buckets of min-quadratic-capped work, never raw m^2.
    """
    banded = banded_signatures(
        signatures.withColumn(
            "__rb",
            F.concat_ws(
                ",", *[F.col(f"rb{i}") for i in range(REBAND_ROWS)]
            ),
        ),
        id_col,
        carry_cols=("__rb",),
    )
    sz1 = banded.groupBy("band_idx", "band_key").agg(
        F.count("*").alias("__sz1")
    )
    lvl1 = banded.join(sz1, on=["band_idx", "band_key"]).withColumn(
        "__sub",
        F.when(F.col("__sz1") > cap, F.col("__rb")).otherwise(F.lit("")),
    )
    sz2 = lvl1.groupBy("band_idx", "band_key", "__sub").agg(
        F.count("*").alias("__sz2")
    )
    lvl2 = lvl1.join(sz2, on=["band_idx", "band_key", "__sub"]).withColumn(
        "__salt",
        F.when(
            F.col("__sz2") > cap,
            doc_salt_col(
                F.col(id_col), F.expr(f"(__sz2 + {cap} - 1) DIV {cap}")
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    keyed = lvl2.select(id_col, "band_idx", "band_key", "__sub", "__salt")
    a = keyed.select(
        F.col(id_col).alias("doc_a"), "band_idx", "band_key", "__sub", "__salt"
    )
    b = keyed.select(
        F.col(id_col).alias("doc_b"), "band_idx", "band_key", "__sub", "__salt"
    )
    return (
        a.join(b, on=["band_idx", "band_key", "__sub", "__salt"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def lsh_probe_candidates(
    index_sigs: DataFrame, probe_sigs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """ASYMMETRIC LSH candidate generation: probe a NEW batch against
    an EXISTING index — the incremental-dedup shape.

    Emits (doc_a = index doc, doc_b = probe doc) pairs sharing ≥1 full
    band. Unlike :func:`lsh_candidate_pairs`, no probe-vs-probe or
    index-vs-index candidates are ever generated: at 100 TB the index
    side's bands are precomputed once (persistable as a bucketed table,
    see similarity/index.py for the ANN analogue) and each day's batch
    only pays |batch| x band-collision work — never a re-dedup of the
    whole corpus.
    """
    a = banded_signatures(index_sigs, id_col).select(
        F.col(id_col).alias("doc_a"), "band_idx", "band_key"
    )
    b = banded_signatures(probe_sigs, id_col).select(
        F.col(id_col).alias("doc_b"), "band_idx", "band_key"
    )
    # doc_a != doc_b: a re-delivered doc_id present on BOTH sides
    # (at-least-once sources) would otherwise collide on every band and
    # emit a self-pair with Jaccard 1.0 — flagging the doc as a
    # duplicate of itself.
    return (
        a.join(b, on=["band_idx", "band_key"])
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_on_pairs(
    pairs: DataFrame,
    shingled: DataFrame,
    id_col: str = "doc_id",
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard similarity for candidate pairs only.

    ``|A ∩ B|`` via a shingle equi-join restricted to the pairs;
    ``|A ∪ B| = |A| + |B| − |A ∩ B|``. All joins are key-local.

    The shingle relation is first semi-joined down to candidate docs:
    with sparse candidates (the realistic near-dup regime) this drops
    the verify join's input by the non-candidate fraction — measured
    2.4× on the whole LSH pipeline at 50k docs. Sizes still come from
    the full relation (they must count every shingle of a doc).
    """
    if sizes is None:
        sizes = shingled.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    cand_docs = (
        pairs.select(F.col("doc_a").alias(id_col))
        .unionByName(pairs.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    cand_shingles = shingled.join(cand_docs, on=id_col, how="left_semi")
    sh_a = cand_shingles.select(F.col(id_col).alias("doc_a"), "shingle")
    sh_b = cand_shingles.select(F.col(id_col).alias("doc_b"), "shingle")
    common = (
        pairs.join(sh_a, on="doc_a")
        .join(sh_b, on=["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a")), on="doc_a")
        .join(sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b")), on="doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )
