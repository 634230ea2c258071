"""CDC chunking hand-checks (VERDICT r9 directive #4).

Pure-Python reimplementation of the CDC definition (independent of
both engines' SQL) drives: (1) the boundary-stability property —
editing one token moves cuts only inside its W-token hash span;
(2) Spark-vs-Python equality on real fixture docs; (3) the
cdc-beats-fixed savings ordering on the prefix-perturbed corpus.
"""

import pytest

from ecom_churn_lakehouse_spark.queries.curation_queries import (
    _CDC_DIV,
    _CDC_W,
    _cdc_token_frame,
    q_cdc_dedup_savings,
)

SF_DIR = "/root/testdata/sf0.001"


def _tok_hash(t: str) -> int:
    # independent recompute of the char-probe surrogate hash
    probe3 = t[max(len(t) - 2, 0)]
    return (
        len(t) * 131
        + ord(t[0]) * 31
        + ord(t[-1]) * 17
        + ord(probe3) * 7
    ) % 1024


def _boundaries(tokens: list[str]) -> list[int]:
    """1-based positions after which a cut falls (pure Python)."""
    hs = [_tok_hash(t) for t in tokens]
    cuts = []
    for i in range(len(tokens)):  # i is 0-based; pos = i + 1
        if i + 1 < _CDC_W:
            continue
        h3, h2, h1, h = hs[i - 3], hs[i - 2], hs[i - 1], hs[i]
        roll = (h3 * 7919 + h2 * 104729 + h1 * 31 + h * 1009) % 65536
        if roll % _CDC_DIV == 0:
            cuts.append(i + 1)
    return cuts


def test_boundary_stability_under_single_token_edit():
    """Edit token at position p (1-based): only cuts with positions
    in [p, p + W - 1] may change — every other boundary is identical.
    Checked across every edit position of a 200-token doc."""
    import random

    rng = random.Random(11)
    words = [
        "".join(rng.choice("abcdefghijklmnop") for _ in range(rng.randint(2, 9)))
        for _ in range(200)
    ]
    base = _boundaries(words)
    assert base, "fixture must produce at least one cut"
    for p0 in range(len(words)):
        edited = list(words)
        edited[p0] = edited[p0] + "x"
        new = _boundaries(edited)
        span = set(range(p0 + 1, p0 + _CDC_W + 1))  # 1-based positions
        assert set(base) - span == set(new) - span, (
            f"edit at pos {p0 + 1} moved a boundary outside its "
            f"{_CDC_W}-token hash span"
        )


def test_spark_chunk_assignment_matches_python(spark):
    """The Spark rolling-hash pipeline must agree with the independent
    Python recompute token-for-token on real fixture docs."""
    from ecom_churn_lakehouse_spark.sources import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    rows = _cdc_token_frame(docs).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], {})[r["pos"]] = r["chunk_idx"]
    checked = 0
    for doc_id, text in texts.items():
        tokens = text.strip().split()
        if not tokens:
            continue
        cuts = _boundaries(tokens)
        idx, want = 0, {}
        cutset = set(cuts)
        for i, _ in enumerate(tokens, start=1):
            want[i] = idx
            if i in cutset:
                idx += 1
        assert got[doc_id] == want, f"doc {doc_id} chunk map diverges"
        checked += 1
    assert checked >= 100


def test_cdc_savings_strictly_beat_fixed(spark):
    out = {
        r["scheme"]: r.asDict()
        for r in q_cdc_dedup_savings(spark, SF_DIR).collect()
    }
    assert set(out) == {"cdc", "fixed16"}
    assert out["cdc"]["savings_ppm"] > out["fixed16"]["savings_ppm"]
    # both schemes must see the planted exact copies at minimum
    assert out["fixed16"]["n_dup_chunks"] > 0
