"""Fellegi-Sunter hand-checks (VERDICT r9 directive #5).

Recomputes m/u from the raw pair frame in pure Python (independent of
the fused SQL aggregation) and drives the pair-level product score —
the monotone equivalent of the FS log-weight sum — through banding.
"""

import pytest

from ecom_churn_lakehouse_spark.queries.analytics_queries import (
    _FS_T_HI,
    _FS_T_LO,
    _fs_pairs,
    q_fellegi_sunter_match_weights,
)

SF_DIR = "/root/testdata/sf0.001"
FIELDS = ("name", "nation", "segment", "balband")


@pytest.fixture(scope="module")
def fs(spark):
    weights = {
        r["field"]: r.asDict()
        for r in q_fellegi_sunter_match_weights(spark, SF_DIR).collect()
    }
    pairs = [r.asDict() for r in _fs_pairs(spark, SF_DIR).collect()]
    return weights, pairs


def _score(weights, pair):
    s = 1
    for f in FIELDS:
        w = weights[f]
        s *= (
            w["agree_odds_centi"]
            if pair[f"g_{f}"]
            else w["disagree_odds_centi"]
        )
    return s


def test_m_exceeds_u_and_odds_bracket_neutral(fs):
    weights, _ = fs
    assert set(weights) == set(FIELDS)
    for f, w in weights.items():
        assert w["m_ppm"] > w["u_ppm"], f
        assert w["agree_odds_centi"] > 100, f  # agreement = evidence for
        assert w["disagree_odds_centi"] < 100, f  # disagreement = against


def test_python_recompute_of_m_u(fs):
    weights, pairs = fs
    n_match = sum(p["is_match"] for p in pairs)
    n_non = len(pairs) - n_match
    assert n_match > 0 and n_non > 0
    for f in FIELDS:
        am = sum(p[f"g_{f}"] for p in pairs if p["is_match"])
        au = sum(p[f"g_{f}"] for p in pairs if not p["is_match"])
        assert weights[f]["m_ppm"] == am * 1_000_000 // n_match
        assert weights[f]["u_ppm"] == au * 1_000_000 // n_non
        assert weights[f]["n_pairs"] == len(pairs)
        assert weights[f]["n_anchor_matches"] == n_match


def test_band_monotonicity_single_field_flip(fs):
    """Flipping any one field from disagree to agree must strictly
    raise the product score (agree odds > disagree odds per field) —
    the banding order can never invert on more agreement."""
    weights, _ = fs
    base = {f"g_{f}": 0 for f in FIELDS}
    s0 = _score(weights, base)
    for f in FIELDS:
        flipped = dict(base, **{f"g_{f}": 1})
        assert _score(weights, flipped) > s0, f


def test_anchor_matches_concentrate_in_match_band(fs):
    weights, pairs = fs

    def band(p):
        s = _score(weights, p)
        if s >= _FS_T_HI:
            return "match"
        if s <= _FS_T_LO:
            return "non_match"
        return "possible"

    match_bands = [band(p) for p in pairs if p["is_match"]]
    non_bands = [band(p) for p in pairs if not p["is_match"]]
    # anchor matches never fall to non_match; the doubly-corrupted
    # copies (two of three non-name fields flipped by the modulus
    # plan) legitimately land in "possible" — the clerical-review
    # band doing its job — but the majority are clean matches
    assert match_bands and all(b != "non_match" for b in match_bands)
    frac_match = sum(b == "match" for b in match_bands) / len(match_bands)
    assert frac_match >= 0.6
    # non-matches essentially never reach the match band
    leak = sum(b == "match" for b in non_bands) / len(non_bands)
    assert leak < 0.01
