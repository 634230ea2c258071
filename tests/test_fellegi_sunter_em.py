"""EM-estimated Fellegi-Sunter parameters (VERDICT r10 directive #5).

Two independent recomputes of the registered entry:
- the SAME quantized integer EM in pure Python (unbounded ints) from
  the raw pattern counts — must match bit-for-bit, proving the
  SQL/DataFrame translation;
- a plain FLOAT EM from the same initializer — the quantized
  trajectory must track it closely, proving the per-mille likelihood
  grain and the joint scale-down division don't distort the estimate.
"""

import pytest

from ecom_churn_lakehouse_spark.queries.analytics_queries import (
    _EM_D,
    _EM_FIELDS,
    _EM_ITERS,
    _EM_M0,
    _EM_P0,
    _er_pairs,
    q_fellegi_sunter_em_params,
)

SF_DIR = "/root/testdata/sf0.001"


def _clamp(x):
    return max(min(x, 999_000), 1000)


def _int_em(patterns):
    """patterns: list of (g-tuple, n). Mirrors the registered integer
    EM exactly (floor division everywhere, same clamp, same D)."""
    N = sum(n for _, n in patterns)
    p = _EM_P0
    m = {f: _EM_M0 for f in _EM_FIELDS}
    u = {
        f: _clamp(
            sum(n * g[i] for g, n in patterns) * 1_000_000 // max(N, 1)
        )
        for i, f in enumerate(_EM_FIELDS)
    }
    for _ in range(_EM_ITERS):
        sw = sn = su = 0
        num_m = {f: 0 for f in _EM_FIELDS}
        num_u = {f: 0 for f in _EM_FIELDS}
        for g, n in patterns:
            num = p
            den = 1_000_000 - p
            for i, f in enumerate(_EM_FIELDS):
                num *= (m[f] if g[i] else 1_000_000 - m[f]) // 1000
                den *= (u[f] if g[i] else 1_000_000 - u[f]) // 1000
            dd = (num + den) // _EM_D + 1
            w = (num // dd) * 1_000_000 // max((num + den) // dd, 1)
            sw += n * w
            sn += n
            su += n * (1_000_000 - w)
            for i, f in enumerate(_EM_FIELDS):
                num_m[f] += n * w * g[i]
                num_u[f] += n * (1_000_000 - w) * g[i]
        p = _clamp(sw // max(sn, 1))
        d2 = sw // _EM_D + 1
        d3 = su // _EM_D + 1
        m = {
            f: _clamp(
                (num_m[f] // d2) * 1_000_000 // max(sw // d2, 1)
            )
            for f in _EM_FIELDS
        }
        u = {
            f: _clamp(
                (num_u[f] // d3) * 1_000_000 // max(su // d3, 1)
            )
            for f in _EM_FIELDS
        }
    return p, m, u


def _float_em(patterns):
    N = sum(n for _, n in patterns)
    p = _EM_P0 / 1e6
    m = {f: _EM_M0 / 1e6 for f in _EM_FIELDS}
    u = {
        f: min(
            max(
                sum(n * g[i] for g, n in patterns) / N, 0.001
            ),
            0.999,
        )
        for i, f in enumerate(_EM_FIELDS)
    }
    for _ in range(_EM_ITERS):
        sw = su = 0.0
        num_m = {f: 0.0 for f in _EM_FIELDS}
        num_u = {f: 0.0 for f in _EM_FIELDS}
        for g, n in patterns:
            num, den = p, 1 - p
            for i, f in enumerate(_EM_FIELDS):
                num *= m[f] if g[i] else 1 - m[f]
                den *= u[f] if g[i] else 1 - u[f]
            w = num / (num + den)
            sw += n * w
            su += n * (1 - w)
            for i, f in enumerate(_EM_FIELDS):
                num_m[f] += n * w * g[i]
                num_u[f] += n * (1 - w) * g[i]
        p = min(max(sw / N, 0.001), 0.999)
        m = {
            f: min(max(num_m[f] / sw, 0.001), 0.999) for f in _EM_FIELDS
        }
        u = {
            f: min(max(num_u[f] / su, 0.001), 0.999) for f in _EM_FIELDS
        }
    return p, m, u


@pytest.fixture(scope="module")
def em(spark):
    got = {
        r["field"]: r.asDict()
        for r in q_fellegi_sunter_em_params(spark, SF_DIR).collect()
    }
    from collections import Counter

    counts = Counter(
        (r["g_name"], r["g_nation"], r["g_segment"], r["g_balband"])
        for r in _er_pairs(spark, SF_DIR).collect()
    )
    patterns = sorted(counts.items())
    return got, patterns


def test_integer_em_recompute_matches_exactly(em):
    got, patterns = em
    p, m, u = _int_em(patterns)
    assert set(got) == set(_EM_FIELDS)
    for f in _EM_FIELDS:
        assert got[f]["m_ppm"] == m[f], f
        assert got[f]["u_ppm"] == u[f], f
        assert got[f]["p_ppm"] == p, f


def test_quantized_em_tracks_float_em(em):
    """The per-mille likelihood grain + joint scale-down must not
    distort the trajectory: every parameter within 1% absolute of the
    float EM after the same number of iterations."""
    got, patterns = em
    pf, mf, uf = _float_em(patterns)
    assert abs(got[_EM_FIELDS[0]]["p_ppm"] / 1e6 - pf) < 0.01
    for f in _EM_FIELDS:
        assert abs(got[f]["m_ppm"] / 1e6 - mf[f]) < 0.01, f
        assert abs(got[f]["u_ppm"] / 1e6 - uf[f]) < 0.01, f


def test_em_separates_match_class_unsupervised(em):
    """Without any anchor label the latent match class must still pin
    m above u on every field, and the prior must move DOWN from the
    10% initializer toward the true (sub-1%) duplicate rate."""
    got, _ = em
    for f in _EM_FIELDS:
        assert got[f]["m_ppm"] > got[f]["u_ppm"], f
    p = got[_EM_FIELDS[0]]["p_ppm"]
    assert 1000 <= p < _EM_P0 // 2
