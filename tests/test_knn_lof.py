"""Hand-check battery for knn_lof_scores (VERDICT r9 directive #3).

The oracle can't catch algebra both engines share, so this recomputes
LOF independently: float NumPy, textbook Breunig et al. formulas, no
integer quantization — and checks the pipeline's integer-milli scores
against it on a planted-outlier fixture.
"""

import numpy as np
import pytest

from ecom_churn_lakehouse_spark.queries.similarity_queries import (
    _LOF_EPS0,
    _LOF_K,
    _lof_pipeline,
)

#: The fixture pins the REFERENCE-density geometry: eps is passed
#: explicitly (the registered entry derives it from corpus density;
#: 41 planted points would otherwise get a huge adaptive eps and a
#: different neighborhood structure than the test reasons about).
_LOF_EPS = _LOF_EPS0


def _numpy_lof(pts, k):
    """Textbook float LOF over an explicit point array (n x 2).

    Mirrors the pipeline's DOMAIN rules (eps-certification cascade,
    row_number kNN with id tie-break) but none of its arithmetic:
    distances stay float64, lrd/LOF are float ratios.
    """
    n = len(pts)
    d = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
    eps = _LOF_EPS
    nbrs = [
        [j for j in range(n) if j != i and d[i, j] <= eps]
        for i in range(n)
    ]
    cert1 = {i for i in range(n) if len(nbrs[i]) >= k}
    kdist, knn_c = {}, {}
    for i in cert1:
        order = sorted(nbrs[i], key=lambda j: (d[i, j], j))
        kdist[i] = d[i, order[k - 1]]
        cert_nb = [j for j in order if j in cert1]
        if len(cert_nb) >= k:
            knn_c[i] = cert_nb[:k]
    lrd = {
        i: k / sum(max(kdist[o], d[i, o]) for o in knn_c[i])
        for i in knn_c
    }
    lof = {}
    for i in knn_c:
        if all(o in lrd for o in knn_c[i]):
            lof[i] = (sum(lrd[o] for o in knn_c[i]) / k) / lrd[i]
    return lof


@pytest.fixture(scope="module")
def planted(spark):
    """40-point blob (int-micro coords, ~eps/4 spread) plus one
    planted outlier sitting 0.8*eps away from the blob edge — close
    enough that its k nearest are certified blob points, far enough
    that its reachability collapses vs theirs."""
    rng = np.random.default_rng(7)
    blob = rng.integers(-_LOF_EPS // 4, _LOF_EPS // 4, size=(40, 2))
    blob = blob + 1_000_000
    outlier = np.array([[1_000_000 + _LOF_EPS // 4 + int(0.8 * _LOF_EPS), 1_000_000]])
    pts = np.vstack([blob, outlier]).astype(np.int64)
    df = spark.createDataFrame(
        [(int(i), int(x), int(y)) for i, (x, y) in enumerate(pts)],
        "vec_id LONG, qx LONG, qy LONG",
    )
    out = {
        r["vec_id"]: r.asDict()
        for r in _lof_pipeline(spark, df, _LOF_EPS).collect()
    }
    return pts, out


def test_planted_outlier_has_max_lof(planted):
    pts, out = planted
    outlier_id = len(pts) - 1
    assert outlier_id in out, "outlier must be eps-certified by design"
    top = max(out, key=lambda i: out[i]["lof_milli"])
    assert top == outlier_id
    # clear separation: outlier LOF well above every inlier's
    inlier_max = max(
        v["lof_milli"] for i, v in out.items() if i != outlier_id
    )
    assert out[outlier_id]["lof_milli"] > 1.5 * inlier_max


def test_lof_matches_independent_float_recompute(planted):
    pts, out = planted
    ref = _numpy_lof(pts.astype(float), _LOF_K)
    assert set(out) == set(ref)
    for i, v in out.items():
        # integer pipeline uses floor-isqrt micro distances and DIV
        # truncation; agreement to ~1% is the designed grain
        assert v["lof_milli"] / 1000.0 == pytest.approx(
            ref[i], rel=0.02
        ), f"point {i}"


def test_inliers_score_near_one(planted):
    pts, out = planted
    inliers = [v["lof_milli"] for i, v in out.items() if i != len(pts) - 1]
    assert inliers
    med = sorted(inliers)[len(inliers) // 2]
    assert 800 <= med <= 1300
