"""ols_inference vs a pure-numpy closed-form oracle (L3: HC0, BP, VIF).
The distributed two-pass Gramian construction must reproduce the dense
single-machine math to float precision.
"""

from __future__ import annotations

import numpy as np
import pytest

from mbfbigdatarandomforest_spark.ml.inference import chi2_sf, ols_inference


@pytest.fixture(scope="module")
def xy():
    rng = np.random.default_rng(11)
    n = 800
    x1 = rng.normal(size=n)
    x2 = 0.6 * x1 + 0.8 * rng.normal(size=n)  # correlated → VIF > 1
    # heteroscedastic noise → BP should fire
    noise = rng.normal(size=n) * (0.5 + (x1 - x1.min()))
    y = 1.5 + 2.0 * x1 - 1.0 * x2 + noise
    return x1, x2, y


@pytest.fixture(scope="module")
def result(spark, xy):
    x1, x2, y = xy
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)],
        "x1 double, x2 double, y double",
    )
    return ols_inference(df, ["x1", "x2"], "y")


def _numpy_oracle(x1, x2, y):
    n = len(y)
    X = np.column_stack([np.ones(n), x1, x2])
    XtX_inv = np.linalg.inv(X.T @ X)
    beta = XtX_inv @ X.T @ y
    e = y - X @ beta
    sigma2 = (e @ e) / (n - 3)
    se_cl = np.sqrt(np.diag(sigma2 * XtX_inv))
    meat = X.T @ (X * (e**2)[:, None])
    se_hc0 = np.sqrt(np.diag(XtX_inv @ meat @ XtX_inv))
    # BP
    g = e**2
    gamma = XtX_inv @ X.T @ g
    r2_g = 1 - ((g - X @ gamma) ** 2).sum() / ((g - g.mean()) ** 2).sum()
    bp = n * r2_g
    # VIF of x1 on x2
    r = np.corrcoef(x1, x2)[0, 1]
    vif = 1.0 / (1.0 - r**2)
    return beta, se_cl, se_hc0, e, bp, vif


def test_coefficients_and_ses(result, xy):
    x1, x2, y = xy
    beta, se_cl, se_hc0, e, bp, vif = _numpy_oracle(x1, x2, y)
    got_beta = result["coefficients"]
    for i, name in enumerate(["intercept", "x1", "x2"]):
        assert got_beta[name] == pytest.approx(beta[i], rel=1e-9)
        assert result["se_classical"][name] == pytest.approx(se_cl[i], rel=1e-7)
        assert result["se_hc0"][name] == pytest.approx(se_hc0[i], rel=1e-7)


def test_r2_and_sse(result, xy):
    x1, x2, y = xy
    _, _, _, e, _, _ = _numpy_oracle(x1, x2, y)
    sse = float(e @ e)
    assert result["sse"] == pytest.approx(sse, rel=1e-9)
    sst = float(((y - y.mean()) ** 2).sum())
    assert result["r2"] == pytest.approx(1 - sse / sst, rel=1e-9)


def test_breusch_pagan_detects_heteroscedasticity(result, xy):
    x1, x2, y = xy
    *_, bp, _ = _numpy_oracle(x1, x2, y)
    assert result["breusch_pagan"]["stat"] == pytest.approx(bp, rel=1e-7)
    assert result["breusch_pagan"]["df"] == 2
    assert result["breusch_pagan"]["p_value"] < 0.01  # designed to fire


def test_vif_matches_pairwise_formula(result, xy):
    x1, x2, y = xy
    *_, vif = _numpy_oracle(x1, x2, y)
    assert result["vif"]["x1"] == pytest.approx(vif, rel=1e-9)
    assert result["vif"]["x2"] == pytest.approx(vif, rel=1e-9)
    assert result["tolerance"]["x1"] == pytest.approx(1 / vif, rel=1e-9)


def test_part_and_partial_correlations(result, xy):
    """Part (semi-partial) and partial correlations vs the direct
    residual-correlation construction: partial r(x_j, y | rest) is the
    correlation of the two residual vectors after regressing each on
    the remaining predictors; part r uses the raw y instead."""
    x1, x2, y = xy
    n = len(y)

    def resid(v, Z):
        Z = np.column_stack([np.ones(n), Z])
        return v - Z @ (np.linalg.lstsq(Z, v, rcond=None)[0])

    for target, other in (("x1", x2), ("x2", x1)):
        xv = x1 if target == "x1" else x2
        rx = resid(xv, other)
        ry = resid(y, other)
        partial_want = np.corrcoef(rx, ry)[0, 1]
        # semi-partial: corr(y, x residualized on the other predictors)
        part_want = (y - y.mean()) @ rx / (
            np.sqrt(((y - y.mean()) ** 2).sum()) * np.sqrt((rx**2).sum())
        )
        assert result["partial_corr"][target] == pytest.approx(
            partial_want, rel=1e-6
        )
        assert result["part_corr"][target] == pytest.approx(part_want, rel=1e-6)


def test_chi2_sf_known_values():
    # χ²(df=2): sf(x) = exp(-x/2)
    for x in (0.5, 2.0, 5.0, 10.0):
        assert chi2_sf(x, 2) == pytest.approx(np.exp(-x / 2), rel=1e-10)
    # χ²(df=1): sf(x) = erfc(sqrt(x/2))
    import math

    for x in (0.3, 1.0, 4.0):
        assert chi2_sf(x, 1) == pytest.approx(math.erfc(math.sqrt(x / 2)), rel=1e-10)
