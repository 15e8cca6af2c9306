"""OLS inference statistics (SURVEY.md §2.11 L3, §4.3).

The reference computes coefficient t-tests, HC0 robust standard errors
(coeftest/vcovHC), the Breusch-Pagan heteroscedasticity test (bptest)
and variance-inflation factors (ols_vif_tol) on a fitted lm
(03_LinearRegression.R:82-116). MLlib exposes none of these, so the
engine derives them in closed form:

- pass 1: Gramian of [x, y] (one distributed pass) → X'X, X'y, y'y
  → β, SSE, classical covariance;
- pass 2: Gramian of [e·x, e²] → the HC0 "meat" Σe²xx' (top-left
  block), X'e² (intercept row of the meat), Σe⁴ (corner) — everything
  Breusch-Pagan needs, in the same pass;
- driver-side k×k linear algebra (numpy) finishes the job. k is tens;
  the data never leaves the executors unaggregated.

p-values: χ² survival for BP via regularized incomplete gamma (pure
Python — scipy absent here); coefficient tests use the normal
approximation to t (n ≫ k in every real use; documented divergence).
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gammainc_upper_reg(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x) — series / continued
    fraction split at x = a+1 (Numerical Recipes construction)."""
    if x < 0 or a <= 0:
        return float("nan")
    if x == 0:
        return 1.0
    if x < a + 1:
        # lower series → P(a,x), return 1-P
        term = 1.0 / a
        total = term
        n = a
        for _ in range(500):
            n += 1
            term *= x / n
            total += term
            if abs(term) < abs(total) * 1e-15:
                break
        p = total * math.exp(-x + a * math.log(x) - math.lgamma(a))
        return 1.0 - p
    # continued fraction for Q
    tiny = 1e-300
    b = x + 1 - a
    c = 1 / tiny
    d = 1 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2
        d = an * d + b
        d = tiny if abs(d) < tiny else d
        c = b + an / c
        c = tiny if abs(c) < tiny else c
        d = 1 / d
        delta = d * c
        h *= delta
        if abs(delta - 1) < 1e-15:
            break
    return h * math.exp(-x + a * math.log(x) - math.lgamma(a))


def chi2_sf(stat: float, df: int) -> float:
    return _gammainc_upper_reg(df / 2.0, stat / 2.0)


def normal_sf(z: float) -> float:
    return 0.5 * math.erfc(z / math.sqrt(2.0))


def _gramian(df: DataFrame, cols: list[str]) -> tuple[np.ndarray, int]:
    """Σ v v' over rows for v = cols vector, plus the row count — one
    partially-aggregated pass built from sum() expressions (k(k+1)/2
    aggregates; k is tens, so this beats shipping vectors to an RDD)."""
    k = len(cols)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i in range(k):
        for j in range(i, k):
            aggs.append(
                F.sum(F.col(cols[i]) * F.col(cols[j])).alias(f"g_{i}_{j}")
            )
    row = df.agg(*aggs).first()
    G = np.zeros((k, k))
    for i in range(k):
        for j in range(i, k):
            G[i, j] = G[j, i] = row[f"g_{i}_{j}"]
    return G, row["__n"]


def ols_inference(
    df: DataFrame, feature_cols: list[str], label_col: str
) -> dict:
    """Fit OLS and derive the reference's full diagnostic block.

    Returns a dict with: coefficients, classical + HC0 standard errors,
    z-values and p-values (both SE flavors), r2/adj_r2/sse, the
    Breusch-Pagan (LM) statistic with df and p-value, and per-feature
    VIF/tolerance."""
    data = df.na.drop(subset=feature_cols + [label_col])
    names = ["intercept"] + feature_cols
    aug = data.select(
        F.lit(1.0).alias("__x0"),
        *[F.col(c).cast("double").alias(f"__x{i+1}") for i, c in enumerate(feature_cols)],
        F.col(label_col).cast("double").alias("__y"),
    )
    xcols = [f"__x{i}" for i in range(len(names))]
    G, n = _gramian(aug, xcols + ["__y"])
    k = len(names)
    XtX, Xty, yty = G[:k, :k], G[:k, k], G[k, k]
    XtX_inv = np.linalg.inv(XtX)
    beta = XtX_inv @ Xty

    sse = float(yty - 2 * beta @ Xty + beta @ XtX @ beta)
    y_mean = Xty[0] / n  # Σy via intercept row
    sst = float(yty - n * y_mean**2)
    r2 = 1.0 - sse / sst if sst > 0 else float("nan")
    adj_r2 = 1.0 - (1.0 - r2) * (n - 1) / (n - k) if n > k else float("nan")
    sigma2 = sse / (n - k)
    cov_classical = sigma2 * XtX_inv
    se_classical = np.sqrt(np.diag(cov_classical))

    # pass 2: residual-weighted Gramian
    pred = sum(
        float(beta[i]) * F.col(xcols[i]) for i in range(k)
    )
    resid = aug.select(
        *[(F.col(c) * (F.col("__y") - pred)).alias(f"__z{i}") for i, c in enumerate(xcols)],
        ((F.col("__y") - pred) * (F.col("__y") - pred)).alias("__e2"),
    )
    M, _ = _gramian(resid, [f"__z{i}" for i in range(k)] + ["__e2"])
    meat = M[:k, :k]
    cov_hc0 = XtX_inv @ meat @ XtX_inv
    se_hc0 = np.sqrt(np.diag(cov_hc0))

    # Breusch-Pagan: LM = n * R² of e² on X. Since x0 ≡ 1, X'(e²) is the
    # intercept row of the meat and Σe² its corner; Σe⁴ sits at M[k,k].
    Xtg = meat[0, :].copy()
    g_sum = meat[0, 0]
    gtg = M[k, k]
    gamma = XtX_inv @ Xtg
    g_mean = g_sum / n
    ss_res_g = float(gtg - 2 * gamma @ Xtg + gamma @ XtX @ gamma)
    ss_tot_g = float(gtg - n * g_mean**2)
    r2_g = 1.0 - ss_res_g / ss_tot_g if ss_tot_g > 0 else 0.0
    bp_stat = n * r2_g
    bp_df = k - 1
    bp_p = chi2_sf(bp_stat, bp_df)

    # VIF from the feature correlation matrix (derivable from XtX + n)
    vif = {}
    if k > 2:
        sums = XtX[0, 1:]  # Σ x_j (intercept row)
        means = sums / n
        cov_feat = XtX[1:, 1:] / n - np.outer(means, means)
        sd = np.sqrt(np.diag(cov_feat))
        with np.errstate(divide="ignore", invalid="ignore"):
            corr = cov_feat / np.outer(sd, sd)
        corr_inv = np.linalg.inv(corr)
        for j, c in enumerate(feature_cols):
            vif[c] = float(corr_inv[j, j])
    elif k == 2:
        vif[feature_cols[0]] = 1.0

    z_cl = beta / se_classical
    z_hc0 = beta / se_hc0

    # L3 tail — part (semi-partial) and partial correlations per
    # predictor (03_LinearRegression.R:116). Closed-form from the
    # classical t statistics: with df = n - k,
    #   partial r   = t / sqrt(t² + df)
    #   part r      = t · sqrt(1 - R²) / sqrt(df)
    # — no additional distributed pass needed.
    df_resid = n - k
    part_corr, partial_corr = {}, {}
    if df_resid > 0:
        for j, c in enumerate(feature_cols, start=1):
            t = float(z_cl[j])
            partial_corr[c] = t / math.sqrt(t * t + df_resid)
            part_corr[c] = t * math.sqrt(max(1.0 - r2, 0.0)) / math.sqrt(df_resid)

    return {
        "n": int(n),
        "coefficients": dict(zip(names, map(float, beta))),
        "se_classical": dict(zip(names, map(float, se_classical))),
        "se_hc0": dict(zip(names, map(float, se_hc0))),
        "z_classical": dict(zip(names, map(float, z_cl))),
        "p_classical": {nm: 2 * normal_sf(abs(z)) for nm, z in zip(names, z_cl)},
        "z_hc0": dict(zip(names, map(float, z_hc0))),
        "p_hc0": {nm: 2 * normal_sf(abs(z)) for nm, z in zip(names, z_hc0)},
        "r2": r2,
        "adj_r2": adj_r2,
        "sse": sse,
        "breusch_pagan": {"stat": float(bp_stat), "df": bp_df, "p_value": float(bp_p)},
        "vif": vif,
        "tolerance": {c: 1.0 / v for c, v in vif.items()},
        "part_corr": part_corr,
        "partial_corr": partial_corr,
    }
