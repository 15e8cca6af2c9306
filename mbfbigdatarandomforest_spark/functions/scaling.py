"""Z-score scaling with captured parameters (SURVEY.md §2.8 F9, §2.4 A13).

The reference scales features and *keeps* (μ, σ) to un-scale forecasts
(03_LinearRegression.R:29-34, :127-129). The engine mirrors that: a tiny
driver-side parameter map captured from one distributed agg, then pure
column arithmetic (stays in codegen, no second pass per column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_params(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """One job computes (mean, stddev_samp) for every column at once —
    a single partial-aggregable pass over the data, O(cols) driver memory."""
    aggs = []
    for c in cols:
        aggs.append(F.avg(c).alias(f"{c}__mu"))
        aggs.append(F.stddev_samp(c).alias(f"{c}__sigma"))
    row = df.agg(*aggs).first()
    return {c: (row[f"{c}__mu"], row[f"{c}__sigma"]) for c in cols}


def zscore_apply(df: DataFrame, params: dict[str, tuple[float, float]]) -> DataFrame:
    out = df
    for c, (mu, sigma) in params.items():
        out = out.withColumn(c, (F.col(c) - F.lit(mu)) / F.lit(sigma))
    return out


def zscore_invert(df: DataFrame, col: str, mu: float, sigma: float) -> DataFrame:
    """Inverse transform on predictions (03_LinearRegression.R:127-129)."""
    return df.withColumn(col, F.col(col) * F.lit(sigma) + F.lit(mu))
