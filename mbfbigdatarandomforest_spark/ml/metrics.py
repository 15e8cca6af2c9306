"""Regression metrics (SURVEY.md §2.4 A11, §2.11 L7).

RMSE and R² from one moment aggregation; adjusted R² is the driver-side
closed form the reference uses (05_OutcomeAndVisualization.R:49-59):
1 - (1-R²)(n-1)/(n-k-1).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame


def adjusted_r2(r2: float, n: int, k: int) -> float:
    if n - k - 1 <= 0:
        return float("nan")
    return 1.0 - (1.0 - r2) * (n - 1) / (n - k - 1)


def regression_metrics(
    predictions: DataFrame,
    *,
    label_col: str = "label",
    prediction_col: str = "prediction",
    n_features: int | None = None,
) -> dict[str, float]:
    """One distributed aggregation computes every metric. The naive
    RegressionEvaluator route costs one full scoring pass PER metric
    (plus a count) — 3+ scans of a frame whose lineage includes model
    inference; this is a single scan."""
    from pyspark.sql import functions as F

    y = F.col(label_col)
    e = y - F.col(prediction_col)
    row = predictions.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(e * e).alias("sse"),
        F.sum(y).alias("sy"),
        F.sum(y * y).alias("syy"),
    ).first()
    n = row["n"]
    sse = float(row["sse"] or 0.0)
    sst = float(row["syy"] - row["sy"] * row["sy"] / n) if n else float("nan")
    rmse = math.sqrt(sse / n) if n else float("nan")
    r2 = 1.0 - sse / sst if sst > 0 else float("nan")
    out = {"rmse": rmse, "r2": r2}
    if n_features is not None:
        out["adj_r2"] = adjusted_r2(r2, n, n_features)
        out["n"] = float(n)
    return out


def regression_metrics_tagged(
    tagged_predictions: dict[str, DataFrame],
    *,
    label_col: str = "label",
    prediction_col: str = "prediction",
    n_features: int | None = None,
) -> dict[str, float]:
    """Metrics for several scored frames in ONE Spark job.

    ``tagged_predictions`` maps a tag (e.g. ``"train"``/``"test"``) to a
    scored frame; the frames are union-tagged and reduced by a single
    grouped moment aggregation, so evaluating a model on k splits costs
    one action instead of k (each of which would re-run model inference
    scheduling). Returns ``{f"{tag}_{metric}": value}``."""
    from functools import reduce

    from pyspark.sql import functions as F

    parts = [
        df.select(
            F.lit(tag).alias("__split"),
            F.col(label_col).alias("__y"),
            F.col(prediction_col).alias("__p"),
        )
        for tag, df in tagged_predictions.items()
    ]
    y, p = F.col("__y"), F.col("__p")
    e = y - p
    rows = (
        reduce(lambda a, b: a.unionByName(b), parts)
        .groupBy("__split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(e * e).alias("sse"),
            F.sum(y).alias("sy"),
            F.sum(y * y).alias("syy"),
        )
        .collect()
    )
    out: dict[str, float] = {}
    for row in rows:
        tag, n = row["__split"], row["n"]
        sse = float(row["sse"] or 0.0)
        sst = float(row["syy"] - row["sy"] * row["sy"] / n) if n else float("nan")
        rmse = math.sqrt(sse / n) if n else float("nan")
        r2 = 1.0 - sse / sst if sst > 0 else float("nan")
        out[f"{tag}_rmse"] = rmse
        out[f"{tag}_r2"] = r2
        if n_features is not None:
            out[f"{tag}_adj_r2"] = adjusted_r2(r2, n, n_features)
            out[f"{tag}_n"] = float(n)
    return out
