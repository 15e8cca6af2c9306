"""Regression metrics (SURVEY.md §2.4 A11, §2.11 L7).

RMSE and R² via RegressionEvaluator (distributed); adjusted R² is the
driver-side closed form the reference uses
(05_OutcomeAndVisualization.R:49-59): 1 - (1-R²)(n-1)/(n-k-1).
"""

from __future__ import annotations

from pyspark.ml.evaluation import RegressionEvaluator
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
    ev = RegressionEvaluator(labelCol=label_col, predictionCol=prediction_col)
    rmse = ev.setMetricName("rmse").evaluate(predictions)
    r2 = ev.setMetricName("r2").evaluate(predictions)
    out = {"rmse": rmse, "r2": r2}
    if n_features is not None:
        n = predictions.count()
        out["adj_r2"] = adjusted_r2(r2, n, n_features)
        out["n"] = float(n)
    return out
