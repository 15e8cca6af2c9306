"""ML workload queries (SURVEY.md §2.11) on the oracle corpus.

Model outputs are not SQL-expressible → no oracle entry (the driver
records rows-only checks). Determinism: fixed seeds, fixed splits,
metrics rounded — schema and row counts are stable across runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.catalog import load_table


def _lineitem_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature frame: predict l_extendedprice from quantity/discount/tax
    + part attributes (broadcast dim join)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_brand", "p_type"
    )
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_quantity",
        "l_discount",
        "l_tax",
        "p_retailprice",
        "p_brand",
        "p_type",
        F.col("l_extendedprice").alias("label"),
    )


def _metrics_row(spark: SparkSession, kind: str, metrics: dict[str, float]) -> DataFrame:
    ordered = sorted(metrics.items())
    return spark.createDataFrame(
        [(kind, *[round(v, 4) for _, v in ordered])],
        ["model"] + [k for k, _ in ordered],
    )


@query("ml_random_forest_metrics", tags=("L5", "L7", "rf-headline"))
def ml_random_forest_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.regressors import train_and_evaluate

    df = _lineitem_features(spark, sf_dir)
    _, metrics = train_and_evaluate(
        df,
        kind="random_forest",
        label_col="label",
        categorical=["p_brand", "p_type"],
        numeric=["l_quantity", "l_discount", "l_tax", "p_retailprice"],
        numTrees=20,
        maxDepth=8,
    )
    return _metrics_row(spark, "random_forest", metrics)


@query("ml_ols_metrics", tags=("L2", "L7"))
def ml_ols_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.regressors import train_and_evaluate

    df = _lineitem_features(spark, sf_dir)
    _, metrics = train_and_evaluate(
        df,
        kind="ols",
        label_col="label",
        categorical=["p_brand", "p_type"],
        numeric=["l_quantity", "l_discount", "l_tax", "p_retailprice"],
    )
    return _metrics_row(spark, "ols", metrics)


@query("ml_rf_forecast_rollup", tags=("L4", "J5", "A2", "A3", "pipeline"))
def ml_rf_forecast_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end analogue of the reference's county forecast: train RF,
    score every row, roll predictions up per part brand with a support
    threshold (03_LinearRegression.R:133-145 shape)."""
    from ..ml.features import build_feature_pipeline
    from ..ml.regressors import make_regressor
    from ..operators.rollup import threshold_rollup
    from pyspark.ml import Pipeline

    df = _lineitem_features(spark, sf_dir)
    fp = build_feature_pipeline(
        ["p_type"], ["l_quantity", "l_discount", "l_tax", "p_retailprice"],
        one_hot=False,
    )
    rf = make_regressor("random_forest", numTrees=20, maxDepth=6)
    fitted = Pipeline(stages=[fp, rf]).fit(df)
    scored = fitted.transform(df)
    rolled = threshold_rollup(
        scored, ["p_brand"], "prediction", min_count=100, avg_alias="forecast"
    )
    return rolled.select(
        "p_brand", F.round("forecast", 2).alias("forecast"), "n_obs"
    ).orderBy("p_brand")
