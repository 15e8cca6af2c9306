"""L6 at reference scale: the 324-combination x 2-fold hyperparameter
search of 04_1_XGB_traintest.R:145-152, re-expressed on MLlib GBT (the
xgbTree analogue) over the 10% seeded subsample of the sf0.1 feature
frame — CrossValidator's folds x grid parallelism replacing the
reference's PSOCK worker pool (04_1:129-131).

Param mapping (xgboost -> MLlib GBTRegressor):
  nrounds=100       -> maxIter (time-boxed to 25: 648 sequential-boosting
                       fits at 100 rounds is hours of pure tree passes;
                       the parallelism measurement is invariant to it)
  max_depth         -> maxDepth          {4, 6, 8}
  colsample_bytree  -> featureSubsetStrategy {'0.1','0.3','0.5'}
  eta               -> stepSize          {0.05, 0.1, 0.5}
  min_child_weight  -> minInstancesPerNode {1, 5, 20}
  subsample         -> subsamplingRate   {0.1, 0.4, 0.7, 1.0}
  gamma=0.5         -> (no analogue; minInfoGain left default)

Prints one JSON line per measurement; SCALE.md records the results.
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.ml import Pipeline
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.regression import GBTRegressor
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

from mbfbigdatarandomforest_spark.ml.features import build_feature_pipeline
from mbfbigdatarandomforest_spark.plans.ml_queries import _lineitem_features
from mbfbigdatarandomforest_spark.session import get_spark


def build_cv(pipe, reg, grid, parallelism):
    gb = ParamGridBuilder()
    for pname, values in grid.items():
        gb = gb.addGrid(reg.getParam(pname), values)
    return CrossValidator(
        estimator=pipe,
        estimatorParamMaps=gb.build(),
        evaluator=RegressionEvaluator(labelCol="label", metricName="rmse"),
        numFolds=2,
        parallelism=parallelism,
        seed=123,
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="cv-grid-reference-scale")
    spark.sparkContext.setLogLevel("ERROR")
    df = _lineitem_features(spark, sf_dir)
    sample = (
        df.na.drop()
        .sample(fraction=0.10, seed=123)  # 04_1:120-125, n = 0.10
        .repartition(32)
        .cache()
    )
    n = sample.count()

    fp = build_feature_pipeline(
        ["p_brand", "p_type"],
        ["l_quantity", "l_discount", "l_tax", "p_retailprice"],
        one_hot=False,
    )

    def reg():
        return GBTRegressor(labelCol="label", seed=123, maxIter=25)

    full_grid = {
        "maxDepth": [4, 6, 8],
        "featureSubsetStrategy": ["0.1", "0.3", "0.5"],
        "stepSize": [0.05, 0.1, 0.5],
        "minInstancesPerNode": [1, 5, 20],
        "subsamplingRate": [0.1, 0.4, 0.7, 1.0],
    }
    # speedup probe: one slice of the grid, sequential vs parallel
    sub_grid = {
        "maxDepth": [4, 6, 8],
        "stepSize": [0.05, 0.1, 0.5],
        "subsamplingRate": [0.4, 1.0],
    }

    for label, grid, par in [
        ("subgrid_seq", sub_grid, 1),
        ("subgrid_par16", sub_grid, 16),
        ("full_grid_par16", full_grid, 16),
    ]:
        r = reg()
        pipe = Pipeline(stages=[fp, r])
        n_combos = 1
        for v in grid.values():
            n_combos *= len(v)
        t0 = time.perf_counter()
        cv = build_cv(pipe, r, grid, par)
        model = cv.fit(sample)
        wall = time.perf_counter() - t0
        best = model.bestModel.stages[-1]
        print(
            json.dumps(
                {
                    "measure": label,
                    "combinations": n_combos,
                    "folds": 2,
                    "fits": n_combos * 2,
                    "parallelism": par,
                    "rows": n,
                    "wall_sec": round(wall, 1),
                    "best_rmse": round(min(model.avgMetrics), 4),
                    "best_maxDepth": best.getMaxDepth(),
                    "best_stepSize": best.getStepSize(),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
