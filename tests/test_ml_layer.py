"""ML-layer tests: model persistence (S5), learning curves (L9),
CrossValidator tuning (L6), CSV sources (S1/S2), CSV sink (S4).
"""

from __future__ import annotations

import pytest
from pyspark.ml import Pipeline, PipelineModel
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from mbfbigdatarandomforest_spark.ml.features import build_feature_pipeline
from mbfbigdatarandomforest_spark.ml.regressors import (
    learning_curve,
    make_regressor,
    train_and_evaluate,
)
from mbfbigdatarandomforest_spark.sources.readers import read_csv
from mbfbigdatarandomforest_spark.sources.sinks import write_csv


@pytest.fixture(scope="module")
def toy(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    rows = [
        (
            float(x1 := rng.normal()),
            float(x2 := rng.normal()),
            str(rng.choice(["a", "b", "c"])),
            float(3 * x1 - 2 * x2 + rng.normal() * 0.1),
        )
        for _ in range(400)
    ]
    return spark.createDataFrame(rows, "x1 double, x2 double, cat string, label double")


def test_gbt_early_stopping_mechanics(spark, toy):
    """Early stopping (xgb.train early_stopping_rounds parity): the
    chosen iteration comes from validation RMSE, the stop round is
    best+patience (capped), and the refit model carries exactly
    best_iter trees."""
    from mbfbigdatarandomforest_spark.ml.regressors import (
        train_gbt_with_early_stopping,
    )

    fitted, metrics, stop = train_gbt_with_early_stopping(
        toy,
        label_col="label",
        categorical=["cat"],
        numeric=["x1", "x2"],
        max_iter=15,
        patience=3,
        maxDepth=3,
    )
    assert 1 <= stop["best_iter"] <= stop["max_iter"] == 15
    assert stop["stopped_iter"] == min(stop["best_iter"] + 3, 15)
    gbt = fitted.stages[-1]
    assert gbt.getNumTrees == stop["best_iter"]
    assert metrics["test_rmse"] > 0


def test_gbt_truncation_equals_refit(spark, toy):
    """The truncation that replaced the early-stopping refit must be
    EXACT: slicing the max_iter probe's first n trees produces the same
    predictions as an actual maxIter=n fit on the same data/seed
    (boosting is sequential; per-iteration seeding is maxIter-free —
    an UNDOCUMENTED MLlib invariant, which is exactly why this test
    exists: a Spark upgrade that changes iteration seeding fails HERE,
    loudly, instead of shipping a silently-different model. On a new
    Spark minor: if this test still passes, append the version to
    TRUNCATION_REFIT_EQUIV_VALIDATED; if it fails, the refit-equivalence
    claim is demoted (truncation itself stays correct xgboost
    best_ntree_limit semantics)."""
    import pyspark

    from mbfbigdatarandomforest_spark.ml.regressors import (
        TRUNCATION_REFIT_EQUIV_VALIDATED,
        _truncate_gbt_model,
    )

    fp = build_feature_pipeline(["cat"], ["x1", "x2"], one_hot=False)
    feat = fp.fit(toy).transform(toy).select("features", "label").cache()
    full = make_regressor("gbt", maxIter=12, maxDepth=3, seed=7).fit(feat)
    for n in (1, 5, 12):
        refit = make_regressor("gbt", maxIter=n, maxDepth=3, seed=7).fit(feat)
        trunc = _truncate_gbt_model(full, n)
        assert trunc.getNumTrees == n
        a = [r["prediction"] for r in refit.transform(feat).collect()]
        b = [r["prediction"] for r in trunc.transform(feat).collect()]
        assert a == b
    feat.unpersist()
    # Membership check LAST, so a new Spark minor runs the equivalence
    # evidence above first. If everything above passed on an unlisted
    # minor, the PROPERTY holds — warn (don't fail: ADVICE r7 — a
    # guaranteed red suite on every upgrade is a false positive) and
    # direct the maintainer to append the verified version.
    minor = ".".join(pyspark.__version__.split(".")[:2])
    if minor not in TRUNCATION_REFIT_EQUIV_VALIDATED:
        import warnings

        warnings.warn(
            f"Spark {minor}: truncation≡refit just VERIFIED above — append "
            f"'{minor}' to TRUNCATION_REFIT_EQUIV_VALIDATED to record it",
            stacklevel=1,
        )


def test_pipeline_model_save_load_roundtrip(spark, toy, tmp_path):
    """S5 — the reference persists models across scripts
    (04_1_XGB_traintest.R:402,409-410); MLWritable round-trip must
    reproduce predictions exactly."""
    fp = build_feature_pipeline(["cat"], ["x1", "x2"], one_hot=False)
    rf = make_regressor("random_forest", numTrees=5, maxDepth=3)
    model = Pipeline(stages=[fp, rf]).fit(toy)
    path = str(tmp_path / "rf_model")
    model.write().overwrite().save(path)
    reloaded = PipelineModel.load(path)
    a = model.transform(toy).select("prediction").collect()
    b = reloaded.transform(toy).select("prediction").collect()
    assert [r["prediction"] for r in a] == [r["prediction"] for r in b]


def test_learning_curve_gbt_decreasing(spark, toy):
    """L9 — GBT training loss must be (weakly) decreasing; curve has one
    row per iteration per split."""
    fp = build_feature_pipeline(["cat"], ["x1", "x2"], one_hot=False)
    gbt = make_regressor("gbt", maxIter=10, maxDepth=3)
    train, test = toy.randomSplit([0.8, 0.2], seed=1)
    model = Pipeline(stages=[fp, gbt]).fit(train)
    curve = learning_curve(model.stages and model, train, test).collect()
    tr = sorted(
        [(r["iteration"], r["loss"]) for r in curve if r["split"] == "train"]
    )
    te = [r for r in curve if r["split"] == "test"]
    assert len(tr) == 10 and len(te) == 10
    assert tr[-1][1] <= tr[0][1]


def test_learning_curve_rejects_rf(spark, toy):
    fp = build_feature_pipeline(["cat"], ["x1", "x2"], one_hot=False)
    rf = make_regressor("random_forest", numTrees=3, maxDepth=3)
    model = Pipeline(stages=[fp, rf]).fit(toy)
    with pytest.raises(ValueError, match="gbt"):
        learning_curve(model, toy)


def test_cv_fit_param_grid_passthrough(spark, toy):
    """The param_grid= passthrough (reference searches 324/1296 combos,
    04_1:145-152) must drive the CrossValidator grid: the selected
    model's params come from the supplied value lists."""
    from pyspark.ml import Pipeline

    from mbfbigdatarandomforest_spark.plans.election import _cv_fit

    fp = build_feature_pipeline(["cat"], ["x1", "x2"], one_hot=False)
    rf = make_regressor("random_forest", label_col="DemRepRatio")
    data = toy.withColumnRenamed("label", "DemRepRatio")
    pipe = Pipeline(stages=[fp, rf])
    best = _cv_fit(
        pipe,
        rf,
        data,
        "random_forest",
        seed=7,
        param_grid={"maxDepth": [2, 3], "numTrees": [4, 6]},
    )
    chosen = best.stages[-1]
    assert chosen.getMaxDepth() in (2, 3)
    assert chosen.getNumTrees in (4, 6)


def test_crossvalidator_tuning_selects_params(spark, toy):
    """L6 — CV grid search (04_1_XGB_traintest.R:129-167 analogue):
    folds×grid run under Spark's parallelism; best model beats a
    deliberately-bad fixed model."""
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    fp = build_feature_pipeline(["cat"], ["x1", "x2"], one_hot=False)
    rf = make_regressor("random_forest")
    pipe = Pipeline(stages=[fp, rf])
    grid = (
        ParamGridBuilder()
        .addGrid(rf.maxDepth, [1, 6])
        .addGrid(rf.numTrees, [3, 15])
        .build()
    )
    ev = RegressionEvaluator(labelCol="label", metricName="rmse")
    cv = CrossValidator(
        estimator=pipe,
        estimatorParamMaps=grid,
        evaluator=ev,
        numFolds=2,
        parallelism=4,
        seed=7,
    )
    cvm = cv.fit(toy)
    best = cvm.bestModel.stages[-1]
    assert best.getMaxDepth() == 6  # depth-1 stumps can't fit a 2-var linear target
    assert len(cvm.avgMetrics) == 4 and all(m > 0 for m in cvm.avgMetrics)


def test_csv_reader_schema_and_nulls(spark, tmp_path):
    """S1/S2/P9 — imposed schema, '' → NULL at scan, malformed rows
    dropped (the reference's 3M-row cap workaround)."""
    p = tmp_path / "in.csv"
    p.write_text("a,b,c\n1,x,2.5\n2,,3.5\nnotanint,y,oops\n4,z,\n")
    schema = StructType(
        [
            StructField("a", DoubleType()),
            StructField("b", StringType()),
            StructField("c", DoubleType()),
        ]
    )
    df = read_csv(spark, str(p), schema)
    rows = {r["a"]: (r["b"], r["c"]) for r in df.collect()}
    assert rows[1.0] == ("x", 2.5)
    assert rows[2.0] == (None, 3.5)  # '' → NULL
    assert rows[4.0] == ("z", None)
    assert "notanint" not in [r["b"] for r in df.collect()]


def test_csv_reader_requires_schema(spark, tmp_path):
    p = tmp_path / "in2.csv"
    p.write_text("a\n1\n")
    with pytest.raises(ValueError, match="explicit schema"):
        read_csv(spark, str(p))


def test_csv_sink_roundtrip(spark, tmp_path, toy):
    """S4 — single-file CSV export for small result tables."""
    out = str(tmp_path / "out_csv")
    small = toy.limit(10).select("cat", "label")
    write_csv(small, out)
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 10
    assert set(back.columns) == {"cat", "label"}


def test_train_and_evaluate_metrics_shape(spark, toy):
    _, metrics = train_and_evaluate(
        toy,
        kind="random_forest",
        label_col="label",
        categorical=["cat"],
        numeric=["x1", "x2"],
        numTrees=5,
        maxDepth=4,
    )
    assert {"train_rmse", "train_r2", "test_rmse", "test_r2"} <= set(metrics)
    assert metrics["train_r2"] > 0.5


def test_rare_level_collapser_pipeline_persistence(spark, tmp_path):
    """F7 as a pipeline stage (SURVEY §7 M4): fitted rare-level lists
    must match the standalone operator and survive Pipeline save/load."""
    from mbfbigdatarandomforest_spark.ml.transformers import RareLevelCollapser
    from mbfbigdatarandomforest_spark.operators.cleaning import (
        collapse_rare_levels,
    )

    rows = [("common", "x")] * 60 + [("common2", "y")] * 35 + [
        ("rare1", "x"), ("rare2", "y"), (None, "x"),
    ]
    df = spark.createDataFrame(rows, "a string, b string")
    est = RareLevelCollapser(inputCols=["a"], threshold=0.05)
    model = est.fit(df)
    want = {
        (r["a"], r["b"]) for r in collapse_rare_levels(df, ["a"], 0.05).collect()
    }
    got = {(r["a"], r["b"]) for r in model.transform(df).collect()}
    assert got == want
    assert set(model.getRareLevels()["a"]) == {"rare1", "rare2"}

    from pyspark.ml import Pipeline, PipelineModel

    pm = Pipeline(stages=[est]).fit(df)
    path = str(tmp_path / "rare_pipe")
    pm.write().overwrite().save(path)
    reloaded = PipelineModel.load(path)
    got2 = {(r["a"], r["b"]) for r in reloaded.transform(df).collect()}
    assert got2 == want
    assert reloaded.stages[0].getRareLevels() == model.getRareLevels()


def test_ols_sufficient_stats_matches_mllib_path(spark):
    """The single-pass Gramian OLS must reproduce the MLlib pipeline's
    metrics: same na.drop, same seeded split, same least-squares
    minimum — rmse/r2/adj_r2/n agree to float tolerance even though the
    singular (dummy-trap) system admits many coefficient vectors."""
    from conftest import SF_DIR_SMALL
    from mbfbigdatarandomforest_spark.ml.ols_gram import (
        ols_sufficient_stats_metrics,
    )
    from mbfbigdatarandomforest_spark.plans.ml_queries import _lineitem_features

    df = _lineitem_features(spark, SF_DIR_SMALL)
    kw = dict(
        label_col="label",
        categorical=["p_brand", "p_type"],
        numeric=["l_quantity", "l_discount", "l_tax", "p_retailprice"],
    )
    _, mllib = train_and_evaluate(df, kind="ols", **kw)
    gram = ols_sufficient_stats_metrics(df, **kw)
    assert set(gram) == set(mllib)
    for key in mllib:
        assert gram[key] == pytest.approx(mllib[key], rel=1e-6, abs=1e-7), key


def test_ols_gram_strategies_agree(spark):
    """Both physical Gramian strategies — the JVM grouped aggregate and
    the Arrow mapInPandas fallback — must produce identical metrics,
    and the auto path must fall back (not truncate) when the observed
    group count exceeds max_groups."""
    from conftest import SF_DIR_SMALL
    from mbfbigdatarandomforest_spark.ml.ols_gram import (
        ols_sufficient_stats_metrics,
    )
    from mbfbigdatarandomforest_spark.plans.ml_queries import _lineitem_features

    df = _lineitem_features(spark, SF_DIR_SMALL)
    kw = dict(
        label_col="label",
        categorical=["p_brand", "p_type"],
        numeric=["l_quantity", "l_discount", "l_tax", "p_retailprice"],
    )
    grouped = ols_sufficient_stats_metrics(df, strategy="grouped", **kw)
    arrow = ols_sufficient_stats_metrics(df, strategy="arrow", **kw)
    fallback = ols_sufficient_stats_metrics(df, strategy="auto", max_groups=3, **kw)
    # abs floor: R² ≈ 0 amplifies summation-order noise through the
    # 1 - SSE/SST cancellation — strategies agree to ~1e-12 absolute
    # even when the relative gap on a near-zero metric exceeds 1e-9
    for key in grouped:
        assert arrow[key] == pytest.approx(grouped[key], rel=1e-9, abs=1e-9), key
        assert fallback[key] == pytest.approx(grouped[key], rel=1e-9, abs=1e-9), key


def test_dart_weight_update_math():
    """DART normalization (Vinayak & Gilad-Bachrach 2015 §3): k dropped
    trees scale by k/(k+lr), the new tree enters at lr/(k+lr); k=0 is
    plain shrinkage."""
    from mbfbigdatarandomforest_spark.ml.regressors import _dart_weight_update

    w = [1.0, 0.5, 0.25]
    assert _dart_weight_update(w, [], 0.3) == 0.3 and w == [1.0, 0.5, 0.25]
    w = [1.0, 0.5, 0.25]
    new = _dart_weight_update(w, [0, 2], 1.0)
    assert new == 1.0 / 3 and w == [2.0 / 3, 0.5, 0.25 * 2 / 3]


def test_dart_against_mllib_gbt_gradient_convention(spark, toy):
    """Cross-engine pin for the boosting core (dropout off, lr=1):
    iteration 0 trees are IDENTICAL to MLlib GBT's (both fit the raw
    label), and iteration 1 leaf values differ by EXACTLY the factor 2
    of the gradient conventions — MLlib fits -∇L = 2(y-pred), DART (the
    paper) fits the residual. Same splits, exactly-doubled leaves: the
    tree induction and the residual bookkeeping are both right."""
    from mbfbigdatarandomforest_spark.ml.regressors import train_dart

    fp = build_feature_pipeline(["cat"], ["x1", "x2"], one_hot=False)
    feat = fp.fit(toy).transform(toy).select("features", "label").cache()
    dart, w = train_dart(
        feat, max_iter=2, max_depth=3, dropout_rate=0.0, learning_rate=1.0, seed=7
    )
    gbt = make_regressor(
        "gbt", maxIter=2, maxDepth=3, stepSize=1.0, subsamplingRate=1.0, seed=7
    ).fit(feat)
    assert w == [1.0, 1.0]
    a0 = [r["__pred"] for r in dart.trees[0].transform(feat).select("__pred").collect()]
    b0 = [r["prediction"] for r in gbt.trees[0].transform(feat).select("prediction").collect()]
    assert a0 == b0
    a1 = [r["__pred"] for r in dart.trees[1].transform(feat).select("__pred").collect()]
    b1 = [r["prediction"] for r in gbt.trees[1].transform(feat).select("prediction").collect()]
    assert all(abs(2 * x - y) < 1e-12 for x, y in zip(a1, b1))
    feat.unpersist()


def test_dart_packed_model_is_exact_weighted_sum(spark, toy):
    """The returned GBTRegressionModel (JVM ensemble constructor) must
    score EXACTLY Σ wᵢ·treeᵢ(x), and train RMSE must improve over the
    single-tree baseline (boosting works)."""
    import math

    from mbfbigdatarandomforest_spark.ml.regressors import train_dart

    fp = build_feature_pipeline(["cat"], ["x1", "x2"], one_hot=False)
    feat = fp.fit(toy).transform(toy).select("features", "label").cache()
    model, w = train_dart(
        feat, max_iter=6, max_depth=3, dropout_rate=0.3, learning_rate=0.7, seed=11
    )
    preds = [r["prediction"] for r in model.transform(feat).select("prediction").collect()]
    manual = [0.0] * len(preds)
    for wi, tree in zip(w, model.trees):
        col = [r["__pred"] for r in tree.transform(feat).select("__pred").collect()]
        manual = [m + wi * c for m, c in zip(manual, col)]
    assert all(abs(p - m) < 1e-9 for p, m in zip(preds, manual))
    y = [r["label"] for r in feat.select("label").collect()]
    rmse = math.sqrt(sum((p - v) ** 2 for p, v in zip(preds, y)) / len(y))
    t0 = [r["__pred"] for r in model.trees[0].transform(feat).select("__pred").collect()]
    rmse_single = math.sqrt(sum((p - v) ** 2 for p, v in zip(t0, y)) / len(y))
    assert rmse < rmse_single
    # MLWritable for free: the packed ensemble is a stock GBT model
    assert model.getNumTrees == 6 and list(model.treeWeights) == w
    feat.unpersist()


def test_dart_dropout_limits_and_determinism(spark, toy):
    """dropout_rate=1 is the paper's random-forest limit: every
    iteration drops ALL prior trees, so each tree refits the raw label
    — with a deterministic fit they come out identical. Same seed →
    identical model; dropout on vs off → different ensembles."""
    from mbfbigdatarandomforest_spark.ml.regressors import train_dart

    fp = build_feature_pipeline(["cat"], ["x1", "x2"], one_hot=False)
    feat = fp.fit(toy).transform(toy).select("features", "label").cache()
    m1, w1 = train_dart(
        feat, max_iter=4, max_depth=3, dropout_rate=1.0, learning_rate=1.0, seed=3
    )
    p0 = [r["__pred"] for r in m1.trees[0].transform(feat).select("__pred").collect()]
    for t in m1.trees[1:]:
        assert [r["__pred"] for r in t.transform(feat).select("__pred").collect()] == p0
    m2, w2 = train_dart(
        feat, max_iter=4, max_depth=3, dropout_rate=1.0, learning_rate=1.0, seed=3
    )
    assert w1 == w2
    a = [r["prediction"] for r in m1.transform(feat).select("prediction").collect()]
    b = [r["prediction"] for r in m2.transform(feat).select("prediction").collect()]
    assert a == b
    m3, _ = train_dart(
        feat, max_iter=4, max_depth=3, dropout_rate=0.0, learning_rate=1.0, seed=3
    )
    c = [r["prediction"] for r in m3.transform(feat).select("prediction").collect()]
    assert a != c
    feat.unpersist()


def test_dart_rides_the_common_regressor_interface(spark, toy):
    """kind='dart' — the reference user's booster='dart' switch — flows
    through make_regressor AND train_and_evaluate unchanged: fitted
    pipeline scores, metrics come back on both splits."""
    fitted, metrics = train_and_evaluate(
        toy,
        kind="dart",
        label_col="label",
        categorical=["cat"],
        numeric=["x1", "x2"],
        max_iter=4,
        max_depth=3,
        dropout_rate=0.2,
    )
    assert metrics["train_rmse"] > 0 and metrics["test_rmse"] > 0
    out = fitted.transform(toy)
    assert out.select("prediction").count() == 400
    assert fitted.stages[-1].getNumTrees == 4


def test_dart_learning_curve_free_integration(spark, toy):
    """Because the DART ensemble packs into a stock GBTRegressionModel,
    L9's learning_curve (evaluateEachIteration) runs on it with zero
    extra code — one loss row per boosting iteration.

    Semantics caveat (deliberate): evaluateEachIteration computes prefix
    sums with the FINAL post-dropout-rescaled weights, so for DART this
    curve is a prefix decomposition of the final ensemble — NOT the
    per-iteration watchlist trajectory the reference's evaluation_log
    records during training (04_1_XGB_traintest.R:319-326), because the
    ensemble that existed at iteration k carried pre-rescale weights.
    The two coincide exactly for dropout_rate=0 (plain boosting; pinned
    by test_learning_curve_gbt_decreasing). A caller needing the true
    training trajectory should record validation loss inside the
    train_dart loop; the docs in learning_curve state the same."""
    fitted, _ = train_and_evaluate(
        toy,
        kind="dart",
        label_col="label",
        categorical=["cat"],
        numeric=["x1", "x2"],
        max_iter=3,
        max_depth=3,
        dropout_rate=0.2,
    )
    curve = learning_curve(fitted, toy).collect()
    assert len([r for r in curve if r["split"] == "train"]) == 3
