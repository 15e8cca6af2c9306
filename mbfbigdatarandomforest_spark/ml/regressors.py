"""Regressor family behind one interface (SURVEY.md §2.11 L2/L5, §7 M6).

- ``random_forest`` : MLlib RandomForestRegressor — the north-star
  headline (the model the reference repo is *named* for but never calls;
  randomForest loaded-unused at 04_1_XGB_traintest.R:33).
- ``gbt``           : MLlib GBTRegressor — closest pure-MLlib analogue
  of the reference's xgb.train (04_1_XGB_traintest.R:282-289);
  ``train_gbt_with_early_stopping`` adds the early_stopping_rounds /
  watchlist semantics, ``train_dart`` (below) the 'dart' booster's
  tree dropout (04_1_XGB_traintest.R:249-257) — both from-scratch on
  MLlib primitives since xgboost is environment-blocked.
- ``xgboost``       : SparkXGBRegressor when the optional dep exists
  (tree_method='hist' + early stopping parity); import-gated.
- ``ols``           : LinearRegression with the normal-equation solver —
  replaces the reference's gpuLm (03_LinearRegression.R:73-78) with a
  distributed least-squares solve.
"""

from __future__ import annotations

from pyspark.ml import Estimator, Pipeline, PipelineModel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .features import build_feature_pipeline
from .metrics import regression_metrics_tagged


def make_regressor(
    kind: str,
    *,
    label_col: str = "label",
    features_col: str = "features",
    seed: int = 123,
    **params,
):
    if kind == "random_forest":
        from pyspark.ml.regression import RandomForestRegressor

        defaults = dict(numTrees=50, maxDepth=8, subsamplingRate=0.8, maxBins=64)
        defaults.update(params)
        return RandomForestRegressor(
            labelCol=label_col, featuresCol=features_col, seed=seed, **defaults
        )
    if kind == "gbt":
        from pyspark.ml.regression import GBTRegressor

        defaults = dict(maxIter=50, maxDepth=6, stepSize=0.1, subsamplingRate=0.8)
        defaults.update(params)
        return GBTRegressor(
            labelCol=label_col, featuresCol=features_col, seed=seed, **defaults
        )
    if kind == "xgboost":
        try:
            from xgboost.spark import SparkXGBRegressor  # optional dep
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "xgboost.spark not available in this environment; "
                "use kind='gbt' or kind='random_forest'"
            ) from e
        defaults = dict(tree_method="hist", n_estimators=200)
        defaults.update(params)
        return SparkXGBRegressor(
            label_col=label_col, features_col=features_col, **defaults
        )
    if kind == "ols":
        from pyspark.ml.regression import LinearRegression

        defaults = dict(regParam=0.0, solver="normal")
        defaults.update(params)
        return LinearRegression(
            labelCol=label_col, featuresCol=features_col, **defaults
        )
    if kind == "dart":
        # the reference's booster='dart' switch (04_1_XGB_traintest.
        # R:249) — from-scratch dropout boosting, see train_dart
        defaults = dict(max_iter=20, max_depth=5, dropout_rate=0.1)
        defaults.update(params)
        return DartRegressor(
            label_col=label_col, features_col=features_col, seed=seed, **defaults
        )
    raise ValueError(f"unknown regressor kind {kind!r}")


def learning_curve(
    fitted_pipeline,
    train: DataFrame,
    test: DataFrame | None = None,
    *,
    label_col: str = "label",
    loss: str = "squared",
) -> DataFrame:
    """L9 — per-iteration loss curve (evaluation_log analogue,
    04_1_XGB_traintest.R:319-326). Works for iterative models (GBT)
    via ``evaluateEachIteration``; RandomForest has no iteration axis.
    Returns a long frame (iteration, split, loss) ready for A5 unpivot
    consumers.

    DART caveat: on a packed DART ensemble the prefix sums use the FINAL
    post-dropout-rescaled tree weights, so the curve is a prefix
    decomposition of the final model, not the watchlist trajectory seen
    during training (identical only at dropout_rate=0). Record
    validation loss inside ``train_dart`` if the training-time
    trajectory is needed."""
    *feature_stages, model = fitted_pipeline.stages
    if not hasattr(model, "evaluateEachIteration"):
        raise ValueError(
            f"{type(model).__name__} has no per-iteration evaluation; "
            "use kind='gbt'"
        )

    def featurize(df: DataFrame) -> DataFrame:
        out = df
        for st in feature_stages:
            out = st.transform(out)
        return out

    spark = train.sparkSession
    rows = []
    for split_name, df in (("train", train), ("test", test)):
        if df is None:
            continue
        losses = model.evaluateEachIteration(featurize(df), loss)
        rows += [
            (i + 1, split_name, float(l)) for i, l in enumerate(losses)
        ]
    return spark.createDataFrame(rows, ["iteration", "split", "loss"])


#: Spark minor versions on which ``test_gbt_truncation_equals_refit``
#: has validated that truncating the probe ensemble is bit-identical to
#: a ``maxIter=best_iter`` refit (the stronger claim — it depends on the
#: undocumented MLlib invariant that per-iteration tree seeds don't vary
#: with ``maxIter``). The truncation itself is maxIter-free xgboost
#: semantics and safe on ANY version; this set only scopes the
#: refit-equivalence claim in docs/tests.
TRUNCATION_REFIT_EQUIV_VALIDATED = ("4.1",)


def _truncate_gbt_model(gbt_full, n_trees: int):
    """Early-stopped GBT by ensemble truncation — no second fit.

    Semantics first: keeping the first ``best_iter`` trees of the
    ``max_iter`` probe is exactly what xgboost's ``best_ntree_limit`` /
    ``iteration_range`` does after early stopping — truncation IS the
    reference behavior being reproduced, independent of any refit.
    Built by slicing the trained ensemble through the JVM constructor
    (Scala ``private[ml]`` compiles to a public constructor): an
    O(trees) driver-side array copy instead of a second sequential pass
    of ``best_iter`` distributed tree fits.

    The STRONGER property — that the truncated model is also
    bit-identical to a ``maxIter=n_trees`` refit — additionally relies
    on MLlib seeding each boosting iteration independently of
    ``maxIter``, which is undocumented.
    ``test_gbt_truncation_equals_refit`` pins that equivalence on every
    Spark version the suite runs against (validated so far:
    ``TRUNCATION_REFIT_EQUIV_VALIDATED``); a Spark upgrade that changes
    iteration seeding fails that test loudly rather than shipping a
    silently-different model, and would demote the docs' claim — not
    the early-stopping semantics, which remain correct truncation."""
    from pyspark import SparkContext
    from pyspark.ml.regression import GBTRegressionModel

    sc = SparkContext._active_spark_context
    gw = sc._gateway
    jm = gbt_full._java_obj
    full_trees, full_weights = jm.trees(), jm.treeWeights()
    tree_cls = sc._jvm.org.apache.spark.ml.regression.DecisionTreeRegressionModel
    j_trees = gw.new_array(tree_cls, n_trees)
    j_weights = gw.new_array(gw.jvm.double, n_trees)
    for i in range(n_trees):
        j_trees[i] = full_trees[i]
        j_weights[i] = full_weights[i]
    new_jm = sc._jvm.org.apache.spark.ml.regression.GBTRegressionModel(
        jm.uid(), j_trees, j_weights, jm.numFeatures()
    )
    return GBTRegressionModel(new_jm)


def _fit_layout(feat_df: DataFrame, parts: int) -> DataFrame:
    """Rows-sized partition layout for sequential boosting fits.

    ``repartition``, not ``coalesce``: coalesce can only REDUCE the
    partition count — after the upstream widen to defaultParallelism a
    coalesce would cap fit partitions at min(defaultParallelism,
    rows-target), so at cluster scale the layout would stop being
    rows-proportional exactly when it matters. Coalesce also propagates
    upstream into the transform lineage, throttling the featurize pass
    itself to the fit layout. The round-robin exchange of the slim
    (features, label) projection is one cheap shuffle paid once before
    the many sequential tree passes it serves.
    """
    return feat_df.repartition(parts)


class TreeFeaturePrep:
    """Output of :func:`prep_tree_features` — the featurized splits plus
    a single handle to release every cache the prologue pinned."""

    def __init__(self, fp_model, feat_train, feat_val, feat_test, n_rows, caches):
        self.fp_model = fp_model
        self.feat_train = feat_train
        self.feat_val = feat_val
        self.feat_test = feat_test
        self.n_rows = n_rows
        self._caches = caches

    def unpersist(self) -> None:
        for c in self._caches:
            c.unpersist()


def prep_tree_features(
    df: DataFrame,
    *,
    label_col: str,
    categorical: list[str],
    numeric: list[str],
    train_fraction: float,
    val_fraction: float = 0.0,
    seed: int = 123,
    split: str = "hash",
    rows_per_fit_partition: int = 65536,
) -> TreeFeaturePrep:
    """Shared prologue of the boosting-family trainers (GBT early-stop,
    DART): na.drop → widen to cluster parallelism → cache → deterministic
    hash split → feature-pipeline fit on train → featurized splits in the
    rows-sized boosting fit layout (``_fit_layout``).

    Extracted from the formerly-duplicated inline prep of
    ``train_gbt_with_early_stopping`` and ``plans.ml_queries.
    ml_dart_metrics`` so the two queries measure the same prologue and a
    layout fix lands in both. Boosting is a long chain of SMALL
    sequential jobs (maxDepth levels × max_iter trees): per-level stats
    aggregation and scheduling cost scale with partition count, so the
    fit layout targets ROWS (~64k/partition), not core count — measured
    2× at sf0.1 (12.7 s → 6.6 s for maxIter=20; and 6 parts beat both 2
    and 32 in the round-7 sweep). RandomForest is the opposite (parallel
    trees saturate cores), so ``train_and_evaluate`` keeps the wide
    layout. At cluster scale the row target keeps fit partitions
    proportional to data — 10¹⁰ rows → ~115k partitions — because the
    layout is a repartition, not a coalesce capped at the current count.
    """
    cols = [label_col] + categorical + numeric
    data = df.na.drop(subset=cols)
    parallelism = data.sparkSession.sparkContext.defaultParallelism
    if data.rdd.getNumPartitions() < parallelism:
        data = data.repartition(parallelism)
    # cache the slim post-drop frame once — every split below re-derives
    # its rows by filtering the cached frame, not re-running scan+join
    data = data.cache()
    if split == "hash":
        from .splits import tag_split

        tagged = tag_split(
            data, cols, train_fraction, val_fraction=val_fraction,
            salt=f"mlsplit{seed}",
        )
        train = tagged.filter(F.col("__split") == "train").drop("__split")
        val = tagged.filter(F.col("__split") == "val").drop("__split")
        test = tagged.filter(F.col("__split") == "test").drop("__split")
    else:
        fracs = [train_fraction, val_fraction, 1 - train_fraction - val_fraction]
        if val_fraction > 0:
            train, val, test = data.randomSplit(fracs, seed=seed)
        else:
            train, test = data.randomSplit([fracs[0], fracs[2]], seed=seed)
            val = None
    fp_model = build_feature_pipeline(categorical, numeric, one_hot=False).fit(train)
    n_rows = data.count()  # one pass; also fills the cache explicitly
    fit_parts = max(2, -(-int(n_rows * train_fraction) // rows_per_fit_partition))
    feat_train = _fit_layout(
        fp_model.transform(train).select("features", label_col), fit_parts
    ).cache()
    caches = [data, feat_train]
    feat_val = None
    if val_fraction > 0 and val is not None:
        feat_val = _fit_layout(
            fp_model.transform(val).select("features", label_col),
            max(2, fit_parts // 3),
        ).cache()
        caches.append(feat_val)
    feat_test = fp_model.transform(test).select("features", label_col)
    return TreeFeaturePrep(fp_model, feat_train, feat_val, feat_test, n_rows, caches)


def train_gbt_with_early_stopping(
    df: DataFrame,
    *,
    label_col: str,
    categorical: list[str],
    numeric: list[str],
    max_iter: int = 40,
    patience: int = 5,
    seed: int = 123,
    split: str = "hash",
    **params,
) -> tuple["Pipeline", dict[str, float], dict[str, int]]:
    """GBT with early stopping — the engine's analogue of the
    reference's ``xgb.train(..., early_stopping_rounds=50, watchlist)``
    (04_1_XGB_traintest.R:282-289). MLlib GBT has no warm start, so the
    xgboost semantics are reproduced in two fits:

    1. train to ``max_iter`` on the train split;
    2. ONE ``evaluateEachIteration`` pass scores every iteration on a
       held-out validation split (the watchlist);
    3. ``best_iter`` = argmin validation RMSE; ``stopped_iter`` = the
       round training would have stopped (best_iter + patience, capped)
       — parity with ``early_stopping_rounds``;
    4. truncate the probe ensemble to its first ``best_iter`` trees
       (same final model as xgboost's best_ntree_limit truncation —
       and, boosting being sequential with iteration-local seeding,
       bit-identical to a ``maxIter=best_iter`` refit at zero extra
       fit cost; see ``_truncate_gbt_model``).

    Returns (fitted_pipeline, metrics, stop_info) where stop_info has
    best_iter / stopped_iter / max_iter.
    """
    # 60/20/20 deterministic split + featurize once (shared prologue);
    # BOTH fits (probe at max_iter, final at best_iter) and all
    # evaluation passes read the cached slim vectors
    prep = prep_tree_features(
        df,
        label_col=label_col,
        categorical=categorical,
        numeric=numeric,
        train_fraction=0.6,
        val_fraction=0.2,
        seed=seed,
        split=split,
    )
    fp_model = prep.fp_model
    feat_train, feat_val, feat_test = prep.feat_train, prep.feat_val, prep.feat_test

    gbt_full = make_regressor(
        "gbt", label_col=label_col, seed=seed, maxIter=max_iter, **params
    ).fit(feat_train)
    losses = [float(l) for l in gbt_full.evaluateEachIteration(feat_val, "squared")]
    best_iter = min(range(len(losses)), key=losses.__getitem__) + 1
    stopped_iter = min(best_iter + patience, max_iter)

    try:
        # exact truncation of the probe ensemble — no second boosting run
        gbt_best = _truncate_gbt_model(gbt_full, best_iter)
    except Exception:  # pragma: no cover — JVM constructor drift fallback
        gbt_best = make_regressor(
            "gbt", label_col=label_col, seed=seed, maxIter=best_iter, **params
        ).fit(feat_train)
    final = PipelineModel(stages=[fp_model, gbt_best])
    n_features = len(numeric) + len(categorical)
    # all four (model × split) evaluations reduce in ONE tagged job
    tagged = regression_metrics_tagged(
        {
            f"{m}:{s}": model_obj.transform(split_df)
            for m, model_obj in (("best", gbt_best), ("full", gbt_full))
            for s, split_df in (("train", feat_train), ("test", feat_test))
        },
        label_col=label_col,
        n_features=n_features,
    )
    metrics = {}
    full_metrics = {}  # the max_iter probe IS plain (non-stopped) GBT
    for key, v in tagged.items():
        tag, metric = key.split("_", 1)
        m, s = tag.split(":")
        (metrics if m == "best" else full_metrics)[f"{s}_{metric}"] = v
    prep.unpersist()
    return final, metrics, {
        "best_iter": best_iter,
        "stopped_iter": stopped_iter,
        "max_iter": max_iter,
        "full_metrics": full_metrics,
    }


def train_and_evaluate(
    df: DataFrame,
    *,
    kind: str,
    label_col: str,
    categorical: list[str],
    numeric: list[str],
    train_fraction: float = 0.75,
    seed: int = 123,
    scale: bool = False,
    split: str = "hash",
    **params,
) -> tuple["Pipeline", dict[str, float]]:
    """na.drop → deterministic split (M2, replaces R's positional
    complement, 03_LinearRegression.R:53-64) → feature pipeline → fit →
    metrics on train and test.

    ``split="hash"`` (default) tags rows on the md5 of their feature
    values (``ml.splits``): partition-invariant, no per-branch local
    sorts, and both split branches are plain filters on the cached
    frame. ``split="random"`` keeps MLlib's ``randomSplit(seed)``.

    ``scale=True`` reproduces R's ``scale()`` preprocessing
    (03_LinearRegression.R:29-34) for standardized coefficients; OLS
    predictions and metrics are scale-invariant, so the default keeps
    one-hot vectors SPARSE end-to-end (StandardScaler withMean
    densifies them — at 181 one-hot features that is a ~45x blowup of
    every cached/aggregated row for identical metric output)."""
    cols = [label_col] + categorical + numeric
    data = df.na.drop(subset=cols)
    # Tree training makes many passes; a single-file parquet scan yields
    # 1-3 partitions, starving the executors. Widen to the cluster's
    # parallelism first (cost: one shuffle, amortized across all passes).
    parallelism = data.sparkSession.sparkContext.defaultParallelism
    if data.rdd.getNumPartitions() < parallelism:
        data = data.repartition(parallelism)
    # cache the slim post-join frame ONCE: every consumer below — the
    # indexer fit and featurize pass on train AND the test-split metric
    # pass — re-derives its split by filtering the cached rows instead
    # of re-running scan+join+na.drop per branch
    data = data.cache()
    if split == "hash":
        from .splits import tag_split

        # seed participates via the salt — seed=1 vs seed=2 produce
        # different (deterministic) splits, as randomSplit callers expect
        tagged = tag_split(data, cols, train_fraction, salt=f"mlsplit{seed}")
        train = tagged.filter(F.col("__split") == "train").drop("__split")
        test = tagged.filter(F.col("__split") == "test").drop("__split")
    else:
        train, test = data.randomSplit(
            [train_fraction, 1 - train_fraction], seed=seed
        )
    one_hot = kind == "ols"
    fp = build_feature_pipeline(categorical, numeric, one_hot=one_hot, scale=scale)
    # Featurize ONCE and cache the slim (features, label) projection:
    # model fitting and both metric passes then read the cached vectors
    # instead of re-running indexers/encoder/scaler per consumer.
    fp_model = fp.fit(train)
    feat_train = fp_model.transform(train).select("features", label_col).cache()
    feat_test = fp_model.transform(test).select("features", label_col)
    model = make_regressor(kind, label_col=label_col, seed=seed, **params)
    model_fitted = model.fit(feat_train)
    fitted = PipelineModel(stages=[fp_model, model_fitted])
    n_features = len(numeric) + len(categorical)
    metrics = regression_metrics_tagged(
        {
            "train": model_fitted.transform(feat_train),
            "test": model_fitted.transform(feat_test),
        },
        label_col=label_col,
        n_features=n_features,
    )
    feat_train.unpersist()
    data.unpersist()
    return fitted, metrics


def _dart_weight_update(weights: list[float], dropped: list[int], lr: float) -> float:
    """DART normalization — the paper's expectation-preserving scheme
    for a FULL-residual fit (Vinayak & Gilad-Bachrach 2015, §3): after
    fitting the new tree against the dropout-residual, the new tree
    enters with weight ``lr/(k+lr)`` and every dropped tree is rescaled
    by ``k/(k+lr)`` (k = |dropped|), so the expected ensemble output is
    preserved given that the new tree estimates the whole dropped sum.
    k=0 degenerates to plain shrinkage-``lr`` boosting.

    Convention note: xgboost's ``normalize_type='tree'`` assigns the new
    tree ``1/(k+learning_rate)`` because its tree is already scaled by
    ``lr`` internally — the two coincide only at ``learning_rate=1``.
    This implementation is internally consistent with its own
    full-residual fit; it is NOT a parameter-for-parameter xgboost
    match away from lr=1. Mutates ``weights`` in place; returns the new
    tree's weight. Pure math — unit-tested directly."""
    k = len(dropped)
    if k == 0:
        return lr
    scale = k / (k + lr)
    for i in dropped:
        weights[i] *= scale
    return lr / (k + lr)


def train_dart(
    feat: DataFrame,
    *,
    label_col: str = "label",
    features_col: str = "features",
    max_iter: int = 20,
    max_depth: int = 5,
    dropout_rate: float = 0.1,
    learning_rate: float = 1.0,
    seed: int = 123,
    checkpoint_every: int = 1,
):
    """DART — boosting with tree DROPOUT (Vinayak & Gilad-Bachrach
    2015, arXiv:1505.01866) for squared loss, built from MLlib
    primitives. The reference's booster (`04_1_XGB_traintest.R:249-257`:
    ``booster='dart'``) finally has a RUNNING analogue — the engine's
    previous GBT path reproduced early stopping but not dropout.

    Per iteration: (1) drop each prior tree independently with
    ``dropout_rate``; (2) the residual is computed against the ensemble
    WITHOUT the dropped trees (one codegen expression over the cached
    per-tree prediction columns — no rescoring of prior trees); (3) a
    ``DecisionTreeRegressor`` fits the residual; (4) weights update per
    ``_dart_weight_update``. ``dropout_rate=0`` is exactly plain
    shrinkage boosting; ``dropout_rate=1`` makes every iteration refit
    the raw label (the paper's random-forest limit — with a
    deterministic tree fit, all trees come out identical, a property
    the tests pin).

    Returns ``(model, weights)`` where ``model`` is a STANDARD
    ``GBTRegressionModel`` packing the trees and final weights through
    the JVM ensemble constructor (prediction = Σ wᵢ·treeᵢ(x) — exactly
    GBT's scoring function), so transform/save/load are stock MLlib at
    JVM speed and the artifact needs no custom persistence.

    Scale shape: iteration k appends ONE prediction column to the
    cached frame (width grows to ``max_iter`` doubles — bounded), and
    each fit is a distributed tree build; ``localCheckpoint`` every
    ``checkpoint_every`` iterations keeps Catalyst analysis O(window)
    instead of O(k) (the curation-funnel lesson, SCALE.md §11 —
    measured at sf0.1: every-1 18.8 s vs every-5 24.1 s for 10
    iterations, so the default is 1). The wall is dominated by MLlib
    per-tree-fit job scheduling (~1 s/iteration on local[32]), not
    data volume — sf0.001 and sf0.1 cost nearly the same."""
    import random as _random

    from pyspark import SparkContext
    from pyspark.ml.regression import DecisionTreeRegressor, GBTRegressionModel

    if max_iter < 1:
        raise ValueError(f"train_dart needs max_iter >= 1, got {max_iter}")
    rng = _random.Random(seed)
    df = feat.select(features_col, F.col(label_col).alias("__y")).cache()
    trees: list = []
    weights: list[float] = []
    for it in range(max_iter):
        dropped = (
            [i for i in range(len(trees)) if rng.random() < dropout_rate]
            if dropout_rate > 0
            else []
        )
        keep_expr = F.lit(0.0)
        for i, w in enumerate(weights):
            if i not in dropped:
                keep_expr = keep_expr + F.lit(w) * F.col(f"__p{i}")
        fit_df = df.withColumn("__resid", F.col("__y") - keep_expr)
        tree = DecisionTreeRegressor(
            labelCol="__resid",
            featuresCol=features_col,
            predictionCol="__pred",
            maxDepth=max_depth,
            seed=seed + it,
        ).fit(fit_df)
        w_new = _dart_weight_update(weights, dropped, learning_rate)
        trees.append(tree)
        weights.append(w_new)
        df = (
            tree.transform(df)
            .withColumnRenamed("__pred", f"__p{len(trees) - 1}")
        )
        if (it + 1) % checkpoint_every == 0:
            df = df.localCheckpoint()

    sc = SparkContext._active_spark_context
    gw = sc._gateway
    tree_cls = sc._jvm.org.apache.spark.ml.regression.DecisionTreeRegressionModel
    j_trees = gw.new_array(tree_cls, len(trees))
    j_weights = gw.new_array(gw.jvm.double, len(trees))
    for i, (t, w) in enumerate(zip(trees, weights)):
        j_trees[i] = t._java_obj
        j_weights[i] = w
    n_feat = trees[0].numFeatures
    jm = sc._jvm.org.apache.spark.ml.regression.GBTRegressionModel(
        f"dart_{seed}", j_trees, j_weights, n_feat
    )
    df.unpersist()
    return GBTRegressionModel(jm), weights


class DartRegressor(Estimator):
    """Estimator wrapper over :func:`train_dart` so the DART booster
    rides the SAME interface as every other regressor kind
    (``make_regressor('dart', ...)`` → ``.fit(feat)`` →
    ``GBTRegressionModel``) — the switch a reference user makes with
    ``booster='dart'`` (04_1_XGB_traintest.R:249) is one string here
    too. A REAL ``pyspark.ml.Estimator`` subclass (r11): the previous
    duck-typed wrapper satisfied direct ``.fit`` callers but
    ``Pipeline(stages=[...])`` type-checks its stages, so the dart
    kind crashed every Pipeline composition path
    (``tree_county_forecast``) — caught generating the tree golden.
    ``fit`` returns the packed stock model; the final per-tree weights
    are kept on ``self.weights_``."""

    def __init__(
        self,
        *,
        label_col: str = "label",
        features_col: str = "features",
        seed: int = 123,
        max_iter: int = 20,
        max_depth: int = 5,
        dropout_rate: float = 0.1,
        learning_rate: float = 1.0,
    ):
        super().__init__()
        self._kw = dict(
            label_col=label_col,
            features_col=features_col,
            seed=seed,
            max_iter=max_iter,
            max_depth=max_depth,
            dropout_rate=dropout_rate,
            learning_rate=learning_rate,
        )
        self.weights_: list[float] | None = None

    def _fit(self, feat: DataFrame):
        model, weights = train_dart(feat, **self._kw)
        self.weights_ = weights
        return model
