"""Reference-parity election pipeline (SURVEY.md §3, FIXTURES.md).

The reference's five R scripts re-expressed as one lazy Spark DAG per
entry point. Input schemas are FIXTURES.md §1; stage outputs match the
reference's committed models/*.csv shapes (§3 output tables).

Entry point A (01_DataMerge.R):   county_ratios / state_ratios /
                                   enrich_listings
Entry point B (02+03):             clean_listings → ols_county_forecast
Entry point C (02+04):             clean_listings → tree_county_forecast
Outputs (05):                      observed ∪ forecast + decile binning

Scale posture: voting dims pre-aggregate before joining (SURVEY.md §4.1
"Catalyst won't invent it"), ratio tables broadcast against the fact
scan, the spatial join is map-side (operators.geo), and the county
roll-up is one keyed aggregation (J5 fused, no positional alignment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.ratios import dem_rep_ratio
from ..functions.scaling import zscore_apply, zscore_params, zscore_invert
from ..functions.strings import first_token, strip_chars, token_at
from ..operators.cleaning import (
    collapse_rare_levels,
    drop_high_na_columns,
    empty_to_null,
    null_keeping_filter,
)
from ..operators.geo import point_in_polygon_join
from ..operators.rollup import decile_bins, threshold_rollup

PARTIES = ["DEMOCRAT", "REPUBLICAN", "LIBERTARIAN", "OTHER", "NOPARTY"]

# The 13 modelling variables kept at projection (02_DataCleaning.R:235-237)
# + keys. DemRepRatio is the label; StateDemRepRatio is a feature in the
# withState variants (04_2_XGB_forecast.R).
MODEL_NUMERIC = [
    "mileage",
    "price",
    "city_fuel_economy",
    "horsepower",
    "length",
    "maximum_seating",
    "StateDemRepRatio",
]
MODEL_CATEGORICAL = ["body_type", "make_name", "is_new"]
MODEL_KEYS = ["state", "county"]
LABEL = "DemRepRatio"


def county_ratios(votes_precinct: DataFrame) -> DataFrame:
    """01_DataMerge.R:69-92 — votes by (county, party) → pivot → ratio.

    group-sum (A1) → ''→NOPARTY recode (F6) → pivot with explicit party
    levels (A4) → NA→0 (P8) → DEM/(DEM+REP) (F8) → lower(county) (F1).
    Output: (county, DemRepRatio)."""
    votes = (
        votes_precinct.withColumn(
            "party_simplified",
            F.when(
                F.col("party_simplified").isNull() | (F.col("party_simplified") == ""),
                "NOPARTY",
            ).otherwise(F.col("party_simplified")),
        )
        .groupBy("county_name", "party_simplified")
        .agg(F.sum("votes").alias("votes"))
    )
    wide = (
        votes.groupBy("county_name")
        .pivot("party_simplified", PARTIES)
        .agg(F.first("votes"))
        .na.fill(0)
    )
    return wide.select(
        F.lower("county_name").alias("county"),
        dem_rep_ratio("DEMOCRAT", "REPUBLICAN").alias("DemRepRatio"),
    )


def state_ratios(votes_state: DataFrame, year: int = 2020) -> DataFrame:
    """01_DataMerge.R:97-115 — same skeleton at state level, filtered to
    the election year (P4). Output: (state, StateDemRepRatio)."""
    votes = (
        votes_state.filter(F.col("year") == year)
        .withColumn("candidatevotes", F.col("candidatevotes").cast("long"))
        .groupBy("state", "party_simplified")
        .agg(F.sum("candidatevotes").alias("votes"))
    )
    wide = (
        votes.groupBy("state")
        .pivot("party_simplified", PARTIES)
        .agg(F.first("votes"))
        .na.fill(0)
    )
    return wide.select(
        F.lower("state").alias("state"),
        dem_rep_ratio("DEMOCRAT", "REPUBLICAN").alias("StateDemRepRatio"),
    )


def enrich_listings(
    listings: DataFrame,
    county_polygons: DataFrame,
    county_ratio_df: DataFrame,
    state_ratio_df: DataFrame,
) -> DataFrame:
    """01_DataMerge.R:119-143 — spatial county lookup (G1), broadcast
    ratio joins (J1), then keep rows with a known state ratio (P6).

    Plan shape: one fat scan, a map-side spatial enrich, two broadcast
    hash joins, one filter — zero shuffles on the fact table."""
    located = point_in_polygon_join(
        listings, county_polygons, attr_cols=("state", "county")
    )
    return (
        located.join(broadcast(county_ratio_df), on="county", how="left")
        .join(broadcast(state_ratio_df), on="state", how="left")
        .filter(F.col("StateDemRepRatio").isNotNull())
    )


# Columns dropped explicitly at 02_DataCleaning.R:51-70 (P2).
EXPLICIT_DROPS = [
    "vin",
    "city",
    "description",
    "dealer_zip",
    "main_picture_url",
    "sp_name",
    "transmission_display",
    "trim_name",
    "wheel_system_display",
    "exterior_color",
    "interior_color",
    "major_options",
    "model_name",
    "franchise_make",
    "listing_id",
    "sp_id",
    "trimId",
    "franchise_dealer",
    "latitude",
    "longitude",
]

# Explicit name→type map (02_DataCleaning.R:74-125, F5).
CAST_MAP = {
    "back_legroom": "double",
    "city_fuel_economy": "double",
    "daysonmarket": "double",
    "engine_displacement": "double",
    "front_legroom": "double",
    "fuel_tank_volume": "double",
    "height": "double",
    "highway_fuel_economy": "double",
    "horsepower": "double",
    "length": "double",
    "maximum_seating": "double",
    "mileage": "double",
    "price": "double",
    "savings_amount": "double",
    "seller_rating": "double",
    "torque": "double",
    "width": "double",
    "year": "double",
    "is_new": "boolean",
    "listed_date": "date",
}

# NA-keeping outlier bounds (02_DataCleaning.R:207-214, P5).
OUTLIER_BOUNDS = {
    "city_fuel_economy": 70.0,
    "highway_fuel_economy": 60.0,
    "horsepower": 600.0,
    "price": 200000.0,
    "mileage": 300000.0,
}


def clean_listings(
    enriched: DataFrame,
    na_threshold: float = 0.20,
    rare_threshold: float = 0.01,
    date_cutoff: str = "2020-01-01",
) -> DataFrame:
    """02_DataCleaning.R — the full cleaning stage as one declarative
    chain (P9→P1→P2→F5→P4→F2/F3/F4→P5→P3→F7)."""
    df = empty_to_null(enriched)
    df = drop_high_na_columns(df, na_threshold, keep=(LABEL,))
    df = df.drop(*[c for c in EXPLICIT_DROPS if c in df.columns])
    # try_cast, NOT cast: the raw listings carry junk in numeric columns
    # (torque "258 lb-ft @ 1,550 RPM", "--" markers). R's as.numeric
    # yields NA there (02_DataCleaning.R:74-125); under ANSI mode — the
    # Spark 4 default — a plain cast THROWS on the first junk value, so
    # try_cast is the parity-correct AND crash-safe translation of F5.
    for c, t in CAST_MAP.items():
        if c in df.columns:
            df = df.withColumn(c, F.col(c).try_cast(t))
    if "listed_date" in df.columns:
        df = df.filter(F.col("listed_date") > F.lit(date_cutoff).cast("date"))
    # String extraction: power "340 hp @ 6,000 RPM" → hp + rpm
    # (02_DataCleaning.R:149-167); wheelbase "106.3 in" → double (:169-172);
    # first token of engine_cylinders / engine_type (:176-182).
    if "power" in df.columns:
        df = df.withColumn("hp_extracted", first_token("power").try_cast("double"))
        df = df.withColumn(
            "rpm", strip_chars(token_at("power", 4), ",").try_cast("double")
        )
        df = null_keeping_filter(df, F.col("rpm") > 2000, "rpm").drop("power")
    if "wheelbase" in df.columns:
        df = df.withColumn(
            "wheelbase", first_token(F.col("wheelbase"), " in").try_cast("double")
        )
    if "engine_cylinders" in df.columns:
        df = df.withColumn("engine_cylinders", first_token("engine_cylinders"))
    if "engine_type" in df.columns:
        df = df.withColumn("engine_type", first_token("engine_type"))
    for c, bound in OUTLIER_BOUNDS.items():
        if c in df.columns:
            df = null_keeping_filter(df, F.col(c) < bound, c)
    if "year" in df.columns:
        df = null_keeping_filter(df, F.col("year") > 1900, "year")
    keep = [c for c in MODEL_NUMERIC + MODEL_CATEGORICAL + MODEL_KEYS + [LABEL] if c in df.columns]
    df = df.select(*keep)
    if "is_new" in df.columns:
        # boolean → categorical string, as the reference re-casts is_new
        # to factor before model.matrix (04_1_XGB_traintest.R:87-88)
        df = df.withColumn("is_new", F.col("is_new").cast("string"))
    cat_present = [c for c in MODEL_CATEGORICAL if c in df.columns and c != "is_new"]
    df = collapse_rare_levels(df, cat_present, threshold=rare_threshold)
    return df


def _split_label(clean: DataFrame) -> tuple[DataFrame, DataFrame]:
    """03_LinearRegression.R:37-38 — rows with a known county ratio are
    train/evaluate; NULL-ratio rows are the forecast partition (P6)."""
    return (
        clean.filter(F.col(LABEL).isNotNull()),
        clean.filter(F.col(LABEL).isNull()),
    )


def ols_county_forecast(
    clean: DataFrame,
    min_obs: int = 100,
    seed: int = 123,
) -> dict[str, DataFrame]:
    """Entry point B (03_LinearRegression.R): z-scale with captured
    (μ,σ) → 75/25 split → distributed OLS → score → unscale → county
    roll-up with >min_obs support (J5) → calibration OLS (L10/F10).

    Returns the reference's output tables: observed ratios, in/out-of-
    sample county evals, calibrated forecasts, metrics."""
    from pyspark.ml import Pipeline
    from ..ml.features import build_feature_pipeline
    from ..ml.metrics import regression_metrics_tagged
    from ..ml.regressors import make_regressor

    labeled, unlabeled = _split_label(clean)
    numeric = [c for c in MODEL_NUMERIC if c in clean.columns]
    categorical = [c for c in MODEL_CATEGORICAL if c in clean.columns]

    labeled = labeled.na.drop(subset=numeric + categorical)
    unlabeled = unlabeled.na.drop(subset=numeric + categorical)

    # F9 — z-scale label+numerics, capturing (μ,σ) to invert forecasts
    # exactly as the reference does (03:29-34, :127-129).
    params = zscore_params(labeled, numeric + [LABEL])
    mu_y, sigma_y = params[LABEL]
    labeled_s = zscore_apply(labeled, params)
    unlabeled_s = zscore_apply(unlabeled, {c: params[c] for c in numeric})

    train, test = labeled_s.randomSplit([0.75, 0.25], seed=seed)

    fp = build_feature_pipeline(categorical, numeric, one_hot=True, scale=False)
    ols = make_regressor("ols", label_col=LABEL)
    model = Pipeline(stages=[fp, ols]).fit(train)

    def score(df: DataFrame) -> DataFrame:
        # Un-scale prediction AND label back to ratio units (03:127-129)
        # so metrics and county roll-ups are in the reference's scale.
        scored = zscore_invert(model.transform(df), "prediction", mu_y, sigma_y)
        return scored.withColumn(
            LABEL, F.col(LABEL) * F.lit(sigma_y) + F.lit(mu_y)
        )

    train_scored = score(train)
    test_scored = score(test)
    n_features = len(numeric) + len(categorical)
    metrics = regression_metrics_tagged(
        {"train": train_scored, "test": test_scored},
        label_col=LABEL,
        n_features=n_features,
    )

    # County roll-ups (J5 fused agg, 03:133-145) for eval and forecast.
    eval_in = _county_eval(train_scored, min_obs)
    eval_out = _county_eval(test_scored, min_obs)

    # L10/F10 — calibration: OLS of actual on forecast over the county
    # table, applied affinely to the forecast partition (03:158-159,236).
    calib = eval_out.select("forecast", F.col(LABEL).alias("actual"))
    stats = calib.agg(
        F.avg("forecast").alias("mx"),
        F.avg("actual").alias("my"),
        F.covar_samp("forecast", "actual").alias("cxy"),
        F.var_samp("forecast").alias("vx"),
    ).first()
    beta1 = stats["cxy"] / stats["vx"] if stats["vx"] else 1.0
    beta0 = stats["my"] - beta1 * stats["mx"]

    unl_scored = model.transform(unlabeled_s)
    unl_scored = zscore_invert(unl_scored, "prediction", mu_y, sigma_y)
    forecast = threshold_rollup(
        unl_scored, MODEL_KEYS, "prediction", min_count=min_obs, avg_alias="forecast"
    ).select(
        "state",
        "county",
        (F.lit(beta0) + F.lit(beta1) * F.col("forecast")).alias("forecast"),
    )

    observed = (
        labeled.select("state", "county", LABEL).distinct()
    )

    spark = clean.sparkSession
    metrics_df = spark.createDataFrame(
        [("ols", k, float(v)) for k, v in sorted(metrics.items())],
        ["model", "metric", "value"],
    )
    return {
        "observed": observed,
        "eval_in_sample": eval_in,
        "eval_out_of_sample": eval_out,
        "forecast": forecast,
        "metrics": metrics_df,
    }


def _county_eval(scored: DataFrame, min_obs: int) -> DataFrame:
    """Fused J5: mean prediction AND mean actual per county, kept when
    support > min_obs; replaces the reference's positional alignment of
    two separately-grouped tables (03:133-145)."""
    return (
        scored.groupBy(*MODEL_KEYS)
        .agg(
            F.avg("prediction").alias("forecast"),
            F.avg(LABEL).alias(LABEL),
            F.count(F.lit(1)).alias("n_obs"),
        )
        .filter(F.col("n_obs") > min_obs)
        .drop("n_obs")
    )


def tree_county_forecast(
    clean: DataFrame,
    kind: str = "random_forest",
    min_obs: int = 100,
    seed: int = 123,
    tune: bool = False,
    param_grid: dict[str, list] | None = None,
    **params,
) -> dict[str, DataFrame]:
    """Entry point C (04_*): tree-family county forecast. RandomForest is
    the headline (BASELINE.json); GBT is the xgb.train analogue. Trees
    consume StringIndexer output directly (no one-hot — MLlib treats
    indexed columns as categorical via metadata, better splits and far
    smaller vectors than dummies at scale).

    ``tune=True`` runs the reference's CV hyperparameter search (L6,
    04_1:129-167) as a CrossValidator grid on a 10 % subsample (M1);
    ``param_grid`` passes a full reference-scale grid through to the
    search (see ``_cv_fit``)."""
    from pyspark.ml import Pipeline
    from ..ml.features import build_feature_pipeline
    from ..ml.metrics import regression_metrics_tagged
    from ..ml.regressors import make_regressor

    labeled, unlabeled = _split_label(clean)
    numeric = [c for c in MODEL_NUMERIC if c in clean.columns]
    categorical = [c for c in MODEL_CATEGORICAL if c in clean.columns]
    labeled = labeled.na.drop(subset=numeric + categorical)  # L1's silent na.omit, made explicit
    unlabeled = unlabeled.na.drop(subset=numeric + categorical)

    train, test = labeled.randomSplit([0.75, 0.25], seed=seed)

    fp = build_feature_pipeline(categorical, numeric, one_hot=False)
    reg = make_regressor(kind, label_col=LABEL, seed=seed, **params)
    pipe = Pipeline(stages=[fp, reg])

    if tune:
        model = _cv_fit(pipe, reg, train, kind, seed, param_grid=param_grid)
    else:
        model = pipe.fit(train)

    train_scored = model.transform(train)
    test_scored = model.transform(test)
    n_features = len(numeric) + len(categorical)
    metrics = regression_metrics_tagged(
        {"train": train_scored, "test": test_scored},
        label_col=LABEL,
        n_features=n_features,
    )

    unl_scored = model.transform(unlabeled)
    forecast = threshold_rollup(
        unl_scored, MODEL_KEYS, "prediction", min_count=min_obs, avg_alias="forecast"
    ).select("state", "county", "forecast")

    spark = clean.sparkSession
    metrics_df = spark.createDataFrame(
        [(kind, k, float(v)) for k, v in sorted(metrics.items())],
        ["model", "metric", "value"],
    )
    # tree-path eval tables use the reference's xgb header names
    # (state,county,forecast,actual — models/xgb_pred_*_withState.csv)
    return {
        "eval_in_sample": _county_eval(train_scored, min_obs).withColumnRenamed(
            LABEL, "actual"
        ),
        "eval_out_of_sample": _county_eval(test_scored, min_obs).withColumnRenamed(
            LABEL, "actual"
        ),
        "forecast": forecast,
        "metrics": metrics_df,
        "feature_importances": _importances(spark, model, categorical, numeric),
    }


def _cv_fit(
    pipe,
    reg,
    train: DataFrame,
    kind: str,
    seed: int,
    param_grid: dict[str, list] | None = None,
    num_folds: int = 2,
    parallelism: int = 4,
    sample_fraction: float = 0.10,
):
    """L6 — CrossValidator grid on a 10 % seeded subsample (M1,
    04_1:120-125), folds×grid parallelized by Spark (replaces the
    reference's PSOCK worker pool, 04_1:129-131).

    ``param_grid`` maps estimator param NAMES to value lists (e.g.
    ``{"maxDepth": [4, 6, 8, 10], "subsamplingRate": [0.6, 0.8, 1.0],
    "numTrees": [...]}``) and replaces the built-in 4-combo demo grid —
    the passthrough that lets a caller reproduce the reference's
    324/1296-combination searches (04_1:145-152, 04_2:130-137)
    verbatim; folds×grid cells still run in parallel on the cluster."""
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    sample = train.sample(fraction=sample_fraction, seed=seed)
    gb = ParamGridBuilder()
    if param_grid:
        for pname, values in param_grid.items():
            gb = gb.addGrid(reg.getParam(pname), values)
    elif kind == "random_forest":
        gb = gb.addGrid(reg.maxDepth, [4, 8]).addGrid(reg.numTrees, [20, 50])
    else:
        gb = gb.addGrid(reg.maxDepth, [4, 6]).addGrid(reg.maxIter, [20, 50])
    cv = CrossValidator(
        estimator=pipe,
        estimatorParamMaps=gb.build(),
        evaluator=RegressionEvaluator(labelCol=LABEL, metricName="rmse"),
        numFolds=num_folds,
        parallelism=parallelism,
        seed=seed,
    )
    best = cv.fit(sample).bestModel
    return best


def _importances(spark, model, categorical, numeric) -> DataFrame:
    """L8 — feature importances joined back to names via assembler
    input order (04_1_XGB_traintest.R:330-345)."""
    names = numeric + [f"{c}_idx" for c in categorical]
    last = model.stages[-1]
    if hasattr(last, "featureImportances"):
        imps = list(last.featureImportances.toArray())
    elif hasattr(last, "coefficients"):
        imps = [abs(c) for c in last.coefficients]
    else:  # pragma: no cover
        imps = [0.0] * len(names)
    rows = list(zip(names, [float(i) for i in imps]))
    return spark.createDataFrame(rows, ["feature", "importance"]).orderBy(
        F.desc("importance"), "feature"
    )


def export_choropleth_geojson(
    map_table: DataFrame, county_polygons: DataFrame
) -> dict:
    """G2 — the engine's export boundary: join the decile-binned county
    table (``full_map_table``) to the vendored polygons and emit a
    GeoJSON FeatureCollection (05_OutcomeAndVisualization.R:116-146's
    leaflet map without the rendering dependency). Driver-side collect
    is fine: the county table is ≤ ~3k rows at ANY fact scale."""
    from ..operators.geo import parse_wkt_polygon

    joined = map_table.join(
        county_polygons.select("state", "county", "geometry"),
        on=["state", "county"],
        how="inner",
    ).collect()
    features = []
    for r in joined:
        polys = parse_wkt_polygon(r["geometry"])
        coords = [[ring.tolist() for ring in poly] for poly in polys]
        features.append(
            {
                "type": "Feature",
                "geometry": {"type": "MultiPolygon", "coordinates": coords},
                "properties": {
                    "state": r["state"],
                    "county": r["county"],
                    "ratio": r["ratio"],
                    "decile": r["decile"],
                    "kind": r["kind"],
                },
            }
        )
    return {"type": "FeatureCollection", "features": features}


def full_map_table(observed: DataFrame, forecast: DataFrame) -> DataFrame:
    """05_OutcomeAndVisualization.R:183 — U1 union of observed +
    forecast ratios, then W1 decile binning for the choropleth export
    (engine emits the table; map rendering is a non-engine concern)."""
    obs = observed.select(
        "state", "county", F.col(LABEL).alias("ratio"), F.lit("observed").alias("kind")
    )
    fc = forecast.select(
        "state", "county", F.col("forecast").alias("ratio"), F.lit("forecast").alias("kind")
    )
    both = obs.unionByName(fc)
    return decile_bins(both, "ratio", n=10, tiebreak=["state", "county"])
