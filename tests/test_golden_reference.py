"""Real-data golden test (SURVEY.md §5; VERDICT r01 missing #4).

The reference repo commits its actual county-forecast outputs
(``models/OLS_DemRepRatiosForecast.csv`` — 342 counties, and the
xgboost variant ``models/xgb_forecast.csv``). Comparing the engine's
forecasts against them value-for-value requires the reference's real
input data: the ~9.3 GB used-cars listings CSV plus the precinct/state
vote tables, none of which are present in this container (FIXTURES.md
documents the schemas). Until a host provides them via
``SPARK_GRAFT_REAL_DATA_DIR``, this test SKIPS with an explicit reason
rather than silently not existing.

When the data IS present the test runs the full pipeline (01→05
analogue) and asserts a tolerance join: every reference county matched,
mean absolute forecast deviation below 0.05 — a loose envelope because
R's RNG, xgboost's histogram binning and MLlib's trees legitimately
differ; the join itself (same counties, same scale of values) is the
real regression guard.

Since r10 the file also carries a NON-skipped synthetic-scale golden:
the engine's own pipeline outputs on the deterministic fixture
generator, pinned as committed CSVs under tests/golden/.
"""

from __future__ import annotations

import os
from pathlib import Path

import pandas as pd
import pytest

GOLDEN_DIR = Path(__file__).resolve().parent / "golden"
REAL_DATA_DIR = os.environ.get("SPARK_GRAFT_REAL_DATA_DIR", "")
REFERENCE_MODELS = Path(
    os.environ.get("SPARK_GRAFT_REFERENCE_MODELS", "/root/reference/models")
)

needs_real_data = pytest.mark.skipif(
    not (REAL_DATA_DIR and Path(REAL_DATA_DIR).is_dir()),
    reason=(
        "golden comparison needs the reference's real inputs (~9.3 GB "
        "used-cars listings CSV + vote tables) — set "
        "SPARK_GRAFT_REAL_DATA_DIR to a directory with listings.csv, "
        "votes_precinct.csv, votes_state.csv, county_polygons.csv "
        "(schemas: FIXTURES.md §1)"
    ),
)


@needs_real_data
def test_ols_forecast_matches_reference_golden(spark):
    import pyspark.sql.functions as F

    from mbfbigdatarandomforest_spark.plans import election as el
    from mbfbigdatarandomforest_spark.sources import synthetic as syn
    from mbfbigdatarandomforest_spark.sources.readers import read_csv

    golden_path = REFERENCE_MODELS / "OLS_DemRepRatiosForecast.csv"
    if not golden_path.is_file():
        pytest.skip(f"reference golden file absent: {golden_path}")

    # impose the schemas the synthetic generators document (FIXTURES.md
    # §1) — the engine rule is "explicit schema always", and the
    # generator rows are the canonical in-repo statement of those schemas
    def schema_of(rows):
        return spark.createDataFrame(rows).schema

    d = Path(REAL_DATA_DIR)
    listings = read_csv(
        spark, str(d / "listings.csv"), schema_of(syn.listings(8))
    )
    votes_p = read_csv(
        spark, str(d / "votes_precinct.csv"), schema_of(syn.votes_precinct())
    )
    votes_s = read_csv(
        spark, str(d / "votes_state.csv"), schema_of(syn.votes_state())
    )
    polygons = read_csv(
        spark, str(d / "county_polygons.csv"), schema_of(syn.county_polygons())
    )

    enriched = el.enrich_listings(
        listings, polygons, el.county_ratios(votes_p), el.state_ratios(votes_s)
    )
    clean = el.clean_listings(enriched, rare_threshold=0.02).cache()
    result = el.ols_county_forecast(clean, min_obs=20)

    golden = (
        spark.read.option("header", True)
        .csv(str(golden_path))
        .select(
            F.lower("state").alias("state"),
            F.lower("county").alias("county"),
            F.col("forecast").cast("double").alias("forecast_ref"),
        )
    )
    joined = (
        result["forecast"]
        .select(
            F.lower("state").alias("state"),
            F.lower("county").alias("county"),
            F.col("forecast").cast("double").alias("forecast_eng"),
        )
        .join(golden, ["state", "county"], "right")
    )
    n_ref = golden.count()
    matched = joined.filter(F.col("forecast_eng").isNotNull())
    assert matched.count() == n_ref, "every golden county must be forecast"
    mad = matched.agg(
        F.avg(F.abs(F.col("forecast_eng") - F.col("forecast_ref")))
    ).first()[0]
    assert mad < 0.05


def _df4(spark, rows):
    """createDataFrame with the input pinned to FOUR ordered slices —
    the layout ``local[4]`` produced when the goldens were recorded.
    ``randomSplit``/``sample`` draw per input partition, so the slice
    count is part of each golden's identity; ``sc.parallelize(rows, 4)``
    chunks the list into the same four contiguous slices regardless of
    the session's core count (r17 — this is what lets the suite's
    master change without re-recording goldens)."""
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 4))


def _synthetic_clean(spark):
    """The deterministic synthetic election fixture, enriched and
    cleaned — shared by the OLS and tree golden tests."""
    import pyspark.sql.functions as F

    from mbfbigdatarandomforest_spark.plans import election as el
    from mbfbigdatarandomforest_spark.sources import synthetic as syn

    polygons = _df4(spark, syn.county_polygons())
    votes_p = _df4(spark, syn.votes_precinct())
    votes_s = _df4(spark, syn.votes_state())
    listings = _df4(spark, syn.listings()).withColumn(
        "listed_date", F.col("listed_date").cast("date")
    )
    enriched = el.enrich_listings(
        listings, polygons, el.county_ratios(votes_p), el.state_ratios(votes_s)
    )
    return el.clean_listings(enriched, rare_threshold=0.02).cache()


def _assert_matches_golden(got, fname, num_tol):
    want = pd.read_csv(GOLDEN_DIR / fname)
    assert list(got.columns) == list(want.columns), fname
    assert len(got) == len(want), fname
    for c in got.columns:
        if got[c].dtype == object:
            assert got[c].tolist() == want[c].tolist(), (fname, c)
        else:
            diff = (got[c].astype(float) - want[c].astype(float)).abs().max()
            assert diff < num_tol, (fname, c, diff)


def test_synthetic_tree_pipeline_matches_repo_golden(spark):
    """Tree-path synthetic golden (r11, verdict item 4): the RF county
    forecast and the RF/GBT/DART metrics rows of
    ``tree_county_forecast`` pinned as committed CSVs, alongside the
    r10 OLS golden — no committed expected output existed for the tree
    composition before this.

    Tolerance policy (documented per the verdict): within a fixed
    Spark version the composition is seed-stable and reruns
    bit-identically; the envelopes — 0.02 absolute on forecasts
    (ratios ~0.35–0.59), 0.05 absolute on metrics (rmse/R² in
    [−0.02, 0.92]) — exist ONLY to absorb legitimate cross-version
    MLlib tree-building changes (split binning, tie order). A real
    regression (wrong join, broken split, scrambled labels) moves
    these numbers far more than 0.05: shuffling labels pushes R² to
    ~0. Generation config is pinned to the conftest session (local[4],
    shuffle=8) because randomSplit is partition-dependent."""
    from mbfbigdatarandomforest_spark.plans import election as el

    clean = _synthetic_clean(spark)
    try:
        for kind, params in (
            ("random_forest", dict(numTrees=10, maxDepth=5)),
            ("gbt", {}),
            ("dart", {}),
        ):
            res = el.tree_county_forecast(clean, kind=kind, min_obs=20, **params)
            mt = (
                res["metrics"]
                .toPandas()
                .sort_values(["model", "metric"], kind="mergesort")
                .reset_index(drop=True)
            )
            _assert_matches_golden(mt, f"synthetic_{kind}_metrics.csv", 0.05)
            if kind == "random_forest":
                fc = (
                    res["forecast"]
                    .toPandas()
                    .sort_values(["state", "county"], kind="mergesort")
                    .reset_index(drop=True)
                )
                _assert_matches_golden(fc, "synthetic_rf_forecast.csv", 0.02)
    finally:
        clean.unpersist()


def test_synthetic_ols_pipeline_matches_repo_golden(spark):
    """Synthetic-scale golden (r10, verdict item 5): the engine's OWN
    election-pipeline outputs are pinned as committed CSVs
    (tests/golden/synthetic_ols_*.csv), the reference's committed
    ``models/*.csv`` practice (05_OutcomeAndVisualization.R:21-41,
    SURVEY §5.1) applied to our pipeline. This catches silent drift in
    the F9/F10/J5/L2 composition (enrich → clean → split → Gram OLS →
    forecast) that no single-operator gate sees. Tolerance 1e-6: the
    composition is deterministic up to double-summation order in the
    Gram aggregate (partition scheduling), everything else is exact."""
    import pyspark.sql.functions as F

    from mbfbigdatarandomforest_spark.plans import election as el
    from mbfbigdatarandomforest_spark.sources import synthetic as syn

    polygons = _df4(spark, syn.county_polygons())
    votes_p = _df4(spark, syn.votes_precinct())
    votes_s = _df4(spark, syn.votes_state())
    listings = _df4(spark, syn.listings()).withColumn(
        "listed_date", F.col("listed_date").cast("date")
    )
    enriched = el.enrich_listings(
        listings, polygons, el.county_ratios(votes_p), el.state_ratios(votes_s)
    )
    clean = el.clean_listings(enriched, rare_threshold=0.02).cache()
    result = el.ols_county_forecast(clean, min_obs=20)

    for key, fname in (
        ("forecast", "synthetic_ols_forecast.csv"),
        ("eval_out_of_sample", "synthetic_ols_eval.csv"),
        ("metrics", "synthetic_ols_metrics.csv"),
    ):
        got = result[key].toPandas()
        want = pd.read_csv(GOLDEN_DIR / fname)
        sort_cols = [c for c in got.columns if got[c].dtype == object] or list(
            got.columns
        )
        got = got.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        assert list(got.columns) == list(want.columns), key
        assert len(got) == len(want), key
        for c in got.columns:
            if got[c].dtype == object:
                assert got[c].tolist() == want[c].tolist(), (key, c)
            else:
                diff = (got[c].astype(float) - want[c].astype(float)).abs().max()
                assert diff < 1e-6, (key, c, diff)
    clean.unpersist()
