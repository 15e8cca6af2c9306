"""End-to-end tests for the reference-parity election pipeline
(SURVEY.md §3) on FIXTURES.md-shaped synthetic inputs, with DuckDB /
pure-Python oracles for the relational and spatial stages and
metric-sanity checks for the ML stages (§5.2.3: ML outputs are
tolerance-checked, never hash-compared).
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

import fixtures_election as fx
from mbfbigdatarandomforest_spark.plans import election as el


@pytest.fixture(scope="module")
def tables(spark):
    polygons = spark.createDataFrame(fx.county_polygons())
    votes_p = spark.createDataFrame(fx.votes_precinct())
    votes_s = spark.createDataFrame(fx.votes_state())
    listings = spark.createDataFrame(fx.listings()).withColumn(
        "listed_date", F.col("listed_date").cast("date")
    )
    return {
        "polygons": polygons,
        "votes_precinct": votes_p,
        "votes_state": votes_s,
        "listings": listings,
    }


@pytest.fixture(scope="module")
def ratios(tables):
    return el.county_ratios(tables["votes_precinct"]), el.state_ratios(
        tables["votes_state"]
    )


@pytest.fixture(scope="module")
def enriched(tables, ratios):
    county_r, state_r = ratios
    return el.enrich_listings(
        tables["listings"], tables["polygons"], county_r, state_r
    ).cache()


@pytest.fixture(scope="module")
def clean(enriched):
    return el.clean_listings(enriched, rare_threshold=0.02).cache()


def test_county_ratios_vs_duckdb(ratios):
    county_r, _ = ratios
    got = {r["county"]: r["DemRepRatio"] for r in county_r.collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE vp (county_name VARCHAR, party_simplified VARCHAR, votes BIGINT)")
    con.executemany(
        "INSERT INTO vp VALUES (?, ?, ?)",
        [(r["county_name"], r["party_simplified"], r["votes"]) for r in fx.votes_precinct()],
    )
    want = {
        r[0]: r[1]
        for r in con.sql(
            """
            WITH agg AS (
              SELECT LOWER(county_name) AS county,
                SUM(CASE WHEN party_simplified='DEMOCRAT' THEN votes ELSE 0 END) AS dem,
                SUM(CASE WHEN party_simplified='REPUBLICAN' THEN votes ELSE 0 END) AS rep
              FROM vp GROUP BY 1
            ) SELECT county, dem * 1.0 / (dem + rep) FROM agg
            """
        ).fetchall()
    }
    assert got == want


def test_state_ratio_schema(ratios):
    _, state_r = ratios
    rows = state_r.collect()
    assert {r["state"] for r in rows} == {f"state{i}" for i in range(fx.N_STATES)}
    assert all(0.0 <= r["StateDemRepRatio"] <= 1.0 for r in rows)


def test_spatial_join_against_box_oracle(tables):
    located = (
        el.point_in_polygon_join(
            tables["listings"].select("listing_id", "longitude", "latitude"),
            tables["polygons"],
        )
        .collect()
    )
    for r in located:
        lon, lat = r["longitude"], r["latitude"]
        i = int((lon - fx.LON0) // fx.CELL)
        j = int((lat - fx.LAT0) // fx.CELL)
        if 0 <= i < fx.GRID and 0 <= j < fx.GRID:
            assert r["county"] == fx.county_name(i, j), r
            assert r["state"] == fx.state_name(i), r
        else:
            assert r["county"] is None and r["state"] is None, r


def test_enrich_keeps_only_known_state_ratio(enriched):
    assert enriched.filter(F.col("StateDemRepRatio").isNull()).count() == 0
    # listings in counties without precinct votes keep NULL DemRepRatio
    assert enriched.filter(F.col("DemRepRatio").isNull()).count() > 0


def test_clean_projection_and_filters(clean):
    cols = set(clean.columns)
    assert cols == set(
        el.MODEL_NUMERIC + el.MODEL_CATEGORICAL + el.MODEL_KEYS + [el.LABEL]
    )
    rows = clean.collect()
    # P5 outlier bounds hold but NULLs were kept
    assert all(r["price"] is None or r["price"] < 200_000 for r in rows)
    assert all(r["mileage"] is None or r["mileage"] < 300_000 for r in rows)
    assert any(r["mileage"] is None for r in rows)
    # F7: 'Other' injected for rare levels, rare raw levels gone
    makes = {r["make_name"] for r in rows}
    assert "Other" in makes and "saab" not in makes and "lada" not in makes


def test_ols_forecast_end_to_end(clean):
    out = el.ols_county_forecast(clean, min_obs=20)
    obs = out["observed"].collect()
    assert len(obs) > 0
    fc = out["forecast"].collect()
    assert len(fc) > 0
    # forecast counties must have NULL observed ratio (the unlabeled split)
    observed_counties = {(r["state"], r["county"]) for r in obs}
    assert all((r["state"], r["county"]) not in observed_counties for r in fc)
    metrics = {r["metric"]: r["value"] for r in out["metrics"].collect()}
    assert 0 < metrics["test_rmse"] < 1.0
    evals = out["eval_out_of_sample"].collect()
    assert all(r["forecast"] is not None for r in evals)


def test_rf_forecast_end_to_end(clean):
    out = el.tree_county_forecast(clean, kind="random_forest", min_obs=20, numTrees=10, maxDepth=5)
    metrics = {r["metric"]: r["value"] for r in out["metrics"].collect()}
    assert 0 < metrics["test_rmse"] < 1.0
    imps = out["feature_importances"].collect()
    assert len(imps) > 0 and abs(sum(r["importance"] for r in imps) - 1.0) < 1e-6
    assert out["forecast"].count() > 0


def test_full_map_table(clean):
    out = el.ols_county_forecast(clean, min_obs=20)
    table = el.full_map_table(out["observed"], out["forecast"]).collect()
    deciles = {r["decile"] for r in table}
    assert deciles <= set(range(1, 11))
    kinds = {r["kind"] for r in table}
    assert kinds == {"observed", "forecast"}


def test_output_schemas_match_reference_headers(clean):
    """Golden-schema parity: output tables carry exactly the column
    headers of the reference's committed models/*.csv files."""
    ols = el.ols_county_forecast(clean, min_obs=20)
    assert ols["observed"].columns == ["state", "county", "DemRepRatio"]
    assert ols["eval_out_of_sample"].columns == [
        "state", "county", "forecast", "DemRepRatio",
    ]
    assert ols["forecast"].columns == ["state", "county", "forecast"]
    rf = el.tree_county_forecast(
        clean, kind="random_forest", min_obs=20, numTrees=5, maxDepth=4
    )
    assert rf["eval_out_of_sample"].columns == [
        "state", "county", "forecast", "actual",
    ]
    assert rf["forecast"].columns == ["state", "county", "forecast"]


def test_choropleth_geojson_export(tables, clean):
    out = el.ols_county_forecast(clean, min_obs=20)
    table = el.full_map_table(out["observed"], out["forecast"])
    gj = el.export_choropleth_geojson(table, tables["polygons"])
    assert gj["type"] == "FeatureCollection"
    assert len(gj["features"]) == table.count()
    f = gj["features"][0]
    assert f["geometry"]["type"] == "MultiPolygon"
    assert set(f["properties"]) == {"state", "county", "ratio", "decile", "kind"}
    # geometry closes its rings
    ring = f["geometry"]["coordinates"][0][0]
    assert ring[0] == ring[-1]
    import json
    json.dumps(gj)  # serializable


def test_clean_listings_survives_junk_numerics(spark):
    """The raw listings carry junk in numeric columns (torque
    '258 lb-ft @ 1,550 RPM', '--' markers, malformed dates). R's
    as.numeric yields NA there; under ANSI mode (Spark 4 default) a
    plain cast would THROW on the first junk value. clean_listings must
    null them out and keep the row flowing instead."""
    rows = [
        # (price, torque, horsepower, listed_date, power, wheelbase)
        ("19500.0", "258 lb-ft @ 1,550 RPM", "240", "2020-06-01",
         "240 hp @ 5,500 RPM", "106.3 in"),
        ("--", "201", "not-a-number", "2020-07-15", "junkpower", "bad in"),
    ]
    df = spark.createDataFrame(
        rows,
        ["price", "torque", "horsepower", "listed_date", "power", "wheelbase"],
    )
    out = el.clean_listings(df, na_threshold=1.1, rare_threshold=0.0)
    got = out.collect()
    # junk in power/torque/wheelbase flows through the try_cast
    # extraction stages inside this plan — an ANSI throw would abort
    # the collect; the model-column select then drops the intermediates
    assert len(got) == 2  # no row lost, nothing thrown
    by_price = {r["price"]: r for r in got}
    good, bad = by_price[19500.0], by_price[None]
    assert good["horsepower"] == 240.0
    assert bad["horsepower"] is None  # 'not-a-number' → NULL, not a crash
