"""End-to-end election pipeline runner — the engine's user-facing
entry point (what a user of the reference would run instead of the five
R scripts, README.md:25-26 "Run code files sequentially").

Usage:
    python run_election_pipeline.py --synthetic [--out DIR] [--model random_forest|gbt|ols]

With ``--synthetic`` (the only mode wired in this container) the
FIXTURES.md-shaped generator provides inputs; in production, point the
three readers at the real CSVs (schemas in FIXTURES.md §1). Outputs are
the reference's models/*.csv tables (same headers) plus the choropleth
GeoJSON, written under --out.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--synthetic", action="store_true", required=True,
                    help="use the built-in deterministic generator")
    ap.add_argument("--out", default="./pipeline_out")
    ap.add_argument("--model", default="random_forest",
                    choices=["random_forest", "gbt", "ols"])
    ap.add_argument("--min-obs", type=int, default=20)
    ap.add_argument("--tune", action="store_true",
                    help="CrossValidator hyperparameter search (slower)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mbfbigdatarandomforest_spark.session import get_spark
    from mbfbigdatarandomforest_spark.plans import election as el
    from mbfbigdatarandomforest_spark.sources import synthetic as syn
    from mbfbigdatarandomforest_spark.sources.sinks import write_csv

    t0 = time.perf_counter()
    spark = get_spark(app_name="election-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    polygons = spark.createDataFrame(syn.county_polygons())
    votes_p = spark.createDataFrame(syn.votes_precinct())
    votes_s = spark.createDataFrame(syn.votes_state())
    listings = spark.createDataFrame(syn.listings()).withColumn(
        "listed_date", F.col("listed_date").cast("date")
    )

    # Entry point A (01_DataMerge.R)
    county_r = el.county_ratios(votes_p)
    state_r = el.state_ratios(votes_s)
    enriched = el.enrich_listings(listings, polygons, county_r, state_r)

    # Entry point B/C (02 + 03/04)
    clean = el.clean_listings(enriched, rare_threshold=0.02).cache()
    if args.model == "ols":
        result = el.ols_county_forecast(clean, min_obs=args.min_obs)
        observed = result["observed"]
    else:
        result = el.tree_county_forecast(
            clean, kind=args.model, min_obs=args.min_obs, tune=args.tune
        )
        observed = clean.filter(F.col(el.LABEL).isNotNull()).select(
            "state", "county", el.LABEL
        ).distinct()

    # Outputs (05)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    write_csv(observed, str(out / "DemRepRatiosAvailable.csv"))
    write_csv(result["forecast"], str(out / "forecast.csv"))
    write_csv(result["eval_out_of_sample"], str(out / "evaluate_forecast.csv"))
    write_csv(result["metrics"], str(out / "metrics.csv"))
    map_table = el.full_map_table(
        observed.withColumnRenamed(el.LABEL, el.LABEL), result["forecast"]
    )
    geojson = el.export_choropleth_geojson(map_table, polygons)
    (out / "choropleth.geojson").write_text(json.dumps(geojson))

    metrics = {r["metric"]: round(r["value"], 4) for r in result["metrics"].collect()}
    print(
        json.dumps(
            {
                "model": args.model,
                "observed_counties": observed.count(),
                "forecast_counties": result["forecast"].count(),
                "metrics": metrics,
                "outputs": sorted(p.name for p in out.iterdir()),
                "wall_sec": round(time.perf_counter() - t0, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
