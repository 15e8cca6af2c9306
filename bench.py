"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is fully materialized via the noop sink (forces every column
and operator to execute — ``count()`` alone would let Catalyst prune
expensive expressions).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from mbfbigdatarandomforest_spark.registry import load_all
from mbfbigdatarandomforest_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_nation_revenue",
    "nation_status_ratio",
    "customer_order_rollup",
    "events_hourly_rollup",
    "dedup_exact",
    "dedup_minhash_pairs",      # both LSH scale paths, exact-verified
    "dedup_embedding_ann",      # IVF candidates + exact cosine verify
    "similarity_cosine_topk",
    "text_enrich_per_doc",      # quality+lang-id+fingerprint, one scan
    "ml_ols_metrics",           # tracked rival of the reference's 1.9s GPU OLS
    "ml_random_forest_metrics",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="mbf-rf-bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    # Untimed warmup: pay JVM/codegen/parquet-footer init once, outside
    # the per-query timings.
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = specs[name].fn
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
