"""Beyond-SF probe for the ML queries (SCALE.md §15; round-9 verdict
item 6): the relational (§11) and corpus (§14) families have 10x/40x
tables; `ml_ols_metrics` and `ml_rf_forecast_rollup` had none.

What must hold:
- `ml_ols_metrics` is the Gram-matrix route (`ml/ols_gram.py`) — ONE
  scan-aggregate job computing X'X / X'y sufficient statistics, so its
  wall should grow ~linearly with rows and stay scan-dominated (the
  driver-side solve is p x p, constant).
- `ml_rf_forecast_rollup` is the headline tree pipeline — MLlib RF is
  multi-pass (one pass per depth level per tree group) over a cached
  frame; linear-ish growth with a constant pass count is the pass
  criterion, and the probe reports the FEATURE/FIT SPLIT (wall of
  materializing the feature frame alone vs the full query) so a future
  regression can be attributed to the scan+join or the learner.

Replication: lineitem K in {1, 10, 40} with disjoint l_orderkey ranges
(copy 0 original — the relational probe's design); part/orders copied
as-is (fixed dims: per-key contention grows with K, like a bigger SF).
The queries run EXACTLY as registered, reading the probe dir through
the same `load_table` path. Timed figure is min-of-REPS; the tiny
metric/rollup outputs are collect()ed (full compute forced; noop would
hide nothing here but collect also yields the row count).

Prints one JSON line:
{"runs": {query: {K: {in_rows, out_rows, wall_s, spread,
                      features_wall_s}}}}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from mbfbigdatarandomforest_spark.plans.ml_queries import (  # noqa: E402
    _lineitem_features,
)
from mbfbigdatarandomforest_spark.registry import load_all  # noqa: E402
from mbfbigdatarandomforest_spark.session import get_spark  # noqa: E402
from mbfbigdatarandomforest_spark.sources.catalog import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KS = tuple(
    int(k) for k in os.environ.get("SPARK_GRAFT_PROBE_KS", "1,10,40").split(",")
)
QUERIES = os.environ.get(
    "SPARK_GRAFT_PROBE_QUERIES", "ml_ols_metrics,ml_rf_forecast_rollup"
).split(",")
REPS = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "2"))


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    li = load_table(spark, SF_DIR, "lineitem")
    stride = (
        load_table(spark, SF_DIR, "orders")
        .agg(F.max("o_orderkey"))
        .collect()[0][0]
        + 1
    )
    base_rows = li.count()

    out: dict[str, dict[int, dict]] = {q: {} for q in QUERIES}
    for k in KS:
        probe_dir = f"/tmp/ml_probe_k{k}"
        if not os.path.isdir(f"{probe_dir}/lineitem.parquet"):
            rep = li
            if k > 1:
                rep = (
                    li.withColumn(
                        "__rep", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
                    )
                    .withColumn(
                        "l_orderkey",
                        F.col("l_orderkey") + F.col("__rep") * F.lit(stride),
                    )
                    .drop("__rep")
                )
            rep.write.mode("overwrite").parquet(f"{probe_dir}/lineitem.parquet")
            for t in ("part", "orders"):
                load_table(spark, SF_DIR, t).write.mode("overwrite").parquet(
                    f"{probe_dir}/{t}.parquet"
                )
        # feature/fit split: the scan+join frame alone, same reps
        feat_walls = []
        for _ in range(REPS):
            spark.catalog.clearCache()
            t0 = time.time()
            _lineitem_features(spark, probe_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            feat_walls.append(time.time() - t0)
        for q in QUERIES:
            walls, rows = [], None
            for _ in range(REPS):
                spark.catalog.clearCache()
                t0 = time.time()
                rows = len(specs[q].fn(spark, probe_dir).collect())
                walls.append(time.time() - t0)
            out[q][k] = {
                "in_rows": base_rows * k,
                "out_rows": rows,
                "wall_s": round(min(walls), 2),
                "spread": round(max(walls) / min(walls), 2),
                "features_wall_s": round(min(feat_walls), 2),
            }
            print(f"## {q} K={k}: {out[q][k]}", file=sys.stderr, flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "reps": REPS, "runs": out}))


if __name__ == "__main__":
    main()
