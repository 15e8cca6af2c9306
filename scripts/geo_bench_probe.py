"""G1 spatial-join throughput probe (SCALE.md §11, verdict item 4).

The point-in-polygon join (`operators/geo.py`) is the engine's one
mapInPandas kernel that had zero performance evidence — the reference
enriches ~3M listings through its analogue (01_DataMerge.R:119-128).
This probe measures points/s at a REFERENCE-SHAPED polygon set: a
50×50 grid (2 500 polygons ≈ the ~3 000 US counties) with 64-vertex
rings (county borders are detailed, not 5-point boxes), against
point counts spanning 40× (100k → 4M, bracketing the reference's 3M).

Prints one JSON line: {"polygons": ..., "runs": [{n, wall_sec,
points_per_sec, match_rate}, ...]}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from mbfbigdatarandomforest_spark.operators.geo import (  # noqa: E402
    point_in_polygon_join,
)
from mbfbigdatarandomforest_spark.session import get_spark  # noqa: E402

GRID = 50
LON0, LAT0, CELL = -120.0, 25.0, 0.5
RING_VERTS = 64


def _cell_wkt(i: int, j: int, rng: np.random.Generator) -> str:
    """A detailed (RING_VERTS-vertex) jittered ring INSIDE grid cell
    (i, j). The ring is built on the cell shrunk by a 5% margin and
    jittered by at most 3%, so even independently-jittered neighbours
    can never overlap: every point matches AT MOST one polygon (points
    in the border strips genuinely match none — they count against the
    match rate, not as duplicate join rows inflating the denominator)."""
    m = 0.05 * CELL
    x0, y0 = LON0 + i * CELL + m, LAT0 + j * CELL + m
    x1, y1 = x0 + CELL - 2 * m, y0 + CELL - 2 * m
    per_side = RING_VERTS // 4
    pts = []
    for k in range(per_side):
        pts.append((x0 + (x1 - x0) * k / per_side, y0))
    for k in range(per_side):
        pts.append((x1, y0 + (y1 - y0) * k / per_side))
    for k in range(per_side):
        pts.append((x1 - (x1 - x0) * k / per_side, y1))
    for k in range(per_side):
        pts.append((x0, y1 - (y1 - y0) * k / per_side))
    jit = rng.uniform(-0.03 * CELL, 0.03 * CELL, size=(len(pts), 2))
    pts = [(x + dx, y + dy) for (x, y), (dx, dy) in zip(pts, jit)]
    pts.append(pts[0])
    body = ", ".join(f"{x:.6f} {y:.6f}" for x, y in pts)
    return f"POLYGON(({body}))"


def main() -> None:
    sizes = [int(s) for s in (sys.argv[1:] or ["100000", "1000000", "4000000"])]
    spark = get_spark(app_name="geo-bench-probe")
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(11)
    polys = [
        {"state": f"s{i:02d}", "county": f"c{i:02d}_{j:02d}",
         "geometry": _cell_wkt(i, j, rng)}
        for i in range(GRID)
        for j in range(GRID)
    ]
    polys_df = spark.createDataFrame(polys)
    runs = []
    for n in sizes:
        # points: 95% inside the grid (jitter keeps them in SOME cell's
        # interior margin), 5% far outside -> NULL attrs
        pts = (
            spark.range(n)
            .select(
                F.col("id"),
                (F.lit(LON0) + F.rand(7) * GRID * CELL).alias("longitude"),
                (F.lit(LAT0) + F.rand(8) * GRID * CELL).alias("latitude"),
            )
            .withColumn(
                "longitude",
                F.when(F.col("id") % 20 == 0, F.lit(0.0)).otherwise(
                    F.col("longitude")
                ),
            )
            .repartition(32)
            .cache()
        )
        pts.count()
        t0 = time.perf_counter()
        out = point_in_polygon_join(pts, polys_df)
        matched = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("county").isNotNull().cast("long")).alias("m"),
        ).first()
        wall = time.perf_counter() - t0
        runs.append(
            {
                "n": n,
                "wall_sec": round(wall, 2),
                "points_per_sec": int(n / wall),
                "match_rate": round(matched["m"] / matched["n"], 4),
            }
        )
        pts.unpersist()
    print(json.dumps({"polygons": len(polys), "ring_verts": RING_VERTS, "runs": runs}))
    spark.stop()


if __name__ == "__main__":
    main()
