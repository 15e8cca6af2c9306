"""Geospatial point-in-polygon enrichment (SURVEY.md §2.10 G1).

The reference maps each listing's (longitude, latitude) to a (state,
county) via ``latlong2`` over US county polygons (01_DataMerge.R:119-128).
Spark has no native spatial join; the engine's design (SURVEY.md §4.3):

- polygons (≤3k counties, ~MBs of WKT) are broadcast to every executor;
- a vectorized ``mapInPandas`` does bbox pruning + ray-casting per Arrow
  batch — pure numpy (no shapely dependency in this environment), O(#
  candidate polygons × ring vertices) per point but bbox pruning keeps
  candidates ~1;
- the fact side never shuffles: the join is map-side only, which is the
  whole point at 100 TB (a shuffle-based spatial join would move the
  entire fact table).

WKT support: POLYGON and MULTIPOLYGON, outer ring + holes. Boundary
points count as inside (half-open ray-cast convention; borders are
measure-zero for real listing data — documented divergence vs GEOS).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

_RING_RE = re.compile(r"\(([^()]+)\)")


def parse_wkt_polygon(wkt: str) -> list[list[np.ndarray]]:
    """Parse POLYGON/MULTIPOLYGON WKT → list of polygons, each a list of
    rings (first = outer, rest = holes), each ring an (n,2) float array."""
    body = wkt.strip()
    upper = body.upper()
    if upper.startswith("MULTIPOLYGON"):
        # split on ")),((" boundaries by tracking parens depth
        inner = body[body.index("(") + 1 : body.rindex(")")]
        polys, depth, start = [], 0, 0
        for i, ch in enumerate(inner):
            if ch == "(":
                if depth == 0:
                    start = i
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    polys.append(inner[start : i + 1])
        return [_parse_rings(p) for p in polys]
    if upper.startswith("POLYGON"):
        return [_parse_rings(body[body.index("(") :])]
    raise ValueError(f"unsupported WKT: {wkt[:40]}...")


def _parse_rings(poly_body: str) -> list[np.ndarray]:
    rings = []
    for ring_txt in _RING_RE.findall(poly_body):
        pts = [
            [float(t) for t in pair.split()[:2]]
            for pair in ring_txt.strip().split(",")
        ]
        rings.append(np.asarray(pts, dtype=np.float64))
    return rings


def _ring_contains(ring: np.ndarray, x: float, y: float) -> bool:
    """Even-odd ray casting; vectorized over ring edges."""
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    straddles = (y1 > y) != (y2 > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xs = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
    crossings = straddles & (x < xs)
    return bool(np.count_nonzero(crossings) & 1)


def _ring_contains_many(ring: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Even-odd ray casting for MANY points against one ring: a
    (points × edges) boolean matrix per ring, vectorized in numpy.
    Candidate sets per polygon are small (bbox-pruned), so the matrix
    stays tiny even for detailed rings."""
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    yc = y[:, None]
    straddles = (y1[None, :] > yc) != (y2[None, :] > yc)
    with np.errstate(divide="ignore", invalid="ignore"):
        xs = x1[None, :] + (yc - y1[None, :]) * (x2 - x1)[None, :] / (y2 - y1)[None, :]
    crossings = straddles & (x[:, None] < xs)
    return (np.count_nonzero(crossings, axis=1) & 1).astype(bool)


class PolygonIndex:
    """Broadcastable bbox-pruned polygon lookup."""

    def __init__(self, entries: list[tuple[dict, list[list[np.ndarray]]]]):
        self.attrs = [e[0] for e in entries]
        self.polys = [e[1] for e in entries]
        boxes = []
        for polys in self.polys:
            pts = np.vstack([r for p in polys for r in p])
            boxes.append([pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max()])
        self.boxes = np.asarray(boxes)  # (n, 4): minx,miny,maxx,maxy

    def locate(self, x: float, y: float) -> dict | None:
        if np.isnan(x) or np.isnan(y):
            return None
        cand = np.nonzero(
            (self.boxes[:, 0] <= x)
            & (x <= self.boxes[:, 2])
            & (self.boxes[:, 1] <= y)
            & (y <= self.boxes[:, 3])
        )[0]
        for i in cand:
            for rings in self.polys[i]:
                if _ring_contains(rings[0], x, y):
                    if not any(_ring_contains(h, x, y) for h in rings[1:]):
                        return self.attrs[i]
        return None

    def locate_many(self, xs: np.ndarray, ys: np.ndarray) -> list[dict | None]:
        """Batch lookup: ONE (points × polygons) bbox comparison for the
        whole Arrow batch, then ray-casting vectorized over each
        polygon's candidate points (loop length = polygons with ≥1
        candidate, not points). Semantics identical to ``locate`` row by
        row, including first-candidate-wins on boundary ties."""
        m = len(xs)
        out: list[dict | None] = [None] * m
        valid = ~(np.isnan(xs) | np.isnan(ys))
        if not valid.any():
            return out
        b = self.boxes
        # (points × polygons) candidate matrix in one shot
        cand = (
            (b[None, :, 0] <= xs[:, None])
            & (xs[:, None] <= b[None, :, 2])
            & (b[None, :, 1] <= ys[:, None])
            & (ys[:, None] <= b[None, :, 3])
            & valid[:, None]
        )
        assigned = np.zeros(m, dtype=bool)
        # polygon-major: lower polygon index wins, matching locate()'s
        # iteration over candidates in index order
        for poly_i in np.nonzero(cand.any(axis=0))[0]:
            pts = np.nonzero(cand[:, poly_i] & ~assigned)[0]
            if pts.size == 0:
                continue
            px, py = xs[pts], ys[pts]
            hit = np.zeros(pts.size, dtype=bool)
            for rings in self.polys[poly_i]:
                inside = _ring_contains_many(rings[0], px, py)
                for hole in rings[1:]:
                    inside &= ~_ring_contains_many(hole, px, py)
                hit |= inside
            for j in pts[hit]:
                out[j] = self.attrs[poly_i]
            assigned[pts[hit]] = True
        return out


def build_polygon_index(
    polygons_df: DataFrame,
    geometry_col: str = "geometry",
    attr_cols: tuple[str, ...] = ("state", "county"),
) -> PolygonIndex:
    """Collect the (small) polygon table to the driver and build the
    index once; caller broadcasts it via closure capture."""
    rows = polygons_df.select(*attr_cols, geometry_col).collect()
    entries = [
        ({c: r[c] for c in attr_cols}, parse_wkt_polygon(r[geometry_col]))
        for r in rows
    ]
    return PolygonIndex(entries)


def point_in_polygon_join(
    points_df: DataFrame,
    polygons_df: DataFrame,
    lon_col: str = "longitude",
    lat_col: str = "latitude",
    geometry_col: str = "geometry",
    attr_cols: tuple[str, ...] = ("state", "county"),
) -> DataFrame:
    """G1 — append polygon attributes to every point row; NULLs when no
    polygon contains the point (reference keeps unmatched listings with
    NA county, 01_DataMerge.R:126-139). Map-side only: no shuffle."""
    spark = points_df.sparkSession
    index = build_polygon_index(polygons_df, geometry_col, attr_cols)
    bc = spark.sparkContext.broadcast(index)

    out_schema = StructType(points_df.schema.fields.copy())
    for f in polygons_df.select(*attr_cols).schema.fields:
        out_schema.add(f)

    def enrich(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = bc.value
        for pdf in batches:
            attrs = idx.locate_many(
                pdf[lon_col].astype(float).to_numpy(na_value=np.nan),
                pdf[lat_col].astype(float).to_numpy(na_value=np.nan),
            )
            for c in attr_cols:
                pdf[c] = [a[c] if a is not None else None for a in attrs]
            yield pdf

    return points_df.mapInPandas(enrich, schema=out_schema)
