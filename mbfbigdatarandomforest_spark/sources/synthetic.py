"""Deterministic FIXTURES.md-shaped synthetic inputs (seed=42) for the
election pipeline — used by the test suite and the demo runner.
Counties are non-overlapping grid boxes so the point-in-polygon join
has a trivially computable oracle.
"""

from __future__ import annotations

import numpy as np

GRID = 6  # 6x6 counties
N_STATES = 3
LON0, LAT0, CELL = -100.0, 30.0, 1.0
SEED = 42

PARTIES = ["DEMOCRAT", "REPUBLICAN", "LIBERTARIAN", "OTHER", ""]
BODY_TYPES = ["SUV"] * 40 + ["Sedan"] * 30 + ["Pickup Truck"] * 20 + ["Wagon", "Van"]
MAKES = ["ford"] * 30 + ["toyota"] * 30 + ["honda"] * 20 + ["bmw"] * 10 + ["saab", "lada"]


def county_name(i: int, j: int) -> str:
    return f"county {i}{j}"


def state_name(i: int) -> str:
    return f"state{i % N_STATES}"


def county_polygons() -> list[dict]:
    rows = []
    for i in range(GRID):
        for j in range(GRID):
            x0, y0 = LON0 + i * CELL, LAT0 + j * CELL
            x1, y1 = x0 + CELL, y0 + CELL
            wkt = (
                f"POLYGON(({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))"
            )
            rows.append(
                {
                    "state": state_name(i),
                    "county": county_name(i, j),
                    "geometry": wkt,
                }
            )
    return rows


def votes_precinct() -> list[dict]:
    """~75 % of counties have precinct votes; several precinct rows per
    (county, party) so the group-sum is non-trivial; '' party present."""
    rng = np.random.default_rng(SEED)
    rows = []
    for i in range(GRID):
        for j in range(GRID):
            if rng.random() < 0.25:
                continue  # county missing from the vote table → NULL ratio
            # mixed-case raw county names; lowered by the pipeline (F1)
            raw = county_name(i, j).title()
            for party in PARTIES:
                for _ in range(int(rng.integers(1, 4))):
                    rows.append(
                        {
                            "county_name": raw,
                            "party_simplified": party,
                            "votes": int(rng.integers(100, 5000)),
                        }
                    )
    return rows


def votes_state() -> list[dict]:
    rng = np.random.default_rng(SEED + 1)
    rows = []
    for year in (2016, 2020):
        for s in range(N_STATES):
            for party in ["DEMOCRAT", "REPUBLICAN", "LIBERTARIAN"]:
                rows.append(
                    {
                        "year": year,
                        "state": state_name(s).upper(),
                        "party_simplified": party,
                        "candidatevotes": str(int(rng.integers(10_000, 900_000))),
                    }
                )
    return rows


def listings(n: int = 4000) -> list[dict]:
    """Skewed county distribution, NULLs/outliers/rare levels per
    FIXTURES.md §4 generator guidance."""
    rng = np.random.default_rng(SEED + 2)
    # skew: a few metro counties get most listings
    cell_weights = rng.pareto(1.0, GRID * GRID) + 0.05
    cell_weights /= cell_weights.sum()
    cells = rng.choice(GRID * GRID, size=n, p=cell_weights)
    rows = []
    for k in range(n):
        ci, cj = divmod(int(cells[k]), GRID)
        lon = LON0 + ci * CELL + rng.random() * CELL
        lat = LAT0 + cj * CELL + rng.random() * CELL
        if rng.random() < 0.03:  # outside every county box
            lon, lat = LON0 - 5 - rng.random(), LAT0 - 5 - rng.random()
        hp = float(rng.integers(80, 500))
        rpm = int(rng.integers(3000, 7000))
        power = (
            f"{hp:.0f} hp @ {rpm:,} RPM" if rng.random() > 0.1 else f"{hp:.0f} hp"
        )
        rows.append(
            {
                "vin": f"VIN{k:08d}",
                "city": "somecity",
                "description": "a car",
                "dealer_zip": "00000",
                "main_picture_url": None if rng.random() < 0.5 else "http://img",
                "sp_name": "dealer",
                "transmission_display": "auto",
                "trim_name": "LX",
                "wheel_system_display": "AWD",
                "exterior_color": "red",
                "interior_color": "black",
                "major_options": None if rng.random() < 0.6 else "sunroof",
                "model_name": "modelx",
                "franchise_make": None if rng.random() < 0.8 else "oem",
                "listing_id": str(k),
                "sp_id": str(k),
                "trimId": str(k),
                "franchise_dealer": bool(rng.random() < 0.5),
                "latitude": lat,
                "longitude": lon,
                "back_legroom": None if rng.random() < 0.35 else f"{rng.random()*10+30:.1f}",
                "body_type": str(rng.choice(BODY_TYPES)) if rng.random() > 0.02 else "",
                "city_fuel_economy": (
                    None if rng.random() < 0.05
                    else float(rng.integers(10, 60)) if rng.random() > 0.02
                    else float(rng.integers(80, 120))  # outlier ≥70
                ),
                "engine_cylinders": "V6 24V GDI DOHC",
                "engine_type": "V6 Biturbo",
                "highway_fuel_economy": (
                    None if rng.random() < 0.05 else float(rng.integers(15, 55))
                ),
                "horsepower": (
                    None if rng.random() < 0.05
                    else hp if rng.random() > 0.02 else 900.0  # outlier ≥600
                ),
                "is_new": bool(rng.random() < 0.3),
                "length": float(rng.integers(150, 220)),
                "listed_date": (
                    f"2020-{int(rng.integers(2, 13)):02d}-{int(rng.integers(1, 28)):02d}"
                    if rng.random() > 0.1
                    else "2019-06-15"  # filtered out by the date cutoff
                ),
                "make_name": str(rng.choice(MAKES)),
                "maximum_seating": float(rng.choice([2, 5, 7, 8])),
                "mileage": (
                    None if rng.random() < 0.08
                    else float(rng.integers(0, 250_000)) if rng.random() > 0.02
                    else 400_000.0  # outlier ≥300k
                ),
                "power": power if rng.random() > 0.05 else None,
                "price": (
                    float(rng.integers(2_000, 150_000)) if rng.random() > 0.02
                    else 250_000.0  # outlier ≥200k
                ),
                "savings_amount": float(rng.integers(0, 5000)),
                "seller_rating": float(rng.random() * 5),
                "torque": float(rng.integers(100, 600)),
                "transmission": str(rng.choice(["A", "M", "CVT"])),
                "wheel_system": str(rng.choice(["AWD", "FWD", "RWD"])),
                "wheelbase": f"{rng.random()*40+90:.1f} in",
                "width": float(rng.integers(60, 90)),
                "year": float(rng.integers(1995, 2021)) if rng.random() > 0.01 else 1890.0,
            }
        )
    return rows
