"""Test shim: the synthetic election fixtures live in the package
(sources/synthetic.py) so the demo runner can use them too."""

from mbfbigdatarandomforest_spark.sources.synthetic import *  # noqa: F401,F403
from mbfbigdatarandomforest_spark.sources.synthetic import (  # noqa: F401
    CELL,
    GRID,
    LON0,
    LAT0,
    N_STATES,
    county_name,
    county_polygons,
    listings,
    state_name,
    votes_precinct,
    votes_state,
)
