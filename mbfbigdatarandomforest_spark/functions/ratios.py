"""Ratio arithmetic (SURVEY.md §2.8 F8).

The reference's headline scalar: ``DemRepRatio = DEM / (DEM + REP)``
(01_DataMerge.R:85-89 county level, :108-112 state level).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dem_rep_ratio(dem: Column | str, rep: Column | str) -> Column:
    d = F.col(dem) if isinstance(dem, str) else dem
    r = F.col(rep) if isinstance(rep, str) else rep
    # NULL when both are 0 (division by zero → NULL in Spark, matching
    # R's NaN propagation closely enough; engine rule: never Inf).
    return d / (d + r)
