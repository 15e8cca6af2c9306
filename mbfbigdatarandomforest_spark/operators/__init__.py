from .cleaning import (
    collapse_rare_levels,
    drop_high_na_columns,
    empty_to_null,
    na_share,
    null_keeping_filter,
)
from .rollup import decile_bins, threshold_rollup

__all__ = [
    "collapse_rare_levels",
    "drop_high_na_columns",
    "empty_to_null",
    "na_share",
    "null_keeping_filter",
    "decile_bins",
    "threshold_rollup",
]
