from .ratios import dem_rep_ratio
from .strings import first_token, strip_chars, token_at
from .scaling import zscore_params, zscore_apply, zscore_invert

__all__ = [
    "dem_rep_ratio",
    "first_token",
    "strip_chars",
    "token_at",
    "zscore_params",
    "zscore_apply",
    "zscore_invert",
]
