"""String extraction scalar functions (SURVEY.md §2.8 F2/F3/F4).

The reference parses '"340 hp @ 6,000 RPM"' style strings with split +
tryCatch (02_DataCleaning.R:149-182); Spark's ``element_at`` already
returns NULL out-of-range, so no error handling is needed — all of these
stay inside whole-stage codegen (no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def token_at(col: Column | str, n: int, sep: str = " ") -> Column:
    """1-based nth whitespace token; NULL when out of range
    (F3 — replaces the reference's tryCatch at 02_DataCleaning.R:161-166)."""
    c = F.col(col) if isinstance(col, str) else col
    # try_element_at: NULL out-of-range under ANSI mode (Spark 4 default)
    return F.try_element_at(F.split(c, sep), F.lit(n))


def first_token(col: Column | str, sep: str = " ") -> Column:
    """F2 — '"106.3 in"' → '106.3'; '"V6 Biturbo"' → 'V6'."""
    return token_at(col, 1, sep)


def strip_chars(col: Column | str, chars: str = ",") -> Column:
    """F4 — remove literal characters (thousands separators,
    02_DataCleaning.R:166)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, f"[{chars}]", "")
