"""JSON field extraction over string columns (F-family extension).

Event payloads routinely carry semi-structured props as JSON strings;
extracting typed fields is expression-level work that must stay inside
whole-stage codegen (``get_json_object`` is a JVM expression — no UDF,
no Python). For repeated multi-field extraction prefer one
``from_json`` with an explicit schema over N ``get_json_object`` calls
(one parse instead of N); for a single field the two plans cost the
same and ``get_json_object`` needs no schema object.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def json_long_field(col, field: str) -> Column:
    """Extract ``$.field`` as a nullable LongType (missing key, null,
    or non-numeric → NULL). ``try_cast``, not ``cast``: under ANSI mode
    (the Spark 4 default) a plain cast THROWS on non-numeric strings —
    one malformed payload would kill the whole job."""
    c = col if not isinstance(col, str) else F.col(col)
    return F.get_json_object(c, f"$.{field}").try_cast("long")


def json_string_field(col, field: str) -> Column:
    """Extract ``$.field`` as a string (unquoted scalar value)."""
    c = col if not isinstance(col, str) else F.col(col)
    return F.get_json_object(c, f"$.{field}")
