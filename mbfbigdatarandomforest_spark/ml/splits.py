"""Deterministic train/test tagging for the ML routes.

``DataFrame.randomSplit`` guarantees determinism by locally SORTING
every partition in every branch and re-sampling the same stream per
split — on a wide feature frame that is two extra full sorts plus a
double scan, and the resulting split is still a function of the
PARTITIONING (rerun with different file splits → different held-out
set). The ML paths instead tag each row by the md5 of its feature
values (``operators.sampling.hash_split`` underneath): one appended
codegen column, no sort, no extra scan, and the split is a pure
function of the row — stable across engines, cluster sizes and reruns.
This mirrors the judgement SURVEY §5.2.3 already made for M1/M2:
the reference's R RNG cannot be reproduced anyway; what must be
preserved is the 75/25 contract and determinism, and the hash tag
strengthens the latter. ``split="random"`` keeps the randomSplit
behavior for callers that want MLlib-idiomatic sampling.

Duplicate feature rows share a key and therefore a side — assignments
are not row-independent for exact duplicates. For (near-)continuous
features duplicates are measure-zero; for heavily duplicated frames
pass an explicit id column first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.sampling import hash_split

#: Unit separator — cannot appear in cast-to-string numerics and is
#: vanishingly unlikely in categorical levels; prevents ("ab","c") and
#: ("a","bc") from colliding into one key.
_SEP = "\x1f"


def row_key(cols: list[str]) -> Column:
    """A deterministic per-row key from the (non-NULL, post-na.drop)
    column values."""
    return F.concat_ws(_SEP, *[F.col(c).cast("string") for c in cols])


def tag_split(
    df: DataFrame,
    cols: list[str],
    train_fraction: float,
    split_col: str = "__split",
    salt: str = "mlsplit",
    val_fraction: float = 0.0,
) -> DataFrame:
    """Append ``split_col`` ∈ {train[, val], test} keyed on the row's
    feature values. One codegen column — zero shuffle, zero sort."""
    weights = {"train": train_fraction}
    if val_fraction > 0:
        weights["val"] = val_fraction
    weights["test"] = 1.0 - train_fraction - val_fraction
    out = hash_split(
        df.withColumn("__rk", row_key(cols)),
        weights,
        key_col="__rk",
        salt=salt,
        split_col=split_col,
    )
    return out.drop("__rk")
