"""Deterministic ML split tagging (ml/splits.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from conftest import SF_DIR_SMALL
from mbfbigdatarandomforest_spark.ml.splits import tag_split


def _feature_frame(spark):
    from mbfbigdatarandomforest_spark.plans.ml_queries import _lineitem_features

    cols = [
        "label", "p_brand", "p_type",
        "l_quantity", "l_discount", "l_tax", "p_retailprice",
    ]
    return _lineitem_features(spark, SF_DIR_SMALL).na.drop(subset=cols), cols


def test_proportions_within_5_sigma(spark):
    df, cols = _feature_frame(spark)
    n = df.count()
    tagged = tag_split(df, cols, 0.75)
    n_train = tagged.filter(F.col("__split") == "train").count()
    sigma = math.sqrt(n * 0.75 * 0.25)
    assert abs(n_train - 0.75 * n) <= 5 * sigma


def test_partition_invariance(spark):
    """The property randomSplit cannot give: identical assignment under
    any repartitioning."""
    df, cols = _feature_frame(spark)
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
    a = {
        r["k"]: r["__split"]
        for r in tag_split(df, cols, 0.75).select(key.alias("k"), "__split").collect()
    }
    b = {
        r["k"]: r["__split"]
        for r in tag_split(df.repartition(17), cols, 0.75)
        .select(key.alias("k"), "__split")
        .collect()
    }
    assert a == b


def test_three_way_split_covers_everything(spark):
    df, cols = _feature_frame(spark)
    tagged = tag_split(df, cols, 0.6, val_fraction=0.2)
    counts = {
        r["__split"]: r["n"]
        for r in tagged.groupBy("__split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == df.count()


def test_separator_prevents_boundary_collisions(spark):
    """('ab','c') and ('a','bc') must be able to land in different
    splits — a plain concat would force them into one."""
    df = spark.createDataFrame(
        [("ab", "c"), ("a", "bc")], "x string, y string"
    )
    rows = tag_split(df, ["x", "y"], 0.5).collect()
    from mbfbigdatarandomforest_spark.ml.splits import row_key

    keys = {
        r["k"]
        for r in df.select(row_key(["x", "y"]).alias("k")).collect()
    }
    assert len(keys) == 2  # distinct keys even though concat collides
    assert len(rows) == 2


def test_seed_varies_the_split(spark):
    """seed reaches the hash salt: different seeds must produce
    genuinely different (still deterministic) splits."""
    df, cols = _feature_frame(spark)
    a = [r["__split"] for r in tag_split(df, cols, 0.75, salt="mlsplit1").collect()]
    b = [r["__split"] for r in tag_split(df, cols, 0.75, salt="mlsplit2").collect()]
    assert a != b
    assert a == [
        r["__split"] for r in tag_split(df, cols, 0.75, salt="mlsplit1").collect()
    ]
