"""Roll-up operators (SURVEY.md §2.3 J5, §2.4 A2/A3, §2.5 W1).

J5 is the reference's most fragile construct: it groups twice and aligns
count and mean tables BY ROW POSITION (03_LinearRegression.R:133-145).
The engine deliberately fuses both into one keyed aggregation — same
semantics the reference *means*, one shuffle, no order dependence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def threshold_rollup(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    min_count: int = 100,
    avg_alias: str = "forecast",
    count_alias: str = "n_obs",
    exact_decimal: bool = False,
) -> DataFrame:
    """Group → (mean, count) → keep groups with count > min_count.
    One shuffle; partial aggregation does the heavy lifting map-side.

    ``exact_decimal=True`` computes the mean as an exact DECIMAL sum
    divided by the count — summation-order independent, for oracle
    comparisons and reproducible reports."""
    if exact_decimal:
        mean = F.sum(F.col(value_col).cast("decimal(28,8)")).cast("double") / F.count(
            F.lit(1)
        )
    else:
        mean = F.avg(value_col)
    return (
        df.groupBy(*keys)
        .agg(
            mean.alias(avg_alias),
            F.count(F.lit(1)).alias(count_alias),
        )
        .filter(F.col(count_alias) > min_count)
    )


def salted_rollup(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    min_count: int = 100,
    avg_alias: str = "forecast",
    count_alias: str = "n_obs",
    salt_buckets: int = 16,
    exact_sums: bool = False,
) -> DataFrame:
    """Skew-resistant variant of ``threshold_rollup``.

    County cardinality is skewed (a few metro counties hold a large
    share of listings — SURVEY.md §4.2); when one key exceeds a single
    task's capacity even after AQE, salt it: stage 1 aggregates on
    (key, salt) — the hot key spreads over ``salt_buckets`` tasks —
    stage 2 merges the partials per key. sum/count compose exactly, so
    the result is identical to the unsalted rollup (property-tested).
    Cost: a second (tiny) shuffle over #keys × salt rows.

    ``exact_sums=True`` carries DECIMAL(28,8) sums through BOTH stages:
    double partials depend on which salt bucket each row landed in,
    decimal partials compose exactly — the mode that makes the salted
    plan value-hash-identical to an unsalted oracle (and to itself
    across different ``salt_buckets``)."""
    salted = df.withColumn(
        "__salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    value = F.col(value_col)
    if exact_sums:
        value = value.cast("decimal(28,8)")
    partial = salted.groupBy(*keys, "__salt").agg(
        F.sum(value).alias("__sum"),
        F.count(F.lit(1)).alias("__cnt"),
    )
    total = F.sum("__sum")
    if exact_sums:
        total = total.cast("double")
    return (
        partial.groupBy(*keys)
        .agg(
            (total / F.sum("__cnt")).alias(avg_alias),
            F.sum("__cnt").alias(count_alias),
        )
        .filter(F.col(count_alias) > min_count)
    )


def decile_bins(
    df: DataFrame, col: str, n: int = 10, tiebreak: list[str] | None = None
) -> DataFrame:
    """W1 — quantile binning for the choropleth
    (05_OutcomeAndVisualization.R:129-130).

    ntile needs a global sort → single-partition window. That is fine
    here because it runs on the *county-level* table (≤3k rows at any
    fact scale). For fact-scale binning use ``approx_quantile_bins``."""
    order = [F.col(col)] + [F.col(c) for c in (tiebreak or [])]
    w = Window.orderBy(*order)
    return df.withColumn("decile", F.ntile(n).over(w))


def approx_quantile_bins(
    df: DataFrame, col: str, n: int = 10, rel_err: float = 0.001
) -> DataFrame:
    """Scale path for W1: approxQuantile breakpoints (GK sketch, one
    pass, no global sort) + a codegen'd CASE — correct to rel_err, runs
    on arbitrarily large inputs."""
    probs = [i / n for i in range(1, n)]
    splits = df.approxQuantile(col, probs, rel_err)
    bucket = None
    for i, s in enumerate(splits, start=1):
        cond = F.col(col) <= F.lit(s)
        bucket = F.when(cond, F.lit(i)) if bucket is None else bucket.when(cond, F.lit(i))
    bucket = (bucket.otherwise(F.lit(n)) if bucket is not None else F.lit(1)).alias("decile")
    return df.withColumn("decile", bucket)
