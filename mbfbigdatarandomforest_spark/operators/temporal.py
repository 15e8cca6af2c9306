"""Temporal join operators the reference lacks but a complete engine
needs (BASELINE.json north star; "as-of join, range join" class).

``asof_join`` — for each left row, the latest right row with
``right.ts <= left.ts`` within the same key group. Implemented as a
union + window scan, NOT a per-row subquery:

  tag left/right → union → single window over (key, ts) →
  last non-null right payload at or before each row → filter left rows.

One shuffle on the key (both inputs together), O(n log n) per
partition for the sort — the classic scalable formulation; a correlated
subquery would be O(n·m) per key, a broadcast loop would not scale past
small right sides.

``range_join`` — pairs (left, right) with |ts_l - ts_r| ≤ tolerance,
bucketed by time so the quadratic blow-up is bounded per bucket: join
on (key, time_bucket) for the bucket and its neighbor, then filter the
exact predicate. Bucket width = tolerance keeps each row in ≤2 buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on_keys: list[str],
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Latest-right-at-or-before-left join (trade/quote style)."""
    payload = right_cols or [
        c for c in right.columns if c not in on_keys and c != ts_col
    ]
    l_tag = left.withColumn("__side", F.lit(1))
    r_tag = right.select(
        *on_keys,
        ts_col,
        *[F.col(c).alias(f"{c}{suffix}") for c in payload],
    ).withColumn("__side", F.lit(0))

    # align schemas for the union
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in r_tag.columns:
        if c not in l_tag.columns:
            l_tag = l_tag.withColumn(c, F.lit(None).cast(dict(r_tag.dtypes)[c]))

    unioned = l_tag.unionByName(r_tag)
    # right rows sort BEFORE left rows at equal ts (side 0 < 1) so an
    # exactly-simultaneous right row is visible to the left row.
    w = (
        Window.partitionBy(*on_keys)
        .orderBy(ts_col, "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Pack the whole right payload into ONE struct and carry it forward
    # with a single last(ignorenulls): every payload value then comes
    # from the SAME (latest) right row. Per-column last() would mix
    # columns from different right rows whenever the latest right row
    # holds a NULL in one of them.
    packed = F.when(
        F.col("__side") == 0,
        F.struct(*[F.col(f"{c}{suffix}").alias(c) for c in payload]),
    )
    out = unioned.withColumn(
        "__asof", F.last(packed, ignorenulls=True).over(w)
    )
    for c in payload:
        out = out.withColumn(f"{c}{suffix}", F.col("__asof")[c])
    return out.filter(F.col("__side") == 1).drop("__side", "__asof")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on_keys: list[str],
    ts_col: str = "ts",
    tolerance_seconds: int = 60,
    suffix: str = "_r",
) -> DataFrame:
    """All (left, right) pairs within ``tolerance_seconds``, bucketed so
    each row joins against ≤2 time buckets instead of the whole key
    group."""
    tol = tolerance_seconds
    payload = [c for c in right.columns if c not in on_keys and c != ts_col]
    ts_r = f"{ts_col}{suffix}"

    def bucketize(df: DataFrame, col: str, offsets: list[int]) -> DataFrame:
        b = F.floor(F.col(col).cast("double") / tol)
        arr = F.array(*[(b + o).cast("long") for o in offsets])
        return df.withColumn("__bucket", F.explode(arr))

    l_b = bucketize(left, ts_col, [0])
    renamed = right.select(
        *on_keys,
        F.col(ts_col).alias(ts_r),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload],
    )
    r_b = bucketize(renamed, ts_r, [-1, 0, 1])

    joined = l_b.join(r_b, on_keys + ["__bucket"])
    exact = (
        F.abs(F.col(ts_col).cast("double") - F.col(ts_r).cast("double")) <= tol
    )
    # No distinct needed: the left row lives in exactly one bucket, so a
    # (left, right) pair can match in at most one bucket. A trailing
    # distinct would also silently collapse legitimate duplicate input
    # rows into one output pair.
    return joined.filter(exact).drop("__bucket")
