"""Scale-safe global window primitives.

``Window.orderBy`` with no partition spec funnels the whole table
through ONE task (Spark warns "Moving all data to a single partition").
Fine at test scale; the first OOM at 100 TB. These primitives express
the same semantics with bounded per-task state:

- ``global_row_number``: bucket rows by explicit quantile cuts of the
  leading order column, take a local ``row_number`` per bucket, then
  add per-bucket cumulative offsets (tiny frame, broadcast). No global
  sort, no single-task funnel.

  The bucket id must be a PURE FUNCTION of the row value — NOT
  ``repartitionByRange`` + ``spark_partition_id()``: range boundaries
  are re-sampled per exchange evaluation, so the offsets subtree and
  the row-number subtree can disagree on partition membership and
  produce duplicate/skipped indexes. Explicit cut literals make every
  subtree agree by construction.

- ``ntile_from_rn``: NTILE(k) is a pure function of (row_number, n) —
  first ``n % k`` buckets get ``floor(n/k)+1`` rows, the rest
  ``floor(n/k)`` — so a scalable row number plus one 1-row count
  aggregate (broadcast cross join) reproduces it exactly.

Determinism: callers must order by a key set that is unique per row
(e.g. include the primary key as tiebreak); the assignment is then
independent of bucketing.

Skew caveat: bucket widths follow the quantile sketch of the leading
order column; a single value holding >1/p of the mass keeps its bucket
that large (same caveat as any range partitioning). Add a
higher-cardinality leading column for such keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    idx_col: str = "idx",
    num_buckets: int | None = None,
    rel_err: float = 0.001,
) -> DataFrame:
    """Global 1-based row number by ``order_cols`` without a
    single-partition window.

    Plan: one approxQuantile pass sizes ``num_buckets`` cuts on the
    leading order column (cast to double); each row's bucket is the
    count of cuts ≤ its value (a codegen'd expression over a literal
    array — identical in every subtree); ``row_number`` runs per
    bucket; bucket offsets come from a count aggregate whose cumulative
    window touches ≤ num_buckets rows.

    Rows equal on the leading column always share a bucket, so the
    bucketing is monotone w.r.t. the full ordering and the composed
    index equals the global ``ROW_NUMBER() OVER (ORDER BY ...)`` for
    any unique order key.
    """
    spark = df.sparkSession
    p = num_buckets or spark.sparkContext.defaultParallelism
    lead = order_cols[0]
    probs = [i / p for i in range(1, p)]
    cuts = sorted(
        set(
            df.select(F.col(lead).cast("double").alias("__q"))
            .approxQuantile("__q", probs, rel_err)
        )
    )
    if cuts:
        cut_arr = F.array(*[F.lit(float(c)) for c in cuts])
        bucket = F.size(
            F.filter(cut_arr, lambda c: c < F.col(lead).cast("double"))
        )
    else:
        bucket = F.lit(0)
    bucketed = df.withColumn("__bkt", bucket)
    w_local = Window.partitionBy("__bkt").orderBy(*[F.col(c) for c in order_cols])
    local = bucketed.withColumn("__rn", F.row_number().over(w_local))

    counts = bucketed.groupBy("__bkt").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__bkt", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off")
    )
    return (
        local.join(F.broadcast(offsets), "__bkt")
        .withColumn(idx_col, (F.col("__rn") + F.col("__off")).cast("long"))
        .drop("__bkt", "__rn")
    )


def ntile_from_rn(rn: Column, n: Column, k: int) -> Column:
    """Exact NTILE(k) from a 1-based row number ``rn`` and total count
    ``n`` (both Columns; ``n`` typically from a broadcast 1-row agg)."""
    small = F.floor(n / k)
    large = small + 1
    r = n % k  # first r buckets get `large` rows
    threshold = r * large
    in_large = rn <= threshold
    return (
        F.when(in_large, F.floor((rn - 1) / large) + 1)
        .otherwise(r + F.floor((rn - threshold - 1) / small) + 1)
        .cast("long")
    )
