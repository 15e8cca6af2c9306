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

Skew: a leading-column value holding >1/p of the mass is detected from
the quantile sketch itself (a heavy hitter surfaces as a REPEATED cut)
and split into sub-buckets on the SECOND order column's quantiles —
monotone w.r.t. the full ordering, so the composed index stays exact.
With a single order column there is no second key to split on and the
hot value's bucket stays hot (ordering among equal values would be
ambiguous anyway — the unique-key contract above implies ≥2 columns
whenever the leading column repeats).
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

    Skew hardening: a value spanning multiple quantiles comes back
    REPEATED in the sketch — each repeat ≈ 1/p of the table sitting on
    that single value. When a second order column exists, such hot
    values are sub-bucketed on its quantiles (one extra
    ``percentile_approx`` aggregate over just the hot slices), so the
    per-task partition stays ≈ n/p even at 80 %+ single-value skew.
    Sub-buckets follow the second column's order within the hot value,
    so monotonicity — and hence exactness — is preserved.
    """
    spark = df.sparkSession
    p = num_buckets or spark.sparkContext.defaultParallelism
    bucketed = _assign_buckets(df, order_cols, p, rel_err)
    w_local = Window.partitionBy("__bkt", "__sub").orderBy(
        *[F.col(c) for c in order_cols]
    )
    local = bucketed.withColumn("__rn", F.row_number().over(w_local))

    counts = bucketed.groupBy("__bkt", "__sub").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    w_off = Window.orderBy("__bkt", "__sub").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__bkt",
        "__sub",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
    )
    return (
        local.join(F.broadcast(offsets), ["__bkt", "__sub"])
        .withColumn(idx_col, (F.col("__rn") + F.col("__off")).cast("long"))
        .drop("__bkt", "__sub", "__rn")
    )


def global_prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    weight_col: str,
    out_col: str = "prefix_sum",
    num_buckets: int | None = None,
    rel_err: float = 0.001,
) -> DataFrame:
    """EXCLUSIVE global running sum of ``weight_col`` by ``order_cols``
    — ``SUM(w) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING TO 1
    PRECEDING)`` — without the single-partition window that expression
    plans. Same construction as :func:`global_row_number`: quantile
    buckets on the leading order column (hot values sub-bucketed),
    a bucket-local running sum, plus per-bucket total offsets from a
    tiny broadcast frame.

    Weights are accumulated as BIGINT, so results are exact and
    order-independent for integral weights (the token-count use case);
    fractional weights would need the decimal treatment — refused here
    (explicit cast error) rather than silently reordered.

    First row (by the global ordering) gets 0. Callers needing the
    inclusive sum add ``weight_col`` back.
    """
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    wt = df.schema[weight_col].dataType
    if not isinstance(wt, (ByteType, ShortType, IntegerType, LongType)):
        raise TypeError(
            f"global_prefix_sum needs an integral weight column; "
            f"{weight_col} is {wt.simpleString()}"
        )
    spark = df.sparkSession
    p = num_buckets or spark.sparkContext.defaultParallelism
    w = F.col(weight_col).cast("long")
    bucketed = _assign_buckets(df, order_cols, p, rel_err)
    w_local = (
        Window.partitionBy("__bkt", "__sub")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn(
        "__lps", F.coalesce(F.sum(w).over(w_local), F.lit(0))
    )
    totals = bucketed.groupBy("__bkt", "__sub").agg(F.sum(w).alias("__tot"))
    w_off = Window.orderBy("__bkt", "__sub").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "__bkt",
        "__sub",
        F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias("__off"),
    )
    return (
        local.join(F.broadcast(offsets), ["__bkt", "__sub"])
        .withColumn(out_col, (F.col("__lps") + F.col("__off")).cast("long"))
        .drop("__bkt", "__sub", "__lps")
    )


def _sampled_string_cuts(
    df: DataFrame, col_name: str, p: int, n_sample: int = 8192, seed: int = 42
) -> list[str]:
    """p-quantile cut points for a STRING order column from a bounded
    driver-side sample (the `_fit_centroids_sampled` pattern: one scan,
    ≤ ``n_sample`` strings on the driver). The cut list may repeat a
    value — a repeat at multiple quantile positions marks a heavy
    hitter, exactly like a repeated ``approxQuantile`` cut.

    Correctness NEVER depends on the sample: the bucket id is a pure
    monotone function of the row value vs these literal cuts (direct
    string comparison — Spark orders strings by UTF-8 bytes), so a
    stale or unlucky sample degrades bucket BALANCE, not results —
    the same contract as the numeric quantile sketch. This also makes
    the bucketing robust where numeric proxies are not: there is no
    ANSI cast to throw on arbitrary ids, no shared-prefix funnel, and
    a single outlier id merely occupies an end bucket."""
    sampled = (
        df.select(col_name)
        .dropna()
        .rdd.map(lambda r: r[0])
        .takeSample(False, n_sample, seed)
    )
    vals = sorted(sampled)
    if not vals:
        return []
    return [vals[(i * len(vals)) // p] for i in range(1, p)]


def _assign_buckets(
    df: DataFrame, order_cols: list[str], p: int, rel_err: float
) -> DataFrame:
    """Attach ``__bkt``/``__sub`` ordering-monotone bucket columns
    (see ``global_row_number``). Factored out so the skew property test
    can assert per-bucket mass directly.

    Numeric lead columns bucket on ``approxQuantile`` cuts; string
    lead columns (document ids are usually strings) bucket on sampled
    string cut points compared directly as strings — monotone for ANY
    value by construction (see ``_sampled_string_cuts``). Rows with a
    NULL lead value match no cut and land in bucket 0, consistent with
    Spark's NULLS FIRST ordering."""
    from pyspark.sql.types import StringType

    lead = order_cols[0]
    lead_is_string = isinstance(df.schema[lead].dataType, StringType)
    if lead_is_string:
        lead_expr = F.col(lead)
        raw_cuts = _sampled_string_cuts(df, lead, p)
    else:
        lead_expr = F.col(lead).cast("double")
        probs = [i / p for i in range(1, p)]
        raw_cuts = df.select(lead_expr.alias("__q")).approxQuantile(
            "__q", probs, rel_err
        )
    cuts = sorted(set(raw_cuts))
    if cuts:
        cut_arr = F.array(*[F.lit(c) for c in cuts])
        bucket = F.size(F.filter(cut_arr, lambda c: c < lead_expr))
    else:
        bucket = F.lit(0)
    # heavy hitters: value v repeated m times among the cuts holds
    # ~m/p of the mass → split its rows into m+1 sub-buckets on the
    # second order column
    hot: dict = {}
    for c in raw_cuts:
        hot[c] = hot.get(c, 0) + 1
    hot = {v: m for v, m in hot.items() if m >= 2}
    sub_bucket = F.lit(0)
    second_splittable = (
        len(order_cols) > 1
        and not isinstance(
            df.schema[order_cols[1]].dataType, StringType
        )  # a string second column has no percentile grid to split on;
        # the hot bucket then stays hot (balance fallback — exactness
        # is unaffected, the local window still sorts fully)
    )
    if hot and second_splittable:
        second = order_cols[1]
        lead_d = lead_expr
        second_d = F.col(second).cast("double")
        # ONE aggregate job fits all hot values' sub-cuts (not one
        # approxQuantile call per value)
        grids = {
            v: [i / (m + 1) for i in range(1, m + 1)] for v, m in hot.items()
        }
        rows = (
            df.filter(lead_d.isin(*list(hot)))
            .groupBy(lead_d.alias("__v"))
            .agg(
                F.percentile_approx(
                    second_d,
                    F.array(
                        *[
                            F.lit(q)
                            for q in [i / 100 for i in range(1, 100)]
                        ]
                    ),
                    F.lit(int(1 / rel_err)),
                ).alias("__qs")
            )
            .collect()
        )
        for r in rows:
            v = r["__v"]
            m = hot.get(v)
            if m is None:
                continue
            # pick this value's m sub-cuts from the shared 99-point grid
            pct = r["__qs"]
            sub_cuts = sorted(
                {pct[min(98, max(0, round(q * 100) - 1))] for q in grids[v]}
            )
            sub_arr = F.array(*[F.lit(float(c)) for c in sub_cuts])
            sub_bucket = F.when(
                lead_d == F.lit(v),
                F.size(F.filter(sub_arr, lambda c: c < second_d)),
            ).otherwise(sub_bucket)
    return df.withColumn("__bkt", bucket).withColumn("__sub", sub_bucket)


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
