"""Cleaning operators (SURVEY.md §2.2 P1/P5/P9, §2.4 A7/A8, §2.8 F7).

Scale notes: every operator here is a single distributed pass (one
partial-aggregable agg or a codegen'd projection). Nothing collects row
data to the driver — only O(#columns) or O(#levels) summaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def empty_to_null(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """P9 — '' → NULL on string columns (02_DataCleaning.R:35).
    Prefer doing this at the CSV scan via nullValue=''; this operator
    exists for already-loaded data."""
    targets = cols or [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    out = df
    for c in targets:
        out = out.withColumn(c, F.when(F.col(c) == "", None).otherwise(F.col(c)))
    return out


def na_share(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """A7 — per-column NULL share in ONE pass (02_DataCleaning.R:38-41).
    Returns a single-row frame, one double column per input column."""
    targets = cols or df.columns
    aggs = [
        (F.sum(F.col(c).isNull().cast("int")) / F.count(F.lit(1))).alias(c)
        for c in targets
    ]
    return df.agg(*aggs)


def drop_high_na_columns(
    df: DataFrame, threshold: float = 0.20, keep: tuple[str, ...] = ()
) -> DataFrame:
    """P1 — drop columns whose NULL share exceeds ``threshold``, except
    ``keep`` (02_DataCleaning.R:44-48 keeps DemRepRatio). One agg job to
    decide, then a plan-level projection (free under column pruning)."""
    shares = na_share(df).first().asDict()
    drop = [c for c, s in shares.items() if s is not None and s > threshold and c not in keep]
    return df.drop(*drop)


def null_keeping_filter(df: DataFrame, predicate: Column, col: str) -> DataFrame:
    """P5 — range predicate that KEEPS NULLs (02_DataCleaning.R:207-214).
    Spark's 3-valued logic silently drops NULL rows on a bare comparison;
    the reference ORs is.na explicitly and so do we."""
    return df.filter(predicate | F.col(col).isNull())


def collapse_rare_levels(
    df: DataFrame,
    cols: list[str],
    threshold: float = 0.01,
    other_label: str = "Other",
) -> DataFrame:
    """F7 — replace factor levels with frequency < threshold by 'Other'
    (02_DataCleaning.R:243-261, addFactorOther).

    Scale design: level cardinality is small even at 100 TB (car makes,
    body types, ...), so level frequencies are a cheap partially-
    aggregated groupBy; the rare-level lists are collected (O(#levels))
    and applied as literal ``isin`` predicates — no second shuffle, no
    broadcast join, stays in whole-stage codegen. NULLs are left NULL
    (they are not a level).

    ALL columns are profiled in ONE job: the frame is melted to
    (column, level) pairs and grouped once, and the row total rides
    along as a grouping-free aggregate via the same scan (grouping
    sets), instead of 1 + #cols separate jobs."""
    if not cols:
        # explode over an empty array literal is a VOID struct —
        # AnalysisException — and there is nothing to collapse anyway
        return df
    # grouping sets: one grouped row-set per target column plus the
    # global () group for the total — a single scan, one shuffle
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"), F.col(c).cast("string").alias("level")
                    )
                    for c in cols
                ]
            )
        ).alias("cl")
    ).select("cl.col", "cl.level")
    counts = melted.groupBy("col", "level").agg(
        F.count(F.lit(1)).alias("n")
    ).collect()
    # every input row contributes exactly one melted row per column
    total = sum(r["n"] for r in counts) // len(cols) if counts else 0
    rare_by_col: dict[str, list] = {c: [] for c in cols}
    for r in counts:
        if r["level"] is not None and total and r["n"] / total < threshold:
            rare_by_col[r["col"]].append(r["level"])
    out = df
    for c, rare in rare_by_col.items():
        if rare:
            out = out.withColumn(
                c,
                F.when(
                    F.col(c).cast("string").isin(rare), F.lit(other_label)
                ).otherwise(F.col(c)),
            )
    return out
