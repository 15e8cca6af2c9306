"""Bucketed tables for co-located joins (SURVEY.md §4.1 scale posture).

At 100 TB, the dominant recurring cost is the shuffle of fact⋈fact
joins (lineitem⋈orders on the order key). Writing both sides bucketed
by the join key removes that shuffle permanently: Spark's scan reports
the bucketing as an existing hash-partitioning, so SortMergeJoin's
Exchange disappears on every subsequent query.

Trade-offs encoded here:
- bucket count must match on both sides and should be a multiple of
  cluster parallelism (default 32 locally; hundreds on a real cluster);
- bucketed writes go through ``saveAsTable`` (the file-based catalog) —
  plain ``.parquet()`` cannot record bucketing metadata;
- one-time cost: each write shuffles once so every bucket is a single
  file per partition-writer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    writer = writer.sortBy(sort_col or bucket_col)
    writer.format("parquet").saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs the
    planner elides both Exchanges (assert via plan-shape tests)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
