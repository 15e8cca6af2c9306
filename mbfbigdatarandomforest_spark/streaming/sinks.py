"""Exactly-once streaming sinks (Structured Streaming guide,
"foreachBatch" + "Fault Tolerance Semantics").

Structured Streaming guarantees each micro-batch id is REPLAYED with
identical content after a failure, but plain appends would duplicate
the replayed rows. The standard vanilla-parquet answer is the
idempotent partition-overwrite pattern implemented here: every batch
writes (dynamic-overwrite) into its own ``__batch_id`` partition, so a
replay of batch N replaces partition N instead of appending — end to
end the sink is effectively exactly-once without a transactional table
format. (With Delta/Iceberg available, ``MERGE`` on a key is the
richer upsert; the partition-overwrite pattern is the one that needs
nothing but parquet.)

Scale notes: one partition directory per micro-batch keeps the commit
unit bounded by batch size; downstream readers see whole batches or
nothing (parquet dir move is atomic per partition on HDFS-like stores).
Compact small batch partitions periodically with a plain batch job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_batch_idempotent(batch_df: DataFrame, batch_id: int, path: str) -> None:
    """The foreachBatch body: dynamic-overwrite this batch's partition.

    Safe to call twice with the same ``batch_id`` (the replay case) —
    the second call replaces the first's rows exactly."""
    (
        batch_df.withColumn("__batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch_id")
        .parquet(path)
    )


def exactly_once_parquet_sink(
    stream: DataFrame,
    path: str,
    checkpoint_dir: str,
    query_name: str = "exactly_once_sink",
    available_now: bool = True,
):
    """Attach the idempotent foreachBatch sink to a streaming frame.

    Returns the started StreamingQuery; with ``available_now`` the
    caller can ``awaitTermination()`` to drain bounded sources (the
    test harness pattern used across this package)."""
    writer = (
        stream.writeStream.queryName(query_name)
        .foreachBatch(lambda df, bid: write_batch_idempotent(df, bid, path))
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_batch_partitions(
    spark,
    path: str,
    out_path: str,
    target_file_mb: int = 128,
    drop_batch_col: bool = True,
) -> int:
    """The periodic batch job that compacts an append-mode sink's many
    small per-batch partitions into right-sized parquet files.

    Streaming sinks trade file size for latency (one partition dir per
    micro-batch); this job restores scan efficiency: read everything,
    coalesce to ~``target_file_mb`` files (estimated from input bytes),
    write ONE plain parquet dataset. Run it on a schedule; readers
    switch to ``out_path`` atomically (or the caller swaps directories).
    Returns the number of output files requested. Do NOT run it against
    a complete-mode snapshot sink — there, only the latest batch
    partition is current. (File sizes come from the local filesystem;
    on an object store, size the coalesce from the catalog's table
    stats instead.)"""
    import math
    import pathlib

    df = spark.read.parquet(path)
    if drop_batch_col and "__batch_id" in df.columns:
        df = df.drop("__batch_id")
    total_bytes = sum(
        f.stat().st_size for f in pathlib.Path(path).rglob("*.parquet")
    )
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    df.coalesce(n_files).write.mode("overwrite").parquet(out_path)
    return n_files
