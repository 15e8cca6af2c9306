"""Streaming exact deduplication — the Structured Streaming twin of
``operators.dedup.exact_dedup`` for continuous ingestion pipelines.

``dropDuplicatesWithinWatermark`` on the normalized-text fingerprint
keeps per-key state only until the watermark passes it, so state is
bounded by (arrival rate × watermark horizon) instead of growing with
the full corpus — the property that makes streaming dedup viable at
100 TB/day ingest. Exactness contract: duplicates arriving FARTHER
apart than the watermark horizon are not collapsed (they are separate
"epochs" of the same content); batch ``exact_dedup`` remains the
full-history reconciliation pass.

Spark reference: Structured Streaming programming guide, "Streaming
Deduplication" (dropDuplicates / dropDuplicatesWithinWatermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.text import fingerprint


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-seen document per fingerprint within the watermark horizon.

    Adds the ``fp`` column (md5 of normalized text — identical to the
    batch operator) and drops subsequent duplicates while their key is
    still inside the watermark window."""
    return (
        stream.withColumn("fp", fingerprint(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )


def run_dedup_available_now(
    spark,
    src_dir: str,
    schema,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    query_name: str = "dedup_stream",
) -> DataFrame:
    """Drain a parquet-directory stream through the dedup operator into
    an in-memory sink (test/debug harness; production writes a real
    sink)."""
    stream = spark.readStream.schema(schema).parquet(src_dir)
    deduped = streaming_exact_dedup(stream, text_col, ts_col, watermark)
    q = (
        deduped.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
