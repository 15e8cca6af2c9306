"""Structured Streaming variants of the batch aggregations
(SURVEY.md §2.12 — an extension; the reference is pure batch).

The same county-rollup skeleton (group → agg) expressed over an
unbounded source: tumbling windows + watermark for late data, so state
is bounded and the job runs forever at any input rate. The batch twin is
``plans.relational.events_hourly_rollup`` — identical semantics over the
same table, which the tests exploit (availableNow over the parquet dir
must equal the batch result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

def _events_schema(ts_type) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-based streaming source over the events parquet directory.
    In production this would be Kafka/Kinesis; the transformation layer
    below is source-agnostic.

    Streaming sources need an explicit schema, and the generator has
    shipped ``ts`` as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across
    testdata regenerations — so probe the on-disk type with one batch
    footer read at stream setup (a one-time cost), then normalize to
    tz-aware TIMESTAMP exactly like ``sources.catalog._load_events``."""
    from pyspark.sql.types import TimestampNTZType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        ts_type = spark.read.parquet(path).schema["ts"].dataType
    except Exception:
        # Empty or not-yet-created source directory — a legal state for
        # a file-streaming source (files arrive later). Fall back to the
        # nanos-as-long encoding the generator has shipped most often;
        # the normalization below handles it.
        ts_type = LongType()
    stream = (
        spark.readStream.schema(_events_schema(ts_type))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    if isinstance(ts_type, LongType):
        return stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if isinstance(ts_type, TimestampNTZType):
        return stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def windowed_rollup(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window count/sum per event_type with a watermark bounding
    state (late rows beyond the watermark are dropped — the streaming
    trade-off the batch path doesn't have)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_stream_interval_join(
    errors: DataFrame,
    clicks: DataFrame,
    max_gap_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream join: each error event pairs with the same user's
    click events from the preceding ``max_gap_seconds`` window.

    Both sides carry watermarks so Spark can bound the join state (rows
    older than watermark+gap are evicted). NOTE: Spark does NOT reject
    an unbounded inner stream-stream join — it runs and accumulates
    state forever (verified experimentally); only outer joins demand
    watermarks. The watermark + range condition here is therefore the
    difference between bounded state and an eventual OOM, not a
    convenience."""
    e = (
        errors.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("e_user"),
            F.col("event_id").alias("error_id"),
            F.col("ts").alias("e_ts"),
        )
    )
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    return e.join(
        c,
        (F.col("e_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("e_ts"))
        & (F.col("c_ts") >= F.col("e_ts") - F.expr(f"INTERVAL {max_gap_seconds} SECONDS")),
    ).select(
        F.col("e_user").alias("user_id"), "error_id", "click_id", "e_ts", "c_ts"
    )


def run_available_now(
    spark: SparkSession,
    source_path: str,
    query_name: str = "events_rollup",
    window: str = "1 hour",
) -> DataFrame:
    """Drain everything currently in the source (availableNow trigger),
    materialize to a memory sink, return the result as a DataFrame.
    Used by tests and the bench smoke — a bounded run of the unbounded
    plan."""
    stream = windowed_rollup(read_event_stream(spark, source_path), window=window)
    # complete mode: emit every window on the final trigger too — append
    # would hold back windows the watermark hasn't passed, which for a
    # bounded drain means silently missing the newest windows.
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
