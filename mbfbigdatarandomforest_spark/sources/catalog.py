"""Test-data catalog: the driver's TPC-H-ish parquet tables.

SURVEY.md §2.1 S3 — the reference's ``save.ffdf``/``load.ffdf`` columnar
checkpoints (01_DataMerge.R:50,55) map to partitioned Parquet; this module
is the read side for the synthetic tiers in TESTDATA.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any fact scale. Used by
# plans to apply explicit broadcast() hints (SURVEY.md §4.1).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-adaptive ``events`` loader.

    The test-data generator has stored ``events.ts`` as parquet
    TIMESTAMP(NANOS) in some regenerations and TIMESTAMP(MICROS) in
    others, so the loader must not assume either. ``nanosAsLong`` makes
    a NANOS file surface ``ts`` as LongType instead of throwing at
    schema inference, and is a no-op for MICROS files; we then branch on
    the *loaded* type:

    - LongType (NANOS file): rebuild a microsecond timestamp with
      integer division — no double round-trip, ns-since-epoch exceeds
      double's 2^53 mantissa.
    - TimestampNTZType (MICROS, isAdjustedToUTC=false): cast to
      session-local TIMESTAMP.
    - TimestampType: pass through.

    All branches yield tz-aware TIMESTAMP under a UTC session pin, so
    downstream ``date_format``/``date_trunc``/``cast("double")`` agree
    with the DuckDB oracle's naive-UTC values even when the caller owns
    the SparkSession (the driver harness does not use session.get_spark,
    which already defaults to UTC).
    """
    from pyspark.sql.types import LongType, TimestampNTZType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if isinstance(ts_type, TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] | None = None
) -> None:
    """Expose tables as SQL views (the engine's SQL surface is plain
    Spark SQL over these views; no custom parser — SURVEY.md §7).

    Pass ``tables`` to register only what a query actually reads: a
    broken or missing loader for an unrelated table must not take down
    queries that never touch it (round-3 lesson — the ``events`` loader
    regression killed two pure-TPC-H SQL queries via this function).
    """
    for name in tables if tables is not None else TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
