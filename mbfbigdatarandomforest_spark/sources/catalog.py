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
        # events.ts is parquet TIMESTAMP(NANOS) which Spark rejects;
        # read nanos as long, then rebuild a microsecond timestamp with
        # integer division (no double round-trip — ns-since-epoch
        # exceeds double's 2^53 mantissa).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # timestamp_micros() yields a tz-aware TIMESTAMP rendered in the
        # session timezone; the caller's session (e.g. the driver
        # harness) may not be UTC, which would shift every formatted/
        # truncated ts vs the DuckDB oracle's naive values. Pin it here.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every table as a SQL view (the engine's SQL surface is
    plain Spark SQL over these views; no custom parser — SURVEY.md §7)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
