"""SparkSession factory.

Defaults are chosen for the 100 TB posture (AQE on, skew-join handling,
zstd parquet, broadcast threshold high enough that every dimension table
in this workload broadcasts) while remaining correct on local[N] test
runs. All knobs are overridable via ``extra_conf``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Conservative, scale-oriented defaults. Rationale per key:
#  - AQE: coalesces post-shuffle partitions at runtime and splits skewed
#    ones; essential when the same plan must run at sf0.001 and 100 TB.
#  - shuffle.partitions: a *starting* number; AQE coalesces down. On a
#    real cluster this should be ~2-3x total cores; locally 32 matches
#    local[32].
#  - autoBroadcastJoinThreshold 64m: region/nation/customer/supplier and
#    the election dimension tables are all << 64 MB even at 100 TB fact
#    scale; forcing them broadcast removes the only shuffle in most
#    enrichment joins.
#  - maxPartitionBytes 128m: keeps scan partitions memory-friendly.
#  - Arrow: vectorized pandas_udf / toPandas transfer.
#  - UTC session timezone: deterministic timestamp semantics vs the
#    DuckDB oracle.
_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.sql.shuffle.partitions": "32",
    "spark.driver.memory": "8g",
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "mbfbigdatarandomforest-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session. ``master`` defaults to
    ``local[$SPARK_GRAFT_CPUS]`` so the same entry points run in tests,
    bench, and the driver harness; on a real cluster callers pass
    ``master=None`` and set ``SPARK_MASTER`` / spark-submit args.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
