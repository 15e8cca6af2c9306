"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2
plus the north-star LLM-data operators via the engine's registry
(mbfbigdatarandomforest_spark.registry).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from mbfbigdatarandomforest_spark import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference pipeline's M1 skeleton (group-sum →
    pivot → NA-fill → ratio → lower; 01_DataMerge.R:69-92) mapped onto
    the oracle corpus at sf0.001."""
    from mbfbigdatarandomforest_spark.plans.election_analog import nation_status_ratio

    return nation_status_ratio(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
