from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb
import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

SF_DIR_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.01")

from mbfbigdatarandomforest_spark.sources.catalog import TABLES  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    from mbfbigdatarandomforest_spark.session import get_spark

    # local[8] (r17 — r16 VERDICT item 2): the driver's verify window
    # timed out at ~44% of the suite on local[4]; the compute-bound
    # tests (LM training, ML fits, lifecycle e2e) scale with cores on
    # this 32-core host while shuffle.partitions stays pinned at 8 so
    # partition-dependent fixtures keep their layout. Override with
    # SPARK_GRAFT_TEST_CPUS if a constrained host needs fewer.
    test_cpus = os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")
    s = get_spark(
        app_name="mbf-rf-tests",
        master=f"local[{test_cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.driver.memory": "4g",
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the oracle tables registered as views,
    mirroring the driver's harness."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR_ORACLE}/{name}.parquet'"
        )
    yield con
    con.close()
