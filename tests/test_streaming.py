"""Structured Streaming rollup must agree with its batch twin when the
stream is fully drained (availableNow over the same parquet data).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR_SMALL
from mbfbigdatarandomforest_spark.sources.catalog import load_table
from mbfbigdatarandomforest_spark.streaming.events import run_available_now


def test_streaming_rollup_equals_batch(spark, tmp_path):
    # the file-stream source requires a directory of files
    import shutil

    src_dir = tmp_path / "events_stream"
    src_dir.mkdir()
    shutil.copy(f"{SF_DIR_SMALL}/events.parquet", src_dir / "part-0.parquet")
    got = run_available_now(spark, str(src_dir), query_name="t_rollup")
    want = (
        load_table(spark, SF_DIR_SMALL, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )
    g = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in got.collect()
    }
    w = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in want.collect()
    }
    assert set(g) == set(w)
    for k in w:
        assert g[k][0] == w[k][0]
        assert g[k][1] == pytest.approx(w[k][1])
