"""SURVEY.md §2.12 performance evidence: one availableNow drain of the
events table through the windowed rollup + the exactly-once
partition-overwrite parquet sink, timed end to end.

Prints one JSON line: drain wall-time, input rows, rows/s. SCALE.md
records the result. maxFilesPerTrigger stays at the default used by the
tests (4) — at one source file the drain is a single micro-batch, which
is the honest bounded-drain shape.
"""
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mbfbigdatarandomforest_spark.session import get_spark
from mbfbigdatarandomforest_spark.streaming.events import (
    read_event_stream,
    windowed_rollup,
)
from mbfbigdatarandomforest_spark.streaming.sinks import (
    write_batch_idempotent,
)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="streaming-throughput")
    spark.sparkContext.setLogLevel("ERROR")
    n_input = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    walls, n_out = [], 0
    for _ in range(2):  # min-of-2: strip first-run JIT, like bench.py
      with tempfile.TemporaryDirectory() as tmp:
        # file-streaming sources need a DIRECTORY; stage the single
        # parquet file into one (untimed setup, not part of the drain)
        import shutil

        src = f"{tmp}/src"
        Path(src).mkdir()
        shutil.copy(f"{sf_dir}/events.parquet", f"{src}/part-0.parquet")
        out, ckpt = f"{tmp}/out", f"{tmp}/ckpt"
        t0 = time.perf_counter()
        stream = windowed_rollup(read_event_stream(spark, src))
        # complete mode: aggregation snapshots through the idempotent
        # per-batch partition overwrite (the composition the tests pin)
        q = (
            stream.writeStream.queryName("bench_drain")
            .outputMode("complete")
            .foreachBatch(lambda df, bid: write_batch_idempotent(df, bid, out))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        walls.append(time.perf_counter() - t0)
        n_out = spark.read.parquet(out).count()
    wall = min(walls)
    print(
        json.dumps(
            {
                "measure": "streaming_availablenow_drain",
                "input_rows": n_input,
                "output_windows": n_out,
                "wall_sec": round(wall, 2),
                "rows_per_sec": int(n_input / wall),
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
