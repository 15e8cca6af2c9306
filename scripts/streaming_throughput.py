"""SURVEY.md §2.12 performance evidence: availableNow drains of the
events table through the windowed rollup + the exactly-once
partition-overwrite parquet sink, timed end to end.

Round 6 (verdict item 6) turns the single 34 krows/s point into a
state-store AMORTIZATION measurement — the claim "per-batch fixed costs
amortize at production batch sizes" needs two more points:

1. ``one_batch``     — the whole table in ONE micro-batch (r5 baseline).
2. ``many_batches``  — the same rows split into 16 source files drained
   at maxFilesPerTrigger=1: 16 micro-batches, so per-batch fixed costs
   (offset log write, state snapshot, sink commit) are paid 16×.
3. ``one_batch_10x`` — the table duplicated 10× (10 source files, one
   availableNow batch): the fixed cost is paid once for 10× the rows.

Prints one JSON line with rows/s for each scenario. SCALE.md records
the result.
"""
import json
import os
import shutil
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


def _drain(spark, src: str, tmp: str, max_files: int) -> float:
    out, ckpt = f"{tmp}/out", f"{tmp}/ckpt"
    t0 = time.perf_counter()
    stream = windowed_rollup(
        read_event_stream(spark, src, max_files_per_trigger=max_files)
    )
    q = (
        stream.writeStream.queryName("bench_drain")
        .outputMode("complete")
        .foreachBatch(lambda df, bid: write_batch_idempotent(df, bid, out))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    spark.read.parquet(out).count()  # sanity: sink readable
    return wall


def _scenario(spark, sf_dir: str, n_files: int, copies: int, max_files: int,
              reps: int = 2) -> dict:
    """Stage the events parquet as ``copies`` file copies (reading each
    file is a full pass over the table), split notionally into
    micro-batches of ``max_files`` files each; min-of-``reps`` drains."""
    base = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_rows = base.count() * copies
    walls = []
    for _ in range(reps):
        with tempfile.TemporaryDirectory() as tmp:
            src = f"{tmp}/src"
            Path(src).mkdir()
            if copies == 1 and n_files > 1:
                # split the single table into n_files chunks
                base.repartition(n_files).write.mode("overwrite").parquet(src)
                for extra in Path(src).glob("_*"):
                    extra.unlink()
            else:
                for c in range(copies):
                    shutil.copy(
                        f"{sf_dir}/events.parquet", f"{src}/part-{c:02d}.parquet"
                    )
            walls.append(_drain(spark, src, tmp, max_files))
    wall = min(walls)
    n_batches = -(-n_files * copies // max_files) if copies == 1 else -(-copies // max_files)
    return {
        "input_rows": n_rows,
        "micro_batches": n_batches,
        "wall_sec": round(wall, 2),
        "rows_per_sec": int(n_rows / wall),
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="streaming-throughput")
    spark.sparkContext.setLogLevel("ERROR")
    report = {
        "measure": "streaming_availablenow_drain_amortization",
        "sf_dir": sf_dir,
        "one_batch": _scenario(spark, sf_dir, n_files=1, copies=1, max_files=4),
        "many_batches": _scenario(spark, sf_dir, n_files=16, copies=1, max_files=1),
        "one_batch_10x": _scenario(spark, sf_dir, n_files=1, copies=10, max_files=16),
    }
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
