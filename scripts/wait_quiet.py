"""Block until the host looks quiet (calibration sentinel near its
nominal floor), then exec the given command.

Usage: python scripts/wait_quiet.py [--gate 0.9] [--timeout 1800] cmd...

The probe is bench.py's fixed-work calibration query (CALIB_ROWS rows
of crc32∘sha2 summed, noop sink) run on a throwaway local session —
min-of-2 ≤ gate means proceed. On timeout the command runs anyway
(the bench's own pre/post sentinels still record the window quality).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def probe() -> float:
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("quiet-probe")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 48_000_000, 1, 32).select(
            F.sum(F.crc32(F.sha2(F.col("id").cast("string"), 256))).alias("x")
        ).write.mode("overwrite").format("noop").save()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    spark.stop()
    return best


def main() -> None:
    args = sys.argv[1:]
    gate, timeout = 0.9, 1800.0
    while args and args[0].startswith("--"):
        k = args.pop(0)
        if k == "--gate":
            gate = float(args.pop(0))
        elif k == "--timeout":
            timeout = float(args.pop(0))
    deadline = time.time() + timeout
    while True:
        b = probe()
        print(f"wait_quiet: calib min {b:.3f}s (gate {gate})", flush=True)
        if b <= gate or time.time() > deadline:
            break
        time.sleep(45)
    os.execvp(args[0], args)


if __name__ == "__main__":
    main()
