"""Streaming WARC ingestion throughput probe (r11 — the round
``streaming/warc.py`` was born; SCALE.md §17).

Generates a deterministic dump of SHARDS (one fixture page body per
doc, gzip on odd shards so both decode paths run), drains it through
``run_warc_ingest_available_now`` twice:

- one-shot: all shards in a single micro-batch (the bulk-backfill
  posture — amortized rate);
- waved: ``maxFilesPerTrigger`` shards per micro-batch (the arrival
  posture — per-batch wall flatness is the leak signal, the
  streaming-ANN probe's criterion).

Correctness inside the probe, not assumed: the drained parquet must
equal the batch ``warc_to_documents`` frame exactly at every config.

Prints one JSON line:
{"configs": {...: {docs, wall_s, docs_per_s, n_batches,
                   batch_walls_ms, batch_ok}}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mbfbigdatarandomforest_spark.session import get_spark  # noqa: E402
from mbfbigdatarandomforest_spark.sources.warc import (  # noqa: E402
    encode_warc,
    warc_to_documents,
)
from mbfbigdatarandomforest_spark.streaming.warc import (  # noqa: E402
    run_warc_ingest_available_now,
)

N_SHARDS = int(os.environ.get("SPARK_GRAFT_WARC_SHARDS", "64"))
PAGES_PER_SHARD = int(os.environ.get("SPARK_GRAFT_WARC_PAGES", "200"))
WAVE_FILES = int(os.environ.get("SPARK_GRAFT_WARC_WAVE", "8"))

BODY = (
    "<html><head><title>page {i}</title></head><body>"
    "<p>the quick brown fox {i} jumped over the lazy dog and went home "
    "from work with the other animals that day</p></body></html>"
)


def build_dump(root: str) -> int:
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    n = 0
    for s in range(N_SHARDS):
        pages = []
        for p in range(PAGES_PER_SHARD):
            i = s * PAGES_PER_SHARD + p
            pages.append(
                {
                    "url": f"https://crawl-{s % 13}.example.org/p/{i}",
                    "status": 200 if i % 31 else 404,
                    "body": BODY.format(i=i),
                }
            )
            n += 1
        blob = encode_warc(pages, compress=s % 2 == 1)
        ext = ".warc.gz" if s % 2 == 1 else ".warc"
        with open(f"{root}/shard-{s:04d}{ext}", "wb") as f:
            f.write(blob)
    return n


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    root = "/tmp/warc_probe"
    dump = f"{root}/dump"
    n_pages = build_dump(dump)
    want = warc_to_documents(spark, dump)
    want_n = want.count()
    out: dict[str, dict] = {}
    configs = {
        "one_shot": None,
        f"wave_{WAVE_FILES}": {"maxFilesPerTrigger": str(WAVE_FILES)},
    }
    for name, opts in configs.items():
        for sub in ("out", "ckpt"):
            shutil.rmtree(f"{root}/{name}/{sub}", ignore_errors=True)
        progress: list = []
        t0 = time.time()
        got = run_warc_ingest_available_now(
            spark,
            dump,
            f"{root}/{name}/out",
            f"{root}/{name}/ckpt",
            source_options=opts,
            progress=progress,
        )
        wall = time.time() - t0
        got_n = got.count()
        batch_walls = [
            int(p["durationMs"].get("triggerExecution", 0))
            for p in progress
            if p["numInputRows"]
        ]
        # exactness: the drained table IS the batch frame
        diff = got.exceptAll(want).count() + want.exceptAll(got).count()
        out[name] = {
            "shards": N_SHARDS,
            "pages": n_pages,
            "docs": got_n,
            "wall_s": round(wall, 2),
            "docs_per_s": round(got_n / wall, 1),
            "n_batches": len(batch_walls),
            "batch_walls_ms": batch_walls,
            "batch_ok": diff == 0 and got_n == want_n,
        }
        print(f"## {name}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps({"configs": out}))


if __name__ == "__main__":
    main()
