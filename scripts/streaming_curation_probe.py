"""Measure the end-to-end streaming curation pipeline (SCALE.md §13).

Drives ``streaming.curation.start_curation_stream`` — ingest → Gopher →
watermarked exact dedup → decontamination, ONE continuous query — over
a crawl-dump tree that grows in waves, and records per-trigger
throughput (docs/s) and dedup state-store size from the query's own
progress objects.

Usage: python scripts/streaming_curation_probe.py [docs_per_wave] [waves] [clean|archive]
Defaults: 2000 docs/wave, 3 waves. Each wave re-emits ~10% duplicates
of earlier waves (cross-trigger state work) and carries the realistic
corpus's contaminated docs (decontamination work). The third arg picks
the listing-boundedness posture (SCALE.md §13): ``clean`` enables
``cleanSource=delete`` (processed files leave the watched tree after
their batch commits — per-trigger listing cost stays O(new files)
instead of O(all files ever)); ``archive`` enables
``cleanSource=archive`` + ``sourceArchiveDir`` — the PRODUCTION
posture (the raw dump stays replayable), which pays one rename per
processed file per trigger (a copy on object stores) — this probe
measures that delta (r8 verdict item 3).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mbfbigdatarandomforest_spark.session import get_spark  # noqa: E402
from mbfbigdatarandomforest_spark.sources.realistic_corpus import (  # noqa: E402
    CorpusSpec,
    generate,
)
from mbfbigdatarandomforest_spark.streaming.curation import (  # noqa: E402
    start_curation_stream,
)


def main() -> None:
    docs_per_wave = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    waves = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    mode = sys.argv[3] if len(sys.argv) > 3 else "append"
    if mode not in ("append", "clean", "archive"):
        raise SystemExit(f"unknown mode {mode!r}: append|clean|archive")
    rows, bench = generate(CorpusSpec(n_docs=docs_per_wave * waves, seed=11))

    spark = get_spark(app_name="streaming-curation-probe")
    spark.sparkContext.setLogLevel("ERROR")
    benchmark = spark.createDataFrame(
        [{**r, "dup_of": None} for r in bench],
        "doc_id string, kind string, lang string, text string, dup_of string",
    ).select("doc_id", "text")

    work = Path(tempfile.mkdtemp(prefix="curation_probe_"))
    dump, out, ckpt = work / "dump", work / "out", work / "ckpt"
    (dump / "web").mkdir(parents=True)
    archive = work / "archive"
    source_options = None
    if mode == "clean":
        source_options = {"cleanSource": "delete"}
    elif mode == "archive":
        source_options = {
            "cleanSource": "archive",
            "sourceArchiveDir": str(archive),
        }

    q = start_curation_stream(
        spark,
        str(dump),
        benchmark,
        str(out),
        str(ckpt),
        watermark="1 hour",
        n=13,
        query_name="curation_probe",
        source_options=source_options,
    )
    report: dict = {
        "docs_per_wave": docs_per_wave,
        "waves": waves,
        "mode": mode,
        "triggers": [],
    }
    seen_batches: set[int] = set()
    try:
        for w in range(waves):
            chunk = rows[w * docs_per_wave : (w + 1) * docs_per_wave]
            for r in chunk:
                (dump / "web" / f"w{w}_{r['doc_id']}.txt").write_text(r["text"])
            t0 = time.time()
            q.processAllAvailable()
            wall = time.time() - t0
            # a wave can span several micro-batches (maxFilesPerTrigger);
            # aggregate input rows over the batches this wave added and
            # read state size from the newest one
            fresh = [
                p
                for p in q.recentProgress
                if p["batchId"] not in seen_batches and p["numInputRows"] > 0
            ]
            seen_batches.update(p["batchId"] for p in q.recentProgress)
            state = (fresh[-1].get("stateOperators") or [{}])[0] if fresh else {}
            report["triggers"].append(
                {
                    "wave": w,
                    "wall_sec": round(wall, 2),
                    "docs_per_sec": round(docs_per_wave / wall, 1),
                    "n_batches": len(fresh),
                    "input_rows": sum(p["numInputRows"] for p in fresh),
                    "state_rows_total": state.get("numRowsTotal"),
                    "state_mem_bytes": state.get("memoryUsedBytes"),
                }
            )
    finally:
        q.stop()
        q.bench_grams.unpersist()

    curated = spark.read.parquet(str(out))
    report["curated_docs"] = curated.count()
    report["input_docs"] = docs_per_wave * waves
    if mode == "archive":
        report["archived_files"] = sum(1 for _ in archive.rglob("*.txt"))
        report["remaining_in_dump"] = sum(1 for _ in dump.rglob("*.txt"))
    print(json.dumps(report))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
