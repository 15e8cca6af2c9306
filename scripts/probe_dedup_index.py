"""Per-snapshot wall probe for the persistable dedup index (r13,
VERDICT item 1): scale the REFERENCE corpus K in {1, 10, 40} at a
FIXED new snapshot and time the cross-snapshot gate both ways —

- rebuild path (``incremental_dedup(new, reference)``): re-shingles
  and re-buckets the accumulated corpus per gate, so the wall should
  grow ~linearly with K — the amortized scale gap the index removes;
- index path (``incremental_dedup(new, index=...)``): per-snapshot
  work is O(new) compute plus a narrow parquet scan of the stored
  (fingerprints, buckets, shingles) tables, so the wall should stay
  ~flat in K (index build time is reported separately — it is paid
  ONCE per corpus, not per snapshot).

r14 (VERDICT item 1): each gate also reports BYTES — executor-summed
input (scan), shuffle-read and shuffle-write — and the index path runs
BOTH uncapped and with the hot-bucket cap ON (max_bucket_size=50). The
v2 layout's claims under test: cap-ON adds ~no IO over cap-OFF (the
guard is a broadcast anti-join against precomputed sizes, not a window
over the whole buckets table), gate SHUFFLE stays ~flat in K (the
bucketed index side never shuffles; only the fixed new snapshot does),
and the verify join's shingle scan is partition-pruned to the
candidates' id-hash partitions instead of reading the corpus-sized
arrays.

Reference replication reuses llmops_scale_probe's near-dup-aware
design (one designated near-dup replica per doc, token-shuffled
otherwise) so planted cross-snapshot matches grow linearly like a real
crawl instead of minting quadratic cliques.

Prints one JSON line:
{"new_rows": N, "runs": {K: {"ref_rows": R, "build_sec": B,
 "gate_rebuild_sec": W1, "gate_index_sec": W2, "kept": C}}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from llmops_scale_probe import _replicate_documents  # noqa: E402
from mbfbigdatarandomforest_spark.operators import dedup as dd  # noqa: E402
from mbfbigdatarandomforest_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KS = tuple(
    int(k) for k in os.environ.get("SPARK_GRAFT_PROBE_KS", "1,10,40").split(",")
)
REPS = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "2"))
THRESHOLD = 0.7


def _io_totals(spark) -> dict:
    """Cumulative input/shuffle bytes across all executors (local mode:
    the single driver-executor) — deltas around a gate give its IO."""
    exs = spark.sparkContext._jsc.sc().statusStore().executorList(False)
    tot = {"input": 0, "sread": 0, "swrite": 0}
    for i in range(exs.size()):
        e = exs.apply(i)
        tot["input"] += e.totalInputBytes()
        tot["sread"] += e.totalShuffleRead()
        tot["swrite"] += e.totalShuffleWrite()
    return tot


def _timed(fn, spark=None):
    walls = []
    out = None
    io = None
    for _ in range(REPS):
        before = _io_totals(spark) if spark is not None else None
        t0 = time.monotonic()
        out = fn()
        walls.append(time.monotonic() - t0)
        if before is not None:
            after = _io_totals(spark)
            io = {
                "input_mb": round((after["input"] - before["input"]) / 2**20, 1),
                "sread_mb": round((after["sread"] - before["sread"]) / 2**20, 1),
                "swrite_mb": round(
                    (after["swrite"] - before["swrite"]) / 2**20, 1
                ),
            }
    return min(walls), out, io


def main() -> None:
    spark = get_spark(app_name="probe_dedup_index")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    ref_base = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1).localCheckpoint()
    n_new = new.count()
    stride = 10_000_000
    scratch = tempfile.mkdtemp(prefix="dedup_index_probe_")
    runs: dict = {}
    try:
        for k in KS:
            ref = _replicate_documents(ref_base, k, stride).localCheckpoint()
            ref_rows = ref.count()
            idx = f"{scratch}/idx_k{k}"
            t0 = time.monotonic()
            # cap of record (r15): the capped gate lane below reads the
            # hot set materialized at build/append — zero per-gate
            # aggregate over bucket_sizes, so cap-lane shuffle should
            # now be ~the uncapped lane's (new-side-only) at every K
            dd.build_dedup_index(ref, idx, max_bucket_size=50)
            build_sec = time.monotonic() - t0

            w_rebuild, kept_r, io_r = _timed(
                lambda: dd.incremental_dedup(
                    new, ref, threshold=THRESHOLD
                ).count(),
                spark,
            )
            spark.catalog.clearCache()
            w_index, kept_i, io_i = _timed(
                lambda: dd.incremental_dedup(
                    new, index=idx, threshold=THRESHOLD
                ).count(),
                spark,
            )
            spark.catalog.clearCache()
            # hot-bucket cap ON (r14): must add ~no IO over cap-OFF —
            # the guard joins precomputed sizes instead of windowing
            # the whole buckets table
            w_cap, kept_c, io_c = _timed(
                lambda: dd.incremental_dedup(
                    new, index=idx, threshold=THRESHOLD, max_bucket_size=50
                ).count(),
                spark,
            )
            spark.catalog.clearCache()
            # equality stays in-probe: identical kept sets, and the cap
            # must equal the rebuild path's cap at the same setting
            kept_cap_rebuild = dd.incremental_dedup(
                new, ref, threshold=THRESHOLD, max_bucket_size=50
            ).count()
            spark.catalog.clearCache()
            assert kept_r == kept_i, (k, kept_r, kept_i)
            assert kept_c == kept_cap_rebuild, (k, kept_c, kept_cap_rebuild)
            runs[k] = {
                "ref_rows": ref_rows,
                "build_sec": round(build_sec, 3),
                "gate_rebuild_sec": round(w_rebuild, 3),
                "gate_index_sec": round(w_index, 3),
                "gate_index_capped_sec": round(w_cap, 3),
                "kept": kept_i,
                "io_rebuild": io_r,
                "io_index": io_i,
                "io_index_capped": io_c,
            }
            print(f"# K={k}: {runs[k]}", file=sys.stderr)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps({"new_rows": n_new, "runs": runs}))


if __name__ == "__main__":
    main()
