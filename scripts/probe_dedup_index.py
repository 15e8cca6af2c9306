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


def _timed(fn):
    walls = []
    out = None
    for _ in range(REPS):
        t0 = time.monotonic()
        out = fn()
        walls.append(time.monotonic() - t0)
    return min(walls), out


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
            dd.build_dedup_index(ref, idx)
            build_sec = time.monotonic() - t0

            w_rebuild, kept_r = _timed(
                lambda: dd.incremental_dedup(
                    new, ref, threshold=THRESHOLD
                ).count()
            )
            spark.catalog.clearCache()
            w_index, kept_i = _timed(
                lambda: dd.incremental_dedup(
                    new, index=idx, threshold=THRESHOLD
                ).count()
            )
            spark.catalog.clearCache()
            assert kept_r == kept_i, (k, kept_r, kept_i)
            runs[k] = {
                "ref_rows": ref_rows,
                "build_sec": round(build_sec, 3),
                "gate_rebuild_sec": round(w_rebuild, 3),
                "gate_index_sec": round(w_index, 3),
                "kept": kept_i,
            }
            print(f"# K={k}: {runs[k]}", file=sys.stderr)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps({"new_rows": n_new, "runs": runs}))


if __name__ == "__main__":
    main()
