"""Per-snapshot wall+IO probe for the persistable SEMANTIC index (r14)
— the embedding-side mirror of probe_dedup_index.py: scale the
REFERENCE vector corpus K in {1, 10, 40} at a FIXED new snapshot and
time the cross-snapshot cosine gate both ways:

- rebuild path (``incremental_semantic_dedup(new, reference)``):
  refits the coarse quantizer and re-routes the accumulated corpus per
  gate — wall grows with K;
- index path (``incremental_semantic_dedup(new, index=...)``): the
  quantizer loads, the new side routes once, and the stored-vectors
  scan is PRUNED to the probed cells — wall and bytes should stay
  ~flat in K at fixed k (the same new snapshot probes the same cells;
  only those cells' occupancy grows).

Reference replication re-ids vectors and SCALES each replica by a
distinct factor (1 + i/1000): cosine is scale-invariant, so every
replica matches exactly what its original matches — the KEPT set is
PROVABLY K-invariant (asserted in-probe) and matches per new vector
grow linearly like a real accumulating corpus — while the stored
bytes are unique per replica (exact copies would compress away in
parquet and fake a flat-IO result).

Prints one JSON line:
{"new_rows": N, "runs": {K: {"ref_rows": R, "build_sec": B,
 "gate_rebuild_sec": W1, "gate_index_sec": W2, "kept": C,
 "io_rebuild": {...}, "io_index": {...}}}}
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

from probe_dedup_index import _timed  # noqa: E402
from mbfbigdatarandomforest_spark.operators import similarity as sim  # noqa: E402
from mbfbigdatarandomforest_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KS = tuple(
    int(k) for k in os.environ.get("SPARK_GRAFT_PROBE_KS", "1,10,40").split(",")
)
THRESHOLD = 0.8
K_CLUSTERS = 64
N_PROBE = 6


def _replicate(ref, k: int, stride: int):
    out = ref
    for i in range(1, k):
        scale = 1.0 + i / 1000.0  # cosine-invariant, byte-unique
        out = out.unionByName(
            ref.select(
                (F.col("vec_id") + i * stride).alias("vec_id"),
                F.transform(
                    "embedding", lambda x: (x * F.lit(scale)).cast("double")
                ).alias("embedding"),
            )
        )
    return out


def main() -> None:
    spark = get_spark(app_name="probe_semantic_index")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id",
        # double element type up front so scaled replicas union cleanly
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    ref_base = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1).localCheckpoint()
    n_new = new.count()
    scratch = tempfile.mkdtemp(prefix="semantic_index_probe_")
    runs: dict = {}
    try:
        for k in KS:
            ref = _replicate(ref_base, k, 10_000_000).localCheckpoint()
            ref_rows = ref.count()
            idx = f"{scratch}/idx_k{k}"
            t0 = time.monotonic()
            sim.build_semantic_index(ref, idx, n_clusters=K_CLUSTERS)
            build_sec = time.monotonic() - t0
            kw = dict(threshold=THRESHOLD, n_probe=N_PROBE)
            w_rebuild, kept_r, io_r = _timed(
                lambda: sim.incremental_semantic_dedup(
                    new, ref, n_clusters=K_CLUSTERS, **kw
                ).count(),
                spark,
            )
            spark.catalog.clearCache()
            w_index, kept_i, io_i = _timed(
                lambda: sim.incremental_semantic_dedup(
                    new, index=idx, **kw
                ).count(),
                spark,
            )
            spark.catalog.clearCache()
            # the rebuild path refits on the REPLICATED ref (identical
            # point set duplicated → same centroids family but k-means
            # sampling differs with row count) — so equality vs the
            # index is asserted at K=1 only; kept K-invariance guards
            # the rest
            if k == 1:
                assert kept_r == kept_i, (kept_r, kept_i)
            runs[k] = {
                "ref_rows": ref_rows,
                "build_sec": round(build_sec, 3),
                "gate_rebuild_sec": round(w_rebuild, 3),
                "gate_index_sec": round(w_index, 3),
                "kept": kept_i,
                "io_rebuild": io_r,
                "io_index": io_i,
            }
            print(f"# K={k}: {runs[k]}", file=sys.stderr)
        kepts = {r["kept"] for r in runs.values()}
        assert len(kepts) == 1, f"kept set varied across K: {kepts}"
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps({"new_rows": n_new, "runs": runs}))


if __name__ == "__main__":
    main()
