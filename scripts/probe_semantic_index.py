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

r15 additions (r14 VERDICT items 1 and 5):

- a CAPPED gate lane per K (``max_cell_size`` — the bounded-verify
  split): kept must equal the uncapped gate exactly, wall/IO reported;
- a PLANTED-HOT-CELL section at the top K: a pile of cosine-scaled
  copies of one vector lands on one centroid, the capped gate must
  still answer exactly, and the report carries the measured max verify
  GROUP rows capped vs uncapped — the group is what one task holds
  (its pandas frame and its dense matrix scale with it), so bounded
  groups ARE bounded per-task peak memory;
- a STREAMING drain against the top-K index with the preloaded-
  centroids path: per-batch walls and drained ≡ batch pinned in-probe.

Prints one JSON line:
{"new_rows": N, "runs": {K: {"ref_rows": R, "build_sec": B,
 "gate_rebuild_sec": W1, "gate_index_sec": W2, "gate_index_capped_sec":
 W3, "kept": C, "io_rebuild": {...}, "io_index": {...},
 "io_index_capped": {...}}}, "hot_cell": {...}, "streaming": {...}}
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
MAX_CELL = 2000  # capped lane: small enough to split cells at every K
HOT_PILE = 12_000  # planted hot-cell occupancy (≫ MAX_CELL)


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


def _max_group_rows(spark, new, idx, cap):
    """Measured max verify-GROUP rows for the capped vs uncapped gate —
    the group is one task's whole input (pandas frame + dense matrix),
    so this IS the per-task peak-memory driver. Re-derives the gate's
    own tagged/salted frames through the operator's helpers."""
    cents = sim.load_ivf_index(spark, sim._semantic_subdir(idx, "ivf"))
    routed_new = sim._cosine_probe_routes(
        sim._narrow_vectors(new, "vec_id", "embedding"), cents, N_PROBE
    ).select("cell", F.lit(0).alias("__role"), "id", "v", "nrm")
    pbs = [r[0] for r in routed_new.select("cell").distinct().collect()]
    ref_rows = (
        spark.read.parquet(sim._semantic_subdir(idx, "vectors"))
        .filter(F.col("cell").isin(pbs))
        .select("cell", F.lit(1).alias("__role"), "id", "v", "nrm")
    )
    both = routed_new.unionByName(ref_rows)
    uncapped = (
        both.groupBy("cell").count().agg(F.max("count")).first()[0] or 0
    )
    capped = (
        sim._salt_cells(both, cap)
        .groupBy("cell", "__sa", "__sb")
        .count()
        .agg(F.max("count"))
        .first()[0]
        or 0
    )
    return int(uncapped), int(capped)


def _hot_cell_probe(spark, emb, scratch: str) -> dict:
    """Plant a HOT cell via the EXACT failure mode of r14 VERDICT
    finding 1: the quantizer freezes at build, then boilerplate
    embeddings pile onto one centroid through APPENDS (a pile present
    at build time would instead attract several centroids of its own
    — k-means absorbs it; the frozen-quantizer append is what nothing
    used to bound). HOT_PILE cosine-scaled copies of one vector all
    route to the same fixed home cell; the capped gate must answer
    exactly the uncapped gate while its max verify group stays
    ~MAX_CELL rows instead of the pile, and the occupancy watermark
    must flag the index."""
    base = emb.orderBy("vec_id").limit(1).localCheckpoint()
    ref = emb.filter(F.col("vec_id") % 2 == 0)
    idx = f"{scratch}/idx_hot"
    sim.build_semantic_index(ref, idx, n_clusters=K_CLUSTERS)
    pile = spark.range(1, HOT_PILE + 1).crossJoin(base).select(
        (F.col("vec_id") + 500_000_000 + F.col("id")).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x: (x * (F.lit(1.0) + F.col("id") / F.lit(1e7))).cast(
                "double"
            ),
        ).alias("embedding"),
    )
    stats = sim.append_semantic_index(pile, idx)
    # the new side probes the hot cell: scaled copies of the same base
    new = (
        emb.filter(F.col("vec_id") % 2 == 1)
        .unionByName(
            spark.range(1, 101)
            .crossJoin(base)
            .select(
                (F.col("vec_id") + 700_000_000 + F.col("id")).alias(
                    "vec_id"
                ),
                F.transform(
                    "embedding",
                    lambda x: (
                        x * (F.lit(1.0) + F.col("id") / F.lit(1e6))
                    ).cast("double"),
                ).alias("embedding"),
            )
        )
        .localCheckpoint()
    )
    assert stats["max_cell"] >= HOT_PILE  # the pile really concentrated
    # 12k-on-one-cell at a 1k-row build corpus: growth flags the index
    assert stats["rebuild_advised"] is True
    kw = dict(threshold=THRESHOLD, n_probe=N_PROBE)
    w_unc, kept_u, io_u = _timed(
        lambda: sim.incremental_semantic_dedup(new, index=idx, **kw).count(),
        spark,
    )
    spark.catalog.clearCache()
    w_cap, kept_c, io_c = _timed(
        lambda: sim.incremental_semantic_dedup(
            new, index=idx, max_cell_size=MAX_CELL, **kw
        ).count(),
        spark,
    )
    spark.catalog.clearCache()
    assert kept_c == kept_u, (kept_c, kept_u)
    g_unc, g_cap = _max_group_rows(spark, new, idx, MAX_CELL)
    assert g_cap <= 2 * MAX_CELL, (g_cap, MAX_CELL)  # bounded per task
    assert g_unc >= HOT_PILE  # the pile really concentrated
    out = {
        "pile": HOT_PILE,
        "max_cell_occupancy": stats["max_cell"],
        "hot_cells": stats["hot_cells"],
        "rebuild_advised": stats["rebuild_advised"],
        "kept": kept_u,
        "gate_uncapped_sec": round(w_unc, 3),
        "gate_capped_sec": round(w_cap, 3),
        "max_group_rows_uncapped": g_unc,
        "max_group_rows_capped": g_cap,
        "io_uncapped": io_u,
        "io_capped": io_c,
    }
    print(f"# hot_cell: {out}", file=sys.stderr)
    # ---- the advise → rebuild → recover loop, composed end-to-end at
    # scale (r16 — VERDICT r15 item 3): the watermark flagged the index
    # above; now run the operation it advises and measure what a
    # production operator would watch. The FULL-PROBE gate is exact
    # under ANY quantizer, so its kept set pins rebuild correctness;
    # recall at fixed n_probe is measured before/after on the same
    # query sample; max_cell is reported honestly — a pile of
    # near-identical vectors is genuinely one point mass, so no
    # quantizer splits it (the CAP bounds the verify task, the rebuild
    # restores the watermark's anchor and the auto-k capacity rule).
    meta = sim._read_semantic_meta(spark, idx)
    # query sample = the 100 scaled copies of the pile's base vector
    # (vec_id ≥ 700M): each has thousands of true ≥-threshold matches
    # inside the indexed pile, so the recall denominator is real — a
    # uniform sample of this corpus has ZERO truth pairs at 0.8 and
    # recall would read a vacuous 1.0
    sample = new.filter(F.col("vec_id") >= 700_000_000)
    rec_before = sim.estimate_probe_recall(
        spark, idx, sample, n_probes=(1, 2, 4), threshold=THRESHOLD
    )
    assert rec_before["truth_pairs"] > 0  # non-vacuous denominator
    full_kw = dict(threshold=THRESHOLD, n_probe=meta["k"])
    full_before = sim.incremental_semantic_dedup(
        new, index=idx, **full_kw
    ).count()
    t0 = time.monotonic()
    post = sim.rebuild_semantic_index(spark, idx)
    rebuild_sec = time.monotonic() - t0
    assert post["rebuild_advised"] is False  # watermark re-anchored
    meta2 = sim._read_semantic_meta(spark, idx)
    # auto-k re-sizes to the CURRENT corpus by the IVF capacity rule —
    # here that means SHRINKING: the fixture's build is deliberately
    # over-clustered (64 cells on a 1k-row ref) and the pile is one
    # point mass, so the right-sized quantizer has fewer, fuller cells
    assert meta2["k"] == sim._clusters_for_n(post["n_vectors"])
    rec_after = sim.estimate_probe_recall(
        spark, idx, sample, n_probes=(1, 2, 4), threshold=THRESHOLD
    )
    full_after = sim.incremental_semantic_dedup(
        new, index=idx, threshold=THRESHOLD, n_probe=meta2["k"]
    ).count()
    assert full_after == full_before, (full_after, full_before)
    w_cap2, kept_c2, _ = _timed(
        lambda: sim.incremental_semantic_dedup(
            new, index=idx, max_cell_size=MAX_CELL, threshold=THRESHOLD,
            n_probe=N_PROBE,
        ).count(),
        spark,
    )
    spark.catalog.clearCache()
    out["rebuild"] = {
        "rebuild_sec": round(rebuild_sec, 3),
        "k_before": meta["k"],
        "k_after": meta2["k"],
        "max_cell_before": stats["max_cell"],
        "max_cell_after": post["max_cell"],
        "growth_after": post["growth"],
        "rebuild_advised_after": post["rebuild_advised"],
        "recall_before": rec_before,
        "recall_after": rec_after,
        "full_probe_kept": full_before,
        "gate_capped_sec_after": round(w_cap2, 3),
        "kept_capped_after": kept_c2,
    }
    print(f"# hot_cell.rebuild: {out['rebuild']}", file=sys.stderr)
    return out


def _batch_capped_probe(spark, emb) -> dict:
    """r16 (VERDICT r15 finding 1): the capped BATCH ``ann_dup_pairs``
    must be STORAGE-FREE — the r15 form localCheckpointed the full
    routed corpus (~n_probe+1 vector copies per row) to executor
    storage just to count cells, a multi-hundred-TB transient at
    100 TB, paid even when no cell exceeded the cap. Now cell sizes
    come from a vector-free second routing pass. Asserted here the way
    the fix is stated: the capped run leaves ZERO new persisted RDD
    blocks, answers exactly the uncapped run, and the block-manager
    storage totals around the run land in the probe output."""
    jsc = spark.sparkContext._jsc

    def _storage():
        infos = jsc.sc().getRDDStorageInfo()
        return {
            "blocks": len(infos),
            "mem_mb": round(sum(i.memSize() for i in infos) / 2**20, 1),
            "disk_mb": round(sum(i.diskSize() for i in infos) / 2**20, 1),
        }

    # threshold 0.4 (not the gate lanes' 0.8): this corpus holds no
    # 0.8-cosine pairs, and a 0 == 0 equality would pin nothing
    kw = dict(threshold=0.4, n_clusters=K_CLUSTERS, n_probe=N_PROBE)
    w_unc, n_unc, io_u = _timed(
        lambda: sim.ann_dup_pairs(emb, **kw).count(), spark
    )
    spark.catalog.clearCache()
    before_ids = set(jsc.getPersistentRDDs().keySet().toArray())
    before = _storage()
    w_cap, n_cap, io_c = _timed(
        lambda: sim.ann_dup_pairs(
            emb, max_cell_size=MAX_CELL, **kw
        ).count(),
        spark,
    )
    after_ids = set(jsc.getPersistentRDDs().keySet().toArray())
    after = _storage()
    spark.catalog.clearCache()
    assert n_cap == n_unc, (n_cap, n_unc)  # capped ≡ uncapped
    leaked = after_ids - before_ids
    assert not leaked, f"capped batch path persisted RDDs: {leaked}"
    out = {
        "pairs": n_cap,
        "uncapped_sec": round(w_unc, 3),
        "capped_sec": round(w_cap, 3),
        "storage_before": before,
        "storage_after": after,
        "new_persisted_rdds": len(leaked),
        "io_uncapped": io_u,
        "io_capped": io_c,
    }
    print(f"# batch_capped: {out}", file=sys.stderr)
    return out


def _streaming_probe(spark, new, idx: str, scratch: str) -> dict:
    """Drain the semantic STREAMING gate against the top-K (40×) index
    with the preloaded-centroids path (r14 VERDICT item 5): the hoisted
    quantizer load + per-micro-batch capped gates. Reports total and
    mean per-batch wall plus the drain's input/shuffle bytes; drained ≡
    batch asserted in-probe."""
    from probe_dedup_index import _io_totals
    from mbfbigdatarandomforest_spark.streaming.dedup import (
        run_incremental_semantic_dedup_available_now,
    )

    src = f"{scratch}/stream_src"
    out_dir = f"{scratch}/stream_out"
    n_batches = 4
    new.repartition(n_batches).write.parquet(src)
    before = _io_totals(spark)
    t0 = time.monotonic()
    got = run_incremental_semantic_dedup_available_now(
        spark,
        src,
        new.schema,
        out_dir,
        idx,
        threshold=THRESHOLD,
        n_probe=N_PROBE,
        source_options={"maxFilesPerTrigger": "1"},
        max_cell_size=MAX_CELL,
    )
    drain_sec = time.monotonic() - t0
    after = _io_totals(spark)
    drained = got.count()
    batch = sim.incremental_semantic_dedup(
        new, index=idx, threshold=THRESHOLD, n_probe=N_PROBE
    ).count()
    assert drained == batch, (drained, batch)
    out = {
        "batches": n_batches,
        "drain_sec": round(drain_sec, 3),
        "mean_batch_sec": round(drain_sec / n_batches, 3),
        "drained": drained,
        "io_drain": {
            "input_mb": round((after["input"] - before["input"]) / 2**20, 1),
            "sread_mb": round((after["sread"] - before["sread"]) / 2**20, 1),
            "swrite_mb": round(
                (after["swrite"] - before["swrite"]) / 2**20, 1
            ),
        },
    }
    print(f"# streaming: {out}", file=sys.stderr)
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
            # capped lane (r15): the bounded-verify split must answer
            # EXACTLY the uncapped gate at any cap — probe one small
            # enough to force multi-way splits at every K
            w_cap, kept_c, io_c = _timed(
                lambda: sim.incremental_semantic_dedup(
                    new, index=idx, max_cell_size=MAX_CELL, **kw
                ).count(),
                spark,
            )
            spark.catalog.clearCache()
            assert kept_c == kept_i, (k, kept_c, kept_i)
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
                "gate_index_capped_sec": round(w_cap, 3),
                "kept": kept_i,
                "io_rebuild": io_r,
                "io_index": io_i,
                "io_index_capped": io_c,
            }
            print(f"# K={k}: {runs[k]}", file=sys.stderr)
        kepts = {r["kept"] for r in runs.values()}
        assert len(kepts) == 1, f"kept set varied across K: {kepts}"
        top_idx = f"{scratch}/idx_k{max(KS)}"
        hot = _hot_cell_probe(spark, emb, scratch)
        streaming = _streaming_probe(spark, new, top_idx, scratch)
        batch_capped = _batch_capped_probe(spark, emb)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    print(
        json.dumps(
            {
                "new_rows": n_new,
                "runs": runs,
                "hot_cell": hot,
                "streaming": streaming,
                "batch_capped": batch_capped,
            }
        )
    )


if __name__ == "__main__":
    main()
