"""Measure streaming ANN serving throughput (SCALE.md §16, r10
verdict item 3).

Drives ``streaming.similarity.run_ivf_topk_available_now`` — query
vectors streaming against a STATIC corpus through a PERSISTED IVF
index — and separates the two costs the plan class is about:

- the ONE-TIME stream-start cost (centroid artifact load + the
  full-corpus cell-assignment pass, cached), vs
- the PER-BATCH cost (query×centroid ranking + bucket-pruned scoring
  join), reported as queries/s per micro-batch from the query's own
  progress objects.

If the static side leaked into the per-batch path (the boundary this
plan class hides), batch walls would scale with CORPUS size and dwarf
the start cost — the §16 table makes that visible.

Corpus: the sf0.1 embeddings replicated K× with deterministic
sign-flip mutations (the llmops_scale_probe generator — 2 k → 80 k
vectors at K=40, the production-config scale the r9 semantic probe
used). Queries: 2 k vectors in B parquet files, maxFilesPerTrigger=1
→ B micro-batches.

Usage: python scripts/streaming_ann_probe.py [K] [n_batches] [reps]
Defaults: K=40, 8 batches of 250 queries, reps=2 (host-noise floor;
min-of-reps per the bench protocol).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from llmops_scale_probe import _replicate_embeddings  # noqa: E402
from mbfbigdatarandomforest_spark.operators import similarity as sim  # noqa: E402
from mbfbigdatarandomforest_spark.session import get_spark  # noqa: E402
from mbfbigdatarandomforest_spark.sources.catalog import load_table  # noqa: E402
from mbfbigdatarandomforest_spark.streaming.similarity import (  # noqa: E402
    run_ivf_topk_available_now,
)

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    k_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    spark = get_spark(app_name="streaming-ann-probe")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, SF_DIR, "embeddings")
    corpus = _replicate_embeddings(emb, k_rep, stride=1_000_000)
    work = Path(tempfile.mkdtemp(prefix="ann_probe_"))
    corpus_path = work / "corpus"
    corpus.write.parquet(str(corpus_path))
    corpus = spark.read.parquet(str(corpus_path))
    n_corpus = corpus.count()

    # train once / search many: fit + persist the coarse quantizer
    t0 = time.perf_counter()
    cent = sim.fit_ivf_index(corpus, seed=7)
    fit_s = time.perf_counter() - t0
    idx = work / "ivf_idx"
    sim.save_ivf_index(spark, cent, str(idx))

    # queries: the original embeddings with shifted ids, one parquet
    # file per micro-batch
    queries = emb.select(
        (F.col("vec_id") + 50_000_000).alias("vec_id"), "embedding"
    )
    src = work / "query_stream"
    queries.repartition(n_batches).write.parquet(str(src))
    n_queries = queries.count()

    runs = []
    for rep in range(reps):
        progress: list = []
        out_dir = work / f"topk_out_{rep}"
        t0 = time.perf_counter()
        res = run_ivf_topk_available_now(
            spark,
            str(src),
            queries.schema,
            corpus,
            str(idx),
            str(out_dir),
            k=10,
            n_probe=3,
            query_name=f"ann_probe_{rep}",
            source_options={"maxFilesPerTrigger": "1"},
            progress=progress,
        )
        total_s = time.perf_counter() - t0
        n_out = res.count()
        batches = [
            {
                "batch_id": p["batchId"],
                "rows": p["numInputRows"],
                "wall_ms": p["batchDuration"],
                "queries_per_s": round(
                    p["numInputRows"] / (p["batchDuration"] / 1000.0), 1
                )
                if p["batchDuration"]
                else None,
            }
            for p in progress
            if p["numInputRows"] > 0
        ]
        batch_wall_s = sum(b["wall_ms"] for b in batches) / 1000.0
        runs.append(
            {
                "rep": rep,
                "total_wall_s": round(total_s, 2),
                # stream start = everything before the first batch:
                # centroid load + corpus assign + cache materialize
                "start_cost_s": round(total_s - batch_wall_s, 2),
                "batch_wall_s": round(batch_wall_s, 2),
                "n_batches": len(batches),
                "rows_out": n_out,
                "batches": batches,
            }
        )

    # batch one-shot baseline: the same 2 k queries through the batch
    # plan (assignment + scoring in one job) — what a non-streaming
    # caller pays end-to-end for the identical work
    t0 = time.perf_counter()
    n_batch_out = sim.ivf_topk(
        corpus, queries, k=10, n_probe=3, centroids=cent
    ).count()
    batch_one_shot_s = time.perf_counter() - t0

    best = min(runs, key=lambda r: r["total_wall_s"])
    steady = best["batches"][1:] or best["batches"]  # drop batch-0 warmup
    report = {
        "n_corpus": n_corpus,
        "n_queries": n_queries,
        "k_rep": k_rep,
        "n_clusters": len(cent),
        "index_fit_s": round(fit_s, 2),
        "batch_one_shot_s": round(batch_one_shot_s, 2),
        "batch_one_shot_rows": n_batch_out,
        "best_rep": best,
        "steady_queries_per_s": round(
            sum(b["rows"] for b in steady)
            / (sum(b["wall_ms"] for b in steady) / 1000.0),
            1,
        ),
        "all_runs": [
            {k: v for k, v in r.items() if k != "batches"} for r in runs
        ],
    }
    print(json.dumps(report))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
