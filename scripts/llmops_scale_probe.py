"""Beyond-SF probe for the LLM-ops families (SCALE.md §14; round-8
verdict item 1): the relational engine has its 10x/40x sublinear table
(§11) and the LM its ladder (§13); this gives exact dedup, banded
MinHash, embedding ANN, and the curation funnel the same evidence.

The driver ships documents/embeddings up to sf0.1 (5k docs / 2k
vectors). This probe replicates both tables K in {1, 10, 40} times and
times the four registered queries EXACTLY as registered (same params
the driver/bench run), materialized through the noop sink, min-of-2
with the cache cleared between reps.

Replication is NOT naive copying — naive K-fold copies would plant
near-dup cliques of size K+1 whose PAIR OUTPUT grows quadratically in
K, so the probe would measure output explosion, not engine scaling.
Instead, replica k of each row is:

- documents: doc_id shifted by k*stride (disjoint ids). Exactly ONE
  designated replica per doc (k == 1 + doc_id % 9) keeps the text with
  a short appended token — a planted near-dup of its original (high
  Jaccard, distinct fingerprint). Every other replica deterministically
  SHUFFLES the token order (sort by xxhash64(token, doc_id, rep)) —
  same vocabulary, same length, but the bigram-shingle set is
  destroyed, so it is a genuinely new document to every shingle-based
  operator while keeping vocabulary growth Heaps-law-realistic (a
  token-suffix mutation would multiply the BPE vocabulary by K — an
  artifact, not scaling). Planted near-dup count therefore grows
  LINEARLY with corpus size, like a real crawl; the sf corpus's own
  exact-dup groups survive only in replica 0 (shuffles are
  per-doc-id), so exact-dedup output group count stays ~linear.
- embeddings: vec_id shifted; the designated replica is an exact copy
  (cosine 1.0 planted dup, one per vector); every other replica gets a
  per-(vec_id, k, dim) pseudo-random sign flip — an essentially random
  direction, so original planted structure does not re-correlate
  across replicas. Occasional random threshold crossings are honest
  noise and show up in the reported row counts.

Prints one JSON line:
{"base": {...}, "runs": {query: {K: {in_rows, out_rows, wall_sec}}}}

Linear-or-better wall growth vs K is the evidence that the registered
plans are bucketed/banded as argued — no hidden all-pairs, no
driver-side collect over corpus-sized frames, no broadcast cliff. Any
boundary found gets an automatic size-keyed switch (the LM ladder's
BROADCAST_GRAM_ROWS_MAX precedent).
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from mbfbigdatarandomforest_spark.registry import load_all  # noqa: E402
from mbfbigdatarandomforest_spark.session import get_spark  # noqa: E402
from mbfbigdatarandomforest_spark.sources.catalog import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KS = tuple(
    int(k) for k in os.environ.get("SPARK_GRAFT_PROBE_KS", "1,10,40").split(",")
)
QUERIES = os.environ.get(
    "SPARK_GRAFT_PROBE_QUERIES",
    "dedup_exact,dedup_minhash_pairs,dedup_embedding_ann,curation_funnel_v2",
).split(",")
REPS = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "2"))


def _replicate_documents(docs, k: int, stride: int):
    """K copies, disjoint doc_ids; see module docstring for the
    planted-near-dup design."""
    if k == 1:
        return docs
    rep = F.col("__rep")
    near_dup = rep == (F.col("doc_id") % 9) + 1
    # deterministic per-(doc, rep) token shuffle: sort tokens by their
    # (token, doc_id, rep) hash — struct sort orders by the first field
    shuffled = F.concat_ws(
        " ",
        F.transform(
            F.array_sort(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.struct(
                        F.xxhash64(w, F.col("doc_id"), rep).alias("h"),
                        w.alias("w"),
                    ),
                )
            ),
            lambda s: s["w"],
        ),
    )
    mutated = F.when(rep == 0, F.col("text")).otherwise(
        F.when(
            near_dup, F.concat(F.col("text"), F.lit(" zqrep"), rep)
        ).otherwise(shuffled)
    )
    return (
        docs.withColumn("__rep", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        # mutate BEFORE shifting ids: the near-dup designation and the
        # shuffle hash must key on the ORIGINAL doc_id, or the
        # one-designated-replica invariant breaks (superlinear cliques)
        .withColumn("text", mutated)
        .withColumn("doc_id", F.col("doc_id") + rep * F.lit(stride))
        .drop("__rep")
    )


def _replicate_embeddings(emb, k: int, stride: int):
    if k == 1:
        return emb
    rep = F.col("__rep")
    near_dup = rep == (F.col("vec_id") % 9) + 1
    # per-(vec_id, rep, dim) pseudo-random sign flip for the non-dup
    # replicas: a deterministic "random direction" without any Python
    flip = F.transform(
        F.col("embedding"),
        lambda x, i: F.when(
            F.pmod(
                F.xxhash64(F.col("vec_id"), F.col("__rep"), i), F.lit(2)
            )
            == 0,
            x,
        ).otherwise(-x),
    )
    mutated = (
        F.when(rep == 0, F.col("embedding"))
        .when(near_dup, F.col("embedding"))
        .otherwise(flip)
    )
    return (
        emb.withColumn("__rep", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .withColumn("embedding", mutated)
        .withColumn("vec_id", F.col("vec_id") + rep * F.lit(stride))
        .drop("__rep")
    )


def _ann_auto_t09(spark, sf_dir):
    """Probe-only variant: the realistic dedup regime (threshold 0.9 —
    published semantic-dedup thresholds are ≥0.9) with the size-keyed
    auto n_clusters. The registered query pins (0.4, k=16) for oracle
    determinism; at 0.4 on random-direction synthetic data the TRUE
    pair count itself grows quadratically (cosine ~ N(0, 1/64): ~0.07%
    of all pairs cross 0.4), so the registered run measures output
    volume as much as engine cost. At 0.9 the output is the planted
    dups — linear — and the wall isolates engine scaling."""
    from mbfbigdatarandomforest_spark.operators import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings")
    return sim.ann_dup_pairs(
        emb, threshold=0.9, n_clusters=None, n_probe=4, kmeans_max_iter=8
    )


def _semantic_auto_t09(spark, sf_dir):
    """Probe-only variant (r9): the FULL SemDeDup closure — ANN pairs
    at the production config (auto n_clusters, threshold 0.9) →
    connected components → min-id keep → anti-join prune. Complements
    the §15 planted-structure CC probe: there the edge list was
    synthetic with known components; here it is the real ANN output
    over the replicated embeddings, so this measures the registered
    `dedup_semantic_keep` COMPOSITION at production parameters (the
    registered query pins the k=16/t=0.4 oracle config — quadratic by
    construction at probe scale, documented in plans/llm_ops.py)."""
    from mbfbigdatarandomforest_spark.operators import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings")
    return sim.semantic_dedup(
        emb, threshold=0.9, n_clusters=None, n_probe=4, kmeans_max_iter=8
    )


def _warc_scaled_shards(spark, sf_dir):
    """Probe-only variant (r10): warc_ingest_stats with PRODUCTION
    sharding — shard count grows with the corpus at a fixed
    docs-per-shard (the registered query pins 16 shards for
    determinism, which at 40× replication makes per-shard work grow
    40× and caps parallelism at 16; real crawls ship more shards, not
    bigger ones). Separates the fixture's sharding artifact from the
    operator's scaling."""
    from mbfbigdatarandomforest_spark.plans.llm_ops import WARC_STATUS_MOD
    from mbfbigdatarandomforest_spark.sources.warc import (
        encode_warc_shards,
        split_warc_records,
    )

    docs = load_table(spark, sf_dir, "documents")
    n_shards = max(16, docs.count() // 312)  # ≈ the sf0.1 docs/shard
    d = docs.select(
        F.concat(F.lit("https://corpus.example/doc/"), F.col("doc_id")).alias(
            "url"
        ),
        F.when(F.col("doc_id") % WARC_STATUS_MOD == 0, F.lit(404))
        .otherwise(F.lit(200))
        .alias("status"),
        F.encode("text", "UTF-8").alias("body"),
        (F.col("doc_id") % n_shards).alias("shard_id"),
    )
    recs = split_warc_records(encode_warc_shards(d))
    return (
        recs.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.sum(F.length("body")).alias("total_body_bytes"),
        )
        .orderBy("status")
    )


EXTRA = {
    "ann_auto_t09": _ann_auto_t09,
    "semantic_auto_t09": _semantic_auto_t09,
    "warc_scaled_shards": _warc_scaled_shards,
}


def main() -> None:
    spark = get_spark()
    specs = load_all()
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    doc_stride = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    vec_stride = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    base = {"documents": docs.count(), "embeddings": emb.count()}

    out: dict[str, dict[int, dict]] = {q: {} for q in QUERIES}
    for k in KS:
        probe_dir = f"/tmp/llmops_probe_k{k}"
        # materialize to parquet so every query times a REAL columnar
        # scan, not the replication lineage
        if not os.path.isdir(f"{probe_dir}/documents.parquet"):
            _replicate_documents(docs, k, doc_stride).write.mode(
                "overwrite"
            ).parquet(f"{probe_dir}/documents.parquet")
            _replicate_embeddings(emb, k, vec_stride).write.mode(
                "overwrite"
            ).parquet(f"{probe_dir}/embeddings.parquet")
        for q in QUERIES:
            fn = EXTRA[q] if q in EXTRA else specs[q].fn
            walls, rows = [], None
            try:
                for _ in range(REPS):
                    spark.catalog.clearCache()
                    t0 = time.time()
                    df = fn(spark, probe_dir)
                    df.write.format("noop").mode("overwrite").save()
                    walls.append(time.time() - t0)
                rows = fn(spark, probe_dir).count()
            except Exception as e:  # noqa: BLE001 — boundary evidence
                traceback.print_exc()
                out[q][k] = {"error": f"{type(e).__name__}: {e}"[:300]}
                continue
            out[q][k] = {
                "in_rows": base["embeddings"] * k
                if q in ("dedup_embedding_ann", "ann_auto_t09", "semantic_auto_t09")
                else base["documents"] * k,
                "out_rows": rows,
                "wall_sec": round(min(walls), 2),
                "spread": round(max(walls) / min(walls), 2),
            }
            print(
                f"## {q} K={k}: {out[q][k]}", file=sys.stderr, flush=True
            )
    print(json.dumps({"sf_dir": SF_DIR, "reps": REPS, "base": base, "runs": out}))


if __name__ == "__main__":
    main()
