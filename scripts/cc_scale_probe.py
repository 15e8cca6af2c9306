"""Beyond-SF probe for the connected-components family (SCALE.md §15;
round-9 verdict item 1): `dedup_clusters` / `dedup_semantic_keep` were
the ONLY registered corpus queries absent from the §14 10x/40x sweeps,
and CC is iterative — the plan class where driver-side convergence
checks and lineage growth bite at scale. The large-star/small-star
O(log n)-rounds claim (operators/dedup.py:connected_components) was
argued from the Kiveris et al. paper, never measured here.

Design: plant components of KNOWN sizes at N = 50_000 * K nodes,
K in {1, 10, 40} (so 40x = 2M nodes / ~1.9M edges):

- one GIANT PATH over 30% of nodes — the adversarial diameter case
  (naive min-propagation needs O(diameter) rounds; the alternating
  star rounds must stay ~log2);
- 1000-node chains over the next 30% — many medium-diameter comps;
- 100-node stars over 20% — celebrity hubs (the aggregation-only
  neighborhood handling must not materialize a hub's neighbor list);
- 2-node pairs over 10%; singletons over the last 10% (exercised by
  dedup_clusters' left-join + coalesce path).

Node ids are scrambled by an affine bijection (a*id + b mod N, a prime
and coprime to N) so the giant path is NOT min-ordered along its
length — ordered ids would hand min-propagation its easy direction and
understate rounds.

Correctness at every scale is checked EXACTLY, not sampled: the
cluster-size histogram of dedup_clusters' output must equal the
planted histogram {0.3N: 1, 1000: 0.3N/1000, 100: 0.2N/100,
2: 0.05N, 1: 0.1N} — any mislabeled node shifts two buckets.

Metrics per K: wall (min-of-REPS), rounds taken, per-round edge counts
(the shuffle-volume driver, read from the convergence fingerprint that
runs anyway — "peak shuffle" proxy), per-round walls, and the
histogram-check verdict. Evidence of the O(log n) claim: rounds grow
by ~log(K) (+2 across 1->40x), never by K; per-round edge volume stays
O(E); wall grows <= linearly in K.

Prints one JSON line:
{"runs": {K: {nodes, edges_in, wall_s, spread, rounds, edge_counts,
              round_walls_s, hist_ok, components}}}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from mbfbigdatarandomforest_spark.operators.dedup import (  # noqa: E402
    connected_components,
    dedup_clusters,
)
from mbfbigdatarandomforest_spark.session import get_spark  # noqa: E402

KS = tuple(
    int(k) for k in os.environ.get("SPARK_GRAFT_PROBE_KS", "1,10,40").split(",")
)
BASE_N = int(os.environ.get("SPARK_GRAFT_CC_BASE_N", "50000"))
REPS = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "2"))
#: Affine scrambler multiplier — prime, never divides 50_000 * K.
PERM_A = 1_000_003
PERM_B = 7


def planted_graph(spark, n: int):
    """(pairs, expected_histogram) for the planted structure at N=n.

    All edges are built from `spark.range` column arithmetic (no
    driver-side lists) and node ids pass through the affine scrambler,
    so the frame scales to any N the probe asks for.
    """
    path_hi = (3 * n) // 10
    chain_hi = (6 * n) // 10
    star_hi = (8 * n) // 10
    pair_hi = (9 * n) // 10

    def perm(c):
        return (c * PERM_A + PERM_B) % n

    giant = spark.range(0, path_hi - 1).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v")
    )
    chains = (
        spark.range(path_hi, chain_hi - 1)
        .filter((F.col("id") - path_hi) % 1000 != 999)
        .select(F.col("id").alias("u"), (F.col("id") + 1).alias("v"))
    )
    stars = (
        spark.range(chain_hi, star_hi)
        .withColumn("off", (F.col("id") - chain_hi) % 100)
        .filter(F.col("off") > 0)
        .select((F.col("id") - F.col("off")).alias("u"), F.col("id").alias("v"))
    )
    pairs2 = (
        spark.range(star_hi, pair_hi - 1)
        .filter((F.col("id") - star_hi) % 2 == 0)
        .select(F.col("id").alias("u"), (F.col("id") + 1).alias("v"))
    )
    edges = giant.union(chains).union(stars).union(pairs2).select(
        perm(F.col("u")).alias("id_a"), perm(F.col("v")).alias("id_b")
    )
    from collections import Counter

    hist: Counter = Counter()
    hist[path_hi] += 1
    # chain/star regions may leave a remainder block at non-canonical N
    # (the 5000-node pytest size); the remainder is its own component,
    # or a singleton when it is one node wide
    for region, width in ((chain_hi - path_hi, 1000), (star_hi - chain_hi, 100)):
        full, rem = divmod(region, width)
        hist[width] += full
        if rem == 1:
            hist[1] += 1
        elif rem > 1:
            hist[rem] += 1
    pair_region = pair_hi - star_hi
    hist[2] += pair_region // 2
    hist[1] += pair_region % 2
    hist[1] += n - pair_hi
    return edges, dict(hist)


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # this probe measures the DISTRIBUTED star loop's scaling — disable
    # the r16 small-graph driver-solve shortcut for its duration
    import mbfbigdatarandomforest_spark.operators.dedup as _dd

    _dd.CC_DRIVER_SOLVE_MAX_EDGES = -1
    out: dict[int, dict] = {}
    for k in KS:
        n = BASE_N * k
        probe_path = f"/tmp/cc_probe_k{k}"
        edges, want_hist = planted_graph(spark, n)
        # materialize: every rep times a real columnar scan, not the
        # range-arithmetic lineage
        if not os.path.isdir(f"{probe_path}/pairs.parquet"):
            edges.write.mode("overwrite").parquet(f"{probe_path}/pairs.parquet")
        pairs = spark.read.parquet(f"{probe_path}/pairs.parquet")
        edges_in = pairs.count()

        walls, stats = [], {}
        for _ in range(REPS):
            spark.catalog.clearCache()
            stats = {}
            t0 = time.time()
            cc = connected_components(pairs, stats=stats)
            cc.write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)

        # full dedup_clusters pass (adds the left join + size window +
        # singleton coalesce) with the EXACT histogram check
        docs = spark.range(n).select(F.col("id").alias("doc_id"))
        t0 = time.time()
        got_hist = {
            int(r["cluster_size"]): int(r["n"])
            for r in dedup_clusters(docs, pairs)
            .groupBy("cluster_size")
            .agg((F.count(F.lit(1)) / F.col("cluster_size")).alias("n"))
            .collect()
        }
        clusters_wall = time.time() - t0
        out[k] = {
            "nodes": n,
            "edges_in": edges_in,
            "wall_s": round(min(walls), 2),
            "spread": round(max(walls) / min(walls), 2),
            "clusters_wall_s": round(clusters_wall, 2),
            "rounds": stats.get("rounds"),
            "edge_counts": stats.get("edge_counts"),
            "round_walls_s": stats.get("round_walls_s"),
            # r10 (verdict item 4): persisted checkpoint RDDs live above
            # the caller baseline after each round — must stay ≤2 (the
            # prior round's blocks are now unpersisted deterministically,
            # not left to ContextCleaner's GC-driven queue)
            "live_ckpt_per_round": stats.get("live_ckpt_rdds"),
            "live_ckpt_max": max(stats.get("live_ckpt_rdds") or [0]),
            "hist_ok": got_hist == want_hist,
            "components": sum(want_hist.values()),
        }
        if not out[k]["hist_ok"]:
            out[k]["hist_got"] = got_hist
            out[k]["hist_want"] = want_hist
        print(f"## K={k}: {out[k]}", file=sys.stderr, flush=True)
    print(json.dumps({"base_n": BASE_N, "reps": REPS, "runs": out}))


if __name__ == "__main__":
    main()
