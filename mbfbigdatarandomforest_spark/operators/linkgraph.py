"""Link-graph analysis for crawl curation (r10): PageRank over a
(src, dst) edge list — the classic crawl-frontier / domain-quality
signal (Page et al. 1999; production pipelines rank domains by link
authority before spending fetch/compute budget on them).

Spark-first shape, the ``connected_components`` discipline applied to
the second iterative family in the repo:

- state per iteration is ONE (node, rank) frame, O(V);
- each iteration is one equi-join on ``src`` (contributions) + one
  groupBy on ``dst`` (accumulate) — both shuffle on node ids;
- dangling mass (nodes with no out-links) is a 1-row aggregate
  broadcast back, never a driver-side node list;
- convergence is a 1-value L1-delta aggregate per round (the CC
  fingerprint posture: constant driver bytes regardless of V);
- every round ends in ``localCheckpoint`` with the prior round's
  blocks freed DETERMINISTICALLY (persistence-map diff — the r10 CC
  fix), so executor storage stays 2×O(V), not rounds×O(V).

At 100 TB: V = domains (millions) and E = inter-domain links
(billions); rounds are damping-bound (~constant, 15-30), per-round
cost is one E-shuffle — the same profile measured flat for CC in
SCALE.md §15.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 25,
    tol: float = 1e-6,
    stats: dict | None = None,
) -> DataFrame:
    """(node, rank) for every node appearing in ``edges``; ranks sum
    to 1. Parallel edges count once (the link exists); self-loops are
    dropped. ``stats`` (optional) is filled with ``rounds``,
    per-round ``l1_deltas`` and ``live_ckpt_rdds`` — the probe hook.

    Semantics (the standard formulation): uniform init 1/N;
    rank' = (1-d)/N + d·(Σ incoming rank/out_degree + dangling/N);
    stop when the L1 delta ≤ ``tol`` or at ``max_iter``."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )

    jsc = edges.sparkSession.sparkContext._jsc

    def _persisted_ids() -> set[int]:
        return {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}

    def _ckpt(df: DataFrame) -> tuple[DataFrame, set[int]]:
        before = _persisted_ids()
        out = df.localCheckpoint()
        return out, _persisted_ids() - before

    def _free(ids: set[int]) -> None:
        jmap = jsc.getPersistentRDDs()
        for i in ids:
            jrdd = jmap.get(i)
            if jrdd is not None:
                jrdd.unpersist(False)

    ckpt_baseline = len(_persisted_ids())
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # node frame with out-degree (0 = dangling), checkpointed once —
    # reused every round
    base, base_ids = _ckpt(
        nodes.join(deg, nodes.node == deg.src, "left")
        .select("node", F.coalesce("out_deg", F.lit(0)).alias("out_deg"))
    )
    n_row = base.agg(F.count(F.lit(1)).alias("n")).collect()[0]
    n = int(n_row["n"])
    if stats is not None:
        stats["rounds"] = 0
        stats["l1_deltas"] = []
        stats["live_ckpt_rdds"] = []
        stats["n_nodes"] = n
    if n == 0:
        _free(base_ids)
        return edges.sparkSession.createDataFrame(
            [], "node long, rank double"
        )

    ranks, rank_ids = _ckpt(
        base.select("node", "out_deg", F.lit(1.0 / n).alias("rank"))
    )
    d = float(damping)
    for _ in range(max_iter):
        dangling = ranks.filter(F.col("out_deg") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m")
        )
        dangling_mass = float(dangling.collect()[0]["m"])
        contrib = (
            e.join(
                ranks.select(
                    F.col("node").alias("src"),
                    (F.col("rank") / F.col("out_deg")).alias("share"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").alias("in_sum"))
        )
        base_term = (1.0 - d) / n + d * dangling_mass / n
        nxt, nxt_ids = _ckpt(
            ranks.join(contrib, "node", "left")
            .select(
                "node",
                "out_deg",
                (
                    F.lit(base_term)
                    + F.lit(d) * F.coalesce(F.col("in_sum"), F.lit(0.0))
                ).alias("rank"),
                F.col("rank").alias("__prev"),
            )
        )
        delta = float(
            nxt.agg(F.sum(F.abs(F.col("rank") - F.col("__prev")))).collect()[
                0
            ][0]
        )
        _free(rank_ids)
        ranks, rank_ids = nxt.select("node", "out_deg", "rank"), nxt_ids
        if stats is not None:
            stats["rounds"] += 1
            stats["l1_deltas"].append(delta)
            stats["live_ckpt_rdds"].append(
                len(_persisted_ids()) - ckpt_baseline
            )
        if delta <= tol:
            break
    out = ranks.select("node", "rank")
    # NOTE: base stays persisted until the returned frame is consumed;
    # it is O(V) like the result itself. Callers that materialize the
    # result can drop it via spark.catalog.clearCache() or session end.
    return out
