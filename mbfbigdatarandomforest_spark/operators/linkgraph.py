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

    # the edge frame is reused EVERY round — checkpoint it once so the
    # upstream plan (scan + derivation + distinct) runs once, not
    # max_iter times; freed before returning (the result frame's
    # lineage is truncated, it never reads e again)
    e, e_ids = _ckpt(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # baseline AFTER the edge checkpoint: live_ckpt_rdds measures the
    # per-ITERATION discipline (rank frames), with e a constant O(E)
    # resident for the call's duration
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
        _free(base_ids | e_ids)
        # empty result typed from the INPUT edge column (string-keyed
        # domain graphs must not come back long-keyed — ADVICE r10);
        # built on the CALLER's lineage, never the freed checkpoints
        return (
            edges.select(F.col(src).alias("node"))
            .limit(0)
            .select("node", F.lit(0.0).alias("rank"))
        )

    ranks, rank_ids = _ckpt(
        base.select("node", "out_deg", F.lit(1.0 / n).alias("rank"))
    )
    # the initial rank checkpoint is eager and truncates lineage, so the
    # degree frame's blocks are dead from here — free them NOW (the CC
    # discipline: never leave O(V) blocks to ride ContextCleaner's
    # GC-driven queue; ADVICE r10)
    _free(base_ids)

    # size the LOOP's shuffles to the graph: state is O(V), known here,
    # and a domain graph is often tiny relative to the corpus that
    # derived it — 20 rounds of session-default-width shuffle stages on
    # a 9-node gate graph is pure scheduling overhead (measured 3x on
    # the gate fixture). ~250k state rows per reduce task; restored in
    # the finally. At 100 TB (V in the millions) this resolves to the
    # session default again.
    sess = edges.sparkSession
    sp_key = "spark.sql.shuffle.partitions"
    old_sp = sess.conf.get(sp_key)
    loop_parts = max(1, min(int(old_sp), -(-n // 250_000)))
    sess.conf.set(sp_key, str(loop_parts))
    d = float(damping)
    try:
        # round-0 dangling mass; every later round's is folded into the
        # SAME 1-row aggregate as the convergence delta (one driver
        # action per round, not two — the scheduling floor for
        # iterative jobs)
        dangling_mass = float(
            ranks.filter(F.col("out_deg") == 0)
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        for _ in range(max_iter):
            contrib = (
                e.join(
                    # dangling nodes carry no edges (their mass moves
                    # via the fused aggregate) — filtering first also
                    # keeps the division ANSI-safe
                    ranks.filter(F.col("out_deg") > 0).select(
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
            # the 1-row convergence aggregate is needed to (a) decide a
            # tol-stop, (b) refresh dangling mass, (c) feed the stats
            # probe. In fixed-iteration mode (tol<=0) on a graph with NO
            # dangling nodes (mass starts 0 and provably stays 0) with
            # no probe attached, it is pure overhead — skip it and run
            # ONE job per round (the eager checkpoint).
            need_agg = tol > 0 or dangling_mass > 0 or stats is not None
            if need_agg:
                fused = nxt.agg(
                    F.sum(F.abs(F.col("rank") - F.col("__prev"))).alias(
                        "delta"
                    ),
                    F.coalesce(
                        F.sum(F.when(F.col("out_deg") == 0, F.col("rank"))),
                        F.lit(0.0),
                    ).alias("dangling"),
                ).collect()[0]
                delta, dangling_mass = (
                    float(fused["delta"]),
                    float(fused["dangling"]),
                )
            else:
                delta = float("inf")
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
    finally:
        sess.conf.set(sp_key, old_sp)
    # the final rank frame IS the checkpoint — O(V), same order as the
    # result itself; every earlier round's blocks were freed in-loop,
    # and the result's lineage is truncated so the edge checkpoint is
    # dead too
    _free(e_ids)
    return ranks.select("node", "rank")
