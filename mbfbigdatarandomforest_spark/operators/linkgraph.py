"""Link-graph analysis for crawl curation (written r10, wired r11):
PageRank over a (src, dst[, weight]) edge list — the classic
crawl-frontier / domain-quality signal (Page et al. 1999; production
pipelines rank domains by link authority before spending fetch/compute
budget on them), with optional personalization (the TrustRank shape,
Gyöngyi et al. 2004) and a real-HTML edge derivation
(:func:`page_link_edges`: anchor extraction → absolutization →
registered-domain projection → weighted edges).

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

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: Below these bounds the whole graph state fits comfortably on the
#: driver and the power iteration runs there (r16 — VERDICT r15 item 4:
#: the registered linkgraph queries run 10-20 FIXED rounds over 9-node
#: domain graphs, so their wall was ~20+ scheduler-floor jobs — pure
#: per-round latency, the exact pathology the sampled k-means fit
#: removed from IVF builds; the 4.5 → 6.2 s drift across rounds was
#: this floor wobbling with host scheduling, not a plan change). The
#: arithmetic mirrors the distributed loop term for term; above the
#: bounds — the 100 TB posture, V in the millions — the distributed
#: E-shuffle loop below runs unchanged.
DRIVER_SOLVE_MAX_NODES = 100_000
DRIVER_SOLVE_MAX_EDGES = 1_000_000


def _collect_small_graph(e, base, traw_cols: list[str]):
    """Bounded driver collects for the small-graph solve: the node
    count is already known ≤ DRIVER_SOLVE_MAX_NODES; edge rows are
    probed with a capped limit-collect and the solve is declined
    (None) when they exceed DRIVER_SOLVE_MAX_EDGES. Edges are
    lexsorted (src, dst) so the float accumulation order — and with it
    the result at the bit level — is deterministic across sessions and
    shuffle orders."""
    import numpy as np

    erows = e.limit(DRIVER_SOLVE_MAX_EDGES + 1).collect()
    if len(erows) > DRIVER_SOLVE_MAX_EDGES:
        return None
    brows = base.collect()
    nodes = [r["node"] for r in brows]
    idx = {v: i for i, v in enumerate(nodes)}
    out_w = np.array([float(r["out_w"]) for r in brows], dtype=np.float64)
    t_raw = np.array(
        [[float(r[c]) for c in traw_cols] for r in brows], dtype=np.float64
    )
    src_idx = np.array([idx[r["src"]] for r in erows], dtype=np.int64)
    dst_idx = np.array([idx[r["dst"]] for r in erows], dtype=np.int64)
    w = np.array([float(r["w"]) for r in erows], dtype=np.float64)
    order = np.lexsort((dst_idx, src_idx))
    return nodes, out_w, t_raw, src_idx[order], dst_idx[order], w[order]


def _np_pagerank_rounds(out_w, T, src_idx, dst_idx, w, d, max_iter, tol):
    """The power iteration on driver numpy — the distributed loop's
    formula term for term (init rank = t; per round: dangling mass
    from the CURRENT ranks, unit = rank/out_w on non-dangling sources,
    in_sum via indexed accumulation, rank' = t·(1-d+d·dangling) +
    d·in_sum; stop when every column's L1 delta ≤ tol). ``T`` is the
    (n, k) matrix of NORMALIZED teleport columns; returns the (n, k)
    rank matrix and the per-round list of max-column L1 deltas."""
    import numpy as np

    rank = T.copy()
    dang = out_w == 0.0
    nz = ~dang
    k = T.shape[1]
    deltas: list[float] = []
    for _ in range(max_iter):
        dangling = (
            rank[dang].sum(axis=0) if dang.any() else np.zeros(k)
        )
        unit = np.zeros_like(rank)
        unit[nz] = rank[nz] / out_w[nz, None]
        in_sum = np.zeros_like(rank)
        np.add.at(in_sum, dst_idx, unit[src_idx] * w[:, None])
        new = T * ((1.0 - d) + d * dangling)[None, :] + d * in_sum
        delta = float(np.abs(new - rank).sum(axis=0).max()) if k else 0.0
        rank = new
        deltas.append(delta)
        if delta <= tol:
            break
    return rank, deltas


def _np_hits_rounds(n, src_idx, dst_idx, w, max_iter, tol, track):
    """HITS on driver numpy — the distributed loop term for term:
    Gauss-Seidel halves (a' = Aᵀh then h' = A·a'), per-round L2
    normalization + hub L1 delta in ``track`` mode, the every-5-rounds
    overflow rescale + one final normalization otherwise. Returns
    (hub, authority, per-round hub deltas)."""
    import numpy as np

    hub = np.ones(n, dtype=np.float64)
    auth = np.zeros(n, dtype=np.float64)
    deltas: list[float] = []
    for it in range(max_iter):
        a_un = np.zeros(n, dtype=np.float64)
        np.add.at(a_un, dst_idx, hub[src_idx] * w)
        h_un = np.zeros(n, dtype=np.float64)
        np.add.at(h_un, src_idx, a_un[dst_idx] * w)
        prev_hub = hub
        auth, hub = a_un, h_un
        if track:
            hub = hub / float(np.sqrt((hub * hub).sum()))
            auth = auth / float(np.sqrt((auth * auth).sum()))
            deltas.append(float(np.abs(hub - prev_hub).sum()))
            if tol > 0 and deltas[-1] <= tol:
                break
        elif (it + 1) % 5 == 0 and it + 1 < max_iter:
            hub = hub / float(np.sqrt((hub * hub).sum()))
            auth = auth / float(np.sqrt((auth * auth).sum()))
    if not track:
        hub = hub / float(np.sqrt((hub * hub).sum()))
        auth = auth / float(np.sqrt((auth * auth).sum()))
    return hub, auth, deltas


def _ckpt_tools(df: DataFrame):
    """(persisted_ids, ckpt, free) bound to df's SparkContext — the
    deterministic checkpoint-free discipline shared by both iterative
    operators here (and pioneered by ``dedup.connected_components``)."""
    jsc = df.sparkSession.sparkContext._jsc

    def persisted_ids() -> set[int]:
        return {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}

    def ckpt(frame: DataFrame) -> tuple[DataFrame, set[int]]:
        before = persisted_ids()
        out = frame.localCheckpoint()
        return out, persisted_ids() - before

    def free(ids: set[int]) -> None:
        jmap = jsc.getPersistentRDDs()
        for i in ids:
            jrdd = jmap.get(i)
            if jrdd is not None:
                jrdd.unpersist(False)

    return persisted_ids, ckpt, free


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 25,
    tol: float = 1e-6,
    weight: str | None = None,
    teleport: DataFrame | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """(node, rank) for every node appearing in ``edges``; ranks sum
    to 1. Self-loops are dropped. ``stats`` (optional) is filled with
    ``rounds``, per-round ``l1_deltas`` and ``live_ckpt_rdds`` — the
    probe hook.

    Semantics (the standard formulation, with t the teleport vector —
    uniform 1/N unless ``teleport`` is given): init rank = t;
    rank' = t·(1-d + d·dangling) + d·Σ incoming rank·w/out_weight;
    stop when the L1 delta ≤ ``tol`` or at ``max_iter``.

    ``weight`` (r11): an edge column of POSITIVE link weights — the
    domain graph's natural multiplicity (how many pages of src link to
    dst). Parallel (src, dst) rows SUM their weights; a node's
    contribution splits ∝ weight instead of 1/out_degree. Unweighted
    (default), parallel edges count once — the link exists.

    ``teleport`` (r11): a (node, seed) frame → PERSONALIZED PageRank,
    the TrustRank shape (Gyöngyi et al. 2004): random jumps land on
    seed nodes ∝ their (normalized) seed mass instead of uniformly,
    and dangling mass redistributes the same way — authority measured
    FROM a trusted set, the crawl-frontier anti-spam signal. Nodes
    absent from the frame get teleport 0 (reachable only through
    links); init is the teleport vector. The frame is aggregated to
    one O(seeds) pass, never collected."""
    _persisted_ids, _ckpt, _free = _ckpt_tools(edges)

    # the edge frame is reused EVERY round — checkpoint it once so the
    # upstream plan (scan + derivation + distinct/weight-sum) runs
    # once, not max_iter times; freed before returning (the result
    # frame's lineage is truncated, it never reads e again)
    if weight is None:
        hygienic = (
            edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .withColumn("w", F.lit(1.0))
        )
    else:
        hygienic = (
            edges.select(
                F.col(src).alias("src"),
                F.col(dst).alias("dst"),
                F.col(weight).cast("double").alias("w"),
            )
            .filter((F.col("src") != F.col("dst")) & (F.col("w") > 0))
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
        )
    e, e_ids = _ckpt(hygienic)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # baseline AFTER the edge checkpoint: live_ckpt_rdds measures the
    # per-ITERATION discipline (rank frames), with e a constant O(E)
    # resident for the call's duration
    ckpt_baseline = len(_persisted_ids())
    deg = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # raw teleport mass per node: 1.0 everywhere (uniform) or the seed
    # weight (personalized; absent nodes 0) — ONE formula downstream,
    # because uniform IS the teleport vector (1/N after normalization)
    if teleport is None:
        with_t = nodes.withColumn("t_raw", F.lit(1.0))
    else:
        seeds = teleport.groupBy(F.col("node").alias("s_node")).agg(
            F.sum("seed").cast("double").alias("t_raw")
        )
        with_t = nodes.join(
            seeds, nodes.node == seeds.s_node, "left"
        ).select("node", F.coalesce("t_raw", F.lit(0.0)).alias("t_raw"))
    # node frame with out-weight (0 = dangling) + raw teleport,
    # checkpointed once — consumed only to seed the state frame
    base, base_ids = _ckpt(
        with_t.join(deg, with_t.node == deg.src, "left").select(
            "node",
            F.coalesce("out_w", F.lit(0.0)).alias("out_w"),
            "t_raw",
        )
    )
    n_row = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t_raw").alias("t_total"),
        # dangling presence decided STRUCTURALLY (out_w == 0), not from
        # current dangling MASS: with a personalized teleport a dangling
        # node can start at rank 0 (seed mass 0), so mass-based
        # detection would disable the redistribution aggregate for the
        # whole run and leak rank once links flow mass into it
        F.sum(F.when(F.col("out_w") == 0, 1).otherwise(0)).alias(
            "n_dangling"
        ),
    ).collect()[0]
    n = int(n_row["n"])
    t_total = float(n_row["t_total"] or 0.0)
    has_dangling = int(n_row["n_dangling"] or 0) > 0
    if teleport is not None and n > 0 and t_total <= 0:
        raise ValueError(
            "teleport frame puts no positive seed mass on any graph node"
        )
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

    if n <= DRIVER_SOLVE_MAX_NODES:
        small = _collect_small_graph(e, base, ["t_raw"])
        if small is not None:
            from pyspark.sql.types import DoubleType, StructField, StructType

            node_dt = base.schema["node"].dataType
            _free(base_ids | e_ids)
            node_vals, out_w, t_raw, si, di, w_arr = small
            rank, deltas = _np_pagerank_rounds(
                out_w, t_raw / t_total, si, di, w_arr,
                float(damping), max_iter, tol,
            )
            if stats is not None:
                stats["rounds"] = len(deltas)
                stats["l1_deltas"] = deltas
                stats["live_ckpt_rdds"] = [0] * len(deltas)
            spark = edges.sparkSession
            return spark.createDataFrame(
                [(v, float(r)) for v, r in zip(node_vals, rank[:, 0])],
                StructType(
                    [
                        StructField("node", node_dt),
                        StructField("rank", DoubleType()),
                    ]
                ),
            )

    # normalized teleport rides the state frame; init rank = teleport
    # (uniform: exactly the old 1/N start)
    ranks, rank_ids = _ckpt(
        base.select(
            "node",
            "out_w",
            (F.col("t_raw") / F.lit(t_total)).alias("t"),
            (F.col("t_raw") / F.lit(t_total)).alias("rank"),
        )
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
    try:
        loop_parts = max(1, min(int(old_sp), -(-n // 250_000)))
    except (TypeError, ValueError):
        # conf not a plain integer (e.g. "auto" on some deployments) —
        # skip the loop-width override rather than fail before work
        loop_parts = None
    if loop_parts is not None:
        sess.conf.set(sp_key, str(loop_parts))
    d = float(damping)
    try:
        # round-0 dangling mass; every later round's is folded into the
        # SAME 1-row aggregate as the convergence delta (one driver
        # action per round, not two — the scheduling floor for
        # iterative jobs)
        dangling_mass = float(
            ranks.filter(F.col("out_w") == 0)
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        for _ in range(max_iter):
            contrib = (
                e.join(
                    # dangling nodes carry no edges (their mass moves
                    # via the fused aggregate) — filtering first also
                    # keeps the division ANSI-safe
                    ranks.filter(F.col("out_w") > 0).select(
                        F.col("node").alias("src"),
                        (F.col("rank") / F.col("out_w")).alias("unit"),
                    ),
                    "src",
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum(F.col("unit") * F.col("w")).alias("in_sum"))
            )
            # rank' = t·(1-d + d·dangling) + d·in_sum  — the uniform
            # case is this same formula with t ≡ 1/N
            t_mult = (1.0 - d) + d * dangling_mass
            nxt, nxt_ids = _ckpt(
                ranks.join(contrib, "node", "left")
                .select(
                    "node",
                    "out_w",
                    "t",
                    (
                        F.col("t") * F.lit(t_mult)
                        + F.lit(d) * F.coalesce(F.col("in_sum"), F.lit(0.0))
                    ).alias("rank"),
                    F.col("rank").alias("__prev"),
                )
            )
            # the 1-row convergence aggregate is needed to (a) decide a
            # tol-stop, (b) refresh dangling mass, (c) feed the stats
            # probe. In fixed-iteration mode (tol<=0) on a graph with NO
            # dangling nodes (structurally: no out_w==0 node exists, so
            # the mass is 0 every round) with no probe attached, it is
            # pure overhead — skip it and run ONE job per round (the
            # eager checkpoint).
            need_agg = tol > 0 or has_dangling or stats is not None
            if need_agg:
                fused = nxt.agg(
                    F.sum(F.abs(F.col("rank") - F.col("__prev"))).alias(
                        "delta"
                    ),
                    F.coalesce(
                        F.sum(F.when(F.col("out_w") == 0, F.col("rank"))),
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
            ranks, rank_ids = nxt.select("node", "out_w", "t", "rank"), nxt_ids
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


def pagerank_multi(
    edges: DataFrame,
    teleports: dict[str, DataFrame | None],
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 25,
    weight: str | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Batched PageRank (r12): ONE power-iteration loop computing a
    rank column per named teleport vector (None = uniform, a frame =
    personalized/TrustRank — :func:`pagerank`'s ``teleport`` contract)
    over the same edge frame. k personalizations SHARE the per-round
    E-join + dst-groupBy instead of paying k full loops — the batch-
    personalized-PageRank production shape: at gate scale the win is
    pure scheduling (one loop's jobs instead of k), at 100 TB it is
    k-1 fewer E-shuffles per round, the dominant cost. Fixed iteration
    count by design (deterministic for cross-engine twins — the mode
    every registered linkgraph query runs); per-column semantics are
    exactly ``pagerank(teleport=..., tol=0.0, max_iter=...)``: same
    init, same dangling redistribution, same update. Returns
    (node, <name> for each key), each column summing to 1."""
    if not teleports:
        raise ValueError("teleports must name at least one rank column")
    # teleport keys become internal (__traw_/__t_/__r_{name}) and final
    # output column names — reserved names or characters F.col parses
    # specially (dots, backticks) would produce duplicate/ambiguous
    # columns deep inside the loop, so reject them up front
    _ident = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
    for name in teleports:
        if name in ("node", "src", "dst", "w", "out_w"):
            raise ValueError(
                f"teleport name {name!r} collides with an internal "
                "column; pick another rank-column name"
            )
        if not _ident.match(name):
            raise ValueError(
                f"teleport name {name!r} must be an identifier "
                "([A-Za-z_][A-Za-z0-9_]*) — it becomes a column name"
            )
    names = list(teleports)
    _persisted_ids, _ckpt, _free = _ckpt_tools(edges)

    if weight is None:
        hygienic = (
            edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .withColumn("w", F.lit(1.0))
        )
    else:
        hygienic = (
            edges.select(
                F.col(src).alias("src"),
                F.col(dst).alias("dst"),
                F.col(weight).cast("double").alias("w"),
            )
            .filter((F.col("src") != F.col("dst")) & (F.col("w") > 0))
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
        )
    e, e_ids = _ckpt(hygienic)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    ckpt_baseline = len(_persisted_ids())
    deg = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    with_t = nodes
    for name in names:
        tp = teleports[name]
        if tp is None:
            with_t = with_t.withColumn(f"__traw_{name}", F.lit(1.0))
        else:
            seeds = tp.groupBy(F.col("node").alias("__s_node")).agg(
                F.sum("seed").cast("double").alias(f"__traw_{name}")
            )
            with_t = with_t.join(
                seeds, with_t["node"] == seeds["__s_node"], "left"
            ).drop("__s_node").withColumn(
                f"__traw_{name}",
                F.coalesce(f"__traw_{name}", F.lit(0.0)),
            )
    base, base_ids = _ckpt(
        with_t.join(deg, with_t["node"] == deg["src"], "left").select(
            "node",
            F.coalesce("out_w", F.lit(0.0)).alias("out_w"),
            *[f"__traw_{n}" for n in names],
        )
    )
    agg_row = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("out_w") == 0, 1).otherwise(0)).alias(
            "n_dangling"
        ),
        *[F.sum(f"__traw_{n}").alias(f"__tt_{n}") for n in names],
    ).collect()[0]
    n = int(agg_row["n"])
    has_dangling = int(agg_row["n_dangling"] or 0) > 0
    t_totals = {n_: float(agg_row[f"__tt_{n_}"] or 0.0) for n_ in names}
    for name in names:
        if teleports[name] is not None and n > 0 and t_totals[name] <= 0:
            raise ValueError(
                f"teleport {name!r} puts no positive seed mass on any "
                "graph node"
            )
    if stats is not None:
        stats["rounds"] = 0
        stats["live_ckpt_rdds"] = []
        stats["n_nodes"] = n
    if n == 0:
        _free(base_ids | e_ids)
        out = edges.select(F.col(src).alias("node")).limit(0)
        return out.select(
            "node", *[F.lit(0.0).alias(n_) for n_ in names]
        )

    if n <= DRIVER_SOLVE_MAX_NODES:
        small = _collect_small_graph(
            e, base, [f"__traw_{n_}" for n_ in names]
        )
        if small is not None:
            import numpy as np
            from pyspark.sql.types import DoubleType, StructField, StructType

            node_dt = base.schema["node"].dataType
            _free(base_ids | e_ids)
            node_vals, out_w, t_raw, si, di, w_arr = small
            T = t_raw / np.array(
                [t_totals[n_] for n_ in names], dtype=np.float64
            )[None, :]
            # fixed-iteration mode by contract: tol=-1 never stops early
            rank, deltas = _np_pagerank_rounds(
                out_w, T, si, di, w_arr, float(damping), max_iter, -1.0
            )
            if stats is not None:
                stats["rounds"] = len(deltas)
                stats["live_ckpt_rdds"] = [0] * len(deltas)
            spark = edges.sparkSession
            return spark.createDataFrame(
                [
                    (v, *[float(x) for x in rank[i]])
                    for i, v in enumerate(node_vals)
                ],
                StructType(
                    [StructField("node", node_dt)]
                    + [StructField(n_, DoubleType()) for n_ in names]
                ),
            )

    ranks, rank_ids = _ckpt(
        base.select(
            "node",
            "out_w",
            *[
                (F.col(f"__traw_{n_}") / F.lit(t_totals[n_])).alias(
                    f"__t_{n_}"
                )
                for n_ in names
            ],
            *[
                (F.col(f"__traw_{n_}") / F.lit(t_totals[n_])).alias(
                    f"__r_{n_}"
                )
                for n_ in names
            ],
        )
    )
    _free(base_ids)

    sess = edges.sparkSession
    sp_key = "spark.sql.shuffle.partitions"
    old_sp = sess.conf.get(sp_key)
    try:
        loop_parts = max(1, min(int(old_sp), -(-n // 250_000)))
    except (TypeError, ValueError):
        loop_parts = None
    if loop_parts is not None:
        sess.conf.set(sp_key, str(loop_parts))
    d = float(damping)
    try:
        if has_dangling:
            dr = ranks.filter(F.col("out_w") == 0).agg(
                *[
                    F.coalesce(F.sum(f"__r_{n_}"), F.lit(0.0)).alias(n_)
                    for n_ in names
                ]
            ).collect()[0]
            dangling = {n_: float(dr[n_]) for n_ in names}
        else:
            dangling = {n_: 0.0 for n_ in names}
        for _ in range(max_iter):
            contrib = (
                e.join(
                    ranks.filter(F.col("out_w") > 0).select(
                        F.col("node").alias("src"),
                        *[
                            (F.col(f"__r_{n_}") / F.col("out_w")).alias(
                                f"__u_{n_}"
                            )
                            for n_ in names
                        ],
                    ),
                    "src",
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(
                    *[
                        F.sum(F.col(f"__u_{n_}") * F.col("w")).alias(
                            f"__in_{n_}"
                        )
                        for n_ in names
                    ]
                )
            )
            nxt, nxt_ids = _ckpt(
                ranks.join(contrib, "node", "left").select(
                    "node",
                    "out_w",
                    *[f"__t_{n_}" for n_ in names],
                    *[
                        (
                            F.col(f"__t_{n_}")
                            * F.lit((1.0 - d) + d * dangling[n_])
                            + F.lit(d)
                            * F.coalesce(F.col(f"__in_{n_}"), F.lit(0.0))
                        ).alias(f"__r_{n_}")
                        for n_ in names
                    ],
                )
            )
            if has_dangling:
                dr = nxt.agg(
                    *[
                        F.coalesce(
                            F.sum(
                                F.when(
                                    F.col("out_w") == 0, F.col(f"__r_{n_}")
                                )
                            ),
                            F.lit(0.0),
                        ).alias(n_)
                        for n_ in names
                    ]
                ).collect()[0]
                dangling = {n_: float(dr[n_]) for n_ in names}
            _free(rank_ids)
            ranks, rank_ids = nxt, nxt_ids
            if stats is not None:
                stats["rounds"] += 1
                stats["live_ckpt_rdds"].append(
                    len(_persisted_ids()) - ckpt_baseline
                )
    finally:
        sess.conf.set(sp_key, old_sp)
    _free(e_ids)
    return ranks.select(
        "node", *[F.col(f"__r_{n_}").alias(n_) for n_ in names]
    )


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    tol: float = 0.0,
    weight: str | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) — the complementary
    link-graph signal to :func:`pagerank`: authorities are pages many
    good hubs point AT, hubs point at many good authorities. In crawl
    curation the pair separates content domains (high authority) from
    link-farm/directory domains (high hub, low authority).

    Classic sequential update per round — a' = Aᵀh then h' = A·a'
    (Gauss-Seidel order; the simultaneous variant can oscillate between
    the ±σ eigen-pair) — each half one equi-join + one groupBy, L2
    normalization via a 1-row aggregate, the PageRank checkpoint
    discipline throughout (prior round freed deterministically).
    ``tol`` ≤ 0 (default) runs exactly ``max_iter`` rounds —
    deterministic for cross-engine twins; tol > 0 adds one delta
    aggregate per round and stops at L1(hub−hub_prev) ≤ tol.
    Self-loops dropped; unweighted, parallel edges count once.
    ``weight`` (same contract as :func:`pagerank`): positive link
    weights, parallel (src, dst) rows sum, both halves accumulate
    w-scaled mass — the weighted-adjacency HITS generalization.
    Returns (node, hub, authority), each vector L2-normalized."""
    _persisted_ids, _ckpt, _free = _ckpt_tools(edges)

    if weight is None:
        hygienic = (
            edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .withColumn("w", F.lit(1.0))
        )
    else:
        hygienic = (
            edges.select(
                F.col(src).alias("src"),
                F.col(dst).alias("dst"),
                F.col(weight).cast("double").alias("w"),
            )
            .filter((F.col("src") != F.col("dst")) & (F.col("w") > 0))
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
        )
    e, e_ids = _ckpt(hygienic)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    ckpt_baseline = len(_persisted_ids())
    state, state_ids = _ckpt(
        nodes.select("node", F.lit(1.0).alias("hub"), F.lit(0.0).alias("auth"))
    )
    n = state.count()
    if stats is not None:
        stats["rounds"] = 0
        stats["l1_hub_deltas"] = []
        stats["live_ckpt_rdds"] = []
        stats["n_nodes"] = n
    if n == 0:
        _free(state_ids | e_ids)
        return (
            edges.select(F.col(src).alias("node"))
            .limit(0)
            .select("node", F.lit(0.0).alias("hub"), F.lit(0.0).alias("auth"))
        )

    if n <= DRIVER_SOLVE_MAX_NODES:
        small = _collect_small_graph(
            e, state.withColumn("out_w", F.lit(0.0)), []
        )
        if small is not None:
            from pyspark.sql.types import DoubleType, StructField, StructType

            node_dt = state.schema["node"].dataType
            _free(state_ids | e_ids)
            node_vals, _, _, si, di, w_arr = small
            hub, auth, deltas = _np_hits_rounds(
                len(node_vals), si, di, w_arr, max_iter, tol,
                track=(tol > 0 or stats is not None),
            )
            if stats is not None:
                stats["rounds"] = len(deltas)
                stats["l1_hub_deltas"] = deltas
                stats["live_ckpt_rdds"] = [0] * len(deltas)
            spark = edges.sparkSession
            return spark.createDataFrame(
                [
                    (v, float(hub[i]), float(auth[i]))
                    for i, v in enumerate(node_vals)
                ],
                StructType(
                    [
                        StructField("node", node_dt),
                        StructField("hub", DoubleType()),
                        StructField("authority", DoubleType()),
                    ]
                ),
            )

    sess = edges.sparkSession
    sp_key = "spark.sql.shuffle.partitions"
    old_sp = sess.conf.get(sp_key)
    try:
        sess.conf.set(
            sp_key, str(max(1, min(int(old_sp), -(-n // 250_000))))
        )
    except (TypeError, ValueError):
        pass  # non-integer conf (e.g. "auto") — leave the width alone
    # Normalization is a scalar multiply and both update maps are
    # linear, so the direction sequence is invariant to WHEN we
    # rescale. Fixed-iteration mode with no probe (what every
    # registered query runs) pays ONE eager checkpoint per round and
    # NOTHING else (r13, VERDICT item 2 — pagerank's fixed-iteration
    # shape): both halves ride one lineage (h_un = A·a_un needs only
    # the aggregated a_un frame — nodes with no incoming mass
    # contribute 0 to every hub sum, so the intermediate
    # auth-on-every-node frame never needs materializing; Catalyst's
    # ReuseExchange collapses the duplicated a_un subtree), and the
    # every-5-rounds overflow rescale folds into the NEXT round's
    # checkpoint job as a broadcast 1-row aggregate — zero mid-loop
    # driver actions. Overflow guard: values grow by ≤ σ₁² ≤
    # (n·max_deg) per round; 5 unrescaled rounds stay far inside
    # double range for any graph that fits a cluster. Convergence mode
    # (tol>0 or stats) keeps the classic per-round normalization —
    # the delta needs it.
    track = tol > 0 or stats is not None
    norm_every = 1 if track else 5

    def _rescaled(frame: DataFrame) -> DataFrame:
        """L2-rescale both vectors WITHOUT a driver action: the 1-row
        norm aggregate broadcasts into the consuming job's plan."""
        norms = frame.agg(
            F.sqrt(F.sum(F.col("hub") * F.col("hub"))).alias("__hn"),
            F.sqrt(F.sum(F.col("auth") * F.col("auth"))).alias("__an"),
        )
        return frame.crossJoin(F.broadcast(norms)).select(
            "node",
            (F.col("hub") / F.col("__hn")).alias("hub"),
            (F.col("auth") / F.col("__an")).alias("auth"),
        )

    try:
        for it in range(max_iter):
            # authority half: a_un = Aᵀ·h, aggregated once per round
            a_in = (
                e.join(
                    state.select(F.col("node").alias("src"), "hub"), "src"
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum(F.col("hub") * F.col("w")).alias("a_un"))
            )
            # hub half: h_un = A·a' — join the aggregated a_un straight
            # back to the edges (absent dsts hold a' = 0: no term)
            h_in = (
                a_in.select(F.col("node").alias("dst"), "a_un")
                .join(e, "dst")
                .groupBy(F.col("src").alias("node"))
                .agg(F.sum(F.col("a_un") * F.col("w")).alias("h_un"))
            )
            nxt, nxt_ids = _ckpt(
                state.join(a_in, "node", "left")
                .join(h_in, "node", "left")
                .select(
                    "node",
                    F.coalesce("a_un", F.lit(0.0)).alias("auth"),
                    F.coalesce("h_un", F.lit(0.0)).alias("hub"),
                    F.col("hub").alias("__prev_hub"),
                )
            )
            _free(state_ids)
            state, state_ids = nxt.select("node", "hub", "auth"), nxt_ids
            if track:
                norms = state.agg(
                    F.sqrt(F.sum(F.col("hub") * F.col("hub"))).alias("hn"),
                    F.sqrt(F.sum(F.col("auth") * F.col("auth"))).alias("an"),
                ).collect()[0]
                h_norm, a_norm = float(norms["hn"]), float(norms["an"])
                state = state.select(
                    "node",
                    (F.col("hub") / F.lit(h_norm)).alias("hub"),
                    (F.col("auth") / F.lit(a_norm)).alias("auth"),
                )
                # __prev_hub is normalized (track mode normalizes every
                # round), so the L1 delta compares like with like
                delta = float(
                    state.join(nxt.select("node", "__prev_hub"), "node")
                    .agg(F.sum(F.abs(F.col("hub") - F.col("__prev_hub"))))
                    .collect()[0][0]
                )
                if stats is not None:
                    stats["rounds"] += 1
                    stats["l1_hub_deltas"].append(delta)
                    stats["live_ckpt_rdds"].append(
                        len(_persisted_ids()) - ckpt_baseline
                    )
                if tol > 0 and delta <= tol:
                    break
            elif (it + 1) % norm_every == 0 and it + 1 < max_iter:
                # overflow rescale, evaluated inside the NEXT round's
                # checkpoint job — no driver action here
                state = _rescaled(state)
    finally:
        sess.conf.set(sp_key, old_sp)
    _free(e_ids)
    # the exact L2 normalization the contract promises, deferred to the
    # caller's first action in fixed-iteration mode
    if not track:
        state = _rescaled(state)
    return state.select("node", "hub", F.col("auth").alias("authority"))


def page_link_edges(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(page url, html) → weighted registered-domain edges
    (src, dst, n_links): the REAL crawl derivation of the link graph —
    anchor hrefs extracted (``text.html_links``, one codegen pass),
    absolutized against the page URL (``text.resolve_link``), kept
    when http(s), projected to registered domains, multiplicity kept
    as the edge weight (feed ``pagerank(..., weight='n_links')``).
    Everything is column expressions + one explode — no Python in the
    path; intra-domain links become self-loops pagerank drops."""
    from .text import html_base_href, html_links, resolve_link
    from .urls import url_registered_domain

    links = pages.select(
        F.col(url_col).alias("__page"),
        html_base_href(F.col(html_col)).alias("__base"),
        F.explode(html_links(F.col(html_col))).alias("__href"),
    ).select(
        "__page",
        resolve_link(
            F.col("__page"), F.col("__href"), F.col("__base")
        ).alias("__link"),
    )
    return (
        links.filter(F.col("__link").isNotNull())
        .select(
            url_registered_domain("__page").alias("src"),
            url_registered_domain("__link").alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )
