"""Similarity search over embedding columns (north-star extension).

- ``cosine_topk``      : exact brute-force top-k — the correctness
                         baseline. Dot products via higher-order array
                         functions (JVM codegen, no Python). Cost O(n·q);
                         fine when the query set is small and broadcast.
- ``lsh_topk``         : BucketedRandomProjectionLSH approximate kNN —
                         the 100 TB path (probe only colliding buckets).

Embeddings are ``array<float>`` columns; math is done in double on both
engines so results are oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against a bounded query set. Returns
    (query_id, neighbor_id, cosine_sim, rank).

    Shape: the query set (small by contract — it rides the driver and
    every task) is collected once; ONE narrow Arrow-batched pass over
    the corpus scores each batch against all queries vectorized and
    emits only each batch's LOCAL top-k per query, so the final
    per-query window ranks ≈ batches·q·k candidate rows instead of n·q
    scored rows. No corpus shuffle, no per-pair norm recomputation —
    norms are one vectorized pass per batch (corpus) and one per query.

    Bit-exactness contract: dot products and norms accumulate
    dimension-sequentially in float64 — the identical IEEE operation
    order as the ``F.aggregate`` SQL expression and the DuckDB oracle's
    left-to-right ``list_sum``, so emitted cosines are bit-exact vs the
    pure-SQL formulation this replaced (the oracle hash proves it).
    """
    import numpy as np
    import pandas as pd

    q_rows = sorted(
        queries.select(F.col(id_col), F.col(vec_col)).collect(),
        key=lambda r: r[0],
    )
    out_schema = "query_id long, neighbor_id long, cosine_sim double"
    if not q_rows:
        spark = corpus.sparkSession
        scored = spark.createDataFrame([], out_schema)
    else:
        q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
        q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
        q_nrm = _seq_norm(q_mat)
        nq, dim = q_mat.shape

        def _score(batches):
            for pdf in batches:
                n = len(pdf)
                if not n:
                    continue
                vecs = np.array(pdf["v"].tolist(), dtype=np.float64)
                nrm = _seq_norm(vecs)
                dots = np.zeros((n, nq), dtype=np.float64)
                for d in range(dim):  # sequential over dims = exact order
                    dots += vecs[:, d][:, None] * q_mat[:, d][None, :]
                sims = dots / (q_nrm[None, :] * nrm[:, None])
                ids = pdf["id"].to_numpy()
                qs, ns, ss = [], [], []
                for j in range(nq):
                    keep = ids != q_ids[j]
                    cid, csim = ids[keep], sims[keep, j]
                    # local top-k by (sim desc, id asc) — any global
                    # top-k row is a local top-k row under the same
                    # comparator, so the window below stays exact
                    order = np.lexsort((cid, -csim))[:k]
                    qs.append(np.full(len(order), q_ids[j]))
                    ns.append(cid[order])
                    ss.append(csim[order])
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(qs),
                        "neighbor_id": np.concatenate(ns),
                        "cosine_sim": np.concatenate(ss),
                    }
                )

        scored = _narrow_vectors(corpus, id_col, vec_col).mapInPandas(
            _score, schema=out_schema
        )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine_sim", 6).alias("cosine_sim"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def cosine_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact all-pairs baseline).

    O(n²) dot products — the correctness oracle for LSH-based dedup at
    test scale. At 100 TB use ``lsh_topk``/bucketed ANN for candidate
    generation and this only within buckets. Norms are computed once per
    row before the join (not per pair)."""
    normed = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("nrm"),
    )
    a = normed.select(
        F.col("id").alias("id_a"), F.col("v").alias("v_a"), F.col("nrm").alias("n_a")
    )
    b = normed.select(
        F.col("id").alias("id_b"), F.col("v").alias("v_b"), F.col("nrm").alias("n_b")
    )
    pairs = a.join(broadcast(b), F.col("id_a") < F.col("id_b"))
    sim_col = _dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b"))
    return (
        pairs.select("id_a", "id_b", F.round(sim_col, 6).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def _seq_norm(vecs):
    """L2 norms with dimension-sequential float64 accumulation — the
    same IEEE operation order as the ``_norm`` SQL expression and the
    DuckDB oracle's left-to-right sum, so sqrt results are bit-exact."""
    import numpy as np

    acc = np.zeros(vecs.shape[0], dtype=np.float64)
    for d in range(vecs.shape[1]):
        acc += vecs[:, d] * vecs[:, d]
    return np.sqrt(acc)


def _narrow_vectors(corpus: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """The (id, v float64-array) projection every vectorized kernel
    consumes — shared so NULL handling and casting cannot drift between
    the ANN, clustering, and scoring passes."""
    return corpus.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )


def _sq_dists(x, cent, c_sq=None):
    """Squared L2 distances (n, k) via the expansion form
    ``||x||² − 2x·c + ||c||²`` — ONE formula shared by the Lloyd fit
    and every assignment pass so argmin ties cannot disagree between
    them (the subtract-then-square form rounds differently)."""
    import numpy as np

    if c_sq is None:
        c_sq = (cent * cent).sum(axis=1)
    return (x * x).sum(axis=1)[:, None] - 2.0 * (x @ cent.T) + c_sq[None, :]


#: Size-keyed IVF sizing (round-8; the BROADCAST_GRAM_ROWS_MAX
#: precedent): when a caller does not pin ``n_clusters``, pick
#: ceil(n / ANN_TARGET_CELL_ROWS) cells clamped to [MIN, MAX]. The
#: cell-local verify is O(cell²) work per cell — a FIXED cluster count
#: grows verify cost quadratically with the corpus (measured: the 40×
#: probe in SCALE.md §14), while a fixed TARGET CELL SIZE keeps
#: per-cell work constant and total work linear. The MIN floor keeps
#: every ≤16k-row corpus (all test/oracle scales) on exactly the
#: legacy k=16, so auto mode is behavior-identical where the hash
#: gates run.
ANN_TARGET_CELL_ROWS = 1024
ANN_MIN_CLUSTERS = 16
ANN_MAX_CLUSTERS = 4096


def _clusters_for_n(n: int) -> int:
    """The sizing formula on a KNOWN row count (no Spark job)."""
    import math

    return max(
        ANN_MIN_CLUSTERS,
        min(ANN_MAX_CLUSTERS, math.ceil(n / ANN_TARGET_CELL_ROWS)),
    )


def _auto_n_clusters(corpus: DataFrame, n_clusters: int | None) -> int:
    """Resolve an explicit/auto cluster count. NOTE: the auto path runs
    one eager count() job. The IVF builders no longer call this at
    plan-build time — ``_fit_centroids_sampled`` derives n from the
    centroid-fit sample it must collect anyway (exact whenever the
    corpus fits the 65536-row sample cap) and counts only the
    cap-overflow case. Kept for callers that already hold a corpus and
    want the same sizing."""
    if n_clusters is not None:
        return n_clusters
    return _clusters_for_n(corpus.count())


def _fit_centroids_sampled(
    corpus: DataFrame,
    *,
    vec_col: str,
    id_col: str,
    k: int | None,
    seed: int,
    max_iter: int,
    sample_cap: int = 65536,
):
    """Train IVF centroids on a bounded, deterministic sample with
    driver-side Lloyd iterations (numpy).

    ``k=None`` auto-sizes via ``_clusters_for_n`` — and derives the row
    count from the sample this fit must collect anyway: when the corpus
    fits under ``sample_cap`` the sample length IS the exact count
    (zero extra jobs — the r8 design ran a full-scan count() on every
    default-parameter call); only a cap-overflowing corpus pays one
    column-pruned counting job, and there the count is a vanishing
    fraction of the IVF work that follows.

    This is the standard IVF construction (FAISS trains coarse
    quantizers on a sample, not the corpus): centroid quality needs
    only a representative sample, while the ASSIGNMENT stays fully
    distributed. Replacing the distributed KMeans fit removes ~10
    scheduled jobs (k-means|| init + one job per iteration) whose
    latency dominates at small scale and whose full-corpus passes are
    wasted work at large scale. The sample is the first ``sample_cap``
    rows by id (TakeOrdered — no full sort), so centroids are
    deterministic across sessions and partitionings."""
    import numpy as np

    rows = (
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .where(F.col(vec_col).isNotNull())
        .orderBy("id")
        .limit(sample_cap)
        .collect()
    )
    if k is None:
        if len(rows) < sample_cap:
            corpus_n = len(rows)  # the sample IS the corpus — exact
        else:
            corpus_n = (
                corpus.where(F.col(vec_col).isNotNull())
                .select(id_col)
                .count()
            )
        k = _clusters_for_n(corpus_n)
    # quarantine contract: NULLs are filtered Spark-side above; ragged
    # or non-finite vectors are dropped from the fit sample here (the
    # assignment pass marks them cluster −1)
    vals = [r["v"] for r in rows if r["v"] is not None]
    dims = [len(v) for v in vals]
    dim = max(set(dims), key=dims.count) if dims else 0
    x = np.array(
        [v for v in vals if len(v) == dim and None not in v],
        dtype=np.float64,
    )
    x = x[np.isfinite(x).all(axis=1)]
    n = x.shape[0]
    k = min(k, n)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(n, size=k, replace=False)].copy()
    for _ in range(max_iter):
        # expansion form keeps the distance matrix at (n, k) — the
        # broadcasted (n, k, dim) difference tensor would be ~500 MB at
        # the default sample cap
        d2 = _sq_dists(x, cent)
        assign = d2.argmin(axis=1)
        new = np.empty_like(cent)
        for c in range(k):
            members = x[assign == c]
            new[c] = members.mean(axis=0) if len(members) else x[rng.integers(n)]
        if np.allclose(new, cent):
            cent = new
            break
        cent = new
    return cent


def fit_ivf_index(
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int | None = None,
    seed: int = 42,
    max_iter: int = 20,
):
    """Train IVF coarse-quantizer centroids once, for reuse across
    query batches (public face of ``_fit_centroids_sampled``). At
    100 TB the fit is the expensive one-off — production runs persist
    the result with :func:`save_ivf_index` and pass it back to
    ``ann_dup_pairs`` / ``semantic_dedup`` / ``ivf_topk`` via their
    ``centroids=`` parameter instead of refitting per call (the FAISS
    train-once/search-many split; cf. the reference's model sink S5,
    `04_1_XGB_traintest.R:260`, which persists the trained artifact for
    the scoring run)."""
    return _fit_centroids_sampled(
        corpus, vec_col=vec_col, id_col=id_col, k=n_clusters,
        seed=seed, max_iter=max_iter,
    )


def save_ivf_index(spark, centroids, path: str) -> None:
    """Persist (k, dim) float64 centroids through Spark's Hadoop
    filesystem layer (the ``save_lm`` convention: one filesystem
    whether ``path`` is local, HDFS, or s3a; doubles ride parquet, so
    the reload is bit-identical)."""
    import json

    import numpy as np

    from ..sources.sinks import materialize_local

    cent = np.asarray(centroids, dtype=np.float64)
    rows = [(i, [float(x) for x in cent[i]]) for i in range(cent.shape[0])]
    materialize_local(
        spark.createDataFrame(rows, "cluster int, centroid array<double>")
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    meta = json.dumps(
        {"kind": "ivf", "k": int(cent.shape[0]), "dim": int(cent.shape[1])}
    )
    materialize_local(
        spark.createDataFrame([(meta,)], "meta string")
    ).coalesce(1).write.mode("overwrite").text(f"{path}/meta")


def load_ivf_index(spark, path: str):
    """Reload centroids saved by :func:`save_ivf_index` — validated
    against the meta (kind/k/dim) and returned as the same (k, dim)
    float64 array, bit-identical to the fit."""
    import json

    import numpy as np

    meta = json.loads(spark.read.text(f"{path}/meta").first()["value"])
    if meta.get("kind") != "ivf":
        raise ValueError(
            f"{path} does not hold an IVF index (kind={meta.get('kind')})"
        )
    rows = spark.read.parquet(f"{path}/centroids").orderBy("cluster").collect()
    cent = np.array([r["centroid"] for r in rows], dtype=np.float64)
    if cent.shape != (int(meta["k"]), int(meta["dim"])):
        raise ValueError(
            f"IVF index shape {cent.shape} does not match meta "
            f"({meta['k']}, {meta['dim']})"
        )
    return cent


def _cosine_probe_routes(
    narrow: DataFrame,
    centroids,
    n_probe: int,
    *,
    cells_only: bool = False,
    emit_roles: bool = False,
):
    """One narrow mapInPandas pass: each (id, v) row → its ``n_probe``
    cosine-nearest cells, nearest first, with ``is_home`` marking the
    rank-1 cell. Centroids are tiny (k × dim floats) and ride the UDF
    closure — the moral equivalent of a broadcast join against a k-row
    dim table. Stable sort breaks similarity ties toward the lower
    cell id (matching the SQL row_number tiebreak this replaced).
    Shared by :func:`ann_dup_pairs` (intra-corpus) and the r14
    incremental semantic gate.

    ``cells_only=True`` (r16 — VERDICT r15 finding 1) emits just
    (cell, is_home): the same deterministic routing with no vectors
    crossing the Arrow boundary — the cheap second pass that lets the
    capped batch path COUNT cells without materializing O(corpus ×
    n_probe) vector copies to executor storage. Column pruning cannot
    reach inside a Python kernel, so the narrowing has to happen here,
    at the source.

    ``emit_roles=True`` (r16) emits the capped verify's TAGGED frame in
    one pass — every probe copy as ``__role`` 0 plus the home copy
    again as ``__role`` 1 (n_probe+1 rows per vector) — replacing the
    r15 union-of-two-projections that either recomputed the kernel
    twice or forced the storage checkpoint this round removed."""
    import numpy as np
    import pandas as pd

    cent = np.asarray(centroids, dtype=np.float64)
    n_probe = min(n_probe, cent.shape[0])
    if cells_only:
        route_schema = "cell int, is_home boolean"
    elif emit_roles:
        route_schema = (
            "cell int, __role int, id long, v array<double>, nrm double"
        )
    else:
        route_schema = (
            "cell int, is_home boolean, id long, v array<double>, nrm double"
        )

    def _route(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(pdf["v"].tolist(), dtype=np.float64)
            nrm = _seq_norm(vecs)
            sims = (vecs @ cent.T) / (
                np.maximum(nrm[:, None], 1e-300)
                * np.linalg.norm(cent, axis=1)[None, :]
            )
            order = np.argsort(-sims, axis=1, kind="stable")
            probe = order[:, :n_probe]
            out_cell = probe.ravel()
            out_home = (probe == probe[:, :1]).ravel()  # rank-1 IS home
            if cells_only:
                yield pd.DataFrame(
                    {
                        "cell": out_cell.astype("int32"),
                        "is_home": out_home,
                    }
                )
                continue
            ids = pdf["id"].to_numpy()
            out_id = np.repeat(ids, n_probe)
            if emit_roles:
                # probe copies (role 0) + the home copy again (role 1)
                home_cell = probe[:, 0]
                yield pd.DataFrame(
                    {
                        "cell": np.concatenate(
                            [out_cell, home_cell]
                        ).astype("int32"),
                        "__role": np.concatenate(
                            [
                                np.zeros(len(out_cell), dtype="int32"),
                                np.ones(len(home_cell), dtype="int32"),
                            ]
                        ),
                        "id": np.concatenate([out_id, ids]),
                        "v": np.concatenate(
                            [
                                np.repeat(pdf["v"].to_numpy(), n_probe),
                                pdf["v"].to_numpy(),
                            ]
                        ),
                        "nrm": np.concatenate([np.repeat(nrm, n_probe), nrm]),
                    }
                )
                continue
            yield pd.DataFrame(
                {
                    "cell": out_cell.astype("int32"),
                    "is_home": out_home,
                    "id": out_id,
                    "v": np.repeat(pdf["v"].to_numpy(), n_probe),
                    "nrm": np.repeat(nrm, n_probe),
                }
            )

    return narrow.mapInPandas(_route, schema=route_schema)


def _dense_sims(lv_list, rv_list, lnrm, rnrm, thr: float):
    """THE dense-verify numeric core, shared by every cell-local
    kernel (intra, intra-salted, incremental — review r15: three
    copies of this math would let a future fix silently diverge capped
    vs uncapped results): cosine similarities of a left × right block
    with dimension-SEQUENTIAL float64 accumulation — the IEEE
    operation order the SQL/DuckDB oracles pin bit-exactly — plus the
    5e-7 borderline prefilter (final HALF_UP rounding happens
    Spark-side). Returns (ii, jj, sims)."""
    import numpy as np

    lv = np.array(lv_list, dtype=np.float64)
    rv = np.array(rv_list, dtype=np.float64)
    dots = np.zeros((len(lv), len(rv)), dtype=np.float64)
    for d in range(lv.shape[1]):  # sequential over dims = exact order
        dots += lv[:, d][:, None] * rv[:, d][None, :]
    sims = dots / (lnrm[:, None] * rnrm[None, :])
    ii, jj = np.nonzero(sims >= thr - 5e-7)
    return ii, jj, sims


def _salt_cells(
    tagged: DataFrame,
    max_cell_size: int,
    splits: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """2-D deterministic sub-cell split of oversized IVF cells (r15 —
    r14 VERDICT finding 1: the cell-local verify shipped whole cells to
    one task, so a hot cell — boilerplate embeddings piling onto one
    centroid — grew the dense verify matrix quadratically and OOMed an
    executor long before the quantizer's k ceiling mattered; the
    minhash tier's ``max_bucket_size`` pattern, applied to embeddings
    but EXACT instead of dropping).

    ``tagged`` carries (cell, __role, id, ...) with ``__role`` 0 = left
    side of the verify product, 1 = right side. Left rows take
    ``__sa = xxhash64(id) % s`` and replicate over ``__sb``; right rows
    take ``__sb = xxhash64(id) % s`` and replicate over ``__sa`` — so
    every (left, right) pair of one cell meets in EXACTLY one
    (cell, __sa, __sb) group (the blocked-matrix-multiply split), and
    capped output ≡ uncapped output value-for-value, unconditionally.
    Group size is ~cell/s ≤ ``max_cell_size`` rows, bounding both the
    shuffled group and the dense verify matrix per task.

    The split factors come from ONE narrow per-cell count (column-
    pruned: the parquet side of a gate's union answers from footers)
    collected to a bounded ≤ k-row driver list and broadcast; cells at
    or under the cap ride through with s = 1 and zero replication.
    Callers that can count more cheaply than re-aggregating ``tagged``
    (r16 — the batch path recounts from a vector-free second routing
    pass; an index-backed path could read ``cell_sizes/``) pass the
    (cell, tagged-row-count) list via ``splits`` precomputed."""
    if splits is None:
        sizes = (
            tagged.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
        )
        splits = [(int(r["cell"]), int(r["n"])) for r in sizes]
    splits = [
        (cell, -(-n // max_cell_size)) for cell, n in splits if n > max_cell_size
    ]
    if not splits:
        return tagged.withColumn("__sa", F.lit(0)).withColumn(
            "__sb", F.lit(0)
        )
    spark = tagged.sparkSession
    sdf = spark.createDataFrame(splits, "cell int, __s int")
    own = F.pmod(F.xxhash64(F.col("id")), F.col("__s")).cast("int")
    return (
        tagged.join(broadcast(sdf), "cell", "left")
        .withColumn("__s", F.coalesce(F.col("__s"), F.lit(1)))
        .withColumn("__own", own)
        .withColumn(
            "__oth", F.explode(F.sequence(F.lit(0), F.col("__s") - F.lit(1)))
        )
        .withColumn(
            "__sa",
            F.when(F.col("__role") == 0, F.col("__own")).otherwise(
                F.col("__oth")
            ),
        )
        .withColumn(
            "__sb",
            F.when(F.col("__role") == 0, F.col("__oth")).otherwise(
                F.col("__own")
            ),
        )
        .drop("__s", "__own", "__oth")
    )


def ann_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.4,
    n_clusters: int | None = None,
    n_probe: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    kmeans_max_iter: int = 20,
    centroids=None,
    max_cell_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via IVF candidates + exact
    verify — the 100 TB path (the all-pairs ``cosine_dup_pairs`` is the
    test-scale oracle only).

    Shape: centroids are trained on a bounded sample driver-side
    (``_fit_centroids_sampled`` — FAISS-style), then ONE narrow
    ``mapInPandas`` pass routes each vector to its home cell and its
    ``n_probe`` nearest probe cells, and ONE shuffle on the cell id
    feeds a cell-local vectorized verify (``applyInPandas``). A pair is
    a candidate when either member's probe list covers the other's home
    cell — candidate count ≈(n_probe/n_clusters)·n²/2, linear in
    n_probe, unlike symmetric co-probing whose cost grows with
    n_probe². Emitted cosines are bit-exact vs the sequential-sum SQL
    baseline (see ``_verify``); only recall is approximate — raise
    ``n_probe`` to trade cost for recall. Output matches
    ``cosine_dup_pairs``: (id_a, id_b, cosine_sim ≥ threshold).

    ``max_cell_size`` (r15 — r14 VERDICT finding 1) bounds per-task
    work: a cell whose routed row count exceeds it splits into
    deterministic id-hash sub-cells (:func:`_salt_cells` — the 2-D
    blocked split; every pair of one cell meets in exactly one
    sub-cell group), so the shuffled group and the dense verify matrix
    stay ≤ ~``max_cell_size`` rows per task while the output stays
    EXACTLY the uncapped result (pinned in tests) — unlike the minhash
    tier's ``max_bucket_size``, nothing is dropped. Size it to the
    rows an executor comfortably verifies (matrix side × dim × 8 B);
    None preserves the one-group-per-cell plan unchanged. The capped
    path is storage-free (r16): cell sizes come from a vector-free
    routing pass and the verify frame from a role-tagged one — no
    checkpoint, no O(corpus × n_probe) vector copies in executor
    storage."""
    import numpy as np
    import pandas as pd

    if centroids is None:
        centroids = _fit_centroids_sampled(
            corpus, vec_col=vec_col, id_col=id_col, k=n_clusters,
            seed=seed, max_iter=kmeans_max_iter,
        )
    k = centroids.shape[0]
    n_probe = min(n_probe, k)
    thr = float(threshold)

    # ---- pass 1 (narrow, no shuffle): per-row home cell + probe cells
    # (shared with the incremental semantic gate — r14).
    narrow = _narrow_vectors(corpus, id_col, vec_col)

    # ---- pass 2 (one shuffle on the cell id): cell-local verify via
    # vectorized dot products. A pair is a candidate when either
    # member's probe list covers the other's home cell, so every true
    # pair is seen in ≥1 cell (≤2 → dropDuplicates below). The loop
    # accumulates dimension-by-dimension so float64 summation order is
    # IDENTICAL to the sequential F.aggregate/DuckDB oracle sum — the
    # emitted cosines are bit-exact vs the all-pairs baseline.
    pair_schema = "id_a long, id_b long, cosine_sim double"

    def _emit_pairs(left: pd.DataFrame, home: pd.DataFrame) -> pd.DataFrame:
        # shared framing around the ONE numeric core (_dense_sims):
        # drop self-pairs, canonicalize (min, max), dedupe in-group
        if not len(home) or not len(left):
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine_sim": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine_sim": "float64"}
            )
        ii, jj, sims = _dense_sims(
            left["v"].tolist(), home["v"].tolist(),
            left["nrm"].to_numpy(), home["nrm"].to_numpy(), thr,
        )
        pid, hid = left["id"].to_numpy(), home["id"].to_numpy()
        keep = pid[ii] != hid[jj]
        ii, jj = ii[keep], jj[keep]
        a = np.minimum(pid[ii], hid[jj])
        b = np.maximum(pid[ii], hid[jj])
        out = pd.DataFrame({"id_a": a, "id_b": b, "cosine_sim": sims[ii, jj]})
        return out.drop_duplicates(["id_a", "id_b"])

    def _verify(pdf: pd.DataFrame) -> pd.DataFrame:
        # one frame with an is_home flag: left = every routed copy,
        # right = the rows whose home is this cell
        return _emit_pairs(pdf, pdf[pdf["is_home"].to_numpy()])

    def _verify_salted(pdf: pd.DataFrame) -> pd.DataFrame:
        # salted twin: the two sides arrive as tagged copies — the
        # math rides the same _dense_sims core, so capped ≡ uncapped
        # is identical by construction
        role = pdf["__role"].to_numpy()
        return _emit_pairs(pdf[role == 0], pdf[role == 1])

    if max_cell_size is None:
        routed = _cosine_probe_routes(narrow, centroids, n_probe)
        pairs = routed.groupBy("cell").applyInPandas(
            _verify, schema=pair_schema
        )
    else:
        # bounded-cell path (r16, storage-free — VERDICT r15 finding 1:
        # the r15 form localCheckpointed the FULL routed corpus, ~
        # n_probe+1 vector copies per row spilled to executor storage
        # even when no cell exceeded the cap; at 100 TB of embeddings
        # that is a multi-hundred-TB transient): count the cells from a
        # vector-free routing pass — the routing is deterministic, so
        # recomputing it trades bounded CPU for unbounded storage —
        # then emit the role-tagged verify frame in ONE second pass
        # (probe copies role 0 + home copies role 1) and split
        # oversized cells into id-hash sub-cell pairs. The tagged frame
        # per cell sizes to count(*) + count_if(is_home) of the
        # cells-only pass.
        cell_counts = (
            _cosine_probe_routes(narrow, centroids, n_probe, cells_only=True)
            .groupBy("cell")
            .agg(
                (
                    F.count(F.lit(1))
                    + F.sum(F.col("is_home").cast("long"))
                ).alias("n")
            )
            .collect()
        )
        splits = [(int(r["cell"]), int(r["n"])) for r in cell_counts]
        tagged = _cosine_probe_routes(
            narrow, centroids, n_probe, emit_roles=True
        )
        pairs = _salt_cells(tagged, max_cell_size, splits=splits).groupBy(
            "cell", "__sa", "__sb"
        ).applyInPandas(_verify_salted, schema=pair_schema)
    return (
        pairs.dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", F.round("cosine_sim", 6).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.4,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int | None = None,
    n_probe: int = 6,
    seed: int = 42,
    kmeans_max_iter: int = 20,
    centroids=None,
    max_cell_size: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540 — cluster embeddings, drop within-cluster
    semantic near-duplicates): :func:`ann_dup_pairs` generates the
    cosine≥threshold pair list via IVF cells, connected components
    close it transitively, and exactly one representative per semantic
    cluster survives (the min id — deterministic where the paper's
    farthest-from-centroid choice is tie-ambiguous across runs).

    Pure composition of the two registered 100 TB primitives — the only
    shuffles are the IVF cell route and the component-join rounds; the
    corpus itself moves once for the final left-anti prune. Returns the
    kept corpus rows with their original columns."""
    from .dedup import dedup_filter

    pairs = ann_dup_pairs(
        corpus,
        threshold=threshold,
        n_clusters=n_clusters,
        n_probe=n_probe,
        vec_col=vec_col,
        id_col=id_col,
        seed=seed,
        kmeans_max_iter=kmeans_max_iter,
        centroids=centroids,
        max_cell_size=max_cell_size,
    )
    return dedup_filter(corpus, pairs, id_col=id_col)


# --------------------------------------------------------------------------
# Persistable SEMANTIC dedup index (r14) — the embedding-side mirror of
# operators/dedup.py's MinHash index: gate each new snapshot against the
# accumulated corpus at O(new) compute and probed-cells-only IO, append
# accepted vectors, centroids stay fixed (the fixed-reference-model
# posture the LM and the MinHash signature family already follow).
# --------------------------------------------------------------------------


def _semantic_subdir(path: str, name: str) -> str:
    return path.rstrip("/") + "/" + name


def build_semantic_index(
    reference: DataFrame,
    path: str,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int | None = None,
    seed: int = 42,
    kmeans_max_iter: int = 20,
) -> None:
    """Materialize the EXISTING corpus's semantic-dedup state (r14;
    layout v2 r15 — r14 VERDICT finding 1 / item 1):

    - ``ivf/`` — the coarse-quantizer centroids
      (:func:`save_ivf_index` layout, kind-validated on load). FIXED
      after build: appends never refit (quantizer drift would silently
      re-route the accumulated vectors), so a corpus whose embedding
      distribution has drifted rebuilds — the FAISS retrain contract;
    - ``vectors/`` — (id, v float64, nrm) directory-partitioned by the
      vector's cosine-nearest HOME cell: a gate collects its new
      side's probe cells (≤ k ints — a bounded driver list) and PRUNES
      the reference scan to exactly the cells it probes, the shingle-
      partition trick applied to embeddings;
    - ``cell_sizes/`` — (cell, n) occupancy counts (v2): appends add
      DELTA rows and readers SUM per cell — the minhash
      ``bucket_sizes`` contract applied to the embedding tier. This is
      what makes the documented FAISS retrain contract OBSERVABLE
      (:func:`semantic_index_stats`): the quantizer is frozen at build
      while appends grow occupancy without bound, and before r15
      nothing measured that growth. Sizes come from the just-written
      ``vectors/`` footers (the cell key is the partition directory —
      a zero-data-column count);
    - ``meta/`` — (version, k, dim, seed, build_n, target_cell):
      self-describing, and ``build_n``/``target_cell`` anchor the
      occupancy watermark (growth = n_vectors / build_n).

    The meta write uses mode("error") — building over an existing
    index raises. Append accepted snapshots with
    :func:`append_semantic_index`; one writer per snapshot. Version-1
    indexes (r14, no ``cell_sizes/``) stay readable — gates are
    unchanged; stats fall back to counting ``vectors/`` footers."""
    from ..sources.sinks import materialize_local
    from .dedup import _fs_delete, _fs_exists

    spark = reference.sparkSession
    # fail-fast build claim: meta is written LAST (it needs build_n and
    # marks the index complete), so a friendly existence check runs
    # first — and because check-then-act alone would let a racing or
    # retried build clobber a completed index's quantizer
    # (save_ivf_index is mode("overwrite")), an ATOMIC one-row lock
    # write with mode("error") claims the path BEFORE anything is
    # touched (the r14 meta-first atomicity, kept while meta moves
    # last — review r15)
    if _fs_exists(spark, _semantic_subdir(path, "meta")):
        raise ValueError(
            f"semantic index already exists at {path!r} — append with "
            "append_semantic_index, or delete the directory to rebuild"
        )
    if _fs_exists(spark, _semantic_subdir(path, "lock")):
        raise ValueError(
            f"a semantic index build at {path!r} started and did not "
            "complete (lock present, meta absent) — delete the "
            "directory and rebuild; builds are all-or-retry"
        )
    materialize_local(
        spark.createDataFrame([(1,)], "locked int")
    ).coalesce(1).write.mode("error").parquet(_semantic_subdir(path, "lock"))
    centroids = _fit_centroids_sampled(
        reference, vec_col=vec_col, id_col=id_col, k=n_clusters,
        seed=seed, max_iter=kmeans_max_iter,
    )
    # r17 (guide §2.6, the dedup-index build's threading applied here):
    # once the centroids exist, the ivf write and the
    # vectors→sizes→build_n chain are independent — overlap them
    # instead of serializing four commit floors. The build stays
    # all-or-retry under the lock: meta (written LAST, below) is the
    # only completion marker, so any crash interleaving leaves an
    # unreadable index exactly as before.
    from .dedup import _run_subtable_writes

    build_n_box: dict[str, int] = {}

    def _w_ivf() -> None:
        save_ivf_index(spark, centroids, _semantic_subdir(path, "ivf"))

    def _w_vectors_sizes() -> None:
        _home_routed(reference, centroids, id_col, vec_col).write.mode(
            "error"
        ).partitionBy("cell").parquet(_semantic_subdir(path, "vectors"))
        # occupancy state, free at write time: the count's only read
        # column is the partition key, so it answers from parquet
        # footers
        sizes = (
            spark.read.parquet(_semantic_subdir(path, "vectors"))
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)  # feeds the write AND build_n
        )

        def _w_sizes() -> None:
            sizes.coalesce(1).write.mode("error").parquet(
                _semantic_subdir(path, "cell_sizes")
            )

        def _w_build_n() -> None:
            build_n_box["n"] = sizes.agg(F.sum("n")).first()[0] or 0

        _run_subtable_writes(_w_sizes, _w_build_n)

    _run_subtable_writes(_w_ivf, _w_vectors_sizes)
    build_n = build_n_box["n"]
    # meta LAST (its mode("error") is the build lock, and a crash
    # before it leaves no readable index — the build is all-or-retry)
    materialize_local(
        spark.createDataFrame(
            [
                (
                    2,
                    int(centroids.shape[0]),
                    int(centroids.shape[1]),
                    seed,
                    int(build_n),
                    ANN_TARGET_CELL_ROWS,
                )
            ],
            "version int, k int, dim int, seed long, build_n long,"
            " target_cell int",
        )
    ).coalesce(1).write.mode("error").parquet(_semantic_subdir(path, "meta"))
    # release the claim on success (ADVICE r15, low): lock presence now
    # ALWAYS means an interrupted build — before this, every completed
    # index (including every rebuild output) carried lock/ forever and
    # the "started and did not complete" error stayed truthful only
    # because the meta existence check happened to run first
    _fs_delete(spark, _semantic_subdir(path, "lock"))


def _check_dim(df: DataFrame, vec_col: str, dim: int, caller: str) -> None:
    """Fail FAST with a named error when a frame's embedding width
    differs from the index's — mixed embedding models otherwise
    surface as an opaque numpy broadcast error deep in the routed
    kernel. One bounded 1-row probe (empty frames pass: nothing will
    route)."""
    row = df.select(F.size(vec_col).alias("d")).first()
    if row is not None and row["d"] != dim:
        raise ValueError(
            f"{caller}: embedding dim {row['d']} does not match the "
            f"index's dim {dim} — a semantic index is bound to ONE "
            "embedding model; rebuild for a new one"
        )


def _read_semantic_meta(spark, path: str) -> dict:
    from .dedup import _repair_dangling_dir

    # whole-index swap repair first (an interrupted
    # rebuild_semantic_index root swap), then the sub-table sweeps
    _repair_dangling_dir(spark, path.rstrip("/"))
    rows = spark.read.parquet(_semantic_subdir(path, "meta")).collect()
    if len(rows) != 1:
        raise ValueError(f"semantic index at {path!r} has a malformed meta")
    meta = rows[0].asDict()
    if meta["version"] not in (1, 2):
        raise ValueError(
            f"semantic index version {meta['version']} unsupported"
        )
    # v1 (r14) metas carry no occupancy anchors — stats fall back
    meta.setdefault("build_n", None)
    meta.setdefault("target_cell", ANN_TARGET_CELL_ROWS)
    _repair_semantic_index(spark, path)
    return meta


def _home_routed(df: DataFrame, centroids, id_col: str, vec_col: str):
    """(cell, id, v, nrm) home-cell rows — n_probe=1 routing."""
    return (
        _cosine_probe_routes(
            _narrow_vectors(df, id_col, vec_col), centroids, 1
        )
        .select("cell", "id", "v", "nrm")
        .repartition("cell")
    )


def append_semantic_index(
    accepted: DataFrame,
    path: str,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Append an ACCEPTED snapshot's vectors to a semantic index —
    routed to their home cells under the index's OWN (fixed) centroids,
    one partitioned parquet append plus (v2) one DELTA append of the
    snapshot's per-cell counts to ``cell_sizes/``. O(accepted).

    Returns :func:`semantic_index_stats`'s occupancy watermark (r15 —
    r14 VERDICT item 1c): the quantizer is FROZEN at build, so the
    caller of the ingestion cycle is the one who must see
    ``rebuild_advised`` flip as appends outgrow the build corpus — the
    documented FAISS retrain contract made observable at exactly the
    moment occupancy changes."""
    from .dedup import _fs_delete, _fs_mkdirs

    spark = accepted.sparkSession
    meta = _read_semantic_meta(spark, path)
    _check_dim(accepted, vec_col, meta["dim"], "append_semantic_index")
    centroids = load_ivf_index(spark, _semantic_subdir(path, "ivf"))
    routed = _home_routed(accepted, centroids, id_col, vec_col)
    if meta["version"] >= 2:
        # materialize once: the routing feeds the vectors append AND
        # the delta counts (O(accepted) transient blocks)
        routed = routed.localCheckpoint(eager=True)
        # append_pending token (r16 — the minhash tier's ADVICE fix
        # mirrored): a crash between the vectors append and the sizes
        # delta leaves the occupancy watermark stale; a surviving
        # token makes the next open recount exactly
        pending = _semantic_subdir(path, "append_pending")
        _fs_mkdirs(spark, pending)
    if meta["version"] >= 2:
        # r17 (guide §2.6): both appends read only the checkpointed
        # routed frame and touch disjoint directories — overlap them.
        # Any crash interleaving is covered by the append_pending
        # token's exact recount at the next open, same as serial.
        from .dedup import _run_subtable_writes

        def _a_vectors() -> None:
            routed.write.mode("append").partitionBy("cell").parquet(
                _semantic_subdir(path, "vectors")
            )

        _run_subtable_writes(
            _a_vectors, lambda: _append_cell_size_deltas(path, routed)
        )
        _fs_delete(spark, pending)
    else:
        routed.write.mode("append").partitionBy("cell").parquet(
            _semantic_subdir(path, "vectors")
        )
    return semantic_index_stats(spark, path, _meta=meta)


def _append_cell_size_deltas(path: str, routed: DataFrame) -> None:
    """The append's DELTA rows for ``cell_sizes/`` — module-level so
    crash-point tests can kill the boundary between the vectors append
    and this write (the window the ``append_pending`` token covers)."""
    routed.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n")
    ).write.mode("append").parquet(_semantic_subdir(path, "cell_sizes"))


def _recount_cell_sizes(spark, path: str) -> None:
    """Exact recount of ``cell_sizes/`` from the current vectors table,
    swapped in crash-safely — compaction's final step, also run by
    crash repair (the minhash ``_recount_bucket_sizes`` contract: a
    crash between the vectors swap and the sizes swap would leave the
    two tables describing different corpora, and a stale watermark
    would mis-advise the rebuild decision). Footer-cheap: the only
    read column is the partition key."""
    from .dedup import _swap_dir

    sizes = (
        spark.read.parquet(_semantic_subdir(path, "vectors"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    _swap_dir(
        spark,
        _semantic_subdir(path, "cell_sizes"),
        lambda tmp: sizes.coalesce(1).write.mode("error").parquet(tmp),
    )


def _repair_semantic_index(spark, path: str) -> list[str]:
    """Open-time repair of an interrupted :func:`compact_semantic_index`
    swap — :func:`dedup._repair_dangling_dir`, the ONE shared state
    machine, applied to ``vectors/`` and (v2) ``cell_sizes/``; when
    anything WAS repaired and the index carries a sizes table, an
    exact recount re-syncs it with the post-repair vectors (the
    minhash repair contract — r15). Also sweeps a stale build claim
    (r16): this runs only on indexes whose meta read succeeded, so a
    surviving ``lock/`` is a crash between the final meta write and
    the on-success unlock — the index is complete; drop the claim.
    And an UNCLEAN APPEND (r16, the minhash token contract): a
    surviving ``append_pending/`` means a crash between the vectors
    append and the sizes delta — the watermark would under-report
    occupancy; recount exactly and release the token."""
    from .dedup import _fs_delete, _fs_exists, _repair_dangling_dir

    repaired = []
    for sub in ("vectors", "cell_sizes"):
        if _repair_dangling_dir(spark, _semantic_subdir(path, sub)):
            repaired.append(sub)
    pending = _semantic_subdir(path, "append_pending")
    unclean_append = _fs_exists(spark, pending)
    if (repaired or unclean_append) and _fs_exists(
        spark, _semantic_subdir(path, "cell_sizes")
    ):
        _recount_cell_sizes(spark, path)
    if unclean_append:
        _fs_delete(spark, pending)
        repaired.append("append_pending")
    if _fs_exists(spark, _semantic_subdir(path, "lock")):
        _fs_delete(spark, _semantic_subdir(path, "lock"))
        repaired.append("lock")
    return repaired


def compact_semantic_index(spark, path: str) -> dict:
    """Rewrite the semantic index's ``vectors/`` in place: per-snapshot
    appends accumulate one file set per append (the small-files
    problem), and a RETRIED append duplicates its rows — compaction
    collapses duplicate ids (keep-any: rows for one id are identical
    by construction) and rewrites one file per cell, then (v2)
    recounts ``cell_sizes/`` exactly, collapsing the per-append delta
    rows back to one row per cell and squeezing retry inflation out of
    the occupancy watermark. Gate results are unchanged by
    construction (the verify is set-semantics over ids). Centroids are
    NOT refit — quantizer stability is the index's contract; refitting
    for a drifted corpus is a rebuild (see
    :func:`semantic_index_stats`'s ``rebuild_advised``). Same
    single-writer maintenance-slot contract and the same crash-safe
    swap as ``dedup.compact_dedup_index`` (every boundary repairable
    by :func:`_repair_semantic_index`, which runs on every index open
    via :func:`_read_semantic_meta`). Returns {"vectors": n} plus
    {"cell_sizes": n} on v2 indexes."""
    from .dedup import _fs_exists, _swap_dir

    _read_semantic_meta(spark, path)  # validates + repairs
    src = _semantic_subdir(path, "vectors")
    frame = spark.read.parquet(src).dropDuplicates(["id"])
    n = frame.count()
    _swap_dir(
        spark,
        src,
        lambda tmp: frame.repartition("cell")
        .write.mode("error")
        .partitionBy("cell")
        .parquet(tmp),
    )
    counts = {"vectors": n}
    if _fs_exists(spark, _semantic_subdir(path, "cell_sizes")):
        _recount_cell_sizes(spark, path)
        counts["cell_sizes"] = spark.read.parquet(
            _semantic_subdir(path, "cell_sizes")
        ).count()
    return counts


def rebuild_semantic_index(
    spark,
    path: str,
    *,
    n_clusters: int | None = None,
    seed: int | None = None,
    kmeans_max_iter: int = 20,
) -> dict:
    """THE operation ``rebuild_advised`` advises (r15 — closes r14
    VERDICT What's-missing 4's loop: the watermark made the FAISS
    retrain contract observable; this is the operator it triggers):
    refit the coarse quantizer over the index's OWN accumulated
    vectors and re-route everything, in place. ``n_clusters=None``
    auto-sizes k to the CURRENT corpus (``_clusters_for_n`` — the IVF
    capacity rule: per-cell occupancy returns to the build target,
    which is exactly what appends against a frozen quantizer erode).
    A retried append's duplicate ids collapse for free
    (``dropDuplicates`` on id before the refit).

    Crash safety: the new index is built COMPLETE at ``path__compact``
    (a fresh :func:`build_semantic_index` run over the accumulated
    vectors), then ONE whole-index root swap replaces it — the
    multi-sub-table states (ivf + vectors + cell_sizes + meta) can
    never mix generations, and every crash point is repaired by the
    root-level sweep that now runs first in every index open. Same
    single-writer maintenance-slot contract as compaction; long-lived
    callers holding PRELOADED centroids must reload them after a
    rebuild (the quantizer changed — the same contract as any FAISS
    retrain). Returns the post-rebuild
    :func:`semantic_index_stats` (growth restarts at 1.0)."""
    from .dedup import _swap_dir

    meta = _read_semantic_meta(spark, path)
    # NO materialization of the corpus: _swap_dir runs the write FIRST
    # (the rebuild lands complete at path__compact while the live index
    # is untouched), so every read of the old vectors happens while
    # their files still exist — at 100 TB a localCheckpoint here would
    # spill the whole index for nothing
    corpus = (
        spark.read.parquet(_semantic_subdir(path, "vectors"))
        .select("id", "v")
        .dropDuplicates(["id"])
    )
    if seed is None:
        seed = meta["seed"]

    def _write(tmp: str) -> None:
        build_semantic_index(
            corpus,
            tmp,
            vec_col="v",
            id_col="id",
            n_clusters=n_clusters,
            seed=seed,
            kmeans_max_iter=kmeans_max_iter,
        )

    _swap_dir(spark, path.rstrip("/"), _write)
    return semantic_index_stats(spark, path)


def estimate_probe_recall(
    spark,
    index: str,
    queries: DataFrame,
    *,
    n_probes: tuple[int, ...] = (1, 2, 4, 8),
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_cap: int = 1000,
    truth_n_probe: int | None = None,
) -> dict:
    """MEASURED IVF recall of a semantic index on a bounded query
    sample (r15): the occupancy watermark's growth/skew thresholds are
    PROXIES for what the FAISS retrain contract actually protects —
    recall at a given ``n_probe`` — and this measures the real thing
    in a maintenance slot. Ground truth is the full-probe gate
    (``n_probe = k`` routes every query to every cell, so its pair set
    is exact — the same theorem tests/test_semantic_index.py pins
    against the brute-force oracle); ``truth_n_probe`` can cap the
    truth pass for a cheaper RELATIVE recall when a full-index scan
    per measurement is too dear. The sample is the first
    ``sample_cap`` queries by id — deterministic across runs, so the
    number is comparable release-over-release.

    Returns {"sample": n, "truth_pairs": t, "truth_n_probe": P,
    "recall": {p: pairs@p / t}}; recall is 1.0 for every p when t is 0
    (nothing to find). One truth pass + one pass per probe setting,
    each O(sample)-routed and pruned to its probed cells."""
    meta = _read_semantic_meta(spark, index)
    centroids = load_ivf_index(spark, _semantic_subdir(index, "ivf"))
    sample = (
        queries.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_cap)
        .localCheckpoint(eager=True)
    )
    p_truth = truth_n_probe or meta["k"]
    kw = dict(
        threshold=threshold, vec_col=vec_col, id_col=id_col,
        centroids=centroids,
    )
    truth = incremental_ann_pairs(
        sample, index=index, n_probe=p_truth, **kw
    ).select("new_id", "ref_id").localCheckpoint(eager=True)
    t = truth.count()
    recall: dict[int, float] = {}
    for p in n_probes:
        if p >= p_truth:
            recall[int(p)] = 1.0
            continue
        if t == 0:
            recall[int(p)] = 1.0
            continue
        got = (
            incremental_ann_pairs(sample, index=index, n_probe=p, **kw)
            .select("new_id", "ref_id")
            .join(truth, ["new_id", "ref_id"], "left_semi")
            .count()
        )
        recall[int(p)] = got / t
    return {
        "sample": sample.count(),
        "truth_pairs": t,
        "truth_n_probe": int(p_truth),
        "recall": recall,
    }


#: Occupancy watermark thresholds (r15 — r14 VERDICT item 1c). The
#: quantizer is frozen at build; these make its documented retrain
#: contract observable. GROWTH: once the corpus is 4× the build
#: corpus, the sample the centroids were trained on describes ≤25 % of
#: the data — cell balance (and therefore recall at a given n_probe)
#: degrades, and mean occupancy is 4× the build target. HOT_CELL: one
#: cell at 32× the target (boilerplate embeddings piling onto one
#: centroid) marks pathological skew no global growth factor sees —
#: ``max_cell_size`` bounds the per-task damage, a rebuild fixes the
#: cause.
SEMANTIC_REBUILD_GROWTH = 4.0
SEMANTIC_HOT_CELL_FACTOR = 32


def semantic_index_stats(spark, path: str, *, _meta: dict | None = None) -> dict:
    """Occupancy watermark of a semantic index (r15): totals and
    per-cell extremes from ``cell_sizes/`` (v2 — one narrow aggregate
    over ≤ one row per cell per append, never the vector bytes; v1
    indexes fall back to counting ``vectors/`` partition footers), and
    the ``rebuild_advised`` flag per the thresholds above. Keys:
    ``n_vectors, k, build_n, target_cell, max_cell, mean_cell,
    hot_cells, growth, rebuild_advised``."""
    from .dedup import _fs_exists

    meta = _meta or _read_semantic_meta(spark, path)
    if _fs_exists(spark, _semantic_subdir(path, "cell_sizes")):
        sizes = (
            spark.read.parquet(_semantic_subdir(path, "cell_sizes"))
            .groupBy("cell")
            .agg(F.sum("n").alias("n"))
        )
    else:  # v1 fallback: partition-key-only count — footer-cheap
        sizes = (
            spark.read.parquet(_semantic_subdir(path, "vectors"))
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    target = meta.get("target_cell") or ANN_TARGET_CELL_ROWS
    hot_at = SEMANTIC_HOT_CELL_FACTOR * target
    row = sizes.agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("total"),
        F.coalesce(F.max("n"), F.lit(0)).alias("mx"),
        F.coalesce(
            F.sum((F.col("n") > hot_at).cast("int")), F.lit(0)
        ).alias("hot"),
    ).first()
    total, mx, hot = int(row["total"]), int(row["mx"]), int(row["hot"])
    build_n = meta.get("build_n")
    growth = (total / build_n) if build_n else None
    advised = bool(
        (growth is not None and growth >= SEMANTIC_REBUILD_GROWTH)
        or mx > hot_at
    )
    return {
        "n_vectors": total,
        "k": int(meta["k"]),
        "build_n": build_n,
        "target_cell": int(target),
        "max_cell": mx,
        "mean_cell": (total / meta["k"]) if meta["k"] else 0.0,
        "hot_cells": hot,
        "growth": growth,
        "rebuild_advised": advised,
    }


def incremental_ann_pairs(
    new: DataFrame,
    reference: DataFrame | None = None,
    *,
    index: str | None = None,
    threshold: float = 0.4,
    n_clusters: int | None = None,
    n_probe: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    kmeans_max_iter: int = 20,
    centroids=None,
    max_cell_size: int | None = None,
) -> DataFrame:
    """(new_id, ref_id, cosine_sim) embedding near-duplicate pairs of a
    NEW snapshot against the EXISTING corpus (r14) — the semantic
    mirror of ``dedup.incremental_minhash_pairs``. Pass exactly one of
    ``reference`` (quantizer fit in-flight on the reference — O(corpus)
    per gate) or ``index`` (a :func:`build_semantic_index` path: the
    new side routes to its ``n_probe`` cosine-nearest cells, the
    bounded distinct probe-cell list PRUNES the stored vectors scan,
    and the verify is cell-local — O(new) compute plus probed-cells
    IO).

    Candidate rule, one-sided (the standard IVF query semantics): a
    (new, ref) pair is verified when the NEW vector's probe list
    covers the REF vector's home cell — so each true pair materializes
    in exactly ONE cell (the ref's home), no post-dedup needed, and
    recall is the IVF query recall, tunable via ``n_probe``
    (``n_probe=k`` is exact — pinned against the brute-force cross
    oracle in tests). Both static sides use the SAME rule, so
    index ≡ rebuild exactly. Emitted cosines are bit-exact vs the
    sequential-sum SQL baseline (dimension-ordered accumulation,
    ``ann_dup_pairs``'s contract).

    ``centroids``: with ``index``, a PRELOADED quantizer (the array
    :func:`load_ivf_index` returns) — long-lived callers gating many
    snapshots/micro-batches against one static index load it once
    instead of paying the meta read + repair sweep + centroid collect
    per call (the streaming gate does).

    ``max_cell_size`` (r15 — r14 VERDICT finding 1): the quantizer is
    FROZEN at build while appends grow occupancy without bound, so a
    hot cell would otherwise ship whole to one task and grow the dense
    verify matrix quadratically. Cells whose combined (new + ref) row
    count exceeds the cap split into deterministic id-hash sub-cells
    (:func:`_salt_cells` — every (new, ref) pair of a cell meets in
    exactly one sub-cell group), bounding per-task rows and matrix at
    ~``max_cell_size`` while the output stays EXACTLY the uncapped
    result — nothing is dropped, capped ≡ uncapped is pinned in
    tests."""
    import numpy as np
    import pandas as pd

    if (reference is None) == (index is None):
        raise ValueError("pass exactly one of reference / index")
    spark = new.sparkSession
    if index is not None:
        if centroids is None:
            meta = _read_semantic_meta(spark, index)
            _check_dim(new, vec_col, meta["dim"], "incremental_ann_pairs")
            centroids = load_ivf_index(
                spark, _semantic_subdir(index, "ivf")
            )
        else:
            # preloaded-quantizer path (the streaming gate): the
            # fail-fast dim probe must run here too, or a wrong-width
            # micro-batch regains the opaque numpy broadcast error the
            # probe exists to prevent (ADVICE r14). Expected dim comes
            # from the quantizer itself — no meta read needed.
            _check_dim(
                new,
                vec_col,
                int(np.asarray(centroids).shape[1]),
                "incremental_ann_pairs",
            )
    else:
        centroids = _fit_centroids_sampled(
            reference, vec_col=vec_col, id_col=id_col, k=n_clusters,
            seed=seed, max_iter=kmeans_max_iter,
        )
    routed_new = _cosine_probe_routes(
        _narrow_vectors(new, id_col, vec_col), centroids, n_probe
    ).select("cell", F.col("id").alias("new_id"), "v", "nrm")
    routed_new = routed_new.localCheckpoint(eager=True)  # feeds 2 uses
    if index is not None:
        pbs = [
            int(r[0])
            for r in routed_new.select("cell").distinct().collect()
        ]
        ref_rows = spark.read.parquet(_semantic_subdir(index, "vectors"))
        # partition PRUNING: only the probed cells are read — the
        # index's dominant bytes are the vector arrays
        ref_rows = (
            ref_rows.filter(F.col("cell").isin(pbs))
            if pbs
            else ref_rows.filter(F.lit(False))
        )
    else:
        ref_rows = _home_routed(reference, centroids, id_col, vec_col)
    ref_rows = ref_rows.select(
        "cell", F.col("id").alias("ref_id"),
        F.col("v").alias("rv"), F.col("nrm").alias("rn"),
    )
    thr = float(threshold)
    pair_schema = "new_id long, ref_id long, cosine_sim double"

    def _verify(pdf: pd.DataFrame) -> pd.DataFrame:
        # directed (new × ref) framing around the ONE numeric core
        # (_dense_sims) — no self-pair filter or canonicalization: the
        # two sides are disjoint by construction and each pair lands
        # in exactly one cell (the ref's home)
        nmask = pdf["side"].to_numpy() == 0
        nsub, rsub = pdf[nmask], pdf[~nmask]
        if not len(nsub) or not len(rsub):
            return pd.DataFrame(
                {"new_id": [], "ref_id": [], "cosine_sim": []}
            ).astype(
                {"new_id": "int64", "ref_id": "int64",
                 "cosine_sim": "float64"}
            )
        ii, jj, sims = _dense_sims(
            nsub["v"].tolist(), rsub["v"].tolist(),
            nsub["nrm"].to_numpy(), rsub["nrm"].to_numpy(), thr,
        )
        return pd.DataFrame(
            {
                "new_id": nsub["id"].to_numpy()[ii],
                "ref_id": rsub["id"].to_numpy()[jj],
                "cosine_sim": sims[ii, jj],
            }
        )

    both = routed_new.select(
        "cell", F.lit(0).alias("side"), F.col("new_id").alias("id"),
        "v", "nrm",
    ).unionByName(
        ref_rows.select(
            "cell", F.lit(1).alias("side"), F.col("ref_id").alias("id"),
            F.col("rv").alias("v"), F.col("rn").alias("nrm"),
        )
    )
    if max_cell_size is None:
        pairs = both.groupBy("cell").applyInPandas(
            _verify, schema=pair_schema
        )
    else:
        # bounded-cell path: _salt_cells counts per cell first — a
        # column-pruned pass (the index side answers from partition
        # footers; the new side re-reads its local checkpoint blocks)
        # — then oversized cells split into id-hash sub-cell pairs.
        # _verify already keys on the side column, so it serves both
        # the whole-cell and the sub-cell groups unchanged.
        salted = _salt_cells(
            both.withColumn("__role", F.col("side")), max_cell_size
        )
        pairs = salted.groupBy("cell", "__sa", "__sb").applyInPandas(
            _verify, schema=pair_schema
        )
    # rounding Spark-side (HALF_UP parity with the oracle); each pair
    # appears in exactly one cell (the ref's home) — no dedup needed
    return pairs.select(
        "new_id", "ref_id", F.round("cosine_sim", 6).alias("cosine_sim")
    ).filter(F.col("cosine_sim") >= threshold)


def incremental_semantic_dedup(
    new: DataFrame,
    reference: DataFrame | None = None,
    *,
    index: str | None = None,
    threshold: float = 0.4,
    n_clusters: int | None = None,
    n_probe: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    kmeans_max_iter: int = 20,
    centroids=None,
    max_cell_size: int | None = None,
) -> DataFrame:
    """Surviving rows of ``new`` whose embedding has NO cosine ≥
    ``threshold`` near-duplicate in the existing corpus (r14) — the
    semantic ingestion gate, composing with the MinHash gate the way
    SemDeDup composes with exact/near text dedup in production
    pipelines (text tiers first — cheaper — then the embedding tier
    over what's left). After accepting survivors, call
    :func:`append_semantic_index` so the next snapshot sees them.
    Only removes rows, never reorders or rewrites them."""
    near = (
        incremental_ann_pairs(
            new,
            reference,
            index=index,
            threshold=threshold,
            n_clusters=n_clusters,
            n_probe=n_probe,
            vec_col=vec_col,
            id_col=id_col,
            seed=seed,
            kmeans_max_iter=kmeans_max_iter,
            centroids=centroids,
            max_cell_size=max_cell_size,
        )
        .select(F.col("new_id").alias(id_col))
        .distinct()
    )
    return new.join(near, id_col, "left_anti")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_clusters: int | None = None,
    n_probe: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    centroids=None,
) -> DataFrame:
    """IVF-style approximate kNN: KMeans-partition the corpus, probe
    only the ``n_probe`` nearest centroids per query.

    The 100 TB path for cosine search: candidate generation touches
    ~n_probe/n_clusters of the corpus. Centroids are trained on a
    bounded sample driver-side (FAISS-style, see
    ``_fit_centroids_sampled``) and broadcast; assignment is one narrow
    vectorized pass; scoring is codegen'd array expressions.
    Returns (query_id, neighbor_id, cosine_sim, rank)."""
    cent = (
        centroids
        if centroids is not None
        else _fit_centroids_sampled(
            corpus, vec_col=vec_col, id_col=id_col, k=n_clusters,
            seed=seed, max_iter=20,
        )
    )
    assigned = ivf_assign(corpus, cent, vec_col=vec_col, id_col=id_col)
    return ivf_topk_assigned(
        assigned, cent, queries, k=k, n_probe=n_probe,
        vec_col=vec_col, id_col=id_col,
    )


def ivf_assign(
    corpus: DataFrame,
    centroids,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The static half of IVF search: route every corpus vector to its
    nearest cell in ONE narrow vectorized pass. Split out (r9) so a
    long-lived serving layer — notably the stream-static scorer in
    ``streaming/similarity.py`` — can compute/cache the assignment
    once per persisted index and reuse it across query micro-batches
    instead of re-routing the corpus per batch.
    Returns (neighbor_id, c_vec, cluster)."""
    import numpy as np
    import pandas as pd

    cent = np.asarray(centroids, dtype=np.float64)

    def _assign(batches):
        cent_sq = (cent * cent).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(pdf["c_vec"].tolist(), dtype=np.float64)
            # quadratic expansion keeps the distance matrix at
            # (batch, k) instead of a (batch, k, dim) tensor
            d2 = (
                (vecs * vecs).sum(axis=1)[:, None]
                - 2.0 * (vecs @ cent.T)
                + cent_sq[None, :]
            )
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "c_vec": pdf["c_vec"].to_numpy(),
                    "cluster": d2.argmin(axis=1).astype("int32"),
                }
            )

    return corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("c_vec"),
    ).mapInPandas(
        _assign, schema="neighbor_id long, c_vec array<double>, cluster int"
    )


def ivf_topk_assigned(
    assigned: DataFrame,
    centroids,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 3,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bounded_queries: bool = True,
    max_bounded_queries: int = 20_000,
) -> DataFrame:
    """The per-query-batch half of IVF search over a pre-assigned
    corpus (see :func:`ivf_assign`), shared by batch (``ivf_topk``)
    and streaming (``streaming/similarity.py``) callers.

    Default kernel (r10, ``bounded_queries=True`` — the serving
    contract every in-repo caller meets: gate queries and stream
    micro-batches are small): queries are collected once, centroid
    ranking happens driver-side (q×cells, trivial), and scoring is
    ONE Arrow pass over the JVM-literal-pruned probe cells with a
    per-cell GEMM — the ``cosine_topk`` posture applied to IVF. The
    r10 probe measured the previous expression-eval join kernel at
    21 q/s (80 k corpus): ``F.aggregate``/``zip_with`` dot products
    are interpreted per candidate row, not codegen, so the per-pair
    math dominated. GEMM keeps the identical IEEE operation order
    (dimension-sequential accumulation, see ``_seq_norm``) so results
    are bit-exact vs the expression twin — pytest pins equality.

    ``bounded_queries=False`` keeps the expression-join plan: probes
    ranked by a broadcast crossJoin + window, candidates by a
    broadcast hash join — the shape for an UNBOUNDED query frame
    (nothing in-repo needs it today; corpus-vs-corpus search goes
    through ``ann_dup_pairs``).

    The bounded kernel's driver collect is GUARDED (ADVICE r10): the
    collect is issued as ``limit(max_bounded_queries + 1)``, so a
    caller handing an unexpectedly large query frame to the serving
    path degrades to the scalable join kernel instead of materializing
    the whole frame on the driver — one action either way."""
    spark = assigned.sparkSession
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )

    def _finish(scored: DataFrame) -> DataFrame:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id",
                "neighbor_id",
                F.round("cosine_sim", 6).alias("cosine_sim"),
                F.col("rank").cast("long").alias("rank"),
            )
        )

    if not bounded_queries:
        return _finish(
            _ivf_scored_join(assigned, centroids, queries, n_probe, vec_col, id_col)
        )

    import numpy as np
    import pandas as pd

    q_rows = queries.select(F.col(id_col), F.col(vec_col)).limit(
        max_bounded_queries + 1
    ).collect()
    if len(q_rows) > max_bounded_queries:
        # the frame exceeds the bounded-serving contract — degrade to
        # the unbounded join kernel rather than risk a driver OOM
        return _finish(
            _ivf_scored_join(assigned, centroids, queries, n_probe, vec_col, id_col)
        )
    q_rows = sorted(q_rows, key=lambda r: r[0])
    if not q_rows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine_sim double, rank long"
        )
    cent = np.asarray(centroids, dtype=np.float64)
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    nq, dim = q_mat.shape
    q_nrm = _seq_norm(q_mat)
    c_nrm = _seq_norm(cent)
    # centroid ranking driver-side, same comparator as the expression
    # twin: cosine desc, cluster asc, first n_probe
    dots = np.zeros((nq, len(cent)), dtype=np.float64)
    for d in range(dim):
        dots += q_mat[:, d][:, None] * cent[:, d][None, :]
    c_sims = dots / (q_nrm[:, None] * c_nrm[None, :])
    cluster_ids = np.arange(len(cent))
    probe_lists: dict[int, list[int]] = {}
    for j in range(nq):
        for c in np.lexsort((cluster_ids, -c_sims[j]))[:n_probe]:
            probe_lists.setdefault(int(c), []).append(j)
    # plain closure variable, NOT a broadcast: the dict is ≤ q·n_probe
    # int64 ids (bounded-serving contract), and a per-call broadcast
    # would leak one handle per streaming micro-batch onto the
    # GC-driven ContextCleaner queue (ADVICE r10)
    probes = {c: np.array(js, dtype=np.int64) for c, js in probe_lists.items()}

    # JVM-side cell prune (literal IN over ≤ q·n_probe cluster ids) —
    # non-probed cells never reach Arrow
    cand = assigned.filter(
        F.col("cluster").isin(sorted(probe_lists))
    ).select("neighbor_id", "c_vec", "cluster")

    def _score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            per_ids: list[list] = [[] for _ in range(nq)]
            per_sims: list[list] = [[] for _ in range(nq)]
            for c, grp in pdf.groupby("cluster"):
                js = probes.get(int(c))
                if js is None:
                    continue
                vecs = np.array(grp["c_vec"].tolist(), dtype=np.float64)
                nrm = _seq_norm(vecs)
                qm = q_mat[js]
                dots = np.zeros((len(grp), len(js)), dtype=np.float64)
                for d in range(dim):  # sequential over dims = exact order
                    dots += vecs[:, d][:, None] * qm[:, d][None, :]
                sims = dots / (q_nrm[js][None, :] * nrm[:, None])
                ids = grp["neighbor_id"].to_numpy()
                for col, j in enumerate(js):
                    per_ids[j].append(ids)
                    per_sims[j].append(sims[:, col])
            qs, ns, ss = [], [], []
            for j in range(nq):
                if not per_ids[j]:
                    continue
                cid = np.concatenate(per_ids[j])
                csim = np.concatenate(per_sims[j])
                keep = cid != q_ids[j]
                cid, csim = cid[keep], csim[keep]
                # local top-k by (sim desc, id asc): any global top-k
                # row is a local top-k row under the same comparator,
                # so the exact window below sees every contender
                order = np.lexsort((cid, -csim))[:k]
                qs.append(np.full(len(order), q_ids[j]))
                ns.append(cid[order])
                ss.append(csim[order])
            if qs:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(qs),
                        "neighbor_id": np.concatenate(ns),
                        "cosine_sim": np.concatenate(ss),
                    }
                )

    scored = cand.mapInPandas(
        _score, schema="query_id long, neighbor_id long, cosine_sim double"
    )
    return _finish(scored)


def _ivf_scored_join(
    assigned: DataFrame,
    centroids,
    queries: DataFrame,
    n_probe: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Expression-join scoring body (the pre-r10 kernel): the
    unbounded-query-frame twin of the GEMM path, and its bit-exactness
    oracle in pytest."""
    spark = assigned.sparkSession
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        ["cluster", "centroid"],
    )

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    # rank centroids per query, keep n_probe nearest (by cosine)
    qc = q.crossJoin(broadcast(cent_df)).select(
        "query_id",
        "q_vec",
        "cluster",
        (
            _dot(F.col("q_vec"), F.col("centroid"))
            / (_norm(F.col("q_vec")) * _norm(F.col("centroid")))
        ).alias("c_sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("c_sim"), F.asc("cluster"))
    probes = (
        qc.withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= n_probe)
        .select("query_id", "q_vec", "cluster")
    )
    return (
        assigned.join(broadcast(probes), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (_norm(F.col("q_vec")) * _norm(F.col("c_vec")))
            ).alias("cosine_sim"),
        )
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_length: float = 2.0,
    num_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate kNN via random-projection LSH (Euclidean buckets).
    The scale path: candidate generation touches only colliding buckets.
    Returns (query_id, neighbor_id, eucl_dist, rank)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(
        F.col(id_col).alias("id"), array_to_vector(F.col(vec_col)).alias("features")
    )
    q = queries.select(
        F.col(id_col).alias("id"), array_to_vector(F.col(vec_col)).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_tables,
        seed=seed,
    )
    model = lsh.fit(c)
    joined = model.approxSimilarityJoin(q, c, float("inf"), distCol="eucl_dist")
    pairs = joined.filter(F.col("datasetA.id") != F.col("datasetB.id")).select(
        F.col("datasetA.id").alias("query_id"),
        F.col("datasetB.id").alias("neighbor_id"),
        "eucl_dist",
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("eucl_dist"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("eucl_dist", 6).alias("eucl_dist"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_col: str = "q_vec",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization (storage/IO tier for
    embedding corpora): ``q = round(v / s)`` with ``s = max|v| / 127``.

    4x smaller than float32 on disk and over every shuffle; cosine of
    the int vectors approximates cosine of the originals because the
    per-vector scales cancel in the ratio. The scale column rides along
    so originals can be approximately reconstructed (error ≤ s/2 per
    element). Pure codegen; the scale is materialized as a column FIRST
    so the quantizing lambda doesn't re-evaluate the array_max per
    element (interpreted-HOF rule, see SCALE.md §5)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    s = (
        F.greatest(
            F.array_max(F.transform(v, lambda x: F.abs(x))), F.lit(1e-30)
        )
        / F.lit(127.0)
    )
    return (
        df.withColumn(scale_col, s.cast("float"))
        .withColumn(
            q_col,
            F.transform(
                F.col(vec_col),
                lambda x: F.round(
                    x.cast("double") / F.col(scale_col)
                ).cast("tinyint"),
            ),
        )
        .select(F.col(id_col).alias("id"), q_col, scale_col)
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    oversample: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quantized: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k via int8-quantized scoring + exact rescore —
    the memory-bound scale path (complements the compute-bound IVF
    path): the full-precision corpus is read ONLY for the ~k·oversample
    survivors per query; the scan-side scoring touches 1/4 the bytes.

    Stages: (1) score every corpus row against the broadcast quantized
    query set with a vectorized int32 GEMM per Arrow batch, keeping the
    per-batch top k·oversample per query; (2) one small shuffle ranks
    the surviving (query, neighbor, approx) triples globally; (3) the
    survivors join back their float vectors for an exact cosine rescore
    (same sequential-sum semantics as ``cosine_topk``). Recall is
    governed by ``oversample``; emitted similarities are exact.
    ``quantized`` accepts a pre-quantized (id, q_vec, q_scale) frame —
    the production case where int8 is the stored format."""
    import numpy as np
    import pandas as pd

    q_corp = (
        quantized
        if quantized is not None
        else quantize_embeddings(corpus, vec_col, id_col)
    )
    q_rows = quantize_embeddings(queries, vec_col, id_col).collect()
    q_ids = np.array([r["id"] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r["q_vec"] for r in q_rows], dtype=np.int32)
    q_norm = np.maximum(np.sqrt((q_mat.astype(np.float64) ** 2).sum(axis=1)), 1e-30)
    m = k * oversample

    def _score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            c_mat = np.array(pdf["q_vec"].tolist(), dtype=np.int32)
            c_norm = np.maximum(
                np.sqrt((c_mat.astype(np.float64) ** 2).sum(axis=1)), 1e-30
            )
            sims = (c_mat @ q_mat.T) / (c_norm[:, None] * q_norm[None, :])
            ids = pdf["id"].to_numpy()
            out = []
            for j, qid in enumerate(q_ids):
                col = sims[:, j]
                keep = np.argsort(-col, kind="stable")[: m + 1]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": ids[keep],
                            "approx_sim": col[keep],
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    scored = q_corp.mapInPandas(
        _score, schema="query_id long, neighbor_id long, approx_sim double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_sim"), F.asc("neighbor_id")
    )
    survivors = (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= m)
        .select("query_id", "neighbor_id")
    )
    # exact rescore: float vectors join back for survivors only
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    rescored = (
        survivors.join(c, "neighbor_id")
        .join(broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (_norm(F.col("q_vec")) * _norm(F.col("c_vec")))
            ).alias("cosine_sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine_sim", 6).alias("cosine_sim"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def embedding_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    as_array: bool = False,
    bits: int = 20,
) -> DataFrame:
    """Per-label centroid (elementwise mean) of an embedding column —
    class prototypes / cluster summaries over array<float>.

    Scale shape: posexplode to (label, idx, val) and aggregate on
    (label, idx) — partial aggregation map-side-combines each
    dimension, the shuffle carries |labels|·dim tiny rows, and no
    executor ever holds more than one dimension of one label.

    Exactness: values are fixed-point quantized to ``bits`` fractional
    bits before summing — multiplying by 2^bits only shifts the IEEE
    exponent (exact for every float), floor is unambiguous, and integer
    sums are order-independent. The result is therefore bit-identical
    regardless of partitioning AND across engines (decimal casts are
    not: float→decimal rounding of shortest-repr ties differs between
    engines — observed 1 row in 6400 on the test corpus). At bits=20
    the quantization error of the mean is < 2^-20 ≈ 1e-6, below
    float32's own noise floor for unit-scale embeddings.

    Long format (label, idx, n, mean_val) by default — scalar columns
    hash cleanly across engines. ``as_array=True`` reassembles
    (label, centroid array) via a bounded collect_list (dim elements).
    """
    scale = float(1 << bits)
    ex = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("idx0", "val"),
    )
    long = (
        ex.groupBy("label", (F.col("idx0") + 1).alias("idx"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("val").cast("double") * F.lit(scale))
            ).alias("__s"),
        )
        .select(
            "label",
            "idx",
            "n",
            (F.col("__s").cast("double") / F.col("n") / F.lit(scale)).alias(
                "mean_val"
            ),
        )
    )
    if not as_array:
        return long
    return (
        long.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "mean_val"))),
                lambda s: s["mean_val"],
            ).alias("centroid"),
            F.max("n").alias("n"),
        )
    )


def cluster_embeddings(
    corpus: DataFrame,
    k: int = 16,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    max_iter: int = 20,
    out_col: str = "cluster",
) -> DataFrame:
    """Corpus clustering for curation analytics — the building block of
    cluster-balanced sampling and SemDeDup-style curation (Abbas et al.
    2023): FAISS-style sampled driver-side Lloyd fit
    (``_fit_centroids_sampled`` — deterministic across sessions and
    partitionings) followed by ONE fully distributed vectorized
    assignment pass.

    Returns the narrow frame (id_col, out_col) — wide vectors never
    ride a join; callers join assignments back by id where needed.
    Assignment is squared-L2 argmin against the fitted centroids via
    the SAME expansion-form distance as the fit (``_sq_dists``), with
    ties to the lower cluster id. A NULL, wrong-dimension, or
    non-finite embedding gets cluster −1 instead of killing the task —
    the quarantine convention (never a lost row); filter ``< 0``
    downstream for the audit table.
    """
    import numpy as np
    import pandas as pd

    centroids = _fit_centroids_sampled(
        corpus, vec_col=vec_col, id_col=id_col, k=k, seed=seed,
        max_iter=max_iter,
    )
    c_sq = (centroids * centroids).sum(axis=1)
    dim = centroids.shape[1]

    def _assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            raw = pdf["v"].tolist()
            out = np.full(len(raw), -1, dtype="int32")
            valid_idx = [
                i
                for i, v in enumerate(raw)
                if v is not None
                and len(v) == dim
                and not any(e is None for e in v)
            ]
            if valid_idx:
                vecs = np.array(
                    [raw[i] for i in valid_idx], dtype=np.float64
                )
                finite = np.isfinite(vecs).all(axis=1)
                if finite.any():
                    d2 = _sq_dists(vecs[finite], centroids, c_sq)
                    keep = np.array(valid_idx)[finite]
                    out[keep] = d2.argmin(axis=1).astype("int32")
            yield pd.DataFrame({"id": pdf["id"], out_col: out})

    return (
        _narrow_vectors(corpus, id_col, vec_col)
        .mapInPandas(_assign, schema=f"id long, {out_col} int")
        .withColumnRenamed("id", id_col)
    )
