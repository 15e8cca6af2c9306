"""Single-pass OLS via distributed sufficient statistics (L2/L7).

The textbook scale shape for linear least squares on a cluster: one
pass accumulates the Gramian G = Z'Z of
Z = [1 | numerics | one-hot dummies | y], the driver solves the normal
equations — the data is touched ONCE for training and once more never:
test metrics come from the TEST split's Gramian and the train-fit β in
closed form (SSE = y'y − 2β'X'y + β'X'Xβ), so no per-row prediction
frame is ever materialized. Replaces the reference's gpuLm solve
(03_LinearRegression.R:73-78) with sufficient statistics instead of a
GPU.

Two physical strategies (see ``ols_sufficient_stats_metrics``): a pure
JVM grouped aggregate exploiting that dummies are group indicators
(default; no Python transfer at all), and an Arrow-batched mapInPandas
accumulation for high-cardinality categoricals.

Relationship to the MLlib path: ``regressors.train_and_evaluate(
kind="ols")`` remains the pipeline-integrated route (persistable
PipelineModel, scaled-coefficient option); this module computes
IDENTICAL metrics (same na.drop → same seeded split → same least-
squares minimum; pytest asserts agreement) in roughly half the jobs.
With full dummies + intercept X'X is singular (dummy trap) — β is the
pseudo-inverse minimum-norm solution, whose predictions (and therefore
SSE/R²) equal any other least-squares minimizer's.

Driver-side reduction: one (k+1)² float64 matrix per Arrow batch
(k ≈ 10²-10³ → ≤ MBs per batch). At extreme partition counts sum them
with a two-level treeAggregate; here a single collect of per-batch
rows is already far below driver limits.
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .metrics import adjusted_r2


def _metrics_from_gram(G: np.ndarray, beta: np.ndarray, n_features: int):
    k = G.shape[0] - 1
    n = G[0, 0]
    XtX, Xty, yty = G[:k, :k], G[:k, k], G[k, k]
    sse = float(yty - 2 * beta @ Xty + beta @ XtX @ beta)
    y_sum = G[0, k]
    sst = float(yty - y_sum * y_sum / n) if n else float("nan")
    rmse = math.sqrt(max(sse, 0.0) / n) if n else float("nan")
    r2 = 1.0 - sse / sst if sst > 0 else float("nan")
    return {
        "rmse": rmse,
        "r2": r2,
        "adj_r2": adjusted_r2(r2, int(n), n_features),
        "n": float(n),
    }


def ols_sufficient_stats_metrics(
    df: DataFrame,
    *,
    label_col: str,
    categorical: list[str],
    numeric: list[str],
    train_fraction: float = 0.75,
    seed: int = 123,
    strategy: str = "auto",
    max_groups: int = 200_000,
    split: str = "hash",
) -> dict[str, float]:
    """na.drop → deterministic split (identical to ``train_and_evaluate``)
    → distributed Gramian → driver-side solve + closed-form metrics.

    ``split="hash"`` (default) tags rows via ``ml.splits.tag_split`` —
    one appended column, so the whole grouped-strategy computation is a
    SINGLE scan→aggregate job with no cache, no sort, no double read
    (randomSplit sorts every partition per branch and scans twice; at
    sf0.1 this halves the query's wall time). ``split="random"`` keeps
    the randomSplit path.

    Two physical strategies behind one result:

    - ``grouped`` (default when every categorical is bounded-cardinality,
      which is when one-hot OLS makes sense at all): dummy columns are
      indicator functions of the categorical tuple, so every Z'Z entry
      involving a dummy is a per-group count or per-group numeric sum.
      ONE ``groupBy(categoricals, split)`` aggregate of count/sums/
      pairwise products — pure JVM codegen with map-side combine, no
      string ever crosses to Python — yields a few-thousand-row frame
      from which the driver reassembles the full (k+1)² Gramian. At
      100 TB this is the cheapest possible shape: the shuffle carries
      |brand×type×2| rows of ~25 doubles.
    - ``arrow``: the Arrow-batched ``mapInPandas`` Gramian accumulation
      (kept as the fallback when the observed group count exceeds
      ``max_groups`` — e.g. a high-cardinality categorical where the
      grouped frame itself would rival the data).

    Returns the same ``{split}_{metric}`` dict as the MLlib path; both
    strategies agree with it to float64 accumulation error (pytest).
    """
    cols = [label_col] + categorical + numeric
    data = df.na.drop(subset=cols)
    parallelism = data.sparkSession.sparkContext.defaultParallelism
    cached: DataFrame | None = None
    if split == "hash":
        # One appended codegen column — the grouped strategy below is
        # then a single scan→aggregate job: nothing to cache, no branch
        # ever re-reads the data.
        from .splits import tag_split

        # seed participates via the salt: different seeds give genuinely
        # different (still deterministic, partition-invariant) splits
        tagged = tag_split(data, cols, train_fraction, salt=f"mlsplit{seed}")
        train = tagged.filter(F.col("__split") == "train")
    else:
        if data.rdd.getNumPartitions() < parallelism:
            data = data.repartition(parallelism)
        cached = data = data.cache()
        train, test = data.randomSplit([train_fraction, 1 - train_fraction], seed=seed)
        tagged = train.withColumn("__split", F.lit("train")).unionByName(
            test.withColumn("__split", F.lit("test"))
        )
    try:
        if strategy in ("auto", "grouped"):
            grams, k = _grouped_grams(
                tagged,
                label_col=label_col,
                categorical=categorical,
                numeric=numeric,
                max_groups=max_groups if strategy == "auto" else None,
            )
            if grams is not None:
                return _solve_and_score(grams, k, len(numeric) + len(categorical))
        if cached is None:
            # Arrow fallback makes two passes (train levels + Gramian):
            # now a cache pays for itself. Widen thin scans first —
            # mapInPandas parallelism is the partition count.
            if tagged.rdd.getNumPartitions() < parallelism:
                tagged = tagged.repartition(parallelism)
            cached = tagged = tagged.cache()
            train = tagged.filter(F.col("__split") == "train")
        grams, k = _arrow_grams(
            train, tagged, label_col=label_col, categorical=categorical,
            numeric=numeric,
        )
        return _solve_and_score(grams, k, len(numeric) + len(categorical))
    finally:
        if cached is not None:
            cached.unpersist()


def _solve_and_score(
    grams: dict[str, np.ndarray], k: int, n_features: int
) -> dict[str, float]:
    Gtr = grams["train"]
    beta = np.linalg.pinv(Gtr[:k, :k]) @ Gtr[:k, k]
    out: dict[str, float] = {}
    for split in ("train", "test"):
        for name, v in _metrics_from_gram(grams[split], beta, n_features).items():
            out[f"{split}_{name}"] = v
    return out


def _grouped_grams(
    tagged: DataFrame,
    *,
    label_col: str,
    categorical: list[str],
    numeric: list[str],
    max_groups: int | None,
) -> tuple[dict[str, np.ndarray] | None, int]:
    """Gramians via one grouped aggregate (see strategy note above).

    Returns ``(None, 0)`` when the group count exceeds ``max_groups``.
    The cardinality check runs BEFORE the full collect — a distributed
    aggregate succeeding says nothing about whether its result fits on
    the driver, so we probe with ``limit(max_groups + 1)`` first and
    only collect the whole aggregate once it is known bounded."""
    w = [F.col(c).cast("double") for c in numeric] + [
        F.col(label_col).cast("double")
    ]
    m = len(w)
    aggs = [F.count(F.lit(1)).cast("double").alias("__n")]
    aggs += [F.sum(w[i]).alias(f"__s{i}") for i in range(m)]
    aggs += [
        F.sum(w[i] * w[j]).alias(f"__p{i}_{j}")
        for i in range(m)
        for j in range(i, m)
    ]
    agg = tagged.groupBy("__split", *categorical).agg(*aggs)
    if max_groups is not None:
        # Size probe without materializing the whole aggregate on the
        # driver: limit(max_groups+1) collects at most max_groups+1
        # rows. Complete iff <= max_groups — then reuse it directly;
        # otherwise bail before any unbounded collect.
        probe = agg.limit(max_groups + 1).collect()
        if len(probe) > max_groups:
            return None, 0
        rows = probe
    else:
        rows = agg.collect()

    # train-observed levels define the dummy dictionary (sorted for
    # determinism; dummy ORDER doesn't affect least-squares metrics).
    # Test-only levels get no column — the all-zero row of MLlib's
    # StringIndexer handleInvalid="keep".
    levels = {
        c: sorted({r[c] for r in rows if r["__split"] == "train"})
        for c in categorical
    }
    dummy_idx: list[dict[str, int]] = []
    k = 1 + len(numeric)
    for c in categorical:
        dummy_idx.append({lv: k + i for i, lv in enumerate(levels[c])})
        k += len(levels[c])
    kk = k + 1  # + label
    ylab = k  # label column index in Z
    grams = {"train": np.zeros((kk, kk)), "test": np.zeros((kk, kk))}
    nnum = len(numeric)
    for r in rows:
        G = grams[r["__split"]]
        n = r["__n"]
        s = [r[f"__s{i}"] for i in range(m)]
        # dense block: intercept + numerics + label
        dense = [0] + [1 + i for i in range(nnum)] + [ylab]  # Z columns
        wcol = {0: None}  # Z col → w index (None = intercept)
        for i in range(nnum):
            wcol[1 + i] = i
        wcol[ylab] = m - 1
        for a_i, za in enumerate(dense):
            for zb in dense[a_i:]:
                wa, wb = wcol[za], wcol[zb]
                if wa is None and wb is None:
                    G[za, zb] += n
                elif wa is None:
                    G[za, zb] += s[wb]
                else:
                    lo, hi = min(wa, wb), max(wa, wb)
                    G[za, zb] += r[f"__p{lo}_{hi}"]
        # dummy rows: this group activates at most one dummy per
        # categorical; dummy·dummy = n, dummy·w = group sum of w
        active = [
            dummy_idx[ci].get(r[c])
            for ci, c in enumerate(categorical)
        ]
        for d in active:
            if d is None:
                continue
            G[0, d] += n
            G[d, d] += n
            for i in range(nnum):
                G[1 + i, d] += s[i]
            G[d, ylab] += s[m - 1]
        for ai in range(len(active)):
            for bi in range(ai + 1, len(active)):
                da, db = active[ai], active[bi]
                if da is not None and db is not None:
                    lo, hi = min(da, db), max(da, db)
                    G[lo, hi] += n
    for G in grams.values():
        G += np.triu(G, 1).T
    return grams, k


def _arrow_grams(
    train: DataFrame,
    tagged: DataFrame,
    *,
    label_col: str,
    categorical: list[str],
    numeric: list[str],
) -> tuple[dict[str, np.ndarray], int]:
    """Arrow-batched mapInPandas Gramian accumulation (fallback path)."""
    import pandas as pd

    from pyspark.ml.feature import StringIndexer

    # level dictionaries from TRAIN (same fit frame as the MLlib path)
    if categorical:
        idx = StringIndexer(
            inputCols=categorical,
            outputCols=[f"{c}_idx" for c in categorical],
            handleInvalid="keep",
        ).fit(train)
        labels = {c: list(ls) for c, ls in zip(categorical, idx.labelsArray)}
    else:
        labels = {}
    dummy_offsets = {}
    k = 1 + len(numeric)
    for c in categorical:
        dummy_offsets[c] = k
        k += len(labels[c])

    kk = k + 1  # + label column

    def _gram(batches):
        for pdf in batches:
            for split, part in pdf.groupby("__split"):
                m = len(part)
                if not m:
                    continue
                Z = np.zeros((m, kk), dtype=np.float64)
                Z[:, 0] = 1.0
                for j, c in enumerate(numeric):
                    Z[:, 1 + j] = part[c].to_numpy(dtype=np.float64)
                for c in categorical:
                    codes = pd.Categorical(
                        part[c], categories=labels[c]
                    ).codes  # unseen → -1 → all-zero dummies (keep bucket)
                    seen = codes >= 0
                    Z[np.nonzero(seen)[0], dummy_offsets[c] + codes[seen]] = 1.0
                Z[:, k] = part[label_col].to_numpy(dtype=np.float64)
                G = Z.T @ Z
                yield pd.DataFrame(
                    {"split": [split], "gram": [G.ravel().tolist()]}
                )

    rows = (
        tagged.select("__split", label_col, *numeric, *categorical)
        .mapInPandas(_gram, schema="split string, gram array<double>")
        .collect()
    )
    grams = {"train": np.zeros((kk, kk)), "test": np.zeros((kk, kk))}
    for r in rows:
        grams[r["split"]] += np.array(r["gram"]).reshape(kk, kk)
    return grams, k
