"""Single-pass OLS via distributed sufficient statistics (L2/L7).

The textbook scale shape for linear least squares on a cluster: one
Arrow-batched pass accumulates the Gramian G = Z'Z of
Z = [1 | numerics | one-hot dummies | y] per batch, the driver sums
the (k+1)² matrices and solves the normal equations — the data is
touched ONCE for training and once more never: test metrics come from
the TEST split's Gramian and the train-fit β in closed form
(SSE = y'y − 2β'X'y + β'X'Xβ), so no per-row prediction frame is ever
materialized. Replaces the reference's gpuLm solve
(03_LinearRegression.R:73-78) with sufficient statistics instead of a
GPU.

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
) -> dict[str, float]:
    """na.drop → seeded split (identical to ``train_and_evaluate``) →
    level dictionaries (one indexer pass) → ONE tagged Gramian pass
    over both splits → driver-side solve + closed-form metrics.

    Returns the same ``{split}_{metric}`` dict as the MLlib path."""
    import pandas as pd

    from pyspark.ml.feature import StringIndexer

    data = df.na.drop(subset=[label_col] + categorical + numeric)
    parallelism = data.sparkSession.sparkContext.defaultParallelism
    if data.rdd.getNumPartitions() < parallelism:
        data = data.repartition(parallelism)
    data = data.cache()
    train, test = data.randomSplit([train_fraction, 1 - train_fraction], seed=seed)

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

    tagged = train.withColumn("__split", F.lit("train")).unionByName(
        test.withColumn("__split", F.lit("test"))
    )
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
    data.unpersist()

    Gtr = grams["train"]
    beta = np.linalg.pinv(Gtr[:k, :k]) @ Gtr[:k, k]
    n_features = len(numeric) + len(categorical)
    out: dict[str, float] = {}
    for split in ("train", "test"):
        for name, v in _metrics_from_gram(grams[split], beta, n_features).items():
            out[f"{split}_{name}"] = v
    return out
