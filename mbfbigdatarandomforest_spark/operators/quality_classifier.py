"""Classifier-based quality filtering (the GPT-3 recipe).

GPT-3's data pipeline (Brown et al. 2020, Appendix A) filters Common
Crawl with a logistic-regression classifier trained to separate a
trusted positive corpus (WebText/Wikipedia/books) from raw crawl text,
featurized with hashed n-grams, then keeps a document stochastically
when ``score > 1 − β·X`` with X ~ Pareto — re-crawling the
distribution's tail rather than hard-thresholding. LLaMA and most
open-data pipelines reuse the same shape.

Spark-first mapping, every stage a stock primitive:

- **Featurization** — ``RegexTokenizer`` + ``HashingTF`` (JVM-side
  hashed bag-of-tokens; the MLlib twin of DSIR's md5 bucket histograms).
- **Training** — ``LogisticRegression`` on label 1 = target-corpus
  docs, label 0 = a deterministic sample of the raw corpus
  (``hash_fraction_sample`` — reproducible negatives, no RNG).
- **Scoring** — one ``PipelineModel.transform`` scan; the model is a
  broadcast artifact of ``numFeatures`` coefficients.
- **Pareto keep rule** — deterministic: the Pareto draw comes from the
  md5 of the doc id (u = (h+0.5)/2³², X = u^(−1/α) − 1 for Pareto(α)),
  so the kept set reproduces across engines, runs and partitionings —
  the same determinism convention as ``operators.sampling``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import _hash_key, hash_fraction_sample


def train_quality_classifier(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    num_features: int = 1 << 18,
    negative_fraction: float = 1.0,
    neg_key_col: str = "doc_id",
    reg_param: float = 0.0001,
):
    """Fit the tokenize→HashingTF→LR pipeline. Returns a PipelineModel
    whose ``transform`` adds ``probability``/``prediction``.

    ``negative_fraction`` < 1 downsamples the raw side deterministically
    (md5 on ``neg_key_col``) when the raw corpus dwarfs the target —
    the class-balance knob of the published recipe.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    neg = raw
    if negative_fraction < 1.0:
        neg = hash_fraction_sample(
            raw, negative_fraction, key_col=neg_key_col, salt="qcneg"
        )
    train = target.select(F.col(text_col), F.lit(1.0).alias("label")).unionByName(
        neg.select(F.col(text_col), F.lit(0.0).alias("label"))
    )
    pipe = Pipeline(
        stages=[
            RegexTokenizer(
                inputCol=text_col, outputCol="__toks", pattern=r"\s+",
                toLowercase=True,
            ),
            HashingTF(
                inputCol="__toks", outputCol="features",
                numFeatures=num_features,
            ),
            LogisticRegression(
                labelCol="label", featuresCol="features", regParam=reg_param
            ),
        ]
    )
    return pipe.fit(train)


def score_quality(
    model,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "quality_prob",
) -> DataFrame:
    """(id_col, out_col): P(target | doc) under the classifier — one
    transform scan, no shuffle."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(docs.select(id_col, text_col))
    return scored.select(
        id_col,
        F.element_at(vector_to_array("probability"), 2).alias(out_col),
    )


def pareto_keep(
    scored: DataFrame,
    alpha: float = 9.0,
    id_col: str = "doc_id",
    score_col: str = "quality_prob",
    salt: str = "",
) -> DataFrame:
    """GPT-3's stochastic keep rule, made deterministic: keep a doc when
    ``score > 1 − X`` with X Pareto(α)-distributed via the inverse CDF
    of a md5-derived uniform (X = u^(−1/α) − 1). High-score docs are
    kept almost surely; low-score docs survive with the Pareto tail
    probability — the published soft threshold that avoids a hard
    quality cliff. Pure filter: zero shuffle, pushes toward the scan."""
    return scored.filter(
        pareto_keep_flag(alpha=alpha, id_col=id_col, score_col=score_col, salt=salt)
    )


def pareto_keep_flag(
    alpha: float = 9.0,
    id_col: str = "doc_id",
    score_col: str = "quality_prob",
    salt: str = "",
):
    """The keep rule as a boolean Column — for callers that want the
    flag without filtering (rollups, audits) and to guarantee a single
    scoring pass (a separate filter subtree would re-run the classifier
    transform). Keyed via the SHARED md5 convention
    (``operators.sampling._hash_key``) so Pareto draws stay in lockstep
    with every other deterministic sampler."""
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    h = F.conv(F.substring(_hash_key(id_col, salt), 1, 8), 16, 10).cast("long")
    u = (h + F.lit(0.5)) / F.lit(float(1 << 32))
    x = F.pow(u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return F.col(score_col) > F.lit(1.0) - x
