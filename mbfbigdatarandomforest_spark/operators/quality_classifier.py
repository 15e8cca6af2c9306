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


def anchor_target_features(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(domain, anchor_n, anchor_distinct, anchor_avg_len) — per-TARGET
    registered domain aggregates of the corpus's anchor texts (r13,
    verdict item 6): the classic anchor-file signal — the text OTHER
    pages use when linking a target describes it independently of its
    own content (the ``anchor_text_stats`` shape, reshaped as a
    classifier side-feature table). One extraction scan (the
    ``html_anchor_texts`` double-pass), hrefs absolutized against the
    page URL, grouped by the target's registered domain; the table is
    O(domains) — broadcast-joinable against any corpus."""
    from .text import html_anchor_texts, resolve_link
    from .urls import url_registered_domain

    pairs = pages.select(
        F.col(url_col).alias("__page"),
        F.explode(html_anchor_texts(html_col)).alias("__a"),
    ).select(
        url_registered_domain(
            resolve_link(F.col("__page"), F.col("__a.href"))
        ).alias("domain"),
        F.col("__a.text").alias("__text"),
    ).filter(F.col("domain") != "")
    return pairs.groupBy("domain").agg(
        F.count(F.lit(1)).cast("double").alias("anchor_n"),
        F.count_distinct("__text").cast("double").alias("anchor_distinct"),
        F.avg(F.length("__text")).alias("anchor_avg_len"),
    )


#: The numeric side-feature columns :func:`anchor_target_features`
#: produces — pass as ``numeric_cols`` to the trainer/scorer.
ANCHOR_FEATURE_COLS = ("anchor_n", "anchor_distinct", "anchor_avg_len")


def with_anchor_features(
    docs: DataFrame,
    anchor_feats: DataFrame,
    domain_col: str = "source",
) -> DataFrame:
    """Left-join the per-domain anchor aggregates onto a document frame
    keyed by its registered domain (``domain_col``), zero-filling
    domains nobody links to — the fused feature frame the classifier
    trains/scores on. Spark broadcasts the O(domains) side."""
    feats = anchor_feats.select(
        F.col("domain").alias("__adom"), *ANCHOR_FEATURE_COLS
    )
    out = docs.join(
        F.broadcast(feats), docs[domain_col] == feats["__adom"], "left"
    ).drop("__adom")
    return out.withColumns(
        {c: F.coalesce(c, F.lit(0.0)) for c in ANCHOR_FEATURE_COLS}
    )


def train_quality_classifier(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    num_features: int = 1 << 18,
    negative_fraction: float = 1.0,
    neg_key_col: str = "doc_id",
    reg_param: float = 0.0001,
    numeric_cols: tuple[str, ...] = (),
):
    """Fit the tokenize→HashingTF→LR pipeline. Returns a PipelineModel
    whose ``transform`` adds ``probability``/``prediction``.

    ``negative_fraction`` < 1 downsamples the raw side deterministically
    (md5 on ``neg_key_col``) when the raw corpus dwarfs the target —
    the class-balance knob of the published recipe.

    ``numeric_cols`` (r13): extra numeric feature columns assembled
    AFTER the hashed text features (e.g. the anchor-file aggregates of
    :func:`anchor_target_features` joined via
    :func:`with_anchor_features`) — the LR coefficient for column i
    sits at vector index ``num_features + i``, which is how the
    feature-importance pytest reads them back."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    neg = raw
    if negative_fraction < 1.0:
        neg = hash_fraction_sample(
            raw, negative_fraction, key_col=neg_key_col, salt="qcneg"
        )
    cols = [F.col(text_col), *(F.col(c) for c in numeric_cols)]
    train = target.select(*cols, F.lit(1.0).alias("label")).unionByName(
        neg.select(*cols, F.lit(0.0).alias("label"))
    )
    tf_out = "__tf" if numeric_cols else "features"
    stages = [
        RegexTokenizer(
            inputCol=text_col, outputCol="__toks", pattern=r"\s+",
            toLowercase=True,
        ),
        HashingTF(
            inputCol="__toks", outputCol=tf_out,
            numFeatures=num_features,
        ),
    ]
    if numeric_cols:
        from pyspark.ml.feature import VectorAssembler

        stages.append(
            VectorAssembler(
                inputCols=[tf_out, *numeric_cols], outputCol="features"
            )
        )
    stages.append(
        LogisticRegression(
            labelCol="label", featuresCol="features", regParam=reg_param
        )
    )
    return Pipeline(stages=stages).fit(train)


def score_quality(
    model,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "quality_prob",
    numeric_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id_col, out_col): P(target | doc) under the classifier — one
    transform scan, no shuffle. Pass the trainer's ``numeric_cols``
    when the model was fitted with side features."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(docs.select(id_col, text_col, *numeric_cols))
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
