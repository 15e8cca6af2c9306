"""Classifier-based quality filtering (operators/quality_classifier.py),
the GPT-3 Appendix-A recipe: HashingTF + LogisticRegression + a
deterministic Pareto keep rule.
"""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from conftest import SF_DIR_SMALL
from mbfbigdatarandomforest_spark.operators import quality_classifier as qc


@pytest.fixture(scope="module")
def scored(spark):
    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
    target = docs.filter(F.col("lang") == "en")
    model = qc.train_quality_classifier(target, docs.filter(F.col("lang") != "en"))
    return docs, qc.score_quality(model, docs).cache()


def test_classifier_separates_target_domain(spark, scored):
    docs, s = scored
    j = s.join(docs.select("doc_id", "lang"), "doc_id")
    avg = {
        r["is_en"]: r["p"]
        for r in j.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("quality_prob").alias("p"))
        .collect()
    }
    assert avg[True] > avg[False]


def test_pareto_keep_matches_python_oracle(spark, scored):
    _, s = scored
    alpha = 3.0
    got = {r["doc_id"] for r in qc.pareto_keep(s, alpha=alpha).collect()}
    want = set()
    for r in s.collect():
        h = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / float(1 << 32)
        x = u ** (-1.0 / alpha) - 1.0
        if r["quality_prob"] > 1.0 - x:
            want.add(r["doc_id"])
    assert got == want and 0 < len(got) < s.count()


def test_pareto_keep_partition_invariant(spark, scored):
    _, s = scored
    a = {r["doc_id"] for r in qc.pareto_keep(s, alpha=3.0).collect()}
    b = {r["doc_id"] for r in qc.pareto_keep(s.repartition(13), alpha=3.0).collect()}
    assert a == b


def test_pareto_high_scores_always_survive(spark):
    """score > 1 keeps a doc regardless of the draw (X > 0); scores at
    exactly 1.0 survive because Pareto X is strictly positive."""
    s = spark.createDataFrame(
        [(i, 1.0) for i in range(50)], "doc_id long, quality_prob double"
    )
    assert qc.pareto_keep(s, alpha=9.0).count() == 50


def test_registered_query_runs(spark):
    from mbfbigdatarandomforest_spark.registry import load_all

    df = load_all()["text_quality_classifier"].fn(spark, SF_DIR_SMALL)
    rows = df.collect()
    assert df.columns == ["kept", "n_docs", "n_en", "avg_prob_6"]
    assert sum(r["n_docs"] for r in rows) > 0


def test_negative_downsampling_is_deterministic(spark):
    """negative_fraction < 1 must select the same md5-keyed negatives on
    every run/partitioning (the class-balance knob)."""
    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
    target = docs.filter(F.col("lang") == "en")
    raw = docs.filter(F.col("lang") != "en")
    m1 = qc.train_quality_classifier(target, raw, negative_fraction=0.5)
    m2 = qc.train_quality_classifier(target, raw.repartition(7), negative_fraction=0.5)
    a = qc.score_quality(m1, docs).collect()
    b = {r["doc_id"]: r["quality_prob"] for r in qc.score_quality(m2, docs).collect()}
    for r in a:
        assert r["quality_prob"] == pytest.approx(b[r["doc_id"]], rel=1e-9)


def test_anchor_features_fused_frame_and_importance(spark):
    """r13 (verdict item 6): the anchor-file corpus as a target-side
    quality feature. (a) with_anchor_features ≡ a manual left join +
    zero-fill; (b) on a planted fixture where the TEXT is uninformative
    (both classes share one vocabulary) but linked domains carry many
    distinct anchors, the classifier's coefficients put the weight on
    the anchor slots (num_features + i) and scoring separates the
    classes through them."""
    from pyspark.ml.functions import vector_to_array

    # pages: domain 'linked.example' receives MANY distinct anchors,
    # 'dark.example' receives none
    pages = spark.createDataFrame(
        [
            (
                f"https://hub{i}.example/p",
                f'<html><a href="https://linked.example/x{i}">'
                f"useful reference {i}</a>"
                f'<a href="https://linked.example/y{i}">guide {i}</a>'
                "</html>",
            )
            for i in range(8)
        ],
        "url string, html string",
    )
    feats = qc.anchor_target_features(pages)
    rows = {r["domain"]: r for r in feats.collect()}
    assert rows["linked.example"]["anchor_n"] == 16.0
    assert rows["linked.example"]["anchor_distinct"] == 16.0
    assert set(rows) == {"linked.example"}

    # docs: same constant text everywhere — only the anchor side can
    # separate label 1 (linked domain) from label 0 (dark domain)
    text = "plain words all the same in every document here"
    docs = spark.createDataFrame(
        [
            (i, text, "linked.example" if i % 2 == 0 else "dark.example")
            for i in range(40)
        ],
        "doc_id long, text string, source string",
    )
    fused = qc.with_anchor_features(docs, feats)
    # (a) fused ≡ manual join + zero-fill
    manual = (
        docs.join(
            feats.withColumnRenamed("domain", "source"), "source", "left"
        )
        .fillna(0.0, subset=list(qc.ANCHOR_FEATURE_COLS))
        .select(*fused.columns)
    )
    assert sorted(map(tuple, fused.collect())) == sorted(
        map(tuple, manual.collect())
    )
    # (b) train: positives are the linked-domain docs
    target = fused.filter(F.col("source") == "linked.example")
    raw = fused.filter(F.col("source") == "dark.example")
    nf = 1 << 10
    model = qc.train_quality_classifier(
        target, raw, num_features=nf,
        numeric_cols=qc.ANCHOR_FEATURE_COLS,
    )
    lr = model.stages[-1]
    coefs = lr.coefficients.toArray()
    text_mass = float(abs(coefs[:nf]).max()) if nf else 0.0
    anchor_coefs = coefs[nf:]
    assert len(anchor_coefs) == len(qc.ANCHOR_FEATURE_COLS)
    # the anchor slots carry the signal; the (identical) text cannot
    assert float(abs(anchor_coefs).max()) > 10 * max(text_mass, 1e-12)
    scored = qc.score_quality(
        model, fused, numeric_cols=qc.ANCHOR_FEATURE_COLS
    ).join(docs.select("doc_id", "source"), "doc_id")
    probs = {
        r["source"]: r["p"]
        for r in scored.groupBy("source")
        .agg(F.avg("quality_prob").alias("p"))
        .collect()
    }
    assert probs["linked.example"] > 0.9 > 0.1 > probs["dark.example"]
