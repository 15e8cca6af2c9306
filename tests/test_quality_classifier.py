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
