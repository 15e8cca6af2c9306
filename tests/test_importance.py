"""DSIR-style importance weighting (operators/importance.py).

Layers: exact DuckDB parity for the integer bucket-count histograms
(md5 bucketing is engine-portable by construction), a pure-Python
full-pipeline oracle for the float log-weights (1e-9 relative — ln is
not bit-portable), exact selection parity for Gumbel-top-k, and a
behavioral check that selection enriches the target domain.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pytest

from pyspark.sql import functions as F

from conftest import SF_DIR_ORACLE, SF_DIR_SMALL
from mbfbigdatarandomforest_spark.operators import importance as imp

BUCKETS = 4096


# ---------- pure-Python oracle ----------
def _py_tokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.strip().lower()) if t]


def _py_grams(text: str) -> list[str]:
    t = _py_tokens(text)
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


def _py_bucket(gram: str, buckets: int, salt: str = "") -> int:
    return int(hashlib.md5((salt + gram).encode()).hexdigest()[:8], 16) % buckets


def _py_hist(texts, buckets):
    c: Counter = Counter()
    for t in texts:
        for g in _py_grams(t):
            c[_py_bucket(g, buckets)] += 1
    return c


def _py_log_weights(raw_rows, target_texts, buckets, alpha=1.0):
    tgt = _py_hist(target_texts, buckets)
    rawh = _py_hist((t for _, t in raw_rows), buckets)
    dt = sum(tgt.values()) + alpha * buckets
    dr = sum(rawh.values()) + alpha * buckets
    out = {}
    for doc_id, text in raw_rows:
        grams = _py_grams(text)
        if not grams:
            out[doc_id] = (0, None)
            continue
        w = sum(
            math.log((tgt.get(_py_bucket(g, buckets), 0) + alpha) / dt)
            - math.log((rawh.get(_py_bucket(g, buckets), 0) + alpha) / dr)
            for g in grams
        )
        out[doc_id] = (len(grams), w)
    return out


def test_bucket_counts_match_duckdb_exactly(spark, duck):
    got = {
        r["bucket"]: r["c"]
        for r in imp.hashed_bucket_counts(
            spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet"), buckets=BUCKETS
        ).collect()
    }
    want = dict(
        duck.sql(f"""
WITH toks AS (
  SELECT list_filter(
           string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
           t -> t != ''
         ) AS tk
  FROM documents
), grams AS (
  SELECT UNNEST(tk) AS g FROM toks
  UNION ALL
  SELECT UNNEST(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) FROM toks
)
SELECT CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) % {BUCKETS} AS bucket,
       COUNT(*) AS c
FROM grams GROUP BY 1
""").fetchall()
    )
    assert got == want


def test_log_weights_match_python_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
    target = docs.filter(F.col("lang") == "en")
    raw = docs.filter(F.col("lang") != "en")
    got = {
        r["doc_id"]: (r["n_grams"], r["log_weight"])
        for r in imp.dsir_log_weights(raw, target, buckets=BUCKETS).collect()
    }
    raw_rows = [(r["doc_id"], r["text"]) for r in raw.select("doc_id", "text").collect()]
    tgt_texts = [r["text"] for r in target.select("text").collect()]
    want = _py_log_weights(raw_rows, tgt_texts, BUCKETS)
    assert set(got) == set(want)
    for doc_id, (n, w) in want.items():
        gn, gw = got[doc_id]
        assert gn == n, doc_id
        if w is None:
            assert gw is None, doc_id
        else:
            assert gw == pytest.approx(w, rel=1e-9), doc_id


def test_gumbel_topk_matches_python_selection(spark):
    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
    target = docs.filter(F.col("lang") == "en")
    raw = docs.filter(F.col("lang") != "en")
    weighted = imp.dsir_log_weights(raw, target, buckets=BUCKETS)
    got = {r["doc_id"] for r in imp.gumbel_topk(weighted, 40, salt="s").collect()}

    def py_key(doc_id, w):
        h = int(hashlib.md5(f"s{doc_id}".encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / float(1 << 32)
        return (w if w is not None else -math.inf) - math.log(-math.log(u))

    rows = weighted.collect()
    want = {
        r["doc_id"]
        for r in sorted(rows, key=lambda r: (-py_key(r["doc_id"], r["log_weight"]), r["doc_id"]))[:40]
    }
    assert got == want


def test_empty_doc_gets_null_weight_and_survives(spark):
    raw = spark.createDataFrame(
        [(1, "a b"), (2, "   "), (3, "")], "doc_id long, text string"
    )
    target = spark.createDataFrame([(9, "a b a")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in imp.dsir_log_weights(raw, target, buckets=64).collect()}
    assert len(rows) == 3
    assert rows[2]["n_grams"] == 0 and rows[2]["log_weight"] is None
    assert rows[3]["n_grams"] == 0 and rows[3]["log_weight"] is None
    assert rows[1]["log_weight"] is not None
    # NULL weights rank below every finite weight
    sel = {r["doc_id"] for r in imp.gumbel_topk(
        imp.dsir_log_weights(raw, target, buckets=64), 1
    ).collect()}
    assert sel == {1}


def test_selection_enriches_target_domain(spark):
    """Selecting from the FULL corpus against an English target must
    raise the English share vs the raw base rate — the point of DSIR."""
    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
    target = docs.filter(F.col("lang") == "en")
    weighted = imp.dsir_log_weights(docs, target, buckets=BUCKETS)
    sel = imp.gumbel_topk(weighted, 100).join(docs.select("doc_id", "lang"), "doc_id")
    en_sel = sel.filter(F.col("lang") == "en").count() / 100.0
    total = docs.count()
    en_base = target.count() / total
    assert en_sel > en_base + 0.15, (en_sel, en_base)


def test_registered_query_runs(spark):
    from mbfbigdatarandomforest_spark.registry import load_all

    spec = load_all()["sample_importance_dsir"]
    df = spec.fn(spark, SF_DIR_SMALL)
    rows = df.collect()
    assert df.columns == ["doc_id", "lang", "n_grams", "log_weight_6"]
    assert 0 < len(rows) <= 100
