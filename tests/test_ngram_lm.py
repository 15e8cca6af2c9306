"""CCNet-style bigram-LM quality scoring (operators/ngram_lm.py).

Evidence layers:
- exact hand oracle on a 3-doc corpus (probabilities computed on paper);
- full DuckDB twin of the registered `text_lm_perplexity` pipeline at
  SF_DIR_ORACLE — integer stats bit-exact, cross-entropy at 1e-9
  relative tolerance (ln() is not bit-portable across JVM/C runtimes,
  which is exactly why the registered query is rows-only);
- bucket-assignment behavior (balanced terciles, NULL → tail,
  monotone w.r.t. perplexity).
"""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from conftest import SF_DIR_ORACLE
from mbfbigdatarandomforest_spark.operators import ngram_lm as lm_ops

REL_TOL = 1e-9

_LM_TWIN_SQL = """
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(
           string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
           t -> t != ''
         ) AS tk
  FROM documents
), uni AS (
  SELECT w, COUNT(*) AS c
  FROM (SELECT UNNEST(tk) AS w FROM toks WHERE lang = 'en')
  GROUP BY 1
), vocab AS (
  SELECT w FROM uni ORDER BY c DESC, w ASC LIMIT 50000
), vsize AS (
  SELECT COUNT(*) + 1 AS v FROM vocab
), pairs AS (
  SELECT doc_id, lang,
         UNNEST(list_transform(
           range(1, len(tk) + 1),
           i -> struct_pack(
             w1 := CASE WHEN i = 1 THEN chr(2) ELSE tk[i - 1] END,
             w2 := tk[i]
           )
         )) AS p
  FROM toks
), mapped AS (
  SELECT doc_id, lang,
         CASE WHEN p.w1 = chr(2) OR p.w1 IN (SELECT w FROM vocab)
              THEN p.w1 ELSE chr(1) || 'unk' END AS w1,
         CASE WHEN p.w2 IN (SELECT w FROM vocab)
              THEN p.w2 ELSE chr(1) || 'unk' END AS w2,
         CASE WHEN p.w2 IN (SELECT w FROM vocab) THEN 0 ELSE 1 END AS is_oov
  FROM pairs
), big AS (
  SELECT w1, w2, COUNT(*) AS c12 FROM mapped WHERE lang = 'en' GROUP BY 1, 2
), ctx AS (
  SELECT w1, SUM(c12) AS c1 FROM big GROUP BY 1
), scored AS (
  SELECT m.doc_id, m.is_oov,
         ln((COALESCE(b.c12, 0) + 1.0)
            / (COALESCE(c.c1, 0) + 1.0 * (SELECT v FROM vsize))) AS logp
  FROM mapped m
  LEFT JOIN big b ON m.w1 = b.w1 AND m.w2 = b.w2
  LEFT JOIN ctx c ON m.w1 = c.w1
), agg AS (
  SELECT doc_id, COUNT(*) AS n_bigrams, SUM(is_oov) AS n_oov,
         -AVG(logp) AS cross_entropy
  FROM scored GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(a.n_bigrams, 0) AS n_bigrams,
       COALESCE(a.n_oov, 0)     AS n_oov,
       a.cross_entropy
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
ORDER BY d.doc_id
"""


def test_lm_hand_oracle(spark):
    """Corpus 'a b a': vocab {a,b}, V=3, every observed bigram count 1,
    every context count 1 → each p = (1+1)/(1+3) = 1/2, ce = ln 2.
    Doc 3 ('z z'): both targets OOV; (BOS,unk) and (unk,unk) unseen →
    p = 1/(1+3) and 1/3 (ctx unseen → 0+V)."""
    tiny = spark.createDataFrame(
        [(1, "a b a"), (2, "   "), (3, "z z")], "doc_id long, text string"
    )
    lm = lm_ops.train_bigram_lm(tiny.filter("doc_id = 1"))
    assert lm.v == 3  # {a, b} + UNK
    rows = {
        r["doc_id"]: r
        for r in lm_ops.score_cross_entropy(lm, tiny).collect()
    }
    assert rows[1]["n_bigrams"] == 3 and rows[1]["n_oov"] == 0
    assert rows[1]["cross_entropy"] == pytest.approx(math.log(2), rel=1e-12)
    assert rows[1]["perplexity"] == pytest.approx(2.0, rel=1e-12)
    assert rows[2]["n_bigrams"] == 0 and rows[2]["cross_entropy"] is None
    assert rows[3]["n_bigrams"] == 2 and rows[3]["n_oov"] == 2
    # (BOS, unk): c12=0, c1(BOS)=1 → 1/4 ; (unk, unk): c12=0, c1=0 → 1/3
    expected = -(math.log(1 / 4) + math.log(1 / 3)) / 2
    assert rows[3]["cross_entropy"] == pytest.approx(expected, rel=1e-12)


def test_lm_duckdb_twin_parity(spark, duck):
    """The registered pipeline vs an independent DuckDB implementation
    of the same model at SF_DIR_ORACLE: integer stats exact,
    cross-entropy within float-ln tolerance."""
    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    lm = lm_ops.train_bigram_lm(docs.filter(F.col("lang") == "en"), vocab_size=50_000)
    got = {
        r["doc_id"]: r
        for r in lm_ops.score_cross_entropy(lm, docs).collect()
    }
    want = duck.sql(_LM_TWIN_SQL).fetchall()
    assert len(want) == len(got)
    for doc_id, n_bigrams, n_oov, ce in want:
        g = got[doc_id]
        assert g["n_bigrams"] == n_bigrams, doc_id
        assert g["n_oov"] == n_oov, doc_id
        if ce is None:
            assert g["cross_entropy"] is None, doc_id
        else:
            assert g["cross_entropy"] == pytest.approx(ce, rel=REL_TOL), doc_id


def test_perplexity_buckets_behavior(spark):
    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    lm = lm_ops.train_bigram_lm(docs.filter(F.col("lang") == "en"))
    scored = lm_ops.score_cross_entropy(lm, docs)
    out = lm_ops.perplexity_buckets(scored).collect()
    n = len(out)
    sizes = {b: sum(1 for r in out if r["bucket"] == b) for b in ("head", "middle", "tail")}
    assert sum(sizes.values()) == n
    # terciles of a continuous score: each bucket within ±2 of n/3
    for b, s in sizes.items():
        assert abs(s - n / 3) <= 2, (b, s, n)
    # monotone: every head perplexity <= every middle <= every tail
    head = [r["perplexity"] for r in out if r["bucket"] == "head"]
    mid = [r["perplexity"] for r in out if r["bucket"] == "middle"]
    tail = [r["perplexity"] for r in out if r["bucket"] == "tail" and r["perplexity"] is not None]
    assert max(head) <= min(mid) and max(mid) <= min(tail)


def test_buckets_null_goes_to_tail(spark):
    tiny = spark.createDataFrame(
        [(1, "a b a b"), (2, ""), (3, "a a a")], "doc_id long, text string"
    )
    lm = lm_ops.train_bigram_lm(tiny)
    out = {
        r["doc_id"]: r["bucket"]
        for r in lm_ops.perplexity_buckets(
            lm_ops.score_cross_entropy(lm, tiny)
        ).collect()
    }
    assert out[2] == "tail"


def test_registered_query_runs(spark):
    from mbfbigdatarandomforest_spark.registry import load_all

    spec = load_all()["text_lm_perplexity"]
    df = spec.fn(spark, SF_DIR_ORACLE)
    rows = df.collect()
    docs_n = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet").count()
    assert len(rows) == docs_n
    assert df.columns == ["doc_id", "n_bigrams", "n_oov", "cross_entropy_6", "bucket"]


def test_buckets_all_empty_corpus_survives(spark):
    """percentile over all-NULL scores returns NULL — the bucketer must
    degrade to all-tail, not crash on a NULL cutoff."""
    tiny = spark.createDataFrame([(1, "  "), (2, "")], "doc_id long, text string")
    lm = lm_ops.train_bigram_lm(tiny)
    out = lm_ops.perplexity_buckets(lm_ops.score_cross_entropy(lm, tiny)).collect()
    assert {r["bucket"] for r in out} == {"tail"} and len(out) == 2


# ---------------- general-order (train_ngram_lm) ----------------
def test_order2_general_mapper_equals_bigram_mapper(spark):
    """The rebuild mapper at order=2 must produce exactly the join-only
    bigram mapper's rows — the two physical paths share semantics."""
    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet").limit(100)
    lm = lm_ops.train_bigram_lm(docs)
    a = sorted(
        map(tuple, lm_ops._vocab_mapped_ngrams(docs, lm.vocab, "text", ["doc_id"], 2).collect())
    )
    b = sorted(
        map(tuple, lm_ops._vocab_mapped_bigrams(docs, lm.vocab, "text", ["doc_id"]).collect())
    )
    assert a == b


def test_trigram_hand_oracle(spark):
    """Train 'a b a' at order 3: every observed trigram unique →
    each p = (1+1)/(1+3) = 1/2, ce = ln 2; OOV doc mirrors the bigram
    arithmetic with (BOS BOS)/(BOS unk) contexts."""
    tiny = spark.createDataFrame(
        [(1, "a b a"), (2, "z z")], "doc_id long, text string"
    )
    lm = lm_ops.train_ngram_lm(tiny.filter("doc_id = 1"), order=3)
    assert lm.order == 3 and lm.v == 3
    rows = {r["doc_id"]: r for r in lm_ops.score_cross_entropy(lm, tiny).collect()}
    assert rows[1]["cross_entropy"] == pytest.approx(math.log(2), rel=1e-12)
    expected = -(math.log(1 / 4) + math.log(1 / 3)) / 2
    assert rows[2]["cross_entropy"] == pytest.approx(expected, rel=1e-12)
    assert rows[2]["n_oov"] == 2


def test_trigram_matches_python_oracle(spark):
    """Full order-3 pipeline vs an independent pure-Python implementation
    at sf0.001 (train on en, score everything)."""
    import re
    from collections import Counter

    docs = spark.read.parquet(f"{SF_DIR_ORACLE.replace('0.01', '0.001')}/documents.parquet")
    pdf = docs.toPandas()

    def toks(t):
        return [x for x in re.split(r"\s+", t.strip().lower()) if x]

    train = [toks(t) for t, l in zip(pdf["text"], pdf["lang"]) if l == "en"]
    vocab = set(w for ts in train for w in ts)  # < 50k, no cap hit
    V = len(vocab) + 1
    BOS, UNK = lm_ops.BOS, lm_ops.UNK

    def grams(ts):
        mt = [w if w in vocab else UNK for w in ts]
        padded = [BOS, BOS] + mt
        return [
            (" ".join(padded[i : i + 2]), mt[i], 0 if ts[i] in vocab else 1)
            for i in range(len(mt))
        ]

    c12, c1 = Counter(), Counter()
    for ts in train:
        for ctx, w, _ in grams(ts):
            c12[(ctx, w)] += 1
            c1[ctx] += 1
    want = {}
    for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
        g = grams(toks(t))
        if not g:
            want[doc_id] = (0, 0, None)
            continue
        ce = -sum(
            math.log((c12.get((ctx, w), 0) + 1) / (c1.get(ctx, 0) + V))
            for ctx, w, _ in g
        ) / len(g)
        want[doc_id] = (len(g), sum(o for _, _, o in g), ce)

    from pyspark.sql import functions as F

    lm = lm_ops.train_ngram_lm(docs.filter(F.col("lang") == "en"), order=3)
    got = {r["doc_id"]: r for r in lm_ops.score_cross_entropy(lm, docs).collect()}
    assert set(got) == set(want)
    for doc_id, (n, oov, ce) in want.items():
        g = got[doc_id]
        assert (g["n_bigrams"], g["n_oov"]) == (n, oov), doc_id
        if ce is None:
            assert g["cross_entropy"] is None, doc_id
        else:
            assert g["cross_entropy"] == pytest.approx(ce, rel=1e-9), doc_id


# ---------------- stupid backoff (train_backoff_lm) ----------------
def test_stupid_backoff_hand_oracle(spark):
    """Train 'a b a b' at order 3 (every trigram deterministic → all
    scores 1, ce 0); 'z z' exercises the full backoff cascade down to
    the add-one unigram ground: α²·(0+1)/(N+V) twice."""
    tiny = spark.createDataFrame(
        [(1, "a b a b"), (2, "z z"), (3, "")], "doc_id long, text string"
    )
    lm = lm_ops.train_backoff_lm(tiny.filter("doc_id = 1"), order=3, alpha=0.4)
    assert (lm.total, lm.v) == (4, 3)
    rows = {r["doc_id"]: r for r in lm_ops.score_stupid_backoff(lm, tiny).collect()}
    assert rows[1]["cross_entropy"] == pytest.approx(0.0, abs=1e-12)
    ground = math.log(0.4**2 * 1 / (4 + 3))
    assert rows[2]["cross_entropy"] == pytest.approx(-(ground + ground) / 2, rel=1e-12)
    assert rows[3]["cross_entropy"] is None and rows[3]["n_bigrams"] == 0


def test_stupid_backoff_matches_python_oracle(spark):
    """Full order-3 stupid-backoff pipeline vs an independent pure-Python
    implementation at sf0.001."""
    import re
    from collections import Counter

    docs = spark.read.parquet(
        f"{SF_DIR_ORACLE.replace('0.01', '0.001')}/documents.parquet"
    )
    pdf = docs.toPandas()

    def toks(t):
        return [x for x in re.split(r"\s+", t.strip().lower()) if x]

    train = [toks(t) for t, l in zip(pdf["text"], pdf["lang"]) if l == "en"]
    vocab = set(w for ts in train for w in ts)
    V = len(vocab) + 1
    BOS, UNK, ALPHA = lm_ops.BOS, lm_ops.UNK, 0.4

    def grams(ts):
        mt = [w if w in vocab else UNK for w in ts]
        padded = [BOS, BOS] + mt
        return [
            ((padded[i], padded[i + 1]), mt[i]) for i in range(len(mt))
        ]

    c3, c2, c1 = Counter(), Counter(), Counter()
    x3, x2 = Counter(), Counter()
    N = 0
    for ts in train:
        for (a, b), w in grams(ts):
            c3[(a, b, w)] += 1
            x3[(a, b)] += 1
            c2[(b, w)] += 1
            x2[b] += 1
            c1[w] += 1
            N += 1

    def sb(a, b, w):
        if c3.get((a, b, w)):
            return c3[(a, b, w)] / x3[(a, b)]
        if c2.get((b, w)):
            return ALPHA * c2[(b, w)] / x2[b]
        return ALPHA**2 * (c1.get(w, 0) + 1) / (N + V)

    want = {}
    for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
        g = grams(toks(t))
        if not g:
            want[doc_id] = None
            continue
        want[doc_id] = -sum(math.log(sb(a, b, w)) for (a, b), w in g) / len(g)

    from pyspark.sql import functions as F

    lm = lm_ops.train_backoff_lm(docs.filter(F.col("lang") == "en"), order=3)
    got = {
        r["doc_id"]: r["cross_entropy"]
        for r in lm_ops.score_stupid_backoff(lm, docs).collect()
    }
    assert set(got) == set(want)
    for doc_id, ce in want.items():
        if ce is None:
            assert got[doc_id] is None, doc_id
        else:
            assert got[doc_id] == pytest.approx(ce, rel=1e-9), doc_id


# ---------------- corpus datasheet ----------------
def test_corpus_datasheet_duckdb_twin(spark, duck):
    """The fused per-source report vs a full DuckDB implementation:
    integers exact, dup_rate at 1e-12."""
    from mbfbigdatarandomforest_spark.registry import load_all

    got = {
        r["source"]: tuple(r)[1:]
        for r in load_all()["corpus_datasheet"].fn(spark, SF_DIR_ORACLE).collect()
    }
    want_rows = duck.sql(r"""
WITH per_doc AS (
  SELECT source, lang,
         len(list_filter(
           string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
           t -> t != ''
         )) AS n_tok,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
         CASE WHEN regexp_matches(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}') THEN 1 ELSE 0
         END AS has_email
  FROM documents
), lang_stats AS (
  SELECT source, lang, COUNT(*) AS n, SUM(n_tok) AS tok
  FROM per_doc GROUP BY 1, 2
), per_source AS (
  SELECT source, SUM(n) AS n_docs, SUM(tok) AS n_tokens,
         COUNT(*) AS n_langs,
         MIN(struct_pack(negn := -n, lang := lang)).lang AS top_lang
  FROM lang_stats GROUP BY 1
), fp_stats AS (
  SELECT source,
         1.0 - COUNT(DISTINCT fp) * 1.0 / COUNT(*) AS dup_rate,
         SUM(has_email) AS n_docs_with_email
  FROM per_doc GROUP BY 1
)
SELECT p.*, f.dup_rate, f.n_docs_with_email
FROM per_source p JOIN fp_stats f USING (source)
ORDER BY source
""").fetchall()
    assert len(want_rows) == len(got)
    for src, n_docs, n_tokens, n_langs, top_lang, dup_rate, n_email in want_rows:
        g = got[src]
        assert g[0] == n_docs and g[1] == n_tokens and g[2] == n_langs, src
        assert g[3] == top_lang, src
        assert g[4] == pytest.approx(dup_rate, abs=1e-12), src
        assert g[5] == n_email, src


def test_lm_save_load_roundtrip(spark, tmp_path):
    """A persisted LM reloads into an identical scorer (same per-doc
    cross-entropy to the bit — counts and metadata are exact)."""
    docs = spark.read.parquet(
        f"{SF_DIR_ORACLE.replace('0.01', '0.001')}/documents.parquet"
    )
    lm = lm_ops.train_ngram_lm(docs.filter(F.col("lang") == "en"), order=3)
    want = {
        r["doc_id"]: r["cross_entropy"]
        for r in lm_ops.score_cross_entropy(lm, docs).collect()
    }
    lm_ops.save_lm(lm, str(tmp_path / "lm"))
    back = lm_ops.load_lm(spark, str(tmp_path / "lm"))
    assert (back.v, back.k, back.order) == (lm.v, lm.k, lm.order)
    got = {
        r["doc_id"]: r["cross_entropy"]
        for r in lm_ops.score_cross_entropy(back, docs).collect()
    }
    assert got == want


def test_lm_load_rejects_wrong_kind(spark, tmp_path):
    import json

    (tmp_path / "notlm").mkdir()
    # plain text file at <path>/meta — spark.read.text accepts files too
    (tmp_path / "notlm" / "meta").write_text(json.dumps({"kind": "other"}))
    with pytest.raises(ValueError, match="does not hold"):
        lm_ops.load_lm(spark, str(tmp_path / "notlm"))


def test_buckets_approx_path_agrees_with_exact(spark):
    """exact=False (the 100 TB approxQuantile path) must agree with the
    exact cutoffs on virtually every document (0.001 relative-error
    sketch on a continuous score)."""
    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    lm = lm_ops.train_bigram_lm(docs.filter(F.col("lang") == "en"))
    scored = lm_ops.score_cross_entropy(lm, docs).cache()
    a = {r["doc_id"]: r["bucket"] for r in lm_ops.perplexity_buckets(scored).collect()}
    b = {
        r["doc_id"]: r["bucket"]
        for r in lm_ops.perplexity_buckets(scored, exact=False).collect()
    }
    n = len(a)
    agree = sum(1 for k in a if a[k] == b[k])
    assert agree >= 0.95 * n, (agree, n)
    scored.unpersist()


def test_score_shuffle_join_path_equals_broadcast(spark):
    """broadcast_lm=False (the giant-vocab shuffle-join escape hatch)
    must produce identical results to the broadcast default."""
    docs = spark.read.parquet(
        f"{SF_DIR_ORACLE.replace('0.01', '0.001')}/documents.parquet"
    )
    lm = lm_ops.train_bigram_lm(docs.filter(F.col("lang") == "en"))
    a = sorted(map(tuple, lm_ops.score_cross_entropy(lm, docs).collect()))
    b = sorted(
        map(tuple, lm_ops.score_cross_entropy(lm, docs, broadcast_lm=False).collect())
    )
    # integer stats exact; float means at tight tolerance (different
    # physical join strategies may legally reorder the per-doc double
    # summation by an ulp)
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra[:3] == rb[:3]
        for x, y in zip(ra[3:], rb[3:]):
            if x is None:
                assert y is None
            else:
                assert y == pytest.approx(x, rel=1e-12)
