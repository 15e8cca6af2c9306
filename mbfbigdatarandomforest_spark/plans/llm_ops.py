"""LLM-training-data pipeline queries (north-star extension,
BASELINE.json): dedup, similarity search, text analysis over the
``documents`` and ``embeddings`` tables.

Brute-force variants carry exact DuckDB oracles; the LSH variants
(MinHash, random-projection) are seeded-deterministic but not
SQL-expressible → registered without oracle (driver records the weaker
rows-only check), and pytest cross-checks them against the brute-force
oracle paths at small scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..operators import similarity as sim
from ..operators import text as tx
from ..registry import query
from ..sources.catalog import load_table

# Shared normalization sub-SQL (must mirror operators.text exactly).
_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
_TOKS = f"string_split({_NORM}, ' ')"


# --------------------------------------------------------------------------
# Exact dedup — hash-groupBy on normalized fingerprint.
# --------------------------------------------------------------------------
@query(
    "dedup_exact",
    oracle=f"""
SELECT
  md5({_NORM})     AS fp,
  MIN(doc_id)      AS keep_id,
  COUNT(*)         AS n_dups
FROM documents
GROUP BY 1
ORDER BY fp
""",
    tags=("dedup", "exact"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.exact_dedup(docs).orderBy("fp")


# --------------------------------------------------------------------------
# Exact n-gram Jaccard near-dup pairs (inverted-index plan).
# --------------------------------------------------------------------------
@query(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH docs AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, len({_TOKS}) - 1),
           i -> array_to_string(({_TOKS})[i:i+2], ' ')
         )) AS shingles
  FROM documents
), sized AS (
  SELECT doc_id, shingles, len(shingles) AS n_sh FROM docs
), inv AS (
  SELECT doc_id, n_sh, UNNEST(shingles) AS shingle FROM sized
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
         COUNT(*) AS shared
  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b,
       shared * 1.0 / (n_a + n_b - shared) AS jaccard
FROM pairs
WHERE shared * 1.0 / (n_a + n_b - shared) >= 0.2
ORDER BY id_a, id_b
""",
    tags=("dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.ngram_jaccard_pairs(docs, threshold=0.2).orderBy("id_a", "id_b")


# --------------------------------------------------------------------------
# MinHash LSH near-dup (scale path) — seeded, rows-only check.
# --------------------------------------------------------------------------
@query("dedup_minhash_lsh", tags=("dedup", "lsh"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.minhash_dedup_pairs(docs, threshold=0.2).orderBy("id_a", "id_b")


# --------------------------------------------------------------------------
# Banded MinHash (custom b×r LSH; deterministic, no fitted model) — the
# preferred scale path: sharp S-curve selectivity vs MinHashLSH's
# OR-only amplification. Rows-only (xxhash64 isn't in DuckDB); exact-
# Jaccard verification happens inside the operator itself.
# --------------------------------------------------------------------------
@query("dedup_banded_minhash", tags=("dedup", "lsh", "banded"))
def dedup_banded_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.banded_minhash_pairs(
        docs, bands=8, rows_per_band=4, threshold=0.2
    ).orderBy("id_a", "id_b")


# --------------------------------------------------------------------------
# SimHash signatures — deterministic; cross-checked in pytest against a
# pure-Python reference implementation (rows-only here).
# --------------------------------------------------------------------------
@query("dedup_simhash_signatures", tags=("dedup", "simhash"))
def dedup_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.simhash_signatures(docs).orderBy("doc_id")


# --------------------------------------------------------------------------
# Brute-force cosine top-k similarity search (exact baseline).
# --------------------------------------------------------------------------
_COS_DOT = (
    "list_sum(list_transform(list_zip(q_vec, c_vec), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
)
_COS_NORM_Q = "sqrt(list_sum(list_transform(q_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
_COS_NORM_C = "sqrt(list_sum(list_transform(c_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"


@query(
    "similarity_cosine_topk",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id AS neighbor_id, embedding AS c_vec FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id,
         {_COS_DOT} / ({_COS_NORM_Q} * {_COS_NORM_C}) AS cosine_sim
  FROM c, q
  WHERE neighbor_id != query_id
), ranked AS (
  SELECT query_id, neighbor_id, ROUND(cosine_sim, 6) AS cosine_sim,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
         ) AS BIGINT) AS rank
  FROM scored
)
SELECT * FROM ranked WHERE rank <= 10
ORDER BY query_id, rank
""",
    tags=("similarity", "brute-force"),
)
def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    return sim.cosine_topk(emb, queries_df, k=10).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# LSH approximate kNN (scale path) — seeded, rows-only check; recall vs
# the brute-force oracle asserted in pytest.
# --------------------------------------------------------------------------
@query("similarity_lsh_topk", tags=("similarity", "lsh"))
def similarity_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    return sim.lsh_topk(emb, queries_df, k=10).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# Embedding-cosine near-dup pairs (exact all-pairs baseline; double math
# mirrored in the oracle).
# --------------------------------------------------------------------------
_PAIR_DOT = (
    "list_sum(list_transform(list_zip(v_a, v_b), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
)
_PAIR_NORM_A = "sqrt(list_sum(list_transform(v_a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
_PAIR_NORM_B = "sqrt(list_sum(list_transform(v_b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"


@query(
    "dedup_embedding_cosine",
    oracle=f"""
WITH pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         a.embedding AS v_a, b.embedding AS v_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b,
       ROUND({_PAIR_DOT} / ({_PAIR_NORM_A} * {_PAIR_NORM_B}), 6) AS cosine_sim
FROM pairs
WHERE ROUND({_PAIR_DOT} / ({_PAIR_NORM_A} * {_PAIR_NORM_B}), 6) >= 0.4
ORDER BY id_a, id_b
""",
    tags=("dedup", "similarity", "embedding"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.cosine_dup_pairs(emb, threshold=0.4).orderBy("id_a", "id_b")


# --------------------------------------------------------------------------
# SimHash hamming near-dup pairs (pigeonhole banding) — rows-only
# (xxhash64 signatures aren't DuckDB-expressible); pytest holds the
# pure-Python oracle.
# --------------------------------------------------------------------------
@query("dedup_simhash_pairs", tags=("dedup", "simhash"))
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # 32-bit signatures: the synthetic corpus shares a small vocabulary,
    # so 16 bits saturates (most pairs land within hamming 3)
    return dd.simhash_pairs(docs, bits=32, bands=8, max_hamming=3).orderBy(
        "id_a", "id_b"
    )


# --------------------------------------------------------------------------
# IVF approximate kNN (KMeans partitions, probe nearest clusters) —
# rows-only (KMeans isn't SQL-expressible); recall vs brute force in
# pytest.
# --------------------------------------------------------------------------
@query("similarity_ivf_topk", tags=("similarity", "ivf"))
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    return sim.ivf_topk(emb, queries_df, k=10, n_clusters=16, n_probe=4).orderBy(
        "query_id", "rank"
    )


# --------------------------------------------------------------------------
# Text quality scoring.
# --------------------------------------------------------------------------
@query(
    "text_quality_scores",
    oracle=f"""
SELECT
  doc_id,
  LENGTH(text) AS n_chars_q,
  CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
       ELSE len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))
  END AS n_tokens,
  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]')) AS n_tokens_bpe,
  (LENGTH(text) - LENGTH(regexp_replace(text, '[^\\w\\s]', '', 'g')))
        * 1.0 / GREATEST(LENGTH(text), 1) AS punct_ratio,
  len(list_filter({_TOKS}, t -> t IN ('the', 'and', 'with', 'from')))
        * 1.0 / GREATEST(len({_TOKS}), 1) AS stopword_ratio
FROM documents
ORDER BY doc_id
""",
    tags=("text", "quality"),
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return tx.quality_score(docs).drop("text").orderBy("doc_id")


# --------------------------------------------------------------------------
# TF-IDF top terms per document (Tokenizer → CountVectorizer → IDF) —
# rows-only (IDF model internals aren't SQL-expressible); per-doc row
# counts and term sanity asserted in pytest.
# --------------------------------------------------------------------------
@query("text_tfidf_top_terms", tags=("text", "tfidf"))
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return tx.tfidf_top_terms(docs, k=3).orderBy("doc_id", "rank")


# --------------------------------------------------------------------------
# Language ID via marker vocabularies.
# --------------------------------------------------------------------------
def _lang_score_sql(lang: str, words: list[str]) -> str:
    # mirrors operators.text.marker_pattern: \b anchors for ASCII
    # vocabularies so markers only match whole words
    pattern = tx.marker_pattern(words)
    return (
        f"SELECT doc_id, '{lang}' AS lang, "
        f"len(regexp_extract_all(lower(text), '{pattern}')) AS score FROM documents"
    )


_LANG_UNION = "\nUNION ALL\n".join(
    _lang_score_sql(lang, words) for lang, words in sorted(tx.LANG_MARKERS.items())
)


@query(
    "text_lang_id",
    oracle=f"""
WITH scores AS (
{_LANG_UNION}
), ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
  FROM scores
)
SELECT d.doc_id, r.lang AS pred_lang, d.lang AS true_lang
FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
WHERE r.rn = 1
ORDER BY d.doc_id
""",
    tags=("text", "lang-id"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        tx.lang_id(docs)
        .select("doc_id", "pred_lang", F.col("lang").alias("true_lang"))
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Document fingerprints.
# --------------------------------------------------------------------------
@query(
    "text_fingerprints",
    oracle=f"""
SELECT doc_id, md5({_NORM}) AS fp
FROM documents
ORDER BY doc_id
""",
    tags=("text", "fingerprint"),
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", tx.fingerprint("text").alias("fp")).orderBy("doc_id")


# --------------------------------------------------------------------------
# Corpus-level token statistics per (lang, source).
# --------------------------------------------------------------------------
@query(
    "text_token_stats",
    oracle=f"""
SELECT
  lang,
  source,
  COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0 ELSE len({_TOKS}) END) AS BIGINT)
    AS total_tokens,
  SUM(n_chars) * 1.0 / COUNT(*) AS avg_chars
FROM documents
GROUP BY lang, source
ORDER BY lang, source
""",
    tags=("text", "stats", "A1", "A2"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tx.whitespace_token_count("text")).cast("bigint").alias("total_tokens"),
            (F.sum("n_chars") / F.count(F.lit(1))).alias("avg_chars"),
        )
        .orderBy("lang", "source")
    )
