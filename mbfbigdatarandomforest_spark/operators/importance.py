"""DSIR-style importance weighting for training-data selection.

Data Selection with Importance Resampling (Xie et al., 2023) selects
raw-corpus documents that look like a trusted target domain without
training a classifier: both corpora are reduced to bag-of-hashed-n-gram
distributions, every raw document gets a log importance weight
log p_target(doc) − log p_raw(doc) under those bag models, and the kept
subset is a Gumbel-top-k sample (importance resampling without
replacement). Every stage here is a bounded DataFrame plan:

1. **Hashed n-gram features** — uni+bigrams hashed into ``buckets``
   cells with an md5-based bucket id (same engine-portable digest
   convention as ``operators.sampling``: identical bytes in Spark,
   DuckDB, and Python, so the integer bucket counts carry exact
   cross-engine oracles). One explode + one map-side-combined count.
2. **Log-ratio table** — target and raw bucket counts full-outer-join
   into λ[b] = log p̂_t[b] − log p̂_r[b] with add-α smoothing over the
   FULL ``buckets``-cell space (unseen cells get the smoothed floor).
   The table is ≤ ``buckets`` rows — a broadcast model artifact.
3. **Per-doc weights** — each raw doc's hashed-gram counts join λ
   (broadcast) and sum: one corpus explode, one broadcast join, one
   ``groupBy(doc)``. No all-pairs stage anywhere.
4. **Gumbel-top-k** — deterministic Gumbel noise from the md5 of the
   doc id (u = (h + 0.5)/2³², g = −ln(−ln u)) added to the log weight;
   ``orderBy().limit(k)`` plans as TakeOrdered (per-partition top-k +
   driver merge of k·partitions rows — no global sort).

``ln`` portability: weights go through IEEE ``log`` (not bit-portable
across engines), so weight values are pytest-compared against a pure-
Python oracle at 1e-9 relative tolerance and the registered query is
rows-only; the bucket-count layer compares bit-exact against DuckDB.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens as _tokens


def _hash_bucket(col: Column, buckets: int, salt: str = "") -> Column:
    """Engine-portable bucket id: first 8 hex chars of md5(salt||gram)
    as an int, mod ``buckets``. Matches DuckDB
    ``CAST('0x' || substr(md5(g),1,8) AS BIGINT) % buckets`` and Python
    ``int(hashlib.md5(...).hexdigest()[:8], 16) % buckets`` exactly."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), col)), 1, 8), 16, 10)
    return (h.cast("long") % buckets).alias("bucket")


def _doc_grams(df: DataFrame, text_col: str, id_cols: list[str]) -> DataFrame:
    """Explode docs into (id_cols..., gram) rows of unigrams + bigrams
    (bigrams joined with a single space — tokens never contain one)."""
    toks = _tokens(text_col)
    n = F.size(toks)
    bi = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return df.select(
        *id_cols, F.explode(F.concat(toks, bi)).alias("gram")
    )


def hashed_bucket_counts(
    df: DataFrame, text_col: str = "text", buckets: int = 10_000, salt: str = ""
) -> DataFrame:
    """(bucket, c) — corpus-level hashed n-gram histogram. The model-
    estimation aggregate: map-side combined, ≤ ``buckets`` output rows."""
    return (
        _doc_grams(df, text_col, [])
        .select(_hash_bucket(F.col("gram"), buckets, salt))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10_000,
    alpha: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Per-raw-doc log importance weight under hashed bag-of-ngrams
    models of ``target`` vs ``raw``.

    Returns (id_col, n_grams, log_weight); docs with no grams get
    log_weight NULL (no evidence either way). λ is computed once from
    the two bounded histograms and broadcast — the corpus never joins
    the corpus.
    """
    # The histograms are ≤ `buckets` rows — cache them so the totals
    # jobs and the λ join don't each re-scan the corpus (three scans
    # per side without this), then materialize λ as a LOCAL relation
    # and release both caches deterministically: the returned frame
    # carries no pinned storage for the session lifetime (the leak the
    # cache-and-return pattern has), and λ is the model artifact DSIR
    # actually broadcasts — ≤ `buckets` rows of (long, double).
    tgt = hashed_bucket_counts(target, text_col, buckets, salt).cache()
    rawc = hashed_bucket_counts(raw, text_col, buckets, salt).cache()
    try:
        t_tot = tgt.agg(F.sum("c")).first()[0] or 0
        r_tot = rawc.agg(F.sum("c")).first()[0] or 0
        denom_t = float(t_tot + alpha * buckets)
        denom_r = float(r_tot + alpha * buckets)
        lam_rows = (
            tgt.withColumnRenamed("c", "ct")
            .join(rawc.withColumnRenamed("c", "cr"), "bucket", "full_outer")
            .select(
                "bucket",
                (
                    F.log((F.coalesce(F.col("ct"), F.lit(0)) + alpha) / denom_t)
                    - F.log((F.coalesce(F.col("cr"), F.lit(0)) + alpha) / denom_r)
                ).alias("lam"),
            )
            .collect()
        )
    finally:
        tgt.unpersist()
        rawc.unpersist()
    lam = raw.sparkSession.createDataFrame(lam_rows, "bucket long, lam double")
    doc_buckets = _doc_grams(raw, text_col, [id_col]).select(
        id_col, _hash_bucket(F.col("gram"), buckets, salt)
    )
    weighted = (
        doc_buckets.join(F.broadcast(lam), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("lam").alias("log_weight"),
        )
    )
    return (
        raw.select(id_col)
        .join(weighted, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            "log_weight",
        )
    )


def gumbel_topk(
    weighted: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
    salt: str = "",
) -> DataFrame:
    """Importance resampling without replacement: top-``k`` rows by
    weight + Gumbel(0,1), the exact Gumbel-top-k trick DSIR uses —
    except the noise is a deterministic function of md5(salt||id), so
    the selection reproduces across engines, runs, and partitionings
    (same rationale as ``operators.sampling``). NULL weights are
    treated as −∞ (never selected while finite candidates remain)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(0.5)) / F.lit(float(1 << 32))
    gumbel = -F.log(-F.log(u))
    key = F.coalesce(F.col(weight_col), F.lit(-math.inf)) + gumbel
    return (
        weighted.withColumn("__key", key)
        .orderBy(F.col("__key").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("__key")
    )
