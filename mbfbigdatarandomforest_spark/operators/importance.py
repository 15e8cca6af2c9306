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
    # ONE action and ONE aggregate build the whole model: the two
    # corpora's gram streams union with a side tag and a single
    # map-side-combined groupBy(bucket) yields both histograms at once —
    # then the totals and λ are pure Python over that ≤ `buckets` row
    # table. (The previous shape cached both histograms and ran two
    # totals first()s plus a λ collect — five actions and two cache
    # fills; at ~0.1–0.5 s of scheduler overhead per local action that
    # dominated the operator's wall.) λ is the model artifact DSIR
    # actually broadcasts — ≤ `buckets` rows of (long, double) — and
    # each corpus still pays exactly one scan.
    tagged = _doc_grams(target, text_col, []).select(
        _hash_bucket(F.col("gram"), buckets, salt), F.lit(1).alias("__t")
    ).unionAll(
        _doc_grams(raw, text_col, []).select(
            _hash_bucket(F.col("gram"), buckets, salt), F.lit(0).alias("__t")
        )
    )
    hist = (
        tagged.groupBy("bucket")
        .agg(
            F.sum("__t").alias("ct"),
            F.sum(1 - F.col("__t")).alias("cr"),
        )
        .collect()
    )
    t_tot = sum(r["ct"] or 0 for r in hist)
    r_tot = sum(r["cr"] or 0 for r in hist)
    denom_t = float(t_tot + alpha * buckets)
    denom_r = float(r_tot + alpha * buckets)
    lam_rows = [
        (
            r["bucket"],
            math.log(((r["ct"] or 0) + alpha) / denom_t)
            - math.log(((r["cr"] or 0) + alpha) / denom_r),
        )
        for r in hist
    ]
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
