"""Deterministic, engine-portable sampling for training-data pipelines.

The reference's sampling (02_1_Sampling.R — seeded ``sample()`` rows)
reproduces only under one RNG on one machine. A 100 TB data-mixing
pipeline needs sampling that is (a) reproducible across engines, runs,
and partitionings, (b) stateless where possible, and (c) quota-capable
per stratum (the "N docs per source/language at temperature t" shape of
LLM corpus mixing). Keying decisions on a cryptographic digest of the
row's stable id gives all three: md5 is identical in Spark and DuckDB,
so these operators carry full value-hash oracles — unlike RNG sampling,
which can only gate on size invariants (see ``sample_and_split_sizes``).

Both operators stay entirely in JVM codegen expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash_key(key_col: str, salt: str):
    """Lowercase hex md5 of (salt || key) — byte-identical in Spark and
    DuckDB (``md5(s || CAST(key AS VARCHAR))``)."""
    return F.md5(
        F.concat(F.lit(salt), F.col(key_col).cast("string")).cast("binary")
    )


def hash_fraction_sample(
    df: DataFrame, p: float, key_col: str, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ~p-fraction: rows whose md5(salt||key) hex
    prefix falls under the threshold.

    The stateless scale path — a pure filter, no shuffle, no state, no
    RNG; composes with partition pruning and pushes to the scan. The
    same (p, salt) selects the same rows on any engine, any cluster
    size, any partitioning. Different salts give independent samples
    (re-rolling without touching p).

    The first 8 hex chars (32 bits) bound quantization of p to 2^-32 —
    indistinguishable from exact at any corpus size worth sampling.
    """
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {p}")
    if p >= 1.0:
        # int(1.0 * 2^32) formats to 9 hex chars; the lexicographic
        # compare against an 8-char prefix would then keep only ~1/16
        # of rows. p=1 means "keep everything" — no filter at all.
        return df
    threshold = format(int(p * (1 << 32)), "08x")
    return df.filter(F.substring(_hash_key(key_col, salt), 1, 8) < F.lit(threshold))


def temperature_mixture_sample(
    df: DataFrame,
    strata: list[str],
    target_total: int,
    key_col: str,
    temperature: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Temperature-weighted corpus mixing: per-stratum quotas
    ∝ |stratum|^temperature, rows chosen deterministically by md5 order.

    The standard LLM-pretraining mixing shape: t=1 keeps natural
    proportions, t→0 flattens toward uniform (upweighting small
    sources), intermediate t (0.3–0.7 in published recipes) trades
    between them. Quotas use ceil, so the sample can exceed
    ``target_total`` by at most one row per stratum, and a stratum
    smaller than its quota contributes all its rows.

    For t=1 the quota arithmetic stays in exact BIGINT
    (``(target·n + total−1) div total``) — bit-identical across
    engines, so the t=1 path carries a full value-hash oracle;
    fractional t goes through IEEE ``pow`` (deterministic per engine,
    pytest-checked against a Python oracle).

    Scale: stratum counts are a map-side-combined aggregate to
    |strata| rows; quotas broadcast back; ranking shuffles once on the
    strata (see ``stratified_quota_sample`` for the hot-stratum note).
    """
    if target_total < 1:
        raise ValueError(f"target_total must be >= 1, got {target_total}")
    counts = df.groupBy(*strata).agg(F.count(F.lit(1)).alias("__n"))
    if temperature == 1.0:
        # ceil(target·n / total) as floor((target·n + total − 1)/total).
        # Both engines evaluate the same double divide + FLOOR (DuckDB's
        # CAST(double AS BIGINT) ROUNDS, so floor must be explicit); the
        # operands stay below 2^52, where IEEE division cannot cross an
        # integer boundary, so the result is exact.
        total = F.sum("__n").over(Window.partitionBy())
        quota = F.floor(
            (F.lit(target_total) * F.col("__n") + total - F.lit(1)) / total
        )
    else:
        w = F.pow(F.col("__n").cast("double"), F.lit(float(temperature)))
        quota = F.ceil(F.lit(target_total) * w / F.sum(w).over(Window.partitionBy()))
    # the unpartitioned window runs over the |strata|-row aggregate,
    # never the corpus
    quotas = counts.select(*strata, quota.alias("__quota"))
    ranked = df.withColumn(
        "sample_rank",
        F.row_number().over(
            Window.partitionBy(*strata).orderBy(
                _hash_key(key_col, salt), F.col(key_col)
            )
        ),
    )
    return (
        ranked.join(F.broadcast(quotas), strata)
        .filter(F.col("sample_rank") <= F.col("__quota"))
        .drop("__quota")
    )


def stratified_quota_sample(
    df: DataFrame,
    strata: list[str],
    k: int,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen by md5 order —
    the per-source/per-language quota shape of corpus mixing.

    Ranks inside each stratum by (md5(salt||key), key) — the digest
    randomizes uniformly, the key breaks ties deterministically — and
    keeps rank ≤ k, exposed as ``sample_rank``.

    Scale: one shuffle keyed on the strata (mixing strata are
    source/language/domain — thousands of values, so tasks parallelize
    across strata; a single pathologically hot stratum would serialize
    its own sort, in which case pre-filter with
    ``hash_fraction_sample(k·fudge/|stratum|)`` before ranking).
    """
    if k < 1:
        raise ValueError(f"quota k must be >= 1, got {k}")
    w = Window.partitionBy(*strata).orderBy(
        _hash_key(key_col, salt), F.col(key_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic multi-way corpus split (train/val/test): each row's
    md5(salt||key) hex prefix selects the first split whose cumulative
    weight boundary exceeds it. The assignment is a pure row-local
    function of the key — stable across engines, cluster sizes,
    partitionings, and reruns — which is what ``randomSplit`` cannot
    promise (its sampling is per-partition) and what makes held-out
    sets trustworthy under corpus growth: a row's split NEVER changes
    when other rows are added or removed.

    Weights must be positive and sum to ~1 (validated to 1e-9).
    Boundaries quantize at 2^-32 like :func:`hash_fraction_sample`.
    Zero shuffle: one appended column; filters on it push to the scan.
    Split order follows the dict's insertion order (cumulative ranges).

    Rows with a NULL key get a NULL split — a NULL cannot be
    deterministically assigned, and silently routing it into the last
    split would contaminate the held-out set. Filter or fill NULL keys
    first; the NULL-split rows stay visible for auditing.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive, got {weights}")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    prefix = F.substring(_hash_key(key_col, salt), 1, 8)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        bound = F.lit(format(min(int(cum * (1 << 32)), (1 << 32) - 1), "08x"))
        cond = prefix < bound
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    # NULL keys hash to NULL: every `<` above is NULL and the chain
    # would fall through to the LAST split — gate explicitly instead
    return df.withColumn(
        split_col, F.when(F.col(key_col).isNotNull(), expr)
    )
