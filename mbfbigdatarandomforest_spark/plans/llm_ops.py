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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..operators import similarity as sim
from ..operators import text as tx
from ..registry import query
from ..sources.catalog import load_table

# Shared normalization sub-SQL (must mirror operators.text exactly).
_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
# empty boundary tokens (tab/newline-padded text) are filtered on both
# engines — see operators.dedup._tokens
_TOKS = f"list_filter(string_split({_NORM}, ' '), t -> t != '')"


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
# MinHash LSH near-dup: the banded b×r LSH production path (sharp
# S-curve selectivity; collision prob 1-(1-s^r)^b) with exact-Jaccard
# verify on the true shingle sets. Because emitted pairs are exactly
# verified, the DuckDB oracle is the exact n-gram-Jaccard pair set —
# candidate generation must reach recall 1.0 on this corpus for the
# hash to stay green, which pytest asserts at both test scales.
#
# The MLlib MinHashLSH variant is deliberately NOT in this gate: at the
# loose threshold (0.2 → distance cut 0.85) its OR-only amplification
# admits nearly every pair, so approxSimilarityJoin degenerates toward
# all-pairs and dominated the headline bench (~17 s of the r02 total).
# It remains a supported operator (operators/dedup.py:
# minhash_verified_pairs), equivalence-tested against the exact pair
# set in tests/test_operators.py::test_lsh_verified_paths_equal_exact_pairs.
# --------------------------------------------------------------------------
@query(
    "dedup_minhash_pairs",
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
    tags=("dedup", "lsh", "banded"),
)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.banded_minhash_pairs(
        docs, bands=8, rows_per_band=4, threshold=0.2, seed=42
    ).orderBy("id_a", "id_b")


# --------------------------------------------------------------------------
# Incremental (cross-snapshot) dedup (r12): a NEW crawl snapshot gated
# against the EXISTING dataset before appending — exact-fingerprint
# anti-join, then cross-frame banded MinHash (new-buckets ⋈
# ref-buckets, never ref²). The fixture plants both tiers: exact
# copies and one-token-appended near-dups of reference docs under
# shifted ids, so the planted_*_kept columns are the operator's own
# evidence (must be 0). r13: the snapshot's INTERNAL dup pairs are
# gated too (dedup_within_new=True) — the fixture plants one exact
# internal pair and one near internal pair of sentinel docs that
# match nothing in the corpus, so planted_internal_kept = 2 (the
# first survivor of each pair) is its own evidence. Rows-only (LSH
# bucketing is not one SQL statement); brute-force Python twin in
# tests/test_operators.py. The gate stays on the rebuild path
# (reference=...) to keep the registered query hermetic — the
# persistable-index path (build_dedup_index / incremental_dedup(
# index=...)) is pinned ≡ this path in tests/test_operators.py and
# probed for flat per-snapshot wall in scripts/probe_dedup_index.py.
# --------------------------------------------------------------------------
PLANTED_EXACT_BASE = 10_000_000
PLANTED_NEAR_BASE = 20_000_000
PLANTED_INTERNAL_BASE = 30_000_000
# sentinel texts: tokens that never occur in the synthetic corpus, long
# enough that dropping/adding one token keeps Jaccard >= 0.7
_INTERNAL_SENTINEL_A = (
    "qvoxil brundle warfin ostrey plimth gazzer nolic "
    "trevane ulmost karrid fenwick sobrel yintra moqual"
)
_INTERNAL_SENTINEL_B = (
    "drazzel phonk welbit saqui tromin glaver hupsod "
    "nerrel vintop cuzzle abront skelv impryn othvar"
)


@query("dedup_incremental_stats", tags=("dedup", "minhash", "incremental"))
def dedup_incremental_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    planted_exact = ref.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + PLANTED_EXACT_BASE).alias("doc_id"), "text"
    )
    planted_near = ref.filter(F.col("doc_id") % 10 == 4).select(
        (F.col("doc_id") + PLANTED_NEAR_BASE).alias("doc_id"),
        F.concat("text", F.lit(" zyzzyva")).alias("text"),
    )
    planted_internal = spark.createDataFrame(
        [
            (PLANTED_INTERNAL_BASE + 0, _INTERNAL_SENTINEL_A),
            (PLANTED_INTERNAL_BASE + 1, _INTERNAL_SENTINEL_A),
            (PLANTED_INTERNAL_BASE + 2, _INTERNAL_SENTINEL_B),
            (PLANTED_INTERNAL_BASE + 3, _INTERNAL_SENTINEL_B + " zyxx"),
        ],
        "doc_id long, text string",
    )
    new = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .unionByName(planted_exact)
        .unionByName(planted_near)
        .unionByName(planted_internal)
    )
    kept = dd.incremental_dedup(
        new, ref, threshold=0.7, seed=42, dedup_within_new=True
    )
    is_exact = (F.col("doc_id") >= PLANTED_EXACT_BASE) & (
        F.col("doc_id") < PLANTED_NEAR_BASE
    )
    is_near = (F.col("doc_id") >= PLANTED_NEAR_BASE) & (
        F.col("doc_id") < PLANTED_INTERNAL_BASE
    )
    is_internal = F.col("doc_id") >= PLANTED_INTERNAL_BASE
    # r16 (guide §1.5/§2.6): the two driver-side .count() actions were
    # one scheduled job each (~0.3-0.5 s floor at test scale, a full
    # documents re-scan each at any scale). The same numbers now ride
    # the single noop-sink action as broadcast 1-row aggregates —
    # branches of one job run concurrently instead of as serial
    # actions. Casts pin the pre-fusion int schema (F.lit(py_int)).
    # int32 bound, declared (ADVICE r16): past 2^31-1 rows these
    # wrap/null under non-ANSI eval where the old F.lit(python_int)
    # would have widened — acceptable for a result-schema-pinned stats
    # row; revisit the declared schema before running >2B-row snapshots.
    counts = (
        new.agg(F.count(F.lit(1)).cast("int").alias("n_new"))
        .crossJoin(ref.agg(F.count(F.lit(1)).cast("int").alias("n_ref")))
    )
    return (
        kept.agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum(is_exact.cast("long")).alias("planted_exact_kept"),
            F.sum(is_near.cast("long")).alias("planted_near_kept"),
            F.sum(is_internal.cast("long")).alias("planted_internal_kept"),
        )
        .crossJoin(F.broadcast(counts))
        .select(
            "n_new",
            "n_ref",
            "n_kept",
            "planted_exact_kept",
            "planted_near_kept",
            "planted_internal_kept",
        )
    )


# --------------------------------------------------------------------------
# MinHash INDEX-PATH cycle (r15 — the text-tier twin of
# dedup_semantic_index_cycle): dedup_incremental_stats above times the
# in-flight reference gate; THIS query runs the persistable index's
# full lifecycle per sweep — build WITH a cap of record (hot_buckets/
# materialized) → capped gate (planted ref copies caught by the build's
# fingerprints, near-copies by the bucketed LSH keys) → append
# survivors (which also folds the hot set) → gate snapshot 2 (planted
# copies of APPENDED docs caught, proving the append is what the second
# gate sees) — against a run-scoped index path, so the bench wall
# covers the build/gate/append/hot-set costs the ingestion cycle pays.
# Rows-only; sentinels are the evidence (index ≡ rebuild and the
# hot-set lifecycle are value-pinned in tests/test_dedup_index.py).
# Runs at ONE bench rep with per-leg walls in the output row (r16 —
# r15 VERDICT item 2: the cycle is job-count-bound, not data-bound).
# --------------------------------------------------------------------------
@query(
    "dedup_index_cycle",
    tags=("dedup", "minhash", "incremental", "index"),
)
def dedup_index_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    import time as _time

    # deterministic ~1/8 slices: the cycle's evidence is its SHAPE
    # (build → capped gate → append → gate 2, sentinels caught at the
    # right leg), not its volume — dedup_incremental_stats already
    # times the full-corpus gate every sweep
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ref = docs.filter(F.col("doc_id") % 8 == 0)
    planted1_exact = ref.filter(F.col("doc_id") % 16 == 0).select(
        (F.col("doc_id") + PLANTED_EXACT_BASE).alias("doc_id"), "text"
    )
    planted1_near = ref.filter(F.col("doc_id") % 16 == 8).select(
        (F.col("doc_id") + PLANTED_NEAR_BASE).alias("doc_id"),
        F.concat("text", F.lit(" zyzzyva")).alias("text"),
    )
    snap1 = (
        docs.filter(F.col("doc_id") % 8 == 4)
        .unionByName(planted1_exact)
        .unionByName(planted1_near)
    )
    idx = tempfile.mkdtemp(prefix="dedup_idx_cycle_")
    try:
        shutil.rmtree(idx)  # build wants a fresh path (meta is the lock)
        cap = 200  # cap of record, far above this corpus's occupancy
        legs: dict[str, float] = {}
        t0 = _time.perf_counter()
        dd.build_dedup_index(ref, idx, max_bucket_size=cap)
        legs["build"] = _time.perf_counter() - t0
        kw = dict(threshold=0.7, max_bucket_size=cap)
        t0 = _time.perf_counter()
        kept1 = dd.incremental_dedup(
            snap1, index=idx, **kw
        ).localCheckpoint(eager=True)
        legs["gate1"] = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        dd.append_dedup_index(kept1, idx)
        legs["append"] = _time.perf_counter() - t0
        snap2_base = 4 * PLANTED_EXACT_BASE  # clear of both plant tiers
        planted2 = kept1.limit(50).select(
            (F.col("doc_id") + snap2_base).alias("doc_id"), "text"
        )
        snap2 = docs.filter(F.col("doc_id") % 8 == 1).unionByName(planted2)
        # round-1 sentinels: BOTH tiers (exact ≥ 10M, near ≥ 20M)
        is_p1 = F.col("doc_id") >= PLANTED_EXACT_BASE
        is_p2 = F.col("doc_id") >= snap2_base
        t0 = _time.perf_counter()
        row2 = (
            dd.incremental_dedup(snap2, index=idx, **kw)
            .agg(
                F.count(F.lit(1)).alias("k2"),
                F.sum(is_p2.cast("long")).alias("p2"),
            )
            .first()
        )
        legs["gate2"] = _time.perf_counter() - t0
        # r16 (guide §2.6): the evidence tail — row-1 sentinel aggregate,
        # index stats, and the three size counts — is five independent
        # small jobs; submit them concurrently instead of serially
        # (each was a ~0.3-0.5 s scheduling-latency floor).
        from concurrent.futures import ThreadPoolExecutor

        # inheritable_thread_target: pool threads keep the caller's JVM
        # local properties (job group/description) so a harness's
        # setJobGroup covers these concurrent jobs too (ADVICE r16)
        from pyspark.util import inheritable_thread_target as _itt

        with ThreadPoolExecutor(max_workers=5) as pool:
            f_row1 = pool.submit(
                _itt(
                    kept1.agg(
                        F.count(F.lit(1)).alias("k1"),
                        F.sum(is_p1.cast("long")).alias("p1"),
                    ).first
                )
            )
            f_stats = pool.submit(
                _itt(lambda: dd.dedup_index_stats(spark, idx))
            )
            f_nref = pool.submit(_itt(ref.count))
            f_ns1 = pool.submit(_itt(snap1.count))
            f_ns2 = pool.submit(_itt(snap2.count))
            row1, stats = f_row1.result(), f_stats.result()
            n_ref, n_s1, n_s2 = (
                f_nref.result(), f_ns1.result(), f_ns2.result()
            )
        # per-leg walls ride the rows-only record (VERDICT r15 item 2:
        # the cycle's evidence is its sentinels; the walls make the
        # job-count-bound legs visible without extra bench reps)
        return spark.createDataFrame(
            [
                (
                    n_ref,
                    n_s1,
                    int(row1["k1"]),
                    int(row1["p1"] or 0),
                    n_s2,
                    int(row2["k2"]),
                    int(row2["p2"] or 0),
                    int(stats["n_fingerprints"]),
                    int(stats.get("hot_buckets", 0)),
                    round(legs["build"], 3),
                    round(legs["gate1"], 3),
                    round(legs["append"], 3),
                    round(legs["gate2"], 3),
                )
            ],
            "n_ref long, n_snap1 long, kept1 long, planted1_kept long,"
            " n_snap2 long, kept2 long, planted2_kept long,"
            " index_fingerprints long, hot_buckets long,"
            " build_s double, gate1_s double, append_s double,"
            " gate2_s double",
        )
    finally:
        # drop the run-scoped catalog entries before the files go —
        # the bucketed sub-tables registered under this temp path
        # would otherwise accumulate one stale pair per bench rep
        for sub in ("fingerprints", "buckets"):
            spark.sql(
                f"DROP TABLE IF EXISTS {dd._index_table_name(idx, sub)}"
            )
        shutil.rmtree(idx, ignore_errors=True)


# --------------------------------------------------------------------------
# Snapshot content diff (r13): what changed between two crawls of the
# same corpus — the reporting complement of the incremental-dedup
# ingestion gate (which DROPS known content; this one COUNTS it). The
# "next snapshot" is derived deterministically from the documents
# table: every %7==0 doc vanishes (removed), every surviving %5==0 doc
# gains a token (a modify = removed+added fingerprint PAIR — content
# identity has no "same page, new text"), and %3==0 docs re-enter as
# brand-new ids with new text (added). Rows-only (the md5 fingerprint
# full-outer-join rollup is exactly replicated by the DuckDB twin in
# tests/test_operators.py).
# --------------------------------------------------------------------------
@query("corpus_snapshot_diff", tags=("dedup", "snapshot", "incremental"))
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    survivors = docs.filter(F.col("doc_id") % 7 != 0)
    new = survivors.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat("text", F.lit(" updated content")),
        ).otherwise(F.col("text")).alias("text"),
    ).unionByName(
        docs.filter(F.col("doc_id") % 3 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat("text", F.lit(" brand new doc")).alias("text"),
        )
    )
    return (
        dd.corpus_diff(docs, new)
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_contents"),
            F.sum("n_old").alias("n_docs_old"),
            F.sum("n_new").alias("n_docs_new"),
        )
        .orderBy("status")
    )


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
# Approximate kNN, BOTH scale paths in one query (mirrors the
# dedup_minhash_pairs fusion): random-projection LSH buckets and IVF
# multi-probe, method-tagged. Seeded-deterministic but not
# SQL-expressible → rows-only check; recall vs the brute-force oracle
# asserted per method in pytest.
# --------------------------------------------------------------------------
@query("similarity_ann_topk", tags=("similarity", "lsh", "ivf"))
def similarity_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # each method ranks by its own metric (lsh: euclidean distance,
    # ivf: cosine) — `score` carries whichever the method optimizes
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    lsh = (
        sim.lsh_topk(emb, queries_df, k=10)
        .select(
            F.lit("lsh").alias("method"),
            "query_id",
            "neighbor_id",
            F.col("eucl_dist").alias("score"),
            "rank",
        )
    )
    ivf = (
        sim.ivf_topk(emb, queries_df, k=10, n_clusters=16, n_probe=4)
        .select(
            F.lit("ivf").alias("method"),
            "query_id",
            "neighbor_id",
            F.col("cosine_sim").alias("score"),
            "rank",
        )
    )
    return lsh.unionByName(ivf).orderBy("method", "query_id", "rank")


# --------------------------------------------------------------------------
# int8-quantized top-k (memory-bandwidth scale path: scan-side scoring
# touches 1/4 the bytes, exact rescore only for survivors). Seeded-
# deterministic but the quantized scoring isn't SQL-expressible →
# rows-only; pytest pins recall ≥0.9 vs brute force and emitted values
# exactly equal to cosine_topk's.
# --------------------------------------------------------------------------
@query("similarity_quantized_topk", tags=("similarity", "int8", "quantized"))
def similarity_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    return sim.quantized_topk(emb, queries_df, k=10).orderBy("query_id", "rank")


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


# The REGISTERED embedding-dedup entry is the scale path: IVF
# multi-probe candidates + exact cosine verify (operators.similarity.
# ann_dup_pairs). The all-pairs ``cosine_dup_pairs`` is the pytest
# oracle only — an O(n²) cross join must never be the production-named
# query. The DuckDB oracle below IS the brute force (fine at oracle
# scale); the hash staying green means ANN recall is 1.0 on this
# corpus, which pytest asserts independently at both test scales.
@query(
    "dedup_embedding_ann",
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
    tags=("dedup", "similarity", "embedding", "ann"),
)
def dedup_embedding_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The synthetic pairs hug the 0.4 threshold — the hardest ANN
    # regime (real dedup thresholds ≥0.9 prune far harder at the same
    # parameters) — so the registered probe count is generous; recall
    # is exactly 1.0 at both oracle scales and session-independent
    # (fixed internal partitioning; pytest guards equality).
    # The pinned n_clusters=16 is the ORACLE config, right for ≤16k-row
    # corpora only: the r8 40× probe measured it quadratic (SCALE.md
    # §14). Production callers omit n_clusters — it then auto-sizes to
    # a constant target cell size (similarity._auto_n_clusters), which
    # the probe measured linear.
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.ann_dup_pairs(
        emb, threshold=0.4, n_clusters=16, n_probe=14, kmeans_max_iter=8
    ).orderBy("id_a", "id_b")


# --------------------------------------------------------------------------
# SemDeDup-style semantic dedup: the keep-list composition over the ANN
# pair generator (ann_dup_pairs → connected components → min-id keep).
# Rows-only by design: its pair stage is already value-hash-gated by
# dedup_embedding_ann and its closure stage by dedup_clusters; pytest
# holds the end-to-end numpy+union-find oracle
# (tests/test_operators.py::test_semantic_dedup_matches_brute_force).
# --------------------------------------------------------------------------
@query("dedup_semantic_keep", tags=("dedup", "similarity", "embedding", "semdedup"))
def dedup_semantic_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        sim.semantic_dedup(
            emb, threshold=0.4, n_clusters=16, n_probe=14, kmeans_max_iter=8
        )
        .select("vec_id", "label")
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# Cross-snapshot SEMANTIC dedup gate (r14) — the embedding-side mirror
# of dedup_incremental_stats: new snapshot vectors gated against the
# accumulated corpus by cosine. Rows-only (k-means centroids and the
# grouped numpy verify have no SQL twin); the planted sentinels ARE the
# query's evidence — an exact-copy vector routes to the identical probe
# list, so its recall is guaranteed at any n_probe — and the index path
# (build → gate → append → gate, partition-pruned) is pinned ≡ this
# reference path value-exactly in tests/test_semantic_index.py.
# --------------------------------------------------------------------------
@query(
    "dedup_semantic_incremental_stats",
    tags=("dedup", "similarity", "embedding", "incremental"),
)
def dedup_semantic_incremental_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    ref = emb.filter(F.col("vec_id") % 2 == 0)
    planted = ref.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + PLANTED_EXACT_BASE).alias("vec_id"), "embedding"
    )
    new = emb.filter(F.col("vec_id") % 2 == 1).unionByName(planted)
    kept = sim.incremental_semantic_dedup(
        new, ref, threshold=0.8, n_clusters=16, n_probe=6,
        kmeans_max_iter=8,
    )
    is_planted = F.col("vec_id") >= PLANTED_EXACT_BASE
    # r16: counts fused into the one timed action (see
    # dedup_incremental_stats — same two-jobs-saved shape; same
    # declared int32 bound on the casts, ADVICE r16)
    counts = (
        new.agg(F.count(F.lit(1)).cast("int").alias("n_new"))
        .crossJoin(ref.agg(F.count(F.lit(1)).cast("int").alias("n_ref")))
    )
    return (
        kept.agg(
            F.count(F.lit(1)).alias("n_kept"),
            # exact copies MUST all be gone — guaranteed-recall sentinels
            F.sum(is_planted.cast("long")).alias("planted_exact_kept"),
        )
        .crossJoin(F.broadcast(counts))
        .select("n_new", "n_ref", "n_kept", "planted_exact_kept")
    )


# --------------------------------------------------------------------------
# Semantic INDEX-PATH cycle (r15 — r14 VERDICT item 7; rebuild leg r16
# — r15 VERDICT item 5): the registered evidence for the persistable
# semantic index's append AND rebuild legs. The in-flight gate above
# times reference=; THIS query runs the full index lifecycle per sweep
# — build → capped gate (planted ref copies all caught) → append
# survivors → gate snapshot 2 (planted copies of APPENDED rows all
# caught, proving the append is what the second gate sees) → REBUILD
# (the operation rebuild_advised advises: quantizer refit + re-route +
# watermark re-anchor) → gate 3 (the same planted copies still caught:
# exact copies route identically under any quantizer) — against a
# run-scoped index path, so the driver's bench wall covers the
# build/gate/append/rebuild costs the production ingestion cycle
# actually pays. Rows-only (k-means + numpy verify have no SQL twin);
# the sentinels, the occupancy watermark, and the per-leg walls are the
# evidence. max_cell_size exercises the bounded-verify lane (capped ≡
# uncapped is value-pinned in tests/test_semantic_index.py; the cap
# here sits far above occupancy). Runs at ONE bench rep (bench.py's
# LIFECYCLE_LANE — r15 VERDICT item 2: the legs are ~30 small Spark
# actions, scheduling-latency-bound at test scale; min-of-3 buys no
# noise reduction worth 2 extra full lifecycles per sweep).
# --------------------------------------------------------------------------
@query(
    "dedup_semantic_index_cycle",
    tags=("dedup", "similarity", "embedding", "incremental", "index"),
)
def dedup_semantic_index_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    import time as _time

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    ref = emb.filter(F.col("vec_id") % 4 == 0)
    planted1 = ref.filter(F.col("vec_id") % 8 == 0).select(
        (F.col("vec_id") + PLANTED_EXACT_BASE).alias("vec_id"), "embedding"
    )
    snap1 = emb.filter(F.col("vec_id") % 4 == 2).unionByName(planted1)
    idx = tempfile.mkdtemp(prefix="semidx_cycle_")
    try:
        shutil.rmtree(idx)  # build wants a fresh path (meta is the lock)
        legs: dict[str, float] = {}
        t0 = _time.perf_counter()
        sim.build_semantic_index(ref, idx, n_clusters=16)
        legs["build"] = _time.perf_counter() - t0
        kw = dict(threshold=0.8, n_probe=6, max_cell_size=100_000)
        t0 = _time.perf_counter()
        kept1 = sim.incremental_semantic_dedup(
            snap1, index=idx, **kw
        ).localCheckpoint(eager=True)
        legs["gate1"] = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        stats = sim.append_semantic_index(kept1, idx)
        legs["append"] = _time.perf_counter() - t0
        # snapshot 2: fresh odds + exact copies of round-1 SURVIVORS —
        # only the append can catch those
        planted2 = kept1.limit(50).select(
            (F.col("vec_id") + 2 * PLANTED_EXACT_BASE).alias("vec_id"),
            "embedding",
        )
        snap2 = emb.filter(F.col("vec_id") % 2 == 1).unionByName(
            planted2
        ).localCheckpoint(eager=True)  # feeds gate 2 AND gate 3
        is_p1 = (F.col("vec_id") >= PLANTED_EXACT_BASE) & (
            F.col("vec_id") < 2 * PLANTED_EXACT_BASE
        )
        is_p2 = F.col("vec_id") >= 2 * PLANTED_EXACT_BASE
        t0 = _time.perf_counter()
        row2 = (
            sim.incremental_semantic_dedup(snap2, index=idx, **kw)
            .agg(
                F.count(F.lit(1)).alias("k2"),
                F.sum(is_p2.cast("long")).alias("p2"),
            )
            .first()
        )
        legs["gate2"] = _time.perf_counter() - t0
        # rebuild leg (r16 — VERDICT r15 item 5): the operation
        # rebuild_advised advises, timed by the driver's bench like the
        # other legs. The quantizer refits over the accumulated corpus
        # (small k — the cycle's evidence is its sentinels, not volume)
        # and gate 3 re-runs snapshot 2: EXACT copies of appended
        # survivors route identically under ANY quantizer, so
        # planted2 must still be fully caught post-rebuild.
        t0 = _time.perf_counter()
        post = sim.rebuild_semantic_index(spark, idx, n_clusters=16)
        legs["rebuild"] = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        row3 = (
            sim.incremental_semantic_dedup(snap2, index=idx, **kw)
            .agg(
                F.count(F.lit(1)).alias("k3"),
                F.sum(is_p2.cast("long")).alias("p3"),
            )
            .first()
        )
        legs["gate3"] = _time.perf_counter() - t0
        # r16 (guide §2.6): the untimed evidence tail runs its four
        # independent jobs concurrently (see dedup_index_cycle)
        from concurrent.futures import ThreadPoolExecutor

        from pyspark.util import inheritable_thread_target as _itt

        with ThreadPoolExecutor(max_workers=4) as pool:
            f_row1 = pool.submit(
                _itt(
                    kept1.agg(
                        F.count(F.lit(1)).alias("k1"),
                        F.sum(is_p1.cast("long")).alias("p1"),
                    ).first
                )
            )
            f_nref = pool.submit(_itt(ref.count))
            f_ns1 = pool.submit(_itt(snap1.count))
            f_ns2 = pool.submit(_itt(snap2.count))
            row1 = f_row1.result()
            n_ref, n_s1, n_s2 = (
                f_nref.result(), f_ns1.result(), f_ns2.result()
            )
        return spark.createDataFrame(
            [
                (
                    n_ref,
                    n_s1,
                    int(row1["k1"]),
                    int(row1["p1"] or 0),
                    n_s2,
                    int(row2["k2"]),
                    int(row2["p2"] or 0),
                    int(stats["n_vectors"]),
                    bool(stats["rebuild_advised"]),
                    # the rebuild really re-anchored the watermark:
                    # build_n resets to the current corpus → growth 1.0
                    bool(post["growth"] == 1.0),
                    int(row3["k3"]),
                    int(row3["p3"] or 0),
                    round(legs["build"], 3),
                    round(legs["gate1"], 3),
                    round(legs["append"], 3),
                    round(legs["gate2"], 3),
                    round(legs["rebuild"], 3),
                    round(legs["gate3"], 3),
                )
            ],
            "n_ref long, n_snap1 long, kept1 long, planted1_kept long,"
            " n_snap2 long, kept2 long, planted2_kept long,"
            " index_vectors long, rebuild_advised boolean,"
            " rebuilt boolean, post_rebuild_kept long,"
            " planted2_kept_post_rebuild long,"
            " build_s double, gate1_s double, append_s double,"
            " gate2_s double, rebuild_s double, gate3_s double",
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


# --------------------------------------------------------------------------
# SimHash hamming near-dup pairs (pigeonhole banding) — rows-only
# (xxhash64 signatures aren't DuckDB-expressible); pytest holds the
# pure-Python oracle.
# --------------------------------------------------------------------------
@query("dedup_simhash_pairs", tags=("dedup", "simhash"))
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # ngram=3: signatures over the SAME shingle features as the
    # Jaccard ground truth — unigram-token signatures on this
    # shared-vocabulary corpus flagged ~9% of all pairs (precision
    # 0.002); shingle signatures reach precision 1.0 / recall ~0.9,
    # floors pinned by tests/test_operators.py::test_simhash_precision_recall_floor.
    # r8 re-parameterization (Manku-style wide fingerprints): the old
    # (bits=32, bands=8) meant 4-bit band keys — 16 values, so bucket
    # population grows n/16 and the banded self-join quadratically; the
    # 40× probe went superlinear (16→252 s for a 4× step) and the
    # hot-bucket cap alone zeroed the output (EVERY bucket hot at 200 k
    # docs). (bits=63, bands=9, hamming≤8) keeps the same angular cut
    # (hamming scales with bits) and the same pigeonhole guarantee
    # (8 < 9) with 7-bit band keys — 8× the selectivity — measured
    # precision 1.0 / recall .89/.92/.95 at sf0.001/0.01/0.1.
    return dd.simhash_pairs(
        docs, bits=63, bands=9, max_hamming=8, ngram=3
    ).orderBy("id_a", "id_b")


# --------------------------------------------------------------------------
# Near-dup CLUSTERS: pair list → transitive closure (alternating
# large-star/small-star connected components) → min-id canonical per
# cluster. The step that answers "which rows do I drop" at 100 TB —
# pairs alone don't. Spark generates pairs via banded MinHash with
# exact-Jaccard verify (recall 1.0 on this corpus, guarded by the
# dedup_minhash_pairs hash gate + pytest); the DuckDB oracle computes
# the same pair set exactly, then walks the transitive closure with a
# recursive CTE and labels each node with its minimum reachable id.
# --------------------------------------------------------------------------
@query(
    "dedup_clusters",
    oracle=f"""
WITH RECURSIVE docs AS (
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
), cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
         COUNT(*) AS shared
  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
), pairs AS (
  SELECT id_a, id_b
  FROM cand
  WHERE shared * 1.0 / (n_a + n_b - shared) >= 0.2
), edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), walk(node, reach) AS (
  SELECT u, u FROM edges
  UNION
  SELECT w.node, e.v FROM walk w JOIN edges e ON e.u = w.reach
), labels AS (
  SELECT node AS doc_id, MIN(reach) AS cluster_id FROM walk GROUP BY node
), labeled AS (
  SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id
)
SELECT doc_id, cluster_id,
       doc_id = cluster_id AS is_canonical,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM labeled
ORDER BY doc_id
""",
    tags=("dedup", "clusters", "connected-components"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    shingled = dd._shingle_frame(docs, "text", "doc_id", 3).cache()
    shingled.count()
    cand = dd._banded_minhash_candidates(
        shingled, bands=8, rows_per_band=4, seed=42
    )
    pairs = dd.exact_jaccard_verify(cand, shingled, 0.2)
    return dd.dedup_clusters(docs, pairs).orderBy("doc_id")


# --------------------------------------------------------------------------
# Benchmark decontamination — the n-gram-overlap scrub used on
# pretraining corpora before training (published convention: 13-grams;
# here n=5, the smallest n that discriminates on the shared-vocabulary
# synthetic corpus — n=3 marks 400/475 docs contaminated, n=5 marks 2).
# ``source = 'src0'`` plays the held-out benchmark; the rest is the
# training corpus. Scale shape (operators/dedup.py:decontaminate): the
# benchmark's distinct n-gram set broadcasts, the corpus side is one
# scan + explode with no corpus-row shuffle.
# --------------------------------------------------------------------------
@query(
    "decontaminate_ngram",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, source,
         list_distinct(list_transform(
           range(1, len({_TOKS}) - 3),
           i -> array_to_string(({_TOKS})[i:i+4], ' ')
         )) AS grams
  FROM documents
), bench AS (
  SELECT DISTINCT UNNEST(grams) AS gram FROM sh WHERE source = 'src0'
), corpus AS (
  SELECT doc_id, UNNEST(grams) AS gram FROM sh WHERE source <> 'src0'
), hits AS (
  SELECT c.doc_id, COUNT(*) AS n_hit_ngrams
  FROM corpus c JOIN bench b USING (gram)
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(h.n_hit_ngrams, 0) AS BIGINT) AS n_hit_ngrams,
       COALESCE(h.n_hit_ngrams, 0) > 0             AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.source <> 'src0'
ORDER BY d.doc_id
""",
    tags=("dedup", "decontamination"),
)
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")
    return dd.decontaminate(corpus, bench, n=5).orderBy("doc_id")


# --------------------------------------------------------------------------
# Deterministic corpus sampling (operators/sampling.py) — the
# data-mixing primitives of a training pipeline, all three modes
# method-tagged in ONE gate (registry budget: the driver checks the
# first 50 queries, so single-table siblings fuse — see COVERAGE.md).
# Unlike RNG sampling (gated on size invariants only — R RNG ≠ Spark
# RNG), md5-keyed selection is byte-identical across engines, so the
# fused gate carries a full value-hash oracle: 'fraction' = stateless
# threshold filter (rank NULL), 'quota' = exactly 5 per source,
# 'temperature' = t=1 mixture quotas in exact integer arithmetic.
# --------------------------------------------------------------------------
@query(
    "sample_mixture_suite",
    oracle="""
WITH ranked AS (
  SELECT doc_id, source,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5('mix1' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS BIGINT) AS sample_rank
  FROM documents
), counts AS (
  SELECT source, COUNT(*) AS n FROM documents GROUP BY 1
), tot AS (
  SELECT SUM(n) AS t FROM counts
), quotas AS (
  SELECT source,
         CAST(FLOOR((200 * n + t - 1) * 1.0 / t) AS BIGINT) AS quota
  FROM counts, tot
)
SELECT 'fraction' AS method, doc_id, source, CAST(NULL AS BIGINT) AS sample_rank
FROM documents
WHERE substring(md5('mix1' || CAST(doc_id AS VARCHAR)), 1, 8) < '40000000'
UNION ALL
SELECT 'quota' AS method, doc_id, source, sample_rank
FROM ranked WHERE sample_rank <= 5
UNION ALL
SELECT 'temperature' AS method, r.doc_id, r.source, r.sample_rank
FROM ranked r JOIN quotas q USING (source)
WHERE r.sample_rank <= q.quota
ORDER BY method, source, doc_id
""",
    tags=("sampling", "deterministic", "stateless", "stratified", "mixture"),
)
def sample_mixture_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import (
        hash_fraction_sample,
        stratified_quota_sample,
        temperature_mixture_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    frac = hash_fraction_sample(docs, 0.25, "doc_id", salt="mix1").select(
        F.lit("fraction").alias("method"),
        "doc_id",
        "source",
        F.lit(None).cast("long").alias("sample_rank"),
    )
    quota = stratified_quota_sample(docs, ["source"], 5, "doc_id", salt="mix1").select(
        F.lit("quota").alias("method"),
        "doc_id",
        "source",
        F.col("sample_rank").cast("long").alias("sample_rank"),
    )
    temp = temperature_mixture_sample(
        docs, ["source"], 200, "doc_id", temperature=1.0, salt="mix1"
    ).select(
        F.lit("temperature").alias("method"),
        "doc_id",
        "source",
        F.col("sample_rank").cast("long").alias("sample_rank"),
    )
    return frac.unionByName(quota).unionByName(temp).orderBy(
        "method", "source", "doc_id"
    )


# --------------------------------------------------------------------------
# Per-document text enrichment — quality scoring, language ID,
# fingerprinting, line-repetition signals (C4/Gopher-style boilerplate
# heuristics) and PII counts FUSED into one scan. At 100 TB you never
# run separate passes over the corpus for per-doc features: every
# expression here is a codegen'd projection, so the fused query reads
# each document exactly once and computes all of them in the same
# stage.
# --------------------------------------------------------------------------
# non-empty trimmed lines (DuckDB twin of operators.text._lines)
_LINES = (
    "list_filter(list_transform(string_split(d.text, chr(10)), x -> trim(x)), "
    "x -> x <> '')"
)
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
    "text_enrich_per_doc",
    oracle=f"""
WITH scores AS (
{_LANG_UNION}
), ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
  FROM scores
), best AS (
  SELECT doc_id, lang AS pred_lang FROM ranked WHERE rn = 1
)
SELECT
  d.doc_id,
  LENGTH(d.text) AS n_chars_q,
  CASE WHEN LENGTH(TRIM(d.text)) = 0 THEN 0
       ELSE len(string_split(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g'), ' '))
  END AS n_tokens,
  len(regexp_extract_all(d.text, '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]')) AS n_tokens_bpe,
  (LENGTH(d.text) - LENGTH(regexp_replace(d.text, '[^\\w\\s]', '', 'g')))
        * 1.0 / GREATEST(LENGTH(d.text), 1) AS punct_ratio,
  len(list_filter(string_split(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g'), ' '),
                  t -> t IN ('the', 'and', 'with', 'from')))
        * 1.0 / GREATEST(len(string_split(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g'), ' ')), 1)
        AS stopword_ratio,
  b.pred_lang,
  d.lang AS true_lang,
  md5(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g')) AS fp,
  len({_LINES}) AS n_lines,
  (len({_LINES}) - len(list_distinct({_LINES}))) * 1.0
        / GREATEST(len({_LINES}), 1) AS dup_line_frac,
  COALESCE(list_max(list_transform({_LINES}, x -> length(x))), 0) AS max_line_len,
  len(list_filter({_LINES}, x -> regexp_matches(x, '^[-*•]'))) * 1.0
        / GREATEST(len({_LINES}), 1) AS bullet_line_frac,
  len(list_filter({_LINES}, x -> ends_with(x, '...') OR ends_with(x, '…'))) * 1.0
        / GREATEST(len({_LINES}), 1) AS ellipsis_line_frac,
  len(regexp_extract_all(d.text, '{tx.EMAIL_PATTERN}')) AS n_emails,
  len(regexp_extract_all(d.text, '{tx.IPV4_PATTERN}')) AS n_ipv4,
  len(regexp_extract_all(d.text, '{tx.PHONE_PATTERN}')) AS n_phones
FROM documents d JOIN best b ON b.doc_id = d.doc_id
ORDER BY d.doc_id
""",
    tags=("text", "quality", "lang-id", "fingerprint", "repetition", "pii"),
)
def text_enrich_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    enriched = tx.quality_score(docs)
    enriched = tx.lang_id(enriched)
    enriched = tx.repetition_signals(enriched)
    return (
        enriched.select(
            "doc_id",
            "n_chars_q",
            "n_tokens",
            "n_tokens_bpe",
            "punct_ratio",
            "stopword_ratio",
            "pred_lang",
            F.col("lang").alias("true_lang"),
            tx.fingerprint("text").alias("fp"),
            "n_lines",
            "dup_line_frac",
            "max_line_len",
            "bullet_line_frac",
            "ellipsis_line_frac",
            tx.pii_count("text", tx.EMAIL_PATTERN).alias("n_emails"),
            tx.pii_count("text", tx.IPV4_PATTERN).alias("n_ipv4"),
            tx.pii_count("text", tx.PHONE_PATTERN).alias("n_phones"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# TF-IDF top terms per document (Tokenizer → CountVectorizer → IDF).
# MLlib's tf·idf IS SQL-expressible: tf = per-doc term count, idf =
# ln((m+1)/(df+1)), vocabulary = terms with df ≥ minDF (the 65536
# vocabSize cap is not binding at oracle scale — documented limit).
# Ranking tie-breaks on the term string so both engines agree.
# --------------------------------------------------------------------------
@query(
    "text_tfidf_top_terms",
    oracle="""
WITH toks AS (
  SELECT doc_id, t.tok AS term
  FROM documents,
       UNNEST(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS t(tok)
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
), m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM documents
), scored AS (
  SELECT t.doc_id, t.term,
         t.tf * ln((m.m + 1.0) / (d.df + 1.0)) AS tfidf
  FROM tf t JOIN df d USING (term) CROSS JOIN m
  WHERE d.df >= 2
), ranked AS (
  SELECT doc_id, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
  FROM scored
  WHERE tfidf > 0
)
SELECT doc_id, term, ROUND(tfidf, 6) AS tfidf, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 3
ORDER BY doc_id, rank
""",
    tags=("text", "tfidf"),
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return tx.tfidf_top_terms(docs, k=3).orderBy("doc_id", "rank")


# --------------------------------------------------------------------------
# Per-label embedding centroids — elementwise array aggregation in long
# format. Values are fixed-point quantized (20 fractional bits) before
# summing: power-of-two scaling + floor + integer sums are exact and
# order-independent in BOTH engines, where decimal casts of floats are
# not (shortest-repr tie rounding differs — see operators.similarity.
# embedding_centroids).
# --------------------------------------------------------------------------
@query(
    "embedding_centroids_per_label",
    oracle="""
WITH ex AS (
  SELECT label,
         generate_subscripts(embedding, 1) AS idx,
         UNNEST(embedding) AS val
  FROM embeddings
)
SELECT label,
       CAST(idx AS BIGINT) AS idx,
       COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(CAST(val AS DOUBLE) * 1048576) AS BIGINT)) AS DOUBLE)
         / COUNT(*) / 1048576 AS mean_val
FROM ex
GROUP BY label, idx
ORDER BY label, idx
""",
    tags=("similarity", "centroids", "array-agg"),
)
def embedding_centroids_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.embedding_centroids(emb, "label", "embedding").orderBy("label", "idx")


# --------------------------------------------------------------------------
# Document chunking — overlapping token windows (chunk 32, overlap 8),
# the pre-tokenization fan-out of a training pipeline. Chunk starts are
# 1 + k·stride while start ≤ n−chunk+stride, the tail remainder is its
# own (shorter) chunk — both engines compute the same windows, so the
# gate hashes chunk text verbatim.
# --------------------------------------------------------------------------
@query(
    "text_chunk_documents",
    oracle=f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '') AS toks
  FROM documents
), sized AS (
  SELECT doc_id, toks, len(toks) AS n,
         range(1, greatest(n - 8, 1) + 1, 24) AS starts
  FROM tk
), exploded AS (
  SELECT doc_id, toks,
         CAST(len(starts) AS BIGINT) AS n_chunks,
         UNNEST(starts) AS s
  FROM sized
)
SELECT doc_id,
       (s - 1) // 24                            AS chunk_id,
       n_chunks,
       array_to_string(toks[s:s + 31], ' ')     AS chunk_text,
       CAST(len(toks[s:s + 31]) AS BIGINT)      AS n_tokens
FROM exploded
WHERE len(toks[s:s + 31]) >= 1
ORDER BY doc_id, chunk_id
""",
    tags=("text", "chunking"),
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        tx.chunk_documents(docs, chunk_tokens=32, overlap=8)
        .select(
            F.col("id").alias("doc_id"),
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("n_chunks").cast("long").alias("n_chunks"),
            "chunk_text",
            F.col("n_tokens").cast("long").alias("n_tokens"),
        )
        .orderBy("doc_id", "chunk_id")
    )


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


# --------------------------------------------------------------------------
# End-to-end curation funnel — the capstone composition: quality filter →
# exact dedup → decontamination → mixture sampling → sequence packing,
# reported as a per-stage (docs, tokens) funnel. Rows-only by design
# (every stage is individually hash-gated or pytest-oracled above); its
# pytest asserts the funnel is monotone non-increasing and every stage
# survives non-empty. This is the query a corpus curator actually runs.
# --------------------------------------------------------------------------
@query("curation_funnel", tags=("pipeline", "dedup", "quality", "packing"))
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import hash_fraction_sample
    from ..operators.text import gopher_quality_filter, pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")

    # per-stage token counts MUST use pack_sequences' exact semantics
    # (empty boundary tokens from tab/newline padding filtered out) or
    # the packed-tokens == sampled-tokens invariant breaks on padded
    # text — whitespace_token_count counts the empty boundary token
    n_tok = F.size(
        F.filter(
            F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != ""
        )
    )

    # thresholds tuned to the synthetic word-soup corpus (≈50-token
    # docs, tiny shared vocabulary): the POINT is driving every stage
    # end-to-end, not reproducing web-crawl pass rates. (The published-
    # parameter behavior lives in tests/test_published_parameters.py.)
    #
    # Same one-enriched-pass shape as curation_funnel_v2 (r6): the
    # per-doc signals (quality, contamination, token count) compute over
    # the corpus ONCE into a checkpointed frame; stage membership is a
    # conjunction of flags (exact-dedup keep among stage-1 survivors —
    # the one set-dependent decision — joins in as a flag); accounting
    # is ONE aggregate stacked into stage rows. Measured 7.0 → ~4 s at
    # sf0.1 — the per-stage union paid ~6 extra actions of scheduler
    # overhead for identical rows.
    gq = gopher_quality_filter(
        corpus, min_words=20, min_stopword_hits=1, min_alpha_word_frac=0.5
    ).select("doc_id", "text", "quality_pass", n_tok.alias("n_tokens"))
    # decontamination shingles explode over GOPHER SURVIVORS only —
    # stage-1 rejects can never reach the stage it gates (s3 conjuncts
    # with s2, so FALSE & NULL = FALSE for the NULL non-survivor rows)
    contam = dd.decontaminate(
        gq.filter("quality_pass").select("doc_id", "text"), bench, n=5
    ).select("doc_id", "contaminated")
    enriched = gq.join(contam, "doc_id", "left").localCheckpoint()
    s1 = F.col("quality_pass")
    keep2 = dd.exact_dedup(enriched.filter(s1)).select(
        F.col("keep_id").alias("doc_id")
    )
    e2 = enriched.join(keep2.withColumn("f2", F.lit(1)), "doc_id", "left")
    s2 = s1 & F.col("f2").isNotNull()
    s3 = s2 & ~F.col("contaminated")
    sampled = hash_fraction_sample(
        e2.filter(s3), 0.8, key_col="doc_id"
    ).select("doc_id")
    e4 = e2.join(sampled.withColumn("f4", F.lit(1)), "doc_id", "left")
    s4 = s3 & F.col("f4").isNotNull()
    # n_tokens IS pack_sequences' whitespace semantics (see n_tok above),
    # so the packer reuses it instead of re-counting from text
    manifest = pack_sequences(
        e4.filter(s4), max_tokens=256, token_count_col="n_tokens"
    )

    def stage_cols(in_stage, tag):
        return [
            F.sum(in_stage.cast("long")).alias(f"d{tag}"),
            F.coalesce(
                F.sum(F.when(in_stage, F.col("n_tokens"))), F.lit(0)
            ).alias(f"t{tag}"),
        ]

    flags = [F.lit(True), s1, s2, s3, s4]
    wide = e4.agg(
        *[c for i, fl in enumerate(flags) for c in stage_cols(fl, str(i))]
    )
    packed = manifest.agg(
        F.count_distinct("block_id").alias("nb"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("mt"),
    )
    names = [
        "0_raw",
        "1_quality",
        "2_exact_dedup",
        "3_decontaminated",
        "4_mixture_sampled",
    ]
    stack_args = ", ".join(f"'{nm}', d{i}, t{i}" for i, nm in enumerate(names))
    return (
        wide.crossJoin(F.broadcast(packed))  # 1×1 broadcast
        .select(
            F.expr(
                f"stack(6, {stack_args}, '5_packed_blocks', "
                "CAST(nb AS LONG), mt) AS (stage, n_docs, n_tokens)"
            )
        )
        .orderBy("stage")
    )


# --------------------------------------------------------------------------
# CCNet-style bigram-LM perplexity bucketing (rows-only: ln() is not
# bit-portable across engines — pytest carries the DuckDB twin with a
# 1e-9 relative tolerance plus an exact hand oracle; integer stats
# compare bit-exact there).
# --------------------------------------------------------------------------
@query("text_lm_perplexity", tags=("text", "quality", "lm", "ccnet"))
def text_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train an add-1 bigram LM on the English documents (the trusted
    "target corpus" in CCNet terms), score every document's
    cross-entropy under it, and split the corpus into head/middle/tail
    perplexity buckets — the published CCNet quality-filtering design
    (Wenzek et al. 2019 §4.3) with the LM stage re-expressed as bounded
    DataFrame aggregates (see operators/ngram_lm.py)."""
    from ..operators import ngram_lm as lm_ops

    docs = load_table(spark, sf_dir, "documents")
    lm = lm_ops.train_bigram_lm(
        docs.filter(F.col("lang") == "en"), vocab_size=50_000
    )
    scored = lm_ops.score_cross_entropy(lm, docs)
    # perplexity_buckets(exact=True) caches the scored frame for its
    # two-pass cutoff computation and leaves it cached for this result's
    # consumption; sessions looping over many corpora should pass
    # cache_scored=False (bench.py instead clearCache()s between reps).
    return (
        lm_ops.perplexity_buckets(scored)
        .select(
            "doc_id",
            "n_bigrams",
            "n_oov",
            F.round("cross_entropy", 6).alias("cross_entropy_6"),
            "bucket",
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Real BPE tokenizer training + corpus token accounting (rows-only: the
# merge loop has no SQL expression — pytest carries an independent
# naive-recount oracle and a whole-pipeline pandas oracle).
# --------------------------------------------------------------------------
@query("text_bpe_token_stats", tags=("text", "tokenizer", "bpe"))
def text_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a BPE vocabulary on the corpus (distributed word counts →
    driver-local merge loop over the bounded count table → distributed
    encode of the distinct-word vocabulary) and report per-source token
    accounting. The collect() is the model-fit step over an EXPLICITLY
    capped table: ``word_counts(max_words=500_000)`` LIMITs the merge
    statistics to the top-500k words by count (count desc, word asc —
    deterministic), the same bound ``curation_funnel_v2`` uses. A web
    corpus's distinct-"word" table is unbounded garbage (URLs, hashes,
    hex blobs), so a corpus-statistic bound is not enough for the
    driver — the cap must be a constant. Tail words dropped from the
    MERGE statistics still encode downstream: ``bpe_token_counts``
    encodes the corpus's FULL distinct-word frame executor-side, so
    token accounting keeps its no-NULL coverage contract. At gate SF
    the corpus has far fewer distinct words than the cap, so the
    learned merges are bit-identical with or without it."""
    from ..operators import bpe

    docs = load_table(spark, sf_dir, "documents")
    wc = [
        (r["word"], r["c"])
        for r in bpe.word_counts(docs, max_words=500_000).collect()
    ]
    merges = bpe.learn_bpe(wc, num_merges=100)
    # encoded=None means the vocab is the corpus's FULL distinct-word
    # table — corpus-statistic-bounded, so AQE decides the join side
    per_doc = bpe.bpe_token_counts(docs, merges, broadcast_vocab=False)
    return (
        per_doc.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_bpe_tokens").alias("n_bpe_tokens"),
            F.sum("n_word_chars").alias("n_chars"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# DSIR-style importance resampling (rows-only: log-weights ride IEEE ln —
# pytest carries a pure-Python full-pipeline oracle at 1e-9 plus exact
# DuckDB parity for the integer bucket histograms).
# --------------------------------------------------------------------------
@query("sample_importance_dsir", tags=("sampling", "importance", "dsir", "quality"))
def sample_importance_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select the 100 documents whose hashed-n-gram profile best matches
    the English target domain — DSIR (Xie et al. 2023) with
    deterministic md5 bucketing and Gumbel noise so the selection is
    reproducible across engines and partitionings. See
    operators/importance.py for the bounded-plan architecture."""
    from ..operators import importance as imp

    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")
    weighted = imp.dsir_log_weights(docs, target, buckets=4096)
    return (
        imp.gumbel_topk(weighted, 100)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            "lang",
            "n_grams",
            F.round("log_weight", 6).alias("log_weight_6"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Curation funnel v2 — the end-to-end pipeline a pretraining-data team
# would actually run, composing every round-5 family: rule-based quality
# (Gopher) → model-based quality (CCNet LM tail drop) → exact dedup →
# benchmark decontamination → domain targeting (DSIR Gumbel-top-k) →
# packing manifest, with BPE token accounting per stage. Rows-only
# (pytest pins stage set + monotone doc counts); per-stage wall probed
# in SCALE.md. Thresholds tuned to the synthetic word-soup corpus — the
# POINT is driving the full composition, not web-crawl pass rates.
# --------------------------------------------------------------------------
@query(
    "curation_funnel_v2",
    tags=("pipeline", "quality", "lm", "dedup", "dsir", "bpe", "packing"),
)
def curation_funnel_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import bpe as bpe_ops
    from ..operators import importance as imp
    from ..operators import ngram_lm as lm_ops
    from ..operators.text import gopher_quality_filter, pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    # corpus feeds the vocabulary count, stage 0, the quality filter,
    # and (via target) the LM and DSIR model fits — cache the one scan
    corpus = docs.filter(F.col("source") != "src0").cache()
    target = corpus.filter(F.col("lang") == "en")

    # BPE vocabulary from the raw corpus once; every stage reports its
    # token budget under the SAME tokenizer (the accounting a data team
    # actually wants: "tokens surviving per stage"). The corpus
    # vocabulary is encoded in Python ONCE and cached — stages pay only
    # a broadcast join, not a per-stage encode pass (72 s → ~8 s at
    # sf0.01 before this hoist).
    wc = bpe_ops.word_counts(corpus, max_words=None).cache()
    # merge learning collects the top-500k words BY CONSTRUCTION (the
    # production trainers' vocab/min-frequency knob — r11 VERDICT: no
    # collect may be bounded only by a corpus statistic). Tail words
    # dropped from the MERGE statistics still encode downstream:
    # encode_vocab below runs over the FULL distinct-word frame, so the
    # stage token accounting keeps its no-NULL coverage contract. At
    # gate SF the corpus has far fewer distinct words than the cap, so
    # the learned merges are bit-identical.
    # r17 (guide §2.6): the BPE merge collect and the LM vocab collect
    # (inside train_bigram_lm) are independent driver actions over
    # corpus/target — overlap them from a 2-thread pool instead of
    # paying two serial action floors (and, at scale, two serial corpus
    # scans). Both are deterministic (ordered limits / seeded), so
    # concurrency cannot change any value; probe attribution r17:
    # wc_collect 5.8 s + lm_train 1.8 s serial at sf0.1 cold.
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.util import inheritable_thread_target as _itt

    with ThreadPoolExecutor(max_workers=2) as _pool:
        _f_wc = _pool.submit(
            _itt(
                wc.orderBy(F.col("c").desc(), F.col("word").asc())
                .limit(500_000)
                .collect
            )
        )
        _f_lm = _pool.submit(
            _itt(lambda: lm_ops.train_bigram_lm(target, vocab_size=50_000))
        )
        merge_rows, lm = _f_wc.result(), _f_lm.result()
    merges = bpe_ops.learn_bpe(
        [(r["word"], r["c"]) for r in merge_rows], num_merges=100
    )
    encoded = bpe_ops.encode_vocab(wc, merges).select("word", "n_tokens").cache()

    # ---- ONE enriched per-doc pass (r6). Every per-doc signal the
    # funnel needs — Gopher pass, LM cross-entropy, benchmark
    # contamination, BPE token count — is per-doc INDEPENDENT (identical
    # whether computed on the raw corpus or any survivor subset), so all
    # four are computed over the corpus in one checkpointed frame and
    # stage membership becomes a conjunction of flags. The previous
    # shape checkpointed a semi-joined frame per stage; at ~10²–10³
    # surviving rows the wall was scheduler overhead per action (≈88
    # jobs at sf0.1), not executor work. The SET-dependent decisions
    # (LM bucket cutoffs over stage-1 survivors, exact-dedup keep among
    # stage-2 survivors, DSIR fit on stage-4 survivors) still operate on
    # exactly the same subsets as the sequential composition — the stage
    # rows are identical. The r5 Catalyst-planning lesson stands: the
    # single localCheckpoint below is what keeps later jobs' analysis
    # O(1) in pipeline depth; at cluster scale it becomes checkpoint()
    # to reliable storage. (lm trained above, overlapped with the BPE
    # merge collect.)
    gq = gopher_quality_filter(
        corpus, min_words=20, min_stopword_hits=1, min_alpha_word_frac=0.5
    ).select("doc_id", "text", "quality_pass")
    # the EXPENSIVE per-doc signals (gram explodes: LM scoring,
    # decontamination) compute over GOPHER SURVIVORS only — on a
    # web-crawl corpus the rules drop 30-50%+, and docs stage 1 rejects
    # can never reach the stages those signals gate (non-survivors get
    # NULL, and s2/s4 conjunct with s1, so FALSE & NULL = FALSE).
    # Only the BPE token count must stay corpus-wide: stage-0's token
    # budget is part of the accounting contract.
    survivors = gq.filter("quality_pass").select("doc_id", "text")
    ce = lm_ops.score_cross_entropy(lm, survivors).select(
        "doc_id", "cross_entropy"
    )
    contam = dd.decontaminate(survivors, bench, n=5).select(
        "doc_id", "contaminated"
    )
    # the funnel's vocab is deliberately UNCAPPED (full coverage → the
    # no-NULL accounting contract), so no forced broadcast — AQE
    # broadcasts it while small and shuffle-joins at corpus scale
    counts = bpe_ops.bpe_token_counts(
        corpus, merges, encoded=encoded, broadcast_vocab=False
    ).select("doc_id", "n_bpe_tokens")
    # three slim per-doc frames join the quality scan on doc_id — at
    # 100 TB these are the same shuffle shape as the semi-joins they
    # replace, with the corpus-scale text column riding only ONE side
    enriched = (
        gq.join(ce, "doc_id", "left")
        .join(contam, "doc_id", "left")
        .join(counts, "doc_id", "left")
        .localCheckpoint()
    )
    s1 = F.col("quality_pass")
    # stage 2: CCNet head/middle keep — cutoffs over the STAGE-1
    # survivors' scores, as the sequential funnel computed them
    # (cross_entropy is a monotone transform of perplexity, so the
    # quantile split is the same membership)
    keep2 = (
        lm_ops.perplexity_buckets(
            enriched.filter(s1).select("doc_id", "cross_entropy"),
            col="cross_entropy",
        )
        .filter(F.col("bucket") != "tail")
        .select("doc_id")
    )

    def with_flag(df, ids, name):
        return df.join(ids.withColumn(name, F.lit(1)), "doc_id", "left")

    e2 = with_flag(enriched, keep2, "f2")
    s2 = s1 & F.col("f2").isNotNull()
    # stage 3: exact-dedup keep among stage-2 survivors
    keep3 = dd.exact_dedup(e2.filter(s2)).select(
        F.col("keep_id").alias("doc_id")
    )
    e3 = with_flag(e2, keep3, "f3")
    s3 = s2 & F.col("f3").isNotNull()
    s4 = s3 & ~F.col("contaminated")
    # stage 5: domain targeting — keep the 60% of surviving docs closest
    # to the target distribution (the count is one job over the
    # checkpoint-rooted lineage)
    clean = e3.filter(s4).cache()
    k = max(1, int(0.6 * clean.count()))
    selected = imp.gumbel_topk(
        imp.dsir_log_weights(clean, target, buckets=4096), k
    ).select("doc_id")
    # e5 (corpus + all stage flags) feeds THREE consumers — the packing
    # bucket-cut sizing action inside pack_sequences, the manifest
    # branch, and the accounting aggregate — so it checkpoints once
    # instead of re-deriving the flag joins + Gumbel top-k three times
    # (measured ~1.5 s/rederivation at sf0.1).
    e5 = with_flag(e3, selected, "f5").localCheckpoint()
    # every cached frame is fully consumed once e5 materializes (the λ
    # collect, the count, and both checkpoints have run) — release them
    # so a long-lived session invoking the funnel per-corpus doesn't
    # accumulate pinned storage (the cache-and-return leak).
    for frame in (clean, corpus, wc, encoded):
        frame.unpersist()
    lm.unpersist()
    s5 = s4 & F.col("f5").isNotNull()
    manifest = pack_sequences(e5.filter(s5), max_tokens=256)

    def stage_cols(in_stage, tag):
        # bpe_token_counts signals a vocabulary-coverage gap with a NULL
        # n_bpe_tokens per doc; a NULL-skipping SUM would turn that gap
        # into a silent undercount of the stage total, so surface it as
        # a NULL total instead (an EMPTY stage still reports 0: zero
        # member rows means zero non-null counts on both sides).
        n_docs = F.sum(in_stage.cast("long"))
        covered = F.count(F.when(in_stage, F.col("n_bpe_tokens")))
        tok = (
            F.when(covered < n_docs, F.lit(None).cast("long"))
            .otherwise(
                F.coalesce(
                    F.sum(F.when(in_stage, F.col("n_bpe_tokens"))), F.lit(0)
                )
            )
        )
        return [n_docs.alias(f"d{tag}"), tok.alias(f"t{tag}")]

    stage_flags = [F.lit(True), s1, s2, s3, s4, s5]
    wide = e5.agg(
        *[
            c
            for i, fl in enumerate(stage_flags)
            for c in stage_cols(fl, str(i))
        ],
    )
    # the packed row reports block count as n_docs and carries forward
    # stage 5's BPE total (packing reorganizes, it never drops — token
    # conservation is pack_sequences' own pytest invariant, in the
    # packer's whitespace unit)
    n_blocks = manifest.select(F.count_distinct("block_id").alias("n"))
    names = [
        "0_raw",
        "1_gopher_quality",
        "2_lm_head_middle",
        "3_exact_dedup",
        "4_decontaminated",
        "5_dsir_selected",
    ]
    stack_args = ", ".join(
        f"'{nm}', d{i}, t{i}" for i, nm in enumerate(names)
    )
    return (
        wide.crossJoin(F.broadcast(n_blocks))  # 1×1 broadcast
        .select(
            F.expr(
                f"stack(7, {stack_args}, '6_packed_blocks', CAST(n AS LONG), t5) "
                "AS (stage, n_docs, n_bpe_tokens)"
            )
        )
        .orderBy("stage")
    )


# --------------------------------------------------------------------------
# Packed-block materialization (the shard-writer): manifest + docs →
# actual fixed-size training blocks. Rows-only (the manifest plumbing is
# already hash-gated via text_chunk_documents-style evidence; pytest
# pins stream reconstruction); fingerprints keep the registered result
# small while hashing the block text verbatim.
# --------------------------------------------------------------------------
@query("text_pack_materialize", tags=("text", "packing", "shards"))
def text_pack_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import materialize_packed_blocks, pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    manifest = pack_sequences(docs, max_tokens=256)
    blocks = materialize_packed_blocks(docs, manifest)
    return blocks.select(
        "block_id", "n_tokens", F.md5("text").alias("fp")
    ).orderBy("block_id")


@query("text_lm_perplexity_order3", tags=("text", "quality", "lm", "ccnet", "trigram"))
def text_lm_perplexity_order3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-3 variant of the CCNet filter (the paper's production LM is
    a 5-gram; the estimator here is order-agnostic): per-(bucket, lang)
    document counts under a trigram model trained on the English
    subset. Rows-only; the trigram math is pinned by hand and pure-
    Python oracles in tests/test_ngram_lm.py."""
    from ..operators import ngram_lm as lm_ops

    docs = load_table(spark, sf_dir, "documents")
    lm = lm_ops.train_ngram_lm(
        docs.filter(F.col("lang") == "en"), order=3, vocab_size=50_000
    )
    scored = lm_ops.score_cross_entropy(lm, docs)
    return (
        lm_ops.perplexity_buckets(scored)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("bucket", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("bucket", "lang")
    )


@query("text_lm_stupid_backoff", tags=("text", "quality", "lm", "backoff"))
def text_lm_stupid_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff trigram scoring (Brants et al. 2007 — the LM
    estimator built for distributed count-based training) bucketed
    head/middle/tail per language. Rows-only; hand + pure-Python
    oracles in tests/test_ngram_lm.py."""
    from ..operators import ngram_lm as lm_ops

    docs = load_table(spark, sf_dir, "documents")
    lm = lm_ops.train_backoff_lm(
        docs.filter(F.col("lang") == "en"), order=3, vocab_size=50_000
    )
    scored = lm_ops.score_stupid_backoff(lm, docs)
    return (
        lm_ops.perplexity_buckets(scored)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("bucket", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("bucket", "lang")
    )


# --------------------------------------------------------------------------
# Corpus datasheet — the per-source report a data team publishes with a
# corpus ("datasheets for datasets"): volume, token budget, language
# mix, exact-dup rate, PII incidence — ONE grouped scan. Value-hash
# gate since r9 (slot freed by fusing the A8 frequency table into the
# pivot gate); the oracle is the full DuckDB implementation the pytest
# twin ran at 1e-12 since r5 — token counts share the `tokens()`
# contract, the fingerprint is md5 over the same normalization, and
# dup_rate is one IEEE double division on exact integers in both
# engines (the repo's never-ROUND policy).
# --------------------------------------------------------------------------
@query(
    "corpus_datasheet",
    oracle=r"""
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
  SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs,
         CAST(SUM(tok) AS BIGINT) AS n_tokens,
         COUNT(*) AS n_langs,
         MIN(struct_pack(negn := -n, lang := lang)).lang AS top_lang
  FROM lang_stats GROUP BY 1
), fp_stats AS (
  SELECT source,
         1.0 - COUNT(DISTINCT fp) * 1.0 / COUNT(*) AS dup_rate,
         CAST(SUM(has_email) AS BIGINT) AS n_docs_with_email
  FROM per_doc GROUP BY 1
)
SELECT p.source, p.n_docs, p.n_tokens, p.n_langs, p.top_lang,
       f.dup_rate, f.n_docs_with_email
FROM per_source p JOIN fp_stats f USING (source)
ORDER BY p.source
""",
    tags=("text", "reporting", "datasheet"),
)
def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import EMAIL_PATTERN, fingerprint, tokens

    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        "lang",
        F.size(tokens("text")).alias("__n_tok"),
        fingerprint(F.col("text")).alias("__fp"),
        # rlike short-circuits on first match — never materialize the
        # full match array just to test emptiness (mirrors the DuckDB
        # twin's boolean regexp_matches)
        F.col("text").rlike(EMAIL_PATTERN).cast("int").alias("__has_email"),
    )
    # two aggregates over the slim per-doc projection: the language mix
    # needs (source, lang) granularity while dup/PII need per-source
    # distincts — the projection is cached so the corpus scans once
    per_doc = per_doc.cache()
    lang_stats = per_doc.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__n_tok").alias("__tok")
    )
    per_source = lang_stats.groupBy("source").agg(
        F.sum("__n").alias("n_docs"),
        F.sum("__tok").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_langs"),
        # majority language, ties broken by lang code (deterministic)
        F.min(F.struct((-F.col("__n")).alias("negn"), F.col("lang")))[
            "lang"
        ].alias("top_lang"),
    )
    fp_stats = per_doc.groupBy("source").agg(
        (F.lit(1.0) - F.count_distinct("__fp") / F.count(F.lit(1))).alias(
            "dup_rate"
        ),
        F.sum("__has_email").alias("n_docs_with_email"),
    )
    return per_source.join(fp_stats, "source").orderBy("source")


@query("text_quality_classifier", tags=("text", "quality", "classifier", "gpt3"))
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style classifier filtering (Brown et al. 2020 App. A):
    HashingTF + LogisticRegression separating the English target domain
    from the rest, deterministic Pareto(3) keep rule. Output: kept/
    dropped rollup with target-language counts (the enrichment the
    filter exists to produce). Rows-only; pytest carries the exact
    Python oracle for the keep rule and the separation property."""
    from ..operators import quality_classifier as qc

    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")
    model = qc.train_quality_classifier(target, docs.filter(F.col("lang") != "en"))
    scored = qc.score_quality(model, docs)
    # the keep rule is a row-local predicate of (doc_id, prob) — one
    # withColumn, one scoring pass, no re-transform/self-join subtree
    tagged = scored.join(docs.select("doc_id", "lang"), "doc_id").withColumn(
        "kept", qc.pareto_keep_flag(alpha=3.0)
    )
    return (
        tagged.groupBy("kept")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("lang") == "en").cast("long")).alias("n_en"),
            F.round(F.avg("quality_prob"), 6).alias("avg_prob_6"),
        )
        .orderBy("kept")
    )


# --------------------------------------------------------------------------
# PII scrubbing over the documents corpus (r7 — the standard pre-release
# redaction step). r10: promoted to a value-hash gate (slot freed by
# fusing q13 into tpch_ansi_suite2). The oracle is the SAME pattern
# text the Spark chain runs — built from pii_twin_sql, the twin that
# has matched in tests/test_pii.py on a PII-bearing corpus since r7;
# the sf-dir gate additionally pins the (near-)zero vector on the
# synthetic corpus plus the real n_docs/chars_out totals. This entry
# runs the codegen scrub at fact scale — a pure projection, cost = the
# scan.
# --------------------------------------------------------------------------
def _pii_scrub_oracle() -> str:
    from ..operators.pii import PII_ORDER, pii_token, pii_twin_sql

    exprs = pii_twin_sql("text")
    n_cols = ",\n         ".join(f"{exprs[f'n_{k}']} AS n_{k}" for k in PII_ORDER)
    token_chars = " + ".join(f"n_{k} * {len(pii_token(k))}" for k in PII_ORDER)
    sums = ",\n  ".join(
        f"CAST(SUM(n_{k}) AS BIGINT) AS total_{k}" for k in PII_ORDER
    )
    return f"""
WITH scrub AS (
  SELECT source, length(text) AS len_in,
         {n_cols},
         length({exprs['scrubbed']}) AS len_out
  FROM documents
)
SELECT source,
  COUNT(*) AS n_docs,
  {sums},
  CAST(SUM(COALESCE(len_in - len_out + {token_chars}, 0)) AS BIGINT) AS chars_removed,
  CAST(SUM(len_out) AS BIGINT) AS chars_out
FROM scrub
GROUP BY source
ORDER BY source
"""


@query("text_pii_scrub", oracle=_pii_scrub_oracle(), tags=("pii", "text", "F4"))
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pii import PII_ORDER, scrub_pii

    docs = load_table(spark, sf_dir, "documents")
    scrubbed = scrub_pii(docs, "text", out_col="scrubbed")
    return (
        scrubbed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            *[F.sum(f"n_{k}").alias(f"total_{k}") for k in PII_ORDER],
            F.sum("pii_chars_removed").alias("chars_removed"),
            F.sum(F.length("scrubbed")).alias("chars_out"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# WARC ingestion (r10 — wires sources/warc.py, the crawl→curation entry
# point). The documents corpus is deterministically encoded into WARC
# shard blobs in-Spark (one applyInPandas task per shard, gzip on odd
# shard ids so both decode paths run), split back into records by the
# same mapInPandas splitter read_warc uses over binaryFile, and rolled
# up per HTTP status. Rows-only: the shard encode/parse roundtrip is
# not SQL-expressible, but because the derivation from documents is
# deterministic the rollup has an exact DuckDB twin in
# tests/test_warc.py (status/record counts/body octet totals computed
# straight off the documents table).
# --------------------------------------------------------------------------
#: deterministic fixture derivation shared by the query and its DuckDB
#: twin (tests/test_warc.py): status 404 every 37th doc, 16 shards.
WARC_STATUS_MOD = 37
WARC_N_SHARDS = 16


# --------------------------------------------------------------------------
# URL curation (r10): normalize → registered domain → exact per-domain
# cap over a deterministic messy-URL fixture derived from doc_id —
# mixed-case scheme/host, default and explicit ports, trailing
# slashes, tracking params in first and last position, fragments, one
# hot domain holding ~half the corpus (the blogspot shape the
# skew-hardened cap exists for). The SAME derivation is pinned as SQL
# (SYNTH_URL_SQL) so the pytest twin rebuilds every URL verbatim in
# DuckDB; rows-only here (window full) with the exact
# ROW_NUMBER-oracle twin in tests/test_urls.py.
# --------------------------------------------------------------------------
SYNTH_URL_SQL = """
CASE WHEN doc_id % 5 = 0 THEN 'HTTPS' ELSE 'http' END || '://' ||
CASE WHEN doc_id % 2 = 0 THEN 'Mega-Portal.Example.COM'
     WHEN doc_id % 3 = 0 THEN 'news.site-' || (doc_id % 7) || '.co.uk'
     ELSE 'blog-' || (doc_id % 23) || '.example.org' END ||
CASE WHEN doc_id % 4 = 0 AND doc_id % 5 != 0 THEN ':80'
     WHEN doc_id % 8 = 1 THEN ':8080' ELSE '' END ||
'/Articles/' || doc_id ||
CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END ||
CASE WHEN doc_id % 9 = 0 THEN '?utm_source=feed&id=' || doc_id
     WHEN doc_id % 9 = 1 THEN '?id=' || doc_id || '&utm_campaign=x'
     ELSE '' END ||
CASE WHEN doc_id % 10 = 0 THEN '#section-2' ELSE '' END
""".strip()

URL_CAP = 30


def synth_url_col(did: "F.Column | None" = None) -> "F.Column":
    """Spark twin of SYNTH_URL_SQL (same CASE arms, same concat).
    ``did`` defaults to the ``doc_id`` column; the link-graph query
    passes shifted ids to derive deterministic edge endpoints (the
    DuckDB twin does the same by re-aliasing doc_id in a subquery)."""
    if did is None:
        did = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    host = (
        F.when(did % 2 == 0, F.lit("Mega-Portal.Example.COM"))
        .when(
            did % 3 == 0,
            F.concat(F.lit("news.site-"), s(did % 7), F.lit(".co.uk")),
        )
        .otherwise(
            F.concat(F.lit("blog-"), s(did % 23), F.lit(".example.org"))
        )
    )
    return F.concat(
        F.when(did % 5 == 0, F.lit("HTTPS")).otherwise(F.lit("http")),
        F.lit("://"),
        host,
        F.when((did % 4 == 0) & (did % 5 != 0), F.lit(":80"))
        .when(did % 8 == 1, F.lit(":8080"))
        .otherwise(F.lit("")),
        F.lit("/Articles/"),
        s(did),
        F.when(did % 6 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(did % 9 == 0, F.concat(F.lit("?utm_source=feed&id="), s(did)))
        .when(did % 9 == 1, F.concat(F.lit("?id="), s(did), F.lit("&utm_campaign=x")))
        .otherwise(F.lit("")),
        F.when(did % 10 == 0, F.lit("#section-2")).otherwise(F.lit("")),
    )


def _url_curation_oracle() -> str:
    """Full DuckDB twin (value-hash gate since r11 — the kept SET is
    cross-engine reproducible by construction: md5 ranking was chosen
    for exactly this; the same SQL ran as the pytest twin in r10)."""
    from ..operators.urls import url_twin_sql

    twin = url_twin_sql("url")
    return f"""
WITH u AS (SELECT {SYNTH_URL_SQL} AS url FROM documents),
n AS (
  SELECT url, {twin['normalized']} AS normalized,
         {twin['registered_domain']} AS domain
  FROM u
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY domain ORDER BY md5(url), url) AS rn
  FROM n
)
SELECT domain, COUNT(*) AS n_pages,
       CAST(SUM((rn <= {URL_CAP})::BIGINT) AS BIGINT) AS n_kept,
       COUNT(DISTINCT normalized) AS n_normalized_distinct
FROM r GROUP BY domain ORDER BY domain
"""


@query(
    "url_curation_stats",
    oracle=_url_curation_oracle(),
    tags=("url", "curation", "dedup"),
)
def url_curation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.urls import normalize_url, per_domain_cap

    urls = (
        load_table(spark, sf_dir, "documents")
        .select(synth_url_col().alias("url"))
        .withColumn("normalized", normalize_url("url"))
    )
    capped = per_domain_cap(urls, "url", cap=URL_CAP)
    return (
        capped.groupBy(F.col("__domain").alias("domain"))
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
            F.countDistinct("normalized").alias("n_normalized_distinct"),
        )
        .orderBy("domain")
    )


# --------------------------------------------------------------------------
# robots.txt crawl policy (r11): the fetch-permission layer between URL
# curation and the frontier. One deterministic policy body governs
# every registered domain of the synth-URL corpus (anchored-wildcard
# disallows + a longer allow carve-out + a tracking-query ban — the
# C4-style polite-crawler shape); rows-only (the longest-match window
# over regex rule matches is not one SQL statement), with the pure-
# Python RFC 9309 evaluator as the pytest twin (tests/test_robots.py).
# --------------------------------------------------------------------------
ROBOTS_FIXTURE_BODY = """\
User-agent: *
Disallow: /Articles/*7$
Allow: /Articles/*77$
Disallow: /*?id=*
Crawl-delay: 1.5

User-agent: corpusbot
Allow: /
"""

#: DuckDB twin of ROBOTS_FIXTURE_BODY's agent-* decision, resolved at
#: authoring time (value-hash gates since r12 — the policy is a
#: compile-time CONSTANT, so its RFC 9309 §2.2.2 longest-match
#: resolution collapses to a fixed priority: Allow /Articles/*77$ is
#: 14 octets, Disallow /Articles/*7$ 13, Disallow /*?id=* 7 — a path
#: matching the allow is allowed outright, else any matching disallow
#: blocks it). The GENERIC evaluator (arbitrary policies) is twinned
#: by the independent pure-Python RFC oracle in tests/test_robots.py.
ROBOTS_FIXTURE_ALLOWED_SQL = (
    "(regexp_matches({p}, '^/Articles/.*77$')"
    " OR NOT (regexp_matches({p}, '^/Articles/.*7$')"
    r" OR regexp_matches({p}, '^/.*\?id=.*')))"
)

#: url → robots match input (path + query + fragment — everything after
#: the authority; '' → '/'), the same extraction robots_allowed performs.
URL_PATH_SQL = (
    "COALESCE(NULLIF(REGEXP_REPLACE({u},"
    " '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''), ''), '/')"
)


def _robots_policy_oracle() -> str:
    from ..operators.urls import url_twin_sql

    twin = url_twin_sql("url")
    allowed = ROBOTS_FIXTURE_ALLOWED_SQL.format(p="path")
    return f"""
WITH u AS (SELECT {SYNTH_URL_SQL} AS url FROM documents),
p AS (
  SELECT {twin['registered_domain']} AS domain,
         {URL_PATH_SQL.format(u='url')} AS path
  FROM u
)
SELECT domain, COUNT(*) AS n_urls,
       CAST(SUM(({allowed})::BIGINT) AS BIGINT) AS n_allowed
FROM p GROUP BY domain ORDER BY domain
"""


@query(
    "robots_policy_stats",
    oracle=_robots_policy_oracle(),
    tags=("url", "robots", "curation"),
)
def robots_policy_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.robots import parse_robots, robots_allowed
    from ..operators.urls import url_host, url_registered_domain

    urls = load_table(spark, sf_dir, "documents").select(
        synth_url_col().alias("url")
    )
    hosts = urls.select(url_host("url").alias("host")).distinct()
    rules = parse_robots(
        hosts.withColumn("body", F.lit(ROBOTS_FIXTURE_BODY))
    ).localCheckpoint()  # parsed once; reused by the per-URL match join
    decided = robots_allowed(urls, rules, agent="*")
    return (
        decided.groupBy(url_registered_domain("url").alias("domain"))
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.sum(F.col("allowed").cast("long")).alias("n_allowed"),
        )
        .orderBy("domain")
    )


def crawl_frontier(
    candidates: DataFrame,
    robots_rules: DataFrame | None = None,
    authority: DataFrame | None = None,
    agent: str = "*",
    cap: int = 100,
    url_col: str = "url",
    seen: DataFrame | None = None,
    robots_exempt: DataFrame | None = None,
) -> DataFrame:
    """The crawl-frontier scheduler composition (r11 capstone of the
    crawl side, the `curation_funnel` of fetching): candidate URLs →
    normalize → exact dedup on the canonical form → robots permission
    filter → domain-authority join → exact per-domain fetch cap.

    Inputs are the layer outputs this round wired: ``robots_rules`` =
    :func:`operators.robots.parse_robots` output (None → no policy),
    ``authority`` = a (domain, rank) frame, e.g.
    :func:`operators.linkgraph.pagerank` over
    :func:`operators.linkgraph.page_link_edges` (None → rank NULL).
    Returns one row per canonical URL: (url, domain, rank,
    crawl_delay, kept) with ``kept`` the cap verdict — callers order
    fetch queues by (rank desc, url) and space per-host fetches by
    ``crawl_delay`` (the robots politeness budget; NULL = no policy).

    ``seen`` (r11): the crawl ledger — a frame with a ``url`` column
    of already-fetched/scheduled CANONICAL urls (e.g. the previous
    rounds' frontier output). Candidates already in the ledger are
    anti-joined out BEFORE the cap, so the per-domain budget goes to
    genuinely new pages — the memory an iterative crawl loop needs
    (an anti join on the url key: shuffle- or broadcast-resolved by
    size, never collected).

    ``robots_exempt`` (r14): urls exempt from the robots PATH rules —
    the convention for sitemap files the host's own robots.txt
    declared (ADVICE r13: a host disallowing its sitemap's path would
    otherwise silently lose the discovery). Exempt urls still
    normalize, dedup, anti-join the ledger, rank, and consume cap
    slots; only the allow/disallow verdict is overridden.

    Scale shape: normalization/dedup are codegen + one hash groupBy;
    robots is the host equi-join + one window over matched rules;
    the authority join shuffles on domain (broadcast when small — AQE
    decides); the cap is the skew-hardened md5 ranking. No stage
    collects; every shuffle keys on url/host/domain."""
    from ..operators.robots import agent_crawl_delay, robots_allowed
    from ..operators.urls import normalize_url, per_domain_cap, url_host

    # materialize the canonical set ONCE: every downstream stage
    # (ledger anti-join, robots host+path expressions, the cap's two
    # window passes, the delay/authority joins) consumes it, and
    # Catalyst would otherwise re-inline the ~40-op normalization
    # chain into each consumer (compile-bound, measured 9 s → 2 s on
    # the gate corpus). A frontier IS a bounded schedule artifact —
    # storing it once is the operator's nature, not a cache trick.
    canon = (
        candidates.select(normalize_url(url_col).alias("url"))
        .filter(F.col("url") != "")
        .distinct()
        .localCheckpoint()
    )
    if seen is not None:
        canon = canon.join(
            seen.select(F.col("url")), "url", "left_anti"
        )
    delays = None
    if robots_rules is not None:
        decided = robots_allowed(canon, robots_rules, agent=agent)
        if robots_exempt is not None:
            # r14 (ADVICE r13): sitemap fetches DECLARED in robots.txt
            # are conventionally exempt from the host's own path rules
            # (a `Disallow: /maps` must not hide the sitemap the same
            # file just pointed at) — callers pass those urls here;
            # they still dedup, rank, and consume cap slots like every
            # other candidate. Canonical-form semi-join flag, never a
            # collect.
            exempt = robots_exempt.select(
                normalize_url("url").alias("url")
            ).distinct()
            decided = decided.join(
                exempt.withColumn("__exempt", F.lit(True)), "url", "left"
            ).withColumn(
                "allowed",
                F.col("allowed") | F.coalesce("__exempt", F.lit(False)),
            ).drop("__exempt")
        canon = decided.filter("allowed").drop("allowed")
        delays = agent_crawl_delay(robots_rules, agent=agent)
    capped = per_domain_cap(canon, "url", cap=cap).withColumnRenamed(
        "__domain", "domain"
    )
    if authority is not None:
        auth = authority.select(
            F.col("domain").alias("__adom"), F.col("rank")
        )
        capped = capped.join(
            auth, capped["domain"] == auth["__adom"], "left"
        ).drop("__adom")
    else:
        capped = capped.withColumn("rank", F.lit(None).cast("double"))
    if delays is not None:
        capped = capped.join(
            delays.select(
                F.col("host").alias("__dhost"), "crawl_delay"
            ),
            url_host(F.col("url")) == F.col("__dhost"),
            "left",
        ).drop("__dhost")
    else:
        capped = capped.withColumn(
            "crawl_delay", F.lit(None).cast("double")
        )
    return capped.select("url", "domain", "rank", "crawl_delay", "kept")


def _crawl_frontier_oracle() -> str:
    """Full DuckDB twin of the frontier capstone: canonicalize (the
    gated url_twin_sql normalization) → dedup → the authoring-time-
    resolved fixture policy on the canonical path → md5-ordered
    per-domain cap (chosen for exactly this cross-engine
    reproducibility) → per-domain rollup. crawl_delay is the fixture's
    constant 1.5 (every host carries the same body; agent * governs)."""
    from ..operators.urls import url_twin_sql

    twin = url_twin_sql("url")
    allowed = ROBOTS_FIXTURE_ALLOWED_SQL.format(p="path")
    return f"""
WITH u AS (SELECT {SYNTH_URL_SQL} AS url FROM documents),
c AS (
  SELECT DISTINCT {twin['normalized']} AS url FROM u
  WHERE {twin['normalized']} <> ''
),
p AS (
  SELECT url, {twin['registered_domain']} AS domain,
         {URL_PATH_SQL.format(u='url')} AS path
  FROM c
),
a AS (SELECT url, domain FROM p WHERE {allowed}),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY domain ORDER BY md5(url), url) AS rn
  FROM a
)
SELECT domain, COUNT(*) AS n_candidates,
       CAST(SUM((rn <= {URL_CAP})::BIGINT) AS BIGINT) AS n_scheduled,
       CAST(1.5 AS DOUBLE) AS crawl_delay
FROM r GROUP BY domain ORDER BY domain
"""


def _crawl_schedule_oracle() -> str:
    """DuckDB twin of the schedule rollup (r13, VERDICT item 3): the
    frontier oracle's kept set, re-slotted per HOST. Like the frontier
    oracle, the fixture policy's RESOLVED decisions are compile-time
    constants here: authority is absent so rank is uniformly NULL and
    the (rank desc, url) slot order collapses to url asc; every host
    declares the same 1.5 s crawl-delay. The generic evaluator stays
    pytest-twinned in tests/test_robots.py."""
    from ..operators.urls import url_twin_sql

    twin = url_twin_sql("url")
    allowed = ROBOTS_FIXTURE_ALLOWED_SQL.format(p="path")
    return f"""
WITH u AS (SELECT {SYNTH_URL_SQL} AS url FROM documents),
c AS (
  SELECT DISTINCT {twin['normalized']} AS url FROM u
  WHERE {twin['normalized']} <> ''
),
p AS (
  SELECT url, {twin['registered_domain']} AS domain,
         {twin['host']} AS host,
         {URL_PATH_SQL.format(u='url')} AS path
  FROM c
),
a AS (SELECT url, domain, host FROM p WHERE {allowed}),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY domain ORDER BY md5(url), url) AS rn
  FROM a
),
s AS (
  SELECT domain, host,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY url) AS slot
  FROM r WHERE rn <= {URL_CAP}
)
SELECT domain, COUNT(*) AS n_fetches,
       CAST(MAX(slot) AS BIGINT) AS max_slot,
       ROUND(CAST(MAX((slot - 1) * 1.5) AS DOUBLE), 6) AS makespan_s,
       CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts
FROM s GROUP BY domain ORDER BY domain
"""


def fetch_schedule(
    frontier: DataFrame,
    default_delay: float = 1.0,
    demote_col: str | None = None,
) -> DataFrame:
    """Frontier → time-ordered fetch plan (r12): the last step of the
    crawl loop — the scheduler that tells a fetcher WHEN each kept URL
    may be requested without violating per-host politeness. Kept rows
    get a per-HOST slot (authority-first: rank desc, url tiebreak) and
    ``fetch_offset_s`` = (slot − 1) × the host's robots crawl-delay
    (``default_delay`` when the host declares none) — consecutive
    fetches of one host are spaced exactly its declared budget apart,
    while different hosts run in parallel at offset 0.

    Scale shape: ONE window partitioned by host, and every host's
    partition is bounded by the per-domain fetch cap that produced the
    frontier (``kept`` rows per domain ≤ cap), so the window can never
    see a corpus-sized partition — the same boundedness argument as
    the robots rule window.

    ``demote_col`` (r13): an optional boolean frontier column sorted
    ASCENDING ahead of the rank — re-crawl candidates
    (:func:`recrawl_candidates`) ride the same schedule but take their
    host's LATER slots, so freshness work never delays fresh
    discoveries. The column passes through to the output."""
    from ..operators.urls import url_host

    order = [F.desc("rank"), F.col("url")]
    extra: list = []
    if demote_col is not None:
        order = [F.col(demote_col).cast("int").asc(), *order]
        extra = [demote_col]
    w = Window.partitionBy("__host").orderBy(*order)
    return (
        frontier.filter("kept")
        .withColumn("__host", url_host("url"))
        .withColumn("slot", F.row_number().over(w))
        .withColumn(
            "fetch_offset_s",
            (F.col("slot") - 1)
            * F.coalesce("crawl_delay", F.lit(float(default_delay))),
        )
        .select(
            "url",
            "domain",
            F.col("__host").alias("host"),
            "rank",
            "slot",
            "fetch_offset_s",
            *extra,
        )
    )


def recrawl_candidates(
    ledger: DataFrame,
    sitemap_entries: DataFrame | None = None,
    as_of: str | None = None,
    default_ttl_days: float = 30.0,
    domain_ttl: DataFrame | None = None,
) -> DataFrame:
    """(url, domain, reason, age_days) — ledger URLs due for a
    re-fetch (r13, verdict item 5): the freshness leg the
    exclude-forever ledger lacks. A scheduled URL re-enters the
    frontier when

    - ``'modified'``: a sitemap ``lastmod`` (sitemaps.org;
      :func:`operators.robots.parse_sitemaps` extracts it) is NEWER
      than the URL's ``scheduled_at`` — the explicit change signal; or
    - ``'stale'``: its age at ``as_of`` exceeds the domain's TTL
      (``default_ttl_days``, overridable per domain via a
      ``(domain, ttl_days)`` frame) — the no-signal fallback.

    ``ledger``: (url, scheduled_at) — the accumulated fetch schedule
    (timestamp-castable). An append-only ledger legally holds several
    rows per url (one per fetch round, including past recrawls); only
    the LATEST schedule counts — a url re-fetched yesterday must not
    look stale through last year's row, and a lastmod older than the
    latest fetch is no signal even if it post-dates an earlier one.
    ``as_of`` is REQUIRED and explicit (a
    timestamp literal): re-crawl decisions must be reproducible for
    cross-engine twins; pass the wall clock upstream if wanted.
    ``sitemap_entries``: (loc, lastmod) rows; locs are normalized here
    so protocol-noise variants still match the canonical ledger, and
    lastmod accepts both W3C datetimes and date-only forms (try_cast —
    unparseable values are no signal, never an error).

    Composition contract ("ranked below fresh"): union these urls into
    the frontier candidates, EXCLUDE them from the ``seen`` set passed
    to :func:`crawl_frontier` (they re-run the same robots + cap
    policy as everything else), and schedule with
    ``fetch_schedule(..., demote_col=...)`` so they take later slots —
    wired end-to-end in run_curation_pipeline.py."""
    from ..operators.urls import normalize_url, url_registered_domain

    if as_of is None:
        raise ValueError(
            "as_of is required (explicit clock — pass a timestamp "
            "literal; recrawl decisions must be reproducible)"
        )
    led = (
        ledger.select(
            "url",
            F.col("scheduled_at").try_cast("timestamp").alias("__sched"),
        )
        .filter(F.col("__sched").isNotNull())
        .groupBy("url")
        .agg(F.max("__sched").alias("__sched"))
    )
    asof = F.lit(as_of).try_cast("timestamp")
    if sitemap_entries is not None:
        lm = (
            sitemap_entries.select(
                normalize_url(F.col("loc")).alias("url"),
                F.col("lastmod").try_cast("timestamp").alias("__lm"),
            )
            .filter(F.col("__lm").isNotNull())
            .groupBy("url")
            .agg(F.max("__lm").alias("__lm"))
        )
        led = led.join(lm, "url", "left")
    else:
        led = led.withColumn("__lm", F.lit(None).cast("timestamp"))
    led = led.withColumn(
        "domain", url_registered_domain(F.col("url"))
    ).withColumn(
        "age_days",
        (F.unix_timestamp(asof) - F.unix_timestamp("__sched"))
        / F.lit(86400.0),
    )
    if domain_ttl is not None:
        ttl = domain_ttl.select(
            F.col("domain").alias("__tdom"),
            F.col("ttl_days").cast("double").alias("__ttl"),
        )
        led = led.join(
            ttl, led["domain"] == ttl["__tdom"], "left"
        ).drop("__tdom")
    else:
        led = led.withColumn("__ttl", F.lit(None).cast("double"))
    ttl_days = F.coalesce("__ttl", F.lit(float(default_ttl_days)))
    modified = F.col("__lm").isNotNull() & (F.col("__lm") > F.col("__sched"))
    stale = F.col("age_days") > ttl_days
    return (
        led.withColumn(
            "reason",
            F.when(modified, F.lit("modified"))
            .when(stale, F.lit("stale")),
        )
        .filter(F.col("reason").isNotNull())
        .select("url", "domain", "reason", "age_days")
    )


@query(
    "crawl_schedule_stats",
    oracle=_crawl_schedule_oracle(),
    tags=("url", "robots", "frontier", "schedule"),
)
def crawl_schedule_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scheduled fetch plan over the same fixture pipeline as
    ``crawl_frontier_stats``, rolled up per domain: slots spent, the
    host-parallel makespan (max fetch offset) and the politeness
    budget honored. Value-hash gate since r13 (r12 verdict item 3):
    deterministic by construction — md5-ordered cap,
    authoring-time-resolved robots policy, (rank desc, url) slot
    tiebreak — the same property that promoted the frontier gate; the
    Python twin extends the frontier twin with the same slotting in
    tests/test_robots.py."""
    from ..operators.robots import parse_robots
    from ..operators.urls import url_host

    urls = load_table(spark, sf_dir, "documents").select(
        synth_url_col().alias("url")
    )
    hosts = urls.select(url_host("url").alias("host")).distinct()
    rules = parse_robots(
        hosts.withColumn("body", F.lit(ROBOTS_FIXTURE_BODY))
    ).localCheckpoint()
    sched = fetch_schedule(crawl_frontier(urls, rules, cap=URL_CAP))
    return (
        sched.groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_fetches"),
            F.max("slot").cast("long").alias("max_slot"),
            F.round(F.max("fetch_offset_s"), 6).alias("makespan_s"),
            F.count_distinct("host").alias("n_hosts"),
        )
        .orderBy("domain")
    )


# --------------------------------------------------------------------------
# Recrawl scheduling (r13, verdict item 5): the ledger excludes seen
# URLs forever; this is the freshness leg re-admitting them by change
# signal (sitemap lastmod > scheduled_at) or age (> per-domain TTL).
# The fixture derives everything from md5(url) so both the query and
# its Python twin (tests/test_robots.py) resolve identical branches:
# scheduled_at = BASE + (md5 % 60) days; as_of = BASE + 60 days
# (age 1..60, TTL 30 → stale iff offset < 30); a second md5 digit
# picks the sitemap branch — bumped lastmod (modified), older lastmod
# (NO signal — unchanged pages must not re-enter), or no entry.
# Rows-only (the operator is two joins deep over a synthetic ledger).
# --------------------------------------------------------------------------
RECRAWL_BASE_TS = "2024-01-01 00:00:00"
RECRAWL_AS_OF = "2024-03-01 00:00:00"  # BASE + 60 days
RECRAWL_TTL_DAYS = 30.0


@query("crawl_recrawl_stats", tags=("url", "frontier", "recrawl"))
def crawl_recrawl_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.urls import normalize_url

    canon = (
        load_table(spark, sf_dir, "documents")
        .select(normalize_url(synth_url_col()).alias("url"))
        .filter(F.col("url") != "")
        .distinct()
    )
    h = F.conv(F.substring(F.md5("url"), 1, 6), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5("url"), 7, 6), 16, 10).cast("long")
    base = F.lit(RECRAWL_BASE_TS).cast("timestamp")
    sched = base + F.make_interval(days=F.pmod(h, F.lit(60)).cast("int"))
    ledger = canon.select(
        "url", sched.alias("scheduled_at"), F.pmod(h2, F.lit(3)).alias("__b")
    ).localCheckpoint()  # the url-normalization chain feeds 3 stages
    lastmod = (
        F.when(F.col("__b") == 0, F.col("scheduled_at")
               + F.make_interval(days=F.lit(1)))
        .when(F.col("__b") == 1, F.col("scheduled_at")
              - F.make_interval(days=F.lit(1)))
    )
    sitemap_entries = (
        ledger.select(
            F.col("url").alias("loc"), lastmod.cast("string").alias("lastmod")
        )
        .filter(F.col("lastmod").isNotNull())
    )
    recr = recrawl_candidates(
        ledger.select("url", "scheduled_at"),
        sitemap_entries,
        as_of=RECRAWL_AS_OF,
        default_ttl_days=RECRAWL_TTL_DAYS,
    )
    return (
        recr.groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_due"),
            F.sum((F.col("reason") == "modified").cast("long")).alias(
                "n_modified"
            ),
            F.sum((F.col("reason") == "stale").cast("long")).alias(
                "n_stale"
            ),
            F.round(F.max("age_days"), 6).alias("max_age_days"),
        )
        .orderBy("domain")
    )


@query(
    "crawl_frontier_stats",
    oracle=_crawl_frontier_oracle(),
    tags=("url", "robots", "curation", "frontier"),
)
def crawl_frontier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frontier capstone, driver-visible (r11): synth candidate
    URLs → normalize/dedup → the robots fixture policy → per-domain
    cap, rolled up per domain (n_candidates after policy, n_scheduled,
    politeness budget). Authority is exercised by
    ``page_linkgraph_suite`` and the composition pytest — kept out
    here so the twin stays exactly reproducible (md5-order cap +
    authoring-time-resolved robots decisions). Value-hash gate since
    r12 (r11 verdict item 1): deterministic by construction — the same
    property that promoted url_curation_stats; the independent
    Python/DuckDB twin stays in tests/test_robots.py."""
    from ..operators.robots import parse_robots
    from ..operators.urls import url_host

    urls = load_table(spark, sf_dir, "documents").select(
        synth_url_col().alias("url")
    )
    hosts = urls.select(url_host("url").alias("host")).distinct()
    rules = parse_robots(
        hosts.withColumn("body", F.lit(ROBOTS_FIXTURE_BODY))
    ).localCheckpoint()
    frontier = crawl_frontier(urls, rules, cap=URL_CAP)
    return (
        frontier.groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(F.col("kept").cast("long")).alias("n_scheduled"),
            F.max("crawl_delay").alias("crawl_delay"),
        )
        .orderBy("domain")
    )


# --------------------------------------------------------------------------
# Repetition audit (r12): BOTH halves of Gopher Table A1's repetition
# rules over the corpus — the line-level family (repetition_signals)
# and the n-gram family (ngram_repetition_signals: top-{2,3}-gram and
# duplicate-{5,10}-gram character fractions) — rolled up per source.
# Rows-only (per-row struct-state array folds are not one SQL
# statement); the independent Counter-based Python oracle runs in
# tests/test_operators.py (operator) and the per-source rollup twin in
# tests/test_operators.py::test_text_repetition_stats_vs_python_twin.
# --------------------------------------------------------------------------
@query("text_repetition_stats", tags=("text", "quality", "gopher"))
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sig = tx.ngram_repetition_signals(
        tx.repetition_signals(docs), top_ns=(2, 3), dup_ns=(5, 10)
    )
    return (
        sig.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("dup_line_frac"), 9).alias("avg_dup_line_frac"),
            F.round(F.avg("top_2_gram_char_frac"), 9).alias("avg_top2_frac"),
            F.round(F.avg("top_3_gram_char_frac"), 9).alias("avg_top3_frac"),
            F.round(F.avg("dup_5_gram_char_frac"), 9).alias("avg_dup5_frac"),
            F.round(F.avg("dup_10_gram_char_frac"), 9).alias(
                "avg_dup10_frac"
            ),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Anchor-text corpus (r12): the TEXT other pages use when linking a
# target is an independent description/quality signal for that target
# (the classic anchor-file idea; search and crawl-curation pipelines
# mine it corpus-wide to describe pages their own content doesn't).
# Pages are the synth-URL fixture with two anchors per document whose
# bodies carry markup + entity traps; extraction is the ONE-pattern
# double regexp_extract_all (operators/text.html_anchor_texts),
# cleanup is codegen, the rollup groups by TARGET registered domain.
# Rows-only (arrays_zip of two extract_all passes + the cleanup
# transform is not one SQL statement); the Python twin rebuilds pages
# from SYNTH_URL_SQL and re-extracts with the same pattern in
# tests/test_linkgraph.py.
# --------------------------------------------------------------------------
@query("anchor_text_stats", tags=("url", "html", "linkgraph", "text"))
def anchor_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import html_anchor_texts, resolve_link
    from ..operators.urls import url_registered_domain

    docs = load_table(spark, sf_dir, "documents")
    pages = docs.select(
        synth_url_col().alias("url"),
        F.concat(
            F.lit('<html><body><a href="'),
            synth_url_col(F.col("doc_id") + 1),
            F.lit('">read &amp; <b>cite</b> doc '),
            (F.col("doc_id") % 7).cast("string"),
            F.lit("</a><p>body</p><a href='"),
            synth_url_col(F.col("doc_id") * 2 + 1),
            F.lit("'>topic  "),
            (F.col("doc_id") % 3).cast("string"),
            F.lit("\n</a></body></html>"),
        ).alias("html"),
    )
    pairs = pages.select(
        F.col("url").alias("page"),
        F.explode(html_anchor_texts("html")).alias("a"),
    ).select(
        "page",
        F.col("a.href").alias("href"),
        F.col("a.text").alias("text"),
    )
    resolved = pairs.select(
        url_registered_domain(
            resolve_link(F.col("page"), F.col("href"))
        ).alias("target_domain"),
        "text",
    ).filter(F.col("target_domain") != "")
    return (
        resolved.groupBy("target_domain")
        .agg(
            F.count(F.lit(1)).alias("n_anchors"),
            F.count_distinct("text").alias("n_distinct_texts"),
            F.min("text").alias("min_text"),
            F.max("text").alias("max_text"),
        )
        .orderBy("target_domain")
    )


# --------------------------------------------------------------------------
# C4 cleaning audit (r13): the third published quality family
# (Raffel et al. 2020, arXiv:1910.10683 §2.2 — terminal-punctuation
# line filter, min-words-per-line, javascript/policy lines, lorem-
# ipsum / brace / min-sentence pages) next to the Gopher rules and the
# repetition signals. The corpus text carries no newlines or
# punctuation, so the query builds a line-structured page per document
# from deterministic doc_id arms (the anchor/robots fixture
# precedent): every rule branch occurs, and the exact Python twin
# re-derives every page in tests/test_operators.py. Rows-only (nested
# line-array lambdas are not one SQL statement).
# --------------------------------------------------------------------------
# --------------------------------------------------------------------------
# Best-fit packing audit (r13): BFD bin packing (Ding et al. 2024 —
# whole documents per training sequence) head-to-head against the
# GPT-style stream chunker on the same corpus and capacity. The row
# pair carries the paper's headline numbers: how many documents each
# packer SPLITS (stream: every block-boundary crossing; bestfit: only
# docs exceeding the capacity) and the capacity fill each achieves.
# Rows-only (sequential bin packing is not one SQL statement); the
# Python twin re-runs a NAIVE independent BFD per md5 packer group in
# tests/test_operators.py.
# --------------------------------------------------------------------------
@query("pack_bestfit_stats", tags=("text", "packing", "bestfit"))
def pack_bestfit_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    L = 128
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bf = tx.pack_bestfit(docs, max_tokens=L, packers=8)
    st = tx.pack_sequences(docs, max_tokens=L)

    def row(kind: str, m: DataFrame, bin_col: str) -> DataFrame:
        per = m.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("k"), F.sum("n_tokens").alias("t")
        )
        a = per.agg(
            F.sum("k").alias("n_items"),
            F.sum("t").alias("total_tokens"),
            F.sum((F.col("k") > 1).cast("long")).alias("n_split_docs"),
        )
        b = m.agg(F.count_distinct(bin_col).alias("n_bins"))
        return a.crossJoin(F.broadcast(b)).select(
            F.lit(kind).alias("packer"),
            "n_items",
            "n_bins",
            "total_tokens",
            "n_split_docs",
            F.round(
                F.col("total_tokens") / (F.col("n_bins") * F.lit(L)), 9
            ).alias("fill_frac"),
        )

    return (
        row("bestfit", bf, "bin_id")
        .unionByName(row("stream", st, "block_id"))
        .orderBy("packer")
    )


@query("text_c4_clean_stats", tags=("text", "quality", "c4"))
def text_c4_clean_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    punct = F.element_at(
        F.array(F.lit("."), F.lit("!"), F.lit("?"), F.lit('"')),
        (did % 4 + 1).cast("int"),
    )
    page = F.concat_ws(
        "\n",
        # a: always kept (>=3 words, ends in a terminal mark)
        F.concat(
            F.substring("text", 1, 40), F.lit(" end of intro"), punct
        ),
        # b: dropped — under min_words_per_line
        F.lit("too short."),
        # c: javascript arm dropped, else kept
        F.when(
            did % 5 == 0,
            F.lit("Please enable javascript to continue browsing."),
        ).otherwise(F.lit("A perfectly normal sentence for the corpus.")),
        # d: policy-substring arm dropped, else kept
        F.when(
            did % 7 == 0, F.lit("See our privacy policy for all details.")
        ).otherwise(
            F.concat(
                F.lit("Another regular sentence number "),
                s(did % 3),
                F.lit(" here."),
            )
        ),
        # e: dropped — no terminal mark
        F.lit("trailing line with no terminal mark"),
        # f/g: kept as LINES but fail the PAGE (lorem ipsum / brace) —
        # concat_ws skips the NULL arms
        F.when(did % 11 == 0, F.lit("About lorem ipsum placeholder text.")),
        F.when(did % 13 == 0, F.lit("A brace { appears mid page here.")),
    )
    cleaned = tx.c4_clean(
        docs.select("doc_id", "source", page.alias("page")),
        text_col="page",
        min_sentences=3,
    )
    return (
        cleaned.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("c4_pass").cast("long")).alias("n_pass"),
            F.sum("n_kept_lines").alias("total_kept_lines"),
            F.sum("n_sentences").alias("total_sentences"),
            F.sum((~F.col("lorem_ipsum_ok")).cast("long")).alias("n_lorem"),
            F.sum((~F.col("brace_ok")).cast("long")).alias("n_brace"),
            F.round(
                F.avg(F.col("n_kept_lines") / F.col("n_lines")), 9
            ).alias("avg_kept_frac"),
        )
        .orderBy("source")
    )


#: the three-sentence span planted into every doc_id % 9 == 0 document
#: by text_c4_span_dedup_stats — its keep-one survivor is the query's
#: own evidence (the r13 planted-sentinel style)
C4_SPAN_PLANTED = (
    "Planted alpha sentence for the span. "
    "Planted beta sentence follows it. "
    "Planted gamma sentence closes the span."
)


@query("text_c4_span_dedup_stats", tags=("text", "dedup", "c4"))
def text_c4_span_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4's three-sentence-span rule over a sentinel-planted corpus
    (r14; rows-only — the keep-one global min has no tractable SQL
    twin; tests/test_operators.py carries the independent pure-Python
    mirror and this query carries its OWN evidence): every
    doc_id % 9 == 0 document re-ships one constant three-sentence span
    at its head, every document otherwise holds sentences unique to its
    id — so the operator must drop EXACTLY the planted copies minus the
    single global keeper, and ``planted_survivors`` must sum to 1
    across the result."""
    from ..operators.dedup import c4_sentence_span_dedup

    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    page = F.concat_ws(
        " ",
        F.when(did % 9 == 0, F.lit(C4_SPAN_PLANTED)),
        F.concat(F.lit("Document "), s(did), F.lit(" opens uniquely.")),
        F.concat(F.lit("Body line "), s(did), F.lit(" stays its own.")),
        F.concat(F.lit("Ending "), s(did), F.lit(" closes the page.")),
    )
    deduped = c4_sentence_span_dedup(
        docs.select("doc_id", page.alias("page")), text_col="page"
    )
    return (
        deduped.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_sentences_kept").alias("total_kept"),
            F.sum("n_sentences_dropped").alias("total_dropped"),
            F.sum(
                (F.col("n_sentences_dropped") > 0).cast("long")
            ).alias("n_docs_lost_sentences"),
            F.sum(
                F.col("page")
                .contains("Planted alpha sentence")
                .cast("long")
            ).alias("planted_survivors"),
        )
        .orderBy("source")
    )


#: HTML page template shared by the warc_html_extract query and its
#: DuckDB twin (tests/test_html.py) — head (title+style) to drop, a
#: comment, the escaped body text, a script with '<'/'&' traps that
#: must vanish BEFORE tag stripping.
WARC_HTML_PRE_TITLE = "<html><head><title>doc "
WARC_HTML_POST_TITLE = (
    "</title><style>p{margin:0}</style></head>\n"
    "<body><!-- crawl fixture --><p>"
)
WARC_HTML_SUFFIX = "</p><script>var x = 1<2 && 3>2;</script></body></html>"


@query("warc_html_extract", tags=("warc", "html", "text", "ingestion"))
def warc_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl → curation, the missing middle (r10): documents rendered
    as spec-shaped HTML pages, encoded into WARC shards, read back as
    records, and run through the codegen html_to_text chain. The
    rollup pins the ROUNDTRIP property per language — extracted text
    must equal the whitespace-normalized source for every page (head/
    script/comment content dropped, entities decoded, title recovered
    separately) — so n_roundtrip_exact == n_docs is the correctness
    claim, checked cross-engine by the DuckDB twin in
    tests/test_html.py."""
    from ..operators.text import (
        html_escape,
        html_title,
        html_to_text,
        normalize_ws,
    )
    from ..sources.warc import encode_warc_shards, split_warc_records

    docs = load_table(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(F.lit("https://corpus.example/page/"), F.col("doc_id")).alias(
            "url"
        ),
        F.lit(200).alias("status"),
        F.encode(
            F.concat(
                F.lit(WARC_HTML_PRE_TITLE),
                F.col("doc_id"),
                F.lit(WARC_HTML_POST_TITLE),
                html_escape(F.col("text")),
                F.lit(WARC_HTML_SUFFIX),
            ),
            "UTF-8",
        ).alias("body"),
        (F.col("doc_id") % WARC_N_SHARDS).alias("shard_id"),
    )
    recs = split_warc_records(encode_warc_shards(pages))
    extracted = html_to_text(
        recs.select("url", F.decode("body", "UTF-8").alias("html")),
        "html",
        "extracted",
    ).select("url", "extracted", html_title(F.col("html")).alias("title"))
    source = docs.select(
        F.concat(F.lit("https://corpus.example/page/"), F.col("doc_id")).alias(
            "url"
        ),
        "lang",
        F.concat(F.lit("doc "), F.col("doc_id")).alias("want_title"),
        normalize_ws(F.col("text")).alias("norm_text"),
    )
    return (
        extracted.join(source, "url")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("extracted") == F.col("norm_text")).cast("long")).alias(
                "n_roundtrip_exact"
            ),
            F.sum((F.col("title") == F.col("want_title")).cast("long")).alias(
                "n_title_ok"
            ),
            F.sum(F.length("extracted")).alias("chars_extracted"),
        )
        .orderBy("lang")
    )


@query("warc_ingest_stats", tags=("warc", "ingestion", "S-source"))
def warc_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.warc import encode_warc_shards, split_warc_records

    docs = load_table(spark, sf_dir, "documents").select(
        F.concat(F.lit("https://corpus.example/doc/"), F.col("doc_id")).alias("url"),
        F.when(F.col("doc_id") % WARC_STATUS_MOD == 0, F.lit(404))
        .otherwise(F.lit(200))
        .alias("status"),
        F.encode("text", "UTF-8").alias("body"),
        (F.col("doc_id") % WARC_N_SHARDS).alias("shard_id"),
    )
    recs = split_warc_records(encode_warc_shards(docs))
    return (
        recs.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.sum(F.length("body")).alias("total_body_bytes"),
            F.countDistinct("shard").alias("n_shards"),
            F.sum(F.col("error").isNotNull().cast("long")).alias("n_quarantined"),
        )
        .orderBy("status")
    )


# --------------------------------------------------------------------------
# Domain link graph (r11 — wires operators/linkgraph.py): the crawl-
# frontier authority signal that feeds the URL-curation layer at
# production scale (Page et al. 1999; frontier schedulers rank domains
# by link authority before spending fetch budget). Edges are derived
# deterministically from the SAME synth-URL fixture the curation query
# uses: each document links its own registered domain to the domain of
# doc_id+1 (the DuckDB/numpy twin in tests/test_linkgraph.py rebuilds
# the identical edge list by re-aliasing doc_id in a subquery). Fixed
# iteration count (tol=0) so the rank vector is deterministic across
# engines to summation-order noise; rows-only here (rank via an
# iterative driver loop is not single-statement SQL), with the exact
# power-iteration oracle in pytest at 1e-9.
# --------------------------------------------------------------------------
PAGERANK_ITERS = 20
PAGERANK_DAMPING = 0.85


@query("url_pagerank_stats", tags=("url", "linkgraph", "curation"))
def url_pagerank_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.linkgraph import pagerank
    from ..operators.urls import url_registered_domain

    docs = load_table(spark, sf_dir, "documents")
    # one doc = one (src, dst) row; materialize ONCE (localCheckpoint)
    # so the URL-expression tree — codegen-compile-bound, not row-bound
    # — is compiled a single time for pagerank + both degree rollups +
    # the page count, instead of once per consumer
    edges = docs.select(
        url_registered_domain(synth_url_col()).alias("src"),
        url_registered_domain(synth_url_col(F.col("doc_id") + 1)).alias("dst"),
    ).localCheckpoint()
    pr = pagerank(
        edges,
        damping=PAGERANK_DAMPING,
        max_iter=PAGERANK_ITERS,
        tol=0.0,
    ).withColumnRenamed("node", "domain")
    dedges = edges.filter(F.col("src") != F.col("dst")).distinct()
    outd = dedges.groupBy(F.col("src").alias("domain")).agg(
        F.count(F.lit(1)).alias("n_out_domains")
    )
    ind = dedges.groupBy(F.col("dst").alias("domain")).agg(
        F.count(F.lit(1)).alias("n_in_domains")
    )
    pages = edges.groupBy(F.col("src").alias("domain")).agg(
        F.count(F.lit(1)).alias("n_pages")
    )
    return (
        pr.join(outd, "domain", "left")
        .join(ind, "domain", "left")
        .join(pages, "domain", "left")
        .select(
            "domain",
            F.round("rank", 9).alias("rank"),
            F.coalesce("n_out_domains", F.lit(0)).alias("n_out_domains"),
            F.coalesce("n_in_domains", F.lit(0)).alias("n_in_domains"),
            F.coalesce("n_pages", F.lit(0)).alias("n_pages"),
        )
        .orderBy(F.desc("rank"), "domain")
    )


# --------------------------------------------------------------------------
# Real-HTML link-graph composition (r11): documents rendered as pages
# whose anchors point at the synth URLs of doc_id+1 and 2·doc_id+1 —
# page_link_edges extracts + absolutizes + projects to WEIGHTED
# registered-domain edges, weighted PageRank and HITS rank them, one
# joined rollup. Rows-only (iterative driver loops); the full
# numpy twin — same hrefs rebuilt in DuckDB, numpy weighted-power-
# iteration + numpy HITS — is tests/test_linkgraph.py.
# r12 (r11 verdict item 4): the suite also drives the TrustRank path —
# pagerank(teleport=...) seeded UNIFORMLY on the TRUST_SEED_DOMAINS
# lexicographically-first domains (Gyöngyi et al. 2004 use a uniform
# jump over the vetted good set; lexicographic selection makes the
# seed frame deterministic and twin-rebuildable) — as the trust_rank
# column. The synth graph has dangling domains with zero seed mass,
# so this registered query also exercises the r12 structural-dangling
# fix every round.
# --------------------------------------------------------------------------
LINKGRAPH_SUITE_ITERS = 10
TRUST_SEED_DOMAINS = 2


@query("page_linkgraph_suite", tags=("url", "linkgraph", "html", "curation"))
def page_linkgraph_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.linkgraph import hits, page_link_edges, pagerank_multi

    docs = load_table(spark, sf_dir, "documents")
    pages = docs.select(
        synth_url_col().alias("url"),
        F.concat(
            F.lit('<html><body><a href="'),
            synth_url_col(F.col("doc_id") + 1),
            F.lit('">a</a><p>text</p><a href=\''),
            synth_url_col(F.col("doc_id") * 2 + 1),
            F.lit("'>b</a></body></html>"),
        ).alias("html"),
    )
    # two iterative consumers — materialize the tiny domain-edge
    # frame once (the url_pagerank_stats precedent)
    edges = page_link_edges(pages).localCheckpoint()
    # trusted set: the TRUST_SEED_DOMAINS lexicographically-first
    # domains, uniform seed mass — a bounded frame by construction
    # (LIMIT k), never collected
    trusted = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .orderBy("node")
        .limit(TRUST_SEED_DOMAINS)
        .withColumn("seed", F.lit(1.0))
    )
    # uniform + TrustRank share ONE power-iteration loop (r12,
    # pagerank_multi — the batch-PPR shape): per-column results are
    # exactly the two sequential pagerank() calls, pinned by pytest
    pr = pagerank_multi(
        edges,
        {"rank": None, "trust_rank": trusted},
        weight="n_links",
        damping=PAGERANK_DAMPING,
        max_iter=LINKGRAPH_SUITE_ITERS,
    ).withColumnRenamed("node", "domain")
    ha = hits(
        edges, weight="n_links", max_iter=LINKGRAPH_SUITE_ITERS
    ).withColumnRenamed("node", "domain")
    return (
        pr.join(ha, "domain", "full")
        .select(
            "domain",
            F.round("rank", 9).alias("rank"),
            F.round("hub", 9).alias("hub"),
            F.round("authority", 9).alias("authority"),
            F.round("trust_rank", 9).alias("trust_rank"),
        )
        .orderBy(F.desc("rank"), "domain")
    )
