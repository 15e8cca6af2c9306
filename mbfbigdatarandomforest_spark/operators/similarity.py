"""Similarity search over embedding columns (north-star extension).

- ``cosine_topk``      : exact brute-force top-k — the correctness
                         baseline. Dot products via higher-order array
                         functions (JVM codegen, no Python). Cost O(n·q);
                         fine when the query set is small and broadcast.
- ``lsh_topk``         : BucketedRandomProjectionLSH approximate kNN —
                         the 100 TB path (probe only colliding buckets).

Embeddings are ``array<float>`` columns; math is done in double on both
engines so results are oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, one narrow pass computes all similarities, per-query window
    takes top-k. Returns (query_id, neighbor_id, cosine_sim)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (_norm(F.col("q_vec")) * _norm(F.col("c_vec")))
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine_sim", 6).alias("cosine_sim"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def cosine_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact all-pairs baseline).

    O(n²) dot products — the correctness oracle for LSH-based dedup at
    test scale. At 100 TB use ``lsh_topk``/bucketed ANN for candidate
    generation and this only within buckets. Norms are computed once per
    row before the join (not per pair)."""
    normed = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("nrm"),
    )
    a = normed.select(
        F.col("id").alias("id_a"), F.col("v").alias("v_a"), F.col("nrm").alias("n_a")
    )
    b = normed.select(
        F.col("id").alias("id_b"), F.col("v").alias("v_b"), F.col("nrm").alias("n_b")
    )
    pairs = a.join(broadcast(b), F.col("id_a") < F.col("id_b"))
    sim_col = _dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b"))
    return (
        pairs.select("id_a", "id_b", F.round(sim_col, 6).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def ann_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.4,
    n_clusters: int = 16,
    n_probe: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    kmeans_max_iter: int = 20,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via IVF candidates + exact
    verify — the 100 TB path (the all-pairs ``cosine_dup_pairs`` is the
    test-scale oracle only).

    Candidate generation is ASYMMETRIC multi-probe: the index side
    holds each vector in its single home cell; the probe side visits
    the ``n_probe`` nearest centroids. A pair is a candidate when
    either member's probe list covers the other's home cell, so the
    candidate count is ≈(n_probe/n_clusters)·n²/2 — linear in n_probe,
    unlike symmetric co-probing whose cost grows with n_probe² and can
    exceed brute force. Candidates are deduplicated as bare id pairs
    BEFORE the vectors are joined back for the exact cosine test (the
    wide arrays never ride through the candidate shuffle). Emitted
    pairs are exact; only recall is approximate — raise ``n_probe`` to
    trade cost for recall. Centroids are tiny and broadcast. Output
    matches ``cosine_dup_pairs``: (id_a, id_b, cosine_sim ≥ threshold)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # single-file parquet yields 1-3 partitions — widen so the dot
    # products and KMeans passes parallelize. FIXED partition count,
    # NOT defaultParallelism: k-means|| initialization samples by
    # partition, so the centroid set (and therefore candidate recall)
    # must not depend on how many cores the session happens to have.
    if corpus.rdd.getNumPartitions() < 16:
        corpus = corpus.repartition(16)
    corp = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        array_to_vector(F.col(vec_col)).alias("features"),
    )
    # candidate cells don't need fully-converged centroids — callers
    # may cap the iteration count (each KMeans iteration is a scheduled
    # job; at test scale scheduling dominates, at 100 TB the passes do),
    # at the price of re-checking recall for their corpus
    km = KMeans(
        k=n_clusters, seed=seed, maxIter=kmeans_max_iter,
        featuresCol="features", predictionCol="__c",
    )
    model = km.fit(corp)
    centroids = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    cent_df = corpus.sparkSession.createDataFrame(centroids, ["cluster", "centroid"])

    # one centroid-similarity pass feeds BOTH the home assignment
    # (rank 1) and the probe lists (rank ≤ n_probe); cached because the
    # candidate join consumes it twice
    normed = corp.select("id", "v", _norm(F.col("v")).alias("nrm"))
    ranked = (
        normed.select("id", "v", "nrm")
        .crossJoin(broadcast(cent_df))
        .select(
            "id",
            "cluster",
            (
                _dot(F.col("v"), F.col("centroid"))
                / (F.col("nrm") * _norm(F.col("centroid")))
            ).alias("__sim"),
        )
        .withColumn(
            "__r",
            F.row_number().over(
                Window.partitionBy("id").orderBy(F.desc("__sim"), F.asc("cluster"))
            ),
        )
        .filter(F.col("__r") <= n_probe)
        .select("id", "cluster", "__r")
        .cache()
    )
    home = ranked.filter(F.col("__r") == 1).select(
        F.col("id").alias("id_h"), "cluster"
    )
    probes = ranked.select(F.col("id").alias("id_p"), "cluster")
    # unordered candidate ids only — wide vector columns join AFTER dedupe
    cand = (
        probes.join(home, "cluster")
        .filter(F.col("id_p") != F.col("id_h"))
        .select(
            F.least("id_p", "id_h").alias("id_a"),
            F.greatest("id_p", "id_h").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    va = normed.select(
        F.col("id").alias("id_a"), F.col("v").alias("v_a"), F.col("nrm").alias("n_a")
    )
    vb = normed.select(
        F.col("id").alias("id_b"), F.col("v").alias("v_b"), F.col("nrm").alias("n_b")
    )
    sim_col = _dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", F.round(sim_col, 6).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """IVF-style approximate kNN: KMeans-partition the corpus, probe
    only the ``n_probe`` nearest centroids per query.

    The 100 TB path for cosine search: candidate generation touches
    ~n_probe/n_clusters of the corpus. Centroids are tiny and broadcast
    with the query set; assignment and scoring are codegen'd array
    expressions. Returns (query_id, neighbor_id, cosine_sim, rank)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    corp = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        array_to_vector(F.col(vec_col)).alias("features"),
    )
    km = KMeans(k=n_clusters, seed=seed, featuresCol="features", predictionCol="cluster")
    model = km.fit(corp)
    assigned = model.transform(corp).select("neighbor_id", "c_vec", "cluster")

    centroids = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(centroids, ["cluster", "centroid"])

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    # rank centroids per query, keep n_probe nearest (by cosine)
    qc = q.crossJoin(broadcast(cent_df)).select(
        "query_id",
        "q_vec",
        "cluster",
        (
            _dot(F.col("q_vec"), F.col("centroid"))
            / (_norm(F.col("q_vec")) * _norm(F.col("centroid")))
        ).alias("c_sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("c_sim"), F.asc("cluster"))
    probes = (
        qc.withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= n_probe)
        .select("query_id", "q_vec", "cluster")
    )
    scored = (
        assigned.join(broadcast(probes), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (_norm(F.col("q_vec")) * _norm(F.col("c_vec")))
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine_sim", 6).alias("cosine_sim"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_length: float = 2.0,
    num_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate kNN via random-projection LSH (Euclidean buckets).
    The scale path: candidate generation touches only colliding buckets.
    Returns (query_id, neighbor_id, eucl_dist, rank)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(
        F.col(id_col).alias("id"), array_to_vector(F.col(vec_col)).alias("features")
    )
    q = queries.select(
        F.col(id_col).alias("id"), array_to_vector(F.col(vec_col)).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_tables,
        seed=seed,
    )
    model = lsh.fit(c)
    joined = model.approxSimilarityJoin(q, c, float("inf"), distCol="eucl_dist")
    pairs = joined.filter(F.col("datasetA.id") != F.col("datasetB.id")).select(
        F.col("datasetA.id").alias("query_id"),
        F.col("datasetB.id").alias("neighbor_id"),
        "eucl_dist",
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("eucl_dist"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("eucl_dist", 6).alias("eucl_dist"),
            F.col("rank").cast("long").alias("rank"),
        )
    )
