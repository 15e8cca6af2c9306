"""Operator-level unit tests (SURVEY.md §5.2.1) — tiny hand-written
frames, exact expected outputs, plus pure-Python oracles for the
hash/LSH operators the DuckDB gate can't express.
"""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from mbfbigdatarandomforest_spark.functions.strings import first_token, token_at
from mbfbigdatarandomforest_spark.operators.cleaning import (
    collapse_rare_levels,
    drop_high_na_columns,
    empty_to_null,
    na_share,
    null_keeping_filter,
)
from mbfbigdatarandomforest_spark.operators import dedup as dd
from mbfbigdatarandomforest_spark.operators import similarity as sim
from mbfbigdatarandomforest_spark.operators import text as tx
from mbfbigdatarandomforest_spark.operators.geo import (
    parse_wkt_polygon,
    PolygonIndex,
)


def test_null_keeping_filter_keeps_nulls(spark):
    """P5 — bare `<` drops NULLs under 3-valued logic; the operator must
    keep them (02_DataCleaning.R:207-214)."""
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 99.0)], ["id", "v"]
    )
    got = {r["id"] for r in null_keeping_filter(df, F.col("v") < 50, "v").collect()}
    assert got == {1, 2}


def test_token_at_out_of_range_null(spark):
    """F3 — element_at past the end → NULL, replacing the reference's
    tryCatch (02_DataCleaning.R:161-166)."""
    df = spark.createDataFrame([("340 hp",), ("340 hp @ 6,000 RPM",)], ["power"])
    rows = df.select(token_at("power", 4).alias("t4")).collect()
    assert rows[0]["t4"] is None and rows[1]["t4"] == "6,000"


def test_first_token_with_unit_separator(spark):
    df = spark.createDataFrame([("106.3 in",)], ["wheelbase"])
    assert (
        df.select(first_token(F.col("wheelbase"), " in").alias("w")).first()["w"]
        == "106.3"
    )


def test_empty_to_null_and_na_share(spark):
    df = spark.createDataFrame([("a", ""), ("", None), ("c", "x")], ["s1", "s2"])
    nn = empty_to_null(df)
    shares = na_share(nn).first()
    assert shares["s1"] == pytest.approx(1 / 3)
    assert shares["s2"] == pytest.approx(2 / 3)


def test_drop_high_na_columns_keeps_protected(spark):
    df = spark.createDataFrame(
        [(1.0, None, None), (2.0, None, 1.0), (3.0, None, None)],
        "ok double, bad double, DemRepRatio double",
    )
    out = drop_high_na_columns(df, threshold=0.5, keep=("DemRepRatio",))
    assert set(out.columns) == {"ok", "DemRepRatio"}


def test_collapse_rare_levels_boundary(spark):
    """F7 — strictly-below-threshold levels collapse; NULL is untouched
    (02_DataCleaning.R:243-261)."""
    rows = [("a",)] * 50 + [("b",)] * 49 + [("rare",)] * 1 + [(None,)] * 0
    df = spark.createDataFrame(rows, ["c"])
    got = {r["c"] for r in collapse_rare_levels(df, ["c"], threshold=0.02).collect()}
    assert got == {"a", "b", "Other"}


def _py_tokens(text: str) -> list[str]:
    return re.split(r"\s+", text.strip().lower())


def test_fingerprint_matches_python_md5(spark):
    texts = ["Hello  World", " a  b\tc ", "x"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = {r["doc_id"]: r["fp"] for r in df.select("doc_id", tx.fingerprint("text").alias("fp")).collect()}
    for i, t in enumerate(texts):
        norm = re.sub(r"\s+", " ", t.strip().lower())
        assert got[i] == hashlib.md5(norm.encode()).hexdigest()


def test_ngram_jaccard_exact_values(spark):
    a = "the quick brown fox jumps over the lazy dog"
    b = "the quick brown fox jumps over a lazy dog"
    df = spark.createDataFrame([(0, a), (1, b)], ["doc_id", "text"])
    pairs = dd.ngram_jaccard_pairs(df, threshold=0.0).collect()
    assert len(pairs) == 1

    def shingles(t):
        toks = _py_tokens(t)
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sa, sb = shingles(a), shingles(b)
    want = len(sa & sb) / len(sa | sb)
    assert pairs[0]["jaccard"] == pytest.approx(want)


def test_ngram_jaccard_doc_freq_cap(spark):
    """The stopword-shingle cap (100 TB guardrail) must keep emitted
    jaccard values EXACT — the capped index is used for candidate ids
    only — and a generous cap must reproduce the uncapped result."""
    from conftest import SF_DIR_SMALL
    from mbfbigdatarandomforest_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR_SMALL, "documents")
    uncapped = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.ngram_jaccard_pairs(docs, threshold=0.2).collect()
    }
    generous = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.ngram_jaccard_pairs(
            docs, threshold=0.2, max_doc_freq=10**6
        ).collect()
    }
    assert generous == uncapped

    tight = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.ngram_jaccard_pairs(
            docs, threshold=0.2, max_doc_freq=3
        ).collect()
    }
    # recall-only approximation: a subset of the exact pairs, with
    # identical values on every surfaced pair
    assert set(tight) <= set(uncapped)
    for k, v in tight.items():
        assert v == pytest.approx(uncapped[k])


def test_ngram_jaccard_lazy_mode_matches_adaptive(spark):
    """adaptive=False (the lazy/streaming-safe plan: no plan-time probe
    job, no pinned cache, always-guarded) must emit identical pairs and
    values as the default adaptive plan — both when the cap bites and
    when nothing is hot."""
    from conftest import SF_DIR_SMALL
    from mbfbigdatarandomforest_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR_SMALL, "documents")
    for cap in (3, dd.NGRAM_MAX_DOC_FREQ):
        eager = {
            (r.id_a, r.id_b): r.jaccard
            for r in dd.ngram_jaccard_pairs(
                docs, threshold=0.2, max_doc_freq=cap
            ).collect()
        }
        lazy = dd.ngram_jaccard_pairs(
            docs, threshold=0.2, max_doc_freq=cap, adaptive=False
        )
        got = {(r.id_a, r.id_b): r.jaccard for r in lazy.collect()}
        assert set(got) == set(eager)
        for k, v in got.items():
            assert v == pytest.approx(eager[k])


def test_minhash_finds_exact_jaccard_pairs(spark):
    """LSH candidates must cover the high-similarity pairs found by the
    exact operator (recall check at small scale)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        (0, base),
        (1, base + " extra"),
        (2, base.replace("alpha", "omega")),
        (3, "completely different words nothing shared here at all ok"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    exact = {
        (r["id_a"], r["id_b"])
        for r in dd.ngram_jaccard_pairs(df, threshold=0.5).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in dd.minhash_dedup_pairs(df, threshold=0.5).collect()
    }
    assert exact, "fixture should contain at least one near-dup pair"
    assert exact <= approx


def test_lsh_verified_paths_equal_exact_pairs(spark):
    """The registered dedup_minhash_pairs query carries the exact
    n-gram-Jaccard oracle — valid ONLY while both LSH candidate paths
    reach recall 1.0 on the synthetic corpus. This test is the guard:
    if it starts failing, the query must drop back to rows-only."""
    from conftest import SF_DIR_SMALL
    from mbfbigdatarandomforest_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR_SMALL, "documents")
    ng = {(r.id_a, r.id_b, r.jaccard)
          for r in dd.ngram_jaccard_pairs(docs, threshold=0.2).collect()}
    mh = {(r.id_a, r.id_b, r.jaccard)
          for r in dd.minhash_verified_pairs(docs, threshold=0.2).collect()}
    bd = {(r.id_a, r.id_b, r.jaccard)
          for r in dd.banded_minhash_pairs(
              docs, bands=8, rows_per_band=4, threshold=0.2).collect()}
    assert ng, "fixture corpus should contain near-dup pairs"
    assert mh == ng
    assert bd == ng


def test_embedding_centroids_accuracy_and_array_form(spark):
    """Quantized centroid means must sit within 2^-20 of the true
    float64 mean, be invariant to repartitioning, and the array form
    must equal the long form dimension-by-dimension."""
    import numpy as np
    from mbfbigdatarandomforest_spark.operators.similarity import (
        embedding_centroids,
    )

    rng = np.random.default_rng(7)
    rows = [
        (int(i % 3), [float(x) for x in rng.uniform(-1, 1, 8).astype("float32")])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["label", "embedding"])
    long = embedding_centroids(df, "label", "embedding").collect()
    truth = {}
    for lbl in (0, 1, 2):
        vecs = np.array([v for l, v in rows if l == lbl], dtype=np.float64)
        truth[lbl] = vecs.mean(axis=0)
    for r in long:
        assert abs(r["mean_val"] - truth[r["label"]][r["idx"] - 1]) < 2**-20
    long2 = embedding_centroids(df.repartition(11), "label", "embedding").collect()
    assert {(r["label"], r["idx"], r["mean_val"]) for r in long} == {
        (r["label"], r["idx"], r["mean_val"]) for r in long2
    }
    arr = embedding_centroids(df, "label", "embedding", as_array=True).collect()
    by_label = {r["label"]: r["centroid"] for r in arr}
    for r in long:
        assert by_label[r["label"]][r["idx"] - 1] == r["mean_val"]


def test_ann_dup_pairs_equal_exact(spark):
    """Same guard for dedup_embedding_ann: IVF multi-probe candidates +
    exact verify must reproduce the all-pairs result on the synthetic
    embeddings (recall 1.0 at the registered n_clusters/n_probe)."""
    from conftest import SF_DIR_SMALL
    from mbfbigdatarandomforest_spark.operators import similarity as sim
    from mbfbigdatarandomforest_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR_SMALL, "embeddings")
    exact = {(r.id_a, r.id_b, r.cosine_sim)
             for r in sim.cosine_dup_pairs(emb, threshold=0.4).collect()}
    ann = {(r.id_a, r.id_b, r.cosine_sim)
           for r in sim.ann_dup_pairs(
               emb, threshold=0.4, n_clusters=16, n_probe=14,
               kmeans_max_iter=8).collect()}
    assert exact
    recall = len(exact & ann) / len(exact)
    assert recall >= 0.95
    assert ann == exact  # oracle-parity guard (stronger than recall)


def test_auto_n_clusters_size_keyed(spark, monkeypatch):
    """r8: unset n_clusters resolves from corpus size — constant target
    cell size keeps the O(cell²) verify linear in the corpus (the 40×
    probe measured a fixed cluster count going quadratic, SCALE.md §14).
    The MIN floor keeps every test/oracle-scale corpus on the legacy
    k=16 exactly, so auto mode cannot shift a hash gate."""
    from mbfbigdatarandomforest_spark.operators import similarity as sim

    df = spark.range(100).select(F.col("id").alias("vec_id"))
    # explicit passthrough
    assert sim._auto_n_clusters(df, 7) == 7
    # small corpus → the floor (legacy test-scale behavior)
    assert sim._auto_n_clusters(df, None) == sim.ANN_MIN_CLUSTERS
    # above the floor: ceil(n / target), clamped to MAX
    monkeypatch.setattr(sim, "ANN_TARGET_CELL_ROWS", 30)
    assert sim._auto_n_clusters(df, None) == 16  # ceil(100/30)=4 < floor
    monkeypatch.setattr(sim, "ANN_TARGET_CELL_ROWS", 3)
    assert sim._auto_n_clusters(df, None) == 34  # ceil(100/3)
    monkeypatch.setattr(sim, "ANN_MAX_CLUSTERS", 20)
    assert sim._auto_n_clusters(df, None) == 20  # clamped


def test_auto_k_fit_derives_count_from_sample(spark, monkeypatch):
    """r9: k=None resolves inside the centroid fit from the sample it
    already collects — a corpus under the sample cap must yield the
    exact size-keyed k with no separate count() scan (the r8 shape ran
    a full extra input scan per default-parameter IVF call)."""
    import numpy as np
    from mbfbigdatarandomforest_spark.operators import similarity as sim

    rng = np.random.default_rng(3)
    df = spark.createDataFrame(
        [(i, rng.normal(size=4).tolist()) for i in range(100)],
        "vec_id long, embedding array<double>",
    )
    monkeypatch.setattr(sim, "ANN_TARGET_CELL_ROWS", 3)
    cent = sim._fit_centroids_sampled(
        df, vec_col="embedding", id_col="vec_id", k=None, seed=1, max_iter=2
    )
    assert cent.shape[0] == 34  # ceil(100/3), derived from the sample
    # cap-overflow path: sample hits the cap, count job sizes k exactly
    cent2 = sim._fit_centroids_sampled(
        df, vec_col="embedding", id_col="vec_id", k=None, seed=1,
        max_iter=2, sample_cap=40,
    )
    assert cent2.shape[0] == 34  # ceil(100/3) from the pruned count


def test_ivf_index_persist_roundtrip(spark, tmp_path):
    """r9 (S5 extension to similarity): fit-once/search-many — saved
    centroids reload bit-identically and drive ann_dup_pairs/ivf_topk
    to EXACTLY the refit results, so a persisted index replaces the
    per-call fit with zero behavioral drift."""
    import numpy as np
    from conftest import SF_DIR_SMALL
    from mbfbigdatarandomforest_spark.operators import similarity as sim
    from mbfbigdatarandomforest_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR_SMALL, "embeddings")
    # max_iter left at 20: matches the builders' internal fit so the
    # refit-vs-loaded comparisons below are exact
    cent = sim.fit_ivf_index(emb, n_clusters=8, seed=3)
    path = str(tmp_path / "ivf")
    sim.save_ivf_index(spark, cent, path)
    back = sim.load_ivf_index(spark, path)
    assert back.dtype == np.float64 and np.array_equal(back, cent)

    fit_pairs = {
        (r.id_a, r.id_b, r.cosine_sim)
        for r in sim.ann_dup_pairs(
            emb, threshold=0.8, n_clusters=8, seed=3
        ).collect()
    }
    loaded_pairs = {
        (r.id_a, r.id_b, r.cosine_sim)
        for r in sim.ann_dup_pairs(emb, threshold=0.8, centroids=back).collect()
    }
    assert loaded_pairs == fit_pairs

    q = emb.limit(5).select("vec_id", "embedding")
    refit = sim.ivf_topk(
        emb, q, k=3, n_clusters=8, seed=3
    ).collect()
    loaded = sim.ivf_topk(emb, q, k=3, centroids=back).collect()
    assert sorted(map(tuple, loaded)) == sorted(map(tuple, refit))

    # wrong-kind artifact is rejected loudly
    import json as _json

    spark.createDataFrame(
        [(_json.dumps({"kind": "ngram"}),)], "meta string"
    ).coalesce(1).write.mode("overwrite").text(str(tmp_path / "notivf") + "/meta")
    with pytest.raises(ValueError, match="does not hold an IVF"):
        sim.load_ivf_index(spark, str(tmp_path / "notivf"))


def test_semantic_dedup_matches_brute_force(spark):
    """semantic_dedup's keep list must equal the exact construction:
    all-pairs cosine >= t, union-find transitive closure, min-id kept
    per component (SemDeDup with the deterministic representative)."""
    import numpy as np
    from conftest import SF_DIR_SMALL
    from mbfbigdatarandomforest_spark.operators import similarity as sim
    from mbfbigdatarandomforest_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR_SMALL, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    vecs = np.array([r.embedding for r in rows], dtype=np.float64)
    sims = (vecs @ vecs.T) / np.maximum(
        np.linalg.norm(vecs, axis=1)[:, None]
        * np.linalg.norm(vecs, axis=1)[None, :],
        1e-300,
    )
    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    # mirror the operator's contract: the pair filter applies to the
    # 6-decimal-rounded cosine (see ann_dup_pairs' final select)
    ii, jj = np.nonzero(np.triu(np.round(sims, 6) >= 0.4, k=1))
    for a, b in zip(ids[ii], ids[jj]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect_keep = {i for i in parent if find(i) == i}

    kept = {
        r.vec_id
        for r in sim.semantic_dedup(
            emb, threshold=0.4, n_clusters=16, n_probe=14, kmeans_max_iter=8
        ).collect()
    }
    assert len(kept) < len(ids)  # the synthetic corpus has near-dups
    assert kept == expect_keep


def test_simhash_matches_pure_python(spark):
    df = spark.createDataFrame(
        [(0, "aa bb cc"), (1, "aa bb cc"), (2, "xx yy zz")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["simhash"] for r in dd.simhash_signatures(df, bits=16).collect()}
    assert got[0] == got[1] != got[2]
    # xxhash64 oracle via Spark itself (single-value check of the sign-sum)
    toks = ["aa", "bb", "cc"]
    hdf = spark.createDataFrame([(t,) for t in toks], ["t"]).select(
        F.xxhash64("t").alias("h")
    )
    hashes = [r["h"] for r in hdf.collect()]
    want = 0
    for i in range(16):
        s = sum(1 if (h >> i) & 1 else -1 for h in hashes)
        if s > 0:
            want |= 1 << i
    assert got[0] == want


def test_lsh_topk_recall_vs_bruteforce(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(80)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    q = df.filter(F.col("vec_id") < 3)
    exact = sim.cosine_topk(df, q, k=5).collect()
    approx = sim.lsh_topk(df, q, k=5, num_tables=8, bucket_length=4.0).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # Euclidean-LSH neighbors vs cosine ground truth on unnormalized
    # gaussians won't agree perfectly; require substantial overlap
    recalls = [
        len(exact_sets[qid] & approx_sets.get(qid, set())) / 5 for qid in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.4


def test_simhash_duplicate_ids_keep_per_row_signatures(spark):
    """r7 (review item): the grouped-aggregate plan must NOT merge rows
    that share an id but carry different text — the aggregate keys on
    (id, xxhash64(text)), preserving the old per-row expression
    semantics. Identical (id, text) rows may collapse and fan back out;
    each input row still gets exactly one output row."""
    df = spark.createDataFrame(
        [(0, "aa bb cc"), (0, "xx yy zz"), (1, "aa bb cc"), (1, "aa bb cc")],
        ["doc_id", "text"],
    )
    rows = dd.simhash_signatures(df, bits=16).collect()
    assert len(rows) == 4  # one output row per input row
    sigs0 = sorted(r["simhash"] for r in rows if r["doc_id"] == 0)
    sigs1 = [r["simhash"] for r in rows if r["doc_id"] == 1]
    # per-row reference signatures from the expression form's semantics:
    # doc 0's two texts produce the same sigs a unique-id frame would
    uniq = spark.createDataFrame(
        [(10, "aa bb cc"), (11, "xx yy zz")], ["doc_id", "text"]
    )
    ref = {r["doc_id"]: r["simhash"] for r in dd.simhash_signatures(uniq, bits=16).collect()}
    assert sigs0 == sorted([ref[10], ref[11]])
    assert sigs1 == [ref[10], ref[10]]


def test_simhash_rejects_overflowing_bits():
    """bits=64 would build a 1<<63 literal that overflows LongType."""
    with pytest.raises(ValueError, match="63"):
        dd.simhash(F.col("text"), bits=64)


def test_wkt_multipolygon_and_holes():
    wkt = "MULTIPOLYGON(((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1)), ((10 10, 12 10, 12 12, 10 12, 10 10)))"
    polys = parse_wkt_polygon(wkt)
    idx = PolygonIndex([({"name": "m"}, polys)])
    assert idx.locate(3.5, 3.5) == {"name": "m"}
    assert idx.locate(1.5, 1.5) is None  # inside the hole
    assert idx.locate(11.0, 11.0) == {"name": "m"}
    assert idx.locate(6.0, 6.0) is None


def test_locate_many_matches_locate():
    """The batch-vectorized lookup must agree with the per-point path
    on every point, including NaNs, holes and multipolygon parts."""
    import numpy as np

    wkt_a = "MULTIPOLYGON(((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1)), ((10 10, 12 10, 12 12, 10 12, 10 10)))"
    wkt_b = "POLYGON((3 3, 7 3, 7 7, 3 7, 3 3))"
    idx = PolygonIndex(
        [
            ({"name": "a"}, parse_wkt_polygon(wkt_a)),
            ({"name": "b"}, parse_wkt_polygon(wkt_b)),
        ]
    )
    rng = np.random.default_rng(11)
    xs = rng.uniform(-1, 13, size=500)
    ys = rng.uniform(-1, 13, size=500)
    xs[::50] = np.nan  # sprinkle invalid coords
    got = idx.locate_many(xs, ys)
    want = [idx.locate(float(x), float(y)) for x, y in zip(xs, ys)]
    assert got == want


def test_lang_id_marker_vote(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat and the dog with food from home"),
            (1, "der hund und die katze nicht das haus"),
            (2, "le chat et les chiens des maisons"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["pred_lang"] for r in tx.lang_id(df).collect()}
    assert got == {0: "en", 1: "de", 2: "fr"}


def test_banded_minhash_covers_exact_pairs(spark):
    """Banded b×r LSH candidates must include every pair above the
    S-curve's high-probability region (here sim≥0.5 with b=8, r=2 →
    collision prob ≥ 1-(1-0.5²)^8 ≈ 0.9)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        (0, base),
        (1, base + " extra"),
        (2, base.replace("alpha", "omega")),
        (3, "completely different words nothing shared here at all ok"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.ngram_jaccard_pairs(df, threshold=0.5).collect()
    }
    banded = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.banded_minhash_pairs(
            df, bands=8, rows_per_band=2, threshold=0.5
        ).collect()
    }
    assert exact and set(exact) <= set(banded)
    # verified jaccard inside the operator must equal the exact value
    for k, v in exact.items():
        assert banded[k] == pytest.approx(v)


def test_hash_sampling_deterministic_and_quota(spark):
    """md5-keyed sampling must be invariant to partitioning (same rows
    at any parallelism), respect the per-stratum quota exactly, track
    the requested fraction, and decorrelate across salts."""
    from mbfbigdatarandomforest_spark.operators.sampling import (
        hash_fraction_sample,
        stratified_quota_sample,
    )

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("source"),
    )
    frac = {r["doc_id"] for r in hash_fraction_sample(df, 0.25, "doc_id").collect()}
    frac_repart = {
        r["doc_id"]
        for r in hash_fraction_sample(df.repartition(13), 0.25, "doc_id").collect()
    }
    assert frac == frac_repart
    assert 0.25 * 2000 * 0.8 <= len(frac) <= 0.25 * 2000 * 1.2
    other_salt = {
        r["doc_id"] for r in hash_fraction_sample(df, 0.25, "doc_id", salt="x").collect()
    }
    assert other_salt != frac  # independent draw
    quota = stratified_quota_sample(df, ["source"], 5, "doc_id").collect()
    per = {}
    for r in quota:
        per.setdefault(r["source"], []).append(r["sample_rank"])
    assert set(per) == {str(i) for i in range(7)}
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per.values())
    quota2 = stratified_quota_sample(df.repartition(17), ["source"], 5, "doc_id").collect()
    assert {(r["doc_id"], r["sample_rank"]) for r in quota} == {
        (r["doc_id"], r["sample_rank"]) for r in quota2
    }
    # Boundary: p=1.0 keeps EVERYTHING (the 32-bit threshold would format
    # to 9 hex chars and silently drop ~15/16 of rows if filtered).
    assert hash_fraction_sample(df, 1.0, "doc_id").count() == 2000
    assert hash_fraction_sample(df, 0.0, "doc_id").count() == 0


def test_temperature_mixture_quotas(spark):
    """t=1 reproduces natural proportions (ceil'd); t=0.5 flattens —
    every stratum's quota matches the Python-computed ceil(target·n^t /
    Σn^t), small strata gain share vs t=1, and the selected rows are the
    md5-order prefix of each stratum."""
    import math

    from mbfbigdatarandomforest_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    sizes = {"big": 900, "mid": 90, "small": 10}
    rows = []
    i = 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    target = 100
    for t in (1.0, 0.5):
        got = temperature_mixture_sample(
            df, ["source"], target, "doc_id", temperature=t
        ).collect()
        per = {}
        for r in got:
            per[r["source"]] = max(per.get(r["source"], 0), r["sample_rank"])
        tot = sum(n**t for n in sizes.values())
        want = {
            s: min(math.ceil(target * (n**t) / tot), n) for s, n in sizes.items()
        }
        assert per == want, (t, per, want)
    # flattening: small stratum's share strictly grows as t drops
    assert math.ceil(target * 10**0.5 / sum(n**0.5 for n in sizes.values())) > \
        math.ceil(target * 10 / 1000)


def test_line_dedup_matches_pure_python(spark):
    """Corpus-level repeated-line removal: a line in > max_doc_freq
    distinct docs is dropped everywhere, surviving lines keep their
    original order, short/blank lines are exempt, and a doc reduced to
    nothing comes back as empty text (never a lost row)."""
    from mbfbigdatarandomforest_spark.operators.dedup import line_dedup

    docs = [
        (0, "COPYRIGHT 2020\nalpha beta\ngamma\n\nCOPYRIGHT 2020"),
        (1, "COPYRIGHT 2020\ndelta\nzeta"),
        (2, "unique only\n\nepsilon"),
        (3, "COPYRIGHT 2020"),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r.doc_id: (r.text, r.n_lines_kept, r.n_lines_dropped)
        for r in line_dedup(df, max_doc_freq=1).collect()
    }

    # pure-Python oracle
    from collections import Counter

    freq = Counter()
    for _, text in docs:
        for ln in set(l for l in text.split("\n") if len(l) >= 1):
            freq[ln] += 1
    over = {ln for ln, c in freq.items() if c > 1}
    want = {}
    for i, text in docs:
        lines = text.split("\n")
        kept = [l for l in lines if l not in over or len(l) < 1]
        want[i] = ("\n".join(kept), len(kept), len(lines) - len(kept))
    assert got == want
    # the boilerplate line is gone from every doc, real content stays
    assert "COPYRIGHT" not in got[0][0] and "alpha beta" in got[0][0]
    assert got[3] == ("", 0, 1)
    # order preserved after removal (leading + trailing drops)
    assert got[0][0] == "alpha beta\ngamma\n"
    # re-running on already-clean output is a no-op
    again = {
        r.doc_id: r.text
        for r in line_dedup(
            line_dedup(df, max_doc_freq=1).select("doc_id", "text"),
            max_doc_freq=1,
        ).collect()
    }
    assert again == {i: t for i, (t, _, _) in want.items()}


def _py_c4_span_dedup(docs, span=3):
    """Independent pure-Python mirror of c4_sentence_span_dedup:
    sentence split after [.!?], trim, drop empties; normalized
    (lower, whitespace-collapsed) spans; keep-one at global min
    (id, pos); coverage composes across overlapping spans."""
    import re
    from collections import defaultdict

    sents = {
        i: [s.strip() for s in re.split(r"(?<=[.!?])", t or "") if s.strip()]
        for i, t in docs
    }
    norm = lambda s: re.sub(r"\s+", " ", s).lower()  # noqa: E731
    groups = defaultdict(list)
    for i, ss in sents.items():
        for p in range(len(ss) - span + 1):
            key = "".join(norm(x) for x in ss[p : p + span])
            groups[key].append((i, p))
    covered = set()
    for occs in groups.values():
        if len(occs) > 1:
            keeper = min(occs)
            for o in occs:
                if o != keeper:
                    covered.update((o[0], o[1] + d) for d in range(span))
    out = {}
    for i, ss in sents.items():
        kept = [s for p, s in enumerate(ss) if (i, p) not in covered]
        out[i] = (" ".join(kept), len(kept), len(ss) - len(kept))
    return out


def test_c4_sentence_span_dedup_matches_pure_python(spark):
    """The paper rule (Raffel et al. §2.2): all but ONE occurrence of
    any three-sentence span discarded — planted duplicates keep exactly
    the globally-first occurrence, normalization collides case and
    whitespace variants, sub-span docs and NULL text are untouched."""
    from mbfbigdatarandomforest_spark.operators.dedup import (
        c4_sentence_span_dedup,
    )

    dup = "Alpha one. Beta two. Gamma three."
    docs = [
        (0, f"{dup} Unique tail zero."),
        (1, f"Intro here. {dup} Own ending one."),
        (2, "Alpha one.  beta Two. GAMMA three. Different tail."),
        (3, "Too short. Only two."),
        (4, None),
        (5, "No terminal punctuation at all"),
        # within-document duplicate: second occurrence drops too
        (6, f"{dup} Filler mid. {dup} Closing note."),
        # overlapping coverage: keeper sentences may still fall to
        # another span's duplicate
        (7, f"Pre text. {dup} Post text."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_sentences_kept"], r["n_sentences_dropped"])
        for r in c4_sentence_span_dedup(df).collect()
    }
    want = _py_c4_span_dedup(docs)
    assert got == want
    # the planted span survives in EXACTLY one document
    n_with_span = sum(
        1 for t, _, _ in got.values() if "Alpha one." in (t or "")
    )
    assert n_with_span == 1
    assert "Alpha one." in got[0][0]  # the globally-first occurrence
    # idempotence: re-running on the deduped output is a no-op
    out1 = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in got.items()], "doc_id long, text string"
    )
    again = {
        r["doc_id"]: r["text"]
        for r in c4_sentence_span_dedup(out1).collect()
    }
    assert again == {i: t for i, (t, _, _) in got.items()}


def test_c4_sentence_span_dedup_property_random(spark):
    """Randomized corpora over a tiny sentence alphabet (maximizing
    collisions and overlaps) must match the Python mirror exactly."""
    import numpy as np

    from mbfbigdatarandomforest_spark.operators.dedup import (
        c4_sentence_span_dedup,
    )

    rng = np.random.default_rng(1414)
    pool = [f"Sentence {c}." for c in "abcdefg"]
    for trial in range(4):
        docs = [
            (
                i,
                " ".join(
                    pool[int(j)]
                    for j in rng.integers(0, len(pool), int(rng.integers(0, 9)))
                ),
            )
            for i in range(12)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: (
                r["text"],
                r["n_sentences_kept"],
                r["n_sentences_dropped"],
            )
            for r in c4_sentence_span_dedup(df).collect()
        }
        assert got == _py_c4_span_dedup(docs), f"trial {trial}"


def test_c4_span_dedup_stats_vs_python_twin(spark):
    """The registered sentinel query (rows-only): its per-source
    aggregates must match the pure-Python mirror over the same planted
    corpus, and the planted span must survive in EXACTLY one document
    corpus-wide."""
    import pandas as pd

    from mbfbigdatarandomforest_spark.plans.llm_ops import C4_SPAN_PLANTED
    from mbfbigdatarandomforest_spark.registry import load_all

    from conftest import SF_DIR_SMALL

    spec = load_all()["text_c4_span_dedup_stats"]
    got = spec.fn(spark, SF_DIR_SMALL).toPandas()
    assert int(got["planted_survivors"].sum()) == 1

    pdf = pd.read_parquet(f"{SF_DIR_SMALL}/documents.parquet")[
        ["doc_id", "source"]
    ]
    docs = []
    for did in pdf["doc_id"]:
        parts = []
        if did % 9 == 0:
            parts.append(C4_SPAN_PLANTED)
        parts += [
            f"Document {did} opens uniquely.",
            f"Body line {did} stays its own.",
            f"Ending {did} closes the page.",
        ]
        docs.append((did, " ".join(parts)))
    mirror = _py_c4_span_dedup(docs)
    src = dict(zip(pdf["doc_id"], pdf["source"]))
    agg = {}
    for did, (text, kept, dropped) in mirror.items():
        a = agg.setdefault(
            src[did], dict(n=0, kept=0, dropped=0, lost=0, planted=0)
        )
        a["n"] += 1
        a["kept"] += kept
        a["dropped"] += dropped
        a["lost"] += int(dropped > 0)
        a["planted"] += int("Planted alpha sentence" in text)
    for r in got.itertuples():
        a = agg[r.source]
        assert (
            r.n_docs,
            r.total_kept,
            r.total_dropped,
            r.n_docs_lost_sentences,
            r.planted_survivors,
        ) == (a["n"], a["kept"], a["dropped"], a["lost"], a["planted"]), (
            r.source
        )


def test_span_dedup_matches_pure_python(spark):
    """Cross-document repeated-span removal: tokens covered by an
    n-gram in > max_doc_freq distinct docs are dropped everywhere,
    survivors keep order, sub-n docs are untouched, and a fully-covered
    doc survives as an empty row."""
    from mbfbigdatarandomforest_spark.operators.dedup import span_dedup

    docs = [
        (0, "The quick BROWN fox jumps high"),
        (1, "a quick brown fox runs away"),
        (2, "totally unrelated words here"),
        (3, "quick brown fox"),
        (4, ""),
        (5, "short doc"),
    ]
    n = 3
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r.doc_id: (r.text, r.n_tokens_kept, r.n_tokens_dropped)
        for r in span_dedup(df, n=n, max_doc_freq=1).collect()
    }

    from collections import Counter

    toks = {i: t.lower().split() for i, t in docs}
    freq = Counter()
    for tk in toks.values():
        for g in {tuple(tk[j : j + n]) for j in range(len(tk) - n + 1)}:
            freq[g] += 1
    over = {g for g, c in freq.items() if c > 1}
    want = {}
    for i, tk in toks.items():
        cov = set()
        for j in range(len(tk) - n + 1):
            if tuple(tk[j : j + n]) in over:
                cov.update(range(j, j + n))
        kept = [t for p, t in enumerate(tk) if p not in cov]
        want[i] = (" ".join(kept), len(kept), len(tk) - len(kept))
    assert got == want
    # the shared span is gone from every doc it appeared in
    assert got[0][0] == "the jumps high"
    assert got[1][0] == "a runs away"
    assert got[3] == ("", 0, 3)   # fully covered, row survives
    assert got[5] == ("short doc", 2, 0)  # shorter than n: untouched


def test_decontaminate_ngram_overlap(spark):
    """A corpus doc sharing any token n-gram with the benchmark is
    flagged with the count of its DISTINCT hit n-grams; docs with no
    shared n-gram — including docs shorter than n tokens — are clean."""
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            # shares two distinct 5-grams with the benchmark
            (0, "alpha beta gamma delta epsilon zeta eta"),
            # same vocabulary, different order → no shared 5-gram
            (1, "zeta epsilon delta gamma beta alpha"),
            # shorter than n tokens → trivially clean
            (2, "alpha beta"),
            (3, "totally different words entirely here now"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_hit_ngrams"], r["contaminated"])
        for r in dd.decontaminate(corpus, bench, n=5).collect()
    }
    assert got == {0: (2, True), 1: (0, False), 2: (0, False), 3: (0, False)}


def test_simhash_bucket_cap_default_is_invisible_at_small_scale(spark):
    """r8: the default SIMHASH_MAX_BUCKET_SIZE guard (the 40×-probe
    superlinearity fix) must be a no-op wherever no bucket exceeds the
    cap — capped ≡ uncapped pair-for-pair at test scale — and an
    aggressive cap yields a strict subset (recall-only trade)."""
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta eta theta doc{i} "
             f"iota kappa w{i % 7} lambda") for i in range(60)],
        ["doc_id", "text"],
    )
    kw = dict(bits=32, bands=8, max_hamming=3, ngram=3)
    default = {(r.id_a, r.id_b) for r in dd.simhash_pairs(docs, **kw).collect()}
    uncapped = {
        (r.id_a, r.id_b)
        for r in dd.simhash_pairs(docs, max_bucket_size=None, **kw).collect()
    }
    assert default == uncapped
    tiny = {
        (r.id_a, r.id_b)
        for r in dd.simhash_pairs(docs, max_bucket_size=2, **kw).collect()
    }
    assert tiny <= uncapped


def test_simhash_precision_recall_floor(spark):
    """The registered dedup_simhash_pairs parameters (bits=63, bands=9,
    hamming≤8, shingle features — the r8 wide-fingerprint config; the
    hamming cut scales with bits so the angular threshold matches the
    old 32/8/3) must stay selective against the exact
    shingle-Jaccard≥0.2 pair set on the sf0.001 corpus: precision ≥ 0.9
    and recall ≥ 0.8 (measured 1.0 / 0.89 — SimHash is an angular
    sketch, so a handful of genuine Jaccard pairs legitimately land
    past the hamming cut). A failure here means either the corpus or
    the parameters drifted; re-tune before trusting the rows-only gate."""
    from conftest import SF_DIR_SMALL
    from mbfbigdatarandomforest_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR_SMALL, "documents")
    exact = {
        (r["id_a"], r["id_b"])
        for r in dd.ngram_jaccard_pairs(docs, threshold=0.2).collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in dd.simhash_pairs(
            docs, bits=63, bands=9, max_hamming=8, ngram=3
        ).collect()
    }
    assert exact, "fixture corpus should contain near-dup pairs"
    tp = len(got & exact)
    assert tp / max(len(got), 1) >= 0.9, f"precision {tp}/{len(got)}"
    assert tp / len(exact) >= 0.8, f"recall {tp}/{len(exact)}"


def test_salted_rollup_equals_plain_rollup(spark):
    """Salting must be semantics-preserving: sum/count compose exactly
    across salt buckets."""
    import numpy as np
    from mbfbigdatarandomforest_spark.operators.rollup import (
        salted_rollup,
        threshold_rollup,
    )

    rng = np.random.default_rng(13)
    # skewed: key 'hot' holds 80% of rows
    rows = [("hot" if rng.random() < 0.8 else f"k{int(rng.integers(5))}", float(rng.normal()))
            for _ in range(2000)]
    df = spark.createDataFrame(rows, "k string, v double")
    plain = {
        r["k"]: (r["forecast"], r["n_obs"])
        for r in threshold_rollup(df, ["k"], "v", min_count=50).collect()
    }
    salted = {
        r["k"]: (r["forecast"], r["n_obs"])
        for r in salted_rollup(df, ["k"], "v", min_count=50).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert plain[k][1] == salted[k][1]
        assert salted[k][0] == pytest.approx(plain[k][0], rel=1e-12)


def test_ivf_topk_recall_vs_bruteforce(spark):
    import numpy as np

    rng = np.random.default_rng(21)
    # clustered corpus so IVF partitions meaningfully
    centers = rng.normal(size=(4, 16)) * 4
    vecs = []
    for i in range(120):
        c = centers[i % 4]
        vecs.append((i, [float(x) for x in c + rng.normal(size=16)]))
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    q = df.filter(F.col("vec_id") < 3)
    exact = sim.cosine_topk(df, q, k=5).collect()
    approx = sim.ivf_topk(df, q, k=5, n_clusters=4, n_probe=2).collect()
    es, aps = {}, {}
    for r in exact:
        es.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx:
        aps.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(es[qid] & aps.get(qid, set())) / 5 for qid in es]
    assert sum(recalls) / len(recalls) >= 0.8  # clustered data: high recall


def test_ivf_gemm_kernel_exactly_equals_join_kernel(spark):
    """r10: ivf_topk_assigned's default bounded-query GEMM kernel must
    emit BIT-IDENTICAL rows to the expression-join twin
    (bounded_queries=False, the pre-r10 kernel) — same probes, same
    cosines (dimension-sequential IEEE order), same tie-breaks — on
    the real embeddings table including self-match exclusion."""
    from conftest import SF_DIR_SMALL

    emb = spark.read.parquet(f"{SF_DIR_SMALL}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 37 == 0)  # 14 queries
    cent = sim.fit_ivf_index(emb, n_clusters=8, seed=3)
    assigned = sim.ivf_assign(emb, cent)
    gemm = sim.ivf_topk_assigned(assigned, cent, q, k=7, n_probe=3).collect()
    join = sim.ivf_topk_assigned(
        assigned, cent, q, k=7, n_probe=3, bounded_queries=False
    ).collect()
    assert sorted(map(tuple, gemm)) == sorted(map(tuple, join))
    assert gemm  # fixture really scores something
    # ADVICE r10 guard: a query frame larger than the bounded-serving
    # contract must degrade to the join kernel (no driver collect of
    # the full frame), returning the same rows — the guard collect is
    # limit-bounded either way
    guarded = sim.ivf_topk_assigned(
        assigned, cent, q, k=7, n_probe=3, max_bounded_queries=5
    ).collect()
    assert sorted(map(tuple, guarded)) == sorted(map(tuple, join))


def test_asof_join_semantics(spark):
    """As-of: latest right at-or-before left, equal timestamps visible,
    no prior right → NULL."""
    from mbfbigdatarandomforest_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:10", "L1"), (1, "2024-01-01 00:00:04", "L0"),
         (2, "2024-01-01 00:00:01", "L2")],
        "k long, ts string, lbl string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:05", 5.0), (1, "2024-01-01 00:00:10", 7.0),
         (1, "2024-01-01 00:00:12", 9.0), (2, "2024-01-01 00:00:30", 1.0)],
        "k long, ts string, w double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["lbl"]: r["w_asof"]
        for r in asof_join(left, right, ["k"], ts_col="ts").collect()
    }
    assert got == {"L1": 7.0, "L0": None, "L2": None}


def test_asof_join_payload_rows_stay_together(spark):
    """All payload columns must come from the SAME latest right row —
    a NULL in the latest row must surface as NULL, not be backfilled
    from an older right row's non-null value."""
    from mbfbigdatarandomforest_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:10", "L")], "k long, ts string, lbl string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # older right row: (a=1.0, b=2.0); latest right row: (a=3.0, b=NULL)
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:01", 1.0, 2.0),
         (1, "2024-01-01 00:00:05", 3.0, None)],
        "k long, ts string, a double, b double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    row = asof_join(left, right, ["k"], ts_col="ts").collect()[0]
    assert row["a_asof"] == 3.0
    assert row["b_asof"] is None  # NOT 2.0 from the older row


def test_range_join_bucket_boundaries(spark):
    """Pairs straddling a bucket boundary must still match (neighbor
    bucket explode), and pairs outside tolerance must not."""
    from mbfbigdatarandomforest_spark.operators.temporal import range_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:59", 100)], "k long, ts string, lid long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:01:01", 200),   # 2s away, next bucket
         (1, "2024-01-01 00:01:58", 201),   # 59s away, next bucket
         (1, "2024-01-01 00:02:30", 202)],  # 91s away → excluded
        "k long, ts string, rid long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["rid_r"]
        for r in range_join(left, right, ["k"], ts_col="ts", tolerance_seconds=60).collect()
    }
    assert got == {200, 201}


def test_tfidf_top_terms(spark):
    """A term unique to one doc must out-score corpus-wide terms for
    that doc; every doc yields ≤ k ranked rows."""
    docs = [
        (0, "common words everywhere common words unique0 unique0 unique0"),
        (1, "common words everywhere common words"),
        (2, "common words everywhere zebra zebra"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = tx.tfidf_top_terms(df, k=2, min_df=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["tfidf"]))
    assert all(len(v) <= 2 for v in by_doc.values())
    top0 = sorted(by_doc[0])[0][1]
    top2 = sorted(by_doc[2])[0][1]
    assert top0 == "unique0" and top2 == "zebra"
    # 'common'/'words'/'everywhere' appear in all docs → IDF 0 → never top
    assert all(t not in {"common", "words", "everywhere"}
               for v in by_doc.values() for _, t, _ in v)


def test_quantized_topk_recall_and_exact_values(spark):
    """int8-quantized scoring + exact rescore: high recall vs the exact
    brute force, and every emitted cosine must be EXACTLY the value
    cosine_topk computes for the same (query, neighbor) pair (the
    rescore is full-precision; only candidate selection is approximate)."""
    import numpy as np

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(5, 24)) * 3
    vecs = []
    for i in range(150):
        c = centers[i % 5]
        vecs.append((i, [float(x) for x in c + rng.normal(size=24)]))
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    q = df.filter(F.col("vec_id") < 4)

    exact = sim.cosine_topk(df, q, k=5).collect()
    approx = sim.quantized_topk(df, q, k=5, oversample=4).collect()

    exact_vals = {(r["query_id"], r["neighbor_id"]): r["cosine_sim"] for r in exact}
    es, aps = {}, {}
    for r in exact:
        es.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx:
        aps.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        if (r["query_id"], r["neighbor_id"]) in exact_vals:
            assert r["cosine_sim"] == exact_vals[(r["query_id"], r["neighbor_id"])]
    recalls = [len(es[qid] & aps.get(qid, set())) / 5 for qid in es]
    assert sum(recalls) / len(recalls) >= 0.9


def test_quantize_embeddings_roundtrip_error(spark):
    """Per-element dequantization error is bounded by s/2 and the scale
    is max|v|/127."""
    import numpy as np

    rng = np.random.default_rng(3)
    vecs = [(i, [float(x) for x in rng.normal(size=16) * (i + 1)]) for i in range(20)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    rows = sim.quantize_embeddings(df).collect()
    orig = dict(vecs)
    for r in rows:
        v = np.array(orig[r["id"]])
        s = r["q_scale"]
        assert s == pytest.approx(np.abs(v).max() / 127.0, rel=1e-6)
        deq = np.array(r["q_vec"], dtype=np.float64) * s
        assert np.abs(deq - v).max() <= s / 2 + 1e-9
        assert all(-127 <= x <= 127 for x in r["q_vec"])


def _union_find_components(edges, nodes):
    """Pure-Python oracle: min-id label per connected component."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_connected_components_path_graph(spark):
    """A 12-node path chain is the worst case for naive min-propagation
    (diameter = n); the star algorithm must still converge and label
    every node with the chain minimum."""
    edges = [(i, i + 1) for i in range(1, 12)]  # 1-2-3-...-12
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        r["node"]: r["component"]
        for r in dd.connected_components(pairs).collect()
    }
    assert got == {n: 1 for n in range(1, 13)}


def test_connected_components_multi_cluster(spark):
    edges = [(2, 1), (3, 2), (7, 9), (20, 11), (11, 15), (15, 20)]
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    nodes = sorted({x for e in edges for x in e})
    want = _union_find_components(edges, nodes)
    got = {
        r["node"]: r["component"]
        for r in dd.connected_components(pairs).collect()
    }
    assert got == want


def test_connected_components_rounds_stay_logarithmic(spark):
    """r9 probe regression pin (SCALE.md §15): on the planted-structure
    graph (giant path + chains + stars + pairs, ids scrambled) the
    alternating-star rounds must stay within a small constant of
    log2(diameter) — the property the 10x/40x probe measured (15/19/21
    rounds for diameters 15k/150k/600k) — and the per-round edge frame
    must stay flat after the first contraction (the shuffle-volume
    invariant). A regression to diameter-bound propagation would blow
    the max_iter=25 cap long before it blew this assertion."""
    import math
    import sys

    sys.path.insert(0, "scripts")
    from cc_scale_probe import planted_graph

    n = 5000  # giant path diameter 1500
    edges, want_hist = planted_graph(spark, n)
    stats: dict = {}
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    # this test pins the DISTRIBUTED star loop's round/storage
    # properties — force it (r16: small graphs otherwise take the
    # value-identical driver-side union-find path)
    orig_cap = dd.CC_DRIVER_SOLVE_MAX_EDGES
    dd.CC_DRIVER_SOLVE_MAX_EDGES = -1
    try:
        comp = dd.connected_components(edges, stats=stats)
        got_hist = {
            int(r["cluster_size"]): int(r["n"])
            for r in dd.dedup_clusters(
                docs, comp
                .select(F.col("node").alias("id_a"), F.col("component").alias("id_b"))
            )
            .groupBy("cluster_size")
            .agg((F.count(F.lit(1)) / F.col("cluster_size")).alias("n"))
            .collect()
        }
    finally:
        dd.CC_DRIVER_SOLVE_MAX_EDGES = orig_cap
    assert got_hist == want_hist
    diameter = (3 * n) // 10
    assert stats["rounds"] <= math.ceil(math.log2(diameter)) + 4
    # after round 1 the edge frame contracts to (nodes-in-pairs −
    # components) and must stay EXACTLY flat — any growth means the
    # star rounds are re-expanding intermediate state
    tail = stats["edge_counts"][1:]
    assert len(set(tail)) == 1
    # r10: checkpoint storage is freed deterministically — after every
    # round at most the current checkpoint plus the one being swapped
    # in may be live ABOVE the caller's baseline (≤2), never
    # rounds×O(E) accumulation riding on an eventual JVM GC
    assert stats["live_ckpt_rdds"], "instrumentation missing"
    assert max(stats["live_ckpt_rdds"]) <= 2, stats["live_ckpt_rdds"]


def test_dedup_clusters_vs_union_find_oracle(spark):
    """dedup_clusters on real corpus pairs (exact n-gram Jaccard at
    sf0.001) must agree with a pure-Python union-find, including
    singleton handling, canonical flags, and cluster sizes."""
    from conftest import SF_DIR_SMALL

    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
    pairs = dd.ngram_jaccard_pairs(docs, threshold=0.2)
    edge_list = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    doc_ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    want_labels = _union_find_components(edge_list, doc_ids)
    want_sizes: dict[int, int] = {}
    for n in doc_ids:
        want_sizes[want_labels[n]] = want_sizes.get(want_labels[n], 0) + 1
    assert edge_list, "fixture corpus must contain near-dup pairs"

    got = dd.dedup_clusters(docs, pairs).collect()
    assert len(got) == len(doc_ids)
    for r in got:
        assert r["cluster_id"] == want_labels[r["doc_id"]]
        assert r["is_canonical"] == (r["doc_id"] == r["cluster_id"])
        assert r["cluster_size"] == want_sizes[r["cluster_id"]]


def test_dedup_filter_keeps_one_per_cluster(spark):
    from conftest import SF_DIR_SMALL

    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
    pairs = dd.ngram_jaccard_pairs(docs, threshold=0.2)
    edge_list = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    doc_ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    want_labels = _union_find_components(edge_list, doc_ids)
    want_keep = {m for m in want_labels.values()}

    kept = {r["doc_id"] for r in dd.dedup_filter(docs, pairs).select("doc_id").collect()}
    assert kept == want_keep


def test_redact_pii_matches_python_re(spark):
    texts = [
        "contact bob.smith+x@example.co.uk or 10.0.255.1 now",
        "call 555-123-4567 x2 or mail a@b.io; server 192.168.0.1",
        "no pii here, just 1.2 numbers and an @ sign",
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["id", "text"])
    got = {r["id"]: r for r in tx.redact_pii(df).collect()}
    for i, t in enumerate(texts):
        emails = re.findall(tx.EMAIL_PATTERN, t)
        ips = re.findall(tx.IPV4_PATTERN, t)
        phones = re.findall(tx.PHONE_PATTERN, t)
        want = re.sub(tx.EMAIL_PATTERN, "<EMAIL>", t)
        want = re.sub(tx.IPV4_PATTERN, "<IP>", want)
        want = re.sub(tx.PHONE_PATTERN, "<PHONE>", want)
        r = got[i]
        assert r["n_emails"] == len(emails), t
        assert r["n_ipv4"] == len(ips), t
        assert r["n_phones"] == len(phones), t
        assert r["text_redacted"] == want, t
    assert got[0]["n_emails"] == 1 and got[0]["n_ipv4"] == 1
    assert got[1]["n_phones"] == 1 and got[1]["n_emails"] == 1


def test_repetition_signals_line_heuristics(spark):
    boiler = "menu\nmenu\nmenu\n- item one\n- item two\nread more..."
    clean = "a single line of honest prose"
    df = spark.createDataFrame([(1, boiler), (2, clean), (3, "")], ["id", "text"])
    got = {r["id"]: r for r in tx.repetition_signals(df).collect()}
    b = got[1]
    assert b["n_lines"] == 6
    assert b["dup_line_frac"] == pytest.approx(2 / 6)  # 'menu' repeated twice extra
    assert b["max_line_len"] == len("read more...")
    assert b["bullet_line_frac"] == pytest.approx(2 / 6)
    assert b["ellipsis_line_frac"] == pytest.approx(1 / 6)
    c = got[2]
    assert c["dup_line_frac"] == 0.0 and c["n_lines"] == 1
    e = got[3]
    assert e["n_lines"] == 0 and e["max_line_len"] == 0 and e["dup_line_frac"] == 0.0


def test_ngram_repetition_signals_vs_python_oracle(spark):
    """r12: the n-gram half of Gopher's Table A1 repetition rules.
    Exact closed-form checks on crafted docs plus a seeded randomized
    sweep against an independent Counter-based Python oracle
    implementing the SAME documented contract (top gram: chars covered
    by all occurrences of the MODE — count-ranked, ties by coverage,
    per Gopher's most-frequently-occurring-gram definition; dup grams:
    chars in occurrences beyond each duplicated gram's first; word
    chars, not separator spaces; case-folded words)."""
    import re as _re
    from collections import Counter

    import numpy as np

    top_ns, dup_ns = (2, 3), (5,)

    def py_signals(text):
        words = [
            w for w in _re.split(tx.TOKEN_PATTERN, text.strip().lower()) if w
        ]
        total = sum(len(w) for w in words) or 1
        out = {}
        for kind, ns in (("top", top_ns), ("dup", dup_ns)):
            for n in ns:
                grams = (
                    [" ".join(words[i: i + n]) for i in range(len(words) - n + 1)]
                    if len(words) >= n
                    else []
                )
                cnt = Counter(grams)
                if kind == "top":
                    # argmax count, ties by coverage — the paper ranks
                    # by frequency, not by count·chars
                    val = max(
                        (
                            (c, c * (len(g) - (n - 1)))
                            for g, c in cnt.items()
                        ),
                        default=(0, 0),
                    )[1]
                else:
                    val = sum(
                        (c - 1) * (len(g) - (n - 1))
                        for g, c in cnt.items()
                        if c > 1
                    )
                out[f"{kind}_{n}_gram_char_frac"] = val / total
        return out

    crafted = [
        "the cat the cat the dog",          # top-2 'the cat' ×2
        "a b c d e a b c d e a b c d e",    # heavy 5-gram repetition
        "all distinct words here only",     # no repetition at all
        "tiny",                             # fewer words than any n
        "",                                 # empty doc
        "Case CASE case DIFFERENT different",  # case folding matters
        None,                               # NULL text scores like ""
        # discriminates count-first ranking from max(count·chars):
        # mode 'aa bb' ×2 covers 8 chars; the count-1 gram
        # 'extraordinarily magnificent' covers 26 — Gopher wants 8
        "aa bb aa bb extraordinarily magnificent",
    ]
    rng = np.random.default_rng(126)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    random_docs = [
        " ".join(rng.choice(vocab, size=int(rng.integers(0, 40))))
        for _ in range(25)
    ]
    docs = crafted + random_docs
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], ["id", "text"]
    )
    got = {
        r["id"]: r
        for r in tx.ngram_repetition_signals(
            df, top_ns=top_ns, dup_ns=dup_ns
        ).collect()
    }
    for i, t in enumerate(docs):
        want = py_signals(t or "")  # NULL text scores like ""
        for k, v in want.items():
            assert got[i][k] == pytest.approx(v, abs=1e-12), (i, k, t)
    # the closed forms, spelled out
    assert got[0]["top_2_gram_char_frac"] == pytest.approx(12 / 18)
    assert got[2]["top_2_gram_char_frac"] > 0  # mode exists, count 1
    assert got[2]["dup_5_gram_char_frac"] == 0.0
    assert got[3]["top_2_gram_char_frac"] == 0.0  # < n words
    assert got[4]["dup_5_gram_char_frac"] == 0.0  # empty doc
    assert got[1]["dup_5_gram_char_frac"] > 0.5  # the heavy repeater
    # count-first: the ×2 mode (8 chars), NOT the 26-char count-1 gram
    assert got[7]["top_2_gram_char_frac"] == pytest.approx(8 / 34)


def test_incremental_dedup_vs_bruteforce(spark):
    """r12: cross-snapshot dedup — a NEW snapshot gated against the
    EXISTING dataset. Brute-force Python twin over the registered
    fixture construction at sf0.001: the exact tier must equal
    normalized-text membership exactly; every near-tier drop must have
    a true Jaccard >= threshold against some reference doc (exact
    precision); recall over brute-force matches >= 0.8 (the LSH
    operating point); both planted families (exact copies, one-token
    near-dups) must be fully dropped. r13: the registered query now
    also gates the snapshot's INTERNAL dups (dedup_within_new=True) —
    the planted exact and near internal pairs each keep exactly their
    first (min-id) survivor, internal drops have exact precision
    against an all-pairs brute force, and the r12 cross-only contract
    still holds when the flag is off."""
    import re as _re

    from mbfbigdatarandomforest_spark.plans.llm_ops import (
        _INTERNAL_SENTINEL_A,
        _INTERNAL_SENTINEL_B,
        PLANTED_EXACT_BASE,
        PLANTED_INTERNAL_BASE,
        PLANTED_NEAR_BASE,
    )
    from mbfbigdatarandomforest_spark.registry import load_all

    from conftest import SF_DIR_SMALL

    spec = load_all()["dedup_incremental_stats"]
    assert spec.oracle is None
    row = spec.fn(spark, SF_DIR_SMALL).collect()[0]
    # the operator's own planted evidence
    assert row["planted_exact_kept"] == 0
    assert row["planted_near_kept"] == 0
    # one min-id survivor per planted internal pair (exact + near)
    assert row["planted_internal_kept"] == 2
    assert 0 < row["n_kept"] < row["n_new"]

    # ---- brute-force twin over the same construction ----
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    ref = {i: t for i, t in docs.items() if i % 2 == 0}
    new = {i: t for i, t in docs.items() if i % 2 == 1}
    new.update(
        {i + PLANTED_EXACT_BASE: t for i, t in ref.items() if i % 10 == 0}
    )
    new.update(
        {
            i + PLANTED_NEAR_BASE: t + " zyzzyva"
            for i, t in ref.items()
            if i % 10 == 4
        }
    )
    new.update(
        {
            PLANTED_INTERNAL_BASE + 0: _INTERNAL_SENTINEL_A,
            PLANTED_INTERNAL_BASE + 1: _INTERNAL_SENTINEL_A,
            PLANTED_INTERNAL_BASE + 2: _INTERNAL_SENTINEL_B,
            PLANTED_INTERNAL_BASE + 3: _INTERNAL_SENTINEL_B + " zyxx",
        }
    )
    assert row["n_new"] == len(new) and row["n_ref"] == len(ref)

    def norm(t):
        return _re.sub(r"\s+", " ", t.strip().lower())

    def sh(t):
        toks = [w for w in _re.split(r"\s+", t.strip().lower()) if w]
        return {
            " ".join(toks[i: i + 3]) for i in range(len(toks) - 2)
        }

    ref_norms = {norm(t) for t in ref.values()}
    fresh = {i: t for i, t in new.items() if norm(t) not in ref_norms}
    ref_sh = {i: sh(t) for i, t in ref.items()}
    bf_matched = set()
    for i, t in fresh.items():
        s = sh(t)
        if not s:
            continue
        for rs in ref_sh.values():
            inter = len(s & rs)
            if inter and inter / len(s | rs) >= 0.7:
                bf_matched.add(i)
                break
    # drive the operator directly to get the kept SET
    import mbfbigdatarandomforest_spark.operators.dedup as dd_ops

    new_df = spark.createDataFrame(
        list(new.items()), "doc_id long, text string"
    )
    ref_df = spark.createDataFrame(
        list(ref.items()), "doc_id long, text string"
    )
    kept = {
        r["doc_id"]
        for r in dd_ops.incremental_dedup(
            new_df, ref_df, threshold=0.7, seed=42
        ).collect()
    }
    # tier 1 is EXACT: everything fingerprint-matched is gone, nothing
    # fingerprint-fresh was dropped except by tier 2
    assert kept <= set(fresh)
    dropped2 = set(fresh) - kept
    # precision is exact (the verify join guarantees it)
    assert dropped2 <= bf_matched, sorted(dropped2 - bf_matched)[:5]
    # recall at the operating point
    if bf_matched:
        assert len(dropped2 & bf_matched) / len(bf_matched) >= 0.8
    # planted near-dups are far above threshold — all caught
    internal_ids = {PLANTED_INTERNAL_BASE + k for k in range(4)}
    assert not (kept & {
        i for i in new if PLANTED_NEAR_BASE <= i < PLANTED_INTERNAL_BASE
    })
    # the r12 cross-only contract: internal pairs both survive
    assert internal_ids <= kept

    # ---- r13: dedup_within_new=True (what the rollup registers) ----
    kept_full = {
        r["doc_id"]
        for r in dd_ops.incremental_dedup(
            new_df, ref_df, threshold=0.7, seed=42, dedup_within_new=True
        ).collect()
    }
    assert len(kept_full) == row["n_kept"]  # the registered rollup agrees
    assert kept_full <= kept  # only removes rows, never adds
    # one min-id survivor per planted internal pair (exact and near)
    assert kept_full & internal_ids == {
        PLANTED_INTERNAL_BASE + 0, PLANTED_INTERNAL_BASE + 2
    }
    # exact internal tier: only the min id of each normalized-text
    # group can survive
    from collections import defaultdict

    by_norm = defaultdict(list)
    for i in kept:
        by_norm[norm(new[i])].append(i)
    exact_internal_dropped = {
        i for ids in by_norm.values() for i in ids if i != min(ids)
    }
    assert not (exact_internal_dropped & kept_full)
    # near internal tier: exact precision — every further drop has a
    # true Jaccard >= threshold partner among the near-pass input
    near_input = kept - exact_internal_dropped
    dropped3 = near_input - kept_full
    kept_sh = {i: sh(new[i]) for i in near_input}
    for i in sorted(dropped3):
        s = kept_sh[i]
        assert s and any(
            j != i
            and len(s & kept_sh[j]) / len(s | kept_sh[j]) >= 0.7
            for j in near_input
        ), i


def test_dedup_index_path_equals_rebuild(spark, tmp_path):
    """r13 (VERDICT item 1): the persistable dedup index. The index
    path must return EXACTLY the rebuild path's results — pairs and
    survivors, with and without the hot-bucket cap — and the
    build → gate → append → gate cycle must equal rebuilding against
    the accumulated corpus. Structural parameters live in the index's
    meta (a build with non-default n drives the gate regardless of the
    call signature's default), and double-build raises."""
    import mbfbigdatarandomforest_spark.operators.dedup as dd_ops

    from conftest import SF_DIR_SMALL

    docs = (
        spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
        .select("doc_id", "text")
    )
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1).unionByName(
        ref.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
        )
    )
    idx = str(tmp_path / "idx")
    dd_ops.build_dedup_index(ref, idx)
    with pytest.raises(Exception):  # mode("error"): never overwrite
        dd_ops.build_dedup_index(ref, idx)

    def pairset(df):
        return {
            (r["new_id"], r["ref_id"], r["jaccard"]) for r in df.collect()
        }

    kw = dict(threshold=0.7, seed=42)
    assert pairset(
        dd_ops.incremental_minhash_pairs(new, index=idx, **kw)
    ) == pairset(dd_ops.incremental_minhash_pairs(new, ref, **kw))
    # hot-bucket cap: query-time window over the stored buckets must
    # reproduce the rebuild path's FULL-size capping exactly
    assert pairset(
        dd_ops.incremental_minhash_pairs(
            new, index=idx, max_bucket_size=2, **kw
        )
    ) == pairset(
        dd_ops.incremental_minhash_pairs(new, ref, max_bucket_size=2, **kw)
    )

    def keptset(**kwargs):
        return {
            r["doc_id"]
            for r in dd_ops.incremental_dedup(new, **kwargs).collect()
        }

    kept_idx = keptset(index=idx, dedup_within_new=True, **kw)
    assert kept_idx == keptset(reference=ref, dedup_within_new=True, **kw)

    # ---- the ingestion cycle: append survivors, gate snapshot 2 ----
    accepted = new.join(
        spark.createDataFrame(
            [(i,) for i in kept_idx], "doc_id long"
        ),
        "doc_id",
    )
    dd_ops.append_dedup_index(accepted, idx)
    # snapshot 2: fresh docs + exact copies of ROUND-1 accepted rows
    # (only the appended index can catch those) + copies of ref rows
    s2 = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .select((F.col("doc_id") + 40_000_000).alias("doc_id"), "text")
        .unionByName(
            accepted.limit(5).select(
                (F.col("doc_id") + 50_000_000).alias("doc_id"), "text"
            )
        )
        .unionByName(
            spark.createDataFrame(
                [
                    (60_000_000, "grelph vintar osmodee quarn lippet "
                                 "zanbruk welf trosin"),
                    (60_000_001, "phandor ixwell cubrent mallavoy "
                                 "strend okkim juvarn pelth"),
                ],
                "doc_id long, text string",
            )
        )
    )
    corpus2 = ref.unionByName(accepted)
    kept2_idx = {
        r["doc_id"]
        for r in dd_ops.incremental_dedup(s2, index=idx, **kw).collect()
    }
    kept2_ref = {
        r["doc_id"]
        for r in dd_ops.incremental_dedup(s2, corpus2, **kw).collect()
    }
    assert kept2_idx == kept2_ref
    # the round-1-accepted copies were caught BY THE APPEND, while the
    # genuinely fresh sentinel docs pass the gate
    assert not {
        i for i in kept2_idx if 50_000_000 <= i < 60_000_000
    }
    assert {60_000_000, 60_000_001} <= kept2_idx

    # ---- structural params come from meta, not the call ----
    idx2 = str(tmp_path / "idx_n2")
    dd_ops.build_dedup_index(ref, idx2, n=2, bands=4, rows_per_band=2)
    assert pairset(
        dd_ops.incremental_minhash_pairs(new, index=idx2, **kw)
    ) == pairset(
        dd_ops.incremental_minhash_pairs(
            new, ref, n=2, bands=4, rows_per_band=2, **kw
        )
    )


def test_text_repetition_stats_vs_python_twin(spark, duck):
    """The registered per-source repetition rollup (rows-only) against
    the Counter-based Python oracle over the same corpus."""
    import re as _re
    from collections import Counter, defaultdict

    from mbfbigdatarandomforest_spark.registry import load_all

    from conftest import SF_DIR_ORACLE

    spec = load_all()["text_repetition_stats"]
    assert spec.oracle is None
    got = {
        r["source"]: r
        for _, r in spec.fn(spark, SF_DIR_ORACLE).toPandas().iterrows()
    }

    def signals(text):
        words = [
            w for w in _re.split(tx.TOKEN_PATTERN, text.strip().lower()) if w
        ]
        total = sum(len(w) for w in words) or 1
        lines = [ln.strip() for ln in text.split("\n") if ln.strip()]
        out = {
            "dup_line_frac": (len(lines) - len(set(lines)))
            / max(len(lines), 1)
        }
        for kind, ns in (("top", (2, 3)), ("dup", (5, 10))):
            for n in ns:
                grams = (
                    [" ".join(words[i: i + n]) for i in range(len(words) - n + 1)]
                    if len(words) >= n
                    else []
                )
                cnt = Counter(grams)
                if kind == "top":
                    # mode's coverage: count-ranked, ties by coverage
                    v = max(
                        (
                            (c, c * (len(g) - (n - 1)))
                            for g, c in cnt.items()
                        ),
                        default=(0, 0),
                    )[1]
                else:
                    v = sum(
                        (c - 1) * (len(g) - (n - 1))
                        for g, c in cnt.items()
                        if c > 1
                    )
                out[f"{kind}_{n}"] = v / total
        return out

    acc: dict = defaultdict(list)
    for src, text in duck.sql("SELECT source, text FROM documents").fetchall():
        acc[src].append(signals(text))
    for src, sigs in acc.items():
        r = got[src]
        assert r["n_docs"] == len(sigs)
        mean = lambda k: sum(s[k] for s in sigs) / len(sigs)  # noqa: E731
        assert r["avg_dup_line_frac"] == pytest.approx(
            mean("dup_line_frac"), abs=1e-9
        )
        assert r["avg_top2_frac"] == pytest.approx(mean("top_2"), abs=1e-9)
        assert r["avg_top3_frac"] == pytest.approx(mean("top_3"), abs=1e-9)
        assert r["avg_dup5_frac"] == pytest.approx(mean("dup_5"), abs=1e-9)
        assert r["avg_dup10_frac"] == pytest.approx(mean("dup_10"), abs=1e-9)
    assert set(got) == set(acc)


#: Java regex \s — the ASCII whitespace class c4_clean trims and
#: splits with; the mirror MUST use it verbatim (Python re's \s is
#: unicode-wide, which would diverge on e.g. NBSP).
_JAVA_WS = r"[ \t\n\r\f\x0b]"


def _py_c4_line_ok(ln: str, min_words: int = 3) -> bool:
    """Python mirror of c4_clean's line filter (Raffel et al. 2020
    §2.2): terminal mark, min words, no javascript, no policy
    boilerplate — over the SAME ASCII-whitespace trim/split the Spark
    side runs."""
    t = re.sub(f"^{_JAVA_WS}+|{_JAVA_WS}+$", "", ln)
    low = t.lower()
    return (
        bool(t) and t[-1] in '.!?"'
        and len([w for w in re.split(f"{_JAVA_WS}+", t) if w]) >= min_words
        and "javascript" not in low
        and not any(p in low for p in tx.C4_POLICY_SUBSTRINGS)
    )


def _py_c4_clean(text: str, min_words: int = 3, min_sentences: int = 5,
                 blockwords=None):
    lines = re.split(r"\r?\n", text or "")
    kept = [ln for ln in lines if _py_c4_line_ok(ln, min_words)]
    clean = "\n".join(kept)
    n_sent = len(re.findall(r"[.!?]", clean))
    low = (text or "").lower()
    out = {
        "n_lines": len(lines),
        "n_kept_lines": len(kept),
        "n_sentences": n_sent,
        "clean_text": clean,
        "sentences_ok": n_sent >= min_sentences,
        "lorem_ipsum_ok": "lorem ipsum" not in low,
        "brace_ok": "{" not in (text or ""),
    }
    if blockwords:
        out["blockwords_ok"] = not re.search(
            r"\b(?:" + "|".join(re.escape(w.lower()) for w in blockwords)
            + r")\b",
            low,
        )
    out["c4_pass"] = all(
        v for k, v in out.items() if k.endswith("_ok")
    )
    return out


def test_c4_clean_rules(spark):
    """r13: the C4 cleaning heuristics (Raffel et al. 2020 §2.2) —
    every line rule (terminal mark incl. closing quote, min words,
    javascript, policy substrings) and every page rule (min sentences,
    lorem ipsum, brace, caller-supplied blockwords) pinned against the
    independent Python mirror on crafted docs; NULL text scores as the
    empty document."""
    docs = [
        # all lines survive, enough sentences → passes
        "This sentence clearly terminates properly.\n"
        'A quoted line also counts as terminal."\n'
        "Is a question mark terminal too?\n"
        "Yes it is! And this one makes five sentences.",
        # line rules bite one by one
        "no terminal mark here\n"
        "too short.\n"
        "Please enable javascript to continue.\n"
        "We value your privacy policy very much.\n"
        "Only this survivor line remains standing.",
        # page rules: lorem ipsum / brace / blockword
        "About lorem ipsum placeholder text on this page.\n"
        "Another fine sentence follows the first one.",
        "A brace { inside code makes this page fail.",
        "The banned gadget word sinks this whole page.",
        None,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "i long, text string"
    )
    got = {
        r["i"]: r.asDict()
        for r in tx.c4_clean(
            df, min_sentences=2, blockwords=["gadget", "wid.get"]
        ).collect()
    }
    for i, t in enumerate(docs):
        want = _py_c4_clean(
            t or "", min_sentences=2, blockwords=["gadget", "wid.get"]
        )
        for k, v in want.items():
            assert got[i][k] == v, (i, k, got[i][k], v)
    assert got[0]["c4_pass"] is True
    assert got[1]["n_kept_lines"] == 1  # only the survivor line
    assert got[1]["fail_reasons"] == ["sentences"]
    assert got[2]["lorem_ipsum_ok"] is False
    assert got[3]["brace_ok"] is False
    assert got[4]["blockwords_ok"] is False
    assert got[5]["clean_text"] == "" and got[5]["c4_pass"] is False
    # blockword regex escapes specials: 'wid.get' is a literal, so
    # 'widXget' must NOT trip it
    ok = tx.c4_clean(
        spark.createDataFrame(
            [("Plenty of widXget sentences stand here. And two more land!",)],
            "text string",
        ),
        min_sentences=2,
        blockwords=["wid.get"],
    ).first()
    assert ok["blockwords_ok"] is True


def test_text_c4_clean_stats_vs_python_twin(spark, duck):
    """The registered per-source C4 rollup (rows-only) against the
    full Python twin: pages re-derived from the same doc_id arms, the
    mirrored rule set, exact aggregate equality."""
    from collections import defaultdict

    from mbfbigdatarandomforest_spark.registry import load_all

    from conftest import SF_DIR_ORACLE

    spec = load_all()["text_c4_clean_stats"]
    assert spec.oracle is None
    got = {
        r["source"]: r
        for _, r in spec.fn(spark, SF_DIR_ORACLE).toPandas().iterrows()
    }

    def page_of(did: int, text: str) -> str:
        punct = ".!?\""[did % 4]
        lines = [
            text[:40] + " end of intro" + punct,
            "too short.",
            (
                "Please enable javascript to continue browsing."
                if did % 5 == 0
                else "A perfectly normal sentence for the corpus."
            ),
            (
                "See our privacy policy for all details."
                if did % 7 == 0
                else f"Another regular sentence number {did % 3} here."
            ),
            "trailing line with no terminal mark",
        ]
        if did % 11 == 0:
            lines.append("About lorem ipsum placeholder text.")
        if did % 13 == 0:
            lines.append("A brace { appears mid page here.")
        return "\n".join(lines)

    acc: dict = defaultdict(lambda: [0, 0, 0, 0, 0, 0, 0.0])
    for did, src, text in duck.sql(
        "SELECT doc_id, source, text FROM documents"
    ).fetchall():
        c = _py_c4_clean(page_of(int(did), text), min_sentences=3)
        a = acc[src]
        a[0] += 1
        a[1] += c["c4_pass"]
        a[2] += c["n_kept_lines"]
        a[3] += c["n_sentences"]
        a[4] += not c["lorem_ipsum_ok"]
        a[5] += not c["brace_ok"]
        a[6] += c["n_kept_lines"] / c["n_lines"]
    assert set(got) == set(acc)
    for src, a in acc.items():
        r = got[src]
        assert (
            r["n_docs"], r["n_pass"], r["total_kept_lines"],
            r["total_sentences"], r["n_lorem"], r["n_brace"],
        ) == (a[0], a[1], a[2], a[3], a[4], a[5]), src
        assert r["avg_kept_frac"] == pytest.approx(a[6] / a[0], abs=1e-9)
    # the fixture discriminates: some docs pass, some fail, both page
    # rules actually fire somewhere
    assert 0 < sum(a[1] for a in acc.values()) < sum(
        a[0] for a in acc.values()
    )
    assert sum(a[4] for a in acc.values()) > 0
    assert sum(a[5] for a in acc.values()) > 0


def _py_naive_bfd(items, L):
    """Independent naive BFD oracle: linear scan for the smallest
    residual that fits (ties → earliest-opened bin). O(n·bins) — test
    scale only."""
    bins, out = [], []
    for key, n in items:
        best = None
        for b, r in enumerate(bins):
            if r >= n and (best is None or r < bins[best]):
                best = b
        if best is None:
            bins.append(L)
            best = len(bins) - 1
        bins[best] -= n
        out.append((key, best))
    return out


def test_pack_bestfit_exact_vs_naive(spark):
    """r13: BFD packing (Ding et al. 2024) — the single-packer manifest
    equals the independent naive Python BFD bin-for-bin; capacity never
    exceeded; every token accounted; oversized docs pre-split into
    full pieces + remainder; the result is invariant to input
    partitioning; bad parameters raise."""
    import pytest as _pytest

    counts = [50, 30, 30, 20, 14, 14, 13, 9, 5, 3, 1, 150]  # 150 > L=64
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(n)))
            for i, n in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"]): (r["bin_id"], r["span_end"],
                                         r["n_tokens"])
        for r in tx.pack_bestfit(df, max_tokens=64, packers=1).collect()
    }
    # expected items: doc 11 (150 tokens) splits into 64+64+22
    pieces = []
    for i, n in enumerate(counts):
        s = 0
        while s < n:
            e = min(s + 64, n)
            pieces.append((i, s, e, e - s))
            s = e
    order = sorted(pieces, key=lambda p: (-p[3], p[0], p[1]))
    want_assign = _py_naive_bfd([(p, p[3]) for p in order], 64)
    want = {
        (p[0], p[1]): (seq, p[2], p[3]) for p, seq in want_assign
    }
    assert got == want
    # capacity + conservation on a multi-packer run
    m = tx.pack_bestfit(df, max_tokens=64, packers=4)
    per_bin = {
        r["bin_id"]: r["s"]
        for r in m.groupBy("bin_id").agg(F.sum("n_tokens").alias("s")).collect()
    }
    assert all(s <= 64 for s in per_bin.values())
    assert sum(per_bin.values()) == sum(counts)
    # partitioning invariance (md5 grouping, not layout)
    m2 = tx.pack_bestfit(df.repartition(7), max_tokens=64, packers=4)
    assert sorted(map(tuple, m.collect())) == sorted(map(tuple, m2.collect()))
    with _pytest.raises(ValueError, match="max_tokens"):
        tx.pack_bestfit(df, max_tokens=0)
    with _pytest.raises(ValueError, match="packers"):
        tx.pack_bestfit(df, max_tokens=8, packers=0)
    # non-integer ids pack too (review r13): the id column keeps its
    # native type through the grouped map
    sdf = spark.createDataFrame(
        [(f"url-{i}", t) for i, (_, t) in enumerate(rows)],
        "doc_id string, text string",
    )
    sm = tx.pack_bestfit(sdf, max_tokens=64, packers=2)
    assert dict(sm.dtypes)["doc_id"] == "string"
    assert sm.agg(F.sum("n_tokens")).first()[0] == sum(counts)


def test_pack_bestfit_stats_vs_python_twin(spark, duck):
    """The registered bestfit-vs-stream packing rollup (rows-only)
    against a full Python twin: md5 packer grouping, the naive BFD
    oracle per group, stream-chunk arithmetic for the baseline — and
    the paper's headline direction (bestfit splits no ≤-capacity doc,
    the stream packer splits many)."""
    import hashlib
    from collections import defaultdict

    from mbfbigdatarandomforest_spark.registry import load_all

    from conftest import SF_DIR_ORACLE

    L, PACKERS = 128, 8
    spec = load_all()["pack_bestfit_stats"]
    assert spec.oracle is None
    got = {
        r["packer"]: (
            r["n_items"], r["n_bins"], r["total_tokens"],
            r["n_split_docs"], r["fill_frac"],
        )
        for _, r in spec.fn(spark, SF_DIR_ORACLE).toPandas().iterrows()
    }
    rows = duck.sql("SELECT doc_id, text FROM documents").fetchall()
    counts = {
        int(i): len([w for w in t.strip().split() if w]) for i, t in rows
    }
    counts = {i: n for i, n in counts.items() if n > 0}
    # bestfit twin
    groups = defaultdict(list)
    for i, n in sorted(counts.items()):
        p = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % PACKERS
        s = 0
        while s < n:
            e = min(s + L, n)
            groups[p].append((i, s, e, e - s))
            s = e
    bf_bins = 0
    bf_items = 0
    bf_split = 0
    for p, pieces in groups.items():
        order = sorted(pieces, key=lambda x: (-x[3], x[0], x[1]))
        assign = _py_naive_bfd([(x, x[3]) for x in order], L)
        bf_bins += len({seq for _, seq in assign})
        bf_items += len(assign)
    per_doc = defaultdict(int)
    for pieces in groups.values():
        for i, *_ in pieces:
            per_doc[i] += 1
    bf_split = sum(k > 1 for k in per_doc.values())
    total = sum(counts.values())
    assert got["bestfit"][:4] == (bf_items, bf_bins, total, bf_split)
    assert got["bestfit"][4] == pytest.approx(
        total / (bf_bins * L), abs=1e-9
    )
    # stream twin: global token stream in doc_id order, L-chunks
    st_items = 0
    st_split = 0
    offset = 0
    blocks = set()
    for i, n in sorted(counts.items()):
        first, last = offset // L, (offset + n - 1) // L
        st_items += last - first + 1
        st_split += last > first
        blocks.update(range(first, last + 1))
        offset += n
    assert got["stream"][:4] == (st_items, len(blocks), total, st_split)
    assert got["stream"][4] == pytest.approx(
        total / (len(blocks) * L), abs=1e-9
    )
    # the paper's headline: whole-doc packing splits (almost) nothing,
    # stream chunking splits many; both fills stay high
    assert bf_split == sum(n > L for n in counts.values())
    assert st_split > 10 * max(bf_split, 1)
    assert got["bestfit"][4] > 0.8 and got["stream"][4] > 0.9


def test_corpus_diff_statuses(spark):
    """r13: snapshot content diff — added/removed/retained by the
    dedup exact tier's normalized fingerprint: whitespace/case
    variants are the SAME content (retained), a text edit is an
    added+removed PAIR, per-side doc counts and min ids carried,
    absent sides NULL."""
    old = spark.createDataFrame(
        [
            (1, "The quick brown fox"),
            (2, "the  quick   brown fox"),  # dup of 1 (normalized)
            (3, "stale page vanishes"),
            (4, "page to be edited"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (11, "THE QUICK BROWN FOX"),   # retained (case-folded)
            (14, "page to be edited now"), # the edit: new fp
            (15, "fresh page arrives"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["fp"]: r.asDict() for r in dd.corpus_diff(old, new).collect()
    }
    by_status: dict = {}
    for r in got.values():
        by_status.setdefault(r["status"], []).append(r)
    assert {s: len(v) for s, v in by_status.items()} == {
        "retained": 1, "removed": 2, "added": 2
    }
    ret = by_status["retained"][0]
    assert (ret["n_old"], ret["n_new"]) == (2, 1)  # both old variants
    assert (ret["old_id"], ret["new_id"]) == (1, 11)
    for r in by_status["removed"]:
        assert r["n_new"] == 0 and r["new_id"] is None and r["old_id"] in (3, 4)
    for r in by_status["added"]:
        assert r["n_old"] == 0 and r["old_id"] is None and r["new_id"] in (14, 15)
    # NULL texts are ONE content class on both sides (exact_dedup's
    # NULL-fp grouping): retained, never an added+removed pair
    old_n = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id long, text string"
    )
    new_n = spark.createDataFrame([(9, None)], "doc_id long, text string")
    nrows = dd.corpus_diff(old_n, new_n).collect()
    assert len(nrows) == 1
    assert (nrows[0]["status"], nrows[0]["n_old"], nrows[0]["n_new"]) == (
        "retained", 2, 1
    )
    assert nrows[0]["fp"] is None


def test_corpus_snapshot_diff_vs_duckdb_twin(spark, duck):
    """The registered snapshot-diff rollup (rows-only) against a full
    DuckDB twin: the same derived next-snapshot arms, the same md5
    normalized fingerprint, exact per-status counts."""
    from mbfbigdatarandomforest_spark.registry import load_all

    from conftest import SF_DIR_ORACLE

    spec = load_all()["corpus_snapshot_diff"]
    assert spec.oracle is None
    got = {
        r["status"]: (r["n_contents"], r["n_docs_old"], r["n_docs_new"])
        for _, r in spec.fn(spark, SF_DIR_ORACLE).toPandas().iterrows()
    }
    fp = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"
    want = {
        s: (n, o, w)
        for s, n, o, w in duck.sql(f"""
        WITH old AS (SELECT doc_id, text FROM documents),
        survivors AS (SELECT * FROM old WHERE doc_id % 7 != 0),
        new AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 5 = 0 THEN text || ' updated content'
                      ELSE text END AS text
          FROM survivors
          UNION ALL
          SELECT doc_id + 1000000, text || ' brand new doc'
          FROM old WHERE doc_id % 3 = 0
        ),
        o AS (SELECT {fp} AS fp, COUNT(*) AS n_old FROM old GROUP BY 1),
        n AS (SELECT {fp} AS fp, COUNT(*) AS n_new FROM new GROUP BY 1),
        j AS (
          SELECT COALESCE(o.fp, n.fp) AS fp,
                 CASE WHEN o.fp IS NULL THEN 'added'
                      WHEN n.fp IS NULL THEN 'removed'
                      ELSE 'retained' END AS status,
                 COALESCE(n_old, 0) AS n_old, COALESCE(n_new, 0) AS n_new
          FROM o FULL OUTER JOIN n ON o.fp = n.fp
        )
        SELECT status, COUNT(*) AS n_contents,
               SUM(n_old) AS n_docs_old, SUM(n_new) AS n_docs_new
        FROM j GROUP BY status ORDER BY status
        """).fetchall()
    }
    assert got == want
    # every status occurs: the arms really fire
    assert set(got) == {"added", "removed", "retained"}


def test_json_field_extraction(spark):
    """Typed JSON pulls: long field, string field, and the NULL
    contract for missing keys, nulls, and unparseable payloads."""
    from mbfbigdatarandomforest_spark.functions.json import (
        json_long_field,
        json_string_field,
    )

    df = spark.createDataFrame(
        [
            (0, '{"k": 26, "s": "hi"}'),
            (1, '{"s": "x"}'),          # missing k
            (2, None),                   # null payload
            (3, "not json at all"),      # unparseable
            (4, '{"k": "notanint"}'),    # non-numeric k
        ],
        ["i", "props"],
    )
    got = {
        r["i"]: (r["k"], r["s"])
        for r in df.select(
            "i",
            json_long_field("props", "k").alias("k"),
            json_string_field("props", "s").alias("s"),
        ).collect()
    }
    assert got == {
        0: (26, "hi"),
        1: (None, "x"),
        2: (None, None),
        3: (None, None),
        4: (None, None),
    }


def test_connected_components_random_graphs_vs_union_find(spark):
    """Seeded random graphs stress the large-star/small-star rounds
    beyond the fixed fixtures: a celebrity star (one node in ~half the
    edges), a long path (worst case for naive propagation), and uniform
    random edges — labels must equal a Python union-find's component
    minima in every case."""
    import numpy as np

    def union_find_labels(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        groups = {}
        for n in list(parent):
            groups.setdefault(find(n), []).append(n)
        return {n: min(g) for g in groups.values() for n in g}

    rng = np.random.default_rng(42)
    graphs = {
        "celebrity": [(0, int(i)) for i in rng.integers(1, 120, 80)]
        + [(int(a), int(b)) for a, b in rng.integers(200, 260, (40, 2))],
        "path": [(i, i + 1) for i in range(150)],
        "random": [
            (int(a), int(b)) for a, b in rng.integers(0, 200, (120, 2))
        ],
    }
    for name, edges in graphs.items():
        edges = [(a, b) for a, b in edges if a != b]
        want = union_find_labels(edges)
        df = spark.createDataFrame(edges, ["id_a", "id_b"])
        # r16: small graphs take the driver-side union-find path; pin
        # BOTH paths against the oracle (and hence each other) by
        # forcing the distributed loop with the threshold disabled.
        stats: dict = {}
        got = {
            r["node"]: r["component"]
            for r in dd.connected_components(df, stats=stats).collect()
        }
        assert stats.get("driver_solved") is True, name
        assert got == want, f"driver path: {name}"
        orig = dd.CC_DRIVER_SOLVE_MAX_EDGES
        dd.CC_DRIVER_SOLVE_MAX_EDGES = -1
        try:
            got_dist = {
                r["node"]: r["component"]
                for r in dd.connected_components(df).collect()
            }
        finally:
            dd.CC_DRIVER_SOLVE_MAX_EDGES = orig
        assert got_dist == want, f"distributed path: {name}"


def test_global_prefix_sum_matches_window(spark):
    """global_prefix_sum ≡ SUM() OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING TO 1 PRECEDING) on unique keys, and refuses fractional
    weight columns instead of silently truncating them."""
    import random

    import pytest as _pt
    from pyspark.sql import Window as W

    from mbfbigdatarandomforest_spark.operators.windows import (
        global_prefix_sum,
    )

    rng = random.Random(7)
    rows = [(i, rng.randint(0, 50)) for i in range(500)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k long, w long").repartition(7)
    got = {
        (r.k, r.prefix_sum)
        for r in global_prefix_sum(df, ["k"], "w", num_buckets=8).collect()
    }
    want_df = df.withColumn(
        "ps",
        F.coalesce(
            F.sum("w").over(
                W.orderBy("k").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    want = {(r.k, r.ps) for r in want_df.collect()}
    assert got == want

    fdf = spark.createDataFrame([(1, 1.5)], "k long, w double")
    with _pt.raises(TypeError, match="integral weight"):
        global_prefix_sum(fdf, ["k"], "w")


def test_pack_sequences_manifest(spark):
    """pack_sequences: blocks fill to exactly max_tokens (except the
    last), straddling docs fan out with contiguous spans, empty docs
    vanish, and the manifest reconstructs the concatenated stream."""
    from mbfbigdatarandomforest_spark.operators.text import pack_sequences

    docs = [
        (0, "a b c d e"),        # 5 tokens
        (1, ""),                 # empty -> absent
        (2, "f g h"),            # 3 tokens
        (3, "i j k l m n o p"),  # 8 tokens -> straddles
        (4, "q"),                # 1 token
    ]
    L = 4
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = pack_sequences(df, max_tokens=L).collect()
    assert all(r.n_tokens == r.span_end - r.span_start for r in rows)
    assert not any(r.doc_id == 1 for r in rows)

    # oracle: concatenate token streams in id order, chunk into L-blocks
    stream = []
    for i, t in docs:
        for p, _ in enumerate(t.split()):
            stream.append((i, p))
    want = {}
    for g, (i, p) in enumerate(stream):
        b = g // L
        key = (b, i)
        s, e = want.get(key, (p, p))
        want[key] = (min(s, p), max(e, p + 1))
    got = {(r.block_id, r.doc_id): (r.span_start, r.span_end) for r in rows}
    assert got == want

    # every block holds exactly L tokens except the last
    per_block = {}
    for r in rows:
        per_block[r.block_id] = per_block.get(r.block_id, 0) + r.n_tokens
    last = max(per_block)
    assert all(v == L for b, v in per_block.items() if b != last)
    assert 0 < per_block[last] <= L

    # token_count_col path agrees with the whitespace count
    via_counts = pack_sequences(
        df.withColumn("ntok", F.size(F.split(F.trim("text"), r"\s+"))
          .cast("long"))
          .withColumn("ntok", F.when(F.col("text") == "", 0).otherwise(F.col("ntok"))),
        max_tokens=L,
        token_count_col="ntok",
    ).collect()
    assert {(r.block_id, r.doc_id, r.span_start, r.span_end) for r in via_counts} == {
        (r.block_id, r.doc_id, r.span_start, r.span_end) for r in rows
    }


def test_gopher_quality_filter_rules(spark):
    """Each published Gopher rule must fire on a doc violating exactly
    it, a clean doc passes all rules, and fail_reasons names precisely
    the violated rules."""
    good = (
        "the quick brown fox and the lazy dog have been seen with many "
        "other animals that wander over these wide fields during autumn "
        "days while keepers watch from their towers and note every move "
        "in old leather books kept safe within the stone walls there"
    )
    docs = [
        (0, good),                              # passes everything
        (1, "too few words here"),              # word_count
        (2, " ".join(["a"] * 60)),              # mean_word_len low (+stopwords)
        (3, good + " " + "#" * 1 + " #### ### ## # # # #"),  # symbols
        (4, "\n".join(["- bullet point item number " + str(i) for i in range(20)])),
        (5, " ".join(["12345"] * 60)),          # alpha_words (+stopwords)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    from mbfbigdatarandomforest_spark.operators.text import (
        gopher_quality_filter,
    )

    got = {
        r.doc_id: (r.quality_pass, set(r.fail_reasons))
        for r in gopher_quality_filter(df, min_words=40).collect()
    }
    assert got[0] == (True, set())
    assert got[1][0] is False and "word_count" in got[1][1]
    assert "mean_word_len" in got[2][1]
    assert "symbol_ratio" in got[3][1]
    assert "bullet_lines" in got[4][1]
    assert "alpha_words" in got[5][1] and "stopwords" in got[5][1]

    # oracle the continuous signals on the clean doc
    r0 = [
        r
        for r in gopher_quality_filter(df, min_words=40)
        .select("doc_id", "quality_pass")
        .collect()
        if r.doc_id == 0
    ]
    assert r0[0].quality_pass is True


def test_line_dedup_literal_sep_and_null_text(spark):
    """sep is literal (a '.' separator splits on dots, not everything)
    and NULL text behaves exactly like the empty document — the row
    survives with empty text, never vanishes."""
    from mbfbigdatarandomforest_spark.operators.dedup import line_dedup

    df = spark.createDataFrame(
        [(0, "x.y.z"), (1, None), (2, "x.q.z")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.text, r.n_lines_kept, r.n_lines_dropped)
        for r in line_dedup(df, sep=".", min_chars=1).collect()
    }
    # 'x' and 'z' occur in docs 0 and 2 -> dropped; 'y'/'q' unique -> kept
    assert got[0] == ("y", 1, 2)
    assert got[2] == ("q", 1, 2)
    assert got[1] == ("", 1, 0)  # NULL ≡ empty doc: one exempt empty line


def test_span_dedup_null_text_counts(spark):
    """NULL text yields ('', 0, 0) — zero counts, not NULLs, so
    downstream aggregations keep the kept+dropped==total invariant."""
    from mbfbigdatarandomforest_spark.operators.dedup import span_dedup

    df = spark.createDataFrame(
        [(0, "a b c d"), (1, None), (2, "a b c d")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.text, r.n_tokens_kept, r.n_tokens_dropped)
        for r in span_dedup(df, n=2, max_doc_freq=1).collect()
    }
    assert got[1] == ("", 0, 0)
    assert got[0] == ("", 0, 4) and got[2] == ("", 0, 4)


def test_global_prefix_sum_string_keys(spark):
    """String order keys (URL/hash doc ids) must bucket via the binary
    prefix proxy instead of throwing CAST_INVALID_INPUT under ANSI, and
    the result must still equal the single-partition window."""
    import random

    from pyspark.sql import Window as W

    from mbfbigdatarandomforest_spark.operators.windows import (
        global_prefix_sum,
        global_row_number,
    )

    rng = random.Random(11)
    rows = [(f"doc_{rng.random():.12f}", rng.randint(0, 9)) for _ in range(400)]
    df = spark.createDataFrame(rows, "k string, w long").repartition(5)
    got = {
        (r.k, r.prefix_sum)
        for r in global_prefix_sum(df, ["k"], "w", num_buckets=8).collect()
    }
    want_df = df.withColumn(
        "ps",
        F.coalesce(
            F.sum("w").over(W.orderBy("k").rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    assert got == {(r.k, r.ps) for r in want_df.collect()}
    # and the row-number primitive accepts string keys the same way
    rn = {
        (r.k, r.idx)
        for r in global_row_number(df, ["k"], num_buckets=8).collect()
    }
    want_rn = df.withColumn("idx", F.row_number().over(W.orderBy("k")))
    assert rn == {(r.k, r.idx) for r in want_rn.collect()}


def test_pack_sequences_string_doc_ids(spark):
    """pack_sequences over string document ids (the common case) packs
    in lexicographic id order without crashing."""
    from mbfbigdatarandomforest_spark.operators.text import pack_sequences

    docs = [("doc_b", "d e f g"), ("doc_a", "a b c"), ("doc_c", "h i")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = sorted(
        pack_sequences(df, max_tokens=4).collect(),
        key=lambda r: (r.block_id, r.doc_id),
    )
    got = [(r.block_id, r.doc_id, r.span_start, r.span_end) for r in rows]
    # stream in id order: a b c | d e f g | h i  -> blocks of 4
    assert got == [
        (0, "doc_a", 0, 3),
        (0, "doc_b", 0, 1),
        (1, "doc_b", 1, 4),
        (1, "doc_c", 0, 1),
        (2, "doc_c", 1, 2),
    ]


def test_gopher_symbol_ratios_threshold_separately(spark):
    """Per Table A1 the hash and ellipsis ratios are thresholded EACH,
    not summed: 0.06 + 0.06 passes, 0.12 in one symbol fails; and
    Unicode '…'-terminated lines count toward the ellipsis-line rule."""
    from mbfbigdatarandomforest_spark.operators.text import (
        gopher_quality_filter,
    )

    base = (
        "the quick brown fox and the lazy dog have seen many other "
        "animals that wander over wide fields during autumn days while "
        "keepers watch from towers and note every move in old leather "
        "books kept safe within stone walls there"
    )  # 44 words, clean
    both_low = base + " # # #" + " ... ... ..."      # each ratio ≈0.06
    one_high = base + " " + " ".join(["#"] * 6)      # hash ratio ≈0.12
    df = spark.createDataFrame(
        [(0, both_low), (1, one_high)], ["doc_id", "text"]
    )
    got = {
        r.doc_id: r.symbol_ratio_ok
        for r in gopher_quality_filter(df, min_words=10).collect()
    }
    assert got[0] is True and got[1] is False

    uni = "\n".join(["line number " + str(i) + "…" for i in range(10)])
    r = gopher_quality_filter(
        spark.createDataFrame([(0, uni)], ["doc_id", "text"]), min_words=1
    ).collect()[0]
    assert r.ellipsis_lines_ok is False


def test_string_bucketing_spreads_shared_prefix_ids(spark):
    """Real id schemes share a long common prefix (doc_000…); the
    bucketing proxy must strip it and still spread the corpus across
    buckets — not funnel everything into one — while staying exact."""
    from pyspark.sql import Window as W

    from mbfbigdatarandomforest_spark.operators.windows import (
        _assign_buckets,
        global_prefix_sum,
    )

    rows = [(f"document_{i:09d}", i % 7) for i in range(600)]
    df = spark.createDataFrame(rows, "k string, w long").repartition(6)
    bucketed = _assign_buckets(df, ["k"], 8, 0.001)
    n_buckets = bucketed.select("__bkt").distinct().count()
    assert n_buckets >= 4, f"shared-prefix ids funneled into {n_buckets} bucket(s)"

    got = {
        (r.k, r.prefix_sum)
        for r in global_prefix_sum(df, ["k"], "w", num_buckets=8).collect()
    }
    want_df = df.withColumn(
        "ps",
        F.coalesce(
            F.sum("w").over(W.orderBy("k").rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    assert got == {(r.k, r.ps) for r in want_df.collect()}


def test_curation_funnel_monotone(spark):
    """The end-to-end curation funnel: doc and token counts are
    monotone non-increasing through quality → dedup → decontamination →
    sampling, every stage survives non-empty, and packing conserves the
    sampled token count across full blocks."""
    from conftest import SF_DIR_SMALL
    from mbfbigdatarandomforest_spark.plans.llm_ops import curation_funnel

    rows = {r.stage: (r.n_docs, r.n_tokens) for r in
            curation_funnel(spark, SF_DIR_SMALL).collect()}
    order = ["0_raw", "1_quality", "2_exact_dedup", "3_decontaminated",
             "4_mixture_sampled"]
    assert set(rows) == set(order) | {"5_packed_blocks"}
    for a, b in zip(order, order[1:]):
        assert rows[a][0] >= rows[b][0] >= 0, (a, b, rows)
        assert rows[a][1] >= rows[b][1] >= 0, (a, b, rows)
    assert rows["4_mixture_sampled"][0] > 0
    n_blocks, packed_tokens = rows["5_packed_blocks"]
    assert packed_tokens == rows["4_mixture_sampled"][1]
    assert n_blocks == -(-packed_tokens // 256)  # ceil division


def test_string_bucketing_robust_to_outlier_id(spark):
    """A single id from a different scheme must not collapse the main
    id population into one bucket (the sampled-string-cuts design:
    outliers merely occupy an end bucket), and the prefix sum stays
    exact with the outlier present."""
    from pyspark.sql import Window as W

    from mbfbigdatarandomforest_spark.operators.windows import (
        _assign_buckets,
        global_prefix_sum,
    )

    rows = [(f"doc_{i:09d}", i % 5) for i in range(600)] + [("zzz_outlier", 3)]
    df = spark.createDataFrame(rows, "k string, w long").repartition(6)
    bucketed = _assign_buckets(df, ["k"], 8, 0.001)
    n_buckets = bucketed.select("__bkt").distinct().count()
    assert n_buckets >= 4, f"outlier collapsed bucketing to {n_buckets}"

    got = {
        (r.k, r.prefix_sum)
        for r in global_prefix_sum(df, ["k"], "w", num_buckets=8).collect()
    }
    want_df = df.withColumn(
        "ps",
        F.coalesce(
            F.sum("w").over(W.orderBy("k").rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    assert got == {(r.k, r.ps) for r in want_df.collect()}


def test_hash_split_deterministic_and_stable(spark):
    """hash_split: assignment is a pure function of the key — invariant
    to partitioning AND to corpus growth (held-out contracts survive
    adding data); the first split's membership is exactly
    hash_fraction_sample at the same weight; proportions land within a
    5-sigma binomial envelope; bad weights raise."""
    import math

    import pytest as _pt

    from mbfbigdatarandomforest_spark.operators.sampling import (
        hash_fraction_sample,
        hash_split,
    )

    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    df = spark.createDataFrame(
        [(i,) for i in range(4000)], "doc_id long"
    )
    got = {r.doc_id: r.split for r in hash_split(df, w, "doc_id").collect()}
    # partitioning invariance
    got11 = {
        r.doc_id: r.split
        for r in hash_split(df.repartition(11), w, "doc_id").collect()
    }
    assert got == got11
    # growth stability: a 10x corpus assigns the original keys identically
    big = spark.createDataFrame([(i,) for i in range(40000)], "doc_id long")
    got_big = {r.doc_id: r.split for r in hash_split(big, w, "doc_id").collect()}
    assert all(got_big[k] == v for k, v in got.items())
    # first-split membership == hash_fraction_sample(0.8)
    frac = {r.doc_id for r in hash_fraction_sample(df, 0.8, "doc_id").collect()}
    assert {k for k, v in got.items() if v == "train"} == frac
    # proportions within 5 sigma
    n = len(got)
    for name, weight in w.items():
        cnt = sum(1 for v in got.values() if v == name)
        sigma = math.sqrt(weight * (1 - weight) * n)
        assert abs(cnt - weight * n) <= 5 * sigma, (name, cnt)
    # every row assigned, exactly the three labels
    assert set(got.values()) == set(w)

    with _pt.raises(ValueError, match="sum to 1"):
        hash_split(df, {"a": 0.5, "b": 0.6}, "doc_id")
    with _pt.raises(ValueError, match="positive"):
        hash_split(df, {"a": 1.5, "b": -0.5}, "doc_id")

    # a NULL key gets a NULL split — it must never silently land in
    # (and contaminate) the last split
    nk = spark.createDataFrame([(None,), (7,)], "doc_id long")
    rows = {r.doc_id: r.split for r in hash_split(nk, w, "doc_id").collect()}
    assert rows[None] is None and rows[7] in w


def test_intra_span_dedup_matches_pure_python(spark):
    """Within-doc repeated spans beyond max_occurrences are dropped
    (first occurrence kept), other docs untouched; overlapping
    self-repeats collapse; cross-doc repeats are NOT this operator's
    concern."""
    from mbfbigdatarandomforest_spark.operators.dedup import (
        intra_span_dedup,
        span_dedup,
    )

    n = 3
    docs = [
        (0, "x y z a b x y z c d x y z"),  # "x y z" three times
        (1, "p q r s t u"),                # no repeats
        (2, "x y z only once here"),       # cross-doc repeat only
        (3, "a a a a a"),                  # overlapping self-repeat
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r.doc_id: (r.text, r.n_tokens_kept, r.n_tokens_dropped)
        for r in intra_span_dedup(df, n=n, max_occurrences=1).collect()
    }

    want = {}
    for i, t in docs:
        tk = t.lower().split()
        seen: dict = {}
        cov: set = set()
        for j in range(len(tk) - n + 1):
            g = tuple(tk[j : j + n])
            seen[g] = seen.get(g, 0) + 1
            if seen[g] > 1:
                cov.update(range(j, j + n))
        kept = [tok for p, tok in enumerate(tk) if p not in cov]
        want[i] = (" ".join(kept), len(kept), len(tk) - len(kept))
    assert got == want
    # doc 0 keeps its first "x y z", doc 2 is untouched
    assert got[0][0].startswith("x y z a b")
    assert "x y z" not in got[0][0][5:]
    assert got[2] == ("x y z only once here", 6, 0)
    # composition: intra then cross-doc span dedup runs clean
    composed = span_dedup(
        intra_span_dedup(df, n=n).select("doc_id", "text"), n=n
    ).collect()
    assert len(composed) == len(docs)


def test_cluster_embeddings_deterministic_and_correct(spark):
    """cluster_embeddings: every vector lands on its true L2-argmin
    centroid (checked vs numpy with the same deterministic fit), the
    assignment is invariant to repartitioning, and cluster ids stay in
    [0, k)."""
    import numpy as np
    from conftest import SF_DIR_SMALL
    from mbfbigdatarandomforest_spark.operators.similarity import (
        _fit_centroids_sampled,
        cluster_embeddings,
    )
    from mbfbigdatarandomforest_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR_SMALL, "embeddings")
    got = {
        r.vec_id: r.cluster
        for r in cluster_embeddings(emb, k=8, max_iter=8).collect()
    }
    got2 = {
        r.vec_id: r.cluster
        for r in cluster_embeddings(emb.repartition(7), k=8, max_iter=8).collect()
    }
    assert got == got2
    assert set(got.values()) <= set(range(8))

    cent = _fit_centroids_sampled(
        emb, vec_col="embedding", id_col="vec_id", k=8, seed=42, max_iter=8
    )
    from mbfbigdatarandomforest_spark.operators.similarity import _sq_dists

    rows = emb.select("vec_id", "embedding").collect()
    for r in rows:
        # the SAME expansion-form distance the operator uses — the
        # subtract-then-square form rounds differently and can flip
        # argmin on near-ties, which would flake this test
        v = np.array([r.embedding], dtype=np.float64)
        d2 = _sq_dists(v, cent)[0]
        assert got[r.vec_id] == int(d2.argmin()), r.vec_id

    # quarantine contract: NULL / wrong-dim / non-finite embeddings get
    # cluster -1 instead of killing the assignment pass
    dim = cent.shape[1]
    bad = spark.createDataFrame(
        [
            (9001, None),
            (9002, [1.0] * (dim + 3)),
            (9003, [float("nan")] * dim),
            (9004, [0.5] * dim),
        ],
        f"vec_id long, embedding array<double>",
    )
    got_bad = {
        r.vec_id: r.cluster
        for r in cluster_embeddings(
            emb.select("vec_id", "embedding").unionByName(
                bad.select(
                    "vec_id",
                    F.transform("embedding", lambda x: x.cast("float")).alias(
                        "embedding"
                    ),
                )
            ),
            k=8,
            max_iter=8,
        ).collect()
    }
    assert got_bad[9001] == -1 and got_bad[9002] == -1 and got_bad[9003] == -1
    assert 0 <= got_bad[9004] < 8


def test_curation_funnel_v2_monotone_and_conserving(spark):
    """The v2 funnel (Gopher → LM tail-drop → dedup → decontam → DSIR →
    pack): doc counts strictly ordered down the funnel, token budget
    monotone under ONE tokenizer, and packing conserves the surviving
    token budget exactly (stage 6 == stage 5)."""
    from conftest import SF_DIR_SMALL
    from mbfbigdatarandomforest_spark.registry import load_all

    rows = {
        r["stage"]: (r["n_docs"], r["n_bpe_tokens"])
        for r in load_all()["curation_funnel_v2"].fn(spark, SF_DIR_SMALL).collect()
    }
    order = [
        "0_raw", "1_gopher_quality", "2_lm_head_middle",
        "3_exact_dedup", "4_decontaminated", "5_dsir_selected",
    ]
    assert set(rows) == set(order) | {"6_packed_blocks"}
    for a, b in zip(order, order[1:]):
        assert rows[a][0] >= rows[b][0], (a, b)
        assert rows[a][1] >= rows[b][1], (a, b)
    # the packed row carries stage 5's budget forward by construction;
    # token conservation itself is pack_sequences' pytest invariant
    assert rows["6_packed_blocks"][1] == rows["5_dsir_selected"][1]
    assert 0 < rows["6_packed_blocks"][0] <= rows["5_dsir_selected"][0]


def test_materialize_packed_blocks_reconstructs_stream(spark):
    """Concatenating the materialized blocks in block order reproduces
    the corpus token stream in doc_id order, every block is exactly
    max_tokens except the last, and block token counts match the
    manifest's accounting."""
    from conftest import SF_DIR_SMALL
    from mbfbigdatarandomforest_spark.operators.text import (
        materialize_packed_blocks,
        pack_sequences,
    )

    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
    max_tokens = 128
    manifest = pack_sequences(docs, max_tokens)
    blocks = materialize_packed_blocks(docs, manifest).orderBy("block_id").collect()

    stream = []
    for r in docs.orderBy("doc_id").select("text").collect():
        stream += [t for t in r["text"].strip().split() if t]
    got = []
    for i, b in enumerate(blocks):
        toks = b["text"].split(" ") if b["text"] else []
        assert b["n_tokens"] == len(toks), b["block_id"]
        if i < len(blocks) - 1:
            assert b["n_tokens"] == max_tokens, b["block_id"]
        got += toks
    assert got == stream


def test_materialize_blocks_split_doc_boundary(spark):
    """A doc straddling a block boundary contributes the right span to
    each side (slice arithmetic is 1-based under the hood)."""
    from mbfbigdatarandomforest_spark.operators.text import (
        materialize_packed_blocks,
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f g h")], "doc_id long, text string"
    )
    out = {
        r["block_id"]: r["text"]
        for r in materialize_packed_blocks(docs, pack_sequences(docs, 4)).collect()
    }
    assert out == {0: "a b c d", 1: "e f g h"}


def test_pack_sequences_with_real_bpe_counts(spark):
    """pack_sequences' token_count_col contract composes with the real
    tokenizer: packing on bpe_token_counts' n_bpe_tokens produces blocks
    whose manifest sums exactly to the corpus BPE total."""
    from conftest import SF_DIR_SMALL
    from mbfbigdatarandomforest_spark.operators import bpe
    from mbfbigdatarandomforest_spark.operators.text import pack_sequences
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
    wc = [(r["word"], r["c"]) for r in bpe.word_counts(docs).collect()]
    merges = bpe.learn_bpe(wc, 60)
    counted = bpe.bpe_token_counts(docs, merges)
    manifest = pack_sequences(
        counted, max_tokens=512, id_col="doc_id", token_count_col="n_bpe_tokens"
    )
    total_bpe = counted.agg(F.sum("n_bpe_tokens")).first()[0]
    assert manifest.agg(F.sum("n_tokens")).first()[0] == total_bpe
    sizes = {
        r["block_id"]: r["s"]
        for r in manifest.groupBy("block_id")
        .agg(F.sum("n_tokens").alias("s"))
        .collect()
    }
    last = max(sizes)
    for b, s in sizes.items():
        assert s == 512 or b == last, (b, s)


def test_curation_pipeline_runner_end_to_end(tmp_path):
    """The one-command curation runner writes every artifact and its
    funnel is monotone; blocks' total tokens equal the kept corpus
    token stream (subprocess — the user-facing CLI path)."""
    import json
    import subprocess
    import sys

    out = tmp_path / "cur"
    r = subprocess.run(
        [
            sys.executable, "run_curation_pipeline.py",
            "--sf-dir", "/root/testdata/sf0.001", "--out", str(out),
        ],
        capture_output=True, text=True, timeout=600,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads((out / "summary.json").read_text())
    stages = summary["stages"]
    order = sorted(stages)
    for a, b in zip(order, order[1:]):
        assert stages[a] >= stages[b], (a, b)
    assert summary["n_blocks"] > 0
    for sub in ("datasheet", "funnel", "manifest", "blocks", "kept_docs"):
        assert any((out / sub).iterdir()), sub


def test_curation_pipeline_c4_with_dedup_index_cycle(tmp_path):
    """r13 review: --c4-clean must run BEFORE the --dedup-index gate so
    the gate fingerprints the SAME cleaned text the index stored —
    run 2 re-ships run 1's files and the gate drops exactly the
    indexed (run-1 kept) copies even though C4 rewrote every text."""
    import json
    import subprocess
    import sys

    good_line = "the quick crawler and parser walk the corpus daily."
    src = tmp_path / "dump" / "web"
    src.mkdir(parents=True)

    def doc(i: int) -> str:
        # a junk line C4 strips — so raw text ≠ cleaned text for EVERY
        # doc, the condition under which a post-gate C4 would break
        return "\n".join(
            [f"the document {i} opens with words and more text."]
            + [good_line] * 4
            + ["this trailing line never terminates and must vanish"]
        )

    for i in range(5):
        (src / f"d{i}.txt").write_text(doc(i))
    idx = tmp_path / "idx"

    def run(tag: str):
        out = tmp_path / f"cur{tag}"
        r = subprocess.run(
            [
                sys.executable, "run_curation_pipeline.py",
                "--text-dir", str(tmp_path / "dump"), "--out", str(out),
                "--c4-clean", "--c4-min-sentences", "3",
                "--dedup-index", str(idx), "--dedup-index-append",
                "--keep-fraction", "1.0",
            ],
            capture_output=True, text=True, timeout=600,
            cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads((out / "summary.json").read_text())

    s1 = run("1")
    assert s1["dedup_index"]["bootstrap"] is True
    kept1 = s1["stages"]["5_dsir_selected"]
    assert kept1 > 0
    # run 2: same five files plus one genuinely new doc
    (src / "new.txt").write_text(
        "\n".join([f"a brand new page arrives with words and the rest."]
                  + [good_line] * 4)
    )
    s2 = run("2")
    d2 = s2["dedup_index"]
    assert d2["bootstrap"] is False
    assert d2["ingested"] == 6  # all six passed C4 before the gate
    # the gate drops exactly the indexed (run-1 KEPT) copies — cleaned
    # text matched cleaned fingerprints
    assert d2["fresh"] == 6 - kept1
    assert s2["stages"]["0_raw"] == 6 - kept1


def test_curation_pipeline_r13_flags_compose(tmp_path):
    """r13 composition smoke: --c4-clean + --packing bestfit + --lm-dir
    in ONE run — the cleaned corpus feeds the persisted-LM funnel and
    packs whole-doc; the summary carries all three records and the
    artifacts agree."""
    import json
    import subprocess
    import sys

    import pandas as pd

    good_line = "the quick crawler and parser walk the corpus daily."
    src = tmp_path / "dump" / "web"
    src.mkdir(parents=True)
    for i in range(5):
        (src / f"keep_{i}.txt").write_text(
            "\n".join([f"the document {i} opens with words and more text."]
                      + [good_line] * 4)
        )
    (src / "brace.txt").write_text(
        "\n".join([good_line] * 4 + ["A brace { appears mid page here."])
    )
    out = tmp_path / "cur"
    r = subprocess.run(
        [
            sys.executable, "run_curation_pipeline.py",
            "--text-dir", str(tmp_path / "dump"), "--out", str(out),
            "--c4-clean", "--c4-min-sentences", "3",
            "--packing", "bestfit", "--packers", "2",
            "--lm-dir", str(tmp_path / "lm"),
            "--max-tokens", "128", "--keep-fraction", "1.0",
        ],
        capture_output=True, text=True, timeout=600,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads((out / "summary.json").read_text())
    assert summary["c4_clean"] == {"ingested": 6, "passed": 5}
    assert summary["packing"] == "bestfit"
    assert summary["lm"]["loaded"] is False  # bootstrapped this run
    m = pd.read_parquet(out / "manifest")
    assert (m.groupby("block_id")["n_tokens"].sum() <= 128).all()
    assert (m.groupby("doc_id").size() == 1).all()  # whole-doc packing
    blocks = pd.read_parquet(out / "blocks")
    assert blocks["n_tokens"].sum() == m["n_tokens"].sum()


def test_curation_pipeline_c4_span_dedup_stage(tmp_path):
    """r14: --c4-span-dedup composes after --c4-clean — a doc re-shipping
    another's three-sentence span loses exactly those sentences (the
    first doc keeps them), and the summary records the stage."""
    import json
    import subprocess
    import sys

    import pandas as pd

    good = [
        "the quick crawler walks the corpus daily and carefully.",
        "the parser then reads every fetched page tonight.",
        "the curator finally scores and keeps the best text.",
    ]

    def filler(vocab: list[str], k: int) -> list[str]:
        # enough distinct full sentences that every doc clears the
        # downstream quality funnel even after losing the span — and
        # distinct VOCABULARY per doc so the funnel's own near-dedup
        # tier never collapses the fixture docs into one survivor
        return [
            f"the {vocab[i % len(vocab)]} report number {i} explains "
            f"how {vocab[(i + 1) % len(vocab)]} conditions shaped the "
            f"{vocab[(i + 2) % len(vocab)]} outcome this season."
            for i in range(k)
        ]

    va = ["amber", "bridge", "copper", "delta", "ember", "fjord"]
    vb = ["garlic", "harvest", "indigo", "jasmine", "kettle", "lantern"]
    vc = ["marble", "nickel", "orchid", "pepper", "quartz", "russet"]
    src = tmp_path / "dump" / "web"
    src.mkdir(parents=True)
    (src / "a_original.txt").write_text(
        "\n".join(filler(va, 4) + good + filler(va[::-1], 4))
    )
    (src / "b_reship.txt").write_text(
        "\n".join(filler(vb, 4) + good + filler(vb[::-1], 4))
    )
    (src / "c_fresh.txt").write_text("\n".join(filler(vc, 9)))
    out = tmp_path / "cur"
    r = subprocess.run(
        [
            sys.executable, "run_curation_pipeline.py",
            "--text-dir", str(tmp_path / "dump"), "--out", str(out),
            "--c4-clean", "--c4-min-sentences", "3",
            "--c4-span-dedup",
            "--keep-fraction", "1.0",
        ],
        capture_output=True, text=True, timeout=600,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads((out / "summary.json").read_text())
    rec = summary["c4_span_dedup"]
    assert rec["docs"] == 3
    assert rec["sentences_dropped"] == 3  # b's re-shipped span, once
    import glob

    files = glob.glob(str(out / "kept_docs" / "*.json*"))
    kept = pd.concat([pd.read_json(f, lines=True) for f in files])
    texts = " || ".join(kept["text"].tolist())
    # the span survives AT MOST once: the stage removed every copy but
    # the keeper's (sentences_dropped above pins exactly one removal);
    # whether the keeper doc itself then clears the LM tail-bucket cut
    # is the funnel's business, not this stage's
    assert texts.count("the quick crawler walks") <= 1
    # and both a-and-b can never both carry it
    per_doc = [t.count("the quick crawler walks") for t in kept["text"]]
    assert all(c <= 1 for c in per_doc)


def test_curation_pipeline_persistable_lm(tmp_path):
    """r13: --lm-dir — the perplexity-filter LM trains ONCE (run 1
    bootstraps and saves the artifact) and later snapshots LOAD it
    instead of refitting (CCNet's fixed-reference-LM posture). Run 2
    must report loaded=True and, because corpus and model are
    identical, reproduce run 1's funnel byte-for-byte."""
    import json
    import subprocess
    import sys

    lm_dir = tmp_path / "lm"

    def run(tag: str):
        out = tmp_path / f"cur{tag}"
        r = subprocess.run(
            [
                sys.executable, "run_curation_pipeline.py",
                "--sf-dir", "/root/testdata/sf0.001", "--out", str(out),
                "--lm-dir", str(lm_dir),
            ],
            capture_output=True, text=True, timeout=600,
            cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads((out / "summary.json").read_text())

    s1 = run("1")
    assert s1["lm"] == {"loaded": False, "order": 2}
    assert (lm_dir / "meta").exists()  # the artifact landed
    s2 = run("2")
    assert s2["lm"] == {"loaded": True, "order": 2}
    assert s2["stages"] == s1["stages"]  # same corpus + same LM
    assert s2["n_blocks"] == s1["n_blocks"]


def test_curation_pipeline_bestfit_packing(tmp_path):
    """r13: --packing bestfit — the kept corpus packs via whole-doc
    BFD: no document under --max-tokens appears in more than one
    block, per-block token sums respect the capacity, and total tokens
    equal the stream packer's accounting for the same corpus
    (subprocess — the user-facing CLI path)."""
    import json
    import subprocess
    import sys

    import pandas as pd

    out = tmp_path / "cur"
    r = subprocess.run(
        [
            sys.executable, "run_curation_pipeline.py",
            "--sf-dir", "/root/testdata/sf0.001", "--out", str(out),
            "--packing", "bestfit", "--packers", "4",
            "--max-tokens", "128",
        ],
        capture_output=True, text=True, timeout=600,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads((out / "summary.json").read_text())
    assert summary["packing"] == "bestfit"
    m = pd.read_parquet(out / "manifest")
    assert set(m.columns) >= {
        "block_id", "doc_id", "span_start", "span_end", "n_tokens"
    }
    per_block = m.groupby("block_id")["n_tokens"].sum()
    assert (per_block <= 128).all()
    # sf0.001 docs max out under 128 tokens → no doc splits at all
    assert (m.groupby("doc_id").size() == 1).all()
    blocks = pd.read_parquet(out / "blocks")
    assert blocks["n_tokens"].sum() == m["n_tokens"].sum()
    assert summary["n_blocks"] == m["block_id"].nunique()


def test_curation_pipeline_c4_clean_stage(tmp_path):
    """r13: --c4-clean runs the C4 heuristics BEFORE the funnel — page
    rules (lorem ipsum, brace) drop whole documents, line rules rebuild
    the surviving text (javascript/short/unterminated lines gone), and
    the summary records ingested vs passed (subprocess — the
    user-facing CLI path)."""
    import gzip
    import json
    import subprocess
    import sys

    good_line = "the quick crawler and parser walk the corpus daily."
    src = tmp_path / "dump" / "web"
    src.mkdir(parents=True)
    for i in range(4):
        (src / f"keep_{i}.txt").write_text(
            "\n".join([f"the document {i} opens with words and more text."]
                      + [good_line] * 4)
        )
    (src / "lorem.txt").write_text(
        "\n".join([good_line] * 4 + ["About lorem ipsum placeholder text."])
    )
    (src / "brace.txt").write_text(
        "\n".join([good_line] * 4 + ["A brace { appears mid page here."])
    )
    (src / "lines.txt").write_text(
        "\n".join(
            [good_line] * 5
            + [
                "Please enable javascript to continue browsing.",
                "this trailing line never terminates and must vanish",
            ]
        )
    )
    out = tmp_path / "cur"
    r = subprocess.run(
        [
            sys.executable, "run_curation_pipeline.py",
            "--text-dir", str(tmp_path / "dump"), "--out", str(out),
            "--c4-clean", "--c4-min-sentences", "3",
            "--keep-fraction", "1.0",
        ],
        capture_output=True, text=True, timeout=600,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads((out / "summary.json").read_text())
    assert summary["c4_clean"] == {"ingested": 7, "passed": 5}
    assert summary["stages"]["0_raw"] == 5  # lorem + brace pages gone
    kept = []
    for f in list((out / "kept_docs").glob("*.json.gz")) + list(
        (out / "kept_docs").glob("*.json")
    ):
        opener = gzip.open if f.suffix == ".gz" else open
        with opener(f, "rt") as fh:
            kept.extend(json.loads(ln) for ln in fh if ln.strip())
    texts = [d["text"] for d in kept]
    assert texts  # the funnel kept documents
    for t in texts:
        assert "javascript" not in t.lower()
        assert "never terminates" not in t
        assert "lorem ipsum" not in t.lower()
        assert "{" not in t
    # the lines.txt survivor kept its five good lines
    lines_doc = [t for t in texts if t.count(good_line) == 5]
    assert lines_doc and all(
        len(t.split("\n")) == t.count(".") for t in lines_doc
    )


def test_materialize_rejects_foreign_unit_manifest(spark):
    """A manifest packed in BPE units must be refused by the
    materializer (unit-mismatch guard), not silently sliced wrong."""
    import pytest
    from mbfbigdatarandomforest_spark.operators import bpe
    from mbfbigdatarandomforest_spark.operators.text import (
        materialize_packed_blocks,
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [(1, "aa bb aa"), (2, "cc aa")], "doc_id long, text string"
    )
    merges = bpe.learn_bpe([("aa", 3), ("bb", 1), ("cc", 1)], 0)  # chars only
    counted = bpe.bpe_token_counts(docs, merges)
    foreign = pack_sequences(
        counted, max_tokens=4, token_count_col="n_bpe_tokens"
    )
    with pytest.raises(Exception, match="span units"):
        materialize_packed_blocks(docs, foreign).collect()
    # validate=False bypasses (documented escape hatch)
    materialize_packed_blocks(docs, foreign, validate=False).collect()


def test_minhash_hot_bucket_cap(spark):
    """A pathological cluster of identical docs must not mint O(m²) LSH
    candidates when max_bucket_size is set; on a post-exact-dedup corpus
    the cap changes nothing (the production pipeline order)."""
    from mbfbigdatarandomforest_spark.operators import dedup as dd
    from pyspark.sql import functions as F

    base = [(i, f"unique doc number {i} with words w{i} x{i} y{i} z{i}") for i in range(30)]
    clones = [(1000 + i, "the same boilerplate text repeated forever and ever again") for i in range(200)]
    docs = spark.createDataFrame(base + clones, "doc_id long, text string")

    uncapped = dd.banded_minhash_pairs(docs, threshold=0.5)
    capped = dd.banded_minhash_pairs(docs, threshold=0.5, max_bucket_size=50)
    # the clone cluster alone is ~19,900 pairs; the cap removes them
    assert uncapped.count() >= 19_900
    assert capped.count() < 1_000

    # production order: exact dedup first → no giant buckets → the cap
    # is a no-op and results match the uncapped run exactly
    keep = dd.exact_dedup(docs).select(F.col("keep_id").alias("doc_id"))
    survivors = docs.join(keep, "doc_id", "left_semi")
    a = {(r["id_a"], r["id_b"]) for r in dd.banded_minhash_pairs(survivors, threshold=0.5).collect()}
    b = {(r["id_a"], r["id_b"]) for r in dd.banded_minhash_pairs(survivors, threshold=0.5, max_bucket_size=50).collect()}
    assert a == b


def test_materialize_bpe_unit_blocks(spark):
    """End-to-end real-tokenizer shards: BPE counts drive the manifest,
    BPE token arrays drive materialization — blocks of exactly
    max_tokens BPE tokens whose concatenation reproduces the corpus BPE
    stream in doc order."""
    from conftest import SF_DIR_SMALL
    from mbfbigdatarandomforest_spark.operators import bpe
    from mbfbigdatarandomforest_spark.operators.text import (
        materialize_packed_blocks,
        pack_sequences,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet").limit(100)
    wc = [(r["word"], r["c"]) for r in bpe.word_counts(docs).collect()]
    merges = bpe.learn_bpe(wc, 40)
    arrays = bpe.doc_token_arrays(docs, merges)
    counted = arrays.select(
        "doc_id", F.size("tokens").alias("n_bpe_tokens")
    )
    manifest = pack_sequences(
        counted, max_tokens=64, token_count_col="n_bpe_tokens"
    )
    blocks = (
        materialize_packed_blocks(docs, manifest, tokens_df=arrays)
        .orderBy("block_id")
        .collect()
    )
    stream = []
    for r in arrays.orderBy("doc_id").collect():
        stream += list(r["tokens"])
    got = []
    for i, b in enumerate(blocks):
        toks = b["text"].split(" ") if b["text"] else []
        assert b["n_tokens"] == len(toks)
        if i < len(blocks) - 1:
            assert b["n_tokens"] == 64
        got += toks
    assert got == stream


def test_curation_funnel_v2_matches_sequential_composition(spark):
    """The r6 one-enriched-pass funnel must produce EXACTLY the stage
    rows of the sequential semi-join composition it replaced (the
    per-doc signals are set-independent; the set-dependent decisions —
    LM cutoffs over stage-1 survivors, dedup keep among stage-2, DSIR
    fit on stage-4 — see the same subsets). This pins the equivalence
    the restructure argued from first principles."""
    from conftest import SF_DIR_SMALL
    from mbfbigdatarandomforest_spark.operators import bpe as bpe_ops
    from mbfbigdatarandomforest_spark.operators import importance as imp
    from mbfbigdatarandomforest_spark.operators import ngram_lm as lm_ops
    from mbfbigdatarandomforest_spark.operators.text import (
        gopher_quality_filter,
        pack_sequences,
    )
    from mbfbigdatarandomforest_spark.registry import load_all
    from mbfbigdatarandomforest_spark.sources.catalog import load_table

    got = {
        r["stage"]: (r["n_docs"], r["n_bpe_tokens"])
        for r in load_all()["curation_funnel_v2"].fn(spark, SF_DIR_SMALL).collect()
    }

    # --- the pre-r6 sequential composition, reconstructed verbatim ---
    docs = load_table(spark, SF_DIR_SMALL, "documents")
    bench = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0").cache()
    target = corpus.filter(F.col("lang") == "en")
    wc = bpe_ops.word_counts(corpus, max_words=None).cache()
    merges = bpe_ops.learn_bpe(
        [(r["word"], r["c"]) for r in wc.collect()], num_merges=100
    )
    encoded = bpe_ops.encode_vocab(wc, merges).select("word", "n_tokens").cache()

    def stage(name, df):
        per_doc = bpe_ops.bpe_token_counts(df, merges, encoded=encoded)
        return per_doc.agg(
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("n_bpe_tokens"), F.lit(0)).alias("n_bpe_tokens"),
        )

    quality = (
        gopher_quality_filter(
            corpus, min_words=20, min_stopword_hits=1, min_alpha_word_frac=0.5
        )
        .filter("quality_pass")
        .select(*corpus.columns)
        .localCheckpoint()
    )
    lm = lm_ops.train_bigram_lm(target, vocab_size=50_000)
    keep_ppl = (
        lm_ops.perplexity_buckets(lm_ops.score_cross_entropy(lm, quality))
        .filter(F.col("bucket") != "tail")
        .select("doc_id")
    )
    head_mid = quality.join(keep_ppl, "doc_id", "left_semi").localCheckpoint()
    keep_ids = dd.exact_dedup(head_mid).select(F.col("keep_id").alias("doc_id"))
    deduped = head_mid.join(keep_ids, "doc_id", "left_semi").localCheckpoint()
    clean_ids = (
        dd.decontaminate(deduped, bench, n=5)
        .filter(~F.col("contaminated"))
        .select("doc_id")
    )
    clean = deduped.join(clean_ids, "doc_id", "left_semi").localCheckpoint()
    k = max(1, int(0.6 * clean.count()))
    selected = imp.gumbel_topk(
        imp.dsir_log_weights(clean, target, buckets=4096), k
    ).select("doc_id")
    mixed = clean.join(selected, "doc_id", "left_semi").localCheckpoint()
    manifest = pack_sequences(mixed, max_tokens=256)
    n_blocks = manifest.select(F.count_distinct("block_id")).first()[0]
    want = {}
    for name, frame in [
        ("0_raw", corpus),
        ("1_gopher_quality", quality),
        ("2_lm_head_middle", head_mid),
        ("3_exact_dedup", deduped),
        ("4_decontaminated", clean),
        ("5_dsir_selected", mixed),
    ]:
        row = stage(name, frame).first()
        want[name] = (row["n_docs"], row["n_bpe_tokens"])
    want["6_packed_blocks"] = (n_blocks, want["5_dsir_selected"][1])
    for frame in (corpus, wc, encoded):
        frame.unpersist()
    lm.unpersist()

    assert got == want, {k: (got.get(k), want.get(k)) for k in set(got) | set(want)}


def test_curation_pipeline_text_dir_ingestion(tmp_path):
    """--text-dir mode: the CLI curates a raw crawl-dump directory tree
    (one doc per file, benchmark/ subdir feeding decontamination) end
    to end — same artifacts, monotone funnel, no parquet input
    anywhere."""
    import json
    import subprocess
    import sys

    base = tmp_path / "dump"
    for src in ("web", "books"):
        d = base / src
        d.mkdir(parents=True)
        for i in range(15):
            body = (
                f"the quick brown document number {src}{i} talks about "
                f"topic {i % 4} and the text keeps going with plenty of "
                "ordinary words so that the gopher quality rules accept "
                "it happily as a real document for the pipeline"
            )
            (d / f"doc{i}.txt").write_text(body + "\n")
    bdir = base / "benchmark"
    bdir.mkdir()
    (bdir / "eval0.txt").write_text(
        "held out benchmark evaluation passage entirely distinct words\n"
    )
    out = tmp_path / "cur"
    r = subprocess.run(
        [
            sys.executable, "run_curation_pipeline.py",
            "--text-dir", str(base), "--out", str(out),
            "--max-tokens", "64",
        ],
        capture_output=True, text=True, timeout=600,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads((out / "summary.json").read_text())
    stages = summary["stages"]
    assert stages["0_raw"] == 30  # benchmark files are NOT corpus
    order = sorted(stages)
    for a, b in zip(order, order[1:]):
        assert stages[a] >= stages[b], (a, b)
    assert stages["5_dsir_selected"] > 0 and summary["n_blocks"] > 0
    for sub in ("funnel", "manifest", "blocks", "kept_docs"):
        assert any((out / sub).iterdir()), sub
    assert not (out / "datasheet").exists()  # sf-dir-bound, skipped


def test_compact_dedup_index_preserves_gate_and_repairs_retry(
    spark, tmp_path
):
    """r13: index compaction. After a build + an append + a RETRIED
    (duplicated) append, compaction must (a) leave the gate's kept set
    bit-identical, (b) collapse the duplicate fingerprint/bucket/
    shingle rows the retry minted, and (c) cut the per-append file
    accumulation. The retry case matters beyond hygiene: duplicated
    bucket rows inflate the hot-bucket guard's window counts, so the
    CAPPED gate is only correct again after compaction — asserted
    against a fresh single-append twin."""
    import mbfbigdatarandomforest_spark.operators.dedup as dd_ops

    from conftest import SF_DIR_SMALL

    docs = (
        spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
        .select("doc_id", "text")
    )
    ref = docs.filter(F.col("doc_id") % 3 == 0)
    accepted = docs.filter(F.col("doc_id") % 3 == 1).limit(40)
    new = docs.filter(F.col("doc_id") % 3 == 2)
    idx = str(tmp_path / "idx")
    dd_ops.build_dedup_index(ref, idx)
    dd_ops.append_dedup_index(accepted, idx)
    dd_ops.append_dedup_index(accepted, idx)  # the retried append
    twin = str(tmp_path / "twin")  # what a clean history looks like
    dd_ops.build_dedup_index(ref, twin)
    dd_ops.append_dedup_index(accepted, twin)

    def gate(path, **kw):
        return sorted(
            r["doc_id"]
            for r in dd_ops.incremental_dedup(
                new, index=path, threshold=0.7, **kw
            ).collect()
        )

    before = gate(idx)
    files_before = len(list((tmp_path / "idx" / "buckets").glob("*.parquet")))
    counts = dd_ops.compact_dedup_index(spark, idx)
    assert gate(idx) == before == gate(twin)  # uncapped gate unchanged
    # the retry's duplicate rows are gone: counts equal the clean twin
    for sub in ("fingerprints", "buckets", "shingles"):
        assert counts[sub] == spark.read.parquet(f"{twin}/{sub}").count()
    files_after = len(list((tmp_path / "idx" / "buckets").glob("*.parquet")))
    assert files_after < files_before
    # the CAPPED gate sees true bucket sizes again post-compaction
    assert gate(idx, max_bucket_size=3) == gate(twin, max_bucket_size=3)
    # compaction is idempotent
    assert dd_ops.compact_dedup_index(spark, idx) == counts
    assert gate(idx) == before


def test_curation_pipeline_dedup_index_cycle(tmp_path):
    """r13: the ingestion cycle through the CLI — run 1 bootstraps the
    dedup index from its kept docs; run 2's snapshot re-ships copies
    of run-1 documents plus genuinely new ones, and the gate drops
    exactly the copies of docs the index HOLDS (run-1 kept) while
    copies of run-1's funnel-REJECTED docs and the new docs pass."""
    import json
    import subprocess
    import sys

    def body(tag, i):
        # enough DISTINCT (alphabetic — the Gopher alpha-word rule)
        # tokens per doc that pairwise Jaccard sits well under the 0.7
        # near-dup gate — the gate must only drop exact re-ships of
        # indexed docs, not the fixture's siblings
        import string

        li = string.ascii_lowercase
        uniq = " ".join(
            f"nonce{tag}{li[i % 26]}{li[(i // 26) % 26]}{li[j]}"
            for j in range(14)
        )
        return (
            f"the quick brown document number {tag}{li[i % 26]} keeps "
            f"plenty of ordinary words so the gopher rules accept it "
            f"{uniq}"
        )

    def run(tag, docs, extra=()):
        base = tmp_path / f"dump{tag}"
        d = base / "web"
        d.mkdir(parents=True)
        for name, text in docs.items():
            (d / f"{name}.txt").write_text(text + "\n")
        out = tmp_path / f"cur{tag}"
        r = subprocess.run(
            [
                sys.executable, "run_curation_pipeline.py",
                "--text-dir", str(base), "--out", str(out),
                "--max-tokens", "64", "--keep-fraction", "0.6",
                "--dedup-index", str(tmp_path / "idx"),
                "--dedup-index-append", *extra,
            ],
            capture_output=True, text=True, timeout=600,
            cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads((out / "summary.json").read_text())

    docs1 = {f"a{i}": body("a", i) for i in range(12)}
    docs1["short"] = "too short"  # funnel-rejected, never indexed
    s1 = run(1, docs1)
    assert s1["dedup_index"] == {
        "bootstrap": True,
        "appended": s1["stages"]["5_dsir_selected"],
    }
    n_kept1 = s1["stages"]["5_dsir_selected"]
    assert 0 < n_kept1 < len(docs1)

    # run 2: every run-1 doc re-shipped (same text = same fingerprint)
    # plus 6 new ones; gate must drop exactly the indexed (kept) set
    docs2 = dict(docs1)
    docs2.update({f"b{i}": body("b", i + 50) for i in range(6)})
    s2 = run(2, docs2)
    di = s2["dedup_index"]
    assert di["bootstrap"] is False
    assert di["ingested"] == len(docs2)
    # copies of indexed docs are gone; rejected-doc copies + new pass
    assert di["fresh"] == len(docs2) - n_kept1
    assert s2["stages"]["0_raw"] == di["fresh"]  # funnel sees the gated corpus
    assert di["appended"] == s2["stages"]["5_dsir_selected"] > 0
