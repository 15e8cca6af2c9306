"""Persistable semantic dedup index (r14): the embedding-side mirror
of the MinHash ingestion cycle — build → gate → append → gate, with
index ≡ rebuild pins, an exact (full-probe) brute-force oracle, and
the partition-pruned plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import mbfbigdatarandomforest_spark.operators.similarity as sim
from conftest import SF_DIR_SMALL

THRESHOLD = 0.8


def _frames(spark):
    emb = spark.read.parquet(f"{SF_DIR_SMALL}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    ref = emb.filter(F.col("vec_id") % 2 == 0)
    # new snapshot: the odd half + planted EXACT copies of ref vectors
    # under fresh ids (the cross-snapshot duplicates the gate exists
    # to catch — an exact copy routes to the identical probe list, so
    # its recall is guaranteed at ANY n_probe)
    planted = ref.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    new = emb.filter(F.col("vec_id") % 2 == 1).unionByName(planted)
    return ref, new


def _pairset(df):
    return {
        (r["new_id"], r["ref_id"], r["cosine_sim"]) for r in df.collect()
    }


def _brute_pairs(spark, new, ref, threshold):
    """Independent oracle: driver-side numpy over the full cross
    product, sequential-dimension dots (the engines' exactness
    contract), round-half-up to 6 like the Spark side."""
    import decimal

    nrows = new.orderBy("vec_id").collect()
    rrows = ref.orderBy("vec_id").collect()
    nv = np.array([r["embedding"] for r in nrows], dtype=np.float64)
    rv = np.array([r["embedding"] for r in rrows], dtype=np.float64)

    def seqnorm(m):
        acc = np.zeros(len(m))
        for d in range(m.shape[1]):
            acc += m[:, d] * m[:, d]
        return np.sqrt(acc)

    nn, rn = seqnorm(nv), seqnorm(rv)
    dots = np.zeros((len(nv), len(rv)))
    for d in range(nv.shape[1]):
        dots += nv[:, d][:, None] * rv[:, d][None, :]
    sims = dots / (nn[:, None] * rn[None, :])
    out = set()
    for i in range(len(nv)):
        for j in range(len(rv)):
            c = float(
                decimal.Decimal(sims[i, j]).quantize(
                    decimal.Decimal("0.000001"),
                    rounding=decimal.ROUND_HALF_UP,
                )
            )
            if c >= threshold:
                out.add((nrows[i]["vec_id"], rrows[j]["vec_id"], c))
    return out


def test_full_probe_gate_equals_brute_force(spark):
    """n_probe = k routes every new vector to every cell, so recall is
    exact — the gate must equal the brute-force cross oracle
    value-for-value (bit-exact cosines, HALF_UP rounding parity)."""
    ref, new = _frames(spark)
    k = 8
    got = _pairset(
        sim.incremental_ann_pairs(
            new, ref, threshold=THRESHOLD, n_clusters=k, n_probe=k
        )
    )
    want = _brute_pairs(spark, new, ref, THRESHOLD)
    assert got == want
    assert want  # the fixture really plants matches


def test_index_path_equals_rebuild_and_cycle(spark, tmp_path):
    """build → gate ≡ rebuild gate (pairs AND survivors) → append →
    gate 2 catches copies of round-1-accepted vectors; double-build
    raises; structural params come from the index."""
    ref, new = _frames(spark)
    idx = str(tmp_path / "semidx")
    sim.build_semantic_index(ref, idx, n_clusters=8)
    with pytest.raises(Exception):
        sim.build_semantic_index(ref, idx, n_clusters=8)

    kw = dict(threshold=THRESHOLD, n_probe=4)
    got = _pairset(sim.incremental_ann_pairs(new, index=idx, **kw))
    want = _pairset(
        sim.incremental_ann_pairs(new, ref, n_clusters=8, **kw)
    )
    assert got == want
    # planted exact copies are caught at ANY n_probe (identical vector
    # → identical probe list → the ref home cell is always covered)
    caught = {a for a, _, _ in got}
    planted_ids = {
        r["vec_id"]
        for r in new.filter(F.col("vec_id") >= 10_000_000).collect()
    }
    assert planted_ids <= caught

    kept = sim.incremental_semantic_dedup(new, index=idx, **kw)
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    assert kept_ids == {
        r["vec_id"] for r in new.collect()
    } - caught
    assert not (planted_ids & kept_ids)

    # ---- cycle: append survivors, gate a snapshot-2 with copies ----
    accepted = new.join(
        spark.createDataFrame([(i,) for i in kept_ids], "vec_id long"),
        "vec_id",
    )
    sim.append_semantic_index(accepted, idx)
    s2 = accepted.limit(5).select(
        (F.col("vec_id") + 50_000_000).alias("vec_id"), "embedding"
    )
    got2 = _pairset(sim.incremental_ann_pairs(s2, index=idx, **kw))
    # every copy of an appended vector is caught BY THE APPEND
    assert {a for a, _, _ in got2} == {
        r["vec_id"] for r in s2.collect()
    }
    want2 = _pairset(
        sim.incremental_ann_pairs(
            s2, ref.unionByName(accepted), n_clusters=8, **kw
        )
    )
    assert got2 == want2


def test_gate_scan_is_partition_pruned(spark, tmp_path):
    """The index gate reads ONLY the probed cells: the stored vectors
    scan carries a PartitionFilters clause on the cell key."""
    ref, new = _frames(spark)
    idx = str(tmp_path / "semidx_plan")
    sim.build_semantic_index(ref, idx, n_clusters=8)
    sh = spark.read.parquet(
        sim._semantic_subdir(idx, "vectors")
    ).filter(F.col("cell").isin([1, 2]))
    plan = sh._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters")[1][:80]
    # and the real gate runs green against the pruned layout
    n = sim.incremental_semantic_dedup(
        new, index=idx, threshold=THRESHOLD, n_probe=2
    ).count()
    assert 0 < n <= new.count()


def test_exactly_one_static_side_enforced(spark, tmp_path):
    ref, new = _frames(spark)
    with pytest.raises(ValueError, match="exactly one"):
        sim.incremental_ann_pairs(new)
    idx = str(tmp_path / "semidx_both")
    sim.build_semantic_index(ref, idx, n_clusters=4)
    with pytest.raises(ValueError, match="exactly one"):
        sim.incremental_ann_pairs(new, ref, index=idx)


def test_streaming_semantic_gate_matches_batch(spark, tmp_path):
    """r14: the semantic gate as a stream against the static index —
    drained result ≡ the batch gate of the union (per-row decision
    against static state; micro-batch boundaries cannot change it)."""
    from mbfbigdatarandomforest_spark.streaming.dedup import (
        run_incremental_semantic_dedup_available_now,
    )

    ref, new = _frames(spark)
    idx = str(tmp_path / "semidx_stream")
    sim.build_semantic_index(ref, idx, n_clusters=8)
    src = tmp_path / "src"
    new.repartition(3).write.parquet(str(src))
    got = run_incremental_semantic_dedup_available_now(
        spark,
        str(src),
        new.schema,
        str(tmp_path / "out"),
        idx,
        threshold=THRESHOLD,
        n_probe=4,
        source_options={"maxFilesPerTrigger": "1"},
    )
    want = sim.incremental_semantic_dedup(
        new, index=idx, threshold=THRESHOLD, n_probe=4
    )
    assert sorted(r["vec_id"] for r in got.collect()) == sorted(
        r["vec_id"] for r in want.collect()
    )
    # the planted exact copies are gone in the drained result too
    assert not [
        r for r in got.collect() if r["vec_id"] >= 10_000_000
    ]


def test_compact_semantic_index_and_crash_repair(spark, tmp_path):
    """Compaction collapses a retried append's duplicate rows without
    moving the gate answer, and every rename/delete boundary of the
    swap leaves a repairable, gate-correct index (the dedup index's
    crash discipline, applied here)."""
    import shutil

    import mbfbigdatarandomforest_spark.operators.dedup as dd

    ref, new = _frames(spark)
    pristine = str(tmp_path / "semidx_c")
    sim.build_semantic_index(ref, pristine, n_clusters=8)
    kw = dict(threshold=THRESHOLD, n_probe=4)
    acc = sim.incremental_semantic_dedup(
        new, index=pristine, **kw
    ).localCheckpoint()
    sim.append_semantic_index(acc, pristine)
    sim.append_semantic_index(acc, pristine)  # the at-least-once retry

    def kept(idx):
        return {
            r["vec_id"]
            for r in sim.incremental_semantic_dedup(
                new, index=idx, **kw
            ).collect()
        }

    want = kept(pristine)
    real_rename, real_delete = dd._fs_rename, dd._fs_delete
    boundary = 0
    while True:
        idx = str(tmp_path / f"crash_{boundary}")
        shutil.copytree(pristine, idx)
        budget = [boundary]

        def dying(fn):
            def _wrap(spark_, *a):
                if budget[0] <= 0:
                    raise IOError("injected crash")
                budget[0] -= 1
                return fn(spark_, *a)

            return _wrap

        dd._fs_rename = dying(real_rename)
        dd._fs_delete = dying(real_delete)
        try:
            counts = sim.compact_semantic_index(spark, idx)
            completed = True
        except IOError as e:
            assert "injected crash" in str(e)
            completed = False
        finally:
            dd._fs_rename, dd._fs_delete = real_rename, real_delete
        sim._read_semantic_meta(spark, idx)  # triggers the repair
        assert kept(idx) == want, f"boundary {boundary}"
        shutil.rmtree(idx, ignore_errors=True)
        if completed:
            # the retried append's duplicate ids collapsed
            n_ref = ref.count()
            assert counts["vectors"] == n_ref + acc.count()
            break
        boundary += 1
    assert boundary >= 3  # all three swap boundaries exercised


def test_dim_mismatch_raises_named_error(spark, tmp_path):
    """A frame from a different embedding model (wrong width) fails
    fast with a named error instead of an opaque numpy broadcast
    failure inside the routed kernel."""
    ref, _ = _frames(spark)
    idx = str(tmp_path / "semidx_dim")
    sim.build_semantic_index(ref, idx, n_clusters=4)
    bad = spark.createDataFrame(
        [(1, [0.1, 0.2, 0.3])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="dim 3 does not match"):
        sim.incremental_ann_pairs(bad, index=idx, threshold=0.5)
    with pytest.raises(ValueError, match="dim 3 does not match"):
        sim.append_semantic_index(bad, idx)
    # the PRELOADED-quantizer path (the streaming gate's hoisted-load
    # shape) must fail fast too — ADVICE r14: it previously skipped
    # the probe entirely, regaining the opaque broadcast error
    cents = sim.load_ivf_index(spark, sim._semantic_subdir(idx, "ivf"))
    with pytest.raises(ValueError, match="dim 3 does not match"):
        sim.incremental_ann_pairs(
            bad, index=idx, threshold=0.5, centroids=cents
        )


def _sum_sizes(spark, idx):
    return (
        spark.read.parquet(sim._semantic_subdir(idx, "cell_sizes"))
        .agg(F.sum("n"))
        .first()[0]
    )


def _n_vectors(spark, idx):
    return spark.read.parquet(sim._semantic_subdir(idx, "vectors")).count()


def test_capped_gate_equals_uncapped(spark, tmp_path):
    """r15 (r14 VERDICT item 1b): max_cell_size splits oversized cells
    into id-hash sub-cell pairs — an EXACT transform, so the capped
    gate must equal the uncapped gate value-for-value even with a cap
    tiny enough to force multi-way splits of every cell, on both
    static-side forms and on the intra-corpus path."""
    ref, new = _frames(spark)
    idx = str(tmp_path / "semidx_cap")
    sim.build_semantic_index(ref, idx, n_clusters=4)
    kw = dict(threshold=THRESHOLD, n_probe=3)
    want = _pairset(sim.incremental_ann_pairs(new, index=idx, **kw))
    got = _pairset(
        sim.incremental_ann_pairs(new, index=idx, max_cell_size=7, **kw)
    )
    assert got == want and want
    # in-flight reference path
    want_r = _pairset(
        sim.incremental_ann_pairs(new, ref, n_clusters=4, **kw)
    )
    got_r = _pairset(
        sim.incremental_ann_pairs(
            new, ref, n_clusters=4, max_cell_size=7, **kw
        )
    )
    assert got_r == want_r == want
    # intra-corpus (ann_dup_pairs): pairs, not gate — same exactness
    corpus = ref.unionByName(new)
    base = {
        (r["id_a"], r["id_b"], r["cosine_sim"])
        for r in sim.ann_dup_pairs(
            corpus, threshold=THRESHOLD, n_clusters=4, n_probe=3
        ).collect()
    }
    capped = {
        (r["id_a"], r["id_b"], r["cosine_sim"])
        for r in sim.ann_dup_pairs(
            corpus,
            threshold=THRESHOLD,
            n_clusters=4,
            n_probe=3,
            max_cell_size=7,
        ).collect()
    }
    assert capped == base and base
    # survivors through the full gate agree too
    kept_cap = {
        r["vec_id"]
        for r in sim.incremental_semantic_dedup(
            new, index=idx, max_cell_size=7, **kw
        ).collect()
    }
    kept_unc = {
        r["vec_id"]
        for r in sim.incremental_semantic_dedup(new, index=idx, **kw).collect()
    }
    assert kept_cap == kept_unc


def test_semantic_unclean_append_token_heals_watermark(
    spark, tmp_path, monkeypatch
):
    """r16 (the minhash tier's ADVICE token contract mirrored): a crash
    between append_semantic_index's vectors append and the cell_sizes
    delta leaves the occupancy watermark under-reporting — the
    ``append_pending`` token makes the next index open recount exactly,
    so ``rebuild_advised`` never mis-advises off a stale sum."""
    from mbfbigdatarandomforest_spark.operators.dedup import _fs_exists

    ref, new = _frames(spark)
    idx = str(tmp_path / "semidx_token")
    sim.build_semantic_index(ref, idx, n_clusters=4)
    pending = sim._semantic_subdir(idx, "append_pending")
    # healthy append claims and releases the token
    sim.append_semantic_index(new.limit(20).localCheckpoint(), idx)
    assert not _fs_exists(spark, pending)
    assert _sum_sizes(spark, idx) == _n_vectors(spark, idx)
    # crash the boundary the token covers
    monkeypatch.setattr(
        sim,
        "_append_cell_size_deltas",
        lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("crash before sizes delta")
        ),
    )
    with pytest.raises(RuntimeError, match="crash before sizes delta"):
        sim.append_semantic_index(new.limit(40).localCheckpoint(), idx)
    monkeypatch.undo()
    assert _fs_exists(spark, pending)
    assert _sum_sizes(spark, idx) < _n_vectors(spark, idx)  # stale
    # the next open — every gate/append/stats call starts with one —
    # recounts exactly and releases the token
    sim._read_semantic_meta(spark, idx)
    assert not _fs_exists(spark, pending)
    assert _sum_sizes(spark, idx) == _n_vectors(spark, idx)


def test_capped_batch_ann_pairs_adds_no_storage(spark):
    """r16 (VERDICT r15 finding 1): the capped BATCH ann_dup_pairs is
    storage-free — cell sizes come from a vector-free second routing
    pass and the verify frame from a role-tagged one, NOT from a
    localCheckpoint of the full routed corpus — so the call leaves no
    new persisted RDD blocks behind. (The r15 form spilled ~n_probe+1
    vector copies per row to executor storage even when no cell
    exceeded the cap — a multi-hundred-TB transient at 100 TB of
    embeddings. The incremental INDEX gate path may and does
    checkpoint its O(new) snapshot; the batch path has no such
    right-sized side.)"""
    ref, new = _frames(spark)
    corpus = ref.unionByName(new)
    jsc = spark.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    got = sim.ann_dup_pairs(
        corpus,
        threshold=THRESHOLD,
        n_clusters=4,
        n_probe=3,
        max_cell_size=7,
    ).collect()
    after = set(jsc.getPersistentRDDs().keySet().toArray())
    assert got  # the capped path really ran and found pairs
    assert after - before == set()  # and persisted nothing


def test_cell_sizes_invariant_and_watermark(spark, tmp_path):
    """r15 (r14 VERDICT item 1a/1c): sum(cell_sizes) ≡ count(vectors)
    at every lifecycle point (build, append, retried append,
    compaction, crash repair is covered by the boundary test), and the
    occupancy watermark flips rebuild_advised once appends outgrow the
    build corpus by the documented growth factor."""
    ref, new = _frames(spark)
    small = ref.orderBy("vec_id").limit(30).localCheckpoint()
    idx = str(tmp_path / "semidx_sizes")
    sim.build_semantic_index(small, idx, n_clusters=4)
    assert _sum_sizes(spark, idx) == _n_vectors(spark, idx) == 30

    stats0 = sim.semantic_index_stats(spark, idx)
    assert stats0["n_vectors"] == stats0["build_n"] == 30
    assert stats0["growth"] == 1.0
    assert stats0["rebuild_advised"] is False

    # append ~5× the build corpus: growth crosses the 4.0 threshold
    big = new.orderBy("vec_id").limit(150).localCheckpoint()
    stats1 = sim.append_semantic_index(big, idx)
    assert _sum_sizes(spark, idx) == _n_vectors(spark, idx) == 180
    assert stats1["n_vectors"] == 180
    assert stats1["growth"] == 180 / 30
    assert stats1["rebuild_advised"] is True

    # retried append inflates BOTH tables equally — the invariant holds
    sim.append_semantic_index(big, idx)
    assert _sum_sizes(spark, idx) == _n_vectors(spark, idx) == 330
    counts = sim.compact_semantic_index(spark, idx)
    assert counts["vectors"] == 180
    assert _sum_sizes(spark, idx) == _n_vectors(spark, idx) == 180
    # post-compaction the sizes table is folded: one row per cell
    sz = spark.read.parquet(sim._semantic_subdir(idx, "cell_sizes"))
    assert sz.groupBy("cell").count().filter("count > 1").count() == 0


def test_v1_index_stays_readable(spark, tmp_path):
    """A version-1 (r14) semantic index — no cell_sizes/, no build_n —
    still gates identically, still accepts appends, and stats fall
    back to counting the vectors partitions."""
    import shutil

    ref, new = _frames(spark)
    idx = str(tmp_path / "semidx_v1")
    sim.build_semantic_index(ref, idx, n_clusters=8)
    kw = dict(threshold=THRESHOLD, n_probe=4)
    want = _pairset(sim.incremental_ann_pairs(new, index=idx, **kw))

    # demote to the v1 layout: meta without occupancy anchors, no sizes
    meta = spark.read.parquet(sim._semantic_subdir(idx, "meta")).first()
    shutil.rmtree(sim._semantic_subdir(idx, "cell_sizes"))
    shutil.rmtree(sim._semantic_subdir(idx, "meta"))
    spark.createDataFrame(
        [(1, meta["k"], meta["dim"], meta["seed"])],
        "version int, k int, dim int, seed long",
    ).coalesce(1).write.parquet(sim._semantic_subdir(idx, "meta"))

    assert _pairset(sim.incremental_ann_pairs(new, index=idx, **kw)) == want
    stats = sim.semantic_index_stats(spark, idx)
    assert stats["n_vectors"] == ref.count()
    assert stats["build_n"] is None and stats["growth"] is None
    # append still works on v1 (no sizes delta to write)
    extra = new.limit(5)
    st2 = sim.append_semantic_index(extra, idx)
    assert st2["n_vectors"] == ref.count() + 5
    # double-build still refuses over an existing index
    with pytest.raises(ValueError, match="already exists"):
        sim.build_semantic_index(ref, idx, n_clusters=8)


def test_registered_semantic_index_cycle_query(spark):
    """The r15 registered query runs the full index lifecycle (build →
    capped gate → append → gate 2 → rebuild → gate 3 since r16) per
    invocation: both sentinel families must be fully caught — planted
    ref copies by the build, planted copies of round-1 SURVIVORS by
    the append AND still post-rebuild (exact copies route identically
    under any quantizer) — the occupancy watermark must ride along,
    and the per-leg walls land in the rows-only record."""
    from mbfbigdatarandomforest_spark.registry import load_all

    spec = load_all()["dedup_semantic_index_cycle"]
    assert spec.oracle is None  # rows-only by design (k-means + numpy)
    r = spec.fn(spark, SF_DIR_SMALL).collect()[0]
    assert r["planted1_kept"] == 0
    assert r["planted2_kept"] == 0
    assert 0 < r["kept1"] < r["n_snap1"]
    assert 0 < r["kept2"] < r["n_snap2"]
    assert r["index_vectors"] == r["n_ref"] + r["kept1"]
    assert r["rebuild_advised"] in (True, False)
    # r16 rebuild leg (VERDICT r15 item 5): watermark re-anchored and
    # the appended survivors' copies still fully caught by gate 3
    assert r["rebuilt"] is True
    assert r["planted2_kept_post_rebuild"] == 0
    assert 0 < r["post_rebuild_kept"] < r["n_snap2"]
    for leg in ("build_s", "gate1_s", "append_s", "gate2_s",
                "rebuild_s", "gate3_s"):
        assert r[leg] > 0


def test_rebuild_semantic_index(spark, tmp_path):
    """r15 (closing r14 What's-missing 4's loop): rebuild_advised now
    has an operator to trigger. After a rebuild over the accumulated
    vectors: the id set is preserved (retry duplicates collapsed),
    auto-k grows to the corpus (the IVF capacity rule), the watermark
    resets (growth 1.0), and the FULL-PROBE gate — exact at any
    quantizer — answers identically before and after. Every root-swap
    crash boundary leaves a repairable index."""
    import shutil

    import mbfbigdatarandomforest_spark.operators.dedup as dd

    ref, new = _frames(spark)
    small = ref.orderBy("vec_id").limit(30).localCheckpoint()
    idx = str(tmp_path / "semidx_rb")
    sim.build_semantic_index(small, idx, n_clusters=4)
    grown = new.orderBy("vec_id").limit(150).localCheckpoint()
    st = sim.append_semantic_index(grown, idx)
    sim.append_semantic_index(grown, idx)  # retried append
    assert st["rebuild_advised"] is True

    # probe = fresh ref vectors + exact copies of INDEXED vectors under
    # new ids — the copies guarantee non-empty matches at any quantizer
    probe = (
        ref.orderBy(F.desc("vec_id"))
        .limit(40)
        .unionByName(
            small.limit(10).select(
                (F.col("vec_id") + 900_000_000).alias("vec_id"),
                "embedding",
            )
        )
        .localCheckpoint()
    )

    def full_probe_gate(k):
        return _pairset(
            sim.incremental_ann_pairs(
                probe, index=idx, threshold=THRESHOLD, n_probe=k
            )
        )

    before = full_probe_gate(4)  # n_probe = current k = 4 → exact
    st2 = sim.rebuild_semantic_index(spark, idx)
    assert st2["n_vectors"] == 180  # duplicates collapsed
    assert st2["build_n"] == 180 and st2["growth"] == 1.0
    assert st2["rebuild_advised"] is False
    assert st2["k"] >= 16  # auto-k re-sized to the grown corpus
    after = full_probe_gate(st2["k"])  # full probe again → exact
    assert after == before and before
    # sizes invariant holds on the rebuilt layout
    assert _sum_sizes(spark, idx) == _n_vectors(spark, idx) == 180

    # --- crash boundaries of the whole-index root swap
    pristine = str(tmp_path / "rb_pristine")
    shutil.copytree(idx, pristine)
    real_rename, real_delete = dd._fs_rename, dd._fs_delete
    boundary = 0
    while True:
        c = str(tmp_path / f"rb_crash_{boundary}")
        shutil.copytree(pristine, c)
        budget = [boundary]

        def dying(fn):
            def _wrap(spark_, *a):
                if budget[0] <= 0:
                    raise IOError("injected crash")
                budget[0] -= 1
                return fn(spark_, *a)

            return _wrap

        dd._fs_rename = dying(real_rename)
        dd._fs_delete = dying(real_delete)
        try:
            sim.rebuild_semantic_index(spark, c)
            completed = True
        except IOError as e:
            assert "injected crash" in str(e)
            completed = False
        finally:
            dd._fs_rename, dd._fs_delete = real_rename, real_delete
        # the open-time root sweep restores a readable index; the gate
        # at full probe answers the pre-rebuild truth either way
        st3 = sim.semantic_index_stats(spark, c)
        assert st3["n_vectors"] == 180, f"boundary {boundary}"
        got = _pairset(
            sim.incremental_ann_pairs(
                probe, index=c, threshold=THRESHOLD, n_probe=st3["k"]
            )
        )
        assert got == before, f"boundary {boundary}"
        shutil.rmtree(c, ignore_errors=True)
        if completed:
            break
        boundary += 1
    assert boundary >= 3


def test_salt_cells_property_exact_pair_coverage(spark):
    """Direct pin of the 2-D sub-cell split's contract on randomized
    skewed inputs: every (left, right) pair of one cell meets in
    EXACTLY one (cell, __sa, __sb) group (so any per-group verify sees
    each pair once — the capped ≡ uncapped theorem), and no group
    exceeds ~max_cell_size rows."""
    import numpy as np

    rng = np.random.default_rng(1661)
    rows = []
    rid = 0
    # skewed cells: sizes 1, 3, 40, 170, 900 — caps below several
    sizes = {0: 1, 1: 3, 2: 40, 3: 170, 4: 900}
    for cell, n in sizes.items():
        for _ in range(n):
            role = int(rng.integers(0, 2))
            rows.append((cell, role, rid))
            rid += 1
    df = spark.createDataFrame(rows, "cell int, __role int, id long")
    cap = 64
    salted = sim._salt_cells(df, cap).localCheckpoint()

    # group-size bound: ≤ cap plus hash-uneven slack (2× is the
    # documented envelope; the expectation is ~cap)
    mx = (
        salted.groupBy("cell", "__sa", "__sb")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert mx <= 2 * cap, mx

    # exact pair coverage: joining the two roles on the full group key
    # yields every within-cell (left, right) pair EXACTLY once
    left = salted.filter("__role = 0").select(
        "cell", "__sa", "__sb", F.col("id").alias("l")
    )
    right = salted.filter("__role = 1").select(
        "cell", "__sa", "__sb", F.col("id").alias("r")
    )
    pairs = left.join(right, ["cell", "__sa", "__sb"]).groupBy(
        "cell", "l", "r"
    ).count()
    assert pairs.filter("count != 1").count() == 0
    want_pairs = 0
    base = df.groupBy("cell", "__role").count().collect()
    per = {}
    for r0 in base:
        per.setdefault(r0["cell"], {})[r0["__role"]] = r0["count"]
    for c, d in per.items():
        want_pairs += d.get(0, 0) * d.get(1, 0)
    assert pairs.count() == want_pairs > 0


def test_estimate_probe_recall(spark, tmp_path):
    """r15: measured IVF recall on a deterministic sample — the real
    quantity behind the rebuild_advised proxies. Full probe is exact
    (recall 1.0 by the pinned theorem); recall is monotone
    non-decreasing in n_probe; capping the truth pass normalizes to
    the relative contract."""
    ref, new = _frames(spark)
    idx = str(tmp_path / "semidx_recall")
    sim.build_semantic_index(ref, idx, n_clusters=8)

    n_new = new.count()
    out = sim.estimate_probe_recall(
        spark, idx, new, threshold=THRESHOLD,
        n_probes=(1, 2, 4, 8), sample_cap=n_new,
    )
    assert out["sample"] == n_new  # whole fixture incl. planted copies
    assert out["truth_n_probe"] == 8  # k — exact truth
    assert out["truth_pairs"] > 0  # the planted copies guarantee pairs
    rec = out["recall"]
    assert rec[8] == 1.0  # full probe IS the truth
    # monotone non-decreasing in n_probe
    vals = [rec[p] for p in (1, 2, 4, 8)]
    assert all(a <= b + 1e-12 for a, b in zip(vals, vals[1:])), vals
    assert all(0.0 <= v <= 1.0 for v in vals)
    # an exact copy always finds its twin even at n_probe=1 (identical
    # vector → identical rank-1 cell), so recall@1 is bounded away
    # from zero on this fixture
    assert rec[1] > 0.0

    # capped truth: relative recall vs a 4-probe reference — settings
    # at or past the truth cap report 1.0 by construction
    out2 = sim.estimate_probe_recall(
        spark, idx, new, threshold=THRESHOLD,
        n_probes=(1, 4, 8), sample_cap=n_new, truth_n_probe=4,
    )
    assert out2["recall"][4] == 1.0 and out2["recall"][8] == 1.0
    assert out2["recall"][1] <= 1.0


def test_capped_gate_plan_keeps_pruning_no_cartesian(spark, tmp_path):
    """Plan pin for the r15 bounded-verify lane: the salting join and
    the sub-cell explode sit AFTER the stored-vectors scan, so the
    probed-cells PartitionFilters pruning survives, the split table
    rides a broadcast join, and no nested-loop/cartesian appears."""
    ref, new = _frames(spark)
    idx = str(tmp_path / "semidx_capplan")
    sim.build_semantic_index(ref, idx, n_clusters=8)
    pairs = sim.incremental_ann_pairs(
        new, index=idx, threshold=THRESHOLD, n_probe=3, max_cell_size=7
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    # and the lane still answers (the plan really executes)
    assert pairs.count() > 0


def test_build_lock_claims_path_before_touching_anything(spark, tmp_path):
    """Review r15: the build claims its path ATOMICALLY (one-row lock,
    mode error) before the overwriting quantizer save — a crashed
    build (lock present, meta absent) fails a retry with a clear
    message instead of clobbering state, and a completed index refuses
    a second build without its quantizer being touched."""
    import os
    import shutil

    from mbfbigdatarandomforest_spark.operators.dedup import _fs_exists

    ref, _ = _frames(spark)
    idx = str(tmp_path / "semidx_lock")
    sim.build_semantic_index(ref, idx, n_clusters=4)
    # ADVICE r15 (low): the claim is RELEASED on success — lock
    # presence always means an interrupted build, so a completed index
    # (and every rebuild output) must not carry lock/ forever
    assert not _fs_exists(spark, sim._semantic_subdir(idx, "lock"))
    # completed index: double build refuses at the meta check
    with pytest.raises(ValueError, match="already exists"):
        sim.build_semantic_index(ref, idx, n_clusters=4)
    # crashed build: lock without meta → named error on retry
    crashed = str(tmp_path / "semidx_crashed")
    shutil.copytree(idx, crashed)
    shutil.rmtree(sim._semantic_subdir(crashed, "meta"))
    os.makedirs(sim._semantic_subdir(crashed, "lock"))
    with pytest.raises(ValueError, match="did not\n?.*complete|did not"):
        sim.build_semantic_index(ref, crashed, n_clusters=4)
    # crash BETWEEN the final meta write and the unlock: the index is
    # complete — the next open sweeps the stale claim (r16)
    stale = str(tmp_path / "semidx_stale_lock")
    shutil.copytree(idx, stale)
    os.makedirs(sim._semantic_subdir(stale, "lock"))
    sim._read_semantic_meta(spark, stale)
    assert not _fs_exists(spark, sim._semantic_subdir(stale, "lock"))
