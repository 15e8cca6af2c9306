"""Dedup-index layout v2 (r14): crash-safe compaction swap, open-time
repair, version-1 compatibility, and the O(new)-IO plan shapes.

The swap contract under test (r13 VERDICT finding 4 / item 5): each
sub-table compaction is write(__compact) → rename(live → __old) →
rename(__compact → live) → delete(__old). We kill the filesystem at
EVERY rename/delete boundary of the whole compaction run and assert
the index stays readable AND gate-correct after the open-time repair —
no crash point may lose data or serve a half-swapped table.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

import mbfbigdatarandomforest_spark.operators.dedup as dd
from conftest import SF_DIR_SMALL

KW = dict(threshold=0.7, seed=42)


def _corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet").select(
        "doc_id", "text"
    )
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1).unionByName(
        ref.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
        )
    )
    return ref, new


def _kept(spark, new, idx):
    return {
        r["doc_id"]
        for r in dd.incremental_dedup(new, index=idx, **KW).collect()
    }


def _build_pristine(spark, tmp_path):
    """One v2 index with an append (so bucket_sizes has delta rows and
    every sub-table has multiple file sets) plus a retried append (the
    duplicate rows compaction must collapse)."""
    ref, new = _corpus(spark)
    idx = str(tmp_path / "pristine")
    dd.build_dedup_index(ref, idx)
    accepted = dd.incremental_dedup(new, index=idx, **KW).localCheckpoint()
    dd.append_dedup_index(accepted, idx)
    dd.append_dedup_index(accepted, idx)  # at-least-once retry
    return ref, new, idx


def test_compact_swap_crash_at_every_boundary(spark, tmp_path):
    """Kill the compaction at every rename/delete boundary; after the
    open-time repair the gate answer must equal the pristine index's,
    and a re-run compaction must complete cleanly."""
    ref, new, pristine = _build_pristine(spark, tmp_path)
    want = _kept(spark, new, pristine)

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
            dd.compact_dedup_index(spark, idx)
            completed = True
        except IOError as e:
            assert "injected crash" in str(e)
            completed = False
        finally:
            dd._fs_rename, dd._fs_delete = real_rename, real_delete

        # open-time repair must restore a readable, gate-correct index
        meta = dd._read_dedup_index_meta(spark, idx)
        assert meta["version"] == 3
        assert _kept(spark, new, idx) == want, f"boundary {boundary}"
        # ...and a SIZE-CONSISTENT one (r14 review finding 1): a crash
        # between the buckets swap and the sizes swap would otherwise
        # leave retry-inflated deltas beside a deduplicated buckets
        # table, silently diverging the CAPPED gate from rebuild
        # semantics — the repair's recount restores sum(sizes) ≡
        # count(buckets) per key at every boundary, which is exactly
        # what the hot-bucket guard derives from
        sizes = (
            spark.read.parquet(dd._index_subdir(idx, "bucket_sizes"))
            .groupBy("band", "bucket")
            .agg(F.sum("n").alias("n"))
        )
        truth = (
            spark.read.parquet(dd._index_subdir(idx, "buckets"))
            .groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sizes.exceptAll(truth).count() == 0, f"boundary {boundary}"
        assert truth.exceptAll(sizes).count() == 0, f"boundary {boundary}"
        # and the re-run compaction completes and stays correct
        counts = dd.compact_dedup_index(spark, idx)
        assert counts["fingerprints"] > 0
        assert _kept(spark, new, idx) == want, f"boundary {boundary} post"
        shutil.rmtree(idx, ignore_errors=True)
        if completed:
            break
        boundary += 1
    # the swap machinery really was exercised: 4 sub-tables × 3 fs ops
    assert boundary >= 12


def test_repair_is_noop_on_healthy_index(spark, tmp_path):
    ref, new, idx = _build_pristine(spark, tmp_path)
    assert dd._repair_dedup_index(spark, idx) == []


def test_v1_index_layout_still_readable(spark, tmp_path):
    """An r13-built index (version 1: plain parquet everywhere, no
    bucket_sizes) must keep gating identically to the rebuild path,
    including the hot-bucket cap's window fallback."""
    ref, new = _corpus(spark)
    idx = str(tmp_path / "v1")
    # hand-write the v1 layout exactly as r13's build_dedup_index did
    n, bands, rows_per_band, seed = 3, 8, 4, 42
    spark.createDataFrame(
        [(1, n, bands, rows_per_band, seed)],
        "version int, n int, bands int, rows_per_band int, seed long",
    ).coalesce(1).write.parquet(dd._index_subdir(idx, "meta"))
    from mbfbigdatarandomforest_spark.operators.text import fingerprint

    ref.select(fingerprint("text").alias("fp")).distinct().write.parquet(
        dd._index_subdir(idx, "fingerprints")
    )
    sh = dd._shingle_frame(ref, "text", "doc_id", n).cache()
    sh.count()
    sh.write.parquet(dd._index_subdir(idx, "shingles"))
    dd._band_buckets(
        sh, bands=bands, rows_per_band=rows_per_band, seed=seed
    ).write.parquet(dd._index_subdir(idx, "buckets"))
    sh.unpersist()

    for cap in (None, 2):
        got = {
            r["doc_id"]
            for r in dd.incremental_dedup(
                new, index=idx, max_bucket_size=cap, **KW
            ).collect()
        }
        want = {
            r["doc_id"]
            for r in dd.incremental_dedup(
                new, ref, max_bucket_size=cap, **KW
            ).collect()
        }
        assert got == want, f"cap={cap}"


def test_v2_capped_gate_has_no_index_side_window(spark, tmp_path):
    """The r14 point: with max_bucket_size ON, the v2 index plan must
    contain NO window over the stored buckets (the v1 O(index) shuffle)
    — the guard is a broadcast anti-join against the precomputed hot
    set — and the shingle scan must carry a partition filter."""
    ref, new = _corpus(spark)
    idx = str(tmp_path / "v2plan")
    dd.build_dedup_index(ref, idx)
    pairs = dd.incremental_minhash_pairs(
        new, index=idx, max_bucket_size=3, **KW
    )
    # the result is localCheckpointed; re-derive the plan un-checkpointed
    # by peeking at the physical plan of the same computation's parts:
    # the hot-set guard itself
    meta = dd._read_dedup_index_meta(spark, idx)
    assert meta["version"] == 3
    b_ref = dd._ensure_index_table(
        spark, idx, "buckets", ("band", "bucket"), meta["file_buckets"]
    )
    hot = (
        spark.read.parquet(dd._index_subdir(idx, "bucket_sizes"))
        .groupBy("band", "bucket")
        .agg(F.sum("n").alias("__bsz"))
        .filter(F.col("__bsz") > 3)
        .select("band", "bucket")
    )
    guarded = b_ref.join(F.broadcast(hot), ["band", "bucket"], "left_anti")
    plan = guarded._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "Window" not in plan

    # when the new side is too big to broadcast (the 100 TB shape),
    # the candidate join must exploit the stored bucketing: ONE
    # Exchange (the new side shuffling to the index's partitioning),
    # none on the index side
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        b_new = spark.createDataFrame(
            [(0, 1, 7), (1, 2, 9)], "new_id long, band int, bucket long"
        )
        j = b_new.join(b_ref, ["band", "bucket"])
        j.count()
        jplan = j._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in jplan
        assert jplan.count("Exchange hashpartitioning") == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)

    # the shingle layout supports partition pruning: the gate's
    # candidate-derived __pb filter lands in PartitionFilters, not a
    # post-scan Filter
    sh = (
        spark.read.parquet(dd._index_subdir(idx, "shingles"))
        .filter(F.col("__pb").isin([1, 2, 3]))
    )
    shplan = sh._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in shplan and "__pb" in shplan.split(
        "PartitionFilters"
    )[1][:80]

    # equality vs rebuild stays pinned with the new guard
    def pairset(df):
        return {(r["new_id"], r["ref_id"]) for r in df.collect()}

    assert pairset(pairs) == pairset(
        dd.incremental_minhash_pairs(new, ref, max_bucket_size=3, **KW)
    )


def test_v2_bucket_sizes_delta_sum_is_exact(spark, tmp_path):
    """bucket_sizes carries per-append DELTA rows; their per-key SUM
    must equal a fresh count over the buckets table after any number
    of appends, and compaction collapses them to one row per key."""
    ref, new, idx = _build_pristine(spark, tmp_path)
    sizes = (
        spark.read.parquet(dd._index_subdir(idx, "bucket_sizes"))
        .groupBy("band", "bucket")
        .agg(F.sum("n").alias("n"))
    )
    truth = (
        spark.read.parquet(dd._index_subdir(idx, "buckets"))
        .groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sizes.exceptAll(truth).count() == 0
    assert truth.exceptAll(sizes).count() == 0
    dd.compact_dedup_index(spark, idx)
    post = spark.read.parquet(dd._index_subdir(idx, "bucket_sizes"))
    assert (
        post.groupBy("band", "bucket").count().filter("count > 1").count()
        == 0
    )


def test_rebuild_after_delete_clears_stale_catalog(spark, tmp_path):
    """Deleting an index directory and rebuilding at the SAME path must
    work in one session: the build drops the stale catalog entries
    (their location's files are gone) and re-registers over the new
    ones; the gate answers from the new build."""
    import shutil

    ref, new = _corpus(spark)
    idx = str(tmp_path / "rebuilt")
    dd.build_dedup_index(ref, idx)
    want = _kept(spark, new, idx)
    shutil.rmtree(idx)
    dd.build_dedup_index(ref, idx)
    assert _kept(spark, new, idx) == want


def test_index_path_with_single_quote(spark, tmp_path):
    """ADVICE r14: the bucketed sub-tables' CREATE TABLE ... LOCATION
    literal is built from the caller's index path — a path containing
    a single quote must register (escaped), not break the SQL."""
    ref, new = _corpus(spark)
    idx = str(tmp_path / "quo'ted" / "idx")
    dd.build_dedup_index(ref, idx)
    plain = str(tmp_path / "plain")
    dd.build_dedup_index(ref, plain)
    assert _kept(spark, new, idx) == _kept(spark, new, plain)


def _hot_set(spark, idx):
    return {
        (r["band"], r["bucket"])
        for r in spark.read.parquet(
            dd._index_subdir(idx, "hot_buckets")
        ).collect()
    }


def _summed_hot(spark, idx, cap):
    return {
        (r["band"], r["bucket"])
        for r in spark.read.parquet(dd._index_subdir(idx, "bucket_sizes"))
        .groupBy("band", "bucket")
        .agg(F.sum("n").alias("t"))
        .filter(F.col("t") > cap)
        .collect()
    }


def test_cap_of_record_hot_set_lifecycle(spark, tmp_path):
    """r15 (r14 VERDICT finding 2 / item 2): an index built with a cap
    of record materializes its hot-(band,bucket) set at build and
    every append, so the matching-cap gate reads it with zero per-gate
    aggregate — and the gate answers stay EXACTLY the v2 aggregate
    path's and the rebuild path's, across append, retried append, and
    compaction. Hot keys never cool between compactions."""
    ref, new = _corpus(spark)
    cap = 2  # tiny: the fixture really produces hot buckets
    idx = str(tmp_path / "capidx")
    dd.build_dedup_index(ref, idx, max_bucket_size=cap)
    plain = str(tmp_path / "plainidx")
    dd.build_dedup_index(ref, plain)  # no cap of record: aggregate lane

    kwc = dict(KW, max_bucket_size=cap)

    def gate(index):
        return {
            r["doc_id"]
            for r in dd.incremental_dedup(new, index=index, **kwc).collect()
        }

    want = {
        r["doc_id"]
        for r in dd.incremental_dedup(new, ref, **kwc).collect()
    }
    assert gate(idx) == gate(plain) == want
    # the materialized hot set IS the exact summed-totals hot set
    assert _hot_set(spark, idx) == _summed_hot(spark, idx, cap)

    # append maintains the hot set (old ∪ newly-hot touched keys)
    acc = dd.incremental_dedup(new, index=idx, **kwc).localCheckpoint()
    hot_before = _hot_set(spark, idx)
    dd.append_dedup_index(acc, idx)
    hot_after = _hot_set(spark, idx)
    assert hot_after == _summed_hot(spark, idx, cap)
    assert hot_before <= hot_after  # never cools

    # deterministic growth: two identical-text copies of 5 ref docs
    # push EVERY bucket those docs occupy to ≥ 3 > cap — all of their
    # (band, bucket) keys MUST turn hot
    meta = dd._read_dedup_index_meta(spark, idx)
    base5 = ref.orderBy("doc_id").limit(5).localCheckpoint()
    for off in (900_000_000, 910_000_000):
        dd.append_dedup_index(
            base5.select(
                (F.col("doc_id") + off).alias("doc_id"), "text"
            ),
            idx,
        )
    hot_grown = _hot_set(spark, idx)
    assert hot_grown == _summed_hot(spark, idx, cap)
    assert hot_after <= hot_grown
    sh5 = dd._shingle_frame(base5, "text", "doc_id", meta["n"])
    must_hot = {
        (r["band"], r["bucket"])
        for r in dd._band_buckets(
            sh5,
            bands=meta["bands"],
            rows_per_band=meta["rows_per_band"],
            seed=meta["seed"],
        ).collect()
    }
    assert must_hot and must_hot <= hot_grown

    # retried append: hot set derived from inflated sums stays
    # consistent with those sums (the documented retry contract)...
    dd.append_dedup_index(acc, idx)
    assert _hot_set(spark, idx) == _summed_hot(spark, idx, cap)
    # ...and compaction squeezes the inflation back out, exactly
    dd.compact_dedup_index(spark, idx)
    assert _hot_set(spark, idx) == _summed_hot(spark, idx, cap)

    # post-cycle equality: the capped gate on the index ≡ the rebuild
    # gate over everything the index accumulated (ref ∪ accepted ∪ the
    # planted copies)
    s2 = new.limit(40)
    got2 = {
        r["doc_id"]
        for r in dd.incremental_dedup(s2, index=idx, **kwc).collect()
    }
    full_ref = ref.unionByName(acc.select("doc_id", "text"))
    for off in (900_000_000, 910_000_000):
        full_ref = full_ref.unionByName(
            base5.select((F.col("doc_id") + off).alias("doc_id"), "text")
        )
    want2 = {
        r["doc_id"]
        for r in dd.incremental_dedup(s2, full_ref, **kwc).collect()
    }
    assert got2 == want2


def test_unclean_append_token_heals_stale_hot_set(spark, tmp_path, monkeypatch):
    """ADVICE r15 (low): a crash between append_dedup_index's
    bucket_sizes delta append and the hot-set fold leaves a bucket that
    just crossed the cap MISSING from the materialized hot set — the
    v3 matching-cap gate would silently diverge from the v2 exact-sum
    lane until a retry or compaction. The append claims an
    ``append_pending`` token before the derived-state tail; a surviving
    token makes the NEXT index open recount exactly — gates self-heal
    with no caller retry."""
    ref, _ = _corpus(spark)
    cap = 2
    idx = str(tmp_path / "tokenidx")
    dd.build_dedup_index(ref, idx, max_bucket_size=cap)
    base5 = ref.orderBy("doc_id").limit(5).localCheckpoint()
    # first copy: those docs' buckets reach 2 (= cap, not hot yet)
    dd.append_dedup_index(
        base5.select((F.col("doc_id") + 900_000_000).alias("doc_id"), "text"),
        idx,
    )
    assert not dd._fs_exists(spark, dd._index_subdir(idx, "append_pending"))
    # second copy pushes them to 3 > cap — crash RIGHT BEFORE the fold
    monkeypatch.setattr(
        dd,
        "_fold_hot_buckets",
        lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("crash before hot fold")
        ),
    )
    with pytest.raises(RuntimeError, match="crash before hot fold"):
        dd.append_dedup_index(
            base5.select(
                (F.col("doc_id") + 910_000_000).alias("doc_id"), "text"
            ),
            idx,
        )
    monkeypatch.undo()
    # the crash left the token AND a stale (strictly smaller) hot set
    assert dd._fs_exists(spark, dd._index_subdir(idx, "append_pending"))
    assert _hot_set(spark, idx) < _summed_hot(spark, idx, cap)
    # the next open — any gate or append starts with one — self-heals
    dd._read_dedup_index_meta(spark, idx)
    assert not dd._fs_exists(spark, dd._index_subdir(idx, "append_pending"))
    assert _hot_set(spark, idx) == _summed_hot(spark, idx, cap)


def test_cap_of_record_gate_plan_has_no_sizes_aggregate(spark, tmp_path):
    """The matching-cap gate's candidate side reads the PRECOMPUTED
    hot set — its plan contains no aggregate over bucket_sizes (the
    v2 lane's per-gate sum, which grew with the index's delta rows)."""
    ref, new = _corpus(spark)
    idx = str(tmp_path / "capplan")
    dd.build_dedup_index(ref, idx, max_bucket_size=3)
    meta = dd._read_dedup_index_meta(spark, idx)
    assert meta["cap"] == 3
    b_ref = dd._ensure_index_table(
        spark, idx, "buckets", ("band", "bucket"), meta["file_buckets"]
    )
    hot = spark.read.parquet(dd._index_subdir(idx, "hot_buckets")).select(
        "band", "bucket"
    )
    guarded = b_ref.join(F.broadcast(hot), ["band", "bucket"], "left_anti")
    plan = guarded._jdf.queryExecution().executedPlan().toString()
    # the guard side is a plain broadcast scan of the materialized hot
    # set — NO aggregate anywhere in the lane (the v2 path's per-gate
    # SUM over bucket_sizes is gone), and the join is the broadcast
    # anti-join, never a nested loop
    assert "HashAggregate" not in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "BroadcastNestedLoop" not in plan


def test_maintenance_cli_compacts_all_three_states(spark, tmp_path):
    """r15 (r14 VERDICT item 4): ONE maintenance surface — the curation
    CLI's --index-compact/--index-stats compacts the dedup index, the
    semantic index, and the streaming recrawl state in a single
    maintenance-slot run, and every gate answers identically
    before/after. The stats report carries the v2 size tables and the
    semantic occupancy watermark."""
    import json
    import subprocess
    import sys

    import mbfbigdatarandomforest_spark.operators.similarity as sim
    from conftest import SF_DIR_SMALL

    # --- dedup index with a retried append (rows to collapse)
    ref, new = _corpus(spark)
    didx = str(tmp_path / "didx")
    dd.build_dedup_index(ref, didx, max_bucket_size=2)
    acc = dd.incremental_dedup(
        new, index=didx, max_bucket_size=2, **KW
    ).localCheckpoint()
    dd.append_dedup_index(acc, didx)
    dd.append_dedup_index(acc, didx)
    want_text = {
        r["doc_id"]
        for r in dd.incremental_dedup(
            new, index=didx, max_bucket_size=2, **KW
        ).collect()
    }

    # --- semantic index with a retried append
    emb = spark.read.parquet(f"{SF_DIR_SMALL}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    sref = emb.filter(F.col("vec_id") % 2 == 0)
    snew = emb.filter(F.col("vec_id") % 2 == 1)
    sidx = str(tmp_path / "sidx")
    sim.build_semantic_index(sref, sidx, n_clusters=4)
    sim.append_semantic_index(snew.limit(20), sidx)
    sim.append_semantic_index(snew.limit(20), sidx)
    want_sem = {
        r["vec_id"]
        for r in sim.incremental_semantic_dedup(
            snew, index=sidx, threshold=0.8, n_probe=2
        ).collect()
    }

    # --- recrawl state with delta rows per url
    rstate = str(tmp_path / "rstate")
    for lm in ("2024-01-01 00:00:00", "2024-02-01 00:00:00"):
        spark.createDataFrame(
            [("https://a.example/p", lm), ("https://b.example/q", lm)],
            "loc string, __lm string",
        ).select(
            "loc", F.col("__lm").cast("timestamp").alias("__lm")
        ).write.mode("append").parquet(rstate)
    want_state = {
        (r["loc"], str(r["m"]))
        for r in spark.read.parquet(rstate)
        .groupBy("loc")
        .agg(F.max("__lm").alias("m"))
        .collect()
    }

    r = subprocess.run(
        [
            sys.executable, "run_curation_pipeline.py",
            "--dedup-index", didx,
            "--semantic-index", sidx,
            "--recrawl-state", rstate,
            "--index-compact", "--index-stats",
        ],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads(r.stdout.strip().splitlines()[-1])
    assert report["maintenance"] is True
    assert report["dedup_index"]["compacted"]["fingerprints"] > 0
    assert report["dedup_index"]["stats"]["cap"] == 2
    assert report["dedup_index"]["stats"]["hot_buckets"] >= 0
    sem_stats = report["semantic_index"]["stats"]
    assert sem_stats["n_vectors"] == sref.count() + 20  # retry collapsed
    assert "rebuild_advised" in sem_stats
    assert report["recrawl_state"]["compacted"]["urls"] == 2
    assert report["recrawl_state"]["stats"]["delta_rows"] == 2  # folded

    # gates answer identically after the maintenance run
    got_text = {
        r2["doc_id"]
        for r2 in dd.incremental_dedup(
            new, index=didx, max_bucket_size=2, **KW
        ).collect()
    }
    assert got_text == want_text
    got_sem = {
        r2["vec_id"]
        for r2 in sim.incremental_semantic_dedup(
            snew, index=sidx, threshold=0.8, n_probe=2
        ).collect()
    }
    assert got_sem == want_sem
    got_state = {
        (r2["loc"], str(r2["m"]))
        for r2 in spark.read.parquet(rstate)
        .groupBy("loc")
        .agg(F.max("__lm").alias("m"))
        .collect()
    }
    assert got_state == want_state


def test_maintenance_cli_crash_between_states(spark, tmp_path):
    """r16 (r15 VERDICT item 6): the one-invocation maintenance CLI,
    KILLED between states — after the dedup compaction completes,
    before the semantic one starts (injected os._exit, no cleanup, the
    lost-host failure) — must leave every state openable and
    gate-identical: the completed compaction stands, the untouched
    states are unharmed (still carrying their retry duplicates), and
    the retried invocation finishes the job."""
    import json
    import os
    import subprocess
    import sys

    import mbfbigdatarandomforest_spark.operators.similarity as sim
    from conftest import SF_DIR_SMALL

    ref, new = _corpus(spark)
    didx = str(tmp_path / "didx")
    dd.build_dedup_index(ref, didx, max_bucket_size=2)
    acc = dd.incremental_dedup(
        new, index=didx, max_bucket_size=2, **KW
    ).localCheckpoint()
    dd.append_dedup_index(acc, didx)
    dd.append_dedup_index(acc, didx)  # retry rows for compaction
    want_text = {
        r["doc_id"]
        for r in dd.incremental_dedup(
            new, index=didx, max_bucket_size=2, **KW
        ).collect()
    }
    emb = spark.read.parquet(f"{SF_DIR_SMALL}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    sref = emb.filter(F.col("vec_id") % 2 == 0)
    snew = emb.filter(F.col("vec_id") % 2 == 1)
    sidx = str(tmp_path / "sidx")
    sim.build_semantic_index(sref, sidx, n_clusters=4)
    sim.append_semantic_index(snew.limit(20), sidx)
    sim.append_semantic_index(snew.limit(20), sidx)  # retry duplicates
    want_sem = {
        r["vec_id"]
        for r in sim.incremental_semantic_dedup(
            snew, index=sidx, threshold=0.8, n_probe=2
        ).collect()
    }
    rstate = str(tmp_path / "rstate")
    spark.createDataFrame(
        [("https://a.example/p", "2024-01-01 00:00:00")],
        "loc string, __lm string",
    ).select(
        "loc", F.col("__lm").cast("timestamp").alias("__lm")
    ).write.parquet(rstate)

    args = [
        sys.executable, "run_curation_pipeline.py",
        "--dedup-index", didx,
        "--semantic-index", sidx,
        "--recrawl-state", rstate,
        "--index-compact", "--index-stats",
    ]
    env = dict(os.environ, SPARK_GRAFT_MAINT_CRASH_POINT="after_dedup_state")
    r = subprocess.run(
        args, capture_output=True, text=True, timeout=600,
        cwd="/root/repo", env=env,
    )
    assert r.returncode == 137, (r.returncode, r.stderr[-2000:])
    assert "injected crash at after_dedup_state" in r.stderr

    # the completed dedup compaction stands and gates identically
    got_text = {
        r2["doc_id"]
        for r2 in dd.incremental_dedup(
            new, index=didx, max_bucket_size=2, **KW
        ).collect()
    }
    assert got_text == want_text
    # the semantic state was never touched: retry duplicates still on
    # disk, and its gate still answers identically through repair
    assert (
        spark.read.parquet(sidx + "/vectors").count()
        == sref.count() + 40
    )
    got_sem = {
        r2["vec_id"]
        for r2 in sim.incremental_semantic_dedup(
            snew, index=sidx, threshold=0.8, n_probe=2
        ).collect()
    }
    assert got_sem == want_sem

    # the retried invocation (no crash) finishes the remaining states
    r2 = subprocess.run(
        args, capture_output=True, text=True, timeout=600,
        cwd="/root/repo",
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    report = json.loads(r2.stdout.strip().splitlines()[-1])
    assert report["semantic_index"]["stats"]["n_vectors"] == (
        sref.count() + 20  # retry duplicates collapsed this time
    )
    assert report["recrawl_state"]["compacted"]["urls"] == 1
    got_sem2 = {
        r3["vec_id"]
        for r3 in sim.incremental_semantic_dedup(
            snew, index=sidx, threshold=0.8, n_probe=2
        ).collect()
    }
    assert got_sem2 == want_sem


def test_registered_dedup_index_cycle_query(spark):
    """The r15 registered text-tier index-cycle query: build (cap of
    record) → capped gate → append → gate 2 per invocation — both
    round-1 sentinel tiers (exact + near) caught by the build, the
    round-2 exact copies of SURVIVORS caught by the append; the
    fingerprint count reflects the append."""
    from mbfbigdatarandomforest_spark.registry import load_all

    spec = load_all()["dedup_index_cycle"]
    assert spec.oracle is None  # rows-only by design
    r = spec.fn(spark, SF_DIR_SMALL).collect()[0]
    assert r["planted1_kept"] == 0
    assert r["planted2_kept"] == 0
    assert 0 < r["kept1"] < r["n_snap1"]
    assert 0 < r["kept2"] < r["n_snap2"]
    assert r["index_fingerprints"] >= r["n_ref"]
    assert r["hot_buckets"] == 0  # cap of record far above occupancy
    # r16: per-leg walls ride the rows-only record (VERDICT r15 item 2)
    for leg in ("build_s", "gate1_s", "append_s", "gate2_s"):
        assert r[leg] > 0


def test_missing_hot_buckets_recreated_not_bricked(spark, tmp_path):
    """Review r15: a build crash between the bucket_sizes and
    hot_buckets writes leaves a cap-of-record index whose gates work —
    append and compaction must RECREATE the hot table (exact, from the
    summed sizes) instead of failing on the missing dir."""
    import shutil

    ref, new = _corpus(spark)
    cap = 2
    idx = str(tmp_path / "nohot")
    dd.build_dedup_index(ref, idx, max_bucket_size=cap)
    shutil.rmtree(dd._index_subdir(idx, "hot_buckets"))  # the crash

    kwc = dict(KW, max_bucket_size=cap)
    # gate still answers (falls back to the summed-sizes lane)
    want = {
        r["doc_id"]
        for r in dd.incremental_dedup(new, ref, **kwc).collect()
    }
    assert {
        r["doc_id"]
        for r in dd.incremental_dedup(new, index=idx, **kwc).collect()
    } == want
    # append recreates the hot table exactly
    acc = dd.incremental_dedup(new, index=idx, **kwc).localCheckpoint()
    dd.append_dedup_index(acc, idx)
    assert _hot_set(spark, idx) == _summed_hot(spark, idx, cap)
    # and compaction over a hot-less copy recreates it too
    idx2 = str(tmp_path / "nohot2")
    dd.build_dedup_index(ref, idx2, max_bucket_size=cap)
    shutil.rmtree(dd._index_subdir(idx2, "hot_buckets"))
    dd.compact_dedup_index(spark, idx2)
    assert _hot_set(spark, idx2) == _summed_hot(spark, idx2, cap)


def test_maintenance_cli_rejects_no_op_invocations(tmp_path):
    """Review r15: maintenance flags with no state path (or
    --semantic-rebuild without --semantic-index) must error, never
    print an empty success report and exit 0."""
    import subprocess
    import sys

    for args in (
        ["--index-compact"],
        ["--semantic-rebuild"],
        ["--semantic-rebuild", "--dedup-index", str(tmp_path / "d")],
        ["--index-stats", "--semantic-recall-sample", "10",
         "--dedup-index", str(tmp_path / "d")],
    ):
        r = subprocess.run(
            [sys.executable, "run_curation_pipeline.py", *args],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )
        assert r.returncode == 2, (args, r.returncode, r.stdout[-300:])
