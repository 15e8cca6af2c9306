"""Structured Streaming rollup must agree with its batch twin when the
stream is fully drained (availableNow over the same parquet data).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR_SMALL
from mbfbigdatarandomforest_spark.sources.catalog import load_table
from mbfbigdatarandomforest_spark.streaming.events import run_available_now


def test_streaming_rollup_equals_batch(spark, tmp_path):
    # the file-stream source requires a directory of files
    import shutil

    src_dir = tmp_path / "events_stream"
    src_dir.mkdir()
    shutil.copy(f"{SF_DIR_SMALL}/events.parquet", src_dir / "part-0.parquet")
    got = run_available_now(spark, str(src_dir), query_name="t_rollup")
    want = (
        load_table(spark, SF_DIR_SMALL, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )
    g = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in got.collect()
    }
    w = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in want.collect()
    }
    assert set(g) == set(w)
    for k in w:
        assert g[k][0] == w[k][0]
        assert g[k][1] == pytest.approx(w[k][1])


def test_stateful_sessionization_matches_batch_twin(spark, tmp_path):
    """applyInPandasWithState sessionizer vs the window-function batch
    twin. With a single availableNow batch and processing-time timeouts,
    the stream emits every session EXCEPT each user's trailing open one
    (still in state when the drain stops) — assert exactly that."""
    import shutil

    from mbfbigdatarandomforest_spark.streaming.events import read_event_stream
    from mbfbigdatarandomforest_spark.streaming.sessions import (
        batch_sessionize,
        sessionize,
    )

    src_dir = tmp_path / "events_sessions"
    src_dir.mkdir()
    shutil.copy(f"{SF_DIR_SMALL}/events.parquet", src_dir / "part-0.parquet")

    stream = sessionize(
        read_event_stream(spark, str(src_dir), max_files_per_trigger=10),
        gap_seconds=1800,
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_start"], r["n_events"], round(r["total_value"], 6))
        for r in spark.table("t_sessions").collect()
    }

    batch = batch_sessionize(
        load_table(spark, SF_DIR_SMALL, "events"), gap_seconds=1800
    ).collect()
    # drop each user's chronologically-last session (stays open in state)
    last_start = {}
    for r in batch:
        cur = last_start.get(r["user_id"])
        if cur is None or r["session_start"] > cur:
            last_start[r["user_id"]] = r["session_start"]
    want = {
        (r["user_id"], r["session_start"], r["n_events"], round(r["total_value"], 6))
        for r in batch
        if r["session_start"] != last_start[r["user_id"]]
    }
    assert got == want
    assert len(got) > 0


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Two watermarked streams joined on (user, time-range) must emit
    the same pairs as the equivalent batch theta join."""
    import shutil

    from mbfbigdatarandomforest_spark.streaming.events import (
        read_event_stream,
        stream_stream_interval_join,
    )

    src = tmp_path / "ss_events"
    src.mkdir()
    shutil.copy(f"{SF_DIR_SMALL}/events.parquet", src / "part-0.parquet")

    stream = read_event_stream(spark, str(src), max_files_per_trigger=10)
    errors = stream.filter(F.col("event_type") == "error")
    clicks = stream.filter(F.col("event_type") == "click")
    joined = stream_stream_interval_join(errors, clicks, max_gap_seconds=3600)
    q = (
        joined.writeStream.format("memory")
        .queryName("t_ssjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["error_id"], r["click_id"])
        for r in spark.table("t_ssjoin").collect()
    }

    ev = load_table(spark, SF_DIR_SMALL, "events")
    e = ev.filter("event_type = 'error'").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("eid"), F.col("ts").alias("ets")
    )
    c = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("cid"), F.col("ts").alias("cts")
    )
    want = {
        (r["u"], r["eid"], r["cid"])
        for r in e.join(
            c,
            (F.col("u") == F.col("cu"))
            & (F.col("cts") <= F.col("ets"))
            & (F.col("cts") >= F.col("ets") - F.expr("INTERVAL 3600 SECONDS")),
        ).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_exact_dedup_matches_batch(spark, tmp_path):
    """dropDuplicatesWithinWatermark dedup drained with availableNow
    must keep exactly one row per fingerprint — the same key set the
    batch exact_dedup operator produces."""
    from mbfbigdatarandomforest_spark.operators.dedup import exact_dedup
    from mbfbigdatarandomforest_spark.streaming.dedup import (
        run_dedup_available_now,
    )

    docs = load_table(spark, SF_DIR_SMALL, "documents").withColumn(
        "ts",
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("doc_id").cast("double"))),
    )
    src = tmp_path / "docs_stream"
    docs.coalesce(1).write.parquet(str(src))

    got = run_dedup_available_now(
        spark, str(src), docs.schema, query_name="t_dedup_stream"
    )
    rows = got.collect()
    want = exact_dedup(load_table(spark, SF_DIR_SMALL, "documents")).collect()
    # one surviving row per fingerprint, same fingerprint universe
    assert len(rows) == len(want) > 0
    assert {r["fp"] for r in rows} == {r["fp"] for r in want}


def test_exactly_once_sink_idempotent_on_replay(spark, tmp_path):
    """The idempotent foreachBatch sink: (1) an availableNow drain lands
    exactly the source rows; (2) re-writing the SAME batch id (the
    post-failure replay case) replaces its partition instead of
    appending — row counts must not change."""
    import shutil

    from mbfbigdatarandomforest_spark.streaming.sinks import (
        exactly_once_parquet_sink,
        write_batch_idempotent,
    )

    src_dir = tmp_path / "docs_stream"
    src_dir.mkdir()
    shutil.copy(f"{SF_DIR_SMALL}/documents.parquet", src_dir / "part-0.parquet")
    batch = spark.read.parquet(str(src_dir))
    out = str(tmp_path / "sink_out")

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    q = exactly_once_parquet_sink(
        stream, out, str(tmp_path / "ckpt"), query_name="t_sink"
    )
    q.awaitTermination(120)

    first = spark.read.parquet(out)
    n_src = batch.count()
    assert first.count() == n_src
    assert set(r["doc_id"] for r in first.select("doc_id").collect()) == set(
        r["doc_id"] for r in batch.select("doc_id").collect()
    )
    replayed_ids = [
        r["__batch_id"] for r in first.select("__batch_id").distinct().collect()
    ]

    # simulate the failure replay: write every batch id again, each now
    # carrying the FULL source content — the sink must replace each
    # partition, so the total is n_src per batch id, not appended rows
    for bid in replayed_ids:
        write_batch_idempotent(batch, bid, out)
    spark.catalog.refreshByPath(out)
    count_after_replay = spark.read.parquet(out).count()
    assert count_after_replay == n_src * len(replayed_ids)
    # and a second replay of one id still doesn't grow the table
    write_batch_idempotent(batch, replayed_ids[0], out)
    spark.catalog.refreshByPath(out)
    assert spark.read.parquet(out).count() == count_after_replay


def test_windowed_rollup_through_exactly_once_sink(spark, tmp_path):
    """Composition: streaming windowed rollup (complete mode) through
    the idempotent foreachBatch sink. Each batch's partition is a full
    snapshot; the LATEST batch partition must equal the batch rollup
    twin exactly."""
    import shutil

    from mbfbigdatarandomforest_spark.streaming.events import (
        read_event_stream,
        windowed_rollup,
    )
    from mbfbigdatarandomforest_spark.streaming.sinks import (
        write_batch_idempotent,
    )

    src_dir = tmp_path / "ev_stream"
    src_dir.mkdir()
    shutil.copy(f"{SF_DIR_SMALL}/events.parquet", src_dir / "part-0.parquet")
    out = str(tmp_path / "rollup_out")

    rolled = windowed_rollup(read_event_stream(spark, str(src_dir)))
    q = (
        rolled.writeStream.queryName("t_rollup_sink")
        .outputMode("complete")
        .foreachBatch(lambda df, bid: write_batch_idempotent(df, bid, out))
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    sunk = spark.read.parquet(out)
    last = sunk.agg(F.max("__batch_id").alias("m")).first()["m"]
    snapshot = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in sunk.filter(F.col("__batch_id") == last).collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in (
            load_table(spark, SF_DIR_SMALL, "events")
            .groupBy(
                F.date_trunc("hour", "ts").alias("window_start"), "event_type"
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("total_value"),
            )
            .collect()
        )
    }
    assert set(snapshot) == set(want)
    for key in want:
        assert snapshot[key][0] == want[key][0]
        assert snapshot[key][1] == pytest.approx(want[key][1])


def test_compact_batch_partitions(spark, tmp_path):
    """Compaction rewrites the per-batch partition zoo into one plain
    dataset with identical rows and no __batch_id column."""
    from mbfbigdatarandomforest_spark.streaming.sinks import (
        compact_batch_partitions,
        write_batch_idempotent,
    )

    docs = load_table(spark, SF_DIR_SMALL, "documents")
    out = str(tmp_path / "sinked")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    other = docs.filter(F.col("doc_id") % 2 == 1)
    write_batch_idempotent(half, 0, out)
    write_batch_idempotent(other, 1, out)

    compacted = str(tmp_path / "compacted")
    n_files = compact_batch_partitions(spark, out, compacted)
    assert n_files >= 1
    got = spark.read.parquet(compacted)
    assert "__batch_id" not in got.columns
    assert got.count() == docs.count()
    assert {r["doc_id"] for r in got.select("doc_id").collect()} == {
        r["doc_id"] for r in docs.select("doc_id").collect()
    }


def test_streaming_decontaminate_matches_batch(spark, tmp_path):
    """Stream drained through the foreachBatch decontamination filter
    must keep exactly the docs the batch operator marks clean — across
    multiple micro-batches (maxFilesPerTrigger-style split via two
    source files)."""
    from mbfbigdatarandomforest_spark.operators.dedup import decontaminate
    from mbfbigdatarandomforest_spark.streaming.decontam import (
        run_decontaminate_available_now,
    )

    docs = load_table(spark, SF_DIR_SMALL, "documents")
    bench = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")
    src = tmp_path / "corpus_stream"
    # two files → at least two micro-batches under availableNow
    corpus.repartition(2).write.parquet(str(src))

    got = run_decontaminate_available_now(
        spark,
        str(src),
        corpus.schema,
        bench,
        str(tmp_path / "clean_out"),
        query_name="t_decontam_stream",
    )
    want_clean = {
        r["doc_id"]
        for r in decontaminate(corpus, bench, n=5)
        .filter(~F.col("contaminated"))
        .collect()
    }
    got_ids = [r["doc_id"] for r in got.select("doc_id").collect()]
    assert len(got_ids) == len(set(got_ids))  # no duplicate emission
    assert set(got_ids) == want_clean
    assert len(want_clean) < corpus.count()  # fixture really drops docs


def test_streaming_ivf_topk_matches_batch(spark, tmp_path):
    """r9: query vectors drained through the stream-static IVF scorer
    (persisted index, corpus assignment cached once at stream start)
    must emit EXACTLY the batch ivf_topk results for the same queries
    — across multiple micro-batches."""
    from mbfbigdatarandomforest_spark.operators import similarity as sim
    from mbfbigdatarandomforest_spark.streaming.similarity import (
        run_ivf_topk_available_now,
    )

    emb = load_table(spark, SF_DIR_SMALL, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    queries = emb.filter(F.col("vec_id") % 5 == 0).select("vec_id", "embedding")
    cent = sim.fit_ivf_index(corpus, n_clusters=8, seed=3)
    idx = str(tmp_path / "ivf_idx")
    sim.save_ivf_index(spark, cent, idx)

    src = tmp_path / "query_stream"
    queries.repartition(2).write.parquet(str(src))  # ≥2 micro-batches
    got = run_ivf_topk_available_now(
        spark,
        str(src),
        queries.schema,
        corpus,
        idx,
        str(tmp_path / "topk_out"),
        k=3,
        n_probe=2,
        query_name="t_ivf_stream",
    )
    want = {
        tuple(r)
        for r in sim.ivf_topk(
            corpus, queries, k=3, n_probe=2, centroids=cent
        ).collect()
    }
    got_rows = [tuple(r) for r in got.collect()]
    assert len(got_rows) == len(set(got_rows))  # no duplicate emission
    assert set(got_rows) == want
    assert want  # fixture really scores something

    # re-running against the SAME out_dir must refuse, not silently mix
    # this run's appends with the last one's (ADVICE r9)
    with pytest.raises(ValueError, match="fresh directory"):
        run_ivf_topk_available_now(
            spark, str(src), queries.schema, corpus, idx,
            str(tmp_path / "topk_out"), k=3, n_probe=2,
            query_name="t_ivf_stream_rerun",
        )

    # a zero-batch drain (empty source dir) must return an empty,
    # correctly-typed frame — not AnalysisException on the absent
    # out_dir (ADVICE r9)
    empty_src = tmp_path / "query_stream_empty"
    empty_src.mkdir()
    out = run_ivf_topk_available_now(
        spark, str(empty_src), queries.schema, corpus, idx,
        str(tmp_path / "topk_out_empty"), k=3, n_probe=2,
        query_name="t_ivf_stream_empty",
    )
    assert out.columns == ["query_id", "neighbor_id", "cosine_sim", "rank"]
    assert out.count() == 0


def test_streaming_rollup_survives_ts_encodings(spark, tmp_path):
    """read_event_stream must normalize ts exactly like the batch
    loader for BOTH parquet encodings the generator has shipped
    (nanos → long rebuild, micros-NTZ → cast): same windows, same
    counts from the same wall-clock instants."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import datetime

    from mbfbigdatarandomforest_spark.streaming.events import run_available_now

    ts_vals = [
        datetime.datetime(2024, 3, 1, 10, 15, 0),
        datetime.datetime(2024, 3, 1, 10, 45, 0),
        datetime.datetime(2024, 3, 1, 11, 5, 0),
    ]
    results = {}
    for enc_name, arrow_type in [
        ("nanos", pa.timestamp("ns")),
        ("micros_ntz", pa.timestamp("us")),
    ]:
        d = tmp_path / f"ev_{enc_name}"
        d.mkdir()
        table = pa.table(
            {
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "ts": pa.array(ts_vals, pa.timestamp("us")).cast(arrow_type),
                "user_id": pa.array([1, 1, 2], pa.int64()),
                "event_type": pa.array(["a", "a", "b"], pa.string()),
                "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
                "props": pa.array(["{}", "{}", "{}"], pa.string()),
            }
        )
        pq.write_table(table, str(d / "part-0.parquet"), store_schema=False)
        got = run_available_now(spark, str(d), query_name=f"t_enc_{enc_name}")
        results[enc_name] = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in got.collect()
        }
    assert results["nanos"] == results["micros_ntz"]
    # both 'a' events share hour 10, 'b' owns hour 11
    assert results["nanos"] == {
        (datetime.datetime(2024, 3, 1, 10, 0), "a"): (2, 3.0),
        (datetime.datetime(2024, 3, 1, 11, 0), "b"): (1, 3.0),
    }


def test_read_event_stream_starts_on_empty_source(spark, tmp_path):
    """An empty (or not-yet-created) source directory is a legal state
    for a file-streaming source: the schema probe must fall back instead
    of raising AnalysisException before the stream starts."""
    from mbfbigdatarandomforest_spark.streaming.events import (
        read_event_stream,
        windowed_rollup,
    )

    empty = tmp_path / "empty_events"
    empty.mkdir()
    stream = read_event_stream(spark, str(empty))
    assert stream.isStreaming
    q = (
        windowed_rollup(stream)
        .writeStream.format("memory")
        .queryName("t_empty_src")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.table("t_empty_src").count() == 0
    # (A never-created directory is rejected by Spark's own file-stream
    # source with PATH_NOT_FOUND regardless of schema — existence is the
    # source's contract, not the probe's, so only the empty case is ours.)


def test_stateless_quality_operators_run_on_streams(spark, tmp_path):
    """Stateless curation operators (Gopher quality filter, quality
    score) apply to a readStream unchanged — same function, same
    columns — and an availableNow drain produces exactly the batch
    result. This is the composition claim of §2.12: every stateless
    operator is streaming-ready for free."""
    from mbfbigdatarandomforest_spark.operators.text import (
        gopher_quality_filter,
        quality_score,
    )

    src = tmp_path / "docs"
    docs = [
        (0, "the quick brown fox and that lazy dog have fun with " + " ".join(f"w{i}" for i in range(50))),
        (1, "too short"),
        (2, " ".join(["12345"] * 60)),
    ]
    batch_df = spark.createDataFrame(docs, "doc_id long, text string")
    batch_df.write.mode("overwrite").parquet(str(src))

    def curate(df):
        return gopher_quality_filter(quality_score(df), min_words=40).select(
            "doc_id", "n_tokens", "quality_pass", "fail_reasons"
        )

    want = {
        (r.doc_id, r.n_tokens, r.quality_pass, tuple(r.fail_reasons))
        for r in curate(spark.read.parquet(str(src))).collect()
    }

    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    out = tmp_path / "out"
    q = (
        curate(stream)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, r.n_tokens, r.quality_pass, tuple(r.fail_reasons))
        for r in spark.read.parquet(str(out)).collect()
    }
    assert got == want and len(got) == 3


def test_lm_scoring_streams_via_foreachbatch(spark, tmp_path):
    """Model-artifact scoring composes with streams: a bigram LM trained
    in batch (bounded artifact) scores a document stream inside
    foreachBatch — per-document cross-entropy is batch-local (every
    bigram of a doc lives in its row), so a multi-file availableNow
    drain produces EXACTLY the batch scoring result. Same shape as
    streaming decontamination: static model side cached/broadcast once,
    stateless stream side."""
    from mbfbigdatarandomforest_spark.operators import ngram_lm as lm_ops

    train_docs = spark.createDataFrame(
        [(100, "a b a b c"), (101, "a b c a")], "doc_id long, text string"
    )
    lm = lm_ops.train_bigram_lm(train_docs)

    src = tmp_path / "docs"
    raw = [(0, "a b c"), (1, "z z a"), (2, "   "), (3, "c a b a")]
    # two files → at least two micro-batches under maxFilesPerTrigger=1
    spark.createDataFrame(raw[:2], "doc_id long, text string").write.mode(
        "append"
    ).parquet(str(src))
    spark.createDataFrame(raw[2:], "doc_id long, text string").write.mode(
        "append"
    ).parquet(str(src))

    batch_df = spark.read.parquet(str(src))
    want = {
        (r.doc_id, r.n_bigrams, r.n_oov, r.cross_entropy)
        for r in lm_ops.score_cross_entropy(lm, batch_df).collect()
    }

    out = tmp_path / "scored"

    def score_batch(bdf, _bid):
        lm_ops.score_cross_entropy(lm, bdf).drop("perplexity").write.mode(
            "append"
        ).parquet(str(out))

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(score_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, r.n_bigrams, r.n_oov, r.cross_entropy)
        for r in spark.read.parquet(str(out)).collect()
    }
    assert got == want and len(got) == 4


def test_classifier_scoring_streams_via_foreachbatch(spark, tmp_path):
    """The GPT-3-style quality classifier composes with streams the same
    way the LM does: the fitted PipelineModel is a broadcast artifact,
    per-doc scoring is batch-local, so a multi-batch drain reproduces
    batch scoring exactly (probabilities are deterministic functions of
    the model + row)."""
    from pyspark.sql import functions as F

    from mbfbigdatarandomforest_spark.operators import quality_classifier as qc

    train_pos = spark.createDataFrame(
        [(100, "the cat and the dog"), (101, "the bird and the fish")],
        "doc_id long, text string",
    )
    train_neg = spark.createDataFrame(
        [(200, "der hund und die katze"), (201, "das brot und der wein")],
        "doc_id long, text string",
    )
    model = qc.train_quality_classifier(train_pos, train_neg, num_features=1 << 10)

    src = tmp_path / "docs"
    raw = [(0, "the cat and the fish"), (1, "der wein und das brot"), (2, "xyzzy")]
    spark.createDataFrame(raw[:2], "doc_id long, text string").write.mode(
        "append"
    ).parquet(str(src))
    spark.createDataFrame(raw[2:], "doc_id long, text string").write.mode(
        "append"
    ).parquet(str(src))

    want = {
        (r["doc_id"], r["quality_prob"])
        for r in qc.score_quality(model, spark.read.parquet(str(src))).collect()
    }
    out = tmp_path / "scored"

    def score_batch(bdf, _bid):
        qc.score_quality(model, bdf).write.mode("append").parquet(str(out))

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(score_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["quality_prob"])
        for r in spark.read.parquet(str(out)).collect()
    }
    assert got == want and len(got) == 3


def test_streaming_text_ingest_matches_batch(spark, tmp_path):
    """The crawl-watch ingestion stream (readStream.text wholetext →
    shared documents projection → Gopher gate, pure append-mode plan)
    must produce EXACTLY the batch ingest+filter result: same doc ids,
    same surviving set."""
    from mbfbigdatarandomforest_spark.operators.text import (
        gopher_quality_filter,
    )
    from mbfbigdatarandomforest_spark.sources.readers import (
        ingest_text_documents,
    )
    from mbfbigdatarandomforest_spark.streaming.ingest import (
        run_ingest_curate_available_now,
    )

    base = tmp_path / "dump"
    for src in ("web", "books"):
        d = base / src
        d.mkdir(parents=True)
        for i in range(6):
            good = (
                f"the steady document number {src}{i} continues with many "
                "plain ordinary words about data and the pipeline so the "
                "gopher rules accept it without any complaint at all here"
            )
            (d / f"doc{i}.txt").write_text(good + "\n")
        (d / "junk.txt").write_text("### ### ###\n")  # fails the rules
    kw = dict(min_words=20, min_stopword_hits=1, min_alpha_word_frac=0.5)

    streamed = run_ingest_curate_available_now(
        spark, str(base), str(tmp_path / "out"), str(tmp_path / "ckpt"), **kw
    )
    batch = gopher_quality_filter(
        ingest_text_documents(spark, str(base)), **kw
    ).filter("quality_pass")
    got = {(r.doc_id, r.source) for r in streamed.select("doc_id", "source").collect()}
    want = {(r.doc_id, r.source) for r in batch.select("doc_id", "source").collect()}
    assert got == want and len(got) == 12  # 2 junk files dropped


def test_streaming_curation_composition_matches_batch(spark, tmp_path):
    """r7 (verdict item 5): ingest → Gopher → watermarked exact dedup →
    decontamination as ONE continuous query over a dump tree that grows
    across three arrival waves. Cross-batch duplicates must be dropped
    by the dedup STATE (not within-batch luck), contaminated docs must
    never land, and the surviving fingerprint set must equal the batch
    composition over the final tree."""
    from mbfbigdatarandomforest_spark.operators.dedup import exact_dedup
    from mbfbigdatarandomforest_spark.operators.text import (
        gopher_quality_filter,
    )
    from mbfbigdatarandomforest_spark.sources.readers import (
        ingest_text_documents,
    )
    from mbfbigdatarandomforest_spark.streaming.curation import (
        start_curation_stream,
    )
    from mbfbigdatarandomforest_spark.streaming.decontam import (
        benchmark_gram_set,
        decontaminate_batch,
    )

    def good(tag: str) -> str:
        return (
            f"the steady document number {tag} continues with many plain "
            "ordinary words about data and the pipeline so the gopher "
            "rules accept it without any complaint at all here"
        )

    secret = (
        "the secret benchmark passage that must never leak into any "
        "training corpus under the published decontamination rule"
    )
    benchmark = spark.createDataFrame(
        [(999_000, secret, "benchmark", "en")],
        ["doc_id", "text", "source", "lang"],
    )
    kw = dict(min_words=20, min_stopword_hits=1, min_alpha_word_frac=0.5)

    base = tmp_path / "dump"
    (base / "web").mkdir(parents=True)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    # wave 1: 4 good docs, 1 junk, 1 in-wave duplicate of doc0
    for i in range(4):
        (base / "web" / f"w1_{i}.txt").write_text(good(f"w1{i}") + "\n")
    (base / "web" / "w1_junk.txt").write_text("### ### ###\n")
    (base / "web" / "w1_dup0.txt").write_text(good("w10") + "\n")

    q = start_curation_stream(
        spark, str(base), benchmark, out, ckpt,
        watermark="1 hour", n=5, query_name="curation_test", **kw,
    )
    try:
        q.processAllAvailable()
        # wave 2: 2 new docs, a CROSS-BATCH duplicate of w1's doc1, and
        # a contaminated doc quoting the benchmark verbatim
        for i in range(2):
            (base / "web" / f"w2_{i}.txt").write_text(good(f"w2{i}") + "\n")
        (base / "web" / "w2_dup1.txt").write_text(good("w11") + "\n")
        (base / "web" / "w2_contam.txt").write_text(
            good("w2c") + " " + secret + "\n"
        )
        q.processAllAvailable()
        # wave 3: one more doc
        (base / "web" / "w3_0.txt").write_text(good("w30") + "\n")
        q.processAllAvailable()
        progresses = [p for p in q.recentProgress if p["numInputRows"] > 0]
    finally:
        q.stop()
        q.bench_grams.unpersist()

    streamed = spark.read.parquet(out)
    got_fp = {r["fp"] for r in streamed.select("fp").collect()}

    # batch composition over the FINAL tree: ingest → gopher → keep one
    # row per fingerprint → decontaminate with the same gram set
    docs = gopher_quality_filter(
        ingest_text_documents(spark, str(base)), **kw
    ).filter("quality_pass")
    keep = exact_dedup(docs).select("fp", F.col("keep_id").alias("doc_id"))
    kept = docs.join(keep, "doc_id").select("doc_id", "text", "fp")
    grams = benchmark_gram_set(benchmark, n=5)
    clean = decontaminate_batch(kept, grams, "text", "doc_id", n=5)
    want_fp = {r["fp"] for r in clean.select("fp").collect()}

    assert got_fp == want_fp
    # 4 + 2 + 1 distinct good docs; junk, both dups, contaminated gone
    assert streamed.count() == 7
    # the cross-batch duplicate was dropped by STATE: wave-2's batch had
    # input rows but w1_dup-equivalent text appears exactly once overall
    assert streamed.filter(F.col("text").contains("number w11")).count() == 1
    assert streamed.filter(F.col("text").contains(secret)).count() == 0
    # the state operator reports rows retained across triggers
    assert any(
        (p.get("stateOperators") or [{}])[0].get("numRowsTotal", 0) > 0
        for p in progresses
    )


def test_curation_stream_c4_stage_matches_batch(spark, tmp_path):
    """r13: the ``c4`` option runs the C4 line+page cleaning before the
    Gopher stage (the batch CLI's --c4-clean order). Page drops (lorem
    ipsum), line scrubbing (javascript / unterminated lines), and the
    rebuilt text must match the BATCH composition exactly across two
    arrival waves — the stage is stateless column work, so stream ≡
    batch holds per row."""
    from mbfbigdatarandomforest_spark.operators.text import (
        c4_clean,
        gopher_quality_filter,
    )
    from mbfbigdatarandomforest_spark.sources.readers import (
        ingest_text_documents,
    )
    from mbfbigdatarandomforest_spark.streaming.curation import (
        start_curation_stream,
    )

    good_line = "the quick crawler and parser walk the corpus daily."

    def page(tag: str, extra: list[str] | None = None) -> str:
        return "\n".join(
            [f"the document {tag} opens with words and more text."]
            + [good_line] * 4
            + (extra or [])
        )

    benchmark = spark.createDataFrame(
        [(1, "completely unrelated benchmark text nothing quotes this")],
        ["doc_id", "text"],
    )
    kw = dict(min_words=20, min_stopword_hits=1, min_alpha_word_frac=0.5)
    c4_kw = dict(min_sentences=3)
    base = tmp_path / "dump"
    (base / "web").mkdir(parents=True)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    (base / "web" / "keep.txt").write_text(page("k0"))
    (base / "web" / "lorem.txt").write_text(
        page("l0", ["About lorem ipsum placeholder text."])
    )
    (base / "web" / "lines.txt").write_text(
        page(
            "s0",
            [
                "Please enable javascript to continue browsing.",
                "this trailing line never terminates and must vanish",
            ],
        )
    )
    q = start_curation_stream(
        spark, str(base), benchmark, out, ckpt,
        watermark="1 hour", n=5, query_name="curation_c4",
        c4=c4_kw, **kw,
    )
    try:
        q.processAllAvailable()
        (base / "web" / "keep2.txt").write_text(page("k1"))
        (base / "web" / "brace.txt").write_text(
            page("b0", ["A brace { appears mid page here."])
        )
        q.processAllAvailable()
    finally:
        q.stop()
        q.bench_grams.unpersist()

    streamed = spark.read.parquet(out)
    got = {r["text"] for r in streamed.select("text").collect()}
    # batch composition over the final tree: c4 → gopher (dedup and
    # decontamination are no-ops on this fixture)
    docs = ingest_text_documents(spark, str(base))
    base_cols = docs.columns
    cleaned = (
        c4_clean(docs, **c4_kw)
        .filter("c4_pass")
        .withColumn("text", F.col("clean_text"))
        .select(*base_cols)
    )
    want = {
        r["text"]
        for r in gopher_quality_filter(cleaned, **kw)
        .filter("quality_pass")
        .select("text")
        .collect()
    }
    assert got == want
    # page rules dropped lorem + brace; line rules scrubbed the rest
    assert streamed.count() == 3
    assert all("javascript" not in t.lower() for t in got)
    assert all("never terminates" not in t for t in got)
    assert all("lorem ipsum" not in t.lower() and "{" not in t for t in got)


def test_curation_stream_clean_source_bounds_listing(spark, tmp_path):
    """cleanSource=delete passthrough: processed files leave the
    watched tree after their batch commits (per-trigger listing stays
    O(new files) — the SCALE.md §13 throughput fix), and the curated
    output is identical to the append-only run."""
    from mbfbigdatarandomforest_spark.streaming.curation import (
        start_curation_stream,
    )

    def good(tag: str) -> str:
        return (
            f"the steady document number {tag} continues with many plain "
            "ordinary words about data and the pipeline so the gopher "
            "rules accept it without any complaint at all here"
        )

    benchmark = spark.createDataFrame(
        [(1, "completely unrelated benchmark text nothing quotes this")],
        ["doc_id", "text"],
    )
    base = tmp_path / "dump"
    (base / "web").mkdir(parents=True)
    for i in range(3):
        (base / "web" / f"a{i}.txt").write_text(good(f"a{i}") + "\n")

    q = start_curation_stream(
        spark, str(base), benchmark,
        str(tmp_path / "out"), str(tmp_path / "ckpt"),
        watermark="1 hour", n=5, query_name="curation_clean",
        source_options={"cleanSource": "delete"},
        min_words=20, min_stopword_hits=1, min_alpha_word_frac=0.5,
    )
    try:
        q.processAllAvailable()
        # second wave proves the stream keeps running after deletion
        (base / "web" / "b0.txt").write_text(good("b0") + "\n")
        q.processAllAvailable()
    finally:
        q.stop()
        q.bench_grams.unpersist()

    remaining = list((base / "web").glob("*.txt"))
    assert remaining == []  # every processed file was cleaned up
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 4


def test_curation_stream_archive_source_keeps_dump_replayable(spark, tmp_path):
    """cleanSource=archive + sourceArchiveDir — the PRODUCTION posture
    (r8 verdict item 3): processed files leave the watched tree but
    land under the archive dir (raw dump stays replayable), and the
    stream keeps consuming new waves afterwards."""
    from mbfbigdatarandomforest_spark.streaming.curation import (
        start_curation_stream,
    )

    def good(tag: str) -> str:
        return (
            f"the steady document number {tag} continues with many plain "
            "ordinary words about data and the pipeline so the gopher "
            "rules accept it without any complaint at all here"
        )

    benchmark = spark.createDataFrame(
        [(1, "completely unrelated benchmark text nothing quotes this")],
        ["doc_id", "text"],
    )
    base = tmp_path / "dump"
    archive = tmp_path / "archive"
    (base / "web").mkdir(parents=True)
    for i in range(3):
        (base / "web" / f"a{i}.txt").write_text(good(f"a{i}") + "\n")

    q = start_curation_stream(
        spark, str(base), benchmark,
        str(tmp_path / "out"), str(tmp_path / "ckpt"),
        watermark="1 hour", n=5, query_name="curation_archive",
        source_options={
            "cleanSource": "archive",
            "sourceArchiveDir": str(archive),
        },
        min_words=20, min_stopword_hits=1, min_alpha_word_frac=0.5,
    )
    try:
        q.processAllAvailable()
        # second wave proves the stream keeps running after archiving
        (base / "web" / "b0.txt").write_text(good("b0") + "\n")
        q.processAllAvailable()
    finally:
        q.stop()
        q.bench_grams.unpersist()

    assert list((base / "web").glob("*.txt")) == []  # tree swept
    archived = sorted(p.name for p in archive.rglob("*.txt"))
    assert archived == ["a0.txt", "a1.txt", "a2.txt", "b0.txt"]
    # replayability: the archived payloads are the original documents
    assert "number a1" in next(archive.rglob("a1.txt")).read_text()
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 4


def test_streaming_warc_ingest_matches_batch(spark, tmp_path):
    """r11: the crawl front door as a stream. A dump dir of mixed
    shards — plain, gzip, a garbage shard (quarantine path), a non-200
    record, a latin-1 body (tolerant-decode path) — drained with
    maxFilesPerTrigger=1 (one shard per micro-batch) must produce
    EXACTLY the batch warc_to_documents frame: same doc ids, same
    extracted text, same provenance and lang. Every stage is a
    stateless column expression, so no foreachBatch and no state."""
    from mbfbigdatarandomforest_spark.sources.warc import (
        encode_warc,
        warc_to_documents,
    )
    from mbfbigdatarandomforest_spark.streaming.warc import (
        run_warc_ingest_available_now,
    )

    dump = tmp_path / "dump"
    dump.mkdir()
    (dump / "s0.warc").write_bytes(
        encode_warc(
            [
                {
                    "url": "https://en.news.example.com/a",
                    "status": 200,
                    "body": "<html><head><title>t</title></head><body>"
                            "<p>the cat and the dog went home from work"
                            "</p></body></html>",
                },
                {
                    "url": "https://gone.example.net/x",
                    "status": 404,
                    "body": "<html>not found</html>",
                },
            ]
        )
    )
    (dump / "s1.warc.gz").write_bytes(
        encode_warc(
            [
                {
                    "url": "https://de.example.org/b",
                    "status": 200,
                    "body": "<p>der Hund und die Katze sind nicht das "
                            "Problem und</p>",
                }
            ],
            compress=True,
        )
    )
    (dump / "s2.warc").write_bytes(
        encode_warc(
            [
                {
                    "url": "https://l1.example.org/c",
                    "status": 200,
                    "body": "<p>caf\xe9 men\xfc</p>".encode("latin-1"),
                }
            ]
        )
    )
    (dump / "s3.warc").write_bytes(b"garbage, not a WARC shard")

    want = sorted(
        map(tuple, warc_to_documents(spark, str(dump)).collect())
    )
    progress: list = []
    got_df = run_warc_ingest_available_now(
        spark,
        str(dump),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        source_options={"maxFilesPerTrigger": "1"},
        progress=progress,
    )
    got = sorted(map(tuple, got_df.collect()))
    assert got == want
    assert len(got) == 3  # 404 + garbage shard dropped, latin-1 kept
    # really drained shard-by-shard (≥4 micro-batches incl. empties)
    assert sum(p["numInputRows"] for p in progress) >= 3
    # ADVICE r11: rerunning against an out_dir that already holds
    # results must raise WHEN the checkpoint is fresh (that pairing
    # would silently mix two unrelated runs)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="already holds results"):
        run_warc_ingest_available_now(
            spark, str(dump), str(tmp_path / "out"), str(tmp_path / "ckpt2")
        )
    # ADVICE r12: the SAME checkpoint is the legitimate exactly-once
    # RESUME — rerunning with the original checkpoint must NOT raise,
    # and the commit log must skip the already-committed batches (no
    # duplicated rows in out_dir)
    resumed = run_warc_ingest_available_now(
        spark, str(dump), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    assert sorted(map(tuple, resumed.collect())) == want


def test_streaming_warc_ingest_empty_dump_returns_typed_empty(
    spark, tmp_path
):
    """ADVICE r11 (low): an empty dump dir is a LEGAL source state
    (the similarity-stream posture) — a zero-batch drain must return
    an empty, correctly-typed documents frame, not throw
    AnalysisException reading a never-created out_dir."""
    from mbfbigdatarandomforest_spark.streaming.warc import (
        run_warc_ingest_available_now,
    )

    dump = tmp_path / "dump"
    dump.mkdir()  # exists, holds nothing
    out = run_warc_ingest_available_now(
        spark, str(dump), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    assert out.count() == 0
    assert [f.name for f in out.schema.fields][:3] == [
        "doc_id", "text", "source",
    ]


def test_streaming_warc_to_gopher_curation_composes(spark, tmp_path):
    """r11: the WHOLE crawl→curation front stays one append-mode plan —
    WARC stream → record split → HTML→text projection → Gopher quality
    gate, no foreachBatch anywhere — and its availableNow drain equals
    the batch composition exactly (doc ids, kept set, audit columns)."""
    from mbfbigdatarandomforest_spark.operators.text import (
        gopher_quality_filter,
    )
    from mbfbigdatarandomforest_spark.sources.warc import (
        encode_warc,
        warc_to_documents,
    )
    from mbfbigdatarandomforest_spark.streaming.warc import (
        warc_document_stream,
    )

    good_body = (
        "<p>the quick brown fox jumped over the lazy dog and then the "
        "other animals in the field were watching it run home that day "
        "with a happy look on its face because the work was done</p>"
    )
    pages = [
        {"url": "https://a.example.com/good", "status": 200,
         "body": good_body},
        {"url": "https://b.example.com/short", "status": 200,
         "body": "<p>too short</p>"},
    ]
    dump = tmp_path / "dump"
    dump.mkdir()
    (dump / "s0.warc").write_bytes(encode_warc(pages))

    kw = dict(min_words=20, min_stopword_hits=1, min_alpha_word_frac=0.5)
    want = sorted(
        map(
            tuple,
            gopher_quality_filter(warc_to_documents(spark, str(dump)), **kw)
            .filter("quality_pass")
            .collect(),
        )
    )
    stream = gopher_quality_filter(
        warc_document_stream(spark, str(dump)), **kw
    ).filter("quality_pass")
    assert stream.isStreaming  # the composition stayed a pure stream plan
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.read.parquet(str(tmp_path / "out")).collect()))
    assert got == want
    assert len(got) == 1  # the short page was gated out


def test_streaming_link_discovery_matches_batch(spark, tmp_path):
    """r11: the frontier's candidate feed as a pure append stream —
    WARC stream → anchor extraction → absolutization — drained
    shard-by-shard equals the batch derivation row-for-row."""
    from mbfbigdatarandomforest_spark.operators.linkgraph import (
        page_link_edges,
    )
    from mbfbigdatarandomforest_spark.operators.text import (
        html_links,
        resolve_link,
    )
    from mbfbigdatarandomforest_spark.sources.warc import (
        encode_warc,
        read_warc,
    )
    from mbfbigdatarandomforest_spark.streaming.warc import warc_link_stream
    from pyspark.sql import functions as F

    def page(url, *hrefs):
        a = "".join(f'<a href="{h}">l</a>' for h in hrefs)
        return {"url": url, "status": 200,
                "body": f"<html><body>{a}</body></html>"}

    dump = tmp_path / "dump"
    dump.mkdir()
    (dump / "s0.warc").write_bytes(
        encode_warc([
            page("https://a.example/1", "https://b.example/x", "/local",
                 "skip-relative"),
            page("https://b.example/2", "//a.example/y"),
        ])
    )
    (dump / "s1.warc.gz").write_bytes(
        encode_warc([page("https://c.example/3", "https://a.example/z")],
                    compress=True)
    )

    batch_pages = read_warc(spark, str(dump)).filter(
        "error IS NULL AND status = 200"
    ).select("url", F.expr("make_valid_utf8(cast(body as string))").alias("html"))
    want = sorted(
        batch_pages.select(
            F.col("url").alias("page_url"),
            F.explode(html_links(F.col("html"))).alias("h"),
        )
        .select("page_url", resolve_link("page_url", "h").alias("link"))
        .filter("link IS NOT NULL")
        .collect()
    )
    stream = warc_link_stream(
        spark, str(dump), source_options={"maxFilesPerTrigger": "1"}
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(spark.read.parquet(str(tmp_path / "out")).collect())
    assert got == want
    assert len(got) == 4  # relative href dropped, others resolved
    # and the landed candidates feed the batch edge derivation
    landed = spark.read.parquet(str(tmp_path / "out"))
    edges = page_link_edges(
        batch_pages
    )  # sanity: same pages produce a non-empty weighted domain graph
    assert edges.count() >= 3 and landed.count() == 4


def test_streaming_incremental_dedup_equals_batch(spark, tmp_path):
    """r13 (verdict item 7): the cross-snapshot gate as a stream.
    The NEW snapshot arrives in forced one-file micro-batches and is
    gated per batch against the STATIC persistable index — the drained
    result must equal the batch gate of the union EXACTLY (the gate is
    a per-row decision against static state, so micro-batch boundaries
    cannot change it). Planted exact copies and near-dups of reference
    docs are fully dropped; both the index and the reference-frame
    static sides are pinned."""
    import mbfbigdatarandomforest_spark.operators.dedup as dd_ops
    from mbfbigdatarandomforest_spark.streaming.dedup import (
        run_incremental_dedup_available_now,
    )

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
    ).unionByName(
        ref.filter(F.col("doc_id") % 10 == 4).select(
            (F.col("doc_id") + 20_000_000).alias("doc_id"),
            F.concat("text", F.lit(" zyzzyva")).alias("text"),
        )
    )
    idx = str(tmp_path / "idx")
    dd_ops.build_dedup_index(ref, idx)
    src = tmp_path / "src"
    # several files -> several micro-batches under maxFilesPerTrigger=1
    new.repartition(4).write.parquet(str(src))
    kw = dict(threshold=0.7)
    got = run_incremental_dedup_available_now(
        spark,
        str(src),
        new.schema,
        str(tmp_path / "out"),
        index=idx,
        source_options={"maxFilesPerTrigger": "1"},
        **kw,
    )
    want = dd_ops.incremental_dedup(new, ref, seed=42, **kw)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    kept_ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    assert not {i for i in kept_ids if i >= 10_000_000}  # planted all gone
    assert kept_ids  # and the gate kept real survivors
    # the reference-frame static side drains to the same result
    got_ref = run_incremental_dedup_available_now(
        spark,
        str(src),
        new.schema,
        str(tmp_path / "out_ref"),
        reference=ref,
        **kw,
    )
    assert sorted(map(tuple, got_ref.collect())) == sorted(
        map(tuple, want.collect())
    )
    # exactly one static side, enforced
    import pytest as _pytest

    with _pytest.raises(ValueError, match="exactly one"):
        run_incremental_dedup_available_now(
            spark, str(src), new.schema, str(tmp_path / "out2")
        )


def test_streaming_c4_span_dedup_matches_batch(spark, tmp_path):
    """r14: the C4 three-sentence-span dedup stream (cross-batch span
    ledger, keep-one within batch) drains to EXACTLY the batch
    operator's result when document ids are monotone in arrival order
    — the documented contract. The planted span survives in exactly
    one document across batch boundaries."""
    import time

    import mbfbigdatarandomforest_spark.operators.dedup as dd_ops
    from mbfbigdatarandomforest_spark.streaming.dedup import (
        run_c4_span_dedup_available_now,
    )

    dup = "Alpha one. Beta two. Gamma three."
    batch_a = [
        (1, f"{dup} Tail a."),
        (2, "Solo text. More solo. Third one. Fourth bit."),
        (3, f"Pre sentence. {dup} Post sentence."),
    ]
    batch_b = [
        (11, f"{dup} Brand new tail."),
        (12, f"Intro b. {dup}"),
        (13, "Fresh content. Entirely new. Nothing shared here."),
        # within-batch duplicate pair in batch 2 only: keep-one must
        # fire inside the batch, not just against the ledger
        (14, "Echo x. Echo y. Echo z. Echo tail."),
        (15, f"Echo x. Echo y. Echo z. Different end."),
    ]
    schema = "doc_id long, text string"
    src = tmp_path / "src"
    spark.createDataFrame(batch_a, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    time.sleep(1.1)  # distinct mod-times: file order = arrival order
    spark.createDataFrame(batch_b, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    got = run_c4_span_dedup_available_now(
        spark,
        str(src),
        schema,
        str(tmp_path / "out"),
        str(tmp_path / "ledger"),
        source_options={"maxFilesPerTrigger": "1"},
    )
    union = spark.createDataFrame(batch_a + batch_b, schema)
    want = dd_ops.c4_sentence_span_dedup(union)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    texts = {r["doc_id"]: r["text"] for r in got.collect()}
    assert sum(1 for t in texts.values() if "Alpha one." in t) == 1
    assert "Alpha one." in texts[1]  # globally first = batch-1 doc
    assert sum(1 for t in texts.values() if "Echo x." in t) == 1
    assert "Echo x." in texts[14]  # within-batch keep-one at min id


def test_streaming_c4_span_dedup_replay_idempotent(spark, tmp_path):
    """ADVICE r14 (medium): re-running the C4 span-dedup stream over a
    POPULATED ledger must not mark the replayed docs' keepers as
    'seen' and drop their sentences — batch_id-keyed overwrite writes
    plus the own-batch ledger exclusion make a full replay (no
    checkpoint) reproduce the first run exactly, and a checkpointed
    re-run is a no-op."""
    import mbfbigdatarandomforest_spark.operators.dedup as dd_ops
    from mbfbigdatarandomforest_spark.streaming.dedup import (
        run_c4_span_dedup_available_now,
    )

    dup = "Alpha one. Beta two. Gamma three."
    rows = [
        (1, f"{dup} Tail a."),
        (2, "Solo text. More solo. Third one. Fourth bit."),
        (3, f"Pre sentence. {dup} Post sentence."),
    ]
    schema = "doc_id long, text string"
    src = tmp_path / "src"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src))
    want = sorted(
        map(
            tuple,
            dd_ops.c4_sentence_span_dedup(
                spark.createDataFrame(rows, schema)
            ).collect(),
        )
    )

    # run 1 (no checkpoint), then a FULL REPLAY over the populated
    # ledger — the r14 failure mode: every replayed span looked
    # 'seen', so the keeper doc's sentences were wrongly dropped and
    # conflicting rows landed beside the first attempt's
    args = (spark, str(src), schema, str(tmp_path / "out"),
            str(tmp_path / "ledger"))
    first = sorted(map(tuple, run_c4_span_dedup_available_now(*args).collect()))
    assert first == want
    # ADVICE r16: a no-checkpoint replay over existing dirs must be an
    # EXPLICIT opt-in — without the flag it refuses instead of silently
    # rm -rf'ing caller-supplied state
    import pytest as _pytest

    with _pytest.raises(ValueError, match="clear_existing"):
        run_c4_span_dedup_available_now(*args)
    replay = sorted(map(tuple, run_c4_span_dedup_available_now(
        *args, clear_existing=True).collect()))
    assert replay == want  # identical — no dropped keepers, no dup rows

    # checkpointed variant: the second run processes nothing new and
    # the output is byte-for-byte the first run's
    args2 = (spark, str(src), schema, str(tmp_path / "out2"),
             str(tmp_path / "ledger2"))
    ck = str(tmp_path / "ck")
    r1 = sorted(map(tuple, run_c4_span_dedup_available_now(
        *args2, checkpoint_dir=ck).collect()))
    r2 = sorted(map(tuple, run_c4_span_dedup_available_now(
        *args2, checkpoint_dir=ck).collect()))
    assert r1 == r2 == want


def test_streaming_recrawl_matches_batch(spark, tmp_path):
    """r14 (r13 verdict item 8): the recrawl stream — sitemap lastmod
    updates in micro-batches against the STATIC ledger — drains to
    EXACTLY the batch operator over the union of entries, on the
    bumped/older-lastmod/TTL fixture. The lastmod bump arriving in a
    LATER batch than the url's first (no-signal) appearance must
    upgrade the answer, never double-emit."""
    import time

    from mbfbigdatarandomforest_spark.plans.llm_ops import (
        recrawl_candidates,
    )
    from mbfbigdatarandomforest_spark.streaming.recrawl import (
        run_recrawl_available_now,
    )

    ledger = spark.createDataFrame(
        [
            ("https://a.example/fresh-bumped", "2024-02-20 00:00:00"),
            ("https://a.example/fresh-older-lastmod", "2024-02-20 00:00:00"),
            ("https://a.example/old-no-signal", "2024-01-01 00:00:00"),
            ("https://a.example/young-no-signal", "2024-02-25 00:00:00"),
            ("https://b.example/short-ttl", "2024-02-25 00:00:00"),
        ],
        "url string, scheduled_at string",
    )
    ttl = spark.createDataFrame(
        [("b.example", 2.0)], "domain string, ttl_days double"
    )
    schema = "loc string, lastmod string"
    batch_a = [
        # an OLD lastmod for the soon-to-be-bumped url: the batch-2
        # bump must supersede it (max-per-url state)
        ("https://a.example/fresh-bumped", "2024-02-01"),
        ("https://a.example/fresh-older-lastmod", "2024-02-10"),
    ]
    batch_b = [
        ("https://a.example/fresh-bumped/?utm_source=x", "2024-02-25"),
    ]
    src = tmp_path / "src"
    spark.createDataFrame(batch_a, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    time.sleep(1.1)
    spark.createDataFrame(batch_b, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    kw = dict(
        as_of="2024-03-01 00:00:00", default_ttl_days=30.0, domain_ttl=ttl
    )
    got = run_recrawl_available_now(
        spark,
        str(src),
        schema,
        str(tmp_path / "out"),
        str(tmp_path / "state"),
        ledger,
        source_options={"maxFilesPerTrigger": "1"},
        **kw,
    )
    union = spark.createDataFrame(batch_a + batch_b, schema)
    want = recrawl_candidates(ledger, union, **kw)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    reasons = {r["url"]: r["reason"] for r in got.collect()}
    assert reasons["https://a.example/fresh-bumped"] == "modified"
    assert reasons["https://a.example/old-no-signal"] == "stale"
    assert reasons["https://b.example/short-ttl"] == "stale"
    assert "https://a.example/fresh-older-lastmod" not in reasons
    assert "https://a.example/young-no-signal" not in reasons


def test_streaming_incremental_gates_replay_idempotent(spark, tmp_path):
    """r15 (the C4 replay fix applied to the other two gate streams):
    re-running the text and semantic incremental-dedup streams over
    the same source without a checkpoint must reproduce the first
    run's output exactly — batch_id-keyed overwrite, not a second
    appended copy of every kept row."""
    import mbfbigdatarandomforest_spark.operators.dedup as dd_ops
    import mbfbigdatarandomforest_spark.operators.similarity as sim
    from conftest import SF_DIR_SMALL
    from pyspark.sql import functions as F
    from mbfbigdatarandomforest_spark.streaming.dedup import (
        run_incremental_dedup_available_now,
        run_incremental_semantic_dedup_available_now,
    )

    # --- text gate
    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet").select(
        "doc_id", "text"
    )
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    src = tmp_path / "tsrc"
    new.repartition(2).write.parquet(str(src))
    args = (spark, str(src), new.schema, str(tmp_path / "tout"))
    r1 = sorted(
        r["doc_id"]
        for r in run_incremental_dedup_available_now(
            *args, reference=ref, threshold=0.7
        ).collect()
    )
    r2 = sorted(
        r["doc_id"]
        for r in run_incremental_dedup_available_now(
            *args, reference=ref, threshold=0.7, clear_existing=True
        ).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in dd_ops.incremental_dedup(
            new, ref, threshold=0.7
        ).collect()
    )
    assert r1 == r2 == want

    # --- semantic gate
    emb = spark.read.parquet(f"{SF_DIR_SMALL}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    sref = emb.filter(F.col("vec_id") % 2 == 0)
    snew = emb.filter(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / "semidx_replay")
    sim.build_semantic_index(sref, idx, n_clusters=8)
    ssrc = tmp_path / "ssrc"
    snew.repartition(2).write.parquet(str(ssrc))
    sargs = (spark, str(ssrc), snew.schema, str(tmp_path / "sout"), idx)
    s1 = sorted(
        r["vec_id"]
        for r in run_incremental_semantic_dedup_available_now(
            *sargs, threshold=0.8, n_probe=4
        ).collect()
    )
    s2 = sorted(
        r["vec_id"]
        for r in run_incremental_semantic_dedup_available_now(
            *sargs, threshold=0.8, n_probe=4, clear_existing=True
        ).collect()
    )
    swant = sorted(
        r["vec_id"]
        for r in sim.incremental_semantic_dedup(
            snew, index=idx, threshold=0.8, n_probe=4
        ).collect()
    )
    assert s1 == s2 == swant


def test_streaming_replay_with_different_batch_partitioning(spark, tmp_path):
    """Review r15: a no-checkpoint re-run that carves DIFFERENT batch
    boundaries (run 1: one file per batch; run 2: everything in batch
    0) must still reproduce the batch answer — stale higher-numbered
    batch dirs from the first attempt are cleared (via the explicit
    ``clear_existing`` opt-in, ADVICE r16), not left to duplicate
    output (or, for C4, to poison the ledger and drop keepers). A
    fresh checkpoint over existing dirs refuses."""
    import mbfbigdatarandomforest_spark.operators.dedup as dd_ops
    from conftest import SF_DIR_SMALL
    from pyspark.sql import functions as F
    from mbfbigdatarandomforest_spark.streaming.dedup import (
        run_c4_span_dedup_available_now,
        run_incremental_dedup_available_now,
    )

    import time

    dup = "Alpha one. Beta two. Gamma three."
    rows = [
        (1, f"{dup} Tail a."),
        (2, "Solo text. More solo. Third one. Fourth bit."),
        (3, f"Pre sentence. {dup} Post sentence."),
        (4, f"{dup} Brand new tail."),
    ]
    schema = "doc_id long, text string"
    src = tmp_path / "src"
    # sequential files with distinct mtimes: arrival order = id order,
    # the C4 stream ≡ batch contract's precondition
    spark.createDataFrame(rows[:2], schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    time.sleep(1.1)
    spark.createDataFrame(rows[2:], schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    want = sorted(
        map(
            tuple,
            dd_ops.c4_sentence_span_dedup(
                spark.createDataFrame(rows, schema)
            ).collect(),
        )
    )
    args = (spark, str(src), schema, str(tmp_path / "out"),
            str(tmp_path / "ledger"))
    # run 1: many small batches
    r1 = sorted(map(tuple, run_c4_span_dedup_available_now(
        *args, source_options={"maxFilesPerTrigger": "1"}).collect()))
    assert r1 == want
    # run 2: ONE batch over the same dirs — different partitioning
    r2 = sorted(map(tuple, run_c4_span_dedup_available_now(
        *args, clear_existing=True).collect()))
    assert r2 == want

    # the text gate too: many batches then one batch
    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet").select(
        "doc_id", "text"
    )
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    gsrc = tmp_path / "gsrc"
    new.repartition(3).write.parquet(str(gsrc))
    gargs = (spark, str(gsrc), new.schema, str(tmp_path / "gout"))
    g1 = sorted(
        r["doc_id"]
        for r in run_incremental_dedup_available_now(
            *gargs, reference=ref, threshold=0.7,
            source_options={"maxFilesPerTrigger": "1"},
        ).collect()
    )
    g2 = sorted(
        r["doc_id"]
        for r in run_incremental_dedup_available_now(
            *gargs, reference=ref, threshold=0.7, clear_existing=True
        ).collect()
    )
    gwant = sorted(
        r["doc_id"]
        for r in dd_ops.incremental_dedup(new, ref, threshold=0.7).collect()
    )
    assert g1 == g2 == gwant

    # fresh checkpoint + existing output dirs → refuse
    import pytest as _pytest

    with _pytest.raises(ValueError, match="checkpoint"):
        run_incremental_dedup_available_now(
            *gargs, reference=ref, threshold=0.7,
            checkpoint_dir=str(tmp_path / "fresh_ck"),
        )
