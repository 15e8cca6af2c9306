"""Streaming exact deduplication — the Structured Streaming twin of
``operators.dedup.exact_dedup`` for continuous ingestion pipelines.

``dropDuplicatesWithinWatermark`` on the normalized-text fingerprint
keeps per-key state only until the watermark passes it, so state is
bounded by (arrival rate × watermark horizon) instead of growing with
the full corpus — the property that makes streaming dedup viable at
100 TB/day ingest. Exactness contract: duplicates arriving FARTHER
apart than the watermark horizon are not collapsed (they are separate
"epochs" of the same content); batch ``exact_dedup`` remains the
full-history reconciliation pass.

Spark reference: Structured Streaming programming guide, "Streaming
Deduplication" (dropDuplicates / dropDuplicatesWithinWatermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.text import fingerprint


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-seen document per fingerprint within the watermark horizon.

    Adds the ``fp`` column (md5 of normalized text — identical to the
    batch operator) and drops subsequent duplicates while their key is
    still inside the watermark window."""
    return (
        stream.withColumn("fp", fingerprint(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )


def run_dedup_available_now(
    spark,
    src_dir: str,
    schema,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    query_name: str = "dedup_stream",
) -> DataFrame:
    """Drain a parquet-directory stream through the dedup operator into
    an in-memory sink (test/debug harness; production writes a real
    sink)."""
    stream = spark.readStream.schema(schema).parquet(src_dir)
    deduped = streaming_exact_dedup(stream, text_col, ts_col, watermark)
    q = (
        deduped.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def _prepare_replayable_dirs(
    spark, checkpoint_dir, *dirs, clear_existing: bool = False
) -> None:
    """Make the batch_id-keyed replay contract hold for ANY batch
    partitioning (review r15): a no-checkpoint run reprocesses the
    whole source, so prior batch dirs are a previous attempt's state —
    if the new run carves different batch boundaries (different
    maxFilesPerTrigger, compacted source files), overwriting only the
    ids it produces would leave stale higher-numbered dirs duplicating
    output (and, for the C4 ledger, wrongly marking replayed spans
    'seen').

    Deleting is NEVER silent (ADVICE r15, medium): a pre-existing dir
    raises unless the caller passed ``clear_existing=True`` — the r15
    form rm -rf'd the caller-supplied out_dir (and the C4 span ledger)
    on every no-checkpoint run, so a caller accumulating a ledger
    across runs without a checkpoint silently lost all prior state,
    and a mistyped out_dir pointing at unrelated data was destroyed.
    Cross-run accumulation REQUIRES ``checkpoint_dir``: with one,
    Spark's commit log resumes batch ids monotonically and existing
    dirs are this stream's own. A FRESH checkpoint paired with
    EXISTING dirs would restart ids at 0 over stale state, so that
    pairing raises too (streaming/warc.py's contract) unless
    ``clear_existing`` opts into the wipe."""
    from ..operators.dedup import _fs_delete, _fs_exists

    fresh_checkpoint = checkpoint_dir is None or not _fs_exists(
        spark, checkpoint_dir
    )
    if not fresh_checkpoint:
        return  # resuming: existing dirs are this stream's own state
    for d in dirs:
        if not _fs_exists(spark, d):
            continue
        if clear_existing:
            _fs_delete(spark, d)
        elif checkpoint_dir is None:
            raise ValueError(
                f"output dir {d!r} already exists and no checkpoint_dir "
                "was given — this run would replay the whole source over "
                "stale batch dirs; pass clear_existing=True to wipe the "
                "previous attempt, or pass the original checkpoint_dir "
                "to resume it (cross-run accumulation requires a "
                "checkpoint)"
            )
        else:
            raise ValueError(
                f"output dir {d!r} exists but checkpoint_dir "
                f"{checkpoint_dir!r} is fresh — batch ids would "
                "restart over stale state; reuse the original "
                "checkpoint, or pass clear_existing=True"
            )


def run_incremental_dedup_available_now(
    spark,
    src_dir: str,
    schema,
    out_dir: str,
    reference: DataFrame | None = None,
    index: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
    query_name: str = "incremental_dedup_stream",
    source_options: dict[str, str] | None = None,
    checkpoint_dir: str | None = None,
    clear_existing: bool = False,
) -> DataFrame:
    """Cross-snapshot dedup gate as a stream (r13, verdict item 7):
    micro-batched NEW documents gated against the STATIC accumulated
    corpus — pass exactly one of ``reference`` (a frame) or ``index``
    (a :func:`operators.dedup.build_dedup_index` path, the
    pipeline-economical side: the stream pays O(batch) compute plus a
    narrow index scan per micro-batch, never corpus-side shingling).

    A pre-existing ``out_dir`` raises unless ``clear_existing=True``
    (ADVICE r16 — deletes are opt-in, never silent); accumulating
    output across runs requires ``checkpoint_dir``.

    ``foreachBatch`` runs the batch-proven
    :func:`operators.dedup.incremental_dedup` kernel per micro-batch —
    the decontamination precedent: LSH banding + a per-doc any-match
    decision is an explode → join → per-doc aggregate, not an
    append-mode-legal streaming plan. The gate is a PER-ROW decision
    against the static side, so the drained result is EXACTLY the
    batch gate of the union — pinned stream ≡ batch in
    tests/test_streaming.py regardless of micro-batch boundaries.

    Contract note: batches gate against the SAME static state; dup
    pairs arriving in different micro-batches both survive (exactly
    like the batch operator's default). Collapsing them is the
    snapshot cycle's job — append accepted snapshots to the index
    between stream runs (``append_dedup_index``), the same contract as
    the batch pipeline.

    Replay safety (r15 — the C4 stream's ADVICE fix applied here too):
    output lands under ``batch_id=N`` subdirectories written with
    OVERWRITE, so a micro-batch retry (or a whole re-run without a
    checkpoint) replaces its previous attempt instead of appending a
    second copy of every kept row; ``checkpoint_dir`` adds the
    standard commit log so a restarted run skips processed files."""
    from ..operators.dedup import incremental_dedup

    if (reference is None) == (index is None):
        raise ValueError("pass exactly one of reference / index")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        kept = incremental_dedup(
            batch_df,
            reference,
            text_col=text_col,
            id_col=id_col,
            threshold=threshold,
            max_bucket_size=max_bucket_size,
            index=index,
        )
        kept.write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )

    _prepare_replayable_dirs(
        spark, checkpoint_dir, out_dir, clear_existing=clear_existing
    )
    reader = spark.readStream.schema(schema)
    for k, v in (source_options or {}).items():
        reader = reader.option(k, v)
    stream = reader.parquet(src_dir)
    writer = stream.writeStream.foreachBatch(_process).queryName(query_name)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    return (
        spark.read.option("basePath", out_dir)
        .parquet(out_dir)
        .drop("batch_id")
    )


def run_incremental_semantic_dedup_available_now(
    spark,
    src_dir: str,
    schema,
    out_dir: str,
    index: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.4,
    n_probe: int = 6,
    query_name: str = "incremental_semantic_dedup_stream",
    source_options: dict[str, str] | None = None,
    max_cell_size: int | None = None,
    checkpoint_dir: str | None = None,
    clear_existing: bool = False,
) -> DataFrame:
    """Cross-snapshot SEMANTIC dedup gate as a stream (r14): micro-
    batched NEW vectors gated against a STATIC
    :func:`operators.similarity.build_semantic_index` path — the
    embedding-side twin of :func:`run_incremental_dedup_available_now`,
    with the same contract: per-batch the batch-proven kernel runs
    against the same static state, so the drained result is EXACTLY
    the batch gate of the union regardless of micro-batch boundaries
    (a per-row decision against static state); duplicate pairs
    arriving in different batches both survive, and collapsing them is
    the snapshot cycle's job (``append_semantic_index`` between stream
    runs). Replay safety (r15): batch_id-keyed OVERWRITE output and an
    optional ``checkpoint_dir`` — a retried/replayed batch replaces
    its prior attempt instead of appending duplicates. A pre-existing
    ``out_dir`` raises unless ``clear_existing=True`` (ADVICE r16)."""
    from ..operators.similarity import (
        _read_semantic_meta,
        _semantic_subdir,
        incremental_semantic_dedup,
        load_ivf_index,
    )

    # the index is STATIC for the whole stream (the gate's contract) —
    # open, repair-sweep, and collect the quantizer ONCE, not per
    # micro-batch (r14 review finding 3)
    _read_semantic_meta(spark, index)
    centroids = load_ivf_index(spark, _semantic_subdir(index, "ivf"))

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        kept = incremental_semantic_dedup(
            batch_df,
            index=index,
            threshold=threshold,
            n_probe=n_probe,
            vec_col=vec_col,
            id_col=id_col,
            centroids=centroids,
            max_cell_size=max_cell_size,
        )
        kept.write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )

    _prepare_replayable_dirs(
        spark, checkpoint_dir, out_dir, clear_existing=clear_existing
    )
    reader = spark.readStream.schema(schema)
    for k, v in (source_options or {}).items():
        reader = reader.option(k, v)
    stream = reader.parquet(src_dir)
    writer = stream.writeStream.foreachBatch(_process).queryName(query_name)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    return (
        spark.read.option("basePath", out_dir)
        .parquet(out_dir)
        .drop("batch_id")
    )


def run_c4_span_dedup_available_now(
    spark,
    src_dir: str,
    schema,
    out_dir: str,
    ledger_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    span: int = 3,
    query_name: str = "c4_span_dedup_stream",
    source_options: dict[str, str] | None = None,
    checkpoint_dir: str | None = None,
    clear_existing: bool = False,
) -> DataFrame:
    """C4 three-sentence-span dedup as a stream (r14): each micro-batch
    drops span occurrences already seen — either in the persistent SPAN
    LEDGER (the 128-bit hash pairs of every span in prior batches,
    parquet at ``ledger_dir``) or earlier WITHIN the batch (the batch
    operator's keep-one at min (id, pos)) — then appends its own span
    set to the ledger.

    Stream ≡ batch contract: when document ids are monotone in arrival
    order (the ingestion convention every first-seen streaming tier
    here relies on), the drained result EQUALS
    :func:`operators.dedup.c4_sentence_span_dedup` over the union —
    the ledger's keeper is by construction the globally-first
    occurrence, and the within-batch rule is the same min-(id, pos).
    Pinned in tests/test_streaming.py across multiple batch splits.

    Replay safety (ADVICE r14 — the medium finding): both the output
    and the ledger land under ``batch_id=N`` subdirectories written
    with OVERWRITE, and a batch recomputing itself EXCLUDES its own
    prior ledger rows — so a micro-batch retry (or a whole re-run over
    an existing ledger without a checkpoint) replaces its previous
    attempt instead of seeing its own spans as "already ledgered" and
    wrongly dropping each keeper's sentences beside the first
    attempt's correct rows. ``checkpoint_dir``, when given, adds the
    standard commit log so a restarted run skips processed files
    entirely (the other streaming modules' contract). A pre-existing
    ``out_dir`` or ``ledger_dir`` raises unless ``clear_existing=True``
    (ADVICE r16 — deletes are opt-in); accumulating the ledger across
    runs requires ``checkpoint_dir``.

    100 TB shape: the ledger is two longs per distinct span — the
    cross-batch state is hash pairs, never text — and each batch pays
    one anti-join-shaped duplicate lookup against it plus the batch
    operator's own aggregates over O(batch) spans."""
    from ..operators.dedup import (
        _rebuild_minus_covered_sentences,
        _sentence_span_frames,
    )
    from pyspark.sql import functions as F

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        base, occ = _sentence_span_frames(batch_df, text_col, id_col, span)
        occ = occ.localCheckpoint(eager=True)  # feeds 3 consumers
        try:
            led = spark.read.option("basePath", ledger_dir).parquet(
                ledger_dir
            )
            if "batch_id" in led.columns:
                # idempotent replay: a batch never gates against its
                # OWN prior attempt's rows (partition-pruned filter)
                led = led.filter(F.col("batch_id") != batch_id)
            ledger = led.select("__h1", "__h2")
        except Exception:  # noqa: BLE001 — first batch: no ledger yet
            ledger = None
        # occurrences whose span the ledger already keeps: ALL covered;
        # the rest face the within-batch keep-one rule
        if ledger is not None:
            seen = occ.join(ledger, ["__h1", "__h2"], "left_semi")
            fresh = occ.join(ledger, ["__h1", "__h2"], "left_anti")
        else:
            seen = occ.filter(F.lit(False))
            fresh = occ
        dup = (
            fresh.groupBy("__h1", "__h2")
            .agg(
                F.count(F.lit(1)).alias("__occs"),
                F.min(
                    F.struct(
                        F.col(id_col).alias("i"), F.col("__pos").alias("p")
                    )
                ).alias("__keep"),
            )
            .filter(F.col("__occs") > 1)
            .select("__h1", "__h2", "__keep")
        )
        flagged_batch = fresh.join(dup, ["__h1", "__h2"]).filter(
            ~(
                (F.col(id_col) == F.col("__keep.i"))
                & (F.col("__pos") == F.col("__keep.p"))
            )
        )
        flagged = seen.select(id_col, "__pos").unionByName(
            flagged_batch.select(id_col, "__pos")
        )
        covered = flagged.select(
            id_col,
            F.explode(
                F.sequence(F.col("__pos"), F.col("__pos") + F.lit(span - 1))
            ).alias("__cov"),
        ).distinct()
        rebuilt = _rebuild_minus_covered_sentences(
            base, covered, text_col, id_col
        )
        # batch_id-keyed OVERWRITE: a replayed batch replaces its own
        # prior attempt instead of appending a second copy beside it
        rebuilt.write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )
        # the batch's FRESH spans now have a keeper — future occurrences
        # drop; spans in `seen` are by definition already ledgered, so
        # re-appending them would grow the ledger by one duplicate row
        # per recurring span per batch (r14 review finding 2)
        fresh.select("__h1", "__h2").distinct().write.mode(
            "overwrite"
        ).parquet(f"{ledger_dir}/batch_id={batch_id}")

    _prepare_replayable_dirs(
        spark,
        checkpoint_dir,
        out_dir,
        ledger_dir,
        clear_existing=clear_existing,
    )
    reader = spark.readStream.schema(schema)
    for k, v in (source_options or {}).items():
        reader = reader.option(k, v)
    stream = reader.parquet(src_dir)
    writer = stream.writeStream.foreachBatch(_process).queryName(query_name)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    return (
        spark.read.option("basePath", out_dir)
        .parquet(out_dir)
        .drop("batch_id")
    )
