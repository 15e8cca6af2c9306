"""Streaming WARC ingestion — the crawl FRONT DOOR as a stream.

Round 10 wired batch WARC ingestion (``sources/warc.py``); the
streaming curation story, however, started one stage downstream, at
already-extracted text trees (``streaming/ingest.py``). This module
closes that asymmetry (r11): shard files landing in a dump directory
are discovered per micro-batch by Structured Streaming's ``binaryFile``
source, split into records by the SAME in-task generator the batch
reader uses (``split_warc_records``), and projected to the documents
contract by the SAME column-expression chain
(``warc_documents_projection``). Every stage is stateless — record
splitting is a per-shard ``mapInPandas`` (no cross-row state), the
projection is filters + hashes + regexp chains — so the whole plan is
append-mode-legal with NO foreachBatch escape hatch and no state
store, and stream ≡ batch is exact by construction (pytest-pinned).

Scale shape: one shard = one source file = one task, the batch
reader's unit of parallelism unchanged. Listing cost is per-trigger;
production dumps partition arrival dirs by time and archive processed
shards (``cleanSource='archive'`` — the measured posture from
SCALE.md §13's append-only-listing degradation).

Spark reference: Structured Streaming programming guide, "Input
Sources — File source"; ISO 28500 (WARC) for the record framing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..sources.warc import split_warc_records, warc_documents_projection

#: the binaryFile source's fixed schema — streaming file sources
#: require it stated explicitly (batch infers it)
_BINARY_FILE_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("modificationTime", TimestampType()),
        StructField("length", LongType()),
        StructField("content", BinaryType()),
    ]
)


def read_warc_stream(
    spark,
    path: str,
    record_types: tuple[str, ...] = ("response",),
    source_options: dict[str, str] | None = None,
) -> DataFrame:
    """Unbounded (shard, url, record_type, date, status, body, error)
    frame over a WARC dump directory — the streaming twin of
    ``sources.warc.read_warc``, same splitter, same quarantine rows.

    ``source_options`` passes through to the file source
    (``maxFilesPerTrigger`` for micro-batch granularity,
    ``cleanSource``/``sourceArchiveDir`` for bounded listings)."""
    reader = spark.readStream.format("binaryFile").schema(_BINARY_FILE_SCHEMA)
    for k, v in (source_options or {}).items():
        reader = reader.option(k, v)
    shards = reader.load(path)
    return split_warc_records(
        shards.select(F.col("path").alias("shard"), "content"),
        record_types=record_types,
    )


def warc_document_stream(
    spark,
    path: str,
    lang_col: bool = True,
    drop_invalid_utf8: bool = False,
    source_options: dict[str, str] | None = None,
) -> DataFrame:
    """Unbounded documents frame (doc_id, text, source[, lang]) over a
    WARC dump — the streaming twin of ``warc_to_documents``, sharing
    its projection verbatim."""
    return warc_documents_projection(
        read_warc_stream(spark, path, source_options=source_options),
        lang_col=lang_col,
        drop_invalid_utf8=drop_invalid_utf8,
    )


def warc_link_stream(
    spark,
    path: str,
    source_options: dict[str, str] | None = None,
) -> DataFrame:
    """Unbounded frontier-candidate feed over a WARC dump: successful
    pages → anchor hrefs (``text.html_links``) → absolutized
    (``text.resolve_link``) → (page_url, link) rows. Every stage is a
    column expression + one explode — append-legal, no state. The
    batch-side frontier scheduler (``plans.llm_ops.crawl_frontier``)
    consumes the landed candidates: dedup/cap are windowed, i.e.
    deliberately batch (the discover-continuously / schedule-
    periodically split real crawl loops run)."""
    from ..operators.text import html_base_href, html_links, resolve_link

    recs = read_warc_stream(spark, path, source_options=source_options)
    pages = recs.filter(
        F.col("error").isNull() & (F.col("status") == 200)
    ).select(
        "url",
        F.expr("make_valid_utf8(cast(body as string))").alias("html"),
    )
    return (
        pages.select(
            F.col("url").alias("page_url"),
            html_base_href(F.col("html")).alias("__base"),
            F.explode(html_links(F.col("html"))).alias("__href"),
        )
        .select(
            "page_url",
            resolve_link(
                F.col("page_url"), F.col("__href"), F.col("__base")
            ).alias("link"),
        )
        .filter(F.col("link").isNotNull())
    )


def run_warc_ingest_available_now(
    spark,
    dump_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    lang_col: bool = True,
    drop_invalid_utf8: bool = False,
    source_options: dict[str, str] | None = None,
    query_name: str = "warc_ingest_stream",
    progress: list | None = None,
) -> DataFrame:
    """Drain a WARC dump directory into a parquet documents table
    (bounded run of the unbounded plan). Exactly-once comes from the
    file-sink commit log + checkpoint; ``progress``, when given,
    receives the query's recentProgress objects (per-batch rows and
    durations — the docs/s probe evidence).

    ``out_dir`` must be fresh per run UNLESS the checkpoint already
    exists: a rerun with the SAME checkpoint after a mid-ingest crash
    is the legitimate exactly-once RESUME (the file-sink commit log
    skips already-committed batches), so pre-existing results only
    raise when the checkpoint is fresh — that pairing would silently
    mix two unrelated runs (ADVICE r12). A zero-batch drain (an empty
    dump dir is a legal source state) returns an empty correctly-typed
    documents frame instead of failing the final read on a
    never-created directory — the streaming/similarity posture
    (ADVICE r9/r11)."""
    from .similarity import _dir_holds_results, _fs_and_path

    ckpt_fs, ckpt_path = _fs_and_path(spark, checkpoint_dir)
    resuming = ckpt_fs.exists(ckpt_path)
    if not resuming and _dir_holds_results(spark, out_dir):
        raise ValueError(
            f"out_dir {out_dir!r} already holds results from a prior "
            f"run but checkpoint_dir {checkpoint_dir!r} is fresh; "
            "streaming appends would silently mix runs — pass a fresh "
            "directory (to RESUME a crashed ingest, rerun with the "
            "original checkpoint_dir)"
        )
    docs = warc_document_stream(
        spark,
        dump_dir,
        lang_col=lang_col,
        drop_invalid_utf8=drop_invalid_utf8,
        source_options=source_options,
    )
    q = (
        docs.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if progress is not None:
        progress.extend(q.recentProgress)
    if not _dir_holds_results(spark, out_dir):
        # zero micro-batches: the sink never committed a file — hand
        # back the plan's own (empty) schema rather than a read error
        return spark.createDataFrame([], docs.schema)
    return spark.read.parquet(out_dir)
