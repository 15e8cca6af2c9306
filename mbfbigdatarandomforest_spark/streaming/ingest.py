"""Streaming crawl-dump ingestion — watch a directory tree of raw text
files and curate documents AS THEY ARRIVE.

The streaming twin of ``sources.readers.ingest_text_documents`` + the
Gopher quality gate: Structured Streaming's file source discovers new
``dir/<source>/<file>.txt`` files per micro-batch, the SHARED
``documents_projection`` mints the same stable path-hash doc ids, and
``gopher_quality_filter`` runs unchanged — every operator in the chain
is a pure column expression, so the whole plan is append-mode-legal
with NO foreachBatch escape hatch and no state store. (Set-dependent
stages — LM cutoffs, dedup, DSIR — stay batch or foreachBatch; see
``streaming/decontam.py`` for that pattern.)

Scale shape: the file source's discovery cost is per-listing;
production crawls partition arrival directories by time so each
listing is bounded. One whole file becomes one row (same many-small-
files caveat as the batch reader, documented there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.text import gopher_quality_filter
from ..sources.readers import documents_projection


def read_document_stream(
    spark,
    text_dir: str,
    *,
    lang: str = "en",
    source_options: dict[str, str] | None = None,
) -> DataFrame:
    """Unbounded documents frame over a crawl-dump directory tree —
    same shape and same doc ids as the batch ``ingest_text_documents``.

    ``source_options`` passes through to the file source. The one that
    matters at crawl scale: ``cleanSource='archive'`` (+
    ``sourceArchiveDir``) or ``'delete'`` moves/removes files after
    their micro-batch commits, so the per-trigger directory listing
    stays O(unprocessed files) instead of O(every file ever landed) —
    measured in SCALE.md §13, the listing growth is exactly what
    degraded wave throughput 104→54 docs/s on an append-only tree.
    Archive (not delete) is the production default posture: the raw
    dump remains replayable from the archive dir."""
    reader = spark.readStream
    for k, v in (source_options or {}).items():
        reader = reader.option(k, v)
    raw = reader.text(
        f"{text_dir.rstrip('/')}/*/*.txt", wholetext=True
    ).withColumn("source_file", F.input_file_name())
    return documents_projection(raw, lang=lang)


def run_ingest_curate_available_now(
    spark,
    text_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    lang: str = "en",
    query_name: str = "ingest_curate_stream",
    **gopher_kwargs,
) -> DataFrame:
    """Drain the dump tree through ingestion + the Gopher gate into
    parquet (bounded run of the unbounded plan). Survivors keep the
    per-rule audit columns; exactly-once comes from the file-sink
    commit log + checkpoint."""
    docs = read_document_stream(spark, text_dir, lang=lang)
    curated = gopher_quality_filter(docs, **gopher_kwargs).filter("quality_pass")
    q = (
        curated.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)
