"""End-to-end streaming curation — the shape a 100 TB crawl pipeline
actually runs, as ONE continuous Structured Streaming query:

    crawl-dump tree  →  ingest (file source, whole-file rows)
                     →  Gopher quality gate      (pure columns)
                     →  exact dedup              (watermarked state)
                     →  benchmark decontamination (foreachBatch kernel)
                     →  curated parquet

Composition rules, stage by stage:

- Ingestion + Gopher are pure column expressions over the file stream
  (``streaming/ingest.py``) — append-legal, no state.
- Exact dedup is ``dropDuplicatesWithinWatermark`` on the normalized-
  text fingerprint (``streaming/dedup.py``): cross-micro-batch state,
  bounded by the watermark horizon. The event-time column is the
  PROCESSING time of the row's micro-batch (``current_timestamp()``) —
  a crawl dump has no intrinsic event time, and arrival order is
  exactly the "first seen wins" contract the batch reconciliation
  (``operators.dedup.exact_dedup``) mirrors with min-id.
- Decontamination needs explode→join→aggregate against the static
  benchmark gram set — not append-legal as a stream transform — so it
  runs as the ``foreachBatch`` kernel (``streaming/decontam.py``),
  sharing the SAME batch-proven ``decontaminate_batch`` body and the
  gram set cached once at stream start.

State story at scale: the only stateful operator is the dedup — its
store holds (fingerprint → expiry) for the watermark horizon, i.e.
O(arrival-rate × horizon), never O(corpus). Everything else is
stateless per batch; the benchmark gram set is broadcast-sized by
construction (eval sets are thousands of docs).

Measured (SCALE.md §13): docs/s per trigger and state-store rows across
a 3-wave arrival driven by ``scripts/streaming_curation_probe.py``;
stream ≡ batch composition pinned by
``tests/test_streaming.py::test_streaming_curation_composition_matches_batch``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.text import gopher_quality_filter
from .decontam import benchmark_gram_set, decontaminate_batch
from .dedup import streaming_exact_dedup
from .ingest import read_document_stream
from .sinks import write_batch_idempotent


def start_curation_stream(
    spark,
    text_dir: str,
    benchmark: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    *,
    lang: str = "en",
    watermark: str = "1 hour",
    n: int = 13,
    query_name: str = "curation_stream",
    source_options: dict[str, str] | None = None,
    c4: dict | None = None,
    **gopher_kwargs,
):
    """Start the continuous curation query over a growing dump tree.

    Returns the live ``StreamingQuery`` — callers drive it
    (``processAllAvailable`` per arrival wave, then ``stop``) and read
    ``out_dir`` for the curated corpus. Progress objects carry
    ``numInputRows`` / ``triggerExecution`` / ``stateOperators`` for
    throughput and state-size measurement.

    ``n=13`` is the published decontamination gram length the batch
    gate validated (SCALE.md §11).

    ``c4`` (r13): kwargs dict for :func:`~..operators.text.c4_clean`
    (``{}`` = the paper defaults) — runs the C4 line+page cleaning
    BEFORE the Gopher stage, the batch CLI's ``--c4-clean`` order.
    Pure per-row column expressions, so the stage is append-legal and
    stream ≡ batch holds exactly.

    The returned query carries the cached gram set as ``bench_grams``;
    callers that start many streams in one long-lived session should
    ``q.bench_grams.unpersist()`` after ``q.stop()`` (the probe and
    tests do) — the cache is otherwise pinned until session end."""
    bench_grams = benchmark_gram_set(benchmark, "text", "doc_id", n).cache()
    bench_grams.count()  # eager: one shingle pass total, not one per batch

    docs = read_document_stream(
        spark, text_dir, lang=lang, source_options=source_options
    )
    if c4 is not None:
        from ..operators.text import c4_clean

        # the stage rewrites the stream's 'text' from 'clean_text', so
        # column-renaming kwargs would silently break the wiring —
        # reject them up front (review r13)
        bad = {"text_col", "out_col"} & set(c4)
        if bad:
            raise ValueError(
                f"c4 options {sorted(bad)} are fixed by the curation "
                "stream (text in, clean_text out) — pass threshold/"
                "blockword options only"
            )
        base_cols = docs.columns
        docs = (
            c4_clean(docs, **c4)
            .filter("c4_pass")
            .withColumn("text", F.col("clean_text"))
            .select(*base_cols)
        )
    curated = gopher_quality_filter(docs, **gopher_kwargs).filter("quality_pass")
    arrived = curated.withColumn("__arrival", F.current_timestamp())
    deduped = streaming_exact_dedup(
        arrived, text_col="text", ts_col="__arrival", watermark=watermark
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        clean = decontaminate_batch(
            batch_df.drop("__arrival"), bench_grams, "text", "doc_id", n
        )
        # idempotent per-batch partition overwrite (streaming/sinks.py):
        # a micro-batch REPLAYED after failure recovery replaces its own
        # partition instead of appending duplicates — plain append here
        # would break the stream≡batch contract exactly once per crash
        write_batch_idempotent(clean, batch_id, out_dir)

    q = (
        deduped.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
    q.bench_grams = bench_grams
    return q
