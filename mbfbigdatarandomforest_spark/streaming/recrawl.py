"""Streaming recrawl scheduling (r14 — r13 VERDICT item 8): the
freshness leg as a stream of sitemap lastmod updates against the STATIC
fetch ledger — the stream-static posture the decontamination and
incremental-dedup gates established.

Shape: sitemap entries (loc, lastmod) arrive in micro-batches (each
dump wave another file). Per batch, the accumulated per-url lastmod
state advances (append-only delta rows, summarized by max per url at
read — the dedup index's bucket_sizes pattern), and the candidate set
is recomputed with the BATCH-PROVEN kernel
(:func:`plans.llm_ops.recrawl_candidates`) over (static ledger,
accumulated lastmod state, explicit as_of), then written idempotently
(overwrite) — so after ANY prefix of batches the output is exactly the
batch answer for the entries seen so far, and the drained result is
EXACTLY the batch operator over the union (pinned in
tests/test_streaming.py). No reason-flip anomalies: a url that turns
from 'stale' to 'modified' when its lastmod bump arrives is simply
recomputed, never double-emitted.

100 TB shape: the cross-batch state is two columns per distinct
sitemap url (url, lastmod) — never page content; each batch pays one
groupBy-max over the state deltas plus the kernel's one ledger join.
Compaction of the delta rows is :func:`compact_recrawl_state` (r15 —
r14 VERDICT item 4: the groupBy-max rewrite is now code on the same
crash-safe swap + maintenance-slot contract as both dedup indexes,
exposed with them through the curation CLI's ``--index-compact``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compact_recrawl_state(spark, state_dir: str) -> dict:
    """Fold the recrawl state's append-only lastmod delta rows back to
    one row per url (readers groupBy-max, so results are unchanged by
    construction) — the dedup/semantic index compaction contract
    applied to the third persistent state: same crash-safe
    :func:`operators.dedup._swap_dir` (every boundary repairable by
    the open-time sweep in :func:`run_recrawl_available_now`), same
    single-writer maintenance slot. Returns {"urls": n}."""
    from ..operators.dedup import _repair_dangling_dir, _swap_dir

    _repair_dangling_dir(spark, state_dir)
    folded = (
        spark.read.parquet(state_dir)
        .groupBy("loc")
        .agg(F.max("__lm").alias("__lm"))
    )
    n = folded.count()
    _swap_dir(
        spark,
        state_dir,
        lambda tmp: folded.coalesce(1).write.mode("error").parquet(tmp),
    )
    return {"urls": n}


def run_recrawl_available_now(
    spark,
    src_dir: str,
    schema,
    out_dir: str,
    state_dir: str,
    ledger: DataFrame,
    as_of: str,
    default_ttl_days: float = 30.0,
    domain_ttl: DataFrame | None = None,
    query_name: str = "recrawl_stream",
    source_options: dict[str, str] | None = None,
) -> DataFrame:
    """Drain a parquet-directory stream of sitemap entries
    (loc, lastmod) and maintain the due-for-refetch candidate table at
    ``out_dir``; returns the drained candidates. ``as_of`` is required
    and explicit — the batch kernel's reproducible-clock contract."""
    from ..operators.dedup import _repair_dangling_dir
    from ..plans.llm_ops import recrawl_candidates

    # open-time repair (r15): finish or discard an interrupted
    # compact_recrawl_state swap before the first batch reads the state
    _repair_dangling_dir(spark, state_dir)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        # advance the lastmod state: one delta row per url in the batch
        (
            batch_df.select(
                "loc", F.col("lastmod").try_cast("timestamp").alias("__lm")
            )
            .filter(F.col("__lm").isNotNull())
            .groupBy("loc")
            .agg(F.max("__lm").alias("__lm"))
            .write.mode("append")
            .parquet(state_dir)
        )
        entries = (
            spark.read.parquet(state_dir)
            .groupBy("loc")
            .agg(F.max("__lm").cast("string").alias("lastmod"))
        )
        cands = recrawl_candidates(
            ledger,
            sitemap_entries=entries,
            as_of=as_of,
            default_ttl_days=default_ttl_days,
            domain_ttl=domain_ttl,
        )
        # idempotent: each batch REWRITES the candidate table, so the
        # output is always the batch answer for the entries seen so far
        # (materialize first — overwrite would otherwise clobber an
        # input of its own plan on replay)
        cands.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            out_dir
        )

    reader = spark.readStream.schema(schema)
    for k, v in (source_options or {}).items():
        reader = reader.option(k, v)
    stream = reader.parquet(src_dir)
    q = (
        stream.writeStream.foreachBatch(_process)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)
