"""End-to-end LLM-corpus curation runner — the user-facing entry point
for the engine's training-data family (the analogue of
``run_election_pipeline.py`` for the north-star extension).

Usage:
    python run_curation_pipeline.py [--sf-dir DIR | --text-dir DIR |
        --warc-dir DIR [--benchmark-text-dir DIR]
                       [--frontier-out DIR [--frontier-cap N]
                        [--frontier-agent TOKEN]]]
        [--out DIR] [--max-tokens N] [--keep-fraction F] [--lm-order N]

``--text-dir`` ingests raw crawl-dump text (one document per file,
``dir/<source>/<file>.txt``; a ``benchmark/`` subdir is the held-out
eval text for decontamination) via ``sources.readers.
ingest_text_documents`` — no parquet conversion step. ``--warc-dir``
ingests an actual WARC crawl dump (records → HTML → text via
``sources.warc.warc_to_documents``); decontamination uses
``--benchmark-text-dir`` when given, else skips. The datasheet
artifact is sf-dir-bound and skipped in both raw-ingest modes.

One command drives the published-pipeline composition end to end —
Gopher rules → n-gram-LM perplexity tail drop (CCNet) → exact dedup →
benchmark decontamination → DSIR importance targeting → sequence
packing — and writes real artifacts under ``--out``:

- ``datasheet/``   per-source corpus report (parquet)
- ``funnel/``      per-stage doc + whitespace-token accounting (parquet)
- ``manifest/``    packing manifest (block_id, doc_id, span) (parquet)
- ``blocks/``      materialized training blocks (parquet)
- ``kept_docs/``   the surviving documents as gzip JSONL
- ``summary.json`` one-line run summary (counts, wall)

``--frontier-out`` (with ``--warc-dir``) additionally closes the crawl
loop: anchor + sitemap candidates discovered in the dump (sitemap
bodies found in the dump AND the sitemap files robots.txt declares via
``Sitemap:`` lines — r13), robots.txt
bodies found in the dump enforced (permissions AND crawl-delay),
domains ranked by PageRank over the observed link graph, per-domain
cap applied — the next fetch frontier as parquet
(url, domain, rank, crawl_delay, kept). ``--schedule-out`` (r12, with
``--frontier-out``) further turns the kept frontier into the
time-ordered fetch plan: per-host slots authority-first, offsets
spaced by each host's declared crawl-delay
(url, domain, host, rank, slot, fetch_offset_s). ``--recrawl-as-of``
(r13, with ``--seen-urls``) closes the freshness leg: ledger urls
whose sitemap lastmod (found in the dump) is newer than their
``scheduled_at``, or whose age exceeds ``--recrawl-ttl-days``,
re-enter the frontier through the same robots + cap policy and take
LATER per-host slots than fresh discoveries. ``--c4-clean`` (r13)
runs the C4 cleaning heuristics (Raffel et al. 2020 §2.2) before the
funnel: the line filter rebuilds each document from its kept lines
and the page filter drops lorem-ipsum/brace/under-sentenced pages —
the published pipeline order. ``--c4-span-dedup`` (r14) adds the
paper's remaining rule: all but one occurrence of any three-sentence
span across the snapshot is discarded (keep-one), after the cleaning
and before the index gate. ``--dedup-index`` (r13)
closes the ingestion cycle on the CONTENT side: the ingested corpus
is gated against the accumulated corpus's persistable dedup index
before the funnel, and ``--dedup-index-append`` appends this run's
kept docs after — gate → curate → accept, at O(snapshot) per run.
``--lm-dir`` (r13) is the model-side analogue: the perplexity-filter
LM loads from the dir when an artifact exists (CCNet's posture — the
reference LM is trained once, not refit per snapshot) and bootstraps
(train + save) on first run.

Everything is deterministic: reruns produce byte-identical selections
(md5-keyed sampling/Gumbel draws, documented in operators/).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _maybe_crash(point: str) -> None:
    """Deterministic fault injection for the maintenance crash-boundary
    e2e (r16 — r15 VERDICT item 6): ``os._exit`` at a named point — no
    cleanup handlers, no JVM shutdown hooks, exactly the lost-host
    failure the per-state open-time repairs exist for. Inert unless
    SPARK_GRAFT_MAINT_CRASH_POINT names this point; never set it in a
    real maintenance slot."""
    if os.environ.get("SPARK_GRAFT_MAINT_CRASH_POINT") == point:
        print(f"# injected crash at {point}", file=sys.stderr, flush=True)
        os._exit(137)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--text-dir", default=None,
                    help="ingest raw .txt files (dir/<source>/<file>.txt, "
                    "one doc per file) instead of the sf-dir documents "
                    "table; a benchmark/ subdir feeds decontamination")
    ap.add_argument("--warc-dir", default=None,
                    help="ingest a WARC crawl dump (*.warc / *.warc.gz "
                    "shards): records → HTML → text → funnel; doc_id = "
                    "xxhash64(url), source = registered domain, lang via "
                    "the marker heuristic. Decontamination runs against "
                    "--benchmark-text-dir if given, else skips (empty "
                    "benchmark).")
    ap.add_argument("--benchmark-text-dir", default=None,
                    help="held-out eval .txt tree for decontamination in "
                    "--warc-dir mode")
    ap.add_argument("--frontier-out", default=None,
                    help="(--warc-dir mode) also emit the NEXT crawl "
                    "frontier to this dir: anchor links extracted from "
                    "the dump's pages, absolutized, deduped, filtered "
                    "by robots.txt bodies FOUND IN THE DUMP, ranked by "
                    "PageRank over the observed domain graph, capped "
                    "per domain — the fetch→extract→discover→schedule "
                    "loop closed in one command")
    ap.add_argument("--frontier-cap", type=int, default=100,
                    help="per-domain fetch cap for --frontier-out")
    ap.add_argument("--frontier-agent", default="*",
                    help="user-agent token for the robots filter")
    ap.add_argument("--schedule-out", default=None,
                    help="(with --frontier-out) also emit the fetch "
                    "PLAN: kept frontier rows slotted per host "
                    "authority-first, offsets spaced by the host's "
                    "robots crawl-delay")
    ap.add_argument("--seen-urls", default=None,
                    help="crawl ledger: parquet dir with a 'url' column "
                    "of already-fetched/scheduled canonical urls (e.g. a "
                    "prior round's frontier output); candidates in the "
                    "ledger are excluded before the per-domain cap")
    ap.add_argument("--recrawl-as-of", default=None,
                    help="(with --seen-urls + --frontier-out) re-admit "
                    "ledger urls due for a re-fetch: sitemap lastmod in "
                    "the dump newer than the ledger's scheduled_at "
                    "column, or age at THIS timestamp past the TTL. "
                    "Explicit clock ('YYYY-MM-DD HH:MM:SS') so reruns "
                    "are reproducible; the ledger parquet must carry "
                    "scheduled_at. Recrawls re-run the same robots + "
                    "cap policy and take LATER per-host slots than "
                    "fresh discoveries in --schedule-out")
    ap.add_argument("--recrawl-ttl-days", type=float, default=30.0,
                    help="re-fetch age threshold for --recrawl-as-of")
    ap.add_argument("--dedup-index", default=None,
                    help="accumulated-corpus dedup index dir "
                    "(operators.dedup.build_dedup_index layout): the "
                    "ingested corpus is gated against it BEFORE the "
                    "funnel (exact-fingerprint + cross-snapshot MinHash "
                    "tiers at O(snapshot) cost — corpus-side state is "
                    "read, never recomputed); a missing index "
                    "bootstraps from this run's kept docs when "
                    "--dedup-index-append is set")
    ap.add_argument("--dedup-index-append", action="store_true",
                    help="after the funnel, append the kept docs to "
                    "--dedup-index (or build it on bootstrap) so the "
                    "NEXT snapshot's gate sees them — the ingestion "
                    "cycle's accept step")
    ap.add_argument("--dedup-index-threshold", type=float, default=0.7,
                    help="near-dup Jaccard threshold for the "
                    "--dedup-index gate")
    ap.add_argument("--c4-clean", action="store_true",
                    help="run the C4 cleaning heuristics (Raffel et al. "
                    "2020 §2.2) BEFORE the funnel: the line filter "
                    "rebuilds each document from its kept lines "
                    "(terminal punctuation, min words, javascript, "
                    "policy boilerplate) and the page filter drops "
                    "documents failing min-sentences / lorem ipsum / "
                    "brace — the published pipeline order (line clean, "
                    "then quality, then dedup)")
    ap.add_argument("--c4-min-sentences", type=int, default=5,
                    help="C4 page filter: minimum sentences over the "
                    "kept lines (paper: 5)")
    ap.add_argument("--c4-min-words-per-line", type=int, default=3,
                    help="C4 line filter: minimum words per kept line "
                    "(paper: 3)")
    ap.add_argument("--c4-span-dedup", action="store_true",
                    help="run C4's remaining §2.2 rule (r14): discard "
                    "all but one occurrence of any three-sentence span "
                    "across the snapshot (keep-one at the globally "
                    "first (doc, position)); runs after --c4-clean and "
                    "before the dedup-index gate so the gate "
                    "fingerprints the final text representation")
    ap.add_argument("--out", default="./curation_out")
    ap.add_argument("--packing", choices=["stream", "bestfit"],
                    default="stream",
                    help="sequence packer: 'stream' = GPT-style chunking "
                    "(pack_sequences; documents split at every block "
                    "boundary they cross), 'bestfit' = whole-document "
                    "BFD bin packing (pack_bestfit, Ding et al. 2024 — "
                    "fewer truncations; only docs over --max-tokens "
                    "split)")
    ap.add_argument("--packers", type=int, default=64,
                    help="bestfit only: number of independent md5-keyed "
                    "packers (part of the result's identity — same "
                    "corpus + same packers = identical manifest)")
    ap.add_argument("--max-tokens", type=int, default=256)
    ap.add_argument("--keep-fraction", type=float, default=0.6,
                    help="DSIR-selected share of surviving docs")
    ap.add_argument("--lm-order", type=int, default=2,
                    help="perplexity-filter LM order (2 = bigram)")
    ap.add_argument("--lm-dir", default=None,
                    help="persistable perplexity-filter LM — CCNet's "
                    "actual posture (the reference LM is trained once "
                    "and reused per snapshot, not refit per run): load "
                    "the LM artifact from this dir when one exists "
                    "(its saved order wins over --lm-order), else "
                    "train on this run's target corpus and save it "
                    "there — the model-side analogue of --dedup-index")
    ap.add_argument("--semantic-index", default=None,
                    help="accumulated-corpus SEMANTIC dedup index dir "
                    "(operators.similarity.build_semantic_index "
                    "layout) — maintenance target for --index-compact/"
                    "--index-stats")
    ap.add_argument("--recrawl-state", default=None,
                    help="streaming recrawl lastmod-state dir "
                    "(streaming.recrawl layout) — maintenance target "
                    "for --index-compact/--index-stats")
    ap.add_argument("--index-compact", action="store_true",
                    help="MAINTENANCE MODE (r15): compact every given "
                    "persistent state (--dedup-index, --semantic-index, "
                    "--recrawl-state) in the single-writer maintenance "
                    "slot — gate answers are unchanged by construction "
                    "— print one JSON report, and exit without running "
                    "the funnel")
    ap.add_argument("--index-stats", action="store_true",
                    help="MAINTENANCE MODE (r15): report each given "
                    "state's size tables and the semantic index's "
                    "occupancy watermark (rebuild_advised), then exit "
                    "without running the funnel")
    ap.add_argument("--semantic-rebuild", action="store_true",
                    help="MAINTENANCE MODE (r15): refit the semantic "
                    "index's quantizer over its own accumulated "
                    "vectors (auto-k at current occupancy) — the "
                    "operation its rebuild_advised watermark advises; "
                    "crash-safe whole-index swap, then exit")
    ap.add_argument("--semantic-recall-sample", type=int, default=None,
                    metavar="N",
                    help="with --index-stats and --semantic-index: "
                    "also MEASURE IVF recall@n_probe on the first N "
                    "stored vectors (full-probe ground truth) — the "
                    "quantity the rebuild_advised proxies protect")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mbfbigdatarandomforest_spark.operators import dedup as dd
    from mbfbigdatarandomforest_spark.operators import importance as imp
    from mbfbigdatarandomforest_spark.operators import ngram_lm as lm_ops
    from mbfbigdatarandomforest_spark.operators.text import (
        gopher_quality_filter,
        materialize_packed_blocks,
        pack_sequences,
    )
    from mbfbigdatarandomforest_spark.registry import load_all
    from mbfbigdatarandomforest_spark.session import get_spark
    from mbfbigdatarandomforest_spark.sources.catalog import load_table
    from mbfbigdatarandomforest_spark.sources.sinks import write_jsonl

    t0 = time.time()
    out = Path(args.out)
    spark = get_spark(app_name="curation-pipeline")
    spark.sparkContext.setLogLevel("WARN")

    if args.index_compact or args.index_stats or args.semantic_rebuild:
        # ONE maintenance surface for all three persistent states
        # (r15 — r14 VERDICT item 4); its own run = the documented
        # single-writer maintenance slot, never concurrent with gates.
        # Fail FAST on no-op invocations (review r15): a maintenance
        # flag with no state path would print an empty success report
        # and exit 0 — the rebuild the watermark advised silently
        # never happening is worse than an error.
        if not (args.dedup_index or args.semantic_index or args.recrawl_state):
            ap.error(
                "maintenance flags (--index-compact/--index-stats/"
                "--semantic-rebuild) need at least one state path: "
                "--dedup-index, --semantic-index, or --recrawl-state"
            )
        if args.semantic_rebuild and not args.semantic_index:
            ap.error("--semantic-rebuild needs --semantic-index")
        if args.semantic_recall_sample and not (
            args.index_stats and args.semantic_index
        ):
            ap.error(
                "--semantic-recall-sample needs --index-stats and "
                "--semantic-index"
            )
        report: dict = {"maintenance": True}
        if args.dedup_index:
            ent: dict = {}
            if args.index_compact:
                ent["compacted"] = dd.compact_dedup_index(
                    spark, args.dedup_index
                )
            if args.index_stats:
                ent["stats"] = dd.dedup_index_stats(spark, args.dedup_index)
            report["dedup_index"] = ent
        _maybe_crash("after_dedup_state")
        if args.semantic_index:
            from mbfbigdatarandomforest_spark.operators import (
                similarity as sim_ops,
            )

            ent = {}
            if args.index_compact and not args.semantic_rebuild:
                # a rebuild re-routes and rewrites every vector anyway
                # (and collapses retry duplicates itself) — compacting
                # first would pay a second full-index rewrite for
                # nothing (review r15)
                ent["compacted"] = sim_ops.compact_semantic_index(
                    spark, args.semantic_index
                )
            if args.semantic_rebuild:
                ent["rebuilt"] = sim_ops.rebuild_semantic_index(
                    spark, args.semantic_index
                )
            if args.index_stats:
                ent["stats"] = sim_ops.semantic_index_stats(
                    spark, args.semantic_index
                )
                if args.semantic_recall_sample:
                    # query sample = stored vectors re-read (id, v):
                    # every stored vector should at least find itself
                    sample = spark.read.parquet(
                        args.semantic_index.rstrip("/") + "/vectors"
                    ).select(
                        F.col("id").alias("vec_id"),
                        F.col("v").alias("embedding"),
                    )
                    ent["recall"] = sim_ops.estimate_probe_recall(
                        spark,
                        args.semantic_index,
                        sample,
                        sample_cap=args.semantic_recall_sample,
                    )
            report["semantic_index"] = ent
        _maybe_crash("after_semantic_state")
        if args.recrawl_state:
            from mbfbigdatarandomforest_spark.streaming.recrawl import (
                compact_recrawl_state,
            )

            ent = {}
            if args.index_compact:
                ent["compacted"] = compact_recrawl_state(
                    spark, args.recrawl_state
                )
            if args.index_stats:
                st = spark.read.parquet(args.recrawl_state)
                ent["stats"] = {
                    "delta_rows": st.count(),
                    "urls": st.select("loc").distinct().count(),
                }
            report["recrawl_state"] = ent
        report["wall_sec"] = round(time.time() - t0, 1)
        print(json.dumps(report))
        spark.stop()
        return

    if args.warc_dir:
        from mbfbigdatarandomforest_spark.sources.warc import (
            warc_to_documents,
        )

        corpus = warc_to_documents(spark, args.warc_dir).cache()
        if args.frontier_out:
            from mbfbigdatarandomforest_spark.operators.linkgraph import (
                page_link_edges,
                pagerank,
            )
            from mbfbigdatarandomforest_spark.operators.robots import (
                parse_robots,
                parse_sitemaps,
            )
            from mbfbigdatarandomforest_spark.operators.text import (
                html_base_href,
                html_links,
                resolve_link,
            )
            from mbfbigdatarandomforest_spark.operators.urls import url_host
            from mbfbigdatarandomforest_spark.plans.llm_ops import (
                crawl_frontier,
            )
            from mbfbigdatarandomforest_spark.sources.warc import read_warc

            ok = read_warc(spark, args.warc_dir).filter(
                "error IS NULL AND status = 200"
            )
            fetched = ok.select(
                "url",
                F.expr("make_valid_utf8(cast(body as string))").alias("html"),
            ).localCheckpoint()  # one dump scan feeds rules+edges+links
            is_robots = F.col("url").rlike(r"://[^/?#]+/robots\.txt$")
            rules = parse_robots(
                fetched.filter(is_robots).select(
                    url_host("url").alias("host"), F.col("html").alias("body")
                )
            )
            # sitemap bodies in the dump (content-sniffed) are a second
            # discovery source: urlset locs are page candidates, index
            # locs are sitemap fetches — both belong on the frontier
            is_sitemap = F.col("html").rlike(
                r"(?is)<\s*(urlset|sitemapindex)[\s>]"
            )
            sitemap_entries = parse_sitemaps(
                fetched.filter(is_sitemap & ~is_robots).select(
                    F.col("html").alias("body")
                ),
                keep_cols=(),
            )
            sitemap_locs = sitemap_entries.select(F.col("loc").alias("url"))
            # robots-DECLARED sitemaps (RFC 9309 surfaces `Sitemap:`
            # lines as directive rows) are a third discovery source:
            # the files themselves belong on the frontier as fetches,
            # the same posture as a <sitemapindex> loc found in the
            # dump. They are EXEMPT from the host's own path rules
            # (r14, ADVICE r13: `Disallow: /maps` must not hide the
            # sitemap the same robots.txt just declared) — passed to
            # crawl_frontier as robots_exempt below; checkpointed once
            # (consumed by the union AND the exempt flag join).
            robots_sitemaps = (
                rules.filter(F.col("directive") == "sitemap")
                .select(F.trim("value").alias("url"))
                .filter(F.col("url") != "")
                .localCheckpoint()
            )
            html_pages = fetched.filter(~is_robots & ~is_sitemap)
            auth = pagerank(
                page_link_edges(html_pages),
                weight="n_links",
                max_iter=15,
                tol=0.0,
            ).withColumnRenamed("node", "domain")
            candidates = html_pages.select(
                F.explode(html_links(F.col("html"))).alias("href"),
                html_base_href(F.col("html")).alias("base"),
                "url",
            ).select(
                resolve_link("url", "href", "base").alias("url")
            ).filter("url IS NOT NULL").unionByName(sitemap_locs).unionByName(
                robots_sitemaps
            )
            seen = (
                spark.read.parquet(args.seen_urls)
                if args.seen_urls
                else None
            )
            recr = None
            if args.recrawl_as_of:
                if seen is None:
                    ap.error("--recrawl-as-of requires --seen-urls")
                if "scheduled_at" not in seen.columns:
                    ap.error(
                        "--recrawl-as-of needs a scheduled_at column "
                        "in the --seen-urls ledger"
                    )
                from mbfbigdatarandomforest_spark.plans.llm_ops import (
                    recrawl_candidates,
                )

                # due ledger urls re-enter: drop them from the seen
                # set and feed them back as candidates — they re-run
                # the SAME robots + per-domain-cap policy as fresh
                # discoveries (checkpointed once: consumed by the
                # anti-join, the union, and the demote flag)
                recr = recrawl_candidates(
                    seen,
                    sitemap_entries,
                    as_of=args.recrawl_as_of,
                    default_ttl_days=args.recrawl_ttl_days,
                ).localCheckpoint()
                seen = seen.join(recr.select("url"), "url", "left_anti")
                candidates = candidates.unionByName(recr.select("url"))
            frontier = crawl_frontier(
                candidates,
                rules,
                auth,
                agent=args.frontier_agent,
                cap=args.frontier_cap,
                seen=seen,
                robots_exempt=robots_sitemaps,
            ).localCheckpoint()
            if recr is not None:
                # demote flag for the scheduler: recrawls take their
                # host's LATER slots, never delaying fresh discoveries
                frontier = frontier.join(
                    recr.select("url", F.lit(True).alias("recrawl")),
                    "url",
                    "left",
                ).withColumn(
                    "recrawl", F.coalesce("recrawl", F.lit(False))
                )
            frontier.write.mode("overwrite").parquet(args.frontier_out)
            frontier_counts = {
                "discovered": frontier.count(),
                "scheduled": frontier.filter("kept").count(),
                "domains": frontier.select("domain").distinct().count(),
            }
            if recr is not None:
                frontier_counts["recrawl_due"] = recr.count()
                frontier_counts["recrawl_scheduled"] = frontier.filter(
                    "kept AND recrawl"
                ).count()
            if args.schedule_out:
                from mbfbigdatarandomforest_spark.plans.llm_ops import (
                    fetch_schedule,
                )

                sched = fetch_schedule(
                    frontier,
                    demote_col="recrawl" if recr is not None else None,
                ).localCheckpoint()
                sched.write.mode("overwrite").parquet(args.schedule_out)
                frontier_counts["schedule_makespan_s"] = (
                    sched.agg(
                        F.coalesce(
                            F.max("fetch_offset_s"), F.lit(0.0)
                        )
                    ).collect()[0][0]
                )
        if args.benchmark_text_dir:
            from mbfbigdatarandomforest_spark.sources.readers import (
                ingest_text_documents,
            )

            bench = ingest_text_documents(
                spark, args.benchmark_text_dir
            ).select("doc_id", "text")
        else:
            bench = corpus.limit(0)  # no benchmark → nothing contaminates
    else:
        if args.text_dir:
            from mbfbigdatarandomforest_spark.sources.readers import (
                ingest_text_documents,
            )

            docs = ingest_text_documents(spark, args.text_dir)
            bench_source = "benchmark"
        else:
            docs = load_table(spark, args.sf_dir, "documents")
            bench_source = "src0"
        bench = docs.filter(F.col("source") == bench_source)
        corpus = docs.filter(F.col("source") != bench_source).cache()
    # --- C4 line + page cleaning (r13): runs FIRST — before even the
    # dedup-index gate — so every later stage (the gate, quality, LM,
    # dedup, DSIR, packing) sees the rebuilt text. Ordering is
    # load-bearing for the index: the gate fingerprints the SAME text
    # representation the accepted docs were appended with; cleaning
    # after the gate would make every re-shipped doc look novel the
    # moment C4 dropped a line (review r13).
    c4_info = None
    if args.c4_clean:
        from mbfbigdatarandomforest_spark.operators.text import c4_clean

        base_cols = corpus.columns
        n_before = corpus.count()
        corpus = (
            c4_clean(
                corpus,
                min_words_per_line=args.c4_min_words_per_line,
                min_sentences=args.c4_min_sentences,
            )
            .filter("c4_pass")
            .withColumn("text", F.col("clean_text"))
            .select(*base_cols)
            .localCheckpoint()
        )
        c4_info = {"ingested": n_before, "passed": corpus.count()}

    # --- C4 three-sentence-span dedup (r14): the paper's remaining
    # §2.2 rule, applied AFTER the line/page cleaning (spans are built
    # from the kept lines' sentences) and BEFORE the index gate (same
    # load-bearing ordering: the gate must fingerprint the text the
    # accepted docs will be appended with)
    c4_span_info = None
    if args.c4_span_dedup:
        from mbfbigdatarandomforest_spark.operators.dedup import (
            c4_sentence_span_dedup,
        )

        base_cols = corpus.columns
        n_docs = corpus.count()
        spans = c4_sentence_span_dedup(corpus).localCheckpoint()
        dropped = spans.agg(
            F.sum("n_sentences_dropped").alias("d")
        ).collect()[0]["d"]
        corpus = (
            corpus.drop("text")
            .join(spans.select("doc_id", "text"), "doc_id")
            .select(*base_cols)
            .localCheckpoint()
        )
        c4_span_info = {
            "docs": n_docs,
            "sentences_dropped": int(dropped or 0),
        }

    # --- cross-snapshot gate (r13): drop documents the ACCUMULATED
    # corpus already holds before spending funnel compute on them —
    # the production tier order (gate, then curate, then append)
    dedup_index_info = None
    if args.dedup_index:
        from mbfbigdatarandomforest_spark.operators import dedup as dd_snap

        try:
            dd_snap._read_dedup_index_meta(spark, args.dedup_index)
            have_index = True
        except Exception:  # noqa: BLE001 — missing/fresh dir: bootstrap
            have_index = False
        if have_index:
            n_ingested = corpus.count()
            corpus = dd_snap.incremental_dedup(
                corpus,
                index=args.dedup_index,
                threshold=args.dedup_index_threshold,
            ).localCheckpoint()
            dedup_index_info = {
                "bootstrap": False,
                "ingested": n_ingested,
                "fresh": corpus.count(),
            }
        else:
            dedup_index_info = {"bootstrap": True}

    # text-dir mode mints a constant lang, so the LM/DSIR target is the
    # whole corpus; sf-dir documents carry a real lang column
    target = corpus.filter(F.col("lang") == "en")

    # --- stage frames (same one-enriched-pass composition as
    # plans.llm_ops.curation_funnel_v2, r6: every per-doc signal computes
    # over the corpus once into a checkpointed frame, stage membership is
    # a conjunction of flags, and the expensive gram-exploding signals run
    # over Gopher survivors only — see SCALE.md §11 on why)
    gq = gopher_quality_filter(
        corpus, min_words=20, min_stopword_hits=1, min_alpha_word_frac=0.5
    ).select(*corpus.columns, "quality_pass")
    survivors = gq.filter("quality_pass").select("doc_id", "text")
    # --- persistable reference LM (r13): CCNet's posture — the filter
    # model is trained ONCE and reused per snapshot. Presence is the
    # artifact's meta file; a present-but-foreign artifact must RAISE
    # (load_lm's kind check), never silently retrain over it.
    lm_info = None
    if args.lm_dir:
        from pyspark.errors import AnalysisException

        try:
            spark.read.text(f"{args.lm_dir.rstrip('/')}/meta").first()
            have_lm = True
        except AnalysisException:  # missing/fresh dir: bootstrap.
            # ONLY the path-missing class bootstraps — a transient IO
            # error on an EXISTING artifact must raise, never silently
            # retrain-and-overwrite the shared reference LM
            have_lm = False
        if have_lm:
            lm = lm_ops.load_lm(spark, args.lm_dir)
            lm_info = {"loaded": True, "order": lm.order}
        else:
            lm = lm_ops.train_ngram_lm(target, order=args.lm_order)
            lm_ops.save_lm(lm, args.lm_dir)
            lm_info = {"loaded": False, "order": lm.order}
    else:
        lm = lm_ops.train_ngram_lm(target, order=args.lm_order)
    ce = lm_ops.score_cross_entropy(lm, survivors).select(
        "doc_id", "cross_entropy"
    )
    contam = dd.decontaminate(survivors, bench, n=5).select(
        "doc_id", "contaminated"
    )
    enriched = (
        gq.join(ce, "doc_id", "left")
        .join(contam, "doc_id", "left")
        .localCheckpoint()
    )
    s1 = F.col("quality_pass")
    keep_ppl = (
        lm_ops.perplexity_buckets(
            enriched.filter(s1).select("doc_id", "cross_entropy"),
            col="cross_entropy",
        )
        .filter(F.col("bucket") != "tail")
        .select("doc_id")
    )
    e2 = enriched.join(keep_ppl.withColumn("f2", F.lit(1)), "doc_id", "left")
    s2 = s1 & F.col("f2").isNotNull()
    keep_ids = dd.exact_dedup(e2.filter(s2)).select(
        F.col("keep_id").alias("doc_id")
    )
    e3 = e2.join(keep_ids.withColumn("f3", F.lit(1)), "doc_id", "left")
    s3 = s2 & F.col("f3").isNotNull()
    s4 = s3 & ~F.col("contaminated")
    clean = e3.filter(s4).localCheckpoint()
    k = max(1, int(args.keep_fraction * clean.count()))
    selected = imp.gumbel_topk(
        imp.dsir_log_weights(clean, target, buckets=4096), k
    ).select("doc_id")
    kept = clean.join(selected, "doc_id", "left_semi").localCheckpoint()
    doc_cols = corpus.columns
    quality = enriched.filter(s1).select(*doc_cols)
    head_mid = e3.filter(s2).select(*doc_cols)  # s2/s3 flags live on e3
    deduped = e3.filter(s3).select(*doc_cols)
    clean = clean.select(*doc_cols)
    kept = kept.select(*doc_cols)

    if args.dedup_index and args.dedup_index_append:
        # the accept step: the NEXT snapshot's gate must see this run's
        # kept docs (bootstrap builds the index from them)
        if dedup_index_info.get("bootstrap"):
            dd_snap.build_dedup_index(kept, args.dedup_index)
        else:
            dd_snap.append_dedup_index(kept, args.dedup_index)
        dedup_index_info["appended"] = kept.count()

    if args.packing == "bestfit":
        from mbfbigdatarandomforest_spark.operators.text import (
            pack_bestfit,
        )

        manifest = pack_bestfit(
            kept, max_tokens=args.max_tokens, packers=args.packers
        ).withColumnRenamed("bin_id", "block_id")
    else:
        manifest = pack_sequences(kept, max_tokens=args.max_tokens)
    blocks = materialize_packed_blocks(kept, manifest)

    # --- artifacts
    if not (args.text_dir or args.warc_dir):  # datasheet is sf-dir-bound
        specs = load_all()
        specs["corpus_datasheet"].fn(spark, args.sf_dir).write.mode(
            "overwrite"
        ).parquet(str(out / "datasheet"))
    stages = {
        "0_raw": corpus,
        "1_gopher_quality": quality,
        "2_lm_head_middle": head_mid,
        "3_exact_dedup": deduped,
        "4_decontaminated": clean,
        "5_dsir_selected": kept,
    }
    # doc AND token accounting per stage (whitespace-token unit — the
    # packer's unit; curation_funnel_v2 is the BPE-unit twin). One
    # aggregate job per checkpointed stage frame.
    from mbfbigdatarandomforest_spark.operators.text import tokens

    funnel_rows = [
        (
            name,
            *df.agg(
                F.count(F.lit(1)),
                F.coalesce(F.sum(F.size(tokens("text"))), F.lit(0)),
            ).first(),
        )
        for name, df in stages.items()
    ]
    spark.createDataFrame(
        funnel_rows, "stage string, n_docs long, n_ws_tokens long"
    ).write.mode("overwrite").parquet(str(out / "funnel"))
    manifest.write.mode("overwrite").parquet(str(out / "manifest"))
    blocks.write.mode("overwrite").parquet(str(out / "blocks"))
    write_jsonl(kept, str(out / "kept_docs"))

    n_blocks = spark.read.parquet(str(out / "blocks")).count()
    summary = {
        "input": args.warc_dir or args.text_dir or args.sf_dir,
        "stages": {name: n for name, n, _ in funnel_rows},
        "n_blocks": n_blocks,
        "max_tokens": args.max_tokens,
        "packing": args.packing,
        "lm_order": args.lm_order,
        "wall_sec": round(time.time() - t0, 1),
    }
    if args.warc_dir and args.frontier_out:
        summary["frontier"] = frontier_counts
    if dedup_index_info is not None:
        summary["dedup_index"] = dedup_index_info
    if c4_info is not None:
        summary["c4_clean"] = c4_info
    if c4_span_info is not None:
        summary["c4_span_dedup"] = c4_span_info
    if lm_info is not None:
        summary["lm"] = lm_info
    (out / "summary.json").parent.mkdir(parents=True, exist_ok=True)
    (out / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
