"""End-to-end LLM-corpus curation runner — the user-facing entry point
for the engine's training-data family (the analogue of
``run_election_pipeline.py`` for the north-star extension).

Usage:
    python run_curation_pipeline.py [--sf-dir DIR] [--out DIR]
        [--max-tokens N] [--keep-fraction F] [--lm-order N]

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

Everything is deterministic: reruns produce byte-identical selections
(md5-keyed sampling/Gumbel draws, documented in operators/).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="./curation_out")
    ap.add_argument("--max-tokens", type=int, default=256)
    ap.add_argument("--keep-fraction", type=float, default=0.6,
                    help="DSIR-selected share of surviving docs")
    ap.add_argument("--lm-order", type=int, default=2,
                    help="perplexity-filter LM order (2 = bigram)")
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

    docs = load_table(spark, args.sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0").cache()
    target = corpus.filter(F.col("lang") == "en")

    # --- stage frames (same composition as plans.llm_ops.curation_funnel_v2,
    # with per-stage lineage truncation — see SCALE.md on planning cost)
    quality = (
        gopher_quality_filter(
            corpus, min_words=20, min_stopword_hits=1, min_alpha_word_frac=0.5
        )
        .filter("quality_pass")
        .select(*corpus.columns)
        .localCheckpoint()
    )
    lm = lm_ops.train_ngram_lm(target, order=args.lm_order)
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
    k = max(1, int(args.keep_fraction * clean.count()))
    selected = imp.gumbel_topk(
        imp.dsir_log_weights(clean, target, buckets=4096), k
    ).select("doc_id")
    kept = clean.join(selected, "doc_id", "left_semi").localCheckpoint()

    manifest = pack_sequences(kept, max_tokens=args.max_tokens)
    blocks = materialize_packed_blocks(kept, manifest)

    # --- artifacts
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
        "sf_dir": args.sf_dir,
        "stages": {name: n for name, n, _ in funnel_rows},
        "n_blocks": n_blocks,
        "max_tokens": args.max_tokens,
        "lm_order": args.lm_order,
        "wall_sec": round(time.time() - t0, 1),
    }
    (out / "summary.json").parent.mkdir(parents=True, exist_ok=True)
    (out / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
