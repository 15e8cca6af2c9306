"""Per-stage wall attribution for curation_funnel_v2 (r17 — r16 VERDICT
item 3/finding 4: the funnel is a top-4 bench query whose residual wall
was never attributed). Replicates the registered query's body with a
perf_counter around every DRIVER-BLOCKING point (collect / checkpoint /
count / percentile / final action) and a job description per phase, at
$SPARK_GRAFT_SF_DIR (default sf0.1). Measurement-only: not imported by
bench.py or the registry.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from mbfbigdatarandomforest_spark.operators import dedup as dd  # noqa: E402
from mbfbigdatarandomforest_spark.session import get_spark  # noqa: E402
from mbfbigdatarandomforest_spark.sources.catalog import load_table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="funnel-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from mbfbigdatarandomforest_spark.operators import bpe as bpe_ops
    from mbfbigdatarandomforest_spark.operators import importance as imp
    from mbfbigdatarandomforest_spark.operators import ngram_lm as lm_ops
    from mbfbigdatarandomforest_spark.operators.text import (
        gopher_quality_filter,
        pack_sequences,
    )

    walls: dict[str, float] = {}

    def mark(name: str, t0: float) -> None:
        walls[name] = round(time.perf_counter() - t0, 3)
        print(f"{name:28s} {walls[name]:7.3f}s", flush=True)

    t_all = time.perf_counter()
    sc = spark.sparkContext

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0").cache()
    target = corpus.filter(F.col("lang") == "en")

    sc.setJobDescription("funnel: bpe word counts + merge collect")
    t0 = time.perf_counter()
    wc = bpe_ops.word_counts(corpus, max_words=None).cache()
    merge_rows = (
        wc.orderBy(F.col("c").desc(), F.col("word").asc())
        .limit(500_000)
        .collect()
    )
    mark("wc_collect", t0)
    merges = bpe_ops.learn_bpe(
        [(r["word"], r["c"]) for r in merge_rows], num_merges=100
    )
    encoded = bpe_ops.encode_vocab(wc, merges).select("word", "n_tokens").cache()

    sc.setJobDescription("funnel: LM vocab collect + train")
    t0 = time.perf_counter()
    lm = lm_ops.train_bigram_lm(target, vocab_size=50_000)
    mark("lm_train_vocab_collect", t0)

    gq = gopher_quality_filter(
        corpus, min_words=20, min_stopword_hits=1, min_alpha_word_frac=0.5
    ).select("doc_id", "text", "quality_pass")
    survivors = gq.filter("quality_pass").select("doc_id", "text")
    ce = lm_ops.score_cross_entropy(lm, survivors).select(
        "doc_id", "cross_entropy"
    )
    contam = dd.decontaminate(survivors, bench, n=5).select(
        "doc_id", "contaminated"
    )
    counts = bpe_ops.bpe_token_counts(
        corpus, merges, encoded=encoded, broadcast_vocab=False
    ).select("doc_id", "n_bpe_tokens")
    sc.setJobDescription("funnel: enriched checkpoint")
    t0 = time.perf_counter()
    enriched = (
        gq.join(ce, "doc_id", "left")
        .join(contam, "doc_id", "left")
        .join(counts, "doc_id", "left")
        .localCheckpoint()
    )
    mark("enriched_checkpoint", t0)

    s1 = F.col("quality_pass")
    sc.setJobDescription("funnel: stage-2 percentile")
    t0 = time.perf_counter()
    keep2 = (
        lm_ops.perplexity_buckets(
            enriched.filter(s1).select("doc_id", "cross_entropy"),
            col="cross_entropy",
        )
        .filter(F.col("bucket") != "tail")
        .select("doc_id")
    )
    mark("keep2_percentile", t0)

    def with_flag(df, ids, name):
        return df.join(ids.withColumn(name, F.lit(1)), "doc_id", "left")

    e2 = with_flag(enriched, keep2, "f2")
    s2 = s1 & F.col("f2").isNotNull()
    keep3 = dd.exact_dedup(e2.filter(s2)).select(
        F.col("keep_id").alias("doc_id")
    )
    e3 = with_flag(e2, keep3, "f3")
    s3 = s2 & F.col("f3").isNotNull()
    s4 = s3 & ~F.col("contaminated")
    sc.setJobDescription("funnel: clean count")
    t0 = time.perf_counter()
    clean = e3.filter(s4).cache()
    k = max(1, int(0.6 * clean.count()))
    mark("clean_count", t0)
    selected = imp.gumbel_topk(
        imp.dsir_log_weights(clean, target, buckets=4096), k
    ).select("doc_id")
    sc.setJobDescription("funnel: e5 checkpoint (dsir+gumbel)")
    t0 = time.perf_counter()
    e5 = with_flag(e3, selected, "f5").localCheckpoint()
    mark("e5_checkpoint", t0)
    for frame in (clean, corpus, wc, encoded):
        frame.unpersist()
    lm.unpersist()
    s5 = s4 & F.col("f5").isNotNull()
    sc.setJobDescription("funnel: pack_sequences sizing")
    t0 = time.perf_counter()
    manifest = pack_sequences(e5.filter(s5), max_tokens=256)
    mark("pack_sizing", t0)

    def stage_cols(in_stage, tag):
        n_docs = F.sum(in_stage.cast("long"))
        covered = F.count(F.when(in_stage, F.col("n_bpe_tokens")))
        tok = (
            F.when(covered < n_docs, F.lit(None).cast("long"))
            .otherwise(
                F.coalesce(
                    F.sum(F.when(in_stage, F.col("n_bpe_tokens"))), F.lit(0)
                )
            )
        )
        return [n_docs.alias(f"d{tag}"), tok.alias(f"t{tag}")]

    stage_flags = [F.lit(True), s1, s2, s3, s4, s5]
    wide = e5.agg(
        *[
            c
            for i, fl in enumerate(stage_flags)
            for c in stage_cols(fl, str(i))
        ],
    )
    n_blocks = manifest.select(F.count_distinct("block_id").alias("n"))
    names = [
        "0_raw",
        "1_gopher_quality",
        "2_lm_head_middle",
        "3_exact_dedup",
        "4_decontaminated",
        "5_dsir_selected",
    ]
    stack_args = ", ".join(
        f"'{nm}', d{i}, t{i}" for i, nm in enumerate(names)
    )
    out = (
        wide.crossJoin(F.broadcast(n_blocks))
        .select(
            F.expr(
                f"stack(7, {stack_args}, '6_packed_blocks', CAST(n AS LONG), t5) "
                "AS (stage, n_docs, n_bpe_tokens)"
            )
        )
        .orderBy("stage")
    )
    sc.setJobDescription("funnel: final action")
    t0 = time.perf_counter()
    out.write.mode("overwrite").format("noop").save()
    mark("final_action", t0)
    mark("TOTAL", t_all)
    print(walls)
    spark.stop()


if __name__ == "__main__":
    main()
