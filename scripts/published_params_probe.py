"""Published-parameter pass-rate probe (SCALE.md §11).

Drives the curation recipes at their PUBLISHED parameters — default
Gopher Table A1 thresholds, 13-gram decontamination, an order-5
stupid-backoff LM — over the realistic generated corpus
(``sources/realistic_corpus.py``) at a size the pytest suite doesn't
pay for, and prints per-class pass rates + walls as one JSON line.

Usage: python scripts/published_params_probe.py [n_docs]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from mbfbigdatarandomforest_spark.operators import dedup as dd  # noqa: E402
from mbfbigdatarandomforest_spark.operators import ngram_lm as lm_ops  # noqa: E402
from mbfbigdatarandomforest_spark.operators.text import (  # noqa: E402
    gopher_quality_filter,
)
from mbfbigdatarandomforest_spark.session import get_spark  # noqa: E402
from mbfbigdatarandomforest_spark.sources.realistic_corpus import (  # noqa: E402
    CorpusSpec,
    generate,
)

SCHEMA = (
    "doc_id string, kind string, lang string, text string, dup_of string, "
    "want_n_email int, want_n_ssn int, want_n_ipv4 int, want_n_phone int"
)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    spec = CorpusSpec(n_docs=n_docs, seed=7)
    t0 = time.time()
    rows, bench = generate(spec)
    gen_wall = time.time() - t0
    spark = get_spark(app_name="published-params-probe")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.createDataFrame(rows, SCHEMA).repartition(32).cache()
    n_total = corpus.count()
    bench_df = spark.createDataFrame(
        [{**r, "dup_of": None} for r in bench], SCHEMA
    )

    def rates(df, flag):
        out = (
            df.groupBy("kind")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col(flag).cast("int")).alias("t"),
            )
            .collect()
        )
        return {r["kind"]: round(r["t"] / r["n"], 4) for r in out}

    report: dict = {"n_docs": n_total, "gen_wall_sec": round(gen_wall, 1)}

    t0 = time.time()
    gq = gopher_quality_filter(corpus)  # ALL defaults = Table A1
    report["gopher_pass_rate_by_kind"] = rates(gq, "quality_pass")
    report["gopher_wall_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    dec = dd.decontaminate(corpus, bench_df, n=13).join(
        corpus.select("doc_id", "kind"), "doc_id"
    )
    report["decontam13_flag_rate_by_kind"] = rates(dec, "contaminated")
    report["decontam13_wall_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    # deterministic training subset (unordered .limit() varies with
    # partitioning)
    target = (
        corpus.filter(F.col("kind") == "natural")
        .orderBy("doc_id")
        .limit(n_docs // 3)
    )
    lm = lm_ops.train_backoff_lm(target, order=5, vocab_size=50_000)
    scored = lm_ops.score_stupid_backoff(
        lm, corpus.select("doc_id", "text")
    ).join(corpus.select("doc_id", "kind"), "doc_id")
    bucketed = lm_ops.perplexity_buckets(scored, col="cross_entropy")
    report["lm5_tail_rate_by_kind"] = rates(
        bucketed.withColumn("is_tail", F.col("bucket") == "tail"), "is_tail"
    )
    report["lm5_wall_sec"] = round(time.time() - t0, 2)
    lm.unpersist()

    # PII scrub recovery (r8 verdict item 5): the generator plants
    # known counts of every identifier kind in the 'pii' class and
    # zeros everywhere else; recall = recovered/planted, precision =
    # recovered/claimed, per kind, over the WHOLE corpus — so a
    # date/ID over-match anywhere (the ADVICE r7 defect) costs
    # precision, and a missed injected format costs recall.
    from mbfbigdatarandomforest_spark.operators.pii import PII_ORDER, scrub_pii

    t0 = time.time()
    scrubbed = scrub_pii(corpus, "text", out_col="scrubbed")
    agg = scrubbed.agg(
        *[
            F.sum(F.least(F.col(f"n_{k}"), F.col(f"want_n_{k}"))).alias(f"hit_{k}")
            for k in PII_ORDER
        ],
        *[F.sum(f"n_{k}").alias(f"got_{k}") for k in PII_ORDER],
        *[F.sum(f"want_n_{k}").alias(f"want_{k}") for k in PII_ORDER],
    ).collect()[0]
    report["pii_recovery"] = {
        k: {
            "recall": round(agg[f"hit_{k}"] / max(agg[f"want_{k}"], 1), 4),
            "precision": round(agg[f"hit_{k}"] / max(agg[f"got_{k}"], 1), 4),
            "planted": int(agg[f"want_{k}"]),
        }
        for k in PII_ORDER
    }
    report["pii_wall_sec"] = round(time.time() - t0, 2)

    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
