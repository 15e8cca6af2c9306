"""Published-parameter validation of the curation family (r6, verdict
item 3).

Every registered text-operator query runs tuned-down knobs because the
driver's synthetic documents are ~50-token word-soup from a ~31-type
vocabulary. These tests generate a REALISTIC corpus (zipf vocabulary,
300-800-token documents, injected defect classes — see
``sources/realistic_corpus.py``) and drive the operators at the
PUBLISHED parameters:

- Gopher Table A1 quality rules at their DEFAULT thresholds
  (Rae et al. 2021),
- 13-gram benchmark decontamination (the published convention),
- an order-5 CCNet-style LM (the production filter is a 5-gram KenLM),
- exact + banded-MinHash dedup against labeled injected duplicates,
- the full funnel composition end-to-end at those parameters.

The difference from the registered queries: these assert the RECIPES
behave (pass rates, per-class attribution), not just that the plans
run. Pass rates are recorded in SCALE.md §11 by
``scripts/published_params_probe.py`` (same generator, bigger corpus).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mbfbigdatarandomforest_spark.operators import dedup as dd
from mbfbigdatarandomforest_spark.operators import importance as imp
from mbfbigdatarandomforest_spark.operators import ngram_lm as lm_ops
from mbfbigdatarandomforest_spark.operators.text import (
    gopher_quality_filter,
    pack_sequences,
)
from mbfbigdatarandomforest_spark.sources.realistic_corpus import (
    CorpusSpec,
    generate,
)

SPEC = CorpusSpec(n_docs=1200, seed=7)
SCHEMA = (
    "doc_id string, kind string, lang string, text string, dup_of string, "
    "want_n_email int, want_n_ssn int, want_n_ipv4 int, want_n_phone int"
)


@pytest.fixture(scope="module")
def _frames(spark):
    rows, bench = generate(SPEC)  # generated ONCE per module
    corpus = spark.createDataFrame(rows, SCHEMA).cache()
    corpus.count()
    bench_df = spark.createDataFrame(
        [{**r, "dup_of": None} for r in bench], SCHEMA
    ).cache()
    return corpus, bench_df


@pytest.fixture(scope="module")
def corpus(_frames):
    return _frames[0]


@pytest.fixture(scope="module")
def bench_docs(_frames):
    return _frames[1]


def _lm_target(corpus):
    """Deterministic training subset: an unordered .limit() takes
    whichever rows arrive first and can change with partitioning."""
    return (
        corpus.filter(F.col("kind") == "natural")
        .orderBy("doc_id")
        .limit(500)
    )


def _rates(df, flag_col):
    rows = (
        df.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(flag_col).cast("int")).alias("n_true"),
        )
        .collect()
    )
    return {r["kind"]: (r["n_true"], r["n"]) for r in rows}


def test_gopher_default_thresholds(corpus):
    """Table A1 at DEFAULTS: natural prose passes wholesale; each
    injected defect class fails, and fails for ITS OWN rule."""
    out = gopher_quality_filter(corpus).cache()
    rates = _rates(out, "quality_pass")
    # natural docs: >= 99% pass (the rules are calibrated for prose)
    n_true, n = rates["natural"]
    assert n_true / n >= 0.99, rates
    # gibberish is grammatical-looking junk: Gopher rules PASS it —
    # dropping it is the LM's job (the published division of labor)
    n_true, n = rates["gibberish"]
    assert n_true / n >= 0.95, rates
    # each defect class fails wholesale...
    for kind in ("short", "symbols", "bullets", "numeric", "nostop"):
        n_true, n = rates[kind]
        assert n_true == 0, (kind, rates)
    # ...and for its own rule
    expected_reason = {
        "short": "word_count",
        "symbols": "symbol_ratio",
        "bullets": "bullet_lines",
        "numeric": "alpha_words",
        "nostop": "stopwords",
    }
    got = {
        r["kind"]: set(r["reasons"])
        for r in out.filter(~F.col("quality_pass"))
        .groupBy("kind")
        .agg(F.array_distinct(F.flatten(F.collect_list("fail_reasons"))).alias("reasons"))
        .collect()
    }
    for kind, reason in expected_reason.items():
        assert reason in got[kind], (kind, got)
    out.unpersist()


def test_decontaminate_13gram(corpus, bench_docs):
    """The published 13-gram convention flags exactly the docs carrying
    a verbatim benchmark span — zero false positives on a zipf corpus
    (a coincidental 13-token collision is ~impossible)."""
    out = dd.decontaminate(corpus, bench_docs, n=13)
    flagged = {
        r["doc_id"] for r in out.filter("contaminated").select("doc_id").collect()
    }
    expected = {
        r["doc_id"]
        for r in corpus.filter(F.col("kind") == "contaminated")
        .select("doc_id")
        .collect()
    }
    assert flagged == expected, (
        len(flagged - expected),
        len(expected - flagged),
    )


def test_lm_order5_separates_gibberish(spark, corpus):
    """An order-5 BACKOFF LM trained on natural prose scores gibberish
    far into the tail. CCNet's production filter is a 5-gram KenLM — a
    backoff model — and backoff is load-bearing: a plain add-k order-5
    (no backoff) cannot separate this corpus, because virtually every
    4-token context is unseen and both classes collapse onto the
    smoothing floor (measured: natural 8.64 vs gibberish 9.02
    nats/gram — rank-separable but within noise of each other). The
    stupid-backoff estimator (Brants 2007, the published
    distributed-scale choice) grounds at unigram frequencies, where the
    in-vocabulary/OOV signal is decisive."""
    target = _lm_target(corpus)
    lm = lm_ops.train_backoff_lm(target, order=5, vocab_size=50_000)
    scored = lm_ops.score_stupid_backoff(
        lm, corpus.select("doc_id", "kind", "text")
    ).join(corpus.select("doc_id", "kind"), "doc_id")
    means = {
        r["kind"]: r["ce"]
        for r in scored.groupBy("kind")
        .agg(F.avg("cross_entropy").alias("ce"))
        .collect()
    }
    assert means["gibberish"] > means["natural"] + 1.0, means
    bucketed = lm_ops.perplexity_buckets(scored, col="cross_entropy")
    tail = _rates(
        bucketed.withColumn("is_tail", F.col("bucket") == "tail"), "is_tail"
    )
    n_tail, n = tail["gibberish"]
    assert n_tail / n >= 0.95, tail
    lm.unpersist()


def test_dedup_finds_injected_duplicates(corpus):
    """Exact dedup collapses every verbatim copy onto its source;
    banded MinHash at default b×r recovers >= 90% of the ~2%-edited
    near-dup pairs."""
    keep = dd.exact_dedup(corpus)
    kept_ids = {r["keep_id"] for r in keep.select("keep_id").collect()}
    exact_dups = {
        (r["doc_id"], r["dup_of"])
        for r in corpus.filter(F.col("kind") == "exact_dup")
        .select("doc_id", "dup_of")
        .collect()
    }
    assert exact_dups, "fixture must inject exact dups"
    for dup_id, src in exact_dups:
        # the copy never survives (min-id keep rule; sources sort first)
        assert dup_id not in kept_ids, (dup_id, src)
        assert src in kept_ids, (dup_id, src)
    near = {
        (r["dup_of"], r["doc_id"])
        for r in corpus.filter(F.col("kind") == "near_dup")
        .select("doc_id", "dup_of")
        .collect()
    }
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dd.banded_minhash_pairs(corpus, threshold=0.5).collect()
    }
    hit = sum(1 for a, b in near if (min(a, b), max(a, b)) in pairs)
    assert hit / len(near) >= 0.9, (hit, len(near))


def test_funnel_composition_at_published_parameters(spark, corpus, bench_docs):
    """The full published recipe end-to-end — default Gopher, order-5 LM
    tail drop, exact dedup, 13-gram decontamination, DSIR top-60% — on
    the realistic corpus: monotone survival, every injected defect class
    eliminated by its stage, and a healthy share of natural docs
    surviving to packing."""
    target = _lm_target(corpus)
    lm = lm_ops.train_ngram_lm(target, order=5, vocab_size=50_000)

    gq = gopher_quality_filter(corpus).select("doc_id", "kind", "text", "quality_pass")
    ce = lm_ops.score_cross_entropy(lm, corpus).select("doc_id", "cross_entropy")
    contam = dd.decontaminate(corpus, bench_docs, n=13).select(
        "doc_id", "contaminated"
    )
    enriched = (
        gq.join(ce, "doc_id", "left").join(contam, "doc_id", "left").localCheckpoint()
    )
    s1 = F.col("quality_pass")
    keep2 = (
        lm_ops.perplexity_buckets(
            enriched.filter(s1).select("doc_id", "cross_entropy"),
            col="cross_entropy",
        )
        .filter(F.col("bucket") != "tail")
        .select("doc_id")
    )
    e2 = enriched.join(keep2.withColumn("f2", F.lit(1)), "doc_id", "left")
    s2 = s1 & F.col("f2").isNotNull()
    keep3 = dd.exact_dedup(e2.filter(s2)).select(F.col("keep_id").alias("doc_id"))
    e3 = e2.join(keep3.withColumn("f3", F.lit(1)), "doc_id", "left")
    s3 = s2 & F.col("f3").isNotNull()
    s4 = s3 & ~F.col("contaminated")
    clean = e3.filter(s4).localCheckpoint()
    k = max(1, int(0.6 * clean.count()))
    selected = imp.gumbel_topk(
        imp.dsir_log_weights(clean, target, buckets=4096), k
    ).select("doc_id")
    mixed = clean.join(selected, "doc_id", "left_semi")
    manifest = pack_sequences(mixed, max_tokens=2048)

    surv = [
        corpus.count(),
        e3.filter(s1).count(),
        e3.filter(s2).count(),
        e3.filter(s3).count(),
        e3.filter(s4).count(),
        mixed.count(),
    ]
    assert surv == sorted(surv, reverse=True), surv
    # every defect class its stage is responsible for is GONE by stage 4
    kinds4 = {
        r["kind"] for r in e3.filter(s4).select("kind").distinct().collect()
    }
    for kind in ("short", "symbols", "bullets", "numeric", "nostop",
                 "contaminated", "exact_dup"):
        assert kind not in kinds4, (kind, kinds4)
    # gibberish is gone after the LM stage (s2)
    assert not e3.filter(s2 & (F.col("kind") == "gibberish")).count()
    # the recipe is a filter, not a shredder: >= half the natural docs
    # survive to selection, and packing emits real blocks
    n_nat = corpus.filter(F.col("kind") == "natural").count()
    n_nat_surv = e3.filter(s4 & (F.col("kind") == "natural")).count()
    assert n_nat_surv / n_nat >= 0.5, (n_nat_surv, n_nat)
    assert manifest.select(F.count_distinct("block_id")).first()[0] > 0


def test_pii_scrub_recovers_injected_identifiers(corpus):
    """r8 item 5: the generator plants known counts of every PII kind
    in the 'pii' class and zeros elsewhere. Per-kind recovery must be
    EXACT per doc (the formats cover every pattern alternation), and
    every non-pii class must come back untouched — natural prose,
    numeric docs, dates and ID runs are the precision side of the
    ADVICE-r7 over-match defect."""
    from mbfbigdatarandomforest_spark.operators.pii import PII_ORDER, scrub_pii

    scrubbed = scrub_pii(corpus, "text", out_col="scrubbed")
    bad = scrubbed.filter(
        " OR ".join(f"n_{k} != want_n_{k}" for k in PII_ORDER)
    )
    assert bad.count() == 0, bad.select(
        "doc_id", "kind", *[c for k in PII_ORDER for c in (f"n_{k}", f"want_n_{k}")]
    ).limit(5).collect()
    untouched = scrubbed.filter(
        (F.col("kind") != "pii") & (F.col("pii_chars_removed") > 0)
    )
    assert untouched.count() == 0
    n_pii = scrubbed.filter(F.col("kind") == "pii").count()
    assert n_pii == int(round(SPEC.shares["pii"] * SPEC.n_docs))
