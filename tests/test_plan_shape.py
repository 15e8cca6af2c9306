"""Scale smoke (SURVEY.md §5.2.5): assert the PHYSICAL PLAN shape, not
just results — broadcast joins chosen where intended, filters pushed to
the parquet scan, no cartesian products, partial aggregation present.
A correct-but-badly-planned query is a regression at 100 TB even when
row-for-row right at sf0.01.
"""

from __future__ import annotations

import pytest

from conftest import SF_DIR_ORACLE
from mbfbigdatarandomforest_spark.plans.relational import (
    q1_pricing_summary,
    q3_top_revenue_orders,
    q5_nation_revenue,
)
from mbfbigdatarandomforest_spark.plans.election_analog import nation_status_ratio


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q1_filter_pushed_to_scan(spark):
    plan = _plan(q1_pricing_summary(spark, SF_DIR_ORACLE))
    assert "PushedFilters" in plan
    assert "LessThan(l_shipdate" in plan
    # map-side combine present
    assert "partial_" in plan


def test_q1_column_pruning(spark):
    plan = _plan(q1_pricing_summary(spark, SF_DIR_ORACLE))
    scan_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in scan_schema  # unused columns pruned
    assert "l_quantity" in scan_schema


def test_q3_broadcasts_customer_dimension(spark):
    plan = _plan(q3_top_revenue_orders(spark, SF_DIR_ORACLE))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # dim filter pushed


def test_q5_no_cartesian_and_broadcast_dims(spark):
    plan = _plan(q5_nation_revenue(spark, SF_DIR_ORACLE))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_flagship_two_shuffles_max(spark):
    """The vote-ratio skeleton: broadcast dim joins mean the only
    exchanges are the two aggregation shuffles (votes group + pivot
    group) plus the final sort — the fact table never shuffles for a
    join."""
    plan = _plan(nation_status_ratio(spark, SF_DIR_ORACLE))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_zscore_has_no_window_funnel(spark):
    """acctbal_zscore must compute μ,σ as a broadcast 1-row aggregate —
    a whole-table Window.partitionBy() funnels every row through one
    task at scale."""
    from mbfbigdatarandomforest_spark.plans.relational import acctbal_zscore

    plan = _plan(acctbal_zscore(spark, SF_DIR_ORACLE))
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row moments cross join


def test_order_window_features_no_global_window(spark):
    """Every row_number window must be partitioned (by the quantile
    bucket); the only unpartitioned windows allowed are the per-bucket
    offset cumulative sums, whose input is an aggregate of ≤ p rows."""
    from mbfbigdatarandomforest_spark.plans.relational import (
        order_window_features,
    )

    plan = _plan(order_window_features(spark, SF_DIR_ORACLE))
    for line in plan.splitlines():
        if "row_number()" in line:
            # formatted-plan window spec: windowspecdefinition(part_col,
            # order..., frame) — a global window has no partition column
            assert "windowspecdefinition(__bkt" in line, line


def test_global_row_number_matches_window(spark):
    """Distributed row number == ROW_NUMBER() OVER (ORDER BY ...) for a
    unique key, regardless of bucket boundaries."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from mbfbigdatarandomforest_spark.operators.windows import (
        global_row_number,
        ntile_from_rn,
    )

    df = spark.range(0, 10_000).select(
        (F.col("id") * 2654435761 % 1_000_003).alias("v"), "id"
    )
    got = global_row_number(df, ["v", "id"], idx_col="idx")
    want = df.withColumn(
        "idx", F.row_number().over(Window.orderBy("v", "id")).cast("long")
    )
    assert got.join(want, ["v", "id", "idx"]).count() == 10_000
    # ntile parity on an awkward n (not divisible by k)
    n = df.count()
    got_t = (
        got.withColumn("t", ntile_from_rn(F.col("idx"), F.lit(n), 7))
        .select("v", "id", "t")
    )
    want_t = df.withColumn(
        "t", F.ntile(7).over(Window.orderBy("v", "id")).cast("long")
    ).select("v", "id", "t")
    assert got_t.join(want_t, ["v", "id", "t"]).count() == 10_000


def test_bucketed_join_elides_shuffle(spark, tmp_path):
    """Fact⋈fact on the bucket key must plan WITHOUT an Exchange on
    either side — the whole point of bucketing at 100 TB."""
    from mbfbigdatarandomforest_spark.sources.bucketing import (
        colocated_join,
        write_bucketed,
    )
    from mbfbigdatarandomforest_spark.sources.catalog import load_table

    # warehouse.dir is a static conf — tables land in the session's
    # default warehouse (./spark-warehouse, gitignored) and are dropped
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try:
        li = load_table(spark, SF_DIR_ORACLE, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        orders = load_table(spark, SF_DIR_ORACLE, "orders").select(
            "o_orderkey", "o_totalprice"
        ).withColumnRenamed("o_orderkey", "l_orderkey")
        write_bucketed(li, "b_lineitem", "l_orderkey", 8)
        write_bucketed(orders, "b_orders", "l_orderkey", 8)
        joined = colocated_join(spark, "b_lineitem", "b_orders", "l_orderkey")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_partitioned_write_enables_partition_pruning(spark, tmp_path):
    """Hive-style partitioned parquet + a partition-key filter must show
    PartitionFilters in the scan (files for other partitions are never
    opened) — the table-layout half of predicate pushdown."""
    from mbfbigdatarandomforest_spark.sources.catalog import load_table
    from mbfbigdatarandomforest_spark.sources.sinks import write_parquet

    ev = load_table(spark, SF_DIR_ORACLE, "events")
    out = str(tmp_path / "events_by_type")
    write_parquet(ev, out, partition_by=["event_type"])
    back = spark.read.parquet(out).filter("event_type = 'click'")
    plan = back._sc._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters", 1)[1].split("\n")[0]
    n_click = back.count()
    assert n_click == ev.filter("event_type = 'click'").count()


def test_hourly_rollup_window_partitioned_by_event_type(spark):
    """The lag/moving-sum stage must partition its window on event_type
    (bounded per-partition rows = hours in range) — never a global
    unpartitioned window over the aggregated frame."""
    from mbfbigdatarandomforest_spark.plans.relational import (
        events_hourly_rollup,
    )

    plan = _plan(events_hourly_rollup(spark, SF_DIR_ORACLE))
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            assert "windowspecdefinition(event_type" in line, line


def test_hash_fraction_sample_is_pure_filter(spark):
    """The stateless sampler must stay a scan+filter: no Exchange, no
    Window, no join — it composes with any downstream plan for free."""
    from mbfbigdatarandomforest_spark.operators.sampling import (
        hash_fraction_sample,
    )
    from mbfbigdatarandomforest_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    plan = _plan(hash_fraction_sample(docs, 0.25, "doc_id"))
    assert "Exchange" not in plan
    assert "Window" not in plan
    assert "Join" not in plan


def test_stratified_quota_window_partitioned_by_strata(spark):
    """Quota sampling must rank inside strata only — an unpartitioned
    row_number would funnel the corpus through one task."""
    from mbfbigdatarandomforest_spark.operators.sampling import (
        stratified_quota_sample,
    )
    from mbfbigdatarandomforest_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    plan = _plan(stratified_quota_sample(docs, ["source"], 5, "doc_id"))
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            assert "windowspecdefinition(source" in line, line


def test_decontaminate_broadcasts_benchmark_grams(spark):
    """The benchmark n-gram set must be the broadcast side; the corpus
    must never shuffle for the contamination join."""
    from mbfbigdatarandomforest_spark.operators import dedup as dd
    from mbfbigdatarandomforest_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    bench = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")
    plan = _plan(dd.decontaminate(corpus, bench, n=5))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q6_all_filters_pushed_no_shuffle_data(spark):
    """The q6-style scan must push discount/quantity filters to parquet
    and aggregate to one row with only partial/final agg stages — no
    join, no sort, no window."""
    from mbfbigdatarandomforest_spark.plans.relational import (
        q6_discount_revenue,
    )

    plan = _plan(q6_discount_revenue(spark, SF_DIR_ORACLE))
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters", 1)[1].split("\n")[0]
    assert "l_discount" in pushed and "l_quantity" in pushed
    assert "partial_" in plan
    assert "Join" not in plan
    assert "Window" not in plan


def test_temperature_mixture_windows_are_bounded(spark):
    """The mixture sampler's corpus-side ranking must window inside the
    strata; the only unpartitioned window allowed is the quota share
    over the |strata|-row aggregate."""
    from mbfbigdatarandomforest_spark.operators.sampling import (
        temperature_mixture_sample,
    )
    from mbfbigdatarandomforest_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    plan = _plan(temperature_mixture_sample(docs, ["source"], 200, "doc_id"))
    specs = [
        line for line in plan.splitlines() if "windowspecdefinition(" in line
    ]
    partitioned = [s for s in specs if "windowspecdefinition(source" in s]
    # exactly one window family ranks per-source; anything else must be
    # the quota aggregate (input bounded by stratum count, not corpus)
    assert partitioned, "per-source ranking window missing"
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_new_curation_ops_plan_shape(spark):
    """Round-5 curation operators: no cartesian products anywhere, and
    the only un-partitioned window in the packing plan is the per-bucket
    offsets frame (≤ num_buckets rows), never the corpus itself."""
    from mbfbigdatarandomforest_spark.operators.dedup import (
        line_dedup,
        span_dedup,
    )
    from mbfbigdatarandomforest_spark.operators.text import (
        gopher_quality_filter,
        pack_sequences,
    )
    from mbfbigdatarandomforest_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    for df in (
        span_dedup(docs, n=8),
        line_dedup(docs),
        pack_sequences(docs, 512),
        gopher_quality_filter(docs),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan
    # gopher is a pure projection: single scan, zero exchanges
    gplan = _plan(gopher_quality_filter(docs))
    assert "Exchange" not in gplan


def test_second_wave_ops_plan_shape(spark):
    """Round-5 second wave: LM scoring and DSIR scoring broadcast their
    bounded model artifacts (never shuffle the corpus against them),
    BPE joins the encoded vocab back by broadcast, and nothing plans a
    cartesian product."""
    from pyspark.sql import functions as F

    from mbfbigdatarandomforest_spark.operators import bpe
    from mbfbigdatarandomforest_spark.operators import importance as imp
    from mbfbigdatarandomforest_spark.operators import ngram_lm as lm_ops
    from mbfbigdatarandomforest_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    lm = lm_ops.train_bigram_lm(docs.filter(F.col("lang") == "en"))
    lm_plan = _plan(lm_ops.score_cross_entropy(lm, docs))
    assert "CartesianProduct" not in lm_plan
    assert "BroadcastHashJoin" in lm_plan  # LM + vocab ride broadcasts

    w_plan = _plan(imp.dsir_log_weights(docs, docs.filter(F.col("lang") == "en")))
    assert "CartesianProduct" not in w_plan
    assert "BroadcastHashJoin" in w_plan  # λ table broadcasts

    merges = bpe.learn_bpe(
        [(r["word"], r["c"]) for r in bpe.word_counts(docs).collect()], 50
    )
    b_plan = _plan(bpe.bpe_token_counts(docs, merges))
    assert "CartesianProduct" not in b_plan
    assert "BroadcastHashJoin" in b_plan  # encoded vocab broadcasts


def test_ols_hash_split_is_single_stage_aggregate(spark):
    """The OLS grouped-Gramian path with the hash split must contain no
    sort and no cache/union double-read — its heavy lineage is
    scan → project(md5 tag) → partial agg → exchange → final agg."""
    from mbfbigdatarandomforest_spark.ml.splits import tag_split
    from mbfbigdatarandomforest_spark.plans.ml_queries import _lineitem_features
    from pyspark.sql import functions as F

    cols = [
        "label", "p_brand", "p_type",
        "l_quantity", "l_discount", "l_tax", "p_retailprice",
    ]
    data = _lineitem_features(spark, SF_DIR_ORACLE).na.drop(subset=cols)
    tagged = tag_split(data, cols, 0.75)
    agg = tagged.groupBy("p_brand", "p_type", "__split").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = _plan(agg)
    assert "Sort" not in plan
    assert "Union" not in plan
    # exactly ONE data shuffle (the aggregate exchange); the only other
    # exchange is the part-dimension broadcast
    assert plan.count("ENSURE_REQUIREMENTS") == 1


def test_backoff_and_classifier_plan_shape(spark):
    """Stupid-backoff scoring broadcasts every count table (the corpus
    never shuffles against the model) and the Pareto keep rule is a
    pure filter over the scored frame — no extra exchange."""
    from pyspark.sql import functions as F

    from mbfbigdatarandomforest_spark.operators import ngram_lm as lm_ops
    from mbfbigdatarandomforest_spark.operators import quality_classifier as qc
    from mbfbigdatarandomforest_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    lm = lm_ops.train_backoff_lm(docs.filter(F.col("lang") == "en"), order=3)
    plan = _plan(lm_ops.score_stupid_backoff(lm, docs))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 6  # counts+contexts × 3 orders

    scored = spark.createDataFrame(
        [(1, 0.9), (2, 0.1)], "doc_id long, quality_prob double"
    )
    kplan = _plan(qc.pareto_keep(scored, alpha=3.0))
    assert "Exchange" not in kplan and "Filter" in kplan


def test_pagerank_edge_derivation_prunes_scan(spark):
    """r11: the link-graph edge derivation reads ONLY doc_id from the
    documents scan (the synth-URL expression needs nothing else), and
    the real-HTML path (page_link_edges) is one Generate (the href
    explode) + one Exchange (the weight groupBy) with no cartesian /
    broadcast-nested-loop anywhere."""
    import pyspark.sql.functions as F

    from mbfbigdatarandomforest_spark.operators.linkgraph import (
        page_link_edges,
    )
    from mbfbigdatarandomforest_spark.operators.urls import (
        url_registered_domain,
    )
    from mbfbigdatarandomforest_spark.plans.llm_ops import synth_url_col

    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    edges = docs.select(
        url_registered_domain(synth_url_col()).alias("src"),
        url_registered_domain(synth_url_col(F.col("doc_id") + 1)).alias("dst"),
    )
    plan = _plan(edges)
    assert "struct<doc_id:bigint>" in plan  # column pruning reached the scan

    pages = spark.createDataFrame(
        [("https://a.example/x", '<a href="https://b.example/y">l</a>')],
        "url string, html string",
    )
    # node counts on the plain plan tree (formatted explain prints
    # every node twice: once in the tree, once in the detail section)
    p2 = page_link_edges(pages)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p2
    assert "BroadcastNestedLoop" not in p2
    assert p2.count("Generate") == 1
    assert p2.count("Exchange") <= 2  # groupBy (+ AQE read), nothing else


def test_r13_incremental_index_and_recrawl_plan_shape(spark, tmp_path):
    """r13 operators: the index-path gate and the recrawl candidates
    never plan a CartesianProduct or BroadcastNestedLoopJoin — every
    join keys on url/fingerprint/(band,bucket)/id; the recrawl TTL
    override joins on domain."""
    from pyspark.sql import functions as F

    from mbfbigdatarandomforest_spark.operators import dedup as dd
    from mbfbigdatarandomforest_spark.plans.llm_ops import (
        recrawl_candidates,
    )
    from mbfbigdatarandomforest_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR_ORACLE, "documents").select(
        "doc_id", "text"
    )
    idx = str(tmp_path / "idx")
    dd.build_dedup_index(docs.filter(F.col("doc_id") % 2 == 0), idx)
    gated = dd.incremental_dedup(
        docs.filter(F.col("doc_id") % 2 == 1),
        index=idx,
        threshold=0.7,
        dedup_within_new=False,
    )
    plan = _plan(gated)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    ledger = spark.createDataFrame(
        [("https://a.example/x", "2024-01-01 00:00:00")],
        "url string, scheduled_at string",
    )
    sitemaps = spark.createDataFrame(
        [("https://a.example/x", "2024-02-01")], "loc string, lastmod string"
    )
    ttl = spark.createDataFrame(
        [("a.example", 5.0)], "domain string, ttl_days double"
    )
    rplan = _plan(
        recrawl_candidates(
            ledger, sitemaps, as_of="2024-03-01 00:00:00", domain_ttl=ttl
        )
    )
    assert "CartesianProduct" not in rplan
    assert "BroadcastNestedLoopJoin" not in rplan
