"""PageRank oracle tests (operators/linkgraph.py, wired r11).

Layers: (1) a pure-numpy power-iteration oracle implementing the SAME
formulation (uniform init, damping, dangling redistribution, L1 stop)
— Spark must match it to summation-order noise (1e-9) on crafted and
seeded-random graphs; (2) closed-form cases (2-cycle = exactly 0.5
each, complete graph = uniform); (3) input hygiene — self-loops
dropped, parallel edges count once; (4) the empty string-keyed graph
returns a string-typed node column (ADVICE r10); (5) the checkpoint
discipline — live checkpointed RDDs above baseline stay ≤2 at every
round (the CC posture, SCALE.md §15); (6) the registered
``url_pagerank_stats`` query against the identical edge list rebuilt
in DuckDB and ranked by the numpy oracle.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from mbfbigdatarandomforest_spark.operators.linkgraph import pagerank
from mbfbigdatarandomforest_spark.registry import load_all

from conftest import SF_DIR_ORACLE


def numpy_pagerank(edges, damping=0.85, max_iter=25, tol=1e-6, teleport=None):
    """Reference power iteration — the module docstring's formulation,
    executed densely in float64. ``edges`` is [(src, dst)] (parallel
    edges count once) or [(src, dst, w)] (parallel edges sum);
    ``teleport`` an optional {node: seed} dict (normalized over graph
    nodes). Returns {node: rank}."""
    if edges and len(edges[0]) == 3:
        acc: Counter = Counter()
        for s, t, w in edges:
            if s != t and w > 0:
                acc[(s, t)] += float(w)
        e = sorted((s, t, w) for (s, t), w in acc.items())
    else:
        e = sorted({(s, t, 1.0) for s, t in edges if s != t})
    nodes = sorted({s for s, _, _ in e} | {t for _, t, _ in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    if n == 0:
        return {}
    out_w = Counter()
    for s, _, w in e:
        out_w[s] += w
    deg = np.array([out_w.get(v, 0.0) for v in nodes], dtype=np.float64)
    src = np.array([idx[s] for s, _, _ in e], dtype=np.int64)
    dst = np.array([idx[t] for _, t, _ in e], dtype=np.int64)
    ew = np.array([w for _, _, w in e], dtype=np.float64)
    if teleport is None:
        t_vec = np.full(n, 1.0 / n)
    else:
        t_vec = np.array(
            [float(teleport.get(v, 0.0)) for v in nodes], dtype=np.float64
        )
        t_vec = t_vec / t_vec.sum()
    d = float(damping)
    share_deg = np.where(deg > 0, deg, 1.0)
    r = t_vec.copy()
    for _ in range(max_iter):
        dangling = float(r[deg == 0].sum())
        nxt = t_vec * ((1.0 - d) + d * dangling)
        np.add.at(nxt, dst, d * ew * r[src] / share_deg[src])
        delta = float(np.abs(nxt - r).sum())
        r = nxt
        if delta <= tol:
            break
    return {v: float(r[idx[v]]) for v in nodes}


def _spark_ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


def _close(got: dict, want: dict, tol=1e-9):
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) <= tol, (k, got[k], want[k])


def test_two_cycle_closed_form(spark):
    """a<->b is symmetric: exactly 0.5 each, any damping."""
    got = _spark_ranks(spark, [(1, 2), (2, 1)])
    _close(got, {1: 0.5, 2: 0.5}, tol=1e-12)


def test_complete_graph_uniform(spark):
    """K4: symmetry forces uniform 0.25 from the uniform start."""
    edges = [(a, b) for a in range(4) for b in range(4) if a != b]
    got = _spark_ranks(spark, edges)
    _close(got, {v: 0.25 for v in range(4)}, tol=1e-12)


def test_star_with_dangling_center_vs_numpy(spark):
    """4 leaves -> center; the center has no out-links (dangling mass
    redistribution path). Center must dominate; mass conserved."""
    edges = [(i, 99) for i in range(1, 5)]
    got = _spark_ranks(spark, edges)
    _close(got, numpy_pagerank(edges))
    assert got[99] == max(got.values())
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_chain_vs_numpy(spark):
    edges = [(i, i + 1) for i in range(6)]
    got = _spark_ranks(spark, edges)
    _close(got, numpy_pagerank(edges))
    # rank must be non-decreasing down a chain that ends dangling
    order = [got[i] for i in range(7)]
    assert order == sorted(order)


def test_self_loops_and_parallel_edges_ignored(spark):
    messy = [(1, 2), (1, 2), (2, 1), (1, 1), (2, 2), (2, 1)]
    got = _spark_ranks(spark, messy)
    _close(got, {1: 0.5, 2: 0.5}, tol=1e-12)


def test_empty_string_keyed_graph_schema(spark):
    """ADVICE r10: a string-keyed edge frame with no surviving edges
    must return a STRING node column, not the old hardcoded long."""
    df = spark.createDataFrame(
        [("a.example", "a.example")], "src string, dst string"
    )  # only a self-loop -> empty after hygiene
    out = pagerank(df)
    assert out.count() == 0
    assert dict(out.dtypes) == {"node": "string", "rank": "double"}


def test_seeded_random_graph_vs_numpy(spark):
    rng = np.random.default_rng(1311)
    n = 60
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, n, size=(400, 2))
    ]
    kw = dict(damping=0.85, max_iter=30, tol=1e-10)
    got = _spark_ranks(spark, edges, **kw)
    _close(got, numpy_pagerank(edges, **kw))
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_stats_hook_and_checkpoint_discipline(spark):
    """The probe hook: rounds counted, L1 deltas shrink to tol, and the
    persistence map never holds more than 2 checkpoint RDDs above
    baseline (prior round freed deterministically — the r10 CC fix)."""
    rng = np.random.default_rng(7)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 40, size=(200, 2))]
    df = spark.createDataFrame(edges, "src long, dst long")
    stats: dict = {}
    pagerank(df, max_iter=40, tol=1e-8, stats=stats).collect()
    assert stats["rounds"] >= 2
    assert stats["l1_deltas"][-1] <= 1e-8 or stats["rounds"] == 40
    assert stats["l1_deltas"][0] > stats["l1_deltas"][-1]
    assert max(stats["live_ckpt_rdds"]) <= 2, stats["live_ckpt_rdds"]


def test_weighted_pagerank_vs_numpy(spark):
    """r11: edge weights — contribution splits ∝ weight, parallel
    (src, dst) rows sum. A 10:1 weighted fork must route ~10x the
    mass of the light edge; integer-replicated unweighted edges must
    equal the weighted formulation exactly (the semantics link)."""
    w_edges = [(0, 1, 10.0), (0, 2, 1.0), (1, 0, 1.0), (2, 0, 1.0),
               (0, 1, 0.0)]  # zero-weight row must be dropped
    df = spark.createDataFrame(w_edges, "src long, dst long, w double")
    kw = dict(max_iter=30, tol=1e-12)
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, weight="w", **kw).collect()
    }
    _close(got, numpy_pagerank(w_edges, **kw))
    # nodes 1 and 2 receive mass ONLY from node 0's weighted fork, so
    # their excess over the uniform teleport floor is exactly 10:1
    floor = 0.15 / 3
    assert abs((got[1] - floor) / (got[2] - floor) - 10.0) < 1e-6
    # replicate edge (0,1) ten times unweighted-with-weights ≡ weighted
    rep = [(0, 1, 1.0)] * 10 + [(0, 2, 1.0), (1, 0, 1.0), (2, 0, 1.0)]
    rep_df = spark.createDataFrame(rep, "src long, dst long, w double")
    got_rep = {
        r["node"]: r["rank"]
        for r in pagerank(rep_df, weight="w", **kw).collect()
    }
    _close(got_rep, got, tol=1e-12)


def test_personalized_pagerank_trustrank_vs_numpy(spark):
    """r11: teleport frame — the TrustRank shape. Random jumps and
    dangling mass land ONLY on seed nodes; a node unreachable from the
    seed set (no in-links, zero seed) ends with rank exactly 0."""
    edges = [(1, 2), (2, 3), (3, 1), (9, 1)]  # 9: unreachable, dangling-free graph otherwise
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = {1: 3.0, 2: 1.0}
    tp = spark.createDataFrame(list(seeds.items()), "node long, seed double")
    kw = dict(max_iter=40, tol=1e-12)
    got = {
        r["node"]: r["rank"] for r in pagerank(df, teleport=tp, **kw).collect()
    }
    _close(got, numpy_pagerank(edges, teleport=seeds, **kw))
    assert got[9] == 0.0  # no seed, no in-links: never receives mass
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # seed mass on no graph node is a caller error, not a silent 0-div
    bad = spark.createDataFrame([(404, 1.0)], "node long, seed double")
    with pytest.raises(ValueError, match="no positive seed mass"):
        pagerank(df, teleport=bad)


def test_pagerank_multi_equals_sequential_calls(spark):
    """r12: pagerank_multi — one shared power-iteration loop per graph
    computing k named teleport columns. Each column must equal its
    sequential pagerank(teleport=..., tol=0) twin to float-noise on a
    random WEIGHTED graph WITH dangling nodes and a zero-seed dangling
    node (the hard personalization case), and the numpy oracle must
    agree at 1e-9."""
    from mbfbigdatarandomforest_spark.operators.linkgraph import (
        pagerank_multi,
    )

    rng = np.random.default_rng(1207)
    n = 30
    w_edges = [
        (int(a), int(b), float(w))
        for (a, b), w in zip(
            rng.integers(0, n, size=(150, 2)),
            rng.integers(1, 5, size=150),
        )
    ]
    # make node 777 dangling (receives, never sends) and unseeded
    w_edges += [(0, 777, 2.0), (1, 777, 1.0)]
    df = spark.createDataFrame(w_edges, "src long, dst long, w double")
    seeds = {0: 2.0, 5: 1.0}
    tp = spark.createDataFrame(list(seeds.items()), "node long, seed double")
    kw = dict(weight="w", max_iter=20)
    stats: dict = {}
    multi = {
        r["node"]: (r["rank"], r["trust"])
        for r in pagerank_multi(
            df, {"rank": None, "trust": tp}, stats=stats, **kw
        ).collect()
    }
    single_u = {
        r["node"]: r["rank"] for r in pagerank(df, tol=0.0, **kw).collect()
    }
    single_t = {
        r["node"]: r["rank"]
        for r in pagerank(df, teleport=tp, tol=0.0, **kw).collect()
    }
    assert set(multi) == set(single_u) == set(single_t)
    for v in multi:
        assert abs(multi[v][0] - single_u[v]) <= 1e-12, ("uniform", v)
        assert abs(multi[v][1] - single_t[v]) <= 1e-12, ("trust", v)
    _close(
        {v: multi[v][0] for v in multi},
        numpy_pagerank(w_edges, max_iter=20, tol=0.0),
    )
    _close(
        {v: multi[v][1] for v in multi},
        numpy_pagerank(w_edges, max_iter=20, tol=0.0, teleport=seeds),
    )
    # both columns conserve mass through the shared dangling aggregate
    assert abs(sum(r for r, _ in multi.values()) - 1.0) < 1e-9
    assert abs(sum(t for _, t in multi.values()) - 1.0) < 1e-9
    # the checkpoint discipline holds for the fused loop too
    assert stats["rounds"] == 20
    assert max(stats["live_ckpt_rdds"]) <= 2, stats["live_ckpt_rdds"]
    # a named teleport with no graph mass still fails loudly
    bad = spark.createDataFrame([(40404, 1.0)], "node long, seed double")
    with pytest.raises(ValueError, match="'b'.*no positive seed mass"):
        pagerank_multi(df, {"a": None, "b": bad}, **kw)
    # ADVICE r12: reserved / non-identifier teleport names are rejected
    # up front (they would collide with internal columns or break
    # F.col parsing deep inside the loop)
    for reserved in ("node", "out_w", "src", "dst", "w"):
        with pytest.raises(ValueError, match="collides with an internal"):
            pagerank_multi(df, {reserved: None}, **kw)
    for malformed in ("a.b", "a`b", "a b", "", "1abc"):
        with pytest.raises(ValueError, match="must be an identifier"):
            pagerank_multi(df, {malformed: None}, **kw)


def test_personalized_fixed_iter_dangling_zero_seed_vs_numpy(spark):
    """ADVICE r11 (medium): fixed-iteration mode (tol<=0, no stats)
    with a personalized teleport and a DANGLING node of zero seed mass.
    The dangling node starts at rank 0, so mass-based dangling
    detection saw dangling_mass==0 at round 0 and skipped the
    redistribution aggregate forever — mass flowing into the dangling
    node via links leaked (sum < 1) and ranks diverged from exact
    personalized PageRank. Detection is now structural (out_w == 0)."""
    # 3 is dangling (no out-links) and unseeded; it RECEIVES mass from
    # 1 every round, which must re-enter through the teleport vector
    edges = [(1, 2), (2, 1), (1, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = {1: 1.0}
    tp = spark.createDataFrame(list(seeds.items()), "node long, seed double")
    kw = dict(max_iter=30, tol=0.0)
    got = {
        r["node"]: r["rank"] for r in pagerank(df, teleport=tp, **kw).collect()
    }
    _close(got, numpy_pagerank(edges, teleport=seeds, **kw))
    assert abs(sum(got.values()) - 1.0) < 1e-9  # no leaked mass
    assert got[3] > 0.0  # link-fed despite zero seed


def test_url_pagerank_stats_vs_duckdb_numpy_twin(spark, duck):
    """The registered query (rows-only: iterative driver loop, not
    single-statement SQL) against the full cross-engine twin: DuckDB
    rebuilds the identical (src, dst) domain edge list from the synth
    fixture — doc_id re-aliased to doc_id+1 for the dst endpoint — and
    the numpy oracle ranks it with the query's fixed 20 iterations."""
    from mbfbigdatarandomforest_spark.operators.urls import url_twin_sql
    from mbfbigdatarandomforest_spark.plans.llm_ops import (
        PAGERANK_DAMPING,
        PAGERANK_ITERS,
        SYNTH_URL_SQL,
    )

    spec = load_all()["url_pagerank_stats"]
    assert spec.oracle is None  # rows-only by design
    got = spec.fn(spark, SF_DIR_ORACLE).toPandas()

    rd = url_twin_sql("url")["registered_domain"]
    edges = duck.sql(f"""
        WITH s AS (
          SELECT doc_id, {rd} AS dom
          FROM (SELECT doc_id, {SYNTH_URL_SQL} AS url FROM documents)
        ),
        t AS (
          SELECT orig_id, {rd} AS dom FROM (
            SELECT orig_id, {SYNTH_URL_SQL} AS url FROM (
              SELECT doc_id AS orig_id, doc_id + 1 AS doc_id FROM documents
            )
          )
        )
        SELECT s.dom AS src, t.dom AS dst
        FROM s JOIN t ON s.doc_id = t.orig_id
    """).fetchall()
    want = numpy_pagerank(
        edges, damping=PAGERANK_DAMPING, max_iter=PAGERANK_ITERS, tol=0.0
    )
    got_ranks = dict(zip(got["domain"], got["rank"]))
    assert set(got_ranks) == set(want)
    for dom_name, rank in want.items():
        assert abs(got_ranks[dom_name] - round(rank, 9)) <= 1e-9, dom_name
    # degree columns against the same edge list, counted in Python
    dedges = {(s, t) for s, t in edges if s != t}
    outd = Counter(s for s, _ in dedges)
    ind = Counter(t for _, t in dedges)
    for _, row in got.iterrows():
        assert row["n_out_domains"] == outd.get(row["domain"], 0)
        assert row["n_in_domains"] == ind.get(row["domain"], 0)
    # ordered by authority, descending
    ranks = got["rank"].tolist()
    assert ranks == sorted(ranks, reverse=True)


def test_html_links_extraction_and_duckdb_twin(spark, duck):
    """r11: anchor-href extraction — double/single/un-quoted, case-
    insensitive tag/attr, non-anchor tags ignored — and the same
    pattern text extracting the same lists in DuckDB."""
    from mbfbigdatarandomforest_spark.operators.text import (
        html_links,
        html_links_twin_sql,
    )

    cases = [
        (0, '<a href="https://a.example/x">x</a>', ["https://a.example/x"]),
        (1, "<A HREF='//cdn.example/y'>y</A> <a href=/z>z</a>",
         ["//cdn.example/y", "/z"]),
        (2, '<p>no links</p><img src="https://img.example/i.png">', []),
        (3, '<a class="b" href="/p?q=1#f">p</a><a href="mailto:x@example.org">m</a>',
         ["/p?q=1#f", "mailto:x@example.org"]),
        (4, '<a href="https://one.example/1"><a href="https://two.example/2">',
         ["https://one.example/1", "https://two.example/2"]),
        # r12 (ADVICE r11): a PREFIXED attribute (data-href) must not
        # shadow the real href — the boundary class rejects it
        (5, '<a data-href="https://wrong.example/x" href="https://right.example/y">p</a>',
         ["https://right.example/y"]),
        # r13: the two formerly-documented limits, closed — quoted
        # hrefs keep their SPACES; '>' inside an earlier quoted
        # attribute value no longer ends the tag scan
        (6, '<a href="https://a.example/x y z">s</a>',
         ["https://a.example/x y z"]),
        (7, '<a title="a>b" href="https://a.example/q">t</a>',
         ["https://a.example/q"]),
        (8, "<a title='a>b' href='/single space'>t</a>", ["/single space"]),
        # r13: empty/whitespace hrefs (self-references) drop; quoted
        # leading/trailing whitespace trims (browser behavior)
        (9, '<a href="">e</a><a href="  ">w</a><a href=" /ok ">k</a>',
         ["/ok"]),
        # r13 documented limit: an UNBALANCED quote before href loses
        # that one anchor (browsers see no href attribute either);
        # later anchors unaffected
        (10, '<a foo="bar href="/lost">x</a><a href="/found">y</a>',
         ["/found"]),
        # r14 (ADVICE r13): an attribute's quoted value jammed directly
        # against href (a parse error whose attribute HTML5 tokenizers
        # keep) now anchors the boundary — single and double quoted
        (11, '<a id=\'z\'href="/jammed">j</a>', ["/jammed"]),
        (12, '<a title="t"href=\'/jammed2\'>j</a>', ["/jammed2"]),
        # ...while a prefixed data-href jammed after a quote still
        # cannot shadow the real attribute
        (13, '<a id="z"data-href="/wrong" href="/right">p</a>',
         ["/right"]),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h, _ in cases], "i long, html string"
    )
    got = {
        r["i"]: r["links"]
        for r in df.select("i", html_links("html").alias("links")).collect()
    }
    for i, _, want in cases:
        assert got[i] == want, (i, got[i])
    duck.execute("CREATE OR REPLACE TABLE __pages(i BIGINT, html VARCHAR)")
    duck.executemany(
        "INSERT INTO __pages VALUES (?, ?)", [(i, h) for i, h, _ in cases]
    )
    twin = {
        i: links
        for i, links in duck.sql(
            f"SELECT i, {html_links_twin_sql('html')} FROM __pages"
        ).fetchall()
    }
    assert twin == got


def test_html_anchor_texts_pairs_and_cleanup(spark):
    """r12: (href, anchor text) pairs — position-aligned double
    extract_all over ONE pattern; bodies are tag-stripped,
    entity-lite-decoded and whitespace-normalized; unclosed anchors
    drop (href extractor still sees them — documented limit); a
    prefixed data-href can't shadow the real attribute."""
    from mbfbigdatarandomforest_spark.operators.text import (
        html_anchor_texts,
    )

    cases = [
        (0, '<a href="https://a.example/x">read <b>this</b> now</a>',
         [("https://a.example/x", "read this now")]),
        (1, "<A HREF='/y'>Tom &amp; Jerry</A><a href=/z>z  \n text</a>",
         [("/y", "Tom & Jerry"), ("/z", "z text")]),
        (2, '<a href="https://u.example/1">one</a><p>x</p>'
            '<a href="https://u.example/2"><img src="i.png"> two</a>',
         [("https://u.example/1", "one"), ("https://u.example/2", "two")]),
        # unclosed anchor: no </a> → dropped from the TEXT signal
        (3, '<a href="https://open.example/never">dangling', []),
        (4, '<a data-href="https://wrong.example/x" '
            'href="https://right.example/y">ok</a>',
         [("https://right.example/y", "ok")]),
        (5, "<p>no anchors at all</p>", []),
        # r13: quote-aware value + tag-rest scan — spaces in quoted
        # hrefs kept, '>' inside quoted attribute values (before OR
        # after href) doesn't end the tag; empty-href pairs drop
        # AFTER the zip so alignment never shifts
        (6, '<a href="/a b" title="x>y">body</a>', [("/a b", "body")]),
        (7, '<a title="p>q" href="/c d">t2</a>', [("/c d", "t2")]),
        (8, '<a href="">e</a><a href="/k">k</a>', [("/k", "k")]),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h, _ in cases], "i long, html string"
    )
    got = {
        r["i"]: [(p["href"], p["text"]) for p in r["pairs"]]
        for r in df.select(
            "i", html_anchor_texts("html").alias("pairs")
        ).collect()
    }
    for i, _, want in cases:
        assert got[i] == want, (i, got[i])


def test_anchor_text_stats_vs_python_twin(spark, duck):
    """The registered anchor-text rollup (rows-only) against a full
    Python twin: DuckDB rebuilds the synth pages and re-extracts with
    the SAME pattern text; Python mirrors the cleanup chain and the
    per-target-domain aggregation exactly."""
    import re as _re

    from mbfbigdatarandomforest_spark.operators.text import (
        HTML_ANCHOR_PATTERN,
    )
    from mbfbigdatarandomforest_spark.operators.urls import url_twin_sql
    from mbfbigdatarandomforest_spark.plans.llm_ops import SYNTH_URL_SQL

    spec = load_all()["anchor_text_stats"]
    assert spec.oracle is None
    got = {
        r["target_domain"]: (
            r["n_anchors"], r["n_distinct_texts"], r["min_text"],
            r["max_text"],
        )
        for _, r in spec.fn(spark, SF_DIR_ORACLE).toPandas().iterrows()
    }
    # rebuild the two per-doc anchor targets the way the suite twin
    # does (doc_id re-aliased in a subquery), assemble the SAME page
    # template in Python, then extract in DuckDB with the SAME pattern
    def urls_of(shift_sql):
        return dict(
            duck.sql(f"""
                SELECT orig_id, {SYNTH_URL_SQL} AS url FROM (
                  SELECT doc_id AS orig_id, {shift_sql} AS doc_id
                  FROM (SELECT doc_id FROM documents)
                )
            """).fetchall()
        )

    ids = [r[0] for r in duck.sql("SELECT doc_id FROM documents").fetchall()]
    u1, u2 = urls_of("doc_id + 1"), urls_of("doc_id * 2 + 1")
    pages = [
        (
            int(i),
            f'<html><body><a href="{u1[i]}">read &amp; <b>cite</b> doc '
            f"{i % 7}</a><p>body</p><a href='{u2[i]}'>topic  {i % 3}\n"
            "</a></body></html>",
        )
        for i in ids
    ]
    duck.execute(
        "CREATE OR REPLACE TABLE __anchor_pages(i BIGINT, html VARCHAR)"
    )
    duck.executemany("INSERT INTO __anchor_pages VALUES (?, ?)", pages)
    pat = HTML_ANCHOR_PATTERN.replace("'", "''")
    rows = duck.sql(f"""
        SELECT regexp_extract_all(html, '{pat}', 1),
               regexp_extract_all(html, '{pat}', 2)
        FROM __anchor_pages
    """).fetchall()
    rd_sql = url_twin_sql("url")["registered_domain"]

    # r13: captured values include their quotes — mirror the
    # _strip_href_quotes unwrap (drop quotes, trim)
    def unq(v: str) -> str:
        return (v[1:-1] if v[:1] in ('"', "'") else v).strip()

    rows = [([unq(h) for h in hrefs], bodies) for hrefs, bodies in rows]
    all_hrefs = sorted({h for hrefs, _ in rows for h in hrefs})
    duck.execute("CREATE OR REPLACE TABLE __anchor_hrefs(url VARCHAR)")
    duck.executemany(
        "INSERT INTO __anchor_hrefs VALUES (?)", [(h,) for h in all_hrefs]
    )
    dom_of = dict(
        duck.sql(f"SELECT url, {rd_sql} FROM __anchor_hrefs").fetchall()
    )

    def clean(body: str) -> str:
        s = _re.sub(r"(?s)<[^>]*>", " ", body)
        s = s.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
        return _re.sub(r"\s+", " ", s).strip()

    from collections import defaultdict

    per_dom: dict = defaultdict(list)
    for hrefs, bodies in rows:
        for h, b in zip(hrefs, bodies):
            d = dom_of[h]
            if d:
                per_dom[d].append(clean(b))
    want = {
        d: (len(ts), len(set(ts)), min(ts), max(ts))
        for d, ts in per_dom.items()
    }
    assert got == want
    assert len(got) > 1  # several target domains really appear


def test_resolve_link_subset(spark):
    from mbfbigdatarandomforest_spark.operators.text import resolve_link

    page = "https://News.Example.co.uk:443/dir/page.html"
    cases = [
        ("http://other.example.org/a", "http://other.example.org/a"),
        ("HTTPS://UP.example.net/b", "HTTPS://UP.example.net/b"),
        ("//cdn.example.com/lib.js", "https://cdn.example.com/lib.js"),
        ("/root/path?x=1", "https://news.example.co.uk/root/path?x=1"),
        ("relative/path.html", None),  # domain self-loop — dropped
        ("mailto:a@example.org", None),
        ("javascript:void(0)", None),
        ("#section", None),
    ]
    df = spark.createDataFrame(
        [(u, l) for (l, _), u in zip(cases, [page] * len(cases))],
        "url string, link string",
    )
    got = [
        r["out"]
        for r in df.select(resolve_link("url", "link").alias("out")).collect()
    ]
    assert got == [want for _, want in cases]


def test_warc_to_pagerank_composition(spark, tmp_path):
    """r11 capstone: the REAL crawl derivation end-to-end — WARC dump →
    HTML pages → anchor extraction → absolutization → weighted domain
    edges → weighted PageRank — against the numpy oracle on the
    hand-computable edge list. hub.example links out twice to each of
    two domains (weight 2), they link back once each; intra-domain
    links vanish as self-loops."""
    from mbfbigdatarandomforest_spark.operators.linkgraph import (
        page_link_edges,
        pagerank,
    )
    from mbfbigdatarandomforest_spark.sources.warc import (
        encode_warc,
        read_warc,
    )
    from pyspark.sql import functions as F

    def page(url, *hrefs):
        body = "".join(f'<a href="{h}">l</a>' for h in hrefs)
        return {"url": url, "status": 200,
                "body": f"<html><body>{body}</body></html>"}

    dump = tmp_path / "dump"
    dump.mkdir()
    (dump / "s0.warc").write_bytes(
        encode_warc(
            [
                page(
                    "https://www.hub.example/index",
                    "https://a.one.example/x", "//b.one.example/y",
                    "https://two.example/z", "/self/absolute",  # self-loop
                    "https://two.example/w", "relative/dropped",
                ),
                page("https://one.example/back", "https://hub.example/h"),
                page("https://two.example/back", "/local", "https://hub.example/h"),
            ]
        )
    )
    recs = read_warc(spark, str(dump))
    pages = recs.select("url", F.decode("body", "UTF-8").alias("html"))
    edges = page_link_edges(pages)
    got_edges = {
        (r["src"], r["dst"]): r["n_links"] for r in edges.collect()
    }
    want_edges = {
        ("hub.example", "one.example"): 2,
        ("hub.example", "two.example"): 2,
        ("hub.example", "hub.example"): 1,   # /self/absolute
        ("one.example", "hub.example"): 1,
        ("two.example", "two.example"): 1,   # /local
        ("two.example", "hub.example"): 1,
    }
    assert got_edges == want_edges
    kw = dict(max_iter=30, tol=1e-12)
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges, weight="n_links", **kw).collect()
    }
    want = numpy_pagerank(
        [(s, d, w) for (s, d), w in got_edges.items()], **kw
    )
    _close(got, want)
    assert got["hub.example"] == max(got.values())  # both domains link back


def numpy_hits(edges, max_iter=20, tol=0.0):
    """Reference HITS — classic sequential update (a' = Aᵀh then
    h' = A·a'), L2 normalization each half, init h = 1 (scale divides
    out on the first normalization). ``edges`` is [(src, dst)]
    (parallel once) or [(src, dst, w)] (parallel sum, w-scaled mass).
    Returns {node: (hub, authority)}."""
    if edges and len(edges[0]) == 3:
        acc: Counter = Counter()
        for s, t, w in edges:
            if s != t and w > 0:
                acc[(s, t)] += float(w)
        e = sorted((s, t, w) for (s, t), w in acc.items())
    else:
        e = sorted({(s, t, 1.0) for s, t in edges if s != t})
    nodes = sorted({s for s, _, _ in e} | {t for _, t, _ in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    if n == 0:
        return {}
    src = np.array([idx[s] for s, _, _ in e], dtype=np.int64)
    dst = np.array([idx[t] for _, t, _ in e], dtype=np.int64)
    ew = np.array([w for _, _, w in e], dtype=np.float64)
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(max_iter):
        a_un = np.zeros(n)
        np.add.at(a_un, dst, ew * h[src])
        a = a_un / np.sqrt((a_un * a_un).sum())
        h_un = np.zeros(n)
        np.add.at(h_un, src, ew * a[dst])
        h_new = h_un / np.sqrt((h_un * h_un).sum())
        delta = float(np.abs(h_new - h).sum())
        h = h_new
        if tol > 0 and delta <= tol:
            break
    return {v: (float(h[idx[v]]), float(a[idx[v]])) for v in nodes}


def _spark_hits(spark, edges, **kw):
    from mbfbigdatarandomforest_spark.operators.linkgraph import hits

    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: (r["hub"], r["authority"]) for r in hits(df, **kw).collect()
    }


def test_hits_bipartite_star_closed_form(spark):
    """3 hubs all pointing at one authority: authority = 1 exactly,
    hubs = 1/sqrt(3) each, center hub = 0 (points at nothing)."""
    edges = [(1, 9), (2, 9), (3, 9)]
    got = _spark_hits(spark, edges, max_iter=5)
    for v in (1, 2, 3):
        assert abs(got[v][0] - 1 / np.sqrt(3)) < 1e-12
        assert got[v][1] == 0.0
    assert abs(got[9][1] - 1.0) < 1e-12
    assert got[9][0] == 0.0


def test_hits_two_cycle_symmetric(spark):
    got = _spark_hits(spark, [(1, 2), (2, 1)], max_iter=8)
    inv = 1 / np.sqrt(2)
    for v in (1, 2):
        assert abs(got[v][0] - inv) < 1e-12
        assert abs(got[v][1] - inv) < 1e-12


def test_hits_random_graph_vs_numpy_and_discipline(spark):
    from mbfbigdatarandomforest_spark.operators.linkgraph import hits

    rng = np.random.default_rng(47)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 50, size=(300, 2))]
    kw = dict(max_iter=20)
    got = _spark_hits(spark, edges, **kw)
    want = numpy_hits(edges, **kw)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v][0] - want[v][0]) <= 1e-9, ("hub", v)
        assert abs(got[v][1] - want[v][1]) <= 1e-9, ("auth", v)
    # both vectors unit-L2
    assert abs(sum(h * h for h, _ in got.values()) - 1.0) < 1e-9
    assert abs(sum(a * a for _, a in got.values()) - 1.0) < 1e-9
    # stats + checkpoint discipline (two live frames max: state + half)
    df = spark.createDataFrame(edges, "src long, dst long")
    stats: dict = {}
    hits(df, max_iter=25, tol=1e-10, stats=stats).collect()
    assert stats["l1_hub_deltas"][-1] <= 1e-10 or stats["rounds"] == 25
    assert max(stats["live_ckpt_rdds"]) <= 3, stats["live_ckpt_rdds"]


def test_hits_separates_hub_farm_from_authority(spark):
    """The curation claim: a directory/link-farm domain (many out-links,
    no in-links) scores hub-high authority-zero; the linked content
    domains score the reverse."""
    farm = [(100, v) for v in range(5)]
    content = [(v, (v + 1) % 5) for v in range(5)]  # content ring
    got = _spark_hits(spark, farm + content, max_iter=20)
    assert got[100][1] == 0.0  # nothing links the farm: zero authority
    assert got[100][0] == max(h for h, _ in got.values())  # top hub


def test_page_linkgraph_suite_vs_duckdb_numpy_twin(spark, duck):
    """r11: the registered real-HTML composition (rows-only: two
    iterative driver loops) against the full cross-engine twin —
    DuckDB rebuilds the two anchor targets per document, Python counts
    the weighted domain edges, numpy runs weighted PageRank and HITS
    at the query's fixed iteration counts."""
    from mbfbigdatarandomforest_spark.operators.urls import url_twin_sql
    from mbfbigdatarandomforest_spark.plans.llm_ops import (
        LINKGRAPH_SUITE_ITERS,
        PAGERANK_DAMPING,
        SYNTH_URL_SQL,
        TRUST_SEED_DOMAINS,
    )

    spec = load_all()["page_linkgraph_suite"]
    assert spec.oracle is None
    got = spec.fn(spark, SF_DIR_ORACLE).toPandas()

    rd = url_twin_sql("url")["registered_domain"]

    def doms(shift_sql):
        return dict(
            duck.sql(f"""
                SELECT orig_id, {rd} FROM (
                  SELECT orig_id, {SYNTH_URL_SQL} AS url FROM (
                    SELECT doc_id AS orig_id, {shift_sql} AS doc_id
                    FROM documents
                  )
                )
            """).fetchall()
        )

    src = doms("doc_id")
    d1 = doms("doc_id + 1")
    d2 = doms("doc_id * 2 + 1")
    w_edges = Counter()
    for i, s in src.items():
        for d in (d1[i], d2[i]):
            w_edges[(s, d)] += 1
    edge_list = [(s, d, w) for (s, d), w in w_edges.items()]
    want_pr = numpy_pagerank(
        edge_list,
        damping=PAGERANK_DAMPING,
        max_iter=LINKGRAPH_SUITE_ITERS,
        tol=0.0,
    )
    want_ha = numpy_hits(edge_list, max_iter=LINKGRAPH_SUITE_ITERS)
    # r12: TrustRank column — uniform teleport over the
    # lexicographically-first TRUST_SEED_DOMAINS domains, same fixed
    # iterations; the synth graph HAS zero-seed dangling domains, so
    # this twin also guards the structural-dangling fix
    all_nodes = sorted({s for s, _, _ in edge_list} | {d for _, d, _ in edge_list})
    seeds = {n: 1.0 for n in all_nodes[:TRUST_SEED_DOMAINS]}
    want_tr = numpy_pagerank(
        edge_list,
        damping=PAGERANK_DAMPING,
        max_iter=LINKGRAPH_SUITE_ITERS,
        tol=0.0,
        teleport=seeds,
    )
    got_rows = {
        r["domain"]: (r["rank"], r["hub"], r["authority"], r["trust_rank"])
        for _, r in got.iterrows()
    }
    assert set(got_rows) == set(want_pr)
    for dom, (rank, hub, auth, trust) in got_rows.items():
        assert abs(rank - round(want_pr[dom], 9)) <= 1e-9, ("rank", dom)
        assert abs(hub - round(want_ha[dom][0], 9)) <= 1e-9, ("hub", dom)
        assert abs(auth - round(want_ha[dom][1], 9)) <= 1e-9, ("auth", dom)
        assert abs(trust - round(want_tr[dom], 9)) <= 1e-9, ("trust", dom)
    # trust mass conserved (the dangling redistribution really ran)
    assert abs(sum(t for _, _, _, t in got_rows.values()) - 1.0) < 1e-6
    # seeded domains gain vs their unpersonalized rank; a non-seed,
    # non-descendant domain loses — the anti-spam separation TrustRank
    # exists for (weak form: at least the top seed gains)
    top_seed = all_nodes[0]
    assert want_tr[top_seed] > want_pr[top_seed]
    ranks = got["rank"].tolist()
    assert ranks == sorted(ranks, reverse=True)


def test_weighted_hits_vs_numpy_and_replication_equivalence(spark):
    """r11: weighted HITS — w-scaled mass both halves. The weighted
    frame must match the numpy oracle AND equal the integer-replicated
    unweighted formulation exactly (the pagerank semantics link)."""
    from mbfbigdatarandomforest_spark.operators.linkgraph import hits

    w_edges = [(0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 1.0),
               (0, 1, 0.0)]  # zero weight dropped
    df = spark.createDataFrame(w_edges, "src long, dst long, w double")
    got = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(df, weight="w", max_iter=12).collect()
    }
    want = numpy_hits(w_edges, max_iter=12)
    for v in want:
        assert abs(got[v][0] - want[v][0]) <= 1e-9, ("hub", v)
        assert abs(got[v][1] - want[v][1]) <= 1e-9, ("auth", v)
    rep = ([(0, 1, 1.0)] * 3 + [(0, 2, 1.0)] + [(1, 2, 1.0)] * 2
           + [(2, 0, 1.0)])
    rep_df = spark.createDataFrame(rep, "src long, dst long, w double")
    got_rep = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(rep_df, weight="w", max_iter=12).collect()
    }
    for v in got:
        assert abs(got_rep[v][0] - got[v][0]) <= 1e-12
        assert abs(got_rep[v][1] - got[v][1]) <= 1e-12


def test_base_href_reroots_relative_resolution(spark):
    """r11: <base href> semantics — an absolute base replaces the page
    as the context for //-relative and /-relative hrefs; absent or
    relative bases fall back to the page URL; page_link_edges honors
    it (the edge lands on the BASE's domain)."""
    from mbfbigdatarandomforest_spark.operators.linkgraph import (
        page_link_edges,
    )
    from mbfbigdatarandomforest_spark.operators.text import (
        html_base_href,
        resolve_link,
    )

    cases = [
        # (html, page, href, want)
        ('<base href="https://cdn.example/assets/">',
         "https://page.example/p", "/x", "https://cdn.example/x"),
        ('<BASE HREF="http://b.example">',
         "https://page.example/p", "//c.example/y", "http://c.example/y"),
        ("<base href='relative/base'>",
         "https://page.example/p", "/x", "https://page.example/x"),
        ("<p>no base</p>",
         "https://page.example/p", "/x", "https://page.example/x"),
        # r13: quote-aware grammar — '>' inside an earlier quoted
        # attribute, and browser-style trim of the quoted value
        ('<base target="a>b" href=" https://cdn.example ">',
         "https://page.example/p", "/x", "https://cdn.example/x"),
    ]
    df = spark.createDataFrame(
        [(i, h, p, l) for i, (h, p, l, _) in enumerate(cases)],
        "i long, html string, page string, link string",
    )
    got = {
        r["i"]: r["out"]
        for r in df.select(
            "i",
            resolve_link(
                "page", "link", html_base_href(F.col("html"))
            ).alias("out"),
        ).collect()
    }
    for i, (_, _, _, want) in enumerate(cases):
        assert got[i] == want, (i, got[i])

    pages = spark.createDataFrame(
        [(
            "https://page.example/p",
            '<html><head><base href="https://cdn.example/"></head>'
            '<body><a href="/lib.js">l</a></body></html>',
        )],
        "url string, html string",
    )
    edges = {(r["src"], r["dst"]) for r in page_link_edges(pages).collect()}
    assert edges == {("page.example", "cdn.example")}


def test_driver_solve_equals_distributed(spark, monkeypatch):
    """r16 (VERDICT r15 item 4): graphs under DRIVER_SOLVE_MAX_NODES
    solve driver-side (numpy) — the sampled-kmeans rationale applied to
    the iterative family: the registered queries ran 10-20 fixed rounds
    over 9-node domain graphs, pure scheduler-floor jobs. The driver
    path must agree with the distributed loop at 1e-12 on a fixture
    exercising weights, dangling mass, and a personalized teleport —
    for pagerank, pagerank_multi, and HITS (both tol modes) — and the
    distributed loop stays covered by forcing the threshold to 0."""
    import mbfbigdatarandomforest_spark.operators.linkgraph as lg

    edges = spark.createDataFrame(
        [("a", "b", 2.0), ("b", "c", 1.0), ("a", "c", 3.0),
         ("c", "d", 1.0), ("e", "a", 4.0)],  # d dangles
        "src string, dst string, w double",
    )
    seed = spark.createDataFrame(
        [("a", 1.0), ("b", 3.0)], "node string, seed double"
    )
    kw = dict(weight="w", max_iter=17, tol=0.0)

    def ranks(**extra):
        return {
            r["node"]: r["rank"]
            for r in lg.pagerank(edges, **kw, **extra).collect()
        }

    def multi():
        return {
            r["node"]: (r["u"], r["t"])
            for r in lg.pagerank_multi(
                edges, {"u": None, "t": seed}, weight="w", max_iter=17
            ).collect()
        }

    def hits_ranks(tol):
        return {
            r["node"]: (r["hub"], r["authority"])
            for r in lg.hits(edges, weight="w", max_iter=9, tol=tol).collect()
        }

    drv = ranks()
    drv_t = ranks(teleport=seed)
    drv_m = multi()
    drv_h0 = hits_ranks(0.0)
    drv_ht = hits_ranks(1e-12)
    st = {}
    lg.pagerank(edges, stats=st, **kw)
    assert st["rounds"] == 17 and st["live_ckpt_rdds"] == [0] * 17

    monkeypatch.setattr(lg, "DRIVER_SOLVE_MAX_NODES", 0)
    dist = ranks()
    dist_t = ranks(teleport=seed)
    dist_m = multi()
    dist_h0 = hits_ranks(0.0)
    dist_ht = hits_ranks(1e-12)
    st2 = {}
    lg.pagerank(edges, stats=st2, **kw)
    assert st2["rounds"] == 17 and max(st2["live_ckpt_rdds"]) <= 2

    assert set(drv) == set(dist)
    for v in drv:
        assert abs(drv[v] - dist[v]) <= 1e-12, ("uniform", v)
        assert abs(drv_t[v] - dist_t[v]) <= 1e-12, ("teleport", v)
        assert abs(drv_m[v][0] - dist_m[v][0]) <= 1e-12, ("multi-u", v)
        assert abs(drv_m[v][1] - dist_m[v][1]) <= 1e-12, ("multi-t", v)
        for i in (0, 1):
            assert abs(drv_h0[v][i] - dist_h0[v][i]) <= 1e-12, ("hits0", v)
            assert abs(drv_ht[v][i] - dist_ht[v][i]) <= 1e-12, ("hitst", v)
    assert abs(sum(drv.values()) - 1.0) < 1e-9
