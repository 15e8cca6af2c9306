"""URL curation oracle tests (operators/urls.py r10).

Layers: (1) crafted-URL behavior of normalize/host/registered-domain,
(2) cross-engine equality — the twin SQL from url_twin_sql on the same
frame, (3) per_domain_cap vs the plain single-window oracle (the exact
semantics it reimplements skew-hardened) AND vs DuckDB's ROW_NUMBER,
(4) the registered url_curation_stats query vs its full DuckDB twin.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from mbfbigdatarandomforest_spark.operators.urls import (
    normalize_url,
    per_domain_cap,
    url_host,
    url_registered_domain,
    url_twin_sql,
)
from mbfbigdatarandomforest_spark.plans.llm_ops import (
    SYNTH_URL_SQL,
    URL_CAP,
)
from mbfbigdatarandomforest_spark.registry import load_all

from conftest import SF_DIR_ORACLE

# (url, host, registered_domain, normalized)
CASES = [
    (
        "HTTP://User:Pw@WWW.Example.COM:80/Path/Index.HTML?utm_source=x&id=7#frag",
        "www.example.com",
        "example.com",
        "http://www.example.com/Path/Index.HTML?id=7",
    ),
    (
        "https://News.Site.CO.UK:443/a/b/",
        "news.site.co.uk",
        "site.co.uk",
        "https://news.site.co.uk/a/b",
    ),
    (
        "http://host.example.org:8080/x?id=1&utm_campaign=z",
        "host.example.org",
        "example.org",
        "http://host.example.org:8080/x?id=1",
    ),
    (
        "https://single-label/",
        "single-label",
        "single-label",
        "https://single-label",
    ),
    (
        "http://a.b.example.net/p?utm_a=1&utm_b=&ref=rss",
        "a.b.example.net",
        "example.net",
        "http://a.b.example.net/p",
    ),
    ("http://plain.example.com", "plain.example.com", "example.com",
     "http://plain.example.com"),
    # r11 PSL tier: private-section hosting suffixes keep THREE labels
    (
        "https://Alice.GitHub.IO/project/",
        "alice.github.io",
        "alice.github.io",
        "https://alice.github.io/project",
    ),
    (
        "http://x.y.blogspot.com/p?id=2",
        "x.y.blogspot.com",
        "y.blogspot.com",
        "http://x.y.blogspot.com/p?id=2",
    ),
    # r11 PSL tier: ICANN 2-label registries beyond the old heuristic
    (
        "http://shop.example.com.br/x",
        "shop.example.com.br",
        "example.com.br",
        "http://shop.example.com.br/x",
    ),
    (
        "https://www.example.gob.mx/",
        "www.example.gob.mx",
        "example.gob.mx",
        "https://www.example.gob.mx",
    ),
    # unlisted registry under a 2-letter TLD: generic-heuristic tier
    ("http://a.b.co.zz/", "a.b.co.zz", "b.co.zz", "http://a.b.co.zz"),
    # unlisted everything: last-2-labels fallback
    ("http://foo.bar.unknownreg.zz", "foo.bar.unknownreg.zz",
     "unknownreg.zz", "http://foo.bar.unknownreg.zz"),
    # r13 (r12 verdict What's-wrong 3): a host that IS a public suffix
    # has NO registrable domain — '' (the non-URL sentinel), never the
    # host itself. Exact 2-label entry, direct wildcard children
    # (1- and 2-label parents), long literal, and the generic
    # heuristic's own apex.
    ("https://GitHub.IO/", "github.io", "", "https://github.io"),
    ("http://test.ck/x", "test.ck", "", "http://test.ck/x"),
    ("http://foo.kawasaki.jp/", "foo.kawasaki.jp", "",
     "http://foo.kawasaki.jp"),
    ("https://k12.ak.us", "k12.ak.us", "", "https://k12.ak.us"),
    ("http://co.uk", "co.uk", "", "http://co.uk"),
    # the exception rule outranks the self-suffix check: !www.ck IS
    # registrable even though it sits directly under *.ck
    ("http://www.ck/about", "www.ck", "www.ck", "http://www.ck/about"),
]


def test_url_parts_crafted(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _, _) in enumerate(CASES)], "i long, url string"
    )
    got = {
        r["i"]: (r["h"], r["d"], r["n"])
        for r in df.select(
            "i",
            url_host("url").alias("h"),
            url_registered_domain("url").alias("d"),
            normalize_url("url").alias("n"),
        ).collect()
    }
    for i, (_, h, d, n) in enumerate(CASES):
        assert got[i] == (h, d, n), (i, got[i])


def test_url_twin_sql_duckdb_equality(spark, duck):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _, _) in enumerate(CASES)], "i long, url string"
    )
    got = {
        r["i"]: (r["h"], r["d"], r["n"])
        for r in df.select(
            "i",
            url_host("url").alias("h"),
            url_registered_domain("url").alias("d"),
            normalize_url("url").alias("n"),
        ).collect()
    }
    duck.execute("CREATE OR REPLACE TABLE __urls(i BIGINT, url VARCHAR)")
    duck.executemany(
        "INSERT INTO __urls VALUES (?, ?)",
        [(i, u) for i, (u, _, _, _) in enumerate(CASES)],
    )
    twin = url_twin_sql("url")
    want = {
        i: (h, d, n)
        for i, h, d, n in duck.sql(
            f"SELECT i, {twin['host']}, {twin['registered_domain']}, "
            f"{twin['normalized']} FROM __urls"
        ).fetchall()
    }
    assert got == want


def test_psl_wildcard_exception_long_rules_vs_published_cases(spark, duck):
    """r12 (r11 verdict item 6): the three remaining PSL rule kinds —
    wildcards (*.ck, *.kobe.jp), exceptions (!www.ck, !city.kobe.jp)
    and longer literals (k12.ak.us, pvt.k12.ma.us) — against the
    Public Suffix List's OWN published checkPublicSuffix test cases
    (publicsuffix.org test file). r13: hosts where the PSL answer is
    null — the host IS a public suffix — now return '' (the non-URL
    sentinel), closing the r12 documented divergence. The DuckDB twin
    must stay value-equal on every case."""
    # (host, registrable) — straight from the PSL test file
    psl_cases = [
        # TLD with only a wildcard rule (*.mm)
        ("b.c.mm", "b.c.mm"),
        ("a.b.c.mm", "b.c.mm"),
        # wildcard + exception (*.ck, !www.ck)
        ("b.test.ck", "b.test.ck"),
        ("a.b.test.ck", "b.test.ck"),
        ("www.ck", "www.ck"),
        ("www.www.ck", "www.ck"),
        # 2-label-parent wildcard + exception (*.kobe.jp, !city.kobe.jp)
        ("b.c.kobe.jp", "b.c.kobe.jp"),
        ("a.b.c.kobe.jp", "b.c.kobe.jp"),
        ("city.kobe.jp", "city.kobe.jp"),
        ("www.city.kobe.jp", "city.kobe.jp"),
        # US K12 longer literals
        ("test.k12.ak.us", "test.k12.ak.us"),
        ("www.test.k12.ak.us", "test.k12.ak.us"),
        # the 4-label entry — longest-first alternation keeps it whole
        ("school.pvt.k12.ma.us", "school.pvt.k12.ma.us"),
        ("www.school.pvt.k12.ma.us", "school.pvt.k12.ma.us"),
    ]
    # PSL answers null for these (host IS a public suffix): '' since
    # r13 — previously they fell through to a heuristic bucket
    divergent = [("test.ck", ""), ("c.kobe.jp", "")]
    rows = [(i, f"https://{h}/p") for i, (h, _) in
            enumerate(psl_cases + divergent)]
    df = spark.createDataFrame(rows, "i long, url string")
    got = {
        r["i"]: r["d"]
        for r in df.select(
            "i", url_registered_domain("url").alias("d")
        ).collect()
    }
    for i, (h, want) in enumerate(psl_cases + divergent):
        assert got[i] == want, (h, got[i], want)
    duck.execute("CREATE OR REPLACE TABLE __psl(i BIGINT, url VARCHAR)")
    duck.executemany("INSERT INTO __psl VALUES (?, ?)", rows)
    twin = url_twin_sql("url")
    want_twin = {
        i: d
        for i, d in duck.sql(
            f"SELECT i, {twin['registered_domain']} FROM __psl"
        ).fetchall()
    }
    assert got == want_twin


def test_per_domain_cap_vs_plain_window_and_duckdb(spark, duck):
    """The skew-hardened rank must reproduce the single-window oracle
    EXACTLY (kept set identical), in Spark and in DuckDB."""
    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    from mbfbigdatarandomforest_spark.plans.llm_ops import synth_url_col

    urls = docs.select(synth_url_col().alias("url"))
    capped = per_domain_cap(urls, "url", cap=URL_CAP)
    got_kept = {
        r["url"] for r in capped.filter(F.col("kept")).collect()
    }
    # plain-window oracle (the semantics, unhardened)
    w = Window.partitionBy(url_registered_domain("url")).orderBy(
        F.md5(F.col("url")), "url"
    )
    want_kept = {
        r["url"]
        for r in urls.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= URL_CAP)
        .collect()
    }
    assert got_kept == want_kept
    # DuckDB twin of the same selection
    twin = url_twin_sql("url")
    duck_kept = {
        u
        for (u,) in duck.sql(f"""
            WITH u AS (SELECT {SYNTH_URL_SQL} AS url FROM documents),
            r AS (
              SELECT url, ROW_NUMBER() OVER (
                PARTITION BY {twin['registered_domain']}
                ORDER BY md5(url), url) AS rn
              FROM u
            )
            SELECT url FROM r WHERE rn <= {URL_CAP}
        """).fetchall()
    }
    assert got_kept == duck_kept


def test_url_curation_stats_vs_duckdb_twin(spark, duck):
    spec = load_all()["url_curation_stats"]
    assert spec.oracle is not None  # value-hash gate since r11
    got = spec.fn(spark, SF_DIR_ORACLE).toPandas()
    twin = url_twin_sql("url")
    want = duck.sql(f"""
        WITH u AS (SELECT {SYNTH_URL_SQL} AS url FROM documents),
        n AS (
          SELECT url, {twin['normalized']} AS normalized,
                 {twin['registered_domain']} AS domain
          FROM u
        ),
        r AS (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY domain ORDER BY md5(url), url) AS rn
          FROM n
        )
        SELECT domain, COUNT(*) AS n_pages,
               CAST(SUM((rn <= {URL_CAP})::BIGINT) AS BIGINT) AS n_kept,
               COUNT(DISTINCT normalized) AS n_normalized_distinct
        FROM r GROUP BY domain ORDER BY domain
    """).df()
    assert got["domain"].tolist() == want["domain"].tolist()
    for c in ("n_pages", "n_kept", "n_normalized_distinct"):
        assert got[c].tolist() == want[c].tolist(), c
    # the fixture really exercises the cap: the hot domain must clip
    hot = got[got["domain"] == "example.com"]
    assert int(hot["n_pages"].iloc[0]) > URL_CAP
    assert int(hot["n_kept"].iloc[0]) == URL_CAP


def test_normalize_url_idempotent(spark):
    """r11, load-bearing for the crawl ledger: round N+1 anti-joins its
    candidates' canonical forms against round N's STORED canonical
    forms, so normalize(normalize(u)) == normalize(u) must hold — a
    non-idempotent edge would let the same page re-enter the frontier
    every round. Checked over the crafted cases, the synthetic corpus
    fixture, and a hypothesis URL grammar (messy case, ports, userinfo,
    tracking params in every position, fragments, trailing slashes)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from conftest import SF_DIR_ORACLE
    from mbfbigdatarandomforest_spark.plans.llm_ops import synth_url_col

    def assert_idem(urls: list[str]):
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        once = df.select(normalize_url("url").alias("u1"))
        twice = once.select(
            F.col("u1"), normalize_url("u1").alias("u2")
        ).collect()
        for r in twice:
            assert r["u1"] == r["u2"], r["u1"]

    assert_idem([u for (u, _, _, _) in CASES])
    corpus = [
        r["u"]
        for r in spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
        .select(synth_url_col().alias("u"))
        .limit(500)
        .collect()
    ]
    assert_idem(corpus)

    label = st.text(
        alphabet="aB9-", min_size=1, max_size=5
    ).filter(lambda s: not s.startswith("-"))
    host = st.lists(label, min_size=1, max_size=4).map(".".join)
    scheme = st.sampled_from(["http", "HTTP", "https", "HtTpS"])
    port = st.sampled_from(["", ":80", ":443", ":8080"])
    user = st.sampled_from(["", "u@", "U:p@"])
    path = st.lists(
        st.text(alphabet="aZ0._~%", min_size=0, max_size=4),
        min_size=0, max_size=3,
    ).map(lambda ps: "".join("/" + p for p in ps))
    query = st.sampled_from(
        ["", "?id=1", "?utm_source=x", "?id=1&utm_b=2", "?utm_a=1&id=2",
         "?utm_a=1&utm_b=2", "?a=1&ref=rss&b=2"]
    )
    frag = st.sampled_from(["", "#f", "#a/b?c"])
    slashes = st.sampled_from(["", "/", "//"])
    url = st.builds(
        lambda sc, us, ho, po, pa, sl, qu, fr:
            f"{sc}://{us}{ho}{po}{pa}{sl}{qu}{fr}",
        scheme, user, host, port, path, slashes, query, frag,
    )

    # batched: one Spark job per example-list, not per URL
    @settings(max_examples=8, deadline=None)
    @given(st.lists(url, min_size=20, max_size=60))
    def prop(urls):
        assert_idem(urls)

    prop()


def test_psl_loader_and_published_vectors(spark, duck):
    """r14 (r13 verdict item 4): the PSL rule tables are generated from
    the PSL-format data file at import — this test runs the vendored
    publicsuffix.org checkPublicSuffix vectors
    (tests/golden/psl_test_vectors.txt) through BOTH engines. PSL
    'null' maps to '' (the r13 sentinel) with ONE documented
    divergence: a bare single-label host returns itself (a curation
    layer always needs a grouping key)."""
    import re
    from pathlib import Path

    from mbfbigdatarandomforest_spark.operators.urls import (
        PSL_WILDCARDS,
        parse_psl,
    )

    vectors = []
    for line in Path("tests/golden/psl_test_vectors.txt").read_text(
        encoding="utf-8"
    ).splitlines():
        m = re.match(
            r"checkPublicSuffix\('([^']*)',\s*(?:'([^']*)'|null)\);", line
        )
        if m:
            vectors.append((m.group(1), m.group(2)))
    assert len(vectors) >= 60  # the suite really loaded

    def want(host, expected):
        if expected is not None:
            return expected
        # PSL null → '' (r13), EXCEPT the documented bare-host divergence
        return host.lower() if "." not in host else ""

    rows = [(i, f"https://{h}/p") for i, (h, _) in enumerate(vectors)]
    df = spark.createDataFrame(rows, "i long, url string")
    got = {
        r["i"]: r["d"]
        for r in df.select(
            "i", url_registered_domain("url").alias("d")
        ).collect()
    }
    for i, (h, exp) in enumerate(vectors):
        assert got[i] == want(h, exp), (h, got[i], want(h, exp))
    # cross-engine: the DuckDB twin agrees on every vector
    duck.execute("CREATE OR REPLACE TABLE __pslv(i BIGINT, url VARCHAR)")
    duck.executemany("INSERT INTO __pslv VALUES (?, ?)", rows)
    twin = url_twin_sql("url")
    want_twin = {
        i: d
        for i, d in duck.sql(
            f"SELECT i, {twin['registered_domain']} FROM __pslv"
        ).fetchall()
    }
    assert got == want_twin
    # the loader itself: every rule KIND round-trips from PSL format
    parsed = parse_psl(
        "// c\nfoo\nbar.foo\n!baz.foo\n*.foo\n*.qux.foo\n"
        "a.b.foo // trailing\n \n"
    )
    assert parsed["one_label"] == ("foo",)
    assert parsed["two_label"] == ("bar.foo",)
    assert parsed["long"] == ("a.b.foo",)
    assert parsed["wildcards"] == {1: ("foo",), 2: ("qux.foo",)}
    assert parsed["exceptions"] == ("baz.foo",)
    # the live tables came from the data file (not hand literals)
    assert PSL_WILDCARDS[1] and PSL_WILDCARDS[2]


def test_psl_synthetic_1k_rule_universe(spark, duck):
    """r15 (r14 VERDICT item 6): the vendored snapshot exercises ~300
    rules; this drives parse_psl + build_psl_tables over a GENERATED
    ~1k-rule universe — every kind × depth combination, punycode
    mixes — and property-tests Spark ≡ DuckDB twin agreement on
    randomized hostnames, plus exact per-kind expectations. Retires
    the risk that swapping in the complete published list surprises
    the tier expressions."""
    import numpy as np

    import mbfbigdatarandomforest_spark.operators.urls as u

    rng = np.random.default_rng(1551)

    def lab(i, punycode_ok=True):
        if punycode_ok and i % 17 == 0:
            return f"xn--{i}abc-{i % 7}q"
        return f"l{i}x"

    lines = ["// synthetic PSL universe — generated, r15", ""]
    # ~400 two-label rules under disjoint synthetic TLDs
    for i in range(400):
        lines.append(f"s{i}.zz{i}")
    # ~400 long literals, depth 3-5
    for i in range(400):
        depth = 3 + i % 3
        parts = [lab(j + i) for j in range(depth - 1)] + [f"ll{i}"]
        lines.append(".".join(parts))
    # wildcard parents at depth 1-3 (disjoint parents), with an
    # exception under every 5th
    for i in range(150):
        depth = 1 + i % 3
        parent = ".".join([lab(j + 7 * i) for j in range(depth - 1)] + [f"wc{i}"])
        lines.append(f"*.{parent}")
        if i % 5 == 0:
            lines.append(f"!ok{i}.{parent}")
    # one-label TLD literals + junk the parser must skip
    for i in range(60):
        lines.append(f"tld{i}")
    lines += ["   ", "// comment mid-file", "MiXeD.CaSe0 trailing tokens"]
    text = "\n".join(lines)

    rules = u.parse_psl(text)
    # loader properties: every kind landed in its bin, lowercased
    assert len(rules["two_label"]) == 400 + 1  # +1: the mixed.case0 line
    assert "mixed.case0" in rules["two_label"]
    assert len(rules["long"]) == 400
    assert sorted(rules["wildcards"]) == [1, 2, 3]
    assert sum(len(v) for v in rules["wildcards"].values()) == 150
    assert len(rules["exceptions"]) == 30
    assert len(rules["one_label"]) == 60
    # deepest/longest-first ordering of the long bin
    longs = rules["long"]
    depths = [e.count(".") for e in longs]
    assert depths == sorted(depths, reverse=True)

    tables = u.build_psl_tables(rules)
    saved = {
        n: getattr(u, n)
        for n in (
            "_PSL_ALT", "_PSL_LONG_ALT", "_PSL_WC_ALTS", "_PSL_EXC_ALT",
            "_SELF_SUFFIX_RE",
        )
    }
    try:
        u._PSL_ALT = tables["alt"]
        u._PSL_LONG_ALT = tables["long_alt"]
        u._PSL_WC_ALTS = tables["wc_alts"]
        u._PSL_EXC_ALT = tables["exc_alt"]
        u._SELF_SUFFIX_RE = tables["self_suffix_re"]

        # exact per-kind expectations (one per rule kind × position)
        exact = [
            ("a.s3.zz3", "a.s3.zz3"),            # 2-label: keep three
            ("www.a.s3.zz3", "a.s3.zz3"),
            ("s3.zz3", ""),                      # IS the suffix
            (longs[0], ""),                      # long literal itself
            (f"reg.{longs[0]}", f"reg.{longs[0]}"),
            (f"www.reg.{longs[0]}", f"reg.{longs[0]}"),
            ("child.wc0", ""),                   # wildcard child = suffix
            ("reg.child.wc0", "reg.child.wc0"),  # grandchild registrable
            ("ok0.wc0", "ok0.wc0"),              # exception: itself
            ("deep.ok0.wc0", "ok0.wc0"),
            ("plain.example", "plain.example"),  # unrelated: last two
        ]
        # randomized hosts over the universe: rule + 0-3 random labels
        all_suffixes = (
            list(rules["two_label"][:150])
            + list(longs[:150])
            + [f"kid{i}.{p}" for i, ps in rules["wildcards"].items()
               for p in ps[:30]]
            + list(rules["exceptions"][:30])
        )
        hosts = [h for h, _ in exact]
        for i, s in enumerate(all_suffixes):
            n_pre = int(rng.integers(0, 4))
            pre = [lab(int(rng.integers(0, 5000)), punycode_ok=True)
                   for _ in range(n_pre)]
            hosts.append(".".join(pre + [s]))
        rows = [(i, f"https://{h}/p?x=1") for i, h in enumerate(hosts)]
        df = spark.createDataFrame(rows, "i long, url string")
        got = {
            r["i"]: r["d"]
            for r in df.select(
                "i", u.url_registered_domain("url").alias("d")
            ).collect()
        }
        for i, (h, want) in enumerate(exact):
            assert got[i] == want, (h, got[i], want)
        duck.execute(
            "CREATE OR REPLACE TABLE __pslsyn(i BIGINT, url VARCHAR)"
        )
        duck.executemany("INSERT INTO __pslsyn VALUES (?, ?)", rows)
        twin = u.url_twin_sql("url")
        want_twin = {
            i: d
            for i, d in duck.sql(
                f"SELECT i, {twin['registered_domain']} FROM __pslsyn"
            ).fetchall()
        }
        assert got == want_twin
        assert len(got) == len(hosts)
    finally:
        for n, v in saved.items():
            setattr(u, n, v)
