"""robots.txt policy oracle tests (operators/robots.py r11).

The reference implementation here is an independent pure-Python RFC
9309 evaluator (group parsing, most-specific-prefix product-token
selection falling back to ``*`` — r13, equal-length winners combine,
wildcard/anchor matching, §2.2.2 percent-encoding canonicalization —
r14, longest-match-wins with allow on ties) — Spark must agree
URL-for-URL on crafted corner cases and on a randomized fixture
sweep. stdlib urllib.robotparser is NOT the oracle: it implements the
1994 draft without wildcard support.
"""

from __future__ import annotations

import re
import string

import numpy as np

from mbfbigdatarandomforest_spark.operators.robots import (
    parse_robots,
    robots_allowed,
)

_UNRESERVED = set(string.ascii_letters + string.digits + "-._~")
_RAW_KEEP = _UNRESERVED | set(":/?#@!&'()+,;=[]")


def py_canonical(s: str, keep_meta: bool = False) -> str:
    """Independent mirror of pct_canonical (RFC 9309 §2.2.2): decode
    percent-encoded unreserved octets, uppercase retained %XX hex,
    UTF-8-percent-encode raw characters outside the canonical-raw set;
    keep_meta leaves a raw '*' anywhere and a raw '$' only at the
    pattern END alone (the live metacharacter positions) — a
    mid-pattern raw '$' is a literal and folds to %24 (ADVICE r14)."""
    if keep_meta:
        s = re.sub(r"\$(?!\Z)", "%24", s)
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c == "%" and re.match(r"%[0-9A-Fa-f]{2}", s[i : i + 3]):
            h = s[i + 1 : i + 3].upper()
            ch = chr(int(h, 16))
            out.append(ch if ch in _UNRESERVED else "%" + h)
            i += 3
        elif c in _RAW_KEEP or (keep_meta and c in "*$"):
            out.append(c)
            i += 1
        else:
            out.append("".join("%%%02X" % b for b in c.encode("utf-8")))
            i += 1
    return "".join(out)


def _parse_groups(body: str):
    groups, agents, rules, opening = [], set(), [], False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        d, v = line.split(":", 1)
        d, v = d.strip().lower(), v.strip()
        if d == "user-agent":
            if not opening:
                if agents:
                    groups.append((agents, rules))
                agents, rules, opening = set(), [], True
            agents.add(v.lower())
        else:
            opening = False
            if agents:  # rules before any user-agent line are ignored
                rules.append((d, v))
    if agents:
        groups.append((agents, rules))
    return groups


def _match(pat: str, path: str) -> bool:
    # py_canonical already folded mid-pattern literal '$' to %24
    # (ADVICE r14) — the only '$' that can survive is the trailing
    # anchor, un-escaped back to the live metacharacter here
    rx = "^" + re.escape(py_canonical(pat, keep_meta=True)).replace(
        r"\*", ".*"
    )
    if rx.endswith(r"\$"):
        rx = rx[:-2] + "$"
    return re.search(rx, py_canonical(path)) is not None


def _token_match_len(tokens, agent: str) -> int:
    """Octet length of the best group token matching the crawler's
    product token (RFC 9309 §2.2.1 — case-insensitive PREFIX matching,
    the family ladder; r13) — 0 when none; '*' and '' never match
    (fallback tier / malformed line)."""
    ls = [
        len(t.encode("utf-8"))
        for t in tokens
        if t not in ("*", "") and agent.startswith(t)
    ]
    return max(ls) if ls else 0


def _governing_groups(groups, agent: str):
    best = max((_token_match_len(g[0], agent) for g in groups), default=0)
    if best > 0:
        return [g for g in groups if _token_match_len(g[0], agent) == best]
    return [g for g in groups if "*" in g[0]]


def py_allowed(body: str, agent: str, path: str) -> bool:
    groups = _parse_groups(body)
    agent = agent.lower()
    sel = _governing_groups(groups, agent)
    best = None
    for _, rules in sel:
        for d, pat in rules:
            if d not in ("allow", "disallow") or pat == "":
                continue
            if _match(pat, path):
                # RFC 9309 ranks by most OCTETS, not characters —
                # multi-byte UTF-8 patterns count their encoded bytes;
                # octets of the CANONICAL pattern (r14 §2.2.2), so two
                # spellings of one rule rank identically
                key = (
                    len(py_canonical(pat, keep_meta=True).encode("utf-8")),
                    d == "allow",
                )
                if best is None or key > best:
                    best = key
    return True if best is None else best[1]


CLASSIC = """\
# corpus crawler policy
User-agent: *
Disallow: /private
Allow: /private/ok
Disallow: /*.pdf$
Disallow:

User-agent: corpusbot
User-agent: otherbot
Disallow: /bot-group-blocked
Allow: /

Sitemap: https://site.example/sitemap.xml
Crawl-delay: 2
"""

PATHS = [
    "/",
    "/public/page.html",
    "/private",
    "/private/secret",
    "/private/ok/file",
    "/docs/manual.pdf",
    "/docs/manual.pdf.html",
    "/bot-group-blocked/x",
]


def _rules_df(spark, bodies: dict[str, str]):
    return parse_robots(
        spark.createDataFrame(list(bodies.items()), "host string, body string")
    )


def _spark_decisions(spark, bodies, urls, agent):
    rules = _rules_df(spark, bodies)
    udf_ = spark.createDataFrame([(u,) for u in urls], "url string")
    out = robots_allowed(udf_, rules, agent=agent)
    return {r["url"]: r["allowed"] for r in out.collect()}


def test_classic_policy_star_agent(spark):
    host = "site.example"
    urls = [f"https://{host}{p}" for p in PATHS]
    got = _spark_decisions(spark, {host: CLASSIC}, urls, "*")
    for p in PATHS:
        assert got[f"https://{host}{p}"] == py_allowed(CLASSIC, "*", p), p
    # spot-check the semantics the fixture encodes
    assert got[f"https://{host}/private/secret"] is False
    assert got[f"https://{host}/private/ok/file"] is True  # longer allow
    assert got[f"https://{host}/docs/manual.pdf"] is False  # anchored
    assert got[f"https://{host}/docs/manual.pdf.html"] is True  # $ respected
    # the bot-group rule lives in the corpusbot/otherbot group — the
    # star agent never sees it
    assert got[f"https://{host}/bot-group-blocked/x"] is True


def test_exact_agent_group_overrides_star(spark):
    host = "site.example"
    urls = [f"https://{host}{p}" for p in PATHS]
    got = _spark_decisions(spark, {host: CLASSIC}, urls, "CorpusBot")
    for p in PATHS:
        assert got[f"https://{host}{p}"] == py_allowed(CLASSIC, "corpusbot", p)
    # corpusbot is governed ONLY by its own group: the long disallow
    # beats the 1-char Allow: / on its path, everything else allowed
    assert got[f"https://{host}/bot-group-blocked/x"] is False
    assert got[f"https://{host}/private/secret"] is True
    assert got[f"https://{host}/docs/manual.pdf"] is True


def test_no_rules_hosts_and_unmatched_paths_allowed(spark):
    bodies = {"ruled.example": "User-agent: *\nDisallow: /x\n"}
    urls = [
        "https://ruled.example/x/1",
        "https://ruled.example/y",
        "https://unruled.example/anything",
    ]
    got = _spark_decisions(spark, bodies, urls, "*")
    assert got == {
        "https://ruled.example/x/1": False,
        "https://ruled.example/y": True,
        "https://unruled.example/anything": True,
    }


def test_rules_before_any_user_agent_ignored_and_directive_rows(spark):
    body = "Disallow: /orphan\nUser-agent: *\nDisallow: /real\n"
    rules = _rules_df(spark, {"h.example": body})
    rows = {
        (r["directive"], r["value"]): r["agents"] for r in rules.collect()
    }
    assert rows[("disallow", "/orphan")] == []  # surfaced, agentless
    assert rows[("disallow", "/real")] == ["*"]
    got = _spark_decisions(
        spark, {"h.example": body}, ["https://h.example/orphan/f"], "*"
    )
    assert got["https://h.example/orphan/f"] is True  # orphan rule inert


def test_sitemap_and_crawl_delay_surfaced(spark):
    rules = _rules_df(spark, {"site.example": CLASSIC})
    d = {r["directive"]: r["value"] for r in rules.collect()}
    assert d["sitemap"] == "https://site.example/sitemap.xml"
    assert d["crawl-delay"] == "2"
    assert rules.filter("directive = 'sitemap'").first()["pattern_re"] is None


def test_randomized_sweep_vs_python_oracle(spark):
    """Fuzz the whole path: random rule sets over pattern atoms with
    wildcards/anchors, random paths, three agents — Spark must equal
    the Python RFC evaluator on every (host, path, agent) decision.
    r12: ~1 in 5 groups is DELAY-ONLY (no path rules) — the generator
    shape that catches tier-mixing in group selection (a delay-only
    exact group must suppress the * group's path rules). r13: the pool
    gains 'corpus' (a PREFIX of the tested product tokens — exercises
    the specificity ladder) and 'bot' (a SUFFIX — must never match,
    the prefix rule's trap), and a suffixed product token
    (CorpusBot-News/2.1) sweeps the pure-prefix path."""
    rng = np.random.default_rng(911)
    atoms = [
        "/a", "/b/c", "/data", "/*.js", "/img*", "/x/y.html$", "/p/*/q",
        # r14 §2.2.2 atoms: mixed encodings, encoded metacharacters,
        # unreserved octets, stray %, non-ASCII
        "/enc dir", "/enc%20dir", "/f%2Axe", "/%62in", "/mid$lit",
        "/100%", "/ü",
    ]
    agents_pool = ["*", "corpusbot", "otherbot", "corpus", "bot"]
    bodies = {}
    for h in range(6):
        lines = []
        for g in range(int(rng.integers(1, 4))):
            for a in set(
                rng.choice(agents_pool, size=int(rng.integers(1, 3)))
            ):
                lines.append(f"User-agent: {a}")
            if rng.random() < 0.2:
                lines.append(f"Crawl-delay: {int(rng.integers(1, 9))}")
                continue
            for r in range(int(rng.integers(1, 5))):
                d = "Allow" if rng.random() < 0.4 else "Disallow"
                lines.append(f"{d}: {atoms[int(rng.integers(len(atoms)))]}")
        bodies[f"h{h}.example"] = "\n".join(lines) + "\n"
    paths = [
        "/", "/a", "/a/z", "/b/c/d", "/data/set.js", "/img123/f",
        "/x/y.html", "/x/y.html?v=1", "/p/mid/q", "/other",
        "/enc dir/x", "/enc%20dir/x", "/f*xe", "/f%2Axe", "/%2axe",
        "/bin/z", "/%62in/z", "/mid$lit", "/100%", "/100%25",
        "/ü", "/%C3%BC", "/%c3%bc",
    ]
    urls = [f"http://{h}{p}" for h in bodies for p in paths]
    for agent in ("*", "CorpusBot", "CorpusBot-News/2.1"):
        got = _spark_decisions(spark, bodies, urls, agent)
        for h, body in bodies.items():
            for p in paths:
                u = f"http://{h}{p}"
                assert got[u] == py_allowed(body, agent, p), (agent, u)


def test_delay_only_exact_group_suppresses_star_rules(spark):
    """VERDICT r11 (What's wrong 1): a group that names the agent
    exactly but contains ONLY a crawl-delay line still GOVERNS that
    agent (RFC 9309 §2.2.1) — its empty path-rule set means allow-all.
    The old rule-row-derived __has_exact fell back to the *
    group's disallows here, mixing tiers."""
    from mbfbigdatarandomforest_spark.operators.robots import (
        agent_crawl_delay,
    )

    body = (
        "User-agent: *\nDisallow: /\nCrawl-delay: 9\n\n"
        "User-agent: corpusbot\nCrawl-delay: 2\n"
    )
    host = "h.example"
    urls = [f"https://{host}/page"]
    # the Python oracle already had full-membership semantics
    assert py_allowed(body, "corpusbot", "/page") is True
    got = _spark_decisions(spark, {host: body}, urls, "corpusbot")
    assert got[f"https://{host}/page"] is True  # star's Disallow: / inert
    star = _spark_decisions(spark, {host: body}, urls, "*")
    assert star[f"https://{host}/page"] is False  # star still bound
    # symmetric tier discipline for the delay itself: corpusbot's
    # governing group declares 2; an agent whose exact group has only
    # path rules gets NO delay (never the * group's)
    rules = _rules_df(spark, {host: body})
    delays = {
        r["host"]: r["crawl_delay"]
        for r in agent_crawl_delay(rules, "corpusbot").collect()
    }
    assert delays == {host: 2.0}
    body2 = (
        "User-agent: *\nCrawl-delay: 9\n\n"
        "User-agent: corpusbot\nDisallow: /x\n"
    )
    rules2 = _rules_df(spark, {host: body2})
    assert agent_crawl_delay(rules2, "corpusbot").count() == 0
    assert {
        r["host"]: r["crawl_delay"]
        for r in agent_crawl_delay(rules2, "*").collect()
    } == {host: 9.0}


def test_product_token_prefix_matching_most_specific_wins(spark):
    """r13 (the last collapsed RFC leg): a group whose agent token is a
    case-insensitive PREFIX of the crawler's product token governs it;
    the longest (most octets) matching token wins; '*' stays the
    no-match fallback — the specificity ladder crawler docs publish
    (corpusbot-news > corpusbot > corpus > *). Prefix, not substring:
    a generic suffix token must NOT capture unrelated crawlers."""
    body = (
        "User-agent: *\nDisallow: /star\n\n"
        "User-agent: corpus\nDisallow: /six\n\n"
        "User-agent: corpusbot\nDisallow: /nine\n\n"
        "User-agent: corpusbot-news\nDisallow: /news\n"
    )
    host = "h.example"
    paths = ["/star/x", "/six/x", "/nine/x", "/news/x"]
    urls = [f"https://{host}{p}" for p in paths]
    cases = {
        "CorpusBot-News/2.1": "/news/x",  # 14-octet token wins
        "CorpusBot": "/nine/x",           # exact beats the 6-octet prefix
        "corpusreader": "/six/x",         # only 'corpus' is a prefix
        "unrelatedbot": "/star/x",        # 'bot' is a SUFFIX → * tier
    }
    for agent, blocked in cases.items():
        got = _spark_decisions(spark, {host: body}, urls, agent)
        for p in paths:
            u = f"https://{host}{p}"
            assert got[u] == py_allowed(body, agent, p), (agent, p)
            assert got[u] is (p != blocked), (agent, p)


def test_same_winning_token_groups_combine(spark):
    """r13: separate groups naming the SAME winning token all govern —
    RFC 9309 §2.2.1's multiple-matching-groups merge — and the delay
    ladder follows the same selection (the matching groups' delay,
    never the * group's). Non-prefix tokens stay out."""
    from mbfbigdatarandomforest_spark.operators.robots import (
        agent_crawl_delay,
    )

    host = "h.example"
    body = (
        "User-agent: corpus\nDisallow: /a\n\n"
        "User-agent: corpus\nDisallow: /o\nCrawl-delay: 3\n\n"
        "User-agent: omega\nDisallow: /m\n\n"
        "User-agent: *\nDisallow: /s\nCrawl-delay: 9\n"
    )
    paths = ["/a/x", "/o/x", "/m/x", "/s/x", "/free"]
    urls = [f"https://{host}{p}" for p in paths]
    got = _spark_decisions(spark, {host: body}, urls, "corpusbot")
    for p in paths:
        assert got[f"https://{host}{p}"] == py_allowed(body, "corpusbot", p)
    # both 'corpus' groups combine; 'omega' (no prefix) and '*' are out
    assert got[f"https://{host}/a/x"] is False
    assert got[f"https://{host}/o/x"] is False
    assert got[f"https://{host}/m/x"] is True
    assert got[f"https://{host}/s/x"] is True
    assert got[f"https://{host}/free"] is True
    rules = _rules_df(spark, {host: body})
    assert {
        r["host"]: r["crawl_delay"]
        for r in agent_crawl_delay(rules, "corpusbot").collect()
    } == {host: 3.0}  # the corpus groups' 3, never *'s 9
    assert {
        r["host"]: r["crawl_delay"]
        for r in agent_crawl_delay(rules, "nomatchbot").collect()
    } == {host: 9.0}
    # the suffix trap the prefix rule exists for: a bare 'bot' group
    # must NOT capture 'corpusbot' off the * tier
    trap = "User-agent: bot\nDisallow: /\n\nUser-agent: *\nAllow: /\n"
    t = _spark_decisions(
        spark, {host: trap}, [f"https://{host}/page"], "corpusbot"
    )
    assert t[f"https://{host}/page"] is True
    assert py_allowed(trap, "corpusbot", "/page") is True


def test_longest_match_ranks_by_octets_not_characters(spark):
    """VERDICT r11 (What's wrong 3): RFC 9309 specifies MOST OCTETS.
    '/éé' is 3 characters but 5 UTF-8 octets; against a 4-char/4-octet
    allow pattern the octet count must decide — a char-counting ranker
    flips this decision."""
    body = "User-agent: *\nDisallow: /éé\nAllow: /*z$\n"
    path = "/ééz"  # both patterns match
    assert len("/éé") == 3 and len("/éé".encode()) == 5
    assert py_allowed(body, "*", path) is False  # 5 octets beat 4
    got = _spark_decisions(
        spark, {"h.example": body}, [f"https://h.example{path}"], "*"
    )
    assert got[f"https://h.example{path}"] is False


def test_percent_encoding_canonicalization(spark):
    """RFC 9309 §2.2.2 (r14): rule and path compare in ONE canonical
    percent-encoding — both directions of the space case, encoded
    metacharacters staying distinct from live */$, unreserved-octet
    decoding, hex-case folding, stray %, and non-ASCII UTF-8."""
    bodies = {
        "sp1.example": "User-agent: *\nDisallow: /a b\n",
        "sp2.example": "User-agent: *\nDisallow: /a%20b\n",
        "meta.example": (
            "User-agent: *\n"
            "Disallow: /lit%2Astar\n"    # literal '*', not a wildcard
            "Disallow: /wild*card\n"     # live wildcard
            "Disallow: /dol%24lar\n"     # literal '$'
            "Disallow: /mid$dollar\n"    # mid-pattern raw $ = literal
            "Disallow: /end$\n"          # trailing raw $ = anchor
        ),
        "unres.example": "User-agent: *\nDisallow: /%62%61z\n",  # = /baz
        "hex.example": "User-agent: *\nDisallow: /q%3fx\n",      # %3f≡%3F
        "stray.example": "User-agent: *\nDisallow: /100%\n",
        "utf8.example": "User-agent: *\nDisallow: /ü\n",
    }
    cases = {
        # rule '/a b' blocks BOTH spellings of the path
        "http://sp1.example/a b": False,
        "http://sp1.example/a%20b": False,
        "http://sp1.example/a-b": True,
        # rule '/a%20b' blocks BOTH spellings too (other direction)
        "http://sp2.example/a b": False,
        "http://sp2.example/a%20b": False,
        # %2A is a literal star: matches raw-* and %2A paths, but is
        # NOT a wildcard (no match on arbitrary text)
        "http://meta.example/lit*star": False,
        "http://meta.example/lit%2Astar": False,
        "http://meta.example/litXYZstar": True,
        # live wildcard still wildcards
        "http://meta.example/wildANYTHINGcard": False,
        # %24 is a literal dollar, matching raw-$ and %24 paths
        "http://meta.example/dol$lar": False,
        "http://meta.example/dol%24lar": False,
        # mid-pattern raw $ is a literal, not an anchor
        "http://meta.example/mid$dollar": False,
        "http://meta.example/mid%24dollar": False,
        # trailing raw $ still anchors
        "http://meta.example/end": False,
        "http://meta.example/end/more": True,
        # unreserved octets decode: %62%61z ≡ baz (both directions)
        "http://unres.example/baz": False,
        "http://unres.example/%62%61z": False,
        "http://unres.example/bar": True,
        # retained %XX hex case folds: rule %3f matches path %3F and
        # %3f, and stays DISTINCT from a raw '?' (reserved)
        "http://hex.example/q%3Fx": False,
        "http://hex.example/q%3fx": False,
        "http://hex.example/q?x": True,
        # stray % encodes to %25 on both sides
        "http://stray.example/100%": False,
        "http://stray.example/100%25": False,
        # raw non-ASCII ≡ its UTF-8 percent-encoding, any hex case
        "http://utf8.example/ü": False,
        "http://utf8.example/%C3%BC": False,
        "http://utf8.example/%c3%bc": False,
    }
    got = _spark_decisions(spark, bodies, list(cases), "*")
    for url, want in cases.items():
        assert got[url] == want, url
    # the Python oracle agrees on every case (the sweep's canonical
    # mirror is itself pinned here against hand-derived expectations)
    for url, want in cases.items():
        host = url.split("/")[2]
        path = url[url.index(host) + len(host):]
        assert py_allowed(bodies[host], "*", path) == want, url


def test_canonical_octet_ranking_spelling_invariant(spark):
    """Two spellings of the same rule must rank identically: an
    allow published as '/%64ir/ok' (7 canonical octets) must beat a
    disallow '/dir' even though its PUBLISHED spelling is longer than
    the canonical form of the allow."""
    bodies = {
        "r.example": (
            "User-agent: *\nDisallow: /dir\nAllow: /%64ir/ok\n"
        ),
        # same policy, spelled canonically — decisions must be equal
        "c.example": "User-agent: *\nDisallow: /dir\nAllow: /dir/ok\n",
    }
    urls = [
        f"http://{h}{p}"
        for h in bodies
        for p in ("/dir", "/dir/ok", "/dir/ok/deep", "/%64ir/ok")
    ]
    got = _spark_decisions(spark, bodies, urls, "*")
    for p, want in (
        ("/dir", False),
        ("/dir/ok", True),
        ("/dir/ok/deep", True),
        ("/%64ir/ok", True),
    ):
        assert got[f"http://r.example{p}"] == want, p
        assert got[f"http://c.example{p}"] == want, p


def test_robots_policy_stats_vs_python_twin(spark, duck):
    """The registered query (rows-only) against the Python RFC
    evaluator over the DuckDB-rebuilt URL corpus."""
    from collections import Counter

    from mbfbigdatarandomforest_spark.operators.urls import url_twin_sql
    from mbfbigdatarandomforest_spark.plans.llm_ops import (
        ROBOTS_FIXTURE_BODY,
        SYNTH_URL_SQL,
    )
    from mbfbigdatarandomforest_spark.registry import load_all

    from conftest import SF_DIR_ORACLE

    spec = load_all()["robots_policy_stats"]
    assert spec.oracle is not None  # value-hash gate since r12
    got = {
        r["domain"]: (r["n_urls"], r["n_allowed"])
        for _, r in spec.fn(spark, SF_DIR_ORACLE).toPandas().iterrows()
    }
    twin = url_twin_sql("url")
    rows = duck.sql(f"""
        SELECT {twin['registered_domain']}, url
        FROM (SELECT {SYNTH_URL_SQL} AS url FROM documents)
    """).fetchall()
    n_urls: Counter = Counter()
    n_allowed: Counter = Counter()
    for dom, url in rows:
        path = re.sub(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "", url) or "/"
        n_urls[dom] += 1
        n_allowed[dom] += py_allowed(ROBOTS_FIXTURE_BODY, "*", path)
    assert got == {d: (n_urls[d], n_allowed[d]) for d in n_urls}
    # the fixture really bites: some URLs blocked, some allowed
    total_urls = sum(n_urls.values())
    total_ok = sum(n_allowed.values())
    assert 0 < total_ok < total_urls


def test_crawl_frontier_composition(spark):
    """r11 capstone of the crawl side: candidates with duplicate/
    tracking-noise variants collapse to canonical URLs, robots blocks
    its paths, PageRank authority joins per domain, and the per-domain
    cap clips the hot domain — every stage's effect asserted."""
    from mbfbigdatarandomforest_spark.operators.linkgraph import pagerank
    from mbfbigdatarandomforest_spark.plans.llm_ops import crawl_frontier

    cands = (
        # hot.example: 8 pages (2 are tracking-noise dups), 1 blocked
        [(f"https://Hot.Example/p/{i}?utm_source=x",) for i in range(2)]
        + [(f"https://hot.example/p/{i}",) for i in range(8)]
        + [("https://hot.example/private/x",)]
        # cold.example: 2 pages
        + [("http://cold.example/a",), ("http://cold.example/b/",)]
    )
    urls = spark.createDataFrame(cands, "url string")
    rules = _rules_df(
        spark,
        {
            "hot.example": "User-agent: *\nDisallow: /private\n"
                           "Crawl-delay: 2.5\n",
            "cold.example": "User-agent: *\nDisallow:\n",
        },
    )
    edges = spark.createDataFrame(
        [("cold.example", "hot.example"), ("hot.example", "cold.example")],
        "src string, dst string",
    )
    auth = pagerank(edges, max_iter=10, tol=0.0).withColumnRenamed(
        "node", "domain"
    )
    out = crawl_frontier(urls, rules, auth, cap=5).toPandas()
    assert len(out) == 10  # 8 canonical hot + 2 cold; dups + blocked gone
    assert not out["url"].str.contains("utm_|private|Hot").any()
    hot = out[out["domain"] == "hot.example"]
    assert len(hot) == 8 and int(hot["kept"].sum()) == 5  # cap bites
    cold = out[out["domain"] == "cold.example"]
    assert len(cold) == 2 and bool(cold["kept"].all())
    assert (out["rank"] - 0.5).abs().max() < 1e-12  # symmetric 2-cycle
    # politeness budget joins per host: hot declares 2.5, cold none
    assert (hot["crawl_delay"] == 2.5).all()
    assert cold["crawl_delay"].isna().all()


def test_parse_sitemaps_urlset_and_index(spark):
    """Sitemap protocol: urlset entries (frontier candidates) with
    entity-escaped locs and optional lastmod; sitemapindex files flag
    is_index so the crawler fetches the nested maps next."""
    from mbfbigdatarandomforest_spark.operators.robots import parse_sitemaps

    urlset = """<?xml version="1.0" encoding="UTF-8"?>
    <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <url><loc>https://site.example/a?x=1&amp;y=2</loc>
           <lastmod>2020-01-02</lastmod></url>
      <url><loc> https://site.example/b </loc></url>
      <url><priority>0.5</priority></url>
    </urlset>"""
    index = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <sitemap><loc>https://site.example/maps/1.xml</loc></sitemap>
      <sitemap><loc>https://site.example/maps/2.xml</loc>
               <lastmod>2021-03-04</lastmod></sitemap>
    </sitemapindex>"""
    df = spark.createDataFrame(
        [("site.example", urlset), ("site.example", index)],
        "host string, body string",
    )
    rows = {
        (r["loc"], r["lastmod"], r["is_index"])
        for r in parse_sitemaps(df).collect()
    }
    assert rows == {
        ("https://site.example/a?x=1&y=2", "2020-01-02", False),
        ("https://site.example/b", None, False),  # whitespace trimmed
        ("https://site.example/maps/1.xml", None, True),
        ("https://site.example/maps/2.xml", "2021-03-04", True),
    }  # the loc-less <url> block dropped


def test_crawl_frontier_seen_ledger_excludes_prior_rounds(spark):
    """r11: the crawl ledger — round 2's frontier must spend its cap
    on genuinely NEW pages, excluding everything round 1 already
    scheduled (the iterative loop's memory)."""
    from mbfbigdatarandomforest_spark.plans.llm_ops import crawl_frontier

    urls_r1 = spark.createDataFrame(
        [(f"https://d.example/p/{i}",) for i in range(6)], "url string"
    )
    r1 = crawl_frontier(urls_r1, cap=4)
    assert int(r1.filter("kept").count()) == 4
    # round 2 re-discovers all of round 1 plus 3 new pages
    urls_r2 = spark.createDataFrame(
        [(f"https://d.example/p/{i}",) for i in range(6)]
        + [(f"https://d.example/new/{i}",) for i in range(3)],
        "url string",
    )
    r2 = crawl_frontier(urls_r2, cap=4, seen=r1.select("url"))
    out = r2.toPandas()
    assert len(out) == 3  # only the new pages survive the ledger
    assert out["url"].str.contains("/new/").all()
    assert bool(out["kept"].all())  # cap budget goes to new pages


def test_pattern_metacharacters_match_literally(spark):
    """Adversarial rule patterns: regex metacharacters in robots
    patterns are LITERALS (only * and a trailing $ are special) — the
    Spark translation must agree with the re.escape-based oracle on
    hostile patterns, and a mid-pattern $ must stay literal."""
    hostile = [
        "/a(b",            # unbalanced paren
        "/c+d",            # quantifier char
        "/e.f",            # dot must not match any-char
        "/g[h",            # unbalanced class
        "/i{2}",           # brace quantifier
        "/j|k",            # alternation char
        "/price$10",       # mid-pattern $ is literal
        "/w\\x",           # backslash
        "/m*n$",           # the two REAL metachars together
    ]
    body = "User-agent: *\n" + "\n".join(f"Disallow: {p}" for p in hostile)
    paths = [
        "/a(b/1", "/aXb", "/c+d", "/ccd", "/e.f", "/eXf", "/g[h", "/i{2}",
        "/j|k", "/j", "/k", "/price$10", "/price910", "/w\\x",
        "/mZZn", "/mZZnY", "/other",
    ]
    urls = [f"https://h.example{p}" for p in paths]
    got = _spark_decisions(spark, {"h.example": body}, urls, "*")
    for p in paths:
        assert got[f"https://h.example{p}"] == py_allowed(body, "*", p), p
    # the load-bearing literals, spelled out
    assert got["https://h.example/e.f"] is False
    assert got["https://h.example/eXf"] is True   # '.' not any-char
    assert got["https://h.example/price$10"] is False
    assert got["https://h.example/price910"] is True  # '$' not anchor
    assert got["https://h.example/mZZn"] is False  # * spans, $ anchors
    assert got["https://h.example/mZZnY"] is True


def test_crawl_frontier_stats_vs_python_twin(spark, duck):
    """The registered frontier capstone (rows-only) against the full
    Python twin: DuckDB rebuilds + canonicalizes the URL corpus, the
    RFC evaluator decides permissions, hashlib-md5 ordering reproduces
    the exact per-domain cap selection."""
    import hashlib
    from collections import Counter, defaultdict

    from mbfbigdatarandomforest_spark.operators.urls import url_twin_sql
    from mbfbigdatarandomforest_spark.plans.llm_ops import (
        ROBOTS_FIXTURE_BODY,
        SYNTH_URL_SQL,
        URL_CAP,
    )
    from mbfbigdatarandomforest_spark.registry import load_all

    from conftest import SF_DIR_ORACLE

    spec = load_all()["crawl_frontier_stats"]
    assert spec.oracle is not None  # value-hash gate since r12
    got = {
        r["domain"]: (r["n_candidates"], r["n_scheduled"], r["crawl_delay"])
        for _, r in spec.fn(spark, SF_DIR_ORACLE).toPandas().iterrows()
    }
    twin = url_twin_sql("url")
    rows = duck.sql(f"""
        SELECT DISTINCT {twin['normalized']} AS canon,
               {twin['registered_domain']} AS dom
        FROM (SELECT {SYNTH_URL_SQL} AS url FROM documents)
    """).fetchall()
    # NOTE: frontier canonicalizes FIRST, so robots/cap run on the
    # normalized form (tracking params and fragments already gone)
    allowed = defaultdict(list)
    for canon, dom in rows:
        path = re.sub(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "", canon) or "/"
        if py_allowed(ROBOTS_FIXTURE_BODY, "*", path):
            allowed[dom].append(canon)
    want = {}
    for dom, urls in allowed.items():
        order = sorted(urls, key=lambda u: (hashlib.md5(u.encode()).hexdigest(), u))
        want[dom] = (len(urls), min(len(urls), URL_CAP), 1.5)
    assert got == want
    # the policy really bites post-normalization: ?id= urls were
    # canonical (tracking params stripped, id kept), so some dropped
    total_candidates = sum(n for n, _, _ in got.values())
    n_canon = len(rows)
    assert 0 < total_candidates < n_canon


def test_fetch_schedule_spacing_and_boundedness(spark):
    """r12: fetch_schedule — per-HOST politeness spacing. Kept rows
    slot authority-first (rank desc, url tiebreak) per host; offsets
    are exact multiples of the host's crawl-delay (default when none);
    different hosts start at 0 in parallel; dropped (kept=false) rows
    never appear."""
    from mbfbigdatarandomforest_spark.plans.llm_ops import fetch_schedule

    frontier = spark.createDataFrame(
        [
            ("https://a.example/p1", "a.example", 0.7, 2.0, True),
            ("https://a.example/p2", "a.example", 0.7, 2.0, True),
            ("https://a.example/p3", "a.example", 0.7, 2.0, False),
            ("https://b.example/q1", "b.example", 0.3, None, True),
            ("https://b.example/q2", "b.example", 0.3, None, True),
        ],
        "url string, domain string, rank double, crawl_delay double, "
        "kept boolean",
    )
    got = {
        r["url"]: (r["host"], r["slot"], r["fetch_offset_s"])
        for r in fetch_schedule(frontier, default_delay=1.0).collect()
    }
    assert got == {
        "https://a.example/p1": ("a.example", 1, 0.0),
        "https://a.example/p2": ("a.example", 2, 2.0),  # declared 2.0
        "https://b.example/q1": ("b.example", 1, 0.0),  # parallel host
        "https://b.example/q2": ("b.example", 2, 1.0),  # default 1.0
    }  # p3 (kept=false) absent


def test_crawl_schedule_stats_vs_python_twin(spark, duck):
    """The registered schedule rollup (rows-only) against the full
    Python twin: the frontier twin's kept set, re-slotted per HOST in
    (rank desc → all-NULL here → url asc) order, offsets spaced by the
    fixture's 1.5 s budget."""
    import hashlib
    from collections import defaultdict

    from mbfbigdatarandomforest_spark.operators.urls import url_twin_sql
    from mbfbigdatarandomforest_spark.plans.llm_ops import (
        ROBOTS_FIXTURE_BODY,
        SYNTH_URL_SQL,
        URL_CAP,
    )
    from mbfbigdatarandomforest_spark.registry import load_all

    from conftest import SF_DIR_ORACLE

    spec = load_all()["crawl_schedule_stats"]
    assert spec.oracle is not None  # value-hash gate since r13
    got = {
        r["domain"]: (
            r["n_fetches"], r["max_slot"], r["makespan_s"], r["n_hosts"]
        )
        for _, r in spec.fn(spark, SF_DIR_ORACLE).toPandas().iterrows()
    }
    twin = url_twin_sql("url")
    rows = duck.sql(f"""
        SELECT DISTINCT {twin['normalized']} AS canon,
               {twin['registered_domain']} AS dom,
               {twin['host']} AS host
        FROM (SELECT {twin['normalized']} AS url FROM
              (SELECT {SYNTH_URL_SQL} AS url FROM documents))
    """).fetchall()
    per_dom = defaultdict(list)
    host_of = {}
    for canon, dom, host in rows:
        path = re.sub(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "", canon) or "/"
        if py_allowed(ROBOTS_FIXTURE_BODY, "*", path):
            per_dom[dom].append(canon)
            host_of[canon] = host
    want = {}
    for dom, urls in per_dom.items():
        order = sorted(
            urls, key=lambda u: (hashlib.md5(u.encode()).hexdigest(), u)
        )
        kept = order[:URL_CAP]
        by_host = defaultdict(list)
        for u in kept:
            by_host[host_of[u]].append(u)
        max_slot = max(len(v) for v in by_host.values())
        want[dom] = (
            len(kept),
            max_slot,
            round((max_slot - 1) * 1.5, 6),
            len(by_host),
        )
    assert got == want
    # the schedule really spaces: at least one host queues >1 fetch
    assert any(ms > 1 for _, ms, _, _ in got.values())


def test_recrawl_candidates_unit(spark):
    """r13 (verdict item 5): the recrawl operator on a crafted ledger —
    bumped lastmod re-enters as 'modified', an OLDER lastmod is no
    signal, age past the domain TTL re-enters as 'stale' (per-domain
    override honored), young+unchanged stays out, and a noise-variant
    sitemap loc still matches the canonical ledger URL."""
    from mbfbigdatarandomforest_spark.plans.llm_ops import (
        recrawl_candidates,
    )

    ledger = spark.createDataFrame(
        [
            ("https://a.example/fresh-bumped", "2024-02-20 00:00:00"),
            ("https://a.example/fresh-older-lastmod", "2024-02-20 00:00:00"),
            ("https://a.example/old-no-signal", "2024-01-01 00:00:00"),
            ("https://a.example/young-no-signal", "2024-02-25 00:00:00"),
            ("https://b.example/short-ttl", "2024-02-25 00:00:00"),
            # append-only ledger: an OLD row for a url re-fetched since
            # — only the LATEST schedule counts, so this must not make
            # re-fetched-recently look stale (nor let the 02-25 lastmod
            # below count as a bump against the superseded 01-01 row)
            ("https://a.example/re-fetched-recently", "2024-01-01 00:00:00"),
            ("https://a.example/re-fetched-recently", "2024-02-27 00:00:00"),
        ],
        "url string, scheduled_at string",
    )
    sitemaps = spark.createDataFrame(
        [
            # tracking param + trailing slash: normalization must match
            ("https://a.example/fresh-bumped/?utm_source=x", "2024-02-25"),
            ("https://a.example/fresh-older-lastmod", "2024-02-10"),
            ("https://a.example/re-fetched-recently", "2024-02-25"),
        ],
        "loc string, lastmod string",
    )
    ttl = spark.createDataFrame(
        [("b.example", 2.0)], "domain string, ttl_days double"
    )
    got = {
        r["url"]: (r["reason"], r["age_days"])
        for r in recrawl_candidates(
            ledger,
            sitemaps,
            as_of="2024-03-01 00:00:00",
            default_ttl_days=30.0,
            domain_ttl=ttl,
        ).collect()
    }
    assert set(got) == {
        "https://a.example/fresh-bumped",      # modified (bumped lastmod)
        "https://a.example/old-no-signal",     # stale (60 d > 30 d TTL)
        "https://b.example/short-ttl",         # stale (5 d > 2 d override)
    }
    assert got["https://a.example/fresh-bumped"][0] == "modified"
    assert got["https://a.example/old-no-signal"] == ("stale", 60.0)
    assert got["https://b.example/short-ttl"][0] == "stale"
    # as_of is mandatory — reproducibility contract
    import pytest as _pytest

    with _pytest.raises(ValueError, match="as_of is required"):
        recrawl_candidates(ledger)


def test_crawl_recrawl_stats_vs_python_twin(spark, duck):
    """The registered recrawl rollup (rows-only) against a full Python
    twin re-deriving the md5 fixture: scheduled_at = BASE + (md5 % 60)
    days, sitemap branch from a second md5 slice, modified-beats-stale
    reason resolution, exact per-domain counts and max age."""
    import hashlib
    from collections import defaultdict
    from datetime import datetime, timedelta

    from mbfbigdatarandomforest_spark.operators.urls import url_twin_sql
    from mbfbigdatarandomforest_spark.plans.llm_ops import (
        RECRAWL_AS_OF,
        RECRAWL_BASE_TS,
        RECRAWL_TTL_DAYS,
        SYNTH_URL_SQL,
    )
    from mbfbigdatarandomforest_spark.registry import load_all

    from conftest import SF_DIR_ORACLE

    spec = load_all()["crawl_recrawl_stats"]
    assert spec.oracle is None  # rows-only
    got = {
        r["domain"]: (
            r["n_due"], r["n_modified"], r["n_stale"], r["max_age_days"]
        )
        for _, r in spec.fn(spark, SF_DIR_ORACLE).toPandas().iterrows()
    }
    twin = url_twin_sql("url")
    rows = duck.sql(f"""
        SELECT DISTINCT {twin['normalized']} AS canon,
               {twin['registered_domain']} AS dom
        FROM (SELECT {SYNTH_URL_SQL} AS url FROM documents)
        WHERE {twin['normalized']} != ''
    """).fetchall()
    base = datetime.fromisoformat(RECRAWL_BASE_TS)
    as_of = datetime.fromisoformat(RECRAWL_AS_OF)
    acc: dict = defaultdict(lambda: [0, 0, 0, 0.0])
    for canon, dom in rows:
        md5 = hashlib.md5(canon.encode()).hexdigest()
        sched = base + timedelta(days=int(md5[:6], 16) % 60)
        b = int(md5[6:12], 16) % 3
        lastmod = (
            sched + timedelta(days=1) if b == 0
            else sched - timedelta(days=1) if b == 1
            else None
        )
        age = (as_of - sched).total_seconds() / 86400.0
        if lastmod is not None and lastmod > sched:
            reason = "modified"
        elif age > RECRAWL_TTL_DAYS:
            reason = "stale"
        else:
            continue
        a = acc[dom]
        a[0] += 1
        a[1] += reason == "modified"
        a[2] += reason == "stale"
        a[3] = max(a[3], age)
    want = {
        dom: (n, m, s, round(mx, 6)) for dom, (n, m, s, mx) in acc.items()
    }
    assert got == want
    # both reasons actually occur in the fixture
    assert any(m > 0 for _, m, _, _ in got.values())
    assert any(s > 0 for _, _, s, _ in got.values())


def test_crawl_frontier_robots_exempt_sitemaps(spark):
    """r14 (ADVICE r13): urls passed as robots_exempt — the
    convention's robots-DECLARED sitemap fetches — survive the
    frontier's path-rule filter even when the host's rules disallow
    their path; they still dedup and consume cap slots, and the same
    path stays blocked for ordinary candidates."""
    from mbfbigdatarandomforest_spark.plans.llm_ops import crawl_frontier

    rules = parse_robots(
        spark.createDataFrame(
            [("h.example", "User-agent: *\nDisallow: /maps\n")],
            "host string, body string",
        )
    )
    cands = spark.createDataFrame(
        [
            ("https://h.example/maps/sitemap.xml",),   # declared sitemap
            ("https://h.example/maps/sitemap.xml",),   # dup: must collapse
            ("https://h.example/maps/other-page",),    # ordinary: blocked
            ("https://h.example/allowed-page",),
        ],
        "url string",
    )
    exempt = spark.createDataFrame(
        [("https://h.example/maps/sitemap.xml",)], "url string"
    )
    got = {
        r["url"]
        for r in crawl_frontier(cands, rules, robots_exempt=exempt)
        .filter("kept")
        .collect()
    }
    assert got == {
        "https://h.example/maps/sitemap.xml",
        "https://h.example/allowed-page",
    }
    # without the exemption the sitemap is (wrongly, for this file
    # class) blocked — the behavior the flag exists to override
    got_plain = {
        r["url"]
        for r in crawl_frontier(cands, rules).filter("kept").collect()
    }
    assert got_plain == {"https://h.example/allowed-page"}


def test_pct_canonical_property_random_strings(spark):
    """Direct expression-level pin of pct_canonical ≡ py_canonical over
    adversarial random strings — partial %-sequences, metacharacters,
    unicode, both keep_meta modes — independent of the decision-level
    sweep (which only observes canonicalization through match
    outcomes)."""
    from pyspark.sql import functions as F

    from mbfbigdatarandomforest_spark.operators.robots import pct_canonical

    rng = np.random.default_rng(1441)
    alphabet = list("ab/%.2AfF $*?#=&~_ü日\t'\"\\<>^{}|")
    cases = [""]
    for _ in range(300):
        n = int(rng.integers(0, 14))
        cases.append(
            "".join(alphabet[int(j)] for j in rng.integers(0, len(alphabet), n))
        )
    # targeted traps alongside the fuzz
    cases += [
        "%", "%2", "%2f", "%2F", "%zz", "%2A%24", "a%", "%%41", "%41%42",
        "/a b/%20/%252F", "*$", "%c3%bc", "ü%C3%BC", "/x%GG", "%0a", "% 41",
        # mid-pattern vs trailing '$' (ADVICE r14 — fold vs anchor)
        "/mid$lit", "$", "$$", "a$b$", "$a", "%24$", "$%24",
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i long, s string")
    for keep_meta in (False, True):
        got = {
            r["i"]: r["c"]
            for r in df.select(
                "i", pct_canonical(F.col("s"), keep_meta=keep_meta).alias("c")
            ).collect()
        }
        for i, c in enumerate(cases):
            assert got[i] == py_canonical(c, keep_meta=keep_meta), (
                keep_meta, repr(c), got[i],
            )


def test_mid_pattern_dollar_spellings_rank_identically(spark):
    """ADVICE r14: '/mid$lit' and '/mid%24lit' are two spellings of ONE
    literal rule — their canonical forms are equal, so they rank
    identically (equal octets) in longest-match-wins, and the
    documented spelling-invariance claim holds for the '$' literal.
    The trailing raw '$' stays the live end anchor."""
    # expression-level: the two rule spellings canonicalize identically
    assert (
        py_canonical("/mid$lit", keep_meta=True)
        == py_canonical("/mid%24lit", keep_meta=True)
        == "/mid%24lit"
    )
    # trailing '$' is positional — it survives as the anchor
    assert py_canonical("/x$", keep_meta=True) == "/x$"
    # decision-level: equal-octet disallow/allow pair → tie → allow,
    # for BOTH rule spellings and BOTH path spellings, engine ≡ mirror
    host = "site.example"
    body = "User-agent: *\nDisallow: /mid$lit\nAllow: /mid%24lit\n"
    paths = ["/mid$lit", "/mid%24lit"]
    urls = [f"https://{host}{p}" for p in paths]
    got = _spark_decisions(spark, {host: body}, urls, "*")
    for u, p in zip(urls, paths):
        assert got[u] is True, u
        assert py_allowed(body, "*", p) is True, p
    # and flipped spellings give the same tie resolution
    body2 = "User-agent: *\nDisallow: /mid%24lit\nAllow: /mid$lit\n"
    got2 = _spark_decisions(spark, {host: body2}, urls, "*")
    for u, p in zip(urls, paths):
        assert got2[u] is True, u
        assert py_allowed(body2, "*", p) is True, p
