"""robots.txt crawl policy (r11) — the fetch-permission layer every
polite crawler runs between URL curation and the frontier (RFC 9309,
the Robots Exclusion Protocol; C4/CCNet-class corpora are built from
robots-respecting crawls).

Spark-first shape: robots bodies are SMALL per-host documents, so
parsing is line explode + regexp extraction (pure column expressions,
one codegen pass after the explode), group assignment is a per-host
window over line position (one robots file per host — the partition is
bounded by the file's line count, never corpus-sized), and permission
checks are a host-equi-join of URLs against the host's rule set with
the RFC's longest-match-wins resolved by one window. No Python in any
path.

User-agent resolution (r13 — the last collapsed RFC leg, closed):
full product-token matching. A group governs a crawler when its agent
token is a case-insensitive PREFIX of the crawler's product token —
the family matching reference implementations apply (googlebot
matches googlebot-news; a bare ``bot`` token does NOT capture
``corpusbot`` off its suffix); among matching tokens the most
specific — most octets — wins, and groups naming the SAME winning
token COMBINE (RFC 9309 §2.2.1's multiple-matching-groups merge);
``*`` remains the no-match fallback tier. ``allow``/``disallow`` patterns
support the full RFC wildcard grammar (``*`` any-sequence, ``$``
end-anchor, longest-pattern-wins, allow wins ties); ``crawl-delay``
and ``sitemap`` lines are surfaced as rows, not interpreted.

Documented limit (r13): RFC 9309 §2.2.2's percent-encoding
normalization (decode non-%2F octets on both sides before comparison)
is NOT applied — rules and paths compare in their as-published
encoding, so a rule spelled ``/a b`` does not match a URL spelled
``/a%20b`` (or vice versa). Mixed-encoding pairs are rare in practice
(published rules overwhelmingly match the encoding sites emit), and
the mismatch direction is allow-biased — an unmatched ``disallow``
allows — so the failure mode is over-fetching a blocked path, never
silently dropping an allowed one. A faithful fix must also keep
``%2A``/``%24`` distinct from the live ``*``/``$`` metacharacters
through the regex translation; carried as backlog at this definition
site.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .urls import url_host


def parse_robots(
    df: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """(host, robots-body) → one row per directive:
    (host, group_id, agent, directive, value, pattern_re, pos).

    Group semantics (RFC 9309 §2.1): one or more consecutive
    ``user-agent`` lines open a group; the allow/disallow lines that
    follow belong to every agent named in that opening run. ``agent``
    is therefore an ARRAY on rule rows (the agents of the owning
    group); ``pattern_re`` is the Java-regex translation of the rule
    path pattern (specials escaped, ``*`` → ``.*``, trailing ``$``
    kept as the anchor), anchored at path start."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), r"\r?\n")).alias("pos", "raw"),
    ).select(
        "host",
        "pos",
        F.trim(F.regexp_replace("raw", r"#.*$", "")).alias("line"),
    )
    parsed = lines.filter(F.col("line") != "").select(
        "host",
        "pos",
        F.lower(F.trim(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1))).alias(
            "directive"
        ),
        F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:(.*)$", 1)).alias(
            "value"
        ),
    ).filter(F.col("directive") != "")

    w = Window.partitionBy("host").orderBy("pos")
    is_ua = (F.col("directive") == "user-agent").cast("int")
    # a group opens where a user-agent line follows a non-user-agent
    # line (or the file start)
    opens = (
        (F.col("directive") == "user-agent")
        & (
            F.coalesce(F.lag("directive").over(w), F.lit("")) != "user-agent"
        )
    ).cast("int")
    grouped = parsed.withColumn(
        "group_id", F.sum(opens).over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("is_ua", is_ua)

    # the agents of each group (the opening user-agent run)
    agents = (
        grouped.filter(F.col("is_ua") == 1)
        .groupBy("host", "group_id")
        .agg(F.array_sort(F.collect_set(F.lower("value"))).alias("agents"))
    )
    rules = grouped.filter(F.col("is_ua") == 0).join(
        agents, ["host", "group_id"], "left"
    )
    # rule pattern → anchored Java regex: escape specials via the $1
    # backref (Java replacement — the pytest oracle is pure Python, no
    # cross-SQL twin needed here), then the RFC's two metacharacters:
    # '*' anywhere = any sequence; '$' is the end anchor ONLY at the
    # pattern's end (escaped with everything else first, a trailing
    # escaped one un-escaped back into the anchor)
    pat = F.regexp_replace(F.col("value"), r"([.^+?(){}\[\]\\|$])", r"\\$1")
    pat = F.regexp_replace(pat, r"\*", ".*")
    pat = F.regexp_replace(pat, r"\\\$$", "\\$")
    pattern_re = F.concat(F.lit("^"), pat)
    return rules.select(
        "host",
        "group_id",
        F.coalesce("agents", F.array()).alias("agents"),
        "directive",
        "value",
        F.when(
            F.col("directive").isin("allow", "disallow"), pattern_re
        ).alias("pattern_re"),
        "pos",
    )


def _agent_match_len(agent_lower: str) -> Column:
    """Octet length of the BEST group token matching the crawler's
    product token on each rule row — RFC 9309 §2.2.1 matching (r13): a
    token matches when it is a case-insensitive PREFIX of the
    crawler's token (``*`` and '' never match here — ``*`` is the
    fallback tier, an empty token a malformed line); 0 when none do.
    Most-octets ranking mirrors the path-rule ranker: the most
    specific group wins, the ladder crawler docs publish
    (googlebot-news > googlebot > ``*``). Prefix, not substring —
    substring-anywhere would let a generic ``bot`` group capture every
    ``*bot`` crawler off the permissive ``*`` tier (review r13)."""
    agent_lit = F.lit(agent_lower)

    def _matches(t: Column) -> Column:
        return (
            (t != F.lit("*")) & (t != F.lit(""))
            & F.startswith(agent_lit, t)
        )

    return F.coalesce(
        F.array_max(
            F.transform(F.filter(F.col("agents"), _matches), F.octet_length)
        ),
        F.lit(0),
    )


def _host_best_agent_match(rules: DataFrame, agent_lower: str) -> DataFrame:
    """(host, __best): the longest matching group-token octet length
    across ALL the host's directive rows (0 = no group matches — the
    ``*`` tier governs). Membership is decided across the FULL group
    set, not caller-filtered rows: a delay-only matching group still
    suppresses the ``*`` group's path rules (its empty rule set means
    allow-all) — the r11 tier-mixing fix, generalized from exact-token
    to the prefix ladder."""
    return rules.groupBy("host").agg(
        F.max(_agent_match_len(agent_lower)).alias("__best")
    )


def _agent_rules(rules: DataFrame, agent: str) -> DataFrame:
    """The allow/disallow rules governing ``agent`` per host: the
    groups whose token ties the host's LONGEST product-token match
    when any group matches (equal-length winners combine — the RFC's
    multi-group merge), else its ``*`` groups (module docstring). Tier
    selection comes from :func:`_host_best_agent_match` — full group
    membership — so a delay-only matching group yields ZERO path rules
    here (allow-all), never the ``*`` group's rules."""
    a = agent.lower()
    r = rules.filter(F.col("directive").isin("allow", "disallow")).select(
        "host",
        "directive",
        F.col("value").alias("pattern"),
        "pattern_re",
        _agent_match_len(a).alias("__mlen"),
        F.array_contains("agents", "*").alias("__star"),
    )
    return (
        r.join(_host_best_agent_match(rules, a), "host")
        .filter(
            ((F.col("__mlen") == F.col("__best")) & (F.col("__best") > 0))
            | (F.col("__star") & (F.col("__best") == 0))
        )
        .select("host", "directive", "pattern", "pattern_re")
    )


def parse_sitemaps(
    df: DataFrame,
    body_col: str = "body",
    keep_cols: tuple[str, ...] = ("host",),
) -> DataFrame:
    """Sitemap XML (sitemaps.org protocol) → one row per entry:
    (*keep_cols, loc, lastmod, is_index). Handles both ``<urlset>``
    pages (is_index false — frontier candidates) and ``<sitemapindex>``
    files (is_index true — fetch next); entries are the ``<url>`` /
    ``<sitemap>`` blocks, ``loc``/``lastmod`` extracted per block with
    the 5 standard XML entities decoded in ``loc`` (sitemaps escape
    ``&`` in URLs). Pure column expressions: one ``regexp_extract_all``
    block explode + per-block extraction — the html_links posture, no
    XML parser in the task path (protocol sitemaps are flat; a
    DOM-grade parser would be a per-row Python UDF for no added
    fields)."""
    c = F.col(body_col)
    blocks = F.regexp_extract_all(
        c, F.lit(r"(?is)<(?:url|sitemap)\b[^>]*>(.*?)</(?:url|sitemap)\s*>"), 1
    )
    is_index = c.rlike(r"(?is)<sitemapindex[\s>]")
    out = df.select(
        *keep_cols,
        is_index.alias("is_index"),
        F.explode(blocks).alias("__block"),
    )
    loc = F.trim(
        F.regexp_extract(F.col("__block"), r"(?is)<loc\s*>(.*?)</loc\s*>", 1)
    )
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&amp;", "&"),
    ):
        loc = F.replace(loc, F.lit(ent), F.lit(ch))
    lastmod = F.nullif(
        F.trim(
            F.regexp_extract(
                F.col("__block"), r"(?is)<lastmod\s*>(.*?)</lastmod\s*>", 1
            )
        ),
        F.lit(""),
    )
    return (
        out.select(
            *keep_cols,
            loc.alias("loc"),
            lastmod.alias("lastmod"),
            "is_index",
        )
        .filter(F.col("loc") != "")
    )


def agent_crawl_delay(rules: DataFrame, agent: str = "*") -> DataFrame:
    """(host, crawl_delay) for the group governing ``agent`` — the
    politeness budget a frontier scheduler spaces fetches by. Same
    most-specific-token-else-star selection as the permission rules;
    several delay lines in scope → the max (conservative); non-numeric
    values dropped (try_cast)."""
    a = agent.lower()
    d = rules.filter(F.col("directive") == "crawl-delay").select(
        "host",
        F.expr("try_cast(value AS DOUBLE)").alias("delay"),
        _agent_match_len(a).alias("__mlen"),
        F.array_contains("agents", "*").alias("__star"),
    ).filter(F.col("delay").isNotNull())
    return (
        # same full-membership tier selection as _agent_rules: a host
        # whose governing group declares only path rules gets NO delay
        # (that group has none), never the * group's delay
        d.join(_host_best_agent_match(rules, a), "host")
        .filter(
            ((F.col("__mlen") == F.col("__best")) & (F.col("__best") > 0))
            | (F.col("__star") & (F.col("__best") == 0))
        )
        .groupBy("host")
        .agg(F.max("delay").alias("crawl_delay"))
    )


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    out_col: str = "allowed",
) -> DataFrame:
    """Adds boolean ``out_col``: may ``agent`` fetch each URL under the
    parsed ``rules`` (:func:`parse_robots` output)?

    RFC 9309 §2.2.2 resolution, distributed: URLs equi-join their
    host's governing rules, matching rules survive an rlike filter,
    and ONE window picks the longest matched pattern (OCTET length —
    ``octet_length``, the RFC's most-octets wording, so multi-byte
    UTF-8 patterns rank as a byte-counting crawler would; tie → allow
    wins). Hosts with no rules, or URLs matching no rule, are allowed.
    Empty-value ``disallow:`` lines match nothing (the RFC's allow-all
    idiom) — their regex is ``^`` with length 0 and empty patterns are
    dropped below."""
    per_agent = _agent_rules(rules, agent).filter(F.col("pattern") != "")
    u = urls.withColumn("__host", url_host(url_col)).withColumn(
        "__path",
        F.coalesce(
            F.nullif(
                F.regexp_extract(
                    F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1
                ),
                F.lit(""),
            ),
            F.lit("/"),
        ),
    )
    matched = (
        u.join(per_agent, u["__host"] == per_agent["host"], "inner")
        .filter(F.expr("__path rlike pattern_re"))
        .groupBy(url_col)
        .agg(
            # longest match wins; ties → allow: rank by (octets, is_allow)
            F.max(
                F.struct(
                    F.octet_length("pattern").alias("l"),
                    (F.col("directive") == "allow").alias("a"),
                )
            ).alias("best")
        )
        .select(url_col, F.col("best.a").alias("__allow_won"))
    )
    return (
        urls.join(matched, url_col, "left")
        .withColumn(out_col, F.coalesce("__allow_won", F.lit(True)))
        .drop("__allow_won")
    )
