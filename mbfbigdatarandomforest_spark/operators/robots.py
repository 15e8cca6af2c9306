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

User-agent resolution (r13): the reference-parser FAMILY LADDER, a
deliberate superset of RFC 9309 §2.2.1's exact case-insensitive
product-token match. A group governs a crawler when its agent token
is a case-insensitive PREFIX of the crawler's product token — the
family matching deployed reference parsers apply (googlebot matches
googlebot-news; a bare ``bot`` token does NOT capture ``corpusbot``
off its suffix); among matching tokens the most specific — most
octets — wins, and groups naming the SAME winning token COMBINE (the
RFC's multiple-matching-groups merge); ``*`` remains the no-match
fallback tier. Strict-RFC exact matching is the special case where
only full-token prefixes occur, so a ``corpus`` group governing
crawler ``corpusreader`` is ladder behavior the RFC itself would not
mandate (r13 advice — documented, kept). ``allow``/``disallow``
patterns support the full RFC wildcard grammar (``*`` any-sequence,
``$`` end-anchor, longest-pattern-wins, allow wins ties);
``crawl-delay`` and ``sitemap`` lines are surfaced as rows, not
interpreted.

Percent-encoding normalization (r14 — RFC 9309 §2.2.2, the last RFC
leg, closed): rule patterns and URL paths are both rewritten to ONE
canonical percent-encoding before comparison (:func:`pct_canonical`):
percent-encoded UNRESERVED octets (RFC 3986 ALPHA / DIGIT / ``-._~``)
are decoded (``%62az`` ≡ ``baz``), every other retained ``%XX`` keeps
uppercase hex (``%2f`` ≡ ``%2F``), and raw characters outside the
canonical-raw set — spaces, quotes, stray ``%``, non-ASCII — are
percent-encoded from their UTF-8 octets (``/a b`` ≡ ``/a%20b``, both
directions). Reserved characters (``%2F`` vs ``/``, ``%3F`` vs ``?``)
stay DISTINCT, as RFC 3986 §2.2 requires — an encoded slash is not a
path separator. The two pattern metacharacters survive faithfully:
in a RULE a raw ``*`` is the wildcard and a trailing raw ``$`` the
anchor, while published ``%2A``/``%24`` stay encoded and match a
path's literal ``*``/``$`` (which the path side canonicalizes to
``%2A``/``%24``); a mid-pattern raw ``$`` is a literal and is folded
to ``%24`` in the CANONICAL form itself (ADVICE r14), so the two
spellings of one literal rule rank identically in longest-match-wins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .urls import url_host

#: RFC 3986 §2.3 unreserved characters — the ONLY octets §2.2.2 says
#: to percent-DECODE (an encoded reserved character is semantically
#: distinct from its raw form: %2F is not a path separator).
_UNRESERVED_CLASS = "A-Za-z0-9._~\\-"
#: Characters kept RAW in the canonical form: unreserved plus the
#: gen-delims / sub-delims that appear raw in a path-query string.
#: '%' is excluded (always the encoding trigger — a stray one is
#: encoded to %25); '*' and '$' are excluded and handled per side
#: (pattern metacharacters in rules, encoded literals in paths).
_RAW_KEEP_CLASS = "A-Za-z0-9._~:/?#@!&'()+,;=\\[\\]\\-"


def _pct_encode_raw(col: Column, keep_meta: bool) -> Column:
    """Percent-encode every character outside the canonical-raw set
    from its UTF-8 octets (uppercase hex — ``F.hex`` is uppercase by
    contract), keeping canonical-raw characters as-is. Runs AFTER the
    retained-%XX pass, so any ``%`` seen here is a stray literal and
    encodes to ``%25`` unambiguously. Per-character ``transform`` over
    short policy/path strings — pure codegen expressions, no Python."""
    keep = _RAW_KEEP_CLASS + ("*$" if keep_meta else "")
    keep_re = f"^[{keep}]$"
    return F.array_join(
        F.transform(
            F.split(col, ""),
            lambda c: F.when(c.rlike(keep_re) | (c == F.lit("")), c).otherwise(
                F.regexp_replace(F.hex(F.encode(c, "UTF-8")), "(..)", r"%$1")
            ),
        ),
        "",
    )


def pct_canonical(col: Column, keep_meta: bool = False) -> Column:
    """RFC 9309 §2.2.2 canonical percent-encoding of a rule pattern or
    URL path (module docstring): decode percent-encoded UNRESERVED
    octets, uppercase the hex of every other retained ``%XX``, and
    percent-encode raw characters outside the canonical-raw set from
    their UTF-8 octets. ``keep_meta`` keeps raw ``*``/``$`` untouched
    (rule side — they are pattern metacharacters); the path side
    encodes them to ``%2A``/``%24`` so a rule's literal ``%2A`` matches
    a path's literal ``*`` without colliding with the live wildcard.

    ONE split pass bounds the work: segments open at each valid ``%XX``
    (lookahead split — no double-decode: a decode can never mint a new
    ``%XX``), the triplet is decoded or case-fixed, the tail goes
    through the raw-character pass. All column expressions.

    ``keep_meta`` position rule (ADVICE r14): only a TRAILING raw
    ``$`` is the live end anchor — a mid-pattern raw ``$`` is a
    literal, so it folds to its canonical ``%24`` HERE, making the two
    spellings of one literal rule (``/mid$lit`` / ``/mid%24lit``) rank
    identically in longest-match-wins octet counting."""
    if keep_meta:
        col = F.regexp_replace(col, r"\$(?!\z)", "%24")
    segs = F.split(col, r"(?=%[0-9A-Fa-f]{2})")

    def _seg(s: Column) -> Column:
        has = s.rlike("^%[0-9A-Fa-f]{2}")
        hexs = F.upper(F.substring(s, 2, 2))
        ch = F.char(F.conv(hexs, 16, 10).cast("int"))
        prefix = (
            F.when(~has, F.lit(""))
            .when(ch.rlike(f"^[{_UNRESERVED_CLASS}]$"), ch)
            .otherwise(F.concat(F.lit("%"), hexs))
        )
        tail = F.when(has, F.substring(s, 4, 2_000_000_000)).otherwise(s)
        return F.concat(prefix, _pct_encode_raw(tail, keep_meta))

    return F.array_join(F.transform(segs, _seg), "")


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
    # rule pattern → anchored Java regex over the CANONICAL form
    # (§2.2.2, r14 — keep_meta keeps a raw '*' anywhere and a raw '$'
    # at the pattern END as live metacharacters; a mid-pattern raw '$'
    # is a literal and pct_canonical already folded it to %24, so the
    # canonical form used for RANKING and the regex agree — ADVICE
    # r14): escape specials via the $1 backref (Java replacement — the
    # pytest oracle is pure Python, no cross-SQL twin needed here),
    # then '*' anywhere = any sequence; the only '$' that can survive
    # canonicalization is the trailing anchor (escaped with everything
    # else first, then un-escaped back into the live anchor).
    canon = pct_canonical(F.col("value"), keep_meta=True)
    pat = F.regexp_replace(canon, r"([.^+?(){}\[\]\\|$])", r"\\$1")
    pat = F.regexp_replace(pat, r"\*", ".*")
    pat = F.regexp_replace(pat, r"\\\$$", "\\$")
    pattern_re = F.concat(F.lit("^"), pat)
    return rules.select(
        "host",
        "group_id",
        F.coalesce("agents", F.array()).alias("agents"),
        "directive",
        "value",
        # the canonical form rides along: longest-match ranking uses
        # its octets, and recomputing the per-character
        # canonicalization at every agent resolution would duplicate
        # work done here at parse time (r14 review finding 4)
        F.when(
            F.col("directive").isin("allow", "disallow"), canon
        ).alias("pattern_canon"),
        F.when(
            F.col("directive").isin("allow", "disallow"), pattern_re
        ).alias("pattern_re"),
        "pos",
    )


def _agent_match_len(agent_lower: str) -> Column:
    """Octet length of the BEST group token matching the crawler's
    product token on each rule row — the reference-parser family
    ladder (r13; a documented superset of RFC 9309 §2.2.1's exact
    case-insensitive token match — module docstring): a
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
        # longest-match ranks octets of the CANONICAL pattern (r14 —
        # §2.2.2: two spellings of one rule must rank identically);
        # computed once at parse time (parse_robots), selected here
        "pattern_canon",
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
        .select("host", "directive", "pattern", "pattern_canon", "pattern_re")
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

    RFC 9309 §2.2.2 resolution, distributed: URL paths are rewritten
    to the canonical percent-encoding (:func:`pct_canonical` — rules
    were canonicalized at parse time), URLs equi-join their host's
    governing rules, matching rules survive an rlike filter, and ONE
    window picks the longest matched pattern (OCTET length of the
    CANONICAL pattern — the RFC's most-octets wording, so multi-byte
    UTF-8 patterns rank as a byte-counting crawler would and two
    spellings of one rule rank identically; tie → allow wins). Hosts
    with no rules, or URLs matching no rule, are allowed. Empty-value
    ``disallow:`` lines match nothing (the RFC's allow-all idiom) —
    their regex is ``^`` with length 0 and empty patterns are dropped
    below."""
    per_agent = _agent_rules(rules, agent).filter(F.col("pattern") != "")
    u = urls.withColumn("__host", url_host(url_col)).withColumn(
        "__path",
        pct_canonical(
            F.coalesce(
                F.nullif(
                    F.regexp_extract(
                        F.col(url_col),
                        r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$",
                        1,
                    ),
                    F.lit(""),
                ),
                F.lit("/"),
            ),
            keep_meta=False,
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
                    F.octet_length("pattern_canon").alias("l"),
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
