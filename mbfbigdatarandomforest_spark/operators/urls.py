"""URL operations for crawl curation (r10) — the filtering/diversity
layer every web-corpus pipeline runs between WARC ingestion and text
curation (C4/RefinedWeb-class URL normalization, domain extraction,
per-domain caps for corpus diversity).

Design rules, same as the PII/HTML chains: pure built-in expressions
(codegen, zero Python), and every pattern in the RE2∩Java subset with
NO replacement backrefs and NO lookaround (RE2 has neither), so the
SAME logic runs verbatim in the DuckDB twin. Where partial-lowercase /
port-stripping would need a backref replacement, the URL is instead
REBUILT from ``regexp_extract`` groups (group extraction is portable
even though replacement backrefs are not) — scheme and host lowered,
path/query case preserved.

Per-domain cap: an EXACT deterministic "first ``cap`` pages per
domain in md5 order" — md5 (not xxhash64) because both engines hash
identically, making the kept SET cross-engine reproducible. The rank
is computed skew-hardened: a hex-prefix salt of the md5 splits each
domain's window into ≤16ⁿ hash-RANGE buckets (string-prefix buckets
are exactly ranges of the string order, the ``global_row_number``
cut-literal argument applied per key), local row_number per bucket,
cumulative bucket offsets per domain over a ≤16ⁿ-row frame. No
single-task window on a hot domain — the blogspot problem.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_REST = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$"
#: params dropped by normalization (tracking noise — the C4 practice)
TRACKING_PARAM = r"(?:utm_[A-Za-z0-9_]+|fbclid|gclid|ref)"
#: ccTLD second-level registries for the registered-domain heuristic
_SECOND_LEVEL = r"(?:co|com|org|net|gov|ac|edu)"


def _col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_host(col: Column | str) -> Column:
    """Lowercased host without port/userinfo ('' for non-URLs)."""
    hostport = F.lower(F.regexp_extract(_col(col), _HOSTPORT, 1))
    # strip userinfo then port — extraction groups, no backrefs
    no_user = F.when(
        hostport.contains("@"), F.regexp_extract(hostport, r"@(.*)$", 1)
    ).otherwise(hostport)
    return F.regexp_extract(no_user, r"^([^:]*)", 1)


def url_registered_domain(col: Column | str) -> Column:
    """Registrable domain: last two host labels, or last three when the
    second-to-last is a known ccTLD second-level registry (co.uk,
    com.au, ...). Heuristic stand-in for the public-suffix list — the
    list rides one pattern literal and extends without code changes."""
    host = url_host(col)
    three = F.regexp_extract(
        host, r"([^.]+\." + _SECOND_LEVEL + r"\.[a-z]{2})$", 1
    )
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(three != "", three).when(two != "", two).otherwise(host)


def normalize_url(col: Column | str) -> Column:
    """Canonical URL: scheme+host lowercased (path/query case kept),
    userinfo dropped, default ports dropped (http:80 / https:443),
    fragment dropped, tracking params dropped, empty query and
    trailing slashes dropped. Rebuilt from extraction groups — one
    codegen projection, portable to the DuckDB twin verbatim."""
    c = _col(col)
    scheme = F.lower(F.regexp_extract(c, _SCHEME, 1))
    host = url_host(c)
    port = F.regexp_extract(
        F.lower(F.regexp_extract(c, _HOSTPORT, 1)), r":([0-9]+)$", 1
    )
    keep_port = (port != "") & ~(
        ((scheme == F.lit("http")) & (port == F.lit("80")))
        | ((scheme == F.lit("https")) & (port == F.lit("443")))
    )
    rest = F.regexp_extract(c, _REST, 1)
    rest = F.regexp_replace(rest, r"#.*$", "")  # fragment
    # tracking params, lookaround/backref-free, by position: non-first
    # occurrences ('&p=v'), then first-with-successor ('?p=v&' → '?'),
    # then sole param ('?p=v' at end) — the three cases partition all
    # placements once non-first ones are gone
    rest = F.regexp_replace(rest, r"&" + TRACKING_PARAM + r"=[^&#]*", "")
    rest = F.regexp_replace(rest, r"\?" + TRACKING_PARAM + r"=[^&#]*&", "?")
    rest = F.regexp_replace(rest, r"\?" + TRACKING_PARAM + r"=[^&#]*$", "")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    rest = F.regexp_replace(rest, r"/+$", "")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        rest,
    )


def url_twin_sql(expr: str) -> dict[str, str]:
    """DuckDB twins of the three URL expressions — the same patterns,
    the same rebuild; returns {'host', 'registered_domain',
    'normalized'} SQL strings over ``expr``."""
    hostport = f"lower(regexp_extract({expr}, '{_HOSTPORT}', 1))"
    no_user = (
        f"CASE WHEN contains({hostport}, '@') "
        f"THEN regexp_extract({hostport}, '@(.*)$', 1) ELSE {hostport} END"
    )
    host = f"regexp_extract({no_user}, '^([^:]*)', 1)"
    three = (
        f"regexp_extract({host}, '([^.]+\\.{_SECOND_LEVEL}\\.[a-z]{{2}})$', 1)"
    )
    two = f"regexp_extract({host}, '([^.]+\\.[^.]+)$', 1)"
    rd = (
        f"CASE WHEN {three} != '' THEN {three} "
        f"WHEN {two} != '' THEN {two} ELSE {host} END"
    )
    scheme = f"lower(regexp_extract({expr}, '{_SCHEME}', 1))"
    port = f"regexp_extract({hostport}, ':([0-9]+)$', 1)"
    keep_port = (
        f"({port} != '' AND NOT (({scheme} = 'http' AND {port} = '80') "
        f"OR ({scheme} = 'https' AND {port} = '443')))"
    )
    rest = f"regexp_extract({expr}, '{_REST}', 1)"
    rest = f"regexp_replace({rest}, '#.*$', '', 'g')"
    rest = f"regexp_replace({rest}, '&{TRACKING_PARAM}=[^&#]*', '', 'g')"
    rest = f"regexp_replace({rest}, '\\?{TRACKING_PARAM}=[^&#]*&', '?', 'g')"
    rest = f"regexp_replace({rest}, '\\?{TRACKING_PARAM}=[^&#]*$', '', 'g')"
    rest = f"regexp_replace({rest}, '[?&]+$', '', 'g')"
    rest = f"regexp_replace({rest}, '/+$', '', 'g')"
    normalized = (
        f"{scheme} || '://' || {host} || "
        f"(CASE WHEN {keep_port} THEN ':' || {port} ELSE '' END) || {rest}"
    )
    return {"host": host, "registered_domain": rd, "normalized": normalized}


def per_domain_cap(
    df: DataFrame,
    url_col: str = "url",
    cap: int = 100,
    domain_col: str | None = None,
    salt_hex_chars: int = 2,
    keep_col: str = "kept",
) -> DataFrame:
    """Deterministic exact per-domain page cap: keep the first ``cap``
    rows of each registered domain in (md5(url), url) order.

    Skew-hardened: the per-domain ranking window is split by the md5's
    first ``salt_hex_chars`` hex chars — hash-RANGE buckets, so local
    row numbers plus cumulative per-bucket offsets compose to the
    EXACT global per-domain rank (the ``global_row_number`` argument
    applied per key); per-task window state is one (domain, prefix)
    slice, never a whole hot domain. Oracle: ROW_NUMBER() OVER
    (PARTITION BY domain ORDER BY md5(url), url) <= cap, which DuckDB
    reproduces bit-for-bit (md5 is engine-portable; xxhash64 is not).

    Adds ``__domain`` (if not supplied) and boolean ``keep_col``."""
    dom = F.col(domain_col) if domain_col else url_registered_domain(url_col)
    h = F.md5(F.col(url_col))
    salted = df.withColumns(
        {
            "__domain": dom,
            "__h": h,
            "__salt": F.substring(h, 1, salt_hex_chars),
        }
    )
    w_local = Window.partitionBy("__domain", "__salt").orderBy(
        "__h", url_col
    )
    local = salted.withColumn("__rn", F.row_number().over(w_local))
    # offsets: per (domain, salt) counts, cumulative over the ≤16ⁿ
    # salts of each domain — a tiny frame regardless of corpus size
    w_off = (
        Window.partitionBy("__domain")
        .orderBy("__salt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        salted.groupBy("__domain", "__salt")
        .agg(F.count(F.lit(1)).alias("__c"))
        .withColumn("__off", F.coalesce(F.sum("__c").over(w_off), F.lit(0)))
        .select("__domain", "__salt", "__off")
    )
    return (
        local.join(offsets, ["__domain", "__salt"])
        .withColumn(keep_col, (F.col("__rn") + F.col("__off")) <= cap)
        .drop("__h", "__salt", "__rn", "__off")
    )
