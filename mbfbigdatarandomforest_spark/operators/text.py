"""Text-analysis operators for LLM-training-data pipelines (north-star
extension; BASELINE.json). All hot-path expressions are built-in Spark
functions (JVM, codegen) — no Python UDFs — so they run at 100 TB scan
speed.
"""

from __future__ import annotations

import heapq as _heapq
import re as _re
from bisect import bisect_left as _bisect_left
from bisect import insort as _insort

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker vocabularies for the n-gram/stopword heuristic
# language ID. Deliberately deterministic and SQL-expressible so the
# DuckDB oracle can replicate the classification exactly.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "with", "from"],
    "de": ["der", "und", "nicht", "das"],
    "fr": ["le", "et", "les", "des"],
    "es": ["el", "los", "por", "como"],
    "zh": ["的", "是", "了", "在"],
}

TOKEN_PATTERN = r"\s+"


def tokens(col: Column | str) -> Column:
    """THE whitespace-tokenization contract shared by dedup, the bigram
    LM, and DSIR gram hashing (and mirrored by every DuckDB ``_TOKS``
    twin): lowercase, trim, split on runs of whitespace, drop the empty
    boundary tokens tab/newline padding produces. One definition — a
    change here moves every consumer (and must move the SQL twins) in
    lockstep."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(F.lower(c)), TOKEN_PATTERN), lambda t: t != "")


# BPE-ish word/punct splitter used for token estimation.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def whitespace_token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, TOKEN_PATTERN))
    )


def bpe_ish_token_count(col: Column | str) -> Column:
    """Counts letter-runs, digit-runs and single punctuation marks — a
    deterministic proxy for BPE token counts."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0))


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return punct / F.greatest(F.length(c), F.lit(1))


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Share of whitespace tokens that are (English) stopwords — a
    quality-score component."""
    c = F.col(col) if isinstance(col, str) else col
    words = stopwords or LANG_MARKERS["en"]
    toks = F.split(F.trim(F.lower(c)), TOKEN_PATTERN)
    hits = F.size(F.filter(toks, lambda t: t.isin(words)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword quality features per document."""
    return df.withColumns(
        {
            "n_chars_q": F.length(text_col),
            "n_tokens": whitespace_token_count(text_col),
            "n_tokens_bpe": bpe_ish_token_count(text_col),
            "punct_ratio": punct_ratio(text_col),
            "stopword_ratio": stopword_ratio(text_col),
        }
    )


def marker_pattern(words: list[str]) -> str:
    """Regex for any marker word. Space-delimited (ASCII) vocabularies
    get ``\\b`` anchors so 'the' does not match inside 'other'; CJK
    markers stay boundary-free (regex \\b is ASCII-word based, so it
    would never match between two CJK characters)."""
    alternation = "(" + "|".join(words) + ")"
    if all(w.isascii() for w in words):
        return r"\b" + alternation + r"\b"
    return alternation


def marker_count(col: Column | str, words: list[str]) -> Column:
    """Occurrences of any marker word (word-boundary matched for ASCII
    vocabularies)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(marker_pattern(words)), 0))


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "pred_lang") -> DataFrame:
    """Marker-vocabulary language ID. Ties broken by language code order
    (deterministic). Pure codegen expressions — one scan."""
    scores = [
        F.struct(
            marker_count(text_col, words).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    # max over structs: compares score first, then lang; to make the tie
    # break ascending-by-lang on equal scores we invert via array_max on
    # (score, reversed-rank) — simpler: reduce with explicit when-chain.
    arr = F.array(*scores)
    best = F.aggregate(
        arr,
        F.struct(F.lit(-1).alias("score"), F.lit("").alias("lang")),
        lambda acc, x: F.when(x["score"] > acc["score"], x).otherwise(acc),
    )
    return df.withColumn(out_col, best["lang"])


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_df: int = 2,
    vocab_size: int = 1 << 16,
) -> DataFrame:
    """TF-IDF top-k terms per document (SURVEY.md §7 M8: Tokenizer →
    CountVectorizer → IDF). CountVectorizer (not HashingTF) so indices
    map back to real terms; vocabulary is ordered by corpus frequency —
    deterministic given the data. Returns (id, term, tfidf, rank)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import CountVectorizer, IDF, RegexTokenizer
    from pyspark.sql import Window

    tok = RegexTokenizer(
        inputCol=text_col, outputCol="__toks", pattern=r"\s+", toLowercase=True
    )
    cv = CountVectorizer(
        inputCol="__toks", outputCol="__tf", vocabSize=vocab_size, minDF=float(min_df)
    )
    idf = IDF(inputCol="__tf", outputCol="__tfidf")
    model = Pipeline(stages=[tok, cv, idf]).fit(df)
    vocab = model.stages[1].vocabulary
    spark = df.sparkSession
    vocab_df = spark.createDataFrame(
        list(enumerate(vocab)), ["term_idx", "term"]
    )

    scored = model.transform(df).select(
        F.col(id_col).alias("id"), F.col("__tfidf")
    )
    # sparse vector → (index, value) pairs without Python UDFs: indices
    # and values surface as arrays via the vector's JSON representation
    # is awkward — use vector_to_array + posexplode on nonzeros instead
    from pyspark.ml.functions import vector_to_array

    dense = scored.select(
        "id", F.posexplode(vector_to_array("__tfidf")).alias("term_idx", "tfidf")
    ).filter(F.col("tfidf") > 0)
    # tie-break on the term STRING (not the vocabulary index): vocab
    # order is a corpus-frequency artifact of CountVectorizer, while
    # the term itself is engine-independent — this keeps the ranking
    # reproducible by any SQL engine computing the same tf·idf
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("term"))
    topk = (
        dense.join(F.broadcast(vocab_df), "term_idx")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col),
            "term",
            F.round("tfidf", 6).alias("tfidf"),
            F.col("rank").cast("long").alias("rank"),
        )
    )
    return topk


# PII patterns — shared by the Spark expressions and the DuckDB oracle
# SQL, so they are restricted to the regex subset Java and RE2 agree on
# (no backreferences, no lookaround).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_PATTERN = r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"


def pii_count(col: Column | str, pattern: str) -> Column:
    """Occurrences of one PII pattern — a per-document risk signal a
    training-data pipeline filters or redacts on."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), 0))


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "text_redacted"
) -> DataFrame:
    """Replace emails / IPv4 addresses / phone numbers with typed
    placeholder tokens and count what was redacted. Pure
    ``regexp_replace`` chain — codegen, scan-speed; the counts let the
    pipeline route high-PII documents to review instead of silently
    rewriting them."""
    c = F.col(text_col)
    redacted = F.regexp_replace(c, EMAIL_PATTERN, "<EMAIL>")
    redacted = F.regexp_replace(redacted, IPV4_PATTERN, "<IP>")
    redacted = F.regexp_replace(redacted, PHONE_PATTERN, "<PHONE>")
    return df.withColumns(
        {
            "n_emails": pii_count(c, EMAIL_PATTERN),
            "n_ipv4": pii_count(c, IPV4_PATTERN),
            "n_phones": pii_count(c, PHONE_PATTERN),
            out_col: redacted,
        }
    )


# --------------------------------------------------------------------------
# HTML → text extraction (r10): the step between WARC record bodies and
# the curation funnel — "crawl dump → records → HTML → text" becomes a
# complete in-repo story (sources/warc.py cites it). Same design rules
# as the PII scrub: ONE codegen regexp_replace projection, zero Python
# in the hot path, patterns restricted to the RE2∩Java subset so the
# DuckDB twin in tests runs the SAME chain. This is deliberately the
# boilerplate-stripping CLASS of extractor (jusText/trafilatura solve a
# harder readability problem with DOM parsing — that would be a per-row
# Python UDF, the slow path, for a quality gain the downstream Gopher/
# quality filters already partly recover).
# --------------------------------------------------------------------------
#: (pattern, replacement) chain — ORDER IS THE CONTRACT (mirrored by
#: html_twin_sql consumers in tests). Blocks whose CONTENT must vanish
#: go first; entity decode runs after tag stripping ('&amp;' last so
#: double-encoded entities decode exactly one level, the single-pass
#: convention).
#: whitespace normalization (the chain's tail, shared with
#: ``normalize_ws`` so the WARC/HTML roundtrip oracle can normalize
#: the source text identically): horizontal runs → one space, spaces
#: around newlines dropped, ≥3 newlines → paragraph break.
WS_NORM_CHAIN: tuple[tuple[str, str], ...] = (
    (r"[ \t\r\f]+", " "),
    (r" *\n *", "\n"),
    (r"\n{3,}", "\n\n"),
    # SQL trim() strips only spaces — newlines need the anchored strip
    (r"^\s+|\s+$", ""),
)

HTML_STRIP_CHAIN: tuple[tuple[str, str], ...] = (
    (r"(?is)<script\b[^>]*>.*?</script\s*>", " "),
    (r"(?is)<style\b[^>]*>.*?</style\s*>", " "),
    (r"(?is)<head\b[^>]*>.*?</head\s*>", " "),
    (r"(?s)<!--.*?-->", " "),
    # block-level closers and <br> become newlines so paragraphs survive
    (r"(?i)</(?:p|div|h[1-6]|li|tr|table|ul|ol|blockquote)\s*>|<br\s*/?>", "\n"),
    (r"<[^>]*>", " "),
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&amp;", "&"),
) + WS_NORM_CHAIN


def html_to_text(
    df: DataFrame, html_col: str = "html", out_col: str = "text"
) -> DataFrame:
    """Extract visible text from an HTML column: script/style/head and
    comments dropped wholesale, block boundaries kept as newlines,
    remaining tags stripped, the five standard entities decoded,
    whitespace normalized. One whole-stage-codegen projection — at
    100 TB this composes into the ingest funnel without adding a
    stage (the ``scrub_pii`` posture)."""
    c: Column = F.col(html_col)
    for pat, repl in HTML_STRIP_CHAIN:
        c = F.regexp_replace(c, pat, repl)
    return df.withColumn(out_col, F.trim(c))


def html_title(col: Column | str) -> Column:
    """<title> text (head is dropped by the body chain, so the title is
    extracted separately — the two-field contract real extractors
    emit)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_extract(c, r"(?is)<title[^>]*>(.*?)</title\s*>", 1))


#: Tag-attribute scan between '<a' and the href attribute (r13): plain
#: chars ([^>'"] — '<' stays legal, as the r11 [^>] class allowed) OR a
#: complete quoted attribute value, so a '>' INSIDE a quoted value
#: (title="a>b") no longer ends the scan early — one of the two r12
#: documented limits, closed. Quoted chunks stop at '<' so an
#: unbalanced quote can't bridge into later tags.
_TAG_ATTR_SKIP = "(?:[^>'\"]|\"[^\"<]*\"|'[^'<]*')*?"

#: href value, ONE capture group, quotes INCLUDED when present: a full
#: double/single-quoted value (spaces legal — the other r12 limit,
#: closed r13; '<'/'>' are not URL characters and bound the chunk) or
#: a bare value up to whitespace/quote/'>'. :func:`_strip_href_quotes`
#: unwraps + trims — browsers strip leading/trailing whitespace from
#: quoted URL attributes.
_HREF_VALUE = "(\"[^\"<>]*\"|'[^'<>]*'|[^'\"\\s>]+)"

#: href values of anchor tags. RE2∩Java (no lookaround/backrefs), so
#: the DuckDB twin runs the SAME pattern. The boundary before ``href``
#: (r12, ADVICE r11; widened r14, ADVICE r13) rejects PREFIXED
#: attributes — ``<a data-href="x" href="y">`` extracts 'y', not 'x'
#: (the '-' before the inner "href" satisfies no boundary alternative)
#: — while accepting whitespace, a stray quote, OR a complete quoted
#: attribute value jammed directly against href (``<a id='z'href=…``,
#: a parse error whose attribute HTML5 tokenizers nevertheless keep —
#: the r13 scan dropped that anchor). Remaining documented limit: a
#: tag with an UNBALANCED quote before href loses that one anchor
#: (browsers see no href attribute there either). Proper handling
#: beyond this is a DOM parser: a per-row Python UDF, the slow path.
_HREF_BOUNDARY = "(?:[\\s'\"]|\"[^\"<]*\"|'[^'<]*')"
HTML_HREF_PATTERN = (
    "(?is)<a\\b"
    + _TAG_ATTR_SKIP
    + _HREF_BOUNDARY
    + "href\\s*=\\s*"
    + _HREF_VALUE
)


def _strip_href_quotes(v: Column) -> Column:
    """Unwrap a captured href value: drop the surrounding quotes when
    present, then trim (the whitespace browsers strip from URL
    attribute values)."""
    return F.trim(
        F.when(
            v.rlike("^[\"']"),
            v.substr(F.lit(2), F.greatest(F.length(v) - F.lit(2), F.lit(0))),
        ).otherwise(v)
    )


def html_links(col: Column | str) -> Column:
    """All anchor hrefs of an HTML column, document order, as
    ``array<string>`` — one codegen ``regexp_extract_all`` plus an
    unwrap-quotes transform, the crawl-side input to the link graph
    (``linkgraph.page_link_edges`` resolves + projects them to domain
    edges). Quoted hrefs keep internal spaces (r13); empty hrefs
    (``href=""`` — a self-reference, not a link) are dropped."""
    c = F.col(col) if isinstance(col, str) else col
    raw = F.regexp_extract_all(c, F.lit(HTML_HREF_PATTERN), 1)
    return F.filter(
        F.transform(raw, _strip_href_quotes), lambda v: v != F.lit("")
    )


def html_links_twin_sql(expr: str) -> str:
    """DuckDB twin of :func:`html_links` — same pattern text, same
    unwrap-quotes + trim + drop-empty post-processing."""
    pat = HTML_HREF_PATTERN.replace("'", "''")
    unwrap = (
        "trim(CASE WHEN v[1:1] IN ('\"', '''') THEN v[2:-2] ELSE v END)"
    )
    return (
        f"list_filter(list_transform(regexp_extract_all({expr}, '{pat}', 1),"
        f" v -> {unwrap}), v -> v <> '')"
    )


#: href AND anchor body of closed anchor tags (r12). Same boundary +
#: value grammar as HTML_HREF_PATTERN (quote-aware since r13 — spaces
#: in quoted hrefs and '>' inside quoted attribute values both
#: handled), then the tag's remaining attributes (same quoted-chunk
#: scan, so title="a>b" AFTER href doesn't end the tag early either)
#: and a LAZY body up to the first </a>. Same RE2∩Java subset (no
#: lookaround/backrefs), so the DuckDB twin runs the identical text.
#: Extra documented limit on top of the href extractor's: anchors that
#: never close (</a> missing) are dropped — html_links still sees
#: their href, so the link graph is unaffected; only the anchor-TEXT
#: signal loses that row.
HTML_ANCHOR_PATTERN = (
    "(?is)<a\\b" + _TAG_ATTR_SKIP + "[\\s'\"]href\\s*=\\s*" + _HREF_VALUE
    + "(?:[^>'\"]|\"[^\"<]*\"|'[^'<]*')*>(.*?)</a\\s*>"
)


def html_anchor_texts(col: Column | str) -> Column:
    """(href, anchor_text) pairs of an HTML column, document order, as
    ``array<struct<href,text>>`` — the anchor-text corpus signal:
    search and crawl pipelines aggregate the TEXT other pages use to
    link a target as an independent description/quality feature for
    that target (the classic anchor-file idea; production pipelines
    mine it corpus-wide). Two ``regexp_extract_all`` passes over the
    SAME pattern (group 1 = href, group 2 = body) produce
    position-aligned arrays by construction — ``arrays_zip`` pairs
    them with zero Python; the body is tag-stripped, entity-lite
    (amp/lt/gt) and whitespace-normalized, all codegen. (A one-scan
    group-0 variant with per-element re-extraction measured EQUAL or
    slower at 40× replicated input — the anchors get re-scanned
    twice, canceling the saved document pass — so the simpler
    double-pass shape stays.)"""
    c = F.col(col) if isinstance(col, str) else col
    hrefs = F.transform(
        F.regexp_extract_all(c, F.lit(HTML_ANCHOR_PATTERN), 1),
        _strip_href_quotes,
    )
    bodies = F.regexp_extract_all(c, F.lit(HTML_ANCHOR_PATTERN), 2)
    clean = F.transform(
        bodies,
        lambda b: F.trim(
            F.regexp_replace(
                F.replace(
                    F.replace(
                        F.replace(
                            F.regexp_replace(b, r"(?s)<[^>]*>", " "),
                            F.lit("&amp;"), F.lit("&"),
                        ),
                        F.lit("&lt;"), F.lit("<"),
                    ),
                    F.lit("&gt;"), F.lit(">"),
                ),
                r"\s+", " ",
            )
        ),
    )
    # alignment holds through the per-array transforms (same match
    # list); empty hrefs (href="" self-references) drop AFTER the zip
    # so the pairing never shifts
    return F.filter(
        F.arrays_zip(hrefs.alias("href"), clean.alias("text")),
        lambda p: p["href"] != F.lit(""),
    )


def html_base_href(col: Column | str) -> Column:
    """The page's ``<base href>`` (first one — HTML semantics), '' when
    absent. Pages use it to re-root relative resolution; honored by
    :func:`resolve_link` via its ``base_url`` argument."""
    c = F.col(col) if isinstance(col, str) else col
    # same attribute-name boundary (ADVICE r11) and quote-aware value
    # grammar (r13) as HTML_HREF_PATTERN
    return _strip_href_quotes(
        F.regexp_extract(
            c,
            "(?is)<base\\b" + _TAG_ATTR_SKIP
            + "[\\s'\"]href\\s*=\\s*" + _HREF_VALUE,
            1,
        )
    )


def resolve_link(
    page_url: Column | str,
    link: Column | str,
    base_url: Column | str | None = None,
) -> Column:
    """Absolutize an extracted href against its page URL — the codegen
    subset a DOMAIN graph needs: absolute http(s) kept, protocol-
    relative (``//host/x``) gains the context scheme, root-relative
    (``/x``) gains the context scheme+host; everything else → NULL.
    Dropping path-relative hrefs is deliberate and harmless here: they
    resolve to the context's own host, i.e. domain-graph SELF-LOOPS,
    which ``pagerank`` discards anyway; mailto:/javascript:/#fragment
    are not links. Full RFC 3986 merging is a per-row parser — the
    slow path — for edges the graph would drop.

    ``base_url`` (r11, usually :func:`html_base_href`): when the page
    declares an ABSOLUTE ``<base href>``, its scheme+host replace the
    page's as the resolution context (the HTML semantics that re-root
    ``/x`` links); empty/relative base values fall back to the page
    URL."""
    from .urls import url_host

    u = F.col(page_url) if isinstance(page_url, str) else page_url
    if base_url is not None:
        b = F.col(base_url) if isinstance(base_url, str) else base_url
        u = F.when(b.rlike(r"^[Hh][Tt][Tt][Pp][Ss]?://"), b).otherwise(u)
    ln = F.col(link) if isinstance(link, str) else link
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    origin = F.concat(scheme, F.lit("://"), url_host(u))
    is_abs = ln.rlike(r"^[Hh][Tt][Tt][Pp][Ss]?://")
    return (
        F.when(is_abs, ln)
        .when(ln.startswith("//"), F.concat(scheme, F.lit(":"), ln))
        .when(ln.startswith("/"), F.concat(origin, ln))
        .otherwise(F.lit(None).cast("string"))
    )


def _chain_twin_sql(expr: str, chain: tuple[tuple[str, str], ...]) -> str:
    out = expr
    for pat, repl in chain:
        pat_sql = pat.replace("'", "''")
        if "\n" in repl:
            repl_sql = " || ".join(
                "chr(10)" if ch == "\n" else f"'{ch}'" for ch in repl
            )
            if " || " in repl_sql:
                repl_sql = f"({repl_sql})"
        else:
            repl_sql = "'" + repl.replace("'", "''") + "'"
        out = f"regexp_replace({out}, '{pat_sql}', {repl_sql}, 'g')"
    return f"trim({out})"


def html_twin_sql(expr: str) -> str:
    """The DuckDB twin of :func:`html_to_text` as one nested SQL
    expression — the SAME chain text, global-replace flag, newline
    replacements via chr(10) (portable across SQL literal dialects).
    The cross-engine oracle form the PII scrub established."""
    return _chain_twin_sql(expr, HTML_STRIP_CHAIN)


def ws_norm_twin_sql(expr: str) -> str:
    """DuckDB twin of :func:`normalize_ws` (the roundtrip oracle's
    source-side normalization)."""
    return _chain_twin_sql(expr, WS_NORM_CHAIN)


def normalize_ws(col: Column | str) -> Column:
    """The chain-tail whitespace normalization alone — applied to raw
    source text, yields exactly what :func:`html_to_text` emits for a
    page whose body is that text escaped (the roundtrip property the
    WARC/HTML oracle pins)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in WS_NORM_CHAIN:
        c = F.regexp_replace(c, pat, repl)
    return F.trim(c)


def html_escape(col: Column | str) -> Column:
    """Fixture-side escape (& first, the inverse of the decode order) —
    used by the WARC/HTML roundtrip oracle to build spec-shaped pages
    from raw text."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"&", "&amp;")
    c = F.regexp_replace(c, r"<", "&lt;")
    return F.regexp_replace(c, r">", "&gt;")


def _lines(col: Column | str) -> Column:
    """Non-empty trimmed lines of a document as an array column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.transform(F.split(c, "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )


def _bullet_line_frac(lines: Column) -> Column:
    """Share of lines starting with a bullet marker — shared by
    ``repetition_signals`` and ``gopher_quality_filter`` so the two
    quality surfaces cannot drift apart."""
    n = F.greatest(F.size(lines), F.lit(1))
    return F.size(F.filter(lines, lambda l: l.rlike("^[-*•]"))) / n.cast(
        "double"
    )


def _ellipsis_line_frac(lines: Column) -> Column:
    """Share of lines ending with an ellipsis — ASCII ``...`` or the
    Unicode ``…`` character (truncated-boilerplate signal either way)."""
    n = F.greatest(F.size(lines), F.lit(1))
    return F.size(
        F.filter(lines, lambda l: l.endswith("...") | l.endswith("…"))
    ) / n.cast("double")


def repetition_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Line-level repetition / layout signals (C4- and Gopher-style
    quality heuristics): duplicate-line fraction, longest line, bullet-
    and ellipsis-line fractions. Boilerplate (navigation menus, cookie
    banners, scraped templates) shows up as high duplicate-line
    fractions long before model-based quality scoring is affordable.
    All higher-order array expressions over one split — single scan, no
    shuffle, no Python."""
    lines = _lines(text_col)
    n = F.size(lines)
    safe_n = F.greatest(n, F.lit(1))
    return df.withColumns(
        {
            "n_lines": n,
            "dup_line_frac": (n - F.size(F.array_distinct(lines)))
            / safe_n.cast("double"),
            "max_line_len": F.coalesce(
                F.array_max(F.transform(lines, F.length)), F.lit(0)
            ),
            "bullet_line_frac": _bullet_line_frac(lines),
            "ellipsis_line_frac": _ellipsis_line_frac(lines),
        }
    )


def _word_ngrams(words: Column, n: int) -> Column:
    """Space-joined word n-grams of a word array ('' when < n words)."""
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _gram_chars(gram: Column, n: int) -> Column:
    """Characters of an n-gram's WORDS (the n−1 joining spaces are an
    encoding artifact, not document characters)."""
    return F.length(gram) - F.lit(n - 1)


def ngram_repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """The n-gram half of Gopher's repetition rules (Rae et al. 2021,
    Table A1 — the line-level half is :func:`repetition_signals`):

    - ``top_{n}_gram_char_frac`` for n in ``top_ns``: characters
      covered by ALL occurrences of the document's MOST FREQUENT word
      n-gram — ranked by occurrence count first, ties broken by
      character coverage — over total word characters (lowercased
      words — Gopher normalizes case for repetition; Rae et al. 2021,
      Table A1 defines the signal on the most frequently-occurring
      gram, so a rarer-but-longer gram never dominates);
    - ``dup_{n}_gram_char_frac`` for n in ``dup_ns``: characters in
      REPEATED occurrences (beyond each gram's first) of every
      duplicated n-gram, over total word characters — the standard
      reimplementation contract (overlapping occurrences are counted
      per occurrence, not de-overlapped as the paper's footnote does;
      the pure-Python pytest oracle mirrors this definition exactly).

    Degenerate docs (fewer than n words) score 0 for that n. One scan,
    no shuffle, no Python: each n materializes ONE sorted n-gram array
    and folds it with a struct-state ``aggregate`` (run-length over
    the sorted array = per-gram counts) — per-row cost O(Σ n · words).

    Implementation note (measured 13.6 s → 3.1 s at sf0.1): ALL
    signals are built inside one single-element ``transform`` whose
    lambda variable BINDS the tokenized word array — higher-order
    array expressions are CodegenFallback, and in the interpreted
    path every ``slice(words, ...)`` inside a gram-building lambda
    would otherwise RE-EVALUATE the whole split/lower/filter
    tokenization once per element (quadratic in words). The lambda
    variable is a per-row value lookup, evaluated once."""
    # NULL text scores like the empty document (all fractions 0), so a
    # NULL-skipping avg downstream can never silently shrink its count
    c = F.coalesce(F.col(text_col), F.lit(""))
    words_expr = F.filter(
        F.split(F.trim(F.lower(c)), TOKEN_PATTERN), lambda t: t != ""
    )
    # factory closures, NOT `lambda acc, g, n=n`: PySpark builds the
    # JVM lambda from the Python callable's PARAMETER COUNT, so a
    # default-arg capture would declare a 3-ary merge function
    def _top_step(n: int):
        def step(acc: Column, g: Column) -> Column:
            run = (
                F.when(g == acc["prev"], acc["run"] + 1)
                .otherwise(F.lit(1).cast("long"))
            )
            # count-first ranking (ties by coverage): the mode's run
            # peaks at its full count, so comparing every prefix run
            # against (best_run, best) converges to the most frequent
            # gram's total coverage — never a rarer-but-longer gram's
            cover = run * _gram_chars(g, n)
            better = (run > acc["best_run"]) | (
                (run == acc["best_run"]) & (cover > acc["best"])
            )
            return F.struct(
                g.alias("prev"),
                run.alias("run"),
                F.when(better, run).otherwise(acc["best_run"]).alias(
                    "best_run"
                ),
                F.when(better, cover).otherwise(acc["best"]).alias("best"),
            )

        return step

    def _dup_step(n: int):
        def step(acc: Column, g: Column) -> Column:
            return F.struct(
                g.alias("prev"),
                (
                    acc["dup"]
                    + F.when(
                        g == acc["prev"], _gram_chars(g, n)
                    ).otherwise(F.lit(0).cast("long"))
                ).alias("dup"),
            )

        return step

    names: list[str] = [f"top_{n}_gram_char_frac" for n in top_ns] + [
        f"dup_{n}_gram_char_frac" for n in dup_ns
    ]

    def _signals(words: Column) -> Column:
        """All fractions as one struct over the BOUND word array."""
        total_chars = F.aggregate(
            words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        )
        safe_chars = F.greatest(total_chars, F.lit(1)).cast("double")
        fields = []
        for n in top_ns:
            grams = F.array_sort(_word_ngrams(words, n))
            # run-length fold: (prev gram, run len, mode's count,
            # mode's chars covered)
            init = F.struct(
                F.lit("").alias("prev"),
                F.lit(0).cast("long").alias("run"),
                F.lit(0).cast("long").alias("best_run"),
                F.lit(0).cast("long").alias("best"),
            )
            fields.append(
                (
                    F.aggregate(
                        grams, init, _top_step(n), lambda acc: acc["best"]
                    )
                    / safe_chars
                ).alias(f"top_{n}_gram_char_frac")
            )
        for n in dup_ns:
            grams = F.array_sort(_word_ngrams(words, n))
            # (count−1)·chars accumulated at every repeated adjacent
            # gram — Σ over duplicated grams of (count−1)·chars
            init = F.struct(
                F.lit("").alias("prev"),
                F.lit(0).cast("long").alias("dup"),
            )
            fields.append(
                (
                    F.aggregate(
                        grams, init, _dup_step(n), lambda acc: acc["dup"]
                    )
                    / safe_chars
                ).alias(f"dup_{n}_gram_char_frac")
            )
        return F.struct(*fields)

    # the let-binding idiom: a 1-element transform binds the evaluated
    # word array to a lambda variable — every reference inside is a
    # value lookup, never a re-tokenization
    sig = F.element_at(F.transform(F.array(words_expr), _signals), 1)
    tagged = df.withColumn("__rep_sig", sig)
    return tagged.withColumns(
        {name: F.col("__rep_sig")[name] for name in names}
    ).drop("__rep_sig")


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 over whitespace-normalized, lowercased
    text (deterministic, SQL-replicable)."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.md5(normalized)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    overlap: int = 16,
    min_tokens: int = 1,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    standard pre-tokenization step of an LLM training-data pipeline.

    Chunk i covers tokens [i·stride, i·stride + chunk_tokens) with
    stride = chunk_tokens − overlap; the last chunk is the tail
    remainder (kept when ≥ ``min_tokens`` tokens). Pure codegen: the
    token array is materialized once per row, chunk starts come from a
    ``sequence`` (few per document), and each chunk is one slice+concat
    — per-row cost is O(tokens · chunks/doc ≈ tokens/(1−overlap ratio)),
    and rows fan out via ``posexplode`` so downstream operators see one
    row per chunk. Output: (id, chunk_id, n_chunks, chunk_text,
    n_tokens)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = F.filter(toks, lambda t: t != "")
    base = df.select(F.col(id_col).alias("id"), toks.alias("__toks")).withColumn(
        "__n", F.size("__toks")
    )
    # chunk start indices (1-based for slice): 1, 1+stride, 1+2·stride …
    # while start <= n (ensures the tail is covered exactly once)
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.col("__n") - F.lit(chunk_tokens) + F.lit(stride), F.lit(1)),
        F.lit(stride),
    )
    chunks = F.transform(
        starts, lambda s: F.slice(F.col("__toks"), s, chunk_tokens)
    )
    exploded = base.select(
        "id",
        F.size(chunks).alias("n_chunks"),
        F.posexplode(chunks).alias("chunk_id", "__chunk"),
    )
    return (
        exploded.withColumn("n_tokens", F.size("__chunk"))
        .filter(F.col("n_tokens") >= min_tokens)
        .select(
            "id",
            "chunk_id",
            "n_chunks",
            F.concat_ws(" ", "__chunk").alias("chunk_text"),
            "n_tokens",
        )
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_count_col: str | None = None,
) -> DataFrame:
    """Sequence-packing manifest: concatenate the corpus's token stream
    in ``id_col`` order and cut it into fixed ``max_tokens`` training
    blocks — the standard concat-then-chunk packing of LLM
    pretraining — emitting WHICH token span of WHICH document lands in
    WHICH block, without ever materializing the concatenated stream.

    Output rows: (block_id, id_col, span_start, span_end, n_tokens)
    where tokens [span_start, span_end) of the document (0-based,
    whitespace tokenization — same contract as ``chunk_documents``)
    fill block ``block_id`` in ``id_col`` order; a document straddling
    a block boundary fans out into one row per touched block. Every
    block sums to exactly ``max_tokens`` except the last. Empty
    documents are absent from the manifest (they contribute no
    tokens). Pass ``token_count_col`` when token counts are already
    materialized (e.g. real-tokenizer counts) to skip the whitespace
    count.

    100 TB shape: per-document token counts are one codegen'd
    projection; the global token offset is an exact distributed prefix
    sum (``operators.windows.global_prefix_sum`` — bucketed, no
    single-partition window); block assignment is pure arithmetic on
    (offset, count); the fan-out per document is ~n_tokens/max_tokens
    rows of four longs. The text itself never shuffles — a loader
    joins the manifest back to document storage by id.
    """
    from .windows import global_prefix_sum

    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if token_count_col is None:
        toks = F.filter(
            F.split(F.trim(F.col(text_col)), TOKEN_PATTERN),
            lambda t: t != "",
        )
        counted = df.select(
            F.col(id_col), F.size(toks).cast("long").alias("__n_tok")
        )
    else:
        counted = df.select(
            F.col(id_col), F.col(token_count_col).cast("long").alias("__n_tok")
        )
    counted = counted.filter(F.col("__n_tok") > 0)
    ps = global_prefix_sum(counted, [id_col], "__n_tok", out_col="__start")
    end = F.col("__start") + F.col("__n_tok")  # exclusive global end
    first = F.floor(F.col("__start") / max_tokens).cast("long")
    last = F.floor((end - 1) / max_tokens).cast("long")
    blocks = ps.select(
        F.col(id_col),
        "__start",
        "__n_tok",
        F.explode(F.sequence(first, last)).alias("block_id"),
    )
    span_start = (
        F.greatest(F.col("block_id") * max_tokens, F.col("__start"))
        - F.col("__start")
    ).cast("long")
    span_end = (
        F.least(
            (F.col("block_id") + F.lit(1)) * max_tokens,
            F.col("__start") + F.col("__n_tok"),
        )
        - F.col("__start")
    ).cast("long")
    return blocks.select(
        "block_id",
        id_col,
        span_start.alias("span_start"),
        span_end.alias("span_end"),
        (span_end - span_start).alias("n_tokens"),
    ).orderBy("block_id", id_col)


def _bfd_assign(items, max_tokens: int):
    """Best-Fit-Decreasing core over (key, n) items ALREADY in
    decreasing-n deterministic order: each item lands in the bin with
    the SMALLEST residual capacity that still fits (ties → the
    earliest-opened bin); no fit opens a new bin. Returns
    [(key, bin_seq)] with bins 0-indexed in opening order.
    O(n log L): a sorted list of non-empty residual classes (bisect),
    each class a min-heap of bin ids. Pure Python by necessity — bin
    packing is inherently sequential — and runs ONLY inside
    :func:`pack_bestfit`'s per-packer grouped map over (id, count)
    pairs, never over text."""
    residuals: list[int] = []  # sorted, unique, non-empty classes
    by_residual: dict[int, list[int]] = {}  # residual -> bin-id heap
    n_bins = 0
    out = []
    for key, n in items:
        i = _bisect_left(residuals, n)
        if i < len(residuals):
            r = residuals[i]
            heap = by_residual[r]
            b = _heapq.heappop(heap)
            if not heap:
                del by_residual[r]
                residuals.pop(i)
        else:
            b = n_bins
            n_bins += 1
            r = max_tokens
        nr = r - n
        if nr > 0:
            if nr not in by_residual:
                by_residual[nr] = []
                _insort(residuals, nr)
            _heapq.heappush(by_residual[nr], b)
        out.append((key, b))
    return out


def pack_bestfit(
    df: DataFrame,
    max_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_count_col: str | None = None,
    packers: int = 64,
) -> DataFrame:
    """Best-Fit-Decreasing sequence packing (Ding et al. 2024,
    arXiv:2404.10830 "Fewer Truncations Improve Language Modeling"):
    whole documents land in bins of capacity ``max_tokens`` — no
    document splits across training sequences unless it EXCEEDS the
    capacity (then the paper's pre-split applies: full-capacity pieces
    plus the remainder, each packed as an item). Compare
    :func:`pack_sequences` (GPT-style stream chunking), which cuts a
    document at every block boundary it crosses.

    Returns a manifest ``(bin_id, id, span_start, span_end, n_tokens)``
    in pack_sequences' span unit (whitespace tokens, or the caller's
    ``token_count_col``); rename ``bin_id`` → ``block_id`` to feed
    :func:`materialize_packed_blocks` (within-bin document order is a
    free choice for training sequences).

    Distributed shape: bin packing is inherently sequential, so the
    corpus hash-partitions into ``packers`` INDEPENDENT packers
    (md5(id) % packers — deterministic and partition-layout-free, the
    sampling operators' discipline) and each runs EXACT BFD over its
    items in ONE Arrow-batched grouped map; per-packer state is
    (id, span, count) tuples only — the text never reaches Python.
    Packing waste stays local (each packer's fill approaches global
    BFD's for large groups — measured in the registered query);
    ``packers`` trades parallelism against that waste and is part of
    the result's identity: the same corpus with the same ``packers``
    packs identically on ANY cluster or partitioning.

    BFD order: items by (count desc, id asc, span_start asc); each item
    takes the bin with the smallest residual that fits, ties to the
    earliest-opened bin. ``bin_id = packer * 2**40 + seq``."""
    import pandas as pd

    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if packers <= 0:
        raise ValueError("packers must be positive")
    if token_count_col is None:
        toks = F.filter(
            F.split(F.trim(F.col(text_col)), TOKEN_PATTERN),
            lambda t: t != "",
        )
        counted = df.select(
            F.col(id_col), F.size(toks).cast("long").alias("__n")
        )
    else:
        counted = df.select(
            F.col(id_col), F.col(token_count_col).cast("long").alias("__n")
        )
    counted = counted.filter(F.col("__n") > 0)
    pieces = counted.select(
        F.col(id_col),
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.ceil(F.col("__n") / max_tokens).cast("long") - 1,
            )
        ).alias("__p"),
        "__n",
    ).select(
        F.col(id_col),
        (F.col("__p") * max_tokens).alias("span_start"),
        F.least((F.col("__p") + 1) * max_tokens, F.col("__n")).alias(
            "span_end"
        ),
    ).withColumn("n_tokens", F.col("span_end") - F.col("span_start"))
    items = pieces.withColumn(
        "__packer",
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 15),
                16,
                10,
            ).cast("long"),
            F.lit(packers),
        ).cast("int"),
    )
    L = max_tokens

    def _pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        packer = int(pdf["__packer"].iloc[0])
        # ids keep their native type (string/uuid keys pack like the
        # sibling operators — review r13); the sort key stays total
        # because ids are same-typed within a frame
        rows = sorted(
            zip(
                pdf[id_col], pdf["span_start"], pdf["span_end"],
                pdf["n_tokens"],
            ),
            key=lambda r: (-int(r[3]), r[0], int(r[1])),
        )
        assign = _bfd_assign([(r, int(r[3])) for r in rows], L)
        return pd.DataFrame(
            {
                "bin_id": [packer * (1 << 40) + seq for _, seq in assign],
                id_col: [r[0] for r, _ in assign],
                "span_start": [int(r[1]) for r, _ in assign],
                "span_end": [int(r[2]) for r, _ in assign],
                "n_tokens": [int(r[3]) for r, _ in assign],
            }
        )

    id_type = df.schema[id_col].dataType.simpleString()
    schema = (
        f"bin_id long, {id_col} {id_type}, span_start long, "
        "span_end long, n_tokens long"
    )
    return items.groupBy("__packer").applyInPandas(_pack, schema)


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """The published Gopher document-quality rules (Rae et al. 2021,
    arXiv:2112.11446 Table A1) as ONE codegen scan: word-count bounds,
    mean-word-length bounds, symbol-to-word ratios (hash and ellipsis,
    each thresholded separately as the paper does),
    bullet/ellipsis line fractions, alphabetic-word fraction, and the
    required-stopword count. Adds one boolean per rule, the composed
    ``quality_pass``, and a ``fail_reasons`` array naming the violated
    rules — keep/drop stays auditable instead of a silent filter.

    Pure built-in expressions over two array materializations (words,
    lines) — no shuffle, no Python; the 100 TB cost is the scan itself.
    """
    words = F.filter(
        F.split(F.trim(F.col(text_col)), TOKEN_PATTERN), lambda t: t != ""
    )
    lines = _lines(text_col)
    n_words = F.size(words)
    safe_words = F.greatest(n_words, F.lit(1))
    mean_word_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    ) / safe_words.cast("double")
    # Table A1 thresholds EACH symbol's ratio separately (hash;
    # ellipsis, ASCII or Unicode) — a doc at 0.06 + 0.06 passes both
    hash_ratio = (
        F.size(F.regexp_extract_all(F.col(text_col), F.lit("#"), 0))
        / safe_words.cast("double")
    )
    ellipsis_sym_ratio = (
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"\.\.\.|…"), 0))
        / safe_words.cast("double")
    )
    bullet_frac = _bullet_line_frac(lines)
    ellipsis_frac = _ellipsis_line_frac(lines)
    alpha_frac = (
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
        / safe_words.cast("double")
    )
    stopword_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(words, F.lower)),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    rules = {
        "word_count_ok": (n_words >= min_words) & (n_words <= max_words),
        "mean_word_len_ok": (mean_word_len >= min_mean_word_len)
        & (mean_word_len <= max_mean_word_len),
        "symbol_ratio_ok": (hash_ratio <= max_symbol_word_ratio)
        & (ellipsis_sym_ratio <= max_symbol_word_ratio),
        "bullet_lines_ok": bullet_frac <= max_bullet_line_frac,
        "ellipsis_lines_ok": ellipsis_frac <= max_ellipsis_line_frac,
        "alpha_words_ok": alpha_frac >= min_alpha_word_frac,
        "stopwords_ok": stopword_hits >= min_stopword_hits,
    }
    out = df.withColumns(rules)
    passed = None
    for name in rules:
        passed = F.col(name) if passed is None else passed & F.col(name)
    reasons = F.filter(
        F.array(
            *[
                F.when(~F.col(name), F.lit(name.removesuffix("_ok")))
                for name in rules
            ]
        ),
        lambda r: r.isNotNull(),
    )
    return out.withColumns(
        {"quality_pass": passed, "fail_reasons": reasons}
    )


#: Policy-line substrings of the original C4 cleaning code (the
#: public TensorFlow-Datasets c4_utils; Raffel et al. 2020,
#: arXiv:1910.10683 §2.2): lines carrying cookie/policy boilerplate
#: are dropped by the line filter.
C4_POLICY_SUBSTRINGS = (
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
    "use of cookies",
    "use cookies",
)

#: C4's terminal marks: a kept line must END in one of these (the
#: paper's "terminal punctuation mark", incl. the closing quote the
#: original code accepts).
_C4_LINE_END_RE = '[.!?"]$'


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    blockwords: list[str] | None = None,
    out_col: str = "clean_text",
) -> DataFrame:
    """The C4 cleaning heuristics (Raffel et al. 2020, arXiv:1910.10683
    §2.2) as ONE codegen scan — the third published quality family next
    to :func:`gopher_quality_filter` and the repetition signals.

    Line filter (rebuilds ``out_col`` from the kept lines): a line
    survives when it ends in a terminal punctuation mark (``.!?"`` —
    the paper's rule), holds at least ``min_words_per_line`` words
    (paper: 3), does not mention ``javascript`` (case-insensitive), and
    carries none of the original code's policy boilerplate substrings
    (``C4_POLICY_SUBSTRINGS``).

    Page filter (booleans + composed ``c4_pass`` + ``fail_reasons``,
    the auditable shape of the Gopher filter): at least
    ``min_sentences`` sentences (paper: 5) — counted as terminal
    ``[.!?]`` occurrences in the KEPT lines, the standard
    re-implementation of the paper's sentence count —, no
    ``lorem ipsum``, no ``{`` (code), and none of ``blockwords`` as a
    whole word. The paper's word list is a third-party resource, so
    callers supply their own; ``None`` leaves the rule inert (column
    omitted). NULL text scores as the empty document.

    Scale: pure built-in expressions over one line-array
    materialization — no shuffle, no Python; the 100 TB cost is the
    scan itself, same class as the Gopher pass."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    # the policy substrings are lowercase literals (no regex specials)
    policy_re = "|".join(C4_POLICY_SUBSTRINGS)

    def _line_ok(ln: Column) -> Column:
        # regex trim, not F.trim: F.trim strips ASCII SPACE only, so a
        # terminally-punctuated line with a trailing tab would be
        # wrongly dropped (review r13). Java \s is the ASCII class
        # [ \t\n\x0B\f\r] — the Python mirror spells the same class
        # explicitly (Python re's \s is unicode-wide).
        t = F.regexp_replace(ln, r"^\s+|\s+$", "")
        n_words = F.size(F.filter(F.split(t, r"\s+"), lambda w: w != ""))
        low = F.lower(t)
        return (
            t.rlike(_C4_LINE_END_RE)
            & (n_words >= min_words_per_line)
            & ~low.contains("javascript")
            & ~low.rlike(policy_re)
        )

    out = (
        df.withColumn("__kept", F.filter(F.split(text, r"\r?\n"), _line_ok))
        .withColumns(
            {
                "n_lines": F.size(F.split(text, r"\r?\n")).cast("long"),
                "n_kept_lines": F.size(F.col("__kept")).cast("long"),
                out_col: F.array_join(F.col("__kept"), "\n"),
            }
        )
        .withColumn(
            "n_sentences",
            F.size(
                F.regexp_extract_all(F.col(out_col), F.lit("[.!?]"), 0)
            ).cast("long"),
        )
        .drop("__kept")
    )
    rules = {
        "sentences_ok": F.col("n_sentences") >= min_sentences,
        "lorem_ipsum_ok": ~F.lower(text).contains("lorem ipsum"),
        "brace_ok": ~text.contains("{"),
    }
    if blockwords:
        bw = "|".join(_regex_quote_word(w) for w in blockwords)
        rules["blockwords_ok"] = ~F.lower(text).rlike(
            r"\b(?:" + bw + r")\b"
        )
    out = out.withColumns(rules)
    passed = None
    for name in rules:
        passed = F.col(name) if passed is None else passed & F.col(name)
    reasons = F.filter(
        F.array(
            *[
                F.when(~F.col(name), F.lit(name.removesuffix("_ok")))
                for name in rules
            ]
        ),
        lambda r: r.isNotNull(),
    )
    return out.withColumns({"c4_pass": passed, "fail_reasons": reasons})


def _regex_quote_word(w: str) -> str:
    """Escape a blockword for the Java-regex alternation (specials as
    literals — the robots pattern-escape discipline)."""
    return _re.escape(w.lower())


def materialize_packed_blocks(
    df: DataFrame,
    manifest: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = " ",
    validate: bool = True,
    tokens_df: DataFrame | None = None,
) -> DataFrame:
    """Turn a ``pack_sequences`` manifest into actual training blocks:
    (block_id, text, n_tokens) where ``text`` is the block's token span
    joined by ``sep`` — the shard-writer stage of the packing pipeline.

    Default tokenization matches ``pack_sequences`` exactly (trim +
    whitespace split, NO lowercasing — blocks preserve the original
    text), so every block's token count equals the manifest's
    accounting; the concatenation of all blocks reproduces the corpus
    token stream in ``id_col`` order (pytest-pinned).

    ``tokens_df`` (id, tokens array) switches the unit: pass
    ``bpe.doc_token_arrays(...)`` plus a manifest packed with
    ``token_count_col='n_bpe_tokens'`` to emit blocks of REAL tokenizer
    tokens; the unit-mismatch guard then validates against the provided
    arrays instead of the whitespace split.

    Scale: docs join the manifest on the id key (one shuffle; the text
    rides this join ONCE — the manifest stays four longs per row until
    here), each row slices its span from the doc's token array, and the
    per-block assembly groups ≤ ``max_tokens`` tokens by construction —
    bounded state per group, sorted in-array (``array_sort`` on
    (id, span_start) structs), no window."""
    if tokens_df is not None:
        docs = tokens_df.select(F.col(id_col), F.col("tokens").alias("__toks"))
        mismatch_msg = (
            "manifest spans do not match the supplied token arrays (or a"
            " manifest doc is missing from tokens_df) — build the arrays"
            " and the token_count_col manifest from the SAME encode over"
            " the SAME corpus (or pass validate=False)"
        )
    else:
        toks = F.filter(
            F.split(F.trim(F.col(text_col)), TOKEN_PATTERN), lambda t: t != ""
        )
        docs = df.select(F.col(id_col), toks.alias("__toks"))
        mismatch_msg = (
            "manifest span units do not match whitespace tokens (or a"
            " manifest doc is missing from df) — was pack_sequences built"
            " with token_count_col? Pass the matching token arrays via"
            " tokens_df, or validate=False"
        )
    # LEFT join under validation: a manifest doc missing from the token
    # source must reach the guard (an inner join would silently drop its
    # spans before the check ever ran — blocks would shrink, no error)
    joined = manifest.join(docs, id_col, "left" if validate else "inner")
    if validate:
        # every doc's manifest must end exactly at its token count; the
        # check is a FILTER condition (an assert_true in a later-dropped
        # column is pruned away by Catalyst and never runs), and a NULL
        # __toks (missing doc) falls into the raising branch
        ends = manifest.groupBy(id_col).agg(F.max("span_end").alias("__end"))
        joined = (
            joined.join(ends, id_col)
            .filter(
                F.when(F.col("__end") == F.size("__toks"), F.lit(True)).otherwise(
                    F.raise_error(F.lit(mismatch_msg)).cast("boolean")
                )
            )
            .drop("__end")
        )
    piece = joined.select(
        "block_id",
        F.struct(
            F.col(id_col).alias("id"),
            F.col("span_start").alias("s"),
            F.slice(
                F.col("__toks"),
                (F.col("span_start") + 1).cast("int"),
                F.col("n_tokens").cast("int"),
            ).alias("toks"),
        ).alias("__piece"),
        F.col("n_tokens"),
    )
    return (
        piece.groupBy("block_id")
        .agg(
            F.array_sort(F.collect_list("__piece")).alias("__pieces"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .select(
            "block_id",
            F.array_join(
                F.flatten(F.transform(F.col("__pieces"), lambda p: p["toks"])),
                sep,
            ).alias("text"),
            "n_tokens",
        )
    )
