"""HTML → text extraction oracle tests (operators/text.py r10).

Layers: (1) pure-fixture behavior of the strip chain (script/style/
head/comment removal, block newlines, entity decode, whitespace
normalization, title extraction), (2) the cross-engine DuckDB twin —
the SAME chain text via html_twin_sql on an HTML-bearing frame, value
equality (the PII-scrub oracle form), (3) the registered
``warc_html_extract`` query vs its full DuckDB twin: page template →
escape → extract → roundtrip rollup, both engines end-to-end.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mbfbigdatarandomforest_spark.operators.text import (
    html_escape,
    html_title,
    html_to_text,
    html_twin_sql,
    normalize_ws,
    ws_norm_twin_sql,
)
from mbfbigdatarandomforest_spark.plans.llm_ops import (
    WARC_HTML_POST_TITLE,
    WARC_HTML_PRE_TITLE,
    WARC_HTML_SUFFIX,
)
from mbfbigdatarandomforest_spark.registry import load_all

from conftest import SF_DIR_ORACLE

_ESC_SQL = "replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
_POST_TITLE_SQL = WARC_HTML_POST_TITLE.replace("\n", "' || chr(10) || '")
#: the page template as a DuckDB expression over `documents`
PAGE_SQL = (
    f"'{WARC_HTML_PRE_TITLE}' || doc_id || '{_POST_TITLE_SQL}' || "
    f"{_ESC_SQL} || '{WARC_HTML_SUFFIX}'"
)

PAGES = [
    (
        0,
        "<html><head><title>T0</title><style>body{color:red}</style></head>"
        "<body><h1>Head</h1><p>One &amp; two &lt;tag&gt;.</p>"
        "<script>if (a<b && c>d) {alert('x');}</script>"
        "<ul><li>alpha</li><li>beta</li></ul></body></html>",
        "Head\nOne & two <tag>.\nalpha\nbeta",
        "T0",
    ),
    (
        1,
        "<p>line one<br>line two</p><!-- hidden -->\n\n\n<div>after   spaces"
        "\t&nbsp;end</div>",
        "line one\nline two\n\nafter spaces end",
        "",
    ),
    (2, "plain text, no markup at all", "plain text, no markup at all", ""),
    (
        3,
        "<HTML><HEAD><TITLE> upper case </TITLE></HEAD><BODY><P>UP</P>"
        "</BODY></HTML>",
        "UP",
        "upper case",
    ),
]


def test_html_to_text_fixture_pages(spark):
    df = spark.createDataFrame(
        [(i, h) for i, h, _, _ in PAGES], "i long, html string"
    )
    got = {
        r["i"]: (r["text"], r["title"])
        for r in html_to_text(df, "html", "text")
        .withColumn("title", html_title(F.col("html")))
        .collect()
    }
    for i, _, want_text, want_title in PAGES:
        assert got[i][0] == want_text, i
        assert got[i][1] == want_title, i


def test_html_chain_duckdb_twin(spark, duck):
    """The SAME chain text must produce value-equal results in DuckDB
    (RE2) and Spark (Java regex) on markup-bearing pages."""
    df = spark.createDataFrame(
        [(i, h) for i, h, _, _ in PAGES], "i long, html string"
    )
    got = {
        r["i"]: r["text"]
        for r in html_to_text(df, "html", "text").collect()
    }
    duck.execute("CREATE OR REPLACE TABLE __html_pages(i BIGINT, html VARCHAR)")
    duck.executemany(
        "INSERT INTO __html_pages VALUES (?, ?)",
        [(i, h) for i, h, _, _ in PAGES],
    )
    want = {
        i: t
        for i, t in duck.sql(
            f"SELECT i, {html_twin_sql('html')} AS t FROM __html_pages"
        ).fetchall()
    }
    assert got == want


ADVERSARIAL_TEXTS = [
    "literal &amp; stays one level",          # pre-encoded entity
    "literal &lt;tag&gt; text",               # entity-looking source
    "has a real <script>alert(1)</script>",   # markup INSIDE source text
    "angle math: 1<2 && 3>2",
    "&nbsp; leading entity",
    "tabs\tand\r\nwindows  newlines\n\n\n\nmany",
    "unicode: føund — 的是了 🎈",
    "trailing spaces   ",
    "   leading spaces",
    "quote \" and apostrophe ' mix",
    "a&b&c&&d",
    "</p> stray closer in text",
    "<",
    "&",
    "",
]


def test_escape_extract_roundtrip_adversarial(spark):
    """Escape → template → extract must invert to normalize_ws(text)
    even for source text full of markup, entities, and stray angle
    brackets — the escape layer is what makes the chain safe."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ADVERSARIAL_TEXTS)], "i long, text string"
    )
    pages = df.select(
        "i",
        F.concat(
            F.lit(WARC_HTML_PRE_TITLE),
            F.col("i"),
            F.lit(WARC_HTML_POST_TITLE),
            html_escape(F.col("text")),
            F.lit(WARC_HTML_SUFFIX),
        ).alias("html"),
        normalize_ws(F.col("text")).alias("norm_text"),
    )
    rows = html_to_text(pages, "html", "extracted").collect()
    assert len(rows) == len(ADVERSARIAL_TEXTS)
    for r in rows:
        assert r["extracted"] == r["norm_text"], (
            r["i"], ADVERSARIAL_TEXTS[r["i"]], r["extracted"], r["norm_text"]
        )


def test_escape_extract_roundtrip_on_corpus(spark, duck):
    """Roundtrip property at corpus scale: wrap every document's text
    in the WARC page template (escaped), extract, compare to the
    whitespace-normalized source — must be exact for ALL docs, in
    BOTH engines."""
    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit(WARC_HTML_PRE_TITLE),
            F.col("doc_id"),
            F.lit(WARC_HTML_POST_TITLE),
            html_escape(F.col("text")),
            F.lit(WARC_HTML_SUFFIX),
        ).alias("html"),
        normalize_ws(F.col("text")).alias("norm_text"),
    )
    bad = (
        html_to_text(pages, "html", "extracted")
        .filter(F.col("extracted") != F.col("norm_text"))
        .count()
    )
    assert bad == 0
    # DuckDB side: same template, same twin chain
    n_bad = duck.sql(
        f"SELECT COUNT(*) FROM (SELECT {html_twin_sql(PAGE_SQL)} AS e, "
        f"{ws_norm_twin_sql('text')} AS n FROM documents) WHERE e != n"
    ).fetchone()[0]
    assert n_bad == 0


def test_warc_html_extract_vs_duckdb_twin(spark, duck):
    """The registered query end-to-end (HTML → WARC shards → records →
    extract → rollup) vs the twin computed straight off documents."""
    spec = load_all()["warc_html_extract"]
    assert spec.oracle is None  # rows-only by design (WARC roundtrip)
    got = spec.fn(spark, SF_DIR_ORACLE).toPandas()
    want = duck.sql(f"""
        WITH ex AS (
          SELECT lang,
                 {html_twin_sql(PAGE_SQL)} AS extracted,
                 {ws_norm_twin_sql('text')} AS norm_text,
                 'doc ' || doc_id AS want_title,
                 trim(regexp_extract({PAGE_SQL},
                      '(?is)<title[^>]*>(.*?)</title\\s*>', 1)) AS title
          FROM documents
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM((extracted = norm_text)::BIGINT) AS BIGINT) AS n_roundtrip_exact,
               CAST(SUM((title = want_title)::BIGINT) AS BIGINT) AS n_title_ok,
               CAST(SUM(length(extracted)) AS BIGINT) AS chars_extracted
        FROM ex GROUP BY lang ORDER BY lang
    """).df()
    assert got["lang"].tolist() == want["lang"].tolist()
    for c in ("n_docs", "n_roundtrip_exact", "n_title_ok", "chars_extracted"):
        assert got[c].tolist() == want[c].tolist(), c
    # the roundtrip must actually hold, not merely agree across engines
    assert (got["n_roundtrip_exact"] == got["n_docs"]).all()
    assert (got["n_title_ok"] == got["n_docs"]).all()
