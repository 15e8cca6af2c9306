"""PII scrubbing oracles: cross-engine value equality (the same pattern
text executed by Spark's Java regex AND DuckDB's RE2 must scrub
identically), attribution ordering, and plan shape (pure projection).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from mbfbigdatarandomforest_spark.operators.pii import (
    PII_ORDER,
    pii_twin_sql,
    scrub_pii,
)

CORPUS = [
    (0, "contact alice.smith+spam@example.co.uk or bob@sub.domain.org today"),
    (1, "server at 192.168.1.254 and 10.0.0.1 answered"),
    (2, "ssn 123-45-6789 on file; call +1 (555) 123-4567 or 555 867 5309"),
    (3, "no identifiers here, just words and the number 42"),
    (4, "mixed: eve@host.io from 8.8.8.8 dialed 020-7946-0958, ssn 987-65-4321"),
    (5, ""),
    (6, "edge: a@b.cc x@y.museum 1.2.3.4.5 12-34-5678 is not an ssn"),
    # negative fixtures (ADVICE r7): generic numeric runs must survive —
    # ISO dates/timestamps, epoch seconds, version strings, ID numbers.
    (7, "logged 2026-08-14 12:30:45 then 2026-08-14 12 epoch 1723622400"),
    (8, "order 4711234567890 on 14-08-2026, kernel 6.18.5 build +7"),
    (9, None),
]


@pytest.fixture(scope="module")
def scrubbed_rows(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    return {
        r["doc_id"]: r
        for r in scrub_pii(df, "text", out_col="scrubbed").collect()
    }


def test_pii_scrub_matches_duckdb_twin(spark, scrubbed_rows):
    """Same pattern text, both engines, value-equal: scrubbed string and
    every per-kind count."""
    con = duckdb.connect()
    con.execute("CREATE TABLE corpus (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO corpus VALUES (?, ?)", CORPUS)
    twin = pii_twin_sql("text")
    want = con.sql(
        "SELECT doc_id, "
        + ", ".join(f"{twin[f'n_{k}']} AS n_{k}" for k in PII_ORDER)
        + f", {twin['scrubbed']} AS scrubbed FROM corpus"
    ).df()
    for _, w in want.iterrows():
        got = scrubbed_rows[w["doc_id"]]
        assert got["scrubbed"] == w["scrubbed"], w["doc_id"]
        for k in PII_ORDER:
            assert got[f"n_{k}"] == w[f"n_{k}"], (w["doc_id"], k)


def test_pii_scrub_values_and_attribution(scrubbed_rows):
    r = scrubbed_rows[0]
    assert r["scrubbed"] == "contact <EMAIL> or <EMAIL> today"
    assert r["n_email"] == 2 and r["n_phone"] == 0

    r = scrubbed_rows[2]
    assert "<SSN>" in r["scrubbed"] and "<PHONE>" in r["scrubbed"]
    assert "123-45-6789" not in r["scrubbed"]
    # the SSN is counted once as ssn, never double-counted as phone
    assert r["n_ssn"] == 1 and r["n_phone"] == 2

    r = scrubbed_rows[4]
    assert r["n_email"] == 1 and r["n_ipv4"] == 1
    assert r["n_ssn"] == 1 and r["n_phone"] == 1

    r = scrubbed_rows[3]
    assert r["scrubbed"] == CORPUS[3][1]  # untouched
    assert r["pii_chars_removed"] == 0

    assert scrubbed_rows[5]["scrubbed"] == ""


def test_pii_chars_removed_counts_original_span_chars(scrubbed_rows):
    # doc 0: both redacted emails' original characters, exactly
    emails = ["alice.smith+spam@example.co.uk", "bob@sub.domain.org"]
    assert scrubbed_rows[0]["pii_chars_removed"] == sum(len(e) for e in emails)
    assert scrubbed_rows[2]["pii_chars_removed"] > 0


def test_pii_chars_removed_nonnegative_for_short_spans(spark):
    # token longer than the span it replaced: 'a@b.cc' (6) -> '<EMAIL>' (7)
    from mbfbigdatarandomforest_spark.operators.pii import scrub_pii

    df = spark.createDataFrame([(0, "a@b.cc")], ["doc_id", "text"])
    r = scrub_pii(df, "text", out_col="scrubbed").collect()[0]
    assert r["scrubbed"] == "<EMAIL>"
    assert r["pii_chars_removed"] == 6


def test_pii_scrub_is_pure_projection(spark):
    """No exchange, no UDF — the scrub must compose into a one-pass
    funnel for free."""
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    plan = (
        scrub_pii(df, "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pii_phone_does_not_scrub_dates_timestamps_ids(scrubbed_rows):
    """ADVICE r7: the old free-form phone pattern rewrote ISO dates,
    epoch seconds, and plain ID digit runs as <PHONE>, consistently in
    both engines (invisible to the twin oracle). Pin that generic
    numeric text survives the structured pattern untouched."""
    for doc_id in (7, 8):
        r = scrubbed_rows[doc_id]
        assert r["scrubbed"] == CORPUS[doc_id][1], doc_id
        assert r["pii_chars_removed"] == 0
        for k in PII_ORDER:
            assert r[f"n_{k}"] == 0, (doc_id, k)


def test_pii_phone_still_catches_real_formats(spark):
    phones = [
        "+44 20 7946 0958",
        "+491701234567",
        "+1 (555) 123-4567",
        "(555) 123-4567",
        "555-123-4567",
        "555.123.4567",
        "020-7946-0958",
    ]
    df = spark.createDataFrame(
        [(i, f"call {p} now") for i, p in enumerate(phones)],
        ["doc_id", "text"],
    )
    rows = scrub_pii(df, "text", out_col="scrubbed").collect()
    for r in rows:
        assert r["scrubbed"] == "call <PHONE> now", phones[r["doc_id"]]
        assert r["n_phone"] == 1


def test_pii_null_text_counts_are_zero(scrubbed_rows):
    """NULL text must yield 0 counts (not NULL — NULL vanishes from
    downstream sums) and a NULL scrubbed string."""
    r = scrubbed_rows[9]
    assert r["scrubbed"] is None
    assert r["pii_chars_removed"] == 0
    for k in PII_ORDER:
        assert r[f"n_{k}"] == 0, k


def test_pii_raises_on_count_column_collision(spark):
    df = spark.createDataFrame(
        [(0, "hi", 3)], ["doc_id", "text", "n_email"]
    )
    with pytest.raises(ValueError, match="n_email"):
        scrub_pii(df, "text", out_col="scrubbed")


def test_pii_rejects_unknown_kind(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    with pytest.raises(ValueError, match="unknown PII kinds"):
        scrub_pii(df, kinds=("email", "passport"))
