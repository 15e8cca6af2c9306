"""WARC ingestion oracle tests (sources/warc.py).

Three layers, mirroring the other binary-parser suites
(test_multimodal.py): (1) pure-Python encode→parse roundtrips
including member-concatenated gzip and the malformed-framing
ValueError contract, (2) the Spark scan path — read_warc over real
shard files with a corrupt shard quarantined, (3) the registered
``warc_ingest_stats`` query against its exact DuckDB twin computed
straight off the documents table (the derivation is deterministic,
so the twin needs no WARC parsing at all).
"""

from __future__ import annotations

import gzip

import pytest

from mbfbigdatarandomforest_spark.plans.llm_ops import (
    WARC_N_SHARDS,
    WARC_STATUS_MOD,
)
from mbfbigdatarandomforest_spark.registry import load_all
from mbfbigdatarandomforest_spark.sources.warc import (
    encode_warc,
    parse_warc_records,
    read_warc,
)

from conftest import SF_DIR_ORACLE

RECORDS = [
    {"url": "https://a.example/1", "status": 200, "body": b"<html>one</html>"},
    {"url": "https://a.example/2", "status": 404, "body": "not føund"},
    {
        "url": "https://a.example/meta",
        "record_type": "metadata",
        "body": b"k: v\r\n",
    },
    {"url": "https://a.example/3", "status": 200, "body": b""},
]


def _bodies(records):
    return [
        r["body"] if isinstance(r["body"], bytes) else r["body"].encode()
        for r in records
    ]


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip(compress):
    blob = encode_warc(RECORDS, compress=compress)
    got = list(parse_warc_records(blob))
    assert [g["url"] for g in got] == [r["url"] for r in RECORDS]
    assert [g["body"] for g in got] == _bodies(RECORDS)
    assert [g["status"] for g in got] == [200, 404, None, 200]
    assert [g["record_type"] for g in got] == [
        "response", "response", "metadata", "response",
    ]


def test_member_concatenated_gzip():
    """The CommonCrawl layout: one gzip member per record, shards are
    raw concatenations of members — stdlib inflates end-to-end."""
    blob = b"".join(encode_warc([r], compress=True) for r in RECORDS)
    got = list(parse_warc_records(blob))
    assert [g["url"] for g in got] == [r["url"] for r in RECORDS]
    assert [g["body"] for g in got] == _bodies(RECORDS)


@pytest.mark.parametrize(
    "blob, msg",
    [
        (b"WARC/1.0\r\nContent-Length: 4\r\n", "unterminated"),
        (b"HTTP/1.1 200 OK\r\n\r\n", "version line"),
        (b"WARC/1.0\r\nWARC-Type: response\r\n\r\n", "Content-Length"),
        (
            encode_warc([{"url": "u", "body": b"full body here"}])[:-20],
            "overruns",
        ),
        # corrupt gzip must surface as ValueError, not BadGzipFile /
        # EOFError / zlib.error (the quarantine contract)
        (b"\x1f\x8b" + b"\x00" * 30, "gzip shard corrupt"),
        (encode_warc(RECORDS, compress=True)[:40], "gzip shard corrupt"),
    ],
)
def test_malformed_raises_valueerror(blob, msg):
    with pytest.raises(ValueError, match=msg):
        list(parse_warc_records(blob))


def test_gzip_magic_prefix_truncated_member():
    """A shard whose trailing gzip member is cut mid-stream."""
    good = encode_warc([RECORDS[0]], compress=True)
    bad = good + gzip.compress(b"WARC/1.0\r\n")[:8]
    with pytest.raises(ValueError, match="gzip shard corrupt"):
        list(parse_warc_records(bad))


def test_roundtrip_arbitrary_binary_bodies():
    """Content-Length framing must survive bodies containing CRLF,
    CRLFCRLF, gzip magic, WARC version lines — any bytes at all."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.binary(min_size=0, max_size=200).map(
                lambda b: {"url": "u", "body": b}
            ),
            min_size=1,
            max_size=5,
        ),
        st.booleans(),
    )
    def check(records, compress):
        got = list(parse_warc_records(encode_warc(records, compress=compress)))
        assert [g["body"] for g in got] == [r["body"] for r in records]

    check()


def test_roundtrip_trap_bodies():
    """The specific framing traps, deterministically (hypothesis may
    not generate them): CRLFCRLF inside a body, a body that IS a WARC
    version line, gzip magic mid-body."""
    traps = [
        b"\r\n\r\n",
        b"x\r\n\r\nWARC/1.0\r\nContent-Length: 0\r\n\r\n",
        b"WARC/1.0",
        b"\x1f\x8b\x08\x00",
        b"HTTP/1.1 500 Oops\r\n\r\nbody",
    ]
    records = [{"url": f"t{i}", "body": b} for i, b in enumerate(traps)]
    for compress in (False, True):
        got = list(parse_warc_records(encode_warc(records, compress=compress)))
        assert [g["body"] for g in got] == traps


def test_read_warc_quarantines_bad_shard(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "s0.warc").write_bytes(encode_warc(RECORDS))
    (d / "s1.warc.gz").write_bytes(encode_warc(RECORDS, compress=True))
    (d / "s2.warc").write_bytes(b"NOT A WARC AT ALL\r\n\r\n")
    out = read_warc(spark, str(d)).toPandas()
    good = out[out["error"].isnull()]
    bad = out[out["error"].notnull()]
    # response records only (metadata filtered by default), both shards
    assert len(good) == 6
    assert sorted(good["status"].unique().tolist()) == [200, 404]
    resp_bodies = sorted(
        _bodies([r for r in RECORDS if r.get("record_type", "response") == "response"])
    )
    for shard_suffix in ("s0.warc", "s1.warc.gz"):
        shard_rows = good[good["shard"].str.endswith(shard_suffix)]
        assert sorted(bytes(b) for b in shard_rows["body"]) == resp_bodies
    assert len(bad) == 1
    assert bad["shard"].iloc[0].endswith("s2.warc")
    assert "version line" in bad["error"].iloc[0]


def test_warc_to_documents_end_to_end(spark, tmp_path):
    """Crawl dump → curation-ready documents (the --warc-dir CLI path):
    HTML responses become (doc_id, text, source, lang) rows; non-200
    responses and quarantined shards drop out; text is the extracted
    visible content."""
    from mbfbigdatarandomforest_spark.sources.warc import warc_to_documents

    pages = [
        {
            "url": "https://en.blog.example.com/a",
            "status": 200,
            "body": "<html><body><p>the cat and the dog went home from work"
                    "</p></body></html>",
        },
        {
            "url": "https://de.example.org/b",
            "status": 200,
            "body": "<p>der Hund und die Katze sind nicht das Problem und</p>",
        },
        {
            "url": "https://gone.example.net/c",
            "status": 404,
            "body": "<html>not found</html>",
        },
    ]
    d = tmp_path / "dump"
    d.mkdir()
    (d / "s0.warc").write_bytes(encode_warc(pages[:2]))
    (d / "s1.warc.gz").write_bytes(encode_warc(pages[2:], compress=True))
    (d / "s2.warc").write_bytes(b"garbage shard")
    docs = warc_to_documents(spark, str(d)).collect()
    by_src = {r["source"]: r for r in docs}
    assert set(by_src) == {"example.com", "example.org"}  # 404 + bad gone
    en = by_src["example.com"]
    assert en["text"] == "the cat and the dog went home from work"
    assert en["lang"] == "en"
    de = by_src["example.org"]
    assert de["text"].startswith("der Hund")
    assert de["lang"] == "de"
    assert all(r["doc_id"] is not None for r in docs)


def test_warc_to_documents_tolerates_non_utf8(spark, tmp_path):
    """ADVICE r10: a latin-1 page must not fail the scan. Default: bad
    bytes replaced with U+FFFD, the page survives; drop_invalid_utf8
    drops it at the scan while valid pages pass unchanged."""
    from mbfbigdatarandomforest_spark.sources.warc import warc_to_documents

    good = "<p>plain ascii page body here</p>"
    latin1 = "<p>caf\xe9 men\xfc</p>".encode("latin-1")  # invalid UTF-8
    pages = [
        {"url": "https://ok.example.com/a", "status": 200, "body": good},
        {"url": "https://l1.example.org/b", "status": 200, "body": latin1},
    ]
    d = tmp_path / "dump"
    d.mkdir()
    (d / "s0.warc").write_bytes(encode_warc(pages))

    kept = {r["source"]: r for r in warc_to_documents(spark, str(d)).collect()}
    assert set(kept) == {"example.com", "example.org"}
    assert kept["example.com"]["text"] == "plain ascii page body here"
    assert "�" in kept["example.org"]["text"]  # replaced, not raised

    strict = warc_to_documents(spark, str(d), drop_invalid_utf8=True).collect()
    assert {r["source"] for r in strict} == {"example.com"}


def test_warc_ingest_stats_duckdb_twin(spark, duck):
    spec = load_all()["warc_ingest_stats"]
    got = spec.fn(spark, SF_DIR_ORACLE).toPandas()
    want = duck.sql(f"""
        SELECT CASE WHEN doc_id % {WARC_STATUS_MOD} = 0 THEN 404 ELSE 200 END AS status,
               COUNT(*) AS n_records,
               SUM(strlen(text)) AS total_body_bytes,
               COUNT(DISTINCT doc_id % {WARC_N_SHARDS}) AS n_shards,
               0 AS n_quarantined
        FROM documents GROUP BY 1 ORDER BY status
    """).df()
    assert got["status"].tolist() == want["status"].tolist()
    assert got["n_records"].tolist() == want["n_records"].tolist()
    assert got["total_body_bytes"].tolist() == want["total_body_bytes"].tolist()
    assert got["n_shards"].tolist() == want["n_shards"].tolist()
    assert got["n_quarantined"].tolist() == want["n_quarantined"].tolist()


def test_curation_pipeline_warc_dir_with_frontier(tmp_path):
    """--warc-dir + --frontier-out: one command closes the crawl loop —
    the dump is curated AND the next fetch frontier comes out: links
    extracted from the dump's pages, robots.txt bodies FOUND IN THE
    DUMP enforced, domains ranked by observed-link PageRank, per-domain
    cap applied."""
    import json
    import subprocess
    import sys

    body_text = (
        "the quick brown document number {i} talks about topic {t} and "
        "the text keeps going with plenty of ordinary words so that the "
        "gopher quality rules accept it happily as a real document"
    )

    def page(url, i, *hrefs):
        anchors = "".join(f'<a href="{h}">l</a>' for h in hrefs)
        return {
            "url": url,
            "status": 200,
            "body": f"<html><body><p>{body_text.format(i=i, t=i % 3)}</p>"
                    f"{anchors}</body></html>",
        }

    pages = [
        page(
            f"https://hub.example/p/{i}",
            i,
            f"https://content.example/a/{i}",
            f"https://content.example/blocked/{i}",
            "https://hub.example/p/0",
        )
        for i in range(12)
    ] + [
        page(f"https://content.example/a/{i}", 100 + i,
             "https://hub.example/p/1")
        for i in range(4)
    ] + [
        {
            "url": "https://content.example/robots.txt",
            "status": 200,
            # r13: the Sitemap: line is a DISCOVERY source — the
            # declared file must land on the frontier as a fetch
            "body": "User-agent: *\nDisallow: /blocked\n"
                    "Sitemap: https://content.example/maps/more.xml\n",
        },
        {
            "url": "https://content.example/sitemap.xml",
            "status": 200,
            "body": (
                '<?xml version="1.0"?><urlset>'
                "<url><loc>https://content.example/a/0</loc></url>"  # dup of an anchor
                "<url><loc>https://content.example/new/1</loc></url>"
                "</urlset>"
            ),
        },
    ]
    d = tmp_path / "dump"
    d.mkdir()
    (d / "s0.warc").write_bytes(encode_warc(pages[:9]))
    (d / "s1.warc.gz").write_bytes(encode_warc(pages[9:], compress=True))
    out = tmp_path / "cur"
    fr = tmp_path / "frontier"
    sp = tmp_path / "schedule"
    r = subprocess.run(
        [
            sys.executable, "run_curation_pipeline.py",
            "--warc-dir", str(d), "--out", str(out),
            "--frontier-out", str(fr), "--frontier-cap", "3",
            "--schedule-out", str(sp),
            "--max-tokens", "64",
        ],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads((out / "summary.json").read_text())
    assert summary["stages"]["0_raw"] >= 16
    f = summary["frontier"]
    # discovered: 12 distinct content/a + hub/p/0 + hub/p/1 (anchors;
    # the 12 content/blocked dropped by robots) + the sitemap's ONE new
    # loc (its /a/0 loc dedupes against the anchor-discovered page) +
    # the robots-DECLARED sitemap file (r13)
    assert f["discovered"] == 16
    assert f["domains"] == 2
    assert f["scheduled"] == 3 + 2  # content capped at 3, hub has 2
    import pandas as pd

    fdf = pd.read_parquet(fr)
    assert not fdf["url"].str.contains("/blocked/").any()
    assert fdf["rank"].notna().all()  # both domains in the link graph
    content = fdf[fdf["domain"] == "content.example"]
    assert len(content) == 14 and int(content["kept"].sum()) == 3
    assert (fdf["url"] == "https://content.example/new/1").any()  # sitemap loc
    # r13: the robots-declared sitemap file is itself a candidate
    assert (fdf["url"] == "https://content.example/maps/more.xml").any()
    # r12: --schedule-out emits the fetch PLAN over the kept rows —
    # per-host slots, offsets spaced by the default 1.0 s budget (the
    # fixture declares no crawl-delay)
    sdf = pd.read_parquet(sp).sort_values(["host", "slot"])
    assert len(sdf) == 5  # exactly the kept rows
    assert set(sdf["url"]) == set(fdf[fdf["kept"]]["url"])
    content_s = sdf[sdf["host"] == "content.example"]
    assert content_s["slot"].tolist() == [1, 2, 3]
    assert content_s["fetch_offset_s"].tolist() == [0.0, 1.0, 2.0]
    assert summary["frontier"]["schedule_makespan_s"] == 2.0


def test_two_round_crawl_loop_ledger_and_budget_refill(tmp_path):
    """r11 verdict item 7: the loop the --frontier-out/--seen-urls
    flags exist for, driven END TO END through the CLI twice — round
    1's scheduled frontier becomes the fetch ledger, round 2's dump
    re-discovers every round-1 page plus new ones, and the round-2
    frontier must (a) exclude everything already scheduled and (b)
    re-fill the per-domain budget with genuinely new pages."""
    import json
    import subprocess
    import sys

    import pandas as pd

    body = (
        "the quick brown document number {i} keeps talking with plenty "
        "of ordinary words so the gopher quality rules accept it"
    )

    def hub_page(i, hrefs):
        anchors = "".join(f'<a href="{h}">l</a>' for h in hrefs)
        return {
            "url": f"https://hub.example/p/{i}",
            "status": 200,
            "body": f"<html><body><p>{body.format(i=i)}</p>"
                    f"{anchors}</body></html>",
        }

    a_pages = [f"https://content.example/a/{i}" for i in range(6)]
    b_pages = [f"https://content.example/b/{i}" for i in range(3)]

    def run_round(tag, hrefs, seen_dir=None, extra_records=(), extra_args=()):
        d = tmp_path / f"dump{tag}"
        d.mkdir()
        (d / "s0.warc").write_bytes(
            encode_warc([hub_page(tag, hrefs), *extra_records])
        )
        fr = tmp_path / f"frontier{tag}"
        cmd = [
            sys.executable, "run_curation_pipeline.py",
            "--warc-dir", str(d), "--out", str(tmp_path / f"cur{tag}"),
            "--frontier-out", str(fr), "--frontier-cap", "3",
            "--max-tokens", "64", *extra_args,
        ]
        if seen_dir is not None:
            cmd += ["--seen-urls", str(seen_dir)]
        r = subprocess.run(
            cmd, capture_output=True, text=True, timeout=600,
            cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        json.loads((tmp_path / f"cur{tag}" / "summary.json").read_text())
        return pd.read_parquet(fr)

    f1 = run_round(1, a_pages)
    c1 = f1[f1["domain"] == "content.example"]
    assert len(c1) == 6 and int(c1["kept"].sum()) == 3  # cap bites
    # the fetch ledger a crawler would keep: the SCHEDULED urls
    ledger = tmp_path / "ledger"
    ledger.mkdir()
    f1[f1["kept"]][["url"]].to_parquet(ledger / "part.parquet")
    # round 2 re-discovers all of round 1 plus three new pages
    f2 = run_round(2, a_pages + b_pages, seen_dir=ledger)
    scheduled_r1 = set(f1[f1["kept"]]["url"])
    assert not (set(f2["url"]) & scheduled_r1)  # ledger excludes them
    c2 = f2[f2["domain"] == "content.example"]
    # 9 content candidates minus the 3 already scheduled
    assert len(c2) == 6
    # the budget RE-FILLS: 3 more pages scheduled, all genuinely new
    assert int(c2["kept"].sum()) == 3
    assert not (set(c2[c2["kept"]]["url"]) & scheduled_r1)
    # two rounds together scheduled 6 distinct content pages
    scheduled_r2 = set(c2[c2["kept"]]["url"])
    assert len(scheduled_r1 | scheduled_r2) >= 6

    # ---- round 3 (r13, verdict item 5): the freshness leg. The
    # accumulated ledger carries scheduled_at; the round-3 dump serves
    # a sitemap with a BUMPED lastmod for one scheduled page and an
    # OLDER lastmod for another. The bumped page must re-enter the
    # frontier (flagged recrawl, scheduled into its host's LAST slot);
    # the unchanged one must stay excluded.
    all_scheduled = sorted(scheduled_r1 | scheduled_r2)
    bumped, unchanged = all_scheduled[0], all_scheduled[1]
    ledger3 = tmp_path / "ledger3"
    ledger3.mkdir()
    pd.DataFrame(
        {
            "url": all_scheduled,
            "scheduled_at": ["2024-02-25 00:00:00"] * len(all_scheduled),
        }
    ).to_parquet(ledger3 / "part.parquet")
    sitemap_xml = (
        '<?xml version="1.0"?><urlset>'
        f"<url><loc>{bumped}</loc><lastmod>2024-02-28</lastmod></url>"
        f"<url><loc>{unchanged}</loc><lastmod>2024-02-20</lastmod></url>"
        "</urlset>"
    )
    c_pages = [f"https://content.example/c/{i}" for i in range(2)]
    f3 = run_round(
        3,
        c_pages,
        seen_dir=ledger3,
        extra_records=[
            {
                "url": "https://content.example/sitemap.xml",
                "status": 200,
                "body": sitemap_xml,
            }
        ],
        extra_args=[
            "--recrawl-as-of", "2024-03-01 00:00:00",
            "--schedule-out", str(tmp_path / "sched3"),
        ],
    )
    summary3 = json.loads((tmp_path / "cur3" / "summary.json").read_text())
    fc = summary3["frontier"]
    assert fc["recrawl_due"] == 1  # lastmod bumped; nothing TTL-stale
    c3 = f3[f3["domain"] == "content.example"]
    assert bumped in set(c3["url"])  # re-entered via the change signal
    assert unchanged not in set(f3["url"])  # older lastmod = no signal
    assert bool(c3[c3["url"] == bumped]["recrawl"].iloc[0])
    # 2 fresh + 1 recrawl = 3 ≤ cap: all kept, and the recrawl takes
    # the host's LAST slot (demoted below fresh discoveries)
    assert int(c3["kept"].sum()) == 3
    assert fc["recrawl_scheduled"] == 1
    sched3 = pd.read_parquet(tmp_path / "sched3")
    host_rows = sched3[sched3["host"] == "content.example"]
    assert len(host_rows) == 3
    brow = host_rows[host_rows["url"] == bumped]
    assert bool(brow["recrawl"].iloc[0])
    assert int(brow["slot"].iloc[0]) == int(host_rows["slot"].max())
