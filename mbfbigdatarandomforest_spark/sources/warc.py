"""WARC (Web ARChive, ISO 28500) ingestion — the entry point of a
web-crawl training-data pipeline (crawl dump → records → HTML →
text → curation funnel).

Stdlib-only record parsing: a WARC file is a concatenation of
records, each `WARC/1.x\\r\\n` + header lines + `\\r\\n\\r\\n` +
exactly `Content-Length` payload bytes + `\\r\\n\\r\\n`. For
``WARC-Type: response`` records the payload is an HTTP message whose
body (after ITS header block) is the document the pipeline wants.

Spark shape: crawl dumps ship as many ~1 GB shard files, so
``spark.read.format("binaryFile")`` — one task per shard, records
split INSIDE the task by a generator that never materializes more
than one record's payload beyond the shard bytes Spark already
holds — is the natural scale unit (the same per-blob batching
posture as ``operators/multimodal.py``). Whole-file gzip shards
(the CommonCrawl layout is member-concatenated gzip, which stdlib
gzip also inflates end-to-end) are decompressed in-task. The record
splitter is factored over any (shard, content) frame so the
registered ``warc_ingest_stats`` query can drive it from in-Spark
fixture shards (``encode_warc_shards``) without touching the
filesystem; ``read_warc`` is the binaryFile front door.

The fixture encoder ``encode_warc`` plays the role encode_png /
encode_mp4_container play for the other binary parsers: spec-shaped
bytes for tests, no external tooling.
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = b"\r\n"

#: output schema of the record splitter — one row per kept record,
#: plus one (shard, error) quarantine row per malformed shard.
RECORD_SCHEMA = (
    "shard string, url string, record_type string, date string, "
    "status int, body binary, error string"
)


def parse_warc_records(payload: bytes) -> Iterator[dict]:
    """Yield {'record_type', 'url', 'date', 'status', 'headers',
    'body'} per record. HTTP response payloads are split into status +
    body; non-HTTP payloads (warcinfo, metadata) pass through whole
    with status None. Malformed framing raises ValueError (the
    quarantine contract shared by every binary parser in this repo) —
    including corrupt/truncated gzip shards, which stdlib surfaces as
    OSError/EOFError/zlib.error and would otherwise escape per-shard
    quarantine."""
    if payload[:2] == b"\x1f\x8b":  # whole-file (or member-concat) gzip
        try:
            payload = gzip.decompress(payload)
        except (OSError, EOFError, zlib.error) as e:
            raise ValueError(f"WARC gzip shard corrupt: {e}") from e
    pos, n = 0, len(payload)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and payload[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        head_end = payload.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError("WARC record header block unterminated")
        head_lines = payload[pos:head_end].decode("utf-8", "replace").split("\r\n")
        if not head_lines[0].startswith("WARC/"):
            raise ValueError("WARC version line missing")
        headers: dict[str, str] = {}
        for line in head_lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record missing a valid Content-Length")
        body_start = head_end + 4
        if body_start + length > n:
            raise ValueError("WARC record payload overruns file")
        raw = payload[body_start : body_start + length]
        status: int | None = None
        body = raw
        if headers.get("content-type", "").startswith("application/http"):
            split = raw.find(_CRLF + _CRLF)
            if split >= 0:
                status_line = raw[:split].split(_CRLF, 1)[0].decode("latin1")
                parts = status_line.split()
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                body = raw[split + 4 :]
        yield {
            "record_type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri", ""),
            "date": headers.get("warc-date", ""),
            "status": status,
            "body": body,
        }
        pos = body_start + length


def encode_warc(records: list[dict], compress: bool = False) -> bytes:
    """Fixture generator: spec-shaped WARC bytes from
    [{'url', 'body', 'record_type'?, 'date'?, 'status'?}, ...] —
    response records wrap the body in a minimal HTTP message."""
    out = bytearray()
    for r in records:
        rtype = r.get("record_type", "response")
        body = r["body"] if isinstance(r["body"], bytes) else r["body"].encode()
        if rtype == "response":
            http = (
                f"HTTP/1.1 {r.get('status', 200)} OK\r\n"
                f"Content-Type: text/html\r\nContent-Length: {len(body)}\r\n\r\n"
            ).encode() + body
            ctype = "application/http; msgtype=response"
        else:
            http, ctype = body, "application/warc-fields"
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {rtype}\r\n"
            f"WARC-Target-URI: {r.get('url', '')}\r\n"
            f"WARC-Date: {r.get('date', '2020-01-01T00:00:00Z')}\r\n"
            f"Content-Type: {ctype}\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        out += head + http + _CRLF + _CRLF
    data = bytes(out)
    if compress:
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(data)
        data = buf.getvalue()
    return data


def split_warc_records(
    shards: DataFrame,
    record_types: tuple[str, ...] = ("response",),
    shard_col: str = "shard",
    content_col: str = "content",
) -> DataFrame:
    """(shard, content-binary) frame → one row per WARC record.

    Records are split in-task by an Arrow-batched generator; a
    malformed shard becomes a single (shard, error) quarantine row
    rather than failing the scan — the multimodal ``extract_features``
    posture. Works identically over ``binaryFile`` output (via
    :func:`read_warc`) and in-Spark fixture shards
    (:func:`encode_warc_shards`)."""
    import pandas as pd

    def _split(batches):
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf[shard_col], pdf[content_col]):
                try:
                    for rec in parse_warc_records(bytes(content)):
                        if rec["record_type"] in record_types:
                            rows.append(
                                (
                                    fpath,
                                    rec["url"],
                                    rec["record_type"],
                                    rec["date"],
                                    rec["status"],
                                    rec["body"],
                                    None,
                                )
                            )
                except ValueError as e:
                    rows.append((fpath, None, None, None, None, None, str(e)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "shard", "url", "record_type", "date", "status",
                    "body", "error",
                ],
            )

    return shards.select(shard_col, content_col).mapInPandas(
        _split, schema=RECORD_SCHEMA
    )


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """WARC shard files → (shard, url, record_type, date, status, body).

    One binaryFile row per shard (crawl shards are the unit of
    parallelism — size `spark.sql.files.maxPartitionBytes` ≥ shard
    size so a shard never splits), records split in-task by
    :func:`split_warc_records`."""
    files = spark.read.format("binaryFile").load(path)
    return split_warc_records(
        files.select(F.col("path").alias("shard"), "content"),
        record_types=record_types,
    )


def warc_to_documents(
    spark: SparkSession,
    path: str,
    lang_col: bool = True,
    drop_invalid_utf8: bool = False,
) -> DataFrame:
    """Crawl dump → curation-ready documents frame: successful HTML
    responses extracted to text (``operators.text.html_to_text``),
    keyed by ``xxhash64(url)``, provenance = the URL's registered
    domain, language via the marker heuristic. The frame matches the
    ``documents`` table contract (doc_id, text, lang, source) so the
    whole curation funnel — ``run_curation_pipeline.py --warc-dir`` —
    runs off a dump directly.

    Decoding is TOLERANT per record (ADVICE r10): real crawls carry
    non-UTF-8 (latin-1 etc.) pages, and Spark 4's strict ``decode``
    fails the whole scan on the first malformed body. Default: bad
    bytes are replaced with U+FFFD (``make_valid_utf8`` — the C4/CCNet
    posture of keeping the page and letting downstream quality filters
    judge it); ``drop_invalid_utf8=True`` drops non-UTF-8 pages at the
    scan instead (``is_valid_utf8``)."""
    return warc_documents_projection(
        read_warc(spark, path),
        lang_col=lang_col,
        drop_invalid_utf8=drop_invalid_utf8,
    )


def warc_documents_projection(
    recs: DataFrame,
    lang_col: bool = True,
    drop_invalid_utf8: bool = False,
) -> DataFrame:
    """Record frame (:func:`split_warc_records` output) → documents
    contract. Factored out of :func:`warc_to_documents` (r11) so the
    STREAMING front door (``streaming/warc.py``) runs the identical
    projection: every stage is a stateless column expression (filter,
    hash, regexp chains), so the plan is append-mode-legal on an
    unbounded record frame — stream ≡ batch by construction."""
    from ..operators.text import html_to_text, lang_id
    from ..operators.urls import url_registered_domain

    recs = recs.filter(F.col("error").isNull() & (F.col("status") == 200))
    if drop_invalid_utf8:
        recs = recs.filter(F.expr("is_valid_utf8(body)"))
    pages = recs.select(
        F.xxhash64("url").alias("doc_id"),
        "url",
        F.expr("make_valid_utf8(cast(body as string))").alias("html"),
    )
    docs = html_to_text(pages, "html", "text").select(
        "doc_id", "text", url_registered_domain("url").alias("source")
    )
    if lang_col:
        docs = lang_id(docs, "text", out_col="lang")
    return docs


def encode_warc_shards(
    df: DataFrame,
    shard_col: str = "shard_id",
    url_col: str = "url",
    status_col: str = "status",
    body_col: str = "body",
    compress_odd: bool = True,
) -> DataFrame:
    """Documents → WARC shard blobs, one row per shard: the in-Spark
    twin of a crawl dump for the registered ingestion query.

    Groups by ``shard_col`` (applyInPandas — one task per shard, the
    same unit of parallelism real crawl shards have), sorts each group
    by ``url_col`` so shard bytes are deterministic, and gzip-wraps odd
    shard ids so the registered query exercises both the plain and the
    compressed decode path in one run. ``body_col`` may be binary or
    string."""
    import pandas as pd

    def _encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(url_col, kind="mergesort")
        sid = int(pdf[shard_col].iloc[0])
        compress = compress_odd and sid % 2 == 1
        records = [
            {"url": u, "status": int(s), "body": b}
            for u, s, b in zip(pdf[url_col], pdf[status_col], pdf[body_col])
        ]
        name = f"shard-{sid:05d}.warc" + (".gz" if compress else "")
        return pd.DataFrame(
            {"shard": [name], "content": [encode_warc(records, compress=compress)]}
        )

    return df.groupBy(shard_col).applyInPandas(
        _encode, schema="shard string, content binary"
    )
