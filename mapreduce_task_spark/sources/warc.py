"""WARC (Web ARChive, ISO 28500) source — the container format real
crawls arrive in (Common Crawl, Heritrix, wget --warc), wired to the
engine's pipeline head: WARC -> HTTP responses -> ``html_to_text`` ->
documents, feeding every downstream operator (dedup ladder, quality,
indexes).

Format recap: a WARC file is a concatenation of records; each record
is a ``WARC/1.x`` version line, ``Name: value`` header lines, a blank
line, exactly ``Content-Length`` bytes of content block, and a
``\\r\\n\\r\\n`` trailer. ``.warc.gz`` files gzip each record as its own
member; Python's zlib handles multi-member streams natively, so one
decompress pass recovers the concatenated records. For ``response``
records the content block is an HTTP message: status line + headers +
``\\r\\n\\r\\n`` + body.

Spark shape: ``spark.read.format("binaryFile")`` gives one row per
WARC file; an Arrow ``mapInPandas`` stage parses records out of each
file (the documented legitimate-Python-stage posture — a
record-concatenated, usually-gzipped container is not splittable by
byte offset, so per-file parsing IS the parallel unit). That matches
how crawls are stored at 100 TB: the WARC writers rotate at ~1 GB by
convention precisely so that file count = parallelism; ~100k files
keep every core busy without any splitting. Payload bytes ride Arrow
batches; nothing is collected to the driver.

Degradation contract (lenient by default, like the decoders): a
malformed or truncated record ends that FILE's parse — records before
it are kept, and the parse error is surfaced on a per-file ``_error``
row (warc_type="_error") rather than killing the task; crawls
truncate mid-record when interrupted, and losing a tail record must
not lose the file. ``strict=True`` raises instead.

Cite: reference consumes pre-extracted text files only (SURVEY §2.1);
this extends the source surface to the format the 100 TB north-star
corpus actually ships in.
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

WARC_SCHEMA = (
    "src_file string, record_id string, warc_type string, "
    "target_uri string, warc_date string, content_type string, "
    "content_length bigint, payload binary"
)

HTTP_SCHEMA = (
    "src_file string, record_id string, target_uri string, "
    "warc_date string, http_status int, http_content_type string, "
    "body binary"
)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream; raises
    ValueError on a corrupt stream (a truncated FINAL member is
    tolerated — interrupted crawls end that way)."""
    out = io.BytesIO()
    try:
        with gzip.GzipFile(fileobj=io.BytesIO(data)) as g:
            while True:
                chunk = g.read(1 << 20)
                if not chunk:
                    break
                out.write(chunk)
    except EOFError:
        pass  # truncated final member: keep what decompressed
    except (OSError, zlib.error) as e:
        raise ValueError(f"corrupt gzip stream: {e}") from e
    return out.getvalue()


def iter_warc_records(data: bytes, strict: bool = False):
    """Yield (headers: dict[lowercased name -> value], content: bytes)
    per record. Lenient mode stops at the first malformed record and
    raises only if NOTHING parsed and input was non-empty; strict mode
    raises on any malformation."""
    pos = 0
    n = len(data)
    yielded = 0
    while pos < n:
        while data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        if not data[pos : pos + 5] == b"WARC/":
            if strict or not yielded:
                raise ValueError(f"not a WARC record at offset {pos}")
            return
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            if strict:
                raise ValueError("truncated WARC header block")
            return
        headers: dict[str, str] = {}
        lines = data[pos:hdr_end].split(b"\r\n")
        for line in lines[1:]:  # lines[0] is the version line
            name, sep, value = line.partition(b":")
            if not sep:
                if strict:
                    raise ValueError(f"malformed WARC header line {line!r}")
                return
            headers[name.strip().decode("latin-1").lower()] = (
                value.strip().decode("latin-1")
            )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            if strict:
                raise ValueError("WARC record without Content-Length")
            return
        body_start = hdr_end + 4
        if body_start + length > n:
            if strict:
                raise ValueError("truncated WARC content block")
            return
        yield headers, data[body_start : body_start + length]
        yielded += 1
        pos = body_start + length


def split_http_response(content: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, body) out of an HTTP message block;
    (None, None, b'') when the block is not parseable HTTP."""
    sep = content.find(b"\r\n\r\n")
    if sep < 0:
        return None, None, b""
    head = content[:sep].split(b"\r\n")
    status = None
    parts = head[0].split(None, 2)
    if len(parts) >= 2 and parts[0][:5] == b"HTTP/":
        try:
            status = int(parts[1])
        except ValueError:
            status = None
    if status is None:
        return None, None, b""
    ctype = None
    for line in head[1:]:
        name, s, value = line.partition(b":")
        if s and name.strip().lower() == b"content-type":
            ctype = value.strip().decode("latin-1")
            break
    return status, ctype, content[sep + 4 :]


def warc_records(
    spark: SparkSession, path: str, strict: bool = False
) -> DataFrame:
    """One row per WARC record across every matched file (``.warc``
    and ``.warc.gz`` alike). Parse failures become one
    ``warc_type='_error'`` row per file carrying the message in
    ``target_uri`` (lenient mode keeps the records before the fault)."""

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        cols = (
            "src_file", "record_id", "warc_type", "target_uri",
            "warc_date", "content_type", "content_length", "payload",
        )
        for b in batches:
            rows: list[tuple] = []
            for path_, content in zip(b["path"], b["content"]):
                data = bytes(content)
                try:
                    if data[:2] == b"\x1f\x8b":
                        data = _gunzip_members(data)
                    for h, payload in iter_warc_records(data, strict=strict):
                        rows.append(
                            (
                                path_,
                                h.get("warc-record-id"),
                                h.get("warc-type"),
                                h.get("warc-target-uri"),
                                h.get("warc-date"),
                                h.get("content-type"),
                                len(payload),
                                payload,
                            )
                        )
                except ValueError as e:
                    rows.append(
                        (path_, None, "_error", str(e)[:500], None, None,
                         None, None)
                    )
            yield pd.DataFrame(rows, columns=list(cols))

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(parse, WARC_SCHEMA)


def warc_http_responses(records: DataFrame) -> DataFrame:
    """Filter to ``response`` records and split the HTTP message:
    (src_file, record_id, target_uri, warc_date, http_status,
    http_content_type, body). Non-HTTP response blocks drop (their
    status is unparseable)."""

    def split(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        cols = (
            "src_file", "record_id", "target_uri", "warc_date",
            "http_status", "http_content_type", "body",
        )
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                status, ctype, body = split_http_response(bytes(r.payload))
                if status is None:
                    continue
                rows.append(
                    (r.src_file, r.record_id, r.target_uri, r.warc_date,
                     status, ctype, body)
                )
            yield pd.DataFrame(rows, columns=list(cols))

    resp = records.filter(F.col("warc_type") == "response").select(
        "src_file", "record_id", "target_uri", "warc_date", "payload"
    )
    return resp.mapInPandas(split, HTTP_SCHEMA)


def warc_to_documents(
    spark: SparkSession, path: str, status_ok_only: bool = True
) -> DataFrame:
    """The composed pipeline head: WARC files -> 200-status text/html
    responses -> ``html_to_text`` -> (doc_id, url, fetched_at, text).
    ``doc_id`` is the 60-bit portable hash of the record id (stable
    across re-parses, unique per fetch); everything downstream of this
    frame is the engine's existing documents surface. The HTML body
    decodes as UTF-8 with replacement (charset sniffing is a
    documented simplification — the extraction operator is
    byte-determined either way)."""
    from ..functions.hashing import hash64
    from ..operators.extract import html_to_text

    http = warc_http_responses(warc_records(spark, path))
    if status_ok_only:
        http = http.filter(F.col("http_status") == 200)
    html = http.filter(
        F.lower(F.coalesce(F.col("http_content_type"), F.lit(""))).contains(
            "text/html"
        )
    )
    docs = html.select(
        hash64(F.col("record_id")).alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("warc_date").alias("fetched_at"),
        F.decode(F.col("body"), "UTF-8").alias("text"),
    )
    return html_to_text(docs)
