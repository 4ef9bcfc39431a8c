"""WARC (Web ARChive, ISO 28500) record reader — r14. The container
format web-scale training corpora actually ship in (Common Crawl
publishes crawl data as gzipped WARC), so a 100 TB ingest pipeline
needs a distributed record extractor in front of every text stage.

Surface:

* ``parse_warc(blob)`` — pure-stdlib parser for one WARC file image:
  handles both PLAIN concatenated records and the Common Crawl layout
  of one GZIP MEMBER per record (multi-member streams split with
  zlib; both may be mixed), the ``WARC/1.x`` version line, header
  block, exact ``Content-Length`` payload framing and the CRLF CRLF
  record separator. For ``response`` records the embedded HTTP/1.x
  status line + headers are parsed and the body extracted.
* ``warc_records(df)`` — the distributed form: an Arrow-batched
  ``mapInPandas`` kernel mapping (file_id, content) rows to one row
  per record with per-FILE error capture (a corrupt archive must not
  kill a 100 TB job), the same kernel discipline as the media codecs.
* ``synth_warc_media(ids)`` — closed-form fixture (warcinfo + per-doc
  request/response record pairs, bodies generated from (id, seq)
  formulas, alternating plain/gzip files) so a SQL oracle replays
  record counts, lengths, status codes and body digests with no WARC
  bytes involved.

Reference parity note: the reference engine has no archive sources;
this is beyond-reference training-data-pipeline surface, same family
as the PNG/JPEG/GIF/WAV codecs.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

WARC_RECORD_SCHEMA = T.StructType([
    T.StructField("file_id", T.LongType(), False),
    T.StructField("rec_idx", T.IntegerType(), True),
    T.StructField("warc_type", T.StringType(), True),
    T.StructField("record_id", T.StringType(), True),
    T.StructField("target_uri", T.StringType(), True),
    T.StructField("warc_date", T.StringType(), True),
    T.StructField("content_length", T.LongType(), True),
    T.StructField("http_status", T.IntegerType(), True),
    T.StructField("http_content_type", T.StringType(), True),
    T.StructField("body", T.BinaryType(), True),
    T.StructField("parse_ok", T.BooleanType(), False),
    T.StructField("error", T.StringType(), True),
])


# Per-file decompressed-size bound: crawl data is untrusted, and a small
# decompression bomb must raise (caught per-file upstream) instead of
# exhausting executor memory (r15 ADVICE fix).
GUNZIP_CAP = 256 * 1024 * 1024


def _gunzip_members(data: bytes, cap: int = GUNZIP_CAP) -> bytes:
    """Decompress a (possibly multi-member) gzip stream; plain input
    passes through untouched. Output beyond ``cap`` bytes raises."""
    if len(data) < 2 or data[:2] != b"\x1f\x8b":
        return data
    out = bytearray()
    rest = data
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        chunk_in = rest
        try:
            while True:
                out += d.decompress(chunk_in, cap - len(out) + 1)
                if len(out) > cap:
                    raise ValueError(
                        f"gzip stream expands past {cap} bytes — "
                        "possible decompression bomb")
                if not d.unconsumed_tail:
                    break
                chunk_in = d.unconsumed_tail
        except zlib.error as e:
            raise ValueError(f"corrupt gzip member: {e}") from None
        if not d.eof:
            raise ValueError("truncated gzip member in WARC stream")
        rest = d.unused_data
    if rest:
        raise ValueError("trailing garbage after gzip members")
    return bytes(out)


def _parse_http_response(payload: bytes) -> tuple[int | None, str | None,
                                                  bytes]:
    """Split an HTTP/1.x response payload into (status, content-type,
    body); non-HTTP payloads come back (None, None, payload)."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("HTTP payload without header terminator")
    head = payload[:sep].decode("latin-1").split("\r\n")
    parts = head[0].split(" ", 2)
    if len(parts) < 2 or not parts[1].isdigit():
        raise ValueError(f"bad HTTP status line: {head[0][:60]}")
    status = int(parts[1])
    ctype = None
    for line in head[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
    return status, ctype, payload[sep + 4:]


def parse_warc(blob: bytes) -> list[dict]:
    """Parse one WARC file image into record dicts (see
    WARC_RECORD_SCHEMA fields, minus file_id/parse_ok/error)."""
    if blob is None:
        raise ValueError("null content")
    data = _gunzip_members(bytes(blob))
    pos = 0
    records = []
    while pos < len(data):
        # tolerate blank separators between records
        while data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= len(data):
            break
        eol = data.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("truncated WARC version line")
        version = data[pos:eol].decode("latin-1")
        if not version.startswith("WARC/"):
            raise ValueError(f"bad WARC version line: {version[:40]}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = data.find(b"\r\n", pos)
            if eol < 0:
                raise ValueError("truncated WARC header block")
            line = data[pos:eol].decode("latin-1")
            pos = eol + 2
            if not line:
                break
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("missing/bad WARC Content-Length") from None
        payload = data[pos:pos + clen]
        if len(payload) < clen:
            raise ValueError("truncated WARC payload")
        pos += clen
        if data[pos:pos + 4] != b"\r\n\r\n":
            raise ValueError("missing WARC record separator")
        pos += 4
        wtype = headers.get("warc-type")
        status, ctype, body = (None, None, payload)
        if wtype == "response":
            status, ctype, body = _parse_http_response(payload)
        records.append({
            "warc_type": wtype,
            "record_id": headers.get("warc-record-id"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_length": clen,
            "http_status": status,
            "http_content_type": ctype,
            "body": body,
        })
    if not records:
        raise ValueError("no WARC records found")
    return records


def warc_records(df: DataFrame, id_col: str = "file_id",
                 content_col: str = "content") -> DataFrame:
    """Distributed WARC extraction: one output row per record, with
    per-FILE error capture (a corrupt archive yields a single
    parse_ok=false row, never a task failure)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_RECORD_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for fid, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    recs = parse_warc(
                        bytes(content) if content is not None else None)
                    for j, r in enumerate(recs):
                        rows.append((
                            int(fid), j, r["warc_type"], r["record_id"],
                            r["target_uri"], r["warc_date"],
                            r["content_length"], r["http_status"],
                            r["http_content_type"],
                            bytearray(r["body"]), True, None))
                except Exception as e:  # noqa: BLE001 — per-file capture
                    rows.append((int(fid), None, None, None, None, None,
                                 None, None, None, None, False,
                                 str(e)[:200]))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, content_col).mapInPandas(
        _extract, WARC_RECORD_SCHEMA)


SYNTH_WARC_SCHEMA = T.StructType([
    T.StructField("file_id", T.LongType(), False),
    T.StructField("content", T.BinaryType(), True),
])


def _warc_record(wtype: str, rid: str, uri: str | None, date: str,
                 payload: bytes, extra: str = "") -> bytes:
    head = ["WARC/1.0",
            f"WARC-Type: {wtype}",
            f"WARC-Record-ID: <urn:uuid:{rid}>",
            f"WARC-Date: {date}"]
    if uri:
        head.append(f"WARC-Target-URI: {uri}")
    if extra:
        head.append(extra)
    head.append(f"Content-Length: {len(payload)}")
    return ("\r\n".join(head) + "\r\n\r\n").encode() + payload + b"\r\n\r\n"


def synth_warc_media(ids_df: DataFrame, id_col: str = "doc_id",
                     docs_per_file: int = 3) -> DataFrame:
    """Deterministic WARC fixture: file ``i`` holds one warcinfo record
    plus ``docs_per_file`` request/response pairs. Response ``j`` of
    file ``i`` has status ``200 + 100 * ((i + j) % 3 == 0)`` (mixing
    200s and 301s... exactly: 301 when (i+j)%3==0 else 200), body text
    ``"doc-{i}-{j} " * (5 + (i + j) % 7)`` (trailing space kept), and
    uri ``http://ex.test/{i}/{j}``. Files with ``i % 2 == 1`` are
    stored as one GZIP MEMBER PER RECORD (the Common Crawl layout).
    A SQL oracle replays counts, lengths, statuses and md5(body) from
    the same formulas."""

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                i = int(did)
                date = "2026-01-01T00:00:00Z"
                recs = [_warc_record(
                    "warcinfo", f"info-{i}", None, date,
                    b"software: synth_warc_media\r\n")]
                for j in range(docs_per_file):
                    uri = f"http://ex.test/{i}/{j}"
                    recs.append(_warc_record(
                        "request", f"req-{i}-{j}", uri, date,
                        (f"GET /{i}/{j} HTTP/1.1\r\nHost: ex.test\r\n\r\n"
                         ).encode()))
                    status = 301 if (i + j) % 3 == 0 else 200
                    body = (f"doc-{i}-{j} " * (5 + (i + j) % 7)).encode()
                    payload = (f"HTTP/1.1 {status} X\r\n"
                               f"Content-Type: text/html\r\n\r\n"
                               ).encode() + body
                    recs.append(_warc_record(
                        "response", f"resp-{i}-{j}", uri, date, payload))
                if i % 2 == 1:  # Common Crawl layout: gzip per record
                    blob = b"".join(_gzip_member(r) for r in recs)
                else:
                    blob = b"".join(recs)
                rows.append((i, bytearray(blob)))
            yield pd.DataFrame(rows, columns=["file_id", "content"])

    return ids_df.select(id_col).mapInPandas(_enc, SYNTH_WARC_SCHEMA)


def _gzip_member(data: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    return co.compress(data) + co.flush()


# ---------------------------------------------------------------------
# TAR member extraction (r14) — the other ubiquitous corpus container
# (tarballs of text shards). Stdlib ``tarfile`` over in-memory blobs;
# members are READ only (never extracted to paths), so the classic
# path-traversal hazards don't apply.
# ---------------------------------------------------------------------

TAR_MEMBER_SCHEMA = T.StructType([
    T.StructField("file_id", T.LongType(), False),
    T.StructField("member_idx", T.IntegerType(), True),
    T.StructField("name", T.StringType(), True),
    T.StructField("size_bytes", T.LongType(), True),
    T.StructField("is_dir", T.BooleanType(), True),
    T.StructField("body", T.BinaryType(), True),
    T.StructField("parse_ok", T.BooleanType(), False),
    T.StructField("error", T.StringType(), True),
])


def tar_members(df: DataFrame, id_col: str = "file_id",
                content_col: str = "content") -> DataFrame:
    """Distributed TAR member extraction (plain or gzip/bz2/xz
    compressed, auto-detected): one row per member, per-FILE error
    capture — same kernel discipline as ``warc_records``."""
    import io
    import tarfile

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in TAR_MEMBER_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for fid, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    if content is None:
                        raise ValueError("null content")
                    with tarfile.open(fileobj=io.BytesIO(bytes(content)),
                                      mode="r:*") as tf:
                        for j, m in enumerate(tf.getmembers()):
                            body = None
                            if m.isfile():
                                body = bytearray(tf.extractfile(m).read())
                            rows.append((int(fid), j, m.name, int(m.size),
                                         m.isdir(), body, True, None))
                except Exception as e:  # noqa: BLE001 — per-file capture
                    rows.append((int(fid), None, None, None, None, None,
                                 False, str(e)[:200]))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, content_col).mapInPandas(
        _extract, TAR_MEMBER_SCHEMA)


def synth_tar_media(ids_df: DataFrame, id_col: str = "doc_id",
                    members_per_file: int = 3) -> DataFrame:
    """Deterministic tarball fixture: file ``i`` holds one directory
    entry ``d{i}/`` plus ``members_per_file`` text shards
    ``d{i}/part-{j}.txt`` with body ``"row-{i}-{j}\\n" * (3+(i+j)%5)``;
    ``i % 2 == 1`` files are gzip-compressed (zlib gzip member —
    deterministic header, no mtime). The oracle replays names,
    sizes and md5 bodies from the formulas."""
    import io
    import tarfile

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                i = int(did)
                buf = io.BytesIO()
                with tarfile.open(fileobj=buf, mode="w") as tf:
                    d = tarfile.TarInfo(f"d{i}")
                    d.type = tarfile.DIRTYPE
                    d.mtime = 0
                    tf.addfile(d)
                    for j in range(members_per_file):
                        body = (f"row-{i}-{j}\n" * (3 + (i + j) % 5)).encode()
                        m = tarfile.TarInfo(f"d{i}/part-{j}.txt")
                        m.size = len(body)
                        m.mtime = 0
                        tf.addfile(m, io.BytesIO(body))
                blob = buf.getvalue()
                if i % 2 == 1:  # gzip via zlib (mtime-free header bytes)
                    blob = _gzip_member(blob)
                rows.append((i, bytearray(blob)))
            yield pd.DataFrame(rows, columns=["file_id", "content"])

    return ids_df.select(id_col).mapInPandas(_enc, SYNTH_WARC_SCHEMA)


def synth_warc_docs(df: DataFrame, html_shell, id_col: str = "doc_id",
                    source_col: str = "source",
                    text_col: str = "text") -> DataFrame:
    """Ingest-capstone fixture (r14): one single-response WARC file per
    document, body = the ``html_shell(doc_id, text)`` HTML wrap of the
    document's text, target URI ``http://{source}.test/{doc_id}``;
    ``doc_id % 2 == 1`` files use the gzip-member layout. Feeds
    ``warc_records`` -> ``html_to_text`` -> quality scoring — every
    stage independently oracle-replayable, so the composition is too."""

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, src, text in zip(pdf[id_col], pdf[source_col],
                                      pdf[text_col]):
                i = int(did)
                html = html_shell(i, str(text)).encode()
                payload = (b"HTTP/1.1 200 OK\r\n"
                           b"Content-Type: text/html\r\n\r\n") + html
                rec = _warc_record(
                    "response", f"resp-{i}",
                    f"http://{src}.test/{i}",
                    "2026-01-01T00:00:00Z", payload)
                blob = _gzip_member(rec) if i % 2 == 1 else rec
                rows.append((i, bytearray(blob)))
            yield pd.DataFrame(rows, columns=["file_id", "content"])

    return df.select(id_col, source_col, text_col).mapInPandas(
        _enc, SYNTH_WARC_SCHEMA)
