"""WARC record reader (r14): plain + gzip-member-per-record parsing,
HTTP response extraction, framing errors, mutation fuzz, Spark
kernel."""

import zlib

import pytest

from snowflake_emulator_spark.sources.warc import (
    _gzip_member,
    _warc_record,
    parse_warc,
    synth_warc_media,
    warc_records,
)


def _fixture_blob(i: int, gz: bool) -> bytes:
    date = "2026-01-01T00:00:00Z"
    recs = [_warc_record("warcinfo", f"info-{i}", None, date,
                         b"software: synth_warc_media\r\n")]
    for j in range(3):
        uri = f"http://ex.test/{i}/{j}"
        recs.append(_warc_record(
            "request", f"req-{i}-{j}", uri, date,
            f"GET /{i}/{j} HTTP/1.1\r\nHost: ex.test\r\n\r\n".encode()))
        status = 301 if (i + j) % 3 == 0 else 200
        body = (f"doc-{i}-{j} " * (5 + (i + j) % 7)).encode()
        payload = (f"HTTP/1.1 {status} X\r\nContent-Type: text/html"
                   "\r\n\r\n").encode() + body
        recs.append(_warc_record("response", f"resp-{i}-{j}", uri, date,
                                 payload))
    return (b"".join(_gzip_member(r) for r in recs) if gz
            else b"".join(recs))


def test_warc_parse_plain_and_gzip():
    for i, gz in [(2, False), (3, True)]:
        recs = parse_warc(_fixture_blob(i, gz))
        assert len(recs) == 7
        assert recs[0]["warc_type"] == "warcinfo"
        for j in range(3):
            req, resp = recs[1 + 2 * j], recs[2 + 2 * j]
            assert req["warc_type"] == "request"
            assert req["http_status"] is None
            assert resp["http_status"] == (301 if (i + j) % 3 == 0 else 200)
            assert resp["http_content_type"] == "text/html"
            assert resp["body"] == (
                f"doc-{i}-{j} " * (5 + (i + j) % 7)).encode()
            assert resp["target_uri"] == f"http://ex.test/{i}/{j}"


def test_warc_framing_errors():
    with pytest.raises(ValueError):
        parse_warc(None)
    with pytest.raises(ValueError, match="version|records"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="gzip"):
        parse_warc(b"\x1f\x8bgarbage-not-gzip")
    blob = _fixture_blob(1, False)
    with pytest.raises(ValueError, match="truncated|separator"):
        parse_warc(blob[: len(blob) - 9])
    # Content-Length header is mandatory
    rec = _warc_record("resource", "x", None, "2026-01-01T00:00:00Z", b"hi")
    broken = rec.replace(b"Content-Length: 2", b"Content-Length: zz")
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(broken)
    # trailing garbage after gzip members is corrupt, not ignorable
    with pytest.raises(ValueError, match="trailing"):
        parse_warc(_gzip_member(rec) + b"JUNK")


def test_warc_records_spark(spark):
    ids = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    out = warc_records(synth_warc_media(ids)).collect()
    ok = [r for r in out if r["parse_ok"]]
    assert len(ok) == 6 * 7
    by_file = {}
    for r in ok:
        by_file.setdefault(r["file_id"], []).append(r)
    for i in range(6):
        recs = sorted(by_file[i], key=lambda r: r["rec_idx"])
        assert [r["warc_type"] for r in recs] == (
            ["warcinfo"] + ["request", "response"] * 3)
    # corrupt + null files produce single parse_ok=false rows
    bad = spark.createDataFrame(
        [(100, bytearray(b"WARC/1.0\r\nbroken")), (101, None)],
        "file_id long, content binary")
    rows = {r["file_id"]: r for r in warc_records(bad).collect()}
    assert not rows[100]["parse_ok"] and rows[100]["error"]
    assert not rows[101]["parse_ok"]


def test_warc_mutation_robustness():
    import random

    rng = random.Random(1451)
    for trial in range(60):
        blob = bytearray(_fixture_blob(trial % 8, gz=bool(trial % 2)))
        pos = rng.randrange(len(blob))
        blob[pos] ^= 1 << rng.randrange(8)
        try:
            recs = parse_warc(bytes(blob))
            for r in recs:  # surviving parses keep exact framing
                assert len(r["body"]) <= r["content_length"]
        except (ValueError, zlib.error, UnicodeDecodeError):
            pass


def test_tar_members_spark(spark):
    """r14: TAR extraction — plain and gzip tarballs, directory
    entries, exact bodies, per-file error capture."""
    import hashlib

    from snowflake_emulator_spark.sources.warc import (
        synth_tar_media,
        tar_members,
    )

    ids = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    out = [r for r in tar_members(synth_tar_media(ids)).collect()
           if r["parse_ok"]]
    assert len(out) == 6 * 4
    by = {}
    for r in out:
        by.setdefault(r["file_id"], []).append(r)
    for i in range(6):
        ms = sorted(by[i], key=lambda r: r["member_idx"])
        assert ms[0]["is_dir"] and ms[0]["name"] == f"d{i}"
        for j, m in enumerate(ms[1:]):
            body = (f"row-{i}-{j}\n" * (3 + (i + j) % 5)).encode()
            assert m["name"] == f"d{i}/part-{j}.txt"
            assert m["size_bytes"] == len(body)
            assert bytes(m["body"]) == body
            assert hashlib.md5(body).hexdigest() == hashlib.md5(
                bytes(m["body"])).hexdigest()
    bad = spark.createDataFrame(
        [(9, bytearray(b"definitely not a tarball")), (10, None)],
        "file_id long, content binary")
    rows = {r["file_id"]: r for r in tar_members(bad).collect()}
    assert not rows[9]["parse_ok"] and not rows[10]["parse_ok"]
