"""Real PNG decode (r11, VERDICT item 6): pure-stdlib codec behind the
mapInPandas kernel — round-trip, hand-computed spec vectors, error
capture, and the Spark-side feature extraction."""

import struct
import zlib

import pytest

from snowflake_emulator_spark.operators.multimodal import (
    _PNG_SIG,
    png_decode,
    png_encode,
    png_features,
    synth_png_media,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def test_png_roundtrip_all_color_types_and_filters():
    import random

    rng = random.Random(7)
    for ct, bpp in ((0, 1), (2, 3), (6, 4)):
        w, h = rng.randint(1, 13), rng.randint(1, 9)
        px = bytes(rng.randrange(256) for _ in range(w * h * bpp))
        for filt in (None, (lambda y: y % 5), (lambda y: 4)):
            got = png_decode(png_encode(w, h, px, ct, filt))
            assert got == (w, h, bpp, px)


def test_png_decoder_spec_vectors():
    """Hand-computed filter reconstructions straight from the PNG spec
    (RFC 2083) — independent of our own encoder, so a symmetric
    encoder+decoder sign error cannot hide."""
    # gray 3x2: scanline0 Sub [10,5,5] -> 10,15,20;
    # scanline1 Paeth [1,2,3] over prior -> 11,17,23
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"\x01\x0a\x05\x05" + b"\x04\x01\x02\x03")
    png = _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")
    assert png_decode(png) == (3, 2, 1, bytes([10, 15, 20, 11, 17, 23]))
    # Average: scanline0 None [8,4]; scanline1 Avg [3,7] -> 7, 12
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"\x00\x08\x04" + b"\x03\x03\x07")
    png = _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")
    assert png_decode(png)[3] == bytes([8, 4, 7, 12])


def test_png_multi_idat_and_errors():
    raw = zlib.compress(b"\x00\x08\x04" + b"\x00\x01\x02")
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    png = (_PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", raw[:5])
           + _chunk(b"IDAT", raw[5:]) + _chunk(b"IEND", b""))
    assert png_decode(png)[3] == bytes([8, 4, 1, 2])
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"not a png")
    bad = bytearray(png_encode(2, 2, bytes(12), 2))
    bad[-5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(bad))
    # documented boundaries raise NotImplementedError, not garbage
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    png16 = _PNG_SIG + _chunk(b"IHDR", ihdr16) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="bit depth"):
        png_decode(png16)
    ihdr_i = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    png_i = _PNG_SIG + _chunk(b"IHDR", ihdr_i) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="interlace"):
        png_decode(png_i)


def test_png_features_spark(spark):
    """mapInPandas kernel: decodes the synthetic fixture PNGs and
    reports pixel stats; a corrupt blob is captured per-row."""
    import pandas as pd
    from pyspark.sql import functions as F

    ids = spark.createDataFrame(pd.DataFrame({"doc_id": [0, 11, 22]}))
    media = synth_png_media(ids)
    rows = {r["media_id"]: r for r in png_features(media).collect()}
    assert set(rows) == {0, 11, 22}
    for i, r in rows.items():
        assert r["decode_ok"] and r["channels"] == 3
        assert r["width"] == 4 + i % 5 and r["height"] == 3 + i % 4
        # independent pixel arithmetic for the mean of channel r
        w, h = 4 + i % 5, 3 + i % 4
        exp = sum((7 * i + 3 * x + 5 * y) % 256
                  for x in range(w) for y in range(h)) / (w * h)
        assert abs(r["mean_r"] - exp) < 1e-9
    # corrupt content -> decode_ok False, job survives
    bad = spark.createDataFrame(
        [(99, bytearray(b"garbage"))], "media_id long, content binary")
    r = png_features(bad).collect()[0]
    assert not r["decode_ok"] and "signature" in r["error"]
    # NULL content row
    nul = spark.createDataFrame(
        [(98, None)], "media_id long, content binary")
    r = png_features(nul).collect()[0]
    assert not r["decode_ok"]


def test_png_decoder_mutation_robustness(spark):
    """Byte-mutation fuzz: randomly corrupted PNGs must fail CLEANLY —
    per-row decode_ok=False in the kernel (never a task crash) and only
    controlled exception types from the decoder itself. Rows whose
    mutation lands outside the CRC-verified payload may legitimately
    still decode; the invariant is no crash and no silent garbage with
    a wrong pixel count."""
    import random

    rng = random.Random(99)
    rows = []
    for i in range(60):
        w, h = rng.randint(1, 9), rng.randint(1, 7)
        px = bytes(rng.randrange(256) for _ in range(w * h * 3))
        blob = bytearray(png_encode(w, h, px, 2, lambda y: y % 5))
        pos = rng.randrange(len(blob))
        blob[pos] ^= 1 << rng.randrange(8)
        rows.append((i, blob, w, h))
    # driver-side: decoder raises only controlled types or round-trips
    for i, blob, w, h in rows:
        try:
            w2, h2, ch2, px2 = png_decode(bytes(blob))
            assert len(px2) == w2 * h2 * ch2  # never a short buffer
        except (ValueError, NotImplementedError, zlib.error):
            pass
    # Spark-side: the kernel survives the whole corrupted batch
    df = spark.createDataFrame([(i, b) for i, b, _w, _h in rows],
                               "media_id long, content binary")
    out = png_features(df).collect()
    assert len(out) == 60
    assert all(isinstance(r["decode_ok"], bool) for r in out)


def test_png_truncated_crc_raises_value_error():
    """r12 (ADVICE): a corrupted length field whose chunk data fits but
    leaves <4 CRC bytes must raise ValueError('truncated PNG chunk'),
    not an undocumented struct.error."""
    blob = png_encode(2, 2, bytes(range(12)), 2)
    # cut into IEND's CRC: data (0 bytes) still "fits", CRC does not
    with pytest.raises(ValueError, match="truncated PNG chunk"):
        png_decode(blob[:-2])
    # also with a length field inflated to swallow the tail
    b2 = bytearray(blob)
    # first chunk after sig is IHDR at offset 8; set its length so data
    # ends exactly at EOF leaving no CRC bytes
    struct.pack_into(">I", b2, 8, len(b2) - 8 - 8)
    with pytest.raises(ValueError, match="truncated PNG chunk"):
        png_decode(bytes(b2))
