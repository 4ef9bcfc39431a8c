"""r16: baseline TIFF 6.0 — the spec's own PackBits worked example,
both-endian round-trips over all four photometric variants, multi-page
chains, the error/boundary contract, and the Spark kernels."""
import struct

import numpy as np
import pytest

from snowflake_emulator_spark.operators.tiff import (
    _packbits_decode,
    _synth_page0,
    packbits_encode,
    synth_tiff_media,
    tiff_decode,
    tiff_encode,
    tiff_info,
)
from snowflake_emulator_spark.operators.multimodal import (
    decode_image,
    media_features,
    sniff_format,
)


def test_packbits_spec_vector():
    """The worked example from the TIFF 6.0 specification, section 9
    (Apple PackBits): the canonical 24-byte expansion."""
    enc = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    exp = bytes.fromhex("AAAAAA80002AAAAAAAAA80002A22AAAAAAAAAAAAAAAAAAAA")
    assert _packbits_decode(enc, 24) == exp
    # our encoder round-trips the same payload (encodings may differ)
    assert _packbits_decode(packbits_encode(exp), 24) == exp
    # n == 128 is a noop, not a run
    assert _packbits_decode(b"\x80\x00\x41", 1) == b"A"
    with pytest.raises(ValueError):
        _packbits_decode(b"\x05\x01", 6)  # truncated literal
    with pytest.raises(ValueError):
        _packbits_decode(b"\xfe", 3)  # truncated repeat
    with pytest.raises(ValueError):
        _packbits_decode(enc, 23)  # wrong expected length


def _expected(i, w, h):
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    v = i % 4
    if v == 0:
        return 1, ((3 * i + 7 * x + 11 * y) % 256).astype(np.uint8)
    if v == 1:
        e = np.empty((h, w, 3), np.uint8)
        e[:, :, 0] = (7 * i + 5 * x + 3 * y) % 256
        e[:, :, 1] = (11 * i + 2 * x + 9 * y) % 256
        e[:, :, 2] = (13 * i + 4 * x + y) % 256
        return 3, e
    if v == 2:
        idx = (i + 2 * x + 3 * y) % 16
        e = np.empty((h, w, 3), np.uint8)
        for c in range(3):
            e[:, :, c] = ((5 + 4 * c) * i + (17 + 2 * c) * idx) % 256
        return 3, e
    return 1, np.where((i + x + y) % 2 == 0, 255, 0).astype(np.uint8)


def _fixture(i):
    w, h = 6 + i % 5, 4 + i % 4
    pages = [_synth_page0(i, w, h)]
    if i % 2 == 1:
        pages.append({"width": 3, "height": 2, "photometric": 1,
                      "bits": [8], "spp": 1,
                      "data": bytes(((5 * i + 3 * t) % 256)
                                    for t in range(6))})
    return tiff_encode(pages, byte_order="II" if i % 2 == 0 else "MM")


@pytest.mark.parametrize("i", range(16))
def test_roundtrip_all_variants(i):
    b = _fixture(i)
    assert sniff_format(b) == "tiff"
    w, h = 6 + i % 5, 4 + i % 4
    info = tiff_info(b)
    assert info["byte_order"] == ("II" if i % 2 == 0 else "MM")
    assert info["n_pages"] == 1 + i % 2
    dw, dh, ch, px = tiff_decode(b)
    exp_ch, exp = _expected(i, w, h)
    assert (dw, dh, ch) == (w, h, exp_ch)
    assert np.array_equal(
        np.frombuffer(px, np.uint8).reshape(exp.shape), exp)
    if i % 2 == 1:
        gw, gh, gch, gpx = tiff_decode(b, page=1)
        assert (gw, gh, gch) == (3, 2, 1)
        assert gpx == bytes(((5 * i + 3 * t) % 256) for t in range(6))
    feat = decode_image(b)
    assert len(feat) == 8 and feat[0] == 10 / 4


def test_struct_level_header():
    """Raw-struct header check, independent of the module's parser."""
    b = _fixture(0)
    assert b[:2] == b"II"
    assert struct.unpack("<H", b[2:4])[0] == 42
    first = struct.unpack("<I", b[4:8])[0]
    count = struct.unpack("<H", b[first:first + 2])[0]
    tags = {}
    for k in range(count):
        e = first + 2 + 12 * k
        tag, typ = struct.unpack("<HH", b[e:e + 4])
        tags[tag] = typ
    assert 256 in tags and 257 in tags and 273 in tags
    bmm = _fixture(1)
    assert bmm[:2] == b"MM"
    assert struct.unpack(">H", bmm[2:4])[0] == 42


def test_whiteiszero_gray8_inversion():
    g = bytes(range(0, 12))
    blob = tiff_encode([{"width": 4, "height": 3, "photometric": 0,
                         "bits": [8], "spp": 1, "data": g}])
    _w, _h, ch, px = tiff_decode(blob)
    assert ch == 1
    assert px == bytes(255 - v for v in g)


def test_bilevel_blackiszero():
    bitmap = np.array([[1, 0, 1, 0, 1]], np.uint8)
    blob = tiff_encode([{"width": 5, "height": 1, "photometric": 1,
                         "bits": [1], "spp": 1,
                         "data": bytes(np.packbits(bitmap, axis=1))}])
    _w, _h, _c, px = tiff_decode(blob)
    assert px == bytes([255, 0, 255, 0, 255])


def test_error_contract():
    with pytest.raises(ValueError):
        tiff_decode(None)
    with pytest.raises(ValueError):
        tiff_decode(b"XX\x2a\x00" + bytes(8))
    with pytest.raises(ValueError):  # bad magic number
        tiff_decode(b"II\x2b\x01" + bytes(8))
    good = bytearray(_fixture(0))
    # strip offset beyond EOF: find the strip-offset tag and corrupt it
    first = struct.unpack("<I", bytes(good[4:8]))[0]
    count = struct.unpack("<H", bytes(good[first:first + 2]))[0]
    for k in range(count):
        e = first + 2 + 12 * k
        tag = struct.unpack("<H", bytes(good[e:e + 2]))[0]
        if tag == 273:
            off_field = e + 8
    bad = bytearray(good)
    bad[off_field:off_field + 4] = struct.pack("<I", len(good) + 999)
    with pytest.raises(ValueError):
        tiff_decode(bytes(bad))
    # IFD offset outside file
    bad = bytearray(good)
    bad[4:8] = struct.pack("<I", len(good) + 5)
    with pytest.raises(ValueError):
        tiff_info(bytes(bad))
    # IFD cycle: next-IFD pointer back to the first IFD
    two = bytearray(_fixture(1))
    first = struct.unpack(">I", bytes(two[4:8]))[0]
    count = struct.unpack(">H", bytes(two[first:first + 2]))[0]
    nxt_pos = first + 2 + 12 * count
    two[nxt_pos:nxt_pos + 4] = struct.pack(">I", first)
    with pytest.raises(ValueError, match="cycle"):
        tiff_info(bytes(two))
    # page index out of range
    with pytest.raises(ValueError):
        tiff_decode(_fixture(0), page=3)


def test_not_implemented_boundaries():
    g = bytes(12)
    base = {"width": 4, "height": 3, "photometric": 1, "bits": [8],
            "spp": 1, "data": g}
    blob = bytearray(tiff_encode([base]))
    first = struct.unpack("<I", bytes(blob[4:8]))[0]
    count = struct.unpack("<H", bytes(blob[first:first + 2]))[0]
    for k in range(count):
        e = first + 2 + 12 * k
        tag = struct.unpack("<H", bytes(blob[e:e + 2]))[0]
        if tag == 259:  # compression -> LZW
            bad = bytearray(blob)
            bad[e + 8:e + 10] = struct.pack("<H", 5)
            with pytest.raises(NotImplementedError, match="compression 5"):
                tiff_decode(bytes(bad))
        if tag == 258:  # 16-bit samples
            bad = bytearray(blob)
            bad[e + 8:e + 10] = struct.pack("<H", 16)
            with pytest.raises(NotImplementedError):
                tiff_decode(bytes(bad))
        if tag == 284:
            pass
    with pytest.raises(NotImplementedError, match="BigTIFF"):
        tiff_decode(b"II\x2b\x00" + bytes(12))


def test_media_features_tiff(spark):
    ids = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    media = synth_tiff_media(ids)
    rows = {r.media_id: r for r in media_features(media).collect()}
    assert len(rows) == 12
    for i, r in rows.items():
        assert r.decode_ok, r.error
        assert r.format == "tiff"
        assert r.n_frames == 1 + i % 2
        assert (r.width, r.height) == (6 + i % 5, 4 + i % 4)
        exp_ch, exp = _expected(i, r.width, r.height)
        assert r.channels == exp_ch
        assert r.mean_v == pytest.approx(float(exp.mean()), abs=1e-9)
        assert r.peak_v == float(exp.max())
