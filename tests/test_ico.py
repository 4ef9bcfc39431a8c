"""r16: Windows ICO/CUR container decode — third-party favicon
conformance (Jetty, Google App Engine, pyasn1), struct-level directory
parses that do not trust the decoder, the misnamed-PNG crawl case,
synthetic round-trips over every payload variant, and the error
contract."""
import hashlib
import json
import struct
from pathlib import Path

import numpy as np
import pytest

from snowflake_emulator_spark.operators.ico import (
    _dib_encode_icon,
    best_entry_index,
    ico_decode,
    ico_decode_entry,
    ico_encode,
    ico_info,
    ico_parse_dir,
    synth_ico_media,
)
from snowflake_emulator_spark.operators.multimodal import (
    decode_image,
    png_decode,
    sniff_format,
)

FIXDIR = Path(__file__).parent / "fixtures" / "external_codec"
MANIFEST = json.loads((FIXDIR / "manifest.json").read_text())
ICO_NAMES = [n for n, m in sorted(MANIFEST.items())
             if m["format"] == "ico"]
MISNAMED = [n for n, m in sorted(MANIFEST.items())
            if n.endswith(".ico") and m["format"] == "png"]


# ------------------------------------------------------------------
# external conformance
# ------------------------------------------------------------------

@pytest.mark.parametrize("name", ICO_NAMES)
def test_external_ico_struct_level(name):
    """Struct-level ICONDIR/BITMAPINFOHEADER walk with raw struct
    calls — independent of the decoder's own parser."""
    b = (FIXDIR / name).read_bytes()
    m = MANIFEST[name]
    assert hashlib.sha256(b).hexdigest() == m["file_sha256"]
    res, typ, cnt = struct.unpack("<HHH", b[:6])
    assert (res, typ) == (0, 1) and cnt == m["n_images"]
    for k in range(cnt):
        w, h, _cc, _r, _pl, bpp, nb, off = struct.unpack(
            "<BBBBHHII", b[6 + 16 * k:6 + 16 * k + 16])
        assert off + nb <= len(b)
        hs, bw, bh = struct.unpack("<Iii", b[off:off + 12])
        assert hs == 40 and bw == (w or 256) and bh == 2 * (h or 256)
        assert struct.unpack("<H", b[off + 14:off + 16])[0] == bpp == 32


@pytest.mark.parametrize("name", ICO_NAMES)
def test_external_ico_decode(name):
    b = (FIXDIR / name).read_bytes()
    m = MANIFEST[name]
    assert sniff_format(b) == "ico"
    info = ico_info(b)
    assert info["n_images"] == m["n_images"]
    w, h, c, px = ico_decode(b)
    assert (w, h, c) == (m["width"], m["height"], 4)
    assert hashlib.sha256(px).hexdigest() == m["rgba_sha256"]
    a = np.frombuffer(px, np.uint8).reshape(h, w, 4)
    assert round(float(a[:, :, :3].mean()), 3) == m["rgb_mean"]
    # every directory entry decodes, not just the best one
    for k in range(info["n_images"]):
        ew, eh, _, _ = ico_decode_entry(b, k)
        assert ew == info["entries"][k]["width"]
        assert eh == info["entries"][k]["height"]
    assert len(decode_image(b)) == 8  # dispatch path


def test_appengine_icon_omits_and_mask():
    """Real-world quirk pinned as a regression: App Engine's favicon
    declares doubled biHeight but its payload ends exactly after the
    XOR bitmap — no AND mask. The 32-bpp alpha channel (which here is
    NOT all-zero) must govern."""
    b = (FIXDIR / "appengine_favicon.ico").read_bytes()
    _typ, entries = ico_parse_dir(b)
    e = entries[0]
    xor_bytes = 40 + e["width"] * e["height"] * 4
    assert e["n_bytes"] == xor_bytes  # mask truly absent
    w, h, _c, px = ico_decode_entry(b, 0)
    a = np.frombuffer(px, np.uint8).reshape(h, w, 4)
    assert len(np.unique(a[:, :, 3])) > 1  # real (partial) transparency


@pytest.mark.parametrize("name", MISNAMED)
def test_misnamed_png_favicon(name):
    """Two of the container's five favicon.ico files are PNG streams —
    the magic-byte dispatch (not the filename) must route them."""
    b = (FIXDIR / name).read_bytes()
    assert hashlib.sha256(b).hexdigest() == MANIFEST[name]["file_sha256"]
    assert sniff_format(b) == "png"
    w, h, _c, _px = png_decode(b)
    assert w > 0 and h > 0
    with pytest.raises(ValueError):
        ico_parse_dir(b)


# ------------------------------------------------------------------
# synthetic round-trips
# ------------------------------------------------------------------

def _rgba(h, w, seed=3):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
    return a


@pytest.mark.parametrize("bpp", [32, 24])
def test_truecolor_roundtrip(bpp):
    a = _rgba(5, 7)
    if bpp == 24:
        a[:, :, 3] = 255
    else:
        a[:, :, 3] = np.where(a[:, :, 3] > 128, a[:, :, 3], 0)
    blob = _dib_encode_icon(7, 5, bpp, bytes(a.tobytes()))
    ico = ico_encode([blob])
    w, h, c, px = ico_decode(ico)
    got = np.frombuffer(px, np.uint8).reshape(5, 7, 4)
    if bpp == 32:
        assert np.array_equal(got, a)
    else:
        assert np.array_equal(got[:, :, :3], a[:, :, :3])
        assert (got[:, :, 3] == 255).all()


@pytest.mark.parametrize("bpp", [1, 4, 8])
def test_palette_roundtrip_with_mask(bpp):
    """Palette depths with a transparency AND mask: masked pixels get
    alpha 0, others 255; RGB always comes from the palette."""
    h, w = 4, 9
    n = 1 << bpp
    rng = np.random.default_rng(bpp)
    idx = rng.integers(0, n, size=(h, w), dtype=np.uint8)
    palette = [(int(3 * c % 256), int(5 * c % 256), int(7 * c % 256))
               for c in range(n)]
    rgba = np.empty((h, w, 4), dtype=np.uint8)
    rgba[:, :, :3] = np.array(palette, np.uint8)[idx]
    rgba[:, :, 3] = np.where((idx % 3) == 0, 0, 255)  # mask from alpha
    blob = _dib_encode_icon(w, h, bpp, bytes(rgba.tobytes()),
                            palette=palette, indices=bytes(idx.tobytes()))
    ico = ico_encode([blob])
    gw, gh, _c, px = ico_decode(ico)
    got = np.frombuffer(px, np.uint8).reshape(h, w, 4)
    assert (gw, gh) == (w, h)
    assert np.array_equal(got, rgba)


def test_png_payload_and_best_pick():
    """Mixed PNG + DIB directory: best = largest area, then bpp."""
    from snowflake_emulator_spark.operators.multimodal import png_encode

    big = _rgba(6, 6)
    big[:, :, 3] = 255
    png_blob = png_encode(6, 6, bytes(big[:, :, :3].tobytes()), color_type=2)
    small = _rgba(2, 2)
    small[:, :, 3] = 255
    dib_blob = _dib_encode_icon(2, 2, 32, bytes(small.tobytes()))
    ico = ico_encode([dib_blob, png_blob])
    info = ico_info(ico)
    assert info["best_index"] == 1 and info["entries"][1]["is_png"]
    w, h, _c, px = ico_decode(ico)
    got = np.frombuffer(px, np.uint8).reshape(6, 6, 4)
    assert (w, h) == (6, 6)
    assert np.array_equal(got, big)


def test_all_zero_alpha_uses_and_mask():
    """Legacy 32-bpp icons: all-zero alpha channel, AND mask is the
    only opacity source."""
    a = _rgba(3, 3)
    a[:, :, 3] = 0
    blob = bytearray(_dib_encode_icon(3, 3, 32, bytes(a.tobytes())))
    # encoder derived an all-transparent AND mask from alpha==0;
    # hand-rewrite the mask rows to checker bits (stride 4 bytes/row)
    mask = bytearray(12)
    for y in range(3):
        mask[4 * y] = 0b10100000 if y % 2 == 0 else 0b01000000
    blob[-12:] = mask
    w, h, _c, px = ico_decode(ico_encode([bytes(blob)]))
    got = np.frombuffer(px, np.uint8).reshape(3, 3, 4)
    # bit 1 => transparent; rows are bottom-up in the file
    expect = np.zeros((3, 3), np.uint8)
    for y in range(3):
        bits = mask[4 * (2 - y)]
        for x in range(3):
            expect[y, x] = 0 if (bits >> (7 - x)) & 1 else 255
    assert np.array_equal(got[:, :, 3], expect)
    assert np.array_equal(got[:, :, :3], a[:, :, :3])


def test_cur_resource_type():
    a = _rgba(2, 2)
    a[:, :, 3] = 255
    ico = ico_encode([_dib_encode_icon(2, 2, 32, bytes(a.tobytes()))],
                     resource_type=2)
    assert sniff_format(ico) == "ico"
    assert ico_info(ico)["resource_type"] == 2
    ico_decode(ico)


# ------------------------------------------------------------------
# error contract
# ------------------------------------------------------------------

def _one_entry_ico():
    a = _rgba(3, 2)
    a[:, :, 3] = 255
    return bytearray(ico_encode([_dib_encode_icon(2, 3, 32,
                                                  bytes(a.tobytes()))]))


def test_errors():
    with pytest.raises(ValueError):
        ico_parse_dir(None)
    with pytest.raises(ValueError):
        ico_parse_dir(b"\x00\x00\x03\x00\x01\x00")  # type 3
    with pytest.raises(ValueError):
        ico_parse_dir(b"\x00\x00\x01\x00\x00\x00")  # count 0
    with pytest.raises(ValueError):  # count past the damage bound
        ico_parse_dir(b"\x00\x00\x01\x00\xff\x00" + bytes(16 * 255))
    good = _one_entry_ico()
    # payload outside the file
    bad = bytearray(good)
    bad[14:18] = struct.pack("<I", len(good) * 2)
    with pytest.raises(ValueError):
        ico_parse_dir(bytes(bad))
    # truncated XOR bitmap
    with pytest.raises(ValueError):
        clipped = bytes(good[:-20])
        hdr = bytearray(clipped)
        hdr[14:18] = struct.pack("<I", len(clipped) - 22)
        ico_decode(bytes(hdr))
    # directory/DIB dimension contradiction
    bad = bytearray(good)
    bad[6] = 9  # directory width 9, DIB says 2
    with pytest.raises(ValueError):
        ico_decode(bytes(bad))
    # entry index range
    with pytest.raises(ValueError):
        ico_decode_entry(bytes(good), 5)


def test_not_implemented_boundaries():
    good = _one_entry_ico()
    off = 22
    bad = bytearray(good)
    bad[off + 14:off + 16] = struct.pack("<H", 16)  # 16-bpp
    with pytest.raises(NotImplementedError):
        ico_decode(bytes(bad))
    bad = bytearray(good)
    bad[off:off + 4] = struct.pack("<I", 124)  # V5 header in an ICO
    with pytest.raises(NotImplementedError):
        ico_decode(bytes(bad))
    bad = bytearray(good)
    bad[off + 16:off + 20] = struct.pack("<I", 1)  # RLE in an ICO
    with pytest.raises(NotImplementedError):
        ico_decode(bytes(bad))


def test_sniff_no_false_positives():
    assert sniff_format(b"\x00\x00\x01\x00\x00\x00junk") is None  # count 0
    assert sniff_format(b"\x00\x00\x01\x00\xff\xffjunk") is None  # count 65535
    assert sniff_format(bytes(12)) is None
    assert sniff_format(b"\x00\x00\x01\x00\x02\x00" + bytes(32)) == "ico"


# ------------------------------------------------------------------
# Spark kernels
# ------------------------------------------------------------------

def test_media_features_ico(spark):
    """The mixed-media kernel reports directory count + best-image
    stats for ICO rows (alpha excluded from mean_v per contract)."""
    from snowflake_emulator_spark.operators.multimodal import media_features

    ids = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    media = synth_ico_media(ids)
    rows = {r.media_id: r for r in media_features(media).collect()}
    assert len(rows) == 12
    for i, r in rows.items():
        assert r.decode_ok, r.error
        assert r.format == "ico"
        assert r.n_frames == 1 + i % 3
        assert (r.width, r.height) == (8 + i % 5, 6 + i % 4)
        assert r.channels == 4
    # external favicons through the same kernel, mixed with a synth row
    ext = [(100 + k, bytearray((FIXDIR / n).read_bytes()))
           for k, n in enumerate(ICO_NAMES)]
    df = spark.createDataFrame(ext, "media_id: long, content: binary")
    out = {r.media_id: r for r in media_features(df).collect()}
    for k, n in enumerate(ICO_NAMES):
        r = out[100 + k]
        assert r.decode_ok and r.format == "ico"
        assert (r.width, r.height) == (MANIFEST[n]["width"],
                                       MANIFEST[n]["height"])
        assert round(r.mean_v, 3) == MANIFEST[n]["rgb_mean"]
