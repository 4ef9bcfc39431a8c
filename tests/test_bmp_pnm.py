"""r15: BMP and Netpbm (P1-P6) decoders — external CPython fixtures,
the cross-format identity property, and synthetic edge coverage."""
import hashlib
import json
import struct
from pathlib import Path

import numpy as np
import pytest

from snowflake_emulator_spark.operators.multimodal import (
    bmp_decode,
    decode_image,
    png_decode,
    pnm_decode,
    sniff_format,
)

FIXDIR = Path(__file__).parent / "fixtures" / "external_codec"
MANIFEST = json.loads((FIXDIR / "manifest.json").read_text())


@pytest.mark.parametrize("name", [n for n, m in sorted(MANIFEST.items())
                                  if m["format"] in ("bmp", "pnm")])
def test_external_bmp_pnm(name):
    b = (FIXDIR / name).read_bytes()
    m = MANIFEST[name]
    assert hashlib.sha256(b).hexdigest() == m["file_sha256"]
    assert sniff_format(b) == m["format"]
    dec = bmp_decode if m["format"] == "bmp" else pnm_decode
    w, h, c, px = dec(b)
    assert (w, h, c) == (m["width"], m["height"], m["channels"])
    assert hashlib.sha256(px).hexdigest() == m["pixels_sha256"]
    feat = decode_image(b)  # dispatch path
    assert len(feat) == 8


def test_cross_format_identity():
    """CPython's imghdrdata encodes ONE image in many formats with
    independent third-party encoders. The 32-bpp bitfields BMP, the
    binary PPM and the PNG must decode to byte-identical RGB through
    three entirely separate decode paths — and the PGM must correlate
    1.0 with the PNG's luma. No self-roundtrip can fake this."""
    rgb = {}
    for name, dec in [("cpython_python.bmp", bmp_decode),
                      ("cpython_python.ppm", pnm_decode),
                      ("cpython_python.png", png_decode)]:
        w, h, c, px = dec((FIXDIR / name).read_bytes())
        assert (w, h, c) == (16, 16, 3)
        rgb[name] = np.frombuffer(px, np.uint8).reshape(16, 16, 3)
    assert (rgb["cpython_python.bmp"] == rgb["cpython_python.ppm"]).all()
    assert (rgb["cpython_python.ppm"] == rgb["cpython_python.png"]).all()
    _w, _h, _c, gpx = pnm_decode((FIXDIR / "cpython_python.pgm").read_bytes())
    g = np.frombuffer(gpx, np.uint8).astype(float)
    p = rgb["cpython_python.png"].astype(float)
    luma = (0.299 * p[:, :, 0] + 0.587 * p[:, :, 1]
            + 0.114 * p[:, :, 2]).ravel()
    assert np.corrcoef(luma, g)[0, 1] > 0.999


# --------------------------------------------------------------------
# synthetic BMP coverage
# --------------------------------------------------------------------

def _bmp(w, h, bpp, rows_payload, compression=0, palette=b"",
         top_down=False, masks=b""):
    hsize = 40
    pix_off = 14 + hsize + len(masks) + len(palette)
    total = pix_off + len(rows_payload)
    head = b"BM" + struct.pack("<IHHI", total, 0, 0, pix_off)
    info = struct.pack("<IiiHHIIiiII", hsize, w, -h if top_down else h,
                       1, bpp, compression, len(rows_payload), 2835, 2835,
                       len(palette) // 4, 0)
    return head + info + masks + palette + rows_payload


def test_bmp_24bpp_bottom_up_padding():
    # 2x2, stride 8 (2*3 -> pad to 8); bottom-up: file row 0 = image row 1
    rows = (bytes([255, 0, 0, 0, 255, 0]) + b"\x00\x00"     # B,G,R!
            + bytes([0, 0, 255, 255, 255, 255]) + b"\x00\x00")
    w, h, c, px = bmp_decode(_bmp(2, 2, 24, rows))
    a = np.frombuffer(px, np.uint8).reshape(2, 2, 3)
    assert tuple(a[0, 0]) == (255, 0, 0)    # file row 1 first: BGR 0,0,255
    assert tuple(a[0, 1]) == (255, 255, 255)
    assert tuple(a[1, 0]) == (0, 0, 255)    # blue (B=255)
    assert tuple(a[1, 1]) == (0, 255, 0)


def test_bmp_top_down_and_8bpp_palette():
    pal = bytes([0, 0, 255, 0,   255, 0, 0, 0])  # idx0=red(BGRA), idx1=blue
    rows = bytes([0, 1]) + b"\x00\x00" + bytes([1, 0]) + b"\x00\x00"
    w, h, c, px = bmp_decode(_bmp(2, 2, 8, rows, palette=pal, top_down=True))
    a = np.frombuffer(px, np.uint8).reshape(2, 2, 3)
    assert tuple(a[0, 0]) == (255, 0, 0) and tuple(a[0, 1]) == (0, 0, 255)
    assert tuple(a[1, 0]) == (0, 0, 255) and tuple(a[1, 1]) == (255, 0, 0)


def test_bmp_1bpp_packed():
    pal = bytes([0, 0, 0, 0,   255, 255, 255, 0])
    rows = bytes([0b10100000]) + b"\x00\x00\x00"
    w, h, c, px = bmp_decode(_bmp(3, 1, 1, rows, palette=pal))
    a = np.frombuffer(px, np.uint8).reshape(1, 3, 3)
    assert tuple(a[0, 0]) == (255, 255, 255)
    assert tuple(a[0, 1]) == (0, 0, 0)
    assert tuple(a[0, 2]) == (255, 255, 255)


def test_bmp_errors():
    with pytest.raises(ValueError, match="not a BMP"):
        bmp_decode(b"XX" + b"\x00" * 60)
    with pytest.raises(NotImplementedError, match="compression"):
        bmp_decode(_bmp(2, 2, 8, b"\x00" * 8,
                        compression=4, palette=b"\x00" * 8))
    with pytest.raises(ValueError, match="truncated BMP pixel"):
        bmp_decode(_bmp(4, 4, 24, b"\x00" * 10))
    blob = bytearray(_bmp(2, 1, 8, b"\x01\x01\x00\x00",
                          palette=bytes([1, 2, 3, 0])))
    with pytest.raises(ValueError, match="palette index"):
        bmp_decode(bytes(blob))


# --------------------------------------------------------------------
# BMP RLE8 / RLE4 (r16, VERDICT item 4)
# --------------------------------------------------------------------

# 256-entry BGRA palette: index i -> RGB (i, (2i)%256, (3i)%256)
_PAL256 = b"".join(bytes([(3 * i) % 256, (2 * i) % 256, i, 0])
                   for i in range(256))
_PAL16 = b"".join(bytes([(3 * i) % 256, (2 * i) % 256, i, 0])
                  for i in range(16))


def _rgb_of(i):
    return (i, (2 * i) % 256, (3 * i) % 256)


def rle8_encode(file_rows):
    """Minimal spec-valid RLE8 encoder (encoded runs + EOL/EOB only),
    used to prove RLE decodes byte-identical to the uncompressed
    rendition of the same indices."""
    out = bytearray()
    for row in file_rows:
        x, w = 0, len(row)
        while x < w:
            run = 1
            while x + run < w and row[x + run] == row[x] and run < 255:
                run += 1
            out += bytes([run, row[x]])
            x += run
        out += b"\x00\x00"
    out[-2:] = b"\x00\x01"  # final EOL becomes end-of-bitmap
    return bytes(out)


def rle4_encode(file_rows):
    """Minimal spec-valid RLE4 encoder: pixel pairs as cnt<=2 encoded
    runs (the value byte's two nibbles alternate)."""
    out = bytearray()
    for row in file_rows:
        for x in range(0, len(row), 2):
            pair = row[x:x + 2]
            if len(pair) == 2:
                out += bytes([2, (pair[0] << 4) | pair[1]])
            else:
                out += bytes([1, pair[0] << 4])
        out += b"\x00\x00"
    out[-2:] = b"\x00\x01"
    return bytes(out)


def test_bmp_rle8_spec_vector():
    """The canonical MSDN 'Bitmap Compression' RLE8 example, expanded
    by hand: encoded runs, absolute mode with odd-length pad, delta,
    end-of-line, end-of-bitmap; skipped pixels stay palette index 0."""
    stream = bytes([
        0x03, 0x04, 0x05, 0x06,                    # runs 3x04, 5x06
        0x00, 0x03, 0x45, 0x56, 0x67, 0x00,        # absolute 45 56 67 +pad
        0x02, 0x78,                                 # run 2x78
        0x00, 0x02, 0x05, 0x01,                     # delta +5,+1
        0x02, 0x78,                                 # run 2x78
        0x00, 0x00,                                 # end of line
        0x09, 0x1E,                                 # run 9x1E
        0x00, 0x01,                                 # end of bitmap
    ])
    w, h = 20, 3
    _, _, c, px = bmp_decode(_bmp(w, h, 8, stream, compression=1,
                                  palette=_PAL256))
    assert c == 3
    idx = np.zeros((h, w), dtype=np.uint8)          # file row order
    idx[0, :13] = [4, 4, 4, 6, 6, 6, 6, 6, 0x45, 0x56, 0x67, 0x78, 0x78]
    idx[1, 18:20] = 0x78                            # after delta +5,+1
    idx[2, :9] = 0x1E
    expected = np.array(
        [[_rgb_of(v) for v in row] for row in idx[::-1]], dtype=np.uint8)
    assert px == expected.tobytes()


def test_bmp_rle4_spec_vector():
    """The MSDN RLE4 example: nibble-alternating runs, 6-nibble
    absolute block (3 bytes + pad), delta, EOL, EOB."""
    stream = bytes([
        0x03, 0x04,                                  # 0,4,0
        0x05, 0x06,                                  # 0,6,0,6,0
        0x00, 0x06, 0x45, 0x56, 0x67, 0x00,          # abs 4,5,5,6,6,7 +pad
        0x04, 0x78,                                  # 7,8,7,8
        0x00, 0x02, 0x05, 0x01,                      # delta +5,+1
        0x04, 0x78,                                  # 7,8,7,8
        0x00, 0x00,                                  # EOL
        0x09, 0x1E,                                  # 1,E,1,E,1,E,1,E,1
        0x00, 0x01,                                  # EOB
    ])
    w, h = 27, 3
    _, _, _, px = bmp_decode(_bmp(w, h, 4, stream, compression=2,
                                  palette=_PAL16))
    idx = np.zeros((h, w), dtype=np.uint8)
    idx[0, :18] = [0, 4, 0, 0, 6, 0, 6, 0,
                   4, 5, 5, 6, 6, 7, 7, 8, 7, 8]
    idx[1, 23:27] = [7, 8, 7, 8]
    idx[2, :9] = [1, 0xE, 1, 0xE, 1, 0xE, 1, 0xE, 1]
    expected = np.array(
        [[_rgb_of(v) for v in row] for row in idx[::-1]], dtype=np.uint8)
    assert px == expected.tobytes()


def test_bmp_rle_matches_uncompressed_rendition():
    """An RLE8 (and RLE4) stream must decode byte-identical to the
    uncompressed BMP carrying the same palette indices."""
    h, w = 7, 13
    rows8 = [[(3 * y * y + x // 3 + y) % 256 for x in range(w)]
             for y in range(h)]
    stride8 = ((w + 3) // 4) * 4
    flat8 = b"".join(bytes(r) + b"\x00" * (stride8 - w) for r in rows8)
    _, _, _, px_plain = bmp_decode(_bmp(w, h, 8, flat8, palette=_PAL256))
    _, _, _, px_rle = bmp_decode(_bmp(w, h, 8, rle8_encode(rows8),
                                      compression=1, palette=_PAL256))
    assert px_rle == px_plain

    rows4 = [[(x // 2 + 2 * y) % 16 for x in range(w)] for y in range(h)]
    stride4 = (((w + 1) // 2 + 3) // 4) * 4
    flat4 = b"".join(
        bytes([(r[i] << 4) | (r[i + 1] if i + 1 < w else 0)
               for i in range(0, w, 2)]).ljust(stride4, b"\x00")
        for r in rows4)
    _, _, _, p4_plain = bmp_decode(_bmp(w, h, 4, flat4, palette=_PAL16))
    _, _, _, p4_rle = bmp_decode(_bmp(w, h, 4, rle4_encode(rows4),
                                      compression=2, palette=_PAL16))
    assert p4_rle == p4_plain


def test_bmp_rle_error_contract():
    with pytest.raises(ValueError, match="outside image bounds"):
        bmp_decode(_bmp(1, 1, 8, b"\x02\xaa\x00\x01",
                        compression=1, palette=_PAL256))
    with pytest.raises(ValueError, match="missing end-of-bitmap"):
        bmp_decode(_bmp(2, 2, 8, b"\x02\xaa\x00\x00",
                        compression=1, palette=_PAL256))
    with pytest.raises(ValueError, match="truncated BMP RLE absolute"):
        bmp_decode(_bmp(8, 2, 8, b"\x00\x06\x01\x02",
                        compression=1, palette=_PAL256))
    with pytest.raises(ValueError, match="truncated BMP RLE delta"):
        bmp_decode(_bmp(8, 2, 8, b"\x00\x02\x01",
                        compression=1, palette=_PAL256))
    with pytest.raises(ValueError, match="spec-invalid"):
        bmp_decode(_bmp(2, 2, 4, b"\x00\x01",
                        compression=1, palette=_PAL16))
    with pytest.raises(ValueError, match="top-down"):
        bmp_decode(_bmp(2, 2, 8, b"\x00\x01",
                        compression=1, palette=_PAL256, top_down=True))


# --------------------------------------------------------------------
# synthetic PNM coverage
# --------------------------------------------------------------------

def test_pnm_ascii_variants_and_comments():
    p1 = b"P1\n# comment\n3 2\n1 0 1\n0 1 0\n"
    w, h, c, px = pnm_decode(p1)
    assert (w, h, c) == (3, 2, 1)
    assert list(px) == [0, 255, 0, 255, 0, 255]   # 1 = black
    p2 = b"P2 # maxval next\n2 1 100\n0 100\n"
    assert list(pnm_decode(p2)[3]) == [0, 255]    # rescaled to 255
    p3 = b"P3\n1 1\n255\n12 34 56\n"
    assert list(pnm_decode(p3)[3]) == [12, 34, 56]
    # P1 digits packed without whitespace are legal
    assert list(pnm_decode(b"P1\n2 2\n1001")[3]) == [0, 255, 255, 0]


def test_pnm_binary_p4_row_alignment():
    # 9 px wide -> 2 bytes per row
    raw = bytes([0b10000000, 0b10000000, 0b01000000, 0b00000000])
    w, h, c, px = pnm_decode(b"P4\n9 2\n" + raw)
    a = np.frombuffer(px, np.uint8).reshape(2, 9)
    assert a[0, 0] == 0 and a[0, 8] == 0 and a[0, 1] == 255
    assert a[1, 1] == 0 and a[1, 0] == 255


def test_pnm_errors():
    with pytest.raises(ValueError, match="not a PNM"):
        pnm_decode(b"P7\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="truncated binary"):
        pnm_decode(b"P6\n4 4\n255\n\x00\x00")
    with pytest.raises(NotImplementedError, match="16-bit"):
        pnm_decode(b"P5\n1 1\n65535\n\x00\x00")
    with pytest.raises(ValueError, match="out of range"):
        pnm_decode(b"P2\n1 1\n10\n99\n")


def test_media_features_routes_bmp_pnm(spark):
    from snowflake_emulator_spark.operators.multimodal import media_features

    rows = [(0, bytearray((FIXDIR / "cpython_python.bmp").read_bytes())),
            (1, bytearray((FIXDIR / "cpython_python.ppm").read_bytes())),
            (2, bytearray((FIXDIR / "cpython_python.pbm").read_bytes()))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r for r in media_features(df).collect()}
    assert out[0].format == "bmp" and (out[0].width, out[0].height) == (16, 16)
    assert out[1].format == "pnm" and out[1].channels == 3
    assert out[2].format == "pnm" and out[2].channels == 1
    # the BMP and PPM of the same image must agree on mean_v exactly
    assert out[0].mean_v == out[1].mean_v
