"""r16: WebP header parse — struct-level checks of the VP8/VP8L/VP8X
bit layouts, round-trips, the error contract, and the Spark kernel."""
import struct

import pytest

from snowflake_emulator_spark.operators.webp import (
    webp_encode_extended,
    webp_encode_lossless,
    webp_encode_lossy,
    webp_features,
    webp_info,
    synth_webp_media,
)
from snowflake_emulator_spark.operators.multimodal import (
    decode_image,
    sniff_format,
)


@pytest.mark.parametrize("i", range(16))
def test_roundtrip_all_variants(i):
    w, h = 20 + i % 9, 12 + i % 7
    v = i % 3
    if v == 0:
        blob = webp_encode_lossy(w, h, pad=8 + i % 5)
    elif v == 1:
        blob = webp_encode_lossless(w, h, alpha=i % 2 == 1)
    else:
        blob = webp_encode_extended(w, h, alpha=i % 2 == 1,
                                    anim=i % 4 == 3)
    assert sniff_format(blob) == "webp"
    wi = webp_info(blob)
    assert (wi["width"], wi["height"]) == (w, h)
    assert wi["variant"] == ("lossy", "lossless", "extended")[v]
    if v > 0:
        assert wi["has_alpha"] == (i % 2 == 1)
    if v == 2:
        assert wi["has_animation"] == (i % 4 == 3)
    feat = decode_image(blob)
    assert len(feat) == 8 and feat[0] == 13 / 4


def test_vp8l_bit_packing_struct_level():
    """The VP8L 32-bit field: 14-bit w-1 | 14-bit h-1 | alpha | 3-bit
    version — checked with raw arithmetic against known dims."""
    blob = webp_encode_lossless(16383, 1, alpha=True)
    body = blob.index(b"VP8L") + 8
    assert blob[body] == 0x2F
    (bits,) = struct.unpack("<I", blob[body + 1:body + 5])
    assert (bits & 0x3FFF) + 1 == 16383
    assert ((bits >> 14) & 0x3FFF) + 1 == 1
    assert (bits >> 28) & 1 == 1
    assert (bits >> 29) == 0
    wi = webp_info(blob)
    assert (wi["width"], wi["height"], wi["has_alpha"]) \
        == (16383, 1, True)


def test_vp8x_canvas_24bit():
    blob = webp_encode_extended(100000 & 0x3FFF, 7, anim=False)
    # craft a canvas larger than 14 bits via VP8X's 24-bit fields
    w, h = 20000, 30000
    body = blob.index(b"VP8X") + 8
    mut = bytearray(blob)
    mut[body + 4:body + 7] = (w - 1).to_bytes(3, "little")
    mut[body + 7:body + 10] = (h - 1).to_bytes(3, "little")
    wi = webp_info(bytes(mut))
    assert (wi["width"], wi["height"]) == (w, h)


def test_odd_chunk_padding():
    """Chunks with odd payload sizes are padded to even offsets; the
    walk must honor the pad byte (RIFF rule)."""
    blob = webp_encode_lossy(5, 4, pad=7)  # payload 3+3+4+7 = 17, odd
    inner = blob.index(b"VP8 ")
    (clen,) = struct.unpack("<I", blob[inner + 4:inner + 8])
    assert clen % 2 == 1
    wi = webp_info(blob)
    assert (wi["width"], wi["height"]) == (5, 4)


def test_error_contract():
    with pytest.raises(ValueError):
        webp_info(None)
    with pytest.raises(ValueError):
        webp_info(b"RIFF\x10\x00\x00\x00WAVE" + bytes(8))
    good = webp_encode_lossy(6, 5)
    # RIFF size overruns the file
    bad = bytearray(good)
    bad[4:8] = struct.pack("<I", len(good) + 50)
    with pytest.raises(ValueError, match="overruns"):
        webp_info(bytes(bad))
    # broken VP8 start code
    p = good.index(b"\x9d\x01\x2a")
    bad = bytearray(good)
    bad[p] = 0x00
    with pytest.raises(ValueError, match="start code"):
        webp_info(bytes(bad))
    # interframe (non-key) first frame
    p = good.index(b"VP8 ") + 8
    bad = bytearray(good)
    bad[p] |= 0x01
    with pytest.raises(ValueError, match="keyframe"):
        webp_info(bytes(bad))
    # VP8L version != 0
    ll = bytearray(webp_encode_lossless(6, 5))
    body = ll.index(b"VP8L") + 8
    (bits,) = struct.unpack("<I", bytes(ll[body + 1:body + 5]))
    ll[body + 1:body + 5] = struct.pack("<I", bits | (1 << 29))
    with pytest.raises(ValueError, match="version"):
        webp_info(bytes(ll))
    # container with no image chunk
    empty = b"RIFF" + struct.pack("<I", 12) + b"WEBP" \
        + b"EXIF" + struct.pack("<I", 0)
    with pytest.raises(ValueError, match="no VP8"):
        webp_info(empty)


def test_webp_features_kernel(spark):
    ids = spark.range(0, 14).withColumnRenamed("id", "doc_id")
    rows = {r.media_id: r
            for r in webp_features(synth_webp_media(ids)).collect()}
    assert len(rows) == 14
    for i, r in rows.items():
        assert r.decode_ok, r.error
        assert (r.width, r.height) == (20 + i % 9, 12 + i % 7)
        assert r.variant == ("lossy", "lossless", "extended")[i % 3]
    bad = spark.createDataFrame(
        [(99, bytearray(b"RIFF\x04\x00\x00\x00WEBPxxxxxxxx"))],
        "media_id: long, content: binary")
    r = webp_features(bad).collect()[0]
    assert not r.decode_ok
