"""r16: MP4/ISO-BMFF box walk — struct-level independent parses,
encode/walk round-trips over every fixture variant, the box-framing
error contract, and the Spark video-metadata kernel."""
import struct

import pytest

from snowflake_emulator_spark.operators.video import (
    _box,
    mp4_encode,
    mp4_info,
    synth_mp4_media,
    video_features,
)
from snowflake_emulator_spark.operators.multimodal import (
    decode_image,
    sniff_format,
)


def _fixture(i: int) -> bytes:
    fps = (24, 25, 30)[i % 3]
    return mp4_encode(
        major_brand=b"isom" if i % 2 == 0 else b"mp42",
        w=160 + 16 * (i % 8), h=96 + 16 * (i % 5), fps=fps,
        n_video=24 + i % 48,
        video_codec=b"avc1" if i % 2 == 0 else b"hev1",
        audio=(b"mp4a", (44100, 48000)[i % 2], 32 + i % 16)
        if i % 3 != 1 else None,
        version=1 if i % 4 == 3 else 0,
        mdat_first=i % 5 == 1, with_uuid=i % 7 == 2,
        force64_free=i % 6 == 4)


def _top_level_boxes(b: bytes) -> list[tuple[bytes, int]]:
    """Independent top-level box scan with raw struct calls."""
    out, pos = [], 0
    while pos < len(b):
        size = struct.unpack(">I", b[pos:pos + 4])[0]
        fourcc = b[pos + 4:pos + 8]
        if size == 1:
            size = struct.unpack(">Q", b[pos + 8:pos + 16])[0]
        out.append((fourcc, size))
        pos += size
    assert pos == len(b)
    return out


@pytest.mark.parametrize("i", range(0, 30))
def test_roundtrip_all_variants(i):
    b = _fixture(i)
    assert sniff_format(b) == "mp4"
    mi = mp4_info(b)
    fps = (24, 25, 30)[i % 3]
    n = 24 + i % 48
    assert mi["major_brand"] == ("isom" if i % 2 == 0 else "mp42")
    assert mi["n_tracks"] == (2 if i % 3 != 1 else 1)
    vid = mi["tracks"][0]
    assert vid["handler"] == "vide"
    assert vid["codec"] == ("avc1" if i % 2 == 0 else "hev1")
    assert (int(vid["width"]), int(vid["height"])) \
        == (160 + 16 * (i % 8), 96 + 16 * (i % 5))
    assert vid["n_samples"] == n
    assert vid["timescale"] == fps * 1000
    assert mi["duration"] == n * (600 // fps)
    assert mi["timescale"] == 600
    if i % 3 != 1:
        aud = mi["tracks"][1]
        assert aud["handler"] == "soun" and aud["codec"] == "mp4a"
        assert aud["timescale"] == (44100, 48000)[i % 2]
    # independent top-level framing check
    tops = [f for f, _s in _top_level_boxes(b)]
    assert tops[0] == b"ftyp" and b"moov" in tops and b"mdat" in tops
    if i % 5 == 1:
        assert tops.index(b"mdat") < tops.index(b"moov")
    if i % 7 == 2:
        assert b"uuid" in tops
    # dispatch layer
    feat = decode_image(b)
    assert len(feat) == 8 and feat[0] == 9 / 4
    assert feat[5] == 1.0  # has_video


def test_struct_level_mvhd_against_encoder():
    """Parse mvhd by hand (no walker) and compare with mp4_info."""
    b = _fixture(6)
    mi = mp4_info(b)
    p = b.find(b"mvhd")
    assert p > 0
    v = b[p + 4]
    assert v == 0
    ts, dur = struct.unpack(">II", b[p + 16:p + 24])
    assert (ts, dur) == (mi["timescale"], mi["duration"])
    b64 = _fixture(3)  # version-1 headers
    mi64 = mp4_info(b64)
    p = b64.find(b"mvhd")
    assert b64[p + 4] == 1
    ts = struct.unpack(">I", b64[p + 24:p + 28])[0]
    dur = struct.unpack(">Q", b64[p + 28:p + 36])[0]
    assert (ts, dur) == (mi64["timescale"], mi64["duration"])


def test_multi_entry_stts():
    """An stts with several (count, delta) runs sums correctly."""
    b = bytearray(_fixture(0))
    p = bytes(b).find(b"stts")
    # replace the single-run table [1 run: (n, 1000)] with 2 runs that
    # sum to the same count: (10, 1000) + (14, 500)
    n = 24
    old = struct.pack(">I", 1) + struct.pack(">II", n, 1000)
    new = struct.pack(">I", 2) + struct.pack(">II", 10, 1000) \
        + struct.pack(">II", 14, 500)
    blob = bytes(b).replace(
        struct.pack(">I", 8 + 4 + len(old)) + b"stts"
        + bytes([0, 0, 0, 0]) + old,
        struct.pack(">I", 8 + 4 + len(new)) + b"stts"
        + bytes([0, 0, 0, 0]) + new, 1)
    assert len(blob) != len(b) or blob != bytes(b)
    # the moov-internal size fields no longer match -> must raise
    with pytest.raises(ValueError):
        mp4_info(blob)


def test_error_contract():
    with pytest.raises(ValueError):
        mp4_info(None)
    with pytest.raises(ValueError):
        mp4_info(b"short")
    good = _fixture(0)
    # no ftyp: strip the first box
    size0 = struct.unpack(">I", good[:4])[0]
    with pytest.raises(ValueError, match="no ftyp"):
        mp4_info(good[size0:])
    # truncated mid-box
    with pytest.raises(ValueError):
        mp4_info(good[:len(good) // 2 + 3])
    # child overruns parent: corrupt moov's size down
    p = good.find(b"moov") - 4
    bad = bytearray(good)
    bad[p:p + 4] = struct.pack(">I", 24)
    with pytest.raises(ValueError):
        mp4_info(bytes(bad))
    # mvhd timescale 0
    p = good.find(b"mvhd")
    bad = bytearray(good)
    bad[p + 16:p + 20] = struct.pack(">I", 0)
    with pytest.raises(ValueError, match="timescale 0"):
        mp4_info(bytes(bad))
    # ftyp alone (no moov)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom")
    with pytest.raises(ValueError, match="no moov"):
        mp4_info(ftyp + _box(b"free", bytes(8)))


def test_fragmented_raises():
    """moof/mvex streams have empty moov sample tables; reporting them
    as zero-frame videos would be silently wrong -> declared boundary."""
    good = _fixture(0)
    frag = good + _box(b"moof", _box(b"mfhd", bytes(8)))
    with pytest.raises(NotImplementedError, match="fragmented"):
        mp4_info(frag)


def test_size0_box_rules():
    """size-0 (to EOF) is legal only at top level."""
    good = _fixture(0)
    tail = _box(b"skip", bytes(4))
    blob = good + struct.pack(">I", 0) + b"free" + bytes(100)
    mp4_info(blob)  # top-level size-0: fine
    del tail
    # inside moov: must raise — shrink a trak's tkhd size field to 0
    p = good.find(b"tkhd") - 4
    bad = bytearray(good)
    bad[p:p + 4] = struct.pack(">I", 0)
    with pytest.raises(ValueError, match="size-0"):
        mp4_info(bytes(bad))


def test_video_features_kernel(spark):
    ids = spark.range(0, 15).withColumnRenamed("id", "doc_id")
    media = synth_mp4_media(ids)
    rows = {r.media_id: r for r in video_features(media).collect()}
    assert len(rows) == 15
    for i, r in rows.items():
        fps = (24, 25, 30)[i % 3]
        n = 24 + i % 48
        assert r.decode_ok, r.error
        assert r.format == "mp4"
        assert r.major_brand == ("isom" if i % 2 == 0 else "mp42")
        assert (r.width, r.height) == (160 + 16 * (i % 8),
                                       96 + 16 * (i % 5))
        assert r.frame_count == n
        assert r.duration_ms == n * (600 // fps) * 1000 // 600
        assert r.video_codec == ("avc1" if i % 2 == 0 else "hev1")
        assert r.audio_codec == ("mp4a" if i % 3 != 1 else None)
    # corrupt row: captured per-row, not task failure
    bad = spark.createDataFrame(
        [(99, bytearray(b"\x00\x00\x00\x08ftypcorrupt"))],
        "media_id: long, content: binary")
    r = video_features(bad).collect()[0]
    assert not r.decode_ok and r.error is not None
