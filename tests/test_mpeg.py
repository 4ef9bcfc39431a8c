"""r16 (VERDICT item 2): MPEG audio header walk — table spot checks
against the published ISO 11172-3 / 13818-3 values, encode->walk round
trips over every synth shape, Xing/VBRI metadata frames, the error
contract, sniff dispatch, and the external gsutil MP3 parsed in
independent layers (struct-level header math that does not trust the
decoder, plus byte-exact file-size accounting)."""
import hashlib
import json
import struct
from pathlib import Path

import pytest

from snowflake_emulator_spark.operators.mpeg import (
    mpeg_audio_info,
    mpeg_encode_headers,
    parse_frame_header,
    synth_mpeg_media,
)
from snowflake_emulator_spark.operators.multimodal import (
    decode_image,
    media_features,
    sniff_format,
)

FIXDIR = Path(__file__).parent / "fixtures" / "external_codec"
MANIFEST = json.loads((FIXDIR / "manifest.json").read_text())


# ---------------------------------------------------------------- tables

def _header(version, layer, br_idx, sr_idx, pad=0, mode=0):
    vbits = {"1": 3, "2": 2, "2.5": 0}[version]
    h = (0x7FF << 21) | (vbits << 19) | ((4 - layer) << 17) | (1 << 16) \
        | (br_idx << 12) | (sr_idx << 10) | (pad << 9) | (mode << 6)
    return struct.pack(">I", h)


@pytest.mark.parametrize("version,layer,br_idx,sr_idx,kbps,rate,spf,size", [
    # published table rows: (ISO 11172-3 Table B.1 / 13818-3)
    ("1", 3, 9, 0, 128, 44100, 1152, 417),    # 144*128000/44100 = 417.9
    ("1", 3, 14, 1, 320, 48000, 1152, 960),
    ("1", 2, 12, 1, 256, 48000, 1152, 768),
    ("1", 1, 8, 2, 256, 32000, 384, 384),     # (12*256000/32000)*4
    ("2", 3, 7, 0, 56, 22050, 576, 182),      # 72*56000/22050 = 182.8
    ("2", 1, 8, 1, 128, 24000, 384, 256),
    ("2.5", 3, 3, 2, 24, 8000, 576, 216),
    ("2.5", 2, 14, 0, 160, 11025, 1152, 2089),
])
def test_header_tables(version, layer, br_idx, sr_idx, kbps, rate, spf, size):
    h = parse_frame_header(_header(version, layer, br_idx, sr_idx))
    assert (h["version"], h["layer"]) == (version, layer)
    assert h["bitrate_kbps"] == kbps
    assert h["sample_rate"] == rate
    assert h["samples_per_frame"] == spf
    assert h["frame_size"] == size
    # padding adds one byte (four for Layer I)
    hp = parse_frame_header(_header(version, layer, br_idx, sr_idx, pad=1))
    assert hp["frame_size"] == size + (4 if layer == 1 else 1)


def test_header_error_contract():
    with pytest.raises(ValueError, match="truncated"):
        parse_frame_header(b"\xff\xfb")
    with pytest.raises(ValueError, match="no MPEG frame sync"):
        parse_frame_header(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="reserved MPEG version"):
        parse_frame_header(bytes([0xFF, 0xE8, 0x90, 0x00]))  # vbits=01
    with pytest.raises(ValueError, match="reserved MPEG layer"):
        parse_frame_header(bytes([0xFF, 0xF9, 0x90, 0x00]))  # lbits=00
    with pytest.raises(ValueError, match="bitrate index 15"):
        parse_frame_header(bytes([0xFF, 0xFB, 0xF0, 0x00]))
    with pytest.raises(NotImplementedError, match="free-format"):
        parse_frame_header(bytes([0xFF, 0xFB, 0x00, 0x00]))
    with pytest.raises(ValueError, match="sample-rate"):
        parse_frame_header(bytes([0xFF, 0xFB, 0x9C, 0x00]))


# ------------------------------------------------------------ stream walk

@pytest.mark.parametrize("version,layer,br_idx,sr_idx", [
    ("1", 3, 9, 0), ("1", 1, 8, 2), ("1", 2, 12, 1),
    ("2", 3, 7, 0), ("2.5", 3, 3, 2),
])
@pytest.mark.parametrize("channels", [1, 2])
def test_walk_round_trip(version, layer, br_idx, sr_idx, channels):
    n = 9
    blob = mpeg_encode_headers(version, layer, br_idx, sr_idx, channels, n,
                               pad_of_frame=lambda t: t % 2,
                               id3v2_size=33, id3v1=True)
    info = mpeg_audio_info(blob)
    ref = parse_frame_header(_header(version, layer, br_idx, sr_idx))
    assert info["frame_count"] == n
    assert info["channels"] == channels
    assert info["sample_rate"] == ref["sample_rate"]
    assert info["bitrate_kbps"] == ref["bitrate_kbps"]
    assert info["duration_s"] == pytest.approx(
        n * ref["samples_per_frame"] / ref["sample_rate"])
    assert not info["is_vbr"]
    assert info["id3v2_bytes"] == 43


def test_single_frame_stream():
    blob = mpeg_encode_headers("1", 3, 9, 0, 2, 1)
    assert mpeg_audio_info(blob)["frame_count"] == 1
    assert mpeg_audio_info(blob + b"TAG" + bytes(125))["frame_count"] == 1


def test_xing_header_detected_and_excluded():
    """A Xing metadata first frame carries no audio: it must set the
    VBR flag, surface the declared count, and NOT count as a frame."""
    blob = bytearray(mpeg_encode_headers("1", 3, 9, 0, 2, 5))
    xo = 4 + 32  # MPEG-1 stereo side-info size
    blob[xo:xo + 4] = b"Xing"
    blob[xo + 4:xo + 8] = struct.pack(">I", 1)   # FRAMES flag
    blob[xo + 8:xo + 12] = struct.pack(">I", 4)  # declared audio frames
    info = mpeg_audio_info(bytes(blob))
    assert info["vbr_tag"] == "Xing"
    assert info["declared_frame_count"] == 4
    assert info["frame_count"] == 4  # 5 walked minus the Xing frame
    assert info["is_vbr"]


def test_info_header_cbr_tag():
    """LAME writes 'Info' for CBR files — tag surfaced, frame excluded,
    but is_vbr stays False."""
    blob = bytearray(mpeg_encode_headers("1", 3, 9, 0, 1, 4))
    xo = 4 + 17  # MPEG-1 mono side-info
    blob[xo:xo + 4] = b"Info"
    blob[xo + 4:xo + 8] = struct.pack(">I", 0)   # no fields
    info = mpeg_audio_info(bytes(blob))
    assert info["vbr_tag"] == "Info"
    assert info["frame_count"] == 3
    assert not info["is_vbr"]


def test_vbri_header_detected():
    blob = bytearray(mpeg_encode_headers("1", 3, 9, 0, 2, 3))
    vo = 4 + 32
    blob[vo:vo + 4] = b"VBRI"
    blob[vo + 4:vo + 14] = bytes(10)              # ver/delay/quality/bytes
    blob[vo + 14:vo + 18] = struct.pack(">I", 2)  # frames
    info = mpeg_audio_info(bytes(blob))
    assert info["vbr_tag"] == "VBRI"
    assert info["declared_frame_count"] == 2
    assert info["is_vbr"]


def test_walk_error_contract():
    with pytest.raises(ValueError, match="no valid MPEG frame sync"):
        mpeg_audio_info(bytes(64))
    with pytest.raises(ValueError, match="null content"):
        mpeg_audio_info(None)
    # ID3 tag claiming more bytes than the stream has
    bad = b"ID3\x04\x00\x00" + bytes([0, 0, 0x7F, 0x7F]) + bytes(4)
    with pytest.raises(ValueError, match="exhausts"):
        mpeg_audio_info(bad)
    # mid-stream garbage after valid frames -> desync error, not a
    # silently short duration
    blob = mpeg_encode_headers("1", 3, 9, 0, 2, 4) + b"\x01\x02garbage!"
    with pytest.raises(ValueError, match="desynced"):
        mpeg_audio_info(blob)
    # a lone sync-looking pair inside junk must not fake a stream
    with pytest.raises(ValueError, match="no valid MPEG frame sync"):
        mpeg_audio_info(b"\xff\xfb\x90\x00" + bytes(64))


def test_sniff_dispatch():
    assert sniff_format(b"ID3\x04\x00\x00\x00\x00\x00\x00rest") == "mpeg"
    assert sniff_format(mpeg_encode_headers("1", 3, 9, 0, 2, 2)) == "mpeg"
    assert sniff_format(bytes([0xFF, 0xFB, 0xF0, 0x00])) is None  # br=15
    assert sniff_format(bytes([0xFF, 0xE8, 0x90, 0x00])) is None  # ver res.
    assert sniff_format(b"\xff\xd8\xff\xe0") == "jpeg"            # no clash


# --------------------------------------------------- external corpus file

def test_external_gsutil_mp3_struct_level():
    """Layered check that does NOT trust the walker: sha256 pin, raw
    ID3v2 size math, first-header bit fields decoded with independent
    arithmetic, and byte-exact accounting — the sum of the walked frame
    sizes must land exactly on the end of the file."""
    b = (FIXDIR / "gsutil_test.mp3").read_bytes()
    m = MANIFEST["gsutil_test.mp3"]
    assert hashlib.sha256(b).hexdigest() == m["file_sha256"]
    assert b[:3] == b"ID3"
    id3 = 10 + ((b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9])
    assert id3 == m["id3v2_bytes"] == 32
    h0, h1 = b[id3], b[id3 + 1]
    assert h0 == 0xFF and (h1 & 0xE0) == 0xE0
    assert (h1 >> 3) & 3 == 2          # MPEG-2
    assert 4 - ((h1 >> 1) & 3) == 3    # Layer III
    br_idx = b[id3 + 2] >> 4
    sr_idx = (b[id3 + 2] >> 2) & 3
    assert (br_idx, sr_idx) == (8, 0)  # 64 kbps @ 22050 per 13818-3
    assert (b[id3 + 3] >> 6) & 3 == 3  # single channel
    # independent frame-size accounting: 72*64000/22050 = 208 + padding
    pos, frames = id3, 0
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            break
        pad = (b[pos + 2] >> 1) & 1
        pos += 208 + pad
        frames += 1
    assert pos == len(b)               # byte-exact: no trailing junk
    assert frames == m["frame_count"] == 45


def test_external_gsutil_mp3_walker():
    b = (FIXDIR / "gsutil_test.mp3").read_bytes()
    m = MANIFEST["gsutil_test.mp3"]
    info = mpeg_audio_info(b)
    assert info["version"] == m["version"]
    assert info["layer"] == m["layer"]
    assert info["sample_rate"] == m["sample_rate"]
    assert info["channels"] == m["channels"]
    assert info["frame_count"] == m["frame_count"]
    assert info["bitrate_kbps"] == m["bitrate_kbps"]
    assert info["duration_s"] == pytest.approx(m["duration_s"], abs=1e-6)
    feat = decode_image(b)             # dispatch path
    assert len(feat) == 8 and feat[0] == 7 / 4


# ------------------------------------------------------------- Spark path

def test_media_features_mpeg_rows(spark):
    ids = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    out = {r.media_id: r for r in
           media_features(synth_mpeg_media(ids)).collect()}
    assert len(out) == 20
    for i, r in out.items():
        assert r.decode_ok and r.format == "mpeg"
        assert r.channels == 2 - i % 2
        assert r.n_frames == 6 + i % 9
        spf, rate = r.height, r.width
        assert r.mean_v == pytest.approx(r.n_frames * spf / rate)
    # external file through the same kernel
    ext = (FIXDIR / "gsutil_test.mp3").read_bytes()
    df = spark.createDataFrame([(99, bytearray(ext))],
                               "media_id long, content binary")
    row = media_features(df).collect()[0]
    assert row.decode_ok and row.format == "mpeg"
    assert (row.width, row.channels, row.n_frames) == (22050, 1, 45)
    assert row.peak_v == 64.0
