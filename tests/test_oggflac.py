"""r16: FLAC + Ogg header walks — published CRC catalog anchors, the
STREAMINFO bit-field layout checked at the raw-struct level, page/
packet accounting, CRC tamper detection, and the Spark kernel."""
import struct

import pytest

from snowflake_emulator_spark.operators.oggflac import (
    _RATES,
    codec_meta_features,
    flac_encode_meta,
    flac_info,
    ogg_crc,
    ogg_encode_stream,
    ogg_info,
    ogg_page,
    opus_head_packet,
    synth_oggflac_media,
    vorbis_ident_packet,
)
from snowflake_emulator_spark.operators.multimodal import (
    decode_image,
    sniff_format,
)


# ------------------------------------------------------------------
# CRC: anchored to two independent published catalog check values
# ------------------------------------------------------------------

def test_ogg_crc_catalog_anchors():
    """The Ogg CRC (poly 0x04C11DB7, init 0, no reflection, no final
    xor) relates to two published CRC catalog entries: CRC-32/CKSUM
    (same params + final xor 0xFFFFFFFF, check 0x765E7680) and
    CRC-32/MPEG-2 (same poly, init 0xFFFFFFFF, check 0x0376E6E7).
    These pin the polynomial, bit order and table against third-party
    ground truth — no self-roundtrip involved."""
    assert ogg_crc(b"123456789") ^ 0xFFFFFFFF == 0x765E7680
    assert ogg_crc(b"123456789", init=0xFFFFFFFF) == 0x0376E6E7
    assert ogg_crc(b"") == 0


# ------------------------------------------------------------------
# FLAC
# ------------------------------------------------------------------

def test_streaminfo_bit_layout_struct_level():
    """Build a STREAMINFO with known values and verify the packed
    64-bit field byte-by-byte with raw arithmetic — independent of
    flac_info's own shifts."""
    blob = flac_encode_meta(44100, 2, 24, 0x123456789)
    assert blob[:4] == b"fLaC"
    assert blob[4] == 0x80  # last-block flag + type 0
    assert int.from_bytes(blob[5:8], "big") == 34
    body = blob[8:]
    packed = int.from_bytes(body[10:18], "big")
    assert packed >> 44 == 44100
    assert ((packed >> 41) & 7) + 1 == 2
    assert ((packed >> 36) & 0x1F) + 1 == 24
    assert packed & ((1 << 36) - 1) == 0x123456789
    fi = flac_info(blob)
    assert (fi["sample_rate"], fi["channels"], fi["bits_per_sample"],
            fi["total_samples"]) == (44100, 2, 24, 0x123456789)


@pytest.mark.parametrize("i", range(12))
def test_flac_roundtrip(i):
    blob = flac_encode_meta(_RATES[i % 4], 1 + i % 2, 16, 1000 + 37 * i,
                            n_comments=i % 5, with_comment=i % 2 == 0,
                            with_padding=i % 4 == 1)
    assert sniff_format(blob) == "flac"
    fi = flac_info(blob)
    assert fi["sample_rate"] == _RATES[i % 4]
    assert fi["channels"] == 1 + i % 2
    assert fi["total_samples"] == 1000 + 37 * i
    assert fi["duration_s"] == pytest.approx(
        (1000 + 37 * i) / _RATES[i % 4])
    assert fi["block_types"][0] == "STREAMINFO"
    if i % 2 == 0:
        assert fi["n_comments"] == i % 5
        assert "VORBIS_COMMENT" in fi["block_types"]
    feat = decode_image(blob)
    assert len(feat) == 8 and feat[0] == 11 / 4


def test_flac_errors():
    with pytest.raises(ValueError):
        flac_info(None)
    with pytest.raises(ValueError):
        flac_info(b"flaC" + bytes(40))
    good = flac_encode_meta(8000, 1, 16, 100)
    with pytest.raises(ValueError):  # truncated block body
        flac_info(good[:20])
    # STREAMINFO wrong length
    bad = bytearray(good)
    bad[5:8] = (33).to_bytes(3, "big")
    with pytest.raises(ValueError, match="STREAMINFO length"):
        flac_info(bytes(bad[:-1]))
    # zero sample rate
    bad = bytearray(good)
    packed = 0 << 44 | 0 << 41 | 15 << 36 | 100
    bad[8 + 10:8 + 18] = packed.to_bytes(8, "big")
    with pytest.raises(ValueError, match="sample rate 0"):
        flac_info(bytes(bad))
    # PADDING first (no STREAMINFO lead block)
    pad_first = b"fLaC" + bytes([1]) + (4).to_bytes(3, "big") + bytes(4) \
        + good[4:]
    with pytest.raises(ValueError, match="first block"):
        flac_info(pad_first)


# ------------------------------------------------------------------
# Ogg
# ------------------------------------------------------------------

@pytest.mark.parametrize("i", range(12))
def test_ogg_roundtrip(i):
    if i % 2 == 0:
        blob = ogg_encode_stream("vorbis", 1 + i % 2, _RATES[i % 4],
                                 800 + 23 * i, 1000 + i, 2 + i % 3)
        oi = ogg_info(blob)
        assert oi["codec"] == "vorbis"
        assert oi["sample_rate"] == _RATES[i % 4]
        assert oi["n_samples"] == 800 + 23 * i
    else:
        pre = 312 + i % 5
        blob = ogg_encode_stream("opus", 1 + i % 2, 48000,
                                 960 * (4 + i % 7) + pre, 2000 + i,
                                 2 + i % 3, pre_skip=pre)
        oi = ogg_info(blob)
        assert oi["codec"] == "opus"
        assert oi["sample_rate"] == 48000
        assert oi["pre_skip"] == pre
        assert oi["n_samples"] == 960 * (4 + i % 7)
    assert sniff_format(blob) == "ogg"
    assert oi["channels"] == 1 + i % 2
    assert oi["n_pages"] == 3 + i % 3
    assert oi["has_eos"]
    feat = decode_image(blob)
    assert len(feat) == 8 and feat[0] == 12 / 4


def test_ogg_crc_tamper_detected():
    blob = bytearray(ogg_encode_stream("vorbis", 2, 44100, 999, 7, 2))
    # flip one byte inside the FIRST page's body (ident packet field
    # that is not re-derived): byte 40 sits in the vorbis header
    blob[40] ^= 0x01
    with pytest.raises(ValueError, match="CRC mismatch"):
        ogg_info(bytes(blob))


def test_ogg_packet_lacing_255_boundary():
    """A packet of exactly 255*k bytes needs a terminating 0 lacing
    value; packets spanning pages via 255 segments count once."""
    big = bytes(510)  # 2 x 255 + terminating 0
    page = ogg_page(5, 0, -1, [vorbis_ident_packet(1, 8000)], bos=True)
    page2 = ogg_page(5, 1, 1000, [big, b"tail"], eos=True)
    oi = ogg_info(page + page2)
    assert oi["n_packets"] == 3  # ident + big + tail
    # raw segment table check: big must lace as 255,255,0
    nsegs = page2[26]
    segs = list(page2[27:27 + nsegs])
    assert segs[:3] == [255, 255, 0]


def test_ogg_errors_and_boundaries():
    with pytest.raises(ValueError):
        ogg_info(b"OggX" + bytes(30))
    good = ogg_encode_stream("vorbis", 1, 8000, 100, 3, 1)
    with pytest.raises(ValueError):  # truncated page
        ogg_info(good[:-5])
    # version != 0
    bad = bytearray(good)
    bad[4] = 1
    with pytest.raises(ValueError, match="version"):
        ogg_info(bytes(bad))
    # first page without BOS
    no_bos = ogg_page(3, 0, 0, [vorbis_ident_packet(1, 8000)], bos=False)
    with pytest.raises(ValueError, match="BOS"):
        ogg_info(no_bos)
    # multiplexed: second BOS with a different serial
    p1 = ogg_page(3, 0, 0, [vorbis_ident_packet(1, 8000)], bos=True)
    p2 = ogg_page(4, 0, 0, [opus_head_packet(1, 312, 48000)], bos=True)
    with pytest.raises(NotImplementedError, match="multiplexed"):
        ogg_info(p1 + p2)
    # unknown codec in the first packet
    unk = ogg_page(9, 0, 0, [b"\x01speex  " + bytes(30)], bos=True)
    with pytest.raises(NotImplementedError, match="unrecognized Ogg codec"):
        ogg_info(unk)
    # theora declared boundary
    th = ogg_page(9, 0, 0, [b"\x80theora" + bytes(30)], bos=True)
    with pytest.raises(NotImplementedError, match="Theora"):
        ogg_info(th)


# ------------------------------------------------------------------
# Spark kernel
# ------------------------------------------------------------------

def test_codec_meta_features_kernel(spark):
    ids = spark.range(0, 15).withColumnRenamed("id", "doc_id")
    media = synth_oggflac_media(ids)
    rows = {r.media_id: r for r in codec_meta_features(media).collect()}
    assert len(rows) == 15
    for i, r in rows.items():
        assert r.decode_ok, r.error
        v = i % 3
        if v == 0:
            assert (r.format, r.codec) == ("flac", "flac")
            assert r.sample_rate == _RATES[i % 4]
            assert r.n_samples == 1000 + 37 * i
        elif v == 1:
            assert (r.format, r.codec) == ("ogg", "vorbis")
            assert r.n_samples == 800 + 23 * i
            assert r.n_units == 3 + i % 3
        else:
            assert (r.format, r.codec) == ("ogg", "opus")
            assert r.sample_rate == 48000
            assert r.n_samples == 960 * (4 + i % 7)
        assert r.channels == 1 + i % 2
        assert r.duration_ms == r.n_samples * 1000 // r.sample_rate
    bad = spark.createDataFrame(
        [(99, bytearray(b"OggS" + bytes(40)))],
        "media_id: long, content: binary")
    r = codec_meta_features(bad).collect()[0]
    assert not r.decode_ok and r.error is not None
