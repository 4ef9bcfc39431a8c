"""GIF decode (r14): pure-stdlib LZW + container codec — LZW
round-trips incl. dictionary overflow, interlace, multi-frame local
palettes, extension skipping, error capture, byte-mutation fuzz, and
the Spark feature kernel."""

import struct

import pytest

from snowflake_emulator_spark.operators.gif import (
    _lzw_compress,
    _lzw_decompress,
    gif_decode,
    gif_encode,
    gif_features,
    synth_gif_media,
)


def _fixture_frames(i: int):
    w, h = 5 + i % 9, 4 + i % 7
    pal1 = [((7 * i + 11 * k) % 256, (11 * i + 5 * k) % 256,
             (13 * i + 3 * k) % 256) for k in range(16)]
    idx1 = bytes((i + 3 * x + 5 * y) % 16
                 for y in range(h) for x in range(w))
    frames = [(idx1, pal1)]
    if i % 3 == 2:
        pal2 = [((5 * i + 7 * k) % 256, (3 * i + 13 * k) % 256,
                 (17 * i + k) % 256) for k in range(16)]
        idx2 = bytes((2 * i + 5 * x + 3 * y) % 16
                     for y in range(h) for x in range(w))
        frames.append((idx2, pal2))
    return w, h, frames


def test_lzw_roundtrip_and_dict_overflow():
    import random

    rng = random.Random(7)
    for n, mcs in [(1, 2), (300, 4), (25000, 8), (5000, 2)]:
        data = bytes(rng.randrange(1 << mcs) for _ in range(n))
        assert _lzw_decompress(_lzw_compress(data, mcs), mcs, n) == data


def test_gif_roundtrip_all_variants():
    for i in range(12):
        w, h, frames = _fixture_frames(i)
        blob = gif_encode(w, h, frames, interlace=(i % 3 == 1),
                          transparent_idx=0 if i % 3 == 2 else None)
        w2, h2, got = gif_decode(blob)
        assert (w2, h2, len(got)) == (w, h, len(frames))
        for fi, (idx, pal) in enumerate(frames):
            assert got[fi] == bytes(v for ci in idx for v in pal[ci])


def test_gif_extension_skipping_and_errors():
    w, h, frames = _fixture_frames(0)
    blob = bytearray(gif_encode(w, h, frames))
    # image descriptor sits right after header + 16-entry GCT (a bare
    # .index(0x2C) can hit a palette byte)
    desc = 13 + 3 * 16
    assert blob[desc] == 0x2C
    commented = (bytes(blob[:desc]) + b"\x21\xfe\x05hello\x00"
                 + bytes(blob[desc:]))
    w2, h2, got = gif_decode(commented)
    assert (w2, h2, len(got)) == (w, h, 1)
    with pytest.raises(ValueError, match="signature"):
        gif_decode(b"BMP?" * 4)
    with pytest.raises(ValueError):
        gif_decode(None)
    with pytest.raises(ValueError):
        gif_decode(bytes(blob[: len(blob) // 2]))
    # sub-rectangle frames are a documented boundary
    sub = bytearray(blob)
    sub[desc + 1:desc + 3] = struct.pack("<H", 1)  # left = 1
    with pytest.raises(NotImplementedError, match="full-canvas"):
        gif_decode(bytes(sub))


def test_gif_features_spark(spark):
    ids = spark.createDataFrame([(i,) for i in range(9)], ["doc_id"])
    out = {r["media_id"]: r for r in
           gif_features(synth_gif_media(ids)).collect()}
    assert len(out) == 9
    for i in range(9):
        r = out[i]
        assert r["decode_ok"], r["error"]
        assert (r["width"], r["height"]) == (5 + i % 9, 4 + i % 7)
        assert r["n_frames"] == (2 if i % 3 == 2 else 1)
    # closed-form mean check over both frames of a 2-frame clip
    i = 2
    w, h, frames = _fixture_frames(i)
    vals = [pal[ci][0] for idx, pal in frames for ci in idx]
    assert out[2]["mean_r"] == pytest.approx(
        sum(vals) / len(vals), abs=1e-6)

    bad = spark.createDataFrame(
        [(100, bytearray(b"GIF89a-corrupt")), (101, None)],
        "media_id long, content binary")
    rows = {r["media_id"]: r for r in gif_features(bad).collect()}
    assert not rows[100]["decode_ok"] and not rows[101]["decode_ok"]


def test_gif_mutation_robustness(spark):
    import random

    rng = random.Random(1447)
    rows = []
    for i in range(60):
        w, h, frames = _fixture_frames(i % 12)
        blob = bytearray(gif_encode(w, h, frames,
                                    interlace=(i % 3 == 1)))
        pos = rng.randrange(len(blob))
        blob[pos] ^= 1 << rng.randrange(8)
        rows.append((i, blob))
    for _i, blob in rows:
        try:
            w2, h2, got = gif_decode(bytes(blob))
            assert all(len(fr) == w2 * h2 * 3 for fr in got)
        except (ValueError, NotImplementedError, struct.error):
            pass
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = gif_features(df).collect()
    assert len(out) == 60
    assert all(isinstance(r["decode_ok"], bool) for r in out)


def test_gif_local_table_without_global():
    """A GIF whose ONLY palette is the frame's local color table (no
    GCT) must decode; a frame with neither table must raise."""
    import struct as _s

    w, h = 4, 3
    pal = [(10 * k, 20 * k, 30 * k) for k in range(4)]
    idx = bytes((x + y) % 4 for y in range(h) for x in range(w))
    from snowflake_emulator_spark.operators.gif import _lzw_compress
    lzw = _lzw_compress(idx, 2)
    palbytes = bytes(v for rgb in pal for v in rgb)
    blob = (b"GIF89a" + _s.pack("<HH", w, h) + bytes([0x00, 0, 0])  # no GCT
            + b"\x2c" + _s.pack("<HHHH", 0, 0, w, h)
            + bytes([0x81])  # LCT flag, size 1 -> 4 entries
            + palbytes + bytes([2])
            + bytes([len(lzw)]) + lzw + b"\x00" + b"\x3b")
    w2, h2, frames = gif_decode(blob)
    assert (w2, h2, len(frames)) == (w, h, 1)
    assert frames[0] == bytes(v for ci in idx for v in pal[ci])
    # neither GCT nor LCT -> error
    bad = (b"GIF89a" + _s.pack("<HH", w, h) + bytes([0x00, 0, 0])
           + b"\x2c" + _s.pack("<HHHH", 0, 0, w, h) + bytes([0x00])
           + bytes([2]) + bytes([len(lzw)]) + lzw + b"\x00" + b"\x3b")
    with pytest.raises(ValueError, match="color table"):
        gif_decode(bad)
