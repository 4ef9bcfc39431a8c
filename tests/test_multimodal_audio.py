"""WAV/RIFF PCM decode (r14): pure stdlib+numpy codec behind the
mapInPandas kernel — depth round-trips, chunk skipping, float PCM,
error capture, byte-mutation fuzz, and the Spark feature kernel."""

import math
import struct

import numpy as np
import pytest

from snowflake_emulator_spark.operators.audio import (
    synth_wav_media,
    wav_decode,
    wav_encode,
    wav_features,
)


def test_wav_roundtrip_all_depths():
    rng = np.random.RandomState(14)
    for bits, lo, hi in [(8, -128, 128), (16, -32768, 32768),
                         (24, -(1 << 23), 1 << 23),
                         (32, -(1 << 31), 1 << 31)]:
        s = rng.randint(lo, hi, (97, 2), dtype=np.int64)
        rate, ch, got = wav_decode(wav_encode(44100, 2, s, bits,
                                              junk_chunk=True))
        assert (rate, ch) == (44100, 2)
        assert np.array_equal(got.astype(np.int64), s), bits


def test_wav_float32_pcm():
    """Format 3 (IEEE float) decodes as float32 verbatim."""
    vals = np.array([0.0, -1.0, 0.5, 0.25], dtype="<f4")
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    blob = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 16)
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 16) + vals.tobytes())
    rate, ch, got = wav_decode(blob)
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(got.reshape(-1), vals)


def test_wav_decoder_errors():
    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"JUNK" * 10)
    with pytest.raises(ValueError):
        wav_decode(None)
    with pytest.raises(ValueError, match="missing fmt"):
        wav_decode(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    # compressed formats are a documented capability boundary
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 8)  # ADPCM
    blob = (b"RIFF" + struct.pack("<I", 100) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(NotImplementedError, match="format 2"):
        wav_decode(blob)


def test_wav_odd_chunk_padding():
    """Odd-length chunks carry a pad byte the walker must honor (the
    junk LIST chunk in wav_encode is deliberately odd-length)."""
    s = np.arange(-10, 10, dtype=np.int64)[:, None]
    blob = wav_encode(8000, 1, s, 16, junk_chunk=True)
    _rate, _ch, got = wav_decode(blob)
    assert np.array_equal(got.reshape(-1), np.arange(-10, 10))


def test_wav_features_spark(spark):
    ids = spark.createDataFrame([(i,) for i in range(9)], ["doc_id"])
    out = {r["media_id"]: r for r in
           wav_features(synth_wav_media(ids)).collect()}
    assert len(out) == 9
    for i in range(9):
        r = out[i]
        assert r["decode_ok"], r["error"]
        n = 50 + i % 37
        assert r["n_samples"] == n
        assert r["channels"] == (2 if i % 3 == 1 else 1)
        rate = {0: 8000, 1: 16000, 2: 11025}[i % 3]
        assert r["sample_rate"] == rate
        assert r["duration_ms"] == (n * 1000) // rate
    # closed-form check for one clip
    i, n = 3, 53
    t = np.arange(n)
    s = ((7 * i + 13 * t) * 257) % 65536 - 32768
    flat = s.astype(float)
    assert out[3]["mean_dc"] == pytest.approx(flat.mean(), abs=1e-9)
    assert out[3]["rms"] == pytest.approx(
        math.sqrt((flat * flat).mean()), abs=1e-9)
    assert out[3]["peak_abs"] == float(np.abs(s).max())

    bad = spark.createDataFrame(
        [(100, bytearray(b"RIFFgarbage!")), (101, None)],
        "media_id long, content binary")
    rows = {r["media_id"]: r for r in wav_features(bad).collect()}
    assert not rows[100]["decode_ok"] and not rows[101]["decode_ok"]


def test_wav_mutation_robustness(spark):
    """Byte-mutation fuzz: corrupted WAVs fail per-row, never the
    task; surviving decodes never return ragged frames."""
    import random

    rng = random.Random(1441)
    rows = []
    for i in range(60):
        n = rng.randint(1, 120)
        ch = rng.choice([1, 2])
        bits = rng.choice([8, 16])
        lo, hi = (-128, 128) if bits == 8 else (-32768, 32768)
        s = np.array([[rng.randrange(lo, hi) for _ in range(ch)]
                      for _ in range(n)], dtype=np.int64)
        blob = bytearray(wav_encode(rng.choice([8000, 44100]), ch, s, bits))
        pos = rng.randrange(len(blob))
        blob[pos] ^= 1 << rng.randrange(8)
        rows.append((i, blob))
    for _i, blob in rows:
        try:
            _rate, ch2, got = wav_decode(bytes(blob))
            assert got.shape[1] == ch2
        except (ValueError, NotImplementedError, struct.error):
            pass
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = wav_features(df).collect()
    assert len(out) == 60
    assert all(isinstance(r["decode_ok"], bool) for r in out)


def test_wav_float_features_spark(spark):
    """IEEE float32 PCM flows through the feature kernel (mean/rms on
    float samples, not just integer PCM)."""
    vals = np.array([0.5, -0.5, 0.25, -0.25] * 10, dtype="<f4")
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    payload = vals.tobytes()
    blob = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload)
    df = spark.createDataFrame([(1, bytearray(blob))],
                               "media_id long, content binary")
    r = wav_features(df).collect()[0]
    assert r["decode_ok"], r["error"]
    assert r["n_samples"] == 40 and r["channels"] == 1
    assert r["peak_abs"] == 0.5
    assert abs(r["mean_dc"]) < 1e-9
    assert r["rms"] == pytest.approx(
        math.sqrt((vals.astype(float) ** 2).mean()), abs=1e-9)


def _g711_wav(fmt_code: int, payload: bytes, ch: int = 1,
              rate: int = 8000) -> bytes:
    fmt = struct.pack("<HHIIHH", fmt_code, ch, rate, rate * ch, ch, 8)
    return (b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload)


def test_g711_tables_match_audioop_exactly():
    """r15: mu-law (format 7) and A-law (format 6) expansion — every
    one of the 256 codes must equal stdlib audioop's G.711 tables (an
    entirely independent implementation)."""
    audioop = pytest.importorskip("audioop")
    from snowflake_emulator_spark.operators.audio import (
        _ALAW_LUT,
        _MULAW_LUT,
    )

    raw = bytes(range(256))
    ref_u = np.frombuffer(audioop.ulaw2lin(raw, 2), dtype="<i2")
    ref_a = np.frombuffer(audioop.alaw2lin(raw, 2), dtype="<i2")
    assert np.array_equal(np.asarray(_MULAW_LUT), ref_u.astype(np.int32))
    assert np.array_equal(np.asarray(_ALAW_LUT), ref_a.astype(np.int32))


def test_g711_wav_container_decode():
    payload = bytes(range(64))
    sr, ch, arr = wav_decode(_g711_wav(7, payload, ch=2))
    assert (sr, ch, arr.shape) == (8000, 2, (32, 2))
    sr, ch, arr = wav_decode(_g711_wav(6, payload))
    assert (sr, ch, arr.shape) == (8000, 1, (64, 1))
    assert str(arr.dtype) == "int32"
    # G.711 requires 8-bit samples
    bad = bytearray(_g711_wav(7, payload))
    bad[34] = 16  # bits-per-sample field
    with pytest.raises(ValueError, match="G.711 requires 8-bit"):
        wav_decode(bytes(bad))


def test_ima_adpcm_matches_audioop_exactly():
    """r15: WAV IMA ADPCM (format 0x11) — the block-header sample plus
    the canonical IMA nibble loop must equal stdlib audioop's DVI
    implementation (seeded state, nibble order converted: WAV stores
    LOW nibble first, audioop HIGH first), mono and stereo."""
    audioop = pytest.importorskip("audioop")
    import random

    def swap(bs):
        return bytes(((b & 0x0F) << 4) | (b >> 4) for b in bs)

    def container(ch, block):
        fmt = struct.pack("<HHIIHH", 0x11, ch, 8000,
                          8000 * len(block), len(block), 4)
        return (b"RIFF" + struct.pack("<I", 36 + len(block)) + b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(block)) + block)

    rng = random.Random(7)
    pred0, idx0 = 1234, 20
    lin = struct.pack("<32h", *[rng.randint(-20000, 20000)
                                for _ in range(32)])
    adp, _ = audioop.lin2adpcm(lin, 2, (pred0, idx0))
    nibs = swap(adp)                              # WAV low-first layout
    block = struct.pack("<hBB", pred0, idx0, 0) + nibs
    _sr, _ch, arr = wav_decode(container(1, block))
    ref_lin, _ = audioop.adpcm2lin(adp, 2, (pred0, idx0))
    ref = [pred0] + list(struct.unpack("<%dh" % (len(ref_lin) // 2),
                                       ref_lin))
    assert list(arr.reshape(-1)) == ref

    p0, i0, p1, i1 = -500, 5, 9000, 44
    adpL, _ = audioop.lin2adpcm(
        struct.pack("<16h", *[rng.randint(-15000, 15000)
                              for _ in range(16)]), 2, (p0, i0))
    adpR, _ = audioop.lin2adpcm(
        struct.pack("<16h", *[rng.randint(-15000, 15000)
                              for _ in range(16)]), 2, (p1, i1))
    nl, nr = swap(adpL), swap(adpR)
    data = b"".join(nl[k:k + 4] + nr[k:k + 4] for k in range(0, 8, 4))
    block = (struct.pack("<hBB", p0, i0, 0)
             + struct.pack("<hBB", p1, i1, 0) + data)
    _sr, _ch, arr = wav_decode(container(2, block))
    for side, (pp, ii, aa) in enumerate([(p0, i0, adpL), (p1, i1, adpR)]):
        lin_ref, _ = audioop.adpcm2lin(aa, 2, (pp, ii))
        ref = [pp] + list(struct.unpack("<%dh" % (len(lin_ref) // 2),
                                        lin_ref))
        assert list(arr[:, side]) == ref


def test_ima_adpcm_errors():
    def container(ch, block_align, bits, payload):
        fmt = struct.pack("<HHIIHH", 0x11, ch, 8000,
                          8000 * block_align, block_align, bits)
        return (b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(payload)) + payload)

    with pytest.raises(ValueError, match="4-bit"):
        wav_decode(container(1, 12, 8, b"\x00" * 12))
    with pytest.raises(ValueError, match="step index"):
        bad = struct.pack("<hBB", 0, 99, 0) + b"\x00" * 8
        wav_decode(container(1, len(bad), 4, bad))
    with pytest.raises(ValueError, match="block_align"):
        wav_decode(container(1, 4, 4, b"\x00" * 4))
