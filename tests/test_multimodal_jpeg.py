"""Baseline JPEG decode (r14, VERDICT item 2): pure stdlib+numpy
Huffman + dequant + IDCT codec behind the mapInPandas kernel —
round-trips across all fixture variants, lossy-tolerance round-trips
on arbitrary content, marker/stream error capture, restart intervals,
and byte-mutation fuzz."""

import struct

import numpy as np
import pytest

from snowflake_emulator_spark.operators.jpeg import (
    _FIXTURE_QT,
    jpeg_decode,
    jpeg_encode,
    jpeg_features,
    synth_jpeg_media,
)


def _fixture_gray(i: int):
    w, h = 10 + i % 23, 9 + i % 13
    bx, by = np.meshgrid(np.arange(w) // 8, np.arange(h) // 8)
    return w, h, (7 * i + 31 * bx + 17 * by) % 256


def _jfif_rgb(Y, Cb, Cr):
    r = np.clip(np.floor(Y + 1.402 * (Cr - 128.0) + 0.5), 0, 255)
    g = np.clip(np.floor(Y - 0.344136 * (Cb - 128.0)
                         - 0.714136 * (Cr - 128.0) + 0.5), 0, 255)
    b = np.clip(np.floor(Y + 1.772 * (Cb - 128.0) + 0.5), 0, 255)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def test_jpeg_gray_constant_blocks_exact():
    """8x8-constant blocks survive the full Huffman/DCT round trip
    EXACTLY (DC-only coefficients, lossless DC quantizer step)."""
    for i in (0, 3, 9, 12, 21):
        w, h, gray = _fixture_gray(i)
        w2, h2, ch, px = jpeg_decode(jpeg_encode(w, h, [gray], [(1, 1)]))
        assert (w2, h2, ch) == (w, h, 1)
        got = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
        assert np.array_equal(got, gray)


def test_jpeg_444_color_exact():
    for i in (1, 4, 7):
        w, h = 10 + i % 23, 9 + i % 13
        bx, by = np.meshgrid(np.arange(w) // 8, np.arange(h) // 8)
        Y = (5 * i + 29 * bx + 23 * by) % 256
        Cb = (3 * i + 19 * bx + 7 * by) % 256
        Cr = (11 * i + 13 * bx + 37 * by) % 256
        w2, h2, ch, px = jpeg_decode(
            jpeg_encode(w, h, [Y, Cb, Cr], [(1, 1)] * 3))
        assert (w2, h2, ch) == (w, h, 3)
        got = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
        assert np.array_equal(got, _jfif_rgb(Y, Cb, Cr))


def test_jpeg_420_subsampled_exact_with_restarts():
    """4:2:0 chroma constant per 16x16 MCU cell: replication upsample
    reproduces it exactly; restart intervals (RST markers + predictor
    resets) leave decoded pixels unchanged."""
    for i in (2, 5, 8, 20):
        w, h = 10 + i % 23, 9 + i % 13
        bx, by = np.meshgrid(np.arange(w) // 8, np.arange(h) // 8)
        Y = (5 * i + 29 * bx + 23 * by) % 256
        cw, chh = (w + 1) // 2, (h + 1) // 2
        cx, cy = np.meshgrid(np.arange(cw) // 8, np.arange(chh) // 8)
        Cb = (3 * i + 19 * cx + 7 * cy) % 256
        Cr = (11 * i + 13 * cx + 37 * cy) % 256
        fx, fy = np.meshgrid(np.arange(w) // 16, np.arange(h) // 16)
        exp = _jfif_rgb(Y, (3 * i + 19 * fx + 7 * fy) % 256,
                        (11 * i + 13 * fx + 37 * fy) % 256)
        for rst in (0, 1, 2):
            blob = jpeg_encode(w, h, [Y, Cb, Cr],
                               [(2, 2), (1, 1), (1, 1)],
                               restart_interval=rst)
            w2, h2, ch, px = jpeg_decode(blob)
            assert (w2, h2, ch) == (w, h, 3)
            got = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
            assert np.array_equal(got, exp), f"i={i} rst={rst}"


def test_jpeg_lossy_roundtrip_tolerance():
    """Arbitrary (non-constant) content with unit quant tables
    round-trips within 1 sample step — the float FDCT/IDCT pair plus
    quantization rounding is the only loss."""
    rng = np.random.RandomState(7)
    for _ in range(4):
        w, h = int(rng.randint(8, 48)), int(rng.randint(8, 32))
        img = rng.randint(0, 256, (h, w))
        blob = jpeg_encode(w, h, [img], [(1, 1)], quant_tables=[[1] * 64])
        w2, h2, ch, px = jpeg_decode(blob)
        got = np.frombuffer(px, dtype=np.uint8).reshape(h, w).astype(int)
        assert np.abs(got - img).max() <= 1


def test_jpeg_decoder_errors():
    w, h, gray = _fixture_gray(3)
    blob = bytearray(jpeg_encode(w, h, [gray], [(1, 1)]))
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError):
        jpeg_decode(None)
    with pytest.raises(ValueError, match="truncated|marker|Huffman"):
        jpeg_decode(bytes(blob[: len(blob) // 2]))
    sof0 = bytes(blob).find(b"\xff\xc0")
    # r14: SOF2 is now SUPPORTED — but a baseline stream relabeled
    # SOF2 carries an illegal full-band progressive scan (Ss=0,Se=63)
    # and must be rejected as corrupt, not decoded
    prog = bytes(blob[:sof0]) + b"\xff\xc2" + bytes(blob[sof0 + 2:])
    with pytest.raises(ValueError, match="spectral"):
        jpeg_decode(prog)
    # lossless SOF3 stays a documented capability boundary
    lossless = bytes(blob[:sof0]) + b"\xff\xc3" + bytes(blob[sof0 + 2:])
    with pytest.raises(NotImplementedError, match="SOF"):
        jpeg_decode(lossless)
    # 12-bit precision rejected
    twelve = bytearray(blob)
    twelve[sof0 + 4] = 12
    with pytest.raises(NotImplementedError, match="12-bit"):
        jpeg_decode(bytes(twelve))


def test_jpeg_quant_tables_in_zigzag_order():
    """DQT stores tables zigzagged; a non-flat table must round-trip
    through encode (natural order in, zigzag on wire, natural out)."""
    qt = [8] + [16 + (k % 5) for k in range(63)]
    w, h, gray = _fixture_gray(6)
    blob = jpeg_encode(w, h, [gray], [(1, 1)], quant_tables=[qt])
    # constant blocks only use the DC step -> still exact
    w2, h2, ch, px = jpeg_decode(blob)
    got = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
    assert np.array_equal(got, gray)
    # and the DQT payload on the wire is the zigzag of the natural table
    dqt = blob.find(b"\xff\xdb")
    payload = blob[dqt + 5:dqt + 5 + 64]
    assert payload[0] == qt[0] and payload[1] == qt[1] and payload[2] == qt[8]


def test_jpeg_features_spark(spark):
    """Spark kernel: fixture ids -> synth JPEGs -> decoded features
    match the closed-form expectation; a corrupt row is captured
    per-row, not fatal."""
    ids = spark.createDataFrame([(i,) for i in range(12)], ["doc_id"])
    media = synth_jpeg_media(ids)
    out = {r["media_id"]: r for r in jpeg_features(media).collect()}
    assert len(out) == 12
    for i in range(12):
        r = out[i]
        assert r["decode_ok"], r["error"]
        assert (r["width"], r["height"]) == (10 + i % 23, 9 + i % 13)
        assert r["channels"] == (1 if i % 3 == 0 else 3)
    # gray variant: mean equals the block-constant average
    w, h, gray = _fixture_gray(0)
    assert out[0]["mean_r"] == pytest.approx(gray.mean(), abs=1e-9)

    bad = spark.createDataFrame(
        [(100, bytearray(b"\xff\xd8garbage")), (101, None)],
        "media_id long, content binary")
    rows = {r["media_id"]: r for r in jpeg_features(bad).collect()}
    assert not rows[100]["decode_ok"] and rows[100]["error"]
    assert not rows[101]["decode_ok"]


def test_jpeg_decoder_mutation_robustness(spark):
    """Byte-mutation fuzz: corrupted JPEGs must fail CLEANLY — per-row
    decode_ok=False in the kernel (never a task crash) and only
    controlled exception types driver-side; a decode that still
    succeeds must never return a short pixel buffer."""
    import random

    rng = random.Random(1414)
    rows = []
    for i in range(60):
        w, h = rng.randint(1, 20), rng.randint(1, 16)
        bx, by = np.meshgrid(np.arange(w) // 8, np.arange(h) // 8)
        gray = (7 * i + 31 * bx + 17 * by) % 256
        if i % 2:
            blob = bytearray(jpeg_encode(w, h, [gray], [(1, 1)]))
        else:
            cw, ch_ = (w + 1) // 2, (h + 1) // 2
            cx, cy = np.meshgrid(np.arange(cw) // 8, np.arange(ch_) // 8)
            blob = bytearray(jpeg_encode(
                w, h, [gray, (3 * i + cx) % 256, (5 * i + cy) % 256],
                [(2, 2), (1, 1), (1, 1)]))
        pos = rng.randrange(len(blob))
        blob[pos] ^= 1 << rng.randrange(8)
        rows.append((i, blob))
    for i, blob in rows:
        try:
            w2, h2, ch2, px2 = jpeg_decode(bytes(blob))
            assert len(px2) == w2 * h2 * ch2
        except (ValueError, NotImplementedError, struct.error,
                KeyError, IndexError):
            pass
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = jpeg_features(df).collect()
    assert len(out) == 60
    assert all(isinstance(r["decode_ok"], bool) for r in out)


def test_jpeg_fixture_dc_step_is_lossless():
    """The exactness argument depends on the fixture DC quantizer step
    dividing the constant-block DC coefficient: DC = 8*(v-128) and
    step 8 recovers v-128 with no rounding loss."""
    assert _FIXTURE_QT[0] == 8


def test_jpeg_progressive_equals_baseline():
    """r14: a progressive (SOF2) stream carries the SAME quantized
    coefficients as baseline, re-ordered into spectral bands and
    successive-approximation bit planes — so progressive decode must
    equal baseline decode EXACTLY: gray + 4:2:0, dense and sparse AC
    (dense exercises ZRL/run codes, sparse exercises EOBn runs and
    the refinement correction-bit machinery)."""
    rng = np.random.RandomState(1414)
    for trial in range(3):
        w, h = int(rng.randint(8, 40)), int(rng.randint(8, 30))
        img = rng.randint(0, 256, (h, w))
        q1 = [[1] * 64]
        base = jpeg_decode(jpeg_encode(w, h, [img], [(1, 1)],
                                       quant_tables=q1))
        prog = jpeg_decode(jpeg_encode(w, h, [img], [(1, 1)],
                                       quant_tables=q1, progressive=True))
        assert base == prog
        # sparse AC via the default coarse quantizer
        sparse = (rng.randint(0, 3, (h, w)) * 9 + 115)
        assert (jpeg_decode(jpeg_encode(w, h, [sparse], [(1, 1)]))
                == jpeg_decode(jpeg_encode(w, h, [sparse], [(1, 1)],
                                           progressive=True)))
    w, h = 19, 14
    Y = rng.randint(0, 256, (h, w))
    Cb = rng.randint(0, 256, ((h + 1) // 2, (w + 1) // 2))
    Cr = rng.randint(0, 256, ((h + 1) // 2, (w + 1) // 2))
    samp = [(2, 2), (1, 1), (1, 1)]
    qq = dict(quant_tables=[[1] * 64, [1] * 64])
    assert (jpeg_decode(jpeg_encode(w, h, [Y, Cb, Cr], samp, **qq))
            == jpeg_decode(jpeg_encode(w, h, [Y, Cb, Cr], samp,
                                       progressive=True, **qq)))


def test_jpeg_progressive_fixture_variants(spark):
    """i%5==0 fixture ids ship SOF2 on the wire with identical decoded
    features; the kernel must not distinguish them."""
    ids = spark.createDataFrame([(i,) for i in (0, 5, 10, 15)], ["doc_id"])
    media = synth_jpeg_media(ids).collect()
    for r in media:
        blob = bytes(r["content"])
        assert b"\xff\xc2" in blob, "expected SOF2 for i%5==0 ids"
        assert blob.find(b"\xff\xc0") == -1
    out = {r["media_id"]: r for r in jpeg_features(
        spark.createDataFrame([(r["media_id"], r["content"])
                               for r in media],
                              "media_id long, content binary")).collect()}
    for i in (0, 5, 10, 15):
        assert out[i]["decode_ok"], out[i]["error"]
        assert (out[i]["width"], out[i]["height"]) == (10 + i % 23,
                                                       9 + i % 13)


def test_jpeg_progressive_mutation_robustness():
    """Corrupted progressive streams fail with controlled exceptions,
    never a short pixel buffer."""
    import random

    rng = random.Random(214)
    w, h = 24, 18
    base_img = np.array([[(x * 7 + y * 13) % 256 for x in range(w)]
                         for y in range(h)])
    blob0 = jpeg_encode(w, h, [base_img], [(1, 1)], progressive=True)
    for _ in range(80):
        blob = bytearray(blob0)
        pos = rng.randrange(len(blob))
        blob[pos] ^= 1 << rng.randrange(8)
        try:
            w2, h2, ch2, px = jpeg_decode(bytes(blob))
            assert len(px) == w2 * h2 * ch2
        except (ValueError, NotImplementedError, struct.error,
                KeyError, IndexError):
            pass


def test_jpeg_422_subsampling():
    """4:2:2 (h=2, v=1 luma): chroma replicates horizontally only —
    the generic sampling-ratio path, not covered by the 4:2:0 fixture."""
    rng = np.random.RandomState(22)
    w, h = 22, 11
    Y = rng.randint(0, 256, (h, w))
    cw = (w + 1) // 2
    Cb = rng.randint(0, 256, (h, cw))
    Cr = rng.randint(0, 256, (h, cw))
    qq = dict(quant_tables=[[1] * 64, [1] * 64])
    blob = jpeg_encode(w, h, [Y, Cb, Cr], [(2, 1), (1, 1), (1, 1)], **qq)
    w2, h2, ch, px = jpeg_decode(blob)
    assert (w2, h2, ch) == (w, h, 3)
    # cross-check against the progressive wire of the same data
    prog = jpeg_decode(jpeg_encode(w, h, [Y, Cb, Cr],
                                   [(2, 1), (1, 1), (1, 1)],
                                   progressive=True, **qq))
    assert (w2, h2, ch, px) == prog
    # luma within 1 step of the input (unit tables)
    got = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3).astype(int)
    # reconstruct Y from RGB is lossy; instead check a gray 4:2:2-shaped
    # stream with constant chroma 128 == pure luma
    Cb0 = np.full((h, cw), 128)
    _w, _h, _c, px2 = jpeg_decode(jpeg_encode(
        w, h, [Y, Cb0, Cb0], [(2, 1), (1, 1), (1, 1)], **qq))
    g2 = np.frombuffer(px2, dtype=np.uint8).reshape(h, w, 3).astype(int)
    assert np.abs(g2[:, :, 0] - Y).max() <= 1
