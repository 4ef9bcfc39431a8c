"""r16 ADVICE regressions: gray+alpha mean excludes the alpha channel
in media_features AND png_features; GIF truncated-GCE raises ValueError
(not IndexError); gif_decode_composited accepts exactly max_frames
frames; decode_image's unsniffable-content message names BMP/Netpbm."""
import struct

import pytest

from snowflake_emulator_spark.operators.gif import (
    gif_decode_composited,
    gif_encode,
)
from snowflake_emulator_spark.operators.multimodal import (
    decode_image,
    media_features,
    png_encode,
    png_features,
)

# 2x1 gray+alpha (PNG color type 4): gray samples (100, 110), alpha
# (125, 130). The r16 ADVICE defect averaged ALL FOUR samples
# (116.25); the contract is the gray mean, 105.0.
_GA_PX = bytes([100, 125, 110, 130])


def test_media_features_gray_alpha_ignores_alpha(spark):
    blob = png_encode(2, 1, _GA_PX, color_type=4)
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, content binary")
    row = media_features(df).collect()[0]
    assert row.decode_ok
    assert row.channels == 2
    assert row.mean_v == pytest.approx(105.0)
    # peak over the GRAY samples only — alpha 130 must not leak in
    assert row.peak_v == pytest.approx(110.0)


def test_png_features_gray_alpha_ignores_alpha(spark):
    blob = png_encode(2, 1, _GA_PX, color_type=4)
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, content binary")
    row = png_features(df).collect()[0]
    assert row.decode_ok
    # gray channel replicated into all three means, alpha excluded
    assert row.mean_r == pytest.approx(105.0)
    assert row.mean_g == pytest.approx(105.0)
    assert row.mean_b == pytest.approx(105.0)


def test_rgba_mean_still_ignores_alpha(spark):
    # 1x1 RGBA (10, 20, 30, alpha 200) -> mean (10+20+30)/3 = 20
    blob = png_encode(1, 1, bytes([10, 20, 30, 200]), color_type=6)
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, content binary")
    row = media_features(df).collect()[0]
    assert row.decode_ok and row.channels == 4
    assert row.mean_v == pytest.approx(20.0)
    assert row.peak_v == pytest.approx(30.0)


def test_gif_truncated_gce_raises_valueerror():
    """A GIF cut off inside the Graphic Control Extension must raise
    the module's documented ValueError, not escape as IndexError."""
    hdr = (b"GIF89a" + struct.pack("<HH", 1, 1)
           + bytes([0x80, 0, 0])            # GCT present, 2 entries
           + bytes(6)                        # the 2-entry GCT
           + b"\x21\xf9\x04")                # GCE opened, fields missing
    with pytest.raises(ValueError, match="truncated GCE"):
        gif_decode_composited(hdr)


def test_gif_exactly_max_frames_decodes():
    """max_frames is an inclusive cap: a GIF with exactly max_frames
    frames decodes; one more raises."""
    pal = [(0, 0, 0), (255, 255, 255)]
    frame = (b"\x01", pal)
    blob4 = gif_encode(1, 1, [frame] * 4)
    w, h, frames = gif_decode_composited(blob4, max_frames=4)
    assert (w, h, len(frames)) == (1, 1, 4)
    blob5 = gif_encode(1, 1, [frame] * 5)
    with pytest.raises(ValueError, match="exceeds 4 frames"):
        gif_decode_composited(blob5, max_frames=4)


def test_decode_image_error_lists_bmp_and_pnm():
    with pytest.raises(ValueError) as ei:
        decode_image(b"\x00\x01\x02\x03 not a container")
    msg = str(ei.value)
    assert "BM" in msg and "P1-P6" in msg
