"""r15: magic-byte dispatch (sniff_format / decode_image routing) and
the unified mixed-format media_features kernel."""
import json
import math
from pathlib import Path

import numpy as np
import pytest

from snowflake_emulator_spark.operators.multimodal import (
    decode_image,
    media_features,
    sniff_format,
)

FIXDIR = Path(__file__).parent / "fixtures" / "external_codec"
MANIFEST = json.loads((FIXDIR / "manifest.json").read_text())


def test_sniff_format_magic_bytes():
    assert sniff_format(b"\xff\xd8\xff\xe0rest") == "jpeg"
    assert sniff_format(b"GIF87a" + b"\x00" * 8) == "gif"
    assert sniff_format(b"GIF89a" + b"\x00" * 8) == "gif"
    assert sniff_format(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8) == "png"
    assert sniff_format(b"RIFF\x00\x00\x00\x00WAVE") == "wav"
    assert sniff_format(b"RIFF\x00\x00\x00\x00AVI ") is None  # RIFF != WAV
    assert sniff_format(b"plain text") is None
    assert sniff_format(b"") is None
    assert sniff_format(None) is None


@pytest.mark.parametrize("name", sorted(MANIFEST))
def test_decode_image_dispatches_every_external_file(name):
    """decode_image must route every third-party-encoded fixture to the
    right real decoder purely from magic bytes — the r14
    NotImplementedError is gone for sniffable formats."""
    b = (FIXDIR / name).read_bytes()
    m = MANIFEST[name]
    fmt = "gif" if m["format"] == "gif_anim" else m["format"]
    assert sniff_format(b) == fmt
    feat = decode_image(b)          # no format hint, no fake
    assert len(feat) == 8
    assert all(isinstance(v, float) and math.isfinite(v) for v in feat)
    code = {"jpeg": 1, "gif": 2, "png": 3, "wav": 4, "au": 4,
            "aiff": 4, "bmp": 5, "pnm": 6, "mpeg": 7, "ico": 8}[fmt]
    assert feat[0] == code / 4
    if fmt in ("wav", "au", "aiff"):
        # PCM containers: slot 1 is total samples (n_frames * channels
        # for the interleaved layouts), slot 3 channels
        assert feat[3] == m["channels"] / 4
        assert feat[1] == pytest.approx(
            math.log10(m["n_frames"] * m["channels"]), abs=0.5)
    elif fmt == "mpeg":
        assert feat[1] == pytest.approx(math.log10(m["frame_count"]))
        assert feat[2] == pytest.approx(math.log10(m["sample_rate"]))
        assert feat[3] == m["channels"] / 4
    else:
        assert feat[1] == pytest.approx(math.log10(m["width"]))
        assert feat[2] == pytest.approx(math.log10(m["height"]))


def test_decode_image_unknown_magic_raises():
    with pytest.raises(ValueError, match="unrecognized media container"):
        decode_image(b"\x00\x01\x02\x03 not a container")
    # fake path unchanged (SQL-replayable digest features)
    feat = decode_image(b"anything", fake=True)
    assert len(feat) == 8


def test_media_features_mixed_column(spark):
    """One binary column interleaving all four formats by id, decoded
    in a single kernel pass; corrupt rows are captured, not fatal."""
    from snowflake_emulator_spark.operators import audio, gif, jpeg
    from snowflake_emulator_spark.operators import multimodal

    ids = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    media = (
        multimodal.synth_png_media(ids.filter("doc_id % 4 = 0"))
        .unionByName(jpeg.synth_jpeg_media(ids.filter("doc_id % 4 = 1")))
        .unionByName(gif.synth_gif_media(ids.filter("doc_id % 4 = 2")))
        .unionByName(audio.synth_wav_media(ids.filter("doc_id % 4 = 3")))
    )
    # splice in one corrupt row
    corrupt = spark.createDataFrame(
        [(9999, bytearray(b"\xff\xd8garbage"))], "media_id long, content binary")
    out = media_features(media.unionByName(corrupt)).collect()
    rows = {r.media_id: r for r in out}
    assert len(rows) == 41
    assert not rows[9999].decode_ok and rows[9999].error
    for i in range(40):
        r = rows[i]
        assert r.decode_ok, f"id {i}: {r.error}"
        expected = {0: "png", 1: "jpeg", 2: "gif", 3: "wav"}[i % 4]
        assert r.format == expected
        if expected == "wav":
            assert r.width is None and r.n_frames == 50 + i % 37
            assert r.channels == (2 if i % 3 == 1 else 1)
        elif expected == "gif":
            assert (r.width, r.height) == (5 + i % 9, 4 + i % 7)
            assert r.n_frames == (2 if i % 3 == 2 else 1)
        elif expected == "jpeg":
            assert (r.width, r.height) == (10 + i % 23, 9 + i % 13)
            assert r.channels == (1 if i % 3 == 0 else 3)
        else:
            assert (r.width, r.height) == (4 + i % 5, 3 + i % 4)
        assert 0.0 <= r.peak_v and r.mean_v is not None


def test_media_features_external_corpus(spark):
    """The unified kernel over the REAL third-party files — recorded
    dims/channels must come back through the full Spark path."""
    rows = [(i, bytearray((FIXDIR / n).read_bytes()))
            for i, n in enumerate(sorted(MANIFEST))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r for r in media_features(df).collect()}
    for i, n in enumerate(sorted(MANIFEST)):
        m, r = MANIFEST[n], out[i]
        assert r.decode_ok, f"{n}: {r.error}"
        assert r.format == ("gif" if m["format"] == "gif_anim"
                            else m["format"])
        if m["format"] == "gif_anim":
            assert (r.width, r.height, r.n_frames) \
                == (m["width"], m["height"], m["n_frames"])
        elif m["format"] in ("wav", "au", "aiff"):
            assert (r.channels, r.n_frames) \
                == (m["channels"], m["n_frames"])
        elif m["format"] == "mpeg":
            # header walk: width=sample_rate, n_frames=audio frames
            assert (r.width, r.channels, r.n_frames) \
                == (m["sample_rate"], m["channels"], m["frame_count"])
        elif m["format"] == "ico":
            assert (r.width, r.height, r.n_frames) \
                == (m["width"], m["height"], m["n_images"])
        else:
            assert (r.width, r.height) == (m["width"], m["height"])
