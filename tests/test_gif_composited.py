"""r15: animation-aware GIF decoding — sub-rectangle frames, disposal
methods, transparency compositing (gif_decode_composited), plus the
real-world terminal-recording fixture from the external corpus."""
import hashlib
import json
import struct
from pathlib import Path

import numpy as np
import pytest

from snowflake_emulator_spark.operators.gif import (
    _lzw_compress,
    gif_decode,
    gif_decode_composited,
    gif_encode,
)
from snowflake_emulator_spark.operators.multimodal import _gif_decode_any

FIXDIR = Path(__file__).parent / "fixtures" / "external_codec"
MANIFEST = json.loads((FIXDIR / "manifest.json").read_text())


def _gce(disposal: int, tidx: int | None) -> bytes:
    gp = (disposal & 7) << 2 | (1 if tidx is not None else 0)
    return (b"\x21\xf9\x04" + bytes([gp]) + struct.pack("<H", 0)
            + bytes([tidx if tidx is not None else 0, 0]))


def _frame(left: int, top: int, fw: int, fh: int, indices: bytes,
           local_pal: list | None = None) -> bytes:
    out = bytearray(b"\x2c" + struct.pack("<HHHH", left, top, fw, fh))
    if local_pal is not None:
        size = 1
        while (1 << (size + 1)) < len(local_pal):
            size += 1
        n = 1 << (size + 1)
        full = list(local_pal) + [(0, 0, 0)] * (n - len(local_pal))
        out += bytes([0x80 | size])
        out += bytes(v for rgb in full for v in rgb)
    else:
        out += b"\x00"
    mcs = 4
    lzw = _lzw_compress(indices, mcs)
    out += bytes([mcs])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"
    return bytes(out)


def _build_gif(w: int, h: int, gct: list, bg_idx: int,
               parts: list[bytes]) -> bytes:
    size = 1
    while (1 << (size + 1)) < len(gct):
        size += 1
    n = 1 << (size + 1)
    full = list(gct) + [(0, 0, 0)] * (n - len(gct))
    out = bytearray(b"GIF89a" + struct.pack("<HH", w, h))
    out += bytes([0x80 | size, bg_idx, 0])
    out += bytes(v for rgb in full for v in rgb)
    for p in parts:
        out += p
    out += b"\x3b"
    return bytes(out)


PAL = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255),
       (255, 255, 0), (255, 0, 255), (0, 255, 255), (255, 255, 255)]


def _canvas(frames_bytes: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(frames_bytes, dtype=np.uint8).reshape(h, w, 3)


def test_subrect_blit_over_background():
    """A 2x2 red patch at (1,1) on a 4x3 canvas with background index
    7 (white): only the patch region changes."""
    idx = bytes([1, 1, 1, 1])
    blob = _build_gif(4, 3, PAL, 7, [_frame(1, 1, 2, 2, idx)])
    w, h, frames = gif_decode_composited(blob)
    assert (w, h, len(frames)) == (4, 3, 1)
    c = _canvas(frames[0], w, h)
    assert tuple(c[0, 0]) == (255, 255, 255)         # background
    assert tuple(c[1, 1]) == (255, 0, 0)             # patch
    assert tuple(c[2, 2]) == (255, 0, 0)
    assert tuple(c[2, 3]) == (255, 255, 255)
    # the raw decoder refuses sub-rects; the mixed-kernel helper
    # falls back to the composited path
    with pytest.raises(NotImplementedError):
        gif_decode(blob)
    assert _gif_decode_any(blob)[2] == frames


def test_transparency_reveals_previous_frame():
    """Frame 2's transparent pixels must show frame 1's canvas."""
    f1 = _frame(0, 0, 2, 2, bytes([2, 2, 2, 2]))          # all green
    f2 = _gce(1, 0) + _frame(0, 0, 2, 2, bytes([0, 3, 0, 3]))
    blob = _build_gif(2, 2, PAL, 0, [f1, f2])
    _w, _h, frames = gif_decode_composited(blob)
    assert len(frames) == 2
    c2 = _canvas(frames[1], 2, 2)
    assert tuple(c2[0, 0]) == (0, 255, 0)   # transparent -> green below
    assert tuple(c2[0, 1]) == (0, 0, 255)   # opaque blue
    assert tuple(c2[1, 0]) == (0, 255, 0)
    assert tuple(c2[1, 1]) == (0, 0, 255)


def test_disposal_restore_to_background():
    """Disposal 2: after the frame, its rect resets to the background
    color; the next frame's transparent pixels reveal that reset."""
    f1 = (_gce(2, None)
          + _frame(0, 0, 2, 1, bytes([2, 2])))            # green strip
    f2 = _gce(1, 0) + _frame(0, 0, 2, 1, bytes([0, 1]))   # t, red
    blob = _build_gif(2, 1, PAL, 7, [f1, f2])             # bg white
    _w, _h, frames = gif_decode_composited(blob)
    c1 = _canvas(frames[0], 2, 1)
    assert tuple(c1[0, 0]) == (0, 255, 0)
    c2 = _canvas(frames[1], 2, 1)
    assert tuple(c2[0, 0]) == (255, 255, 255)  # restored bg shows through
    assert tuple(c2[0, 1]) == (255, 0, 0)


def test_disposal_restore_to_previous():
    """Disposal 3: the canvas reverts to its pre-frame state, so frame
    3's transparent pixels reveal frame 1, not frame 2."""
    f1 = _frame(0, 0, 1, 1, bytes([2]))                    # green
    f2 = _gce(3, None) + _frame(0, 0, 1, 1, bytes([1]))    # red, revert
    f3 = _gce(1, 0) + _frame(0, 0, 1, 1, bytes([0]))       # transparent
    blob = _build_gif(1, 1, PAL, 0, [f1, f2, f3])
    _w, _h, frames = gif_decode_composited(blob)
    assert tuple(_canvas(frames[1], 1, 1)[0, 0]) == (255, 0, 0)
    assert tuple(_canvas(frames[2], 1, 1)[0, 0]) == (0, 255, 0)


def test_full_canvas_matches_raw_decoder():
    """On the fixture contract (full-canvas frames, no transparency)
    both decoders agree byte-for-byte — including interlace."""
    pal = [((7 * k) % 256, (11 * k) % 256, (13 * k) % 256)
           for k in range(16)]
    for interlace in (False, True):
        idx = bytes((3 * x + 5 * y) % 16
                    for y in range(9) for x in range(8))
        blob = gif_encode(8, 9, [(idx, pal)], interlace=interlace)
        assert gif_decode(blob) == gif_decode_composited(blob)


def test_frame_rect_outside_screen_raises():
    blob = _build_gif(2, 2, PAL, 0, [_frame(1, 1, 2, 2, bytes(4))])
    with pytest.raises(ValueError, match="outside logical screen"):
        gif_decode_composited(blob)


def test_real_terminal_recording_decodes():
    """The external-corpus asciinema-style GIF (640x421, 783 sub-rect
    frames with transparency) — recorded features must reproduce."""
    m = MANIFEST["pyenv_install_anim.gif"]
    b = (FIXDIR / "pyenv_install_anim.gif").read_bytes()
    assert hashlib.sha256(b).hexdigest() == m["file_sha256"]
    w, h, frames = gif_decode_composited(b)
    assert (w, h, len(frames)) == (m["width"], m["height"], m["n_frames"])
    assert hashlib.sha256(b"".join(frames)).hexdigest() \
        == m["frames_concat_sha256"]
    first = np.frombuffer(frames[0], dtype=np.uint8)
    last = np.frombuffer(frames[-1], dtype=np.uint8)
    assert abs(float(first.mean()) - m["first_frame_mean"]) < 0.01
    assert abs(float(last.mean()) - m["last_frame_mean"]) < 0.01
    # a terminal recording accumulates text: later frames differ
    assert frames[0] != frames[-1]
