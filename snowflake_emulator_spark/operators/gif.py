"""GIF87a/89a decode (r14) — pure stdlib, no PIL. Completes the
real-decode image matrix (PNG r11/r13, baseline JPEG r14): GIF is the
remaining ubiquitous web-corpus image container.

Decoder surface: header + logical screen descriptor, global/local
color tables, variable-width LSB-first LZW with CLEAR/EOI codes,
dictionary growth to 4096 with deferred-clear handling, 4-pass
interlace reordering, multi-frame streams (``gif_decode`` renders
each frame independently against its own palette; r15's
``gif_decode_composited`` additionally applies sub-rectangle
placement, disposal methods 1/2/3 and GCE transparency — the
animation-viewer semantics), graphic-control / comment / application
extensions parsed or skipped per spec. Corrupt streams raise
ValueError.

Encoder (test fixture): a real LZW compressor (code emission mirrors
the decoder's dictionary growth), sub-block framing, optional
interlace and a second frame with a local color table — so the
closed-form oracle strategy of the PNG/JPEG/WAV fixtures applies:
decoded pixels are palette lookups of an index formula in
(id, x, y), replayable in SQL with no GIF bytes involved.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

GIF_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("mean_r", T.DoubleType(), True),
    T.StructField("mean_g", T.DoubleType(), True),
    T.StructField("mean_b", T.DoubleType(), True),
    T.StructField("min_px", T.IntegerType(), True),
    T.StructField("max_px", T.IntegerType(), True),
    T.StructField("decode_ok", T.BooleanType(), False),
    T.StructField("error", T.StringType(), True),
])

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_rows(height: int) -> list[int]:
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, height, step))
    return rows


# ---------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, CLEAR/EOI codes)
# ---------------------------------------------------------------------


def _lzw_compress(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    prefix = b""
    for b in indices:
        trial = prefix + bytes([b])
        if trial in table:
            prefix = trial
            continue
        emit(table[prefix], width)
        if next_code < 4096:
            table[trial] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([b])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code_size: int,
                    expected: int) -> bytes:
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0  # bit position
    total_bits = len(data) * 8

    def read_code(w: int) -> int:
        nonlocal pos
        if pos + w > total_bits:
            raise ValueError("truncated LZW stream")
        byte0 = pos >> 3
        chunk = int.from_bytes(
            data[byte0:byte0 + (pos % 8 + w + 7) // 8 + 1], "little")
        code = (chunk >> (pos & 7)) & ((1 << w) - 1)
        pos += w
        return code

    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset()
    while len(out) < expected:
        code = read_code(width)
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if code < len(table) and (code < clear or table[code] or code >= eoi + 1):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"invalid LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < expected:
        raise ValueError(
            f"LZW stream ended early: {len(out)} of {expected} pixels")
    return bytes(out[:expected])


# ---------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------


def gif_encode(width: int, height: int,
               frames: list[tuple[bytes, list[tuple[int, int, int]]]],
               interlace: bool = False,
               transparent_idx: int | None = None) -> bytes:
    """Fixture writer: ``frames`` is a list of (indices, palette);
    the first frame's palette becomes the GLOBAL color table, later
    frames carry LOCAL tables. Palettes are padded to a power of two
    (>= 2 entries)."""

    def _pal_bytes(pal: list[tuple[int, int, int]]) -> tuple[bytes, int]:
        size = 1
        while (1 << (size + 1)) < len(pal):
            size += 1
        if size > 7:
            # 'gsize & 7' in the logical-screen byte would silently
            # truncate and emit a corrupt GIF — refuse instead
            raise ValueError(
                f"GIF palette has {len(pal)} entries; max is 256")
        n = 1 << (size + 1)
        full = list(pal) + [(0, 0, 0)] * (n - len(pal))
        return bytes(v for rgb in full for v in rgb), size

    gpal, gsize = _pal_bytes(frames[0][1])
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | (gsize & 7), 0, 0])  # GCT flag + size
    out += gpal
    for fi, (indices, pal) in enumerate(frames):
        if transparent_idx is not None:
            out += (b"\x21\xf9\x04" + bytes([0x01])
                    + struct.pack("<H", 0) + bytes([transparent_idx, 0]))
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
        if fi == 0:
            out += bytes([0x40 if interlace else 0x00])
        else:
            lpal, lsize = _pal_bytes(pal)
            out += bytes([0x80 | (0x40 if interlace else 0) | (lsize & 7)])
            out += lpal
        if interlace:
            order = _interlace_rows(height)
            rows = [indices[y * width:(y + 1) * width] for y in order]
            payload = b"".join(rows)
        else:
            payload = indices
        mcs = max(2, (gsize if fi == 0 else lsize) + 1)
        lzw = _lzw_compress(payload, mcs)
        out += bytes([mcs])
        for off in range(0, len(lzw), 255):
            blk = lzw[off:off + 255]
            out += bytes([len(blk)]) + blk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def gif_decode(content: bytes) -> tuple[int, int, list[bytes]]:
    """Decode a GIF; returns (width, height, frames) with each frame
    w*h*3 RGB bytes (its own palette applied; frames are decoded
    independently — no cross-frame disposal compositing)."""
    if content is None:
        raise ValueError("null content")
    data = bytes(content)
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    width, height = struct.unpack("<HH", data[6:10])
    if width == 0 or height == 0:
        raise ValueError("zero-dimension GIF")
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = data[pos:pos + 3 * n]
        if len(gct) < 3 * n:
            raise ValueError("truncated global color table")
        pos += 3 * n
    frames: list[bytes] = []
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= len(data):
                raise ValueError("truncated extension")
            pos += 1
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            if pos + 9 > len(data):
                raise ValueError("truncated image descriptor")
            left, top, fw, fh = struct.unpack("<HHHH", data[pos:pos + 8])
            fpacked = data[pos + 8]
            pos += 9
            pal = gct
            if fpacked & 0x80:
                n = 2 << (fpacked & 7)
                pal = data[pos:pos + 3 * n]
                if len(pal) < 3 * n:
                    raise ValueError("truncated local color table")
                pos += 3 * n
            if pal is None:
                raise ValueError("frame without any color table")
            if left or top or fw != width or fh != height:
                raise NotImplementedError(
                    "sub-rectangle frames (disposal compositing) "
                    "are not supported; full-canvas frames only")
            if pos >= len(data):
                raise ValueError("truncated LZW header")
            mcs = data[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(data) and data[pos] != 0:
                ln = data[pos]
                lzw += data[pos + 1:pos + 1 + ln]
                if pos + 1 + ln > len(data):
                    raise ValueError("truncated LZW sub-block")
                pos += 1 + ln
            if pos >= len(data):
                raise ValueError("missing sub-block terminator")
            pos += 1
            idx = _lzw_decompress(bytes(lzw), mcs, fw * fh)
            if fpacked & 0x40:  # interlaced: undo 4-pass row order
                order = _interlace_rows(fh)
                rows = [b""] * fh
                for k, y in enumerate(order):
                    rows[y] = idx[k * fw:(k + 1) * fw]
                idx = b"".join(rows)
            npal = len(pal) // 3
            rgb = bytearray(fw * fh * 3)
            for p, ci in enumerate(idx):
                if ci >= npal:
                    raise ValueError(f"palette index {ci} out of range")
                rgb[3 * p:3 * p + 3] = pal[3 * ci:3 * ci + 3]
            frames.append(bytes(rgb))
        else:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
    if not frames:
        raise ValueError("GIF contains no image data")
    return width, height, frames


def gif_decode_composited(content: bytes,
                          max_frames: int = 4096) -> tuple[int, int, list[bytes]]:
    """Animation-aware GIF decode (r15): renders every frame onto a
    persistent canvas honoring SUB-RECTANGLE placement, per-frame
    disposal methods (1 keep, 2 restore-to-background, 3
    restore-to-previous) and GCE transparency — the semantics a viewer
    applies, which real-world animated GIFs (terminal recordings,
    stickers) require. Returns (width, height, frames) with each frame
    the FULL COMPOSITED canvas as w*h*3 RGB bytes.

    ``gif_decode`` stays the raw-frame decoder (full-canvas frames
    only, transparency reported as stored) because the closed-form
    fixtures/oracles pin that contract; this is the ingest path for
    arbitrary crawl media. GIF89a spec sections 23 (GCE) and 26
    (image descriptor)."""
    import numpy as np

    if content is None:
        raise ValueError("null content")
    data = bytes(content)
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    width, height = struct.unpack("<HH", data[6:10])
    if width == 0 or height == 0:
        raise ValueError("zero-dimension GIF")
    packed, bg_idx = data[10], data[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = data[pos:pos + 3 * n]
        if len(gct) < 3 * n:
            raise ValueError("truncated global color table")
        pos += 3 * n
    if gct is not None and bg_idx < len(gct) // 3:
        bg_rgb = tuple(gct[3 * bg_idx:3 * bg_idx + 3])
    else:
        bg_rgb = (0, 0, 0)
    canvas = np.empty((height, width, 3), dtype=np.uint8)
    canvas[:] = bg_rgb
    frames: list[bytes] = []
    disposal, tidx = 0, None
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("truncated extension")
            label = data[pos]
            pos += 1
            if label == 0xF9 and pos < len(data) and data[pos] >= 4:
                if pos + 5 > len(data):
                    raise ValueError("truncated GCE")
                gp = data[pos + 1]
                disposal = (gp >> 2) & 0x07
                tidx = data[pos + 4] if gp & 0x01 else None
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:
            if pos + 9 > len(data):
                raise ValueError("truncated image descriptor")
            left, top, fw, fh = struct.unpack("<HHHH", data[pos:pos + 8])
            fpacked = data[pos + 8]
            pos += 9
            if left + fw > width or top + fh > height or fw == 0 or fh == 0:
                raise ValueError("frame rectangle outside logical screen")
            pal = gct
            if fpacked & 0x80:
                n = 2 << (fpacked & 7)
                pal = data[pos:pos + 3 * n]
                if len(pal) < 3 * n:
                    raise ValueError("truncated local color table")
                pos += 3 * n
            if pal is None:
                raise ValueError("frame without any color table")
            if pos >= len(data):
                raise ValueError("truncated LZW header")
            mcs = data[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(data) and data[pos] != 0:
                ln = data[pos]
                if pos + 1 + ln > len(data):
                    raise ValueError("truncated LZW sub-block")
                lzw += data[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            if pos >= len(data):
                raise ValueError("missing sub-block terminator")
            pos += 1
            idx = _lzw_decompress(bytes(lzw), mcs, fw * fh)
            if fpacked & 0x40:
                order = _interlace_rows(fh)
                rows = [b""] * fh
                for k, y in enumerate(order):
                    rows[y] = idx[k * fw:(k + 1) * fw]
                idx = b"".join(rows)
            ia = np.frombuffer(idx, dtype=np.uint8).reshape(fh, fw)
            npal = len(pal) // 3
            if int(ia.max()) >= npal:
                raise ValueError(
                    f"palette index {int(ia.max())} out of range")
            lut = np.frombuffer(pal, dtype=np.uint8).reshape(npal, 3)
            rect_rgb = lut[ia]                      # (fh, fw, 3)
            prev = canvas.copy() if disposal == 3 else None
            region = canvas[top:top + fh, left:left + fw]
            if tidx is not None:
                opaque = ia != tidx
                region[opaque] = rect_rgb[opaque]
            else:
                region[:] = rect_rgb
            if len(frames) >= max_frames:
                raise ValueError(
                    f"GIF exceeds {max_frames} frames — refusing "
                    "unbounded canvas materialization")
            frames.append(canvas.tobytes())
            if disposal == 2:
                canvas[top:top + fh, left:left + fw] = bg_rgb
            elif disposal == 3:
                canvas = prev
            disposal, tidx = 0, None
        else:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
    if not frames:
        raise ValueError("GIF contains no image data")
    return width, height, frames


# ---------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------


def gif_features(media: DataFrame, id_col: str = "media_id",
                 content_col: str = "content") -> DataFrame:
    """Real-decode GIF features over ALL frames: dims, frame count,
    per-channel means and global min/max sample — same Arrow-batched
    kernel shape and per-row error capture as the PNG/JPEG paths."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    w, h, frames = gif_decode(
                        bytes(content) if content is not None else None)
                    import numpy as np

                    arr = np.frombuffer(b"".join(frames),
                                        dtype=np.uint8).reshape(-1, 3)
                    sums = arr.sum(axis=0, dtype=np.int64)
                    n = arr.shape[0]
                    rows.append((int(mid), w, h, len(frames),
                                 float(sums[0] / n), float(sums[1] / n),
                                 float(sums[2] / n),
                                 int(arr.min()), int(arr.max()),
                                 True, None))
                except Exception as e:  # noqa: BLE001 — per-row capture
                    rows.append((int(mid), None, None, None, None, None,
                                 None, None, None, False, str(e)[:200]))
            yield pd.DataFrame(
                rows, columns=[f.name for f in GIF_FEATURE_SCHEMA.fields])

    return media.select(id_col, content_col).mapInPandas(
        _extract, GIF_FEATURE_SCHEMA)


SYNTH_GIF_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("content", T.BinaryType(), True),
])


def synth_gif_media(ids_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic GIF fixture on a ``(5 + i%9) x (4 + i%7)``
    canvas, 16-color palettes, decoded pixels closed-form in (i, x, y):

    * frame 1 (all variants): ``idx = (i + 3x + 5y) % 16``,
      ``pal[k] = ((7i+11k)%256, (11i+5k)%256, (13i+3k)%256)`` — the
      GLOBAL color table.
    * ``i%3 == 1`` — frame 1 is INTERLACED (wire layout only; decoded
      pixels identical).
    * ``i%3 == 2`` — a second full-canvas frame with a LOCAL color
      table: ``idx2 = (2i + 5x + 3y) % 16``, ``pal2[k] = ((5i+7k)%256,
      (3i+13k)%256, (17i+k)%256)``; plus a graphic-control extension
      (transparent index 0) the decoder must parse and the features
      deliberately ignore (palette colors reported as stored).

    The oracle replays palette-lookup arithmetic over all frames."""

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                i = int(did)
                w, h = 5 + i % 9, 4 + i % 7
                pal1 = [((7 * i + 11 * k) % 256, (11 * i + 5 * k) % 256,
                         (13 * i + 3 * k) % 256) for k in range(16)]
                idx1 = bytes((i + 3 * x + 5 * y) % 16
                             for y in range(h) for x in range(w))
                frames = [(idx1, pal1)]
                trans = None
                if i % 3 == 2:
                    pal2 = [((5 * i + 7 * k) % 256, (3 * i + 13 * k) % 256,
                             (17 * i + k) % 256) for k in range(16)]
                    idx2 = bytes((2 * i + 5 * x + 3 * y) % 16
                                 for y in range(h) for x in range(w))
                    frames.append((idx2, pal2))
                    trans = 0
                blob = gif_encode(w, h, frames,
                                  interlace=(i % 3 == 1),
                                  transparent_idx=trans)
                rows.append((i, bytearray(blob)))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    return ids_df.select(id_col).mapInPandas(_enc, SYNTH_GIF_SCHEMA)
