"""Baseline TIFF 6.0 decode (r16) — pure stdlib + numpy.

TIFF is the interchange format of scanned-document corpora (multi-page
scans, faxes, archival masters), so a crawl-scale pipeline meets it
right after JPEG/PNG/GIF. This module implements the BASELINE spec
from the public TIFF 6.0 document: both byte orders (``II``
little-endian, ``MM`` big-endian), the IFD entry walk with inline
vs. offset values, multi-page IFD chains, strip-organized payloads,
PackBits (compression 32773) and uncompressed (1) data, and the four
baseline photometric interpretations — WhiteIsZero, BlackIsZero, RGB
and Palette (16-bit color map scaled to 8).

Documented capability boundaries (``NotImplementedError``): LZW /
Deflate / CCITT / JPEG-in-TIFF compression, tiled organization
(tag 322), planar configuration 2, >8-bit samples, non-uint sample
formats. Structural damage (truncated strips, bad offsets, IFD
cycles) raises ``ValueError``. Same per-row capture contract as the
sibling codec modules when run through the Spark kernels.
"""
from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_MAX_PIXELS = 64_000_000
_MAX_PAGES = 1_000

# tag ids (TIFF 6.0 §8)
_T_WIDTH, _T_LENGTH, _T_BITS, _T_COMP = 256, 257, 258, 259
_T_PHOTO, _T_STRIP_OFF, _T_SPP, _T_ROWS_PER = 262, 273, 277, 278
_T_STRIP_CNT, _T_PLANAR, _T_COLORMAP, _T_TILE_W = 279, 284, 320, 322
_T_TILE_LEN, _T_SAMPLE_FMT = 323, 339

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8}


def _read_ifd(data: bytes, off: int, en: str) -> tuple[dict, int]:
    """Parse one IFD at ``off``: returns ``(tags, next_ifd_offset)``
    where tags maps id -> list of integer values (BYTE/SHORT/LONG
    only; other types are kept raw-skipped unless needed)."""
    if off + 2 > len(data):
        raise ValueError("IFD offset outside file")
    (count,) = struct.unpack(en + "H", data[off:off + 2])
    end = off + 2 + 12 * count
    if end + 4 > len(data):
        raise ValueError("truncated IFD")
    tags: dict[int, list[int]] = {}
    for k in range(count):
        e = off + 2 + 12 * k
        tag, typ = struct.unpack(en + "HH", data[e:e + 4])
        (n,) = struct.unpack(en + "I", data[e + 4:e + 8])
        if typ not in _TYPE_SIZE:
            continue  # unknown type: skip per spec recommendation
        size = _TYPE_SIZE[typ] * n
        if size <= 4:
            raw = data[e + 8:e + 8 + size]
        else:
            (voff,) = struct.unpack(en + "I", data[e + 8:e + 12])
            if voff + size > len(data):
                raise ValueError(f"tag {tag} value outside file")
            raw = data[voff:voff + size]
        if typ == 1:
            tags[tag] = list(raw)
        elif typ == 3:
            tags[tag] = list(struct.unpack(en + f"{n}H", raw))
        elif typ == 4:
            tags[tag] = list(struct.unpack(en + f"{n}I", raw))
        # RATIONAL etc. not needed for baseline decode
    (nxt,) = struct.unpack(en + "I", data[end:end + 4])
    return tags, nxt


def _packbits_decode(data: bytes, expected: int) -> bytes:
    """Apple PackBits per TIFF 6.0 §9: n in 0..127 -> copy n+1
    literal; n in -127..-1 -> repeat next byte 1-n times; -128 noop.
    Output must land exactly on ``expected`` bytes."""
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expected:
        n = data[pos]
        pos += 1
        if n < 128:
            if pos + n + 1 > len(data):
                raise ValueError("truncated PackBits literal run")
            out += data[pos:pos + n + 1]
            pos += n + 1
        elif n > 128:
            if pos >= len(data):
                raise ValueError("truncated PackBits repeat run")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: noop
    if len(out) != expected:
        raise ValueError(
            f"PackBits expanded to {len(out)} bytes, expected {expected}")
    return bytes(out)


def _ifd_chain(data: bytes, en: str, first: int) -> list[int]:
    offs, seen = [], set()
    off = first
    while off != 0:
        if off in seen or len(offs) >= _MAX_PAGES:
            raise ValueError("IFD chain cycle or implausible page count")
        seen.add(off)
        offs.append(off)
        _tags, off = _read_ifd(data, off, en)
    return offs


def _header(content: bytes) -> tuple[bytes, str, int]:
    if content is None:
        raise ValueError("null content")
    data = bytes(content)
    if len(data) < 8:
        raise ValueError("not a TIFF (too short)")
    if data[:2] == b"II":
        en = "<"
    elif data[:2] == b"MM":
        en = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    (magic,) = struct.unpack(en + "H", data[2:4])
    if magic == 43:
        raise NotImplementedError("BigTIFF (magic 43)")
    if magic != 42:
        raise ValueError(f"not a TIFF (magic {magic})")
    (first,) = struct.unpack(en + "I", data[4:8])
    return data, en, first


def tiff_info(content: bytes) -> dict:
    """Structural metadata without pixel decode: ``{byte_order,
    n_pages, pages: [{width, height, bits_per_sample,
    samples_per_pixel, photometric, compression}]}``."""
    data, en, first = _header(content)
    pages = []
    for off in _ifd_chain(data, en, first):
        tags, _ = _read_ifd(data, off, en)
        pages.append({
            "width": tags.get(_T_WIDTH, [None])[0],
            "height": tags.get(_T_LENGTH, [None])[0],
            "bits_per_sample": tags.get(_T_BITS, [1]),
            "samples_per_pixel": tags.get(_T_SPP, [1])[0],
            "photometric": tags.get(_T_PHOTO, [None])[0],
            "compression": tags.get(_T_COMP, [1])[0],
        })
    return {"byte_order": "II" if en == "<" else "MM",
            "n_pages": len(pages), "pages": pages}


def tiff_decode(content: bytes, page: int = 0) -> tuple[int, int, int, bytes]:
    """Decode one page to ``(width, height, channels, bytes)`` —
    channels 1 for gray/bilevel, 3 for RGB and palette."""
    data, en, first = _header(content)
    chain = _ifd_chain(data, en, first)
    if not 0 <= page < len(chain):
        raise ValueError(f"TIFF page {page} out of range ({len(chain)})")
    tags, _ = _read_ifd(data, chain[page], en)
    for t, what in ((_T_TILE_W, "tiled organization"),
                    (_T_TILE_LEN, "tiled organization")):
        if t in tags:
            raise NotImplementedError(f"TIFF {what}")
    if tags.get(_T_PLANAR, [1])[0] != 1:
        raise NotImplementedError("TIFF planar configuration 2")
    fmt = tags.get(_T_SAMPLE_FMT, [1])
    if any(f != 1 for f in fmt):
        raise NotImplementedError("non-uint TIFF sample format")
    comp = tags.get(_T_COMP, [1])[0]
    if comp not in (1, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} (baseline: 1/32773)")
    try:
        w = tags[_T_WIDTH][0]
        h = tags[_T_LENGTH][0]
        offs = tags[_T_STRIP_OFF]
        cnts = tags.get(_T_STRIP_CNT)
    except KeyError as e:
        raise ValueError(f"TIFF page missing required tag {e}") from None
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise ValueError(f"bad TIFF dimensions {w}x{h}")
    spp = tags.get(_T_SPP, [1])[0]
    bits = tags.get(_T_BITS, [1] * spp)
    photo = tags.get(_T_PHOTO, [1])[0]
    if photo not in (0, 1, 2, 3):
        raise NotImplementedError(f"TIFF photometric {photo}")
    if photo == 2:
        if spp < 3 or bits[:3] != [8, 8, 8]:
            raise NotImplementedError("non-8-bit RGB TIFF")
    elif photo == 3:
        if spp != 1 or bits != [8]:
            raise NotImplementedError("palette TIFF with bits != 8")
        if _T_COLORMAP not in tags:
            raise ValueError("palette TIFF missing ColorMap")
    else:
        if spp != 1 or bits[0] not in (1, 8):
            raise NotImplementedError(
                f"grayscale TIFF with bits {bits} (baseline: 1/8)")
    rows_per = tags.get(_T_ROWS_PER, [h])[0] or h
    n_strips = (h + rows_per - 1) // rows_per
    if len(offs) != n_strips:
        raise ValueError(
            f"{len(offs)} strips for {h} rows at {rows_per}/strip")
    if cnts is None:
        if comp != 1:
            raise ValueError("compressed TIFF missing StripByteCounts")
        row_bytes = (w * sum(bits) + 7) // 8
        cnts = [row_bytes * min(rows_per, h - s * rows_per)
                for s in range(n_strips)]
    if len(cnts) != n_strips:
        raise ValueError("StripByteCounts length mismatch")
    row_bytes = (w * sum(bits) + 7) // 8
    raw = bytearray()
    for s, (o, c) in enumerate(zip(offs, cnts)):
        if o + c > len(data):
            raise ValueError(f"TIFF strip {s} outside file")
        strip_rows = min(rows_per, h - s * rows_per)
        expected = row_bytes * strip_rows
        chunk = data[o:o + c]
        if comp == 32773:
            raw += _packbits_decode(chunk, expected)
        else:
            if c != expected:
                raise ValueError(
                    f"strip {s} is {c} bytes, expected {expected}")
            raw += chunk
    if photo == 2:
        a = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(
            h, row_bytes)[:, :w * spp].reshape(h, w, spp)
        return w, h, 3, bytes(np.ascontiguousarray(a[:, :, :3]).tobytes())
    if photo == 3:
        cmap = tags[_T_COLORMAP]
        n = 1 << bits[0]
        if len(cmap) < 3 * n:
            raise ValueError("truncated TIFF ColorMap")
        # color map values are 16-bit; baseline scaling is >> 8
        lut = (np.array(cmap[:3 * n], dtype=np.uint16)
               .reshape(3, n).T >> 8).astype(np.uint8)
        idx = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(
            h, row_bytes)[:, :w]
        return w, h, 3, bytes(np.ascontiguousarray(lut[idx]).tobytes())
    if bits[0] == 1:
        rows = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(
            h, row_bytes)
        px = np.unpackbits(rows, axis=1)[:, :w]
        if photo == 0:  # WhiteIsZero: 0 = white
            out = np.where(px == 0, 255, 0).astype(np.uint8)
        else:
            out = np.where(px == 0, 0, 255).astype(np.uint8)
        return w, h, 1, bytes(out.tobytes())
    gray = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(
        h, row_bytes)[:, :w]
    if photo == 0:
        gray = (255 - gray).astype(np.uint8)
    return w, h, 1, bytes(np.ascontiguousarray(gray).tobytes())


# ---------------------------------------------------------------------
# fixture encoder + deterministic synth (closed-form oracle strategy)
# ---------------------------------------------------------------------

def packbits_encode(row: bytes) -> bytes:
    """Spec-shaped PackBits: repeat runs >= 3 become repeats, the rest
    literal runs (max 128 either way)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and run < 128 and row[i + run] == row[i]:
                run += 1
            if run >= 3:
                break
            i += run
        chunk = row[lit_start:min(i, lit_start + 128)]
        i = lit_start + len(chunk)
        out += bytes([len(chunk) - 1]) + chunk
    return bytes(out)


def tiff_encode(pages: list[dict], byte_order: str = "II") -> bytes:
    """Assemble a multi-page TIFF. Each page dict:
    ``{width, height, photometric, bits (list), spp, data (raw pixel
    bytes, row-major, unpadded rows packed to row_bytes),
    rows_per_strip, packbits (bool), colormap (3*2^bits 16-bit ints,
    palette only)}``."""
    en = "<" if byte_order == "II" else ">"
    out = bytearray(struct.pack(en + "2sHI", byte_order.encode(), 42, 0))
    ifd_ptr_pos = 4
    for p in pages:
        w, h = p["width"], p["height"]
        bits = p["bits"]
        spp = p["spp"]
        row_bytes = (w * sum(bits) + 7) // 8
        rows_per = p.get("rows_per_strip", h)
        n_strips = (h + rows_per - 1) // rows_per
        strips = []
        for s in range(n_strips):
            rs = min(rows_per, h - s * rows_per)
            chunk = p["data"][s * rows_per * row_bytes:
                              (s * rows_per + rs) * row_bytes]
            strips.append(packbits_encode(chunk)
                          if p.get("packbits") else chunk)
        strip_offs = []
        for sdata in strips:
            strip_offs.append(len(out))
            out += sdata
        if len(out) % 2:
            out += b"\x00"

        def _arr(vals, typ):
            nonlocal out
            size = _TYPE_SIZE[typ] * len(vals)
            code = {3: "H", 4: "I"}[typ]
            raw = struct.pack(en + f"{len(vals)}{code}", *vals)
            if size <= 4:
                return raw + bytes(4 - size)
            voff = len(out)
            out += raw
            if len(out) % 2:
                out += b"\x00"
            return struct.pack(en + "I", voff)

        entries = []

        def _tag(tag, typ, vals):
            entries.append(struct.pack(en + "HHI", tag, typ, len(vals))
                           + _arr(vals, typ))

        _tag(_T_WIDTH, 4, [w])
        _tag(_T_LENGTH, 4, [h])
        _tag(_T_BITS, 3, bits)
        _tag(_T_COMP, 3, [32773 if p.get("packbits") else 1])
        _tag(_T_PHOTO, 3, [p["photometric"]])
        _tag(_T_STRIP_OFF, 4, strip_offs)
        _tag(_T_SPP, 3, [spp])
        _tag(_T_ROWS_PER, 4, [rows_per])
        _tag(_T_STRIP_CNT, 4, [len(s) for s in strips])
        if p.get("colormap") is not None:
            _tag(_T_COLORMAP, 3, list(p["colormap"]))
        entries.sort(key=lambda e: struct.unpack(en + "H", e[:2])[0])
        ifd_off = len(out)
        struct.pack_into(en + "I", out, ifd_ptr_pos, ifd_off)
        out += struct.pack(en + "H", len(entries)) + b"".join(entries)
        ifd_ptr_pos = len(out)
        out += struct.pack(en + "I", 0)  # next-IFD, patched by next page
    return bytes(out)


SYNTH_TIFF_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("content", T.BinaryType(), True),
])


def _synth_page0(i: int, w: int, h: int) -> dict:
    """Closed-form page-0 pixels by variant ``i % 4``: 0 = gray8
    BlackIsZero, 1 = RGB PackBits, 2 = palette, 3 = bilevel
    WhiteIsZero. The SQL oracle restates the LUMINANCE of each."""
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    v = i % 4
    if v == 0:
        g = ((3 * i + 7 * x + 11 * y) % 256).astype(np.uint8)
        return {"width": w, "height": h, "photometric": 1, "bits": [8],
                "spp": 1, "data": bytes(g.tobytes()), "rows_per_strip": 2}
    if v == 1:
        rgb = np.empty((h, w, 3), dtype=np.uint8)
        rgb[:, :, 0] = (7 * i + 5 * x + 3 * y) % 256
        rgb[:, :, 1] = (11 * i + 2 * x + 9 * y) % 256
        rgb[:, :, 2] = (13 * i + 4 * x + y) % 256
        return {"width": w, "height": h, "photometric": 2,
                "bits": [8, 8, 8], "spp": 3,
                "data": bytes(rgb.tobytes()), "rows_per_strip": 3,
                "packbits": True}
    if v == 2:
        idx = ((i + 2 * x + 3 * y) % 16).astype(np.uint8)
        cmap = []
        for c in range(3):
            cmap += [(((5 + 4 * c) * i + (17 + 2 * c) * k) % 256) * 257
                     for k in range(256)]
        return {"width": w, "height": h, "photometric": 3, "bits": [8],
                "spp": 1, "data": bytes(idx.tobytes()),
                "colormap": cmap}
    bitmap = ((i + x + y) % 2).astype(np.uint8)
    packed = np.packbits(bitmap, axis=1)
    return {"width": w, "height": h, "photometric": 0, "bits": [1],
            "spp": 1, "data": bytes(packed.tobytes()),
            "rows_per_strip": 2}


def synth_tiff_media(ids_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic TIFF fixture: id ``i`` becomes a ``(6 + i % 5) x
    (4 + i % 4)`` page-0 whose variant ``i % 4`` rotates gray8 /
    RGB-PackBits / palette / bilevel, in byte order ``II`` for even
    ids and ``MM`` for odd; ``i % 2 == 1`` appends a second tiny gray
    page (multi-page chain, counted but not decoded by the features).
    Everything is closed-form in ``i`` for the SQL oracle."""

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                i = int(did)
                w, h = 6 + i % 5, 4 + i % 4
                pages = [_synth_page0(i, w, h)]
                if i % 2 == 1:
                    g = bytes(((5 * i + 3 * t) % 256) for t in range(6))
                    pages.append({"width": 3, "height": 2,
                                  "photometric": 1, "bits": [8],
                                  "spp": 1, "data": g})
                blob = tiff_encode(pages,
                                   byte_order="II" if i % 2 == 0 else "MM")
                rows.append((i, bytearray(blob)))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    return ids_df.select(id_col).mapInPandas(_enc, SYNTH_TIFF_SCHEMA)
