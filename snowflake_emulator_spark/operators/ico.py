"""Windows ICO/CUR icon container decode (r16) — pure stdlib + numpy.

``favicon.ico`` is one of the most-fetched URLs on the web, so a
crawl-scale media pipeline sees ICO constantly. The container is a
tiny directory (ICONDIR + 16-byte ICONDIRENTRY per image) over two
payload kinds:

* a **DIB**: a BITMAPINFOHEADER with NO file header whose ``biHeight``
  is DOUBLED — the bottom-up XOR (color) bitmap is followed by a
  1-bpp bottom-up AND (transparency) mask, both rows padded to 4
  bytes. 32/24-bpp truecolor and 8/4/1-bpp palette images, BI_RGB
  only (compressed payloads are what the PNG kind is for);
* a **PNG**: a complete PNG stream (Vista+ 256x256 icons), routed to
  the existing pure-Python PNG decoder.

Decode policy matches the sibling codec modules (multimodal/gif/jpeg/
audio/mpeg): structural damage raises ``ValueError``, documented
capability boundaries raise ``NotImplementedError``, and the Spark
kernels capture either per row instead of failing the task. The
reference engine has no media surface at all (`/root/reference` is a
SQL/warehouse emulator); this module is part of the beyond-reference
training-data-pipeline layer.

Alpha handling: 32-bpp DIBs carry a real alpha channel, but legacy
encoders write all-zero alpha and rely on the AND mask — when every
alpha byte is 0 the mask supplies opacity, the behavior every modern
viewer implements. Lower depths always take alpha from the AND mask.
"""
from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_MAX_IMAGES = 64          # a spec directory is u16, but >64 is damage
_MAX_PIXELS = 64_000_000  # same decode bound as bmp/pnm


def ico_parse_dir(content: bytes) -> tuple[int, list[dict]]:
    """Struct-level ICONDIR walk: returns ``(resource_type, entries)``
    where resource_type is 1 (ICO) or 2 (CUR) and each entry is
    ``{width, height, bpp, planes, n_bytes, offset, is_png}`` with the
    0-means-256 convention already expanded. Raises ValueError on a
    bad signature, an impossible count, or an entry whose payload lies
    outside the file."""
    if content is None:
        raise ValueError("null content")
    data = bytes(content)
    if len(data) < 6:
        raise ValueError("not an ICO (shorter than ICONDIR)")
    reserved, rtype, count = struct.unpack("<HHH", data[:6])
    if reserved != 0 or rtype not in (1, 2):
        raise ValueError("not an ICO (bad ICONDIR signature)")
    if count == 0 or count > _MAX_IMAGES:
        raise ValueError(f"implausible ICO image count {count}")
    if len(data) < 6 + 16 * count:
        raise ValueError("truncated ICO directory")
    entries = []
    for k in range(count):
        w, h, _cc, _res, planes, bpp, nb, off = struct.unpack(
            "<BBBBHHII", data[6 + 16 * k:6 + 16 * k + 16])
        if off + nb > len(data) or nb < 8:
            raise ValueError(f"ICO entry {k} payload outside file")
        entries.append({
            "width": w or 256, "height": h or 256, "bpp": bpp,
            "planes": planes, "n_bytes": nb, "offset": off,
            "is_png": data[off:off + 8] == b"\x89PNG\r\n\x1a\n",
        })
    return rtype, entries


def _dib_decode_icon(data: bytes, entry: dict) -> tuple[int, int, bytes]:
    """Decode one DIB payload to ``(w, h, RGBA bytes)``. ICO DIBs use
    a 40-byte BITMAPINFOHEADER whose biHeight covers XOR + AND masks
    (doubled); BI_RGB only per the format (PNG entries carry the
    compressed case)."""
    off, nb = entry["offset"], entry["n_bytes"]
    if nb < 40:
        raise ValueError("ICO DIB shorter than BITMAPINFOHEADER")
    blob = data[off:off + nb]
    hsize = struct.unpack("<I", blob[0:4])[0]
    if hsize != 40:
        raise NotImplementedError(
            f"ICO DIB header size {hsize} (only BITMAPINFOHEADER)")
    w, h2 = struct.unpack("<ii", blob[4:12])
    planes, bpp = struct.unpack("<HH", blob[12:16])
    comp = struct.unpack("<I", blob[16:20])[0]
    if comp != 0:
        raise NotImplementedError(f"ICO DIB compression {comp}")
    if w <= 0 or h2 <= 0 or h2 % 2 or planes not in (0, 1):
        raise ValueError("bad ICO DIB dimensions")
    h = h2 // 2
    if w != entry["width"] or h != entry["height"]:
        raise ValueError(
            f"ICO DIB {w}x{h} contradicts its directory entry "
            f"{entry['width']}x{entry['height']}")
    if w * h > _MAX_PIXELS:
        raise ValueError("ICO dimensions exceed the 64MP decode bound")
    if bpp not in (1, 4, 8, 24, 32):
        raise NotImplementedError(f"{bpp}-bpp ICO DIB")
    pos = 40
    if bpp <= 8:
        n_pal = struct.unpack("<I", blob[32:36])[0] or (1 << bpp)
        pal = np.frombuffer(blob[pos:pos + 4 * n_pal], dtype=np.uint8)
        if pal.shape[0] < 4 * n_pal:
            raise ValueError("truncated ICO palette")
        lut = pal.reshape(n_pal, 4)[:, [2, 1, 0]]  # BGRX -> RGB
        pos += 4 * n_pal
    xor_stride = ((w * bpp + 31) // 32) * 4
    need = xor_stride * h
    xor = blob[pos:pos + need]
    if len(xor) < need:
        raise ValueError("truncated ICO XOR bitmap")
    pos += need
    rows = np.frombuffer(xor, dtype=np.uint8).reshape(h, xor_stride)[::-1]
    if bpp == 32:
        px = rows[:, :w * 4].reshape(h, w, 4)
        rgba = px[:, :, [2, 1, 0, 3]].copy()  # BGRA -> RGBA
    elif bpp == 24:
        rgba = np.empty((h, w, 4), dtype=np.uint8)
        rgba[:, :, :3] = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]
        rgba[:, :, 3] = 255
    else:
        if bpp == 8:
            idx = rows[:, :w]
        else:
            per = 8 // bpp
            nbytes = (w + per - 1) // per
            packed = rows[:, :nbytes]
            sub = [(packed >> (8 - bpp * (k + 1))) & ((1 << bpp) - 1)
                   for k in range(per)]
            idx = np.stack(sub, axis=-1).reshape(h, nbytes * per)[:, :w]
        if int(idx.max()) >= lut.shape[0]:
            raise ValueError("ICO palette index out of range")
        rgba = np.empty((h, w, 4), dtype=np.uint8)
        rgba[:, :, :3] = lut[idx]
        rgba[:, :, 3] = 255
    # AND mask: 1-bpp bottom-up rows, 4-byte padded; bit 1 = transparent.
    # Real 32-bpp encoders routinely OMIT the mask entirely (observed in
    # Google App Engine's shipped favicon: biHeight doubled, payload
    # ends after the XOR bitmap) — tolerated when the alpha channel can
    # govern; a PARTIAL mask is still structural damage.
    and_stride = ((w + 31) // 32) * 4
    mask_raw = blob[pos:pos + and_stride * h]
    if len(mask_raw) == 0 and bpp == 32:
        if int(rgba[:, :, 3].max()) == 0:
            rgba[:, :, 3] = 255  # no mask, no alpha: fully opaque
        return w, h, bytes(np.ascontiguousarray(rgba).tobytes())
    if len(mask_raw) < and_stride * h:
        raise ValueError("truncated ICO AND mask")
    mrows = np.frombuffer(mask_raw, dtype=np.uint8).reshape(
        h, and_stride)[::-1]
    bits = np.unpackbits(mrows, axis=1)[:, :w]
    if bpp == 32:
        if int(rgba[:, :, 3].max()) == 0:
            # legacy all-zero alpha: the AND mask is the only opacity
            rgba[:, :, 3] = np.where(bits == 1, 0, 255)
        # else: the real alpha channel wins; spec-compliant encoders
        # keep the AND mask consistent with it
    else:
        rgba[:, :, 3] = np.where(bits == 1, 0, rgba[:, :, 3])
    return w, h, bytes(np.ascontiguousarray(rgba).tobytes())


def ico_decode_entry(content: bytes, index: int) -> tuple[int, int, int, bytes]:
    """Decode directory entry ``index`` to ``(w, h, 4, RGBA bytes)``;
    PNG payloads route through the module's own PNG decoder (alpha
    synthesized opaque for alphaless color types)."""
    data = bytes(content)
    _rtype, entries = ico_parse_dir(data)
    if not 0 <= index < len(entries):
        raise ValueError(f"ICO entry index {index} out of range")
    e = entries[index]
    if e["is_png"]:
        from .multimodal import png_decode

        w, h, ch, px = png_decode(data[e["offset"]:e["offset"] + e["n_bytes"]])
        a = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch)
        rgba = np.empty((h, w, 4), dtype=np.uint8)
        if ch == 1:
            rgba[:, :, :3] = a
            rgba[:, :, 3] = 255
        elif ch == 2:
            rgba[:, :, :3] = a[:, :, :1]
            rgba[:, :, 3] = a[:, :, 1]
        elif ch == 3:
            rgba[:, :, :3] = a
            rgba[:, :, 3] = 255
        else:
            rgba = a.copy()
        return w, h, 4, bytes(np.ascontiguousarray(rgba).tobytes())
    w, h, rgba = _dib_decode_icon(data, e)
    return w, h, 4, rgba


def best_entry_index(entries: list[dict]) -> int:
    """The image a viewer would pick: largest area, then highest bit
    depth, then first in directory order."""
    return max(range(len(entries)),
               key=lambda k: (entries[k]["width"] * entries[k]["height"],
                              entries[k]["bpp"], -k))


def ico_decode(content: bytes) -> tuple[int, int, int, bytes]:
    """Decode the BEST image (see ``best_entry_index``) of an ICO/CUR
    to ``(w, h, 4, RGBA bytes)``."""
    _rtype, entries = ico_parse_dir(content)
    return ico_decode_entry(content, best_entry_index(entries))


def ico_info(content: bytes) -> dict:
    """Directory-level metadata without decoding pixels:
    ``{resource_type, n_images, best_index, entries}``."""
    rtype, entries = ico_parse_dir(content)
    return {
        "resource_type": rtype,
        "n_images": len(entries),
        "best_index": best_entry_index(entries),
        "entries": entries,
    }


# ---------------------------------------------------------------------
# fixture encoders + deterministic synth (closed-form oracle strategy,
# same as synth_png_media / synth_mpeg_media)
# ---------------------------------------------------------------------

def _dib_encode_icon(w: int, h: int, bpp: int, rgba: bytes,
                     palette: list[tuple[int, int, int]] | None = None,
                     indices: bytes | None = None) -> bytes:
    """Encode one ICO DIB payload (BITMAPINFOHEADER, doubled height,
    XOR + AND masks). For bpp<=8 pass ``palette`` and per-pixel
    ``indices``; for 24/32 pass ``rgba`` (h*w*4, top-down). The AND
    mask is derived from alpha==0."""
    a = np.frombuffer(rgba, dtype=np.uint8).reshape(h, w, 4)
    out = bytearray(struct.pack(
        "<IiiHHIIiiII", 40, w, 2 * h, 1, bpp, 0, 0, 0, 0,
        (1 << bpp) if bpp <= 8 else 0, 0))
    xor_stride = ((w * bpp + 31) // 32) * 4
    if bpp <= 8:
        for r, g, b in palette:
            out += bytes((b, g, r, 0))
        idx = np.frombuffer(indices, dtype=np.uint8).reshape(h, w)
        if bpp == 8:
            packed = idx
        else:
            per = 8 // bpp
            pad_w = (w + per - 1) // per * per
            padded = np.zeros((h, pad_w), dtype=np.uint8)
            padded[:, :w] = idx
            packed = np.zeros((h, pad_w // per), dtype=np.uint8)
            for k in range(per):
                packed |= padded[:, k::per] << (8 - bpp * (k + 1))
        for y in range(h - 1, -1, -1):  # bottom-up
            row = packed[y].tobytes()
            out += row + bytes(xor_stride - len(row))
    elif bpp == 24:
        for y in range(h - 1, -1, -1):
            row = a[y, :, [2, 1, 0]].T.astype(np.uint8).tobytes()
            out += row + bytes(xor_stride - len(row))
    else:
        for y in range(h - 1, -1, -1):
            row = a[y, :, [2, 1, 0, 3]].T.astype(np.uint8).tobytes()
            out += row + bytes(xor_stride - len(row))
    and_stride = ((w + 31) // 32) * 4
    transparent = (a[:, :, 3] == 0).astype(np.uint8)
    for y in range(h - 1, -1, -1):
        bits = np.packbits(np.pad(transparent[y], (0, and_stride * 8 - w)))
        out += bits.tobytes()
    return bytes(out)


def ico_encode(images: list[bytes], resource_type: int = 1) -> bytes:
    """Assemble payload blobs (DIB or PNG byte strings) into one
    ICO/CUR container. Directory width/height/bpp fields are read back
    out of each payload."""
    out = bytearray(struct.pack("<HHH", 0, resource_type, len(images)))
    offset = 6 + 16 * len(images)
    for blob in images:
        if blob[:8] == b"\x89PNG\r\n\x1a\n":
            w, h = struct.unpack(">II", blob[16:24])
            bpp = 32
        else:
            w, h2 = struct.unpack("<ii", blob[4:12])
            h = h2 // 2
            bpp = struct.unpack("<H", blob[14:16])[0]
        out += struct.pack("<BBBBHHII", w % 256, h % 256, 0, 0, 1, bpp,
                           len(blob), offset)
        offset += len(blob)
    for blob in images:
        out += blob
    return bytes(out)


SYNTH_ICO_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("content", T.BinaryType(), True),
])


def _synth_rgba(i: int, w: int, h: int, variant: int) -> bytes:
    """Closed-form RGBA pixels for fixture image variants 0 (32-bpp
    DIB) and 2 (PNG): the SQL oracle restates these formulas."""
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    out = np.empty((h, w, 4), dtype=np.uint8)
    if variant == 0:
        out[:, :, 0] = (7 * i + 11 * x + 13 * y) % 256
        out[:, :, 1] = (5 * i + 3 * x + 7 * y) % 256
        out[:, :, 2] = (11 * i + 5 * x + y) % 256
    else:
        out[:, :, 0] = (2 * i + 5 * x + 3 * y) % 256
        out[:, :, 1] = (9 * i + 2 * x + 7 * y) % 256
        out[:, :, 2] = (4 * i + 3 * x + 11 * y) % 256
    out[:, :, 3] = 255
    return bytes(out.tobytes())


def _synth_image(i: int, k: int, w: int, h: int) -> bytes:
    """One fixture payload: variant ``(i + 2 * k) % 3`` rotates
    32-bpp DIB / 8-bpp palette DIB / embedded PNG so every decode path
    is oracle-gated across ids (entry 0's variant is ``i % 3``)."""
    v = (i + 2 * k) % 3
    if v == 0:
        return _dib_encode_icon(w, h, 32, _synth_rgba(i, w, h, 0))
    if v == 1:
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        idx = ((i + 3 * x + 5 * y) % 16).astype(np.uint8)
        palette = [((9 * i + 17 * c) % 256, (3 * i + 23 * c) % 256,
                    (13 * i + 7 * c) % 256) for c in range(16)]
        rgba = np.empty((h, w, 4), dtype=np.uint8)
        rgba[:, :, :3] = np.array(palette, dtype=np.uint8)[idx]
        rgba[:, :, 3] = 255
        return _dib_encode_icon(w, h, 4, bytes(rgba.tobytes()),
                                palette=palette,
                                indices=bytes(idx.tobytes()))
    from .multimodal import png_encode

    rgba = np.frombuffer(_synth_rgba(i, w, h, 2),
                         dtype=np.uint8).reshape(h, w, 4)
    return png_encode(w, h, bytes(rgba[:, :, :3].tobytes()), color_type=2)


def synth_ico_media(ids_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic ICO fixture: id ``i`` becomes a ``1 + i % 3``
    image directory whose entry 0 is always the LARGEST (``(8 + i % 5)
    x (6 + i % 4)``) so the best-image pick is closed-form; entry 0's
    payload variant ``i % 3`` rotates 32-bpp DIB / 4-bpp palette DIB /
    embedded PNG, and the smaller entries ``k`` (``(2 + k) x 2``,
    variant ``(i + 2k) % 3``) exercise directory parsing without
    affecting the features. All fixture pixels are opaque (alpha
    handling is pytest-covered with hand-built icons) so the oracle's
    mean/peak replay needs no mask arithmetic."""

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                i = int(did)
                images = [_synth_image(i, 0, 8 + i % 5, 6 + i % 4)]
                for k in range(1, 1 + i % 3):
                    images.append(_synth_image(i, k, 2 + k, 2))
                rows.append((i, bytearray(ico_encode(images))))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    return ids_df.select(id_col).mapInPandas(_enc, SYNTH_ICO_SCHEMA)
