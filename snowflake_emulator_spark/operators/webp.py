"""WebP header parse (r16) — pure stdlib.

WebP is the modern web's default image format; a crawl pipeline needs
its dimensions and feature flags (alpha, animation) even though VP8
entropy decode is out of scope (same documented-boundary policy as
H.264-in-MP4 and MPEG-audio PCM). All of it is recoverable from the
container headers, per Google's public WebP container and bitstream
specs (RFC 9649):

* RIFF framing: ``RIFF <size> WEBP`` then even-padded chunks;
* ``VP8 `` (lossy): 3-byte frame tag (keyframe bit, version,
  show_frame, first-partition size), start code ``0x9D 0x01 0x2A``,
  then 14-bit width/height with 2-bit scaling fields;
* ``VP8L`` (lossless): signature byte ``0x2F``, then a 32-bit
  little-endian field packing 14-bit width-1, 14-bit height-1, the
  alpha-is-used hint and a 3-bit version (must be 0);
* ``VP8X`` (extended): feature flags (ICC/alpha/EXIF/XMP/animation)
  and 24-bit canvas width-1/height-1; the actual image sits in
  later VP8/VP8L/ANMF chunks.

``webp_info`` returns ``{variant, width, height, has_alpha,
has_animation, n_chunks, chunks}``. Structural damage raises
``ValueError``; pixel decode raises ``NotImplementedError`` by its
absence from this module (decode_image reports header features).
"""
from __future__ import annotations

import struct


def webp_info(content: bytes) -> dict:
    """Parse the WebP container + first image chunk header."""
    if content is None:
        raise ValueError("null content")
    data = bytes(content)
    if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP signature)")
    (riff_size,) = struct.unpack("<I", data[4:8])
    end = min(8 + riff_size, len(data))
    if 8 + riff_size > len(data):
        raise ValueError("RIFF size overruns file")
    pos = 12
    chunks: list[str] = []
    variant = None
    width = height = None
    has_alpha = has_anim = False
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4].decode("latin-1")
        (clen,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = pos + 8
        if body + clen > end:
            raise ValueError(f"WebP chunk '{fourcc}' overruns RIFF size")
        chunks.append(fourcc)
        if fourcc == "VP8 " and variant is None:
            if clen < 10:
                raise ValueError("truncated VP8 frame header")
            tag = int.from_bytes(data[body:body + 3], "little")
            if tag & 1:
                raise ValueError("first VP8 frame is not a keyframe")
            if data[body + 3:body + 6] != b"\x9d\x01\x2a":
                raise ValueError("bad VP8 start code")
            (w_raw,) = struct.unpack("<H", data[body + 6:body + 8])
            (h_raw,) = struct.unpack("<H", data[body + 8:body + 10])
            width, height = w_raw & 0x3FFF, h_raw & 0x3FFF
            variant = "lossy"
        elif fourcc == "VP8L" and variant is None:
            if clen < 5:
                raise ValueError("truncated VP8L header")
            if data[body] != 0x2F:
                raise ValueError("bad VP8L signature byte")
            (bits,) = struct.unpack("<I", data[body + 1:body + 5])
            width = (bits & 0x3FFF) + 1
            height = ((bits >> 14) & 0x3FFF) + 1
            has_alpha = has_alpha or bool((bits >> 28) & 1)
            if (bits >> 29) & 0x7 != 0:
                raise ValueError("VP8L version must be 0")
            variant = "lossless"
        elif fourcc == "VP8X":
            if clen < 10:
                raise ValueError("truncated VP8X header")
            flags = data[body]
            has_alpha = has_alpha or bool(flags & 0x10)
            has_anim = bool(flags & 0x02)
            width = int.from_bytes(data[body + 4:body + 7], "little") + 1
            height = int.from_bytes(data[body + 7:body + 10], "little") + 1
            variant = "extended"
        elif fourcc == "ALPH":
            has_alpha = True
        pos = body + clen + (clen & 1)  # chunks are even-padded
    if variant is None:
        raise ValueError("WebP carries no VP8/VP8L/VP8X chunk")
    return {"variant": variant, "width": width, "height": height,
            "has_alpha": has_alpha, "has_animation": has_anim,
            "n_chunks": len(chunks), "chunks": chunks}


# ---------------------------------------------------------------------
# fixture encoders (header-true, payload opaque)
# ---------------------------------------------------------------------

def _riff(chunks: list[tuple[bytes, bytes]]) -> bytes:
    body = bytearray(b"WEBP")
    for fourcc, payload in chunks:
        body += fourcc + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + bytes(body)


def webp_encode_lossy(w: int, h: int, pad: int = 16) -> bytes:
    """A header-valid lossy WebP: keyframe tag, start code, 14-bit
    dims, opaque partition payload."""
    if not (0 < w <= 0x3FFF and 0 < h <= 0x3FFF):
        raise ValueError("dims out of 14-bit range")
    tag = (0 << 0) | (3 << 1) | (1 << 4) | (8 << 5)  # keyframe bit 0=0
    payload = tag.to_bytes(3, "little") + b"\x9d\x01\x2a" \
        + struct.pack("<HH", w, h) + bytes(pad)
    return _riff([(b"VP8 ", payload)])


def webp_encode_lossless(w: int, h: int, alpha: bool = False,
                         pad: int = 12) -> bytes:
    if not (0 < w <= 0x4000 and 0 < h <= 0x4000):
        raise ValueError("dims out of VP8L range")
    bits = (w - 1) | ((h - 1) << 14) | ((1 if alpha else 0) << 28)
    return _riff([(b"VP8L", bytes([0x2F]) + struct.pack("<I", bits)
                   + bytes(pad))])


def webp_encode_extended(w: int, h: int, alpha: bool = False,
                         anim: bool = False) -> bytes:
    flags = (0x10 if alpha else 0) | (0x02 if anim else 0)
    vp8x = bytes([flags, 0, 0, 0]) \
        + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
    inner = webp_encode_lossy(w, h)[12:]  # strip RIFF/WEBP framing
    chunks = [(b"VP8X", vp8x)]
    if alpha:
        chunks.append((b"ALPH", bytes(7)))
    if anim:
        chunks.append((b"ANIM", bytes(6)))
        chunks.append((b"ANMF", bytes(16)))
    else:
        chunks.append((inner[:4], inner[8:]))
    return _riff(chunks)


SYNTH_WEBP_SCHEMA_SQL = "media_id: long, content: binary"


def synth_webp_media(ids_df, id_col: str = "doc_id"):
    """Deterministic WebP fixture: id ``i`` rotates by ``i % 3``
    through lossy (``(20 + i % 9) x (12 + i % 7)``), lossless (same
    dims, alpha on ``i % 2``) and extended (alpha ``i % 2``, animation
    ``i % 4 == 3``). Closed-form in ``i`` for the SQL oracle."""
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
    ])

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                i = int(did)
                w, h = 20 + i % 9, 12 + i % 7
                v = i % 3
                if v == 0:
                    blob = webp_encode_lossy(w, h, pad=8 + i % 5)
                elif v == 1:
                    blob = webp_encode_lossless(w, h, alpha=i % 2 == 1)
                else:
                    blob = webp_encode_extended(w, h, alpha=i % 2 == 1,
                                                anim=i % 4 == 3)
                rows.append((i, bytearray(blob)))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    return ids_df.select(id_col).mapInPandas(_enc, schema)


def webp_features(media, id_col: str = "media_id",
                  content_col: str = "content"):
    """Arrow-batched header-feature kernel: one row per blob with the
    container variant, dimensions and feature flags. Per-row error
    capture, same 100 TB contract as the other media kernels."""
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("variant", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("has_alpha", T.BooleanType(), True),
        T.StructField("has_animation", T.BooleanType(), True),
        T.StructField("n_chunks", T.IntegerType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("error", T.StringType(), True),
    ])

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    wi = webp_info(bytes(content)
                                   if content is not None else None)
                    rows.append((int(mid), "webp", wi["variant"],
                                 wi["width"], wi["height"],
                                 wi["has_alpha"], wi["has_animation"],
                                 wi["n_chunks"], True, None))
                except Exception as e:  # noqa: BLE001 — per-row capture
                    rows.append((int(mid), None, None, None, None, None,
                                 None, None, False, str(e)[:200]))
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields])

    return media.select(id_col, content_col).mapInPandas(_extract, schema)
