"""MP4 / ISO-BMFF (ISO/IEC 14496-12) box walk (r16) — pure stdlib.

MP4 is the dominant crawl VIDEO container; a training-data pipeline
needs its metadata (duration, track dims, codec fourcc, frame count)
long before it needs pixel decode, and all of it lives in the ``moov``
box tree — no bitstream decoding required. This is the video
counterpart of the MPEG-audio header walk in operators/mpeg.py: real
structure parsing with full PCM/pixel synthesis as the documented
capability boundary (H.264/H.265/AV1 entropy decode is out of scope,
stated loudly, same policy as 12-bit/arithmetic JPEG).

Surface parsed, per the public ISO base-media spec:

* box framing: 32-bit size + fourcc, ``size == 1`` -> 64-bit
  largesize, ``size == 0`` -> extends to end of file (top level only);
  unknown boxes are skipped by their declared size, children must lie
  inside their parent;
* ``ftyp`` major/minor brand + compatible brands;
* ``moov/mvhd`` (versions 0 and 1) movie timescale + duration;
* per ``trak``: ``tkhd`` (v0/v1) track id + 16.16 fixed-point
  width/height, ``mdia/mdhd`` media timescale + duration,
  ``mdia/hdlr`` handler type (vide/soun/...), ``stbl/stsd`` first
  sample-entry fourcc (the codec), ``stbl/stts`` total sample count;
* ``mdat``/``free``/``skip``/``uuid``/``wide`` skipped structurally.

Error contract (shared with the sibling codec modules): structural
damage raises ``ValueError``; genuinely absent capability raises
``NotImplementedError``; the Spark kernel captures either per row.
"""
from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts"}
_MAX_BOXES = 10_000  # damage bound: a sane moov tree is far smaller


def _walk_boxes(data: bytes, start: int, end: int,
                top_level: bool = False) -> Iterator[tuple[bytes, int, int]]:
    """Yield ``(fourcc, body_start, body_end)`` for each box in
    ``data[start:end]``. Enforces spec framing: 64-bit largesize,
    size-0 only at top level, every box inside its parent."""
    pos = start
    n = 0
    while pos < end:
        if pos + 8 > end:
            raise ValueError(f"truncated box header at byte {pos}")
        size = struct.unpack(">I", data[pos:pos + 4])[0]
        fourcc = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated 64-bit box size")
            size = struct.unpack(">Q", data[pos + 8:pos + 16])[0]
            body = pos + 16
        elif size == 0:
            if not top_level:
                raise ValueError("size-0 box below top level")
            size = end - pos
        if size < body - pos:
            raise ValueError(f"box '{fourcc.decode('latin-1')}' size "
                             f"{size} smaller than its own header")
        if pos + size > end:
            raise ValueError(f"box '{fourcc.decode('latin-1')}' overruns "
                             "its parent")
        yield fourcc, body, pos + size
        pos += size
        n += 1
        if n > _MAX_BOXES:
            raise ValueError("implausible box count (structural damage)")


def _fullbox(data: bytes, body: int) -> tuple[int, int]:
    """(version, flags) of a FullBox; advances 4 bytes."""
    if body + 4 > len(data):
        raise ValueError("truncated FullBox header")
    v = data[body]
    flags = int.from_bytes(data[body + 1:body + 4], "big")
    return v, flags


def _parse_mvhd(data: bytes, body: int, end: int) -> tuple[int, int]:
    v, _ = _fullbox(data, body)
    p = body + 4
    if v == 1:
        if p + 28 > end:
            raise ValueError("truncated mvhd v1")
        timescale = struct.unpack(">I", data[p + 16:p + 20])[0]
        duration = struct.unpack(">Q", data[p + 20:p + 28])[0]
    elif v == 0:
        if p + 16 > end:
            raise ValueError("truncated mvhd v0")
        timescale, duration = struct.unpack(">II", data[p + 8:p + 16])
    else:
        raise ValueError(f"mvhd version {v}")
    if timescale == 0:
        raise ValueError("mvhd timescale 0")
    return timescale, duration


def _parse_tkhd(data: bytes, body: int, end: int) -> dict:
    v, _ = _fullbox(data, body)
    p = body + 4
    need = 32 + (20 if v == 1 else 12) + 60 - 8  # through width/height
    if v == 1:
        track_id = struct.unpack(">I", data[p + 16:p + 20])[0]
        rest = p + 32
    elif v == 0:
        track_id = struct.unpack(">I", data[p + 8:p + 12])[0]
        rest = p + 20
    else:
        raise ValueError(f"tkhd version {v}")
    # rest: 8 reserved, 2 layer, 2 alt group, 2 volume, 2 reserved,
    # 36 matrix, then 4+4 fixed-point width/height
    wh = rest + 52
    if wh + 8 > end:
        raise ValueError("truncated tkhd")
    w_fx, h_fx = struct.unpack(">II", data[wh:wh + 8])
    del need
    return {"track_id": track_id,
            "width": w_fx / 65536.0, "height": h_fx / 65536.0}


def _parse_mdhd(data: bytes, body: int, end: int) -> tuple[int, int]:
    v, _ = _fullbox(data, body)
    p = body + 4
    if v == 1:
        if p + 28 > end:
            raise ValueError("truncated mdhd v1")
        timescale = struct.unpack(">I", data[p + 16:p + 20])[0]
        duration = struct.unpack(">Q", data[p + 20:p + 28])[0]
    elif v == 0:
        if p + 16 > end:
            raise ValueError("truncated mdhd v0")
        timescale, duration = struct.unpack(">II", data[p + 8:p + 16])
    else:
        raise ValueError(f"mdhd version {v}")
    if timescale == 0:
        raise ValueError("mdhd timescale 0")
    return timescale, duration


def _parse_stsd(data: bytes, body: int, end: int) -> str | None:
    _v, _ = _fullbox(data, body)
    count = struct.unpack(">I", data[body + 4:body + 8])[0]
    if count == 0:
        return None
    # first sample entry: ordinary box framing
    for fourcc, _b, _e in _walk_boxes(data, body + 8, end):
        return fourcc.decode("latin-1")
    return None


def _parse_stts(data: bytes, body: int, end: int) -> tuple[int, int]:
    """(total_samples, total_media_duration) from the decoding
    time-to-sample table."""
    _v, _ = _fullbox(data, body)
    count = struct.unpack(">I", data[body + 4:body + 8])[0]
    if body + 8 + 8 * count > end:
        raise ValueError("truncated stts table")
    total = dur = 0
    for k in range(count):
        c, d = struct.unpack(">II", data[body + 8 + 8 * k:body + 16 + 8 * k])
        total += c
        dur += c * d
    return total, dur


def _parse_trak(data: bytes, body: int, end: int) -> dict:
    info = {"track_id": None, "handler": None, "codec": None,
            "timescale": None, "duration": None, "n_samples": None,
            "width": None, "height": None}
    for fourcc, b, e in _walk_boxes(data, body, end):
        if fourcc == b"tkhd":
            info.update(_parse_tkhd(data, b, e))
        elif fourcc == b"mdia":
            for f2, b2, e2 in _walk_boxes(data, b, e):
                if f2 == b"mdhd":
                    info["timescale"], info["duration"] = \
                        _parse_mdhd(data, b2, e2)
                elif f2 == b"hdlr":
                    if b2 + 12 > e2:
                        raise ValueError("truncated hdlr")
                    info["handler"] = data[b2 + 8:b2 + 12].decode("latin-1")
                elif f2 == b"minf":
                    for f3, b3, e3 in _walk_boxes(data, b2, e2):
                        if f3 == b"stbl":
                            for f4, b4, e4 in _walk_boxes(data, b3, e3):
                                if f4 == b"stsd":
                                    info["codec"] = _parse_stsd(data, b4, e4)
                                elif f4 == b"stts":
                                    info["n_samples"], _ = \
                                        _parse_stts(data, b4, e4)
    if info["handler"] is None or info["timescale"] is None:
        raise ValueError("trak missing mdhd/hdlr")
    return info


def mp4_info(content: bytes) -> dict:
    """Walk an ISO-BMFF file and return its structural metadata:
    ``{major_brand, minor_version, compatible_brands, timescale,
    duration, duration_s, n_tracks, tracks: [...]}`` where each track
    carries ``{track_id, handler, codec, timescale, duration,
    n_samples, width, height}``. Fragmented MP4 (``moof``-carried
    samples) raises NotImplementedError — the moov-level metadata of a
    fragmented file is structurally different (empty stts) and
    reporting it as a zero-frame video would be silently wrong."""
    if content is None:
        raise ValueError("null content")
    data = bytes(content)
    if len(data) < 16:
        raise ValueError("not an ISO-BMFF file (too short)")
    brand = None
    minor = None
    compat: list[str] = []
    movie = None
    tracks: list[dict] = []
    fragmented = False
    for fourcc, b, e in _walk_boxes(data, 0, len(data), top_level=True):
        if fourcc == b"ftyp":
            if e - b < 8:
                raise ValueError("truncated ftyp")
            brand = data[b:b + 4].decode("latin-1")
            minor = struct.unpack(">I", data[b + 4:b + 8])[0]
            compat = [data[k:k + 4].decode("latin-1")
                      for k in range(b + 8, e - 3, 4)]
        elif fourcc == b"moov":
            for f2, b2, e2 in _walk_boxes(data, b, e):
                if f2 == b"mvhd":
                    movie = _parse_mvhd(data, b2, e2)
                elif f2 == b"trak":
                    tracks.append(_parse_trak(data, b2, e2))
                elif f2 == b"mvex":
                    fragmented = True
        elif fourcc == b"moof":
            fragmented = True
    if brand is None:
        raise ValueError("no ftyp box — not an MP4 file")
    if movie is None:
        raise ValueError("no moov/mvhd box")
    if fragmented:
        raise NotImplementedError(
            "fragmented MP4 (moof/mvex) — moov carries no sample tables")
    timescale, duration = movie
    return {
        "major_brand": brand, "minor_version": minor,
        "compatible_brands": compat,
        "timescale": timescale, "duration": duration,
        "duration_s": duration / timescale,
        "n_tracks": len(tracks), "tracks": tracks,
    }


VIDEO_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("format", T.StringType(), True),
    T.StructField("major_brand", T.StringType(), True),
    T.StructField("n_tracks", T.IntegerType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("frame_count", T.LongType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("video_codec", T.StringType(), True),
    T.StructField("audio_codec", T.StringType(), True),
    T.StructField("decode_ok", T.BooleanType(), False),
    T.StructField("error", T.StringType(), True),
])


def video_features(media: DataFrame, id_col: str = "media_id",
                   content_col: str = "content") -> DataFrame:
    """Arrow-batched ``mapInPandas`` video-metadata kernel: one row per
    blob with container metadata from the box walk — width/height/
    frame_count from the FIRST video track, codecs from the first
    video and first audio track, movie-level duration. Per-row error
    capture, same 100 TB contract as media_features."""

    def _one(blob: bytes) -> tuple:
        mi = mp4_info(blob)
        vid = next((t for t in mi["tracks"] if t["handler"] == "vide"), None)
        aud = next((t for t in mi["tracks"] if t["handler"] == "soun"), None)
        return ("mp4", mi["major_brand"], mi["n_tracks"],
                int(vid["width"]) if vid else None,
                int(vid["height"]) if vid else None,
                vid["n_samples"] if vid else None,
                mi["duration"] * 1000 // mi["timescale"],
                vid["codec"] if vid else None,
                aud["codec"] if aud else None)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    rows.append((int(mid),
                                 *_one(bytes(content)
                                       if content is not None else None),
                                 True, None))
                except Exception as e:  # noqa: BLE001 — per-row capture
                    rows.append((int(mid), None, None, None, None, None,
                                 None, None, None, None, False,
                                 str(e)[:200]))
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_FEATURE_SCHEMA.fields])

    return media.select(id_col, content_col).mapInPandas(
        _extract, VIDEO_FEATURE_SCHEMA)


# ---------------------------------------------------------------------
# fixture encoder + deterministic synth (closed-form oracle strategy)
# ---------------------------------------------------------------------

def _box(fourcc: bytes, payload: bytes, force64: bool = False) -> bytes:
    if force64:
        return struct.pack(">I", 1) + fourcc \
            + struct.pack(">Q", 16 + len(payload)) + payload
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(version: int, payload: bytes) -> bytes:
    return bytes([version, 0, 0, 0]) + payload


def _mvhd(timescale: int, duration: int, v: int) -> bytes:
    if v == 1:
        body = _full(1, struct.pack(">QQIQ", 0, 0, timescale, duration))
    else:
        body = _full(0, struct.pack(">IIII", 0, 0, timescale, duration))
    body += struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
    body += bytes(10)  # reserved
    body += struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                        0x40000000)
    body += bytes(24) + struct.pack(">I", 0xFFFFFFFF)  # predefined+next id
    return _box(b"mvhd", body)


def _tkhd(track_id: int, duration: int, w: int, h: int, v: int) -> bytes:
    if v == 1:
        body = _full(1, struct.pack(">QQIIQ", 0, 0, track_id, 0, duration))
    else:
        body = _full(0, struct.pack(">IIIII", 0, 0, track_id, 0, duration))
    body += bytes(8) + struct.pack(">HHHH", 0, 0, 0, 0)
    body += struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                        0x40000000)
    body += struct.pack(">II", w << 16, h << 16)
    return _box(b"tkhd", body)


def _mdhd(timescale: int, duration: int, v: int) -> bytes:
    if v == 1:
        body = _full(1, struct.pack(">QQIQ", 0, 0, timescale, duration))
    else:
        body = _full(0, struct.pack(">IIII", 0, 0, timescale, duration))
    body += struct.pack(">HH", 0x55C4, 0)  # language 'und'
    return _box(b"mdhd", body)


def _hdlr(handler: bytes) -> bytes:
    return _box(b"hdlr", _full(0, struct.pack(">I", 0) + handler
                               + bytes(12) + b"h\x00"))


def _sample_entry(fourcc: bytes, video: bool, w: int = 0,
                  h: int = 0) -> bytes:
    body = bytes(6) + struct.pack(">H", 1)  # reserved + data_ref_index
    if video:
        body += bytes(16)
        body += struct.pack(">HH", w, h)
        body += struct.pack(">IIIH", 0x00480000, 0x00480000, 0, 1)
        body += bytes(32)  # compressorname
        body += struct.pack(">Hh", 24, -1)
    else:
        body += bytes(8) + struct.pack(">HHHHI", 2, 16, 0, 0, 0)
    return _box(fourcc, body)


def _stbl(codec: bytes, video: bool, n_samples: int, delta: int,
          w: int = 0, h: int = 0) -> bytes:
    stsd = _box(b"stsd", _full(0, struct.pack(">I", 1)
                               + _sample_entry(codec, video, w, h)))
    stts = _box(b"stts", _full(0, struct.pack(">III", 1, n_samples, delta)))
    stsc = _box(b"stsc", _full(0, struct.pack(">I", 0)))
    stsz = _box(b"stsz", _full(0, struct.pack(">II", 0, n_samples)))
    stco = _box(b"stco", _full(0, struct.pack(">I", 0)))
    return _box(b"stbl", stsd + stts + stsc + stsz + stco)


def _trak(track_id: int, handler: bytes, codec: bytes,
          media_timescale: int, n_samples: int, delta: int,
          movie_duration: int, w: int, h: int, v: int) -> bytes:
    video = handler == b"vide"
    minf = _box(b"minf", _stbl(codec, video, n_samples, delta, w, h))
    mdia = _box(b"mdia", _mdhd(media_timescale, n_samples * delta, v)
                + _hdlr(handler) + minf)
    return _box(b"trak", _tkhd(track_id, movie_duration,
                               w if video else 0, h if video else 0, v)
                + mdia)


def mp4_encode(major_brand: bytes, w: int, h: int, fps: int,
               n_video: int, video_codec: bytes,
               audio: tuple[bytes, int, int] | None = None,
               movie_timescale: int = 600, version: int = 0,
               mdat_first: bool = False, with_uuid: bool = False,
               force64_free: bool = False) -> bytes:
    """Assemble a minimal spec-valid MP4: ftyp + moov (+ mdat/free/
    uuid). Video track timescale is ``fps * 1000`` with per-sample
    delta 1000; ``audio`` is ``(codec, sample_rate, n_samples)`` with
    delta 1024. 600 must be divisible by fps so the movie duration is
    exact."""
    assert movie_timescale % fps == 0
    movie_duration = n_video * (movie_timescale // fps)
    boxes = [_box(b"ftyp", major_brand + struct.pack(">I", 0x200)
                  + major_brand + b"isom")]
    mdat = _box(b"mdat", bytes(32))
    if mdat_first:
        boxes.append(mdat)
    traks = [_trak(1, b"vide", video_codec, fps * 1000, n_video, 1000,
                   movie_duration, w, h, version)]
    if audio is not None:
        codec, rate, n_samp = audio
        traks.append(_trak(2, b"soun", codec, rate, n_samp, 1024,
                           movie_duration, 0, 0, version))
    boxes.append(_box(b"moov", _mvhd(movie_timescale, movie_duration,
                                     version) + b"".join(traks)))
    if not mdat_first:
        boxes.append(mdat)
    boxes.append(_box(b"free", bytes(12), force64=force64_free))
    if with_uuid:
        boxes.append(_box(b"uuid", bytes(16) + b"opaque"))
    return b"".join(boxes)


SYNTH_MP4_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("content", T.BinaryType(), True),
])


def synth_mp4_media(ids_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic MP4 fixture: id ``i`` becomes a movie with a
    video track (``(160 + 16 * (i % 8)) x (96 + 16 * (i % 5))``,
    ``fps = (24, 25, 30)[i % 3]``, ``24 + i % 48`` frames, codec
    avc1/hev1 by ``i % 2``) and, when ``i % 3 != 1``, an mp4a audio
    track at ``(44100, 48000)[i % 2]`` Hz. ``i % 4 == 3`` uses
    version-1 (64-bit) mvhd/tkhd/mdhd, ``i % 5 == 1`` puts mdat before
    moov, ``i % 7 == 2`` appends a uuid box, ``i % 6 == 4`` frames the
    free box with a 64-bit largesize. Every feature is closed-form in
    ``i`` for the SQL oracle."""

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                i = int(did)
                fps = (24, 25, 30)[i % 3]
                blob = mp4_encode(
                    major_brand=b"isom" if i % 2 == 0 else b"mp42",
                    w=160 + 16 * (i % 8), h=96 + 16 * (i % 5), fps=fps,
                    n_video=24 + i % 48,
                    video_codec=b"avc1" if i % 2 == 0 else b"hev1",
                    audio=(b"mp4a", (44100, 48000)[i % 2], 32 + i % 16)
                    if i % 3 != 1 else None,
                    version=1 if i % 4 == 3 else 0,
                    mdat_first=i % 5 == 1, with_uuid=i % 7 == 2,
                    force64_free=i % 6 == 4)
                rows.append((i, bytearray(blob)))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    return ids_df.select(id_col).mapInPandas(_enc, SYNTH_MP4_SCHEMA)
