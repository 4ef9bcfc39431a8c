"""MPEG audio (MP3/MP2/MP1) frame-header walk (r16, VERDICT item 2)
— pure stdlib + numpy-free hot path. MP3 is the dominant crawl audio
container and was unreadable until now; its METADATA features —
duration, bitrate, sample rate, channels, frame count — come entirely
from the 4-byte frame headers, so no PCM synthesis is required (the
full subband/MDCT reconstruction is a documented capability boundary,
the same policy as 12-bit/arithmetic JPEG).

Header surface, per ISO/IEC 11172-3 (MPEG-1) and 13818-3 (MPEG-2)
plus the informal MPEG-2.5 extension:

* ID3v2 prefix skip — syncsafe 28-bit size, footer flag honored;
* 11-bit frame sync (0xFFE) with DOUBLE-SYNC validation: a candidate
  first frame is accepted only if the header at ``pos + frame_size``
  parses with the same (version, layer, sample_rate), or the stream
  ends there — a lone 0xFFEx byte pair in junk cannot fake a stream;
* Layer I/II/III bitrate tables (MPEG-1 and the shared MPEG-2/2.5
  set), sample-rate tables per version, padding-aware frame sizes
  (Layer I pads in 4-byte slots);
* CBR vs VBR via BOTH the per-frame bitrate histogram and the
  Xing/Info (LAME) and VBRI (Fraunhofer) first-frame headers —
  a Xing/VBRI frame carries no audio and is excluded from the audio
  frame count and the bitrate mean;
* trailing ID3v1 (``TAG``, 128 bytes) and APE (``APETAGEX``) tags
  tolerated after the last frame.

Free-format streams (bitrate index 0) raise ``NotImplementedError``;
structural damage raises ``ValueError`` — the shared error contract
of the codec modules (multimodal/gif/jpeg/audio).
"""
from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# bitrate tables in kbps, index 1..14 (0 = free format, 15 = invalid).
# MPEG-2 and MPEG-2.5 share one table set ("2" group).
_BITRATE = {
    ("1", 1): (0, 32, 64, 96, 128, 160, 192, 224,
               256, 288, 320, 352, 384, 416, 448),
    ("1", 2): (0, 32, 48, 56, 64, 80, 96, 112,
               128, 160, 192, 224, 256, 320, 384),
    ("1", 3): (0, 32, 40, 48, 56, 64, 80, 96,
               112, 128, 160, 192, 224, 256, 320),
    ("2", 1): (0, 32, 48, 56, 64, 80, 96, 112,
               128, 144, 160, 176, 192, 224, 256),
    ("2", 2): (0, 8, 16, 24, 32, 40, 48, 56,
               64, 80, 96, 112, 128, 144, 160),
    ("2", 3): (0, 8, 16, 24, 32, 40, 48, 56,
               64, 80, 96, 112, 128, 144, 160),
}
_SAMPLE_RATE = {
    "1": (44100, 48000, 32000),
    "2": (22050, 24000, 16000),
    "2.5": (11025, 12000, 8000),
}
_VERSION_BITS = {0: "2.5", 2: "2", 3: "1"}


def parse_frame_header(data: bytes, pos: int = 0) -> dict:
    """Parse ONE 4-byte MPEG audio frame header at ``pos``. Returns
    ``{version, layer, bitrate_kbps, sample_rate, channels, padding,
    samples_per_frame, frame_size}``; raises ValueError when the bytes
    are not a spec-valid header, NotImplementedError for free-format
    (bitrate index 0) streams whose frame size is not derivable from
    the header alone."""
    if pos + 4 > len(data):
        raise ValueError("truncated MPEG frame header")
    h = struct.unpack(">I", data[pos:pos + 4])[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        raise ValueError("no MPEG frame sync")
    vbits = (h >> 19) & 3
    if vbits == 1:
        raise ValueError("reserved MPEG version id")
    version = _VERSION_BITS[vbits]
    lbits = (h >> 17) & 3
    if lbits == 0:
        raise ValueError("reserved MPEG layer")
    layer = 4 - lbits  # 1=Layer I, 2=Layer II, 3=Layer III
    br_idx = (h >> 12) & 0xF
    if br_idx == 0xF:
        raise ValueError("invalid MPEG bitrate index 15")
    if br_idx == 0:
        raise NotImplementedError("free-format MPEG bitrate")
    sr_idx = (h >> 10) & 3
    if sr_idx == 3:
        raise ValueError("reserved MPEG sample-rate index")
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3  # 0 stereo, 1 joint, 2 dual, 3 single
    channels = 1 if mode == 3 else 2
    grp = "1" if version == "1" else "2"
    kbps = _BITRATE[(grp, layer)][br_idx]
    rate = _SAMPLE_RATE[version][sr_idx]
    if layer == 1:
        spf = 384
        size = (12 * kbps * 1000 // rate + padding) * 4
    elif layer == 2:
        spf = 1152
        size = 144 * kbps * 1000 // rate + padding
    else:
        spf = 1152 if version == "1" else 576
        size = (144 if version == "1" else 72) * kbps * 1000 // rate \
            + padding
    return {
        "version": version, "layer": layer, "bitrate_kbps": kbps,
        "sample_rate": rate, "channels": channels, "padding": padding,
        "samples_per_frame": spf, "frame_size": size, "mode": mode,
    }


def _skip_id3v2(data: bytes) -> int:
    """Return the offset of the first byte after an ID3v2 prefix (0 if
    none). Syncsafe 28-bit size; bit 4 of the flags byte adds a
    10-byte footer."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    flags = data[5]
    if any(b & 0x80 for b in data[6:10]):
        raise ValueError("non-syncsafe ID3v2 size byte")
    size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    return 10 + size + (10 if flags & 0x10 else 0)


_TAIL_TAGS = (b"TAG", b"APETAGEX", b"ID3")


def _is_tail_junk(data: bytes, pos: int) -> bool:
    rest = data[pos:]
    if len(rest) < 4:
        return True
    return any(rest.startswith(t) for t in _TAIL_TAGS) \
        or rest.lstrip(b"\x00") == b""


def _xing_or_vbri(data: bytes, pos: int, hdr: dict) -> tuple[str, int] | None:
    """Detect a Xing/Info (LAME) or VBRI (Fraunhofer) metadata header
    inside the first frame. Returns (tag, declared_frame_count) with
    frame count -1 when the header is present but carries no FRAMES
    field."""
    side = (17 if hdr["channels"] == 1 else 32) if hdr["version"] == "1" \
        else (9 if hdr["channels"] == 1 else 17)
    xo = pos + 4 + side
    if data[xo:xo + 4] in (b"Xing", b"Info") and xo + 8 <= len(data):
        flags = struct.unpack(">I", data[xo + 4:xo + 8])[0]
        if flags & 0x1 and xo + 12 <= len(data):
            return (data[xo:xo + 4].decode("ascii"),
                    struct.unpack(">I", data[xo + 8:xo + 12])[0])
        return (data[xo:xo + 4].decode("ascii"), -1)
    vo = pos + 4 + 32
    if data[vo:vo + 4] == b"VBRI" and vo + 18 <= len(data):
        return ("VBRI", struct.unpack(">I", data[vo + 14:vo + 18])[0])
    return None


def mpeg_audio_info(content: bytes, max_sync_scan: int = 65536) -> dict:
    """Walk an MPEG audio stream's frame headers. Returns::

        {version, layer, sample_rate, channels, frame_count,
         samples_per_frame, duration_s, bitrate_kbps, is_vbr,
         vbr_tag, declared_frame_count, id3v2_bytes}

    ``frame_count`` counts AUDIO frames (a Xing/Info/VBRI first frame
    is metadata, not audio, and is excluded); ``duration_s`` =
    frame_count * samples_per_frame / sample_rate; ``bitrate_kbps`` is
    the mean of the audio frames' header bitrates (== the constant
    header value for CBR). The first frame is found by double-sync
    validation within ``max_sync_scan`` bytes after the ID3v2 prefix."""
    if content is None:
        raise ValueError("null content")
    data = bytes(content)
    start = _skip_id3v2(data)
    if start >= len(data):
        raise ValueError("ID3v2 tag exhausts the stream")
    n = len(data)
    first = None
    limit = min(n - 4, start + max_sync_scan)
    pos = start
    while pos <= limit:
        if data[pos] == 0xFF and (data[pos + 1] & 0xE0) == 0xE0:
            try:
                hdr = parse_frame_header(data, pos)
            except ValueError:
                pos += 1
                continue
            nxt = pos + hdr["frame_size"]
            if nxt + 4 <= n:
                try:
                    h2 = parse_frame_header(data, nxt)
                    ok = (h2["version"], h2["layer"],
                          h2["sample_rate"]) == (
                        hdr["version"], hdr["layer"], hdr["sample_rate"])
                except (ValueError, NotImplementedError):
                    # 1-frame stream followed by a trailer tag is valid
                    ok = _is_tail_junk(data, nxt)
                if ok:
                    first = pos
                    break
            elif nxt <= n and _is_tail_junk(data, nxt):
                # single-frame stream: the declared frame must fit in
                # full — a lone sync pair in junk claims a frame size
                # past EOF and is rejected here
                first = pos
                break
            pos += 1
        else:
            pos += 1
    if first is None:
        raise ValueError("no valid MPEG frame sync found")
    hdr0 = parse_frame_header(data, first)
    vbr_meta = _xing_or_vbri(data, first, hdr0)
    frames = 0
    kbps_sum = 0
    kbps_set: set[int] = set()
    pos = first
    while pos + 4 <= n:
        try:
            hdr = parse_frame_header(data, pos)
        except (ValueError, NotImplementedError):
            break
        if (hdr["version"], hdr["layer"], hdr["sample_rate"]) != (
                hdr0["version"], hdr0["layer"], hdr0["sample_rate"]):
            break
        is_meta = pos == first and vbr_meta is not None
        if not is_meta:
            frames += 1
            kbps_sum += hdr["bitrate_kbps"]
            kbps_set.add(hdr["bitrate_kbps"])
        pos += hdr["frame_size"]
    if frames == 0:
        raise ValueError("MPEG stream has no audio frames")
    if not _is_tail_junk(data, pos):
        # mid-stream desync: everything walked so far was valid, so
        # report it, but a structurally broken tail is an error — the
        # per-row capture in media_features turns this into an error
        # column rather than a poisoned duration
        raise ValueError(
            f"MPEG frame walk desynced at byte {pos} of {n}")
    declared = vbr_meta[1] if vbr_meta and vbr_meta[1] >= 0 else None
    return {
        "version": hdr0["version"],
        "layer": hdr0["layer"],
        "sample_rate": hdr0["sample_rate"],
        "channels": hdr0["channels"],
        "frame_count": frames,
        "samples_per_frame": hdr0["samples_per_frame"],
        "duration_s": frames * hdr0["samples_per_frame"]
        / hdr0["sample_rate"],
        "bitrate_kbps": kbps_sum / frames,
        "is_vbr": len(kbps_set) > 1 or (
            vbr_meta is not None and vbr_meta[0] in ("Xing", "VBRI")),
        "vbr_tag": vbr_meta[0] if vbr_meta else None,
        "declared_frame_count": declared,
        "id3v2_bytes": start,
    }


# ---------------------------------------------------------------------
# fixture encoder + deterministic synth (closed-form oracle strategy,
# same as synth_wav_media / synth_png_media)
# ---------------------------------------------------------------------

def mpeg_encode_headers(version: str, layer: int, br_idx: int,
                        sr_idx: int, channels: int, n_frames: int,
                        pad_of_frame=None, id3v2_size: int = 0,
                        id3v1: bool = False) -> bytes:
    """Build a spec-valid MPEG stream of ``n_frames`` frames with
    zero-filled payloads (header walk needs no entropy data). Optional
    ID3v2 prefix of ``id3v2_size`` content bytes and ID3v1 trailer."""
    out = bytearray()
    if id3v2_size:
        sz = id3v2_size
        out += b"ID3\x04\x00\x00" + bytes(
            [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
             (sz >> 7) & 0x7F, sz & 0x7F])
        out += bytes(id3v2_size)
    vbits = {"1": 3, "2": 2, "2.5": 0}[version]
    lbits = 4 - layer
    mode = 3 if channels == 1 else 0
    for t in range(n_frames):
        pad = int(pad_of_frame(t)) if pad_of_frame else 0
        h = (0x7FF << 21) | (vbits << 19) | (lbits << 17) | (1 << 16) \
            | (br_idx << 12) | (sr_idx << 10) | (pad << 9) | (mode << 6)
        hdr_bytes = struct.pack(">I", h)
        info = parse_frame_header(hdr_bytes)
        out += hdr_bytes + bytes(info["frame_size"] - 4)
    if id3v1:
        out += b"TAG" + bytes(125)
    return bytes(out)


SYNTH_MPEG_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("content", T.BinaryType(), True),
])

# the five deterministic (version, layer, br_idx, sr_idx) shapes keyed
# by id % 5 — chosen to cover MPEG-1/2/2.5, Layers I/II/III, and both
# bitrate table groups. Closed-form constants the SQL oracle restates:
#   m  version layer  kbps  rate    spf
#   0     1      3     128  44100  1152
#   1     1      1     256  32000   384
#   2     1      2     256  48000  1152
#   3     2      3      56  22050   576
#   4    2.5     3      24   8000   576
_SYNTH_SHAPES = (
    ("1", 3, 9, 0), ("1", 1, 8, 2), ("1", 2, 12, 1),
    ("2", 3, 7, 0), ("2.5", 3, 3, 2),
)


def synth_mpeg_media(ids_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic MPEG fixture: id ``i`` becomes a CBR stream of
    ``6 + i % 9`` frames with shape ``_SYNTH_SHAPES[i % 5]`` and
    ``channels = 2 - i % 2``; ``i % 3 == 0`` adds an ID3v2 prefix of
    ``20 + i % 50`` bytes, ``i % 4 == 1`` an ID3v1 trailer, and
    ``i % 3 == 2`` alternates the padding bit per frame (frame sizes
    change, features don't). Every feature is closed-form in ``i``,
    so the SQL oracle replays duration/bitrate/rate/channels/frames
    with no MPEG bytes involved."""

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                i = int(did)
                version, layer, br_idx, sr_idx = _SYNTH_SHAPES[i % 5]
                blob = mpeg_encode_headers(
                    version, layer, br_idx, sr_idx,
                    channels=2 - i % 2, n_frames=6 + i % 9,
                    pad_of_frame=(lambda t: t % 2) if i % 3 == 2 else None,
                    id3v2_size=20 + i % 50 if i % 3 == 0 else 0,
                    id3v1=i % 4 == 1)
                rows.append((i, bytearray(blob)))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    return ids_df.select(id_col).mapInPandas(_enc, SYNTH_MPEG_SCHEMA)
