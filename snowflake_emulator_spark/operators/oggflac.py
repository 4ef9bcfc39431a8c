"""FLAC and Ogg container header walks (r16) — pure stdlib.

The two open-audio containers a crawl meets after MP3/WAV: native
FLAC (``fLaC`` + metadata blocks) and Ogg (``OggS`` page stream
carrying Vorbis or Opus). Like the MPEG-audio and MP4 walks, the
METADATA level is what a training-data pipeline needs — sample rate,
channels, total samples, duration — and it is fully recoverable from
headers; entropy decode (FLAC subframes, Vorbis/Opus MDCT) is the
documented capability boundary.

Parsed per the public specs (xiph.org FLAC format, RFC 3533 Ogg,
RFC 7845 Ogg-Opus, Vorbis I):

* FLAC: metadata block chain (1-bit last flag, 7-bit type, 24-bit
  big-endian length); STREAMINFO's packed bit fields — 16+16 min/max
  blocksize, 24+24 min/max framesize, 20-bit sample rate, 3-bit
  channels-1, 5-bit bits-per-sample-1, 36-bit total samples, 128-bit
  MD5; VORBIS_COMMENT vendor/count (little-endian inside an otherwise
  big-endian format, per spec);
* Ogg: page framing (version 0, header-type flags, 64-bit granule
  position, serial, sequence, CRC, lacing segment table), per-page
  CRC32 verification with the Ogg polynomial (0x04C11DB7, init 0,
  no reflection, no final xor), packet counting via lacing
  terminators, BOS/EOS accounting, and codec identification from the
  first packet — Vorbis identification header or OpusHead. Duration
  comes from the last page's granule position (PCM samples for
  Vorbis; 48 kHz granules minus pre-skip for Opus, RFC 7845 §4).

Error contract: structural damage (bad magic, truncated blocks, CRC
mismatch, non-zero version) raises ``ValueError``; multiplexed Ogg
(a second BOS serial) and non-audio codecs raise
``NotImplementedError``.
"""
from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_MAX_PAGES = 100_000

_FLAC_BLOCK_TYPES = {0: "STREAMINFO", 1: "PADDING", 2: "APPLICATION",
                     3: "SEEKTABLE", 4: "VORBIS_COMMENT", 5: "CUESHEET",
                     6: "PICTURE"}


def flac_info(content: bytes) -> dict:
    """Walk a native-FLAC metadata chain. Returns ``{sample_rate,
    channels, bits_per_sample, total_samples, duration_s,
    min_blocksize, max_blocksize, n_metadata_blocks, block_types,
    n_comments, md5_hex}`` (``n_comments`` is None without a
    VORBIS_COMMENT block)."""
    if content is None:
        raise ValueError("null content")
    data = bytes(content)
    if len(data) < 4 or data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (no fLaC marker)")
    pos = 4
    streaminfo = None
    block_types: list[str] = []
    n_comments = None
    last = False
    while not last:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata block header")
        head = data[pos]
        last = bool(head & 0x80)
        btype = head & 0x7F
        if btype == 127:
            raise ValueError("invalid FLAC metadata block type 127")
        length = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = pos + 4
        if body + length > len(data):
            raise ValueError("truncated FLAC metadata block body")
        block_types.append(_FLAC_BLOCK_TYPES.get(btype, f"type{btype}"))
        if btype == 0:
            if length != 34:
                raise ValueError(
                    f"STREAMINFO length {length} (spec: 34)")
            b = data[body:body + 34]
            min_bs, max_bs = struct.unpack(">HH", b[0:4])
            # 20-bit rate | 3-bit ch-1 | 5-bit bps-1 | 36-bit samples
            packed = int.from_bytes(b[10:18], "big")
            rate = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            if rate == 0:
                raise ValueError("FLAC sample rate 0")
            streaminfo = {
                "min_blocksize": min_bs, "max_blocksize": max_bs,
                "sample_rate": rate, "channels": channels,
                "bits_per_sample": bps, "total_samples": total,
                "md5_hex": b[18:34].hex(),
            }
        elif btype == 4:
            # VORBIS_COMMENT is little-endian inside big-endian FLAC
            if length < 8:
                raise ValueError("truncated VORBIS_COMMENT")
            (vlen,) = struct.unpack("<I", data[body:body + 4])
            if 4 + vlen + 4 > length:
                raise ValueError("VORBIS_COMMENT vendor overruns block")
            (n_comments,) = struct.unpack(
                "<I", data[body + 4 + vlen:body + 8 + vlen])
        pos = body + length
    if streaminfo is None:
        raise ValueError("FLAC stream missing STREAMINFO")
    if block_types[0] != "STREAMINFO":
        raise ValueError("FLAC STREAMINFO must be the first block")
    return {
        **streaminfo,
        "duration_s": streaminfo["total_samples"]
        / streaminfo["sample_rate"],
        "n_metadata_blocks": len(block_types),
        "block_types": block_types,
        "n_comments": n_comments,
        "audio_offset": pos,
    }


# Ogg CRC32: polynomial 0x04C11DB7, init 0, MSB-first, no final xor
# (RFC 3533 appendix A). Table built once at import.
_OGG_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if _r & 0x80000000 else (_r << 1)
        _r &= 0xFFFFFFFF
    _OGG_CRC_TABLE.append(_r)


def ogg_crc(data: bytes, init: int = 0) -> int:
    crc = init
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) \
            ^ _OGG_CRC_TABLE[((crc >> 24) & 0xFF) ^ b]
    return crc


def _identify_codec(packet: bytes) -> tuple[str, dict]:
    """Codec + parameters from the first packet of the first page."""
    if packet[:7] == b"\x01vorbis":
        if len(packet) < 30:
            raise ValueError("truncated Vorbis identification header")
        (version,) = struct.unpack("<I", packet[7:11])
        if version != 0:
            raise ValueError(f"Vorbis version {version}")
        channels = packet[11]
        (rate,) = struct.unpack("<I", packet[12:16])
        if channels == 0 or rate == 0:
            raise ValueError("bad Vorbis channels/rate")
        return "vorbis", {"channels": channels, "sample_rate": rate,
                          "pre_skip": 0, "granule_rate": rate}
    if packet[:8] == b"OpusHead":
        if len(packet) < 19:
            raise ValueError("truncated OpusHead")
        version = packet[8]
        if version >> 4 != 0:  # RFC 7845: major version must be 0
            raise ValueError(f"Opus version {version}")
        channels = packet[9]
        (pre_skip,) = struct.unpack("<H", packet[10:12])
        (input_rate,) = struct.unpack("<I", packet[12:16])
        if channels == 0:
            raise ValueError("bad Opus channel count")
        # granule position is ALWAYS 48 kHz for Opus (RFC 7845 §4)
        return "opus", {"channels": channels, "sample_rate": 48000,
                        "input_sample_rate": input_rate,
                        "pre_skip": pre_skip, "granule_rate": 48000}
    if packet[:5] == b"\x7fFLAC":
        raise NotImplementedError("Ogg-encapsulated FLAC mapping")
    if packet[:7] == b"\x80theora":
        raise NotImplementedError("Theora video in Ogg")
    raise NotImplementedError(
        f"unrecognized Ogg codec (first packet {packet[:8]!r})")


def ogg_info(content: bytes) -> dict:
    """Walk an Ogg page stream (single logical bitstream): per-page
    CRC verification, packet counting, codec identification, duration
    from the final granule position. Returns ``{codec, channels,
    sample_rate, pre_skip, n_pages, n_packets, serial, has_eos,
    last_granule, n_samples, duration_s}``."""
    if content is None:
        raise ValueError("null content")
    data = bytes(content)
    pos = 0
    n_pages = n_packets = 0
    serial = None
    first_packet = bytearray()
    first_packet_done = False
    last_granule = None
    has_eos = False
    while pos < len(data):
        if data[pos:pos + 4] != b"OggS":
            raise ValueError(f"lost Ogg page sync at byte {pos}")
        if pos + 27 > len(data):
            raise ValueError("truncated Ogg page header")
        version = data[pos + 4]
        if version != 0:
            raise ValueError(f"Ogg stream structure version {version}")
        htype = data[pos + 5]
        (granule,) = struct.unpack("<q", data[pos + 6:pos + 14])
        (pserial, _seq, crc) = struct.unpack(
            "<IIi", data[pos + 14:pos + 26])
        crc &= 0xFFFFFFFF
        nsegs = data[pos + 26]
        seg_table = data[pos + 27:pos + 27 + nsegs]
        if len(seg_table) < nsegs:
            raise ValueError("truncated Ogg segment table")
        body_len = sum(seg_table)
        page_end = pos + 27 + nsegs + body_len
        if page_end > len(data):
            raise ValueError("truncated Ogg page body")
        # CRC: the whole page with the CRC field zeroed
        page = bytearray(data[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc:
            raise ValueError(f"Ogg page {n_pages} CRC mismatch")
        if n_pages == 0:
            if not htype & 0x02:
                raise ValueError("first Ogg page is not BOS")
            serial = pserial
        elif pserial != serial:
            if htype & 0x02:
                raise NotImplementedError(
                    "multiplexed Ogg (second BOS serial)")
            raise ValueError("foreign serial mid-stream")
        if htype & 0x04:
            has_eos = True
        # packets end at lacing values < 255
        n_packets += sum(1 for s in seg_table if s < 255)
        if not first_packet_done:
            body = data[pos + 27 + nsegs:page_end]
            off = 0
            for s in seg_table:
                first_packet += body[off:off + s]
                off += s
                if s < 255:
                    first_packet_done = True
                    break
        if granule != -1:
            last_granule = granule
        n_pages += 1
        if n_pages > _MAX_PAGES:
            raise ValueError("implausible Ogg page count")
        pos = page_end
    if n_pages == 0:
        raise ValueError("empty Ogg stream")
    if not first_packet_done:
        raise ValueError("Ogg first packet never terminates")
    codec, params = _identify_codec(bytes(first_packet))
    n_samples = None
    duration_s = None
    if last_granule is not None:
        n_samples = max(last_granule - params["pre_skip"], 0)
        duration_s = n_samples / params["granule_rate"]
    return {
        "codec": codec, "channels": params["channels"],
        "sample_rate": params["sample_rate"],
        "pre_skip": params["pre_skip"],
        "n_pages": n_pages, "n_packets": n_packets,
        "serial": serial, "has_eos": has_eos,
        "last_granule": last_granule,
        "n_samples": n_samples, "duration_s": duration_s,
    }


# ---------------------------------------------------------------------
# fixture encoders + deterministic synth (closed-form oracle strategy)
# ---------------------------------------------------------------------

def flac_encode_meta(sample_rate: int, channels: int, bps: int,
                     total_samples: int, min_bs: int = 4096,
                     max_bs: int = 4096, n_comments: int = 0,
                     with_padding: bool = False,
                     with_comment: bool = False) -> bytes:
    """A native-FLAC metadata prefix (no audio frames — the header
    walk's scope; documented in flac_info)."""
    packed = (sample_rate << 44) | ((channels - 1) << 41) \
        | ((bps - 1) << 36) | total_samples
    si = struct.pack(">HH", min_bs, max_bs) + bytes(6) \
        + packed.to_bytes(8, "big") + bytes(16)
    blocks = [(0, si)]
    if with_comment:
        vendor = b"sparkfixture"
        body = struct.pack("<I", len(vendor)) + vendor \
            + struct.pack("<I", n_comments)
        for k in range(n_comments):
            c = f"k{k}=v{k}".encode()
            body += struct.pack("<I", len(c)) + c
        blocks.append((4, body))
    if with_padding:
        blocks.append((1, bytes(17)))
    out = bytearray(b"fLaC")
    for idx, (btype, body) in enumerate(blocks):
        head = btype | (0x80 if idx == len(blocks) - 1 else 0)
        out += bytes([head]) + len(body).to_bytes(3, "big") + body
    return bytes(out)


def ogg_page(serial: int, seq: int, granule: int, packets: list[bytes],
             bos: bool = False, eos: bool = False,
             cont: bool = False) -> bytes:
    """One spec-valid Ogg page with correct lacing and CRC."""
    seg_table = bytearray()
    body = bytearray()
    for p in packets:
        n = len(p)
        while True:
            seg_table.append(min(n, 255))
            if n < 255:
                break
            n -= 255
        body += p
    htype = (0x01 if cont else 0) | (0x02 if bos else 0) \
        | (0x04 if eos else 0)
    head = b"OggS" + bytes([0, htype]) + struct.pack("<q", granule) \
        + struct.pack("<III", serial, seq, 0) \
        + bytes([len(seg_table)]) + bytes(seg_table)
    page = bytearray(head + body)
    crc = ogg_crc(bytes(page))
    page[22:26] = struct.pack("<I", crc)
    return bytes(page)


def vorbis_ident_packet(channels: int, rate: int) -> bytes:
    return (b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
            + struct.pack("<IiiI", rate, 0, 0, 0)
            + bytes([0xB8]) + b"\x01")


def opus_head_packet(channels: int, pre_skip: int,
                     input_rate: int) -> bytes:
    return (b"OpusHead" + bytes([1, channels])
            + struct.pack("<HIH", pre_skip, input_rate, 0)
            + bytes([0]))


def ogg_encode_stream(codec: str, channels: int, rate: int,
                      final_granule: int, serial: int,
                      n_data_pages: int = 2, pre_skip: int = 0) -> bytes:
    """A minimal spec-valid single-stream Ogg file: BOS ident page,
    data pages with deterministic opaque payloads, EOS page carrying
    the final granule position."""
    if codec == "vorbis":
        ident = vorbis_ident_packet(channels, rate)
    else:
        ident = opus_head_packet(channels, pre_skip, rate)
    pages = [ogg_page(serial, 0, 0 if codec == "vorbis" else -1,
                      [ident], bos=True)]
    for k in range(n_data_pages):
        payload = bytes(((serial + 7 * k + t) % 256)
                        for t in range(60 + 13 * k))
        gr = -1 if k < n_data_pages - 1 else final_granule
        pages.append(ogg_page(serial, k + 1, gr, [payload],
                              eos=k == n_data_pages - 1))
    return b"".join(pages)


CODEC_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("format", T.StringType(), True),
    T.StructField("codec", T.StringType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("n_samples", T.LongType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("n_units", T.IntegerType(), True),
    T.StructField("decode_ok", T.BooleanType(), False),
    T.StructField("error", T.StringType(), True),
])


def codec_meta_features(media: DataFrame, id_col: str = "media_id",
                        content_col: str = "content") -> DataFrame:
    """Arrow-batched kernel over mixed FLAC/Ogg blobs: sniffs per row
    and reports the unified metadata schema (``n_units`` is the FLAC
    metadata block count or the Ogg page count). Per-row error
    capture, same 100 TB contract as the other media kernels."""

    def _one(blob: bytes) -> tuple:
        b4 = bytes(blob[:4]) if blob is not None else b""
        if b4 == b"fLaC":
            fi = flac_info(blob)
            return ("flac", "flac", fi["channels"], fi["sample_rate"],
                    fi["total_samples"],
                    fi["total_samples"] * 1000 // fi["sample_rate"],
                    fi["n_metadata_blocks"])
        if b4 == b"OggS":
            oi = ogg_info(blob)
            dur = (oi["n_samples"] * 1000 // oi["sample_rate"]
                   if oi["n_samples"] is not None else None)
            return ("ogg", oi["codec"], oi["channels"],
                    oi["sample_rate"], oi["n_samples"], dur,
                    oi["n_pages"])
        raise ValueError("neither FLAC nor Ogg magic")

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
                                 None, None, False, str(e)[:200]))
            yield pd.DataFrame(
                rows, columns=[f.name for f in CODEC_META_SCHEMA.fields])

    return media.select(id_col, content_col).mapInPandas(
        _extract, CODEC_META_SCHEMA)


SYNTH_OGGFLAC_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("content", T.BinaryType(), True),
])

_RATES = (8000, 22050, 44100, 48000)


def synth_oggflac_media(ids_df: DataFrame,
                        id_col: str = "doc_id") -> DataFrame:
    """Deterministic FLAC/Ogg fixture: id ``i`` rotates by ``i % 3``
    through native FLAC (rate ``_RATES[i % 4]``, ``1 + i % 2``
    channels, 16-bit, ``1000 + 37 * i`` total samples, optional
    VORBIS_COMMENT with ``i % 5`` comments and PADDING blocks),
    Ogg-Vorbis (same rate table, final granule ``800 + 23 * i``) and
    Ogg-Opus (48 kHz granules, pre-skip ``312 + i % 5``, ``960 * (4 +
    i % 7)`` audio samples, ``2 + i % 3`` data pages). Closed-form in
    ``i`` for the SQL oracle."""

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                i = int(did)
                v = i % 3
                if v == 0:
                    blob = flac_encode_meta(
                        _RATES[i % 4], 1 + i % 2, 16, 1000 + 37 * i,
                        n_comments=i % 5, with_comment=i % 2 == 0,
                        with_padding=i % 4 == 1)
                elif v == 1:
                    blob = ogg_encode_stream(
                        "vorbis", 1 + i % 2, _RATES[i % 4],
                        final_granule=800 + 23 * i, serial=1000 + i,
                        n_data_pages=2 + i % 3)
                else:
                    pre = 312 + i % 5
                    blob = ogg_encode_stream(
                        "opus", 1 + i % 2, 48000,
                        final_granule=960 * (4 + i % 7) + pre,
                        serial=2000 + i, n_data_pages=2 + i % 3,
                        pre_skip=pre)
                rows.append((i, bytearray(blob)))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    return ids_df.select(id_col).mapInPandas(_enc, SYNTH_OGGFLAC_SCHEMA)
