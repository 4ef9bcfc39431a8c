"""Cross-codec mutation sweep (r14 discipline, scripted in r15).

Usage: python scratch/fuzz_codecs.py [seed] [n_artifacts] [mutations_per]

Builds deterministic artifacts across every decode surface — JPEG
baseline (interleaved + r15 non-interleaved) / progressive, GIF
(raw + r15 composited sub-rect animations), WAV 8/16/24/32-bit +
float, PNG, WARC plain+gzip — then applies independent random 1-4
byte flips to each and decodes. PASS criteria: no mutated decode may
escape with anything but a CONTROLLED exception (ValueError /
NotImplementedError / struct.error / zlib.error / EOFError /
IndexError / KeyError / OverflowError from the parse layer), and no
decode may hang (wall-clock bound per decode). Surviving decodes
(mutations that still parse) are fine — only crashes/hangs fail.
"""
import random
import struct
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from snowflake_emulator_spark.operators.audio import (
    aiff_decode,
    aiff_encode,
    au_decode,
    au_encode,
    wav_decode,
    wav_encode,
)
from snowflake_emulator_spark.operators.gif import (
    gif_decode,
    gif_decode_composited,
    gif_encode,
)
from snowflake_emulator_spark.operators.jpeg import jpeg_decode, jpeg_encode
from snowflake_emulator_spark.operators.mpeg import mpeg_audio_info
from snowflake_emulator_spark.operators.multimodal import (
    bmp_decode,
    decode_image,
    png_decode,
    png_encode,
    pnm_decode,
)
from snowflake_emulator_spark.sources.warc import parse_warc

SEED = int(sys.argv[1]) if len(sys.argv) > 1 else 150816
N_ART = int(sys.argv[2]) if len(sys.argv) > 2 else 420
MUTS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
ALLOWED = (ValueError, NotImplementedError, struct.error,
           EOFError, IndexError, KeyError, OverflowError)
MAX_SEC = 20.0


def build_artifacts(rng: random.Random) -> list:
    """(kind, bytes, decoder) triples, deterministic in rng."""
    arts = []
    n_kinds = 19
    per = max(1, N_ART // n_kinds)
    for j in range(per):
        w, h = 8 + j % 25, 8 + j % 17
        g = np.array([[(7 * j + 3 * x + 5 * y) % 256 for x in range(w)]
                      for y in range(h)], dtype=np.float64)
        cb = np.full((h, w), (90 + j) % 256, dtype=np.float64)
        cr = np.full(((h + 1) // 2, (w + 1) // 2), (140 + j) % 256,
                     dtype=np.float64)
        cb2 = cb[:(h + 1) // 2, :(w + 1) // 2]
        arts.append(("jpeg_base", jpeg_encode(w, h, [g], [(1, 1)]),
                     jpeg_decode))
        arts.append(("jpeg_noninter",
                     jpeg_encode(w, h, [g, cb, cb], [(1, 1)] * 3,
                                 non_interleaved=True), jpeg_decode))
        arts.append(("jpeg_prog",
                     jpeg_encode(w, h, [g, cb2, cr],
                                 [(2, 2), (1, 1), (1, 1)],
                                 progressive=True), jpeg_decode))
        pal = [((7 * k + j) % 256, (11 * k) % 256, (13 * k) % 256)
               for k in range(16)]
        idx = bytes((j + 3 * x + 5 * y) % 16
                    for y in range(h) for x in range(w))
        arts.append(("gif", gif_encode(w, h, [(idx, pal)],
                                       interlace=j % 2 == 0), gif_decode))
        # sub-rect animation assembled by hand for the composited path
        arts.append(("gif_anim", _subrect_gif(j), gif_decode_composited))
        bits = [8, 16, 24, 32][j % 4]
        smp = (np.arange(40 + j % 13, dtype=np.int64) * 257 + j) \
            % (1 << min(bits, 31)) - (1 << min(bits - 1, 30))
        arts.append(("wav", wav_encode(8000, 1, smp.astype(np.int64),
                                       bits=bits), wav_decode))
        px = bytes(((5 * j + x + y) % 256)
                   for y in range(h) for x in range(w) for _c in range(3))
        arts.append(("png", png_encode(w, h, px, 2, lambda yy: yy % 5),
                     png_decode))
        arts.append(("bmp", _bmp24(w, h, j), bmp_decode))
        arts.append(("bmp_rle8", _bmp_rle(w, h, j, 8), bmp_decode))
        arts.append(("bmp_rle4", _bmp_rle(w, h, j, 4), bmp_decode))
        arts.append(("mpeg", _mpeg(j), mpeg_audio_info))
        aub = [8, 16, 24, 32][j % 4]
        smp2 = (np.arange(30 + j % 11, dtype=np.int64) * 331 + j) \
            % (1 << min(aub, 31)) - (1 << min(aub - 1, 30))
        arts.append(("au", au_encode(8000, 1, smp2[:, None], aub),
                     au_decode))
        arts.append(("aiff", aiff_encode(8000, 1, smp2[:, None], aub,
                                         aifc_none=j % 2 == 0),
                     aiff_decode))
        arts.append(("pnm", (b"P6\n%d %d\n255\n" % (w, h))
                     + px, pnm_decode))
        arts.append(("ico", _ico(j), _ico_dec))
        arts.append(("mp4", _mp4(j), _mp4_dec))
        arts.append(("tiff", _tiff(j), _tiff_dec))
        arts.append(("flac", _flac(j), _flac_dec))
        arts.append(("ogg", _ogg(j), _ogg_dec))
        arts.append(("webp", _webp(j), _webp_dec))
    return arts[:N_ART]


def _webp(j: int) -> bytes:
    from snowflake_emulator_spark.operators.webp import (
        webp_encode_extended, webp_encode_lossless, webp_encode_lossy)

    w, h = 20 + j % 9, 12 + j % 7
    if j % 3 == 0:
        return webp_encode_lossy(w, h, pad=8 + j % 5)
    if j % 3 == 1:
        return webp_encode_lossless(w, h, alpha=j % 2 == 1)
    return webp_encode_extended(w, h, alpha=j % 2 == 1, anim=j % 4 == 3)


def _webp_dec(blob: bytes):
    from snowflake_emulator_spark.operators.webp import webp_info

    return webp_info(blob)


def _flac(j: int) -> bytes:
    from snowflake_emulator_spark.operators.oggflac import (
        _RATES, flac_encode_meta)

    return flac_encode_meta(_RATES[j % 4], 1 + j % 2, 16, 1000 + 37 * j,
                            n_comments=j % 5, with_comment=j % 2 == 0,
                            with_padding=j % 4 == 1)


def _flac_dec(blob: bytes):
    from snowflake_emulator_spark.operators.oggflac import flac_info

    return flac_info(blob)


def _ogg(j: int) -> bytes:
    from snowflake_emulator_spark.operators.oggflac import (
        _RATES, ogg_encode_stream)

    if j % 2 == 0:
        return ogg_encode_stream("vorbis", 1 + j % 2, _RATES[j % 4],
                                 800 + 23 * j, 1000 + j, 2 + j % 3)
    pre = 312 + j % 5
    return ogg_encode_stream("opus", 1 + j % 2, 48000,
                             960 * (4 + j % 7) + pre, 2000 + j,
                             2 + j % 3, pre_skip=pre)


def _ogg_dec(blob: bytes):
    from snowflake_emulator_spark.operators.oggflac import ogg_info

    return ogg_info(blob)


def _tiff(j: int) -> bytes:
    from snowflake_emulator_spark.operators.tiff import (
        _synth_page0, tiff_encode)

    pages = [_synth_page0(j, 6 + j % 5, 4 + j % 4)]
    if j % 2 == 1:
        pages.append({"width": 3, "height": 2, "photometric": 1,
                      "bits": [8], "spp": 1,
                      "data": bytes(((5 * j + 3 * t) % 256)
                                    for t in range(6))})
    return tiff_encode(pages, byte_order="II" if j % 2 == 0 else "MM")


def _tiff_dec(blob: bytes):
    from snowflake_emulator_spark.operators.tiff import tiff_decode

    return tiff_decode(blob)


def _mp4(j: int) -> bytes:
    from snowflake_emulator_spark.operators.video import mp4_encode

    fps = (24, 25, 30)[j % 3]
    return mp4_encode(
        b"isom" if j % 2 == 0 else b"mp42",
        160 + 16 * (j % 8), 96 + 16 * (j % 5), fps, 24 + j % 48,
        b"avc1" if j % 2 == 0 else b"hev1",
        audio=(b"mp4a", (44100, 48000)[j % 2], 32 + j % 16)
        if j % 3 != 1 else None,
        version=1 if j % 4 == 3 else 0,
        mdat_first=j % 5 == 1, with_uuid=j % 7 == 2,
        force64_free=j % 6 == 4)


def _mp4_dec(blob: bytes):
    from snowflake_emulator_spark.operators.video import mp4_info

    return mp4_info(blob)


def _ico(j: int) -> bytes:
    from snowflake_emulator_spark.operators.ico import _synth_image, ico_encode

    images = [_synth_image(j, 0, 8 + j % 5, 6 + j % 4)]
    for k in range(1, 1 + j % 3):
        images.append(_synth_image(j, k, 2 + k, 2))
    return ico_encode(images)


def _ico_dec(blob: bytes):
    from snowflake_emulator_spark.operators.ico import ico_decode

    return ico_decode(blob)


def _bmp24(w: int, h: int, j: int) -> bytes:
    stride = ((w * 3 + 3) // 4) * 4
    rows = bytearray()
    for y in range(h):
        for x in range(w):
            rows += bytes([(j + x) % 256, (j + y) % 256, (x * y) % 256])
        rows += b"\x00" * (stride - w * 3)
    pix_off = 54
    head = b"BM" + struct.pack("<IHHI", pix_off + len(rows), 0, 0, pix_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows),
                       2835, 2835, 0, 0)
    return head + info + bytes(rows)


def _mpeg(j: int) -> bytes:
    from snowflake_emulator_spark.operators.mpeg import (
        _SYNTH_SHAPES, mpeg_encode_headers)

    version, layer, br_idx, sr_idx = _SYNTH_SHAPES[j % 5]
    return mpeg_encode_headers(
        version, layer, br_idx, sr_idx, channels=2 - j % 2,
        n_frames=4 + j % 7,
        pad_of_frame=(lambda t: t % 2) if j % 3 == 2 else None,
        id3v2_size=20 + j % 30 if j % 3 == 0 else 0, id3v1=j % 4 == 1)


def _bmp_rle(w: int, h: int, j: int, bpp: int) -> bytes:
    from tests.test_bmp_pnm import _PAL16, _PAL256, _bmp, rle4_encode, rle8_encode

    mod = 256 if bpp == 8 else 16
    rows = [[(j + x // 2 + 3 * y) % mod for x in range(w)] for y in range(h)]
    if bpp == 8:
        return _bmp(w, h, 8, rle8_encode(rows), compression=1,
                    palette=_PAL256)
    return _bmp(w, h, 4, rle4_encode(rows), compression=2, palette=_PAL16)


def _subrect_gif(j: int) -> bytes:
    from tests.test_gif_composited import PAL, _build_gif, _frame, _gce

    w, h = 6 + j % 5, 5 + j % 4
    f1 = _frame(0, 0, w, h, bytes((x % 8) for x in range(w * h)))
    f2 = (_gce(j % 4, 0 if j % 2 else None)
          + _frame(1, 1, w - 2, h - 2,
                   bytes(((x + 1) % 8) for x in range((w - 2) * (h - 2)))))
    return _build_gif(w, h, PAL, 7, [f1, f2])


def main() -> None:
    sys.path.insert(0, "/root/repo/tests")
    sys.path.insert(0, "/root/repo")
    rng = random.Random(SEED)
    arts = build_artifacts(rng)
    crashes, hangs, survived, controlled = [], [], 0, 0
    total = 0
    for kind, blob, dec in arts:
        for m in range(MUTS):
            total += 1
            b = bytearray(blob)
            for _ in range(rng.randint(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            t0 = time.time()
            try:
                dec(bytes(b))
                survived += 1
            except ALLOWED:
                controlled += 1
            except Exception as e:  # noqa: BLE001
                crashes.append((kind, m, type(e).__name__, str(e)[:80]))
            if time.time() - t0 > MAX_SEC:
                hangs.append((kind, m, round(time.time() - t0, 1)))
    # the dispatch layer must behave the same on arbitrary bytes
    for i in range(200):
        total += 1
        blob = bytes(rng.randrange(256) for _ in range(rng.randint(0, 64)))
        try:
            decode_image(blob)
            survived += 1
        except ALLOWED:
            controlled += 1
        except Exception as e:  # noqa: BLE001
            crashes.append(("dispatch", i, type(e).__name__, str(e)[:80]))
    # WARC: gzip bombs and truncations must raise ValueError per-file
    import gzip
    for i in range(40):
        total += 1
        body = gzip.compress(bytes(rng.randrange(256)
                                   for _ in range(rng.randint(10, 400))))
        b = bytearray(body)
        for _ in range(rng.randint(1, 3)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            parse_warc(bytes(b))
            survived += 1
        except ALLOWED:
            controlled += 1
        except Exception as e:  # noqa: BLE001
            if "zlib" in type(e).__module__:
                controlled += 1
            else:
                crashes.append(("warc", i, type(e).__name__, str(e)[:80]))
    print(f"seed={SEED} artifacts={len(arts)} total_decodes={total} "
          f"controlled={controlled} survived={survived} "
          f"crashes={len(crashes)} hangs={len(hangs)}")
    for c in crashes[:20]:
        print("CRASH", c)
    for hg in hangs[:20]:
        print("HANG", hg)
    sys.exit(1 if crashes or hangs else 0)


if __name__ == "__main__":
    main()
