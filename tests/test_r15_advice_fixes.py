"""r15 ADVICE regressions: JPEG non-interleaved baseline raises,
progressive truncated-DQT error contract, WARC gzip bomb cap,
GIF >256-entry palette rejection, edge vertical-tab trim parity."""
import struct
import zlib

import numpy as np
import pytest

from snowflake_emulator_spark.operators.gif import gif_encode
from snowflake_emulator_spark.operators.jpeg import jpeg_decode, jpeg_encode
from snowflake_emulator_spark.sources.warc import _gunzip_members


def _color_planes(w: int, h: int):
    Y = (np.arange(w * h, dtype=np.float64).reshape(h, w) % 200) + 20
    Cb = np.full((h, w), 100.0)
    Cr = np.full((h, w), 140.0)
    return Y, Cb, Cr


def test_baseline_non_interleaved_never_silent():
    """The r14 ADVICE defect: a 3-component baseline frame whose SOS
    lists only one component silently decoded as grayscale of that
    component. r15 implements the spec-valid non-interleaved
    sequential layout for real — so (a) a VALID per-component-scan
    stream decodes EQUAL to its interleaved twin, and (b) a stream
    whose single-component SOS fronts interleaved entropy data (the
    original silent-wrong-output shape) raises instead of returning
    grayscale."""
    w, h = 16, 16
    Y, Cb, Cr = _color_planes(w, h)
    inter = jpeg_encode(w, h, [Y, Cb, Cr], [(1, 1)] * 3)
    noninter = jpeg_encode(w, h, [Y, Cb, Cr], [(1, 1)] * 3,
                           non_interleaved=True)
    assert jpeg_decode(inter) == jpeg_decode(noninter)
    # 4:2:0 subsampled variant too
    cw, ch = (w + 1) // 2, (h + 1) // 2
    i420 = jpeg_encode(w, h, [Y, Cb[:ch, :cw], Cr[:ch, :cw]],
                       [(2, 2), (1, 1), (1, 1)])
    n420 = jpeg_encode(w, h, [Y, Cb[:ch, :cw], Cr[:ch, :cw]],
                       [(2, 2), (1, 1), (1, 1)], non_interleaved=True)
    assert jpeg_decode(i420) == jpeg_decode(n420)

    blob = bytearray(inter)
    sos = blob.find(b"\xff\xda")
    slen = struct.unpack(">H", blob[sos + 2:sos + 4])[0]
    ns = blob[sos + 4]
    assert ns == 3
    comp1 = bytes(blob[sos + 5:sos + 7])          # (cs, Td/Ta) for comp 1
    tail = bytes(blob[sos + 4 + 1 + 2 * ns:sos + 2 + slen])  # Ss/Se/AhAl
    new_seg = b"\xff\xda" + struct.pack(">H", 2 + 1 + 2 + len(tail)) \
        + bytes([1]) + comp1 + tail
    mutated = bytes(blob[:sos]) + new_seg + bytes(blob[sos + 2 + slen:])
    with pytest.raises(ValueError):
        jpeg_decode(mutated)


def test_non_interleaved_missing_scan_raises():
    """A non-interleaved stream truncated after its first scan must
    name the undecoded components."""
    w, h = 16, 16
    Y, Cb, Cr = _color_planes(w, h)
    blob = jpeg_encode(w, h, [Y, Cb, Cr], [(1, 1)] * 3,
                       non_interleaved=True)
    # cut at the second SOS, then terminate with EOI
    first_sos = blob.find(b"\xff\xda")
    second_sos = blob.find(b"\xff\xda", first_sos + 2)
    assert second_sos > first_sos
    with pytest.raises(ValueError, match=r"components \[2, 3\]"):
        jpeg_decode(blob[:second_sos] + b"\xff\xd9")


def test_progressive_truncated_dqt_raises_valueerror():
    """A truncated 16-bit DQT between progressive scans must raise
    ValueError (the documented contract), not struct.error."""
    w, h = 16, 16
    Y, Cb, Cr = _color_planes(w, h)
    blob = bytes(jpeg_encode(w, h, [Y, Cb, Cr], [(1, 1)] * 3,
                             progressive=True))
    last_sos = blob.rfind(b"\xff\xda")
    assert last_sos > 0
    # drop the final scan; splice in a DQT whose declared segment length
    # (5) is in-bounds but whose Pq=1 payload needs 128 bytes — the body
    # is only 3 bytes, so the new bounds check must fire
    mutated = (blob[:last_sos] + b"\xff\xdb\x00\x05\x10\x01\x02"
               + b"\xff\xd9")
    with pytest.raises(ValueError, match="truncated DQT"):
        jpeg_decode(mutated)


def test_gunzip_cap_rejects_decompression_bomb():
    bomb = zlib.compress(b"\x00" * (4 << 20), 9)
    # wrap as a gzip member
    import gzip
    gz = gzip.compress(b"\x00" * (4 << 20))
    with pytest.raises(ValueError, match="bomb"):
        _gunzip_members(gz, cap=1 << 20)
    assert bomb  # silence unused warning path


def test_gunzip_cap_passes_normal_multimember():
    import gzip
    a, b = gzip.compress(b"hello "), gzip.compress(b"world")
    assert _gunzip_members(a + b) == b"hello world"
    assert _gunzip_members(b"plain bytes") == b"plain bytes"


def test_gif_palette_over_256_raises():
    pal = [(i % 256, 0, 0) for i in range(257)]
    with pytest.raises(ValueError, match="max is 256"):
        gif_encode(2, 1, [(b"\x00\x01", pal)])


def test_edge_vertical_tab_trim_matches_duckdb():
    """The edge-trim regex must strip \\x0b identically in Spark (Java
    regex) and the DuckDB oracle replay (RE2) — \\s differs between the
    two engines, the explicit class must not."""
    import duckdb

    from snowflake_emulator_spark.inventory import _html_chain_sql
    sql = _html_chain_sql("s")
    probe = "\x0b\t hello world \x0b\n"
    got = duckdb.sql(
        f"SELECT {sql} AS t FROM (SELECT ? AS s)", params=[probe]
    ).fetchone()[0]
    assert got == "hello world"


def test_edge_vertical_tab_trim_spark_side(spark):
    from pyspark.sql import functions as F

    from snowflake_emulator_spark.operators.textstats import html_to_text
    df = spark.createDataFrame([("\x0b\t hi there \x0b\n",)], ["s"])
    got = df.select(html_to_text(F.col("s")).alias("t")).collect()[0].t
    assert got == "hi there"
