"""Stdlib media decoders (datapipe/multimodal.py): BMP/WAV byte-layout
round trips, exactness of the integer feature sums, and the error
taxonomy for unsupported/truncated inputs. The Spark-side operator
(media_features over mapInPandas) is driver-oracled end-to-end by the
multimodal_real_decode query; these tests pin the kernels."""

from __future__ import annotations

import struct

import pytest

from textract_demo_spark.datapipe.multimodal import (build_png,
                                                      decode_png,
    MediaDecodeError, _real_decode, build_bmp, build_wav, decode_bmp,
    decode_wav)


@pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (3, 2), (4, 1),
                                 (5, 4), (6, 3), (7, 2)])
def test_bmp_round_trip_gradient(w, h):
    px = [((x * 37 + y * 11) % 256, (x * 5 + y) % 256, (y * 91 + x) % 256)
          for y in range(h) for x in range(w)]
    got_w, got_h, sums = decode_bmp(build_bmp(w, h, px))
    assert (got_w, got_h) == (w, h)
    assert sums == [sum(p[i] for p in px) for i in range(3)]


def test_bmp_padding_not_counted():
    # width 2 -> 6 pixel bytes, stride 8: 2 padding bytes per row;
    # poison them and check sums are unchanged
    data = bytearray(build_bmp(2, 2, [(1, 2, 3)] * 4))
    (off,) = struct.unpack_from("<I", data, 10)
    stride = 8
    for y in range(2):
        data[off + y * stride + 6] = 0xFF
        data[off + y * stride + 7] = 0xFF
    assert decode_bmp(bytes(data))[2] == [4, 8, 12]


def test_bmp_rows_are_bottom_up():
    # 1x2: top pixel red, bottom pixel blue; on disk bottom row first
    data = build_bmp(1, 2, [(255, 0, 0), (0, 0, 255)])
    (off,) = struct.unpack_from("<I", data, 10)
    assert data[off:off + 3] == bytes((255, 0, 0))  # BGR of blue
    assert decode_bmp(data)[2] == [255, 0, 255]


def test_bmp_rejects():
    with pytest.raises(MediaDecodeError, match="not a BMP"):
        decode_bmp(b"PNG....")
    with pytest.raises(MediaDecodeError, match="truncated"):
        decode_bmp(build_bmp(4, 4, [(0, 0, 0)] * 16)[:-5])
    bad_bpp = bytearray(build_bmp(1, 1, [(0, 0, 0)]))
    struct.pack_into("<H", bad_bpp, 28, 8)
    with pytest.raises(MediaDecodeError, match="bpp=8"):
        decode_bmp(bytes(bad_bpp))


@pytest.mark.parametrize("nch", [1, 2])
def test_wav_round_trip(nch):
    n = 13
    samples = [((i * 2311) % 65536) - 32768 for i in range(n * nch)]
    ch, rate, got_n, sums = decode_wav(build_wav(nch, 44100, samples))
    assert (ch, rate, got_n) == (nch, 44100, n)
    assert sums == [sum(abs(samples[i * nch + c]) for i in range(n))
                    for c in range(nch)]


def test_wav_chunk_walk_skips_extra_chunks():
    # LIST chunk (odd size -> word alignment) between fmt and data
    base = build_wav(1, 8000, [5, -7, 9])
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad
    data = base[:fmt_end] + extra + base[fmt_end:]
    assert decode_wav(data) == (1, 8000, 3, [21])


def test_wav_rejects():
    with pytest.raises(MediaDecodeError, match="not a RIFF"):
        decode_wav(b"OggS....")
    with pytest.raises(MediaDecodeError, match="bits=8"):
        bad = bytearray(build_wav(1, 8000, [1]))
        struct.pack_into("<H", bad, 12 + 8 + 14, 8)
        decode_wav(bytes(bad))
    with pytest.raises(MediaDecodeError, match="missing fmt or data"):
        decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


def test_real_decode_dispatch():
    bmp = _real_decode(build_bmp(2, 2, [(51, 102, 153)] * 4))
    assert bmp == [[0.2, 0.4, 0.6, 0.0, 0.0, 0.0, 0.0, 0.0]]
    wav = _real_decode(build_wav(1, 8000, [16384, -16384]))
    assert wav[0][0] == 0.5
    png = _real_decode(build_png(2, 2, [(51, 102, 153)] * 4))
    assert png == [[0.2, 0.4, 0.6, 0.0, 0.0, 0.0, 0.0, 0.0]]
    with pytest.raises(NotImplementedError, match="codec"):
        _real_decode(b"\xff\xd8\xff\xe0 jpeg-ish")


PX = [((x * 37 + y * 11) % 256, (x * 5 + y * 91) % 256,
       (x * 201 + y * 3) % 256) for y in range(3) for x in range(5)]
PX_SUMS = [sum(p[c] for p in PX) for c in range(3)]


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter_rgb(ft):
    assert decode_png(build_png(5, 3, PX, filter_type=ft)) == \
        (5, 3, PX_SUMS)


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter_gray(ft):
    g = [(x * 7 + y * 3) % 256 for y in range(3) for x in range(5)]
    assert decode_png(build_png(5, 3, g, color_type=0,
                                filter_type=ft)) == (5, 3, [sum(g)] * 3)


def test_png_rejects():
    with pytest.raises(MediaDecodeError, match="not a PNG"):
        decode_png(b"BM not a png")
    good = bytearray(build_png(2, 2, [(1, 2, 3)] * 4))
    # corrupt one IDAT byte -> CRC must catch it
    idat_at = bytes(good).find(b"IDAT")
    good[idat_at + 6] ^= 0xFF
    with pytest.raises(MediaDecodeError, match="CRC"):
        decode_png(bytes(good))
    # file cut mid-IDAT -> truncated chunk
    whole = build_png(2, 2, [(1, 2, 3)] * 4)
    cut = whole.find(b"IDAT") + 6
    with pytest.raises(MediaDecodeError, match="truncated|missing"):
        decode_png(whole[:cut])


def test_png_bad_zlib_stream_rejected():
    sig = b"\x89PNG\r\n\x1a\n"
    import struct as st
    import zlib as zl

    def chunk(t, d):
        return st.pack(">I", len(d)) + t + d + st.pack(
            ">I", zl.crc32(t + d))
    ihdr = st.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    data = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", b"notzlib") \
        + chunk(b"IEND", b"")
    with pytest.raises(MediaDecodeError, match="zlib"):
        decode_png(data)


def test_png_geometry_mismatch_rejected():
    import struct as st
    import zlib as zl
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(t, d):
        return st.pack(">I", len(d)) + t + d + st.pack(
            ">I", zl.crc32(t + d))
    ihdr = st.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)  # needs 2*(1+6)
    idat = zl.compress(b"\x00" * 5)  # wrong length
    with pytest.raises(MediaDecodeError, match="geometry"):
        decode_png(sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
                   + chunk(b"IEND", b""))


def test_png_multiple_idat_chunks_concatenate():
    import struct as st
    import zlib as zl
    whole = build_png(5, 3, PX, filter_type=1)
    # split the single IDAT into two chunks at an arbitrary byte
    at = whole.find(b"IDAT")
    (ln,) = st.unpack_from(">I", whole, at - 4)
    body = whole[at + 4:at + 4 + ln]
    pre, post = whole[:at - 4], whole[at + 8 + ln:]

    def chunk(t, d):
        return st.pack(">I", len(d)) + t + d + st.pack(
            ">I", zl.crc32(t + d))
    rebuilt = (pre + chunk(b"IDAT", body[:7]) + chunk(b"IDAT", body[7:])
               + post)
    assert decode_png(rebuilt) == (5, 3, PX_SUMS)


def test_png_media_features_spark(spark):
    from textract_demo_spark.datapipe.multimodal import media_features
    from pyspark.sql import functions as F
    rows = [(1, build_png(2, 2, [(100, 150, 200)] * 4), "image/png"),
            (2, build_png(2, 2, [10] * 4, color_type=0), "image/png")]
    df = spark.createDataFrame(
        rows, "doc_id LONG, media BINARY, media_type STRING")
    got = {r["doc_id"]: r for r in media_features(df).collect()}
    assert (got[1]["ch0_milli"], got[1]["ch1_milli"],
            got[1]["ch2_milli"]) == (100000, 150000, 200000)
    assert (got[2]["ch0_milli"], got[2]["ch1_milli"],
            got[2]["ch2_milli"]) == (10000, 10000, 10000)
