"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, decoded/feature-extracted via Arrow-
batched Pandas UDFs over mapInPandas.

Two decode tiers:

* **Real stdlib decoders** for honest uncompressed formats —
  ``decode_bmp`` (24-bit BI_RGB Windows bitmaps: bottom-up rows,
  4-byte stride padding, BGR channel order) and ``decode_wav``
  (RIFF/WAVE PCM-16: chunk walk, interleaved little-endian frames).
  These need no codec libraries and back the ``media_features``
  operator end-to-end.
* **PNG is a real compressed decoder** — the codec is zlib, which IS
  stdlib: ``decode_png`` parses chunks (CRC-verified), inflates the
  IDAT stream and implements all five scanline filters (None/Sub/Up/
  Average/Paeth) for 8-bit truecolor and grayscale; ``build_png``
  can emit any filter type, so the decoder's reconstruction paths
  are testable byte-for-byte.
* **Remaining compressed formats** (JPEG/MP3/H.264) need entropy/
  transform codecs this container lacks; for those,
  ``extract_frames`` keeps the deterministic byte-statistics
  stand-in behind ``decode_enabled`` — swap in a PIL/ffmpeg kernel
  on a full cluster. ``_real_decode`` handles BMP/WAV/PNG and raises
  with a clear message for anything else.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

decode_enabled = False  # flip when codec libs exist on the cluster

MEDIA_SCHEMA = ("doc_id long, media_type string, n_bytes long, "
                "content_hash string")
FRAME_SCHEMA = ("doc_id long, frame_idx int, n_bytes long, "
                "feature array<float>")

N_FEATURES = 8
FRAME_STRIDE = 256  # bytes per fake "frame"


def attach_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Treat the payload as an opaque binary blob with typed metadata
    (the multimodal column convention: binary + media_type +
    size + content hash; all JVM-side)."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("media"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(F.encode(F.col(text_col), "UTF-8")).cast("long")
         .alias("n_bytes"),
        F.md5(F.encode(F.col(text_col), "UTF-8")).alias("content_hash"))


class MediaDecodeError(ValueError):
    pass


def build_bmp(width: int, height: int,
              pixels_rgb: list[tuple[int, int, int]]) -> bytes:
    """Serialize a 24-bit BI_RGB bitmap (row-major top-down input;
    stored bottom-up with 4-byte row stride, per the format)."""
    if len(pixels_rgb) != width * height:
        raise ValueError("pixel count != width*height")
    stride = (width * 3 + 3) // 4 * 4
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        for x in range(width):
            r, g, b = pixels_rgb[y * width + x]
            row += bytes((b, g, r))  # BGR on disk
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    pixel_data = b"".join(rows)
    off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", off + len(pixel_data), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                            len(pixel_data), 2835, 2835, 0, 0))
    return header + pixel_data


def decode_bmp(data: bytes) -> tuple[int, int, list[int]]:
    """Parse a 24-bit uncompressed BMP; returns (width, height,
    [sum_r, sum_g, sum_b]) as exact integers (padding excluded)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise MediaDecodeError("not a BMP")
    (off,) = struct.unpack_from("<I", data, 10)
    dib, width, height, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", data, 14)
    if dib < 40:
        raise MediaDecodeError(f"unsupported DIB header size {dib}")
    if bpp != 24 or comp != 0:
        raise MediaDecodeError(f"unsupported BMP (bpp={bpp}, comp={comp})")
    if width <= 0 or height <= 0:
        # top-down (negative height) is legal but out of scope here
        raise MediaDecodeError("unsupported BMP dimensions")
    stride = (width * 3 + 3) // 4 * 4
    need = off + stride * height
    if len(data) < need:
        raise MediaDecodeError("truncated BMP pixel array")
    sums = [0, 0, 0]  # r, g, b
    for y in range(height):
        base = off + y * stride
        for x in range(width):
            p = base + x * 3
            sums[2] += data[p]       # B
            sums[1] += data[p + 1]   # G
            sums[0] += data[p + 2]   # R
    return width, height, sums


def build_wav(channels: int, sample_rate: int,
              samples: list[int]) -> bytes:
    """Serialize PCM-16 RIFF/WAVE; ``samples`` is interleaved
    (frame-major) int16 values."""
    if len(samples) % channels:
        raise ValueError("sample count not a multiple of channels")
    payload = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * channels * 2, channels * 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload)


def decode_wav(data: bytes) -> tuple[int, int, int, list[int]]:
    """Parse PCM-16 RIFF/WAVE via the chunk walk; returns
    (channels, sample_rate, frames_per_channel, [sum_abs per channel])
    as exact integers."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise MediaDecodeError("not a RIFF/WAVE file")
    pos = 12
    channels = rate = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise MediaDecodeError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise MediaDecodeError("short fmt chunk")
            audio_fmt, channels, rate, _br, _ba, bits = \
                struct.unpack_from("<HHIIHH", body)
            if audio_fmt != 1 or bits != 16:
                raise MediaDecodeError(
                    f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if channels is None or payload is None:
        raise MediaDecodeError("missing fmt or data chunk")
    n = len(payload) // (2 * channels)
    sums = [0] * channels
    for i in range(n):
        for c in range(channels):
            (v,) = struct.unpack_from("<h", payload, (i * channels + c) * 2)
            sums[c] += abs(v)
    return channels, rate, n, sums


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def build_png(width: int, height: int, pixels: list,
              color_type: int = 2, filter_type: int = 0) -> bytes:
    """Serialize an 8-bit PNG — truecolor RGB (``color_type=2``,
    pixels = [(r,g,b), ...]) or grayscale (``color_type=0``, pixels =
    [v, ...]), row-major. ``filter_type`` applies that scanline
    filter to EVERY row (0=None 1=Sub 2=Up 3=Average 4=Paeth), which
    exercises the decoder's corresponding reconstruction path."""
    ch = 3 if color_type == 2 else 1
    if len(pixels) != width * height:
        raise ValueError("pixel count != width*height")
    raw_rows = []
    for y in range(height):
        row = bytearray()
        for x in range(width):
            p = pixels[y * width + x]
            row += bytes(p) if ch == 3 else bytes((p,))
        raw_rows.append(bytes(row))
    out_rows = []
    prev = b"\x00" * (width * ch)
    for raw in raw_rows:
        f = bytearray([filter_type])
        for x in range(len(raw)):
            left = raw[x - ch] if x >= ch else 0
            up = prev[x]
            upleft = prev[x - ch] if x >= ch else 0
            if filter_type == 0:
                pred = 0
            elif filter_type == 1:
                pred = left
            elif filter_type == 2:
                pred = up
            elif filter_type == 3:
                pred = (left + up) // 2
            elif filter_type == 4:
                pred = _paeth(left, up, upleft)
            else:
                raise ValueError(f"bad filter type {filter_type}")
            f.append((raw[x] - pred) & 0xFF)
        out_rows.append(bytes(f))
        prev = raw
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(out_rows), 6)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


def decode_png(data: bytes) -> tuple[int, int, list[int]]:
    """Parse an 8-bit truecolor or grayscale PNG (no interlace, no
    palette): CRC-checked chunk walk, zlib inflate, full five-filter
    scanline reconstruction. Returns (width, height,
    [sum_r, sum_g, sum_b]) as exact integers — grayscale reports the
    same sum on all three channels (r=g=b by definition)."""
    if data[:8] != _PNG_SIG:
        raise MediaDecodeError("not a PNG")
    pos, n = 8, len(data)
    width = height = color_type = None
    idat = bytearray()
    while pos + 8 <= n:
        (clen,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + clen]
        if len(body) < clen or pos + 12 + clen > n:
            raise MediaDecodeError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + clen)
        if crc != zlib.crc32(ctype + body):
            raise MediaDecodeError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, ilace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8 or color_type not in (0, 2) or comp or filt \
                    or ilace:
                raise MediaDecodeError(
                    f"unsupported PNG (depth={depth},"
                    f" color_type={color_type}, interlace={ilace})")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if width is None or not idat:
        raise MediaDecodeError("missing IHDR or IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise MediaDecodeError(f"bad IDAT zlib stream: {exc}") from exc
    ch = 3 if color_type == 2 else 1
    rowlen = width * ch
    if len(raw) != (rowlen + 1) * height:
        raise MediaDecodeError("IDAT length != scanline geometry")
    sums = [0, 0, 0]
    prev = bytearray(rowlen)
    for y in range(height):
        base = y * (rowlen + 1)
        ftype = raw[base]
        cur = bytearray(raw[base + 1:base + 1 + rowlen])
        if ftype == 1:
            for x in range(ch, rowlen):
                cur[x] = (cur[x] + cur[x - ch]) & 0xFF
        elif ftype == 2:
            for x in range(rowlen):
                cur[x] = (cur[x] + prev[x]) & 0xFF
        elif ftype == 3:
            for x in range(rowlen):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (cur[x] + (left + prev[x]) // 2) & 0xFF
        elif ftype == 4:
            for x in range(rowlen):
                left = cur[x - ch] if x >= ch else 0
                upleft = prev[x - ch] if x >= ch else 0
                cur[x] = (cur[x] + _paeth(left, prev[x], upleft)) & 0xFF
        elif ftype != 0:
            raise MediaDecodeError(f"bad scanline filter {ftype}")
        if ch == 3:
            for x in range(0, rowlen, 3):
                sums[0] += cur[x]
                sums[1] += cur[x + 1]
                sums[2] += cur[x + 2]
        else:
            s = sum(cur)
            sums[0] += s
            sums[1] += s
            sums[2] += s
        prev = cur
    return width, height, sums


MEDIA_FEATURE_SCHEMA = (
    "doc_id long, media_type string, width long, height long, "
    "n_samples long, sample_rate long, "
    "ch0_milli long, ch1_milli long, ch2_milli long")


def media_features(media: DataFrame, strict: bool = True) -> DataFrame:
    """REAL media decode over binary columns (mapInPandas, Arrow
    batches): dispatch on ``media_type`` — ``image/bmp`` and
    ``image/png`` (zlib inflate + five-filter reconstruction) decode
    to per-channel mean pixel values (milli-units, exact integers:
    1000*sum//count), ``audio/wav`` to per-channel mean absolute
    PCM amplitude. Unknown media types raise (``strict=True``) or
    pass through with -1 features. Channels beyond the format's
    (mono WAV) report -1.

    Scale shape: one pass over the bytes, zero shuffles, output is a
    narrow fixed-width row per blob — the pattern a 100-TB frame/
    feature-extraction stage needs (the expensive work is in the
    Arrow batch kernel; partitioning is whatever the scan gave us)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "media_type", "width",
                                    "height", "n_samples", "sample_rate",
                                    "ch0_milli", "ch1_milli", "ch2_milli")}
            for doc_id, mtype, blob in zip(pdf["doc_id"],
                                           pdf["media_type"],
                                           pdf["media"]):
                data = bytes(blob) if blob is not None else b""
                w = h = n = rate = 0
                ch = [-1, -1, -1]
                if mtype == "image/bmp":
                    w, h, sums = decode_bmp(data)
                    ch = [(1000 * s) // (w * h) for s in sums]
                elif mtype == "image/png":
                    w, h, sums = decode_png(data)
                    ch = [(1000 * s) // (w * h) for s in sums]
                elif mtype == "audio/wav":
                    nch, rate, n, sums = decode_wav(data)
                    for c in range(min(nch, 3)):
                        ch[c] = (1000 * sums[c]) // max(n, 1)
                elif strict:
                    raise MediaDecodeError(
                        f"no stdlib decoder for {mtype!r}; compressed"
                        " formats need codec libraries (extract_frames"
                        " offers the byte-statistics stand-in)")
                rows["doc_id"].append(doc_id)
                rows["media_type"].append(mtype)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_samples"].append(n)
                rows["sample_rate"].append(rate)
                rows["ch0_milli"].append(ch[0])
                rows["ch1_milli"].append(ch[1])
                rows["ch2_milli"].append(ch[2])
            yield pd.DataFrame(rows)

    return media.select("doc_id", "media_type", "media").mapInPandas(
        run, schema=MEDIA_FEATURE_SCHEMA)


def _real_decode(data: bytes) -> list[list[float]]:
    """Frame features via the stdlib decoders (BMP/PNG/WAV); other
    compressed formats still need codec libraries."""
    if data[:2] == b"BM":
        w, h, sums = decode_bmp(data)
        feats = [round(s / (255.0 * w * h), 6) for s in sums]
        return [feats + [0.0] * (N_FEATURES - len(feats))]
    if data[:8] == _PNG_SIG:
        w, h, sums = decode_png(data)
        feats = [round(s / (255.0 * w * h), 6) for s in sums]
        return [feats + [0.0] * (N_FEATURES - len(feats))]
    if data[:4] == b"RIFF":
        nch, _rate, n, sums = decode_wav(data)
        feats = [round(s / (32768.0 * max(n, 1)), 6) for s in sums]
        return [feats[:N_FEATURES]
                + [0.0] * max(N_FEATURES - len(feats), 0)]
    raise NotImplementedError(
        "media decode beyond BMP/PNG/WAV requires codec libraries"
        " (PIL/ffmpeg) not present in this container — JPEG/MP3/H.264"
        " need entropy/transform codecs; zlib-backed PNG is handled"
        " by decode_png")


def _fake_features(data: bytes) -> list[list[float]]:
    """Deterministic stand-in: one 'frame' per FRAME_STRIDE bytes,
    features = normalized byte statistics of the frame window."""
    frames = []
    for off in range(0, max(len(data), 1), FRAME_STRIDE):
        win = data[off:off + FRAME_STRIDE] or b"\x00"
        feats = []
        for j in range(N_FEATURES):
            sl = win[j::N_FEATURES] or b"\x00"
            feats.append(round(sum(sl) / (255.0 * len(sl)), 6))
        frames.append(feats)
    return frames


def extract_frames(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary media: batch of
    (doc_id, media) -> rows of (doc_id, frame_idx, n_bytes, feature).
    Arrow-batched; the kernel sees real bytes."""
    kernel = _real_decode if decode_enabled else _fake_features

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "n_bytes": [],
                   "feature": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                data = bytes(blob) if blob is not None else b""
                for i, feats in enumerate(kernel(data)):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["n_bytes"].append(len(data))
                    out["feature"].append(feats)
            yield pd.DataFrame(out)

    return media.select("doc_id", "media").mapInPandas(
        run, schema=FRAME_SCHEMA)
