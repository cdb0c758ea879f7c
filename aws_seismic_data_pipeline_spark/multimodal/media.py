"""Multimodal (image/audio/video) columns as opaque binary + metadata.

North-star capability: a 100 TB training-data pipeline carries media as
opaque ``binary`` columns with typed metadata, decoded/transformed by
Arrow-batched Python stages. Two codec paths, one plumbing:

- ``real_decode`` is a REAL stdlib codec for uncompressed RIFF/WAVE
  containers (header chunk walk + 16-bit PCM), 24-bit BMP, and —
  genuinely compressed — 8-bit truecolor PNG (CRC-verified chunk walk,
  zlib inflate, all five inverse scanline filters) and indexed GIF
  (real LZW: growing code widths, KwKwK case, dictionary resets);
  ``mm_decode_real`` / ``mm_decode_real_image`` / ``mm_decode_real_png``
  / ``mm_decode_real_gif`` run it end to
  end over generated-in-engine payloads with exact oracles. Formats
  whose codecs genuinely need external libraries (JPEG, H.264 —
  Pillow/ffmpeg, absent from this container) raise ValueError;
- ``fake_decode`` is a clearly-marked deterministic fake (metadata
  derived from md5(payload)) standing in for those compressed-format
  codecs, so the distributed plumbing — schema, binary payload
  handling, Arrow batch shape, ``mapInPandas`` signatures,
  partitioning — is oracle-checkable for the image/video family too.

The fixtures ship no media table; ``media_frame`` synthesizes one by
treating each document's UTF-8 bytes as an opaque payload — the engine
never looks at the bytes except through the decode kernel, exactly as
it would treat miniSEED/JPEG blobs (the reference ships miniSEED bytes
around without ever decoding them — /root/reference/app.py:296-303).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_seismic_data_pipeline_spark.catalog import load_table, spread_dense
from aws_seismic_data_pipeline_spark.registry import register

FORMATS = ("jpeg", "png", "webp", "gif")

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("format", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
    ]
)


#: WAV generation parameter space (deterministic per media_id)
WAV_RATES = (8000, 16000, 22050, 44100)


def wav_payload(media_id: int) -> bytes:
    """Deterministic REAL WAV payload: a canonical RIFF/WAVE container
    (fmt + data chunks) holding 16-bit LE PCM whose parameters and
    sample values derive from ``media_id`` alone — so a DuckDB oracle
    can recompute the expected decode output without the bytes, while
    the Spark path must round-trip the actual container format."""
    import struct

    import numpy as np

    rate = WAV_RATES[media_id % len(WAV_RATES)]
    n_channels = 1 + (media_id % 2)
    n_frames = 300 + (media_id % 40) * 10
    n_samples = n_frames * n_channels
    # vectorized: the benched decode slot must time the codec round
    # trip, not per-element Python arithmetic
    pcm = (
        ((media_id * 31 + np.arange(n_samples, dtype=np.int64) * 7) % 65536)
        - 32768
    ).astype("<i2").tobytes()
    block_align = n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, rate, rate * block_align, block_align, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )


def bmp_payload(media_id: int) -> bytes:
    """Deterministic REAL BMP payload: a canonical 24-bit uncompressed
    BITMAPINFOHEADER image whose dimensions and pixel bytes derive from
    ``media_id`` alone (flat pixel-byte j → (id*7 + j*5) % 256, row
    padding per the BMP 4-byte rule) — the image sibling of
    ``wav_payload``."""
    import struct

    import numpy as np

    w = 4 + media_id % 13
    h = 3 + media_id % 7
    row = w * 3
    pad = (4 - row % 4) % 4
    px = (
        (media_id * 7 + np.arange(w * h * 3, dtype=np.int64) * 5) % 256
    ).astype(np.uint8).tobytes()
    body = b"".join(
        px[r * row : (r + 1) * row] + b"\x00" * pad for r in range(h)
    )
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return header + info + body


def png_payload(media_id: int) -> bytes:
    """Deterministic REAL PNG payload: an 8-bit truecolor (RGB) PNG
    whose dimensions and raw pixel bytes derive from ``media_id`` alone
    (pixel byte j → (id·11 + j·3) % 256). Unlike the WAV/BMP siblings
    this is a genuinely COMPRESSED container: scanlines are filtered —
    the filter type CYCLES r % 5 through None/Sub/Up/Average/Paeth so
    every inverse filter in the decoder is load-bearing — then
    zlib-deflated into IDAT, with CRC-32 on every chunk. All stdlib
    (zlib, struct): the one compressed image format that needs no
    external codec."""
    import struct
    import zlib

    import numpy as np

    w = 4 + media_id % 13
    h = 3 + media_id % 7
    bpp = 3
    raw = (
        (media_id * 11 + np.arange(w * h * bpp, dtype=np.int64) * 3) % 256
    ).astype(np.uint8)
    rows = raw.reshape(h, w * bpp)
    out = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int64)
    for r in range(h):
        line = rows[r].astype(np.int64)
        ftype = r % 5
        a = np.concatenate([np.zeros(bpp, dtype=np.int64), line[:-bpp]])
        c = np.concatenate([np.zeros(bpp, dtype=np.int64), prev[:-bpp]])
        if ftype == 0:
            filt = line
        elif ftype == 1:
            filt = (line - a) % 256
        elif ftype == 2:
            filt = (line - prev) % 256
        elif ftype == 3:
            filt = (line - (a + prev) // 2) % 256
        else:
            p = a + prev - c
            pa, pb, pc = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pred = np.where(
                (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, prev, c)
            )
            filt = (line - pred) % 256
        out.append(ftype)
        out.extend(filt.astype(np.uint8).tobytes())
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(dec: bytes, w: int, h: int, bpp: int) -> bytes:
    """Invert PNG scanline filtering: the decompressed IDAT stream is
    h lines of (filter_byte + w·bpp filtered bytes); reconstruct the
    raw pixel bytes per the spec's five inverse filters. Sub/Average/
    Paeth carry a left-neighbor dependency, so each line walks its
    bytes sequentially (lines themselves vectorize over numpy in the
    Up/None cases; fixture images are tiny either way — a production
    image pipeline hands this to a native codec, the point here is the
    spec-exact stdlib reference implementation)."""
    stride = w * bpp
    if len(dec) != h * (stride + 1):
        raise ValueError("malformed PNG: IDAT length mismatch")
    out = bytearray()
    prev = bytearray(stride)
    for r in range(h):
        ftype = dec[r * (stride + 1)]
        line = bytearray(dec[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        if ftype == 0:
            pass
        elif ftype == 1:
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ftype == 4:
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"malformed PNG: unknown filter type {ftype}")
        out.extend(line)
        prev = line
    return bytes(out)


def _lzw_encode(data: bytes, min_code_size: int = 8) -> bytes:
    """GIF-variant LZW compression (clear/end codes, 9→12-bit growing
    widths, dictionary reset at 4096) — the real algorithm, not the
    'uncompressed GIF' literal-code trick, so the decoder's dictionary
    reconstruction is load-bearing. Width bump: after assigning code
    2^cs the NEXT emission needs cs+1 bits (giflib behavior)."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    by = bytearray()
    acc = 0
    nacc = 0

    # accumulator bit packing: O(1) amortized per CODE, not per bit —
    # the per-bit list form cost ~7 s on the sf0.1 decode slot
    def emit(code: int, cs: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += cs
        while nacc >= 8:
            by.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    table = {bytes([i]): i for i in range(1 << min_code_size)}
    next_code = end + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    w = b""
    for k in data:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(1 << min_code_size)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = bytes([k])
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    if nacc:
        by.append(acc & 0xFF)
    return bytes(by)


def _lzw_decode(data: bytes, min_code_size: int = 8) -> bytes:
    """GIF-variant LZW inflate: LSB-first growing-width codes,
    the KwKwK self-reference case, dictionary reset on clear. The
    width bump fires one ASSIGNMENT earlier than the encoder's — the
    decoder performs assignment a_i while processing code e_{i+1},
    whose bits were already read, so e_{i+1}'s width must come from
    a_{i-1} (the classic off-by-one; the prototype's first run emitted
    'invalid code 516' with symmetric conditions)."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    pos = 0
    acc = 0
    nacc = 0

    def read(cs: int) -> int:
        nonlocal pos, acc, nacc
        while nacc < cs:
            if pos >= len(data):
                raise ValueError("malformed GIF: truncated LZW stream")
            acc |= data[pos] << nacc
            pos += 1
            nacc += 8
        v = acc & ((1 << cs) - 1)
        acc >>= cs
        nacc -= cs
        return v

    out = bytearray()
    table: dict[int, bytes] = {}
    next_code = end + 1
    code_size = min_code_size + 1
    prev: bytes | None = None
    while True:
        code = read(code_size)
        if code == clear:
            table, next_code = {}, end + 1
            code_size, prev = min_code_size + 1, None
            continue
        if code == end:
            break
        if code < clear:
            entry = bytes([code])
        elif code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"malformed GIF: invalid LZW code {code}")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return bytes(out)


def gif_payload(media_id: int) -> bytes:
    """Deterministic REAL GIF87a payload: an 8-bit indexed image over a
    256-entry grayscale global palette, pixel index j → (id·13 + j·7) %
    256, REALLY LZW-compressed (fixture dimensions give 1.2–2.7k
    pixels, so the code stream crosses at least one width bump).
    The dictionary-coding sibling of ``png_payload``'s deflate."""
    import struct

    import numpy as np

    w = 40 + media_id % 13
    h = 30 + media_id % 7
    idx = (
        (media_id * 13 + np.arange(w * h, dtype=np.int64) * 7) % 256
    ).astype(np.uint8).tobytes()
    lzw = _lzw_encode(idx)
    sub = b"".join(
        bytes([min(255, len(lzw) - i)]) + lzw[i : i + 255]
        for i in range(0, len(lzw), 255)
    )
    palette = bytes(c for i in range(256) for c in (i, i, i))
    return (
        b"GIF87a"
        + struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
        + palette
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([8])
        + sub
        + b"\x00"
        + b"\x3b"
    )


def gif_animation_payload(media_id: int) -> bytes:
    """Deterministic REAL multi-frame GIF: 2 + id%4 frames in one
    GIF87a container, frame f's pixel index j → (id·13 + f·31 + j·7) %
    256, each frame independently LZW-compressed — the closest thing
    to a VIDEO container stdlib can express (sequence of coded frames
    sharing one header/palette), exercising the decoder's multi-block
    walk rather than first-block-and-return."""
    import struct

    import numpy as np

    w = 24 + media_id % 9
    h = 18 + media_id % 5
    n_frames = 2 + media_id % 4
    palette = bytes(c for i in range(256) for c in (i, i, i))
    out = bytearray(
        b"GIF87a" + struct.pack("<HHBBB", w, h, 0xF7, 0, 0) + palette
    )
    for f in range(n_frames):
        idx = (
            (media_id * 13 + f * 31 + np.arange(w * h, dtype=np.int64) * 7)
            % 256
        ).astype(np.uint8).tobytes()
        lzw = _lzw_encode(idx)
        sub = b"".join(
            bytes([min(255, len(lzw) - i)]) + lzw[i : i + 255]
            for i in range(0, len(lzw), 255)
        )
        out += (
            b"\x2c"
            + struct.pack("<HHHHB", 0, 0, w, h, 0)
            + bytes([8])
            + sub
            + b"\x00"
        )
    out += b"\x3b"
    return bytes(out)


def real_decode_frames(payload: bytes) -> dict:
    """Multi-frame GIF decode: walk EVERY image block (the animation
    case ``real_decode`` truncates to its first frame), returning the
    shared geometry and the per-frame index arrays. Raises on the same
    malformations as the single-frame path."""
    import struct

    if len(payload) < 6 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("real_decode_frames parses GIF containers only")
    if len(payload) < 13:
        raise ValueError("malformed GIF: truncated screen descriptor")
    sw, sh, packed, _, _ = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    if packed & 0x80:
        n_colors = 2 << (packed & 0x07)
        if len(payload) < pos + 3 * n_colors:
            raise ValueError("malformed GIF: truncated color table")
        pos += 3 * n_colors
    frames: list[bytes] = []
    w = h = None
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:
            if not frames:
                raise ValueError("malformed GIF: no image descriptor")
            return {
                "format": "gif",
                "width": w,
                "height": h,
                "n_frames": len(frames),
                "frames": frames,
            }
        if block == 0x21:
            pos += 2
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"malformed GIF: unknown block {block:#x}")
        _, _, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
        if ipacked & 0xC0:
            raise ValueError(
                "real_decode_frames parses non-interlaced global-palette GIF only"
            )
        pos += 10
        min_code = payload[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(payload) and payload[pos]:
            size = payload[pos]
            chunk = payload[pos + 1 : pos + 1 + size]
            if len(chunk) < size:
                raise ValueError("malformed GIF: truncated sub-block")
            lzw += chunk
            pos += 1 + size
        pos += 1  # block terminator
        idx = _lzw_decode(bytes(lzw), min_code)
        if len(idx) != w * h:
            raise ValueError(
                f"malformed GIF: decoded {len(idx)} pixels for {w}x{h}"
            )
        frames.append(idx)
    raise ValueError("malformed GIF: missing trailer")


def real_decode(payload: bytes) -> dict:
    """REAL codec: parse uncompressed RIFF/WAVE audio, 24-bit BMP, or
    8-bit truecolor PNG (a genuinely compressed format — chunk walk
    with CRC-32 verification, zlib inflate, all five inverse scanline
    filters) with stdlib byte math — no external library. Returns
    header metadata plus the raw data so callers can compute
    sample-level features. Formats whose codecs genuinely need
    external libraries (JPEG/H.264), raise ValueError; ``fake_decode``
    covers those pipelines' plumbing tests."""
    import struct
    import zlib

    if len(payload) >= 6 and payload[:6] in (b"GIF87a", b"GIF89a"):
        if len(payload) < 13:
            raise ValueError("malformed GIF: truncated screen descriptor")
        sw, sh, packed, _, _ = struct.unpack_from("<HHBBB", payload, 6)
        pos = 13
        palette = b""
        if packed & 0x80:
            n_colors = 2 << (packed & 0x07)
            palette = payload[pos : pos + 3 * n_colors]
            if len(palette) < 3 * n_colors:
                raise ValueError("malformed GIF: truncated color table")
            pos += 3 * n_colors
        while pos < len(payload):
            block = payload[pos]
            if block == 0x3B:  # trailer
                raise ValueError("malformed GIF: no image descriptor")
            if block == 0x21:  # extension: label + sub-blocks
                pos += 2
                while pos < len(payload) and payload[pos]:
                    pos += 1 + payload[pos]
                pos += 1
                continue
            if block != 0x2C:
                raise ValueError(f"malformed GIF: unknown block {block:#x}")
            left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
            if ipacked & 0xC0:
                raise ValueError(
                    "real_decode parses non-interlaced global-palette GIF only"
                )
            pos += 10
            min_code = payload[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(payload) and payload[pos]:
                size = payload[pos]
                chunk = payload[pos + 1 : pos + 1 + size]
                if len(chunk) < size:
                    raise ValueError("malformed GIF: truncated sub-block")
                lzw += chunk
                pos += 1 + size
            idx = _lzw_decode(bytes(lzw), min_code)
            if len(idx) != w * h:
                raise ValueError(
                    f"malformed GIF: decoded {len(idx)} pixels for {w}x{h}"
                )
            return {
                "format": "gif",
                "width": w,
                "height": h,
                "bits_per_pixel": 8,
                "pixels": idx,
                "palette": palette,
            }
        raise ValueError("malformed GIF: truncated block stream")
    if len(payload) >= 8 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        pos, ihdr, idat, saw_end = 8, None, bytearray(), False
        while pos + 8 <= len(payload):
            (size,) = struct.unpack_from(">I", payload, pos)
            ctype = payload[pos + 4 : pos + 8]
            body = payload[pos + 8 : pos + 8 + size]
            if len(body) < size or pos + 12 + size > len(payload):
                raise ValueError("malformed PNG: truncated chunk")
            (crc,) = struct.unpack_from(">I", payload, pos + 8 + size)
            if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
                raise ValueError("malformed PNG: chunk CRC mismatch")
            if ctype == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", body)
            elif ctype == b"IDAT":
                idat.extend(body)
            elif ctype == b"IEND":
                saw_end = True
                break
            pos += 12 + size
        if ihdr is None or not idat or not saw_end:
            raise ValueError("malformed PNG: missing IHDR, IDAT, or IEND")
        w, h, depth, color, comp, filt, interlace = ihdr
        if depth != 8 or color not in (2, 6) or comp or filt or interlace:
            raise ValueError(
                "real_decode parses 8-bit non-interlaced RGB/RGBA PNG only"
            )
        bpp = 3 if color == 2 else 4
        try:
            dec = zlib.decompress(bytes(idat))
        except zlib.error as e:
            raise ValueError(f"malformed PNG: IDAT inflate failed ({e})")
        px = _png_unfilter(dec, w, h, bpp)
        return {
            "format": "png",
            "width": w,
            "height": h,
            "bits_per_pixel": bpp * 8,
            "pixels": px,
        }

    if len(payload) >= 2 and payload[:2] == b"BM":
        if len(payload) < 14 + 40:
            raise ValueError("malformed BMP: truncated header")
        _, _, _, _, offset = struct.unpack_from("<2sIHHI", payload, 0)
        hsize, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
        if hsize < 40 or bpp != 24 or comp != 0:
            raise ValueError("real_decode parses 24-bit uncompressed BMP only")
        if w <= 0:
            raise ValueError("malformed BMP: non-positive width")
        row = w * 3
        stride = row + (4 - row % 4) % 4
        # the last row may legally omit its trailing padding; anything
        # shorter means pixel data is truncated — never return partial
        # bytes silently
        if abs(h) > 0 and offset + (abs(h) - 1) * stride + row > len(payload):
            raise ValueError("malformed BMP: truncated pixel data")
        px = b"".join(
            payload[offset + r * stride : offset + r * stride + row]
            for r in range(abs(h))
        )
        return {
            "format": "bmp",
            "width": w,
            "height": abs(h),
            "bits_per_pixel": bpp,
            "pixels": px,
        }
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(
            "real_decode parses uncompressed RIFF/WAVE, 24-bit BMP, 8-bit "
            "RGB/RGBA PNG, and non-interlaced GIF only; other compressed "
            "formats need an external codec (use fake_decode for plumbing)"
        )
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("malformed WAV: chunk size exceeds payload")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("malformed WAV: fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("malformed WAV: missing fmt or data chunk")
    _, n_channels, rate, _, block_align, bits = fmt
    if block_align <= 0:
        raise ValueError("malformed WAV: zero block_align")
    return {
        "format": "wav",
        "sample_rate": rate,
        "n_channels": n_channels,
        "bits_per_sample": bits,
        "n_frames": len(data) // block_align,
        "pcm": data,
    }


def fake_decode(payload: bytes) -> dict:
    """Deterministic FAKE decode: metadata derived from md5(payload).

    Stands in for a codec so the distributed plumbing is testable; the
    derivation (hex digits → dimensions) is mirrored in the DuckDB
    oracles, giving exact cross-engine checks of the full pipeline."""
    d = hashlib.md5(payload).hexdigest()
    return {
        "format": FORMATS[int(d[0], 16) % len(FORMATS)],
        "width": 160 + (int(d[1:3], 16) % 8) * 80,
        "height": 90 + (int(d[3:5], 16) % 8) * 45,
        "n_frames": 1 + int(d[5:7], 16) % 30,
    }


def media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize an opaque-media table: (media_id, payload binary).

    Partitioned by bytes (``spread_dense``), not cores: the container's
    deterministic fake codec costs microseconds per payload, so
    cores-wide spreading pays ~32 Python-worker forks to parallelize
    ~10 ms of hashing (the same trap measured on the IVF build; this
    showed up as a drifting mm_decode_metadata bench number in r4/r5).
    A REAL codec (ms per frame, CPU-bound) wants the opposite — at that
    point the scan of a genuine media table yields thousands of splits
    and spread_dense keeps them, so the bytes gate only bites on the
    tiny-fixture case it is meant for."""
    docs = spread_dense(
        load_table(spark, sf_dir, "documents"), spark, sf_dir, table="documents"
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
    )


# DuckDB mirror of fake_decode (md5 of the same UTF-8 bytes).
_DUCK_DECODE = """
    SELECT doc_id AS media_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS digest
    FROM documents
"""
_DUCK_META = f"""
    SELECT media_id, n_bytes,
           ['jpeg', 'png', 'webp', 'gif']
               [(('0x' || substring(digest, 1, 1))::INTEGER % 4) + 1] AS format,
           CAST(160 + (('0x' || substring(digest, 2, 2))::INTEGER % 8) * 80
                AS INTEGER) AS width,
           CAST(90 + (('0x' || substring(digest, 4, 2))::INTEGER % 8) * 45
                AS INTEGER) AS height,
           CAST(1 + ('0x' || substring(digest, 6, 2))::INTEGER % 30
                AS INTEGER) AS n_frames
    FROM ({_DUCK_DECODE})
"""


def decode_media(media: DataFrame, decode=fake_decode) -> DataFrame:
    """Arrow-batched decode stage: binary payload → typed metadata.

    This is the real production shape: one ``mapInPandas`` pass, codec
    called per payload inside the batch loop, output a typed struct —
    swap ``decode=real_decode`` when codecs exist."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            metas = [decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "format": [m["format"] for m in metas],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "n_frames": [m["n_frames"] for m in metas],
                }
            )

    return media.mapInPandas(run, DECODED_SCHEMA)


@register(
    "mm_decode_metadata",
    oracle=f"SELECT media_id, n_bytes, format, width, height, n_frames FROM ({_DUCK_META})",
    tags=("multimodal",),
)
def mm_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode opaque media payloads into typed metadata (fake codec,
    real distributed plumbing)."""
    return decode_media(media_frame(spark, sf_dir))


@register(
    "mm_decode_real",
    oracle=f"""
        -- recompute the expected decode output from media_id ALONE:
        -- the Spark side must generate the RIFF container, ship it as
        -- an opaque binary column, and parse it back byte-for-byte —
        -- header fields AND the PCM sum prove the real round trip
        SELECT doc_id AS media_id,
               'wav' AS format,
               CAST([{", ".join(map(str, WAV_RATES))}]
                        [(doc_id % {len(WAV_RATES)}) + 1]
                    AS BIGINT) AS sample_rate,
               CAST(1 + (doc_id % 2) AS BIGINT) AS n_channels,
               CAST(16 AS BIGINT) AS bits_per_sample,
               CAST(300 + (doc_id % 40) * 10 AS BIGINT) AS n_frames,
               CAST((300 + (doc_id % 40) * 10) * 1000
                    // ([{", ".join(map(str, WAV_RATES))}]
                            [(doc_id % {len(WAV_RATES)}) + 1])
                    AS BIGINT) AS duration_ms,
               CAST(list_sum(list_transform(
                        range(0, (300 + (doc_id % 40) * 10) * (1 + doc_id % 2)),
                        j -> abs(((doc_id * 31 + j * 7) % 65536) - 32768)
                    )) AS BIGINT) AS sum_abs_amplitude
        FROM documents
    """,
    tags=("multimodal",),
)
def mm_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL (non-stubbed) media decode end to end: each document id is
    rendered into an actual RIFF/WAVE container (``wav_payload``) which
    travels as an opaque ``binary`` column, then an Arrow-batched
    ``mapInPandas`` stage parses the container back with the stdlib
    codec (``real_decode``) — header metadata plus an exact integer
    PCM amplitude sum computed from the decoded samples. The oracle
    recomputes every field from the generation arithmetic, so a parser
    that misreads any header offset or sample byte hash-fails. Seed:
    the reference ships miniSEED bytes as opaque payloads without
    decoding (``/root/reference/app.py:296-303``); this closes that
    gap with a real in-engine codec for the one family stdlib can
    parse (uncompressed PCM — seismic miniSEED's raw-sample cousin).

    Scale shape: generation and decode are one fused mapInPandas pass
    (no shuffle); a real media table would scan instead of generate,
    with identical decode plumbing. numpy does the sample math per
    Arrow batch — no per-row Python on the PCM arrays."""
    import numpy as np

    docs = spread_dense(
        load_table(spark, sf_dir, "documents"), spark, sf_dir, table="documents"
    ).select(F.col("doc_id").alias("media_id"))

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("format", T.StringType(), False),
            T.StructField("sample_rate", T.LongType(), False),
            T.StructField("n_channels", T.LongType(), False),
            T.StructField("bits_per_sample", T.LongType(), False),
            T.StructField("n_frames", T.LongType(), False),
            T.StructField("duration_ms", T.LongType(), False),
            T.StructField("sum_abs_amplitude", T.LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid in pdf["media_id"]:
                meta = real_decode(wav_payload(int(mid)))
                samples = np.frombuffer(meta["pcm"], dtype="<i2").astype(
                    np.int64
                )
                rows.append(
                    (
                        int(mid),
                        meta["format"],
                        meta["sample_rate"],
                        meta["n_channels"],
                        meta["bits_per_sample"],
                        meta["n_frames"],
                        meta["n_frames"] * 1000 // meta["sample_rate"],
                        int(np.abs(samples).sum()),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return docs.mapInPandas(run, schema)


@register(
    "mm_decode_real_image",
    oracle="""
        -- expected decode output recomputed from media_id alone: the
        -- Spark path must build the BMP container and parse it back,
        -- including per-row 4-byte padding strip — header fields AND
        -- the pixel-byte sum prove the byte-exact round trip
        WITH dims AS (
            SELECT doc_id AS media_id,
                   4 + doc_id % 13 AS w,
                   3 + doc_id % 7 AS h
            FROM documents
        )
        SELECT media_id,
               'bmp' AS format,
               CAST(w AS BIGINT) AS width,
               CAST(h AS BIGINT) AS height,
               CAST(24 AS BIGINT) AS bits_per_pixel,
               CAST(w * h AS BIGINT) AS n_pixels,
               CAST(list_sum(list_transform(
                        range(0, w * h * 3),
                        j -> (media_id * 7 + j * 5) % 256
                    )) AS BIGINT) AS sum_pixel_bytes
        FROM dims
    """,
    tags=("multimodal",),
)
def mm_decode_real_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The image sibling of ``mm_decode_real``: deterministic 24-bit
    BMP containers generated per media_id, shipped as opaque binary,
    parsed back by the stdlib codec (``real_decode``) in one fused
    mapInPandas pass — header metadata plus an exact pixel-byte sum
    computed from the decoded (padding-stripped) pixel data. A parser
    that misreads the data offset, stride, or padding rule hash-fails
    against the oracle's arithmetic."""
    import numpy as np

    docs = spread_dense(
        load_table(spark, sf_dir, "documents"), spark, sf_dir, table="documents"
    ).select(F.col("doc_id").alias("media_id"))

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("format", T.StringType(), False),
            T.StructField("width", T.LongType(), False),
            T.StructField("height", T.LongType(), False),
            T.StructField("bits_per_pixel", T.LongType(), False),
            T.StructField("n_pixels", T.LongType(), False),
            T.StructField("sum_pixel_bytes", T.LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid in pdf["media_id"]:
                meta = real_decode(bmp_payload(int(mid)))
                px = np.frombuffer(meta["pixels"], dtype=np.uint8)
                rows.append(
                    (
                        int(mid),
                        meta["format"],
                        meta["width"],
                        meta["height"],
                        meta["bits_per_pixel"],
                        meta["width"] * meta["height"],
                        int(px.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return docs.mapInPandas(run, schema)


@register(
    "mm_decode_real_png",
    oracle="""
        -- expected decode output recomputed from media_id alone: the
        -- Spark path must build a REAL compressed PNG (per-row cycling
        -- scanline filters, zlib IDAT, chunk CRCs) and decode it back —
        -- the pixel sum only matches if inflate + all five inverse
        -- filters reproduce the raw bytes exactly
        WITH dims AS (
            SELECT doc_id AS media_id,
                   4 + doc_id % 13 AS w,
                   3 + doc_id % 7 AS h
            FROM documents
        )
        SELECT media_id,
               'png' AS format,
               CAST(w AS BIGINT) AS width,
               CAST(h AS BIGINT) AS height,
               CAST(24 AS BIGINT) AS bits_per_pixel,
               CAST(w * h AS BIGINT) AS n_pixels,
               CAST(list_sum(list_transform(
                        range(0, w * h * 3),
                        j -> (media_id * 11 + j * 3) % 256
                    )) AS BIGINT) AS sum_pixel_bytes
        FROM dims
    """,
    tags=("multimodal",),
)
def mm_decode_real_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPRESSED-format sibling of ``mm_decode_real_image``: each
    media_id is rendered into a real PNG — raw RGB bytes filtered with
    the spec's five scanline filters cycling per row, zlib-deflated,
    CRC'd per chunk — shipped as opaque binary, then decoded back by
    the stdlib codec (CRC verify → inflate → inverse filters) in one
    fused mapInPandas pass. The oracle recomputes the expected pixel
    sum from the generation arithmetic alone, so any defect in the
    filter inversion, inflate handling, or chunk walk hash-fails.
    This closes the 'compressed codecs are env-blocked' gap for the one
    compressed image format whose codec is pure stdlib; JPEG/H.264
    remain honestly gated on external libraries."""
    import numpy as np

    docs = spread_dense(
        load_table(spark, sf_dir, "documents"), spark, sf_dir, table="documents"
    ).select(F.col("doc_id").alias("media_id"))

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("format", T.StringType(), False),
            T.StructField("width", T.LongType(), False),
            T.StructField("height", T.LongType(), False),
            T.StructField("bits_per_pixel", T.LongType(), False),
            T.StructField("n_pixels", T.LongType(), False),
            T.StructField("sum_pixel_bytes", T.LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid in pdf["media_id"]:
                meta = real_decode(png_payload(int(mid)))
                px = np.frombuffer(meta["pixels"], dtype=np.uint8)
                rows.append(
                    (
                        int(mid),
                        meta["format"],
                        meta["width"],
                        meta["height"],
                        meta["bits_per_pixel"],
                        meta["width"] * meta["height"],
                        int(px.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return docs.mapInPandas(run, schema)


@register(
    "mm_decode_real_gif",
    oracle="""
        -- expected decode output recomputed from media_id alone: the
        -- Spark path must LZW-compress the index stream into a real
        -- GIF87a container and decode it back — the pixel sum only
        -- matches if the growing-width dictionary decode reproduces
        -- every index exactly
        WITH dims AS (
            SELECT doc_id AS media_id,
                   40 + doc_id % 13 AS w,
                   30 + doc_id % 7 AS h
            FROM documents
        )
        SELECT media_id,
               'gif' AS format,
               CAST(w AS BIGINT) AS width,
               CAST(h AS BIGINT) AS height,
               CAST(w * h AS BIGINT) AS n_pixels,
               CAST(list_sum(list_transform(
                        range(0, w * h),
                        j -> (media_id * 13 + j * 7) % 256
                    )) AS BIGINT) AS sum_indices
        FROM dims
    """,
    tags=("multimodal",),
)
def mm_decode_real_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DICTIONARY-CODING sibling of ``mm_decode_real_png``: each
    media_id renders into a real GIF87a — indexed pixels LZW-compressed
    with growing 9→12-bit code widths (fixture dimensions are sized so
    every payload crosses at least one width bump) — shipped as opaque
    binary, then decoded back by the stdlib codec (header walk, global
    palette, sub-block reassembly, LZW inflate incl. the KwKwK case)
    in one fused mapInPandas pass. The oracle recomputes the expected
    index sum from the generation arithmetic alone. With deflate (PNG)
    and LZW (GIF) both real, the env-gated codec boundary is down to
    transform-coding formats (JPEG/H.264) that genuinely need external
    libraries."""
    import numpy as np

    docs = spread_dense(
        load_table(spark, sf_dir, "documents"), spark, sf_dir, table="documents"
    ).select(F.col("doc_id").alias("media_id"))

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("format", T.StringType(), False),
            T.StructField("width", T.LongType(), False),
            T.StructField("height", T.LongType(), False),
            T.StructField("n_pixels", T.LongType(), False),
            T.StructField("sum_indices", T.LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid in pdf["media_id"]:
                meta = real_decode(gif_payload(int(mid)))
                px = np.frombuffer(meta["pixels"], dtype=np.uint8)
                rows.append(
                    (
                        int(mid),
                        meta["format"],
                        meta["width"],
                        meta["height"],
                        meta["width"] * meta["height"],
                        int(px.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return docs.mapInPandas(run, schema)


@register(
    "mm_decode_real_video",
    oracle="""
        -- expected decode recomputed from media_id alone: the Spark
        -- path must build a MULTI-FRAME GIF (one LZW stream per frame
        -- in one container) and walk every image block back out — the
        -- cross-frame sum only matches if all frames decode exactly
        WITH dims AS (
            SELECT doc_id AS media_id,
                   24 + doc_id % 9 AS w,
                   18 + doc_id % 5 AS h,
                   2 + doc_id % 4 AS nf
            FROM documents
        )
        SELECT media_id,
               'gif' AS format,
               CAST(w AS BIGINT) AS width,
               CAST(h AS BIGINT) AS height,
               CAST(nf AS BIGINT) AS n_frames,
               CAST(list_sum(list_transform(
                        range(0, nf * w * h),
                        j -> (media_id * 13 + (j // (w * h)) * 31
                              + (j % (w * h)) * 7) % 256
                    )) AS BIGINT) AS sum_indices
        FROM dims
    """,
    tags=("multimodal",),
)
def mm_decode_real_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VIDEO-shaped decode: a real multi-frame container (animated
    GIF87a — one shared header/palette, 2–5 independently LZW-coded
    frames) built per media_id, shipped as opaque binary, and decoded
    by walking EVERY image block (``real_decode_frames``) in one fused
    mapInPandas pass — frame count and the cross-frame index sum prove
    all frames round-trip, not just the first. This upgrades the video
    family's frame-sampling plumbing (``mm_frame_sample``, fake codec)
    with a real sequence-of-coded-frames decode; true inter-frame
    codecs (H.264's motion compensation) remain honestly env-gated."""
    import numpy as np

    docs = spread_dense(
        load_table(spark, sf_dir, "documents"), spark, sf_dir, table="documents"
    ).select(F.col("doc_id").alias("media_id"))

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("format", T.StringType(), False),
            T.StructField("width", T.LongType(), False),
            T.StructField("height", T.LongType(), False),
            T.StructField("n_frames", T.LongType(), False),
            T.StructField("sum_indices", T.LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid in pdf["media_id"]:
                meta = real_decode_frames(gif_animation_payload(int(mid)))
                total = sum(
                    int(np.frombuffer(fr, np.uint8).astype(np.int64).sum())
                    for fr in meta["frames"]
                )
                rows.append(
                    (
                        int(mid),
                        meta["format"],
                        meta["width"],
                        meta["height"],
                        meta["n_frames"],
                        total,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return docs.mapInPandas(run, schema)


@register(
    "mm_frame_sample",
    oracle=f"""
        SELECT media_id, frame_idx,
               md5(CAST(media_id AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR))
                   AS frame_key
        FROM (
            SELECT media_id, unnest(range(0, n_frames, 5)) AS frame_idx
            FROM ({_DUCK_META})
        )
    """,
    tags=("multimodal",),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plan for video-like media: every 5th frame index,
    exploded into one row per sampled frame with a deterministic frame
    key (what a real pipeline passes to the frame extractor). The
    explode stays JVM-side; only the (stubbed) pixel fetch would be
    Python."""
    meta = decode_media(media_frame(spark, sf_dir))
    frames = meta.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.col("n_frames") - 1, F.lit(5)
            )
        ).alias("frame_idx"),
    )
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.md5(
            F.concat_ws(
                ":", F.col("media_id").cast("string"), F.col("frame_idx").cast("string")
            ).cast("binary")
        ).alias("frame_key"),
    )


@register(
    "mm_resize_plan",
    oracle=f"""
        SELECT media_id, width, height,
               CASE WHEN width >= height THEN 224
                    ELSE CAST((width * 224) // height AS INTEGER) END AS out_w,
               CASE WHEN width >= height
                    THEN CAST((height * 224) // width AS INTEGER)
                    ELSE 224 END AS out_h,
               (width > 224 OR height > 224) AS downscale
        FROM ({_DUCK_META})
    """,
    tags=("multimodal",),
)
def mm_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning: aspect-preserving fit of each media item into a
    224×224 budget (the standard vision-model input prep). Pure integer
    math on decoded metadata — exact cross-engine. The pixel resample
    itself is the stubbed codec step (``real_decode``); a production
    kernel applies these dims inside the same mapInPandas stage."""
    meta = decode_media(media_frame(spark, sf_dir))
    w, h = F.col("width"), F.col("height")
    # integer `div` on both engines — no float rounding in the fit math
    out_w = F.when(w >= h, F.lit(224)).otherwise(
        F.expr("(width * 224) div height").cast("int")
    )
    out_h = F.when(
        w >= h, F.expr("(height * 224) div width").cast("int")
    ).otherwise(F.lit(224))
    return meta.select(
        "media_id",
        "width",
        "height",
        out_w.alias("out_w"),
        out_h.alias("out_h"),
        ((w > 224) | (h > 224)).alias("downscale"),
    )


_FEATURE_COLS = [f"f{i}" for i in range(8)]

@register(
    "mm_feature_extract",
    oracle=f"""
        SELECT media_id,
               {", ".join(
                   f"(('0x' || substring(digest, {i * 4 + 1}, 4))::INTEGER)"
                   f" / 65535.0 AS f{i}"
                   for i in range(8)
               )},
               format
        FROM ({_DUCK_META}) m
        JOIN ({_DUCK_DECODE}) d USING (media_id)
    """,
    tags=("multimodal",),
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over media payloads: Arrow-batched Python
    kernel emitting a fixed 8-dim embedding per item (fake: md5 16-bit
    words scaled to [0,1] — exact integers / 65535, so cross-engine
    float parity is bit-exact). A real extractor swaps the kernel for
    a vision model; schema/batching/partitioning are unchanged. The 8
    dims are emitted as scalar columns f0..f7 (one column per dim is
    both driver-hashable and the layout a feature store would want;
    internal pipelines that need array<double> use llm/vector.py)."""
    schema = T.StructType(
        [T.StructField("media_id", T.LongType(), False)]
        + [T.StructField(c, T.DoubleType(), False) for c in _FEATURE_COLS]
        + [T.StructField("format", T.StringType(), False)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            cols: dict[str, list] = {c: [] for c in _FEATURE_COLS}
            fmts = []
            for p in pdf["payload"]:
                d = hashlib.md5(p).hexdigest()
                for i, c in enumerate(_FEATURE_COLS):
                    cols[c].append(int(d[i * 4 : i * 4 + 4], 16) / 65535.0)
                fmts.append(fake_decode(p)["format"])
            out = {"media_id": pdf["media_id"].to_numpy(), **cols, "format": fmts}
            yield pd.DataFrame(out)

    return media_frame(spark, sf_dir).mapInPandas(run, schema)


@register(
    "mm_audio_features",
    oracle="""
        -- per-channel signal features recomputed from media_id alone:
        -- the Spark side must decode REAL PCM and deinterleave channels
        -- correctly — a channel-offset bug flips every feature
        WITH ch AS (
            SELECT doc_id AS media_id,
                   1 + doc_id % 2 AS n_ch,
                   300 + (doc_id % 40) * 10 AS n_frames,
                   unnest([0, 1]) AS channel
            FROM documents
        ),
        s AS (
            SELECT media_id, channel, n_frames,
                   list_transform(
                       range(0, n_frames),
                       j -> ((media_id * 31 + (j * n_ch + channel) * 7)
                             % 65536) - 32768
                   ) AS samples
            FROM ch
            WHERE channel < n_ch
        )
        SELECT media_id,
               CAST(channel AS BIGINT) AS channel,
               CAST(n_frames AS BIGINT) AS n_samples,
               CAST(list_max(list_transform(samples, x -> abs(x)))
                    AS BIGINT) AS peak_amplitude,
               CAST(list_sum(list_transform(samples, x -> x * x))
                    AS BIGINT) AS sum_sq_amplitude,
               CAST(list_sum(list_transform(
                        range(0, n_frames - 1),
                        j -> CASE WHEN samples[j + 1] * samples[j + 2] < 0
                                  THEN 1 ELSE 0 END
                    )) AS BIGINT) AS n_zero_crossings
        FROM s
    """,
    tags=("multimodal",),
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO FEATURE EXTRACTION over really-decoded PCM — the
    'feature-extract' half of the multimodal mandate running on true
    sample values, not metadata: decode each WAV container
    (``real_decode``), DEINTERLEAVE the frame-major channels, and emit
    per-channel signal features — peak amplitude, energy (sum of
    squares), and strict zero-crossing count — all exact integers, so
    the DuckDB oracle recomputes them from the generation arithmetic
    and any deinterleave off-by-one (sampling channel 0's neighbor
    instead of its next frame) flips every crossing count and
    hash-fails. One fused mapInPandas pass, numpy on the sample
    arrays per Arrow batch; at scale this is the embarrassingly
    parallel per-object stage of an audio-corpus pipeline (VAD,
    loudness gating, silence trimming all start from these sums)."""
    import numpy as np

    docs = spread_dense(
        load_table(spark, sf_dir, "documents"), spark, sf_dir, table="documents"
    ).select(F.col("doc_id").alias("media_id"))

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("channel", T.LongType(), False),
            T.StructField("n_samples", T.LongType(), False),
            T.StructField("peak_amplitude", T.LongType(), False),
            T.StructField("sum_sq_amplitude", T.LongType(), False),
            T.StructField("n_zero_crossings", T.LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid in pdf["media_id"]:
                meta = real_decode(wav_payload(int(mid)))
                samples = np.frombuffer(meta["pcm"], dtype="<i2").astype(
                    np.int64
                )
                n_ch = meta["n_channels"]
                for c in range(n_ch):
                    s = samples[c::n_ch]  # deinterleave frame-major PCM
                    rows.append(
                        (
                            int(mid),
                            c,
                            int(s.size),
                            int(np.abs(s).max()),
                            int((s * s).sum()),
                            int(((s[:-1] * s[1:]) < 0).sum()),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return docs.mapInPandas(run, schema)


@register(
    "mm_image_stats",
    oracle="""
        -- per-BGR-channel pixel statistics recomputed from media_id
        -- alone: flat pixel byte j = (id*7 + j*5) % 256, channel j % 3
        -- (BMP stores BGR triplets); a stride/padding bug in the
        -- decoder shifts every channel sum and hash-fails
        WITH dims AS (
            SELECT doc_id AS media_id,
                   4 + doc_id % 13 AS w,
                   3 + doc_id % 7 AS h,
                   unnest([0, 1, 2]) AS channel
            FROM documents
        )
        SELECT media_id,
               CAST(channel AS BIGINT) AS channel,
               CAST(w * h AS BIGINT) AS n_pixels,
               CAST(list_sum(list_transform(
                        range(0, w * h),
                        p -> (media_id * 7 + (p * 3 + channel) * 5) % 256
                    )) AS BIGINT) AS sum_value,
               CAST(list_max(list_transform(
                        range(0, w * h),
                        p -> (media_id * 7 + (p * 3 + channel) * 5) % 256
                    )) AS BIGINT) AS max_value
        FROM dims
    """,
    tags=("multimodal",),
)
def mm_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMAGE statistics on really-decoded pixels — the picture sibling
    of ``mm_audio_features``: decode each 24-bit BMP
    (``real_decode``, padding-stripped), split the BGR interleave into
    channels, and emit per-channel pixel count / sum / max as exact
    integers. The oracle recomputes them from the generation
    arithmetic, so any row-stride or padding mistake in the decoder
    (the classic BMP bug) shifts the sums and hash-fails. These sums
    are the raw ingredients of brightness/contrast gating and
    channel-balance checks in an image-corpus pipeline; one fused
    mapInPandas pass, numpy over the pixel buffer per Arrow batch."""
    import numpy as np

    docs = spread_dense(
        load_table(spark, sf_dir, "documents"), spark, sf_dir, table="documents"
    ).select(F.col("doc_id").alias("media_id"))

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("channel", T.LongType(), False),
            T.StructField("n_pixels", T.LongType(), False),
            T.StructField("sum_value", T.LongType(), False),
            T.StructField("max_value", T.LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid in pdf["media_id"]:
                img = real_decode(bmp_payload(int(mid)))
                px = np.frombuffer(img["pixels"], dtype=np.uint8).astype(
                    np.int64
                )
                for c in range(3):  # BGR triplets, flat index % 3
                    ch = px[c::3]
                    rows.append(
                        (
                            int(mid),
                            c,
                            int(ch.size),
                            int(ch.sum()),
                            int(ch.max()),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return docs.mapInPandas(run, schema)


#: decimation factor for the audio downsample stage
_RESAMPLE_K = 4


@register(
    "mm_audio_resample",
    oracle=f"""
        -- block-averaged 4x decimation recomputed from media_id alone:
        -- the Spark side must decode REAL PCM, deinterleave, and window
        -- the blocks identically — any off-by-one shifts every mean
        WITH ch AS (
            SELECT doc_id AS media_id,
                   1 + doc_id % 2 AS n_ch,
                   300 + (doc_id % 40) * 10 AS n_frames,
                   unnest([0, 1]) AS channel
            FROM documents
        ),
        s AS (
            SELECT media_id, channel, n_frames,
                   list_transform(
                       range(0, n_frames),
                       j -> ((media_id * 31 + (j * n_ch + channel) * 7)
                             % 65536) - 32768
                   ) AS samples
            FROM ch
            WHERE channel < n_ch
        ),
        r AS (
            SELECT media_id, channel,
                   n_frames // {_RESAMPLE_K} AS n_out,
                   list_transform(
                       range(0, n_frames // {_RESAMPLE_K}),
                       b -> (samples[b * {_RESAMPLE_K} + 1]
                             + samples[b * {_RESAMPLE_K} + 2]
                             + samples[b * {_RESAMPLE_K} + 3]
                             + samples[b * {_RESAMPLE_K} + 4])
                            // {_RESAMPLE_K}
                   ) AS out
            FROM s
        )
        SELECT media_id,
               CAST(channel AS BIGINT) AS channel,
               CAST(n_out AS BIGINT) AS n_out,
               CAST(list_sum(out) AS BIGINT) AS sum_out,
               CAST(list_max(list_transform(out, x -> abs(x)))
                    AS BIGINT) AS peak_out
        FROM r
    """,
    tags=("multimodal",),
)
def mm_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO DOWNSAMPLING over really-decoded PCM — the transform half
    of the audio modality (``mm_frame_sample`` / ``mm_resize_plan``'s
    sibling for sound): decode each WAV, deinterleave, and decimate
    every channel 4x by BLOCK AVERAGING with truncating division — exact
    integer arithmetic, so the DuckDB oracle recomputes the entire
    resampled stream from the generation arithmetic and any window
    misalignment flips the sums. Block-mean decimation is the
    integer-exact stand-in for the FIR low-pass a production resampler
    applies before striding (the anti-aliasing filter needs float
    coefficients — same env-honesty as the compressed-codec gating);
    the plumbing (decode -> channel split -> block window -> emit) is
    the real pipeline shape either way. One fused mapInPandas pass,
    numpy reshape per Arrow batch."""
    import numpy as np

    docs = spread_dense(
        load_table(spark, sf_dir, "documents"), spark, sf_dir, table="documents"
    ).select(F.col("doc_id").alias("media_id"))

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("channel", T.LongType(), False),
            T.StructField("n_out", T.LongType(), False),
            T.StructField("sum_out", T.LongType(), False),
            T.StructField("peak_out", T.LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid in pdf["media_id"]:
                meta = real_decode(wav_payload(int(mid)))
                samples = np.frombuffer(meta["pcm"], dtype="<i2").astype(
                    np.int64
                )
                n_ch = meta["n_channels"]
                for c in range(n_ch):
                    ch = samples[c::n_ch]
                    n_out = len(ch) // _RESAMPLE_K
                    blocks = ch[: n_out * _RESAMPLE_K].reshape(
                        n_out, _RESAMPLE_K
                    )
                    # DuckDB's // TRUNCATES toward zero on negatives
                    # (-7 // 4 = -1) while numpy floor-divides (= -2):
                    # divide in float and cast, which truncates — exact
                    # for |sum| far below 2^53
                    out = (
                        blocks.sum(axis=1) / _RESAMPLE_K
                    ).astype(np.int64)
                    rows.append(
                        (
                            int(mid),
                            c,
                            n_out,
                            int(out.sum()),
                            int(np.abs(out).max()) if n_out else 0,
                        )
                    )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id",
                        "channel",
                        "n_out",
                        "sum_out",
                        "peak_out",
                    ],
                )

    return docs.mapInPandas(run, schema)


@register(
    "mm_image_phash",
    oracle="""
        WITH m AS (
            SELECT doc_id AS media_id,
                   4 + doc_id % 13 AS w,
                   3 + doc_id % 7 AS h
            FROM documents
        ),
        px AS (
            SELECT media_id, w, h, unnest(range(0, w*h)) AS p FROM m
        ),
        g AS (
            SELECT media_id, w, h, p,
                   ((media_id*7 + (p*3+0)*5) % 256)
                   + ((media_id*7 + (p*3+1)*5) % 256)
                   + ((media_id*7 + (p*3+2)*5) % 256) AS gray,
                   ((p % w) * 4) // w AS bx,
                   ((p // w) * 4) // h AS by
            FROM px
        ),
        blocks AS (
            SELECT media_id, w, h, by*4 + bx AS b,
                   SUM(gray) AS bsum, COUNT(*) AS bcnt
            FROM g GROUP BY media_id, w, h, by*4 + bx
        ),
        tot AS (
            SELECT media_id, SUM(bsum) AS tsum, SUM(bcnt) AS tcnt
            FROM blocks GROUP BY media_id
        ),
        hashed AS (
            SELECT b.media_id,
                   CAST(MAX(b.w) AS BIGINT) AS width,
                   CAST(MAX(b.h) AS BIGINT) AS height,
                   CAST(SUM(CASE WHEN b.bsum * t.tcnt > t.tsum * b.bcnt
                                 THEN 1 << (15 - CAST(b.b AS INT))
                                 ELSE 0 END) AS BIGINT) AS phash
            FROM blocks b JOIN tot t USING (media_id)
            GROUP BY b.media_id
        )
        SELECT media_id, width, height, phash,
               CAST(COUNT(*) OVER (PARTITION BY phash) AS BIGINT)
                   AS n_same_hash
        FROM hashed
    """,
    tags=("multimodal", "dedup"),
)
def mm_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCEPTUAL IMAGE HASH on really-decoded pixels — the image-dedup
    primitive (aHash family): each 24-bit BMP is decoded
    (``real_decode``), grayscale-reduced (integer channel sum — no
    luma weights, no floats), block-averaged onto a fixed 4×4 grid
    (nearest-block assignment, correct for images smaller than the
    grid), and each block contributes one bit — is its mean above the
    image mean — compared by INTEGER CROSS-MULTIPLICATION
    (bsum·tcnt > tsum·bcnt), so no division ever happens and the
    16-bit hash is an exact integer both engines derive identically:
    the oracle recomputes it from the generation arithmetic, meaning
    any decoder stride/padding slip shifts a block sum and flips a
    hash bit. ``n_same_hash`` is the duplicate-cluster size — images
    sharing a hash are the near-dup candidates an image-corpus
    pipeline routes to exact verification, precisely the
    ``dedup_minhash_banded`` -> ``dedup_lsh_verified`` shape with
    pixels for shingles. Scale: one fused mapInPandas decode pass, one
    |images|-row groupBy on the hash."""
    from pyspark.sql import Window as W

    return image_phashes(spark, sf_dir).withColumn(
        "n_same_hash",
        F.count(F.lit(1)).over(W.partitionBy("phash")).cast("long"),
    )


def image_phashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, width, height, phash) for every document's image —
    the decode+hash pass ``mm_image_phash`` registers, exposed for
    composition (``curate_multimodal_manifest``)."""
    import numpy as np

    docs = spread_dense(
        load_table(spark, sf_dir, "documents"), spark, sf_dir, table="documents"
    ).select(F.col("doc_id").alias("media_id"))

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.LongType(), False),
            T.StructField("height", T.LongType(), False),
            T.StructField("phash", T.LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid in pdf["media_id"]:
                img = real_decode(bmp_payload(int(mid)))
                w, h = img["width"], img["height"]
                px = np.frombuffer(img["pixels"], dtype=np.uint8).astype(
                    np.int64
                )
                gray = px[0::3] + px[1::3] + px[2::3]
                p = np.arange(w * h, dtype=np.int64)
                b = ((p // w) * 4 // h) * 4 + ((p % w) * 4 // w)
                bsum = np.bincount(b, weights=gray, minlength=16).astype(
                    np.int64
                )
                bcnt = np.bincount(b, minlength=16).astype(np.int64)
                tsum, tcnt = int(gray.sum()), int(w * h)
                bits = bsum * tcnt > tsum * bcnt
                phash = int(
                    sum(1 << (15 - i) for i in range(16) if bits[i])
                )
                rows.append((int(mid), int(w), int(h), phash))
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            )

    return docs.mapInPandas(run, schema)
