"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as `binary` columns with a metadata struct;
decode / feature-extraction / resize / frame-sampling run as
Arrow-batched pandas iterators (`mapInPandas`) so payload bytes never
round-trip through Python row objects.

Decode support is tiered by what the container offers:
- `decode="fake"`: deterministic feature vector from raw bytes —
  exercises the full Arrow/batch/schema plumbing with zero codecs.
- `decode="real"`: pure-stdlib decoders for PNG (8-bit gray/RGB/RGBA,
  non-interlaced; zlib + all five scanline filters), uncompressed
  24/32-bit BMP, baseline sequential JPEG (Huffman + dequant + iDCT
  + YCbCr->RGB; 4:4:4 AND 4:2:0 (general 1-2 sampling factors, MCU
  interleave, nearest chroma upsampling), restart markers supported),
  and AVI/MJPEG video (RIFF container walk + per-frame JPEG decode),
  dispatched on magic bytes. Progressive JPEG (SOF2, spectral
  selection) decodes through a dedicated multi-scan path. Formats that
  genuinely need external codecs (successive-approximation refinement
  scans, sampling factors >2, arithmetic coding, inter-frame video
  codecs) still raise NotImplementedError at the exact point
  PIL/ffmpeg would be called.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, width int, height int, "
    "payload binary"
)

FEATURE_SCHEMA = "doc_id bigint, media_type string, n_bytes int, feat array<float>"

FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes binary"


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Fixture adapter: wrap each document's text bytes as a fake media
    payload with plausible metadata (deterministic from doc_id)."""
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.length("text").cast("int").alias("n_bytes"),
        ((F.col("doc_id") % 8 + 1) * 64).cast("int").alias("width"),
        ((F.col("doc_id") % 4 + 1) * 64).cast("int").alias("height"),
        F.col("text").cast("binary").alias("payload"),
    )


def _fake_features(payload: bytes, dim: int = 8) -> list:
    # deterministic bytes -> float features (stand-in for a real encoder)
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] = (acc[i % dim] * 31 + b) % 997
    return [v / 997.0 for v in acc]


# ---------------------------------------------------------------------------
# Real decode kernels (pure stdlib: zlib + struct). These are correctness
# kernels — at 100 TB the same mapInPandas slot would call a vectorized
# codec (PIL-SIMD/nvJPEG), but the batch shape, dispatch, and feature
# contract are identical.
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_BMP_MAGIC = b"BM"
_JPEG_MAGIC = b"\xff\xd8"
_GIF_MAGIC = b"GIF8"


def decode_image(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode PNG, BMP, or baseline JPEG bytes to
    ``(width, height, channels, pixels)``.

    ``pixels`` is row-major interleaved RGB/RGBA/gray, top-down, 8 bits
    per sample. PNG: bit depth 8, color types 0 (gray), 2 (RGB), 6
    (RGBA), non-interlaced, with full support for the five scanline
    filters (None/Sub/Up/Average/Paeth). BMP: uncompressed (BI_RGB)
    24/32-bit, bottom-up or top-down, returned as RGB/RGBA. JPEG:
    baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr at
    sampling factors 1-2 (4:4:4 and 4:2:0 included), restart markers
    handled; progressive (SOF2 spectral selection) via the multi-scan
    path; successive approximation and factors >2 raise
    NotImplementedError.
    """
    if payload[:8] == _PNG_MAGIC:
        return _decode_png(payload)
    if payload[:2] == _BMP_MAGIC:
        return _decode_bmp(payload)
    if payload[:2] == _JPEG_MAGIC:
        return _decode_jpeg(payload)
    if payload[:4] == _GIF_MAGIC:
        return _decode_gif(payload)
    raise NotImplementedError(
        "only PNG/BMP/baseline-JPEG have in-container decoders; other "
        "formats (video) need codec libraries (PIL/ffmpeg) not available here"
    )


def _decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    import struct
    import zlib

    pos, idat = 8, []
    width = height = channels = None
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0:
                raise NotImplementedError(
                    f"PNG bit depth {depth} / interlace {interlace} unsupported"
                )
            channels = {0: 1, 2: 3, 6: 4}.get(color)
            if channels is None:
                raise NotImplementedError(f"PNG color type {color} unsupported")
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    out = bytearray(height * stride)
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, channels, bytes(out)


def _decode_bmp(payload: bytes) -> tuple[int, int, int, bytes]:
    import struct

    pix_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP compression {comp} / {bpp}bpp unsupported")
    top_down = height < 0
    height = abs(height)
    nch = bpp // 8
    row_bytes = width * nch
    src_stride = (row_bytes + 3) & ~3 if bpp == 24 else row_bytes
    out = bytearray(height * width * nch)
    for y in range(height):
        src_y = y if top_down else height - 1 - y
        row = payload[pix_off + src_y * src_stride :][:row_bytes]
        base = y * row_bytes
        for x in range(width):
            i = x * nch
            # BGR(A) -> RGB(A)
            out[base + i] = row[i + 2]
            out[base + i + 1] = row[i + 1]
            out[base + i + 2] = row[i]
            if nch == 4:
                out[base + i + 3] = row[i + 3]
    return width, height, nch, bytes(out)


def encode_png(width: int, height: int, channels: int, pix: bytes, filters=None) -> bytes:
    """Minimal PNG writer (8-bit, non-interlaced): the inverse of
    `_decode_png`, with an optional per-row forward filter choice —
    useful for writing image shards and for round-trip tests."""
    import struct
    import zlib

    color = {1: 0, 3: 2, 4: 6}[channels]
    stride = width * channels
    filters = filters or [0] * height
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pix[y * stride : (y + 1) * stride]
        f = filters[y]
        raw.append(f)
        for i in range(stride):
            a = line[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if f == 0:
                v = line[i]
            elif f == 1:
                v = (line[i] - a) & 0xFF
            elif f == 2:
                v = (line[i] - b) & 0xFF
            elif f == 3:
                v = (line[i] - ((a + b) >> 1)) & 0xFF
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = (line[i] - pred) & 0xFF
            raw.append(v)
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def encode_bmp24(width: int, height: int, rgb: bytes, top_down: bool = False) -> bytes:
    """Minimal uncompressed 24-bit BMP writer (BGR, 4-byte row padding)."""
    import struct

    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3
    body = bytearray()
    rows = range(height) if top_down else range(height - 1, -1, -1)
    for y in rows:
        line = bytearray()
        for x in range(width):
            i = (y * width + x) * 3
            line += bytes((rgb[i + 2], rgb[i + 1], rgb[i]))  # RGB -> BGR
        body += line + bytes(stride - row_bytes)
    pix_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", pix_off + len(body), 0, 0, pix_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, -height if top_down else height,
        1, 24, 0, len(body), 2835, 2835, 0, 0,
    )
    return bytes(header + dib + body)


# ---------------------------------------------------------------------------
# GIF87a/89a: pure-stdlib LZW decoder and a minimal writer. Scope:
# non-interlaced, global or local color table, extensions skipped,
# first image block decoded by decode_image (use decode_gif_frames for
# animations). Interlaced images raise NotImplementedError at the exact
# point a full codec library would take over.
# ---------------------------------------------------------------------------


def _gif_lzw_decode(data: bytes, min_code: int) -> bytearray:
    """GIF-variant LZW: LSB-first bit packing, CLEAR/EOI codes, code
    width grows to 12 bits as the table fills."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1

    def fresh():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh()
    code_size = min_code + 1
    bitpos, total = 0, len(data) * 8
    prev = None
    out = bytearray()
    while bitpos + code_size <= total:
        byte_i = bitpos >> 3
        window = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (window >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table, code_size, prev = fresh(), min_code + 1, None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:
            entry = prev + prev[:1]
            table.append(entry)
        # the decoder's table trails the encoder's by one entry (it
        # learns each phrase one code late), so it must widen one entry
        # EARLY to stay bit-aligned with the encoder's width switch
        if len(table) + 1 >= (1 << code_size) and code_size < 12:
            code_size += 1
        out += entry
        prev = entry
    return out


def _decode_gif(payload: bytes) -> tuple[int, int, int, bytes]:
    frames = decode_gif_frames(payload, max_frames=1)
    if not frames:
        raise ValueError("GIF contains no image block")
    return frames[0]


def decode_gif_frames(payload: bytes, max_frames: int | None = None) -> list:
    """Decode GIF image blocks to a list of ``(width, height, 3, rgb)``
    tuples (animated GIFs yield one tuple per frame; frames are decoded
    standalone — no disposal-method compositing)."""
    import struct

    if payload[:4] != _GIF_MAGIC or payload[4:6] not in (b"7a", b"9a"):
        raise NotImplementedError("not a GIF87a/GIF89a payload")
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
    frames: list = []
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label byte then sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _left, _top, w, h = struct.unpack_from("<HHHH", payload, pos + 1)
            iflags = payload[pos + 9]
            pos += 10
            if iflags & 0x40:
                raise NotImplementedError("interlaced GIF unsupported")
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                ct = payload[pos : pos + 3 * n]
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF image has no color table")
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _gif_lzw_decode(bytes(data), min_code)[: w * h]
            if len(idx) < w * h:
                raise ValueError("GIF LZW stream truncated")
            rgb = bytearray(w * h * 3)
            for i, k in enumerate(idx):
                rgb[3 * i : 3 * i + 3] = ct[3 * k : 3 * k + 3]
            frames.append((w, h, 3, bytes(rgb)))
            if max_frames is not None and len(frames) >= max_frames:
                break
        else:
            raise ValueError(f"bad GIF block 0x{block:02x}")
    return frames


def encode_gif(
    width: int, height: int, palette: bytes, indexes: bytes, loop: bool = False
) -> bytes:
    """Minimal GIF89a writer — inverse of `_decode_gif` for a single
    frame (pass `indexes` of len width*height into a `palette` of
    2/4/8/.../256 RGB triples). Uses the classic "uncompressed" LZW
    form: literal codes at fixed width with a CLEAR before the decoder
    would grow the code size — valid GIF, zero compression machinery."""
    import struct

    n_colors = len(palette) // 3
    depth = max(2, (n_colors - 1).bit_length())
    palette = palette + bytes(3 * ((1 << depth) - n_colors))  # pad to 2^depth
    min_code = depth
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    code_size = min_code + 1

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", width, height, 0x80 | ((depth - 1) & 7), 0, 0)
    out += palette
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)
    out += bytes([min_code])

    # LZW literal stream: after a CLEAR the decoder adds a table entry
    # per code starting with the 2nd and widens once table+1 reaches
    # 2^(min_code+1) — the k-th literal brings the table to
    # 2^min_code+1+k entries, so at most 2^min_code - 3 literals fit
    # between CLEARs with every code (including the CLEARs) staying at
    # fixed width min_code+1.
    acc = 0
    nbits = 0
    body = bytearray()

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            body.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    span = (1 << min_code) - 3
    for i, k in enumerate(indexes):
        if i and i % span == 0:
            put(clear)
        put(k)
    put(eoi)
    if nbits:
        body.append(acc & 0xFF)
    for off in range(0, len(body), 255):
        sub = body[off : off + 255]
        out += bytes([len(sub)]) + sub
    out += b"\x00\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81, sequential DCT, Huffman): pure-stdlib encoder
# and decoder. Scope: 8-bit samples, grayscale or 4:4:4 YCbCr (no chroma
# subsampling), the standard Annex K Huffman tables on the encode side,
# arbitrary DHT on the decode side, DRI/RSTn handled. Progressive (SOF2),
# arithmetic coding, and subsampled streams raise NotImplementedError at
# the exact point a full codec library would take over.
# ---------------------------------------------------------------------------

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# ITU-T T.81 Annex K.1: the example luminance/chrominance quant tables.
_QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
_QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3: standard Huffman table specs as (BITS[1..16], HUFFVAL).
_DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _huff_codes(spec):
    """Canonical Huffman code assignment (T.81 C.2): symbol -> (code, length)."""
    bits, vals = spec
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _dct_cos():
    import math

    return [
        [math.cos((2 * x + 1) * u * math.pi / 16.0) for x in range(8)]
        for u in range(8)
    ]


def _fdct_block(block):
    """Forward 8x8 DCT (T.81 A.3.3), float, on level-shifted samples."""
    import math

    cos = _dct_cos()
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    out = [0.0] * 64
    for v in range(8):
        for u in range(8):
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += block[y * 8 + x] * cos[u][x] * cos[v][y]
            cu = inv_sqrt2 if u == 0 else 1.0
            cv = inv_sqrt2 if v == 0 else 1.0
            out[v * 8 + u] = 0.25 * cu * cv * s
    return out


def _idct_block(coef):
    """Inverse 8x8 DCT (T.81 A.3.3), float, to level-shifted samples."""
    import math

    cos = _dct_cos()
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    out = [0.0] * 64
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    c = coef[v * 8 + u]
                    if c:
                        cu = inv_sqrt2 if u == 0 else 1.0
                        cv = inv_sqrt2 if v == 0 else 1.0
                        s += cu * cv * c * cos[u][x] * cos[v][y]
            out[y * 8 + x] = 0.25 * s
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill to byte boundary
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, extend-bits) encoding of a DC diff / AC value (F.1.2)."""
    if v == 0:
        return 0, 0
    a, size = abs(v), 0
    while a:
        a >>= 1
        size += 1
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def encode_jpeg(
    width: int, height: int, channels: int, pix: bytes, quant=None,
    subsampling: str = "444",
) -> bytes:
    """Baseline JFIF encoder: 8-bit grayscale (1 channel) or color
    (3 channels, RGB in -> YCbCr), 4:4:4 or 4:2:0 (`subsampling="420"`:
    2x2-averaged chroma, MCU-interleaved 4Y+Cb+Cr scan — what most
    real-world JPEGs use). `quant` optionally overrides the luma quant
    table (64 ints, row-major) — `[1]*64` gives a near-lossless stream
    for round-trip tests. Inverse of `_decode_jpeg`."""
    import struct

    if channels not in (1, 3):
        raise NotImplementedError("JPEG encoder: 1 or 3 channels only")
    if subsampling not in ("444", "420"):
        raise NotImplementedError("JPEG encoder: 444 or 420 subsampling only")
    sub420 = subsampling == "420" and channels == 3
    ql = list(quant) if quant is not None else _QUANT_LUMA
    qc = list(quant) if quant is not None else _QUANT_CHROMA

    # component planes, level-shifted; RGB -> YCbCr (JFIF / BT.601)
    planes = []
    n = width * height
    if channels == 1:
        planes.append([pix[i] - 128 for i in range(n)])
    else:
        ys, cbs, crs = [0.0] * n, [0.0] * n, [0.0] * n
        for i in range(n):
            r, g, b = pix[3 * i], pix[3 * i + 1], pix[3 * i + 2]
            ys[i] = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
            cbs[i] = -0.168736 * r - 0.331264 * g + 0.5 * b
            crs[i] = 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [ys, cbs, crs]

    dc_specs = [_DC_LUMA_SPEC] + [_DC_CHROMA_SPEC] * 2
    ac_specs = [_AC_LUMA_SPEC] + [_AC_CHROMA_SPEC] * 2
    dc_codes = [_huff_codes(s) for s in dc_specs]
    ac_codes = [_huff_codes(s) for s in ac_specs]
    quants = [ql] + [qc] * 2

    bw = _BitWriter()
    pred = [0] * channels

    def emit_block(comp: int, block) -> None:
        q = quants[comp]
        coef = _fdct_block(block)
        zz = [int(round(coef[_ZIGZAG[k]] / q[_ZIGZAG[k]])) for k in range(64)]
        diff = zz[0] - pred[comp]
        pred[comp] = zz[0]
        size, bits = _magnitude(diff)
        code, length = dc_codes[comp][size]
        bw.put(code, length)
        if size:
            bw.put(bits, size)
        run = 0
        for k in range(1, 64):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                zcode, zlen = ac_codes[comp][0xF0]  # ZRL
                bw.put(zcode, zlen)
                run -= 16
            size, bits = _magnitude(zz[k])
            acode, alen = ac_codes[comp][(run << 4) | size]
            bw.put(acode, alen)
            bw.put(bits, size)
            run = 0
        if run:
            ecode, elen = ac_codes[comp][0x00]  # EOB
            bw.put(ecode, elen)

    def sample_block(plane, pw: int, ph: int, bx: int, by: int):
        block = [0.0] * 64
        for y in range(8):
            sy = min(by * 8 + y, ph - 1)  # edge replication
            for x in range(8):
                sx = min(bx * 8 + x, pw - 1)
                block[y * 8 + x] = plane[sy * pw + sx]
        return block

    if not sub420:
        bx_max = (width + 7) // 8
        by_max = (height + 7) // 8
        for by in range(by_max):
            for bx in range(bx_max):
                for comp in range(channels):
                    emit_block(
                        comp, sample_block(planes[comp], width, height, bx, by)
                    )
    else:
        # 2x2-average chroma (edge-replicated), 16x16 MCUs: 4Y + Cb + Cr
        cw, ch = (width + 1) // 2, (height + 1) // 2
        sub = [[0.0] * (cw * ch) for _ in range(2)]
        for ci, src in ((0, planes[1]), (1, planes[2])):
            dst = sub[ci]
            for cy in range(ch):
                y0, y1 = 2 * cy, min(2 * cy + 1, height - 1)
                for cx in range(cw):
                    x0, x1 = 2 * cx, min(2 * cx + 1, width - 1)
                    dst[cy * cw + cx] = (
                        src[y0 * width + x0]
                        + src[y0 * width + x1]
                        + src[y1 * width + x0]
                        + src[y1 * width + x1]
                    ) / 4.0
        for my in range((height + 15) // 16):
            for mx in range((width + 15) // 16):
                for vy in range(2):
                    for vx in range(2):
                        emit_block(
                            0,
                            sample_block(
                                planes[0], width, height, mx * 2 + vx, my * 2 + vy
                            ),
                        )
                emit_block(1, sample_block(sub[0], cw, ch, mx, my))
                emit_block(2, sample_block(sub[1], cw, ch, mx, my))
    data = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(ql[_ZIGZAG[k]] for k in range(64)))
    if channels == 3:
        out += seg(0xFFDB, b"\x01" + bytes(qc[_ZIGZAG[k]] for k in range(64)))
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for comp in range(channels):
        hv = 0x22 if (sub420 and comp == 0) else 0x11
        sof += bytes((comp + 1, hv, 0 if comp == 0 else 1))
    out += seg(0xFFC0, sof)
    for cls, tid, spec in (
        (0, 0, _DC_LUMA_SPEC),
        (1, 0, _AC_LUMA_SPEC),
    ) + (((0, 1, _DC_CHROMA_SPEC), (1, 1, _AC_CHROMA_SPEC)) if channels == 3 else ()):
        bits, vals = spec
        out += seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    sos = bytes([channels])
    for comp in range(channels):
        t = 0 if comp == 0 else 1
        sos += bytes((comp + 1, (t << 4) | t))
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += data
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    real marker (returns it via `.marker`)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None

    def _fill(self) -> bool:
        if self.pos >= len(self.data):
            return False
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = 0xFF00 | nxt
                return False
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise ValueError("JPEG entropy data truncated")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int:
        """Skip to the next marker (after an entropy segment)."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                m = 0xFF00 | self.data[self.pos + 1]
                self.pos += 2
                self.marker = None
                return m
            self.pos += 1
        raise ValueError("JPEG: no trailing marker")


def _huff_decode_table(bits, vals):
    """(length, code) -> symbol map for canonical Huffman decode."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, table) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG: invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """Baseline sequential JPEG decoder (T.81): marker parse, Huffman
    entropy decode, dequantize, de-zigzag, iDCT, level shift, and
    YCbCr->RGB for 3-component streams. Supports 8-bit 4:4:4 / grayscale
    and restart intervals; progressive (SOF2) and subsampled streams
    raise NotImplementedError."""
    import struct

    pos = 2
    quants: dict = {}
    dc_tables: dict = {}
    ac_tables: dict = {}
    comps: list = []
    width = height = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise NotImplementedError("JPEG: 16-bit quant tables")
                tbl = [0] * 64
                for k in range(64):
                    tbl[_ZIGZAG[k]] = body[off + 1 + k]
                quants[tq] = tbl
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                cls, tid = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                nvals = sum(bits)
                vals = list(body[off + 17 : off + 17 + nvals])
                (dc_tables if cls == 0 else ac_tables)[tid] = _huff_decode_table(
                    bits, vals
                )
                off += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            _prec, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                h, v = hv >> 4, hv & 0xF
                if h not in (1, 2) or v not in (1, 2):
                    raise NotImplementedError(
                        f"JPEG: sampling factors {h}x{v} unsupported (1-2 only)"
                    )
                comps.append({"id": cid, "tq": tq, "h": h, "v": v})
        elif marker == 0xC2:  # SOF2 progressive -> dedicated multi-scan path
            return _decode_jpeg_progressive(payload)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                f"JPEG: only baseline (SOF0) / progressive (SOF2) supported,"
                f" got SOF{marker - 0xC0}"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS -> entropy data follows
            nscan = body[0]
            scan_sel = []
            for c in range(nscan):
                cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(x for x in comps if x["id"] == cid)
                comp["dc"] = dc_tables[tt >> 4]
                comp["ac"] = ac_tables[tt & 0xF]
                scan_sel.append(comp)
            br = _BitReader(payload, pos)
            ncomp = len(scan_sel)
            hmax = max(c["h"] for c in scan_sel)
            vmax = max(c["v"] for c in scan_sel)
            mcux = (width + 8 * hmax - 1) // (8 * hmax)
            mcuy = (height + 8 * vmax - 1) // (8 * vmax)
            strides = [mcux * 8 * c["h"] for c in scan_sel]
            planes = [
                [0] * (strides[ci] * mcuy * 8 * c["v"])
                for ci, c in enumerate(scan_sel)
            ]
            pred = [0] * ncomp
            mcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and mcu and mcu % restart_interval == 0:
                        m = br.align_to_marker()
                        if not (0xFFD0 <= m <= 0xFFD7):
                            raise ValueError(f"JPEG: expected RSTn, got {m:#x}")
                        pred = [0] * ncomp
                    for ci, comp in enumerate(scan_sel):
                        for vy in range(comp["v"]):
                            for vx in range(comp["h"]):
                                size = _read_symbol(br, comp["dc"])
                                diff = (
                                    _extend(br.bits(size), size) if size else 0
                                )
                                pred[ci] += diff
                                zz = [0] * 64
                                zz[0] = pred[ci]
                                k = 1
                                while k < 64:
                                    rs = _read_symbol(br, comp["ac"])
                                    if rs == 0x00:  # EOB
                                        break
                                    if rs == 0xF0:  # ZRL
                                        k += 16
                                        continue
                                    k += rs >> 4
                                    size = rs & 0xF
                                    if k > 63:
                                        raise ValueError("JPEG: AC index overflow")
                                    zz[k] = _extend(br.bits(size), size)
                                    k += 1
                                q = quants[comp["tq"]]
                                coef = [0] * 64
                                for k in range(64):
                                    coef[_ZIGZAG[k]] = zz[k] * q[_ZIGZAG[k]]
                                blk = _idct_block(coef)
                                plane = planes[ci]
                                stride = strides[ci]
                                bx = mx * comp["h"] + vx
                                by = my * comp["v"] + vy
                                for y in range(8):
                                    base = (by * 8 + y) * stride + bx * 8
                                    for x in range(8):
                                        v = int(round(blk[y * 8 + x] + 128.0))
                                        plane[base + x] = (
                                            0 if v < 0 else (255 if v > 255 else v)
                                        )
                    mcu += 1
            # crop padding, upsample subsampled planes, interleave,
            # color-convert (nearest-neighbor chroma upsampling)
            if ncomp == 1:
                stride = strides[0]
                out = bytearray(width * height)
                for y in range(height):
                    row = planes[0][y * stride : y * stride + width]
                    out[y * width : (y + 1) * width] = bytes(row)
                return width, height, 1, bytes(out)
            out = bytearray(width * height * 3)
            hs = [c["h"] for c in scan_sel]
            vs = [c["v"] for c in scan_sel]
            for y in range(height):
                for x in range(width):
                    sv = [
                        planes[ci][
                            (y * vs[ci] // vmax) * strides[ci]
                            + (x * hs[ci] // hmax)
                        ]
                        for ci in range(3)
                    ]
                    Y, cb, cr = sv[0], sv[1] - 128, sv[2] - 128
                    r = int(round(Y + 1.402 * cr))
                    g = int(round(Y - 0.344136 * cb - 0.714136 * cr))
                    b = int(round(Y + 1.772 * cb))
                    o = (y * width + x) * 3
                    out[o] = 0 if r < 0 else (255 if r > 255 else r)
                    out[o + 1] = 0 if g < 0 else (255 if g > 255 else g)
                    out[o + 2] = 0 if b < 0 else (255 if b > 255 else b)
            return width, height, 3, bytes(out)
        elif marker == 0xD9:  # EOI before SOS: malformed
            break
    raise ValueError("JPEG: no SOS segment found")


def _decode_jpeg_progressive(payload: bytes) -> tuple[int, int, int, bytes]:
    """Progressive JPEG (SOF2), SPECTRAL-SELECTION form: coefficients
    accumulate across multiple scans (an interleaved DC scan, then
    per-component AC band scans with EOB-run coding), then one
    dequantize + iDCT + color-convert at the end. Successive
    approximation (Ah/Al != 0) and subsampled progressive streams raise
    NotImplementedError — the boundary moves from 'progressive' to
    'refinement passes'."""
    import struct

    pos = 2
    quants: dict = {}
    dc_tables: dict = {}
    ac_tables: dict = {}
    comps: list = []
    width = height = None
    restart_interval = 0
    coefs: list = []  # per comp: list of 64-int blocks, natural order
    bx_max = by_max = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise NotImplementedError("JPEG: 16-bit quant tables")
                tbl = [0] * 64
                for k in range(64):
                    tbl[_ZIGZAG[k]] = body[off + 1 + k]
                quants[tq] = tbl
                off += 65
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                cls, tid = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                nvals = sum(bits)
                vals = list(body[off + 17 : off + 17 + nvals])
                (dc_tables if cls == 0 else ac_tables)[tid] = _huff_decode_table(
                    bits, vals
                )
                off += 17 + nvals
        elif marker == 0xC2:
            _prec, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                if hv != 0x11:
                    raise NotImplementedError(
                        "JPEG: subsampled progressive unsupported (4:4:4 only)"
                    )
                comps.append({"id": cid, "tq": tq})
            bx_max = (width + 7) // 8
            by_max = (height + 7) // 8
            coefs = [
                [[0] * 64 for _ in range(bx_max * by_max)] for _ in range(ncomp)
            ]
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            nscan = body[0]
            scan = []
            for c in range(nscan):
                cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                ci = next(i for i, x in enumerate(comps) if x["id"] == cid)
                scan.append((ci, tt >> 4, tt & 0xF))
            ss, se, ahal = body[1 + 2 * nscan : 4 + 2 * nscan]
            if ahal != 0:
                raise NotImplementedError(
                    "JPEG: progressive successive approximation unsupported"
                )
            br = _BitReader(payload, pos)
            if ss == 0:  # DC scan (interleaved over the scan's components)
                pred = [0] * len(scan)
                mcu = 0
                for bidx in range(bx_max * by_max):
                    if restart_interval and mcu and mcu % restart_interval == 0:
                        m = br.align_to_marker()
                        if not (0xFFD0 <= m <= 0xFFD7):
                            raise ValueError(f"JPEG: expected RSTn, got {m:#x}")
                        pred = [0] * len(scan)
                    for si, (ci, tdc, _tac) in enumerate(scan):
                        size = _read_symbol(br, dc_tables[tdc])
                        diff = _extend(br.bits(size), size) if size else 0
                        pred[si] += diff
                        coefs[ci][bidx][0] = pred[si]
                    mcu += 1
            else:  # AC band scan: exactly one component, EOB-run coded
                if len(scan) != 1:
                    raise ValueError("JPEG: progressive AC scan must be 1-component")
                ci, _tdc, tac = scan[0]
                table = ac_tables[tac]
                eobrun = 0
                for bidx in range(bx_max * by_max):
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = _read_symbol(br, table)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            eobrun = (1 << r) - 1 + (br.bits(r) if r else 0)
                            break
                        k += r
                        if k > se:
                            raise ValueError("JPEG: AC index past band end")
                        coefs[ci][bidx][_ZIGZAG[k]] = _extend(br.bits(s), s)
                        k += 1
            # resync to the next marker after this scan's entropy data
            p = br.pos
            while p + 1 < len(payload) and not (
                payload[p] == 0xFF and payload[p + 1] != 0x00
            ):
                p += 1
            pos = p
    if width is None:
        raise ValueError("JPEG: no SOF2 segment found")
    ncomp = len(comps)
    stride = bx_max * 8
    planes = [[0] * (stride * by_max * 8) for _ in range(ncomp)]
    for ci, comp in enumerate(comps):
        q = quants[comp["tq"]]
        for bidx in range(bx_max * by_max):
            by, bx = divmod(bidx, bx_max)
            coef = [coefs[ci][bidx][i] * q[i] for i in range(64)]
            blk = _idct_block(coef)
            plane = planes[ci]
            for y in range(8):
                base = (by * 8 + y) * stride + bx * 8
                for x in range(8):
                    v = int(round(blk[y * 8 + x] + 128.0))
                    plane[base + x] = 0 if v < 0 else (255 if v > 255 else v)
    if ncomp == 1:
        out = bytearray(width * height)
        for y in range(height):
            out[y * width : (y + 1) * width] = bytes(
                planes[0][y * stride : y * stride + width]
            )
        return width, height, 1, bytes(out)
    out = bytearray(width * height * 3)
    yp, cbp, crp = planes
    for y in range(height):
        for x in range(width):
            i = y * stride + x
            Y, cb, cr = yp[i], cbp[i] - 128, crp[i] - 128
            r = int(round(Y + 1.402 * cr))
            g = int(round(Y - 0.344136 * cb - 0.714136 * cr))
            b = int(round(Y + 1.772 * cb))
            o = (y * width + x) * 3
            out[o] = 0 if r < 0 else (255 if r > 255 else r)
            out[o + 1] = 0 if g < 0 else (255 if g > 255 else g)
            out[o + 2] = 0 if b < 0 else (255 if b > 255 else b)
    return width, height, 3, bytes(out)


def encode_jpeg_progressive(
    width: int, height: int, channels: int, pix: bytes, quant=None
) -> bytes:
    """Progressive JFIF encoder, spectral-selection form: one
    interleaved DC scan, then one full-band (1..63) AC scan per
    component with per-block EOBs — the minimal legal SOF2 layout, and
    the scan structure `_decode_jpeg_progressive` accepts. 4:4:4 /
    grayscale only; shares the quantizers, Huffman specs, DCT, and bit
    writer with `encode_jpeg`."""
    import struct

    if channels not in (1, 3):
        raise NotImplementedError("JPEG encoder: 1 or 3 channels only")
    ql = list(quant) if quant is not None else _QUANT_LUMA
    qc = list(quant) if quant is not None else _QUANT_CHROMA
    quants = [ql] + [qc] * (channels - 1)

    n = width * height
    if channels == 1:
        planes = [[pix[i] - 128 for i in range(n)]]
    else:
        ys, cbs, crs = [0.0] * n, [0.0] * n, [0.0] * n
        for i in range(n):
            r, g, b = pix[3 * i], pix[3 * i + 1], pix[3 * i + 2]
            ys[i] = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
            cbs[i] = -0.168736 * r - 0.331264 * g + 0.5 * b
            crs[i] = 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [ys, cbs, crs]

    bx_max = (width + 7) // 8
    by_max = (height + 7) // 8
    zz_blocks = []  # per comp: per block: zigzag-ordered quantized coefs
    for comp in range(channels):
        plane, q = planes[comp], quants[comp]
        blocks = []
        for by in range(by_max):
            for bx in range(bx_max):
                block = [0.0] * 64
                for y in range(8):
                    sy = min(by * 8 + y, height - 1)
                    for x in range(8):
                        sx = min(bx * 8 + x, width - 1)
                        block[y * 8 + x] = plane[sy * width + sx]
                coef = _fdct_block(block)
                blocks.append(
                    [
                        int(round(coef[_ZIGZAG[k]] / q[_ZIGZAG[k]]))
                        for k in range(64)
                    ]
                )
        zz_blocks.append(blocks)

    dc_specs = [_DC_LUMA_SPEC] + [_DC_CHROMA_SPEC] * (channels - 1)
    ac_specs = [_AC_LUMA_SPEC] + [_AC_CHROMA_SPEC] * (channels - 1)
    dc_codes = [_huff_codes(s) for s in dc_specs]
    ac_codes = [_huff_codes(s) for s in ac_specs]

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(ql[_ZIGZAG[k]] for k in range(64)))
    if channels == 3:
        out += seg(0xFFDB, b"\x01" + bytes(qc[_ZIGZAG[k]] for k in range(64)))
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for comp in range(channels):
        sof += bytes((comp + 1, 0x11, 0 if comp == 0 else 1))
    out += seg(0xFFC2, sof)  # SOF2: progressive
    for cls, tid, spec in (
        (0, 0, _DC_LUMA_SPEC),
        (1, 0, _AC_LUMA_SPEC),
    ) + (((0, 1, _DC_CHROMA_SPEC), (1, 1, _AC_CHROMA_SPEC)) if channels == 3 else ()):
        bits, vals = spec
        out += seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    # scan 1: interleaved DC, Ss=Se=0
    bw = _BitWriter()
    pred = [0] * channels
    for bidx in range(bx_max * by_max):
        for comp in range(channels):
            dc = zz_blocks[comp][bidx][0]
            diff = dc - pred[comp]
            pred[comp] = dc
            size, bits = _magnitude(diff)
            code, length = dc_codes[comp][size]
            bw.put(code, length)
            if size:
                bw.put(bits, size)
    sos = bytes([channels])
    for comp in range(channels):
        t = 0 if comp == 0 else 1
        sos += bytes((comp + 1, t << 4))
    sos += bytes((0, 0, 0))  # Ss=0 Se=0 AhAl=0
    out += seg(0xFFDA, sos)
    out += bw.flush()

    # per-component AC scans: Ss=1 Se=63, per-block EOB (eobrun of 1)
    for comp in range(channels):
        bw = _BitWriter()
        for bidx in range(bx_max * by_max):
            zz = zz_blocks[comp][bidx]
            run = 0
            for k in range(1, 64):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    zcode, zlen = ac_codes[comp][0xF0]
                    bw.put(zcode, zlen)
                    run -= 16
                size, bits = _magnitude(zz[k])
                acode, alen = ac_codes[comp][(run << 4) | size]
                bw.put(acode, alen)
                bw.put(bits, size)
                run = 0
            if run:
                ecode, elen = ac_codes[comp][0x00]  # EOB (eobrun = 1)
                bw.put(ecode, elen)
        t = 0 if comp == 0 else 1
        out += seg(0xFFDA, bytes([1, comp + 1, t]) + bytes((1, 63, 0)))
        out += bw.flush()

    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# AVI/MJPEG video: the RIFF container walked with the same stdlib struct
# machinery as WAV, each '00dc' frame chunk a complete baseline JPEG
# decoded by _decode_jpeg. Motion-JPEG is the one video coding a pure
# stdlib implementation can really decode — inter-frame codecs (H.264,
# VP9, AV1) raise at the boundary where ffmpeg would take over.
# ---------------------------------------------------------------------------


def decode_video(payload: bytes) -> tuple[int, int, int, list]:
    """Decode an AVI/MJPEG payload to ``(width, height, n_frames,
    frames)`` where each frame is the `decode_image` tuple
    ``(width, height, channels, pixels)``.

    Walks RIFF 'AVI ' → LIST 'hdrl' (avih gives dimensions) → LIST
    'movi' ('00dc'/'00db' chunks are frames; MJPEG frames start with the
    JPEG SOI marker and go through the baseline JPEG decoder). Non-MJPEG
    streams raise NotImplementedError at the codec boundary."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise NotImplementedError("not a RIFF/AVI payload")
    width = height = None
    frames: list = []

    def walk(pos: int, end: int) -> None:
        nonlocal width, height
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            (clen,) = struct.unpack_from("<I", payload, pos + 4)
            body_at = pos + 8
            if cid == b"LIST":
                walk(body_at + 4, body_at + clen)  # skip the list type tag
            elif cid == b"avih":
                # dwWidth/dwHeight at offsets 32/36 of the main header
                width, height = struct.unpack_from("<II", payload, body_at + 32)
            elif cid[2:4] in (b"dc", b"db"):
                frame = payload[body_at : body_at + clen]
                if frame[:2] != _JPEG_MAGIC:
                    raise NotImplementedError(
                        "only MJPEG (JPEG-per-frame) AVI streams are decodable "
                        "in-container; inter-frame codecs need ffmpeg"
                    )
                frames.append(_decode_jpeg(frame))
            pos = body_at + clen + (clen & 1)  # chunks are word-aligned

    walk(12, len(payload))
    if width is None:
        raise ValueError("AVI missing avih header")
    return width, height, len(frames), frames


def encode_avi_mjpeg(width: int, height: int, jpeg_frames: list) -> bytes:
    """Minimal AVI/MJPEG writer — inverse of `decode_video`. Takes
    already-encoded JPEG frame payloads (from `encode_jpeg`) so tests
    control the frame content exactly; fps is fixed metadata (25)."""
    import struct

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    n = len(jpeg_frames)
    max_len = max((len(f) for f in jpeg_frames), default=0)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        40000,  # dwMicroSecPerFrame (25 fps)
        0, 0, 0x10, n, 0, 1, 0, width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, 25, 0, n, max_len, 0xFFFFFFFF, 0,
        0, 0, width, height,
    )
    # BITMAPINFOHEADER
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def resize_image_nn(
    width: int, height: int, channels: int, pix: bytes, tw: int, th: int
) -> bytes:
    """REAL nearest-neighbor resample of a decoded pixel buffer:
    target pixel (x, y) copies source pixel (x*w//tw, y*h//th) — pure
    integer index arithmetic, so any engine reproduces the selected
    pixels (and so the downstream statistics) exactly. The quality
    ladder (bilinear/Lanczos) swaps into this same slot."""
    out = bytearray(tw * th * channels)
    for y in range(th):
        sy = y * height // th
        row = sy * width
        for x in range(tw):
            si = (row + x * width // tw) * channels
            di = (y * tw + x) * channels
            out[di : di + channels] = pix[si : si + channels]
    return bytes(out)


def decode_audio(payload: bytes) -> tuple[int, int, "object"]:
    """Decode a PCM WAV payload to ``(sample_rate, channels, samples)``.

    Supports RIFF/WAVE with format code 1 (integer PCM), 16-bit samples.
    ``samples`` is an int16 numpy array, frame-major interleaved. Chunks
    are walked properly (fmt/data need not be adjacent — some writers
    insert LIST/fact chunks).
    """
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    pos = 12
    sr = nch = bits = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt, nch, sr = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"WAV format {fmt} / {bits}-bit unsupported (PCM16 only)"
                )
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if sr is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    return sr, nch, np.frombuffer(data, dtype="<i2")


def encode_wav(sample_rate: int, channels: int, samples) -> bytes:
    """Minimal PCM16 WAV writer — inverse of `decode_audio`."""
    import struct

    import numpy as np

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _real_features(payload: bytes, dim: int = 8) -> list:
    """Decode and reduce to a `dim`-float feature vector: normalized
    dimensions plus integer-exact per-channel means (sum/n/255 — stable
    across platforms, no float accumulation order dependence)."""
    import numpy as np

    width, height, nch, pix = decode_image(payload)
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(height * width, nch)
    sums = arr.sum(axis=0, dtype=np.int64)
    n = height * width
    means = [float(s) / (n * 255.0) for s in sums]
    feats = [
        min(width / 1024.0, 1.0),
        min(height / 1024.0, 1.0),
        nch / 4.0,
        float(int(arr.min()) / 255.0),
        float(int(arr.max()) / 255.0),
    ] + means
    return (feats + [0.0] * dim)[:dim]


def extract_features(media: DataFrame, decode: str = "fake") -> DataFrame:
    """Batch feature extraction over binary payloads via mapInPandas.

    Arrow delivers whole column batches to Python; each batch is
    processed vectorized-per-row without JVM round trips. At scale this
    is the standard shape for GPU/codec stages: repartition to match
    worker slots, then one python worker per partition streams batches.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                # PNG/BMP decode in-container; JPEG/audio/video raise
                # NotImplementedError inside decode_image (codec libs absent).
                feats = [_real_features(p) for p in pdf["payload"]]
            else:
                feats = [_fake_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "feat": feats,
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame sampling stub: emit one 'frame' per N payload bytes for video
    rows (1:N row explosion inside mapInPandas, the real frame-sampler's
    shape).

    The explode is vectorized — np.repeat for row replication, a
    cumsum-offset trick for per-row frame indices — so the template a
    real codec kernel would copy has no per-row Python loop (only the
    unavoidable per-frame byte-slice that produces each output payload).
    """
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["media_type"] == "video/mp4"]
            if len(vids) == 0:
                yield pd.DataFrame(
                    {"doc_id": [], "frame_idx": [], "frame_bytes": []}
                ).astype({"doc_id": "int64", "frame_idx": "int32"})
                continue
            lens = vids["payload"].map(len).to_numpy()
            reps = np.maximum(np.ceil(np.maximum(lens, 1) / every_n_bytes), 1).astype(
                "int64"
            )
            # frame_idx = position within each row's run of `reps` frames
            idx = np.arange(reps.sum()) - np.repeat(np.cumsum(reps) - reps, reps)
            ids = np.repeat(vids["doc_id"].to_numpy(), reps)
            payloads = np.repeat(vids["payload"].to_numpy(), reps)
            starts = idx * every_n_bytes
            frames = [
                bytes(p[s : s + every_n_bytes]) for p, s in zip(payloads, starts)
            ]
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idx.astype("int32"), "frame_bytes": frames}
            )

    return media.mapInPandas(kernel, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id bigint, media_type string, width int, height int, "
    "out_width int, out_height int, out_bytes binary"
)


def resize_media(media: DataFrame, max_width: int = 128) -> DataFrame:
    """Resize stub (images/videos): cap width at `max_width`, scale
    height by the same integer ratio, and emit a deterministically
    'downscaled' payload (byte prefix proportional to the area ratio —
    a real kernel would hand the batch to PIL/ffmpeg here; the metadata
    arithmetic, vectorized batch shape, and output schema are the real
    contract). Integer arithmetic only (floor(h*tw/w)) so any engine
    reproduces the output dimensions exactly."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = pdf[pdf["media_type"] != "audio/wav"]
            if len(imgs) == 0:
                yield pd.DataFrame(
                    {
                        "doc_id": [],
                        "media_type": [],
                        "width": [],
                        "height": [],
                        "out_width": [],
                        "out_height": [],
                        "out_bytes": [],
                    }
                ).astype(
                    {
                        "doc_id": "int64",
                        "width": "int32",
                        "height": "int32",
                        "out_width": "int32",
                        "out_height": "int32",
                    }
                )
                continue
            w = imgs["width"].to_numpy()
            h = imgs["height"].to_numpy()
            tw = np.minimum(w, max_width)
            th = (h * tw) // w  # integer-exact scaled height
            lens = imgs["payload"].map(len).to_numpy()
            keep = np.maximum((lens * tw) // w, 1)
            out = [bytes(p[:k]) for p, k in zip(imgs["payload"], keep)]
            yield pd.DataFrame(
                {
                    "doc_id": imgs["doc_id"],
                    "media_type": imgs["media_type"],
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "out_width": tw.astype("int32"),
                    "out_height": th.astype("int32"),
                    "out_bytes": out,
                }
            )

    return media.mapInPandas(kernel, schema=RESIZE_SCHEMA)
