"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as `binary` columns with a metadata struct;
decode / feature-extraction / resize / frame-sampling run as
Arrow-batched pandas iterators (`mapInPandas`) so payload bytes never
round-trip through Python row objects.

Decode support is tiered by what the container offers:
- `decode="fake"`: deterministic feature vector from raw bytes —
  exercises the full Arrow/batch/schema plumbing with zero codecs.
- `decode="real"`: pure-stdlib decoders for PNG (8-bit gray/RGB/RGBA,
  non-interlaced; zlib + all five scanline filters) and uncompressed
  24/32-bit BMP, dispatched on magic bytes. Formats that genuinely need
  external codecs (JPEG/audio/video) still raise NotImplementedError at
  the exact point PIL/ffmpeg would be called.
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


def decode_image(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode PNG or BMP bytes to ``(width, height, channels, pixels)``.

    ``pixels`` is row-major interleaved RGB/RGBA/gray, top-down, 8 bits
    per sample. PNG: bit depth 8, color types 0 (gray), 2 (RGB), 6
    (RGBA), non-interlaced, with full support for the five scanline
    filters (None/Sub/Up/Average/Paeth). BMP: uncompressed (BI_RGB)
    24/32-bit, bottom-up or top-down, returned as RGB/RGBA.
    """
    if payload[:8] == _PNG_MAGIC:
        return _decode_png(payload)
    if payload[:2] == _BMP_MAGIC:
        return _decode_bmp(payload)
    raise NotImplementedError(
        "only PNG/BMP have in-container decoders; JPEG/audio/video need "
        "codec libraries (PIL/ffmpeg) not available here"
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
