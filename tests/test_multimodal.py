"""Multimodal plumbing tests: schema, determinism, 1:N frame explosion."""

from __future__ import annotations

import pytest

from chchfr_data_collection_spark.multimodal import (
    attach_fake_media,
    extract_features,
    sample_frames,
)
from chchfr_data_collection_spark.session import load_table


@pytest.fixture(scope="module")
def media(spark, sf_small):
    return attach_fake_media(load_table(spark, sf_small, "documents")).cache()


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "doc_id", "media_type", "n_bytes", "width", "height", "payload",
    ]
    assert media.schema["payload"].dataType.simpleString() == "binary"


def test_extract_features_deterministic(media):
    f1 = {r.doc_id: r.feat for r in extract_features(media).collect()}
    f2 = {r.doc_id: r.feat for r in extract_features(media).collect()}
    assert f1 == f2
    dim = {len(v) for v in f1.values()}
    assert dim == {8}
    assert len(f1) == media.count()  # 1:1, no rows lost across Arrow batches


from chchfr_data_collection_spark.multimodal import (  # noqa: E402
    encode_bmp24 as _encode_bmp24,
    encode_png as _encode_png,
)


def test_png_decode_all_filters_roundtrip():
    """decode_image inverts every PNG scanline filter (None/Sub/Up/
    Average/Paeth) on an 8-bit RGB image."""
    import random

    from chchfr_data_collection_spark.multimodal import decode_image

    rng = random.Random(42)
    w, h, c = 7, 5, 3
    pix = bytes(rng.randrange(256) for _ in range(w * h * c))
    for filters in ([0] * h, [1] * h, [2] * h, [3] * h, [4] * h, [0, 1, 2, 3, 4]):
        png = _encode_png(w, h, c, pix, filters=filters)
        assert decode_image(png) == (w, h, c, pix), f"filters={filters}"


def test_png_decode_gray_and_rgba():
    import random

    from chchfr_data_collection_spark.multimodal import decode_image

    rng = random.Random(7)
    gray = bytes(rng.randrange(256) for _ in range(6 * 4))
    assert decode_image(_encode_png(6, 4, 1, gray)) == (6, 4, 1, gray)
    rgba = bytes(rng.randrange(256) for _ in range(3 * 2 * 4))
    assert decode_image(_encode_png(3, 2, 4, rgba, filters=[4, 1])) == (3, 2, 4, rgba)


def test_bmp_decode_both_orientations():
    import random

    from chchfr_data_collection_spark.multimodal import decode_image

    rng = random.Random(9)
    w, h = 5, 3  # odd width exercises the 4-byte row padding
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    assert decode_image(_encode_bmp24(w, h, rgb)) == (w, h, 3, rgb)
    assert decode_image(_encode_bmp24(w, h, rgb, top_down=True)) == (w, h, 3, rgb)


def test_extract_features_real_decode_via_spark(spark):
    """End-to-end: real PNG/BMP payloads through the mapInPandas kernel —
    features carry exact dimension and integer-exact channel means."""
    from chchfr_data_collection_spark.multimodal import extract_features

    # 2x2 RGB: solid red, green, blue, white -> channel means 2/4*255ths
    pix = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    png = _encode_png(2, 2, 3, pix)
    bmp = _encode_bmp24(2, 2, pix)
    rows = [(1, "image/png", len(png), 2, 2, bytearray(png)),
            (2, "image/bmp", len(bmp), 2, 2, bytearray(bmp))]
    media = spark.createDataFrame(
        rows, "doc_id bigint, media_type string, n_bytes int, width int, "
        "height int, payload binary",
    )
    feats = {r.doc_id: r.feat for r in extract_features(media, decode="real").collect()}
    expect_mean = (255 + 255) / (4 * 255.0)  # each channel lit in 2 of 4 px
    for doc_id in (1, 2):
        f = feats[doc_id]
        assert f[0] == pytest.approx(2 / 1024.0)   # width
        assert f[1] == pytest.approx(2 / 1024.0)   # height
        assert f[2] == pytest.approx(3 / 4.0)      # channels
        assert f[3] == 0.0 and f[4] == 1.0          # min/max samples
        assert f[5] == pytest.approx(expect_mean)   # R mean
        assert f[6] == pytest.approx(expect_mean)   # G mean
        assert f[7] == pytest.approx(expect_mean)   # B mean
    # PNG and BMP decode to identical pixels -> identical features
    assert feats[1] == feats[2]


def test_real_decode_unsupported_format_raises():
    from chchfr_data_collection_spark.multimodal import decode_image

    # TIFF and WebP magics: formats with no in-container decoder
    with pytest.raises(NotImplementedError):
        decode_image(b"II*\x00 not a supported payload")
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")


def test_jpeg_decode_roundtrip_and_boundaries():
    """Baseline JPEG: gray and color round-trips through the real
    Huffman/DCT path; sampling factors beyond 2 and arithmetic-coded
    frames raise NotImplementedError at the codec boundary (4:2:0 and
    progressive spectral selection are REAL as of round 5 — see
    test_jpeg_420_roundtrip / test_jpeg_progressive_*)."""
    import struct

    from chchfr_data_collection_spark.multimodal import decode_image, encode_jpeg

    img = bytes((7 * i) % 256 for i in range(16 * 8))
    w, h, c, out = decode_image(encode_jpeg(16, 8, 1, img, quant=[1] * 64))
    assert (w, h, c) == (16, 8, 1)
    assert max(abs(a - b) for a, b in zip(out, img)) <= 2

    rgb = bytes((13 * i) % 256 for i in range(8 * 8 * 3))
    w, h, c, out = decode_image(encode_jpeg(8, 8, 3, rgb, quant=[1] * 64))
    assert (w, h, c) == (8, 8, 3)
    assert max(abs(a - b) for a, b in zip(out, rgb)) <= 4

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    sof_body = struct.pack(">BHHB", 8, 8, 8, 1) + bytes((1, 0x11, 0))
    arith = b"\xff\xd8" + seg(0xFFC9, sof_body) + b"\xff\xd9"  # SOF9
    with pytest.raises(NotImplementedError):
        decode_image(arith)

    oversampled = b"\xff\xd8" + seg(
        0xFFC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes((1, 0x33, 0))
    ) + b"\xff\xd9"
    with pytest.raises(NotImplementedError):
        decode_image(oversampled)


def test_jpeg_420_roundtrip():
    """4:2:0 chroma subsampling through the real MCU-interleaved path:
    2x2-constant-color images survive q=1 subsampled round-trips within
    rounding; gray-through-color images are chroma-exact; odd sizes
    exercise the MCU edge padding."""
    from chchfr_data_collection_spark.multimodal import decode_image, encode_jpeg

    for W0, H0 in ((16, 16), (18, 10), (8, 8)):
        rgb = bytearray(W0 * H0 * 3)
        for y in range(H0):
            for x in range(W0):
                # constant over each 2x2 so the chroma average is exact
                r = ((x // 2) * 34 + (y // 2) * 8) % 256
                g = ((x // 2) * 12 + (y // 2) * 40) % 256
                b = ((x // 2) * 54 + (y // 2) * 2) % 256
                o = (y * W0 + x) * 3
                rgb[o], rgb[o + 1], rgb[o + 2] = r, g, b
        w, h, c, out = decode_image(
            encode_jpeg(W0, H0, 3, bytes(rgb), quant=[1] * 64, subsampling="420")
        )
        assert (w, h, c) == (W0, H0, 3)
        assert max(abs(a - b) for a, b in zip(out, bytes(rgb))) <= 4


def test_avi_mjpeg_decode_roundtrip_and_boundaries():
    """AVI/MJPEG: container walk + per-frame JPEG decode round-trips
    multi-frame videos; non-MJPEG frame payloads and non-AVI RIFFs raise
    NotImplementedError at the codec boundary."""
    from chchfr_data_collection_spark.multimodal import (
        decode_video,
        encode_avi_mjpeg,
        encode_jpeg,
    )

    frames = [
        bytes((7 * i + fi) % 256 for i in range(16 * 8)) for fi in range(3)
    ]
    avi = encode_avi_mjpeg(
        16, 8, [encode_jpeg(16, 8, 1, f, quant=[1] * 64) for f in frames]
    )
    w, h, n, decoded = decode_video(avi)
    assert (w, h, n) == (16, 8, 3)
    for (fw, fh, fc, pix), src in zip(decoded, frames):
        assert (fw, fh, fc) == (16, 8, 1)
        assert max(abs(a - b) for a, b in zip(pix, src)) <= 2

    with pytest.raises(NotImplementedError):
        decode_video(b"RIFF\x04\x00\x00\x00WAVE")  # not an AVI
    # an AVI whose frame chunk is not JPEG -> boundary error
    raw = encode_avi_mjpeg(8, 8, [b"\x00\x01\x02\x03"])
    with pytest.raises(NotImplementedError):
        decode_video(raw)


def test_wav_roundtrip_and_chunk_walking():
    """PCM16 WAV encode→decode round-trips mono and stereo; the chunk
    walker skips unknown chunks between fmt and data."""
    import struct

    from chchfr_data_collection_spark.multimodal import decode_audio, encode_wav

    mono = [(k * 1234 - 7000) % 65536 - 32768 for k in range(31)]  # odd count
    sr, nch, got = decode_audio(encode_wav(8000, 1, mono))
    assert (sr, nch, got.tolist()) == (8000, 1, mono)

    stereo = list(range(-16, 16))
    sr, nch, got = decode_audio(encode_wav(44100, 2, stereo))
    assert (sr, nch, got.tolist()) == (44100, 2, stereo)

    # splice a LIST chunk between fmt and data (odd length -> pad byte)
    wav = encode_wav(8000, 1, mono)
    fmt_end = 12 + 8 + 16
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = wav[:fmt_end] + junk + wav[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    sr, nch, got = decode_audio(spliced)
    assert (sr, nch, got.tolist()) == (8000, 1, mono)

    with pytest.raises(NotImplementedError):
        decode_audio(b"OggS not a wav")


def test_sample_frames_video_only_1_to_n(media):
    frames = sample_frames(media, every_n_bytes=64)
    vids = media.filter(media.media_type == "video/mp4")
    n_video = vids.count()
    out = frames.collect()
    assert {r.doc_id for r in out} <= {r.doc_id for r in vids.select("doc_id").collect()}
    # every video doc yields ceil(len/64) frames (>=1)
    per_doc = {}
    for r in out:
        per_doc[r.doc_id] = max(per_doc.get(r.doc_id, 0), r.frame_idx + 1)
    sizes = {r.doc_id: r.n_bytes for r in vids.collect()}
    assert len(per_doc) == n_video
    for doc_id, nframes in per_doc.items():
        expect = max(1, -(-sizes[doc_id] // 64))
        assert nframes == expect


def test_resize_integer_invariants(spark, sf_small):
    """Resize stub: width capped, aspect preserved under integer floor
    (out_h = floor(h*out_w/w)), audio rows dropped, payload prefix
    proportional and non-empty."""
    from chchfr_data_collection_spark.multimodal import (
        attach_fake_media,
        resize_media,
    )
    from chchfr_data_collection_spark.session import load_table

    media = attach_fake_media(load_table(spark, sf_small, "documents"))
    out = resize_media(media, max_width=128).collect()
    assert out
    for r in out:
        assert r["media_type"] != "audio/wav"
        assert r["out_width"] == min(r["width"], 128)
        assert r["out_height"] == (r["height"] * r["out_width"]) // r["width"]
        assert 1 <= len(r["out_bytes"])


def test_gif_roundtrip_and_boundaries():
    """encode_gif -> decode_image is bit-exact (LZW is lossless); the
    decoder handles local color tables absent, 89a extensions skipped,
    interlace rejected at the codec boundary, and animated payloads via
    decode_gif_frames."""
    import pytest

    from chchfr_data_collection_spark.multimodal import (
        decode_gif_frames,
        decode_image,
        encode_gif,
    )

    palette = bytes(c for i in range(16) for c in (17 * i, 255 - 17 * i, (37 * i) % 256))
    idx = bytes((7 * p) % 16 for p in range(20))
    g = encode_gif(5, 4, palette, idx)
    w, h, c, rgb = decode_image(g)
    assert (w, h, c) == (5, 4, 3)
    assert rgb == b"".join(palette[3 * k : 3 * k + 3] for k in idx)

    # 89a with a graphic-control extension before the image: skipped
    with_ext = g[:13 + 48] + b"\x21\xf9\x04\x00\x00\x00\x00\x00" + g[13 + 48:]
    assert decode_image(with_ext)[3] == rgb

    # interlace flag -> NotImplementedError at the boundary
    body = bytearray(g)
    body[13 + 48 + 9] |= 0x40
    with pytest.raises(NotImplementedError):
        decode_image(bytes(body))

    # two image blocks = an animation; frames decode independently
    anim = g[:-1] + g[13 + 48 : -1] + b"\x3b"
    frames = decode_gif_frames(anim)
    assert len(frames) == 2 and frames[0] == frames[1]

    # truncated LZW data -> hard error, not silent short pixels
    broken = bytearray(g)
    sub_at = 13 + 48 + 10 + 1
    broken[sub_at] = 2  # lie: first sub-block claims 2 bytes then 0-terminates
    broken[sub_at + 3] = 0
    with pytest.raises(ValueError):
        decode_image(bytes(broken[: sub_at + 4]) + b"\x3b")


def test_gif_lzw_decoder_vs_reference_compressor():
    """Drive the LZW decoder with a textbook compressing encoder
    (growing code widths, 4096-entry reset) — the uncompressed writer
    never exercises those paths."""
    import random

    from chchfr_data_collection_spark.multimodal import _gif_lzw_decode

    def lzw_compress(idx, min_code):
        clear, eoi = 1 << min_code, (1 << min_code) + 1
        out = bytearray()
        acc = nbits = 0
        code_size = min_code + 1

        def put(c):
            nonlocal acc, nbits
            acc |= c << nbits
            nbits += code_size
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        table = {bytes([i]): i for i in range(clear)}
        next_code = eoi + 1
        put(clear)
        s = b""
        for k in idx:
            sk = s + bytes([k])
            if sk in table:
                s = sk
                continue
            put(table[s])
            table[sk] = next_code
            next_code += 1
            if next_code >= (1 << code_size) and code_size < 12:
                code_size += 1
            if next_code >= 4096:
                put(clear)
                table = {bytes([i]): i for i in range(clear)}
                next_code = eoi + 1
                code_size = min_code + 1
            s = bytes([k])
        if s:
            put(table[s])
        put(eoi)
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)

    rng = random.Random(11)
    for _ in range(40):
        m = rng.choice([2, 4, 8])
        n = rng.randint(1, 6000)
        idx = bytes(rng.choice((0, 0, 0, 0, 1, 2, 3 % (1 << m))) for _ in range(n))
        assert bytes(_gif_lzw_decode(lzw_compress(idx, m), m)) == idx


def test_resize_nn_invariants():
    """Identity resize returns the buffer unchanged; integer 2x
    downscale picks exactly the stride-2 grid; upscale replicates."""
    from chchfr_data_collection_spark.multimodal import resize_image_nn

    pix = bytes((i * 7) % 256 for i in range(8 * 8 * 3))  # 8x8 RGB ramp
    assert resize_image_nn(8, 8, 3, pix, 8, 8) == pix
    small = resize_image_nn(8, 8, 3, pix, 4, 4)
    for y in range(4):
        for x in range(4):
            si = ((y * 2) * 8 + x * 2) * 3
            di = (y * 4 + x) * 3
            assert small[di : di + 3] == pix[si : si + 3]
    up = resize_image_nn(4, 4, 3, small, 8, 8)
    # each source pixel appears in a 2x2 block
    for y in range(8):
        for x in range(8):
            si = ((y // 2) * 4 + x // 2) * 3
            di = (y * 8 + x) * 3
            assert up[di : di + 3] == small[si : si + 3]


def test_jpeg_progressive_roundtrip_and_equivalence():
    """Progressive (SOF2, spectral selection): gray/color/odd-size
    round-trips through the multi-scan decoder, and the decoded output
    equals the BASELINE decode of the same source bit-for-bit (same
    quantized coefficients, different scan order)."""
    from chchfr_data_collection_spark.multimodal import (
        decode_image,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    for W0, H0, ch in ((16, 8, 1), (8, 8, 3), (13, 9, 1), (10, 18, 3)):
        src = bytes((7 * i + 3) % 256 for i in range(W0 * H0 * ch))
        p = decode_image(encode_jpeg_progressive(W0, H0, ch, src, quant=[1] * 64))
        b = decode_image(encode_jpeg(W0, H0, ch, src, quant=[1] * 64))
        assert p[:3] == (W0, H0, ch)
        assert p[3] == b[3]
        assert max(abs(a - c) for a, c in zip(p[3], src)) <= 4


def test_jpeg_progressive_eobrun_and_boundaries():
    """Hand-assembled SOF2 stream with a custom AC table whose only
    symbol is EOB2 — the decoder's eob-run block skipping must fill
    both blocks from one symbol. Successive-approximation scans raise."""
    import struct

    import pytest as _pytest

    from chchfr_data_collection_spark.multimodal import decode_image

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    # quant table 0: all ones (natural order irrelevant for zeros)
    dqt = seg(0xFFDB, b"\x00" + bytes([1] * 64))
    sof = seg(0xFFC2, struct.pack(">BHHB", 8, 8, 16, 1) + bytes((1, 0x11, 0)))
    # standard-ish DC table: symbol 0 at code '00' (bits[2]=1 suffices)
    dc_dht = seg(0xFFC4, bytes([0x00, 0, 1] + [0] * 14) + bytes([0]))
    # custom AC table: single 1-bit code -> symbol 0x10 (EOB2)
    ac_dht = seg(0xFFC4, bytes([0x10, 1] + [0] * 15) + bytes([0x10]))
    # scan 1: DC, two blocks, diff 0 twice -> bits '00'+'00', pad 1s
    sos_dc = seg(0xFFDA, bytes([1, 1, 0x00]) + bytes((0, 0, 0))) + bytes([0x0F])
    # scan 2: AC band 1..63, EOB2 symbol ('0') + 1 extra bit ('0'), pad 1s
    sos_ac = seg(0xFFDA, bytes([1, 1, 0x00]) + bytes((1, 63, 0))) + bytes([0x3F])
    stream = b"\xff\xd8" + dqt + sof + dc_dht + ac_dht + sos_dc + sos_ac + b"\xff\xd9"
    w, h, c, out = decode_image(stream)
    assert (w, h, c) == (16, 8, 1)
    assert set(out) == {128}  # DC 0 + all-zero AC -> level-shift mid-gray

    # successive approximation (Al=1) must raise at the boundary
    sos_sa = seg(0xFFDA, bytes([1, 1, 0x00]) + bytes((1, 63, 1)))
    bad = b"\xff\xd8" + dqt + sof + dc_dht + ac_dht + sos_dc + sos_sa + b"\xff\xd9"
    with _pytest.raises(NotImplementedError):
        decode_image(bad)
