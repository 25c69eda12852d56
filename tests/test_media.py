"""Stdlib media codecs (functions/media) + multimodal operator stages.

The PNG decoder is exercised against hand-FILTERED scanlines built
forward from the PNG spec (an independent implementation of filters
1-4), not just against our own encoder's filter-0 output; GIF/WAV
encoders round-trip through their info parsers; the Spark stages
(synthesize → decode → resize → frame-sample) run over real bytes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from silkworm_spark.functions import media as M


def _px(h, w, c, seed=0):
    return ((np.arange(h * w * c) * 17 + seed) % 256).astype(np.uint8).reshape(h, w, c)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip(channels):
    px = _px(5, 7, channels, seed=channels)
    out = M.png_decode(M.png_encode(px))
    assert out.shape == (5, 7, channels)
    assert np.array_equal(out, px)


def test_png_info_fields():
    data = M.png_encode(_px(3, 9, 3))
    info = M.png_info(data)
    assert (info["width"], info["height"]) == (9, 3)
    assert info["bit_depth"] == 8 and info["color_type"] == 2
    assert M.sniff_media(data) == "png"


def _chunk(typ, payload):
    crc = zlib.crc32(typ + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + typ + payload + struct.pack(">I", crc)


def _filter_forward(pixels, filters):
    """Apply PNG filters 0-4 FORWARD per the spec (the encoder side the
    decoder must invert) — an independent reference implementation."""
    h, w, ch = pixels.shape
    stride = w * ch
    flat = pixels.reshape(h, stride).astype(int)
    out = bytearray()
    prev = np.zeros(stride, int)
    for y in range(h):
        line = flat[y]
        f = filters[y % len(filters)]
        out.append(f)
        for x in range(stride):
            left = line[x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) >> 1
            else:
                pred = M._paeth(left, up, ul)
            out.append((line[x] - pred) & 0xFF)
        prev = line
    return bytes(out)


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_decode_all_filters(filters):
    px = _px(6, 4, 3, seed=len(filters))
    ihdr = struct.pack(">IIBBBBB", 4, 6, 8, 2, 0, 0, 0)
    data = (
        M.PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(_filter_forward(px, filters)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(M.png_decode(data), px)


def test_png_palette_decode():
    idx = (np.arange(12) % 5).astype(np.uint8).reshape(3, 4, 1)
    palette = bytes(range(15))  # 5 RGB entries
    ihdr = struct.pack(">IIBBBBB", 4, 3, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(3))
    data = (
        M.PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", palette)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    out = M.png_decode(data)
    assert out.shape == (3, 4, 3)
    expect = np.frombuffer(palette, np.uint8).reshape(5, 3)[idx[:, :, 0]]
    assert np.array_equal(out, expect)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        M.png_info(b"definitely not a png")
    with pytest.raises(ValueError):
        M.png_decode(M.PNG_MAGIC + _chunk(b"IEND", b""))


def test_jpeg_sof_parse():
    sof = struct.pack(">BHHB", 8, 480, 640, 3) + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    data = (
        b"\xff\xd8"                                   # SOI
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
        + b"\xff\xd9"
    )
    info = M.jpeg_info(data)
    assert (info["width"], info["height"], info["components"]) == (640, 480, 3)
    assert M.sniff_media(data) == "jpeg"


def test_gif_roundtrip_and_frames():
    frames = [((np.arange(20) + f) % 256).astype(np.uint8).reshape(4, 5)
              for f in range(3)]
    data = M.gif_encode(frames, 5, 4)
    info = M.gif_info(data)
    assert (info["width"], info["height"], info["n_frames"]) == (5, 4, 3)
    assert M.sniff_media(data) == "gif"


def test_gif_lzw_stream_decodes():
    """The minimal LZW stream must be VALID: decode it with an
    independent from-spec LZW decoder and recover the pixels."""
    pixels = bytes((np.arange(97) * 13 % 256).astype(np.uint8))
    stream = M._lzw_9bit(pixels)

    # reference GIF-LZW decoder (spec: 9-bit codes grow with the table)
    acc = nbits = pos = 0
    width, table, out, prev = 9, None, bytearray(), None
    while True:
        while nbits < width:
            acc |= stream[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == 256:
            table = {i: bytes([i]) for i in range(256)}
            nxt, width, prev = 258, 9, None
            continue
        if code == 257:
            break
        entry = table[code] if code in table else table[prev] + table[prev][:1]
        out += entry
        if prev is not None:
            table[nxt] = table[prev] + entry[:1]
            nxt += 1
            if nxt == (1 << width) and width < 12:
                width += 1
        prev = code
    assert bytes(out) == pixels


def test_bmp_and_wav_info():
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 320, -200) + b"\x00\x00" + struct.pack("<H", 24)
    info = M.bmp_info(bmp)
    assert (info["width"], info["height"], info["bits_per_pixel"]) == (320, 200, 24)

    samples = ((np.arange(800) * 7) % 65536 - 32768).astype(np.int16)
    wav = M.wav_encode(samples, sample_rate=8000)
    w = M.wav_info(wav)
    assert w["channels"] == 1 and w["sample_rate"] == 8000
    assert w["bit_depth"] == 16 and w["n_frames"] == 800
    assert w["duration_s"] == 0.1
    assert M.sniff_media(wav) == "wav"


def test_resize_nearest_and_sample_frames():
    px = _px(8, 6, 3)
    small = M.resize_nearest(px, 3, 4)
    assert small.shape == (4, 3, 3)
    assert np.array_equal(small[0, 0], px[0, 0])  # corner preserved
    big = M.resize_nearest(px, 12, 16)
    assert big.shape == (16, 12, 3)
    assert np.array_equal(big[::2][:, ::2], px)  # exact 2x upsample grid

    assert M.sample_frames(10, 4) == [0, 2, 5, 7]
    assert M.sample_frames(3, 5) == [0, 1, 2]
    assert M.sample_frames(0, 4) == []


# ---- Spark stages over real bytes ----

def test_decode_media_real_formats(spark):
    from silkworm_spark.operators.multimodal import decode_media, synthesize_media

    docs = spark.range(30).select(
        F_col("id").alias("doc_id"),
        F_concat(F_lit("doc text "), F_col("id").cast("string")).alias("text"),
    )
    out = {r["doc_id"]: r for r in decode_media(synthesize_media(docs)).collect()}
    assert len(out) == 30
    for d, r in out.items():
        if d % 3 == 0:
            assert r["decoder"] == "stdlib-png" and r["kind"] == "image"
            assert (r["width"], r["height"]) == (d % 31 + 2, (d * 7) % 23 + 2)
            assert r["n_frames"] == 1
        elif d % 3 == 1:
            assert r["decoder"] == "stdlib-wav" and r["kind"] == "audio"
            assert (r["width"], r["height"]) == (1, 8000)
        else:
            assert r["decoder"] == "stdlib-gif" and r["kind"] == "video"
            assert (r["width"], r["height"]) == (d % 15 + 2, (d * 3) % 11 + 2)
            assert r["n_frames"] == d % 5 + 2


def test_decode_media_stub_fallback(spark):
    from silkworm_spark.operators.multimodal import attach_media, decode_media

    docs = spark.range(6).select(
        F_col("id").alias("doc_id"), F_lit("plain text, no container").alias("text")
    )
    rows = decode_media(attach_media(docs)).collect()
    assert rows and all(r["decoder"] == "stub" for r in rows)


def test_resize_images_stage(spark):
    from silkworm_spark.operators.multimodal import resize_images, synthesize_media

    docs = spark.range(12).select(
        F_col("id").alias("doc_id"), F_lit("t").alias("text")
    )
    out = {r["doc_id"]: r for r in resize_images(synthesize_media(docs), 16, 12).collect()}
    pngs = [d for d in out if d % 3 == 0]
    assert pngs and all(out[d]["ok"] for d in pngs)
    for d in pngs:  # re-decodable at the target size
        arr = M.png_decode(bytes(out[d]["media"]))
        assert arr.shape == (12, 16, 3)
    assert all(not out[d]["ok"] for d in out if d % 3 != 0)


def test_frame_sample_matches_reference(spark):
    from silkworm_spark.operators.multimodal import (
        decode_media, frame_sample, synthesize_media,
    )

    docs = spark.range(40).select(
        F_col("id").alias("doc_id"), F_lit("t").alias("text")
    )
    feats = decode_media(synthesize_media(docs))
    got: dict[int, list[int]] = {}
    for r in frame_sample(feats, k=4).collect():
        got.setdefault(r["doc_id"], []).append(r["frame_index"])
    for d in range(2, 40, 3):  # video rows
        n = d % 5 + 2
        assert sorted(got[d]) == M.sample_frames(n, 4), d


from pyspark.sql.functions import col as F_col, concat as F_concat, lit as F_lit  # noqa: E402
