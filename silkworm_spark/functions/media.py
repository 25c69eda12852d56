"""Real media decoding from the stdlib — no codec libraries needed.

The container ships no PIL/av/soundfile, but several production
formats are decodable with nothing beyond ``zlib`` + ``struct``:

- PNG: full pixel decode (IDAT inflate + per-scanline unfilter,
  filters 0-4 incl. Paeth) and encode — PNG is DEFLATE + byte filters,
  both stdlib; bit depth 8, color types 0/2/3/6.
- JPEG: dimensions/components from the SOF segment walk.
- GIF: logical-screen dimensions + frame count from the block walk.
- BMP: dimensions from BITMAPINFOHEADER.
- WAV: channels/sample-rate/bit-depth/duration from RIFF chunks.

These are the *real* decoders behind ``operators/multimodal`` (the
reference treats media via external tools; this module is the
sandbox-honest subset that needs no third-party stack). Anything the
sniffer doesn't recognize falls back to the deterministic stub there.

Pixel buffers are numpy arrays (h, w, c) uint8 — the shape a feature
extractor or a resize stage consumes; ``resize_nearest`` and
``sample_frames`` are the deterministic transforms the pipeline
exposes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def sniff_media(data: bytes) -> str | None:
    """Container format from magic bytes; None if unrecognized."""
    if not data:
        return None
    if data[:8] == PNG_MAGIC:
        return "png"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return "mp4"
    return None


# ---- PNG ----

def _png_chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,), typ = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        yield typ, data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + crc
        if typ == b"IEND":
            return


def png_info(data: bytes) -> dict:
    """IHDR fields; raises ValueError on a malformed file."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    for typ, payload in _png_chunks(data):
        if typ == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload[:13]
            )
            return dict(width=w, height=h, bit_depth=depth,
                        color_type=color, interlace=interlace)
    raise ValueError("PNG missing IHDR")


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> np.ndarray:
    """Full pixel decode → uint8 array (h, w, channels). Supports bit
    depth 8, color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+a),
    6 (RGBA), non-interlaced — the overwhelming web majority; anything
    else raises ValueError (callers fall back to metadata-only)."""
    info = png_info(data)
    if info["bit_depth"] != 8 or info["interlace"] != 0:
        raise ValueError(f"unsupported PNG variant: {info}")
    w, h, color = info["width"], info["height"], info["color_type"]
    ch = _PNG_CHANNELS.get(color)
    if ch is None:
        raise ValueError(f"unknown color type {color}")

    palette = None
    idat = bytearray()
    for typ, payload in _png_chunks(data):
        if typ == b"IDAT":
            idat += payload
        elif typ == b"PLTE":
            palette = np.frombuffer(payload, np.uint8).reshape(-1, 3)
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")

    out = bytearray(h * stride)
    prev = bytearray(stride)
    pos = 0
    for y in range(h):
        filt = raw[pos]
        line = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        if filt == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif filt == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif filt == 3:  # Average
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif filt == 4:  # Paeth
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                ul = prev[x - ch] if x >= ch else 0
                line[x] = (line[x] + _paeth(left, prev[x], ul)) & 0xFF
        elif filt != 0:
            raise ValueError(f"bad PNG filter {filt}")
        out[y * stride:(y + 1) * stride] = line
        prev = line

    arr = np.frombuffer(bytes(out), np.uint8).reshape(h, w, ch)
    if color == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        arr = palette[arr[:, :, 0]]
    return arr


def png_encode(pixels: np.ndarray, compress_level: int = 6) -> bytes:
    """uint8 (h, w) or (h, w, c in {1,2,3,4}) → PNG bytes (filter 0)."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, ch = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(typ: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(typ + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + typ + payload + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y].astype(np.uint8).tobytes() for y in range(h)
    )
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, compress_level))
        + chunk(b"IEND", b"")
    )


# ---- JPEG / GIF / BMP / WAV (header metadata) ----

def jpeg_info(data: bytes) -> dict:
    """Walk JFIF segments to the SOF marker → dimensions/components."""
    if data[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):  # SOFn
            _prec, h, w, ncomp = struct.unpack(">BHHB", data[pos + 4:pos + 10])
            return dict(width=w, height=h, components=ncomp,
                        progressive=marker == 0xC2)
        pos += 2 + seglen
    raise ValueError("JPEG missing SOF")


def gif_info(data: bytes) -> dict:
    """Logical-screen dimensions + frame count from the block walk."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, packed = struct.unpack("<HHB", data[6:11])
    pos = 13
    if packed & 0x80:  # global color table
        pos += 3 * (2 << (packed & 0x07))
    frames = 0
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(data) and data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            frames += 1
            lpacked = data[pos + 9]
            pos += 10
            if lpacked & 0x80:
                pos += 3 * (2 << (lpacked & 0x07))
            pos += 1  # LZW minimum code size
            while pos < len(data) and data[pos]:
                pos += 1 + data[pos]
            pos += 1
        else:
            raise ValueError(f"bad GIF block 0x{b0:02x}")
    return dict(width=w, height=h, n_frames=frames)


def bmp_info(data: bytes) -> dict:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    w, h = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    return dict(width=w, height=abs(h), bits_per_pixel=bpp)


def wav_info(data: bytes) -> dict:
    """fmt + data chunks → channels/rate/bits/frames/duration."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, fmt, n_data = 12, None, None
    while pos + 8 <= len(data):
        cid, (clen,) = data[pos:pos + 4], struct.unpack("<I", data[pos + 4:pos + 8])
        if cid == b"fmt ":
            _tag, channels, rate = struct.unpack("<HHI", data[pos + 8:pos + 16])
            (bits,) = struct.unpack("<H", data[pos + 22:pos + 24])
            fmt = dict(channels=channels, sample_rate=rate, bit_depth=bits)
        elif cid == b"data":
            n_data = clen
        pos += 8 + clen + (clen & 1)
    if fmt is None or n_data is None:
        raise ValueError("WAV missing fmt/data chunk")
    frame_bytes = fmt["channels"] * fmt["bit_depth"] // 8
    n_frames = n_data // max(1, frame_bytes)
    return dict(**fmt, n_frames=n_frames,
                duration_s=round(n_frames / fmt["sample_rate"], 6))


def wav_encode(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 mono/stereo array (n,) or (n, ch) → WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    payload = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * ch * 2, ch * 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )


def _lzw_9bit(data: bytes) -> bytes:
    """Minimal valid GIF LZW stream (min code size 8): emit every pixel
    as a 9-bit literal and reset with CLEAR before the code table could
    force a width change. Not compressed — but bit-exact valid LZW any
    conformant decoder reproduces byte-for-byte."""
    out = bytearray()
    acc = nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += 9
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(256)  # CLEAR
    count = 258
    for b in data:
        emit(b)
        count += 1
        if count == 511:  # next emit would need 10 bits — reset first
            emit(256)
            count = 258
    emit(257)  # END
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_encode(frames: list[np.ndarray], width: int, height: int) -> bytes:
    """Grayscale frames (uint8 (h, w) arrays) → valid multi-frame
    GIF89a with a 256-gray global palette."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    for i in range(256):
        out += bytes((i, i, i))
    for fr in frames:
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out.append(8)  # LZW minimum code size
        stream = _lzw_9bit(fr.astype(np.uint8).tobytes())
        for pos in range(0, len(stream), 255):
            block = stream[pos:pos + 255]
            out.append(len(block))
            out += block
        out.append(0)
    out.append(0x3B)
    return bytes(out)


# ---- transforms ----

def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (h, w, c) → (height, width, c)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return pixels[ys][:, xs]


def sample_frames(n_frames: int, k: int) -> list[int]:
    """k evenly spaced frame indices in [0, n_frames) — the standard
    uniform temporal sample for video feature extraction."""
    if n_frames <= 0 or k <= 0:
        return []
    k = min(k, n_frames)
    return [int(i * n_frames / k) for i in range(k)]
