"""Real media codecs in pure stdlib + numpy: PNG (zlib inflate +
filter reconstruction), BMP (BI_RGB device-independent bitmaps),
netpbm (P5/P6), and RIFF/WAVE PCM. No PIL/opencv — every parser here
implements the published file format directly, which is what lets the
multimodal pipeline (operators/multimodal.py) run a REAL decode stage
in this environment instead of a stub.

Encoders are provided for the same formats so fixtures and queries can
round-trip: encode -> bytes -> decode must reproduce the array
bit-exactly (pinned by tests/test_multimodal.py). The PNG encoder
writes filter-0 scanlines; the decoder reconstructs all five standard
filter types (None/Sub/Up/Average/Paeth) so externally-produced files
decode too.

Scale note: these run inside Arrow-batched mapInPandas over binary
columns — per-row Python is unavoidable for format parsing (same as
PIL), but each payload is touched exactly once per batch and the hot
loops are numpy slices; scanline reconstruction for filters 1/3/4 is
O(width) python per row only when such files appear (our encoder never
emits them).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+A, RGBA


# ---------------------------------------------------------------- PNG


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """Minimal standards-conforming PNG writer: 8-bit gray/RGB/RGBA,
    filter type 0 on every scanline, one IDAT chunk."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(typ: bytes, data: bytes) -> bytes:
        body = typ + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # prepend the filter-type byte (0) to each scanline
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), img.reshape(h, w * ch)], axis=1
    ).tobytes()
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, level))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """Parse chunks, inflate IDAT, reconstruct scanline filters.
    Supports 8-bit depth, color types 0/2/4/6, no interlace."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat = 8, []
    w = h = channels = None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
                raise NotImplementedError(
                    f"PNG depth={depth} color_type={color_type} interlace={interlace}"
                )
            channels = _PNG_CHANNELS[color_type]
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.empty((h, stride), np.uint16)  # u16 headroom for filter math
    prev = np.zeros(stride, np.uint16)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, np.uint8, stride, off + 1).astype(np.uint16)
        if ftype == 0:
            pass
        elif ftype == 2:  # Up
            line = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                b = prev[x]
                c = prev[x - channels] if x >= channels else 0
                if ftype == 1:
                    line[x] = (line[x] + a) & 0xFF
                elif ftype == 3:
                    line[x] = (line[x] + ((int(a) + int(b)) >> 1)) & 0xFF
                else:
                    line[x] = (line[x] + _paeth(int(a), int(b), int(c))) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype}")
        out[y] = line
        prev = line
    img = out.astype(np.uint8).reshape(h, w, channels)
    return img[:, :, 0] if channels == 1 else img


# ---------------------------------------------------------------- BMP


def encode_bmp(img: np.ndarray) -> bytes:
    """24-bit uncompressed (BI_RGB) bottom-up BMP; rows padded to 4."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, _ = img.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up storage
        body += img[y, :, ::-1].tobytes()  # RGB -> BGR
        body += b"\0" * pad
    pixel_off = 14 + 40
    size = pixel_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, pixel_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + dib + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    """BITMAPINFOHEADER, 24/32-bit BI_RGB, top-down or bottom-up."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pixel_off,) = struct.unpack_from("<I", data, 10)
    dib_size, w, h_signed, planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", data, 14
    )
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    h = abs(h_signed)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    rows = np.frombuffer(data, np.uint8, stride * h, pixel_off).reshape(h, stride)
    px = rows[:, : w * nch].reshape(h, w, nch)
    if h_signed > 0:  # bottom-up
        px = px[::-1]
    return np.ascontiguousarray(px[:, :, 2::-1])  # BGR(A) -> RGB


# ------------------------------------------------------------- netpbm


def encode_ppm(img: np.ndarray) -> bytes:
    """Binary netpbm: P5 for 2-D gray, P6 for HxWx3 RGB."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        h, w = img.shape
        return b"P5\n%d %d\n255\n" % (w, h) + img.tobytes()
    h, w, ch = img.shape
    if ch != 3:
        raise ValueError("PPM needs HxW or HxWx3")
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """P5 (gray) / P6 (RGB) binary netpbm with comment handling."""
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm payload")
    channels = 1 if data[:2] == b"P5" else 3
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm")
    px = np.frombuffer(data, np.uint8, w * h * channels, pos)
    return px.reshape(h, w) if channels == 1 else px.reshape(h, w, channels)


# ---------------------------------------------------------- RIFF/WAVE


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """PCM-16 RIFF/WAVE; samples is (n,) mono or (n, ch)."""
    samples = np.ascontiguousarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (
        b"WAVEfmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Parse RIFF chunks; PCM-16 only. Returns ((n, ch) int16, rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    n_channels = sample_rate = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            audio_fmt, n_channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError(f"WAV fmt={audio_fmt} bits={bits}")
        elif cid == b"data":
            pcm = body
    if pcm is None or n_channels is None:
        raise ValueError("WAV missing fmt/data chunk")
    arr = np.frombuffer(pcm, np.int16)
    return arr.reshape(-1, n_channels), sample_rate


# ------------------------------------------------------- dispatchers


def sniff_format(payload: bytes) -> str | None:
    """Identify a payload by magic bytes; None when unrecognized."""
    if payload[:8] == PNG_MAGIC:
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] in (b"P5", b"P6"):
        return "ppm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


_IMAGE_DECODERS = {"png": decode_png, "bmp": decode_bmp, "ppm": decode_ppm}


def decode_image_bytes(payload: bytes) -> np.ndarray:
    """Decode any supported image container to an ndarray."""
    fmt = sniff_format(payload)
    if fmt in _IMAGE_DECODERS:
        return _IMAGE_DECODERS[fmt](payload)
    raise NotImplementedError(
        f"unsupported image payload (magic={payload[:8]!r}); "
        "supported containers: PNG, BMP, PPM/PGM"
    )
