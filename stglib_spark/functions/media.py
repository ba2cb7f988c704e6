"""Pure-Python media codecs for the multimodal operators.

Real decoders for the self-describing uncompressed formats that need no
external library — BMP (24-bit uncompressed, the public BITMAPINFOHEADER
layout), binary PPM/PGM (netpbm P6/P5), and RIFF WAV (PCM 8/16-bit) —
plus numpy-vectorized resize and feature pooling. These back the
``decode_stub=False`` path of :mod:`stglib_spark.operators.multimodal`;
compressed formats (JPEG/PNG/MP4) still raise ``NotImplementedError`` at
the same plug point, now with the dispatch actually implemented.

Everything is bytes→ndarray pure functions, safe inside Arrow-batched
mapInPandas workers.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedMediaError(NotImplementedError):
    """Payload format recognized as media but needs an external codec."""


def sniff(payload: bytes) -> str | None:
    """Best-effort container sniff → 'bmp' | 'ppm' | 'pgm' | 'wav' |
    'jpeg' | 'png' | None."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"P5":
        return "pgm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    return None


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed, BITMAPINFOHEADER)
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP bytes → (h, w, 3) uint8 RGB. Supports the common 24-bit
    uncompressed BITMAPINFOHEADER file (top-down or bottom-up rows)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise UnsupportedMediaError("BMP core-header variant not supported")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise UnsupportedMediaError(
            f"BMP bpp={bpp} compression={compression}: only 24-bit "
            "uncompressed is supported without an external codec"
        )
    bottom_up = height > 0
    h = abs(height)
    row_bytes = (width * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)
    img = rows[:, : width * 3].reshape(h, width, 3)[..., ::-1]  # BGR → RGB
    if bottom_up:
        img = img[::-1]
    return np.ascontiguousarray(img)


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP bytes (bottom-up)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=2)
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB → BGR, flip
    data = body.tobytes()
    data_off = 14 + 40
    file_size = data_off + len(data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + dib + data


# ---------------------------------------------------------------------------
# netpbm (binary P6 RGB / P5 gray)
# ---------------------------------------------------------------------------


def decode_pnm(payload: bytes) -> np.ndarray:
    """P6/P5 bytes → (h, w, 3) or (h, w) uint8."""
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    # header tokens: magic, width, height, maxval; '#' comments allowed
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise UnsupportedMediaError("16-bit netpbm not supported")
    ch = 3 if magic == b"P6" else 1
    arr = np.frombuffer(payload, np.uint8, count=w * h * ch, offset=i)
    return arr.reshape(h, w, 3) if ch == 3 else arr.reshape(h, w)


def encode_ppm(img: np.ndarray) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=2)
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


# ---------------------------------------------------------------------------
# WAV (RIFF, PCM 8/16-bit)
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (mono float32 samples in [-1, 1], sample_rate). PCM
    8-bit unsigned and 16-bit signed; multi-channel averages to mono."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _byterate, _align, bits = fmt
    if audio_format != 1:
        raise UnsupportedMediaError(
            f"WAV format {audio_format}: only PCM supported without a codec"
        )
    if bits == 16:
        x = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(data, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise UnsupportedMediaError(f"WAV {bits}-bit PCM not supported")
    if channels > 1:
        x = x[: len(x) - len(x) % channels].reshape(-1, channels).mean(axis=1)
    return x, rate


def encode_wav(x: np.ndarray, rate: int) -> bytes:
    """mono float32 [-1, 1] → 16-bit PCM WAV bytes."""
    # symmetric with decode (x = pcm / 32768): scale by 32768 and clamp
    # the one unrepresentable code (+32768) so roundtrip error ≤ ½ LSB
    pcm = np.clip(np.asarray(x, np.float64), -1.0, 1.0)
    pcm = np.clip(np.round(pcm * 32768.0), -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# ---------------------------------------------------------------------------
# Resize + feature pooling (numpy, no loops over pixels)
# ---------------------------------------------------------------------------


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, vectorized index gather."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(out_h) + 0.5) * h / out_h, h - 1).astype(int)
    xs = np.minimum((np.arange(out_w) + 0.5) * w / out_w, w - 1).astype(int)
    return img[ys][:, xs]


def image_features(img: np.ndarray, dim: int) -> np.ndarray:
    """(h, w[, 3]) uint8 → dim-float32 vector in [0, 1]: grayscale,
    resize to a dim×16 strip, mean-pool 16 pixels per slot — the same
    output contract as the stub path."""
    if img.ndim == 3:
        gray = img.astype(np.float32).mean(axis=2)
    else:
        gray = img.astype(np.float32)
    strip = resize_nearest(gray, 16, dim)  # (dim, 16)
    return (strip.mean(axis=1) / 255.0).astype(np.float32)


def audio_features(x: np.ndarray, dim: int) -> np.ndarray:
    """mono samples → dim-float32 RMS-energy envelope in [0, 1]."""
    n = len(x)
    if n == 0:
        return np.zeros(dim, dtype=np.float32)
    edges = np.linspace(0, n, dim + 1).astype(int)
    out = np.empty(dim, dtype=np.float32)
    for i in range(dim):
        seg = x[edges[i] : max(edges[i + 1], edges[i] + 1)]
        out[i] = np.sqrt(np.mean(seg * seg)) if len(seg) else 0.0
    return np.clip(out, 0.0, 1.0)


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch image decode by magic bytes; UnsupportedMediaError names
    the exact codec gap (JPEG/PNG) for compressed formats."""
    kind = sniff(payload)
    if kind == "bmp":
        return decode_bmp(payload)
    if kind in ("ppm", "pgm"):
        return decode_pnm(payload)
    if kind in ("jpeg", "png"):
        raise UnsupportedMediaError(
            f"{kind} decode requires an external codec (PIL) — "
            "BMP/PPM/PGM are supported natively"
        )
    raise ValueError("payload is not a recognized image format")


def decode_features_real(payload: bytes, dim: int) -> np.ndarray:
    """Real (non-stub) feature extraction for any supported payload."""
    kind = sniff(payload)
    if kind in ("bmp", "ppm", "pgm"):
        return image_features(decode_image(payload), dim)
    if kind == "wav":
        x, _rate = decode_wav(payload)
        return audio_features(x, dim)
    if kind in ("jpeg", "png"):
        raise UnsupportedMediaError(
            f"{kind} decode requires an external codec (PIL)"
        )
    raise UnsupportedMediaError(
        "unrecognized media payload; real decode supports BMP/PPM/PGM/WAV"
    )
