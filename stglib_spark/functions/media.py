"""Pure-Python media codecs for the multimodal operators.

Real decoders for the formats expressible with the stdlib alone — BMP
(24-bit uncompressed, the public BITMAPINFOHEADER layout), binary
PPM/PGM (netpbm P6/P5), PNG (zlib DEFLATE, 8-bit gray/RGB/palette/
alpha, filters 0-4), and RIFF WAV (PCM 8/16-bit) — plus numpy-vectorized
resize and feature pooling. These back the ``decode_stub=False`` path of
:mod:`stglib_spark.operators.multimodal`; JPEG (DCT) and compressed
video still raise ``NotImplementedError`` at the same plug point.

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
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
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


# ---------------------------------------------------------------------------
# PNG (stdlib zlib; 8-bit gray / RGB / palette / gray+alpha / RGBA,
# filters 0-4, non-interlaced)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# samples per pixel by PNG color type
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(payload: bytes):
    pos = 8
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        yield ctype, payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + type + data + crc
        if ctype == b"IEND":
            break


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG per-scanline filtering. ``raw`` is h*(1+stride) filter-tagged
    bytes; returns (h, stride) recovered bytes. Up/None rows are vectorized;
    Sub/Average/Paeth carry a left-pixel dependency so they walk x in steps
    of bpp (each step vectorized over the pixel's bytes)."""
    raw = raw.reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint16)  # u16 so sums don't wrap
    prev = np.zeros(stride, dtype=np.uint16)
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.uint16)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride, bpp):
                cur[x : x + bpp] = (cur[x : x + bpp] + cur[x - bpp : x]) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            cur[:bpp] = (cur[:bpp] + prev[:bpp] // 2) & 0xFF
            for x in range(bpp, stride, bpp):
                cur[x : x + bpp] = (
                    cur[x : x + bpp]
                    + (cur[x - bpp : x] + prev[x : x + bpp]) // 2
                ) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            cur[:bpp] = (cur[:bpp] + prev[:bpp]) & 0xFF  # a=c=0 → pred=b
            for x in range(bpp, stride, bpp):
                a = cur[x - bpp : x].astype(np.int32)
                b = prev[x : x + bpp].astype(np.int32)
                c = prev[x - bpp : x].astype(np.int32)
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
                cur[x : x + bpp] = (cur[x : x + bpp] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype} invalid")
        out[y] = cur
        prev = cur
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w) gray or (h, w, 3) RGB uint8 via stdlib zlib.
    Supports bit depth 8, color types 0/2/3/4/6, filters 0-4,
    non-interlaced (the overwhelmingly common web/export case); alpha is
    dropped, palette images expand through PLTE."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    ihdr = None
    plte = None
    idat = []
    for ctype, body in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype_n, comp, filt, interlace = ihdr
    if depth != 8:
        raise UnsupportedMediaError(f"PNG bit depth {depth}: only 8 supported")
    if interlace:
        raise UnsupportedMediaError("Adam7-interlaced PNG not supported")
    if comp != 0 or filt != 0:
        raise ValueError("PNG nonstandard compression/filter method")
    if ctype_n not in _PNG_CHANNELS:
        raise UnsupportedMediaError(f"PNG color type {ctype_n} not supported")
    ch = _PNG_CHANNELS[ctype_n]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if raw.size != h * (1 + stride):
        raise ValueError("PNG IDAT length does not match dimensions")
    img = _png_unfilter(raw, h, stride, ch).reshape(h, w, ch)
    if ctype_n == 0:
        return np.ascontiguousarray(img[..., 0])
    if ctype_n == 2:
        return np.ascontiguousarray(img)
    if ctype_n == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return np.ascontiguousarray(plte[img[..., 0]])
    if ctype_n == 4:  # gray + alpha → gray
        return np.ascontiguousarray(img[..., 0])
    return np.ascontiguousarray(img[..., :3])  # RGBA → RGB


def encode_png(img: np.ndarray) -> bytes:
    """(h, w[, 3]) uint8 → non-interlaced filter-0 PNG bytes."""
    import zlib

    img = np.asarray(img, dtype=np.uint8)
    ctype = 0 if img.ndim == 2 else 2
    h, w = img.shape[:2]
    body = img.reshape(h, -1)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), body], axis=1
    ).tobytes()

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# AVI (RIFF container, uncompressed 24-bit DIB frames — '00db' chunks)
# ---------------------------------------------------------------------------


def _riff_chunks(payload: bytes, start: int, end: int):
    """Walk (fourcc, body_start, body_size) over a RIFF chunk run."""
    pos = start
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", payload, pos + 4)
        yield cid, pos + 8, sz
        pos += 8 + sz + (sz & 1)


def decode_avi(payload: bytes) -> tuple[list[np.ndarray], float]:
    """AVI bytes → (frames as (h, w, 3) uint8 RGB, fps). Supports the
    uncompressed-DIB stream ('00db' chunks, biCompression=0, 24-bit,
    bottom-up rows — the layout ffmpeg's ``-c:v rawvideo -pix_fmt bgr24``
    writes); compressed codecs (MJPG/H.264…) raise UnsupportedMediaError
    at this plug point."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    width = height = None
    fps = 0.0
    compression = 0
    bpp = 24
    frames: list[np.ndarray] = []

    def walk(start: int, end: int) -> None:
        nonlocal width, height, fps, compression, bpp
        for cid, body, sz in _riff_chunks(payload, start, end):
            if cid == b"LIST":
                walk(body + 4, body + sz)  # skip list type fourcc
            elif cid == b"avih":
                (us_per_frame,) = struct.unpack_from("<I", payload, body)
                if us_per_frame:
                    fps = 1e6 / us_per_frame
            elif cid == b"strf" and width is None:
                # BITMAPINFOHEADER for the first (video) stream
                _sz, w, h = struct.unpack_from("<Iii", payload, body)
                _planes, bits = struct.unpack_from("<HH", payload, body + 12)
                (comp,) = struct.unpack_from("<I", payload, body + 16)
                width, height, bpp, compression = w, h, bits, comp
            elif cid in (b"00db", b"00dc"):
                frames.append(payload[body : body + sz])

    walk(12, len(payload))
    if width is None or not frames:
        raise ValueError("AVI missing stream format or frame data")
    if compression != 0 or bpp != 24:
        raise UnsupportedMediaError(
            f"AVI biCompression={compression} bpp={bpp}: only uncompressed "
            "24-bit DIB frames are supported without an external codec"
        )
    h = abs(height)
    row_bytes = (width * 3 + 3) & ~3
    out = []
    for raw in frames:
        rows = np.frombuffer(raw, np.uint8, count=row_bytes * h).reshape(
            h, row_bytes
        )
        img = rows[:, : width * 3].reshape(h, width, 3)[..., ::-1]  # BGR→RGB
        if height > 0:  # bottom-up
            img = img[::-1]
        out.append(np.ascontiguousarray(img))
    return out, fps


def encode_avi(frames: list[np.ndarray], fps: float = 10.0) -> bytes:
    """(h, w, 3) uint8 RGB frames → minimal uncompressed-DIB AVI bytes."""
    frames = [np.asarray(f, np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    row_bytes = (w * 3 + 3) & ~3

    def dib(img: np.ndarray) -> bytes:
        body = np.zeros((h, row_bytes), np.uint8)
        body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # flip, RGB→BGR
        return body.tobytes()

    def chunk(tag: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return tag + struct.pack("<I", len(data)) + data + pad

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        int(1e6 / fps), row_bytes * h * int(fps), 0, 0x10, len(frames),
        0, 1, row_bytes * h, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0,
                                        1, int(fps), 0, len(frames),
                                        row_bytes * h, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, row_bytes * h, 2835, 2835, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(
        b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)
    ))
    movi = lst(b"movi", b"".join(chunk(b"00db", dib(f)) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def sample_avi_frames(
    payload: bytes, n_frames: int, duration_ms: int | None = None
) -> list[tuple[int, np.ndarray]]:
    """Evenly sample ``n_frames`` from an AVI clip → [(t_ms, frame)].
    Timing comes from the container's own fps unless ``duration_ms``
    overrides it (t = i·dur/n, source frame = floor(t·fps), clamped)."""
    frames, fps = decode_avi(payload)
    n = len(frames)
    if duration_ms is None:
        duration_ms = int(n / fps * 1000) if fps else 1000
    out = []
    for i in range(n_frames):
        t_ms = int(i * duration_ms / n_frames)
        idx = min(int(t_ms / 1000.0 * fps) if fps else i, n - 1)
        out.append((t_ms, frames[idx]))
    return out


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch image decode by magic bytes; UnsupportedMediaError names
    the exact codec gap (JPEG) for formats needing an external codec."""
    kind = sniff(payload)
    if kind == "bmp":
        return decode_bmp(payload)
    if kind in ("ppm", "pgm"):
        return decode_pnm(payload)
    if kind == "png":
        return decode_png(payload)
    if kind == "jpeg":
        raise UnsupportedMediaError(
            "jpeg decode requires an external codec (PIL) — "
            "BMP/PPM/PGM/PNG are supported natively"
        )
    raise ValueError("payload is not a recognized image format")


def decode_features_real(payload: bytes, dim: int) -> np.ndarray:
    """Real (non-stub) feature extraction for any supported payload."""
    kind = sniff(payload)
    if kind in ("bmp", "ppm", "pgm", "png"):
        return image_features(decode_image(payload), dim)
    if kind == "wav":
        x, _rate = decode_wav(payload)
        return audio_features(x, dim)
    if kind == "jpeg":
        raise UnsupportedMediaError(
            "jpeg decode requires an external codec (PIL)"
        )
    raise UnsupportedMediaError(
        "unrecognized media payload; real decode supports BMP/PPM/PGM/PNG/WAV"
    )
