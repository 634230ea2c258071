"""Pure-Python image codecs: PPM/PGM, BMP, and PNG via stdlib zlib.

Real decoders for the multimodal surface — no PIL/opencv in this
container, so the formats with fully-specified, dependency-free
encodings are implemented directly:

- **PPM (P6) / PGM (P5)**: netpbm binary — trivial header + raw raster.
- **BMP**: uncompressed BI_RGB 24-bit (the universal baseline BMP).
- **PNG**: 8-bit gray/RGB/RGBA, non-interlaced — IHDR/IDAT/IEND chunk
  walk, ``zlib.decompress``, and the five scanline filters (None/Sub/
  Up/Average/Paeth) undone row-by-row with numpy where vectorizable.

Every decoder returns a ``numpy.uint8`` array of shape ``(h, w, c)``;
matching encoders exist so tests can assert pixel-exact round-trips.
``resize_nearest`` and ``pixel_features`` are the deterministic
resize / feature steps the Arrow-batched stages in ``decode.py`` call.

These run INSIDE ``mapInPandas`` batches (decode.py) — per-image
Python cost, amortized over Arrow batch transfer, embarrassingly
parallel across executors.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "decode_image",
    "decode_ppm",
    "decode_bmp",
    "decode_png",
    "encode_ppm",
    "encode_bmp",
    "encode_png",
    "resize_nearest",
    "pixel_features",
    "PIXEL_FEATURE_DIM",
    "sniff_format",
]


def sniff_format(data: bytes) -> str:
    """Identify the payload codec from magic bytes."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:2] in (b"P6", b"P5"):
        return "ppm"
    if data[:2] == b"BM":
        return "bmp"
    raise ValueError(f"unrecognized image payload (magic {data[:8]!r})")


def decode_image(data: bytes) -> np.ndarray:
    """Decode any supported payload to a ``(h, w, c)`` uint8 array."""
    fmt = sniff_format(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "ppm":
        return decode_ppm(data)
    return decode_bmp(data)


# --------------------------------------------------------------- netpbm

def _pnm_header(data: bytes) -> tuple[bytes, list[int], int]:
    """Parse a netpbm header: magic + 3 ints (w, h, maxval), honoring
    ``#`` comments; returns (magic, [w, h, maxval], raster_offset)."""
    magic = data[:2]
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(data[start:pos]))
    return magic, vals, pos + 1  # single whitespace after maxval


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6, 3-channel) or PGM (P5, 1-channel), maxval <= 255."""
    magic, (w, h, maxval), off = _pnm_header(data)
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PPM/PGM: magic {magic!r}")
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    c = 3 if magic == b"P6" else 1
    n = w * h * c
    raster = np.frombuffer(data, dtype=np.uint8, count=n, offset=off)
    return raster.reshape(h, w, c).copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode a (h, w, 1|3) uint8 array as binary PGM/PPM."""
    h, w, c = arr.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + arr.astype(np.uint8).tobytes()


# ----------------------------------------------------------------- BMP

def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP → (h, w, 3) RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    w, h_signed = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp})")
    h = abs(h_signed)
    bottom_up = h_signed > 0
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=pixel_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode a (h, w, 3) uint8 RGB array as bottom-up 24-bit BMP."""
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("BMP encoder takes RGB")
    stride = (w * 3 + 3) & ~3
    bgr = arr[:, :, ::-1][::-1]  # RGB → BGR, top-down → bottom-up
    padded = np.zeros((h, stride), dtype=np.uint8)
    padded[:, : w * 3] = bgr.reshape(h, w * 3)
    raster = padded.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return header + info + raster


# ----------------------------------------------------------------- PNG

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG (gray / RGB / gray+alpha / RGBA).

    Chunk walk → concat IDAT → inflate → undo per-row filters. Filters
    Up(2) vectorize; Sub(1)/Average(3)/Paeth(4) carry a left-neighbor
    dependency, so they run as per-byte loops (rows are short; the
    encoder below emits filter 0, so round-trips stay fast).
    """
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos = 8
    idat = bytearray()
    w = h = channels = None
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + type + data + crc
        if typ == b"IHDR":
            w, h = int.from_bytes(chunk[0:4], "big"), int.from_bytes(chunk[4:8], "big")
            bit_depth, color_type, interlace = chunk[8], chunk[9], chunk[12]
            if bit_depth != 8 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced PNG supported")
            channels = _PNG_CHANNELS.get(color_type)
            if channels is None:
                raise ValueError(f"unsupported color type {color_type}")
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels  # bytes per pixel at 8-bit depth
    p = 0
    for row in range(h):
        f = raw[p]
        cur = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=p + 1).copy()
        p += 1 + stride
        if f == 1:  # Sub
            for i in range(bpp, stride):
                cur[i] = (int(cur[i]) + int(cur[i - bpp])) & 0xFF
        elif f == 2:  # Up (uint8 addition wraps mod 256)
            cur += prev
        elif f == 3:  # Average
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(cur[i]) + (left + int(prev[i])) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                cc = int(prev[i - bpp]) if i >= bpp else 0
                pa, pb, pc = abs(b - cc), abs(a - cc), abs(a + b - 2 * cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                cur[i] = (int(cur[i]) + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter {f}")
        out[row] = cur
        prev = cur
    return out.reshape(h, w, channels)


def _png_chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        len(payload).to_bytes(4, "big")
        + typ
        + payload
        + zlib.crc32(typ + payload).to_bytes(4, "big")
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Encode a (h, w, 1|2|3|4) uint8 array as 8-bit PNG (filter 0)."""
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = arr.astype(np.uint8).reshape(h, w * c)
    raw = b"".join(b"\x00" + rows[r].tobytes() for r in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


# --------------------------------------------------- resize + features

def resize_nearest(arr: np.ndarray, target_width: int, target_height: int) -> np.ndarray:
    """Nearest-neighbor resize: output pixel (x, y) samples source pixel
    (x*w//tw, y*h//th) — the deterministic floor mapping, bit-exact
    reproducible anywhere."""
    h, w, _ = arr.shape
    ys = (np.arange(target_height) * h) // target_height
    xs = (np.arange(target_width) * w) // target_width
    return arr[np.ix_(ys, xs)]


#: per-channel mean+std over 3 channels, + 8-bin luminance histogram.
PIXEL_FEATURE_DIM = 14


def pixel_features(arr: np.ndarray) -> list[float]:
    """Deterministic pixel-domain feature vector (dim 14).

    Grayscale inputs broadcast to 3 channels; alpha is dropped. The
    luminance histogram uses the integer BT.601-ish weights
    (299/587/114)/1000 so the binning is float-stable.
    """
    a = arr.astype(np.float64)
    if a.shape[2] == 1:
        rgb = np.repeat(a, 3, axis=2)
    elif a.shape[2] == 2:  # gray + alpha
        rgb = np.repeat(a[:, :, :1], 3, axis=2)
    else:
        rgb = a[:, :, :3]
    feats: list[float] = []
    for ch in range(3):
        feats.append(round(float(rgb[:, :, ch].mean()) / 255.0, 6))
        feats.append(round(float(rgb[:, :, ch].std()) / 255.0, 6))
    lum = (299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2]) / 1000.0
    hist = np.bincount(
        np.minimum(lum.astype(np.int64) >> 5, 7).ravel(), minlength=8
    )
    total = max(int(hist.sum()), 1)
    feats.extend(round(float(v) / total, 6) for v in hist)
    return feats


# ----------------------------------------------------------------- WAV

def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV (RIFF/WAVE, 8- or 16-bit integer) → ``(samples, rate)``.

    ``samples`` is ``(n_frames, n_channels)`` int16 (8-bit audio is
    centered: byte - 128 << 8 is NOT applied — values upcast verbatim
    so tests stay bit-exact). Chunk walk tolerates extra chunks
    (LIST/fact) like real files have.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        ln = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks pad to even length
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            raw = body
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"only 8/16-bit PCM supported (fmt={audio_format}, bits={bits})")
    if bits == 16:
        samples = np.frombuffer(raw, dtype="<i2")
    else:
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.int16)
    n_frames = len(samples) // n_channels
    return samples[: n_frames * n_channels].reshape(n_frames, n_channels).copy(), sample_rate


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode ``(n_frames, n_channels)`` int16 as 16-bit PCM WAV."""
    n_frames, n_channels = samples.shape
    raw = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


#: mean, rms, zero-crossing rate, peak — per clip (mono-folded).
AUDIO_FEATURE_DIM = 4


def audio_features(samples: np.ndarray, sample_rate: int) -> list[float]:
    """Deterministic clip-level audio features over the mono fold
    (mean across channels): DC mean, RMS, zero-crossing rate, peak —
    all normalized to [-1, 1] full scale and rounded to 6 decimals."""
    mono = samples.astype(np.float64).mean(axis=1)
    fs = 32768.0
    mean = float(mono.mean()) / fs
    rms = float(np.sqrt(np.mean(mono * mono))) / fs
    signs = np.sign(mono)
    nz = signs != 0
    crossings = int(np.sum(np.abs(np.diff(signs[nz])) > 1)) if nz.any() else 0
    zcr = crossings / max(len(mono) - 1, 1)
    peak = float(np.abs(mono).max()) / fs if len(mono) else 0.0
    return [round(mean, 6), round(rms, 6), round(zcr, 6), round(peak, 6)]


# ----------------------------------------------------------------- Y4M

def decode_y4m(data: bytes) -> tuple[np.ndarray, dict]:
    """YUV4MPEG2 (.y4m) raw video → ``(frames, params)``.

    The standard uncompressed video interchange format: an ASCII
    stream header (``YUV4MPEG2 W.. H.. F.. ... [C..]``) then per-frame
    ``FRAME...\\n`` markers followed by raw planar YUV bytes. C444
    (full-res planes) and C420/C420jpeg/C420paldv (2x2-subsampled
    U/V) are supported; ``frames`` is ``(n, h, w, 3)`` uint8 in YUV
    order with subsampled planes upsampled by pixel replication.
    """
    if not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = data.index(b"\n")
    w = h = None
    colorspace = "C420jpeg"  # the spec default
    for tok in data[9:nl].split():
        tag, val = tok[:1], tok[1:].decode("ascii", "replace")
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"C":
            colorspace = "C" + val
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if colorspace.startswith("C444"):
        subsampled = False
    elif colorspace.startswith("C420"):
        subsampled = True
        if w % 2 or h % 2:
            raise ValueError("C420 needs even dimensions")
    else:
        raise ValueError(f"unsupported colorspace {colorspace}")
    y_size = w * h
    c_size = y_size if not subsampled else (w // 2) * (h // 2)
    frame_bytes = y_size + 2 * c_size
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError("missing FRAME marker")
        pos = fnl + 1
        if pos + frame_bytes > len(data):
            raise ValueError("truncated frame")
        yp = np.frombuffer(data, np.uint8, y_size, pos).reshape(h, w)
        up = np.frombuffer(data, np.uint8, c_size, pos + y_size)
        vp = np.frombuffer(data, np.uint8, c_size, pos + y_size + c_size)
        if subsampled:
            up = up.reshape(h // 2, w // 2).repeat(2, 0).repeat(2, 1)
            vp = vp.reshape(h // 2, w // 2).repeat(2, 0).repeat(2, 1)
        else:
            up, vp = up.reshape(h, w), vp.reshape(h, w)
        frames.append(np.stack([yp, up, vp], axis=-1))
        pos += frame_bytes
    return np.stack(frames) if frames else np.zeros((0, h, w, 3), np.uint8), {
        "width": w,
        "height": h,
        "colorspace": colorspace,
    }


def encode_y4m(frames: np.ndarray, colorspace: str = "C444") -> bytes:
    """Encode ``(n, h, w, 3)`` uint8 YUV frames as YUV4MPEG2."""
    n, h, w, _ = frames.shape
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 {colorspace}\n".encode())
    for i in range(n):
        out += b"FRAME\n"
        f = frames[i]
        if colorspace.startswith("C420"):
            out += f[:, :, 0].tobytes()
            out += f[::2, ::2, 1].tobytes()
            out += f[::2, ::2, 2].tobytes()
        else:
            out += f[:, :, 0].tobytes() + f[:, :, 1].tobytes() + f[:, :, 2].tobytes()
    return bytes(out)
