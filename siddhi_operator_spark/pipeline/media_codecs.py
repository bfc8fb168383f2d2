"""Pure-python media codecs — the REAL decode tier behind the
multimodal feature interface (SURVEY.md LLM-pipeline scope; the task's
"decode / feature-extract" step).

No PIL/ffmpeg exists in this container, but PNG and WAV are simple
enough to decode with stdlib ``zlib``/``struct`` alone, so the decode
step is genuinely executable for those types: full scanline-filter
reconstruction (all five PNG filter types) and RIFF/PCM parsing, with
deterministic 8-dim feature vectors over the decoded pixels/samples.
Matching encoders exist so fixtures are REAL files generated in code
(no binary blobs checked in). A production deployment swaps the
per-payload functions for PIL/ffmpeg behind the same
``decode_media(payload, media_type)`` dispatch; mp4 has no pure-python
decoder and falls back to documented byte-statistics.

Scale note: decoding runs inside ``mapInPandas`` batches —
partition-local, no shuffle, no driver involvement; this module is
deliberately free of Spark imports so executors import it cheaply.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

FEATURE_DIM = 8

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type → samples/pixel


# ------------------------------------------------------------------
# PNG
# ------------------------------------------------------------------


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes, color_type: int = 0) -> bytes:
    """Minimal real PNG writer (8-bit depth, filter 0 scanlines).
    ``pixels`` is row-major, ``width*height*channels`` bytes."""
    channels = _CHANNELS[color_type]
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    raw = b"".join(
        b"\x00" + pixels[r * stride : (r + 1) * stride] for r in range(height)
    )
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> dict:
    """Parse IHDR, inflate IDAT, reconstruct all five scanline filter
    types. Returns width/height/depth/channels + the decoded pixel
    array (uint8 numpy, shape (height, width*channels))."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat = 8, b""
    width = height = depth = ctype = None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            width, height, depth, ctype = struct.unpack(">IIBB", body[:10])
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if width is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8:
        raise ValueError(f"only 8-bit depth supported, got {depth}")
    channels = _CHANNELS[ctype]
    bpp = channels  # bytes per pixel at 8-bit depth
    stride = width * channels
    raw = zlib.decompress(idat)
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT length does not match dimensions")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    p = 0
    for r in range(height):
        f = raw[p]
        line = np.frombuffer(raw[p + 1 : p + 1 + stride], dtype=np.uint8).astype(
            np.int32
        )
        p += 1 + stride
        if f == 0:
            rec = line
        elif f == 1:  # Sub
            rec = line.copy()
            for i in range(bpp, stride):
                rec[i] = (rec[i] + rec[i - bpp]) & 0xFF
        elif f == 2:  # Up
            rec = (line + prev) & 0xFF
        elif f == 3:  # Average
            rec = line.copy()
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + (a + prev[i]) // 2) & 0xFF
        elif f == 4:  # Paeth
            rec = line.copy()
            for i in range(stride):
                a = int(rec[i - bpp]) if i >= bpp else 0
                c = int(prev[i - bpp]) if i >= bpp else 0
                rec[i] = (rec[i] + _paeth(a, int(prev[i]), c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[r] = rec.astype(np.uint8)
        prev = rec
    return {
        "width": width,
        "height": height,
        "depth": depth,
        "channels": channels,
        "pixels": out,
    }


def png_features(data: bytes) -> list[float]:
    """8-dim feature vector from a REAL decode: dimensions, channel
    count, and pixel statistics."""
    img = decode_png(data)
    px = img["pixels"].astype(np.float64)
    return [
        float(img["width"]),
        float(img["height"]),
        float(img["channels"]),
        float(px.mean()),
        float(px.std()),
        float(px.min()),
        float(px.max()),
        float(np.median(px)),
    ]


# ------------------------------------------------------------------
# WAV (RIFF / PCM)
# ------------------------------------------------------------------


def encode_wav(
    samples, sample_rate: int = 8000, bits: int = 16, channels: int = 1
) -> bytes:
    """Minimal real PCM WAV writer. ``samples`` is an iterable of ints
    (interleaved when multichannel)."""
    if bits == 16:
        frames = b"".join(struct.pack("<h", int(s)) for s in samples)
    elif bits == 8:
        frames = bytes((int(s) + 128) & 0xFF for s in samples)
    else:
        raise ValueError("bits must be 8 or 16")
    block = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, bits
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(frames)) + frames
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> dict:
    """Parse RIFF chunks; return format fields + samples (numpy)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    frames = None
    while pos + 8 <= len(data):
        typ = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        if typ == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif typ == b"data":
            frames = body
        pos += 8 + ln + (ln & 1)  # RIFF chunks pad to even
    if fmt is None or frames is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt != 1:
        raise ValueError(f"only PCM supported, got format {audio_fmt}")
    if bits == 16:
        samples = np.frombuffer(frames, dtype="<i2").astype(np.float64)
    elif bits == 8:
        samples = np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    return {
        "channels": channels,
        "sample_rate": rate,
        "bits": bits,
        "samples": samples,
    }


def wav_features(data: bytes) -> list[float]:
    """8-dim feature vector from a REAL decode: format fields plus
    sample statistics (rms / peak / zero-crossing count)."""
    wav = decode_wav(data)
    s = wav["samples"]
    n = len(s)
    zc = int(np.count_nonzero(np.diff(np.signbit(s)))) if n > 1 else 0
    return [
        float(wav["channels"]),
        float(wav["sample_rate"]),
        float(wav["bits"]),
        float(n),
        float(s.mean()) if n else 0.0,
        float(np.sqrt(np.mean(s * s))) if n else 0.0,
        float(np.abs(s).max()) if n else 0.0,
        float(zc),
    ]


# ------------------------------------------------------------------
# dispatch
# ------------------------------------------------------------------


def byte_features(data: bytes) -> list[float]:
    """Fallback for types with no pure-python decoder (mp4): byte-level
    statistics — honest about not decoding, still deterministic."""
    a = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
    n = len(a)
    return [
        -1.0,
        -1.0,
        -1.0,
        float(n),
        float(a.mean()) if n else 0.0,
        float(a.std()) if n else 0.0,
        float(a.min()) if n else 0.0,
        float(a.max()) if n else 0.0,
    ]


def decode_media(payload: bytes, media_type: str) -> list[float]:
    """REAL decode dispatch: PNG and WAV decode fully (pure python);
    other types fall back to byte statistics."""
    if media_type == "image/png":
        return png_features(payload)
    if media_type == "audio/wav":
        return wav_features(payload)
    return byte_features(payload)
