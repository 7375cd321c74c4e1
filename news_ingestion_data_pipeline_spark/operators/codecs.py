"""Pure-numpy media codecs for the multimodal pipeline: BMP and PPM image
encode/decode, WAV/PCM audio encode/decode, and a trivial length-prefixed
frame container for "video".

These close the round-1 stub boundary (operators/multimodal._decode_real)
without any codec library: BMP 24-bpp/BI_RGB, PPM P6, and WAV PCM-s16le are
fixed-layout formats decodable with header parsing + one frombuffer/reshape.
They are real decoders — they parse the actual container headers, honor BMP
row padding and bottom-up row order and BGR channel order, and walk RIFF
chunks — so swapping in Pillow/libav later only widens format coverage.

Reference parity note: the reference pipeline is text-only scraping (no
media path, see SURVEY.md §2); this module is part of the LLM-pipeline
extension the north star requires.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# BMP (24-bpp uncompressed BI_RGB, the universal baseline flavor)
# ---------------------------------------------------------------------------

_BMP_HEADER = struct.Struct("<2sIHHI")          # magic, file size, res, res, data offset
_BMP_INFO = struct.Struct("<IiiHHIIiiII")        # BITMAPINFOHEADER


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bpp BMP bytes (bottom-up rows, BGR,
    4-byte row padding)."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"encode_bmp wants (h, w, 3), got {img.shape}")
    h, w = img.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    bgr = img[::-1, :, ::-1].astype(np.uint8)    # bottom-up + RGB→BGR
    if pad:
        rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
        rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
        pixel_data = rows.tobytes()
    else:
        pixel_data = bgr.tobytes()
    offset = _BMP_HEADER.size + _BMP_INFO.size
    header = _BMP_HEADER.pack(b"BM", offset + len(pixel_data), 0, 0, offset)
    info = _BMP_INFO.pack(_BMP_INFO.size, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0)
    return header + info + pixel_data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bpp BI_RGB BMP bytes → (h, w, 3) uint8 RGB."""
    magic, _, _, _, offset = _BMP_HEADER.unpack_from(payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (_, w, h, _, bpp, compression, *_rest) = _BMP_INFO.unpack_from(payload, _BMP_HEADER.size)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bpp BI_RGB supported (bpp={bpp}, comp={compression})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=offset)
    img = rows.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if bottom_up:
        img = img[::-1]
    return img[:, :, ::-1].copy()                # BGR→RGB


# ---------------------------------------------------------------------------
# PPM (P6 binary, maxval 255)
# ---------------------------------------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = 3 whitespace-separated tokens (w, h, maxval) after the magic;
    # comments (#…\n) allowed between tokens
    pos, fields = 2, []
    while len(fields) < 3:
        while payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        while not payload[end : end + 1].isspace():
            end += 1
        fields.append(int(payload[pos:end]))
        pos = end
    pos += 1                                     # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    return (
        np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


# ---------------------------------------------------------------------------
# WAV (RIFF, PCM signed 16-bit little-endian, mono)
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """1-D int16 samples → mono PCM-s16le WAV bytes."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Mono PCM-s16le WAV bytes → (int16 sample array, sample_rate).
    Walks RIFF chunks — fmt/data need not be adjacent."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if (audio_fmt, channels, bits) != (1, 1, 16):
                raise ValueError(
                    f"only mono PCM-16 supported (fmt={audio_fmt}, ch={channels}, bits={bits})"
                )
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2").copy()
        pos += 8 + size + (size % 2)             # RIFF chunks are 2-byte aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples, rate


# ---------------------------------------------------------------------------
# Frame container ("video" = packed frames at a fixed interval). A stand-in
# for a real video container with the same access pattern: header → seek to
# frame k → decode one still.
# ---------------------------------------------------------------------------

_FPK_MAGIC = b"FPK1"


def encode_framepack(frames: list[bytes], frame_interval_ms: int) -> bytes:
    out = [_FPK_MAGIC, struct.pack("<II", len(frames), frame_interval_ms)]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def decode_framepack(payload: bytes) -> tuple[list[bytes], int]:
    """→ (frame payloads, frame_interval_ms)."""
    if payload[:4] != _FPK_MAGIC:
        raise ValueError("not a framepack payload")
    n, interval = struct.unpack_from("<II", payload, 4)
    frames, pos = [], 12
    for _ in range(n):
        (size,) = struct.unpack_from("<I", payload, pos)
        frames.append(payload[pos + 4 : pos + 4 + size])
        pos += 4 + size
    return frames, interval
