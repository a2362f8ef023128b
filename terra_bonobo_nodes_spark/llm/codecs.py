"""Pure-Python/numpy codecs for the multimodal decode contract.

The container has no Pillow/cv2/librosa, but three real formats are
decodable with the standard library + numpy alone:

- BMP (Windows bitmap, uncompressed 24/32-bit BITMAPINFOHEADER) —
  ~60 LoC of struct parsing,
- PPM (Netpbm P6 binary RGB) — a whitespace-delimited header + raw RGB,
- WAV (RIFF PCM) — stdlib ``wave``.

``image_decoder`` dispatches on magic bytes and satisfies the
``decode_image(decoder=...)`` contract in ``multimodal.py`` with REAL
pixels; anything else still raises ``NotImplementedError`` so a stubbed
format can never masquerade as decoded. ``encode_bmp``/``encode_ppm``
exist so tests can build byte-exact fixtures without any image library.

Everything here is per-payload scalar code executed inside Arrow-batched
``mapInPandas`` stages — no Spark imports, no driver state.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# --- BMP ---------------------------------------------------------------------


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Decode an uncompressed 24/32-bit BMP → (width, height, raw RGB
    bytes, row-major top-down). Handles bottom-up (positive height) and
    top-down (negative height) files and 4-byte row padding."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    (pixel_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise NotImplementedError(f"BITMAPCOREHEADER (size {hdr_size}) unsupported")
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0:
        raise NotImplementedError(f"BMP compression {compression} unsupported")
    if bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp {bpp} unsupported")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height <= 0:
        raise ValueError("degenerate BMP dimensions")
    nch = bpp // 8
    stride = (width * nch + 3) & ~3  # rows padded to 4 bytes
    need = pixel_off + stride * height
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=pixel_off
    ).reshape(height, stride)[:, : width * nch]
    px = rows.reshape(height, width, nch)
    if not top_down:
        px = px[::-1]
    rgb = px[:, :, [2, 1, 0]]  # BGR(A) → RGB, alpha dropped
    return width, height, np.ascontiguousarray(rgb).tobytes()


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Encode top-down RGB bytes as a bottom-up 24-bit BMP (the common
    on-disk layout). Fixture builder for tests; inverse of decode_bmp."""
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    bgr = px[::-1, :, [2, 1, 0]]
    stride = (width * 3 + 3) & ~3
    padded = np.zeros((height, stride), dtype=np.uint8)
    padded[:, : width * 3] = bgr.reshape(height, width * 3)
    body = padded.tobytes()
    file_size = 54 + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + body


# --- PPM (Netpbm P6) ---------------------------------------------------------


def _ppm_tokens(payload: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read n whitespace-delimited integer tokens, skipping # comments;
    returns (values, offset past the single whitespace after the last)."""
    vals: list[int] = []
    i = start
    while len(vals) < n:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i < len(payload) and payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        vals.append(int(payload[i:j]))
        i = j
    return vals, i + 1  # exactly one whitespace byte before raster data


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a binary P6 PPM → (width, height, raw RGB top-down)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    (width, height, maxval), off = _ppm_tokens(payload, 3, 2)
    if maxval != 255:
        raise NotImplementedError(f"PPM maxval {maxval} unsupported")
    need = off + width * height * 3
    if len(payload) < need:
        raise ValueError("truncated PPM raster")
    return width, height, payload[off:need]


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


# --- dispatch + resize -------------------------------------------------------


def image_decoder(payload: bytes) -> tuple[int, int, bytes]:
    """Magic-byte dispatch satisfying the decode_image(decoder=...)
    contract. PNG/JPEG need a compression library this container lacks —
    those still raise, per the stub policy (never fake a decode)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    raise NotImplementedError(
        f"no pure-Python decoder for magic {payload[:4]!r} "
        "(PNG/JPEG need Pillow/cv2; inject a decoder)"
    )


def resize_nearest(
    width: int, height: int, rgb: bytes, target_w: int, target_h: int
) -> bytes:
    """Nearest-neighbor resample to (target_w, target_h) — numpy fancy
    indexing, no loops. Matches the pixel-center convention
    src_idx = floor((dst_idx + 0.5) * src/dst)."""
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    ys = np.minimum(
        ((np.arange(target_h) + 0.5) * height / target_h).astype(np.int64), height - 1
    )
    xs = np.minimum(
        ((np.arange(target_w) + 0.5) * width / target_w).astype(np.int64), width - 1
    )
    return np.ascontiguousarray(px[ys[:, None], xs[None, :]]).tobytes()


# --- WAV ---------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode RIFF PCM WAV → (sample_rate, n_channels, n_frames,
    float64 samples in [-1, 1] shaped (n_frames, n_channels))."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate, nch, width = w.getframerate(), w.getnchannels(), w.getsampwidth()
        n = w.getnframes()
        raw = w.readframes(n)
    if width == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 4:
        arr = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"WAV sample width {width} unsupported")
    return rate, nch, n, arr.reshape(n, nch)


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """Encode float samples in [-1, 1] (n_frames, n_channels) as 16-bit
    PCM WAV. Fixture builder; inverse of decode_wav up to quantization."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    ints = (pcm * 32767.0).round().astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ints.shape[1] if ints.ndim > 1 else 1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(ints.tobytes())
    return buf.getvalue()
