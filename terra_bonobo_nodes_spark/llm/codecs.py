"""Pure-Python/numpy codecs for the multimodal decode contract.

The container has no Pillow/cv2/librosa, but five real formats are
decodable with the standard library + numpy alone:

- BMP (Windows bitmap, uncompressed 24/32-bit BITMAPINFOHEADER) —
  ~60 LoC of struct parsing,
- PPM (Netpbm P6 binary RGB) — a whitespace-delimited header + raw RGB,
- PNG (8/16-bit gray/RGB/palette/alpha, incl. Adam7 interlace) —
  stdlib ``zlib`` inflate + the five scanline filters unrolled by hand,
- JPEG (baseline SOF0, generic sampling factors) — full Huffman entropy
  decode + numpy IDCT in ``jpeg.py``,
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
    contract. BMP/PPM/PNG/JPEG all decode for real (PNG via stdlib
    zlib + hand-rolled unfiltering; baseline JPEG via the full Huffman
    + IDCT implementation in jpeg.py); unknown formats still raise,
    per the stub policy (never fake a decode)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:4] == b"\x89PNG":
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from terra_bonobo_nodes_spark.llm.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise NotImplementedError(
        f"no pure-Python decoder for magic {payload[:4]!r}; inject a decoder"
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


# --- PNG ---------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


_ADAM7 = [  # (x0, y0, dx, dy) per pass
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(
    raw: bytes, offset: int, h: int, stride: int, bpp: int
) -> tuple[bytearray, int]:
    """Undo the five scanline filters over ``h`` rows of ``stride``
    bytes starting at ``offset`` (each row prefixed by its filter
    byte). Returns (pixels, offset past the consumed rows) — shared by
    the sequential path and each Adam7 pass."""
    if len(raw) - offset < h * (stride + 1):
        raise ValueError("PNG pixel data size mismatch")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    for y in range(h):
        row_start = offset + y * (stride + 1)
        ftype = raw[row_start]
        line = bytearray(raw[row_start + 1 : row_start + 1 + stride])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                up_left = prev[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + _paeth(left, prev[x], up_left)) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype} invalid")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return out, offset + h * (stride + 1)


def decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """Decode an 8- or 16-bit PNG (sequential or Adam7-interlaced) →
    (width, height, raw 8-bit RGB; 16-bit samples reduce to their high
    byte).

    The round-5 'environment-blocked' call was half wrong: PNG's only
    external dependency is INFLATE, and stdlib ``zlib`` provides it —
    the rest is chunk parsing and the five scanline filters, done here
    by hand. Supports color types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA) at depths 8/16, and the sub-byte depths
    1/2/4 for gray and palette (bit-packed rows, MSB first, each row
    padded to a byte — the bilevel-scan/paletted-icon layouts); alpha
    is dropped, gray expanded, and sub-byte gray scaled by
    255/(2^depth-1) so the output contract matches the BMP/PPM
    decoders."""
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    ihdr = None
    plte = b""
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"PNG bit depth {depth} invalid")
    if depth == 16 and color == 3:
        raise ValueError("16-bit palette PNG is invalid")
    if depth < 8 and color not in (0, 3):
        raise ValueError(
            f"PNG sub-byte depth {depth} is only valid for gray/palette"
        )
    if interlace not in (0, 1):
        raise ValueError(f"PNG interlace method {interlace} invalid")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise NotImplementedError(f"PNG color type {color} unsupported")
    sub_byte = depth < 8
    sb = max(depth // 8, 1)  # bytes per sample; 16-bit keeps the HIGH byte

    import zlib

    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:  # truncated/corrupt IDAT -> codec's own error
        raise ValueError(f"PNG IDAT stream corrupt or truncated: {e}") from e
    def _row_stride(cols: int) -> int:
        # sub-byte rows bit-pack MSB-first, padded to a whole byte
        return (cols * depth + 7) // 8 if sub_byte else cols * channels * sb

    # filters compare bytes `fbpp` apart; for sub-byte that is 1 byte
    fbpp = 1 if sub_byte else channels * sb

    def to_px(buf: bytearray, rows: int, cols: int) -> "np.ndarray":
        if not sub_byte:
            a = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(
                rows, cols, channels, sb
            )
            return a[..., 0]  # big-endian: byte 0 is the high byte
        a = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(rows, -1)
        bits = np.unpackbits(a, axis=1)
        # group `depth` bits per sample, MSB first, drop row padding
        weights = 1 << np.arange(depth - 1, -1, -1)
        vals = (bits.reshape(rows, -1, depth) * weights).sum(axis=2)
        return vals[:, :cols, None].astype(np.uint8)

    if interlace == 0:
        stride = _row_stride(w)
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG pixel data size mismatch")
        out, _ = _png_unfilter(raw, 0, h, stride, fbpp)
        px = to_px(out, h, w)
    else:  # Adam7: 7 sub-images, each filtered independently, scattered
        px = np.zeros((h, w, channels), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (w - x0 + dx - 1) // dx
            hp = (h - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue  # empty pass contributes no scanlines
            stride = _row_stride(wp)
            sub, off = _png_unfilter(raw, off, hp, stride, fbpp)
            px[y0::dy, x0::dx] = to_px(sub, hp, wp)
        if off != len(raw):
            raise ValueError("PNG interlaced pixel data size mismatch")
    if sub_byte and color == 0:
        # scale 1/2/4-bit gray to full range: 255/(2^depth-1) is exact
        px = (px.astype(np.uint16) * (255 // ((1 << depth) - 1))).astype(np.uint8)
    if color == 2:
        rgb = px
    elif color == 6:
        rgb = px[:, :, :3]
    elif color == 0:
        rgb = np.repeat(px, 3, axis=2)
    elif color == 4:
        rgb = np.repeat(px[:, :, :1], 3, axis=2)
    else:  # palette
        if not plte:
            raise ValueError("palette PNG missing PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        if int(px.max()) >= len(pal):  # corrupt index -> codec's own error
            raise ValueError(
                f"PNG palette index {int(px.max())} out of range "
                f"(palette has {len(pal)} entries)"
            )
        rgb = pal[px[:, :, 0]]
    return w, h, rgb.astype(np.uint8).tobytes()


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, rgb: bytes, filter_type: int = 0) -> bytes:
    """Minimal RGB8 PNG encoder (test-fixture grade). ``filter_type``
    applies one of the five scanline filters to every row so the
    decoder's unfiltering paths are each exercisable by roundtrip."""
    import zlib

    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != width*height*3")
    stride = width * 3
    bpp = 3
    arr = bytearray(rgb)
    lines = bytearray()
    prev = bytes(stride)
    for y in range(height):
        cur = bytes(arr[y * stride : (y + 1) * stride])
        f = bytearray(stride)
        if filter_type == 0:
            f[:] = cur
        elif filter_type == 1:
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                f[x] = (cur[x] - left) & 0xFF
        elif filter_type == 2:
            for x in range(stride):
                f[x] = (cur[x] - prev[x]) & 0xFF
        elif filter_type == 3:
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                f[x] = (cur[x] - ((left + prev[x]) >> 1)) & 0xFF
        elif filter_type == 4:
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                up_left = prev[x - bpp] if x >= bpp else 0
                f[x] = (cur[x] - _paeth(left, prev[x], up_left)) & 0xFF
        else:
            raise ValueError("filter_type must be 0..4")
        lines.append(filter_type)
        lines.extend(f)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_subbyte(
    width: int,
    height: int,
    samples: "list[int]",
    depth: int,
    palette: bytes | None = None,
    filter_type: int = 0,
) -> bytes:
    """Fixture encoder for 1/2/4-bit PNGs (gray when ``palette`` is
    None, color type 3 otherwise): row-major per-pixel sample values,
    bit-packed MSB-first with byte-padded rows, ``filter_type`` 0
    (None) or 2 (Up — byte-level, exercising the sub-byte unfilter
    path). The layouts bilevel scans and paletted icons actually use."""
    import zlib

    if depth not in (1, 2, 4):
        raise ValueError("depth must be 1, 2, or 4")
    if len(samples) != width * height:
        raise ValueError("samples length != width*height")
    if any(s < 0 or s >= (1 << depth) for s in samples):
        raise ValueError(f"sample out of range for depth {depth}")
    stride = (width * depth + 7) // 8
    rows = []
    for y in range(height):
        row = bytearray(stride)
        for x in range(width):
            v = samples[y * width + x]
            bitpos = x * depth
            row[bitpos // 8] |= v << (8 - depth - bitpos % 8)
        rows.append(bytes(row))
    lines = bytearray()
    prev = bytes(stride)
    for row in rows:
        if filter_type == 0:
            lines.append(0)
            lines.extend(row)
        elif filter_type == 2:  # Up
            lines.append(2)
            lines.extend((c - p) & 0xFF for c, p in zip(row, prev))
        else:
            raise ValueError("sub-byte fixture encoder supports filters 0 and 2")
        prev = row
    color = 0 if palette is None else 3
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color, 0, 0, 0)
    out = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _png_chunk(b"PLTE", palette)
    return out + _png_chunk(b"IDAT", zlib.compress(bytes(lines))) + _png_chunk(b"IEND", b"")
