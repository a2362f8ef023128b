"""Baseline JPEG codec, pure Python + numpy (no Pillow/cv2).

Closes the last multimodal decode gap: BMP/PPM/PNG decode elsewhere in
``codecs.py``; JPEG needs Huffman entropy coding + the 8x8 DCT, both
implemented here from the JFIF/T.81 baseline spec:

- **decoder**: SOI/APP*/COM/DQT/DHT/SOF0/SOS parsing, canonical
  Huffman tables built from the DHT segments (so any baseline file's
  tables work, not just ours), byte-unstuffed entropy decode, DC
  prediction, dequant + orthonormal IDCT via one 8x8 matrix product,
  generic MCU interleave for sampling factors 1-2 (4:4:4, 4:2:2,
  4:2:0, grayscale), restart intervals (DRI/RSTn with DC-predictor
  reset — the camera-JPEG layout), replication chroma upsampling,
  BT.601 YCbCr→RGB. Progressive (SOF2), arithmetic coding, and 12-bit
  precision raise ``NotImplementedError`` — never fake a decode.
- **encoder** (fixture grade): 4:4:4, flat quantization tables, and
  SELF-CHOSEN canonical Huffman tables (all DC categories at 4 bits,
  all 162 AC symbols at 8 bits) written into DHT — any prefix-free
  table is valid JPEG, and generating ours canonically avoids
  transcribing the 162-entry Annex K tables by hand. Compression is
  a little worse than libjpeg's; correctness is what fixtures need.

JPEG is lossy: tests assert tolerance bands (exact for uniform blocks,
small max-error for smooth content), not byte equality.

Everything is per-payload scalar code run inside Arrow-batched
``mapInPandas`` stages — no Spark imports, no driver state.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: zigzag[i] = (row, col) of the i-th coefficient
_ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# orthogonal 8x8 DCT matrix: F = M @ B @ M.T is exactly T.81's FDCT
_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

# fixture-grade flat quantization (any 1..255 table is valid JPEG)
_Q_LUMA = np.full((8, 8), 8, dtype=np.int32)
_Q_CHROMA = np.full((8, 8), 12, dtype=np.int32)

# self-chosen canonical Huffman layouts (see module docstring):
# DC: 12 category symbols, all 4-bit codes; AC: the 162 (run, size)
# symbols, all 8-bit codes — prefix-free by construction, far from the
# reserved all-ones code.
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [
    (r << 4) | s for r in range(16) for s in range(1, 11)
] + [0x00, 0xF0]  # EOB and ZRL


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81's canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _flat_table(symbols: list[int], length: int) -> tuple[list[int], list[int]]:
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return bits, list(symbols)


_DC_BITS, _DC_VALS = _flat_table(_DC_SYMBOLS, 4)
_AC_BITS, _AC_VALS = _flat_table(sorted(_AC_SYMBOLS), 8)
_DC_ENC = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _canonical_codes(_AC_BITS, _AC_VALS)


# --- bit I/O -----------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        # truncate consumed bits: without this the Python-int
        # accumulator grows with the WHOLE stream and every shift
        # becomes O(stream) — quadratic overall (23x measured at 128px)
        self.acc &= (1 << self.nbits) - 1

    def restart(self, m: int) -> None:
        """Byte-align (1-padding) and emit RSTm — markers are written
        RAW, never byte-stuffed."""
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (m & 7)])

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.out)


class _BitReader:
    """MSB-first reader over the entropy-coded segment, removing
    0xFF00 stuffing. Restart markers are consumed only at interval
    boundaries via ``sync_restart``; any marker elsewhere is an
    error."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated at marker")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            elif 0xD0 <= nxt <= 0xD7:
                raise ValueError(
                    "restart marker out of position (corrupt interval)"
                )
            else:
                raise ValueError("unexpected marker inside entropy stream")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def get(self, length: int) -> int:
        while self.nbits < length:
            self._fill()
        self.nbits -= length
        out = (self.acc >> self.nbits) & ((1 << length) - 1)
        # truncate consumed bits (see _BitWriter.put: unbounded bignum
        # accumulators make the codec quadratic in stream size)
        self.acc &= (1 << self.nbits) - 1
        return out

    def sync_restart(self, m: int) -> None:
        """At a restart boundary: drop the pad bits, consume RSTm."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + (m & 7)
        ):
            raise ValueError(f"expected JPEG restart marker RST{m & 7}")
        self.pos += 2

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.get(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map the t-bit magnitude to its signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# --- encoder -----------------------------------------------------------------


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _encode_block(
    w: _BitWriter, block: np.ndarray, q: np.ndarray, pred: int
) -> int:
    coef = _M @ (block - 128.0) @ _M.T
    quant = np.round(coef / q).astype(np.int64)
    zz = [int(quant[r, c]) for r, c in _ZIGZAG]
    diff = zz[0] - pred
    t = _category(diff)
    code, length = _DC_ENC[t]
    w.put(code, length)
    if t:
        w.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = zz[i]
        if v == 0:
            run += 1
            continue
        while run >= 16:
            c, ln = _AC_ENC[0xF0]  # ZRL
            w.put(c, ln)
            run -= 16
        t = _category(v)
        c, ln = _AC_ENC[(run << 4) | t]
        w.put(c, ln)
        w.put(v if v >= 0 else v + (1 << t) - 1, t)
        run = 0
    if last_nz < 63:
        c, ln = _AC_ENC[0x00]  # EOB
        w.put(c, ln)
    return zz[0]


def _dht_segment(tclass: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tid: int, q: np.ndarray) -> bytes:
    body = bytes([tid]) + bytes(int(q[r, c]) for r, c in _ZIGZAG)
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    width: int,
    height: int,
    rgb: bytes,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encoder (fixture grade, see module doc).
    ``subsampling``: "444" (one block per component per MCU) or "420"
    (2x2 luma blocks + box-filtered half-resolution chroma per MCU) —
    the latter exists chiefly so the decoder's generic MCU-interleave
    and chroma-upsample paths are exercised by our own fixtures.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (DC predictors reset) — the camera-JPEG layout."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != width*height*3")
    samp = {
        "444": [(1, 1), (1, 1), (1, 1)],
        "420": [(2, 2), (1, 1), (1, 1)],
        "gray": [(1, 1)],  # luma-only single-component file
    }.get(subsampling)
    if samp is None:
        raise ValueError("subsampling must be '444', '420', or 'gray'")
    img = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    ycc = _rgb_to_ycbcr(img.astype(np.float64))
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    # full-resolution edge-padded canvas, then per-component planes
    fh, fw = mcuy * 8 * vmax, mcux * 8 * hmax
    canvas = np.zeros((fh, fw, 3))
    canvas[:height, :width] = ycc
    canvas[height:, :width] = ycc[-1:, :, :]
    canvas[:, width:] = canvas[:, width - 1 : width, :]
    planes = []
    for ci, (h, v) in enumerate(samp):
        ry, rx = vmax // v, hmax // h
        p = canvas[:, :, ci]
        if ry > 1 or rx > 1:  # box-filter downsample
            p = p.reshape(fh // ry, ry, fw // rx, rx).mean(axis=(1, 3))
        planes.append(p)

    nc = len(samp)
    w = _BitWriter()
    preds = [0] * nc
    qtabs = [_Q_LUMA, _Q_CHROMA, _Q_CHROMA][:nc]
    mcu_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                w.restart(mcu_idx // restart_interval - 1)
                preds = [0] * nc
            mcu_idx += 1
            for ci, (h, v) in enumerate(samp):
                for bv in range(v):
                    for bh in range(h):
                        y0 = (my * v + bv) * 8
                        x0 = (mx * h + bh) * 8
                        preds[ci] = _encode_block(
                            w,
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8],
                            qtabs[ci],
                            preds[ci],
                        )
    scan = w.flush()

    comp_bytes = []
    sos_bytes = [nc]
    for ci, (h, v) in enumerate(samp):
        comp_bytes += [ci + 1, (h << 4) | v, 0 if ci == 0 else 1]
        sos_bytes += [ci + 1, 0x00 if ci == 0 else 0x11]
    sof = struct.pack(">BHHB", 8, height, width, nc) + bytes(comp_bytes)
    sos = bytes(sos_bytes + [0, 63, 0])
    dri = (
        b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"  # SOI
        + _dqt_segment(0, _Q_LUMA)
        + _dqt_segment(1, _Q_CHROMA)
        + b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof  # SOF0
        + _dht_segment(0, 0, _DC_BITS, _DC_VALS)
        + _dht_segment(1, 0, _AC_BITS, _AC_VALS)
        + _dht_segment(0, 1, _DC_BITS, _DC_VALS)
        + _dht_segment(1, 1, _AC_BITS, _AC_VALS)
        + dri
        + b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos  # SOS
        + scan
        + b"\xff\xd9"  # EOI
    )


# --- decoder -----------------------------------------------------------------


def decode_jpeg(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline JPEG → (width, height, raw RGB bytes)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    width = height = 0
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected in JPEG header")
        # T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes —
        # skip them so the byte after the LAST 0xFF is taken as the marker
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("JPEG has no scan data")
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0x0F
                if prec != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                q = np.zeros((8, 8), dtype=np.int32)
                for i, (r, c) in enumerate(_ZIGZAG):
                    q[r, c] = body[b + 1 + i]
                qtables[tid] = q
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tclass, tid = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = list(body[b + 17 : b + 17 + n])
                enc = _canonical_codes(bits, vals)
                htables[(tclass, tid)] = {
                    (ln, code): sym for sym, (code, ln) in enc.items()
                }
                b += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, height, width, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG precision supported")
            for i in range(nc):
                cid, hv, qid = body[6 + 3 * i : 9 + 3 * i]
                h, v = hv >> 4, hv & 0x0F
                if h not in (1, 2) or v not in (1, 2):
                    raise NotImplementedError(f"sampling {h}x{v} unsupported")
                comps.append({"id": cid, "h": h, "v": v, "q": qid})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("only baseline (SOF0) JPEG supported")
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("truncated JPEG DRI segment")
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            for i in range(ns):
                cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                for comp in comps:
                    if comp["id"] == cid:
                        comp["dc"] = tabs >> 4
                        comp["ac"] = tabs & 0x0F
            pos += seglen
            break
        pos += seglen
    else:
        raise ValueError("JPEG has no SOS segment")
    if not comps or not width:
        raise ValueError("JPEG missing SOF0")
    if len(comps) not in (1, 3):
        # 4-component (Adobe CMYK/YCCK) baseline files would pass every
        # other check and then be silently misread as YCbCr — never
        # fake a decode
        raise NotImplementedError(
            f"JPEG with {len(comps)} components unsupported (1=gray, 3=YCbCr)"
        )

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw)))

    reader = _BitReader(payload, pos)
    preds = [0] * len(comps)
    mcu_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                reader.sync_restart(mcu_idx // restart_interval - 1)
                preds = [0] * len(comps)
            mcu_idx += 1
            for ci, c in enumerate(comps):
                for bv in range(c["v"]):
                    for bh in range(c["h"]):
                        dc_tab = htables[(0, c["dc"])]
                        ac_tab = htables[(1, c["ac"])]
                        t = reader.read_symbol(dc_tab)
                        diff = _extend(reader.get(t), t) if t else 0
                        preds[ci] += diff
                        zz = [0] * 64
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = reader.read_symbol(ac_tab)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0:
                                if run != 15:
                                    raise ValueError("bad AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(reader.get(size), size)
                            k += 1
                        coef = np.zeros((8, 8))
                        for i, (r, cc) in enumerate(_ZIGZAG):
                            coef[r, cc] = zz[i]
                        coef *= qtables[c["q"]]
                        block = _M.T @ coef @ _M + 128.0
                        y0 = (my * c["v"] + bv) * 8
                        x0 = (mx * c["h"] + bh) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block

    # upsample chroma by replication to (height, width)
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:height, :width])
    if len(comps) == 1:
        y = np.clip(full[0], 0, 255)
        rgb = np.repeat(y[:, :, None], 3, axis=2)
    else:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.clip(np.stack([r, g, b], axis=-1), 0, 255)
    return width, height, np.round(rgb).astype(np.uint8).tobytes()
