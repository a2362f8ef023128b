"""Baseline JPEG codec, pure Python + numpy (no Pillow/cv2).

Closes the last multimodal decode gap: BMP/PPM/PNG decode elsewhere in
``codecs.py``; JPEG needs Huffman entropy coding + the 8x8 DCT, both
implemented here from the JFIF/T.81 baseline spec:

- **decoder**: SOI/APP*/COM/DQT/DHT/SOF0/SOF2/SOS parsing, canonical
  Huffman tables built from the DHT segments (so any file's tables
  work, not just ours), byte-unstuffed entropy decode, DC prediction,
  dequant + batched orthonormal IDCT, generic MCU interleave for
  sampling factors 1-2 (4:4:4, 4:2:2, 4:2:0, grayscale), restart
  intervals (DRI/RSTn with DC-predictor/EOB-run reset — the
  camera-JPEG layout), and full PROGRESSIVE decode (T.81 Annex G:
  multi-scan spectral selection + successive approximation, DC
  first/refine, AC first/refine with EOB runs and interleaved
  correction bits — the libjpeg jdphuff semantics, since real web
  corpora are majority-progressive). Replication chroma upsampling,
  BT.601 YCbCr→RGB. Arithmetic coding, hierarchical (SOF3/5-7/9-11),
  and 12-bit precision raise ``NotImplementedError`` — never fake a
  decode.
- **encoder** (fixture grade): 4:4:4/4:2:2/4:2:0/gray, flat quantization
  tables, and SELF-CHOSEN canonical Huffman tables (all DC categories
  at 4 bits, all AC symbols at 8 bits) written into DHT — any
  prefix-free table is valid JPEG, and generating ours canonically
  avoids transcribing the 162-entry Annex K tables by hand.
  ``progressive=True`` emits a real multi-scan file (DC first at
  Al=1 + DC refine, split AC bands at Al=1 + AC refine, cross-block
  EOB runs with buffered correction bits, optional DRI/RSTn restart
  intervals with per-interval predictor/EOB-run resets) so the
  decoder's progressive paths are exercised by our own fixtures.
  Compression is a little worse than libjpeg's; correctness is what
  fixtures need.

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

# progressive AC scans additionally need the EOBn symbols (r<<4 with
# size 0, r = 0..14, T.81 G.1.2.2) — 176 symbols total, still flat 8-bit
_AC_PROG_SYMBOLS = sorted(_AC_SYMBOLS + [(r << 4) for r in range(15) if r != 0])
_AC_PROG_BITS, _AC_PROG_VALS = _flat_table(_AC_PROG_SYMBOLS, 8)
_AC_PROG_ENC = _canonical_codes(_AC_PROG_BITS, _AC_PROG_VALS)

# natural (row-major) coefficient index -> zigzag index, for batched
# dequant+IDCT over the per-block zigzag coefficient store
_NAT_TO_ZZ = np.zeros(64, dtype=np.int64)
for _i, (_r2, _c2) in enumerate(_ZIGZAG):
    _NAT_TO_ZZ[_r2 * 8 + _c2] = _i
_ZZ_ROWS = np.array([r for r, _ in _ZIGZAG])
_ZZ_COLS = np.array([c for _, c in _ZIGZAG])


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
    progressive: bool = False,
) -> bytes:
    """Baseline JFIF encoder (fixture grade, see module doc).
    ``subsampling``: "444" (one block per component per MCU), "422"
    (2x1 luma blocks, horizontally halved chroma), or "420" (2x2 luma
    blocks + box-filtered half-resolution chroma per MCU) — the latter
    two exist chiefly so the decoder's generic MCU-interleave and
    chroma-upsample paths (including mixed h != v sampling) are
    exercised by our own fixtures.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (DC predictors reset) — the camera-JPEG layout.
    ``progressive=True`` emits SOF2 with the scan script documented in
    :func:`_encode_progressive` (restart intervals are baseline-only
    in this fixture encoder)."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != width*height*3")
    samp = {
        "444": [(1, 1), (1, 1), (1, 1)],
        "422": [(2, 1), (1, 1), (1, 1)],  # horizontal-only chroma halving
        "420": [(2, 2), (1, 1), (1, 1)],
        "gray": [(1, 1)],  # luma-only single-component file
    }.get(subsampling)
    if samp is None:
        raise ValueError("subsampling must be '444', '422', '420', or 'gray'")
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

    if progressive:
        return _encode_progressive(planes, samp, width, height, restart_interval)

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


# --- progressive encoder -----------------------------------------------------


class _ProgACState:
    """Cross-block AC-scan state: the accumulated end-of-band run plus
    the correction bits buffered inside it (T.81 G.1.2.3 / the libjpeg
    jcphuff BE buffer). Both flush together, EOBn symbol first."""

    def __init__(self, w: _BitWriter, enc: dict[int, tuple[int, int]]) -> None:
        self.w = w
        self.enc = enc
        self.eobrun = 0
        self.pending: list[int] = []

    def flush(self) -> None:
        if self.eobrun == 0 and not self.pending:
            return
        nbits = self.eobrun.bit_length() - 1
        code, ln = self.enc[nbits << 4]
        self.w.put(code, ln)
        if nbits:
            self.w.put(self.eobrun & ((1 << nbits) - 1), nbits)
        for bit in self.pending:
            self.w.put(bit, 1)
        self.eobrun = 0
        self.pending = []


def _emit_ac_first(
    st: _ProgACState, band: "np.ndarray", al: int
) -> None:
    """One block of an AC first scan (Ah=0): values point-transformed
    by Al, zero runs + EOB runs exactly as G.1.2.2."""
    w, enc = st.w, st.enc
    r = 0
    for v in band:
        v = int(v)
        t = (v if v >= 0 else -v) >> al
        if t == 0:
            r += 1
            continue
        st.flush()
        while r > 15:
            code, ln = enc[0xF0]
            w.put(code, ln)
            r -= 16
        nbits = t.bit_length()
        sv = t if v >= 0 else -t
        code, ln = enc[(r << 4) | nbits]
        w.put(code, ln)
        w.put(sv if sv >= 0 else sv + (1 << nbits) - 1, nbits)
        r = 0
    if r > 0:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush()


def _emit_ac_refine(
    st: _ProgACState, band: "np.ndarray", al: int
) -> None:
    """One block of an AC refinement scan (Ah=Al+1): newly-nonzero
    coefficients coded with size 1 + sign, already-nonzero ones as
    correction bits emitted after the NEXT symbol (or folded into the
    EOB run's buffer) — the bit ordering the decoder's advance loop
    consumes (libjpeg jcphuff encode_mcu_AC_refine)."""
    w, enc = st.w, st.enc
    vals = [int(v) for v in band]
    ts = [((v if v >= 0 else -v) >> al) for v in vals]
    eob_pos = -1
    for i, t in enumerate(ts):
        if t == 1:
            eob_pos = i
    r = 0
    br: list[int] = []
    for i, (v, t) in enumerate(zip(vals, ts)):
        if t == 0:
            r += 1
            continue
        while r > 15 and i <= eob_pos:
            st.flush()
            code, ln = enc[0xF0]
            w.put(code, ln)
            r -= 16
            for bit in br:
                w.put(bit, 1)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        st.flush()
        code, ln = enc[(r << 4) | 1]
        w.put(code, ln)
        w.put(0 if v < 0 else 1, 1)
        for bit in br:
            w.put(bit, 1)
        br = []
        r = 0
    if r > 0 or br:
        st.eobrun += 1
        st.pending.extend(br)
        if st.eobrun == 0x7FFF:
            st.flush()


def _encode_progressive(
    planes: list["np.ndarray"],
    samp: list[tuple[int, int]],
    width: int,
    height: int,
    restart_interval: int = 0,
) -> bytes:
    """SOF2 multi-scan writer. Scan script (exercises every decoder
    path): interleaved DC first at Al=1; per-component AC bands
    (1-5, 6-63) at Al=1; interleaved DC refine to Al=0; per-component
    AC refine to Al=0. AC scans are non-interleaved as T.81 requires.
    ``restart_interval`` > 0 emits DRI + RSTn every that many MCUs
    (interleaved scans) / data units (non-interleaved scans), with DC
    predictors and the end-of-band run reset per interval — the
    restart layout real progressive web JPEGs carry."""
    nc = len(samp)
    qtabs = [_Q_LUMA, _Q_CHROMA, _Q_CHROMA][:nc]
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcuy = planes[0].shape[0] // (8 * samp[0][1])
    mcux = planes[0].shape[1] // (8 * samp[0][0])

    # quantize every block once, zigzag order (all scans share it)
    coefs = []
    for ci, (h, v) in enumerate(samp):
        p = planes[ci]
        nbv, nbh = p.shape[0] // 8, p.shape[1] // 8
        arr = np.zeros((nbv, nbh, 64), dtype=np.int64)
        for by in range(nbv):
            for bx in range(nbh):
                block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                qc = np.round((_M @ (block - 128.0) @ _M.T) / qtabs[ci]).astype(
                    np.int64
                )
                arr[by, bx] = qc[_ZZ_ROWS, _ZZ_COLS]
        coefs.append(arr)

    def _ac_block_grid(ci: int) -> tuple[int, int]:
        # non-interleaved scans cover the component's OWN block grid
        # (ceil dims), not the MCU-padded plane (T.81 A.2.2)
        h, v = samp[ci]
        cw = -(-width * h // hmax)
        ch = -(-height * v // vmax)
        return -(-ch // 8), -(-cw // 8)

    def _dc_scan(ah: int, al: int) -> bytes:
        w = _BitWriter()
        preds = [0] * nc
        mcu_idx = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                    w.restart(mcu_idx // restart_interval - 1)
                    preds = [0] * nc
                mcu_idx += 1
                for ci, (h, v) in enumerate(samp):
                    for bv in range(v):
                        for bh_ in range(h):
                            dc = int(coefs[ci][my * v + bv, mx * h + bh_, 0])
                            if ah == 0:
                                pt = dc >> al  # arithmetic point transform
                                diff = pt - preds[ci]
                                preds[ci] = pt
                                t = _category(diff)
                                code, ln = _DC_ENC[t]
                                w.put(code, ln)
                                if t:
                                    w.put(
                                        diff if diff >= 0 else diff + (1 << t) - 1, t
                                    )
                            else:
                                w.put((dc >> al) & 1, 1)
        return w.flush()

    def _ac_scan(ci: int, ss: int, se: int, ah: int, al: int) -> bytes:
        w = _BitWriter()
        st = _ProgACState(w, _AC_PROG_ENC)
        bh_n, bw = _ac_block_grid(ci)
        unit = 0
        for by in range(bh_n):
            for bx in range(bw):
                if restart_interval and unit and unit % restart_interval == 0:
                    # the EOB run (and its buffered bits) may not cross
                    # a restart boundary — flush BEFORE aligning
                    st.flush()
                    w.restart(unit // restart_interval - 1)
                unit += 1
                band = coefs[ci][by, bx, ss : se + 1]
                if ah == 0:
                    _emit_ac_first(st, band, al)
                else:
                    _emit_ac_refine(st, band, al)
        st.flush()
        return w.flush()

    def _sos(scomps: list[tuple[int, int]], ss: int, se: int, ah: int, al: int) -> bytes:
        body = [len(scomps)]
        for cid, tabs in scomps:
            body += [cid, tabs]
        body += [ss, se, (ah << 4) | al]
        return b"\xff\xda" + struct.pack(">H", len(body) + 2) + bytes(body)

    comp_bytes = []
    for ci, (h, v) in enumerate(samp):
        comp_bytes += [ci + 1, (h << 4) | v, 0 if ci == 0 else 1]
    sof = struct.pack(">BHHB", 8, height, width, nc) + bytes(comp_bytes)
    out = bytearray(
        b"\xff\xd8"
        + _dqt_segment(0, _Q_LUMA)
        + _dqt_segment(1, _Q_CHROMA)
        + b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof  # SOF2
        + _dht_segment(0, 0, _DC_BITS, _DC_VALS)
        + _dht_segment(1, 0, _AC_PROG_BITS, _AC_PROG_VALS)
        + _dht_segment(0, 1, _DC_BITS, _DC_VALS)
        + _dht_segment(1, 1, _AC_PROG_BITS, _AC_PROG_VALS)
        + (
            b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
            if restart_interval
            else b""
        )
    )
    all_dc = [(ci + 1, (0 if ci == 0 else 1) << 4) for ci in range(nc)]
    out += _sos(all_dc, 0, 0, 0, 1) + _dc_scan(0, 1)
    for ci in range(nc):
        actab = 0 if ci == 0 else 1
        out += _sos([(ci + 1, actab)], 1, 5, 0, 1) + _ac_scan(ci, 1, 5, 0, 1)
        out += _sos([(ci + 1, actab)], 6, 63, 0, 1) + _ac_scan(ci, 6, 63, 0, 1)
    out += _sos(all_dc, 0, 0, 1, 0) + _dc_scan(1, 0)
    for ci in range(nc):
        actab = 0 if ci == 0 else 1
        out += _sos([(ci + 1, actab)], 1, 63, 1, 0) + _ac_scan(ci, 1, 63, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)


# --- decoder -----------------------------------------------------------------


def _decode_block_full(reader, dc_tab, ac_tab, zz, pred: int) -> int:
    """Baseline (SOF0) block: DC diff + full AC band in one pass."""
    t = reader.read_symbol(dc_tab)
    diff = _extend(reader.get(t), t) if t else 0
    pred += diff
    zz[0] = pred
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
    return pred


def _decode_block_dc_first(reader, dc_tab, zz, al: int, pred: int) -> int:
    """Progressive DC first scan (G.1.2.1): prediction runs in the
    point-transformed domain; the stored coefficient is shifted back."""
    t = reader.read_symbol(dc_tab)
    diff = _extend(reader.get(t), t) if t else 0
    pred += diff
    zz[0] = pred << al
    return pred


def _decode_block_dc_refine(reader, zz, al: int) -> None:
    """Progressive DC refinement: one raw bit per block, OR-ed into the
    Al position (two's-complement, so negative values refine correctly)."""
    if reader.get(1):
        zz[0] = int(zz[0]) | (1 << al)


def _decode_block_ac_first(reader, ac_tab, zz, ss: int, se: int, al: int, eobrun: int) -> int:
    """Progressive AC first scan (G.1.2.2) with end-of-band runs."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = reader.read_symbol(ac_tab)
        run, size = sym >> 4, sym & 0x0F
        if size == 0:
            if run == 15:
                k += 16  # ZRL
                continue
            eobrun = 1 << run
            if run:
                eobrun += reader.get(run)
            return eobrun - 1
        k += run
        if k > se:
            raise ValueError("AC index overflow in progressive scan")
        zz[k] = _extend(reader.get(size), size) << al
        k += 1
    return 0


def _decode_block_ac_refine(reader, ac_tab, zz, ss: int, se: int, al: int, eobrun: int) -> int:
    """Progressive AC refinement (G.1.2.3): newly-nonzero coefficients
    arrive as size-1 symbols; history-nonzero coefficients consume one
    correction bit each as the position pointer advances past them —
    including inside ZRL skips and end-of-band runs (the libjpeg
    jdphuff advance-loop semantics)."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = reader.read_symbol(ac_tab)
            run, size = sym >> 4, sym & 0x0F
            val = 0
            if size != 0:
                if size != 1:
                    raise ValueError("AC refinement size must be 1")
                val = p1 if reader.get(1) else m1
            elif run != 15:
                eobrun = 1 << run
                if run:
                    eobrun += reader.get(run)
                break  # the EOB-run tail below finishes this block
            # advance: correction bits for nonzero history, count
            # `run` still-zero coefficients (16 total for ZRL)
            while k <= se:
                if zz[k] != 0:
                    if reader.get(1) and (int(zz[k]) & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val:
                if k > se:
                    raise ValueError("AC refine position overflow")
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                if reader.get(1) and (int(zz[k]) & p1) == 0:
                    zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(
    payload: bytes,
    pos: int,
    scan_comps: list[tuple[int, dict]],
    comps: list[dict],
    coefs: list["np.ndarray"],
    htables: dict,
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
    progressive: bool,
    geom: tuple[int, int, int, int, int, int],
) -> int:
    """Decode one entropy-coded scan into the coefficient store;
    returns the stream position after the scan's entropy data."""
    mcux, mcuy, hmax, vmax, width, height = geom
    ns = len(scan_comps)
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ss > 0 and ns != 1:
            raise ValueError("progressive AC scans must be non-interleaved")
        if ss > se or se > 63:
            raise ValueError("bad spectral selection bounds")
    reader = _BitReader(payload, pos)
    preds = {ci: 0 for ci, _ in scan_comps}
    eobrun = 0

    def _tab(tclass: int, tid: int):
        try:
            return htables[(tclass, tid)]
        except KeyError:
            raise ValueError(
                f"JPEG scan references undefined Huffman table "
                f"(class={tclass}, id={tid})"
            ) from None

    def _one(ci: int, c: dict, zz) -> None:
        nonlocal eobrun
        if not progressive:
            preds[ci] = _decode_block_full(
                reader, _tab(0, c["dc"]), _tab(1, c["ac"]), zz, preds[ci]
            )
        elif ss == 0 and ah == 0:
            preds[ci] = _decode_block_dc_first(
                reader, _tab(0, c["dc"]), zz, al, preds[ci]
            )
        elif ss == 0:
            _decode_block_dc_refine(reader, zz, al)
        elif ah == 0:
            eobrun = _decode_block_ac_first(
                reader, _tab(1, c["ac"]), zz, ss, se, al, eobrun
            )
        else:
            eobrun = _decode_block_ac_refine(
                reader, _tab(1, c["ac"]), zz, ss, se, al, eobrun
            )

    unit = 0

    def _maybe_restart() -> None:
        nonlocal unit, eobrun
        if restart_interval and unit and unit % restart_interval == 0:
            reader.sync_restart(unit // restart_interval - 1)
            for ci in preds:
                preds[ci] = 0
            eobrun = 0
        unit += 1

    if ns > 1:  # interleaved: MCU traversal over every (padded) block
        for my in range(mcuy):
            for mx in range(mcux):
                _maybe_restart()
                for ci, c in scan_comps:
                    for bv in range(c["v"]):
                        for bh in range(c["h"]):
                            zz = coefs[ci][my * c["v"] + bv, mx * c["h"] + bh]
                            _one(ci, c, zz)
    else:  # non-interleaved: the component's OWN block grid (A.2.2)
        ci, c = scan_comps[0]
        cw = -(-width * c["h"] // hmax)
        ch = -(-height * c["v"] // vmax)
        bw, bh_n = -(-cw // 8), -(-ch // 8)
        for by in range(bh_n):
            for bx in range(bw):
                _maybe_restart()
                _one(ci, c, coefs[ci][by, bx])
    return reader.pos


def decode_jpeg(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline (SOF0) or progressive (SOF2) JPEG →
    (width, height, raw RGB bytes)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    coefs: list[np.ndarray] | None = None
    geom = None
    width = height = 0
    restart_interval = 0
    progressive = False
    n_scans = 0
    while pos + 1 < len(payload):
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
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0x0F
                if prec not in (0, 1):
                    raise ValueError(f"invalid DQT precision {prec}")
                q = np.zeros((8, 8), dtype=np.int32)
                for i, (r, c) in enumerate(_ZIGZAG):
                    if prec:  # 16-bit entries (high-quality encoders)
                        q[r, c] = (body[b + 1 + 2 * i] << 8) | body[b + 2 + 2 * i]
                    else:
                        q[r, c] = body[b + 1 + i]
                qtables[tid] = q
                b += 1 + 64 * (2 if prec else 1)
        elif marker == 0xC4:  # DHT (tables may also arrive between scans)
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if coefs is not None:
                raise ValueError("multiple SOF segments")
            progressive = marker == 0xC2
            prec, height, width, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG precision supported")
            for i in range(nc):
                cid, hv, qid = body[6 + 3 * i : 9 + 3 * i]
                h, v = hv >> 4, hv & 0x0F
                if h not in (1, 2) or v not in (1, 2):
                    raise NotImplementedError(f"sampling {h}x{v} unsupported")
                comps.append({"id": cid, "h": h, "v": v, "q": qid})
            if len(comps) not in (1, 3):
                # 4-component (Adobe CMYK/YCCK) files would pass every
                # other check and then be silently misread as YCbCr —
                # never fake a decode
                raise NotImplementedError(
                    f"JPEG with {len(comps)} components unsupported "
                    "(1=gray, 3=YCbCr)"
                )
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-width // (8 * hmax))
            mcuy = -(-height // (8 * vmax))
            geom = (mcux, mcuy, hmax, vmax, width, height)
            coefs = [
                np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
                for c in comps
            ]
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                "only baseline (SOF0) and progressive (SOF2) JPEG supported"
            )
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("truncated JPEG DRI segment")
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if coefs is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan_comps: list[tuple[int, dict]] = []
            for i in range(ns):
                cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                for ci, comp in enumerate(comps):
                    if comp["id"] == cid:
                        comp["dc"] = tabs >> 4
                        comp["ac"] = tabs & 0x0F
                        scan_comps.append((ci, comp))
                        break
                else:
                    raise ValueError(f"SOS references unknown component {cid}")
            ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            pos = _decode_scan(
                payload,
                pos + seglen,
                scan_comps,
                comps,
                coefs,
                htables,
                ss,
                se,
                ahal >> 4,
                ahal & 0x0F,
                restart_interval,
                progressive,
                geom,
            )
            n_scans += 1
            # tolerate pad bytes between the entropy data and the next
            # marker (the reader may leave the stream mid-padding)
            while pos < len(payload) and payload[pos] != 0xFF:
                pos += 1
            continue
        pos += seglen
    if coefs is None or not width:
        raise ValueError("JPEG missing SOF")
    if n_scans == 0:
        raise ValueError("JPEG has no scan data")

    mcux, mcuy, hmax, vmax, width, height = geom
    # batched dequant + IDCT per component: zigzag store -> natural
    # order -> one einsum over every block at once
    planes = []
    for ci, c in enumerate(comps):
        if c["q"] not in qtables:
            raise ValueError(f"JPEG component references undefined DQT {c['q']}")
        q = qtables[c["q"]].astype(np.float64)
        nbv, nbh = coefs[ci].shape[:2]
        nat = coefs[ci][:, :, _NAT_TO_ZZ].reshape(nbv, nbh, 8, 8).astype(np.float64)
        blocks = np.einsum("ab,ijbc,cd->ijad", _M.T, nat * q[None, None], _M) + 128.0
        planes.append(blocks.transpose(0, 2, 1, 3).reshape(nbv * 8, nbh * 8))

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
