"""Zero-dependency baseline JPEG (ITU T.81) codec — numpy + stdlib
only. Closes the multimodal brief's biggest remaining format gap:
real crawl media is overwhelmingly JPEG, and this sandbox has no PIL.

DECODER (:func:`decode_baseline_jpeg`) is the production direction:
a general baseline-sequential (SOF0) decoder — stream-defined DQT /
DHT tables (canonical Huffman from BITS/HUFFVAL, exactly as files
carry them), any component sampling factors (4:4:4 / 4:2:0 / 4:2:2),
restart markers (DRI/RSTn), byte unstuffing, vectorized dequant +
IDCT over all blocks per component at once (the DCT-II basis matrix
form: block = C.T @ coef @ C), nearest-neighbor chroma upsample, JFIF
YCbCr -> RGB. Returns uint8 (h, w) grayscale or (h, w, 3) RGB, or
None for anything non-baseline (progressive SOF2, arithmetic coding,
12-bit) or malformed — the caller treats None as "content unknown",
the same degrade-don't-crash contract as the PNG/BMP paths.

ENCODER (:func:`encode_baseline_jpeg`) exists to TEST the decoder in
a PIL-less sandbox: spec-compliant baseline streams with fixed-length
canonical Huffman tables (every table is emitted in DHT, so the
decoder exercises the same table-building path a camera JPEG would;
code lengths are chosen so the all-ones code stays unassigned, per
T.81's padding rule), quality-1 quantization (near-lossless) and
optional 2x2 chroma subsampling. Solid-color images round-trip
EXACTLY (only the DC coefficient is nonzero, integer math throughout)
— which is what lets the DuckDB analytic-oracle pattern pin the
JPEG decode path end to end (q_multimodal_jpeg); textured images
round-trip within a small IDCT-rounding tolerance, pinned in pytest.

Scale note: decoding runs per payload inside mapInPandas (Arrow
batches), exactly like the PNG/BMP/WAV paths — no new Spark shape.
The Huffman bit-walk is pure Python per payload; swap
``decoder=content_decode`` for a PIL-backed callable on clusters
where PIL exists — the plumbing is unchanged by construction.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_baseline_jpeg", "decode_baseline_jpeg"]

# zigzag scan order: index = zigzag position, value = block position
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# orthonormal DCT-II basis: coefs = C @ block @ C.T, block = C.T @ X @ C
_k = np.arange(8).reshape(8, 1)
_n = np.arange(8).reshape(1, 8)
_C = np.cos((2 * _n + 1) * _k * np.pi / 16) * np.where(
    _k == 0, np.sqrt(1 / 8), np.sqrt(2 / 8)
)


def _size_cat(v: int) -> int:
    """JPEG magnitude category: number of bits to represent |v|."""
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            b = (self._acc >> (self._nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self._nbits -= 8
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s (spec)


def _fixed_table(symbols: list[int]) -> tuple[dict, bytes]:
    """Fixed-length canonical Huffman table over ``symbols``: every
    code has length L with 2**L > len(symbols), so the all-ones code
    of length L is never assigned (T.81 reserves it — trailing 1-pad
    bits must not decode as a symbol). Returns ({symbol: (code, L)},
    DHT BITS+HUFFVAL payload)."""
    syms = sorted(set(symbols))
    L = max((len(syms)).bit_length(), 2)
    if (1 << L) - 1 <= len(syms):
        L += 1
    table = {s: (i, L) for i, s in enumerate(syms)}
    bits = [0] * 16
    bits[L - 1] = len(syms)
    return table, bytes(bits) + bytes(syms)


def _fwd_blocks(plane: np.ndarray) -> np.ndarray:
    """(h, w) float plane (level-shifted) -> (n_blocks_y, n_blocks_x,
    8, 8) DCT coefficients, vectorized."""
    h, w = plane.shape
    b = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    return np.einsum("ij,abjk,lk->abil", _C, b, _C)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def encode_baseline_jpeg(
    pixels: np.ndarray,
    subsample: bool = False,
    quant: int = 1,
    restart_interval: int = 0,
) -> bytes:
    """Spec-compliant baseline JPEG of a uint8 (h, w) grayscale or
    (h, w, 3) RGB array. ``quant=1`` (flat all-ones tables) is
    near-lossless: solid-color inputs round-trip EXACTLY (DC-only
    blocks, integer math), textured inputs within IDCT rounding.
    ``subsample`` emits 4:2:0 chroma (dims must be multiples of 16).
    ``restart_interval`` > 0 emits DRI + RSTn markers every N MCUs
    (byte-aligned, DC predictors reset) — the resync machinery real
    camera JPEGs use, so the decoder's RST path is testable here."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(np.float64)]
        samp = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(px)
        y, cb, cr = (np.round(ycc[:, :, i]) for i in range(3))
        if subsample:
            if h % 16 or w % 16:
                raise ValueError("4:2:0 fixture dims must be 16-multiples")
            cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3)).round()
            cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3)).round()
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
    # pad every plane to 8-multiples (replicate edge)
    padded = []
    for p in planes:
        ph = -p.shape[0] % 8
        pw = -p.shape[1] % 8
        padded.append(np.pad(p, ((0, ph), (0, pw)), mode="edge"))
    qtab = np.full(64, int(quant), dtype=np.int32)
    coefs = [
        np.round(
            _fwd_blocks(p - 128.0)
        ).astype(np.int64)  # flat quant table: divide AFTER rounding
        // int(quant)
        for p in padded
    ]

    # entropy-code per MCU; collect symbols first to build the tables
    def _block_symbols(zz, dc_prev):
        dc_diff = int(zz[0]) - dc_prev
        dc_syms = [_size_cat(dc_diff)]
        ac_syms = []
        run = 0
        last_nz = 0
        for i in range(1, 64):
            if zz[i]:
                last_nz = i
        for i in range(1, last_nz + 1):
            v = int(zz[i])
            if v == 0:
                run += 1
                if run == 16:
                    ac_syms.append(0xF0)  # ZRL
                    run = 0
            else:
                ac_syms.append((run << 4) | _size_cat(v))
                run = 0
        if last_nz < 63:
            ac_syms.append(0x00)  # EOB
        return dc_diff, dc_syms, ac_syms, int(zz[0])

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    # pad component planes' BLOCK grids up to the MCU grid
    grids = []
    for ci, c in enumerate(coefs):
        need_y = mcus_y * samp[ci][1]
        need_x = mcus_x * samp[ci][0]
        g = np.zeros((need_y, need_x, 8, 8), dtype=np.int64)
        g[: c.shape[0], : c.shape[1]] = c
        # replicate edge blocks into the padding (keeps DC prediction
        # smooth; any valid data is fine spec-wise)
        for yy in range(c.shape[0], need_y):
            g[yy] = g[c.shape[0] - 1]
        for xx in range(c.shape[1], need_x):
            g[:, xx] = g[:, c.shape[1] - 1]
        grids.append(g)

    # first pass: symbol inventory per table class. MCU interleave
    # order, with DC predictors reset at restart boundaries.
    dc_pool: list[list[int]] = [[], []]
    ac_pool: list[list[int]] = [[], []]
    mcu_blocks = []  # one entry per MCU: [(comp, by, bx), ...]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            blocks = []
            for ci in range(len(grids)):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        blocks.append(
                            (ci, my * sv + by, mx * sh + bx)
                        )
            mcu_blocks.append(blocks)
    prev = [0] * len(grids)
    sym_runs = []  # block tuples, with "RST" sentinels between MCUs
    for mi, blocks in enumerate(mcu_blocks):
        if restart_interval and mi and mi % restart_interval == 0:
            prev = [0] * len(grids)
            sym_runs.append(("RST",))
        for ci, by, bx in blocks:
            zz = grids[ci][by, bx].reshape(64)[_ZIGZAG]
            tcls = 0 if ci == 0 else 1
            dc_diff, dsy, asy, dc_now = _block_symbols(zz, prev[ci])
            prev[ci] = dc_now
            dc_pool[tcls].extend(dsy)
            ac_pool[tcls].extend(asy)
            sym_runs.append((ci, zz, dc_diff))
    ncls = 1 if gray else 2
    dc_tabs, dc_dht = zip(
        *(_fixed_table(dc_pool[t] or [0]) for t in range(ncls))
    )
    ac_tabs, ac_dht = zip(
        *(_fixed_table(ac_pool[t] or [0]) for t in range(ncls))
    )

    bw = _BitWriter()
    rst_n = 0
    for run in sym_runs:
        if run[0] == "RST":
            bw.flush()  # byte-align with 1-padding (spec)
            bw.out += bytes([0xFF, 0xD0 + (rst_n % 8)])
            rst_n += 1
            continue
        ci, zz, dc_diff = run
        tcls = 0 if ci == 0 else 1
        dct, act = dc_tabs[tcls], ac_tabs[tcls]
        cat = _size_cat(dc_diff)
        code, ln = dct[cat]
        bw.write(code, ln)
        if cat:
            v = dc_diff if dc_diff > 0 else dc_diff + (1 << cat) - 1
            bw.write(v, cat)
        run = 0
        last_nz = 0
        for i in range(1, 64):
            if zz[i]:
                last_nz = i
        for i in range(1, last_nz + 1):
            v = int(zz[i])
            if v == 0:
                run += 1
                if run == 16:
                    code, ln = act[0xF0]
                    bw.write(code, ln)
                    run = 0
            else:
                cat = _size_cat(v)
                code, ln = act[(run << 4) | cat]
                bw.write(code, ln)
                bits = v if v > 0 else v + (1 << cat) - 1
                bw.write(bits, cat)
                run = 0
        if last_nz < 63:
            code, ln = act[0x00]
            bw.write(code, ln)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(
        0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    zz_q = np.empty(64, dtype=np.uint8)
    zz_q[:] = qtab[_ZIGZAG]
    out += seg(0xFFDB, b"\x00" + zz_q.tobytes())  # DQT id 0
    if not gray:
        out += seg(0xFFDB, b"\x01" + zz_q.tobytes())  # DQT id 1
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes(
            [ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0 if ci == 0 else 1]
        )
    out += seg(0xFFC0, sof)  # SOF0 baseline
    for t in range(ncls):
        out += seg(0xFFC4, bytes([0x00 | t]) + dc_dht[t])
        out += seg(0xFFC4, bytes([0x10 | t]) + ac_dht[t])
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._nbits = 0

    def _fill(self) -> bool:
        """Pull one (unstuffed) byte; False at a marker / end."""
        d, p = self.data, self.pos
        if p >= len(d):
            return False
        b = d[p]
        if b == 0xFF:
            if p + 1 < len(d) and d[p + 1] == 0x00:
                self.pos = p + 2  # stuffed FF
            else:
                return False  # real marker: stop
        else:
            self.pos = p + 1
        self._acc = (self._acc << 8) | b
        self._nbits += 8
        return True

    def read_bit(self) -> int | None:
        if self._nbits == 0 and not self._fill():
            return None
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def receive(self, n: int) -> int | None:
        v = 0
        for _ in range(n):
            b = self.read_bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v

    def align(self) -> None:
        self._nbits = 0
        self._acc = 0


def _build_huffman(bits: bytes, vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical table from DHT BITS/HUFFVAL: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table) -> int | None:
    code = 0
    for length in range(1, 17):
        b = br.read_bit()
        if b is None:
            return None
        code = (code << 1) | b
        s = table.get((length, code))
        if s is not None:
            return s
    return None


def _extend(v: int, cat: int) -> int:
    """T.81 EXTEND: magnitude bits -> signed value."""
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_baseline_jpeg(data: bytes) -> np.ndarray | None:
    """Decode a baseline-sequential JPEG. Returns uint8 (h, w) for
    1-component streams, (h, w, 3) RGB for 3-component YCbCr, or None
    for non-baseline/malformed input (never raises on bad bytes)."""
    try:
        return _decode(data)
    except Exception:  # malformed stream -> content unknown
        return None


def _decode(data: bytes) -> np.ndarray | None:
    if data[:2] != b"\xff\xd8":
        return None
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    sof = None
    restart = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            return None  # no SOS seen
        ln = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        body = data[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT (possibly several tables per seg)
            b = body
            while b:
                prec, tid = b[0] >> 4, b[0] & 0xF
                n = 64 * (2 if prec else 1)
                raw = b[1 : 1 + n]
                q = (
                    np.frombuffer(raw, dtype=">u2")
                    if prec
                    else np.frombuffer(raw, dtype=np.uint8)
                ).astype(np.int32)
                tab = np.empty(64, dtype=np.int32)
                tab[_ZIGZAG] = q  # de-zigzag
                qtabs[tid] = tab
                b = b[1 + n :]
        elif marker == 0xC4:  # DHT
            b = body
            while b:
                cls, tid = b[0] >> 4, b[0] & 0xF
                bits = b[1:17]
                n = sum(bits)
                htabs[(cls, tid)] = _build_huffman(bits, b[17 : 17 + n])
                b = b[17 + n :]
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", body[:2])[0]
        elif marker in (0xC0, 0xC1):  # SOF0/1 (baseline + ext. seq.)
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                return None
            comps = []
            for i in range(ncomp):
                cid, s, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, s >> 4, s & 0xF, tq))
            sof = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / arithmetic / hierarchical
        elif marker == 0xDA:  # SOS
            if sof is None:
                return None
            h, w, comps = sof
            ns = body[0]
            sel = {}
            for i in range(ns):
                cs, t = body[1 + 2 * i : 3 + 2 * i]
                sel[cs] = (t >> 4, t & 0xF)
            return _scan(
                data, pos, h, w, comps, sel, qtabs, htabs, restart
            )
    return None


def _scan(data, pos, h, w, comps, sel, qtabs, htabs, restart):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    grids = []
    for cid, sh, sv, tq in comps:
        grids.append(
            np.zeros((mcus_y * sv, mcus_x * sh, 64), dtype=np.int32)
        )
    br = _BitReader(data)
    br.pos = pos
    prev = [0] * len(comps)
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu and mcu % restart == 0:
                br.align()  # skip RSTn marker
                p = br.pos
                while p + 1 < len(data) and not (
                    data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7
                ):
                    p += 1
                br.pos = p + 2
                prev = [0] * len(comps)
            for ci, (cid, sh, sv, tq) in enumerate(comps):
                dc_t, ac_t = sel[cid]
                dct = htabs[(0, dc_t)]
                act = htabs[(1, ac_t)]
                for by in range(sv):
                    for bx in range(sh):
                        zz = np.zeros(64, dtype=np.int32)
                        cat = _huff_decode(br, dct)
                        if cat is None:
                            return None
                        if cat:
                            bits = br.receive(cat)
                            if bits is None:
                                return None
                            prev[ci] += _extend(bits, cat)
                        else:
                            prev[ci] += 0
                        zz[0] = prev[ci]
                        k = 1
                        while k < 64:
                            s = _huff_decode(br, act)
                            if s is None:
                                return None
                            if s == 0x00:  # EOB
                                break
                            if s == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += s >> 4
                            cat = s & 0xF
                            if k > 63 or cat == 0:
                                return None
                            bits = br.receive(cat)
                            if bits is None:
                                return None
                            zz[k] = _extend(bits, cat)
                            k += 1
                        grids[ci][my * sv + by, mx * sh + bx] = zz
            mcu += 1
    # dequant + de-zigzag + IDCT, vectorized per component
    planes = []
    for ci, (cid, sh, sv, tq) in enumerate(comps):
        q = qtabs.get(tq)
        if q is None:
            return None
        deq = (grids[ci] * q).astype(np.float64)
        blocks = np.zeros_like(deq)
        blocks[:, :, _ZIGZAG] = deq
        nby, nbx = blocks.shape[:2]
        b8 = blocks.reshape(nby, nbx, 8, 8)
        spat = np.einsum("ji,abjk,kl->abil", _C, b8, _C) + 128.0
        plane = spat.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        # upsample to the full MCU grid resolution (nearest)
        plane = np.repeat(
            np.repeat(plane, hmax // sh, axis=1), vmax // sv, axis=0
        )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
