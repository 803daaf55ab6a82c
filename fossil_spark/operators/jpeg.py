"""Baseline JPEG codec, pure Python + numpy, from the public spec
(ITU-T T.81 / ISO 10918-1, JFIF). No codec library required.

Decoder: marker parse (DQT/DHT/SOF0/DRI/SOS), Huffman entropy decode
with byte-stuffing and restart markers, dequantize, inverse zigzag,
8x8 IDCT (orthonormal DCT basis matrix product), chroma upsampling for
4:4:4 / 4:2:2 / 4:2:0 / 4:1:1, YCbCr->RGB. Supports baseline
sequential 8-bit AND progressive (SOF2) 1- or 3-component images —
together the overwhelming share of web/training-corpus JPEGs.
Progressive covers both spectral selection and successive
approximation (T.81 Annex G: DC first/refine, AC first with EOB
runs, AC refinement with correction bits), accumulating
coefficients across scans and reconstructing at EOI.

Encoder (round-trip testing + thumbnail re-encode): 4:4:4 baseline
with the spec's Annex K quantization and Huffman tables, quality
scaling per the public IJG formula; encode_jpeg_progressive emits a
spectral-selection + successive-approximation scan script to
round-trip-test every progressive decode path.

This replaces the deterministic fake for JPEG in
fossil_spark.operators.multimodal (reference parity note: the
reference stores all blobs opaquely — image decode is part of this
repo's LLM-pipeline extension surface, not reference behavior).
Throughput note: pure-Python Huffman coding is fine for metadata/
feature extraction at test scale and correct at any scale, but a
production cluster would swap `decode_jpeg` for a codec library
behind the same (bytes) -> (w, h, mode, ndarray) signature.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order (spec Figure 5): index i holds the block position
# of the i-th coefficient in transmission order
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# orthonormal 8-point DCT-II basis: C[k, n] = s(k) cos((2n+1)kπ/16)
_C = np.array([
    [np.sqrt(0.125) if k == 0 else 0.5 * np.cos((2 * n + 1) * k * np.pi / 16)
     for n in range(8)]
    for k in range(8)
])


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


class _BitReader:
    """Entropy-coded segment reader: MSB-first bits, 0xFF00 stuffing
    removed, stops cleanly at markers (restarts handled by caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(f"marker 0xFF{nxt:02X} inside entropy data")
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_restart(self) -> None:
        """Skip to just past the next restart marker (RSTn)."""
        self.bits = self.nbits = 0
        d = self.data
        p = self.pos
        while not (d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7):
            p += 1
        self.pos = p + 2


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(v: int, n: int) -> int:
    """DC/AC value extension (spec F.2.2.1 EXTEND): an n-bit magnitude
    with a leading 0 bit encodes a negative value."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


class _Huff:
    """Canonical Huffman table from the DHT BITS/HUFFVAL lists, decoded
    with the spec's mincode/maxcode/valptr algorithm (F.2.2.3)."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.symbols = symbols
        code = 0
        k = 0
        for ln in range(1, 17):
            self.valptr[ln] = k
            self.mincode[ln] = code
            code += counts[ln - 1]
            k += counts[ln - 1]
            self.maxcode[ln] = code - 1 if counts[ln - 1] else -1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        # spec F.2.2.3 DECODE: grow the code until it fits a length
        # (maxcode is -1 for lengths with no codes, so they're skipped)
        code = br.read_bit()
        ln = 1
        while code > self.maxcode[ln]:
            code = (code << 1) | br.read_bit()
            ln += 1
            if ln > 16:
                raise ValueError("corrupt Huffman stream")
        return self.symbols[self.valptr[ln] + code - self.mincode[ln]]


def decode_jpeg(data: bytes) -> tuple[int, int, str, np.ndarray]:
    """JPEG bytes -> (width, height, mode, HxWxC uint8 pixels)."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    restart_interval = 0
    frame = None
    coef_store = None  # progressive: per-component coefficient planes

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                off += 1
                if pq == 0:
                    qt[tq] = np.frombuffer(seg, np.uint8, 64, off).astype(np.int32)
                    off += 64
                else:  # 16-bit table
                    qt[tq] = np.frombuffer(seg, ">u2", 64, off).astype(np.int32)
                    off += 128
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0xF
                counts = list(seg[off + 1:off + 17])
                n = sum(counts)
                table = _Huff(counts, seg[off + 17:off + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = table
                off += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"unsupported precision {prec}")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG process (SOF 0x{marker:02X})")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            if frame["progressive"]:
                members = []
                for i in range(ns):
                    cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                    members.append((cs, tdta >> 4, tdta & 0xF))
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                if coef_store is None:
                    coef_store = _init_coef_store(frame)
                pos = _decode_scan_progressive(
                    data, pos + seglen, frame, members, ss, se,
                    ahal >> 4, ahal & 0xF, huff_dc, huff_ac, coef_store,
                    restart_interval,
                )
                continue
            scan = {}
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan[cs] = (tdta >> 4, tdta & 0xF)
            pixels = _decode_scan(
                data, pos + seglen, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
            w, h = frame["w"], frame["h"]
            if len(frame["comps"]) == 1:
                return w, h, "L", pixels
            return w, h, "RGB", pixels
        pos += seglen
    if coef_store is not None:
        pixels = _reconstruct_progressive(frame, coef_store, qt)
        w, h = frame["w"], frame["h"]
        if len(frame["comps"]) == 1:
            return w, h, "L", pixels
        return w, h, "RGB", pixels
    raise ValueError("no scan data in JPEG")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, dri):
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64))

    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                br.align_to_restart()
                pred = [0] * len(comps)
            for attempt in (0, 1):
                try:
                    for ci, c in enumerate(comps):
                        dc_t = huff_dc[scan[c["id"]][0]]
                        ac_t = huff_ac[scan[c["id"]][1]]
                        q = qt[c["tq"]]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                block = _decode_block(br, dc_t, ac_t, q, pred, ci)
                                y0 = (my * c["v"] + by) * 8
                                x0 = (mx * c["h"] + bx) * 8
                                planes[ci][y0:y0 + 8, x0:x0 + 8] = block
                    break
                except _RestartMarker:
                    # tolerate encoders that emit RST earlier than the
                    # declared DRI: skip past the marker (br.pos still
                    # points at its 0xFF — _fill raises without
                    # advancing), reset predictions as the encoder did,
                    # and RE-DECODE this MCU from the post-marker data.
                    # Without advancing, every subsequent _fill
                    # re-raises and the whole interval decodes as
                    # zeros; without retrying, the stream shifts one
                    # MCU per early marker.
                    pred = [0] * len(comps)
                    br.align_to_restart()
            mcu_count += 1

    return _planes_to_pixels(planes, comps, w, h, hmax, vmax)


def _planes_to_pixels(planes, comps, w, h, hmax, vmax) -> np.ndarray:
    """Crop each plane to its true component size, upsample subsampled
    chroma, and color-convert (shared by the baseline and progressive
    reconstruction paths)."""
    out = []
    for ci, c in enumerate(comps):
        cw = (w * c["h"] + hmax - 1) // hmax
        ch = (h * c["v"] + vmax - 1) // vmax
        p = planes[ci][:ch, :cw]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        out.append(p[:h, :w])

    if len(out) == 1:
        y = np.clip(out[0] + 128.0, 0, 255)
        return y.astype(np.uint8)[:, :, None]
    y, cb, cr = out[0] + 128.0, out[1], out[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _decode_block(br, dc_t, ac_t, q, pred, ci) -> np.ndarray:
    coef = np.zeros(64, np.int32)
    t = dc_t.decode(br)
    diff = _extend(br.receive(t), t)
    pred[ci] += diff
    coef[0] = pred[ci]
    k = 1
    while k < 64:
        rs = ac_t.decode(br)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC index out of range")
        coef[k] = _extend(br.receive(s), s)
        k += 1
    dq = np.zeros(64, np.float64)
    dq[ZIGZAG] = coef * q
    return _idct2(dq.reshape(8, 8))


# ---------------------------------------------------------------------------
# progressive decode (T.81 Annex G): coefficients accumulate across
# scans, reconstruction happens once at EOI
# ---------------------------------------------------------------------------

def _frame_geometry(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    w, h = frame["w"], frame["h"]
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcux, mcuy


def _init_coef_store(frame):
    """One (blocks_y, blocks_x, 64) int32 array per component, padded
    to MCU multiples so interleaved DC scans index uniformly;
    non-interleaved scans use each component's true block dims."""
    hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    w, h = frame["w"], frame["h"]
    store = []
    for c in frame["comps"]:
        cw = (w * c["h"] + hmax - 1) // hmax
        ch = (h * c["v"] + vmax - 1) // vmax
        c["bw"] = (cw + 7) // 8
        c["bh"] = (ch + 7) // 8
        store.append(np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int64))
    return store


def _decode_scan_progressive(data, pos, frame, members, ss, se, ah, al,
                             huff_dc, huff_ac, store, dri):
    """One progressive scan (DC or AC band, first pass or refinement)
    into the coefficient store. Returns the offset of the next marker.
    Spec: T.81 G.2 (scan structure), F.2.2 (entropy decode),
    G.1.2.2 (AC first, EOB runs), G.1.2.3 (AC refinement)."""
    comps = frame["comps"]
    idx = {c["id"]: i for i, c in enumerate(comps)}
    scan = [(idx[cs], td, ta) for cs, td, ta in members]
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    state = {"eobrun": 0}
    p1, m1 = 1 << al, -1 << al

    def do_block(ci, by, bx, td, ta):
        blk = store[ci][by, bx]
        if ss == 0:
            if ah == 0:  # DC first: diffs of (DC >> Al)
                t = huff_dc[td].decode(br)
                pred[ci] += _extend(br.receive(t), t)
                blk[0] = pred[ci] << al
            else:  # DC refinement: one raw bit per block
                if br.read_bit():
                    blk[0] = int(blk[0]) | p1
            return
        if ah == 0:  # AC first pass on (value >> Al) magnitudes
            if state["eobrun"] > 0:
                state["eobrun"] -= 1
                return
            k = ss
            while k <= se:
                rs = huff_ac[ta].decode(br)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    state["eobrun"] = (1 << r) - 1
                    if r:
                        state["eobrun"] += br.receive(r)
                    break
                k += r
                if k > se:
                    raise ValueError("AC index out of band")
                blk[k] = _extend(br.receive(s), s) << al
                k += 1
            return
        # AC refinement (G.1.2.3; correction-bit logic as in the
        # spec's decision diagram): newly-significant coefficients
        # arrive as ±1<<Al, history coefficients get one bit each
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = huff_ac[ta].decode(br)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r < 15:
                        # refinement EOBRUN counts the CURRENT block
                        # too — its remaining correction bits are read
                        # by the eobrun tail below, then decremented
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += br.receive(r)
                        break
                    val = 0
                else:
                    val = p1 if br.read_bit() else m1
                while k <= se:
                    if blk[k] != 0:
                        if br.read_bit() and not (int(blk[k]) & p1):
                            blk[k] += p1 if blk[k] > 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    blk[k] = val
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if blk[k] != 0 and br.read_bit() and not (int(blk[k]) & p1):
                    blk[k] += p1 if blk[k] > 0 else m1
                k += 1
            state["eobrun"] -= 1

    hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    if len(scan) > 1:  # interleaved (DC scans only, per spec)
        units = []
        for my in range(mcuy):
            for mx in range(mcux):
                unit = []
                for ci, td, ta in scan:
                    c = comps[ci]
                    for byy in range(c["v"]):
                        for bxx in range(c["h"]):
                            unit.append((ci, my * c["v"] + byy,
                                         mx * c["h"] + bxx, td, ta))
                units.append(unit)
    else:
        ci, td, ta = scan[0]
        c = comps[ci]
        units = [[(ci, by, bx, td, ta)]
                 for by in range(c["bh"]) for bx in range(c["bw"])]

    for ui, unit in enumerate(units):
        if dri and ui and ui % dri == 0:
            br.align_to_restart()
            pred = [0] * len(comps)
            state["eobrun"] = 0
        for attempt in (0, 1):
            try:
                for args in unit:
                    do_block(*args)
                break
            except _RestartMarker:
                # early RSTn (same tolerance as the baseline path)
                pred = [0] * len(comps)
                state["eobrun"] = 0
                br.align_to_restart()

    # skip to the next non-RST marker after the entropy data
    p = br.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00:
            if 0xD0 <= data[p + 1] <= 0xD7:
                p += 2
                continue
            break
        p += 1
    return p


def _reconstruct_progressive(frame, store, qt):
    comps = frame["comps"]
    hmax, vmax, _, _ = _frame_geometry(frame)
    planes = []
    for ci, c in enumerate(comps):
        q = qt[c["tq"]]
        by_n, bx_n, _ = store[ci].shape
        plane = np.zeros((by_n * 8, bx_n * 8), np.float64)
        for by in range(by_n):
            for bx in range(bx_n):
                dq = np.zeros(64, np.float64)
                dq[ZIGZAG] = store[ci][by, bx] * q
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = _idct2(
                    dq.reshape(8, 8)
                )
        planes.append(plane)
    return _planes_to_pixels(planes, comps, frame["w"], frame["h"], hmax, vmax)


# ---------------------------------------------------------------------------
# encoder (4:4:4 baseline, Annex K tables) — for round-trip tests and
# codec-less thumbnail re-encode
# ---------------------------------------------------------------------------

# spec Annex K.1: luminance / chrominance quantization tables
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
])
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
])

# spec Annex K.3: typical Huffman tables (BITS, HUFFVAL)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            bytes(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              bytes(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    bytes([
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    bytes([
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)


def _encode_codes(counts: list[int], symbols: bytes) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for canonical Huffman tables."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            out[symbols[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, ln: int) -> None:
        self.acc = (self.acc << ln) | (code & ((1 << ln) - 1))
        self.nacc += ln
        while self.nacc >= 8:
            self.nacc -= 8
            b = (self.acc >> self.nacc) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nacc:
            pad = 8 - self.nacc
            self.write((1 << pad) - 1, pad)  # pad final byte with 1s
        return bytes(self.out)

    def restart(self, n: int) -> None:
        """Byte-align (1-padded) and emit RSTn. The marker bytes go
        out raw — stuffing applies to entropy data only."""
        if self.nacc:
            pad = 8 - self.nacc
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (n & 7)])


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """Public IJG quality scaling: 50 -> table as-is."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * s + 50) // 100, 1, 255).astype(np.int32)


def _block_at(plane: np.ndarray, ys: int, xs: int) -> np.ndarray:
    """8x8 block with edge replication past the plane boundary."""
    h, w = plane.shape
    block = np.zeros((8, 8))
    src = plane[ys:min(ys + 8, h), xs:min(xs + 8, w)]
    if src.shape[0] == 0 or src.shape[1] == 0:
        return block
    block[:src.shape[0], :src.shape[1]] = src
    if src.shape[0] < 8:
        block[src.shape[0]:, :] = block[src.shape[0] - 1, :]
    if src.shape[1] < 8:
        block[:, src.shape[1]:] = block[:, src.shape[1] - 1:src.shape[1]]
    return block


def encode_jpeg(pixels: np.ndarray, quality: int = 90,
                subsample: bool = False, restart_interval: int = 0,
                _declared_dri: int | None = None) -> bytes:
    """HxW (grayscale) or HxWx3 (RGB) uint8 -> baseline JPEG
    (4:4:4, or 4:2:0 with subsample=True). restart_interval > 0 emits
    a DRI segment and RSTn markers every that-many MCUs (T.81 §B.2.4.4,
    E.2.4). _declared_dri (tests only) writes a different interval in
    the DRI header than the markers actually follow, to exercise the
    decoder's early-restart tolerance."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, nc = pixels.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    px = pixels.astype(np.float64)
    if nc == 3:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b - 128.0,
            -0.168736 * r - 0.331264 * g + 0.5 * b,
            0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    else:
        planes = [px[..., 0] - 128.0]
    sub = subsample and nc == 3
    if sub:
        # 2x2 mean-pool the chroma planes (pad odd dims by replication)
        for ci in (1, 2):
            p = planes[ci]
            ph, pw = (p.shape[0] + 1) & ~1, (p.shape[1] + 1) & ~1
            padded = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                            mode="edge")
            planes[ci] = 0.25 * (
                padded[0::2, 0::2] + padded[1::2, 0::2]
                + padded[0::2, 1::2] + padded[1::2, 1::2]
            )
    samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * nc

    qts = [_quality_scale(_QT_LUMA, quality)]
    if nc == 3:
        qts.append(_quality_scale(_QT_CHROMA, quality))

    dc_codes = [_encode_codes(*_DC_LUMA)]
    ac_codes = [_encode_codes(*_AC_LUMA)]
    if nc == 3:
        dc_codes.append(_encode_codes(*_DC_CHROMA))
        ac_codes.append(_encode_codes(*_AC_CHROMA))

    hmax = max(s[0] for s in samp[:nc])
    vmax = max(s[1] for s in samp[:nc])
    bw = _BitWriter()
    pred = [0] * nc
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcu_count = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                bw.restart(rst_n)
                rst_n = (rst_n + 1) & 7
                pred = [0] * nc
            mcu_count += 1
            for ci in range(nc):
                ti = min(ci, 1)
                ch, cv = samp[ci]
                for by in range(cv):
                    for bx in range(ch):
                        block = _block_at(
                            planes[ci],
                            (my * cv + by) * 8, (mx * ch + bx) * 8,
                        )
                        coef = _fdct2(block)
                        # Annex K tables are natural order; transmission
                        # order is zigzag, so index both through ZIGZAG
                        q = np.rint(
                            coef.flatten()[ZIGZAG] / qts[ti][ZIGZAG]
                        ).astype(int)
                        _encode_block(bw, q, pred, ci,
                                      dc_codes[ti], ac_codes[ti])

    body = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xFF\xD8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for i, q in enumerate(qts):
        # DQT stores the table in zigzag transmission order
        out += seg(0xDB, bytes([i]) + bytes(int(q[z]) for z in ZIGZAG))
    comp_spec = b"".join(
        struct.pack(">BBB", i + 1, (samp[i][0] << 4) | samp[i][1], min(i, 1))
        for i in range(nc)
    )
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, nc) + comp_spec)
    tables = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if nc == 3:
        tables += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tid, (counts, syms) in tables:
        out += seg(0xC4, bytes([tid]) + bytes(counts) + syms)
    if restart_interval:
        out += seg(0xDD, struct.pack(
            ">H", _declared_dri if _declared_dri is not None
            else restart_interval))
    scan_spec = b"".join(
        struct.pack(">BB", i + 1, 0x00 if i == 0 else 0x11) for i in range(nc)
    )
    out += seg(0xDA, bytes([nc]) + scan_spec + b"\x00\x3F\x00")
    out += body
    out += b"\xFF\xD9"
    return bytes(out)


def _encode_block(bw, q, pred, ci, dc, ac):
    diff = int(q[0]) - pred[ci]
    pred[ci] = int(q[0])
    s = abs(diff).bit_length()
    code, ln = dc[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if q[k] != 0:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(q[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac[0xF0]
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac[0x00]
        bw.write(code, ln)


# ---------------------------------------------------------------------------
# progressive encoder (4:4:4, spectral selection + successive
# approximation) — exercises every progressive decode path in tests
# ---------------------------------------------------------------------------

def encode_jpeg_progressive(pixels: np.ndarray, quality: int = 90,
                            dc_al: int = 1, ac_al: int = 1) -> bytes:
    """HxW (grayscale) or HxWx3 (RGB) uint8 -> progressive JPEG
    (SOF2). Scan script: interleaved DC first at Al=dc_al, DC
    refinements down to Al=0, then per-component AC first scans
    (Ss=1..63) at Al=ac_al and AC refinement scans down to Al=0 —
    covering spectral selection AND successive approximation
    (T.81 G.1.2)."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, nc = pixels.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg_progressive expects 1 or 3 channels")
    px = pixels.astype(np.float64)
    if nc == 3:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b - 128.0,
            -0.168736 * r - 0.331264 * g + 0.5 * b,
            0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    else:
        planes = [px[..., 0] - 128.0]

    qts = [_quality_scale(_QT_LUMA, quality)]
    if nc == 3:
        qts.append(_quality_scale(_QT_CHROMA, quality))
    dc_codes = [_encode_codes(*_DC_LUMA)]
    ac_codes = [_encode_codes(*_AC_LUMA)]
    if nc == 3:
        dc_codes.append(_encode_codes(*_DC_CHROMA))
        ac_codes.append(_encode_codes(*_AC_CHROMA))

    # quantized zigzag coefficients per component (4:4:4 -> one block
    # grid shared by all components)
    bh, bw_n = (h + 7) // 8, (w + 7) // 8
    coefs = []
    for ci in range(nc):
        ti = min(ci, 1)
        arr = np.zeros((bh, bw_n, 64), np.int64)
        for by in range(bh):
            for bx in range(bw_n):
                block = _block_at(planes[ci], by * 8, bx * 8)
                arr[by, bx] = np.rint(
                    _fdct2(block).flatten()[ZIGZAG] / qts[ti][ZIGZAG]
                ).astype(np.int64)
        coefs.append(arr)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xFF\xD8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for i, q in enumerate(qts):
        out += seg(0xDB, bytes([i]) + bytes(int(q[z]) for z in ZIGZAG))
    comp_spec = b"".join(
        struct.pack(">BBB", i + 1, 0x11, min(i, 1)) for i in range(nc)
    )
    out += seg(0xC2, struct.pack(">BHHB", 8, h, w, nc) + comp_spec)
    tables = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if nc == 3:
        tables += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tid, (counts, syms) in tables:
        out += seg(0xC4, bytes([tid]) + bytes(counts) + syms)

    def sos(comp_ids, ss, se, ah, al) -> bytes:
        spec = b"".join(
            struct.pack(">BB", cid, (min(cid - 1, 1) << 4) | min(cid - 1, 1))
            for cid in comp_ids
        )
        return seg(0xDA, bytes([len(comp_ids)]) + spec
                   + bytes([ss, se, (ah << 4) | al]))

    # --- scan 1: interleaved DC first (diffs of DC >> dc_al) ---------------
    out += sos(list(range(1, nc + 1)), 0, 0, 0, dc_al)
    bw = _BitWriter()
    pred = [0] * nc
    for by in range(bh):
        for bx in range(bw_n):
            for ci in range(nc):
                v = int(coefs[ci][by, bx, 0]) >> dc_al
                diff = v - pred[ci]
                pred[ci] = v
                s = abs(diff).bit_length()
                code, ln = dc_codes[min(ci, 1)][s]
                bw.write(code, ln)
                if s:
                    bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    out += bw.flush()

    # --- DC refinement scans: one raw bit per block ------------------------
    for al in range(dc_al - 1, -1, -1):
        out += sos(list(range(1, nc + 1)), 0, 0, al + 1, al)
        bw = _BitWriter()
        for by in range(bh):
            for bx in range(bw_n):
                for ci in range(nc):
                    bw.write((int(coefs[ci][by, bx, 0]) >> al) & 1, 1)
        out += bw.flush()

    # --- AC first scans (per component, magnitudes >> ac_al) ---------------
    def pt(v: int, al: int) -> int:  # AC point transform: signed magnitude
        return (abs(v) >> al) * (1 if v > 0 else -1)

    for ci in range(nc):
        out += sos([ci + 1], 1, 63, 0, ac_al)
        bw = _BitWriter()
        ac = ac_codes[min(ci, 1)]
        for by in range(bh):
            for bx in range(bw_n):
                blk = coefs[ci][by, bx]
                vals = [pt(int(blk[k]), ac_al) for k in range(64)]
                last_nz = 0
                for k in range(63, 0, -1):
                    if vals[k]:
                        last_nz = k
                        break
                run = 0
                for k in range(1, last_nz + 1):
                    v = vals[k]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac[0xF0]
                        bw.write(code, ln)
                        run -= 16
                    s = abs(v).bit_length()
                    code, ln = ac[(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(v if v > 0 else v + (1 << s) - 1, s)
                    run = 0
                if last_nz < 63:  # EOB (eobrun of exactly 1)
                    code, ln = ac[0x00]
                    bw.write(code, ln)
        out += bw.flush()

    # --- AC refinement scans (G.1.2.3 encoder, per component) --------------
    for al in range(ac_al - 1, -1, -1):
        for ci in range(nc):
            out += sos([ci + 1], 1, 63, al + 1, al)
            bw = _BitWriter()
            ac = ac_codes[min(ci, 1)]
            for by in range(bh):
                for bx in range(bw_n):
                    blk = coefs[ci][by, bx]
                    absv = [abs(int(blk[k])) >> al for k in range(64)]
                    eob = 0
                    for k in range(1, 64):
                        if absv[k] == 1:
                            eob = k
                    run = 0
                    pending: list[int] = []
                    for k in range(1, 64):
                        t = absv[k]
                        if t == 0:
                            run += 1
                            continue
                        while run > 15 and k <= eob:
                            code, ln = ac[0xF0]
                            bw.write(code, ln)
                            run -= 16
                            for bit in pending:
                                bw.write(bit, 1)
                            pending = []
                        if t > 1:  # history coefficient: correction bit
                            pending.append(t & 1)
                            continue
                        # newly significant at this precision
                        code, ln = ac[(run << 4) | 1]
                        bw.write(code, ln)
                        bw.write(1 if int(blk[k]) > 0 else 0, 1)
                        for bit in pending:
                            bw.write(bit, 1)
                        pending = []
                        run = 0
                    if run > 0 or pending:
                        code, ln = ac[0x00]  # EOB
                        bw.write(code, ln)
                        for bit in pending:
                            bw.write(bit, 1)
            out += bw.flush()

    out += b"\xFF\xD9"
    return bytes(out)
