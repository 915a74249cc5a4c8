"""Baseline JPEG codec — pure Python + numpy, no cv2/PIL.

Closes the engine's last multimodal seam (multimodal.py ``decode_jpeg``):
the reference decodes detector crops with ``cv2.imread``
(Equirec2Perspec.py:66); this module implements the same baseline
sequential DCT path from the public JPEG spec (ITU-T T.81): marker
parse → Huffman entropy decode → dequantize → inverse zigzag → 8×8
IDCT → chroma upsample → YCbCr→RGB (BT.601, the libjpeg constants).

Supported: baseline (SOF0), extended-sequential (SOF1), and progressive
(SOF2) 8-bit frames — spectral selection and successive approximation
(DC first/refine, AC first with EOB runs, AC refinement per spec
G.1.2.3) — 1 or 3 components, sampling factors up to 2×2 (4:4:4, 4:2:2,
4:2:0), restart markers, multiple DHT/DQT segments. Arithmetic coding,
hierarchical frames, and 12-bit precision raise NotImplementedError.

The encoder produces baseline 4:4:4 JPEGs with the spec's Annex K
example quantization (scaled by libjpeg's quality curve) and Huffman
tables — used by tests for spec-conformant round trips and available as
an S10 sink format.

Determinism: IDCT is a fixed float64 8×8 basis multiply per block
(einsum over constant matrices — no FFT library, no batch-size
dependence); encoder DCT likewise. Both round half away from zero the
way libjpeg's float path does before clipping.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Constants from the public JPEG spec (ITU-T T.81 Annex K)
# --------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1 example luminance / chrominance quantization (quality 50 base)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# 8×8 DCT-II basis: C[u, x] = c(u)/2 * cos((2x+1)uπ/16)
_BASIS = np.empty((8, 8), dtype=np.float64)
for _u in range(8):
    _cu = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _BASIS[_u, _x] = 0.5 * _cu * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _idct_blocks(coef: np.ndarray) -> np.ndarray:
    """(N, 8, 8) dequantized coefficients → (N, 8, 8) spatial samples."""
    # separable inverse: X = Bᵀ · C · B
    return np.einsum("ux,nuv,vy->nxy", _BASIS, coef, _BASIS, optimize=True)


def _dct_blocks(spatial: np.ndarray) -> np.ndarray:
    """(N, 8, 8) level-shifted samples → (N, 8, 8) DCT coefficients."""
    return np.einsum("ux,nxy,vy->nuv", _BASIS, spatial, _BASIS, optimize=True)


# --------------------------------------------------------------------------
# Huffman
# --------------------------------------------------------------------------


class _HuffmanTable:
    """Canonical JPEG Huffman code ↔ value mapping (spec §C.2)."""

    def __init__(self, bits: list[int], values: list[int]) -> None:
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1
        # encoder direction
        self.codes: dict[int, tuple[int, int]] = {
            v: (ln, c) for (ln, c), v in self.lookup.items()
        }


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RST handled by caller via sync()
                raise _RestartMarker(nxt)
            else:
                raise EOFError("hit marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _HuffmanTable) -> int:
        length = 0
        code = 0
        lookup = table.lookup
        for _ in range(16):
            code = (code << 1) | self.read_bit()
            length += 1
            v = lookup.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code")

    def sync_restart(self) -> None:
        """Skip to just past the next RST marker, resetting bit state."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while True:
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """DIFF/AC magnitude decode (spec F.12): t-bit value → signed."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes → (H, W, C) uint8 (C = 1 or 3, RGB order).

    Handles baseline/extended-sequential (SOF0/SOF1) and progressive
    (SOF2) frames. All scans decode into a per-component zigzag
    coefficient store; reconstruction (dequantize → IDCT → upsample →
    color convert) runs once after the last scan.
    """
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not JPEG bytes")
    pos = 2
    n = len(data)
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffmanTable] = {}
    huff_ac: dict[int, _HuffmanTable] = {}
    frame = None
    coefs: list[np.ndarray] | None = None
    restart_interval = 0
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        body = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            at = 0
            while at < len(body):
                pq, tq = body[at] >> 4, body[at] & 0x0F
                at += 1
                if pq == 0:
                    tbl = np.frombuffer(body, np.uint8, 64, at).astype(np.int64)
                    at += 64
                else:
                    tbl = np.frombuffer(body, ">u2", 64, at).astype(np.int64)
                    at += 128
                quant[tq] = tbl
        elif marker == 0xC4:  # DHT
            at = 0
            while at < len(body):
                tc, th = body[at] >> 4, body[at] & 0x0F
                bits = list(body[at + 1 : at + 17])
                nv = sum(bits)
                vals = list(body[at + 17 : at + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffmanTable(bits, vals)
                at += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            precision = body[0]
            if precision != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            h = struct.unpack(">H", body[1:3])[0]
            w = struct.unpack(">H", body[3:5])[0]
            nc = body[5]
            comps = []
            for i in range(nc):
                cid, sampling, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": sampling >> 4, "v": sampling & 0x0F, "tq": tq}
                )
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
            coefs = []
            for ci, c in enumerate(comps):
                c["ci"] = ci
                # full interleaved-padded grid; non-interleaved scans use
                # the ceil(comp_dims/8) prefix of it
                c["bw"] = mcus_x * c["h"]
                c["bh"] = mcus_y * c["v"]
                c["nbw"] = (-(-(w * c["h"]) // hmax) + 7) // 8
                c["nbh"] = (-(-(h * c["v"]) // vmax) + 7) // 8
                coefs.append(np.zeros((c["bh"], c["bw"], 64), dtype=np.int64))
            frame = {
                "h": h, "w": w, "comps": comps, "hmax": hmax, "vmax": vmax,
                "mcus_x": mcus_x, "mcus_y": mcus_y,
                "progressive": marker == 0xC2,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG frame type (marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[0:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tables = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tables >> 4, tables & 0x0F))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah_al = body[3 + 2 * ns]
            ah, al = ah_al >> 4, ah_al & 0x0F
            reader = _BitReader(data, pos + 2 + seg_len)
            _decode_scan_into(
                reader, frame, scan, coefs, huff_dc, huff_ac,
                restart_interval, ss, se, ah, al,
            )
            if not frame["progressive"]:
                return _reconstruct(frame, coefs, quant)
            # next marker search resumes from wherever entropy data ended
            pos = reader.pos
            continue
        pos += 2 + seg_len
    if frame is None or coefs is None:
        raise ValueError("no frame decoded")
    return _reconstruct(frame, coefs, quant)


def _decode_scan_into(
    reader, frame, scan, coefs, huff_dc, huff_ac, restart_interval, ss, se, ah, al
):
    """Decode one scan's entropy data into the coefficient store.

    Sequential frames use the full-band interleaved path (ss=0, se=63,
    ah=al=0). Progressive frames dispatch on (ss, ah): DC-first /
    DC-refine scans may be interleaved; AC scans are single-component by
    spec and walk the component's own block raster.
    """
    if ss == 0 and se == 0 and frame["progressive"]:
        if ah == 0:
            _scan_dc(reader, frame, scan, coefs, huff_dc, restart_interval,
                     al, first=True)
        else:
            _scan_dc(reader, frame, scan, coefs, huff_dc, restart_interval,
                     al, first=False)
        return
    if frame["progressive"]:
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be non-interleaved")
        c, _, ac_id = scan[0]
        if ah == 0:
            _scan_ac_first(reader, c, coefs[c["ci"]], huff_ac[ac_id],
                           restart_interval, ss, se, al)
        else:
            _scan_ac_refine(reader, c, coefs[c["ci"]], huff_ac[ac_id],
                            restart_interval, ss, se, al)
        return
    _scan_sequential(reader, frame, scan, coefs, huff_dc, huff_ac,
                     restart_interval)


def _mcu_iter(frame, scan):
    """Yield (mcu_index, ci_entries) where each entry is (comp, dc_id,
    ac_id, block_y, block_x) in interleaved order."""
    if len(scan) == 1:
        c = scan[0][0]
        # non-interleaved: the component's own raster over its real blocks
        for by in range(c["nbh"]):
            for bx in range(c["nbw"]):
                yield (by * c["nbw"] + bx, [(scan[0], by, bx)])
        return
    i = 0
    for my in range(frame["mcus_y"]):
        for mx in range(frame["mcus_x"]):
            entries = []
            for s in scan:
                c = s[0]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        entries.append((s, my * c["v"] + by, mx * c["h"] + bx))
            yield (i, entries)
            i += 1


def _scan_sequential(reader, frame, scan, coefs, huff_dc, huff_ac, restart_interval):
    pred = [0] * len(frame["comps"])
    for mcu_index, entries in _mcu_iter(frame, scan):
        if restart_interval and mcu_index and mcu_index % restart_interval == 0:
            reader.sync_restart()
            pred = [0] * len(frame["comps"])
        try:
            for (c, dc_id, ac_id), by, bx in entries:
                zz = coefs[c["ci"]][by, bx]
                t = reader.decode(huff_dc[dc_id])
                diff = _extend(reader.receive(t), t) if t else 0
                pred[c["ci"]] += diff
                zz[0] = pred[c["ci"]]
                k = 1
                while k < 64:
                    rs = reader.decode(huff_ac[ac_id])
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        break
                    k += r
                    if k > 63:
                        raise ValueError("AC index overrun")
                    zz[k] = _extend(reader.receive(s), s)
                    k += 1
        except _RestartMarker:
            reader.sync_restart()
            pred = [0] * len(frame["comps"])


def _scan_dc(reader, frame, scan, coefs, huff_dc, restart_interval, al, first):
    pred = [0] * len(frame["comps"])
    for mcu_index, entries in _mcu_iter(frame, scan):
        if restart_interval and mcu_index and mcu_index % restart_interval == 0:
            reader.sync_restart()
            pred = [0] * len(frame["comps"])
        try:
            for (c, dc_id, _ac), by, bx in entries:
                zz = coefs[c["ci"]][by, bx]
                if first:
                    t = reader.decode(huff_dc[dc_id])
                    diff = _extend(reader.receive(t), t) if t else 0
                    pred[c["ci"]] += diff
                    zz[0] = pred[c["ci"]] << al
                else:
                    if reader.read_bit():
                        zz[0] |= 1 << al
        except _RestartMarker:
            reader.sync_restart()
            pred = [0] * len(frame["comps"])


def _scan_ac_first(reader, c, coef, ac_tbl, restart_interval, ss, se, al):
    eobrun = 0
    for idx in range(c["nbh"] * c["nbw"]):
        by, bx = divmod(idx, c["nbw"])
        if restart_interval and idx and idx % restart_interval == 0:
            reader.sync_restart()
            eobrun = 0
        if eobrun > 0:
            eobrun -= 1
            continue
        zz = coef[by, bx]
        try:
            k = ss
            while k <= se:
                rs = reader.decode(ac_tbl)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r < 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.receive(r)
                        break
                    k += 16
                    continue
                k += r
                if k > se:
                    raise ValueError("AC band overrun")
                zz[k] = _extend(reader.receive(s), s) << al
                k += 1
        except _RestartMarker:
            reader.sync_restart()
            eobrun = 0


def _scan_ac_refine(reader, c, coef, ac_tbl, restart_interval, ss, se, al):
    """Successive-approximation AC refinement (spec G.1.2.3): correction
    bits move known coefficients one step away from zero; new ±1<<al
    coefficients appear at positions signalled by run/size symbols."""
    p1 = 1 << al
    eobrun = 0
    for idx in range(c["nbh"] * c["nbw"]):
        by, bx = divmod(idx, c["nbw"])
        if restart_interval and idx and idx % restart_interval == 0:
            reader.sync_restart()
            eobrun = 0
        zz = coef[by, bx]
        try:
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = reader.decode(ac_tbl)
                    r, s = rs >> 4, rs & 0x0F
                    newval = 0
                    if s == 0:
                        if r < 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.receive(r)
                            break
                        # r == 15: skip 16 zero-history positions
                    else:
                        if s != 1:
                            raise ValueError("refinement size must be 1")
                        newval = p1 if reader.read_bit() else -p1
                    while k <= se:
                        if zz[k] != 0:
                            if reader.read_bit():
                                zz[k] += p1 if zz[k] > 0 else -p1
                        else:
                            if r == 0:
                                if newval:
                                    zz[k] = newval
                                k += 1
                                break
                            r -= 1
                        k += 1
            if eobrun > 0:
                while k <= se:
                    if zz[k] != 0 and reader.read_bit():
                        zz[k] += p1 if zz[k] > 0 else -p1
                    k += 1
                eobrun -= 1
        except _RestartMarker:
            reader.sync_restart()
            eobrun = 0


def _reconstruct(frame, coefs, quant):
    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    out_planes = []
    for c in frame["comps"]:
        qt = quant[c["tq"]]
        grid = coefs[c["ci"]]
        bh, bw = c["bh"], c["bw"]
        zz = grid.reshape(bh * bw, 64) * qt[None, :]
        nat = np.zeros((bh * bw, 64), dtype=np.float64)
        nat[:, ZIGZAG] = zz.astype(np.float64)
        blocks = _idct_blocks(nat.reshape(-1, 8, 8))
        plane = (
            blocks.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        ) + 128.0
        sy, sx = vmax // c["v"], hmax // c["h"]
        if sy > 1 or sx > 1:
            plane = np.repeat(np.repeat(plane, sy, axis=0), sx, axis=1)
        out_planes.append(plane[:h, :w])

    if len(out_planes) == 1:
        gray = np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    y, cb, cr = out_planes
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Encoder (baseline, 4:4:4, Annex K tables)
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s per spec
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality → scaling of the Annex K tables."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255)


def _magnitude(v: int) -> tuple[int, int]:
    """signed value → (category t, t-bit code)."""
    t = int(v != 0 and int(abs(v)).bit_length())
    code = v if v >= 0 else v + (1 << t) - 1
    return t, code


def encode_jpeg(arr: np.ndarray, quality: int = 90) -> bytes:
    """(H, W[, C]) uint8 → baseline JPEG (4:4:4, Annex K Huffman)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in (1, 3):
        raise ValueError("1 or 3 channels only")

    if c == 3:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        qids = [0, 1, 1]
        hids = [0, 1, 1]
    else:
        planes = [arr[..., 0].astype(np.float64)]
        qids = [0]
        hids = [0]

    q_luma = _scale_quant(QUANT_LUMA, quality)
    q_chroma = _scale_quant(QUANT_CHROMA, quality)
    qtables = [q_luma, q_chroma] if c == 3 else [q_luma]

    dc_tables = [_HuffmanTable(DC_LUMA_BITS, DC_LUMA_VALS)]
    ac_tables = [_HuffmanTable(AC_LUMA_BITS, AC_LUMA_VALS)]
    if c == 3:
        dc_tables.append(_HuffmanTable(DC_CHROMA_BITS, DC_CHROMA_VALS))
        ac_tables.append(_HuffmanTable(AC_CHROMA_BITS, AC_CHROMA_VALS))

    # pad planes to 8×8 multiples by edge replication
    bh, bw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    writer = _BitWriter()
    pred = [0] * c
    for by in range(0, bh, 8):
        for bx in range(0, bw, 8):
            for ci in range(c):
                plane = planes[ci]
                block = plane[
                    np.minimum(np.arange(by, by + 8), h - 1)[:, None],
                    np.minimum(np.arange(bx, bx + 8), w - 1)[None, :],
                ]
                coefs = _dct_blocks((block - 128.0).reshape(1, 8, 8))[0]
                q = qtables[qids[ci]].astype(np.float64)[
                    np.argsort(ZIGZAG)
                ].reshape(8, 8)  # natural-order quant table
                zz = np.rint(coefs / q).astype(np.int64).reshape(64)[ZIGZAG]
                _encode_block(
                    writer, zz, dc_tables[hids[ci]], ac_tables[hids[ci]], pred, ci
                )
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    for tq, q in enumerate(qtables):
        out += seg(0xDB, bytes([tq]) + bytes(int(x) for x in q))
    comp_spec = b"".join(
        bytes([i + 1, 0x11, qids[i]]) for i in range(c)
    )
    out += seg(
        0xC0,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([c]) + comp_spec,
    )
    dht_specs = [(0, 0, DC_LUMA_BITS, DC_LUMA_VALS), (1, 0, AC_LUMA_BITS, AC_LUMA_VALS)]
    if c == 3:
        dht_specs += [
            (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc, th, bits, vals in dht_specs:
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    scan_spec = b"".join(bytes([i + 1, (hids[i] << 4) | hids[i]]) for i in range(c))
    out += seg(0xDA, bytes([c]) + scan_spec + bytes([0, 63, 0]))
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


def _encode_block(writer, zz, dc_tbl, ac_tbl, pred, ci):
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    t, code = _magnitude(diff)
    ln, huff = dc_tbl.codes[t]
    writer.write(huff, ln)
    if t:
        writer.write(code, t)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            ln, huff = ac_tbl.codes[0x00]  # EOB
            writer.write(huff, ln)
            return
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, huff = ac_tbl.codes[0xF0]  # ZRL
            writer.write(huff, ln)
            run -= 16
        t, code = _magnitude(v)
        ln, huff = ac_tbl.codes[(run << 4) | t]
        writer.write(huff, ln)
        writer.write(code, t)
        run = 0
