"""Baseline JPEG decoder (pure Python + numpy).

Plays the JPEG half of the reference's stb_image role (util/stb_image.h;
Sponza/San Miguel textures are JPEG-heavy). Scope matches stb's common
path: baseline sequential DCT (SOF0/SOF1), 8-bit samples, Huffman entropy
coding, grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0 sampling, restart
markers. Progressive JPEG raises (callers fall back to the magenta
placeholder via read_image_or_placeholder).

Entropy decoding is table-driven Python (one pass over the bitstream);
dequantized blocks are inverse-DCT'd in one batched numpy einsum per
component, so the heavy math is vectorized. Good enough for texture
loading at scene-build time; not a streaming decoder.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    np.int32,
)

# 8x8 DCT-II basis: block = C.T @ coeffs @ C
_C = np.zeros((8, 8), np.float64)
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16.0) * (
            np.sqrt(1.0 / 8.0) if _k == 0 else np.sqrt(2.0 / 8.0)
        )


class _Huffman:
    """Canonical Huffman table with an 8-bit fast lookup + slow path."""

    def __init__(self, counts, symbols):
        self.lookup = np.full(256, -1, np.int32)  # (sym << 8) | length
        self.codes = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                sym = symbols[k]
                k += 1
                self.codes[(length, code)] = sym
                if length <= 8:
                    lo = code << (8 - length)
                    hi = lo + (1 << (8 - length))
                    self.lookup[lo:hi] = (int(sym) << 8) | length
                code += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing; stops cleanly at markers (RSTn handled by the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None

    def _fill(self):
        while self.nbits <= 24:
            if self.marker is not None:
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                else:
                    self.marker = nxt
                    self.pos -= 1
                    b = 0  # pad with zeros past the marker
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def peek8(self) -> int:
        if self.nbits < 8:
            self._fill()
        return (self.acc >> (self.nbits - 8)) & 0xFF

    def skip(self, n: int):
        self.nbits -= n

    def get(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def huff(self, table: _Huffman) -> int:
        entry = int(table.lookup[self.peek8()])
        if entry >= 0:
            self.skip(entry & 0xFF)
            return entry >> 8
        # slow path: codes longer than 8 bits
        code = self.get(8)
        length = 8
        while length < 17:
            code = (code << 1) | self.get(1)
            length += 1
            sym = table.codes.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def restart(self):
        """Discard padding bits and consume the RST marker."""
        self.nbits = 0
        self.acc = 0
        if self.marker is None:
            # scan to the marker (skips any not-yet-buffered pad bytes)
            while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
                self.pos += 1
        self.pos += 2  # consume FF Dn
        self.marker = None


def _extend(v: int, n: int) -> int:
    """JPEG signed magnitude decode (ITU T.81 F.2.2.1)."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG byte string to (H, W, C) uint8 (C = 1 or 3)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt = {}
    dc_tables = {}
    ac_tables = {}
    frame = None
    restart_interval = 0

    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 0xF
                s += 1
                if pq:
                    tbl = np.frombuffer(seg, ">u2", 64, s).astype(np.int32)
                    s += 128
                else:
                    tbl = np.frombuffer(seg, np.uint8, 64, s).astype(np.int32)
                    s += 64
                qt[tq] = tbl
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG type (marker 0xFF{marker:02X}; only baseline "
                "sequential SOF0/SOF1 is implemented)"
            )
        elif marker == 0xC4:  # DHT
            s = 0
            while s < len(seg):
                tc, th = seg[s] >> 4, seg[s] & 0xF
                counts = list(seg[s + 1 : s + 17])
                total = sum(counts)
                symbols = list(seg[s + 17 : s + 17 + total])
                table = _Huffman(counts, symbols)
                (dc_tables if tc == 0 else ac_tables)[th] = table
                s += 17 + total
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append((comp, dc_tables[tt >> 4], ac_tables[tt & 0xF]))
            return _decode_scan(
                data, pos + seg_len, frame, scan, qt, restart_interval
            )
        pos += seg_len
    raise ValueError("no SOS segment found")


def _decode_scan(data, pos, frame, scan, qt, restart_interval):
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component dense coefficient planes, in 8x8 block units
    planes = []
    for comp, _, _ in scan:
        bw = mcux * comp["h"]
        bh = mcuy * comp["v"]
        planes.append(np.zeros((bh * bw, 64), np.int32))

    br = _BitReader(data, pos)
    pred = [0] * len(scan)
    zz = ZIGZAG
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            br.restart()
            pred = [0] * len(scan)
        my, mx = divmod(m, mcux)
        for ci, (comp, dct, act) in enumerate(scan):
            ch, cv = comp["h"], comp["v"]
            for b in range(ch * cv):
                by, bx = divmod(b, ch)
                blk = planes[ci]
                row = (my * cv + by) * (mcux * ch) + (mx * ch + bx)
                coeffs = blk[row]
                # DC
                ssss = br.huff(dct)
                diff = _extend(br.get(ssss), ssss)
                pred[ci] += diff
                coeffs[0] = pred[ci]
                # AC
                k = 1
                while k < 64:
                    rs = br.huff(act)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC coefficient index overflow")
                    coeffs[zz[k]] = _extend(br.get(s), s)
                    k += 1

    # batched dequant + IDCT per component, then assemble + upsample
    out = np.empty((h, w, len(scan)), np.uint8)
    for ci, (comp, _, _) in enumerate(scan):
        ch, cv = comp["h"], comp["v"]
        bw = mcux * ch
        bh = mcuy * cv
        q = qt[comp["tq"]][np.argsort(ZIGZAG)]  # natural-order quant table
        blocks = planes[ci].astype(np.float64) * q[None, :]
        blocks = blocks.reshape(bh, bw, 8, 8)
        pix = np.einsum("ki,mnkl,lj->minj", _C, blocks, _C, optimize=True)
        plane = pix.reshape(bh * 8, bw * 8) + 128.0
        # upsample to full resolution (sample replication, like stb's default)
        if ch != hmax or cv != vmax:
            plane = np.repeat(np.repeat(plane, vmax // cv, 0), hmax // ch, 1)
        out[:, :, ci] = np.clip(plane[:h, :w], 0, 255).astype(np.uint8)

    if len(scan) == 1:
        return out
    if len(scan) != 3:
        raise ValueError(f"unsupported JPEG component count {len(scan)}")
    # YCbCr -> RGB (ITU BT.601, matching stb)
    y = out[:, :, 0].astype(np.float32)
    cb = out[:, :, 1].astype(np.float32) - 128.0
    cr = out[:, :, 2].astype(np.float32) - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(rgb + 0.5, 0, 255).astype(np.uint8)


def read_jpeg(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return decode_jpeg(f.read())
