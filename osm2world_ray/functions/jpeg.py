"""Pure-Python baseline JPEG codec (no external libs).

Decoder: baseline sequential DCT (SOF0), 8-bit samples, 1 or 3
components, sampling factors 1 or 2 per axis, restart markers,
standard or custom Huffman/quant tables. Returns a uint8 numpy array
(h, w) for greyscale or (h, w, 3) RGB (JFIF YCbCr conversion).

Encoder: the deterministic synth side — flat 8x8-block images whose
DC coefficients are exact multiples of the quant step, so
dequantize + IDCT + round reproduces the source pixels EXACTLY and
the decoded pixel sum has a closed form an SQL oracle can replay
(the mm_image_decode PNG precedent, lossless by construction even
though the codec is the lossy JPEG pipeline).

Reference precedent for opaque-binary lazy decode:
``core/src/main/java/org/osm2world/core/terrain/creation/SRTMTile.java``
(raster payloads decoded per worker on demand).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

#: zig-zag order: index in zig-zag stream -> (row, col)
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: Annex K luminance quant table (zig-zag order), DC step forced to 16
#: so the synth encoder's flat-block DC values quantize losslessly
_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

_QUANT_CHROMA = np.array([
    16, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K Huffman table specs: (BITS[1..16], HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
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
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
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
]

#: orthonormal 8x8 DCT basis: C[u, x] = a(u) cos((2x+1) u pi / 16)
_C = np.array([
    [(np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
     * np.cos((2 * x + 1) * u * np.pi / 16) for x in range(8)]
    for u in range(8)
])


def _idct2(block: np.ndarray) -> np.ndarray:
    """8x8 2D inverse DCT (float64 matrix form: f = C^T F C)."""
    return _C.T @ block @ _C


def _canonical_codes(bits: list[int], vals: list[int]):
    """(BITS, HUFFVAL) -> {(length, code): symbol} (JPEG canonical)."""
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


def _encode_codes(bits: list[int], vals: list[int]):
    """symbol -> (code, length) for the encoder."""
    return {v: (c, l) for (l, c), v in _canonical_codes(bits, vals).items()}


# ---------------------------------------------------------------------------
# encoder (deterministic synth payloads: flat 8x8 blocks)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s per spec


def _dc_category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def encode_flat_jpeg(block_vals: np.ndarray) -> bytes:
    """Encode a greyscale baseline JPEG from per-block flat values.

    ``block_vals`` is (bh, bw) of pixel values in [0, 255] with
    ``(v - 128) * 8`` an exact multiple of the DC quant step 16 (i.e.
    v even) — every 8x8 block of the image is the constant v, the
    encoded DC coefficient is exact, and decode returns the flat
    blocks bit-exactly."""
    bh, bw = block_vals.shape
    h, w = bh * 8, bw * 8
    if np.any(block_vals % 2) or block_vals.min() < 0 or block_vals.max() > 255:
        raise ValueError("flat-block values must be even in [0, 254]")

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (table 0)
    q = bytes(int(x) for x in _QUANT_LUMA)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + q
    # SOF0: 8-bit, h x w, 1 component (id 1, sampling 1x1, quant 0)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1)
    out += struct.pack(">BBB", 1, 0x11, 0)
    # DHT: DC table 0 + AC table 0
    dc_spec = bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS)
    ac_spec = bytes(_AC_LUMA_BITS) + bytes(_AC_LUMA_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 3 + len(dc_spec)) + b"\x00" + dc_spec
    out += b"\xff\xc4" + struct.pack(">H", 3 + len(ac_spec)) + b"\x10" + ac_spec
    # SOS: 1 component, DC table 0 / AC table 0
    out += b"\xff\xda" + struct.pack(">HB", 8, 1)
    out += struct.pack(">BB", 1, 0x00) + b"\x00\x3f\x00"

    dc_codes = _encode_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_codes = _encode_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    bw_ = _BitWriter()
    pred = 0
    for by in range(bh):
        for bx in range(bw):
            v = int(block_vals[by, bx])
            dc = (v - 128) * 8 // 16  # quantized DC (exact)
            diff = dc - pred
            pred = dc
            cat = _dc_category(diff)
            code, length = dc_codes[cat]
            bw_.write(code, length)
            if cat:
                bits = diff if diff >= 0 else diff + (1 << cat) - 1
                bw_.write(bits, cat)
            code, length = ac_codes[0x00]  # EOB: all AC zero
            bw_.write(code, length)
    bw_.flush()
    out += bw_.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder (general baseline sequential)
# ---------------------------------------------------------------------------

class _BitReader:
    """Entropy-segment bit reader with byte-unstuffing and RST
    detection."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated entropy data")
        byte = d[self.pos]
        if byte == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                raise ValueError("hit marker")  # caller handles RST/EOI
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X}")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self):
        """Skip to just past the next RSTn marker (predictors reset)."""
        self.acc = 0
        self.n = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("missing restart marker")


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, cat: int) -> int:
    """JPEG EXTEND: reconstruct a signed value from its magnitude
    bits."""
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """bytes -> uint8 array (h, w) greyscale or (h, w, 3) RGB.

    Baseline sequential (SOF0) only; 8-bit; up to 3 components with
    sampling factors in {1, 2}; DRI/RSTn supported. Raises ValueError
    on malformed or unsupported input (callers map that to error
    rows)."""
    try:
        return _decode_jpeg(data)
    except (IndexError, struct.error) as e:  # truncated segments
        raise ValueError(f"malformed JPEG: {e}") from e


def _decode_jpeg(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before scan")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[i:i + 64], dtype=np.uint8
                                        ).astype(np.int64)
                    i += 64
                else:
                    tbl = np.frombuffer(seg[i:i + 128], dtype=">u2"
                                        ).astype(np.int64)
                    i += 128
                quant[tq] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                nvals = sum(bits)
                vals = list(seg[i + 17:i + 17 + nvals])
                (huff_dc if tc == 0 else huff_ac)[th] = _canonical_codes(
                    bits, vals
                )
                i += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit baseline supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG not supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(
                    x for x in frame["comps"] if x["id"] == cs
                )
                scan.append(
                    {**comp, "td": tables >> 4, "ta": tables & 0xF}
                )
            return _decode_scan(
                data, pos + seglen, frame, scan, quant, huff_dc, huff_ac,
                restart_interval,
            )
        # APPn / COM / others: skip
        pos += seglen
    raise ValueError("no scan found")


def _decode_scan(data, pos, frame, scan, quant, huff_dc, huff_ac,
                 restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    if hmax > 2 or vmax > 2:
        raise ValueError("sampling factors > 2 not supported")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = []
    for c in scan:
        pw = mcus_x * c["h"] * 8
        ph = mcus_y * c["v"] * 8
        planes.append(np.zeros((ph, pw), dtype=np.float64))

    reader = _BitReader(data, pos)
    preds = [0] * len(scan)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                reader.align_restart()
                preds = [0] * len(scan)
            mcu_count += 1
            for ci, c in enumerate(scan):
                q = quant.get(c["tq"])
                if q is None:
                    raise ValueError("missing quant table")
                dc_tbl = huff_dc.get(c["td"])
                ac_tbl = huff_ac.get(c["ta"])
                if dc_tbl is None or ac_tbl is None:
                    raise ValueError("missing Huffman table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int64)
                        cat = _huff_decode(reader, dc_tbl)
                        diff = _extend(reader.receive(cat), cat)
                        preds[ci] += diff
                        coef[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, ac_tbl)
                            r, ssss = rs >> 4, rs & 0xF
                            if ssss == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            coef[k] = _extend(reader.receive(ssss), ssss)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = coef * q
                        px = _idct2(block.reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px

    out_planes = []
    for ci, c in enumerate(scan):
        p = planes[ci]
        # upsample to full resolution (sample replication)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        y = np.clip(np.round(out_planes[0]), 0, 255)
        return y.astype(np.uint8)
    if len(out_planes) != 3:
        raise ValueError("only 1 or 3 components supported")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
