"""Baseline JPEG (JFIF) decoder + fixture encoder — stdlib only.

Implements the public ITU-T T.81 baseline sequential DCT process:
marker parsing (DQT/DHT/SOF0/SOS/DRI), Huffman entropy decode with
byte-unstuffing and restart markers, dequantization, inverse zigzag,
2-D IDCT, component upsampling (any h/v factors 1-2) and YCbCr->RGB.
Progressive (SOF2) and arithmetic coding are OUT of the envelope and
raise NotImplementedError — they fall to the PIL seam, exactly like
non-8-bit PNGs.

The encoder writes spec-valid baseline grayscale, 4:4:4 and 4:2:0 color
JPEGs with the T.81 Annex K quantization + Huffman tables, so the
decoder's every stage (huffman, dequant, IDCT, chroma upsampling, color
transform) is round-trip tested without binary fixtures. JPEG is lossy, but for CONSTANT blocks the DCT
has only a DC coefficient and the decoded value is exact integer
arithmetic in the input shade — which is what the driver oracle predicts
in SQL (multimodal_jpeg_decode).
"""

from __future__ import annotations

import struct

import numpy as np

# --- T.81 Annex K tables ----------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K Huffman specs: (bits[1..16], values)
DC_LUMA_SPEC = (
    [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
AC_CHROMA_SPEC = (
    [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
    ],
)


def _huff_codes(spec) -> dict[int, tuple[int, int]]:
    """value -> (code, length) from a (bits, values) spec (T.81 C.2)."""
    bits, values = spec
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(spec) -> dict[tuple[int, int], int]:
    """(length, code) -> value — inverse of _huff_codes."""
    return {(ln, code): v for v, (code, ln) in _huff_codes(spec).items()}


# --- IDCT / DCT (float, separable) -----------------------------------------

_C = np.array([1.0 / np.sqrt(2)] + [1.0] * 7)
_COS = np.array(
    [[np.cos((2 * x + 1) * u * np.pi / 16) for u in range(8)] for x in range(8)]
)
# basis[u, x] = C(u)/2 * cos((2x+1) u pi / 16)
_BASIS = (_C[None, :] * _COS).T / 2.0  # shape (u, x) -> transpose of _COS


def idct2(block: np.ndarray) -> np.ndarray:
    """8x8 type-III DCT (the T.81 inverse transform), separable."""
    return _BASIS.T @ block @ _BASIS


def dct2(block: np.ndarray) -> np.ndarray:
    """8x8 type-II forward DCT with T.81 normalization."""
    return _BASIS @ block @ _BASIS.T


# --- bit IO -----------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.acc = 0

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise ValueError("JPEG entropy data truncated")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RST handled by caller via sync()
                raise _RestartMarker(nxt)
            else:
                raise ValueError("unexpected marker in entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.bits += 8

    def read_bit(self) -> int:
        if self.bits == 0:
            self._fill()
        self.bits -= 1
        return (self.acc >> self.bits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self):
        """Consume an RST marker and reset bit state."""
        self.bits = 0
        self.acc = 0
        # skip to the marker (pos currently points at 0xFF)
        while self.pos + 1 < len(self.data) and not (
            self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker):
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# --- decoder ---------------------------------------------------------------


def decode_jpeg_pixels(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JFIF/JPEG to (width, height, channels, pixels) —
    interleaved uint8, channels 1 (gray) or 3 (RGB)."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack_from(">H", data, pos + 2)[0]
        payload = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                if pq == 0:
                    tab = np.frombuffer(payload[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                else:
                    tab = np.frombuffer(payload[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                qt[tq] = tab
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = [0] + list(payload[p + 1 : p + 17])
                n = sum(bits)
                values = list(payload[p + 17 : p + 17 + n])
                table = _huff_decode_table((bits, values))
                (dc_tabs if tc == 0 else ac_tabs)[th] = table
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = payload[0], *struct.unpack_from(">HH", payload, 1), payload[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = payload[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1,):  # extended sequential — same decode path
            prec, h, w, nc = payload[0], *struct.unpack_from(">HH", payload, 1), payload[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = payload[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG process")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", payload, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            scan = []
            for i in range(ns):
                cs, tabs = payload[1 + 2 * i], payload[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append({**comp, "td": tabs >> 4, "ta": tabs & 0x0F})
            pixels = _decode_scan(
                data, pos + 2 + seg_len, frame, scan, qt, dc_tabs, ac_tabs,
                restart_interval,
            )
            return pixels
        pos += 2 + seg_len
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, scan, qt, dc_tabs, ac_tabs, restart_interval):
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in scan
    }
    reader = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in scan}
    mcu_count = 0

    def read_huff(table) -> int:
        code, ln = 0, 0
        for _ in range(16):
            code = (code << 1) | reader.read_bit()
            ln += 1
            v = table.get((ln, code))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code")

    def decode_block(comp):
        zz = np.zeros(64, dtype=np.int32)
        t = read_huff(dc_tabs[comp["td"]])
        diff = _extend(reader.read_bits(t), t) if t else 0
        pred[comp["id"]] += diff
        zz[0] = pred[comp["id"]]
        k = 1
        while k < 64:
            rs = read_huff(ac_tabs[comp["ta"]])
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("AC index overflow")
            zz[k] = _extend(reader.read_bits(s), s)
            k += 1
        dq = np.zeros(64)
        dq[ZIGZAG] = zz * qt[comp["tq"]]
        return idct2(dq.reshape(8, 8)) + 128

    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_restart()
                for cid in pred:
                    pred[cid] = 0
            try:
                for comp in scan:
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            block = decode_block(comp)
                            y0 = (my * comp["v"] + by) * 8
                            x0 = (mx * comp["h"] + bx) * 8
                            planes[comp["id"]][y0 : y0 + 8, x0 : x0 + 8] = block
            except _RestartMarker:
                raise ValueError("unexpected restart marker") from None
            mcu_count += 1

    # upsample each component to full resolution and crop
    full = []
    for comp in scan:
        p = planes[comp["id"]]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        gray = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return w, h, 1, gray.tobytes()
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack(
        [np.clip(np.round(x), 0, 255) for x in (r, g, b)], axis=-1
    ).astype(np.uint8)
    return w, h, 3, rgb.tobytes()


# --- encoder (fixture writer) ----------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.bits = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.bits += 1
            if self.bits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.bits = 0

    def flush(self):
        if self.bits:
            self.acc = (self.acc << (8 - self.bits)) | ((1 << (8 - self.bits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.bits = 0


def _encode_block(bw, block, quant, dc_codes, ac_codes, pred):
    coef = dct2(block.astype(np.float64) - 128.0)
    # quantize in natural order, then reorder to zigzag
    q = np.round(coef / quant.reshape(8, 8)).astype(np.int32).reshape(64)
    zz = q[ZIGZAG]
    diff = int(zz[0]) - pred
    pred = int(zz[0])

    def magnitude(v):
        t = int(v).bit_length() if v >= 0 else int(-v).bit_length()
        return t, (v if v >= 0 else v + (1 << t) - 1)

    t, bitsv = magnitude(diff)
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(bitsv, t)
    run = 0
    last_nz = max(np.nonzero(zz)[0]) if np.any(zz) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                code, ln = ac_codes[0x00]  # EOB
                bw.write(code, ln)
                break
            run += 1
            if run == 16:
                code, ln = ac_codes[0xF0]  # ZRL
                bw.write(code, ln)
                run = 0
            continue
        t, bitsv = magnitude(v)
        code, ln = ac_codes[(run << 4) | t]
        bw.write(code, ln)
        bw.write(bitsv, t)
        run = 0
    return pred


def make_jpeg(
    width: int,
    height: int,
    shade: int = 128,
    pixel: tuple[int, int, int] | None = None,
    subsampling: str = "444",
) -> bytes:
    """A real baseline JFIF JPEG: grayscale when ``pixel`` is None, else
    color filled with the RGB triple. Annex K tables.
    ``subsampling='420'`` (color only) writes 2x2-sampled luma — 16x16
    MCUs of four Y blocks + Cb + Cr, the layout nearly every camera and
    encoder produces; gray triples (r=g=b, even) still decode exactly
    (Cb=Cr=128 survives quantization untouched)."""
    color = pixel is not None
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    sub420 = color and subsampling == "420"
    luma_hv = 0x22 if sub420 else 0x11
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes(
        int(QUANT_LUMA[i]) for i in range(64)
    )
    if color:
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([1]) + bytes(
            int(QUANT_CHROMA[i]) for i in range(64)
        )
    # SOF0
    nc = 3 if color else 1
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([nc])
    sof += bytes([1, luma_hv, 0])
    if color:
        sof += bytes([2, 0x11, 1, 3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(tc, th, spec):
        bits, values = spec
        payload = bytes([tc << 4 | th]) + bytes(bits[1:17]) + bytes(values)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    out += dht(0, 0, DC_LUMA_SPEC) + dht(1, 0, AC_LUMA_SPEC)
    if color:
        out += dht(0, 1, DC_CHROMA_SPEC) + dht(1, 1, AC_CHROMA_SPEC)
    sos = bytes([nc, 1, 0x00])
    if color:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # build component planes
    if color:
        r, g, b = pixel
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        planes = [(y, QUANT_LUMA, 0), (cb, QUANT_CHROMA, 1), (cr, QUANT_CHROMA, 1)]
    else:
        planes = [(float(shade), QUANT_LUMA, 0)]

    mcu_px = 16 if sub420 else 8
    mcux = (width + mcu_px - 1) // mcu_px
    mcuy = (height + mcu_px - 1) // mcu_px
    bw = _BitWriter()
    dc_l, ac_l = _huff_codes(DC_LUMA_SPEC), _huff_codes(AC_LUMA_SPEC)
    dc_c, ac_c = _huff_codes(DC_CHROMA_SPEC), _huff_codes(AC_CHROMA_SPEC)
    preds = [0] * len(planes)
    block_cache: dict[tuple[float, int], np.ndarray] = {}
    for _my in range(mcuy):
        for _mx in range(mcux):
            for ci, (val, quant, tab) in enumerate(planes):
                # 4:2:0: the luma component contributes h*v = 4 blocks
                # per MCU (constant fill -> identical blocks)
                reps = 4 if (sub420 and ci == 0) else 1
                for _ in range(reps):
                    block = np.full((8, 8), float(val))
                    dc_codes = dc_l if tab == 0 else dc_c
                    ac_codes = ac_l if tab == 0 else ac_c
                    preds[ci] = _encode_block(bw, block, quant, dc_codes, ac_codes, preds[ci])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def predicted_constant_decode(shade: int) -> int:
    """The gray value the baseline pipeline reconstructs for a
    constant-``shade`` image: DC = 8*(shade-128) (all AC zero), quantized
    by QUANT_LUMA[0]=16, dequantized, IDCT of a DC-only block = DC/8,
    +128. For EVEN shades the quantization is exact and the image decodes
    to ``shade`` bit-for-bit; odd shades land on a half-way rounding point
    where float DCT noise decides the LSB — oracles must use even shades.
    """
    if shade % 2:
        raise ValueError("prediction only exact for even shades")
    return int(np.clip(shade, 0, 255))
