"""Pure-numpy baseline JPEG codec (round-4 verdict item 9).

The reference's media path (``utils/ocr_processor.py``) leans on
Pillow/OpenCV for image decode; none of those libraries ship in this
container, so ``media_features`` sniffed JPEG to "unknown" until now.
This module implements the JPEG baseline process from the public spec
(ITU-T T.81 / ISO 10918-1) directly:

- **decoder** (`decode_jpeg`): marker walk (SOI/APP*/DQT/DHT/SOF0/
  DRI/SOS/EOI), Huffman entropy decode with byte-unstuffing and
  restart-marker support, dequantize, zigzag-inverse, float IDCT
  (separable DCT-III matrix), nearest-neighbour chroma upsampling for
  arbitrary baseline sampling factors (4:4:4, 4:2:0, 4:2:2, ...),
  YCbCr→RGB per JFIF.  Progressive (SOF2), arithmetic coding, 12-bit
  and hierarchical modes raise — the codec-library swap-in point,
  same discipline as the PNG/BMP decoders in ``media.py``.
- **encoder** (`encode_jpeg_gray` / `encode_jpeg_rgb`): baseline
  4:4:4 with the T.81 Annex-K example quantization and Huffman
  tables — deterministic bytes for a given pixel array, used to
  synthesize test/bench payloads (the same role ``encode_png`` plays).

The entropy loops are per-symbol Python — fine for the synthetic
feature extraction payloads (≤ a few KB per image); at 100 TB the
stage plumbing (actor-pool ``map_batches`` in ``MediaDecodeStage``)
is the deliverable and this codec is the documented swap-in for
libjpeg-turbo.  Everything here is deterministic: same bytes in, same
pixels out, no RNG, no dithering.
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg_gray", "encode_jpeg_rgb"]

# --- T.81 Annex K example tables -------------------------------------------

_QT_LUMA = np.array(
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
    dtype=np.int32,
)
_QT_CHROMA = np.array(
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
    dtype=np.int32,
)

# zigzag scan order: _ZIGZAG[i] = raster index of the i-th zigzag entry
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# standard Huffman tables (T.81 Annex K.3): (bits per code length 1..16,
# symbol values)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
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
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
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


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix D; block DCT = D @ B @ D.T,
    IDCT = D.T @ C @ D."""
    x = np.arange(8)
    u = x[:, None]
    d = np.cos((2 * x[None, :] + 1) * u * np.pi / 16) / 2.0
    d[0, :] *= 1.0 / np.sqrt(2.0)
    return d


_DCT = _dct_matrix()


# --- Huffman machinery ------------------------------------------------------

def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing
    and restart-marker awareness."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.pos = start
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.bitbuf = (self.bitbuf << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: caller consumes via sync_restart()
                    self.bitbuf = (self.bitbuf << 8) | 0
                    self.nbits += 8
                    continue
                else:
                    # EOI or next segment — pad with zeros
                    self.bitbuf = (self.bitbuf << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self):
        """Drop to a byte boundary and consume one RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected JPEG restart marker")

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 sign extension of a ``size``-bit magnitude."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# --- decoder ----------------------------------------------------------------

def decode_jpeg(b: bytes, return_pixels: bool = False) -> dict:
    """Decode a baseline (SOF0) JFIF/JPEG to features.

    Returns the ``media.py`` decoder contract: kind/width/height/
    channels/mean_value (mean over the decoded 8-bit samples, RGB for
    3-component streams).  Raises on non-baseline modes.
    """
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    width = height = None
    restart_interval = 0
    i = 2
    scan_start = None
    scan_comps: list[dict] = []
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise ValueError(f"bad marker alignment at {i}")
        marker = b[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
            i += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seglen = int.from_bytes(b[i + 2 : i + 4], "big")
        seg = b[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported (baseline only)")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = np.frombuffer(seg[p + 1 : p + 65], np.uint8).astype(np.int32)
                qt[tid] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                (huff_dc if cls == 0 else huff_ac)[tid] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported — "
                "the codec-library swap-in point"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in comps if x["id"] == cs)
                scan_comps.append(
                    {**comp, "dc": tables >> 4, "ac": tables & 0xF}
                )
            scan_start = i + 2 + seglen
            break
        i += 2 + seglen
    if width is None or scan_start is None:
        raise ValueError("truncated JPEG (missing SOF/SOS)")

    hmax = max(c["h"] for c in scan_comps)
    vmax = max(c["v"] for c in scan_comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in scan_comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )

    reader = _BitReader(b, scan_start)
    preds = [0] * len(scan_comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_restart()
                preds = [0] * len(scan_comps)
            for ci, c in enumerate(scan_comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        t = reader.decode_symbol(huff_dc[c["dc"]])
                        diff = _extend(reader.read_bits(t), t)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(huff_ac[c["ac"]])
                            r, s = rs >> 4, rs & 0xF
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("AC run past end of block")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[_ZIGZAG] = zz * qt[c["tq"]].reshape(-1)[_ZIGZAG]
                        px = _DCT.T @ blk.reshape(8, 8) @ _DCT + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1

    # upsample each component to full MCU-grid resolution, crop, convert
    full = []
    for ci, c in enumerate(scan_comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:height, :width])
    if len(full) == 1:
        pix = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        out = {"kind": "jpeg", "width": width, "height": height, "channels": 1,
               "mean_value": float(pix.mean())}
        if return_pixels:
            out["pixels"] = pix
        return out
    if len(full) != 3:
        raise ValueError(f"unsupported component count {len(full)}")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.clip(np.round(np.stack([r, g, bl], axis=-1)), 0, 255).astype(np.uint8)
    out = {"kind": "jpeg", "width": width, "height": height, "channels": 3,
           "mean_value": float(rgb.mean())}
    if return_pixels:
        out["pixels"] = rgb
    return out


# --- encoder ----------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nacc += length
        while self.nacc >= 8:
            self.nacc -= 8
            byte = (self.acc >> self.nacc) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nacc:
            pad = 8 - self.nacc
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _encode_block(bw: _BitWriter, blk: np.ndarray, q: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    """DCT, quantize, entropy-code one 8x8 sample block; returns the
    new DC predictor."""
    coef = _DCT @ (blk - 128.0) @ _DCT.T
    qc = np.where(coef >= 0, np.floor(coef / q + 0.5), -np.floor(-coef / q + 0.5)).astype(
        np.int64
    )
    zz = qc.reshape(-1)[_ZIGZAG]
    # DC
    diff = int(zz[0]) - pred
    size = int(diff).bit_length() if diff != 0 else 0
    code, ln = dc_codes[size]
    bw.write(code, ln)
    if size:
        bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    # AC
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        size = abs(v).bit_length()
        code, ln = ac_codes[(run << 4) | size]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        code, ln = ac_codes[0x00]
        bw.write(code, ln)
    return int(zz[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _dht_payload(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)


def _headers(width: int, height: int, ncomp: int, luma_hv: int = 0x11,
             restart_interval: int = 0) -> bytes:
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    qz_l = bytes([0]) + bytes(int(v) for v in _QT_LUMA.reshape(-1)[_ZIGZAG])
    out += _seg(0xDB, qz_l)
    if ncomp == 3:
        qz_c = bytes([1]) + bytes(int(v) for v in _QT_CHROMA.reshape(-1)[_ZIGZAG])
        out += _seg(0xDB, qz_c)
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big") + bytes([ncomp])
    if ncomp == 1:
        sof += bytes([1, 0x11, 0])
    else:
        # luma_hv 0x11 -> 4:4:4; 0x22 -> 4:2:0 (chroma stays 1x1)
        sof += bytes([1, luma_hv, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_payload(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS))
    out += _seg(0xC4, _dht_payload(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS))
    if ncomp == 3:
        out += _seg(0xC4, _dht_payload(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS))
        out += _seg(0xC4, _dht_payload(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS))
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    if ncomp == 1:
        out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    else:
        out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return bytes(out)


def _pad_blocks(plane: np.ndarray) -> np.ndarray:
    """Edge-replicate to multiples of 8 (keeps block DCTs tame)."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg_gray(pix: np.ndarray, restart_interval: int = 0) -> bytes:
    """Encode a (h, w) uint8 array as single-component baseline JPEG.
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (exercises the decoder's restart resync path)."""
    pix = np.asarray(pix, dtype=np.float64)
    h, w = pix.shape
    out = bytearray(_headers(w, h, 1, restart_interval=restart_interval))
    bw = _BitWriter()
    dc = _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac = _build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    p = _pad_blocks(pix)
    pred = 0
    mcu = 0
    rst = 0
    for y0 in range(0, p.shape[0], 8):
        for x0 in range(0, p.shape[1], 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                out += bw.out
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                bw = _BitWriter()
                pred = 0
            pred = _encode_block(bw, p[y0 : y0 + 8, x0 : x0 + 8], _QT_LUMA.reshape(8, 8), pred, dc, ac)
            mcu += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_rgb(pix: np.ndarray, subsample: bool = False) -> bytes:
    """Encode a (h, w, 3) uint8 array as baseline JPEG (JFIF YCbCr
    primaries) — 4:4:4 by default, 4:2:0 with ``subsample=True``
    (luma 2×2 per MCU, chroma box-filtered 2:1 both axes; exercises
    the decoder's interleaved-MCU + upsampling path)."""
    pix = np.asarray(pix, dtype=np.float64)
    h, w, _ = pix.shape
    r, g, b = pix[..., 0], pix[..., 1], pix[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    bw = _BitWriter()
    dc_l = _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _build_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
    q_l, q_c = _QT_LUMA.reshape(8, 8), _QT_CHROMA.reshape(8, 8)
    preds = [0, 0, 0]
    if not subsample:
        out = bytearray(_headers(w, h, 3))
        comps = [
            (_pad_blocks(y), q_l, dc_l, ac_l),
            (_pad_blocks(cb), q_c, dc_c, ac_c),
            (_pad_blocks(cr), q_c, dc_c, ac_c),
        ]
        ph, pw = comps[0][0].shape
        for y0 in range(0, ph, 8):  # 4:4:4 MCU = one block per component
            for x0 in range(0, pw, 8):
                for ci, (plane, q, dc, ac) in enumerate(comps):
                    preds[ci] = _encode_block(
                        bw, plane[y0 : y0 + 8, x0 : x0 + 8], q, preds[ci], dc, ac
                    )
        bw.flush()
        out += bw.out
        out += b"\xff\xd9"
        return bytes(out)
    # --- 4:2:0: MCU = 16x16 luma (4 blocks) + one 8x8 block each of
    # box-filtered chroma --------------------------------------------
    out = bytearray(_headers(w, h, 3, luma_hv=0x22))
    # pad luma to multiples of 16, chroma (after 2:1 box filter) to 8
    yh, yw = y.shape
    yp = np.pad(y, ((0, -yh % 16), (0, -yw % 16)), mode="edge")
    def down(p):
        p = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)), mode="edge")
        return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
    cbp = _pad_blocks(down(np.pad(cb, ((0, -yh % 16), (0, -yw % 16)), mode="edge")))
    crp = _pad_blocks(down(np.pad(cr, ((0, -yh % 16), (0, -yw % 16)), mode="edge")))
    for my in range(yp.shape[0] // 16):
        for mx in range(yp.shape[1] // 16):
            for by in range(2):
                for bx in range(2):
                    y0, x0 = my * 16 + by * 8, mx * 16 + bx * 8
                    preds[0] = _encode_block(
                        bw, yp[y0 : y0 + 8, x0 : x0 + 8], q_l, preds[0], dc_l, ac_l
                    )
            preds[1] = _encode_block(
                bw, cbp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], q_c, preds[1], dc_c, ac_c
            )
            preds[2] = _encode_block(
                bw, crp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], q_c, preds[2], dc_c, ac_c
            )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
