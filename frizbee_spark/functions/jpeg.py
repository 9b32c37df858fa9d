"""Baseline JPEG (JFIF) codec in pure NumPy + stdlib — no PIL/libjpeg.

Decoder: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr with
arbitrary sampling factors (4:4:4, 4:2:0, 4:2:2, ...), restart markers,
16-bit DQT precision. Progressive (SOF2) and arithmetic-coded JPEGs
raise ValueError loudly — same contract as the other pure-NumPy media
decoders in operators/multimodal.py.

Encoder: fixture-grade baseline encoder (Annex K quant + Huffman tables,
quality scaling per the libjpeg convention, optional 4:2:0 chroma
subsampling). It exists so tests can roundtrip decode(encode(img)) and
assert PSNR — the decoder is the product, the encoder is its witness.

Reference parity note: frizbee has no media path; this extends the
multimodal column support VERDICT r4 ranked as the top user-visible gap
(PNG landed earlier in round 5; JPEG is the next format a Common-Crawl
media column hits). Spec: ITU-T T.81 (JPEG), JFIF 1.02.
"""
from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- tables

# zigzag order: index i of this array holds the (row-major) position of
# the i-th zigzag coefficient (T.81 Figure 5)
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 luminance / chrominance quantization tables (row-major)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

# 8x8 DCT-II basis matrix: block_dct = A @ block @ A.T (exact float)
_A = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _A[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16.0)
_A *= 0.5
_A[0, :] *= 1.0 / np.sqrt(2.0)
DCT_MAT = _A
del _A, _k, _n


def dct2(block: np.ndarray) -> np.ndarray:
    """2-D DCT-II with JPEG normalization (T.81 A.3.3)."""
    return DCT_MAT @ block @ DCT_MAT.T


def idct2(coef: np.ndarray) -> np.ndarray:
    """Exact inverse of dct2 (the basis matrix is orthogonal)."""
    return DCT_MAT.T @ coef @ DCT_MAT


# -------------------------------------------------------------- huffman


def build_huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 Annex C code assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def build_huffman_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol — the decoder-side inverse."""
    return {(ln, c): s for s, (c, ln) in build_huffman_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:          # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)   # pad with 1-bits


class _BitReader:
    """Entropy-stream bit reader with 0xFF00 unstuffing; stops at any
    non-RST marker and exposes it for restart handling."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("jpeg: entropy data truncated (hit marker)")
        if self.pos >= len(self.data):
            raise ValueError("jpeg: entropy data truncated (EOF)")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: truncated after 0xFF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1                 # stuffed 0xFF data byte
            else:
                self.marker = nxt             # real marker: stop
                self.pos += 1
                raise ValueError("jpeg: entropy data truncated (hit marker)")
        self._acc = (self._acc << 8) | b
        self._n += 8

    def read_bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid huffman code in entropy stream")

    def align_to_marker(self) -> int | None:
        """Drop pending bits and consume the next marker (for RSTn)."""
        self._acc = 0
        self._n = 0
        if self.marker is not None:
            m, self.marker = self.marker, None
            return m
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                m = self.data[self.pos + 1]
                self.pos += 2
                return m
            self.pos += 1
        return None


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """Signed value -> (bit-length category, magnitude bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, (v if v > 0 else v + (1 << t) - 1)


# -------------------------------------------------------------- decoder


def decode_jpeg(data: bytes,
                max_pixels: int | None = None) -> tuple[int, int, int, np.ndarray]:
    """Decode a baseline JFIF blob -> (width, height, channels, pixels).

    pixels is uint8 (h, w) for grayscale or (h, w, 3) RGB. Raises
    ValueError on progressive/arithmetic/12-bit or truncated input, and
    (BEFORE any plane allocation) when w*h*channels exceeds max_pixels —
    the decode-bomb guard for untrusted web blobs.
    """
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict[tuple[int, int], int]] = {}
    huff_ac: dict[int, dict[tuple[int, int], int]] = {}
    frame = None           # (w, h, [(cid, hs, vs, tq)])
    restart_interval = 0

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:                          # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue                                # standalone
        if pos + 2 > len(data):
            raise ValueError("jpeg: truncated segment header")
        seglen = int.from_bytes(data[pos:pos + 2], "big")
        seg = data[pos + 2:pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("jpeg: truncated segment body")
        if marker == 0xDB:                          # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[i:i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
                else:
                    tbl = np.frombuffer(seg[i:i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                qt[tq] = tbl
        elif marker == 0xC4:                        # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                i += 17 + n
                dec = build_huffman_decoder(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
        elif marker == 0xC0 or marker == 0xC1:      # SOF0/1 baseline
            if seg[0] != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            if max_pixels is not None and w * h * nc > max_pixels:
                raise ValueError(
                    f"jpeg: {w}x{h}x{nc} exceeds max_pixels={max_pixels}")
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "jpeg: progressive/extended/arithmetic coding not "
                "supported (baseline SOF0 only)")
        elif marker == 0xDD:                        # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:                        # SOS — entropy follows
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            scan_tables = {}
            for s in range(ns):
                cs, tdta = seg[1 + 2 * s], seg[2 + 2 * s]
                scan_tables[cs] = (tdta >> 4, tdta & 0x0F)
            return _decode_scan(
                data, pos + seglen, frame, scan_tables, qt,
                huff_dc, huff_ac, restart_interval)
        pos += seglen
    raise ValueError("jpeg: no SOS scan found")


def _decode_scan(data, pos, frame, scan_tables, qt, huff_dc, huff_ac,
                 restart_interval):
    w, h, comps = frame
    if w == 0 or h == 0:
        raise ValueError("jpeg: zero dimension")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    planes = {}
    for cid, hs, vs, tq in comps:
        planes[cid] = np.zeros((mcus_y * vs * 8, mcus_x * hs * 8),
                               dtype=np.float64)

    reader = _BitReader(data, pos)
    pred = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                m = reader.align_to_marker()
                if m is None or not (0xD0 <= m <= 0xD7):
                    raise ValueError("jpeg: expected RST marker")
                pred = {cid: 0 for cid, *_ in comps}
            for cid, hs, vs, tq in comps:
                td, ta = scan_tables[cid]
                dctab, actab = huff_dc[td], huff_ac[ta]
                q = qt[tq]
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, dtype=np.int64)
                        t = reader.decode_symbol(dctab)
                        diff = _extend(reader.read_bits(t), t)
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        kk = 1
                        while kk < 64:
                            rs = reader.decode_symbol(actab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:      # ZRL: 16 zeros
                                    kk += 16
                                    continue
                                break            # EOB
                            kk += r
                            if kk > 63:
                                raise ValueError("jpeg: AC index overflow")
                            zz[kk] = _extend(reader.read_bits(s), s)
                            kk += 1
                        coef = (zz * q)[UNZIGZAG].reshape(8, 8)
                        blk = idct2(coef.astype(np.float64)) + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = blk
            mcu_count += 1

    # upsample each component to full MCU-padded resolution, then crop
    full_h, full_w = mcus_y * vmax * 8, mcus_x * hmax * 8
    out_planes = []
    for cid, hs, vs, tq in comps:
        p = planes[cid]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0),
                          hmax // hs, axis=1)
        out_planes.append(p[:h, :w])

    if len(comps) == 1:
        pix = np.clip(out_planes[0], 0, 255).astype(np.uint8)
        return w, h, 1, pix
    if len(comps) != 3:
        raise ValueError(f"jpeg: {len(comps)}-component scans unsupported")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    pix = np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
    return w, h, 3, pix


# -------------------------------------------------------------- encoder


def _scale_quant(tbl: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 50 -> table as-is, 100 -> all ones."""
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tbl * s + 50) // 100, 1, 255).astype(np.int64)


def _encode_block(bw, block, q, dc_codes, ac_codes, pred):
    coef = dct2(block.astype(np.float64) - 128.0)
    zz = np.round(coef.reshape(-1)[ZIGZAG] / q[ZIGZAG].astype(np.float64)
                  ).astype(np.int64)
    diff = int(zz[0]) - pred
    t, bits = _magnitude(diff)
    c, ln = dc_codes[t]
    bw.write(c, ln)
    if t:
        bw.write(bits, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]       # ZRL
            bw.write(c, ln)
            run -= 16
        s, bits = _magnitude(v)
        c, ln = ac_codes[(run << 4) | s]
        bw.write(c, ln)
        bw.write(bits, s)
        run = 0
    if run:
        c, ln = ac_codes[0x00]           # EOB
        bw.write(c, ln)
    return int(zz[0])


def encode_jpeg(pixels: np.ndarray, quality: int = 90,
                subsample: bool = False, restart_interval: int = 0) -> bytes:
    """Encode uint8 (h, w) grayscale or (h, w, 3) RGB as baseline JFIF.

    subsample=True emits 4:2:0 chroma (exercises the decoder's upsample
    path); False emits 4:4:4. restart_interval > 0 emits a DRI segment
    and RSTn markers every that-many MCUs (exercises the decoder's
    restart/predictor-reset path). Fixture-grade: Annex K tables.
    """
    pixels = np.asarray(pixels, dtype=np.uint8)
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("jpeg: empty image")

    ql = _scale_quant(QUANT_LUMA, quality)
    qc = _scale_quant(QUANT_CHROMA, quality)
    dc_l = build_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = build_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = build_huffman_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = build_huffman_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    if gray:
        planes = [pixels.astype(np.float64)]
        samps = [(1, 1)]
    else:
        rgb = pixels.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            # pad to even dims, then 2x2 box average
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            def pad(p):
                return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = pad(cb).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = pad(cr).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            samps = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # pad every plane to its own MCU-aligned size (edge replicate)
    padded = []
    for p, (hs, vs) in zip(planes, samps):
        th, tw = mcus_y * vs * 8, mcus_x * hs * 8
        padded.append(np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"))

    out = bytearray(b"\xff\xd8")                       # SOI
    out += b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"

    def seg(marker: bytes, body: bytes) -> bytes:
        return marker + (len(body) + 2).to_bytes(2, "big") + body

    out += seg(b"\xff\xdb", bytes([0x00]) + bytes(ql[ZIGZAG].tolist()))
    if not gray:
        out += seg(b"\xff\xdb", bytes([0x01]) + bytes(qc[ZIGZAG].tolist()))

    nc = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for i, (hs, vs) in enumerate(samps):
        sof += bytes([i + 1, (hs << 4) | vs, 0 if i == 0 else 1])
    out += seg(b"\xff\xc0", sof)

    def dht(tc, th, bits, vals):
        return seg(b"\xff\xc4",
                   bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)

    if restart_interval:
        out += seg(b"\xff\xdd", restart_interval.to_bytes(2, "big"))

    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(b"\xff\xda", sos)

    bw = _BitWriter()
    pred = [0] * nc
    tabs = [(ql, dc_l, ac_l)] + [(qc, dc_c, ac_c)] * (nc - 1)
    entropy = bytearray()
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()
                entropy += bw.out
                entropy += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                bw = _BitWriter()
                pred = [0] * nc
            for ci, (p, (hs, vs)) in enumerate(zip(padded, samps)):
                q, dcc, acc = tabs[ci]
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        pred[ci] = _encode_block(
                            bw, p[y0:y0 + 8, x0:x0 + 8], q, dcc, acc,
                            pred[ci])
            mcu_count += 1
    bw.flush()
    entropy += bw.out
    out += entropy
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)
