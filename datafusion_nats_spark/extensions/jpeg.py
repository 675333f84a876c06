"""Pure-stdlib baseline JPEG codec — the last image format the
multimodal path listed as a native-library plug-in.

Decoder: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components,
arbitrary quantization and Huffman tables from the stream (so files
from ANY baseline encoder decode), sampling factors up to 2x2 (4:4:4 /
4:2:2 / 4:2:0 via nearest-neighbor upsampling), byte-stuffing and
restart markers. Progressive (SOF2) and arithmetic coding raise
``ValueError`` — they are rare in training corpora and keep this
dependency-free module honest about its scope.

Encoder (for tests/examples): 4:4:4 or 4:2:0, FLAT quantization tables
(luma 16, chroma 24 — any 1..255 table is spec-legal, and a flat table
makes analytic anchors exact: a uniform color quantizes to DC-only
blocks) and SELF-BUILT canonical Huffman tables written into DHT (12
DC symbols at code length 4; all 162 AC symbols at length 8) — legal
per Annex C and much less error-prone than transcribing the Annex K
tables by hand.

The DCT pair is the textbook O(64^2) double loop with a precomputed
cosine table — ~4k multiplies per block, plenty for feature extraction
and tests; swap in libjpeg via PIL for production throughput with the
identical ``decode_image`` interface.
"""

from __future__ import annotations

import math
import struct

JPEG_MAGIC = b"\xff\xd8"

# zigzag index -> natural (row-major) index
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_COS = [[math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)] for u in range(8)]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def _idct2(coef: list[float]) -> list[int]:
    """64 natural-order coefficients -> 64 spatial samples (level-shifted
    back to 0..255, clamped)."""
    # separable: rows then columns
    tmp = [0.0] * 64
    for v in range(8):
        row = coef[v * 8 : v * 8 + 8]
        for x in range(8):
            s = 0.0
            for u in range(8):
                s += _C[u] * row[u] * _COS[u][x]
            tmp[v * 8 + x] = s / 2.0
    out = [0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for v in range(8):
                s += _C[v] * tmp[v * 8 + x] * _COS[v][y]
            val = int(round(s / 2.0)) + 128
            out[y * 8 + x] = 0 if val < 0 else (255 if val > 255 else val)
    return out


def _fdct2(block: list[int]) -> list[float]:
    """64 spatial samples -> 64 natural-order DCT coefficients."""
    shifted = [b - 128 for b in block]
    tmp = [0.0] * 64
    for y in range(8):
        row = shifted[y * 8 : y * 8 + 8]
        for u in range(8):
            s = 0.0
            for x in range(8):
                s += row[x] * _COS[u][x]
            tmp[y * 8 + u] = s * _C[u] / 2.0
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                s += tmp[y * 8 + u] * _COS[v][y]
            out[v * 8 + u] = s * _C[v] / 2.0
    return out


def _build_decode_table(counts: list[int], symbols: bytes) -> dict:
    """(length, code) -> symbol, canonical per JPEG Annex C."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first reader over de-stuffed entropy bytes."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(value: int, size: int) -> int:
    if size == 0:
        return 0
    return value if value >= (1 << (size - 1)) else value - (1 << size) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Baseline JPEG -> (width, height, channels, bytes) — RGB for
    3-component YCbCr, grayscale for 1-component."""
    if data[:2] != JPEG_MAGIC:
        raise ValueError("not a JPEG: bad signature")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # ITU T.81 B.1.1.2: a marker may be preceded by any number of
        # 0xFF fill bytes — skip them instead of reading a garbage
        # segment length (ADVICE round 5). The skip can advance past the
        # loop header's bounds check, so re-validate before every read:
        # truncated fill-padded containers must stay ValueError, never
        # IndexError/struct.error (round-6 self-review).
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG: fill bytes run to end of data")
        marker = data[pos + 1]
        pos += 2
        if marker != 0xD9 and pos + 2 > len(data):
            raise ValueError("truncated JPEG segment header")
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        nextpos = pos + seglen
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                vals = list(body[b + 1 : b + 65])
                nat = [0] * 64
                for k in range(64):
                    nat[ZIGZAG[k]] = vals[k]
                qt[tq] = nat
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                counts = list(body[b + 1 : b + 17])
                n = sum(counts)
                symbols = body[b + 17 : b + 17 + n]
                huff[(tc, th)] = _build_decode_table(counts, symbols)
                b += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scan = {}
            for i in range(ns):
                cs, tables = body[1 + 2 * i], body[2 + 2 * i]
                scan[cs] = (tables >> 4, tables & 0x0F)
            # de-stuff entropy bytes, split at restart markers
            segs: list[bytes] = []
            cur = bytearray()
            p = nextpos
            while p < len(data):
                byte = data[p]
                if byte == 0xFF:
                    nxt = data[p + 1] if p + 1 < len(data) else 0xD9
                    if nxt == 0x00:
                        cur.append(0xFF)
                        p += 2
                        continue
                    if nxt == 0xFF:  # T.81 B.1.1.2 fill byte before a marker
                        p += 1
                        continue
                    if 0xD0 <= nxt <= 0xD7:
                        segs.append(bytes(cur))
                        cur = bytearray()
                        p += 2
                        continue
                    break  # next real marker (EOI or otherwise)
                cur.append(byte)
                p += 1
            segs.append(bytes(cur))
            return _decode_scan(frame, scan, qt, huff, segs, restart_interval)
        # APPn / COM / others: skip
        pos = nextpos
    raise ValueError("JPEG contains no scan")


def _decode_scan(frame, scan, qt, huff, segs, restart_interval):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(bytearray(mcux * 8 * c["h"] * mcuy * 8 * c["v"]))
    preds = [0] * len(comps)
    seg_i = 0
    reader = _BitReader(segs[0])
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("missing JPEG restart segment")
            reader = _BitReader(segs[seg_i])
            preds = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(comps):
            sel = scan.get(c["id"])
            if sel is None:
                # SOS component ids must cover the SOF components — a
                # mismatched id is a malformed container, not a KeyError
                raise ValueError(
                    f"SOS does not select frame component id {c['id']}"
                )
            dc_t, ac_t = sel
            dct = huff.get((0, dc_t))
            act = huff.get((1, ac_t))
            q = qt[c["tq"]]
            if dct is None or act is None:
                raise ValueError("scan references missing Huffman table")
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    t = reader.read_symbol(dct)
                    diff = _extend(reader.read_bits(t), t)
                    preds[ci] += diff
                    coef = [0.0] * 64
                    coef[0] = preds[ci] * q[0]
                    k = 1
                    while k < 64:
                        rs = reader.read_symbol(act)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past end of block")
                        nat = ZIGZAG[k]
                        coef[nat] = _extend(reader.read_bits(s), s) * q[nat]
                        k += 1
                    px = _idct2(coef)
                    pw = mcux * 8 * c["h"]
                    ox = (mx * c["h"] + bx) * 8
                    oy = (my * c["v"] + by) * 8
                    for yy in range(8):
                        row = (oy + yy) * pw + ox
                        planes[ci][row : row + 8] = bytes(
                            px[yy * 8 : yy * 8 + 8]
                        )
    if len(comps) == 1:
        pw = mcux * 8
        out = bytearray(w * h)
        for y in range(h):
            out[y * w : (y + 1) * w] = planes[0][y * pw : y * pw + w]
        return w, h, 1, bytes(out)
    # upsample to full res and convert YCbCr -> RGB
    out = bytearray(w * h * 3)
    pws = [mcux * 8 * c["h"] for c in comps]
    for y in range(h):
        for x in range(w):
            vals = []
            for ci, c in enumerate(comps):
                sx = x * c["h"] // hmax
                sy = y * c["v"] // vmax
                vals.append(planes[ci][sy * pws[ci] + sx])
            Y, cb, cr = vals[0], vals[1] - 128, vals[2] - 128
            r = int(round(Y + 1.402 * cr))
            g = int(round(Y - 0.344136 * cb - 0.714136 * cr))
            b = int(round(Y + 1.772 * cb))
            i = 3 * (y * w + x)
            out[i] = 0 if r < 0 else (255 if r > 255 else r)
            out[i + 1] = 0 if g < 0 else (255 if g > 255 else g)
            out[i + 2] = 0 if b < 0 else (255 if b > 255 else b)
    return w, h, 3, bytes(out)


# ---------------------------------------------------------------- encoder

_Q_LUMA = 16
_Q_CHROMA = 24

# self-built canonical tables: 12 DC symbols at length 4; EOB/ZRL and
# every (run 0-15, size 1-10) AC symbol at length 8 (162 codes — the
# all-ones code stays unused, as Annex C requires)
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _encode_tables():
    dc_counts = [0] * 16
    dc_counts[3] = len(_DC_SYMBOLS)  # all codes length 4
    ac_counts = [0] * 16
    ac_counts[7] = len(_AC_SYMBOLS)  # all codes length 8
    dc_codes = {sym: (4, i) for i, sym in enumerate(_DC_SYMBOLS)}
    ac_codes = {sym: (8, i) for i, sym in enumerate(_AC_SYMBOLS)}
    return dc_counts, ac_counts, dc_codes, ac_codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
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


def _size_of(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def _encode_block(bw, block, q, pred, dc_codes, ac_codes) -> int:
    coef = _fdct2(block)
    quant = [int(round(coef[i] / q)) for i in range(64)]
    dc = quant[0]
    diff = dc - pred
    s = _size_of(diff)
    length, code = dc_codes[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = quant[ZIGZAG[k]]
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_codes[0xF0]
            bw.write(code, length)
            run -= 16
        s = _size_of(v)
        length, code = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        length, code = ac_codes[0x00]
        bw.write(code, length)
    return dc


def _plane_block(plane, pw, ph, ox, oy):
    blk = [0] * 64
    for y in range(8):
        sy = min(oy + y, ph - 1)
        for x in range(8):
            sx = min(ox + x, pw - 1)
            blk[y * 8 + x] = plane[sy * pw + sx]
    return blk


def encode_jpeg(
    width: int,
    height: int,
    rgb: bytes,
    *,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """RGB -> baseline JPEG, 4:4:4 (default) or 4:2:0 (subsample=True),
    flat quantization (luma 16 / chroma 24), self-built Huffman tables,
    optional DRI/RSTn restart markers every ``restart_interval`` MCUs
    (exercises the decoder's predictor-reset path)."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb buffer must be width*height*3 bytes")
    n = width * height
    Y = bytearray(n)
    Cb = bytearray(n)
    Cr = bytearray(n)
    for i in range(n):
        r, g, b = rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        Y[i] = min(255, max(0, int(round(y))))
        Cb[i] = min(255, max(0, int(round(128 - 0.168736 * r - 0.331264 * g + 0.5 * b))))
        Cr[i] = min(255, max(0, int(round(128 + 0.5 * r - 0.418688 * g - 0.081312 * b))))
    if subsample:
        cw, ch = (width + 1) // 2, (height + 1) // 2
        sCb = bytearray(cw * ch)
        sCr = bytearray(cw * ch)
        for cy in range(ch):
            for cx in range(cw):
                acc_b = acc_r = cnt = 0
                for dy in range(2):
                    for dx in range(2):
                        x, y = 2 * cx + dx, 2 * cy + dy
                        if x < width and y < height:
                            acc_b += Cb[y * width + x]
                            acc_r += Cr[y * width + x]
                            cnt += 1
                sCb[cy * cw + cx] = acc_b // cnt
                sCr[cy * cw + cx] = acc_r // cnt
        chroma = [(sCb, cw, ch), (sCr, cw, ch)]
        samp = ((2, 2), (1, 1), (1, 1))
    else:
        chroma = [(Cb, width, height), (Cr, width, height)]
        samp = ((1, 1), (1, 1), (1, 1))

    dc_counts, ac_counts, dc_codes, ac_codes = _encode_tables()
    out = bytearray(JPEG_MAGIC)

    def seg(marker: int, body: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]) + struct.pack(">H", len(body) + 2) + body)

    for tq, q in ((0, _Q_LUMA), (1, _Q_CHROMA)):
        zz = bytes([q] * 64)
        seg(0xDB, bytes([tq]) + zz)
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([3])
    for i, (cid, (sh, sv), tq) in enumerate(
        zip((1, 2, 3), samp, (0, 1, 1))
    ):
        sof += bytes([cid, (sh << 4) | sv, tq])
    seg(0xC0, sof)
    for tc_th, counts, syms in (
        ((0 << 4) | 0, dc_counts, _DC_SYMBOLS),
        ((1 << 4) | 0, ac_counts, _AC_SYMBOLS),
        ((0 << 4) | 1, dc_counts, _DC_SYMBOLS),
        ((1 << 4) | 1, ac_counts, _AC_SYMBOLS),
    ):
        seg(0xC4, bytes([tc_th]) + bytes(counts) + bytes(syms))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    planes = [(Y, width, height), chroma[0], chroma[1]]
    qs = (_Q_LUMA, _Q_CHROMA, _Q_CHROMA)
    bw = _BitWriter()
    preds = [0, 0, 0]
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)])
            preds = [0, 0, 0]
        my, mx = divmod(m, mcux)
        for ci in range(3):
            plane, pw, ph = planes[ci]
            sh, sv = samp[ci]
            for by in range(sv):
                for bx in range(sh):
                    blk = _plane_block(
                        plane, pw, ph, (mx * sh + bx) * 8, (my * sv + by) * 8
                    )
                    preds[ci] = _encode_block(
                        bw, blk, qs[ci], preds[ci], dc_codes, ac_codes
                    )
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
