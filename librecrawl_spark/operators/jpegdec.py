"""Baseline JPEG luma decode — pure stdlib, no codec library.

Why this exists: the multimodal pipeline's pixel features (phash,
mean_luma) only need the LUMA plane, and baseline JPEG is huffman +
dequant + IDCT — all expressible in ~300 lines of stdlib Python. This
makes image features REAL for the dominant web image format alongside
PNG (zlib) and GIF (LZW), leaving only WebP/video frames stubbed
(VP8/AV1 genuinely need a codec).

Scope (honest): baseline and extended-sequential DCT (SOF0/SOF1) plus
progressive DCT (SOF2 — spectral selection, successive approximation,
EOB runs, DC/AC refinement scans per T.81 G.1.2), 8-bit precision,
grayscale or YCbCr with any h/v sampling factors, restart markers.
Arithmetic coding, 12-bit, and hierarchical JPEGs return None —
callers fall back to the documented fake path. Chroma blocks are
entropy-decoded (the bitstream can't be skipped) but never
dequantized/IDCT'd: only Y reaches pixels.

The inverse (make_test_jpeg) encodes a REAL decodable fixture —
grayscale or 4:4:4/4:2:0 YCbCr with constant chroma — using the
standard annex-K quantization and huffman tables, so tests can assert
decode(encode(img)) ~= img within quantization error, with no image
library anywhere.

Reference behavior modeled: LibreCrawl stores image bytes opaquely and
relies on PIL at display time (src/core/seo_extractor.py image
handling); this module is the engine-side stand-in that keeps feature
extraction distributed and dependency-free.
"""

from __future__ import annotations

import math
import struct

# ----------------------------------------------------------------------
# shared tables
# ----------------------------------------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# ITU-T81 annex K.1 — the ubiquitous example tables
STD_LUMA_QUANT = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
STD_CHROMA_QUANT = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

# annex K.3 huffman specs: (bits[1..16], huffval)
STD_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
               list(range(12)))
STD_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                 list(range(12)))
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# separable IDCT basis: COS[u][x] = C(u) * cos((2x+1)u*pi/16) / 2
_COS = [[(math.sqrt(0.5) if u == 0 else 1.0)
         * math.cos((2 * x + 1) * u * math.pi / 16) / 2
         for x in range(8)] for u in range(8)]


def _build_decode_table(bits, huffval):
    """Canonical huffman: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits, huffval):
    """Canonical huffman: {symbol: (code, length)}."""
    return {sym: (code, length)
            for (length, code), sym in _build_decode_table(bits, huffval).items()}


class _BitReader:
    """MSB-first bit reader over entropy-coded JPEG data: unstuffs
    0xFF00, stops at markers, and realigns at restart markers."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self):
        d, p = self.d, self.pos
        if p >= len(d):
            raise EOFError
        byte = d[p]
        if byte == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos = p + 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise EOFError          # EOI or next segment
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | byte
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self):
        """Skip to just past the next restart marker, dropping any
        partial bits (restart intervals are byte-aligned)."""
        self.acc = self.n = 0
        d = self.d
        p = self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.pos = p + 2
                return
            p += 1
        raise EOFError


class _RestartMarker(Exception):
    def __init__(self, marker):
        self.marker = marker


def _decode_huff(reader: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise EOFError                       # invalid code


def _extend(v: int, size: int) -> int:
    """ITU-T81 F.2.2.1 sign extension of a SIZE-bit magnitude."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_block(reader, dc_tab, ac_tab, pred: int):
    """One 8x8 block of zigzag coefficients; returns (coefs, new_pred)."""
    coefs = [0] * 64
    size = _decode_huff(reader, dc_tab)
    pred += _extend(reader.bits(size), size)
    coefs[0] = pred
    k = 1
    while k < 64:
        rs = _decode_huff(reader, ac_tab)
        run, size = rs >> 4, rs & 0xF
        if size == 0:
            if run == 15:                # ZRL
                k += 16
                continue
            break                        # EOB
        k += run
        if k > 63:
            break
        coefs[k] = _extend(reader.bits(size), size)
        k += 1
    return coefs, pred


def _idct_block(coefs, quant):
    """Dequant (zigzag-ordered coefs x zigzag-ordered quant) + separable
    2D IDCT + level shift; returns 8x8 rows of ints clamped to 0..255."""
    blk = [0.0] * 64
    for i in range(64):
        blk[ZIGZAG[i]] = coefs[i] * quant[i]
    # rows then columns
    tmp = [0.0] * 64
    for y in range(8):
        row = blk[8 * y:8 * y + 8]
        for x in range(8):
            tmp[8 * y + x] = sum(row[u] * _COS[u][x] for u in range(8))
    out = []
    for y in range(8):
        r = []
        for x in range(8):
            v = sum(tmp[8 * v_ + x] * _COS[v_][y] for v_ in range(8))
            r.append(min(255, max(0, round(v + 128))))
        out.append(r)
    return out


def decode_jpeg_luma(payload):
    """REAL luma decode for baseline/extended-sequential/progressive
    JPEG — pure stdlib. Returns a list of rows of luma ints in [0,255]
    at the Y component's resolution (cropped to the frame dims), or
    None for payloads outside scope (arithmetic, 12-bit, corrupt).
    Progressive streams accumulate coefficients across scans and IDCT
    once at EOI, exactly as a sequential decoder would see them.
    """
    if not isinstance(payload, (bytes, bytearray)) or bytes(payload[:2]) != b"\xff\xd8":
        return None
    b = bytes(payload)
    quant = {}
    huff_dc = {}
    huff_ac = {}
    frame = None
    store = None                         # progressive coefficient store
    restart_interval = 0
    i = 2
    try:
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                return None
            marker = b[i + 1]
            if marker == 0xD9:           # EOI
                break
            if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
                i += 2
                continue
            seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
            seg = b[i + 4:i + 2 + seg_len]
            if marker == 0xDB:           # DQT
                j = 0
                while j < len(seg):
                    prec, tid = seg[j] >> 4, seg[j] & 0xF
                    j += 1
                    if prec:
                        quant[tid] = [struct.unpack(">H", seg[j + 2 * k:j + 2 * k + 2])[0]
                                      for k in range(64)]
                        j += 128
                    else:
                        quant[tid] = list(seg[j:j + 64])
                        j += 64
            elif marker == 0xC4:         # DHT
                j = 0
                while j < len(seg):
                    cls, tid = seg[j] >> 4, seg[j] & 0xF
                    bits = list(seg[j + 1:j + 17])
                    n = sum(bits)
                    vals = list(seg[j + 17:j + 17 + n])
                    tab = _build_decode_table(bits, vals)
                    (huff_ac if cls else huff_dc)[tid] = tab
                    j += 17 + n
            elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1/SOF2
                prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
                if prec != 8:
                    return None
                comps = []
                for c in range(nc):
                    cid, samp, qid = seg[6 + 3 * c:9 + 3 * c]
                    comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF,
                                  "q": qid})
                frame = {"w": w, "h": h, "comps": comps,
                         "progressive": marker == 0xC2}
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None              # arithmetic/lossless/12-bit
            elif marker == 0xDD:         # DRI
                restart_interval = struct.unpack(">H", seg[:2])[0]
            elif marker == 0xDA:         # SOS
                if frame is None:
                    return None
                ns = seg[0]
                scan = {}
                order = []
                for c in range(ns):
                    cid, tabs = seg[1 + 2 * c:3 + 2 * c]
                    scan[cid] = (tabs >> 4, tabs & 0xF)
                    order.append(cid)
                if not frame["progressive"]:
                    return _decode_scan(b, i + 2 + seg_len, frame, scan,
                                        quant, huff_dc, huff_ac,
                                        restart_interval)
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ah_al = seg[3 + 2 * ns]
                if store is None:
                    store = _prog_store(frame)
                nxt = _progressive_scan(
                    b, i + 2 + seg_len, frame, order, scan, store,
                    huff_dc, huff_ac, restart_interval,
                    ss, se, ah_al >> 4, ah_al & 0xF)
                if nxt is None:
                    return None
                i = nxt
                continue
            i += 2 + seg_len
    except (struct.error, IndexError, KeyError):
        return None
    if store is not None:
        return _prog_finalize(frame, store, quant)
    return None


def _decode_scan(b, pos, frame, scan, quant, huff_dc, huff_ac,
                 restart_interval):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or w < 1 or h < 1:
        return None
    y_comp = comps[0]                    # first component is luma
    interleaved = len(comps) > 1
    if interleaved:
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
    else:
        mcus_x = -(-w // 8)
        mcus_y = -(-h // 8)
    yw = -(-w * y_comp["h"] // hmax) if interleaved else w
    yh = -(-h * y_comp["v"] // vmax) if interleaved else h
    # Y plane in block granularity
    blocks_x = mcus_x * (y_comp["h"] if interleaved else 1)
    blocks_y = mcus_y * (y_comp["v"] if interleaved else 1)
    plane = [[0] * (blocks_x * 8) for _ in range(blocks_y * 8)]
    reader = _BitReader(b, pos)
    preds = {c["id"]: 0 for c in comps}
    yq = quant.get(y_comp["q"])
    if yq is None:
        return None
    mcu_index = 0
    try:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_index and \
                        mcu_index % restart_interval == 0:
                    try:
                        reader.sync_restart()
                    except EOFError:
                        return None
                    preds = {c["id"]: 0 for c in comps}
                mcu_index += 1
                for ci, c in enumerate(comps):
                    if c["id"] not in scan:
                        return None
                    dc_t, ac_t = scan[c["id"]]
                    ch = c["h"] if interleaved else 1
                    cv = c["v"] if interleaved else 1
                    for by in range(cv):
                        for bx in range(ch):
                            try:
                                coefs, preds[c["id"]] = _decode_block(
                                    reader, huff_dc[dc_t], huff_ac[ac_t],
                                    preds[c["id"]])
                            except _RestartMarker:
                                # tolerate encoders emitting RST early:
                                # treat as corrupt (out of scope)
                                return None
                            if ci == 0:  # only luma reaches pixels
                                px = _idct_block(coefs, yq)
                                oy = (my * cv + by) * 8
                                ox = (mx * ch + bx) * 8
                                for r in range(8):
                                    plane[oy + r][ox:ox + 8] = px[r]
    except (EOFError, KeyError):
        return None
    return [row[:yw] for row in plane[:yh]]


# ----------------------------------------------------------------------
# progressive (SOF2) scan machinery — T.81 annex G.1.2
# ----------------------------------------------------------------------

def _prog_geometry(frame):
    """Per-component block geometry: MCU-padded grid (interleaved
    scans) and the component's own non-padded grid (AC / single-
    component scans iterate that one, per G.1)."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    geo = {}
    for c in comps:
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        geo[c["id"]] = {
            "pad_x": mcus_x * c["h"], "pad_y": mcus_y * c["v"],
            "nb_x": -(-cw // 8), "nb_y": -(-ch // 8),
            "w": cw, "h": ch,
        }
    return mcus_x, mcus_y, geo


def _prog_store(frame):
    """Zigzag-ordered coefficient blocks for every component, sized to
    the MCU-padded grid (DC scans may cover padding blocks)."""
    _, _, geo = _prog_geometry(frame)
    return {cid: [[[0] * 64 for _ in range(g["pad_x"])]
                  for _ in range(g["pad_y"])]
            for cid, g in geo.items()}


def _ac_first_block(reader, ac_tab, coefs, ss, se, al, eobrun):
    """G.1.2.2: first scan of an AC band — run/size pairs with EOB
    runs spanning blocks; coefficients land point-transformed (<<al)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(reader, ac_tab)
        run, size = rs >> 4, rs & 0xF
        if size == 0:
            if run == 15:                # ZRL
                k += 16
                continue
            return (1 << run) - 1 + (reader.bits(run) if run else 0)
        k += run
        if k > se:
            break                        # corrupt band: out of scope
        coefs[k] = _extend(reader.bits(size), size) << al
        k += 1
    return 0


def _ac_refine_block(reader, ac_tab, coefs, ss, se, al, eobrun):
    """G.1.2.3: AC successive-approximation refinement — one new bit
    for every already-nonzero coefficient, ±(1<<al) for newly
    significant ones, EOB runs still correcting history bits."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huff(reader, ac_tab)
            run, size = rs >> 4, rs & 0xF
            if size == 0 and run != 15:
                eobrun = (1 << run) + (reader.bits(run) if run else 0)
                break
            newval = 0
            if size:                     # per spec size is 1 here
                newval = p1 if reader.bit() else -p1
            while k <= se:
                if coefs[k] != 0:
                    if reader.bit() and not (coefs[k] & p1):
                        coefs[k] += p1 if coefs[k] >= 0 else -p1
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if size and k <= se:
                coefs[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if coefs[k] != 0:
                if reader.bit() and not (coefs[k] & p1):
                    coefs[k] += p1 if coefs[k] >= 0 else -p1
            k += 1
        eobrun -= 1
    return eobrun


def _progressive_scan(b, pos, frame, order, scan, store, huff_dc,
                      huff_ac, restart_interval, ss, se, ah, al):
    """Process one progressive scan into the coefficient store and
    return the byte offset of the next marker segment (None = corrupt
    / out of scope)."""
    comps = [c for cid in order for c in frame["comps"] if c["id"] == cid]
    if not comps or (ss > 0 and len(comps) != 1):
        return None
    mcus_x, mcus_y, geo = _prog_geometry(frame)
    reader = _BitReader(b, pos)
    preds = {c["id"]: 0 for c in comps}
    eobrun = 0
    unit = 0

    def restart_due():
        nonlocal preds, eobrun
        if restart_interval and unit and unit % restart_interval == 0:
            reader.sync_restart()
            preds = {c["id"]: 0 for c in comps}
            eobrun = 0

    try:
        if ss == 0:                      # DC scan (both passes)
            interleaved = len(comps) > 1
            if interleaved:
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        restart_due()
                        unit += 1
                        for c in comps:
                            dc_t, _ = scan[c["id"]]
                            for by in range(c["v"]):
                                for bx in range(c["h"]):
                                    coefs = store[c["id"]][my * c["v"] + by][mx * c["h"] + bx]
                                    if ah == 0:
                                        size = _decode_huff(reader, huff_dc[dc_t])
                                        preds[c["id"]] += _extend(reader.bits(size), size)
                                        coefs[0] = preds[c["id"]] << al
                                    elif reader.bit():
                                        coefs[0] |= 1 << al
            else:
                c = comps[0]
                g = geo[c["id"]]
                dc_t, _ = scan[c["id"]]
                for by in range(g["nb_y"]):
                    for bx in range(g["nb_x"]):
                        restart_due()
                        unit += 1
                        coefs = store[c["id"]][by][bx]
                        if ah == 0:
                            size = _decode_huff(reader, huff_dc[dc_t])
                            preds[c["id"]] += _extend(reader.bits(size), size)
                            coefs[0] = preds[c["id"]] << al
                        elif reader.bit():
                            coefs[0] |= 1 << al
        else:                            # AC scan: single component
            c = comps[0]
            g = geo[c["id"]]
            _, ac_t = scan[c["id"]]
            tab = huff_ac[ac_t]
            block_fn = _ac_first_block if ah == 0 else _ac_refine_block
            for by in range(g["nb_y"]):
                for bx in range(g["nb_x"]):
                    restart_due()
                    unit += 1
                    eobrun = block_fn(reader, tab, store[c["id"]][by][bx],
                                      ss, se, al, eobrun)
    except (EOFError, _RestartMarker, KeyError):
        return None
    # next marker: first 0xFF not followed by stuffing or a restart
    p = reader.pos
    while p + 1 < len(b):
        if b[p] == 0xFF and b[p + 1] != 0x00 \
                and not (0xD0 <= b[p + 1] <= 0xD7):
            return p
        p += 1
    return None


def _prog_finalize(frame, store, quant):
    """Dequant + IDCT the accumulated luma coefficients (chroma never
    reaches pixels, as in the sequential path) and crop."""
    y_comp = frame["comps"][0]
    yq = quant.get(y_comp["q"])
    if yq is None:
        return None
    g = _prog_geometry(frame)[2][y_comp["id"]]
    plane = [[0] * (g["pad_x"] * 8) for _ in range(g["pad_y"] * 8)]
    for by in range(g["pad_y"]):
        for bx in range(g["pad_x"]):
            px = _idct_block(store[y_comp["id"]][by][bx], yq)
            for r in range(8):
                plane[by * 8 + r][bx * 8:bx * 8 + 8] = px[r]
    return [row[:g["w"]] for row in plane[:g["h"]]]


# ----------------------------------------------------------------------
# encoder (test fixtures)
# ----------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        for k in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)          # byte stuffing
                self.acc = self.n = 0

    def flush(self):
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = self.n = 0


def _fdct_block(pixels):
    """Forward DCT of one 8x8 pixel block (level-shifted), separable —
    the exact inverse of _idct_block's basis (each _COS factor already
    carries the C/2 normalization, so the two passes compose to the
    spec's C(u)C(v)/4)."""
    shifted = [[p - 128.0 for p in row] for row in pixels]
    tmp = [[sum(shifted[y][x] * _COS[u][x] for x in range(8))
            for u in range(8)] for y in range(8)]
    return [[sum(tmp[y][u] * _COS[v][y] for y in range(8))
             for u in range(8)] for v in range(8)]


def _mag_bits(v: int):
    """(size, raw bits) encoding of a coefficient value (F.1.2.1)."""
    size = abs(v).bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, v & ((1 << size) - 1)


def _quantize_block(pixels, qtab):
    """FDCT + quantize one 8x8 pixel block to zigzag-ordered ints."""
    co = _fdct_block(pixels)
    return [int(round(co[ZIGZAG[i] // 8][ZIGZAG[i] % 8] / qtab[i]))
            for i in range(64)]


def _encode_block(wtr, pixels, qtab, dc_enc, ac_enc, pred):
    zz = _quantize_block(pixels, qtab)
    size, bits = _mag_bits(zz[0] - pred)
    code, length = dc_enc[size]
    wtr.write(code, length)
    if size:
        wtr.write(bits, size)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        if zz[i] == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_enc[0xF0]
            wtr.write(code, length)
            run -= 16
        size, bits = _mag_bits(zz[i])
        code, length = ac_enc[(run << 4) | size]
        wtr.write(code, length)
        wtr.write(bits, size)
        run = 0
    if last_nz < 63:
        code, length = ac_enc[0x00]
        wtr.write(code, length)
    return zz[0]


def _dqt_segment(tid: int, table) -> bytes:
    return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(table)


def _dht_segment(cls: int, tid: int, spec) -> bytes:
    bits, vals = spec
    payload = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload


def _block_at(plane, y0, x0):
    h, w = len(plane), len(plane[0])
    return [[plane[min(y0 + r, h - 1)][min(x0 + c, w - 1)]
             for c in range(8)] for r in range(8)]


def make_test_jpeg(luma, chroma=None, sampling=(1, 1),
                   restart_interval: int = 0) -> bytes:
    """Encode a REAL decodable baseline JPEG — stdlib only. ``luma``:
    rows of ints in [0,255]. ``chroma``: None for grayscale (one
    component) or a constant (cb, cr) pair for a 3-component YCbCr
    image; ``sampling``: the Y component's (h, v) factors — (1, 1) =
    4:4:4, (2, 2) = 4:2:0 — chroma always (1, 1).
    ``restart_interval``: emit a DRI segment and RSTn markers every N
    MCUs (resets DC prediction, byte-aligned). Uses the annex-K
    example quantization and huffman tables."""
    h, w = len(luma), len(luma[0])
    sh, sv = sampling
    dc_l = _build_encode_table(*STD_DC_LUMA)
    ac_l = _build_encode_table(*STD_AC_LUMA)
    dc_c = _build_encode_table(*STD_DC_CHROMA)
    ac_c = _build_encode_table(*STD_AC_CHROMA)
    # the spec stores quant tables in zigzag order; STD_*_QUANT above are
    # raster order, so permute once here and emit the zigzag form
    ql = [STD_LUMA_QUANT[ZIGZAG[i]] for i in range(64)]
    qc = [STD_CHROMA_QUANT[ZIGZAG[i]] for i in range(64)]
    out = bytearray(b"\xff\xd8")
    out += _dqt_segment(0, ql)
    ncomp = 1 if chroma is None else 3
    if ncomp == 3:
        out += _dqt_segment(1, qc)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    sof += bytes([1, (sh << 4) | sv, 0])
    if ncomp == 3:
        sof += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0, 0, STD_DC_LUMA) + _dht_segment(1, 0, STD_AC_LUMA)
    if ncomp == 3:
        out += _dht_segment(0, 1, STD_DC_CHROMA) + _dht_segment(1, 1, STD_AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp, 1, 0x00])
    if ncomp == 3:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    wtr = _BitWriter()
    preds = [0, 0, 0]
    mcu_index = 0

    def maybe_restart():
        nonlocal mcu_index, preds
        if restart_interval and mcu_index and mcu_index % restart_interval == 0:
            wtr.flush()
            wtr.out += bytes([0xFF, 0xD0 + (mcu_index // restart_interval - 1) % 8])
            preds = [0, 0, 0]
        mcu_index += 1

    if ncomp == 1:
        for y0 in range(0, h, 8):
            for x0 in range(0, w, 8):
                maybe_restart()
                preds[0] = _encode_block(wtr, _block_at(luma, y0, x0), ql,
                                         dc_l, ac_l, preds[0])
    else:
        cb, cr = chroma
        cw, ch_ = -(-w // sh), -(-h // sv)
        cb_plane = [[cb] * cw for _ in range(ch_)]
        cr_plane = [[cr] * cw for _ in range(ch_)]
        for my in range(-(-h // (8 * sv))):
            for mx in range(-(-w // (8 * sh))):
                maybe_restart()
                for by in range(sv):
                    for bx in range(sh):
                        preds[0] = _encode_block(
                            wtr, _block_at(luma, (my * sv + by) * 8,
                                           (mx * sh + bx) * 8),
                            ql, dc_l, ac_l, preds[0])
                preds[1] = _encode_block(wtr, _block_at(cb_plane, my * 8, mx * 8),
                                         qc, dc_c, ac_c, preds[1])
                preds[2] = _encode_block(wtr, _block_at(cr_plane, my * 8, mx * 8),
                                         qc, dc_c, ac_c, preds[2])
    wtr.flush()
    out += wtr.out + b"\xff\xd9"
    return bytes(out)


# ----------------------------------------------------------------------
# progressive encoder (test fixtures) — T.81 annex G.1.2 mirror
# ----------------------------------------------------------------------

# The annex-K AC tables define only EOB(0x00) and ZRL(0xF0) among the
# size-0 symbols — baseline never emits EOB runs. Progressive scans
# need EOBn (r<<4, r=0..14), so fixtures carry their own AC table: all
# 192 possible symbols (EOBn + ZRL + run/size for sizes 1..11) at a
# flat 8-bit length — 192/256 keeps Kraft < 1 and leaves the all-ones
# code unused, as the spec requires.
PROG_AC = ([0, 0, 0, 0, 0, 0, 0, 192, 0, 0, 0, 0, 0, 0, 0, 0],
           [r << 4 for r in range(16)]
           + [(r << 4) | s for r in range(16) for s in range(1, 12)])

class _ProgScanWriter:
    """Per-scan bit emitter with the cross-block EOB-run + buffered
    correction-bit state of G.1.2.2/G.1.2.3."""

    def __init__(self):
        self.w = _BitWriter()
        self.eobrun = 0
        self.bits = []                   # correction bits inside the run

    def flush_eobrun(self):
        if self.eobrun == 0 and not self.bits:
            return
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            code, length = self._ac_enc[r << 4]
            self.w.write(code, length)
            if r:
                self.w.write(self.eobrun - (1 << r), r)
        for bit in self.bits:
            self.w.write(bit, 1)
        self.eobrun = 0
        self.bits = []

    def restart(self, idx: int):
        self.flush_eobrun()
        self.w.flush()
        self.w.out += bytes([0xFF, 0xD0 + idx % 8])


def _emit_ac_first(sw: _ProgScanWriter, zz, ss, se, al, ac_enc):
    """One block of a first AC scan (point transform = truncate toward
    zero), folding all-zero tails into the scan's EOB run."""
    sw._ac_enc = ac_enc
    vals = []
    for k in range(ss, se + 1):
        c = zz[k]
        vals.append(-((-c) >> al) if c < 0 else c >> al)
    last_nz = max((i for i, v in enumerate(vals) if v), default=-1)
    if last_nz < 0:
        sw.eobrun += 1
        if sw.eobrun == 0x7FFF:
            sw.flush_eobrun()
        return
    sw.flush_eobrun()
    run = 0
    for v in vals[:last_nz + 1]:
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_enc[0xF0]
            sw.w.write(code, length)
            run -= 16
        size, bits = _mag_bits(v)
        code, length = ac_enc[(run << 4) | size]
        sw.w.write(code, length)
        sw.w.write(bits, size)
        run = 0
    if last_nz < se - ss:
        sw.eobrun += 1
        if sw.eobrun == 0x7FFF:
            sw.flush_eobrun()


def _emit_ac_refine(sw: _ProgScanWriter, zz, ss, se, al, ac_enc):
    """One block of an AC refinement scan (G.1.2.3): ±1 symbols for
    newly significant coefficients, correction bits for history ones —
    bits after the last new coefficient ride the EOB-run buffer."""
    sw._ac_enc = ac_enc
    absv = [abs(zz[k]) >> al for k in range(ss, se + 1)]
    eob = max((i for i, t in enumerate(absv) if t == 1), default=-1)
    run = 0
    pending = []
    for i, t in enumerate(absv):
        if t == 0:
            run += 1
            continue
        # ZRLs are due at the NEXT nonzero coefficient once the zero
        # run passes 15 — flushing only the correction bits buffered
        # so far (the decoder reads them interleaved while advancing
        # over this ZRL's 16-zero span). Beyond the last newly
        # significant coefficient the run folds into the EOB run
        # instead (the spec's k <= EOB guard).
        while run > 15 and i <= eob:
            sw.flush_eobrun()
            code, length = ac_enc[0xF0]
            sw.w.write(code, length)
            run -= 16
            for bit in pending:
                sw.w.write(bit, 1)
            pending = []
        if t > 1:
            pending.append(t & 1)
            continue
        # newly significant (t == 1); i <= eob by construction
        sw.flush_eobrun()
        code, length = ac_enc[(run << 4) | 1]
        sw.w.write(code, length)
        sw.w.write(1 if zz[ss + i] > 0 else 0, 1)
        for bit in pending:
            sw.w.write(bit, 1)
        pending = []
        run = 0
    if run > 0 or pending:
        sw.eobrun += 1
        sw.bits.extend(pending)
        if sw.eobrun == 0x7FFF:
            sw.flush_eobrun()


def make_test_jpeg_progressive(luma, chroma=None, sampling=(1, 1),
                               restart_interval: int = 0) -> bytes:
    """Encode a REAL decodable progressive (SOF2) JPEG — stdlib only,
    same inputs as make_test_jpeg. Scan script (the libjpeg-style
    shape): interleaved DC first at Al=1; per-component first AC scans
    at Al=1 (luma band split 1-5 / 6-63); per-component AC refinement
    to Al=0; DC refinement to Al=0. Progressive coding is a lossless
    re-encoding of the same quantized coefficients, so
    decode_jpeg_luma of this stream must equal decode_jpeg_luma of
    make_test_jpeg(same inputs) EXACTLY — that identity is the test
    oracle. ``restart_interval`` emits DRI + RSTn in every scan."""
    h, w = len(luma), len(luma[0])
    sh, sv = sampling
    ncomp = 1 if chroma is None else 3
    dc_l = _build_encode_table(*STD_DC_LUMA)
    dc_c = _build_encode_table(*STD_DC_CHROMA)
    ac_p = _build_encode_table(*PROG_AC)
    ql = [STD_LUMA_QUANT[ZIGZAG[i]] for i in range(64)]
    qc = [STD_CHROMA_QUANT[ZIGZAG[i]] for i in range(64)]
    mcus_x, mcus_y = -(-w // (8 * sh)), -(-h // (8 * sv))

    # quantized zigzag blocks on each component's MCU-padded grid
    yb = [[_quantize_block(_block_at(luma, by * 8, bx * 8), ql)
           for bx in range(mcus_x * sh)] for by in range(mcus_y * sv)]
    comps = [{"grid": yb, "nb_x": -(-w // 8), "nb_y": -(-h // 8),
              "h": sh, "v": sv, "dc": dc_l, "ac": ac_p,
              "dc_id": 0, "ac_id": 0}]
    if ncomp == 3:
        cb, cr = chroma
        cw, ch_ = -(-w // sh), -(-h // sv)
        for const in (cb, cr):
            plane = [[const] * cw for _ in range(ch_)]
            grid = [[_quantize_block(_block_at(plane, by * 8, bx * 8), qc)
                     for bx in range(mcus_x)] for by in range(mcus_y)]
            comps.append({"grid": grid, "nb_x": -(-cw // 8),
                          "nb_y": -(-ch_ // 8), "h": 1, "v": 1,
                          "dc": dc_c, "ac": ac_p, "dc_id": 1, "ac_id": 0})

    out = bytearray(b"\xff\xd8")
    out += _dqt_segment(0, ql)
    if ncomp == 3:
        out += _dqt_segment(1, qc)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    sof += bytes([1, (sh << 4) | sv, 0])
    if ncomp == 3:
        sof += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0, 0, STD_DC_LUMA) + _dht_segment(1, 0, PROG_AC)
    if ncomp == 3:
        out += _dht_segment(0, 1, STD_DC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    def sos_header(comp_ids, ss, se, ah, al):
        seg = bytes([len(comp_ids)])
        for cid in comp_ids:
            c = comps[cid - 1]
            seg += bytes([cid, (c["dc_id"] << 4) | c["ac_id"]])
        seg += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(seg)) + seg

    def dc_scan(ah, al):
        nonlocal out
        out += sos_header(list(range(1, ncomp + 1)), 0, 0, ah, al)
        sw = _ProgScanWriter()
        preds = [0] * ncomp
        rst = 0

        def emit_dc(ci, c0):
            if ah == 0:
                v = c0 >> al
                size, bits = _mag_bits(v - preds[ci])
                code, length = comps[ci]["dc"][size]
                sw.w.write(code, length)
                if size:
                    sw.w.write(bits, size)
                preds[ci] = v
            else:
                sw.w.write((c0 >> al) & 1, 1)

        if ncomp == 1:
            # single-component scan: non-interleaved over the
            # component's own (non-padded) block grid, per G.1/A.2
            c = comps[0]
            for by in range(c["nb_y"]):
                for bx in range(c["nb_x"]):
                    unit = by * c["nb_x"] + bx
                    if restart_interval and unit and \
                            unit % restart_interval == 0:
                        sw.restart(rst)
                        rst += 1
                        preds = [0]
                    emit_dc(0, c["grid"][by][bx][0])
        else:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    unit = my * mcus_x + mx
                    if restart_interval and unit and \
                            unit % restart_interval == 0:
                        sw.restart(rst)
                        rst += 1
                        preds = [0] * ncomp
                    for ci, c in enumerate(comps):
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                emit_dc(ci, c["grid"][my * c["v"] + by][mx * c["h"] + bx][0])
        sw.w.flush()
        out += sw.w.out

    def ac_scan(cid, ss, se, ah, al):
        nonlocal out
        out += sos_header([cid], ss, se, ah, al)
        c = comps[cid - 1]
        sw = _ProgScanWriter()
        emit = _emit_ac_first if ah == 0 else _emit_ac_refine
        rst = 0
        for by in range(c["nb_y"]):
            for bx in range(c["nb_x"]):
                unit = by * c["nb_x"] + bx
                if restart_interval and unit and \
                        unit % restart_interval == 0:
                    sw.restart(rst)
                    rst += 1
                emit(sw, c["grid"][by][bx], ss, se, al, c["ac"])
        sw.flush_eobrun()
        sw.w.flush()
        out += sw.w.out

    dc_scan(0, 1)
    ac_scan(1, 1, 5, 0, 1)
    ac_scan(1, 6, 63, 0, 1)
    for cid in range(2, ncomp + 1):
        ac_scan(cid, 1, 63, 0, 1)
    for cid in range(1, ncomp + 1):
        ac_scan(cid, 1, 63, 1, 0)
    dc_scan(1, 0)
    out += b"\xff\xd9"
    return bytes(out)
