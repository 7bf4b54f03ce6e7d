"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs, processed through Arrow-batched
``mapInPandas`` UDFs.

Pixel/sample decode is REAL and codec-free for the formats where the
math is stdlib-expressible: PNG (decode_png: zlib inflate + all five
scanline filters), GIF (decode_gif: pure-Python appendix-F LZW),
baseline AND progressive JPEG (jpegdec.decode_jpeg_luma: huffman +
dequant + IDCT, SOF2 multi-scan coefficient accumulation, luma plane
only), lossless WebP (vp8ldec.decode_webp_lossless: the full VP8L
bitstream — huffman groups, color cache, LZ77, all four transforms),
and WAV (decode_wav_pcm: PCM/float samples are raw
struct data) — so phash/mean_luma are true pixel features for
PNG/GIF/JPEG/WebP-lossless and loudness/peak/zcr are true signal
features for WAV.
FLAC is fully stdlib-expressible too (decode_flac_pcm: bit-level
Rice/fixed/LPC subframe decode per RFC 9639 — no DSP tables, just
integer predictors), so signal features are REAL for FLAC as well.
The remaining codecs (lossy VP8/AV1 pixels, ffmpeg frames, MP3
samples) are NOT in this container, so those kernels stay stubbed:
they raise NotImplementedError unless ``fake=True``, in which case a
deterministic fake decoder (seeded by content hash) produces stable
feature rows. Everything Spark-side —
schema, partitioning, UDF signatures, batch shapes — is real and
tested; swapping in a real codec is a one-function change inside the
UDF.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id string, width int, height int, n_bytes long, "
    "phash string, mean_luma double"
)

FRAME_SAMPLE_SCHEMA = "media_id string, frame_idx int, ts_ms int, frame_phash string"


def parse_image_header(payload) -> tuple[str, int, int] | None:
    """REAL image metadata from container headers — pure-stdlib struct
    reads, no codec needed: PNG IHDR, GIF logical-screen descriptor,
    JPEG SOF segment walk. Returns (mime, width, height) or None when
    the payload isn't a recognizable image container."""
    if not payload:
        return None
    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        w, h = struct.unpack(">II", b[16:24])
        return ("image/png", w, h)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return ("image/gif", w, h)
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP" and len(b) >= 30:
        # WebP (RIFF): VP8 lossy (sync 9D 01 2A, 14-bit dims), VP8L
        # lossless (sig 0x2F, packed 14-bit dims-1), VP8X extended
        # (24-bit LE canvas dims-1)
        fourcc = b[12:16]
        if fourcc == b"VP8 " and b[23:26] == b"\x9d\x01\x2a":
            w = struct.unpack("<H", b[26:28])[0] & 0x3FFF
            h = struct.unpack("<H", b[28:30])[0] & 0x3FFF
            return ("image/webp", w, h)
        if fourcc == b"VP8L" and b[20] == 0x2F:
            bits = int.from_bytes(b[21:25], "little")
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            return ("image/webp", w, h)
        if fourcc == b"VP8X":
            w = int.from_bytes(b[24:27], "little") + 1
            h = int.from_bytes(b[27:30], "little") + 1
            return ("image/webp", w, h)
        return None
    if b[:2] == b"\xff\xd8":
        i, n = 2, len(b)
        while i + 9 <= n:
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if i + 4 > n:
                return None
            seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > n:
                    return None
                h, w = struct.unpack(">HH", b[i + 5:i + 9])
                return ("image/jpeg", w, h)
            i += 2 + seg_len
    return None


def make_test_png(width: int, height: int, rgb=(200, 30, 30)) -> bytes:
    """A complete, valid solid-color PNG (signature + IHDR + IDAT + IEND
    with correct CRCs) — stdlib-only fixture bytes for tests."""
    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(rgb) * width for _ in range(height))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def make_test_jpeg_header(width: int, height: int) -> bytes:
    """Minimal JPEG byte prefix (SOI + APP0/JFIF + SOF0 + EOI): enough
    container structure for header parsing; not a decodable image."""
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, height, width, 3) + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    return (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
            + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
            + b"\xff\xd9")


def decode_png(payload):
    """REAL pixel decode for PNG — pure stdlib (zlib inflate + scanline
    unfiltering), no codec needed: 8-bit gray / gray+alpha / RGB / RGBA /
    palette, non-interlaced (the overwhelming majority of web PNGs).
    Returns a list of rows of luma ints in [0,255] (Rec.601 on RGB,
    palette resolved, alpha ignored), or None when the payload is not a
    PNG this decoder covers (16-bit, interlaced, truncated) — callers
    fall back to the fake/raise path exactly as before. Implements all
    five PNG filter types (None/Sub/Up/Average/Paeth, RFC 2083 §6)."""
    if not isinstance(payload, (bytes, bytearray)) or not payload.startswith(
            b"\x89PNG\r\n\x1a\n"):
        return None
    pos, idat, w = 8, [], None
    bitdepth = ctype = interlace = 0
    plte = b""
    try:
        while pos + 8 <= len(payload):
            ln = int.from_bytes(payload[pos:pos + 4], "big")
            typ = payload[pos + 4:pos + 8]
            data = payload[pos + 8:pos + 8 + ln]
            if typ == b"IHDR":
                w, h, bitdepth, ctype, _, _, interlace = struct.unpack(
                    ">IIBBBBB", data)
            elif typ == b"PLTE":
                plte = data
            elif typ == b"IDAT":
                idat.append(data)
            elif typ == b"IEND":
                break
            pos += 12 + ln
        nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
        if w is None or bitdepth != 8 or interlace or nch is None:
            return None
        raw = zlib.decompress(b"".join(idat))
    except Exception:
        return None
    stride = w * nch
    if len(raw) < h * (stride + 1):
        return None
    lumas, prev, pos = [], bytearray(stride), 0
    for _y in range(h):
        f = raw[pos]
        line = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        if f == 1:                                    # Sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 0xFF
        elif f == 2:                                  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:                                  # Average
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:                                  # Paeth
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                b, c = prev[i], (prev[i - nch] if i >= nch else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif f != 0:
            return None
        if ctype == 0:
            row = list(line)
        elif ctype == 4:
            row = list(line[0::2])
        elif ctype == 3:
            row = [round(0.299 * plte[3 * v] + 0.587 * plte[3 * v + 1]
                         + 0.114 * plte[3 * v + 2]) if 3 * v + 2 < len(plte)
                   else 0 for v in line]
        else:  # 2 = RGB, 6 = RGBA
            row = [round(0.299 * line[i] + 0.587 * line[i + 1]
                         + 0.114 * line[i + 2])
                   for i in range(0, stride, nch)]
        lumas.append(row)
        prev = line
    return lumas


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int):
    """GIF-variant LZW decompress (GIF89a spec appendix F) — pure
    stdlib: LSB-first variable-width codes, clear/end codes, code width
    growing at dict size 2^width up to 12 bits. Returns the pixel index
    list (truncated/padded behavior: stops at n_pixels or end code), or
    None on a corrupt stream."""
    clear = 1 << min_code_size
    end = clear + 1
    out = []
    table = []
    width = min_code_size + 1
    next_code = end + 1
    prev = None
    acc = nbits = 0

    def reset():
        nonlocal table, width, next_code, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        next_code = end + 1
        prev = None

    reset()
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                continue
            if code == end:
                return out[:n_pixels]
            if code < len(table):
                entry = table[code]
            elif code == next_code and prev is not None:
                entry = prev + prev[:1]
            else:
                return None
            out.extend(entry)
            if prev is not None and next_code < 4096:
                table.append(prev + entry[:1])
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
            if len(out) >= n_pixels:
                return out[:n_pixels]
    return out[:n_pixels] if out else None


def decode_gif(payload):
    """REAL pixel decode for GIF — pure stdlib (the GIF-variant LZW of
    appendix F is ~40 lines; no codec library involved): first frame,
    global or local color table, interlace supported, transparency
    ignored (features want luma, not alpha). Returns a list of rows of
    luma ints in [0,255] (palette resolved via Rec.601), or None when
    the payload isn't a GIF this decoder covers."""
    if not isinstance(payload, (bytes, bytearray)) \
            or bytes(payload[:6]) not in (b"GIF87a", b"GIF89a"):
        return None
    b = bytes(payload)
    try:
        flags = b[10]
        pos = 13
        gct = b""
        if flags & 0x80:
            n = 2 << (flags & 0x07)
            gct = b[pos:pos + 3 * n]
            pos += 3 * n
        while pos < len(b):
            blk = b[pos]
            if blk == 0x21:                      # extension: skip sub-blocks
                pos += 2
                while b[pos]:
                    pos += 1 + b[pos]
                pos += 1
            elif blk == 0x2C:                    # image descriptor
                w, h = struct.unpack("<HH", b[pos + 5:pos + 9])
                iflags = b[pos + 9]
                pos += 10
                pal = gct
                if iflags & 0x80:                # local color table
                    n = 2 << (iflags & 0x07)
                    pal = b[pos:pos + 3 * n]
                    pos += 3 * n
                min_code = b[pos]
                pos += 1
                data = bytearray()
                while b[pos]:
                    data += b[pos + 1:pos + 1 + b[pos]]
                    pos += 1 + b[pos]
                idx = _gif_lzw_decode(bytes(data), min_code, w * h)
                if idx is None or len(idx) < w * h or not pal or w == 0:
                    return None
                luma = [round(0.299 * pal[3 * v] + 0.587 * pal[3 * v + 1]
                              + 0.114 * pal[3 * v + 2])
                        if 3 * v + 2 < len(pal) else 0 for v in idx]
                rows = [luma[y * w:(y + 1) * w] for y in range(h)]
                if iflags & 0x40:                # deinterlace (4 passes)
                    order = ([*range(0, h, 8)] + [*range(4, h, 8)]
                             + [*range(2, h, 4)] + [*range(1, h, 2)])
                    out = [None] * h
                    for src, dst in enumerate(order):
                        out[dst] = rows[src]
                    rows = out
                return rows
            else:                                # trailer (0x3B) or junk
                return None
    except (IndexError, struct.error):
        return None
    return None


def _gif_lzw_encode(indices, min_code_size: int) -> bytes:
    """GIF-variant LZW compress (inverse of _gif_lzw_decode) so tests
    can build REAL decodable GIF fixtures stdlib-only."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code, width):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    width = min_code_size + 1
    next_code = end + 1
    emit(clear, width)
    w = b""
    for v in indices:
        wc = w + bytes([v])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[wc] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            width = min_code_size + 1
            next_code = end + 1
        w = bytes([v])
    if w:
        emit(table[w], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def make_test_gif(width: int, height: int, palette, indices,
                  interlace: bool = False) -> bytes:
    """A complete, valid GIF89a (header + GCT + image + REAL LZW-coded
    pixel data + trailer) — stdlib-only fixture bytes. ``palette``:
    list of (r,g,b); ``indices``: row-major palette indices."""
    n = max(2, len(palette))
    bits = max(1, (n - 1).bit_length())
    n_slots = 1 << bits
    gct = b"".join(bytes(c) for c in palette) + b"\x00" * (3 * (n_slots - len(palette)))
    lsd = struct.pack("<HHBBB", width, height, 0xF0 | (bits - 1), 0, 0)
    min_code = max(2, bits)
    lzw = _gif_lzw_encode(list(indices), min_code)
    sub = b"".join(
        bytes([len(lzw[i:i + 255])]) + lzw[i:i + 255]
        for i in range(0, len(lzw), 255)
    )
    idesc = struct.pack("<BHHHHB", 0x2C, 0, 0, width, height,
                        0x40 if interlace else 0)
    return (b"GIF89a" + lsd + gct + idesc + bytes([min_code]) + sub
            + b"\x00" + b"\x3B")


def _box_resample(lumas, out_w: int, out_h: int):
    """Box-average downsample of a luma grid to (out_w, out_h) — the
    standard dHash pre-step; each output cell averages its source box."""
    h, w = len(lumas), len(lumas[0])
    out = []
    for oy in range(out_h):
        y0, y1 = (oy * h) // out_h, max(((oy + 1) * h) // out_h, (oy * h) // out_h + 1)
        row = []
        for ox in range(out_w):
            x0, x1 = (ox * w) // out_w, max(((ox + 1) * w) // out_w, (ox * w) // out_w + 1)
            s = sum(lumas[y][x] for y in range(y0, min(y1, h))
                    for x in range(x0, min(x1, w)))
            row.append(s / ((min(y1, h) - y0) * (min(x1, w) - x0)))
        out.append(row)
    return out


def real_image_features(payload) -> dict | None:
    """Pixel-level features from a REAL decode (PNG, GIF, baseline +
    progressive JPEG, and lossless WebP — all pure stdlib: zlib,
    appendix-F LZW, huffman+IDCT with SOF2 multi-scan accumulation,
    and the VP8L bitstream incl. its four transforms): mean_luma =
    mean(luma)/255, phash = 64-bit row-major dHash over a
    9x8 box-resampled luma grid (bit y*8+x, MSB-first, = 1 iff
    grid[y][x+1] > grid[y][x] — a strictly left-to-right-brightening
    image hashes to all-ones, a vertical gradient to all-zeros; both
    asserted analytically in tests). Returns None for lossy-VP8/
    uncovered payloads. The pure-Python decode paths trade speed for
    zero dependencies — at production scale swap in libjpeg/libwebp
    bindings inside the same mapInPandas kernel."""
    lumas = decode_png(payload)
    if lumas is None:
        lumas = decode_gif(payload)
    if lumas is None:
        from librecrawl_spark.operators.jpegdec import decode_jpeg_luma
        lumas = decode_jpeg_luma(payload)
    if lumas is None:
        from librecrawl_spark.operators.vp8ldec import decode_webp_lossless
        rgba = decode_webp_lossless(payload)
        if rgba is not None:
            lumas = [[round(0.299 * r + 0.587 * g + 0.114 * b)
                      for (r, g, b, _a) in row] for row in rgba]
    if not lumas or not lumas[0]:
        return None
    n = sum(len(r) for r in lumas)
    mean = sum(map(sum, lumas)) / n
    grid = _box_resample(lumas, 9, 8)
    bits = 0
    for y in range(8):
        for x in range(8):
            bits = (bits << 1) | (1 if grid[y][x + 1] > grid[y][x] else 0)
    return {"width": len(lumas[0]), "height": len(lumas),
            "mean_luma": round(mean / 255.0, 6), "phash": f"{bits:016x}"}


def _fake_decode(payload: bytes) -> dict:
    """Deterministic fake decoder: derives stable 'pixels' from the
    content hash. Stands in for PIL.Image.open until codecs exist."""
    h = hashlib.sha256(payload or b"").digest()
    return {
        "width": 16 + h[0],
        "height": 16 + h[1],
        "mean_luma": round(h[2] / 255.0, 6),
        "phash": h[:8].hex(),
    }


def image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + feature-extract images: Arrow-batched mapInPandas, one
    Python invocation per ~10k rows. Partitioning: payload-bearing rows
    are repartitioned by media_id hash upstream so batch byte-sizes stay
    bounded (binary columns dominate memory).

    width/height/mime come from REAL container-header parsing
    (parse_image_header — PNG/GIF/JPEG/WebP, stdlib struct reads).
    Pixel features (phash, mean_luma) are REAL in both modes for PNG
    (decode_png: stdlib zlib + unfiltering), GIF (decode_gif: pure-
    Python appendix-F LZW), baseline + progressive JPEG
    (decode_jpeg_luma: huffman + IDCT, SOF2 multi-scan accumulation),
    and lossless WebP (vp8ldec.decode_webp_lossless: the full VP8L
    bitstream); for the one image format whose decode genuinely needs
    a codec (lossy VP8) they fall back to the deterministic fake when
    ``fake=True`` and raise otherwise."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                d = real_image_features(payload)
                if d is None:
                    if not fake:
                        raise NotImplementedError(
                            "pixel-level decode beyond PNG requires "
                            "PIL/libvips — not in this container"
                        )
                    d = _fake_decode(payload)
                hdr = parse_image_header(payload)
                if hdr is not None:
                    _, d["width"], d["height"] = hdr
                rows.append({
                    "media_id": r.media_id,
                    "width": d["width"], "height": d["height"],
                    "n_bytes": len(payload),
                    "phash": d["phash"], "mean_luma": d["mean_luma"],
                })
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=["media_id", "width", "height", "n_bytes", "phash", "mean_luma"]
            )

    return (
        media.filter(F.col("kind") == "image")
        .repartition(F.xxhash64("media_id"))
        .mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)
    )


def sample_frames(media: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Frame sampling for video: expands each video row into one row per
    sampled frame (flatMap shape via mapInPandas). The frame SCHEDULE is
    real — duration comes from the payload's actual MP4 moov/mvhd box
    when present (parse_mp4_header, stdlib struct walk), falling back to
    the meta column; only the frame DECODE is faked (needs ffmpeg)."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if not fake:
                    raise NotImplementedError("real frame decode requires ffmpeg")
                payload = bytes(r.payload) if r.payload is not None else b""
                hdr = parse_mp4_header(payload)
                if hdr is not None:
                    dur = hdr[2]
                else:
                    dur = (r.meta["duration_ms"] or 0) if r.meta is not None else 0
                for i, ts in enumerate(range(0, max(dur, 1), every_ms)):
                    h = hashlib.sha256(payload + ts.to_bytes(4, "big")).hexdigest()[:16]
                    rows.append({"media_id": r.media_id, "frame_idx": i,
                                 "ts_ms": ts, "frame_phash": h})
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=["media_id", "frame_idx", "ts_ms", "frame_phash"]
            )

    return (
        media.filter(F.col("kind") == "video")
        .repartition(F.xxhash64("media_id"))
        .mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic media fixture for tests: images carry REAL bytes
    (valid PNGs / JPEG headers with varying dimensions) and videos carry
    REAL ISO-BMFF bytes (ftyp + moov/mvhd with varying timescales and
    both mvhd versions), so every header parser is exercised
    end-to-end. The video meta duration is deliberately WRONG (0) to
    prove the frame scheduler reads the payload's mvhd box."""
    rows = []
    for i in range(n):
        kind = "image" if i % 3 else "video"
        if kind == "image":
            w, h = 2 + i % 5, 3 + i % 4
            payload = (make_test_png(w, h) if i % 2
                       else make_test_jpeg_header(w, h))
            mime = "image/png" if i % 2 else "image/jpeg"
            meta = (mime, w, h, 0)
        else:
            payload = make_test_mp4(3000 + i * 100,
                                    timescale=90000 if i % 2 else 1000,
                                    version=i % 2)
            meta = ("video/mp4", 64, 48, 0)
        rows.append((f"m{i}", kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)

AUDIO_FEATURES_SCHEMA = (
    "media_id string, mime string, sample_rate int, channels int, "
    "duration_ms int, n_bytes long, loudness double, peak double, "
    "zcr double"
)


def parse_audio_header(payload) -> tuple[str, int, int, int] | None:
    """REAL audio metadata from container headers — stdlib struct reads,
    no codec: WAV RIFF chunk walk (fmt + data), FLAC STREAMINFO bit
    unpack. Returns (mime, sample_rate, channels, duration_ms) or None
    when the payload isn't a recognizable audio container."""
    if not payload:
        return None
    b = bytes(payload)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        i, n = 12, len(b)
        rate = ch = byte_rate = None
        data_size = None
        while i + 8 <= n:
            cid = b[i:i + 4]
            size = struct.unpack("<I", b[i + 4:i + 8])[0]
            if cid == b"fmt " and i + 24 <= n:
                ch, rate = struct.unpack("<HI", b[i + 10:i + 16])
                byte_rate = struct.unpack("<I", b[i + 16:i + 20])[0]
            elif cid == b"data":
                data_size = size
            i += 8 + size + (size & 1)  # chunks are word-aligned
        if rate and ch:
            dur = int(data_size * 1000 / byte_rate) if (data_size and byte_rate) else 0
            return ("audio/wav", rate, ch, dur)
        return None
    mp3 = _parse_mp3(b)
    if mp3 is not None:
        return mp3
    if b[:4] == b"fLaC" and len(b) >= 8 + 18:
        # first metadata block must be STREAMINFO (34 bytes); the packed
        # 8 bytes at offset 10 within it: sr(20) ch(3) bps(5) total(36)
        blk = b[8:8 + 34]
        packed = int.from_bytes(blk[10:18], "big")
        rate = packed >> 44
        ch = ((packed >> 41) & 0x7) + 1
        total = packed & ((1 << 36) - 1)
        if rate == 0:
            return None
        return ("audio/flac", rate, ch, int(total * 1000 / rate))
    return None


# MPEG1 Layer III bitrate (kbps) / sample-rate tables (spec constants)
_MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                 160, 192, 224, 256, 320)
_MP3_RATES = (44100, 48000, 32000)


def _parse_mp3(b: bytes):
    """MP3 header walk, stdlib only: skip an ID3v2 tag (syncsafe size),
    parse the first MPEG1 Layer III frame header for rate/channels, and
    estimate duration from the CBR bitrate over the audio byte span —
    the standard header-only estimate (no codec)."""
    off = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        size = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) \
            | ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
        off = 10 + size
    if off + 4 > len(b) or b[off] != 0xFF or (b[off + 1] & 0xE0) != 0xE0:
        return None
    h1, h2, h3 = b[off + 1], b[off + 2], b[off + 3]
    version = (h1 >> 3) & 0x3    # 3 = MPEG1
    layer = (h1 >> 1) & 0x3      # 1 = Layer III
    if version != 3 or layer != 1:
        return None              # only MPEG1 Layer III modeled
    bitrate_idx = (h2 >> 4) & 0xF
    rate_idx = (h2 >> 2) & 0x3
    if bitrate_idx in (0, 15) or rate_idx == 3:
        return None
    rate = _MP3_RATES[rate_idx]
    channels = 1 if ((h3 >> 6) & 0x3) == 3 else 2
    kbps = _MP3_BITRATES[bitrate_idx]
    dur = int((len(b) - off) * 8 / (kbps * 1000) * 1000)
    return ("audio/mpeg", rate, channels, dur)


def make_test_mp3(sample_rate: int = 44100, kbps: int = 128,
                  channels: int = 1, n_frames: int = 10,
                  id3: bytes = b"") -> bytes:
    """Valid CBR MPEG1 Layer III byte stream: optional ID3v2 tag +
    n_frames correctly-sized frames (header + zero payload)."""
    rate_idx = _MP3_RATES.index(sample_rate)
    bitrate_idx = _MP3_BITRATES.index(kbps)
    mode = 3 if channels == 1 else 0
    hdr = bytes([
        0xFF,
        0xE0 | (3 << 3) | (1 << 1),             # MPEG1, Layer III
        (bitrate_idx << 4) | (rate_idx << 2),   # no padding
        mode << 6,
    ])
    frame_len = 144 * kbps * 1000 // sample_rate
    frame = hdr + b"\x00" * (frame_len - 4)
    tag = b""
    if id3:
        size = len(id3)
        ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                    (size >> 7) & 0x7F, size & 0x7F])
        tag = b"ID3\x04\x00\x00" + ss + id3
    return tag + frame * n_frames


def make_test_webp_vp8l(width: int, height: int) -> bytes:
    """Valid WebP/VP8L header prefix (RIFF + VP8L signature + packed
    14-bit dims) — enough for header parsing, no codec payload."""
    bits = (width - 1) | ((height - 1) << 14)
    payload = b"\x2f" + bits.to_bytes(4, "little")
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    riff_size = 4 + len(chunk)
    return b"RIFF" + riff_size.to_bytes(4, "little") + b"WEBP" + chunk + b"\x00" * 8


def make_test_wav(sample_rate: int = 8000, channels: int = 1,
                  n_samples: int = 1600, samples=None) -> bytes:
    """A complete, valid 16-bit PCM WAV (RIFF + fmt + data) with a
    deterministic sawtooth payload — stdlib-only fixture bytes.
    ``samples``: optional explicit per-frame int16 values (each frame
    repeated across channels) so tests can build analytic signals
    (silence, square, sine) with known RMS/peak/ZCR."""
    if samples is None:
        samples = [(i * 257) % 32768 - 16384 for i in range(n_samples)]
    frames = b"".join(struct.pack("<h", s) * channels for s in samples)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(frames)) + frames)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm(payload):
    """REAL signal decode for WAV — pure stdlib (struct + array), no
    codec: WAV *is* raw samples behind a RIFF header. Covers PCM
    (format tag 1) at 8-bit unsigned / 16-bit / 24-bit / 32-bit signed
    and IEEE float32/float64 (format tag 3). Returns (sample_rate,
    channels, samples) with ``samples`` a flat interleaved sequence of
    floats normalized to [-1, 1], or None when the payload isn't a WAV
    this decoder covers (compressed format tags: ADPCM/MP3-in-WAV...)."""
    if not isinstance(payload, (bytes, bytearray)) \
            or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    import array
    import sys

    b = bytes(payload)
    i, n = 12, len(b)
    fmt_tag = rate = ch = bits = None
    data = None
    while i + 8 <= n:
        cid = b[i:i + 4]
        size = struct.unpack("<I", b[i + 4:i + 8])[0]
        if cid == b"fmt " and i + 24 <= n:
            fmt_tag, ch, rate = struct.unpack("<HHI", b[i + 8:i + 16])
            bits = struct.unpack("<H", b[i + 22:i + 24])[0]
        elif cid == b"data":
            data = b[i + 8:i + 8 + size]
        i += 8 + size + (size & 1)
    if not (rate and ch) or data is None:
        return None
    swap = sys.byteorder == "big"

    def _arr(code, scale):
        a = array.array(code)
        width = a.itemsize
        a.frombytes(data[:len(data) - len(data) % width])
        if swap and width > 1:
            a.byteswap()
        return [v / scale for v in a]

    if fmt_tag == 1 and bits == 16:
        samples = _arr("h", 32768.0)
    elif fmt_tag == 1 and bits == 8:          # 8-bit PCM is unsigned
        samples = [(v - 128) / 128.0 for v in data]
    elif fmt_tag == 1 and bits == 24:
        samples = [
            int.from_bytes(data[j:j + 3], "little", signed=True) / 8388608.0
            for j in range(0, len(data) - len(data) % 3, 3)
        ]
    elif fmt_tag == 1 and bits == 32:
        samples = _arr("i", 2147483648.0)
    elif fmt_tag == 3 and bits == 32:
        samples = _arr("f", 1.0)
    elif fmt_tag == 3 and bits == 64:
        samples = _arr("d", 1.0)
    else:
        return None
    return (rate, ch, samples)


# ---------------------------------------------------------------------------
# FLAC: real sample decode, pure stdlib (RFC 9639). FLAC is lossless
# integer prediction + Rice-coded residuals — no transform/DSP tables —
# so a complete decoder is expressible in plain Python bit reads, the
# same way PNG is zlib + unfiltering. Covers CONSTANT / VERBATIM /
# FIXED(0-4) / LPC subframes, both Rice methods incl. escape
# partitions, wasted bits, and all three stereo decorrelations.
# ---------------------------------------------------------------------------

def _crc8(data: bytes) -> int:
    """CRC-8 poly x^8+x^2+x+1 (0x07), init 0 — FLAC frame-header CRC."""
    c = 0
    for byte in data:
        c ^= byte
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16(data: bytes) -> int:
    """CRC-16 poly 0x8005, init 0 — FLAC whole-frame CRC."""
    c = 0
    for byte in data:
        c ^= byte << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 \
                else (c << 1) & 0xFFFF
    return c


class _BitReader:
    """MSB-first bit reader over bytes (FLAC is big-endian bit-packed)."""

    def __init__(self, data: bytes, pos_bytes: int = 0):
        self.d = data
        self.pos = pos_bytes * 8  # bit cursor

    def read(self, n: int) -> int:
        """n-bit unsigned read; raises EOFError past the end."""
        end = self.pos + n
        if end > len(self.d) * 8:
            raise EOFError
        v = 0
        pos = self.pos
        while n:
            byte = self.d[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, n)
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return v

    def signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        """Count 0-bits up to the terminating 1-bit (FLAC unary)."""
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitWriter:
    """MSB-first bit writer (fixture encoder side)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def getvalue(self) -> bytes:
        assert self.nacc == 0
        return bytes(self.buf)


# fixed-predictor coefficients by order (RFC 9639 §9.2.2): the
# prediction for order o is the o-th forward difference reconstruction
_FLAC_FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}
_FLAC_SAMPLE_SIZE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_FLAC_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}


def _flac_utf8_read(br: _BitReader) -> int | None:
    """The frame/sample number is stored UTF-8-style (1-7 bytes)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while (b0 << n) & 0x80:
        n += 1
    if n < 2 or n > 7:
        return None
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            return None
        v = (v << 6) | (c & 0x3F)
    return v


def _flac_residual(br: _BitReader, block_size: int, order: int) -> list[int]:
    """Rice-coded residual section: 2-bit method (4- or 5-bit params),
    4-bit partition order, escape partitions stored raw."""
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual method")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    po = br.read(4)
    nparts = 1 << po
    if block_size % nparts or block_size >> po <= order and nparts > 1:
        raise ValueError("bad partition order")
    out = []
    for p in range(nparts):
        count = (block_size >> po) - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for _ in range(count):
                out.append(br.signed(raw) if raw else 0)
        else:
            for _ in range(count):
                u = (br.unary() << param) | br.read(param)
                out.append((u >> 1) ^ -(u & 1))
    return out


def _flac_subframe(br: _BitReader, block_size: int, bps: int) -> list[int]:
    """One channel's subframe: header + warmup + residual + predict."""
    if br.read(1):
        raise ValueError("bad subframe padding bit")
    ftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
        bps -= wasted
    if ftype == 0:                      # CONSTANT
        s = [br.signed(bps)] * block_size
    elif ftype == 1:                    # VERBATIM
        s = [br.signed(bps) for _ in range(block_size)]
    elif 8 <= ftype <= 12:              # FIXED, order 0-4
        order = ftype - 8
        s = [br.signed(bps) for _ in range(order)]
        res = _flac_residual(br, block_size, order)
        coef = _FLAC_FIXED[order]
        for r in res:
            s.append(r + sum(c * s[-1 - j] for j, c in enumerate(coef)))
    elif ftype >= 32:                   # LPC, order 1-32
        order = ftype - 31
        s = [br.signed(bps) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid lpc precision")
        shift = br.signed(5)
        coef = [br.signed(prec) for _ in range(order)]
        res = _flac_residual(br, block_size, order)
        for r in res:
            pred = sum(c * s[-1 - j] for j, c in enumerate(coef)) >> shift
            s.append(r + pred)
    else:
        raise ValueError("reserved subframe type")
    return [v << wasted for v in s] if wasted else s


def decode_flac_pcm(payload):
    """REAL sample decode for FLAC — pure stdlib bit reads, no codec
    (RFC 9639): metadata walk, frame-header parse with CRC-8 verify,
    CONSTANT/VERBATIM/FIXED/LPC subframes, Rice residuals (both
    methods + escape), wasted bits, left/right/mid-side stereo
    decorrelation, CRC-16 frame verify. Returns (sample_rate,
    channels, samples) with ``samples`` flat interleaved floats
    normalized to [-1, 1] — the decode_wav_pcm contract — or None
    when the payload isn't FLAC or uses a reserved feature."""
    if not isinstance(payload, (bytes, bytearray)) or bytes(payload[:4]) != b"fLaC":
        return None
    b = bytes(payload)
    try:
        # metadata block walk; STREAMINFO (type 0) carries the defaults
        i, rate0, ch0, bps0 = 4, None, None, None
        while True:
            if i + 4 > len(b):
                return None
            hdr = b[i]
            size = int.from_bytes(b[i + 1:i + 4], "big")
            if hdr & 0x7F == 0:
                packed = int.from_bytes(b[i + 14:i + 22], "big")
                rate0 = packed >> 44
                ch0 = ((packed >> 41) & 0x7) + 1
                bps0 = ((packed >> 36) & 0x1F) + 1
            i += 4 + size
            if hdr & 0x80:
                break
        if not rate0:
            return None
        out: list[list[int]] = []
        rate = rate0
        while i + 2 <= len(b):
            frame_start = i
            br = _BitReader(b, i)
            sync = br.read(15)
            if sync != 0x7FFC:
                raise ValueError("lost frame sync")
            br.read(1)                              # blocking strategy
            bs_code = br.read(4)
            sr_code = br.read(4)
            ca = br.read(4)
            ss_code = br.read(3)
            if br.read(1):
                raise ValueError("reserved header bit")
            if _flac_utf8_read(br) is None:
                raise ValueError("bad coded number")
            if bs_code == 0:
                raise ValueError("reserved block size")
            elif bs_code == 1:
                block_size = 192
            elif bs_code <= 5:
                block_size = 576 << (bs_code - 2)
            elif bs_code == 6:
                block_size = br.read(8) + 1
            elif bs_code == 7:
                block_size = br.read(16) + 1
            else:
                block_size = 256 << (bs_code - 8)
            if sr_code == 0:
                rate = rate0
            elif sr_code in _FLAC_RATES:
                rate = _FLAC_RATES[sr_code]
            elif sr_code == 12:
                rate = br.read(8) * 1000
            elif sr_code == 13:
                rate = br.read(16)
            elif sr_code == 14:
                rate = br.read(16) * 10
            else:
                raise ValueError("invalid sample rate code")
            bps = bps0 if ss_code == 0 else _FLAC_SAMPLE_SIZE.get(ss_code)
            if bps is None:
                raise ValueError("reserved sample size")
            br.align()
            crc8_stored = br.read(8)
            if _crc8(b[frame_start:(br.pos >> 3) - 1]) != crc8_stored:
                raise ValueError("frame header CRC mismatch")
            if ca <= 7:
                nch = ca + 1
                chans = [_flac_subframe(br, block_size, bps)
                         for _ in range(nch)]
            elif ca in (8, 9, 10):
                nch = 2
                extra0 = 1 if ca == 9 else 0   # side channel has bps+1
                extra1 = 1 if ca in (8, 10) else 0
                c0 = _flac_subframe(br, block_size, bps + extra0)
                c1 = _flac_subframe(br, block_size, bps + extra1)
                if ca == 8:        # left/side: right = left - side
                    chans = [c0, [l - s for l, s in zip(c0, c1)]]
                elif ca == 9:      # side/right: left = right + side
                    chans = [[r + s for s, r in zip(c0, c1)], c1]
                else:              # mid/side
                    left, right = [], []
                    for m, s in zip(c0, c1):
                        m = (m << 1) | (s & 1)
                        left.append((m + s) >> 1)
                        right.append((m - s) >> 1)
                    chans = [left, right]
            else:
                raise ValueError("reserved channel assignment")
            br.align()
            crc_pos = br.pos >> 3
            if crc_pos + 2 > len(b):
                raise ValueError("truncated frame")
            if _crc16(b[frame_start:crc_pos]) != \
                    int.from_bytes(b[crc_pos:crc_pos + 2], "big"):
                raise ValueError("frame CRC mismatch")
            i = crc_pos + 2
            scale = float(1 << (bps - 1))
            for j in range(block_size):
                out.append([c[j] / scale for c in chans])
        if not out:
            return None
        nch = len(out[0])
        return (rate, nch, [v for frame in out for v in frame])
    except (EOFError, ValueError, IndexError, KeyError):
        return None


def make_test_flac(sample_rate: int = 8000, bps: int = 16, samples=None,
                   channel_samples=None, block_size: int = 4096,
                   stereo_mode: str = "independent",
                   fixed_order: int | None = None) -> bytes:
    """A complete, valid FLAC stream — stdlib-only fixture bytes, the
    make_test_wav counterpart. ``samples``: per-frame values applied to
    every channel; ``channel_samples``: explicit per-channel lists (for
    stereo-decorrelation fixtures). Subframes are CONSTANT when a
    channel is all one value, else FIXED(order)+Rice when
    ``fixed_order`` is given, else VERBATIM. ``stereo_mode`` in
    independent|left_side|right_side|mid_side exercises the
    decorrelated paths (2 channels only)."""
    if channel_samples is None:
        if samples is None:
            samples = [(i * 257) % 32768 - 16384 for i in range(1600)]
        channel_samples = [list(samples)]
    chans = [list(c) for c in channel_samples]
    nch = len(chans)
    n = len(chans[0])
    assert all(len(c) == n for c in chans)
    assert stereo_mode == "independent" or nch == 2

    si_pack = (sample_rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | n
    streaminfo = (struct.pack(">HHBBB", min(block_size, n) or 16,
                              min(block_size, n) or 16, 0, 0, 0)
                  + b"\x00\x00\x00" + si_pack.to_bytes(8, "big")
                  + b"\x00" * 16)
    out = bytearray(b"fLaC" + b"\x80" + len(streaminfo).to_bytes(3, "big")
                    + streaminfo)
    ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps]
    ca = {"independent": nch - 1, "left_side": 8, "right_side": 9,
          "mid_side": 10}[stereo_mode]

    def _subframe(bw: _BitWriter, vals: list[int], sub_bps: int) -> None:
        if len(set(vals)) == 1:
            bw.write(0, 1), bw.write(0, 6), bw.write(0, 1)
            bw.write(vals[0], sub_bps)
            return
        order = fixed_order
        if order:
            bw.write(0, 1), bw.write(8 + order, 6), bw.write(0, 1)
            for v in vals[:order]:
                bw.write(v, sub_bps)
            res = list(vals[:order])
            coef = _FLAC_FIXED[order]
            resid = []
            for v in vals[order:]:
                pred = sum(c * res[-1 - j] for j, c in enumerate(coef))
                resid.append(v - pred)
                res.append(v)
            # method 0 rice, partition order 0, best 4-bit param
            best_p, best_bits = 0, None
            for p in range(15):
                bits = sum((((r << 1) ^ (-1 if r < 0 else 0)) >> p) + 1 + p
                           for r in resid)
                if best_bits is None or bits < best_bits:
                    best_p, best_bits = p, bits
            bw.write(0, 2), bw.write(0, 4), bw.write(best_p, 4)
            for r in resid:
                u = (r << 1) ^ (-1 if r < 0 else 0)
                q = u >> best_p
                for _ in range(q):
                    bw.write(0, 1)
                bw.write(1, 1)
                bw.write(u, best_p)
            return
        bw.write(0, 1), bw.write(1, 6), bw.write(0, 1)
        for v in vals:
            bw.write(v, sub_bps)

    bs = min(block_size, n)
    frame_no = 0
    for off in range(0, n, bs):
        cut = [c[off:off + bs] for c in chans]
        cur = len(cut[0])
        hdr = _BitWriter()
        hdr.write(0x7FFC, 15), hdr.write(0, 1)      # sync + fixed blocking
        hdr.write(7, 4)                             # 16-bit explicit size
        hdr.write(0, 4)                             # rate from STREAMINFO
        hdr.write(ca, 4), hdr.write(ss_code, 3), hdr.write(0, 1)
        assert frame_no < 0x80
        hdr.write(frame_no, 8)                      # UTF-8 single byte
        hdr.write(cur - 1, 16)
        hbytes = hdr.getvalue()
        body = _BitWriter()
        if stereo_mode == "independent":
            stored = [(c, bps) for c in cut]
        else:
            l, r = cut
            side = [a - b_ for a, b_ in zip(l, r)]
            if stereo_mode == "left_side":
                stored = [(l, bps), (side, bps + 1)]
            elif stereo_mode == "right_side":
                stored = [(side, bps + 1), (r, bps)]
            else:
                mid = [(a + b_) >> 1 for a, b_ in zip(l, r)]
                stored = [(mid, bps), (side, bps + 1)]
        for vals, sub_bps in stored:
            _subframe(body, vals, sub_bps)
        body.align()
        frame = hbytes + bytes([_crc8(hbytes)]) + body.getvalue()
        out += frame + _crc16(frame).to_bytes(2, "big")
        frame_no += 1
    return bytes(out)


def real_audio_features(payload) -> dict | None:
    """Signal-level features from a REAL decode (WAV — raw PCM behind
    struct reads — and FLAC via decode_flac_pcm): loudness =
    RMS amplitude of the normalized interleaved samples in [0, 1],
    peak = max |sample|, zcr = zero-crossing rate of channel 0 (sign
    changes / (frames - 1), zeros carry the previous sign). Returns
    None for other/compressed payloads — callers fall back to the
    fake/raise path exactly as image_features does for non-PNG."""
    dec = decode_wav_pcm(payload)
    if dec is None:
        dec = decode_flac_pcm(payload)
    if dec is None:
        return None
    _rate, ch, s = dec
    if not s:
        return {"loudness": 0.0, "peak": 0.0, "zcr": 0.0}
    import math

    rms = math.sqrt(sum(v * v for v in s) / len(s))
    peak = max(abs(v) for v in s)
    ch0 = s[0::ch]
    crossings, prev = 0, 1 if ch0[0] >= 0 else -1
    for v in ch0[1:]:
        sign = prev if v == 0 else (1 if v > 0 else -1)
        if sign != prev:
            crossings += 1
        prev = sign
    zcr = crossings / (len(ch0) - 1) if len(ch0) > 1 else 0.0
    return {"loudness": round(rms, 6), "peak": round(peak, 6),
            "zcr": round(zcr, 6)}


def audio_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + feature-extract audio, same shape as image_features:
    sample_rate/channels/duration come from REAL container-header
    parsing (parse_audio_header — WAV/FLAC/MP3). Signal-level features
    (loudness/peak/zcr) are REAL in both modes for WAV (decode_wav_pcm
    — raw samples behind struct reads) and FLAC (decode_flac_pcm —
    full Rice/fixed/LPC bitstream decode, stdlib only); for formats
    whose sample decode genuinely needs a codec (MP3) they fall back
    to the deterministic fake when ``fake=True`` and raise
    otherwise."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                d = real_audio_features(payload)
                if d is None:
                    if not fake:
                        raise NotImplementedError(
                            "sample decode beyond WAV/PCM requires "
                            "soundfile/ffmpeg — not in this container"
                        )
                    h = hashlib.sha256(payload).digest()
                    d = {"loudness": round(h[3] / 255.0, 6),
                         "peak": round(h[4] / 255.0, 6),
                         "zcr": round(h[5] / 255.0, 6)}
                hdr = parse_audio_header(payload)
                mime, rate, ch, dur = hdr if hdr else (None, 0, 0, 0)
                rows.append({
                    "media_id": r.media_id, "mime": mime,
                    "sample_rate": rate, "channels": ch, "duration_ms": dur,
                    "n_bytes": len(payload), **d,
                })
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=["media_id", "mime", "sample_rate", "channels",
                         "duration_ms", "n_bytes", "loudness", "peak", "zcr"]
            )

    return (
        media.filter(F.col("kind") == "audio")
        .repartition(F.xxhash64("media_id"))
        .mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)
    )


def synthetic_audio(spark, n: int = 32) -> DataFrame:
    """Deterministic audio fixture: real WAV bytes with varying
    rate/channels/length so the header parser is exercised end-to-end."""
    rows = []
    for i in range(n):
        rate = (8000, 16000, 44100)[i % 3]
        ch = 1 + i % 2
        n_samples = rate // 10 + i  # ~100ms
        payload = make_test_wav(rate, ch, n_samples)
        meta = ("audio/wav", 0, 0, int(n_samples * 1000 / rate))
        rows.append((f"a{i}", "audio", bytearray(payload), meta))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def parse_mp4_header(payload) -> tuple[str, int, int] | None:
    """REAL MP4/ISO-BMFF metadata from the box tree — stdlib struct
    reads, no codec (same pattern as the MP3/WAV/FLAC parsers): walk
    top-level boxes (32-bit size + fourcc, size==1 -> 64-bit largesize),
    find ``moov``, then ``mvhd`` inside it; duration_ms = duration /
    timescale * 1000 (mvhd version 0: 32-bit fields, version 1: 64-bit).
    Returns (mime, timescale, duration_ms) or None when the payload is
    not an ISO media file."""
    if not payload:
        return None
    b = bytes(payload)
    if len(b) < 16 or b[4:8] != b"ftyp":
        return None

    def walk(lo: int, hi: int):
        off = lo
        while off + 8 <= hi:
            size = struct.unpack(">I", b[off:off + 4])[0]
            typ = b[off + 4:off + 8]
            body = off + 8
            if size == 1:
                if off + 16 > hi:
                    return
                size = struct.unpack(">Q", b[off + 8:off + 16])[0]
                body = off + 16
            if size == 0:
                size = hi - off
            if size < 8 or off + size > hi:
                return
            yield typ, body, off + size
            off += size

    for typ, body, end in walk(0, len(b)):
        if typ != b"moov":
            continue
        for t2, b2, e2 in walk(body, end):
            if t2 != b"mvhd":
                continue
            version = b[b2]
            if version == 1 and e2 - b2 >= 32:
                timescale = struct.unpack(">I", b[b2 + 20:b2 + 24])[0]
                duration = struct.unpack(">Q", b[b2 + 24:b2 + 32])[0]
            elif version == 0 and e2 - b2 >= 20:
                timescale = struct.unpack(">I", b[b2 + 12:b2 + 16])[0]
                duration = struct.unpack(">I", b[b2 + 16:b2 + 20])[0]
            else:
                return None
            if timescale <= 0:
                return None
            return ("video/mp4", timescale, int(duration * 1000 / timescale))
    return None


def make_test_mp4(duration_ms: int, timescale: int = 1000,
                  version: int = 0) -> bytes:
    """Minimal REAL ISO-BMFF bytes: ftyp + moov(mvhd) with the given
    timescale/duration, valid for parse_mp4_header and any box walker."""
    ftyp = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 0x200)
    duration = duration_ms * timescale // 1000
    if version == 0:
        mvhd_body = (bytes([0, 0, 0, 0])              # version 0 + flags
                     + struct.pack(">II", 0, 0)        # ctime, mtime
                     + struct.pack(">I", timescale)
                     + struct.pack(">I", duration)
                     + b"\x00" * 80)                   # rate..next_track_id
    else:
        mvhd_body = (bytes([1, 0, 0, 0])
                     + struct.pack(">QQ", 0, 0)
                     + struct.pack(">I", timescale)
                     + struct.pack(">Q", duration)
                     + b"\x00" * 80)
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    return ftyp + moov
