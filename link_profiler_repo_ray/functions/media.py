"""Pure-numpy media codecs for the multimodal pipeline (T9).

The container has no PIL/ffmpeg, but the *uncompressed* container
formats are simple enough to parse for real: BMP (BITMAPINFOHEADER,
24 bpp), binary PPM/PGM (P6/P5), and RIFF/WAVE PCM16 — plus one
genuinely COMPRESSED format, PNG (8-bit gray/RGB, non-interlaced),
whose DEFLATE stream stdlib ``zlib`` handles and whose per-row
filters (None/Sub/Up/Average/Paeth) are unfiltered here for real.
The encoders below emit spec-conformant files and the decoders parse
actual bytes — headers, row padding, bottom-up pixel order, RIFF
chunk walking, CRC-verified PNG chunk walking — so the decode stage
in ``pipelines/textdata.py`` is no longer a stub for these formats
(JPEG/MP3/video still need a real codec library; ``sniff_kind``
returns ``"unknown"`` for them and the stage degrades to
byte-length-only features).

Reference parity: the reference's OCR/media processor
(``services/ocr_service.py``) is a thin wrapper around external codec
binaries; the Ray analogue keeps the same actor-pool shape with the
codec swapped for these pure-numpy parsers.
"""
from __future__ import annotations

import numpy as np

# --- encoders -------------------------------------------------------------


def encode_bmp(width: int, height: int, base: int) -> bytes:
    """24 bpp bottom-up BMP; pixel value = base + x on all 3 channels.

    The horizontal gradient makes the decoded mean depend on every
    pixel (mean = base + (width-1)/2), so a correct answer proves the
    pixel array was actually decoded, not inferred from the header.
    ``base + width`` must stay <= 256.
    """
    if base + width > 256:
        raise ValueError("gradient would wrap uint8")
    stride = ((width * 3 + 3) // 4) * 4
    img_size = stride * height
    file_size = 54 + img_size
    hdr = bytearray()
    hdr += b"BM"
    hdr += file_size.to_bytes(4, "little")
    hdr += b"\x00\x00\x00\x00"
    hdr += (54).to_bytes(4, "little")  # pixel data offset
    hdr += (40).to_bytes(4, "little")  # BITMAPINFOHEADER size
    hdr += width.to_bytes(4, "little", signed=True)
    hdr += height.to_bytes(4, "little", signed=True)  # >0: bottom-up
    hdr += (1).to_bytes(2, "little")  # planes
    hdr += (24).to_bytes(2, "little")  # bpp
    hdr += (0).to_bytes(4, "little")  # BI_RGB (uncompressed)
    hdr += img_size.to_bytes(4, "little")
    hdr += b"\x00" * 16  # ppm resolutions + palette counts
    rows = np.zeros((height, stride), dtype=np.uint8)
    grad = (base + np.arange(width, dtype=np.uint8)).repeat(3)
    rows[:, : width * 3] = grad[None, :]
    return bytes(hdr) + rows.tobytes()


def encode_ppm(width: int, height: int, base: int) -> bytes:
    """Binary PPM (P6); pixel value = base + y on all 3 channels."""
    if base + height > 256:
        raise ValueError("gradient would wrap uint8")
    col = (base + np.arange(height, dtype=np.uint8))[:, None, None]
    px = np.broadcast_to(col, (height, width, 3))
    return f"P6\n{width} {height}\n255\n".encode() + px.tobytes()


def encode_pgm(width: int, height: int, base: int) -> bytes:
    """Binary PGM (P5); pixel value = base + x."""
    if base + width > 256:
        raise ValueError("gradient would wrap uint8")
    row = (base + np.arange(width, dtype=np.uint8))[None, :]
    px = np.broadcast_to(row, (height, width))
    return f"P5\n{width} {height}\n255\n".encode() + px.tobytes()


def encode_wav(n_samples: int, rate: int, amp: int) -> bytes:
    """Mono PCM16 RIFF/WAVE; samples alternate +amp/-amp (RMS = amp)."""
    x = np.empty(n_samples, dtype=np.int16)
    x[0::2] = amp
    x[1::2] = -amp
    data = x.tobytes()
    hdr = bytearray()
    hdr += b"RIFF"
    hdr += (36 + len(data)).to_bytes(4, "little")
    hdr += b"WAVE"
    hdr += b"fmt "
    hdr += (16).to_bytes(4, "little")
    hdr += (1).to_bytes(2, "little")  # PCM
    hdr += (1).to_bytes(2, "little")  # mono
    hdr += rate.to_bytes(4, "little")
    hdr += (rate * 2).to_bytes(4, "little")  # byte rate
    hdr += (2).to_bytes(2, "little")  # block align
    hdr += (16).to_bytes(2, "little")  # bits/sample
    hdr += b"data"
    hdr += len(data).to_bytes(4, "little")
    return bytes(hdr) + data


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib

    return (
        len(data).to_bytes(4, "big")
        + typ
        + data
        + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def encode_png(width: int, height: int, base: int) -> bytes:
    """8-bit RGB PNG; pixel value = base + x on all 3 channels
    (mean = base + (width-1)/2, same gradient convention as BMP).

    Rows cycle filter types — None on row 0, Sub on odd rows, Up on
    even rows — so a correct decoded mean proves real DEFLATE
    decompression AND real per-row unfiltering, not a header read.
    """
    import zlib

    if base + width > 256:
        raise ValueError("gradient would wrap uint8")
    row = (base + np.arange(width, dtype=np.uint8)).repeat(3)
    lines = bytearray()
    for y in range(height):
        if y == 0:
            lines.append(0)  # None
            lines += row.tobytes()
        elif y % 2 == 1:
            left = np.concatenate([np.zeros(3, np.uint8), row[:-3]])
            lines.append(1)  # Sub (uint8 subtraction wraps mod 256)
            lines += (row - left).tobytes()
        else:
            lines.append(2)  # Up: previous row is identical -> zeros
            lines += np.zeros(width * 3, np.uint8).tobytes()
    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # depth 8, RGB, deflate, adaptive, no interlace
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _png_chunk(b"IEND", b"")
    )


# --- decoders -------------------------------------------------------------


def sniff_kind(b: bytes) -> str:
    if b[:2] == b"BM":
        return "bmp"
    if b[:2] == b"P6":
        return "ppm"
    if b[:2] == b"P5":
        return "pgm"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        return "avi"
    if b[:8] == _PNG_SIG:
        return "png"
    if b[:2] == b"\xff\xd8":
        return "jpeg"
    return "unknown"


def decode_bmp(b: bytes) -> dict:
    """Parse a 24 bpp uncompressed BMP (the overwhelmingly common disk
    layout); other depths/compressions raise — swap in a codec library
    for those."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = int.from_bytes(b[10:14], "little")
    width = int.from_bytes(b[18:22], "little", signed=True)
    height = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    compression = int.from_bytes(b[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    h = abs(height)
    stride = ((width * 3 + 3) // 4) * 4
    arr = np.frombuffer(b, np.uint8, count=h * stride, offset=data_off)
    px = arr.reshape(h, stride)[:, : width * 3].reshape(h, width, 3)
    if height > 0:
        px = px[::-1]  # bottom-up rows
    return {"kind": "bmp", "width": width, "height": h, "channels": 3,
            "mean_value": float(px.mean())}


def _pnm_header(b: bytes, magic: bytes, n_fields: int) -> tuple[list[int], int]:
    """Tokenize a PNM header: magic, then ints separated by whitespace,
    with ``#`` comments running to end-of-line."""
    if b[:2] != magic:
        raise ValueError("bad PNM magic")
    vals: list[int] = []
    i = 2
    while len(vals) < n_fields:
        c = b[i : i + 1]
        if c == b"#":
            while b[i : i + 1] not in (b"\n", b""):
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while b[j : j + 1].isdigit():
                j += 1
            if j == i:
                raise ValueError("malformed PNM header")
            vals.append(int(b[i:j]))
            i = j
    return vals, i + 1  # exactly one whitespace byte after maxval


def decode_ppm(b: bytes) -> dict:
    (w, h, maxval), off = _pnm_header(b, b"P6", 3)
    px = np.frombuffer(b, np.uint8, count=w * h * 3, offset=off).reshape(h, w, 3)
    return {"kind": "ppm", "width": w, "height": h, "channels": 3,
            "mean_value": float(px.mean())}


def decode_pgm(b: bytes) -> dict:
    (w, h, maxval), off = _pnm_header(b, b"P5", 3)
    px = np.frombuffer(b, np.uint8, count=w * h, offset=off).reshape(h, w)
    return {"kind": "pgm", "width": w, "height": h, "channels": 1,
            "mean_value": float(px.mean())}


def decode_wav(b: bytes) -> dict:
    """Walk RIFF chunks (odd-size pad bytes included) to fmt + data."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE")
    i = 12
    rate = channels = bits = None
    samples = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        body = i + 8
        if cid == b"fmt ":
            fmt_tag = int.from_bytes(b[body : body + 2], "little")
            if fmt_tag != 1:
                raise ValueError(f"unsupported WAVE format tag {fmt_tag}")
            channels = int.from_bytes(b[body + 2 : body + 4], "little")
            rate = int.from_bytes(b[body + 4 : body + 8], "little")
            bits = int.from_bytes(b[body + 14 : body + 16], "little")
        elif cid == b"data":
            if bits != 16:
                raise ValueError(f"unsupported bit depth {bits}")
            samples = np.frombuffer(b, np.int16, count=size // 2, offset=body)
        i = body + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    n = len(samples) // channels
    rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
    return {"kind": "wav", "sample_rate": rate, "channels": channels,
            "duration_ms": n * 1000.0 / rate, "rms": rms}


def decode_png(b: bytes) -> dict:
    """Real PNG decode via stdlib zlib: CRC-verified chunk walk,
    DEFLATE-decompress the IDAT stream, then reconstruct every
    scanline through its declared filter (None/Sub/Up/Average/Paeth).
    Supports the dominant archive layout — 8-bit depth, grayscale or
    truecolor, non-interlaced; other layouts raise (the codec-library
    swap-in point).  Sub is a per-channel cumulative sum (vectorized);
    Average/Paeth are inherently left-to-right sequential and fall
    back to a per-byte loop only on rows that declare them."""
    import zlib

    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    i = 8
    w = h = depth = ctype = interlace = None
    idat = bytearray()
    while i + 12 <= len(b):
        size = int.from_bytes(b[i : i + 4], "big")
        typ = b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + size]
        crc = int.from_bytes(b[i + 8 + size : i + 12 + size], "big")
        if (zlib.crc32(typ + data) & 0xFFFFFFFF) != crc:
            raise ValueError(f"PNG CRC mismatch in {typ!r} chunk")
        if typ == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            depth, ctype, interlace = data[8], data[9], data[12]
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        i += 12 + size
    if w is None:
        raise ValueError("missing IHDR")
    if depth != 8 or ctype not in (0, 2) or interlace != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, color={ctype}, interlace={interlace})")
    ch = 3 if ctype == 2 else 1
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        line = np.frombuffer(raw, np.uint8, count=stride, offset=pos + 1)
        pos += 1 + stride
        if ft == 0:  # None
            rec = line.copy()
        elif ft == 1:  # Sub: recon[x] = filt[x] + recon[x-ch]
            rec = (
                np.cumsum(line.reshape(-1, ch).astype(np.int64), axis=0) % 256
            ).astype(np.uint8).reshape(-1)
        elif ft == 2:  # Up
            rec = line + prev  # uint8 wraps mod 256
        elif ft == 3:  # Average
            rec = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                rec[x] = (int(line[x]) + ((a + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            rec = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                up = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                rec[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = rec
        prev = rec
    px = out.reshape(h, w, ch)
    return {"kind": "png", "width": w, "height": h, "channels": ch,
            "mean_value": float(px.mean())}


def decode_jpeg(b: bytes) -> dict:
    """Baseline JPEG via the pure-numpy codec (functions/jpegx.py):
    Huffman entropy decode, dequantize, IDCT, chroma upsample,
    YCbCr->RGB.  Progressive/arithmetic/12-bit raise (the codec-library
    swap-in point, same contract as the other decoders here)."""
    from .jpegx import decode_jpeg as _dec

    return _dec(b)


_DECODERS = {"bmp": decode_bmp, "ppm": decode_ppm, "pgm": decode_pgm, "wav": decode_wav,
             "png": decode_png, "jpeg": decode_jpeg,
             "avi": lambda b: decode_avi_mjpeg(b)}


def decode_media(b: bytes) -> dict:
    """Sniff + decode; unknown formats degrade to byte-length features
    (the slot where a JPEG/MP3/video codec library would plug in)."""
    kind = sniff_kind(b)
    fn = _DECODERS.get(kind)
    if fn is None:
        return {"kind": "unknown"}
    return fn(b)


# --- MJPEG/AVI video (round 5): RIFF container walk + per-frame JPEG --------

def encode_avi_mjpeg(frames: "list[np.ndarray]", fps: int = 10) -> bytes:
    """Minimal RIFF/AVI container holding MJPEG ('00dc') frames — each
    frame a baseline JPEG from :mod:`.jpegx`.  Enough structure for any
    MJPEG-aware reader: RIFF('AVI ') → LIST('hdrl') with 'avih' →
    LIST('movi') with one '00dc' chunk per frame.  Deterministic bytes
    for given pixels (the synth-payload role of the other encoders)."""
    from .jpegx import encode_jpeg_gray, encode_jpeg_rgb

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    payloads = [
        encode_jpeg_rgb(f) if f.ndim == 3 else encode_jpeg_gray(f) for f in frames
    ]

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + len(data).to_bytes(4, "little") + data + pad

    def list_chunk(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    avih = (
        (1_000_000 // fps).to_bytes(4, "little")  # usec/frame
        + (0).to_bytes(4, "little")  # max bytes/sec
        + (0).to_bytes(4, "little")
        + (0).to_bytes(4, "little")  # flags
        + len(frames).to_bytes(4, "little")  # total frames
        + (0).to_bytes(4, "little")
        + (1).to_bytes(4, "little")  # streams
        + (0).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + bytes(16)
    )
    hdrl = list_chunk(b"hdrl", chunk(b"avih", avih))
    movi = list_chunk(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_avi_mjpeg(b: bytes, sample_every: int = 1) -> dict:
    """Walk the RIFF/AVI structure, decode every ``sample_every``-th
    MJPEG frame (the frame-sample primitive of a video feature
    pipeline), and aggregate features.  Non-MJPEG codecs have no JPEG
    SOI in their '00dc' chunks and raise — the ffmpeg swap-in point."""
    from .jpegx import decode_jpeg

    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    # header fields from 'avih' (first LIST('hdrl'))
    n_frames_hdr = usec_pf = None
    frames: list[bytes] = []

    def walk(buf: bytes, start: int, end: int):
        nonlocal n_frames_hdr, usec_pf
        i = start
        while i + 8 <= end:
            fourcc = buf[i : i + 4]
            size = int.from_bytes(buf[i + 4 : i + 8], "little")
            data_start = i + 8
            if fourcc == b"LIST":
                walk(buf, data_start + 4, data_start + size)
            elif fourcc == b"avih":
                usec_pf = int.from_bytes(buf[data_start : data_start + 4], "little")
                n_frames_hdr = int.from_bytes(
                    buf[data_start + 16 : data_start + 20], "little"
                )
            elif fourcc == b"00dc":
                frames.append(buf[data_start : data_start + size])
            i = data_start + size + (size % 2)

    walk(b, 12, len(b))
    if not frames:
        raise ValueError("AVI holds no video frames")
    if n_frames_hdr is not None and n_frames_hdr != len(frames):
        raise ValueError(
            f"AVI header declares {n_frames_hdr} frames, found {len(frames)}"
        )
    sampled = frames[::sample_every]
    feats = [decode_jpeg(f) for f in sampled]
    w, h = feats[0]["width"], feats[0]["height"]
    fps = round(1_000_000 / usec_pf, 3) if usec_pf else None
    return {
        "kind": "avi_mjpeg",
        "width": w,
        "height": h,
        "channels": max(f["channels"] for f in feats),
        "n_frames": len(frames),
        "n_sampled": len(sampled),
        "fps": fps,
        "duration_ms": round(len(frames) * (usec_pf or 0) / 1000.0, 3),
        "mean_value": float(np.mean([f["mean_value"] for f in feats])),
    }
