"""Pure-stdlib PNG codec (zlib inflate + scanline unfilter) so the
multimodal path decodes REAL image bytes in-sandbox.

The container has no PIL/libjpeg, but PNG needs nothing beyond
``zlib`` + ``struct``: this module implements the subset that covers
what an ingest pipeline actually stores — 8-bit depth, grayscale /
gray+alpha / RGB / RGBA, non-interlaced, all five scanline filters
(None/Sub/Up/Average/Paeth per the PNG spec §9). ``decode_png`` is the
real decoder plugged into ``multimodal.decode_image``; ``encode_png``
exists so tests can generate valid PNGs (with any filter type) without
external tools and round-trip them through the same mapInPandas
plumbing as the deterministic fake.

Scale note: decode runs inside Arrow-batched ``mapInPandas`` — pure
per-row CPU, no shuffle touches the payload — so the operator's
distribution story is identical to the fake-decoder twin. A row-wise
Python unfilter is obviously slower than libpng; at production scale
you'd swap the body for PIL/pyarrow-image while keeping this exact
interface (that swap is the documented plug-in point, not a TODO in
the plumbing).
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (PNG spec §11.2.2)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG → (width, height, channels, raw pixel bytes,
    row-major, ``width*channels`` bytes per row).

    Supports bit depth 8, color types 0/2/4/6, interlace 0 — raises
    ``ValueError`` on anything else (palette/16-bit/Adam7), and on a
    missing signature or truncated stream.
    """
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    idat = bytearray()
    width = height = None
    depth = ctype = interlace = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            width, height, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
    channels = _CHANNELS.get(ctype)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {ctype}")
    if interlace:
        raise ValueError("interlaced (Adam7) PNG unsupported")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = bytearray(height * stride)
    prev = bytes(stride)
    rpos = 0
    for y in range(height):
        ftype = raw[rpos]
        line = bytearray(raw[rpos + 1 : rpos + 1 + stride])
        rpos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                c = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = bytes(line)
    return width, height, channels, bytes(out)


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body))
    )


def encode_png(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    *,
    filter_type: int = 0,
) -> bytes:
    """Encode raw row-major pixels into a valid PNG. ``filter_type``
    applies that scanline filter to EVERY row (0..4) — the point is to
    exercise each of the decoder's unfilter paths, not to compress
    well."""
    ctype = _COLOR_TYPE.get(channels)
    if ctype is None:
        raise ValueError(f"channels must be 1/2/3/4, got {channels}")
    stride = width * channels
    if len(pixels) != height * stride:
        raise ValueError("pixel buffer does not match width*height*channels")
    if not 0 <= filter_type <= 4:
        raise ValueError(f"bad filter type {filter_type}")
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        raw.append(filter_type)
        for i in range(stride):
            a = line[i - channels] if i >= channels else 0
            if filter_type == 0:
                pred = 0
            elif filter_type == 1:
                pred = a
            elif filter_type == 2:
                pred = prev[i]
            elif filter_type == 3:
                pred = (a + prev[i]) >> 1
            else:
                c = prev[i - channels] if i >= channels else 0
                pred = _paeth(a, prev[i], c)
            raw.append((line[i] - pred) & 0xFF)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
