"""Pure-stdlib GIF decoder (LZW + palette + interlace) — third real
media format for the multimodal path, after PNG (``png.py``) and PCM
WAV (``wav.py``). Web-scraped training corpora are full of GIFs, and
the format needs nothing beyond bit twiddling: variable-width LZW with
clear/EOI codes (GIF89a spec appendix F), a color-table lookup, and
the optional 4-pass interlace row order.

``decode_gif`` returns the FIRST frame as RGB bytes (animation frames
beyond the first are skipped — feature extraction wants the poster
frame; extend the block loop to yield all frames for video-style
sampling). ``encode_gif`` writes a valid single-frame GIF using the
classic "emit literal codes, clear often" LZW strategy so tests can
round-trip without external tools — and exercise the decoder's
dictionary-reset path on every image.
"""

from __future__ import annotations

import struct

GIF_MAGICS = (b"GIF87a", b"GIF89a")

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start row, step)


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader: GIF packs codes LSB-first
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    dictionary: list[bytes] = []

    def reset() -> None:
        nonlocal width, dictionary
        dictionary = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1

    reset()
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(dictionary):
            entry = dictionary[code]
            if prev is not None:
                dictionary.append(prev + entry[:1])
        elif code == len(dictionary) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
            dictionary.append(entry)
        else:
            raise ValueError(f"corrupt GIF LZW code {code}")
        out += entry
        prev = entry
        if len(dictionary) == (1 << width) and width < 12:
            width += 1
    return bytes(out[:n_pixels])


def decode_gif(data: bytes) -> tuple[int, int, int, bytes]:
    """First frame of a GIF → (width, height, 3, RGB bytes, row-major).

    Handles global/local color tables, interlace, and skips extension
    blocks (GCE transparency is ignored — the opaque palette color is
    used). Raises ``ValueError`` on a bad signature or broken stream.
    """
    if data[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF: bad signature")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    _sw, _sh, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct: bytes | None = None
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        gct = data[pos : pos + n]
        if len(gct) < n:
            raise ValueError("truncated global color table")
        pos += n
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated image descriptor")
        _left, _top, w, h, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        table = gct
        if ipacked & 0x80:
            n = 3 * (2 << (ipacked & 0x07))
            table = data[pos : pos + n]
            if len(table) < n:
                raise ValueError("truncated local color table")
            pos += n
        if table is None:
            raise ValueError("GIF image without any color table")
        if pos >= len(data):
            raise ValueError("truncated GIF before LZW data")
        min_code_size = data[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError(f"bad GIF LZW min code size {min_code_size}")
        lzw = bytearray()
        while pos < len(data) and data[pos] != 0:
            n = data[pos]
            lzw += data[pos + 1 : pos + 1 + n]
            pos += 1 + n
        pos += 1  # block terminator
        idx = _lzw_decode(min_code_size, bytes(lzw), w * h)
        if len(idx) < w * h:
            raise ValueError("GIF pixel data short of width*height")
        if ipacked & 0x40:  # interlaced: rows arrive in 4-pass order
            rows = bytearray(w * h)
            src = 0
            for start, step in _INTERLACE_PASSES:
                for y in range(start, h, step):
                    rows[y * w : (y + 1) * w] = idx[src : src + w]
                    src += w
            idx = bytes(rows)
        ncolors = len(table) // 3
        out = bytearray(w * h * 3)
        for i, ci in enumerate(idx):
            if ci >= ncolors:
                raise ValueError(f"GIF palette index {ci} out of range")
            out[3 * i : 3 * i + 3] = table[3 * ci : 3 * ci + 3]
        return w, h, 3, bytes(out)
    raise ValueError("GIF contains no image block")


def encode_gif(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    indices: bytes,
    *,
    interlace: bool = False,
) -> bytes:
    """Single-frame GIF89a from palette + index bytes. Uses literal LZW
    codes with a clear code before every symbol would widen the
    dictionary past the code width — valid per spec, and it makes every
    decode exercise the dictionary-reset path."""
    if len(indices) != width * height:
        raise ValueError("indices must be width*height bytes")
    bits = max(2, (len(palette) - 1).bit_length())
    size_field = bits - 1
    table_n = 1 << bits
    if len(palette) > table_n:
        raise ValueError("palette too large for its bit width")
    gct = bytearray()
    for i in range(table_n):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        gct += bytes((r, g, b))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (size_field << 4) | size_field, 0, 0)
    out += gct
    ipacked = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, ipacked)
    if interlace:
        reordered = bytearray()
        for start, step in _INTERLACE_PASSES:
            for y in range(start, height, step):
                reordered += indices[y * width : (y + 1) * width]
        indices = bytes(reordered)
    min_code = bits
    clear = 1 << min_code
    eoi = clear + 1
    codew = min_code + 1
    acc = 0
    nbits = 0
    stream = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += codew
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    # literal codes only; the dictionary grows one entry per emitted
    # symbol, so clear again before it would force a width bump
    budget = (1 << codew) - eoi - 1
    for ci in indices:
        if budget == 0:
            emit(clear)
            budget = (1 << codew) - eoi - 1
        emit(ci)
        budget -= 1
    emit(eoi)
    if nbits:
        stream.append(acc & 0xFF)
    out.append(min_code)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
