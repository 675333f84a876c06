"""Real GIF decode (LZW + palette + interlace) through the multimodal
plumbing — companion to test_png_decode.py / test_wav_decode.py.

The encoder emits literal LZW codes with a clear code whenever the
dictionary would force a width bump, so every round-trip exercises the
decoder's dictionary-reset path; a second, hand-built stream exercises
real compression codes including the KwKwK corner case.
"""

from __future__ import annotations

import pytest

from datafusion_nats_spark.extensions.gif import (
    _lzw_decode,
    decode_gif,
    encode_gif,
)
from datafusion_nats_spark.extensions.multimodal import (
    decode_image,
    image_feature_extract,
)


def _palette(n: int) -> list[tuple[int, int, int]]:
    return [((i * 37) & 0xFF, (i * 59) & 0xFF, (i * 83) & 0xFF) for i in range(n)]


def _indices(w: int, h: int, n: int) -> bytes:
    return bytes((x * 3 + y * 7) % n for y in range(h) for x in range(w))


@pytest.mark.parametrize("ncolors", [4, 16, 256])
@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_palette_sizes_and_interlace(ncolors, interlace):
    w, h = 19, 13
    pal = _palette(ncolors)
    idx = _indices(w, h, ncolors)
    blob = encode_gif(w, h, pal, idx, interlace=interlace)
    gw, gh, gc, rgb = decode_gif(blob)
    assert (gw, gh, gc) == (w, h, 3)
    want = b"".join(bytes(pal[i]) for i in idx)
    assert rgb == want


def test_lzw_real_compression_codes_and_kwkwk():
    """Hand-packed stream with growing dictionary entries, including the
    KwKwK case (a code equal to the next unassigned dictionary slot)."""
    min_code = 2  # clear=4, eoi=5, first dict entry=6, width starts at 3
    codes = [4, 1, 1, 6, 8, 5]
    # decode walk: clear; 1; 1 (adds 6='11'); 6 -> '11' (adds 7='11');
    # 8 is the KwKwK case off prev='11' -> '111' (adds 8='111'); eoi.
    acc = 0
    nbits = 0
    out = bytearray()
    width = min_code + 1
    ndict = 6
    have_prev = False  # no dict entry is added for the first post-clear symbol
    for c in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if c == 4:
            ndict, width, have_prev = 6, min_code + 1, False
        elif c != 5:
            if have_prev:
                ndict += 1
                if ndict == (1 << width):
                    width += 1
            have_prev = True
    if nbits:
        out.append(acc & 0xFF)
    got = _lzw_decode(min_code, bytes(out), 7)
    assert got == bytes([1, 1, 1, 1, 1, 1, 1])


def test_malformed_gifs_fail_loudly():
    good = encode_gif(4, 4, _palette(4), _indices(4, 4, 4))
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"JIF89a" + good[6:])
    with pytest.raises(ValueError, match="truncated|no image"):
        decode_gif(good[:10])
    with pytest.raises(ValueError, match="truncated|LZW|short"):
        decode_gif(good[:-8] + b"\x00\x3b")  # chopped pixel data


def test_decode_image_dispatches_on_magic():
    pal = _palette(8)
    blob = encode_gif(6, 5, pal, _indices(6, 5, 8))
    w, h, c, mean = decode_image(blob)
    assert (w, h, c) == (6, 5, 3)
    rgb = b"".join(bytes(pal[i]) for i in _indices(6, 5, 8))
    assert mean == sum(rgb) / len(rgb)
    with pytest.raises(NotImplementedError, match="PNG, GIF"):
        decode_image(b"BM bmp-ish header bytes")


def test_mixed_png_and_gif_through_one_mapinpandas(spark):
    """One binary column carrying BOTH formats: decode_image dispatches
    per row inside the same Arrow batch."""
    from datafusion_nats_spark.extensions.png import encode_png

    pal = _palette(16)
    gif_idx = _indices(12, 9, 16)
    gif_blob = encode_gif(12, 9, pal, gif_idx, interlace=True)
    gif_rgb = b"".join(bytes(pal[i]) for i in gif_idx)
    png_px = bytes((x * 11 + y * 5) & 0xFF for y in range(7) for x in range(10) for _ in range(3))
    png_blob = encode_png(10, 7, 3, png_px, filter_type=4)
    images = spark.createDataFrame(
        [(0, bytearray(gif_blob)), (1, bytearray(png_blob))],
        "image_id long, payload binary",
    )
    got = {
        r.image_id: (r.width, r.height, r.channels, r.mean_px)
        for r in image_feature_extract(images).collect()
    }
    assert got == {
        0: (12, 9, 3, sum(gif_rgb) / len(gif_rgb)),
        1: (10, 7, 3, sum(png_px) / len(png_px)),
    }
