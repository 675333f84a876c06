"""Real PNG decode through the multimodal mapInPandas plumbing
(round-5 ask #4: the decoder is no longer a stub for PNG).

Pins, pure first principles:

- encode→decode round-trips EXACT pixel bytes for every scanline
  filter type (0 None / 1 Sub / 2 Up / 3 Average / 4 Paeth) × every
  supported channel count (gray, gray+alpha, RGB, RGBA) — the filters
  are implemented from the PNG spec, so a reference walk over the same
  gradient must reproduce the buffer byte-for-byte;
- a third-party-shaped PNG (written by a different code path: zlib
  level 9, multiple IDAT chunks) still decodes;
- malformed inputs fail loudly (bad signature, truncated, 16-bit,
  interlaced) — never garbage pixels;
- the Spark path: generated PNGs → binary column → png_feature_extract
  (Arrow-batched mapInPandas) → (w, h, channels, mean) rows matching a
  plain-Python decode of the same bytes exactly, including the
  integer-sum/count mean (bit-exact division);
- decode_image refuses non-PNG bytes with NotImplementedError (the
  documented plug-in boundary for JPEG/audio/video).
"""

from __future__ import annotations

import struct
import zlib

import pytest

from datafusion_nats_spark.extensions.multimodal import (
    decode_image,
    png_feature_extract,
)
from datafusion_nats_spark.extensions.png import PNG_SIG, decode_png, encode_png


def _gradient(width: int, height: int, channels: int) -> bytes:
    """Deterministic non-trivial pixel field: every byte depends on
    (x, y, channel) so filter arithmetic actually mixes neighbors."""
    return bytes(
        (x * 7 + y * 13 + c * 29 + (x * y) % 31) & 0xFF
        for y in range(height)
        for x in range(width)
        for c in range(channels)
    )


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_every_filter_and_colortype(filter_type, channels):
    w, h = 23, 11  # odd sizes: exercise non-aligned strides
    px = _gradient(w, h, channels)
    blob = encode_png(w, h, channels, px, filter_type=filter_type)
    assert blob[:8] == PNG_SIG
    gw, gh, gc, gpx = decode_png(blob)
    assert (gw, gh, gc) == (w, h, channels)
    assert gpx == px


def test_decodes_foreign_style_png_with_split_idat():
    # a writer this module didn't produce: max-compression stream split
    # across multiple IDAT chunks (legal per spec §11.2.4)
    w, h, c = 9, 5, 3
    px = _gradient(w, h, c)
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += px[y * w * c : (y + 1) * w * c]
    comp = zlib.compress(bytes(raw), 9)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = PNG_SIG + chunk(b"IHDR", ihdr)
    for i in range(0, len(comp), 7):  # deliberately tiny IDAT pieces
        blob += chunk(b"IDAT", comp[i : i + 7])
    blob += chunk(b"IEND", b"")
    assert decode_png(blob) == (w, h, c, px)


def test_malformed_inputs_fail_loudly():
    good = encode_png(4, 4, 1, _gradient(4, 4, 1))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a" + good)
    with pytest.raises(ValueError, match="truncated|IHDR|mismatch"):
        decode_png(good[:20])
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    bad = PNG_SIG + struct.pack(">I", 13) + b"IHDR" + ihdr16 + b"\0\0\0\0"
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bad)
    ihdr_i = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    bad = PNG_SIG + struct.pack(">I", 13) + b"IHDR" + ihdr_i + b"\0\0\0\0"
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(bad)


def test_decode_image_rejects_non_png_at_plugin_boundary():
    # WebP-shaped bytes: a format that genuinely needs native libraries
    with pytest.raises(NotImplementedError, match="PNG"):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")
    # a JPEG magic now dispatches to the real baseline decoder, which
    # fails loudly on a truncated stream rather than NotImplementedError
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 truncated jpeg header")


def test_png_feature_extract_through_mapinpandas(spark):
    shapes = [(8, 8, 1, 0), (16, 4, 3, 2), (5, 7, 4, 4), (32, 2, 2, 1)]
    rows = []
    expected = {}
    for i, (w, h, c, ftype) in enumerate(shapes):
        px = _gradient(w, h, c)
        blob = encode_png(w, h, c, px, filter_type=ftype)
        rows.append((i, bytearray(blob)))
        expected[i] = (w, h, c, sum(px) / len(px))
    images = spark.createDataFrame(rows, "image_id long, payload binary")
    got = {
        r.image_id: (r.width, r.height, r.channels, r.mean_px)
        for r in png_feature_extract(images).collect()
    }
    assert got == expected  # exact, incl. the bit-exact integer/count mean
