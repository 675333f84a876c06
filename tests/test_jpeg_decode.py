"""Baseline JPEG decode through the multimodal plumbing — companion to
the PNG/GIF/WAV suites.

JPEG is lossy, so the pins are a mix of exact anchors and bounded
error:

- a UNIFORM color image is DC-only under a flat quantization table, so
  decode must return a uniform image within the analytic quantization
  error (flat-q16 -> max |err| <= q/8 rounding, empirically <= 2);
- smooth gradients round-trip within tight mean/max bounds at 4:4:4
  and looser chroma bounds at 4:2:0 (nearest-neighbor upsampling);
- restart markers (DRI + RSTn) decode identically to the marker-free
  encoding of the same pixels — the predictor-reset path changes the
  stream layout, not the output;
- grayscale (1-component) structure, malformed streams, and the
  progressive-JPEG refusal all fail loudly;
- the Spark path decodes a mixed PNG+GIF+JPEG binary column in one
  mapInPandas pass.
"""

from __future__ import annotations

import pytest

from datafusion_nats_spark.extensions.jpeg import (
    decode_jpeg,
    encode_jpeg,
)
from datafusion_nats_spark.extensions.multimodal import (
    decode_image,
    image_feature_extract,
)


def _smooth(w: int, h: int) -> bytes:
    # no mod-256 wraps: chroma stays smooth so 4:2:0 bounds stay tight
    return bytes(
        min(255, (x * 200) // max(w - 1, 1)) if c == 0
        else min(255, (y * 200) // max(h - 1, 1)) if c == 1
        else 60
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )


@pytest.mark.parametrize("color", [(200, 100, 50), (0, 0, 0), (255, 255, 255)])
@pytest.mark.parametrize("subsample", [False, True])
def test_flat_color_is_analytically_exact(color, subsample):
    w, h = 24, 16
    rgb = bytes(color) * (w * h)
    gw, gh, gc, out = decode_jpeg(encode_jpeg(w, h, rgb, subsample=subsample))
    assert (gw, gh, gc) == (w, h, 3)
    assert max(abs(a - b) for a, b in zip(out, rgb)) <= 2


@pytest.mark.parametrize("subsample,max_tol,mean_tol", [(False, 16, 4.0), (True, 24, 6.0)])
def test_gradient_roundtrip_bounded(subsample, max_tol, mean_tol):
    w, h = 40, 24
    rgb = _smooth(w, h)
    gw, gh, gc, out = decode_jpeg(encode_jpeg(w, h, rgb, subsample=subsample))
    assert (gw, gh, gc) == (w, h, 3)
    diffs = [abs(a - b) for a, b in zip(out, rgb)]
    assert max(diffs) <= max_tol, max(diffs)
    assert sum(diffs) / len(diffs) <= mean_tol


@pytest.mark.parametrize("interval", [1, 2, 5])
def test_restart_markers_do_not_change_pixels(interval):
    w, h = 33, 17  # non-MCU-aligned on purpose
    rgb = _smooth(w, h)
    plain = decode_jpeg(encode_jpeg(w, h, rgb))
    with_rst = decode_jpeg(encode_jpeg(w, h, rgb, restart_interval=interval))
    assert plain == with_rst


def test_odd_sizes_and_subsampled_geometry():
    for w, h in [(1, 1), (7, 3), (9, 9), (17, 8)]:
        rgb = _smooth(w, h)
        for sub in (False, True):
            gw, gh, gc, out = decode_jpeg(encode_jpeg(w, h, rgb, subsample=sub))
            assert (gw, gh, gc, len(out)) == (w, h, 3, w * h * 3)


def test_malformed_and_unsupported_fail_loudly():
    good = encode_jpeg(8, 8, _smooth(8, 8))
    with pytest.raises(ValueError, match="signature"):
        decode_jpeg(b"\x89PNG" + good)
    with pytest.raises(ValueError):
        decode_jpeg(good[:30])
    # flip SOF0 -> SOF2 (progressive): explicit refusal, not garbage
    prog = bytearray(good)
    idx = prog.find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(prog))


def test_fill_bytes_before_markers_are_legal():
    """ITU T.81 B.1.1.2: any marker may be preceded by repeated 0xFF fill
    bytes. The segment walk must skip them — not read a garbage segment
    length (ADVICE round 5)."""
    good = encode_jpeg(8, 8, _smooth(8, 8))
    want = decode_jpeg(good)
    # insert fill bytes before SOF0 and before SOS
    for marker in (b"\xff\xc0", b"\xff\xda"):
        padded = bytearray(good)
        idx = padded.find(marker)
        assert idx > 0
        padded[idx:idx] = b"\xff\xff\xff"  # fill + the marker's own 0xFF
        assert decode_jpeg(bytes(padded)) == want


def test_truncated_fill_padded_stream_is_valueerror():
    """Round-6 self-review: the fill-byte skip can advance past the loop
    header's bounds check — truncated fill-padded containers must stay
    ValueError, never IndexError/struct.error."""
    for blob in (
        b"\xff\xd8" + b"\xff" * 4,          # fill bytes run to EOF
        b"\xff\xd8\xff\xff\xff\xe0",        # marker id at EOF, no seglen
        b"\xff\xd8\xff\xff\xff\xe0\x00",    # one byte of seglen only
    ):
        with pytest.raises(ValueError, match="truncated JPEG"):
            decode_jpeg(blob)


def test_sos_component_id_mismatch_is_valueerror():
    """An SOS whose component ids don't match the SOF frame is a
    malformed container: documented ValueError, never a KeyError
    (ADVICE round 5)."""
    good = encode_jpeg(8, 8, _smooth(8, 8))
    bad = bytearray(good)
    idx = bad.find(b"\xff\xda")
    # SOS layout: FF DA len(2) ns then (component id, tables) pairs —
    # remap every scan component id to id+7 so none match the SOF ids
    ns = bad[idx + 4]
    for i in range(ns):
        bad[idx + 5 + 2 * i] += 7
    with pytest.raises(ValueError, match="SOS does not select"):
        decode_jpeg(bytes(bad))


def test_three_formats_through_one_mapinpandas(spark):
    from datafusion_nats_spark.extensions.gif import encode_gif
    from datafusion_nats_spark.extensions.png import encode_png

    png_px = bytes((x * 7 + y) & 0xFF for y in range(6) for x in range(8))
    png_blob = encode_png(8, 6, 1, png_px, filter_type=2)
    pal = [(i * 8, i * 4, 255 - i) for i in range(32)]
    gif_idx = bytes((x + y) % 32 for y in range(5) for x in range(11))
    gif_blob = encode_gif(11, 5, pal, gif_idx)
    jpg_rgb = bytes((90, 160, 30)) * (16 * 8)
    jpg_blob = encode_jpeg(16, 8, jpg_rgb)
    images = spark.createDataFrame(
        [(0, bytearray(png_blob)), (1, bytearray(gif_blob)), (2, bytearray(jpg_blob))],
        "image_id long, payload binary",
    )
    got = {
        r.image_id: (r.width, r.height, r.channels)
        for r in image_feature_extract(images).collect()
    }
    assert got == {0: (8, 6, 1), 1: (11, 5, 3), 2: (16, 8, 3)}
    # and the JPEG mean matches a local decode exactly (same code path)
    _, _, _, px = decode_jpeg(jpg_blob)
    local = decode_image(jpg_blob)
    assert local[3] == sum(px) / len(px)
