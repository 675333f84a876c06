"""Runnable walkthrough: REAL image bytes through the multimodal path.

Generates a handful of PNGs with the pure-stdlib encoder (one per
scanline filter type and channel layout), loads them as an
(image_id, payload binary) DataFrame, and extracts (width, height,
channels, mean_px) per image with ``png_feature_extract`` — the same
Arrow-batched ``mapInPandas`` plumbing the oracle-checked fake-decoder
queries use, but decoding actual zlib-compressed, filtered PNG pixel
data (``extensions/png.py``: inflate + Sub/Up/Average/Paeth unfilter).

Run:  python examples/multimodal_png.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_nats_spark.extensions.multimodal import png_feature_extract  # noqa: E402
from datafusion_nats_spark.extensions.png import encode_png  # noqa: E402
from datafusion_nats_spark.session import get_spark  # noqa: E402


def gradient(width: int, height: int, channels: int) -> bytes:
    return bytes(
        (x * 7 + y * 13 + c * 29) & 0xFF
        for y in range(height)
        for x in range(width)
        for c in range(channels)
    )


def main() -> None:
    spark = get_spark("multimodal-png-example")
    shapes = [
        ("gray/None", 64, 48, 1, 0),
        ("gray+alpha/Sub", 32, 32, 2, 1),
        ("rgb/Up", 40, 30, 3, 2),
        ("rgb/Average", 24, 24, 3, 3),
        ("rgba/Paeth", 16, 20, 4, 4),
    ]
    rows = []
    for i, (_label, w, h, c, ftype) in enumerate(shapes):
        px = gradient(w, h, c)
        rows.append((i, bytearray(encode_png(w, h, c, px, filter_type=ftype))))
    images = spark.createDataFrame(rows, "image_id long, payload binary")
    feats = png_feature_extract(images).orderBy("image_id").collect()
    print("image_id  width height channels   mean_px   (filter/layout)")
    for r, (label, *_rest) in zip(feats, shapes):
        print(
            f"{r.image_id:8d}  {r.width:5d} {r.height:6d} {r.channels:8d}"
            f"   {r.mean_px:8.3f}  {label}"
        )
    assert len(feats) == len(shapes)
    print(f"decoded {len(feats)} real PNGs via mapInPandas")

    # the same plumbing carries GIF (LZW+palette+interlace) and PCM WAV
    from datafusion_nats_spark.extensions.gif import encode_gif
    from datafusion_nats_spark.extensions.multimodal import wav_feature_extract
    from datafusion_nats_spark.extensions.wav import encode_wav

    pal = [(i * 16, 255 - i * 16, i * 8) for i in range(16)]
    gif = encode_gif(
        20, 12, pal, bytes((x + y) % 16 for y in range(12) for x in range(20)),
        interlace=True,
    )
    gfeat = png_feature_extract(
        spark.createDataFrame([(0, bytearray(gif))], "image_id long, payload binary")
    ).collect()[0]
    print(f"GIF: {gfeat.width}x{gfeat.height}x{gfeat.channels} mean_px={gfeat.mean_px:.2f}")

    from datafusion_nats_spark.extensions.jpeg import encode_jpeg

    jpg = encode_jpeg(32, 16, bytes((70, 140, 210)) * (32 * 16), subsample=True)
    jfeat = png_feature_extract(
        spark.createDataFrame([(0, bytearray(jpg))], "image_id long, payload binary")
    ).collect()[0]
    print(
        f"JPEG: {jfeat.width}x{jfeat.height}x{jfeat.channels} "
        f"mean_px={jfeat.mean_px:.2f} (4:2:0, flat-quant)"
    )

    tone = [9000 if (i // 40) % 2 == 0 else -9000 for i in range(8000)]
    wavb = encode_wav(8000, 1, tone)
    afeat = wav_feature_extract(
        spark.createDataFrame([(0, bytearray(wavb))], "audio_id long, payload binary")
    ).collect()[0]
    print(
        f"WAV: {afeat.n_channels}ch {afeat.sample_rate}Hz {afeat.duration_s:.1f}s "
        f"rms={afeat.rms:.0f} zcr={afeat.zcr:.4f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
