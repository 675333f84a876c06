"""Pure-stdlib WAV (RIFF PCM) codec — the audio analogue of
``extensions/png.py``, so the multimodal AUDIO path decodes real media
in-sandbox too.

Python's ``wave`` module (stdlib) reads and writes RIFF/WAVE PCM
containers; this wraps it with a typed decode to integer samples
(8-bit unsigned and 16-bit signed little-endian PCM, any channel
count) plus an encoder for tests/examples. The decode runs inside
Arrow-batched ``mapInPandas`` exactly like the PNG and fake-decoder
paths — payload bytes never shuffle. Swap in soundfile/librosa for
float/compressed formats with the identical interface.
"""

from __future__ import annotations

import io
import struct
import wave

WAV_MAGIC = b"RIFF"


def decode_wav(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Decode a PCM WAV → (n_channels, sample_rate, n_frames,
    interleaved integer samples).

    Supports sampwidth 1 (unsigned 8-bit, rebased to signed around 0)
    and 2 (signed 16-bit LE). Raises ``ValueError`` on other widths,
    compressed WAVs, or a broken container.
    """
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            nch = w.getnchannels()
            rate = w.getframerate()
            nframes = w.getnframes()
            width = w.getsampwidth()
            raw = w.readframes(nframes)
    except (wave.Error, EOFError) as e:
        raise ValueError(f"broken WAV container: {e}") from e
    if rate <= 0:
        # stdlib wave accepts a fmt chunk with frame rate 0 on read;
        # downstream duration math (nframes / rate) must see the
        # documented ValueError, not a ZeroDivisionError in the task
        raise ValueError("broken WAV container: zero frame rate")
    if width == 1:
        samples = [b - 128 for b in raw]  # unsigned 8-bit -> centered
    elif width == 2:
        if len(raw) % 2:
            raise ValueError("odd byte count for 16-bit PCM")
        samples = list(struct.unpack(f"<{len(raw) // 2}h", raw))
    else:
        raise ValueError(f"unsupported PCM sample width {width} (only 8/16-bit)")
    return nch, rate, nframes, samples


def encode_wav(
    sample_rate: int, channels: int, samples: list[int], *, sampwidth: int = 2
) -> bytes:
    """Interleaved integer samples → PCM WAV bytes (8-bit unsigned or
    16-bit signed)."""
    if sampwidth == 1:
        raw = bytes((s + 128) & 0xFF for s in samples)
    elif sampwidth == 2:
        raw = struct.pack(f"<{len(samples)}h", *samples)
    else:
        raise ValueError(f"sampwidth must be 1 or 2, got {sampwidth}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        w.writeframes(raw)
    return buf.getvalue()
