"""Real PCM WAV decode through the multimodal mapInPandas plumbing —
the audio twin of test_png_decode.py.

Pins: encode→decode round-trips exact integer samples for 8-bit and
16-bit PCM, mono and stereo; decode_audio's rms/zcr match a plain-
Python walk bit-exactly (integer-derived arithmetic); compressed/alien
bytes fail at the documented plug-in boundary; broken RIFF containers
raise ValueError; and the Spark path returns exactly the per-file
features the local decode computes.
"""

from __future__ import annotations

import pytest

from datafusion_nats_spark.extensions.multimodal import (
    decode_audio,
    wav_feature_extract,
)
from datafusion_nats_spark.extensions.wav import decode_wav, encode_wav


def _tone(n: int, period: int, amp: int, channels: int) -> list[int]:
    """Deterministic square-ish wave, interleaved across channels."""
    return [
        (amp if (i // period) % 2 == 0 else -amp) + c * 3
        for i in range(n)
        for c in range(channels)
    ]


@pytest.mark.parametrize("sampwidth,amp", [(1, 100), (2, 12000)])
@pytest.mark.parametrize("channels", [1, 2])
def test_roundtrip_pcm(sampwidth, amp, channels):
    samples = _tone(400, 7, amp, channels)
    blob = encode_wav(8000, channels, samples, sampwidth=sampwidth)
    nch, rate, nframes, got = decode_wav(blob)
    assert (nch, rate, nframes) == (channels, 8000, 400)
    assert got == samples


def test_decode_audio_features_match_python_walk():
    samples = _tone(1000, 13, 9000, 1)
    blob = encode_wav(16000, 1, samples)
    nch, rate, nframes, rms, zcr = decode_audio(blob)
    assert (nch, rate, nframes) == (1, 16000, 1000)
    want_rms = (sum(s * s for s in samples) / len(samples)) ** 0.5
    flips = sum(1 for a, b in zip(samples, samples[1:]) if (a >= 0) != (b >= 0))
    assert rms == want_rms  # bit-exact: integer sums, one division, one sqrt
    assert zcr == flips / (len(samples) - 1)


def test_plugin_boundary_and_broken_containers():
    with pytest.raises(NotImplementedError, match="WAV"):
        decode_audio(b"\xff\xfb\x90\x00 mp3-ish frame header")
    good = encode_wav(8000, 1, _tone(50, 5, 1000, 1))
    with pytest.raises(ValueError, match="broken WAV"):
        decode_wav(good[:20])  # truncated header
    # 16-bit flag but odd data length: corrupt the data chunk size path
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00WAVEjunk")
    # fmt chunk with frame rate 0: stdlib wave reads it happily, but the
    # duration math downstream (nframes / rate) must never see it — the
    # guard raises the documented ValueError, not ZeroDivisionError
    # (ADVICE round 5). Build it by patching the rate field of a good WAV:
    # byteRate (offset 28) = rate * block_align, sampleRate at offset 24.
    zero_rate = bytearray(good)
    zero_rate[24:28] = (0).to_bytes(4, "little")
    zero_rate[28:32] = (0).to_bytes(4, "little")
    import io
    import wave

    with wave.open(io.BytesIO(bytes(zero_rate)), "rb") as w:
        assert w.getframerate() == 0  # stdlib accepts it on read
    with pytest.raises(ValueError, match="zero frame rate"):
        decode_wav(bytes(zero_rate))


def test_wav_feature_extract_through_mapinpandas(spark):
    cases = [
        (0, 8000, 1, 1, _tone(200, 5, 90, 1)),
        (1, 16000, 2, 2, _tone(300, 11, 11000, 2)),
        (2, 44100, 1, 2, _tone(441, 3, 5000, 1)),
    ]
    rows = []
    expected = {}
    for aid, rate, ch, width, samples in cases:
        blob = encode_wav(rate, ch, samples, sampwidth=width)
        rows.append((aid, bytearray(blob)))
        nch, r, nf, rms, zcr = decode_audio(blob)
        expected[aid] = (nch, r, nf, nf / r, rms, zcr)
    audio = spark.createDataFrame(rows, "audio_id long, payload binary")
    got = {
        r.audio_id: (r.n_channels, r.sample_rate, r.n_frames, r.duration_s, r.rms, r.zcr)
        for r in wav_feature_extract(audio).collect()
    }
    assert got == expected
