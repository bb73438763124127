"""Minimal PCM WAV codec (stdlib ``wave`` + numpy — no audio libs).

Covers the audio leg of the multimodal stages for real on-disk WAV
payloads: 16-bit PCM, mono or interleaved multi-channel.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 -> WAV bytes."""
    s = np.asarray(samples, dtype=np.int16)
    channels = 1 if s.ndim == 1 else s.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(s.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, (n,) or (n, channels) int16)."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        rate = wf.getframerate()
        channels = wf.getnchannels()
        raw = wf.readframes(wf.getnframes())
    s = np.frombuffer(raw, dtype=np.int16)
    if channels > 1:
        s = s.reshape(-1, channels)
    return rate, s
