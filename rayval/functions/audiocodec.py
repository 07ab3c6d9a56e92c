"""Minimal REAL WAV (RIFF PCM) codec — stdlib struct + numpy only.

Encodes/decodes canonical PCM WAV: RIFF/WAVE container, ``fmt `` chunk
(format 1 = integer PCM, 8 or 16 bit), ``data`` chunk.  Files it writes are
valid WAVs playable anywhere; it decodes any standard PCM WAV of those bit
depths.  This replaces the round-1 fake byte-statistics audio decode with a
real parser, so ``AudioFeatures`` computes features from actual samples at
the actual sample rate.
"""

from __future__ import annotations

import struct

import numpy as np


class AudioCodecError(ValueError):
    pass


def wav_encode(samples: np.ndarray, rate: int = 16_000, bits: int = 16) -> bytes:
    """mono float samples in [-1, 1] -> PCM WAV bytes."""
    s = np.asarray(samples, dtype=np.float64).clip(-1.0, 1.0)
    if bits == 16:
        pcm = np.round(s * 32767.0).astype("<i2").tobytes()
        block = 2
    elif bits == 8:
        pcm = (np.round(s * 127.0) + 128).astype(np.uint8).tobytes()
        block = 1
    else:
        raise AudioCodecError(f"unsupported bit depth {bits}")
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * block, block, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data) -> tuple[np.ndarray, int, int]:
    """WAV bytes -> (float32 samples in [-1,1] shaped (n,) mono or (n, ch),
    sample_rate, channels).  Raises AudioCodecError on malformation."""
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise AudioCodecError("not a RIFF/WAVE container")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise AudioCodecError("truncated chunk")
        if tag == b"fmt ":
            if length < 16:
                raise AudioCodecError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", payload[:16])
        elif tag == b"data":
            pcm = payload
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise AudioCodecError("missing fmt/data chunk")
    audio_format, channels, rate, _byte_rate, _block, bits = fmt
    if audio_format != 1:
        raise AudioCodecError(f"unsupported WAV format {audio_format} (PCM only)")
    # a structurally valid container can still declare nonsense rate/channel
    # values; downstream divides by both, so they must be codec errors (data,
    # not task failures — AudioFeatures maps this to audio_ok=False)
    if rate <= 0:
        raise AudioCodecError(f"invalid sample rate {rate}")
    if channels < 1:
        raise AudioCodecError(f"invalid channel count {channels}")
    if bits == 16:
        if len(pcm) & 1:
            # odd data-chunk length is legal RIFF but can't be 16-bit PCM;
            # np.frombuffer would raise ValueError (not AudioCodecError) and
            # crash the task — truncate the dangling byte instead
            pcm = pcm[:-1]
        s = np.frombuffer(pcm, dtype="<i2").astype(np.float32) / 32767.0
    elif bits == 8:
        s = (np.frombuffer(pcm, dtype=np.uint8).astype(np.float32) - 128.0) / 127.0
    else:
        raise AudioCodecError(f"unsupported bit depth {bits}")
    if channels > 1:
        n = len(s) // channels
        s = s[: n * channels].reshape(n, channels)
    return s, rate, channels
