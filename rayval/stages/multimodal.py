"""Multimodal column stages beyond images.

The Ray-side plumbing (schema contract, actor-pool signature, batch handling,
output layout) is REAL and tested; only the codec internals differ:

- ``ImageResize``: fully real — decodes with the in-repo codecs and resizes
  with numpy nearest-neighbor sampling; output is re-encoded PNG.
- ``AudioFeatures``: fully real — stdlib RIFF/PCM WAV parser
  (functions/audiocodec.py), features computed from actual samples at the
  actual sample rate.
- ``VideoFrameSample``: the container has no video libraries, so frame
  extraction is a DETERMINISTIC FAKE clearly marked below (equal byte-range
  slices standing in for keyframe extraction).  Swapping in ffmpeg changes
  ONLY the marked loop body — the stage contract (binary column in,
  list<binary> frames out, per-row error capture) is the deliverable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rayval.functions.audiocodec import AudioCodecError, wav_decode
from rayval.functions.imagecodec import CodecError, decode_image, png_encode


class ImageResize:
    """Actor-pool stage: bytes -> resized PNG bytes (+ dims).  Real decode,
    real nearest-neighbor resample, real re-encode."""

    def __init__(self, width: int = 64, height: int = 64):
        self.w, self.h = width, height

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["bytes"]
        payloads = payloads.combine_chunks() if isinstance(payloads, pa.ChunkedArray) else payloads
        out_bytes: list = []
        ok = np.ones(batch.num_rows, dtype=bool)
        for i in range(batch.num_rows):
            data = payloads[i].as_py()
            try:
                px, _ = decode_image(data)
                ys = np.linspace(0, px.shape[0] - 1, self.h).round().astype(int)
                xs = np.linspace(0, px.shape[1] - 1, self.w).round().astype(int)
                out_bytes.append(png_encode(px[np.ix_(ys, xs)]))
            except (CodecError, TypeError):
                ok[i] = False
                out_bytes.append(None)
        batch = batch.drop_columns(["bytes"])
        batch = batch.append_column("resized", pa.array(out_bytes, type=pa.binary()))
        return batch.append_column("resize_ok", pa.array(ok))


class AudioFeatures:
    """Actor-pool stage: WAV bytes -> (duration_s, sample_rate, rms,
    zero_crossings, audio_ok).

    REAL DECODE: stdlib RIFF/PCM WAV parser (functions/audiocodec.py) — no
    external audio libraries needed.  Undecodable bytes are DATA
    (audio_ok=False), never task errors, mirroring the image decode stage."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["bytes"]
        payloads = payloads.combine_chunks() if isinstance(payloads, pa.ChunkedArray) else payloads
        n = batch.num_rows
        dur = np.zeros(n, dtype=np.float64)
        rate_out = np.zeros(n, dtype=np.int32)
        rms = np.zeros(n, dtype=np.float64)
        zc = np.zeros(n, dtype=np.int64)
        ok = np.ones(n, dtype=bool)
        for i in range(n):
            data = payloads[i].as_py()
            try:
                s, rate, _ch = wav_decode(data) if data else (None, 0, 0)
            except AudioCodecError:
                s = None
            if s is None or not len(s):
                ok[i] = False
                continue
            mono = s.mean(axis=1) if s.ndim == 2 else s
            dur[i] = len(mono) / rate
            rate_out[i] = rate
            rms[i] = float(np.sqrt(np.mean(mono * mono)))
            zc[i] = int(np.count_nonzero(np.diff(np.signbit(mono))))
        batch = batch.drop_columns(["bytes"])
        for name, arr in (
            ("duration_s", dur),
            ("sample_rate", rate_out),
            ("rms", rms),
            ("zero_crossings", zc),
        ):
            batch = batch.append_column(name, pa.array(arr))
        return batch.append_column("audio_ok", pa.array(ok))


class VideoFrameSample:
    """Actor-pool stage: video bytes -> k sampled 'frames' (binary list).

    DETERMINISTIC FAKE DECODE: frames are equal byte-range slices standing in
    for ffmpeg keyframe extraction; the output layout (list<binary> frames +
    frame_count) is the real contract downstream stages consume."""

    def __init__(self, k: int = 4):
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["bytes"]
        payloads = payloads.combine_chunks() if isinstance(payloads, pa.ChunkedArray) else payloads
        frames: list = []
        counts = np.zeros(batch.num_rows, dtype=np.int32)
        for i in range(batch.num_rows):
            data = payloads[i].as_py()
            if not data:
                frames.append(None)
                continue
            bounds = np.linspace(0, len(data), self.k + 1).astype(int)
            fr = [data[a:b] for a, b in zip(bounds[:-1], bounds[1:]) if b > a]
            frames.append(fr)
            counts[i] = len(fr)
        batch = batch.drop_columns(["bytes"])
        batch = batch.append_column("frames", pa.array(frames, type=pa.list_(pa.binary())))
        return batch.append_column("frame_count", pa.array(counts))
