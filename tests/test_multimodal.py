"""Multimodal stages: real image resize; audio/video plumbing with the
clearly-marked deterministic fake decode."""

import numpy as np
import pyarrow as pa
import pytest

from rayval.functions.imagecodec import decode_image, encode_image
from rayval.sources.images import make_pixels
from rayval.stages.multimodal import AudioFeatures, ImageResize, VideoFrameSample


def _img_batch():
    rows = []
    for i, (w, h, fmt) in enumerate([(40, 30, "png"), (64, 48, "jpeg")]):
        rows.append(encode_image(make_pixels(i, w, h), fmt))
    rows.append(b"corrupt")
    return pa.table({"id": ["a", "b", "c"], "bytes": pa.array(rows, type=pa.binary())})


def test_image_resize_real():
    out = ImageResize(width=16, height=16)(_img_batch())
    assert out.column_names == ["id", "resized", "resize_ok"]
    assert out["resize_ok"].to_pylist() == [True, True, False]
    px, fmt = decode_image(out["resized"][0].as_py())
    assert fmt == "png" and px.shape == (16, 16, 3)
    # deterministic: same input -> same resized bytes
    out2 = ImageResize(width=16, height=16)(_img_batch())
    assert out["resized"][0].as_py() == out2["resized"][0].as_py()


def test_audio_features_real_wav():
    """REAL WAV decode: a 440 Hz sine at 16 kHz must yield the analytic
    duration, RMS (A/sqrt2), and zero-crossing count (2 per cycle); non-WAV
    and empty payloads are data failures."""
    import numpy as np

    from rayval.functions.audiocodec import wav_encode

    rate, secs, freq, amp = 16_000, 0.5, 440.0, 0.5
    t = np.arange(int(rate * secs)) / rate
    wav = wav_encode(amp * np.sin(2 * np.pi * freq * t), rate=rate)
    batch = pa.table(
        {"id": ["x", "y", "z"],
         "bytes": pa.array([wav, b"not a wav at all", b""], type=pa.binary())}
    )
    out = AudioFeatures()(batch)
    assert out.column_names == ["id", "duration_s", "sample_rate", "rms", "zero_crossings", "audio_ok"]
    assert out["audio_ok"].to_pylist() == [True, False, False]
    assert out["duration_s"][0].as_py() == pytest.approx(secs)
    assert out["sample_rate"][0].as_py() == rate
    assert out["rms"][0].as_py() == pytest.approx(amp / np.sqrt(2), rel=1e-3)
    assert out["zero_crossings"][0].as_py() == pytest.approx(2 * freq * secs, abs=2)


def test_wav_codec_roundtrip():
    import numpy as np

    from rayval.functions.audiocodec import wav_decode, wav_encode

    s = np.sin(np.linspace(0, 20, 1000)) * 0.9
    for bits in (16, 8):
        got, rate, ch = wav_decode(wav_encode(s, rate=8000, bits=bits))
        assert rate == 8000 and ch == 1
        tol = 1e-4 if bits == 16 else 1e-2
        assert np.abs(got - s).max() < tol


def test_wav_zero_rate_is_data_not_task_error():
    """A structurally valid WAV declaring rate=0 (or 0 channels) must be a
    codec error — AudioFeatures maps it to audio_ok=False instead of dying on
    the ZeroDivisionError in duration_s."""
    import struct

    import numpy as np
    import pytest

    from rayval.functions.audiocodec import AudioCodecError, wav_decode, wav_encode

    good = wav_encode(np.zeros(100), rate=8000)
    # fmt payload starts at byte 20: <HHIIHH = format, channels, rate, ...
    zero_rate = good[:24] + struct.pack("<I", 0) + good[28:]
    with pytest.raises(AudioCodecError):
        wav_decode(zero_rate)
    zero_ch = good[:22] + struct.pack("<H", 0) + good[24:]
    with pytest.raises(AudioCodecError):
        wav_decode(zero_ch)
    batch = pa.table({"id": ["a"], "bytes": pa.array([zero_rate], type=pa.binary())})
    out = AudioFeatures()(batch)
    assert out["audio_ok"][0].as_py() is False


def test_video_frame_sample_contract():
    data = bytes(range(100)) * 10
    batch = pa.table({"id": ["v"], "bytes": pa.array([data], type=pa.binary())})
    out = VideoFrameSample(k=4)(batch)
    assert out["frame_count"][0].as_py() == 4
    frames = out["frames"][0].as_py()
    assert b"".join(frames) == data  # slices tile the stream exactly


def test_annotate_union_member_index():
    from rayval.constraints import AnyOf, Field, Profile, Range
    from rayval.stages.validate import Annotate

    prof = Profile("u", [Field("x", AnyOf([Range(min=0, max=9), Range(min=10, max=99)]))], key="id")
    out = Annotate(prof.compile())(pa.table({"x": pa.array([5, 50, 500], type=pa.int64())}))
    assert out["x__member"].to_pylist() == [0, 1, -1]


def test_wav_odd_data_chunk_is_data_not_crash():
    """Odd-length 16-bit data chunk (legal RIFF) must not raise ValueError
    out of np.frombuffer — the dangling byte is truncated."""
    import struct

    import numpy as np

    from rayval.functions.audiocodec import wav_decode, wav_encode

    samples = (np.sin(np.linspace(0, 20, 200)) * 0.5).astype(np.float32)
    data = bytearray(wav_encode(samples, 8000))
    # append one dangling byte to the data chunk and patch its length
    pos = data.index(b"data")
    (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
    data[pos + 4 : pos + 8] = struct.pack("<I", length + 1)
    data += b"\x00"
    s, rate, ch = wav_decode(bytes(data))
    assert rate == 8000 and len(s) == 200  # dangling byte dropped


def test_lance_reader_import_gate():
    """No lance in this container: the real-cluster Lance entry must raise a
    clear NotImplementedError pointing at the tested parquet stand-in (the
    honest-stub pattern), from both the list and read surfaces."""
    import pytest

    from rayval.sources.lance import list_lance_fragments, read_lance_fragments

    with pytest.raises(NotImplementedError, match="read_fragments"):
        list_lance_fragments("/tmp/nonexistent.lance")
    with pytest.raises(NotImplementedError, match="parquet"):
        read_lance_fragments("/tmp/nonexistent.lance")
