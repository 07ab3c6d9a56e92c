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


def test_audio_features_contract():
    batch = pa.table({"id": ["x", "y"], "bytes": pa.array([bytes(range(256)) * 10, b""], type=pa.binary())})
    out = AudioFeatures()(batch)
    assert out.column_names == ["id", "duration_s", "rms", "zero_crossings", "audio_ok"]
    assert out["audio_ok"].to_pylist() == [True, False]
    assert out["duration_s"][0].as_py() == pytest.approx(2560 / 16000)
    assert out["rms"][0].as_py() > 0


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
