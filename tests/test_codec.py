"""Image codec + phash + generator: round-trip fidelity (PSNR gate per
BASELINE.json input_hint), error behavior, oracle bookkeeping sanity."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from rayval.functions.imagecodec import (
    CodecError,
    decode_image,
    encode_image,
    png_decode,
    png_encode,
    psnr,
)
from rayval.functions.phash import hamming64, phash64
from rayval.sources.images import generate_images, make_pixels


def test_png_roundtrip_exact():
    px = make_pixels(7, 33, 21)
    data = png_encode(px)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    out = png_decode(data)
    assert np.array_equal(out, px)  # lossless: exact (input_hint)
    assert psnr(out, px) == float("inf")


def test_lossy_roundtrip_psnr_gate():
    px = make_pixels(11, 48, 32)
    for fmt in ("jpeg", "webp"):
        out, got_fmt = decode_image(encode_image(px, fmt))
        assert got_fmt == fmt
        assert psnr(out, px) >= 40.0  # the 40 dB gate


def test_decode_detects_corruption():
    px = make_pixels(3, 20, 20)
    data = encode_image(px, "png")
    with pytest.raises(CodecError):
        decode_image(data[: len(data) // 3])
    with pytest.raises(CodecError):
        decode_image(b"garbage-not-an-image")
    # bit-flip inside IDAT -> CRC failure
    bad = bytearray(data)
    bad[50] ^= 0xFF
    with pytest.raises(CodecError):
        decode_image(bytes(bad))


def test_phash_properties():
    a = phash64(make_pixels(1, 32, 32))
    a2 = phash64(make_pixels(1, 32, 32))
    b = phash64(make_pixels(2, 32, 32))
    assert a == a2
    assert a != b
    assert hamming64(np.array([a, b]), a)[0] == 0
    assert hamming64(np.array([b]), a)[0] > 0


def test_generator_oracle_consistency(tmp_path):
    out = str(tmp_path / "imgs")
    generate_images(out, n=300, fragments=4, seed=42)
    imgs = pq.read_table(out + "/images")
    assert imgs.num_rows == 300
    assert imgs.schema.names == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    exp = pq.read_table(out + "/expected_violations.parquet")
    cids = set(exp["constraint_id"].to_pylist())
    assert {
        "image_id.pattern", "w.range", "w.decode_match", "fmt.enum",
        "fmt.decode_match", "caption.required", "caption.maxLength",
        "bytes.decodable", "phash.match", "phash.unique", "image_id.ref",
    } <= cids
    # determinism: regenerating into a fresh dir yields identical bytes
    out2 = str(tmp_path / "imgs2")
    generate_images(out2, n=300, fragments=4, seed=42)
    t1 = pq.read_table(out + "/images/part-00000.parquet")
    t2 = pq.read_table(out2 + "/images/part-00000.parquet")
    assert t1.equals(t2)


def test_generator_phash_matches_decode(tmp_path):
    """Stored phash == phash(decoded pixels) except planted phash.match rows."""
    out = str(tmp_path / "imgs")
    generate_images(out, n=200, fragments=2, seed=7)
    imgs = pq.read_table(out + "/images")
    exp = pq.read_table(out + "/expected_violations.parquet").to_pandas()
    bad_ids = set(exp[exp.constraint_id.isin(["phash.match", "bytes.decodable"])]["image_id"])
    mism = []
    for i in range(imgs.num_rows):
        row_id = imgs["image_id"][i].as_py()
        try:
            px, _ = decode_image(imgs["bytes"][i].as_py())
        except CodecError:
            assert row_id in bad_ids
            continue
        if phash64(px) != imgs["phash"][i].as_py():
            mism.append(row_id)
    assert set(mism) == set(exp[exp.constraint_id == "phash.match"]["image_id"])
