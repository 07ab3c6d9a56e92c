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


def test_decode_check_fidelity_gate():
    """Per-row fidelity (input_hint PSNR>=40dB): canonical payloads pass; a
    lossy container whose quantizer step cannot guarantee 40 dB is flagged;
    a recompressed (non-canonical) lossless payload is flagged.  No Ray —
    DecodeCheck is a plain callable over an Arrow table."""
    import struct
    import zlib

    import pyarrow as pa

    from rayval.functions.imagecodec import (
        FAKE_MAGIC_REV, lossy_expected_psnr, lossy_qstep,
    )
    from rayval.functions.phash import phash64
    from rayval.stages.decode import DecodeCheck

    px = make_pixels(5, 40, 30)
    png_b = encode_image(px, "png")
    jpg_b = encode_image(px, "jpeg")

    # coarse-quantizer container: SAME q payload, header step 16 -> decodes
    # fine but guarantees only ~34.8 dB < 40
    q = (px // 4).astype(np.uint8)
    coarse = FAKE_MAGIC_REV["jpeg"] + struct.pack(">IIB", 40, 30, 16) + zlib.compress(q.tobytes(), 6)
    assert lossy_qstep(coarse) == 16 and lossy_expected_psnr(16) < 40.0 < lossy_expected_psnr(8)

    # non-canonical png: identical pixels, IDAT recompressed at zlib level 9
    # -> decodes equal but is NOT the canonical encoding (recompression
    # lineage) -> flagged
    from rayval.functions.imagecodec import PNG_SIG, _chunk
    h_, w_ = 30, 40
    ihdr = struct.pack(">IIBBBBB", w_, h_, 8, 2, 0, 0, 0)
    raw = np.empty((h_, 1 + w_ * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = px.reshape(h_, w_ * 3)
    noncanon = PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 9)) + _chunk(b"IEND", b"")
    assert noncanon != png_b and np.array_equal(decode_image(noncanon)[0], px)

    rows = {
        "image_id": ["ok-png", "ok-jpg", "bad-coarse", "bad-recomp"],
        "bytes": [png_b, jpg_b, coarse, noncanon],
        "w": [40, 40, 40, 40],
        "h": [30, 30, 30, 30],
        "fmt": ["png", "jpeg", "jpeg", "png"],
        "phash": [int(np.int64(np.uint64(phash64(px)))),
                  int(np.int64(np.uint64(phash64(decode_image(jpg_b)[0])))),
                  int(np.int64(np.uint64(phash64(decode_image(coarse)[0])))),
                  int(np.int64(np.uint64(phash64(px))))],
    }
    t = pa.table(rows)
    out = DecodeCheck(psnr_check=True)(t)
    fid = dict(zip(out["image_id"].to_pylist(), out["ok__bytes.fidelity"].to_pylist()))
    assert fid == {"ok-png": True, "ok-jpg": True, "bad-coarse": False, "bad-recomp": False}
    # without the flag the column is absent (and nothing else changes)
    out2 = DecodeCheck(psnr_check=False)(t)
    assert "ok__bytes.fidelity" not in out2.column_names


def test_short_ihdr_is_codec_error():
    """A CRC-valid IHDR with length != 13 must raise CodecError (struct.error
    would escape the decode stage's except and kill the task)."""
    import struct
    import zlib

    from rayval.functions.imagecodec import PNG_SIG

    def chunk(tag, payload):
        return struct.pack(">I", len(payload)) + tag + payload + struct.pack(
            ">I", zlib.crc32(payload, zlib.crc32(tag)) & 0xFFFFFFFF)

    bad = PNG_SIG + chunk(b"IHDR", b"\x00" * 12) + chunk(b"IDAT", b"x") + chunk(b"IEND", b"")
    with pytest.raises(CodecError, match="IHDR length"):
        decode_image(bad)


def test_decode_check_null_metadata_batch():
    """A null in one row's declared metadata must not corrupt the whole
    batch's cross-checks (the old full-block to_numpy widened int64 phashes
    through float64 past 2^53 -> every row failed phash.match), and a null
    declaration itself asserts nothing (three-valued pin: only `required`
    fails nulls)."""
    import numpy as np
    import pyarrow as pa

    from rayval.functions.imagecodec import encode_image
    from rayval.functions.phash import phash64
    from rayval.stages.decode import DecodeCheck

    rng = np.random.default_rng(4)
    px = [rng.integers(0, 255, (8, 10, 3), dtype=np.uint8) for _ in range(3)]
    payloads = [encode_image(p, "png") for p in px]
    phs = [int(np.int64(np.uint64(phash64(p)).astype(np.int64))) for p in px]
    t = pa.table({
        "image_id": pa.array(["a", "b", "c"]),
        "bytes": pa.array(payloads, pa.binary()),
        "w": pa.array([10, None, 10], pa.int32()),
        "h": pa.array([8, 8, 8], pa.int32()),
        "fmt": pa.array(["png", "png", None]),
        "phash": pa.array([phs[0], phs[1], None], pa.int64()),
        "partition_id": pa.array([0, 0, 0], pa.int64()),
    })
    out = DecodeCheck()(t)
    cols = {c: out[c].to_pylist() for c in out.column_names if c.startswith("ok__")}
    assert cols["ok__phash.match"] == [True, True, True]   # valid ones match; null passes
    assert cols["ok__w.decode_match"] == [True, True, True]  # null w asserts nothing
    assert cols["ok__fmt.decode_match"] == [True, True, True]
    assert cols["ok__h.decode_match"] == [True, True, True]
