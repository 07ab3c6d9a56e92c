"""WebDataset tar-shard source/sink conformance.

The contract under test is the module docstring's fidelity + idempotence
claims: payload bit-equality, caption BYTE-equality (None vs "" preserved),
typed metadata surviving the JSON trip, deterministic content-addressed
shard names, and loud failure on malformed shards.
"""

import os
import tarfile

import pyarrow as pa
import pytest

from rayval.sources.webdataset import (
    FLAGSHIP_META_SCHEMA,
    parse_shard,
    read_webdataset,
    shard_bytes_of_batch,
    write_webdataset,
)


def _table(rows):
    cols = {k: [r.get(k) for r in rows] for k in ("image_id", "w", "h", "fmt", "phash")}
    return pa.table(
        {
            "image_id": pa.array(cols["image_id"], pa.string()),
            "bytes": pa.array([r.get("bytes") for r in rows], pa.binary()),
            "w": pa.array(cols["w"], pa.int32()),
            "h": pa.array(cols["h"], pa.int32()),
            "fmt": pa.array(cols["fmt"], pa.string()),
            "caption": pa.array([r.get("caption") for r in rows], pa.string()),
            "phash": pa.array(cols["phash"], pa.int64()),
        }
    )


ROWS = [
    # high-bit payload bytes (the signed-memoryview gotcha), unicode caption
    {"image_id": "img-0001", "bytes": b"\x89PNG\xff\xfe\x00hi", "w": 8, "h": 4,
     "fmt": "png", "caption": "café ☃", "phash": -5},
    # empty caption must round-trip as "" (member present, zero bytes) ...
    {"image_id": "img-0002", "bytes": b"", "w": 1, "h": 1, "fmt": "jpeg",
     "caption": "", "phash": 2**62},
    # ... while a NULL caption means the member is absent
    {"image_id": "img-0003", "bytes": b"xyz", "w": None, "h": 3, "fmt": None,
     "caption": None, "phash": None},
    # null payload: no payload member at all
    {"image_id": "img/..weird id!", "bytes": None, "w": 2, "h": 2, "fmt": "bmp",
     "caption": "null payload", "phash": 7},
]


def test_parse_inverts_serialize_bit_exact():
    src = _table(ROWS)
    out = parse_shard(shard_bytes_of_batch(src))
    assert out.num_rows == src.num_rows
    back = {out["image_id"][i].as_py(): i for i in range(out.num_rows)}
    # the weird key is sanitized in the tar but image_id itself rides in
    # .json, so the column value must be returned verbatim
    assert set(back) == {r["image_id"] for r in ROWS}
    for r in ROWS:
        i = back[r["image_id"]]
        assert out["bytes"][i].as_py() == r["bytes"]
        assert out["caption"][i].as_py() == r["caption"]
        for c in ("w", "h", "fmt", "phash"):
            assert out[c][i].as_py() == r[c], c
    assert out.schema.field("w").type == pa.int32()
    assert out.schema.field("phash").type == pa.int64()


def test_shard_bytes_deterministic_and_row_order_insensitive():
    src = _table(ROWS)
    a = shard_bytes_of_batch(src)
    assert a == shard_bytes_of_batch(src)
    # members are sorted by key, so a permuted batch serializes identically
    perm = src.take(pa.array([2, 0, 3, 1]))
    assert shard_bytes_of_batch(perm) == a
    # deterministic tar metadata: no timestamps leak in
    with tarfile.open(fileobj=__import__("io").BytesIO(a)) as tf:
        assert all(m.mtime == 0 and m.uid == 0 for m in tf.getmembers())


def test_within_shard_key_collision_decollides():
    t = pa.table(
        {
            "image_id": pa.array(["dup", "dup"], pa.string()),
            "bytes": pa.array([b"a", b"b"], pa.binary()),
            "w": pa.array([1, 2], pa.int32()),
            "h": pa.array([1, 2], pa.int32()),
            "fmt": pa.array(["png", "png"], pa.string()),
            "caption": pa.array(["x", "y"], pa.string()),
            "phash": pa.array([1, 2], pa.int64()),
        }
    )
    out = parse_shard(shard_bytes_of_batch(t))
    assert out.num_rows == 2
    assert sorted(out["bytes"].to_pylist()) == [b"a", b"b"]


def test_malformed_shard_raises():
    import io as _io

    buf = _io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo("orphan.png")
        payload = b"p"
        info.size = len(payload)
        tf.addfile(info, _io.BytesIO(payload))
    with pytest.raises(ValueError, match="no .json"):
        parse_shard(buf.getvalue())
    with pytest.raises(ValueError, match="without extension"):
        bad = _io.BytesIO()
        with tarfile.open(fileobj=bad, mode="w") as tf:
            info = tarfile.TarInfo("noext")
            info.size = 0
            tf.addfile(info, _io.BytesIO(b""))
        parse_shard(bad.getvalue())


def test_ray_roundtrip_multi_shard(ray_session, tmp_path):
    import ray

    rows = [
        {"image_id": f"img-{i:04d}", "bytes": bytes([i % 251]) * (i % 17 + 1),
         "w": i, "h": i * 2, "fmt": "png" if i % 2 else "jpeg",
         "caption": f"cap {i}" if i % 3 else None, "phash": i * 1_000_003}
        for i in range(50)
    ]
    src = _table(rows)
    ds = ray.data.from_arrow(src)
    out_dir = str(tmp_path / "wds")
    manifest = write_webdataset(ds, out_dir, rows_per_shard=8)
    assert manifest["n_rows"].to_pandas().sum() == 50
    assert len(manifest) >= 50 // 8  # multi-shard layout actually exercised
    got = read_webdataset(out_dir).take_all()
    got = {r["image_id"]: r for r in got}
    assert len(got) == 50
    for r in rows:
        g = got[r["image_id"]]
        assert g["bytes"] == r["bytes"]
        assert g["caption"] == r["caption"]
        assert g["w"] == r["w"] and g["phash"] == r["phash"] and g["fmt"] == r["fmt"]
    # idempotence: re-writing the same dataset adds no new shards (names are
    # content-addressed), so a retried task can't duplicate samples
    before = sorted(os.listdir(out_dir))
    write_webdataset(ray.data.from_arrow(src), out_dir, rows_per_shard=8)
    assert sorted(os.listdir(out_dir)) == before


def test_meta_schema_matches_flagship_layout():
    assert [f.name for f in FLAGSHIP_META_SCHEMA] == ["image_id", "w", "h", "fmt", "phash"]
