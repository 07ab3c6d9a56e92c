"""Referential stage in isolation: Bloom false positives MUST be caught by
the exact hash-partitioned join, and the fidelity compare must be byte-exact."""

import numpy as np
import pyarrow as pa
import pytest

from rayval.state import Bloom


@pytest.fixture()
def tiny(ray_session):
    import ray.data

    results = ray.data.from_arrow(
        pa.table(
            {
                "image_id": pa.array([f"img-{i}" for i in range(50)]),
                "decodable": pa.array([i % 10 != 0 for i in range(50)]),  # every 10th undecodable
                "caption": pa.array([f"cap {i}" for i in range(50)]),
            }
        )
    )
    captions = ray.data.from_arrow(
        pa.table(
            {
                "caption_id": pa.array([f"c{i}" for i in range(60)]),
                "image_id": pa.array([f"img-{i}" for i in range(50)] + [f"ghost-{j}" for j in range(10)]),
                "caption": pa.array([f"cap {i}" if i != 7 else "tampered" for i in range(50)] + ["x"] * 10),
            }
        )
    )
    return results, captions


def test_bloom_false_positives_caught_exactly(tiny):
    from rayval.stages.referential import build_bloom, referential_violations

    results, captions = tiny
    # pathologically small bloom -> massive false-positive rate: ghosts and
    # undecodable refs will often probe positive, so the exact join is the
    # only thing standing between us and missed violations
    bloom = Bloom(4, fpp=0.5)
    for r in results.take_all():
        if r["decodable"]:
            bloom.add(np.array([r["image_id"]], dtype=object))
    out = referential_violations(captions, results, bloom, key="caption_id", n_buckets=4, compare_col="caption").to_pandas()
    got = {(r.caption_id, r.constraint_id) for r in out.itertuples()}
    expected_ref = {(f"c{i}", "image_id.ref") for i in range(0, 50, 10)}  # undecodable images
    expected_ref |= {(f"c{50+j}", "image_id.ref") for j in range(10)}  # ghosts
    expected_fid = {("c7", "caption.fidelity")}
    assert got == expected_ref | expected_fid


def test_sharded_bloom_false_positives_caught_exactly(tiny):
    """Same adversarial setup against the SHARDED filter (shard == join
    bucket, per-shard broadcast path): tiny shards -> heavy false positives,
    and ghosts whose shard has no members take the definite-miss shortcut —
    the exact join must still produce the identical listing."""
    from rayval.state import ShardedBloom
    from rayval.stages.referential import referential_violations

    results, captions = tiny
    bloom = ShardedBloom(8, fpp=0.5, n_shards=4)
    for r in results.take_all():
        if r["decodable"]:
            bloom.add(np.array([r["image_id"]], dtype=object))
    out = referential_violations(
        captions, results, bloom, key="caption_id", n_buckets=4, compare_col="caption"
    ).to_pandas()
    got = {(r.caption_id, r.constraint_id) for r in out.itertuples()}
    expected_ref = {(f"c{i}", "image_id.ref") for i in range(0, 50, 10)}
    expected_ref |= {(f"c{50+j}", "image_id.ref") for j in range(10)}
    assert got == expected_ref | {("c7", "caption.fidelity")}


def test_build_bloom_is_sharded(tiny):
    """build_bloom returns a ShardedBloom with only-touched-shard partials
    merged per shard; every decodable id must probe positive."""
    from rayval.state import ShardedBloom
    from rayval.stages.referential import build_bloom

    results, _ = tiny
    bloom = build_bloom(results, n_expected=1000, fpp=0.001, n_shards=4)
    assert isinstance(bloom, ShardedBloom) and bloom.n_shards == 4
    ids = np.array([f"img-{i}" for i in range(50) if i % 10 != 0], dtype=object)
    assert bloom.contains(ids).all()


def test_bloom_negative_shortcut_still_exact(tiny):
    from rayval.stages.referential import build_bloom, referential_violations

    results, captions = tiny
    bloom = build_bloom(results, n_expected=1000, fpp=0.001)  # accurate bloom
    out = referential_violations(captions, results, bloom, key="caption_id", n_buckets=4, compare_col="caption").to_pandas()
    assert (out.constraint_id == "image_id.ref").sum() == 15
    assert (out.constraint_id == "caption.fidelity").sum() == 1


def test_packed_exchange_all_null_ids(ray_session):
    """Every caption has a NULL image_id -> all rows take the degenerate
    bucket -1 (no right side) and come out image_id.ref violations; the
    packed exchange must not choke on a batch whose only bucket is -1."""
    import ray.data

    from rayval.stages.referential import build_bloom, referential_violations

    results = ray.data.from_arrow(
        pa.table({"image_id": pa.array(["a", "b"]), "decodable": pa.array([True, True])})
    )
    captions = ray.data.from_arrow(
        pa.table(
            {
                "caption_id": pa.array(["c0", "c1", "c2"]),
                "image_id": pa.array([None, None, None], type=pa.string()),
            }
        )
    )
    bloom = build_bloom(results, n_expected=100, fpp=0.01, n_shards=4)
    out = referential_violations(captions, results, bloom, key="caption_id", n_buckets=4).to_pandas()
    assert sorted(out.caption_id) == ["c0", "c1", "c2"]
    assert (out.constraint_id == "image_id.ref").all()


def test_packed_exchange_empty_captions(ray_session):
    """Zero caption rows -> zero violations, no crash in pack/unpack."""
    import ray.data

    from rayval.stages.referential import build_bloom, referential_violations

    results = ray.data.from_arrow(
        pa.table({"image_id": pa.array(["a"]), "decodable": pa.array([True])})
    )
    captions = ray.data.from_arrow(
        pa.table(
            {"caption_id": pa.array([], pa.string()), "image_id": pa.array([], pa.string())}
        )
    )
    bloom = build_bloom(results, n_expected=100, fpp=0.01, n_shards=4)
    out = referential_violations(captions, results, bloom, key="caption_id", n_buckets=4)
    assert out.num_rows == 0


def test_packed_exchange_no_decodable_refs(ray_session):
    """No decodable image rows at all: the sharded bloom is all-empty, every
    caption takes the definite-miss shortcut, and the join side has zero
    right rows — every caption must still surface as a ref violation."""
    import ray.data

    from rayval.stages.referential import build_bloom, referential_violations

    results = ray.data.from_arrow(
        pa.table({"image_id": pa.array(["a", "b"]), "decodable": pa.array([False, False])})
    )
    captions = ray.data.from_arrow(
        pa.table(
            {"caption_id": pa.array([f"c{i}" for i in range(5)]),
             "image_id": pa.array(["a", "b", "a", "x", "y"])}
        )
    )
    bloom = build_bloom(results, n_expected=100, fpp=0.01, n_shards=4)
    out = referential_violations(captions, results, bloom, key="caption_id", n_buckets=4).to_pandas()
    assert sorted(out.caption_id) == [f"c{i}" for i in range(5)]
    assert (out.constraint_id == "image_id.ref").all()


def test_packed_exchange_multiblock_brute_force(ray_session):
    """Captions and refs spread over many blocks: per-bucket blob unpacking
    must merge partial packs from every batch; compare against a brute-force
    set difference + caption compare."""
    import ray.data

    from rayval.stages.referential import build_bloom, referential_violations

    ref_ids = [f"r{i}" for i in range(60)]
    res_blocks = [
        pa.table(
            {
                "image_id": pa.array(ref_ids[i : i + 15]),
                "decodable": pa.array([j % 7 != 0 for j in range(i, i + 15)]),
                "caption": pa.array([f"text {j}" for j in range(i, i + 15)]),
            }
        )
        for i in range(0, 60, 15)
    ]
    cap_rows = [(f"k{i}", f"r{i % 75}", f"text {i % 75}" if i % 13 else "BAD") for i in range(150)]
    cap_blocks = [
        pa.table(
            {
                "caption_id": pa.array([r[0] for r in cap_rows[i : i + 25]]),
                "image_id": pa.array([r[1] for r in cap_rows[i : i + 25]]),
                "caption": pa.array([r[2] for r in cap_rows[i : i + 25]]),
            }
        )
        for i in range(0, 150, 25)
    ]
    results = ray.data.from_arrow(res_blocks)
    captions = ray.data.from_arrow(cap_blocks)
    bloom = build_bloom(results, n_expected=1000, fpp=0.01, n_shards=8)
    out = referential_violations(
        captions, results, bloom, key="caption_id", n_buckets=8, compare_col="caption"
    ).to_pandas()
    decodable = {ref_ids[j]: f"text {j}" for j in range(60) if j % 7 != 0}
    exp = set()
    for cid, img, cap in cap_rows:
        if img not in decodable:
            exp.add((cid, "image_id.ref"))
        elif cap != decodable[img]:
            exp.add((cid, "caption.fidelity"))
    assert {(r.caption_id, r.constraint_id) for r in out.itertuples()} == exp
