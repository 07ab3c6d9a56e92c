"""Property tests for the vectorized polynomial hashing layer — the one
component where a subtle indexing bug (offsets, slices, chunk boundaries,
power-table rebasing) silently corrupts every downstream sketch and shuffle.
No Ray needed: pure numpy/Arrow.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from rayval.state.hashing import _CHUNK_BYTES, hash64, rehash, window_hashes

texts = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=60
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_hash_position_and_batch_independence(strs):
    """Each string's hash is independent of its neighbors and position."""
    arr = pa.array(strs, type=pa.string())
    h = hash64(arr)
    for i in [0, len(strs) // 2, len(strs) - 1]:
        assert h[i] == hash64(pa.array([strs[i]]))[0]


@settings(max_examples=100, deadline=None)
@given(texts, st.integers(min_value=0, max_value=10), st.integers(min_value=1, max_value=10))
def test_hash_slice_invariance(strs, off, ln):
    arr = pa.array(strs, type=pa.string())
    off = min(off, len(strs) - 1)
    ln = min(ln, len(strs) - off)
    sl = arr.slice(off, ln)
    assert (hash64(sl) == hash64(arr)[off : off + ln]).all()


@settings(max_examples=100, deadline=None)
@given(texts)
def test_hash_chunk_invariance(strs):
    arr = pa.array(strs, type=pa.string())
    if len(strs) > 1:
        mid = len(strs) // 2
        ch = pa.chunked_array([strs[:mid], strs[mid:]])
        assert (hash64(ch) == hash64(arr)).all()
    assert (hash64(arr.cast(pa.large_string())) == hash64(arr)).all()


@settings(max_examples=50, deadline=None)
@given(st.text(min_size=0, max_size=200), st.text(min_size=0, max_size=200))
def test_hash_injective_on_pairs(a, b):
    """Distinct strings hash distinct (collision ~2^-64; a hit means a bug
    like dropping length mixing or mis-rebased powers)."""
    ha, hb = hash64(pa.array([a, b]))
    assert (ha == hb) == (a == b)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=255), min_size=1, max_size=200),
    st.integers(min_value=1, max_value=12),
)
def test_window_hash_position_independence(codes, k):
    """window_hashes[i] == the hash of that window hashed alone at position 0."""
    codes = np.array(codes, dtype=np.uint64)
    if len(codes) < k:
        return
    wh = window_hashes(codes, k)
    assert len(wh) == len(codes) - k + 1
    for i in [0, len(wh) // 2, len(wh) - 1]:
        assert wh[i] == window_hashes(codes[i : i + k], k)[0]


def test_window_hash_chunk_boundary():
    """Chunked evaluation (forced by a tiny internal step) must equal the
    single-pass result across the chunk seam."""
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 2**20, size=3 * (_CHUNK_BYTES // 8) + 17).astype(np.uint64)
    k = 7
    wh = window_hashes(codes, k)
    # spot-check windows straddling the internal chunk boundaries
    step = _CHUNK_BYTES // 8
    for pos in (step - 3, step, 2 * step - 1, len(wh) - 1):
        assert wh[pos] == window_hashes(codes[pos : pos + k], k)[0], pos


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=1, max_size=50))
def test_rehash_families_differ(vals):
    h = np.array(vals, dtype=np.uint64)
    a, b = rehash(h, 1), rehash(h, 2)
    assert not np.array_equal(a, b)  # distinct salts -> distinct family
    assert (rehash(h, 1) == a).all()  # deterministic


def test_hash64_null_bearing_numeric_blocks_consistent():
    """A null in a numeric block must not change the other values' hashes
    (the old float64 widening made the same key hash differently across
    blocks, silently mis-bucketing hash-partitioned joins) and must not
    collapse int64 keys > 2^53 onto shared float values."""
    import numpy as np
    import pyarrow as pa

    from rayval.state.hashing import hash64

    a = hash64(pa.array([7, 11, 13], pa.int64()))
    b = hash64(pa.array([7, 11, None], pa.int64()))
    assert a[0] == b[0] and a[1] == b[1]
    big = 2**60 + 1
    h = hash64(pa.array([big, big - 1, None], pa.int64()))
    assert h[0] != h[1]
    # null slots get the fixed sentinel, deterministically
    assert b[2] == hash64(pa.array([None], pa.int64()))[0]
    # chunked arrays agree with flat ones
    ch = pa.chunked_array([pa.array([7, 11], pa.int64()), pa.array([None], pa.int64())])
    assert list(hash64(ch)) == list(b)


def test_bucket_join_matches_with_null_keys_in_block(ray_session):
    """Regression: a block containing a null key must still join its non-null
    keys against a clean other side (the float64-widening bug routed them to
    different buckets)."""
    import pyarrow as pa
    import ray.data

    from rayval.stages.join import bucket_join

    l = pa.table({"k": pa.array([1, 2, None], pa.int64()),
                  "lv": pa.array([10, 20, 30], pa.int64())})
    r = pa.table({"k": pa.array([1, 2], pa.int64()),
                  "rv": pa.array([100, 200], pa.int64())})
    out = bucket_join(ray.data.from_arrow(l), ray.data.from_arrow(r),
                      key="k", n_buckets=8, how="inner")
    rows = sorted((row["k"], row["lv"], row["rv"]) for row in out.take_all())
    assert rows == [(1, 10, 100), (2, 20, 200)]


def test_hash64_null_bearing_object_path_raises_loudly():
    """Non-string object fallbacks (e.g. decimal128) must fail the same way
    on the null-bearing path as on the dense path — previously pa.array()
    inferred a non-string type there and _hash_string_array misread its
    buffers as string offsets, returning silent garbage."""
    from decimal import Decimal

    import pytest

    dense = pa.array([Decimal("1.50"), Decimal("2.50")], type=pa.decimal128(10, 2))
    with_null = pa.array([Decimal("1.50"), None, Decimal("2.50")], type=pa.decimal128(10, 2))
    with pytest.raises(pa.lib.ArrowTypeError):
        hash64(dense)
    with pytest.raises(pa.lib.ArrowTypeError):
        hash64(with_null)
