"""Sketch layer: accuracy, mergeability (partial+final), serialization
round-trip (checkpoint), determinism (resume re-merge)."""

import numpy as np
import pyarrow as pa
import pytest

from rayval.state import HLL, KLL, Bloom, hash64, ks_distance


def test_hash64_deterministic_and_typed():
    a = hash64(["a", "b", "a"])
    assert a[0] == a[2] and a[0] != a[1]
    assert hash64(np.arange(5))[0] == hash64(np.arange(5))[0]


def test_hll_estimate_accuracy():
    h = HLL()
    n = 50_000
    h.add(np.arange(n))
    assert abs(h.estimate() - n) / n < 0.05


def test_hll_merge_equals_whole():
    a, b, whole = HLL(), HLL(), HLL()
    x = np.arange(10_000)
    a.add(x[:6000])
    b.add(x[4000:])  # overlap on purpose
    whole.add(x)
    assert a.merge(b).estimate() == pytest.approx(whole.estimate())


def test_hll_serialization_roundtrip():
    h = HLL().add(np.arange(1000))
    h2 = HLL.from_bytes(h.to_bytes())
    assert h2.estimate() == h.estimate()


def test_kll_quantiles():
    rng = np.random.default_rng(0)
    data = rng.normal(100, 15, 200_000)
    s = KLL()
    for chunk in np.array_split(data, 40):
        s.add(chunk)
    for q in (0.1, 0.5, 0.9):
        assert abs(s.quantile(q) - np.quantile(data, q)) < 2.0
    assert s.quantile(0.0) == data.min()
    assert s.quantile(1.0) == data.max()


def test_kll_merge_partials():
    rng = np.random.default_rng(1)
    data = rng.exponential(10, 100_000)
    parts = [KLL(seed=i).add(c) for i, c in enumerate(np.array_split(data, 8))]
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert merged.n == len(data)
    assert abs(merged.quantile(0.5) - np.quantile(data, 0.5)) < 1.0


def test_kll_serialize_and_determinism():
    data = np.arange(10_000, dtype=float)
    s1 = KLL().add(data)
    s2 = KLL.from_bytes(s1.to_bytes())
    assert s1.quantiles([0.25, 0.75]) == s2.quantiles([0.25, 0.75])
    # same input, same seed -> identical sketch (resume reproducibility)
    s3 = KLL().add(data)
    assert s1.quantiles([0.1, 0.9]) == s3.quantiles([0.1, 0.9])


def test_ks_distance_detects_drift():
    a = KLL().add(np.random.default_rng(2).normal(0, 1, 50_000))
    b = KLL().add(np.random.default_rng(3).normal(0, 1, 50_000))
    c = KLL().add(np.random.default_rng(4).normal(3, 1, 50_000))
    assert ks_distance(a, b) < 0.05
    assert ks_distance(a, c) > 0.5


def test_bloom_no_false_negatives():
    b = Bloom(10_000, fpp=0.01)
    members = np.arange(10_000)
    b.add(members)
    assert b.contains(members).all()


def test_bloom_fpp_bounded():
    b = Bloom(10_000, fpp=0.01)
    b.add(np.arange(10_000))
    non = np.arange(100_000, 200_000)
    fp = b.contains(non).mean()
    assert fp < 0.03


def test_bloom_merge_and_serialize():
    a = Bloom(1000, fpp=0.01)
    c = Bloom(1000, fpp=0.01)
    a.add(np.arange(500))
    c.add(np.arange(500, 1000))
    a.merge(c)
    a2 = Bloom.from_bytes(a.to_bytes())
    assert a2.contains(np.arange(1000)).all()


def test_sharded_bloom_semantics():
    from rayval.state import ShardedBloom

    sb = ShardedBloom(10_000, fpp=0.01, n_shards=8)
    members = np.arange(10_000)
    sb.add(members)
    assert sb.contains(members).all()  # no false negatives
    assert len(sb.shards) == 8
    fp = sb.contains(np.arange(100_000, 200_000)).mean()
    assert fp < 0.03
    # per-batch-partial shape: only touched shards serialize
    small = ShardedBloom(10_000, fpp=0.01, n_shards=1024)
    small.add(np.arange(5))
    assert len(small.shard_blobs()) <= 5
    # merge of disjoint partials == bulk build
    p1 = ShardedBloom(10_000, fpp=0.01, n_shards=8).add(np.arange(5000))
    p2 = ShardedBloom(10_000, fpp=0.01, n_shards=8).add(np.arange(5000, 10_000))
    p1.merge(p2)
    assert p1.contains(members).all()
    rt = ShardedBloom.from_bytes(p1.to_bytes())
    assert rt.contains(members).all()
    assert rt.n_shards == 8 and rt.shard_capacity == p1.shard_capacity


def test_blob_version_stamp_refused():
    """Pre-versioning / foreign-scheme blobs must refuse to deserialize:
    merging partials across hash schemes produces silent false negatives."""
    import pytest

    from rayval.state import ShardedBloom, bloom_from_bytes
    from rayval.stages.stats import ColumnStats

    with pytest.raises(ValueError):
        Bloom.from_bytes(b"\x07\x00" + b"\x00" * 64)  # old k+bits layout
    blob = bytearray(Bloom(100).to_bytes())
    blob[4] = 99  # wrong hash-scheme version
    with pytest.raises(ValueError):
        Bloom.from_bytes(bytes(blob))
    with pytest.raises(ValueError):
        ColumnStats.from_bytes(b"\x80\x04" + b"x" * 16)  # raw pickle (old)
    st = ColumnStats.from_bytes(ColumnStats().to_bytes())
    assert st.count == 0
    # dispatch picks the right shape from the magic
    assert isinstance(bloom_from_bytes(ShardedBloom(10, n_shards=2).to_bytes()), ShardedBloom)
    assert isinstance(bloom_from_bytes(Bloom(10).to_bytes()), Bloom)


def test_grouped_quantiles_sketch_accuracy_and_determinism(ray_session):
    """Grouped KLL quantiles: estimates' true RANK within 5% of target for
    every group (k=200 => ~1.3% expected), byte-identical across runs
    (sorted-blob merge order), and only sketch rows ever shuffle."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rayval.stages.stats import grouped_quantiles_sketch

    rng = np.random.default_rng(11)
    n = 20_000
    g = rng.integers(0, 4, n)
    v = np.where(g == 0, rng.normal(100, 10, n), rng.lognormal(3, 1, n))
    blocks = [
        pa.table({"g": pa.array(g[i:i + 2000], pa.int64()),
                  "v": pa.array(v[i:i + 2000], pa.float64())})
        for i in range(0, n, 2000)
    ]

    def run_once():
        out = grouped_quantiles_sketch(
            ray.data.from_arrow(blocks), "g", "v", qs=(0.25, 0.5, 0.75)
        ).take_all()
        return sorted(((r["g"], r["n"], r["q_25"], r["q_50"], r["q_75"]) for r in out))

    got = run_once()
    assert got == run_once()  # deterministic
    assert [r[0] for r in got] == [0, 1, 2, 3]
    for grp, n_g, *ests in got:
        vals = np.sort(v[g == grp])
        assert n_g == len(vals)
        for q, est in zip((0.25, 0.5, 0.75), ests):
            rank = np.searchsorted(vals, est) / len(vals)
            assert abs(rank - q) < 0.05, (grp, q, est, rank)


def test_grouped_quantiles_sketch_null_values_and_groups(ray_session):
    import pyarrow as pa
    import ray.data

    from rayval.stages.stats import grouped_quantiles_sketch

    t = pa.table({"g": pa.array(["a", "a", None, None], pa.string()),
                  "v": pa.array([1.0, None, 5.0, 7.0], pa.float64())})
    out = grouped_quantiles_sketch(ray.data.from_arrow(t), "g", "v", qs=(0.5,)).take_all()
    by_g = {r["g"]: r for r in out}
    assert by_g["a"]["n"] == 1 and by_g["a"]["q_50"] == 1.0  # null v excluded
    assert by_g[None]["n"] == 2  # null group keys form their own partition


def test_tdigest_accuracy_tails_and_merge():
    """t-digest: tail quantiles (p99/p999) land within tight RANK error on a
    skewed distribution; merging split partials agrees with the single-build
    digest to the same tolerance; serialization round-trips; delta mismatch
    refuses to merge."""
    import numpy as np
    import pytest

    from rayval.state import TDigest

    rng = np.random.default_rng(3)
    v = rng.lognormal(0, 2, 50_000)
    whole = TDigest(delta=100).add(v)
    srt = np.sort(v)

    def rank_of(x):
        return np.searchsorted(srt, x) / len(srt)

    for q, tol in ((0.01, 0.005), (0.5, 0.02), (0.99, 0.005), (0.999, 0.002)):
        est = whole.quantile(q)
        assert abs(rank_of(est) - q) < tol, (q, est, rank_of(est))
    assert whole.quantile(0.0) == srt[0] and whole.quantile(1.0) == srt[-1]

    parts = [TDigest(delta=100).add(chunk) for chunk in np.array_split(v, 13)]
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    assert merged.n == len(v)
    for q in (0.01, 0.5, 0.99, 0.999):
        assert abs(rank_of(merged.quantile(q)) - q) < 0.01, q

    rt = TDigest.from_bytes(merged.to_bytes())
    assert rt.quantiles([0.5, 0.99]) == merged.quantiles([0.5, 0.99])
    with pytest.raises(ValueError, match="delta mismatch"):
        TDigest(delta=100).add([1.0]).merge(TDigest(delta=50).add([2.0]))


def test_tdigest_centroid_count_bounded():
    """The whole point at 10^12 rows: centroids stay O(delta) no matter how
    many values stream in, so a partial is a fixed-size blob."""
    import numpy as np

    from rayval.state import TDigest

    rng = np.random.default_rng(7)
    d = TDigest(delta=100)
    for _ in range(20):
        d.add(rng.normal(size=10_000))
    assert d.n == 200_000
    assert len(d.means) <= 2 * 100  # ~delta centroids, never the data


def test_grouped_quantiles_sketch_tdigest_variant(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rayval.stages.stats import grouped_quantiles_sketch

    rng = np.random.default_rng(19)
    n = 8000
    g = rng.integers(0, 3, n)
    v = rng.lognormal(1, 1.5, n)
    blocks = [pa.table({"g": pa.array(g[i:i + 1000], pa.int64()),
                        "v": pa.array(v[i:i + 1000], pa.float64())})
              for i in range(0, n, 1000)]
    out = grouped_quantiles_sketch(
        ray.data.from_arrow(blocks), "g", "v", qs=(0.5, 0.99), sketch="tdigest"
    ).take_all()
    assert sorted(r["g"] for r in out) == [0, 1, 2]
    for r in out:
        vals = np.sort(v[g == r["g"]])
        for q, est in ((0.5, r["q_50"]), (0.99, r["q_99"])):
            rank = np.searchsorted(vals, est) / len(vals)
            assert abs(rank - q) < 0.03, (r["g"], q, rank)


def test_grouped_distinct_sketch_accuracy(ray_session):
    """Per-group HLL distinct estimates within the sketch's relative-error
    envelope of exact, nulls excluded from values, null group kept."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rayval.stages.stats import grouped_distinct_sketch

    rng = np.random.default_rng(23)
    n = 30_000
    g = rng.integers(0, 3, n)
    # per-group distinct cardinalities differ by an order of magnitude
    v = np.where(g == 0, rng.integers(0, 100, n), rng.integers(0, 10_000, n))
    blocks = [pa.table({"g": pa.array(g[i:i + 3000], pa.int64()),
                        "v": pa.array(v[i:i + 3000], pa.int64())})
              for i in range(0, n, 3000)]
    out = grouped_distinct_sketch(ray.data.from_arrow(blocks), "g", "v").take_all()
    assert sorted(r["g"] for r in out) == [0, 1, 2]
    for r in out:
        exact = len(np.unique(v[g == r["g"]]))
        assert r["n_rows"] == int((g == r["g"]).sum())
        assert abs(r["distinct_est"] - exact) / exact < 0.05, (r, exact)


def test_tdigest_quantile_monotone_property():
    """Property: quantile() is monotone in q and bounded by [min, max] for
    arbitrary float batches (hypothesis-driven, pure python — no Ray)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rayval.state import TDigest

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.floats(min_value=-1e12, max_value=1e12,
                              allow_nan=False, allow_infinity=False),
                    min_size=1, max_size=400))
    def check(vals):
        d = TDigest(delta=50).add(vals)
        qs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
        ests = d.quantiles(qs)
        assert all(a <= b + 1e-9 for a, b in zip(ests, ests[1:]))
        assert min(vals) <= ests[0] + 1e-9 and ests[-1] <= max(vals) + 1e-9

    check()


def test_grouped_histogram_brute_force(ray_session):
    """grouped_histogram vs per-row python: clipped bins, null col dropped,
    null group key kept as its own group, multi-block partials."""
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data

    from rayval.stages.stats import grouped_histogram

    rng = np.random.default_rng(5)
    n = 400
    vals = rng.integers(-120, 1200, n)
    langs = rng.choice(["en", "de", None], n, p=[0.5, 0.4, 0.1]).tolist()
    vmask = rng.random(n) < 0.08
    t = pa.table({
        "lang": pa.array(langs, pa.string()),
        "n_chars": pa.array([None if m else int(v) for m, v in zip(vmask, vals)], pa.int64()),
    })
    out = pa.Table.from_pylist(
        grouped_histogram(
            ray.data.from_arrow(t).repartition(5), "lang", "n_chars", width=50, nbins=16
        ).take_all()
    )
    exp = collections.Counter()
    for i in range(n):
        if vmask[i]:
            continue
        exp[(langs[i], min(max(int(vals[i]) // 50, 0), 15))] += 1
    got = {(r["lang"], r["bin"]): r["n"] for r in out.to_pylist()}
    assert got == dict(exp)
    assert any(k[0] is None for k in got)  # null group survived the exchange


def test_grouped_histogram_rejects_bad_params(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data

    from rayval.stages.stats import grouped_histogram

    t = pa.table({"lang": pa.array(["a"]), "n_chars": pa.array([1], pa.int64())})
    with pytest.raises(ValueError):
        grouped_histogram(ray.data.from_arrow(t), "lang", "n_chars", width=0, nbins=4)


def test_grouped_histogram_binary_group_key(ray_session):
    """pack_null_key supports binary group keys (null_fill_of b'' fill) —
    the hash-key shape dedup stages group on."""
    import pyarrow as pa
    import ray.data

    from rayval.stages.stats import grouped_histogram

    t = pa.table({
        "k": pa.array([b"\x01", b"\x01", None, b"\x02"], pa.binary()),
        "v": pa.array([10, 120, 10, None], pa.int64()),
    })
    out = pa.Table.from_pylist(
        grouped_histogram(ray.data.from_arrow(t), "k", "v", width=50, nbins=4).take_all()
    )
    got = {(r["k"], r["bin"]): r["n"] for r in out.to_pylist()}
    assert got == {(b"\x01", 0): 1, (b"\x01", 2): 1, (None, 0): 1}


def test_sketch_stats_planted_exact(ray_session):
    """On the planted fixture every sketch estimate is exactly invertible
    (see queries._ensure_sketch_fixture): HLL linear counting rounds to the
    true COUNT(DISTINCT) with 40 collision-free registers, KLL stays in its
    exact level-0 regime (no compaction at n=60 <= 200) so p50 is the
    30th-smallest value, and identical even/odd halves give KS == 0."""
    from rayval.pipelines.queries import q_sketch_stats_planted

    row = q_sketch_stats_planted("ignored").to_pylist()[0]
    assert row == {
        "n_docs": 120,
        "distinct_doc_est": 40,
        "n_chars_p50_est": 50 + 9 * 7 + 2,  # 30th smallest of the even half
        "halves_ks_e6": 0,
    }


# ---------------------------------------------------------------- MisraGries
def test_misra_gries_exact_when_under_capacity():
    from rayval.state.heavyhitters import MisraGries

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 40, size=5_000)  # 40 distinct <= k
    mg = MisraGries(k=64).update(vals)
    assert mg.error_bound() == 0
    truth = {int(v): int(c) for v, c in zip(*np.unique(vals, return_counts=True))}
    assert dict(mg.items()) == dict(sorted(truth.items(), key=lambda kv: (-kv[1], str(kv[0]))))


def test_misra_gries_bounds_over_capacity():
    from rayval.state.heavyhitters import MisraGries

    rng = np.random.default_rng(11)
    # zipf-ish: a few hot keys + a long uniform tail of distinct keys
    hot = np.repeat(np.arange(5), 2_000)
    tail = rng.integers(1_000, 100_000, size=20_000)
    vals = np.concatenate([hot, tail])
    rng.shuffle(vals)
    k = 64
    mg = MisraGries(k=k)
    for chunk in np.array_split(vals, 13):
        mg.update(chunk)
    n = len(vals)
    assert mg.error_bound() <= n // (k + 1)
    truth = {int(v): int(c) for v, c in zip(*np.unique(vals, return_counts=True))}
    est = dict(mg.items())
    # every key with freq > n/(k+1) is guaranteed present
    for key, c in truth.items():
        if c > n // (k + 1):
            assert key in est
    # est <= true <= est + deducted for every tracked key
    for key, e in est.items():
        assert e <= truth[key] <= e + mg.error_bound()


def test_misra_gries_merge_matches_single_build_bounds():
    from rayval.state.heavyhitters import MisraGries

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 500, size=30_000)
    parts = np.array_split(vals, 7)
    merged = MisraGries(k=32)
    for p in parts:
        merged.merge(MisraGries(k=32).update(p))
    truth = {int(v): int(c) for v, c in zip(*np.unique(vals, return_counts=True))}
    assert merged.n == len(vals)
    assert merged.error_bound() <= len(vals) // 33
    for key, e in merged.counters.items():
        assert e <= truth[key] <= e + merged.error_bound()


def test_misra_gries_serialize_roundtrip_and_k_mismatch():
    import pytest as _pytest

    from rayval.state.heavyhitters import MisraGries

    mg = MisraGries(k=8).update(np.array(["a", "b", "a", "c"], dtype=object))
    back = MisraGries.from_bytes(mg.to_bytes())
    assert back.counters == mg.counters and back.n == mg.n and back.k == mg.k
    with _pytest.raises(ValueError):
        back.merge(MisraGries(k=9))
    with _pytest.raises(ValueError):
        MisraGries.from_bytes(b"XXXX" + mg.to_bytes()[4:])


def test_heavy_hitters_stage_exact_regime(ray_session):
    import ray

    from rayval.stages.stats import heavy_hitters

    rng = np.random.default_rng(5)
    langs = np.array(["en", "de", "fr", "sv", "zh"])[rng.integers(0, 5, size=4_000)]
    t = pa.table({"lang": pa.array(langs.tolist()),
                  "pad": pa.array(np.arange(4_000))})
    out = heavy_hitters(ray.data.from_arrow(t).repartition(6), "lang", k=16)
    truth = {v: int(c) for v, c in zip(*np.unique(langs, return_counts=True))}
    assert out["err_bound"].to_pylist() == [0] * len(truth)
    got = dict(zip(out["value"].to_pylist(), out["est_count"].to_pylist()))
    assert got == truth
    # sorted by (-count, value)
    pairs = list(zip(out["est_count"].to_pylist(), out["value"].to_pylist()))
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))


def test_heavy_hitters_stage_nulls_and_bounds(ray_session):
    import ray

    from rayval.stages.stats import heavy_hitters

    rng = np.random.default_rng(9)
    ids = np.concatenate([np.repeat([1, 2, 3], 3_000), rng.integers(100, 50_000, 30_000)])
    rng.shuffle(ids)
    vals = [None if i % 97 == 0 else int(v) for i, v in enumerate(ids)]
    n_valid = sum(v is not None for v in vals)
    t = pa.table({"user_id": pa.array(vals, type=pa.int64())})
    k = 64
    out = heavy_hitters(ray.data.from_arrow(t).repartition(5), "user_id", k=k)
    bound = out["err_bound"][0].as_py()
    assert bound <= n_valid // (k + 1)
    truth = {}
    for v in vals:
        if v is not None:
            truth[v] = truth.get(v, 0) + 1
    got = dict(zip(out["value"].to_pylist(), out["est_count"].to_pylist()))
    for key, c in truth.items():
        if c > n_valid // (k + 1):
            assert key in got
    for key, e in got.items():
        assert e <= truth[key] <= e + bound
