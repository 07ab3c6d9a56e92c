"""hash_split (deterministic train/val/test) and global_row_number
(distributed ROW_NUMBER): determinism across block layouts, leakage safety,
exactness vs brute force, loud failure modes."""

import numpy as np
import pyarrow as pa
import pytest

from rayval.stages.rowids import global_row_number
from rayval.stages.split import hash_split


def _ray():
    import ray

    return ray


def test_hash_split_partition_invariant_and_exhaustive(ray_session):
    ray = _ray()
    ids = np.arange(1_000, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids), "x": pa.array(ids * 2)})
    a = hash_split(ray.data.from_arrow(t).repartition(7), "doc_id").to_pandas()
    b = hash_split(ray.data.from_arrow(t).repartition(2), "doc_id").to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert (a["split"] == b["split"]).all()
    assert set(a["split"].unique()) <= {"train", "val", "test"}
    # default 90/5/5 roughly holds
    frac = (a["split"] == "train").mean()
    assert 0.85 < frac < 0.95
    assert len(a) == 1_000


def test_hash_split_duplicate_keys_co_assigned(ray_session):
    ray = _ray()
    ids = np.repeat(np.arange(50, dtype=np.int64), 4)
    t = pa.table({"k": pa.array(ids)})
    out = hash_split(ray.data.from_arrow(t).repartition(5), "k").to_pandas()
    assert (out.groupby("k")["split"].nunique() == 1).all()


def test_hash_split_salt_decorrelates(ray_session):
    ray = _ray()
    ids = np.arange(2_000, dtype=np.int64)
    t = pa.table({"k": pa.array(ids)})
    base = hash_split(ray.data.from_arrow(t), "k").to_pandas().sort_values("k")
    salted = hash_split(ray.data.from_arrow(t), "k", salt=99).to_pandas().sort_values("k")
    # assignments differ for a nontrivial share of keys, sizes still ~90/5/5
    differs = (base["split"].to_numpy() != salted["split"].to_numpy()).mean()
    assert differs > 0.05
    assert 0.85 < (salted["split"] == "train").mean() < 0.95


def test_hash_split_weight_validation(ray_session):
    ray = _ray()
    ds = ray.data.from_arrow(pa.table({"k": pa.array([1, 2], type=pa.int64())}))
    with pytest.raises(ValueError):
        hash_split(ds, "k", weights={"a": 5_000, "b": 4_000})
    with pytest.raises(ValueError):
        hash_split(ds, "k", weights={})
    with pytest.raises(ValueError):
        hash_split(ds, "k", weights={"a": 10_001, "b": -1})


def test_global_row_number_matches_argsort(ray_session):
    ray = _ray()
    rng = np.random.default_rng(17)
    keys = rng.permutation(np.arange(-2_500, 2_500, dtype=np.int64))
    t = pa.table({"key": pa.array(keys), "payload": pa.array(np.arange(5_000))})
    out = (
        global_row_number(ray.data.from_arrow(t).repartition(9), "key", n_buckets=16)
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    assert (out["row_id"].to_numpy() == np.arange(5_000)).all()
    # payload stays attached to its row
    assert (out["payload"].to_numpy() == (out["key"].to_numpy() + 2_500) * 1).all() or True
    orig = dict(zip(keys.tolist(), np.arange(5_000).tolist()))
    assert all(orig[k] == p for k, p in zip(out["key"], out["payload"]))


def test_global_row_number_skewed_keys_balanced(ray_session):
    ray = _ray()
    rng = np.random.default_rng(23)
    # zipf-ish skew: many repeats of small keys + sparse large tail
    keys = np.concatenate(
        [rng.zipf(1.5, size=8_000).astype(np.int64), rng.integers(10**6, 10**9, 2_000)]
    )
    t = pa.table({"key": pa.array(keys)})
    out = (
        global_row_number(ray.data.from_arrow(t).repartition(6), "key", n_buckets=12)
        .to_pandas()["row_id"]
        .to_numpy()
    )
    # ranks are a permutation of 0..n-1 and ordered consistently with keys
    assert sorted(out.tolist()) == list(range(10_000))
    df = (
        global_row_number(ray.data.from_arrow(t), "key", n_buckets=12)
        .to_pandas()
        .sort_values("row_id")
    )
    assert (np.diff(df["key"].to_numpy()) >= 0).all()


def test_global_row_number_rejects_nulls_and_strings(ray_session):
    ray = _ray()
    ds = ray.data.from_arrow(pa.table({"k": pa.array([1, None, 3], type=pa.int64())}))
    with pytest.raises(Exception):
        global_row_number(ds, "k").materialize()
    ds2 = ray.data.from_arrow(pa.table({"k": pa.array(["a", "b"])}))
    with pytest.raises(TypeError):
        global_row_number(ds2, "k")


def test_global_row_number_tie_col_pins_duplicates(ray_session):
    ray = _ray()
    keys = np.repeat(np.arange(40, dtype=np.int64), 5)
    tie = np.tile(np.arange(5, dtype=np.int64), 40)
    t = pa.table({"key": pa.array(keys), "tie": pa.array(tie)})
    out = (
        global_row_number(ray.data.from_arrow(t).repartition(4), "key",
                          n_buckets=8, tie_col="tie")
        .to_pandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    # within equal keys, row_id order follows tie_col; globally follows key
    assert (np.diff(out["key"].to_numpy()) >= 0).all()
    for k in range(40):
        grp = out[out["key"] == k]
        assert (np.diff(grp["tie"].to_numpy()) > 0).all()
        assert (np.diff(grp["row_id"].to_numpy()) == 1).all()


# ------------------------------------------------------------------- tf-idf
def _tfidf_brute(texts, k, max_df=None):
    """Pure-Python reference: same tokenizer contract, reciprocal-df idf."""
    import re

    docs = [re.findall(r"[a-z0-9]+", (t or "").lower()) for t in texts]
    n = len(docs)
    tf = [{} for _ in docs]
    for i, toks in enumerate(docs):
        for t in toks:
            tf[i][t] = tf[i].get(t, 0) + 1
    df = {}
    for m in tf:
        for t in m:
            df[t] = df.get(t, 0) + 1
    out = []
    for i, m in enumerate(tf):
        scored = [
            (t, c * ((n * 1_000_000) // df[t]))
            for t, c in m.items()
            if max_df is None or df[t] <= max_df
        ]
        scored.sort(key=lambda x: (-x[1], x[0]))
        for t, s in scored[:k]:
            out.append((i, s, t))
    return sorted(out)


def test_tfidf_topk_brute_force(ray_session):
    ray = _ray()
    from rayval.stages.tfidf import tfidf_topk

    texts = [
        "the cat sat on the mat",
        "the dog sat on the log the dog",
        "cat dog bird bird bird",
        "",
        None,
        "unique singular vocabulary here",
        "the the the the",
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    out = tfidf_topk(ray.data.from_arrow(t).repartition(3), "text", "doc_id", k=2)
    got = sorted(
        (r["doc_id"], r["score_e6"], r["token"]) for r in out.take_all()
    )
    assert got == _tfidf_brute(texts, 2)


def test_tfidf_max_df_guard(ray_session):
    ray = _ray()
    from rayval.stages.tfidf import tfidf_topk

    texts = ["the a x", "the a y", "the a z", "the a w"]
    t = pa.table({"doc_id": pa.array(range(4), type=pa.int64()),
                  "text": pa.array(texts)})
    # 'the'/'a' appear in all 4 docs; max_df=1 keeps only the singletons
    out = tfidf_topk(ray.data.from_arrow(t), "text", "doc_id", k=3, max_df=1)
    got = sorted((r["doc_id"], r["score_e6"], r["token"]) for r in out.take_all())
    assert got == _tfidf_brute(texts, 3, max_df=1)
    assert all(tok in "xyzw" for _, _, tok in got)


def test_hash_split_null_bearing_batch_consistent(ray_session):
    """A batch containing nulls must not change the split of its NON-null
    keys (the float64-widening hashing trap): same key, same split, with or
    without null neighbors; null keys all land in ONE split together."""
    ray = _ray()
    ids = np.arange(500, dtype=np.int64)
    clean = pa.table({"k": pa.array(ids)})
    with_nulls = pa.table({"k": pa.array(
        [None if i % 50 == 0 else int(v) for i, v in enumerate(ids)], type=pa.int64())})
    a = hash_split(ray.data.from_arrow(clean), "k").to_pandas()
    b = hash_split(ray.data.from_arrow(with_nulls), "k").to_pandas()
    am = dict(zip(a["k"], a["split"]))
    nb = b[b["k"].notna()]
    assert all(am[int(k)] == s for k, s in zip(nb["k"], nb["split"]))
    null_splits = set(b[b["k"].isna()]["split"])
    assert len(null_splits) == 1


def test_with_ntile_matches_sql_fill_rule(ray_session):
    ray = _ray()
    from rayval.stages.rowids import with_ntile

    rng = np.random.default_rng(53)
    n, tiles = 1_003, 7  # deliberately non-divisible: 1003 = 7*143 + 2
    keys = rng.permutation(np.arange(n, dtype=np.int64))
    t = pa.table({"key": pa.array(keys)})
    out = (
        with_ntile(ray.data.from_arrow(t).repartition(4), "key", tiles, n_buckets=8)
        .to_pandas().sort_values("key").reset_index(drop=True)
    )
    # SQL fill rule: first (n % tiles) tiles get q+1 rows, rest q
    q, r = divmod(n, tiles)
    sizes = out.groupby("ntile").size()
    assert list(sizes.index) == list(range(1, tiles + 1))
    assert all(sizes[i] == (q + 1 if i <= r else q) for i in range(1, tiles + 1))
    # tile is monotone in key rank
    assert (np.diff(out["ntile"].to_numpy()) >= 0).all()
    # degenerate: more tiles than rows -> row i in tile i+1
    small = pa.table({"key": pa.array([5, 1, 9], type=pa.int64())})
    o2 = (with_ntile(ray.data.from_arrow(small), "key", 10)
          .to_pandas().sort_values("key"))
    assert o2["ntile"].tolist() == [1, 2, 3]
    with pytest.raises(ValueError):
        with_ntile(ray.data.from_arrow(small), "key", 0)
