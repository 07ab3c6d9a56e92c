"""Round-5 late operators: exact grouped distinct, ROLLUP, LEAD /
FIRST-LAST windows, token truncation, weighted source mixing, grouped
z-score — brute-force parity, null semantics, block-layout invariance, and
loud failure modes."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from rayval.functions.text import truncate_tokens
from rayval.stages.split import mix_sources
from rayval.stages.stats import grouped_distinct_exact, grouped_rollup, grouped_zscore
from rayval.stages.windows import grouped_first_last, grouped_lead


def _ray():
    import ray

    return ray


def _mixed_table(n=400, seed=3):
    rng = np.random.default_rng(seed)
    g = rng.choice(["a", "b", "c", None], size=n, p=[0.4, 0.3, 0.2, 0.1])
    v = rng.integers(0, 40, size=n).astype(np.int64)
    v_mask = rng.random(n) < 0.1
    return pa.table(
        {"g": pa.array(g.tolist(), pa.string()),
         "v": pa.array(v, mask=v_mask)}
    )


# ---------------------------------------------------------- exact distinct
def test_grouped_distinct_exact_vs_pandas(ray_session):
    ray = _ray()
    t = _mixed_table()
    out = (
        grouped_distinct_exact(ray.data.from_arrow(t).repartition(7), "g", "v")
        .to_pandas().sort_values("g", na_position="first").reset_index(drop=True)
    )
    df = t.to_pandas()
    df = df[df["v"].notna()]
    ref = (
        df.groupby("g", dropna=False)["v"].agg(n_rows="count", n_distinct="nunique")
        .reset_index().sort_values("g", na_position="first").reset_index(drop=True)
    )
    assert list(out["g"].fillna("∅")) == list(ref["g"].fillna("∅"))
    assert list(out["n_rows"]) == list(ref["n_rows"])
    assert list(out["n_distinct"]) == list(ref["n_distinct"])


def test_grouped_distinct_exact_block_layout_invariant(ray_session):
    ray = _ray()
    t = _mixed_table(seed=11)
    a = grouped_distinct_exact(ray.data.from_arrow(t).repartition(2), "g", "v").to_pandas()
    b = grouped_distinct_exact(ray.data.from_arrow(t).repartition(13), "g", "v").to_pandas()
    a = a.sort_values("g", na_position="first").reset_index(drop=True)
    b = b.sort_values("g", na_position="first").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_grouped_distinct_exact_all_null_group_emits_nothing(ray_session):
    ray = _ray()
    t = pa.table(
        {"g": pa.array(["x", "x", "y"]), "v": pa.array([1, 1, None], pa.int64())}
    )
    out = grouped_distinct_exact(ray.data.from_arrow(t), "g", "v").to_pandas()
    assert set(out["g"]) == {"x"}
    assert out.loc[out["g"] == "x", "n_distinct"].item() == 1


# ------------------------------------------------------------------ rollup
def test_grouped_rollup_vs_pandas(ray_session):
    ray = _ray()
    rng = np.random.default_rng(5)
    a = rng.choice(["p", "q"], 300)
    b = rng.choice(["x", "y", "z"], 300)
    v = rng.integers(0, 100, 300).astype(np.int64)
    t = pa.table({"a": pa.array(a.tolist()), "b": pa.array(b.tolist()), "v": pa.array(v)})
    out = grouped_rollup(ray.data.from_arrow(t).repartition(5), "a", "b", "v").to_pandas()
    df = t.to_pandas()
    fine = df.groupby(["a", "b"])["v"].agg(sum_val="sum", n_rows="count").reset_index()
    sub = df.groupby("a")["v"].agg(sum_val="sum", n_rows="count").reset_index()
    assert len(out) == len(fine) + len(sub) + 1
    grand = out[out["a"].isna()]
    assert grand["sum_val"].item() == v.sum() and grand["n_rows"].item() == 300
    merged = out[out["a"].notna() & out["b"].notna()].merge(
        fine, on=["a", "b"], suffixes=("", "_ref")
    )
    assert (merged["sum_val"] == merged["sum_val_ref"]).all()
    subs = out[out["a"].notna() & out["b"].isna()].merge(sub, on="a", suffixes=("", "_ref"))
    assert (subs["n_rows"] == subs["n_rows_ref"]).all()


def test_grouped_rollup_rejects_null_keys(ray_session):
    ray = _ray()
    t = pa.table(
        {"a": pa.array(["p", None]), "b": pa.array(["x", "y"]),
         "v": pa.array([1, 2], pa.int64())}
    )
    with pytest.raises(Exception, match="subtotal markers"):
        grouped_rollup(ray.data.from_arrow(t), "a", "b", "v").to_pandas()


# -------------------------------------------------------- LEAD / FIRST-LAST
def _event_log(n=500, seed=9, null_ts_every=17):
    rng = np.random.default_rng(seed)
    uid = rng.integers(0, 40, n)
    ts = np.sort(rng.integers(0, 10_000_000, n)).astype("datetime64[us]")
    ts_list = [None if i % null_ts_every == 0 else ts[i] for i in range(n)]
    return pa.table(
        {"event_id": pa.array(np.arange(n, dtype=np.int64)),
         "user_id": pa.array(uid.astype(np.int64)),
         "ts": pa.array(ts_list, pa.timestamp("us"))}
    )


def test_grouped_lead_bucketed_equals_per_key(ray_session):
    ray = _ray()
    t = _event_log()
    a = grouped_lead(ray.data.from_arrow(t).repartition(6), "user_id", "ts", "event_id",
                     n_buckets=8).to_pandas()
    b = grouped_lead(ray.data.from_arrow(t).repartition(6), "user_id", "ts", "event_id",
                     n_buckets=0).to_pandas()
    a = a.sort_values("event_id").reset_index(drop=True)
    b = b.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_grouped_lead_vs_pandas_shift(ray_session):
    ray = _ray()
    t = _event_log(seed=21)
    out = grouped_lead(ray.data.from_arrow(t), "user_id", "ts", "event_id").to_pandas()
    out = out.sort_values("event_id").reset_index(drop=True)
    df = t.to_pandas()
    real = df[df["ts"].notna()].sort_values(["user_id", "ts", "event_id"])
    nxt = real.groupby("user_id")["event_id"].shift(-1)
    gap = (real.groupby("user_id")["ts"].shift(-1) - real["ts"]).dt.total_seconds() * 1e6
    ref = pd.DataFrame(
        {"event_id": real["event_id"], "next_event_id": nxt, "gap_us": gap}
    ).set_index("event_id")
    got = out.set_index("event_id")
    for eid, row in ref.iterrows():
        assert (got.loc[eid, "next_event_id"] == row["next_event_id"]) or (
            pd.isna(got.loc[eid, "next_event_id"]) and pd.isna(row["next_event_id"])
        )
    # null-ts rows never get a next
    for eid in df.loc[df["ts"].isna(), "event_id"]:
        assert pd.isna(got.loc[eid, "next_event_id"])


def test_grouped_first_last_vs_pandas(ray_session):
    ray = _ray()
    t = _event_log(seed=33)
    out = grouped_first_last(ray.data.from_arrow(t), "user_id", "ts", "event_id").to_pandas()
    df = t.to_pandas()
    # DuckDB ASC NULLS LAST ordering: sort with na_position last, tie on id
    s = df.sort_values(["user_id", "ts", "event_id"], na_position="last")
    ref_first = s.groupby("user_id")["event_id"].first()
    ref_last = s.groupby("user_id")["event_id"].last()
    got = out.set_index("event_id")
    for _, row in df.iterrows():
        assert got.loc[row["event_id"], "first_event_id"] == ref_first[row["user_id"]]
        assert got.loc[row["event_id"], "last_event_id"] == ref_last[row["user_id"]]


# ------------------------------------------------------- token truncation
def test_truncate_tokens_edges():
    texts = pa.array(["a b c d", "one", "", "x  y", None, " lead", "tail "])
    t, n, w = truncate_tokens(texts, 2)
    # 'x  y' / 'tail ' keep their empty middle/trailing token rejoined —
    # exactly array_to_string(string_split(...)[1:2], ' ') in DuckDB
    assert t.to_pylist() == ["a b", "one", "", "x ", None, " lead", "tail "]
    assert n.to_pylist() == [4, 1, 1, 3, None, 2, 2]
    assert w.to_pylist() == [True, False, False, True, None, False, False]
    t1, _, _ = truncate_tokens(texts, 1)
    assert t1.to_pylist() == ["a", "one", "", "x", None, "", "tail"]
    with pytest.raises(ValueError):
        truncate_tokens(texts, 0)


# ------------------------------------------------------------ source mixing
def test_mix_sources_partition_invariant_and_weighted(ray_session):
    ray = _ray()
    n = 2_000
    ids = np.arange(n, dtype=np.int64)
    src = np.where(ids % 2 == 0, "keep_all", "keep_half")
    t = pa.table({"k": pa.array(ids), "src": pa.array(src.tolist())})
    w = {"keep_all": 10_000, "keep_half": 5_000}
    a = mix_sources(ray.data.from_arrow(t).repartition(3), "k", "src", w).to_pandas()
    b = mix_sources(ray.data.from_arrow(t).repartition(11), "k", "src", w).to_pandas()
    assert sorted(a["k"]) == sorted(b["k"])
    kept = a.groupby("src")["k"].count()
    assert kept["keep_all"] == n // 2
    assert 0.35 * n / 2 < kept["keep_half"] < 0.65 * n / 2


def test_mix_sources_drops_unknown_and_null_sources(ray_session):
    ray = _ray()
    t = pa.table(
        {"k": pa.array([1, 2, 3], pa.int64()),
         "src": pa.array(["known", "mystery", None])}
    )
    out = mix_sources(ray.data.from_arrow(t), "k", "src", {"known": 10_000}).to_pandas()
    assert list(out["src"]) == ["known"]


def test_mix_sources_weight_validation():
    with pytest.raises(ValueError):
        mix_sources(None, "k", "src", {"a": 10_001})


# ---------------------------------------------------------------- z-score
def test_grouped_zscore_vs_numpy(ray_session):
    ray = _ray()
    rng = np.random.default_rng(7)
    g = rng.choice(["a", "b"], 600)
    v = rng.integers(1, 50, 600).astype(np.int64)
    v_null = rng.random(600) < 0.05
    t = pa.table(
        {"id": pa.array(np.arange(600, dtype=np.int64)),
         "g": pa.array(g.tolist()), "v": pa.array(v, mask=v_null)}
    )
    out = (
        grouped_zscore(ray.data.from_arrow(t).repartition(5), "g", "v", out_cols=["id", "g"])
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    df = t.to_pandas()
    for grp in ["a", "b"]:
        vals = df.loc[(df["g"] == grp) & df["v"].notna(), "v"].to_numpy()
        n, s, q = len(vals), int(vals.sum()), int((vals.astype(object) ** 2).sum())
        den = np.sqrt(float(n * q - s * s))
        for _, row in df[df["g"] == grp].iterrows():
            got = out.loc[out["id"] == row["id"], "z_e6"].item()
            if pd.isna(row["v"]):
                assert pd.isna(got)
            else:
                exp = np.floor(float(n * int(row["v"]) - s) * 1e6 / den)
                assert got == exp


def test_grouped_zscore_constant_group_and_bounds(ray_session):
    ray = _ray()
    t = pa.table(
        {"id": pa.array([0, 1, 2], pa.int64()),
         "g": pa.array(["c", "c", "c"]),
         "v": pa.array([5, 5, 5], pa.int64())}
    )
    out = grouped_zscore(ray.data.from_arrow(t), "g", "v", out_cols=["id"]).to_pandas()
    assert out["z_e6"].isna().all()
    big = pa.table(
        {"id": pa.array([0], pa.int64()), "g": pa.array(["c"]),
         "v": pa.array([1 << 21], pa.int64())}
    )
    with pytest.raises(Exception, match="2\\^20"):
        grouped_zscore(ray.data.from_arrow(big), "g", "v", out_cols=["id"]).to_pandas()


# ------------------------------------------------------- top-k values/group
def test_grouped_topk_values_vs_pandas(ray_session):
    ray = _ray()
    from rayval.stages.stats import grouped_topk_values

    rng = np.random.default_rng(13)
    g = rng.choice(["a", "b", None], 500, p=[0.5, 0.4, 0.1])
    v = rng.integers(0, 12, 500).astype(np.int64)
    v_null = rng.random(500) < 0.08
    t = pa.table({"g": pa.array(g.tolist(), pa.string()), "v": pa.array(v, mask=v_null)})
    out = (
        grouped_topk_values(ray.data.from_arrow(t).repartition(6), "g", "v", 3)
        .to_pandas()
    )
    df = t.to_pandas()
    df = df[df["v"].notna()]
    counts = (
        df.groupby(["g", "v"], dropna=False).size().rename("n").reset_index()
        .sort_values(["g", "n", "v"], ascending=[True, False, True],
                     na_position="first")
    )
    for grp, sub in counts.groupby("g", dropna=False):
        exp = sub.head(3)
        if pd.isna(grp):
            got = out[out["g"].isna()]
        else:
            got = out[out["g"] == grp]
        got = got.sort_values(["n", "v"], ascending=[False, True])
        assert list(got["v"]) == list(exp["v"]), (grp, got, exp)
        assert list(got["n"]) == list(exp["n"])


# ------------------------------------------------------------ IQR outliers
def test_grouped_iqr_outliers_vs_brute_force(ray_session):
    ray = _ray()
    from rayval.stages.stats import grouped_iqr_outliers

    rng = np.random.default_rng(17)
    g = rng.choice(["a", "b"], 800)
    v = rng.integers(0, 100, 800).astype(np.int64)
    spikes = rng.random(800) < 0.03
    v[spikes] = v[spikes] + 10_000  # planted outliers
    v_null = rng.random(800) < 0.05
    t = pa.table(
        {"id": pa.array(np.arange(800, dtype=np.int64)),
         "g": pa.array(g.tolist()), "v": pa.array(v, mask=v_null)}
    )
    out = (
        grouped_iqr_outliers(ray.data.from_arrow(t).repartition(6), "g", "v",
                             out_cols=["id", "g", "v"])
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    df = t.to_pandas()
    expected = set()
    for grp in ["a", "b"]:
        vals = np.sort(df.loc[(df["g"] == grp) & df["v"].notna(), "v"].to_numpy().astype(np.int64))
        n = len(vals)
        import math
        q1 = int(vals[math.ceil(0.25 * n) - 1])
        q3 = int(vals[math.ceil(0.75 * n) - 1])
        iqr = q3 - q1
        sub = df[(df["g"] == grp) & df["v"].notna()]
        for _, r in sub.iterrows():
            c = int(r["v"])
            if 2 * (q1 - c) > 3 * iqr or 2 * (c - q3) > 3 * iqr:
                expected.add(int(r["id"]))
    assert set(out["id"]) == expected
    assert len(expected) > 0  # the planted spikes must be caught


def test_grouped_iqr_outliers_guards(ray_session):
    ray = _ray()
    from rayval.stages.stats import grouped_iqr_outliers

    t = pa.table(
        {"id": pa.array(np.arange(100, dtype=np.int64)),
         "g": pa.array(["x"] * 100),
         "v": pa.array(np.arange(100, dtype=np.int64))}
    )
    with pytest.raises(ValueError, match="max_count_rows"):
        grouped_iqr_outliers(ray.data.from_arrow(t), "g", "v",
                             out_cols=["id"], max_count_rows=10)
    with pytest.raises(ValueError, match="denominator"):
        grouped_iqr_outliers(ray.data.from_arrow(t), "g", "v",
                             out_cols=["id"], factor_den=0)


def test_grouped_iqr_outliers_null_group(ray_session):
    ray = _ray()
    from rayval.stages.stats import grouped_iqr_outliers

    # the NULL group forms its own partition: its planted spike must flag
    v = list(range(40)) + [100_000]
    t = pa.table(
        {"id": pa.array(np.arange(41, dtype=np.int64)),
         "g": pa.array([None] * 41, pa.string()),
         "v": pa.array(np.array(v, dtype=np.int64))}
    )
    out = grouped_iqr_outliers(ray.data.from_arrow(t).repartition(3), "g", "v",
                               out_cols=["id", "v"]).to_pandas()
    assert list(out["id"]) == [40]


def test_grouped_zscore_null_group_partition(ray_session):
    ray = _ray()
    # null group keys form ONE partition (SQL PARTITION BY semantics) and
    # get that partition's z, not a null
    v = np.array([10, 20, 30, 40], dtype=np.int64)
    t = pa.table(
        {"id": pa.array(np.arange(4, dtype=np.int64)),
         "g": pa.array([None] * 4, pa.string()),
         "v": pa.array(v)}
    )
    out = (
        grouped_zscore(ray.data.from_arrow(t).repartition(2), "g", "v", out_cols=["id"])
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    n, s, q = 4, int(v.sum()), int((v ** 2).sum())
    den = np.sqrt(float(n * q - s * s))
    exp = [int(np.floor(float(n * x - s) * 1e6 / den)) for x in v]
    assert list(out["z_e6"]) == exp
