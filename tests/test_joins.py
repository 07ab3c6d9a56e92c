"""Join/lookup operators: broadcast dimension join + partitioned hash join."""

import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def facts(ray_session):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3, 2, 9], type=pa.int64()),
                "v": pa.array([10.0, 20.0, 30.0, 21.0, 99.0]),
            }
        )
    )


DIM = pa.table({"k": pa.array([1, 2, 3], type=pa.int64()), "name": ["a", "b", "c"]})


def test_broadcast_join_left(facts):
    from rayval.stages.join import broadcast_join

    out = broadcast_join(facts, DIM, key="k").to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    assert len(out) == 5
    assert out[out.k == 2].name.tolist() == ["b", "b"]
    assert out[out.k == 9].name.isna().all()  # left join keeps unmatched


def test_bucket_join_inner(facts, ray_session):
    import ray.data

    from rayval.stages.join import bucket_join

    right = ray.data.from_arrow(DIM)
    out = bucket_join(facts, right, key="k", n_buckets=4).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    assert len(out) == 4  # k=9 dropped (inner)
    assert set(out.columns) == {"k", "v", "name"}
    assert out[out.k == 3].name.tolist() == ["c"]


def test_bucket_join_rejects_ambiguous_columns(facts, ray_session):
    import ray.data

    from rayval.stages.join import bucket_join

    right = ray.data.from_arrow(pa.table({"k": pa.array([1], type=pa.int64()), "v": [5.0]}))
    with pytest.raises(ValueError):
        bucket_join(facts, right, key="k")


def test_salted_group_counts(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rayval.stages.skew import salted_group_counts

    # one hot key (80% of rows) + uniform tail
    keys = np.concatenate([np.full(8000, 7, dtype=np.int64), np.arange(2000, dtype=np.int64)])
    ds = ray.data.from_arrow(pa.table({"k": pa.array(keys)}))
    counts_ds = salted_group_counts(ds, "k", hot_keys=np.array([7]), n_salts=8)
    assert isinstance(counts_ds, ray.data.Dataset)  # stays distributed
    out = counts_ds.to_pandas()
    got = dict(zip(out.k, out.n))
    assert got[7] == 8000 + 1  # 8000 hot + the one tail row with k=7
    assert got[1999] == 1
    assert out.n.sum() == len(keys)


def test_bucket_join_salted_hot_key(ray_session):
    """Hot-key salting: result identical to the unsalted join, with the hot
    key's rows spread over multiple sub-buckets."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from rayval.stages.join import bucket_join

    keys = ["hot"] * 500 + [f"k{i}" for i in range(50)]
    left = ray.data.from_arrow(pa.table({"k": pa.array(keys), "lval": pa.array(range(550))}))
    right = ray.data.from_arrow(
        pa.table({"k": pa.array(["hot"] + [f"k{i}" for i in range(50)]),
                  "rval": pa.array(range(51))})
    )
    plain = bucket_join(left, right, key="k", n_buckets=4).take_all()
    salted = bucket_join(
        left, right, key="k", n_buckets=4, hot_keys=np.array(["hot"], dtype=object), n_salts=4
    ).take_all()
    norm = lambda rows: sorted((r["k"], r["lval"], r["rval"]) for r in rows)
    assert norm(plain) == norm(salted)
    assert len(salted) == 550


def test_bucket_join_hot_keys_refuses_right_outer(ray_session):
    """Salting replicates hot build rows; right/outer would duplicate
    unmatched replicas — the combination must raise, not silently dupe."""
    import numpy as np
    import pyarrow as pa
    import pytest as _pt
    import ray.data

    from rayval.stages.join import bucket_join

    l = ray.data.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64()), "a": [10, 20]}))
    r = ray.data.from_arrow(pa.table({"k": pa.array([2, 42], pa.int64()), "b": [1, 2]}))
    with _pt.raises(ValueError, match="right/outer"):
        bucket_join(l, r, key="k", how="outer", hot_keys=np.array([42]))


def test_topn_per_group_multiblock(ray_session):
    """Per-batch partial pruning must still produce the exact global top-N
    per group when a group's rows span many blocks (incl. a hot group)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rayval.stages.topn import topn_per_group

    rng = np.random.default_rng(8)
    g = np.concatenate([np.full(60, 7), rng.integers(0, 5, 40)])  # group 7 is hot
    v = rng.integers(0, 1000, 100)
    k = np.arange(100)
    blocks = [
        pa.table({"g": pa.array(g[i:i+10], pa.int64()), "v": pa.array(v[i:i+10], pa.int64()),
                  "k": pa.array(k[i:i+10], pa.int64())})
        for i in range(0, 100, 10)
    ]
    out = topn_per_group(ray.data.from_arrow(blocks), "g", "v", 3, tie_col="k")
    got = sorted((r["g"], r["v"], r["k"]) for r in out.take_all())
    import pandas as pd
    df = pd.DataFrame({"g": g, "v": v, "k": k}).sort_values(["g", "v", "k"], ascending=[True, False, True])
    exp = sorted(df.groupby("g").head(3).itertuples(index=False, name=None))
    assert got == exp


def test_asof_join_brute_force(ray_session):
    """As-of join vs a pure-Python reference: per key, each left row matches
    the greatest right 'on' <= its own, else null — including keys with no
    right rows, right-only keys, and exact-timestamp matches."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rayval.stages.asof import asof_join

    rng = np.random.default_rng(12)
    n_l, n_r = 60, 50
    l = pa.table({
        "k": pa.array(rng.integers(0, 6, n_l), pa.int64()),
        "t": pa.array(rng.choice(10_000, size=n_l, replace=False).astype(np.int64)),
        "lid": pa.array(np.arange(n_l), pa.int64()),
    })
    r = pa.table({
        "k": pa.array(rng.integers(0, 8, n_r), pa.int64()),  # keys 6,7 right-only
        "t": pa.array((rng.choice(10_000, size=n_r, replace=False) + 20_000).astype(np.int64) - 20_000),
        "rid": pa.array(np.arange(n_r) + 1000, pa.int64()),
    })
    # force one exact-timestamp match
    r = r.set_column(1, "t", pa.array(np.r_[l["t"].to_numpy()[:1], r["t"].to_numpy()[1:]]))
    r = r.set_column(0, "k", pa.array(np.r_[l["k"].to_numpy()[:1], r["k"].to_numpy()[1:]]))
    out = asof_join(
        ray.data.from_arrow(l), ray.data.from_arrow(r),
        by="k", on="t", left_keep=["lid"], right_pick="rid", out_col="m",
    )
    got = {row["lid"]: row["m"] for row in out.take_all()}
    rr = list(zip(r["k"].to_pylist(), r["t"].to_pylist(), r["rid"].to_pylist()))
    for k, t, lid in zip(l["k"].to_pylist(), l["t"].to_pylist(), l["lid"].to_pylist()):
        cand = [(rt, rid) for rk, rt, rid in rr if rk == k and rt <= t]
        exp = max(cand)[1] if cand else None
        assert got[lid] == exp, (lid, got[lid], exp)
    assert len(got) == n_l


def test_range_count_join_brute_force(ray_session):
    """Range count join vs a pure-Python reference, incl. boundary inclusion
    at both window ends and keys with no right rows."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rayval.stages.asof import range_count_join

    rng = np.random.default_rng(33)
    l = pa.table({"k": pa.array(rng.integers(0, 4, 40), pa.int64()),
                  "t": pa.array(rng.integers(0, 500, 40), pa.int64()),
                  "lid": pa.array(np.arange(40), pa.int64())})
    r = pa.table({"k": pa.array(rng.integers(0, 5, 60), pa.int64()),
                  "t": pa.array(rng.integers(0, 500, 60), pa.int64())})
    out = range_count_join(
        ray.data.from_arrow(l), ray.data.from_arrow(r),
        by="k", on="t", width=50, left_keep=["lid"], out_col="n",
    )
    got = {row["lid"]: row["n"] for row in out.take_all()}
    rr = list(zip(r["k"].to_pylist(), r["t"].to_pylist()))
    for k, t, lid in zip(l["k"].to_pylist(), l["t"].to_pylist(), l["lid"].to_pylist()):
        exp = sum(1 for rk, rt in rr if rk == k and t - 50 <= rt <= t)
        assert got[lid] == exp, (lid, got[lid], exp)
    assert len(got) == 40


def test_asof_join_null_on_and_tie_break(ray_session):
    """Null `on` values match nothing (SQL comparison semantics; naive
    to_numpy would NaN-convert and match everything), and duplicate
    (by, on) right rows deterministically yield the LARGEST pick."""
    import pyarrow as pa
    import ray.data

    from rayval.stages.asof import asof_join

    l = pa.table({"k": pa.array([1, 1, 1], pa.int64()),
                  "t": pa.array([10, None, 3], pa.int64()),
                  "lid": pa.array([0, 1, 2], pa.int64())})
    for r_order in ([100, 7], [7, 100]):  # both arrival orders
        r = pa.table({"k": pa.array([1, 1], pa.int64()),
                      "t": pa.array([5, 5], pa.int64()),
                      "rid": pa.array(r_order, pa.int64())})
        out = asof_join(ray.data.from_arrow(l), ray.data.from_arrow(r),
                        by="k", on="t", left_keep=["lid"], right_pick="rid", out_col="m")
        got = {row["lid"]: row["m"] for row in out.take_all()}
        assert got == {0: 100, 1: None, 2: None}, (r_order, got)
    # null right `on` rows never match
    r2 = pa.table({"k": pa.array([1], pa.int64()),
                   "t": pa.array([None], pa.int64()),
                   "rid": pa.array([55], pa.int64())})
    out2 = asof_join(ray.data.from_arrow(l), ray.data.from_arrow(r2),
                     by="k", on="t", left_keep=["lid"], right_pick="rid", out_col="m")
    assert all(row["m"] is None for row in out2.take_all())


def test_range_count_join_null_on(ray_session):
    import pyarrow as pa
    import ray.data

    from rayval.stages.asof import range_count_join

    l = pa.table({"k": pa.array([1, 1], pa.int64()),
                  "t": pa.array([10, None], pa.int64()),
                  "lid": pa.array([0, 1], pa.int64())})
    r = pa.table({"k": pa.array([1, 1, 1], pa.int64()),
                  "t": pa.array([8, None, 100], pa.int64())})
    out = range_count_join(ray.data.from_arrow(l), ray.data.from_arrow(r),
                           by="k", on="t", width=5, left_keep=["lid"], out_col="n")
    got = {row["lid"]: row["n"] for row in out.take_all()}
    assert got == {0: 1, 1: 0}  # null right `on` not counted; null left counts 0


def test_topn_per_group_null_keys_kept(ray_session):
    """Null group keys form their own partition (ROW_NUMBER PARTITION BY
    keeps the NULL partition; pandas' groupby default would drop it)."""
    import pyarrow as pa
    import ray.data

    from rayval.stages.topn import topn_per_group

    t = pa.table({"g": pa.array([1, None, None, 1], pa.int64()),
                  "v": pa.array([5, 9, 3, 7], pa.int64()),
                  "k": pa.array([0, 1, 2, 3], pa.int64())})
    out = topn_per_group(ray.data.from_arrow(t), "g", "v", 1, tie_col="k")
    rows = sorted(((r["g"], r["v"], r["k"]) for r in out.take_all()), key=str)
    assert rows == [(1, 7, 3), (None, 9, 1)]


def test_topn_per_group_int64_beyond_2_53_with_nulls(ray_session):
    """int64 values > 2^53 with nulls present survive exactly: a pandas
    round-trip would widen the nullable int64 column to float64 and silently
    round the values; the Arrow-native path must not."""
    import pyarrow as pa
    import ray.data

    from rayval.stages.topn import topn_per_group

    big = 2**60 + 1  # not representable in float64 (rounds to 2**60)
    t = pa.table({"g": pa.array([1, 1, 1, 2], pa.int64()),
                  "v": pa.array([big, None, big - 1, 5], pa.int64()),
                  "k": pa.array([0, 1, 2, 3], pa.int64())})
    out = topn_per_group(ray.data.from_arrow(t), "g", "v", 2, tie_col="k")
    rows = sorted(((r["g"], r["v"], r["k"]) for r in out.take_all()))
    assert rows == [(1, big - 1, 2), (1, big, 0), (2, 5, 3)]


def test_bucket_join_int64_beyond_2_53_with_nulls(ray_session):
    """Same guarantee for the partitioned hash join's reducer: unmatched left
    rows make the right value column nullable, which pandas would widen to
    float64 — the Arrow join must keep the exact int64 payload."""
    import pyarrow as pa
    import ray.data

    from rayval.stages.join import bucket_join

    big = 2**60 + 1
    l = pa.table({"k": pa.array([1, 2], pa.int64()), "lv": pa.array([10, 20], pa.int64())})
    r = pa.table({"k": pa.array([1], pa.int64()), "rv": pa.array([big], pa.int64())})
    out = bucket_join(ray.data.from_arrow(l), ray.data.from_arrow(r),
                      key="k", n_buckets=4, how="left")
    rows = sorted((row["k"], row["lv"], row["rv"]) for row in out.take_all())
    assert rows == [(1, 10, big), (2, 20, None)]


def test_top_customers_per_nation_composite(ray_session, tmp_path):
    """The composite aggregate -> broadcast join -> windowed-rank pipeline vs
    a DuckDB ROW_NUMBER oracle on a small synthetic multiblock input."""
    import duckdb
    import numpy as np
    import pyarrow.parquet as pq

    from rayval.pipelines.queries import SQL_TOP_CUSTOMERS_PER_NATION, q_top_customers_per_nation

    rng = np.random.default_rng(5)
    n_cust, n_orders = 40, 400
    nation = pa.table({"n_nationkey": pa.array(np.arange(4), pa.int64()),
                       "n_name": pa.array([f"N{i}" for i in range(4)], pa.string())})
    customer = pa.table({"c_custkey": pa.array(np.arange(n_cust), pa.int64()),
                         "c_nationkey": pa.array(rng.integers(0, 4, n_cust), pa.int64())})
    orders = pa.table({"o_custkey": pa.array(rng.integers(0, n_cust, n_orders), pa.int64()),
                       "o_totalprice": pa.array(np.round(rng.uniform(1, 9e4, n_orders), 2))})
    for name, t in [("nation", nation), ("customer", customer), ("orders", orders)]:
        pq.write_table(t, str(tmp_path / f"{name}.parquet"), row_group_size=64)
    got = q_top_customers_per_nation(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    for name in ("nation", "customer", "orders"):
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{tmp_path}/{name}.parquet')")
    exp = con.execute(SQL_TOP_CUSTOMERS_PER_NATION).df()
    assert got.values.tolist() == exp.values.tolist()


def test_range_pairs_join_brute_force(ray_session):
    """Pair-form range join vs a pure-Python reference: exact pair set incl.
    boundary inclusion, keys with no right rows, and null `on` on both sides
    (inner semantics: such rows emit nothing)."""
    import numpy as np
    import ray.data

    from rayval.stages.asof import range_pairs_join

    rng = np.random.default_rng(77)
    l = pa.table({"k": pa.array(rng.integers(0, 4, 40), pa.int64()),
                  "t": pa.array([None if i % 13 == 5 else int(x) for i, x in
                                 enumerate(rng.integers(0, 300, 40))], pa.int64()),
                  "lid": pa.array(np.arange(40), pa.int64())})
    r = pa.table({"k": pa.array(rng.integers(0, 5, 60), pa.int64()),
                  "t": pa.array([None if i % 11 == 3 else int(x) for i, x in
                                 enumerate(rng.integers(0, 300, 60))], pa.int64()),
                  "rid": pa.array(np.arange(60) + 500, pa.int64())})
    out = range_pairs_join(
        ray.data.from_arrow(l), ray.data.from_arrow(r),
        by="k", on="t", width=40, left_keep=["lid"], right_pick="rid", out_col="rid",
    )
    got = sorted((row["lid"], row["rid"]) for row in out.take_all())
    rr = list(zip(r["k"].to_pylist(), r["t"].to_pylist(), r["rid"].to_pylist()))
    exp = sorted(
        (lid, rid)
        for k, t, lid in zip(l["k"].to_pylist(), l["t"].to_pylist(), l["lid"].to_pylist())
        if t is not None
        for rk, rt, rid in rr
        if rk == k and rt is not None and t - 40 <= rt <= t
    )
    assert got == exp


def test_range_pairs_join_cap_refuses(ray_session):
    import numpy as np
    import pytest
    import ray.data

    from rayval.stages.asof import range_pairs_join

    l = pa.table({"k": pa.array([1] * 20, pa.int64()), "t": pa.array(np.arange(20), pa.int64()),
                  "lid": pa.array(np.arange(20), pa.int64())})
    r = pa.table({"k": pa.array([1] * 20, pa.int64()), "t": pa.array(np.arange(20), pa.int64()),
                  "rid": pa.array(np.arange(20), pa.int64())})
    out = range_pairs_join(ray.data.from_arrow(l), ray.data.from_arrow(r),
                           by="k", on="t", width=100, left_keep=["lid"],
                           right_pick="rid", max_pairs_per_key=10)
    with pytest.raises(Exception, match="max_pairs_per_key"):
        out.take_all()


def test_asof_join_string_pick_with_nulls(ray_session):
    """A string right_pick column containing nulls must not crash the
    reducer (np.lexsort over an object array raises TypeError); null picks
    lose ties to non-null picks and surface as null only when matched row's
    pick is itself null."""
    import ray.data

    from rayval.stages.asof import asof_join

    l = pa.table({"k": pa.array([1, 1], pa.int64()),
                  "t": pa.array([10, 20], pa.int64()),
                  "lid": pa.array([0, 1], pa.int64())})
    r = pa.table({"k": pa.array([1, 1, 1], pa.int64()),
                  "t": pa.array([5, 5, 15], pa.int64()),
                  "name": pa.array(["abc", None, None], pa.string())})
    out = asof_join(ray.data.from_arrow(l), ray.data.from_arrow(r),
                    by="k", on="t", left_keep=["lid"], right_pick="name", out_col="m")
    got = {row["lid"]: row["m"] for row in out.take_all()}
    # lid 0: tie at t=5 -> non-null "abc" beats null; lid 1: t=15 row picked, null pick
    assert got == {0: "abc", 1: None}


def test_topn_per_group_ascending_bottom_n(ray_session):
    import pyarrow as pa
    import ray.data

    from rayval.stages.topn import topn_per_group

    t = pa.table({"g": pa.array([1, 1, 1, 2], pa.int64()),
                  "v": pa.array(["c", "a", "b", "z"], pa.string()),
                  "k": pa.array([0, 1, 2, 3], pa.int64())})
    out = topn_per_group(ray.data.from_arrow(t), "g", "v", 2, tie_col="k", ascending=True)
    rows = sorted((r["g"], r["v"], r["k"]) for r in out.take_all())
    assert rows == [(1, "a", 1), (1, "b", 2), (2, "z", 3)]


def _messy_sides():
    """Fixture with the edge cases the temporal joins pin: null keys, null
    `on` on both sides, duplicate (by, on) right rows, null picks, keys with
    only-left / only-right rows."""
    import numpy as np

    rng = np.random.default_rng(99)
    n_l, n_r = 200, 180
    lk = rng.integers(0, 40, n_l).astype("float64")
    lk[rng.random(n_l) < 0.05] = np.nan
    lt = rng.integers(0, 5_000, n_l).astype("float64")
    lt[rng.random(n_l) < 0.07] = np.nan
    rk = rng.integers(5, 45, n_r).astype("float64")
    rk[rng.random(n_r) < 0.05] = np.nan
    rt = rng.integers(0, 5_000, n_r).astype("float64")
    rt[rng.random(n_r) < 0.07] = np.nan
    rt[:20] = rt[20:40]  # planted duplicate right `on` values
    rk[:20] = rk[20:40]
    pick = np.arange(n_r).astype("float64")
    pick[rng.random(n_r) < 0.1] = np.nan
    l = pa.table({
        "k": pa.array([None if np.isnan(v) else int(v) for v in lk], pa.int64()),
        "t": pa.array([None if np.isnan(v) else int(v) for v in lt], pa.int64()),
        "lid": pa.array(np.arange(n_l), pa.int64()),
    })
    r = pa.table({
        "k": pa.array([None if np.isnan(v) else int(v) for v in rk], pa.int64()),
        "t": pa.array([None if np.isnan(v) else int(v) for v in rt], pa.int64()),
        "rid": pa.array([None if np.isnan(v) else int(v) for v in pick], pa.int64()),
    })
    return l, r


def _sorted_rows(t: pa.Table):
    df = t.to_pandas()
    df = df[sorted(df.columns)].astype(str)
    return sorted(map(tuple, df.values))


def test_temporal_joins_bucketed_equals_per_key(ray_session):
    """The hash-bucketed reduce (n_buckets=64, the default — B Python calls)
    must produce exactly the per-key grouping's output (n_buckets=0 — one
    call per key) for all three temporal joins, on a fixture with null keys,
    null `on`, duplicate (by, on) and null picks."""
    import ray.data

    from rayval.stages.asof import asof_join, range_count_join, range_pairs_join

    l, r = _messy_sides()
    for fn, kw in [
        (asof_join, dict(left_keep=["lid"], right_pick="rid", out_col="m")),
        (range_count_join, dict(width=300, left_keep=["lid"], out_col="n")),
        (range_pairs_join, dict(width=300, left_keep=["lid"], right_pick="rid", out_col="m")),
    ]:
        got_b = fn(ray.data.from_arrow(l), ray.data.from_arrow(r),
                   by="k", on="t", n_buckets=8, **kw)
        got_k = fn(ray.data.from_arrow(l), ray.data.from_arrow(r),
                   by="k", on="t", n_buckets=0, **kw)
        rows_b = _sorted_rows(pa.Table.from_pylist(got_b.take_all()))
        rows_k = _sorted_rows(pa.Table.from_pylist(got_k.take_all()))
        assert rows_b == rows_k, fn.__name__


def test_window_ops_bucketed_equals_per_key(ray_session):
    """grouped_lag and sessionize: bucketed reduce ≡ per-key grouping,
    including ties on ts and single-event keys."""
    import numpy as np
    import ray.data

    from rayval.stages.windows import grouped_lag, sessionize

    rng = np.random.default_rng(7)
    n = 400
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 60, n), pa.int64()),
        "ts": pa.array(
            rng.integers(0, 10_000_000, n).astype("datetime64[us]").astype("datetime64[us]")
        ),
        "event_id": pa.array(np.arange(n), pa.int64()),
    })
    ds = lambda: ray.data.from_arrow(t)  # noqa: E731
    lag_b = pa.Table.from_pylist(grouped_lag(ds(), "user_id", "ts", "event_id", n_buckets=8).take_all())
    lag_k = pa.Table.from_pylist(grouped_lag(ds(), "user_id", "ts", "event_id", n_buckets=0).take_all())
    assert _sorted_rows(lag_b) == _sorted_rows(lag_k)
    s_b = pa.Table.from_pylist(sessionize(ds(), "user_id", "ts", gap_us=60_000_000, n_buckets=8).take_all())
    s_k = pa.Table.from_pylist(sessionize(ds(), "user_id", "ts", gap_us=60_000_000, n_buckets=0).take_all())
    assert _sorted_rows(s_b) == _sorted_rows(s_k)
    # sanity: session counts sum to the row count
    assert sum(r["n_events"] for r in s_b.to_pylist()) == n


def test_range_pairs_cap_bins_per_key(ray_session):
    """The per-key pair cap must bin each key separately (regression: a
    shared bincount bin merged two groups and a within-bounds join tripped
    the cap on their combined total)."""
    import numpy as np
    import ray.data

    from rayval.stages.asof import range_pairs_join

    # two keys, each 8 window pairs (t=10->{9,10}, t=11->{9,10,11},
    # t=12->{9,10,11}); cap 10 passes per key, would fail on the merged 16
    l = pa.table({
        "k": pa.array([1, 1, 1, 0, 0, 0], pa.int64()),
        "t": pa.array([10, 11, 12, 10, 11, 12], pa.int64()),
        "lid": pa.array(list(range(6)), pa.int64()),
    })
    r = pa.table({
        "k": pa.array([1, 1, 1, 0, 0, 0], pa.int64()),
        "t": pa.array([9, 10, 11, 9, 10, 11], pa.int64()),
        "rid": pa.array(list(range(100, 106)), pa.int64()),
    })
    out = range_pairs_join(
        ray.data.from_arrow(l), ray.data.from_arrow(r),
        by="k", on="t", width=5, left_keep=["lid"], right_pick="rid",
        out_col="m", max_pairs_per_key=10, n_buckets=1,  # one bucket: both groups together
    )
    rows = out.take_all()
    assert len(rows) == 16  # 8 pairs per key, no spurious cap trip


def test_temporal_joins_null_key_sql_semantics(ray_session):
    """SQL ON-clause parity: ``l.by = r.by`` is never true for NULL, so a
    null-key left row comes out unmatched (null pick / count 0 / no pairs)
    even when a null-key right row would 'match' under null==null grouping —
    unlike the window ops, whose PARTITION BY analog groups nulls."""
    import ray.data

    from rayval.stages.asof import asof_join, range_count_join, range_pairs_join

    l = pa.table({
        "k": pa.array([None, 0], pa.int64()),
        "t": pa.array([10, 10], pa.int64()),
        "lid": pa.array([0, 1], pa.int64()),
    })
    r = pa.table({
        "k": pa.array([None, 0], pa.int64()),
        "t": pa.array([9, 9], pa.int64()),
        "rid": pa.array([100, 101], pa.int64()),
    })
    ds = lambda t: ray.data.from_arrow(t)  # noqa: E731
    a = {row["lid"]: row["m"] for row in asof_join(
        ds(l), ds(r), by="k", on="t", left_keep=["lid"], right_pick="rid",
        out_col="m", n_buckets=1).take_all()}
    assert a == {0: None, 1: 101}
    c = {row["lid"]: row["n"] for row in range_count_join(
        ds(l), ds(r), by="k", on="t", width=5, left_keep=["lid"],
        out_col="n", n_buckets=1).take_all()}
    assert c == {0: 0, 1: 1}
    p = range_pairs_join(
        ds(l), ds(r), by="k", on="t", width=5, left_keep=["lid"],
        right_pick="rid", out_col="m", n_buckets=1).take_all()
    assert [(row["lid"], row["m"]) for row in p] == [(1, 101)]


def test_window_ops_null_ts_semantics(ray_session):
    """grouped_lag: a null-ts row gets null prev/gap and never serves as a
    prev (a NaT int64 round-trip would fabricate wrapped garbage gaps);
    sessionize drops null-ts rows."""
    import ray.data

    from rayval.stages.windows import grouped_lag, sessionize
    import numpy as np

    ts = pa.array([None, np.datetime64(1_000_000, "us"), np.datetime64(3_000_000, "us")],
                  type=pa.timestamp("us"))
    t = pa.table({"user_id": pa.array([1, 1, 1], pa.int64()), "ts": ts,
                  "event_id": pa.array([10, 11, 12], pa.int64())})
    lag = {r["event_id"]: (r["prev_event_id"], r["gap_us"])
           for r in grouped_lag(ray.data.from_arrow(t), "user_id", "ts", "event_id",
                                n_buckets=4).take_all()}
    assert lag[10] == (None, None)          # null ts: no prev
    assert lag[11] == (None, None)          # its predecessor has null ts
    assert lag[12] == (11, 2_000_000)       # normal LAG
    sess = sessionize(ray.data.from_arrow(t), "user_id", "ts", gap_us=10_000_000,
                      n_buckets=4).take_all()
    assert len(sess) == 1 and sess[0]["n_events"] == 2  # null-ts row dropped
    assert sess[0]["session_start"] == 1_000_000


def test_hopping_window_agg_brute_force(ray_session):
    """hopping_window_agg vs a per-row python reference: every event counts
    in exactly k = window/hop windows; null ts dropped; null value sums 0;
    multi-block input (partial aggregation across block boundaries)."""
    import collections

    import numpy as np
    import ray.data

    from rayval.stages.windows import hopping_window_agg

    rng = np.random.default_rng(11)
    n = 500
    hop, win = 900_000_000, 3_600_000_000
    ts = rng.integers(0, 40 * hop, n)
    types = rng.choice(["a", "b", None], n, p=[0.5, 0.4, 0.1]).tolist()
    vals = rng.uniform(-5, 5, n).round(4)
    ts_mask = rng.random(n) < 0.05
    val_mask = rng.random(n) < 0.05
    t = pa.table({
        "ts": pa.array([None if m else int(v) for m, v in zip(ts_mask, ts)],
                       pa.int64()).cast(pa.timestamp("us")),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array([None if m else float(v) for m, v in zip(val_mask, vals)],
                          pa.float64()),
    })
    out = pa.Table.from_pylist(
        hopping_window_agg(
            ray.data.from_arrow(t).repartition(7), "ts", "event_type", "value",
            window_us=win, hop_us=hop,
        ).take_all()
    )
    exp_n, exp_s = collections.Counter(), collections.Counter()
    for i in range(n):
        if ts_mask[i]:
            continue
        v = 0.0 if val_mask[i] else float(vals[i])
        e3 = int(np.sign(v) * np.floor(abs(v) * 1000 + 0.5))
        b = int(ts[i]) // hop
        for j in range(win // hop):
            key = ((b - j) * hop, types[i])
            exp_n[key] += 1
            exp_s[key] += e3
    got = {(r["window_start_us"], r["event_type"]): (r["n"], r["sum_value_e3"])
           for r in out.to_pylist()}
    assert got == {k: (exp_n[k], exp_s[k]) for k in exp_n}
    assert sum(exp_n.values()) == (n - int(ts_mask.sum())) * (win // hop)


def test_hopping_window_agg_rejects_non_multiple(ray_session):
    import ray.data

    from rayval.stages.windows import hopping_window_agg

    t = pa.table({"ts": pa.array([0], pa.int64()).cast(pa.timestamp("us")),
                  "event_type": pa.array(["a"]), "value": pa.array([1.0])})
    with pytest.raises(ValueError):
        hopping_window_agg(ray.data.from_arrow(t), "ts", "event_type", "value",
                           window_us=1000, hop_us=300)


def test_hopping_window_agg_all_null_ts_block(ray_session):
    """A block that is ENTIRELY null-ts (and an empty block) must emit the
    same partial schema as populated blocks — a heterogeneous empty block
    entering the sort exchange is the documented Ray pathology; also the
    all-null-value group sums to 0 (the oracle COALESCEs to match)."""
    import ray.data

    from rayval.stages.windows import hopping_window_agg

    hop = 900_000_000
    t_null = pa.table({
        "ts": pa.array([None] * 5, pa.int64()).cast(pa.timestamp("us")),
        "event_type": pa.array(["a"] * 5, pa.string()),
        "value": pa.array([1.0] * 5, pa.float64()),
    })
    t_real = pa.table({
        "ts": pa.array([hop + 7, hop + 9], pa.int64()).cast(pa.timestamp("us")),
        "event_type": pa.array(["a", "a"], pa.string()),
        "value": pa.array([None, None], pa.float64()),
    })
    ds = ray.data.from_arrow(t_null).union(ray.data.from_arrow(t_real))
    out = pa.Table.from_pylist(
        hopping_window_agg(ds, "ts", "event_type", "value",
                           window_us=4 * hop, hop_us=hop).take_all()
    )
    got = {(r["window_start_us"], r["event_type"]): (r["n"], r["sum_value_e3"])
           for r in out.to_pylist()}
    # 2 non-null-ts rows in bucket 1, all-null values -> n=2, sum 0, 4 windows
    assert got == {((1 - j) * hop, "a"): (2, 0) for j in range(4)}


def test_hopping_window_agg_rejects_nonpositive(ray_session):
    import ray.data

    from rayval.stages.windows import hopping_window_agg

    t = pa.table({"ts": pa.array([0], pa.int64()).cast(pa.timestamp("us")),
                  "event_type": pa.array(["a"]), "value": pa.array([1.0])})
    for w, h in ((3600, 0), (-3600, -900), (0, 900)):
        with pytest.raises(ValueError):
            hopping_window_agg(ray.data.from_arrow(t), "ts", "event_type", "value",
                               window_us=w, hop_us=h)


def test_window_and_asof_null_parity_vs_duckdb(ray_session):
    """Engine vs the REGISTERED oracle SQL shapes on a null-bearing table —
    the exact scenario the production fixtures mask (they carry no null
    ts/keys): sessionize/grouped_lag against the two-branch LAG + filtered
    session SQL, asof_join against ASOF LEFT JOIN."""
    import duckdb
    import ray.data

    from rayval.stages.asof import asof_join
    from rayval.stages.windows import grouped_lag, sessionize

    ev = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "user_id": pa.array([1, 1, 1, None, None, 2], pa.int64()),
        "ts": pa.array([1_000_000, 3_000_000, None, 5_000_000, None, 7_000_000],
                       pa.int64()).cast(pa.timestamp("us")),
    })
    con = duckdb.connect()
    con.register("events", ev)

    lag = pa.Table.from_pylist(
        grouped_lag(ray.data.from_arrow(ev), "user_id", "ts", "event_id",
                    n_buckets=2).take_all())
    sql_lag = con.execute("""
        SELECT event_id, user_id, LAG(event_id) OVER w AS prev_event_id,
               CAST(epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS BIGINT) AS gap_us
        FROM events WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        UNION ALL
        SELECT event_id, user_id, NULL, NULL FROM events WHERE ts IS NULL
    """).arrow().cast(lag.schema)
    assert _sorted_rows(lag) == _sorted_rows(sql_lag)

    ses = pa.Table.from_pylist(
        sessionize(ray.data.from_arrow(ev), "user_id", "ts", gap_us=60_000_000,
                   n_buckets=2).take_all())
    sql_ses = con.execute("""
        WITH marked AS (
          SELECT user_id, ts,
                 CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 60000000
                      OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1 ELSE 0 END AS s
          FROM events WHERE ts IS NOT NULL
        ), numbered AS (
          SELECT user_id, ts, SUM(s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked
        )
        SELECT user_id, CAST(MIN(epoch_us(ts)) AS BIGINT) AS session_start, COUNT(*) AS n_events
        FROM numbered GROUP BY user_id, sid
    """).arrow().cast(ses.schema)
    assert _sorted_rows(ses) == _sorted_rows(sql_ses)

    right = pa.table({
        "user_id": pa.array([1, None], pa.int64()),
        "ts": pa.array([500_000, 500_000], pa.int64()).cast(pa.timestamp("us")),
        "rid": pa.array([100, 101], pa.int64()),
    })
    con.register("r", right)
    a = pa.Table.from_pylist(
        asof_join(ray.data.from_arrow(ev), ray.data.from_arrow(right),
                  by="user_id", on="ts", left_keep=["event_id"],
                  right_pick="rid", out_col="m", n_buckets=2).take_all())
    # two-branch shape of the registered oracle: DuckDB's ASOF binary-search
    # quirk matches a NULL probe ts to the LAST build row, so null-ts probes
    # are split out with a NULL match (engine: null matches nothing)
    sql_a = con.execute("""
        SELECT l.event_id, r.rid AS m FROM events l
        ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        WHERE l.ts IS NOT NULL
        UNION ALL
        SELECT event_id, NULL FROM events WHERE ts IS NULL
    """).arrow().cast(a.schema)
    assert _sorted_rows(a) == _sorted_rows(sql_a)


def test_grouped_cumsum_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from rayval.stages.windows import grouped_cumsum
    from rayval.util import round_half_away

    rng = np.random.default_rng(31)
    n = 3_000
    base = np.datetime64("2024-01-01", "us")
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 80, n),
            "ts": base + rng.integers(0, 10**9, n).astype("timedelta64[us]"),
            "value": rng.normal(0, 10, n),
        }
    )
    # nulls in both value and ts
    df.loc[df.index % 17 == 0, "value"] = np.nan
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.loc[df.index % 23 == 0, "ts"] = pd.NaT
    t = pa.Table.from_pandas(df, preserve_index=False)
    got = (
        grouped_cumsum(ray.data.from_arrow(t).repartition(5), "user_id", "ts",
                       "event_id", "value")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # brute force: sort (user, ts NULLS LAST, id), e3-round, per-user cumsum
    b = df.copy()
    b["e3"] = round_half_away(b["value"].fillna(0.0).to_numpy() * 1000)
    b["_ts_null"] = b["ts"].isna()
    b = b.sort_values(["user_id", "_ts_null", "ts", "event_id"])
    b["run_e3"] = b.groupby("user_id")["e3"].cumsum()
    b = b.sort_values("event_id").reset_index(drop=True)
    assert (got["run_e3"].to_numpy() == b["run_e3"].to_numpy()).all()
    assert len(got) == n


def test_grouped_cumsum_bucketed_equals_per_key(ray_session):
    import numpy as np
    import ray

    from rayval.stages.windows import grouped_cumsum

    rng = np.random.default_rng(37)
    n = 1_000
    base = np.datetime64("2024-01-01", "us")
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, 50, n)),
            "ts": pa.array((base + rng.integers(0, 10**8, n).astype("timedelta64[us]"))),
            "value": pa.array(rng.normal(0, 5, n)),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    a = (grouped_cumsum(ds, "user_id", "ts", "event_id", "value", n_buckets=8)
         .to_pandas().sort_values("event_id").reset_index(drop=True))
    b = (grouped_cumsum(ds, "user_id", "ts", "event_id", "value", n_buckets=0)
         .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert (a["run_e3"].to_numpy() == b["run_e3"].to_numpy()).all()


def test_pivot_counts_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from rayval.stages.pivot import pivot_counts

    rng = np.random.default_rng(3)
    n = 2_000
    keys = [None if i % 41 == 0 else int(v) for i, v in enumerate(rng.integers(0, 30, n))]
    cats = [None if i % 13 == 0 else c
            for i, c in enumerate(np.array(["view", "click", "purchase", "zz"])[rng.integers(0, 4, n)])]
    t = pa.table({"user_id": pa.array(keys, type=pa.int64()),
                  "event_type": pa.array(cats, type=pa.string())})
    out = pivot_counts(ray.data.from_arrow(t).repartition(5), "user_id", "event_type",
                       ["view", "click", "purchase"]).to_pandas()
    exp = {}
    for k, c in zip(keys, cats):
        d = exp.setdefault(k, {"n_view": 0, "n_click": 0, "n_purchase": 0, "n_other": 0})
        d[f"n_{c}" if c in ("view", "click", "purchase") else "n_other"] += 1
    assert len(out) == len(exp)
    for _, r in out.iterrows():
        k = None if pd.isna(r.user_id) else int(r.user_id)
        for c in ["n_view", "n_click", "n_purchase", "n_other"]:
            assert int(r[c]) == exp[k][c], (k, c)
    # row totals account for EVERY input row (nothing silently dropped)
    assert int(out[["n_view", "n_click", "n_purchase", "n_other"]].to_numpy().sum()) == n


def test_pivot_counts_no_other_and_validation(ray_session):
    import ray

    from rayval.stages.pivot import pivot_counts

    t = pa.table({"k": pa.array([1, 1, 2], type=pa.int64()),
                  "c": pa.array(["a", "b", "a"])})
    ds = ray.data.from_arrow(t)
    out = pivot_counts(ds, "k", "c", ["a"], other_col=None).to_pandas()
    assert list(out.columns) == ["k", "n_a"]
    assert dict(zip(out.k, out.n_a)) == {1: 1, 2: 1}
    with pytest.raises(ValueError):
        pivot_counts(ds, "k", "c", [])
    with pytest.raises(ValueError):
        pivot_counts(ds, "k", "c", ["a", "a"])


def test_grouped_rolling_sum_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from rayval.stages.windows import grouped_rolling_sum
    from rayval.util import round_half_away

    rng = np.random.default_rng(41)
    n = 2_500
    base = np.datetime64("2024-01-01", "us")
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 60, n),
            "ts": (base + rng.integers(0, 10**9, n).astype("timedelta64[us]")).astype("datetime64[us]"),
            "value": rng.normal(0, 10, n),
        }
    )
    df.loc[df.index % 19 == 0, "value"] = np.nan
    t = pa.Table.from_pandas(df, preserve_index=False)
    k = 3
    got = (
        grouped_rolling_sum(ray.data.from_arrow(t).repartition(5), "user_id", "ts",
                            "event_id", "value", k=k)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    b = df.copy()
    b["e3"] = round_half_away(b["value"].fillna(0.0).to_numpy() * 1000)
    b = b.sort_values(["user_id", "ts", "event_id"])
    b["roll_e3"] = (
        b.groupby("user_id")["e3"].rolling(k + 1, min_periods=1).sum()
        .reset_index(level=0, drop=True).astype(np.int64)
    )
    b = b.sort_values("event_id").reset_index(drop=True)
    assert (got["roll_e3"].to_numpy() == b["roll_e3"].to_numpy()).all()
    # k=0 degenerates to the row's own value
    got0 = (
        grouped_rolling_sum(ray.data.from_arrow(t), "user_id", "ts",
                            "event_id", "value", k=0)
        .to_pandas().sort_values("event_id")
    )
    assert (got0["roll_e3"].to_numpy()
            == round_half_away(df["value"].fillna(0.0).to_numpy() * 1000)).all()
    with pytest.raises(ValueError):
        grouped_rolling_sum(ray.data.from_arrow(t), "user_id", "ts", "event_id", "value", k=-1)
