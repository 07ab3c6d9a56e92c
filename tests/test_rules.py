"""TableRule dispatcher (stages/rules.py): the declarative table-level
contract executed end-to-end."""

import numpy as np
import pyarrow as pa
import pytest

from rayval.constraints import Field as F, Profile, TableRule
from rayval.stages.rules import run_table_rules, unique_violations
from rayval.stages.stats import ColumnStats


@pytest.fixture()
def dup_ds(ray_session):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([f"r{i}" for i in range(8)]),
                "v": pa.array([1, 2, 2, 3, 4, 4, 4, 5], type=pa.int64()),
                "x": pa.array([10.0, 11.0, 9.0, 12.0, 8.0, 10.5, 9.5, 11.5]),
            }
        )
    )


def test_unique_rule(dup_ds):
    out = unique_violations(dup_ds, "v", key="k")
    got = sorted(zip(out["k"].to_pylist(), out["constraint_id"].to_pylist()))
    assert got == [("r1", "v.unique"), ("r2", "v.unique"),
                   ("r4", "v.unique"), ("r5", "v.unique"), ("r6", "v.unique")]


def test_unique_rule_semijoin_path_identical(dup_ds):
    """hot_threshold=1 forces the hash-partitioned semi-join fallback (dup
    set 'too big to broadcast'); the listing must match the broadcast path
    exactly — including string-valued columns and null values."""
    broadcast = unique_violations(dup_ds, "v", key="k", hot_threshold=1000)
    semijoin = unique_violations(dup_ds, "v", key="k", hot_threshold=1, n_buckets=4)
    assert broadcast.to_pydict() == semijoin.to_pydict()

    import ray.data

    strs = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([f"s{i}" for i in range(6)]),
                "v": pa.array(["a", "b", "a", None, None, "c"]),
            }
        )
    )
    b2 = unique_violations(strs, "v", key="k", hot_threshold=1000)
    s2 = unique_violations(strs, "v", key="k", hot_threshold=1, n_buckets=4)
    assert b2.to_pydict() == s2.to_pydict()
    assert sorted(b2["k"].to_pylist()) == ["s0", "s2"]  # nulls are not dups


def test_referential_rule(dup_ds, ray_session):
    import ray.data

    valid = ray.data.from_arrow(pa.table({"v": pa.array([1, 2, 3], type=pa.int64())}))
    prof = Profile("t", [F("v")], key="k",
                   table_rules=[TableRule("referential", "v")])
    out = run_table_rules(dup_ds, prof, key="k", ref_sources={"v": valid})
    bad = sorted(out["k"].to_pylist())
    assert bad == ["r4", "r5", "r6", "r7"]  # v in {4,4,4,5} unresolvable
    assert set(out["constraint_id"].to_pylist()) == {"v.referential"}


def test_drift_rule(dup_ds):
    ref_same = ColumnStats(numeric_cols=["x"], unique_cols=[])
    ref_same.update(pa.table({"x": pa.array([10.0, 11.0, 9.0, 12.0, 8.0, 10.5, 9.5, 11.5])}))
    prof = Profile("t", [F("x")], key="k",
                   table_rules=[TableRule("drift", "x", {"threshold": 0.3})])
    out = run_table_rules(dup_ds, prof, key="k", reference_profile=ref_same)
    assert out.num_rows == 0

    ref_shifted = ColumnStats(numeric_cols=["x"], unique_cols=[])
    ref_shifted.update(pa.table({"x": pa.array(np.linspace(100, 200, 500))}))
    out2 = run_table_rules(dup_ds, prof, key="k", reference_profile=ref_shifted)
    assert out2.num_rows == 1
    assert out2["constraint_id"][0].as_py() == "stats.drift.x"


def test_missing_ref_source_raises(dup_ds):
    prof = Profile("t", [F("v")], key="k", table_rules=[TableRule("referential", "v")])
    with pytest.raises(ValueError, match="ref_sources"):
        run_table_rules(dup_ds, prof, key="k")


def test_unique_rule_semijoin_null_key_rows_kept(ray_session):
    """A DATA row whose KEY is null is still a duplicate-group member: the
    semi-join must not mistake it for a dup-value marker row (sides carry an
    explicit marker, not key-nullness) — both paths must list it."""
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([None, "r2", "r3"], type=pa.string()),
                "v": pa.array(["a", "a", "b"]),
            }
        )
    )
    broadcast = unique_violations(ds, "v", key="k", hot_threshold=1000)
    semijoin = unique_violations(ds, "v", key="k", hot_threshold=0, n_buckets=4)
    assert broadcast.to_pydict() == semijoin.to_pydict()
    assert broadcast.num_rows == 2  # the null-key member AND r2
    assert set(broadcast["k"].to_pylist()) == {None, "r2"}


def test_many_concurrent_rule_dags(dup_ds, ray_session):
    """Stress the rule dispatcher's thread pool (pinned at 2-way overlap)
    with FOUR independent rule DAGs: the gathered listing must equal the
    union of each rule run serially — declaration order and the pinned sort
    make the comparison exact."""
    import ray.data

    valid = ray.data.from_arrow(pa.table({"v": pa.array([1, 2, 3], type=pa.int64())}))
    ref_shifted = ColumnStats(numeric_cols=["x"], unique_cols=[])
    ref_shifted.update(pa.table({"x": pa.array(np.linspace(100, 200, 500))}))
    rules = [
        TableRule("unique", "v"),
        TableRule("referential", "v"),
        TableRule("drift", "x", {"threshold": 0.3}),
        TableRule("unique", "x"),
    ]
    prof_all = Profile("t", [F("v"), F("x")], key="k", table_rules=rules)
    got = run_table_rules(
        dup_ds, prof_all, key="k", ref_sources={"v": valid}, reference_profile=ref_shifted
    )
    serial = []
    for r in rules:
        p1 = Profile("t", [F("v"), F("x")], key="k", table_rules=[r])
        out = run_table_rules(
            dup_ds, p1, key="k", ref_sources={"v": valid}, reference_profile=ref_shifted
        )
        serial.extend(zip(out["k"].to_pylist(), out["constraint_id"].to_pylist()))
    assert sorted(zip(got["k"].to_pylist(), got["constraint_id"].to_pylist()),
                  key=lambda t: (t[0] or "", t[1])) == sorted(
        serial, key=lambda t: (t[0] or "", t[1]))


def test_neardup_rule(ray_session):
    """TableRule('neardup', hash_col): the declarative route into the banded
    Hamming join — members at 1..max_hamming bits flagged, exact duplicates
    (d=0) and out-of-radius rows not, nulls never."""
    import ray.data

    base = 0x5A5A0FF0C3C31234
    t = pa.table(
        {
            "k": pa.array([f"r{i}" for i in range(7)]),
            # r0/r1: 1 bit apart; r2/r3: identical (exact dup, NOT near);
            # r4: 5 bits from r0 (outside radius 2); r5: null; r6: far
            "h": pa.array(
                [base, base ^ 1, 7, 7, base ^ 0b11111, None, -1],
                type=pa.int64(),
            ),
        }
    )
    prof = Profile(
        "t", [F("k"), F("h")], key="k",
        table_rules=[TableRule("neardup", "h", {"max_hamming": 2})],
    )
    out = run_table_rules(ray.data.from_arrow(t).repartition(2), prof, key="k")
    got = sorted(zip(out["k"].to_pylist(), out["constraint_id"].to_pylist()))
    assert got == [("r0", "h.neardup"), ("r1", "h.neardup")]


def test_neardup_rule_int_key(ray_session):
    """The neardup rule casts a non-string profile key to string itself
    (every other rule kind does the same) instead of crashing in the pair
    join."""
    import ray.data

    base = 0x00F0F0F0F0F0F0F0
    t = pa.table(
        {
            "ik": pa.array([101, 102, 103], type=pa.int64()),
            "h": pa.array([base, base ^ 2, -5], type=pa.int64()),
        }
    )
    prof = Profile(
        "t", [F("ik"), F("h")], key="ik",
        table_rules=[TableRule("neardup", "h", {"max_hamming": 1})],
    )
    out = run_table_rules(ray.data.from_arrow(t), prof, key="ik")
    got = sorted(zip(out["ik"].to_pylist(), out["constraint_id"].to_pylist()))
    assert got == [("101", "h.neardup"), ("102", "h.neardup")]


# -------------------------------------------------- functional dependency
@pytest.fixture()
def fd_ds(ray_session):
    import ray.data

    # a=10 consistent (b=1 twice); a=20 violating (b=1,2); a=30 single row;
    # a=40 violating only via non-null Bs (nulls don't count toward
    # distinctness) but its null-B row is still a member; null-A rows never
    # violate
    return ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([f"r{i}" for i in range(9)]),
                "a": pa.array([10, 10, 20, 20, 30, 40, 40, 40, None], type=pa.int64()),
                "b": pa.array([1, 1, 1, 2, 7, 5, 6, None, 9], type=pa.int64()),
            }
        )
    ).repartition(3)


def test_functional_rule_members_and_null_semantics(fd_ds):
    from rayval.stages.rules import functional_violations

    out = functional_violations(fd_ds, "a", "b", key="k")
    got = sorted(out["k"].to_pylist())
    # a=20 rows (r2, r3) and ALL a=40 rows incl. the null-B one (r5, r6, r7)
    assert got == ["r2", "r3", "r5", "r6", "r7"]
    assert set(out["constraint_id"].to_pylist()) == {"a.functional.b"}


def test_functional_rule_semijoin_path_identical(fd_ds):
    from rayval.stages.rules import functional_violations

    broadcast = functional_violations(fd_ds, "a", "b", key="k", hot_threshold=1000)
    semijoin = functional_violations(fd_ds, "a", "b", key="k", hot_threshold=0, n_buckets=4)
    assert sorted(broadcast["k"].to_pylist()) == sorted(semijoin["k"].to_pylist())
    assert broadcast.num_rows == semijoin.num_rows


def test_functional_rule_no_violations(ray_session):
    import ray.data

    from rayval.stages.rules import functional_violations

    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(["x", "y"]), "a": pa.array([1, 2], type=pa.int64()),
                  "b": pa.array([1, 1], type=pa.int64())})
    )
    out = functional_violations(ds, "a", "b", key="k")
    assert out.num_rows == 0


def test_functional_rule_via_dispatcher(fd_ds):
    prof = Profile(
        "fd", [], key="k",
        table_rules=[TableRule("functional", "a", {"determines": "b"})],
    )
    out = run_table_rules(fd_ds, prof, key="k")
    assert sorted(out["k"].to_pylist()) == ["r2", "r3", "r5", "r6", "r7"]


def test_functional_rule_missing_determines_raises(fd_ds):
    prof = Profile("fd", [], key="k", table_rules=[TableRule("functional", "a")])
    with pytest.raises(ValueError, match="determines"):
        run_table_rules(fd_ds, prof, key="k")


# -------------------------------------------------------- null-rate bound
def test_null_rate_rule(ray_session):
    import ray.data

    from rayval.stages.rules import null_rate_violations

    t = pa.table(
        {
            "partition_id": pa.array([0] * 10 + [1] * 10 + [2] * 4, type=pa.int64()),
            "k": pa.array([f"r{i}" for i in range(24)]),
            "v": pa.array(
                [1.0] * 10                      # p0: 0% null
                + [None] * 3 + [2.0] * 7        # p1: 30% null
                + [None, None, 1.0, 1.0],       # p2: 50% null
                type=pa.float64(),
            ),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    out = null_rate_violations(ds, "v", key="k", max_null_e6=250_000)
    assert out["partition_id"].to_pylist() == [1, 2]
    assert out["k"].to_pylist() == ["1", "2"]
    assert set(out["constraint_id"].to_pylist()) == {"v.null_rate"}
    # boundary is EXCLUSIVE (integer cross-multiplication, no float division):
    # exactly 30% null vs max 300000 ppm does NOT violate
    out2 = null_rate_violations(ds, "v", key="k", max_null_e6=300_000)
    assert out2["partition_id"].to_pylist() == [2]


def test_null_rate_rule_via_dispatcher_and_validation(ray_session):
    import ray.data

    t = pa.table(
        {
            "partition_id": pa.array([0, 0, 1, 1], type=pa.int64()),
            "k": pa.array(["a", "b", "c", "d"]),
            "v": pa.array([1.0, None, 1.0, 1.0], type=pa.float64()),
        }
    )
    ds = ray.data.from_arrow(t)
    prof = Profile(
        "nr", [], key="k",
        table_rules=[TableRule("null_rate", "v", {"max_null_e6": 100_000})],
    )
    out = run_table_rules(ds, prof, key="k")
    assert out["partition_id"].to_pylist() == [0]
    bad = Profile("nr", [], key="k", table_rules=[TableRule("null_rate", "v")])
    with pytest.raises(ValueError, match="max_null_e6"):
        run_table_rules(ds, bad, key="k")


def test_null_rate_rule_no_partition_col(ray_session):
    import ray.data

    from rayval.stages.rules import null_rate_violations

    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(["a", "b"]), "v": pa.array([None, 1.0], type=pa.float64())})
    )
    out = null_rate_violations(ds, "v", key="k", max_null_e6=100_000)
    assert out["partition_id"].to_pylist() == [-1]


# ------------------------------------------------- composite-key uniqueness
def test_unique_together_members_and_encoding(ray_session):
    import ray.data

    from rayval.stages.rules import unique_together_violations

    # (1,'x') duplicated; (1,'y') and (2,'x') singletons; the injective
    # encoding must NOT conflate ("ab","c") with ("a","bc"), nor a null
    # component with the string "None"
    t = pa.table(
        {
            "k": pa.array([f"r{i}" for i in range(8)]),
            "a": pa.array(["1", "1", "1", "2", "ab", "a", "None", None]),
            "b": pa.array(["x", "x", "y", "x", "c", "bc", "q", "q"]),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    out = unique_together_violations(ds, ["a", "b"], key="k")
    assert sorted(out["k"].to_pylist()) == ["r0", "r1"]
    assert set(out["constraint_id"].to_pylist()) == {"a+b.unique_together"}


def test_unique_together_nulls_group_together(ray_session):
    import ray.data

    from rayval.stages.rules import unique_together_violations

    t = pa.table(
        {
            "k": pa.array(["x", "y", "z"]),
            "a": pa.array([None, None, "v"]),
            "b": pa.array([7, 7, 7], type=pa.int64()),
        }
    )
    out = unique_together_violations(ray.data.from_arrow(t), ["a", "b"], key="k")
    # SQL GROUP BY semantics: the two (NULL, 7) rows form one duplicate group
    assert sorted(out["k"].to_pylist()) == ["x", "y"]


def test_unique_together_dispatcher_and_semijoin(ray_session):
    import ray.data

    from rayval.stages.rules import unique_together_violations

    t = pa.table(
        {
            "k": pa.array([f"r{i}" for i in range(6)]),
            "a": pa.array([1, 1, 2, 2, 3, 3], type=pa.int64()),
            "b": pa.array([1, 1, 2, 9, 3, 3], type=pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(2)
    prof = Profile(
        "ut", [], key="k",
        table_rules=[TableRule("unique_together", "a", {"with": ["b"]})],
    )
    out = run_table_rules(ds, prof, key="k")
    assert sorted(out["k"].to_pylist()) == ["r0", "r1", "r4", "r5"]
    semi = unique_together_violations(ds, ["a", "b"], key="k", hot_threshold=0, n_buckets=4)
    assert sorted(semi["k"].to_pylist()) == ["r0", "r1", "r4", "r5"]
    bad = Profile("ut", [], key="k", table_rules=[TableRule("unique_together", "a")])
    with pytest.raises(ValueError, match="with"):
        run_table_rules(ds, bad, key="k")
    with pytest.raises(ValueError, match="two columns"):
        unique_together_violations(ds, ["a"], key="k")


# --------------------------------------------------------- row-count bounds
def test_row_count_rule(ray_session):
    import ray.data

    from rayval.stages.rules import row_count_violations

    t = pa.table(
        {
            "partition_id": pa.array([0] * 5 + [1] * 2 + [2] * 9, type=pa.int64()),
            "k": pa.array([f"r{i}" for i in range(16)]),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    out = row_count_violations(ds, key="k", min_rows=3, max_rows=8)
    assert out["partition_id"].to_pylist() == [1, 2]
    assert out["k"].to_pylist() == ["1", "2"]
    # bounds are INCLUSIVE
    assert row_count_violations(ds, key="k", min_rows=2, max_rows=9).num_rows == 0
    only_min = row_count_violations(ds, key="k", min_rows=3)
    assert only_min["partition_id"].to_pylist() == [1]
    with pytest.raises(ValueError, match="min_rows and/or max_rows"):
        row_count_violations(ds, key="k")


def test_row_count_rule_via_dispatcher_no_partition_col(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({"k": pa.array(["a", "b", "c"])}))
    prof = Profile(
        "vol", [], key="k",
        table_rules=[TableRule("row_count", "table", {"min_rows": 5})],
    )
    out = run_table_rules(ds, prof, key="k")
    assert out["partition_id"].to_pylist() == [-1]
    assert set(out["constraint_id"].to_pylist()) == {"table.row_count"}
