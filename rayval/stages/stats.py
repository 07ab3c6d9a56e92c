"""Per-partition column statistics + sketch partials, and the drift check.

The aggregation shape follows the guide's partial+final pattern: each
map_batches task emits ONE small row of serialized sketch partials per
(partition_id) per batch; the partials are merged per partition, then
globally — sketches (HLL/KLL) are mergeable by design, so the merge tree's
shape doesn't affect the result.  This is the engine's version of the
north_star's "per-partition column statistics ... computed in a streaming
pass, then merged via groupby-aggregate".

Stats per numeric column: count / null_count / min / max + KLL quantile
sketch.  Per key column: HLL uniqueness sketch.  Drift = KS distance between
a partition's (or the global) KLL and a reference profile's, compared to a
threshold (north_star: "distribution-drift detection against a reference
profile").
"""

from __future__ import annotations

import pickle
from typing import Iterable, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rayval.constraints.profile import PARTITION_COL
from rayval.state import HLL, KLL, ks_distance

NUMERIC_COLS = ["w", "h", "caption_len", "brightness", "contrast", "sharpness"]
UNIQUE_COLS = ["image_id", "phash"]


class ColumnStats:
    """Mergeable per-partition stats bundle (picklable → checkpointable)."""

    def __init__(self, numeric_cols: Iterable[str] = NUMERIC_COLS, unique_cols: Iterable[str] = UNIQUE_COLS):
        self.count = 0
        self.numeric: dict[str, dict] = {
            c: {"null": 0, "min": np.inf, "max": -np.inf, "kll": KLL()} for c in numeric_cols
        }
        self.unique: dict[str, HLL] = {c: HLL() for c in unique_cols}

    def update(self, batch: pa.Table) -> "ColumnStats":
        self.count += batch.num_rows
        for c, st in self.numeric.items():
            if c not in batch.column_names:
                continue
            col = batch[c]
            st["null"] += col.null_count
            vals = col.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
            vals = vals[~np.isnan(vals)]
            if vals.size:
                st["min"] = min(st["min"], float(vals.min()))
                st["max"] = max(st["max"], float(vals.max()))
                st["kll"].add(vals)
        for c, h in self.unique.items():
            if c in batch.column_names:
                col = batch[c]
                if col.null_count:
                    col = col.drop_null()
                h.add(col)
        return self

    def merge(self, other: "ColumnStats") -> "ColumnStats":
        self.count += other.count
        for c, st in other.numeric.items():
            mine = self.numeric.setdefault(c, {"null": 0, "min": np.inf, "max": -np.inf, "kll": KLL()})
            mine["null"] += st["null"]
            mine["min"] = min(mine["min"], st["min"])
            mine["max"] = max(mine["max"], st["max"])
            mine["kll"].merge(st["kll"])
        for c, h in other.unique.items():
            self.unique.setdefault(c, HLL()).merge(h)
        return self

    def to_bytes(self) -> bytes:
        # version-stamped (magic + hash-scheme version): the HLL inside hashes
        # strings, so a partial persisted under a different hash64 scheme must
        # refuse to merge on resume instead of silently under-counting
        from rayval.state import HASH_SCHEME_VERSION

        return b"RVST" + bytes([HASH_SCHEME_VERSION]) + pickle.dumps(self)

    @classmethod
    def from_bytes(cls, b: bytes) -> "ColumnStats":
        from rayval.state import HASH_SCHEME_VERSION

        if len(b) < 5 or b[:4] != b"RVST":
            raise ValueError(
                "not a version-stamped ColumnStats blob (pre-versioning "
                "checkpoint) — recompute the partial instead of merging it"
            )
        if b[4] != HASH_SCHEME_VERSION:
            raise ValueError(
                f"ColumnStats blob built under hash scheme v{b[4]}, engine is "
                f"v{HASH_SCHEME_VERSION}: uniqueness sketches would merge "
                "inconsistently — recompute the partial"
            )
        return pickle.loads(b[5:])

    def row(self, partition_id: int) -> dict:
        """Flattened stats row for the partition_stats output table."""
        out: dict = {"partition_id": partition_id, "count": self.count}
        for c, st in self.numeric.items():
            q = st["kll"].quantiles([0.25, 0.5, 0.75])
            out[f"{c}_null"] = st["null"]
            out[f"{c}_min"] = None if np.isinf(st["min"]) else st["min"]
            out[f"{c}_max"] = None if np.isinf(st["max"]) else st["max"]
            out[f"{c}_p25"], out[f"{c}_p50"], out[f"{c}_p75"] = q
        for c, h in self.unique.items():
            out[f"{c}_distinct"] = round(h.estimate())
        return out


def sketch_partials(batch: pa.Table) -> pa.Table:
    """map_batches fn: one (partition_id, pickled ColumnStats) row per
    partition present in the batch — the partial half of partial+final."""
    part = batch[PARTITION_COL].to_numpy(zero_copy_only=False)
    pids, blobs = [], []
    for pid in np.unique(part):
        sel = batch.filter(pa.array(part == pid))
        pids.append(int(pid))
        blobs.append(ColumnStats().update(sel).to_bytes())
    return pa.table({PARTITION_COL: pa.array(pids, type=pa.int64()), "stats": pa.array(blobs, type=pa.binary())})


def merge_partials(partials: pa.Table) -> dict[int, ColumnStats]:
    """Final merge (small: one row per partition per batch)."""
    out: dict[int, ColumnStats] = {}
    for pid, blob in zip(partials[PARTITION_COL].to_pylist(), partials["stats"].to_pylist()):
        st = ColumnStats.from_bytes(blob)
        if pid in out:
            out[pid].merge(st)
        else:
            out[pid] = st
    return out


def global_stats(per_partition: dict[int, ColumnStats]) -> Optional[ColumnStats]:
    it = iter(per_partition.values())
    first = next(it, None)
    if first is None:
        return None
    total = ColumnStats.from_bytes(first.to_bytes())  # deep copy
    for st in it:
        total.merge(st)
    return total


def drift_violations(
    per_partition: dict[int, ColumnStats],
    reference: ColumnStats,
    threshold: float = 0.15,
    columns: Iterable[str] = NUMERIC_COLS,
) -> list[tuple[int, Optional[str], str]]:
    """(partition_id, None, 'stats.drift.<col>') for drifted partitions.

    The effective threshold per (partition, column) is
    ``max(threshold, c(α) * sqrt((n1+n2)/(n1*n2)))`` — the two-sample
    Kolmogorov–Smirnov critical value with c=1.95, i.e. α≈0.001 (many
    partition×column tests run per job, so the per-test false-positive rate
    is kept tight) — so small partitions aren't flagged on sampling noise
    while large ones still catch subtle shifts.
    """
    out = []
    for pid, st in sorted(per_partition.items()):
        for c in columns:
            if c in st.numeric and c in reference.numeric:
                a, b = st.numeric[c]["kll"], reference.numeric[c]["kll"]
                if a.n == 0 or b.n == 0:
                    continue
                # KS α≈0.001 — many (partition × column) tests run per job, so
                # the per-test false-positive rate must be tight
                crit = 1.95 * np.sqrt((a.n + b.n) / (a.n * b.n))
                d = ks_distance(a, b)
                if d == d and d > max(threshold, crit):  # NaN-safe
                    out.append((pid, None, f"stats.drift.{c}"))
    return out


def grouped_quantiles_sketch(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    qs: Sequence[float] = (0.25, 0.5, 0.75),
    k: int = 200,
    sketch: str = "kll",
) -> "ray.data.Dataset":
    """Approximate per-group quantiles via mergeable KLL partials — the
    10^12-row shape for grouped percentiles: each batch emits ONE (group,
    sketch blob) row per group it touches, so the ``groupby(group)`` exchange
    carries num_batches-bounded blob rows, never the data rows.  Contrast
    with the exact in-group sort (queries.q_acctbal_median): that co-locates
    every row of a group on one reducer; this co-locates only its partials,
    so a group of any size costs O(num_batches × sketch_size).

    Determinism: KLL compaction is merge-order-sensitive, so each group's
    partials are merged in sorted-blob order (same device as sketch_stats) —
    identical input BLOCKS give identical estimates.  A different block
    structure (another cluster width / target block size) yields different
    — equally valid — estimates within the rank-error envelope, because the
    per-batch partials themselves change; only grouped_distinct_sketch's
    HLL is fully split-invariant (register max).

    Output: one row per group — (group_col, n, q_<pct> float64 per q).
    Estimates carry rank error (not value error); gate against the exact
    quantile in tests, don't diff it against SQL.

    Null semantics: null VALUES are excluded (``n`` counts non-null values,
    SQL-aggregate style), so a group whose values are ALL null emits no row;
    null GROUP KEYS form their own group (kept, like the engine's other
    grouped operators).

    ``sketch``: "kll" (default; uniform rank resolution) or "tdigest"
    (state/tdigest.py; k1 scale — resolution concentrates at the tails, the
    p99.9-style choice; ``k`` is its compression δ).  Both are mergeable and
    deterministic under the sorted-blob merge below."""
    import ray.data  # noqa: F401  (type only)

    if sketch == "kll":
        make, load = (lambda: KLL(k=k)), KLL.from_bytes
    elif sketch == "tdigest":
        from rayval.state import TDigest

        make, load = (lambda: TDigest(delta=k)), TDigest.from_bytes
    else:
        raise ValueError(f"unknown sketch {sketch!r} (kll | tdigest)")
    q_list = [float(q) for q in qs]
    # '%g' keeps sub-percent quantiles distinct (0.999 -> 'q_99_9'); the old
    # int(round(q*100)) collapsed 0.995 and 0.999 onto one column name and
    # silently dropped an estimate
    q_names = ["q_" + ("%g" % (q * 100)).replace(".", "_").replace("-", "m") for q in q_list]
    if len(set(q_names)) != len(q_names):
        raise ValueError(f"duplicate quantiles in qs={qs}")
    g_type = ds.schema().base_schema.field(group_col).type

    def partial(batch: pa.Table) -> pa.Table:
        from rayval.util import group_codes, sorted_runs

        t = batch.filter(batch[value_col].is_valid())
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], g_type), "kll": pa.array([], pa.binary())})
        codes, dict_vals = group_codes(t[group_col])
        vals = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(codes, kind="stable")
        vals_s = vals[order]
        ids, bounds = sorted_runs(codes[order])
        keys, blobs = [], []
        for gi, a, b in zip(ids, bounds[:-1], bounds[1:]):
            keys.append(None if gi < 0 else dict_vals[int(gi)].as_py())
            blobs.append(make().add(vals_s[a:b]).to_bytes())
        return pa.table({group_col: pa.array(keys, type=g_type), "kll": pa.array(blobs, type=pa.binary())})

    def merge_group(group: pa.Table) -> pa.Table:
        blobs = sorted(b.as_py() for b in group["kll"])
        sk = load(blobs[0])
        for b in blobs[1:]:
            sk = sk.merge(load(b))
        est = sk.quantiles(q_list)
        cols = {group_col: group[group_col].slice(0, 1),
                "n": pa.array([sk.n], type=pa.int64())}
        for name, v in zip(q_names, est):
            cols[name] = pa.array([float(v)], type=pa.float64())
        return pa.table(cols)

    return (
        ds.select_columns([group_col, value_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .map_groups(merge_group, batch_format="pyarrow")
    )


def grouped_distinct_sketch(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    p: int = 12,
) -> "ray.data.Dataset":
    """Approximate per-group distinct counts via mergeable HLL partials —
    the grouped-uniqueness analog of :func:`grouped_quantiles_sketch` and the
    10^12-row shape for "distinct X per group": each batch emits ONE (group,
    HLL blob) row per group it touches, so the ``groupby(group)`` exchange
    carries num_batches-bounded fixed-size blobs (2^p registers), never the
    value rows — contrast with an exact ``groupby(group).unique(value)``,
    which co-locates every distinct value of a group on one reducer.

    HLL merges are order-insensitive (register-wise max), so no merge-order
    pinning is needed.  Output: (group_col, n_rows, distinct_est int64);
    estimates carry ~1.04/sqrt(2^p) relative error — gate against the exact
    count in tests, don't diff against SQL.

    Null semantics: null VALUES are excluded — ``n_rows`` counts the group's
    NON-NULL values (matching SQL COUNT(col)), and a group whose values are
    all null emits no row; null group keys form their own group."""
    g_type = ds.schema().base_schema.field(group_col).type

    def partial(batch: pa.Table) -> pa.Table:
        from rayval.util import group_codes, sorted_runs

        t = batch.filter(batch[value_col].is_valid())
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], g_type), "n": pa.array([], pa.int64()),
                             "hll": pa.array([], pa.binary())})
        codes, dict_vals = group_codes(t[group_col])
        order = np.argsort(codes, kind="stable")
        t = t.take(pa.array(order))
        ids, bounds = sorted_runs(codes[order])
        keys, ns, blobs = [], [], []
        for gi, a, b in zip(ids, bounds[:-1], bounds[1:]):
            keys.append(None if gi < 0 else dict_vals[int(gi)].as_py())
            ns.append(int(b - a))
            blobs.append(HLL(p=p).add(t[value_col].slice(a, b - a)).to_bytes())
        return pa.table({group_col: pa.array(keys, type=g_type),
                         "n": pa.array(ns, type=pa.int64()),
                         "hll": pa.array(blobs, type=pa.binary())})

    def merge_group(group: pa.Table) -> pa.Table:
        h = HLL.from_bytes(group["hll"][0].as_py())
        for b in group["hll"].to_pylist()[1:]:
            h.merge(HLL.from_bytes(b))
        return pa.table({group_col: group[group_col].slice(0, 1),
                         "n_rows": pa.array([int(pc.sum(group["n"]).as_py())], type=pa.int64()),
                         "distinct_est": pa.array([int(round(h.estimate()))], type=pa.int64())})

    return (
        ds.select_columns([group_col, value_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .map_groups(merge_group, batch_format="pyarrow")
    )


def grouped_histogram(
    ds,
    by: str,
    col: str,
    width: int,
    nbins: int,
    lo: int = 0,
    bin_col: str = "bin",
    n_col: str = "n",
):
    """EXACT fixed-bin histogram of integer ``col`` per ``by`` group — the
    deterministic complement of the KLL/t-digest drift sketches (stats above
    estimate quantiles; a profile check that pins exact bin counts wants
    this).  bin = clip((col - lo) // width, 0, nbins-1), pure integer
    arithmetic.

    Floor-vs-truncate parity note: numpy ``//`` floors while DuckDB ``//``
    truncates toward zero — they differ only on NEGATIVE quotients, and
    every negative quotient clips to bin 0 under BOTH semantics, so the
    clipped bin is oracle-exact for any input sign.

    Scale shape: per-batch Arrow partial count on (by, bin) — at most
    n_groups x nbins rows leave each batch — then a tiny global groupby;
    output cardinality is n_groups x nbins regardless of input size.  Null
    ``col`` rows are dropped (no bin; SQL oracles filter identically); null
    ``by`` keys are kept as their own group, crossing the Ray exchange as
    (filled value, null flag) pairs exactly like hopping_window_agg."""
    from rayval.stages.bucketed import pack_null_key, restore_null_key

    if width <= 0 or nbins <= 0:
        raise ValueError("width and nbins must be positive")
    by_t = ds.schema().base_schema.field(by).type

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"_byf": pa.array([], by_t), "_byn": pa.array([], pa.bool_()),
             bin_col: pa.array([], pa.int64()), "_one": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        batch = batch.filter(batch[col].is_valid())
        if batch.num_rows == 0:
            return empty
        v = batch[col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        bins = np.clip((v - lo) // width, 0, nbins - 1)
        t = pa.table(
            {by: batch[by], bin_col: pa.array(bins),
             "_one": pa.array(np.ones(batch.num_rows, dtype=np.int64))}
        )
        part = t.group_by([by, bin_col]).aggregate([("_one", "sum")]).combine_chunks()
        byf, byn = pack_null_key(part[by], by_t)
        return pa.table(
            {
                "_byf": byf,
                "_byn": byn,
                bin_col: part[bin_col],
                "_one": part["_one_sum"],
            }
        )

    def restore(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                by: restore_null_key(batch["_byf"], batch["_byn"], by_t),
                bin_col: batch[bin_col],
                n_col: batch[n_col],
            }
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["_byf", "_byn", bin_col])
        .aggregate(Sum("_one", alias_name=n_col))
        .map_batches(restore, batch_format="pyarrow", zero_copy_batch=True)
    )


def heavy_hitters(
    ds,
    col: str,
    k: int = 64,
    merge_batch: int = 1024,
) -> pa.Table:
    """Approximate top-frequency keys of ``col`` via mergeable Misra-Gries
    partials — the "WHICH keys are hot" member of the sketch family (HLL
    answers how many distinct, KLL/t-digest how distributed).  Its output is
    exactly what the skew defenses consume: feed the result to
    ``join.bucket_join(hot_keys=...)`` / salted groupbys instead of guessing
    hot keys, without ever running the exact (all-to-all) groupby.

    Scale shape: ONE map-only pass.  Each batch collapses to (value, count)
    pairs with a vectorized ``pc.value_counts`` and folds them into a
    k-bounded summary (cost scales with distinct-per-batch, never rows); one
    fixed-size blob per batch flows into a ``merge_batch``-way intermediate
    merge stage, so the driver's final merge sees ceil(n_blocks/merge_batch)
    blobs of <= k counters each — no shuffle anywhere, nothing proportional
    to input rows leaves a task.

    Guarantees (see :class:`rayval.state.heavyhitters.MisraGries`): every key
    with true frequency > n/(k+1) is present; for each returned key
    ``est_count <= true <= est_count + err_bound``; when the column's total
    distinct-key count is <= k, ``err_bound`` is 0 and every count is EXACT
    (the SQL-oracle regime used by the ``heavy_hitters_lang`` driver query).

    Output: (value, est_count, err_bound) sorted by (-est_count, value);
    null values are excluded (SQL COUNT(col) semantics)."""
    from rayval.state.heavyhitters import MisraGries

    v_type = ds.schema().base_schema.field(col).type

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch[col].is_valid())
        mg = MisraGries(k)
        if t.num_rows:
            vc = pc.value_counts(t[col].combine_chunks())
            mg.update_weighted(
                vc.field("values").to_pylist(), vc.field("counts").to_numpy()
            )
        return pa.table({"mg": pa.array([mg.to_bytes()], type=pa.binary())})

    def merge_stage(batch: pa.Table) -> pa.Table:
        mg = MisraGries(k)
        for b in batch["mg"].to_pylist():
            mg.merge(MisraGries.from_bytes(b))
        return pa.table({"mg": pa.array([mg.to_bytes()], type=pa.binary())})

    rows = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(merge_stage, batch_format="pyarrow", batch_size=merge_batch)
        .take_all()
    )
    final = MisraGries(k)
    for r in rows:
        final.merge(MisraGries.from_bytes(r["mg"]))
    items = final.items()
    return pa.table(
        {
            "value": pa.array([key for key, _ in items], type=v_type),
            "est_count": pa.array([int(c) for _, c in items], type=pa.int64()),
            "err_bound": pa.array(
                [final.error_bound()] * len(items), type=pa.int64()
            ),
        }
    )


def grouped_distinct_exact(
    ds,
    group_col: str,
    value_col: str,
) -> "ray.data.Dataset":
    """EXACT per-group distinct counts — the deterministic complement of
    :func:`grouped_distinct_sketch` for profile checks that pin exact
    uniqueness (SQL ``COUNT(col), COUNT(DISTINCT col) GROUP BY group``).

    Scale shape (the classic two-stage distinct): each batch collapses to
    its LOCAL (group, value, n) triples with one vectorized Arrow group_by,
    so the only wide exchange is keyed by (group, value) — spread across
    reducers by value, never co-locating a whole group the way
    ``groupby(group).unique(value)`` would.  After that exchange every
    (group, value) pair exists exactly once, which makes the per-group
    distinct count DISTRIBUTIVE: a second map-only partial (rows-per-group,
    pairs-per-group) feeds a tiny groupby(group) sum.  Nothing proportional
    to input rows crosses the second exchange.

    Null semantics match SQL: null VALUES are excluded (``n_rows`` counts
    non-null values; an all-null group emits no row); null GROUP keys form
    their own group, crossing both exchanges as (filled, flag) pairs."""
    from ray.data.aggregate import Sum

    from rayval.stages.bucketed import pack_null_key, restore_null_key

    g_type = ds.schema().base_schema.field(group_col).type

    def pair_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"_gf": pa.array([], g_type), "_gn": pa.array([], pa.bool_()),
             value_col: batch[value_col].slice(0, 0),
             "_n": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        t = batch.filter(batch[value_col].is_valid())
        if t.num_rows == 0:
            return empty
        part = t.group_by([group_col, value_col]).aggregate([([], "count_all")]).combine_chunks()
        gf, gn = pack_null_key(part[group_col], g_type)
        return pa.table(
            {"_gf": gf, "_gn": gn, value_col: part[value_col],
             "_n": part["count_all"].cast(pa.int64())}
        )

    def count_partial(batch: pa.Table) -> pa.Table:
        # post-exchange: each (group, value) pair occurs exactly once
        # globally, so per-batch pair counts sum to the exact distinct count
        if batch.num_rows == 0:
            return pa.table(
                {"_gf": pa.array([], g_type), "_gn": pa.array([], pa.bool_()),
                 "_rows": pa.array([], pa.int64()), "_distinct": pa.array([], pa.int64())}
            )
        part = (
            pa.table({"_gf": batch["_gf"], "_gn": batch["_gn"], "_n": batch["_n"]})
            .group_by(["_gf", "_gn"])
            .aggregate([("_n", "sum"), ([], "count_all")])
            .combine_chunks()
        )
        return pa.table(
            {"_gf": part["_gf"], "_gn": part["_gn"],
             "_rows": part["_n_sum"], "_distinct": part["count_all"].cast(pa.int64())}
        )

    def restore(batch: pa.Table) -> pa.Table:
        return pa.table(
            {group_col: restore_null_key(batch["_gf"], batch["_gn"], g_type),
             "n_rows": batch["n_rows"], "n_distinct": batch["n_distinct"]}
        )

    return (
        ds.select_columns([group_col, value_col])
        .map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["_gf", "_gn", value_col])
        .aggregate(Sum("_n", alias_name="_n"))
        .map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["_gf", "_gn"])
        .aggregate(Sum("_rows", alias_name="n_rows"), Sum("_distinct", alias_name="n_distinct"))
        .map_batches(restore, batch_format="pyarrow", zero_copy_batch=True)
    )


def grouped_rollup(
    ds,
    key_a: str,
    key_b: str,
    value_col: str,
) -> "ray.data.Dataset":
    """Two-level ROLLUP aggregate — SQL ``GROUP BY ROLLUP(a, b)`` over an
    integer-valued measure: one row per (a, b) plus per-a subtotals (b null)
    plus a grand total (both null), columns (a, b, sum_val, n_rows).

    Scale shape: the DATA is touched exactly once — a per-batch Arrow
    partial sum on (a, b) followed by one groupby exchange at the finest
    level, whose output cardinality is |a|x|b| regardless of input size.
    The coarser levels re-aggregate that tiny fine-level table (map-only
    partial + groupby(a), then a driver-free global sum via one more
    single-key groupby on a constant), so no second pass over the input and
    no driver-side loop.  Matches DuckDB ROLLUP exactly when a and b are
    non-null (the fixtures' regime); genuinely-null keys would be
    indistinguishable from subtotal markers, so they are rejected loudly.

    ``value_col`` is cast to int64 (callers pass integer-valued measures,
    e.g. cents) so every sum is exact under any merge order — float sums
    would be order-dependent and break oracle hashing."""
    from ray.data.aggregate import Sum

    sch = ds.schema().base_schema
    a_t, b_t = sch.field(key_a).type, sch.field(key_b).type

    def fine_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {key_a: pa.array([], a_t), key_b: pa.array([], b_t),
                 "_s": pa.array([], pa.int64()), "_n": pa.array([], pa.int64())}
            )
        if batch[key_a].null_count or batch[key_b].null_count:
            raise ValueError(
                "grouped_rollup: null group keys are indistinguishable from "
                "ROLLUP subtotal markers; pre-fill them upstream"
            )
        t = pa.table(
            {key_a: batch[key_a], key_b: batch[key_b],
             "_v": pc.round(batch[value_col]).cast(pa.int64())}
        )
        part = t.group_by([key_a, key_b]).aggregate([("_v", "sum"), ([], "count_all")])
        part = part.combine_chunks()
        return pa.table(
            {key_a: part[key_a], key_b: part[key_b],
             "_s": part["_v_sum"], "_n": part["count_all"].cast(pa.int64())}
        )

    # materialize the FINE table before fanning out: it is provably tiny
    # (|a| x |b| rows) and feeds three union branches — without pinning it,
    # each branch re-executes the whole upstream read+partial+groupby, i.e.
    # three input scans instead of the one pass this operator promises
    fine = (
        ds.select_columns([key_a, key_b, value_col])
        .map_batches(fine_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key_a, key_b])
        .aggregate(Sum("_s", alias_name="sum_val"), Sum("_n", alias_name="n_rows"))
        .materialize()
    )

    def widen(batch: pa.Table) -> pa.Table:
        return pa.table(
            {key_a: batch[key_a], key_b: batch[key_b],
             "sum_val": batch["sum_val"], "n_rows": batch["n_rows"]}
        )

    def sub_partial(batch: pa.Table) -> pa.Table:
        part = (
            pa.table({key_a: batch[key_a], "_s": batch["sum_val"], "_n": batch["n_rows"]})
            .group_by([key_a]).aggregate([("_s", "sum"), ("_n", "sum")]).combine_chunks()
        )
        return pa.table(
            {key_a: part[key_a], "sum_val": part["_s_sum"], "n_rows": part["_n_sum"]}
        )

    def grand_partial(batch: pa.Table) -> pa.Table:
        s = int(pc.sum(batch["sum_val"]).as_py() or 0)
        n = int(pc.sum(batch["n_rows"]).as_py() or 0)
        return pa.table(
            {"_k": pa.array([0], pa.int64()),
             "sum_val": pa.array([s], pa.int64()), "n_rows": pa.array([n], pa.int64())}
        )

    def grand_restore(batch: pa.Table) -> pa.Table:
        return pa.table(
            {key_a: pa.nulls(batch.num_rows, a_t), key_b: pa.nulls(batch.num_rows, b_t),
             "sum_val": batch["sum_val"], "n_rows": batch["n_rows"]}
        )

    subtotals = (
        fine.map_batches(sub_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_a)
        .aggregate(Sum("sum_val", alias_name="sum_val"), Sum("n_rows", alias_name="n_rows"))
    )
    grand = (
        fine.map_batches(grand_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_k")
        .aggregate(Sum("sum_val", alias_name="sum_val"), Sum("n_rows", alias_name="n_rows"))
        .map_batches(grand_restore, batch_format="pyarrow", zero_copy_batch=True)
    )

    def sub_widen(batch: pa.Table) -> pa.Table:
        return pa.table(
            {key_a: batch[key_a], key_b: pa.nulls(batch.num_rows, b_t),
             "sum_val": batch["sum_val"], "n_rows": batch["n_rows"]}
        )

    return (
        fine.map_batches(widen, batch_format="pyarrow", zero_copy_batch=True)
        .union(subtotals.map_batches(sub_widen, batch_format="pyarrow", zero_copy_batch=True))
        .union(grand)
    )


def grouped_zscore(
    ds,
    group_col: str,
    value_col: str,
    out_cols: Sequence[str],
    z_col: str = "z_e6",
) -> "ray.data.Dataset":
    """Per-row z-score standardization against the row's GROUP (population
    std) — the feature-normalization stage of a training pipeline, emitted as
    e6 fixed point so the DuckDB oracle hashes bit-exact.

    Two-pass broadcast shape (the small-side-aggregate pattern): pass 1 is a
    per-batch Arrow partial of exact integer (n, sum, sum-of-squares) per
    group — the partial table is batches x groups rows, so materializing it
    on the driver is the same bounded device as heavy_hitters' blob merge —
    merged with PYTHON INTS (no int64 overflow at any scale) and broadcast
    as a tiny per-group stats map into the pass-2 map; pass 2 is map-only.
    Nothing proportional to input rows ever shuffles.

    EXACTNESS: ``value_col`` must be integer-valued with |v| < 2^20 (checked
    per batch) so every per-batch partial fits int64; the global merge uses
    arbitrary-precision ints.  Both sides then compute the IDENTICAL IEEE
    sequence  floor(double(n*v - s) * 1e6 / sqrt(double(n*q - s*s)))  from
    identical exact integers, so the floored fixed-point z matches the SQL
    oracle bit-for-bit (casts, *, /, sqrt are each correctly rounded).
    Constant groups (variance 0) and null values emit null z.  Null group
    keys form their own group (matching SQL PARTITION BY)."""
    part_ds = ds.select_columns([group_col, value_col])
    g_type = part_ds.schema().base_schema.field(group_col).type

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {group_col: pa.array([], g_type), "_n": pa.array([], pa.int64()),
             "_s": pa.array([], pa.int64()), "_q": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        t = batch.filter(batch[value_col].is_valid())
        if t.num_rows == 0:
            return empty
        v = pc.round(t[value_col]).cast(pa.int64())
        mx = pc.max(pc.abs(v)).as_py()
        if mx is not None and mx >= 1 << 20:
            raise ValueError(
                f"grouped_zscore: |{value_col}| must be < 2^20 for exact "
                f"int64 partials (got {mx}); rescale upstream"
            )
        t = pa.table({group_col: t[group_col], "_v": v, "_v2": pc.multiply(v, v)})
        part = t.group_by([group_col]).aggregate(
            [("_v", "sum"), ("_v2", "sum"), ([], "count_all")]
        ).combine_chunks()
        return pa.table(
            {group_col: part[group_col], "_n": part["count_all"].cast(pa.int64()),
             "_s": part["_v_sum"], "_q": part["_v2_sum"]}
        )

    # driver merge of the bounded partial table with python ints — exact at
    # any cardinality (n*q - s*s overflows int64 at ~10^9 rows/group)
    parts = part_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).take_all()
    stats: dict = {}
    for r in parts:
        g = r[group_col]
        n0, s0, q0 = stats.get(g, (0, 0, 0))
        stats[g] = (n0 + int(r["_n"]), s0 + int(r["_s"]), q0 + int(r["_q"]))
    # the NULL group's stats ride the fallback slot: pc.index_in returns
    # null for null keys, so without this a null group-key row would get a
    # null z instead of its partition's z (SQL PARTITION BY groups nulls)
    null_stats = stats.pop(None, None)
    groups = list(stats)
    fallback = null_stats if null_stats is not None else (0, 0, 0)
    n_arr = np.array([stats[g][0] for g in groups] + [fallback[0]], dtype=np.int64)
    s_arr = np.array([stats[g][1] for g in groups] + [fallback[1]], dtype=np.int64)
    den_arr = np.array(
        [float(n * q - s * s) for (n, s, q) in
         [stats[g] for g in groups] + [fallback]], dtype=np.float64
    )
    den_arr = np.sqrt(den_arr)
    g_keys = pa.array(groups, type=g_type)

    def zmap(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in out_cols}
        if batch.num_rows == 0:
            cols[z_col] = pa.array([], pa.int64())
            return pa.table(cols)
        codes = pc.index_in(batch[group_col], g_keys)
        code_np = pc.fill_null(codes, len(groups)).to_numpy(zero_copy_only=False).astype(np.int64)
        is_null_g = batch[group_col].is_null().to_numpy(zero_copy_only=False)
        valid_code = (code_np < len(groups)) | (is_null_g & (null_stats is not None))
        code_safe = np.where(valid_code, code_np, 0)
        v_valid = batch[value_col].is_valid().to_numpy(zero_copy_only=False)
        v = pc.round(pc.fill_null(batch[value_col], 0)).cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = n_arr[code_safe]
        s = s_arr[code_safe]
        den = den_arr[code_safe]
        ok = valid_code & v_valid & (den > 0.0)
        num = (n * v - s).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.floor(num * 1e6 / den)
        z_int = np.where(ok, z, 0.0).astype(np.int64)
        cols[z_col] = pa.array(z_int, mask=~ok)
        return pa.table(cols)

    return ds.map_batches(zmap, batch_format="pyarrow", zero_copy_batch=True)


def grouped_topk_values(
    ds,
    group_col: str,
    value_col: str,
    k: int,
    n_col: str = "n",
) -> "ray.data.Dataset":
    """Top-``k`` most-frequent VALUES per group with exact counts — the
    "what dominates each stratum" aggregate (per-language top sources,
    per-shard top mime-types), a pure composition of two machines this
    engine already proves: the (group, value)-keyed pair exchange of
    :func:`grouped_distinct_exact` (per-batch Arrow partial counts; the only
    wide shuffle is spread across reducers by value) and the
    combiner-bounded windowed rank of ``topn.topn_per_group`` (ties broken
    by value ascending = SQL ROW_NUMBER ... ORDER BY n DESC, value).

    Null values are excluded (COUNT(col) semantics); null group keys form
    their own group.  Output: (group_col, n_col, value_col) x <=k per group."""
    from ray.data.aggregate import Sum

    from rayval.stages.bucketed import pack_null_key, restore_null_key
    from rayval.stages.topn import topn_per_group

    g_type = ds.schema().base_schema.field(group_col).type

    def pair_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"_gf": pa.array([], g_type), "_gn": pa.array([], pa.bool_()),
             value_col: batch[value_col].slice(0, 0),
             "_n": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        t = batch.filter(batch[value_col].is_valid())
        if t.num_rows == 0:
            return empty
        part = t.group_by([group_col, value_col]).aggregate([([], "count_all")]).combine_chunks()
        gf, gn = pack_null_key(part[group_col], g_type)
        return pa.table(
            {"_gf": gf, "_gn": gn, value_col: part[value_col],
             "_n": part["count_all"].cast(pa.int64())}
        )

    def restore(batch: pa.Table) -> pa.Table:
        return pa.table(
            {group_col: restore_null_key(batch["_gf"], batch["_gn"], g_type),
             value_col: batch[value_col], n_col: batch[n_col]}
        )

    counts = (
        ds.select_columns([group_col, value_col])
        .map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["_gf", "_gn", value_col])
        .aggregate(Sum("_n", alias_name=n_col))
        .map_batches(restore, batch_format="pyarrow", zero_copy_batch=True)
    )
    return topn_per_group(counts, group_col, n_col, k, tie_col=value_col)


def grouped_iqr_outliers(
    ds,
    group_col: str,
    value_col: str,
    out_cols: Sequence[str],
    factor_num: int = 3,
    factor_den: int = 2,
    max_count_rows: int = 1_000_000,
) -> "ray.data.Dataset":
    """Distribution-based row filtering: rows whose integer value falls
    outside [q1 - f*IQR, q3 + f*IQR] of their GROUP (f = factor_num /
    factor_den, default 3/2 = the Tukey fence) — the outlier-removal stage
    of a cleaning pipeline, EXACT and bit-matching SQL ``quantile_disc``.

    Quantiles are derived from exact per-(group, value) counts: the pair
    exchange of :func:`grouped_distinct_exact` reduced to a counts table,
    which is then small enough to merge on the driver and turn into exact
    q1/q3 by the quantile_disc index rule (element at ceil(q*n)-1 of the
    sorted multiset, computed from cumulative counts — no value expansion).
    The fence test is pure integer cross-multiplication
    ``den*(q1 - v) > num*(q3 - q1)`` so fractional factors never touch
    floats and the DuckDB oracle hashes bit-exact.

    SCALE ASSUMPTION (checked loudly): the counts table — groups x distinct
    values — must fit ``max_count_rows``.  This is the grouped_histogram
    posture: exact under a BOUNDED VALUE DOMAIN (quantize/bin upstream for
    continuous data); for unbounded domains use grouped_quantiles_sketch
    (KLL) and accept rank error.  Pass 2 is map-only with the tiny fence
    table broadcast.  Null values are never outliers (SQL comparison
    semantics); null group keys form their own group."""
    if factor_num < 0 or factor_den <= 0:
        raise ValueError("factor must be a nonnegative rational with positive denominator")
    part_ds = ds.select_columns([group_col, value_col])
    g_type = part_ds.schema().base_schema.field(group_col).type

    def pair_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {group_col: pa.array([], g_type), "_v": pa.array([], pa.int64()),
             "_n": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        t = batch.filter(batch[value_col].is_valid())
        if t.num_rows == 0:
            return empty
        t = pa.table({group_col: t[group_col],
                      "_v": pc.round(t[value_col]).cast(pa.int64())})
        part = t.group_by([group_col, "_v"]).aggregate([([], "count_all")]).combine_chunks()
        return pa.table(
            {group_col: part[group_col], "_v": part["_v"],
             "_n": part["count_all"].cast(pa.int64())}
        )

    counts = part_ds.map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True).take_all()
    merged: dict = {}
    for r in counts:
        key = (r[group_col], r["_v"])
        merged[key] = merged.get(key, 0) + int(r["_n"])
    if len(merged) > max_count_rows:
        raise ValueError(
            f"grouped_iqr_outliers: counts table has {len(merged)} rows > "
            f"max_count_rows={max_count_rows}; the value domain is not "
            "bounded enough for the exact path — bin upstream or use "
            "grouped_quantiles_sketch"
        )
    per_group: dict = {}
    for (g, v), n in merged.items():
        per_group.setdefault(g, []).append((v, n))
    fences: dict = {}
    for g, pairs in per_group.items():
        pairs.sort()
        vals = np.array([p[0] for p in pairs], dtype=np.int64)
        cum = np.cumsum([p[1] for p in pairs])
        n = int(cum[-1])
        # quantile_disc(q) = sorted-multiset element at ceil(q*n)-1: the
        # first value whose cumulative count reaches ceil(q*n)
        import math
        q1 = int(vals[np.searchsorted(cum, math.ceil(0.25 * n))])
        q3 = int(vals[np.searchsorted(cum, math.ceil(0.75 * n))])
        fences[g] = (q1, q3)
    # the NULL group's fence is carried separately: pc.index_in yields null
    # for null values, so a null key would otherwise silently never flag
    null_fence = fences.pop(None, None)
    groups = list(fences)
    g_keys = pa.array(groups, type=g_type)
    q1_arr = np.array([fences[g][0] for g in groups]
                      + [null_fence[0] if null_fence else 0], dtype=np.int64)
    q3_arr = np.array([fences[g][1] for g in groups]
                      + [null_fence[1] if null_fence else 0], dtype=np.int64)

    def flag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({c: batch[c] for c in out_cols})
        codes = pc.index_in(batch[group_col], g_keys)
        code_np = pc.fill_null(codes, len(groups)).to_numpy(zero_copy_only=False).astype(np.int64)
        is_null_g = batch[group_col].is_null().to_numpy(zero_copy_only=False)
        known = (code_np < len(groups)) | (is_null_g & (null_fence is not None))
        v_valid = batch[value_col].is_valid().to_numpy(zero_copy_only=False)
        v = pc.round(pc.fill_null(batch[value_col], 0)).cast(pa.int64()).to_numpy(zero_copy_only=False)
        q1, q3 = q1_arr[code_np], q3_arr[code_np]
        iqr = q3 - q1
        out = (factor_den * (q1 - v) > factor_num * iqr) | (
            factor_den * (v - q3) > factor_num * iqr
        )
        out &= known & v_valid
        return batch.filter(pa.array(out)).select(list(out_cols))

    return ds.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)
