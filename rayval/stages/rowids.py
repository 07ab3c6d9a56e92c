"""Global row numbering — ``ROW_NUMBER() OVER (ORDER BY key)`` as a
distributed operator (the ``zipWithIndex`` Ray Data's Dataset API lacks).

Training pipelines want stable, contiguous integer ids (shard-independent
example ids, join surrogates, resumable cursors).  A driver-side
``enumerate(iter_rows())`` is the canonical non-distributed anti-pattern;
this operator computes exact global ranks in three passes, the first two of
which read ONLY the key column (columnar prune — at 100 TB they touch a few
GB of one column, not the table):

1. **Boundary pass** (map-only, tiny): mergeable KLL partials over the key
   -> the driver derives ``n_buckets-1`` approximate-quantile range
   boundaries, so buckets are load-BALANCED even for skewed key
   distributions (equi-width boundaries would funnel a zipfian key space
   into one reducer).  Boundary quality affects only balance, never
   correctness.
2. **Count pass** (map-only, tiny): exact per-bucket row counts via one
   vectorized ``searchsorted`` + ``bincount`` per batch; the driver's
   exclusive cumsum turns them into per-bucket BASE OFFSETS (n_buckets
   ints, broadcast by closure capture).
3. **Rank pass** (the one real exchange): ``groupby(bucket)`` co-locates
   each key range, one vectorized argsort per BUCKET (n_buckets Python
   dispatches total — the repo's bucketed-reduce pattern, not per-key), and
   ``row_id = base[bucket] + arange`` after the in-bucket sort.

Must-fit assumption: one bucket's rows fit a reducer (~n/n_buckets — size
``n_buckets`` to the cluster, same contract as any sort).  Range bucketing
cannot split TIES on a single key value; a key column that is one giant
constant degenerates to one reducer, which is also what ORDER BY on that
column means.  Keys must be numeric and non-null (loud error otherwise);
duplicate keys get an arbitrary but valid rank order unless ``tie_col``
pins it — with unique keys the output is exactly SQL ROW_NUMBER.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rayval.state.kll import KLL


def global_row_number(
    ds,
    key_col: str,
    n_buckets: int = 64,
    id_col: str = "row_id",
    tie_col: str | None = None,
):
    """Add ``id_col`` = 0-based global rank of ``key_col`` (ascending)."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    key_t = ds.schema().base_schema.field(key_col)
    if not (pa.types.is_integer(key_t.type) or pa.types.is_floating(key_t.type)):
        raise TypeError(f"global_row_number needs a numeric key, got {key_t.type}")
    keys_only = ds.select_columns([key_col])

    def _key_f64(batch: pa.Table) -> np.ndarray:
        col = batch[key_col]
        if col.null_count:
            raise ValueError(f"global_row_number: null {key_col} has no rank")
        # float64 is monotone (non-strictly) in the key, so boundary/bucket
        # assignment stays order-consistent even where int64 > 2^53 keys
        # collapse onto one float — that only merges adjacent buckets
        v = col.to_numpy(zero_copy_only=False).astype(np.float64)
        if np.isnan(v).any():
            # NaN is unorderable AND silently dropped by the KLL boundary
            # sketch — it would corrupt ranks instead of erroring downstream
            raise ValueError(f"global_row_number: NaN {key_col} has no rank")
        return v

    # -- pass 1: KLL partials -> balanced range boundaries -------------------
    def kll_partial(batch: pa.Table) -> pa.Table:
        sk = KLL()
        v = _key_f64(batch)
        if v.size:
            sk.add(v)
        return pa.table({"kll": pa.array([sk.to_bytes()], type=pa.binary())})

    sk = KLL()
    for r in keys_only.map_batches(kll_partial, batch_format="pyarrow").take_all():
        sk.merge(KLL.from_bytes(r["kll"]))
    if sk.n == 0:
        return ds.map_batches(
            lambda b: b.append_column(id_col, pa.array([], type=pa.int64())),
            batch_format="pyarrow",
        )
    qs = [i / n_buckets for i in range(1, n_buckets)]
    # dedup collapses boundaries KLL ties together (heavy single values)
    bounds = np.unique(np.asarray(sk.quantiles(qs), dtype=np.float64))

    # -- pass 2: exact per-bucket counts -> base offsets ----------------------
    nb = len(bounds) + 1

    def count_partial(batch: pa.Table) -> pa.Table:
        b = np.searchsorted(bounds, _key_f64(batch), side="right")
        return pa.table(
            {
                "b": pa.array(np.arange(nb, dtype=np.int64)),
                "n": pa.array(np.bincount(b, minlength=nb), type=pa.int64()),
            }
        )

    counts = np.zeros(nb, dtype=np.int64)
    for r in keys_only.map_batches(count_partial, batch_format="pyarrow").take_all():
        counts[r["b"]] += r["n"]
    base = np.concatenate([[0], np.cumsum(counts)[:-1]])

    # -- pass 3: bucket exchange + one vectorized rank pass per bucket --------
    def tag(batch: pa.Table) -> pa.Table:
        b = np.searchsorted(bounds, _key_f64(batch), side="right")
        return batch.append_column("_rb", pa.array(b, type=pa.int64()))

    out_schema = pa.schema(
        list(ds.schema().base_schema) + [pa.field(id_col, pa.int64())]
    )

    def rank_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "_rb" not in group.column_names:
            # empty reduce partition: Ray hands the UDF a zero-column block;
            # return the POPULATED path's schema so the streaming executor
            # doesn't see heterogeneous bundles (the documented pathology
            # the window operators guard the same way)
            return out_schema.empty_table()
        bucket = group["_rb"][0].as_py()
        keys = [group[tie_col], group[key_col]] if tie_col else [group[key_col]]
        order = np.lexsort([k.to_numpy(zero_copy_only=False) for k in keys])
        ids = np.empty(group.num_rows, dtype=np.int64)
        ids[order] = base[bucket] + np.arange(group.num_rows, dtype=np.int64)
        return group.drop_columns(["_rb"]).append_column(id_col, pa.array(ids))

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_rb")
        .map_groups(rank_bucket, batch_format="pyarrow")
    )


def with_ntile(
    ds,
    key_col: str,
    n_tiles: int,
    tile_col: str = "ntile",
    n_buckets: int = 64,
    tie_col: str | None = None,
):
    """Add ``tile_col`` = SQL ``NTILE(n_tiles) OVER (ORDER BY key[, tie])``
    (1-based) — quantile bucketing for curriculum ordering, stratified
    reporting, percentile features.  Built directly on
    :func:`global_row_number`: with the exact global rank in hand, the tile
    is pure per-row arithmetic using SQL's exact fill rule (the first
    ``total % n`` tiles get one extra row), so the operator costs ONE extra
    map stage over the rank pass and matches DuckDB's NTILE bit-for-bit."""
    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")
    total = ds.count()
    ranked = global_row_number(
        ds, key_col, n_buckets=n_buckets, id_col="__rn", tie_col=tie_col
    )
    q, r = divmod(total, n_tiles)
    big = (q + 1) * r  # rows covered by the r larger (q+1)-sized tiles

    def tile(batch: pa.Table) -> pa.Table:
        i = batch["__rn"].to_numpy(zero_copy_only=False)
        if q == 0:
            # degenerate: fewer rows than tiles — row i lands in tile i+1
            t = i + 1
        else:
            t = np.where(i < big, i // (q + 1), r + (i - big) // q) + 1
        return batch.drop_columns(["__rn"]).append_column(
            tile_col, pa.array(t.astype(np.int64))
        )

    return ranked.map_batches(tile, batch_format="pyarrow", zero_copy_batch=True)
