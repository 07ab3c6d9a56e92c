"""Join / lookup operators.

``broadcast_join``: the small-side dimension join (guide: "Joins and
lookups") — the small table is ``ray.put`` ONCE and each batch does one
Arrow hash-join against it; no shuffle, no per-batch re-ship.

``bucket_join``: both-sides-large equi-join as an explicit partitioned hash
join: both sides get ``bucket = hash64(key) % B``, matching buckets join
pairwise inside ``groupby(bucket).map_groups``.  Skew note: salt hot keys
into sub-buckets before grouping (the hot-key split in stages/dedup.py is the
template); B is the documented partitioning assumption.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from rayval.state.hashing import hash64


_JOIN_TYPES = {"left": "left outer", "inner": "inner", "right": "right outer", "outer": "full outer"}


def broadcast_join(
    ds: "ray.data.Dataset",
    small: pa.Table,
    key: str,
    how: str = "left",
) -> "ray.data.Dataset":
    """Enrich ``ds`` with columns from ``small`` (a driver-side Arrow table)
    matched on ``key``.  Small side is broadcast once via the object store;
    each batch runs one Arrow hash-join (``pa.Table.join``) — zero-copy in,
    no pandas round-trip in the hot path.  Row order within a batch is not
    preserved (hash-join output order), as with any distributed join."""
    small_ref = ray.put(small)
    join_type = _JOIN_TYPES.get(how, how)

    def join(batch: pa.Table) -> pa.Table:
        right = ray.get(small_ref)
        return batch.join(right, keys=key, join_type=join_type)

    return ds.map_batches(join, batch_format="pyarrow", zero_copy_batch=True)


def bucket_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    n_buckets: int = 32,
    how: str = "inner",
    hot_keys=None,
    n_salts: int = 8,
) -> "ray.data.Dataset":
    """Explicit hash-partitioned join for two large sides (narrow columns
    only — project before joining).

    Skew: pass ``hot_keys`` (array of key values known to be heavy, e.g. from
    a sampled pre-count) to SALT them — hot LEFT rows spread over ``n_salts``
    sub-buckets, hot RIGHT rows replicate into every sub-bucket, so one hot
    key's probe side never lands on a single reducer.  Non-hot keys pay
    nothing.  Exact for inner/left joins (each left row still meets each
    matching right row exactly once); right/outer with salting would emit an
    unmatched replicated right row once per sub-bucket, so that combination
    is refused rather than silently duplicated."""
    if hot_keys is not None and len(np.asarray(hot_keys)) and how not in ("inner", "left"):
        raise ValueError(
            f"bucket_join(hot_keys=..., how={how!r}): salting replicates hot right "
            "rows into every sub-bucket, so right/outer would duplicate unmatched "
            "rows n_salts times — use how='inner'/'left', or drop hot_keys"
        )

    lcols = list(left.schema().names)
    rcols = list(right.schema().names)
    shared = set(lcols) & set(rcols) - {key}
    if shared:
        raise ValueError(f"non-key columns appear on both sides: {sorted(shared)}; project first")
    all_cols = lcols + [c for c in rcols if c != key]
    l_schema = dict(zip(left.schema().names, left.schema().types))
    r_schema = dict(zip(right.schema().names, right.schema().types))
    types = {**r_schema, **l_schema}
    hot = np.asarray(hot_keys if hot_keys is not None else [])
    # broadcast as an ARROW array once (per-batch pa.array(hot) conversions
    # would pay O(|hot|) in every map task)
    hot_ref = ray.put(pa.array(hot) if hot.size else None)

    def tag(side: str):
        def f(batch: pa.Table) -> pa.Table:
            h = hash64(batch[key]) % np.uint64(n_buckets)
            n = batch.num_rows
            out = {}
            for c in all_cols:
                if c in batch.column_names:
                    out[c] = batch[c]
                else:
                    out[c] = pa.nulls(n, types[c])
            t = pa.table(out)
            bucket = h.astype(np.int64)
            hk = ray.get(hot_ref)
            salt = np.zeros(n, dtype=np.int64)
            if hk is not None:
                # Arrow is_in (null -> not hot): np.isin over to_numpy would
                # widen a null-bearing int block to float64 and miss hot keys
                # past 2^53
                is_hot = pc.fill_null(
                    pc.is_in(batch[key], value_set=hk), False
                ).to_numpy(zero_copy_only=False)
                if side == "l":
                    # spread hot probe rows across sub-buckets
                    salt[is_hot] = np.arange(int(is_hot.sum())) % n_salts
                elif is_hot.any():
                    # replicate hot build rows into EVERY sub-bucket
                    rep_idx = np.flatnonzero(is_hot)
                    keep_idx = np.flatnonzero(~is_hot)
                    idx = np.concatenate([keep_idx, np.repeat(rep_idx, n_salts)])
                    t = t.take(pa.array(idx))
                    bucket = bucket[idx]
                    salt = np.concatenate(
                        [salt[keep_idx],
                         np.tile(np.arange(n_salts, dtype=np.int64), len(rep_idx))]
                    )
                    n = len(idx)
            t = t.append_column("__bucket", pa.array(bucket * n_salts + salt))
            return t.append_column("__side", pa.array([side] * n, type=pa.string()))

        return f

    both = left.map_batches(tag("l"), batch_format="pyarrow").union(
        right.map_batches(tag("r"), batch_format="pyarrow")
    )

    join_type = _JOIN_TYPES.get(how, how)
    r_proj = [key] + [c for c in rcols if c != key]

    def per_bucket(group: pa.Table) -> pa.Table:
        # Arrow-native merge: no pandas round-trip, so int64 columns with
        # nulls never pass through float64.  Null keys don't match (SQL
        # semantics; pandas merge would have matched NaN == NaN).
        lmask = pc.equal(group["__side"], "l")
        l = group.filter(lmask).select(lcols)
        r = group.filter(pc.invert(lmask)).select(r_proj)
        return l.join(r, keys=key, join_type=join_type).select(all_cols)

    return both.groupby("__bucket").map_groups(per_bucket, batch_format="pyarrow")
