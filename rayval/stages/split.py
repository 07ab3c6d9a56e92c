"""Deterministic train/val/test splitting — the assignment step every
training-data pipeline runs before writing shards.

``hash_split`` is MAP-ONLY: split membership is a pure function of the row's
KEY (splitmix64 bit-mix over ``hash64(key)``, optionally re-hashed with a
salt), so

- the assignment is reproducible across runs, cluster sizes, block layouts
  and repartitions — no global shuffle, no sampled boundaries, no RNG state;
- duplicate keys always land in the SAME split (no train/eval leakage through
  exact duplicates — the property a ``ds.random_shuffle().split()`` approach
  silently lacks);
- at 10^12 rows the stage costs one vectorized hash + searchsorted per batch
  and nothing leaves the task.

Weights are integer BASIS POINTS (sum to 10_000) rather than floats, so the
bucket thresholds are exact integers and the DuckDB oracle replicates the
assignment bit-for-bit (same device as the ``sample_documents`` /
``stratified_sample`` oracles).  ``salt`` decorrelates the split from other
consumers of ``hash64(key)`` (e.g. the ~10% ``sample_documents`` bucket uses
``h64 % 10``; with ``salt=0`` the two decisions share a hash and are
correlated by construction — pass a salt when independence matters).
"""

from __future__ import annotations

import numpy as np

from rayval.state.hashing import hash64, rehash

BASIS = 10_000


def hash_split(
    ds,
    key_col: str,
    weights: dict[str, int] | None = None,
    salt: int = 0,
    split_col: str = "split",
):
    """Add ``split_col`` (string) assigning each row to a named split by a
    deterministic hash of ``key_col``.  ``weights`` maps split name -> basis
    points and must sum to exactly 10_000; insertion order defines the bucket
    layout (first name owns buckets [0, w0), the next [w0, w0+w1), ...).

    Null keys hash to the fixed null sentinel (one bucket), so they all land
    in the same split — deterministic, and documented rather than hidden."""
    if weights is None:
        weights = {"train": 9_000, "val": 500, "test": 500}
    if not weights:
        raise ValueError("weights must name at least one split")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("every split weight must be a positive basis-point count")
    total = sum(weights.values())
    if total != BASIS:
        raise ValueError(f"weights must sum to {BASIS} basis points, got {total}")
    names = np.array(list(weights.keys()), dtype=object)
    # exclusive upper bucket bounds; searchsorted(side='right') maps bucket
    # b to the first name whose bound exceeds b
    bounds = np.cumsum(np.fromiter(weights.values(), dtype=np.int64))

    import pyarrow as pa

    def assign(batch: "pa.Table") -> "pa.Table":
        col = batch[key_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        # Arrow-native hashing: hashing.py keeps null-bearing batches on the
        # key's NATIVE dtype (null slots get the fixed sentinel) — a pandas
        # to_numpy() here would widen a null-bearing int64 batch to float64
        # and hash the same key differently depending on its batch's nulls
        h = hash64(col)
        if salt:
            h = rehash(h, int(salt))
        bucket = (h % np.uint64(BASIS)).astype(np.int64)
        labels = names[np.searchsorted(bounds, bucket, side="right")]
        return batch.append_column(
            split_col, pa.array(labels.tolist(), type=pa.string())
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def mix_sources(
    ds,
    key_col: str,
    source_col: str,
    weights_bp: dict[str, int],
):
    """Deterministic WEIGHTED SOURCE MIXING — the corpus-composition stage of
    a training pipeline ("keep 100% of wiki, 25% of crawl, 5% of forums"):
    each row survives iff ``splitmix64(key) % 10_000 < weights_bp[source]``.

    MAP-ONLY like :func:`hash_split` (membership is a pure hash of the row
    key): no shuffle, reproducible across runs / block layouts / cluster
    sizes, duplicate keys co-decided, and the realized mix converges to the
    target weights by the hash's uniformity.  Sources absent from
    ``weights_bp`` (and null sources) get weight 0 — dropped, never silently
    passed through.  Integer basis points keep the DuckDB oracle bit-exact
    (same splitmix64 staging as hash_split / sample_documents).

    Scale note: the source→weight table rides the task closure (it is a few
    entries); the per-batch cost is one vectorized hash + one dictionary
    take.  Rows keep their full schema — this stage only filters."""
    for src, bp in weights_bp.items():
        if not (0 <= bp <= BASIS):
            raise ValueError(f"weight for {src!r} must be in [0, {BASIS}]")
    sources = list(weights_bp)
    rates = np.array([weights_bp[s] for s in sources] + [0], dtype=np.uint64)

    def keep(batch: "pa.Table") -> "pa.Table":
        import pyarrow as pa
        import pyarrow.compute as pc

        if batch.num_rows == 0:
            return batch
        key = batch[key_col]
        key = key.combine_chunks() if isinstance(key, pa.ChunkedArray) else key
        bucket = hash64(key) % np.uint64(BASIS)
        codes = pc.index_in(batch[source_col], pa.array(sources, type=pa.string()))
        codes = pc.fill_null(codes, len(sources)).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(bucket < rates[codes]))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
