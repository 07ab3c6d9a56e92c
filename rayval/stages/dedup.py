"""Exact pHash uniqueness with skew-aware hot-bucket handling.

North rule: "every pHash duplicate flagged ... skew-aware repartitioning on
hot pHash buckets".  The scalable shape chosen here avoids shuffling ANY wide
data, avoids sending hot keys through a groupby at all, and — critically for
10^12 mostly-unique keys — never materializes the full distinct-counts table
on the driver:

1. count pass — per-batch partial (phash, count) aggregation inside
   map_batches (combiner), then a tiny ``groupby(phash).sum`` over partials.
   The shuffle moves one row per distinct phash per batch, not per image row.
   The merged counts stay a DISTRIBUTED Dataset (``phash_counts_ds``).
2. dup set = keys with total count > 1, filtered DISTRIBUTED
   (``.filter(expr="n > 1")``) before anything reaches the driver — what
   comes back is bounded by #duplicate groups, not #distinct keys.  HOT keys
   (count >= hot_threshold, e.g. the constant-image cluster at ~1% of all
   rows) are split out of the same small table.  A hot key would make one
   groupby task a straggler (all its rows land on one reducer); instead BOTH
   hot and normal dup membership is resolved by broadcasting the dup-key set
   (``ray.put`` once) and filtering in map_batches — no row-level shuffle.
3. the skew report (top-k hottest phashes) comes from a per-batch top-k
   COMBINER over the distributed counts (each block emits its own top-k; the
   driver merges k x num_blocks rows), so it too never sees the full table.
4. the broadcast-set assumption: |distinct duplicated phashes| must fit in
   memory (it's bounded by #duplicate groups, far smaller than #rows). If it
   ever didn't, the fallback is a hash-partitioned semi-join on
   ``phash % B`` buckets with hot keys pre-filtered exactly as here — the
   hot-key split is what keeps that shuffle skew-free (see
   stages/rules.py:members_via_semijoin for the implemented shape).

Only decodable rows participate (an undecodable payload has no trustworthy
content hash; it is already flagged ``bytes.decodable``).
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from rayval.constraints.profile import PARTITION_COL
from rayval.functions.phash import _popcount64
from rayval.stages.docdedup import _bucket_pair_indices, _collect_dedup_pairs


def phash_counts_ds(results: "ray.data.Dataset") -> "ray.data.Dataset":
    """DISTRIBUTED (phash, n) total counts, one row per distinct phash,
    via partial per-batch aggregation + a narrow groupby merge.  Callers
    must NOT collect this wholesale — filter or combine first."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch
        if "decodable" in t.column_names:
            t = t.filter(t["decodable"])
        # drop null phashes BEFORE to_numpy: SQL semantics (NULL is never a
        # duplicate of anything), and one null would otherwise widen the
        # whole block to float64, merging distinct int64 phashes past 2^53
        ph = t["phash"].drop_null() if t["phash"].null_count else t["phash"]
        vals, counts = np.unique(ph.to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"phash": pa.array(vals, type=pa.int64()), "n": pa.array(counts, type=pa.int64())})

    return (
        results.select_columns([c for c in ("phash", "decodable") if c in results.schema().names])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("phash")
        .sum("n")
        .map_batches(lambda b: b.rename_columns(["phash", "n"]), batch_format="pyarrow")
    )


_COUNTS_SCHEMA = pa.schema([("phash", pa.int64()), ("n", pa.int64())])


def duplicate_counts(counts: "ray.data.Dataset") -> pa.Table:
    """Collect ONLY the duplicated keys: the ``n > 1`` filter runs
    distributed, so the driver table is bounded by #duplicate groups (the
    rules.py:unique_violations shape), never by #distinct keys."""
    from rayval.util import collect_tables

    return collect_tables(counts.filter(expr="n > 1"), _COUNTS_SCHEMA)


def dup_counts_and_top(counts: "ray.data.Dataset", k: int = 10) -> tuple[pa.Table, pa.Table]:
    """(duplicate counts table, top-k hot table) from ONE pass over the
    distributed counts: each block emits its ``n > 1`` rows plus its own
    top-k candidates (marker column), so the driver sees dup-group-sized +
    k x num_blocks rows in a single Ray job — the filter and the combiner
    share the scan instead of costing a fixed job launch each.

    NOTE: this (and ``phash_counts_ds``/``duplicate_counts``) is the plain
    row-exchange formulation, kept as the REFERENCE IMPLEMENTATION the tests
    assert :func:`dup_counts_and_top_bucketed` — the production phase-2 path
    with the packed blob exchange — agrees with.  Semantics changes must land
    in both (test_pipeline::test_dedup_counts_stay_distributed pins them
    together)."""

    def per_block(b: pa.Table) -> pa.Table:
        dup = b.filter(pc.greater(b["n"], 1))
        top = _topk_table(b, k)
        return pa.table(
            {
                "phash": pa.concat_arrays(
                    [dup["phash"].combine_chunks(), top["phash"].combine_chunks()]
                ),
                "n": pa.concat_arrays([dup["n"].combine_chunks(), top["n"].combine_chunks()]),
                "is_top": pa.array([False] * dup.num_rows + [True] * top.num_rows),
            }
        )

    from rayval.util import collect_tables

    rows = collect_tables(
        counts.map_batches(per_block, batch_format="pyarrow"),
        pa.schema([("phash", pa.int64()), ("n", pa.int64()), ("is_top", pa.bool_())]),
    )
    dup_tbl = rows.filter(pc.invert(rows["is_top"])).select(["phash", "n"])
    top_tbl = _topk_table(rows.filter(rows["is_top"]).select(["phash", "n"]), k)
    return dup_tbl, top_tbl


def dup_counts_and_top_bucketed(
    results: "ray.data.Dataset", k: int = 10, n_buckets: int = 16, hot_threshold: int = 1000
) -> tuple[pa.Table, pa.Table, int]:
    """(duplicate counts, top-k hot table, n_hot) with a BLOB-bucketed
    exchange: each batch emits one row per touched ``phash % n_buckets``
    bucket holding its packed (phash, n) partial-count arrays, so the
    groupby machinery sorts/exchanges thousands of blob rows instead of the
    whole distinct key space (a 250k-distinct shuffle measured ~4x the cost
    of the same bytes in blob rows).  Each bucket's reducer merges its blobs
    vectorized, filters ``n > 1`` and emits its local top-k — the driver
    sees dup-group-sized + k x n_buckets rows from ONE Ray job.  Scale
    assumption: one bucket's distinct keys fit a reducer (size ``n_buckets``
    like any groupby)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch
        if "decodable" in t.column_names:
            t = t.filter(t["decodable"])
        # null phashes are never duplicates; dropping them also keeps the
        # block int64 (a null would widen it to float64 — see exact partial)
        ph = t["phash"].drop_null() if t["phash"].null_count else t["phash"]
        vals, counts = np.unique(ph.to_numpy(zero_copy_only=False), return_counts=True)
        bucket = (vals.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)
        order = np.argsort(bucket, kind="stable")
        vals, counts, bucket = vals[order], counts.astype(np.int64)[order], bucket[order]
        ids, starts = np.unique(bucket, return_index=True)
        bounds = np.append(starts, len(vals))
        blobs = [
            vals[a:b].tobytes() + counts[a:b].tobytes()
            for a, b in zip(bounds[:-1], bounds[1:])
        ]
        return pa.table(
            {"bucket": pa.array(ids, type=pa.int64()), "blob": pa.array(blobs, type=pa.binary())}
        )

    def merge_bucket(group: pa.Table) -> pa.Table:
        vs, cs = [], []
        for blob in group["blob"]:
            raw = np.frombuffer(blob.as_py(), dtype=np.int64)
            half = len(raw) // 2
            vs.append(raw[:half])
            cs.append(raw[half:])
        allv = np.concatenate(vs)
        allc = np.concatenate(cs)
        u, inv = np.unique(allv, return_inverse=True)
        tot = np.bincount(inv, weights=allc.astype(np.float64)).astype(np.int64)
        dup_mask = tot > 1
        kk = min(k, len(u))
        top_idx = np.argsort(-tot, kind="stable")[:kk] if kk else np.array([], dtype=int)
        return pa.table(
            {
                "phash": pa.array(np.concatenate([u[dup_mask], u[top_idx]]), type=pa.int64()),
                "n": pa.array(np.concatenate([tot[dup_mask], tot[top_idx]]), type=pa.int64()),
                "is_top": pa.array([False] * int(dup_mask.sum()) + [True] * kk),
            }
        )

    from rayval.util import collect_tables

    rows = collect_tables(
        results.select_columns([c for c in ("phash", "decodable") if c in results.schema().names])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(merge_bucket, batch_format="pyarrow"),
        pa.schema([("phash", pa.int64()), ("n", pa.int64()), ("is_top", pa.bool_())]),
    )
    dup_tbl = rows.filter(pc.invert(rows["is_top"])).select(["phash", "n"])
    top_tbl = _topk_table(rows.filter(rows["is_top"]).select(["phash", "n"]), k)
    n_hot = int((dup_tbl["n"].to_numpy(zero_copy_only=False) >= hot_threshold).sum())
    return dup_tbl, top_tbl, n_hot


def duplicate_violations(
    results: "ray.data.Dataset",
    hot_threshold: int = 1000,
    counts: Optional[Union[pa.Table, "ray.data.Dataset"]] = None,
) -> "ray.data.Dataset":
    """Violation rows (partition_id, image_id, 'phash.unique') for EVERY member
    of every duplicate group.  Membership via broadcast dup-set filter — hot
    keys never enter a shuffle (see module doc).

    ``counts``: pass the (materialized) Dataset from :func:`phash_counts_ds`
    to share one count pass with the skew report; a pre-filtered duplicate
    Table is also accepted."""
    if counts is None:
        counts = phash_counts_ds(results)
    dup = counts if isinstance(counts, pa.Table) else duplicate_counts(counts)
    n = dup["n"].to_numpy(zero_copy_only=False)
    dup_keys = dup["phash"].to_numpy(zero_copy_only=False)[n > 1]
    n_hot = int((n >= hot_threshold).sum())
    # broadcast the ARROW set ONCE; per-batch pa.array(keys) would pay an
    # O(|dup set|) conversion in every map task
    dup_ref = ray.put(pa.array(dup_keys, type=pa.int64()))

    def flag(batch: pa.Table) -> pa.Table:
        keys = ray.get(dup_ref)
        t = batch
        if "decodable" in t.column_names:
            t = t.filter(t["decodable"])
        # Arrow is_in: null phash -> null -> filtered out (never a member);
        # no float64 widening of the block
        member = pc.fill_null(pc.is_in(t["phash"], value_set=keys), False)
        t = t.filter(member)
        return pa.table(
            {
                PARTITION_COL: t[PARTITION_COL],
                "image_id": t["image_id"],
                "constraint_id": pa.array(["phash.unique"] * t.num_rows, type=pa.string()),
            }
        )

    ds = results.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)
    ds._rayval_hot_buckets = n_hot  # introspection for tests/reporting
    return ds


def top_hot_buckets(counts: Union[pa.Table, "ray.data.Dataset"], k: int = 10) -> pa.Table:
    """Top-k most frequent phash values — the skew report.

    Dataset input (the scale path): per-batch top-k combiner — every block
    emits only its own k hottest rows, the driver merges k x num_blocks rows
    and takes the final top-k (the ``top_orders_combiner`` shape; nothing
    distinct-key-sized reaches the driver).  A small pre-aggregated Table is
    sorted directly."""
    if isinstance(counts, pa.Table):
        return _topk_table(counts, k)

    def per_block_topk(batch: pa.Table) -> pa.Table:
        return _topk_table(batch, k)

    from rayval.util import collect_tables

    merged = collect_tables(
        counts.map_batches(per_block_topk, batch_format="pyarrow"), _COUNTS_SCHEMA
    )
    return _topk_table(merged, k)


def _topk_table(counts: pa.Table, k: int) -> pa.Table:
    order = pc.sort_indices(
        counts, sort_keys=[("n", "descending"), ("phash", "ascending")]
    )
    return counts.take(order[:k])


def phash_neardups(
    results: "ray.data.Dataset",
    phash_col: str = "phash",
    key_col: str = "image_id",
    max_hamming: int = 3,
    hot_cap: int = 256,
) -> pa.Table:
    """NEAR-duplicate image pairs by pHash Hamming distance: (a, b, hamming)
    with popcount(phash_a XOR phash_b) <= ``max_hamming``, a < b.

    The exact-duplicate pass above flags identical pHashes; real perceptual
    duplicates (recompressed / slightly-edited copies of one image) land a
    few BITS apart, so the north rule's "every pHash duplicate flagged"
    needs a Hamming-radius join too.  Shape (the 10^12-image path):

    - pigeonhole banding: the 64-bit hash splits into ``max_hamming + 1``
      contiguous bit-bands, so any pair within the radius agrees EXACTLY on
      at least one band (d flipped bits can touch at most d of d+1 bands) —
      recall is exact, no probabilistic LSH tuning.  Default d=3 gives four
      16-bit bands.
    - each batch explodes to (band, band_value, key, sig) rows — 4 narrow
      rows per image, never pixel bytes — and ONE groupby([band, bh])
      exchange co-locates candidates.  The group count is bounded by
      ``(d+1) * 2^band_bits`` (<= 262,144 at d=3) independent of row count,
      so per-group map_groups dispatch can never become the gram-explosion
      failure mode (docdedup.ngram_jaccard_pairs history).
    - within a bucket, pairing is the shared vectorized
      ``_bucket_pair_indices`` with the hot-bucket guard: a bucket larger
      than ``hot_cap`` pairs identical-signature rows as representative
      chains (exact dups stay cheap and fully recalled) and skips
      cross-signature all-pairs when DISTINCT signatures exceed the cap —
      the documented skew trade.  At 10^12 rows a 16-bit band averages
      ~15M rows/bucket, so cross-signature recall there comes from raising
      band count (smaller radius per sub-join) or ``hot_cap``; the exact
      pass above is unaffected.
    - survivors get an exact popcount verify (precision 1.0), then the
      distributed (a, b) min-dedup collect shared with MinHash/SimHash.

    Reference parity: the reference validates per-document and has no
    cross-row dedup at all (core.clj:1-170) — engine-new surface, SQL-oracled
    against a brute-force DuckDB ``bit_count(xor(...))`` self-join.
    """
    n_bands = max_hamming + 1
    band_bits = 64 // n_bands
    band_los = [b * band_bits for b in range(n_bands)]
    band_widths = [band_bits] * (n_bands - 1) + [64 - band_los[-1]]

    def sigs(batch: pa.Table) -> pa.Table:
        # NULL phash never matches anything (SQL join semantics; an
        # undecodable image has no trustworthy hash) — drop the ROW before
        # to_numpy so a null can't widen the int64 block to float64.
        mask = pc.and_kleene(pc.is_valid(batch[phash_col]), pc.is_valid(batch[key_col]))
        t = batch.filter(mask)
        n = t.num_rows
        s = t[phash_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u = s.view(np.uint64)
        keys = t[key_col].combine_chunks()
        bands_out, bh_out, key_idx = [], [], []
        for b in range(n_bands):
            bmask = np.uint64((1 << band_widths[b]) - 1)
            bh_out.append(((u >> np.uint64(band_los[b])) & bmask).astype(np.int64))
            bands_out.append(np.full(n, b, dtype=np.int32))
            key_idx.append(np.arange(n))
        idx = pa.array(np.concatenate(key_idx) if n else np.empty(0, np.int64), type=pa.int64())
        return pa.table(
            {
                "band": pa.array(
                    np.concatenate(bands_out) if n else np.empty(0, np.int32), type=pa.int32()
                ),
                "bh": pa.array(
                    np.concatenate(bh_out) if n else np.empty(0, np.int64), type=pa.int64()
                ),
                key_col: keys.take(idx),
                "sig": pa.array(np.tile(s, n_bands), type=pa.int64()),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        keys = group[key_col].to_numpy(zero_copy_only=False)
        s = group["sig"].to_numpy(zero_copy_only=False)
        i_idx, j_idx = _bucket_pair_indices(keys, s.reshape(-1, 1), hot_cap)
        if not len(i_idx):
            return pa.table(
                {"a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
                 "hamming": pa.array([], pa.int32())}
            )
        d = _popcount64((s[i_idx] ^ s[j_idx]).view(np.uint64))
        keep = d <= max_hamming
        i_idx, j_idx, d = i_idx[keep], j_idx[keep], d[keep]
        return pa.table(
            {
                "a": pa.array(keys[i_idx], type=pa.string()),
                "b": pa.array(keys[j_idx], type=pa.string()),
                "hamming": pa.array(d.astype(np.int32)),
            }
        )

    return _collect_dedup_pairs(
        results.map_batches(sigs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band", "bh"])
        .map_groups(pairs, batch_format="pyarrow"),
        value_col="hamming",
        value_type=pa.int32(),
    )


def neardup_violations(
    results: "ray.data.Dataset",
    max_hamming: int = 2,
    hot_cap: int = 256,
    phash_col: str = "phash",
    key_col: str = "image_id",
) -> "ray.data.Dataset":
    """Violation rows (partition_id, <key_col>, '<phash_col>.neardup') for
    every image whose pHash sits within ``max_hamming`` bits (but NOT 0 —
    exact duplicates are ``phash_col.unique``'s, flagged by
    :func:`duplicate_violations`) of another image's.

    Same broadcast-membership shape as the exact pass, but the broadcast set
    holds member phash VALUES, not keys: Hamming membership is a property of
    the hash value (d(x, y) depends only on values), so every exact copy of a
    member value is itself a member — flagging by value both avoids shipping
    wide string keys and closes the hot-bucket chain hole (in a >hot_cap
    identical-value clique the pair join emits d=0 chain edges, which the
    ``hamming > 0`` filter drops; the clique's VALUE still appears in the
    surviving (clique, 1..r-bit variant) pair, so every copy gets flagged,
    matching the brute-force EXISTS oracle).  The banded pair join
    (:func:`phash_neardups`) returns a pair table bounded by the near-dup
    population; member values are resolved by one narrow distributed pass and
    ``ray.put`` once; flagging is a map-only ``is_in`` filter — no row-level
    shuffle.  If the member set ever outgrew a broadcast, the fallback is the
    hash-partitioned semi-join (stages/rules.py:_members_via_semijoin),
    exactly as for exact dups.

    Only decodable rows participate on BOTH sides (flagship narrow results
    keep the stored ``phash`` for undecodable rows — an untrustworthy hash,
    already flagged ``bytes.decodable``; inputs without a ``decodable``
    column pass through).  Null phash never matches anything."""
    cols = [
        c
        for c in (key_col, phash_col, PARTITION_COL, "decodable")
        if c in results.schema().names
    ]
    narrow = results.select_columns(cols)

    def _decodable(t: pa.Table) -> pa.Table:
        if "decodable" in t.column_names:
            t = t.filter(t["decodable"])
        return t

    pairs = phash_neardups(
        narrow.map_batches(_decodable, batch_format="pyarrow", zero_copy_batch=True),
        phash_col=phash_col, key_col=key_col,
        max_hamming=max_hamming, hot_cap=hot_cap,
    )
    pairs = pairs.filter(pc.greater(pairs["hamming"], 0))
    member_keys = pc.unique(
        pa.concat_arrays(
            [pairs["a"].combine_chunks(), pairs["b"].combine_chunks()]
        )
    )
    key_ref = ray.put(member_keys)

    # member keys -> member VALUES: one narrow distributed pass, each batch
    # returns only the (<= |member| distinct) phash values of its member rows
    def _vals(batch: pa.Table) -> pa.Table:
        t = _decodable(batch)
        sel = pc.fill_null(pc.is_in(t[key_col], value_set=ray.get(key_ref)), False)
        v = t.filter(sel)[phash_col]
        v = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
        return pa.table({"v": pc.unique(v.drop_null() if v.null_count else v)})

    val_parts = narrow.map_batches(
        _vals, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    member_vals = pa.array(sorted({r["v"] for r in val_parts}), type=pa.int64())
    val_ref = ray.put(member_vals)

    def flag(batch: pa.Table) -> pa.Table:
        t = _decodable(batch)
        member = pc.fill_null(
            pc.is_in(t[phash_col], value_set=ray.get(val_ref)), False
        )
        t = t.filter(member)
        if PARTITION_COL in t.column_names:
            part = t[PARTITION_COL]
        else:  # untagged input (e.g. a bare (image_id, phash) table): -1,
            part = pa.array([-1] * t.num_rows, type=pa.int64())  # as in
            # constraints/profile.py:BatchValidator.violations
        return pa.table(
            {
                PARTITION_COL: part,
                key_col: t[key_col],
                "constraint_id": pa.array(
                    [f"{phash_col}.neardup"] * t.num_rows, type=pa.string()
                ),
            }
        )

    return narrow.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)
