"""Referential integrity: every caption row must resolve to a DECODABLE image
(north_star).  Implemented as the north_rule's "broadcast Bloom-filter join
with explicit hash-partitioned shuffle", in ONE pass over captions:

1. build — per-batch partial Bloom filters over decodable image_ids
   (map_batches emits one serialized partial per batch), OR-merged small-side
   on the driver, broadcast once via ``ray.put``.
2. probe+tag — captions stream through map_batches; each row gets
   ``bucket = hash64(image_id) % B``.  Rows whose id is NOT in the Bloom (or
   is null) are DEFINITE violations (Bloom has no false negatives) — they are
   routed to the degenerate bucket -1, skipping the real shuffle work.
   Bloom-POSITIVE rows may be false positives, so they shuffle to their hash
   bucket for exact verification.
3. exact verify — the decodable image_id column (narrow) is tagged with the
   same bucket hash; ``groupby(bucket).map_groups`` anti-joins caption
   candidates against the ids per bucket.  Bucket -1 has no right side, so
   its rows all come out violations — no special casing.

Payload bytes never move; only (bucket, image_id, key) shuffles.  The result
is EXACT: bloom false positives are caught by the join; bloom negatives are
provably dangling.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from rayval.constraints.profile import PARTITION_COL
from rayval.state import Bloom, hash64

REF_CONSTRAINT = "image_id.ref"


def build_bloom(results: "ray.data.Dataset", n_expected: int, fpp: float = 0.01) -> Bloom:
    """OR-merge per-batch Bloom partials over decodable image_ids."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch["decodable"]) if "decodable" in batch.column_names else batch
        b = Bloom(n_expected, fpp)
        if t.num_rows:
            b.add(t["image_id"])
        return pa.table({"bloom": pa.array([b.to_bytes()], type=pa.binary())})

    cols = [c for c in ("image_id", "decodable") if c in results.schema().names]
    blobs = results.select_columns(cols).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    merged = Bloom(n_expected, fpp)
    for row in blobs:
        merged.merge(Bloom.from_bytes(row["bloom"]))
    return merged


def referential_violations(
    captions: "ray.data.Dataset",
    results: "ray.data.Dataset",
    bloom: Bloom,
    key: str = "caption_id",
    n_buckets: int = 32,
) -> pa.Table:
    """Violation rows (partition_id=-1, <key>, 'image_id.ref') for captions
    whose image_id has no decodable image.  Exact (see module doc)."""
    bloom_ref = ray.put(bloom.to_bytes())

    def tag_captions(batch: pa.Table) -> pa.Table:
        b = Bloom.from_bytes(ray.get(bloom_ref))
        ids = batch["image_id"]
        null_mask = ids.is_null().to_numpy(zero_copy_only=False)
        bucket = np.full(len(batch), -1, dtype=np.int64)
        valid = ~null_mask
        if valid.any():
            h = hash64(ids) % np.uint64(n_buckets)
            hit = b.contains(ids)  # nulls hash to something; masked below
            keep = valid & hit
            bucket[keep] = h.astype(np.int64)[keep]  # positives -> real bucket
        return pa.table(
            {
                "bucket": pa.array(bucket, type=pa.int64()),
                "image_id": ids,
                "side_key": batch[key],
            }
        )

    def tag_ids(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch["decodable"]) if "decodable" in batch.column_names else batch
        h = hash64(t["image_id"]) % np.uint64(n_buckets)
        return pa.table(
            {
                "bucket": pa.array(h.astype(np.int64), type=pa.int64()),
                "image_id": t["image_id"],
                "side_key": pa.nulls(t.num_rows, pa.string()),
            }
        )

    cols = [c for c in ("image_id", "decodable") if c in results.schema().names]
    left = captions.select_columns([key, "image_id"]).map_batches(tag_captions, batch_format="pyarrow")
    right = results.select_columns(cols).map_batches(tag_ids, batch_format="pyarrow")

    def per_bucket(group: pa.Table) -> pa.Table:
        is_cand = group["side_key"].is_valid().to_numpy(zero_copy_only=False)
        all_ids = np.asarray(group["image_id"].to_pylist(), dtype=object)
        cand_keys = np.asarray(group["side_key"].to_pylist(), dtype=object)[is_cand]
        cand_ids = all_ids[is_cand]
        valid_ids = set(all_ids[~is_cand])
        missing = [k for k, i in zip(cand_keys, cand_ids) if i not in valid_ids]
        return pa.table({"side_key": pa.array(missing, type=pa.string())})

    out = left.union(right).groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")
    bad_keys = sorted(r["side_key"] for r in out.take_all())
    return pa.table(
        {
            PARTITION_COL: pa.array([-1] * len(bad_keys), type=pa.int64()),
            key: pa.array(bad_keys, type=pa.string()),
            "constraint_id": pa.array([REF_CONSTRAINT] * len(bad_keys), type=pa.string()),
        }
    )
