"""Referential integrity + caption fidelity: every caption row must resolve
to a DECODABLE image (north_star), and the caption text must BYTE-EQUAL the
image row's caption (input_hint per-row fidelity).  One pass over captions,
one hash-partitioned exchange, implementing the north_rule's "broadcast
Bloom-filter join with explicit hash-partitioned shuffle":

1. build — per-batch partial Bloom filters over decodable image_ids
   (map_batches emits one serialized partial per batch), OR-merged small-side
   on the driver, broadcast once via ``ray.put``.
2. probe+tag — captions stream through map_batches; each row gets
   ``bucket = hash64(image_id) % B``.  Rows whose id is NOT in the Bloom (or
   is null) are DEFINITE violations (Bloom has no false negatives) — they are
   routed to the degenerate bucket -1, skipping the real shuffle work.
   Bloom-POSITIVE rows may be false positives, so they shuffle to their hash
   bucket for exact verification.
3. exact verify — the decodable image rows (narrow: id + caption) are tagged
   with the same bucket hash; ``groupby(bucket).map_groups`` anti-joins
   caption candidates against the ids per bucket (bucket -1 has no right
   side, so its rows all come out violations — no special casing) AND
   byte-compares captions for resolved rows (``caption.fidelity``).

Payload bytes never move; only (bucket, image_id, key, caption) shuffles.
The result is EXACT: bloom false positives are caught by the join; bloom
negatives are provably dangling.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray

from rayval.constraints.profile import PARTITION_COL
from rayval.state import Bloom, hash64

REF_CONSTRAINT = "image_id.ref"
FIDELITY_CONSTRAINT = "caption.fidelity"


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
    compare_col: Optional[str] = None,
) -> pa.Table:
    """Violation rows (partition_id=-1, <key>, constraint_id) — 'image_id.ref'
    for unresolvable captions, plus 'caption.fidelity' for resolved rows whose
    ``compare_col`` differs between the caption row and the image row."""
    bloom_ref = ray.put(bloom.to_bytes())
    cap_cols = [key, "image_id"] + ([compare_col] if compare_col else [])
    res_cols = [c for c in ["image_id", "decodable"] if c in results.schema().names]
    if compare_col and compare_col in results.schema().names:
        res_cols.append(compare_col)

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
        out = {
            "bucket": pa.array(bucket, type=pa.int64()),
            "image_id": ids,
            "side_key": batch[key],
        }
        if compare_col:
            out["cmp"] = batch[compare_col]
        return pa.table(out)

    def tag_ids(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch["decodable"]) if "decodable" in batch.column_names else batch
        h = hash64(t["image_id"]) % np.uint64(n_buckets)
        out = {
            "bucket": pa.array(h.astype(np.int64), type=pa.int64()),
            "image_id": t["image_id"],
            "side_key": pa.nulls(t.num_rows, pa.string()),
        }
        if compare_col:
            out["cmp"] = t[compare_col] if compare_col in t.column_names else pa.nulls(t.num_rows, pa.string())
        return pa.table(out)

    left = captions.select_columns(cap_cols).map_batches(tag_captions, batch_format="pyarrow")
    right = results.select_columns(res_cols).map_batches(tag_ids, batch_format="pyarrow")

    def per_bucket(group: pa.Table) -> pa.Table:
        is_cand = group["side_key"].is_valid().to_numpy(zero_copy_only=False)
        all_ids = np.asarray(group["image_id"].to_pylist(), dtype=object)
        cand_keys = np.asarray(group["side_key"].to_pylist(), dtype=object)[is_cand]
        cand_ids = all_ids[is_cand]
        bad_keys: list = []
        bad_cids: list = []
        if compare_col:
            cmps = np.asarray(group["cmp"].to_pylist(), dtype=object)
            valid_caption = dict(zip(all_ids[~is_cand], cmps[~is_cand]))
            cand_cmp = cmps[is_cand]
            for k, i, c in zip(cand_keys, cand_ids, cand_cmp):
                if i not in valid_caption:
                    bad_keys.append(k)
                    bad_cids.append(REF_CONSTRAINT)
                elif c != valid_caption[i]:
                    bad_keys.append(k)
                    bad_cids.append(FIDELITY_CONSTRAINT)
        else:
            valid_ids = set(all_ids[~is_cand])
            for k, i in zip(cand_keys, cand_ids):
                if i not in valid_ids:
                    bad_keys.append(k)
                    bad_cids.append(REF_CONSTRAINT)
        return pa.table(
            {
                "side_key": pa.array(bad_keys, type=pa.string()),
                "cid": pa.array(bad_cids, type=pa.string()),
            }
        )

    out = left.union(right).groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")
    rows = sorted(((r["side_key"], r["cid"]) for r in out.take_all()))
    return pa.table(
        {
            PARTITION_COL: pa.array([-1] * len(rows), type=pa.int64()),
            key: pa.array([k for k, _ in rows], type=pa.string()),
            "constraint_id": pa.array([c for _, c in rows], type=pa.string()),
        }
    )
