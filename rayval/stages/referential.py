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

Payload bytes never move; only (bucket, image_id, key, caption) shuffles —
and they shuffle PACKED: each batch emits one Arrow-IPC blob row per touched
bucket instead of one exchange row per caption/id, so the groupby machinery
sorts thousands of blob rows rather than the full row count (the same
blob-bucketed exchange as ``dedup.dup_counts_and_top_bucketed``; measured
~2-4x cheaper for identical bytes at 250k rows).  The reducer-side memory
assumption is unchanged: one bucket's candidates + ids fit one reducer,
whether they arrive as rows or as blobs.

The result is EXACT: bloom false positives are caught by the join; bloom
negatives are provably dangling.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from rayval.constraints.profile import PARTITION_COL
from rayval.state import Bloom, ShardedBloom, bloom_from_bytes, hash64
from rayval.state.bloom import shard_probe_hash

REF_CONSTRAINT = "image_id.ref"
FIDELITY_CONSTRAINT = "caption.fidelity"

_SHARD_PARTIAL_SCHEMA = pa.schema([("shard", pa.int64()), ("blob", pa.binary())])


def build_bloom(
    results: "ray.data.Dataset", n_expected: int, fpp: float = 0.01, n_shards: int = 32
) -> ShardedBloom:
    """Distributed SHARDED Bloom build over decodable image_ids.

    Each batch emits one (shard, blob) row per shard its rows hash to, with
    every shard sized ``n_expected / n_shards`` — per-batch blob volume is
    bounded by the batch's bucket spread, never by ``n_expected`` (a
    monolithic partial at the target 10^12 keys / 1% fpp is ~1.2 TB: neither
    buildable per batch nor broadcastable).  A ``groupby(shard)`` fan-in
    OR-merges each shard's partials in its own reducer; the probe side
    (:func:`referential_violations_ds`) re-broadcasts shard-by-shard, so at
    scale no single process ever holds the whole filter — size ``n_shards``
    (= the join's ``n_buckets``) so one shard ~ tens of MB.

    The driver-side assembly below is the small-scale convenience terminal;
    the per-shard blobs are the unit of persistence/broadcast throughout."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch["decodable"]) if "decodable" in batch.column_names else batch
        sb = ShardedBloom(n_expected, fpp, n_shards=n_shards)
        if t.num_rows:
            sb.add(t["image_id"])
        blobs = sb.shard_blobs()
        return pa.table(
            {
                "shard": pa.array(sorted(blobs), type=pa.int64()),
                "blob": pa.array([blobs[s] for s in sorted(blobs)], type=pa.binary()),
            }
        )

    def merge_shard(group: pa.Table) -> pa.Table:
        m = None
        for blob in group["blob"]:
            b = Bloom.from_bytes(blob.as_py())
            m = b if m is None else m.merge(b)
        return pa.table(
            {
                "shard": group["shard"].combine_chunks().slice(0, 1),
                "blob": pa.array([m.to_bytes()], type=pa.binary()),
            }
        )

    cols = [c for c in ("image_id", "decodable") if c in results.schema().names]
    rows = (
        results.select_columns(cols)
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(merge_shard, batch_format="pyarrow")
        .take_all()
    )
    out = ShardedBloom(n_expected, fpp, n_shards=n_shards)
    for r in rows:
        out.shards[int(r["shard"])] = Bloom.from_bytes(r["blob"])
    return out


def referential_violations_ds(
    captions: "ray.data.Dataset",
    results: "ray.data.Dataset",
    bloom: Bloom,
    key: str = "caption_id",
    n_buckets: int = 32,
    compare_col: Optional[str] = None,
) -> "ray.data.Dataset":
    """Violation rows (partition_id=-1, <key>, constraint_id) as a streaming
    Dataset — 'image_id.ref' for unresolvable captions, plus
    'caption.fidelity' for resolved rows whose ``compare_col`` differs between
    the caption row and the image row.

    Scale notes: the per-bucket exact verify is fully vectorized (one Arrow
    hash-join + is_in per bucket, no per-row Python); size ``n_buckets`` so a
    bucket's candidates + reference ids fit one reducer's heap (rule of thumb:
    ``n_buckets ~ total_rows / 5M``, min 32).

    Bloom broadcast: a :class:`ShardedBloom` whose ``n_shards == n_buckets``
    (the :func:`build_bloom` product) is ``ray.put`` SHARD BY SHARD — each
    probe task fetches only the shards its rows' buckets name, so at 10^12
    keys no task ever holds the full filter.  A flat ``Bloom`` (small side)
    broadcasts whole, as before."""
    sharded = isinstance(bloom, ShardedBloom) and bloom.n_shards == n_buckets
    if sharded:
        shard_refs = {sid: ray.put(blob) for sid, blob in bloom.shard_blobs().items()}
        bloom_ref = None
    else:
        shard_refs = None
        bloom_ref = ray.put(bloom.to_bytes())
    cap_cols = [key, "image_id"] + ([compare_col] if compare_col else [])
    res_cols = [c for c in ["image_id", "decodable"] if c in results.schema().names]
    if compare_col and compare_col in results.schema().names:
        res_cols.append(compare_col)

    def _pack_by_bucket(t: pa.Table, bucket: np.ndarray) -> pa.Table:
        """One (bucket, blob) row per touched bucket: the bucket's rows of
        ``t`` serialized as one Arrow IPC stream — the exchange unit."""
        order = np.argsort(bucket, kind="stable")
        t = t.take(pa.array(order))
        ids, starts = np.unique(bucket[order], return_index=True)
        bounds = np.append(starts, t.num_rows)
        blobs = []
        for a, b in zip(bounds[:-1], bounds[1:]):
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, t.schema) as w:
                w.write_table(t.slice(a, b - a))
            blobs.append(sink.getvalue().to_pybytes())
        return pa.table(
            {"bucket": pa.array(ids, type=pa.int64()), "blob": pa.array(blobs, type=pa.binary())}
        )

    def tag_captions(batch: pa.Table) -> pa.Table:
        ids = batch["image_id"]
        null_mask = ids.is_null().to_numpy(zero_copy_only=False)
        bucket = np.full(len(batch), -1, dtype=np.int64)
        valid = ~null_mask
        if valid.any():
            h = hash64(ids)
            hb = (h % np.uint64(n_buckets)).astype(np.int64)
            if shard_refs is not None:
                # per-shard probe: fetch ONLY the shards this batch's buckets
                # name (plasma-cached across batches on the same worker)
                hit = np.zeros(len(batch), dtype=bool)
                hh = shard_probe_hash(h)
                for sid in np.unique(hb[valid]):
                    ref = shard_refs.get(int(sid))
                    if ref is None:
                        continue  # empty shard: no members, definite miss
                    shard = Bloom.from_bytes(ray.get(ref), writable=False)
                    m = valid & (hb == sid)
                    hit[m] = shard.contains_hashed(hh[m])
            else:
                b = bloom_from_bytes(ray.get(bloom_ref))
                hit = b.contains(ids)  # nulls hash to something; masked below
            keep = valid & hit
            bucket[keep] = hb[keep]  # positives -> real bucket
        out = {
            "image_id": ids,
            "side_key": batch[key],
        }
        if compare_col:
            out["cmp"] = batch[compare_col]
        return _pack_by_bucket(pa.table(out), bucket)

    def tag_ids(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch["decodable"]) if "decodable" in batch.column_names else batch
        h = hash64(t["image_id"]) % np.uint64(n_buckets)
        out = {
            "image_id": t["image_id"],
            "side_key": pa.nulls(t.num_rows, pa.string()),
        }
        if compare_col:
            out["cmp"] = t[compare_col] if compare_col in t.column_names else pa.nulls(t.num_rows, pa.string())
        return _pack_by_bucket(pa.table(out), h.astype(np.int64))

    left = captions.select_columns(cap_cols).map_batches(tag_captions, batch_format="pyarrow")
    right = results.select_columns(res_cols).map_batches(tag_ids, batch_format="pyarrow")

    empty = pa.table({"side_key": pa.array([], pa.string()), "cid": pa.array([], pa.string())})

    def per_bucket(blob_group: pa.Table) -> pa.Table:
        # unpack this bucket's IPC blobs (caption candidates + reference ids
        # interleaved — distinguished by side_key validity), then run the
        # vectorized exact verify: Arrow is_in (no-compare path) or one Arrow
        # hash-join per bucket (compare path) — no per-row Python anywhere.
        parts = [
            pa.ipc.open_stream(pa.BufferReader(blob.as_py())).read_all()
            for blob in blob_group["blob"]
        ]
        group = pa.concat_tables(parts) if parts else empty
        if group.num_rows == 0:
            return empty
        is_cand = group["side_key"].is_valid()
        cand = group.filter(is_cand)
        if cand.num_rows == 0:
            return empty
        ref = group.filter(pc.invert(is_cand))
        if not compare_col:
            miss = pc.invert(pc.is_in(cand["image_id"], value_set=ref["image_id"].combine_chunks()))
            bad = cand.filter(pc.fill_null(miss, True))
            return pa.table(
                {
                    "side_key": bad["side_key"],
                    "cid": pa.array([REF_CONSTRAINT] * bad.num_rows, type=pa.string()),
                }
            )
        # dedupe the reference side per image_id (deterministic: min caption
        # wins on duplicate decodable ids) + a presence marker so a null
        # reference caption still counts as resolved
        ref_tbl = (
            pa.table({"image_id": ref["image_id"], "ref_cmp": ref["cmp"]})
            .group_by("image_id")
            .aggregate([("ref_cmp", "min")])
        )
        ref_tbl = pa.table(
            {
                "image_id": ref_tbl["image_id"],
                "ref_cmp_min": ref_tbl["ref_cmp_min"],
                "present": pa.array(np.ones(ref_tbl.num_rows, dtype=np.int8)),
            }
        )
        cand_tbl = pa.table(
            {"side_key": cand["side_key"], "image_id": cand["image_id"], "cmp": cand["cmp"]}
        )
        joined = cand_tbl.join(ref_tbl, keys="image_id", join_type="left outer")
        present = pc.fill_null(pc.equal(joined["present"], pa.scalar(1, pa.int8())), False)
        eq = pc.equal(joined["cmp"], joined["ref_cmp_min"])
        both_null = pc.and_(pc.is_null(joined["cmp"]), pc.is_null(joined["ref_cmp_min"]))
        equal_total = pc.or_(pc.fill_null(eq, False), both_null)
        bad_miss = joined.filter(pc.invert(present))
        bad_mm = joined.filter(pc.and_(present, pc.invert(equal_total)))
        return pa.table(
            {
                "side_key": pa.concat_arrays(
                    [bad_miss["side_key"].combine_chunks(), bad_mm["side_key"].combine_chunks()]
                ),
                "cid": pa.array(
                    [REF_CONSTRAINT] * bad_miss.num_rows + [FIDELITY_CONSTRAINT] * bad_mm.num_rows,
                    type=pa.string(),
                ),
            }
        )

    out = left.union(right).groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                PARTITION_COL: pa.array(np.full(batch.num_rows, -1, dtype=np.int64)),
                key: batch["side_key"],
                "constraint_id": batch["cid"],
            }
        )

    return out.map_batches(finalize, batch_format="pyarrow")


def referential_violations(
    captions: "ray.data.Dataset",
    results: "ray.data.Dataset",
    bloom: Bloom,
    key: str = "caption_id",
    n_buckets: int = 32,
    compare_col: Optional[str] = None,
) -> pa.Table:
    """Driver-side convenience: collect the (violation-sized, small) output of
    :func:`referential_violations_ds` into one sorted Table."""
    from rayval.util import collect_tables

    ds = referential_violations_ds(
        captions, results, bloom, key=key, n_buckets=n_buckets, compare_col=compare_col
    )
    schema = pa.schema(
        [(PARTITION_COL, pa.int64()), (key, pa.string()), ("constraint_id", pa.string())]
    )
    t = collect_tables(ds, schema)
    return t.sort_by([(key, "ascending"), ("constraint_id", "ascending")])
