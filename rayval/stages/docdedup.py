"""Document deduplication operators over a text table — exact, MinHash+LSH,
SimHash, n-gram-Jaccard-verified — shaped for Ray Data:

- exact: content-hash per batch (vectorized) → the same partial-count +
  broadcast-member pattern as phash dedup (stages/dedup.py): no row shuffle.
- MinHash+LSH: shingle→minhash per doc in map_batches → explode to
  (band_id, band_hash, doc_id, signature) rows → groupby the band key →
  candidate pairs within buckets → verify by signature (or exact shingle)
  Jaccard.  The only shuffle carries (band keys + signatures), never text.
- SimHash: 64-bit signature per doc; near-dups = pairs at hamming distance
  <= d, bucketed by the 4 16-bit bands (any pair within distance 3 shares at
  least one band by pigeonhole).
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from rayval.functions.text import (
    char_shingles,
    exact_jaccard,
    minhash_jaccard,
    minhash_signature,
    simhash64,
)
from rayval.functions.phash import _popcount64


# ------------------------------------------------------------- exact dedup
def exact_dup_members(ds: "ray.data.Dataset", text_col: str, key_col: str) -> pa.Table:
    """All members of exact-duplicate groups (md5 of raw text), keyed.
    Same no-shuffle shape as phash dedup: partial counts -> tiny groupby ->
    broadcast dup-set -> member filter."""

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pandas().fillna("")
        h = np.array([hashlib.md5(s.encode()).hexdigest() for s in texts], dtype=object)
        return pa.table({key_col: batch[key_col], "h": pa.array(h, type=pa.string())})

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)

    def partial(batch: pa.Table) -> pa.Table:
        vals, counts = np.unique(np.asarray(batch["h"].to_pylist(), dtype=object), return_counts=True)
        return pa.table({"h": pa.array(vals, type=pa.string()), "n": pa.array(counts, type=pa.int64())})

    counts = hashed.map_batches(partial, batch_format="pyarrow").groupby("h").sum("n")
    dup = counts.filter(lambda r: r["sum(n)"] > 1).take_all()
    dup_set = {r["h"] for r in dup}
    key_type = dict(zip(ds.schema().names, ds.schema().types))[key_col]
    empty = pa.table({key_col: pa.array([], type=key_type), "h": pa.array([], type=pa.string())})
    if not dup_set:
        return empty
    ref = ray.put(dup_set)

    def members(batch: pa.Table) -> pa.Table:
        ds_ = ray.get(ref)
        mask = np.array([h in ds_ for h in batch["h"].to_pylist()])
        return batch.filter(pa.array(mask))

    refs = hashed.map_batches(members, batch_format="pyarrow").to_arrow_refs()
    tables = [t for t in map(ray.get, refs) if t.num_rows]
    return pa.concat_tables(tables) if tables else empty


def keep_first_per_key(ds: "ray.data.Dataset", group_cols: list[str], key_col: str) -> "ray.data.Dataset":
    """Exact dedup keep-first: min(key) per group — hash-partition + per-group
    first (the canonical exact-dedup shape)."""
    return ds.groupby(group_cols).min(key_col)


# ----------------------------------------------------------- MinHash + LSH
def minhash_lsh_candidates(
    ds: "ray.data.Dataset",
    text_col: str,
    key_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    est_threshold: float = 0.5,
    texts_for_verify: Optional[dict] = None,
    exact_threshold: Optional[float] = None,
) -> pa.Table:
    """Candidate near-dup pairs (a, b, est_jaccard[, jaccard]) with a < b.

    shingle→minhash per doc (map_batches), explode to band rows, groupby band
    bucket, pair within bucket, dedupe pairs, verify by signature Jaccard —
    and by exact shingle Jaccard when ``exact_threshold`` is set (texts for
    the small candidate set are broadcast via ``texts_for_verify``).
    """
    rows_per_band = num_perm // bands

    def sigs(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pandas().fillna("")
        keys = batch[key_col].to_pylist()
        band_key, band_hash, doc, sig_col = [], [], [], []
        for k, t in zip(keys, texts):
            sig = minhash_signature(char_shingles(t, shingle_k), num_perm)
            rows = sig.reshape(bands, rows_per_band)
            for b in range(bands):
                digest = hashlib.blake2b(rows[b].tobytes(), digest_size=8).digest()
                band_key.append(b)
                band_hash.append(int.from_bytes(digest, "little", signed=True))
                doc.append(k)
                sig_col.append(sig.tobytes())
        return pa.table(
            {
                "band": pa.array(band_key, type=pa.int32()),
                "bh": pa.array(band_hash, type=pa.int64()),
                key_col: pa.array(doc, type=pa.string()),
                "sig": pa.array(sig_col, type=pa.binary()),
            }
        )

    exploded = ds.map_batches(sigs, batch_format="pyarrow", zero_copy_batch=True)

    def pairs(group: pa.Table) -> pa.Table:
        keys = group[key_col].to_pylist()
        sigs_ = [np.frombuffer(b.as_py(), dtype=np.uint64) for b in group["sig"]]
        out_a, out_b, out_j = [], [], []
        order = np.argsort(np.asarray(keys, dtype=object), kind="stable")
        for ii in range(len(order)):
            for jj in range(ii + 1, len(order)):
                a, b = order[ii], order[jj]
                if keys[a] == keys[b]:
                    continue
                j = minhash_jaccard(sigs_[a], sigs_[b])
                if j >= est_threshold:
                    out_a.append(keys[a])
                    out_b.append(keys[b])
                    out_j.append(round(j, 6))
        return pa.table(
            {
                "a": pa.array(out_a, type=pa.string()),
                "b": pa.array(out_b, type=pa.string()),
                "est_jaccard": pa.array(out_j, type=pa.float64()),
            }
        )

    cand = exploded.groupby(["band", "bh"]).map_groups(pairs, batch_format="pyarrow").take_all()
    if not cand:
        return pa.table({"a": pa.array([], type=pa.string()), "b": pa.array([], type=pa.string()),
                         "est_jaccard": pa.array([], type=pa.float64())})
    df = pd.DataFrame(cand).drop_duplicates(["a", "b"]).sort_values(["a", "b"]).reset_index(drop=True)
    if exact_threshold is not None and texts_for_verify is not None:
        sh = {k: char_shingles(texts_for_verify.get(k, ""), shingle_k) for k in set(df.a) | set(df.b)}
        df["jaccard"] = [round(exact_jaccard(sh[a], sh[b]), 6) for a, b in zip(df.a, df.b)]
        df = df[df.jaccard >= exact_threshold].reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


# ------------------------------------------------------ duplicate grouping
def dup_groups_from_pairs(pairs: pa.Table, a_col: str = "a", b_col: str = "b") -> pa.Table:
    """Connected components over candidate near-dup pairs -> (key, group)
    where ``group`` is the lexicographically-smallest member (the canonical
    keep-representative for dedup).

    Driver-side union-find — valid while the candidate-PAIR set is small
    (pairs are already the filtered output of LSH + verify, a tiny fraction
    of the corpus).  The scale path is iterative min-label propagation:
    repeat (groupby key -> min(label) -> join back) until fixpoint, each
    round a narrow shuffle; same result, no driver materialization.
    """
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx == ry:
            return
        lo, hi = (rx, ry) if str(rx) <= str(ry) else (ry, rx)
        parent[hi] = lo

    a_vals = pairs[a_col].to_pylist()
    b_vals = pairs[b_col].to_pylist()
    for x, y in zip(a_vals, b_vals):
        parent.setdefault(x, x)
        parent.setdefault(y, y)
        union(x, y)
    keys = sorted(parent, key=str)
    return pa.table(
        {
            "key": pa.array([str(k) for k in keys], type=pa.string()),
            "group": pa.array([str(find(k)) for k in keys], type=pa.string()),
        }
    )


# ----------------------------------------------------------------- SimHash
def simhash_neardups(
    ds: "ray.data.Dataset", text_col: str, key_col: str, max_hamming: int = 3
) -> pa.Table:
    """Pairs (a, b, hamming) with hamming(simhash) <= max_hamming, a < b.
    Bucketed by the 4 16-bit bands (pigeonhole: distance<=3 pairs share one)."""

    def sigs(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pandas().fillna("")
        keys = batch[key_col].to_pylist()
        band, bh, doc, sig = [], [], [], []
        for k, t in zip(keys, texts):
            s = simhash64(t)
            u = np.uint64(np.int64(s).astype(np.uint64))
            for b in range(4):
                band.append(b)
                bh.append(int((u >> np.uint64(16 * b)) & np.uint64(0xFFFF)))
                doc.append(k)
                sig.append(s)
        return pa.table(
            {
                "band": pa.array(band, type=pa.int32()),
                "bh": pa.array(bh, type=pa.int32()),
                key_col: pa.array(doc, type=pa.string()),
                "sig": pa.array(sig, type=pa.int64()),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        keys = group[key_col].to_pylist()
        s = group["sig"].to_numpy(zero_copy_only=False)
        out_a, out_b, out_h = [], [], []
        order = np.argsort(np.asarray(keys, dtype=object), kind="stable")
        for ii in range(len(order)):
            for jj in range(ii + 1, len(order)):
                a, b = order[ii], order[jj]
                if keys[a] == keys[b]:
                    continue
                d = int(_popcount64(np.array([np.int64(s[a]) ^ np.int64(s[b])]).view(np.uint64))[0])
                if d <= 3:
                    out_a.append(keys[a])
                    out_b.append(keys[b])
                    out_h.append(d)
        return pa.table(
            {
                "a": pa.array(out_a, type=pa.string()),
                "b": pa.array(out_b, type=pa.string()),
                "hamming": pa.array(out_h, type=pa.int32()),
            }
        )

    cand = (
        ds.map_batches(sigs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band", "bh"])
        .map_groups(pairs, batch_format="pyarrow")
        .take_all()
    )
    if not cand:
        return pa.table({"a": pa.array([], type=pa.string()), "b": pa.array([], type=pa.string()),
                         "hamming": pa.array([], type=pa.int32())})
    df = pd.DataFrame(cand).drop_duplicates(["a", "b"]).sort_values(["a", "b"]).reset_index(drop=True)
    df = df[df.hamming <= max_hamming].reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)
