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

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from rayval.functions.text import (
    batch_minhash_signatures,
    batch_simhash64,
    char_shingles,
    exact_jaccard,
)
from rayval.functions.phash import _popcount64
from rayval.state.hashing import hash64, rehash


# ------------------------------------------------------------- exact dedup
def exact_dup_members(ds: "ray.data.Dataset", text_col: str, key_col: str) -> pa.Table:
    """All members of exact-duplicate groups, keyed, each row carrying its
    group's representative ``grp`` = min(key) over the rows sharing its text.

    Texts are compared via the VECTORIZED 64-bit content hash
    (``state.hashing.hash64`` over raw Arrow string buffers) — the previous
    per-row ``hashlib.md5`` list comprehension was the one row-at-a-time
    Python loop in a hot path (at 10^12 docs it dominated the stage).  A
    2^-64 hash collision could merge two distinct texts' groups; negligible
    odds, and the SQL oracle (which groups by raw text) would flag it.

    Same no-shuffle shape as phash dedup: per-batch (hash, count, min-key)
    combiners -> tiny groupby over distinct hashes -> broadcast dup-map ->
    member filter + representative lookup."""
    from ray.data.aggregate import Min, Sum

    def add_hash(batch: pa.Table) -> pa.Table:
        # NULL text is excluded, matching SQL semantics (a NULL never
        # IN-matches / never groups) — fillna("") would silently group null
        # docs with empty-string docs and diverge from the oracle
        col = batch[text_col]
        batch = batch.filter(col.is_valid()) if col.null_count else batch
        txt = batch[text_col]
        txt = txt.combine_chunks() if isinstance(txt, pa.ChunkedArray) else txt
        # int64 VIEW of the uint64 hash: only equality matters here, and Ray's
        # aggregate round-trips uint64 group keys > 2^63 through Python ints
        # (pickled-object fallback that breaks the downstream groupby schema)
        return pa.table(
            {key_col: batch[key_col], "h": pa.array(hash64(txt).view(np.int64), type=pa.int64())}
        )

    # materialize: BOTH the count pass and the member pass consume this —
    # a lazy plan would re-run the read + hashing twice
    hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True).materialize()

    def partial(batch: pa.Table) -> pa.Table:
        # count_all, not (key, "count"): Arrow's keyed count skips NULL keys,
        # which would undercount a dup group containing a null-key member
        # below the n_total > 1 bar (SQL COUNT(*) semantics count the row)
        g = batch.group_by("h").aggregate([([], "count_all"), (key_col, "min")])
        return pa.table(
            {
                "h": g["h"],
                "n": pc.cast(g["count_all"], pa.int64()),
                "k": g[f"{key_col}_min"],
            }
        )

    counts = (
        hashed.map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum(on="n", alias_name="n_total"), Min(on="k", alias_name="grp"))
        .filter(expr="n_total > 1")
    )
    dup_rows = counts.take_all()
    key_type = dict(zip(ds.schema().names, ds.schema().types))[key_col]
    empty = pa.table({key_col: pa.array([], type=key_type), "grp": pa.array([], type=key_type)})
    if not dup_rows:
        return empty
    all_h = np.array([r["h"] for r in dup_rows], dtype=np.int64)
    order = np.argsort(all_h, kind="stable")
    dup_h = all_h[order]
    grp_by_h = np.array([r["grp"] for r in dup_rows], dtype=object)[order]
    ref = ray.put((dup_h, grp_by_h))

    def members(batch: pa.Table) -> pa.Table:
        dh, dg = ray.get(ref)
        hv = batch["h"].to_numpy(zero_copy_only=False)
        idx = np.minimum(np.searchsorted(dh, hv), len(dh) - 1)
        hit = dh[idx] == hv
        kept = batch.filter(pa.array(hit))
        return pa.table(
            {key_col: kept[key_col], "grp": pa.array(dg[idx[hit]], type=key_type)}
        )

    from rayval.util import collect_tables

    t = collect_tables(hashed.map_batches(members, batch_format="pyarrow"))
    return t if t.num_rows else empty


def keep_first_per_key(ds: "ray.data.Dataset", group_cols: list[str], key_col: str) -> "ray.data.Dataset":
    """Exact dedup keep-first: min(key) per group — hash-partition + per-group
    first (the canonical exact-dedup shape)."""
    return ds.groupby(group_cols).min(key_col)


# ----------------------------------------------------------- MinHash + LSH
def _sig_matrix(group: pa.Table, key_col: str, num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    """(keys: object[n], sigs: uint64[n, num_perm]) — signatures decoded from
    the binary column via its raw Arrow buffers (constant row width), no
    per-row frombuffer."""
    keys = group[key_col].to_numpy(zero_copy_only=False)
    arr = group["sig"]
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    n = len(arr)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32, count=n + 1 + arr.offset)[arr.offset :]
    flat = np.frombuffer(
        arr.buffers()[2], dtype=np.uint64, offset=int(offs[0]), count=n * num_perm
    )
    return keys, flat.reshape(n, num_perm)


def _bucket_pair_indices(keys: np.ndarray, sig_mat: np.ndarray, cap: int) -> tuple[np.ndarray, np.ndarray]:
    """Candidate pair indices (i, j) within one LSH band bucket, with
    keys[i] < keys[j], FULLY vectorized, with a hot-bucket guard:

    - bucket size <= cap: all pairs (upper triangle over key-sorted order).
    - bucket size >  cap (the 1%-duplicated-document skew case): O(b^2) is no
      longer acceptable, so (a) rows with IDENTICAL signatures — est_jaccard
      1.0, provably candidate dups — emit representative->member chain edges
      (same connected components as the full clique, b-1 edges instead of
      b^2/2); (b) one representative per distinct signature pairs all-vs-all
      only if the distinct count still fits the cap — a band bucket with
      cap+ DISTINCT signatures is degenerate (that band carries ~no
      information) and contributes no cross-signature candidates.
    """
    n = len(keys)
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    if n < 2:
        return empty
    if n <= cap:
        order = np.argsort(keys, kind="stable")
        iu, ju = np.triu_indices(n, k=1)
        i_idx, j_idx = order[iu], order[ju]
        neq = keys[i_idx] != keys[j_idx]
        return i_idx[neq], j_idx[neq]
    # hot bucket: group rows by identical signature (row-wise unique)
    _, inv = np.unique(sig_mat, axis=0, return_inverse=True)
    order2 = np.lexsort((keys, inv))  # by signature group, then key
    inv_s = inv[order2]
    starts = np.flatnonzero(np.r_[True, inv_s[1:] != inv_s[:-1]])
    run_lens = np.diff(np.r_[starts, n])
    run_ids = np.repeat(np.arange(len(starts)), run_lens)
    rep_for_row = order2[starts][run_ids]  # group representative (min key)
    chain_mask = rep_for_row != order2
    i_parts = [rep_for_row[chain_mask]]
    j_parts = [order2[chain_mask]]
    reps = order2[starts]
    if len(reps) <= cap:
        r_ord = reps[np.argsort(keys[reps], kind="stable")]
        iu, ju = np.triu_indices(len(r_ord), k=1)
        i_parts.append(r_ord[iu])
        j_parts.append(r_ord[ju])
    i_idx = np.concatenate(i_parts) if i_parts else empty[0]
    j_idx = np.concatenate(j_parts) if j_parts else empty[1]
    if not len(i_idx):
        return empty
    # enforce keys[i] < keys[j] and drop same-key self pairs
    swap = keys[i_idx] > keys[j_idx]
    i_idx[swap], j_idx[swap] = j_idx[swap], i_idx[swap].copy()
    neq = keys[i_idx] != keys[j_idx]
    return i_idx[neq], j_idx[neq]


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
    hot_cap: int = 256,
) -> pa.Table:
    """Candidate near-dup pairs (a, b, est_jaccard[, jaccard]) with a < b.

    shingle→minhash per doc (map_batches), explode to band rows, groupby band
    bucket, pair within bucket (vectorized; hot buckets guarded — see
    ``_bucket_pair_indices``), dedupe pairs, verify by signature Jaccard —
    and by exact shingle Jaccard when ``exact_threshold`` is set (texts for
    the small candidate set are broadcast via ``texts_for_verify``).
    """
    rows_per_band = num_perm // bands

    def sigs(batch: pa.Table) -> pa.Table:
        """Fully vectorized: batch MinHash signatures (one sliding-window
        sweep + reduceat, functions/text.py), band hashes via salted-rehash
        folding of each band's signature rows, band explosion via take."""
        texts = batch[text_col].to_pandas().fillna("")
        n = batch.num_rows
        sig_mat = batch_minhash_signatures(texts, num_perm=num_perm, k=shingle_k)
        # one 64-bit hash per (doc, band): fold the band's signature rows
        bh = np.zeros((n, bands), dtype=np.uint64)
        for b in range(bands):
            h = np.zeros(n, dtype=np.uint64)
            for j in range(rows_per_band):
                h = rehash(h ^ sig_mat[:, b * rows_per_band + j], 0xBADC0DE + j)
            bh[:, b] = h
        keys = batch[key_col]
        keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
        idx = pa.array(np.tile(np.arange(n, dtype=np.int64), bands))
        sig_bytes = sig_mat.tobytes()
        width = num_perm * 8
        offsets = pa.array(np.arange(n + 1, dtype=np.int32) * width)
        sig_arr = pa.Array.from_buffers(
            pa.binary(), n, [None, offsets.buffers()[1], pa.py_buffer(sig_bytes)]
        )
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(bands, dtype=np.int32), n)),
                "bh": pa.array(bh.T.reshape(-1).view(np.int64)),
                key_col: keys.take(idx),
                "sig": sig_arr.take(idx),
            }
        )

    exploded = ds.map_batches(sigs, batch_format="pyarrow", zero_copy_batch=True)

    def pairs(group: pa.Table) -> pa.Table:
        keys, sig_mat = _sig_matrix(group, key_col, num_perm)
        pair_i, pair_j = _bucket_pair_indices(keys, sig_mat, hot_cap)
        if not len(pair_i):
            return pa.table(
                {"a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
                 "est_jaccard": pa.array([], pa.float64())}
            )
        # vectorized estimate: fraction of agreeing permutations per pair
        est = (sig_mat[pair_i] == sig_mat[pair_j]).mean(axis=1)
        keep = est >= est_threshold
        pair_i, pair_j, est = pair_i[keep], pair_j[keep], est[keep]
        return pa.table(
            {
                "a": pa.array(keys[pair_i], type=pa.string()),
                "b": pa.array(keys[pair_j], type=pa.string()),
                "est_jaccard": pa.array(np.round(est, 6), type=pa.float64()),
            }
        )

    # pair dedup (a pair surfaces once per agreeing band) stays DISTRIBUTED:
    # groupby(a,b).min collapses duplicates before anything reaches the driver
    cand_t = _collect_dedup_pairs(
        exploded.groupby(["band", "bh"]).map_groups(pairs, batch_format="pyarrow"),
        value_col="est_jaccard",
    )
    if exact_threshold is None or texts_for_verify is None:
        # return the typed Arrow table as-is: a pandas round-trip would
        # re-infer EMPTY string columns as null type, breaking downstream
        # concat/write against the documented (string, string, float64) schema
        return cand_t
    df = cand_t.to_pandas()
    sh = {k: char_shingles(texts_for_verify.get(k, ""), shingle_k) for k in set(df.a) | set(df.b)}
    df["jaccard"] = [round(exact_jaccard(sh[a], sh[b]), 6) for a, b in zip(df.a, df.b)]
    df = df[df.jaccard >= exact_threshold].reset_index(drop=True)
    return pa.Table.from_pandas(
        df,
        schema=cand_t.schema.append(pa.field("jaccard", pa.float64())),
        preserve_index=False,
    )


def _collect_dedup_pairs(cand: "ray.data.Dataset", value_col: str, value_type=pa.float64()) -> pa.Table:
    """Distributed (a, b) dedup of candidate pairs (a pair surfaces once per
    agreeing band, with the SAME value each time, so min == any), then a
    driver collect of the small post-filter result sorted by (a, b)."""
    from rayval.util import collect_tables

    schema = pa.schema([("a", pa.string()), ("b", pa.string()), (value_col, value_type)])
    deduped = (
        cand.groupby(["a", "b"])
        .min(value_col)
        .map_batches(lambda b: b.rename_columns(["a", "b", value_col]), batch_format="pyarrow")
    )
    return collect_tables(deduped, schema).sort_by([("a", "ascending"), ("b", "ascending")])


# ------------------------------------------------------ duplicate grouping
def dup_groups_from_pairs(
    pairs: pa.Table, a_col: str = "a", b_col: str = "b", scale_threshold: int = 500_000
) -> pa.Table:
    """Connected components over candidate near-dup pairs -> (key, group)
    where ``group`` is the lexicographically-smallest member (the canonical
    keep-representative for dedup).

    Small pair sets (below ``scale_threshold``) use driver-side union-find;
    larger ones switch to :func:`dup_groups_propagate` — distributed
    iterative min-label propagation, each round a narrow shuffle — which
    produces the identical (key, group) table without holding the edge set
    on the driver.
    """
    if pairs.num_rows > scale_threshold:
        return dup_groups_propagate(ray.data.from_arrow(pairs), a_col=a_col, b_col=b_col)
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


def dup_groups_propagate(
    pairs: "ray.data.Dataset", a_col: str = "a", b_col: str = "b", max_iters: int = 64
) -> pa.Table:
    """Distributed connected components: iterative min-label propagation.

    Each round: (1) union(current labels, undirected edges) -> groupby(key)
    sends the node's label to every neighbor; (2) groupby(key) takes the min
    of own + incoming labels and flags whether it changed.  Labels only
    decrease, so the loop converges in <= diameter rounds; both steps are
    narrow (key, label) shuffles — nothing driver-sized.  Output matches
    driver union-find exactly: (key, group=min-reachable-key), sorted.

    Implementation note: a native ``Dataset.join`` formulation was tried and
    reverted — Ray 2.49's hash join raises ``ArrowInvalid: no match for key
    field`` when an aggregate upstream emits empty schema-less blocks (they
    bypass map_batches normalization), which groupby outputs do whenever
    partitions > distinct keys.  The union+groupby message-passing form has
    no such edge and shuffles the same narrow rows.
    """
    edges = pairs.map_batches(
        lambda b: pa.table(
            {
                "key": pa.concat_arrays(
                    [pc.cast(b[a_col], pa.string()).combine_chunks(),
                     pc.cast(b[b_col], pa.string()).combine_chunks()]
                ),
                "nbr": pa.concat_arrays(
                    [pc.cast(b[b_col], pa.string()).combine_chunks(),
                     pc.cast(b[a_col], pa.string()).combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    # initial labels: own key (nbr=null marks the label row in the union)
    labels = edges.map_batches(
        lambda b: pa.table({"key": b["key"], "label": b["key"]}), batch_format="pyarrow"
    ).groupby("key").min("label").map_batches(
        lambda b: b.rename_columns(["key", "label"]), batch_format="pyarrow"
    )

    def send(group: pa.Table) -> pa.Table:
        # group = one node's label row(s) (nbr null) + its outgoing edges
        nbrs = group["nbr"]
        lab_rows = group.filter(pc.is_null(nbrs))
        if lab_rows.num_rows == 0:  # isolated label row with no edges
            return pa.table({"key": pa.array([], pa.string()), "label": pa.array([], pa.string()),
                             "own": pa.array([], pa.int8())})
        label = pc.min_max(lab_rows["label"])["min"]
        edge_rows = group.filter(pc.is_valid(nbrs))
        n_out = edge_rows.num_rows
        return pa.table(
            {
                "key": pa.concat_arrays(
                    [edge_rows["nbr"].combine_chunks(), lab_rows["key"].combine_chunks().slice(0, 1)]
                ),
                "label": pa.array([label.as_py()] * (n_out + 1), type=pa.string()),
                "own": pa.array([0] * n_out + [1], type=pa.int8()),
            }
        )

    def reduce_min(group: pa.Table) -> pa.Table:
        mm = pc.min_max(group["label"])["min"]
        own_rows = group.filter(pc.equal(group["own"], pa.scalar(1, pa.int8())))
        old = pc.min_max(own_rows["label"])["min"] if own_rows.num_rows else None
        changed = old is None or old.as_py() != mm.as_py()
        return pa.table(
            {
                "key": group["key"].combine_chunks().slice(0, 1),
                "label": pa.array([mm.as_py()], type=pa.string()),
                "changed": pa.array([1 if changed else 0], type=pa.int64()),
            }
        )

    for _ in range(max_iters):
        tagged_labels = labels.map_batches(
            lambda b: pa.table(
                {"key": b["key"], "label": b["label"],
                 "nbr": pa.nulls(b.num_rows, pa.string())}
            ),
            batch_format="pyarrow",
        )
        tagged_edges = edges.map_batches(
            lambda b: pa.table(
                {"key": b["key"], "label": pa.nulls(b.num_rows, pa.string()), "nbr": b["nbr"]}
            ),
            batch_format="pyarrow",
        )
        msgs = tagged_labels.union(tagged_edges).groupby("key").map_groups(
            send, batch_format="pyarrow"
        )
        new_labels = msgs.groupby("key").map_groups(reduce_min, batch_format="pyarrow").materialize()
        n_changed = new_labels.sum("changed")
        labels = new_labels.select_columns(["key", "label"])
        if not n_changed:
            break
    else:
        # labels still moving after max_iters rounds (component diameter >
        # max_iters): silently returning would hand back WRONG group labels
        raise RuntimeError(
            f"dup_groups_propagate did not converge after {max_iters} rounds "
            f"({n_changed} labels still changing); raise max_iters — rounds "
            "needed = component diameter"
        )
    from rayval.util import collect_tables

    schema = pa.schema([("key", pa.string()), ("group", pa.string())])
    t = collect_tables(
        labels.map_batches(lambda b: b.rename_columns(["key", "group"]), batch_format="pyarrow"),
        schema,
    )
    return t.sort_by([("key", "ascending")])


# ----------------------------------------------------------------- SimHash
def simhash_neardups(
    ds: "ray.data.Dataset", text_col: str, key_col: str, max_hamming: int = 3,
    hot_cap: int = 256,
) -> pa.Table:
    """Pairs (a, b, hamming) with hamming(simhash) <= max_hamming, a < b.

    Bucketed by ``max_hamming + 1`` bit-bands (pigeonhole: a pair at distance
    <= max_hamming must agree on at least one band), so recall is exact for
    any ``max_hamming`` <= 63 — EXCEPT inside hot buckets: a band bucket with
    more than ``hot_cap`` DISTINCT signatures skips its cross-signature
    all-pairs step (see ``_bucket_pair_indices``), so a pair whose ONLY
    shared band is such a degenerate bucket is dropped.  That is the
    deliberate skew trade (O(b^2) on a hot band bucket is the scale killer);
    raise ``hot_cap`` to buy recall back.  The default 3 gives the classic
    4 x 16-bit scheme.  Per-bucket pairing is vectorized with the same
    hot-bucket guard as MinHash (identical-signature chains + capped
    representative pairing).
    """
    n_bands = max_hamming + 1
    band_bits = 64 // n_bands
    band_los = [b * band_bits for b in range(n_bands)]
    band_widths = [band_bits] * (n_bands - 1) + [64 - band_los[-1]]

    def sigs(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pandas().fillna("")
        keys = batch[key_col]
        n = batch.num_rows
        s = batch_simhash64(texts)
        u = s.view(np.uint64)
        bands_out, bh_out, key_idx = [], [], []
        for b in range(n_bands):
            mask = np.uint64((1 << band_widths[b]) - 1)
            bh = ((u >> np.uint64(band_los[b])) & mask).astype(np.int64)
            bands_out.append(np.full(n, b, dtype=np.int32))
            bh_out.append(bh)
            key_idx.append(np.arange(n))
        key_arr = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
        idx = pa.array(np.concatenate(key_idx), type=pa.int64())
        return pa.table(
            {
                "band": pa.array(np.concatenate(bands_out)),
                "bh": pa.array(np.concatenate(bh_out)),
                key_col: key_arr.take(idx),
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
        x = (s[i_idx] ^ s[j_idx]).view(np.uint64)
        d = _popcount64(x)
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
        ds.map_batches(sigs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band", "bh"])
        .map_groups(pairs, batch_format="pyarrow"),
        value_col="hamming",
        value_type=pa.int32(),
    )


# ------------------------------------------------ n-gram Jaccard near-dups
def ngram_jaccard_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 3,
    threshold_e6: int = 500_000,
    max_df: int = 64,
    hash_grams: bool = True,
    pair_buckets: int = 64,
) -> pa.Table:
    """EXACT word-n-gram Jaccard near-dup pairs via a distributed
    inverted-index join — the SQL-oracled complement to MinHash (which
    ESTIMATES the same quantity; reference has no dedup at all, this is
    engine-new training-data surface).

    Shape (scales): tokenize + per-doc DISTINCT n-grams fully vectorized in
    map_batches (ascii_lower -> RE2 split -> shifted-slice joins; each doc
    lives in exactly one input batch, so per-batch dedup is global); explode
    to (gram, key, n_doc_grams) rows bucketed by gram hash;
    ``groupby(bucket)`` — ``pair_buckets`` groups, NOT one per distinct gram
    (map_groups pays a per-group python call; millions of gram-groups cost
    more in dispatch than in work) — emits co-occurring pairs (a<b, na, nb)
    via ONE Arrow self-join per bucket; grams with df<2 contribute nothing,
    grams with df>``max_df`` are dropped (stop-phrase guard: a hot gram
    carries no near-dup signal but costs O(df^2) pairs — the skew bound); a
    second groupby counts each pair's intersection; jaccard =
    common/(na+nb-common) in exact int64 fixed-point (floor at 1e-6,
    association-free).  The only shuffles carry (bucket, gram, key, int) and
    (a, b, ints) — never text.  Size ``pair_buckets`` so one bucket's gram
    rows + its <= max_df-bounded join output fit a reducer.

    ``hash_grams=True`` (the DEFAULT — the 10^12-doc path): grams become
    uint64 polynomial hashes (``state.hashing.hash64``) BEFORE the shuffle,
    so the exchange moves fixed 8-byte keys instead of variable-length
    strings.  Collision note: a hash collision merges two distinct grams'
    posting lists — that can ADD candidate pairs, inflate a pair's
    ``n_common`` by one per colliding gram the pair shares, or (when the
    merged list's df crosses ``max_df``) DROP both real grams' pairs via the
    stop-phrase guard — each at 2^-64-per-gram-pair odds, negligible against
    10^12-doc gram volumes, and the output is asserted equal to the string
    path in tests.  ``hash_grams=False`` ships the gram strings themselves —
    the byte-exact DuckDB-oracle-parity mode (the oracle compares doc pairs,
    which match either way; the string mode exists so the gram-level
    intermediate can also be diffed against SQL when debugging).

    Input contract: ``key_col`` is UNIQUE per row (a document table's
    primary key).  A repeated key degrades gracefully — same-gram-group
    repeats are dropped as degenerate self-pairs below, but copies split
    across input blocks carry per-copy gram counts, so their pair rows
    won't merge; dedupe keys upstream (``keep_first_per_key``) if the
    source can repeat them.
    """
    key_type = ds.schema().base_schema.field(key_col).type
    gram_type = pa.int64() if hash_grams else pa.string()

    def grams(batch: pa.Table) -> pa.Table:
        t = doc_distinct_grams(batch, text_col, key_col, n, key_type, gram_type, hash_grams)
        # bucket by gram hash: the pair stage groups by BUCKET, not by gram —
        # Ray's map_groups pays a per-GROUP python call, and a corpus has
        # millions of distinct grams (43 s at 5k docs when every gram was its
        # own group) but only pair_buckets buckets; all of one gram's rows
        # share its bucket, so per-bucket df counts are global df counts
        hb = (hash64(t["gram"]) % np.uint64(pair_buckets)).astype(np.int64)
        return t.append_column("bucket", pa.array(hb))

    pair_empty = pa.table(
        {"a": pa.array([], key_type), "b": pa.array([], key_type),
         "na": pa.array([], pa.int64()), "nb": pa.array([], pa.int64())}
    )

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        # ONE vectorized pass for every gram in the bucket: df-filter via
        # value_counts (df<2 contributes nothing, df>max_df is the
        # stop-phrase/skew guard — dropped identically in the SQL oracle),
        # then one Arrow self-join on gram emits all co-occurrence pairs;
        # a<b both orders the pair and drops degenerate same-key self-pairs
        # (the unique-key contract in the docstring)
        if group.num_rows < 2:
            return pair_empty
        g = group["gram"].combine_chunks() if isinstance(group["gram"], pa.ChunkedArray) else group["gram"]
        vc = pc.value_counts(g)
        cnt = vc.field("counts")
        ok_vals = vc.field("values").filter(
            pc.and_(pc.greater_equal(cnt, 2), pc.less_equal(cnt, max_df))
        )
        if len(ok_vals) == 0:
            return pair_empty
        t = group.filter(pc.is_in(group["gram"], value_set=ok_vals))
        left = pa.table({"a": t[key_col], "gram": t["gram"], "na": t["n"]})
        right = pa.table({"b": t[key_col], "gram": t["gram"], "nb": t["n"]})
        j = left.join(right, keys="gram", join_type="inner")
        j = j.filter(pc.less(j["a"], j["b"]))
        return j.select(["a", "b", "na", "nb"])

    def finalize(b: pa.Table) -> pa.Table:
        b = b.rename_columns(["a", "b", "na", "nb", "n_common"])
        nc = b["n_common"].to_pandas().to_numpy(dtype=np.int64)
        na = b["na"].to_pandas().to_numpy(dtype=np.int64)
        nb = b["nb"].to_pandas().to_numpy(dtype=np.int64)
        nu = na + nb - nc
        keep = 1_000_000 * nc >= threshold_e6 * nu
        t = b.filter(pa.array(keep))
        return pa.table(
            {"a": t["a"], "b": t["b"],
             "n_common": pa.array(nc[keep]),
             "n_union": pa.array(nu[keep]),
             "jac_e6": pa.array((1_000_000 * nc[keep]) // nu[keep])}
        )

    from rayval.util import collect_tables

    out = (
        ds.map_batches(grams, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
        # (na, nb) are functions of (a, b): grouping on all four keeps the
        # sizes without a join; count() is the intersection size
        .groupby(["a", "b", "na", "nb"])
        .count()
        .map_batches(finalize, batch_format="pyarrow")
    )
    schema = pa.schema(
        [("a", key_type), ("b", key_type), ("n_common", pa.int64()),
         ("n_union", pa.int64()), ("jac_e6", pa.int64())]
    )
    return collect_tables(out, schema).sort_by([("a", "ascending"), ("b", "ascending")])

def doc_distinct_grams(
    batch: pa.Table,
    text_col: str,
    key_col: str,
    n: int,
    key_type,
    gram_type,
    hash_grams: bool,
) -> pa.Table:
    """Per-doc DISTINCT word-n-grams of one batch, fully vectorized —
    (key, gram, n_doc_grams) rows; the extraction primitive shared by the
    exact-Jaccard join and the decontamination check, built on the ONE
    tokenizer every word-n-gram op uses (functions/text.token_stream —
    identical to the DuckDB oracles)."""
    from rayval.functions.text import gram_windows, token_stream

    empty = pa.table(
        {key_col: pa.array([], key_type), "gram": pa.array([], gram_type),
         "n": pa.array([], pa.int64())}
    )
    flat, p = token_stream(batch[text_col])
    gram, par = gram_windows(flat, p, n)
    if gram is None:
        return empty
    if hash_grams:
        gram = pa.array(hash64(gram).view(np.int64))
    keys = batch[key_col].take(pa.array(par))
    df = pd.DataFrame({key_col: keys.to_pandas(), "gram": gram.to_pandas()}).drop_duplicates()
    nn = df.groupby(key_col)["gram"].transform("size").to_numpy(dtype=np.int64)
    return pa.table(
        {key_col: pa.array(df[key_col].to_numpy(), type=key_type),
         "gram": pa.array(df["gram"].to_numpy(), type=gram_type),
         "n": pa.array(nn)}
    )


def contaminated_docs(
    ds: "ray.data.Dataset",
    text_col: str,
    key_col: str,
    bench_texts: list,
    n: int = 3,
) -> pa.Table:
    """Test-set DECONTAMINATION check: which corpus docs share a word-n-gram
    with any benchmark text — the standard pre-training hygiene pass (flag,
    then drop or audit, training docs that contain evaluation data).

    Shape (scales): the benchmark side is SMALL by definition (an eval set),
    so its distinct gram-hash set is computed driver-side with the same
    vectorized extraction and broadcast ONCE via ``ray.put``; the corpus
    streams through one map_batches that counts each doc's distinct-gram
    hits against the set — no shuffle at all, corpus text never moves.
    Output: (key, n_hits) for hit docs, n_hits = #distinct shared grams
    (uint64 gram hashes; a 2^-64-scale collision could inflate a count).

    Returns a driver Table (hit-docs-sized — contamination is rare by
    construction; at wholesale contamination sizes, wrap the same map in a
    streaming filter instead of collecting)."""
    from rayval.util import collect_tables

    key_type = ds.schema().base_schema.field(key_col).type
    bench_tbl = pa.table({"k": pa.array(np.arange(len(bench_texts)), type=pa.int64()),
                          "t": pa.array(list(bench_texts), type=pa.string())})
    bench_grams = doc_distinct_grams(bench_tbl, "t", "k", n, pa.int64(), pa.int64(), True)
    gram_set = pa.compute.unique(bench_grams["gram"].combine_chunks())
    set_ref = ray.put(gram_set)

    def hits(batch: pa.Table) -> pa.Table:
        g = doc_distinct_grams(batch, text_col, key_col, n, key_type, pa.int64(), True)
        if g.num_rows == 0:
            return pa.table({key_col: pa.array([], key_type), "n_hits": pa.array([], pa.int64())})
        hit = g.filter(pc.fill_null(pc.is_in(g["gram"], value_set=ray.get(set_ref)), False))
        if hit.num_rows == 0:
            return pa.table({key_col: pa.array([], key_type), "n_hits": pa.array([], pa.int64())})
        agg = pa.table({key_col: hit[key_col]}).group_by(key_col).aggregate([([], "count_all")])
        return pa.table({key_col: agg[key_col],
                         "n_hits": pc.cast(agg["count_all"], pa.int64())})

    out = ds.map_batches(hits, batch_format="pyarrow", zero_copy_batch=True)
    schema = pa.schema([(key_col, key_type), ("n_hits", pa.int64())])
    return collect_tables(out, schema).sort_by(key_col)
