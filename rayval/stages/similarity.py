"""Similarity search over an embedding column (list<float>).

- ``brute_topk``: exact cosine top-k — the baseline.  Query matrix is
  broadcast ONCE (``ray.put``); each batch does one numpy matmul and emits
  its local top-k per query (a per-batch combiner), so the final reduce sees
  only ``k × num_batches`` rows per query instead of the whole table.
- ``lsh_topk``: the scale path — random-hyperplane (SimHash-for-vectors)
  bucketing: candidates come only from the query's bucket (probing
  multi-bucket neighbors), then exact cosine re-rank.  Recall/speed trade
  documented; partitioning assumption: bucket histogram fits on the driver.
- ``embedding_neardups``: all pairs with cosine >= threshold — per-batch
  matmul against the broadcast (normalized) matrix.  The broadcast-matrix
  assumption (whole embedding table fits in the object store) is the
  documented small-side condition; beyond that, use lsh bucketing per pair
  candidate generation exactly like MinHash-LSH in docdedup.py.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray


def _matrix(batch_col, d: Optional[int] = None) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix (flat values reshape).

    ``d``: expected dimension — lets an EMPTY batch return (0, d) so the
    downstream matmul shape-checks instead of crashing on (0, 0).  Null
    entries raise: ``ListArray.flatten()`` silently DROPS null rows, so a
    reshape would either fail or (worse, when divisible) misalign every row
    after the null against the wrong key."""
    arr = batch_col.combine_chunks() if isinstance(batch_col, pa.ChunkedArray) else batch_col
    if arr.null_count:
        raise ValueError(
            f"{arr.null_count} null embedding(s) in batch — flatten() drops null "
            "rows, which would misalign vectors against keys; filter or impute "
            "nulls upstream"
        )
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, d or 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _empty_topk(key_type) -> pa.Table:
    return pa.table(
        {"query_id": pa.array([], type=pa.int32()), "key": pa.array([], key_type),
         "score": pa.array([], type=pa.float64())}
    )


def _local_topk_table(m: np.ndarray, keys: np.ndarray, q: np.ndarray, k: int,
                      key_type) -> pa.Table:
    """Per-batch combiner shared by brute/lsh/ivf: local top-k rows per query
    (k × num_batches rows reach the reduce, never the whole table)."""
    kk = min(k, m.shape[0])
    if kk == 0:
        return _empty_topk(key_type)
    scores = m @ q.T  # (n, nq)
    qi, ki, sc = [], [], []
    for j in range(q.shape[0]):
        idx = np.argpartition(-scores[:, j], kk - 1)[:kk]
        for i in idx:
            qi.append(j)
            ki.append(keys[i])
            sc.append(scores[i, j])
    return pa.table(
        {"query_id": pa.array(qi, type=pa.int32()), "key": pa.array(ki, type=key_type),
         "score": pa.array(sc, type=pa.float64())}
    )


def _reduce_topk(partials: list[dict], k: int, key_col: str, key_type) -> pa.Table:
    """Driver-side merge of the per-batch combiner rows (sorted, per-query
    head-k, deterministic score-then-key tie-break)."""
    out_schema_empty = pa.table(
        {"query_id": pa.array([], type=pa.int32()), key_col: pa.array([], key_type),
         "score": pa.array([], type=pa.float64())}
    )
    if not partials:
        return out_schema_empty
    import pandas as pd

    df = pd.DataFrame(partials).rename(columns={"key": key_col})
    df = (
        df.sort_values(["query_id", "score", key_col], ascending=[True, False, True])
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(df, preserve_index=False)


def brute_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    key_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pa.Table:
    """(query_id, <key>, score) exact cosine top-k per query row."""
    qn = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    key_type = ds.schema().base_schema.field(key_col).type
    q_ref = ray.put(qn)

    def local_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = _normalize(_matrix(batch[emb_col], d=q.shape[1]))
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        return _local_topk_table(m, keys, q, k, key_type)

    partials = ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True).take_all()
    return _reduce_topk(partials, k, key_col, key_type)


def lsh_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    key_col: str = "vec_id",
    emb_col: str = "embedding",
    n_planes: int = 12,
    probe_bits: int = 2,
    seed: int = 11,
) -> pa.Table:
    """Approximate top-k: random-hyperplane bucket + multiprobe, exact re-rank
    inside candidate buckets.  Plane matrix is derived deterministically from
    ``seed``; candidates = rows whose bucket is within ``probe_bits`` bit
    flips of the query bucket (0 = the exact bucket only; any depth up to
    ``n_planes`` is honored — combinations grow as C(n_planes, depth))."""
    from itertools import combinations

    if not 0 <= probe_bits <= n_planes:
        raise ValueError(f"probe_bits must be in [0, n_planes={n_planes}], got {probe_bits}")
    qn = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    d = qn.shape[1]
    key_type = ds.schema().base_schema.field(key_col).type
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((d, n_planes))

    def bucket_of(m: np.ndarray) -> np.ndarray:
        bits = (m @ planes) > 0
        return (bits.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64)).sum(axis=1)

    q_buckets = bucket_of(qn)
    probe: set[int] = set()
    for qb in q_buckets:
        for depth in range(probe_bits + 1):
            for flips in combinations(range(n_planes), depth):
                mask = 0
                for b in flips:
                    mask |= 1 << b
                probe.add(int(qb ^ np.uint64(mask)))
    probe_ref = ray.put(np.array(sorted(probe), dtype=np.uint64))
    q_ref = ray.put(qn)

    def local(batch: pa.Table) -> pa.Table:
        probes = ray.get(probe_ref)
        q = ray.get(q_ref)
        m = _normalize(_matrix(batch[emb_col], d=q.shape[1]))
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        keep = np.isin(bucket_of(m), probes)
        return _local_topk_table(m[keep], keys[keep], q, k, key_type)

    partials = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True).take_all()
    return _reduce_topk(partials, k, key_col, key_type)


def kmeans_centroids(
    ds: "ray.data.Dataset",
    k: int = 16,
    emb_col: str = "embedding",
    iters: int = 5,
    seed: int = 13,
    sample_rows: int = 4096,
    key_col: Optional[str] = None,
) -> np.ndarray:
    """Deterministic mini-kmeans (driver-side over a bounded sample) for the
    IVF coarse quantizer.

    The training sample is a distributed HASH-sample: the input is projected
    to the needed columns, each block keeps its ``sample_rows``
    smallest-hash rows, the pruned (narrow) rows are COALESCED into a few
    blocks and pruned again, and the driver takes the global ``sample_rows``
    smallest — NOT an ordered ``limit()``: limit() materializes a
    driver-side scan PREFIX whose content depends on block order (and at
    10^12 rows concentrates the read on the first fragments), while the
    hash-sample reads every block in parallel (the global bottom by hash is
    a subset of the per-block bottoms, so the two-level prune is exact).
    No ``count()`` pre-pass — counting a filtered/transformed upstream
    would execute the whole plan one extra time just to tune a keep rate,
    and the per-block bound needs no rate.  The coalesce+re-prune level
    bounds driver volume at ``_COALESCE_BLOCKS x sample_rows`` rows even
    when blocks are SMALLER than sample_rows (many tiny fragments), where a
    single-level prune would degrade to take_all of everything.

    Determinism: the hash always mixes the VECTOR contents (three bit-exact
    per-row reductions through DIFFERENT hash families) with ``key_col``
    when given, so rows tying on the hash are (near-certainly) identical
    vectors — interchangeable for training — and the sampled set does not
    depend on block boundaries or cluster width, unlike a per-batch
    tie-break on a key-only hash."""
    from rayval.state.hashing import hash64, rehash

    _COALESCE_BLOCKS = 8
    if key_col is None:
        # no schema() probe on the keyless path: schema(fetch_if_missing) can
        # execute the first block of a lazily transformed upstream just to
        # answer a column-presence question the keyless path never asks
        use_key = False
    else:
        use_key = key_col in ds.schema().base_schema.names
    cols = [emb_col] + ([key_col] if use_key else [])

    def _prune(b: pa.Table, hv: np.ndarray):
        if b.num_rows > sample_rows:
            # unsigned partial-select: the block's sample_rows smallest hashes
            idx = np.argpartition(hv, sample_rows)[:sample_rows]
            b, hv = b.take(pa.array(idx)), hv[idx]
        return b, hv

    def keep(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("__h", pa.array([], pa.int64()))
        # three bit-exact per-row reductions of the vector (sampling needs
        # spread and block-independent tie identity, not collision-freedom).
        # Distinct hash FAMILIES per reduction: xor of the same family over
        # correlated reductions cancels to all-zeros whenever sum(v) == v[0]
        # (every d=1 input).  Float64 BIT PATTERNS, not rounded ints:
        # round(x*1e6).astype(int64) funnels NaN / |x|>2^43 onto one sentinel,
        # building tie classes of non-identical vectors that break the
        # identity invariant the two-level prune's exactness rests on.  The
        # seeded-random position-weighted sum removes the SYSTEMATIC collision
        # class of (equal sum, equal v[0]) vectors — e.g. permuted tails —
        # which plain sum+first cannot distinguish; after it, a tie between
        # non-identical vectors needs several float-exact linear coincidences
        # at once.  (_matrix guarantees d >= 1 for a non-empty batch —
        # reshape(n, -1) raises on zero-size flat values — so mat[:, 0] is
        # safe here; the weight vector is seeded, so it is identical across
        # blocks and widths.)  NOT ``mat @ w``: BLAS picks kernels by matrix
        # HEIGHT, so the same row's dot product returns different low bits
        # inside different-sized blocks — measured on this host — which would
        # silently reintroduce block-dependence; (mat * w).sum(axis=1)
        # reduces along the fixed-length axis only and is bit-stable.
        mat = _matrix(b[emb_col], d=1)
        w = np.random.default_rng(0xC3).uniform(0.5, 2.0, mat.shape[1])
        hv = hash64(mat.sum(axis=1).view(np.int64))
        hv = hv ^ rehash(hash64(np.ascontiguousarray(mat[:, 0]).view(np.int64)), 0xA5)
        hv = hv ^ rehash(hash64((mat * w).sum(axis=1).view(np.int64)), 0x3C)
        if use_key:
            col = b[key_col]
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            hv = hash64(col) ^ hv
        b, hv = _prune(b, hv)
        return b.append_column("__h", pa.array(hv.view(np.int64)))

    def reprune(b: pa.Table) -> pa.Table:
        hv = b["__h"].to_numpy(zero_copy_only=False).view(np.uint64) if b.num_rows else None
        return _prune(b, hv)[0]

    sample = (
        ds.select_columns(cols)
        .map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(_COALESCE_BLOCKS)
        .map_batches(reprune, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    # order by the UNSIGNED hash (the column is its int64 view; a signed
    # sort would put hashes >= 2^63 first, not the smallest)
    sample.sort(key=lambda r: r["__h"] % (1 << 64))
    sample = sample[:sample_rows]
    m = _normalize(np.array([np.asarray(r[emb_col], dtype=np.float64) for r in sample]))
    rng = np.random.default_rng(seed)
    cents = m[rng.choice(len(m), size=min(k, len(m)), replace=False)]
    for _ in range(iters):
        assign = (m @ cents.T).argmax(axis=1)
        for j in range(len(cents)):
            members = m[assign == j]
            if len(members):
                c = members.mean(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    cents[j] = c / n
    return cents


def ivf_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    key_col: str = "vec_id",
    emb_col: str = "embedding",
    n_lists: int = 16,
    n_probe: int = 4,
    centroids: Optional[np.ndarray] = None,
) -> pa.Table:
    """IVF approximate top-k: kmeans coarse quantizer -> per-batch list
    assignment -> only vectors in the query's n_probe nearest lists are
    scored exactly.  The scale path alongside ``lsh_topk``: centroids are the
    broadcast small side; candidate scoring stays a per-batch matmul."""
    if centroids is None:
        centroids = kmeans_centroids(ds, k=n_lists, emb_col=emb_col, key_col=key_col)
    qn = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    key_type = ds.schema().base_schema.field(key_col).type
    probe_lists = np.unique(
        np.argsort(-(qn @ centroids.T), axis=1)[:, : min(n_probe, len(centroids))].ravel()
    )
    cents_ref = ray.put((centroids, probe_lists))
    q_ref = ray.put(qn)

    def local(batch: pa.Table) -> pa.Table:
        cents, probes = ray.get(cents_ref)
        q = ray.get(q_ref)
        m = _normalize(_matrix(batch[emb_col], d=q.shape[1]))
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        lists = (m @ cents.T).argmax(axis=1) if m.shape[0] else np.array([], dtype=np.int64)
        keep = np.isin(lists, probes)
        return _local_topk_table(m[keep], keys[keep], q, k, key_type)

    partials = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True).take_all()
    return _reduce_topk(partials, k, key_col, key_type)


def embedding_neardups(
    ds: "ray.data.Dataset",
    threshold: float,
    key_col: str = "vec_id",
    emb_col: str = "embedding",
    n_blocks: int = 4,
) -> pa.Table:
    """(a, b, cos) pairs with cosine >= threshold, a < b — EXACT, via a
    block-partitioned distributed pair join; the driver never materializes the
    table and nothing is broadcast.

    Rows hash into ``n_blocks`` buckets; each row is fanned out to the
    ``n_blocks`` join cells (p, q) its bucket participates in, then one
    ``groupby(cell).map_groups`` computes the within-cell pairwise cosines as
    a single matmul.  Every pair meets in exactly one cell, so no dedup pass
    is needed.  Costs: shuffle volume = n_blocks x input rows; per-cell work
    O((n/n_blocks)^2) — pick ``n_blocks ~ sqrt(n) / rows_per_cell_budget`` at
    scale.  (An LSH prefilter would cut the shuffle but gives up exactness —
    this operator backs an exact-threshold oracle.)"""
    from rayval.state import hash64

    def fanout(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keys = batch[key_col]
        bucket = (hash64(keys) % np.uint64(n_blocks)).astype(np.int64)
        idx = np.repeat(np.arange(n), n_blocks)
        other = np.tile(np.arange(n_blocks, dtype=np.int64), n)
        b = np.repeat(bucket, n_blocks)
        p = np.minimum(b, other)
        q = np.maximum(b, other)
        taken = batch.select([key_col, emb_col]).take(pa.array(idx))
        return (
            taken.append_column("cell", pa.array(p * n_blocks + q))
            .append_column("bucket", pa.array(b))
        )

    def cell_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "cos": pa.array([], pa.float64())}
        )
        if g.num_rows == 0:
            return empty
        cell = g["cell"][0].as_py()
        p, q = divmod(cell, n_blocks)
        keys = g[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_matrix(g[emb_col]))
        if p == q:
            scores = m @ m.T
            iu, ju = np.triu_indices(len(keys), k=1)
            hit = scores[iu, ju] >= threshold
            # keys are expected unique; a repeated key always hashes to the
            # same bucket and meets itself ONLY here (diagonal cell) — drop
            # the degenerate a==b rows rather than violate the a<b contract
            hit &= keys[iu] != keys[ju]
            ka, kb = keys[iu[hit]], keys[ju[hit]]
            sc = scores[iu, ju][hit]
        else:
            side = g["bucket"].to_numpy(zero_copy_only=False) == p
            ma, mb = m[side], m[~side]
            if not len(ma) or not len(mb):
                return empty
            scores = ma @ mb.T
            ii, jj = np.nonzero(scores >= threshold)
            ka, kb = keys[side][ii], keys[~side][jj]
            sc = scores[ii, jj]
        a = np.minimum(ka, kb)
        b = np.maximum(ka, kb)
        return pa.table({"a": pa.array(a), "b": pa.array(b), "cos": pa.array(sc, type=pa.float64())})

    out = (
        ds.select_columns([key_col, emb_col])
        .map_batches(fanout, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cell")
        .map_groups(cell_pairs, batch_format="pyarrow")
    )
    from rayval.util import collect_tables

    schema = pa.schema([("a", pa.int64()), ("b", pa.int64()), ("cos", pa.float64())])
    return collect_tables(out, schema).sort_by([("a", "ascending"), ("b", "ascending")])


def embedding_neardups_lsh(
    ds: "ray.data.Dataset",
    threshold: float,
    key_col: str = "vec_id",
    emb_col: str = "embedding",
    n_planes: int = 10,
    bands: int = 4,
    seed: int = 11,
    hot_cap: int = 1024,
) -> pa.Table:
    """(a, b, cos) pairs with cosine >= threshold, a < b — APPROXIMATE
    candidate generation, EXACT verification: the 10^12-row path beside
    :func:`embedding_neardups` (whose exact block join shuffles
    ``n_blocks x rows`` and does O((n/n_blocks)^2) work per cell).

    ``bands`` independent random-hyperplane signatures (``n_planes`` bits
    each — the SimHash-for-vectors analog of MinHash banding): a pair lands
    in the same bucket of band b iff it agrees on all of b's planes, so
    near-identical vectors (the near-dup regime) collide in >=1 band with
    probability ~1 - (1 - p^n_planes)^bands, p = 1 - angle/pi.  Shuffle
    carries (band, bucket, key, vector): ``bands x d`` floats per row —
    linear in rows, vs the exact join's ``n_blocks x d``.  Within a bucket
    one matmul scores all pairs; every emitted pair is EXACTLY verified
    (cos >= threshold on the true vectors), so precision is 1.0 and only
    recall is approximate.  Buckets with more than ``hot_cap`` rows skip
    cross pairs (degenerate band: carries ~no signal; the skew bound —
    same trade as docdedup's LSH guard).  Cross-band duplicate pairs are
    deduped DISTRIBUTED by ``groupby(a, b).min`` before the driver collect.
    """
    from rayval.util import collect_tables

    def fanout(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {"band": pa.array([], pa.int32()), "bucket": pa.array([], pa.int64()),
                 key_col: pa.array([], batch[key_col].type),
                 emb_col: pa.array([], batch[emb_col].type)}
            )
        # derive each band's planes deterministically from (seed, band)
        m = _normalize(_matrix(batch[emb_col]))
        d = m.shape[1]
        buckets = np.empty((bands, n), dtype=np.int64)
        for b in range(bands):
            planes = np.random.default_rng(seed + b).standard_normal((d, n_planes))
            bits = (m @ planes) > 0
            buckets[b] = (
                bits.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64)
            ).sum(axis=1).astype(np.int64)
        idx = pa.array(np.tile(np.arange(n, dtype=np.int64), bands))
        taken = batch.select([key_col, emb_col]).take(idx)
        return (
            pa.table(
                {"band": pa.array(np.repeat(np.arange(bands, dtype=np.int32), n)),
                 "bucket": pa.array(buckets.reshape(-1))}
            )
            .append_column(key_col, taken[key_col])
            .append_column(emb_col, taken[emb_col])
        )

    empty = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "cos": pa.array([], pa.float64())}
    )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n < 2 or n > hot_cap:
            return empty
        keys = g[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_matrix(g[emb_col]))
        scores = m @ m.T
        iu, ju = np.triu_indices(n, k=1)
        hit = (scores[iu, ju] >= threshold) & (keys[iu] != keys[ju])
        ka, kb = keys[iu[hit]], keys[ju[hit]]
        return pa.table(
            {"a": pa.array(np.minimum(ka, kb)), "b": pa.array(np.maximum(ka, kb)),
             "cos": pa.array(scores[iu, ju][hit], type=pa.float64())}
        )

    out = (
        ds.select_columns([key_col, emb_col])
        .map_batches(fanout, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band", "bucket"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
        # a pair found by several bands carries the SAME exact cos: min == any
        .groupby(["a", "b"])
        .min("cos")
        .map_batches(lambda b: b.rename_columns(["a", "b", "cos"]), batch_format="pyarrow")
    )
    schema = pa.schema([("a", pa.int64()), ("b", pa.int64()), ("cos", pa.float64())])
    return collect_tables(out, schema).sort_by([("a", "ascending"), ("b", "ascending")])
