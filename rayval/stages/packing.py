"""Sequence packing — assemble documents into fixed-token-budget training
sequences (the step between a cleaned corpus and a dataloader: concatenate
docs until the context window is full, start the next sequence).

Semantics (deterministic): within each ``group_col`` partition, docs are
taken in ascending ``key_col`` order and packed GREEDY-RESET: a doc joins
the current sequence iff the sequence's size stays <= ``budget``, else it
starts a new sequence; a single doc larger than the budget gets its own
sequence flagged ``overflow`` (truncation policy belongs to the trainer,
not the packer — dropping silently here would lose data).

Shape (scales): ``groupby(group_col).map_groups`` — the partitioned-log
assumption shared with the windows/as-of operators (one group's doc METADATA
fits a reducer; only (group, key, size) rows shuffle, never text).  Inside a
group the greedy scan is a searchsorted JUMP per emitted sequence over the
size cumsum — O(n_sequences log n_docs), not a per-doc Python loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def pack_sequences(
    ds: "ray.data.Dataset",
    group_col: str,
    key_col: str,
    size_col: str,
    budget: int,
    n_shards: int = 0,
) -> "ray.data.Dataset":
    """One row per input doc: (group_col, key_col, size, seq_id, seq_pos,
    seq_size, overflow).  ``seq_id`` is the sequence's ordinal within its
    group (pair it with the group value for a global id); ``seq_pos`` the
    doc's position inside its sequence; ``seq_size`` the packed sequence's
    total size (every member row carries it — the fill-factor audit column).
    Null sizes are treated as 0 (a doc with unknown size packs but adds
    nothing); NEGATIVE sizes are corrupt metadata and clamp to 0 too — a
    negative value would make the cumsum non-monotone and np.searchsorted
    silently wrong, so the clamp keeps the greedy semantics well-defined
    (same failures-are-data stance as the decode stage); null group keys
    form their own group.

    SCALE KNOB — ``n_shards``: one reducer holds one GROUP's (key, size)
    metadata, so a low-cardinality ``group_col`` (a language column at 10^12
    docs) concentrates terabytes on a few reducers.  Packing does not care
    WHICH docs share a sequence, only that no sequence crosses a group — so
    ``n_shards > 0`` splits every group into ``hash(key) % n_shards``
    subgroups packed independently (reducer load / n_shards) and encodes
    ``seq_id = shard * 2^32 + local_seq`` to keep ids unique per group.
    Fill factor degrades only by the per-shard tail sequence (one partial
    sequence per shard instead of one per group)."""
    g_type = ds.schema().base_schema.field(group_col).type
    k_type = ds.schema().base_schema.field(key_col).type
    schema = pa.schema(
        [(group_col, g_type), (key_col, k_type), ("size", pa.int64()),
         ("seq_id", pa.int64()), ("seq_pos", pa.int64()),
         ("seq_size", pa.int64()), ("overflow", pa.bool_())]
    )

    def per_group(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return schema.empty_table()
        shard = g["__shard"][0].as_py() if "__shard" in g.column_names else 0
        seq_base = int(shard) << 32
        g = g.sort_by([(key_col, "ascending")])
        sizes = pc.fill_null(pc.cast(g[size_col], pa.int64()), 0).to_numpy(zero_copy_only=False)
        sizes = np.maximum(sizes, 0)  # clamp corrupt negatives (see docstring)
        cum = np.concatenate([[0], np.cumsum(sizes)])
        seq_id = np.empty(n, dtype=np.int64)
        seq_pos = np.empty(n, dtype=np.int64)
        seq_size = np.empty(n, dtype=np.int64)
        starts = []
        i, s = 0, 0
        while i < n:
            # furthest j with cum[j] - cum[i] <= budget; at least one doc
            j = int(np.searchsorted(cum, cum[i] + budget, side="right")) - 1
            j = max(j, i + 1)
            starts.append(i)
            seq_id[i:j] = s
            seq_pos[i:j] = np.arange(j - i)
            seq_size[i:j] = cum[j] - cum[i]
            i, s = j, s + 1
        if s >= (1 << 32):
            raise ValueError(
                f"pack_sequences: group shard emitted {s} sequences (>= 2^32); "
                "seq_id = shard << 32 | local would collide — raise n_shards"
            )
        overflow = seq_size > budget
        return pa.table(
            {
                group_col: g[group_col],
                key_col: g[key_col],
                "size": pa.array(sizes),
                "seq_id": pa.array(seq_id + seq_base),
                "seq_pos": pa.array(seq_pos),
                "seq_size": pa.array(seq_size),
                "overflow": pa.array(overflow),
            }
        )

    narrow = ds.select_columns([group_col, key_col, size_col])
    if n_shards and n_shards > 1:
        from rayval.state.hashing import hash64

        def add_shard(b: pa.Table) -> pa.Table:
            sh = (hash64(b[key_col]) % np.uint64(n_shards)).astype(np.int64)
            return b.append_column("__shard", pa.array(sh))

        narrow = narrow.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
        out = narrow.groupby([group_col, "__shard"]).map_groups(per_group, batch_format="pyarrow")
    else:
        out = narrow.groupby(group_col).map_groups(per_group, batch_format="pyarrow")
    return out
