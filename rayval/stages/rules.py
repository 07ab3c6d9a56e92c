"""Execute a Profile's ``TableRule`` declarations over a Dataset.

The Profile carries the whole validation contract declaratively: per-column
constraints (compiled to the batch mask pass) AND table-level rules
(``TableRule(kind, column, params)``, rayval/constraints/profile.py:60).
This module is the dispatcher for the table-level half — each rule kind maps
onto the engine's scale-shaped stage:

- ``unique``       -> partial value counts + broadcast dup-set flagging (the
                      phash-dedup shape generalized to any column; hot keys
                      never enter a shuffle).
- ``referential``  -> Bloom probe + hash-partitioned exact anti-join
                      (stages/referential.py) against a valid-values source.
- ``drift``        -> per-partition KLL sketches + two-sample KS against a
                      reference profile (stages/stats.py).
- ``neardup``      -> Hamming near-dup on a 64-bit hash column: pigeonhole-
                      banded pair join + broadcast member set
                      (stages/dedup.py:neardup_violations).

All four produce violation rows ``(partition_id, <key>, constraint_id)``
with the rule's ``constraint_id`` (e.g. ``c_custkey.referential``).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from rayval.constraints.profile import PARTITION_COL, Profile
from rayval.stages.referential import build_bloom, referential_violations
from rayval.stages.stats import ColumnStats, drift_violations
from rayval.util import collect_tables


def unique_violations(
    ds: "ray.data.Dataset", column: str, key: str, hot_threshold: int = 1000,
    n_buckets: int = 32, cid: "str | None" = None,
) -> pa.Table:
    """(partition_id, key, '<column>.unique') for every member of every
    duplicate group of ``column`` — partial counts, tiny groupby, then
    membership by whichever shape the duplicate-set size allows:

    - |dup values| <= ``hot_threshold``: broadcast the dup-value set
      (``ray.put`` once) and filter in map_batches — NO row-level shuffle
      (the dedup.py shape for any column/key).
    - |dup values| > ``hot_threshold``: the set no longer broadcasts safely;
      fall back to a hash-partitioned SEMI-JOIN — dup values and data rows
      both shuffle narrow (bucket, value, key) rows to ``hash64(v) % B``
      buckets, each bucket filters members vectorized.  Only violation rows
      come back.
    """

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[column]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        vc = pc.value_counts(col.drop_null() if col.null_count else col)
        return pa.table({"v": vc.field("values"), "n": pc.cast(vc.field("counts"), pa.int64())})

    counts = (
        ds.select_columns([column])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("v")
        .sum("n")
        .map_batches(lambda b: b.rename_columns(["v", "n_total"]), batch_format="pyarrow")
        .filter(expr="n_total > 1")
        .materialize()  # counted, then consumed by exactly one path below
    )
    n_dup = counts.count()
    schema = pa.schema(
        [(PARTITION_COL, pa.int64()), (key, pa.string()), ("constraint_id", pa.string())]
    )
    if n_dup == 0:
        return schema.empty_table()
    cid = cid or f"{column}.unique"
    cols = [c for c in (column, key, PARTITION_COL) if c in ds.schema().names]
    rows = ds.select_columns(cols)

    if n_dup > hot_threshold:
        out = _members_via_semijoin(rows, counts, column, key, cid, n_buckets)
        return collect_tables(out, schema).sort_by([(key, "ascending")])

    dup_rows = counts.take_all()
    dup_arr = pa.array([r["v"] for r in dup_rows])
    ref = ray.put(dup_arr)

    def members(batch: pa.Table) -> pa.Table:
        hit = batch.filter(pc.is_in(batch[column], value_set=ray.get(ref)))
        n = hit.num_rows
        if PARTITION_COL in hit.column_names:
            part = hit[PARTITION_COL]
        else:
            part = pa.array(np.full(n, -1, dtype=np.int64))
        return pa.table(
            {
                PARTITION_COL: part,
                key: pc.cast(hit[key], pa.string()),
                "constraint_id": pa.array([cid] * n, type=pa.string()),
            }
        )

    out = rows.map_batches(members, batch_format="pyarrow")
    return collect_tables(out, schema).sort_by([(key, "ascending")])


def functional_violations(
    ds: "ray.data.Dataset", column: str, determines: str, key: str,
    hot_threshold: int = 1000, n_buckets: int = 32,
) -> pa.Table:
    """(partition_id, key, '<column>.functional.<determines>') for every row
    whose ``column`` value maps to MORE THAN ONE distinct ``determines``
    value — a declarative functional-dependency check (A -> B), the
    cross-column member of the table-rule family (e.g. "every source has one
    language", "every order key has one status").

    Scale shape mirrors ``unique_violations``: per-batch DISTINCT (A, B)
    pairs (one Arrow group_by — rows collapse before anything moves), ONE
    ``groupby(hash(A) % B)`` exchange of the deduped pairs, per-bucket
    vectorized re-dedup + run count emits only the violating A values; then
    membership by broadcast (small set) or the shared hash-partitioned
    semi-join (``_members_via_semijoin``) when it outgrows ``hot_threshold``.

    Null semantics (replicate in any oracle): null-A rows can't violate and
    are dropped; null B values don't count toward distinctness (SQL
    ``COUNT(DISTINCT b)``), but rows of a violating A with null B are still
    listed as members."""
    from rayval.state import hash64

    def pair_partial(batch: pa.Table) -> pa.Table:
        t = batch.select([column, determines])
        t = t.filter(pc.and_(t[column].is_valid(), t[determines].is_valid()))
        if t.num_rows == 0:
            return pa.table(
                {"v": pa.array([], batch.schema.field(column).type),
                 "b": pa.array([], batch.schema.field(determines).type)}
            )
        part = t.group_by([column, determines]).aggregate([]).combine_chunks()
        return pa.table({"v": part[column], "b": part[determines]})

    def tag_bucket(batch: pa.Table) -> pa.Table:
        h = (hash64(batch["v"]) % np.uint64(n_buckets)).astype(np.int64)
        return batch.append_column("bucket", pa.array(h))

    def per_bucket(group: pa.Table) -> pa.Table:
        v_t = group.schema.field("v").type if "v" in group.column_names else pa.string()
        empty = pa.table({"v": pa.array([], v_t)})
        if group.num_rows == 0 or "v" not in group.column_names:
            return empty
        # re-dedup across batches, then count distinct B per A (vectorized)
        pairs = group.select(["v", "b"]).group_by(["v", "b"]).aggregate([]).combine_chunks()
        counts = pairs.group_by("v").aggregate([("b", "count")]).combine_chunks()
        bad = counts.filter(pc.greater(counts["b_count"], 1))
        return pa.table({"v": bad["v"]})

    viol_vals = (
        ds.select_columns([column, determines])
        .map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(tag_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .materialize()
    )
    n_bad = viol_vals.count()
    schema = pa.schema(
        [(PARTITION_COL, pa.int64()), (key, pa.string()), ("constraint_id", pa.string())]
    )
    if n_bad == 0:
        return schema.empty_table()
    cid = f"{column}.functional.{determines}"
    cols = [c for c in (column, key, PARTITION_COL) if c in ds.schema().names]
    rows = ds.select_columns(cols)

    if n_bad > hot_threshold:
        out = _members_via_semijoin(rows, viol_vals, column, key, cid, n_buckets)
        return collect_tables(out, schema).sort_by([(key, "ascending")])

    bad_arr = pa.array([r["v"] for r in viol_vals.take_all()])
    ref = ray.put(bad_arr)

    def members(batch: pa.Table) -> pa.Table:
        hit = batch.filter(pc.is_in(batch[column], value_set=ray.get(ref)))
        n = hit.num_rows
        if PARTITION_COL in hit.column_names:
            part = hit[PARTITION_COL]
        else:
            part = pa.array(np.full(n, -1, dtype=np.int64))
        return pa.table(
            {
                PARTITION_COL: part,
                key: pc.cast(hit[key], pa.string()),
                "constraint_id": pa.array([cid] * n, type=pa.string()),
            }
        )

    out = rows.map_batches(members, batch_format="pyarrow")
    return collect_tables(out, schema).sort_by([(key, "ascending")])


def unique_together_violations(
    ds: "ray.data.Dataset", columns: "list[str]", key: str,
    hot_threshold: int = 1000, n_buckets: int = 32,
) -> pa.Table:
    """COMPOSITE-key uniqueness: (partition_id, key, '<a>+<b>.unique_together')
    for every row sharing its (a, b, ...) tuple with another row — the
    multi-column complement of ``unique_violations`` (e.g. "(user_id, ts) is
    an event identity", "(image_id, crop) appears once").

    The tuple is encoded as an injective string — per column, ``"1:" +
    cast(v)`` or the fixed ``"0:"`` null token, joined with the \\x1f unit
    separator — then the ENTIRE unique machinery (partial counts, tiny
    groupby, broadcast-or-semi-join membership) reuses that derived column,
    so every scale/skew property of the single-column rule carries over
    verbatim.  No hashing anywhere: two distinct tuples can never collide.

    Null semantics: null components GROUP TOGETHER (SQL GROUP BY treats
    NULLs as one group); note a SQL ``(a,b) IN (subquery)`` membership
    listing would silently DROP null-component rows (NULL never IN) — use a
    GROUP-BY-join oracle, or non-null data, when comparing."""
    if len(columns) < 2:
        raise ValueError("unique_together needs at least two columns")
    sep = pa.scalar("\x1f")

    def derive(batch: pa.Table) -> pa.Table:
        parts = []
        for c in columns:
            s = pc.cast(batch[c], pa.string())
            enc = pc.if_else(
                s.is_valid(),
                pc.binary_join_element_wise(pa.scalar("1:"), pc.fill_null(s, ""), pa.scalar("")),
                pa.scalar("0:"),
            )
            parts.append(enc)
        ck = pc.binary_join_element_wise(*parts, sep)
        return batch.append_column("_ck", ck)

    cid = f"{'+'.join(columns)}.unique_together"
    return unique_violations(
        ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True),
        "_ck", key, hot_threshold=hot_threshold, n_buckets=n_buckets, cid=cid,
    )


def null_rate_violations(
    ds: "ray.data.Dataset", column: str, key: str, max_null_e6: int,
) -> pa.Table:
    """(partition_id, str(partition_id), '<column>.null_rate') for every
    partition whose ``column`` null fraction exceeds ``max_null_e6``
    (parts-per-million) — the completeness monitor of the table-rule family
    (north_star's per-partition stats verdict, as a declarative rule).

    Integer-exact on both sides: violate iff ``1e6 * nulls > max_null_e6 *
    rows`` (no float division anywhere, so a DuckDB HAVING with the same
    cross-multiplication is a bit-exact oracle).  Scale shape: per-batch
    (partition, nulls, rows) partial — two ints per touched partition per
    batch — merged on the driver like the stats/drift partials; no shuffle,
    nothing proportional to input rows moves."""
    def partial(batch: pa.Table) -> pa.Table:
        if PARTITION_COL in batch.column_names:
            part = batch[PARTITION_COL].to_numpy(zero_copy_only=False)
        else:
            part = np.full(batch.num_rows, -1, dtype=np.int64)
        isnull = batch[column].is_null().to_numpy(zero_copy_only=False)
        pids, idx = np.unique(part, return_inverse=True)
        nulls = np.bincount(idx, weights=isnull, minlength=len(pids)).astype(np.int64)
        rows = np.bincount(idx, minlength=len(pids)).astype(np.int64)
        return pa.table(
            {PARTITION_COL: pa.array(pids, type=pa.int64()),
             "nulls": pa.array(nulls), "rows": pa.array(rows)}
        )

    cols = [c for c in (column, PARTITION_COL) if c in ds.schema().names]
    tallies: dict[int, list[int]] = {}
    for r in (
        ds.select_columns(cols)
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    ):
        t = tallies.setdefault(int(r[PARTITION_COL]), [0, 0])
        t[0] += int(r["nulls"])
        t[1] += int(r["rows"])
    cid = f"{column}.null_rate"
    bad = sorted(
        pid for pid, (nn, n) in tallies.items() if 1_000_000 * nn > max_null_e6 * n
    )
    return pa.table(
        {
            PARTITION_COL: pa.array(bad, type=pa.int64()),
            key: pa.array([str(p) for p in bad], type=pa.string()),
            "constraint_id": pa.array([cid] * len(bad), type=pa.string()),
        }
    )


def row_count_violations(
    ds: "ray.data.Dataset", key: str, min_rows: "int | None" = None,
    max_rows: "int | None" = None, cid: str = "table.row_count",
) -> pa.Table:
    """(partition_id, str(partition_id), cid) for every partition whose row
    count falls outside [min_rows, max_rows] — the volume monitor of the
    table-rule family (a shard that lost rows between pipeline stages, or
    ballooned from a bad join, is the classic silent corruption; north_star's
    per-partition 'rows scanned' metric as a declarative bound).

    Same no-shuffle shape as null_rate_violations: per-batch (partition,
    rows) partials — one int per touched partition — merged on the driver."""
    if min_rows is None and max_rows is None:
        raise ValueError("row_count rule needs min_rows and/or max_rows")

    def partial(batch: pa.Table) -> pa.Table:
        if PARTITION_COL in batch.column_names:
            part = batch[PARTITION_COL].to_numpy(zero_copy_only=False)
        else:
            part = np.full(batch.num_rows, -1, dtype=np.int64)
        pids, counts = np.unique(part, return_counts=True)
        return pa.table(
            {PARTITION_COL: pa.array(pids.astype(np.int64)),
             "rows": pa.array(counts.astype(np.int64))}
        )

    cols = [PARTITION_COL] if PARTITION_COL in ds.schema().names else ds.schema().names[:1]
    tallies: dict[int, int] = {}
    for r in (
        ds.select_columns(cols)
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    ):
        pid = int(r[PARTITION_COL])
        tallies[pid] = tallies.get(pid, 0) + int(r["rows"])
    bad = sorted(
        pid for pid, n in tallies.items()
        if (min_rows is not None and n < min_rows)
        or (max_rows is not None and n > max_rows)
    )
    return pa.table(
        {
            PARTITION_COL: pa.array(bad, type=pa.int64()),
            key: pa.array([str(p) for p in bad], type=pa.string()),
            "constraint_id": pa.array([cid] * len(bad), type=pa.string()),
        }
    )


def _members_via_semijoin(
    rows: "ray.data.Dataset", dup_values: "ray.data.Dataset", column: str, key: str,
    cid: str, n_buckets: int,
) -> "ray.data.Dataset":
    """Hash-partitioned semi-join membership: both sides shuffle only
    (bucket, value, key, partition) rows; each bucket's task holds 1/B of the
    dup-value set — the scale path when the duplicate set outgrows a
    broadcast (the fallback documented in stages/dedup.py)."""
    from rayval.state import hash64

    def tag_dups(batch: pa.Table) -> pa.Table:
        h = (hash64(batch["v"]) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(h),
                "v": batch["v"],
                key: pa.nulls(batch.num_rows, pa.string()),
                PARTITION_COL: pa.nulls(batch.num_rows, pa.int64()),
                # explicit side marker — a DATA row's key may legitimately be
                # null, so key-nullness cannot distinguish the sides
                "side_dup": pa.array(np.ones(batch.num_rows, dtype=bool)),
            }
        )

    def tag_rows(batch: pa.Table) -> pa.Table:
        col = batch[column]
        keep = col.is_valid()
        t = batch.filter(keep)
        h = (hash64(t[column]) % np.uint64(n_buckets)).astype(np.int64)
        part = (
            t[PARTITION_COL]
            if PARTITION_COL in t.column_names
            else pa.array(np.full(t.num_rows, -1, dtype=np.int64))
        )
        return pa.table(
            {
                "bucket": pa.array(h),
                "v": t[column],
                key: pc.cast(t[key], pa.string()),
                PARTITION_COL: pc.cast(part, pa.int64()),
                "side_dup": pa.array(np.zeros(t.num_rows, dtype=bool)),
            }
        )

    tagged = dup_values.select_columns(["v"]).map_batches(
        tag_dups, batch_format="pyarrow"
    ).union(rows.map_batches(tag_rows, batch_format="pyarrow"))

    def per_bucket(group: pa.Table) -> pa.Table:
        is_dup = group["side_dup"].combine_chunks() if group.num_rows else pa.array([], pa.bool_())
        dups = group.filter(is_dup)
        cand = group.filter(pc.invert(is_dup))
        if cand.num_rows == 0 or dups.num_rows == 0:
            return pa.table(
                {
                    PARTITION_COL: pa.array([], pa.int64()),
                    key: pa.array([], pa.string()),
                    "constraint_id": pa.array([], pa.string()),
                }
            )
        hit = cand.filter(pc.is_in(cand["v"], value_set=dups["v"].combine_chunks()))
        return pa.table(
            {
                PARTITION_COL: hit[PARTITION_COL],
                key: hit[key],
                "constraint_id": pa.array([cid] * hit.num_rows, type=pa.string()),
            }
        )

    return tagged.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")


def run_table_rules(
    ds: "ray.data.Dataset",
    profile: Profile,
    key: Optional[str] = None,
    ref_sources: Optional[dict] = None,
    reference_profile: Optional[ColumnStats] = None,
    hot_threshold: int = 1000,
    n_buckets: int = 32,
) -> pa.Table:
    """Dispatch every ``TableRule`` the profile declares; returns the merged
    violation listing (partition_id, <key>, constraint_id), sorted.

    ``ref_sources``: {column -> Dataset of valid values} for referential
    rules (the rule's ``params["to_column"]`` names the source column,
    defaulting to the rule column).  ``reference_profile``: ColumnStats for
    drift rules (e.g. ``load_profile`` of a previous run)."""
    key = key or profile.key or "key"
    schema = pa.schema(
        [(PARTITION_COL, pa.int64()), (key, pa.string()), ("constraint_id", pa.string())]
    )

    def _run_rule(rule) -> list[pa.Table]:
        parts: list[pa.Table] = []
        if rule.kind == "unique":
            t = unique_violations(
                ds, rule.column, key,
                hot_threshold=rule.params.get("hot_threshold", hot_threshold),
                n_buckets=rule.params.get("n_buckets", n_buckets),
            )
            parts.append(t.cast(schema))
        elif rule.kind == "referential":
            if not ref_sources or rule.column not in ref_sources:
                raise ValueError(f"referential rule on {rule.column!r} needs ref_sources[{rule.column!r}]")
            src = ref_sources[rule.column]
            to_col = rule.params.get("to_column", rule.column)
            left = ds.map_batches(
                lambda b, _c=rule.column, _k=key: pa.table(
                    {
                        "caption_id": pc.cast(b[_k], pa.string()),
                        "image_id": pc.cast(b[_c], pa.string()),
                    }
                ),
                batch_format="pyarrow",
            )
            right = src.map_batches(
                lambda b, _c=to_col: pa.table({"image_id": pc.cast(b[_c], pa.string())}),
                batch_format="pyarrow",
            )
            rule_buckets = rule.params.get("n_buckets", n_buckets)
            bloom = build_bloom(
                right,
                n_expected=rule.params.get("bloom_expected", 1_000_000),
                n_shards=rule_buckets,  # shard == join bucket: probe tasks
                # and per-bucket verifiers fetch exactly their own shard
            )
            viol = referential_violations(
                left, right, bloom, key="caption_id", n_buckets=rule_buckets,
            )
            if viol.num_rows:
                parts.append(
                    pa.table(
                        {
                            PARTITION_COL: viol[PARTITION_COL],
                            key: viol["caption_id"],
                            "constraint_id": pa.array(
                                [f"{rule.column}.referential"] * viol.num_rows, type=pa.string()
                            ),
                        }
                    ).cast(schema)
                )
        elif rule.kind == "neardup":
            # Hamming near-dup on a 64-bit perceptual-hash column: the
            # banded pair join + broadcast member set (stages/dedup.py:
            # neardup_violations — the flagship's phash_near_radius stage,
            # declaratively).  params: max_hamming (default 2), hot_cap.
            from rayval.stages.dedup import neardup_violations

            # key cast to string up front (the pair join and the violation
            # schema are string-keyed) — same cast every other rule kind does
            keep = [
                c for c in {rule.column, key, PARTITION_COL, "decodable"}
                if c in ds.schema().names
            ]
            proj = ds.select_columns(keep).map_batches(
                lambda b, _k=key: b.set_column(
                    b.column_names.index(_k), _k, pc.cast(b[_k], pa.string())
                ),
                batch_format="pyarrow",
            )
            nd = neardup_violations(
                proj,
                max_hamming=rule.params.get("max_hamming", 2),
                hot_cap=rule.params.get("hot_cap", 256),
                phash_col=rule.column,
                key_col=key,
            )
            t = collect_tables(
                nd,
                pa.schema(
                    [(PARTITION_COL, pa.int64()), (key, pa.string()),
                     ("constraint_id", pa.string())]
                ),
            )
            if t.num_rows:
                parts.append(t.cast(schema))
        elif rule.kind == "drift":
            if reference_profile is None:
                raise ValueError(f"drift rule on {rule.column!r} needs reference_profile")

            col = rule.column

            def partial(batch: pa.Table, _c=col) -> pa.Table:
                if PARTITION_COL in batch.column_names:
                    part = batch[PARTITION_COL].to_numpy(zero_copy_only=False)
                else:
                    part = np.full(batch.num_rows, -1, dtype=np.int64)
                pids, blobs = [], []
                for pid in np.unique(part):
                    sel = batch.filter(pa.array(part == pid))
                    st = ColumnStats(numeric_cols=[_c], unique_cols=[])
                    st.update(sel)
                    pids.append(int(pid))
                    blobs.append(st.to_bytes())
                return pa.table(
                    {PARTITION_COL: pa.array(pids, type=pa.int64()),
                     "stats": pa.array(blobs, type=pa.binary())}
                )

            cols = [c for c in (col, PARTITION_COL) if c in ds.schema().names]
            rows = ds.select_columns(cols).map_batches(partial, batch_format="pyarrow").take_all()
            per_partition: dict[int, ColumnStats] = {}
            for r in rows:
                st = ColumnStats.from_bytes(r["stats"])
                pid = r[PARTITION_COL]
                per_partition[pid] = per_partition[pid].merge(st) if pid in per_partition else st
            for pid, _k, cid in drift_violations(
                per_partition, reference_profile,
                rule.params.get("threshold", 0.15), columns=[col],
            ):
                parts.append(
                    pa.table(
                        {
                            PARTITION_COL: pa.array([pid], type=pa.int64()),
                            key: pa.nulls(1, pa.string()),
                            "constraint_id": pa.array([cid], type=pa.string()),
                        }
                    )
                )
        elif rule.kind == "unique_together":
            extra = rule.params.get("with")
            if not extra:
                raise ValueError(
                    f"unique_together rule on {rule.column!r} needs params['with'] "
                    "(the other key columns)"
                )
            t = unique_together_violations(
                ds, [rule.column, *extra], key,
                hot_threshold=rule.params.get("hot_threshold", hot_threshold),
                n_buckets=rule.params.get("n_buckets", n_buckets),
            )
            parts.append(t.cast(schema))
        elif rule.kind == "row_count":
            t = row_count_violations(
                ds, key,
                min_rows=rule.params.get("min_rows"),
                max_rows=rule.params.get("max_rows"),
                cid=f"{rule.column}.row_count",
            )
            parts.append(t.cast(schema))
        elif rule.kind == "null_rate":
            if "max_null_e6" not in rule.params:
                raise ValueError(
                    f"null_rate rule on {rule.column!r} needs params['max_null_e6']"
                )
            t = null_rate_violations(
                ds, rule.column, key, int(rule.params["max_null_e6"])
            )
            parts.append(t.cast(schema))
        elif rule.kind == "functional":
            det = rule.params.get("determines")
            if not det:
                raise ValueError(
                    f"functional rule on {rule.column!r} needs params['determines']"
                )
            t = functional_violations(
                ds, rule.column, det, key,
                hot_threshold=rule.params.get("hot_threshold", hot_threshold),
                n_buckets=rule.params.get("n_buckets", n_buckets),
            )
            parts.append(t.cast(schema))
        else:
            raise ValueError(f"unknown table rule kind {rule.kind!r}")
        return parts

    # rules are independent DAGs over the same input — dispatch them
    # concurrently (same device as the flagship's phase-2 dedup/ref overlap)
    # so their mostly-fixed Ray job launch costs overlap; results gather in
    # DECLARATION order and the final sort pins the output regardless.
    # max_workers is pinned to 2: Ray Data's streaming executor is not
    # documented thread-safe, and 2-way overlap is the widest shape this repo
    # has exercised at scale (flagship phase 2); wider fan-out buys little
    # (the DAGs are short) and widens the untested interleaving surface.
    rules = list(profile.table_rules)
    if len(rules) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as ex:
            results = list(ex.map(_run_rule, rules))
    else:
        results = [_run_rule(r) for r in rules]
    parts = [t for sub in results for t in sub]
    if not parts:
        return schema.empty_table()
    return pa.concat_tables(parts).sort_by(
        [(key, "ascending"), ("constraint_id", "ascending")]
    )
