"""Flagship pipeline — the engine's ``decode`` analog (core.clj:274-276) at
table scale.  Two phases:

PHASE 1 (per fragment-group, checkpointed, resumable — this is where ~all the
compute lives):
    read fragments (partition-tagged, columns pruned at the read)
      → MetaValidate        stateless map_batches, vectorized masks
      → DecodeCheck         actor pool, small batches (wide binary rows)
      → write narrow per-row results parquet (bytes dropped)
    then, from the (small) results read-back:
      → violations parquet, sketch partials, Bloom partial, manifest commit

PHASE 2 (global, cheap, runs over committed narrow results only):
      → phash.unique duplicates (skew-aware, stages/dedup.py)
      → image_id.ref referential (Bloom + hash-partitioned anti-join)
      → stats.drift.<col> per-partition drift vs reference profile
      → partition_stats table + per-partition verdicts + report

Resume: killed runs skip committed groups entirely (manifest set-difference);
phase 2 recomputes from persisted narrow outputs, never from raw images.

Scale notes: the only data shuffled anywhere is (bucket, image_id, key) in
the referential join and one row per distinct phash per batch in the dedup
count — image payloads stream through exactly one read + one decode, and the
narrow results (~1% the input width) are the only thing persisted or
re-scanned.
"""

from __future__ import annotations

import json
import os
import pickle
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from rayval.constraints import Enum, Field as F, MaxLength, Pattern, Profile, Range, Restriction
from rayval.constraints.profile import PARTITION_COL
from rayval.pipelines.manifest import Manifest
from rayval.sources.images import MAX_CAPTION
from rayval.sources.parquet import list_fragments, read_fragments
from rayval.stages.decode import DecodeCheck
from rayval.stages.dedup import (
    dup_counts_and_top_bucketed, duplicate_violations, neardup_violations,
)
from rayval.stages.referential import referential_violations, referential_violations_ds
from rayval.stages.stats import ColumnStats, drift_violations, global_stats, merge_partials, sketch_partials
from rayval.stages.validate import MetaValidate, annotate_from_masks, explode_violations
from rayval.state import ShardedBloom, bloom_from_bytes

VIOLATION_SCHEMA = pa.schema(
    [(PARTITION_COL, pa.int64()), ("image_id", pa.string()), ("constraint_id", pa.string())]
)


def images_profile() -> Profile:
    """The flagship constraint profile over the input_hint table — the WHOLE
    validation contract in one declarative object: per-column constraints
    (compiled to the batch mask pass) plus the table-level TableRule
    declarations phase 2 dispatches (uniqueness / referential / drift)."""
    from rayval.constraints.profile import TableRule

    return Profile(
        "images",
        [
            F("image_id", Pattern(r"img-\d{9}"), required=True),
            F("bytes", required=True),
            F("w", Restriction("int", [Range(min=1, max=8192)])),
            F("h", Restriction("int", [Range(min=1, max=8192)])),
            F("fmt", Enum(["jpeg", "png", "webp"])),
            F("caption", MaxLength(MAX_CAPTION), required=True),
            F("phash", "long"),
        ],
        kind="all",
        key="image_id",
        table_rules=[
            TableRule("unique", "phash"),
            TableRule("referential", "image_id"),
            TableRule("drift", "w"),  # drift checks run over NUMERIC_COLS when
            # a reference profile is supplied; this declaration records intent
        ],
    )


@dataclass
class RunConfig:
    group_size: int = 4          # fragments per checkpoint group
    decode_batch_size: Optional[int] = 256  # ACTOR-POOL mode only: wide binary
    # rows -> small batches (plasma transfer granularity / pool pipelining);
    # fused mode always runs block-sized batches (the block is whole in the
    # task heap either way; sub-slicing would only multiply part files)
    decode_concurrency: Optional[int] = None  # None -> FUSED task decode (default):
    # read -> validate -> decode -> narrow-write fuse into ONE Ray task per
    # block, so payload bytes NEVER enter the object store (measured ~25%
    # faster than the actor-pool split, which pays a plasma hop of every wide
    # block, and it removes the read-pool/actor-pool static CPU partition
    # that capped packing).  Set an int N for an actor pool of N — the right
    # choice when decode state is expensive per process (real codec libs,
    # models): init once per actor, at the cost of the wide-block hop.
    read_blocks_per_fragment: int = 1  # actor-pool mode only: >1 splits
    # fragments into more blocks for smoother pool packing (fused mode keeps
    # fragment-aligned blocks — a split boundary would break operator fusion)
    decode_task_cpus: int = 1  # fused mode: CPUs reserved per fused task.
    # Set 2 on hosts whose vCPUs are oversubscribed (this sandbox: 32 vCPU /
    # ~16 effective cores — 32 concurrent read+decode tasks thrash memory and
    # run 2x slower than 16); on dedicated cores leave 1.
    group_parallelism: int = 2    # fragment groups processed concurrently: overlaps
    # one group's driver-side read-back/merge with the next group's decode, so
    # the per-group fixed costs (Ray job launch, actor-pool spinup, parquet
    # footer scans) don't serialize — the phase-1 serial fraction that capped
    # 8->32 scaling.  Total decode actors = group_parallelism x decode_concurrency.
    psnr_check: bool = False  # per-row decode fidelity (re-encode byte-equal
    # or re-decode PSNR >= 40 dB — stages/decode.py FIDELITY_CHECK); off by
    # default: doubles the per-row codec work
    hot_threshold: int = 1000
    phash_near_radius: int = 0  # >0: ALSO flag perceptual near-duplicates —
    # images whose pHash sits 1..radius bits from another's — as
    # 'phash.neardup' (stages/dedup.py:neardup_violations, banded Hamming
    # join + broadcast member set).  Exact duplicates stay 'phash.unique'.
    # Off by default: the radius join is an extra (narrow) band exchange.
    drift_threshold: float = 0.15
    ref_buckets: int = 32
    bloom_expected: int = 1_000_000  # FIXED per run: partials must share
    # (n_shards, per-shard m, k) to merge; shards = ref_buckets
    profile: Optional[Profile] = None
    annotated_output: bool = False  # also write annotated/group-N: the in-band
    # struct<value,status> form of every validated column + row_valid — the
    # reference's primary output shape (to-hiccup-meta / with-status,
    # parser.clj:345-371, 384-400) — derived from the narrow results read-back,
    # no extra decode pass
    distributed_violations: bool = False  # escape hatch for WHOLESALE-violating
    # inputs: phase-1 tasks write their batch's violations as their OWN parquet
    # part file (same deterministic retry-safe naming as the narrow results)
    # instead of shipping IPC blobs to the driver, and phase 2 merges the
    # committed violation parts + dedup/referential violations as a streaming
    # Dataset union written distributed — the driver only ever holds COUNTS
    # (violations total, per-constraint, per-partition verdicts).  Default off:
    # when violations << rows the driver-side concat is one small file and the
    # final listing is a single sorted part.


def run_phase1(img_dir: str, out_dir: str, cfg: RunConfig = RunConfig()) -> Manifest:
    """Validate+decode all UNCOMMITTED fragment groups; commit each.

    Groups are dispatched on a small thread pool (``cfg.group_parallelism``);
    each thread drives its own Ray Data pipeline, so the cluster sees
    overlapping groups and no idle gap between one group's driver-side merge
    and the next group's read+decode.  Publish (rename + manifest commit) is
    serialized under a lock."""
    manifest = Manifest(out_dir)
    profile = cfg.profile or images_profile()
    validator = profile.compile()
    _gc_uncommitted(manifest)  # stale dirs are provably from uncommitted
    # attempts (write-ahead ordering) — removing them up front keeps the
    # publish renames collision-free even after a mid-publish kill
    done = manifest.committed_fragments()
    todo = [f for f in list_fragments(img_dir) if os.path.basename(f) not in done]
    groups = [todo[s : s + cfg.group_size] for s in range(0, len(todo), cfg.group_size)]
    base_gid = manifest.next_group_id()
    publish_lock = threading.Lock()

    def process(gid: int, group: list[str]) -> None:
        paths = manifest.group_paths(gid)
        tmp_results = paths["results"] + ".tmp"
        _clean(tmp_results)  # a killed run may have left partial files; Ray's
        os.makedirs(tmp_results, exist_ok=True)  # uuid-named parts would otherwise accumulate
        tmp_viol = paths["violations"] + ".tmp"
        _clean(tmp_viol)
        os.makedirs(tmp_viol, exist_ok=True)
        # distributed mode: phase-1 tasks write violation part files straight
        # into the group's tmp dir (published by the same atomic rename), so
        # the listing never concentrates on the driver
        viol_dir = tmp_viol if cfg.distributed_violations else None
        if cfg.decode_concurrency:
            # actor-pool mode: split fragments so the pool packs evenly; the
            # wide blocks cross the object store once (read op -> actor op)
            ds = read_fragments(group, override_num_blocks=len(group) * cfg.read_blocks_per_fragment)
            ds = ds.map_batches(MetaValidate(validator), batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
            ds = ds.map_batches(
                DecodeCheck,
                fn_constructor_kwargs={"psnr_check": cfg.psnr_check},
                batch_format="pyarrow",
                batch_size=cfg.decode_batch_size,
                concurrency=cfg.decode_concurrency,
            )
            ds.write_parquet(tmp_results)
            # ONE read-back pass over the narrow results computes the
            # violation rows AND the sketch + Bloom partials (fused to
            # amortize job startup).  Violations travel back as per-batch
            # Arrow IPC blobs (they are a small fraction of rows;
            # cfg.distributed_violations flips to per-task parquet parts when
            # a pathological group violates wholesale).
            results = ray.data.read_parquet(_expand([tmp_results]))
            partials = _derive_group_outputs(results, cfg, viol_dir=viol_dir)
        else:
            # FUSED task mode (default): read -> validate -> decode -> write
            # narrow part file -> emit (stats, bloom, viol) partials, ALL in
            # one Ray task per fragment block — payload bytes never enter the
            # object store and there is no second job / parquet re-scan.
            ds = read_fragments(group)  # fragment-aligned: keeps the fuse
            ds = ds.map_batches(MetaValidate(validator), batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
            kw = {"num_cpus": cfg.decode_task_cpus} if cfg.decode_task_cpus > 1 else {}
            # batch_size=None (block-sized): the wide block already sits whole
            # in this task's heap (the fused read produced it) and DecodeCheck
            # decodes one image at a time, so sub-slicing saves no memory —
            # it only multiplies narrow part FILES and bloom/stats partial
            # rows by rows/batch_size (at 10^12 rows, 256-row batches would
            # mean ~4e9 tiny files).  One part file + one partials row per
            # fragment block instead.
            partials = ds.map_batches(
                _DecodeWriteDerive(tmp_results, cfg.bloom_expected, cfg.ref_buckets,
                                   psnr_check=cfg.psnr_check, viol_dir=viol_dir),
                batch_format="pyarrow",
                batch_size=None,
                zero_copy_batch=True,
                **kw,
            ).take_all()
        n_rows = _parquet_rows(tmp_results)  # metadata only — no Ray job
        if not cfg.decode_concurrency:
            # fused mode wrote one part file per batch with content-addressed
            # names: reconcile written rows against the per-batch counts the
            # tasks reported — a residual cross-task tag collision (twin
            # byte-identical blocks of one fragment in DIFFERENT tasks, both
            # ordinal 0) would silently merge two parts; fail loudly instead.
            expected = sum(r["n_rows"] for r in partials)
            if n_rows != expected:
                raise RuntimeError(
                    f"narrow-results part collision in group {gid}: tasks reported "
                    f"{expected} rows but {n_rows} were written — two byte-identical "
                    "blocks mapped to one part file; rewrite the input fragment with "
                    "distinct row content or smaller fragments"
                )
        if cfg.distributed_violations:
            # listing already on disk as per-task part files; only counts here
            n_viol = sum(r["n_viol"] for r in partials)
            written_viol = _parquet_rows(tmp_viol)
            if written_viol != n_viol:
                raise RuntimeError(
                    f"violation part collision in group {gid}: tasks reported "
                    f"{n_viol} violations but {written_viol} were written — see "
                    "narrow-results collision note (_part_tag)"
                )
        else:
            viol_tables = [_ipc_read(r["viol"]) for r in partials if r["viol"] is not None]
            viol_all = (
                pa.concat_tables(viol_tables) if viol_tables else VIOLATION_SCHEMA.empty_table()
            )
            pq.write_table(viol_all, os.path.join(tmp_viol, "part-0.parquet"))
            n_viol = viol_all.num_rows

        tmp_annot = None
        if cfg.annotated_output:
            tmp_annot = paths["annotated"] + ".tmp"
            _clean(tmp_annot)
            annotated = ray.data.read_parquet(_expand([tmp_results])).map_batches(
                lambda b: annotate_from_masks(b, drop_masks=True), batch_format="pyarrow"
            )
            annotated.write_parquet(tmp_annot)

        merged = merge_partials(_rows_to_table([r for r in partials if r["stats"] is not None]))
        os.makedirs(os.path.dirname(paths["sketches"]), exist_ok=True)
        with open(paths["sketches"] + ".tmp", "wb") as fh:
            pickle.dump({pid: st.to_bytes() for pid, st in merged.items()}, fh)

        bloom = None
        for r in partials:
            if r["bloom"] is not None:
                b = bloom_from_bytes(r["bloom"])
                bloom = b if bloom is None else bloom.merge(b)
        if bloom is None:
            bloom = ShardedBloom(cfg.bloom_expected, n_shards=cfg.ref_buckets)
        os.makedirs(os.path.dirname(paths["bloom"]), exist_ok=True)
        with open(paths["bloom"] + ".tmp", "wb") as fh:
            fh.write(bloom.to_bytes())

        # atomic publish, then commit line (write-ahead ordering)
        with publish_lock:
            _clean(paths["results"])  # belt-and-braces: any existing target
            _clean(paths["violations"])  # dir is from an uncommitted attempt
            os.rename(tmp_results, paths["results"])
            os.rename(tmp_viol, paths["violations"])
            os.rename(paths["sketches"] + ".tmp", paths["sketches"])
            os.rename(paths["bloom"] + ".tmp", paths["bloom"])
            if tmp_annot is not None:
                _clean(paths["annotated"])
                os.rename(tmp_annot, paths["annotated"])
            manifest.commit(
                gid, group, rows=n_rows, violations=n_viol,
                sketches_bytes=os.path.getsize(paths["sketches"]),
                partitions=len(merged),
                bloom_bytes=os.path.getsize(paths["bloom"]),
            )

    par = _effective_group_parallelism(cfg)
    if par <= 1 or len(groups) <= 1:
        for i, group in enumerate(groups):
            process(base_gid + i, group)
    else:
        with ThreadPoolExecutor(max_workers=par) as ex:
            futures = [ex.submit(process, base_gid + i, g) for i, g in enumerate(groups)]
            for f in futures:
                f.result()
    return manifest


def _node_cpu_counts() -> list[int]:
    """Alive nodes' CPU counts from ray.nodes() — the multi-node shape the
    group-parallelism cap derives from (cluster_resources() alone hides how
    the CPUs are spread)."""
    import ray as _ray

    if not _ray.is_initialized():
        return []
    return [
        int(n["Resources"].get("CPU", 0))
        for n in _ray.nodes()
        if n.get("Alive") and n.get("Resources", {}).get("CPU")
    ]


def _effective_group_parallelism(cfg: RunConfig, node_cpus: list[int] | None = None) -> int:
    """Cap concurrent groups so in-flight decode actor pools never starve the
    read/write tasks (deadlock at small num_cpus).  Two bounds, derived from
    the PER-NODE resource shape (``node_cpus`` injectable for tests):

    - one spare CPU per in-flight group cluster-wide (the single-node rule:
      ``total // (decode_concurrency + 1)``), and
    - one spare CPU per NODE across all in-flight pools
      (``(total - n_nodes) // decode_concurrency``) — Ray packs actors, and a
      node walled solid with actors starves the reads that object locality
      pins there, even when another node has idle CPUs.

    On one node the second bound is slacker than the first, so single-node
    behavior is unchanged."""
    par = cfg.group_parallelism
    if par <= 1 or not cfg.decode_concurrency:
        return par  # fused task mode has no reserved pools -> no starvation
    if node_cpus is None:
        node_cpus = _node_cpu_counts()
    if not node_cpus:
        return par
    total = sum(node_cpus)
    cap_total = total // (cfg.decode_concurrency + 1)
    cap_nodes = (total - len(node_cpus)) // cfg.decode_concurrency
    return max(1, min(par, cap_total, cap_nodes))


def _gc_uncommitted(manifest: Manifest) -> None:
    """Remove group outputs (and .tmp leftovers) whose group_id never
    committed — they are partial state from a killed run."""
    import glob as _glob

    committed_gids = {e["group_id"] for e in manifest.committed()}
    for sub, is_dir in (("results", True), ("violations", True), ("annotated", True),
                        ("sketches", False), ("blooms", False)):
        for path in _glob.glob(os.path.join(manifest.out_dir, sub, "group-*")):
            name = os.path.basename(path)
            gid_str = name.split("-")[1].split(".")[0]
            try:
                gid = int(gid_str)
            except ValueError:
                continue
            if gid not in committed_gids or name.endswith(".tmp"):
                if os.path.isdir(path):
                    _clean(path)
                else:
                    os.remove(path)


def run_phase2(out_dir: str, captions_path: Optional[str] = None, reference_profile: Optional[ColumnStats] = None,
               cfg: RunConfig = RunConfig()) -> dict:
    """Global checks over committed narrow results; writes final outputs."""
    manifest = Manifest(out_dir)
    entries = manifest.committed()
    if not entries:
        raise RuntimeError(f"nothing committed under {out_dir}")
    result_dirs = [manifest.group_paths(e["group_id"])["results"] for e in entries]
    viol_dirs = [manifest.group_paths(e["group_id"])["violations"] for e in entries]
    results = ray.data.read_parquet(_expand(result_dirs))

    # which table-level checks run is DECLARED on the profile (TableRule
    # entries, images_profile by default declares all three) — phase 2 is the
    # dispatcher for the flagship's tuned implementations of those rules
    profile = cfg.profile or images_profile()
    rule_kinds = {r.kind for r in profile.table_rules}

    # dedup and referential are independent DAGs over the same narrow results;
    # dispatch them concurrently so their (mostly fixed) all-to-all overheads
    # overlap instead of serializing — phase 2 is the flagship's serial tail.
    distributed = cfg.distributed_violations

    def _dedup_job():
        # ONE distributed count pass (blob-bucketed exchange) feeds both the
        # duplicate filter and the skew report; only dup-group-sized
        # (k-sized) tables reach the driver — at 10^12 mostly-unique phashes
        # the full distinct-counts table never leaves the cluster.
        dup_tbl, top10, _n_hot = dup_counts_and_top_bucketed(
            results, 10, hot_threshold=cfg.hot_threshold
        )
        if "unique" not in rule_kinds:
            return top10, []
        dup_ds = duplicate_violations(results, hot_threshold=cfg.hot_threshold, counts=dup_tbl)
        if distributed:
            return top10, [dup_ds]  # stays a Dataset end to end
        return top10, [t for t in _ds_tables(dup_ds) if t.num_rows]

    def _ref_job():
        if not captions_path or "referential" not in rule_kinds:
            return None
        bloom = _merged_bloom(manifest, entries)
        captions = ray.data.read_parquet(captions_path)
        if distributed:
            return referential_violations_ds(
                captions, results, bloom, key="caption_id", n_buckets=cfg.ref_buckets,
                compare_col="caption",
            )
        return referential_violations(
            captions, results, bloom, key="caption_id", n_buckets=cfg.ref_buckets, compare_col="caption"
        )

    with ThreadPoolExecutor(max_workers=2) as ex:
        f_dedup = ex.submit(_dedup_job)
        f_ref = ex.submit(_ref_job)
        top10, extra_violations = f_dedup.result()
        ref = f_ref.result()

    # --- referential (image_id.ref) ------------------------------------------
    if distributed:
        if ref is not None:
            extra_violations.append(
                ref.map_batches(
                    lambda b: pa.table(
                        {PARTITION_COL: b[PARTITION_COL], "image_id": b["caption_id"],
                         "constraint_id": b["constraint_id"]}
                    ),
                    batch_format="pyarrow",
                )
            )
    elif ref is not None and ref.num_rows:
        ref = pa.table(
            {
                PARTITION_COL: ref[PARTITION_COL],
                "image_id": ref["caption_id"],
                "constraint_id": ref["constraint_id"],
            }
        )
        extra_violations.append(ref)

    # --- perceptual near-dups (optional) --------------------------------------
    # runs AFTER the two threaded DAGs rather than as a third concurrent one:
    # phase-2 concurrency stays at the tested 2-way overlap (rules.py has the
    # same conservative cap), and the radius join is off by default anyway.
    # Declared like every other table check — TableRule("neardup", "phash",
    # {"max_hamming": r}) on the profile — OR forced on by the explicit
    # cfg.phash_near_radius / --phash-near-radius knob (which wins on radius
    # when both are present; the knob is an explicit user request, so it runs
    # the stage even when the profile omits the rule).
    nd_rule = next((r for r in profile.table_rules if r.kind == "neardup"), None)
    near_radius = cfg.phash_near_radius or (
        int(nd_rule.params.get("max_hamming", 2)) if nd_rule is not None else 0
    )
    if near_radius > 0:
        nd_ds = neardup_violations(results, max_hamming=near_radius)
        if distributed:
            extra_violations.append(nd_ds)
        else:
            extra_violations.extend(t for t in _ds_tables(nd_ds) if t.num_rows)

    # --- stats + drift --------------------------------------------------------
    per_partition: dict[int, ColumnStats] = {}
    for e in entries:
        with open(manifest.group_paths(e["group_id"])["sketches"], "rb") as fh:
            for pid, blob in pickle.load(fh).items():
                st = ColumnStats.from_bytes(blob)
                per_partition[pid] = per_partition[pid].merge(st) if pid in per_partition else st
    if reference_profile is not None and "drift" in rule_kinds:
        for pid, _key, cid in drift_violations(per_partition, reference_profile, cfg.drift_threshold):
            extra_violations.append(
                pa.table(
                    {
                        PARTITION_COL: pa.array([pid], type=pa.int64()),
                        "image_id": pa.nulls(1, pa.string()),
                        "constraint_id": pa.array([cid], type=pa.string()),
                    }
                )
            )

    final_dir = os.path.join(out_dir, "final_violations")
    _clean(final_dir + ".tmp")
    os.makedirs(final_dir + ".tmp", exist_ok=True)
    if distributed:
        # --- distributed merge: committed per-task violation parts + the
        # dedup/referential Datasets + (tiny) drift tables union as a
        # streaming Dataset and write as partitioned parquet — the full
        # listing never exists in any single process.  Counts for the report
        # come from a read-back aggregate over the written parts.
        comps: list["ray.data.Dataset"] = []
        viol_parts = _expand(viol_dirs)
        if viol_parts:
            comps.append(ray.data.read_parquet(viol_parts))
        for x in extra_violations:
            comps.append(x if isinstance(x, ray.data.Dataset) else ray.data.from_arrow(x))
        if comps:
            norm = [
                c.map_batches(
                    lambda b: b.select(VIOLATION_SCHEMA.names).cast(VIOLATION_SCHEMA),
                    batch_format="pyarrow",
                )
                for c in comps
            ]
            ds = norm[0]
            for c in norm[1:]:
                ds = ds.union(c)
            ds.write_parquet(final_dir + ".tmp")
        if not _expand([final_dir + ".tmp"]):  # zero violations: keep the
            # empty-listing contract readable (pq.read_table needs >= 1 part)
            pq.write_table(
                VIOLATION_SCHEMA.empty_table(), os.path.join(final_dir + ".tmp", "part-0.parquet")
            )
        _replace_dir(final_dir)
        from ray.data.aggregate import Count

        # ONE grouped pass over the (possibly row-count-sized) listing feeds
        # all three report aggregates — (constraint, partition) cardinality
        # is tiny, so the reduce output is driver-safe even when the listing
        # is not
        vds = ray.data.read_parquet(_expand([final_dir]))
        cells = (
            vds.groupby(["constraint_id", PARTITION_COL])
            .aggregate(Count(alias_name="n"))
            .take_all()
        )
        n_viol_total = sum(r["n"] for r in cells)
        by_constraint: dict[str, int] = {}
        bad_parts = set()
        for r in cells:
            by_constraint[r["constraint_id"]] = by_constraint.get(r["constraint_id"], 0) + r["n"]
            bad_parts.add(r[PARTITION_COL])
        if not n_viol_total:
            by_constraint, bad_parts = {}, set()
    else:
        # --- small-listing default: driver-side merge into one sorted part --
        tables = [pq.read_table(f) for f in _expand(viol_dirs)]
        tables += [t.cast(VIOLATION_SCHEMA) for t in extra_violations]
        viol_final_t = pa.concat_tables([t for t in tables if t.num_rows]) if tables else None
        if viol_final_t is None or viol_final_t.num_rows == 0:
            viol_final_t = VIOLATION_SCHEMA.empty_table()
        pq.write_table(viol_final_t, os.path.join(final_dir + ".tmp", "part-0.parquet"))
        _replace_dir(final_dir)
        n_viol_total = viol_final_t.num_rows
        by_constraint = _count_by(viol_final_t, "constraint_id")
        bad_parts = set(viol_final_t[PARTITION_COL].to_pylist())

    stats_rows = [st.row(pid) for pid, st in sorted(per_partition.items())]
    stats_table = pa.Table.from_pylist(stats_rows)
    pq.write_table(stats_table, os.path.join(out_dir, "partition_stats.parquet"))

    # persist the merged global profile so THIS run can be the next run's
    # drift reference (north_star: "distribution-drift detection against a
    # reference profile"): load with ColumnStats.from_bytes / load_profile
    g_prof = global_stats(per_partition)
    if g_prof is not None:
        with open(os.path.join(out_dir, "global_profile.bin"), "wb") as fh:
            fh.write(g_prof.to_bytes())

    verdicts = {pid: (pid not in bad_parts) for pid in sorted(per_partition)}
    g = global_stats(per_partition)
    report = {
        "rows_scanned": sum(e["rows_scanned"] for e in entries),
        "violations": n_viol_total,
        "global_verdict": n_viol_total == 0,
        "partition_verdicts": {str(k): v for k, v in verdicts.items()},
        "violations_by_constraint": by_constraint,
        "hot_phash_top10": top10.to_pylist(),
        "global_distinct_image_id": round(g.unique["image_id"].estimate()) if g else 0,
    }
    with open(os.path.join(out_dir, "report.json"), "w") as fh:
        json.dump(report, fh, indent=2)
    return report


def run(img_dir: str, out_dir: str, captions_path: Optional[str] = None,
        reference_profile: Optional[ColumnStats] = None, cfg: RunConfig = RunConfig()) -> dict:
    run_phase1(img_dir, out_dir, cfg)
    return run_phase2(out_dir, captions_path, reference_profile, cfg)


def load_profile(path: str) -> ColumnStats:
    """Load a ``global_profile.bin`` written by a previous run (the drift
    reference input for :func:`run` / ``--reference`` in the CLI)."""
    with open(path, "rb") as fh:
        return ColumnStats.from_bytes(fh.read())


# ---------------------------------------------------------------- helpers
def _parquet_rows(path: str) -> int:
    """Row count from parquet footers — no Ray job, no data read."""
    import glob as _glob

    total = 0
    for f in _glob.glob(os.path.join(path, "*.parquet")):
        total += pq.read_metadata(f).num_rows
    return total


def _ipc_read(blob: bytes) -> pa.Table:
    import pyarrow.ipc as ipc

    return ipc.open_stream(blob).read_all()


def _ipc_write(table: pa.Table) -> bytes:
    import io

    import pyarrow.ipc as ipc

    sink = io.BytesIO()
    with ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    return sink.getvalue()


def _derive_group_outputs(
    results: "ray.data.Dataset", cfg: RunConfig, viol_dir: Optional[str] = None
) -> list[dict]:
    """One fused pass: per batch, emit (stats partial, bloom partial,
    violations-as-IPC) — amortizes Ray job startup across the three derived
    outputs instead of three separate dataset executions.

    The Bloom partial is SHARDED (``n_shards = cfg.ref_buckets``) and
    serializes only the shards this batch touched — the per-batch blob scales
    with the batch's bucket spread, not with ``bloom_expected`` (a monolithic
    partial at 10^12 expected keys would be ~1.2 TB per batch).

    ``viol_dir`` (distributed-violations mode): each batch's violations are
    written as the task's own parquet part file instead of riding back in the
    partials row — the driver sees a count, never the listing."""
    fused = _FusedDerive(cfg.bloom_expected, cfg.ref_buckets, viol_dir=viol_dir)
    return results.map_batches(fused, batch_format="pyarrow", zero_copy_batch=True).take_all()


class _FusedDerive:
    """Task-local derive callable: each Ray task deserializes its own copy, so
    ``_seq`` is a deterministic per-task batch ordinal (retry re-executes the
    same batch sequence → same ordinals → same retry-safe file names)."""

    def __init__(self, bloom_expected: int, bloom_shards: int, viol_dir: Optional[str] = None):
        self.bloom_expected = bloom_expected
        self.bloom_shards = bloom_shards
        self.viol_dir = viol_dir
        self._seq = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        seq, self._seq = self._seq, self._seq + 1
        return _derive_row(
            batch, self.bloom_expected, self.bloom_shards, viol_dir=self.viol_dir, seq=seq
        )


def _part_tag(t: pa.Table, seq: int = 0) -> str:
    """Retry-safe part-file tag for a block: CONTENT-ADDRESSED (md5 over the
    batch's Arrow IPC bytes + row count) plus the caller's per-task batch
    ordinal ``seq``.  A Ray task retry re-executes the same deterministic
    block sequence and overwrites its own files; distinct blocks get distinct
    names even when BYTE-IDENTICAL (a >block run of planted duplicate rows
    split into twin blocks within one task gets seq 0,1,... — without the
    ordinal the twins would share a name and one would silently overwrite the
    other, losing a whole block of rows).  The residual cross-task case (twin
    blocks of one fragment landing in different tasks, both seq 0) is caught
    by the row-count reconciliation in ``run_phase1`` and fails loudly."""
    import hashlib as _hl

    return f"{_hl.md5(_ipc_write(t) + str(t.num_rows).encode()).hexdigest()[:16]}-{seq}"


def _derive_row(
    batch: pa.Table,
    bloom_expected: int,
    bloom_shards: int,
    viol_dir: Optional[str] = None,
    seq: int = 0,
) -> pa.Table:
    """One narrow-results batch -> one partials row-group: (partition_id,
    stats blob) per partition present, plus a sharded-Bloom partial and the
    batch's violations as one Arrow IPC blob (or, with ``viol_dir``, written
    as this task's own parquet part — only the count returns).  ``seq`` is
    the caller's per-task batch ordinal, threaded into the violation part
    name so byte-identical twin batches don't collide (see ``_part_tag``).
    ``n_rows`` (first row) records the batch's row count for the
    reconciliation check in ``run_phase1``."""
    part_rows = sketch_partials(batch)
    stats_blobs = part_rows["stats"].to_pylist()
    pids = part_rows[PARTITION_COL].to_pylist()
    b = ShardedBloom(bloom_expected, n_shards=bloom_shards)
    t = batch.filter(batch["decodable"]) if "decodable" in batch.column_names else batch
    if t.num_rows:
        b.add(t["image_id"])
    viol = explode_violations(batch)
    if viol_dir is not None:
        if viol.num_rows:
            pid = pids[0] if pids else -1
            pq.write_table(
                viol.cast(VIOLATION_SCHEMA),
                os.path.join(viol_dir, f"viol-{pid}-{_part_tag(batch, seq)}.parquet"),
            )
        viol_blob = None
    else:
        viol_blob = _ipc_write(viol)
    n = max(len(pids), 1)
    return pa.table(
        {
            PARTITION_COL: pa.array(pids or [-1], type=pa.int64()),
            "stats": pa.array(stats_blobs or [None], type=pa.binary()),
            "bloom": pa.array([b.to_bytes()] + [None] * (n - 1), type=pa.binary()),
            "viol": pa.array([viol_blob] + [None] * (n - 1), type=pa.binary()),
            "n_viol": pa.array([viol.num_rows] + [0] * (n - 1), type=pa.int64()),
            "n_rows": pa.array([batch.num_rows] + [0] * (n - 1), type=pa.int64()),
        }
    )


class _DecodeWriteDerive:
    """Fused-mode tail stage (task-based callable): decode the batch, write
    the narrow results as this task's own parquet part file, and return the
    derive partials row — so the whole of phase 1 is ONE operator chain and
    the wide payload bytes live and die inside a single task."""

    def __init__(self, out_dir: str, bloom_expected: int, bloom_shards: int,
                 psnr_check: bool = False, viol_dir: Optional[str] = None):
        self.out_dir = out_dir
        self.bloom_expected = bloom_expected
        self.bloom_shards = bloom_shards
        self.viol_dir = viol_dir
        self.decode = DecodeCheck(psnr_check=psnr_check)
        self._seq = 0  # per-task batch ordinal (instance is deserialized
        # fresh per Ray task; a retry re-runs the same block sequence)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {PARTITION_COL: pa.array([], pa.int64()), "stats": pa.array([], pa.binary()),
                 "bloom": pa.array([], pa.binary()), "viol": pa.array([], pa.binary()),
                 "n_viol": pa.array([], pa.int64()), "n_rows": pa.array([], pa.int64())}
            )
        seq, self._seq = self._seq, self._seq + 1
        narrow = self.decode(batch)
        # DETERMINISTIC part name — content hash + per-task batch ordinal: a
        # Ray task RETRY re-executes the same block sequence and overwrites
        # its own files instead of duplicating them (uuid names would
        # double-count every row of a retried block downstream; a truncated
        # file from a mid-write kill is replaced, not accumulated), while
        # byte-identical twin blocks within a task (a >block run of planted
        # duplicate rows) get distinct ordinals instead of silently merging.
        pid = narrow[PARTITION_COL][0].as_py() if PARTITION_COL in narrow.column_names else 0
        tag = _part_tag(narrow, seq)
        pq.write_table(narrow, os.path.join(self.out_dir, f"part-{pid}-{tag}.parquet"))
        return _derive_row(
            narrow, self.bloom_expected, self.bloom_shards, viol_dir=self.viol_dir, seq=seq
        )


def _clean(path: str) -> None:
    import shutil

    if os.path.exists(path):
        shutil.rmtree(path)


def _expand(dirs: list[str]) -> list[str]:
    """read_parquet accepts one dir but not dirs inside a list — expand."""
    import glob

    out: list[str] = []
    for d in dirs:
        out.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))) if os.path.isdir(d) else [d])
    return out


def _rows_to_table(rows: list[dict]) -> pa.Table:
    return pa.table(
        {
            PARTITION_COL: pa.array([r[PARTITION_COL] for r in rows], type=pa.int64()),
            "stats": pa.array([r["stats"] for r in rows], type=pa.binary()),
        }
    )


def _ds_tables(ds: "ray.data.Dataset") -> list[pa.Table]:
    import ray as _ray

    # materialize first: to_arrow_refs on a lazy plan would execute it twice
    # (full pass + an internal limit-1 schema probe)
    return [_ray.get(r) for r in ds.materialize().to_arrow_refs()]


def _merged_bloom(manifest: Manifest, entries: list[dict]):
    merged = None
    for e in entries:
        with open(manifest.group_paths(e["group_id"])["bloom"], "rb") as fh:
            b = bloom_from_bytes(fh.read())  # version-stamped: a pre-scheme
            # checkpoint raises here instead of merging into false negatives
        merged = b if merged is None else merged.merge(b)
    return merged


def _replace_dir(final_dir: str) -> None:
    import shutil

    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)
    os.rename(final_dir + ".tmp", final_dir)


def _count_by(table: pa.Table, col: str) -> dict[str, int]:
    import collections

    return dict(collections.Counter(table[col].to_pylist()))
