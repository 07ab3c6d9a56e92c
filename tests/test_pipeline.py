"""Flagship pipeline end-to-end: exact oracle match of the violation listing,
per-partition verdicts, partition stats, drift, and checkpoint/resume
(north_rule: killed run resumes from last committed fragment without
recomputation)."""

import json
import os

import pyarrow.parquet as pq
import pytest

from rayval.pipelines.manifest import Manifest
from rayval.pipelines.validate_images import RunConfig, run, run_phase1, run_phase2
from rayval.sources.images import generate_images
from rayval.stages.stats import ColumnStats

CFG = RunConfig(group_size=3, decode_concurrency=2, hot_threshold=3, bloom_expected=10_000)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory, ray_session):
    return generate_images(str(tmp_path_factory.mktemp("imgs")), n=400, fragments=8, seed=42)


@pytest.fixture(scope="module")
def finished_run(data_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("run"))
    report = run(data_dir + "/images", out, captions_path=data_dir + "/captions.parquet", cfg=CFG)
    return data_dir, out, report


def _violations_set(path):
    t = pq.read_table(path).to_pandas()
    return set(map(tuple, t.values))


def test_exact_violation_match(finished_run):
    data_dir, out, _ = finished_run
    got = _violations_set(os.path.join(out, "final_violations"))
    exp = _violations_set(os.path.join(data_dir, "expected_violations.parquet"))
    assert got == exp  # exact listing, order-insensitive (north_star)


def test_per_partition_verdicts(finished_run):
    data_dir, out, report = finished_run
    exp = pq.read_table(os.path.join(data_dir, "expected_violations.parquet")).to_pandas()
    bad_parts = set(exp[exp.partition_id >= 0].partition_id)
    for pid_str, verdict in report["partition_verdicts"].items():
        assert verdict == (int(pid_str) not in bad_parts)
    assert report["global_verdict"] is False
    assert report["rows_scanned"] == 400


def test_partition_stats_output(finished_run):
    _, out, _ = finished_run
    stats = pq.read_table(os.path.join(out, "partition_stats.parquet")).to_pandas()
    assert len(stats) == 8  # one row per fragment
    assert {"count", "w_min", "w_max", "w_p50", "image_id_distinct", "caption_len_null"} <= set(stats.columns)
    assert stats["count"].sum() == 400
    # stored w has planted 0 / 1e6 outliers in some partitions
    assert stats["w_max"].max() == 1_000_000


def test_resume_skips_committed(data_dir, tmp_path):
    out = str(tmp_path / "resume_run")
    # simulate a kill: process only the first 2 groups' worth by truncating
    # the fragment list via a partial manifest run
    frags = sorted(os.listdir(data_dir + "/images"))
    partial_dir = str(tmp_path / "partial_imgs")
    os.makedirs(partial_dir)
    for f in frags[:5]:
        os.symlink(os.path.join(data_dir, "images", f), os.path.join(partial_dir, f))
    run_phase1(partial_dir, out, CFG)
    m = Manifest(out)
    committed_before = m.committed()
    assert len(m.committed_fragments()) == 5

    # "restart": full fragment list, same out dir — committed groups skipped
    for f in frags[5:]:
        os.symlink(os.path.join(data_dir, "images", f), os.path.join(partial_dir, f))
    run_phase1(partial_dir, out, CFG)
    committed_after = Manifest(out).committed()
    # previously committed groups untouched (identical commit records)
    assert committed_after[: len(committed_before)] == committed_before
    assert Manifest(out).committed_fragments() == set(frags)

    # final verdict identical to a clean one-shot run
    report = run_phase2(out, captions_path=data_dir + "/captions.parquet", cfg=CFG)
    got = _violations_set(os.path.join(out, "final_violations"))
    exp = _violations_set(os.path.join(data_dir, "expected_violations.parquet"))
    assert got == exp


def test_drift_detection(data_dir, tmp_path, ray_session):
    out = str(tmp_path / "drift_run")
    run_phase1(data_dir + "/images", out, CFG)
    # reference profile drawn from the data itself -> no drift
    import pickle

    m = Manifest(out)
    ref = None
    for e in m.committed():
        with open(m.group_paths(e["group_id"])["sketches"], "rb") as fh:
            for pid, blob in pickle.load(fh).items():
                st = ColumnStats.from_bytes(blob)
                ref = st if ref is None else ref.merge(st)
    report = run_phase2(out, reference_profile=ref, cfg=CFG)
    assert not any(c.startswith("stats.drift") for c in report["violations_by_constraint"])

    # shifted reference -> every partition drifts on w
    shifted = ColumnStats()
    import numpy as np
    import pyarrow as pa

    fake = pa.table(
        {
            "w": pa.array(np.arange(5000, 6000), type=pa.int32()),
            "h": pa.array(np.arange(5000, 6000), type=pa.int32()),
            "caption_len": pa.array(np.arange(1000), type=pa.int32()),
            "image_id": pa.array([f"x{i}" for i in range(1000)]),
            "phash": pa.array(np.arange(1000), type=pa.int64()),
        }
    )
    shifted.update(fake)
    report2 = run_phase2(out, reference_profile=shifted, cfg=CFG)
    assert "stats.drift.w" in report2["violations_by_constraint"]


def test_report_written(finished_run):
    _, out, _ = finished_run
    with open(os.path.join(out, "report.json")) as fh:
        report = json.load(fh)
    assert report["violations"] > 0
    # hot bucket present in skew report: top phash has ~1% of rows
    top = report["hot_phash_top10"]
    assert top[0]["n"] >= 4


def test_annotated_output(data_dir, tmp_path, ray_session):
    """with-status analog in the flagship (parser.clj:345-371, 384-400): the
    annotated/ parquet carries struct<value,status> per validated column plus
    row_valid, and round-trips a planted violation."""
    import pyarrow as pa
    import pyarrow.compute as pc

    out = str(tmp_path / "annot_run")
    cfg = RunConfig(group_size=3, decode_concurrency=2, hot_threshold=3,
                    bloom_expected=10_000, annotated_output=True)
    run_phase1(data_dir + "/images", out, cfg)
    m = Manifest(out)
    annot_dirs = [m.group_paths(e["group_id"])["annotated"] for e in m.committed()]
    assert all(os.path.isdir(d) for d in annot_dirs)
    t = pa.concat_tables(
        pq.read_table(os.path.join(d, f)) for d in annot_dirs for f in sorted(os.listdir(d))
    )
    assert t.num_rows == 400
    # every validated metadata column is struct<value, status>
    for col in ("w", "h", "fmt", "caption", "image_id"):
        ft = t.schema.field(col).type
        assert pa.types.is_struct(ft) and ft.num_fields == 2, col
    assert "row_valid" in t.column_names
    # planted w-range violations (stored w = 0 or 1e6) must carry status=False
    w_val = pc.struct_field(t["w"], "value")
    w_ok = pc.struct_field(t["w"], "status")
    bad = t.filter(pc.or_(pc.equal(w_val, 0), pc.equal(w_val, 1_000_000)))
    assert bad.num_rows > 0
    assert not pc.any(pc.struct_field(bad["w"], "status")).as_py()
    # row_valid == AND of all statuses for the checked columns where present
    row_valid = t["row_valid"].to_pandas()
    assert (~row_valid[~w_ok.to_pandas()]).all()


def test_resume_after_mid_publish_kill(data_dir, tmp_path, ray_session):
    """ADVICE fix: a kill between the results rename and the manifest commit
    leaves a published-but-uncommitted group; resume must redo it cleanly
    (no ENOTEMPTY) and converge to the same violation listing."""
    out = str(tmp_path / "crash_run")
    run_phase1(data_dir + "/images", out, CFG)
    m = Manifest(out)
    # simulate the crash window: results/violations dirs exist for a group
    # whose manifest line is missing
    lines = open(m.path).read().strip().splitlines()
    with open(m.path, "w") as fh:
        fh.write("\n".join(lines[:-1]) + "\n")
    # rerun: must not raise, must recommit the group
    run_phase1(data_dir + "/images", out, CFG)
    m2 = Manifest(out)
    assert m2.committed_fragments() == {os.path.basename(f) for f in
                                        sorted(os.listdir(data_dir + "/images"))}
    report = run_phase2(out, captions_path=data_dir + "/captions.parquet", cfg=CFG)
    got = _violations_set(os.path.join(out, "final_violations"))
    exp = _violations_set(os.path.join(data_dir, "expected_violations.parquet"))
    assert got == exp


def test_fused_decode_matches_actor_pool(finished_run, tmp_path):
    """decode_concurrency=None (fused read->decode task mode, the bench/scale
    default) must produce the exact same final violation listing as the
    actor-pool mode the rest of this module runs."""
    data_dir, _, _ = finished_run
    out = str(tmp_path / "fused")
    run(
        data_dir + "/images",
        out,
        captions_path=data_dir + "/captions.parquet",
        cfg=RunConfig(group_size=3, decode_concurrency=None, hot_threshold=3, bloom_expected=10_000),
    )
    got = _violations_set(os.path.join(out, "final_violations"))
    exp = _violations_set(os.path.join(data_dir, "expected_violations.parquet"))
    assert got == exp


def test_dedup_counts_stay_distributed(ray_session):
    """The dup filter runs distributed (n > 1 before any collect): the driver
    sees only duplicated keys, the top-k report comes from a per-block
    combiner, and violations cover every member of every dup group."""
    import pyarrow as pa
    import ray.data

    from rayval.stages.dedup import (
        dup_counts_and_top, duplicate_counts, duplicate_violations, phash_counts_ds,
        top_hot_buckets,
    )

    t = pa.table(
        {
            "phash": pa.array([1, 1, 2, 3, 3, 3, 4], type=pa.int64()),
            "image_id": [f"img-{i}" for i in range(7)],
            "partition_id": pa.array([0] * 7, type=pa.int64()),
        }
    )
    counts_ds = phash_counts_ds(ray.data.from_arrow(t)).materialize()
    dup = duplicate_counts(counts_ds)
    assert dict(zip(dup["phash"].to_pylist(), dup["n"].to_pylist())) == {1: 2, 3: 3}
    top = top_hot_buckets(counts_ds, 2)
    assert top["phash"].to_pylist() == [3, 1] and top["n"].to_pylist() == [3, 2]
    viol = duplicate_violations(ray.data.from_arrow(t), counts=dup).take_all()
    assert sorted(r["image_id"] for r in viol) == ["img-0", "img-1", "img-3", "img-4", "img-5"]
    # fused single-pass variant agrees with the two separate passes
    dup2, top2 = dup_counts_and_top(phash_counts_ds(ray.data.from_arrow(t)), 2)
    assert dict(zip(dup2["phash"].to_pylist(), dup2["n"].to_pylist())) == {1: 2, 3: 3}
    assert top2["phash"].to_pylist() == [3, 1] and top2["n"].to_pylist() == [3, 2]
    # blob-bucketed exchange variant (the flagship's phase-2 path) agrees too
    from rayval.stages.dedup import dup_counts_and_top_bucketed

    dup3, top3, n_hot = dup_counts_and_top_bucketed(
        ray.data.from_arrow(t), 2, n_buckets=4, hot_threshold=3
    )
    assert dict(zip(dup3["phash"].to_pylist(), dup3["n"].to_pylist())) == {1: 2, 3: 3}
    assert top3["phash"].to_pylist() == [3, 1] and top3["n"].to_pylist() == [3, 2]
    assert n_hot == 1  # phash 3 has count 3 >= hot_threshold


def test_profile_roundtrip_drift(data_dir, tmp_path, ray_session):
    """A run's persisted global_profile.bin used as the NEXT run's drift
    reference: same data -> no drift flags."""
    from rayval.pipelines.validate_images import load_profile

    out_a = str(tmp_path / "run_a")
    run(data_dir + "/images", out_a, cfg=CFG)
    ref = load_profile(os.path.join(out_a, "global_profile.bin"))
    out_b = str(tmp_path / "run_b")
    report = run(data_dir + "/images", out_b, reference_profile=ref, cfg=CFG)
    assert not any(c.startswith("stats.drift") for c in report["violations_by_constraint"])
    assert os.path.exists(os.path.join(out_b, "global_profile.bin"))


def test_dedup_bucketed_exchange_edges(ray_session):
    """Blob-bucketed count exchange edge cases: negative phashes (uint64
    bucket view), cross-block partial merging, all-undecodable input, and an
    empty table — none may crash, all must match brute force."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rayval.stages.dedup import dup_counts_and_top_bucketed

    # same key split across blocks, negative keys, a hot key
    t1 = pa.table({"phash": pa.array([-5, -5, 7, 9], type=pa.int64())})
    t2 = pa.table({"phash": pa.array([-5, 9, 9, 8], type=pa.int64())})
    dup, top, n_hot = dup_counts_and_top_bucketed(
        ray.data.from_arrow([t1, t2]), k=3, n_buckets=3, hot_threshold=3
    )
    assert dict(zip(dup["phash"].to_pylist(), dup["n"].to_pylist())) == {-5: 3, 9: 3}
    assert top["phash"].to_pylist()[:2] in ([-5, 9], [9, -5]) and top["n"].to_pylist()[:2] == [3, 3]
    assert n_hot == 2

    # all rows filtered out by decodable -> empty results, no crash
    t3 = pa.table(
        {"phash": pa.array([1, 1], type=pa.int64()), "decodable": pa.array([False, False])}
    )
    dup, top, n_hot = dup_counts_and_top_bucketed(ray.data.from_arrow(t3), k=2, n_buckets=4)
    assert dup.num_rows == 0 and top.num_rows == 0 and n_hot == 0

    # randomized brute-force agreement across many blocks/buckets
    rng = np.random.default_rng(11)
    keys = rng.integers(-50, 50, size=400)
    blocks = [
        pa.table({"phash": pa.array(keys[i : i + 40], type=pa.int64())})
        for i in range(0, 400, 40)
    ]
    dup, top, _ = dup_counts_and_top_bucketed(ray.data.from_arrow(blocks), k=5, n_buckets=7)
    u, c = np.unique(keys, return_counts=True)
    expect = {int(k): int(n) for k, n in zip(u, c) if n > 1}
    assert dict(zip(dup["phash"].to_pylist(), dup["n"].to_pylist())) == expect
    exp_top_n = sorted(c, reverse=True)[:5]
    assert top["n"].to_pylist() == exp_top_n


def test_psnr_fidelity_wired_through_flagship(data_dir, tmp_path, ray_session):
    """cfg.psnr_check=True adds the per-row bytes.fidelity check (input_hint
    PSNR>=40dB) to the fused decode; the generator's payloads are canonical,
    so clean rows contribute no fidelity violations and the mask column
    lands in the narrow results."""
    import glob

    out = str(tmp_path / "fid_run")
    cfg = RunConfig(group_size=4, psnr_check=True)
    report = run(data_dir + "/images", out, cfg=cfg)
    f = sorted(glob.glob(out + "/results/**/*.parquet", recursive=True))[0]
    cols = pq.read_schema(f).names
    assert "ok__bytes.fidelity" in cols
    assert "bytes.fidelity" not in report["violations_by_constraint"]


def test_manifest_lineage_metrics(finished_run):
    """north_rule: each partition's checkpoint records rows scanned, sketches
    serialized, violations emitted — the commit lines must carry all three."""
    _, out, _ = finished_run
    with open(os.path.join(out, "manifest.jsonl")) as fh:
        entries = [json.loads(l) for l in fh if l.strip()]
    assert entries and sum(e["rows_scanned"] for e in entries) == 400
    for e in entries:
        assert e["sketches_serialized_bytes"] > 0
        assert e["bloom_bytes"] > 0
        assert e["partitions"] >= 1
        assert e["violations_emitted"] >= 0


def test_distributed_violations_matches_default(finished_run, tmp_path):
    """cfg.distributed_violations flips the listing to per-task parquet parts
    (phase 1) + a streaming Dataset union (phase 2) — same exact listing and
    report counts as the driver-merged default."""
    import glob

    data_dir, out_default, report_default = finished_run
    out = str(tmp_path / "dist_run")
    cfg = RunConfig(group_size=3, decode_concurrency=2, hot_threshold=3,
                    bloom_expected=10_000, distributed_violations=True)
    report = run(data_dir + "/images", out, captions_path=data_dir + "/captions.parquet", cfg=cfg)
    assert _violations_set(os.path.join(out, "final_violations")) == _violations_set(
        os.path.join(out_default, "final_violations")
    )
    assert report["violations"] == report_default["violations"]
    assert report["violations_by_constraint"] == report_default["violations_by_constraint"]
    assert report["partition_verdicts"] == report_default["partition_verdicts"]
    # phase-1 listings are per-task parts, never a driver-written part-0
    group_parts = glob.glob(os.path.join(out, "violations", "group-*", "*.parquet"))
    assert group_parts and all(os.path.basename(p).startswith("viol-") for p in group_parts)


def test_distributed_violations_fused_mode(finished_run, tmp_path):
    """The flag must also hold in FUSED task mode (decode_concurrency=None,
    the default): violations written per fused task, same listing."""
    import glob

    data_dir, out_default, report_default = finished_run
    out = str(tmp_path / "dist_fused")
    cfg = RunConfig(group_size=3, decode_concurrency=None, hot_threshold=3,
                    bloom_expected=10_000, distributed_violations=True)
    report = run(data_dir + "/images", out, captions_path=data_dir + "/captions.parquet", cfg=cfg)
    assert _violations_set(os.path.join(out, "final_violations")) == _violations_set(
        os.path.join(out_default, "final_violations")
    )
    assert report["violations"] == report_default["violations"]
    group_parts = glob.glob(os.path.join(out, "violations", "group-*", "*.parquet"))
    assert group_parts and all(os.path.basename(p).startswith("viol-") for p in group_parts)


def test_distributed_violations_wholesale(data_dir, tmp_path):
    """Violation rate ~1.0 (every row fails an impossible image_id pattern):
    the distributed path writes and counts the full listing without the
    driver ever concatenating it — the wholesale-failure scenario that the
    driver-merged default exists to avoid at 10^12 rows."""
    import glob

    from rayval.constraints import Enum, Field as F, MaxLength, Pattern, Profile, Range, Restriction
    from rayval.constraints.profile import TableRule
    from rayval.sources.images import MAX_CAPTION

    impossible = Profile(
        "images",
        [
            F("image_id", Pattern(r"never-\d{40}"), required=True),
            F("bytes", required=True),
            F("w", Restriction("int", [Range(min=1, max=8192)])),
            F("h", Restriction("int", [Range(min=1, max=8192)])),
            F("fmt", Enum(["jpeg", "png", "webp"])),
            F("caption", MaxLength(MAX_CAPTION), required=True),
            F("phash", "long"),
        ],
        kind="all",
        key="image_id",
        table_rules=[TableRule("unique", "phash")],
    )
    out = str(tmp_path / "wholesale")
    cfg = RunConfig(group_size=3, decode_concurrency=2, hot_threshold=3,
                    bloom_expected=10_000, profile=impossible, distributed_violations=True)
    report = run(data_dir + "/images", out, cfg=cfg)
    listing = pq.read_table(os.path.join(out, "final_violations"))
    # every non-null image_id row violates the pattern -> rate ~1.0
    assert report["violations"] == listing.num_rows >= 400
    assert report["violations_by_constraint"]["image_id.pattern"] >= 390
    assert report["global_verdict"] is False
    assert all(v is False for v in report["partition_verdicts"].values())
    group_parts = glob.glob(os.path.join(out, "violations", "group-*", "*.parquet"))
    assert group_parts and all(os.path.basename(p).startswith("viol-") for p in group_parts)


def test_distributed_violations_resume(data_dir, tmp_path):
    """Resume semantics are unchanged under distributed_violations: committed
    groups (and their per-task violation parts) are skipped on restart, and
    the final listing still matches the planted oracle."""
    cfg = RunConfig(group_size=3, decode_concurrency=2, hot_threshold=3,
                    bloom_expected=10_000, distributed_violations=True)
    out = str(tmp_path / "dist_resume")
    frags = sorted(os.listdir(data_dir + "/images"))
    partial_dir = str(tmp_path / "dist_partial_imgs")
    os.makedirs(partial_dir)
    for f in frags[:5]:
        os.symlink(os.path.join(data_dir, "images", f), os.path.join(partial_dir, f))
    run_phase1(partial_dir, out, cfg)
    committed_before = Manifest(out).committed()
    for f in frags[5:]:
        os.symlink(os.path.join(data_dir, "images", f), os.path.join(partial_dir, f))
    run_phase1(partial_dir, out, cfg)
    assert Manifest(out).committed()[: len(committed_before)] == committed_before
    run_phase2(out, captions_path=data_dir + "/captions.parquet", cfg=cfg)
    got = _violations_set(os.path.join(out, "final_violations"))
    exp = _violations_set(os.path.join(data_dir, "expected_violations.parquet"))
    assert got == exp


def test_twin_blocks_get_distinct_parts(data_dir, tmp_path):
    """Byte-identical twin batches within one task must write DISTINCT part
    files: the content hash alone would map both to one name and one block's
    rows would silently vanish (the planted-duplicate >batch_size scenario);
    the per-task ordinal in _part_tag disambiguates while staying retry-safe
    (a retried task re-runs the same batch sequence -> same ordinals)."""
    import glob

    import pyarrow as pa

    from rayval.constraints.profile import PARTITION_COL
    from rayval.pipelines.validate_images import _DecodeWriteDerive, _part_tag

    frag = sorted(glob.glob(os.path.join(data_dir, "images", "*.parquet")))[0]
    t = pq.read_table(frag).slice(0, 4)
    t = t.append_column(PARTITION_COL, pa.array([0] * 4, type=pa.int64()))
    out = str(tmp_path / "twin_parts")
    viol = str(tmp_path / "twin_viol")
    os.makedirs(out)
    os.makedirs(viol)
    stage = _DecodeWriteDerive(out, bloom_expected=1000, bloom_shards=4, viol_dir=viol)
    r1 = stage(t)
    r2 = stage(t)  # byte-identical twin batch
    parts = glob.glob(os.path.join(out, "*.parquet"))
    assert len(parts) == 2, "twin batches merged into one part file"
    assert sum(pq.read_metadata(p).num_rows for p in parts) == 8
    assert r1["n_rows"].to_pylist()[0] == 4 and r2["n_rows"].to_pylist()[0] == 4
    assert _part_tag(t, 0) != _part_tag(t, 1)


def test_group_parallelism_cap_multi_node():
    """The concurrent-groups cap derives from the per-node CPU shape
    (injectable node list; on a real cluster it comes from ray.nodes()):
    single-node behavior unchanged, and on multiple small nodes the cap
    tightens so every node keeps a spare CPU for reads."""
    from rayval.pipelines.validate_images import _effective_group_parallelism

    big = RunConfig(group_parallelism=8, decode_concurrency=2)
    # one 32-cpu node: the old single-node rule (32 // 3 = 10, so par wins)
    assert _effective_group_parallelism(big, node_cpus=[32]) == 8
    # two 4-cpu nodes: total rule 8//3=2 caps before the per-node rule (3)
    assert _effective_group_parallelism(big, node_cpus=[4, 4]) == 2
    # four 2-cpu nodes with wide pools: (8-4)//2=2 per-node rule binds
    wide = RunConfig(group_parallelism=8, decode_concurrency=2)
    assert _effective_group_parallelism(wide, node_cpus=[2, 2, 2, 2]) == 2
    # degenerate: pool wider than the cluster still runs one group
    tiny = RunConfig(group_parallelism=4, decode_concurrency=8)
    assert _effective_group_parallelism(tiny, node_cpus=[4]) == 1
    # fused mode (no reserved pools): never capped
    fused = RunConfig(group_parallelism=4, decode_concurrency=None)
    assert _effective_group_parallelism(fused, node_cpus=[2]) == 4


def test_phash_neardups_vs_bruteforce(ray_session):
    """Pigeonhole-banded Hamming join == numpy brute force on a seeded set
    with planted flips at d = 0..4, nulls, and multi-block input (pairs must
    meet across blocks via the band exchange)."""
    import itertools

    import numpy as np
    import pyarrow as pa
    import ray.data

    from rayval.functions.phash import _popcount64
    from rayval.stages.dedup import phash_neardups

    rng = np.random.default_rng(99)
    base = rng.integers(0, 2**64, size=80, dtype=np.uint64)
    ph = [int(v) for v in base.view(np.int64)]
    for j, d in enumerate([1, 1, 2, 2, 3, 3, 4, 4, 0, 0]):
        m = np.uint64(0)
        for bit in rng.choice(64, size=d, replace=False):
            m |= np.uint64(1) << np.uint64(bit)
        ph.append(int((base[j] ^ m).view(np.int64)))
    ph += [None, None]
    ids = [f"i{k:04d}" for k in range(len(ph))]
    t = pa.table({"image_id": pa.array(ids), "phash": pa.array(ph, type=pa.int64())})
    got = phash_neardups(
        ray.data.from_arrow(t).repartition(6), max_hamming=3
    )
    valid = [(i, p) for i, p in zip(ids, ph) if p is not None]
    exp = sorted(
        (a, b, int(_popcount64(np.array([np.uint64(np.int64(x)) ^ np.uint64(np.int64(y))]))[0]))
        for (a, x), (b, y) in itertools.combinations(valid, 2)
        if int(_popcount64(np.array([np.uint64(np.int64(x)) ^ np.uint64(np.int64(y))]))[0]) <= 3
    )
    assert sorted(zip(got["a"].to_pylist(), got["b"].to_pylist(), got["hamming"].to_pylist())) == exp
    assert len(exp) >= 6  # the planted d<=3 rows all surfaced


def test_phash_neardups_hot_bucket_clique(ray_session):
    """An identical-phash clique LARGER than hot_cap still connects: the
    hot-bucket guard emits representative->member chain edges (same
    connected components as the full clique) instead of O(b^2) pairs."""
    import pyarrow as pa
    import ray.data

    from rayval.stages.dedup import phash_neardups

    n = 12
    ids = [f"c{k:03d}" for k in range(n)]
    t = pa.table(
        {"image_id": pa.array(ids), "phash": pa.array([12345] * n, type=pa.int64())}
    )
    got = phash_neardups(ray.data.from_arrow(t).repartition(3), max_hamming=3, hot_cap=4)
    pairs = set(zip(got["a"].to_pylist(), got["b"].to_pylist()))
    assert all(h == 0 for h in got["hamming"].to_pylist())
    # chain edges: every non-representative member pairs with the min key
    assert {("c000", m) for m in ids[1:]} <= pairs


def test_neardup_violations_unit(ray_session):
    """neardup_violations flags exactly the 1..radius-bit members: exact
    dups (hamming 0) are phash.unique's and stay out; nulls never match."""
    import pyarrow as pa
    import ray.data

    from rayval.stages.dedup import neardup_violations

    t = pa.table(
        {
            "partition_id": pa.array([0, 0, 1, 1, 1, 0, 1], type=pa.int64()),
            "image_id": [f"n{i}" for i in range(7)],
            # n0/n1: 1 bit apart (members); n2/n3: identical (exact dup,
            # NOT near); n4: 3 bits from n0 / 4 from n1 (outside radius 2);
            # n5: null; n6: far from everything (verified pairwise)
            "phash": pa.array(
                [
                    0x123456789ABCDEF0,
                    0x123456789ABCDEF0 ^ 1,
                    0x0F0F00FF33CC55AA,
                    0x0F0F00FF33CC55AA,
                    0x123456789ABCDEF0 ^ 0b1110,
                    None,
                    0x7EDCBA9876543210,
                ],
                type=pa.int64(),
            ),
        }
    )
    out = neardup_violations(
        ray.data.from_arrow(t).repartition(3), max_hamming=2
    ).take_all()
    assert sorted(r["image_id"] for r in out) == ["n0", "n1"]
    assert all(r["constraint_id"] == "phash.neardup" for r in out)


def test_flagship_phash_near_radius(data_dir, tmp_path, ray_session):
    """Flagship with phash_near_radius on: the phash.neardup listing equals
    a brute-force Hamming scan of the committed narrow results (whatever
    pairs the seeded generator produced — engine == brute force, exactly)."""
    import glob

    import numpy as np

    from rayval.functions.phash import _popcount64

    out = str(tmp_path / "near_out")
    cfg = RunConfig(group_size=3, decode_concurrency=2, hot_threshold=3,
                    bloom_expected=10_000, phash_near_radius=8)
    run(data_dir + "/images", out, captions_path=data_dir + "/captions.parquet", cfg=cfg)
    res = pq.read_table(
        glob.glob(os.path.join(out, "results", "group-*", "*.parquet")),
        columns=["image_id", "phash", "decodable"],
    )
    # ground truth mirrors the stage: only decodable rows participate (an
    # undecodable row keeps its stored phash in the narrow results, but that
    # hash is untrustworthy and the row is already flagged bytes.decodable)
    res = res.filter(res["decodable"])
    res = res.filter(res["phash"].is_valid())
    ids = np.array(res["image_id"].to_pylist())
    ph = res["phash"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    x = ph[:, None] ^ ph[None, :]
    d = _popcount64(x.ravel()).reshape(x.shape)
    near = (d >= 1) & (d <= 8)
    np.fill_diagonal(near, False)
    exp = set(ids[near.any(axis=1)])
    got = {
        r[1]
        for r in _violations_set(os.path.join(out, "final_violations"))
        if r[2] == "phash.neardup"
    }
    assert got == exp
    assert exp, "seeded generator produced no <=8-bit pairs; widen the radius"


def test_neardup_violations_hot_clique_all_flagged(ray_session):
    """A >hot_cap identical-phash clique with one 1-bit variant: EVERY clique
    member is within 1 bit of the variant, so all must be flagged — the pair
    join only emits d=0 chain edges inside the clique plus one (rep, variant)
    edge, and value-set membership must recover the rest (the chain-edge
    recall hole)."""
    import pyarrow as pa
    import ray.data

    from rayval.stages.dedup import neardup_violations

    base = 0x0123456789ABCDEF
    n_clique = 12
    ids = [f"c{i:03d}" for i in range(n_clique)] + ["variant", "far"]
    ph = [base] * n_clique + [base ^ 1, 0x7EDCBA0000000000]
    t = pa.table({"image_id": ids, "phash": pa.array(ph, type=pa.int64())})
    out = neardup_violations(
        ray.data.from_arrow(t).repartition(3), max_hamming=2, hot_cap=4
    ).take_all()
    got = sorted(r["image_id"] for r in out)
    assert got == sorted(ids[:n_clique] + ["variant"])


def test_neardup_violations_undecodable_excluded(ray_session):
    """Rows with decodable=False keep their stored phash in the flagship's
    narrow results but must NOT participate in the near-dup join on either
    side (untrustworthy hash, already flagged bytes.decodable)."""
    import pyarrow as pa
    import ray.data

    from rayval.stages.dedup import neardup_violations

    base = 0x5555AAAA5555AAAA
    t = pa.table(
        {
            "image_id": ["good", "corrupt", "other"],
            # corrupt is 1 bit from good; other is far from both: with the
            # decodable filter NOTHING pairs, without it good+corrupt would
            "phash": pa.array([base, base ^ 1, -42], type=pa.int64()),
            "decodable": pa.array([True, False, True]),
        }
    )
    out = neardup_violations(ray.data.from_arrow(t), max_hamming=2).take_all()
    assert out == []
