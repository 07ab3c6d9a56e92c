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
