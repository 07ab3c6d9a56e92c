"""Benchmark harness (driver contract).

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and print ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "num_cpus": N}

--scaling: run the bench twice in FRESH processes (num_cpus=2 then 8 by
default; $RAYVAL_SCALING_LO/HI override) on the same input — the sandbox
stand-in for the north_rule's N vs 4N node clusters — and print both
throughputs + scaling efficiency (also recorded in BASELINE.md).

The images flagship input is generated once (deterministic, cached in /tmp
keyed by args) and generation is NOT timed; each run validates into a fresh
output dir so checkpoint-resume can't short-circuit the measurement.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _sf_of(path: str) -> float:
    """sf from the dir name (last 'sf<float>' component); 0.1 if absent —
    never crash at import on an unconventional path."""
    import re

    m = re.search(r"sf(\d+(?:\.\d+)?)", os.path.basename(path.rstrip("/")))
    return float(m.group(1)) if m else 0.1


SF = _sf_of(SF_DIR)

IMAGES_N = max(2000, int(2_500_000 * SF))  # 250k at sf0.1: decode must dominate fixed job costs
IMAGES_FRAGMENTS = 64
IMAGES_DIMS = (64, 192)  # bigger than test default: decode work must dominate job overhead


_WARMED: set = set()


def _warm_files(paths) -> None:
    """Serial page-cache warm; missing files are skipped (a custom SF dir
    need not ship every table)."""
    for p in paths:
        try:
            with open(p, "rb") as fh:
                while fh.read(1 << 24):
                    pass
        except FileNotFoundError:
            pass


def bench_images(num_cpus: int, distributed_violations: bool = False) -> float:
    from rayval.pipelines.validate_images import RunConfig, run
    from rayval.sources.images import generate_images

    # cache dir keyed by EVERY generation arg: a partially-keyed name reused
    # across arg changes would leave stale extra fragments in place (the
    # per-args .done marker only guards identical args)
    data = generate_images(
        f"/tmp/rayval_bench/imgs_n{IMAGES_N}_f{IMAGES_FRAGMENTS}_s42_d{IMAGES_DIMS[0]}x{IMAGES_DIMS[1]}",
        n=IMAGES_N,
        fragments=IMAGES_FRAGMENTS,
        seed=42,
        dim_range=IMAGES_DIMS,
    )
    out = f"/tmp/rayval_bench/out_{os.getpid()}"
    shutil.rmtree(out, ignore_errors=True)
    # warm the page cache ONCE per process (first generation writes it warm;
    # later fresh processes re-read from disk — untimed so scaling runs match)
    img_dir = data + "/images"
    if img_dir not in _WARMED:
        _WARMED.add(img_dir)
        _warm_files(os.path.join(img_dir, f) for f in sorted(os.listdir(img_dir)))
    # Decode mode by cpu count, picked by interleaved idle-host A/B on THIS
    # sandbox: <=16 cpus the FUSED task mode wins clearly (read->validate->
    # decode->write->partials in one task, no object-store hop, ~20s vs ~29s
    # at 16); above 16 the host's ~2:1 vCPU oversubscription makes many
    # concurrent heavy fused tasks erratically thrash (26-80s spread), while
    # the actor pool's small-block pipeline stays stable (~27-37s) — on
    # dedicated-core clusters fused mode is preferred at any width.
    if num_cpus <= 16:
        mode = dict(decode_concurrency=None)
    else:
        mode = dict(decode_concurrency=max(2, (num_cpus * 3) // 4), read_blocks_per_fragment=3)
    cfg = RunConfig(
        group_size=IMAGES_FRAGMENTS,  # one commit group: bench measures throughput
        decode_batch_size=None,       # block-aligned batches
        hot_threshold=2000,
        bloom_expected=max(IMAGES_N, 1024),
        distributed_violations=distributed_violations,
        **mode,
    )
    t0 = time.time()
    run(data + "/images", out, captions_path=data + "/captions.parquet", cfg=cfg)
    dt = time.time() - t0
    shutil.rmtree(out, ignore_errors=True)
    return dt


def cpu_calibration(n_tasks: int = 128) -> float:
    """Pure-CPU burn (numpy matmul) under the current Ray session — measures
    what parallel speedup THIS MACHINE can deliver at all, independent of any
    data movement.  The sandbox VM's 32 vCPUs are oversubscribed: pure-CPU
    4x-scaling efficiency measures ~0.6-0.75 here, so pipeline efficiency is
    reported both raw and normalized by this ceiling."""
    import ray

    @ray.remote
    def burn(k: int) -> float:
        import numpy as np

        rng = np.random.default_rng(k)
        a = rng.standard_normal((400, 400))
        s = 0.0
        for _ in range(30):
            s += float((a @ a).sum())
            a = np.sin(a)
        return s

    t0 = time.time()
    ray.get([burn.remote(i) for i in range(n_tasks)])
    return time.time() - t0


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    # Silence ONLY the cosmetic "RefBundle with a different schema ... new
    # schema: ." warning: it is emitted by Ray's sort machinery for EMPTY
    # sort partitions (reproducible with a bare groupby().map_groups() whose
    # input has more blocks than keys — Ray builds the empty partition block
    # as a zero-column table internally); every UDF in this repo returns
    # schema-carrying tables even for zero rows, so that specific message
    # carries no signal here.  A record-level filter, not setLevel: a REAL
    # schema-divergence warning (non-empty new schema) must still surface.
    import logging as _logging

    class _EmptySchemaNoise(_logging.Filter):
        def filter(self, record: _logging.LogRecord) -> bool:
            msg = record.getMessage()
            return not ("different schema than the previous one" in msg
                        and "new schema: ." in msg)

    _logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptySchemaNoise())

    from rayval.pipelines import queries as Q

    timings: dict[str, float] = {}

    only_images = os.environ.get("RAYVAL_BENCH_ONLY") == "images"
    if not only_images:
        # warm the page cache so the first timed read isn't a cold-disk
        # artifact — skipped in images-only (scaling) runs, which never
        # touch these tables
        _warm_files(f"{SF_DIR}/{t}.parquet" for t in ("lineitem", "documents", "embeddings", "events"))
    # min of 2 trials by default — for the flagship AND the small queries: a
    # sub-5s query in a fresh session carries ~1s of fixed Ray job cost whose
    # variance would otherwise read as a code regression (round-2's phantom
    # 1.9x on pricing_summary); the min reflects steady-state throughput
    trials = int(os.environ.get("RAYVAL_BENCH_TRIALS", "2"))

    def timed(name: str, fn):
        best = float("inf")
        for _ in range(trials):
            t0 = time.time()
            fn(SF_DIR)
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
    if not only_images:
        timed("lineitem_violations", Q.q_lineitem_violations)
        timed("pricing_summary", Q.q_pricing_summary)
        timed("events_hourly", Q.q_events_hourly)
        timed("token_counts", Q.q_token_counts)
        timed("fingerprints", Q.q_fingerprints)
        # the CORPUS variant: bench times LSH over the real sf documents
        # table (the driver's minhash_neardups entry is the planted-fixture
        # oracle variant — tiny, not a perf measurement)
        timed("minhash_neardups", Q.q_minhash_neardups_corpus)
        timed("embedding_topk", Q.q_embedding_topk)
        timed("embedding_neardups", Q.q_embedding_neardups)
    timings["images_validation"] = round(min(bench_images(NUM_CPUS) for _ in range(trials)), 3)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "rayval headline pipelines wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF,
        "num_cpus": NUM_CPUS,
        "images_n": IMAGES_N,
        "images_per_sec": round(IMAGES_N / timings["images_validation"], 1),
    }
    if os.environ.get("RAYVAL_BENCH_CALIBRATE") == "1":
        result["cpu_calibration_sec"] = round(min(cpu_calibration() for _ in range(2)), 3)
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same flagship job at num_cpus=N and 4N in fresh processes (the sandbox
    stand-in for N vs 4N nodes), min of 2 trials per level against machine
    noise, plus a pure-CPU hardware-ceiling calibration at both levels.

    Default pair is 2 -> 8: this host's 32 vCPUs are ~2:1 oversubscribed and
    saturate around ~16 effective cores, so 4x-parallelism windows that end
    at or above 16 measure the HOST's ceiling, not the engine's (even pure
    CPU-bound matmul reaches only ~0.65-0.88 at 4 -> 16 and ~0.76 at
    8 -> 32, and the round-3 low-end speedups pushed the 4-cpu run fast
    enough that 16 cpus sits on that ceiling).  2 -> 8 is the widest window
    where the hardware itself can still express ~4x; the pure-CPU
    calibration printed alongside makes the ceiling re-derivable for ANY
    pair — see BASELINE.md for all measured pairs and the quantified
    breakdown."""
    lo = int(os.environ.get("RAYVAL_SCALING_LO", "2"))
    hi = int(os.environ.get("RAYVAL_SCALING_HI", "8"))

    def sub(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            PYTHONPATH=os.path.dirname(os.path.abspath(__file__)),
            RAYVAL_BENCH_ONLY="images",
            RAYVAL_BENCH_TRIALS="2",
            RAYVAL_BENCH_CALIBRATE="1",
        )
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env, capture_output=True, text=True
        )
        if proc.returncode != 0:
            # surface the child's traceback — check=True would swallow the
            # captured stderr and leave the failure undiagnosable
            sys.stderr.write(proc.stderr[-4000:])
            raise RuntimeError(f"scaling subprocess (num_cpus={ncpu}) exited {proc.returncode}")
        return json.loads(proc.stdout.strip().splitlines()[-1])

    r_lo = sub(lo)
    r_hi = sub(hi)
    img_lo, img_hi = r_lo["queries"]["images_validation"], r_hi["queries"]["images_validation"]
    cal_lo, cal_hi = r_lo["cpu_calibration_sec"], r_hi["cpu_calibration_sec"]
    ratio = hi / lo
    eff_images = (img_lo / img_hi) / ratio
    eff_ceiling = (cal_lo / cal_hi) / ratio
    return {
        "metric": f"scaling efficiency (num_cpus {lo} -> {hi}, fresh sessions, same input)",
        f"images_sec_{lo}": img_lo,
        f"images_sec_{hi}": img_hi,
        f"images_per_sec_{lo}": r_lo["images_per_sec"],
        f"images_per_sec_{hi}": r_hi["images_per_sec"],
        "scaling_efficiency_images": round(eff_images, 3),
        f"cpu_calibration_sec_{lo}": cal_lo,
        f"cpu_calibration_sec_{hi}": cal_hi,
        "hardware_ceiling_efficiency": round(eff_ceiling, 3),
        "normalized_efficiency": round(eff_images / eff_ceiling, 3) if eff_ceiling else None,
        "images_n": IMAGES_N,
        "sf": SF,
    }


def run_distviol() -> dict:
    """Flagship A/B at the current NUM_CPUS: default driver-merged violations
    vs ``distributed_violations`` (phase-1 tasks write their own violation
    parquet parts; phase 2 merges as a streaming union — the 10^12-row /
    wholesale-failure path).  Proves the escape hatch's cost, not just its
    correctness (its equivalence is pinned in tests/test_pipeline.py)."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    trials = int(os.environ.get("RAYVAL_BENCH_TRIALS", "2"))
    t_default = round(min(bench_images(NUM_CPUS) for _ in range(trials)), 3)
    t_dist = round(min(bench_images(NUM_CPUS, distributed_violations=True) for _ in range(trials)), 3)
    ray.shutdown()
    return {
        "metric": "flagship: driver-merged vs distributed violation listing",
        "images_sec_default": t_default,
        "images_sec_distributed": t_dist,
        "overhead_pct": round(100.0 * (t_dist - t_default) / t_default, 1),
        "images_n": IMAGES_N,
        "num_cpus": NUM_CPUS,
        "sf": SF,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--distviol" in sys.argv:
        print(json.dumps(run_distviol()))
    else:
        print(json.dumps(run_bench()))
