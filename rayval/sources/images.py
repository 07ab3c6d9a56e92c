"""Deterministic synthetic generator of the flagship input table
(BASELINE.json input_hint): ``(image_id:string, bytes:binary, w:int32,
h:int32, fmt:string, caption:string, phash:int64)`` written as MULTI-FRAGMENT
parquet (one file per fragment; fragment index = ``partition_id`` — the
Lance-fragment stand-in, since lance isn't in this container) plus:

- ``captions.parquet`` — referential side table (FIXTURES.md F2)
- ``expected_violations.parquet`` — the oracle (FIXTURES.md F4)

Violations of every constraint class are planted on DISJOINT row sets so the
expected listing is exact.  Where one mutation necessarily trips two checks
(wrong metadata trips both the range check and the decode cross-check), BOTH
ids are recorded:

    image_id.pattern   id mutated to "BAD-<i>"
    w.range (+ w.decode_match)      stored w set to 0 / 1_000_000
    w.decode_match     encoded at a different width than stored
    fmt.enum (+ fmt.decode_match)   fmt set to "bmp" (bytes stay real png)
    fmt.decode_match   fmt says X, container is Y
    caption.required   caption null
    caption.maxLength  caption overlong
    bytes.decodable    payload truncated
    phash.match        stored phash perturbed
    phash.unique       duplicate pixel groups (incl. ONE HOT BUCKET at ~1% of
                       rows — the skew case the north_rule calls out); dup
                       members forced png so stored phash is bit-identical
    image_id.ref       dangling caption rows (keyed by caption_id)

Stored ``phash`` is computed from the DECODE-RECONSTRUCTED pixels (for lossy
formats: after quantization round-trip) so the pipeline's recompute check is
exact, not tolerance-based.  Pixels are per-row seeded noise + gradient so
distinct contents never collide on the 64-bit average-hash by accident.

Everything derives from (seed, row index) — same args, same bytes, any scale.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from rayval.functions.imagecodec import _QSTEP, encode_image
from rayval.functions.phash import phash64

CAPTION_WORDS = np.array(
    "a the quick brown fox lazy dog red blue green small large bright dark "
    "mountain river city skyline sunset portrait close-up macro aerial "
    "photo of with under over beside".split()
)
MAX_CAPTION = 120
FMTS = np.array(["png", "jpeg", "webp"])


GEN_VERSION = 3  # bump when generated content changes (invalidates cached dirs)


def make_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic per-content noise+gradient image (no cross-row RNG).

    The gradient offset is a HASH of i, not i itself: content indices are
    contiguous within a fragment, so any statistic monotone in i would give
    every partition a genuinely shifted distribution and the drift detector
    would (correctly!) fire on clean data."""
    rng = np.random.default_rng(i)
    noise = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    y, x = np.mgrid[0:h, 0:w].astype(np.uint16)
    i2 = (i * 2654435761) % 256
    grad = ((x * 2 + y * 3 + i2) % 256).astype(np.uint8)
    return (noise // 2 + grad[..., None] // 2).astype(np.uint8)


def _lossy_roundtrip(px: np.ndarray) -> np.ndarray:
    """Pixels as the fake-lossy codec reconstructs them (mid-point quantize)."""
    return ((px // _QSTEP).astype(np.uint16) * _QSTEP + _QSTEP // 2).clip(0, 255).astype(np.uint8)


def make_caption(rng: np.random.Generator, n_words: int) -> str:
    return " ".join(rng.choice(CAPTION_WORDS, size=n_words))


def _make_captions(rng: np.random.Generator, n: int) -> np.ndarray:
    """Vectorized caption generation (a per-row rng.choice loop is ~100x
    slower at bench scale)."""
    lens = rng.integers(3, 9, n)
    words = CAPTION_WORDS[rng.integers(0, len(CAPTION_WORDS), size=(n, 8))]
    return np.array([" ".join(row[:k]) for row, k in zip(words, lens)], dtype=object)


def _encode_write_fragment(
    path, ids, content, ws, ws_true, hs, fmts, enc_fmt, caps, trunc_mask, pmatch_mask
) -> int:
    """Encode one fragment's rows and write its parquet file (runs as a Ray
    task for large n; deterministic given the inputs)."""
    payloads, phashes = _encode_chunk(content, ws_true, hs, enc_fmt)
    for i in np.flatnonzero(trunc_mask):
        payloads[i] = payloads[i][: max(4, len(payloads[i]) // 3)]
    phashes[np.flatnonzero(pmatch_mask)] ^= 0x5A5A5A5A
    table = pa.table(
        {
            "image_id": pa.array(ids, type=pa.string()),
            "bytes": pa.array(payloads, type=pa.binary()),
            "w": pa.array(ws, type=pa.int32()),
            "h": pa.array(hs, type=pa.int32()),
            "fmt": pa.array(fmts, type=pa.string()),
            "caption": pa.array(caps, type=pa.string()),
            "phash": pa.array(phashes, type=pa.int64()),
        }
    )
    pq.write_table(table, path)
    return table.num_rows


def _encode_chunk(content, ws, hs, fmts) -> tuple[list, np.ndarray]:
    payloads: list = []
    phashes = np.empty(len(content), dtype=np.int64)
    cache: dict[tuple, tuple] = {}
    for i in range(len(content)):
        key = (int(content[i]), int(ws[i]), int(hs[i]), str(fmts[i]))
        hit = cache.get(key)
        if hit is None:
            px = make_pixels(int(content[i]), int(ws[i]), int(hs[i]))
            data = encode_image(px, str(fmts[i]))
            recon = px if fmts[i] == "png" else _lossy_roundtrip(px)
            hit = (data, phash64(recon))
            cache[key] = hit
        payloads.append(hit[0])
        phashes[i] = hit[1]
    return payloads, phashes


def generate_images(
    out_dir: str,
    n: int = 1000,
    fragments: int = 8,
    seed: int = 42,
    violation_rate: float = 0.02,
    hot_bucket_frac: float = 0.01,
    dup_groups: int = 5,
    dim_range: tuple[int, int] = (16, 64),
) -> str:
    """Write images fragments + captions + expected_violations; returns out_dir.

    Idempotent: a marker file keyed by the args short-circuits regeneration.
    Encoding parallelizes over Ray tasks when a Ray session is up and n is
    large (generation is test/bench scaffolding, but slow serial generation
    would otherwise dominate bench setup at large n × big dims).
    """
    # the marker must key EVERY content-affecting arg — omitting one would
    # silently serve a stale fixture + stale oracle for a different request
    marker = os.path.join(
        out_dir,
        f".done-v{GEN_VERSION}-n{n}-f{fragments}-s{seed}-d{dim_range[0]}x{dim_range[1]}"
        f"-vr{violation_rate}-hb{hot_bucket_frac}-g{dup_groups}",
    )
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    # --- base columns ---------------------------------------------------------
    ids = np.array([f"img-{i:09d}" for i in range(n)], dtype=object)
    ws = rng.integers(dim_range[0], dim_range[1], n).astype(np.int32)
    hs = rng.integers(dim_range[0], dim_range[1], n).astype(np.int32)
    fmts = FMTS[rng.integers(0, 3, n)].astype(object)
    caps = _make_captions(rng, n)

    # content index: rows sharing it share pixels (and therefore phash)
    content = np.arange(n)
    perm = rng.permutation(n)
    cursor = 0

    def carve(k: int) -> np.ndarray:
        nonlocal cursor
        if cursor + k > n:
            # refuse to silently truncate a planted-violation class: the
            # docstring promises violations of EVERY class, and a short carve
            # would also crash the dup-group g[0] indexing on tiny n
            raise ValueError(
                f"n={n} too small to plant all dup groups + violation classes "
                f"(needs ~{cursor + k}); raise n or lower violation_rate/dup_groups"
            )
        out = perm[cursor : cursor + k]
        cursor += k
        return np.sort(out)

    dup_rows_all: list[np.ndarray] = []
    n_hot = max(3, int(n * hot_bucket_frac))
    for size in [n_hot] + [int(rng.integers(2, 5)) for _ in range(dup_groups)]:
        g = carve(size)
        content[g] = g[0]
        ws[g] = ws[g[0]]
        hs[g] = hs[g[0]]
        fmts[g] = "png"  # identical bytes+phash across members (lossless)
        dup_rows_all.append(g)

    k = max(1, int(n * violation_rate))
    v_idpat = carve(k)
    v_wrange = carve(k)
    v_wmatch = carve(k)
    v_fenum = carve(k)
    v_fmatch = carve(k)
    v_cnull = carve(k)
    v_clong = carve(k)
    v_trunc = carve(k)
    v_pmatch = carve(k)
    v_cfid = carve(k)  # caption-table text mutated -> caption.fidelity

    # dims used for ENCODING (ground truth); stored metadata mutates separately
    ws_true = ws.copy()
    enc_fmt = fmts.copy()
    enc_fmt[v_fenum] = "png"
    enc_fmt[v_fmatch] = np.where(fmts[v_fmatch] == "jpeg", "png", "jpeg")
    ws_true[v_wmatch] = ws_true[v_wmatch] + 7  # encoded wider than stored

    ids[v_idpat] = [f"BAD-{i}" for i in v_idpat]
    ws[v_wrange[: k // 2]] = 0
    ws[v_wrange[k // 2 :]] = 1_000_000
    fmts[v_fenum] = "bmp"
    caps[v_cnull] = None
    caps[v_clong] = [" ".join(["word"] * 40) for _ in v_clong]

    # --- encode + write, one task per fragment --------------------------------
    # Each fragment is encoded AND written inside its own (Ray) task: no giant
    # driver-side table, no >2GB binary-offset chunking, no multi-GB plasma
    # round trip — the driver ships only small per-fragment column slices.
    part = (np.arange(n) * fragments // n).astype(np.int64)
    trunc_mask = np.zeros(n, dtype=bool)
    trunc_mask[v_trunc] = True
    pmatch_mask = np.zeros(n, dtype=bool)
    pmatch_mask[v_pmatch] = True
    img_dir = os.path.join(out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    jobs = []
    for f in range(fragments):
        sel = np.flatnonzero(part == f)
        jobs.append(
            (
                os.path.join(img_dir, f"part-{f:05d}.parquet"),
                ids[sel], content[sel], ws[sel], ws_true[sel], hs[sel],
                fmts[sel], enc_fmt[sel], caps[sel], trunc_mask[sel], pmatch_mask[sel],
            )
        )
    import ray as _ray

    if n >= 4096 and _ray.is_initialized():
        f_remote = _ray.remote(_encode_write_fragment)
        _ray.get([f_remote.remote(*j) for j in jobs])
    else:
        for j in jobs:
            _encode_write_fragment(*j)

    # --- captions side table (F2) --------------------------------------------
    n_dangling = max(1, k // 2)
    cap_img_ids = np.concatenate([ids, np.array([f"img-miss-{j:06d}" for j in range(n_dangling)], dtype=object)])
    cap_texts = np.concatenate([caps, np.array(["dangling"] * n_dangling, dtype=object)])
    cap_texts[v_cfid] = [str(cap_texts[r]) + " [edited]" for r in v_cfid]  # byte-inequality
    cap_ids = np.array([f"cap-{j:09d}" for j in range(len(cap_img_ids))], dtype=object)
    pq.write_table(
        pa.table(
            {
                "caption_id": pa.array(cap_ids, type=pa.string()),
                "image_id": pa.array(cap_img_ids, type=pa.string()),
                "caption": pa.array(cap_texts, type=pa.string()),
            }
        ),
        os.path.join(out_dir, "captions.parquet"),
    )

    # --- expected violations (F4 oracle) -------------------------------------
    exp_part: list[int] = []
    exp_key: list[str] = []
    exp_cid: list[str] = []

    def plant(rows, cid):
        for r in rows:
            exp_part.append(int(part[r]))
            exp_key.append(str(ids[r]))
            exp_cid.append(cid)

    plant(v_idpat, "image_id.pattern")
    plant(v_wrange, "w.range")
    plant(v_wrange, "w.decode_match")  # wrong metadata also fails cross-check
    plant(v_wmatch, "w.decode_match")
    plant(v_fenum, "fmt.enum")
    plant(v_fenum, "fmt.decode_match")  # "bmp" != decoded container "png"
    plant(v_fmatch, "fmt.decode_match")
    plant(v_cnull, "caption.required")
    plant(v_clong, "caption.maxLength")
    plant(v_trunc, "bytes.decodable")
    plant(v_pmatch, "phash.match")
    for g in dup_rows_all:
        plant(g, "phash.unique")
    for j in range(n_dangling):  # dangling captions, keyed by caption_id
        exp_part.append(-1)
        exp_key.append(str(cap_ids[n + j]))
        exp_cid.append("image_id.ref")
    for r in v_trunc:  # captions of undecodable images also fail referential
        exp_part.append(-1)
        exp_key.append(str(cap_ids[r]))
        exp_cid.append("image_id.ref")
    for r in v_cfid:  # mutated caption-table text -> byte-equality violation
        exp_part.append(-1)
        exp_key.append(str(cap_ids[r]))
        exp_cid.append("caption.fidelity")
    pq.write_table(
        pa.table(
            {
                "partition_id": pa.array(exp_part, type=pa.int64()),
                "image_id": pa.array(exp_key, type=pa.string()),
                "constraint_id": pa.array(exp_cid, type=pa.string()),
            }
        ),
        os.path.join(out_dir, "expected_violations.parquet"),
    )
    with open(marker, "w") as fh:
        fh.write("ok")
    return out_dir
