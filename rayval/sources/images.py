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


def make_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic per-content noise+gradient image (no cross-row RNG)."""
    rng = np.random.default_rng(i)
    noise = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    y, x = np.mgrid[0:h, 0:w].astype(np.uint16)
    grad = ((x * 2 + y * 3 + i) % 256).astype(np.uint8)
    return (noise // 2 + grad[..., None] // 2).astype(np.uint8)


def _lossy_roundtrip(px: np.ndarray) -> np.ndarray:
    """Pixels as the fake-lossy codec reconstructs them (mid-point quantize)."""
    return ((px // _QSTEP).astype(np.uint16) * _QSTEP + _QSTEP // 2).clip(0, 255).astype(np.uint8)


def make_caption(rng: np.random.Generator, n_words: int) -> str:
    return " ".join(rng.choice(CAPTION_WORDS, size=n_words))


def generate_images(
    out_dir: str,
    n: int = 1000,
    fragments: int = 8,
    seed: int = 42,
    violation_rate: float = 0.02,
    hot_bucket_frac: float = 0.01,
    dup_groups: int = 5,
) -> str:
    """Write images fragments + captions + expected_violations; returns out_dir.

    Idempotent: a marker file keyed by the args short-circuits regeneration.
    """
    marker = os.path.join(out_dir, f".done-n{n}-f{fragments}-s{seed}")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    # --- base columns ---------------------------------------------------------
    ids = np.array([f"img-{i:09d}" for i in range(n)], dtype=object)
    ws = rng.integers(16, 64, n).astype(np.int32)
    hs = rng.integers(16, 64, n).astype(np.int32)
    fmts = FMTS[rng.integers(0, 3, n)].astype(object)
    caps = np.array([make_caption(rng, int(k)) for k in rng.integers(3, 9, n)], dtype=object)

    # content index: rows sharing it share pixels (and therefore phash)
    content = np.arange(n)
    perm = rng.permutation(n)
    cursor = 0

    def carve(k: int) -> np.ndarray:
        nonlocal cursor
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

    # --- encode + phash (per-image; genuinely per-item work) -----------------
    payloads = np.empty(n, dtype=object)
    phashes = np.empty(n, dtype=np.int64)
    cache: dict[tuple, tuple] = {}
    for i in range(n):
        key = (int(content[i]), int(ws_true[i]), int(hs[i]), str(enc_fmt[i]))
        hit = cache.get(key)
        if hit is None:
            px = make_pixels(int(content[i]), int(ws_true[i]), int(hs[i]))
            data = encode_image(px, str(enc_fmt[i]))
            recon = px if enc_fmt[i] == "png" else _lossy_roundtrip(px)
            hit = (data, phash64(recon))
            cache[key] = hit
        payloads[i], phashes[i] = hit
    for i in v_trunc:
        payloads[i] = payloads[i][: max(4, len(payloads[i]) // 3)]
    phashes[v_pmatch] ^= 0x5A5A5A5A

    # --- partition + write fragments -----------------------------------------
    part = (np.arange(n) * fragments // n).astype(np.int64)
    table = pa.table(
        {
            "image_id": pa.array(ids, type=pa.string()),
            "bytes": pa.array(list(payloads), type=pa.binary()),
            "w": pa.array(ws, type=pa.int32()),
            "h": pa.array(hs, type=pa.int32()),
            "fmt": pa.array(fmts, type=pa.string()),
            "caption": pa.array(caps, type=pa.string()),
            "phash": pa.array(phashes, type=pa.int64()),
        }
    )
    img_dir = os.path.join(out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    for f in range(fragments):
        sel = np.flatnonzero(part == f)
        pq.write_table(table.take(pa.array(sel)), os.path.join(img_dir, f"part-{f:05d}.parquet"))

    # --- captions side table (F2) --------------------------------------------
    n_dangling = max(1, k // 2)
    cap_img_ids = np.concatenate([ids, np.array([f"img-miss-{j:06d}" for j in range(n_dangling)], dtype=object)])
    cap_texts = np.concatenate([caps, np.array(["dangling"] * n_dangling, dtype=object)])
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
