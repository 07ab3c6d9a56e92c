"""Stateful decode/cross-check stage — the actor-pool analog of the
reference's per-document decode (``decode``, core.clj:274-276), run as
``map_batches(DecodeCheck, concurrency=N, batch_size=small)`` because rows
carry wide binary payloads (SURVEY.md §4: tune batch size for ~100KB rows;
never ship ``bytes`` further downstream).

Per row: decode ``bytes`` (real PNG / fake-lossy codec), then cross-check the
decoded truth against the METADATA columns:

    bytes.decodable    decode succeeded
    w.decode_match     decoded width  == stored w
    h.decode_match     decoded height == stored h
    fmt.decode_match   container format == stored fmt
    phash.match        phash64(decoded pixels) == stored phash

Decode failures are DATA (a False in ok__bytes.decodable), never task errors
(SURVEY.md §4: "decode failures are data, not task errors — catch per-row in
the actor, never raise").  Undecodable rows pass the cross-checks vacuously
(nothing to compare).

Output drops ``bytes`` — everything downstream (stats, dedup, referential,
violation explode) runs on narrow columns only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rayval.functions.imagecodec import (
    LOSSY_QSTEP,
    CodecError,
    decode_image,
    encode_image,
    lossy_expected_psnr,
    lossy_qstep,
)
from rayval.functions.phash import phash64
from rayval.stages.validate import OK_PREFIX

DECODE_CHECKS = [
    "bytes.decodable",
    "w.decode_match",
    "h.decode_match",
    "fmt.decode_match",
    "phash.match",
]
FIDELITY_CHECK = "bytes.fidelity"
PSNR_DB_GATE = 40.0  # input_hint: "PSNR>=40dB for lossy formats"


def _payload_eq(enc: bytes, data) -> bool:
    """bytes vs the row's zero-copy buffer slice.  Arrow buffer memoryviews
    carry SIGNED format 'b'; ``bytes == memoryview('b')`` compares signed vs
    unsigned elementwise and is False whenever any byte >= 0x80 — cast to
    'B' (zero-copy) before comparing."""
    if isinstance(data, memoryview):
        return enc == data.cast("B")
    return enc == data


class DecodeCheck:
    """Actor-pool callable: state (codec dispatch tables, reusable buffers) is
    set up once per actor in __init__, per-batch work in __call__.

    ``quality=True`` additionally extracts per-image quality features from the
    decoded pixels — luma brightness/contrast and Laplacian-variance sharpness
    (the standard blur-detection statistic) — the feature-extraction half of
    the multimodal pipeline; they flow into the per-partition stats sketches
    (stages/stats.py NUMERIC_COLS)."""

    def __init__(self, psnr_check: bool = False, quality: bool = True):
        # the codecs are module-level pure functions; actor state here is just
        # the config — the pattern still matters: a real decoder (libjpeg,
        # libwebp) would be loaded HERE, once per actor, not per batch.
        #
        # psnr_check (input_hint "decoded-pixel allclose, PSNR>=40dB for
        # lossy"): per-row fidelity.  Lossless rows must BE the canonical
        # encoding of their own pixels (byte-equal re-encode — exact
        # fidelity, catches recompressed/tampered-but-decodable payloads);
        # lossy rows must declare a quantizer fine enough to guarantee
        # PSNR_DB_GATE against any source, byte-canonical at the canonical
        # step.  Off by default: it adds a re-encode per row.
        self.psnr_check = psnr_check
        self.quality = quality

    @staticmethod
    def _row_buffers(arr: pa.Array):
        """Zero-copy per-row memoryviews into the Arrow binary column's data
        buffer (avoids one full payload copy per row vs ``.as_py()``)."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if arr.null_count or not isinstance(arr, (pa.BinaryArray, pa.LargeBinaryArray)):
            return arr, None, None  # fall back to as_py for exotic cases
        bufs = arr.buffers()
        off_dtype = np.int64 if isinstance(arr, pa.LargeBinaryArray) else np.int32
        offs = np.frombuffer(bufs[-2], dtype=off_dtype)[arr.offset : arr.offset + len(arr) + 1]
        return arr, offs, memoryview(bufs[-1])

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        payloads = batch["bytes"]
        payloads = payloads.combine_chunks() if isinstance(payloads, pa.ChunkedArray) else payloads
        payloads, offs, data_mv = self._row_buffers(payloads)
        # native-dtype + validity extraction: to_numpy on a null-bearing int
        # column widens the WHOLE block to float64, which would round stored
        # int64 phashes past 2^53 and silently fail phash.match on every row
        # of a batch that happens to contain one null.  Null DECLARED metadata
        # asserts nothing — the cross-check passes (the engine's three-valued
        # pin: nulls pass value checks; only `required` fails them).
        def ints(name):
            col = batch[name]
            valid = col.is_valid().to_numpy(zero_copy_only=False)
            if col.null_count:
                vals = np.zeros(n, dtype=np.int64)
                vals[valid] = col.drop_null().to_numpy(zero_copy_only=False).astype(np.int64)
            else:
                vals = col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            return vals, valid

        w, w_valid = ints("w")
        h, h_valid = ints("h")
        fmt = batch["fmt"].to_pylist()
        ph, ph_valid = ints("phash")

        decodable = np.ones(n, dtype=bool)
        w_ok = np.ones(n, dtype=bool)
        h_ok = np.ones(n, dtype=bool)
        fmt_ok = np.ones(n, dtype=bool)
        ph_ok = np.ones(n, dtype=bool)
        fid_ok = np.ones(n, dtype=bool)
        brightness = np.full(n, np.nan, dtype=np.float32)
        contrast = np.full(n, np.nan, dtype=np.float32)
        sharpness = np.full(n, np.nan, dtype=np.float32)

        # genuinely per-item work: each row is one opaque image payload
        for i in range(n):
            if offs is not None:
                data = data_mv[offs[i] : offs[i + 1]]
            else:
                data = payloads[i].as_py()
            if data is None or len(data) == 0:
                decodable[i] = False
                continue
            try:
                px, container_fmt = decode_image(data)
            except CodecError:
                decodable[i] = False
                continue
            dh, dw = px.shape[0], px.shape[1]
            w_ok[i] = dw == w[i] if w_valid[i] else True
            h_ok[i] = dh == h[i] if h_valid[i] else True
            fmt_ok[i] = container_fmt == fmt[i] if fmt[i] is not None else True
            ph_ok[i] = phash64(px) == ph[i] if ph_valid[i] else True
            if self.psnr_check:
                try:
                    if container_fmt == "png":
                        # lossless: fidelity is exact — the payload must BE
                        # the canonical encoding of its own pixels
                        fid_ok[i] = _payload_eq(encode_image(px, "png"), data)
                    else:
                        # lossy: the container's own quantizer must be fine
                        # enough to GUARANTEE the dB gate against any source
                        # (uniform-quantization noise model); at the canonical
                        # step, additionally require byte-canonical payload
                        q = lossy_qstep(data)
                        ok = q is not None and lossy_expected_psnr(q) >= PSNR_DB_GATE
                        if ok and q == LOSSY_QSTEP:
                            ok = _payload_eq(encode_image(px, container_fmt), data)
                        fid_ok[i] = ok
                except CodecError:
                    fid_ok[i] = False
            if self.quality and dh >= 3 and dw >= 3:
                # bit-identical to px.mean(axis=2, dtype=np.float32) — numpy's
                # 3-element pairwise reduce is ((c0+c1)+c2)/3, spelled out here
                # because the axis-2 ufunc reduce is ~8x slower than three
                # accumulating adds (measured; this was the stage's top cost)
                gray = px[:, :, 0].astype(np.float32)
                gray += px[:, :, 1]
                gray += px[:, :, 2]
                gray /= 3
                brightness[i] = gray.mean()
                contrast[i] = gray.std()
                # in-place laplacian: same left-to-right float32 op order as
                # `4*core - up - down - left - right`, half the temporaries
                lap = 4.0 * gray[1:-1, 1:-1]
                np.subtract(lap, gray[:-2, 1:-1], out=lap)
                np.subtract(lap, gray[2:, 1:-1], out=lap)
                np.subtract(lap, gray[1:-1, :-2], out=lap)
                np.subtract(lap, gray[1:-1, 2:], out=lap)
                sharpness[i] = lap.var()

        batch = batch.drop_columns(["bytes"])
        for name, arr in zip(DECODE_CHECKS, (decodable, w_ok, h_ok, fmt_ok, ph_ok)):
            batch = batch.append_column(OK_PREFIX + name, pa.array(arr))
        if self.psnr_check:
            batch = batch.append_column(OK_PREFIX + FIDELITY_CHECK, pa.array(fid_ok))
        if self.quality:
            batch = batch.append_column("brightness", pa.array(brightness))
            batch = batch.append_column("contrast", pa.array(contrast))
            batch = batch.append_column("sharpness", pa.array(sharpness))
        return batch.append_column("decodable", pa.array(decodable))
