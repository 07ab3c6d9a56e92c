"""Image codecs for the decode/fidelity stage.

The container has no image libraries (no PIL / cv2), so per the build
contract the codecs are implemented here from scratch:

- ``png``: a REAL (if minimal) PNG codec — 8-bit RGB, filter type 0,
  zlib-compressed IDAT, CRC-checked.  Files it writes are valid PNGs readable
  by any standard decoder; it decodes only the subset it writes (filter 0)
  and raises ``CodecError`` otherwise.
- ``jpeg`` / ``webp``: DETERMINISTIC FAKE LOSSY STAND-INS (magic ``RVLJ`` /
  ``RVLW``): quantize pixels to step 4 (mid-point reconstruction, max error
  2/channel → PSNR ≈ 47 dB, above the 40 dB gate) + zlib.  They model the
  lossy-decode path — real container, real bit-exact decode contract, fake
  compression math — so the Ray-side plumbing (binary column in, decoded
  pixels + PSNR out, per-row error capture) is fully real and tested.

The decode stage treats undecodable bytes as DATA (a ``bytes.decodable``
violation row), never as a task error (SURVEY.md §4: "decode failures are
data, not task errors").
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
FAKE_MAGIC = {b"RVLJ": "jpeg", b"RVLW": "webp"}
FAKE_MAGIC_REV = {v: k for k, v in FAKE_MAGIC.items()}
_QSTEP = 4  # fake-lossy quantization step -> worst-case error 2 -> PSNR ~47dB


class CodecError(ValueError):
    pass


# ---------------------------------------------------------------- PNG (real)
def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> PNG bytes (color type 2, bit depth 8, filter 0)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def png_decode(data) -> np.ndarray:
    """Accepts bytes or any buffer (memoryview slices from an Arrow binary
    column decode zero-copy — no per-row payload copy)."""
    data = memoryview(data)
    if bytes(data[:8]) != PNG_SIG:
        raise CodecError("not a PNG")
    pos = 8
    ihdr = None
    idat_parts: list = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = bytes(data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise CodecError("truncated chunk")
        crc = data[pos + 8 + length : pos + 12 + length]
        if len(crc) != 4 or struct.unpack(">I", crc)[0] != (zlib.crc32(payload, zlib.crc32(tag)) & 0xFFFFFFFF):
            raise CodecError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            if length != 13:
                # struct.error is NOT a CodecError — an adversarial
                # CRC-valid short IHDR must stay a data error, not a task
                # error
                raise CodecError(f"IHDR length {length} != 13")
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat_parts.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat_parts:
        raise CodecError("missing IHDR/IDAT")
    idat = idat_parts[0] if len(idat_parts) == 1 else b"".join(bytes(p) for p in idat_parts)
    w, h, depth, color, _, _, interlace = ihdr
    if depth != 8 or color != 2 or interlace != 0:
        raise CodecError(f"unsupported PNG variant depth={depth} color={color}")
    try:
        raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    except zlib.error as e:
        raise CodecError(f"IDAT inflate failed: {e}") from e
    stride = 1 + w * 3
    if raw.size != h * stride:
        raise CodecError("pixel payload size mismatch")
    rows = raw.reshape(h, stride)
    if (rows[:, 0] != 0).any():
        raise CodecError("unsupported PNG filter type (encoder writes 0 only)")
    return rows[:, 1:].reshape(h, w, 3).copy()


# ----------------------------------------------------- fake lossy (stand-in)
def lossy_encode(pixels: np.ndarray, fmt: str) -> bytes:
    """DETERMINISTIC FAKE: quantized + zlib'd pixels in an RVL container."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    q = (pixels // _QSTEP).astype(np.uint8)
    payload = zlib.compress(q.tobytes(), 6)
    return FAKE_MAGIC_REV[fmt] + struct.pack(">IIB", w, h, _QSTEP) + payload


def lossy_decode(data) -> tuple[np.ndarray, str]:
    data = memoryview(data)
    magic = bytes(data[:4])
    fmt = FAKE_MAGIC.get(magic)
    if fmt is None:
        raise CodecError("not an RVL lossy container")
    if len(data) < 13:
        raise CodecError("truncated header")
    w, h, qstep = struct.unpack(">IIB", data[4:13])
    try:
        q = np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8)
    except zlib.error as e:
        raise CodecError(f"inflate failed: {e}") from e
    if q.size != h * w * 3:
        raise CodecError("pixel payload size mismatch")
    # mid-point reconstruction
    pix = (q.reshape(h, w, 3).astype(np.uint16) * qstep + qstep // 2).clip(0, 255).astype(np.uint8)
    return pix, fmt


# ------------------------------------------------------------------ frontend
def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(pixels)
    if fmt in ("jpeg", "webp"):
        return lossy_encode(pixels, fmt)
    raise CodecError(f"unknown fmt {fmt!r}")


def decode_image(data) -> tuple[np.ndarray, str]:
    """buffer -> ((h, w, 3) uint8, fmt). Raises CodecError on malformation."""
    data = memoryview(data)
    if len(data) >= 8 and bytes(data[:8]) == PNG_SIG:
        return png_decode(data), "png"
    if len(data) >= 4 and bytes(data[:4]) in FAKE_MAGIC:
        return lossy_decode(data)
    raise CodecError("unrecognized image container")


LOSSY_QSTEP = _QSTEP


def lossy_qstep(data) -> "int | None":
    """The quantizer step declared in a fake-lossy container's header, or
    None if ``data`` is not an RVL lossy container.  (A real jpeg/webp
    analog reads the quantization tables / quality factor.)"""
    data = memoryview(data)
    if len(data) >= 13 and bytes(data[:4]) in FAKE_MAGIC:
        return struct.unpack(">IIB", data[4:13])[2]
    return None


def lossy_expected_psnr(qstep: int) -> float:
    """Expected reconstruction PSNR for midpoint dequantization at ``qstep``
    under the standard uniform-quantization noise model (mse = qstep^2/12) —
    the per-row bound a lossy container can GUARANTEE against any source.
    qstep=4 -> ~46.9 dB (the codec's documented ~47 dB)."""
    if qstep <= 1:
        return float("inf")
    return float(20 * np.log10(255.0) - 10 * np.log10(qstep * qstep / 12.0))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    if a.shape != b.shape:
        return 0.0
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(20 * np.log10(255.0) - 10 * np.log10(mse))
