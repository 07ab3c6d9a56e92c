"""WebDataset-style tar-shard source + sink for the flagship image+caption
table — the de-facto interchange format for web-scale image training corpora
(a directory of ``shard-*.tar`` files; each sample is a run of adjacent tar
members sharing a basename key: ``<key>.<payload-ext>`` bytes, ``<key>.txt``
caption, ``<key>.json`` metadata).

This is the engine's third source format (after parquet fragments and JSONL)
and its first *binary* interchange sink, proving the validation pipelines are
source-format-agnostic on the exact table shape the north rule names
(image_id, bytes, w, h, fmt, caption, phash).

Scale design (the 100-TB shape):
- **The shard is the unit of parallelism, placement and resume.**  The sink
  is a ``map_batches`` stage — one tar per input batch, written by the task
  that holds the rows, so payload bytes never funnel through the driver or
  the object store a second time.  Only tiny manifest rows (shard path,
  rows, bytes) flow downstream.
- **Atomic, idempotent shards.**  Tar bytes are deterministic (zeroed mtime/
  uid/gid, fixed mode, members sorted by key) and the shard filename is the
  md5 of those bytes + the row count, so a re-run of the same batch replaces
  a byte-identical file instead of duplicating it.  Writes go to a
  process-unique ``.tmp`` then ``os.replace`` — a killed run leaves only
  complete shards plus ignorable tmps, and a restart skips nothing it must
  redo (content-addressed names make re-writes no-ops).
- **Unique-key contract.**  Sample keys must be globally unique (the
  flagship's ``image_id`` is).  Within a shard the writer de-collides by
  suffixing; ACROSS shards two fully-identical batches would produce the
  same shard name and silently merge (the twin-block hazard ADVICE.md r4
  flagged on ``_part_tag``) — impossible under unique keys, which is why the
  contract is stated here and enforced where it's cheap (within-shard).
- **Reader = one task per shard.**  ``ray.data.read_binary_files`` over
  ``*.tar`` gives one block per shard; parsing happens inside ``map_batches``
  so decoded samples stream with backpressure.  At 10^12 images shards are
  sized ~1 GB by ``rows_per_shard``; a 256-node cluster reads them evenly
  with no shuffle anywhere in either direction.

Fidelity contract (north rule: caption BYTE-equality, payload bit-equality):
the payload member stores the raw ``bytes`` column verbatim; the caption
member stores the utf-8 caption verbatim (absent member = NULL caption,
empty member = empty string); all other columns ride in ``<key>.json`` with
JSON nulls preserved, restored through an explicit Arrow schema so int32/
int64 types survive the trip bit-exactly.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import re
import shutil
import tarfile
import uuid

import pyarrow as pa

import ray.data

WDS_VERSION = 1

# json-borne columns of the flagship table (payload + caption ride as members)
FLAGSHIP_META_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("phash", pa.int64()),
    ]
)

_KEY_SAFE = re.compile(r"[^A-Za-z0-9_-]")
_EXT_SAFE = re.compile(r"[^a-z0-9]")


def _sanitize_key(k, ordinal: int) -> str:
    """Tar-member-safe sample key: keys must not contain '.' (the first '.'
    splits key from extension on read) nor path separators."""
    if k is None:
        return f"row{ordinal:09d}"
    s = _KEY_SAFE.sub("_", str(k))
    return s if s else f"row{ordinal:09d}"


def _member(tf: tarfile.TarFile, name: str, payload: bytes) -> None:
    info = tarfile.TarInfo(name=name)
    info.size = len(payload)
    # deterministic metadata: identical rows => identical tar bytes => the
    # content-addressed shard name is stable across re-runs
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    info.mode = 0o644
    tf.addfile(info, io.BytesIO(payload))


def shard_bytes_of_batch(
    batch: pa.Table,
    key_col: str = "image_id",
    payload_col: str = "bytes",
    ext_col: str = "fmt",
    text_col: str = "caption",
) -> bytes:
    """Serialize one Arrow batch into deterministic WebDataset tar bytes.

    Member order is sorted by sample key (WDS requires a sample's members to
    be adjacent); within a sample: .json, payload, .txt."""
    meta_cols = [c for c in batch.column_names if c not in (payload_col, text_col)]
    keys = batch[key_col].to_pylist()
    payloads = batch[payload_col].to_pylist()
    texts = batch[text_col].to_pylist() if text_col in batch.column_names else [None] * len(keys)
    exts = batch[ext_col].to_pylist() if ext_col in batch.column_names else [None] * len(keys)
    metas = {c: batch[c].to_pylist() for c in meta_cols}

    seen: set[str] = set()
    samples = []
    for i in range(batch.num_rows):
        key = _sanitize_key(keys[i], i)
        if key in seen:  # within-shard de-collision (see module contract)
            key = f"{key}-{i}"
        seen.add(key)
        samples.append((key, i))
    samples.sort()

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for key, i in samples:
            meta = {c: metas[c][i] for c in meta_cols}
            _member(tf, f"{key}.json", json.dumps(meta, sort_keys=True, allow_nan=False).encode())
            if payloads[i] is not None:
                ext = _EXT_SAFE.sub("", (exts[i] or "").lower()) or "bin"
                # ext is a grouping convenience only; the authoritative fmt
                # value rides in .json (a planted fmt="bmp" over png bytes
                # must round-trip as "bmp", not be inferred from content)
                _member(tf, f"{key}.{ext}", payloads[i])
            if texts[i] is not None:
                _member(tf, f"{key}.txt", texts[i].encode("utf-8"))
    return buf.getvalue()


class _ShardSink:
    """map_batches callable: one tar shard per batch, manifest row out."""

    def __init__(self, out_dir: str, key_col: str, payload_col: str, ext_col: str, text_col: str):
        self.out_dir = out_dir
        self.key_col, self.payload_col = key_col, payload_col
        self.ext_col, self.text_col = ext_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"shard": pa.array([], pa.string()), "n_rows": pa.array([], pa.int64()),
                 "n_bytes": pa.array([], pa.int64())}
            )
        data = shard_bytes_of_batch(
            batch, self.key_col, self.payload_col, self.ext_col, self.text_col
        )
        # content-addressed (+row count) name: re-runs of the same batch are
        # idempotent replaces; distinct batches can't collide under the
        # unique-key contract (same name => same bytes => same keys)
        tag = hashlib.md5(data).hexdigest()[:16]
        path = os.path.join(self.out_dir, f"shard-{tag}-{batch.num_rows}.tar")
        tmp = f"{path}.{os.getpid()}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, path)
        return pa.table(
            {"shard": [path], "n_rows": pa.array([batch.num_rows], pa.int64()),
             "n_bytes": pa.array([len(data)], pa.int64())}
        )


def write_webdataset(
    ds: "ray.data.Dataset",
    out_dir: str,
    rows_per_shard: int = 64,
    key_col: str = "image_id",
    payload_col: str = "bytes",
    ext_col: str = "fmt",
    text_col: str = "caption",
) -> pa.Table:
    """Write ``ds`` as WebDataset tar shards under ``out_dir``; returns the
    (tiny) manifest table (shard, n_rows, n_bytes), one row per shard.

    ``rows_per_shard`` is an upper bound per tar (Ray may emit smaller
    batches at block boundaries).  At production scale pick it so a shard is
    ~1 GB of payload; at fixture scale small values exercise multi-shard
    layout."""
    os.makedirs(out_dir, exist_ok=True)
    manifest = ds.map_batches(
        _ShardSink(out_dir, key_col, payload_col, ext_col, text_col),
        batch_size=rows_per_shard,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    from rayval.util import collect_tables

    return collect_tables(
        manifest,
        pa.schema([("shard", pa.string()), ("n_rows", pa.int64()), ("n_bytes", pa.int64())]),
    )


def parse_shard(
    data: bytes,
    meta_schema: pa.Schema = FLAGSHIP_META_SCHEMA,
    payload_col: str = "bytes",
    text_col: str = "caption",
) -> pa.Table:
    """Parse one tar shard's bytes into an Arrow table (samples sorted by
    key — the writer's order).  Unknown double-extensions are impossible by
    construction (one payload member per sample); a sample with NO .json
    member is malformed and raises loudly rather than yielding a half-row."""
    samples: dict[str, dict] = {}
    order: list[str] = []
    with tarfile.open(fileobj=io.BytesIO(data)) as tf:
        for info in tf:
            if not info.isfile():
                continue
            base = os.path.basename(info.name)
            key, dot, ext = base.partition(".")
            if not dot:
                raise ValueError(f"tar member without extension: {info.name!r}")
            if key not in samples:
                samples[key] = {}
                order.append(key)
            rec = samples[key]
            payload = tf.extractfile(info).read()
            if ext == "json":
                rec["_meta"] = json.loads(payload.decode())
            elif ext == "txt":
                rec["_text"] = payload.decode("utf-8")
            else:
                if "_payload" in rec:
                    raise ValueError(f"duplicate payload member for sample {key!r}")
                rec["_payload"] = payload

    cols: dict[str, list] = {f.name: [] for f in meta_schema}
    payloads: list = []
    texts: list = []
    for key in order:
        rec = samples[key]
        if "_meta" not in rec:
            raise ValueError(f"sample {key!r} has no .json metadata member")
        for f in meta_schema:
            cols[f.name].append(rec["_meta"].get(f.name))
        payloads.append(rec.get("_payload"))
        texts.append(rec.get("_text"))

    arrays, names = [], []
    for f in meta_schema:
        names.append(f.name)
        arrays.append(pa.array(cols[f.name], type=f.type))
    # metadata columns first, then payload + text; callers select/reorder to
    # the flagship layout (image_id, bytes, w, h, fmt, caption, phash) if
    # they need it positionally
    names += [payload_col, text_col]
    arrays += [pa.array(payloads, type=pa.binary()), pa.array(texts, type=pa.string())]
    return pa.table(dict(zip(names, arrays)))


class _ShardParser:
    def __init__(self, meta_schema: pa.Schema, payload_col: str, text_col: str):
        self.meta_schema, self.payload_col, self.text_col = meta_schema, payload_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        tables = [
            parse_shard(d, self.meta_schema, self.payload_col, self.text_col)
            for d in batch["bytes"].to_pylist()
        ]
        tables = [t for t in tables if t.num_rows]
        if not tables:
            empty = parse_shard(_EMPTY_TAR, self.meta_schema, self.payload_col, self.text_col)
            return empty
        return pa.concat_tables(tables)


_EMPTY_TAR = (lambda b: (tarfile.open(fileobj=b, mode="w").close(), b.getvalue())[1])(io.BytesIO())


def read_webdataset(
    shard_dir: str,
    meta_schema: pa.Schema = FLAGSHIP_META_SCHEMA,
    payload_col: str = "bytes",
    text_col: str = "caption",
) -> "ray.data.Dataset":
    """Read a directory of WebDataset tar shards as a Ray Dataset.

    One input block per shard (``read_binary_files``), parsed inside
    ``map_batches`` so samples stream under backpressure; no shuffle."""
    files = ray.data.read_binary_files(shard_dir, file_extensions=["tar"])
    return files.map_batches(
        _ShardParser(meta_schema, payload_col, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def wds_cache_of_images(images_dir: str, rows_per_shard: int = 64) -> str:
    """Write (once) the generated flagship images table as a WDS shard dir
    under /tmp; returns the directory.

    Cache discipline mirrors sources/jsonl.py, with one extra hazard: two
    concurrent cold-cache writers may batch rows differently, so their shard
    SETS differ — accumulating both in one directory would duplicate samples.
    Therefore shards are staged into a process-unique directory that is
    renamed into place atomically; the loser of the rename race discards its
    staging dir, so readers only ever see exactly one complete shard set."""
    st = os.stat(images_dir)
    tag = hashlib.md5(
        f"{os.path.abspath(images_dir)}|{rows_per_shard}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:8]
    final = f"/tmp/rayval_wds_v{WDS_VERSION}_{tag}"
    if os.path.isdir(final):
        return final
    stage = f"{final}.stage.{os.getpid()}.{uuid.uuid4().hex}"
    ds = ray.data.read_parquet(images_dir)
    write_webdataset(ds, stage, rows_per_shard=rows_per_shard)
    try:
        os.rename(stage, final)
    except OSError:
        shutil.rmtree(stage, ignore_errors=True)  # lost the race; winner's set serves
    return final
