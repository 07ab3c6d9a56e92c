"""JSONL source helper: cache a parquet table as line-delimited JSON for
``ray.data.read_json`` — the engine's second source format (proves the
pipeline layer is source-format-agnostic; queries use it via
``q_jsonl_events_by_type``).

Cache discipline (mirrors sources/images.py): the cache directory name keys
the source path AND a serialization version — bump ``JSONL_VERSION`` whenever
the emitted shape changes, or stale files would be silently served.  The
write goes to a PROCESS-UNIQUE temp name before an atomic ``os.replace``, so
two concurrent drivers racing on a cold cache each write their own temp and
the loser's replace is a no-op overwrite of identical content — never an
interleaved/corrupt file.
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid

import pyarrow.parquet as pq

JSONL_VERSION = 1


def jsonl_cache_of_parquet(src: str, columns: list[str]) -> str:
    """Path to a JSONL rendering of ``src``'s ``columns`` under /tmp.

    Column contract: JSON-native, FINITE values (strings/ints/finite
    floats/bools) — ``allow_nan=False`` makes a NaN/Infinity a loud error at
    write time instead of committing a cache file Arrow's JSON reader can't
    parse.  The cache tag keys the source's (mtime, size) too, so an
    overwritten parquet at the same path regenerates instead of silently
    serving stale rows."""
    st = os.stat(src)
    tag = hashlib.md5(
        f"{os.path.abspath(src)}|{','.join(columns)}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:8]
    jdir = f"/tmp/rayval_jsonl_v{JSONL_VERSION}_{tag}"
    jpath = f"{jdir}/data.jsonl"
    if os.path.exists(jpath):
        return jpath
    os.makedirs(jdir, exist_ok=True)
    t = pq.read_table(src, columns=columns)
    tmp = f"{jpath}.{os.getpid()}.{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as fh:
        for row in zip(*[t[c].to_pylist() for c in columns]):
            fh.write(json.dumps(dict(zip(columns, row)), allow_nan=False) + "\n")
    os.replace(tmp, jpath)
    return jpath
