"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing here
(or in the rayval library) calls ``ray.init()`` / ``ray.shutdown()``.

``entry()``    — flagship constraint validation over /root/testdata/sf0.001.
``queries()``  — one callable per implemented operator/pipeline (SURVEY.md §2
                 + the training-data ops); each takes ``sf_dir``.
``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query
                 (identical column names; integer fixed-point for float
                 aggregates).  Rows-only ops (sketches, LSH, heuristics,
                 image decode) are deliberately absent here.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _ensure_workers_can_run_rayval() -> None:
    """Ray workers resolve modules via the driver's cwd or PYTHONPATH — not
    the driver's sys.path.  If neither points at this repo, register every
    rayval module with cloudpickle for BY-VALUE serialization so map_batches
    callables ship their code instead of an import reference."""
    # compare PYTHONPATH as os.pathsep-split ENTRIES — a substring test
    # would let /root/repo/tools or /root/repo-backup wrongly disable the
    # by-value registration workers depend on
    if os.getcwd() == _REPO or _REPO in os.environ.get("PYTHONPATH", "").split(os.pathsep):
        return
    try:
        import importlib
        import pkgutil

        from ray import cloudpickle

        import rayval

        for m in [rayval] + [
            importlib.import_module(mi.name)
            for mi in pkgutil.walk_packages(rayval.__path__, prefix="rayval.")
        ]:
            cloudpickle.register_pickle_by_value(m)
    except Exception:
        pass  # best-effort: the common case (cwd == repo) needs nothing


_ensure_workers_can_run_rayval()


def entry() -> Any:
    """Flagship pipeline on sf0.001: compiled constraint profiles over
    lineitem/part/orders -> combined violation listing (stable schema
    (row_key, constraint_id, table))."""
    import pyarrow as pa

    from rayval.pipelines.queries import (
        q_lineitem_violations,
        q_orders_violations,
        q_part_violations,
    )

    sf_dir = "/root/testdata/sf0.001"
    parts = []
    for table, fn in [
        ("lineitem", q_lineitem_violations),
        ("part", q_part_violations),
        ("orders", q_orders_violations),
    ]:
        t = fn(sf_dir)
        parts.append(t.append_column("table", pa.array([table] * t.num_rows, type=pa.string())))
    return pa.concat_tables(parts)


def queries() -> dict[str, Callable[[str], Any]]:
    from rayval.pipelines.queries import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from rayval.pipelines.queries import QUERIES, ensure_oracle_fixtures

    # some oracles read deterministic /tmp fixtures (generated images parquet);
    # materialize them here so the SQL runs no matter which side goes first
    ensure_oracle_fixtures()
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
