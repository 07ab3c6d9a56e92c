"""rayval — a Ray-Data-native schema + constraint validation engine.

Re-imagines the validation semantics of ``eliassona/xmlschemavalidator``
(reference: /root/reference/src/xmlschemavalidator/{core,parser}.clj) for
columnar data at web scale: a declarative constraint DSL compiled once on the
driver into vectorized pyarrow.compute mask evaluators, applied via
``ray.data.Dataset.map_batches`` over zero-copy Arrow batches.

Top-level surface:

- ``rayval.constraints`` — the DSL (leaf facets, combinators, Profile) and the
  batch compiler (the analog of the reference's schema->closure compile step,
  core.clj:257-261 / parser.clj:331-341).
- ``rayval.stages`` — Ray Data stages: stateless mask pass, stateful decode
  actor pool, sketch/stats partials, dedup, referential integrity.
- ``rayval.pipelines`` — end-to-end flagship pipeline with per-fragment
  checkpoint/resume.
- ``rayval.state`` — mergeable sketches (HLL, KLL, t-digest, Bloom).
- ``rayval.functions`` — scalar/batch function library (image codecs, phash,
  text analysis, minhash/simhash).
"""

def _stub_fsspec_http() -> None:
    """Make ``fsspec.implementations.http`` importable even without aiohttp.

    Ray Data's path resolution imports it on EVERY read/write path resolve,
    swallowing only ``ModuleNotFoundError``.  In this environment the module
    exists but its own ``import aiohttp`` fails; under concurrent imports from
    multiple driver threads (concurrent fragment groups) the failed partial
    import can surface as a plain ``ImportError`` that Ray does not catch.
    Registering a benign stub once makes the import deterministic; the stub
    class is only ever isinstance-checked for local-path workloads."""
    try:
        import fsspec.implementations.http  # noqa: F401
    except Exception:
        import sys
        import types

        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # pragma: no cover - sentinel, never instantiated
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod


_stub_fsspec_http()

from rayval.constraints import (  # noqa: F401
    AllOf,
    AnyOf,
    Enum,
    Field,
    Fixed,
    Length,
    MaxLength,
    MinLength,
    NotNull,
    Pattern,
    Profile,
    Range,
    TypeCheck,
)

__version__ = "0.1.0"
