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
- ``rayval.state`` — mergeable sketches (HLL, KLL, Bloom).
- ``rayval.functions`` — scalar/batch function library (image codecs, phash,
  text analysis, minhash/simhash).
"""

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
