"""Mergeable, serializable sketch state: HLL (uniqueness), KLL (quantiles /
drift), Bloom (referential join small-side)."""

from rayval.state.bloom import Bloom, ShardedBloom, bloom_from_bytes  # noqa: F401
from rayval.state.hashing import HASH_SCHEME_VERSION, hash64, rehash  # noqa: F401
from rayval.state.heavyhitters import MisraGries  # noqa: F401
from rayval.state.hll import HLL  # noqa: F401
from rayval.state.kll import KLL, ks_distance  # noqa: F401
from rayval.state.tdigest import TDigest  # noqa: F401
