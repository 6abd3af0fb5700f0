"""Engine configuration, mirroring the reference's reloptions/GUCs.

Validation bounds match /root/reference/crates/bm25/src/types.rs:20-45
(k1 in [1.2, 2.0], b in [0.0, 1.0]) and the documented defaults
k1=1.2, b=0.75. The 32-byte per-index seed mirrors
src/index/bm25/am/am_build.rs:143 (random there; explicit/derivable
here so that builds are reproducible across cluster sizes).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

FORMAT_MAGIC = "bm25spark"
# v2: long-token term keys switched from the blake2b deviation to the
# reference's keyed BLAKE3 (bm25spark/blake3.py) — v1 artifacts bake
# blake2b keys and are not readable by a v2 engine (Bm25Index refuses
# with a rebuild hint; intern_blake2b stays available for migration)
FORMAT_VERSION = 2

#: posting block size (docs per compressed block),
#: /root/reference/crates/bm25/src/flush.rs:81-89
BLOCK_SIZE = 128

#: interned term-key width in bytes, /root/reference/crates/bm25/src/lib.rs:37
KEY_WIDTH = 16

#: default top-k candidate limit (bm25.limit), reference README.md:464
DEFAULT_LIMIT = 100

#: guardrail for the driver-resident search path: ``Bm25Index.search``
#: keeps a dense uint8 fieldnorm array on the driver (fine at bench
#: scale, wrong at 10^9+ docs), so above this doc count ``search_df``
#: auto-routes to the per-shard distributed kernel and ``search``
#: refuses instead of trusting the caller to know.
DRIVER_SEARCH_MAX_DOCS = 5_000_000


def derive_seed(name: str) -> bytes:
    """Deterministic 32-byte index seed from an index name."""
    return hashlib.sha256(name.encode("utf-8")).digest()


@dataclass(frozen=True)
class Bm25Config:
    k1: float = 1.2
    b: float = 0.75
    seed: bytes = field(default_factory=lambda: derive_seed("bm25spark"))
    analyzer: str = "simple"
    #: docs per shard of the document-partitioned index. Every term's
    #: postings are split at shard boundaries, which both bounds the
    #: per-task group size for skewed (stop-word-like) terms and gives
    #: the distributed query path its unit of parallelism.
    shard_size: int = 1 << 20
    #: number of hash buckets the postings table is written under
    #: (directory-level partition pruning for query-term reads).
    term_buckets: int = 64

    def __post_init__(self) -> None:
        if not (1.2 <= self.k1 <= 2.0):
            raise ValueError(f"k1 must be in [1.2, 2.0], got {self.k1}")
        if not (0.0 <= self.b <= 1.0):
            raise ValueError(f"b must be in [0.0, 1.0], got {self.b}")
        if len(self.seed) != 32:
            raise ValueError("seed must be 32 bytes")
        if self.shard_size < BLOCK_SIZE:
            raise ValueError("shard_size must be >= BLOCK_SIZE")
