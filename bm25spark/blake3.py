"""Pure-Python BLAKE3 (hash + keyed modes), 32-byte digests.

Independent implementation of the public BLAKE3 specification
("BLAKE3: one function, fast everywhere", Aumasson/Neves/O'Connor/
Wilcox-O'Hearn, 2020): 7-round compression on a 16-word state,
message-schedule permutation between rounds, 1024-byte chunks hashed
as a binary tree whose left subtree always covers the largest
power-of-two number of chunks that leaves at least one chunk on the
right, keyed mode = key words as the initial chaining value plus the
KEYED_HASH flag.

Written for the ≥16-byte token intern path (reference
crates/bm25/src/vector.rs:19-35 calls ``blake3::keyed_hash(seed,
token)``) so term keys are byte-identical with the reference's index
artifacts; the container has no blake3 library, hence this
from-the-spec implementation. Verified against the public
known-answer digests for the unkeyed mode (empty / "abc" /
"hello world") and by a structurally independent chunk-stack
reimplementation across chunk/block boundaries in
tests/test_core.py. Throughput is irrelevant here: interning is
memoized per unique token (analyze.py), so this runs once per
distinct ≥16-byte token, not once per occurrence.
"""

from __future__ import annotations

import struct

IV = (
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
)

_PERM = (2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)

BLOCK_LEN = 64
CHUNK_LEN = 1024

CHUNK_START = 1 << 0
CHUNK_END = 1 << 1
PARENT = 1 << 2
ROOT = 1 << 3
KEYED_HASH = 1 << 4

_M32 = 0xFFFFFFFF


def _compress(cv, block_words, counter, block_len, flags):
    """One BLAKE3 compression: returns the full 16-word output (the
    first 8 words are the chaining value / digest words)."""
    v = [
        cv[0], cv[1], cv[2], cv[3], cv[4], cv[5], cv[6], cv[7],
        IV[0], IV[1], IV[2], IV[3],
        counter & _M32, (counter >> 32) & _M32, block_len, flags,
    ]
    m = list(block_words)
    for r in range(7):
        # column step
        for a, b, c, d, x, y in (
            (0, 4, 8, 12, 0, 1),
            (1, 5, 9, 13, 2, 3),
            (2, 6, 10, 14, 4, 5),
            (3, 7, 11, 15, 6, 7),
            (0, 5, 10, 15, 8, 9),
            (1, 6, 11, 12, 10, 11),
            (2, 7, 8, 13, 12, 13),
            (3, 4, 9, 14, 14, 15),
        ):
            va = (v[a] + v[b] + m[x]) & _M32
            vd = v[d] ^ va
            vd = ((vd >> 16) | (vd << 16)) & _M32
            vc = (v[c] + vd) & _M32
            vb = v[b] ^ vc
            vb = ((vb >> 12) | (vb << 20)) & _M32
            va = (va + vb + m[y]) & _M32
            vd = vd ^ va
            vd = ((vd >> 8) | (vd << 24)) & _M32
            vc = (vc + vd) & _M32
            vb = vb ^ vc
            vb = ((vb >> 7) | (vb << 25)) & _M32
            v[a], v[b], v[c], v[d] = va, vb, vc, vd
        if r != 6:
            m = [m[i] for i in _PERM]
    return [
        *(v[i] ^ v[i + 8] for i in range(8)),
        *(v[i + 8] ^ cv[i] for i in range(8)),
    ]


def _chunk_cv(key_words, flags_base, chunk, counter, root):
    """Chaining value of one ≤1024-byte chunk (the 32-byte root digest
    words when ``root`` — a single-chunk tree's output)."""
    cv = key_words
    blocks = [chunk[i:i + BLOCK_LEN] for i in range(0, len(chunk), BLOCK_LEN)]
    if not blocks:
        blocks = [b""]
    last = len(blocks) - 1
    for bi, blk in enumerate(blocks):
        flags = flags_base
        if bi == 0:
            flags |= CHUNK_START
        if bi == last:
            flags |= CHUNK_END
            if root:
                flags |= ROOT
        words = struct.unpack("<16I", blk.ljust(BLOCK_LEN, b"\x00"))
        cv = _compress(cv, words, counter, len(blk), flags)[:8]
    return cv


def _left_chunks(n: int) -> int:
    """Largest power of two strictly less than n (n >= 2): the spec's
    left-subtree width."""
    return 1 << ((n - 1).bit_length() - 1)


def _digest(key_words, flags_base, data: bytes) -> bytes:
    n_chunks = max(1, (len(data) + CHUNK_LEN - 1) // CHUNK_LEN)
    if n_chunks == 1:
        return struct.pack(
            "<8I", *_chunk_cv(key_words, flags_base, data, 0, root=True)
        )
    cvs = [
        _chunk_cv(
            key_words,
            flags_base,
            data[i * CHUNK_LEN:(i + 1) * CHUNK_LEN],
            i,
            root=False,
        )
        for i in range(n_chunks)
    ]

    def subtree(lo: int, hi: int):
        if hi - lo == 1:
            return cvs[lo]
        mid = lo + _left_chunks(hi - lo)
        return _compress(
            key_words,
            (*subtree(lo, mid), *subtree(mid, hi)),
            0,
            BLOCK_LEN,
            flags_base | PARENT,
        )[:8]

    mid = _left_chunks(n_chunks)
    root_out = _compress(
        key_words,
        (*subtree(0, mid), *subtree(mid, n_chunks)),
        0,
        BLOCK_LEN,
        flags_base | PARENT | ROOT,
    )
    return struct.pack("<8I", *root_out[:8])


def blake3_hash(data: bytes) -> bytes:
    """Unkeyed BLAKE3, 32 bytes (exists for the public known-answer
    vectors; the engine uses :func:`keyed_hash`)."""
    return _digest(IV, 0, data)


def keyed_hash(key: bytes, data: bytes) -> bytes:
    """``blake3::keyed_hash(key, data)``: 32-byte key as the initial
    chaining value, KEYED_HASH flag on every compression."""
    if len(key) != 32:
        raise ValueError("BLAKE3 key must be exactly 32 bytes")
    return _digest(struct.unpack("<8I", key), KEYED_HASH, data)
