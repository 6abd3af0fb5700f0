"""Top-k retrieval kernels over block-compressed posting lists.

Two kernels, both exact (identical result sets), no Spark imports so
they run on the driver or inside executor tasks:

- :func:`bmw_topk` — a faithful restatement of the reference's
  Block-Max WAND search loop (/root/reference/crates/bm25/src/
  search.rs:28-282 and the Cursor at :316-518): min-heap of per-term
  cursors keyed by current doc-id, term-upper-bound pivot selection,
  block-level alignment before full alignment, lazy block
  decompression, skip to 1 + min(block-max doc id) on block-bound
  failure. Demonstrates operator parity; per-pivot work is Python.

- :func:`taat_topk` — the fast path: vectorized term-at-a-time exact
  scoring. All query-term blocks are decoded with NumPy (decode is
  the cheap part), candidate docs are the union of posting ids, and
  contributions accumulate via searchsorted scatter-adds. NumPy is
  this engine's SIMD; for typical queries this beats a per-document
  Python loop by orders of magnitude, and the distributed form runs
  it per doc-shard (bounded work per task) with a global top-k merge.

Both honor the reference's semantics: threshold comparisons are
strict (search.rs:161,203: candidates must *beat* the running k-th
score; docs scoring 0 never surface), absent query terms are skipped
(search.rs:55-62), and ties are broken by ascending doc id
(deterministic — stronger than the reference's unspecified heap order
on ties, crates/always_equal/src/lib.rs).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass

import numpy as np

from . import packing
from .scoring import Cache

U64_MAX = np.iinfo(np.int64).max


@dataclass
class TermPostings:
    """All blocks of one query term, in ascending doc-id order
    (ascending (shard, block_ord))."""

    cache: Cache  # per-term score cache (s0/s1)
    wand_fn: int
    wand_tf: int
    min_doc: np.ndarray  # int64, global ids
    max_doc: np.ndarray  # int64
    count: np.ndarray  # int32
    block_fn: np.ndarray  # uint8/int
    block_tf: np.ndarray  # int64
    ids_meta: list[int]
    ids_bytes: list[bytes]
    tfs_meta: list[int]
    tfs_bytes: list[bytes]
    shard_base: np.ndarray  # int64 global base of each block's shard
    #: optional pre-decoded (ids, tfs) — a resident server memoizes the
    #: decode of hot terms (Bm25Index._decoded_cache); kernels treat it
    #: as read-only
    decoded: tuple | None = None

    @property
    def n_blocks(self) -> int:
        return len(self.min_doc)

    def token_upper_bound(self) -> float:
        return float(self.cache.evaluate(self.wand_fn, self.wand_tf))

    def block_upper_bound(self, i: int) -> float:
        return float(self.cache.evaluate(int(self.block_fn[i]), int(self.block_tf[i])))

    def decode(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        """-> (global doc ids int64, tfs int64) of block i."""
        n = int(self.count[i])
        local_min = int(self.min_doc[i] - self.shard_base[i])
        ids = packing.decompress_document_ids(
            local_min, int(self.ids_meta[i]), self.ids_bytes[i]
        )[:n]
        tfs = packing.decompress_term_frequencies(
            int(self.tfs_meta[i]), self.tfs_bytes[i]
        )[:n]
        return (
            ids.astype(np.int64) + int(self.shard_base[i]),
            tfs.astype(np.int64),
        )

    def decode_all(self) -> tuple[np.ndarray, np.ndarray]:
        """Batched decode of every block (grouped-by-bitwidth vector
        unpack — see packing.decompress_blocks_batch); element-identical
        to per-block :meth:`decode`."""
        if self.decoded is not None:
            return self.decoded
        if not self.n_blocks:
            e = np.empty(0, dtype=np.int64)
            return e, e
        counts = self.count.astype(np.int64)
        id_parts = packing.decompress_blocks_batch(
            self.ids_meta,
            self.ids_bytes,
            counts,
            bases=self.min_doc - self.shard_base,
        )
        tf_parts = packing.decompress_blocks_batch(
            self.tfs_meta, self.tfs_bytes, counts
        )
        ids = np.concatenate(
            [p[:c] for p, c in zip(id_parts, counts)]
        ).astype(np.int64)
        ids += np.repeat(self.shard_base, counts)
        tfs = np.concatenate(
            [p[:c] for p, c in zip(tf_parts, counts)]
        ).astype(np.int64)
        return ids, tfs


class _Results:
    """Bounded min-heap of (score, doc) with strict threshold —
    reference Results (search.rs:284-314) plus deterministic tie
    handling: among equal scores larger doc ids are evicted first, so
    the kept set matches ORDER BY score DESC, doc_id ASC."""

    __slots__ = ("k", "heap", "threshold")

    def __init__(self, k: int):
        self.k = k
        self.heap: list[tuple[float, int]] = []  # (score, -doc_id)
        self.threshold = 0.0

    def push(self, score: float, doc: int) -> None:
        heapq.heappush(self.heap, (score, -doc))
        if len(self.heap) > self.k:
            heapq.heappop(self.heap)
        if len(self.heap) == self.k:
            self.threshold = max(self.threshold, self.heap[0][0])

    def sorted(self) -> list[tuple[int, float]]:
        return [
            (-nd, s) for s, nd in sorted(self.heap, key=lambda t: (-t[0], -t[1]))
        ]


class _Cursor:
    """Port of the reference Cursor (search.rs:316-518) over in-memory
    block arrays. document_id == U64_MAX means exhausted."""

    __slots__ = (
        "tp", "bi", "document_id", "pos", "ids", "tfs", "filled", "block_ub", "ord",
    )

    def __init__(self, tp: TermPostings, ord: int = 0):
        self.ord = ord
        self.tp = tp
        self.bi = 0
        self.filled = False
        self.ids: np.ndarray | None = None
        self.tfs: np.ndarray | None = None
        self.pos = 0
        self.document_id = int(tp.min_doc[0]) if tp.n_blocks else U64_MAX
        self.block_ub = tp.block_upper_bound(0) if tp.n_blocks else 0.0

    def token_upper_bound(self) -> float:
        return self.tp.token_upper_bound()

    def block_max_document_id(self) -> int:
        return int(self.tp.max_doc[self.bi]) if self.bi < self.tp.n_blocks else U64_MAX

    def seek_block(self, target: int) -> None:
        if self.document_id == U64_MAX or target <= self.block_max_document_id():
            return
        nxt = int(np.searchsorted(self.tp.max_doc, target, side="left"))
        if nxt >= self.tp.n_blocks:
            self.document_id = U64_MAX
            self.block_ub = 0.0
            return
        self.bi = nxt
        self.document_id = int(self.tp.min_doc[nxt])
        self.pos = 0
        self.filled = False
        self.block_ub = self.tp.block_upper_bound(nxt)

    def _fill(self) -> None:
        if not self.filled:
            self.ids, self.tfs = self.tp.decode(self.bi)
            self.filled = True

    def seek(self, target: int) -> None:
        self.seek_block(target)
        if self.document_id == U64_MAX or target <= self.document_id:
            return
        if target == int(self.tp.max_doc[self.bi]):
            # block-boundary fast path (search.rs:440-444)
            self.document_id = target
            self.pos = int(self.tp.count[self.bi]) - 1
            return
        self._fill()
        assert self.ids is not None
        if target == self.document_id + 1:
            i = self.pos + 1
        else:
            i = self.pos + 1 + int(
                np.searchsorted(self.ids[self.pos + 1 :], target, side="left")
            )
        self.pos = i
        self.document_id = int(self.ids[i])

    def get_tf(self) -> int:
        self._fill()
        assert self.tfs is not None
        return int(self.tfs[self.pos])


def bmw_topk(
    terms: list[TermPostings],
    fieldnorms: np.ndarray,
    k: int,
    allowed=None,
) -> list[tuple[int, float]]:
    """Block-Max WAND top-k (reference search.rs:151-280).

    ``fieldnorms``: uint8 array indexed by global doc id (per-shard
    slices at scale). ``allowed``: optional callable doc_id -> bool
    evaluated *before* a candidate counts toward k (the reference's
    prefilter, scanners/default.rs:117-129, fetcher.rs:180-216).
    """
    results = _Results(k)
    if k <= 0:
        return []
    cursors = [_Cursor(t, i) for i, t in enumerate(terms) if t.n_blocks]
    seq = iter(range(1 << 60))  # keeps heap comparisons total
    head = [(c.document_id, next(seq), c) for c in cursors]
    heapq.heapify(head)
    tail: list[_Cursor] = []

    def push_head(c: _Cursor) -> None:
        heapq.heappush(head, (c.document_id, next(seq), c))

    while True:
        # --- pivot selection (search.rs:152-169) ---
        s = sum(c.token_upper_bound() for c in tail)
        pivot = None
        exhausted = False
        while head:
            _, _, c = heapq.heappop(head)
            if c.document_id == U64_MAX:
                exhausted = True
                break
            if results.threshold < s + c.token_upper_bound():
                pivot = c
                break
            s += c.token_upper_bound()
            tail.append(c)
        if pivot is None or exhausted:
            break
        document_id = pivot.document_id
        lead = [pivot]
        while head and head[0][0] == document_id:
            lead.append(heapq.heappop(head)[2])

        # --- block-align the tail (search.rs:177-192) ---
        kept_tail, failures = [], []
        for c in tail:
            c.seek_block(document_id)
            (failures if document_id < c.document_id else kept_tail).append(c)
        tail = kept_tail
        if failures:
            for c in lead:
                push_head(c)
            for c in failures:
                push_head(c)
            continue

        sum_block_ub = sum(c.block_ub for c in tail) + sum(c.block_ub for c in lead)
        if results.threshold < sum_block_ub:
            # --- full alignment + scoring (search.rs:204-242) ---
            kept_tail, failures = [], []
            for c in tail:
                c.seek(document_id)
                (failures if document_id < c.document_id else kept_tail).append(c)
            tail = kept_tail
            if failures:
                for c in lead:
                    push_head(c)
                for c in failures:
                    push_head(c)
                continue
            if allowed is None or allowed(document_id):
                fn = int(fieldnorms[document_id])
                score = 0.0
                # accumulate in term order so float addition order is
                # deterministic and matches taat_topk bit-for-bit
                for c in sorted(tail + lead, key=lambda c: c.ord):
                    score += float(c.tp.cache.evaluate(fn, c.get_tf()))
                if results.threshold < score:
                    results.push(score, document_id)
            for c in tail + lead:
                c.seek(document_id + 1)
                push_head(c)
            tail = []
        else:
            # --- block-max skip (search.rs:243-279) ---
            min_bmax = min(
                c.block_max_document_id() for c in lead + tail
            )
            next_head = head[0][0] if head else U64_MAX
            seek_to = min(min_bmax + 1, next_head)
            pool = lead + tail
            arg = max(range(len(pool)), key=lambda i: pool[i].token_upper_bound())
            mover = pool[arg]
            mover.seek(seek_to)
            push_head(mover)
            n_lead = len(lead)
            for i in range(n_lead):
                if i != arg:
                    push_head(pool[i])
            tail = [pool[i] for i in range(n_lead, len(pool)) if i != arg]
    return results.sorted()


def taat_topk(
    terms: list[TermPostings],
    fieldnorms: np.ndarray,
    k: int,
    allowed_mask: np.ndarray | None = None,
    dense: bool | None = None,
) -> list[tuple[int, float]]:
    """Vectorized exact top-k (term-at-a-time, decode-all).

    Multi-term accumulation picks between two bit-identical forms:
    a dense per-doc accumulator when the posting mass is a decent
    fraction of the corpus, else candidate-union + searchsorted.
    Top-k by argsort on (-score, doc_id). Equivalent to the exact
    DataFrame scorer, ~100% NumPy. ``dense`` forces the choice
    (tests pin the two forms equal); None = auto by posting mass.
    """
    if k <= 0:
        return []
    terms = [t for t in terms if t.n_blocks]
    if not terms:
        return []
    decoded = [t.decode_all() for t in terms]
    if dense is None:
        dense = sum(len(ids) for ids, _ in decoded) * 8 >= len(fieldnorms)
    if len(terms) == 1:
        # single-term fast path: the term's ids are already sorted and
        # unique (blocks ascend across (shard, block_ord)), so no
        # union/searchsorted pass is needed
        candidates, tfs = decoded[0]
        if allowed_mask is not None and len(candidates):
            m = allowed_mask[candidates]
            candidates, tfs = candidates[m], tfs[m]
        if not len(candidates):
            return []
        scores = np.asarray(
            terms[0].cache.evaluate(fieldnorms[candidates], tfs),
            dtype=np.float64,
        )
    elif dense:
        # dense-accumulator path: when the posting mass is a decent
        # fraction of the corpus, score into a dense array (one float64
        # per doc) — no candidate union (np.unique) and no per-term
        # searchsorted, a measured ~4x on multi-term queries at 170k
        # docs. Posting ids are unique within a term, so plain
        # fancy-index `+=` is a correct scatter-add; contributions land
        # per doc in the same term order as the sparse path, so final
        # scores are bit-identical. Memory: 8 B/doc, bounded by the
        # driver-path guardrail (or shard_size on the distributed
        # path, where ids are global and `fieldnorms` is an
        # offset-carrying shard view).
        # Shard-view protocol (structural, not duck-typed): a plain
        # ndarray is a GLOBAL fieldnorm array (base 0; np.ndarray's own
        # `.base` is the unrelated buffer parent and must not be read);
        # anything else MUST carry an explicit integer `base` offset
        # (e.g. distributed._OffsetFieldnorms). A wrapper without one
        # is refused rather than silently scored at base 0 — a plain
        # offset slice passed directly would mis-map global ids.
        if isinstance(fieldnorms, np.ndarray):
            base = 0
        else:
            try:
                base = int(fieldnorms.base)
            except (AttributeError, TypeError, ValueError) as e:
                raise TypeError(
                    "taat_topk dense path: non-ndarray fieldnorms must "
                    "expose an integer .base global-id offset (see "
                    "bm25spark.distributed._OffsetFieldnorms); got "
                    f"{type(fieldnorms).__name__}"
                ) from e
        dense = np.zeros(len(fieldnorms), dtype=np.float64)
        for t, (ids, tfs) in zip(terms, decoded):
            loc = ids if base == 0 else ids - base
            dense[loc] += np.asarray(
                t.cache.evaluate(fieldnorms[ids], tfs), dtype=np.float64
            )
        local = np.flatnonzero(dense > 0.0)
        scores = dense[local]
        candidates = local if base == 0 else local + base
        if allowed_mask is not None and len(candidates):
            keepm = np.asarray(allowed_mask[candidates], dtype=bool)
            candidates, scores = candidates[keepm], scores[keepm]
    else:
        candidates = np.unique(np.concatenate([ids for ids, _ in decoded]))
        if allowed_mask is not None and len(candidates):
            candidates = candidates[allowed_mask[candidates]]
        if not len(candidates):
            return []
        scores = np.zeros(len(candidates), dtype=np.float64)
        fns = fieldnorms[candidates]
        for t, (ids, tfs) in zip(terms, decoded):
            pos = np.searchsorted(candidates, ids).clip(0, len(candidates) - 1)
            m = candidates[pos] == ids  # False only when prefilter dropped
            if m.any():
                idx = pos[m]
                scores[idx] += t.cache.evaluate(fns[idx], tfs[m])
    keep = scores > 0.0
    candidates, scores = candidates[keep], scores[keep]
    if not len(candidates):
        return []
    kk = min(k, len(candidates))
    # top-k by (-score, doc_id) without sorting all candidates:
    # argpartition finds the k-th score, the full (score, id) sort runs
    # only over the >=k-th subset (ties included, so the doc-id
    # tiebreak is exact — identical output to a full lexsort)
    if kk < len(scores):
        part = np.argpartition(-scores, kk - 1)
        s_k = scores[part[kk - 1]]
        sub = np.flatnonzero(scores >= s_k)
        candidates, scores = candidates[sub], scores[sub]
    order = np.lexsort((candidates, -scores))[:kk]
    return [(int(candidates[i]), float(scores[i])) for i in order]


def _block_ubs(tp: TermPostings) -> np.ndarray:
    """Per-block upper bounds as one vectorized Cache evaluation."""
    if not tp.n_blocks:
        return np.empty(0, dtype=np.float64)
    return np.asarray(
        tp.cache.evaluate(tp.block_fn, tp.block_tf), dtype=np.float64
    )


def _slice_blocks(tp: TermPostings, keep: np.ndarray) -> TermPostings:
    """A TermPostings restricted to the kept block indices (ascending,
    so doc-id order is preserved). Any pre-decoded arrays are dropped —
    they describe the full block set."""
    kl = keep.tolist()
    return TermPostings(
        cache=tp.cache,
        wand_fn=tp.wand_fn,
        wand_tf=tp.wand_tf,
        min_doc=tp.min_doc[keep],
        max_doc=tp.max_doc[keep],
        count=tp.count[keep],
        block_fn=tp.block_fn[keep],
        block_tf=tp.block_tf[keep],
        ids_meta=[tp.ids_meta[i] for i in kl],
        ids_bytes=[tp.ids_bytes[i] for i in kl],
        tfs_meta=[tp.tfs_meta[i] for i in kl],
        tfs_bytes=[tp.tfs_bytes[i] for i in kl],
        shard_base=tp.shard_base[keep],
    )


def _range_max(
    tp_u: TermPostings, ubs_u: np.ndarray, lo: np.ndarray, hi: np.ndarray
) -> np.ndarray:
    """max block_ub of term ``tp_u`` over its blocks overlapping each
    query range [lo[j], hi[j]] (0.0 where none overlap). Blocks ascend
    in doc id, so the overlapping set is the contiguous run [a, b);
    the tiny Python loop is bounded by the number of QUERY blocks, and
    each iteration is a NumPy slice-max."""
    a = np.searchsorted(tp_u.max_doc, lo, side="left")
    b = np.searchsorted(tp_u.min_doc, hi, side="right")
    out = np.zeros(len(lo), dtype=np.float64)
    for j in range(len(lo)):
        if a[j] < b[j]:
            out[j] = ubs_u[a[j]:b[j]].max()
    return out


def _acc_range_max(
    acc_ids: np.ndarray, acc_sc: np.ndarray, lo: np.ndarray, hi: np.ndarray
) -> np.ndarray:
    """max accumulated partial score among docs with id in [lo[j],
    hi[j]] (0.0 where none) — the joint bound over all already-decoded
    terms: max_d Σ_u c_u(d) is far tighter than Σ_u max_d c_u(d) when
    no single doc tops every term."""
    a = np.searchsorted(acc_ids, lo, side="left")
    b = np.searchsorted(acc_ids, hi, side="right")
    out = np.zeros(len(lo), dtype=np.float64)
    for j in range(len(lo)):
        if a[j] < b[j]:
            out[j] = acc_sc[a[j]:b[j]].max()
    return out


class _BlockDecodeCache:
    """Memoizes per-block decodes of ONE TermPostings across pruning
    passes (θ-seeding chunks; the M queries of a batch), so each packed
    block is decompressed at most once no matter how many queries or
    refinement rounds touch it. Blocks are non-overlapping and
    ascending in doc id (build invariant: ascending (shard,
    block_ord)), so concatenating cached blocks in index order
    reproduces ``decode_all``'s ascending-id output exactly."""

    __slots__ = ("tp", "_ids", "_tfs")

    def __init__(self, tp: TermPostings):
        self.tp = tp
        self._ids: dict[int, np.ndarray] = {}
        self._tfs: dict[int, np.ndarray] = {}
        if tp.decoded is not None:
            # a resident server pre-decoded the whole term — split the
            # arrays back per block so fetches are free
            counts = tp.count.astype(np.int64)
            offs = np.cumsum(counts)[:-1]
            for i, (a, t) in enumerate(
                zip(np.split(tp.decoded[0], offs), np.split(tp.decoded[1], offs))
            ):
                self._ids[i], self._tfs[i] = a, t

    def fetch(self, idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(global ids int64, tfs int64) of the given ascending block
        indices, concatenated in block order (= ascending doc id)."""
        il = [int(i) for i in idx]
        missing = [i for i in il if i not in self._ids]
        if missing:
            marr = np.asarray(missing, dtype=np.int64)
            ids, tfs = _slice_blocks(self.tp, marr).decode_all()
            counts = self.tp.count[marr].astype(np.int64)
            offs = np.cumsum(counts)[:-1]
            for i, a, t in zip(missing, np.split(ids, offs), np.split(tfs, offs)):
                self._ids[i], self._tfs[i] = a, t
        if not il:
            e = np.empty(0, dtype=np.int64)
            return e, e
        return (
            np.concatenate([self._ids[i] for i in il]),
            np.concatenate([self._tfs[i] for i in il]),
        )


def _prune_keeps(
    tps: list[TermPostings],
    ubs: list[np.ndarray],
    caches: list["_BlockDecodeCache"],
    fieldnorms,
    k: int,
    allowed_mask,
) -> list[np.ndarray]:
    """Kept-block indices per term for ONE query — the iterative
    θ-refinement core shared by :func:`prune_blocks` and
    :func:`prune_blocks_batch`.

    Terms are processed in descending token-upper-bound order; EVERY
    term runs the chunked θ-seeded decode loop (blocks in descending
    total-upper-bound order, θ refreshed as true contributions merge
    into per-doc partial sums), so a term can self-cut mid-decode and
    later terms start with the stacked θ of all earlier ones — which
    is what lets equal-upper-bound multi-term queries (where a
    T0-only θ can never beat the summed bound) still cut.

    The total upper bound of block B of term t at term-entry time:

        UB(B) = block_ub(B)                                  (own term)
              + max{acc partial sum of docs in B's id range}  (decoded
                terms, jointly — max of SUM, not sum of maxes)
              + Σ_{u not yet processed} max{block_ub of u's blocks
                overlapping B's id range}                     (future)

    Exactness: partial sums over decoded kept blocks are true-score
    LOWER bounds, so the k-th best masked partial θ is a lower bound
    on the final k-th score. UB(B) upper-bounds the true score of
    every doc d in B that still has all its blocks: acc(d) is then d's
    exact decoded-terms contribution (<= the range max), and the
    future terms are bounded by their FULL block sets' overlap maxima.
    A doc that already LOST a block was proven < θ when that block was
    cut (strict <, θ monotone), so under-counting it in acc cannot
    wrongly keep... or prune anything about it that matters. Hence a
    skipped block contains only docs strictly below the final k-th
    (can neither enter nor tie), and every true top-k doc keeps ALL
    its blocks (any block containing it has UB >= its true score >= θ,
    by induction over terms) and is scored exactly. ``taat_topk`` over
    the kept blocks is therefore bit-identical to the unpruned run
    (hypothesis-fuzzed, single and batch)."""
    from .config import BLOCK_SIZE

    T = len(tps)
    order = sorted(range(T), key=lambda i: -tps[i].token_upper_bound())
    theta = 0.0
    acc_ids = np.empty(0, dtype=np.int64)
    acc_sc = np.empty(0, dtype=np.float64)
    keeps: list[np.ndarray | None] = [None] * T
    # multi-term fp-rigor margin (single-term comparisons are exact:
    # block_ub IS the max kernel fp score of the block, and θ values
    # are kernel-identical single contributions). For T > 1 both sides
    # of a cut comparison carry order-dependent rounding: θ partials
    # accumulate in desc-token-ub order (can land a few ulps above the
    # kernel's query-order sum) and UB(B) is itself an fp sum of
    # non-negative bound components (can land a few ulps below the
    # math bound, hence below a kernel score it must dominate). For
    # non-negative addends any-order fp summation is within
    # (1+eps)^(n-1) of the math sum in both directions, so deflating θ
    # by (1 - 16*(T+2)*eps) — far below 1/(1+eps)^(2T+4) — makes
    # every strict cut rigorous at a ~1e-14 relative cost to pruning
    # power. Bit-identity of the final top-k is what the fuzz pins.
    theta_slack = 1.0 - 16.0 * (T + 2) * float(np.finfo(np.float64).eps)

    def masked(tp, ids, tfs):
        if allowed_mask is not None and len(ids):
            m = np.asarray(allowed_mask[ids], dtype=bool)
            ids, tfs = ids[m], tfs[m]
        if not len(ids):
            return ids, np.empty(0, dtype=np.float64)
        return ids, np.asarray(
            tp.cache.evaluate(fieldnorms[ids], tfs), dtype=np.float64
        )

    def merge(ids, sc):
        nonlocal acc_ids, acc_sc, theta
        if len(ids):
            u, inv = np.unique(
                np.concatenate([acc_ids, ids]), return_inverse=True
            )
            s = np.zeros(len(u), dtype=np.float64)
            np.add.at(s, inv, np.concatenate([acc_sc, sc]))
            acc_ids, acc_sc = u, s
        if len(acc_sc) >= k:
            kth = float(np.partition(acc_sc, len(acc_sc) - k)[len(acc_sc) - k])
            theta = kth * theta_slack  # see theta_slack rationale above

    for j, ti in enumerate(order):
        tp, cache = tps[ti], caches[ti]
        nb = tp.n_blocks
        tot = ubs[ti]
        if T > 1 and j > 0:
            tot = tot.copy()
            for u in order[j + 1 :]:
                tot += _range_max(tps[u], ubs[u], tp.min_doc, tp.max_doc)
            tot += _acc_range_max(acc_ids, acc_sc, tp.min_doc, tp.max_doc)
        if T == 1:
            # single term: chunked θ-seeding decode in descending
            # block-ub order; a stale θ is still a valid lower bound,
            # it only delays the cut by at most one chunk. First chunk
            # just big enough to seed θ (≈k postings); later chunks
            # stay small so the cut can land early even on few-block
            # terms. One contribution per doc, so θ needs no per-doc
            # grouping — a bounded top-k buffer of raw masked scores
            # (never re-partitioning the full history).
            o = np.argsort(-tot, kind="stable")
            pos, cut = 0, nb
            topk_buf = np.empty(0, dtype=np.float64)
            n_surv = 0
            while pos < nb:
                step = max(1, -(-k // BLOCK_SIZE)) if pos == 0 else 8
                chunk = o[pos : pos + step]
                if n_surv >= k and tot[chunk[0]] < theta:
                    cut = pos  # max ub of every remaining block < θ
                    break
                ids, tfs = cache.fetch(np.sort(chunk))
                _, sc = masked(tp, ids, tfs)
                n_surv += len(sc)
                topk_buf = np.concatenate([topk_buf, sc])
                if len(topk_buf) > k:
                    topk_buf = np.partition(topk_buf, len(topk_buf) - k)[
                        len(topk_buf) - k :
                    ]
                if n_surv >= k:
                    theta = float(topk_buf.min())
                pos += step
            keeps[ti] = np.sort(o[:cut])
        elif j == 0:
            # strongest term decoded whole in ONE batched unpack (its
            # own chunked self-cut is near-impossible: during its loop
            # θ <= its token ub while tot also carries every other
            # term's overlap maxima); its masked contributions seed the
            # accumulator — fetch order is ascending block = ascending
            # doc id, so acc is sorted without an argsort
            ids, tfs = cache.fetch(np.arange(nb))
            acc_ids, acc_sc = masked(tp, ids, tfs)
            if len(acc_sc) >= k:
                theta = (
                    float(
                        np.partition(acc_sc, len(acc_sc) - k)[len(acc_sc) - k]
                    )
                    * theta_slack  # the CUT comparisons sum fp bounds
                )
            keeps[ti] = np.arange(nb)
        else:
            # one-shot cut against the stacked θ, then ONE decode +
            # ONE merge so the next term sees the refined θ (the last
            # term's merge cannot prune anything further — its kept
            # blocks are decoded lazily by the kernel via the cache)
            keep = (
                np.flatnonzero(tot >= theta) if theta > 0.0 else np.arange(nb)
            )
            keeps[ti] = keep
            if j < T - 1 and len(keep):
                ids, tfs = cache.fetch(keep)
                merge(*masked(tp, ids, tfs))
    return keeps  # type: ignore[return-value]


def _bytes_of(tp: TermPostings, idx=None) -> int:
    rng = range(tp.n_blocks) if idx is None else idx
    return sum(len(tp.ids_bytes[i]) + len(tp.tfs_bytes[i]) for i in rng)


def _apply_keep(
    tp: TermPostings, keep: np.ndarray, cache: "_BlockDecodeCache"
) -> TermPostings:
    """TermPostings restricted to ``keep`` with the kernel-ready
    decoded arrays attached (assembled from the cache — nothing is
    decompressed twice)."""
    out = tp if len(keep) == tp.n_blocks else _slice_blocks(tp, keep)
    if len(keep):
        out.decoded = cache.fetch(keep)
    return out


def prune_blocks(
    terms: list[TermPostings],
    fieldnorms,
    k: int,
    allowed_mask=None,
) -> tuple[list[TermPostings], dict]:
    """Exact block-level decode pruning: drop whole posting blocks that
    provably cannot place a document in the top-k, BEFORE
    decompressing them (see :func:`_prune_keeps` for the scheme and
    the exactness argument). ``taat_topk`` over the pruned terms is
    bit-identical to the unpruned run (tests + hypothesis fuzz pin
    this); what's saved is decode work and — at scale, where blocks
    are read lazily — I/O bytes.

    Returns (pruned_terms, stats) with stats = {blocks_total,
    blocks_kept, bytes_total, bytes_kept}."""
    terms = [t for t in terms if t.n_blocks]
    stats = {
        "blocks_total": sum(t.n_blocks for t in terms),
        "bytes_total": sum(_bytes_of(t) for t in terms),
        "blocks_kept": 0,
        "bytes_kept": 0,
    }
    if not terms or k <= 0:
        stats["blocks_kept"] = stats["blocks_total"]
        stats["bytes_kept"] = stats["bytes_total"]
        return terms, stats
    ubs = [_block_ubs(t) for t in terms]
    caches = [_BlockDecodeCache(t) for t in terms]
    keeps = _prune_keeps(terms, ubs, caches, fieldnorms, k, allowed_mask)
    out = []
    for tp, keep, cache in zip(terms, keeps, caches):
        stats["blocks_kept"] += len(keep)
        stats["bytes_kept"] += _bytes_of(tp, keep.tolist())
        pruned = _apply_keep(tp, keep, cache)
        if pruned.n_blocks:
            out.append(pruned)
    return out, stats


def prune_blocks_batch(
    term_map: dict,
    qterms: dict,
    fieldnorms,
    k: int,
    allowed_mask=None,
) -> tuple[dict, dict]:
    """Batched exact decode pruning: for M queries sharing one shard's
    posting blocks, compute each query's kept-block set with
    :func:`_prune_keeps` (per-block decodes memoized ACROSS queries by
    a shared cache) and decode only the UNION of kept blocks per term
    — a block is decompressed iff at least one query might need it.
    Running ``taat_topk`` per query over the union-kept terms is still
    bit-identical per query: a superset of a query's own kept blocks
    only adds docs that provably score strictly below that query's
    k-th, which can neither enter nor tie into its top-k.

    ``term_map``: {term_key: TermPostings}; ``qterms``:
    {query_id: [term_key, ...]}. Returns ({term_key: pruned
    TermPostings with .decoded attached}, stats) — terms whose blocks
    no query keeps are dropped from the map."""
    alive = {key: tp for key, tp in term_map.items() if tp.n_blocks}
    stats = {
        "blocks_total": sum(t.n_blocks for t in alive.values()),
        "bytes_total": sum(_bytes_of(t) for t in alive.values()),
        "blocks_kept": 0,
        "bytes_kept": 0,
    }
    if not alive or k <= 0:
        stats["blocks_kept"] = stats["blocks_total"]
        stats["bytes_kept"] = stats["bytes_total"]
        for tp in alive.values():
            if tp.decoded is None:
                tp.decoded = tp.decode_all()
        return alive, stats
    ubs = {key: _block_ubs(tp) for key, tp in alive.items()}
    caches = {key: _BlockDecodeCache(tp) for key, tp in alive.items()}
    union = {
        key: np.zeros(tp.n_blocks, dtype=bool) for key, tp in alive.items()
    }
    for qkeys in qterms.values():
        present = [key for key in qkeys if key in alive]
        if not present:
            continue
        keeps = _prune_keeps(
            [alive[key] for key in present],
            [ubs[key] for key in present],
            [caches[key] for key in present],
            fieldnorms,
            k,
            allowed_mask,
        )
        for key, keep in zip(present, keeps):
            union[key][keep] = True
    out = {}
    for key, tp in alive.items():
        keep = np.flatnonzero(union[key])
        stats["blocks_kept"] += len(keep)
        stats["bytes_kept"] += _bytes_of(tp, keep.tolist())
        pruned = _apply_keep(tp, keep, caches[key])
        if pruned.n_blocks:
            out[key] = pruned
    return out, stats
