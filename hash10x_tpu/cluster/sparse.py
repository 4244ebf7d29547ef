"""Sparse global friend clustering — the at-scale ``--codeClusters`` path.

The reference walks barcodes serially, tallying per-other-barcode share counts
into an accumulator (``hash10x.c:~codeClusterFind``, SURVEY.md §3.1 #8, §4.2).
The round-1 device path batched that tally as dense ``(B, n_codes)`` share rows —
O(n_codes) memory per barcode row, which collapses at 1M+ barcodes (BASELINE
configs #4/#5).  This module replaces it with a fully sparse, sort-centric
pipeline whose device memory is proportional to the *pair set*, never to
n_codes²:

1. **Pair enumeration** — for every retained k-mer h with barcode list
   codes(h), every ordered pair (c1, c2), c1 != c2, contributes one u64 key
   ``c1 * n_codes + c2``.  Σ_h len(h)² keys total, generated on device in
   fixed-size chunks (static shapes; a global cumsum-of-squares searchsorted
   maps flat indices back to (kmer, i, j) — only the chunk offset t0 varies,
   traced, so the whole sweep is ONE compile).
2. **Sparse co-occurrence counts** — keys accumulate in the LSM sorted-run
   table (``table/sorted_table.py``): sort + segment-sum + compact.  This IS
   the barcode x barcode co-occurrence matrix A·Aᵀ of BASELINE.json, held
   sparse and sorted.  TPUs sort at GB/s; embrace sorting (round-1 measured
   15x over scatter probing).
3. **Friend edges** — keys with count >= min_friend_share are *friend* pairs F
   (sorted u64).  A second enumeration pass emits bipartite edges
   (p = CSR position of (c1, h), f = rank of (c1, c2) in F) for pairs present
   in F (binary search).
4. **Global min-label propagation** — one flat fixpoint over ALL barcodes at
   once (components never cross barcodes, so one global pass is exact):
   labels init to each k-mer's local index; iterate
   f_lab = segment_min(p_lab over edges by f); p_lab = min(p_lab,
   segment_min(f_lab over edges by p)) until unchanged.  Deterministic,
   order-free; equals the oracle's union-find (``cluster_barcode_friend`` with
   no cap) — first-appearing-k-mer canonical numbering falls out as the dense
   rank of labels per barcode.

Memory: O(chunk) for enumeration, O(|cooccur entries|) for the count table,
O(|edges|) for propagation.  No (B, n_codes) anything.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..hashspec import U64MAX
from ..table import sorted_table as st
from ..table.incidence import Incidence

__all__ = ["cooccurrence_counts", "friend_pairs", "friend_edges",
           "propagate_labels", "canonical_ranks", "cluster_codes_sparse"]

_U64MAX = jnp.uint64(U64MAX)

# pair-enumeration chunk: flat keys generated per device step (static shape)
_CHUNK = 1 << 22


@functools.partial(jax.jit, static_argnames=("n_codes", "chunk"))
def _pair_fields(kmer_codes, kmer_offsets, lens, cum2, t0, n_codes: int,
                 chunk: int):
    """Decode flat ordered-pair indices [t0, t0+chunk) into (key, h, ok).

    cum2 (n_kmers+1,) i64 = cumsum of len² (global, device-resident); for flat
    index t the owning k-mer h satisfies cum2[h] <= t < cum2[h+1]; then
    r = t - cum2[h], i = r // len, j = r % len and the pair is
    (codes(h)[i], codes(h)[j]).  key = c1 * n_codes + c2 (U64MAX when i == j
    or t out of range).
    """
    t = t0 + jnp.arange(chunk, dtype=jnp.int64)
    h = jnp.searchsorted(cum2, t, side="right").astype(jnp.int64)
    h = jnp.clip(h - 1, 0, lens.shape[0] - 1)
    in_range = t < cum2[-1]
    l = lens[h].astype(jnp.int64)
    r = t - cum2[h]
    l_safe = jnp.maximum(l, 1)
    i = r // l_safe
    j = r % l_safe
    off = kmer_offsets[h]
    cap = kmer_codes.shape[0] - 1
    c1 = kmer_codes[jnp.minimum(off + i, cap)].astype(jnp.uint64)
    c2 = kmer_codes[jnp.minimum(off + j, cap)].astype(jnp.uint64)
    ok = in_range & (i != j)
    key = jnp.where(ok, c1 * jnp.uint64(n_codes) + c2, _U64MAX)
    return key, h, c1, ok


class _PairEnum:
    """Device-resident decoder state for the ordered-pair sweep."""

    def __init__(self, inc: Incidence):
        lens = np.diff(inc.kmer_offsets).astype(np.int64)
        self.total = int((lens ** 2).sum())
        self.n_codes = inc.n_codes
        self.kmer_codes = jnp.asarray(inc.kmer_codes, jnp.int32)
        self.kmer_offsets = jnp.asarray(inc.kmer_offsets[:-1], jnp.int64)
        self.lens = jnp.asarray(lens)
        self.cum2 = jnp.asarray(
            np.concatenate([[0], np.cumsum(lens ** 2)]).astype(np.int64))

    def keys(self, t0: int, chunk: int):
        return _pair_fields(self.kmer_codes, self.kmer_offsets, self.lens,
                            self.cum2, jnp.int64(t0), n_codes=self.n_codes,
                            chunk=chunk)


def cooccurrence_counts(inc: Incidence, chunk: int = _CHUNK,
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Sparse barcode x barcode co-occurrence: sorted (pair key, share) arrays.

    share(c1, c2) = |{h : (c1,h), (c2,h) in incidence}| — exactly the oracle's
    ``barcode_shares`` for every c1 at once (symmetric; both orders present).
    The count table grows on high water exactly like the engine's k-mer table
    (never-silent spill contract).
    """
    enum = _PairEnum(inc)
    chunk = min(chunk, 1 << max((enum.total - 1).bit_length(), 10)) \
        if enum.total else 1 << 10
    cap = 1 << 16
    t = st.make_sorted_table(cap, 2 * chunk)
    for t0 in range(0, enum.total, chunk):
        keys, _, _, _ = enum.keys(t0, chunk)
        if t.buf_n + chunk > t.buf.shape[0]:
            t = st.flush(t)
            if int(np.asarray(t.spilled)):
                raise RuntimeError("cooccurrence table spilled (growth "
                                   "scheduled too late); raise chunk")
            while int(np.asarray(t.n_filled)) > 0.7 * t.capacity:
                t = st.grow(t, t.capacity * 2, buf_capacity=t.buf.shape[0])
        t = st.append(t, keys)
    t = st.flush(t)
    if int(np.asarray(t.spilled)):
        t = st.grow(t, t.capacity * 4, buf_capacity=t.buf.shape[0])
        if int(np.asarray(t.spilled)):
            raise RuntimeError("cooccurrence table spilled")
    return st.compact(t)


def friend_pairs(pair_keys: np.ndarray, shares: np.ndarray,
                 min_friend_share: int) -> np.ndarray:
    """Sorted u64 keys (c1 * n_codes + c2) whose share >= threshold."""
    return pair_keys[shares >= min_friend_share]


@functools.partial(jax.jit, static_argnames=("n_codes", "chunk"))
def _edges_chunk(kmer_codes, kmer_offsets, lens, cum2, t0, fkeys, fwd_keys,
                 n_kmers_u, n_codes: int, chunk: int):
    """One chunk of bipartite edges: (p = forward-CSR position of (c1, h),
    f = rank of (c1, c2) among friend keys, is_friend)."""
    key, h, c1, ok = _pair_fields(kmer_codes, kmer_offsets, lens, cum2, t0,
                                  n_codes=n_codes, chunk=chunk)
    fi = jnp.searchsorted(fkeys, key)
    fi_c = jnp.minimum(fi, fkeys.shape[0] - 1)
    is_friend = ok & (fkeys[fi_c] == key)
    # p = rank of (c1, h) among forward pairs (sorted by c1 * n_kmers + h)
    pkey = c1 * n_kmers_u + h.astype(jnp.uint64)
    pi = jnp.searchsorted(fwd_keys, pkey).astype(jnp.int32)
    return pi, fi_c.astype(jnp.int32), is_friend


def _forward_keys(inc: Incidence) -> np.ndarray:
    code_of_p = np.repeat(
        np.arange(inc.n_codes, dtype=np.int64), np.diff(inc.code_offsets))
    return (code_of_p.astype(np.uint64) * np.uint64(inc.n_kmers)
            + inc.code_kmers.astype(np.uint64))


def friend_edges(inc: Incidence, fkeys: np.ndarray, chunk: int = _CHUNK
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """All (p, f) bipartite edges: forward-CSR position p's k-mer is contained
    in friend pair f = (code_of(p), c2)."""
    if len(fkeys) == 0:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    enum = _PairEnum(inc)
    chunk = min(chunk, 1 << max((enum.total - 1).bit_length(), 10)) \
        if enum.total else 1 << 10
    fkeys_d = jnp.asarray(fkeys)
    fwd_d = jnp.asarray(_forward_keys(inc))
    ps, fs = [], []
    for t0 in range(0, enum.total, chunk):
        p, f, ok = _edges_chunk(
            enum.kmer_codes, enum.kmer_offsets, enum.lens, enum.cum2,
            jnp.int64(t0), fkeys_d, fwd_d, jnp.uint64(inc.n_kmers),
            n_codes=inc.n_codes, chunk=chunk)
        okh = np.asarray(ok)
        if okh.any():
            ps.append(np.asarray(p)[okh])
            fs.append(np.asarray(f)[okh])
    if not ps:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    return np.concatenate(ps), np.concatenate(fs)


@functools.partial(jax.jit, static_argnames=("n_p", "n_f"))
def _propagate(p_by_f, f_ids_sorted, p_ids_sorted, f_by_p, init,
               n_p: int, n_f: int):
    """Fixpoint of the bipartite min-label relaxation (edges pre-sorted both
    ways: (p_by_f, f_ids_sorted) = edge list sorted by f; (p_ids_sorted,
    f_by_p) = sorted by p)."""
    big = jnp.int32(2 ** 31 - 1)

    def cond(state):
        return state[1]

    def body(state):
        lab, _ = state
        f_lab = jax.ops.segment_min(lab[p_by_f], f_ids_sorted,
                                    num_segments=n_f,
                                    indices_are_sorted=True)
        back = jax.ops.segment_min(f_lab[f_by_p], p_ids_sorted,
                                   num_segments=n_p,
                                   indices_are_sorted=True)
        new = jnp.minimum(lab, jnp.minimum(back, big))
        return (new, jnp.any(new != lab))

    lab, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True)))
    return lab


def _local_indices(inc: Incidence) -> np.ndarray:
    code_of_p = np.repeat(
        np.arange(inc.n_codes, dtype=np.int64), np.diff(inc.code_offsets))
    return (np.arange(inc.n_pairs, dtype=np.int64)
            - inc.code_offsets[code_of_p]).astype(np.int32)


def propagate_labels(inc: Incidence, p_edges: np.ndarray, f_edges: np.ndarray,
                     n_f: int) -> np.ndarray:
    """Component labels for every forward-CSR position (local min k-mer index
    within its barcode), via global flat min-label propagation."""
    local = _local_indices(inc)
    if len(p_edges) == 0 or inc.n_pairs == 0:
        return local
    by_f = np.argsort(f_edges, kind="stable")
    by_p = np.argsort(p_edges, kind="stable")
    lab = _propagate(
        jnp.asarray(p_edges[by_f]), jnp.asarray(f_edges[by_f]),
        jnp.asarray(p_edges[by_p]), jnp.asarray(f_edges[by_p]),
        jnp.asarray(local), n_p=inc.n_pairs, n_f=n_f)
    return np.asarray(lab)


def canonical_ranks(inc: Incidence, labels: np.ndarray) -> np.ndarray:
    """Dense-rank labels per barcode into canonical cluster ids (first-
    appearing k-mer numbering: a component's label IS its min local index, so
    ascending label order == first-appearance order).  Fully vectorized."""
    if inc.n_pairs == 0:
        return np.zeros(0, np.int32)
    code_of_p = np.repeat(
        np.arange(inc.n_codes, dtype=np.int64), np.diff(inc.code_offsets))
    K = int(np.diff(inc.code_offsets).max(initial=0)) + 1
    combined = code_of_p * np.int64(K) + labels.astype(np.int64)
    uniq = np.unique(combined)
    rank = np.searchsorted(uniq, combined)
    code_start = np.searchsorted(uniq, code_of_p * np.int64(K))
    return (rank - code_start).astype(np.int32)


def cluster_codes_sparse(inc: Incidence, min_friend_share: int = 8,
                         chunk: int = _CHUNK, flat: bool = False):
    """The scalable ``--codeClusters`` pass: sparse co-occurrence + global
    propagation.  Bit-equal to ``oracle.cluster_ref.cluster_barcode_friend``
    with no cap (tests enforce).  Returns per-code label arrays (or the flat
    position-aligned array when ``flat``)."""
    keys, shares = cooccurrence_counts(inc, chunk=chunk)
    fkeys = friend_pairs(keys, shares, min_friend_share)
    p_e, f_e = friend_edges(inc, fkeys, chunk=chunk)
    labels = propagate_labels(inc, p_e, f_e, n_f=max(len(fkeys), 1))
    canon = canonical_ranks(inc, labels)
    if flat:
        return canon
    return [canon[inc.code_offsets[c]:inc.code_offsets[c + 1]]
            for c in range(inc.n_codes)]
