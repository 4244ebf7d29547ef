"""k-mer x barcode incidence (the code tables) in CSR form.

The TPU-native equivalent of the reference's paired ragged Arrays
(``codeHashes[c]`` forward / ``hashCodes[h]`` inverted — ``hash10x.c``, SURVEY.md
§3.1 #6): one deduplicated (k-mer, barcode) pair set held twice in CSR layout, once
sorted by barcode and once by k-mer.  Pairs are 0/1 incidence — this IS the "dense
k-mer x barcode count table" of BASELINE.json.

k-mer ids are canonical sorted-hash ranks over the retained (count-band filtered)
hash set, so the structure is deterministic under any read/batch/shard order
(SURVEY.md §3.3 compatibility ruling, §8.3 "deterministic parallel clustering").

Build path is device-resident end to end: pair keys (code * n_kmers + kmer, u64)
deduplicate through the LSM sorted-run machinery (``sorted_table.py`` — sort +
boundary-dedup, the same discipline as the count pass), and both CSR offset
arrays come from vectorized ``searchsorted`` over the sorted key set; only the
final arrays land on host.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..hashspec import U64MAX

__all__ = ["Incidence", "build_incidence", "incidence_from_sorted_pairs",
           "pair_keys_jit", "retained_lookup"]

# numpy scalar, NOT jnp: a module-level jnp array is a DEVICE constant
# that jit captures and must fetch at lowering time (hangs through the
# relay, and forces backend init at import); np scalars lower as literals
_U64MAX = np.uint64(U64MAX)


@dataclass
class Incidence:
    n_kmers: int
    n_codes: int
    # forward CSR (codeHashes): pairs sorted by (code, kmer)
    code_offsets: np.ndarray   # (n_codes + 1,) int64
    code_kmers: np.ndarray     # (P,) int32
    # inverted CSR (hashCodes): pairs sorted by (kmer, code)
    kmer_offsets: np.ndarray   # (n_kmers + 1,) int64
    kmer_codes: np.ndarray     # (P,) int32

    @property
    def n_pairs(self) -> int:
        return int(self.code_kmers.shape[0])

    def kmers_of(self, code: int) -> np.ndarray:
        return self.code_kmers[self.code_offsets[code]:self.code_offsets[code + 1]]

    def codes_of(self, kmer: int) -> np.ndarray:
        return self.kmer_codes[self.kmer_offsets[kmer]:self.kmer_offsets[kmer + 1]]


def retained_lookup(retained_hashes: np.ndarray, hashes: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Map hash values to canonical k-mer ids (rank in the sorted retained set).

    Returns (ids (…,) int32 with -1 for absent, found mask)."""
    if len(retained_hashes) == 0:
        z = np.full(hashes.shape, -1, np.int32)
        return z, np.zeros(hashes.shape, bool)
    idx = np.searchsorted(retained_hashes, hashes)
    idx_c = np.minimum(idx, len(retained_hashes) - 1)
    found = (hashes != U64MAX) & (idx < len(retained_hashes)) & \
            (retained_hashes[idx_c] == hashes)
    return np.where(found, idx_c, -1).astype(np.int32), found


@jax.jit
def pair_keys_jit(retained_hashes, flat_h, flat_bc, n_kmers_u):
    """Device pair-key emission: (hash, barcode) -> code * n_kmers + kmer_id,
    U64MAX for absent hashes / invalid barcodes (the sorted-table pad, so keys
    feed straight into the LSM dedup)."""
    idx = jnp.searchsorted(retained_hashes, flat_h)
    idx_c = jnp.minimum(idx, retained_hashes.shape[0] - 1)
    found = (flat_h != _U64MAX) & (retained_hashes[idx_c] == flat_h)
    ok = found & (flat_bc >= 0)
    key = (flat_bc.astype(jnp.uint64) * n_kmers_u + idx_c.astype(jnp.uint64))
    return jnp.where(ok, key, _U64MAX)


@functools.partial(jax.jit, static_argnames=("n_kmers", "n_codes"))
def _csr_from_pairs(pairs, n_kmers: int, n_codes: int):
    """Sorted unique pair keys (code-major) -> both CSR halves, on device."""
    nk = jnp.uint64(n_kmers)
    pc = (pairs // nk).astype(jnp.int32)
    pk = (pairs % nk).astype(jnp.int32)
    code_bounds = jnp.arange(n_codes + 1, dtype=jnp.uint64) * nk
    code_offsets = jnp.searchsorted(pairs, code_bounds).astype(jnp.int64)
    # kmer-major order: one more device sort
    keys2 = jnp.sort(pk.astype(jnp.uint64) * jnp.uint64(n_codes)
                     + pc.astype(jnp.uint64))
    kmer_bounds = jnp.arange(n_kmers + 1, dtype=jnp.uint64) * jnp.uint64(n_codes)
    kmer_offsets = jnp.searchsorted(keys2, kmer_bounds).astype(jnp.int64)
    kmer_codes = (keys2 % jnp.uint64(n_codes)).astype(jnp.int32)
    return pc, pk, code_offsets, kmer_offsets, kmer_codes


def incidence_from_sorted_pairs(pairs, n_kmers: int, n_codes: int) -> Incidence:
    """Sorted unique (code-major) u64 pair keys -> double-CSR Incidence."""
    if n_codes == 0 or len(pairs) == 0:
        return Incidence(n_kmers, n_codes,
                         np.zeros(n_codes + 1, np.int64),
                         np.zeros(0, np.int32),
                         np.zeros(n_kmers + 1, np.int64),
                         np.zeros(0, np.int32))
    pc, pk, code_offsets, kmer_offsets, kmer_codes = _csr_from_pairs(
        jnp.asarray(pairs, jnp.uint64), n_kmers=n_kmers, n_codes=n_codes)
    return Incidence(
        n_kmers=n_kmers, n_codes=n_codes,
        code_offsets=np.asarray(code_offsets), code_kmers=np.asarray(pk),
        kmer_offsets=np.asarray(kmer_offsets), kmer_codes=np.asarray(kmer_codes),
    )


def build_incidence(kmer_ids: np.ndarray, codes: np.ndarray, n_kmers: int,
                    n_codes: int) -> Incidence:
    """Deduplicate flat (kmer id, barcode id) emissions into double-CSR incidence.

    ``kmer_ids (P,) int32`` (-1 = drop), ``codes (P,) int32`` (-1 = drop).
    One-shot entry point (tests, small lanes); the engine streams batches
    through the LSM pair table instead (``engine.incidence``) — both end in
    :func:`incidence_from_sorted_pairs`.
    """
    keep = (kmer_ids >= 0) & (codes >= 0)
    k = kmer_ids[keep].astype(np.uint64)
    c = codes[keep].astype(np.uint64)
    if n_codes == 0 or len(k) == 0:
        return incidence_from_sorted_pairs(np.zeros(0, np.uint64),
                                           n_kmers, n_codes)
    pair = c * np.uint64(n_kmers) + k                 # (code, kmer) major order
    # device sort + boundary dedup (np.unique dominated the phase at scale)
    dk = jnp.sort(jnp.asarray(pair))
    first = jnp.concatenate([jnp.ones((1,), bool), dk[1:] != dk[:-1]])
    uniq = np.asarray(dk)[np.asarray(first)]
    return incidence_from_sorted_pairs(uniq, n_kmers, n_codes)
