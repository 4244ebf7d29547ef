"""k-mer x barcode incidence (the code tables) in CSR form.

The TPU-native equivalent of the reference's paired ragged Arrays
(``codeHashes[c]`` forward / ``hashCodes[h]`` inverted — ``hash10x.c``, SURVEY.md
§3.1 #6): one deduplicated (k-mer, barcode) pair set held twice in CSR layout, once
sorted by barcode and once by k-mer.  Pairs are 0/1 incidence — this IS the "dense
k-mer x barcode count table" of BASELINE.json.

k-mer ids are canonical sorted-hash ranks over the retained (count-band filtered)
hash set, so the structure is deterministic under any read/batch/shard order
(SURVEY.md §3.3 compatibility ruling, §8.3 "deterministic parallel clustering").

The pair-dedup/sort runs in numpy on host: it is a one-shot O(P log P) pass over
emitted pairs between the two device phases (count pass, cluster pass), off the hot
loop; a device-resident builder rides the sharded pipeline in ``dist/``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np

from ..hashspec import U64MAX

__all__ = ["Incidence", "build_incidence", "retained_lookup"]


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


def build_incidence(kmer_ids: np.ndarray, codes: np.ndarray, n_kmers: int,
                    n_codes: int) -> Incidence:
    """Deduplicate flat (kmer id, barcode id) emissions into double-CSR incidence.

    ``kmer_ids (P,) int32`` (-1 = drop), ``codes (P,) int32`` (-1 = drop).
    """
    keep = (kmer_ids >= 0) & (codes >= 0)
    k = kmer_ids[keep].astype(np.int64)
    c = codes[keep].astype(np.int64)
    pair = c * n_kmers + k                    # (code, kmer) major order
    if len(pair) > (1 << 20):
        # device sort + boundary dedup: np.unique over tens of millions of
        # pairs dominated the incidence phase at 50k-barcode scale
        import jax.numpy as jnp
        dk = jnp.sort(jnp.asarray(pair.astype(np.uint64)))
        first = jnp.concatenate([jnp.ones((1,), bool), dk[1:] != dk[:-1]])
        pair = np.asarray(dk)[np.asarray(first)].astype(np.int64)
    else:
        pair = np.unique(pair)
    pc = (pair // n_kmers).astype(np.int32)
    pk = (pair % n_kmers).astype(np.int32)

    code_offsets = np.zeros(n_codes + 1, np.int64)
    np.add.at(code_offsets, pc + 1, 1)
    code_offsets = np.cumsum(code_offsets)

    order = np.argsort(pk * np.int64(n_codes) + pc, kind="stable")
    kmer_offsets = np.zeros(n_kmers + 1, np.int64)
    np.add.at(kmer_offsets, pk + 1, 1)
    kmer_offsets = np.cumsum(kmer_offsets)

    return Incidence(
        n_kmers=n_kmers, n_codes=n_codes,
        code_offsets=code_offsets, code_kmers=pk,
        kmer_offsets=kmer_offsets, kmer_codes=pc[order],
    )
