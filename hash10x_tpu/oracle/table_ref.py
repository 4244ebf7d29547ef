"""Scalar golden model of the k-mer count table and code (barcode) tables.

Models the reference's count pass and filtered table build
(``hash10x.c:~fillHashTable`` + code tables, SURVEY.md §3.1 #5/#6) with plain Python
dicts.  The device table (``table/oa_table.py``) must reproduce these counts exactly;
canonical k-mer ids are sorted-hash ranks (the framework's deterministic analog of
the reference's insertion-order indices — SURVEY.md §3.3 compatibility ruling).
"""

from __future__ import annotations

from collections import Counter, defaultdict
from typing import Dict, Iterable, List, Sequence, Tuple

from ..hashspec import HashSpec
from . import seqhash_ref

__all__ = ["count_sketches", "count_reads", "filter_band", "build_code_tables"]


def count_reads(spec: HashSpec, reads: Iterable[Sequence[int]], mode: str = "minimizer",
                m: int = 0) -> Counter:
    """hash -> total occurrence count over all reads (the count pass)."""
    c: Counter = Counter()
    for codes in reads:
        if mode == "kmer":
            em = seqhash_ref.kmer_hashes(spec, codes)
        elif mode == "minimizer":
            em = seqhash_ref.minimizers(spec, codes)
        elif mode == "modimizer":
            em = seqhash_ref.modimizers(spec, codes, m)
        else:
            raise ValueError(mode)
        for _, h, _ in em:
            c[h] += 1
    return c


def count_sketches(sketches: Iterable[Iterable[int]]) -> Counter:
    c: Counter = Counter()
    for s in sketches:
        c.update(s)
    return c


def filter_band(counts: Counter, min_count: int = 0, max_count: int = 0
                ) -> Tuple[List[int], Dict[int, int]]:
    """Count-band filter + canonical ids.

    Returns (sorted retained hashes, hash -> canonical id), id = sorted rank.
    """
    kept = sorted(h for h, c in counts.items()
                  if (not min_count or c >= min_count) and (not max_count or c <= max_count))
    return kept, {h: i for i, h in enumerate(kept)}


def build_code_tables(per_barcode_sketches: Sequence[Iterable[int]],
                      hash_ids: Dict[int, int]):
    """Forward (codeHashes) and inverted (hashCodes) incidence, deduplicated.

    ``per_barcode_sketches[c]`` = iterable of hashes emitted for barcode c (with
    multiplicity; dedup happens here — incidence is 0/1 per (kmer, barcode), the
    "dense k-mer x barcode count table" of BASELINE.json).

    Returns (code_hashes: list[sorted list of kmer ids per barcode],
             hash_codes: dict kmer id -> sorted list of barcode ids).
    """
    code_hashes: List[List[int]] = []
    hash_codes: Dict[int, List[int]] = defaultdict(list)
    for c, sk in enumerate(per_barcode_sketches):
        ids = sorted({hash_ids[h] for h in sk if h in hash_ids})
        code_hashes.append(ids)
        for i in ids:
            hash_codes[i].append(c)
    return code_hashes, dict(hash_codes)
