"""Scalar golden model of per-barcode molecule clustering.

Models the reference's core algorithm (``hash10x.c:~codeClusterFind`` +
``codeClusterReport``, SURVEY.md §3.1 #8, call stack §4.2): for each barcode c, two
of its k-mers belong to the same molecule iff enough *other* barcodes contain both;
connected components of that link graph are the molecules.

Canonicalization contract (SURVEY.md §3.3/§8.3): within a barcode, k-mers are
processed in ascending canonical k-mer id order and clusters are numbered 0,1,2,...
in order of each cluster's first-appearing k-mer.  The device path
(``cluster/cooccur.py``) must reproduce these labels exactly.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

__all__ = ["cluster_barcode", "cluster_all", "split_codes"]


def _support(codes_a: Sequence[int], codes_b: Sequence[int]) -> int:
    """|codes(a) ∩ codes(b)| over sorted lists."""
    i = j = n = 0
    while i < len(codes_a) and j < len(codes_b):
        if codes_a[i] == codes_b[j]:
            n += 1
            i += 1
            j += 1
        elif codes_a[i] < codes_b[j]:
            i += 1
        else:
            j += 1
    return n


def cluster_barcode(kmer_ids: Sequence[int], hash_codes: Dict[int, Sequence[int]],
                    min_share: int = 2) -> List[int]:
    """Cluster one barcode's k-mers into molecules.

    ``kmer_ids``: the barcode's k-mer ids, ascending.  ``hash_codes``: inverted
    incidence (kmer id -> sorted barcode ids).  Two k-mers link iff the number of
    *other* shared barcodes (intersection minus this barcode itself) >= min_share.
    Returns a cluster id per k-mer, canonically numbered.
    """
    k = len(kmer_ids)
    parent = list(range(k))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(k):
        ci = hash_codes[kmer_ids[i]]
        for j in range(i + 1, k):
            # both lists contain this barcode, so "other shared" = support - 1
            if _support(ci, hash_codes[kmer_ids[j]]) - 1 >= min_share:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)

    labels = [find(i) for i in range(k)]
    remap: Dict[int, int] = {}
    out = []
    for l in labels:
        if l not in remap:
            remap[l] = len(remap)
        out.append(remap[l])
    return out


def barcode_shares(kmer_ids: Sequence[int], hash_codes: Dict[int, Sequence[int]],
                   self_code: int) -> Dict[int, int]:
    """The reference's per-barcode accumulator tally (SURVEY.md §3.1 #8): for each
    other barcode c', share[c'] = number of this barcode's k-mers c' also contains.
    This is one row of the barcode x barcode co-occurrence matrix A·Aᵀ
    (BASELINE.json's "barcode–barcode co-occurrence matrices")."""
    share: Dict[int, int] = {}
    for h in kmer_ids:
        for c in hash_codes[h]:
            if c != self_code:
                share[c] = share.get(c, 0) + 1
    return share


def cluster_barcode_friend(kmer_ids: Sequence[int],
                           hash_codes: Dict[int, Sequence[int]], self_code: int,
                           min_friend_share: int = 8,
                           max_friends: int = 256) -> List[int]:
    """Scalable per-barcode clustering via friend barcodes.

    "Friends" are other barcodes whose share with this barcode >= min_friend_share
    (capped at the max_friends highest shares, ties broken by smaller barcode id —
    a deterministic rule the device path copies).  All of this barcode's k-mers
    contained in one friend are linked (they are covered by one of the friend's
    molecules); connected components of the k-mer/friend bipartite graph are the
    molecules.  Near-linear in sum of barcode-list lengths — the complexity class
    the reference's serial walk achieves — vs the O(K^2) pairwise contract of
    :func:`cluster_barcode`.  Canonical labels: first-appearing k-mer numbering.
    """
    share = barcode_shares(kmer_ids, hash_codes, self_code)
    friends = [c for c, s in share.items() if s >= min_friend_share]
    friends.sort(key=lambda c: (-share[c], c))
    friend_set = set(friends[:max_friends] if max_friends > 0 else friends)

    k = len(kmer_ids)
    parent = list(range(k))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    first_with: Dict[int, int] = {}
    for i, h in enumerate(kmer_ids):
        for c in hash_codes[h]:
            if c in friend_set:
                if c in first_with:
                    union(first_with[c], i)
                else:
                    first_with[c] = i

    labels = [find(i) for i in range(k)]
    remap: Dict[int, int] = {}
    out = []
    for l in labels:
        if l not in remap:
            remap[l] = len(remap)
        out.append(remap[l])
    return out


def cluster_all(code_hashes: Sequence[Sequence[int]],
                hash_codes: Dict[int, Sequence[int]], min_share: int = 2
                ) -> List[List[int]]:
    """Cluster every barcode (the ``--codeClusters`` pass)."""
    return [cluster_barcode(kh, hash_codes, min_share) for kh in code_hashes]


def split_codes(code_hashes: Sequence[Sequence[int]],
                clusters: Sequence[Sequence[int]]):
    """The ``--clusterSplit`` pass (SURVEY.md §3.1 #9): each (barcode, cluster)
    pair becomes a new code, numbered by (barcode, cluster) ascending; returns
    (new_code_hashes, mapping list of (old_code, cluster) per new code)."""
    new_code_hashes: List[List[int]] = []
    origin: List[tuple] = []
    for c, (kh, cl) in enumerate(zip(code_hashes, clusters)):
        n_cl = (max(cl) + 1) if cl else 0
        groups: List[List[int]] = [[] for _ in range(n_cl)]
        for kmer, lab in zip(kh, cl):
            groups[lab].append(kmer)
        for lab, g in enumerate(groups):
            new_code_hashes.append(sorted(g))
            origin.append((c, lab))
    return new_code_hashes, origin
