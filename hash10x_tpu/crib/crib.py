"""Crib (ground-truth) evaluation: label table k-mers from haplotype assemblies.

Models the reference's crib mechanism (``hash10x.c:~cribBuild`` + crib report,
SURVEY.md §3.1 #10, call stack §4.3): hash every genome k-mer of one/two haplotype
FASTAs of the same sample, look each up in the retained table, and label table
k-mers HOM (single-copy in both haplotypes) / HET1 / HET2 (single-copy in exactly
one) / MUL (multi-copy) / ERR (absent from both — table-only, e.g. sequencing
error), so cluster purity and haplotype phasing can be scored.

Genome hashing reuses the device k-mer grid: sequences stream in fixed-size chunks
with k-1 overlap (static shapes, one jit).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from typing import List, Sequence

import numpy as np

from ..hashspec import HashSpec, U64MAX
from ..core import seqhash_jnp
from ..core.encode import ascii_to_codes
from ..io.fastq import fasta_records

__all__ = ["Crib", "build_crib", "crib_report", "genome_kmer_counts",
           "HOM", "HET1", "HET2", "MUL", "ERR", "LABEL_NAMES"]

HOM, HET1, HET2, MUL, ERR = 0, 1, 2, 3, 4
LABEL_NAMES = ("HOM", "HET1", "HET2", "MUL", "ERR")

_CHUNK = 1 << 15


@dataclass
class Crib:
    labels: np.ndarray        # (n_kmers,) uint8
    hap_counts: np.ndarray    # (n_haps, n_kmers) uint32 genome multiplicity
    n_haps: int
    positions: np.ndarray = None  # (n_kmers,) int64 hap1 first position, -1 absent

    def composition(self) -> np.ndarray:
        return np.bincount(self.labels, minlength=5)


def genome_kmer_counts(spec: HashSpec, retained_hashes: np.ndarray, path,
                       with_positions: bool = False):
    """Multiplicity of each retained k-mer in one genome FASTA (canonical hashes,
    every k-mer position — the reference hashes whole genomes, not sketches).
    With ``with_positions``, also returns each k-mer's first position in the
    concatenated-genome coordinate (-1 if absent) for contiguity reports."""
    counts = np.zeros(len(retained_hashes), np.uint32)
    first_pos = np.full(len(retained_hashes), np.iinfo(np.int64).max, np.int64)
    k = spec.k
    step = _CHUNK - (k - 1)
    ROWS = 32  # fixed batch height: one jit compile regardless of contig sizes

    # gather chunk descriptors across all records, then process in fixed-shape
    # row groups (per-record batches compiled once per distinct chunk count — a
    # compile storm for draft assemblies with many contig lengths)
    chunks = []  # (record codes, start, global genome offset of chunk)
    genome_off = 0
    for _, seq in fasta_records(path):
        codes = ascii_to_codes(seq)
        n = len(codes)
        if n >= k:
            for s in range(0, max(n - k + 1, 1), step):
                chunks.append((codes, s, genome_off + s))
        genome_off += n

    for g in range(0, len(chunks), ROWS):
        group = chunks[g:g + ROWS]
        rows = np.full((ROWS, _CHUNK), 4, np.uint8)
        lens = np.zeros(ROWS, np.int32)
        offs = np.zeros(ROWS, np.int64)
        for bi, (codes, s, goff) in enumerate(group):
            piece = codes[s:s + _CHUNK]
            rows[bi, :len(piece)] = piece
            lens[bi] = len(piece)
            offs[bi] = goff
        h, _, valid = seqhash_jnp.kmer_grid(spec, rows, lens)
        valid = np.asarray(valid)
        flat = np.where(valid, np.asarray(h), U64MAX).reshape(-1)
        keep = flat != U64MAX
        flat = flat[keep]
        idx = np.searchsorted(retained_hashes, flat)
        idx_c = np.minimum(idx, len(retained_hashes) - 1)
        hit = (idx < len(retained_hashes)) & (retained_hashes[idx_c] == flat)
        np.add.at(counts, idx_c[hit], 1)
        if with_positions:
            P = valid.shape[1]
            pos = (offs[:, None] + np.arange(P)[None, :]).reshape(-1)[keep]
            np.minimum.at(first_pos, idx_c[hit], pos[hit])
    if with_positions:
        first_pos[first_pos == np.iinfo(np.int64).max] = -1
        return counts, first_pos
    return counts


def build_crib(spec: HashSpec, retained_hashes: np.ndarray,
               paths: Sequence) -> Crib:
    """Label retained k-mers against 1 or 2 haplotype FASTAs."""
    if not 1 <= len(paths) <= 2:
        raise ValueError("crib takes one or two haplotype FASTAs")
    c0, positions = genome_kmer_counts(spec, retained_hashes, paths[0],
                                       with_positions=True)
    hap_counts = np.stack([c0] + [genome_kmer_counts(spec, retained_hashes, p)
                                  for p in paths[1:]])
    n = len(retained_hashes)
    labels = np.full(n, ERR, np.uint8)
    if len(paths) == 2:
        c1, c2 = hap_counts
        labels[(c1 == 1) & (c2 == 1)] = HOM
        labels[(c1 == 1) & (c2 == 0)] = HET1
        labels[(c1 == 0) & (c2 == 1)] = HET2
        labels[(c1 > 1) | (c2 > 1)] = MUL
    else:
        c1 = hap_counts[0]
        labels[c1 == 1] = HOM
        labels[c1 > 1] = MUL
    return Crib(labels=labels, hap_counts=hap_counts, n_haps=len(paths),
                positions=positions)


def crib_report(inc, clusters, crib: Crib, out=sys.stdout) -> None:
    """Per-cluster label composition + haplotype purity (the crib half of
    ``--clusterReport``).  Purity = dominant-haplotype fraction among HET k-mers;
    clusters with no HET k-mers report purity -."""
    comp = crib.composition()
    out.write("crib totals " +
              " ".join(f"{LABEL_NAMES[l]} {int(comp[l])}" for l in range(5)) + "\n")
    total_het = 0
    total_dom = 0
    for c in range(inc.n_codes):
        kh = inc.kmers_of(c)
        cl = clusters[c]
        n_cl = int(cl.max()) + 1 if len(cl) else 0
        for lab in range(n_cl):
            ks = kh[cl == lab]
            lc = np.bincount(crib.labels[ks], minlength=5)
            h1, h2 = int(lc[HET1]), int(lc[HET2])
            if h1 + h2 > 0:
                purity = max(h1, h2) / (h1 + h2)
                total_het += h1 + h2
                total_dom += max(h1, h2)
                pstr = f"{purity:.3f}"
            else:
                pstr = "-"
            # contiguity: inner 80% span of member positions in hap1 (clean
            # molecule clusters span ~one molecule length; merges span more)
            span = "-"
            if crib.positions is not None:
                pp = crib.positions[ks]
                pp = pp[pp >= 0]
                if len(pp) >= 5:
                    span = str(int(np.percentile(pp, 90) - np.percentile(pp, 10)))
            out.write(f"code {c} cluster {lab} n {len(ks)} "
                      f"hom {int(lc[HOM])} het1 {h1} het2 {h2} "
                      f"mul {int(lc[MUL])} err {int(lc[ERR])} purity {pstr} "
                      f"span {span}\n")
    if total_het:
        out.write(f"crib overall purity {total_dom / total_het:.4f} "
                  f"over {total_het} het kmers\n")
