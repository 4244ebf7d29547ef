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

import functools
import sys
from dataclasses import dataclass
from typing import List, Sequence

import jax
import jax.numpy as jnp
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
    positions: np.ndarray = None  # (n_kmers,) int64 hap1 first position in the
    #                               concatenated-genome coordinate, -1 absent
    rec_starts: np.ndarray = None  # (n_records,) int64 concatenated-coordinate
    #                                start of each hap1 FASTA record
    rec_names: List[str] = None    # hap1 FASTA record (chromosome) names

    def composition(self) -> np.ndarray:
        return np.bincount(self.labels, minlength=5)

    def chrom_of(self, pos: np.ndarray) -> np.ndarray:
        """Record index of each concatenated-coordinate position (-1 for
        pos < 0).  Record == chromosome for assembly FASTAs (SURVEY.md §3.1
        #10: crib labels carry chrom/pos)."""
        if self.rec_starts is None or not len(self.rec_starts):
            return np.full(len(pos), -1, np.int64)
        c = np.searchsorted(self.rec_starts, pos, side="right") - 1
        return np.where(np.asarray(pos) >= 0, c, -1)


@functools.partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
def _scan_group(spec: HashSpec, counts, first_pos, rows, lens, offs, retained):
    """Hash one fixed-shape row group, look hashes up in the retained set, and
    accumulate multiplicity + first-position ON DEVICE (the round-1 path did
    searchsorted/np.add.at on host per group — the crib wall for Gb genomes)."""
    h, _, valid = seqhash_jnp.kmer_grid(spec, rows, lens)
    flat = jnp.where(valid, h, jnp.uint64(U64MAX)).reshape(-1)
    n = retained.shape[0]
    # sort-based rank join (binary-search searchsorted = random gathers)
    from ..table.incidence import rank_join
    idx_c, found0 = rank_join(retained, flat)
    hit = found0 & (flat != jnp.uint64(U64MAX))
    tgt = jnp.where(hit, idx_c, n)                     # n = dropped slot
    counts = counts.at[tgt].add(1, mode="drop")
    P = valid.shape[1]
    pos = (offs[:, None] + jnp.arange(P, dtype=jnp.int64)[None, :]).reshape(-1)
    first_pos = first_pos.at[tgt].min(
        jnp.where(hit, pos, jnp.iinfo(jnp.int64).max), mode="drop")
    return counts, first_pos


def genome_kmer_counts(spec: HashSpec, retained_hashes: np.ndarray, path,
                       with_positions: bool = False):
    """Multiplicity of each retained k-mer in one genome FASTA (canonical hashes,
    every k-mer position — the reference hashes whole genomes, not sketches).
    With ``with_positions``, also returns each k-mer's first position in the
    concatenated-genome coordinate (-1 if absent) plus the record (chromosome)
    start offsets and names, so reports can carry per-chrom positions and
    never straddle record boundaries (SURVEY.md §3.1 #10)."""
    nk = len(retained_hashes)
    if nk == 0:
        z = np.zeros(0, np.uint32)
        return ((z, np.zeros(0, np.int64), np.zeros(0, np.int64), [])
                if with_positions else z)
    counts = jnp.zeros(nk, jnp.uint32)
    first_pos = jnp.full(nk, np.iinfo(np.int64).max, jnp.int64)
    retained_d = jnp.asarray(retained_hashes)
    k = spec.k
    step = _CHUNK - (k - 1)
    ROWS = 32  # fixed batch height: one jit compile regardless of contig sizes

    # gather chunk descriptors across all records, then process in fixed-shape
    # row groups (per-record batches compiled once per distinct chunk count — a
    # compile storm for draft assemblies with many contig lengths)
    chunks = []  # (record codes, start, global genome offset of chunk)
    rec_starts, rec_names = [], []
    genome_off = 0
    for name, seq in fasta_records(path):
        rec_starts.append(genome_off)
        if isinstance(name, bytes):
            name = name.decode("utf-8", "replace")
        rec_names.append(name.split()[0] if name else f"rec{len(rec_names)}")
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
        counts, first_pos = _scan_group(spec, counts, first_pos, rows, lens,
                                        offs, retained_d)
    counts = np.asarray(counts)
    if with_positions:
        fp = np.asarray(first_pos).copy()
        fp[fp == np.iinfo(np.int64).max] = -1
        return counts, fp, np.asarray(rec_starts, np.int64), rec_names
    return counts


def build_crib(spec: HashSpec, retained_hashes: np.ndarray,
               paths: Sequence) -> Crib:
    """Label retained k-mers against 1 or 2 haplotype FASTAs."""
    if not 1 <= len(paths) <= 2:
        raise ValueError("crib takes one or two haplotype FASTAs")
    c0, positions, rec_starts, rec_names = genome_kmer_counts(
        spec, retained_hashes, paths[0], with_positions=True)
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
                positions=positions, rec_starts=rec_starts,
                rec_names=rec_names)


def _segment_percentile(sorted_vals: np.ndarray, seg_off: np.ndarray,
                        seg_len: np.ndarray, q: float) -> np.ndarray:
    """np.percentile(.., q, method='linear') per contiguous segment, vectorized
    (bit-equal to the per-segment np.percentile the round-1 loop called)."""
    pos = (seg_len - 1) * (q / 100.0)
    i0 = np.floor(pos).astype(np.int64)
    frac = pos - i0
    lo = sorted_vals[seg_off + i0]
    hi = sorted_vals[np.minimum(seg_off + i0 + 1, seg_off + seg_len - 1)]
    return lo + frac * (hi - lo)


def crib_report(inc, clusters, crib: Crib, out=sys.stdout) -> None:
    """Per-cluster label composition + haplotype purity (the crib half of
    ``--clusterReport``).  Purity = dominant-haplotype fraction among HET k-mers;
    clusters with no HET k-mers report purity -.

    All per-cluster statistics (label compositions, purity, inner-80% spans)
    are computed vectorized over the flat (code, cluster) key space — the
    round-1 per-cluster Python loop was O(n_clusters) numpy calls, a wall at
    1M+ codes."""
    comp = crib.composition()
    out.write("crib totals " +
              " ".join(f"{LABEL_NAMES[l]} {int(comp[l])}" for l in range(5)) + "\n")
    n_pairs = inc.n_pairs
    # clusters: flat position-aligned label array (at-scale form) or the
    # legacy per-code list
    if isinstance(clusters, np.ndarray):
        flat_cl = clusters.astype(np.int64, copy=False) if n_pairs \
            else np.zeros(0, np.int64)
    else:
        flat_cl = (np.concatenate(clusters).astype(np.int64) if n_pairs
                   else np.zeros(0, np.int64))
    code_of_p = np.repeat(np.arange(inc.n_codes, dtype=np.int64),
                          np.diff(inc.code_offsets))
    K = int(flat_cl.max()) + 1 if n_pairs else 1
    combined = code_of_p * K + flat_cl
    # global cluster ids in (code, cluster) order — the report's line order
    uniq, gid, csize = np.unique(combined, return_inverse=True,
                                 return_counts=True)
    G = len(uniq)
    # label composition per cluster: one bincount over (gid, crib label)
    lab_of_p = crib.labels[inc.code_kmers].astype(np.int64)
    lc = np.bincount(gid * 5 + lab_of_p, minlength=G * 5).reshape(G, 5)
    h1, h2 = lc[:, HET1], lc[:, HET2]
    het = h1 + h2
    dom = np.maximum(h1, h2)
    # inner-80% spans of hap1 positions per cluster, computed WITHIN each
    # cluster's dominant chromosome (FASTA record) only — a span straddling
    # a record boundary in the concatenated coordinate is meaningless
    # (SURVEY.md §3.1 #10: labels carry chrom/pos); the report line names
    # the dominant chrom and its record-local positions drive the span
    spans = np.full(G, -1, np.int64)
    chrom_g = np.full(G, -1, np.int64)
    if crib.positions is not None and n_pairs:
        pp = crib.positions[inc.code_kmers]
        ok = pp >= 0
        gv, pv = gid[ok], pp[ok]
        cv = crib.chrom_of(pv)
        n_rec = len(crib.rec_starts) if crib.rec_starts is not None else 0
        if n_rec and len(gv):
            # dominant chrom per cluster: most k-mers, smallest id on ties
            key = gv * n_rec + cv
            ukey, kcnt = np.unique(key, return_counts=True)
            u_g, u_c = ukey // n_rec, ukey % n_rec
            order = np.lexsort((u_c, -kcnt, u_g))
            first = np.concatenate([[True], u_g[order][1:] != u_g[order][:-1]])
            chrom_g[u_g[order][first]] = u_c[order][first]
            # spans over record-LOCAL positions of the dominant chrom only
            keep = cv == chrom_g[gv]
            gv2 = gv[keep]
            pv2 = pv[keep] - crib.rec_starts[cv[keep]]
            order2 = np.lexsort((pv2, gv2))
            gv2, pv2 = gv2[order2], pv2[order2]
            seg_len = np.bincount(gv2, minlength=G)
            seg_off = np.concatenate([[0], np.cumsum(seg_len)])[:-1]
            enough = seg_len >= 5
            if enough.any():
                p90 = _segment_percentile(pv2, seg_off[enough],
                                          seg_len[enough], 90)
                p10 = _segment_percentile(pv2, seg_off[enough],
                                          seg_len[enough], 10)
                spans[enough] = (p90 - p10).astype(np.int64)
    codes_g = uniq // K
    labs_g = uniq % K
    names = crib.rec_names or []
    lines = []
    for g in range(G):
        pstr = f"{dom[g] / het[g]:.3f}" if het[g] else "-"
        sstr = str(spans[g]) if spans[g] >= 0 else "-"
        cstr = (names[chrom_g[g]] if 0 <= chrom_g[g] < len(names) else "-")
        lines.append(
            f"code {codes_g[g]} cluster {labs_g[g]} n {csize[g]} "
            f"hom {lc[g, HOM]} het1 {h1[g]} het2 {h2[g]} "
            f"mul {lc[g, MUL]} err {lc[g, ERR]} purity {pstr} "
            f"chrom {cstr} span {sstr}\n")
    out.write("".join(lines))
    total_het = int(het.sum())
    if total_het:
        out.write(f"crib overall purity {int(dom.sum()) / total_het:.4f} "
                  f"over {total_het} het kmers\n")
