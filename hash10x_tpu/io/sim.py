"""Linked-read simulator — drives tests, benches, and the crib evaluation.

The reference validates itself on real 10x lanes plus the crib truth mechanism
(SURVEY.md §5); with no data shipped in this environment, the framework carries a
deterministic simulator of the 10x generative process (SURVEY.md §1): a genome (or
two haplotypes), per-barcode pools of long molecules, short reads sampled from the
molecules.  Ground truth (molecule of origin per read) is returned so clustering
purity can be scored exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from .fastq import ReadBatch

__all__ = ["SimConfig", "SimResult", "simulate", "random_genome"]


@dataclass
class SimConfig:
    genome_len: int = 200_000
    n_barcodes: int = 64
    molecules_per_barcode: int = 4
    molecule_len: int = 20_000
    reads_per_molecule: int = 50
    read_len: int = 150
    error_rate: float = 0.0
    het_rate: float = 0.0          # if > 0, generate two haplotypes differing at this rate
    seed: int = 0


@dataclass
class SimResult:
    reads: ReadBatch               # codes include per-read barcodes already split out
    barcode_keys: np.ndarray       # (N,) u32 per read
    truth_molecule: np.ndarray     # (N,) int32 global molecule id per read
    truth_span: np.ndarray         # (M, 3) int32: (haplotype, start, end) per molecule
    genome: np.ndarray             # (G,) uint8 hap0
    genome_hap1: Optional[np.ndarray] = None


def random_genome(rng: np.random.Generator, n: int) -> np.ndarray:
    return rng.integers(0, 4, size=n).astype(np.uint8)


def simulate(cfg: SimConfig) -> SimResult:
    rng = np.random.default_rng(cfg.seed)
    g0 = random_genome(rng, cfg.genome_len)
    g1 = None
    if cfg.het_rate > 0:
        g1 = g0.copy()
        sites = rng.random(cfg.genome_len) < cfg.het_rate
        shift = rng.integers(1, 4, size=cfg.genome_len).astype(np.uint8)
        g1[sites] = (g1[sites] + shift[sites]) % 4
    haps = [g0] if g1 is None else [g0, g1]

    n_mol = cfg.n_barcodes * cfg.molecules_per_barcode
    n_reads = n_mol * cfg.reads_per_molecule
    # distinct random 16bp barcodes
    bc_keys = rng.choice(1 << 32, size=cfg.n_barcodes, replace=False).astype(np.uint32)

    codes = np.empty((n_reads, cfg.read_len), np.uint8)
    read_bc = np.empty(n_reads, np.uint32)
    truth_mol = np.empty(n_reads, np.int32)
    spans = np.empty((n_mol, 3), np.int32)

    mol_len = min(cfg.molecule_len, cfg.genome_len)
    r = 0
    for m in range(n_mol):
        bc = m // cfg.molecules_per_barcode
        hap = int(rng.integers(0, len(haps)))
        start = int(rng.integers(0, cfg.genome_len - mol_len + 1))
        spans[m] = (hap, start, start + mol_len)
        genome = haps[hap]
        for _ in range(cfg.reads_per_molecule):
            p = start + int(rng.integers(0, mol_len - cfg.read_len + 1))
            seq = genome[p:p + cfg.read_len].copy()
            if cfg.error_rate > 0:
                errs = rng.random(cfg.read_len) < cfg.error_rate
                seq[errs] = (seq[errs] + rng.integers(1, 4, size=int(errs.sum()))) % 4
            codes[r] = seq
            read_bc[r] = bc_keys[bc]
            truth_mol[r] = m
            r += 1

    lengths = np.full(n_reads, cfg.read_len, np.int32)
    batch = ReadBatch(codes=codes, lengths=lengths, barcodes=read_bc)
    return SimResult(reads=batch, barcode_keys=read_bc, truth_molecule=truth_mol,
                     truth_span=spans, genome=g0, genome_hap1=g1)
