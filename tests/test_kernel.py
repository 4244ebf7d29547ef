"""Pallas minimizer kernel vs the jnp reference / scalar oracle (SURVEY.md §5
item 3).  Runs in interpreter mode on the CPU test mesh; the same kernel is
verified on real TPU hardware by the /verify drives and bench.py."""

import numpy as np
import pytest

import jax.numpy as jnp
from hash10x_tpu.hashspec import HashSpec
from hash10x_tpu.core import seqhash_jnp as J
from hash10x_tpu.kernels import minimizer_pallas as MP

from conftest import random_codes


def compare(spec, codes, lengths):
    h1, f1, e1 = (np.asarray(x) for x in
                  MP.sketch_minimizer(spec, jnp.asarray(codes), jnp.asarray(lengths)))
    h2, f2, e2 = (np.asarray(x) for x in
                  J.sketch(spec, codes, lengths, mode="minimizer"))
    P_i = lengths - spec.k + 1
    short = (P_i > 0) & (P_i < spec.w)
    ok = ~short
    assert (e1[ok] == e2[ok]).all(), "emission mask mismatch"
    assert (h1[ok][e2[ok]] == h2[ok][e2[ok]]).all(), "hash mismatch"
    assert (f1[ok][e2[ok]] == f2[ok][e2[ok]]).all(), "strand mismatch"
    # full-grid hash agreement at valid positions
    U = np.uint64(2**64 - 1)
    assert np.where(h2[ok] != U, h1[ok] == h2[ok], True).all()
    assert (~e1[short]).any() or short.sum() == 0  # short rows silent


# k spans the hi/lo split and shift branches: kb<=32, kb==32, kb>32, shift1<32
@pytest.mark.parametrize("k,w", [(4, 3), (15, 1), (16, 5), (17, 7), (21, 11), (31, 2)])
def test_kernel_matches_jnp(rng, k, w):
    spec = HashSpec(k=k, w=w, seed=17)
    L = max(64, k + w + 10)
    codes = np.stack([random_codes(rng, L) for _ in range(1024)])
    lengths = np.full(1024, L, np.int32)
    compare(spec, codes, lengths)


def test_kernel_ragged_lengths(rng):
    spec = HashSpec(k=21, w=11, seed=17)
    codes = np.stack([random_codes(rng, 100) for _ in range(1024)])
    lengths = rng.integers(0, 101, size=1024).astype(np.int32)
    compare(spec, codes, lengths)


def test_kernel_rejects_bad_shapes(rng):
    spec = HashSpec(k=21, w=11, seed=17)
    with pytest.raises(ValueError):
        MP.sketch_minimizer(spec, jnp.zeros((100, 150), jnp.uint8),
                            jnp.full(100, 150, jnp.int32))


def compare_compact(spec, codes, lengths, C):
    """Compacted kernel == uncompacted kernel with emissions moved front,
    order preserved, exact per-read overflow counts."""
    h0, f0, e0 = (np.asarray(x) for x in
                  MP.sketch_minimizer(spec, jnp.asarray(codes),
                                      jnp.asarray(lengths)))
    h1, f1, e1, ov = (np.asarray(x) for x in
                      MP.sketch_minimizer_compact(spec, jnp.asarray(codes),
                                                  jnp.asarray(lengths), C))
    U = np.uint64(2**64 - 1)
    for r in range(len(codes)):
        exp = [(int(h0[r, p]), bool(f0[r, p]))
               for p in range(h0.shape[1]) if e0[r, p]]
        got = [(int(h1[r, j]), bool(f1[r, j])) for j in range(C) if e1[r, j]]
        assert got == exp[:len(got)], f"read {r}"
        assert int(ov[r]) == max(len(exp) - C, 0), f"read {r} overflow"
        assert (h1[r, len(got):] == U).all(), f"read {r} pads"


@pytest.mark.parametrize("k,w,C", [(21, 11, 64), (17, 7, 48), (31, 2, 64)])
def test_kernel_compaction_matches(rng, k, w, C):
    spec = HashSpec(k=k, w=w, seed=17)
    L = max(96, k + w + 10)
    codes = np.stack([random_codes(rng, L) for _ in range(1024)])
    lengths = rng.integers(0, L + 1, size=1024).astype(np.int32)
    compare_compact(spec, codes, lengths, C)


def test_kernel_compaction_overflow_exact(rng):
    """A tiny C forces per-read overflow; counts must be exact (never silent)."""
    spec = HashSpec(k=21, w=3, seed=17)
    codes = np.stack([random_codes(rng, 128) for _ in range(1024)])
    lengths = np.full(1024, 128, np.int32)
    compare_compact(spec, codes, lengths, 8)


@pytest.mark.parametrize("mode,kw", [("kmer", {}), ("modimizer", {"m": 7}),
                                     ("modimizer", {"m": 11}),
                                     ("syncmer", {"syncmer_s": 11}),
                                     ("syncmer", {"syncmer_s": 5})])
def test_kernel_modes_match_jnp(rng, mode, kw):
    """The mode-dispatching kernel (kmer / modimizer / syncmer) == jnp path,
    including ragged and short reads (non-minimizer modes emit for any
    P_i >= 1 — no short-read skip)."""
    spec = HashSpec(k=21, w=11, seed=17)
    L = 120
    codes = np.stack([random_codes(rng, L) for _ in range(1024)])
    lengths = rng.integers(0, L + 1, size=1024).astype(np.int32)
    h1, f1, e1 = (np.asarray(x) for x in
                  MP.sketch(spec, jnp.asarray(codes), jnp.asarray(lengths),
                            mode=mode, **kw))
    h2, f2, e2 = (np.asarray(x) for x in
                  J.sketch(spec, codes, lengths, mode=mode,
                           m=kw.get("m", 0), syncmer_s=kw.get("syncmer_s", 0)))
    assert (e1 == e2).all()
    assert (h1[e1] == h2[e1]).all()
    assert (f1[e1] == f2[e1]).all()
