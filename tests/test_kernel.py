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
