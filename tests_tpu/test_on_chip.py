"""Mosaic-path regression tests on the real chip.

These cover exactly what the CPU suite cannot: the Pallas kernel's Mosaic
lowering (tests/ runs it in interpret mode) and the engine's on-chip count →
incidence → cluster pipeline against the pure-Python oracles.
"""

import numpy as np
import jax
import jax.numpy as jnp

import hash10x_tpu
from hash10x_tpu import HashSpec
from hash10x_tpu.core import seqhash_jnp
from hash10x_tpu.core.encode import pack_2bit
from hash10x_tpu.engine import Engine, EngineConfig
from hash10x_tpu.io.fqb import Fqb
from hash10x_tpu.kernels import minimizer_pallas as MP
from hash10x_tpu.oracle import cluster_ref as CO
from hash10x_tpu.oracle import seqhash_ref
from hash10x_tpu.table import sorted_table as st

SPEC = HashSpec(k=21, w=11, seed=17)


def test_kernel_mosaic_bit_equals_jnp_and_oracle(rng):
    """The doubling-scan kernel under real Mosaic lowering == jnp == oracle,
    including ragged and short reads (the two known Mosaic x64 hazards —
    int64 scalar lowering and dynamic shifts — regress here, not in bench)."""
    B, L = 1024, 150
    codes = rng.integers(0, 4, (B, L)).astype(np.uint8)
    lengths = np.full(B, L, np.int32)
    lengths[:6] = [150, 149, 100, 32, 31, 21]
    h, f, e = MP.sketch_minimizer(SPEC, jnp.asarray(codes), jnp.asarray(lengths))
    h2, f2, e2 = seqhash_jnp.sketch(SPEC, jnp.asarray(codes),
                                    jnp.asarray(lengths), mode="minimizer")
    h, f, e, h2, f2, e2 = map(np.asarray, (h, f, e, h2, f2, e2))
    P_i = lengths - SPEC.k + 1
    short = (P_i > 0) & (P_i < SPEC.w)
    e2 = e2.copy()
    e2[short] = False  # kernel contract: engine routes short reads to jnp
    assert (e == e2).all()
    assert (h[e] == h2[e]).all()
    assert (f[e] == f2[e]).all()
    # spot-check rows against the scalar oracle
    for r in range(4):
        want = seqhash_ref.minimizers(SPEC, list(codes[r][: lengths[r]]))
        got = [(p, int(h[r, p]), bool(f[r, p]))
               for p in range(h.shape[1]) if e[r, p]]
        assert got == want


def test_kernel_compaction_mosaic(rng):
    """The in-kernel binary-shift compaction under real Mosaic lowering:
    emissions match the uncompacted kernel, front-packed in position order,
    with exact per-read overflow counts."""
    B, L, C = 1024, 150, 64
    codes = rng.integers(0, 4, (B, L)).astype(np.uint8)
    lengths = np.full(B, L, np.int32)
    lengths[:4] = [150, 100, 31, 0]
    h0, f0, e0 = (np.asarray(x) for x in
                  MP.sketch_minimizer(SPEC, jnp.asarray(codes),
                                      jnp.asarray(lengths)))
    h1, f1, e1, ov = (np.asarray(x) for x in
                      MP.sketch_minimizer_compact(SPEC, jnp.asarray(codes),
                                                  jnp.asarray(lengths), C))
    assert ov.sum() == 0
    U = np.uint64(2**64 - 1)
    for r in range(B):
        exp = [(int(h0[r, p]), bool(f0[r, p]))
               for p in range(h0.shape[1]) if e0[r, p]]
        got = [(int(h1[r, j]), bool(f1[r, j])) for j in range(C) if e1[r, j]]
        assert got == exp, f"read {r}"
        assert (h1[r, len(got):] == U).all(), f"read {r} pads"


def test_kernel_modes_mosaic(rng):
    """kmer/modimizer/syncmer kernels under real Mosaic lowering == jnp
    (u32-folded modulus and the sub-spec s-mer scan are the new lowering
    surfaces)."""
    B, L = 1024, 150
    codes = rng.integers(0, 4, (B, L)).astype(np.uint8)
    lengths = np.full(B, L, np.int32)
    lengths[:3] = [150, 100, 25]
    for mode, kw in [("kmer", {}), ("modimizer", {"m": 11}),
                     ("syncmer", {"syncmer_s": 11})]:
        h1, f1, e1 = (np.asarray(x) for x in
                      MP.sketch(SPEC, jnp.asarray(codes), jnp.asarray(lengths),
                                mode=mode, **kw))
        h2, f2, e2 = (np.asarray(x) for x in
                      seqhash_jnp.sketch(SPEC, jnp.asarray(codes),
                                         jnp.asarray(lengths), mode=mode,
                                         m=kw.get("m", 0),
                                         syncmer_s=kw.get("syncmer_s", 0)))
        assert (e1 == e2).all(), mode
        assert (h1[e1] == h2[e1]).all(), mode
        assert (f1[e1] == f2[e1]).all(), mode


def test_sorted_table_flush_grow_on_chip(rng):
    """flush_grow adopts capacity on device without spilling."""
    keys = rng.integers(0, 1 << 20, size=1 << 16, dtype=np.uint64)
    t = st.make_sorted_table(1 << 10, 1 << 17)
    t = st.append(t, jnp.asarray(keys))
    t = st.flush_grow(t)
    h, c = st.compact(t)
    u, cnt = np.unique(keys, return_counts=True)
    assert (h == u).all() and (c == cnt).all()
    assert int(np.asarray(t.spilled)) == 0


def test_engine_pipeline_on_chip(rng):
    """count -> filter -> incidence -> cluster on chip, oracle-checked."""
    genome = rng.integers(0, 4, size=120_000).astype(np.uint8)
    N, n_codes = 4096, 128
    mol = rng.integers(0, len(genome) - 15_000, size=n_codes)
    bc = np.repeat(np.arange(n_codes, dtype=np.int32), N // n_codes)
    starts = mol[bc] + rng.integers(0, 15_000 - 150, size=N)
    reads = np.stack([genome[s:s + 150] for s in starts])
    fqb = Fqb(packed=pack_2bit(reads), lengths=np.full(N, 150, np.int32),
              barcode_ids=bc, barcode_keys=np.arange(n_codes, dtype=np.uint32),
              read_len=150)
    eng = Engine(EngineConfig(spec=SPEC, table_bits=16, batch_reads=1024,
                              min_friend_share=4), log=None)
    eng.count(fqb)
    eng.filter()
    eng.incidence(fqb)
    eng.cluster()
    inc = eng.inc
    assert inc.n_pairs > 0
    hash_codes = {k: inc.codes_of(k).tolist() for k in range(inc.n_kmers)}
    for c in range(0, n_codes, 17):
        want = CO.cluster_barcode_friend(inc.kmers_of(c).tolist(), hash_codes,
                                         c, 4, max_friends=0)
        assert eng.clusters[c].tolist() == want, f"code {c}"
