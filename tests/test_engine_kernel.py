"""Engine count pass through the Pallas kernel (interpret mode on CPU):
the kernel path — with and without in-kernel emission compaction — must
produce counts bit-identical to the jnp sketch path (SURVEY.md §5 items 2-3
at the engine surface; the Mosaic lowering of the same kernel regresses in
tests_tpu/)."""

import io

import numpy as np
import pytest

from hash10x_tpu.hashspec import HashSpec
from hash10x_tpu.engine import Engine, EngineConfig
from hash10x_tpu.io.fqb import Fqb
from hash10x_tpu.core.encode import pack_2bit


def make_fqb(rng, n=1024, L=150, n_codes=16):
    genome = rng.integers(0, 4, size=60_000).astype(np.uint8)
    starts = rng.integers(0, len(genome) - L, size=n)
    reads = np.stack([genome[s:s + L] for s in starts])
    bcs = rng.integers(0, n_codes, size=n).astype(np.int32)
    return Fqb(packed=pack_2bit(reads), lengths=np.full(n, L, np.int32),
               barcode_ids=bcs,
               barcode_keys=np.arange(n_codes, dtype=np.uint32), read_len=L)


def counts_text(eng, fqb, count_mode):
    eng.count(fqb)
    buf = io.StringIO()
    eng.write_counts(buf)
    return buf.getvalue()


@pytest.mark.parametrize("count_mode", ["occurrences", "barcodes"])
def test_engine_kernel_compaction_matches_jnp(rng, count_mode):
    fqb = make_fqb(rng)
    spec = HashSpec(k=21, w=11, seed=17)
    outs = []
    for use_kernel, compact in ((False, False), (True, False), (True, True)):
        cfg = EngineConfig(spec=spec, count_mode=count_mode, table_bits=16,
                           batch_reads=1024, use_kernel=use_kernel,
                           kernel_compact=compact)
        eng = Engine(cfg, log=None)
        outs.append(counts_text(eng, fqb, count_mode))
    assert outs[0] == outs[1] == outs[2]
    assert outs[0].count("\n") > 100


def test_engine_compaction_overflow_raises(rng, monkeypatch):
    """A too-small compaction width must surface as an exact overflow error
    at lane end — never silent truncation."""
    fqb = make_fqb(rng)
    cfg = EngineConfig(spec=HashSpec(k=21, w=11, seed=17),
                       count_mode="occurrences", table_bits=16,
                       batch_reads=1024)
    eng = Engine(cfg, log=None)
    monkeypatch.setattr(Engine, "_compact_rows", lambda self, P: 8)
    with pytest.raises(RuntimeError, match="overflow"):
        eng.count(fqb)


def test_fresh_engine_flush_path(rng):
    """A fresh Engine (no reset()) must survive a lane large enough to fill
    the append buffer and flush — regression: _filled_bound was only set in
    reset(), so the first flush of a fresh engine raised AttributeError
    (small test lanes never flushed, which hid it; bench's 800k-read
    barcodes lane crashed)."""
    fqb = make_fqb(rng, n=2048)
    cfg = EngineConfig(spec=HashSpec(k=21, w=11, seed=17),
                       count_mode="occurrences", table_bits=10,
                       batch_reads=256, flush_batches=1)
    eng = Engine(cfg, log=None)
    a = counts_text(eng, fqb, "occurrences")
    eng2 = Engine(EngineConfig(spec=HashSpec(k=21, w=11, seed=17),
                               count_mode="occurrences", table_bits=16,
                               batch_reads=2048), log=None)
    b = counts_text(eng2, fqb, "occurrences")
    assert a == b


@pytest.mark.parametrize("n_mesh", [2, 8])
def test_engine_sharded_syncmer_matches_single(rng, n_mesh):
    """--syncmer with --shards (the kernel's syncmer path + jnp fallback on
    the sharded step) == single-device counts."""
    import jax
    if len(jax.devices()) < n_mesh:
        pytest.skip("needs virtual devices")
    fqb = make_fqb(rng, n=512)
    outs = []
    for n in (1, n_mesh):
        cfg = EngineConfig(spec=HashSpec(k=21, w=11, seed=17), mode="syncmer",
                           syncmer_s=11, count_mode="occurrences",
                           table_bits=16, batch_reads=512, n_shards=n)
        eng = Engine(cfg, log=None)
        outs.append(counts_text(eng, fqb, "occurrences"))
    assert outs[0] == outs[1]


@pytest.mark.parametrize("mode,kw", [("kmer", {}),
                                     ("modimizer", {"modulus": 7}),
                                     ("syncmer", {"syncmer_s": 11})])
def test_engine_kernel_modes_match_jnp(rng, mode, kw):
    """Every sketch mode through the kernel (with compaction where it
    applies) == the jnp path at the engine count surface."""
    fqb = make_fqb(rng, n=1024)
    spec = HashSpec(k=21, w=11, seed=17)
    outs = []
    for use_kernel in (False, True):
        cfg = EngineConfig(spec=spec, mode=mode, count_mode="occurrences",
                           table_bits=16, batch_reads=1024,
                           use_kernel=use_kernel, **kw)
        eng = Engine(cfg, log=None)
        outs.append(counts_text(eng, fqb, "occurrences"))
    assert outs[0] == outs[1]
    assert outs[0].count("\n") > 50
