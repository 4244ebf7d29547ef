"""Count-pass perf probe on the real chip: batch-size scan + compaction on/off.

Run AFTER any other chip process has finished (one process at a time through
the relay).  Uses the persistent compile cache; first shapes pay remote
compiles (~20-60s each).
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/h10x_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
import numpy as np
import jax
from hash10x_tpu.hashspec import HashSpec
from hash10x_tpu.engine import Engine, EngineConfig
from hash10x_tpu.io.fqb import Fqb
from hash10x_tpu.core.encode import pack_2bit
from hash10x_tpu.utils.sync import device_sync

assert jax.default_backend() == "tpu", jax.default_backend()
N, L, K, W, SEED = 1 << 16, 150, 21, 11, 17
rng = np.random.default_rng(7)
genome = rng.integers(0, 4, size=2_000_000).astype(np.uint8)
starts = rng.integers(0, len(genome) - L, size=N)
reads = np.stack([genome[s:s + L] for s in starts])
packed = pack_2bit(reads)
fqb = Fqb(packed=packed, lengths=np.full(N, L, np.int32),
          barcode_ids=np.zeros(N, np.int32),
          barcode_keys=np.zeros(1, np.uint32), read_len=L)

def bench(batch, compact, reps=3):
    cfg = EngineConfig(spec=HashSpec(k=K, w=W, seed=SEED),
                       count_mode="occurrences", table_bits=20,
                       batch_reads=batch, kernel_compact=compact)
    eng = Engine(cfg, log=None)
    def run():
        eng.reset()
        t0 = time.monotonic()
        eng.count(fqb)
        device_sync(eng.table.hashes)
        return time.monotonic() - t0
    run()  # warm compiles + chunk cache
    best = min(run() for _ in range(reps))
    nk = int(np.asarray(eng.table.n_filled))
    print(f"batch={batch:6d} compact={int(compact)}  "
          f"{N/best:10,.0f} reads/s  wall {best:.3f}s  kmers {nk}", flush=True)
    return N / best

for batch in (4096, 8192, 16384):
    for compact in (False, True):
        try:
            bench(batch, compact)
        except Exception as e:
            print(f"batch={batch} compact={compact} FAILED: {e}", flush=True)
