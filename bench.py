"""Benchmark harness: count-pass reads/s on the real chip vs the C baseline.

Prints ONE JSON line:
  {"metric": "count_pass_reads_per_s", "value": N, "unit": "reads/s",
   "vs_baseline": N}

vs_baseline is measured against ``native/c_ref/hash10x_ref.c`` — a single-thread
C implementation of the same hashing contract compiled with gcc -O3 — standing in
for the unavailable reference binary's x1.0 row (BASELINE.md "reference-side
numbers still to capture").  The BASELINE.json north star is >=10x on a v5e-16;
this harness measures one chip (the driver records per-round results).

Config: BASELINE.json config #1 semantics — minimizer occurrence counts, single
barcode stream, k=21.
"""

import functools
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/h10x_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np

N_READS = 1 << 16
READ_LEN = 150
BATCH = 1 << 13
K, W, SEED = 21, 11, 17
TABLE_BITS = 20        # ~330k distinct kmers in this lane; auto-grow covers bigger
C_SUBSET = 1 << 14   # the C baseline runs a subset (it is ~100x slower)


def make_lane():
    rng = np.random.default_rng(7)
    # genome-derived reads (repeats matter for table contention realism)
    genome = rng.integers(0, 4, size=2_000_000).astype(np.uint8)
    starts = rng.integers(0, len(genome) - READ_LEN, size=N_READS)
    reads = np.stack([genome[s:s + READ_LEN] for s in starts])
    return reads


def bench_tpu(reads):
    import jax
    import jax.numpy as jnp
    import hash10x_tpu
    from hash10x_tpu.hashspec import HashSpec, U64MAX
    from hash10x_tpu.kernels import minimizer_pallas as MP
    from hash10x_tpu.table import sorted_table as ST
    from hash10x_tpu.utils.sync import device_sync

    spec = HashSpec(k=K, w=W, seed=SEED)
    lengths = np.full(BATCH, READ_LEN, np.int32)

    lengths_j = jnp.asarray(lengths)

    # per-read emission cap: E[minimizers/read] = 2P/(w+1); 4x headroom.
    # Overflowing rows would be counted (cap_overflow), never silent.
    P = READ_LEN - K + 1
    CAP = min(P, 4 * (2 * P // (W + 1)) + 4)

    @functools.partial(jax.jit, donate_argnums=0)
    def append_step(buf, codes, offset, over):
        # fused: pallas sketch -> compact emissions per read -> buffer write
        h, _, emit = MP.sketch_minimizer(spec, codes, lengths_j)
        keyed = jnp.where(emit, h, jnp.uint64(U64MAX))
        packed = jnp.sort(keyed, axis=1)[:, :CAP]     # emitted hashes first
        over = over + jnp.sum(emit.sum(axis=1) > CAP)
        flat = packed.reshape(-1)
        return jax.lax.dynamic_update_slice(buf, flat, (jnp.int32(offset),)), over

    E = BATCH * CAP
    t = ST.make_sorted_table(1 << TABLE_BITS, 1 << 23)
    batches = [jnp.asarray(reads[i:i + BATCH]) for i in range(0, N_READS, BATCH)]

    def run(t):
        over = jnp.zeros((), jnp.int64)
        for b in batches:
            if t.buf_n + E > t.buf.shape[0]:
                t = ST.flush(t)
            buf, over = append_step(t.buf, b, t.buf_n, over)
            t = ST.SortedTable(t.hashes, t.counts, buf, t.buf_n + E, t.spilled)
        assert int(over) == 0, "emission cap overflow"
        return ST.flush(t)

    # warmup (compile every shape incl. flush), then best-of-3 steady-state
    # timing with a real host-readback sync (block_until_ready is enqueue-only
    # via the relay); best-of smooths relay noise
    t = run(t)
    device_sync(t.hashes)
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        t = run(t)
        device_sync(t.hashes)
        best = min(best, time.monotonic() - t0)
    n_kmers = int(np.asarray(t.n_filled))
    return N_READS / best, n_kmers, best


def bench_c(reads):
    """Compile and run the C reference on a subset; returns reads/s (or 0)."""
    try:
        exe = "/tmp/h10x_c_ref"
        src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "native", "c_ref", "hash10x_ref.c")
        if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
            subprocess.run(["gcc", "-O3", "-march=native", "-o", exe, src],
                           check=True, capture_output=True)
        sub = reads[:C_SUBSET]
        binpath = "/tmp/h10x_bench_reads.bin"
        with open(binpath, "wb") as f:
            np.array([len(sub), READ_LEN], np.uint32).tofile(f)
            sub.astype(np.uint8).tofile(f)
        out = subprocess.run(
            [exe, binpath, str(K), str(W), str(SEED), "22"],
            check=True, capture_output=True, text=True, timeout=600).stdout
        toks = out.split()
        n, secs = int(toks[1]), float(toks[7])
        return n / secs
    except Exception as e:
        print(f"bench: C baseline unavailable ({e})", file=sys.stderr)
        return 0.0


def main():
    reads = make_lane()
    c_rps = bench_c(reads)
    tpu_rps, n_kmers, dt = bench_tpu(reads)
    print(f"bench: tpu {tpu_rps:,.0f} reads/s ({N_READS} reads, {n_kmers} kmers, "
          f"{dt:.2f}s steady-state); C ref {c_rps:,.0f} reads/s", file=sys.stderr)
    vs = tpu_rps / c_rps if c_rps else 0.0
    print(json.dumps({"metric": "count_pass_reads_per_s",
                      "value": round(tpu_rps, 1), "unit": "reads/s",
                      "vs_baseline": round(vs, 3)}))


if __name__ == "__main__":
    main()
