"""Count-pass stage attribution on the real chip (VERDICT r02 item 1).

Times each stage of the hot per-batch pipeline separately, amortized over
enqueued calls (the relay's ~30-50 ms sync round trip otherwise floors every
number).  Run alone — one process at a time through the relay.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/h10x_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
import numpy as np
import jax
import jax.numpy as jnp

from hash10x_tpu.hashspec import HashSpec, U64MAX
from hash10x_tpu.kernels import minimizer_pallas as MP
from hash10x_tpu.core.encode import pack_2bit, unpack_2bit_jnp
from hash10x_tpu.table import sorted_table as st
from hash10x_tpu.utils.sync import device_sync

assert jax.default_backend() == "tpu", jax.default_backend()

N, L, K, W, SEED = 1 << 16, 150, 21, 11, 17
B = 1 << 12
spec = HashSpec(k=K, w=W, seed=SEED)
rng = np.random.default_rng(7)
genome = rng.integers(0, 4, size=2_000_000).astype(np.uint8)
starts = rng.integers(0, len(genome) - L, size=B)
reads = np.stack([genome[s:s + L] for s in starts])
packed_d = jnp.asarray(pack_2bit(reads))
lens_d = jnp.asarray(np.full(B, L, np.int32))
P = L - K + 1
C = 64  # engine._compact_rows for (k=21,w=11,P=130)
SLOTS = 116736  # engine._batch_slots for this config


def timeit(name, fn, *args, reps=30, rounds=3):
    r = fn(*args)
    device_sync(jax.tree_util.tree_leaves(r)[0])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.monotonic()
        for _ in range(reps):
            r = fn(*args)
        device_sync(jax.tree_util.tree_leaves(r)[0])
        best = min(best, (time.monotonic() - t0) / reps)
    print(f"{name:42s} {best*1e3:8.3f} ms/batch  {B/best:12,.0f} reads/s",
          flush=True)
    return best


# 0. dispatch floor: jitted trivial op on a device arg, enqueued
f_nop = jax.jit(lambda x: x + 1)
timeit("dispatch floor (x+1 on (B,) i32)", f_nop, lens_d)

# 1. kernel alone, compacted, no transpose-back measured separately below
f_k = jax.jit(lambda p, l: MP.sketch(spec, unpack_2bit_jnp(p, L), l,
                                     compact_to=C)[0])
timeit("unpack + kernel(compact) + transpose", f_k, packed_d, lens_d)

f_knc = jax.jit(lambda p, l: MP.sketch(spec, unpack_2bit_jnp(p, L), l)[0])
timeit("unpack + kernel(full P) + transpose", f_knc, packed_d, lens_d)


# 2. + where/flatten + pad-removal sort (the per-batch occurrences reduction)
def step_sort(p, l):
    h, _, emit, ov = MP.sketch(spec, unpack_2bit_jnp(p, L), l, compact_to=C)
    keyed = jnp.where(emit, h, jnp.uint64(U64MAX)).reshape(-1)
    srt = jnp.sort(keyed)
    over = jnp.sum(srt[SLOTS:] != jnp.uint64(U64MAX)).astype(jnp.uint32)
    return srt[:SLOTS], over

f_s = jax.jit(step_sort)
timeit("... + flatten + sort(B*C) + slice", f_s, packed_d, lens_d)

# 2b. sort alone at the two widths
flat_c = jnp.asarray(rng.integers(0, 2**63, size=B * C).astype(np.uint64))
flat_p = jnp.asarray(rng.integers(0, 2**63, size=B * P).astype(np.uint64))
f_sort = jax.jit(jnp.sort)
timeit(f"sort u64 ({B*C}) alone", f_sort, flat_c)
timeit(f"sort u64 ({B*P}) alone", f_sort, flat_p)

# 3. flush merge at engine shapes: capacity 2^20 + buffer 2^21
cap, bufc = 1 << 20, 1 << 21
h0 = jnp.sort(jnp.asarray(
    np.concatenate([rng.integers(0, 2**63, size=cap // 2).astype(np.uint64),
                    np.full(cap - cap // 2, U64MAX, np.uint64)])))
c0 = jnp.asarray(np.ones(cap, np.uint32))
bu = jnp.asarray(rng.integers(0, 2**63, size=bufc).astype(np.uint64))
bw = jnp.asarray(np.ones(bufc, np.uint32))
f_merge = jax.jit(lambda h, c, b, w: st._merge_full(h, c, b, w)[0])
t_fl = timeit(f"flush merge (cap {cap} + buf {bufc})", f_merge, h0, c0, bu, bw,
              reps=5)
print(f"  -> amortized over 16 batches: {t_fl/16*1e3:.3f} ms/batch", flush=True)

# 4. buffer write alone
f_bw = jax.jit(lambda b, w, e, o: st._buf_write.__wrapped__(b, w, e, o))
buf0 = jnp.full((bufc,), jnp.uint64(U64MAX))
bw0 = jnp.zeros((bufc,), jnp.uint32)
emis = flat_c[:SLOTS]
timeit("buffer dynamic_update_slice (SLOTS)", f_bw, buf0, bw0, emis,
       jnp.int32(0))

# 5. transpose cost: kernel rows layout -> read-major (what _sketch_call does)
rows = jnp.asarray(rng.integers(0, 2**32 - 1, size=(C, B // 128, 128),
                                dtype=np.int64).astype(np.uint32))
f_tr = jax.jit(lambda x: x.reshape(C, B).transpose(1, 0).reshape(-1))
timeit("one (C,B) u32 transpose+flatten", f_tr, rows)

# 6. scan fusion probe: S batches in ONE dispatch (lax.scan over carve+step)
S = 8
packs = jnp.asarray(np.stack([pack_2bit(reads)] * S))
lensS = jnp.asarray(np.stack([np.full(B, L, np.int32)] * S))

def scan_step(pk_all, ln_all):
    def body(carry, xs):
        pk, ln = xs
        h, _, emit, ov = MP.sketch(spec, unpack_2bit_jnp(pk, L), ln,
                                   compact_to=C)
        keyed = jnp.where(emit, h, jnp.uint64(U64MAX)).reshape(-1)
        srt = jnp.sort(keyed)
        return carry + jnp.sum(ov).astype(jnp.uint32), srt[:SLOTS]
    over, outs = jax.lax.scan(body, jnp.uint32(0), (pk_all, ln_all))
    return outs

f_scan = jax.jit(scan_step)
r = f_scan(packs, lensS); device_sync(r)
best = float("inf")
for _ in range(3):
    t0 = time.monotonic()
    for _ in range(10):
        r = f_scan(packs, lensS)
    device_sync(r)
    best = min(best, (time.monotonic() - t0) / 10)
print(f"{'scan x8 (unpack+kernel+sort) / batch':42s} {best/S*1e3:8.3f} ms/batch"
      f"  {B*S/best:12,.0f} reads/s", flush=True)
