"""Cluster-phase scale probe on the real chip: 200k barcodes through the
sparse pipeline (incidence synthesized directly — this times the
co-occurrence + edges + propagation phases, not the count pass)."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/h10x_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
import numpy as np
import jax
from hash10x_tpu.table.incidence import build_incidence
from hash10x_tpu.cluster import sparse as SP

assert jax.default_backend() == "tpu", jax.default_backend()

rng = np.random.default_rng(5)
n_codes = 200_000
n_kmers = 2_000_000
# molecule-structured incidence: each code covers ~2 contiguous k-mer spans
per_code = 30
spans = rng.integers(0, n_kmers - 64, size=(n_codes, 2))
ks, cs = [], []
for j in range(2):
    offs = rng.integers(0, 64, size=(n_codes, per_code // 2))
    ks.append((spans[:, j:j + 1] + offs).reshape(-1))
    cs.append(np.repeat(np.arange(n_codes), per_code // 2))
ki = np.concatenate(ks).astype(np.int32)
ci = np.concatenate(cs).astype(np.int32)
t0 = time.monotonic()
inc = build_incidence(ki, ci, n_kmers=n_kmers, n_codes=n_codes)
print(f"incidence: {inc.n_pairs} pairs in {time.monotonic()-t0:.1f}s",
      flush=True)
t0 = time.monotonic()
labels = SP.cluster_codes_sparse(inc, min_friend_share=4, flat=True)
dt = time.monotonic() - t0
n_cl = len(np.unique(
    np.repeat(np.arange(inc.n_codes, dtype=np.int64),
              np.diff(inc.code_offsets)) * (labels.max() + 1) + labels))
print(f"cluster: {n_codes} codes, {inc.n_pairs} pairs -> {n_cl} molecules "
      f"in {dt:.1f}s (cold incl. compiles)", flush=True)
t0 = time.monotonic()
labels2 = SP.cluster_codes_sparse(inc, min_friend_share=4, flat=True)
print(f"cluster warm: {time.monotonic()-t0:.1f}s", flush=True)
assert (labels == labels2).all()
