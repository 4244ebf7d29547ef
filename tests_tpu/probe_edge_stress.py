"""Edge-sweep stress probe on the real chip: the 75.8M-friend-edge lane
(ROADMAP r03: a 20Mb-genome version of the 50k-barcode lane collapses into a
75x molecule pileup) that motivated the blocked label propagation and drove
the r04 LSM edge-drain rework (drains keep sorted runs and merge ONCE at the
end; the r03 drain re-sorted ALL accumulated edges every drain —
O(drains x edges) sort volume, the measured wall here).

Synthesizes the incidence directly (this times the cluster phase, not the
count pass); prints per-phase walls.  Not part of bench.py (minutes of chip
time); run manually, record in ROADMAP.md.
"""
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
# dense pileup: 50k codes x 2 spans over a SMALL (20Mb-equivalent) k-mer
# space -> every molecule overlaps ~150 others -> tens of millions of edges
n_codes = 50_000
n_kmers = 400_000
per_code = 30
spans = rng.integers(0, n_kmers - 64, size=(n_codes, 2))
ks, cs = [], []
for j in range(2):
    offs = rng.integers(0, 64, size=(n_codes, per_code // 2))
    ks.append((spans[:, j:j + 1] + offs).reshape(-1))
    cs.append(np.repeat(np.arange(n_codes), per_code // 2))
t0 = time.monotonic()
inc = build_incidence(np.concatenate(ks).astype(np.int32),
                      np.concatenate(cs).astype(np.int32),
                      n_kmers=n_kmers, n_codes=n_codes)
print(f"incidence: {inc.n_pairs} pairs in {time.monotonic()-t0:.1f}s",
      flush=True)

t0 = time.monotonic()
keys, shares = SP.cooccurrence_counts(inc)
fkeys = SP.friend_pairs(keys, shares, 4)
print(f"cooccur+friends: {len(fkeys)} friend keys (both orders) in "
      f"{time.monotonic()-t0:.1f}s", flush=True)

t0 = time.monotonic()
labels = SP.cluster_codes_sparse(inc, min_friend_share=4, flat=True)
dt_cold = time.monotonic() - t0
t0 = time.monotonic()
labels2 = SP.cluster_codes_sparse(inc, min_friend_share=4, flat=True)
dt_warm = time.monotonic() - t0
assert (labels == labels2).all()
n_cl = len(np.unique(
    np.repeat(np.arange(inc.n_codes, dtype=np.int64),
              np.diff(inc.code_offsets)) * (int(labels.max()) + 1) + labels))
print(f"cluster (incl. edge sweep + propagation): {n_cl} molecules; "
      f"cold {dt_cold:.1f}s (incl. compiles), warm {dt_warm:.1f}s", flush=True)
