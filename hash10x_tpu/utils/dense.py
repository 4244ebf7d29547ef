"""Device-side unique / dense-rank helpers.

np.unique over the flat pair volume (sort + boundary scan on host) shows up
in every report-shaped pass at 1M+ barcodes; these helpers run the sort,
boundary detection, counts, and rank joins on device and hand back compact
numpy arrays (the final boolean compress is a single host memcpy-speed pass).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["device_unique", "device_dense_ranks"]


@jax.jit
def _sorted_marks(c):
    s = jnp.sort(c)
    is_new = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    return s, is_new


@jax.jit
def _dense_of(c):
    s, is_new = _sorted_marks(c)
    dense_of_sorted = jnp.cumsum(is_new.astype(jnp.int64)) - 1
    idx = jnp.searchsorted(s, c, method="sort")
    return dense_of_sorted[jnp.minimum(idx, s.shape[0] - 1)]


def device_unique(values: np.ndarray, return_counts: bool = False):
    """np.unique(values[, return_counts=True]) with the heavy lifting on
    device; values must be integer-typed."""
    if len(values) == 0:
        u = np.zeros(0, np.asarray(values).dtype)
        return (u, np.zeros(0, np.int64)) if return_counts else u
    s, is_new = (np.asarray(x) for x in _sorted_marks(jnp.asarray(values)))
    if return_counts:
        # segment lengths from boundary positions — same single host pass as
        # the boolean compress below (an int64 reverse-cummin counts variant
        # on device SIGSEGVed the TPU compiler; positions are cheaper anyway)
        pos = np.flatnonzero(is_new)
        return s[pos], np.diff(np.append(pos, len(s))).astype(np.int64,
                                                              copy=False)
    return s[is_new]


def device_dense_ranks(values: np.ndarray) -> np.ndarray:
    """Rank of each element among the sorted distinct values — equal to
    np.searchsorted(np.unique(values), values) — computed on device."""
    if len(values) == 0:
        return np.zeros(0, np.int64)
    return np.asarray(_dense_of(jnp.asarray(values)))
