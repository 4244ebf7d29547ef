"""Device synchronization that actually waits.

Through the axon PJRT relay, ``jax.block_until_ready`` can return before the
device work completes (enqueue-only).  The only reliable barrier is a host
readback; ``device_sync`` pulls one element of one leaf, which cannot complete
until every producing computation has."""

from __future__ import annotations

import jax
import numpy as np

__all__ = ["device_sync"]


def device_sync(x) -> None:
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0) > 0:
            np.asarray(jax.device_get(leaf.ravel()[:1]))
            return
