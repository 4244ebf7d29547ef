"""hash10x-tpu: a TPU-native sketch-and-cluster engine for linked-read data.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
richarddurbin/hash10x (see SURVEY.md): seqhash-compatible minimizer/modimizer
sketching, a sharded open-addressing k-mer x barcode count table in HBM, and
barcode co-occurrence clustering expressed as batched MXU matmuls, with
psum/all_gather/all_to_all merges over a device mesh.

Importing this package enables 64-bit JAX types: the entire hash pipeline is
exact uint64 arithmetic (XLA emulates u64 as u32 pairs on TPU; the Pallas hot
kernels use an explicit (hi, lo) u32 representation instead).
"""

import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: CLI invocations are many short processes; without
# this every one re-compiles the pipeline (minutes through a remote-compile TPU
# tunnel). Override via JAX_COMPILATION_CACHE_DIR.
_jax.config.update("jax_compilation_cache_dir",
                   _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                   _os.path.expanduser("~/.cache/hash10x_tpu_xla")))
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from .hashspec import HashSpec, U64MAX  # noqa: E402

__version__ = "0.1.0"
__all__ = ["HashSpec", "U64MAX"]
