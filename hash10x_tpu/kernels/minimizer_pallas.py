"""Pallas TPU kernel: fused rolling seqhash + leftmost-minimum minimizer emission.

The hot inner loops of the reference (``seqhash.c:~advanceHashRC`` rolling hash +
``minimizerIterator`` windowed min — SURVEY.md §4.1 "INNER HOT LOOP #1") as one
fused kernel, the "rolling seqhash → vectorized Pallas kernel" mandated by
BASELINE.json.  Bit-identical to ``core/seqhash_jnp.py`` / the scalar oracle
(tests enforce it).

Design (v5e):

* **Layout**: reads live in *lanes*.  The (B, L) byte matrix is transposed to
  (L, B//128, 128) so one column step is a full (8, 128) vreg per 1024-read
  block.  Outputs are (P, B//128, 128).
* **Phase 1 — column scan**: a ``fori_loop`` over the L columns rolls the
  forward/RC 2k-bit codes as (hi, lo) u32 pairs (no 64-bit types on TPU), mixes
  with ``factor1`` via 16-bit-split multiplies (the exact ``(x*factor1)>>shift1``
  of hashspec.py, mod 2^64), canonicalizes (min of fwd/RC, ties to RC), and
  stores (hash_hi, hash_lo, is_forward) per k-mer position in VMEM scratch.
* **Phase 2 — window argmin, position-parallel**: log-step sliding-min tree over
  (value, index) with leftmost tie-break; window-of-w argmin from the largest
  power-of-two level a via ``lexmin(M_a[s], M_a[s+w-a])``; emission mask by w
  shifted compares (``argmin[s] == p``) — no scatters, no gathers.
* **Ragged reads**: positions past ``len-k`` carry +INF and window starts past
  ``len-k+1-w`` are masked per read (the A*/B* window-validity rule; matches the
  oracle for every length >= k+w-1).  Reads shorter than k+w-1 emit nothing here
  — the engine routes those (rare trimmed fragments) through the jnp path.

The kernel requires all base codes in [0, 3] (2-bit packed fqb reads guarantee
this); text inputs with Ns use the jnp path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..hashspec import HashSpec

__all__ = ["sketch_minimizer", "supported"]

_LANES = 128
_SUB = 8
_ROWS = _SUB * _LANES  # reads per grid block

_INF = np.uint32(0xFFFFFFFF)  # numpy scalar: a literal inside kernels, not a captured array
_BIGI = np.int32(2**31 - 1)    # int32 index sentinel
_U1 = np.uint32(1)
_U0 = np.uint32(0)


def _umul_parts(a, b_const: int):
    """(a * b_const) -> (hi32, lo32) for u32 vector a, python-int b < 2^32."""
    b0 = b_const & 0xFFFF
    b1 = (b_const >> 16) & 0xFFFF
    a0 = a & 0xFFFF
    a1 = a >> 16
    t = a0 * jnp.uint32(b0)
    m1 = a1 * jnp.uint32(b0) + (t >> 16)
    m2 = a0 * jnp.uint32(b1) + (m1 & 0xFFFF)
    hi = a1 * jnp.uint32(b1) + (m1 >> 16) + (m2 >> 16)
    lo = (m2 << 16) | (t & 0xFFFF)
    return hi, lo


def _mix_shift(x_hi, x_lo, factor: int, shift1: int):
    """((x * factor) mod 2^64) >> shift1 as (hi, lo) — hashspec.hash_func."""
    f_lo = factor & 0xFFFFFFFF
    f_hi = (factor >> 32) & 0xFFFFFFFF
    p_hi0, p_lo = _umul_parts(x_lo, f_lo)
    p_hi = p_hi0
    if f_hi:
        p_hi = p_hi + _umul_parts(x_lo, f_hi)[1]
    p_hi = p_hi + _umul_parts(x_hi, f_lo)[1]
    # result = (p_hi:p_lo) >> shift1
    if shift1 >= 32:
        s = shift1 - 32
        return jnp.zeros_like(p_hi), (p_hi >> s) if s else p_hi
    return p_hi >> shift1, (p_lo >> shift1) | (p_hi << (32 - shift1))


def _lexlt(a_hi, a_lo, b_hi, b_lo):
    return (a_hi < b_hi) | ((a_hi == b_hi) & (a_lo < b_lo))


def _lexmin3(a, b):
    """min over ((hi, lo, idx), ...) with leftmost (smallest idx) tie-break."""
    a_hi, a_lo, a_i = a
    b_hi, b_lo, b_i = b
    lt = _lexlt(a_hi, a_lo, b_hi, b_lo)
    eq = (a_hi == b_hi) & (a_lo == b_lo)
    take_a = lt | (eq & (a_i <= b_i))
    return (jnp.where(take_a, a_hi, b_hi), jnp.where(take_a, a_lo, b_lo),
            jnp.where(take_a, a_i, b_i))


def _make_kernel(spec: HashSpec, L: int):
    k, w = spec.k, spec.w
    P = L - k + 1
    Ppad = P + w  # INF tail so shifted slices never read out of bounds
    factor = spec.factor1
    shift1 = spec.shift1
    kb = 2 * k  # total code bits
    hi_mask = (1 << max(kb - 32, 0)) - 1 if kb > 32 else 0
    lo_mask = (1 << min(kb, 32)) - 1
    rc_top = 2 * (k - 1)  # bit position of patternRC complement

    # largest power of two <= w (window tree root); w == 1 handled separately
    a_pow = 1
    while a_pow * 2 <= w:
        a_pow *= 2

    def kernel(codes_ref, len_ref, hi_ref, lo_ref, flags_ref,
               vh, vl, vf, mh, ml, mi):
        # codes_ref (L, 8, 128) u32; len_ref (8,128) i32
        # outputs: hi/lo (P,8,128) u32, flags (P,8,128) u32 (bit0 emit, bit1 fwd)
        # scratch: vh/vl (Ppad,8,128) u32 canonical hash, vf u32 fwd flag,
        #          mh/ml/mi (Ppad,8,128) u32 window-min tree (value+index)

        lens = len_ref[...]
        last_pos = lens - k  # max valid k-mer position, may be negative

        def roll_step(carry, c):
            h_hi, h_lo, r_hi, r_lo = carry
            # forward: h = ((h << 2) | c) & mask(2k)
            n_hi = ((h_hi << 2) | (h_lo >> 30))
            n_lo = (h_lo << 2) | c
            if hi_mask:
                n_hi = n_hi & jnp.uint32(hi_mask)
            else:
                n_hi = jnp.zeros_like(n_hi)
            n_lo = n_lo & jnp.uint32(lo_mask)
            # reverse-complement: hRC = (hRC >> 2) | ((3-c) << 2(k-1))
            comp = jnp.uint32(3) - c
            if rc_top >= 32:
                q_lo = (r_lo >> 2) | (r_hi << 30)
                q_hi = (r_hi >> 2) | (comp << (rc_top - 32))
            else:
                q_lo = ((r_lo >> 2) | (r_hi << 30)) | (comp << rc_top)
                q_hi = r_hi >> 2
            return n_hi, n_lo, q_hi, q_lo

        # prologue: first k-1 bases (static column reads, carry only — Mosaic
        # cannot lower a scalar max/clamp in the dynamic loop, so avoid needing one)
        z = jnp.zeros((_SUB, _LANES), jnp.uint32)
        carry = (z, z, z, z)
        for i in range(k - 1):
            carry = roll_step(carry, codes_ref[i])

        # while_loop with an explicit int32 counter: under jax_enable_x64,
        # fori_loop's induction variable is int64 and every scalar op on it
        # hits a Mosaic convert_element_type lowering bug (infinite recursion)
        def cond(state):
            return state[0] < np.int32(P)

        def col(state):
            p, carry = state
            c = codes_ref[pl.ds(p + (k - 1), 1)][0]
            carry = roll_step(carry, c)
            n_hi, n_lo, q_hi, q_lo = carry
            hf_hi, hf_lo = _mix_shift(n_hi, n_lo, factor, shift1)
            hr_hi, hr_lo = _mix_shift(q_hi, q_lo, factor, shift1)
            fwd = _lexlt(hf_hi, hf_lo, hr_hi, hr_lo)
            ch = jnp.where(fwd, hf_hi, hr_hi)
            cl = jnp.where(fwd, hf_lo, hr_lo)
            vh[pl.ds(p, 1)] = ch[None]
            vl[pl.ds(p, 1)] = cl[None]
            vf[pl.ds(p, 1)] = jnp.where(fwd, _U1, _U0)[None]
            return (p + np.int32(1), carry)

        jax.lax.while_loop(cond, col, (np.int32(0), carry))

        # mask positions beyond each read's end (array-vs-array compare — a
        # scalar-vs-array compare inside the loop also fails to lower), and
        # INF-pad the tail
        pmask = jax.lax.broadcasted_iota(jnp.int32, (P, _SUB, _LANES), 0) \
            <= last_pos[None]
        vh[0:P] = jnp.where(pmask, vh[0:P], _INF)
        vl[0:P] = jnp.where(pmask, vl[0:P], _INF)
        for p in range(P, Ppad):
            vh[p] = jnp.full((_SUB, _LANES), _INF, jnp.uint32)
            vl[p] = jnp.full((_SUB, _LANES), _INF, jnp.uint32)

        if w == 1:
            emit1 = (vh[0:P] != _INF) | (vl[0:P] != _INF)
            flags_ref[...] = jnp.where(emit1, _U1, _U0) | (vf[0:P] << 1)
            hi_ref[...] = vh[0:P]
            lo_ref[...] = vl[0:P]
            return

        # ---- window-min tree over (value, index), leftmost tie-break ----
        pidx = jax.lax.broadcasted_iota(jnp.int32, (Ppad, _SUB, _LANES), 0)
        mh[...] = vh[...]
        ml[...] = vl[...]
        mi[...] = pidx
        s = 1
        while s < a_pow:
            nh, nl, ni = _lexmin3(
                (mh[0:Ppad - s], ml[0:Ppad - s], mi[0:Ppad - s]),
                (mh[s:Ppad], ml[s:Ppad], mi[s:Ppad]))
            mh[0:Ppad - s] = nh
            ml[0:Ppad - s] = nl
            mi[0:Ppad - s] = ni
            s *= 2

        # window argmin over w = lexmin(M_a[s], M_a[s + w - a])
        d = w - a_pow
        wh, wl, wi = _lexmin3(
            (mh[0:P], ml[0:P], mi[0:P]),
            (mh[d:P + d], ml[d:P + d], mi[d:P + d]))

        # valid window starts: s <= len - k + 1 - w  (per read)
        last_start = (last_pos - (w - 1))
        sidx = jax.lax.broadcasted_iota(jnp.int32, (P, _SUB, _LANES), 0)
        win_ok = sidx <= last_start[None]
        win_arg = jnp.where(win_ok, wi, _BIGI)

        # emitted[p] = OR_{d=0..w-1} (win_arg[p-d] == p)
        pidx_p = pidx[0:P]
        emit = (win_arg == pidx_p)
        pad = jnp.full((w, _SUB, _LANES), _BIGI, jnp.int32)
        for dd in range(1, w):
            # window start s = p - dd: static shift via concat (pltpu.roll's
            # dynamic shift operand lowers as i64 under x64 and fails)
            shifted = jnp.concatenate([pad[0:dd], win_arg[0:P - dd]], axis=0)
            emit = emit | (shifted == pidx_p)

        hi_ref[...] = vh[0:P]
        lo_ref[...] = vl[0:P]
        flags_ref[...] = jnp.where(emit, _U1, _U0) | (vf[0:P] << 1)

    return kernel, P, Ppad


def supported(spec: HashSpec, codes_shape: Tuple[int, int]) -> bool:
    B, L = codes_shape
    return (B % _ROWS == 0) and (L - spec.k + 1) >= spec.w


@functools.partial(jax.jit, static_argnums=0)
def sketch_minimizer(spec: HashSpec, codes: jnp.ndarray, lengths: jnp.ndarray):
    """Fused minimizer sketch.

    codes (B, L) uint8 with B a multiple of 1024 and codes in [0,3]; lengths (B,).
    Returns (hashes (B,P) uint64, is_forward (B,P) bool, emit (B,P) bool) —
    bit-identical to ``seqhash_jnp.sketch(..., mode='minimizer')`` for reads with
    length >= k+w-1 or length < k; lengths in between emit nothing (engine routes
    those through the jnp path).
    """
    B, L = codes.shape
    if not supported(spec, (B, L)):
        raise ValueError(f"kernel needs B % {_ROWS} == 0 and P >= w")
    kernel, P, Ppad = _make_kernel(spec, L)
    nblk = B // _ROWS

    # lanes layout: (L, B//128, 128) u32; block = 8 consecutive 128-lane groups
    ct = codes.astype(jnp.uint32).transpose(1, 0).reshape(L, B // _LANES, _LANES)
    # short reads (0 < P_i < w) emit nothing in-kernel: give them length 0 here
    P_i = lengths - spec.k + 1
    lens = jnp.where((P_i > 0) & (P_i < spec.w), 0, lengths).astype(jnp.int32)
    lt = lens.reshape(B // _LANES, _LANES)

    grid = (nblk,)
    out_shape = [
        jax.ShapeDtypeStruct((P, B // _LANES, _LANES), jnp.uint32),
        jax.ShapeDtypeStruct((P, B // _LANES, _LANES), jnp.uint32),
        jax.ShapeDtypeStruct((P, B // _LANES, _LANES), jnp.uint32),
    ]
    scr = [pltpu.VMEM((Ppad, _SUB, _LANES), jnp.uint32) for _ in range(5)] + \
          [pltpu.VMEM((Ppad, _SUB, _LANES), jnp.int32)]
    # x64 mode poisons Mosaic's grid/index lowering with int64 scalars (infinite
    # convert_element_type recursion / func.return legalization failures); the
    # kernel is pure 32-bit, so trace it with x64 off.
    from jax._src.config import enable_x64 as _x64_ctx
    with _x64_ctx(False):
        call = pl.pallas_call(
            kernel,
            interpret=jax.default_backend() != "tpu",
            grid=grid,
            in_specs=[
                pl.BlockSpec((L, _SUB, _LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_SUB, _LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((P, _SUB, _LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, _SUB, _LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, _SUB, _LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=out_shape,
            scratch_shapes=scr,
        )
        hi, lo, flags = call(ct, lt)

    # back to (B, P); reconstruct u64 and masks
    hi = hi.reshape(P, B).transpose(1, 0)
    lo = lo.reshape(P, B).transpose(1, 0)
    flags = flags.reshape(P, B).transpose(1, 0)
    emit = (flags & 1).astype(bool)
    fwd = ((flags >> 1) & 1).astype(bool)
    hashes = (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)
    # invalid positions read as INF:INF -> U64MAX already
    return hashes, fwd, emit
