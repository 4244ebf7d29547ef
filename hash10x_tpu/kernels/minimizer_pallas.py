"""Pallas TPU kernel: fused rolling seqhash + leftmost-minimum minimizer emission.

The hot inner loops of the reference (``seqhash.c:~advanceHashRC`` rolling hash +
``minimizerIterator`` windowed min — SURVEY.md §4.1 "INNER HOT LOOP #1") as one
fused kernel, the "rolling seqhash → vectorized Pallas kernel" mandated by
BASELINE.json.  Bit-identical to ``core/seqhash_jnp.py`` / the scalar oracle
(tests enforce it).

Design (v5e) — fully position-parallel, no sequential loops:

* **Layout**: reads live in *lanes*.  The (B, L) byte matrix is transposed to
  (L, B//128, 128) so one position step is a full (8, 128) vreg per 1024-read
  block.  Outputs are (P, B//128, 128).
* **Phase 1 — doubling scan** (replaces the rolling-hash column loop, which was
  latency-bound at ~30 ms/8192 reads; this is ~30x faster): the 2k-bit forward
  k-mer code at every position is built by log-step doubling — F_{m+n}[p] =
  F_n[p] << 2m | F_m[p+n] over (hi, lo) u32 pairs — following the binary
  decomposition of k (~log2 k + popcount k combines, each a handful of
  elementwise shift/or ops over (L, 8, 128) arrays).  The reverse-complement
  code is NOT scanned separately: R_k[p] is the 2-bit-group reversal of the
  complement of F_k[p] (complement = XOR with the 2k-bit mask; reversal = 4
  masked swap steps per word + a word swap + a final >> (64-2k)).  Both codes
  mix with ``factor1`` via 16-bit-split multiplies (the exact
  ``(x*factor1)>>shift1`` of hashspec.py, mod 2^64) and canonicalize (min of
  fwd/RC, ties to RC).
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

__all__ = ["sketch", "sketch_minimizer", "sketch_minimizer_compact",
           "supported"]

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


def _pair_shl(hi, lo, s: int):
    """(hi:lo) << s for static s in [0, 64)."""
    if s == 0:
        return hi, lo
    if s >= 32:
        return lo << (s - 32) if s > 32 else lo, jnp.zeros_like(lo)
    return (hi << s) | (lo >> (32 - s)), lo << s


def _pair_shr(hi, lo, s: int):
    """(hi:lo) >> s for static s in [0, 64)."""
    if s == 0:
        return hi, lo
    if s >= 32:
        return jnp.zeros_like(hi), hi >> (s - 32) if s > 32 else hi
    return hi >> s, (lo >> s) | (hi << (32 - s))


def _rev2_word(x):
    """Reverse the 16 2-bit groups within one u32 word (4 masked swaps)."""
    x = ((x & jnp.uint32(0xCCCCCCCC)) >> 2) | ((x & jnp.uint32(0x33333333)) << 2)
    x = ((x & jnp.uint32(0xF0F0F0F0)) >> 4) | ((x & jnp.uint32(0x0F0F0F0F)) << 4)
    x = ((x & jnp.uint32(0xFF00FF00)) >> 8) | ((x & jnp.uint32(0x00FF00FF)) << 8)
    x = (x >> 16) | (x << 16)
    return x


def _lexlt(a_hi, a_lo, b_hi, b_lo):
    return (a_hi < b_hi) | ((a_hi == b_hi) & (a_lo < b_lo))


def _mod_is_zero(hi, lo, m: int):
    """(hi:lo) % m == 0 for static m < 2^16, folded through u32 arithmetic:
    (hi*2^32 + lo) mod m = ((hi mod m)*(2^32 mod m) + lo mod m) mod m; every
    intermediate stays under 2^32 because m < 2^16."""
    mu = jnp.uint32(m)
    r32 = jnp.uint32((1 << 32) % m)
    return ((hi % mu) * r32 + (lo % mu)) % mu == 0


def _lexmin3(a, b):
    """min over ((hi, lo, idx), ...) with leftmost (smallest idx) tie-break."""
    a_hi, a_lo, a_i = a
    b_hi, b_lo, b_i = b
    lt = _lexlt(a_hi, a_lo, b_hi, b_lo)
    eq = (a_hi == b_hi) & (a_lo == b_lo)
    take_a = lt | (eq & (a_i <= b_i))
    return (jnp.where(take_a, a_hi, b_hi), jnp.where(take_a, a_lo, b_lo),
            jnp.where(take_a, a_i, b_i))


def _fwd_codes(b, k: int, L: int):
    """Forward 2k-bit k-mer codes at every position via log-step doubling.

    b: (L, S, 128) u32 base codes in [0,3].  Returns (hi, lo) u32 arrays of
    length >= P = L-k+1 (tail positions carry garbage; callers mask).
    F_m[p] = sum_{i<m} b[p+i] << 2(m-1-i); combine F_{2^j+mlow}[p] =
    F_{2^j}[p] << 2*mlow | F_mlow[p + 2^j] following k's bits LSB->MSB.
    """
    d_hi, d_lo = jnp.zeros_like(b), b          # D_0 = F_1, valid [0, L-1]
    acc = None                                  # (hi, lo, mlow)
    step = 1                                    # 2^j
    kk = k
    while True:
        if kk & 1:
            if acc is None:
                acc = (d_hi, d_lo, step)
            else:
                a_hi, a_lo, mlow = acc
                s_hi, s_lo = _pair_shl(d_hi, d_lo, 2 * mlow)
                n = min(a_hi.shape[0] - step, s_hi.shape[0])
                acc = (s_hi[:n] | a_hi[step:step + n],
                       s_lo[:n] | a_lo[step:step + n], mlow + step)
        kk >>= 1
        if not kk:
            break
        # double: D_{j+1}[p] = D_j[p] << 2*2^j | D_j[p + 2^j]
        s_hi, s_lo = _pair_shl(d_hi, d_lo, 2 * step)
        n = d_hi.shape[0] - step
        d_hi = s_hi[:n] | d_hi[step:]
        d_lo = s_lo[:n] | d_lo[step:]
        step *= 2
    return acc[0], acc[1]


def _make_kernel(spec: HashSpec, L: int, compact_to: int = 0,
                 mode: str = "minimizer", m: int = 0, syncmer_s: int = 0,
                 sub_seed: int = 0):
    k, w = spec.k, spec.w
    P = L - k + 1
    if compact_to:
        assert 0 < compact_to <= P
        if mode == "minimizer":
            assert w > 1
    if mode == "modimizer":
        m = m or w
        assert 1 < m < (1 << 16)  # u32-safe folding in _mod_is_zero
    if mode == "syncmer":
        assert 0 < syncmer_s < k
        sub = HashSpec(k=syncmer_s, w=1, seed=sub_seed or spec.seed)
    # largest power of two <= w (window tree root); w == 1 handled separately
    a_pow = 1
    while a_pow * 2 <= w:
        a_pow *= 2

    def canonical(b, kk: int, factor: int, shift1: int):
        """Phase 1 for window size kk: parallel code construction + mix +
        canonicalize.  Returns (hi, lo, fwd) arrays of length L - kk + 1."""
        kb = 2 * kk
        hi_mask = (1 << max(kb - 32, 0)) - 1 if kb > 32 else 0
        lo_mask = (1 << min(kb, 32)) - 1
        n = L - kk + 1
        f_hi, f_lo = _fwd_codes(b, kk, L)
        f_hi, f_lo = f_hi[:n], f_lo[:n]
        # reverse-complement code: complement (XOR the 2k-bit mask), reverse
        # the 32 2-bit groups of the 64-bit pair (per-word reversal + word
        # swap), then drop the 64-2k low garbage bits
        c_hi = f_hi ^ jnp.uint32(hi_mask)
        c_lo = f_lo ^ jnp.uint32(lo_mask)
        r_hi, r_lo = _pair_shr(_rev2_word(c_lo), _rev2_word(c_hi), 64 - kb)
        hf_hi, hf_lo = _mix_shift(f_hi, f_lo, factor, shift1)
        hr_hi, hr_lo = _mix_shift(r_hi, r_lo, factor, shift1)
        fwd = _lexlt(hf_hi, hf_lo, hr_hi, hr_lo)
        return (jnp.where(fwd, hf_hi, hr_hi),
                jnp.where(fwd, hf_lo, hr_lo), fwd)

    def minimizer_emit(vh, vl, last_pos, pmask):
        """Phase 2: window-min tree over (value, index), leftmost ties."""
        if w == 1:
            return pmask
        inf_tail = jnp.full((w, _SUB, _LANES), _INF, jnp.uint32)
        mh = jnp.concatenate([vh, inf_tail], axis=0)
        ml = jnp.concatenate([vl, inf_tail], axis=0)
        Ppad = P + w
        mi = jax.lax.broadcasted_iota(jnp.int32, (Ppad, _SUB, _LANES), 0)
        n = Ppad
        s = 1
        while s < a_pow:
            mh, ml, mi = _lexmin3((mh[:n - s], ml[:n - s], mi[:n - s]),
                                  (mh[s:n], ml[s:n], mi[s:n]))
            n -= s
            s *= 2

        # window argmin over w = lexmin(M_a[s], M_a[s + w - a])
        d = w - a_pow
        _, _, wi = _lexmin3((mh[:P], ml[:P], mi[:P]),
                            (mh[d:P + d], ml[d:P + d], mi[d:P + d]))

        # valid window starts: s <= len - k + 1 - w  (per read)
        last_start = (last_pos - (w - 1))
        sidx = jax.lax.broadcasted_iota(jnp.int32, (P, _SUB, _LANES), 0)
        win_ok = sidx <= last_start[None]
        win_arg = jnp.where(win_ok, wi, _BIGI)

        # emitted[p] = OR_{d=0..w-1} (win_arg[p-d] == p)
        pidx_p = sidx
        emit = (win_arg == pidx_p)
        pad = jnp.full((w, _SUB, _LANES), _BIGI, jnp.int32)
        for dd in range(1, w):
            # window start s = p - dd: static shift via concat
            shifted = jnp.concatenate([pad[0:dd], win_arg[0:P - dd]], axis=0)
            emit = emit | (shifted == pidx_p)
        return emit

    def kernel(codes_ref, len_ref, hi_ref, lo_ref, flags_ref, *over_ref):
        # codes_ref (L, 8, 128) u32; len_ref (8,128) i32
        # outputs: hi/lo (P,8,128) u32, flags (P,8,128) u32 (bit0 emit, bit1 fwd)
        # with compact_to=C: outputs are (C,8,128) — per-lane emissions moved to
        # the front — plus over_ref (8,128) i32 counting truncated emissions
        b = codes_ref[...]
        lens = len_ref[...]
        last_pos = lens - k  # max valid k-mer position, may be negative

        vh, vl, fwd = canonical(b, k, spec.factor1, spec.shift1)
        vf = jnp.where(fwd, _U1, _U0)

        # mask positions beyond each read's end
        pmask = jax.lax.broadcasted_iota(jnp.int32, (P, _SUB, _LANES), 0) \
            <= last_pos[None]
        vh = jnp.where(pmask, vh, _INF)
        vl = jnp.where(pmask, vl, _INF)

        if mode == "kmer":
            emit = pmask
        elif mode == "modimizer":
            emit = pmask & _mod_is_zero(vh, vl, m)
        elif mode == "syncmer":
            # open syncmer: keep a k-mer iff its minimal canonical s-mer hash
            # sits at offset 0 (leftmost tie-break => smer[0] <= all others);
            # all compared s-mers lie inside the k-mer window, so pmask
            # suffices for validity.  s-mer array length L-s+1 = P + span - 1.
            sh, sl, _ = canonical(b, syncmer_s, sub.factor1, sub.shift1)
            span = k - syncmer_s + 1
            keep = pmask
            for j in range(1, span):
                keep = keep & ~_lexlt(sh[j:j + P], sl[j:j + P],
                                      sh[:P], sl[:P])
            emit = keep
        else:
            emit = minimizer_emit(vh, vl, last_pos, pmask)

        if not compact_to:
            hi_ref[...] = vh
            lo_ref[...] = vl
            flags_ref[...] = jnp.where(emit, _U1, _U0) | (vf << 1)
            return

        # ---- phase 3: in-lane stable compaction of emissions ----
        # Each lane (read) moves its emitted positions to the front, preserving
        # order, so the kernel writes C << P rows to HBM and the engine's
        # per-batch pad-removal sort shrinks by P/C.  Move distance
        # d[p] = p - rank[p] (rank = exclusive prefix sum of emit) is
        # non-decreasing in p with d[q]-d[p] <= q-p-1 for emitted p<q, so
        # moving LSB-first by power-of-two shifts is collision-free and
        # order-preserving (binary shift compaction).
        C = compact_to
        em32 = jnp.where(emit, 1, 0).astype(jnp.int32)
        inc = em32
        s = 1
        while s < P:  # inclusive prefix sum along positions (log-step)
            inc = inc + jnp.concatenate(
                [jnp.zeros((s, _SUB, _LANES), jnp.int32), inc[:P - s]], axis=0)
            s *= 2
        d = jax.lax.broadcasted_iota(jnp.int32, (P, _SUB, _LANES), 0) \
            - (inc - em32)
        live = emit
        xh, xl, xf = vh, vl, vf

        def _up(x, s, fill):
            return jnp.concatenate(
                [x[s:], jnp.full((s, _SUB, _LANES), fill, x.dtype)], axis=0)

        s = 1
        while s < P:
            cand = _up(live, s, False) & ((_up(d, s, 0) & s) != 0)
            live = cand | (live & ((d & s) == 0))
            xh = jnp.where(cand, _up(xh, s, _INF), xh)
            xl = jnp.where(cand, _up(xl, s, _INF), xl)
            xf = jnp.where(cand, _up(xf, s, _U0), xf)
            d = jnp.where(cand, _up(d, s, 0), d)
            s *= 2
        live_c = live[:C]
        hi_ref[...] = jnp.where(live_c, xh[:C], _INF)
        lo_ref[...] = jnp.where(live_c, xl[:C], _INF)
        flags_ref[...] = jnp.where(live_c, _U1 | (xf[:C] << 1), _U0)
        over_ref[0][...] = jnp.maximum(inc[P - 1] - C, 0)

    return kernel, P


def supported(spec: HashSpec, codes_shape: Tuple[int, int],
              mode: str = "minimizer", m: int = 0, syncmer_s: int = 0) -> bool:
    B, L = codes_shape
    P = L - spec.k + 1
    if B % _ROWS or P < 1:
        return False
    if mode == "minimizer":
        return P >= spec.w
    if mode == "kmer":
        return True
    if mode == "modimizer":
        mm = m or spec.w
        return 1 < mm < (1 << 16)
    if mode == "syncmer":
        return 0 < syncmer_s < spec.k
    return False


def _sketch_call(spec: HashSpec, codes: jnp.ndarray, lengths: jnp.ndarray,
                 compact_to: int, mode: str = "minimizer", m: int = 0,
                 syncmer_s: int = 0):
    B, L = codes.shape
    if not supported(spec, (B, L), mode, m, syncmer_s):
        raise ValueError(f"kernel does not support mode={mode!r} on {(B, L)}")
    kernel, P = _make_kernel(spec, L, compact_to, mode=mode, m=m,
                             syncmer_s=syncmer_s)
    nblk = B // _ROWS
    R = compact_to or P  # output rows

    # lanes layout: (L, B//128, 128) u32; block = 8 consecutive 128-lane groups
    ct = codes.astype(jnp.uint32).transpose(1, 0).reshape(L, B // _LANES, _LANES)
    lens = lengths
    if mode == "minimizer":
        # short reads (0 < P_i < w) emit nothing in-kernel (the jnp path's
        # broken-run rule applies; engine routes them there): length 0 here
        P_i = lengths - spec.k + 1
        lens = jnp.where((P_i > 0) & (P_i < spec.w), 0, lengths)
    lt = lens.astype(jnp.int32).reshape(B // _LANES, _LANES)

    grid = (nblk,)
    out_shape = [
        jax.ShapeDtypeStruct((R, B // _LANES, _LANES), jnp.uint32),
        jax.ShapeDtypeStruct((R, B // _LANES, _LANES), jnp.uint32),
        jax.ShapeDtypeStruct((R, B // _LANES, _LANES), jnp.uint32),
    ]
    row_spec = pl.BlockSpec((R, _SUB, _LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [row_spec, row_spec, row_spec]
    if compact_to:
        out_shape.append(
            jax.ShapeDtypeStruct((B // _LANES, _LANES), jnp.int32))
        out_specs.append(pl.BlockSpec((_SUB, _LANES), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
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
            out_specs=out_specs,
            out_shape=out_shape,
        )
        outs = call(ct, lt)
    hi, lo, flags = outs[:3]

    # back to (B, R); reconstruct u64 and masks
    hi = hi.reshape(R, B).transpose(1, 0)
    lo = lo.reshape(R, B).transpose(1, 0)
    flags = flags.reshape(R, B).transpose(1, 0)
    emit = (flags & 1).astype(bool)
    fwd = ((flags >> 1) & 1).astype(bool)
    hashes = (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)
    # invalid positions read as INF:INF -> U64MAX already
    if compact_to:
        return hashes, fwd, emit, outs[3].reshape(B)
    return hashes, fwd, emit


@functools.partial(jax.jit, static_argnums=0)
def sketch_minimizer(spec: HashSpec, codes: jnp.ndarray, lengths: jnp.ndarray):
    """Fused minimizer sketch.

    codes (B, L) uint8 with B a multiple of 1024 and codes in [0,3]; lengths (B,).
    Returns (hashes (B,P) uint64, is_forward (B,P) bool, emit (B,P) bool) —
    bit-identical to ``seqhash_jnp.sketch(..., mode='minimizer')`` for reads with
    length >= k+w-1 or length < k; lengths in between emit nothing (engine routes
    those through the jnp path).
    """
    return _sketch_call(spec, codes, lengths, 0)


@functools.partial(jax.jit, static_argnums=(0, 3))
def sketch_minimizer_compact(spec: HashSpec, codes: jnp.ndarray,
                             lengths: jnp.ndarray, compact_to: int):
    """Minimizer sketch with in-kernel emission compaction.

    Like :func:`sketch_minimizer`, but every read's emissions are moved to the
    front of its lane inside the kernel (stable binary-shift compaction), so
    the outputs are (B, C) with C = ``compact_to`` << P — ~P/C less HBM
    writeback, and downstream pad-removal sorts shrink by the same factor.
    Returns (hashes (B,C) u64 with U64MAX pads after each read's emissions,
    is_forward (B,C), emit (B,C), overflow (B,) i32 — emissions beyond C per
    read, counted exactly so callers can raise, never silent).  Emission ORDER
    within a read is preserved (ascending k-mer position), and the (hash, fwd)
    multiset equals the uncompacted kernel's emitted set (tests enforce).
    """
    return _sketch_call(spec, codes, lengths, compact_to)


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 6))
def sketch(spec: HashSpec, codes: jnp.ndarray, lengths: jnp.ndarray,
           mode: str = "minimizer", m: int = 0, syncmer_s: int = 0,
           compact_to: int = 0):
    """Fused sketch for every mode — the kernel mirror of
    ``core.seqhash_jnp.sketch`` (bit-identical where supported; tests
    enforce):

    * ``kmer``      — every valid k-mer position emits.
    * ``minimizer`` — leftmost-minimum w-window (reads with 0 < P_i < w emit
      nothing here; the engine routes those through the jnp broken-run path).
    * ``modimizer`` — canonical hash ≡ 0 (mod m), m defaults to w; u32-folded
      modulus (requires 1 < m < 2^16).
    * ``syncmer``   — open syncmer: minimal canonical s-mer at offset 0.

    With ``compact_to=C`` the per-read emissions are front-packed in-kernel
    and a fourth output counts per-read overflow (see
    :func:`sketch_minimizer_compact`).
    """
    return _sketch_call(spec, codes, lengths, compact_to, mode=mode, m=m,
                        syncmer_s=syncmer_s)
