"""Mesh-distributed sparse friend clustering — ``--codeClusters`` on a pod
slice (BASELINE configs #4/#5: 1M+ barcodes).

Distributes the three phases of ``cluster/sparse.py`` over a 1-D device mesh
(SURVEY.md §3.2's collective rows, BASELINE verbatim: "barcode-barcode
co-occurrence matrices merge via psum/all-gather collectives"):

1. **Co-occurrence counts** — the shift-join windows run data-parallel (one
   window per device per round, codes/segments replicated — they are 8 bytes
   per incidence pair); each device's pair keys route to their owner shard by
   key low bits through ONE ``all_to_all`` (the same EP-style deterministic
   routing as the count pass), landing in per-shard LSM sorted tables that
   flush shard-parallel.  Send lanes are built from contiguous segments of the
   dest-sorted keys (static slices — no scatter).
2. **Friend edges** — friend keys (share >= threshold) are REPLICATED (they
   are the thresholded co-occurrence, ~tens of bytes per barcode); each device
   sweeps its windows and keeps its edges LOCAL — no routing at all.
3. **Propagation** — labels ((n_p,) int32) are replicated; each iteration
   computes per-device partial ``segment_min`` over its local edges and merges
   with ``lax.pmin`` over the mesh — the psum/all-gather merge of BASELINE,
   with min as the monoid.

Equality with the single-device sparse path (and hence the union-find oracle)
is enforced by tests on a virtual 8-device CPU mesh.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..hashspec import U64MAX
from ..table import sorted_table as st
from .sparse import (_ShiftJoin, _forward_positions, _local_indices, _pow2,
                     _win_edges, _win_keys, canonical_ranks, friend_pairs)

__all__ = ["cluster_codes_sparse_dist", "cooccurrence_counts_dist"]

_U64MAX = jnp.uint64(U64MAX)


def _round_windows(sj: _ShiftJoin, n: int):
    """All (a, d) windows, grouped into rounds of n (one per device); rounds
    pad with a no-op window (d = 0 emits nothing: i and i+0 is masked by
    ``i != j``... d=0 pairs every position with itself, so use a=0, d=0 with
    an explicit skip flag instead)."""
    wins = [(a, d) for d in range(1, sj.D) for a, _ in sj.windows(d)]
    rounds = []
    for i in range(0, len(wins), n):
        r = wins[i:i + n]
        pad = n - len(r)
        r = r + [(0, 0)] * pad  # d=0 flags a no-op window
        rounds.append(r)
    return rounds


def _make_pair_route_step(mesh: Mesh, W: int, n_codes: int, cap_lane: int):
    """One routed sweep round: every device computes one window's pair keys,
    buckets them by owner shard (key & (n-1)), one all_to_all delivers, and
    the receipts append to the per-shard buffer."""
    n = mesh.devices.size
    n_codes_u = jnp.uint64(max(n_codes, 1))

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P("d"), P("d"), P(), P(), P("d"), P("d"), P()),
                       out_specs=(P("d"), P("d")),
                       check_vma=False)
    def body(buf, drops, codes_pad, seg_pad, a, d, offset):
        buf, drops = buf[0], drops[0]
        key = _win_keys(codes_pad, seg_pad, a[0], jnp.int32(d[0]),
                        n_codes_u, W)
        key = jnp.where(d[0] > 0, key, _U64MAX)  # d=0 round padding: no-op
        dest = jnp.where(key != _U64MAX,
                         (key & jnp.uint64(n - 1)).astype(jnp.int32), n)
        dest, key = jax.lax.sort((dest, key), dimension=0, num_keys=1)
        # contiguous per-shard segments -> (n, cap_lane) send lanes by static
        # slices (no scatter); shard r's segment is [start[r], start[r+1]).
        # Pad so dynamic_slice never clamps the start (it clamps to
        # size - slice_size, which would alias every lane to offset 0 when
        # cap_lane == len(key)).
        key_pad = jnp.concatenate(
            [key, jnp.full((cap_lane,), _U64MAX, jnp.uint64)])
        starts = jnp.searchsorted(dest, jnp.arange(n + 1, dtype=jnp.int32)
                                  ).astype(jnp.int32)
        lanes = []
        dropped = jnp.uint32(0)
        for r in range(n):
            seg_len = starts[r + 1] - starts[r]
            lane = jax.lax.dynamic_slice(key_pad, (starts[r],), (cap_lane,))
            lane = jnp.where(jnp.arange(cap_lane, dtype=jnp.int32) < seg_len,
                             lane, _U64MAX)
            lanes.append(lane)
            dropped += jnp.maximum(seg_len - cap_lane, 0).astype(jnp.uint32)
        send = jnp.stack(lanes)                          # (n, cap_lane)
        if n > 1:
            recv = jax.lax.all_to_all(send, "d", split_axis=0, concat_axis=0,
                                      tiled=True)
        else:
            recv = send
        buf = jax.lax.dynamic_update_slice(buf, recv.reshape(-1),
                                           (jnp.int32(offset),))
        return buf[None], (drops + dropped)[None]

    return jax.jit(body, donate_argnums=(0, 1)), n * cap_lane


def _make_flush(mesh: Mesh):
    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P("d"), P("d"), P("d")),
                       out_specs=(P("d"), P("d"), P("d"), P("d")),
                       check_vma=False)
    def flush_body(hashes, counts, buf):
        h, c, spilled = st._merge_impl(
            hashes[0], counts[0], buf[0],
            (buf[0] != _U64MAX).astype(jnp.uint32))
        fresh = jnp.full(buf.shape[1:], _U64MAX, jnp.uint64)
        return h[None], c[None], fresh[None], spilled[None]

    return jax.jit(flush_body, donate_argnums=(0, 1, 2))


def cooccurrence_counts_dist(inc, mesh: Mesh, chunk: int = 1 << 20,
                             ) -> Tuple[np.ndarray, np.ndarray]:
    """Mesh-distributed sparse co-occurrence (phase 1).  Returns the same
    host-gathered sorted (keys, shares) — both orders — as the single-device
    ``cooccurrence_counts``."""
    n = mesh.devices.size
    sj = _ShiftJoin(inc, chunk)
    if inc.n_pairs == 0 or sj.D < 2:
        return np.zeros(0, np.uint64), np.zeros(0, np.uint32)
    W = sj.W
    # worst case a whole window routes to one shard
    cap_lane = W
    step, recv_width = _make_pair_route_step(mesh, W, inc.n_codes, cap_lane)
    flush = _make_flush(mesh)

    rounds = _round_windows(sj, n)
    lens = sj.sl
    total_pairs = int((lens * (lens - 1) // 2).sum())
    cap = _pow2(max(2 * total_pairs // n, 1 << 12))
    buf_cap = _pow2(max(4 * recv_width, 1 << 12))
    sh = NamedSharding(mesh, P("d"))
    hashes = jax.device_put(jnp.full((n, cap), _U64MAX, jnp.uint64), sh)
    counts = jax.device_put(jnp.zeros((n, cap), jnp.uint32), sh)
    buf = jax.device_put(jnp.full((n, buf_cap), _U64MAX, jnp.uint64), sh)
    drops = jax.device_put(jnp.zeros((n,), jnp.uint32), sh)
    spilled = jax.device_put(jnp.zeros((n,), jnp.uint32), sh)

    codes_r = jax.device_put(sj.codes_d, NamedSharding(mesh, P()))
    seg_r = jax.device_put(sj.seg_d, NamedSharding(mesh, P()))
    buf_n = 0
    for r in rounds:
        if buf_n + recv_width > buf_cap:
            hashes, counts, buf, sp = flush(hashes, counts, buf)
            spilled = spilled + sp
            buf_n = 0
        a = jax.device_put(np.array([x[0] for x in r], np.int64), sh)
        d = jax.device_put(np.array([x[1] for x in r], np.int32), sh)
        buf, drops = step(buf, drops, codes_r, seg_r, a, d, jnp.int32(buf_n))
        buf_n += recv_width
    if buf_n:
        hashes, counts, buf, sp = flush(hashes, counts, buf)
        spilled = spilled + sp
    if int(np.asarray(jnp.sum(drops))):
        raise RuntimeError("pair routing dropped keys (lane overflow)")
    if int(np.asarray(jnp.sum(spilled))):
        raise RuntimeError("sharded co-occurrence table spilled; raise chunk "
                           "or shard count")
    # host gather, ascending (shards partition by low bits: merge by sort).
    # Multi-process: shards on other hosts are not addressable — replicate
    # first (jit identity with replicated out-sharding inserts the all_gather)
    if not hashes.is_fully_addressable:
        rep = NamedSharding(mesh, P())
        hashes, counts = jax.jit(lambda a, b: (a, b),
                                 out_shardings=(rep, rep))(hashes, counts)
    h = np.asarray(hashes).reshape(-1)
    c = np.asarray(counts).reshape(-1)
    keep = h != U64MAX
    h, c = h[keep], c[keep]
    # mirror to both orders (keys were emitted c1 < c2 only) + device sort
    from .sparse import _mirror_sort
    return _mirror_sort(h, c, inc.n_codes)


def _make_edge_step(mesh: Mesh, W: int, n_codes: int):
    n = mesh.devices.size
    n_codes_u = jnp.uint64(max(n_codes, 1))

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P("d"), P(), P(), P(), P(), P("d"), P("d"),
                                 P()),
                       out_specs=P("d"),
                       check_vma=False)
    def body(ebuf, codes_pad, seg_pad, p_pad, fkeys, a, d, offset):
        ebuf = ebuf[0]
        n_f_u = jnp.uint64(fkeys.shape[0])
        e1, e2 = _win_edges(codes_pad, seg_pad, p_pad, a[0],
                            jnp.int32(d[0]), fkeys, n_codes_u, n_f_u, W)
        live = (d[0] > 0)
        e = jnp.where(live, jnp.concatenate([e1, e2]), _U64MAX)
        ebuf = jax.lax.dynamic_update_slice(ebuf, e, (jnp.int32(offset),))
        return ebuf[None]

    return jax.jit(body, donate_argnums=(0,))


def _make_propagate(mesh: Mesh, n_p: int, n_f: int):
    """Labels are GLOBAL forward-CSR positions (replicated across the mesh),
    so each round pointer-jumps ``lab[lab]`` locally after the pmin merge —
    O(log diameter) rounds; see cluster/sparse._propagate."""
    big = jnp.int32(2 ** 31 - 1)

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P("d"),), out_specs=P(),
                       check_vma=False)
    def prop(ebuf):
        init = jnp.arange(n_p, dtype=jnp.int32)
        # per-shard edges arrive LSM-compacted: ascending (= p-major) with
        # U64MAX pads at the end — no sort needed here
        e = ebuf[0]
        nf_u = jnp.uint64(max(n_f, 1))
        valid = e != _U64MAX
        p_sorted = jnp.where(valid, (e // nf_u).astype(jnp.int32), n_p)
        f_by_p = jnp.where(valid, (e % nf_u).astype(jnp.int32), n_f)
        # f-major order for the other segment_min
        fkey = jnp.where(valid,
                         (e % nf_u) * jnp.uint64(n_p) + (e // nf_u), _U64MAX)
        fkey = jnp.sort(fkey)
        fvalid = fkey != _U64MAX
        f_sorted = jnp.where(fvalid, (fkey // jnp.uint64(n_p))
                             .astype(jnp.int32), n_f)
        p_by_f = jnp.where(fvalid, (fkey % jnp.uint64(n_p))
                           .astype(jnp.int32), n_p)

        def cond(state):
            return state[1]

        def body(state):
            lab, _ = state
            part_f = jax.ops.segment_min(
                lab[jnp.minimum(p_by_f, n_p - 1)], f_sorted,
                num_segments=n_f + 1, indices_are_sorted=True)[:n_f]
            f_lab = jax.lax.pmin(part_f, "d")
            part_p = jax.ops.segment_min(
                f_lab[jnp.minimum(f_by_p, n_f - 1)], p_sorted,
                num_segments=n_p + 1, indices_are_sorted=True)[:n_p]
            back = jax.lax.pmin(part_p, "d")
            new = jnp.minimum(lab, jnp.minimum(back, big))
            new = jnp.minimum(new, new[new])   # pointer jump x2 (local:
            new = jnp.minimum(new, new[new])   # labels are replicated)
            changed = jax.lax.pmax(jnp.any(new != lab).astype(jnp.int32),
                                   "d") > 0
            return (new, changed)

        lab, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True)))
        return lab

    return jax.jit(prop)


def _make_propagate_block(mesh: Mesh, blk_pad: int, n_f: int, e_blk: int):
    """Block variant of :func:`_make_propagate` for lanes whose full label
    vector does not fit replicated (SCALING.md phase 3, config #5): labels
    cover only positions [p0, p0 + blk_pad); each shard contributes the
    contiguous slice of its p-sorted edge table that falls in the block
    (host-verified to fit e_blk).  Blocks must align to barcode boundaries —
    components never cross barcodes, so every label stays inside its block
    and the pointer jump stays local."""
    big = jnp.int32(2 ** 31 - 1)

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P("d"), P("d"), P(), P()), out_specs=P(),
                       check_vma=False)
    def prop(ebuf, lo, p0, p1):
        nf_u = jnp.uint64(max(n_f, 1))
        p0i = p0.astype(jnp.int32)
        # dynamic_slice clamps the start near the row end; the explicit key-
        # range mask below drops any pulled-in out-of-block edges (which sit
        # at the FRONT of the slice, so p_loc is NOT sorted — segment ids are
        # passed unsorted)
        e = jax.lax.dynamic_slice(ebuf[0], (lo[0],), (e_blk,))
        valid = (e >= p0.astype(jnp.uint64) * nf_u) & \
                (e < p1.astype(jnp.uint64) * nf_u) & (e != _U64MAX)
        p_loc = jnp.where(valid, (e // nf_u).astype(jnp.int32) - p0i, blk_pad)
        f_by_p = jnp.where(valid, (e % nf_u).astype(jnp.int32), n_f)
        fkey = jnp.where(valid, (e % nf_u) * jnp.uint64(blk_pad)
                         + jnp.where(valid, p_loc, 0).astype(jnp.uint64),
                         _U64MAX)
        fkey = jnp.sort(fkey)
        fvalid = fkey != _U64MAX
        f_sorted = jnp.where(fvalid, (fkey // jnp.uint64(blk_pad))
                             .astype(jnp.int32), n_f)
        p_by_f = jnp.where(fvalid, (fkey % jnp.uint64(blk_pad))
                           .astype(jnp.int32), blk_pad)
        init = p0i + jnp.arange(blk_pad, dtype=jnp.int32)

        def jump(lab):
            # labels are global positions INSIDE the block: gather locally
            j = jnp.clip(lab - p0i, 0, blk_pad - 1)
            return jnp.minimum(lab, lab[j])

        def cond(state):
            return state[1]

        def body(state):
            lab, _ = state
            part_f = jax.ops.segment_min(
                lab[jnp.minimum(p_by_f, blk_pad - 1)], f_sorted,
                num_segments=n_f + 1, indices_are_sorted=True)[:n_f]
            f_lab = jax.lax.pmin(part_f, "d")
            part_p = jax.ops.segment_min(
                f_lab[jnp.minimum(f_by_p, n_f - 1)], p_loc,
                num_segments=blk_pad + 1)[:blk_pad]
            back = jax.lax.pmin(part_p, "d")
            new = jnp.minimum(lab, jnp.minimum(back, big))
            new = jump(jump(new))
            changed = jax.lax.pmax(jnp.any(new != lab).astype(jnp.int32),
                                   "d") > 0
            return (new, changed)

        lab, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True)))
        return lab

    return jax.jit(prop)


def _propagate_blocks(inc, mesh: Mesh, ehashes, n_f: int,
                      target_pairs: int) -> np.ndarray:
    """Run the label fixpoint block by block (barcode-aligned position
    ranges).  Per-block device state is the block's label vector plus each
    shard's contiguous slice of its p-sorted edge table; block and edge
    widths bucket to powers of two so few fixpoint programs compile."""
    blocks = _label_blocks(inc, target_pairs)
    n = mesh.devices.size
    sh = NamedSharding(mesh, P("d"))
    nf_u = np.uint64(max(n_f, 1))
    # per-shard edge counts per block boundary, one device pass
    bounds = np.array([b[0] for b in blocks] + [blocks[-1][1]],
                      np.uint64) * nf_u

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=(P("d"), P()),
                       out_specs=P("d"), check_vma=False)
    def find_bounds(eh, b):
        return jnp.searchsorted(eh[0], b).astype(jnp.int64)[None]

    starts = np.asarray(jax.jit(find_bounds)(ehashes, jnp.asarray(bounds)))
    glob = np.empty(inc.n_pairs, np.int64)
    props = {}
    for i, (p0, p1) in enumerate(blocks):
        blk_pad = _pow2(max(p1 - p0, 8))
        e_blk = _pow2(max(int((starts[:, i + 1] - starts[:, i]).max()), 8))
        key = (blk_pad, e_blk)
        if key not in props:
            props[key] = _make_propagate_block(mesh, blk_pad, n_f, e_blk)
        lab = props[key](ehashes,
                         jax.device_put(starts[:, i].copy(), sh),
                         jnp.int64(p0), jnp.int64(p1))
        glob[p0:p1] = np.asarray(lab)[:p1 - p0]
    return glob


def _label_blocks(inc, target_pairs: int):
    """Barcode-aligned position blocks of ~target_pairs each: (p0, p1) list."""
    offs = inc.code_offsets
    blocks = []
    start = 0
    for c in range(inc.n_codes):
        if offs[c + 1] - start >= target_pairs:
            blocks.append((int(start), int(offs[c + 1])))
            start = int(offs[c + 1])
    if start < inc.n_pairs:
        blocks.append((int(start), int(inc.n_pairs)))
    return blocks or [(0, int(inc.n_pairs))]


def cluster_codes_sparse_dist(inc, mesh: Mesh, min_friend_share: int = 8,
                              chunk: int = 1 << 20, flat: bool = False,
                              label_block_pairs: int = 0):
    """Mesh-distributed ``cluster_codes_sparse`` — identical labels, device
    memory and sweep work split over the mesh.

    label_block_pairs > 0: propagate in barcode-aligned position blocks of
    roughly that many pairs (labels and per-iteration state sized per block,
    not per lane — the config-#5 path where a replicated (n_pairs,) label
    vector no longer fits; see SCALING.md phase 3)."""
    keys, shares = cooccurrence_counts_dist(inc, mesh, chunk=chunk)
    fkeys = friend_pairs(keys, shares, min_friend_share)
    if len(fkeys) == 0 or inc.n_pairs == 0:
        canon = canonical_ranks(inc, _local_indices(inc)) \
            if inc.n_pairs else np.zeros(0, np.int32)
    else:
        n = mesh.devices.size
        sj = _ShiftJoin(inc, chunk)
        W = sj.W
        rep = NamedSharding(mesh, P())
        sh = NamedSharding(mesh, P("d"))
        codes_r = jax.device_put(sj.codes_d, rep)
        seg_r = jax.device_put(sj.seg_d, rep)
        p_pad = jax.device_put(jnp.asarray(np.concatenate(
            [_forward_positions(inc)[sj.pos_old],
             np.zeros(sj.W, np.int64)]).astype(np.int64)), rep)
        fkeys_r = jax.device_put(jnp.asarray(fkeys), rep)
        rounds = _round_windows(sj, n)
        # stream edges through per-shard LSM tables instead of one
        # 2W x rounds buffer (mostly U64MAX pads at scale): per-device memory
        # is then ∝ its REAL edge count.  Edges are unique per (p, f), so the
        # flush's dedup is a no-op compaction; spills are counted and raise.
        e_cap = _pow2(max(8 * inc.n_pairs // n, 1 << 12))
        buf_cap = _pow2(max(8 * 2 * W, 1 << 12))
        ehashes = jax.device_put(jnp.full((n, e_cap), _U64MAX, jnp.uint64), sh)
        ecounts = jax.device_put(jnp.zeros((n, e_cap), jnp.uint32), sh)
        ebuf = jax.device_put(jnp.full((n, buf_cap), _U64MAX, jnp.uint64), sh)
        espill = jax.device_put(jnp.zeros((n,), jnp.uint32), sh)
        eflush = _make_flush(mesh)
        estep = _make_edge_step(mesh, W, inc.n_codes)
        off = 0
        for r in rounds:
            if off + 2 * W > buf_cap:
                ehashes, ecounts, ebuf, sp = eflush(ehashes, ecounts, ebuf)
                espill = espill + sp
                off = 0
            a = jax.device_put(np.array([x[0] for x in r], np.int64), sh)
            d = jax.device_put(np.array([x[1] for x in r], np.int32), sh)
            ebuf = estep(ebuf, codes_r, seg_r, p_pad, fkeys_r, a, d,
                         jnp.int32(off))
            off += 2 * W
        if off:
            ehashes, ecounts, ebuf, sp = eflush(ehashes, ecounts, ebuf)
            espill = espill + sp
        if int(np.asarray(jnp.sum(espill))):
            raise RuntimeError("distributed cluster edge table spilled; "
                               "raise shard count or edge capacity")
        if label_block_pairs:
            glob = _propagate_blocks(inc, mesh, ehashes, len(fkeys),
                                     label_block_pairs)
        else:
            prop = _make_propagate(mesh, inc.n_pairs, len(fkeys))
            glob = np.asarray(prop(ehashes)).astype(np.int64)
        code_of_p = np.repeat(np.arange(inc.n_codes, dtype=np.int64),
                              np.diff(inc.code_offsets))
        labels = (glob - inc.code_offsets[code_of_p]).astype(np.int32)
        canon = canonical_ranks(inc, labels)
    if flat:
        return canon
    return [canon[inc.code_offsets[c]:inc.code_offsets[c + 1]]
            for c in range(inc.n_codes)]
