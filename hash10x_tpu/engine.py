"""Single-host pipeline engine: the stateful core behind the CLI.

Mirrors the reference's command-driven global state (``hash10x.c:~main`` — commands
execute sequentially against one shared table/code-table state, SURVEY.md §3.1 #1,
§4.1/§4.2 call stacks), re-expressed as an object whose methods are the commands:

    Engine.count(fqb)        ~ --readFQB       (count pass)
    Engine.histogram()       ~ --hashDist
    Engine.info()            ~ --hashInfo
    Engine.filter(lo, hi)    ~ count-band "good k-mer" selection
    Engine.incidence(fqb)    ~ code-table build (second pass over reads)
    Engine.cluster(...)      ~ --codeClusters
    Engine.split()           ~ --clusterSplit
    Engine.report(out)       ~ --clusterReport
    Engine.save/load(path)   ~ --writeHash/--readHash (checkpoint/resume, §6)

Device work (sketching, count table, clustering) runs in fixed-shape jit batches;
reads are grouped so one barcode never straddles a batch, which makes per-batch
(hash, barcode) dedup exact — count semantics are *barcode counts* (``count_mode=
"barcodes"``, the k-mer x barcode table of BASELINE.json) or raw occurrences
(``count_mode="occurrences"``, config #1's pure count table).
"""

from __future__ import annotations

import json
import sys
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .hashspec import HashSpec, U64MAX
from .core import seqhash_jnp
from .kernels import minimizer_pallas
from .table import sorted_table as st
from .table.incidence import (Incidence, build_incidence,
                              incidence_from_sorted_pairs, pair_keys_jit)
from .cluster import cooccur
from .io.fqb import Fqb
from .utils.timing import StageTimer

__all__ = ["Engine", "EngineConfig", "coverage_peaks"]


def coverage_peaks(hist: np.ndarray, min_frac: float = 0.05):
    """Local maxima of the (lightly smoothed) count histogram — the coverage
    peaks the reference prints to guide band selection (error / het / hom /
    repeat — SURVEY.md §3.1 #7).  Returns [(count, height)] by count."""
    h = hist.astype(np.float64)
    if len(h) < 4:
        return []
    sm = h.copy()
    sm[1:-1] = (h[:-2] + 2 * h[1:-1] + h[2:]) / 4.0
    peaks = []
    hi = sm[1:].max() if len(sm) > 1 else 0
    for c in range(2, len(sm) - 1):
        if sm[c] >= sm[c - 1] and sm[c] > sm[c + 1] and sm[c] >= min_frac * hi:
            peaks.append((c, int(hist[c])))
    return peaks


@dataclass
class EngineConfig:
    spec: HashSpec = field(default_factory=HashSpec)
    mode: str = "minimizer"          # kmer | minimizer | modimizer | syncmer
    modulus: int = 0                  # modimizer modulus (0 => w)
    syncmer_s: int = 0                # syncmer s-mer size (mode == "syncmer")
    table_bits: int = 22          # initial capacity 2^bits entries (auto-grows)
    batch_reads: int = 4096
    count_mode: str = "barcodes"     # barcodes | occurrences
    min_count: int = 2
    max_count: int = 64
    cluster_mode: str = "friend"     # friend (scalable) | pair (O(K^2) contract)
    min_share: int = 2               # pair mode: per-kmer-pair other-barcode support
    min_friend_share: int = 8        # friend mode: barcode-share threshold
    max_friends: int = 0             # 0 = uncapped (scatter-propagation path)
    use_kernel: bool = True          # Pallas sketch kernel when shapes allow
    emission_cap_factor: int = 4     # per-read emission cap = factor * expected
                                     # (0 disables compaction); overflow raises
    n_shards: int = 1                # >1: count pass runs sharded over a device
                                     # mesh (dist/sharded_sorted); downstream
                                     # commands consume the gathered table


class Engine:
    def __init__(self, cfg: EngineConfig, log=sys.stderr):
        self.cfg = cfg
        self.table: Optional[st.SortedTable] = None
        self.retained_hashes: Optional[np.ndarray] = None
        self.retained_counts: Optional[np.ndarray] = None
        self.inc: Optional[Incidence] = None
        self.clusters: Optional[List[np.ndarray]] = None
        self.split_inc: Optional[Incidence] = None
        self.split_origin: Optional[np.ndarray] = None
        self.n_reads_counted = 0
        self._read_len = 0
        self._cap_overflow = jnp.zeros((), jnp.int64)
        self.timer = StageTimer(log)

    # -- batching ------------------------------------------------------------------

    def _batches(self, fqb: Fqb):
        """Yield (packed, nmask, lengths, barcode_ids, group) batches of fixed
        size, grouped so one barcode never straddles a batch (padding rows have
        length 0, barcode -1).  nmask is None for batches with no invalid (N)
        bases.  A barcode with more reads than a batch CAN'T be batch-aligned:
        its reads stream alone as consecutive batches sharing a non-None group
        id, and the consumer dedups across the group (count) or is order-
        invariant anyway (incidence's global pair dedup)."""
        bsz = self.cfg.batch_reads
        order = np.argsort(fqb.barcode_ids, kind="stable")
        packed_all = fqb.packed[order]
        lengths_all = fqb.lengths[order]
        bc_all = fqb.barcode_ids[order]
        nmask_all = fqb.nmask[order] if fqb.nmask is not None else None
        n = len(bc_all)
        # batch boundaries aligned to barcode boundaries
        spans = []  # (a, b, group_id or None)
        i = 0
        gid = 0
        while i < n:
            j = min(i + bsz, n)
            if j < n:
                # retreat to the start of the straddling barcode
                jb = j
                while jb > i and bc_all[jb - 1] == bc_all[j] and bc_all[j] != -1:
                    jb -= 1
                if jb > i:
                    j = jb
                elif bc_all[j] != -1 and bc_all[i] == bc_all[j]:
                    # oversized barcode: stream it alone as a tagged group
                    e = i
                    while e < n and bc_all[e] == bc_all[i]:
                        e += 1
                    gid += 1
                    for a in range(i, e, bsz):
                        spans.append((a, min(a + bsz, e), gid))
                    i = e
                    continue
            spans.append((i, j, None))
            i = j
        W = packed_all.shape[1]
        import jax
        pending = None
        for a, b, g in spans:
            m = b - a
            packed = np.zeros((bsz, W), np.uint32)
            lengths = np.zeros(bsz, np.int32)
            bcs = np.full(bsz, -1, np.int32)
            packed[:m] = packed_all[a:b]
            lengths[:m] = lengths_all[a:b]
            bcs[:m] = bc_all[a:b]
            nmask = None
            if nmask_all is not None and nmask_all[a:b].any():
                nmask = np.zeros((bsz, nmask_all.shape[1]), np.uint32)
                nmask[:m] = nmask_all[a:b]
            nxt = (jax.device_put(packed), nmask, lengths, bcs, g)
            if pending is not None:
                yield pending
            pending = nxt
        if pending is not None:
            yield pending

    def _sketch_flat(self, packed, nmask, lengths, bcs):
        """Sketch one batch -> flat (hashes u64 (M,), bc int32 (M,)) with U64MAX pads.

        Batches arrive 2-bit packed (4x smaller transfers); unpack runs on
        device.  Uses the fused Pallas kernel for the minimizer path when shapes
        allow; batches containing short reads (0 < P_i < w, which the kernel
        skips) or invalid (N) bases (the kernel needs codes in [0,3]) fall back
        to the jnp path so emission stays exact."""
        from .core.encode import unpack_2bit_jnp
        spec = self.cfg.spec
        codes = unpack_2bit_jnp(packed, self._read_len, nmask)
        P_i = lengths - spec.k + 1
        has_short = bool(((P_i > 0) & (P_i < spec.w)).any())
        if (self.cfg.use_kernel and self.cfg.mode == "minimizer"
                and not has_short and nmask is None
                and minimizer_pallas.supported(spec, codes.shape)):
            h, _, emit = minimizer_pallas.sketch_minimizer(spec, codes, lengths)
        else:
            h, _, emit = seqhash_jnp.sketch(spec, codes, lengths,
                                            mode=self.cfg.mode, m=self.cfg.modulus,
                                            syncmer_s=self.cfg.syncmer_s)
        P = h.shape[1]
        keyed = jnp.where(emit, h, jnp.uint64(U64MAX))
        cf = self.cfg.emission_cap_factor
        if cf and self.cfg.mode == "minimizer" and spec.w > 1:
            # compact emissions per read: row sort brings emitted hashes to the
            # front; cap with exact overflow accounting (checked after count())
            cap = min(P, cf * (2 * P // (spec.w + 1)) + cf)
            packed = jnp.sort(keyed, axis=1)[:, :cap]
            self._cap_overflow = self._cap_overflow + jnp.sum(
                emit.sum(axis=1) > cap)
            flat_h = packed.reshape(-1)
            flat_bc = jnp.broadcast_to(jnp.asarray(bcs)[:, None],
                                       (len(bcs), cap)).reshape(-1)
            return flat_h, flat_bc
        flat_h = keyed.reshape(-1)
        flat_bc = jnp.broadcast_to(jnp.asarray(bcs)[:, None], (len(bcs), P)).reshape(-1)
        return flat_h, flat_bc

    # -- table plumbing (sorted-run table with host-scheduled flush/growth) --------

    def _ensure_table(self, emission_width: int) -> None:
        if self.table is None:
            cap = 1 << self.cfg.table_bits
            buf_cap = max(cap, 1 << (emission_width - 1).bit_length())
            self.table = st.make_sorted_table(cap, buf_cap)

    def _append(self, flat_h: jnp.ndarray) -> None:
        t = self.table
        n = flat_h.shape[0]
        if t.buf_n + n > t.buf.shape[0]:
            t = st.flush(t)
            if int(np.asarray(t.spilled)):
                raise RuntimeError(
                    f"count table spilled {int(np.asarray(t.spilled))} kmers; "
                    "raise --tableBits")
            if int(np.asarray(t.n_filled)) > 0.75 * t.capacity:
                t = st.grow(t, t.capacity * 2,
                            buf_capacity=max(t.buf.shape[0], t.capacity))
                if self.timer.log is not None:
                    self.timer.log.write(
                        f"[table grown to {t.capacity} entries]\n")
        self.table = st.append(t, flat_h)

    def _flushed(self) -> st.SortedTable:
        if self.table is None:
            self._ensure_table(1)
        self.table = st.flush(self.table)
        return self.table

    # -- commands ------------------------------------------------------------------

    @staticmethod
    @jax.jit
    def _dedup_pairs(flat_h, flat_bc):
        """Per-batch (hash, barcode) dedup: non-first duplicates -> U64MAX."""
        order = jnp.lexsort((flat_bc, flat_h))
        hs = flat_h[order]
        bs = flat_bc[order]
        first = jnp.concatenate([jnp.ones((1,), bool),
                                 (hs[1:] != hs[:-1]) | (bs[1:] != bs[:-1])])
        first = first & (bs >= 0)
        return jnp.where(first, hs, jnp.uint64(U64MAX))

    def _finish_group(self, gtab: "st.SortedTable") -> None:
        """Flush an oversized-barcode dedup table into the main count table:
        its compacted keys are the barcode's distinct hashes, each appended
        once (padded to a power of two so append shapes stay cacheable)."""
        gtab = st.flush(gtab)
        if int(np.asarray(gtab.spilled)):
            raise RuntimeError("oversized-barcode dedup table spilled; "
                               "raise --tableBits")
        keys, _ = st.compact(gtab)
        if len(keys) == 0:
            return
        padded = np.full(1 << (len(keys) - 1).bit_length(), U64MAX, np.uint64)
        padded[:len(keys)] = keys
        self._ensure_table(len(padded))
        self._append(jnp.asarray(padded))

    def count(self, fqb: Fqb) -> None:
        """Count pass: stream reads through the sketch into the count table.

        Oversized barcodes (more reads than a batch) arrive as tagged batch
        groups; in barcodes mode their hashes dedup across the group through a
        side sorted-table before entering the main table, so counts stay exact
        (the round-1 path raised instead — real lanes contain pathological
        barcodes)."""
        if self.cfg.n_shards > 1:
            return self._count_sharded(fqb)
        self._read_len = fqb.read_len
        self._cap_overflow = jnp.zeros((), jnp.int64)
        cur_gid, gtab = None, None
        for packed, nmask, lengths, bcs, gid in self._batches(fqb):
            flat_h, flat_bc = self._sketch_flat(packed, nmask, lengths, bcs)
            self._ensure_table(flat_h.shape[0])
            if gid != cur_gid and gtab is not None:
                self._finish_group(gtab)
                gtab = None
            cur_gid = gid
            if self.cfg.count_mode == "barcodes":
                hs = self._dedup_pairs(flat_h, flat_bc)
                if gid is not None:
                    # oversized barcode: dedup across its batches via a side
                    # table; distinct hashes enter the main table at group end
                    if gtab is None:
                        w = int(hs.shape[0])
                        gtab = st.make_sorted_table(2 * w, 2 * w)
                    if gtab.buf_n + hs.shape[0] > gtab.buf.shape[0]:
                        gtab = st.flush(gtab)
                        if int(np.asarray(gtab.n_filled)) > 0.75 * gtab.capacity:
                            gtab = st.grow(gtab, gtab.capacity * 2)
                    gtab = st.append(gtab, hs)
                else:
                    self._append(hs)
            else:
                self._append(flat_h)
            self.n_reads_counted += int((lengths > 0).sum())
        if gtab is not None:
            self._finish_group(gtab)
        if int(np.asarray(self._cap_overflow)):
            raise RuntimeError(
                f"{int(np.asarray(self._cap_overflow))} reads exceeded the "
                "per-read emission cap; raise emission_cap_factor")
        t = self._flushed()
        self.timer.stage(f"count: {self.n_reads_counted} reads, "
                         f"{int(np.asarray(t.n_filled))} kmers, "
                         f"spilled {int(np.asarray(t.spilled))}")

    def _count_sharded(self, fqb: Fqb) -> None:
        """Sharded count pass (SURVEY.md §3.2): DP read batches over the mesh,
        all_to_all emission routing to hash-owner shards, shard-parallel sorted
        flushes; the gathered global table feeds the unchanged downstream
        commands."""
        from .dist import sharded as D
        from .dist import sharded_sorted as DS
        cfg = self.cfg
        if cfg.batch_reads % cfg.n_shards:
            raise ValueError("batch_reads must be divisible by n_shards")
        self._read_len = fqb.read_len
        mesh = D.make_mesh(cfg.n_shards)
        cap = max((1 << cfg.table_bits) // cfg.n_shards, 1 << 14)
        step = DS.make_sorted_count_step(
            cfg.spec, mesh, mode=cfg.mode, modulus=cfg.modulus,
            use_kernel=cfg.use_kernel, packed_read_len=fqb.read_len,
            count_mode=cfg.count_mode,
            emission_cap_factor=cfg.emission_cap_factor,
            syncmer_s=cfg.syncmer_s)
        # per-shard buffer must hold at least a few steps' received lanes
        width = step.recv_width(cfg.batch_reads, fqb.read_len)
        dt = DS.ShardedSortedTable(mesh, cap, max(cap * 2, 2 * width),
                                   spec=cfg.spec)
        for packed, nmask, lengths, bcs, gid in self._batches(fqb):
            if gid is not None and cfg.count_mode == "barcodes":
                raise RuntimeError(
                    "a barcode has more reads than --batchReads; the sharded "
                    "count path dedups per step only — raise --batchReads "
                    "(the single-device path handles oversized barcodes)")
            dt = step(dt, packed, lengths, bcs, nmask=nmask)
            self.n_reads_counted += int((lengths > 0).sum())
        dt = step.finish(dt)
        drops = int(np.asarray(dt.route_drops).sum())
        if drops:
            raise RuntimeError(f"sharded count dropped {drops} emissions "
                               "(lane/cap overflow); raise lane capacity")
        if int(np.asarray(dt.spilled).sum()):
            raise RuntimeError("sharded table spilled; raise --tableBits")
        gh, gc = DS.gather_sorted_compact(dt)
        need = 1 << max(int(len(gh)).bit_length(), 14)
        self._ensure_table(1)
        if self.table.capacity < need:
            self.table = st.grow(self.table, need)
        self.table = st.merge_counts(self._flushed(), gh, gc)
        self.timer.stage(f"count[sharded x{cfg.n_shards}]: "
                         f"{self.n_reads_counted} reads, {len(gh)} kmers")

    def histogram(self, max_count: int = 256) -> np.ndarray:
        t = self._flushed()
        return np.asarray(st.count_histogram(t.hashes, t.counts, max_count))

    def info(self, out=sys.stdout) -> None:
        hist = self.histogram()
        t = self.table
        total = int(hist.sum())
        out.write(f"table slots {t.capacity} kmers {int(np.asarray(t.n_filled))} "
                  f"overflow {int(np.asarray(t.spilled))}\n")
        nz = np.nonzero(hist)[0]
        if len(nz):
            out.write(f"count range [{nz.min()}, {nz.max()}] distinct kmers {total}\n")
        for c, h in coverage_peaks(hist):
            out.write(f"peak count {c} kmers {h}\n")

    def write_histogram(self, out=sys.stdout, max_count: int = 256) -> None:
        hist = self.histogram(max_count)
        for c in np.nonzero(hist)[0]:
            out.write(f"{c}\t{int(hist[c])}\n")

    def error_fix(self, max_count: int = 1) -> None:
        """Drop error-band k-mers (count <= max_count) from the table.

        Reconstructed-minimal model of the reference's optional errorFix
        (SURVEY.md §3.1 #12, [L] confidence): the table stores only hash values,
        which the multiplicative mix makes non-invertible, so neighbor-based
        re-assignment is impossible for the reference too — deleting the error
        band is the implementable semantic."""
        t = self._flushed()
        before = int(np.asarray(t.n_filled))
        self.table = st.prune(t, max_count + 1)
        after = int(np.asarray(self.table.n_filled))
        self.timer.stage(f"errorFix: dropped {before - after} kmers "
                         f"with count <= {max_count}")

    def filter(self, min_count: int = 0, max_count: int = 0) -> None:
        """Keep "good" k-mers whose count lies in the band (SURVEY.md §3.1 #5)."""
        lo = min_count or self.cfg.min_count
        hi = max_count or self.cfg.max_count
        self.retained_hashes, self.retained_counts = st.compact(self._flushed(), lo, hi)
        self.timer.stage(f"filter [{lo},{hi}]: {len(self.retained_hashes)} kmers kept")

    def incidence(self, fqb: Fqb) -> None:
        """Second pass: build the deduplicated k-mer x barcode incidence.

        Device-resident end to end: per batch, hashes map to retained-set ranks
        and fuse with barcodes into u64 pair keys (``pair_keys_jit``); keys
        dedup through the same LSM sorted-run machinery as the count pass; CSR
        assembly is vectorized searchsorted on device
        (``incidence_from_sorted_pairs``)."""
        if self.retained_hashes is None:
            self.filter()
        self._read_len = fqb.read_len
        self._cap_overflow = jnp.zeros((), jnp.int64)
        n_kmers = len(self.retained_hashes)
        retained_d = jnp.asarray(self.retained_hashes)
        nk_u = jnp.uint64(max(n_kmers, 1))
        pt = None
        # group tags are irrelevant here: the pair table dedups globally
        for packed, nmask, lengths, bcs, _gid in self._batches(fqb):
            flat_h, flat_bc = self._sketch_flat(packed, nmask, lengths, bcs)
            keys = pair_keys_jit(retained_d, flat_h, flat_bc, nk_u)
            n = int(keys.shape[0])
            if pt is None:
                cap = max(1 << self.cfg.table_bits,
                          1 << (2 * n - 1).bit_length())
                pt = st.make_sorted_table(cap, max(cap, 2 * n))
            if pt.buf_n + n > pt.buf.shape[0]:
                pt = st.flush(pt)
                if int(np.asarray(pt.spilled)):
                    raise RuntimeError("incidence pair table spilled; "
                                       "raise --tableBits")
                if int(np.asarray(pt.n_filled)) > 0.75 * pt.capacity:
                    pt = st.grow(pt, pt.capacity * 2,
                                 buf_capacity=max(pt.buf.shape[0], pt.capacity))
            pt = st.append(pt, keys)
        if int(np.asarray(self._cap_overflow)):
            raise RuntimeError(
                f"{int(np.asarray(self._cap_overflow))} reads exceeded the "
                "per-read emission cap during incidence; raise "
                "emission_cap_factor")
        if pt is None:
            pair_keys = np.zeros(0, np.uint64)
        else:
            pt = st.flush(pt)
            if int(np.asarray(pt.spilled)):
                raise RuntimeError("incidence pair table spilled; "
                                   "raise --tableBits")
            pair_keys, _ = st.compact(pt)
        self.inc = incidence_from_sorted_pairs(
            pair_keys, n_kmers=n_kmers, n_codes=fqb.n_barcodes)
        self.timer.stage(f"incidence: {self.inc.n_pairs} pairs, "
                         f"{self.inc.n_codes} codes x {self.inc.n_kmers} kmers")

    def cluster(self, min_share: int = 0) -> None:
        """Per-barcode molecule clustering (``--codeClusters``)."""
        if self.inc is None:
            raise RuntimeError("cluster requires incidence (run incidence first)")
        cfg = self.cfg
        self.clusters = cooccur.cluster_codes(
            self.inc, min_share=min_share or cfg.min_share, mode=cfg.cluster_mode,
            min_friend_share=cfg.min_friend_share, max_friends=cfg.max_friends)
        n_cl = sum(int(c.max()) + 1 if len(c) else 0 for c in self.clusters)
        self.timer.stage(f"cluster: {n_cl} molecules over {self.inc.n_codes} codes")

    def _cluster_flat(self) -> np.ndarray:
        """Cluster labels as one flat array aligned with inc.code_kmers."""
        if self.inc.n_pairs == 0:
            return np.zeros(0, np.int32)
        return np.concatenate(self.clusters)

    def _code_of_pair(self) -> np.ndarray:
        inc = self.inc
        return np.repeat(np.arange(inc.n_codes, dtype=np.int64),
                         np.diff(inc.code_offsets))

    def split(self) -> None:
        """Remap (code, cluster) -> new codes (``--clusterSplit``).

        Fully vectorized (no per-code Python loop — a wall at 1M+ codes): new
        code ids are the dense ranks of distinct (code, label) pairs in
        (code, label)-ascending order, exactly the oracle's ``split_codes``
        numbering."""
        if self.clusters is None:
            raise RuntimeError("split requires clusters")
        inc = self.inc
        flat = self._cluster_flat().astype(np.int64)
        if inc.n_pairs == 0:
            self.split_inc = Incidence(inc.n_kmers, 0, np.zeros(1, np.int64),
                                       np.zeros(0, np.int32),
                                       np.zeros(inc.n_kmers + 1, np.int64),
                                       np.zeros(0, np.int32))
            self.split_origin = np.zeros((0, 2), np.int32)
            self.timer.stage("split: 0 molecule codes")
            return
        code_of_p = self._code_of_pair()
        K = int(flat.max()) + 1
        combined = code_of_p * K + flat
        uniq = np.unique(combined)
        new_code = np.searchsorted(uniq, combined).astype(np.int32)
        self.split_inc = build_incidence(
            inc.code_kmers.astype(np.int32), new_code,
            n_kmers=inc.n_kmers, n_codes=len(uniq))
        self.split_origin = np.stack(
            [(uniq // K).astype(np.int32), (uniq % K).astype(np.int32)], axis=1)
        self.timer.stage(f"split: {len(uniq)} molecule codes")

    def write_counts(self, out=sys.stdout) -> None:
        """Dump the full (hash, count) table as text, hash-ascending — the
        diffable surface for oracle differential tests against the reference
        binary (SURVEY.md §5 item 1)."""
        h, c = st.compact(self._flushed())
        for hv, cv in zip(h.tolist(), c.tolist()):
            out.write(f"{hv:x}\t{cv}\n")

    def write_clusters(self, out=sys.stdout) -> None:
        """Dump cluster assignments: one line per (code, kmer hash, cluster).
        Columns are precomputed vectorized; only the final text join touches
        Python per line."""
        if self.clusters is None:
            raise RuntimeError("write_clusters requires clusters")
        rh = self.retained_hashes
        codes = self._code_of_pair()
        hashes = rh[self.inc.code_kmers]
        labels = self._cluster_flat()
        out.write("".join(
            f"{c}\t{h:x}\t{l}\n" for c, h, l in
            zip(codes.tolist(), hashes.tolist(), labels.tolist())))

    def report(self, out=sys.stdout) -> None:
        """Cluster report (``--clusterReport``): diffable text.  All counts are
        computed vectorized over the flat label array (the per-code Python loop
        was O(n_codes) numpy calls — minutes at 1M codes)."""
        if self.clusters is None:
            raise RuntimeError("report requires clusters")
        inc = self.inc
        n_kmers_per_code = np.diff(inc.code_offsets)
        flat = self._cluster_flat().astype(np.int64)
        if inc.n_pairs:
            code_of_p = self._code_of_pair()
            K = int(flat.max()) + 1
            combined = code_of_p * K + flat
            uniq, cluster_sizes = np.unique(combined, return_counts=True)
            cl_code = uniq // K
            n_clusters = np.bincount(cl_code, minlength=inc.n_codes)
        else:
            uniq = np.zeros(0, np.int64)
            cluster_sizes = np.zeros(0, np.int64)
            cl_code = np.zeros(0, np.int64)
            n_clusters = np.zeros(inc.n_codes, np.int64)
        cl_starts = np.concatenate([[0], np.cumsum(n_clusters)])
        sizes_list = cluster_sizes.tolist()
        lines = []
        for c in range(inc.n_codes):
            a, b = cl_starts[c], cl_starts[c + 1]
            lines.append(
                f"code {c} nKmers {n_kmers_per_code[c]} nClusters "
                f"{n_clusters[c]} sizes {','.join(map(str, sizes_list[a:b]))}\n")
        out.write("".join(lines))

    # -- checkpoint / resume (the .hash file analog, SURVEY.md §3.1 #11) -----------

    def save(self, path) -> None:
        """Persist the FULL analysis state: count table, retained band (hashes +
        counts), incidence CSR, cluster labels, and split state — so the
        reference's ``--readHash → --clusterReport`` resume workflow (SURVEY.md
        §4.2) works with no reads on disk."""
        meta = {"spec": json.loads(self.cfg.spec.to_json()), "mode": self.cfg.mode,
                "count_mode": self.cfg.count_mode, "n_reads": self.n_reads_counted,
                "version": 2}
        h, c = st.compact(self._flushed())
        parts = {"hashes": h, "counts": c}
        if self.retained_hashes is not None:
            parts["retained"] = self.retained_hashes
            parts["retained_counts"] = (
                self.retained_counts if self.retained_counts is not None
                else np.zeros(0, np.uint32))
        if self.inc is not None:
            parts.update(inc_code_offsets=self.inc.code_offsets,
                         inc_code_kmers=self.inc.code_kmers,
                         inc_kmer_offsets=self.inc.kmer_offsets,
                         inc_kmer_codes=self.inc.kmer_codes)
            meta["inc_shape"] = [self.inc.n_kmers, self.inc.n_codes]
        if self.clusters is not None:
            # labels align with inc.code_kmers (per-code arrays in code order)
            parts["cluster_labels"] = (
                np.concatenate(self.clusters) if self.inc.n_pairs
                else np.zeros(0, np.int32))
        if self.split_inc is not None:
            parts.update(split_code_offsets=self.split_inc.code_offsets,
                         split_code_kmers=self.split_inc.code_kmers,
                         split_kmer_offsets=self.split_inc.kmer_offsets,
                         split_kmer_codes=self.split_inc.kmer_codes,
                         split_origin=self.split_origin)
            meta["split_shape"] = [self.split_inc.n_kmers, self.split_inc.n_codes]
        np.savez(path, meta=np.frombuffer(json.dumps(meta).encode(), np.uint8),
                 **parts)

    def load(self, path) -> None:
        """Restore a checkpoint, REPLACING current state (the reference's
        readHash loads a table, it does not sum onto live counts; use
        ``st.merge_counts`` explicitly for merging)."""
        z = np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
        meta = json.loads(bytes(z["meta"]).decode())
        spec = HashSpec(**meta["spec"])
        if spec != self.cfg.spec:
            raise ValueError(f"hash file spec {spec} != engine spec {self.cfg.spec} "
                             "(tables are only comparable with identical k/w/seed)")
        n_in = len(z["hashes"])
        cap = max(1 << self.cfg.table_bits, 1 << max(n_in - 1, 1).bit_length())
        self.table = None
        self._ensure_table(1)
        if self.table.capacity < cap:
            self.table = st.grow(self.table, cap)
        self.table = st.merge_counts(self._flushed(), z["hashes"], z["counts"])
        if int(np.asarray(self.table.spilled)):
            raise RuntimeError("table spilled on load; raise --tableBits")
        self.n_reads_counted = meta["n_reads"]
        self.retained_hashes = z["retained"] if "retained" in z else None
        self.retained_counts = (
            z["retained_counts"] if "retained_counts" in z
            and len(z["retained_counts"]) else None)
        self.inc = None
        self.clusters = None
        self.split_inc = None
        self.split_origin = None
        if "inc_code_offsets" in z:
            nk, nc = meta["inc_shape"]
            self.inc = Incidence(nk, nc, z["inc_code_offsets"],
                                 z["inc_code_kmers"], z["inc_kmer_offsets"],
                                 z["inc_kmer_codes"])
        if "cluster_labels" in z and self.inc is not None:
            flat = z["cluster_labels"]
            self.clusters = [
                flat[self.inc.code_offsets[c]:self.inc.code_offsets[c + 1]]
                for c in range(self.inc.n_codes)]
        if "split_code_offsets" in z:
            nk, nc = meta["split_shape"]
            self.split_inc = Incidence(nk, nc, z["split_code_offsets"],
                                       z["split_code_kmers"],
                                       z["split_kmer_offsets"],
                                       z["split_kmer_codes"])
            self.split_origin = z["split_origin"]
        self.timer.stage(f"load: {len(z['hashes'])} kmers"
                         + (f", {self.inc.n_pairs} pairs" if self.inc else "")
                         + (", clusters" if self.clusters else ""))
