"""Banded affine-gap DP along a seed-chain corridor.

Replaces SeqAn's ``bandedChainAlignment`` (ref src/semi_global_align.cpp:
293-311) and the banded ``globalAlignment`` (ref src/global_align.cpp:56-75).
Instead of chaining rectangles around seeds, the corridor is expressed as a
per-row band offset array c[i] (nondecreasing): row i of the DP covers
reference columns j in [c[i], c[i]+W). W is static (padded to a lane
multiple) so the whole kernel is a jax.lax.scan over read rows with W
vectorised lanes — wavefront-free, VPU-shaped.

The same free-end-gap AlignConfig semantics as ops/pairwise apply; the
E-state uses the identical prefix-cummax trick (valid within the band,
matching SeqAn's band-limited gap runs).

Traceback is 4 bits/cell over (rows, W) — for a 100 kb read at W=256 that
is 25 MB instead of the full matrix's multi-GB, the same trick as the
reference's band (SURVEY.md §7 hard parts: band streaming + bit packing).
"""

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .pairwise import (AlignConfig, DIAG, E_EXT_BIT, E_SRC, F_EXT_BIT, F_SRC,
                       NEG, PairAlignment, Scoring, SEMI_GLOBAL)
from .encode import R_PAD


def _banded_single(q, r_ext, c, n_act, m_act, scoring, config, W, need_moves):
    """One banded DP. q: (n_pad,) int8. r_ext: (m_pad + 2W,) int8, the
    reference padded with W sentinel bases on each side. c: (n_pad + 1,)
    int32 band offsets, c[i] = leftmost ref column j of row i's band
    (c[0] for row 0). Returns (score, end_i, end_j, moves)."""
    n_pad = q.shape[0]
    match, mismatch, open_, ext = (int(scoring.match), int(scoring.mismatch),
                                   int(scoring.gap_open), int(scoring.gap_extend))
    ks = jnp.arange(W, dtype=jnp.int32)

    def boundary_row0(j):
        # H value of cell (0, j)
        if config.free_start_s2:
            return jnp.where(j >= 0, 0, NEG)
        return jnp.where(j > 0, open_ + (j - 1) * ext,
                         jnp.where(j == 0, 0, NEG)).astype(jnp.int32)

    def col0_bound(i):
        if config.free_start_s1:
            return jnp.int32(0)
        return jnp.int32(open_) + (i - 1) * jnp.int32(ext)

    j0 = c[0] + ks
    h0 = boundary_row0(j0)
    h0 = jnp.where(j0 > m_act, NEG, h0)
    f0 = jnp.full(W, NEG, jnp.int32)

    # Pre-gather each row's reference window with ONE vectorised gather —
    # a per-step dynamic_slice from a large HBM array makes XLA compile
    # time scale with the source size (measured: 12s at m=128k vs 1.4s at
    # m=32k), while this gather compiles in constant time.
    row_cs = c[1:]                                   # (n_pad,)
    gather_idx = (row_cs[:, None] + (W - 1)) + jnp.arange(W)[None, :]
    r_windows = r_ext[gather_idx]                    # (n_pad, W) int8

    def row_step(carry, xi):
        h_prev, f_prev, h_at_n = carry
        i, qi, ci, si, rwin = xi   # row index (1-based), q base, c[i], shift

        j = ci + ks            # ref columns of this row's lanes
        valid = (j >= 0) & (j <= m_act)

        # Realign previous row's vectors to this row's band window:
        # lane k of row i corresponds to lane k + si of row i-1.
        h_up = jnp.where(ks + si < W, jnp.roll(h_prev, -si), NEG)
        f_up = jnp.where(ks + si < W, jnp.roll(f_prev, -si), NEG)
        # Diagonal predecessor (i-1, j-1) = lane k + si - 1 of row i-1.
        h_diag = jnp.where(ks + si - 1 >= 0,
                           jnp.roll(h_up, 1).at[0].set(
                               jnp.where(si >= 1, h_prev[si - 1], NEG)), NEG)
        # simpler: h_diag[k] = h_prev[k + si - 1]
        h_diag = jnp.where((ks + si - 1 >= 0) & (ks + si - 1 < W),
                           jnp.roll(h_prev, -(si - 1)), NEG)

        # F: vertical gap (consumes q only).
        f_open = h_up + open_
        f_ext_v = f_up + ext
        f = jnp.maximum(f_open, f_ext_v)
        f_ext_bit = (f == f_ext_v) & (f_up > NEG // 2)

        # Substitution: r base at j-1 (pre-gathered into rwin).
        sub = jnp.where(qi == rwin, match, mismatch).astype(jnp.int32)
        diag = jnp.where((j >= 1) & (j <= m_act), h_diag + sub, NEG)
        # Boundary entry for row i at column 0 (band may cover j=0).
        hb = col0_bound(i)
        diag = jnp.where(j == 0, hb, diag)

        g = jnp.maximum(diag, jnp.where(j >= 1, f, NEG))

        # E: horizontal gap via prefix cummax within the band.
        cvec = g + open_ - (ks + 1) * ext
        cmax = jax.lax.cummax(cvec, axis=0)
        cmax_shift = jnp.concatenate([jnp.array([NEG], jnp.int32), cmax[:-1]])
        e = cmax_shift + ks * ext
        e = jnp.where((j >= 1), e, NEG)
        e = jnp.where(e < NEG // 2, NEG, e)

        h = jnp.maximum(g, e)
        h = jnp.where(valid, h, NEG)

        e_prev = jnp.concatenate([jnp.array([NEG], jnp.int32), e[:-1]])
        e_ext_bit = (e == e_prev + ext) & (e_prev > NEG // 2)

        if need_moves:
            hsrc = jnp.where(h == diag, DIAG,
                             jnp.where(h == e, E_SRC, F_SRC)).astype(jnp.int32)
            moves4 = (hsrc
                      | jnp.where(e_ext_bit, E_EXT_BIT, 0)
                      | jnp.where(f_ext_bit, F_EXT_BIT, 0))
            # Pack 8 lanes per int32 word in nibble-plane layout (word w
            # holds lanes {w, w+W/8, ..., w+7W/8}): quarters the transfer
            # over the ~120 MB/s tunnel and matches the Pallas kernel's
            # packer and the native decoder.
            from .pallas_banded import pack_moves_rows
            moves = pack_moves_rows(moves4)
        else:
            moves = jnp.zeros((), jnp.int32)

        h_at_n = jnp.where(i == n_act, h, h_at_n)
        # last-column candidate of this row (free_end_s1)
        k_lastcol = m_act - ci
        in_band = (k_lastcol >= 0) & (k_lastcol < W)
        lastcol = jnp.where(in_band & (i <= n_act),
                            h[jnp.clip(k_lastcol, 0, W - 1)], NEG)
        return (h, f, h_at_n), (moves, lastcol)

    rows_i = jnp.arange(1, n_pad + 1, dtype=jnp.int32)
    shifts = c[1:] - c[:-1]
    init_at_n = jnp.where(n_act == 0, h0, jnp.full(W, NEG, jnp.int32))
    (h_last, _, h_at_n), (moves, lastcol) = jax.lax.scan(
        row_step, (h0, f0, init_at_n),
        (rows_i, q, c[1:], shifts, r_windows))

    # --- End selection ---------------------------------------------------
    c_n = c[n_act]
    j_at_n = c_n + ks
    best_score = jnp.int32(NEG)
    end_i = n_act
    end_j = m_act

    # corner (n_act, m_act) if within band
    k_corner = m_act - c_n
    corner_ok = (k_corner >= 0) & (k_corner < W)
    corner = jnp.where(corner_ok, h_at_n[jnp.clip(k_corner, 0, W - 1)], NEG)
    best_score = corner

    if config.free_end_s2:
        row_vals = jnp.where(j_at_n <= m_act, h_at_n, NEG)
        k_best = jnp.argmax(row_vals).astype(jnp.int32)
        s = row_vals[k_best]
        better = s > best_score
        end_j = jnp.where(better, c_n + k_best, end_j)
        best_score = jnp.maximum(best_score, s)

    if config.free_end_s1:
        is_ = jnp.arange(1, n_pad + 1, dtype=jnp.int32)
        col_vals = jnp.where(is_ <= n_act, lastcol, NEG)
        # row 0 candidate
        k0 = m_act - c[0]
        row0_val = jnp.where((k0 >= 0) & (k0 < W),
                             h0[jnp.clip(k0, 0, W - 1)], NEG)
        col_vals = jnp.concatenate([row0_val[None], col_vals])
        i_best = jnp.argmax(col_vals).astype(jnp.int32)
        s = col_vals[i_best]
        better = s > best_score
        end_i = jnp.where(better, i_best, end_i)
        end_j = jnp.where(better, m_act, end_j)
        best_score = jnp.maximum(best_score, s)

    return best_score, end_i, end_j, moves


@functools.partial(jax.jit,
                   static_argnames=('scoring', 'config', 'W', 'need_moves'))
def banded_batch_device(q_batch, r_ext_batch, c_batch, n_acts, m_acts,
                        scoring: Scoring, config: AlignConfig, W: int,
                        need_moves: bool):
    fn = functools.partial(_banded_single, scoring=scoring, config=config,
                           W=W, need_moves=need_moves)
    return jax.vmap(fn)(q_batch, r_ext_batch, c_batch, n_acts, m_acts)


def decode_banded_traceback(moves: np.ndarray, c: np.ndarray, end_i: int,
                            end_j: int, config: AlignConfig):
    """Host traceback through the banded move matrix (4-bit packed,
    (n_rows, W/2) bytes). Lane of (i, j) is j - c[i]; moves row index is
    i-1 (rows 1..n). Uses the native decoder when available (the serial
    walk is the driver's hot host loop)."""
    from ..native import native_decode_banded, BAND_ESCAPE
    result = native_decode_banded(moves, c, end_i, end_j,
                                  config.free_start_s1, config.free_start_s2)
    if result is not None:
        return result
    # Python fallback: unpack nibble-plane int32 words to one byte per lane.
    w8 = moves.shape[1]
    unpacked = np.empty((moves.shape[0], w8 * 8), np.uint8)
    for g in range(8):
        unpacked[:, g * w8:(g + 1) * w8] = (moves >> (4 * g)) & 0xF
    moves = unpacked
    i, j = int(end_i), int(end_j)
    ops = []

    def emit(op, count=1):
        if ops and ops[-1][1] == op:
            ops[-1][0] += count
        else:
            ops.append([count, op])

    W = moves.shape[1]
    state = 'H'
    while True:
        # Defensive: a traceback that leaves the band indicates a corrupted
        # (NEG-valued) path; bail out rather than walk garbage bits.
        if i > 0 and not (0 <= j - c[i] < W):
            return BAND_ESCAPE
        if state == 'H':
            if i == 0:
                if config.free_start_s2 or j == 0:
                    break
                emit('D', j)
                j = 0
                break
            if j == 0:
                if config.free_start_s1:
                    break
                emit('I', i)
                i = 0
                break
            b = int(moves[i - 1, j - c[i]])
            src = b & 3
            if src == DIAG:
                emit('M')
                i -= 1
                j -= 1
            elif src == E_SRC:
                state = 'E'
            else:
                state = 'F'
        elif state == 'E':
            b = int(moves[i - 1, j - c[i]])
            emit('D')
            j -= 1
            if not (b & E_EXT_BIT) or j == 0:
                state = 'H'
        else:
            b = int(moves[i - 1, j - c[i]])
            emit('I')
            i -= 1
            if not (b & F_EXT_BIT) or i == 0:
                state = 'H'
    cigar = [(cnt, op) for cnt, op in reversed(ops)]
    return cigar, i, j


def build_corridor(anchors_read: np.ndarray, anchors_ref: np.ndarray,
                   n: int, m: int, W: int) -> np.ndarray:
    """Per-row band offsets c[i] (length n+1, nondecreasing) following the
    piecewise-linear interpolation of the seed chain, extrapolated with
    slope 1 to the matrix edges (the role of the reference's traced line,
    ref src/semi_global_align.cpp:444-513)."""
    rows = np.arange(n + 1, dtype=np.int64)
    if len(anchors_read) == 0:
        center = rows.astype(np.float64)
    else:
        ar = anchors_read.astype(np.float64)
        af = anchors_ref.astype(np.float64)
        center = np.interp(rows, ar, af)
        # slope-1 extrapolation beyond the anchor span
        first_r, first_f = ar[0], af[0]
        last_r, last_f = ar[-1], af[-1]
        below = rows < first_r
        above = rows > last_r
        center[below] = first_f - (first_r - rows[below])
        center[above] = last_f + (rows[above] - last_r)
    c = np.round(center).astype(np.int64) - W // 2
    c = np.clip(c, -W + 1, max(m - W // 2, -W + 1))
    c = np.maximum.accumulate(c)        # nondecreasing
    # Cap per-row drift so the Pallas kernel's static-roll realignment
    # (si <= MAX_SHIFT) sees the same corridor as the XLA kernel.
    from .pallas_banded import MAX_SHIFT
    d = np.minimum(np.diff(c), MAX_SHIFT)
    c = c[0] + np.concatenate([[0], np.cumsum(d)])
    return c.astype(np.int32)


def path_band_margin(pa: 'PairAlignment', task: 'BandedTask', W: int) -> int:
    """Minimum distance (in band lanes) of an alignment's traced path from
    either edge of the band corridor the task was aligned in. A path with
    a comfortable margin cannot improve from re-centering the corridor at
    the same width, so drivers use this to skip the refinement pass.

    Vectorised over CIGAR runs: lane(i, j) = j - c[i]; per-run lane
    extrema come from np.minimum/maximum.reduceat over g(i) = i - c[i]
    (M runs, where j - i is constant) and over c (I runs, where j is
    constant); D-run extrema are the run's vertex lanes, covered by
    evaluating both run endpoints."""
    if not pa.cigar:
        return 0
    c = build_corridor(task.corridor_read, task.corridor_ref,
                       len(task.q), len(task.r), W).astype(np.int64)
    n1 = len(c)
    if hasattr(pa.cigar, 'op_codes'):
        counts = pa.cigar.counts
        codes = pa.cigar.op_codes
    else:
        counts = np.array([cnt for cnt, _ in pa.cigar], np.int64)
        codes = np.array([{'M': 0, 'I': 1, 'D': 2}[op]
                          for _, op in pa.cigar], np.int8)
    di = np.where(codes == 2, 0, counts)
    dj = np.where(codes == 1, 0, counts)
    i0 = pa.s1_start + np.concatenate([[0], np.cumsum(di)[:-1]])
    j0 = pa.s2_start + np.concatenate([[0], np.cumsum(dj)[:-1]])
    i1 = i0 + di
    j1 = j0 + dj
    # vertex lanes (covers D runs and all run endpoints)
    iv = np.clip(np.concatenate([i0, i1]), 0, n1 - 1)
    jv = np.concatenate([j0, j1])
    lanes_lo = (jv - c[iv]).min()
    lanes_hi = (jv - c[iv]).max()
    # M-run interiors: lane(i) = (j0 - i0) + g(i), g = i - c[i]
    m_mask = (codes == 0) & (counts > 1)
    if m_mask.any():
        starts = np.clip(i0[m_mask], 0, n1 - 1)
        ends = np.clip(i1[m_mask], 0, n1 - 1)
        g = np.arange(n1, dtype=np.int64) - c
        # reduceat over [start, end) ranges interleaved with gap segments
        bounds = np.empty(2 * len(starts), np.int64)
        bounds[0::2] = starts
        bounds[1::2] = np.maximum(ends, starts + 1)
        gmin = np.minimum.reduceat(g, bounds)[0::2]
        gmax = np.maximum.reduceat(g, bounds)[0::2]
        off = j0[m_mask] - i0[m_mask]
        lanes_lo = min(lanes_lo, (off + gmin).min())
        lanes_hi = max(lanes_hi, (off + gmax).max())
    # I-run interiors: lane(i) = j0 - c[i]
    i_mask = (codes == 1) & (counts > 1)
    if i_mask.any():
        starts = np.clip(i0[i_mask], 0, n1 - 1)
        ends = np.clip(i1[i_mask], 0, n1 - 1)
        bounds = np.empty(2 * len(starts), np.int64)
        bounds[0::2] = starts
        bounds[1::2] = np.maximum(ends, starts + 1)
        cmin = np.minimum.reduceat(c, bounds)[0::2]
        cmax = np.maximum.reduceat(c, bounds)[0::2]
        lanes_lo = min(lanes_lo, (j0[i_mask] - cmax).min())
        lanes_hi = max(lanes_hi, (j0[i_mask] - cmin).max())
    return int(min(lanes_lo, (W - 1) - lanes_hi))


def alignment_path_anchors(pa: 'PairAlignment', step: int = 64):
    """Sample (s1_pos, s2_pos) anchors along an alignment's CIGAR path, for
    re-centering the band corridor on the found path (iterative corridor
    refinement — recovers score lost where the optimal path hugged the band
    edge)."""
    i, j = pa.s1_start, pa.s2_start
    anchors_i = [i]
    anchors_j = [j]
    since = 0
    for count, op in pa.cigar:
        di = count if op in 'MI' else 0
        dj = count if op in 'MD' else 0
        i += di
        j += dj
        since += count
        if since >= step:
            anchors_i.append(i)
            anchors_j.append(j)
            since = 0
    anchors_i.append(i)
    anchors_j.append(j)
    return (np.array(anchors_i, np.int32), np.array(anchors_j, np.int32))


class BandedTask(NamedTuple):
    q: np.ndarray          # int8 codes, aligned orientation
    r: np.ndarray          # int8 codes of the reference window
    corridor_read: np.ndarray
    corridor_ref: np.ndarray


def band_width(band):
    """Static lane width for a requested band radius. Above 512 lanes the
    width rounds UP to a power of two: wide bands come from data-dependent
    radii (consensus-vs-path length spreads), and every distinct width is
    a separate multi-minute Mosaic compile; a wider band only adds
    reachable cells, so rounding up never loses alignments."""
    W = max(128, int(np.ceil((2 * band + 1) / 128.0)) * 128)
    if W > 512:
        W = 1 << int(np.ceil(np.log2(W)))
    return W


def align_banded(tasks: List[BandedTask], scoring, config=SEMI_GLOBAL,
                 band: int = 25, need_cigar: bool = True
                 ) -> List[PairAlignment]:
    """Batch a list of banded tasks through the kernel. On TPU-class
    backends the whole call becomes one (or a few) TAPE launches
    (ops/tape + ops/pallas_tape); the bucketed path below remains for
    CPU, meshes, and band-escape retries."""
    if not tasks:
        return []
    from .encode import bucket_length, pad_to, Q_PAD
    W = band_width(band)
    from ..parallel.mesh import get_default_mesh
    on_cpu = jax.devices()[0].platform == 'cpu'
    mesh = get_default_mesh()
    # On CPU the mesh path runs only when forced (the multichip dryrun
    # sets UNICYCLER_TPU_FORCE_MESH=1 so the WHOLE pipeline exercises
    # per-device tape launches on the virtual mesh, interpret-mode
    # kernels); real TPU backends always honor an installed mesh.
    import os as _os
    force_mesh = _os.environ.get('UNICYCLER_TPU_FORCE_MESH') == '1'
    if mesh is not None and mesh.devices.size > 1 \
            and (not on_cpu or force_mesh):
        return align_banded_multi(tasks, scoring, config, W, need_cigar,
                                  list(mesh.devices.flat),
                                  interpret=on_cpu)
    if not on_cpu:
        return align_banded_tape(tasks, scoring, config, W, need_cigar)
    results: List[PairAlignment] = [None] * len(tasks)
    # bucket by (n_pad, m_pad)
    buckets = {}
    for idx, t in enumerate(tasks):
        key = (bucket_length(max(len(t.q), 1)),
               bucket_length(max(len(t.r), 1)))
        buckets.setdefault(key, []).append(idx)
    # On TPU-class backends the Pallas kernel does the row loop on-core;
    # the XLA lax.scan path stays for CPU (tests) and as reference.
    use_pallas = jax.devices()[0].platform != 'cpu'
    # When a device mesh is installed, batches shard over it (data
    # parallel over reads; the reference's ThreadPool analog, SURVEY §2.3).
    from ..parallel.mesh import get_default_mesh
    mesh = get_default_mesh()
    n_shards = mesh.devices.size if mesh is not None else 1
    # Phase 1: dispatch every bucket slice (device work queues up) and
    # start async device->host copies, so compute, the tunnel transfer,
    # and host decoding all overlap.
    pending = []
    for (n_pad, m_pad), all_idxs in buckets.items():
        # Slice sizes on the Pallas path: greedy power-of-two multiples of
        # the batch tile, so a bucket of T tasks takes <= log2 launches
        # (launch RTT over the tunnel is the driver's fixed cost) while
        # the compiled-shape count stays small. Launch size is capped so
        # the cellinfo intermediate (B, n_pad, W) int32 stays under ~2 GB.
        if use_pallas:
            from .pallas_banded import BT
            unit = BT * n_shards
            cell_budget = 1 << 29
            max_b = max(unit,
                        cell_budget // max(1, n_pad * W) // unit * unit)
            slices = []
            remaining = len(all_idxs)
            while remaining > 0:
                size = unit
                while size * 2 <= min(remaining, max_b):
                    size *= 2
                slices.append(size)
                remaining -= min(size, remaining)
        elif n_shards > 1:
            slices = [((len(all_idxs) + n_shards - 1)
                       // n_shards) * n_shards]
        else:
            slices = [len(all_idxs)]
        s = 0
        for slice_size in slices:
            idxs = all_idxs[s:s + slice_size]
            s += slice_size
            B = slice_size if (use_pallas or n_shards > 1) else len(idxs)
            qb = np.full((B, n_pad), Q_PAD, np.int8)
            r_ext = np.full((B, m_pad + 2 * W), R_PAD, np.int8)
            cb = np.zeros((B, n_pad + 1), np.int32)
            n_acts = np.zeros(B, np.int32)
            m_acts = np.zeros(B, np.int32)
            for bi, i in enumerate(idxs):
                t = tasks[i]
                qb[bi, :len(t.q)] = t.q
                r_ext[bi, W:W + len(t.r)] = t.r
                n_acts[bi] = len(t.q)
                m_acts[bi] = len(t.r)
                c = build_corridor(t.corridor_read, t.corridor_ref,
                                   len(t.q), len(t.r), W)
                cb[bi, :len(c)] = c
                cb[bi, len(c):] = c[-1]
            device_tb = use_pallas and need_cigar
            if device_tb:
                from .pallas_banded import pallas_banded_with_traceback
                kernel_fn = functools.partial(
                    pallas_banded_with_traceback, scoring=scoring,
                    config=config, W=W)
            elif use_pallas:
                from .pallas_banded import pallas_banded_batch
                kernel_fn = functools.partial(
                    pallas_banded_batch, scoring=scoring, config=config,
                    W=W, need_moves=need_cigar)
            else:
                kernel_fn = functools.partial(
                    banded_batch_device, scoring=scoring, config=config,
                    W=W, need_moves=need_cigar)
            if mesh is not None:
                from ..parallel.mesh import shard_batched_call
                kernel_fn = shard_batched_call(kernel_fn, mesh)
            outs = kernel_fn(qb, r_ext, cb, n_acts, m_acts)
            if device_tb:
                score, end_i, end_j, records, final = outs
                max_rows = int(n_acts[:len(idxs)].max()) if len(idxs) else 1
                moves = (records[:len(idxs), :max_rows],
                         final[:len(idxs)])
            else:
                score, end_i, end_j, moves = outs
                if need_cigar:
                    # Slice off padding tasks AND padding rows (coarse
                    # buckets would otherwise inflate the fetch).
                    max_rows = int(n_acts[:len(idxs)].max()) \
                        if len(idxs) else 1
                    if moves.ndim == 3:
                        moves = moves[:len(idxs), :max_rows]
                    else:
                        moves = moves[:len(idxs)]
            pending.append((idxs, score, end_i, end_j, moves, cb, n_acts,
                            m_acts, device_tb))
    # Phase 2: ONE device->host transfer for ALL launches' outputs —
    # scores, end coordinates, and traceback data — as one flattened int32
    # concat. The tunnel's fixed per-fetch cost (~0.1 s) is paid once per
    # align_banded call instead of once per array per bucket slice.
    fetched = [None] * len(pending)
    if pending:
        flat_parts = []
        shapes = []
        for entry in pending:
            score, end_i, end_j, moves = entry[1], entry[2], entry[3], entry[4]
            group = [jnp.ravel(score).astype(jnp.int32),
                     jnp.ravel(end_i).astype(jnp.int32),
                     jnp.ravel(end_j).astype(jnp.int32)]
            gshapes = [score.shape, end_i.shape, end_j.shape]
            if need_cigar and entry[8]:        # device-traceback records
                group += [jnp.ravel(moves[0]), jnp.ravel(moves[1])]
                gshapes += [moves[0].shape, moves[1].shape]
            elif need_cigar:
                group.append(jnp.ravel(moves))
                gshapes.append(moves.shape)
            flat_parts.extend(group)
            shapes.append(gshapes)
        all_flat = np.asarray(jnp.concatenate(flat_parts)) \
            if len(flat_parts) > 1 else np.asarray(flat_parts[0])
        offset = 0
        for pi, shape_group in enumerate(shapes):
            parts = []
            for shape in shape_group:
                size = int(np.prod(shape))
                parts.append(all_flat[offset:offset + size].reshape(shape))
                offset += size
            fetched[pi] = parts
    retry_tasks = []
    for pi, (idxs, score, end_i, end_j, moves, cb, n_acts, m_acts,
             device_tb) in enumerate(pending):
        parts = fetched[pi]
        score, end_i, end_j = parts[0], parts[1], parts[2]
        if need_cigar:
            moves = tuple(parts[3:]) if device_tb else parts[3]
        if device_tb and need_cigar:
            _emit_results_records(results, tasks, retry_tasks, idxs, score,
                                  end_i, end_j, moves, n_acts, m_acts,
                                  config)
        else:
            _emit_results(results, idxs, score, end_i, end_j, moves,
                          cb, n_acts, m_acts, need_cigar, config)
    # Band-escape tasks (corrupt on-device walks) retry via the
    # moves-fetch path individually — rare.
    if retry_tasks:
        retried = _align_banded_moves_path(
            [tasks[i] for i in retry_tasks], scoring, config, W,
            need_cigar)
        for i, pa in zip(retry_tasks, retried):
            results[i] = pa
    return results


def has_device_traceback():
    """True when align_banded will route through the tape kernels (the
    traceback is walked on device and per-task results are ~2 B/row).
    Drivers use this to decide whether a score-only prefilter pass is
    worth it: on the CPU/XLA path move matrices are materialised per
    candidate, so prefiltering still pays."""
    return jax.devices()[0].platform != 'cpu'


def _filter_degenerate(tasks, results):
    live = []
    for i, t in enumerate(tasks):
        if len(t.q) == 0 or len(t.r) == 0:
            results[i] = PairAlignment(score=0, s1_start=0, s1_end=0,
                                       s2_start=0, s2_end=0, cigar=[],
                                       s1_len=len(t.q), s2_len=len(t.r))
        else:
            live.append(i)
    return live


def _sparse_cap(walk_rows, records):
    """Sparse record-fetch capacity: informative rows are the error rows
    of the walked paths — ~15% of walked task rows on raw nanopore
    reads, near zero on clean reads — so cap at 30%, rounded up to a
    power of two (the cap is a static jit arg; raw values would compile
    a compress_records variant per launch)."""
    cap = max(4096, (walk_rows * 3) // 10)
    b = 4096.0
    while b < cap:
        b *= 1.25          # ~30 bucketed variants; the fetch ships the
    b = -(-int(b) // 512) * 512    # full (cap,) arrays, so granularity
    return min(b, records.shape[0] * records.shape[1])   # costs bytes


# q2/r2 repeat-2 lane-tape VMEM residency budget for one wave launch;
# v5e VMEM is 128 MB/core, and the kernel's working set beyond the tapes
# (metadata planes, moves block, carry registers) is a few MB, so this
# can sit well above the conservative 6 MB it started at. Launches over
# budget fall back to the row kernels.
WAVE_VMEM_BUDGET = 6 << 20


def use_wavetape(W):
    """True when align_banded's tape path should use the anti-diagonal
    WAVEFRONT kernels (ops/pallas_wavetape) instead of the row kernels:
    ~2.5x faster per cell end-to-end on hardware (PERF.md). Covers the
    production band range (semi-global levels at 512/1024 and the
    path/cull scoring at 1024-2048); wider bands keep the rolled row
    kernels. Override with UNICYCLER_TPU_WAVETAPE=0/1."""
    import os
    env = os.environ.get('UNICYCLER_TPU_WAVETAPE')
    if env in ('0', '1'):
        return env == '1'
    return W <= 2048


def _wavetape_dispatch(live_tasks, scoring, config, W, need_cigar,
                       interpret=False, device=None, two_phase=False):
    """Wavefront-tape twin of _tape_dispatch; same pending contract."""
    from .wavetape import build_wavetapes, G as WG
    from .pallas_wavetape import (wavetape_forward, wavetape_traceback,
                                  wavetape_with_traceback)
    from .pallas_tape import compress_records
    from ..utils import trace
    with trace.span('tape_build'):
        launches = build_wavetapes(live_tasks, W, build_corridor)
    # The kernel holds the repeat-2 lane tapes (q2/r2) as whole-call
    # VMEM residents; a launch whose tapes exceed the budget (giant
    # reference windows) routes to the row kernels instead.
    if any(2 * tp.q_tape.shape[0] * (tp.LR + tp.r_flat.shape[1])
           > WAVE_VMEM_BUDGET for tp in launches):
        trace.add('wave.vmem_fallback')
        return None
    put = (lambda x: jax.device_put(x, device)) if device is not None \
        else (lambda x: x)

    # Single-upload path (everything except two-phase): every launch's
    # packed buffers concatenate into ONE uint8 + ONE int32 host->device
    # transfer for the whole dispatch call — each separate upload pays
    # its own tunnel round trip (PERF.md round 5), so per-call transfer
    # count drops from 2*launches to 2. Launch inputs are then
    # device-side dynamic slices (async device ops, no transfers).
    mega = None
    if launches and not (need_cigar and two_phase):
        from .wavetape import pack_launch_inputs
        packed_list = []
        for tp in launches:
            segA_h = tp.seg_g * WG
            lenA_h = np.where(tp.n_t > 0,
                              (tp.lastg - tp.seg_g + 1) * WG, 0)
            packed_list.append(pack_launch_inputs(tp, segA_h, lenA_h))
        all_b = _pad_geom(np.concatenate([b for b, _, _ in packed_list]))
        all_i = _pad_geom(np.concatenate([i for _, i, _ in packed_list]))
        dev_b = jax.device_put(all_b, device)
        dev_i = jax.device_put(all_i, device)
        offs_b, offs_i, off_b, off_i = [], [], 0, 0
        for b, i, _ in packed_list:
            offs_b.append(off_b)
            offs_i.append(off_i)
            off_b += len(b)
            off_i += len(i)
        mega = (dev_b, dev_i, offs_b, offs_i,
                [(len(b), len(i), g) for b, i, g in packed_list])

    pending = []
    for li, tp in enumerate(launches):
        # packed-event fetch budget: flat record index must fit 24 bits
        assert tp.q_tape.shape[0] * tp.NG * WG < (1 << 24), \
            'wave launch too large for packed event indices'
        trace.add('wave.launches')
        trace.add('wave.groups', tp.NG_real)
        trace.add('wave.groups.W%d.bt%d' % (W, tp.q_tape.shape[0]), tp.NG)
        segA = tp.seg_g * WG
        lenA = np.where(tp.n_t > 0, (tp.lastg - tp.seg_g + 1) * WG, 0)
        if need_cigar and two_phase:
            per_task = tuple(put(a) for a in
                             (tp.n_t, tp.m_t, tp.r_base, tp.rowbase,
                              tp.dbase0, tp.a0, tp.seg_g, tp.lastg))
            main_in = (put(tp.q_tape), put(tp.r_flat), put(tp.adv8),
                       put(tp.gflags))
            abase_dev = put(tp.abase)
            n_tasks_dev = put(tp.n_tasks)
            score, end_i, end_j, moves, db_rows = wavetape_forward(
                *main_in, *per_task,
                scoring=scoring, config=config, W=W, need_moves=True,
                interpret=interpret)
            n_t_dev, segA_dev = per_task[0], put(segA)
            lenA_dev = put(lenA)

            def walk(keep_dev, moves=moves, db_rows=db_rows,
                     n_tasks_dev=n_tasks_dev, end_i=end_i, end_j=end_j,
                     abase_dev=abase_dev, n_t_dev=n_t_dev,
                     segA_dev=segA_dev, lenA_dev=lenA_dev):
                valid = (n_t_dev > 0) & keep_dev
                ei_m = jnp.where(valid, end_i, 0)
                ej_m = jnp.where(valid, end_j, 0)
                records, fin = wavetape_traceback(
                    moves, db_rows, n_tasks_dev, ei_m, ej_m,
                    jnp.where(n_t_dev > 0, abase_dev, 0), W,
                    interpret=interpret)
                lenA_m = jnp.where(keep_dev, lenA_dev, 0)
                return records, fin, (segA_dev, lenA_m)

            pending.append((tp, [score, end_i, end_j], ('fwd2', walk)))
        elif need_cigar:
            from .pallas_wavetape import wavetape_with_traceback_packed
            bytes_buf, ints_buf, geom = _mega_slices(mega, li)
            score, end_i, end_j, records, fin, segA_dev, lenA_dev = \
                wavetape_with_traceback_packed(
                    bytes_buf, ints_buf, geom, scoring=scoring,
                    config=config, W=W, interpret=interpret)
            cap = _sparse_cap(int(tp.n_t[tp.n_t > 0].sum()), records)
            nnz, idx, vals = compress_records(
                records, cap, segments=(segA_dev, lenA_dev))
            # wave record values fit 8 bits (run split at 63): one
            # packed int32 per event halves the records fetch
            packed = (idx << 8) | (vals & 0xFF)
            dev = [score, end_i, end_j, nnz, packed, jnp.ravel(fin)]
            pending.append((tp, dev, (cap, records)))
        else:
            from .pallas_wavetape import wavetape_forward_packed
            bytes_buf, ints_buf, geom = _mega_slices(mega, li)
            score, end_i, end_j, _, _ = wavetape_forward_packed(
                bytes_buf, ints_buf, geom, scoring=scoring,
                config=config, W=W, need_moves=False,
                interpret=interpret)
            pending.append((tp, [score, end_i, end_j], None))
    return pending


def _pad_geom(buf, base=4096):
    """Pad a 1-D buffer up to a geometric 1.25x size bucket so the mega
    upload and the per-launch extract slices compile against a small,
    stable set of shapes."""
    size = base
    while size < len(buf):
        size = -(-int(size * 1.25) // 512) * 512
    if size == len(buf):
        return buf
    out = np.zeros(size, buf.dtype)
    out[:len(buf)] = buf
    return out


@functools.partial(jax.jit, static_argnames=('size',))
def _extract_slice(buf, start, size):
    return jax.lax.dynamic_slice(buf, (jnp.int32(start),), (size,))


def _mega_slices(mega, li):
    """Device-side slices of launch li's packed buffers from the
    per-call mega upload."""
    dev_b, dev_i, offs_b, offs_i, metas = mega
    nb, ni, geom = metas[li]
    return (_extract_slice(dev_b, offs_b[li], size=nb),
            _extract_slice(dev_i, offs_i[li], size=ni), geom)


def _tape_dispatch(live_tasks, scoring, config, W, need_cigar,
                   interpret=False, device=None, two_phase=False):
    """Build tapes and launch the kernels (async). Returns the pending
    list of (TapeLaunch, device arrays, extra). With two_phase=True the
    traceback walk is NOT queued: only forward scores/ends are in the
    fetchable dev list, and `extra` carries a walk closure for a later
    _tape_walk_dispatch (so a caller can fetch scores first and walk
    only winning tasks)."""
    import os as _os
    if use_wavetape(W) and (
            not interpret
            or _os.environ.get('UNICYCLER_TPU_WAVETAPE') == '1'):
        # interpret-mode wavetape only when explicitly forced (CI parity
        # tests on tiny shapes); CPU meshes otherwise stay on the row
        # kernels whose interpret compiles are the known-fast path
        pending = _wavetape_dispatch(live_tasks, scoring, config, W,
                                     need_cigar, interpret, device,
                                     two_phase)
        if pending is not None:      # None: VMEM fallback to row tape
            return pending
    from .tape import build_tapes
    from .pallas_tape import (compress_records, tape_forward,
                              tape_traceback, tape_with_traceback)
    from ..utils import trace
    with trace.span('tape_build'):
        launches = build_tapes(live_tasks, W, build_corridor)
    put = (lambda x: jax.device_put(x, device)) if device is not None \
        else (lambda x: x)
    pending = []
    for tp in launches:
        trace.add('tape.launches')
        trace.add('tape.rows', tp.L_real)
        trace.add('tape.rows.W%d.bt%d' % (W, tp.qf.shape[0]), tp.L)
        per_task = tuple(put(a) for a in
                         (tp.cbase, tp.c0m, tp.c_n, tp.m_t, tp.n_t,
                          tp.r_base, tp.seg_start, tp.reset_slot,
                          tp.cap_slot, tp.last_slot))
        main_in = (put(tp.qf), put(tp.r_flat))
        if need_cigar and two_phase:
            score, end_i, end_j, moves, (c_rel, jr_rows) = tape_forward(
                *main_in, *per_task,
                scoring=scoring, config=config, W=W, need_moves=True,
                interpret=interpret)
            n_tasks_dev = put(tp.n_tasks)
            seg_start_dev, n_t_dev = per_task[6], per_task[4]

            def walk(keep_dev, moves=moves, c_rel=c_rel, jr_rows=jr_rows,
                     n_tasks_dev=n_tasks_dev, end_i=end_i, end_j=end_j,
                     seg_start_dev=seg_start_dev, n_t_dev=n_t_dev):
                end_abs, ej, ss, n_t_m = _masked_walk_inputs(
                    keep_dev, n_t_dev, seg_start_dev, end_i, end_j)
                records, fin = tape_traceback(
                    moves, c_rel, jr_rows, n_tasks_dev, end_abs, ej, ss,
                    W, interpret=interpret)
                return records, fin, (seg_start_dev, n_t_m)

            pending.append((tp, [score, end_i, end_j], ('fwd2', walk)))
        elif need_cigar:
            score, end_i, end_j, records, fin = tape_with_traceback(
                *main_in, *per_task, put(tp.n_tasks),
                scoring=scoring, config=config, W=W, interpret=interpret)
            cap = _sparse_cap(int(tp.n_t[tp.n_t > 0].sum()), records)
            nnz, idx, vals = compress_records(
                records, cap, segments=(per_task[6], per_task[4]))
            dev = [score, end_i, end_j, nnz, idx, vals, jnp.ravel(fin)]
            pending.append((tp, dev, (cap, records)))
        else:
            score, end_i, end_j, _, _ = tape_forward(
                *main_in, *per_task,
                scoring=scoring, config=config, W=W, need_moves=False,
                interpret=interpret)
            pending.append((tp, [score, end_i, end_j], None))
    return pending


@functools.partial(jax.jit, static_argnames=())
def _masked_walk_inputs(keep, n_t, seg_start, end_i, end_j):
    """Walk end states with non-kept tasks degraded to immediate stops
    (end at their own reset row: the walk publishes one record-free stop
    and advances)."""
    valid = (n_t > 0) & keep
    end_abs = jnp.where(valid, seg_start + end_i, 0)
    ej = jnp.where(valid, end_j, 0)
    ss = jnp.where(n_t > 0, seg_start, 0)
    end_abs = jnp.where((n_t > 0) & ~keep, ss, end_abs)
    n_t_m = jnp.where(keep, n_t, 0)
    return end_abs, ej, ss, n_t_m


def _tape_walk_dispatch(pending, keep_masks):
    """Phase 2 of the two-phase tape path: queue the traceback walks for
    the kept tasks of each launch (via the walk closure the dispatch
    stored — row or wavefront tape alike). Returns a pending list shaped
    for _tape_collect/_tape_decode (7-part dev groups)."""
    from .pallas_tape import compress_records
    pending2 = []
    for (tp, dev1, extra), keep in zip(pending, keep_masks):
        tag, walk = extra
        assert tag == 'fwd2'
        records, fin, segments = walk(jnp.asarray(keep))
        walk_rows = int(tp.n_t[(tp.n_t > 0) & keep].sum())
        cap = _sparse_cap(walk_rows, records)
        nnz, idx, vals = compress_records(records, cap,
                                          segments=segments)
        if hasattr(tp, 'abase'):     # wave: 8-bit values, pack with idx
            pending2.append((tp, [nnz, (idx << 8) | (vals & 0xFF),
                                  jnp.ravel(fin)], (cap, records)))
        else:
            pending2.append((tp, [nnz, idx, vals, jnp.ravel(fin)],
                             (cap, records)))
    return pending2


def _tape_collect(pending):
    """One merged flat device->host fetch for a pending list; returns the
    per-launch host arrays."""
    from ..utils import trace
    flat_parts, shapes = [], []
    for _, dev, _ in pending:
        for a in dev:
            flat_parts.append(jnp.ravel(a).astype(jnp.int32))
            shapes.append(a.shape)
    with trace.span('tape_fetch'):
        all_flat = np.asarray(jnp.concatenate(flat_parts)) \
            if len(flat_parts) > 1 else np.asarray(flat_parts[0])
    trace.add('tape.fetch_bytes', all_flat.nbytes)
    host_parts, offset = [], 0
    for shape in shapes:
        size = int(np.prod(shape))
        host_parts.append(all_flat[offset:offset + size].reshape(shape))
        offset += size
    grouped, pi = [], 0
    for _, dev, _ in pending:
        grouped.append(host_parts[pi:pi + len(dev)])
        pi += len(dev)
    return grouped


def align_banded_tape(tasks, scoring, config, W, need_cigar,
                      interpret=False):
    """Mega-batched path: every task of the call rides one tape launch
    (a few if the workload exceeds the per-launch row cap), with the
    traceback walked on device. See ops/tape.py for the layout."""
    results = [None] * len(tasks)
    live = _filter_degenerate(tasks, results)
    if not live:
        return results
    pending = _tape_dispatch([tasks[i] for i in live], scoring, config, W,
                             need_cigar, interpret)
    grouped = _tape_collect(pending)
    retry = _tape_decode(results, live, pending, grouped, need_cigar,
                         config)
    if retry:
        retried = _align_banded_moves_path(
            [tasks[i] for i in retry], scoring, config, W, need_cigar)
        for i, pa in zip(retry, retried):
            results[i] = pa
    return results


class _AsyncAlign(object):
    """Handle for an in-flight align_banded dispatch (tape path):
    the kernels are queued on the device; .collect() fetches, decodes,
    and runs band-escape retries. Lets the driver overlap host seeding
    of the NEXT batch with device compute of this one."""

    def __init__(self, tasks, scoring, config, W, need_cigar,
                 two_phase=False):
        self._args = (scoring, config, W, need_cigar)
        self._results = [None] * len(tasks)
        self._live = _filter_degenerate(tasks, self._results)
        self._tasks = tasks
        self._two_phase = two_phase and need_cigar
        self._grouped = None          # pre-merged fetch via collect_many
        self._keep_masks = None
        self._g1 = None               # phase-1 host parts (two-phase)
        self._pend2 = None            # phase-2 pending (two-phase)
        if self._live:
            self._pending = _tape_dispatch(
                [tasks[i] for i in self._live], scoring, config, W,
                need_cigar, two_phase=self._two_phase)
        else:
            self._pending = []

    def scores_by_task(self, grouped1):
        """Phase-1 raw forward scores per ORIGINAL task index (None for
        degenerate / never-dispatched tasks)."""
        scores = [None] * len(self._tasks)
        for (tp, _, _), parts in zip(self._pending, grouped1):
            sc = parts[0]
            for tr in range(tp.task_ids.shape[0]):
                for kk in range(int(tp.n_tasks[tr])):
                    gi = self._live[int(tp.task_ids[tr, kk])]
                    scores[gi] = int(sc[tr, kk])
        return scores

    def keep_masks_from(self, keep):
        """(bt, TT) bool mask per launch from a set of ORIGINAL task
        indices to walk."""
        live_pos = {g: i for i, g in enumerate(self._live)}
        keep_live = {live_pos[g] for g in keep if g in live_pos}
        masks = []
        for tp, _, _ in self._pending:
            m = np.zeros(tp.task_ids.shape, bool)
            for tr in range(tp.task_ids.shape[0]):
                for kk in range(int(tp.n_tasks[tr])):
                    m[tr, kk] = int(tp.task_ids[tr, kk]) in keep_live
            masks.append(m)
        return masks

    def forwards_ready(self):
        """True when this handle's phase-1 forward outputs have finished
        computing on device (a phase-1 fetch would not block)."""
        if not (self._two_phase and self._pending):
            return True
        last_score = self._pending[-1][1][0]
        try:
            return bool(last_score.is_ready())
        except AttributeError:
            return True

    def start_walks(self, keep_from_scores=None):
        """Two-phase pipelining hook: fetch THIS handle's phase-1 scores
        (blocks only until its own forwards finish — later handles'
        device work continues behind), pick the tasks to walk, and queue
        the walk kernels. Call it from the driver loop after dispatching
        the NEXT chunk so the score fetch hides under device compute;
        collect_many then needs only one merged record fetch."""
        if not (self._two_phase and self._pending) \
                or self._keep_masks is not None:
            return
        self._start_walks_from(_tape_collect(self._pending),
                               keep_from_scores)

    def _start_walks_from(self, grouped1, keep_from_scores):
        self._g1 = grouped1
        if keep_from_scores is not None:
            keep = keep_from_scores(self.scores_by_task(self._g1))
        else:
            keep = set(range(len(self._tasks)))
        self._keep_masks = self.keep_masks_from(keep)
        self._pend2 = _tape_walk_dispatch(self._pending, self._keep_masks)

    @staticmethod
    def start_walks_many(pairs):
        """Batched start_walks for several handles whose forwards are
        (or will shortly be) done: ONE merged phase-1 fetch across all
        of them, then per-handle winner selection and walk dispatch.
        `pairs` is a list of (handle, keep_from_scores)."""
        pairs = [(h, kf) for h, kf in pairs
                 if h._two_phase and h._pending and h._keep_masks is None]
        if not pairs:
            return
        merged = _tape_collect([p for h, _ in pairs for p in h._pending])
        pos = 0
        for h, kf in pairs:
            g1 = merged[pos:pos + len(h._pending)]
            pos += len(h._pending)
            h._start_walks_from(g1, kf)

    def finish_walks(self, grouped2):
        """Pair the phase-2 record fetch with the stored phase-1 parts
        and decode."""
        self._pending = [(tp, d1 + d2, ex2) for (tp, d1, _), (_, d2, ex2)
                         in zip(self._pending, self._pend2)]
        return self._decode([a + b for a, b in zip(self._g1, grouped2)])

    def _decode(self, grouped):
        scoring, config, W, need_cigar = self._args
        retry = _tape_decode(self._results, self._live, self._pending,
                             grouped, need_cigar, config,
                             keep_masks=self._keep_masks)
        if retry:
            retried = _align_banded_moves_path(
                [self._tasks[i] for i in retry], scoring, config, W,
                need_cigar)
            for i, pa in zip(retry, retried):
                self._results[i] = pa
        return self._results

    def collect(self):
        if not self._pending:
            return self._results
        if self._grouped is not None:
            return self._decode(self._grouped)
        if self._two_phase:
            self.start_walks()          # no-op if the driver already did
            return self.finish_walks(_tape_collect(self._pend2))
        return self._decode(_tape_collect(self._pending))


class _SyncAlign(object):
    def __init__(self, fn):
        self._fn = fn
        self._out = None

    def collect(self):
        if self._out is None:
            self._out = self._fn()
        return self._out


def start_walks_many(pairs):
    """Module-level alias of _AsyncAlign.start_walks_many."""
    _AsyncAlign.start_walks_many(pairs)


def collect_many(handles, keep_fn=None):
    """Collect a list of align_banded_async handles with ONE merged
    device->host fetch across every handle's pending launches (each
    .collect() alone pays a fetch round trip — the dominant fixed cost
    on a tunnelled device). Returns a list of per-handle result lists.

    keep_fn(handle_index, raw_scores) -> set of task indices, applied to
    TWO-PHASE handles: after the merged phase-1 score fetch, only the
    returned tasks get their traceback walked (the walk spends one step
    per aligned base, so skipping losing candidate windows saves real
    kernel time); non-kept tasks come back score-only with empty spans."""
    async_h = [h for h in handles if isinstance(h, _AsyncAlign)
               and h._pending]
    # two-phase handles whose walks weren't started yet (no driver
    # pipelining): start them now, in order
    for hi, h in enumerate(handles):
        if isinstance(h, _AsyncAlign) and h._two_phase and h._pending \
                and h._keep_masks is None:
            kf = (lambda scores, hi=hi: keep_fn(hi, scores)) \
                if keep_fn is not None else None
            h.start_walks(kf)
    two = [h for h in async_h if h._two_phase]
    one = [h for h in async_h if not h._two_phase]
    # one merged fetch: phase-2 records of two-phase handles +
    # everything of one-phase handles
    merged = _tape_collect([p for h in two for p in h._pend2]
                           + [p for h in one for p in h._pending]) \
        if async_h else []
    pos = 0
    results_by_id = {}
    for h in two:
        g2 = merged[pos:pos + len(h._pend2)]
        pos += len(h._pend2)
        results_by_id[id(h)] = h.finish_walks(g2)
    for h in one:
        h._grouped = merged[pos:pos + len(h._pending)]
        pos += len(h._pending)
    return [results_by_id[id(h)] if id(h) in results_by_id else h.collect()
            for h in handles]


_FETCH_RTT = None


def device_fetch_rtt():
    """Measured round-trip of a tiny dispatch+fetch (cached). Decides
    whether latency-sensitive optimisations (extra fetch phases) pay:
    ~25 ms through the axon tunnel, ~0.1 ms on attached hardware."""
    global _FETCH_RTT
    if _FETCH_RTT is None:
        import time
        x = jnp.zeros(128, jnp.int32)
        f = jax.jit(lambda a, s: a + s)
        np.asarray(f(x, 0))
        t0 = time.time()
        np.asarray(f(x, 1))
        _FETCH_RTT = time.time() - t0
    return _FETCH_RTT


def _two_phase_profitable():
    """The two-phase tape path (scores first, walk winners only) trades
    ~45% of walk kernel steps and ~25% of fetched bytes for one extra
    fetch phase per chunk. That wins when launch round trips are cheap
    (attached hardware) and loses through a high-latency tunnel.
    Override with UNICYCLER_TPU_TWO_PHASE=0/1."""
    import os
    env = os.environ.get('UNICYCLER_TPU_TWO_PHASE')
    if env in ('0', '1'):
        return env == '1'
    return device_fetch_rtt() < 0.008


def align_banded_async(tasks, scoring, config=SEMI_GLOBAL, band=25,
                       need_cigar=True, two_phase=False):
    """align_banded split into dispatch-now / collect-later. On the
    single-device tape path the kernels are queued immediately and the
    host is free until .collect(); CPU and mesh paths compute lazily at
    collect time (no benefit to eager work there). two_phase=True defers
    the traceback walk so collect_many's keep_fn can skip losers (only
    honoured where the extra fetch phase is profitable — see
    _two_phase_profitable)."""
    if not tasks:
        return _SyncAlign(lambda: [])
    if two_phase:
        two_phase = _two_phase_profitable()
    from ..parallel.mesh import get_default_mesh
    on_cpu = jax.devices()[0].platform == 'cpu'
    mesh = get_default_mesh()
    plain_tape = not on_cpu and not (
        mesh is not None and mesh.devices.size > 1)
    if plain_tape:
        W = band_width(band)
        return _AsyncAlign(tasks, scoring, config, W, need_cigar,
                           two_phase=two_phase)
    return _SyncAlign(lambda: align_banded(tasks, scoring, config=config,
                                           band=band,
                                           need_cigar=need_cigar))


def align_banded_multi(tasks, scoring, config, W, need_cigar, devices,
                       interpret=False):
    """Data-parallel tape path over multiple devices: tasks are
    partitioned by row count, each device gets its own tape launches
    (committed inputs -> the kernels execute on that device,
    concurrently), and results are fetched per device. This is the
    multi-chip scaling story for alignment — embarrassingly parallel
    over reads, no collectives needed until the stats merge
    (parallel/mesh.sharded_align_stats)."""
    results = [None] * len(tasks)
    live = _filter_degenerate(tasks, results)
    if not live:
        return results
    # greedy balance by DP row count
    order = sorted(live, key=lambda i: -len(tasks[i].q))
    loads = [0] * len(devices)
    parts = [[] for _ in devices]
    for i in order:
        d = loads.index(min(loads))
        parts[d].append(i)
        loads[d] += len(tasks[i].q)
    if interpret:
        # CPU (virtual-device) mesh: interpret-mode Pallas tape launches
        # take XLA-CPU many MINUTES to compile at real read lengths (the
        # round-2 multichip dryrun timed out inside backend_compile of
        # one such launch). The bucketed XLA lax.scan kernel computes
        # the identical DP and compiles in seconds, so per-device
        # partitions route through it instead; every device's buckets
        # are dispatched (async) before any is decoded.
        all_pending = []
        for dev, idxs in zip(devices, parts):
            if idxs:
                all_pending.append(
                    (idxs, _xla_scan_dispatch([tasks[i] for i in idxs],
                                              scoring, config, W,
                                              need_cigar, device=dev)))
        for idxs, pending in all_pending:
            sub_results = [None] * len(idxs)
            _xla_scan_decode(sub_results, pending, need_cigar, config)
            for local_i, pa in enumerate(sub_results):
                results[idxs[local_i]] = pa
        return results
    all_pending = []
    for dev, idxs in zip(devices, parts):
        if not idxs:
            continue
        pending = _tape_dispatch([tasks[i] for i in idxs], scoring,
                                 config, W, need_cigar, interpret,
                                 device=dev)
        all_pending.append((idxs, pending))
    retry = []
    for idxs, pending in all_pending:
        grouped = _tape_collect(pending)
        retry += _tape_decode(results, idxs, pending, grouped, need_cigar,
                              config)
    if retry:
        retried = _align_banded_moves_path(
            [tasks[i] for i in retry], scoring, config, W, need_cigar)
        for i, pa in zip(retry, retried):
            results[i] = pa
    return results


def _xla_scan_dispatch(task_list, scoring, config, W, need_cigar,
                       device=None):
    """Bucketed banded_batch_device launches (the XLA lax.scan kernel)
    with inputs committed to a specific device. Batch sizes are padded
    to powers of two so a varying per-device task count does not compile
    a fresh executable per call."""
    from .encode import bucket_length, Q_PAD
    put = (lambda x: jax.device_put(x, device)) if device is not None \
        else (lambda x: x)
    buckets = {}
    for idx, t in enumerate(task_list):
        key = (bucket_length(max(len(t.q), 1)),
               bucket_length(max(len(t.r), 1)))
        buckets.setdefault(key, []).append(idx)
    pending = []
    for (n_pad, m_pad), idxs in buckets.items():
        B = 1 << int(np.ceil(np.log2(len(idxs))))
        qb = np.full((B, n_pad), Q_PAD, np.int8)
        r_ext = np.full((B, m_pad + 2 * W), R_PAD, np.int8)
        cb = np.zeros((B, n_pad + 1), np.int32)
        n_acts = np.zeros(B, np.int32)
        m_acts = np.zeros(B, np.int32)
        for bi, i in enumerate(idxs):
            t = task_list[i]
            qb[bi, :len(t.q)] = t.q
            r_ext[bi, W:W + len(t.r)] = t.r
            n_acts[bi] = len(t.q)
            m_acts[bi] = len(t.r)
            c = build_corridor(t.corridor_read, t.corridor_ref,
                               len(t.q), len(t.r), W)
            cb[bi, :len(c)] = c
            cb[bi, len(c):] = c[-1]
        outs = banded_batch_device(
            put(qb), put(r_ext), put(cb), put(n_acts), put(m_acts),
            scoring=scoring, config=config, W=W, need_moves=need_cigar)
        pending.append((idxs, outs, cb, n_acts, m_acts))
    return pending


def _xla_scan_decode(results, pending, need_cigar, config):
    for idxs, outs, cb, n_acts, m_acts in pending:
        score, end_i, end_j, moves = outs
        if need_cigar:
            moves = moves[:len(idxs)]
        _emit_results(results, idxs, score, end_i, end_j, moves, cb,
                      n_acts, m_acts, need_cigar, config)


def _tape_decode(results, live, pending, grouped, need_cigar, config,
                 keep_masks=None):
    """Decode fetched tape outputs into PairAlignments; returns the task
    indices needing the band-escape retry path. With keep_masks (one
    (bt, TT) bool array per launch, two-phase mode) non-kept tasks were
    never walked: they get a score-only result with an empty span, so
    span-based filters drop them while score-based ranking still sees
    them."""
    from .pallas_traceback import records_to_cigar
    from .pallas_wavetape import wave_records_to_cigar
    from ..utils import trace
    retry = []
    with trace.span('tape_decode'):
        _tape_decode_inner(results, live, pending, grouped, need_cigar,
                           config, keep_masks, retry,
                           records_to_cigar, wave_records_to_cigar, trace)
    if retry:
        trace.add('tape.retry', len(retry))
    return retry


def _tape_decode_inner(results, live, pending, grouped, need_cigar, config,
                       keep_masks, retry, records_to_cigar,
                       wave_records_to_cigar, trace):
    for li, ((tp, dev, extra), parts) in enumerate(zip(pending, grouped)):
        is_wave = hasattr(tp, 'abase')
        score, end_i, end_j = parts[0], parts[1], parts[2]
        if need_cigar:
            cap, rec_dev = extra
            nnz = int(parts[3][0])
            B_, L_ = rec_dev.shape
            if nnz > cap:
                # sparse overflow (extremely indel-dense workload): fetch
                # the dense device array after all
                trace.add('tape.sparse_overflow')
                records = np.asarray(rec_dev)
            elif is_wave:
                # packed (flat index << 8 | 8-bit value) events
                packed = parts[4][:nnz].astype(np.int64) & 0xFFFFFFFF
                records = np.ones(B_ * L_, np.int32)
                records[packed >> 8] = (packed & 0xFF).astype(np.int32)
                records = records.reshape(B_, L_)
            else:
                idx, vals = parts[4], parts[5]
                records = np.ones(B_ * L_, np.int32)
                records[idx[:nnz]] = vals[:nnz]
                records = records.reshape(B_, L_)
            fin = parts[5 if is_wave else 6].reshape(
                records.shape[0], tp.TT, 3)
        else:
            records = fin = None
        for tr in range(tp.task_ids.shape[0]):
            for kk in range(int(tp.n_tasks[tr])):
                gi = live[int(tp.task_ids[tr, kk])]
                sc = int(score[tr, kk])
                n_act = int(tp.n_t[tr, kk])
                m_act = int(tp.m_t[tr, kk])
                if sc <= NEG // 2:
                    if is_wave and not (config.free_end_s1
                                        or config.free_end_s2):
                        # No-free-end configs must reach the corner; the
                        # wave tape's group-quantized window can clip it
                        # on a drifting corridor where the row kernels'
                        # exact per-row corridor would not. Retry exact.
                        retry.append(gi)
                    else:
                        results[gi] = PairAlignment(
                            score=0, s1_start=0, s1_end=0, s2_start=0,
                            s2_end=0, cigar=[], s1_len=n_act,
                            s2_len=m_act)
                    continue
                if keep_masks is not None \
                        and not keep_masks[li][tr, kk]:
                    results[gi] = PairAlignment(
                        score=sc, s1_start=0, s1_end=0, s2_start=0,
                        s2_end=0, cigar=[], s1_len=n_act, s2_len=m_act)
                    continue
                ei, ej = int(end_i[tr, kk]), int(end_j[tr, kk])
                if not need_cigar:
                    results[gi] = PairAlignment(
                        score=sc, s1_start=0, s1_end=ei, s2_start=0,
                        s2_end=ej, cigar=[], s1_len=n_act, s2_len=m_act)
                    continue
                if is_wave:
                    decoded = wave_records_to_cigar(
                        records[tr], int(tp.abase[tr, kk]), ei, ej,
                        fin[tr, kk, 0], fin[tr, kk, 1], fin[tr, kk, 2],
                        config)
                else:
                    ss = int(tp.seg_start[tr, kk])
                    local = records[tr, ss:ss + ei]
                    decoded = records_to_cigar(local, ei,
                                               fin[tr, kk, 0],
                                               fin[tr, kk, 1],
                                               fin[tr, kk, 2], config)
                if decoded is None:
                    retry.append(gi)
                    continue
                cigar, si, sj = decoded
                results[gi] = PairAlignment(
                    score=sc, s1_start=si, s1_end=ei, s2_start=sj,
                    s2_end=ej, cigar=cigar, s1_len=n_act, s2_len=m_act)


def _align_banded_moves_path(task_list, scoring, config, W, need_cigar):
    """Fallback: the original host-decoded moves path for a few tasks."""
    from .encode import bucket_length, pad_to, Q_PAD
    from .pallas_banded import BT, pallas_banded_batch
    # CPU backends (tests, virtual meshes) can't run the Pallas kernel
    # compiled; use the XLA lax.scan twin — identical DP.
    on_cpu = jax.devices()[0].platform == 'cpu'
    results = [None] * len(task_list)
    # Memory guard: the bucketed kernel materialises a (BT, n_pad, W/8)
    # int32 moves array in HBM; a band-escape retry of a very long,
    # very wide task (e.g. 40 kb consensus at W=2048) would request
    # tens of GB and kill the process. Such tasks get the zero-score
    # degenerate result instead (same semantics as an unretryable
    # band escape).
    kept = []
    for idx, t in enumerate(task_list):
        n_pad = bucket_length(max(len(t.q), 1))
        if need_cigar and BT * n_pad * (W // 8) * 4 > (1 << 31):
            results[idx] = PairAlignment(
                score=0, s1_start=0, s1_end=0, s2_start=0, s2_end=0,
                cigar=[], s1_len=len(t.q), s2_len=len(t.r))
        else:
            kept.append(idx)
    buckets = {}
    for idx in kept:
        t = task_list[idx]
        key = (bucket_length(max(len(t.q), 1)),
               bucket_length(max(len(t.r), 1)))
        buckets.setdefault(key, []).append(idx)
    for (n_pad, m_pad), idxs in buckets.items():
        B = ((len(idxs) + BT - 1) // BT) * BT
        qb = np.full((B, n_pad), Q_PAD, np.int8)
        r_ext = np.full((B, m_pad + 2 * W), R_PAD, np.int8)
        cb = np.zeros((B, n_pad + 1), np.int32)
        n_acts = np.zeros(B, np.int32)
        m_acts = np.zeros(B, np.int32)
        for bi, i in enumerate(idxs):
            t = task_list[i]
            qb[bi, :len(t.q)] = t.q
            r_ext[bi, W:W + len(t.r)] = t.r
            n_acts[bi] = len(t.q)
            m_acts[bi] = len(t.r)
            c = build_corridor(t.corridor_read, t.corridor_ref,
                               len(t.q), len(t.r), W)
            cb[bi, :len(c)] = c
            cb[bi, len(c):] = c[-1]
        if on_cpu:
            score, end_i, end_j, moves = banded_batch_device(
                qb, r_ext, cb, n_acts, m_acts, scoring=scoring,
                config=config, W=W, need_moves=need_cigar)
        else:
            score, end_i, end_j, moves = pallas_banded_batch(
                qb, r_ext, cb, n_acts, m_acts, scoring, config, W,
                need_cigar)
        if need_cigar:
            moves = moves[:len(idxs)]
        _emit_results(results, idxs, score, end_i, end_j, moves, cb,
                      n_acts, m_acts, need_cigar, config)
    return results


def _emit_results_records(results, tasks, retry_tasks, idxs, score, end_i,
                          end_j, rec_and_final, n_acts, m_acts, config):
    """Decode device-traceback row records into PairAlignments."""
    from .pallas_traceback import records_to_cigar
    records, final = rec_and_final
    records = np.asarray(records)
    final = np.asarray(final)
    score = np.asarray(score)
    end_i = np.asarray(end_i)
    end_j = np.asarray(end_j)
    for bi, i in enumerate(idxs):
        if score[bi] <= NEG // 2:
            results[i] = PairAlignment(score=0, s1_start=0, s1_end=0,
                                       s2_start=0, s2_end=0, cigar=[],
                                       s1_len=int(n_acts[bi]),
                                       s2_len=int(m_acts[bi]))
            continue
        decoded = records_to_cigar(records[bi], end_i[bi], final[bi, 0],
                                   final[bi, 1], final[bi, 2], config)
        if decoded is None:
            retry_tasks.append(i)
            continue
        cigar, si, sj = decoded
        results[i] = PairAlignment(
            score=int(score[bi]), s1_start=si, s1_end=int(end_i[bi]),
            s2_start=sj, s2_end=int(end_j[bi]), cigar=cigar,
            s1_len=int(n_acts[bi]), s2_len=int(m_acts[bi]))


def _emit_results(results, idxs, score, end_i, end_j, moves, cb,
                  n_acts, m_acts, need_cigar, config):
    """Fetch a launch's outputs and decode them into PairAlignments."""
    score = np.asarray(score)
    end_i = np.asarray(end_i)
    end_j = np.asarray(end_j)
    if need_cigar:
        # Padding tasks were already sliced off before the async copy.
        moves = np.asarray(moves)
    for bi, i in enumerate(idxs):
        if score[bi] <= NEG // 2:
            # Degenerate task: no valid path within the band.
            results[i] = PairAlignment(score=0, s1_start=0, s1_end=0,
                                       s2_start=0, s2_end=0, cigar=[],
                                       s1_len=int(n_acts[bi]),
                                       s2_len=int(m_acts[bi]))
            continue
        if need_cigar:
            from ..native import BAND_ESCAPE
            decoded = decode_banded_traceback(
                moves[bi], cb[bi], end_i[bi], end_j[bi], config)
            if decoded is BAND_ESCAPE:
                # No usable path within the band: report a zero-score
                # degenerate alignment (keeping the forward score with an
                # empty CIGAR would pass 'score == 0 and not cigar'
                # guards and rank candidates on no path evidence).
                results[i] = PairAlignment(score=0, s1_start=0, s1_end=0,
                                           s2_start=0, s2_end=0, cigar=[],
                                           s1_len=int(n_acts[bi]),
                                           s2_len=int(m_acts[bi]))
                continue
            cigar, si, sj = decoded
        else:
            cigar, si, sj = [], 0, 0
        results[i] = PairAlignment(
            score=int(score[bi]), s1_start=si, s1_end=int(end_i[bi]),
            s2_start=sj, s2_end=int(end_j[bi]), cigar=cigar,
            s1_len=int(n_acts[bi]), s2_len=int(m_acts[bi]))
