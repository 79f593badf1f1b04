"""Mega-batched banded DP on a task TAPE (one launch per workload).

Companion to ops/tape.py (host layout). Differences from the bucketed
kernel (ops/pallas_banded.py):

  * grid is 1-D over row chunks; the 8 sublanes are tape TRACKS, each a
    back-to-back sequence of task segments. A RESET row (cellinfo bit 8)
    swaps the DP carry for the new task's row-0 boundary — branch-free,
    via a vector select against an h0 tape indexed by 32-row slot.
  * per-task outputs are written SLOT-WISE: every row stores the capture
    scratch (H at the task's last row) and the running best-lastcol to
    its row's 32-slot; the host/end-selection reads each task's known
    capture/last slot. No dynamic per-task indexing in the kernel at all.
  * the traceback kernel walks ALL of a track's tasks in one pass
    (descending rows), publishing one final-state record per task and
    one int32 path record per row, exactly like ops/pallas_traceback.

cellinfo bits 0-7 match ops/pallas_banded (match, valid_ef, col0,
valid_h, si, lastcol); bit 8 = reset, bit 9 = capture, bits 10+ = the
row's LOCAL (within-task, 1-based) DP row index.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pairwise import NEG, AlignConfig, Scoring
from .pallas_banded import (BT, MAX_SHIFT, _prefix_cummax, _select_shifted,
                            _shift_right_one, pack_moves_rows)
from .tape import SEG_ALIGN

G = SEG_ALIGN


def _chunk_rows(W, minimum):
    """Rows per grid step: the largest power of two <= 512 keeping the
    double-buffered (BT, T, W) cellinfo blocks near ~4 MB (wide
    path-finding bands reach W=2048+). Powers of two always divide the
    bucketed tape/batch lengths."""
    t = 512
    while t > minimum and t * W > (1 << 17):
        t //= 2
    return max(t, minimum)


def _make_tape_kernel(T, W, scoring: Scoring, config: AlignConfig,
                      need_moves: bool):
    match_s, mismatch = int(scoring.match), int(scoring.mismatch)
    open_, ext = int(scoring.gap_open), int(scoring.gap_extend)

    def kernel(cellinfo_ref, h0_ref, *out_and_scratch):
        if need_moves:
            (moves_ref, hatn_ref, best_ref,
             h_scr, f_scr, bestv_scr, besti_scr, hatn_scr) = out_and_scratch
        else:
            (hatn_ref, best_ref,
             h_scr, f_scr, bestv_scr, besti_scr, hatn_scr) = out_and_scratch
            moves_ref = None
        lane = jax.lax.broadcasted_iota(jnp.int32, (BT, W), 1)
        out_lane = jax.lax.broadcasted_iota(jnp.int32, (BT, 128), 1)

        def row_body(t, _):
            slot = t // G
            bits = cellinfo_ref[:, pl.ds(t, 1), :].reshape(BT, W)
            is_match = (bits & 1) == 1
            valid_ef = (bits & 2) == 2
            is_col0 = (bits & 4) == 4
            valid_h = (bits & 8) == 8
            si = (bits >> 4) & 7
            is_lastcol = (bits & 128) == 128
            is_reset = (bits & 256) == 256
            is_capture = (bits & 512) == 512
            local_i = bits >> 10

            h0row = h0_ref[:, pl.ds(slot, 1), :].reshape(BT, W)
            reset_c = jnp.max(is_reset.astype(jnp.int32), axis=1,
                              keepdims=True) == 1          # (BT, 1)
            h_prev = jnp.where(is_reset, h0row, h_scr[:, :])
            f_prev = jnp.where(is_reset, NEG, f_scr[:, :])
            bv = jnp.where(reset_c, NEG, bestv_scr[:, :])
            bi = jnp.where(reset_c, 0, besti_scr[:, :])

            h_up = _select_shifted(h_prev, si, list(range(0, MAX_SHIFT + 1)))
            f_up = _select_shifted(f_prev, si, list(range(0, MAX_SHIFT + 1)))
            h_diag = _select_shifted(h_prev, si - 1,
                                     list(range(-1, MAX_SHIFT)))

            f_open = h_up + open_
            f_ext_v = f_up + ext
            f = jnp.maximum(f_open, f_ext_v)
            f_ext_bit = (f == f_ext_v) & (f_up > NEG // 2)

            sub = jnp.where(is_match, match_s, mismatch)
            diag = jnp.where(valid_ef, h_diag + sub, NEG)
            if config.free_start_s1:
                col0_val = jnp.zeros_like(diag)
            else:
                col0_val = jnp.int32(open_) + (local_i - 1) * jnp.int32(ext)
            diag = jnp.where(is_col0, col0_val, diag)

            g = jnp.maximum(diag, jnp.where(valid_ef, f, NEG))

            cvec = g + open_ - (lane + 1) * ext
            cmax = _prefix_cummax(cvec)
            e = _shift_right_one(cmax) + lane * ext
            e = jnp.where(valid_ef & (e > NEG // 2), e, NEG)

            h = jnp.maximum(g, e)
            h = jnp.where(valid_h, h, NEG)

            e_prev = _shift_right_one(e)
            e_ext_bit = (e == e_prev + ext) & (e_prev > NEG // 2)

            if need_moves:
                hsrc = jnp.where(h == diag, 0, jnp.where(h == e, 1, 2))
                moves4 = (hsrc | jnp.where(e_ext_bit, 4, 0)
                          | jnp.where(f_ext_bit, 8, 0))
                moves_ref[:, pl.ds(t, 1), :] = \
                    pack_moves_rows(moves4)[:, None, :]

            lc_val = jnp.max(jnp.where(is_lastcol, h, NEG), axis=1,
                             keepdims=True)
            better = lc_val > bv
            bv = jnp.where(better, lc_val, bv)
            bi = jnp.where(better,
                           jnp.max(local_i, axis=1, keepdims=True), bi)
            bestv_scr[:, :] = bv
            besti_scr[:, :] = bi

            hatn = jnp.where(is_capture, h, hatn_scr[:, :])
            hatn_scr[:, :] = hatn
            # slot-wise publication: last row of each slot wins, so a
            # task's capture/last slot holds exactly its captured state
            hatn_ref[:, pl.ds(slot, 1), :] = hatn[:, None, :]
            best_ref[:, pl.ds(slot, 1), :] = jnp.where(
                out_lane == 0, bv, jnp.where(out_lane == 1, bi, 0)
            )[:, None, :]

            h_scr[:, :] = h
            f_scr[:, :] = f
            return 0

        jax.lax.fori_loop(0, T, row_body, 0)

    return kernel


def _build_windows_flat(r_flat, u_abs, W):
    """Reference windows from per-track flat arrays: rwin[b, i, k] =
    r_flat[b, u_abs[b, i] + k], via group dynamic slices + bit rolls
    (same trick as pallas_banded._build_reference_windows; valid because
    segments are G-aligned so u_abs drifts <= G*MAX_SHIFT per group)."""
    B, n_rows = u_abs.shape
    u0 = u_abs[:, ::G]
    GW = W + G * MAX_SHIFT

    def slice_one(r_b, start):
        return jax.lax.dynamic_slice(r_b, (start,), (GW,))

    win = jax.vmap(lambda r_b, starts:
                   jax.vmap(lambda s: slice_one(r_b, s))(starts))(r_flat, u0)
    X = jnp.repeat(win, G, axis=1)
    rel = (u_abs - jnp.repeat(u0, G, axis=1))[:, :, None]
    shift = 1
    while shift < GW:
        if shift <= G * MAX_SHIFT:
            X = jnp.where((rel & shift) != 0,
                          jnp.roll(X, -shift, axis=2), X)
        shift *= 2
    return X[:, :, :W]


def _row0_boundary(c0m, m_t, W, scoring, config):
    """h0[b, t, k] boundary vector per task, (BT, TT, W) int32."""
    open_, ext = int(scoring.gap_open), int(scoring.gap_extend)
    ks = jnp.arange(W, dtype=jnp.int32)
    j0 = c0m[:, :, None] + ks[None, None, :]
    if config.free_start_s2:
        h0 = jnp.where(j0 >= 0, 0, NEG)
    else:
        h0 = jnp.where(j0 > 0, open_ + (j0 - 1) * ext,
                       jnp.where(j0 == 0, 0, NEG))
    return jnp.where(j0 > m_t[:, :, None], NEG, h0).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=('scoring', 'config', 'W', 'need_moves', 'interpret'))
def tape_forward(q_tape, flags, r_flat, cbase, c0m, c_n, m_t, n_t, r_base,
                 seg_start, reset_slot, cap_slot, last_slot,
                 scoring: Scoring, config: AlignConfig, W: int,
                 need_moves: bool, interpret: bool = False):
    """Run the tape DP. Returns (score, end_i, end_j) each (BT, TT) plus
    (moves (BT, L, W/8), c_rel (BT, L)) for traceback chaining."""
    B, L = q_tape.shape
    # Chunk rows per grid step, scaled inversely with the band width so
    # the double-buffered cellinfo blocks stay within the 16 MB VMEM
    # budget (~4 MB per block): callers range from W=128 search bands to
    # W=2048+ path-finding bands.
    T = min(L, _chunk_rows(W, G))
    n_chunks = L // T
    n_slots = L // G

    fl = flags.astype(jnp.int32)
    is_reset = fl & 1
    is_capture = (fl >> 1) & 1
    si = (fl >> 2) & 7
    active = (fl >> 5) & 1

    seg_id = jnp.clip(jnp.cumsum(is_reset, axis=1) - 1, 0, None)
    S = jnp.cumsum(si, axis=1)
    take = lambda a: jnp.take_along_axis(a, seg_id, axis=1)
    c_rel = S + take(cbase)
    m_row = jnp.where(active == 1, take(m_t), -1)
    u_abs = jnp.clip(c_rel + take(r_base) + (W - 1), 0, None)
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    local_i = pos - take(seg_start) + 1

    rwin = _build_windows_flat(r_flat, u_abs, W)
    j = c_rel[:, :, None] + jnp.arange(W, dtype=jnp.int32)[None, None, :]
    m_col = m_row[:, :, None]
    match = (q_tape[:, :, None] == rwin) & (m_col >= 0)
    valid_ef = (j >= 1) & (j <= m_col)
    is_col0 = (j == 0) & (m_col >= 0)
    valid_h = (j >= 0) & (j <= m_col)
    cellinfo = (match.astype(jnp.int32)
                | (valid_ef.astype(jnp.int32) << 1)
                | (is_col0.astype(jnp.int32) << 2)
                | (valid_h.astype(jnp.int32) << 3)
                | (si[:, :, None] << 4)
                | ((j == m_col).astype(jnp.int32) << 7)
                | (is_reset[:, :, None] << 8)
                | (is_capture[:, :, None] << 9)
                | (local_i[:, :, None] << 10))

    h0_tasks = _row0_boundary(c0m, m_t, W, scoring, config)   # (BT, TT, W)
    bidx = jnp.arange(BT, dtype=jnp.int32)[:, None]
    h0_rows = jnp.zeros((BT, n_slots, W), jnp.int32).at[
        bidx, reset_slot].set(h0_tasks, mode='drop')

    kernel = _make_tape_kernel(T, W, scoring, config, need_moves)
    out_specs, out_shape = [], []
    if need_moves:
        out_specs.append(pl.BlockSpec((BT, T, W // 8), lambda ch: (0, ch, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((BT, L, W // 8), jnp.int32))
    out_specs += [
        pl.BlockSpec((BT, T // G, W), lambda ch: (0, ch, 0),
                     memory_space=pltpu.VMEM),              # hatn slots
        pl.BlockSpec((BT, T // G, 128), lambda ch: (0, ch, 0),
                     memory_space=pltpu.VMEM),              # best slots
    ]
    out_shape += [
        jax.ShapeDtypeStruct((BT, n_slots, W), jnp.int32),
        jax.ShapeDtypeStruct((BT, n_slots, 128), jnp.int32),
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((BT, T, W), lambda ch: (0, ch, 0),
                         memory_space=pltpu.VMEM),          # cellinfo
            pl.BlockSpec((BT, T // G, W), lambda ch: (0, ch, 0),
                         memory_space=pltpu.VMEM),          # h0 slots
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((BT, W), jnp.int32),     # H carry
            pltpu.VMEM((BT, W), jnp.int32),     # F carry
            pltpu.VMEM((BT, 1), jnp.int32),     # best lastcol value
            pltpu.VMEM((BT, 1), jnp.int32),     # best lastcol local row
            pltpu.VMEM((BT, W), jnp.int32),     # captured H at n_act
        ],
    )(cellinfo, h0_rows)
    if need_moves:
        moves, hatn_slots, best_slots = outs
    else:
        hatn_slots, best_slots = outs
        moves = jnp.zeros((BT, 1, 1), jnp.int32)

    # ---- end selection, vectorized over (BT, TT) task slots -------------
    cap = jnp.clip(cap_slot, 0, n_slots - 1)
    last = jnp.clip(last_slot, 0, n_slots - 1)
    rst = jnp.clip(reset_slot, 0, n_slots - 1)
    hatn_t = hatn_slots[bidx, cap]                           # (BT, TT, W)
    best_t = best_slots[bidx, last]                          # (BT, TT, 128)
    h0_t = h0_rows[bidx, rst]                                # (BT, TT, W)

    ks = jnp.arange(W, dtype=jnp.int32)[None, None, :]
    j_at_n = c_n[:, :, None] + ks
    m3 = m_t[:, :, None]
    k_corner = jnp.clip(m_t - c_n, 0, W - 1)
    corner_ok = (m_t - c_n >= 0) & (m_t - c_n < W)
    corner = jnp.where(corner_ok,
                       jnp.take_along_axis(hatn_t, k_corner[:, :, None],
                                           axis=2)[:, :, 0], NEG)
    score = corner
    end_i = n_t
    end_j = m_t
    if config.free_end_s2:
        row_vals = jnp.where(j_at_n <= m3, hatn_t, NEG)
        k_best = jnp.argmax(row_vals, axis=2).astype(jnp.int32)
        s = jnp.take_along_axis(row_vals, k_best[:, :, None],
                                axis=2)[:, :, 0]
        better = s > score
        end_j = jnp.where(better, c_n + k_best, end_j)
        end_i = jnp.where(better, n_t, end_i)
        score = jnp.maximum(score, s)
    if config.free_end_s1:
        k0 = jnp.clip(m_t - c0m, 0, W - 1)
        row0_ok = (m_t - c0m >= 0) & (m_t - c0m < W)
        row0 = jnp.where(row0_ok,
                         jnp.take_along_axis(h0_t, k0[:, :, None],
                                             axis=2)[:, :, 0], NEG)
        kern_val, kern_i = best_t[:, :, 0], best_t[:, :, 1]
        col_val = jnp.where(kern_val > row0, kern_val, row0)
        col_i = jnp.where(kern_val > row0, kern_i, 0)
        better = col_val > score
        end_i = jnp.where(better, col_i, end_i)
        end_j = jnp.where(better, m_t, end_j)
        score = jnp.maximum(score, col_val)
    return score, end_i, end_j, moves, c_rel


def _make_tape_traceback_kernel(T, W, n_chunks, TT):
    w8 = W // 8

    def kernel(moves_ref, crow_ref, ntask_ref, endabs_ref, endj_ref,
               segst_ref, rec_ref, fin_ref, st_scr):
        b = pl.program_id(0)
        chunk_rev = pl.program_id(1)
        chunk = n_chunks - 1 - chunk_rev
        chunk_lo = chunk * T

        @pl.when(chunk_rev == 0)
        def _init():
            nT = ntask_ref[b]
            k0 = nT - 1                        # walk tasks descending
            kc = jnp.clip(k0, 0, TT - 1)
            st_scr[0] = k0
            st_scr[1] = jnp.where(k0 >= 0, endabs_ref[b, kc], 0)
            st_scr[2] = jnp.where(k0 >= 0, endj_ref[b, kc], 0)
            st_scr[3] = 0                      # dp state: H
            st_scr[4] = jnp.where(k0 >= 0, segst_ref[b, kc], 0)

        rec_ref[0, :, :] = jnp.zeros((T, 1), jnp.int32)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, w8), 1)

        def read_cell(i_abs, j):
            t = jnp.clip(i_abs - 1 - chunk_lo, 0, T - 1)
            row = moves_ref[0, pl.ds(t, 1), :]
            c_i = crow_ref[0, pl.ds(t, 1), :][0, 0]
            band = j - c_i
            word_idx = jnp.remainder(band, w8)
            word = jnp.sum(jnp.where(lane_iota == word_idx, row, 0))
            nibble = jnp.clip(band // w8, 0, 7)
            return (word >> (4 * nibble)) & 0xF, band

        def cond(state):
            task_k, i_abs, j, s, seg0 = state
            i_rel = i_abs - seg0
            return (task_k >= 0) & ((i_abs > chunk_lo) | (i_rel == 0)
                                    | ((j == 0) & (s == 0)))

        def body(state):
            task_k, i_abs, j, s, seg0 = state
            i_rel = i_abs - seg0
            row0_stop = i_rel == 0
            col0_stop = (~row0_stop) & (s == 0) & (j == 0)

            cell, band = read_cell(i_abs, j)
            escape = (~row0_stop) & (~col0_stop) & ((band < 0) | (band >= W))
            stopping = row0_stop | col0_stop | escape
            code = jnp.where(row0_stop, 0, jnp.where(col0_stop, 1, 2))

            hsrc = cell & 3
            act = jnp.where(s == 1, 1, jnp.where(s == 2, 2, hsrc))
            is_m = act == 0
            is_d = act == 1
            is_i = act == 2

            # per-row record (suppressed on stop iterations)
            t = jnp.clip(i_abs - 1 - chunk_lo, 0, T - 1)
            inc = jnp.where(stopping, 0,
                            jnp.where(is_m, 1, jnp.where(is_i, 2, 8)))
            old = rec_ref[0, pl.ds(t, 1), :]
            rec_ref[0, pl.ds(t, 1), :] = old + inc

            # publish final state for the current task (last write wins)
            lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            fin = jnp.where(lane128 == 0, i_rel,
                            jnp.where(lane128 == 1, j,
                                      jnp.where(lane128 == 2,
                                                jnp.where(stopping, code, -1),
                                                0)))
            kc = jnp.clip(task_k, 0, TT - 1)
            fin_ref[0, pl.ds(kc, 1), :] = fin

            # step (when walking)
            e_ext = ((cell >> 2) & 1) == 1
            f_ext = ((cell >> 3) & 1) == 1
            ni = jnp.where(is_m | is_i, i_abs - 1, i_abs)
            nj = jnp.where(is_m | is_d, j - 1, j)
            nrel = ni - seg0
            ns = jnp.where(is_d & e_ext & (nj > 0), 1,
                           jnp.where(is_i & f_ext & (nrel > 0), 2, 0))

            # advance (when stopping): load the next task's end state
            nk = task_k - 1
            nkc = jnp.clip(nk, 0, TT - 1)
            adv_i = endabs_ref[b, nkc]
            adv_j = endj_ref[b, nkc]
            adv_seg = segst_ref[b, nkc]

            task_k = jnp.where(stopping, nk, task_k)
            i_abs = jnp.where(stopping, adv_i, ni)
            j = jnp.where(stopping, adv_j, nj)
            s = jnp.where(stopping, 0, ns)
            seg0 = jnp.where(stopping, adv_seg, seg0)
            return (task_k, i_abs, j, s, seg0)

        out = jax.lax.while_loop(cond, body, (st_scr[0], st_scr[1],
                                              st_scr[2], st_scr[3],
                                              st_scr[4]))
        for i in range(5):
            st_scr[i] = out[i]

    return kernel


@functools.partial(jax.jit, static_argnames=('W', 'interpret'))
def tape_traceback(moves, c_rel, n_tasks, end_abs, end_j, seg_start, W,
                   interpret: bool = False):
    """On-device traceback over a whole tape. Returns (records (BT, L)
    int32, fin (BT, TT, 3) = (final local i, final j, stop code))."""
    B, L, w8 = moves.shape
    TT = end_abs.shape[1]
    T = min(L, 512)
    n_chunks = L // T
    kernel = _make_tape_traceback_kernel(T, W, n_chunks, TT)
    rec, fin = pl.pallas_call(
        kernel,
        grid=(B, n_chunks),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, T, w8), lambda b, ch: (b, n_chunks - 1 - ch, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 1), lambda b, ch: (b, n_chunks - 1 - ch, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),      # n_tasks (B,)
            pl.BlockSpec(memory_space=pltpu.SMEM),      # end_abs (B, TT)
            pl.BlockSpec(memory_space=pltpu.SMEM),      # end_j (B, TT)
            pl.BlockSpec(memory_space=pltpu.SMEM),      # seg_start (B, TT)
        ],
        out_specs=[
            pl.BlockSpec((1, T, 1), lambda b, ch: (b, n_chunks - 1 - ch, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TT, 128), lambda b, ch: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, TT, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((5,), jnp.int32)],
    )(moves, c_rel[:, :, None].astype(jnp.int32),
      n_tasks.astype(jnp.int32), end_abs.astype(jnp.int32),
      end_j.astype(jnp.int32), seg_start.astype(jnp.int32))
    return rec[:, :, 0], fin[:, :, :3]


@functools.partial(
    jax.jit, static_argnames=('scoring', 'config', 'W', 'interpret'))
def tape_with_traceback(q_tape, flags, r_flat, cbase, c0m, c_n, m_t, n_t,
                        r_base, seg_start, reset_slot, cap_slot, last_slot,
                        n_tasks, scoring, config, W,
                        interpret: bool = False):
    """Forward tape DP + chained on-device traceback in one jit."""
    score, end_i, end_j, moves, c_rel = tape_forward(
        q_tape, flags, r_flat, cbase, c0m, c_n, m_t, n_t, r_base,
        seg_start, reset_slot, cap_slot, last_slot,
        scoring=scoring, config=config, W=W, need_moves=True,
        interpret=interpret)
    valid = n_t > 0
    end_abs = jnp.where(valid, seg_start + end_i, 0)
    ej = jnp.where(valid, end_j, 0)
    ss = jnp.where(valid, seg_start, 0)
    records, fin = tape_traceback(moves, c_rel, n_tasks, end_abs, ej, ss, W,
                                  interpret=interpret)
    return score, end_i, end_j, records, fin
