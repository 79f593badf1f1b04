"""Mega-batched banded DP on a task TAPE (one launch per workload).

Companion to ops/tape.py (host layout). The tape lays every task of an
align_banded call on BT sublane tracks of back-to-back task segments;
one launch advances all BT tracks one DP row per step, so wall time
tracks the tape's SERIAL length (total rows / BT), not task count.

v2 kernel design — REGION lane space:

  * Rows are processed in G-row GROUPS (G = SEG_ALIGN). Within a group
    the kernel works in a fixed "region" coordinate frame: lane k of
    the (BT, GWp) state vectors corresponds to reference column
    j = jr + k, where jr is a per-group constant. Because the frame is
    fixed, the DP needs NO per-row realignment rolls: the vertical
    predecessor is the carry itself and the diagonal predecessor is one
    static shift — the per-row band drift (si) becomes a pair of mask
    bounds [d, d+W) that slide across the region. Carries realign ONCE
    per group (bit-decomposed rolls by the group's total drift).
  * All per-row metadata (band offset d, capture flag, query base) is
    packed into lane r of a per-group (BT, 128) int32 plane; per-group
    scalars (jr, m_act, local row base, drift, reset, row-1 diagonal
    boundary) ride the high lanes of the same plane. The kernel builds
    every mask itself — there is no (rows x W) cellinfo intermediate,
    which both removes the XLA prolog's HBM traffic and shrinks the
    kernel's input stream to the (BT, GWp) int8 reference regions.
  * Results are bit-exact with the bucketed XLA/pallas_banded kernels:
    the row-0 boundary is masked to the row-0 band [c0, c0+W), the
    reset row's out-of-region diagonal H(0, c1-1) arrives as a
    precomputed scalar, and end-selection tie order (corner, then
    free_end_s2 argmax, then free_end_s1 with row 0 winning ties) is
    preserved.
  * The traceback kernel walks ALL of a track's tasks in one pass
    (descending rows), publishing one final-state record per task and
    one int32 path record per row. Moves are stored in region lane
    space; the walker converts j -> region lane via the per-row jr
    sidecar and checks band escape via the per-row c_rel sidecar.

Replaces the role of SeqAn's bandedChainAlignment driving loop
(ref src/semi_global_align.cpp:293-311) at batch scale.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pairwise import NEG, AlignConfig, Scoring
from .pallas_banded import MAX_SHIFT, _prefix_cummax, _shift_right_one
from .tape import SEG_ALIGN

G = SEG_ALIGN

# SC_GRP plane lane assignments (lanes 0..G-1 hold per-row packed info)
_L_JR = G + 0        # per-group region base column jr
_L_M = G + 1        # task m_act (-1 for inactive/pad rows)
_L_LB = G + 2        # local DP row index of the group's first row
_L_ADV = G + 3       # carry realignment shift at group entry
_L_RST = G + 4       # 1 if this group starts with a task reset row
_L_C0 = G + 5        # task's row-0 band offset c[0] (for in-kernel h0)


def _region_width(W):
    """Region lanes: band width + max in-group drift, lane-padded."""
    gw = W + G * MAX_SHIFT
    return (gw + 127) // 128 * 128


def _chunk_rows(W, bt, minimum):
    """Rows per grid step: the largest power of two <= 256 keeping the
    per-chunk VMEM blocks (dominated by the (T, BT, GWp/8) moves block
    and the per-group region/h0/hatn planes) near ~4 MB. Capped at 256:
    Mosaic compile time grows superlinearly in T for this kernel (T=512
    at W=128 took minutes and then crashed the compiler; T=256 compiles
    in seconds)."""
    GWp = _region_width(W)
    per_row = bt * (GWp // 8) * 4 + bt * (9 * GWp + 128 * 8) // G
    t = 256
    while t > minimum and t * per_row > (1 << 22):
        t //= 2
    return max(t, minimum)


def _lane_scalar(plane, lane_iota128, idx):
    """Extract lane `idx` of a (BT, 128) plane as a (BT, 1) vector."""
    if isinstance(idx, int):
        # static lane: a plain slice (one lane-broadcast op) beats the
        # masked 128-lane sum-reduce the dynamic case needs
        return plane[:, idx:idx + 1]
    return jnp.sum(jnp.where(lane_iota128 == idx, plane, 0), axis=1,
                   keepdims=True)


# Widest region (lanes) for the fully-unrolled group body: beyond this
# the unrolled body's live (BT, GWp) temporaries overflow Mosaic's 16 MB
# scoped-VMEM stack (observed at GWp=2304: 32.35M requested), so wide
# bands take the rolled body instead.
UNROLL_MAX_GWP = 1024


def _make_tape_kernel(T, W, GWp, bt, scoring: Scoring,
                      config: AlignConfig, need_moves: bool):
    match_s, mismatch = int(scoring.match), int(scoring.mismatch)
    open_, ext = int(scoring.gap_open), int(scoring.gap_extend)

    def kernel(sc_ref, reg_ref, *out_and_scratch):
        if need_moves:
            (moves_ref, hatn_ref, best_ref,
             h_scr, f_scr, bestv_scr, besti_scr, hatn_scr) = out_and_scratch
        else:
            (hatn_ref, best_ref,
             h_scr, f_scr, bestv_scr, besti_scr, hatn_scr) = out_and_scratch
            moves_ref = None
        lane = jax.lax.broadcasted_iota(jnp.int32, (bt, GWp), 1)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (bt, 128), 1)
        out_lane = lane128

        def boundary_row(j, m_g, c0):
            """H(0, j) per lane, masked to the row-0 band [c0, c0+W)."""
            if config.free_start_s2:
                h0 = jnp.where(j >= 0, 0, NEG)
            else:
                h0 = jnp.where(j > 0, open_ + (j - 1) * ext,
                               jnp.where(j == 0, 0, NEG))
            return jnp.where((j <= m_g) & (j >= c0) & (j < c0 + W),
                             h0, NEG)

        # The body iterates GROUPS with the G rows unrolled: per-group
        # scalars, carry loads/stores, and slot publications happen once
        # per 32 rows, amortising per-row load/branch overhead.
        def group_body(g_local, _):
            grp = sc_ref[pl.ds(g_local, 1), :, :].reshape(bt, 128)
            reg = reg_ref[pl.ds(g_local, 1), :, :] \
                .reshape(bt, GWp).astype(jnp.int32)
            jr = _lane_scalar(grp, lane128, _L_JR)
            m_g = _lane_scalar(grp, lane128, _L_M)
            lb = _lane_scalar(grp, lane128, _L_LB)
            adv = _lane_scalar(grp, lane128, _L_ADV)
            rst = _lane_scalar(grp, lane128, _L_RST)
            c0 = _lane_scalar(grp, lane128, _L_C0)

            # realign carries to the new region frame (shift left by adv
            # lanes; wrapped tail lanes -> NEG)
            h = h_scr[:, :]
            f = f_scr[:, :]
            for b in range(8):
                s = 1 << b
                bit = ((adv >> b) & 1) == 1
                h = jnp.where(bit, pltpu.roll(h, (GWp - s) % GWp, 1), h)
                f = jnp.where(bit, pltpu.roll(f, (GWp - s) % GWp, 1), f)
            tail = lane >= (GWp - adv)
            h = jnp.where(tail, NEG, h)
            f = jnp.where(tail, NEG, f)
            # task reset: swap in the row-0 boundary (computed in place
            # from the boundary formula — no h0 plane input stream)
            h0g = boundary_row(jr + lane, m_g, c0)
            h0m1 = boundary_row(jr - 1, m_g, c0)
            rst_b = rst == 1
            h = jnp.where(rst_b, h0g, h)
            f = jnp.where(rst_b, NEG, f)
            bv = jnp.where(rst_b, NEG, bestv_scr[:, :])
            bi = jnp.where(rst_b, 0, besti_scr[:, :])
            hatn = hatn_scr[:, :]

            # group-constant masks: every j/m_col term is hoisted out of
            # the row loop; per row only the band window [d, d+W) and
            # the `active` gate change
            m_col_g = m_g                       # gated per row by `active`
            j = jr + lane
            lc_lane = j == m_col_g              # <=1 lane per track
            j1m_g = (j >= 1) & (j <= m_col_g)
            col0_g = (j == 0) & (m_col_g >= 0)
            lcm_g = lc_lane & (m_col_g >= 0)
            # group-level decode of the packed per-row metadata: one op
            # over the (BT, 128) plane instead of per-row (BT, 1) ops
            d_pl = grp & 255
            cap_pl = grp & 256
            act_pl = grp & 512
            qv_pl = (grp >> 16) & 255
            # per-lane running best-lastcol within this group (reduced
            # once at group end; lc_lane is group-constant)
            lcv = jnp.full((bt, GWp), NEG, jnp.int32)
            lci = jnp.zeros((bt, GWp), jnp.int32)

            for r_in_g in range(G):
                d = d_pl[:, r_in_g:r_in_g + 1]
                is_capture = cap_pl[:, r_in_g:r_in_g + 1] != 0
                active = act_pl[:, r_in_g:r_in_g + 1] != 0
                qv = qv_pl[:, r_in_g:r_in_g + 1]
                local_i = lb + r_in_g

                # [d, d+W) window as one unsigned compare
                in_win = (lane - d).astype(jnp.uint32) < jnp.uint32(W)
                vba = in_win & active
                valid_ef = vba & j1m_g
                is_col0 = vba & col0_g
                is_match = reg == qv

                f_open = h + open_
                f_ext_v = f + ext
                f_new = jnp.maximum(f_open, f_ext_v)
                f_ext_bit = (f_new == f_ext_v) & (f > NEG // 2)

                sub = jnp.where(is_match, match_s, mismatch)
                h_diag = _shift_right_one(h)
                if r_in_g == 0:
                    # the reset row's left-edge diagonal H(0, c1-1) lives
                    # one lane outside the region; splice the scalar in
                    h_diag = jnp.where(rst_b & (lane == 0), h0m1, h_diag)
                diag = jnp.where(valid_ef, h_diag + sub, NEG)
                if config.free_start_s1:
                    col0_val = jnp.zeros_like(diag)
                else:
                    col0_val = jnp.int32(open_) \
                        + (local_i - 1) * jnp.int32(ext)
                diag = jnp.where(is_col0, col0_val, diag)

                g = jnp.maximum(diag, jnp.where(valid_ef, f_new, NEG))

                cvec = g + open_ - (lane + 1) * ext
                cmax = _prefix_cummax(cvec, max_dist=W - 1)
                e = _shift_right_one(cmax) + lane * ext
                e = jnp.where(valid_ef & (e > NEG // 2), e, NEG)

                # no valid_h re-mask needed: diag, f-term, and e are each
                # literal NEG outside vba & [0, m] already, so the max is
                # exactly NEG there
                h_new = jnp.maximum(g, e)

                e_prev = _shift_right_one(e)
                e_ext_bit = (e == e_prev + ext) & (e_prev > NEG // 2)

                if need_moves:
                    hsrc = jnp.where(h_new == diag, 0,
                                     jnp.where(h_new == e, 1, 2))
                    moves4 = (hsrc | jnp.where(e_ext_bit, 4, 0)
                              | jnp.where(f_ext_bit, 8, 0))
                    # row-packed moves: 8 consecutive rows share one
                    # int32 word per lane (row r in bits 4r..4r+3) — two
                    # vector ops per row and one store per 8 rows,
                    # replacing the 7-roll nibble-plane pack per row
                    sh = 4 * (r_in_g % 8)
                    mv_acc = moves4 if sh == 0 else mv_acc | (moves4 << sh)
                    if r_in_g % 8 == 7:
                        moves_ref[:, pl.ds(g_local * (G // 8)
                                           + r_in_g // 8, 1), :] = \
                            mv_acc[:, None, :]

                h_lc = jnp.where(vba & lcm_g, h_new, NEG)
                better = h_lc > lcv
                lcv = jnp.where(better, h_lc, lcv)
                lci = jnp.where(better, local_i, lci)

                hatn = jnp.where(is_capture, h_new, hatn)
                h, f = h_new, f_new

            # one cross-lane reduce per group: at most one lane per track
            # ever holds a real value, so sum extracts its row index
            gv = jnp.max(lcv, axis=1, keepdims=True)
            gi = jnp.sum(jnp.where(lcv > NEG // 2, lci, 0), axis=1,
                         keepdims=True)
            grp_better = gv > bv
            bv = jnp.where(grp_better, gv, bv)
            bi = jnp.where(grp_better, gi, bi)

            hatn_ref[pl.ds(g_local, 1), :, :] = hatn[None, :, :]
            best_ref[pl.ds(g_local, 1), :, :] = jnp.where(
                out_lane == 0, bv, jnp.where(out_lane == 1, bi, 0)
            )[None, :, :]
            h_scr[:, :] = h
            f_scr[:, :] = f
            bestv_scr[:, :] = bv
            besti_scr[:, :] = bi
            hatn_scr[:, :] = hatn
            return 0

        jax.lax.fori_loop(0, T // G, group_body, 0)

    return kernel


def _make_tape_kernel_rolled(T, W, GWp, bt, scoring: Scoring,
                             config: AlignConfig, need_moves: bool):
    """Row-at-a-time variant for wide bands (GWp > UNROLL_MAX_GWP): the
    fully-unrolled group body would overflow Mosaic's scoped-VMEM stack
    with live (bt, GWp) temporaries. Same math, same outputs; group
    state lives in scratch and the prologue runs under pl.when."""
    match_s, mismatch = int(scoring.match), int(scoring.mismatch)
    open_, ext = int(scoring.gap_open), int(scoring.gap_extend)

    def kernel(sc_ref, reg_ref, *out_and_scratch):
        if need_moves:
            (moves_ref, hatn_ref, best_ref,
             h_scr, f_scr, reg_scr, grp_scr,
             bestv_scr, besti_scr, hatn_scr, mv_scr) = out_and_scratch
        else:
            (hatn_ref, best_ref,
             h_scr, f_scr, reg_scr, grp_scr,
             bestv_scr, besti_scr, hatn_scr) = out_and_scratch
            moves_ref = None
        lane = jax.lax.broadcasted_iota(jnp.int32, (bt, GWp), 1)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (bt, 128), 1)
        out_lane = lane128

        def boundary_row(j, m_g, c0):
            if config.free_start_s2:
                h0 = jnp.where(j >= 0, 0, NEG)
            else:
                h0 = jnp.where(j > 0, open_ + (j - 1) * ext,
                               jnp.where(j == 0, 0, NEG))
            return jnp.where((j <= m_g) & (j >= c0) & (j < c0 + W),
                             h0, NEG)

        def row_body(t, _):
            g_local = t // G
            r_in_g = t - g_local * G

            @pl.when(r_in_g == 0)
            def _group_prologue():
                grp = sc_ref[pl.ds(g_local, 1), :, :].reshape(bt, 128)
                grp_scr[:, :] = grp
                reg_scr[:, :] = reg_ref[pl.ds(g_local, 1), :, :] \
                    .reshape(bt, GWp).astype(jnp.int32)
                jr = _lane_scalar(grp, lane128, _L_JR)
                m_g = _lane_scalar(grp, lane128, _L_M)
                adv = _lane_scalar(grp, lane128, _L_ADV)
                rst = _lane_scalar(grp, lane128, _L_RST)
                c0 = _lane_scalar(grp, lane128, _L_C0)
                h = h_scr[:, :]
                f = f_scr[:, :]
                for b in range(8):
                    s = 1 << b
                    bit = ((adv >> b) & 1) == 1
                    h = jnp.where(bit, pltpu.roll(h, (GWp - s) % GWp, 1), h)
                    f = jnp.where(bit, pltpu.roll(f, (GWp - s) % GWp, 1), f)
                tail = lane >= (GWp - adv)
                h = jnp.where(tail, NEG, h)
                f = jnp.where(tail, NEG, f)
                h0g = boundary_row(jr + lane, m_g, c0)
                rst_b = rst == 1
                h_scr[:, :] = jnp.where(rst_b, h0g, h)
                f_scr[:, :] = jnp.where(rst_b, NEG, f)
                bestv_scr[:, :] = jnp.where(rst_b, NEG, bestv_scr[:, :])
                besti_scr[:, :] = jnp.where(rst_b, 0, besti_scr[:, :])

            grp = grp_scr[:, :]
            jr = _lane_scalar(grp, lane128, _L_JR)
            m_g = _lane_scalar(grp, lane128, _L_M)
            lb = _lane_scalar(grp, lane128, _L_LB)
            rst = _lane_scalar(grp, lane128, _L_RST)
            c0 = _lane_scalar(grp, lane128, _L_C0)

            rowv = _lane_scalar(grp, lane128, r_in_g)
            d = rowv & 255
            is_capture = ((rowv >> 8) & 1) == 1
            active = ((rowv >> 9) & 1) == 1
            qv = (rowv >> 16) & 255
            local_i = lb + r_in_g

            j = jr + lane
            m_col = jnp.where(active, m_g, -1)
            vb = (lane >= d) & (lane < d + W)
            valid_ef = vb & (j >= 1) & (j <= m_col)
            is_col0 = vb & (j == 0) & (m_col >= 0)
            valid_h = vb & (j >= 0) & (j <= m_col)
            is_lastcol = vb & (j == m_col)
            is_match = reg_scr[:, :] == qv

            h_prev = h_scr[:, :]
            f_prev = f_scr[:, :]

            f_open = h_prev + open_
            f_ext_v = f_prev + ext
            f = jnp.maximum(f_open, f_ext_v)
            f_ext_bit = (f == f_ext_v) & (f_prev > NEG // 2)

            sub = jnp.where(is_match, match_s, mismatch)
            h_diag = _shift_right_one(h_prev)
            h0m1 = boundary_row(jr - 1, m_g, c0)
            is_reset_row = (r_in_g == 0) & (rst == 1)
            h_diag = jnp.where(is_reset_row & (lane == 0), h0m1, h_diag)
            diag = jnp.where(valid_ef, h_diag + sub, NEG)
            if config.free_start_s1:
                col0_val = jnp.zeros_like(diag)
            else:
                col0_val = jnp.int32(open_) + (local_i - 1) * jnp.int32(ext)
            diag = jnp.where(is_col0, col0_val, diag)

            g = jnp.maximum(diag, jnp.where(valid_ef, f, NEG))

            cvec = g + open_ - (lane + 1) * ext
            cmax = _prefix_cummax(cvec, max_dist=W - 1)
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
                # row-packed moves (see the unrolled body): row t lands
                # in bits 4*(t%8) of word t//8
                r8 = t % 8
                mv_scr[:, :] = jnp.where(r8 == 0, moves4,
                                         mv_scr[:, :] | (moves4 << (4 * r8)))

                @pl.when(r8 == 7)
                def _flush_moves():
                    moves_ref[:, pl.ds(t // 8, 1), :] = mv_scr[:, :][:, None, :]

            lc_val = jnp.max(jnp.where(is_lastcol, h, NEG), axis=1,
                             keepdims=True)
            bv = bestv_scr[:, :]
            bi = besti_scr[:, :]
            better = lc_val > bv
            bv = jnp.where(better, lc_val, bv)
            bi = jnp.where(better, local_i, bi)
            bestv_scr[:, :] = bv
            besti_scr[:, :] = bi

            hatn = jnp.where(is_capture, h, hatn_scr[:, :])
            hatn_scr[:, :] = hatn
            hatn_ref[pl.ds(g_local, 1), :, :] = hatn[None, :, :]
            best_ref[pl.ds(g_local, 1), :, :] = jnp.where(
                out_lane == 0, bv, jnp.where(out_lane == 1, bi, 0)
            )[None, :, :]

            h_scr[:, :] = h
            f_scr[:, :] = f
            return 0

        jax.lax.fori_loop(0, T, row_body, 0)

    return kernel


def _boundary_vals(j, m, scoring, config):
    """H(0, j) boundary values, NEG outside [0, m]."""
    open_, ext = int(scoring.gap_open), int(scoring.gap_extend)
    if config.free_start_s2:
        h0 = jnp.where(j >= 0, 0, NEG)
    else:
        h0 = jnp.where(j > 0, open_ + (j - 1) * ext,
                       jnp.where(j == 0, 0, NEG))
    return jnp.where(j > m, NEG, h0).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=('scoring', 'config', 'W', 'need_moves', 'interpret'))
def tape_forward(qf, r_flat, cbase, c0m, c_n, m_t, n_t, r_base,
                 seg_start, reset_slot, cap_slot, last_slot,
                 scoring: Scoring, config: AlignConfig, W: int,
                 need_moves: bool, interpret: bool = False):
    """Run the tape DP. Returns (score, end_i, end_j) each (B, TT) plus
    (moves (B, L/8, GWp) row-packed, (c_rel, jr_rows)) for traceback
    chaining."""
    B, L = qf.shape
    GWp = _region_width(W)
    T = min(L, _chunk_rows(W, B, G))
    n_chunks = L // T
    n_groups = L // G

    fl = qf.astype(jnp.int32)
    q_codes = fl & 7
    is_reset = (fl >> 3) & 1
    is_capture = (fl >> 4) & 1
    si = (fl >> 5) & 7
    active = (q_codes != 5).astype(jnp.int32)   # 5 = Q_PAD

    # Per-ROW quantities are pure elementwise/cumsum work: task resets
    # only happen at group starts, so every per-segment base constant
    # cancels inside a group and no per-row gather is needed (gathers
    # over (B, L) measured ~5 us/row of XLA time on this stack).
    S = jnp.cumsum(si, axis=1)                             # (B, L)
    Sg = S[:, ::G]                                         # (B, n_groups)
    d_off = S - jnp.repeat(Sg, G, axis=1)                  # in [0, G*MS]

    # ---- per-group quantities (gathers over n_groups = L/32 only) ------
    rst_g = is_reset[:, ::G]
    seg_id_g = jnp.clip(jnp.cumsum(rst_g, axis=1) - 1, 0, None)
    takeg = lambda a: jnp.take_along_axis(a, seg_id_g, axis=1)
    u_grp = jnp.clip(Sg + takeg(cbase + r_base) + (W - 1), 0, None)
    jr_g = u_grp - takeg(r_base) - (W - 1)
    jr_rows = jnp.repeat(jr_g, G, axis=1)
    adv = jnp.concatenate(
        [jnp.zeros((B, 1), u_grp.dtype), u_grp[:, 1:] - u_grp[:, :-1]],
        axis=1)
    m_g = takeg(m_t)
    c0_g = takeg(c0m)
    pos_g = jnp.arange(n_groups, dtype=jnp.int32)[None, :] * G
    lb_g = pos_g - takeg(seg_start) + 1

    # SC_GRP plane: lanes 0..G-1 = per-row packed info, high lanes =
    # per-group scalars
    rowinfo = (d_off | (is_capture << 8) | (active << 9) | (q_codes << 16))
    plane = jnp.zeros((B, n_groups, 128), jnp.int32)
    plane = plane.at[:, :, :G].set(
        rowinfo.reshape(B, n_groups, G).astype(jnp.int32))
    for idx, vals in ((_L_JR, jr_g), (_L_M, m_g), (_L_LB, lb_g),
                      (_L_ADV, adv), (_L_RST, rst_g), (_L_C0, c0_g)):
        plane = plane.at[:, :, idx].set(vals.astype(jnp.int32))
    sc_grp = jnp.transpose(plane, (1, 0, 2))               # (n_g, B, 128)

    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]

    # ---- reference regions ---------------------------------------------
    def slice_one(r_b, start):
        return jax.lax.dynamic_slice(r_b, (start,), (GWp,))

    regions = jax.vmap(lambda r_b, starts:
                       jax.vmap(lambda s: slice_one(r_b, s))(starts))(
        r_flat, u_grp)                                     # (B, n_g, GWp)
    regions = jnp.transpose(regions, (1, 0, 2))

    import os as _os
    _dbg = _os.environ.get('UNICYCLER_TAPE_PROLOG_ONLY')
    if _dbg:                                            # perf debugging
        if _dbg == '4':
            z = (jnp.sum(qf.astype(jnp.int32))          # upload only
                 + jnp.sum(r_flat.astype(jnp.int32)))
        elif _dbg == '3':
            z = jnp.sum(rowinfo)                        # rows only
        elif _dbg == '2':
            z = jnp.sum(sc_grp)                         # + plane assembly
        else:
            z = jnp.sum(sc_grp) + jnp.sum(regions.astype(jnp.int32))
        zz = jnp.zeros((B, TT_ := cap_slot.shape[1]), jnp.int32) + z
        return (zz, zz, zz, jnp.zeros((B, 1, 1), jnp.int32),
                (jnp.zeros((B, L), jnp.int32), jr_rows))

    unrolled = GWp <= UNROLL_MAX_GWP
    if unrolled:
        kernel = _make_tape_kernel(T, W, GWp, B, scoring, config,
                                   need_moves)
        scratch = [
            pltpu.VMEM((B, GWp), jnp.int32),    # H carry
            pltpu.VMEM((B, GWp), jnp.int32),    # F carry
            pltpu.VMEM((B, 1), jnp.int32),      # best lastcol value
            pltpu.VMEM((B, 1), jnp.int32),      # best lastcol local row
            pltpu.VMEM((B, GWp), jnp.int32),    # captured H at n_act
        ]
    else:
        kernel = _make_tape_kernel_rolled(T, W, GWp, B, scoring,
                                          config, need_moves)
        scratch = [
            pltpu.VMEM((B, GWp), jnp.int32),    # H carry
            pltpu.VMEM((B, GWp), jnp.int32),    # F carry
            pltpu.VMEM((B, GWp), jnp.int32),    # region (int32)
            pltpu.VMEM((B, 128), jnp.int32),    # group plane
            pltpu.VMEM((B, 1), jnp.int32),      # best lastcol value
            pltpu.VMEM((B, 1), jnp.int32),      # best lastcol local row
            pltpu.VMEM((B, GWp), jnp.int32),    # captured H at n_act
        ]
        if need_moves:
            scratch.append(pltpu.VMEM((B, GWp), jnp.int32))  # moves acc
    out_specs, out_shape = [], []
    if need_moves:
        # moves are written track-major (B, L/8, GWp) row-packed (8 rows
        # per int32 word), so the traceback kernel can read (1, T/8,
        # GWp) blocks per track without any whole-array transpose
        out_specs.append(pl.BlockSpec((B, T // 8, GWp),
                                      lambda ch: (0, ch, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, L // 8, GWp), jnp.int32))
    out_specs += [
        pl.BlockSpec((T // G, B, GWp), lambda ch: (ch, 0, 0),
                     memory_space=pltpu.VMEM),             # hatn slots
        pl.BlockSpec((T // G, B, 128), lambda ch: (ch, 0, 0),
                     memory_space=pltpu.VMEM),             # best slots
    ]
    out_shape += [
        jax.ShapeDtypeStruct((n_groups, B, GWp), jnp.int32),
        jax.ShapeDtypeStruct((n_groups, B, 128), jnp.int32),
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((T // G, B, 128), lambda ch: (ch, 0, 0),
                         memory_space=pltpu.VMEM),         # SC_GRP
            pl.BlockSpec((T // G, B, GWp), lambda ch: (ch, 0, 0),
                         memory_space=pltpu.VMEM),         # regions (int8)
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(sc_grp, regions)
    if need_moves:
        moves, hatn_slots, best_slots = outs         # (B, L//8, GWp)
    else:
        hatn_slots, best_slots = outs
        moves = jnp.zeros((B, 1, 1), jnp.int32)

    # ---- end selection, vectorized over (B, TT) task slots -------------
    # (gather the TT relevant slots directly — transposing the full slot
    # planes first costs a whole-array relayout)
    n_slots = n_groups
    cap = jnp.clip(cap_slot, 0, n_slots - 1)
    last = jnp.clip(last_slot, 0, n_slots - 1)
    hatn_t = hatn_slots[cap, bidx]                            # (B,TT,GWp)
    best_t = best_slots[last, bidx]
    jr_cap = jnp.take_along_axis(jr_g, cap, axis=1)           # (B, TT)

    ks = jnp.arange(GWp, dtype=jnp.int32)
    c_rel = jr_rows + d_off                   # band offset per (track,row)
    j_at_n = jr_cap[:, :, None] + ks[None, None, :]
    m3 = m_t[:, :, None]
    k_corner = jnp.clip(m_t - jr_cap, 0, GWp - 1)
    corner_ok = (m_t - c_n >= 0) & (m_t - c_n < W) \
        & (m_t - jr_cap >= 0) & (m_t - jr_cap < GWp)
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
        end_j = jnp.where(better, jr_cap + k_best, end_j)
        end_i = jnp.where(better, n_t, end_i)
        score = jnp.maximum(score, s)
    if config.free_end_s1:
        # row-0 candidate straight from the boundary formula, gated by
        # the row-0 band (v1 semantics: j = m must lie in [c0, c0+W))
        row0_ok = (m_t - c0m >= 0) & (m_t - c0m < W)
        row0 = jnp.where(row0_ok,
                         _boundary_vals(m_t, m_t, scoring, config), NEG)
        kern_val, kern_i = best_t[:, :, 0], best_t[:, :, 1]
        col_val = jnp.where(kern_val > row0, kern_val, row0)
        col_i = jnp.where(kern_val > row0, kern_i, 0)
        better = col_val > score
        end_i = jnp.where(better, col_i, end_i)
        end_j = jnp.where(better, m_t, end_j)
        score = jnp.maximum(score, col_val)
    return score, end_i, end_j, moves, (c_rel, jr_rows)


def _make_tape_traceback_kernel(T, W, GWp, n_chunks, TT):

    def kernel(moves_ref, crow_ref, jrow_ref, ntask_ref, endabs_ref,
               endj_ref, segst_ref, rec_ref, fin_ref, st_scr):
        """Pure-scalar walk: the moves block, per-row sidecars, and both
        outputs live in SMEM, so one walk step is a handful of scalar
        ops (the vector formulation paid a (1, GWp) masked reduce plus
        two VMEM dynamic slices and a 128-lane publish PER STEP —
        ~230 ns; total walk length is the summed path length of every
        task, ~1 row per aligned base, so step cost dominates the whole
        traceback kernel)."""
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

        def _zero_rec(t, _):
            rec_ref[0, t // 8, t % 8] = 0
            return 0

        jax.lax.fori_loop(0, T, _zero_rec, 0)

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

            t = jnp.clip(i_abs - 1 - chunk_lo, 0, T - 1)
            band = j - crow_ref[0, t // 8, t % 8]
            lane_r = jnp.clip(j - jrow_ref[0, t // 8, t % 8], 0, GWp - 1)
            # row-packed moves: word t//8 holds row t in bits 4*(t%8)
            cell = (moves_ref[0, t // 8, lane_r] >> (4 * (t % 8))) & 0xF

            escape = (~row0_stop) & (~col0_stop) & ((band < 0) | (band >= W))
            stopping = row0_stop | col0_stop | escape
            code = jnp.where(row0_stop, 0, jnp.where(col0_stop, 1, 2))

            hsrc = cell & 3
            act = jnp.where(s == 1, 1, jnp.where(s == 2, 2, hsrc))
            is_m = act == 0
            is_d = act == 1
            is_i = act == 2

            # per-row record (suppressed on stop iterations)
            inc = jnp.where(stopping, 0,
                            jnp.where(is_m, 1, jnp.where(is_i, 2, 8)))
            rec_ref[0, t // 8, t % 8] = rec_ref[0, t // 8, t % 8] + inc

            # publish the task's final state on its stop iteration
            @pl.when(stopping)
            def _publish():
                kc = jnp.clip(task_k, 0, TT - 1)
                fin_ref[b, 4 * kc] = i_rel
                fin_ref[b, 4 * kc + 1] = j
                fin_ref[b, 4 * kc + 2] = code

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
def tape_traceback(moves, c_rel, jr_rows, n_tasks, end_abs, end_j,
                   seg_start, W, interpret: bool = False):
    """On-device traceback over a whole tape. Returns (records (B, L)
    int32, fin (B, TT, 3) = (final local i, final j, stop code))."""
    B, Lw, GWp = moves.shape
    L = c_rel.shape[1]       # Lw = L // 8 (row-packed words)
    TT = end_abs.shape[1]
    # Rows per grid step: capped so the (T/8, GWp) int32 SMEM moves
    # window stays within the scalar memory budget (wide-band launches,
    # e.g. 60 kb consensus-vs-path alignments at W=2048+, otherwise
    # request >500 KB scoped SMEM and fail to compile). Floor 64: the
    # window's second-to-last dim (T/8) must stay 8-divisible, so the
    # widest bands accept a ~270 KB double-buffered window instead. L is
    # a multiple of 256, so every halving still divides it.
    T = min(L, 256)
    while T > 64 and (T // 8) * GWp * 4 > 96 * 1024:
        T //= 2
    n_chunks = L // T
    kernel = _make_tape_traceback_kernel(T, W, GWp, n_chunks, TT)
    rec, fin = pl.pallas_call(
        kernel,
        grid=(B, n_chunks),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, T // 8, GWp),
                         lambda b, ch: (b, n_chunks - 1 - ch, 0),
                         memory_space=pltpu.SMEM),
            # sidecars ride (B, L/8, 8) so the window's last dim is the
            # full 8 (an SMEM window pads its last dim: the previous
            # (1, T, 1) windows each occupied 128x their true size,
            # blowing the scalar-memory budget on many-task launches)
            pl.BlockSpec((1, T // 8, 8),
                         lambda b, ch: (b, n_chunks - 1 - ch, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, T // 8, 8),
                         lambda b, ch: (b, n_chunks - 1 - ch, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),      # n_tasks (B,)
            pl.BlockSpec(memory_space=pltpu.SMEM),      # end_abs (B, TT)
            pl.BlockSpec(memory_space=pltpu.SMEM),      # end_j (B, TT)
            pl.BlockSpec(memory_space=pltpu.SMEM),      # seg_start (B, TT)
        ],
        out_specs=[
            pl.BlockSpec((1, T // 8, 8),
                         lambda b, ch: (b, n_chunks - 1 - ch, 0),
                         memory_space=pltpu.SMEM),
            # fin is an unblocked whole-array output: every (track,
            # chunk) grid step may publish to its own track's slots
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L // 8, 8), jnp.int32),
            jax.ShapeDtypeStruct((B, 4 * TT), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((5,), jnp.int32)],
    )(moves, c_rel.reshape(B, L // 8, 8).astype(jnp.int32),
      jr_rows.reshape(B, L // 8, 8).astype(jnp.int32),
      n_tasks.astype(jnp.int32), end_abs.astype(jnp.int32),
      end_j.astype(jnp.int32), seg_start.astype(jnp.int32))
    return rec.reshape(B, L), fin.reshape(B, TT, 4)[:, :, :3]


@functools.partial(jax.jit, static_argnames=('cap',))
@functools.partial(jax.jit, static_argnames=('cap',))
def compress_records(records, cap: int, segments=None):
    """Sparse-compress traceback row records for the device->host fetch.

    A walked row's record is 1 (a single M step) on every error-free row
    — the overwhelming majority — and 0 on unwalked/pad rows. Only the
    exceptions (I steps, D runs, stop rows with D moves) carry
    information, so the fetch ships (flat index, value) pairs for rows
    with record not in {0, 1}; the host rebuilds the dense array with
    default 1 (the decoder never reads unwalked rows, and a stop row's
    default 1 decodes to d_stop = 0, which is exactly its meaning when
    absent here). Rows outside every task's [seg_start, seg_start+n_t]
    range are pad: the reverse walk crosses them and stores junk moves
    there, so they must be masked out or nnz scales with the PADDED
    tape size rather than the real workload — pass ``segments`` =
    (seg_start (B,TT), seg_len (B,TT)) to build the in-use mask from a
    scattered +1/-1 range cumsum. Returns (nnz (1,), idx (cap,),
    vals (cap,)); callers must fall back to fetching `records` itself
    when nnz > cap."""
    if segments is not None:
        seg_start, seg_len = segments
        B, L = records.shape
        tr = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[:, None], seg_start.shape)
        valid = seg_len > 0
        starts = jnp.where(valid, seg_start, L + 1)
        ends = jnp.where(valid, jnp.minimum(seg_start + seg_len + 1, L + 1),
                         L + 1)
        delta = jnp.zeros((B, L + 2), jnp.int32)
        delta = delta.at[tr, starts].add(1, mode='drop')
        delta = delta.at[tr, ends].add(-1, mode='drop')
        in_use = jnp.cumsum(delta[:, :L], axis=1) > 0
        records = jnp.where(in_use, records, 0)
    flat = records.reshape(-1)
    interesting = (flat != 1) & (flat != 0)
    nnz = jnp.sum(interesting.astype(jnp.int32))
    pos = jnp.cumsum(interesting.astype(jnp.int32)) - 1
    tgt = jnp.where(interesting, pos, cap)
    idx = jnp.full((cap,), -1, jnp.int32).at[tgt].set(
        jnp.arange(flat.shape[0], dtype=jnp.int32), mode='drop')
    vals = jnp.zeros((cap,), jnp.int32).at[tgt].set(flat, mode='drop')
    return nnz[None], idx, vals


@functools.partial(
    jax.jit, static_argnames=('scoring', 'config', 'W', 'interpret'))
def tape_with_traceback(qf, r_flat, cbase, c0m, c_n, m_t, n_t,
                        r_base, seg_start, reset_slot, cap_slot, last_slot,
                        n_tasks, scoring, config, W,
                        interpret: bool = False):
    """Forward tape DP + chained on-device traceback in one jit."""
    score, end_i, end_j, moves, (c_rel, jr_rows) = tape_forward(
        qf, r_flat, cbase, c0m, c_n, m_t, n_t, r_base,
        seg_start, reset_slot, cap_slot, last_slot,
        scoring=scoring, config=config, W=W, need_moves=True,
        interpret=interpret)
    valid = n_t > 0
    end_abs = jnp.where(valid, seg_start + end_i, 0)
    ej = jnp.where(valid, end_j, 0)
    ss = jnp.where(valid, seg_start, 0)
    records, fin = tape_traceback(moves, c_rel, jr_rows, n_tasks, end_abs,
                                  ej, ss, W, interpret=interpret)
    return score, end_i, end_j, records, fin
