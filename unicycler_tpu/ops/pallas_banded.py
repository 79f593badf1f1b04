"""Pallas TPU kernel for the banded corridor DP.

The XLA lax.scan formulation (ops/banded.py) is correct everywhere but its
while-loop dispatch overhead on the axon TPU stack is ~ms per row; this
Mosaic kernel runs the row loop on-core. Design:

  * grid = (B / BT, n_chunks): batch tiles outer, row chunks inner. TPU
    grid steps run sequentially on one core and VMEM scratch persists
    across them, so the DP carry (H, F rows, running best-lastcol) lives
    in scratch and flows chunk to chunk, re-initialised at chunk == 0.
  * Each program advances BT=8 alignments at once: state vectors are
    (8, W) int32 — full 8x128 VPU tiles at W=256.
  * Mosaic forbids dynamic indexing on the lane (minor) dimension, so ALL
    per-row, per-lane information is precomputed in XLA into one int32
    'cellinfo' tensor (B, n_pad, W) that the kernel loads with a dynamic
    SUBLANE index only:
        bit 0: q_i == r_j (match)
        bit 1: 1 <= j <= m_act (diag/E/F-valid lane)
        bit 2: j == 0 (column-0 boundary lane)
        bit 3: 0 <= j <= m_act (H-valid lane)
        bits 4-6: si = band drift c[i] - c[i-1], clipped to 0..4
        bit 7: j == m_act (last-column lane)
  * Previous-row realignment is an elementwise select over statically
    rolled copies (si <= 4 by corridor smoothing); the E-state prefix
    cummax is a log2(W) ladder of static rolls.
  * Traceback bits are packed 8 lanes per int32 word in 'nibble-plane'
    layout: word w holds lanes {w, w+W/8, ..., w+7W/8}, lane g*W/8+w in
    nibble g. Same layout as ops/banded.py's packer and the native
    decoder.

End-cell selection happens in XLA afterwards from the kernel's h_at_n row,
running best-lastcol accumulator, and the row-0 candidate.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pairwise import NEG, AlignConfig, Scoring

BT = 32          # batch tile / tape track count (sublane dimension).
# 32 tracks = 4 int32 sublane tiles: per-row vector ops grow 4x wider
# (still VPU-shaped) while the tape's SERIAL row loop shrinks 4x — the
# kernel is per-step-overhead-bound, so wall time tracks step count.
MAX_SHIFT = 4    # max per-row band drift (corridors are smoothed to this)


def _select_shifted(x, si, shifts):
    """result lane k = x[k + s] where s is selected per element by si
    (an (8, W) int32 of per-row shift values, constant along lanes)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    W = x.shape[1]
    out = jnp.full_like(x, NEG)
    for s in shifts:
        rolled = x if s == 0 else pltpu.roll(x, (W - s) % W, 1)
        if s > 0:
            rolled = jnp.where(lane < W - s, rolled, NEG)
        elif s < 0:
            rolled = jnp.where(lane >= -s, rolled, NEG)
        out = jnp.where(si == s, rolled, out)
    return out


def _shift_right_neg(x, d):
    """x shifted right by d lanes, left-filled with NEG, via static
    slicing (lowers to a static lane shift — cheaper than the
    roll + iota-compare + select formulation)."""
    b = x.shape[0]
    fill = jnp.full((b, d), NEG, x.dtype)
    return jnp.concatenate([fill, x[:, :x.shape[1] - d]], axis=1)


def _prefix_cummax(x, max_dist=None):
    """Inclusive prefix max along lanes via a log ladder of static
    shifts. max_dist bounds the propagation distance actually needed
    (the tape kernel's E chain cannot span more than the band width,
    which is narrower than its region frame — one ladder step saved)."""
    W = x.shape[1]
    if max_dist is not None:
        W = min(W, max_dist + 1)
    d = 1
    while d < W:
        x = jnp.maximum(x, _shift_right_neg(x, d))
        d *= 2
    return x


def _shift_right_one(x):
    return _shift_right_neg(x, 1)


def pack_moves_rows(moves4):
    """(.., W) int32 4-bit values -> (.., W/8) int32 nibble-plane words."""
    W = moves4.shape[-1]
    w8 = W // 8
    packed = moves4[..., 0:w8]
    for g in range(1, 8):
        packed = packed | (moves4[..., g * w8:(g + 1) * w8] << (4 * g))
    return packed


def pack_moves_rows_kernel(moves4):
    """pack_moves_rows for use INSIDE a Mosaic kernel. Mosaic miscompiles
    strided lane slices whose offset is >= 192 lanes on 3-register
    (384-lane) vectors — the slice silently reads zeros — so the nibble
    planes are gathered with verified lane rolls and a single offset-0
    prefix slice instead."""
    W = moves4.shape[-1]
    w8 = W // 8
    acc = moves4
    for g in range(1, 8):
        acc = acc | (pltpu.roll(moves4, W - g * w8, 1) << (4 * g))
    return acc[..., :w8]


def _chunk_rows_bucketed(W, minimum=8):
    """Rows per grid step for the bucketed kernel: largest power of two
    <= 512 keeping the double-buffered (BT, T, W) int32 cellinfo block
    plus the (BT, T, W/8) moves block within ~8 MB of VMEM."""
    per_row = BT * W * 4 * 2 + BT * (W // 8) * 4
    t = 512
    while t > minimum and t * per_row > (1 << 23):
        t //= 2
    return max(t, minimum)


def _make_kernel(T, W, scoring: Scoring, config: AlignConfig,
                 need_moves: bool = True):
    match, mismatch = int(scoring.match), int(scoring.mismatch)
    open_, ext = int(scoring.gap_open), int(scoring.gap_extend)

    def kernel(cellinfo_ref, h0_ref, nact_ref, *out_and_scratch):
        if need_moves:
            (moves_ref, hatn_ref, best_ref,
             h_scr, f_scr, bestv_scr, besti_scr) = out_and_scratch
        else:
            (hatn_ref, best_ref,
             h_scr, f_scr, bestv_scr, besti_scr) = out_and_scratch
            moves_ref = None
        chunk = pl.program_id(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (BT, W), 1)
        n_act = nact_ref[:, 0:1]                      # (BT, 1)

        @pl.when(chunk == 0)
        def _init():
            h0 = h0_ref[:, :]
            h_scr[:, :] = h0
            f_scr[:, :] = jnp.full((BT, W), NEG, jnp.int32)
            bestv_scr[:, :] = jnp.full((BT, 1), NEG, jnp.int32)
            besti_scr[:, :] = jnp.zeros((BT, 1), jnp.int32)
            hatn_ref[:, :] = jnp.where(n_act == 0, h0, NEG).astype(jnp.int32)

        def row_body(t, _):
            i = chunk * T + t + 1                     # global DP row, 1-based
            h_prev = h_scr[:, :]
            f_prev = f_scr[:, :]
            bits = cellinfo_ref[:, pl.ds(t, 1), :].reshape(BT, W)
            is_match = (bits & 1) == 1
            valid_ef = (bits & 2) == 2
            is_col0 = (bits & 4) == 4
            valid_h = (bits & 8) == 8
            si = (bits >> 4) & 7
            is_lastcol = (bits & 128) == 128

            h_up = _select_shifted(h_prev, si, list(range(0, MAX_SHIFT + 1)))
            f_up = _select_shifted(f_prev, si, list(range(0, MAX_SHIFT + 1)))
            h_diag = _select_shifted(h_prev, si - 1,
                                     list(range(-1, MAX_SHIFT)))

            f_open = h_up + open_
            f_ext_v = f_up + ext
            f = jnp.maximum(f_open, f_ext_v)
            f_ext_bit = (f == f_ext_v) & (f_up > NEG // 2)

            sub = jnp.where(is_match, match, mismatch)
            diag = jnp.where(valid_ef, h_diag + sub, NEG)
            if config.free_start_s1:
                col0_val = jnp.int32(0)
            else:
                col0_val = jnp.int32(open_) + (i - 1) * jnp.int32(ext)
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
                packed = pack_moves_rows_kernel(moves4)
                moves_ref[:, pl.ds(t, 1), :] = packed[:, None, :]

            # running best last-column candidate (strict > keeps first max,
            # matching jnp.argmax semantics in the XLA end selection)
            lc_val = jnp.max(jnp.where(is_lastcol, h, NEG), axis=1,
                             keepdims=True)            # (BT, 1)
            better = (lc_val > bestv_scr[:, :]) & (i <= n_act)
            bestv_scr[:, :] = jnp.where(better, lc_val, bestv_scr[:, :])
            besti_scr[:, :] = jnp.where(better, i, besti_scr[:, :])

            # capture H row at i == n_act
            hatn_ref[:, :] = jnp.where(i == n_act, h, hatn_ref[:, :])

            h_scr[:, :] = h
            f_scr[:, :] = f
            return 0

        jax.lax.fori_loop(0, T, row_body, 0)

        # publish the running best (lanes 0 and 1 of a 128-lane vector)
        out_lane = jax.lax.broadcasted_iota(jnp.int32, (BT, 128), 1)
        best_ref[:, :] = jnp.where(out_lane == 0, bestv_scr[:, :],
                                   jnp.where(out_lane == 1,
                                             besti_scr[:, :], 0))

    return kernel


_ROW_GROUP = 32          # rows per reference-window slice group


def _build_reference_windows(r_ext, crow, W):
    """rwin[b, i, k] = r_ext[b, crow[b,i] - 1 + W + k] without a big gather.

    take_along_axis over 10^8 elements costs seconds of XLA gather time
    (and ~30 s of compile); instead, rows are grouped (the window start
    drifts <= MAX_SHIFT per row), each group takes ONE small dynamic
    slice, and per-row alignment within the group is a log ladder of
    static lane rolls selected by the bits of the relative offset."""
    B, n_pad = crow.shape
    G = _ROW_GROUP
    n_groups = n_pad // G
    u = crow + (W - 1)                                  # (B, n_pad)
    u0 = u[:, ::G]                                      # (B, n_groups)
    GW = W + G * MAX_SHIFT                              # group window width

    def slice_one(r_b, start):
        return jax.lax.dynamic_slice(r_b, (start,), (GW,))

    win = jax.vmap(lambda r_b, starts:
                   jax.vmap(lambda s: slice_one(r_b, s))(starts))(r_ext, u0)
    # broadcast each group's window to its rows
    X = jnp.repeat(win, G, axis=1)                      # (B, n_pad, GW)
    rel = u - jnp.repeat(u0, G, axis=1)                 # in [0, G*MAX_SHIFT]
    rel = rel[:, :, None]
    shift = 1
    while shift < GW:
        if shift <= G * MAX_SHIFT:
            X = jnp.where((rel & shift) != 0,
                          jnp.roll(X, -shift, axis=2), X)
        shift *= 2
    return X[:, :, :W]


@functools.partial(jax.jit,
                   static_argnames=('scoring', 'config', 'W', 'need_moves'))
def pallas_banded_batch(q_batch, r_ext_batch, c_batch, n_acts, m_acts,
                        scoring: Scoring, config: AlignConfig, W: int,
                        need_moves: bool = True):
    """Drop-in equivalent of ops.banded.banded_batch_device backed by the
    Pallas kernel. Returns (score, end_i, end_j, packed_moves) where
    packed_moves is (B, n_pad, W/8) int32 in nibble-plane layout."""
    B, n_pad = q_batch.shape
    assert B % BT == 0, 'batch must be padded to a multiple of %d' % BT
    T = min(n_pad, _chunk_rows_bucketed(W))
    n_chunks = n_pad // T

    c = c_batch.astype(jnp.int32)
    n_acts = n_acts.astype(jnp.int32)
    m_acts = m_acts.astype(jnp.int32)
    open_, ext = int(scoring.gap_open), int(scoring.gap_extend)

    # ---- XLA precompute: cellinfo, row-0 boundary, row-0 candidate ------
    crow = c[:, 1:]                                   # (B, n_pad)
    rwin = _build_reference_windows(r_ext_batch, crow, W)
    j = crow[:, :, None] + jnp.arange(W)[None, None, :]     # (B, n_pad, W)
    m_col = m_acts[:, None, None]
    match = (q_batch[:, :, None] == rwin)
    valid_ef = (j >= 1) & (j <= m_col)
    is_col0 = (j == 0)
    valid_h = (j >= 0) & (j <= m_col)
    si = jnp.clip(crow - c[:, :-1], 0, MAX_SHIFT)           # (B, n_pad)
    cellinfo = (match.astype(jnp.int32)
                | (valid_ef.astype(jnp.int32) << 1)
                | (is_col0.astype(jnp.int32) << 2)
                | (valid_h.astype(jnp.int32) << 3)
                | (si[:, :, None] << 4)
                | ((j == m_col).astype(jnp.int32) << 7))

    ks = jnp.arange(W, dtype=jnp.int32)
    j0 = c[:, 0:1] + ks[None, :]                            # (B, W)
    if config.free_start_s2:
        h0 = jnp.where(j0 >= 0, 0, NEG)
    else:
        h0 = jnp.where(j0 > 0, open_ + (j0 - 1) * ext,
                       jnp.where(j0 == 0, 0, NEG))
    h0 = jnp.where(j0 > m_acts[:, None], NEG, h0).astype(jnp.int32)

    kernel = _make_kernel(T, W, scoring, config, need_moves)
    grid = (B // BT, n_chunks)
    out_specs = []
    out_shape = []
    if need_moves:
        out_specs.append(pl.BlockSpec((BT, T, W // 8),
                                      lambda b, ch: (b, ch, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, n_pad, W // 8),
                                              jnp.int32))
    out_specs += [
        pl.BlockSpec((BT, W), lambda b, ch: (b, 0),
                     memory_space=pltpu.VMEM),           # h_at_n
        pl.BlockSpec((BT, 128), lambda b, ch: (b, 0),
                     memory_space=pltpu.VMEM),           # best lastcol
    ]
    out_shape += [
        jax.ShapeDtypeStruct((B, W), jnp.int32),
        jax.ShapeDtypeStruct((B, 128), jnp.int32),
    ]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BT, T, W), lambda b, ch: (b, ch, 0),
                         memory_space=pltpu.VMEM),           # cellinfo
            pl.BlockSpec((BT, W), lambda b, ch: (b, 0),
                         memory_space=pltpu.VMEM),           # h0
            pl.BlockSpec((BT, 1), lambda b, ch: (b, 0),
                         memory_space=pltpu.VMEM),           # n_act
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((BT, W), jnp.int32),    # H carry
            pltpu.VMEM((BT, W), jnp.int32),    # F carry
            pltpu.VMEM((BT, 1), jnp.int32),    # best lastcol value
            pltpu.VMEM((BT, 1), jnp.int32),    # best lastcol row
        ],
    )(cellinfo, h0, n_acts[:, None])
    if need_moves:
        moves, h_at_n, best = outs
    else:
        h_at_n, best = outs
        moves = jnp.zeros((B, 1, 1), jnp.int32)

    # ---- End-cell selection (same semantics as ops/banded.py) -----------
    def select_ends(h_at_n_b, best_b, h0_b, c_b, n_act, m_act):
        c_n = c_b[n_act]
        j_at_n = c_n + ks
        k_corner = m_act - c_n
        corner_ok = (k_corner >= 0) & (k_corner < W)
        corner = jnp.where(corner_ok,
                           h_at_n_b[jnp.clip(k_corner, 0, W - 1)], NEG)
        best_score = corner
        end_i = n_act
        end_j = m_act
        if config.free_end_s2:
            row_vals = jnp.where(j_at_n <= m_act, h_at_n_b, NEG)
            k_best = jnp.argmax(row_vals).astype(jnp.int32)
            s = row_vals[k_best]
            better = s > best_score
            end_j = jnp.where(better, c_n + k_best, end_j)
            end_i = jnp.where(better, n_act, end_i)
            best_score = jnp.maximum(best_score, s)
        if config.free_end_s1:
            # candidates: row 0 (computed here) then the kernel's best of
            # rows 1..n_act; row 0 wins ties (first-max order).
            k0 = m_act - c_b[0]
            row0 = jnp.where((k0 >= 0) & (k0 < W),
                             h0_b[jnp.clip(k0, 0, W - 1)], NEG)
            kern_val, kern_i = best_b[0], best_b[1]
            col_val = jnp.where(kern_val > row0, kern_val, row0)
            col_i = jnp.where(kern_val > row0, kern_i, 0)
            better = col_val > best_score
            end_i = jnp.where(better, col_i, end_i)
            end_j = jnp.where(better, m_act, end_j)
            best_score = jnp.maximum(best_score, col_val)
        return best_score, end_i, end_j

    score, end_i, end_j = jax.vmap(select_ends)(h_at_n, best, h0, c,
                                                n_acts, m_acts)
    return score, end_i, end_j, moves


@functools.partial(jax.jit, static_argnames=('scoring', 'config', 'W'))
def pallas_banded_with_traceback(q_batch, r_ext_batch, c_batch, n_acts,
                                 m_acts, scoring, config, W):
    """Forward DP + ON-DEVICE traceback in one jit: the move planes never
    leave the device; only 4-byte-per-row path records transfer.
    Returns (score, end_i, end_j, records (B, n_pad), final (B, 3))."""
    from .pallas_traceback import traceback_device
    score, end_i, end_j, moves = pallas_banded_batch(
        q_batch, r_ext_batch, c_batch, n_acts, m_acts, scoring, config, W,
        need_moves=True)
    records, final = traceback_device(moves, c_batch[:, 1:].astype(jnp.int32),
                                      end_i, end_j, W)
    return score, end_i, end_j, records, final
