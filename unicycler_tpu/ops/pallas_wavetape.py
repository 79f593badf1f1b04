"""Anti-diagonal wavefront banded DP over a task TAPE — production kernels.

Companion to ops/wavetape.py (host layout). This is the round-3
integration of the ops/pallas_wavefront.py prototype (measured ~4.4x the
row tape kernel's forward rate on hardware, PERF.md): the intra-row
prefix-cummax ladder is gone — every Gotoh predecessor lives on
wavefront a-1 (E from (i, j-1), F from (i-1, j)) or a-2 (the diagonal),
so one wavefront step is a handful of shifted elementwise ops.

Differences from the prototype that make it production-grade:

  * TAPE packing: BT sublane tracks of back-to-back task segments along
    the wavefront axis; task resets are group-aligned (carries NEG-clear,
    no boundary swap needed — row-0/column-0 boundary cells inject
    incrementally per wavefront).
  * ZQ/ZR windows are loaded INSIDE the kernel: the jit prolog expands
    the 1-byte-per-row tapes to repeat-2 LANE tapes (q2/r2, one cheap
    elementwise repeat; q is stored task-REVERSED by the host builder),
    after which a group's window is a single ascending dynamic slice
    per track — q2[S + x] with S linear in the group metadata. This
    replaces a gather prolog (one XLA DMA per (group, track)) that cost
    0.82 us/wavefront, 4x the wavefront DP itself; host-side planes
    would be ~60 B/row of host->device traffic.
  * End captures accumulate in per-group LOCAL per-lane arrays and merge
    into RUNNING SCALARS per track (corner, best row-n value + smallest
    j, best column-m value + smallest i) — published per group to slot
    planes; end selection gathers each task's last group. No absolute-
    frame Wcap arrays, so total corridor drift is unbounded.
  * MOVES are emitted in wavefront coordinates ((BT, LA/8, W) int32, 8
    wavefronts per word, 4 bits per lane) and walked by a scalar SMEM
    kernel in (wavefront address, diagonal lane) space; per-VISITED-
    wavefront records (1=M, 2=D, 3=I) reuse the sparse default-1 fetch
    trick (an M-skipped address rebuilt as 1 is never read because the
    decoder jumps it; a true M's default 1 is exactly right).

Output semantics: identical AlignConfig end-selection tie order as
ops/banded._banded_single; the effective band is the GROUP-QUANTIZED
corridor window (exact vs the row kernels on straight corridors; on
drifting corridors the window is re-quantized per G wavefronts — the
same semantics the prototype pinned against a literal numpy oracle).

Replaces SeqAn's bandedChainAlignment driving loop at batch scale
(ref src/semi_global_align.cpp:293-311).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pairwise import NEG, AlignConfig, Scoring
from .pallas_wavefront import _dyn_roll, _shift_left, _shift_right
from .wavetape import G

_BIG = 1 << 30

# plane lane assignments (per-group scalars)
_L_DB = 0     # window base diagonal dbase_g
_L_ADV = 1    # carry realignment advance at group entry
_L_RST = 2    # 1 if a task starts at this group
_L_HIT = 3    # 1 if any wavefront of the group crosses row n / column m
_L_A0 = 4     # task-local wavefront of the group's first step
_L_N2 = 5     # 2 * n_act of the owning task (-2 for pad)
_L_M2 = 6     # 2 * m_act


def _region_width(W):
    return (W + G + 127) // 128 * 128


def _chunk_wavefronts(W, bt, resident_bytes=0):
    """Wavefronts per grid step: largest power-of-two multiple of G
    <= 256 keeping the per-chunk VMEM blocks (moves dominates) within
    ~4 MB after the whole-call residents (q2/r2 lane tapes)."""
    per_wf = bt * W // 2 + bt * 128 * 8 // G
    budget = max(1 << 20, (1 << 22) - resident_bytes)
    t = 256
    while t > G and t * per_wf > budget:
        t //= 2
    return max(t, G)


def _make_wavetape_kernel(T, W, GWp, bt, scoring: Scoring,
                          config: AlignConfig, need_moves: bool):
    match_s, mismatch = int(scoring.match), int(scoring.mismatch)
    open_, ext = int(scoring.gap_open), int(scoring.gap_extend)

    def kernel(pl_ref, q2_ref, r2_ref, sq_ref, *out_and_scratch):
        if need_moves:
            (moves_ref, best_ref, h1_scr, h2_scr, e_scr, f_scr,
             cor_scr, rnv_scr, rnj_scr, lcv_scr, lci_scr) = out_and_scratch
        else:
            (best_ref, h1_scr, h2_scr, e_scr, f_scr,
             cor_scr, rnv_scr, rnj_scr, lcv_scr, lci_scr) = out_and_scratch
            moves_ref = None
        lane = jax.lax.broadcasted_iota(jnp.int32, (bt, W), 1)
        out_lane = jax.lax.broadcasted_iota(jnp.int32, (bt, 128), 1)
        ch = pl.program_id(0)

        @pl.when(ch == 0)
        def _init():
            h1_scr[:, :] = jnp.full((bt, W), NEG, jnp.int32)
            h2_scr[:, :] = jnp.full((bt, W), NEG, jnp.int32)
            e_scr[:, :] = jnp.full((bt, W), NEG, jnp.int32)
            f_scr[:, :] = jnp.full((bt, W), NEG, jnp.int32)
            cor_scr[:, :] = jnp.full((bt, 1), NEG, jnp.int32)
            rnv_scr[:, :] = jnp.full((bt, 1), NEG, jnp.int32)
            rnj_scr[:, :] = jnp.zeros((bt, 1), jnp.int32)
            lcv_scr[:, :] = jnp.full((bt, 1), NEG, jnp.int32)
            lci_scr[:, :] = jnp.zeros((bt, 1), jnp.int32)

        GWe = GWp + 128

        def load_windows(gl, src_ref, col):
            """(bt, GWp) int32 lane window per track: one 128-aligned
            VMEM load of GWp+128 lanes at (s >> 7) * 128 (Mosaic needs
            provable lane alignment), then a rotate by the residual —
            one static roll plus an 8-bit conditional-roll ladder (the
            carry-realign trick). Replaces the XLA gather prolog that
            cost 0.82 us/wavefront."""
            rows, res = [], []
            for tr in range(bt):
                s = sq_ref[gl, tr, col]
                rows.append(src_ref[pl.ds(tr, 1),
                                    pl.ds((s >> 7) * 128, GWe)])
                res.append(s & 127)
            z = jnp.concatenate(rows, axis=0).astype(jnp.int32)
            resv = jnp.concatenate(
                [r.reshape(1, 1) for r in res], axis=0)   # (bt, 1)
            # out[x] = z[x + res]: rotate right by (GWe - res) =
            # static (GWe - 128) + dynamic (128 - res), 8 bits
            z = pltpu.roll(z, GWe - 128, 1)
            z = _dyn_roll(z, 128 - resv, 8)
            return z[:, :GWp]

        def group_body(gl, _):
            grp = pl_ref[pl.ds(gl, 1), :, :].reshape(bt, 128)
            zq = load_windows(gl, q2_ref, 0)
            zr = load_windows(gl, r2_ref, 1)
            c0w = grp[:, _L_DB:_L_DB + 1]
            adv = grp[:, _L_ADV:_L_ADV + 1]
            rst = grp[:, _L_RST:_L_RST + 1]
            ag0 = grp[:, _L_A0:_L_A0 + 1]
            n2 = grp[:, _L_N2:_L_N2 + 1]
            m2 = grp[:, _L_M2:_L_M2 + 1]
            mm = m2 >> 1
            nn = n2 >> 1

            # ---- realign carries to this group's window (gated) --------
            def _realign(carries):
                t_adv = jnp.mod(128 - adv, W)
                ok = ((lane + adv) >= 0) & ((lane + adv) < W)
                out = []
                for x in carries:
                    y = _dyn_roll(x, t_adv, 8)
                    s = (W - 128) % W
                    if s:
                        y = pltpu.roll(y, s, 1)
                    out.append(jnp.where(ok, y, NEG))
                return tuple(out)

            h1, h2, e, f = jax.lax.cond(
                jnp.any(adv != 0), _realign, lambda c: c,
                (h1_scr[:, :], h2_scr[:, :], e_scr[:, :], f_scr[:, :]))

            # ---- task reset: clear carries and running scalars ---------
            rst_b = rst == 1
            h1 = jnp.where(rst_b, NEG, h1)
            h2 = jnp.where(rst_b, NEG, h2)
            e = jnp.where(rst_b, NEG, e)
            f = jnp.where(rst_b, NEG, f)
            cor = jnp.where(rst_b, NEG, cor_scr[:, :])
            rnv = jnp.where(rst_b, NEG, rnv_scr[:, :])
            rnj = jnp.where(rst_b, 0, rnj_scr[:, :])
            lcv = jnp.where(rst_b, NEG, lcv_scr[:, :])
            lci = jnp.where(rst_b, 0, lci_scr[:, :])

            hat_l = jnp.full((bt, W), NEG, jnp.int32)
            cor_l = jnp.full((bt, W), NEG, jnp.int32)
            lcv_l = jnp.full((bt, W), NEG, jnp.int32)
            lci_l = jnp.zeros((bt, W), jnp.int32)

            for t in range(G):
                a = ag0 + t                   # (bt, 1) task-local wavefront
                u = a - c0w
                jv = a + c0w
                qv = zq[:, G - 1 - t:G - 1 - t + W]
                rv = zr[:, t:t + W]

                fl = _shift_left(f)
                er = _shift_right(e)
                f_new = jnp.maximum(_shift_left(h1) + open_, fl + ext)
                f_ext_bit = (f_new == fl + ext) & (fl > NEG // 2)
                e_new = jnp.maximum(_shift_right(h1) + open_, er + ext)
                e_ext_bit = (e_new == er + ext) & (er > NEG // 2)
                e_new = jnp.where(e_new > NEG // 2, e_new, NEG)

                sub = jnp.where(qv == rv, match_s, mismatch)
                i1n = (lane <= u - 2) & (lane >= u - n2)
                jge1 = lane >= 2 - jv
                jge0 = lane >= -jv
                jlem = lane <= m2 - jv

                diag = jnp.where(i1n & jge1 & jlem, h2 + sub, NEG)
                if config.free_start_s1:
                    col0 = jnp.zeros_like(diag)
                else:
                    col0 = jnp.int32(open_) + (a - 1) * jnp.int32(ext) \
                        + jnp.zeros_like(diag)
                diag = jnp.where(i1n & (lane == -jv), col0, diag)

                e_m = jnp.where(jge1, e_new, NEG)
                gg = jnp.maximum(diag, jnp.where(jge1, f_new, NEG))
                h = jnp.maximum(gg, e_m)
                h = jnp.where(i1n & jge0 & jlem, h, NEG)

                if need_moves:
                    hsrc = jnp.where(h == diag, 0,
                                     jnp.where(h == e_m, 1, 2))
                    moves4 = (hsrc | jnp.where(e_ext_bit, 4, 0)
                              | jnp.where(f_ext_bit, 8, 0))
                    sh = 4 * (t % 8)
                    mv_acc = moves4 if sh == 0 else mv_acc | (moves4 << sh)
                    if t % 8 == 7:
                        moves_ref[:, pl.ds(gl * (G // 8) + t // 8, 1), :] \
                            = mv_acc[:, None, :]

                # row-0 boundary cell (i = 0, j = a) at lane u
                if config.free_start_s2:
                    h0v = jnp.where(a >= 0, 0, NEG)
                else:
                    h0v = jnp.where(a > 0, open_ + (a - 1) * ext,
                                    jnp.where(a == 0, 0, NEG))
                h0v = jnp.where(a <= mm, h0v, NEG)
                h = jnp.where(lane == u, h0v, h)

                # captures (h is already NEG at any invalid cell)
                rowm = lane == u - n2
                hat_l = jnp.where(rowm, h, hat_l)
                colm = lane == m2 - jv
                cor_l = jnp.where(rowm & colm, h, cor_l)
                lcm = colm & (u - lane >= 0) & (u - lane <= n2)
                hlc = jnp.where(lcm, h, NEG)
                better = hlc > lcv_l
                lcv_l = jnp.where(better, hlc, lcv_l)
                lci_l = jnp.where(better, (u - lane) >> 1, lci_l)

                h2, h1, e, f = h1, h, e_new, f_new

            # ---- merge local captures into the running scalars ---------
            def _merge(scal):
                cor0, rnv0, rnj0, lcv0, lci0 = scal
                cor1 = jnp.maximum(
                    cor0, jnp.max(cor_l, axis=1, keepdims=True))
                gv = jnp.max(hat_l, axis=1, keepdims=True)
                jlane = c0w + lane + nn
                gj = jnp.min(jnp.where((hat_l == gv) & (gv > NEG // 2),
                                       jlane, _BIG), axis=1, keepdims=True)
                take = gv > rnv0
                rnv1 = jnp.where(take, gv, rnv0)
                rnj1 = jnp.where(take, gj, rnj0)
                lgv = jnp.max(lcv_l, axis=1, keepdims=True)
                lgi = jnp.min(jnp.where((lcv_l == lgv) & (lgv > NEG // 2),
                                        lci_l, _BIG), axis=1, keepdims=True)
                take2 = lgv > lcv0
                lcv1 = jnp.where(take2, lgv, lcv0)
                lci1 = jnp.where(take2, lgi, lci0)
                return cor1, rnv1, rnj1, lcv1, lci1

            hit_any = jnp.any(grp[:, _L_HIT:_L_HIT + 1] == 1)
            cor, rnv, rnj, lcv, lci = jax.lax.cond(
                hit_any, _merge, lambda s: s, (cor, rnv, rnj, lcv, lci))

            best_ref[pl.ds(gl, 1), :, :] = jnp.where(
                out_lane == 0, cor,
                jnp.where(out_lane == 1, rnv,
                          jnp.where(out_lane == 2, rnj,
                                    jnp.where(out_lane == 3, lcv,
                                              jnp.where(out_lane == 4,
                                                        lci, 0)))))[None]

            h1_scr[:, :] = h1
            h2_scr[:, :] = h2
            e_scr[:, :] = e
            f_scr[:, :] = f
            cor_scr[:, :] = cor
            rnv_scr[:, :] = rnv
            rnj_scr[:, :] = rnj
            lcv_scr[:, :] = lcv
            lci_scr[:, :] = lci
            return 0

        jax.lax.fori_loop(0, T // G, group_body, 0)

    return kernel


def _interleave2(sl, GWp, parity):
    """Expand a (..., SL) slice to (..., GWp) lanes where lane x holds
    sl[(x + parity) >> 1] — repeat each element twice, then select one
    of the two 1-lane-offset static windows by the per-(group, track)
    parity bit."""
    rep = jnp.repeat(sl, 2, axis=-1)
    return jnp.where(parity == 1, rep[..., 1:1 + GWp], rep[..., 0:GWp])


def _build_planes(q_tape, r_flat, rowbase_g, rbase_g, a_g0, dbase_g, GWp):
    """ZQ/ZR group planes via gather — REFERENCE ORACLE ONLY.

    The production kernel loads each group's window as one lane-domain
    slice of the repeat-2 tapes inside the kernel (see wavetape_forward);
    this gather formulation (one XLA DMA per (group, track) slice,
    measured 0.82 us/wavefront — 80% of forward time) is kept as the
    independent oracle for tests/test_wavetape.py's lane-math check.
    NOTE: expects the UNREVERSED q tape layout.

    ZQ[g, b, x] = q_tape[b, rowbase + sq], sq = (Kq - x)//2 - 1 with
    Kq = a_g0 + G - 1 - dbase_g (descending by 1 every 2 lanes);
    ZR[g, b, x] = r_flat[b, rbase + W + sr], sr = (Kr + x)//2 - 1 with
    Kr = a_g0 + dbase_g. Both come from one contiguous dynamic slice per
    (group, track) expanded by repeat + parity select; lanes whose true
    index leaves the slice belong to cells the kernel masks dead."""
    B, LR = q_tape.shape
    M = r_flat.shape[1]
    NGg = a_g0.shape[1]
    SL = GWp // 2 + 2

    kq = a_g0 + G - 1 - dbase_g                       # (B, NG)
    # q slice start: minimal needed index is (Kq - (GWp-1))//2 - 1;
    # using (Kq >> 1) - GWp//2 - 1 covers it for either parity
    s0q = rowbase_g + (kq >> 1) - GWp // 2 - 1
    s0q = jnp.clip(s0q, 0, LR - SL)
    kr = a_g0 + dbase_g
    s0r = rbase_g + (kr >> 1) - 1
    s0r = jnp.clip(s0r, 0, M - SL)

    def slice_one(src, start):
        return jax.lax.dynamic_slice(src, (start,), (SL,))

    qsl = jax.vmap(lambda src, starts:
                   jax.vmap(lambda s: slice_one(src, s))(starts))(
        q_tape, s0q)                                  # (B, NG, SL)
    rsl = jax.vmap(lambda src, starts:
                   jax.vmap(lambda s: slice_one(src, s))(starts))(
        r_flat, s0r)

    # ZQ descends in x: reverse the slice, then lane x holds
    # rev[(x + (3 - pq)) >> 1] — verified against the prototype's
    # numpy _base_planes in tests/test_wavetape.py
    pq = (kq & 1)[:, :, None]
    rev = qsl[:, :, ::-1].astype(jnp.int32)
    zq = jnp.where(pq == 1,
                   jnp.repeat(rev, 2, axis=-1)[:, :, 2:2 + GWp],
                   jnp.repeat(rev, 2, axis=-1)[:, :, 3:3 + GWp])
    pr = (kr & 1)[:, :, None]
    zr = _interleave2(rsl.astype(jnp.int32), GWp, pr)
    return (jnp.transpose(zq, (1, 0, 2)).astype(jnp.int8),
            jnp.transpose(zr, (1, 0, 2)).astype(jnp.int8))


@functools.partial(
    jax.jit,
    static_argnames=('scoring', 'config', 'W', 'need_moves', 'interpret'))
def wavetape_forward(q_tape, r_flat, adv8, gflags, n_t, m_t, r_base,
                     rowbase, dbase0, a0, seg_g, lastg,
                     scoring: Scoring, config: AlignConfig, W: int,
                     need_moves: bool, interpret: bool = False):
    """Run the wavefront tape DP. Returns (score, end_i, end_j) each
    (B, TT) plus (moves (B, LA/8, W) wavefront-packed, db_rows (B, LA))
    for traceback chaining."""
    B, NG = adv8.shape
    GWp = _region_width(W)
    LA = NG * G
    resident = 2 * B * (q_tape.shape[1] + r_flat.shape[1])
    T = min(LA, _chunk_wavefronts(W, B, resident))
    n_chunks = LA // T

    gfl = gflags.astype(jnp.int32)
    rst_g = gfl & 1
    hit_g = (gfl >> 1) & 1
    seg_id_g = jnp.clip(jnp.cumsum(rst_g, axis=1) - 1, 0, None)
    takeg = lambda a: jnp.take_along_axis(a, seg_id_g, axis=1)
    dbase_g = jnp.cumsum(adv8.astype(jnp.int32), axis=1) + takeg(dbase0)
    g_idx = jnp.arange(NG, dtype=jnp.int32)[None, :]
    a_g0 = takeg(a0) + (g_idx - takeg(seg_g)) * G
    n2_g = 2 * takeg(n_t)
    m2_g = 2 * takeg(m_t)
    rowb_g = takeg(rowbase)
    rb_g = takeg(r_base) + W

    plane = jnp.zeros((B, NG, 128), jnp.int32)
    for idx, vals in ((_L_DB, dbase_g), (_L_ADV, adv8.astype(jnp.int32)),
                      (_L_RST, rst_g), (_L_HIT, hit_g), (_L_A0, a_g0),
                      (_L_N2, n2_g), (_L_M2, m2_g)):
        plane = plane.at[:, :, idx].set(vals)
    plane = jnp.transpose(plane, (1, 0, 2))            # (NG, B, 128)

    # lane-domain tapes: each base duplicated onto 2 lanes so a group's
    # ZQ/ZR window is ONE ascending slice (q stored task-reversed by the
    # host builder). S such that q2[S + x] = q[(Kq - x)//2 - 1] and
    # r2[S + x] = r[rb + (Kr + x)//2 - 1] — exact for either parity by
    # the floor-division identity (x - K + 1)>>1 == -((K - x)>>1).
    q2 = jnp.repeat(q_tape, 2, axis=1)
    r2 = jnp.repeat(r_flat, 2, axis=1)
    kq = a_g0 + G - 1 - dbase_g
    # clip bound leaves room for the kernel's 128-aligned GWp+128 load
    sq = jnp.clip(2 * (rowb_g + takeg(n_t)) + 1 - kq,
                  0, q2.shape[1] - GWp - 128)
    kr = a_g0 + dbase_g
    sr = jnp.clip(2 * (rb_g - 1) + kr, 0, r2.shape[1] - GWp - 128)
    sqsr = jnp.transpose(jnp.stack([sq, sr], axis=-1), (1, 0, 2))

    kernel = _make_wavetape_kernel(T, W, GWp, B, scoring, config,
                                   need_moves)
    scratch = ([pltpu.VMEM((B, W), jnp.int32)] * 4
               + [pltpu.VMEM((B, 1), jnp.int32)] * 5)
    out_specs, out_shape = [], []
    if need_moves:
        out_specs.append(pl.BlockSpec((B, T // 8, W),
                                      lambda ch: (0, ch, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, LA // 8, W), jnp.int32))
    out_specs.append(pl.BlockSpec((T // G, B, 128), lambda ch: (ch, 0, 0),
                                  memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((NG, B, 128), jnp.int32))

    outs = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((T // G, B, 128), lambda ch: (ch, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # q2 (B, 2 LR)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # r2 (B, 2 M)
            pl.BlockSpec((T // G, B, 2), lambda ch: (ch, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(plane, q2, r2, sqsr)
    if need_moves:
        moves, best_slots = outs
    else:
        (best_slots,) = outs
        moves = jnp.zeros((B, 1, 1), jnp.int32)

    # ---- end selection from each task's last-group scalars -------------
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    last = jnp.clip(lastg, 0, NG - 1)
    best_t = best_slots[last, bidx]                   # (B, TT, 128)
    corner = best_t[:, :, 0]
    rnv = best_t[:, :, 1]
    rnj = best_t[:, :, 2]
    lcv = best_t[:, :, 3]
    lci = best_t[:, :, 4]
    score = corner
    end_i = n_t
    end_j = m_t
    if config.free_end_s2:
        better = rnv > score
        end_j = jnp.where(better, rnj, end_j)
        end_i = jnp.where(better, n_t, end_i)
        score = jnp.maximum(score, rnv)
    if config.free_end_s1:
        better = lcv > score
        end_i = jnp.where(better, lci, end_i)
        end_j = jnp.where(better, m_t, end_j)
        score = jnp.maximum(score, lcv)
    db_rows = jnp.repeat(dbase_g, G, axis=1)          # (B, LA)
    return score, end_i, end_j, moves, db_rows


def _make_wavetape_walker(T, W, n_chunks, TT):

    def kernel(moves_ref, db_ref, ntask_ref, endi_ref, endj_ref,
               abase_ref, rec_ref, fin_ref, st_scr):
        """Scalar SMEM walk in (wavefront address, diagonal lane) space;
        the structure of ops/pallas_tape._make_tape_traceback_kernel with
        the address math a = abase + i + j, lane = (j - i) - dbase[a].

        Records: 1 = M at the visited wavefront; an extension-chained
        indel RUN of length L emits ONE record op | (L << 2) (op 2 = D,
        3 = I) at the run's LAST-walked (lowest) address, covering
        addresses [a, a + L). Chain-internal addresses stay 0. High-error
        reads carry ~2.2x fewer run records than per-address records —
        the records fetch is the wave path's dominant tunnel cost."""
        b = pl.program_id(0)
        chunk_rev = pl.program_id(1)
        chunk = n_chunks - 1 - chunk_rev
        chunk_lo = chunk * T

        @pl.when(chunk_rev == 0)
        def _init():
            nT = ntask_ref[b]
            k0 = nT - 1
            kc = jnp.clip(k0, 0, TT - 1)
            st_scr[0] = k0
            st_scr[1] = jnp.where(k0 >= 0, endi_ref[b, kc], 0)
            st_scr[2] = jnp.where(k0 >= 0, endj_ref[b, kc], 0)
            st_scr[3] = 0
            st_scr[4] = jnp.where(k0 >= 0, abase_ref[b, kc], 0)
            st_scr[5] = 0                      # current run length

        def _zero_rec(t, _):
            rec_ref[0, t // 8, t % 8] = 0
            return 0

        jax.lax.fori_loop(0, T, _zero_rec, 0)

        def cond(state):
            task_k, i, j, s, ab, cnt = state
            addr = ab + i + j
            # addresses are 0-indexed within the chunk (t = addr -
            # chunk_lo), so the boundary address addr == chunk_lo
            # belongs to THIS chunk (unlike the 1-indexed row walker)
            return (task_k >= 0) & ((addr >= chunk_lo) | (i == 0)
                                    | ((j == 0) & (s == 0)))

        def body(state):
            task_k, i, j, s, ab, cnt = state
            row0_stop = i == 0
            col0_stop = (~row0_stop) & (s == 0) & (j == 0)

            addr = ab + i + j
            t = jnp.clip(addr - chunk_lo, 0, T - 1)
            lane = (j - i) - db_ref[0, t // 8, t % 8]
            cell = (moves_ref[0, t // 8, jnp.clip(lane, 0, W - 1)]
                    >> (4 * (t % 8))) & 0xF

            escape = (~row0_stop) & (~col0_stop) \
                & ((lane < 0) | (lane >= W))
            stopping = row0_stop | col0_stop | escape
            code = jnp.where(row0_stop, 0, jnp.where(col0_stop, 1, 2))

            hsrc = cell & 3
            act = jnp.where(s == 1, 1, jnp.where(s == 2, 2, hsrc))
            is_m = act == 0
            is_d = act == 1
            is_i = act == 2

            e_ext = ((cell >> 2) & 1) == 1
            f_ext = ((cell >> 3) & 1) == 1
            ni = jnp.where(is_m | is_i, i - 1, i)
            nj = jnp.where(is_m | is_d, j - 1, j)
            ns = jnp.where(is_d & e_ext & (nj > 0), 1,
                           jnp.where(is_i & f_ext & (ni > 0), 2, 0))

            # run records: the chain continues while ns != 0; at the
            # chain's last element (a gap move with ns == 0) publish
            # op | (length << 2) at this (lowest) address. Runs split
            # every 63 steps so the record value fits 8 bits (the
            # sparse fetch packs flat index << 8 | value into one int32)
            chain_end = (is_d | is_i) & ((ns == 0) | (cnt >= 62))
            run_val = jnp.where(is_d, 2, 3) | ((cnt + 1) << 2)
            rec = jnp.where(
                stopping | ((is_d | is_i) & ~chain_end),
                rec_ref[0, t // 8, t % 8],
                jnp.where(is_m, 1, run_val))
            rec_ref[0, t // 8, t % 8] = rec

            @pl.when(stopping)
            def _publish():
                kc = jnp.clip(task_k, 0, TT - 1)
                fin_ref[b, 4 * kc] = i
                fin_ref[b, 4 * kc + 1] = j
                fin_ref[b, 4 * kc + 2] = code

            ncnt = jnp.where(stopping | (ns == 0) | (cnt >= 62), 0,
                             jnp.where(is_d | is_i, cnt + 1, 0))

            nk = task_k - 1
            nkc = jnp.clip(nk, 0, TT - 1)
            task_k = jnp.where(stopping, nk, task_k)
            i = jnp.where(stopping, endi_ref[b, nkc], ni)
            j = jnp.where(stopping, endj_ref[b, nkc], nj)
            s = jnp.where(stopping, 0, ns)
            ab = jnp.where(stopping, abase_ref[b, nkc], ab)
            return (task_k, i, j, s, ab, ncnt)

        out = jax.lax.while_loop(cond, body, (st_scr[0], st_scr[1],
                                              st_scr[2], st_scr[3],
                                              st_scr[4], st_scr[5]))
        for i in range(6):
            st_scr[i] = out[i]

    return kernel


@functools.partial(jax.jit, static_argnames=('W', 'interpret'))
def wavetape_traceback(moves, db_rows, n_tasks, end_i, end_j, abase, W,
                       interpret: bool = False):
    """On-device traceback over a wavefront tape. end_i/end_j: (B, TT)
    per-task end cells (i=0, j=0 for tasks to skip). Returns
    (records (B, LA) int32, fin (B, TT, 3) = (final i, final j, code))."""
    B, Lw, _ = moves.shape
    LA = db_rows.shape[1]
    TT = end_i.shape[1]
    T = min(LA, 256)
    while T > 64 and (T // 8) * W * 4 > 96 * 1024:
        T //= 2
    n_chunks = LA // T
    kernel = _make_wavetape_walker(T, W, n_chunks, TT)
    rec, fin = pl.pallas_call(
        kernel,
        grid=(B, n_chunks),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, T // 8, W),
                         lambda b, ch: (b, n_chunks - 1 - ch, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, T // 8, 8),
                         lambda b, ch: (b, n_chunks - 1 - ch, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),    # n_tasks (B,)
            pl.BlockSpec(memory_space=pltpu.SMEM),    # end_i (B, TT)
            pl.BlockSpec(memory_space=pltpu.SMEM),    # end_j (B, TT)
            pl.BlockSpec(memory_space=pltpu.SMEM),    # abase (B, TT)
        ],
        out_specs=[
            pl.BlockSpec((1, T // 8, 8),
                         lambda b, ch: (b, n_chunks - 1 - ch, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, LA // 8, 8), jnp.int32),
            jax.ShapeDtypeStruct((B, 4 * TT), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((6,), jnp.int32)],
    )(moves, db_rows.reshape(B, LA // 8, 8).astype(jnp.int32),
      n_tasks.astype(jnp.int32), end_i.astype(jnp.int32),
      end_j.astype(jnp.int32), abase.astype(jnp.int32))
    return rec.reshape(B, LA), fin.reshape(B, TT, 4)[:, :, :3]


@functools.partial(
    jax.jit, static_argnames=('scoring', 'config', 'W', 'interpret'))
def wavetape_with_traceback(q_tape, r_flat, adv8, gflags, n_t, m_t,
                            r_base, rowbase, dbase0, a0, seg_g, lastg,
                            abase, n_tasks, scoring, config, W,
                            interpret: bool = False):
    """Forward wavefront tape DP + chained on-device traceback."""
    score, end_i, end_j, moves, db_rows = wavetape_forward(
        q_tape, r_flat, adv8, gflags, n_t, m_t, r_base, rowbase, dbase0,
        a0, seg_g, lastg, scoring=scoring, config=config, W=W,
        need_moves=True, interpret=interpret)
    valid = n_t > 0
    ei = jnp.where(valid, end_i, 0)
    ej = jnp.where(valid, end_j, 0)
    records, fin = wavetape_traceback(moves, db_rows, n_tasks, ei, ej,
                                      jnp.where(valid, abase, 0), W,
                                      interpret=interpret)
    return score, end_i, end_j, records, fin


def wave_records_to_cigar(records_row, abase, end_i, end_j, final_i,
                          final_j, stop_code, config: AlignConfig):
    """Rebuild (cigar, start_i, start_j) from per-wavefront path records
    — vectorised numpy.

    `records_row` is the track's fetched records array; the record of
    the path cell at task-local wavefront a = i + j lives at address
    abase + a. 1 = a single M step; op | (L << 2) (op 2 = D, 3 = I) = an
    indel run of length L covering addresses [a, a + L). Only run
    entries need to be trustworthy (they are shipped explicitly by the
    sparse fetch); M entries may be the rebuilt default 1 and unvisited
    (or run-internal) addresses are never read: the decode walks
    event-to-event with M strides of 2 filling the gaps."""
    end_i = int(end_i)
    end_j = int(end_j)
    final_i = int(final_i)
    final_j = int(final_j)
    stop_code = int(stop_code)
    if stop_code == 2:
        return None                      # band escape: caller falls back

    prefix_counts = []
    prefix_types = []
    if stop_code == 0:
        if config.free_start_s2 or final_j == 0:
            start_i, start_j = 0, final_j
        else:
            prefix_counts.append(final_j)
            prefix_types.append(2)
            start_i, start_j = 0, 0
    else:                                # stop_code == 1: column 0 in H
        if config.free_start_s1:
            start_i, start_j = final_i, 0
        else:
            prefix_counts.append(final_i)
            prefix_types.append(1)
            start_i, start_j = 0, 0

    a_end = end_i + end_j
    a_fin = final_i + final_j
    abase = int(abase)
    span = records_row[abase + a_fin + 1:abase + a_end + 1] \
        if a_end > a_fin else np.zeros(0, np.int32)
    ev_rel = np.nonzero(span >= 6)[0]                # run records
    ev_addr = ev_rel + a_fin + 1                     # ascending
    ev_vals = span[ev_rel]
    ev_ops = ev_vals & 3                             # 2 = D, 3 = I
    ev_cnts = ev_vals >> 2
    if np.any((ev_ops < 2) | (ev_cnts < 1)):
        return None                      # corrupt records: retry

    # descending events; each covers addresses [addr, addr + cnt); M
    # strides of 2 fill the gaps between run spans
    ev_addr_d = ev_addr[::-1]
    ev_ops_d = ev_ops[::-1]
    ev_cnts_d = ev_cnts[::-1].astype(np.int64)
    K = len(ev_addr_d)
    uppers = np.concatenate([[a_end], ev_addr_d - 1])
    lowers = np.concatenate([ev_addr_d + ev_cnts_d - 1, [a_fin]])
    m_gaps = uppers - lowers                          # K+1 entries
    if np.any(m_gaps < 0) or np.any(m_gaps & 1):
        return None                      # inconsistent records: retry
    m_counts = m_gaps >> 1

    # reverse-chronological op list: [M x m0] run1 [M x m1] run2 ... ;
    # forward order is its reverse
    n_ops = K + K + 1
    op_types = np.empty(n_ops, np.int8)   # 0 M, 1 I, 2 D
    op_counts = np.empty(n_ops, np.int64)
    op_types[0::2] = 0
    op_counts[0::2] = m_counts
    op_types[1::2] = np.where(ev_ops_d == 2, 2, 1)
    op_counts[1::2] = ev_cnts_d
    # forward = reversed
    op_types = op_types[::-1]
    op_counts = op_counts[::-1]
    if prefix_types:
        op_types = np.concatenate(
            [np.asarray(prefix_types, np.int8), op_types])
        op_counts = np.concatenate(
            [np.asarray(prefix_counts, np.int64), op_counts])
    keep = op_counts > 0
    op_types = op_types[keep]
    op_counts = op_counts[keep]

    # consistency: M+I runs consume s1 rows start_i..end_i, M+D runs
    # consume s2 columns start_j..end_j; a mismatch means corrupt
    # records (treated like a band escape: caller retries)
    tot_m = int(op_counts[op_types == 0].sum())
    tot_i = int(op_counts[op_types == 1].sum())
    tot_d = int(op_counts[op_types == 2].sum())
    if tot_m + tot_i != end_i - start_i \
            or tot_m + tot_d != end_j - start_j:
        return None
    if len(op_types):
        boundaries = np.nonzero(np.concatenate(
            [[True], op_types[1:] != op_types[:-1]]))[0]
        merged_counts = np.add.reduceat(op_counts, boundaries)
        merged_types = op_types[boundaries]
    else:
        merged_counts = np.zeros(0, np.int64)
        merged_types = np.zeros(0, np.int8)
    from .pairwise import RunCigar
    return RunCigar(merged_counts, merged_types), start_i, start_j


# --- packed-input twins -----------------------------------------------------
#
# Through a tunnelled device every separately-uploaded jit argument pays
# its own transfer round trip (round-5 measurement: ten small
# device_puts ~10x one stacked upload of the same bytes), and one launch
# has ~14 input arrays. These twins take TWO flat buffers built by
# wavetape.pack_launch_inputs and unpack with static slices inside the
# jit — the kernels and their outputs are bit-identical to the unpacked
# entry points (pinned by tests/test_wavetape.py::test_packed_entry).

def _unpack_launch(bytes_buf, ints_buf, geom):
    B, LR, M, NG, TT = geom
    off = 0

    def take_bytes(count, shape):
        nonlocal off
        a = bytes_buf[off:off + count].reshape(shape)
        off += count
        return a

    q_tape = take_bytes(B * LR, (B, LR))
    r_flat = jax.lax.bitcast_convert_type(
        take_bytes(B * M, (B, M)), jnp.int8)
    adv8 = jax.lax.bitcast_convert_type(
        take_bytes(B * NG, (B, NG)), jnp.int8)
    gflags = take_bytes(B * NG, (B, NG))

    ioff = 0

    def take_ints(shape):
        nonlocal ioff
        count = int(np.prod(shape))
        a = ints_buf[ioff:ioff + count].reshape(shape)
        ioff += count
        return a

    (n_t, m_t, r_base, rowbase, dbase0, a0, seg_g, lastg, abase, segA,
     lenA) = (take_ints((B, TT)) for _ in range(11))
    n_tasks = take_ints((B,))
    return (q_tape, r_flat, adv8, gflags, n_t, m_t, r_base, rowbase,
            dbase0, a0, seg_g, lastg, abase, segA, lenA, n_tasks)


@functools.partial(
    jax.jit,
    static_argnames=('geom', 'scoring', 'config', 'W', 'need_moves',
                     'interpret'))
def wavetape_forward_packed(bytes_buf, ints_buf, geom, scoring, config,
                            W, need_moves, interpret=False):
    (q_tape, r_flat, adv8, gflags, n_t, m_t, r_base, rowbase, dbase0,
     a0, seg_g, lastg, _abase, _segA, _lenA, _n_tasks) = \
        _unpack_launch(bytes_buf, ints_buf, geom)
    return wavetape_forward(q_tape, r_flat, adv8, gflags, n_t, m_t,
                            r_base, rowbase, dbase0, a0, seg_g, lastg,
                            scoring=scoring, config=config, W=W,
                            need_moves=need_moves, interpret=interpret)


@functools.partial(
    jax.jit, static_argnames=('geom', 'scoring', 'config', 'W',
                              'interpret'))
def wavetape_with_traceback_packed(bytes_buf, ints_buf, geom, scoring,
                                   config, W, interpret=False):
    """Forward + chained traceback from packed buffers. Also returns the
    device-resident (segA, lenA) slices for compress_records, so the
    caller uploads nothing else."""
    (q_tape, r_flat, adv8, gflags, n_t, m_t, r_base, rowbase, dbase0,
     a0, seg_g, lastg, abase, segA, lenA, n_tasks) = \
        _unpack_launch(bytes_buf, ints_buf, geom)
    score, end_i, end_j, records, fin = wavetape_with_traceback(
        q_tape, r_flat, adv8, gflags, n_t, m_t, r_base, rowbase, dbase0,
        a0, seg_g, lastg, abase, n_tasks, scoring=scoring, config=config,
        W=W, interpret=interpret)
    return score, end_i, end_j, records, fin, segA, lenA
