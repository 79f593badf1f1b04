"""Anti-diagonal WAVEFRONT banded DP — round-3 forward-kernel prototype.

The production tape kernel (ops/pallas_tape.py) is a row-wavefront Gotoh:
each DP row needs an intra-row prefix-cummax ladder for the E (horizontal
gap) chain, measured at ~36% of forward time and at its structural floor
(PERF.md "Forward-kernel micro-pass"). This module prototypes the
anti-diagonal formulation that removes the ladder entirely: cells are
processed in wavefronts a = i + j, where every Gotoh predecessor lives on
wavefront a-1 (E from (i, j-1), F from (i-1, j)) or a-2 (the diagonal
H(i-1, j-1)) — no intra-step dependency at all, so one step is a handful
of shifted elementwise max ops.

Layout: lanes are DIAGONALS. Within a GROUP of G consecutive wavefronts
the tracked diagonal window [dbase_g, dbase_g + W) is fixed, so lane k
holds diagonal d = dbase_g + k and carries never realign inside a group.
DRIFTING corridors (the production case: per-row band starts c[i] from
the seed chain, ops/banded.build_corridor) are group-quantized: the host
picks dbase_g from the corridor row active at the group's mid wavefront,
and at group entry the carries realign to the new frame with a
bit-decomposed per-sublane dynamic roll (the same trick the row tape
kernel uses for its per-group drift, ops/pallas_tape.py). A straight
corridor (c[i] = c0 + i) degenerates to zero advances, i.e. the original
straight-line prototype.

    cell (i, j), lane k = (j - i) - dbase_g, wavefront a = i + j:
      H(a, k) = max(H(a-2, k) + sub(q[i-1], r[j-1]), E(a, k), F(a, k))
      E(a, k) = max(H(a-1, k-1) + open, E(a-1, k-1) + ext)   (shift right)
      F(a, k) = max(H(a-1, k+1) + open, F(a-1, k+1) + ext)   (shift left)

Only lanes with (a - dbase_g - k) even hold real cells at wavefront a;
the odd co-class computes a coherent shadow DP that is never read
(captures and boundary injections are all even-parity by construction),
so no parity masking is needed. Query/reference bases arrive as
per-GROUP region planes (the tape kernel's trick):
ZQ[g, :, x] = q[((a_g + G-1 - dbase_g) - x)/2 - 1] and
ZR[g, :, x] = r[((a_g + dbase_g) + x)/2 - 1], so each step's base
vectors are STATIC slices of the group plane.

End captures (row n for free_end_s2, column m for free_end_s1) must
survive window drift — a value captured under frame g would be lost if
its diagonal later leaves the window. They are therefore accumulated in
per-group LOCAL arrays (current frame) and merged at group exit into
ABSOLUTE-frame arrays of width Wcap >= W + total drift span (one dynamic
roll per group, amortised over G wavefronts); each diagonal crosses row
n (or column m) exactly once, so the merge is write-once per lane.

Scope (prototype): forward score + end selection only (no moves /
traceback). Output semantics are bit-exact with ops.banded._banded_single
on straight corridors (tests/test_wavefront.py) and with a literal numpy
oracle of the group-window semantics on drifting corridors
(tests/test_wavefront.py::test_wavefront_drifting_corridor_oracle). The
remaining integration work (move emission in wavefront coordinates,
walker rewrite, multi-task tape packing) is the round-3 lever this
prototype de-risks; see PERF.md.

Replaces (eventually) the row kernel's role for SeqAn's
bandedChainAlignment (ref src/semi_global_align.cpp:293-311).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pairwise import NEG, AlignConfig, Scoring

G = 32          # wavefronts per group (unrolled body)


def _region_width(W):
    return (W + G + 127) // 128 * 128


def _shift_right(x, d=1):
    b = x.shape[0]
    fill = jnp.full((b, d), NEG, x.dtype)
    return jnp.concatenate([fill, x[:, :x.shape[1] - d]], axis=1)


def _shift_left(x, d=1):
    b = x.shape[0]
    fill = jnp.full((b, d), NEG, x.dtype)
    return jnp.concatenate([x[:, d:], fill], axis=1)


def _dyn_roll(x, t, nbits):
    """Per-sublane dynamic rotate: out[b, i] = x[b, (i - t[b]) % width].
    t is a (B, 1) nonnegative rotate amount, bit-decomposed into static
    pltpu.roll steps selected per sublane (the tape kernel's realignment
    trick)."""
    width = x.shape[1]
    for jb in range(nbits):
        s = (1 << jb) % width
        if s == 0:
            continue
        bit = ((t >> jb) & 1) > 0
        x = jnp.where(bit, pltpu.roll(x, s, 1), x)
    return x


ADV_BIAS = 128      # realign advances are decomposed as BIAS - adv (8 bits)


def _make_wavefront_kernel(B, W, Wcap, GWp, n_groups, a_lo,
                           scoring: Scoring, config: AlignConfig):
    match_s, mismatch = int(scoring.match), int(scoring.mismatch)
    open_, ext = int(scoring.gap_open), int(scoring.gap_extend)
    nb_c = max(1, (Wcap - 1).bit_length())

    def kernel(par_ref, db_ref, zq_ref, zr_ref, hatn_ref, lcv_ref, lci_ref,
               h1_scr, h2_scr, e_scr, f_scr, hatn_scr, lcv_scr, lci_scr):
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (B, Wcap), 1)
        nn = par_ref[:, 0:1]
        mm = par_ref[:, 1:2]
        dmin = par_ref[:, 2:3]
        n2 = 2 * nn
        m2 = 2 * mm

        h1_scr[:, :] = jnp.full((B, W), NEG, jnp.int32)
        h2_scr[:, :] = jnp.full((B, W), NEG, jnp.int32)
        e_scr[:, :] = jnp.full((B, W), NEG, jnp.int32)
        f_scr[:, :] = jnp.full((B, W), NEG, jnp.int32)
        hatn_scr[:, :] = jnp.full((B, Wcap), NEG, jnp.int32)
        lcv_scr[:, :] = jnp.full((B, Wcap), NEG, jnp.int32)
        lci_scr[:, :] = jnp.zeros((B, Wcap), jnp.int32)

        def group_body(g, _):
            dbs = db_ref[pl.ds(g, 1), :, :].reshape(B, 128)
            c0 = dbs[:, 0:1]              # this group's window base diag
            adv = dbs[:, 1:2]             # c0 - previous group's base
            zq = zq_ref[pl.ds(g, 1), :, :].reshape(B, GWp).astype(jnp.int32)
            zr = zr_ref[pl.ds(g, 1), :, :].reshape(B, GWp).astype(jnp.int32)

            # ---- realign carries to this group's frame ------------------
            # new[x] holds diagonal c0 + x, previously at x + adv. Gated
            # on any task actually drifting this group (most groups of a
            # near-diagonal alignment do not); the dynamic roll is
            # decomposed as (ADV_BIAS - adv) 8-bit rotate plus one static
            # un-bias rotate so small signed advances stay 8 steps.
            def _realign(carries):
                t_adv = jnp.mod(ADV_BIAS - adv, W)
                ok = ((lane + adv) >= 0) & ((lane + adv) < W)
                out = []
                for x in carries:
                    y = _dyn_roll(x, t_adv, 8)
                    s = (W - ADV_BIAS) % W
                    if s:
                        y = pltpu.roll(y, s, 1)
                    out.append(jnp.where(ok, y, NEG))
                return tuple(out)

            h1, h2, e, f = jax.lax.cond(
                jnp.any(adv != 0), _realign, lambda c: c,
                (h1_scr[:, :], h2_scr[:, :], e_scr[:, :], f_scr[:, :]))

            # per-group local captures, in the current frame
            hat_l = jnp.full((B, W), NEG, jnp.int32)
            lcv_l = jnp.full((B, W), NEG, jnp.int32)
            lci_l = jnp.zeros((B, W), jnp.int32)
            a0 = a_lo + g * G

            for t in range(G):
                a = a0 + t
                u = a - c0                    # (B, 1): i = (u - k) / 2
                jv = a + c0                   # (B, 1): j = (jv + k) / 2
                qv = zq[:, G - 1 - t:G - 1 - t + W]
                rv = zr[:, t:t + W]

                hl = _shift_left(h1)
                hr = _shift_right(h1)
                f_new = jnp.maximum(hl + open_, _shift_left(f) + ext)
                e_new = jnp.maximum(hr + open_, _shift_right(e) + ext)
                e_new = jnp.where(e_new > NEG // 2, e_new, NEG)

                sub = jnp.where(qv == rv, match_s, mismatch)
                i1n = (lane <= u - 2) & (lane >= u - n2)
                jge1 = lane >= 2 - jv
                jge0 = lane >= -jv
                jlem = lane <= m2 - jv

                diag = jnp.where(i1n & jge1 & jlem, h2 + sub, NEG)
                if config.free_start_s1:
                    col0 = jnp.int32(0)
                else:
                    col0 = jnp.int32(open_) + (a - 1) * jnp.int32(ext)
                diag = jnp.where(i1n & (lane == -jv), col0, diag)

                gg = jnp.maximum(diag, jnp.where(jge1, f_new, NEG))
                h = jnp.maximum(gg, jnp.where(jge1, e_new, NEG))
                h = jnp.where(i1n & jge0 & jlem, h, NEG)

                # row-0 boundary cell (i = 0, j = a) lives at lane u
                if config.free_start_s2:
                    h0v = jnp.where(a >= 0, 0, NEG)
                else:
                    h0v = jnp.where(
                        a > 0, open_ + (a - 1) * ext,
                        jnp.where(a == 0, 0, NEG))
                h0v = jnp.where(a <= mm, h0v, NEG)      # (B, 1)
                h = jnp.where(lane == u, h0v, h)

                # captures: row n (one lane/step) and column m (one
                # lane/step, i in [0, n], earliest i wins ties)
                hat_l = jnp.where(lane == u - n2, h, hat_l)
                lcm = (lane == m2 - jv) & (u - lane >= 0) & \
                    (u - lane <= n2)
                hlc = jnp.where(lcm, h, NEG)
                better = hlc > lcv_l
                lcv_l = jnp.where(better, hlc, lcv_l)
                lci_l = jnp.where(better, (u - lane) >> 1, lci_l)

                h2, h1, e, f = h1, h, e_new, f_new

            h1_scr[:, :] = h1
            h2_scr[:, :] = h2
            e_scr[:, :] = e
            f_scr[:, :] = f

            # ---- merge local captures into the absolute frame -----------
            # absolute lane xa = diagonal - dmin = x + (c0 - dmin); each
            # diagonal crosses row n / column m exactly once, so the
            # merge is write-once per lane. Gated on the host-computed
            # flag (db col 2): only ~W/G groups per task cross row n or
            # column m at all.
            def _merge(accs):
                hatn_a, lcv_a0, lci_a0 = accs
                sh = c0 - dmin
                t_sh = jnp.mod(sh, Wcap)
                okc = ((lane_c - sh) >= 0) & ((lane_c - sh) < W)

                def to_abs(loc, fill):
                    if Wcap > W:
                        fill_arr = jnp.full((B, Wcap - W), fill, jnp.int32)
                        loc = jnp.concatenate([loc, fill_arr], axis=1)
                    return jnp.where(okc, _dyn_roll(loc, t_sh, nb_c), fill)

                hat_a = to_abs(hat_l, NEG)
                lcv_a = to_abs(lcv_l, NEG)
                lci_a = to_abs(lci_l, 0)
                take = lcv_a > lcv_a0
                return (jnp.where(hat_a > NEG, hat_a, hatn_a),
                        jnp.where(take, lcv_a, lcv_a0),
                        jnp.where(take, lci_a, lci_a0))

            hatn_n, lcv_n, lci_n = jax.lax.cond(
                dbs[0, 2] > 0, _merge, lambda a: a,
                (hatn_scr[:, :], lcv_scr[:, :], lci_scr[:, :]))
            hatn_scr[:, :] = hatn_n
            lcv_scr[:, :] = lcv_n
            lci_scr[:, :] = lci_n
            return 0

        jax.lax.fori_loop(0, n_groups, group_body, 0)
        hatn_ref[:, :] = hatn_scr[:, :]
        lcv_ref[:, :] = lcv_scr[:, :]
        lci_ref[:, :] = lci_scr[:, :]

    return kernel


def _base_planes(q, r, dbase, a_lo, n_groups, GWp):
    """ZQ/ZR group region planes (n_groups, B, GWp) int8 (numpy).
    dbase: (n_groups, B) per-group window base diagonals."""
    B, n_pad = q.shape
    m_pad = r.shape[1]
    gs = a_lo + np.arange(n_groups, dtype=np.int64)[:, None, None] * G
    x = np.arange(GWp, dtype=np.int64)[None, None, :]
    c0b = dbase.astype(np.int64)[:, :, None]
    # ZQ[g, b, x] = q[b, s], s = ((a_g + G - 1 - dbase) - x) // 2 - 1
    sq = ((gs + G - 1 - c0b) - x) // 2 - 1
    sr = ((gs + c0b) + x) // 2 - 1
    qi = np.clip(sq, 0, n_pad - 1)
    ri = np.clip(sr, 0, m_pad - 1)
    bidx = np.arange(B, dtype=np.int64)[None, :, None]
    zq = q[bidx, qi].astype(np.int8)
    zr = r[bidx, ri].astype(np.int8)
    zq[(sq < 0) | (sq >= n_pad)] = 4          # sentinel: never matches
    zr[(sr < 0) | (sr >= m_pad)] = 5
    return zq, zr


def _group_windows(c_rows, n_acts, W, a_lo, n_groups):
    """Per-group window base diagonals (n_groups, B) int32.

    dbase_g for task b is the corridor's diagonal offset c[i] - i at the
    row whose band midpoint crosses the group's mid wavefront — the
    group-quantization of the per-row corridor."""
    B = len(c_rows)
    dbase = np.zeros((n_groups, B), np.int32)
    a_mids = a_lo + np.arange(n_groups, dtype=np.int64) * G + G // 2
    for b in range(B):
        n = int(n_acts[b])
        c = np.asarray(c_rows[b], np.int64)[:n + 1]
        rows = np.arange(n + 1, dtype=np.int64)
        wmid = rows + c + W // 2              # monotone in i
        ii = np.clip(np.searchsorted(wmid, a_mids), 0, n)
        dbase[:, b] = (c[ii] - ii).astype(np.int32)
    return dbase


@functools.partial(
    jax.jit, static_argnames=('B', 'W', 'Wcap', 'GWp', 'n_groups', 'a_lo',
                              'scoring', 'config', 'interpret'))
def _wavefront_call(par, db, zq, zr, B, W, Wcap, GWp, n_groups, a_lo,
                    scoring, config, interpret=False):
    kernel = _make_wavefront_kernel(B, W, Wcap, GWp, n_groups, a_lo,
                                    scoring, config)
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((B, Wcap), jnp.int32)] * 3,
        scratch_shapes=[pltpu.VMEM((B, W), jnp.int32)] * 4
        + [pltpu.VMEM((B, Wcap), jnp.int32)] * 3,
    )(par, db, zq, zr)


def _prepare(q, r, c_rows, n_acts, m_acts, W):
    """Shared host-side staging: wavefront range, per-group windows,
    metadata plane, and base planes."""
    B = q.shape[0]
    c_rows = [np.asarray(c, np.int64) for c in c_rows]
    a_lo = min(max(0, int(c_rows[b][0])) for b in range(B))
    a_hi = max(int(n_acts[b])
               + min(int(m_acts[b]),
                     int(c_rows[b][int(n_acts[b])]) + W - 1)
               for b in range(B))
    n_groups = max(1, -(-(a_hi - a_lo + 1) // G))
    dbase = _group_windows(c_rows, n_acts, W, a_lo, n_groups)
    adv = np.diff(dbase, axis=0, prepend=dbase[:1]).astype(np.int32)
    dmin = dbase.min(axis=0).astype(np.int32)
    span = int((dbase.max(axis=0) - dmin).max())
    Wcap = -(-(W + span) // 128) * 128
    par = np.zeros((B, 128), np.int32)
    par[:, 0] = n_acts
    par[:, 1] = m_acts
    par[:, 2] = dmin
    if int(np.abs(adv).max()) >= ADV_BIAS:
        gi, bi = np.unravel_index(int(np.abs(adv).argmax()), adv.shape)
        raise ValueError(
            'per-group corridor drift too large for the wavefront kernel: '
            'task %d advances %d diagonals entering group %d (limit %d). '
            'Corridors must drift < %d diagonals per %d-row group — '
            'production build_corridor output (MAX_SHIFT-capped) always '
            'satisfies this.' % (bi, int(adv[gi, bi]), gi, ADV_BIAS,
                                 ADV_BIAS, G))
    db = np.zeros((n_groups, B, 128), np.int32)
    db[:, :, 0] = dbase
    db[:, :, 1] = adv
    # capture flag (col 2): does any task cross row n or column m in this
    # group's wavefront range? Row n of task b is crossed at wavefronts
    # [2n + dbase_g, 2n + dbase_g + W), column m at
    # (2m - dbase_g - W, 2m - dbase_g].
    a0s = a_lo + np.arange(n_groups, dtype=np.int64)[:, None] * G
    a1s = a0s + G - 1
    n2b = 2 * n_acts.astype(np.int64)[None, :]
    m2b = 2 * m_acts.astype(np.int64)[None, :]
    rn_lo = n2b + dbase
    rn_hi = rn_lo + W - 1
    cm_hi = m2b - dbase
    cm_lo = cm_hi - W + 1
    hit = ((rn_lo <= a1s) & (rn_hi >= a0s)) | \
        ((cm_lo <= a1s) & (cm_hi >= a0s))
    db[:, :, 2] = hit.any(axis=1)[:, None]
    GWp = _region_width(W)
    zq, zr = _base_planes(q, r, dbase, a_lo, n_groups, GWp)
    return par, db, zq, zr, a_lo, n_groups, Wcap, GWp, dmin


def wavefront_batch_corridor(q, r, c_rows, n_acts, m_acts, scoring: Scoring,
                             config: AlignConfig, W: int,
                             interpret: bool = False):
    """Batched banded DP over per-row corridors, anti-diagonal wavefront.

    q: (B, n_pad) int8, r: (B, m_pad) int8; c_rows[b] is task b's
    nondecreasing per-row band-start array (length >= n_acts[b] + 1, the
    ops.banded corridor convention: row i covers columns
    [c[i], c[i] + W)), group-quantized to per-group diagonal windows.
    Returns (score, end_i, end_j) numpy arrays with the same
    end-selection semantics as ops.banded._banded_single (corner, then
    free_end_s2 argmax, then free_end_s1 with the smallest row winning
    ties).

    Precondition: each corridor may drift < ADV_BIAS (=128) diagonals
    per G-row group (ValueError otherwise). build_corridor output is
    always safe: its per-row drift cap (MAX_SHIFT=4) bounds group drift
    at 4*G << 128."""
    q = np.ascontiguousarray(q, np.int8)
    r = np.ascontiguousarray(r, np.int8)
    n_acts = np.asarray(n_acts, np.int32)
    m_acts = np.asarray(m_acts, np.int32)
    B = q.shape[0]
    assert W % 128 == 0
    assert np.all(n_acts >= 1), 'wavefront prototype requires n_act >= 1'

    par, db, zq, zr, a_lo, n_groups, Wcap, GWp, dmin = _prepare(
        q, r, c_rows, n_acts, m_acts, W)
    hatn, lcv, lci = _wavefront_call(
        par, db, zq, zr, B=B, W=W, Wcap=Wcap, GWp=GWp, n_groups=n_groups,
        a_lo=a_lo, scoring=scoring, config=config, interpret=interpret)
    hatn = np.asarray(hatn)
    lcv = np.asarray(lcv)
    lci = np.asarray(lci)

    # ---- end selection (mirrors _banded_single) -------------------------
    ks = np.arange(Wcap, dtype=np.int64)
    score = np.empty(B, np.int32)
    end_i = np.empty(B, np.int32)
    end_j = np.empty(B, np.int32)
    for b in range(B):
        n, m, c = int(n_acts[b]), int(m_acts[b]), int(dmin[b])
        best, ei, ej = NEG, n, m
        kc = m - n - c
        if 0 <= kc < Wcap:
            best = int(hatn[b, kc])
        if config.free_end_s2:
            row_vals = np.where(c + n + ks <= m, hatn[b], NEG)
            kb = int(np.argmax(row_vals))
            s = int(row_vals[kb])
            if s > best:
                best, ej = s, c + n + kb
        if config.free_end_s1:
            s = int(lcv[b].max())
            if s > best:
                cand = lcv[b] == s
                best, ei, ej = s, int(lci[b][cand].min()), m
        score[b] = best
        end_i[b] = ei
        end_j[b] = ej
    return score, end_i, end_j


def wavefront_batch(q, r, c0, n_acts, m_acts, scoring: Scoring,
                    config: AlignConfig, W: int, interpret: bool = False):
    """Straight-corridor convenience wrapper: band of task b is
    [c0[b] + i, c0[b] + i + W) at row i, i.e. the degenerate zero-drift
    case of wavefront_batch_corridor."""
    c0 = np.asarray(c0, np.int64)
    n_acts = np.asarray(n_acts, np.int32)
    c_rows = [c0[b] + np.arange(int(n_acts[b]) + 1, dtype=np.int64)
              for b in range(len(c0))]
    return wavefront_batch_corridor(q, r, c_rows, n_acts, m_acts, scoring,
                                    config, W, interpret=interpret)
