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

Layout: lanes are DIAGONALS. With a straight corridor (c[i] = c0 + i,
band j in [c0+i, c0+i+W)) the band is a fixed set of W diagonals, so lane
k holds diagonal d = c0 + k for the whole task and carries never realign:

    cell (i, j), j - i = c0 + k, wavefront a = i + j:
      H(a, k) = max(H(a-2, k) + sub(q[i-1], r[j-1]), E(a, k), F(a, k))
      E(a, k) = max(H(a-1, k-1) + open, E(a-1, k-1) + ext)   (shift right)
      F(a, k) = max(H(a-1, k+1) + open, F(a-1, k+1) + ext)   (shift left)

Only lanes with (a - c0 - k) even hold real cells at wavefront a; the odd
co-class computes a coherent shadow DP that is never read (captures and
boundary injections are all even-parity by construction), so no parity
masking is needed. Query/reference bases arrive as per-GROUP region
planes (the tape kernel's trick): ZQ[g, :, x] = q[((a_g + G-1 - c0) - x)/2
- 1] and ZR[g, :, x] = r[((a_g + c0) + x)/2 - 1], so each step's base
vectors are STATIC slices of the group plane.

Scope (prototype): forward score + end selection only (no moves /
traceback), straight corridors, one task per track. Output semantics are
bit-exact with ops.banded._banded_single on the same inputs — verified by
tests/test_wavefront.py across all five AlignConfigs. The integration
into the task tape (drifting corridors via per-group window metadata,
move emission in wavefront coordinates, walker rewrite) is the round-3
lever this prototype de-risks; see PERF.md.

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


def _make_wavefront_kernel(B, W, GWp, n_groups, a_lo, scoring: Scoring,
                           config: AlignConfig):
    match_s, mismatch = int(scoring.match), int(scoring.mismatch)
    open_, ext = int(scoring.gap_open), int(scoring.gap_extend)

    def kernel(par_ref, zq_ref, zr_ref, hatn_ref, lcv_ref, lci_ref,
               h1_scr, h2_scr, e_scr, f_scr, hatn_scr, lcv_scr, lci_scr):
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
        c0 = par_ref[:, 0:1]
        nn = par_ref[:, 1:2]
        mm = par_ref[:, 2:3]
        n2 = 2 * nn
        m2 = 2 * mm

        h1_scr[:, :] = jnp.full((B, W), NEG, jnp.int32)
        h2_scr[:, :] = jnp.full((B, W), NEG, jnp.int32)
        e_scr[:, :] = jnp.full((B, W), NEG, jnp.int32)
        f_scr[:, :] = jnp.full((B, W), NEG, jnp.int32)
        hatn_scr[:, :] = jnp.full((B, W), NEG, jnp.int32)
        lcv_scr[:, :] = jnp.full((B, W), NEG, jnp.int32)
        lci_scr[:, :] = jnp.zeros((B, W), jnp.int32)

        def group_body(g, _):
            zq = zq_ref[pl.ds(g, 1), :, :].reshape(B, GWp).astype(jnp.int32)
            zr = zr_ref[pl.ds(g, 1), :, :].reshape(B, GWp).astype(jnp.int32)
            h1 = h1_scr[:, :]
            h2 = h2_scr[:, :]
            e = e_scr[:, :]
            f = f_scr[:, :]
            hatn = hatn_scr[:, :]
            lcv = lcv_scr[:, :]
            lci = lci_scr[:, :]
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
                hatn = jnp.where(lane == u - n2, h, hatn)
                lcm = (lane == m2 - jv) & (u - lane >= 0) & \
                    (u - lane <= n2)
                hlc = jnp.where(lcm, h, NEG)
                better = hlc > lcv
                lcv = jnp.where(better, hlc, lcv)
                lci = jnp.where(better, (u - lane) >> 1, lci)

                h2, h1, e, f = h1, h, e_new, f_new

            h1_scr[:, :] = h1
            h2_scr[:, :] = h2
            e_scr[:, :] = e
            f_scr[:, :] = f
            hatn_scr[:, :] = hatn
            lcv_scr[:, :] = lcv
            lci_scr[:, :] = lci
            return 0

        jax.lax.fori_loop(0, n_groups, group_body, 0)
        hatn_ref[:, :] = hatn_scr[:, :]
        lcv_ref[:, :] = lcv_scr[:, :]
        lci_ref[:, :] = lci_scr[:, :]

    return kernel


def _base_planes(q, r, c0, a_lo, n_groups, GWp):
    """ZQ/ZR group region planes (n_groups, B, GWp) int8 (numpy)."""
    B, n_pad = q.shape
    m_pad = r.shape[1]
    gs = a_lo + np.arange(n_groups, dtype=np.int64)[:, None, None] * G
    x = np.arange(GWp, dtype=np.int64)[None, None, :]
    c0b = c0.astype(np.int64)[None, :, None]
    # ZQ[g, b, x] = q[b, s], s = ((a_g + G - 1 - c0) - x) // 2 - 1
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


@functools.partial(
    jax.jit, static_argnames=('B', 'W', 'GWp', 'n_groups', 'a_lo',
                              'scoring', 'config', 'interpret'))
def _wavefront_call(par, zq, zr, B, W, GWp, n_groups, a_lo, scoring,
                    config, interpret=False):
    kernel = _make_wavefront_kernel(B, W, GWp, n_groups, a_lo, scoring,
                                    config)
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((B, W), jnp.int32)] * 3,
        scratch_shapes=[pltpu.VMEM((B, W), jnp.int32)] * 7,
    )(par, zq, zr)


def wavefront_batch(q, r, c0, n_acts, m_acts, scoring: Scoring,
                    config: AlignConfig, W: int, interpret: bool = False):
    """Batched straight-corridor banded DP, anti-diagonal wavefront.

    q: (B, n_pad) int8, r: (B, m_pad) int8, c0/n_acts/m_acts: (B,) int32.
    Band of task b: row i covers columns [c0[b] + i, c0[b] + i + W).
    Returns (score, end_i, end_j) numpy arrays — the same end-selection
    semantics as ops.banded._banded_single (corner, then free_end_s2
    argmax, then free_end_s1 with the smallest row winning ties).
    """
    q = np.ascontiguousarray(q, np.int8)
    r = np.ascontiguousarray(r, np.int8)
    c0 = np.asarray(c0, np.int32)
    n_acts = np.asarray(n_acts, np.int32)
    m_acts = np.asarray(m_acts, np.int32)
    B = q.shape[0]
    assert W % 128 == 0
    assert np.all(n_acts >= 1), 'wavefront prototype requires n_act >= 1'
    GWp = _region_width(W)

    a_lo = int(c0.min())
    a_hi = int((2 * n_acts.astype(np.int64) + c0).max()) + W - 1
    n_groups = -(-(a_hi - a_lo + 1) // G)

    par = np.zeros((B, 128), np.int32)
    par[:, 0] = c0
    par[:, 1] = n_acts
    par[:, 2] = m_acts
    zq, zr = _base_planes(q, r, c0, a_lo, n_groups, GWp)

    hatn, lcv, lci = _wavefront_call(
        par, zq, zr, B=B, W=W, GWp=GWp, n_groups=n_groups, a_lo=a_lo,
        scoring=scoring, config=config, interpret=interpret)
    hatn = np.asarray(hatn)
    lcv = np.asarray(lcv)
    lci = np.asarray(lci)

    # ---- end selection (mirrors _banded_single) -------------------------
    ks = np.arange(W, dtype=np.int64)
    score = np.empty(B, np.int32)
    end_i = np.empty(B, np.int32)
    end_j = np.empty(B, np.int32)
    for b in range(B):
        n, m, c = int(n_acts[b]), int(m_acts[b]), int(c0[b])
        best, ei, ej = NEG, n, m
        kc = m - n - c
        if 0 <= kc < W:
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
