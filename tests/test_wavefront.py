"""Parity: the anti-diagonal wavefront prototype vs the row-scan kernel.

The wavefront kernel (ops/pallas_wavefront.py) must produce bit-identical
(score, end_i, end_j) to ops.banded._banded_single for straight corridors
across every AlignConfig, and to a literal numpy oracle of the
group-quantized window semantics for DRIFTING corridors — those
equivalences are what license the round-3 tape-kernel rewrite. Runs in
Pallas interpret mode on CPU.
"""

import numpy as np
import pytest

import jax

from unicycler_tpu.ops import pairwise as pw
from unicycler_tpu.ops.banded import _banded_single, build_corridor
from unicycler_tpu.ops.pallas_wavefront import (G, _prepare,
                                                wavefront_batch,
                                                wavefront_batch_corridor)

CONFIGS = [pw.SEMI_GLOBAL, pw.FULLY_GLOBAL, pw.PATH_CONFIG,
           pw.OVERLAP_CONFIG, pw.START_CONFIG, pw.END_CONFIG]

W = 128


def _reference(q, r, c0, n_act, m_act, scoring, config):
    n_pad = q.shape[0]
    m_pad = r.shape[0]
    r_ext = np.full(m_pad + 2 * W, 6, np.int8)
    r_ext[W:W + m_pad] = r
    c = (np.int32(c0) + np.arange(n_pad + 1, dtype=np.int32))
    # _banded_single defines c[i] as row i's band start with c[0] for
    # row 0; straight corridor: c[i] = c0 + i
    score, ei, ej, _ = jax.jit(
        _banded_single,
        static_argnames=('scoring', 'config', 'W', 'need_moves'))(
        q, r_ext, c, np.int32(n_act), np.int32(m_act),
        scoring=scoring, config=config, W=W, need_moves=False)
    return int(score), int(ei), int(ej)


def _random_tasks(rng, B, n_pad, m_pad, related=True):
    q = rng.randint(0, 4, (B, n_pad)).astype(np.int8)
    r = rng.randint(0, 4, (B, m_pad)).astype(np.int8)
    c0 = np.empty(B, np.int32)
    n_acts = np.empty(B, np.int32)
    m_acts = np.empty(B, np.int32)
    for b in range(B):
        n_acts[b] = rng.randint(1, n_pad + 1)
        m_acts[b] = rng.randint(max(1, n_acts[b] - W), m_pad + 1)
        c0[b] = rng.randint(-W + 1, max(2, m_acts[b] - n_acts[b]) + W // 2)
        if related and rng.rand() < 0.7:
            # plant q inside r (with noise) so real alignments exist
            n = int(n_acts[b])
            off = rng.randint(0, max(1, m_acts[b] - n + 1))
            seg = q[b, :min(n, m_acts[b] - off)].copy()
            mut = rng.rand(len(seg)) < 0.08
            seg[mut] = rng.randint(0, 4, mut.sum())
            r[b, off:off + len(seg)] = seg
            c0[b] = off - W // 2
    return q, r, c0, n_acts, m_acts


@pytest.mark.parametrize('config', CONFIGS,
                         ids=lambda c: ''.join('ft'[x] for x in c))
def test_wavefront_matches_row_kernel(config):
    rng = np.random.RandomState(11)
    scoring = pw.DEFAULT_SCORING
    q, r, c0, n_acts, m_acts = _random_tasks(rng, 8, 96, 192)
    score, ei, ej = wavefront_batch(q, r, c0, n_acts, m_acts, scoring,
                                    config, W=W, interpret=True)
    for b in range(8):
        want = _reference(q[b], r[b], c0[b], n_acts[b], m_acts[b],
                          scoring, config)
        got = (int(score[b]), int(ei[b]), int(ej[b]))
        assert got == want, (b, got, want, config)


def test_wavefront_perfect_match_and_gaps():
    scoring = pw.DEFAULT_SCORING
    rng = np.random.RandomState(5)
    n = 64
    r = rng.randint(0, 4, (4, 160)).astype(np.int8)
    q = np.zeros((4, n), np.int8)
    # 0: exact containment; 1: one deletion in read; 2: one insertion;
    # 3: mismatch block
    q[0] = r[0, 20:20 + n]
    q[1, :30] = r[1, 10:40]
    q[1, 30:] = r[1, 45:45 + n - 30]
    q[2, :30] = r[2, 10:40]
    q[2, 30:36] = (r[2, 40:46] + 1) % 4
    q[2, 36:] = r[2, 40:40 + n - 36]
    q[3] = r[3, 50:50 + n]
    q[3, 10:14] = (q[3, 10:14] + 2) % 4
    c0 = np.array([20 - 64, 10 - 64, 10 - 64, 50 - 64], np.int32)
    n_acts = np.full(4, n, np.int32)
    m_acts = np.full(4, 160, np.int32)
    for config in (pw.SEMI_GLOBAL, pw.FULLY_GLOBAL):
        score, ei, ej = wavefront_batch(q, r, c0, n_acts, m_acts, scoring,
                                        config, W=W, interpret=True)
        for b in range(4):
            want = _reference(q[b], r[b], c0[b], n_acts[b], m_acts[b],
                              scoring, config)
            assert (int(score[b]), int(ei[b]), int(ej[b])) == want, \
                (b, config)
    # sanity: the contained perfect read scores match * n semi-globally
    score, _, _ = wavefront_batch(q[:1], r[:1], c0[:1], n_acts[:1],
                                  m_acts[:1], scoring, pw.SEMI_GLOBAL,
                                  W=W, interpret=True)
    assert int(score[0]) == scoring.match * n


# ---------------------------------------------------------------------------
# Drifting corridors: literal numpy oracle of the group-window semantics
# ---------------------------------------------------------------------------

def _oracle_dp(q, r, n, m, W, dbase_col, a_lo, scoring, config):
    """Mirror of the kernel's group-quantized window DP, cell by cell:
    cell (i, j) is computed iff its wavefront a = i + j is in range and
    its diagonal lies in group g(a)'s window [dbase_g, dbase_g + W)."""
    NEGv = pw.NEG
    op, ext = scoring.gap_open, scoring.gap_extend
    n_groups = len(dbase_col)

    def active(i, j):
        a = i + j
        if a < a_lo:
            return False
        g = (a - a_lo) // G
        if g >= n_groups:
            return False
        x = (j - i) - int(dbase_col[g])
        return 0 <= x < W

    H = np.full((n + 1, m + 1), NEGv, np.int64)
    E = np.full((n + 1, m + 1), NEGv, np.int64)
    F = np.full((n + 1, m + 1), NEGv, np.int64)
    for i in range(n + 1):
        for j in range(m + 1):
            if not active(i, j):
                continue
            if i == 0:
                if config.free_start_s2:
                    H[0, j] = 0
                else:
                    H[0, j] = 0 if j == 0 else op + (j - 1) * ext
                continue
            if j == 0:
                H[i, 0] = 0 if config.free_start_s1 else op + (i - 1) * ext
                continue
            e = max(H[i, j - 1] + op, E[i, j - 1] + ext)
            if e <= NEGv // 2:
                e = NEGv
            E[i, j] = e
            F[i, j] = max(H[i - 1, j] + op, F[i - 1, j] + ext)
            sub = scoring.match if q[i - 1] == r[j - 1] else scoring.mismatch
            H[i, j] = max(H[i - 1, j - 1] + sub, e, F[i, j])

    # end selection: corner, then free_end_s2 (smallest j wins ties),
    # then free_end_s1 (smallest i wins ties) — strict improvements only
    best, ei, ej = NEGv, n, m
    if active(n, m):
        best = int(H[n, m])
    if config.free_end_s2:
        for j in range(m + 1):
            if active(n, j) and int(H[n, j]) > best:
                best, ej = int(H[n, j]), j
    if config.free_end_s1:
        col_best, col_i = NEGv, n
        for i in range(n + 1):
            if active(i, m) and int(H[i, m]) > col_best:
                col_best, col_i = int(H[i, m]), i
        if col_best > best:
            best, ei, ej = col_best, col_i, m
    return best, ei, ej


def _drifty_tasks(rng, B, n_pad, m_pad, W):
    """Random tasks with production-style corridors: seeds on a noisy
    diagonal with indel skew, corridor from ops.banded.build_corridor."""
    q = rng.randint(0, 4, (B, n_pad)).astype(np.int8)
    r = rng.randint(0, 4, (B, m_pad)).astype(np.int8)
    n_acts = np.empty(B, np.int32)
    m_acts = np.empty(B, np.int32)
    c_rows = []
    for b in range(B):
        n = rng.randint(n_pad // 2, n_pad + 1)
        m = rng.randint(max(2, n // 2), m_pad + 1)
        n_acts[b], m_acts[b] = n, m
        # plant q in r with indel skew so the corridor genuinely drifts
        off = rng.randint(0, max(1, m - n // 2))
        qi, ri = 0, off
        while qi < n and ri < m:
            run = rng.randint(5, 30)
            run = min(run, n - qi, m - ri)
            r[b, ri:ri + run] = q[b, qi:qi + run]
            qi += run
            ri += run
            if rng.rand() < 0.5:
                ri += rng.randint(1, 6)       # deletion in read
            else:
                qi += rng.randint(1, 6)       # insertion in read
        anchors_read = np.arange(0, n, 17, dtype=np.int64)
        drift = np.clip(rng.randint(-1, 4, len(anchors_read)), -1, 3)
        anchors_ref = np.clip(anchors_read + off + np.cumsum(drift),
                              0, m - 1)
        anchors_ref = np.maximum.accumulate(anchors_ref)
        c_rows.append(build_corridor(anchors_read, anchors_ref, n, m, W))
    return q, r, c_rows, n_acts, m_acts


@pytest.mark.parametrize('config', CONFIGS,
                         ids=lambda c: ''.join('ft'[x] for x in c))
def test_wavefront_drifting_corridor_oracle(config):
    rng = np.random.RandomState(23)
    scoring = pw.DEFAULT_SCORING
    B = 4
    q, r, c_rows, n_acts, m_acts = _drifty_tasks(rng, B, 120, 300, W)
    score, ei, ej = wavefront_batch_corridor(
        q, r, c_rows, n_acts, m_acts, scoring, config, W=W, interpret=True)
    par, db, _, _, a_lo, n_groups, Wcap, _, dmin = _prepare(
        q, r, c_rows, n_acts, m_acts, W)
    for b in range(B):
        want = _oracle_dp(q[b], r[b], int(n_acts[b]), int(m_acts[b]), W,
                          db[:, b, 0], a_lo, scoring, config)
        got = (int(score[b]), int(ei[b]), int(ej[b]))
        assert got == want, (b, got, want, config)


def test_wavefront_drifting_matches_row_kernel_on_planted():
    """With a generously-covering corridor, the drifting wavefront finds
    the same semi-global score as the row kernel run on the same seqs
    (full-width straight band covering everything)."""
    rng = np.random.RandomState(31)
    scoring = pw.DEFAULT_SCORING
    q, r, c_rows, n_acts, m_acts = _drifty_tasks(rng, 4, 100, 220, W)
    score, ei, ej = wavefront_batch_corridor(
        q, r, c_rows, n_acts, m_acts, scoring, pw.SEMI_GLOBAL, W=W,
        interpret=True)
    for b in range(4):
        n, m = int(n_acts[b]), int(m_acts[b])
        W_big = 512                      # covers [-128, 384) ⊇ all columns
        r_ext = np.full(m + 2 * W_big, 6, np.int8)
        r_ext[W_big:W_big + m] = r[b, :m]
        c = np.full(n + 1, -128, np.int32)
        s2, _, _, _ = jax.jit(
            _banded_single,
            static_argnames=('scoring', 'config', 'W', 'need_moves'))(
            q[b, :n], r_ext, c, np.int32(n), np.int32(m),
            scoring=scoring, config=pw.SEMI_GLOBAL, W=W_big,
            need_moves=False)
        # the banded result can only be <= the (effectively) unbanded one
        assert int(score[b]) <= int(s2)
        # planted 90%-identity tasks always score positive; required for
        # the 0.5-factor lower bound below to be meaningful
        assert int(s2) > 0
        # and on these planted tasks the corridor covers the true path
        assert int(score[b]) >= int(0.5 * int(s2))
