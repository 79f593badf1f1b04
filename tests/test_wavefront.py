"""Parity: the anti-diagonal wavefront prototype vs the row-scan kernel.

The wavefront kernel (ops/pallas_wavefront.py) must produce bit-identical
(score, end_i, end_j) to ops.banded._banded_single for straight corridors
across every AlignConfig — that equivalence is what licenses the round-3
tape-kernel rewrite. Runs in Pallas interpret mode on CPU.
"""

import numpy as np
import pytest

import jax

from unicycler_tpu.ops import pairwise as pw
from unicycler_tpu.ops.banded import _banded_single
from unicycler_tpu.ops.pallas_wavefront import wavefront_batch

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
