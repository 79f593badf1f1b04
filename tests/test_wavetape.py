"""CPU parity tests for the wavefront TAPE path via interpret mode.

The wavefront tape kernels (ops/pallas_wavetape.py) are the round-3
production TPU forward+traceback path for W <= 512. On straight
corridors their group windows equal the row kernels' per-row bands, so
scores, ends, AND CIGARs must match the XLA bucketed path bit-exactly.
On drifting corridors the effective band is the group-quantized window
(ops/pallas_wavefront semantics): there the scores must match the
wavefront prototype exactly and every CIGAR must re-score to the
reported score (a full-path validity oracle).
"""

import os

import numpy as np
import pytest

from unicycler_tpu.ops.banded import (BandedTask, align_banded,
                                      align_banded_tape)
from unicycler_tpu.ops.pairwise import (AlignConfig, Scoring, NEG,
                                        SEMI_GLOBAL)

FULLY_GLOBAL = AlignConfig(False, False, False, False)
PATH_CONFIG = AlignConfig(False, False, False, True)
OVERLAP_CONFIG = AlignConfig(True, False, False, True)
END_CONFIG = AlignConfig(False, True, False, False)

SCORING = Scoring(3, -6, -5, -2)


def _mutate(codes, rng, sub=0.06, ind=0.04):
    out = []
    i = 0
    while i < len(codes):
        r = rng.random()
        if r < ind / 2:
            out.append(rng.integers(0, 4))
            continue
        if r < ind:
            i += 1
            continue
        if r < ind + sub:
            out.append((codes[i] + rng.integers(1, 4)) % 4)
        else:
            out.append(codes[i])
        i += 1
    return np.array(out, np.int8)


def _tasks(rng, sizes, straight=True):
    tasks = []
    for n in sizes:
        ref = rng.integers(0, 4, n + 120).astype(np.int8)
        off = int(rng.integers(0, 80))
        q = _mutate(ref[off:off + n], rng)
        if straight:
            cr = np.array([0, len(q)], np.int32)
            cf = np.array([off, off + n], np.int32)
        else:
            # bent corridor: mid anchor displaced so the window drifts
            mid = len(q) // 2
            cr = np.array([0, mid, len(q)], np.int32)
            cf = np.array([off, off + mid + int(rng.integers(-20, 20)),
                           off + n], np.int32)
        tasks.append(BandedTask(q=q, r=ref, corridor_read=cr,
                                corridor_ref=cf))
    return tasks


def _wave(tasks, config, W, need_cigar=True):
    os.environ['UNICYCLER_TPU_WAVETAPE'] = '1'
    try:
        return align_banded_tape(tasks, SCORING, config, W, need_cigar,
                                 interpret=True)
    finally:
        os.environ.pop('UNICYCLER_TPU_WAVETAPE', None)


def _rescore(pa, task, config):
    """Recompute the DP score of an alignment path from its CIGAR —
    independent validity oracle for any banded result."""
    q, r = task.q, task.r
    i, j = pa.s1_start, pa.s2_start
    score = 0
    # start costs for non-free starts
    if not config.free_start_s2 and j > 0:
        # leading D run is part of the cigar in that case
        pass
    for count, op in pa.cigar:
        if op == 'M':
            for k in range(count):
                score += SCORING.match if q[i + k] == r[j + k] \
                    else SCORING.mismatch
            i += count
            j += count
        elif op == 'I':
            score += SCORING.gap_open + (count - 1) * SCORING.gap_extend
            i += count
        else:
            score += SCORING.gap_open + (count - 1) * SCORING.gap_extend
            j += count
    assert (i, j) == (pa.s1_end, pa.s2_end), \
        'CIGAR span mismatch: (%d,%d) vs (%d,%d)' % (i, j, pa.s1_end,
                                                     pa.s2_end)
    return score


ALL_CONFIGS = [SEMI_GLOBAL, FULLY_GLOBAL, PATH_CONFIG, OVERLAP_CONFIG,
               END_CONFIG]
CONFIG_IDS = ['semi', 'global', 'path', 'overlap', 'end']


@pytest.mark.parametrize('config', ALL_CONFIGS, ids=CONFIG_IDS)
def test_wavetape_matches_row_path_straight(config):
    rng = np.random.default_rng(11)
    tasks = _tasks(rng, [60, 80, 120, 150, 200, 250, 300, 330, 90, 110,
                         140, 170])
    want = align_banded(tasks, SCORING, config=config, band=40)
    got = _wave(tasks, config, 128)
    for g, w, t in zip(got, want, tasks):
        assert g.score == w.score, (g, w)
        assert (g.s1_start, g.s1_end, g.s2_start, g.s2_end) == \
            (w.s1_start, w.s1_end, w.s2_start, w.s2_end)
        assert g.cigar == w.cigar


@pytest.mark.parametrize('W,band', [(1024, 400), (2048, 900)],
                         ids=['W1024', 'W2048'])
def test_wavetape_wide_bands_match_row_path(W, band):
    """Wide bands (the path/cull scoring range) must stay exact — the
    W-dependent tape pads exist because fixed 512-byte pads let wide
    windows clip their lane-domain starts (silent window shift)."""
    rng = np.random.default_rng(31)
    tasks = _tasks(rng, [150, 400, 700])
    for config in (SEMI_GLOBAL, FULLY_GLOBAL):
        want = align_banded(tasks, SCORING, config=config, band=band)
        got = _wave(tasks, config, W)
        for g, w in zip(got, want):
            assert g.score == w.score and g.cigar == w.cigar


def test_wavetape_score_only_matches():
    rng = np.random.default_rng(5)
    tasks = _tasks(rng, [70, 130, 210, 90])
    want = align_banded(tasks, SCORING, config=SEMI_GLOBAL, band=40,
                        need_cigar=False)
    got = _wave(tasks, SEMI_GLOBAL, 128, need_cigar=False)
    for g, w in zip(got, want):
        assert g.score == w.score


@pytest.mark.parametrize('config', [SEMI_GLOBAL, FULLY_GLOBAL],
                         ids=['semi', 'global'])
def test_wavetape_drifting_matches_prototype(config):
    """Drifting corridors: the tape must reproduce the wavefront
    prototype's group-quantized window scores exactly (the prototype is
    itself pinned to a literal numpy oracle in test_wavefront.py), and
    every CIGAR must re-score to the reported score."""
    from unicycler_tpu.ops.banded import build_corridor
    from unicycler_tpu.ops.pallas_wavefront import \
        wavefront_batch_corridor

    rng = np.random.default_rng(23)
    W = 128
    tasks = _tasks(rng, [90, 140, 200, 260], straight=False)
    got = _wave(tasks, config, W)
    # row-path results: the oracle for wave-NEG retries (no-free-end
    # configs whose corner the group-quantized window clipped re-run
    # through the exact per-row-corridor kernels)
    row = align_banded(tasks, SCORING, config=config, band=40)  # W=128

    for t, g, rw in zip(tasks, got, row):
        n, m = len(t.q), len(t.r)
        c = build_corridor(t.corridor_read, t.corridor_ref, n, m, W)
        q = t.q[None, :]
        r = t.r[None, :]
        score, ei, ej = wavefront_batch_corridor(
            q, r, [c], np.array([n], np.int32), np.array([m], np.int32),
            SCORING, config, W=W, interpret=True)
        if int(score[0]) <= NEG // 2:
            if config.free_end_s1 or config.free_end_s2:
                assert g.score == 0 and not g.cigar
            else:
                assert g.score == rw.score and g.cigar == rw.cigar
            continue
        assert g.score == int(score[0]), (g.score, int(score[0]))
        assert (g.s1_end, g.s2_end) == (int(ei[0]), int(ej[0]))
        if g.cigar:
            assert _rescore(g, t, config) == g.score


def test_lane_domain_windows_match_gather_oracle():
    """The kernel's lane-domain window math (single slice of the
    repeat-2 tapes with S linear in group metadata, q task-reversed)
    must reproduce the gather-built ZQ/ZR planes exactly, drift and
    parity included."""
    import jax.numpy as jnp
    from unicycler_tpu.ops.banded import build_corridor
    from unicycler_tpu.ops import pallas_wavetape as pwt
    from unicycler_tpu.ops.wavetape import G, build_wavetapes

    rng = np.random.default_rng(5)
    W = 128
    GWp = pwt._region_width(W)
    tasks = _tasks(rng, [90, 200, 333], straight=False)
    tp = build_wavetapes(tasks, W, build_corridor)[0]
    B, NG = tp.adv8.shape

    gfl = tp.gflags.astype(np.int64)
    seg = np.clip(np.cumsum(gfl & 1, axis=1) - 1, 0, None)
    takeg = lambda a: np.take_along_axis(a.astype(np.int64), seg, axis=1)
    dbase_g = np.cumsum(tp.adv8.astype(np.int64), axis=1) \
        + takeg(tp.dbase0)
    a_g0 = takeg(tp.a0) + (np.arange(NG)[None, :] - takeg(tp.seg_g)) * G
    rowb_g = takeg(tp.rowbase)
    rb_g = takeg(tp.r_base) + W
    n_g = takeg(tp.n_t)

    # the gather oracle expects the UNREVERSED layout
    q_unrev = tp.q_tape.copy()
    for tr in range(B):
        for kk in range(int(tp.n_tasks[tr])):
            rb_, n_ = int(tp.rowbase[tr, kk]), int(tp.n_t[tr, kk])
            q_unrev[tr, rb_:rb_ + n_] = q_unrev[tr, rb_:rb_ + n_][::-1]
    zq_old, zr_old = pwt._build_planes(
        jnp.asarray(q_unrev), jnp.asarray(tp.r_flat),
        jnp.asarray(rowb_g), jnp.asarray(rb_g), jnp.asarray(a_g0),
        jnp.asarray(dbase_g), GWp)
    zq_old, zr_old = np.asarray(zq_old), np.asarray(zr_old)

    q2 = np.repeat(tp.q_tape, 2, axis=1)
    r2 = np.repeat(tp.r_flat, 2, axis=1)
    kq = a_g0 + G - 1 - dbase_g
    sq = np.clip(2 * (rowb_g + n_g) + 1 - kq, 0, q2.shape[1] - GWp)
    kr = a_g0 + dbase_g
    sr = np.clip(2 * (rb_g - 1) + kr, 0, r2.shape[1] - GWp)
    for g in range(NG):
        for b in range(B):
            s, s2 = int(sq[b, g]), int(sr[b, g])
            assert (q2[b, s:s + GWp] == zq_old[g, b]).all(), (g, b)
            assert (r2[b, s2:s2 + GWp] == zr_old[g, b]).all(), (g, b)


def test_wavetape_perfect_and_tiny():
    """Exact containment (all-M path) and a 1-base query, multi-task."""
    rng = np.random.default_rng(3)
    ref = rng.integers(0, 4, 400).astype(np.int8)
    tasks = [
        BandedTask(q=ref[37:37 + 256].copy(), r=ref,
                   corridor_read=np.array([0, 256], np.int32),
                   corridor_ref=np.array([37, 293], np.int32)),
        BandedTask(q=ref[5:6].copy(), r=ref[:40],
                   corridor_read=np.array([0, 1], np.int32),
                   corridor_ref=np.array([5, 6], np.int32)),
    ]
    got = _wave(tasks, SEMI_GLOBAL, 128)
    assert got[0].score == 3 * 256
    assert got[0].cigar == [(256, 'M')]
    assert (got[0].s1_start, got[0].s2_start) == (0, 37)
    assert got[1].score == 3


@pytest.mark.parametrize('config', [SEMI_GLOBAL, FULLY_GLOBAL],
                         ids=['semi', 'global'])
def test_packed_entry_matches_unpacked(config):
    """The packed-buffer twins (2 uploads per launch instead of ~14)
    must be bit-identical to the unpacked entry points."""
    import jax.numpy as jnp
    from unicycler_tpu.ops import banded as banded_ops
    from unicycler_tpu.ops.wavetape import (G, build_wavetapes,
                                            pack_launch_inputs)
    from unicycler_tpu.ops.pallas_wavetape import (
        wavetape_forward, wavetape_forward_packed,
        wavetape_with_traceback, wavetape_with_traceback_packed)

    rng = np.random.default_rng(23)
    tasks = _tasks(rng, [180, 333, 90], straight=False)
    W = 128
    launches = build_wavetapes(tasks, W, banded_ops.build_corridor)
    for tp in launches:
        segA = tp.seg_g * G
        lenA = np.where(tp.n_t > 0, (tp.lastg - tp.seg_g + 1) * G, 0)
        bytes_buf, ints_buf, geom = pack_launch_inputs(tp, segA, lenA)
        args = (tp.q_tape, tp.r_flat, tp.adv8, tp.gflags, tp.n_t,
                tp.m_t, tp.r_base, tp.rowbase, tp.dbase0, tp.a0,
                tp.seg_g, tp.lastg)
        ref_fwd = wavetape_forward(*args, scoring=SCORING, config=config,
                                   W=W, need_moves=False, interpret=True)
        got_fwd = wavetape_forward_packed(bytes_buf, ints_buf, geom,
                                          scoring=SCORING, config=config,
                                          W=W, need_moves=False,
                                          interpret=True)
        for a, b in zip(ref_fwd[:3], got_fwd[:3]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        ref_tb = wavetape_with_traceback(
            *args, tp.abase, tp.n_tasks, scoring=SCORING, config=config,
            W=W, interpret=True)
        got_tb = wavetape_with_traceback_packed(
            bytes_buf, ints_buf, geom, scoring=SCORING, config=config,
            W=W, interpret=True)
        for a, b in zip(ref_tb, got_tb[:5]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(got_tb[5]), segA)
        np.testing.assert_array_equal(np.asarray(got_tb[6]), lenA)
