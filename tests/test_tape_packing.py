"""Unit tests for the tape builder's LPT packing / adaptive track count
and the native seed-search primitive added in round 2."""

import numpy as np

from unicycler_tpu.ops.banded import BandedTask, build_corridor
from unicycler_tpu.ops.tape import (SEG_ALIGN, _lpt_serial, build_tapes,
                                    choose_bt)


def _task(n, rng, m_extra=60):
    r = rng.integers(0, 4, n + m_extra).astype(np.int8)
    q = r[:n].copy()
    return BandedTask(q=q, r=r,
                      corridor_read=np.array([0, n], np.int32),
                      corridor_ref=np.array([0, n], np.int32))


def test_choose_bt_prefers_few_tracks_for_one_long_task():
    # one dominant task pins the serial length: fewer tracks = less
    # per-step vector cost at the same length
    assert choose_bt([70000, 2000, 1000]) == 8


def test_choose_bt_prefers_many_tracks_for_many_equal_tasks():
    # 64 equal tasks: serial halves with each doubling of tracks, so
    # cost (serial x bt) ties and more tracks win on wall time only
    # until the tie; the model then keeps the smallest tied bt
    alens = [1024] * 64
    cost8 = _lpt_serial(alens, 8) * 8
    cost32 = _lpt_serial(alens, 32) * 32
    assert cost8 == cost32          # perfectly divisible: a tie
    assert choose_bt(alens) == 8    # ties go to fewer tracks


def test_lpt_serial_is_max_track_load():
    assert _lpt_serial([64, 64, 32, 32], 2) == 96


def test_build_tapes_covers_all_tasks_once():
    rng = np.random.default_rng(0)
    sizes = [7000, 5200, 3100, 900, 650, 640, 500, 320, 200, 64, 64, 33]
    tasks = [_task(n, rng) for n in sizes]
    launches = build_tapes(tasks, 128, build_corridor)
    seen = []
    for tp in launches:
        bt = tp.qf.shape[0]
        assert bt in (8, 16, 32)
        for tr in range(bt):
            for kk in range(int(tp.n_tasks[tr])):
                ti = int(tp.task_ids[tr, kk])
                seen.append(ti)
                # task starts are group-aligned so resets land on
                # group boundaries
                assert tp.seg_start[tr, kk] % SEG_ALIGN == 0
                assert tp.n_t[tr, kk] == len(tasks[ti].q)
    assert sorted(seen) == list(range(len(tasks)))


def test_build_tapes_serial_length_not_worse_than_longest_task():
    rng = np.random.default_rng(1)
    tasks = [_task(n, rng) for n in (4096, 512, 512, 512, 256, 128)]
    launches = build_tapes(tasks, 128, build_corridor)
    assert len(launches) == 1
    tp = launches[0]
    longest = -(-4096 // SEG_ALIGN) * SEG_ALIGN
    assert tp.L_real == longest     # everything else packs under it


def test_native_window_ranges_matches_numpy():
    from unicycler_tpu.native import native_window_ranges
    rng = np.random.default_rng(2)
    kmers = rng.integers(0, 500, 20000).astype(np.uint64)
    pos = rng.integers(0, 1 << 20, 20000).astype(np.uint64)
    ck = np.sort((kmers << np.uint64(32)) | pos)
    qck = (rng.integers(0, 600, 5000).astype(np.uint64)) << np.uint64(32)
    w0, w1 = 1000, 900000
    out = native_window_ranges(ck, qck, w0, w1)
    if out is None:     # no toolchain: numpy fallback covers production
        return
    lo, hi = out
    assert np.array_equal(lo, np.searchsorted(ck, qck | np.uint64(w0)))
    assert np.array_equal(hi, np.searchsorted(ck, qck | np.uint64(w1)))


def test_collect_many_matches_individual_collects():
    import jax
    from unicycler_tpu.ops import banded as banded_ops
    from unicycler_tpu.ops import pairwise as pw
    if jax.devices()[0].platform == 'cpu':
        # CPU path is a lazy _SyncAlign: collect_many must still return
        # per-handle results in order
        pass
    rng = np.random.default_rng(3)
    groups = [[_task(n, rng) for n in (200, 150)],
              [_task(n, rng) for n in (300,)]]
    handles = [banded_ops.align_banded_async(
        [t for t in g], pw.Scoring(3, -6, -5, -2),
        config=pw.SEMI_GLOBAL, band=25) for g in groups]
    merged = banded_ops.collect_many(handles)
    direct = [banded_ops.align_banded(
        [t for t in g], pw.Scoring(3, -6, -5, -2),
        config=pw.SEMI_GLOBAL, band=25, need_cigar=True) for g in groups]
    for res, ref in zip(merged, direct):
        for pa, pb in zip(res, ref):
            assert pa.score == pb.score
            assert pa.cigar == pb.cigar
