"""CPU parity tests for the Pallas TAPE path via interpret mode.

The tape kernels (ops/pallas_tape.py) are the production TPU path; on
hardware they're checked against the host decoder by
scripts/check_device_traceback.py. This runs the same parity in CI on
CPU with pallas_call(interpret=True): tape results (scores, ends,
CIGARs decoded from on-device traceback records) must equal the XLA
bucketed path exactly."""

import numpy as np
import pytest

from unicycler_tpu.ops.banded import (BandedTask, align_banded,
                                      align_banded_tape)
from unicycler_tpu.ops.pairwise import AlignConfig, Scoring, SEMI_GLOBAL

FULLY_GLOBAL = AlignConfig(False, False, False, False)
PATH_CONFIG = AlignConfig(False, False, False, True)


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


def _tasks(rng, sizes):
    tasks = []
    for n in sizes:
        ref = rng.integers(0, 4, n + 120).astype(np.int8)
        off = int(rng.integers(0, 80))
        q = _mutate(ref[off:off + n], rng)
        tasks.append(BandedTask(
            q=q, r=ref,
            corridor_read=np.array([0, len(q)], np.int32),
            corridor_ref=np.array([off, off + n], np.int32)))
    return tasks


@pytest.mark.parametrize('config', [SEMI_GLOBAL, FULLY_GLOBAL, PATH_CONFIG],
                         ids=['semi', 'global', 'path'])
def test_tape_matches_xla_path(config):
    rng = np.random.default_rng(11)
    scoring = Scoring(3, -6, -5, -2)
    # 12 tasks, mixed sizes: exercises two segments and partial tracks
    tasks = _tasks(rng, [60, 80, 120, 150, 200, 250, 300, 330, 90, 110,
                         140, 170])
    want = align_banded(tasks, scoring, config=config, band=40)
    got = align_banded_tape(tasks, scoring, config, 128, True,
                            interpret=True)
    for g, w, t in zip(got, want, tasks):
        assert g.score == w.score
        assert (g.s1_start, g.s1_end, g.s2_start, g.s2_end) == \
            (w.s1_start, w.s1_end, w.s2_start, w.s2_end)
        assert g.cigar == w.cigar


def test_tape_score_only_matches():
    rng = np.random.default_rng(5)
    scoring = Scoring(3, -6, -5, -2)
    tasks = _tasks(rng, [70, 130, 210, 90])
    want = align_banded(tasks, scoring, config=SEMI_GLOBAL, band=40,
                        need_cigar=False)
    got = align_banded_tape(tasks, scoring, SEMI_GLOBAL, 128, False,
                            interpret=True)
    for g, w in zip(got, want):
        assert g.score == w.score
        assert (g.s1_end, g.s2_end) == (w.s1_end, w.s2_end)


def test_tape_multi_device_matches():
    """Multi-chip data parallelism: tasks partitioned over the 8 virtual
    devices, each running its own tape launches, must reproduce the
    single-path results exactly."""
    import jax
    from unicycler_tpu.ops.banded import align_banded_multi
    devices = jax.devices()
    assert len(devices) >= 8
    rng = np.random.default_rng(3)
    scoring = Scoring(3, -6, -5, -2)
    tasks = _tasks(rng, [60, 90, 120, 150, 180, 210, 240, 270, 300, 110,
                         130, 170, 190, 230, 250, 80, 70, 100])
    want = align_banded(tasks, scoring, config=SEMI_GLOBAL, band=40)
    got = align_banded_multi(tasks, scoring, SEMI_GLOBAL, 128, True,
                             devices[:8], interpret=True)
    for g, w in zip(got, want):
        assert g.score == w.score
        assert g.cigar == w.cigar
        assert (g.s1_start, g.s1_end, g.s2_start, g.s2_end) == \
            (w.s1_start, w.s1_end, w.s2_start, w.s2_end)


def test_tape_band_escape_retry(monkeypatch):
    """Fault injection: when the on-device traceback reports a corrupt
    walk (records_to_cigar -> None), the per-task retry through the
    moves-fetch path must still produce correct alignments."""
    import unicycler_tpu.ops.banded as banded_mod
    import unicycler_tpu.ops.pallas_traceback as ptb

    rng = np.random.default_rng(21)
    scoring = Scoring(3, -6, -5, -2)
    tasks = _tasks(rng, [80, 120, 160])
    want = align_banded(tasks, scoring, config=SEMI_GLOBAL, band=40)

    calls = {'n': 0}
    real = ptb.records_to_cigar

    def flaky(records, end_i, fi, fj, code, config):
        calls['n'] += 1
        if calls['n'] % 2 == 1:       # every other task "escapes"
            return None
        return real(records, end_i, fi, fj, code, config)

    # the decoder resolves records_to_cigar at call time from the module
    monkeypatch.setattr(ptb, 'records_to_cigar', flaky)
    # retry goes through pallas_banded_batch, which needs interpret on
    # CPU: route it through the XLA bucketed path instead
    monkeypatch.setattr(
        banded_mod, '_align_banded_moves_path',
        lambda task_list, sc, cf, W, nc: align_banded(
            task_list, sc, config=cf, band=(W - 1) // 2, need_cigar=nc))

    got = align_banded_tape(tasks, scoring, SEMI_GLOBAL, 128, True,
                            interpret=True)
    assert calls['n'] >= 2
    for g, w in zip(got, want):
        assert g.score == w.score
        assert g.cigar == w.cigar


def test_tape_empty_and_degenerate_tasks():
    rng = np.random.default_rng(9)
    scoring = Scoring(3, -6, -5, -2)
    tasks = _tasks(rng, [100])
    tasks.append(BandedTask(q=np.zeros(0, np.int8),
                            r=np.zeros(5, np.int8) + 1,
                            corridor_read=np.zeros(0, np.int32),
                            corridor_ref=np.zeros(0, np.int32)))
    got = align_banded_tape(tasks, scoring, SEMI_GLOBAL, 128, True,
                            interpret=True)
    assert got[0].score > 0
    assert got[1].score == 0 and got[1].cigar == []


def test_tape_wide_band_rolled_kernel():
    """Wide bands (path-finding/consensus tasks reach W >= 2176) route
    through the rolled kernel body — the unrolled group body would
    overflow Mosaic's scoped-VMEM stack (pallas_tape.UNROLL_MAX_GWP).
    Results must stay exact."""
    rng = np.random.default_rng(31)
    scoring = Scoring(3, -6, -5, -2)
    tasks = _tasks(rng, [60, 150, 400])
    for config in (SEMI_GLOBAL, PATH_CONFIG):
        want = align_banded(tasks, scoring, config=config, band=40)
        got = align_banded_tape(tasks, scoring, config, 2176, True,
                                interpret=True)
        for g, w in zip(got, want):
            assert g.score == w.score
            assert g.cigar == w.cigar
