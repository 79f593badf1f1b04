"""TPU parity check: device-side traceback (pallas_traceback) vs the
host-decoded moves path, on random banded tasks of mixed sizes/configs.

Run on the real TPU (the device path only engages off-CPU):
    python scripts/check_device_traceback.py
"""
import sys

import numpy as np

sys.path.insert(0, '/root/repo')

import jax  # noqa: E402

from unicycler_tpu.ops.banded import (BandedTask, align_banded,  # noqa: E402
                                      _align_banded_moves_path)
from unicycler_tpu.ops.pairwise import (AlignConfig, Scoring,  # noqa: E402
                                        SEMI_GLOBAL)

FULLY_GLOBAL = AlignConfig(False, False, False, False)
PATH_CONFIG = AlignConfig(False, False, False, True)
OVERLAP_CONFIG = AlignConfig(True, False, False, True)
END_CONFIG = AlignConfig(False, True, False, False)


def mutate(codes, rng, sub=0.06, ind=0.04):
    out = []
    i = 0
    while i < len(codes):
        r = rng.random()
        if r < ind / 2:
            out.append(rng.integers(0, 4))      # insertion
            continue
        if r < ind:
            i += 1                               # deletion
            continue
        if r < ind + sub:
            out.append((codes[i] + rng.integers(1, 4)) % 4)
        else:
            out.append(codes[i])
        i += 1
    return np.array(out, np.int8)


def cigar_len(cigar, which):
    return sum(c for c, op in cigar if op in which)


def main():
    rng = np.random.default_rng(7)
    scoring = Scoring(3, -6, -5, -2)
    tasks = []
    # 40 tasks across wildly mixed sizes: exercises multiple segments per
    # tape track, partial last segments, and big intra-segment spreads.
    for n in (40, 90, 400, 700, 1500, 3000, 6000, 12000):
        for _ in range(5):
            ref = rng.integers(0, 4, n + 200).astype(np.int8)
            off = rng.integers(0, 150)
            q = mutate(ref[off:off + n], rng)
            tasks.append(BandedTask(
                q=q, r=ref,
                corridor_read=np.array([0, len(q)], np.int32),
                corridor_ref=np.array([off, off + n], np.int32)))
    # a read longer than its reference (free_end_s1 lastcol/row-0 ends)
    for _ in range(4):
        ref = rng.integers(0, 4, 300).astype(np.int8)
        q = mutate(np.concatenate([ref, rng.integers(0, 4, 250)]).astype(
            np.int8), rng)
        tasks.append(BandedTask(
            q=q, r=ref,
            corridor_read=np.array([0, 300], np.int32),
            corridor_ref=np.array([0, 300], np.int32)))
    for config, name in ((SEMI_GLOBAL, 'semi'), (FULLY_GLOBAL, 'global'),
                         (PATH_CONFIG, 'path'), (OVERLAP_CONFIG, 'overlap'),
                         (END_CONFIG, 'end')):
        got = align_banded(tasks, scoring, config=config, band=75)
        want = _align_banded_moves_path(tasks, scoring, config, 256, True)
        bad = 0
        for ti, (g, w) in enumerate(zip(got, want)):
            ok = (g.score == w.score and g.cigar == w.cigar
                  and g.s1_start == w.s1_start and g.s2_start == w.s2_start
                  and g.s1_end == w.s1_end and g.s2_end == w.s2_end)
            if not ok:
                bad += 1
                print(f'  MISMATCH task {ti} ({name}):')
                print(f'    device: s={g.score} [{g.s1_start},{g.s1_end}]x'
                      f'[{g.s2_start},{g.s2_end}] cig={g.cigar[:6]}...')
                print(f'    host:   s={w.score} [{w.s1_start},{w.s1_end}]x'
                      f'[{w.s2_start},{w.s2_end}] cig={w.cigar[:6]}...')
            else:
                # sanity: cigar spans match coords
                assert cigar_len(g.cigar, 'MI') == g.s1_end - g.s1_start, ti
                assert cigar_len(g.cigar, 'MD') == g.s2_end - g.s2_start, ti
        print(f'{name}: {len(tasks) - bad}/{len(tasks)} match')
        if bad:
            sys.exit(1)
    # two-phase path (scores first, walk all): must equal one-phase
    from unicycler_tpu.ops.banded import align_banded_async, collect_many
    import os
    os.environ['UNICYCLER_TPU_TWO_PHASE'] = '1'
    h = align_banded_async(tasks, scoring, config=SEMI_GLOBAL, band=75,
                           need_cigar=True, two_phase=True)
    got2 = collect_many([h])[0]
    want2 = align_banded(tasks, scoring, config=SEMI_GLOBAL, band=75)
    bad = sum(1 for g, w in zip(got2, want2)
              if (g.score, g.cigar, g.s1_start, g.s1_end)
              != (w.score, w.cigar, w.s1_start, w.s1_end))
    print(f'two-phase: {len(tasks) - bad}/{len(tasks)} match')
    if bad:
        sys.exit(1)
    # two-phase with a keep subset: losers come back score-only
    keep_half = set(range(0, len(tasks), 2))
    h = align_banded_async(tasks, scoring, config=SEMI_GLOBAL, band=75,
                           need_cigar=True, two_phase=True)
    got3 = collect_many([h], keep_fn=lambda hi, scores: keep_half)[0]
    bad = 0
    for ti, (g, w) in enumerate(zip(got3, want2)):
        if ti in keep_half:
            ok = (g.score, g.cigar) == (w.score, w.cigar)
        else:
            ok = g.score == w.score and g.cigar == [] and g.s1_end == 0
        bad += 0 if ok else 1
    print(f'two-phase keep-subset: {len(tasks) - bad}/{len(tasks)} match')
    if bad:
        sys.exit(1)
    print('ALL PARITY CHECKS PASSED on', jax.devices()[0].platform)


if __name__ == '__main__':
    main()
