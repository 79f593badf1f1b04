"""Split the WAVE tape kernels' device time, mirroring
scripts/tape_microbench.py on the identical synthetic workload so the
row-vs-wavefront production paths compare kernel-for-kernel: forward
(no moves), forward (+move emission), forward + walk + compress.

Usage: python scripts/wavetape_microbench.py [--band 200] [--iters 5]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np  # noqa: E402

from kernel_roofline import build_workload  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=5)
    ap.add_argument('--band', type=int, default=200)
    ap.add_argument('--scale', type=float, default=1.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from unicycler_tpu.ops import banded as banded_ops
    from unicycler_tpu.ops.pairwise import Scoring, SEMI_GLOBAL
    from unicycler_tpu.ops.wavetape import G, build_wavetapes
    from unicycler_tpu.ops.pallas_tape import compress_records
    from unicycler_tpu.ops.pallas_wavetape import (wavetape_forward,
                                                   wavetape_with_traceback)

    scoring = Scoring(3, -6, -5, -2)
    W = banded_ops.band_width(args.band)
    dev0 = jax.devices()[0]

    def stage(seed):
        tasks = build_workload(np.random.default_rng(seed), args.scale)
        launches = build_wavetapes(tasks, W, banded_ops.build_corridor)
        staged = []
        for tp in launches:
            arrs = [jax.device_put(a, dev0) for a in
                    (tp.q_tape, tp.r_flat, tp.adv8, tp.gflags,
                     tp.n_t, tp.m_t, tp.r_base, tp.rowbase, tp.dbase0,
                     tp.a0, tp.seg_g, tp.lastg, tp.abase, tp.n_tasks)]
            staged.append((tp, arrs))
        jax.block_until_ready([a for _, arrs in staged for a in arrs])
        return staged

    def run_fwd(staged, need_moves):
        acc = jnp.zeros((), jnp.int32)
        for tp, arrs in staged:
            score, end_i, end_j, moves, _ = wavetape_forward(
                *arrs[:12], scoring=scoring, config=SEMI_GLOBAL, W=W,
                need_moves=need_moves)
            acc = acc + jnp.sum(score) + moves[0, 0, 0]
        return int(acc)

    def run_full(staged):
        acc = jnp.zeros((), jnp.int32)
        for tp, arrs in staged:
            score, end_i, end_j, records, fin = wavetape_with_traceback(
                *arrs, scoring=scoring, config=SEMI_GLOBAL, W=W)
            cap = banded_ops._sparse_cap(
                int(tp.n_t[tp.n_t > 0].sum()), records)
            segA = tp.seg_g * G
            lenA = np.where(tp.n_t > 0,
                            (tp.lastg - tp.seg_g + 1) * G, 0)
            nnz, idx, vals = compress_records(records, cap,
                                              segments=(segA, lenA))
            acc = acc + jnp.sum(score) + nnz[0] + jnp.sum(fin[0, 0])
        return int(acc)

    staged = stage(0)
    run_fwd(staged, False)
    run_fwd(staged, True)
    run_full(staged)

    t_f0, t_f1, t_full = [], [], []
    serial_wf = 0
    for it in range(args.iters):
        staged = stage(it + 1)
        serial_wf = sum(tp.NG * G for tp, _ in staged)
        t0 = time.time(); run_fwd(staged, False); t_f0.append(time.time() - t0)
        t0 = time.time(); run_fwd(staged, True); t_f1.append(time.time() - t0)
        t0 = time.time(); run_full(staged); t_full.append(time.time() - t0)

    f0 = float(np.median(t_f0))
    f1 = float(np.median(t_f1))
    full = float(np.median(t_full))
    print(json.dumps({
        'W': W, 'serial_wavefronts': serial_wf,
        'fwd_nomoves_s': round(f0, 4),
        'fwd_moves_s': round(f1, 4),
        'fwd_walk_compress_s': round(full, 4),
        'us_per_wf_nomoves': round(f0 / serial_wf * 1e6, 3),
        'us_per_wf_moves': round(f1 / serial_wf * 1e6, 3),
        'us_per_wf_full': round(full / serial_wf * 1e6, 3),
    }))


if __name__ == '__main__':
    main()
