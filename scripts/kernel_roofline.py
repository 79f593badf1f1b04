"""Kernel-only throughput of the tape aligner vs a VPU roofline.

Separates the bench workload's device time into compute, transfer, and
dispatch RTT so the "reads/s on directly-attached hardware" claim is
arithmetic rather than extrapolation:

  * dispatch + 4-byte fetch      -> compute + RTT (no payload transfer)
  * dispatch + full record fetch -> compute + RTT + payload transfer

Every timing uses FRESH input arrays (the axon result cache returns
repeated identical calls in ~0.2 ms) and is repeated `--iters` times.

The VPU roofline: one DP row of W lanes executes a fixed sequence of
vector ops (the forward kernel body is ~45 int32 VPU ops per lane: two
rolls/selects for realignment, F/E affine updates with a prefix cummax,
substitution compare, move-bit packing; the traceback walk adds a
reverse pass of ~1/8 that cost at 1 record per row). A v5e core at
~940 GFLOP/s-equivalent int32 VPU throughput (8x128 ALUs x ~940 MHz)
gives W=512: ~45 ops x 512 lanes / (8*128 ALUs) ~ 22.5 cycles/row
=> ~42 M rows/s upper bound per core, ~21 Gcell/s at W=512.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np  # noqa: E402


def build_workload(rng, scale=1.0):
    """Synthetic tasks shaped like the bench fixtures: long reads vs a
    long reference at ~12% divergence, anchor corridors on the diagonal."""
    from unicycler_tpu.ops.banded import BandedTask
    tasks = []
    for n in (72000, 64000, 52000, 46000, 40000, 37000, 12000, 8000,
              6000, 4600, 4100, 3800):
        n = int(n * scale)
        r = rng.integers(0, 4, int(n * 1.1) + 50, dtype=np.int64)
        q = r[:n].copy()
        # ~12% errors
        err = rng.random(n) < 0.12
        q[err] = (q[err] + rng.integers(1, 4, err.sum())) % 4
        anchors = np.arange(0, n, 512, dtype=np.int32)
        tasks.append(BandedTask(q=q.astype(np.int8),
                                r=r.astype(np.int8),
                                corridor_read=anchors,
                                corridor_ref=anchors))
    return tasks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=3)
    ap.add_argument('--band', type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from unicycler_tpu.ops import banded as banded_ops
    from unicycler_tpu.ops.pairwise import Scoring, SEMI_GLOBAL

    scoring = Scoring(3, -6, -5, -2)
    W = max(128, int(np.ceil((2 * args.band + 1) / 128.0)) * 128)
    rng = np.random.default_rng(0)

    # Warm-up: compile both kernel phases.
    tasks = build_workload(rng)
    banded_ops.align_banded_tape(tasks, scoring, SEMI_GLOBAL, W, True)

    compute_times = []      # dispatch + scalar fetch (inputs pre-staged)
    upload_times = []       # host->device staging of the tape arrays
    full_times = []         # dispatch + full fetch
    decode_times = []
    total_rows = 0
    total_cells = 0
    fetch_bytes = 0
    dev0 = jax.devices()[0]
    for it in range(args.iters):
        tasks = build_workload(np.random.default_rng(it + 1))
        rows = sum(len(t.q) for t in tasks)
        total_rows += rows
        total_cells += rows * W

        # upload: stage the tape arrays on device and block, so the
        # compute measurement below excludes the tunnel's H2D cost
        # (negligible on attached hardware, dominant through a tunnel)
        from unicycler_tpu.ops.tape import build_tapes
        from unicycler_tpu.ops.banded import build_corridor
        launches = build_tapes(tasks, W, build_corridor)
        t0 = time.time()
        staged = []
        for tp in launches:
            arrs = [jax.device_put(a, dev0) for a in
                    (tp.qf, tp.r_flat, tp.cbase, tp.c0m, tp.c_n, tp.m_t,
                     tp.n_t, tp.r_base, tp.seg_start, tp.reset_slot,
                     tp.cap_slot, tp.last_slot, tp.n_tasks)]
            staged.append((tp, arrs))
        jax.block_until_ready([a for _, arrs in staged for a in arrs])
        upload_times.append(time.time() - t0)

        # compute + RTT: dispatch on the staged arrays, fetch one scalar
        from unicycler_tpu.ops.pallas_tape import tape_with_traceback
        t0 = time.time()
        acc = jnp.zeros((), jnp.int32)
        for tp, arrs in staged:
            score, end_i, end_j, records, fin = tape_with_traceback(
                *arrs, scoring=scoring, config=SEMI_GLOBAL, W=W)
            acc = acc + jnp.sum(score) + records[0, 0] + jnp.sum(fin[0, 0])
        _ = int(acc)
        compute_times.append(time.time() - t0)

        # compute + RTT + payload: the production path
        tasks2 = build_workload(np.random.default_rng(100 + it))
        t0 = time.time()
        pending = banded_ops._tape_dispatch(tasks2, scoring, SEMI_GLOBAL, W,
                                            True)
        grouped = banded_ops._tape_collect(pending)
        full_times.append(time.time() - t0)
        for parts in grouped:
            fetch_bytes += sum(p.nbytes for p in parts)
        t0 = time.time()
        results = [None] * len(tasks2)
        banded_ops._tape_decode(results, list(range(len(tasks2))), pending,
                                grouped, True, SEMI_GLOBAL)
        decode_times.append(time.time() - t0)

    iters = args.iters
    rows_per_iter = total_rows / iters
    compute = float(np.median(compute_times))
    upload = float(np.median(upload_times))
    full = float(np.median(full_times))
    decode = float(np.median(decode_times))
    row_rate = rows_per_iter / compute
    cell_rate = row_rate * W
    # the serial unit is one 32-track tape step; the VPU estimate in the
    # module docstring is per 32-alignment step
    # Roofline per SERIAL tape step (the unit of kernel wall time): one
    # step advances every track one DP row. The unrolled body runs ~60
    # vector ops per row on (bt, GWp) int32 state = ceil(bt/8)*ceil(GWp/128)
    # vregs per op at ~1 vreg-op/cycle, 940 MHz.
    from unicycler_tpu.ops.tape import build_tapes as _bt
    from unicycler_tpu.ops.pallas_tape import _region_width
    tasks_r = build_workload(np.random.default_rng(0))
    serial_steps = 0
    bt_used = None
    for tp in _bt(tasks_r, W, banded_ops.build_corridor):
        serial_steps += tp.L
        bt_used = tp.qf.shape[0]
    GWp = _region_width(W)
    vregs = -(-bt_used // 8) * -(-GWp // 128)
    ideal_step_s = 60 * vregs / 940e6
    step_s = compute / serial_steps
    out = {
        'W': W,
        'bt': bt_used,
        'task_rows_per_iter': int(rows_per_iter),
        'serial_steps_per_iter': int(serial_steps),
        'upload_s': round(upload, 4),
        'compute_plus_rtt_s': round(compute, 4),
        'dispatch_plus_everything_s': round(full, 4),
        'host_decode_s': round(decode, 4),
        'fetch_MB_per_iter': round(fetch_bytes / iters / 1e6, 2),
        'task_rows_per_s_compute_only': int(row_rate),
        'cells_per_s_compute_only': int(cell_rate),
        'us_per_serial_step': round(step_s * 1e6, 3),
        'ideal_us_per_serial_step': round(ideal_step_s * 1e6, 3),
        'fraction_of_vpu_ideal': round(ideal_step_s / step_s, 3),
    }
    print(json.dumps(out, indent=2))


if __name__ == '__main__':
    main()
