"""Measure the anti-diagonal wavefront prototype vs the row-scan tape kernel.

Runs on the real TPU. The comparison metric is us per DP ROW-equivalent
(one row = W cells = 2 wavefronts), kernel compute only. Per-call time
through the axon tunnel is dispatch-dominated (~28 ms floor), so the
kernel rate is derived from the SLOPE between two workload sizes; run at
n and 2n and subtract.

The tape kernel's measured forward rate is ~1.47 us/serial step at W=512
(PERF.md "Forward-kernel micro-pass"); the wavefront formulation removes
the prefix-cummax ladder (~36% of that) at the cost of 2x the serial
steps, each ~3x cheaper.

Usage: python scripts/wavefront_microbench.py [n_rows] [W] [drift]
  drift = per-16-row corridor diagonal drift (0 = straight; production
  corridors drift a few lanes per group).
"""

import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    drift = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    B = 8
    import jax
    import jax.numpy as jnp
    from unicycler_tpu.ops import pairwise as pw
    from unicycler_tpu.ops import pallas_wavefront as wf

    rng = np.random.RandomState(0)
    m = n + W + (drift * n) // 16 + 16
    q = rng.randint(0, 4, (B, n)).astype(np.int8)
    r = rng.randint(0, 4, (B, m)).astype(np.int8)
    # plant similar sequence so the DP does real work
    r[:, W // 2:W // 2 + n] = np.where(rng.rand(B, n) < 0.9, q,
                                       r[:, W // 2:W // 2 + n])
    n_acts = np.full(B, n, np.int32)
    m_acts = np.full(B, m, np.int32)
    rows = np.arange(n + 1, dtype=np.int64)
    c_rows = [rows + (drift * rows) // 16 for _ in range(B)]

    par, db, zq, zr, a_lo, n_groups, Wcap, GWp, dmin = wf._prepare(
        q, r, c_rows, n_acts, m_acts, W)
    par_d, db_d, zq_d, zr_d = (jax.device_put(a)
                               for a in (par, db, zq, zr))

    def run():
        return wf._wavefront_call(
            par_d, db_d, zq_d, zr_d, B=B, W=W, Wcap=Wcap, GWp=GWp,
            n_groups=n_groups, a_lo=a_lo, scoring=pw.DEFAULT_SCORING,
            config=pw.SEMI_GLOBAL)

    t0 = time.time()
    out = run()
    int(jnp.sum(out[0]))           # force completion through the tunnel
    compile_s = time.time() - t0

    # One scalar fetch per timing pass: chain the iterations through an
    # accumulator so the tunnel RTT is paid once.
    iters = 30
    t0 = time.time()
    acc = jnp.zeros((), jnp.int32)
    for _ in range(iters):
        out = run()
        acc = acc + jnp.sum(out[0]) + jnp.sum(out[1])
    int(acc)
    rtt0 = time.time()
    int(jnp.sum(jnp.zeros((), jnp.int32)))   # measure a bare fetch RTT
    rtt = time.time() - rtt0
    dt = (time.time() - t0 - rtt) / iters

    steps = n_groups * wf.G
    print('wavefront forward: W=%d Wcap=%d n=%d B=%d drift=%d/16rows '
          '%d wavefronts (compile %.1fs)'
          % (W, Wcap, n, B, drift, steps, compile_s))
    print('  %.3f ms/call  %.3f us/wavefront  %.3f us/row (dt/n, incl. '
          'the 2n+W ramp)' % (dt * 1e3, dt / steps * 1e6, dt / n * 1e6))
    print('  tape row kernel reference: ~1.47 us/row at W=512 (PERF.md); '
          'cells/s this kernel: %.2f G' % (B * n * W / dt / 1e9))

    # correctness spot check: hardware kernel vs interpret mode on the
    # SAME inputs (a divergence would invalidate the timing numbers)
    score, ei, ej = wf.wavefront_batch_corridor(
        q[:2], r[:2], c_rows[:2], n_acts[:2], m_acts[:2],
        pw.DEFAULT_SCORING, pw.SEMI_GLOBAL, W=W)
    score_i, ei_i, ej_i = wf.wavefront_batch_corridor(
        q[:2], r[:2], c_rows[:2], n_acts[:2], m_acts[:2],
        pw.DEFAULT_SCORING, pw.SEMI_GLOBAL, W=W, interpret=True)
    hw = [(int(a), int(b), int(c_)) for a, b, c_ in zip(score, ei, ej)]
    ip = [(int(a), int(b), int(c_)) for a, b, c_ in zip(score_i, ei_i, ej_i)]
    assert hw == ip, 'hardware vs interpret divergence: %s != %s' % (hw, ip)
    print('  device scores: %s ends: %s  (parity vs interpret: OK)' %
          ([s for s, _, _ in hw], [(i, j) for _, i, j in hw]))


if __name__ == '__main__':
    main()
