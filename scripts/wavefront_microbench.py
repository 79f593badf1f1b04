"""Measure the anti-diagonal wavefront prototype vs the row-scan tape kernel.

Runs on the real TPU. The comparison metric is us per DP ROW-equivalent
(one row = W cells = 2 wavefronts), kernel compute only (one device fetch
of a (B, W) plane at the end, timed across many iterations).

The tape kernel's measured forward rate is ~1.47 us/serial step at W=512
(PERF.md "Forward-kernel micro-pass"); the wavefront formulation removes
the prefix-cummax ladder (~36% of that) at the cost of 2x the serial
steps, each ~3x cheaper.

Usage: python scripts/wavefront_microbench.py [n_rows] [W]
"""

import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    B = 8
    import jax
    from unicycler_tpu.ops import pairwise as pw
    from unicycler_tpu.ops import pallas_wavefront as wf

    rng = np.random.RandomState(0)
    m = n + W
    q = rng.randint(0, 4, (B, n)).astype(np.int8)
    r = rng.randint(0, 4, (B, m)).astype(np.int8)
    # plant similar sequence so the DP does real work
    r[:, W // 2:W // 2 + n] = np.where(rng.rand(B, n) < 0.9, q,
                                       r[:, W // 2:W // 2 + n])
    c0 = np.full(B, 0, np.int32)
    n_acts = np.full(B, n, np.int32)
    m_acts = np.full(B, m, np.int32)

    GWp = wf._region_width(W)
    a_lo = int(c0.min())
    a_hi = int((2 * n_acts.astype(np.int64) + c0).max()) + W - 1
    n_groups = -(-(a_hi - a_lo + 1) // wf.G)
    par = np.zeros((B, 128), np.int32)
    par[:, 0], par[:, 1], par[:, 2] = c0, n_acts, m_acts
    zq, zr = wf._base_planes(q, r, c0, a_lo, n_groups, GWp)
    par_d = jax.device_put(par)
    zq_d = jax.device_put(zq)
    zr_d = jax.device_put(zr)

    def run():
        return _wf_call(par_d, zq_d, zr_d)

    _wf_call = lambda p, a, b: wf._wavefront_call(
        p, a, b, B=B, W=W, GWp=GWp, n_groups=n_groups, a_lo=a_lo,
        scoring=pw.DEFAULT_SCORING, config=pw.SEMI_GLOBAL)

    import jax.numpy as jnp

    t0 = time.time()
    out = run()
    int(jnp.sum(out[0]))           # force completion through the tunnel
    compile_s = time.time() - t0

    # One scalar fetch per timing pass: chain the iterations through an
    # accumulator so the tunnel RTT is paid once, like tape_microbench.
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
    print('wavefront forward: W=%d n=%d B=%d  %d wavefronts '
          '(compile %.1fs)' % (W, n, B, steps, compile_s))
    print('  %.3f ms/call  %.3f us/wavefront  %.3f us/row (dt/n, incl. '
          'the 2n+W ramp)' % (dt * 1e3, dt / steps * 1e6, dt / n * 1e6))
    print('  tape row kernel reference: ~1.47 us/row at W=512 (PERF.md); '
          'cells/s this kernel: %.2f G' % (B * n * W / dt / 1e9))

    # correctness spot check vs the row kernel on device
    score, ei, ej = wf.wavefront_batch(q[:2], r[:2], c0[:2], n_acts[:2],
                                       m_acts[:2], pw.DEFAULT_SCORING,
                                       pw.SEMI_GLOBAL, W=W)
    from unicycler_tpu.ops.banded import _banded_single
    import jax.numpy as jnp
    for b in range(2):
        r_ext = np.full(m + 2 * W, 6, np.int8)
        r_ext[W:W + m] = r[b]
        c = (np.int32(c0[b]) + np.arange(n + 1, dtype=np.int32))
        s2, ei2, ej2, _ = jax.jit(
            _banded_single,
            static_argnames=('scoring', 'config', 'W', 'need_moves'))(
            q[b], r_ext, c, np.int32(n_acts[b]), np.int32(m_acts[b]),
            scoring=pw.DEFAULT_SCORING, config=pw.SEMI_GLOBAL, W=W,
            need_moves=False)
        ok = (int(score[b]), int(ei[b]), int(ej[b])) == \
            (int(s2), int(ei2), int(ej2))
        print('  parity[%d]: %s (score %d)' % (b, 'OK' if ok else
                                               'MISMATCH', int(score[b])))


if __name__ == '__main__':
    main()
