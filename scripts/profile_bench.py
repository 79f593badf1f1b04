"""Profile the bench workload: count kernel launches and time phases."""
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np  # noqa: E402

import bench  # noqa: E402
from unicycler_tpu.ops import banded as banded_ops  # noqa: E402

launches = []
orig_align = banded_ops.align_banded


def traced_align(tasks, scoring, config=None, band=25, need_cigar=True):
    t0 = time.time()
    kw = {'band': band, 'need_cigar': need_cigar}
    if config is not None:
        kw['config'] = config
    res = orig_align(tasks, scoring, **kw)
    launches.append((len(tasks), need_cigar, time.time() - t0,
                     sum(len(t.q) for t in tasks)))
    return res


banded_ops.align_banded = traced_align
# the driver imports banded as banded_ops too — patch its reference
import unicycler_tpu.align.semi_global as sg  # noqa: E402
sg.banded_ops.align_banded = traced_align

# deeper: time each kernel launch and each host fetch
import unicycler_tpu.ops.pallas_banded as pb  # noqa: E402
kernel_calls = []
for fname in ('pallas_banded_batch', 'pallas_banded_with_traceback'):
    def wrap(f, fname=fname):
        def g(*a, **k):
            t0 = time.time()
            out = f(*a, **k)
            import jax
            jax.tree.map(lambda x: x.block_until_ready()
                         if hasattr(x, 'block_until_ready') else x, out)
            kernel_calls.append((fname, a[0].shape, a[1].shape,
                                 time.time() - t0))
            return out
        return g
    setattr(pb, fname, wrap(getattr(pb, fname)))

fetches = []
orig_asarray = np.asarray


def traced_asarray(x, *a, **k):
    import jax
    if isinstance(x, jax.Array):
        t0 = time.time()
        out = orig_asarray(x, *a, **k)
        fetches.append((out.nbytes, time.time() - t0))
        return out
    return orig_asarray(x, *a, **k)


banded_ops.np.asarray = traced_asarray

from unicycler_tpu.align.scoring import AlignmentScoringScheme  # noqa: E402
scoring = AlignmentScoringScheme('3,-6,-5,-2')
workload = bench.load_workload()
# warm
bench.run_once(workload, scoring)
launches.clear()
kernel_calls.clear()
fetches.clear()
t0 = time.time()
bench.run_once(workload, scoring)
total = time.time() - t0
print(f'total {total:.2f}s, {len(launches)} align_banded calls')
for n, cig, dt, rows in launches:
    print(f'  tasks={n:4d} cigar={int(cig)} rows={rows:8d} {dt:6.2f}s')
print(f'{len(kernel_calls)} kernel launches, '
      f'{sum(d for *_, d in kernel_calls):.2f}s total (incl. block):')
for fname, qs, rs, dt in kernel_calls:
    print(f'  {fname:30s} q={qs} r={rs} {dt:6.2f}s')
print(f'{len(fetches)} fetches, {sum(d for _, d in fetches):.2f}s, '
      f'{sum(n for n, _ in fetches)/1e6:.1f} MB')
