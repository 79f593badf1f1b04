"""Steady-state phase split of one bench iteration.

Runs the bench workload once to warm every kernel/executable, resets the
trace, then times N clean iterations and prints the per-iteration span
tree — the number the perf work actually optimises (the aggregate trace
at process exit mixes in warm-up compiles).
"""
import sys
import time

sys.path.insert(0, '/root/repo')

from unicycler_tpu.utils import trace  # noqa: E402

trace.enable()

import bench  # noqa: E402
from unicycler_tpu.align.scoring import AlignmentScoringScheme  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 3

scoring = AlignmentScoringScheme('3,-6,-5,-2')
workload = bench.load_workload()
bench.run_once(workload, scoring)          # warm-up
bench.run_once(workload, scoring)          # settle executable caches
trace.reset()

walls = []
for _ in range(N):
    t0 = time.time()
    bench.run_once(workload, scoring)
    walls.append(time.time() - t0)

print('walls: %s  (avg %.3f s => %.2f reads/s)'
      % (['%.3f' % w for w in walls], sum(walls) / N, 19 * N / sum(walls)))
print('per-iteration spans (divide by %d):' % N)
trace.report()
