"""Same-session A/B: two-phase winner walks vs single-phase walk-all.

Through the axon tunnel the phase-1 score fetch is a blocking round trip
that gates walk dispatch; walk-all chains every traceback behind the
forward inside the launch (no host involvement) at the cost of walking
losing candidate windows and a pessimistic sparse-record cap. One
process, one device claim, interleaved measurement order (ABBA) so
tunnel drift cancels.
"""
import os
import sys
import time

sys.path.insert(0, '/root/repo')

from unicycler_tpu.utils import trace  # noqa: E402

trace.enable()

import bench  # noqa: E402
from unicycler_tpu.align.scoring import AlignmentScoringScheme  # noqa: E402

scoring = AlignmentScoringScheme('3,-6,-5,-2')
workload = bench.load_workload()


def run_n(n):
    walls = []
    for _ in range(n):
        t0 = time.time()
        bench.run_once(workload, scoring)
        walls.append(time.time() - t0)
    return walls


def set_mode(two_phase):
    os.environ['UNICYCLER_TPU_TWO_PHASE'] = '1' if two_phase else '0'


# warm both modes' executables
set_mode(True)
run_n(1)
bench.check_parity(workload)
set_mode(False)
run_n(1)
bench.check_parity(workload)
print('parity ok in both modes')

results = {'two_phase': [], 'walk_all': []}
for mode_seq in [(True, False), (False, True), (True, False),
                 (False, True)]:
    for tp in mode_seq:
        set_mode(tp)
        trace.reset()
        walls = run_n(2)
        key = 'two_phase' if tp else 'walk_all'
        results[key].extend(walls)
        print('%-10s %s  bytes/iter=%.0f' % (
            key, ['%.3f' % w for w in walls],
            trace.as_dict()['counters'].get('tape.fetch_bytes', 0) / 2))

for key, walls in results.items():
    walls.sort()
    print('%-10s median %.3f s/iter -> %.2f reads/s  (min %.3f max %.3f)'
          % (key, walls[len(walls) // 2], 19 / walls[len(walls) // 2],
             walls[0], walls[-1]))

# final trace for the last mode, per-iteration detail
set_mode(False)
trace.reset()
run_n(3)
print('\nwalk_all per-3-iteration trace:')
print(trace.report())
