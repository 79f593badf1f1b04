"""Host-side tape builder for the mega-batched banded DP.

The bucketed launcher (ops/banded.align_banded) pays one dispatch RTT per
(n_pad, m_pad) bucket slice; real workloads fragment into dozens of
buckets of <= 8 tasks each, so launch overhead dominates on a tunnelled
device. The TAPE layout instead concatenates EVERY task of a call along
the row axis of one kernel launch:

  * tasks are sorted by row count (descending) and grouped 8 at a time
    into SEGMENTS; group k's task j runs in sublane track j.
  * a segment's row length is the max n_act of its 8 tasks, rounded up to
    SEG_ALIGN=32 (so the reference-window group slices never straddle a
    segment boundary); the tape is the concatenation of all segments.
    Sorting bounds the intra-segment padding to the sorted spread.
  * each track owns a flat reference array: its tasks' windows laid out
    back to back, each padded with W sentinel bases on both sides.
  * per-row metadata is ONE byte (query base + reset / capture / band
    active); everything else the kernel needs is reconstructed on device
    from tiny per-task arrays (segmented cumsums + gathers), so host->
    device traffic is ~2 bytes per DP row.

Row waste vs. the bucketed path: measured ~5-10% (vs. 45%+ from
power-of-four row buckets plus fragment padding), and the whole call
compiles to ONE shape per tape-length bucket.
"""

from typing import List, NamedTuple

import numpy as np

from .encode import Q_PAD, R_PAD
from .pallas_banded import BT, MAX_SHIFT

SEG_ALIGN = 32        # segment row alignment == reference-window group size
L_CAP = 131072        # max tape rows per launch (cellinfo HBM budget ~1 GB)

# qf byte layout (per tape row): the query base and all row flags pack
# into ONE uint8 so host->device traffic is 1 byte per (track, row) —
# the upload is the dominant per-row cost on a tunnelled device.
#   bits 0-2: q code (0-3 base, 4 N, 5 = Q_PAD = segment-pad row)
#   bit  3:   reset (first row of a segment = DP row 1 of its task)
#   bit  4:   capture (the task's row n_act: capture H here)
#   bits 5-7: band drift si in 0..MAX_SHIFT
F_RESET = 8
F_CAPTURE = 16
F_SI_SHIFT = 5


class TapeLaunch(NamedTuple):
    """One kernel launch worth of tape. All arrays are host numpy."""
    qf: np.ndarray           # (BT, L) uint8 packed query+flags
    r_flat: np.ndarray       # (BT, M) int8
    # per-(track, task-in-track) int32 arrays, shape (BT, TT); -1 padded
    cbase: np.ndarray        # c[1] - si-cumsum offset: c_rel = S + cbase
    c0m: np.ndarray          # c[0] (row-0 band offset)
    c_n: np.ndarray          # c[n_act]
    m_t: np.ndarray          # m_act
    n_t: np.ndarray          # n_act
    r_base: np.ndarray       # task's region start in r_flat (r at +W)
    seg_start: np.ndarray    # first tape row (0-based) of the segment
    reset_slot: np.ndarray   # seg_start // 32
    cap_slot: np.ndarray     # (seg_start + n_act - 1) // 32
    last_slot: np.ndarray    # (seg_start + seg_len - 1) // 32
    n_tasks: np.ndarray      # (BT,) int32: real tasks per track
    task_ids: np.ndarray     # (BT, TT) int32: caller's task index; -1 pad
    L: int                   # padded tape rows (bucketed)
    L_real: int              # used tape rows (for trimming fetches)
    TT: int


def _bucket_pow2(n, minimum):
    b = minimum
    while b < n:
        b *= 2
    return b


def _bucket_geom(n, minimum, quantum, ratio=1.25):
    """Geometric size buckets (ratio ~1.25, rounded up to `quantum`):
    power-of-two buckets waste up to 50% of the tape in pad rows that
    the kernel EXECUTES and the host UPLOADS (measured 45% on the bench
    fixtures); 1.25x steps cap the waste at ~20% for ~3x more compiled
    shapes, which the persistent compile cache absorbs."""
    b = float(minimum)
    while b < n:
        b *= ratio
    return -(-int(b) // quantum) * quantum


def build_tapes(tasks, W, build_corridor) -> List[TapeLaunch]:
    """Lay out `tasks` (ops.banded.BandedTask list) into tape launches.
    Tasks with empty q or r must be filtered by the caller."""
    order = sorted(range(len(tasks)), key=lambda i: -len(tasks[i].q))
    # segments: consecutive groups of BT sorted tasks
    segments = [order[s:s + BT] for s in range(0, len(order), BT)]
    # the row cap scales inversely with band width and track count (the
    # cellinfo intermediate is BT x L x W int32 in HBM)
    l_cap = max(512, L_CAP * 256 * 8 // (W * BT) // 512 * 512)

    launches = []
    seg_pos = 0
    while seg_pos < len(segments):
        # take segments until the tape would exceed the row cap
        chunk = []
        L = 0
        while seg_pos < len(segments):
            seg = segments[seg_pos]
            seg_len = -(-max(len(tasks[i].q) for i in seg) // SEG_ALIGN) \
                * SEG_ALIGN
            if chunk and L + seg_len > l_cap:
                break
            chunk.append((seg, seg_len))
            L += seg_len
            seg_pos += 1
        launches.append(_build_one(tasks, chunk, L, W, build_corridor))
    return launches


def _build_one(tasks, chunk, L_real, W, build_corridor) -> TapeLaunch:
    # rows quantum: the largest chunk size _chunk_rows can pick, so any
    # bucketed L divides evenly into grid chunks
    L = _bucket_geom(max(L_real, 512), 512, 256)
    TT = _bucket_pow2(max(len(chunk), 8), 8)

    qf = np.full((BT, L), Q_PAD, np.uint8)
    per = {name: np.full((BT, TT), -1, np.int32)
           for name in ('cbase', 'c0m', 'c_n', 'm_t', 'n_t', 'r_base',
                        'seg_start', 'reset_slot', 'cap_slot', 'last_slot',
                        'task_ids')}
    n_tasks = np.zeros(BT, np.int32)

    # first pass: compute per-track reference sizes
    r_sizes = np.zeros(BT, np.int64)
    for seg, _ in chunk:
        for tr, ti in enumerate(seg):
            r_sizes[tr] += len(tasks[ti].r) + 2 * W
    GW = W + SEG_ALIGN * MAX_SHIFT
    M = _bucket_geom(int(r_sizes.max()) + GW + 1, 1024, 512)
    r_flat = np.full((BT, M), R_PAD, np.int8)

    r_cursor = np.zeros(BT, np.int64)
    row = 0
    for k, (seg, seg_len) in enumerate(chunk):
        for tr, ti in enumerate(seg):
            t = tasks[ti]
            n_act, m_act = len(t.q), len(t.r)
            c = build_corridor(t.corridor_read, t.corridor_ref,
                               n_act, m_act, W)
            base = int(r_cursor[tr])
            r_flat[tr, base + W:base + W + m_act] = t.r
            r_cursor[tr] += m_act + 2 * W

            # si includes the reset row's c[1]-c[0] drift: the kernel
            # swaps in h0 (built at c[0] alignment) and THEN realigns by
            # si, matching the bucketed kernel's row-1 semantics.
            si = np.diff(c).astype(np.uint8)       # <= MAX_SHIFT by corridor
            f = (si << F_SI_SHIFT) | t.q.astype(np.uint8)
            f[0] |= F_RESET
            f[-1] |= F_CAPTURE
            qf[tr, row:row + n_act] = f
            # segment pad rows: si=0, q=Q_PAD (qf already Q_PAD)

            kk = n_tasks[tr]
            per['cbase'][tr, kk] = int(c[1])       # si-cumsum starts at 0
            per['c0m'][tr, kk] = int(c[0])
            per['c_n'][tr, kk] = int(c[n_act])
            per['m_t'][tr, kk] = m_act
            per['n_t'][tr, kk] = n_act
            per['r_base'][tr, kk] = base
            per['seg_start'][tr, kk] = row
            per['reset_slot'][tr, kk] = row // SEG_ALIGN
            per['cap_slot'][tr, kk] = (row + n_act - 1) // SEG_ALIGN
            per['last_slot'][tr, kk] = (row + seg_len - 1) // SEG_ALIGN
            per['task_ids'][tr, kk] = ti
            n_tasks[tr] += 1
        row += seg_len

    # The cumsum-of-si reconstruction on device is global per track; adjust
    # each task's base so c_rel = cumsum(si)[row] + cbase[task] lands on
    # the true c values despite earlier segments' drift accumulating.
    for tr in range(BT):
        s_cum = np.cumsum((qf[tr] >> F_SI_SHIFT) & 7)
        for kk in range(n_tasks[tr]):
            r0 = per['seg_start'][tr, kk]
            per['cbase'][tr, kk] -= int(s_cum[r0])

    return TapeLaunch(qf=qf, r_flat=r_flat,
                      n_tasks=n_tasks, L=L, L_real=row, TT=TT, **per)
