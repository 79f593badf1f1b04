"""Multi-host (N>1 jax processes) exercise on CPU.

Two spawned processes with 4 virtual CPU devices each join one
jax.distributed cluster (8 global devices), shard a read set, align
their shards with the normal single-host driver, and allgather the
results — every process must end with the identical full alignment
map, equal to a single-process reference run. This is the N-host story
of SURVEY.md §2.3/§5 exercised end to end (DCN stands in for Gloo on
CPU)."""

import multiprocessing as mp
import os
import pickle
import socket
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_workload():
    """Deterministic synthetic reads over one reference."""
    rng = np.random.RandomState(42)
    ref_seq = ''.join('ACGT'[b] for b in rng.randint(0, 4, 3000))
    reads = []
    for i in range(6):
        start = 200 * i
        seq = list(ref_seq[start:start + 400])
        for p in range(0, 400, 37):            # ~2.7% substitutions
            seq[p] = 'ACGT'[(('ACGT'.index(seq[p])) + 1) % 4]
        reads.append(('read_%d' % i, ''.join(seq)))
    return ref_seq, reads


def _align_payload(process_id, n_processes, port):
    if port is not None:
        os.environ['UNICYCLER_TPU_COORDINATOR'] = 'localhost:%d' % port
        os.environ['UNICYCLER_TPU_NUM_PROCESSES'] = str(n_processes)
        os.environ['UNICYCLER_TPU_PROCESS_ID'] = str(process_id)
    os.environ['JAX_PLATFORMS'] = 'cpu'
    os.environ.setdefault('XLA_FLAGS',
                          '--xla_force_host_platform_device_count=4')
    import jax
    jax.config.update('jax_platforms', 'cpu')

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from unicycler_tpu.align.scoring import AlignmentScoringScheme
    from unicycler_tpu.io.fastx import Read, Reference
    from unicycler_tpu.parallel import distributed as dist

    ctx = dist.maybe_initialize()
    ref_seq, read_data = _make_workload()
    references = [Reference('ref', ref_seq)]
    reads = [Read(name, seq, '+' * len(seq)) for name, seq in read_data]
    scoring = AlignmentScoringScheme('3,-6,-5,-2')
    n_local = dist.distributed_align_long_reads(
        reads, references, scoring, ctx=ctx,
        sensitivity_level=0, low_score_threshold=60.0, min_align_length=20)
    payload = {}
    for read in reads:
        payload[read.name] = sorted(
            (a.ref.name, bool(a.rev_comp), int(a.read_start_pos),
             int(a.read_end_pos), int(a.ref_start_pos),
             int(a.ref_end_pos), int(a.raw_score),
             round(float(a.scaled_score), 6))
            for a in read.alignments)
    return ctx.count, n_local, payload


def _worker(process_id, n_processes, port, q):
    try:
        q.put((process_id, _align_payload(process_id, n_processes, port)))
    except BaseException as exc:            # surface in the parent
        q.put((process_id, ('ERROR', repr(exc))))


def test_two_process_alignment_matches_single_process():
    # single-process reference result (same virtual device env)
    ctx = mp.get_context('spawn')
    q0 = ctx.Queue()
    p0 = ctx.Process(target=_worker, args=(0, 1, None, q0))
    p0.start()
    _, single = q0.get(timeout=300)
    p0.join()
    assert single[0] != 'ERROR', single
    _, n_single, ref_payload = single
    assert n_single == 6
    assert any(ref_payload.values()), 'reference run found no alignments'

    port = _free_port()
    q = ctx.Queue()
    procs = [ctx.Process(target=_worker, args=(i, 2, port, q))
             for i in range(2)]
    for p in procs:
        p.start()
    outs = {}
    for _ in range(2):
        pid, out = q.get(timeout=600)
        outs[pid] = out
    for p in procs:
        p.join()
    for pid, out in outs.items():
        assert out[0] != 'ERROR', (pid, out)
    # both processes saw a 2-process cluster and aligned half the reads
    assert outs[0][0] == 2 and outs[1][0] == 2
    assert outs[0][1] == 3 and outs[1][1] == 3
    # every host ends with the identical full alignment map, equal to
    # the single-process run
    assert outs[0][2] == outs[1][2] == ref_payload
