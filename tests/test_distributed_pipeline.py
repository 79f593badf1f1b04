"""Two-process hybrid PIPELINE run over a jax.distributed CPU cluster.

tests/test_distributed.py proves the collective plumbing on a 6-read
alignment; this runs the WHOLE hybrid pipeline (short-read assembly ->
bridging -> polish) under a 2-process cluster: the long-read alignment
stage shards reads across processes and allgathers
(parallel/distributed.py, wired at pipeline/main.py:235), graph stages
run replicated, and both processes must emit byte-identical assemblies
matching a rotation of the truth — the single-chip vs multi-host
equivalence SURVEY.md §4 calls for."""

import multiprocessing as mp
import os
import random
import socket

import pytest


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_genome():
    rng = random.Random(4242)
    repeat = ''.join(rng.choice('ACGT') for _ in range(400))
    a = ''.join(rng.choice('ACGT') for _ in range(5000))
    b = ''.join(rng.choice('ACGT') for _ in range(4000))
    return a + repeat + b + repeat


def _pipeline_payload(process_id, n_processes, port, data_dir, out_dir):
    if port is not None:
        os.environ['UNICYCLER_TPU_COORDINATOR'] = 'localhost:%d' % port
        os.environ['UNICYCLER_TPU_NUM_PROCESSES'] = str(n_processes)
        os.environ['UNICYCLER_TPU_PROCESS_ID'] = str(process_id)
    os.environ['JAX_PLATFORMS'] = 'cpu'
    os.environ.setdefault('XLA_FLAGS',
                          '--xla_force_host_platform_device_count=4')
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from unicycler_tpu.pipeline.main import main

    out = os.path.join(out_dir, 'p%d' % process_id)
    main(['-1', os.path.join(data_dir, 'r1.fastq'),
          '-2', os.path.join(data_dir, 'r2.fastq'),
          '-l', os.path.join(data_dir, 'long.fastq'),
          '-o', out, '--verbosity', '0', '--keep', '0',
          '--min_fasta_length', '100', '--no_rotate'])
    with open(os.path.join(out, 'assembly.fasta')) as f:
        return f.read()


def _worker(process_id, n_processes, port, data_dir, out_dir, q):
    try:
        q.put((process_id, _pipeline_payload(process_id, n_processes,
                                             port, data_dir, out_dir)))
    except BaseException as exc:
        q.put((process_id, 'ERROR: %r' % exc))


def test_two_process_hybrid_pipeline(tmp_path):
    from unicycler_tpu.pipeline.fake_reads import (make_fake_long_reads,
                                                   make_fake_short_reads,
                                                   write_fastq)
    genome = _make_genome()
    data_dir = str(tmp_path / 'data')
    os.makedirs(data_dir)
    p1, p2 = make_fake_short_reads(genome)
    write_fastq(os.path.join(data_dir, 'r1.fastq'), p1)
    write_fastq(os.path.join(data_dir, 'r2.fastq'), p2)
    write_fastq(os.path.join(data_dir, 'long.fastq'),
                make_fake_long_reads(genome, read_length=3000, step=500))

    ctx = mp.get_context('spawn')
    # single-process reference assembly
    q0 = ctx.Queue()
    p0 = ctx.Process(target=_worker, args=(0, 1, None, data_dir,
                                           str(tmp_path / 'single'), q0))
    p0.start()
    _, single = q0.get(timeout=1200)
    p0.join()
    assert not str(single).startswith('ERROR'), single
    assert '>' in single

    port = _free_port()
    q = ctx.Queue()
    procs = [ctx.Process(target=_worker,
                         args=(i, 2, port, data_dir,
                               str(tmp_path / 'multi'), q))
             for i in range(2)]
    for p in procs:
        p.start()
    outs = {}
    for _ in range(2):
        pid, out = q.get(timeout=1800)
        outs[pid] = out
    for p in procs:
        p.join()
    for pid, out in outs.items():
        assert not str(out).startswith('ERROR'), (pid, out)
    # both cluster processes and the single-process run agree exactly
    assert outs[0] == outs[1] == single
