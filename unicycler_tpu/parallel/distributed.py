"""Multi-host (DCN) scale-out scaffolding.

The reference is strictly single-node (SURVEY.md §2.3: thread pools
only); this module supplies the N-host story the TPU build adds: one
JAX process per host joins a coordinator (`jax.distributed`), long
reads are sharded across hosts, each host runs the normal single-host
aligner over its shard on its local chips, and the per-read results
merge host-level over DCN (`process_allgather`). Graph stages run
replicated — the graph is tiny and the pipeline is deterministic, so
every host computes identical results and only the main process writes
outputs.

Initialisation is env-driven so the same CLI works single-host (no env
vars -> no-op) and under any launcher that can export three variables:

    UNICYCLER_TPU_COORDINATOR=host:port
    UNICYCLER_TPU_NUM_PROCESSES=N
    UNICYCLER_TPU_PROCESS_ID=i

(JAX's own cluster auto-detection also applies on managed TPU pods —
if `jax.distributed.initialize()` was already called by the launcher we
just read the process indices.)

Exercised in CI by tests/test_distributed.py: two spawned CPU processes
with 4 virtual devices each form one 8-device cluster, shard a read
set, align, and allgather byte-identical merged alignment sets.
"""

import os
import pickle

import numpy as np


class DistContext(object):
    """Host-level process topology. count == 1 means single-host."""
    __slots__ = ('index', 'count')

    def __init__(self, index, count):
        self.index = index
        self.count = count

    @property
    def is_main(self):
        return self.index == 0

    @property
    def active(self):
        return self.count > 1


_CONTEXT = None


def maybe_initialize():
    """Join the multi-host cluster named by the environment (no-op and
    single-host context when the variables are absent). Idempotent."""
    global _CONTEXT
    if _CONTEXT is not None:
        return _CONTEXT
    import jax
    coord = os.environ.get('UNICYCLER_TPU_COORDINATOR')
    if coord:
        n = int(os.environ['UNICYCLER_TPU_NUM_PROCESSES'])
        pid = int(os.environ['UNICYCLER_TPU_PROCESS_ID'])
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=n, process_id=pid)
    _CONTEXT = DistContext(jax.process_index(), jax.process_count())
    return _CONTEXT


def get_context():
    """The current topology (initialising from env on first use)."""
    return _CONTEXT if _CONTEXT is not None else maybe_initialize()


def shard_for_host(items, ctx=None):
    """This host's strided shard of a work list. Strided (not blocked)
    so sorted-by-length inputs balance across hosts."""
    ctx = ctx or get_context()
    if not ctx.active:
        return list(items)
    return list(items)[ctx.index::ctx.count]


def allgather_bytes(data: bytes, ctx=None):
    """All-to-all exchange of one byte string per host; returns the list
    of every host's bytes in process order. Two collectives: sizes
    first, then zero-padded payloads (process_allgather needs equal
    shapes per host)."""
    ctx = ctx or get_context()
    if not ctx.active:
        return [data]
    from jax.experimental.multihost_utils import process_allgather
    arr = np.frombuffer(data, np.uint8)
    sizes = process_allgather(np.array([len(arr)], np.int64))
    sizes = np.asarray(sizes).reshape(-1)
    cap = int(sizes.max())
    padded = np.zeros(cap, np.uint8)
    padded[:len(arr)] = arr
    gathered = np.asarray(process_allgather(padded))
    gathered = gathered.reshape(ctx.count, cap)
    return [gathered[i, :int(sizes[i])].tobytes()
            for i in range(ctx.count)]


def allgather_object(obj, ctx=None):
    """All-to-all exchange of one picklable object per host."""
    return [pickle.loads(b)
            for b in allgather_bytes(pickle.dumps(obj, protocol=4), ctx)]


def distributed_align_long_reads(reads, references, scoring_scheme,
                                 ctx=None, **align_kwargs):
    """Shard `reads` across hosts, align each shard with the normal
    single-host driver on the local chips, and allgather the per-read
    alignment tuples so EVERY host ends with the full read->alignments
    mapping (the replicated graph stages need all of it). Returns the
    number of locally aligned reads."""
    from ..align.semi_global import align_reads_to_refs
    ctx = ctx or get_context()
    local = shard_for_host(reads, ctx)
    align_reads_to_refs(local, references, scoring_scheme, **align_kwargs)
    if not ctx.active:
        return len(local)
    # serialise each local read's alignments compactly: coordinates +
    # CIGAR runs; scores re-tally deterministically on the receiver
    payload = {}
    for read in local:
        payload[read.name] = [
            (a.ref.name, a.rev_comp, a.read_start_pos, a.read_end_pos,
             a.ref_start_pos, a.ref_end_pos,
             a._runs[0].tolist(), a._runs[1].tolist())
            for a in read.alignments]
    merged = {}
    for part in allgather_object(payload, ctx):
        merged.update(part)
    local_names = {r.name for r in local}
    refs_by_name = {ref.name: ref for ref in references}
    from ..align.alignment import Alignment
    for read in reads:
        if read.name in local_names:   # locally computed: keep objects
            continue
        read.alignments = [
            Alignment.from_runs(read, refs_by_name[rn], scoring_scheme,
                                rev, rs, re_, fs, fe, counts, codes)
            for (rn, rev, rs, re_, fs, fe, counts, codes)
            in merged.get(read.name, [])]
    return len(local)
