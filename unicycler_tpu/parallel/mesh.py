"""Multi-chip scaling: read batches data-parallel over a device mesh.

The reference has no distributed layer at all (SURVEY.md §2.3: a single-node
ThreadPool releasing the GIL into C++). The TPU-native replacement:

  * reference/contig index: replicated per host (it is small — megabytes)
  * read batches: sharded over the mesh's 'reads' axis (pure data parallel,
    the batch dimension of every kernel input)
  * per-read alignment results: produced sharded; summary statistics merged
    with jax.lax collectives (psum over ICI)

Graph simplification stays host-side and replicated — it is sequential by
design and tiny (SURVEY.md §7 hard parts).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import banded as banded_ops
from ..ops import pairwise as pw


def get_mesh(devices=None, axis_name='reads'):
    """A 1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


_DEFAULT_MESH = None


def set_default_mesh(mesh):
    """Install a mesh for the alignment drivers: batched kernel launches
    shard their batch axis over it (data-parallel reads, SURVEY.md §2.3)."""
    global _DEFAULT_MESH
    _DEFAULT_MESH = mesh


def get_default_mesh():
    return _DEFAULT_MESH


def shard_batched_call(fn, mesh, axis_name='reads'):
    """Wrap a batched device function so its leading batch axis is sharded
    over the mesh (each device computes its slice; outputs stay sharded)."""
    try:
        return jax.shard_map(fn, mesh=mesh, in_specs=P(axis_name),
                             out_specs=P(axis_name), check_vma=False)
    except TypeError:   # older jax spells it check_rep
        return jax.shard_map(fn, mesh=mesh, in_specs=P(axis_name),
                             out_specs=P(axis_name), check_rep=False)


def sharded_banded_align(mesh, q_batch, r_ext_batch, c_batch, n_acts, m_acts,
                         scoring, config, W, need_moves=False,
                         axis_name='reads'):
    """Run the banded DP with the batch dimension sharded over the mesh.

    Inputs must have a batch size divisible by the mesh size. Outputs come
    back with the same sharding (scores/coords per read stay on their
    device until fetched)."""
    shard = NamedSharding(mesh, P(axis_name))
    put = lambda x: jax.device_put(x, shard)
    args = tuple(put(np.asarray(a)) for a in
                 (q_batch, r_ext_batch, c_batch, n_acts, m_acts))
    return banded_ops.banded_batch_device(
        *args, scoring=scoring, config=config, W=W, need_moves=need_moves)


def sharded_align_stats(mesh, scores, axis_name='reads'):
    """Collective merge of per-read alignment statistics: total aligned
    reads, sum and max of scores — an all-reduce over the mesh (the merge
    the reference never needed, done with psum/pmax over ICI)."""
    shard = NamedSharding(mesh, P(axis_name))
    scores = jax.device_put(np.asarray(scores, np.int32), shard)

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=P(axis_name),
                       out_specs=P())
    def stats(local_scores):
        aligned = jnp.sum((local_scores > 0).astype(jnp.int32), keepdims=True)
        total = jnp.sum(local_scores, keepdims=True)
        best = jnp.max(local_scores, keepdims=True)
        return jnp.concatenate([
            jax.lax.psum(aligned, axis_name),
            jax.lax.psum(total, axis_name),
            jax.lax.pmax(best, axis_name)])

    out = np.asarray(stats(scores))
    return {'aligned': int(out[0]), 'score_sum': int(out[1]),
            'score_max': int(out[2])}
