"""On-device canonical k-mer counting (sort / segment-reduce).

SURVEY §7.10 calls k-mer counting a classic TPU-friendly workload: pack
2-bit k-mers, sort, and segment-reduce equal runs. This module provides
that path with jax for k <= 31 (one uint64 key per k-mer):

    pack (host, vectorised)  ->  device sort  ->  run-boundary reduce

At the scales this pipeline sees (tens of millions of k-mers) the
device sort itself is fast, but on a TUNNELLED chip the upload of the
packed keys plus the fetch of (unique, count) dominates and host numpy
np.unique wins end to end — measured numbers in PERF.md ("Device k-mer
counting"). The assembler therefore uses the host path by default;
set UNICYCLER_TPU_DEVICE_KMERS=1 to route the corrector/assembler
counting through this module on directly-attached hardware.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..asm.correct import canonical_packed, pack_kmers


def device_counting_enabled():
    return os.environ.get('UNICYCLER_TPU_DEVICE_KMERS') == '1' \
        and jax.devices()[0].platform != 'cpu'


@jax.jit
def _sort_and_mark(hi, lo):
    """Device sort + run boundaries over 64-bit keys carried as two
    uint32 words (jax defaults to 32-bit — a uint64 key would silently
    truncate). lax.sort with num_keys=2 is lexicographic. Returns
    (sorted hi, sorted lo, is_first, run_id)."""
    sh, sl = jax.lax.sort((hi, lo), num_keys=2)
    first = jnp.concatenate([
        jnp.ones(1, bool),
        (sh[1:] != sh[:-1]) | (sl[1:] != sl[:-1])])
    run_id = jnp.cumsum(first.astype(jnp.int32)) - 1
    return sh, sl, first, run_id


@functools.partial(jax.jit, static_argnames=('n_runs',))
def _run_counts(run_id, n_runs):
    return jnp.zeros((n_runs,), jnp.int32).at[run_id].add(1)


def count_canonical_device(kmer_chunks, k):
    """(unique sorted canonical k-mers, counts) with the sort and the
    segment reduction on device. kmer_chunks: list of uint64 arrays of
    canonical k-mers (host)."""
    if not kmer_chunks:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    allk = np.concatenate(kmer_chunks)
    hi = (allk >> np.uint64(32)).astype(np.uint32)
    lo = (allk & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    sh, sl, first, run_id = _sort_and_mark(jnp.asarray(hi),
                                           jnp.asarray(lo))
    first_h = np.asarray(first)
    n_runs = int(first_h.sum())
    counts = np.asarray(_run_counts(run_id, n_runs))
    uniq = (np.asarray(sh)[first_h].astype(np.uint64) << np.uint64(32)) \
        | np.asarray(sl)[first_h].astype(np.uint64)
    return uniq, counts.astype(np.int64)


def count_spectrum(read_code_arrays, k):
    """Drop-in for asm.correct.count_spectrum with the sort on device."""
    chunks = []
    for codes in read_code_arrays:
        km, valid = pack_kmers(codes, k)
        if len(km):
            chunks.append(canonical_packed(km[valid], k))
    return count_canonical_device(chunks, k)
