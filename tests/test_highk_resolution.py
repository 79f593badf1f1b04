"""Higher-k thread resolution of the best-k de Bruijn graph.

Covers thread_sequence_through / resolve_paths_with_higher_k /
split_repeats_with_threads (asm/debruijn.py) on a constructed genome
with one exactly-repeated segment: the higher-k material must thread to
the true walk, the strict witness matching must split the collapsed
repeat, and a conflicting witness must veto the split (the safety
property that keeps mis-joins out of the graph). Role of SPAdes'
repeat-resolution stage, which the reference gets from the SPAdes
subprocess (ref spades_func.py:32-161)."""

import numpy as np
import pytest

from unicycler_tpu.asm.debruijn import (assemble_short_reads,
                                        resolve_paths_with_higher_k,
                                        split_repeats_with_threads)
from unicycler_tpu.io.fastx import encode_sequence
from unicycler_tpu.misc import reverse_complement


def _random_seq(rng, n):
    return ''.join('ACGT'[int(x)] for x in rng.integers(0, 4, n))


def _reads_from(seq, read_len, step):
    return [encode_sequence(seq[i:i + read_len])
            for i in range(0, len(seq) - read_len + 1, step)]


@pytest.fixture(scope='module')
def repeat_graph():
    rng = np.random.default_rng(11)
    flank_a = _random_seq(rng, 400)
    flank_b = _random_seq(rng, 400)
    flank_c = _random_seq(rng, 400)
    flank_d = _random_seq(rng, 400)
    repeat = _random_seq(rng, 40)        # shorter than k: collapses
    genome1 = flank_a + repeat + flank_b
    genome2 = flank_c + repeat + flank_d
    reads = _reads_from(genome1, 100, 3) + _reads_from(genome2, 100, 3)
    k = 31
    unitigs, links = assemble_short_reads(reads * 2, k)
    return unitigs, links, k, genome1, genome2


def test_thread_resolves_true_walks(repeat_graph):
    unitigs, links, k, genome1, genome2 = repeat_graph
    # a collapsed repeat shows as a unitig present in both genomes
    multi = [i + 1 for i, (seq, _) in enumerate(unitigs)
             if seq in genome1 and seq in genome2
             or reverse_complement(seq) in genome1
             and reverse_complement(seq) in genome2]
    assert multi, 'expected a collapsed repeat unitig'
    # higher-k style material: exact windows of each genome crossing
    # the repeat
    mid1 = genome1[300:700]
    mid2 = genome2[300:700]
    paths = resolve_paths_with_higher_k(unitigs, links, [mid1, mid2], k)
    assert len(paths) == 2
    for path in paths:
        assert len(path) >= 3


def test_strict_split_resolves_collapsed_repeat(repeat_graph):
    unitigs, links, k, genome1, genome2 = repeat_graph
    mid1 = genome1[300:700]
    mid2 = genome2[300:700]
    u2 = list(unitigs)
    u2, l2, n = split_repeats_with_threads(u2, list(links),
                                           [mid1, mid2], k)
    assert n == 1
    # after the split every unitig walk is linear: the two genomes
    # separate (each copy of the repeat gets its own unitig)
    from collections import defaultdict
    fwd = defaultdict(set)
    for a, b in l2:
        fwd[a].add(b)
        fwd[-b].add(-a)
    assert all(len(v) <= 1 for v in fwd.values())


def test_conflicting_witness_vetoes_split(repeat_graph):
    unitigs, links, k, genome1, genome2 = repeat_graph
    mid1 = genome1[300:700]
    mid2 = genome2[300:700]
    # a chimeric witness pairing genome1's entry with genome2's exit
    chimera = genome1[300:440] + genome2[440:700]
    u2 = list(unitigs)
    u2, l2, n = split_repeats_with_threads(
        u2, list(links), [mid1, mid2, chimera], k)
    assert n == 0
