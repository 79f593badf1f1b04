"""Overlap removal on repeat-rich graphs — the bounded pytest version of
the reference's run-forever test/overlap_removal_test.py (which needed a
SPAdes install): build repeat-heavy genomes, assemble with the built-in
de Bruijn assembler at several ks, and assert remove_all_overlaps leaves
a consistent zero-overlap graph whose sequences still come from the
genome."""

import os
import random

import pytest

from unicycler_tpu.asm.debruijn import assemble_short_reads, save_graph_gfa
from unicycler_tpu.graph.assembly_graph import AssemblyGraph
from unicycler_tpu.io.fastx import encode_sequence
from unicycler_tpu.misc import reverse_complement
from unicycler_tpu.pipeline.fake_reads import make_fake_short_reads


def make_repeaty_sequence(length, repeat_count, rng):
    seq = list(''.join(rng.choice('ACGT') for _ in range(length)))
    for _ in range(repeat_count):
        rep_len = rng.randint(10, 300)
        src = rng.randint(0, length - rep_len)
        dst = rng.randint(0, length - rep_len)
        seq[dst:dst + rep_len] = seq[src:src + rep_len]
    return ''.join(seq)


@pytest.mark.parametrize('k', [21, 41, 61])
def test_overlap_removal_repeaty(k, tmp_path):
    rng = random.Random(k)
    genome = make_repeaty_sequence(6000, 12, rng)
    pairs_1, pairs_2 = make_fake_short_reads(genome)
    read_arrays = [encode_sequence(seq)
                   for _, seq, _ in pairs_1 + pairs_2]
    unitigs, links = assemble_short_reads(read_arrays, k)
    assert unitigs
    gfa = str(tmp_path / 'g.gfa')
    save_graph_gfa(unitigs, links, k, gfa)
    graph = AssemblyGraph(gfa, k - 1)
    doubled = genome + genome
    doubled_rc = reverse_complement(doubled)

    graph.remove_all_overlaps()
    assert graph.overlap == 0
    for seg in graph.segments.values():
        s = seg.forward_sequence
        assert s in doubled or s in doubled_rc, \
            'segment no longer matches the genome after overlap removal'
    # round-trips cleanly
    out = str(tmp_path / 'g0.gfa')
    graph.save_to_gfa(out, newline=True)
    reloaded = AssemblyGraph(out, 0)
    assert len(reloaded.segments) == len(graph.segments)
